package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{TextAnalysis => TA}

/** Direct specs for the text operators not already pinned by the t1
  * oracle entry: BPE-ish token estimate, rolling fingerprints, overlap
  * pairs, and the lang-ID tie-break. */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, input: String): T =
    Seq(input).toDF("text").select(c.as("v")).collect().head.getAs[T](0)

  test("tokenCount and bpeishTokenCount basic shapes") {
    assert(one[Int](TA.tokenCount(col("text")), "a b  c") === 3)
    assert(one[Int](TA.tokenCount(col("text")), "   ") === 0)
    val words = one[Int](TA.bpeishTokenCount(col("text")), "hello world")
    val punct = one[Int](TA.bpeishTokenCount(col("text")), "hello, world.")
    assert(punct > words) // punctuation splits add subword tokens
  }

  test("langId picks the dominant stopword language, 'und' when none") {
    assert(one[String](TA.langId(col("text")), "the cat and the hat is here") === "en")
    assert(one[String](TA.langId(col("text")), "der hund und die katze ist da") === "de")
    assert(one[String](TA.langId(col("text")), "zzz qqq xxx") === "und")
  }

  private def fpSeq(window: Int, input: String): Seq[Long] =
    Seq(input).toDF("text")
      .select(TA.rollingFingerprints(col("text"), window).as("v"))
      .collect().head.getSeq[Long](0)

  test("rollingFingerprints: sliding windows, deterministic, short-text empty") {
    val fps = fpSeq(3, "a b c d e")
    assert(fps.length === 3) // windows abc, bcd, cde
    assert(fps.distinct.length === 3)
    assert(fpSeq(8, "too short").isEmpty)
  }

  test("rollingOverlapPairs finds shared-window pairs without all-pairs scan") {
    val docs = Seq(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "one two three four five six seven eight different tail"),
      (3L, "completely unrelated words with no common windows at all x y"),
    ).toDF("doc_id", "text")
    val pairs = TA.rollingOverlapPairs(docs, "doc_id", "text", window = 8, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq === Seq((1L, 2L, 1L))) // only the shared 8-window prefix
  }

  test("contaminationPairs: every long-enough eval doc flags its source, cross-frame only") {
    val corpus = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 200)
    // "eval set" = head-truncated copies: must still share >= 5 windows
    // with their source whenever they carry >= 12 words
    val w = split(col("text"), " ")
    val eval = corpus.select((col("doc_id") + 10000).as("doc_id"),
      array_join(slice(w, lit(3), size(w)), " ").as("text"))
    val flagged = TA.contaminationPairs(corpus, eval, "doc_id", "text",
        window = 8, minShared = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = corpus
      .filter(size(split(col("text"), " ")) >= 14) // 2 dropped + 8-window + 4 extra = >=5 windows
      .select(col("doc_id")).collect().map(r => (r.getLong(0), r.getLong(0) + 10000)).toSet
    assert(expected.nonEmpty)
    assert(expected.subsetOf(flagged), s"missed ${(expected -- flagged).take(5)}")
    // no within-frame pairs leak: every pair is corpus x eval
    assert(flagged.forall { case (c, e) => c < 10000 && e >= 10000 })
  }

  test("quality metrics degenerate cases") {
    assert(one[Double](TA.typeTokenRatio(col("text")), "a a a a") === 0.25)
    assert(one[Double](TA.nonAlphaRatio(col("text")), "abc def") === 0.0)
    assert(one[Boolean](TA.qualityKeep(col("text")), "too few") === false)
  }

  test("repetition filters: duplicate-word fraction and top-bigram argmax with tie-break") {
    import spark.implicits._
    assert(one[Double](TA.duplicateWordFraction(col("text")), "a b a b c") === 1.0 - 3.0 / 5.0)
    assert(one[Double](TA.duplicateWordFraction(col("text")), "x x x x") === 0.75)
    assert(one[Double](TA.duplicateWordFraction(col("text")), "") === 0.0)

    val docs = Seq(
      (1L, "a b a b c"),  // "a b" x2 beats "b a"/"b c" x1
      (2L, "x x x x"),    // "x x" x3
      (3L, "z y z"),      // tie "z y"/"y z" x1 -> lexicographically smallest "y z"
      (4L, "solo"),       // <2 tokens: drops out
    ).toDF("doc_id", "text")
    val got = TA.topBigramStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      (1L, "a b", 2L, 2.0 * 3 / 9),
      (2L, "x x", 3L, 3.0 * 3 / 7),
      (3L, "y z", 1L, 1.0 * 3 / 5)))
  }

  test("PII redaction: emails, IPs, phones scrubbed; counts match") {
    val text = "mail bob@x.co or b.o-b+1@sub.domain.org, call +12345678, host 192.168.0.1 ok"
    assert(one[String](TA.redactPii(col("text")), text) ===
      "mail <EMAIL> or <EMAIL>, call <PHONE>, host <IP> ok")
    val c = one[org.apache.spark.sql.Row](TA.piiCounts(col("text")), text)
    assert((c.getLong(0), c.getLong(1), c.getLong(2)) === ((2L, 1L, 1L)))
    // plain prose unharmed
    assert(one[String](TA.redactPii(col("text")), "no pii here 1.2 ok") === "no pii here 1.2 ok")
  }

  test("unigram model + freq stats: exact integer counts, OOV and rare") {
    val ref = Seq("a a b c", "a b d").toDF("text") // c(a)=3 c(b)=2 c(c)=1 c(d)=1
    val model = TA.unigramModel(ref, "text")
    assert(model.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("a" -> 3L, "b" -> 2L, "c" -> 1L, "d" -> 1L))
    val docs = Seq((1L, "a b z"), (2L, "c c d"), (3L, "")).toDF("doc_id", "text")
    val got = TA.unigramFreqStats(docs, "doc_id", "text", model, rareMax = 2L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // doc 1: tokens a,b,z → 1 OOV (z), 1 rare (b, c=2), freq 3+2+0=5
    // doc 2: tokens c,c,d → 0 OOV, 3 rare, freq 1+1+1=3
    // doc 3: empty text → no token rows, absent
    assert(got === Array((1L, 3L, 1L, 1L, 5L), (2L, 3L, 0L, 3L, 3L)))
  }

  test("unigramNll matches a hand-computed smoothed fold exactly") {
    val ref = Seq("a a b c", "a b d").toDF("text")
    val model = TA.unigramModel(ref, "text")
    val docs = Seq((1L, "a b z"), (2L, "d")).toDF("doc_id", "text")
    val alpha = 0.5
    val C = 7.0; val V = 4.0 // total tokens, vocab size
    val denom = C + alpha * (V + 1.0)
    // Spark's Log expression evaluates via StrictMath (fdlibm), which can
    // differ from Math.log's intrinsic in the last ulp
    def lp(c: Double) = StrictMath.log((c + alpha) / denom)
    val unseen = StrictMath.log(alpha / denom)
    // document-order left fold from 0.0, then negate and average —
    // the exact arithmetic unigramNll promises
    val exp1 = -(0.0 + lp(3.0) + lp(2.0) + unseen) / 3.0
    val exp2 = -(0.0 + lp(1.0)) / 1.0
    val got = TA.unigramNll(docs, "doc_id", "text", model, alpha)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got === Array((1L, 3L, exp1), (2L, 1L, exp2)))
  }

  test("unigramNll is bit-stable under repartitioning") {
    val ref = Seq("a a b c d e f g h a b", "x y z a b").toDF("text")
    val model = TA.unigramModel(ref, "text")
    val docs = (1L to 40L).map(i => (i, s"a b x q$i h z a")).toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      TA.unigramNll(d, "doc_id", "text", model).orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(run(docs) === run(docs.repartition(7)))
  }

  test("importanceStats selects target-leaning docs by the exact cross-multiplied rule") {
    // target domain talks about "spark shuffle join"; background about
    // "cats purr softly" — candidates lean clearly one way or the other
    val target = Seq((1L, "spark shuffle join spark join"),
      (2L, "shuffle spark partition join")).toDF("doc_id", "text")
    val bg = Seq((1L, "cats purr softly cats nap"),
      (2L, "purr nap cats softly purr")).toDF("doc_id", "text")
    val cands = Seq(
      (10L, "spark join shuffle"),        // target-leaning → selected
      (11L, "cats purr nap"),             // background-leaning → not
      (12L, "quantum flux"),              // all-OOV: 0·Cbg > 0·Ct false
      (13L, "spark cats")                 // mixed: decided by exact sums
    ).toDF("doc_id", "text")
    val tm = TA.unigramModel(target, "text")
    val bm = TA.unigramModel(bg, "text")
    val got = TA.importanceStats(cands, "doc_id", "text", tm, bm)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4)))

    // hand-replay: per-term target counts {spark 3, shuffle 2, join 3,
    // partition 1} (Ct 9), background {cats 3, purr 3, softly 2, nap 2}
    // (Cbg 10)
    assert(got(0) === ((10L, 3L, 8L, 0L, 1)))  // 8·10 > 0·9
    assert(got(1) === ((11L, 3L, 0L, 8L, 0)))  // 0·10 > 8·9 is false
    assert(got(2) === ((12L, 2L, 0L, 0L, 0)))  // OOV everywhere: kept out
    assert(got(3) === ((13L, 2L, 3L, 3L, 1)))  // 3·10 > 3·9
    // the selection bit agrees in sign with the float log-ratio weight
    // (avg-NLL under background minus under target) on the clear-cut docs
    val nllT = TA.unigramNll(cands.filter($"doc_id" < 12), "doc_id", "text", tm)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val nllB = TA.unigramNll(cands.filter($"doc_id" < 12), "doc_id", "text", bm)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(nllB(10L) - nllT(10L) > 0, "target-leaning doc must have positive log-ratio")
    assert(nllB(11L) - nllT(11L) < 0, "background-leaning doc must have negative log-ratio")
  }

  test("tokenChunks: stride overlap, partial tail, full coverage, empty dropped") {
    import spark.implicits._
    val doc = (1 to 23).map("t" + _).mkString(" ")
    val df = Seq((1L, doc), (2L, "a b"), (3L, "")).toDF("doc_id", "text")
    val got = TA.tokenChunks(df, "doc_id", "text", width = 10, stride = 6)
      .orderBy("__id", "__chunk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // n=23, width 10, stride 6: chunks at 1, 7, 13, 19 → m = 1 + ceil(13/6) = 4
    assert(got.map(x => (x._1, x._2)).toSeq ===
      Seq((1L, 0L), (1L, 1L), (1L, 2L), (1L, 3L), (2L, 0L)))
    assert(got(0)._3 === (1 to 10).map("t" + _).mkString(" "))
    assert(got(3)._3 === (19 to 23).map("t" + _).mkString(" ")) // partial tail
    assert(got(3)._4 === 5L)
    // consecutive chunks overlap by width - stride = 4 tokens
    assert(got(0)._3.split(" ").takeRight(4).toSeq ===
      got(1)._3.split(" ").take(4).toSeq)
    // every token of doc 1 appears in at least one chunk
    val covered = got.filter(_._1 == 1L).flatMap(_._3.split(" ")).toSet
    assert(covered === (1 to 23).map("t" + _).toSet)
    // short doc: one chunk, whole text; empty doc: no chunks
    assert(got.last === ((2L, 0L, "a b", 2L)))
  }
}
