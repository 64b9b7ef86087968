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

  test("quality metrics degenerate cases") {
    assert(one[Double](TA.typeTokenRatio(col("text")), "a a a a") === 0.25)
    assert(one[Double](TA.nonAlphaRatio(col("text")), "abc def") === 0.0)
    assert(one[Boolean](TA.qualityKeep(col("text")), "too few") === false)
  }
}
