package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Bpe

/** BPE merge learning against a hand-computed trajectory (the classic
  * low/lower/newest/widest corpus of the Sennrich paper's exposition),
  * plus the apply-half round trip. The cross-engine gate (p_t8) replays
  * full training on the fixture corpus in DuckDB; this spec pins the
  * arithmetic at human scale where every count is checkable by eye. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, Array.fill(5)("low").mkString(" ")),
    (2L, Array.fill(2)("lower").mkString(" ")),
    (3L, Array.fill(6)("newest").mkString(" ")),
    (4L, Array.fill(3)("widest").mkString(" "))
  ).toDF("doc_id", "text")

  test("merge trajectory matches the hand computation, ties broken by pair string") {
    val merges = Bpe.train(spark, corpus, "text", rounds = 4)
    // round 1: e-s and s-t and t-</w> all count 9 ("newest"x6 + "widest"x3);
    // "e s" < "s t" < "t </w>" so (e,s) wins the tie
    assert(merges.map(m => (m.round, m.left, m.right, m.cnt)) === Seq(
      (1, "e", "s", 9L),
      (2, "es", "t", 9L),
      (3, "est", "</w>", 9L),
      (4, "l", "o", 7L)))
  }

  test("wordFreqs tokenizes to lowercase a-z and counts exactly") {
    val freqs = Bpe.wordFreqs(
      Seq((1L, "Low LOW low!  123 weird-char")).toDF("doc_id", "text"), "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // punctuation/digits strip; "weird-char" loses the hyphen INSIDE the
    // token and fuses (the a-z restriction is the documented contract)
    assert(freqs === Map("low" -> 3L, "weirdchar" -> 1L))
  }

  test("tokenize applies the learned table and reconstructs every word") {
    val merges = Bpe.train(spark, corpus, "text", rounds = 10)
    val docs = Seq((1L, "lowest newest low")).toDF("doc_id", "text")
    val got = Bpe.tokenize(docs, "doc_id", "text", merges)
      .select(col("word"), col("tokens"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    // lossless: tokens concatenate back to word + sentinel
    for ((w, toks) <- got)
      assert(toks.mkString("") === w + "</w>", s"word $w")
    // the trained subwords actually apply: "newest" was in-corpus, so its
    // learned pieces collapse it far below character count
    assert(got("newest").length < "newest".length)
  }

  test("persisted merge table: train-once artifact, warm reads, staleness rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("bpe-art")
    val corpusDir = dir.resolve("corpus")
    java.nio.file.Files.createDirectories(corpusDir)
    val src = corpusDir.resolve("documents.parquet")
    corpus.write.mode("overwrite").parquet(src.toString)
    val root = Some(dir.resolve("artifacts").toString)
    val docs = spark.read.parquet(src.toString)

    val cold = Bpe.ensureMerges(spark, corpusDir.toString, docs, "text",
      rounds = 4, variant = "t", artifactRootOverride = root)
    val expect = Bpe.train(spark, corpus, "text", rounds = 4)
    assert(Bpe.mergesOf(cold) === expect)

    // warm read: artifact untouched (mtime pinned), contents identical
    val artDir = java.nio.file.Paths.get(root.get, "bpe_corpus_t_v1_r4")
    val mtime = java.nio.file.Files.getLastModifiedTime(artDir)
    val warm = Bpe.ensureMerges(spark, corpusDir.toString, docs, "text",
      rounds = 4, variant = "t", artifactRootOverride = root)
    assert(Bpe.mergesOf(warm) === expect)
    assert(java.nio.file.Files.getLastModifiedTime(artDir) === mtime,
      "warm ensure must not rebuild")

    // a different round count is a DIFFERENT artifact, never silent reuse
    val r2 = Bpe.ensureMerges(spark, corpusDir.toString, docs, "text",
      rounds = 2, variant = "t", artifactRootOverride = root)
    assert(Bpe.mergesOf(r2) === expect.take(2))

    // tokenize through the persisted table ≡ tokenize through live training
    val probe = Seq((1L, "lowest newest low")).toDF("doc_id", "text")
    val viaArtifact = Bpe.tokenize(probe, "doc_id", "text", Bpe.mergesOf(cold))
      .select("word", "tokens").collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val viaTrain = Bpe.tokenize(probe, "doc_id", "text", expect)
      .select("word", "tokens").collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(viaArtifact === viaTrain)

    // corpus regeneration → stale artifact rebuilds (source mtime newer)
    Thread.sleep(1100) // fs mtime granularity
    corpus.write.mode("overwrite").parquet(src.toString)
    val rebuilt = Bpe.ensureMerges(spark, corpusDir.toString,
      spark.read.parquet(src.toString), "text",
      rounds = 4, variant = "t", artifactRootOverride = root)
    assert(Bpe.mergesOf(rebuilt) === expect)
    assert(java.nio.file.Files.getLastModifiedTime(artDir).compareTo(mtime) > 0,
      "stale artifact must rebuild")
  }

  test("training stops early when no pair repeats") {
    val merges = Bpe.train(spark,
      Seq((1L, "ab")).toDF("doc_id", "text"), "text", rounds = 5)
    assert(merges.isEmpty) // every pair count is 1: nothing worth merging
  }
}
