package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Dedup operators: shingling semantics, exact groups, and the MinHash-LSH
  * recall contract against brute force on the sf0.001 documents corpus. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: distinct word trigrams; short texts → empty array") {
    val df = Seq("a b c d", "a b", "x y z x y z x y z").toDF("text")
    val got = df.select(Dedup.shingles(col("text"), 3).as("sh")).collect()
      .map(_.getSeq[String](0).toSet)
    assert(got(0) === Set("a b c", "b c d"))
    assert(got(1) === Set.empty)
    assert(got(2) === Set("x y z", "y z x", "z x y")) // distinct across repeats
  }

  test("exactDupGroups finds exactly the injected copies, keeps min id") {
    val df = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "aaa"), (5L, "ccc"))
      .toDF("doc_id", "text")
    val groups = Dedup.exactDupGroups(df, "text", "doc_id").collect()
    assert(groups.length === 1)
    assert(groups.head.getAs[Long]("keep_id") === 1L)
    assert(groups.head.getAs[Long]("n_copies") === 3L)
    assert(Dedup.exactDedup(df, "text", "doc_id").count() === 3)
  }

  test("jaccard: exact set semantics") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("a", "b")
    val j = df.select(Dedup.jaccard(col("a"), col("b"))).collect().head.getDouble(0)
    assert(j === 2.0 / 4.0)
  }

  /** Mutated corpus shared with the registry queries: head-truncated copies. */
  private def corpus = {
    val docs = Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
    val w = split(col("text"), " ")
    docs.union(
      docs.filter(pmod(col("doc_id"), lit(7)) === 0).select(
        (col("doc_id") + 10000).as("doc_id"),
        array_join(slice(w, lit(3), size(w)), " ").as("text")))
  }

  test("MinHash-LSH(32, 16×2) recovers every brute-force pair at j ≥ 0.8") {
    val brute = Dedup.bruteForceNearDupPairs(corpus, corpus, "doc_id", "text", 0.8)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minHashNearDupPairs(corpus, "doc_id", "text", 0.8,
        numHashes = 32, bands = 16)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "corpus must contain constructed near-dups")
    assert(lsh === brute) // recall 1 at these band settings, and no false positives survive the exact-j filter
  }

  test("LSH candidate volume stays far below all-pairs") {
    val n = corpus.count()
    val sh = corpus.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
    val cands = Dedup.lshCandidatePairs(sh, "doc_id", "sh", 32, 16).count()
    assert(cands < n * (n - 1) / 20, s"candidates $cands vs all-pairs ${n * (n - 1) / 2}")
  }

  test("SimHash: full recall of mutated copies; candidate volume bounded") {
    val pairs = Dedup.simHashNearDupPairs(corpus, "doc_id", "text",
      maxHamming = 16, prefixBits = 4)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mutated = corpus.filter(col("doc_id") >= 10000)
      .select((col("doc_id") - 10000).as("a"), col("doc_id").as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // RECALL: every (original, mutation) pair whose block prefix agrees must
    // be reported. SimHash on very short documents has inherent false
    // positives (few shingles → unstable fingerprint), so precision is NOT
    // asserted — but the candidate set must stay far below all-pairs.
    val n = corpus.count()
    val recalled = mutated intersect got
    assert(recalled.size >= (mutated.size * 8) / 10, s"recall ${recalled.size}/${mutated.size}")
    assert(got.size < n * (n - 1) / 20, s"reported ${got.size} of ${n * (n - 1) / 2} pairs")
  }
}
