package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.pipeline.{Dedup, PostingsIndex, Retrieval, TextAnalysis}

/** BM25 keyword retrieval pinned against a hand-computed reference, the
  * persisted postings-index lifecycle (indexed ≡ on-the-fly, bucket
  * pruning, incremental append), and the streaming in-flight exact-dedup
  * twin. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark join join join fast"),
    (2L, "join slow"),
    (3L, "spark fast fast scan"),
    (4L, "scan scan scan scan scan scan")).toDF("doc_id", "text")

  test("postings and doc lengths: exact tf/dl, one tokenization source") {
    val post = Retrieval.postings(corpus, "doc_id", "text")
    assert(post.filter(col("term") === "join").orderBy("id").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq === Seq((1L, 3L), (2L, 1L)))
    val dl = Retrieval.docLengths(post).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(dl.toSeq === Seq((1L, 5L), (2L, 2L), (3L, 4L), (4L, 6L)))
  }

  test("bm25TopK matches the hand-computed Okapi formula exactly") {
    val (k1, b) = (1.2, 0.75)
    val n = 4.0; val avgdl = 17.0 / 4.0
    def idf(df: Double) = StrictMath.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def part(tf: Double, df: Double, dl: Double) =
      idf(df) * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * dl / avgdl))
    // query (join, spark): doc1 matches both — term-sorted fold from 0.0
    val exp1 = (0.0 + part(3, 2, 5)) + part(1, 2, 5) // join, then spark
    val exp2 = 0.0 + part(1, 2, 2)                   // join only
    val exp3 = 0.0 + part(1, 2, 4)                   // spark only
    val got = Retrieval.bm25TopK(corpus, "doc_id", "text",
        Seq("join", "spark"), k = 10, k1 = k1, b = b)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val expected = Seq(1L -> exp1, 2L -> exp2, 3L -> exp3)
      .sortBy { case (id, s) => (-s, id) }
    assert(got.toSeq === expected)
  }

  test("bm25TopK is bit-stable under repartitioning and caps at k") {
    def run(c: org.apache.spark.sql.DataFrame) =
      Retrieval.bm25TopK(c, "doc_id", "text", Seq("scan", "fast"), k = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val once = run(corpus)
    assert(once.size === 2)
    assert(once === run(corpus.repartition(5)))
  }

  test("termOverlapTopK ranks by (matched terms, tf, id); window spans the match set only") {
    val ranked = Retrieval.termOverlapTopK(
      Retrieval.postings(corpus, "doc_id", "text")
        .filter(col("term").isin("join", "spark", "scan")),
      "doc_id", k = 3).orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // doc1: 2 terms tf 4; doc3: 2 terms tf 3; doc4: 1 term tf 6; doc2 cut at k=3
    assert(ranked.toSeq === Seq((1L, 1L), (3L, 2L), (4L, 3L)))
  }

  test("rrfFuse: hand-computed fusion, ordered fold, one-sided docs included") {
    val lex = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "rank")
    val ann = Seq((20L, 1L), (40L, 2L)).toDF("doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(lex, ann), "doc_id", kConst = 60, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    def c(r: Long) = 1.0 / (60.0 + r)
    val expected = Seq(
      20L -> ((0.0 + c(2)) + c(1)), // lex first (src order), then ann
      10L -> (0.0 + c(1)),
      40L -> (0.0 + c(2)),
      30L -> (0.0 + c(3))).sortBy { case (id, s) => (-s, id) }
    assert(got === expected)
  }

  test("pqTopKRerank with r = corpus degrades to exact brute-force cosine") {
    import graft.pipeline.{Pq, Similarity}
    val emb = Tables.embeddings(spark, sf0001)
    val cb = Pq.strideCodebook(emb, "embedding", "vec_id", 8, 8, 16, 7)
    val codes = Pq.codesOf(emb, "embedding", "vec_id", cb, 8, 8)
    val q = emb.filter(col("vec_id") === 0).select("embedding")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val reranked = rows(Pq.pqTopKRerank(codes.filter(col("vec_id") =!= 0),
      "vec_id", cb, emb.select(col("vec_id"), col("embedding")), q,
      "embedding", k = 20, r = emb.count().toInt, ds = 8))
    val exact = rows(Similarity.bruteForceTopK(
      emb.filter(col("vec_id") =!= 0), "embedding", "vec_id",
      Similarity.vec(q.head.getSeq[Float](0)), k = 20))
    assert(reranked === exact)
  }

  test("PostingsIndex: indexed BM25 ≡ on-the-fly bit-for-bit; artifacts cached") {
    val root = java.nio.file.Files.createTempDirectory("graft-post-").toString
    val dir = "/nonexistent/postspec" // no staleness source in-spec
    val post = PostingsIndex.ensurePostings(spark, dir, corpus, "doc_id", "text",
      variant = "spec", artifactRootOverride = Some(root))
    val dl = PostingsIndex.ensureDocLengths(spark, dir, corpus, "doc_id", "text",
      variant = "spec", artifactRootOverride = Some(root))
    val stats = PostingsIndex.ensureTermStats(spark, dir, corpus, "doc_id", "text",
      variant = "spec", artifactRootOverride = Some(root))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val indexed = rows(Retrieval.bm25TopKIndexed(post, dl, stats, "doc_id",
      Seq("join", "spark"), k = 10))
    val inline = rows(Retrieval.bm25TopK(corpus, "doc_id", "text",
      Seq("join", "spark"), k = 10))
    assert(indexed === inline) // same ids AND bit-identical float scores
    assert(indexed.nonEmpty)
    // derived artifacts agree with the inline aggregates
    val vocabIdx = stats.orderBy("term").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val vocabInline = TextAnalysis.vocabStats(corpus, "doc_id", "text")
      .orderBy("term").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(vocabIdx === vocabInline)
    // second ensure() is a pure read: no new build dirs
    val before = new java.io.File(root).list().sorted.toSeq
    PostingsIndex.ensurePostings(spark, dir, corpus, "doc_id", "text",
      variant = "spec", artifactRootOverride = Some(root))
    assert(new java.io.File(root).list().sorted.toSeq === before)
    assert(before.count(_.startsWith("__build_")) === 0, "tmp dirs must not leak")
  }

  test("PostingsIndex: bucket pruning reads only the query terms' partitions") {
    val root = java.nio.file.Files.createTempDirectory("graft-post-").toString
    val post = PostingsIndex.ensurePostings(spark, "/nonexistent/prunespec",
      corpus, "doc_id", "text", variant = "spec", artifactRootOverride = Some(root))
    val pruned = PostingsIndex.prunedPostings(post, Seq("join", "spark"))
    // data: pruning never changes the matched set
    val plain = post.filter(col("term").isin("join", "spark"))
      .select("term", "id", "tf").collect().map(_.toString).sorted.toSeq
    assert(pruned.select("term", "id", "tf").collect()
      .map(_.toString).sorted.toSeq === plain)
    // plan: the bucket predicate lands in the scan's PartitionFilters
    val physical = pruned.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters: [") &&
      physical.contains("__tb"), s"expected __tb partition filter in:\n$physical")
  }

  test("PostingsIndex segmented: appended delta updates df/cf/dl correctly") {
    val root = java.nio.file.Files.createTempDirectory("graft-postseg-").toString
    val dir = "/nonexistent/postsegspec"
    val base = corpus.filter(col("doc_id") <= 2)
    val delta = corpus.filter(col("doc_id") > 2)
    PostingsIndex.ensurePostingsSegmented(spark, dir, base, "doc_id", "text",
      variant = "segspec", artifactRootOverride = Some(root))
    PostingsIndex.appendPostings(spark, dir, delta, "doc_id", "text",
      variant = "segspec", artifactRootOverride = Some(root))
    val seg = PostingsIndex.ensurePostingsSegmented(spark, dir, base, "doc_id",
      "text", variant = "segspec", artifactRootOverride = Some(root))
    // union of segments ≡ full rebuild, row for row
    val full = Retrieval.postings(corpus, "doc_id", "text")
      .collect().map(_.toString).sorted.toSeq
    assert(seg.collect().map(_.toString).sorted.toSeq === full)
    // and the derived stats over the union match the full-corpus ones:
    // df/cf aggregate correctly because each doc's tokens live in ONE segment
    val segStats = seg.groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("cf"))
      .orderBy("term").collect().map(_.toString).toSeq
    val fullStats = TextAnalysis.vocabStats(corpus, "doc_id", "text")
      .orderBy("term").collect().map(_.toString).toSeq
    assert(segStats === fullStats)
    val segDl = Retrieval.docLengths(seg).orderBy("id")
      .collect().map(_.toString).toSeq
    val fullDl = Retrieval.docLengths(Retrieval.postings(corpus, "doc_id", "text"))
      .orderBy("id").collect().map(_.toString).toSeq
    assert(segDl === fullDl)
  }

  test("streamingExactDedup: first arrival survives, in-window dups drop") {
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Int, s: Int = 0): Timestamp =
      Timestamp.valueOf(f"2024-01-01 10:$m%02d:$s%02d")
    val input = MemoryStream[(Timestamp, Long, String)]
    val out = Dedup.streamingExactDedup(
      input.toDS().toDF("ts", "doc_id", "text"), "text", "ts", "10 minutes")
    val query = out.writeStream.format("memory").queryName("sdedup")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((ts(0), 1L, "aaa"), (ts(0, 30), 2L, "aaa"), (ts(1), 3L, "bbb"))
      query.processAllAvailable()
      // same text again in a later micro-batch, still inside the window:
      // the earlier batch's arrival always wins cross-batch
      input.addData((ts(2), 4L, "aaa"), (ts(2, 30), 5L, "ccc"))
      query.processAllAvailable()
      val kept = spark.sql("SELECT doc_id, text FROM sdedup ORDER BY doc_id")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      // within the first batch the "aaa" winner (1 or 2) is
      // engine-chosen — the contract is ONE survivor per digest, and
      // never the later-batch replay (4)
      assert(kept.map(_._2).sorted.toSeq === Seq("aaa", "bbb", "ccc"))
      val aaa = kept.filter(_._2 == "aaa").map(_._1)
      assert(aaa.length === 1 && (aaa.head == 1L || aaa.head == 2L))
      assert(kept.map(_._1).contains(3L) && kept.map(_._1).contains(5L))
    } finally query.stop()
  }
}
