package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.pipeline.{Dedup, Retrieval}

/** BM25 keyword retrieval pinned against a hand-computed reference, and
  * the streaming in-flight exact-dedup twin. */
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
