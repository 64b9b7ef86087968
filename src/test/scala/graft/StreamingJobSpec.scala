package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode

import graft.ingest.{BlockStore, PackedBlocks}
import graft.schema.Model._
import graft.streaming.IngestJob

import graft.fixtures.EvmFixtures

/** End-to-end Structured Streaming smoke: drop-zone file source →
  * observe() metrics → foreachBatch store → watermark promotion. */
class StreamingJobSpec extends SparkSpec {
  import spark.implicits._

  private def packed(n: Long): PackedBlock = {
    val block = EvmFixtures.buildBlock(n, 1)
    val tx = EvmFixtures.buildTx(n, 0, 0).copy(blockhash = block.hash)
    PackedBlock(block, Seq(PackedTransaction(tx, Seq.empty)))
  }

  test("streaming ingest: source → store → promote, across two files") {
    val root = Files.createTempDirectory("graft-stream").toString
    val dropZone = s"$root/dropzone"
    Files.createDirectories(java.nio.file.Paths.get(dropZone))

    val store = new BlockStore(spark, s"$root/store")
    val job = new IngestJob(spark, store, confirmations = 2)

    (0L to 4L).map(packed(_)).toDF().coalesce(1)
      .write.mode(SaveMode.Append).parquet(dropZone)

    val query = job.start(
      PackedBlocks.readStream(spark, dropZone), s"$root/checkpoint")
    try {
      query.processAllAvailable()
      assert(store.view("blocks").count() === 5)
      assert(store.confirmed("blocks").count() === 3) // watermark 4-2
      assert(store.hot.count() === 2)

      // second file arrives → stream picks it up, watermark advances
      (5L to 7L).map(packed(_)).toDF().coalesce(1)
        .write.mode(SaveMode.Append).parquet(dropZone)
      query.processAllAvailable()
      assert(store.view("blocks").count() === 8)
      assert(store.confirmed("blocks").count() === 6)

      // A7/ST13: observe() metrics surfaced per batch. foreachBatch runs
      // several actions over the observed plan, so per-batch values count
      // each action's pass — assert presence and a sane lower bound.
      val progress = query.recentProgress.flatMap(p =>
        Option(p.observedMetrics.get("ingest")))
      assert(progress.nonEmpty)
      assert(progress.map(_.getAs[Long]("blocks_processed")).sum >= 8)
    } finally query.stop()
  }

  test("restart from checkpoint: replays are no-ops, publish gate survives (S9/ST6)") {
    val root = Files.createTempDirectory("graft-stream").toString
    val dropZone = s"$root/dropzone"
    Files.createDirectories(java.nio.file.Paths.get(dropZone))
    val store = new BlockStore(spark, s"$root/store")
    var published = Vector.empty[Long]
    def collectPublished(df: org.apache.spark.sql.DataFrame): Unit =
      published ++= PackedBlocks.blocksOf(df)
        .select("number").collect().map(_.getLong(0)).sorted

    val job = new IngestJob(spark, store, confirmations = 1, onPublish = collectPublished)
    (0L to 4L).map(packed(_)).toDF().coalesce(1)
      .write.mode(SaveMode.Append).parquet(dropZone)
    val q1 = job.start(PackedBlocks.readStream(spark, dropZone), s"$root/checkpoint")
    try q1.processAllAvailable() finally q1.stop()
    assert(published === Vector(0L, 1L, 2L, 3L, 4L))

    // a NEW job instance on the same store + checkpoint (restart): the
    // next file replays an already-confirmed block alongside fresh ones
    val job2 = new IngestJob(spark, store, confirmations = 1, onPublish = collectPublished)
    assert(job2.gate.get() === job.gate.get()) // state restored from disk
    Seq(packed(3), packed(5), packed(6)).toDF().coalesce(1)
      .write.mode(SaveMode.Append).parquet(dropZone)
    val q2 = job2.start(PackedBlocks.readStream(spark, dropZone), s"$root/checkpoint")
    try q2.processAllAvailable() finally q2.stop()

    assert(published === Vector(0L, 1L, 2L, 3L, 4L, 5L, 6L)) // 3 not republished
    assert(store.view("blocks").select("number").collect()
      .map(_.getLong(0)).sorted.toSeq === (0L to 6L)) // replay stored once
  }
}
