package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ingest.BlockStore
import graft.schema.Schemas
import graft.streaming.{ChainSimSource, IngestJob}

/** The custom DataSource V2 MicroBatchStream end-to-end: offsets, chunked
  * partitions, JSON payload parsing, and the full ingest path on top. */
class ChainSimSourceSpec extends SparkSpec {

  test("chain-sim source streams the deterministic chain into the store") {
    val root = Files.createTempDirectory("graft-chainsim").toString
    val store = new BlockStore(spark, s"$root/store")
    val job = new IngestJob(spark, store, confirmations = 5)

    val packedStream = spark.readStream
      .format(classOf[ChainSimSource].getName)
      .option("blocksPerBatch", "25")
      .option("maxNumber", "96") // last-number < first gap-free stretch end
      .load()
      .select(from_json(col("value"), Schemas.packedBlock).as("p"))
      .select("p.*")

    val query = job.start(packedStream, s"$root/checkpoint")
    try {
      query.processAllAvailable()
      // number 13 is a deliberate gap (EvmFixtures.isGap); the rest arrive
      val numbers = store.view("blocks").select("number")
        .collect().map(_.getLong(0)).toSet
      assert(numbers === (0L to 96L).filterNot(graft.fixtures.EvmFixtures.isGap).toSet)
      // payload fidelity end-to-end: one known tx survives the JSON hop
      val tx = store.view("transactions")
        .filter(col("hash") === graft.fixtures.EvmFixtures.txHash(5, 0))
      assert(tx.count() === 1)
      assert(tx.collect().head.getAs[String]("blockhash") ===
        graft.fixtures.EvmFixtures.blockHash(5))
      // confirmation watermark applied on the streamed data too
      assert(store.hot.count() > 0 && store.confirmed("blocks").count() > 0)
    } finally query.stop()
  }

  test("fetcher option swaps the node connector without touching the source") {
    val root = Files.createTempDirectory("graft-chainfetch").toString
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val packedStream = spark.readStream
      .format(classOf[ChainSimSource].getName)
      .option("blocksPerBatch", "10")
      .option("maxNumber", "50")
      .option("fetcher", classOf[TruncatedFetcher].getName)
      .load()
      .select(from_json(col("value"), Schemas.packedBlock).as("p"))
      .select("p.block.number")
    val query = packedStream.writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= df.collect().map(_.getLong(0)); ()
      }.start()
    try query.processAllAvailable() finally query.stop()
    // the custom fetcher reports head 7 and serves only even blocks:
    // the stream honored BOTH halves of the connector contract
    assert(got.toSet === (0L to 7L).filter(_ % 2 == 0).toSet)
  }
}

/** A deliberately-odd [[graft.streaming.BlockFetcher]]: short head, holes
  * on odd numbers — proves the stream takes head AND block content from
  * the option-selected connector, not from the built-in simulator. */
class TruncatedFetcher extends graft.streaming.BlockFetcher {
  override def head(): Long = 7L
  override def fetchBlock(n: Long): Option[graft.schema.Model.PackedBlock] =
    if (n % 2 == 0) ChainSimSource.fetchBlock(n) else None
}
