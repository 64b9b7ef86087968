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
}
