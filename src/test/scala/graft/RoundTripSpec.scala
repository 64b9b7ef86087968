package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.fixtures.EvmFixtures
import graft.ingest.{BlockStore, PackedBlocks}
import graft.operators.Compaction
import graft.streaming.IngestJob

/** VERDICT #6's done-criterion: ingest the committed packed-block corpus
  * through the write path, then verify the store's query views reproduce
  * the committed flat tables exactly. */
class RoundTripSpec extends SparkSpec {
  import spark.implicits._

  test("full corpus round-trip: packed ingest → views ≡ committed flat tables") {
    val root = Files.createTempDirectory("graft-roundtrip").toString
    val store = new BlockStore(spark, s"$root/store")
    val job = new IngestJob(spark, store, confirmations = 50)
    val packed = PackedBlocks.readBatch(spark, s"${EvmFixtures.dir}/packed_blocks.parquet")
    job.processBatch(packed, batchId = 0)

    for (table <- Seq("blocks", "transactions", "events")) {
      val committed = spark.read.parquet(s"${EvmFixtures.dir}/$table.parquet")
      val view = store.view(table)
      assert(view.count() === committed.count(), s"$table count")
      // exact content equality via exceptAll; binary columns compared as digests
      val cols = committed.schema.fields.toSeq.map { f =>
        if (f.dataType.typeName == "binary") md5(col(f.name)).as(f.name) else col(f.name)
      }
      val missing = committed.select(cols: _*).exceptAll(view.select(cols: _*)).count()
      assert(missing === 0, s"$table rows lost in round-trip")
    }
    // both tiers populated (watermark = max - 50)
    assert(store.confirmed("blocks").count() > 0)
    assert(store.hot.count() > 0)

    // and a representative query gives the same answer on the store view
    val h = EvmFixtures.blockHash(2003)
    val viaStore = store.view("transactions").filter(col("blockhash") === h)
      .select("hash").collect().map(_.getString(0)).sorted
    val viaFiles = graft.queries.EvmQueries.txs(spark).filter(col("blockhash") === h)
      .select("hash").collect().map(_.getString(0)).sorted
    assert(viaStore.sameElements(viaFiles))
  }

  test("compaction view: last writer wins per key; upsert replaces and appends") {
    val base = Seq((1L, "a", 10L), (2L, "b", 10L)).toDF("k", "v", "seq")
    val more = Seq((1L, "a2", 20L), (3L, "c", 20L)).toDF("k", "v", "seq")
    val latest = Compaction.latestByKey(base.unionByName(more), Seq("k"), "seq")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(latest.toSeq === Seq((1L, "a2"), (2L, "b"), (3L, "c")))

    val merged = Compaction.upsert(base, more, Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(merged.toSeq === Seq((1L, "a2"), (2L, "b"), (3L, "c")))
  }
}
