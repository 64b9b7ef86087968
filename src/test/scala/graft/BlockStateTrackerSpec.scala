package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.BlockStateTracker
import graft.streaming.BlockStateTracker.{BlockDone, BlockEvent}

/** ST10 custom state machine: a block completes only after confirmed AND
  * published, completes exactly once, and its state is dropped. */
class BlockStateTrackerSpec extends SparkSpec {
  import spark.implicits._

  test("flatMapGroupsWithState emits each block once on confirm+publish") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[BlockEvent]
    val done = BlockStateTracker.track(input.toDS())

    val query = done.writeStream.format("memory").queryName("done")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        BlockEvent(1, "seen"), BlockEvent(1, "stored"),
        BlockEvent(2, "seen"), BlockEvent(2, "stored"), BlockEvent(2, "published"))
      query.processAllAvailable()
      assert(spark.sql("SELECT * FROM done").count() === 0) // nothing terminal yet

      input.addData(BlockEvent(2, "confirmed"), BlockEvent(1, "published"))
      query.processAllAvailable()
      val after2 = spark.sql("SELECT number FROM done").collect().map(_.getLong(0))
      assert(after2.toSeq === Seq(2L)) // block 2 terminal; block 1 still waiting

      input.addData(BlockEvent(1, "confirmed"), BlockEvent(2, "published"))
      query.processAllAvailable()
      val finals = spark.sql("SELECT number FROM done").collect().map(_.getLong(0))
      // block 1 completes; block 2's late replay does NOT re-emit (state dropped,
      // fresh state lacks `confirmed`)
      assert(finals.sorted.toSeq === Seq(1L, 2L))
    } finally query.stop()
  }
}
