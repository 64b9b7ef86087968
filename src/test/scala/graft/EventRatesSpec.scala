package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventRates

/** Watermark semantics: windows finalize only after the watermark passes,
  * and events later than the allowed delay are dropped. */
class EventRatesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int, second: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$second%02d")

  test("tumbling windows finalize on watermark; late events dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val counts = EventRates.perKeyPerWindow(
      input.toDS().toDF("ts", "origin"), "ts", "origin",
      windowDur = "1 minute", watermarkDelay = "1 minute")

    val query = counts.writeStream.format("memory").queryName("rates")
      .outputMode(OutputMode.Append()).start()
    try {
      // two events in the 10:00 window, one in 10:01
      input.addData((ts(0, 10), "a"), (ts(0, 40), "a"), (ts(1, 5), "b"))
      query.processAllAvailable()
      assert(spark.sql("SELECT * FROM rates").count() === 0) // nothing finalized yet

      // an event at 10:03 advances the watermark to 10:02 → windows
      // 10:00 and 10:01 finalize
      input.addData((ts(3, 0), "a"))
      query.processAllAvailable()
      val emitted = spark.sql("SELECT origin, n FROM rates ORDER BY origin")
        .collect().map(r => (r.getString(0), r.getLong(1)))
      assert(emitted.toSeq === Seq(("a", 2L), ("b", 1L)))

      // a late event for the already-finalized 10:00 window is DROPPED
      input.addData((ts(0, 59), "a"), (ts(5, 0), "c"))
      query.processAllAvailable()
      input.addData((ts(8, 0), "c")) // push watermark past everything
      query.processAllAvailable()
      val all = spark.sql("SELECT origin, n FROM rates ORDER BY origin, n")
        .collect().map(r => (r.getString(0), r.getLong(1)))
      // no second emission for origin=a's 10:00 window; 10:03 'a' and 10:05 'c' windows finalized
      assert(all.toSeq === Seq(("a", 1L), ("a", 2L), ("b", 1L), ("c", 1L)))
    } finally query.stop()
  }
}
