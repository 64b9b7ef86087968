package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation with watermarks — the Structured
  * Streaming late-data machinery (SURVEY §2.9 note: the reference has no
  * event-time windows; its "late data" is reorgs, handled by ST7, and its
  * watermark is confirmation depth, ST6). This operator is the
  * beyond-reference analytics surface: per-key rates over tumbling
  * event-time windows, with lateness bounded by the watermark so state
  * stays finite on an unbounded stream.
  */
object EventRates {

  /** Tumbling-window counts per key. `tsCol` must be a TimestampType
    * event-time column; windows finalize (append-mode emit) once the
    * watermark passes their end, and events later than `watermarkDelay`
    * are dropped — bounded state on an unbounded stream. */
  def perKeyPerWindow(events: DataFrame, tsCol: String, keyCol: String,
      windowDur: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col(keyCol), col("n"))

  /** Block-time flavor: unix-seconds `time` → event-time, counts per
    * miner per window — e.g. blocks-per-minute dashboards. */
  def blocksPerWindow(blocks: DataFrame, windowDur: String = "1 minute",
      watermarkDelay: String = "2 minutes"): DataFrame =
    perKeyPerWindow(
      blocks.withColumn("__ts", timestamp_seconds(col("time"))),
      "__ts", "miner", windowDur, watermarkDelay)
}
