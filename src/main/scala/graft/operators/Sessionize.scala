package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — beyond-reference analytics (the reference
  * has no session concept), and a staple of training-data pipelines
  * (user/account activity bursts, document-stream segmentation).
  *
  * Batch form: two window functions over one (keys, time) shuffle — a
  * lag-gap boundary marker, then a running sum that turns boundaries into
  * per-key session ordinals. No self-joins, no iteration; Catalyst plans
  * ONE exchange and two window passes over it.
  *
  * Streaming form: Spark's native `session_window` with a watermark —
  * state per open session, finalized once the watermark passes the gap.
  *
  * Determinism note (matters for the cross-engine gate): rows with equal
  * timestamps order arbitrarily within the lag, but a zero gap can never
  * open a session, so the ROW SET of every session — and therefore any
  * per-session aggregate — is order-independent even under ties.
  */
object Sessionize {

  /** Tag each row with its per-key `session_id` (0-based, in time order):
    * a new session opens when the gap since the key's previous row
    * exceeds `gap` (same unit as `timeCol`). */
  def markSessions(df: DataFrame, keys: Seq[String], timeCol: String,
      gap: Long, out: String = "session_id"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(timeCol))
    val boundary =
      when(col(timeCol) - lag(col(timeCol), 1).over(w) > gap, 1L).otherwise(0L)
    df.withColumn("__brk", boundary)
      .withColumn(out,
        sum(col("__brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__brk")
  }

  /** One row per (keys, session): start/end time and row count. */
  def sessions(df: DataFrame, keys: Seq[String], timeCol: String,
      gap: Long): DataFrame = {
    val marked = markSessions(df, keys, timeCol, gap)
    val keyCols: Seq[Column] = keys.map(col) :+ col("session_id")
    marked.groupBy(keyCols: _*)
      .agg(min(col(timeCol)).as("start_t"), max(col(timeCol)).as("end_t"),
        count(lit(1)).as("n"))
  }

  /** Streaming sessionization: native `session_window` over an event-time
    * column with a watermark — one state entry per open session, emitted
    * (append mode) once the watermark passes `gapDuration` beyond its
    * last event. The streaming twin of [[sessions]]. */
  def streamingSessions(events: DataFrame, tsCol: String, keyCol: String,
      gapDuration: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gapDuration), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"), col(keyCol), col("n"))
}
