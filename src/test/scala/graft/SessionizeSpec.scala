package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.Sessionize

/** Gap-based sessionization: batch boundary/ordinal semantics (including
  * timestamp ties) and the streaming session_window twin. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("markSessions: gap boundaries, 0-based ordinals, per-key isolation") {
    val df = Seq(
      ("a", 100L), ("a", 150L), ("a", 300L), ("a", 310L), ("a", 600L),
      ("b", 100L), ("b", 500L)
    ).toDF("k", "ts")
    val got = Sessionize.markSessions(df, Seq("k"), "ts", gap = 60L)
      .orderBy(col("k"), col("ts"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      ("a", 100L, 0L), ("a", 150L, 0L), // 50 <= gap: same session
      ("a", 300L, 1L), ("a", 310L, 1L), // 150 > gap: new session
      ("a", 600L, 2L),
      ("b", 100L, 0L), ("b", 500L, 1L) // per-key: b's gap also splits
    ))
  }

  test("sessions: per-session aggregates; tie timestamps never split") {
    val df = Seq(
      ("a", 100L), ("a", 161L), ("a", 161L), ("a", 400L)
    ).toDF("k", "ts")
    val got = Sessionize.sessions(df, Seq("k"), "ts", gap = 60L)
      .orderBy(col("session_id"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // 161-100=61 > 60 opens a session; the two 161s stay together whatever
    // their internal order; 400 opens a third
    assert(got.toSeq === Seq((0L, 100L, 100L, 1L), (1L, 161L, 161L, 2L), (2L, 400L, 400L, 1L)))
  }

  test("sessions property: matches a naive driver-side fold on 400 random events") {
    val rng = new scala.util.Random(23)
    val gap = 37L
    val events = Seq.fill(400)((s"k${rng.nextInt(6)}", rng.nextInt(2000).toLong))
    val got = Sessionize.sessions(events.toDF("k", "ts"), Seq("k"), "ts", gap)
      .collect()
      .map(r => (r.getString(0), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
    val expected = events.groupBy(_._1).view.mapValues { es =>
      val ts = es.map(_._2).sorted
      ts.tail.foldLeft(Vector(Vector(ts.head))) { (acc, t) =>
        if (t - acc.last.last > gap) acc :+ Vector(t)
        else acc.init :+ (acc.last :+ t)
      }.map(s => (s.head, s.last, s.size.toLong)).sortBy(_._1)
    }.toMap
    assert(got === expected)
  }

  test("streamingSessions: gap merges within, splits across; append on watermark") {
    implicit val sqlCtx = spark.sqlContext
    def ts(minute: Int, second: Int = 0): Timestamp =
      Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$second%02d")
    val input = MemoryStream[(Timestamp, String)]
    val sessions = Sessionize.streamingSessions(
      input.toDS().toDF("ts", "k"), "ts", "k",
      gapDuration = "1 minute", watermarkDelay = "1 minute")
    val query = sessions.writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append()).start()
    try {
      // k=a: events at 10:00:00 and 10:00:30 chain into one session
      // (gap < 1 min); k=b: a lone event
      input.addData((ts(0, 0), "a"), (ts(0, 30), "a"), (ts(0, 10), "b"))
      query.processAllAvailable()
      // advance the watermark far past every open session's gap
      input.addData((ts(10, 0), "w"))
      query.processAllAvailable()
      val got = spark.sql("SELECT k, n FROM sess WHERE k IN ('a','b') ORDER BY k")
        .collect().map(r => (r.getString(0), r.getLong(1)))
      assert(got.toSeq === Seq(("a", 2L), ("b", 1L)))
      // a's session spans first to last event + gap
      val span = spark.sql(
        "SELECT sess_start, sess_end FROM sess WHERE k = 'a'").collect().head
      assert(span.getTimestamp(0) === ts(0, 0))
      assert(span.getTimestamp(1) === ts(1, 30)) // last event + 1 min gap
    } finally query.stop()
  }
}
