package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Range (point-in-interval) join: boundary semantics, bin-spanning
  * intervals, overlap multiplicity, and brute-force equivalence on the
  * real events table. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  // binSize 10 on a numeric axis; interval (25..52) spans 4 bins
  private def points = Seq(
    ("a", 1L, 24L), ("a", 2L, 25L), ("a", 3L, 40L), ("a", 4L, 51L),
    ("a", 5L, 52L), ("b", 6L, 30L),
  ).toDF("k", "pid", "t")

  private def intervals = Seq(
    ("a", 100L, 25L, 52L),  // [25, 52) spanning bins 2..5
    ("a", 101L, 45L, 60L),  // overlaps the first
    ("b", 102L, 50L, 40L),  // inverted -> empty, must not match or crash
  ).toDF("k", "iid", "s", "e")

  test("half-open [s, e) boundaries, bin-spanning intervals, overlap " +
      "multiplicity, key isolation") {
    val out = RangeJoin.pointInInterval(points, intervals, Seq("k"),
        "t", "s", "e", binSize = 10L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(identity)
    assert(out === Array(
      (2L, 100L),            // t = s matches (inclusive start)
      (3L, 100L),            // mid-interval, different bin than s
      (4L, 100L), (4L, 101L), // overlapping windows -> one row each
      (5L, 101L),            // t = 52 is 100's exclusive end, inside 101
      // pid 1 (t = 24 < s) and pid 6 (no same-key live interval) absent
    ))
  }

  test("matches the brute-force inequality join on the real events table") {
    val e = Tables.events(spark, sf0001)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val incidents = e.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("incident_id"),
        col("ts").as("start_ts"),
        (col("ts") + expr("INTERVAL 10 MINUTES")).as("end_ts"))
    val binned = RangeJoin.pointInInterval(clicks, incidents, Seq("user_id"),
        "ts", "start_ts", "end_ts", binSize = 600L * 1000000L)
      .select("event_id", "incident_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val bruteInc = incidents
      .select(col("user_id").as("i_uid"), col("incident_id"),
        col("start_ts"), col("end_ts"))
    val brute = clicks
      .join(bruteInc, col("user_id") === col("i_uid") &&
        col("ts") >= col("start_ts") && col("ts") < col("end_ts"))
      .select("event_id", "incident_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(binned.nonEmpty, "fixture should produce at least one match")
    assert(binned === brute)
  }

  // left intervals for overlap tests (right side reuses `intervals`)
  private def spans = Seq(
    ("a", 200L, 10L, 30L),  // overlaps 100 [25,52) in 100's first bin
    ("a", 201L, 48L, 95L),  // overlaps 100 AND 101, spanning many bins
    ("a", 202L, 52L, 60L),  // touches 100 only at its exclusive end -> no
    ("b", 203L, 0L, 99L),   // key b has no live right interval
  ).toDF("k", "sid", "ss", "se")

  test("interval overlap: half-open semantics, count-once across shared " +
      "bins, key isolation") {
    val out = RangeJoin.intervalOverlap(spans, intervals, Seq("k"),
        "ss", "se", "s", "e", binSize = 10L)
      .select("sid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(identity)
    assert(out === Array(
      (200L, 100L),            // [10,30) ∩ [25,52) = [25,30)
      (201L, 100L), (201L, 101L), // [48,95) overlaps both, ONE row each
      (202L, 101L),            // [52,60) misses 100 (its exclusive end)
                               // but sits inside 101 [45,60)
      // 203 has no same-key live right interval; inverted right
      // interval 102 stays dead
    ))
  }

  test("interval overlap matches the brute-force inequality join on the " +
      "real events table") {
    val e = Tables.events(spark, sf0001)
    def windows(tpe: String, idAs: String, sAs: String, eAs: String) =
      e.filter(col("event_type") === tpe)
        .select(col("user_id"), col("event_id").as(idAs),
          col("ts").as(sAs), (col("ts") + expr("INTERVAL 6 HOURS")).as(eAs))
    val binned = RangeJoin.intervalOverlap(
        windows("error", "iid", "is", "ie"),
        windows("signup", "sid", "ss", "se"),
        Seq("user_id"), "is", "ie", "ss", "se", binSize = 3600L * 1000000L)
      .select("iid", "sid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val r = windows("signup", "sid", "ss", "se")
      .withColumnRenamed("user_id", "r_uid")
    val brute = windows("error", "iid", "is", "ie")
      .join(r, col("user_id") === col("r_uid") &&
        col("is") < col("se") && col("ss") < col("ie"))
      .select("iid", "sid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(binned.nonEmpty, "fixture should produce at least one overlap")
    assert(binned === brute)
  }

  test("SCD-2-style far-future interval end completes without row explosion") {
    // "valid until 9999": unclamped this end replicates to ~10^12 bins
    // (an executor OOM); clamped to the points' observed axis range it
    // contributes a handful of rows and still matches correctly
    val scd = Seq(
      ("a", 300L, 30L, 9999999999999L),  // open-ended validity
      ("a", 301L, 0L, 9999999999999L),
    ).toDF("k", "iid", "s", "e")
    val out = RangeJoin.pointInInterval(points, scd, Seq("k"),
        "t", "s", "e", binSize = 10L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(identity)
    assert(out === Array((1L, 301L), (2L, 301L), (3L, 300L), (3L, 301L),
      (4L, 300L), (4L, 301L), (5L, 300L), (5L, 301L)))
  }

  test("SCD-2 far-future ends complete in interval overlap too") {
    val scd = Seq(("a", 400L, 20L, 9999999999999L)).toDF("k", "iid", "s", "e")
    val out = RangeJoin.intervalOverlap(spans, scd, Seq("k"),
        "ss", "se", "s", "e", binSize = 10L)
      .select("sid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(identity)
    assert(out === Array((200L, 400L), (201L, 400L), (202L, 400L)))
  }

  test("post-clamp replication beyond maxBins raises a clear error, not an OOM") {
    // points themselves span the whole wide axis, so the clamp cannot
    // shrink the interval — the cap must fire with plan language
    val wide = Seq(("a", 1L, 0L), ("a", 2L, 100000L)).toDF("k", "pid", "t")
    val iv = Seq(("a", 500L, 0L, 100000L)).toDF("k", "iid", "s", "e")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(wide, iv, Seq("k"), "t", "s", "e",
        binSize = 1L, maxBins = 100L).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("raise binSize")),
      s"expected the binSize guidance in: ${msgs(ex)}")
  }

  test("plan shape: pair join is an equi-join on (keys, bin) — no cartesian") {
    val plan = RangeJoin.pointInInterval(points, intervals, Seq("k"),
        "t", "s", "e", binSize = 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"range join must stay an equi-join:\n$plan")
    // the point×interval pairing must be a hash equi-join on (k, __bin);
    // the only nested-loop allowed is the 1-row axis-bounds broadcast
    assert(plan.contains("HashJoin"), s"expected a hash equi-join:\n$plan")
    val nlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(nlj <= 1, s"only the 1-row bounds broadcast may nested-loop:\n$plan")
  }
}
