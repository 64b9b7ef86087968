package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** As-of join semantics: backward inclusive/strict matching, tolerance,
  * left-outer nulls, and equivalence with a brute-force per-row argmax
  * on the real events table. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def quotes = Seq(
    // (key, ts, quote)
    ("a", 10L, 1.0), ("a", 20L, 2.0), ("a", 30L, 3.0),
    ("b", 15L, 9.0),
  ).toDF("k", "qt", "quote")

  private def trades = Seq(
    // (key, ts, size): before-first, exactly-on, between, after-last, no-key
    ("a", 5L, 100L), ("a", 20L, 200L), ("a", 25L, 300L), ("a", 99L, 400L),
    ("c", 50L, 500L),
  ).toDF("k", "tt", "size")

  test("backward inclusive: each left row gets the latest right at-or-before") {
    val out = AsOfJoin.asOf(trades, quotes, Seq("k"), "tt", "qt")
      .select("k", "tt", "size", "asof_qt", "asof_quote")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).sortBy(t => (t._1, t._2))
    assert(out === Array(
      ("a", 5L, None, None),            // before the first quote
      ("a", 20L, Some(20L), Some(2.0)), // equal ts matches (inclusive)
      ("a", 25L, Some(20L), Some(2.0)), // between quotes -> earlier one
      ("a", 99L, Some(30L), Some(3.0)), // after the last
      ("c", 50L, None, None),           // key absent on the right
    ))
  }

  test("strict mode excludes the equal-timestamp right row") {
    val out = AsOfJoin.asOf(trades, quotes, Seq("k"), "tt", "qt", strict = true)
      .filter(col("tt") === 20L).select("asof_qt").collect()
    assert(out.map(r => Option(r.get(0))) === Array(Some(10L)))
  }

  test("tolerance nulls matches older than leftTs - tolerance") {
    val out = AsOfJoin.asOf(trades, quotes, Seq("k"), "tt", "qt",
        tolerance = Some(lit(10L)))
      .select("k", "tt", "asof_qt").collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.get(2)))).sortBy(t => (t._1, t._2))
    assert(out === Array(
      ("a", 5L, None),
      ("a", 20L, Some(20L)),  // gap 0 <= 10
      ("a", 25L, Some(20L)),  // gap 5 <= 10
      ("a", 99L, None),       // gap 69 > 10 -> masked
      ("c", 50L, None),
    ))
  }

  test("matches the brute-force per-row argmax on the real events table") {
    val e = Tables.events(spark, sf0001)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_event_id"))
    // brute force: theta-join all earlier purchases, keep the max (ts, id);
    // fully renamed right side — Spark rejects same-lineage self-joins
    // with shared attribute ids
    val pr = p.select(col("user_id").as("p_uid"), col("p_ts"), col("p_event_id"))
    val brute = e.join(pr, col("user_id") === col("p_uid") && col("p_ts") <= col("ts"), "left")
      .groupBy(col("event_id"))
      .agg(max(struct(col("p_ts"), col("p_event_id"))).as("m"))
      .select(col("event_id"), col("m.p_event_id").as("p_event_id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val asof = AsOfJoin.asOf(e, p, Seq("user_id"), "ts", "p_ts",
        rightPrefix = "")
      .select(col("event_id"), col("p_event_id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(asof.size === brute.size)
    assert(asof === brute)
  }

  test("bucketed variant: identical output to plain asOf on a hot-key fixture") {
    // one key owns ~90% of both sides (the skew shape the variant
    // exists for), spanning many buckets; bucket edges deliberately
    // fall on timestamps (ts 20 with bucketSize 20) to exercise the
    // inclusive-tie-at-seam path
    val hotQuotes = (1 to 60).map(i => ("hot", i * 7L, i.toDouble)) ++
      Seq(("cold", 15L, 9.0))
    val hotTrades = (1 to 90).map(i => ("hot", i * 5L, i.toLong)) ++
      Seq(("cold", 5L, 500L), ("cold", 16L, 600L), ("never", 50L, 700L))
    val q = hotQuotes.toDF("k", "qt", "quote")
    val t = hotTrades.toDF("k", "tt", "size")
    for (strict <- Seq(false, true); tol <- Seq(None, Some(lit(11L)))) {
      val plain = AsOfJoin.asOf(t, q, Seq("k"), "tt", "qt",
          strict = strict, tolerance = tol)
        .collect().map(_.toSeq).sortBy(_.toString)
      val bucketed = AsOfJoin.asOfBucketed(t, q, Seq("k"), "tt", "qt",
          bucketSize = 20L, strict = strict, tolerance = tol)
        .collect().map(_.toSeq).sortBy(_.toString)
      assert(bucketed === plain, s"strict=$strict tol=${tol.isDefined}")
    }
  }

  test("bucketed variant agrees with plain asOf on the real events table") {
    val e = Tables.events(spark, sf0001)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_event_id"))
    val plain = AsOfJoin.asOf(e, p, Seq("user_id"), "ts", "p_ts", rightPrefix = "")
      .select(col("event_id"), col("p_event_id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val bucketed = AsOfJoin.asOfBucketed(e, p, Seq("user_id"), "ts", "p_ts",
        bucketSize = 6L * 3600L * 1000000L, rightPrefix = "") // 6 h buckets
      .select(col("event_id"), col("p_event_id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(bucketed === plain)
  }

  test("bucketed variant keeps null-key and null-timestamp rows like plain asOf") {
    // Window.partitionBy groups nulls into ordinary partitions, so plain
    // asOf emits rows with null keys/timestamps; the bucketed stitch
    // join must be null-safe or those rows silently vanish
    val q = Seq((Some("a"), Some(10L), 1.0), (None, Some(5L), 2.0),
      (Some("a"), None, 3.0)).toDF("k", "qt", "quote")
    val t = Seq((Some("a"), Some(20L), 1L), (None, Some(7L), 2L),
      (None, Some(3L), 3L), (Some("a"), None, 4L), (Some("b"), Some(9L), 5L))
      .toDF("k", "tt", "size")
    val plain = AsOfJoin.asOf(t, q, Seq("k"), "tt", "qt")
      .collect().map(_.toSeq).sortBy(_.toString)
    val bucketed = AsOfJoin.asOfBucketed(t, q, Seq("k"), "tt", "qt",
        bucketSize = 4L)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(bucketed.length === t.count())
    assert(bucketed === plain)
  }

  test("bucketed plan partitions the carry window by (keys, bucket)") {
    val plan = AsOfJoin.asOfBucketed(trades, quotes, Seq("k"), "tt", "qt",
        bucketSize = 20L)
      .queryExecution.executedPlan.toString
    // the within-bucket pass must exchange on (k, __bk) — a hot key's
    // history splits across buckets instead of one window partition
    assert("hashpartitioning\\(k[#0-9]*, __bk".r.findAllIn(plan).nonEmpty,
      s"expected a (keys, bucket) exchange:\n$plan")
  }

  test("plan shape: one exchange on the keys, no join in the plan") {
    val plan = AsOfJoin.asOf(trades, quotes, Seq("k"), "tt", "qt")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "as-of must not plan a join")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 1,
      s"expected exactly one exchange, got:\n$plan")
  }
}
