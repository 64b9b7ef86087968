package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, RangeJoin}

/** Growth tripwires for the temporal joins — the suite's heaviest
  * registered plans (g5 interval-overlap, g3/g3b as-of). Same contract as
  * BenchSpec's linear-growth family: 10x the input within ~12x the warm
  * wall time, so a superlinear slip (replication blow-up, a lost clamp, a
  * window that re-widens to whole-key history) fails `sbt test`
  * immediately instead of surfacing as an end-of-round bench regression.
  *
  * Plus the hot-key wall-time crossover the bucketed as-of exists for:
  * plain asOf puts a key's ENTIRE history in one window partition (one
  * task, however large), asOfBucketed splits it into ~span/bucketSize
  * parallel tasks. On a skewed fixture the bucketed form must win
  * outright — that is its reason to exist, measured, not claimed.
  */
class TemporalGrowthSpec extends SparkSpec with GrowthChecks {

  private def timed(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  private def timedWarm(body: => Unit): Double = {
    body // warm: codegen + JIT + any one-time exchange reuse
    timed(body)
  }

  test("interval-overlap join scales ~linearly: 10x keys*rows within 12x time") {
    // per-key interval count and span are FIXED; only the key count grows
    // 10x, so output rows and bin replication both grow ~10x — the linear
    // regime the START-bin clamp guarantees
    def seq(keys: Int) = (col("id") / keys).cast("long")
    def left(keys: Int) = spark.range(keys * 20L).select(
      (col("id") % keys).as("k"),
      (seq(keys) * 37 % 997 * 10).as("ls"),
      (seq(keys) * 37 % 997 * 10 + 50 + col("id") % 7 * 30).as("le"))
    def right(keys: Int) = spark.range(keys * 20L).select(
      (col("id") % keys).as("k"),
      (seq(keys) * 53 % 997 * 10).as("rs"),
      (seq(keys) * 53 % 997 * 10 + 40 + col("id") % 5 * 35).as("re"))
    def run(keys: Int): Unit = {
      RangeJoin.intervalOverlap(left(keys), right(keys), Seq("k"),
        "ls", "le", "rs", "re", binSize = 200L).count()
      ()
    }
    assertGrowth("interval-overlap", factor = 12, absFloor = 4.0)(run(200))(run(2000))
  }

  test("bucketed as-of scales ~linearly: 10x keys*rows within 12x time") {
    // fixed per-key history (50 left + 50 right rows over a fixed span),
    // 10x keys; bucket count per key is constant, so pass 1 (within-
    // bucket window), pass 2 (bucket summaries), and the stitch all grow
    // ~10x in rows with no per-task blow-up
    def seq(keys: Int) = (col("id") / keys).cast("long")
    def left(keys: Int) = spark.range(keys * 50L).select(
      (col("id") % keys).as("k"),
      (seq(keys) * 193 % 10000).as("ts"),
      col("id").as("l_id"))
    def right(keys: Int) = spark.range(keys * 50L).select(
      (col("id") % keys).as("k"),
      (seq(keys) * 211 % 10000).as("rts"),
      col("id").as("r_val"))
    // aggregate over the MATCHED column: a bare count() lets column
    // pruning delete the as-of window itself and times nothing
    def run(keys: Int): Unit = {
      AsOfJoin.asOfBucketed(left(keys), right(keys), Seq("k"),
        "ts", "rts", bucketSize = 1000L)
        .agg(sum("asof_r_val")).collect()
      ()
    }
    assertGrowth("bucketed as-of", factor = 12, absFloor = 4.0)(run(200))(run(2000))
  }

  test("hot-key crossover: asOfBucketed beats plain asOf on a single hot key") {
    // ONE key holding the entire history: plain asOf's window is a single
    // 1.2M-row task; bucketed splits it into ~60 key-bucket tasks. This is
    // the EXTREME-skew shape (zero-address, celebrity account) the
    // bucketed variant is for — if it ever stops winning here, its reason
    // to exist is gone.
    val n = 2500000L
    val span = 1000000L
    val left = spark.range(n).select(lit(0L).as("k"),
      (col("id") * 7 % span).as("ts"), col("id").as("l_id"))
    val right = spark.range(n).select(lit(0L).as("k"),
      (col("id") * 11 % span).as("rts"), col("id").as("r_val"))
    // aggregate over the MATCHED column so the window/stitch cannot be
    // column-pruned away — both variants do their full work
    def plain(): Unit = {
      AsOfJoin.asOf(left, right, Seq("k"), "ts", "rts")
        .agg(sum("asof_r_val")).collect()
      ()
    }
    def bucketed(): Unit = {
      AsOfJoin.asOfBucketed(left, right, Seq("k"), "ts", "rts",
        bucketSize = span / 256)
        .agg(sum("asof_r_val")).collect()
      ()
    }
    def floor() = (1 to 3).map(_ => timed(spark.range(1).count())).min
    var tP = timedWarm(plain())
    var tB = timedWarm(bucketed())
    info(f"hot key ($n rows/side): plain $tP%.2f s, bucketed $tB%.2f s")
    if (tB >= tP) { // one retry before failing: absorb a GC pause
      tP = timed(plain()); tB = timed(bucketed())
      info(f"retry: plain $tP%.2f s, bucketed $tB%.2f s")
    }
    val f = floor()
    if (tP <= math.max(3 * f, 0.5)) cancel(
      f"plain as-of ran $tP%.2f s, within noise of the $f%.3f s job floor " +
        "on this host — the crossover ordering would be noise; skipping")
    assert(tB < tP,
      f"bucketed as-of $tB%.2f s did not beat plain $tP%.2f s on a " +
        "single hot key — the skew split is not paying for its passes")
  }
}
