package graft

/** In-suite perf regression guard: every registered query must stay within
  * a small multiple of the local-mode scheduling floor at sf0.01, so a
  * pathological plan (the class of regression this guards against — e.g.
  * round 2's 14 s grouped-top-N from a lost broadcast, or an accidental
  * all-pairs join) fails `sbt test` immediately instead of waiting for the
  * driver's end-of-round bench.
  *
  * Protocol mirrors `graft.Bench`: one cold pass (codegen/JIT warmup, and
  * for `p_*` entries the one-time ingest artifact build), then a warm pass;
  * a query only fails after a SECOND warm pass also exceeds its cap, so a
  * GC pause can't flake the suite. Caps are deliberately loose —
  * max(3× floor, 1 s) for §2 parity queries, max(20× floor, 8 s) for the
  * `p_*` pipeline extensions (sketch banding / candidate verification are
  * real multi-stage jobs) — this is a tripwire for order-of-magnitude
  * regressions, not a benchmark.
  */
class BenchSpec extends SparkSpec {
  private val sf001 = "/root/testdata/sf0.01"

  private def timed(body: => Unit): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  test("every registry query stays within its cap at sf0.01 (warm, in-session)") {
    // scheduling floor: the per-job overhead of this JVM *right now*. On a
    // loaded/slow host the floor runs 5-7x the idle-machine 0.05 s, and a
    // multi-job plan (AQE semi-joins run ~10-15 jobs) scales with it — so
    // caps must be floor-RELATIVE, with the absolute term only binding on
    // fast machines. 15x floor still trips the regression class this
    // guards against (round 2's lost broadcast was ~58x floor).
    def floorNow() = (1 to 3).map(_ => timed(spark.range(1).count())).min
    def capFor(name: String, floor: Double): Double = name match {
      // the quantized-ANN entries read persisted packed codes and rank with
      // a codegen'd byte dot — hold them to a tighter bar than the generic
      // pipeline cap so a lifecycle regression (query-time quantization,
      // interpreted HOF dot) trips the suite
      case "p_s5_quantized_topk" => math.max(10 * floor, 2.0)
      case "p_s6_ivf_sq_topk" => math.max(12 * floor, 2.5)
      case p if p.startsWith("p_") => math.max(20 * floor, 8.0)
      case _ => math.max(15 * floor, 1.0)
    }
    val floor0 = floorNow()

    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      fn(spark, sf001).count() // cold: warmup + one-time index builds
      val warm1 = timed(fn(spark, sf001).count())
      if (warm1 <= capFor(name, floor0)) None
      else {
        // the environment may have slowed since the start-of-sweep floor
        // sample (GC, host contention): re-measure the floor NOW, recompute
        // the cap against the worse of the two, and grant one retry — a
        // genuine plan regression fails both passes at any floor
        val floor1 = math.max(floor0, floorNow())
        val cap = capFor(name, floor1)
        val best = math.min(warm1, timed(fn(spark, sf001).count()))
        if (best > cap)
          Some(f"$name: $best%.2f s > cap $cap%.2f s (floor $floor1%.3f s)")
        else None
      }
    }
    assert(offenders.isEmpty,
      s"queries exceeding their perf cap (start floor ${f"$floor0%.3f"} s):\n" +
        offenders.mkString("\n"))
  }

  // The registry sweep above runs at fixture scale, where the iterative
  // and window operators are dominated by per-round scheduling floors —
  // a data-PROPORTIONAL regression (lost partial agg, accidental
  // all-pairs, per-round full-corpus re-scan) would hide inside the
  // floor. These two rows run the operator CORES at 1× and 10× generated
  // volume and bound the growth: ~linear ops stay well inside 12×; a
  // quadratic slip shows up as ~100× and trips immediately. Relative
  // caps adapt to machine speed; the absolute floor term absorbs tiny-t1
  // jitter.
  import org.apache.spark.sql.functions._

  private def timedWarm(body: => Unit): Double = {
    body // warm: codegen + JIT
    timed(body)
  }

  test("sessionization scales ~linearly: 10x keys*rows within 12x time") {
    def activity(keys: Int, perKey: Int) =
      spark.range(keys.toLong * perKey)
        .select((col("id") % keys).as("acct"),
          ((col("id") / keys) * 37 % 997).as("ts"))
    def run(keys: Int): Double = timedWarm {
      graft.operators.Sessionize.sessions(
        activity(keys, perKey = 20), Seq("acct"), "ts", gap = 60L).count()
    }
    val t1 = run(5000)    // 100k rows
    val t10 = run(50000)  // 1M rows — 10× keys, same per-key depth
    info(f"sessions: 1x $t1%.2f s, 10x $t10%.2f s")
    assert(t10 <= math.max(12 * t1, 2.0),
      f"10x sessionization took $t10%.2f s vs 1x $t1%.2f s — superlinear growth")
  }

  test("cluster resolution scales ~linearly: 10x edges within 12x time") {
    // disjoint 64-node chains: diameter (and so the doubling round count)
    // is IDENTICAL at both scales; only per-round volume grows 10×
    def chains(nodes: Long) =
      spark.range(nodes - 1).filter(col("id") % 64 =!= 63)
        .select(col("id").as("a_id"), (col("id") + 1).as("b_id"))
    def run(nodes: Long): Double = timedWarm {
      graft.pipeline.Components.connectedComponents(chains(nodes)).count()
    }
    val t1 = run(64 * 500L)   // 32k nodes
    val t10 = run(64 * 5000L) // 320k nodes
    info(f"components: 1x $t1%.2f s, 10x $t10%.2f s")
    assert(t10 <= math.max(12 * t1, 4.0),
      f"10x cluster resolution took $t10%.2f s vs 1x $t1%.2f s — superlinear growth")
  }
}
