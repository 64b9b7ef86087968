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
    val floor = (1 to 3).map(_ => timed(spark.range(1).count())).min
    val parityCap = math.max(3 * floor, 1.0)
    val pipelineCap = math.max(20 * floor, 8.0)
    // the quantized-ANN entries read persisted packed codes and rank with
    // a codegen'd byte dot — hold them to a tighter bar than the generic
    // pipeline cap so a lifecycle regression (query-time quantization,
    // interpreted HOF dot) trips the suite
    val tightCaps = Map(
      "p_s5_quantized_topk" -> math.max(10 * floor, 2.0),
      "p_s6_ivf_sq_topk" -> math.max(12 * floor, 2.5))

    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val cap = tightCaps.getOrElse(name,
        if (name.startsWith("p_")) pipelineCap else parityCap)
      fn(spark, sf001).count() // cold: warmup + one-time index builds
      val warm1 = timed(fn(spark, sf001).count())
      val best = if (warm1 <= cap) warm1 else math.min(warm1, timed(fn(spark, sf001).count()))
      if (best > cap) Some(f"$name: $best%.2f s > cap $cap%.2f s") else None
    }
    assert(offenders.isEmpty,
      s"queries exceeding their perf cap (floor ${f"$floor%.3f"} s):\n" + offenders.mkString("\n"))
  }
}
