package graft

/** Benchmark entry: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line with per-query wall seconds.
  *
  * Measurement protocol (v3 — isolation-first):
  *   - one cold pass (session/JIT/codegen warmup — fixed overhead, not
  *     plan cost), then TWO warm passes; the MINIMUM warm time is
  *     reported. Round-2 evidence: 162 query executions in one JVM let
  *     accumulated broadcast blocks / listener state / GC debt inflate a
  *     handful of queries ~10× over their isolated warm time.
  *   - between timed passes the relation cache is cleared and the driver
  *     is GC'd: Spark's ContextCleaner frees broadcast/shuffle state via
  *     weak references, so without an explicit GC a long-lived driver
  *     carries every prior query's state into the next measurement.
  *   - the per-query scheduling floor of local-mode Spark (~0.1–0.2 s to
  *     launch any job) is measured separately and reported as "floor_sec"
  *     so plan cost and fixed overhead are distinguishable downstream.
  *
  * Failures are recorded as -1 with the error message in `errors`, and the
  * process exits nonzero — a crashing query must not masquerade as a fast
  * one.
  *
  * Each query is forced with `.count()`; the deterministic ORDER BY each
  * query carries for oracle hashing is eliminated by Catalyst under the
  * aggregate, so the measured plan is scan→filter→join→agg, not the sort.
  *
  * EXCEPTION — the codec-decode entries: those queries PROJECT decoded
  * columns (per-file PCM/pixel stats), and Catalyst rightly prunes the
  * decode expressions a count() does not need — so `.count()` measured
  * the scan floor, not the decode (the caveat SCALE.md carried since
  * round 10). They are forced instead with a xxhash64 checksum aggregate
  * over EVERY output column: one extra codegen'd hash per row (nothing
  * next to a frame decode), no pruning possible, still one scalar back
  * to the driver. */
object Bench {
  /** Entries whose output columns ARE the decode — force via checksum,
    * not count, so the bench curve reflects decode throughput. */
  val decodeForced: Set[String] = Set(
    "p_mm16_flac_streaminfo", "p_mm18_mp3_spectral", "p_mm19_mp3_escape",
    "p_mm20_mp3_short", "p_mm21_flac_pcm", "p_mm22_mp3_mixed",
    "p_mm23_mp3_stereo", "p_mm24_image_resize", "p_mm25_mp3_intensity",
    "p_mm26_wav_resample", "p_mm29_aac_spectral", "p_mm30_aac_short",
    "p_mm31_audio_to_wav", "p_mm32_aac_tns", "p_mm33_aac_pulse",
    "p_d10_image_dhash",
    // round-17 (verdict item #2): the fingerprint projections were
    // `.count()`-forced, which let Catalyst prune the fingerprint
    // expressions — their bench numbers measured corpus construction
    // only. Forcing the full output row RAISES their reported numbers;
    // that is the honest measurement, not a regression.
    "p_d13_audio_fingerprint", "p_d17_video_fingerprint",
    "p_d21_struct_fingerprint")

  /** Force `df` so no output column can be pruned away. The fold is
    * bit_xor, not sum — ANSI mode (Spark 4 default) would raise on a
    * Long-sum overflow of hash values; xor cannot overflow and is
    * order-insensitive. */
  def force(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
    import org.apache.spark.sql.functions.{col, expr, xxhash64}
    if (decodeForced(name)) {
      df.select(xxhash64(df.columns.map(col).toIndexedSeq: _*).as("h"))
        .agg(expr("bit_xor(h)")).collect()
      ()
    } else { df.count(); () }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val spark = GraftSession.get(master, cpus.toInt)

    // Release cross-query state so each measurement starts clean: cached
    // relations, then a driver GC so ContextCleaner reclaims dead
    // broadcast/shuffle blocks before the next timed run.
    def isolate(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      System.gc()
    }

    def time(body: => Unit): Either[String, Double] = {
      val t0 = System.nanoTime()
      try { body; Right((System.nanoTime() - t0) / 1e9) }
      catch { case e: Throwable => Left(Option(e.getMessage).getOrElse(e.getClass.getName)) }
    }

    // SPARK_GRAFT_BENCH_TRACE=1: per-query JVM-state trace to stderr —
    // cumulative GC time delta across the query's passes, live heap
    // after the final pass, and the on-disk block-manager footprint
    // (shuffle files accumulate across the run and are reclaimed
    // asynchronously by ContextCleaner, so a query inheriting a large
    // backlog shows up here). Diagnostic for full-run-vs-isolated
    // divergences like g2_grouped_topn at sf10.
    val trace = sys.env.get("SPARK_GRAFT_BENCH_TRACE").contains("1")
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def heapMB: Long = {
      val rt = Runtime.getRuntime
      (rt.totalMemory - rt.freeMemory) / (1024 * 1024)
    }
    def blockMgrMB: Long = {
      // Best-effort: symlinks are skipped (File.isFile/listFiles would
      // follow them — a link under a blockmgr dir could inflate the
      // figure or cycle the walk). Spark never creates links here.
      def size(f: java.io.File): Long =
        if (java.nio.file.Files.isSymbolicLink(f.toPath)) 0L
        else if (f.isFile) f.length()
        else Option(f.listFiles).getOrElse(Array.empty[java.io.File]).map(size).sum
      val tmp = new java.io.File(sys.props.getOrElse("java.io.tmpdir", "/tmp"))
      Option(tmp.listFiles).getOrElse(Array.empty[java.io.File])
        .filter(f => f.isDirectory && f.getName.startsWith("blockmgr-"))
        .map(size).sum / (1024 * 1024)
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val gc0 = if (trace) gcMs else 0L
      val cold = time(force(name, fn(spark, sfDir)))
      val warm = cold match {
        case Right(_) =>
          // ANY failing warm pass fails the query — an intermittent crash
          // (e.g. OOM) must surface in `errors`, not be silently replaced
          // by the surviving pass's time.
          val runs = (1 to 2).map { _ =>
            isolate()
            time(force(name, fn(spark, sfDir)))
          }
          runs.collectFirst { case l @ Left(_) => l }
            .getOrElse(Right(runs.collect { case Right(v) => v }.min))
        case left => left
      }
      if (trace) {
        val w = warm match { case Right(v) => f"$v%.3f"; case Left(_) => "-1" }
        val c = cold match { case Right(v) => f"$v%.3f"; case Left(_) => "-1" }
        System.err.println(s"BENCHTRACE $name cold=$c warm=$w " +
          s"gc_delta_ms=${gcMs - gc0} heap_mb=$heapMB blockmgr_mb=$blockMgrMB")
      }
      (name, warm)
    }

    // Contention re-timing: a loaded co-tenant window can inflate a
    // contiguous span of the sweep 4–6× (observed three rounds running)
    // while plans are unchanged. Any entry whose sweep time exceeds
    // K× its median across prior committed bench artifacts for the SAME
    // fixture is re-run (warm, min-of-2, isolated) after the sweep, and
    // BOTH numbers are reported — `queries` keeps the sweep's honest
    // value, `retimed` carries the re-measurement — so rounds are
    // diffable without forensic floor-reading. History files are
    // discovered from SPARK_GRAFT_BENCH_HISTORY (comma-separated files
    // or directories; default: BENCH_*.json in the working directory);
    // unreadable or fixture-mismatched history is advisory-only noise,
    // never an error.
    val historyMedians: Map[String, Double] = {
      val spec = sys.env.getOrElse("SPARK_GRAFT_BENCH_HISTORY", ".")
      val files = spec.split(",").iterator.map(_.trim).filter(_.nonEmpty)
        .map(new java.io.File(_)).flatMap { f =>
          if (f.isDirectory)
            Option(f.listFiles).getOrElse(Array.empty[java.io.File])
              .filter(x => x.isFile && x.getName.startsWith("BENCH_") &&
                x.getName.endsWith(".json"))
          else if (f.isFile) Array(f) else Array.empty[java.io.File]
        }.toSeq
      val curTag = new java.io.File(sfDir).getName
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val byName = scala.collection.mutable.Map.empty[String, List[Double]]
      files.foreach { f =>
        try {
          var root = om.readTree(f)
          // Driver-wrapped artifacts nest the bench line under "parsed".
          if (root.has("parsed") && root.get("parsed").isObject)
            root = root.get("parsed")
          val sfNode = root.get("sf")
          val tag =
            if (sfNode == null) ""
            else if (sfNode.isTextual) new java.io.File(sfNode.asText).getName
            else "sf" + sfNode.asText
          val qs = root.get("queries")
          if (tag == curTag && qs != null && qs.isObject) {
            qs.properties().forEach { e =>
              val v = e.getValue.asDouble(-1)
              if (v >= 0) byName(e.getKey) = v :: byName.getOrElse(e.getKey, Nil)
            }
          }
        } catch { case _: Throwable => () }
      }
      def median(vs: List[Double]): Double = {
        val s = vs.sorted
        if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
      }
      byName.toMap.map { case (k, vs) => (k, median(vs)) }
    }
    // K=1.5 with a RELATIVE excess floor (round-15 verdict: the old
    // 3× + 0.3 s absolute trigger let 2–3× contention inflations slip —
    // ~50 entries rode a loaded window into the committed sf0.1 curve
    // untouched). An entry re-times when it exceeds 1.5× its history
    // median AND the excess is both ≥ 0.15 s (absolute: don't chase
    // scheduler jitter on floor-bound entries) and ≥ 50% of the median
    // (relative: a slow entry must really move, not drift).
    val retimeK = sys.env.getOrElse("SPARK_GRAFT_RETIME_K", "1.5").toDouble
    val retimed: Seq[(String, Double)] = results.collect {
      case (name, Right(v)) if historyMedians.get(name)
        .exists(m => v > retimeK * m && v - m > math.max(0.15, 0.5 * m)) => name
    }.flatMap { name =>
      val fn = SparkEntry.queries(name)
      val runs = (1 to 2).map { _ => isolate(); time(force(name, fn(spark, sfDir))) }
        .collect { case Right(v) => v }
      if (runs.nonEmpty) Some((name, runs.min)) else None
    }

    // Local-mode scheduling floor: the cost of launching a trivial job.
    // A failing trivial job is a broken harness, not a floor of -1.
    isolate()
    val floorRuns = (1 to 3).map(_ => time(spark.range(1).count())).collect { case Right(v) => v }
    val floor = if (floorRuns.nonEmpty) floorRuns.min.toString else "null"

    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
                  case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString }

    val qs = results.map {
      case (k, Right(v)) => s""""$k":$v"""
      case (k, Left(_))  => s""""$k":-1"""
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, Left(m)) => s""""$k":"${esc(m.take(300))}"""" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, Right(v)) => v }.sum
    // Floor-normalized headline: the raw total embeds N× the local-mode
    // scheduling floor, so host noise in that fixed cost (a loaded
    // co-tenant inflating trivial-job launch from 0.06 s to 0.5 s)
    // reads as a phantom regression when comparing runs. Subtracting
    // the measured floor from every entry isolates the data-dependent
    // work, which IS comparable across windows. The MEDIAN of the
    // floor probes is subtracted (one lucky fast probe must not set
    // the headline); the min is still reported as floor_sec.
    val aboveFloor = if (floorRuns.nonEmpty) {
      val s = floorRuns.sorted
      val med = if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
      results.collect { case (_, Right(v)) => math.max(v - med, 0.0) }.sum.toString
    } else "null"
    val retimedJson = retimed.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    // Effective parallelism fields (round-17 verdict item #8): at sf0.1
    // most entries are scheduling-floor-bound, so low/high-core ratios
    // sit ≈ 1 and a downstream heuristic cannot tell "honors
    // $SPARK_GRAFT_CPUS" from "ignores it". Emitting the master and the
    // context's actual defaultParallelism lets that check clear itself.
    println(s"""{"metric":"total_warm","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"floor_sec":$floor,"total_above_floor":$aboveFloor,"retimed":$retimedJson,"cpus":${cpus.toInt},"master":"${esc(master)}","default_parallelism":${spark.sparkContext.defaultParallelism},"sf":"$sfDir"}""")
    spark.stop()
    if (results.exists(_._2.isLeft)) sys.exit(1)
  }
}
