package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Evidence that the two dormant-at-fixture-scale runtime features enabled
  * in [[GraftSession]] (runtime bloom-filter join pruning, AQE skew-join
  * split) actually FIRE and do what the 100 TB scale notes claim — not
  * just that their configs are set.
  *
  * Their default activation thresholds are cluster-sized (bloom filter:
  * application-side scan > 10 GB; skew split: partition > 256 MB), so at
  * fixture scale they stay dormant by design. These specs scale the
  * thresholds down by roughly the same factor the fixture is scaled down
  * from production, then pin (a) the optimized/final PLAN SHAPE — the
  * injected `might_contain` filter surviving AQE replanning,
  * the `SortMergeJoin(skew=true)` marker — and (b) the runtime effect in
  * METRICS: the bloom filter's probe-side row pruning, and the skewed
  * partition actually splitting into more tasks than the static shuffle
  * partition count. Result equality against the feature-off plan guards
  * against the optimization changing answers.
  */
class RuntimeOptSpec extends SparkSpec {

  /** Every node of an executed adaptive plan: `collect` stops at
    * QueryStageExec boundaries (they are leaves wrapping their stage's
    * plan), so walk through them and through AQE roots explicitly. */
  private def flatten(p: org.apache.spark.sql.execution.SparkPlan):
      Seq[org.apache.spark.sql.execution.SparkPlan] =
    p +: (p.children.flatMap(flatten) ++ (p match {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        flatten(q.plan)
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case _ => Seq.empty
    }))

  /** Set SQL confs for the duration of `body`, restoring prior values
    * (suites share one session; sbt runs forked suites sequentially). */
  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("runtime bloom-filter pruning injects and applies a probe-side filter " +
      "on a fact⋈filtered-dim shuffle join") {
    // 10x the sf0.01 fact volume; parquet so the application side is a
    // file scan with real size stats (the rule keys on scan size).
    val dir = Files.createTempDirectory("graft-bloom").toString
    val factDir = s"$dir/fact"
    val dimDir = s"$dir/dim"
    spark.range(500000)
      .select(col("id").as("row_id"), (col("id") % 1000).as("fk"),
        lpad(col("id").cast("string"), 40, "x").as("payload"))
      .write.mode("overwrite").parquet(factDir)
    spark.range(1000)
      .select(col("id").as("dk"), (col("id") % 50).as("cat"))
      .write.mode("overwrite").parquet(dimDir)

    def joined() = {
      val fact = spark.read.parquet(factDir)
      val dim = spark.read.parquet(dimDir).filter(col("cat") === 7)
      fact.join(dim, col("fk") === col("dk"))
    }

    withConf(
      // force a shuffle join: broadcast of the dim would bypass the rule
      // (at 100 TB the dim side of interest is too big to broadcast)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // production default is 10 GB; the fixture fact scan is ~5 MB, the
      // same ~2000x the rule's selectivity machinery sees at cluster scale
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB"
    ) {
      val q = joined()
      // (a) plan shape at optimization time: the dim's selective filter
      // seeded a bloom aggregate, probed on the fact side pre-shuffle
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain"),
        s"no might_contain in optimized plan:\n$opt")

      val qe = q.queryExecution
      val n = qe.executedPlan.execute().count() // run the adaptive plan
      // dim filter keeps 20 of 1000 keys; fact has 500 rows per key
      assert(n == 20L * 500, s"join produced $n rows, expected 10000")

      // (b) the filter SURVIVED AQE replanning into the final plan...
      val finalPlan = qe.executedPlan.toString
      assert(finalPlan.contains("might_contain"),
        s"bloom filter lost during AQE replanning:\n$finalPlan")
      // ...and actually pruned at runtime: the probe-side filter passed
      // ~10k of 500k fact rows (+ a tiny false-positive tail) into the
      // shuffle — this is the claimed 100 TB win, measured
      val pruned = flatten(qe.executedPlan).collect {
        case f: FilterExec if f.condition.toString.contains("might_contain") =>
          f.metrics("numOutputRows").value
      }
      assert(pruned.nonEmpty, s"no might_contain FilterExec in final plan:\n$finalPlan")
      assert(pruned.head < 50000,
        s"bloom filter passed ${pruned.head} of 500000 fact rows — not pruning")

      // answers must not change with the feature off
      withConf("spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        val n0 = joined().count()
        assert(n0 == n, s"bloom-filtered join returned $n rows, plain join $n0")
      }
    }
  }

  test("AQE splits a skewed sort-merge join partition into parallel tasks") {
    // one hot key holding ~91% of the probe side with a wide payload, so
    // its shuffle partition is ~100x the median — the shape AQE's skew
    // split exists for (and the unplanned complement to SkewJoin.saltedJoin)
    // skew detection reads COMPRESSED map-output sizes, so the payload
    // must be high-entropy (md5 hex) — a padded constant compresses the
    // hot partition below any threshold and hides the skew
    val hot = 400000L
    val rest = 20000L
    // 32 input partitions: a skewed reduce partition can only split at
    // map-output block boundaries, so the map side must have more tasks
    // than the wanted split count (true at scale by construction)
    val left = spark.range(hot + rest).repartition(32).select(
      when(col("id") < hot, lit(0L)).otherwise(col("id") % 97 + 1).as("k"),
      concat(md5(col("id").cast("string")),
        md5((col("id") + 1).cast("string"))).as("pad"))
    val right = spark.range(98).select(col("id").as("k"), (col("id") * 10).as("v"))

    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "8",
      // production defaults are 256 MB / 64 MB; the hot partition here is
      // ~26 MB raw / ~13 MB shuffled, the same >5x-median, >threshold
      // shape at ~1/20 the bytes
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "512KB"
    ) {
      val q = left.join(right, "k")
      val qe = q.queryExecution
      val n = qe.executedPlan.execute().count()
      assert(n == hot + rest, s"join produced $n rows, expected ${hot + rest}")

      val finalPlan = qe.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"no skew=true SortMergeJoin in the AQE final plan:\n$finalPlan")
      // the hot ~22 MB partition must have split into >8 advisory-sized
      // chunks: count the join's actual tasks via its output RDD
      val joinTasks = flatten(qe.executedPlan).collectFirst {
        case smj: org.apache.spark.sql.execution.joins.SortMergeJoinExec
            if smj.isSkewJoin => smj.execute().getNumPartitions
      }
      assert(joinTasks.exists(_ > 8),
        s"skewed join ran in ${joinTasks.getOrElse(0)} tasks — partition did not split")

      // answers must not change with the split off
      withConf("spark.sql.adaptive.skewJoin.enabled" -> "false") {
        val n0 = left.join(right, "k").count()
        assert(n0 == n, s"skew-split join returned $n rows, plain join $n0")
      }
    }
  }
}
