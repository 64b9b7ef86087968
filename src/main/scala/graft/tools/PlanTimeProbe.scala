package graft.tools

/** Dev probe: splits a registry query's warm pass into plan-construction
  * (DataFrame building — driver-side Catalyst analysis), physical
  * planning (executedPlan force), and execution.
  * Usage: runMain graft.tools.PlanTimeProbe <sfDir> <name1,name2,...>
  */
object PlanTimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',')
    val spark = graft.GraftSession.get()
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      // warmup
      graft.Bench.force(name, fn(spark, sfDir))
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan
      val t2 = System.nanoTime()
      graft.Bench.force(name, df)
      val t3 = System.nanoTime()
      println(f"PLANTIME $name%-32s build=${(t1 - t0) / 1e9}%.3f " +
        f"plan=${(t2 - t1) / 1e9}%.3f exec=${(t3 - t2) / 1e9}%.3f")
    }
    spark.stop()
  }
}
