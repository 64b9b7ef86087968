package graft.tools

/** Throwaway per-job trace for one registry query (dev tool): warms the
  * query once, then prints every Spark job of one isolated warm pass
  * with its wall time and stage names — the job-level picture JobProfile
  * aggregates away.
  * Usage: runMain graft.tools.JobTrace <sfDir> <name>
  */
object JobTrace {
  def main(args: Array[String]): Unit = {
    val Array(dir, name) = args
    val spark = graft.GraftSession.get()
    val fn = graft.SparkEntry.queries(name)
    graft.Bench.force(name, fn(spark, dir)) // warm
    spark.sharedState.cacheManager.clearCache(); System.gc()
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobStart.put(j.jobId, (System.nanoTime(),
          j.stageInfos.map(s => s.name.takeWhile(_ != '\n').take(50) +
            ":" + s.numTasks).mkString(" | ")))
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val (t0, desc) = jobStart.get(j.jobId)
        println(f"TRACEJOB ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3f $desc")
      }
    })
    val t0 = System.nanoTime()
    graft.Bench.force(name, fn(spark, dir))
    println(f"TRACETOTAL ${(System.nanoTime() - t0) / 1e9}%.3f")
    spark.stop()
  }
}
