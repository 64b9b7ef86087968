package graft.tools

/** Throwaway plan/time probe for one registry query (not part of the
  * library surface; run via `runMain graft.tools.PlanProbe <name> <dir>`). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args(1)
    val spark = graft.GraftSession.get()
    val df = graft.SparkEntry.queries(name)(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    println("PROBE array_intersect: " + "array_intersect".r.findAllIn(p).size)
    println("PROBE md5: " + "md5\\(".r.findAllIn(p).size)
    val t0 = System.nanoTime; df.collect()
    println("PROBE first " + (System.nanoTime - t0) / 1e9)
    val t1 = System.nanoTime; df.collect()
    println("PROBE warm " + (System.nanoTime - t1) / 1e9)
    spark.stop()
  }
}
