package graft.tools

import graft._

/** Throwaway iteration probe (not part of the library): a SUBSET
  * [[Bench]] — time only the named registry queries with the same
  * cold-then-min-of-2-warm isolation protocol, so a single entry's scale
  * behavior can be measured without replaying the full registry.
  *
  * Usage: runMain graft.tools.BenchProbe <sfDir> <name1,name2,...>
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args
    val wanted = names.split(',').toSet
    val spark = GraftSession.get()
    def isolate(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      System.gc()
    }
    SparkEntry.queries.filter(kv => wanted(kv._1)).toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        // isolate BEFORE the cold timing too, so cold numbers are not
        // order-dependent on whatever the previous query left cached
        isolate()
        val t0 = System.nanoTime()
        Bench.force(name, fn(spark, sfDir))
        val cold = (System.nanoTime() - t0) / 1e9
        val warm = (1 to 2).map { _ =>
          isolate()
          val t = System.nanoTime()
          Bench.force(name, fn(spark, sfDir))
          (System.nanoTime() - t) / 1e9
        }.min
        println(f"BENCHPROBE $name cold=$cold%.3f warm=$warm%.3f")
      }
    spark.stop()
  }
}
