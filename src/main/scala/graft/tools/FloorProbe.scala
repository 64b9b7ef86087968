package graft.tools

/** Throwaway dev probe: decompose the local-mode per-job floor.
  * Times trivial actions under the session config vs AQE off. */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    def time(tag: String, n: Int)(body: => Unit): Unit = {
      body // warm
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => body)
      println(f"FLOOR $tag ${(System.nanoTime() - t0) / 1e9 / n}%.4f")
    }
    val sc = spark.sparkContext
    time("rdd-1part-count", 20) { sc.parallelize(1 to 1, 1).count(); () }
    time("rdd-32part-count", 20) { sc.parallelize(1 to 32, 32).count(); () }
    time("range1-count", 20) { spark.range(1).count(); () }
    time("range1-count-noAQE", 20) {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.range(1).count()
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      ()
    }
    val df = spark.range(100).toDF("id")
    time("groupby-count", 20) { df.groupBy(org.apache.spark.sql.functions.pmod(org.apache.spark.sql.functions.col("id"), org.apache.spark.sql.functions.lit(7L))).count().count(); () }
    time("groupby-count-noAQE", 20) {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      df.groupBy(org.apache.spark.sql.functions.pmod(org.apache.spark.sql.functions.col("id"), org.apache.spark.sql.functions.lit(7L))).count().count()
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      ()
    }
    // the bench isolate(): cache clear + System.gc before every pass
    time("isolate+range1", 10) {
      spark.sharedState.cacheManager.clearCache(); System.gc(); spark.range(1).count(); ()
    }
    spark.stop()
  }
}
