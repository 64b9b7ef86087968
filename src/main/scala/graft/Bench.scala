package graft

/** Benchmark entry: runs every registered query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line with per-query wall seconds.
  *
  * Each query is forced with `.count()`; the deterministic ORDER BY each
  * query carries for oracle hashing is eliminated by Catalyst under the
  * aggregate, so the measured plan is scan→filter→join→agg, not the sort. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.get(s"local[$cpus]", cpus.toInt)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
