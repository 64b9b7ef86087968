package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway phase probe for p_e2_semdedup (dev tool): times the pair
  * self-join materialization, the component loop, and the final
  * cent_cos/election query separately, and prints the PAIRS physical
  * plan so exchange sharing across the self-join sides is checkable.
  * Usage: runMain graft.tools.E2Probe <sfDir>
  */
object E2Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.GraftSession.get()
    import graft.pipeline.{IvfIndex, Similarity, Components}
    import graft.Tables

    def t[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"E2PHASE $tag ${(System.nanoTime() - t0) / 1e9}%.3f")
      r
    }

    // warm once (cold pass: codegen, artifact ensure)
    graft.SparkEntry.queries("p_e2_semdedup")(spark, dir).count()
    spark.sharedState.cacheManager.clearCache()
    System.gc()

    // reconstruct the e2 internals (mirrors PipelineQueries.e2)
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val corpus = emb.union(emb.filter(pmod(col("vec_id"), lit(10)) === 0)
      .select((col("vec_id") + 1000000000L).as("vec_id"), col("embedding")))
    val assigned = IvfIndex.ensure(spark, dir, corpus, "embedding", "vec_id",
      variant = "dup1e9")
    val cents = IvfIndex.ensureCentroids(spark, dir, corpus, "embedding", "vec_id",
      variant = "dup1e9")

    // replicate semDeDup's pair plan (None maxClusterSize branch)
    def norm(c: org.apache.spark.sql.Column) =
      sqrt(call_function("vec_dot", c, c))
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function("vec_dot", a, b)
    val base = assigned
      .select(col("vec_id"), col("embedding"), col("c_id"),
        norm(col("embedding")).as("__n"))
    val paired = base.withColumn("__sub", lit(0L))
    val pairKeys = Seq("c_id")
    val a = paired.select((pairKeys.map(col) :+ col("vec_id").as("a_id")
      :+ col("embedding").as("__ae") :+ col("__n").as("__an")): _*)
    val b = paired.select((pairKeys.map(col) :+ col("vec_id").as("b_id")
      :+ col("embedding").as("__be") :+ col("__n").as("__bn")): _*)
    val pairs = a.join(b, pairKeys)
      .filter(col("a_id") < col("b_id"))
      .filter((dot(col("__ae"), col("__be")) / (col("__an") * col("__bn")))
        > lit(0.9))
      .select("a_id", "b_id")
    println("=== PAIRS PLAN ===")
    println(pairs.queryExecution.executedPlan.toString.take(6000))

    // the 100 TB shape: with broadcast off (the corpus side would never
    // fit), does the self-join share ONE exchange across its two sides?
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val smjPairs = a.join(b, pairKeys)
        .filter(col("a_id") < col("b_id"))
        .filter((dot(col("__ae"), col("__be")) / (col("__an") * col("__bn")))
          > lit(0.9))
        .select("a_id", "b_id")
      // execute THIS QueryExecution so its AdaptiveSparkPlan finalizes —
      // a separate count() would plan its own tree and tell us nothing
      smjPairs.collect()
      val fin = smjPairs.queryExecution.executedPlan.toString
      println("=== PAIRS PLAN (SMJ, broadcast off; final) ===")
      println("E2SMJ ReusedExchange x" + "ReusedExchange".r.findAllIn(fin).size +
        " Exchange x" + "Exchange".r.findAllIn(fin).size +
        " FileScan x" + "FileScan|Scan parquet".r.findAllIn(fin).size)
      println(fin.take(5000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")

    t("pairs-count") { pairs.count() }
    val labels = t("components") {
      val l = Components.nearDupClusters(pairs)
      l.count(); l
    }
    spark.sharedState.cacheManager.clearCache(); System.gc()
    // per-job timing listener for the warm pass
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobStart.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description")).getOrElse("") +
            " [" + j.stageInfos.map(_.name.take(60)).mkString(" | ") + "]"))
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val (t0, desc) = jobStart.get(j.jobId)
        println(f"E2JOB ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3f $desc")
      }
    })
    t("full-query-warm") {
      graft.SparkEntry.queries("p_e2_semdedup")(spark, dir).count()
    }
    spark.stop()
  }
}
