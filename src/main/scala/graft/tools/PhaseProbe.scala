package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway phase-timing probe for the dedup-resolve shape (dev tool):
  * times fingerprint-artifact read, pair generation, component
  * resolution and final ordering separately for one image-resolve query.
  * Usage: runMain graft.tools.PhaseProbe <sfDir>
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.GraftSession.get()
    def t[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"PHASE $tag ${(System.nanoTime() - t0) / 1e9}%.3f")
      r
    }
    // warm everything once
    graft.SparkEntry.queries("p_d12_image_dedup_resolve")(spark, dir).count()
    spark.sharedState.cacheManager.clearCache()
    System.gc()

    val corpus = t("corpus-build") {
      val d = col("doc_id")
      val base = graft.Tables.documents(spark, dir).filter(d < 600)
        .select(d.as("img_id"), call_function("png_gen", d).as("img"))
      val twins = graft.Tables.documents(spark, dir)
        .filter(d < 600 && pmod(d, lit(7)) === 0)
        .select((d + 10000).as("img_id"),
          call_function("image_resize", call_function("png_gen", d),
            (pmod(d, lit(16)) + 9).cast("long"),
            (pmod(d * 7, lit(12)) + 7).cast("long"),
            lit("box")).as("img"))
      base.union(twins)
    }
    val fp = t("ensure-dhash") {
      val f = graft.pipeline.DedupIndex.ensureImageDHash(spark, dir, corpus,
        "img_id", "img", variant = "lt600tw7")
      f.count()
      f
    }
    val pairs = t("pairs") {
      val p = graft.pipeline.Dedup.simHashNearDupPairsFromFingerprints(
        fp, maxHamming = 3, bands = 4, bits = 64)
      p.count()
      p
    }
    val labels = t("components") {
      val l = graft.pipeline.Components.nearDupClusters(pairs)
      l.count()
      l
    }
    t("orderBy-count") { labels.orderBy(col("doc_id")).count() }
    t("full-query-again") {
      graft.SparkEntry.queries("p_d12_image_dedup_resolve")(spark, dir).count()
    }
    spark.stop()
  }
}
