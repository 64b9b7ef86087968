package graft.tools

/** Throwaway dev probe: partition counts seen by the Components edge
  * RDD for a resolve query's pair frame. */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.GraftSession.get()
    import org.apache.spark.sql.functions._
    val corpus = {
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
    val fp = graft.pipeline.DedupIndex.ensureImageDHash(spark, dir, corpus,
      "img_id", "img", variant = "lt600tw7")
    val pairs = graft.pipeline.Dedup.simHashNearDupPairsFromFingerprints(
      fp, maxHamming = 3, bands = 4, bits = 64)
    val raw = pairs
      .select(col("a_id").cast("long").as("u"), col("b_id").cast("long").as("v"))
      .rdd
    println("PARTPROBE numPartitions=" + raw.getNumPartitions +
      " rows=" + raw.count())
    spark.stop()
  }
}
