package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway phase probe for p_d13 (dev tool): splits the audio-corpus
  * CONSTRUCT cost from the fingerprint DECODE cost, each forced with the
  * Bench checksum aggregate so nothing prunes.
  * Usage: runMain graft.tools.D13Probe <sfDir>
  */
object D13Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.GraftSession.get()
    def t(tag: String)(body: => Unit): Unit = {
      body // warm
      spark.sharedState.cacheManager.clearCache(); System.gc()
      val t0 = System.nanoTime(); body
      println(f"D13PHASE $tag ${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit = {
      df.select(xxhash64(df.columns.map(col).toIndexedSeq: _*).as("h"))
        .agg(expr("bit_xor(h)")).collect(); ()
    }
    val fn = graft.SparkEntry.queries("p_d13_audio_fingerprint")
    t("full-query") { graft.Bench.force("p_d13_audio_fingerprint", fn(spark, dir)) }
    // corpus construct only (mirror of audioCorpus via the registry's own
    // query minus the fingerprint: select aud bytes and checksum them)
    val corpus = graft.queries.PipelineQueries.audioCorpusForProbe(spark, dir)
    t("construct-only") { force(corpus) }
    t("construct+fp") {
      force(corpus.select(col("aud_id"),
        call_function("audio_fingerprint", col("aud")).as("fp")))
    }
    t("construct+fp+orderBy") {
      force(corpus.select(col("aud_id"),
        call_function("audio_fingerprint", col("aud")).as("fp"))
        .orderBy(col("aud_id")))
    }
    // does the checksum aggregate eliminate the sort?
    val sorted = corpus.select(col("aud_id"),
      call_function("audio_fingerprint", col("aud")).as("fp"))
      .orderBy(col("aud_id"))
    val forcedPlan = sorted
      .select(xxhash64(col("aud_id"), col("fp")).as("h"))
      .agg(expr("bit_xor(h)"))
      .queryExecution.executedPlan.toString
    println("D13SORTSURVIVES " + forcedPlan.contains("Sort") + " " +
      forcedPlan.contains("rangepartitioning"))
    // the registry query's exact forced plan: how many times does the
    // fingerprint (and thus the whole construct) appear after collapse?
    val full = fn(spark, dir)
    val fp2 = full
      .select(xxhash64(full.columns.map(col).toIndexedSeq: _*).as("h"))
      .agg(expr("bit_xor(h)"))
      .queryExecution.executedPlan.toString
    println("D13FORCED audio_fingerprint x" +
      "audio_fingerprint".r.findAllIn(fp2).size)
    t("full-query-again") { graft.Bench.force("p_d13_audio_fingerprint", fn(spark, dir)) }
    spark.stop()
  }
}
