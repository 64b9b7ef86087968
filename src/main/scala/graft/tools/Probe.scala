package graft.tools

import org.apache.spark.sql.functions._

import graft._
import graft.pipeline.Dedup

/** Throwaway measurement probe (not part of the library). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .filter(col("doc_id") < 2000)
    val w = split(col("text"), " ")
    val mutated = docs.filter(pmod(col("doc_id"), lit(7)) === 0).select(
      (col("doc_id") + 10000).as("doc_id"),
      array_join(slice(w, lit(3), size(w)), " ").as("text"))
    val corpus = docs.union(mutated)

    val truePairs = Dedup.bruteForceNearDupPairs(corpus, corpus, "doc_id", "text", 0.5)

    // fingerprints via the same explode+vote shape as simHashNearDupPairs
    val exploded = Dedup.withShingles(corpus, "doc_id", "text", 3, "__sh")
      .filter(size(col("__sh")) > 0)
      .select(col("doc_id"), explode(col("__sh")).as("__s"))
      .select(col("doc_id"), xxhash64(col("__s")).as("__h"))
    def bitVote(k: Int) =
      sum(when(shiftright(col("__h"), k).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
    val votes = exploded.groupBy(col("doc_id")).agg(
      bitVote(0).as("__v0"), (1 until 64).map(k => bitVote(k).as(s"__v$k")): _*)
    val f = votes.select(col("doc_id"),
      (0 until 64).map { k =>
        when(col(s"__v$k") > 0, shiftleft(lit(1L), k).cast("long")).otherwise(lit(0L))
      }.reduce(_ + _).as("sim"))

    val joined = truePairs
      .join(f.select(col("doc_id").as("a_id"), col("sim").as("a_sim")), Seq("a_id"))
      .join(f.select(col("doc_id").as("b_id"), col("sim").as("b_sim")), Seq("b_id"))
      .withColumn("hamming", bit_count(col("a_sim").bitwiseXOR(col("b_sim"))))
      .withColumn("shares16", (0 until 4).map { b =>
        shiftright(col("a_sim"), b * 16).bitwiseAND(lit(0xFFFFL)) ===
          shiftright(col("b_sim"), b * 16).bitwiseAND(lit(0xFFFFL))
      }.reduce(_ || _))

    println("== true pairs j>=0.5: hamming histogram / band-share ==")
    joined.groupBy((col("j") * 10).cast("int").as("j_decile"))
      .agg(count(lit(1)).as("n"), min("hamming").as("min_h"),
        expr("percentile(hamming, 0.5)").as("med_h"), max("hamming").as("max_h"),
        sum(when(col("shares16"), 0L).otherwise(1L)).as("missed_by_4x16"))
      .orderBy(col("j_decile")).show(20, false)
    println("total true pairs: " + joined.count())
    println("missed by 4x16 banding: " + joined.filter(!col("shares16")).count())
    joined.filter(col("j") >= 0.8).agg(
      count(lit(1)).as("n_08"), max("hamming").as("max_h_08"),
      sum(when(col("shares16"), 0L).otherwise(1L)).as("missed_08")).show(false)
    spark.stop()
  }
}
