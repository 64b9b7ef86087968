package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** K-means-lite (Lloyd iterations, cosine flavor) for training the IVF
  * coarse quantizer — pure DataFrame ops, no MLlib, no driver-side math
  * beyond the k-row centroid frame itself.
  *
  * Per iteration:
  *   1. assign: [[Similarity.ivfAssign]] — broadcast the k centroids,
  *      one cosine per (vector, centroid), argmax per vector. The corpus
  *      never shuffles; only the assignment column materializes.
  *   2. update: posexplode each assigned vector once → per-(cluster,
  *      dimension) mean via partial-aggregated avg (ONE shuffle whose
  *      rows are (c_id, pos, partial sums), never whole vectors) →
  *      re-assemble the k mean vectors with a sorted collect over k×dim
  *      rows.
  * Clusters that lose every member keep their previous centroid, so k is
  * stable across iterations.
  *
  * At 100 TB this is the standard scalable shape: per-iteration cost is
  * one broadcast join + one narrow explode + one k×dim-sized aggregate.
  * The result is any small `(c_id, c_emb)` frame — exactly what
  * [[Similarity.ivfAssign]]/[[Similarity.ivfTopK]] and [[IvfIndex]]
  * already accept, so a trained codebook is a drop-in replacement for
  * the stride sample.
  *
  * Note: floating-point sums depend on aggregation order, so trained
  * centroid values are deterministic only up to ~1 ulp across runs —
  * fine for a quantizer (assignment ties at that scale are measure-zero),
  * but this is why the ORACLE-checked IVF entry keeps the exactly-
  * reproducible stride quantizer.
  */
object KMeans {

  /** Deterministic pseudo-random init: the k corpus vectors with the
    * smallest seeded hash of their id. */
  def init(emb: DataFrame, idCol: String, embCol: String, k: Int,
      seed: Long = 42L): DataFrame =
    emb.orderBy(xxhash64(col(idCol), lit(seed)), col(idCol)).limit(k)
      .select(col(idCol).as("c_id"), col(embCol).as("c_emb"))

  /** One Lloyd update: assign every vector to its nearest centroid, then
    * move each centroid to the mean of its members (cosine-argmax
    * assignment; empty clusters keep their centroid). */
  def step(emb: DataFrame, idCol: String, embCol: String,
      centroids: DataFrame): DataFrame = {
    val assigned = Similarity.ivfAssign(emb, embCol, idCol, centroids)
    val contrib = assigned
      .select(col("c_id"), posexplode(col(embCol)).as(Seq("__pos", "__x")))
      .groupBy(col("c_id"), col("__pos"))
      .agg(avg(col("__x").cast("double")).as("__m"))
    val means = contrib.groupBy(col("c_id"))
      .agg(array_sort(collect_list(struct(col("__pos"), col("__m")))).as("__pm"))
      .select(col("c_id"),
        transform(col("__pm"), x => x.getField("__m").cast("float")).as("__new"))
    centroids.join(means, Seq("c_id"), "left")
      .select(col("c_id"), coalesce(col("__new"), col("c_emb")).as("c_emb"))
  }

  /** `iters` Lloyd iterations from the seeded init. Each intermediate
    * centroid frame is localCheckpoint-free: k×dim is tiny, so the
    * lineage stays cheap; collect-and-rebroadcast is unnecessary. */
  def fit(emb: DataFrame, idCol: String, embCol: String, k: Int,
      iters: Int = 3, seed: Long = 42L): DataFrame =
    (0 until iters).foldLeft(init(emb, idCol, embCol, k, seed)) {
      (c, _) => step(emb, idCol, embCol, c)
    }

  /** Mean cosine distance of every vector to its assigned centroid —
    * the quality metric Lloyd iterations must (weakly) improve. */
  def inertia(emb: DataFrame, idCol: String, embCol: String,
      centroids: DataFrame): Double = {
    val e = emb.select(col(idCol), col(embCol))
      .withColumn("__en", Similarity.norm(col(embCol)))
    val c = centroids.withColumn("__cn", Similarity.norm(col("c_emb")))
    val best = e.crossJoin(broadcast(c))
      .select(col(idCol),
        (Similarity.dot(col(embCol), col("c_emb")) / (col("__en") * col("__cn"))).as("__cs"))
      .groupBy(col(idCol)).agg(max(col("__cs")).as("__best"))
    best.agg(avg(lit(1.0) - col("__best"))).collect()(0).getDouble(0)
  }
}
