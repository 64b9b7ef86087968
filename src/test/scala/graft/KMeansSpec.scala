package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{KMeans, Similarity}

/** Lloyd-iteration quantizer training: convergence, stable k, and
  * drop-in compatibility with the IVF search path. */
class KMeansSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf0001).cache()

  test("Lloyd iterations weakly improve inertia over the seeded init") {
    val i0 = KMeans.inertia(emb, "vec_id", "embedding",
      KMeans.init(emb, "vec_id", "embedding", k = 8))
    val i2 = KMeans.inertia(emb, "vec_id", "embedding",
      KMeans.fit(emb, "vec_id", "embedding", k = 8, iters = 2))
    assert(i2 <= i0 + 1e-9, s"inertia rose: init $i0 -> trained $i2")
    assert(i2 < i0, s"two iterations should strictly improve on random init ($i0 -> $i2)")
  }

  test("k stays stable across iterations (empty clusters keep centroids)") {
    // k larger than the corpus slice forces empty clusters immediately
    val tiny = emb.filter(col("vec_id") < 12)
    val trained = KMeans.fit(tiny, "vec_id", "embedding", k = 8, iters = 2)
    assert(trained.count() === 8)
    assert(trained.select("c_id").distinct().count() === 8)
  }

  test("trained codebook drops into ivfTopK and covers the corpus") {
    val trained = KMeans.fit(emb, "vec_id", "embedding", k = 8, iters = 2)
    val assigned = Similarity.ivfAssign(emb, "embedding", "vec_id", trained)
    assert(assigned.count() === emb.count()) // every vector lands somewhere
    val q = emb.filter(col("vec_id") === 0).select("embedding")
    val top = Similarity.ivfTopK(assigned.filter(col("vec_id") =!= 0),
      "embedding", "vec_id", trained, q, k = 5, nprobe = 3).collect()
    assert(top.length === 5)
    val scores = top.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }) // ranked
  }
}
