package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{IvfIndex, KMeans, Similarity}

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

  test("IvfIndex Trained quantizer: the persisted codebook is the authority") {
    val root = java.nio.file.Files.createTempDirectory("graft-ivfkm-").toString
    val q = IvfIndex.Trained(k = 20, iters = 3)
    def readCents() = IvfIndex.ensureCentroids(spark, sf0001, emb,
        "embedding", "vec_id", q, Some(root))
      .orderBy("c_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
    val c1 = readCents()
    assert(c1.length === 20)
    assert(c1.map(_._1) === (1L to 20L)) // dense renumbered bucket ids
    // a second ensure READS the stored frame — bit-identical, even though
    // re-RUNNING training could drift by float aggregation order; the
    // artifact, not the training run, is the quantizer
    assert(readCents() === c1)
    // the assignment derives from the same stored codebook: every bucket
    // id it uses exists there, and the corpus is fully covered
    val assigned = IvfIndex.ensure(spark, sf0001, emb, "embedding",
      "vec_id", q, Some(root))
    assert(assigned.count() === emb.count())
    val bucketIds = assigned.select("c_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(bucketIds.subsetOf(c1.map(_._1).toSet))
  }

  test("trained-codebook probe recall@20 ≥ stride-codebook recall") {
    val root = java.nio.file.Files.createTempDirectory("graft-ivfrec-").toString
    // same codebook size for both quantizers: 500 vectors / stride 25 = 20
    def recallAt20(quantizer: IvfIndex.Quantizer): Int = {
      val cents = IvfIndex.ensureCentroids(spark, sf0001, emb, "embedding",
        "vec_id", quantizer, Some(root))
      val assigned = IvfIndex.ensure(spark, sf0001, emb, "embedding",
        "vec_id", quantizer, Some(root))
      (0L until 5L).map { qid =>
        val qv = emb.filter(col("vec_id") === qid).select("embedding")
        val got = Similarity.ivfTopK(assigned.filter(col("vec_id") =!= qid),
            "embedding", "vec_id", cents, qv, k = 20, nprobe = 4)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val qvec = qv.collect().head.getSeq[Float](0)
        val truth = Similarity.bruteForceTopK(
            emb.filter(col("vec_id") =!= qid), "embedding", "vec_id",
            Similarity.vec(qvec), 20)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        (got & truth).size
      }.sum
    }
    val trained = recallAt20(IvfIndex.Trained(k = 20, iters = 3))
    val stride = recallAt20(IvfIndex.Stride(25))
    info(s"recall@20 over 5 probes at nprobe=4: trained $trained/100, stride $stride/100")
    assert(trained >= stride,
      s"trained codebook recall $trained fell below stride $stride")
  }
}
