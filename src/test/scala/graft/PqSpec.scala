package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{IvfIndex, Pq, PqIndex, Similarity}

/** Product quantization: code geometry and determinism, persisted ≡
  * inline, IVF-PQ degradation to flat PQ, ADC ranking fidelity, and
  * Lloyd training improving quantization error over the stride init. */
class PqSpec extends SparkSpec {

  private val M = 8
  private val DS = 8

  private def emb = Tables.embeddings(spark, sf0001)
  private def cb = Pq.strideCodebook(emb, "embedding", "vec_id", M, DS, 16, 7)

  test("codes: one byte per subspace, every code inside the codebook") {
    val codes = Pq.codesOf(emb, "embedding", "vec_id", cb, M, DS)
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    assert(codes.length === emb.count())
    for ((id, c) <- codes) {
      assert(c.length === M, s"vec $id: ${c.length} bytes")
      assert(c.forall(b => b >= 0 && b < 16), s"vec $id: code outside [0,16)")
    }
  }

  test("codes are deterministic under repartitioning") {
    def run(e: org.apache.spark.sql.DataFrame) =
      Pq.codesOf(e, "embedding", "vec_id", cb, M, DS)
        .orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toSeq
    assert(run(emb) === run(emb.repartition(7)))
  }

  test("persisted index ≡ inline derivation, bit for bit; warm read skips the build") {
    val root = java.nio.file.Files.createTempDirectory("graft-pq-").toString
    def persisted() = PqIndex.ensure(spark, sf0001, emb, "embedding", "vec_id",
        artifactRootOverride = Some(root))
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toSeq
    val first = persisted()
    val inline = Pq.codesOf(emb, "embedding", "vec_id", cb, M, DS)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toSeq
    assert(first === inline)
    assert(persisted() === first) // warm read returns the same artifact
  }

  test("IVF-PQ with nprobe = #centroids degrades exactly to flat PQ") {
    val root = java.nio.file.Files.createTempDirectory("graft-pq-ivf-").toString
    val ivfRoot = java.nio.file.Files.createTempDirectory("graft-pq-ivf2-").toString
    val q = emb.filter(col("vec_id") === 0).select("embedding")
    val cents = IvfIndex.ensureCentroids(spark, sf0001, emb, "embedding", "vec_id",
      artifactRootOverride = Some(ivfRoot))
    val nCents = cents.count().toInt
    val ivfCodes = PqIndex.ensureIvf(spark, sf0001, emb, "embedding", "vec_id",
      artifactRootOverride = Some(root), ivfArtifactRootOverride = Some(ivfRoot))
    val codebook = PqIndex.ensureCodebook(spark, sf0001, emb, "embedding", "vec_id",
      artifactRootOverride = Some(root))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val flat = rows(Pq.pqTopK(
      PqIndex.ensure(spark, sf0001, emb, "embedding", "vec_id",
        artifactRootOverride = Some(root)).filter(col("vec_id") =!= 0),
      "vec_id", codebook, q, "embedding", k = 20, ds = DS))
    val ivf = rows(Pq.ivfPqTopK(ivfCodes.filter(col("vec_id") =!= 0),
      "vec_id", codebook, cents, q, "embedding", k = 20, nprobe = nCents, ds = DS))
    assert(ivf === flat)
  }

  test("ADC scores track the exact dot; planted near-neighbors retrieved") {
    // The fixture embeddings are near-random (no cluster structure), so
    // set-overlap@20 against densely-bunched exact scores is the wrong
    // yardstick for a 16-codeword codebook. What PQ guarantees is (a)
    // the ADC score approximates the exact dot, and (b) genuinely-near
    // vectors still surface. Assert both.
    val q = emb.filter(col("vec_id") === 0).select("embedding")
    // (b)'s planted neighbors: damped copies of the query, ids 9001-9005
    val planted = (1 to 5).map { i =>
      emb.filter(col("vec_id") === 0)
        .select(lit(9000L + i).as("vec_id"),
          transform(col("embedding"),
            x => (x * (lit(1.0f) - lit(i / 100.0f))).cast("float")).as("embedding"),
          col("label"))
    }.reduce(_ union _)
    val corpus = emb.union(planted)
    val scored = Pq.codesOf(corpus, "embedding", "vec_id", cb, M, DS)
      .filter(col("vec_id") =!= 0)
      .join(corpus.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .crossJoin(broadcast(
        Pq.adcLut(cb, q, "embedding", DS).crossJoin(
          q.select(col("embedding").as("__q")))))
      .select(col("vec_id"),
        Pq.adcScore(col("codes"), col("lut"), col("kk")).as("adc"),
        Similarity.dot(col("embedding"), col("__q")).as("exact"))
    // (a) score fidelity: strong linear association corpus-wide
    val r = scored.agg(corr(col("adc"), col("exact"))).head.getDouble(0)
    assert(r >= 0.5, s"ADC/exact correlation too low: $r")
    // (b) all five planted neighbors inside the ADC top-20
    val top = Pq.pqTopK(
      Pq.codesOf(corpus, "embedding", "vec_id", cb, M, DS).filter(col("vec_id") =!= 0),
      "vec_id", cb, q, "embedding", k = 20, ds = DS)
      .collect().map(_.getLong(0)).toSet
    assert((9001L to 9005L).forall(top.contains),
      s"planted neighbors missing from ADC top-20: $top")
  }

  test("Lloyd-trained codebook lowers quantization MSE vs the stride init") {
    val trained = Pq.trainCodebook(emb, "embedding", "vec_id", M, DS,
      k = 16, stride = 7, iters = 2)
    val mseStride = Pq.quantizationMse(emb, "embedding", "vec_id", cb, M, DS)
    val mseTrained = Pq.quantizationMse(emb, "embedding", "vec_id", trained, M, DS)
    assert(mseTrained <= mseStride,
      s"training worsened quantization: $mseTrained > $mseStride")
    assert(trained.count() === M * 16L) // k stable through empty clusters
  }

  test("residuals reconstruct exactly: centroid + residual ≡ vector (double identity)") {
    val ivfRoot = java.nio.file.Files.createTempDirectory("graft-rpq-ivf-").toString
    val cents = IvfIndex.ensureCentroids(spark, sf0001, emb, "embedding", "vec_id",
      artifactRootOverride = Some(ivfRoot))
    val assigned = IvfIndex.ensure(spark, sf0001, emb, "embedding", "vec_id",
      artifactRootOverride = Some(ivfRoot))
    val bad = Pq.residuals(assigned, "embedding", "vec_id", cents)
      .join(cents, Seq("c_id"))
      .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .select(zip_with(col("r"), col("c_emb"),
          (r, c) => r + c.cast("double")).as("back"),
        transform(col("embedding"), x => x.cast("double")).as("orig"))
      .filter(col("back") =!= col("orig"))
    assert(bad.count() === 0) // float-in-double addition is exact: no drift
  }

  test("residual IVF-PQ: persisted ≡ inline; score decomposition exact on self-coded vectors") {
    val root = java.nio.file.Files.createTempDirectory("graft-rpq-").toString
    val ivfRoot = java.nio.file.Files.createTempDirectory("graft-rpq-ivf2-").toString
    val q = emb.filter(col("vec_id") === 0).select("embedding")
    val cents = IvfIndex.ensureCentroids(spark, sf0001, emb, "embedding", "vec_id",
      artifactRootOverride = Some(ivfRoot))
    val codes = PqIndex.ensureResidual(spark, sf0001, emb, "embedding", "vec_id",
      artifactRootOverride = Some(root), ivfArtifactRootOverride = Some(ivfRoot))
    val rcb = PqIndex.ensureResidualCodebook(spark, sf0001, emb, "embedding",
      "vec_id", artifactRootOverride = Some(root),
      ivfArtifactRootOverride = Some(ivfRoot))
    // persisted codes ≡ inline derivation over the same persisted inputs
    val assigned = IvfIndex.ensure(spark, sf0001, emb, "embedding", "vec_id",
      artifactRootOverride = Some(ivfRoot))
    val resid = Pq.residuals(assigned, "embedding", "vec_id", cents)
    val inline = Pq.codesOf(resid, "r", "vec_id", rcb, M, DS)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toSeq
    val persisted = codes.select(col("vec_id"), col("codes"))
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq)).toSeq
    assert(persisted === inline)
    // the inner-product decomposition is exact where coding is exact:
    // codeword-source vectors (id % 7 == 0, id < 112) self-match every
    // subspace (d² = 0), so their ADC term IS ⟨q, r⟩ and the score must
    // equal the true ⟨q, v⟩ = ⟨q, c⟩ + ⟨q, r⟩ up to fold-order rounding.
    // (The fixture embeddings are uniform-random, so residual MSE does
    // not beat raw MSE here the way it does on clustered data — the
    // decomposition identity is the property that is data-independent.)
    val nCents = cents.count().toInt
    val scored = Pq.ivfPqResidualTopK(codes.filter(col("vec_id") =!= 0), "vec_id",
      rcb, cents, q, "embedding", k = 500, nprobe = nCents, ds = DS)
    val exact = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q.select(col("embedding").as("__q"))))
      .select(col("vec_id"), Similarity.dot(col("embedding"), col("__q")).as("e"))
    val sources = scored.join(exact, Seq("vec_id"))
      .filter(pmod(col("vec_id"), lit(7)) === 0 && col("vec_id") < 112)
      .select(abs(col("score") - col("e")).as("d")).collect().map(_.getDouble(0))
    assert(sources.nonEmpty && sources.forall(_ < 1e-9),
      s"decomposed score should equal exact dot on self-coded vectors: ${sources.max}")
    // probed query returns k
    val top = Pq.ivfPqResidualTopK(codes.filter(col("vec_id") =!= 0), "vec_id",
      rcb, cents, q, "embedding", k = 20, nprobe = 4, ds = DS).collect()
    assert(top.length === 20)
  }

  test("PqIndex Trained flavor: trained codebook persists, drives codes, keys separately") {
    val root = java.nio.file.Files.createTempDirectory("graft-pqtr-").toString
    val trainedQ = PqIndex.Trained(iters = 1)
    val codesT = PqIndex.ensure(spark, sf0001, emb, "embedding", "vec_id",
      trainedQ, Some(root))
    PqIndex.ensure(spark, sf0001, emb, "embedding", "vec_id",
      PqIndex.Stride(), Some(root))
    // distinct cache keys: both flavors' codes artifacts coexist
    assert(new java.io.File(root).list().count(_.contains("_codes_")) === 2)
    // the persisted trained codebook is the ADC authority — query runs
    // green against it and codes decode inside the trained table
    val cbT = PqIndex.ensureCodebook(spark, sf0001, emb, "embedding", "vec_id",
      trainedQ, Some(root))
    assert(cbT.count() === 8 * 16L)
    val q = emb.filter(col("vec_id") === 0).select("embedding")
    val top = Pq.pqTopK(codesT.filter(col("vec_id") =!= 0), "vec_id", cbT, q,
      "embedding", k = 20, ds = DS).collect()
    assert(top.length === 20)
    // training moved codewords: trained codes differ from stride codes
    val codesS = PqIndex.ensure(spark, sf0001, emb, "embedding", "vec_id",
        PqIndex.Stride(), Some(root))
      .orderBy("vec_id").collect().map(_.getAs[Array[Byte]](1).toSeq)
    val ct = codesT.orderBy("vec_id").collect().map(_.getAs[Array[Byte]](1).toSeq)
    assert(ct.toSeq !== codesS.toSeq)
  }

  test("pq_adc null semantics: out-of-table code or short LUT → null") {
    import spark.implicits._
    val rows = Seq(
      (Array[Byte](0, 1), Seq(1.0, 2.0, 3.0, 4.0), 2L),  // ok: 1.0 + 4.0
      (Array[Byte](0, 3), Seq(1.0, 2.0, 3.0, 4.0), 2L),  // code 3 ≥ kk=2 → idx past
      (Array[Byte](5), Seq(1.0, 2.0), 2L))               // idx 5 ≥ len → null
      .toDF("codes", "lut", "kk")
      .select(Pq.adcScore(col("codes"), col("lut"), col("kk")).as("s"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(rows(0) === 5.0)
    assert(rows(1) === null)
    assert(rows(2) === null)
  }
}
