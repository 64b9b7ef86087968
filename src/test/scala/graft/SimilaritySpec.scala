package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Similarity

/** Vector similarity: cosine correctness, exact kNN, and the LSH recall
  * contract on the sf0.001 embeddings. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: identity = 1, orthogonal = 0, opposite = -1") {
    val df = Seq(
      (Seq(1f, 0f), Seq(1f, 0f), 1.0),
      (Seq(1f, 0f), Seq(0f, 1f), 0.0),
      (Seq(1f, 0f), Seq(-1f, 0f), -1.0),
    ).toDF("a", "b", "expect")
    df.select(Similarity.cosine(col("a"), col("b")).as("c"), col("expect"))
      .collect().foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("vec_dot: null element or length mismatch nulls the score (HOF-fold parity)") {
    val df = Seq(
      (Seq[Option[Float]](Some(1f), Some(2f)), Seq[Option[Float]](Some(3f), Some(4f))),
      (Seq[Option[Float]](Some(1f), None), Seq[Option[Float]](Some(3f), Some(4f))),
      (Seq[Option[Float]](Some(1f)), Seq[Option[Float]](Some(3f), Some(4f))),
    ).toDF("a", "b")
    val got = df.select(Similarity.dot(col("a"), col("b")).as("d")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq === Seq(Some(11.0), None, None))
  }

  test("bruteForceTopK returns the true top-k") {
    val emb = Tables.embeddings(spark, sf0001)
    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .collect().head.getSeq[Float](0)
    val topk = Similarity.bruteForceTopK(
      emb.filter(col("vec_id") =!= 0), "embedding", "vec_id", Similarity.vec(q), 5)
      .collect()
    assert(topk.length === 5)
    val scores = topk.map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sorted.reverse), "descending scores")
  }

  test("nearestNeighbors: every probe gets exactly k rows, self excluded") {
    val emb = Tables.embeddings(spark, sf0001)
    val nn = Similarity.nearestNeighbors(
      emb.filter(col("vec_id") < 5), emb, "embedding", "vec_id", k = 3).collect()
    assert(nn.length === 15)
    assert(nn.forall(r => r.getAs[Long]("probe_id") != r.getAs[Long]("neighbor_id")))

    // the k=1 partial-agg path returns exactly the window path's rank-1 row
    val expected = nn
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"), r.getAs[Double]("score")))
      .groupBy(_._1).view.mapValues(_.minBy(t => (-t._3, t._2))).values.toSet
    val top1 = Similarity.nearestNeighbors(
        emb.filter(col("vec_id") < 5), emb, "embedding", "vec_id", k = 1)
      .collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"), r.getAs[Double]("score")))
      .toSet
    assert(top1 === expected)
  }

  test("lshTopK: candidates are a subset scored exactly; recall vs brute force") {
    val emb = Tables.embeddings(spark, sf0001)
    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .collect().head.getSeq[Float](0)
    val brute = Similarity.bruteForceTopK(
        emb.filter(col("vec_id") =!= 0), "embedding", "vec_id", Similarity.vec(q), 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val ann = Similarity.lshTopK(
        emb.filter(col("vec_id") =!= 0), "embedding", "vec_id", q, 10,
        planesPerTable = 4, tables = 8)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    // sign-LSH on random 64-dim data: expect partial but nonzero overlap
    assert(ann.nonEmpty)
    assert((ann intersect brute).nonEmpty, s"ANN recalled none of the true top-10")
  }

  test("IVF: assignment is total and unique; search equals brute force over probed buckets") {
    val emb = Tables.embeddings(spark, sf0001)
    val centroids = emb.filter(pmod(col("vec_id"), lit(25)) === 0)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val corpus = emb.filter(col("vec_id") =!= 0)
    val assigned = Similarity.ivfAssign(corpus, "embedding", "vec_id", centroids).cache()
    assert(assigned.count() === corpus.count())          // every vector assigned
    assert(assigned.select("vec_id").distinct().count() === corpus.count()) // exactly once

    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .collect().head.getSeq[Float](0)
    val qDf = emb.filter(col("vec_id") === 0).select("embedding")
    val ivf = Similarity.ivfTopK(assigned, "embedding", "vec_id", centroids, qDf, 10, 2)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    // self-consistency: IVF result == brute force restricted to the probed buckets
    val probedIds = assigned.join(
        centroids.select(col("c_id"), Similarity.cosine(col("c_emb"), Similarity.vec(q)).as("qs"))
          .orderBy(col("qs").desc, col("c_id")).limit(2).select("c_id"),
        Seq("c_id"), "left_semi")
    val brute = Similarity.bruteForceTopK(probedIds, "embedding", "vec_id",
        Similarity.vec(q), 10)
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(ivf === brute)
  }

  test("ivfTopKBatch ≡ per-probe ivfTopK; full probing recovers exact top-k") {
    val emb = Tables.embeddings(spark, sf0001)
    val centroids = emb.filter(pmod(col("vec_id"), lit(25)) === 0)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val assigned = Similarity.ivfAssign(emb, "embedding", "vec_id", centroids).cache()
    val probes = emb.filter(col("vec_id") < 5)

    val batch = Similarity.ivfTopKBatch(assigned, "embedding", "vec_id",
        centroids, probes, k = 10, nprobe = 2)
      .orderBy("probe_id", "score")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // per-probe single-query path, minus the probe's own row (the batch
    // form excludes self-matches; single-query ivfTopK does not know the
    // probe's id, so filter the corpus instead)
    val single = (0L until 5L).flatMap { pid =>
      Similarity.ivfTopK(assigned.filter(col("vec_id") =!= pid),
          "embedding", "vec_id", centroids,
          emb.filter(col("vec_id") === pid).select("embedding"),
          k = 10, nprobe = 2)
        .collect().map(r => (pid, r.getAs[Long]("vec_id")))
    }.sortBy(x => x).toSeq
    assert(batch.sorted === single)

    // nprobe ≥ centroid count degrades to exact search: recall@10 = 1
    val nCent = centroids.count().toInt
    val full = Similarity.ivfTopKBatch(assigned, "embedding", "vec_id",
        centroids, probes, k = 10, nprobe = nCent)
      .select(col("probe_id"), col("vec_id").as("neighbor_id"))
    val exact = Similarity.nearestNeighbors(probes, emb, "embedding", "vec_id", k = 10)
      .select(col("probe_id"), col("neighbor_id"))
    assert(full.join(exact, Seq("probe_id", "neighbor_id")).count() === 50L)
  }

  test("segmented IVF assignment: appends assign against the frozen " +
      "codebook; base + deltas ≡ full rebuild; appended vectors searchable") {
    val tmp = java.nio.file.Files.createTempDirectory("ivfseg").toString
    val emb = Tables.embeddings(spark, sf0001)
    val base = emb.filter(col("vec_id") < 300)
    val delta = emb.filter(col("vec_id") >= 300 && col("vec_id") < 450)

    graft.pipeline.IvfIndex.ensureSegmented(spark, sf0001, base,
      "embedding", "vec_id", artifactRootOverride = Some(tmp))
    graft.pipeline.IvfIndex.append(spark, sf0001, delta,
      "embedding", "vec_id", artifactRootOverride = Some(tmp))
    val merged = graft.pipeline.IvfIndex.ensureSegmented(spark, sf0001, base,
      "embedding", "vec_id", artifactRootOverride = Some(tmp))

    // the codebook is the BASE build's persisted artifact — a full
    // rebuild over base ∪ delta with that same codebook must match
    // row for row (assignment is per-vector pure)
    val cents = graft.pipeline.IvfIndex.ensureCentroids(spark, sf0001, base,
      "embedding", "vec_id", artifactRootOverride = Some(tmp),
      variant = "seg_seg")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "c_id").orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(key(merged) ===
      key(Similarity.ivfAssign(base.union(delta), "embedding", "vec_id", cents)))

    // an appended vector is immediately searchable: probing with its own
    // embedding must return it at rank 1 (cosine 1 with itself)
    val probeId = 350L
    val q = emb.filter(col("vec_id") === probeId).select("embedding")
    val top = Similarity.ivfTopK(merged, "embedding", "vec_id", cents, q,
      k = 1, nprobe = 2).collect()
    assert(top.head.getAs[Long]("vec_id") === probeId)
  }

  test("indexed LSH paths are bit-identical to the on-the-fly ones") {
    val emb = Tables.embeddings(spark, sf0001)
    val root = java.nio.file.Files.createTempDirectory("graft-lsh").toString
    val q = emb.filter(col("vec_id") === 0).select("embedding")
    val qSeq = q.collect().head.getSeq[Float](0)

    val indexed8 = graft.pipeline.LshIndex.ensure(spark, sf0001, emb,
      "embedding", "vec_id", planesPerTable = 4, tables = 8,
      artifactRootOverride = Some(root))
    val fly = Similarity.lshTopK(emb.filter(col("vec_id") =!= 0),
        "embedding", "vec_id", qSeq, 10, planesPerTable = 4, tables = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val idx = Similarity.lshTopKIndexed(indexed8.filter(col("vec_id") =!= 0),
        "embedding", "vec_id", q, 10, planesPerTable = 4, tables = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(idx.toSeq === fly.toSeq) // ids AND double scores, bit-for-bit

    val indexed3 = graft.pipeline.LshIndex.ensure(spark, sf0001, emb,
      "embedding", "vec_id", planesPerTable = 6, tables = 3,
      artifactRootOverride = Some(root))
    val flyP = Similarity.embeddingNearDupPairs(emb, "embedding", "vec_id",
        minCosine = 0.3, planesPerTable = 6, tables = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val idxP = Similarity.embeddingNearDupPairsIndexed(indexed3,
        "embedding", "vec_id", minCosine = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(idxP === flyP)
  }

  test("maxBucketSize guard: subset of exact pairs, exact dups never split, recall floor") {
    val emb = Tables.embeddings(spark, sf0001)
    val root = java.nio.file.Files.createTempDirectory("graft-lsh-cap").toString
    // exact copies of every 25th vector at id+10000: the guard's hard
    // invariant is that identical embeddings share every sign bit of
    // every signature, so copy-pairs can NEVER straddle a sub-bucket
    val corpus = emb.select(col("vec_id"), col("embedding"))
      .union(emb.filter(pmod(col("vec_id"), lit(25)) === 0)
        .select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
    val indexed = graft.pipeline.LshIndex.ensure(spark, sf0001, corpus,
      "embedding", "vec_id", planesPerTable = 6, tables = 3,
      artifactRootOverride = Some(root))
    def pairs(cap: Option[Long]) =
      Similarity.embeddingNearDupPairsIndexed(indexed, "embedding", "vec_id",
          minCosine = 0.5, maxBucketSize = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(None)
    // cap = 4 on a 520-row corpus over 64 buckets/table forces real
    // splits (avg bucket ≈ 8 > 4) — the guard is exercised, not idle
    val guarded = pairs(Some(4L))
    assert(guarded.subsetOf(exact), "guard must only ever REMOVE candidates")
    val copyPairs = exact.filter { case (a, b) => b == a + 10000 }
    assert(copyPairs.nonEmpty)
    assert(copyPairs.subsetOf(guarded), "exact duplicates must survive any cap")
    // recall floor at an adversarially small cap; p_e1 runs cap=256
    val recall = guarded.size.toDouble / exact.size
    assert(recall >= 0.80, s"guarded recall $recall < 0.80 floor (cap=4)")
    // a realistic cap leaves the sf0.001 candidate set untouched at all:
    // no bucket exceeds 256 rows, so sub = 0 everywhere
    assert(pairs(Some(256L)) === exact)
  }

  test("embeddingNearDupPairs only reports pairs above the threshold") {
    val emb = Tables.embeddings(spark, sf0001)
    val pairs = Similarity.embeddingNearDupPairs(emb, "embedding", "vec_id", 0.3)
      .collect()
    assert(pairs.forall(_.getAs[Double]("score") >= 0.3))
    assert(pairs.forall(r => r.getAs[Long]("a_id") < r.getAs[Long]("b_id")))
  }

  test("ivfQuantizedTopK with all buckets probed ≡ brute-force quantized top-k") {
    import graft.pipeline.{IvfIndex, Quantize}
    val emb = Tables.embeddings(spark, sf0001)
    val centroids = IvfIndex.centroids(emb, "vec_id", "embedding")
    val assigned = Similarity.ivfAssign(emb, "embedding", "vec_id", centroids)
    val q = emb.filter(col("vec_id") === 0).select("embedding")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // nprobe ≥ centroid count → every bucket probed → exactly brute force
    val ivf = rows(Similarity.ivfQuantizedTopK(
      assigned.filter(col("vec_id") =!= 0), "embedding", "vec_id",
      centroids, q, k = 20, nprobe = 1000000))
    val qz = broadcast(q.select(
      Quantize.int8Codes(col("embedding")).as("qc"),
      Quantize.int8Scale(col("embedding")).as("qs")))
    val brute = rows(emb.filter(col("vec_id") =!= 0)
      .select(col("vec_id"),
        Quantize.int8Codes(col("embedding")).as("c"),
        Quantize.int8Scale(col("embedding")).as("s"))
      .crossJoin(qz)
      .select(col("vec_id"), col("s"), col("qs"),
        Quantize.intDot(col("c"), col("qc")).as("int_dot"))
      .select(col("vec_id"), col("int_dot"),
        Quantize.quantizedScore(col("qs"), col("s"), col("int_dot")).as("score"))
      .orderBy(col("score").desc, col("vec_id")).limit(20))
    assert(ivf === brute)
    assert(ivf.size === 20)
  }

  test("semDeDup: exact copies group with their original; election is " +
      "internally consistent; singletons survive") {
    val emb = Tables.embeddings(spark, sf0001).select("vec_id", "embedding")
    val corpus = emb.union(emb.filter(pmod(col("vec_id"), lit(10)) === 0)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
    val centroids = graft.pipeline.IvfIndex.centroids(corpus, "vec_id", "embedding")
    val assigned = Similarity.ivfAssign(corpus, "embedding", "vec_id", centroids)
    val out = Similarity.semDeDup(assigned, centroids, "embedding", "vec_id",
      eps = 0.9).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rep_id"),
        r.getAs[Double]("cent_cos"), r.getAs[Long]("kept")))
    assert(out.length === corpus.count())
    val byId = out.map(t => t._1 -> t).toMap
    // each copy shares its original's group (cosine == 1 within-cluster)
    (0L until 500L by 10L).foreach { orig =>
      assert(byId(orig)._2 === byId(orig + 10000)._2,
        s"copy of $orig not grouped with it")
    }
    // exactly one keeper per group, and it is the (cent_cos, id)-minimum
    out.groupBy(_._2).foreach { case (rep, members) =>
      val keepers = members.filter(_._4 == 1L)
      assert(keepers.length === 1, s"group $rep kept ${keepers.length}")
      val expected = members.minBy(t => (t._3, t._1))
      assert(keepers.head._1 === expected._1,
        s"group $rep kept ${keepers.head._1}, expected ${expected._1}")
    }
    // a doc in no pair is its own kept group
    val singles = out.filter(t => t._1 == t._2 &&
      out.count(_._2 == t._2) == 1)
    assert(singles.nonEmpty && singles.forall(_._4 == 1L))
  }

  test("semDeDup mega-cluster guard: a deliberately skewed assignment " +
      "completes with bounded pairs; exact copies still dedupe") {
    // EVERY row lands in one cluster — the worst-case coarse assignment
    // (Σ cluster² = corpus²). With maxClusterSize the pair join keys on
    // (c_id, sub-bucket); exact copies share every sign bit of the
    // secondary signature, so they can never be split apart
    val emb = Tables.embeddings(spark, sf0001).select("vec_id", "embedding")
    val corpus = emb.union(emb.filter(pmod(col("vec_id"), lit(10)) === 0)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
    val skewed = corpus.withColumn("c_id", lit(1L))
    val centroids = Seq((1L, Seq.fill(64)(0.1f))).toDF("c_id", "c_emb")
    val out = Similarity.semDeDup(skewed, centroids, "embedding", "vec_id",
      eps = 0.999, maxClusterSize = Some(50L)).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rep_id"),
        r.getAs[Long]("kept")))
    assert(out.length === corpus.count())
    val byId = out.map(t => t._1 -> t).toMap
    (0L until 500L by 10L).foreach { orig =>
      assert(byId(orig)._2 === byId(orig + 10000)._2,
        s"exact copy of $orig split from it by the sub-bucket guard")
    }
    // exactly one keeper per group; the guarded path still elects cleanly
    out.groupBy(_._2).foreach { case (rep, members) =>
      assert(members.count(_._3 == 1L) === 1, s"group $rep keeper count")
    }
    // sub-bucketing engages only above the cap: an under-cap run over the
    // same skewed assignment is IDENTICAL to the exact (unguarded) path
    val tiny = corpus.filter(col("vec_id") < 40).withColumn("c_id", lit(1L))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rep_id"),
        r.getAs[Long]("kept"))).sortBy(_._1).toSeq
    assert(rows(Similarity.semDeDup(tiny, centroids, "embedding", "vec_id",
        eps = 0.9, maxClusterSize = Some(1000L))) ===
      rows(Similarity.semDeDup(tiny, centroids, "embedding", "vec_id",
        eps = 0.9)))
  }

  test("semDeDup mega-cluster guard fails loudly on an embedding dim mismatch") {
    // wrong dim → every plane dot nulls → the sign fold would silently
    // collapse the signature to 0 and disable the guard; it must raise
    val emb = Tables.embeddings(spark, sf0001).select("vec_id", "embedding")
      .withColumn("c_id", lit(1L))
    val centroids = Seq((1L, Seq.fill(64)(0.1f))).toDF("c_id", "c_emb")
    val ex = intercept[Exception] {
      Similarity.semDeDup(emb, centroids, "embedding", "vec_id",
        eps = 0.9, maxClusterSize = Some(10L), dim = 32).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("does dim=32 match")), msgs(ex).mkString("; "))
  }

  test("semDeDup keeps the member LEAST similar to its centroid, not the " +
      "smallest id (the paper's edge-example rule)") {
    // one cluster: centroid (1,0); three near-duplicates of each other at
    // decreasing similarity to the centroid — keeper must be id 30 (the
    // farthest), proving the election is cent_cos-first, id only on ties
    val centroids = Seq((1L, Seq(1f, 0f))).toDF("c_id", "c_emb")
    val assigned = Seq(
      (10L, Seq(1f, 0.01f), 1L),
      (20L, Seq(1f, 0.10f), 1L),
      (30L, Seq(1f, 0.30f), 1L),
    ).toDF("vec_id", "embedding", "c_id")
    val out = Similarity.semDeDup(assigned, centroids, "embedding", "vec_id",
      eps = 0.9).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rep_id"),
        r.getAs[Long]("kept"))).sortBy(_._1)
    assert(out.map(_._2).toSeq === Seq(10L, 10L, 10L)) // one group, min label
    assert(out.map(_._3).toSeq === Seq(0L, 0L, 1L),
      "the least-centroid-similar member (id 30) must be the keeper")
  }

  test("semDeDup over the persisted variant artifact ≡ on-the-fly assignment") {
    val root = java.nio.file.Files.createTempDirectory("graft-semdedup-").toString
    val emb = Tables.embeddings(spark, sf0001).select("vec_id", "embedding")
    val corpus = emb.union(emb.filter(pmod(col("vec_id"), lit(10)) === 0)
      .select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
    val centroids = graft.pipeline.IvfIndex.centroids(corpus, "vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rep_id"),
        r.getAs[Double]("cent_cos"), r.getAs[Long]("kept"))).sortBy(_._1).toSeq
    val onTheFly = rows(Similarity.semDeDup(
      Similarity.ivfAssign(corpus, "embedding", "vec_id", centroids),
      centroids, "embedding", "vec_id", eps = 0.9))
    val indexed = rows(Similarity.semDeDup(
      graft.pipeline.IvfIndex.ensure(spark, sf0001, corpus, "embedding",
        "vec_id", artifactRootOverride = Some(root), variant = "dup10"),
      graft.pipeline.IvfIndex.ensureCentroids(spark, sf0001, corpus, "embedding",
        "vec_id", artifactRootOverride = Some(root), variant = "dup10"),
      "embedding", "vec_id", eps = 0.9))
    assert(indexed === onTheFly)
    // and the variant artifact is distinct from the plain corpus index
    val plainKey = new java.io.File(root).list().toSeq
    assert(plainKey.exists(_.contains("dup10")))
  }

  test("semDeDup accepts idCol = doc_id (no collision with the internal " +
      "component-label columns)") {
    // document corpora naturally use doc_id; the labels frame from
    // nearDupClusters also emits doc_id/rep_id — regression for the
    // AMBIGUOUS_REFERENCE this used to throw
    val centroids = Seq((1L, Seq(1f, 0f))).toDF("c_id", "c_emb")
    val assigned = Seq(
      (10L, Seq(1f, 0.01f), 1L),
      (20L, Seq(1f, 0.10f), 1L),
    ).toDF("doc_id", "embedding", "c_id")
    val out = Similarity.semDeDup(assigned, centroids, "embedding", "doc_id",
      eps = 0.9).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rep_id"),
        r.getAs[Long]("kept"))).sortBy(_._1)
    assert(out.map(_._2).toSeq === Seq(10L, 10L))
    assert(out.map(_._3).toSeq === Seq(0L, 1L))
    // and the one genuinely unsupportable name fails fast, not mid-plan
    val err = intercept[IllegalArgumentException] {
      Similarity.semDeDup(assigned.withColumnRenamed("doc_id", "rep_id"),
        centroids, "embedding", "rep_id", eps = 0.9)
    }
    assert(err.getMessage.contains("rep_id"))
  }
}
