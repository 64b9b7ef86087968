package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Quantize

/** Int8 scalar quantization: exact code values, reconstruction bound,
  * and ranking fidelity of the quantized dot against the exact dot. */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private def one(vec: Seq[Float]): (Seq[Long], Double) = {
    val r = Seq(Tuple1(vec)).toDF("embedding")
      .select(Quantize.int8Codes(col("embedding")).as("c"),
        Quantize.int8Scale(col("embedding")).as("s"))
      .head
    (r.getSeq[Long](0), r.getDouble(1))
  }

  test("known vector quantizes to exact codes; zero vector to zeros") {
    val (codes, scale) = one(Seq(1.0f, -0.5f, 0.25f))
    assert(codes === Seq(127L, -63L, 32L)) // floor(x*127 + 0.5)
    assert(scale === 1.0 / 127.0)
    val (zc, zs) = one(Seq(0.0f, 0.0f))
    assert(zc === Seq(0L, 0L) && zs === 0.0)
  }

  test("reconstruction error bounded by scale/2 per component") {
    val vec = Seq(0.83f, -0.11f, 0.47f, -0.99f, 0.003f)
    val (codes, scale) = one(vec)
    for ((x, c) <- vec.zip(codes))
      assert(math.abs(c * scale - x) <= scale / 2 + 1e-12, s"component $x")
  }

  test("quantized top-10 closely tracks the exact-dot top-10") {
    val emb = Tables.embeddings(spark, sf0001)
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"),
      Quantize.int8Codes(col("embedding")).as("q_codes"),
      Quantize.int8Scale(col("embedding")).as("q_scale"))
    val joined = emb.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
    val exact = joined
      .select(col("vec_id"), dot(col("embedding"), col("q_emb")).as("s"))
      .orderBy(col("s").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val approx = joined
      .select(col("vec_id"),
        Quantize.quantizedScore(col("q_scale"),
          Quantize.int8Scale(col("embedding")),
          Quantize.intDot(Quantize.int8Codes(col("embedding")), col("q_codes")))
          .as("s"))
      .orderBy(col("s").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    assert((exact intersect approx).size >= 7,
      s"quantized recall too low: $exact vs $approx")
  }

  test("codes and scores are deterministic under repartitioning") {
    val emb = Tables.embeddings(spark, sf0001)
    def run(e: org.apache.spark.sql.DataFrame) =
      e.select(col("vec_id"), Quantize.int8Codes(col("embedding")).as("c"))
        .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    assert(run(emb).toSeq === run(emb.repartition(7)).toSeq)
  }

  test("vec_dot_int equals the interpreted HOF fold; null semantics match") {
    def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)
    // corpus-wide agreement between the codegen'd kernel and the HOF form
    val emb = Tables.embeddings(spark, sf0001)
    val q = emb.filter(col("vec_id") === 0)
      .select(Quantize.int8Codes(col("embedding")).as("q_codes"))
    val both = emb.crossJoin(broadcast(q))
      .select(Quantize.int8Codes(col("embedding")).as("c"), col("q_codes"))
      .select(Quantize.intDot(col("c"), col("q_codes")).as("fast"),
        hofDot(col("c"), col("q_codes")).as("slow"))
    assert(both.filter(col("fast") =!= col("slow") ||
      col("fast").isNull =!= col("slow").isNull).count() === 0)
    // length mismatch and null elements → null, exactly like the HOF
    val edge = Seq(
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](3L, 4L)),
      (Seq[java.lang.Long](1L, 2L), Seq[java.lang.Long](3L)),
      (Seq[java.lang.Long](1L, null), Seq[java.lang.Long](3L, 4L)))
      .toDF("a", "b")
      .select(Quantize.intDot(col("a"), col("b")).as("fast"),
        hofDot(col("a"), col("b")).as("slow"))
      .collect().map(r => (if (r.isNullAt(0)) null else r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1)))
    assert(edge.toSeq === Seq((11L, 11L), (null, null), (null, null)))
  }

  test("SqIndex segmented: base ∪ appended delta ≡ full quantization, bit for bit") {
    val root = java.nio.file.Files.createTempDirectory("graft-sqseg-").toString
    val emb = Tables.embeddings(spark, sf0001)
    val base = emb.filter(col("vec_id") < 300)
    val delta = emb.filter(col("vec_id") >= 300)
    pipeline.SqIndex.ensureSegmented(spark, sf0001, base, "embedding",
      "vec_id", variant = "segspec", artifactRootOverride = Some(root))
    pipeline.SqIndex.append(spark, sf0001, delta, "embedding",
      "vec_id", variant = "segspec", artifactRootOverride = Some(root))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq, r.getDouble(2))).toSeq
    val segmented = rows(pipeline.SqIndex.ensureSegmented(spark, sf0001, base,
      "embedding", "vec_id", variant = "segspec", artifactRootOverride = Some(root)))
    val full = rows(Quantize.withQuantizedPacked(
        emb.select(col("vec_id"), col("embedding")), "embedding")
      .select(col("vec_id"), col("codes"), col("scale")))
    assert(segmented === full)
  }

  test("streaming micro-batches maintain the segmented SQ8 index via foreachBatch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-sqstream-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sqstream-ck-").toString
    val emb = Tables.embeddings(spark, sf0001)
    val all = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Seq[Float])]
    val query = input.toDF().toDF("vec_id", "embedding")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        // first batch builds the base, later batches append one
        // O(batch) delta segment each — the streaming-era lifecycle
        val dir = s"$root/sq8seg_sf0.001_stream_v${pipeline.SqIndex.FormatVersion}"
        if (!new java.io.File(dir).exists())
          pipeline.SqIndex.ensureSegmented(spark, sf0001, df, "embedding",
            "vec_id", variant = "stream", artifactRootOverride = Some(root))
        else
          pipeline.SqIndex.append(spark, sf0001, df, "embedding",
            "vec_id", variant = "stream", artifactRootOverride = Some(root))
        ()
      }.start()
    try {
      input.addData(all.take(200).toSeq); query.processAllAvailable()
      input.addData(all.slice(200, 350).toSeq); query.processAllAvailable()
      input.addData(all.drop(350).toSeq); query.processAllAvailable()
    } finally query.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq, r.getDouble(2))).toSeq
    val streamed = rows(pipeline.SqIndex.ensureSegmented(spark, sf0001,
      emb.limit(0), "embedding", "vec_id", variant = "stream",
      artifactRootOverride = Some(root)))
    val full = rows(Quantize.withQuantizedPacked(
        emb.select(col("vec_id"), col("embedding")), "embedding")
      .select(col("vec_id"), col("codes"), col("scale")))
    assert(streamed === full) // three micro-batches ≡ one-shot quantization
  }

  test("SqIndex: persisted codes ≡ in-plan quantization; indexed IVF-SQ8 ≡ inline") {
    val root = java.nio.file.Files.createTempDirectory("graft-sq-").toString
    val emb = Tables.embeddings(spark, sf0001)
    // flat artifact rows equal the in-plan projection, code for code
    // (stored codes are the packed one-byte layout)
    val stored = pipeline.SqIndex.ensure(spark, sf0001, emb, "embedding",
        "vec_id", artifactRootOverride = Some(root))
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq, r.getDouble(2))).toSeq
    val inline = Quantize.withQuantizedPacked(
        emb.select(col("vec_id"), col("embedding")), "embedding")
      .select(col("vec_id"), col("codes"), col("scale"))
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq, r.getDouble(2))).toSeq
    assert(stored === inline)
    // packing is lossless: unpacked bytes equal the long-array codes
    val longCodes = Quantize.withQuantized(
        emb.select(col("vec_id"), col("embedding")), "embedding")
      .orderBy("vec_id").collect()
      .map(r => r.getSeq[Long](r.fieldIndex("codes")).map(_.toByte).toSeq).toSeq
    assert(stored.map(_._2) === longCodes)
    // IVF-SQ8 over persisted codes ≡ the in-plan composition, bit for bit
    val ivfRoot = java.nio.file.Files.createTempDirectory("graft-sqivf-").toString
    val quantized = pipeline.SqIndex.ensureIvf(spark, sf0001, emb, "embedding",
      "vec_id", artifactRootOverride = Some(root),
      ivfArtifactRootOverride = Some(ivfRoot))
    val q = emb.filter(col("vec_id") === 0).select("embedding")
    val cents = pipeline.IvfIndex.centroids(emb, "vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val indexed = rows(pipeline.Similarity.ivfQuantizedTopKIndexed(
      quantized.filter(col("vec_id") =!= 0), "embedding", "vec_id",
      cents, q, k = 20, nprobe = 4))
    val inPlan = rows(pipeline.Similarity.ivfQuantizedTopK(
      pipeline.IvfIndex.ensure(spark, sf0001, emb, "embedding", "vec_id",
        artifactRootOverride = Some(ivfRoot)).filter(col("vec_id") =!= 0),
      "embedding", "vec_id", cents, q, k = 20, nprobe = 4))
    assert(indexed === inPlan)
    assert(indexed.size === 20)
  }
}
