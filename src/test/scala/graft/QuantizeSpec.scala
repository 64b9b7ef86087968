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
}
