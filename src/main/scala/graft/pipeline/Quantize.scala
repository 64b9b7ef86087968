package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Scalar int8 quantization for embedding vectors — the
  * storage/bandwidth half of ANN at 100 TB: 4× smaller than float32, so
  * 4× more vectors per executor and per scan, with ranking preserved to
  * quantization error (symmetric per-vector scaling, the standard
  * faiss-style SQ8 scheme). The codes ride the same ingest-artifact
  * lifecycle as [[LshIndex]]/[[IvfIndex]] — quantize once at ingest,
  * scan codes at query time, optionally re-rank survivors with the
  * float vectors.
  *
  * Determinism/oracle notes: codes use `floor(x·127/maxabs + 0.5)`
  * (round-half-up spelled as floor, so no engine rounding-mode
  * ambiguity); every op is IEEE correctly-rounded arithmetic on the
  * same float32 inputs, so an external engine replays codes, scales,
  * and scores bit-for-bit. The integer dot product is exact in any
  * summation order — no ordered-fold machinery needed, unlike the
  * float paths ([[Similarity.cosine]]). HOF evaluation is fine here at
  * gate scale; a production hot path would add a codegen'd integer
  * VecDot twin (same pattern as the float `vec_dot` expression).
  */
object Quantize {

  /** Per-vector symmetric range: max |x_i| as double. */
  def maxAbs(emb: Column): Column =
    array_max(transform(emb, x => abs(x.cast(DoubleType))))

  /** Int8 codes in [-127, 127] (as longs for exact downstream integer
    * math); the zero vector quantizes to all-zero codes.
    *
    * NOTE: this single-Column form re-evaluates `maxAbs` (an O(d) fold)
    * inside the per-element lambda — O(d²) per vector in interpreted HOF
    * evaluation. Fine for a one-row query vector; for a corpus-side
    * projection use [[withQuantized]], which stages the max once per
    * row. */
  def int8Codes(emb: Column): Column = codesFrom(emb, maxAbs(emb))

  private def codesFrom(emb: Column, m: Column): Column =
    when(m === 0.0, transform(emb, _ => lit(0L)))
      .otherwise(transform(emb,
        x => floor(x.cast(DoubleType) * lit(127.0) / m + lit(0.5)).cast(LongType)))

  /** Dequantization scale: code · scale ≈ x. Zero vector → scale 0. */
  def int8Scale(emb: Column): Column = maxAbs(emb) / lit(127.0)

  /** Stage `(codesCol, scaleCol)` onto `df` with the per-vector max
    * computed ONCE as an attribute (the staged-norm pattern of
    * [[Similarity.ivfAssign]]): per-element work is O(1), per-vector
    * O(d) — the form every corpus-side quantization should use. */
  def withQuantized(df: org.apache.spark.sql.DataFrame, embCol: String,
      codesCol: String = "codes", scaleCol: String = "scale"): org.apache.spark.sql.DataFrame =
    df.withColumn("__qm", maxAbs(col(embCol)))
      .withColumn(codesCol, codesFrom(col(embCol), col("__qm")))
      .withColumn(scaleCol, col("__qm") / lit(127.0))
      .drop("__qm")

  /** Exact integer dot product of two code arrays. */
  def intDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Approximate dot-product score of two quantized vectors:
    * scaleA · scaleB · ⟨codesA, codesB⟩. Pure products of deterministic
    * doubles and an exact integer — bit-stable across engines. */
  def quantizedScore(scaleA: Column, scaleB: Column, dot: Column): Column =
    scaleA * scaleB * dot.cast(DoubleType)
}
