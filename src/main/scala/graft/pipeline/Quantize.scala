package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Scalar int8 quantization for embedding vectors — the
  * storage/bandwidth half of ANN at 100 TB: 4× smaller than float32, so
  * 4× more vectors per executor and per scan, with ranking preserved to
  * quantization error (symmetric per-vector scaling, the standard
  * faiss-style SQ8 scheme). The codes ride the same ingest-artifact
  * lifecycle as [[LshIndex]]/[[IvfIndex]] — [[SqIndex]] persists
  * `(codes, scale)` once per corpus (plain and IVF-partitioned);
  * queries scan codes and rank with the codegen'd [[VecDotInt]]
  * integer dot, optionally re-ranking survivors with the float vectors.
  *
  * Determinism/oracle notes: codes use `floor(x·127/maxabs + 0.5)`
  * (round-half-up spelled as floor, so no engine rounding-mode
  * ambiguity); every op is IEEE correctly-rounded arithmetic on the
  * same float32 inputs, so an external engine replays codes, scales,
  * and scores bit-for-bit. The integer dot product is exact in any
  * summation order — no ordered-fold machinery needed, unlike the
  * float paths ([[Similarity.cosine]]).
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

  /** Exact integer dot product of two code arrays — the codegen'd
    * [[VecDotInt]] expression, NOT the `aggregate(zip_with(...))` HOF
    * form: Spark HOFs are CodegenFallback and evaluate interpreted, one
    * lambda frame per element — the exact pattern the float scoring path
    * measured ~100× slower and replaced with `vec_dot`
    * ([[Similarity.dot]]). Integer addition is exact in any order, so
    * the value is identical to the HOF form (and to the DuckDB oracles'
    * `list_sum(list_transform(...))` replay) by arithmetic, not just by
    * fold-order discipline. */
  def intDot(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("vec_dot_int", a, b)

  /** JVM kernel shared by VecDotInt's interpreted and generated paths.
    * Null on length mismatch or any null element — the same outcomes the
    * HOF form produced (zip_with pads the shorter array with nulls, and
    * a null element nulls the whole fold). Products and the running sum
    * use wrapping 64-bit arithmetic, exactly like the HOF's `x * y` /
    * `acc + v` long math. */
  def dotLongArrays(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** `vec_dot_int(a, b)`: exact dot of two `array<bigint>` code columns,
    * codegen'd (SQL-registered via `GraftExtensions`). */
  case class VecDotInt(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any, b: Any): Any =
      Quantize.dotLongArrays(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val boxed = ctx.freshName("boxed")
        s"""
           |java.lang.Long $boxed = graft.pipeline.Quantize.dotLongArrays($a, $b);
           |${ev.isNull} = $boxed == null;
           |${ev.value} = ${ev.isNull} ? 0L : $boxed.longValue();
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
    override def prettyName: String = "vec_dot_int"
  }

  // ---- packed-byte codes (the storage layout) ----------------------------
  //
  // `array<bigint>` codes are the ORACLE-friendly form (DuckDB replays
  // list math on BIGINTs), but as a storage/scan layout they defeat SQ8:
  // 8 bytes per component in memory — 2× WORSE than the float32 they
  // quantize — and parquet's bit-packing only claws back ~2× on disk.
  // The real artifact layout is faiss's: ONE signed byte per component
  // in a BinaryType column (d bytes + constant overhead per vector, the
  // true 4× under float32). `pack_int8` converts at ingest; the
  // codegen'd `vec_dot_int8` scores the packed bytes directly, and the
  // integer dot value is identical to the long-array form by arithmetic.

  /** Pack `array<bigint>` int8 codes into one signed byte each. */
  def packCodes(codes: Column): Column =
    org.apache.spark.sql.functions.call_function("pack_int8", codes)

  /** Exact integer dot of two packed-byte code columns. */
  def packedDot(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("vec_dot_int8", a, b)

  /** [[withQuantized]] with the codes packed to the byte layout — the
    * form every PERSISTED artifact uses ([[SqIndex]]). */
  def withQuantizedPacked(df: org.apache.spark.sql.DataFrame, embCol: String,
      codesCol: String = "codes", scaleCol: String = "scale"): org.apache.spark.sql.DataFrame =
    withQuantized(df, embCol, codesCol, scaleCol)
      .withColumn(codesCol, packCodes(col(codesCol)))

  /** JVM kernel for PackInt8: null if any element is null or outside
    * the signed-byte range (codes are in [-127, 127] by construction —
    * out-of-range means the input was not an int8 code array). */
  def packInt8(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val v = a.getLong(i)
      if (v < -128L || v > 127L) return null
      out(i) = v.toByte
      i += 1
    }
    out
  }

  /** JVM kernel for VecDotInt8: signed-byte dot accumulated in 64-bit
    * (cannot overflow below ~2^48 dimensions); null on length mismatch. */
  def dotInt8(a: Array[Byte], b: Array[Byte]): java.lang.Long = {
    if (a.length != b.length) return null
    var acc = 0L
    var i = 0
    while (i < a.length) {
      acc += a(i).toLong * b(i).toLong
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  /** `pack_int8(codes)`: `array<bigint>` → binary, one signed byte per
    * code, codegen'd. */
  case class PackInt8(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.BinaryType
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any): Any =
      Quantize.packInt8(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val packed = ctx.freshName("packed")
        s"""
           |byte[] $packed = graft.pipeline.Quantize.packInt8($a);
           |${ev.isNull} = $packed == null;
           |${ev.value} = ${ev.isNull} ? new byte[0] : $packed;
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
    override def prettyName: String = "pack_int8"
  }

  /** `vec_dot_int8(a, b)`: exact dot of two packed-byte code columns,
    * codegen'd. */
  case class VecDotInt8(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any, b: Any): Any =
      Quantize.dotInt8(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val boxed = ctx.freshName("boxed")
        s"""
           |java.lang.Long $boxed = graft.pipeline.Quantize.dotInt8($a, $b);
           |${ev.isNull} = $boxed == null;
           |${ev.value} = ${ev.isNull} ? 0L : $boxed.longValue();
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
    override def prettyName: String = "vec_dot_int8"
  }

  /** Approximate dot-product score of two quantized vectors:
    * scaleA · scaleB · ⟨codesA, codesB⟩. Pure products of deterministic
    * doubles and an exact integer — bit-stable across engines. */
  def quantizedScore(scaleA: Column, scaleB: Column, dot: Column): Column =
    scaleA * scaleB * dot.cast(DoubleType)
}
