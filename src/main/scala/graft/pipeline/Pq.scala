package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Product quantization (PQ) — the high-compression half of ANN at
  * 100 TB, complementing [[Quantize]]'s SQ8: split each d-dim vector
  * into `m` subspaces of `d/m` dims, quantize every subvector to its
  * nearest codeword from a per-subspace codebook of `k` entries, and
  * store ONE byte per subspace (m bytes per vector — 32× under float32
  * at d=64/m=8, vs SQ8's 4×). Queries never reconstruct vectors:
  * asymmetric distance computation (ADC) precomputes the m×k table of
  * ⟨query_sub, codeword⟩ dots ONCE per query, then scores each vector
  * with m table lookups over its stored codes — the codegen'd
  * [[PqAdc]] expression, no float-vector reads anywhere in the scan.
  *
  * Codebooks come in two flavors, mirroring [[IvfIndex.Quantizer]]:
  * deterministic stride-sampled subvectors (exactly SQL-replayable, so
  * oracle-checked entries re-derive codebook, codes, AND scores in an
  * external engine), or Lloyd-trained per-subspace centroids
  * ([[trainCodebook]] — all m subspaces train simultaneously in one
  * DataFrame job per iteration; EUCLIDEAN assignment, the PQ-correct
  * metric, unlike the cosine-flavored [[KMeans]] used for the IVF
  * coarse quantizer). Encoding is the same Euclidean argmin either way:
  * d²(v_sub, c) = ⟨v,v⟩ − 2⟨v,c⟩ + ⟨c,c⟩ with both self-dots staged
  * once, ties to the lowest codeword id — every term a sequential-fold
  * [[Similarity.dot]], so codes are bit-reproducible across engines.
  *
  * Like every index here, the codebook and codes are INGEST-TIME
  * artifacts ([[PqIndex]]); queries read the persisted m×k codebook
  * (one tiny file) and scan persisted packed codes.
  */
object Pq {

  /** Default geometry for the 64-dim fixture corpus: 8 subspaces × 8
    * dims, 16 codewords per subspace → 8-byte codes, 32× under float32. */
  val DefaultM = 8
  val DefaultK = 16
  val DefaultStride = 7

  /** Explode `df` into one row per (vector, subspace):
    * `(idCol, m, v_sub, vdot)` with the subvector self-dot staged once —
    * the per-(row, codeword) encode work stays ONE dot. */
  def subVectors(df: DataFrame, embCol: String, idCol: String,
      m: Int, ds: Int): DataFrame =
    df.select(col(idCol),
        posexplode(array((0 until m).map(s =>
          slice(col(embCol), s * ds + 1, ds)): _*)).as(Seq("m", "v_sub")))
      .withColumn("vdot", Similarity.dot(col("v_sub"), col("v_sub")))

  /** Deterministic stride-sampled codebook: codeword `j` of every
    * subspace is the matching subvector of the corpus vector with
    * id = j·stride (j < k) — reproducible from the corpus by any engine,
    * like [[IvfIndex.centroids]]. Returns `(m, j, c_sub, cdot)`. */
  def strideCodebook(emb: DataFrame, embCol: String, idCol: String,
      m: Int, ds: Int, k: Int, stride: Int): DataFrame =
    emb.filter(pmod(col(idCol), lit(stride)) === 0 &&
        col(idCol) < lit(stride.toLong * k))
      .select((col(idCol) / lit(stride)).cast("long").as("j"),
        posexplode(array((0 until m).map(s =>
          slice(col(embCol), s * ds + 1, ds)): _*)).as(Seq("m", "c_sub")))
      .withColumn("cdot", Similarity.dot(col("c_sub"), col("c_sub")))

  /** Euclidean nearest-codeword assignment for every (vector, subspace):
    * `(idCol, m, j, d2)`. The codebook (m×k rows) broadcasts; the corpus
    * side never shuffles — the argmin window partitions on (id, m),
    * which the explode already co-locates. */
  def encode(subs: DataFrame, codebook: DataFrame, idCol: String): DataFrame = {
    val scored = subs.join(broadcast(codebook), Seq("m"))
      .withColumn("d2",
        col("vdot") - lit(2.0) * Similarity.dot(col("v_sub"), col("c_sub")) +
          col("cdot"))
    val w = Window.partitionBy(col(idCol), col("m")).orderBy(col("d2"), col("j"))
    scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col(idCol), col("m"), col("j"), col("d2"))
  }

  /** Full encode: `(idCol, codes)` with the m codeword ids packed one
    * byte each (binary, the storage layout — k ≤ 127 by construction). */
  def codesOf(emb: DataFrame, embCol: String, idCol: String,
      codebook: DataFrame, m: Int, ds: Int): DataFrame =
    encode(subVectors(emb, embCol, idCol, m, ds), codebook, idCol)
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("m"), col("j")))).as("__mj"))
      .select(col(idCol),
        Quantize.packCodes(transform(col("__mj"), x => x.getField("j")))
          .as("codes"))

  /** Lloyd-trained per-subspace codebooks — init from the stride sample,
    * then `iters` rounds of (Euclidean assign → per-(m, j) subvector
    * mean). ALL subspaces train in the same job: the contribution
    * explode keys on (m, j, pos), so one shuffle of m×k×ds partial sums
    * per round, never vectors. Codewords that lose every member keep
    * their previous value (k stable), exactly like [[KMeans.step]]. */
  def trainCodebook(emb: DataFrame, embCol: String, idCol: String,
      m: Int, ds: Int, k: Int, stride: Int, iters: Int): DataFrame = {
    val subs = subVectors(emb, embCol, idCol, m, ds)
    // trained means keep the INPUT element type: float embeddings train
    // float codewords, but double residuals ([[residuals]]) must stay
    // exact doubles — a float cast there would truncate codewords and
    // break the documented double-exact external replay
    val elem = emb.schema(embCol).dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
    (0 until iters).foldLeft(strideCodebook(emb, embCol, idCol, m, ds, k, stride)) {
      (cb, _) =>
        val assigned = encode(subs, cb, idCol)
          .join(subs.select(col(idCol), col("m"), col("v_sub")), Seq(idCol, "m"))
        val contrib = assigned
          .select(col("m"), col("j"), posexplode(col("v_sub")).as(Seq("__pos", "__x")))
          .groupBy(col("m"), col("j"), col("__pos"))
          .agg(avg(col("__x").cast("double")).as("__mean"))
        val means = contrib.groupBy(col("m"), col("j"))
          .agg(array_sort(collect_list(struct(col("__pos"), col("__mean")))).as("__pm"))
          .select(col("m"), col("j"),
            transform(col("__pm"), x => x.getField("__mean").cast(elem)).as("__new"))
        // materialize the m×k frame each round: every iteration references
        // its predecessor several times (encode + the update join), so an
        // uncached fold re-executes earlier assignments combinatorially
        cb.join(means, Seq("m", "j"), "left")
          .select(col("m"), col("j"),
            coalesce(col("__new"), col("c_sub")).as("c_sub"))
          .withColumn("cdot", Similarity.dot(col("c_sub"), col("c_sub")))
          .localCheckpoint(true)
    }
  }

  /** Mean squared quantization error (mean over (vector, subspace) of
    * the chosen codeword's d²) — the quality metric training must
    * improve over the stride init. */
  def quantizationMse(emb: DataFrame, embCol: String, idCol: String,
      codebook: DataFrame, m: Int, ds: Int): Double =
    encode(subVectors(emb, embCol, idCol, m, ds), codebook, idCol)
      .agg(avg(col("d2"))).collect()(0).getDouble(0)

  // ---- residual encoding (the faiss IVF-PQ default) ----------------------

  /** Residual frame `(idCol, c_id, r: array<double>)` — the EXACT double
    * difference v − centroid(v) over the coarse assignment. Quantizing
    * residuals instead of raw vectors is the standard IVF-PQ refinement:
    * residual magnitudes are much smaller than vector magnitudes, so the
    * same codebook budget spends on a tighter distribution. Doubles (not
    * floats) so the subtraction is exact IEEE on both engines — an
    * external replay computes bit-identical residuals. The zip_with
    * difference is an interpreted HOF, but this runs at INGEST only
    * (once per corpus); queries touch codes and the m×k codebook. */
  def residuals(assigned: DataFrame, embCol: String, idCol: String,
      centroids: DataFrame): DataFrame =
    assigned.join(broadcast(centroids.select(col("c_id"), col("c_emb"))), Seq("c_id"))
      .select(col(idCol), col("c_id"),
        zip_with(col(embCol), col("c_emb"),
          (x, y) => x.cast(DoubleType) - y.cast(DoubleType)).as("r"))

  /** Residual IVF-PQ search — the inner-product decomposition
    * ⟨q, v⟩ = ⟨q, c(v)⟩ + ⟨q, r(v)⟩ ≈ ⟨q, c(v)⟩ + ADC(residual codes):
    * the per-bucket term ⟨q, c⟩ computes once per PROBED centroid (a
    * bounded broadcast carrying nprobe rows), and the residual ADC table
    * is centroid-independent under inner product — one m×k LUT per
    * query, exactly like the non-residual path. The probed scan reads
    * only the m-byte residual codes. `codes` must carry
    * `(idCol, codes, c_id)` encoded against `codebook` (a RESIDUAL
    * codebook, [[PqIndex.ensureResidualCodebook]]). */
  def ivfPqResidualTopK(codes: DataFrame, idCol: String, codebook: DataFrame,
      centroids: DataFrame, query: DataFrame, embCol: String, k: Int,
      nprobe: Int, ds: Int): DataFrame = {
    val q = broadcast(query.select(col(embCol).as("__q")))
    val probed = centroids.crossJoin(q)
      .select(col("c_id"),
        Similarity.cosine(col("c_emb"), col("__q")).as("__ps"),
        Similarity.dot(col("__q"), col("c_emb")).as("__qc"))
      .orderBy(col("__ps").desc, col("c_id"))
      .limit(nprobe)
      .select(col("c_id"), col("__qc"))
    val qd = query.select(transform(col(embCol), x => x.cast(DoubleType)).as("__qd"))
    val lut = broadcast(adcLut(codebook, qd, "__qd", ds))
    codes.join(broadcast(probed), Seq("c_id"))
      .crossJoin(lut)
      .select(col(idCol),
        (col("__qc") + adcScore(col("codes"), col("lut"), col("kk"))).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  // ---- ADC scoring ------------------------------------------------------

  /** The per-query ADC lookup table as a 1-row frame
    * `(lut: array<double>, kk: bigint)`: entry m·kk + j holds
    * ⟨query_sub_m, codeword_{m,j}⟩. Built from the (m×k)-row codebook ×
    * the broadcast 1-row query — no driver collect; the deterministic
    * (m, j) struct sort fixes the layout. `query` must be a 1-row frame
    * whose `embCol` is the query vector. */
  def adcLut(codebook: DataFrame, query: DataFrame, embCol: String,
      ds: Int): DataFrame =
    codebook.crossJoin(broadcast(query.select(col(embCol).as("__q"))))
      .select(col("m"), col("j"),
        Similarity.dot(slice(col("__q"), col("m") * lit(ds) + lit(1), lit(ds)),
          col("c_sub")).as("pdot"))
      .groupBy()
      .agg(array_sort(collect_list(struct(col("m"), col("j"), col("pdot"))))
          .as("__s"),
        (max(col("j")) + lit(1L)).as("kk"))
      .select(transform(col("__s"), x => x.getField("pdot")).as("lut"),
        col("kk"))

  /** ADC score of packed codes against a query LUT — the codegen'd
    * [[PqAdc]]: Σ_m lut[m·kk + codes[m]], summed in subspace order (the
    * same left-to-right double fold an external engine replays with an
    * ordered list sum). Approximates ⟨query, vector⟩. */
  def adcScore(codes: Column, lut: Column, kk: Column): Column =
    call_function("pq_adc", codes, lut, kk)

  /** JVM kernel shared by PqAdc's interpreted and generated paths: null
    * on any out-of-table code (`j` outside [0, kk) in ANY subspace, not
    * just where the flat index happens to run past the end), on a LUT
    * whose size is not exactly m·kk (a missing (m, j) entry would shift
    * every later slot — positional indexing must fail loudly, not read a
    * neighboring subspace's entry), or on a null LUT slot. */
  def adcKernel(codes: Array[Byte], lut: ArrayData, kk: Long): java.lang.Double = {
    val n = lut.numElements()
    if (kk <= 0 || codes.length * kk != n) return null
    var acc = 0.0
    var m = 0
    while (m < codes.length) {
      val j = codes(m).toLong
      if (j < 0 || j >= kk) return null
      val idx = m * kk + j
      if (lut.isNullAt(idx.toInt)) return null
      acc += lut.getDouble(idx.toInt)
      m += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** `pq_adc(codes, lut, kk)`: ADC sum over packed PQ codes, codegen'd
    * (SQL-registered via `GraftExtensions`). */
  case class PqAdc(first: Expression, second: Expression, third: Expression)
      extends TernaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullSafeEval(c: Any, l: Any, k: Any): Any =
      Pq.adcKernel(c.asInstanceOf[Array[Byte]], l.asInstanceOf[ArrayData],
        k.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (c, l, k) => {
        val boxed = ctx.freshName("boxed")
        s"""
           |java.lang.Double $boxed = graft.pipeline.Pq.adcKernel($c, $l, $k);
           |${ev.isNull} = $boxed == null;
           |${ev.value} = ${ev.isNull} ? 0.0 : $boxed.doubleValue();
         """.stripMargin
      })
    override protected def withNewChildrenInternal(f: Expression, s: Expression,
        t: Expression): Expression = copy(f, s, t)
    override def prettyName: String = "pq_adc"
  }

  // ---- query shapes ------------------------------------------------------

  /** Flat PQ ADC top-k: scan ONLY the m-byte codes (no float vectors
    * anywhere in the plan), score each with the broadcast LUT, take the
    * top k (per-partition top-k + k-row driver merge, no global sort).
    * `codes` must carry `(idCol, codes)`. */
  def pqTopK(codes: DataFrame, idCol: String, codebook: DataFrame,
      query: DataFrame, embCol: String, k: Int, ds: Int): DataFrame = {
    val lut = broadcast(adcLut(codebook, query, embCol, ds))
    codes.crossJoin(lut)
      .select(col(idCol),
        adcScore(col("codes"), col("lut"), col("kk")).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Two-stage PQ retrieval — the standard coarse→refine shape: take the
    * top `r` candidates by ADC over the code scan (floats untouched),
    * then re-rank ONLY those `r` by exact cosine against their float
    * vectors and keep the top `k`. The refine read is a broadcast
    * semi-join of the r-row candidate list against the vector table —
    * at scale that table is bucketed/sorted by id, so the fetch prunes
    * to the candidates' buckets instead of scanning the corpus; the
    * expensive full-corpus stage only ever touches m-byte codes. */
  def pqTopKRerank(codes: DataFrame, idCol: String, codebook: DataFrame,
      vectors: DataFrame, query: DataFrame, embCol: String, k: Int,
      r: Int, ds: Int): DataFrame = {
    val cand = pqTopK(codes, idCol, codebook, query, embCol, r, ds)
      .select(idCol)
    val q = broadcast(query.select(col(embCol).as("__q")))
    vectors.join(broadcast(cand), Seq(idCol), "left_semi")
      .crossJoin(q)
      .select(col(idCol), Similarity.cosine(col(embCol), col("__q")).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** IVF-PQ: probe the top `nprobe` coarse buckets ([[IvfIndex]]
    * centroids, cosine-ranked like [[Similarity.ivfTopK]]), then ADC-rank
    * ONLY the probed buckets' codes. The probed scan reads m bytes per
    * vector — the faiss IVF-PQ composition (non-residual flavor: codes
    * quantize the raw vector, so flat-PQ and IVF-PQ scores agree
    * exactly and nprobe = #centroids degrades to [[pqTopK]],
    * spec-pinned). `codes` must carry `(idCol, codes, c_id)`. */
  def ivfPqTopK(codes: DataFrame, idCol: String, codebook: DataFrame,
      centroids: DataFrame, query: DataFrame, embCol: String, k: Int,
      nprobe: Int, ds: Int): DataFrame = {
    val q = broadcast(query.select(col(embCol).as("__q")))
    val probed = centroids.crossJoin(q)
      .select(col("c_id"), Similarity.cosine(col("c_emb"), col("__q")).as("__ps"))
      .orderBy(col("__ps").desc, col("c_id"))
      .limit(nprobe)
      .select("c_id")
    val lut = broadcast(adcLut(codebook, query, embCol, ds))
    codes.join(broadcast(probed), Seq("c_id"), "left_semi")
      .crossJoin(lut)
      .select(col(idCol),
        adcScore(col("codes"), col("lut"), col("kk")).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
