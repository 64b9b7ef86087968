package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * The brute-force cosine top-k is the correctness baseline; the
  * random-hyperplane LSH variant is the scale path: bucket on sign-bit
  * signatures, score exactly only within buckets. All vector math is
  * `zip_with`/`aggregate` higher-order expressions — sequential left-fold
  * in DOUBLE, so scores are bit-deterministic (and reproducible by any
  * engine that folds the same way), codegen-friendly, and UDF-free.
  */
object Similarity {

  /** Sequential-fold double dot product of two float-array columns.
    *
    * Implemented as the custom [[VecDot]] expression, NOT the
    * `aggregate(zip_with(...))` higher-order form: Spark HOFs are
    * CodegenFallback and evaluate interpreted — one lambda frame per
    * element — which made the fold the dominant cost of every candidate-
    * scoring stage. VecDot's generated code is the identical sequence of
    * IEEE double operations (left-to-right `acc += a(i)·b(i)`), so
    * scores stay BIT-IDENTICAL to the HOF form and to the DuckDB
    * oracles' sequential `list_sum(list_transform(...))` replay. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("vec_dot", a, b)

  /** JVM kernel shared by VecDot's interpreted and generated paths.
    * Null on length mismatch or any null element — the same outcomes the
    * HOF form produced (zip_with pads with null, and a null element nulls
    * the whole fold; ArrayData.getFloat on a null slot would instead read
    * garbage bits as a plausible 0.0f). */
  def dotArrays(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** [[dotArrays]] over `array<double>` inputs (the residual-PQ path,
    * where residuals are exact double differences): same left-to-right
    * fold, same null semantics. */
  def dotArraysD(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** `vec_dot(a, b)`: sequential-fold dot of two `array<float>` (or two
    * `array<double>`) columns, codegen'd (SQL-registered via
    * `GraftExtensions`) — the element type is dispatched once from the
    * input schema, not per row. */
  case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    // mixed float/double inputs must fail ANALYSIS: the kernel is picked
    // from the schema once, and running the float kernel over
    // double-backed array data would read garbage bits, not throw
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      import org.apache.spark.sql.types.{ArrayType, FloatType}
      (left.dataType, right.dataType) match {
        case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          "vec_dot requires two array<float> or two array<double> arguments, " +
            s"got ${l.catalogString} and ${r.catalogString}")
      }
    }
    private lazy val isDouble = left.dataType match {
      case org.apache.spark.sql.types.ArrayType(DoubleType, _) => true
      case _ => false
    }
    private def kernel = if (isDouble) "dotArraysD" else "dotArrays"
    override def nullSafeEval(a: Any, b: Any): Any =
      if (isDouble)
        Similarity.dotArraysD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      else
        Similarity.dotArrays(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val boxed = ctx.freshName("boxed")
        s"""
           |java.lang.Double $boxed = graft.pipeline.Similarity.$kernel($a, $b);
           |${ev.isNull} = $boxed == null;
           |${ev.value} = ${ev.isNull} ? 0.0 : $boxed.doubleValue();
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
    override def prettyName: String = "vec_dot"
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Literal vector column from a driver-side query vector. */
  def vec(values: Seq[Float]): Column = array(values.map(lit(_)): _*)

  /** Brute-force top-k by cosine against one query vector: per-partition
    * top-k then a k-row driver merge (TakeOrderedAndProject) — no global
    * sort ever materializes. */
  def bruteForceTopK(emb: DataFrame, embCol: String, idCol: String,
      query: Column, k: Int): DataFrame =
    emb.select(col(idCol), cosine(col(embCol), query).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)

  /** Exact nearest neighbor for each probe row, computed block-wise:
    * probes × corpus. Probes must be a bounded slice (the all-pairs
    * product is per-probe, not corpus²).
    *
    * k = 1 aggregates with `max(struct(score, -id))` instead of a window:
    * the aggregate partial-applies MAP-SIDE, so one candidate per (probe,
    * partition) reaches the shuffle — the window variant shuffles every
    * scored (probe × corpus) row to sort it. Same tie-break as the window
    * ordering (score desc, then lowest neighbor id, via the negated id in
    * the sort key); identical output, ~|corpus| less shuffle volume. */
  def nearestNeighbors(probes: DataFrame, corpus: DataFrame, embCol: String,
      idCol: String, k: Int = 1): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), col(embCol).as("p_emb"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(embCol).as("c_emb"))
    val scored = p.crossJoin(c)
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        cosine(col("p_emb"), col("c_emb")).as("score"))
    if (k == 1)
      scored.groupBy(col("probe_id"))
        .agg(max(struct(col("score"), (-col("neighbor_id")).as("__negid"))).as("__top"))
        .select(col("probe_id"), (-col("__top.__negid")).as("neighbor_id"),
          col("__top.score").as("score"))
    else {
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("score").desc, col("neighbor_id"))
      scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k).drop("__rn")
    }
  }

  /** Deterministic random hyperplanes (seeded driver-side) as literal
    * arrays — `numPlanes` planes of dimension `dim`. */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Float]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(numPlanes)(Seq.fill(dim)((rng.nextDouble() * 2 - 1).toFloat))
  }

  /** Sign-bit LSH bucket id: bit p = (v · r_p) >= 0, packed into a long.
    * Vectors with equal buckets are near-collinear candidates.
    * (The fold-based dot is deliberate: unrolling 64-dim × N-plane literal
    * dot products into flat arithmetic was measured 5–30× SLOWER — the
    * generated code blows past JIT/codegen method limits and the whole
    * projection falls back to interpretation.) */
  def lshBucket(emb: Column, planes: Seq[Seq[Float]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(emb, vec(p)) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** ANN top-k via hyperplane LSH with multi-probe by bucket OR-ing over
    * `tables` independent plane sets: exact cosine only within matching
    * buckets. Recall grows with `tables`; cost stays |bucket| per probe. */
  def lshTopK(emb: DataFrame, embCol: String, idCol: String,
      query: Seq[Float], k: Int, planesPerTable: Int = 8,
      tables: Int = 4, seed: Long = 42L): DataFrame = {
    val dim = query.length
    val tablePlanes = (0 until tables).map(t => hyperplanes(planesPerTable, dim, seed + t))
    val qCol = vec(query)
    // Candidate = matches the query's bucket in ANY table.
    val qBuckets = tablePlanes.map(p => lshBucket(qCol, p))
    val vBuckets = tablePlanes.map(p => lshBucket(col(embCol), p))
    val candidate = vBuckets.zip(qBuckets).map { case (vb, qb) => vb === qb }.reduce(_ || _)
    emb.filter(candidate)
      .select(col(idCol), cosine(col(embCol), qCol).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Candidate predicate over PERSISTED signatures: a vector is a
    * candidate iff its bucket equals the query's in ANY table (positional
    * — a table-`i` bucket never matches a table-`j` one). Unrolled over
    * the compile-time-constant table count into plain `getItem`/`===`/`OR`
    * nodes so the per-corpus-row filter stays inside whole-stage codegen —
    * the `exists(zip_with(...))` HOF form evaluates interpreted, per-row,
    * exactly the cost the persisted index exists to avoid. */
  def sigMatches(sig: Column, qsig: Column, tables: Int): Column =
    (0 until tables).map(t => sig.getItem(t) === qsig.getItem(t)).reduce(_ || _)

  /** [[lshTopK]] over a [[LshIndex]] frame `(idCol, embCol, nrm, sig)`:
    * the corpus-side signature and norm computation (tables × planes
    * interpreted fold dots PER ROW) moves to ingest; the query keeps one
    * tiny 1-row signature derivation and one exact dot per candidate.
    * Bit-identical to the on-the-fly path: same planes, same folds. */
  def lshTopKIndexed(indexed: DataFrame, embCol: String, idCol: String,
      query: DataFrame, k: Int, planesPerTable: Int, tables: Int,
      dim: Int = 64, seed: Long = 42L): DataFrame = {
    val tablePlanes = (0 until tables).map(t => hyperplanes(planesPerTable, dim, seed + t))
    val q = broadcast(query.select(col(embCol).as("__q"))
      .withColumn("__qsig",
        array(tablePlanes.map(p => lshBucket(col("__q"), p)): _*))
      .withColumn("__qn", norm(col("__q"))))
    indexed.crossJoin(q)
      .filter(sigMatches(col("sig"), col("__qsig"), tables))
      .select(col(idCol),
        (dot(col(embCol), col("__q")) / (col("nrm") * col("__qn"))).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** [[embeddingNearDupPairs]] over a [[LshIndex]] frame: candidates come
    * from exploding the persisted signatures (one shuffle on (table,
    * bucket), identical candidate set), and scoring reuses the persisted
    * norms — the per-query work is ONE dot per deduped candidate pair.
    *
    * With a FIXED plane count the bucket count is constant, so the
    * within-bucket self-join's candidate pairs grow ~n²/buckets once the
    * corpus dwarfs the 2^planes buckets per table — quadratic at scale
    * (measured 19.9× wall for 10× rows in the sf1→sf10 decade). The
    * guard is the same move [[semDeDup]]'s `maxClusterSize` makes for
    * mega-clusters: rows in a (table, bucket) whose population exceeds
    * `maxBucketSize` additionally carry a sub-bucket id — a seeded
    * 16-plane secondary sign signature mod `ceil(size / cap)` — and
    * pairs form only within (table, bucket, sub-bucket). Per-key pair
    * work is then bounded at ~cap² whatever the corpus size, so total
    * candidate volume grows LINEARLY with n. Exact duplicates share
    * every sign bit of every signature, so the guard can never split
    * them; near-duplicates straddling a sub-bucket boundary in ALL
    * tables are missed — the standard LSH recall trade, taken only
    * where the exact path would be quadratic (recall floor pinned in
    * SimilaritySpec). Default None = the historical exact-within-bucket
    * behavior. */
  def embeddingNearDupPairsIndexed(indexed: DataFrame, embCol: String,
      idCol: String, minCosine: Double,
      maxBucketSize: Option[Long] = None, dim: Int = 64,
      subSeed: Long = 7L): DataFrame = {
    // secondary signature per SOURCE row (before the per-table explode):
    // 16 codegen'd dots per corpus row, linear — the price of bounding a
    // quadratic. A dim mismatch nulls every plane dot, which lshBucket's
    // sign fold silently maps to signature 0 — one sub-bucket, i.e. the
    // quadratic blow-up the guard exists to prevent; probe one dot and
    // fail loudly instead (the semDeDup guard's convention).
    val withSub = maxBucketSize match {
      case None => indexed.withColumn("__s2", lit(0L))
      case Some(cap) =>
        require(cap > 0, "maxBucketSize must be positive")
        val planes = hyperplanes(16, dim, subSeed)
        val probeDot = dot(col(embCol), vec(planes.head))
        indexed.withColumn("__s2",
          when(probeDot.isNotNull, lshBucket(col(embCol), planes))
            .otherwise(raise_error(lit(
              s"embeddingNearDupPairsIndexed maxBucketSize guard: null " +
                s"embedding signature — does dim=$dim match the embedding " +
                s"dimension?")).cast("long")))
    }
    val sigRows = withSub
      .select(col(idCol).as("__id"), col("__s2"),
        posexplode(col("sig")).as(Seq("__t", "__bkt")))
    val exploded = maxBucketSize match {
      case None =>
        sigRows.select(col("__id"), struct(col("__t"), col("__bkt")).as("__b"))
      case Some(cap) =>
        // bucket populations: ≤ tables × 2^planes rows of counts —
        // broadcast, so sizing adds no shuffle to the corpus side
        val sizes = sigRows.groupBy("__t", "__bkt")
          .agg(count(lit(1)).as("__bsz"))
        sigRows.join(broadcast(sizes), Seq("__t", "__bkt"))
          .select(col("__id"), struct(col("__t"), col("__bkt"),
            when(col("__bsz") <= cap, lit(0L))
              .otherwise(pmod(col("__s2"),
                ceil(col("__bsz").cast("double") / cap).cast("long")))
              .as("__sub")).as("__b"))
    }
    val cands = exploded.select(col("__id").as("a_id"), col("__b"))
      .join(exploded.select(col("__id").as("b_id"), col("__b")), Seq("__b"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    val normed = indexed.select(col(idCol).as("__nid"),
      col(embCol).as("__nemb"), col("nrm").as("__n"))
    cands
      .join(normed.select(col("__nid").as("a_id"), col("__nemb").as("a_emb"),
        col("__n").as("a_n")), Seq("a_id"))
      .join(normed.select(col("__nid").as("b_id"), col("__nemb").as("b_emb"),
        col("__n").as("b_n")), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        (dot(col("a_emb"), col("b_emb")) / (col("a_n") * col("b_n"))).as("score"))
      .filter(col("score") >= minCosine)
  }

  /** IVF coarse assignment: each vector → its nearest centroid id. This
    * is the ingest-time artifact of the IVF index — persist it once
    * (bucketed by `c_id`, see [[IvfIndex]]); queries then touch only
    * probed buckets. Centroids are any small (c_id, c_emb) frame — a
    * deterministic sample works as the k-means-lite quantizer.
    *
    * Norms are staged as attributes so the per-(vector, centroid) work is
    * ONE interpreted fold (the dot), not three — `cosine` inline would
    * recompute both norms per pair ([[Dedup]] scaladoc on HOF costs). The
    * quotient is bit-identical to inline `cosine`: same folds, same
    * inputs, just cached. */
  def ivfAssign(emb: DataFrame, embCol: String, idCol: String,
      centroids: DataFrame): DataFrame = {
    val e = emb.select(col(idCol), col(embCol))
      .withColumn("__en", norm(col(embCol)))
    val c = centroids.withColumn("__cn", norm(col("c_emb")))
    val scored = e.crossJoin(broadcast(c))
      .select(col(idCol), col(embCol), col("c_id"),
        (dot(col(embCol), col("c_emb")) / (col("__en") * col("__cn"))).as("__cs"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("__cs").desc, col("c_id"))
    scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col(idCol), col(embCol), col("c_id"))
  }

  /** IVF search: rank centroids against the query, exact-score only the
    * vectors assigned to the top `nprobe` buckets. The probed fraction
    * (nprobe / #centroids) bounds the scan regardless of corpus size.
    * The query arrives as a 1-row (embCol) DataFrame and is broadcast —
    * no driver-side `.collect()` anywhere in the plan. */
  def ivfTopK(assigned: DataFrame, embCol: String, idCol: String,
      centroids: DataFrame, query: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val q = broadcast(query.select(col(embCol).as("__q")))
    val probed = centroids.crossJoin(q)
      .select(col("c_id"), cosine(col("c_emb"), col("__q")).as("__qs"))
      .orderBy(col("__qs").desc, col("c_id"))
      .limit(nprobe)
      .select("c_id")
    assigned.join(broadcast(probed), Seq("c_id"), "left_semi")
      .crossJoin(q)
      .select(col(idCol), cosine(col(embCol), col("__q")).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Batched [[ivfTopK]]: top-k for EVERY probe row in one plan — the
    * shape of an evaluation harness or a bulk retrieval job. Probe ×
    * centroid ranking stays tiny (probes × k-row codebook, both
    * broadcastable); the candidate scan joins `assigned` once against
    * the broadcast (probe, bucket) pairs, so each probed bucket is read
    * once per probe that wants it and the per-probe ranking window spans
    * only that probe's ~nprobe·(N/centroids) candidates — never the
    * corpus. Self-matches (probe id = candidate id) are excluded, the
    * [[nearestNeighbors]] convention.
    *
    * SIZE BOUND: the broadcast side is probes × nprobe rows, each
    * carrying the probe embedding — fine for an evaluation batch
    * (10²–10⁴ probes), NOT for probe sets that rival the corpus. Past
    * ~10⁵ probes (or when probes×nprobe×dim×4 B nears
    * `spark.sql.autoBroadcastJoinThreshold`) pass
    * `broadcastProbes = false`: the candidate join then shuffles both
    * sides on `c_id` — the right plan when neither side is small. */
  def ivfTopKBatch(assigned: DataFrame, embCol: String, idCol: String,
      centroids: DataFrame, probes: DataFrame, k: Int, nprobe: Int,
      broadcastProbes: Boolean = true): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), col(embCol).as("__q"))
    val wp = Window.partitionBy(col("probe_id"))
      .orderBy(col("__qs").desc, col("c_id"))
    val probed = p.crossJoin(broadcast(centroids))
      .select(col("probe_id"), col("__q"), col("c_id"),
        cosine(col("c_emb"), col("__q")).as("__qs"))
      .withColumn("__rn", row_number().over(wp)).filter(col("__rn") <= nprobe)
      .select(col("probe_id"), col("__q"), col("c_id"))
    val probedSide = if (broadcastProbes) broadcast(probed) else probed
    val cand = assigned.join(probedSide, Seq("c_id"))
      .filter(col(idCol) =!= col("probe_id"))
      .select(col("probe_id"), col(idCol),
        cosine(col(embCol), col("__q")).as("score"))
    val wk = Window.partitionBy(col("probe_id"))
      .orderBy(col("score").desc, col(idCol))
    cand.withColumn("__rn", row_number().over(wk)).filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** IVF-SQ8 — the faiss IVF+ScalarQuantizer composition: probe the top
    * `nprobe` centroid buckets exactly like [[ivfTopK]], but rank the
    * bucket members by the QUANTIZED integer dot against the quantized
    * query ([[Quantize]]). This form quantizes the probed candidates
    * in-plan — the bounded-fixture convenience shape; the scale path is
    * [[ivfQuantizedTopKIndexed]] over the persisted [[SqIndex.ensureIvf]]
    * codes. With `nprobe` ≥ the centroid count this degrades exactly to
    * brute-force quantized search (spec-pinned). Scores are
    * scale_q·scale_v·⟨codes⟩ — exact integer dots under pure IEEE
    * products, oracle-replayable. */
  def ivfQuantizedTopK(assigned: DataFrame, embCol: String, idCol: String,
      centroids: DataFrame, query: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val qz = quantizedQuery(query, embCol)
    val candidates = Quantize.withQuantizedPacked(
      assigned.join(broadcast(probeBuckets(centroids, qz, nprobe)),
        Seq("c_id"), "left_semi")
        .select(col(idCol), col(embCol)),
      embCol, codesCol = "codes", scaleCol = "scale")
    rankQuantized(candidates, idCol, qz, k)
  }

  /** [[ivfQuantizedTopK]] over the persisted [[SqIndex.ensureIvf]] frame
    * `(idCol, codes, scale, c_id)`: the probed scan reads ONLY int8
    * codes — 4× less bandwidth than float32, the point of SQ8 — and the
    * corpus-side quantization never runs at query time. Bit-identical to
    * the in-plan form: same codes (pure function of the float vector),
    * same integer dot, same IEEE score products. */
  def ivfQuantizedTopKIndexed(quantized: DataFrame, embCol: String,
      idCol: String, centroids: DataFrame, query: DataFrame, k: Int,
      nprobe: Int): DataFrame = {
    val qz = quantizedQuery(query, embCol)
    rankQuantized(
      quantized.join(broadcast(probeBuckets(centroids, qz, nprobe)),
        Seq("c_id"), "left_semi"),
      idCol, qz, k)
  }

  /** The 1-row query, broadcast ONCE carrying the raw vector AND its
    * packed codes + scale: the centroid probe reads `__q`, the scoring
    * pass reads `__qc`/`__qs`, and both cross joins reference the same
    * exchange — so the broadcast materializes once per query, exactly
    * like the float path's reused query broadcast, instead of paying a
    * second materialization job for the quantized form. */
  private def quantizedQuery(query: DataFrame, embCol: String): DataFrame =
    broadcast(
      Quantize.withQuantizedPacked(query.select(col(embCol).as("__q")), "__q")
        .select(col("__q"), col("codes").as("__qc"), col("scale").as("__qs")))

  /** Centroid probe for the quantized IVF paths: rank centroids against
    * the (broadcast, 1-row) [[quantizedQuery]] frame's raw vector, keep
    * the top `nprobe` bucket ids. */
  private def probeBuckets(centroids: DataFrame, qz: DataFrame,
      nprobe: Int): DataFrame =
    centroids.crossJoin(qz)
      .select(col("c_id"), cosine(col("c_emb"), col("__q")).as("__ps"))
      .orderBy(col("__ps").desc, col("c_id"))
      .limit(nprobe)
      .select("c_id")

  /** Quantized ranking core: integer-dot the [[quantizedQuery]] codes
    * against each candidate's stored packed codes ([[Quantize.packedDot]]
    * — the codegen'd vec_dot_int8 over binary byte codes), score, top-k.
    * `candidates` must carry (idCol, codes: binary, scale). */
  private def rankQuantized(candidates: DataFrame, idCol: String,
      qz: DataFrame, k: Int): DataFrame =
    candidates
      .select(col(idCol), col("codes"), col("scale"))
      .crossJoin(qz)
      .select(col(idCol), col("scale"), col("__qs"),
        Quantize.packedDot(col("codes"), col("__qc")).as("int_dot"))
      .select(col(idCol), col("int_dot"),
        Quantize.quantizedScore(col("__qs"), col("scale"), col("int_dot")).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)

  /** Embedding near-duplicate pairs at `minCosine`, LSH-bucketed so the
    * exact scoring never sees the all-pairs product. Candidate (a, b)
    * pairs are deduped BEFORE scoring — a pair colliding in several
    * tables costs one cosine, not one per collision — and vector norms
    * are staged once per side so the per-pair work is a single dot. */
  def embeddingNearDupPairs(emb: DataFrame, embCol: String, idCol: String,
      minCosine: Double, planesPerTable: Int = 6, tables: Int = 3,
      dim: Int = 64, seed: Long = 42L): DataFrame = {
    val tablePlanes = (0 until tables).map(t => hyperplanes(planesPerTable, dim, seed + t))
    val withBuckets = emb.select(col(idCol).as("__id"),
      array(tablePlanes.zipWithIndex.map { case (p, t) =>
        struct(lit(t).as("t"), lshBucket(col(embCol), p).as("bkt"))
      }: _*).as("__bkts"))
    val exploded = withBuckets.select(col("__id"), explode(col("__bkts")).as("__b"))
    val cands = exploded.select(col("__id").as("a_id"), col("__b"))
      .join(exploded.select(col("__id").as("b_id"), col("__b")), Seq("__b"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    val normed = emb.select(col(idCol).as("__nid"), col(embCol).as("__nemb"),
      norm(col(embCol)).as("__n"))
    cands
      .join(normed.select(col("__nid").as("a_id"), col("__nemb").as("a_emb"),
        col("__n").as("a_n")), Seq("a_id"))
      .join(normed.select(col("__nid").as("b_id"), col("__nemb").as("b_emb"),
        col("__n").as("b_n")), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        (dot(col("a_emb"), col("b_emb")) / (col("a_n") * col("b_n"))).as("score"))
      .filter(col("score") >= minCosine)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup via
    * embedding clustering. All-pairs cosine over a corpus is quadratic;
    * the paper's move is to cluster first (here: the SAME persisted IVF
    * coarse assignment the ANN queries probe — [[IvfIndex.ensure]]) and
    * compare pairs only WITHIN clusters, bounding the join by the sum of
    * squared cluster sizes. Pairs above `eps` are grouped transitively
    * ([[Components.nearDupClusters]] — "A≈B, B≈C" is one group), and each
    * group elects ONE keeper: the member LEAST similar to its cluster
    * centroid (the paper keeps the "edge" example of a semantic
    * neighborhood — it carries the most marginal training signal), ties
    * broken by id.
    *
    * Returns every corpus row as (idCol, rep_id, cent_cos, kept 0/1) —
    * singletons are their own group with kept = 1, so downstream `WHERE
    * kept = 1` is the deduplicated corpus.
    *
    * Scale shape: one `c_id`-key shuffle for the within-cluster self-join
    * (never corpus × corpus), the O(log diameter) bounded component
    * rounds on the pair graph (≪ corpus), and one min-struct window for
    * keeper election — the election shuffles only (id, rep, cos)
    * triples, never embeddings, and a window (vs aggregate + join-back)
    * keeps the corpus-scanning subtree instantiated once. The centroid
    * join is an explicitly-broadcast k-row codebook, same as the IVF
    * probe.
    *
    * Pair cost is Σ cluster², so ONE mega-cluster (a dense region the
    * coarse quantizer lumps together) inherits the quadratic blow-up —
    * the paper has the same property. `maxClusterSize` is the guard:
    * clusters above the cap are sub-bucketed by a seeded sign-bit
    * signature of the embedding ([[lshBucket]] — the secondary hash) into
    * `ceil(size / cap)` sub-buckets, and pairs form only within
    * (cluster, sub-bucket). Exact duplicates always share every sign bit,
    * so they can never be split; near-duplicates straddling a sub-bucket
    * boundary are missed — the standard LSH-style recall trade, taken
    * only where the exact path would be quadratic. Default None = the
    * paper's exact within-cluster behavior.
    */
  def semDeDup(assigned: DataFrame, centroids: DataFrame, embCol: String,
      idCol: String, eps: Double,
      checkpointDir: Option[String] = None,
      maxClusterSize: Option[Long] = None, dim: Int = 64,
      subSeed: Long = 7L): DataFrame = {
    require(idCol != "rep_id", "idCol \"rep_id\" collides with the output label column")
    val c = broadcast(centroids
      .select(col("c_id"), col("c_emb"), norm(col("c_emb")).as("__cn")))
    // the self-join sides need no centroid columns — pair them off the
    // cheaper pre-centroid-join projection (a self-join's two corpus
    // scans are structural; the centroid join shouldn't multiply them)
    val base = assigned
      .select(col(idCol), col(embCol), col("c_id"), norm(col(embCol)).as("__n"))
    // mega-cluster guard: rows in oversized clusters additionally carry a
    // sub-bucket id; the pair join keys on it, capping per-task pair work
    // at ~cap² however skewed the coarse assignment is
    val (paired, pairKeys) = maxClusterSize match {
      case None => (base.withColumn("__sub", lit(0L)), Seq("c_id"))
      case Some(cap) =>
        require(cap > 0, "maxClusterSize must be positive")
        // explicit broadcast: the size frame is bounded by the CENTROID
        // count at any corpus scale, and a stats misestimate falling back
        // to a shuffle here would re-shuffle the whole corpus projection
        val sizes = broadcast(base.groupBy("c_id").agg(count(lit(1)).as("__csz")))
        val planes = hyperplanes(16, dim, subSeed)
        val sig = lshBucket(col(embCol), planes)
        // a dim mismatch nulls every plane dot, which lshBucket's sign
        // fold silently maps to signature 0 — the guard would then put
        // the whole mega-cluster in ONE sub-bucket and quietly return
        // the quadratic blow-up it exists to prevent. Probe one dot and
        // fail loudly instead.
        val probeDot = dot(col(embCol), vec(planes.head))
        (base.join(sizes, "c_id").withColumn("__sub",
          when(col("__csz") <= cap, lit(0L))
            .otherwise(when(probeDot.isNotNull,
              pmod(sig, ceil(col("__csz").cast("double") / cap).cast("long")))
              .otherwise(raise_error(lit(
                s"semDeDup maxClusterSize guard: null embedding signature — " +
                  s"does dim=$dim match the embedding dimension?")).cast("long"))))
          .drop("__csz"), Seq("c_id", "__sub"))
    }
    val a = paired.select((pairKeys.map(col) :+ col(idCol).as("a_id")
      :+ col(embCol).as("__ae") :+ col("__n").as("__an")): _*)
    val b = paired.select((pairKeys.map(col) :+ col(idCol).as("b_id")
      :+ col(embCol).as("__be") :+ col("__n").as("__bn")): _*)
    val pairs = a.join(b, pairKeys)
      .filter(col("a_id") < col("b_id"))
      .filter((dot(col("__ae"), col("__be")) / (col("__an") * col("__bn")))
        > lit(eps))
      .select("a_id", "b_id")
    // alias the label columns so idCol = "doc_id" / "rep_id"-adjacent
    // corpora can't collide with nearDupClusters' fixed output names
    val labels = Components.nearDupClusters(pairs, checkpointDir = checkpointDir)
      .select(col("doc_id").as("__lid"), col("rep_id").as("__lrep"))
    val full = base.join(c, "c_id")
      .select(col(idCol),
        (dot(col(embCol), col("c_emb")) / (col("__n") * col("__cn")))
          .as("cent_cos"))
      .join(labels, col(idCol) === col("__lid"), "left")
      .select(col(idCol), coalesce(col("__lrep"), col(idCol)).as("rep_id"),
        col("cent_cos"))
    // keeper election as ONE window pass over (id, rep, cos) triples —
    // an aggregate + join-back would instantiate `full` (and its corpus
    // scan) twice; min-struct ordering (cent_cos first, id tiebreak) is
    // identical either way
    val keep = min(struct(col("cent_cos"), col(idCol)))
      .over(Window.partitionBy(col("rep_id")))
    full
      .select(col(idCol), col("rep_id"), col("cent_cos"),
        (col(idCol) === keep.getField(idCol)).cast("long").as("kept"))
  }
}
