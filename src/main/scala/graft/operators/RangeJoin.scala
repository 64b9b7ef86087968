package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Range joins — point-in-interval and interval-overlap — on a binned
  * time axis. Beyond-reference analytics: incident attribution,
  * ad-exposure windows, validity-period (SCD-2) joins, concurrent-spans
  * analysis.
  *
  * The naive formulation is an equi-join on the keys with range
  * predicates — Catalyst plans that as a join whose per-key work is
  * |left| × |right|, quadratic in key frequency exactly like the as-of
  * theta-join ([[AsOfJoin]]). This is the BINNED formulation: the time
  * axis is cut into fixed bins, intervals replicate to the bins they
  * cover (a bounded `sequence` + `explode`, ~interval-length / binSize
  * rows each), and the join becomes a pure equi-join on (keys, bin)
  * with an exact residual filter. Work is linear in rows + replicated
  * intervals; pick `binSize` near the typical interval length so the
  * replication factor stays ~2.
  *
  * The time axis may be TIMESTAMP / TIMESTAMP_NTZ (binned in
  * microseconds — `binSize` is then in MICROSECONDS), DATE (days), or
  * any numeric (its own units). NTZ values are binned through the
  * session-timezone instant mapping, which is monotone in UTC (the test
  * and driver default); exotic DST timezones could fold a bin edge —
  * run UTC, as Spark itself recommends for determinism.
  */
object RangeJoin {

  /** Post-clamp per-row replication cap: beyond this the binSize is
    * simply wrong for the data, and a clear error beats an executor
    * OOM. 2^20 bins ≈ 8 MiB of longs per row — loud but survivable. */
  val DefaultMaxBins: Long = 1L << 20

  /** Floor division of a long axis by a positive constant in EXACT
    * arithmetic: `axis - pmod(axis, d)` is an exact multiple of `d`
    * (pmod's remainder is non-negative, so the rounding is a true
    * floor for negatives too), and the division runs in DECIMAL so no
    * double rounding can mis-bin values past 2^53 — a raw-nanosecond
    * axis (~1.6e18) through `floor(x / y)` in doubles lands boundary
    * values in the adjacent bin. */
  private[graft] def floorDiv(axis: Column, d: Long): Column = {
    val num = axis - pmod(axis, lit(d))
    (num.cast(DecimalType(38, 0)) / lit(d).cast(DecimalType(38, 0)))
      .cast("long")
  }

  private def binExpr(c: Column, dt: DataType, binSize: Long): Column = {
    val axis = dt match {
      case TimestampType => unix_micros(c)
      case TimestampNTZType => unix_micros(c.cast(TimestampType))
      case DateType => unix_date(c).cast("long")
      case _ => c.cast("long")
    }
    floorDiv(axis, binSize)
  }

  private def requireDisjoint(left: DataFrame, right: DataFrame,
      keys: Seq[String], binSize: Long): Unit = {
    require(keys.nonEmpty, "range join requires at least one equality key")
    require(binSize > 0, "binSize must be positive")
    val overlap = (left.columns.toSet -- keys)
      .intersect(right.columns.toSet -- keys)
    require(overlap.isEmpty, s"non-key columns collide: $overlap")
  }

  /** One-row `(__obmin, __obmax)` frame: the observed bin range of the
    * columns `lo..hi` — the clamp bounds the OTHER side's replication is
    * held to. A 2-value aggregate (broadcast into the explode), so the
    * bound costs one cheap pre-pass, never a collect. */
  private def axisBounds(df: DataFrame, lo: String, hi: String,
      binSize: Long): DataFrame =
    df.agg(
      min(binExpr(col(lo), df.schema(lo).dataType, binSize)).as("__obmin"),
      max(binExpr(col(hi), df.schema(hi).dataType, binSize)).as("__obmax"))

  /** `[s, e)` intervals replicated to every bin they cover; `e <= s` is
    * empty and dropped before `sequence()` (which would otherwise step
    * backwards).
    *
    * Replication is BOUNDED two ways (the unguarded form let one
    * open-ended / SCD-2-style "valid until 9999" row generate millions
    * of bins — an input-dependent executor OOM):
    *   1. each interval's bin span is clamped to `bounds`, the other
    *      side's observed axis range — bins no partner row occupies
    *      cannot match and need not exist. Rows entirely outside the
    *      range (or an empty other side: null bounds) drop before the
    *      explode.
    *   2. what survives the clamp must still span ≤ `maxBins` bins —
    *      both sides genuinely covering that much axis means the
    *      binSize is mis-picked, and a clear plan-language error beats
    *      an OOM. */
  private def explodeBins(df: DataFrame, s: String, e: String,
      binSize: Long, bounds: DataFrame, maxBins: Long): DataFrame = {
    val live = df.filter(col(e) > col(s)).crossJoin(broadcast(bounds))
    val lo = greatest(binExpr(col(s), df.schema(s).dataType, binSize), col("__obmin"))
    val hi = least(binExpr(col(e), df.schema(e).dataType, binSize), col("__obmax"))
    live.filter(col("__obmin").isNotNull && lo <= hi)
      .withColumn("__bin", explode(sequence(
        when(hi - lo < lit(maxBins), lo).otherwise(raise_error(concat(
          lit("range join: an interval spans "), (hi - lo + 1).cast("string"),
          lit(s" bins after clamping (cap $maxBins); raise binSize toward the typical interval length")))),
        hi)))
      .drop("__obmin", "__obmax")
  }

  /** Join `points` (at `tsCol`) into `intervals` (`[startCol, endCol)`)
    * sharing equality `keys`. Output: all point columns plus every
    * non-key interval column; returns ONE ROW PER MATCHING PAIR (a
    * point in two overlapping intervals appears twice). Column names
    * must be disjoint apart from the keys. Each pair meets in exactly
    * one bin — the point's — so no dedup is needed. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], tsCol: String, startCol: String, endCol: String,
      binSize: Long, maxBins: Long = DefaultMaxBins): DataFrame = {
    requireDisjoint(points, intervals, keys, binSize)
    val p = points.withColumn("__bin",
      binExpr(col(tsCol), points.schema(tsCol).dataType, binSize))
    // intervals clamp to the points' observed bin range: every bin a
    // point occupies lies inside it, so no matching pair is lost
    val bounds = axisBounds(points, tsCol, tsCol, binSize)
    p.join(explodeBins(intervals, startCol, endCol, binSize, bounds, maxBins),
        keys :+ "__bin")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bin")
  }

  /** [[explodeBins]] specialized to the overlap join's count-once rule:
    * a pair is only ever counted at b* = max(bin(lStart), bin(rStart)),
    * which is bounded by START bins — so each side clamps its span to
    * the OTHER side's observed [min, max] START-bin range, floored at
    * the row's own start bin (a row starting past every partner start
    * keeps exactly its start bin, where any b* it participates in must
    * land). Unlike the end-based clamp, this stays bounded even when
    * BOTH sides carry open-ended SCD-2 ends: replication is capped by
    * the partner start SPREAD, never by interval length.
    *
    * `startBounds` is the SHARED one-row frame both sides cross-join
    * (r17 opt, guide §2.4 one-pass aggregation): each side picks its
    * clamp columns by name (`obMin`/`obMax`) and drops all four, so the
    * broadcast subtree stays IDENTICAL on the two sides and the planner
    * builds it once (ReusedExchange) instead of running one aggregate
    * pre-pass per side. */
  private def explodeBinsByStarts(df: DataFrame, s: String, e: String,
      binSize: Long, startBounds: DataFrame, obMin: String, obMax: String,
      maxBins: Long): DataFrame = {
    val live = df.filter(col(e) > col(s)).crossJoin(broadcast(startBounds))
    val bs = binExpr(col(s), df.schema(s).dataType, binSize)
    val lo = greatest(bs, col(obMin))
    val hi = greatest(bs,
      least(binExpr(col(e), df.schema(e).dataType, binSize), col(obMax)))
    live.filter(col(obMin).isNotNull && lo <= hi)
      .withColumn("__bin", explode(sequence(
        when(hi - lo < lit(maxBins), lo).otherwise(raise_error(concat(
          lit("range join: an interval spans "), (hi - lo + 1).cast("string"),
          lit(s" bins after clamping (cap $maxBins); raise binSize toward the typical interval length")))),
        hi)))
      .drop("__lbmin", "__lbmax", "__rbmin", "__rbmax")
  }

  /** Interval-overlap join: every same-key (left, right) interval pair
    * with `lStart < rEnd && rStart < lEnd` (half-open overlap). Both
    * sides replicate to their covered bins and equi-join on (keys,
    * bin); overlapping pairs share EVERY bin of their intersection, so
    * each pair is kept only in its FIRST shared bin —
    * `max(bin(lStart), bin(rStart))` — which counts it exactly once
    * without a distinct pass. Same binning/axis rules and disjoint-name
    * requirement as [[pointInInterval]].
    *
    * Replication bound: each side clamps to the other side's START-bin
    * range ([[explodeBinsByStarts]]). The first-shared-bin b* of any
    * overlapping pair survives both clamps: b* ≥ each side's start bin
    * and ≥ the other side's min start bin by construction; b* ≤ each
    * side's own-start-floored hi because b* is either the row's own
    * start bin or a partner start bin ≤ the partner-start max (and
    * ≤ the row's end bin, since overlap gives start < partner end). */
  def intervalOverlap(left: DataFrame, right: DataFrame, keys: Seq[String],
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      binSize: Long, maxBins: Long = DefaultMaxBins): DataFrame = {
    requireDisjoint(left, right, keys, binSize)
    val lBin = binExpr(col(lStart), left.schema(lStart).dataType, binSize)
    val rBin = binExpr(col(rStart), right.schema(rStart).dataType, binSize)
    // BOTH sides' observed start-bin ranges in ONE aggregate over a
    // tagged union (r17 opt, guide §2.4: the previous form ran one
    // axisBounds aggregate job + one broadcast build PER SIDE for four
    // scalars). min/max over the empty side stays null — exactly the
    // per-side axisBounds' empty-frame behavior the isNotNull clamp
    // filter keys on.
    val startBins = left
      .select(binExpr(col(lStart), left.schema(lStart).dataType, binSize)
        .as("__b"), lit(true).as("__isl"))
      .unionByName(right
        .select(binExpr(col(rStart), right.schema(rStart).dataType, binSize)
          .as("__b"), lit(false).as("__isl")))
    val bounds = startBins.agg(
      min(when(col("__isl"), col("__b"))).as("__lbmin"),
      max(when(col("__isl"), col("__b"))).as("__lbmax"),
      min(when(!col("__isl"), col("__b"))).as("__rbmin"),
      max(when(!col("__isl"), col("__b"))).as("__rbmax"))
    // left clamps to the RIGHT side's observed start range and vice
    // versa; both cross-join the SAME one-row frame so its broadcast
    // builds once
    explodeBinsByStarts(left, lStart, lEnd, binSize,
        bounds, "__rbmin", "__rbmax", maxBins)
      .join(explodeBinsByStarts(right, rStart, rEnd, binSize,
        bounds, "__lbmin", "__lbmax", maxBins), keys :+ "__bin")
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .filter(col("__bin") === greatest(lBin, rBin))
      .drop("__bin")
  }
}
