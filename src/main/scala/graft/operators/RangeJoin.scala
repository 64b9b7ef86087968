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

  private def binExpr(c: Column, dt: DataType, binSize: Long): Column = {
    val axis = dt match {
      case TimestampType => unix_micros(c)
      case TimestampNTZType => unix_micros(c.cast(TimestampType))
      case DateType => unix_date(c).cast("long")
      case _ => c.cast("long")
    }
    floor(axis / lit(binSize)).cast("long")
  }

  private def requireDisjoint(left: DataFrame, right: DataFrame,
      keys: Seq[String], binSize: Long): Unit = {
    require(keys.nonEmpty, "range join requires at least one equality key")
    require(binSize > 0, "binSize must be positive")
    val overlap = (left.columns.toSet -- keys)
      .intersect(right.columns.toSet -- keys)
    require(overlap.isEmpty, s"non-key columns collide: $overlap")
  }

  /** `[s, e)` intervals replicated to every bin they cover; `e <= s` is
    * empty and dropped before `sequence()` (which would otherwise step
    * backwards). */
  private def explodeBins(df: DataFrame, s: String, e: String,
      binSize: Long): DataFrame = {
    val live = df.filter(col(e) > col(s))
    live.withColumn("__bin", explode(sequence(
      binExpr(col(s), live.schema(s).dataType, binSize),
      binExpr(col(e), live.schema(e).dataType, binSize))))
  }

  /** Join `points` (at `tsCol`) into `intervals` (`[startCol, endCol)`)
    * sharing equality `keys`. Output: all point columns plus every
    * non-key interval column; returns ONE ROW PER MATCHING PAIR (a
    * point in two overlapping intervals appears twice). Column names
    * must be disjoint apart from the keys. Each pair meets in exactly
    * one bin — the point's — so no dedup is needed. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], tsCol: String, startCol: String, endCol: String,
      binSize: Long): DataFrame = {
    requireDisjoint(points, intervals, keys, binSize)
    val p = points.withColumn("__bin",
      binExpr(col(tsCol), points.schema(tsCol).dataType, binSize))
    p.join(explodeBins(intervals, startCol, endCol, binSize), keys :+ "__bin")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bin")
  }

  /** Interval-overlap join: every same-key (left, right) interval pair
    * with `lStart < rEnd && rStart < lEnd` (half-open overlap). Both
    * sides replicate to their covered bins and equi-join on (keys,
    * bin); overlapping pairs share EVERY bin of their intersection, so
    * each pair is kept only in its FIRST shared bin —
    * `max(bin(lStart), bin(rStart))` — which counts it exactly once
    * without a distinct pass. Same binning/axis rules and disjoint-name
    * requirement as [[pointInInterval]]. */
  def intervalOverlap(left: DataFrame, right: DataFrame, keys: Seq[String],
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      binSize: Long): DataFrame = {
    requireDisjoint(left, right, keys, binSize)
    val lBin = binExpr(col(lStart), left.schema(lStart).dataType, binSize)
    val rBin = binExpr(col(rStart), right.schema(rStart).dataType, binSize)
    explodeBins(left, lStart, lEnd, binSize)
      .join(explodeBins(right, rStart, rEnd, binSize), keys :+ "__bin")
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .filter(col("__bin") === greatest(lBin, rBin))
      .drop("__bin")
  }
}
