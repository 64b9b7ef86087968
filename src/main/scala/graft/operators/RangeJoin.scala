package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Range (point-in-interval) join — every (point, interval) pair where
  * the point's timestamp falls in the same-key interval `[start, end)`.
  * Beyond-reference analytics: incident attribution, ad-exposure
  * windows, validity-period (SCD-2) joins.
  *
  * The naive formulation is an equi-join on the keys with two range
  * predicates — Catalyst plans that as a join whose per-key work is
  * |points| × |intervals|, quadratic in key frequency exactly like the
  * as-of theta-join ([[AsOfJoin]]). This is the BINNED formulation: the
  * time axis is cut into fixed bins, each interval is replicated to the
  * bins it covers (a bounded `sequence` + `explode`, ~interval-length /
  * binSize rows), points carry their single bin, and the join becomes a
  * pure equi-join on (keys, bin) with an exact residual filter. Each
  * (point, interval) pair meets in exactly one bin — the point's — so
  * no dedup is needed. Work is linear in points + replicated intervals;
  * pick `binSize` near the typical interval length so the replication
  * factor stays ~2.
  *
  * The time axis may be TIMESTAMP / TIMESTAMP_NTZ (binned in
  * microseconds — `binSize` is then in MICROSECONDS), DATE (days), or
  * any numeric (its own units). NTZ values are binned through the
  * session-timezone instant mapping, which is monotone in UTC (the test
  * and driver default); exotic DST timezones could fold a bin edge —
  * run UTC, as Spark itself recommends for determinism.
  */
object RangeJoin {

  /** Join `points` (at `tsCol`) into `intervals` (`[startCol, endCol)`)
    * sharing equality `keys`. Output: all point columns plus every
    * non-key interval column; returns ONE ROW PER MATCHING PAIR (a
    * point in two overlapping intervals appears twice). Column names
    * must be disjoint apart from the keys. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], tsCol: String, startCol: String, endCol: String,
      binSize: Long): DataFrame = {
    require(keys.nonEmpty, "range join requires at least one equality key")
    require(binSize > 0, "binSize must be positive")
    val overlap = (points.columns.toSet -- keys)
      .intersect(intervals.columns.toSet -- keys)
    require(overlap.isEmpty, s"non-key columns collide: $overlap")
    def bin(df: DataFrame, c: String): Column = {
      val axis = df.schema(c).dataType match {
        case TimestampType => unix_micros(col(c))
        case TimestampNTZType => unix_micros(col(c).cast(TimestampType))
        case DateType => unix_date(col(c)).cast("long")
        case _ => col(c).cast("long")
      }
      floor(axis / lit(binSize)).cast("long")
    }
    val p = points.withColumn("__bin", bin(points, tsCol))
    // [s, e) with e <= s is empty — drop before sequence() (which would
    // otherwise step backwards) and spare the join the dead rows
    val live = intervals.filter(col(endCol) > col(startCol))
    val iv = live.withColumn("__bin",
      explode(sequence(bin(live, startCol), bin(live, endCol))))
    p.join(iv, keys :+ "__bin")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bin")
  }
}
