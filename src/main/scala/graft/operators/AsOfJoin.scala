package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DateType, StructType,
  TimestampNTZType, TimestampType}

/** As-of join — for each left row, attach the same-key right row with the
  * greatest timestamp at-or-before (backward, inclusive) the left row's
  * timestamp. Beyond-reference analytics: the staple "enrich a stream
  * against the latest earlier state" operator (price-at-trade-time,
  * attribute-events-to-last-campaign, sensor-to-last-calibration) that
  * plain SQL can only express as a correlated subquery or a windowed
  * range join, and that Spark lacks natively.
  *
  * NOT a range join: a `l.t >= r.t` theta-join explodes to all matching
  * pairs per key before a per-row argmax prunes them — quadratic in key
  * frequency. This is the sort-merge formulation instead: tag both
  * sides, union, and take `last(right_payload, ignoreNulls)` over one
  * (keys, time, side)-ordered window. Catalyst plans ONE exchange on the
  * keys and one sort — the same shape as a sort-merge join, linear in
  * partition size, and it survives 100× because the union never
  * multiplies rows. Hot keys concentrate in single window partitions
  * (windows can't split a key); at extreme skew, pre-bucket the time
  * axis per hot key and as-of join bucket-by-bucket.
  *
  * Tie semantics: equal left/right timestamps MATCH (inclusive, DuckDB
  * `ASOF JOIN ON l.t >= r.t` and pandas `merge_asof` default); pass
  * `strict = true` for exclusive (`>`). Rows on the right duplicated at
  * the same (keys, ts) make the winner order-dependent — pre-dedupe the
  * right side to one row per (keys, ts) for deterministic output.
  *
  * Unmatched left rows keep null right columns (left-outer semantics);
  * `tolerance` (an interval for timestamp columns, a number for numeric
  * time) additionally nulls matches older than `leftTs - tolerance`,
  * pandas-style.
  *
  * [[asOfBucketed]] is the extreme-skew variant: identical output,
  * but the carry window is partitioned by (keys, time-bucket) so a hot
  * key's history splits across many tasks.
  */
object AsOfJoin {

  /** Backward as-of join of `left` to `right` on equal `keys` and
    * `right(rightTs) <= left(leftTs)` (or `<` when `strict`). Output:
    * the full left row plus every non-key right column under
    * `rightPrefix`. The two timestamp columns must share an orderable
    * type (both timestamps, or both numeric). */
  private case class Tagged(lPart: DataFrame, rPart: DataFrame,
    lPayload: Seq[String], rPayload: Seq[String], rType: StructType,
    leftSide: Int)

  /** Shared tagging: both sides projected to
    * `(keys…, __t, __side, __l, __r)` so a union sorts rows of one key
    * into carry order. At equal ts the window must have already passed
    * the right row for an inclusive match (right sorts first) and not
    * yet for strict — `__side` encodes that. */
  private def tagSides(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, strict: Boolean): Tagged = {
    require(keys.nonEmpty, "as-of join requires at least one equality key")
    val lPayload = left.columns.toSeq.filterNot(keys.contains)
    val rPayload = right.columns.toSeq.filterNot(keys.contains)
    val lType = StructType(left.select(lPayload.map(col): _*).schema)
    val rType = StructType(right.select(rPayload.map(col): _*).schema)
    val leftSide = if (strict) 0 else 1
    val lPart = left.select(keys.map(col) ++ Seq(
      col(leftTs).as("__t"), lit(leftSide).as("__side"),
      struct(lPayload.map(col): _*).as("__l"),
      lit(null).cast(rType).as("__r")): _*)
    val rPart = right.select(keys.map(col) ++ Seq(
      col(rightTs).as("__t"), lit(1 - leftSide).as("__side"),
      lit(null).cast(lType).as("__l"),
      struct(rPayload.map(col): _*).as("__r")): _*)
    Tagged(lPart, rPart, lPayload, rPayload, rType, leftSide)
  }

  private def maskTolerance(matched: Column, rightTs: String,
      rType: StructType, tolerance: Option[Column]): Column =
    tolerance match {
      case Some(tol) =>
        when(matched.getField(rightTs) < col("__t") - tol,
          lit(null).cast(rType)).otherwise(matched)
      case None => matched
    }

  private def flatten(df: DataFrame, keys: Seq[String], lPayload: Seq[String],
      rPayload: Seq[String], matchCol: String, rightPrefix: String): DataFrame =
    df.select(keys.map(col)
      ++ lPayload.map(c => col("__l").getField(c).as(c))
      ++ rPayload.map(c => col(matchCol).getField(c).as(rightPrefix + c)): _*)

  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightPrefix: String = "asof_",
      strict: Boolean = false, tolerance: Option[Column] = None): DataFrame = {
    val t = tagSides(left, right, keys, leftTs, rightTs, strict)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = last(col("__r"), ignoreNulls = true).over(w)
    val out = t.lPart.unionByName(t.rPart)
      .withColumn("__m", maskTolerance(matched, rightTs, t.rType, tolerance))
      .filter(col("__side") === lit(t.leftSide))
    flatten(out, keys, t.lPayload, t.rPayload, "__m", rightPrefix)
  }

  /** Time-axis units of one bucket for [[asOfBucketed]]: microseconds
    * for timestamps, days for dates, the column's own units for
    * numerics — the same axis convention as [[RangeJoin]]. Floor
    * division in EXACT integer arithmetic ([[RangeJoin.floorDiv]]):
    * `floor(x / y)` through doubles mis-buckets near boundaries once
    * the axis exceeds 2^53 (raw-nanosecond numerics). */
  private def bucketOf(c: Column, dt: DataType, bucketSize: Long): Column = {
    val axis = dt match {
      case TimestampType => unix_micros(c)
      case TimestampNTZType => unix_micros(c.cast(TimestampType))
      case DateType => unix_date(c).cast("long")
      case _ => c.cast("long")
    }
    RangeJoin.floorDiv(axis, bucketSize)
  }

  /** [[asOf]] for EXTREME key skew: identical output, but no single
    * window partition ever holds a whole hot key's history.
    *
    * Three bounded passes replace the one per-key window:
    *   1. within-bucket: the union-window formulation partitioned by
    *      (keys, bucket) — each task sees one key-bucket, ~bucketSize
    *      of history, however hot the key;
    *   2. carry summaries: per (keys, bucket) the latest right row —
    *      ONE row per non-empty key-bucket, so the per-key stitch
    *      window that orders them runs over bucket COUNTS, not row
    *      counts (a 100M-row key across 1k buckets is a 1k-row window);
    *   3. stitch: left buckets equi-join their carry-in (the latest
    *      right row of any strictly earlier bucket — rows there are
    *      strictly older, so inclusive/strict ties never cross the
    *      seam) and the within-bucket match wins via coalesce (it is
    *      never older than a previous bucket's carry).
    *
    * Same tie, tolerance, and left-outer semantics as [[asOf]];
    * `bucketSize` is in axis units per [[bucketOf]]. Pick it near the
    * hot keys' per-bucket row target (history span / desired tasks). */
  def asOfBucketed(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, bucketSize: Long,
      rightPrefix: String = "asof_", strict: Boolean = false,
      tolerance: Option[Column] = None): DataFrame = {
    require(bucketSize > 0, "bucketSize must be positive")
    val t = tagSides(left, right, keys, leftTs, rightTs, strict)
    val lb = t.lPart.withColumn("__bk",
      bucketOf(col("__t"), left.schema(leftTs).dataType, bucketSize))
    val rb = t.rPart.withColumn("__bk",
      bucketOf(col("__t"), right.schema(rightTs).dataType, bucketSize))
    val bkeys = keys :+ "__bk"
    // ONE explicit (keys, bucket) exchange shared by pass 1's window AND
    // pass 2's bucket-summary aggregate (r17 opt, guide §2.4: the
    // previous form re-scanned the RIGHT side for a groupBy/max_by
    // summary and the LEFT side for a distinct() of needed buckets — two
    // extra input scans and two extra input-sized exchanges for
    // per-bucket facts this union shuffle already gathers). The
    // repartition is load-bearing: with only the window's implicit
    // ENSURE_REQUIREMENTS exchange, the aggregate would plan its partial
    // half BELOW its own exchange and nothing would be shared; above an
    // explicit repartition both consumers read the same shuffle output,
    // and the aggregate needs no exchange of its own.
    val u = lb.unionByName(rb).repartition(bkeys.map(col): _*)
    // 1. within-bucket carry
    val w = Window.partitionBy(bkeys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lw = u
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === lit(t.leftSide))
    // 2. latest right row per non-empty (keys, bucket), then the
    // carry-in for every LEFT bucket: the last summary of any strictly
    // earlier bucket. max_by's ordering is null for LEFT rows, so they
    // are skipped exactly like the old right-side-only aggregate (and a
    // null-ts right row still lands in the NULL bucket with a null
    // ordering — never a carry summary, same as before). The carry-in
    // window excludes the current bucket with an (…, -1) frame directly
    // — the old need/bsum union's __src-ordering trick encoded the same
    // exclusion.
    val isR = col("__side") === lit(1 - t.leftSide)
    val bstat = u
      .groupBy(bkeys.map(col): _*)
      .agg(max_by(when(isR, col("__r")), when(isR, col("__t"))).as("__bsum"),
        max(when(col("__side") === lit(t.leftSide), 1).otherwise(0)).as("__hasl"))
    val cw = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__bk").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cin = bstat
      .withColumn("__cin", last(col("__bsum"), ignoreNulls = true).over(cw))
      .filter(col("__hasl") === 1)
      .select(bkeys.map(col) :+ col("__cin"): _*)
    // 3. stitch + the shared tolerance mask and flatten. The join is
    // NULL-SAFE on every key: the window variants group null keys (and
    // the null time-bucket) into ordinary partitions, so a name-based
    // equi-join (null ≠ null) would silently drop those left rows and
    // break the identical-output contract with plain asOf
    val cinR = cin.select(
      bkeys.map(k => col(k).as(s"__c_$k")) :+ col("__cin"): _*)
    val stitched = lw.join(cinR,
        bkeys.map(k => col(k) <=> col(s"__c_$k")).reduce(_ && _))
      .withColumn("__mm", maskTolerance(coalesce(col("__m"), col("__cin")),
        rightTs, t.rType, tolerance))
    flatten(stitched, keys, t.lPayload, t.rPayload, "__mm", rightPrefix)
  }
}
