package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

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
  */
object AsOfJoin {

  /** Backward as-of join of `left` to `right` on equal `keys` and
    * `right(rightTs) <= left(leftTs)` (or `<` when `strict`). Output:
    * the full left row plus every non-key right column under
    * `rightPrefix`. The two timestamp columns must share an orderable
    * type (both timestamps, or both numeric). */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightPrefix: String = "asof_",
      strict: Boolean = false, tolerance: Option[Column] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one equality key")
    val lPayload = left.columns.toSeq.filterNot(keys.contains)
    val rPayload = right.columns.toSeq.filterNot(keys.contains)
    val lType = StructType(left.select(lPayload.map(col): _*).schema)
    val rType = StructType(right.select(rPayload.map(col): _*).schema)
    // at equal ts the window must have already passed the right row for
    // an inclusive match (right sorts first) and not yet for strict
    val leftSide = if (strict) 0 else 1
    val lPart = left.select(keys.map(col) ++ Seq(
      col(leftTs).as("__t"), lit(leftSide).as("__side"),
      struct(lPayload.map(col): _*).as("__l"),
      lit(null).cast(rType).as("__r")): _*)
    val rPart = right.select(keys.map(col) ++ Seq(
      col(rightTs).as("__t"), lit(1 - leftSide).as("__side"),
      lit(null).cast(lType).as("__l"),
      struct(rPayload.map(col): _*).as("__r")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = last(col("__r"), ignoreNulls = true).over(w)
    val masked = tolerance match {
      case Some(tol) =>
        when(matched.getField(rightTs) < col("__t") - tol,
          lit(null).cast(rType)).otherwise(matched)
      case None => matched
    }
    lPart.unionByName(rPart)
      .withColumn("__m", masked)
      .filter(col("__side") === lit(leftSide))
      .select(keys.map(col)
        ++ lPayload.map(c => col("__l").getField(c).as(c))
        ++ rPayload.map(c => col("__m").getField(c).as(rightPrefix + c)): _*)
  }
}
