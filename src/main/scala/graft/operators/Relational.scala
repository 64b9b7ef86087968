package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's historical-query surface (SURVEY §2.2–§2.6) re-expressed
  * as composable Spark operators.
  *
  * The reference (denniswon/evm-indexer) delegates every historical query to
  * PostgreSQL through 24 GORM functions in `app/db/query.go`; each is a
  * filter / equi-join / sort / limit / global-aggregate arrangement. Here
  * each shape is a declarative DataFrame transformation, so Catalyst gets
  * the whole plan: predicate pushdown to the parquet scan, column pruning,
  * broadcast-hash joins for the pruned dimension side, and AQE at runtime.
  *
  * Scale notes (100 TB / 1000 executors):
  *   - Point lookups (Q1/Q2/Q6: `app/db/query.go:79-100,194-202`) become
  *     scan + pushed filter. On a real deployment the fact tables are
  *     written partitioned/z-ordered by key so these prune to O(1) files;
  *     the operators themselves stay unchanged.
  *   - Ranged fact⋈dim joins (J1–J8: `app/db/query.go:206-441`) broadcast
  *     the *pruned* dimension side — the reference caps interactive ranges
  *     at ~100 keys (`app/common/common.go:66-84`), so after pushdown the
  *     build side is tiny regardless of total data size. We hint
  *     `broadcast()` explicitly and let AQE re-derive it when stats say
  *     otherwise.
  *   - Global aggregates (A1–A6: `app/db/query.go:33-74,139-177`) are
  *     partial-aggregated map-side by Spark automatically; no shuffle of raw
  *     rows ever happens for min/max/count.
  */
object Relational {

  /** Q1/Q2/Q6/Q11: point lookup by (composite) equality predicate with the
    * reference's `First`/LIMIT-1 semantics (at most one row returned).
    * Reference: `app/db/query.go:82,95,197,404,594` — every point lookup
    * uses GORM `.First`. */
  def pointLookup(df: DataFrame, pred: Column): DataFrame =
    df.filter(pred).limit(1)

  /** Q8/Q9/Q10-shape: equality-filtered row-set scan (no LIMIT — the
    * reference returns the full set, e.g. `GetTransactionsByBlockHash`
    * `app/db/query.go:153-163`). */
  def filterScan(df: DataFrame, pred: Column): DataFrame =
    df.filter(pred)

  /** Q3/Q5: closed key-range scan, sorted ascending.
    * Reference: `app/db/query.go:109-119` (+ projection variant `:15-29`). */
  def keyRangeScan(df: DataFrame, key: Column, lo: Any, hi: Any): DataFrame =
    df.filter(key.between(lo, hi)).orderBy(key)

  /** Q4: closed time-range scan, sorted by key ascending.
    * Reference: `app/db/query.go:125-135`. */
  def timeRangeScan(df: DataFrame, time: Column, lo: Any, hi: Any, sortKey: Column): DataFrame =
    df.filter(time.between(lo, hi)).orderBy(sortKey)

  /** J1–J8: fact ⋈ dim equi-join with a predicate on the fact side and a
    * range predicate on the dim side. The dim side is broadcast: after
    * Catalyst pushes `dimPred` into the dim scan it is at most a few
    * hundred rows (the reference enforces this with `RangeChecker`,
    * `app/common/common.go:66-84`), so the join is shuffle-free no matter
    * how large the fact table is.
    * Reference: `app/db/query.go:206-441`. */
  def factJoinDim(
      fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      factPred: Column, dimPred: Column): DataFrame =
    fact.filter(factPred)
      .join(broadcast(dim.filter(dimPred)), fact(factKey) === dim(dimKey))

  /** [[factJoinDim]] without the broadcast hint, for callers whose dim
    * predicate does NOT bound the dim side to a few hundred rows (e.g.
    * T2's `number >= 0` = the whole blocks table). A forced broadcast of
    * an unbounded dim is a driver/executor OOM at the reference's 10M-row
    * steady state — here AQE picks broadcast only when the runtime size
    * actually clears `spark.sql.autoBroadcastJoinThreshold`, and the
    * equality-filtered FACT side is just as often the broadcastable one. */
  def factJoinDimUnbounded(
      fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      factPred: Column, dimPred: Column): DataFrame =
    fact.filter(factPred)
      .join(dim.filter(dimPred), fact(factKey) === dim(dimKey))

  /** J9: scalar-subquery semi-join — fact rows whose key appears in a
    * filtered dim set. Reference: `app/db/query.go:167-191`. */
  def semiJoin(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      dimPred: Column): DataFrame =
    // left_semi already dedups the build side — an explicit .distinct()
    // would add a full extra shuffle+aggregate at scale for nothing.
    fact.join(
      broadcast(dim.filter(dimPred).select(col(dimKey).as(factKey))),
      Seq(factKey), "left_semi")

  /** J10: anti-join ("which candidates are missing"), the reference's gap
    * detector. Reference: `app/block/syncer.go:21-37` does a per-candidate
    * binary search; here it is one distributed anti-join.  */
  def antiJoin(candidates: DataFrame, present: DataFrame, key: String): DataFrame =
    // No .distinct() on the present side: anti-join semantics don't need it
    // and at scale it would be an extra full shuffle of the big side.
    candidates.join(present.select(key), Seq(key), "left_anti")

  /** T2: top-K most recent, with a deterministic tie-break. Spark plans
    * this as TakeOrderedAndProject — per-partition top-K then a K-row
    * merge on the driver; no global sort materializes.
    * Reference: `app/db/query.go:567-586` (LIMIT ≤ 50 enforced at API). */
  def topK(df: DataFrame, k: Int, ordering: Column*): DataFrame =
    df.orderBy(ordering: _*).limit(k)

  /** Skew-safe equi-join for when one fact key dominates (a hot contract
    * address, a viral block). Thin façade over [[SkewJoin.saltedJoin]] —
    * the single salting implementation — for the common fact/dim
    * differing-key-name case. The salt is `xxhash64` over the WHOLE fact
    * row, which (unlike `monotonically_increasing_id`) survives task
    * retries and AQE re-planning with an identical plan: any fully
    * duplicate rows share a salt, which only concentrates skew in the
    * degenerate all-rows-identical case.
    *
    * Output shape matches the plain `fact.join(dim, factKey === dimKey)`:
    * both key columns are present (the dim's under its own name). Like
    * the underlying join, non-key column names must be disjoint. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, salts: Int): DataFrame = {
    val d =
      if (dimKey == factKey) dim
      else {
        require(!dim.columns.contains(factKey),
          s"dim already has a column named $factKey; rename it first")
        dim.withColumnRenamed(dimKey, factKey)
      }
    val joined = SkewJoin.saltedJoin(fact, d, Seq(factKey),
      xxhash64(fact.columns.map(col).toIndexedSeq: _*), salts)
    if (dimKey == factKey) joined
    else joined.withColumn(dimKey, col(factKey))
  }
}
