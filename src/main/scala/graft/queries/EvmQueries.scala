package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.fixtures.EvmFixtures
import graft.functions.{EvmFunctions => F, TopicMatch}
import graft.operators.{Compaction, Relational}
import graft.pipeline.{Dedup, Sketches}
import graft.streaming.{Publisher, SubscriptionFilter}

/** The reference's 24-query historical surface (SURVEY §2.2–2.6) bound to
  * the EVM domain fixtures — real hex hashes, topics arrays, uint256
  * strings, to/contract creation encoding — not TPC-H analogs.
  *
  * Query constants (hashes, addresses) are *recomputed* from
  * [[EvmFixtures]]'s deterministic identity functions, and interpolated
  * into the DuckDB oracle SQL, which reads the exact same committed
  * parquet via absolute `read_parquet` paths. The `dir` argument of each
  * query is ignored — the domain corpus is scale-independent.
  */
object EvmQueries {

  private val P = EvmFixtures.dir
  private def blocksT = s"read_parquet('$P/blocks.parquet')"
  private def txsT = s"read_parquet('$P/transactions.parquet')"
  private def eventsT = s"read_parquet('$P/events.parquet')"

  def blocks(spark: SparkSession): DataFrame = graft.RelationCache.parquet(spark, s"$P/blocks.parquet")
  def txs(spark: SparkSession): DataFrame = graft.RelationCache.parquet(spark, s"$P/transactions.parquet")
  def events(spark: SparkSession): DataFrame = graft.RelationCache.parquet(spark, s"$P/events.parquet")

  /** Pruned dim side for fact⋈blocks joins — renamed key avoids collisions
    * with the fact table's own `hash`/`nonce` columns, and the projection
    * is the column-pruning the reference does with explicit Select()s
    * (query.go:223,251,…). */
  private def blocksDim(s: SparkSession): DataFrame =
    blocks(s).select(col("hash").as("b_hash"), col("number"), col("time"))

  // Shared constants (deterministic — see EvmFixtures scaladoc).
  private val H1500 = EvmFixtures.blockHash(1500)
  private val H2003 = EvmFixtures.blockHash(2003)
  private val TX1201 = EvmFixtures.txHash(1201, 0)
  private val TX2003 = EvmFixtures.txHash(2003, 2)
  private val Acct2 = EvmFixtures.account(2)
  private val Acct3 = EvmFixtures.account(3)
  private val Acct5 = EvmFixtures.account(5)
  private val Acct11 = EvmFixtures.account(11)
  private val C0 = EvmFixtures.contractAddr(0)
  private val C3 = EvmFixtures.contractAddr(3)
  private val C7 = EvmFixtures.contractAddr(7)
  private val T0 = EvmFixtures.BaseTime

  private def evSort: Seq[Column] = Seq(col("blockhash"), col("index"))

  // ---- API-shape output projections -------------------------------------
  // The reference never emits raw bytes: its serialization layer
  // hex-encodes data/extradata (`app/data/tx.go:36-39`, `app/data/
  // block.go:38-41`, `app/data/event.go:32-35`) and JSON-encodes the
  // topics array. Registry entries emit the same canonical shape — it is
  // the faithful output contract AND it keeps every value hashable by the
  // driver's comparator (raw BinaryType/array columns are not).

  /** All block columns, `extradata` hex-encoded (null/empty → ""). */
  private def blockApi: Seq[Column] = Seq(
    col("hash"), col("number"), col("time"), col("parenthash"),
    col("difficulty"), col("gasused"), col("gaslimit"), col("nonce"),
    col("miner"), col("size"), col("stateroothash"), col("unclehash"),
    col("txroothash"), col("receiptroothash"),
    F.hexEncode(col("extradata")).as("extradata"))

  /** All transaction columns, `data` hex-encoded. */
  private def txApi: Seq[Column] = Seq(
    col("hash"), col("from"), col("to"), col("contract"), col("value"),
    F.hexEncode(col("data")).as("data"), col("gas"), col("gasprice"),
    col("cost"), col("nonce"), col("state"), col("blockhash"))

  /** All event columns, `topics` serialized, `data` hex-encoded with the
    * reference's all-zero suppression (`app/data/event.go:32-35`): exactly
    * 32 zero bytes serialize as `""`, like F2. The coalesce matches the
    * oracle's COALESCE — a NULL topics array must agree across engines. */
  private def eventApi: Seq[Column] = Seq(
    col("blockhash"), col("index"), col("origin"),
    coalesce(array_join(col("topics"), ","), lit("")).as("topics"),
    F.eventDataJson(col("data")).as("data"), col("txhash"))

  /** Event-join output shape (J8 / topics matcher / T2): event columns +
    * the dim side's `number`. */
  private def eventJoinApi: Seq[Column] = eventApi :+ col("number")

  // DuckDB twins of the projections above. `p` is the table alias prefix
  // (e.g. "e.") so joined queries can qualify columns.
  private def hexSql(c: String): String =
    s"CASE WHEN octet_length($c) > 0 THEN '0x' || lower(hex($c)) ELSE '' END"

  // F2 twin: hexSql + the reference's exactly-32-zero-bytes suppression
  private def eventDataSql(c: String): String =
    s"CASE WHEN lower(hex($c)) = repeat('00', 32) THEN '' " +
      s"WHEN octet_length($c) > 0 THEN '0x' || lower(hex($c)) ELSE '' END"

  private def blockApiSql(p: String = ""): String =
    s"${p}hash, ${p}number, ${p}time, ${p}parenthash, ${p}difficulty, " +
      s"${p}gasused, ${p}gaslimit, ${p}nonce, ${p}miner, ${p}size, " +
      s"${p}stateroothash, ${p}unclehash, ${p}txroothash, ${p}receiptroothash, " +
      s"${hexSql(p + "extradata")} AS extradata"

  private def txApiSql(p: String = ""): String =
    s"""${p}hash, $p"from", $p"to", ${p}contract, ${p}value, """ +
      s"""${hexSql(p + "data")} AS data, ${p}gas, ${p}gasprice, ${p}cost, """ +
      s"""${p}nonce, ${p}state, ${p}blockhash"""

  private def eventApiSql(p: String = ""): String =
    s"""${p}blockhash, $p"index", ${p}origin, """ +
      // COALESCE: DuckDB's array_to_string yields NULL on an empty list,
      // Spark's array_join yields '' — events with 0 topics must agree
      s"""COALESCE(array_to_string(${p}topics, ','), '') AS topics, """ +
      s"""${eventDataSql(p + "data")} AS data, ${p}txhash"""

  private def eventJoinApiSql(p: String, numP: String): String =
    s"${eventApiSql(p)}, ${numP}number"

  // ===== §2.2 point lookups / filters / ranges ===========================

  /** Q1 `GetBlockByHash` (query.go:79-87). */
  private def q1(s: SparkSession, d: String): DataFrame =
    Relational.pointLookup(blocks(s), col("hash") === H1500).select(blockApi: _*)

  /** Q2 `GetBlockByNumber` (query.go:92-100). */
  private def q2(s: SparkSession, d: String): DataFrame =
    Relational.pointLookup(blocks(s), col("number") === 1500L).select(blockApi: _*)

  /** Q3 `GetBlocksByNumberRange` (query.go:109-119) — RangeChecker caps
    * interactive width at ~100 (common.go:66-84). */
  private def q3(s: SparkSession, d: String): DataFrame =
    Relational.keyRangeScan(blocks(s), col("number"), 1000L, 1099L).select(blockApi: _*)

  /** Q4 `GetBlocksByTimeRange` (query.go:125-135) — TimeRange cap 3600 s. */
  private def q4(s: SparkSession, d: String): DataFrame =
    Relational.timeRangeScan(blocks(s), col("time"),
      T0 + 1000 * 12, T0 + 1299 * 12, col("number")).select(blockApi: _*)

  /** Q5 `GetAllBlockNumbersInRange` (query.go:15-29). */
  private def q5(s: SparkSession, d: String): DataFrame =
    Relational.keyRangeScan(blocks(s), col("number"), 500L, 799L).select("number")

  /** Q1/Q3 shapes answered FROM the clustered layout artifact
    * ([[graft.sources.SortedLayout]]): blocks written once into
    * `__kb = number div 256` partition dirs with key-sorted 64 KB row
    * groups (the ArtifactStore lifecycle, staleness-keyed on the fixture
    * file), lookups derive the bucket predicate from the layout sidecar —
    * planning-time directory pruning plus min/max row-group pruning
    * (SortedLayoutSpec pins both scan metrics at 10x volume). The oracle
    * reads the ORIGINAL parquet, so a hash match proves the clustered
    * rewrite is lossless — the parquet answer to the reference's B-tree
    * point queries (query.go:92-100) once blocks number 10M+. */
  private def layoutDir(s: SparkSession): String =
    graft.sources.SortedLayout.ensure(s, s"$P/blocks.parquet", blocks(s),
      "number", span = 256L, rowGroupBytes = 64L * 1024,
      // hash lookups (Q1's B-tree analog) can't use the number-derived
      // bucket tier OR min/max stats (hashes are uniform) — bloom
      // filters are their row-group pruning tier (SortedLayoutSpec pins
      // the scanned-row drop)
      bloomCols = Seq("hash"), bloomNdv = 4096L)

  private val layoutCols = Seq("number", "hash", "time", "gasused", "miner")

  private def layoutPoint(s: SparkSession, d: String): DataFrame =
    graft.sources.SortedLayout.pointLookup(s, layoutDir(s), 2003L)
      .select(layoutCols.map(col): _*)

  private def layoutRange(s: SparkSession, d: String): DataFrame =
    graft.sources.SortedLayout.rangeLookup(s, layoutDir(s), 1200L, 1500L)
      .select(layoutCols.map(col): _*)

  /** Q1-by-hash FROM the layout: no bucket predicate exists for a
    * uniform hash, so the lookup's pruning is the `hash` column's bloom
    * filters. The oracle reads the ORIGINAL parquet by the same hash —
    * a hash match proves bloom-pruned reads are lossless. */
  private def layoutHash(s: SparkSession, d: String): DataFrame =
    graft.sources.SortedLayout.hashLookup(s, layoutDir(s), "hash", H2003)
      .select(layoutCols.map(col): _*)

  /** Q6 `GetTransactionByHash` (query.go:194-202). */
  private def q6(s: SparkSession, d: String): DataFrame =
    Relational.pointLookup(txs(s), col("hash") === TX1201).select(txApi: _*)

  /** Q7 `GetTransactionFromAccountWithNonce` (query.go:401-409) — (from,
    * nonce) is unique by construction, LIMIT-1 parity-safe. */
  private def q7(s: SparkSession, d: String): DataFrame =
    Relational.pointLookup(txs(s), col("from") === Acct3 && col("nonce") === 5L)
      .select(txApi: _*)

  /** Q8 `GetTransactionsByBlockHash` (query.go:153-163). */
  private def q8(s: SparkSession, d: String): DataFrame =
    Relational.filterScan(txs(s), col("blockhash") === H2003)
      .select(txApi: _*).orderBy(col("hash"))

  /** Q9 `GetEventsByBlockHash` (query.go:444-454). */
  private def q9(s: SparkSession, d: String): DataFrame =
    Relational.filterScan(events(s), col("blockhash") === H2003)
      .select(eventApi: _*).orderBy(col("index"))

  /** Q10 `GetEventsByTransactionHash` (query.go:457-467). */
  private def q10(s: SparkSession, d: String): DataFrame =
    Relational.filterScan(events(s), col("txhash") === TX2003)
      .select(eventApi: _*).orderBy(col("index"))

  /** Q11 `GetEventByBlockHashAndLogIndex` (query.go:590-600). */
  private def q11(s: SparkSession, d: String): DataFrame =
    Relational.pointLookup(events(s), col("blockhash") === H2003 && col("index") === 1)
      .select(eventApi: _*)

  /** Q12 `GetEventByBlockNumberAndLogIndex` (query.go:604-622): two-step
    * number→hash→(hash,index) as one broadcast-join plan. */
  private def q12(s: SparkSession, d: String): DataFrame = {
    val b = blocks(s).filter(col("number") === 2003L).select(col("hash").as("blockhash"))
    events(s).join(broadcast(b), Seq("blockhash")).filter(col("index") === 1)
      .select(eventApi: _*).limit(1)
  }

  /** Q13 contract-creation predicate (query.go:377,391). */
  private def q13(s: SparkSession, d: String): DataFrame =
    txs(s).filter(col("contract") =!= "" && col("from") === Acct2)
      .select(txApi: _*).orderBy(col("hash"))

  // ===== §2.3 joins ======================================================

  private def txCols: Seq[Column] = Seq(
    col("hash"), col("from"), col("to"), col("contract"), col("value"),
    col("gas"), col("gasprice"), col("cost"), col("nonce"), col("state"),
    col("blockhash"), col("number"))

  /** J1 `GetTransactionsFromAccountByBlockNumberRange` (query.go:206-230). */
  private def j1(s: SparkSession, d: String): DataFrame =
    Relational.factJoinDim(txs(s), blocksDim(s), "blockhash", "b_hash",
        col("from") === Acct2, col("number").between(1000L, 1999L))
      .select(txCols: _*).orderBy(col("hash"))

  /** J2 …`ByBlockTimeRange` (query.go:234-258), 3600 s window. */
  private def j2(s: SparkSession, d: String): DataFrame =
    Relational.factJoinDim(txs(s), blocksDim(s), "blockhash", "b_hash",
        col("from") === Acct2, col("time").between(T0 + 1000 * 12, T0 + 1299 * 12))
      .select(txCols: _*).orderBy(col("hash"))

  /** J3 `…ToAccountByBlockNumberRange` (query.go:262-286). */
  private def j3(s: SparkSession, d: String): DataFrame =
    Relational.factJoinDim(txs(s), blocksDim(s), "blockhash", "b_hash",
        col("to") === Acct5, col("number").between(0L, 999L))
      .select(txCols: _*).orderBy(col("hash"))

  /** J4 `…ToAccountByBlockTimeRange` (query.go:290-314), the time-range
    * twin of J3 — same join shape, dim predicate on `time`. */
  private def j4(s: SparkSession, d: String): DataFrame =
    Relational.factJoinDim(txs(s), blocksDim(s), "blockhash", "b_hash",
        col("to") === Acct5, col("time").between(T0, T0 + 999 * 12))
      .select(txCols: _*).orderBy(col("hash"))

  /** J5 `…BetweenAccountsByBlockNumberRange` (query.go:318-342). */
  private def j5(s: SparkSession, d: String): DataFrame =
    Relational.factJoinDim(txs(s), blocksDim(s), "blockhash", "b_hash",
        col("from") === Acct2 && col("to") === Acct11, col("number").between(0L, 2999L))
      .select(txCols: _*).orderBy(col("hash"))

  /** J6 `…BetweenAccountsByBlockTimeRange` (query.go:346-370), the
    * time-range twin of J5. */
  private def j6(s: SparkSession, d: String): DataFrame =
    Relational.factJoinDim(txs(s), blocksDim(s), "blockhash", "b_hash",
        col("from") === Acct2 && col("to") === Acct11,
        col("time").between(T0, T0 + 2999 * 12))
      .select(txCols: _*).orderBy(col("hash"))

  /** J7 contract creations from account in range (query.go:374-398). */
  private def j7(s: SparkSession, d: String): DataFrame =
    Relational.factJoinDim(txs(s), blocksDim(s), "blockhash", "b_hash",
        col("from") === Acct2 && col("contract") =!= "", col("number").between(0L, 2999L))
      .select(txCols: _*).orderBy(col("hash"))

  /** J8 `GetEventsFromContractByBlockNumberRange` (query.go:413-441). */
  private def j8(s: SparkSession, d: String): DataFrame =
    Relational.factJoinDim(events(s), blocksDim(s), "blockhash", "b_hash",
        col("origin") === C3, col("number").between(1000L, 1999L))
      .select(eventJoinApi: _*)
      .orderBy(evSort: _*)

  /** J9 scalar-subquery semi-join (query.go:167-191). */
  private def j9(s: SparkSession, d: String): DataFrame =
    Relational.semiJoin(txs(s), blocks(s), "blockhash", "hash", col("number") === 2003L)
      .select(txApi: _*).orderBy(col("hash"))

  /** J10 gap detection — the distributed form of the reference's
    * per-candidate binary search (`app/block/syncer.go:21-37`). Finds the
    * deliberately missing block numbers. */
  private def j10(s: SparkSession, d: String): DataFrame =
    Relational.antiJoin(
        s.range(0L, EvmFixtures.MaxNumber + 1).toDF("number"),
        blocks(s), "number")
      .orderBy(col("number"))

  // ===== §2.4 topics matcher (the signature operator) ====================

  /** Exact positional pins at 0 and 2 — `DoesItMatch` semantics incl.
    * arrays shorter than the pinned position never matching. */
  private def topicsExact(s: SparkSession, d: String): DataFrame =
    events(s)
      .filter(TopicMatch.topicsMatch(Map(0 -> EvmFixtures.sig(2), 2 -> EvmFixtures.arg(4))))
      .select(eventApi: _*)
      .orderBy(evSort: _*)

  /** The SURVEY §7.2 flagship: contract + number range + positional topics,
    * two-phase (coarse containment then exact) like
    * `GetEventsFromContractWithTopicsByBlockNumberRange` (query.go:526-543)
    * + `ExtractOutOnlyMatchingEvents` (query.go:489-505). */
  private def topicsRange(s: SparkSession, d: String): DataFrame = {
    val pins = Map(0 -> EvmFixtures.sig(2), 1 -> EvmFixtures.arg(6))
    Relational.factJoinDim(
        events(s).filter(TopicMatch.topicsMatchTwoPhase(pins)),
        blocksDim(s), "blockhash", "b_hash",
        col("origin") === C7, col("number").between(0L, 1999L))
      .select(eventJoinApi: _*)
      .orderBy(evSort: _*)
  }

  /** Time-range twin of the flagship
    * (`GetEventsFromContractWithTopicsByBlockTimeRange`, query.go:547-564). */
  private def topicsTimeRange(s: SparkSession, d: String): DataFrame = {
    val pins = Map(0 -> EvmFixtures.sig(2), 1 -> EvmFixtures.arg(6))
    Relational.factJoinDim(
        events(s).filter(TopicMatch.topicsMatchTwoPhase(pins)),
        blocksDim(s), "blockhash", "b_hash",
        col("origin") === C7, col("time").between(T0, T0 + 1999 * 12))
      .select(eventJoinApi: _*)
      .orderBy(evSort: _*)
  }

  /** Pub/sub wildcard matcher (subscription.go:74-124): only position 1
    * pinned, case-insensitively; `*`/empty positions match anything. */
  private def topicsWildcard(s: SparkSession, d: String): DataFrame =
    events(s)
      .filter(TopicMatch.topicsMatchWildcard(
        Seq("*", EvmFixtures.arg(7).toUpperCase, "", "*")))
      .select(eventApi: _*)
      .orderBy(evSort: _*)

  // ===== §2.5 aggregates / §2.6 top-K ====================================

  /** A1/A2/A3 min/max/count over blocks (query.go:33-74). */
  private def a1(s: SparkSession, d: String): DataFrame =
    blocks(s).agg(min(col("number")).as("min_number"),
      max(col("number")).as("max_number"), count(lit(1)).as("n_rows"))

  /** A4 `GetTransactionCountByBlockHash` (query.go:139-149). */
  private def a4(s: SparkSession, d: String): DataFrame =
    txs(s).filter(col("blockhash") === H2003).agg(count(lit(1)).as("n_rows"))

  /** A5 `GetTransactionCountByBlockNumber` (query.go:167-177). */
  private def a5(s: SparkSession, d: String): DataFrame =
    Relational.semiJoin(txs(s), blocks(s), "blockhash", "hash", col("number") === 2003L)
      .agg(count(lit(1)).as("n_rows"))

  /** A6 count twin of J1 (query.go:206-216). */
  private def a6(s: SparkSession, d: String): DataFrame =
    Relational.factJoinDim(txs(s), blocksDim(s), "blockhash", "b_hash",
        col("from") === Acct2, col("number").between(1000L, 1999L))
      .agg(count(lit(1)).as("n_rows"))

  /** T2 `GetLastXEventsFromContract` (query.go:567-586), cap 50. The dim
    * predicate is unbounded (all history), so NO broadcast hint — AQE
    * decides from runtime sizes; the origin-filtered event side is the
    * small one at the reference's steady state. */
  private def t2(s: SparkSession, d: String): DataFrame =
    Relational.topK(
        Relational.factJoinDimUnbounded(events(s), blocksDim(s), "blockhash", "b_hash",
            col("origin") === C0, col("number") >= 0L)
          .select(eventJoinApi: _*),
        50, col("number").desc, col("index").desc)

  // ===== beyond-reference: grouped/window analytics on domain data =======
  // The reference has no GROUP BY at all (SURVEY §2.5); these are the
  // analytics-engine surface a Spark user gets on the same tables.

  /** Gas consumption per miner — scan → partial agg → final agg. */
  private def g1GasByMiner(s: SparkSession, d: String): DataFrame =
    blocks(s).groupBy(col("miner")).agg(
      sum(col("gasused")).as("total_gas"),
      count(lit(1)).as("n_blocks"))
      .orderBy(col("miner"))

  /** Event volume + mean topic arity per contract. */
  private def g2EventsPerContract(s: SparkSession, d: String): DataFrame =
    events(s).groupBy(col("origin")).agg(
      count(lit(1)).as("n_events"),
      (sum(size(col("topics"))).cast(DoubleType) / count(lit(1)).cast(DoubleType))
        .as("avg_topics"))
      .orderBy(col("origin"))

  /** Chain-scale cardinality analytics via the HyperLogLog sketch
    * ([[Sketches.hllRegisters]]): distinct transaction hashes observed,
    * answered from a ≤256-row mergeable artifact instead of a
    * corpus-wide distinct — the register table is duplicate-insensitive,
    * so per-segment sketches of the tx stream (reorg replays included)
    * fold by max to the same answer. The 7k+ fixture cardinality sits in
    * the raw-estimate regime (n/m > 2.5; the tiny 20-sender set would
    * need the linear-counting correction, whose ln() the gates avoid —
    * libms differ in the last ulp). The gate emits the exact integer
    * numerator, the raw estimate, and the true distinct beside it; the
    * oracle replays the sha-derived bucket/rank arithmetic. */
  private def k1TxCardinality(s: SparkSession, d: String): DataFrame = {
    val hashes = txs(s).select(col("hash").as("v")).distinct()
    Sketches.hllEstimate(Sketches.hllRegisters(hashes, "v"))
      .crossJoin(hashes.agg(count(lit(1)).as("exact")))
  }

  /** Per-1000-block bucket chain stats incl. distinct miners — the shape
    * of a partition-pruned dashboard query over the confirmed tier. */
  private def g3BucketStats(s: SparkSession, d: String): DataFrame =
    blocks(s).groupBy((col("number") / 1000).cast(LongType).as("bucket")).agg(
      min(col("number")).as("lo"), max(col("number")).as("hi"),
      count(lit(1)).as("n_blocks"),
      countDistinct(col("miner")).as("n_miners"),
      sum(col("gasused")).as("total_gas"))
      .orderBy(col("bucket"))

  /** Block inter-arrival times via lag() — window function coverage.
    * The window partitions by the same 1000-block bucket g3 uses, so no
    * single task ever holds more than one bucket (a global orderBy window
    * funnels everything through one partition — the WindowExec warning at
    * 100 TB would be an OOM). lag() is null at bucket boundaries; the
    * queried range sits inside one bucket, so the oracle is unaffected. */
  private def w1BlockIntervals(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy((col("number") / 1000).cast(LongType))
      .orderBy(col("number"))
    blocks(s).filter(col("number").between(1000L, 1099L))
      .select(col("number"), col("time"))
      .withColumn("dt", col("time") - lag(col("time"), 1).over(w))
      .orderBy(col("number"))
  }

  // ===== §2.8 scalar layer over domain data ==============================

  /** F1/F7/F8/F10/F14/F15 in one projection — the JSON-shaping scalars that
    * make API output byte-identical (tx.go:36-52, util.go:30-57,102-105). */
  private def fScalarShapes(s: SparkSession, d: String): DataFrame =
    Relational.factJoinDim(txs(s), blocksDim(s), "blockhash", "b_hash",
        lit(true), col("number").between(2000L, 2099L))
      .select(
        col("hash"),
        F.hexEncode(col("data")).as("data_hex"),
        F.targetAddress(col("to"), col("contract")).as("target"),
        F.calcGasCost(col("gas"), col("gasprice")).as("gascost"),
        col("state").cast(StringType).as("state_str"),
        F.isValidAddress(col("from")).as("from_valid"),
        F.isZeroAddress(col("from")).as("from_zero"))
      .orderBy(col("hash"))

  /** F2 zero-data suppression + F1 empty-guard over event data
    * (event.go:32-35). */
  private def fEventDataShape(s: SparkSession, d: String): DataFrame =
    Relational.factJoinDim(events(s), blocksDim(s), "blockhash", "b_hash",
        lit(true), col("number").between(2000L, 2099L))
      .select(col("blockhash"), col("index"), F.eventDataJson(col("data")).as("data_json"))
      .orderBy(evSort: _*)

  /** F9 ToDecimal: wei string → ether double (util.go:60-74). DOUBLE parse
    * of a decimal string is correctly rounded in both engines, so this is
    * hash-stable even for the >2^127 values in the corpus. */
  private def fWeiToEth(s: SparkSession, d: String): DataFrame =
    txs(s)
      .select(col("hash"), F.toDecimal(col("value"), 18).as("value_eth"))
      .orderBy(col("hash"))

  /** F14/F15 full JSON document shaping — byte-identical to the
    * reference's tx JSON (`app/data/tx.go:42-52`): contract XOR to,
    * numerics stringified, hex-encoded data with empty-guard. */
  private def fTxJson(s: SparkSession, d: String): DataFrame =
    Relational.factJoinDim(txs(s), blocksDim(s), "blockhash", "b_hash",
        lit(true), col("number").between(2000L, 2099L))
      .select(col("hash"), F.txJson(col("hash"), col("from"), col("to"),
        col("contract"), col("value"), col("data"), col("gas"), col("gasprice"),
        col("cost"), col("nonce"), col("state"), col("blockhash")).as("json"))
      .orderBy(col("hash"))

  /** Block JSON document shaping (`app/data/block.go:37-61`): Go-`%f`
    * size, F1 empty/null extradata suppression — the /v1/block response
    * bytes ([[graft.api.RestServer]]). */
  private def fBlockJson(s: SparkSession, d: String): DataFrame =
    blocks(s).filter(col("number").between(2000L, 2099L))
      .select(col("number"), F.blockJson(col("hash"), col("number"), col("time"),
        col("parenthash"), col("difficulty"), col("gasused"), col("gaslimit"),
        col("nonce"), col("miner"), col("size"), col("stateroothash"),
        col("unclehash"), col("txroothash"), col("receiptroothash"),
        col("extradata")).as("json"))
      .orderBy(col("number"))

  /** Event JSON document shaping (`app/data/event.go:30-45`): quoted topic
    * array with no separator spaces, F2 zero-word data suppression — the
    * /v1/event response bytes. */
  private def fEventJson(s: SparkSession, d: String): DataFrame =
    Relational.factJoinDim(events(s), blocksDim(s), "blockhash", "b_hash",
        lit(true), col("number").between(2000L, 2099L))
      .select(col("txhash"), col("index"),
        F.eventJson(col("origin"), col("index"), col("topics"), col("data"),
          col("txhash"), col("blockhash")).as("json"))
      .orderBy(col("txhash"), col("index"))

  /** Exact uint256 total of transferred value over the ≤30-digit slice —
    * the custom Aggregator + expressions path (SURVEY §2.10), bounded so
    * the exact sum fits DuckDB's HUGEINT and the oracle hash-checks it. */
  private def fUint256Sum(s: SparkSession, d: String): DataFrame =
    txs(s).filter(length(col("value")) <= 30)
      .agg(graft.functions.Uint256.sum(col("value")).as("total_value"))

  /** The same exact sum over the FULL corpus, whose >2^128 total exceeds
    * every fixed-width SQL numeric. The oracle decomposes each value into
    * five decimal limbs (4×18 digits + a 6-digit top), sums each limb in
    * HUGEINT (per-limb totals stay ≪ 2^127), propagates carries with
    * HUGEINT div/mod, and reassembles the exact decimal string — so even
    * the 231-bit sum is cross-engine hash-checked. Exactness is
    * additionally pinned by Uint256Spec property tests vs BigInt. */
  private def fUint256SumFull(s: SparkSession, d: String): DataFrame =
    txs(s).agg(graft.functions.Uint256.sum(col("value")).as("total_value"))

  /** F3/F4/F12 codec shapes, cross-checked construct→parse style: the
    * F1∘F3 hex round-trip must reproduce F1's encoding; F4 must invert
    * stringification of `gas`; a 65-byte signature is assembled in-engine
    * from known parts (r = tx hash bytes, s = blockhash bytes,
    * v = 27 + nonce%2) and F12 must recover exactly those parts with v
    * normalized. The oracle computes every expected value by independent
    * arithmetic. */
  private def fCodecShapes(s: SparkSession, d: String): DataFrame = {
    val dataHex = F.hexEncode(col("data"))
    val vByte = unhex(lpad(hex(lit(27) + pmod(col("nonce"), lit(2))), 2, "0"))
    val sig = concat(F.hexDecode(col("hash")), F.hexDecode(col("blockhash")), vByte)
    txs(s).select(
      col("hash"),
      F.hexEncode(F.hexDecode(dataHex)).as("data_rt"),
      F.parseNumber(col("gas").cast(StringType)).as("gas_parsed"),
      F.hexEncode(F.sigR(sig)).as("sig_r"),
      F.hexEncode(F.sigS(sig)).as("sig_s"),
      F.sigV(sig).cast(LongType).as("sig_v"))
      .orderBy(col("hash"))
  }

  /** F11 keccak-256 against PUBLISHED known-answer vectors (Ethereum's
    * pre-NIST padding): digests computed fully in-engine by the codegen'd
    * [[graft.functions.Keccak.Keccak256]] expression, plus the
    * pubkey→address composition over the secp256k1 generator point's
    * uncompressed bytes (the private-key-1 address). The oracle is the
    * published constants themselves — external truth, not a replay, which
    * is what makes keccak gate-checkable at all (DuckDB has no keccak). */
  private def fKeccakVectors(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // SEC 2 §2.4.1 generator coordinates — the private-key-1 public key
    val gPub = "04" +
      "79be667ef9dcbbac55a06295ce870b07029bfcdb2dce28d959f2815b16f81798" +
      "483ada7726a3c4655da4fbfc0e1108a8fd17b448a68554199c47d08ffb10d4b8"
    Seq("", "abc", "testing", "hello",
        "The quick brown fox jumps over the lazy dog").toDF("input_utf8")
      .select(col("input_utf8"),
        lower(hex(F.keccak256(encode(col("input_utf8"), "UTF-8")))).as("keccak_hex"),
        F.publicKeyToAddress(unhex(lit(gPub))).as("g_address"))
      .orderBy(col("input_utf8"))
  }

  /** F13 sender recovery against the EIP-155 worked example: the spec's
    * published signing hash, signed with the spec's private key
    * (0x4646…46) under a fixed nonce — r/s/recId derived once by
    * independent integer arithmetic outside this codebase — recovered
    * fully in-engine by the codegen'd ecrecover expression and composed
    * through pubkey→address. The oracle is the spec's published sender
    * address; a zeroed r is the negative control (null recovery). */
  private def fEcrecoverVector(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.functions.TxSender
    val sigHash = unhex(lit(
      "daf5a779ae972f972197303d7b574746c7ef83eadac0f2791ad23db92e4c8e53"))
    val r = unhex(lit(
      "b9cb4e655f1c6cc4f61209130f967ee4fe27aef2d8a5506f350c7c5b8dcdd4d2"))
    val sv = unhex(lit(
      "167ab77e1dad0b4a833158789fb7e131b6088b17371e7ab1ae224c61b6801854"))
    Seq(1).toDF("one").select(
      F.publicKeyToAddress(
        TxSender.ecrecover(sigHash, r, sv, lit(0))).as("sender"),
      F.publicKeyToAddress(
        TxSender.ecrecover(sigHash, unhex(lit("00" * 32)), sv, lit(0)))
        .as("invalid_r_sender"))
  }

  // ===== §2.1 ingest normalization (S4/ST5) ==============================

  /** S4/ST5: packed-block explode-normalize, transactions leg
    * (`app/db/model.go:96-103`; one `explode` + struct star-projection).
    * Cross-engine: DuckDB independently unnests the SAME nested parquet,
    * so the gate hash-checks the explode semantics themselves — ordering,
    * struct field mapping, byte columns — not just row counts. */
  private def s4PackedTxs(s: SparkSession, d: String): DataFrame =
    graft.ingest.PackedBlocks.transactionsOf(
      graft.ingest.PackedBlocks.readBatch(s, s"$P/packed_blocks.parquet"))
      .select(txApi: _*).orderBy(col("hash"))

  /** S4/ST5: packed-block explode-normalize, events leg — two nested
    * explodes (`model.go:105-109`). */
  private def s4PackedEvents(s: SparkSession, d: String): DataFrame =
    graft.ingest.PackedBlocks.eventsOf(
      graft.ingest.PackedBlocks.readBatch(s, s"$P/packed_blocks.parquet"))
      .select(eventApi: _*).orderBy(evSort: _*)

  /** S7 upsert-as-compaction: a deterministic update wave (every
    * nonce%5==0 tx re-arrives with bumped state at version 2) is unioned
    * with the base at version 1, and [[Compaction.latestByKey]] must
    * surface exactly the updated rows for touched keys and the originals
    * elsewhere. The oracle replays last-writer-wins with a window — the
    * same MERGE contract the reference gets from ON CONFLICT UPDATE
    * (`app/db/transaction.go:17-25`). */
  private def s7UpsertCompaction(s: SparkSession, d: String): DataFrame = {
    val base = txs(s).withColumn("__v", lit(1L))
    val updates = txs(s).filter(pmod(col("nonce"), lit(5)) === 0)
      .withColumn("state", col("state") + 10)
      .withColumn("__v", lit(2L))
    Compaction.latestByKey(base.unionByName(updates), Seq("hash"), "__v")
      .select(col("hash"), col("nonce"), col("state").cast(LongType).as("state"),
        col("__v").as("version"))
      .orderBy(col("hash"))
  }

  /** S8 publish ordering: the notification stream of a 100-block slice
    * must walk block → txs in packed position → each tx's events in
    * packed position ([[Publisher.messages]]); the oracle re-derives
    * (number, tier, seq, subseq) from the same nested parquet with
    * positional unnest. Row ORDER is part of the gate hash, so this pins
    * the exact delivery sequence the reference produces
    * (`app/block/publish_block.go:12-47`). */
  private def s8PublishOrder(s: SparkSession, d: String): DataFrame = {
    val packed = graft.ingest.PackedBlocks
      .readBatch(s, s"$P/packed_blocks.parquet")
      .filter(col("block.number").between(2000L, 2099L))
    Publisher.messages(packed)
      .select(col("number"), col("tier").cast(LongType).as("tier"),
        col("seq").cast(LongType).as("seq"),
        col("subseq").cast(LongType).as("subseq"), col("topic"))
  }

  /** ST11 fanout: five client subscriptions — block firehose, a
    * mixed-case from-address (case-insensitivity, subscription.go:141-151),
    * a to-pattern that must also match created contracts
    * (subscription.go:177-189), a pinned contract+topic0, and a
    * positional topic1 wildcard sub — compiled to one tagging pass
    * ([[Publisher.deliveries]]); the oracle replays each predicate in
    * SQL over the flat tables. */
  private def st11Fanout(s: SparkSession, d: String): DataFrame = {
    val packed = graft.ingest.PackedBlocks
      .readBatch(s, s"$P/packed_blocks.parquet")
      .filter(col("block.number").between(2000L, 2199L))
    val subs = Seq(
      "s_block" -> "block",
      "s_from" -> s"transaction/0x${Acct2.drop(2).toUpperCase}/*",
      "s_to_c3" -> s"transaction/*/$C3",
      "s_ev_c7" -> s"event/$C7/${EvmFixtures.sig(2)}/*/*/*",
      "s_ev_arg" -> s"event/*/*/${EvmFixtures.arg(4)}/*/*"
    ).map { case (id, str) => id -> SubscriptionFilter.parse(str).getOrElse(
      sys.error(s"invalid subscription in registry: $str")) }
    Publisher.deliveries(packed, subs)
      .select(col("topic"), col("key"),
        array_join(col("subscribers"), ",").as("subscribers"))
      .orderBy(col("topic"), col("key"))
  }

  /** W2 (beyond-reference): gap-based sessionization of per-account tx
    * activity over block time — [[Sessionize.sessions]]: one shuffle on
    * the account key, two window passes, no self-joins. The oracle
    * replays the lag-boundary + running-sum construction; session row
    * sets are order-independent under timestamp ties (zero gap never
    * opens a session), so per-session aggregates hash-match. */
  private def w2AccountSessions(s: SparkSession, d: String): DataFrame = {
    val t = txs(s).select(col("from").as("acct"), col("blockhash"))
      .join(blocksDim(s), col("blockhash") === col("b_hash"))
      .select(col("acct"), col("time").as("ts"))
    graft.operators.Sessionize.sessions(t, Seq("acct"), "ts", gap = 60L)
      .orderBy(col("acct"), col("session_id"))
  }

  /** ST1 header-listener probe: numbers jumping ahead of the expected
    * next head (`app/block/listener.go:49-73`) over the packed corpus. */
  private def st1AheadProbe(s: SparkSession, d: String): DataFrame =
    graft.ingest.PackedBlocks.aheadOf(
      graft.ingest.PackedBlocks.readBatch(s, s"$P/packed_blocks.parquet"),
      expectedNext = 2500L)
      .orderBy(col("number"))

  /** ST4 rescan-daemon summary: (lo, hi, n, has_holes) in one aggregate
    * pass — the corpus has holes by construction, so the flag is live. */
  private def st4HoleSummary(s: SparkSession, d: String): DataFrame =
    graft.ingest.Backfill.holeSummary(blocks(s))

  // ===== registry ========================================================

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_layout_point_lookup" -> (layoutPoint _),
    "ev_layout_range_scan" -> (layoutRange _),
    "ev_layout_hash_lookup" -> (layoutHash _),
    "ev_q1_block_by_hash" -> (q1 _),
    "ev_q2_block_by_number" -> (q2 _),
    "ev_q3_blocks_by_number_range" -> (q3 _),
    "ev_q4_blocks_by_time_range" -> (q4 _),
    "ev_q5_block_numbers_in_range" -> (q5 _),
    "ev_q6_tx_by_hash" -> (q6 _),
    "ev_q7_tx_from_nonce" -> (q7 _),
    "ev_q8_txs_by_blockhash" -> (q8 _),
    "ev_q9_events_by_blockhash" -> (q9 _),
    "ev_q10_events_by_txhash" -> (q10 _),
    "ev_q11_event_by_blockhash_index" -> (q11 _),
    "ev_q12_event_by_number_index" -> (q12 _),
    "ev_q13_creation_txs" -> (q13 _),
    "ev_j1_txs_from_by_number_range" -> (j1 _),
    "ev_j2_txs_from_by_time_range" -> (j2 _),
    "ev_j3_txs_to_by_number_range" -> (j3 _),
    "ev_j4_txs_to_by_time_range" -> (j4 _),
    "ev_j5_txs_between_by_number_range" -> (j5 _),
    "ev_j6_txs_between_by_time_range" -> (j6 _),
    "ev_j7_creations_from_by_number_range" -> (j7 _),
    "ev_j8_events_from_contract_by_number_range" -> (j8 _),
    "ev_j9_txs_by_block_number_semi" -> (j9 _),
    "ev_j10_missing_blocks" -> (j10 _),
    "ev_topics_exact" -> (topicsExact _),
    "ev_topics_range" -> (topicsRange _),
    "ev_topics_time_range" -> (topicsTimeRange _),
    "ev_topics_wildcard" -> (topicsWildcard _),
    "ev_a1_block_min_max_count" -> (a1 _),
    "ev_a4_tx_count_by_blockhash" -> (a4 _),
    "ev_a5_tx_count_by_number" -> (a5 _),
    "ev_a6_txs_from_range_count" -> (a6 _),
    "ev_t2_last50_events_from_contract" -> (t2 _),
    "ev_g1_gas_by_miner" -> (g1GasByMiner _),
    "ev_g2_events_per_contract" -> (g2EventsPerContract _),
    "ev_g3_bucket_stats" -> (g3BucketStats _),
    "ev_k1_tx_cardinality" -> (k1TxCardinality _),
    "ev_w1_block_intervals" -> (w1BlockIntervals _),
    "ev_f_scalar_shapes" -> (fScalarShapes _),
    "ev_f_event_data_shape" -> (fEventDataShape _),
    "ev_f_wei_to_eth" -> (fWeiToEth _),
    "ev_f_uint256_sum_bounded" -> (fUint256Sum _),
    "ev_f_uint256_sum_full" -> (fUint256SumFull _),
    "ev_f_tx_json" -> (fTxJson _),
    "ev_f_block_json" -> (fBlockJson _),
    "ev_f_event_json" -> (fEventJson _),
    "ev_f_codec_shapes" -> (fCodecShapes _),
    "ev_f_keccak_vectors" -> (fKeccakVectors _),
    "ev_f_ecrecover_vector" -> (fEcrecoverVector _),
    "ev_s4_packed_tx_explode" -> (s4PackedTxs _),
    "ev_s4_packed_event_explode" -> (s4PackedEvents _),
    "ev_s7_upsert_compaction" -> (s7UpsertCompaction _),
    "ev_s8_publish_order" -> (s8PublishOrder _),
    "ev_st11_subscription_fanout" -> (st11Fanout _),
    "ev_st1_ahead_probe" -> (st1AheadProbe _),
    "ev_st4_hole_summary" -> (st4HoleSummary _),
    "ev_w2_account_sessions" -> (w2AccountSessions _),
  )

  def oracleSql: Map[String, String] = Map(
    "ev_layout_point_lookup" ->
      s"SELECT number, hash, time, gasused, miner FROM $blocksT WHERE number = 2003",
    "ev_layout_range_scan" ->
      s"SELECT number, hash, time, gasused, miner FROM $blocksT WHERE number BETWEEN 1200 AND 1500",
    "ev_layout_hash_lookup" ->
      s"SELECT number, hash, time, gasused, miner FROM $blocksT WHERE hash = '$H2003'",
    "ev_q1_block_by_hash" ->
      s"SELECT ${blockApiSql()} FROM $blocksT WHERE hash = '$H1500'",
    "ev_q2_block_by_number" ->
      s"SELECT ${blockApiSql()} FROM $blocksT WHERE number = 1500",
    "ev_q3_blocks_by_number_range" ->
      s"SELECT ${blockApiSql()} FROM $blocksT WHERE number BETWEEN 1000 AND 1099 ORDER BY number",
    "ev_q4_blocks_by_time_range" ->
      s"SELECT ${blockApiSql()} FROM $blocksT WHERE time BETWEEN ${T0 + 1000 * 12} AND ${T0 + 1299 * 12} ORDER BY number",
    "ev_q5_block_numbers_in_range" ->
      s"SELECT number FROM $blocksT WHERE number BETWEEN 500 AND 799 ORDER BY number",
    "ev_q6_tx_by_hash" ->
      s"SELECT ${txApiSql()} FROM $txsT WHERE hash = '$TX1201'",
    "ev_q7_tx_from_nonce" ->
      s"""SELECT ${txApiSql()} FROM $txsT WHERE "from" = '$Acct3' AND nonce = 5""",
    "ev_q8_txs_by_blockhash" ->
      s"SELECT ${txApiSql()} FROM $txsT WHERE blockhash = '$H2003' ORDER BY hash",
    "ev_q9_events_by_blockhash" ->
      s"""SELECT ${eventApiSql()} FROM $eventsT WHERE blockhash = '$H2003' ORDER BY "index"""",
    "ev_q10_events_by_txhash" ->
      s"""SELECT ${eventApiSql()} FROM $eventsT WHERE txhash = '$TX2003' ORDER BY "index"""",
    "ev_q11_event_by_blockhash_index" ->
      s"""SELECT ${eventApiSql()} FROM $eventsT WHERE blockhash = '$H2003' AND "index" = 1""",
    "ev_q12_event_by_number_index" ->
      s"""SELECT ${eventApiSql("e.")} FROM $eventsT e JOIN $blocksT b ON e.blockhash = b.hash
          WHERE b.number = 2003 AND e."index" = 1""",
    "ev_q13_creation_txs" ->
      s"""SELECT ${txApiSql()} FROM $txsT WHERE contract <> '' AND "from" = '$Acct2' ORDER BY hash""",
    "ev_j1_txs_from_by_number_range" ->
      s"""SELECT t.hash, t."from", t."to", t.contract, t.value, t.gas, t.gasprice,
          t.cost, t.nonce, t.state, t.blockhash, b.number
          FROM $txsT t JOIN $blocksT b ON t.blockhash = b.hash
          WHERE t."from" = '$Acct2' AND b.number BETWEEN 1000 AND 1999 ORDER BY t.hash""",
    "ev_j2_txs_from_by_time_range" ->
      s"""SELECT t.hash, t."from", t."to", t.contract, t.value, t.gas, t.gasprice,
          t.cost, t.nonce, t.state, t.blockhash, b.number
          FROM $txsT t JOIN $blocksT b ON t.blockhash = b.hash
          WHERE t."from" = '$Acct2' AND b.time BETWEEN ${T0 + 1000 * 12} AND ${T0 + 1299 * 12}
          ORDER BY t.hash""",
    "ev_j3_txs_to_by_number_range" ->
      s"""SELECT t.hash, t."from", t."to", t.contract, t.value, t.gas, t.gasprice,
          t.cost, t.nonce, t.state, t.blockhash, b.number
          FROM $txsT t JOIN $blocksT b ON t.blockhash = b.hash
          WHERE t."to" = '$Acct5' AND b.number BETWEEN 0 AND 999 ORDER BY t.hash""",
    "ev_j4_txs_to_by_time_range" ->
      s"""SELECT t.hash, t."from", t."to", t.contract, t.value, t.gas, t.gasprice,
          t.cost, t.nonce, t.state, t.blockhash, b.number
          FROM $txsT t JOIN $blocksT b ON t.blockhash = b.hash
          WHERE t."to" = '$Acct5' AND b.time BETWEEN $T0 AND ${T0 + 999 * 12}
          ORDER BY t.hash""",
    "ev_j5_txs_between_by_number_range" ->
      s"""SELECT t.hash, t."from", t."to", t.contract, t.value, t.gas, t.gasprice,
          t.cost, t.nonce, t.state, t.blockhash, b.number
          FROM $txsT t JOIN $blocksT b ON t.blockhash = b.hash
          WHERE t."from" = '$Acct2' AND t."to" = '$Acct11' AND b.number BETWEEN 0 AND 2999
          ORDER BY t.hash""",
    "ev_j6_txs_between_by_time_range" ->
      s"""SELECT t.hash, t."from", t."to", t.contract, t.value, t.gas, t.gasprice,
          t.cost, t.nonce, t.state, t.blockhash, b.number
          FROM $txsT t JOIN $blocksT b ON t.blockhash = b.hash
          WHERE t."from" = '$Acct2' AND t."to" = '$Acct11'
            AND b.time BETWEEN $T0 AND ${T0 + 2999 * 12}
          ORDER BY t.hash""",
    "ev_j7_creations_from_by_number_range" ->
      s"""SELECT t.hash, t."from", t."to", t.contract, t.value, t.gas, t.gasprice,
          t.cost, t.nonce, t.state, t.blockhash, b.number
          FROM $txsT t JOIN $blocksT b ON t.blockhash = b.hash
          WHERE t."from" = '$Acct2' AND t.contract <> '' AND b.number BETWEEN 0 AND 2999
          ORDER BY t.hash""",
    "ev_j8_events_from_contract_by_number_range" ->
      s"""SELECT ${eventJoinApiSql("e.", "b.")}
          FROM $eventsT e JOIN $blocksT b ON e.blockhash = b.hash
          WHERE e.origin = '$C3' AND b.number BETWEEN 1000 AND 1999
          ORDER BY e.blockhash, e."index"""",
    "ev_j9_txs_by_block_number_semi" ->
      s"""SELECT ${txApiSql()} FROM $txsT WHERE blockhash IN
          (SELECT hash FROM $blocksT WHERE number = 2003) ORDER BY hash""",
    "ev_j10_missing_blocks" ->
      s"""SELECT id AS number FROM generate_series(0, ${EvmFixtures.MaxNumber}) t(id)
          WHERE NOT EXISTS (SELECT 1 FROM $blocksT b WHERE b.number = t.id)
          ORDER BY number""",
    "ev_topics_exact" ->
      s"""SELECT ${eventApiSql()} FROM $eventsT
          WHERE len(topics) > 0 AND topics[1] = '${EvmFixtures.sig(2)}'
            AND len(topics) > 2 AND topics[3] = '${EvmFixtures.arg(4)}'
          ORDER BY blockhash, "index"""",
    "ev_topics_range" ->
      s"""SELECT ${eventJoinApiSql("e.", "b.")}
          FROM $eventsT e JOIN $blocksT b ON e.blockhash = b.hash
          WHERE e.origin = '$C7' AND b.number BETWEEN 0 AND 1999
            AND len(e.topics) > 0 AND e.topics[1] = '${EvmFixtures.sig(2)}'
            AND len(e.topics) > 1 AND e.topics[2] = '${EvmFixtures.arg(6)}'
          ORDER BY e.blockhash, e."index"""",
    "ev_topics_time_range" ->
      s"""SELECT ${eventJoinApiSql("e.", "b.")}
          FROM $eventsT e JOIN $blocksT b ON e.blockhash = b.hash
          WHERE e.origin = '$C7' AND b.time BETWEEN $T0 AND ${T0 + 1999 * 12}
            AND len(e.topics) > 0 AND e.topics[1] = '${EvmFixtures.sig(2)}'
            AND len(e.topics) > 1 AND e.topics[2] = '${EvmFixtures.arg(6)}'
          ORDER BY e.blockhash, e."index"""",
    "ev_topics_wildcard" ->
      s"""SELECT ${eventApiSql()} FROM $eventsT
          WHERE len(topics) > 1 AND lower(topics[2]) = lower('${EvmFixtures.arg(7)}')
          ORDER BY blockhash, "index"""",
    "ev_a1_block_min_max_count" ->
      s"""SELECT CAST(min(number) AS BIGINT) AS min_number,
          CAST(max(number) AS BIGINT) AS max_number,
          CAST(count(*) AS BIGINT) AS n_rows FROM $blocksT""",
    "ev_a4_tx_count_by_blockhash" ->
      s"SELECT CAST(count(*) AS BIGINT) AS n_rows FROM $txsT WHERE blockhash = '$H2003'",
    "ev_a5_tx_count_by_number" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_rows FROM $txsT WHERE blockhash IN
          (SELECT hash FROM $blocksT WHERE number = 2003)""",
    "ev_a6_txs_from_range_count" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_rows
          FROM $txsT t JOIN $blocksT b ON t.blockhash = b.hash
          WHERE t."from" = '$Acct2' AND b.number BETWEEN 1000 AND 1999""",
    "ev_t2_last50_events_from_contract" ->
      s"""SELECT ${eventJoinApiSql("e.", "b.")}
          FROM $eventsT e JOIN $blocksT b ON e.blockhash = b.hash
          WHERE e.origin = '$C0' AND b.number >= 0
          ORDER BY b.number DESC, e."index" DESC LIMIT 50""",
    "ev_g1_gas_by_miner" ->
      s"""SELECT miner, CAST(sum(gasused) AS BIGINT) AS total_gas,
          CAST(count(*) AS BIGINT) AS n_blocks FROM $blocksT
          GROUP BY miner ORDER BY miner""",
    "ev_g2_events_per_contract" ->
      s"""SELECT origin, CAST(count(*) AS BIGINT) AS n_events,
          CAST(sum(len(topics)) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_topics
          FROM $eventsT GROUP BY origin ORDER BY origin""",
    "ev_g3_bucket_stats" ->
      s"""SELECT CAST(number // 1000 AS BIGINT) AS bucket,
          CAST(min(number) AS BIGINT) AS lo, CAST(max(number) AS BIGINT) AS hi,
          CAST(count(*) AS BIGINT) AS n_blocks,
          CAST(count(DISTINCT miner) AS BIGINT) AS n_miners,
          CAST(sum(gasused) AS BIGINT) AS total_gas
          FROM $blocksT GROUP BY 1 ORDER BY bucket""",
    "ev_k1_tx_cardinality" ->
      s"""WITH vals AS (SELECT DISTINCT hash AS v FROM $txsT),
          h AS (SELECT ${Dedup.sha60Sql("v")} AS h FROM vals),
          br AS (SELECT h >> 52 AS bucket,
                        h & ((CAST(1 AS BIGINT) << 52) - 1) AS r FROM h),
          f1 AS (SELECT bucket, r, r | (r >> 1) AS f FROM br),
          f2 AS (SELECT bucket, r, f | (f >> 2) AS f FROM f1),
          f3 AS (SELECT bucket, r, f | (f >> 4) AS f FROM f2),
          f4 AS (SELECT bucket, r, f | (f >> 8) AS f FROM f3),
          f5 AS (SELECT bucket, r, f | (f >> 16) AS f FROM f4),
          f6 AS (SELECT bucket, r, f | (f >> 32) AS f FROM f5),
          rho AS (SELECT bucket,
                    CASE WHEN r = 0 THEN 53 ELSE 53 - bit_count(f) END AS rho
                  FROM f6),
          regs AS (SELECT bucket, max(rho) AS reg FROM rho GROUP BY bucket),
          n AS (SELECT CAST(sum(CAST(1 AS BIGINT) << CAST(53 - reg AS INT))
                       + (256 - count(*)) * (CAST(1 AS BIGINT) << 53) AS BIGINT) AS num
                FROM regs)
          SELECT num, ${Sketches.HllAlphaM2Pow53} / num AS est,
                 (SELECT CAST(count(*) AS BIGINT) FROM vals) AS exact
          FROM n""",
    "ev_w1_block_intervals" ->
      s"""SELECT number, time, time - lag(time) OVER (ORDER BY number) AS dt
          FROM $blocksT WHERE number BETWEEN 1000 AND 1099 ORDER BY number""",
    "ev_f_scalar_shapes" ->
      s"""SELECT t.hash,
          CASE WHEN octet_length(t.data) > 0 THEN '0x' || lower(hex(t.data)) ELSE '' END AS data_hex,
          CASE WHEN t.contract <> '' THEN t.contract ELSE t."to" END AS target,
          CAST(CAST(t.gasprice AS DECIMAL(18,0)) * CAST(t.gas AS DECIMAL(18,0)) AS VARCHAR) AS gascost,
          CAST(t.state AS VARCHAR) AS state_str,
          regexp_full_match(t."from", '0x[0-9a-fA-F]{40}') AS from_valid,
          lower(t."from") = '${F.ZeroAddress}' AS from_zero
          FROM $txsT t JOIN $blocksT b ON t.blockhash = b.hash
          WHERE b.number BETWEEN 2000 AND 2099 ORDER BY t.hash""",
    "ev_f_event_data_shape" ->
      s"""SELECT e.blockhash, e."index",
          CASE WHEN lower(hex(e.data)) = repeat('00', 32) THEN ''
               WHEN octet_length(e.data) > 0 THEN '0x' || lower(hex(e.data))
               ELSE '' END AS data_json
          FROM $eventsT e JOIN $blocksT b ON e.blockhash = b.hash
          WHERE b.number BETWEEN 2000 AND 2099 ORDER BY e.blockhash, e."index"""",
    "ev_f_uint256_sum_bounded" ->
      s"""SELECT CAST(sum(CAST(value AS HUGEINT)) AS VARCHAR) AS total_value
          FROM $txsT WHERE length(value) <= 30""",
    // Exact bignum sum via limb decomposition: per-limb HUGEINT sums,
    // carry propagation with div/mod, string reassembly (see scaladoc)
    "ev_f_uint256_sum_full" ->
      s"""WITH limbs AS (
            SELECT
              sum(CAST(substring(lpad(value, 78, '0'), 61, 18) AS HUGEINT)) AS l0,
              sum(CAST(substring(lpad(value, 78, '0'), 43, 18) AS HUGEINT)) AS l1,
              sum(CAST(substring(lpad(value, 78, '0'), 25, 18) AS HUGEINT)) AS l2,
              sum(CAST(substring(lpad(value, 78, '0'), 7, 18) AS HUGEINT)) AS l3,
              sum(CAST(substring(lpad(value, 78, '0'), 1, 6) AS HUGEINT)) AS l4
            FROM $txsT),
          pw AS (SELECT CAST('1000000000000000000' AS HUGEINT) AS p),
          c1 AS (SELECT l0 % p AS d0, l0 // p AS k1, l1, l2, l3, l4 FROM limbs, pw),
          c2 AS (SELECT d0, (l1 + k1) % p AS d1, (l1 + k1) // p AS k2, l2, l3, l4 FROM c1, pw),
          c3 AS (SELECT d0, d1, (l2 + k2) % p AS d2, (l2 + k2) // p AS k3, l3, l4 FROM c2, pw),
          c4 AS (SELECT d0, d1, d2, (l3 + k3) % p AS d3, (l3 + k3) // p AS k4, l4 FROM c3, pw)
          SELECT COALESCE(NULLIF(regexp_replace(
            lpad(CAST(l4 + k4 AS VARCHAR), 12, '0') ||
            lpad(CAST(d3 AS VARCHAR), 18, '0') || lpad(CAST(d2 AS VARCHAR), 18, '0') ||
            lpad(CAST(d1 AS VARCHAR), 18, '0') || lpad(CAST(d0 AS VARCHAR), 18, '0'),
            '^0+', ''), ''), '0') AS total_value
          FROM c4""",
    "ev_f_wei_to_eth" ->
      s"SELECT hash, CAST(value AS DOUBLE) / 1e18 AS value_eth FROM $txsT ORDER BY hash",
    "ev_f_tx_json" ->
      s"""SELECT t.hash,
          '{"hash":"' || t.hash || '","from":"' || t."from" || '",'
          || CASE WHEN t.contract <> '' THEN '"contract":"' || t.contract || '"'
                  ELSE '"to":"' || t."to" || '"' END
          || ',"value":"' || t.value || '","data":"'
          || CASE WHEN octet_length(t.data) > 0 THEN '0x' || lower(hex(t.data)) ELSE '' END
          || '","gas":"' || CAST(t.gas AS VARCHAR) || '","gasPrice":"' || t.gasprice
          || '","cost":"' || t.cost || '","nonce":"' || CAST(t.nonce AS VARCHAR)
          || '","state":"' || CAST(t.state AS VARCHAR) || '","blockHash":"' || t.blockhash
          || '"}' AS json
          FROM $txsT t JOIN $blocksT b ON t.blockhash = b.hash
          WHERE b.number BETWEEN 2000 AND 2099 ORDER BY t.hash""",
    "ev_f_block_json" ->
      s"""SELECT number,
          '{"hash":"' || hash || '","number":' || CAST(number AS VARCHAR)
          || ',"time":' || CAST(time AS VARCHAR)
          || ',"parentHash":"' || parenthash || '","difficulty":"' || difficulty
          || '","gasUsed":' || CAST(gasused AS VARCHAR)
          || ',"gasLimit":' || CAST(gaslimit AS VARCHAR)
          || ',"nonce":"' || nonce || '","miner":"' || miner
          || '","size":' || printf('%f', size)
          || ',"stateRootHash":"' || stateroothash || '","uncleHash":"' || unclehash
          || '","txRootHash":"' || txroothash
          || '","receiptRootHash":"' || receiptroothash
          || '","extraData":"'
          || CASE WHEN extradata IS NULL OR octet_length(extradata) = 0 THEN ''
                  ELSE '0x' || lower(hex(extradata)) END
          || '"}' AS json
          FROM $blocksT WHERE number BETWEEN 2000 AND 2099 ORDER BY number""",
    "ev_f_event_json" ->
      s"""SELECT e.txhash, e."index",
          '{"origin":"' || e.origin || '","index":' || CAST(e."index" AS VARCHAR)
          || ',"topics":['
          || coalesce( -- empty list: string_agg semantics yield NULL, not ''
               array_to_string(list_transform(e.topics, x -> '"' || x || '"'), ','), '')
          || '],"data":"'
          || CASE WHEN e.data IS NULL OR octet_length(e.data) = 0 THEN ''
                  WHEN lower(hex(e.data)) = repeat('0', 64) THEN ''
                  ELSE '0x' || lower(hex(e.data)) END
          || '","txHash":"' || e.txhash || '","blockHash":"' || e.blockhash
          || '"}' AS json
          FROM $eventsT e JOIN $blocksT b ON e.blockhash = b.hash
          WHERE b.number BETWEEN 2000 AND 2099 ORDER BY e.txhash, e."index"""",
    // F3/F4/F12: expected values computed by independent arithmetic
    "ev_f_codec_shapes" ->
      s"""SELECT hash,
          ${hexSql("data")} AS data_rt,
          CAST(CAST(gas AS VARCHAR) AS BIGINT) AS gas_parsed,
          hash AS sig_r,
          blockhash AS sig_s,
          nonce % 2 AS sig_v
          FROM $txsT ORDER BY hash""",
    // F11/F13: published known-answer constants (Keccak-256 KATs, the
    // private-key-1 address, the EIP-155 worked example's sender) — the
    // oracle is external truth, since DuckDB has neither keccak nor
    // secp256k1
    "ev_f_keccak_vectors" ->
      """SELECT * FROM (VALUES
           ('', 'c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470',
            '0x7e5f4552091a69125d5dfcb7b8c2659029395bdf'),
           ('The quick brown fox jumps over the lazy dog',
            '4d741b6f1eb29cb2a9b9911c82f56fa8d73b04959d3d9d222895df6c0b28aa15',
            '0x7e5f4552091a69125d5dfcb7b8c2659029395bdf'),
           ('abc', '4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45',
            '0x7e5f4552091a69125d5dfcb7b8c2659029395bdf'),
           ('hello', '1c8aff950685c2ed4bc3174f3472287b56d9517b9c948127319a09a7a36deac8',
            '0x7e5f4552091a69125d5dfcb7b8c2659029395bdf'),
           ('testing', '5f16f4c7f149ac4f9510d9cf8cf384038ad348b3bcdc01915f95de12df9d1b02',
            '0x7e5f4552091a69125d5dfcb7b8c2659029395bdf')
         ) AS t(input_utf8, keccak_hex, g_address) ORDER BY input_utf8""",
    "ev_f_ecrecover_vector" ->
      """SELECT '0x9d8a62f656a8d1615c1294fd71e9cfb3e4855a4f' AS sender,
                CAST(NULL AS VARCHAR) AS invalid_r_sender""",
    // S4/ST5 cross-engine explode: DuckDB unnests the nested parquet itself
    "ev_s4_packed_tx_explode" ->
      s"""SELECT ${txApiSql()} FROM (
            SELECT unnest(pt.tx) FROM (
              SELECT unnest(transactions) AS pt
              FROM read_parquet('$P/packed_blocks.parquet')))
          ORDER BY hash""",
    "ev_s4_packed_event_explode" ->
      s"""SELECT ${eventApiSql()} FROM (
            SELECT unnest(ev) FROM (
              SELECT unnest(pt.events) AS ev FROM (
                SELECT unnest(transactions) AS pt
                FROM read_parquet('$P/packed_blocks.parquet'))))
          ORDER BY blockhash, "index"""",
    // S7: last-writer-wins replayed with a window over the same update wave
    "ev_s7_upsert_compaction" ->
      s"""SELECT hash, nonce, state, version FROM (
            SELECT hash, nonce, state, version,
                   row_number() OVER (PARTITION BY hash ORDER BY version DESC) AS rn
            FROM (
              SELECT hash, nonce, CAST(state AS BIGINT) AS state,
                     CAST(1 AS BIGINT) AS version FROM $txsT
              UNION ALL
              SELECT hash, nonce, CAST(state + 10 AS BIGINT) AS state,
                     CAST(2 AS BIGINT) AS version FROM $txsT WHERE nonce % 5 = 0))
          WHERE rn = 1 ORDER BY hash""",
    // S8: (number, tier, seq, subseq) re-derived with positional unnest;
    // row order is hashed, so the delivery sequence itself is pinned
    "ev_s8_publish_order" ->
      s"""SELECT number, tier, seq, subseq, topic FROM (
            SELECT block.number AS number, CAST(0 AS BIGINT) AS tier,
                   CAST(0 AS BIGINT) AS seq, CAST(0 AS BIGINT) AS subseq,
                   'block' AS topic
            FROM read_parquet('$P/packed_blocks.parquet')
            WHERE block.number BETWEEN 2000 AND 2099
            UNION ALL
            SELECT block.number, CAST(1 AS BIGINT),
                   generate_subscripts(transactions, 1) - 1,
                   CAST(0 AS BIGINT), 'transaction'
            FROM read_parquet('$P/packed_blocks.parquet')
            WHERE block.number BETWEEN 2000 AND 2099
            UNION ALL
            SELECT number, CAST(2 AS BIGINT), seq,
                   generate_subscripts(pt.events, 1) - 1, 'event'
            FROM (SELECT block.number AS number,
                         generate_subscripts(transactions, 1) - 1 AS seq,
                         unnest(transactions) AS pt
                  FROM read_parquet('$P/packed_blocks.parquet')
                  WHERE block.number BETWEEN 2000 AND 2099))
          ORDER BY number, tier, seq, subseq""",
    // ST11: each subscription predicate replayed in SQL over the flat tables
    "ev_st11_subscription_fanout" ->
      s"""WITH b AS (SELECT hash, number FROM $blocksT WHERE number BETWEEN 2000 AND 2199)
          SELECT topic, key, subscribers FROM (
            SELECT 'block' AS topic, hash AS key, 's_block' AS subscribers FROM b
            UNION ALL
            SELECT 'transaction', t.hash,
              array_to_string(list_filter([
                CASE WHEN lower(t."from") = lower('0x${Acct2.drop(2).toUpperCase}') THEN 's_from' END,
                CASE WHEN lower(CASE WHEN t.contract <> '' THEN t.contract ELSE t."to" END) = lower('$C3') THEN 's_to_c3' END
              ], x -> x IS NOT NULL), ',')
            FROM $txsT t JOIN b ON t.blockhash = b.hash
            UNION ALL
            SELECT 'event', e.blockhash || '#' || CAST(e."index" AS VARCHAR),
              array_to_string(list_filter([
                CASE WHEN lower(e.origin) = lower('$C7') AND len(e.topics) > 0
                          AND lower(e.topics[1]) = lower('${EvmFixtures.sig(2)}') THEN 's_ev_c7' END,
                CASE WHEN len(e.topics) > 1
                          AND lower(e.topics[2]) = lower('${EvmFixtures.arg(4)}') THEN 's_ev_arg' END
              ], x -> x IS NOT NULL), ',')
            FROM $eventsT e JOIN b ON e.blockhash = b.hash)
          WHERE subscribers <> '' ORDER BY topic, key""",
    "ev_st1_ahead_probe" ->
      s"""SELECT block.number AS number FROM read_parquet('$P/packed_blocks.parquet')
          WHERE block.number > 2500 ORDER BY number""",
    "ev_st4_hole_summary" ->
      s"""SELECT min(number) AS lo, max(number) AS hi, count(*) AS n,
                 count(*) < max(number) - min(number) + 1 AS has_holes
          FROM $blocksT""",
    // W2: lag-boundary + running-sum sessionization replayed with windows
    "ev_w2_account_sessions" ->
      s"""WITH t AS (
            SELECT tx."from" AS acct, b.time AS ts
            FROM $txsT tx JOIN $blocksT b ON tx.blockhash = b.hash),
          m AS (
            SELECT acct, ts,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY acct ORDER BY ts) > 60
                        THEN 1 ELSE 0 END AS brk
            FROM t),
          s AS (
            SELECT acct, ts,
                   CAST(sum(brk) OVER (PARTITION BY acct ORDER BY ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
            FROM m)
          SELECT acct, session_id, min(ts) AS start_t, max(ts) AS end_t,
                 count(*) AS n
          FROM s GROUP BY acct, session_id ORDER BY acct, session_id""",
  )
}
