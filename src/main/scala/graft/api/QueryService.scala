package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{EvmFunctions => F, TopicMatch}
import graft.operators.Relational

/** The API-layer facade over the query surface — the Spark analog of the
  * reference's REST/GraphQL dispatch (`app/rest/rest.go:93-758`,
  * `app/rest/graph/schema.resolvers.go`): parameter validation (hex
  * shapes, range guardrails) happens HERE, before planning, so every
  * interactive query that reaches the engine is a 1–2 partition scan.
  *
  * All methods return Either[error, DataFrame]: the Left messages mirror
  * the reference's 400-response reasons. `blocks`/`txs`/`events` are the
  * canonical tables (e.g. [[graft.ingest.BlockStore.view]] or the domain
  * parquet) — BY-NAME, re-resolved on every method call: a live
  * deployment ([[graft.Serve]]) passes `store.view(…)`, and each request
  * must see the files ingest committed since the service was built (a
  * DataFrame captures its file listing at creation; the hot tier is even
  * rewritten in place). Static domain parquet passes through unchanged —
  * re-evaluating `spark.read.parquet(dir)` is idempotent plan wiring. At
  * warehouse scale the re-listing per request is what a catalog table
  * with a transaction log would absorb; the guardrails already bound the
  * data read to 1–2 partitions.
  */
class QueryService(
    blocks: => DataFrame, txs: => DataFrame, events: => DataFrame,
    val maxBlockRange: Long = 100L,   // config.go:62-77 BlockRange default
    val maxTimeRange: Long = 3600L,   // config.go:81-96 TimeRange default
    val maxTopK: Int = 50) {          // rest.go:612-617

  private val HashRe = "^0x[0-9a-fA-F]{64}$".r
  private val AddrRe = "^0x[0-9a-fA-F]{40}$".r

  private def requireHash(h: String): Either[String, String] =
    if (HashRe.findFirstIn(h).isDefined) Right(h.toLowerCase)
    else Left(s"invalid block/tx hash: $h")

  private def requireAddr(a: String): Either[String, String] =
    if (AddrRe.findFirstIn(a).isDefined) Right(a.toLowerCase)
    else Left(s"invalid address: $a")

  private def requireRange(from: Long, to: Long, max: Long): Either[String, (Long, Long)] =
    if (F.checkRange(from, to, max)) Right((from, to))
    else Left(s"bad range [$from, $to]: width cap $max (RangeChecker)")

  // ---- /v1/block --------------------------------------------------------

  def blockByHash(hash: String): Either[String, DataFrame] =
    requireHash(hash).map(h => Relational.pointLookup(blocks, col("hash") === h))

  def blockByNumber(number: Long): Either[String, DataFrame] =
    Right(Relational.pointLookup(blocks, col("number") === number))

  def blocksByNumberRange(from: Long, to: Long): Either[String, DataFrame] =
    requireRange(from, to, maxBlockRange).map { case (f, t) =>
      Relational.keyRangeScan(blocks, col("number"), f, t)
    }

  def blocksByTimeRange(from: Long, to: Long): Either[String, DataFrame] =
    requireRange(from, to, maxTimeRange).map { case (f, t) =>
      Relational.timeRangeScan(blocks, col("time"), f, t, col("number"))
    }

  // ---- /v1/transaction --------------------------------------------------

  def transactionByHash(hash: String): Either[String, DataFrame] =
    requireHash(hash).map(h => Relational.pointLookup(txs, col("hash") === h))

  def transactionsByBlockHash(hash: String): Either[String, DataFrame] =
    requireHash(hash).map(h =>
      Relational.filterScan(txs, col("blockhash") === h).orderBy(col("hash")))

  /** `GetTransactionsByBlockNumber` (query.go:181-190): the reference's
    * scalar subquery number→hash, planned as a broadcast of the at-most-
    * one matching block hash. */
  def transactionsByBlockNumber(number: Long): Either[String, DataFrame] = Right(
    txs.join(
      broadcast(blocks.filter(col("number") === number)
        .select(col("hash").as("blockhash"))),
      Seq("blockhash")).orderBy(col("hash")))

  def transactionFromAccountWithNonce(from: String, nonce: Long): Either[String, DataFrame] =
    requireAddr(from).map(a =>
      Relational.pointLookup(txs, col("from") === a && col("nonce") === nonce))

  def transactionsFromAccountByNumberRange(from: String, lo: Long, hi: Long): Either[String, DataFrame] =
    for {
      a <- requireAddr(from)
      r <- requireRange(lo, hi, maxBlockRange)
    } yield joinRange(txs, col("from") === a, r._1, r._2, Seq(col("hash")))

  /** `GetTransactionsFromAccountByBlockTimeRange` (query.go:248-272). */
  def transactionsFromAccountByTimeRange(from: String, lo: Long, hi: Long): Either[String, DataFrame] =
    for {
      a <- requireAddr(from)
      r <- requireRange(lo, hi, maxTimeRange)
    } yield joinTimeRange(txs, col("from") === a, r._1, r._2, Seq(col("hash")))

  def transactionsToAccountByNumberRange(to: String, lo: Long, hi: Long): Either[String, DataFrame] =
    for {
      a <- requireAddr(to)
      r <- requireRange(lo, hi, maxBlockRange)
    } yield joinRange(txs, col("to") === a, r._1, r._2, Seq(col("hash")))

  /** `GetTransactionsToAccountByBlockTimeRange` (query.go:304-328). */
  def transactionsToAccountByTimeRange(to: String, lo: Long, hi: Long): Either[String, DataFrame] =
    for {
      a <- requireAddr(to)
      r <- requireRange(lo, hi, maxTimeRange)
    } yield joinTimeRange(txs, col("to") === a, r._1, r._2, Seq(col("hash")))

  /** `GetTransactionsBetweenAccountsByBlockNumberRange` (query.go:332-356). */
  def transactionsBetweenAccountsByNumberRange(from: String, to: String,
      lo: Long, hi: Long): Either[String, DataFrame] =
    for {
      f <- requireAddr(from)
      t <- requireAddr(to)
      r <- requireRange(lo, hi, maxBlockRange)
    } yield joinRange(txs, col("from") === f && col("to") === t, r._1, r._2, Seq(col("hash")))

  /** `GetTransactionsBetweenAccountsByBlockTimeRange` (query.go:360-370). */
  def transactionsBetweenAccountsByTimeRange(from: String, to: String,
      lo: Long, hi: Long): Either[String, DataFrame] =
    for {
      f <- requireAddr(from)
      t <- requireAddr(to)
      r <- requireRange(lo, hi, maxTimeRange)
    } yield joinTimeRange(txs, col("from") === f && col("to") === t, r._1, r._2, Seq(col("hash")))

  def contractCreationsFromAccount(from: String, lo: Long, hi: Long): Either[String, DataFrame] =
    for {
      a <- requireAddr(from)
      r <- requireRange(lo, hi, maxBlockRange)
    } yield joinRange(txs, col("from") === a && col("contract") =!= "", r._1, r._2, Seq(col("hash")))

  /** `GetContractCreationTransactionsFromAccountByBlockTimeRange`
    * (query.go:388-398). */
  def contractCreationsFromAccountByTimeRange(from: String, lo: Long, hi: Long): Either[String, DataFrame] =
    for {
      a <- requireAddr(from)
      r <- requireRange(lo, hi, maxTimeRange)
    } yield joinTimeRange(txs, col("from") === a && col("contract") =!= "", r._1, r._2, Seq(col("hash")))

  // ---- count twins (`GetTransactionCount*`, `GetBlockCount`) ------------
  // The reference pairs every range endpoint with a COUNT variant that
  // runs the same join/filter under `Count(&count)` — here the same plan
  // under a count aggregate (partial counts map-side, one exchange of one
  // long per partition).

  /** `GetBlockCount` (query.go:66-74). */
  def blockCount(): DataFrame = countOf(blocks)

  /** `GetTransactionCountByBlockHash` (query.go:139-149). */
  def transactionCountByBlockHash(hash: String): Either[String, DataFrame] =
    transactionsByBlockHash(hash).map(countOf)

  /** `GetTransactionCountByBlockNumber` (query.go:167-177) — the two-step
    * number→hash subquery, as a semi-join. */
  def transactionCountByBlockNumber(number: Long): Either[String, DataFrame] =
    Right(countOf(Relational.semiJoin(
      txs, blocks, "blockhash", "hash", col("number") === number)))

  /** `GetTransactionCountFromAccountByBlockNumberRange` (query.go:206). */
  def transactionCountFromAccountByNumberRange(from: String, lo: Long, hi: Long): Either[String, DataFrame] =
    transactionsFromAccountByNumberRange(from, lo, hi).map(countOf)

  /** `GetTransactionCountFromAccountByBlockTimeRange` (query.go:234). */
  def transactionCountFromAccountByTimeRange(from: String, lo: Long, hi: Long): Either[String, DataFrame] =
    transactionsFromAccountByTimeRange(from, lo, hi).map(countOf)

  /** `GetTransactionCountToAccountByBlockNumberRange` (query.go:262). */
  def transactionCountToAccountByNumberRange(to: String, lo: Long, hi: Long): Either[String, DataFrame] =
    transactionsToAccountByNumberRange(to, lo, hi).map(countOf)

  /** `GetTransactionCountToAccountByBlockTimeRange` (query.go:290). */
  def transactionCountToAccountByTimeRange(to: String, lo: Long, hi: Long): Either[String, DataFrame] =
    transactionsToAccountByTimeRange(to, lo, hi).map(countOf)

  /** `GetTransactionCountBetweenAccountsByBlockNumberRange` (query.go:318). */
  def transactionCountBetweenAccountsByNumberRange(from: String, to: String,
      lo: Long, hi: Long): Either[String, DataFrame] =
    transactionsBetweenAccountsByNumberRange(from, to, lo, hi).map(countOf)

  /** `GetTransactionCountBetweenAccountsByBlockTimeRange` (query.go:346). */
  def transactionCountBetweenAccountsByTimeRange(from: String, to: String,
      lo: Long, hi: Long): Either[String, DataFrame] =
    transactionsBetweenAccountsByTimeRange(from, to, lo, hi).map(countOf)

  // ---- /v1/event --------------------------------------------------------

  /** `GetEventByBlockHashAndLogIndex` (query.go:590-600, Q11). */
  def eventByBlockHashAndLogIndex(blockHash: String, logIndex: Long): Either[String, DataFrame] =
    requireHash(blockHash).map(h =>
      Relational.pointLookup(events, col("blockhash") === h && col("index") === logIndex))

  /** `GetEventByBlockNumberAndLogIndex` (query.go:604-622, Q12): two-step
    * number→hash→(hash, index), one broadcast-join plan. */
  def eventByBlockNumberAndLogIndex(number: Long, logIndex: Long): Either[String, DataFrame] = Right(
    events.join(
      broadcast(blocks.filter(col("number") === number)
        .select(col("hash").as("blockhash"))),
      Seq("blockhash"))
      .filter(col("index") === logIndex).limit(1))

  /** `GetEventsFromContractByBlockNumberRange` (query.go:470-494). */
  def eventsFromContractByNumberRange(contract: String, lo: Long, hi: Long): Either[String, DataFrame] =
    for {
      c <- requireAddr(contract)
      r <- requireRange(lo, hi, maxBlockRange)
    } yield joinRange(events, col("origin") === c, r._1, r._2, Seq(col("index")))

  def eventsByBlockHash(hash: String): Either[String, DataFrame] =
    requireHash(hash).map(h =>
      Relational.filterScan(events, col("blockhash") === h).orderBy(col("index")))

  def eventsByTransactionHash(hash: String): Either[String, DataFrame] =
    requireHash(hash).map(h =>
      Relational.filterScan(events, col("txhash") === h).orderBy(col("index")))

  /** `GetEventsFromContractByBlockTimeRange` (query.go:429-440). */
  def eventsFromContractByTimeRange(contract: String, lo: Long, hi: Long): Either[String, DataFrame] =
    for {
      c <- requireAddr(contract)
      r <- requireRange(lo, hi, maxTimeRange)
    } yield joinTimeRange(events, col("origin") === c, r._1, r._2, Seq(col("index")))

  private def requireTopics(topics: Map[Int, String]): Either[String, Unit] =
    topics.toSeq.collectFirst {
      case (k, _) if k < 0 || k > 3 => Left(s"topic position $k out of 0..3")
      case (_, v) if HashRe.findFirstIn(v).isEmpty => Left(s"invalid topic: $v")
    }.getOrElse(Right(()))

  /** The deepest endpoint (rest.go:633-667): contract + range + topics. */
  def eventsFromContractWithTopics(contract: String, lo: Long, hi: Long,
      topics: Map[Int, String]): Either[String, DataFrame] =
    for {
      c <- requireAddr(contract)
      r <- requireRange(lo, hi, maxBlockRange)
      _ <- requireTopics(topics)
    } yield joinRange(
      events.filter(TopicMatch.topicsMatchTwoPhase(topics.map { case (k, v) => k -> v.toLowerCase })),
      col("origin") === c, r._1, r._2, Seq(col("index")))

  /** `GetEventsFromContractWithTopicsByBlockTimeRange` (query.go:547-567). */
  def eventsFromContractWithTopicsByTimeRange(contract: String, lo: Long, hi: Long,
      topics: Map[Int, String]): Either[String, DataFrame] =
    for {
      c <- requireAddr(contract)
      r <- requireRange(lo, hi, maxTimeRange)
      _ <- requireTopics(topics)
    } yield joinTimeRange(
      events.filter(TopicMatch.topicsMatchTwoPhase(topics.map { case (k, v) => k -> v.toLowerCase })),
      col("origin") === c, r._1, r._2, Seq(col("index")))

  def lastEventsFromContract(contract: String, k: Int): Either[String, DataFrame] =
    for {
      c <- requireAddr(contract)
      _ <- if (k >= 1 && k <= maxTopK) Right(()) else Left(s"count must be in 1..$maxTopK")
    } yield Relational.topK(
      events.filter(col("origin") === c)
        .join(blocks.select(col("hash").as("blockhash"), col("number")), Seq("blockhash")),
      k, col("number").desc, col("index").desc)

  /** F14/F15 output shaping: the reference's tx JSON documents. */
  def transactionsAsJson(df: DataFrame): DataFrame =
    df.select(F.txJson(col("hash"), col("from"), col("to"), col("contract"),
      col("value"), col("data"), col("gas"), col("gasprice"), col("cost"),
      col("nonce"), col("state"), col("blockhash")).as("json"))

  /** Output shaping for /v1/block responses (`app/data/block.go:37-61`). */
  def blocksAsJson(df: DataFrame): DataFrame =
    df.select(F.blockJson(col("hash"), col("number"), col("time"),
      col("parenthash"), col("difficulty"), col("gasused"), col("gaslimit"),
      col("nonce"), col("miner"), col("size"), col("stateroothash"),
      col("unclehash"), col("txroothash"), col("receiptroothash"),
      col("extradata")).as("json"))

  /** Output shaping for /v1/event responses (`app/data/event.go:30-45`). */
  def eventsAsJson(df: DataFrame): DataFrame =
    df.select(F.eventJson(col("origin"), col("index"), col("topics"),
      col("data"), col("txhash"), col("blockhash")).as("json"))

  // collection responses sort (number, tiebreak) so identical requests
  // serialize identical arrays; the count twins reuse these plans and
  // Catalyst's EliminateSorts removes the order under their aggregate
  private def joinRange(fact: DataFrame, pred: org.apache.spark.sql.Column,
      lo: Long, hi: Long, order: Seq[org.apache.spark.sql.Column]): DataFrame =
    Relational.factJoinDim(fact,
      blocks.select(col("hash").as("b_hash"), col("number")),
      "blockhash", "b_hash", pred, col("number").between(lo, hi))
      .orderBy(col("number") +: order: _*)

  // time predicates are width-capped by RangeChecker like number ranges
  // (3600 s / 12 s-per-block ≈ 300 blocks), so the dim side stays a
  // broadcastable sliver here too
  private def joinTimeRange(fact: DataFrame, pred: org.apache.spark.sql.Column,
      lo: Long, hi: Long, order: Seq[org.apache.spark.sql.Column]): DataFrame =
    Relational.factJoinDim(fact,
      blocks.select(col("hash").as("b_hash"), col("number"), col("time")),
      "blockhash", "b_hash", pred, col("time").between(lo, hi))
      .orderBy(col("number") +: order: _*)

  /** COUNT twin plan: same scan/join, one long per partition exchanged. */
  private def countOf(df: DataFrame): DataFrame =
    df.agg(count(lit(1)).as("count"))
}
