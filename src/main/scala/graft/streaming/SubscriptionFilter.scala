package graft.streaming

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.{EvmFunctions, TopicMatch}

/** ST11/ST12: the pub/sub subscription grammar compiled to Catalyst
  * predicates (SURVEY §2.9).
  *
  * Grammar (`app/pubsub/subscription.go:21`):
  *   `block`
  *   `transaction/<from|*>/<to|*>`
  *   `event/<contract|*>/<t0|*>/<t1|*>/<t2|*>/<t3|*>`
  *
  * Matching semantics (`subscription.go:56-64,74-124,129-137,159-199`):
  * `*` matches anything; address/topic comparisons are case-insensitive
  * (`CheckSimilarity` :141-151); a topic pattern at position k requires
  * `len(topics) > k` unless it is `*`.
  *
  * Thousands of per-client subscriptions compile to one disjunctive
  * Column per entity stream — evaluate once per micro-batch, tag matches,
  * route in the API tier (SURVEY §7.4 hard part #4).
  */
object SubscriptionFilter {

  private val Addr = "(?:0[xX][0-9a-fA-F]{40}|\\*)"
  private val Topic = "(?:0[xX][0-9a-fA-F]{64}|\\*)"
  /** Validation regex ≡ subscription.go:21 — every trailing segment is
    * OPTIONAL there (`transaction`, `transaction/<addr>`, `event/<addr>/
    * <topic0>`, … are all valid); a missing segment means wildcard. */
  val grammar: scala.util.matching.Regex =
    s"^(?:block|transaction(?:/$Addr(?:/$Addr)?)?|event(?:/$Addr(?:/$Topic){0,4})?)$$".r

  sealed trait Subscription
  case object BlockSub extends Subscription
  final case class TransactionSub(from: String, to: String) extends Subscription
  final case class EventSub(contract: String, topics: Seq[String]) extends Subscription

  /** Parse + validate a subscription name (None = invalid per grammar);
    * omitted trailing segments become `*` wildcards, the reference's
    * semantics for its optional groups. */
  def parse(name: String): Option[Subscription] = name match {
    case s if grammar.findFirstIn(s).isEmpty => None
    case "block" => Some(BlockSub)
    case s if s.startsWith("transaction") =>
      val parts = s.split("/", -1)
      Some(TransactionSub(
        parts.lift(1).getOrElse("*"), parts.lift(2).getOrElse("*")))
    case s =>
      val parts = s.split("/", -1)
      Some(EventSub(parts.lift(1).getOrElse("*"),
        (0 until 4).map(i => parts.lift(i + 2).getOrElse("*"))))
  }

  private def wild(pattern: String, c: Column): Column =
    if (pattern == "*") lit(true) else EvmFunctions.checkSimilarity(c, lit(pattern))

  /** Compile one subscription to a predicate over its entity's columns.
    * Transaction matching follows `subscription.go:159-199` (from AND to,
    * wildcards free); events follow `:74-124` (contract + positional
    * wildcard topics). */
  def toColumn(sub: Subscription): Column = sub match {
    case BlockSub => lit(true)
    case TransactionSub(from, to) =>
      // contract-creation txs have empty `to`; a pinned `to` pattern can
      // also match the created contract address (subscription.go:177-189)
      wild(from, col("from")) &&
        (if (to == "*") lit(true)
         else EvmFunctions.checkSimilarity(
           EvmFunctions.targetAddress(col("to"), col("contract")), lit(to)))
    case EventSub(contract, topics) =>
      wild(contract, col("origin")) && TopicMatch.topicsMatchWildcard(topics)
  }

  /** ST11 fanout: compile many client subscriptions into one pass that
    * tags each row with the ids of the subscriptions it matches. */
  def tagMatches(subs: Seq[(String, Subscription)]): Column =
    filter(
      array(subs.map { case (id, sub) =>
        when(toColumn(sub), lit(id)).otherwise(lit(null))
      }: _*),
      x => x.isNotNull)
}
