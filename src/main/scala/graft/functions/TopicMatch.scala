package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's signature operator (SURVEY §2.4): positional matching on
  * the `topics` array of an EVM event.
  *
  * The reference runs it in two phases — a coarse GIN-indexed array
  * containment (`'{t0,…}' <@ e.topics`, `app/db/query.go:526-543`) and an
  * exact positional in-app recheck `DoesItMatch` (`app/db/query.go:473-485`:
  * for each pinned position k require `len(topics) > k && topics[k] == v`).
  *
  * Here both phases are ordinary Catalyst expressions in one conjunctive
  * predicate, so they ride whole-stage codegen and get pushed as far down
  * as the scan allows. The coarse containment is semantically implied by
  * the positional match but is kept available as a cheap prefilter that
  * parquet row-group statistics / bloom filters could use at scale.
  */
object TopicMatch {

  /** Exact positional matcher ≡ `DoesItMatch` (query.go:473-485), including
    * short-array semantics: a pin at position k never matches an array of
    * length ≤ k. `pins` maps 0-based topic position → required value. */
  def topicsMatch(pins: Map[Int, String], topics: Column = col("topics")): Column =
    pins.toSeq.sortBy(_._1).map { case (k, v) =>
      size(topics) > k && element_at(topics, k + 1) === v
    }.reduceOption(_ && _).getOrElse(lit(true))

  /** Coarse containment phase ≡ the `<@` GIN prefilter (query.go:530-541):
    * every pinned value appears *somewhere* in the array. Implied by
    * [[topicsMatch]]; useful only as a skipping-friendly prefilter. */
  def topicsContain(values: Seq[String], topics: Column = col("topics")): Column =
    values.map(v => array_contains(topics, v)).reduceOption(_ && _).getOrElse(lit(true))

  /** Two-phase form mirroring the reference's coarse→exact dance in one
    * predicate (query.go:526-543 then :489-505). */
  def topicsMatchTwoPhase(pins: Map[Int, String], topics: Column = col("topics")): Column =
    topicsContain(pins.values.toSeq.distinct, topics) && topicsMatch(pins, topics)

  /** Pub/sub wildcard variant ≡ `DoesMatchWithPublishedEventData`
    * (`app/pubsub/subscription.go:74-124`): `patterns(k)` of `"*"` or `""`
    * matches anything (including arrays shorter than k, subscription.go:84-86);
    * any other pattern requires a case-insensitive positional match
    * (`CheckSimilarity`, subscription.go:141-151). */
  def topicsMatchWildcard(patterns: Seq[String], topics: Column = col("topics")): Column =
    patterns.zipWithIndex.collect {
      case (p, k) if p != "*" && p.nonEmpty =>
        size(topics) > k && lower(element_at(topics, k + 1)) === lit(p.toLowerCase)
    }.reduceOption(_ && _).getOrElse(lit(true))

  /** GraphQL prefix form: pads a ≤4-element prefix list with `""` then
    * pins the non-empty ones (`app/rest/graph/data.go:210-231` F17). */
  def topicsMatchPrefix(prefix: Seq[String], topics: Column = col("topics")): Column =
    topicsMatch(
      prefix.zipWithIndex.collect { case (v, k) if v.nonEmpty => k -> v }.toMap,
      topics)
}
