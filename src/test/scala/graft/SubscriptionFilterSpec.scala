package graft

import org.apache.spark.sql.functions._

import graft.streaming.SubscriptionFilter
import graft.streaming.SubscriptionFilter._

/** ST11/ST12: grammar validation and filter semantics vs the reference
  * matchers (`app/pubsub/subscription.go:21,56-64,74-124,159-199`) over
  * the FIXTURES.md subscription-filter matrix. */
class SubscriptionFilterSpec extends SparkSpec {
  import spark.implicits._

  private val a1 = "0x" + "a1" * 20
  private val a2 = "0x" + "b2" * 20
  private val t0 = "0x" + "01" * 32
  private val t1 = "0x" + "02" * 32

  test("grammar accepts the reference's topic shapes and rejects others") {
    val valid = Seq("block", "transaction/*/*", s"transaction/$a1/*",
      s"transaction/*/$a2", s"transaction/$a1/$a2",
      "event/*/*/*/*/*", s"event/$a1/$t0/*/*/*", s"event/*/$t0/$t1/*/*",
      // every trailing segment is optional in subscription.go:21 —
      // partial forms are valid and mean wildcard
      "transaction", s"transaction/$a1", "event", s"event/$a1",
      s"event/$a1/$t0", s"event/$a1/$t0/$t1")
    val invalid = Seq("blocks", "transaction/*/*/*", "event/*/*/*/*/*/*",
      s"transaction/${a1.drop(1)}/*", s"event/$t0", "")
    valid.foreach(v => assert(parse(v).isDefined, v))
    invalid.foreach(v => assert(parse(v).isEmpty, v))
    // omitted segments parse as explicit wildcards
    assert(parse("transaction").get ===
      TransactionSub("*", "*"))
    assert(parse(s"transaction/$a1").get === TransactionSub(a1, "*"))
    assert(parse("event").get === EventSub("*", Seq("*", "*", "*", "*")))
    assert(parse(s"event/$a1/$t0").get === EventSub(a1, Seq(t0, "*", "*", "*")))
  }

  private lazy val txs = Seq(
    (a1, a2, ""),          // normal a1 → a2
    (a2, a1, ""),          // reverse
    (a1, "", "0x" + "c3" * 20), // creation by a1
  ).toDF("from", "to", "contract")

  private def txMatches(sub: String): Seq[Int] =
    txs.withColumn("i", monotonically_increasing_id())
      .filter(toColumn(parse(sub).get)).select("i")
      .collect().map(_.getLong(0).toInt).toSeq.sorted

  test("transaction filters: wildcards, direction, case-insensitivity, creations") {
    assert(txMatches("transaction/*/*") === Seq(0, 1, 2))
    assert(txMatches(s"transaction/$a1/*") === Seq(0, 2))
    assert(txMatches(s"transaction/*/$a2") === Seq(0))
    assert(txMatches(s"transaction/${a1.toUpperCase.replace("0X", "0x")}/$a2") === Seq(0))
    // a pinned `to` can match the created contract address (subscription.go:177-189)
    assert(txMatches(s"transaction/*/${"0x" + "c3" * 20}") === Seq(2))
  }

  private lazy val events = Seq(
    (a1, Seq(t0, t1)),
    (a1, Seq(t0)),
    (a2, Seq(t1, t0)),
    (a1, Seq.empty[String]),
  ).toDF("origin", "topics")

  private def evMatches(sub: String): Seq[Int] =
    events.withColumn("i", monotonically_increasing_id())
      .filter(toColumn(parse(sub).get)).select("i")
      .collect().map(_.getLong(0).toInt).toSeq.sorted

  test("event filters: contract + positional wildcard topics, short arrays") {
    assert(evMatches("event/*/*/*/*/*") === Seq(0, 1, 2, 3))
    assert(evMatches(s"event/$a1/*/*/*/*") === Seq(0, 1, 3))
    assert(evMatches(s"event/*/$t0/*/*/*") === Seq(0, 1))
    assert(evMatches(s"event/*/*/$t0/*/*") === Seq(2))
    assert(evMatches(s"event/$a1/$t0/$t1/*/*") === Seq(0))
    // pinned position beyond array length never matches (subscription.go:84-86)
    assert(evMatches(s"event/*/*/*/*/$t0") === Seq())
  }

  test("tagMatches compiles many subscriptions into one pass") {
    val subs = Seq(
      "s1" -> parse(s"transaction/$a1/*").get,
      "s2" -> parse("transaction/*/*").get,
      "s3" -> parse(s"transaction/*/$a1").get)
    val tags = txs.select(SubscriptionFilter.tagMatches(subs).as("tags"))
      .collect().map(_.getSeq[String](0).toSet)
    assert(tags(0) === Set("s1", "s2"))
    assert(tags(1) === Set("s2", "s3"))
    assert(tags(2) === Set("s1", "s2"))
  }
}
