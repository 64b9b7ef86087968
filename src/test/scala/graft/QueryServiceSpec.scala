package graft

import org.apache.spark.sql.functions._

import graft.api.QueryService
import graft.fixtures.EvmFixtures
import graft.queries.EvmQueries

/** API-layer dispatch: validation guardrails reject before planning;
  * valid requests produce the same rows as the registry queries. */
class QueryServiceSpec extends SparkSpec {

  private lazy val svc = new QueryService(
    EvmQueries.blocks(spark), EvmQueries.txs(spark), EvmQueries.events(spark))

  test("hex-shape validation rejects before planning (rest.go:100,233)") {
    assert(svc.blockByHash("0x123").isLeft)
    assert(svc.blockByHash("not-a-hash").isLeft)
    assert(svc.transactionsFromAccountByNumberRange("0xzz", 0, 10).isLeft)
    assert(svc.blockByHash(EvmFixtures.blockHash(1500)).isRight)
  }

  test("RangeChecker guardrails enforce width caps (common.go:66-84)") {
    assert(svc.blocksByNumberRange(0, 100).isLeft)  // width 101 > 100
    assert(svc.blocksByNumberRange(0, 99).isRight)
    assert(svc.blocksByTimeRange(0, 3600).isLeft)   // width 3601 > 3600
    assert(svc.lastEventsFromContract(EvmFixtures.contractAddr(0), 51).isLeft)
    assert(svc.lastEventsFromContract(EvmFixtures.contractAddr(0), 50).isRight)
  }

  test("valid requests return the expected rows") {
    val b = svc.blockByHash(EvmFixtures.blockHash(1500)).toOption.get.collect()
    assert(b.length === 1 && b.head.getAs[Long]("number") === 1500L)

    val topics = svc.eventsFromContractWithTopics(
      EvmFixtures.contractAddr(7), 1000, 1099,
      Map(0 -> EvmFixtures.sig(2))).toOption.get
    val got = topics.collect()
    assert(got.forall(_.getAs[Seq[String]]("topics").head === EvmFixtures.sig(2)))

    val last = svc.lastEventsFromContract(EvmFixtures.contractAddr(0), 10).toOption.get
    val nums = last.collect().map(_.getAs[Long]("number"))
    assert(nums.length === 10 && nums.sorted.reverse.sameElements(nums))
  }

  test("time-range dispatch variants mirror their number-range twins (query.go:248-398)") {
    val T0 = EvmFixtures.BaseTime
    val a2 = EvmFixtures.account(2); val a5 = EvmFixtures.account(5)
    val a11 = EvmFixtures.account(11)

    // from-account: block range [1000,1099] ≡ time range of those blocks
    val byNum = svc.transactionsFromAccountByNumberRange(a2, 1000, 1099)
      .toOption.get.select("hash").collect().map(_.getString(0)).toSet
    val byTime = svc.transactionsFromAccountByTimeRange(
        a2, T0 + 1000 * 12, T0 + 1099 * 12)
      .toOption.get.select("hash").collect().map(_.getString(0)).toSet
    assert(byNum === byTime && byNum.nonEmpty)

    // to-account + between-accounts time variants return rows and respect caps
    assert(svc.transactionsToAccountByTimeRange(a5, T0, T0 + 3599).isRight)
    assert(svc.transactionsToAccountByTimeRange(a5, T0, T0 + 3600).isLeft)
    assert(svc.transactionsBetweenAccountsByNumberRange(a2, a11, 0, 99).isRight)
    assert(svc.transactionsBetweenAccountsByTimeRange(a2, a11, T0, T0 + 3599).isRight)
    assert(svc.contractCreationsFromAccountByTimeRange(a2, T0, T0 + 3599).isRight)
    assert(svc.eventsFromContractByTimeRange(
      EvmFixtures.contractAddr(0), T0, T0 + 3599).isRight)
    assert(svc.eventsFromContractWithTopicsByTimeRange(
      EvmFixtures.contractAddr(7), T0 + 1000 * 12, T0 + 1099 * 12,
      Map(0 -> EvmFixtures.sig(2))).isRight)
  }

  test("count twins equal the row counts of their range endpoints (query.go:139-356)") {
    val a2 = EvmFixtures.account(2)
    val rows = svc.transactionsFromAccountByNumberRange(a2, 1000, 1099)
      .toOption.get.count()
    val cnt = svc.transactionCountFromAccountByNumberRange(a2, 1000, 1099)
      .toOption.get.collect().head.getLong(0)
    assert(cnt === rows && cnt > 0)

    val h = EvmFixtures.blockHash(2003)
    val byHash = svc.transactionCountByBlockHash(h).toOption.get.collect().head.getLong(0)
    assert(byHash === svc.transactionsByBlockHash(h).toOption.get.count())
    // two-step number→hash count twin agrees with the hash path
    val byNum = svc.transactionCountByBlockNumber(2003).toOption.get.collect().head.getLong(0)
    assert(byNum === byHash)

    assert(svc.blockCount().collect().head.getLong(0) ===
      EvmQueries.blocks(spark).count())
  }

  test("count twins eliminate the collection sort under their aggregate") {
    // the collection methods order (number, tiebreak) for deterministic
    // arrays; the count twins reuse those plans and must NOT pay the sort
    val counted = svc.transactionCountFromAccountByNumberRange(
      EvmFixtures.account(2), 1000, 1099).toOption.get
      .queryExecution.executedPlan.toString
    assert(!counted.contains("Sort "), counted)
    // while the collection itself keeps it
    val listed = svc.transactionsFromAccountByNumberRange(
      EvmFixtures.account(2), 1000, 1099).toOption.get
      .queryExecution.executedPlan.toString
    assert(listed.contains("Sort "), listed)
  }

  test("tx JSON shaping emits contract XOR to per row (tx.go:42-52)") {
    val creations = svc.transactionsAsJson(
      EvmQueries.txs(spark).filter(col("contract") =!= "").limit(5)).collect()
    val normals = svc.transactionsAsJson(
      EvmQueries.txs(spark).filter(col("contract") === "").limit(5)).collect()
    assert(creations.forall(r => r.getString(0).contains("\"contract\":\"0x")))
    assert(creations.forall(r => !r.getString(0).contains("\"to\":")))
    assert(normals.forall(r => r.getString(0).contains("\"to\":\"0x")))
    assert(normals.forall(r => !r.getString(0).contains("\"contract\":")))
  }
}
