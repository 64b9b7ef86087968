package graft

import graft.fixtures.EvmFixtures
import graft.schema.Model._
import graft.streaming.{Publisher, SubscriptionFilter}

/** S8 ordering and per-subscription delivery semantics. */
class PublisherSpec extends SparkSpec {
  import spark.implicits._

  private def packed(n: Long): PackedBlock = {
    val nTx = 2
    val block = EvmFixtures.buildBlock(n, nTx)
    val txs = (0 until nTx).map { j =>
      val tx = EvmFixtures.buildTx(n, j, j).copy(blockhash = block.hash)
      val evs = (0 until 1).map(e => EvmFixtures.buildEvent(n, j, e, j).copy(
        blockhash = block.hash, txhash = tx.hash))
      PackedTransaction(tx, evs)
    }
    PackedBlock(block, txs)
  }

  test("messages: strict block → txs → events order per block (publish_block.go:12-47)") {
    val msgs = Publisher.messages(Seq(packed(10), packed(11)).toDF()).collect()
    val perBlock = msgs.groupBy(_.getAs[Long]("number"))
    perBlock.foreach { case (n, rows) =>
      val topics = rows.map(_.getAs[String]("topic")).toSeq
      assert(topics === Seq("block", "transaction", "transaction", "event", "event"))
      // within a tier, messages come in PACKED position order, not payload
      // (= hash-lexicographic) order: tx 0 before tx 1, and each event
      // carries its parent tx's position (publish_tx.go:13-96)
      val txHashes = rows.filter(_.getAs[String]("topic") == "transaction")
        .map(_.getAs[String]("payload"))
      (0 until 2).foreach { j =>
        assert(txHashes(j).contains(EvmFixtures.buildTx(n, j, j).hash),
          s"tx at position $j of block $n out of packed order")
      }
      assert(rows.map(r => (r.getAs[Int]("seq"), r.getAs[Int]("subseq"))).toSeq ===
        Seq((0, 0), (0, 0), (1, 0), (0, 0), (1, 0)))
    }
    // all blocks' messages are contiguous and ordered by number
    assert(msgs.map(_.getAs[Long]("number")).toSeq ===
      Seq.fill(5)(10L) ++ Seq.fill(5)(11L))
    // payloads are JSON with the reference's shaping (hex extradata, to XOR contract)
    assert(msgs.forall(_.getAs[String]("payload").startsWith("{")))
  }

  test("deliveries: only matching subscriptions receive each entity (ST11)") {
    val from0 = EvmFixtures.account(((10 * 7 + 0) % 20).toInt) // tx (10,0)'s sender
    val subs = Seq(
      "all-blocks" -> SubscriptionFilter.parse("block").get,
      "all-tx" -> SubscriptionFilter.parse("transaction/*/*").get,
      "from0" -> SubscriptionFilter.parse(s"transaction/$from0/*").get,
      "no-events" -> SubscriptionFilter.parse(
        s"event/${EvmFixtures.addr20("nobody")}/*/*/*/*").get)
    val d = Publisher.deliveries(Seq(packed(10)).toDF(), subs).collect()
    val byTopic = d.groupBy(_.getAs[String]("topic"))
    assert(byTopic("block").flatMap(_.getSeq[String](3)).toSet === Set("all-blocks"))
    val txSubs = byTopic("transaction").flatMap(_.getSeq[String](3))
    assert(txSubs.count(_ == "all-tx") === 2)
    assert(txSubs.count(_ == "from0") === 1)
    assert(!byTopic.contains("event")) // no event subscription matches → filtered out
  }
}
