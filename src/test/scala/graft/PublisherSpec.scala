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

  test("ST11 at fleet size: 1,000 mixed subscriptions stay ONE pass and " +
      "sublinear wall time vs 10") {
    // the reference matches per client per message (subscription.go:159-199
    // — O(clients × msgs) regex walks); ours compiles ALL subscriptions
    // into one tagged column evaluated in a single pass over the batch.
    // This pins the claim at fleet size: same job count as 10 subs, no
    // joins, no per-subscription jobs, and wall time grows ~sublinearly.
    val batch = (0L until 200L).map(packed).toDF().cache()
    batch.count()

    def subsOf(n: Int): Seq[(String, SubscriptionFilter.Subscription)] =
      (0 until n).map { i =>
        val name = i % 4 match {
          case 0 => "block"
          case 1 => s"transaction/${EvmFixtures.account(i % 20)}/*"
          case 2 => s"transaction/*/${EvmFixtures.account(i % 20)}"
          case _ => s"event/${EvmFixtures.contractAddr(i % 7)}/*"
        }
        s"sub$i" -> SubscriptionFilter.parse(name).get
      }

    val jobCounter = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobCounter.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    def measured(n: Int): (Long, Long, Long) = { // (rows, jobs, bestNanos)
      val df = Publisher.deliveredMessages(batch, subsOf(n))
      var rows = 0L
      var best = Long.MaxValue
      var jobs = 0L
      def drained(): Long = { // listener events post async: settle first
        var prev = -1L
        while (prev != jobCounter.get()) { prev = jobCounter.get(); Thread.sleep(150) }
        prev
      }
      (1 to 3).foreach { _ =>
        val j0 = drained()
        val t0 = System.nanoTime()
        rows = df.count()
        val dt = System.nanoTime() - t0
        jobs = drained() - j0
        best = math.min(best, dt)
      }
      (rows, jobs, best)
    }
    try {
      val (rows10, jobs10, t10) = measured(10)
      val (rows1000, jobs1000, t1000) = measured(1000)
      assert(rows1000 > rows10, "the 1,000-sub fanout should tag more rows")

      // ONE pass regardless of fleet size: the subscription count must
      // not change the job count, and the plan holds no joins and the
      // same three entity branches
      assert(jobs1000 === jobs10,
        s"job count grew with subscriptions: $jobs10 -> $jobs1000")
      val plan1000 = Publisher.deliveredMessages(batch, subsOf(1000))
        .queryExecution.executedPlan.toString
      assert(!plan1000.contains("Join"), "fanout must not join per subscription")
      val scans = "InMemoryTableScan".r.findAllIn(plan1000).size
      assert(scans <= 3, s"$scans cached-batch scans: more than one per entity tier")

      // 100× the subscriptions must cost FAR less than 100× the time;
      // generous margin keeps the assertion robust on a noisy harness
      assert(t1000 < t10 * 25,
        f"wall time not sublinear: 10 subs ${t10 / 1e6}%.1f ms, " +
          f"1000 subs ${t1000 / 1e6}%.1f ms")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      batch.unpersist()
      ()
    }
  }
}
