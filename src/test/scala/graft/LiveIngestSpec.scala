package graft

import java.net.URI
import java.net.http.{HttpClient, WebSocket}
import java.nio.file.Files
import java.util.concurrent.{CompletionStage, LinkedBlockingQueue, TimeUnit}

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._

import graft.api.WsServer
import graft.ingest.BlockStore
import graft.schema.Schemas
import graft.streaming.{BlockFetcher, ChainSimSource, IngestJob, WsTransport}

/** The WHOLE live loop in one spec — the path the reference's demo
  * scripts exercise by hand (reference `demo/` shell scripts): a node
  * sim served over REAL
  * transports (heads by `eth_subscribe newHeads` over websocket, bodies
  * by JSON-RPC over HTTP), the DSv2 stream selecting that connector via
  * the `fetcher=ws:…|…` OPTION, streaming ingest into the store with the
  * publish-once gate, and ordered fanout to a live websocket subscriber
  * — then the chain ADVANCES and the loop does it again incrementally.
  * Every hop is the production code path; only the node is simulated
  * ([[FakeNode]] — shared with [[ServeSpec]]).
  */
class LiveIngestSpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  test("live loop: ws heads + http bodies → streaming ingest → store → ws fanout, " +
      "across a chain advance and a same-height reorg") {
    val httpNode = new FakeNode.HttpNode(maxNumber = 60)
    val wsNode = new FakeNode.WsHeadNode
    val fanout = new WsServer()
    fanout.start()
    val fetcherOpt =
      s"ws:ws://127.0.0.1:${wsNode.port}/|http://127.0.0.1:${httpNode.port}/"
    // the probe shares the one-per-endpoint subscription with the stream
    val probe = BlockFetcher.forOption(fetcherOpt, maxNumber = 0L)
    def awaitHead(target: Long): Unit = {
      val deadline = System.nanoTime() + 10e9.toLong
      while (probe.head() < target) {
        assert(System.nanoTime() < deadline, s"head never reached $target")
        Thread.sleep(20)
      }
    }

    // a live downstream subscriber on OUR ws tier, before any publish
    val received = new LinkedBlockingQueue[String]()
    val listener = new WebSocket.Listener {
      private val sb = new StringBuilder
      override def onText(ws: WebSocket, data: CharSequence,
          last: Boolean): CompletionStage[_] = {
        sb.append(data)
        if (last) { received.add(sb.toString); sb.clear() }
        ws.request(1)
        null
      }
    }
    val client = HttpClient.newHttpClient().newWebSocketBuilder()
      .buildAsync(URI.create(s"ws://127.0.0.1:${fanout.boundPort}/v1/ws"), listener)
      .join()
    client.sendText("""{"name":"block","type":"subscribe"}""", true).join()
    assert(received.poll(10, TimeUnit.SECONDS) ==
      """{"code":1,"msg":"Subscribed to `block`"}""")

    val root = Files.createTempDirectory("graft-live").toString
    val store = new BlockStore(spark, s"$root/store")
    val published = new scala.collection.mutable.ArrayBuffer[Long]()
    val job = new IngestJob(spark, store, confirmations = 2,
      onPublish = { df =>
        val nums = graft.ingest.PackedBlocks.blocksOf(df).select("number")
          .collect().map(_.getLong(0)).sorted
        published.synchronized { published ++= nums; () }
        fanout.publish(df)
      })
    val stream = spark.readStream
      .format(classOf[ChainSimSource].getName)
      .option("blocksPerBatch", "25")
      .option("maxNumber", "60") // ignored by the ws fetcher: head is live
      .option("fetcher", fetcherOpt)
      .load()
      .select(from_json(col("value"), Schemas.packedBlock).as("p"))
      .select("p.*")

    wsNode.push(30L) // stage 1: chain tip at 30
    awaitHead(30L)
    val query = job.start(stream, s"$root/checkpoint")
    try {
      query.processAllAvailable()
      def stored(): Set[Long] = store.view("blocks").select("number")
        .collect().map(_.getLong(0)).toSet
      val want1 = (0L to 30L).filterNot(graft.fixtures.EvmFixtures.isGap).toSet
      assert(stored() == want1, "stage-1 store mismatch")

      // stage 2: the chain advances while the query is live
      wsNode.push(60L)
      awaitHead(60L)
      query.processAllAvailable()
      val want2 = (0L to 60L).filterNot(graft.fixtures.EvmFixtures.isGap).toSet
      assert(stored() == want2, "stage-2 store mismatch")

      // fanout closed the loop: exactly the published blocks arrived at
      // the subscriber, in publish order, each exactly once
      val pubs = published.synchronized { published.toVector }
      assert(pubs.nonEmpty, "nothing was published")
      val got = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (got.size < pubs.size) {
        val m = received.poll(10, TimeUnit.SECONDS)
        assert(m != null, s"subscriber got ${got.size} of ${pubs.size} blocks")
        val n = mapper.readTree(m)
        if (n.has("number")) got += n.get("number").asLong()
      }
      assert(got.toVector == pubs, "fanout order/content diverged from publish order")
      assert(received.poll(300, TimeUnit.MILLISECONDS) == null,
        "subscriber received more frames than were published")

      // stage 3: SAME-HEIGHT REORG over the live listener — the node
      // replaces block 59 (above the confirmation watermark 58) and
      // re-announces height 59: a repeated number is the reorg signal
      // (listener.go:49-73). The subscriber logs it, the next micro-batch
      // refetches the height, and last-writer-wins in the hot tier swaps
      // the block in — WITHOUT waiting for any head advance.
      val replaced = httpNode.reorg(59L)
      wsNode.push(59L, replaced.block.hash)
      val deadline = System.nanoTime() + 10e9.toLong
      while (probe.reorgs().isEmpty) {
        assert(System.nanoTime() < deadline, "reorg signal never logged")
        Thread.sleep(20)
      }
      query.processAllAvailable()
      val hashAt59 = store.view("blocks").filter(col("number") === 59L)
        .select("hash").collect().map(_.getString(0)).toSeq
      assert(hashAt59 == Seq(replaced.block.hash),
        s"hot tier still serves the stale block: $hashAt59")
      // the replacement's transactions re-anchored too (cascade replace)
      val txAnchors = store.view("transactions")
        .join(store.view("blocks").filter(col("number") === 59L)
          .select(col("hash").as("bh")), col("blockhash") === col("bh"), "left_semi")
        .count()
      assert(txAnchors == replaced.transactions.size.toLong)
    } finally {
      query.stop()
      client.abort()
      fanout.stop()
      wsNode.stop()
      httpNode.stop()
      WsTransport.resetSubscriber("127.0.0.1", wsNode.port, "/")
    }
  }

  test("live ingest over wss: TLS heads (self-signed node) + http bodies → store") {
    val (serverCtx, clientCtx) = FakeNode.makeTls()
    val httpNode = new FakeNode.HttpNode(maxNumber = 20)
    val wsNode = new FakeNode.WsHeadNode(
      serverCtx.getServerSocketFactory.createServerSocket(0))
    WsTransport.setSslContext(Some(clientCtx))
    val fetcherOpt =
      s"ws:wss://127.0.0.1:${wsNode.port}/|http://127.0.0.1:${httpNode.port}/"
    val probe = streaming.BlockFetcher.forOption(fetcherOpt, maxNumber = 0L)
    val root = Files.createTempDirectory("graft-wss").toString
    val store = new BlockStore(spark, s"$root/store")
    val job = new IngestJob(spark, store, confirmations = 2)
    val stream = spark.readStream
      .format(classOf[ChainSimSource].getName)
      .option("blocksPerBatch", "10")
      .option("maxNumber", "20")
      .option("fetcher", fetcherOpt)
      .load()
      .select(from_json(col("value"), Schemas.packedBlock).as("p"))
      .select("p.*")
    wsNode.push(20L)
    val deadline = System.nanoTime() + 10e9.toLong
    while (probe.head() < 20L) {
      assert(System.nanoTime() < deadline, "head never arrived over TLS")
      Thread.sleep(20)
    }
    val query = job.start(stream, s"$root/checkpoint")
    try {
      query.processAllAvailable()
      val stored = store.view("blocks").select("number")
        .collect().map(_.getLong(0)).toSet
      assert(stored == (0L to 20L).filterNot(graft.fixtures.EvmFixtures.isGap).toSet)
    } finally {
      query.stop()
      wsNode.stop()
      httpNode.stop()
      WsTransport.resetSubscriber("127.0.0.1", wsNode.port, "/", tls = true)
      WsTransport.setSslContext(None)
    }
  }
}
