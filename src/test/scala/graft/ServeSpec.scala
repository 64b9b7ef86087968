package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse, WebSocket}
import java.nio.file.Files
import java.util.concurrent.{CompletionStage, LinkedBlockingQueue, TimeUnit}

import com.fasterxml.jackson.databind.ObjectMapper

import graft.streaming.WsTransport

/** The composed deployment ([[Serve]]) end-to-end — the `app.Run` analog
  * booted as ONE call against the in-repo fake node: live ws heads +
  * JSON-RPC bodies in, streaming ingest + confirmation watermark in the
  * middle, REST + GraphQL + ws fanout out. The spec drives the whole
  * process lifecycle the way the reference's demo scripts drive a
  * running indexer: subscribe, advance the chain, query over HTTP,
  * replay a reorg, check the store healed, shut down. */
class ServeSpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private lazy val http = HttpClient.newHttpClient()

  private def get(port: Int, pathAndQuery: String): (Int, String) = {
    val req = HttpRequest.newBuilder(
      URI.create(s"http://127.0.0.1:$port$pathAndQuery")).GET().build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test(".env config honors the reference's key names and defaults") {
    val cfg = Serve.Config.fromEnv(Serve.parseEnv(
      """# comment
        |RPCUrl=http://node:8545
        |WebsocketUrl=ws://node:8546/
        |PORT=7001
        |BlockConfirmations=12
        |BlockRange=25
        |TimeRange=600
        |ConcurrencyFactor=10
        |Production=yes
        |StoreRoot=/tmp/x
        |""".stripMargin))
    assert(cfg.rpcUrl === "http://node:8545")
    assert(cfg.port === 7001)
    assert(cfg.blockConfirmations === 12L)
    assert(cfg.blockRange === 25L)
    assert(cfg.timeRange === 600L)
    assert(cfg.production)
    assert(cfg.fetcherOption === "ws:ws://node:8546/|http://node:8545")
    // ConcurrencyFactor=10 → finer slices → more parallel fetch tasks
    assert(cfg.sliceBlocks === 5L)
    // defaults mirror .env.example / config.go
    val dflt = Serve.Config.fromEnv(Map.empty)
    assert(dflt.port === 7000 && dflt.blockRange === 100L &&
      dflt.timeRange === 3600L && dflt.concurrencyFactor === 5L)
    assert(dflt.fetcherOption === "sim")
    val rpcOnly = Serve.Config.fromEnv(Map("RPCUrl" -> "http://n:1"))
    assert(rpcOnly.fetcherOption === "rpc:http://n:1")
  }

  test("serve boots the full stack: live ingest incl. reorg, REST answers, " +
      "ws fanout notifies") {
    val httpNode = new FakeNode.HttpNode(maxNumber = 44)
    val wsNode = new FakeNode.WsHeadNode
    val root = Files.createTempDirectory("graft-serve").toString
    val cfg = Serve.Config(
      fetcherOverride =
        s"ws:ws://127.0.0.1:${wsNode.port}/|http://127.0.0.1:${httpNode.port}/",
      storeRoot = root,
      port = 0, wsPort = 0, // ephemeral: the spec reads the bound ports
      blockConfirmations = 2L,
      maxNumber = 44L)
    val running = Serve.run(spark, cfg)
    try {
      // downstream ws subscriber through the running fanout tier
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
        .buildAsync(URI.create(s"ws://127.0.0.1:${running.wsPort}/v1/ws"), listener)
        .join()
      client.sendText("""{"name":"block","type":"subscribe"}""", true).join()
      assert(received.poll(10, TimeUnit.SECONDS) ==
        """{"code":1,"msg":"Subscribed to `block`"}""")

      // chain advances; the deployment ingests without any manual wiring
      wsNode.push(40L)
      val deadline = System.nanoTime() + 10e9.toLong
      while (running.job.latest.get() < 40L) {
        assert(System.nanoTime() < deadline, "serve never ingested to the tip")
        running.query.processAllAvailable()
        Thread.sleep(20)
      }
      running.query.processAllAvailable()

      // REST answers over the LIVE store (by-name QueryService re-resolve)
      val b7 = graft.fixtures.EvmFixtures.buildBlock(7,
        graft.fixtures.EvmFixtures.txCount(7L))
      val (c1, body1) = get(running.restPort, "/v1/block?number=7")
      assert(c1 === 200, body1)
      assert(mapper.readTree(body1).get("hash").asText() === b7.hash)

      val (c2, body2) = get(running.restPort, "/v1/synced")
      assert(c2 === 200)
      val synced = mapper.readTree(body2)
      assert(synced.get("processed").asLong() > 0L,
        s"observe()-fed insert counter never advanced: $body2")
      assert(Set("syncing", "synced").contains(synced.get("status").asText()))

      // GraphQL rides the same deployment
      val gql = HttpRequest.newBuilder(
        URI.create(s"http://127.0.0.1:${running.restPort}/v1/graphql"))
        .POST(HttpRequest.BodyPublishers.ofString(
          """{"query":"{ blockByNumber(number: \"7\") { hash number } }"}"""))
        .header("Content-Type", "application/json").build()
      val gresp = http.send(gql, HttpResponse.BodyHandlers.ofString())
      assert(gresp.statusCode() === 200)
      assert(mapper.readTree(gresp.body()).path("data").path("blockByNumber")
        .path("hash").asText() === b7.hash)

      // the fanout tier delivered the ingested blocks to our subscriber
      var delivered = 0
      var drained = false
      while (!drained) {
        val m = received.poll(2, TimeUnit.SECONDS)
        if (m == null) drained = true
        else if (mapper.readTree(m).has("number")) delivered += 1
      }
      assert(delivered > 0, "no block notifications reached the ws subscriber")

      // live reorg: replace block 39 (above watermark 38) and
      // re-announce its height — the repeated number is the signal
      val replaced = httpNode.reorg(39L)
      wsNode.push(39L, replaced.block.hash)
      val d2 = System.nanoTime() + 10e9.toLong
      var healed = false
      while (!healed) {
        assert(System.nanoTime() < d2, "reorg never reflected in the store")
        running.query.processAllAvailable()
        val (c, body) = get(running.restPort, "/v1/block?number=39")
        healed = c == 200 && mapper.readTree(body).get("hash").asText() == replaced.block.hash
        if (!healed) Thread.sleep(20)
      }

      // maintenance under load: a long-running deployment accumulates one
      // confirmed segment per promoting micro-batch. Advance the chain so
      // a SECOND promote appends a second segment, then compact + vacuum
      // each table WHILE the stream is live, and prove the query surface
      // still answers and ingest still runs over the compacted tier.
      wsNode.push(42L)
      val dSeg = System.nanoTime() + 10e9.toLong
      while (running.store.listSegments("blocks").length < 2) {
        assert(System.nanoTime() < dSeg,
          "second promote never appended a segment")
        running.query.processAllAvailable()
        Thread.sleep(20)
      }
      for (t <- Seq("blocks", "transactions", "events")) {
        running.store.compactConfirmed(t, rowGroupBytes = 64L * 1024)
        running.store.vacuumConfirmed(t, graceMs = 0L)
      }
      assert(running.store.listSegments("blocks").length === 1,
        "compaction did not fold the confirmed tier")
      val (cm, bodyM) = get(running.restPort, "/v1/block?number=7")
      assert(cm === 200, bodyM)
      assert(mapper.readTree(bodyM).get("hash").asText() === b7.hash,
        "query surface broke after compaction under a live stream")
      // the stream keeps ingesting over the compacted store
      wsNode.push(44L)
      val d3 = System.nanoTime() + 10e9.toLong
      var caught = false
      val b44 = graft.fixtures.EvmFixtures.buildBlock(44,
        graft.fixtures.EvmFixtures.txCount(44L))
      while (!caught) {
        assert(System.nanoTime() < d3,
          "post-compaction ingest never reflected in the store")
        running.query.processAllAvailable()
        val (c, body) = get(running.restPort, "/v1/block?number=44")
        caught = c == 200 && mapper.readTree(body).get("hash").asText() == b44.hash
        if (!caught) Thread.sleep(20)
      }

      client.abort()
    } finally {
      running.stop()
      wsNode.stop()
      httpNode.stop()
      WsTransport.resetSubscriber("127.0.0.1", wsNode.port, "/")
    }
  }
}
