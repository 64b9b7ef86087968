package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.net.URI
import java.net.http.{HttpClient, WebSocket}
import java.util.concurrent.{CompletionStage, LinkedBlockingQueue, TimeUnit}

import graft.api.{WebSocketFrames, WsServer}
import graft.fixtures.EvmFixtures
import graft.schema.Model._

/** The /v1/ws tier end-to-end: RFC 6455 codec vectors, then a real
  * session — the JDK's websocket CLIENT (which masks frames per §5.3)
  * against our server — exercising the reference's subscription protocol
  * and ordered, predicate-filtered delivery. */
class WsServerSpec extends SparkSpec {
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

  test("accept key matches the RFC 6455 §1.3 worked example") {
    assert(WebSocketFrames.acceptKey("dGhlIHNhbXBsZSBub25jZQ==") ===
      "s3pPLMBiTxaQ9kYGzzhZRbK+xOo=")
  }

  test("frame codec: masked client frames and the 7/16-bit length ladder") {
    // a masked client frame built by hand: "hi" under mask 0x01020304
    val masked = Array[Byte](0x81.toByte, 0x82.toByte, 1, 2, 3, 4,
      ('h' ^ 1).toByte, ('i' ^ 2).toByte)
    val (op, payload) = WebSocketFrames.readFrame(
      new ByteArrayInputStream(masked)).get
    assert(op === WebSocketFrames.OpText && new String(payload) === "hi")

    // server-side write → read round-trip across both length encodings
    for (n <- Seq(5, 200, 70000)) {
      val out = new ByteArrayOutputStream()
      val text = "x" * n
      WebSocketFrames.writeText(out, text)
      val (o, p) = WebSocketFrames.readFrame(
        new ByteArrayInputStream(out.toByteArray)).get
      assert(o === WebSocketFrames.OpText && p.length === n && new String(p) === text)
    }
  }

  test("subscription session: confirmations, filtered ordered delivery, teardown") {
    val server = new WsServer()
    server.start()
    try {
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
      val ws = HttpClient.newHttpClient().newWebSocketBuilder()
        .buildAsync(URI.create(s"ws://127.0.0.1:${server.boundPort}/v1/ws"), listener)
        .join()
      def next(): String = {
        val m = received.poll(10, TimeUnit.SECONDS)
        assert(m != null, "timed out waiting for a ws message")
        m
      }
      def send(text: String): Unit = { ws.sendText(text, true).join(); () }

      // subscribe: block (unconditional), one pinned-from transaction
      // filter, and bare event — confirmations name the TOPIC
      send("""{"name":"block","type":"subscribe"}""")
      assert(next() === """{"code":1,"msg":"Subscribed to `block`"}""")
      val from10 = EvmFixtures.account(10) // = buildTx(10, 0).from; no tx of block 11 matches
      send(s"""{"name":"transaction/$from10/*","type":"subscribe"}""")
      assert(next() === """{"code":1,"msg":"Subscribed to `transaction`"}""")
      send("""{"name":"event","type":"subscribe"}""")
      assert(next() === """{"code":1,"msg":"Subscribed to `event`"}""")

      // one publish: both block docs, ONE tx doc (the pinned-from
      // predicate pruned the other three), all four events — in
      // (number, tier, seq, subseq) order
      server.publish(Seq(packed(10), packed(11)).toDF())
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val docs = (1 to 7).map(_ => mapper.readTree(next()))
      assert(docs(0).get("hash").asText() === EvmFixtures.blockHash(10))
      assert(docs(1).get("hash").asText() === EvmFixtures.txHash(10, 0)) // from = account(10)
      assert(docs(2).get("txhash").asText() === EvmFixtures.txHash(10, 0))
      assert(docs(3).get("txhash").asText() === EvmFixtures.txHash(10, 1))
      assert(docs(4).get("hash").asText() === EvmFixtures.blockHash(11))
      assert(docs(5).get("txhash").asText() === EvmFixtures.txHash(11, 0))
      assert(docs(6).get("txhash").asText() === EvmFixtures.txHash(11, 1))

      // unsubscribe block: the next publish delivers only the remaining
      // subscriptions (block 12's txs miss the pinned-from filter, its
      // two events match the bare event sub)
      send("""{"name":"block","type":"unsubscribe"}""")
      assert(next() === """{"code":1,"msg":"Unsubscribed from `block`"}""")
      server.publish(Seq(packed(12)).toDF())
      val after = (1 to 2).map(_ => mapper.readTree(next()))
      after.foreach(d => assert(d.get("origin") != null && d.get("hash") == null))

      // double-subscribe is a protocol violation: Bad Payload, then close
      send("""{"name":"event","type":"subscribe"}""")
      assert(next() === """{"code":0,"msg":"Bad Payload"}""")
    } finally server.stop()
  }

  test("ingest → publish-once gate → websocket: the full notification path") {
    val root = java.nio.file.Files.createTempDirectory("graft-wsingest").toString
    val server = new WsServer()
    server.start()
    try {
      val received = new LinkedBlockingQueue[String]()
      val ws = HttpClient.newHttpClient().newWebSocketBuilder()
        .buildAsync(URI.create(s"ws://127.0.0.1:${server.boundPort}/v1/ws"),
          new WebSocket.Listener {
            override def onText(w: WebSocket, data: CharSequence,
                last: Boolean): CompletionStage[_] = {
              received.add(data.toString); w.request(1); null
            }
          }).join()
      ws.sendText("""{"name":"block","type":"subscribe"}""", true).join()
      assert(received.poll(10, TimeUnit.SECONDS) ===
        """{"code":1,"msg":"Subscribed to `block`"}""")

      // the ingest job publishes through the S9 gate into the ws fanout —
      // the reference's store → Redis → websocket path in one wiring
      val store = new graft.ingest.BlockStore(spark, s"$root/store")
      val job = new graft.streaming.IngestJob(spark, store,
        confirmations = 5, onPublish = server.publish)
      val stream = spark.readStream
        .format(classOf[graft.streaming.ChainSimSource].getName)
        .option("blocksPerBatch", "10").option("maxNumber", "30")
        .load()
        .select(org.apache.spark.sql.functions.from_json(
          org.apache.spark.sql.functions.col("value"),
          graft.schema.Schemas.packedBlock).as("p"))
        .select("p.*")
      val query = job.start(stream, s"$root/ckpt")
      try query.processAllAvailable() finally query.stop()

      val expected = (0L to 30L).filterNot(EvmFixtures.isGap)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val got = expected.indices.map { _ =>
        mapper.readTree(received.poll(10, TimeUnit.SECONDS)).get("number").asLong()
      }
      // every present block published exactly once, in order
      assert(got === expected)
      assert(received.poll(500, TimeUnit.MILLISECONDS) === null)
    } finally server.stop()
  }

  test("grammar violations are Bad Payload (subscription.go:213-253)") {
    val server = new WsServer()
    server.start()
    try {
      val received = new LinkedBlockingQueue[String]()
      val ws = HttpClient.newHttpClient().newWebSocketBuilder()
        .buildAsync(URI.create(s"ws://127.0.0.1:${server.boundPort}/v1/ws"),
          new WebSocket.Listener {
            override def onText(w: WebSocket, data: CharSequence,
                last: Boolean): CompletionStage[_] = {
              received.add(data.toString); w.request(1); null
            }
          }).join()
      ws.sendText("""{"name":"blocks-and-things","type":"subscribe"}""", true).join()
      assert(received.poll(10, TimeUnit.SECONDS) ===
        """{"code":0,"msg":"Bad Payload"}""")
    } finally server.stop()
  }
}
