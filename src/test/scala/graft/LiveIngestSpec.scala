package graft

import java.io.BufferedInputStream
import java.net.{InetSocketAddress, ServerSocket, URI}
import java.net.http.{HttpClient, WebSocket}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.concurrent.{CompletionStage, LinkedBlockingQueue, TimeUnit}

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._

import graft.api.{WebSocketFrames, WsServer}
import graft.ingest.BlockStore
import graft.schema.{Model, Schemas}
import graft.streaming.{BlockFetcher, ChainSimSource, IngestJob, JsonRpc, WsTransport}

/** The WHOLE live loop in one spec — the path the reference's demo
  * scripts exercise by hand (reference `demo/` shell scripts): a node
  * sim served over REAL
  * transports (heads by `eth_subscribe newHeads` over websocket, bodies
  * by JSON-RPC over HTTP), the DSv2 stream selecting that connector via
  * the `fetcher=ws:…|…` OPTION, streaming ingest into the store with the
  * publish-once gate, and ordered fanout to a live websocket subscriber
  * — then the chain ADVANCES and the loop does it again incrementally.
  * Every hop is the production code path; only the node is simulated.
  */
class LiveIngestSpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  /** In-process node, HTTP half: the three JSON-RPC methods the
    * connector issues, over the deterministic sim chain (gaps → null). */
  private final class HttpNode(maxNumber: Long) {
    private val byNumber: Map[Long, Model.PackedBlock] =
      (0L to maxNumber).flatMap(n => ChainSimSource.fetchBlock(n).map(n -> _)).toMap
    private val receiptByTx: Map[String, Model.PackedTransaction] =
      byNumber.values.flatMap(_.transactions.map(pt => pt.tx.hash -> pt)).toMap
    val server: HttpServer = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val req = mapper.readTree(new String(ex.getRequestBody.readAllBytes(), UTF_8))
      val id = req.get("id").asLong()
      val resp = (req.get("method").asText() match {
        case "eth_blockNumber" => JsonRpc.encodeHead(id, maxNumber)
        case "eth_getBlockByNumber" =>
          val n = JsonRpc.parseQuantityLong(req.get("params").get(0).asText())
          byNumber.get(n).map(JsonRpc.encodeBlock(id, _))
            .getOrElse(JsonRpc.encodeNull(id))
        case "eth_getTransactionReceipt" =>
          receiptByTx.get(req.get("params").get(0).asText())
            .map(JsonRpc.encodeReceipt(id, _)).getOrElse(JsonRpc.encodeNull(id))
        case other =>
          s"""{"jsonrpc":"2.0","id":$id,"error":{"code":-32601,"message":"$other"}}"""
      }).getBytes(UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, resp.length)
      ex.getResponseBody.write(resp)
      ex.close()
    })
    server.start()
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  /** In-process node, websocket half: one subscriber, heads pushed on
    * demand (a STAGED chain tip, unlike WsTransportSpec's fixed replay),
    * so the spec can advance the chain mid-stream. */
  private final class WsHeadNode {
    private val server = new ServerSocket(0)
    private val queue = new LinkedBlockingQueue[java.lang.Long]()
    @volatile private var closed = false
    def port: Int = server.getLocalPort
    def push(head: Long): Unit = { queue.add(head); () }
    def stop(): Unit = { closed = true; try server.close() catch { case _: Exception => () } }

    private val thread = new Thread(() => {
      try {
        val s = server.accept()
        val in = new BufferedInputStream(s.getInputStream)
        val out = s.getOutputStream
        def readLine(): String = {
          val sb = new StringBuilder
          var b = in.read()
          while (b >= 0 && b != '\n') { if (b != '\r') sb.append(b.toChar); b = in.read() }
          sb.toString
        }
        val lines = Iterator.continually(readLine()).takeWhile(_.nonEmpty).toVector
        val key = lines.collectFirst {
          case l if l.toLowerCase.startsWith("sec-websocket-key:") =>
            l.substring(l.indexOf(':') + 1).trim
        }.get
        out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
          "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
          s"Sec-WebSocket-Accept: ${WebSocketFrames.acceptKey(key)}\r\n\r\n").getBytes(UTF_8))
        out.flush()
        WebSocketFrames.readFrame(in) // the masked eth_subscribe request
        WebSocketFrames.writeText(out, JsonRpc.subscribeResponse(1L, "0xlive"))
        while (!closed) {
          val h = queue.poll(100, TimeUnit.MILLISECONDS)
          if (h != null)
            WebSocketFrames.writeText(out,
              JsonRpc.newHeadNotification("0xlive", h.longValue, s"0xh$h"))
        }
        s.close()
      } catch { case _: Exception => () }
    }, "ws-head-node")
    thread.setDaemon(true)
    thread.start()
  }

  test("live loop: ws heads + http bodies → streaming ingest → store → ws fanout, " +
      "across a chain advance") {
    val httpNode = new HttpNode(maxNumber = 60)
    val wsNode = new WsHeadNode
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
    } finally {
      query.stop()
      client.abort()
      fanout.stop()
      wsNode.stop()
      httpNode.stop()
      WsTransport.resetSubscriber("127.0.0.1", wsNode.port, "/")
    }
  }
}
