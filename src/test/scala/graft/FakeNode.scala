package graft

import java.io.BufferedInputStream
import java.net.{InetSocketAddress, ServerSocket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{LinkedBlockingQueue, TimeUnit}

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.api.WebSocketFrames
import graft.schema.Model
import graft.streaming.{ChainSimSource, JsonRpc}

/** The in-process fake node shared by [[LiveIngestSpec]] and
  * [[ServeSpec]]: the deterministic sim chain served over REAL
  * transports — JSON-RPC over HTTP for bodies, `eth_subscribe newHeads`
  * over a raw RFC 6455 websocket for heads — plus a REORG control:
  * [[HttpNode.reorg]] swaps in a replacement block (new hash, same
  * height) and [[WsHeadNode.push]] can then announce that same height
  * again, the reference's repeated-number reorg signal
  * (`app/block/listener.go:49-73`). */
object FakeNode {

  private val mapper = new ObjectMapper()

  /** HTTP half: the three JSON-RPC methods the connector issues, over
    * the deterministic sim chain (gaps → null). Thread-safe mutable
    * overrides model a reorged chain. */
  final class HttpNode(maxNumber: Long) {
    private val overrides =
      new java.util.concurrent.ConcurrentHashMap[Long, Model.PackedBlock]()

    private def blockAt(n: Long): Option[Model.PackedBlock] =
      Option(overrides.get(n)).orElse(ChainSimSource.fetchBlock(n))

    /** Install a replacement for height `n` — same height and parent,
      * different hash (txs/events re-anchored to it) — and return it.
      * Subsequent `eth_getBlockByNumber` calls serve the replacement. */
    def reorg(n: Long): Model.PackedBlock = {
      val base = ChainSimSource.fetchBlock(n).getOrElse(
        throw new IllegalArgumentException(s"cannot reorg gap height $n"))
      val newHash = f"0x${"d" * 8}$n%056x"
      val packed = Model.PackedBlock(
        base.block.copy(hash = newHash),
        base.transactions.map(pt => Model.PackedTransaction(
          pt.tx.copy(blockhash = newHash),
          pt.events.map(_.copy(blockhash = newHash)))))
      overrides.put(n, packed)
      packed
    }

    val server: HttpServer = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val req = mapper.readTree(new String(ex.getRequestBody.readAllBytes(), UTF_8))
      val id = req.get("id").asLong()
      val resp = (req.get("method").asText() match {
        case "eth_blockNumber" => JsonRpc.encodeHead(id, maxNumber)
        case "eth_getBlockByNumber" =>
          val n = JsonRpc.parseQuantityLong(req.get("params").get(0).asText())
          blockAt(n).map(JsonRpc.encodeBlock(id, _)).getOrElse(JsonRpc.encodeNull(id))
        case "eth_getTransactionReceipt" =>
          val h = req.get("params").get(0).asText()
          (0L to maxNumber).iterator.flatMap(blockAt)
            .flatMap(_.transactions).find(_.tx.hash == h)
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

  /** Websocket half: one subscriber, heads pushed on demand (a STAGED
    * chain tip), so a spec can advance — or REORG — the chain
    * mid-stream. */
  final class WsHeadNode {
    private val server = new ServerSocket(0)
    private val queue = new LinkedBlockingQueue[(Long, String)]()
    @volatile private var closed = false
    def port: Int = server.getLocalPort
    /** Announce `head` with its sim-chain hash. */
    def push(head: Long): Unit = { queue.add(head -> s"0xh$head"); () }
    /** Announce `head` with an explicit hash — a repeat of an
      * already-seen height with a NEW hash is the reorg signal. */
    def push(head: Long, hash: String): Unit = { queue.add(head -> hash); () }
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
              JsonRpc.newHeadNotification("0xlive", h._1, h._2))
        }
        s.close()
      } catch { case _: Exception => () }
    }, "ws-head-node")
    thread.setDaemon(true)
    thread.start()
  }
}
