package graft.api

import java.io.BufferedInputStream
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.DataFrame

import graft.streaming.{Publisher, SubscriptionFilter}

/** The `/v1/ws` tier: RFC 6455 over a raw ServerSocket (the JDK has a
  * websocket CLIENT but no server; [[WebSocketFrames]] implements the
  * wire protocol from the public spec) speaking the reference's
  * subscription protocol (`app/rest/rest.go:762-860`,
  * `app/pubsub/subscription.go`):
  *
  *  - requests are JSON text frames `{"name":…,"type":…}`; `name` obeys
  *    the ST12 grammar ([[SubscriptionFilter.parse]]), `type` is
  *    subscribe/unsubscribe
  *  - subscribe on an already-held name, unsubscribe on an unheld one,
  *    or any grammar violation → `{"code":0,"msg":"Bad Payload"}` and
  *    the connection closes (rest.go:838-852 breaks its read loop)
  *  - confirmations are `{"code":1,"msg":"Subscribed to `<topic>`"}` /
  *    `"Unsubscribed from `<topic>`"` on the TOPIC (block/transaction/
  *    event), as the reference's consumers send
  *
  * Delivery: [[publish]] drains one packed-block batch through
  * [[Publisher.deliveredMessages]] — ONE Spark pass tags every ordered
  * message with the matching subscriber ids (ST11 predicates compiled
  * over all connections' subscriptions together) — then writes each
  * payload to its takers in (number, tier, seq, subseq) order, the S8
  * contract. Per-connection writes serialize on a lock (the reference's
  * ConnLock). The collect is bounded by batch size × fanout, the same
  * volume the reference pushes through Redis per block. */
final class WsServer(port: Int = 0) {

  private val mapper = new ObjectMapper()
  private val server = new ServerSocket(port)
  private val connections = new ConcurrentHashMap[Long, Conn]()
  private val ids = new AtomicLong(0L)
  @volatile private var running = false

  def boundPort: Int = server.getLocalPort

  def start(): Unit = {
    running = true
    val acceptor = new Thread(() => {
      while (running) {
        try {
          val socket = server.accept()
          val conn = new Conn(ids.incrementAndGet(), socket)
          connections.put(conn.id, conn)
          val t = new Thread(() => conn.run(), s"ws-conn-${conn.id}")
          t.setDaemon(true)
          t.start()
        } catch { case _: Exception => /* socket closed on stop() */ }
      }
    }, "ws-acceptor")
    acceptor.setDaemon(true)
    acceptor.start()
  }

  def stop(): Unit = {
    running = false
    connections.values().asScala.foreach(_.close())
    server.close()
  }

  /** Fan one packed-block batch out to every live subscription. */
  def publish(packed: DataFrame): Unit = {
    val subs: Seq[(String, SubscriptionFilter.Subscription)] =
      connections.values().asScala.toSeq.flatMap(c =>
        c.subscriptions.asScala.toSeq.map { case (name, sub) =>
          s"${c.id}#$name" -> sub
        })
    if (subs.isEmpty) return
    // Driver-side collect is BOUNDED by the match set, not the batch:
    // deliveredMessages returns only (payload, subscriber-ids) rows that
    // matched at least one live subscription — per micro-batch that is
    // O(matched msgs × avg fanout), the same shape as the reference's
    // Redis pub/sub consumer (app/pubsub/*.go), which also materializes
    // each deliverable message in the API tier before socket writes.
    Publisher.deliveredMessages(packed, subs)
      .select("payload", "subscribers").collect()
      .foreach { row =>
        val payload = row.getString(0)
        row.getSeq[String](1).foreach { id =>
          val connId = id.takeWhile(_ != '#').toLong
          Option(connections.get(connId)).foreach(_.send(payload))
        }
      }
  }

  private final class Conn(val id: Long, socket: Socket) {
    val subscriptions = new ConcurrentHashMap[String, SubscriptionFilter.Subscription]()
    private val in = new BufferedInputStream(socket.getInputStream)
    private val out = socket.getOutputStream
    private val writeLock = new Object

    def send(text: String): Unit = writeLock.synchronized {
      try WebSocketFrames.writeText(out, text)
      catch { case _: Exception => close() }
    }

    def close(): Unit = {
      connections.remove(id)
      try socket.close() catch { case _: Exception => }
    }

    def run(): Unit =
      try { if (handshake()) loop() }
      catch { case _: Exception => }
      finally close()

    /** HTTP upgrade: GET /v1/ws with Sec-WebSocket-Key → 101 with the
      * §4.2.2 accept key; anything else → 400 and close. */
    private def handshake(): Boolean = {
      val lines = Iterator.continually(readLine())
        .takeWhile(l => l != null && l.nonEmpty).toVector
      val ok = lines.headOption.exists(_.startsWith("GET /v1/ws"))
      val key = lines.collectFirst {
        case l if l.toLowerCase.startsWith("sec-websocket-key:") =>
          l.substring(l.indexOf(':') + 1).trim
      }
      (ok, key) match {
        case (true, Some(k)) =>
          out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
            "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
            s"Sec-WebSocket-Accept: ${WebSocketFrames.acceptKey(k)}\r\n\r\n").getBytes(UTF_8))
          out.flush()
          true
        case _ =>
          out.write("HTTP/1.1 400 Bad Request\r\n\r\n".getBytes(UTF_8))
          out.flush()
          false
      }
    }

    private def readLine(): String = {
      val sb = new StringBuilder
      var b = in.read()
      while (b >= 0 && b != '\n') {
        if (b != '\r') sb.append(b.toChar)
        b = in.read()
      }
      if (b < 0 && sb.isEmpty) null else sb.toString
    }

    /** rest.go:823-859: read → validate → subscribe/unsubscribe, break
      * (and close) on the first bad payload. */
    private def loop(): Unit = {
      var live = true
      while (live) {
        WebSocketFrames.readFrame(in) match {
          case None => live = false
          case Some((WebSocketFrames.OpClose, _)) =>
            writeLock.synchronized {
              WebSocketFrames.writeFrame(out, WebSocketFrames.OpClose, Array.empty)
            }
            live = false
          case Some((WebSocketFrames.OpPing, p)) =>
            writeLock.synchronized {
              WebSocketFrames.writeFrame(out, WebSocketFrames.OpPong, p)
            }
          case Some((WebSocketFrames.OpText, p)) =>
            if (!handleRequest(new String(p, UTF_8))) live = false
          case Some(_) => // binary/continuation: not in the protocol, skip
        }
      }
    }

    private def handleRequest(text: String): Boolean = {
      val (name, reqType) =
        try {
          val node = mapper.readTree(text)
          (if (node.hasNonNull("name")) node.get("name").asText() else "",
            if (node.hasNonNull("type")) node.get("type").asText() else "")
        } catch { case _: Exception => ("", "") }
      val parsed = SubscriptionFilter.parse(name)
      val topic = name.takeWhile(_ != '/')
      val held = subscriptions.containsKey(name)
      (reqType, parsed) match {
        case ("subscribe", Some(sub)) if !held =>
          subscriptions.put(name, sub)
          send(s"""{"code":1,"msg":"Subscribed to `$topic`"}""")
          true
        case ("unsubscribe", Some(_)) if held =>
          subscriptions.remove(name)
          send(s"""{"code":1,"msg":"Unsubscribed from `$topic`"}""")
          true
        case _ => // bad grammar, double subscribe, unknown unsubscribe
          send("""{"code":0,"msg":"Bad Payload"}""")
          false
      }
    }
  }
}
