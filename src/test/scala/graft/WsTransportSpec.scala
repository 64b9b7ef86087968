package graft

import java.io.BufferedInputStream
import java.net.ServerSocket
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.CountDownLatch

import org.scalatest.funsuite.AnyFunSuite

import graft.api.WebSocketFrames
import graft.streaming.{JsonRpc, WsTransport}

/** The websocket CLIENT transport: handshake with accept-key
  * verification, mandatory §5.3 masking, the eth_subscribe protocol,
  * and the subscription-fed head counter behind the BlockFetcher seam.
  * The peer is a fake node speaking the SERVER side of RFC 6455 through
  * the same frame codec the WsServer uses — so the two halves of the
  * implementation check each other over a real TCP socket. */
class WsTransportSpec extends AnyFunSuite {

  /** A one-connection fake Ethereum node: upgrades, answers
    * eth_subscribe, pushes the given heads, pings once, then closes.
    * Records whether every client frame arrived masked. */
  private final class FakeNode(heads: Seq[Long], bindPort: Int = 0,
      rst: Boolean = false) {
    val server = new ServerSocket(bindPort)
    def port: Int = server.getLocalPort
    @volatile var sawUnmasked = false
    @volatile var subscribeText: String = null
    val served = new CountDownLatch(1)

    val thread = new Thread(() => {
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
        // the subscribe request — §5.3: MUST be masked (bit 7 of byte 1)
        val b0 = in.read(); val b1 = in.read()
        if ((b1 & 0x80) == 0) sawUnmasked = true
        var len = b1 & 0x7F
        if (len == 126) len = (in.read() << 8) | in.read()
        val mask = Array.fill(4)(in.read().toByte)
        val payload = in.readNBytes(len)
        (0 until len).foreach(i => payload(i) = (payload(i) ^ mask(i % 4)).toByte)
        require((b0 & 0x0F) == WebSocketFrames.OpText)
        subscribeText = new String(payload, UTF_8)
        WebSocketFrames.writeText(out, JsonRpc.subscribeResponse(1L, "0xsub1"))
        for (h <- heads)
          WebSocketFrames.writeText(out,
            JsonRpc.newHeadNotification("0xsub1", h, s"0xhash$h"))
        if (rst) {
          served.countDown()
          Thread.sleep(300) // let the client drain the pushed heads
          s.setSoLinger(true, 0) // hard kill: TCP RST, no close frame
          s.close()
        } else {
          // a server ping mid-stream: the client must answer (masked)
          WebSocketFrames.writeFrame(out, WebSocketFrames.OpPing, "hb".getBytes(UTF_8))
          WebSocketFrames.readFrame(in) match {
            case Some((op, p)) =>
              require(op == WebSocketFrames.OpPong && new String(p, UTF_8) == "hb",
                s"expected pong hb, got $op")
            case None => ()
          }
          served.countDown()
          // hold the socket open briefly so the client drains all heads
          Thread.sleep(300)
          WebSocketFrames.writeFrame(out, WebSocketFrames.OpClose, Array.empty)
          s.close()
        }
      } catch { case _: Exception => () }
      finally server.close()
    }, "fake-eth-node")
    thread.setDaemon(true)
    thread.start()
  }

  test("subscription codec: construct -> parse identity, foreign frames ignored") {
    assert(JsonRpc.parseSubscriptionId(JsonRpc.subscribeResponse(7L, "0xab")) ===
      Some("0xab"))
    assert(JsonRpc.parseNewHead(
      JsonRpc.newHeadNotification("0xab", 12345L, "0xh")) === Some(12345L))
    // responses, other methods, and garbage all parse to None, not throw
    assert(JsonRpc.parseNewHead(JsonRpc.subscribeResponse(7L, "0xab")) === None)
    assert(JsonRpc.parseNewHead("""{"method":"other","params":{}}""") === None)
    assert(JsonRpc.parseNewHead("not json at all") === None)
    assert(JsonRpc.subscribeRequest(1L, "newHeads").contains("eth_subscribe"))
  }

  test("client subscribes over RFC 6455, masks every frame, and folds heads monotonically") {
    val node = new FakeNode(Seq(100L, 101L, 99L, 105L)) // 99 must not regress the head
    val sub = new WsTransport.NewHeadsSubscriber("127.0.0.1", node.port, "/")
    try {
      // head() lazily connects; poll it first, then confirm the node's view
      val deadline = System.nanoTime() + 10_000_000_000L
      var h = sub.head()
      while (h < 105L && System.nanoTime() < deadline) { Thread.sleep(20); h = sub.head() }
      assert(h === 105L, "head must reach the highest pushed notification")
      // the repeat-at-or-below-head push (99 after 101) is the REORG
      // SIGNAL (listener.go:49-73): logged for refetch, never a regression
      assert(sub.reorgs() === IndexedSeq(99L))
      assert(node.served.await(10, java.util.concurrent.TimeUnit.SECONDS),
        "fake node never finished serving")
      assert(!node.sawUnmasked, "client frames must be masked (RFC 6455 5.3)")
      assert(node.subscribeText.contains("eth_subscribe") &&
        node.subscribeText.contains("newHeads"))
    } finally sub.close()
  }

  test("handshake verifies the accept key and refuses a lying peer") {
    val server = new ServerSocket(0)
    val t = new Thread(() => {
      try {
        val s = server.accept()
        val in = new BufferedInputStream(s.getInputStream)
        def readLine(): String = {
          val sb = new StringBuilder
          var b = in.read()
          while (b >= 0 && b != '\n') { if (b != '\r') sb.append(b.toChar); b = in.read() }
          sb.toString
        }
        Iterator.continually(readLine()).takeWhile(_.nonEmpty).foreach(_ => ())
        s.getOutputStream.write(("HTTP/1.1 101 Switching Protocols\r\n" +
          "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
          "Sec-WebSocket-Accept: bm90IHRoZSByaWdodCBrZXk=\r\n\r\n").getBytes(UTF_8))
        s.getOutputStream.flush()
      } catch { case _: Exception => () }
    })
    t.setDaemon(true)
    t.start()
    try {
      val e = intercept[IllegalArgumentException] {
        new WsTransport.WsClient("127.0.0.1", server.getLocalPort, "/")
      }
      assert(e.getMessage.contains("Sec-WebSocket-Accept"))
    } finally server.close()
  }

  test("a subscription that DIES surfaces its error; a deliberate close does not") {
    // phase 1: the node hard-kills the socket (RST) mid-subscription —
    // the reader must record the death, distinguishable from close()
    val dying = new FakeNode(Seq(42L), rst = true)
    val sub = new WsTransport.NewHeadsSubscriber("127.0.0.1", dying.port, "/")
    try {
      val deadline = System.nanoTime() + 10_000_000_000L
      var h = sub.head()
      while (h < 42L && System.nanoTime() < deadline) { Thread.sleep(20); h = sub.head() }
      assert(h === 42L)
      assert(sub.lastError.isEmpty, "no error while the subscription is live")
      while (sub.lastError.isEmpty && System.nanoTime() < deadline) Thread.sleep(20)
      assert(sub.lastError.exists(_.isInstanceOf[java.io.IOException]),
        "a died subscription must surface the IOException that killed it")
    } finally sub.close()
    // phase 2: OUR close() on a healthy connection is clean EOF — the
    // resulting socket IOException must NOT read as a death
    val healthy = new FakeNode(Seq(7L))
    val sub2 = new WsTransport.NewHeadsSubscriber("127.0.0.1", healthy.port, "/")
    try {
      val deadline = System.nanoTime() + 10_000_000_000L
      var h = sub2.head()
      while (h < 7L && System.nanoTime() < deadline) { Thread.sleep(20); h = sub2.head() }
      assert(h === 7L)
    } finally sub2.close()
    Thread.sleep(200) // let the reader thread observe the closed socket
    assert(sub2.lastError.isEmpty,
      "a deliberate close() must not register as a subscription death")
  }

  test("subscriber retries a failed connection and resubscribes after a drop") {
    // reserve a port and leave it CLOSED: the first attempt is refused,
    // swallowed (head stays -1), and must NOT freeze the subscriber
    val probe = new ServerSocket(0)
    val port = probe.getLocalPort
    probe.close()
    val sub = new WsTransport.NewHeadsSubscriber("127.0.0.1", port, "/",
      connectTimeoutMs = 1000, retryCooldownMs = 50L)
    try {
      assert(sub.head() === -1L, "no node yet: head must be the hole value")
      // a node appears on the SAME port: a later head() call past the
      // cooldown reconnects and folds its notifications
      val node1 = new FakeNode(Seq(42L), bindPort = port)
      var h = poll(sub, target = 42L)
      assert(h === 42L, s"head $h: subscriber never recovered from the refused connect")
      // node1 served and CLOSED the socket; the reader thread clears the
      // client, so when a restarted node appears the subscriber
      // resubscribes — a node restart needs no operator action
      assert(node1.served.await(10, java.util.concurrent.TimeUnit.SECONDS))
      val d2 = System.nanoTime() + 10_000_000_000L
      while (!node1.server.isClosed && System.nanoTime() < d2) Thread.sleep(20)
      val node2 = new FakeNode(Seq(77L), bindPort = port)
      h = poll(sub, target = 77L)
      assert(h === 77L, s"head $h: subscriber never resubscribed after the drop")
      assert(node2.subscribeText != null, "no second eth_subscribe issued")
    } finally sub.close()
  }

  test("reconnect backoff walks the fibonacci (golden-ratio) series and resets on success") {
    val probe = new ServerSocket(0)
    val port = probe.getLocalPort
    probe.close()
    val sub = new WsTransport.NewHeadsSubscriber("127.0.0.1", port, "/",
      connectTimeoutMs = 500, retryCooldownMs = 1L)
    try {
      assert(sub.currentDelayMs === 1L)
      // drive failed attempts; delays must follow round(d·φ): 1,2,3,5,8,13…
      val deadline = System.nanoTime() + 15_000_000_000L
      while (sub.currentDelayMs < 13L && System.nanoTime() < deadline) {
        sub.head(); Thread.sleep(5)
      }
      val seen = sub.currentDelayMs
      assert(Seq(13L, 21L, 34L).contains(seen), // next-fib members only
        s"delay $seen is off the fibonacci walk")
      // capped, never the reference's %3600 wrap-to-zero
      assert(seen <= 3600000L)
      // a node appears: successful connect resets the delay to the base
      val node = new FakeNode(Seq(5L), bindPort = port)
      assert(poll(sub, target = 5L) === 5L)
      assert(sub.currentDelayMs === 1L, "success must reset the backoff")
      assert(node.served.await(10, java.util.concurrent.TimeUnit.SECONDS))
    } finally sub.close()
  }

  test("wss: subscription over TLS against a self-signed SSLServerSocket node") {
    val (serverCtx, clientCtx) = graft.FakeNode.makeTls()
    val node = new graft.FakeNode.WsHeadNode(
      serverCtx.getServerSocketFactory.createServerSocket(0))
    val sub = new WsTransport.NewHeadsSubscriber("127.0.0.1", node.port, "/",
      tls = Some(clientCtx.getSocketFactory))
    try {
      node.push(7L)
      assert(poll(sub, target = 7L) === 7L,
        "heads never arrived over the TLS subscription")
      // same-height repeat still signals a reorg over TLS
      node.push(7L, "0xother")
      val d = System.nanoTime() + 10_000_000_000L
      while (sub.reorgs().isEmpty && System.nanoTime() < d) Thread.sleep(20)
      assert(sub.reorgs() === IndexedSeq(7L))

      // an UNTRUSTING client must refuse the self-signed peer: the
      // default platform trust store fails the handshake, head stays -1
      val untrusting = new WsTransport.NewHeadsSubscriber("127.0.0.1", node.port,
        "/", connectTimeoutMs = 2000,
        tls = Some(javax.net.ssl.SSLContext.getDefault.getSocketFactory))
      try {
        assert(untrusting.head() === -1L,
          "a self-signed cert must not pass default trust")
      } finally untrusting.close()
    } finally {
      sub.close()
      node.stop()
    }
  }

  test("wss: a trusted cert for the WRONG host is refused (endpoint identification)") {
    // the client trusts this cert's chain — but the SANs name another
    // host, so without endpoint identification the handshake would
    // succeed and the connection would be MITM-able. With the "HTTPS"
    // algorithm set, JSSE matches SANs against the dialed host and the
    // handshake must fail; head stays -1.
    val (serverCtx, clientCtx) =
      graft.FakeNode.makeTls(san = "SAN=dns:other.invalid")
    val node = new graft.FakeNode.WsHeadNode(
      serverCtx.getServerSocketFactory.createServerSocket(0))
    val sub = new WsTransport.NewHeadsSubscriber("127.0.0.1", node.port, "/",
      connectTimeoutMs = 2000, tls = Some(clientCtx.getSocketFactory))
    try {
      node.push(9L)
      Thread.sleep(500)
      assert(sub.head() === -1L,
        "a cert naming a different host must not pass endpoint identification")
    } finally {
      sub.close()
      node.stop()
    }
  }

  private def poll(sub: WsTransport.NewHeadsSubscriber, target: Long): Long = {
    val deadline = System.nanoTime() + 10_000_000_000L
    var h = sub.head()
    while (h < target && System.nanoTime() < deadline) { Thread.sleep(20); h = sub.head() }
    h
  }

  test("the ws fetcher option wires subscription heads to the BlockFetcher seam") {
    val node = new FakeNode(Seq(42L, 43L))
    val fetcher = graft.streaming.BlockFetcher.forOption(
      s"ws:ws://127.0.0.1:${node.port}/|http://127.0.0.1:1/unused", maxNumber = 0L)
    try {
      val deadline = System.nanoTime() + 5_000_000_000L
      var h = fetcher.head()
      while (h < 43L && System.nanoTime() < deadline) { Thread.sleep(20); h = fetcher.head() }
      assert(h === 43L)
      // serializable CONFIG: the case class round-trips through Java
      // serialization (the live socket is shared per-JVM state, not a field)
      val bos = new java.io.ByteArrayOutputStream()
      new java.io.ObjectOutputStream(bos).writeObject(fetcher)
      val back = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray)).readObject()
        .asInstanceOf[graft.streaming.BlockFetcher]
      assert(back.head() === h, "deserialized fetcher shares the JVM subscription")
    } finally WsTransport.resetSubscriber("127.0.0.1", node.port, "/")
  }
}
