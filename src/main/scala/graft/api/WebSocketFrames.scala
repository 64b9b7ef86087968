package graft.api

import java.io.{InputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8

/** RFC 6455 wire codec — the protocol half of the reference's `/v1/ws`
  * route, which it gets from gorilla/websocket (`app/rest/rest.go:762-778`
  * upgrades; `app/pubsub/consumption.go` writes JSON text frames).
  * Implemented from the public spec: the handshake accept key (§4.2.2),
  * client-to-server masking (§5.3), and the 7/16/64-bit payload length
  * ladder (§5.2). Only what the subscription protocol needs: text,
  * ping/pong, close. */
object WebSocketFrames {

  val OpText = 0x1
  val OpClose = 0x8
  val OpPing = 0x9
  val OpPong = 0xA

  /** §4.2.2: base64(SHA-1(key ++ fixed GUID)). */
  def acceptKey(secWebSocketKey: String): String = {
    val guid = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"
    val sha1 = java.security.MessageDigest.getInstance("SHA-1")
      .digest((secWebSocketKey + guid).getBytes(UTF_8))
    java.util.Base64.getEncoder.encodeToString(sha1)
  }

  /** One complete frame, server side (FIN always set, never masked —
    * §5.1 forbids server masking). */
  def writeFrame(out: OutputStream, opcode: Int, payload: Array[Byte]): Unit = {
    out.write(0x80 | (opcode & 0x0F))
    val n = payload.length
    if (n < 126) out.write(n)
    else if (n < 65536) {
      out.write(126); out.write(n >> 8); out.write(n & 0xFF)
    } else {
      out.write(127)
      var i = 7
      while (i >= 0) { out.write(((n.toLong >> (8 * i)) & 0xFF).toInt); i -= 1 }
    }
    out.write(payload)
    out.flush()
  }

  def writeText(out: OutputStream, text: String): Unit =
    writeFrame(out, OpText, text.getBytes(UTF_8))

  /** One complete frame, CLIENT side: §5.3 requires every
    * client-to-server frame be masked with a fresh unpredictable key
    * (so proxy caches can't be poisoned by attacker-chosen bytes). */
  def writeMaskedFrame(out: OutputStream, opcode: Int, payload: Array[Byte],
      rng: java.security.SecureRandom): Unit = {
    out.write(0x80 | (opcode & 0x0F))
    val n = payload.length
    if (n < 126) out.write(0x80 | n)
    else if (n < 65536) {
      out.write(0x80 | 126); out.write(n >> 8); out.write(n & 0xFF)
    } else {
      out.write(0x80 | 127)
      var i = 7
      while (i >= 0) { out.write(((n.toLong >> (8 * i)) & 0xFF).toInt); i -= 1 }
    }
    val mask = new Array[Byte](4)
    rng.nextBytes(mask)
    out.write(mask)
    val masked = new Array[Byte](n)
    var i = 0
    while (i < n) { masked(i) = (payload(i) ^ mask(i % 4)).toByte; i += 1 }
    out.write(masked)
    out.flush()
  }

  def writeMaskedText(out: OutputStream, text: String,
      rng: java.security.SecureRandom): Unit =
    writeMaskedFrame(out, OpText, text.getBytes(UTF_8), rng)

  /** One complete frame, reading the client side (which MUST mask, §5.3).
    * None on clean EOF before a frame starts. Fragmentation is not
    * handled (the subscription grammar's payloads are tiny single
    * frames); a fragmented frame surfaces as its first fragment. */
  def readFrame(in: InputStream): Option[(Int, Array[Byte])] = {
    val b0 = in.read()
    if (b0 < 0) return None
    val opcode = b0 & 0x0F
    val b1 = in.read()
    if (b1 < 0) return None
    val masked = (b1 & 0x80) != 0
    var len: Long = b1 & 0x7F
    if (len == 126) len = (readByte(in) << 8) | readByte(in)
    else if (len == 127) {
      len = 0
      var i = 0
      while (i < 8) { len = (len << 8) | readByte(in); i += 1 }
    }
    require(len <= Int.MaxValue, s"frame too large: $len")
    val mask = if (masked) Array.fill(4)(readByte(in).toByte) else Array.empty[Byte]
    val payload = in.readNBytes(len.toInt)
    require(payload.length == len, "truncated frame")
    if (masked) {
      var i = 0
      while (i < payload.length) {
        payload(i) = (payload(i) ^ mask(i % 4)).toByte
        i += 1
      }
    }
    Some((opcode, payload))
  }

  private def readByte(in: InputStream): Int = {
    val b = in.read()
    require(b >= 0, "truncated frame")
    b
  }
}
