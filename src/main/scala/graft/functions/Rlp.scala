package graft.functions

import java.math.BigInteger

/** RLP (Recursive Length Prefix) encoding, from the public Ethereum
  * specification (yellow paper appendix B): byte strings and lists with
  * minimal big-endian length prefixes. Only encoding is needed — the
  * engine computes signing payloads (F13), it never decodes wire data. */
object Rlp {

  sealed trait Item
  final case class Str(bytes: Array[Byte]) extends Item
  final case class Lst(items: Seq[Item]) extends Item

  /** Minimal big-endian integer item (0 → empty string, per spec). */
  def int(v: BigInteger): Item = {
    require(v.signum >= 0, "RLP integers are unsigned")
    Str(if (v.signum == 0) Array.emptyByteArray else v.toByteArray.dropWhile(_ == 0))
  }
  def int(v: Long): Item = int(BigInteger.valueOf(v))

  /** Decimal-string uint256 (the engine's native uint representation). */
  def uint(decimal: String): Item = int(new BigInteger(decimal))

  /** `0x…` hex string → byte-string item ("" → empty; leading zero bytes
    * preserved — addresses/hashes are fixed-width byte strings, not
    * integers). */
  def hex(s: String): Item = {
    val body = if (s.startsWith("0x") || s.startsWith("0X")) s.drop(2) else s
    val even = if (body.length % 2 == 0) body else "0" + body
    Str(even.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
  }

  def encode(item: Item): Array[Byte] = item match {
    case Str(b) =>
      if (b.length == 1 && (b(0) & 0xff) < 0x80) b
      else prefix(0x80, b.length) ++ b
    case Lst(items) =>
      val body = items.toArray.flatMap(encode)
      prefix(0xc0, body.length) ++ body
  }

  private def prefix(base: Int, len: Int): Array[Byte] =
    if (len <= 55) Array((base + len).toByte)
    else {
      val lenBytes = BigInteger.valueOf(len.toLong).toByteArray.dropWhile(_ == 0)
      Array((base + 55 + lenBytes.length).toByte) ++ lenBytes
    }
}
