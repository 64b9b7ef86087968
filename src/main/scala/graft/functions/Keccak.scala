package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Keccak-256 (the pre-NIST padding variant Ethereum uses — pad 0x01,
  * not SHA-3's 0x06) as a custom Catalyst expression (F11, optional per
  * SURVEY §2.8; needed for `PublicKeyBytesToAddress`
  * `/root/reference/app/util/util.go:18-27`).
  *
  * Implemented from the public Keccak-f[1600] specification: rate 1088
  * bits (136-byte blocks), capacity 512, 24 rounds. `doGenCode` emits a
  * static hash call — the same shape as Spark's own sha2 — so a keccak
  * projection stays inside whole-stage codegen instead of forcing the
  * stage to fall back. */
object Keccak {

  private val RoundConstants: Array[Long] = Array(
    0x0000000000000001L, 0x0000000000008082L, 0x800000000000808aL, 0x8000000080008000L,
    0x000000000000808bL, 0x0000000080000001L, 0x8000000080008081L, 0x8000000000008009L,
    0x000000000000008aL, 0x0000000000000088L, 0x0000000080008009L, 0x000000008000000aL,
    0x000000008000808bL, 0x800000000000008bL, 0x8000000000008089L, 0x8000000000008003L,
    0x8000000000008002L, 0x8000000000000080L, 0x000000000000800aL, 0x800000008000000aL,
    0x8000000080008081L, 0x8000000000008080L, 0x0000000080000001L, 0x8000000080008008L)

  // rotation offsets r[x][y] and the pi-step permutation, flattened lane order
  private val RotOffsets: Array[Int] = Array(
    0, 1, 62, 28, 27, 36, 44, 6, 55, 20, 3, 10, 43, 25, 39, 41, 45, 15, 21, 8, 18, 2, 61, 56, 14)

  private def keccakF(a: Array[Long]): Unit = {
    val b = new Array[Long](25)
    val c = new Array[Long](5)
    val d = new Array[Long](5)
    var round = 0
    while (round < 24) {
      // theta
      var x = 0
      while (x < 5) {
        c(x) = a(x) ^ a(x + 5) ^ a(x + 10) ^ a(x + 15) ^ a(x + 20); x += 1
      }
      x = 0
      while (x < 5) {
        d(x) = c((x + 4) % 5) ^ java.lang.Long.rotateLeft(c((x + 1) % 5), 1)
        var y = 0
        while (y < 5) { a(x + 5 * y) ^= d(x); y += 1 }
        x += 1
      }
      // rho + pi
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          // B[y, 2x+3y] = rot(A[x,y], r[x,y])  (indices mod 5)
          b(y + 5 * ((2 * x + 3 * y) % 5)) =
            java.lang.Long.rotateLeft(a(x + 5 * y), RotOffsets(x + 5 * y))
          y += 1
        }
        x += 1
      }
      // chi
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          a(x + 5 * y) = b(x + 5 * y) ^ (~b((x + 1) % 5 + 5 * y) & b((x + 2) % 5 + 5 * y))
          y += 1
        }
        x += 1
      }
      // iota
      a(0) ^= RoundConstants(round)
      round += 1
    }
  }

  /** keccak256 digest of arbitrary bytes. */
  def hash256(input: Array[Byte]): Array[Byte] = {
    val rate = 136
    val state = new Array[Long](25)
    // absorb with multi-rate padding 0x01 … 0x80
    val padded = {
      val padLen = rate - (input.length % rate)
      val out = java.util.Arrays.copyOf(input, input.length + padLen)
      out(input.length) = 0x01.toByte
      out(out.length - 1) = (out(out.length - 1) | 0x80).toByte
      out
    }
    var off = 0
    while (off < padded.length) {
      var i = 0
      while (i < rate / 8) {
        var lane = 0L
        var j = 7
        while (j >= 0) { lane = (lane << 8) | (padded(off + i * 8 + j) & 0xffL); j -= 1 }
        state(i) ^= lane
        i += 1
      }
      keccakF(state)
      off += rate
    }
    // squeeze 32 bytes
    val out = new Array[Byte](32)
    var i = 0
    while (i < 4) {
      var j = 0
      while (j < 8) { out(i * 8 + j) = ((state(i) >>> (8 * j)) & 0xff).toByte; j += 1 }
      i += 1
    }
    out
  }

  case class Keccak256(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(input: Any): Any = hash256(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.Keccak.hash256($c)")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "keccak256"
  }
}
