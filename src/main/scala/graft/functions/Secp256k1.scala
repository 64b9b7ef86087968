package graft.functions

import java.math.BigInteger

/** secp256k1 ECDSA public-key recovery, implemented from the public
  * curve parameters (SEC 2 §2.4.1) and the standard recovery algorithm
  * (SEC 1 §4.1.6) — the primitive behind the reference's
  * `types.Sender(signer, tx)` (F13, `app/util/util.go:131-150`, which
  * delegates to go-ethereum's crypto.Ecrecover).
  *
  * Affine arithmetic over BigInteger: per-call cost is ~1 ms — the same
  * execution class as any per-row digest, and sender recovery is an
  * ingest/connector-side operation, never a hot query path.
  */
object Secp256k1 {

  // SEC 2 "Recommended Elliptic Curve Domain Parameters", secp256k1:
  // y² = x³ + 7 over F_p
  val P: BigInteger = new BigInteger(
    "fffffffffffffffffffffffffffffffffffffffffffffffffffffffefffffc2f", 16)
  val N: BigInteger = new BigInteger(
    "fffffffffffffffffffffffffffffffebaaedce6af48a03bbfd25e8cd0364141", 16)
  val Gx: BigInteger = new BigInteger(
    "79be667ef9dcbbac55a06295ce870b07029bfcdb2dce28d959f2815b16f81798", 16)
  val Gy: BigInteger = new BigInteger(
    "483ada7726a3c4655da4fbfc0e1108a8fd17b448a68554199c47d08ffb10d4b8", 16)
  private val Seven = BigInteger.valueOf(7)

  /** Affine point; None = point at infinity. */
  type Point = Option[(BigInteger, BigInteger)]

  val G: Point = Some((Gx, Gy))

  private def mod(a: BigInteger): BigInteger = a.mod(P)

  def add(a: Point, b: Point): Point = (a, b) match {
    case (None, _) => b
    case (_, None) => a
    case (Some((x1, y1)), Some((x2, y2))) =>
      if (x1 == x2) {
        if (y1.add(y2).mod(P).signum == 0) None // inverse points
        else double(a)
      } else {
        val l = mod(y2.subtract(y1)).multiply(x2.subtract(x1).modInverse(P)).mod(P)
        val x3 = mod(l.multiply(l).subtract(x1).subtract(x2))
        Some((x3, mod(l.multiply(x1.subtract(x3)).subtract(y1))))
      }
  }

  def double(p: Point): Point = p match {
    case None => None
    case Some((x, y)) =>
      if (y.signum == 0) None
      else {
        val l = x.multiply(x).multiply(BigInteger.valueOf(3))
          .multiply(y.shiftLeft(1).modInverse(P)).mod(P)
        val x3 = mod(l.multiply(l).subtract(x.shiftLeft(1)))
        Some((x3, mod(l.multiply(x.subtract(x3)).subtract(y))))
      }
  }

  /** Double-and-add scalar multiplication (not constant-time — this is a
    * verification/recovery path, no secrets are handled at scale). */
  def mul(k: BigInteger, p: Point): Point = {
    var acc: Point = None
    var addend = p
    var i = 0
    val bits = k.bitLength()
    while (i < bits) {
      if (k.testBit(i)) acc = add(acc, addend)
      addend = double(addend)
      i += 1
    }
    acc
  }

  /** y from x for a curve point, choosing the root with the given parity
    * (p ≡ 3 mod 4, so the root is a^((p+1)/4)). None if x is not on the
    * curve. */
  private def liftX(x: BigInteger, oddY: Boolean): Option[BigInteger] = {
    val alpha = x.modPow(BigInteger.valueOf(3), P).add(Seven).mod(P)
    val beta = alpha.modPow(P.add(BigInteger.ONE).shiftRight(2), P)
    if (beta.multiply(beta).mod(P) != alpha) None
    else Some(if (beta.testBit(0) == oddY) beta else P.subtract(beta))
  }

  /** SEC 1 §4.1.6 public-key recovery: given the 32-byte message hash,
    * (r, s), and the recovery id (0–3), return the uncompressed 65-byte
    * public key `04 || X || Y`, or None for an invalid signature.
    * Q = r⁻¹ (s·R − z·G). */
  def recover(msgHash: Array[Byte], r: BigInteger, s: BigInteger,
      recId: Int): Option[Array[Byte]] = {
    if (recId < 0 || recId > 3) return None
    if (r.signum <= 0 || r.compareTo(N) >= 0) return None
    if (s.signum <= 0 || s.compareTo(N) >= 0) return None
    val x = if (recId >= 2) r.add(N) else r
    if (x.compareTo(P) >= 0) return None
    liftX(x, oddY = (recId & 1) == 1).flatMap { y =>
      val rPoint: Point = Some((x, y))
      // R must have order n (always true on secp256k1's prime-order group,
      // but an off-curve x was already rejected by liftX)
      val z = new BigInteger(1, msgHash)
      val rInv = r.modInverse(N)
      val q = mul(rInv.mod(N), add(
        mul(s, rPoint),
        mul(N.subtract(z.mod(N)), G)))
      q.map { case (qx, qy) =>
        val out = new Array[Byte](65)
        out(0) = 0x04
        pad32(qx, out, 1)
        pad32(qy, out, 33)
        out
      }
    }
  }

  /** Deterministic-k-free signing FOR TESTS ONLY: sign `msgHash` with
    * private key `d` and nonce `k`, returning (r, s, recId). Production
    * never signs — the engine only recovers. */
  def signWithK(msgHash: Array[Byte], d: BigInteger, k: BigInteger): (BigInteger, BigInteger, Int) = {
    val Some((kx, ky)) = mul(k, G): @unchecked
    val r = kx.mod(N)
    require(r.signum > 0, "bad k")
    val z = new BigInteger(1, msgHash)
    val s = k.modInverse(N).multiply(z.add(r.multiply(d))).mod(N)
    require(s.signum > 0, "bad k")
    // recId: bit0 = parity of R.y, bit1 = whether r wrapped past n
    val recId = (if (kx.compareTo(N) >= 0) 2 else 0) | (if (ky.testBit(0)) 1 else 0)
    (r, s, recId)
  }

  private def pad32(v: BigInteger, out: Array[Byte], off: Int): Unit = {
    val raw = v.toByteArray.dropWhile(_ == 0)
    System.arraycopy(raw, 0, out, off + 32 - raw.length, raw.length)
  }
}
