package graft.functions

import java.math.BigInteger

/** secp256k1 ECDSA public-key recovery, implemented from the public
  * curve parameters (SEC 2 §2.4.1) and the standard recovery algorithm
  * (SEC 1 §4.1.6) — the primitive behind the reference's
  * `types.Sender(signer, tx)` (F13, `app/util/util.go:131-150`, which
  * delegates to go-ethereum's crypto.Ecrecover).
  *
  * Scalar multiplication runs in Jacobian (projective) coordinates —
  * the standard dbl-2009-l / add-2007-bl formulas, x = X/Z², y = Y/Z³ —
  * so a 256-bit multiply costs field multiplications only, with ONE
  * modular inversion at the final affine conversion. The affine
  * [[add]]/[[double]] forms are kept for the spec suite (and as the
  * readable reference the projective path is checked against): affine
  * pays a `modInverse` per point operation, ~1100 inversions per
  * recovery, which measured ~40× slower than the ingest path needs
  * (CryptoBench: recovery must sustain the per-tx rate of the full
  * write path, ~3k/s on the bench corpus).
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

  // ---- Jacobian (projective) arithmetic: x = X/Z², y = Y/Z³ -------------
  // Z.signum == 0 encodes the point at infinity. Formulas are the
  // standard a=0 short-Weierstrass set (EFD dbl-2009-l / add-2007-bl).

  private final case class Jac(x: BigInteger, y: BigInteger, z: BigInteger)
  private val JInf = Jac(BigInteger.ONE, BigInteger.ONE, BigInteger.ZERO)

  private def toJac(p: Point): Jac = p match {
    case None => JInf
    case Some((x, y)) => Jac(x, y, BigInteger.ONE)
  }

  private def toAffine(j: Jac): Point =
    if (j.z.signum == 0) None
    else {
      val zInv = j.z.modInverse(P)
      val zInv2 = zInv.multiply(zInv).mod(P)
      Some((j.x.multiply(zInv2).mod(P),
        j.y.multiply(zInv2).multiply(zInv).mod(P)))
    }

  private def jDouble(p: Jac): Jac = {
    if (p.z.signum == 0 || p.y.signum == 0) return JInf
    val a = p.x.multiply(p.x).mod(P)
    val b = p.y.multiply(p.y).mod(P)
    val c = b.multiply(b).mod(P)
    val xb = p.x.add(b)
    val d = xb.multiply(xb).subtract(a).subtract(c).shiftLeft(1).mod(P)
    val e = a.multiply(BigInteger.valueOf(3)).mod(P)
    val x3 = e.multiply(e).subtract(d.shiftLeft(1)).mod(P)
    val y3 = e.multiply(d.subtract(x3)).subtract(c.shiftLeft(3)).mod(P)
    val z3 = p.y.multiply(p.z).shiftLeft(1).mod(P)
    Jac(x3, y3, z3)
  }

  private def jAdd(p: Jac, q: Jac): Jac = {
    if (p.z.signum == 0) return q
    if (q.z.signum == 0) return p
    val z1z1 = p.z.multiply(p.z).mod(P)
    val z2z2 = q.z.multiply(q.z).mod(P)
    val u1 = p.x.multiply(z2z2).mod(P)
    val u2 = q.x.multiply(z1z1).mod(P)
    val s1 = p.y.multiply(q.z).multiply(z2z2).mod(P)
    val s2 = q.y.multiply(p.z).multiply(z1z1).mod(P)
    if (u1 == u2) {
      if (s1 == s2) jDouble(p) else JInf
    } else {
      val h = u2.subtract(u1).mod(P)
      val h2 = h.shiftLeft(1)
      val i = h2.multiply(h2).mod(P)
      val j = h.multiply(i).mod(P)
      val r = s2.subtract(s1).shiftLeft(1).mod(P)
      val v = u1.multiply(i).mod(P)
      val x3 = r.multiply(r).subtract(j).subtract(v.shiftLeft(1)).mod(P)
      val y3 = r.multiply(v.subtract(x3))
        .subtract(s1.multiply(j).shiftLeft(1)).mod(P)
      val zs = p.z.add(q.z)
      val z3 = zs.multiply(zs).subtract(z1z1).subtract(z2z2).multiply(h).mod(P)
      Jac(x3, y3, z3)
    }
  }

  private def jMul(k: BigInteger, p: Jac): Jac = {
    var acc = JInf
    var addend = p
    var i = 0
    val bits = k.bitLength()
    while (i < bits) {
      if (k.testBit(i)) acc = jAdd(acc, addend)
      addend = jDouble(addend)
      i += 1
    }
    acc
  }

  /** Shamir's trick: u1·P1 + u2·P2 in ONE interleaved double-and-add
    * pass (≈256 doublings + ≤256 additions, vs ~2× that for two
    * separate multiplications) — the standard two-scalar form used by
    * every ECDSA verifier. */
  private def jShamir(u1: BigInteger, p1: Jac, u2: BigInteger, p2: Jac): Jac = {
    val sum = jAdd(p1, p2)
    var acc = JInf
    var i = math.max(u1.bitLength(), u2.bitLength()) - 1
    while (i >= 0) {
      acc = jDouble(acc)
      val b1 = u1.testBit(i)
      val b2 = u2.testBit(i)
      if (b1 && b2) acc = jAdd(acc, sum)
      else if (b1) acc = jAdd(acc, p1)
      else if (b2) acc = jAdd(acc, p2)
      i -= 1
    }
    acc
  }

  /** Double-and-add scalar multiplication (not constant-time — this is a
    * verification/recovery path, no secrets are handled at scale).
    * Jacobian internally; one inversion at the affine conversion. */
  def mul(k: BigInteger, p: Point): Point = toAffine(jMul(k, toJac(p)))

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
      // Q = r⁻¹(sR − zG) = u1·R + u2·G with u1 = r⁻¹s, u2 = −r⁻¹z — the
      // standard verifier form: one Shamir pass, projective throughout,
      // one field inversion total (at the affine conversion)
      val rInv = r.modInverse(N)
      val u1 = rInv.multiply(s).mod(N)
      val u2 = rInv.multiply(N.subtract(z.mod(N))).mod(N)
      val q = toAffine(jShamir(u1, toJac(rPoint), u2, toJac(G)))
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
