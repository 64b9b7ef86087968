package graft

import graft.pipeline.{FlacHeader, FlacPcm}

/** FLAC sample decode: encoder-half → decoder-half identity across
  * every subframe type and stereo mode, CRC known-answer vectors, and
  * hand-assembled bit vectors for the decoder paths the generator does
  * not emit (wasted bits, escape partitions, the 5-bit Rice2 method,
  * 16-bit literal block sizes). */
class FlacPcmSpec extends SparkSpec {

  /** Expected OUTPUT channels for a seed: the coded closed forms pushed
    * through the spec's decorrelation reconstruction. */
  private def expected(d: Long): Array[Array[Int]] = {
    val p = FlacPcm.GenParams(d)
    val coded = Array.tabulate(p.nch, p.n)((c, i) => p.x(c, i))
    p.chCode match {
      case 8 => Array(coded(0), Array.tabulate(p.n)(i => coded(0)(i) - coded(1)(i)))
      case 9 => Array(Array.tabulate(p.n)(i => coded(1)(i) + coded(0)(i)), coded(1))
      case 10 => Array(
        Array.tabulate(p.n) { i =>
          val m2 = (coded(0)(i) << 1) | (coded(1)(i) & 1)
          (m2 + coded(1)(i)) >> 1
        },
        Array.tabulate(p.n) { i =>
          val m2 = (coded(0)(i) << 1) | (coded(1)(i) & 1)
          (m2 - coded(1)(i)) >> 1
        })
      case _ => coded
    }
  }

  test("CRC known-answer vectors (CRC-8/0x07 and CRC-16/0x8005 over '123456789')") {
    val v = "123456789".getBytes("US-ASCII")
    assert(FlacPcm.crc8(v, 0, v.length) === 0xf4)
    assert(FlacPcm.crc16(v, 0, v.length) === 0xfee8)
  }

  test("encode→decode identity: every sample, every seed 0..199") {
    (0L until 200L).foreach { d =>
      val bytes = FlacPcm.gen(d)
      val a = FlacPcm.decode(bytes).getOrElse(fail(s"seed $d did not decode"))
      val p = FlacPcm.GenParams(d)
      assert(a.blockSize === p.n, s"seed $d")
      assert(a.channels === p.nch && a.chanMode === p.chCode, s"seed $d")
      assert(a.bps === 16, s"seed $d")
      val exp = expected(d)
      (0 until p.nch).foreach { c =>
        assert(a.samples(c).toSeq === exp(c).toSeq, s"seed $d channel $c")
      }
    }
  }

  test("the seed sweep exercises every stereo mode and subframe type") {
    val modes = (0L until 40L).map(d => FlacPcm.GenParams(d).mode).toSet
    assert(modes === Set(0, 1, 2, 3, 4))
    val types = (0L until 40L).flatMap { d =>
      val p = FlacPcm.GenParams(d)
      (0 until p.nch).map(c => p.t(c))
    }.toSet
    assert(types === (0 to 7).toSet) // constant, verbatim, fixed 0-4, LPC
  }

  test("STREAMINFO of the generated file parses consistently") {
    val d = 7L
    val m = FlacHeader.parse(FlacPcm.gen(d)).get
    val p = FlacPcm.GenParams(d)
    assert(m.channels === p.nch && m.sampleRate === 44100 &&
      m.bitsPerSample === 16 && m.totalSamples === p.n)
  }

  test("any corrupted frame bit is caught by a CRC; truncation is NULL") {
    val bytes = FlacPcm.gen(11L)
    // header byte (CRC-8 scope): channel-assignment nibble
    val h = bytes.clone(); h(45) = (h(45) ^ 0x10).toByte
    assert(FlacPcm.decode(h).isEmpty)
    // payload byte (CRC-16 scope)
    val t = bytes.clone(); t(bytes.length - 10) = (t(bytes.length - 10) ^ 0x40).toByte
    assert(FlacPcm.decode(t).isEmpty)
    assert(FlacPcm.decode(bytes.dropRight(3)).isEmpty)
    assert(FlacPcm.decode(Array[Byte]()).isEmpty)
    assert(FlacPcm.decode(null).isEmpty)
  }

  test("32-bit sample size fails CLOSED (never silently wrong)") {
    // The Int-width sample path cannot represent 32-bit warm-up reads
    // (signed(32) wraps) or the 33-bit decorrelated side channel, so a
    // frame coding sample-size 32 must return None — silently-wrong
    // samples under a passing CRC are the failure mode this pins shut.
    val bytes = FlacPcm.gen(11L)
    val b = bytes.clone()
    // frame header byte 3 (offset 45): chCode(4) | szCode(3) | reserved;
    // rewrite szCode 4 (16-bit) → 7 (32-bit) and re-seal the header CRC-8
    b(45) = ((b(45) & 0xF1) | (7 << 1)).toByte
    b(48) = FlacPcm.crc8(b, 42, 48).toByte
    assert(FlacPcm.decode(b).isEmpty)
    assert(FlacPcm.decode(bytes).isDefined) // the unmodified twin decodes
  }

  // ==== hand-assembled vectors for generator-less decoder paths ==========

  private final class Bw {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var n = 0
    def u(v: Int, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1); n += 1
        if (n == 8) { out.write(cur); cur = 0; n = 0 }
        i -= 1
      }
    }
    def align(): Array[Byte] = {
      if (n != 0) { cur <<= (8 - n); out.write(cur); n = 0 }
      out.toByteArray
    }
  }

  /** Minimal mono 16-bit container: fLaC + last-flag STREAMINFO with
    * rate 44100, 1 channel, 16 bps, `total` samples. */
  private def container(total: Int): Array[Byte] =
    "fLaC".getBytes ++
      Array(0x80, 0x00, 0x00, 0x22).map(_.toByte) ++
      Array[Byte](0, 64, 0, 64) ++ Array.fill(6)(0.toByte) ++
      Array(0x0a, 0xc4, 0x40, 0xf0, 0, 0, (total >> 8) & 0xff, total & 0xff)
        .map(_.toByte) ++
      Array.fill(16)(0.toByte)

  /** Frame header for mono/16bps with a 16-bit literal block size. */
  private def frameHeader(n: Int): Array[Byte] = {
    val w = new Bw
    w.u(0x3ffe, 14); w.u(0, 1); w.u(0, 1)
    w.u(7, 4)  // blocksize: 16-bit n-1 at end
    w.u(9, 4)  // 44.1 kHz
    w.u(0, 4)  // mono
    w.u(4, 3); w.u(0, 1) // 16 bps
    w.u(0, 8)  // frame 0
    w.u(n - 1, 16)
    val h = w.align()
    h :+ FlacPcm.crc8(h, 0, h.length).toByte
  }

  private def sealFrame(pre: Array[Byte], body: Bw): Array[Byte] = {
    val frame = pre ++ body.align()
    val full = container(0) ++ frame
    val crc = FlacPcm.crc16(full, 42, full.length)
    full ++ Array(((crc >> 8) & 0xff).toByte, (crc & 0xff).toByte)
  }

  test("wasted bits: verbatim samples reconstruct left-shifted") {
    val n = 4
    val vals = Array(3, -2, 5, 0) // coded at 14 bits, wasted = 2
    val body = new Bw
    body.u(0, 1); body.u(1, 6) // verbatim
    body.u(1, 1)               // wasted flag
    body.u(1, 2)               // unary "01" → wasted−1 = 1 → wasted 2
    vals.foreach(v => body.u(v & 0x3fff, 14))
    val a = FlacPcm.decode(sealFrame(frameHeader(n), body)).get
    assert(a.samples(0).toSeq === Seq(12, -8, 20, 0))
    assert(a.subTypes(0) === 1 && a.blockSize === n)
  }

  test("escape partition: Rice parameter 15 → 5-bit raw residuals") {
    val n = 4
    val vals = Array(7, -9, 0, 15) // fixed order 0: residual = sample
    val body = new Bw
    body.u(0, 1); body.u(8, 6); body.u(0, 1) // fixed order 0
    body.u(0, 2)   // method 0 (4-bit params)
    body.u(0, 4)   // partition order 0
    body.u(15, 4)  // ESCAPE
    body.u(5, 5)   // raw width 5
    vals.foreach(v => body.u(v & 0x1f, 5))
    val a = FlacPcm.decode(sealFrame(frameHeader(n), body)).get
    assert(a.samples(0).toSeq === vals.toSeq)
  }

  test("Rice2 method: 5-bit partition parameters decode") {
    val n = 4
    val vals = Array(100, -50, 0, 2048)
    val body = new Bw
    body.u(0, 1); body.u(8, 6); body.u(0, 1) // fixed order 0
    body.u(1, 2)   // method 1 (5-bit params)
    body.u(0, 4)
    val k = 17     // only representable in 5 bits
    body.u(k, 5)
    vals.foreach { v =>
      val z = if (v < 0) (-v << 1) - 1 else v << 1
      var q = z >>> k
      while (q > 0) { body.u(0, 1); q -= 1 }
      body.u(1, 1); body.u(z & ((1 << k) - 1), k)
    }
    val a = FlacPcm.decode(sealFrame(frameHeader(n), body)).get
    assert(a.samples(0).toSeq === vals.toSeq)
  }

  test("frame_bytes pins total bit consumption") {
    (0L until 50L).foreach { d =>
      val bytes = FlacPcm.gen(d)
      val a = FlacPcm.decode(bytes).get
      assert(a.frameBytes === bytes.length - 42L, s"seed $d") // one frame fills the file
    }
  }
}
