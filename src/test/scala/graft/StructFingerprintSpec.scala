package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.StructFingerprint

/** The structural AV fingerprint: codec-blind (len, dur) container
  * walks (IVF / MP4 sample tables / ADTS), the two comparison bands,
  * the real IVF→MP4 re-mux, and the exact invariances — re-wrap,
  * re-time ×k, bitrate ×m all hamming 0, localized edit bounded.
  * Walk vectors are hand-assembled (bit-literal, not generator
  * round-trips) so the parsers are pinned against the SPECS, not
  * against the twin half of this module. */
class StructFingerprintSpec extends AnyFunSuite {

  private def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  private def fp(b: Array[Byte]): Long =
    StructFingerprint.fingerprint(b).longValue()

  // ---- hand-assembled containers ----------------------------------------

  /** Minimal IVF: header + frames with given (len, pts) pairs, payload
    * bytes all 0xEE. */
  private def ivf(frames: Seq[(Int, Long)], hdrFrames: Int = -1): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = (0 until 4).foreach(s => out.write(((v >> (8 * s)) & 0xff).toInt))
    def w64(v: Long): Unit = (0 until 8).foreach(s => out.write(((v >> (8 * s)) & 0xff).toInt))
    out.write("DKIF".getBytes); w16(0); w16(32)
    out.write("XXXX".getBytes) // codec-blind: fourcc must not matter
    w16(64); w16(48); w32(30); w32(1)
    w32(if (hdrFrames < 0) frames.length else hdrFrames); w32(0)
    for ((len, pts) <- frames) {
      w32(len); w64(pts)
      (0 until len).foreach(_ => out.write(0xEE))
    }
    out.toByteArray
  }

  /** Minimal MP4: ftyp + moov(trak(mdia(hdlr, stbl(stts, stsz)))) with
    * explicit runs and sizes; `uniform` > 0 writes a constant-size
    * stsz instead of a size array. */
  private def mp4(runs: Seq[(Long, Long)], sizes: Seq[Long],
      uniform: Long = 0, handler: String = "vide",
      sampleCountOverride: Long = -1): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = (3 to 0 by -1).foreach(s => out.write(((v >> (8 * s)) & 0xff).toInt))
    def tag4(t: String): Unit = out.write(t.getBytes("US-ASCII"))
    def zeros(k: Int): Unit = (0 until k).foreach(_ => out.write(0))
    val n = if (sampleCountOverride >= 0) sampleCountOverride
            else if (uniform > 0) runs.map(_._1).sum else sizes.length.toLong
    val sttsSize = 16 + 8 * runs.length
    val stszSize = 20 + (if (uniform > 0) 0 else 4 * sizes.length)
    val stblSize = 8 + sttsSize + stszSize
    val minfSize = 8 + stblSize
    val hdlrSize = 33
    val mdhdSize = 32
    val mdiaSize = 8 + mdhdSize + hdlrSize + minfSize
    val trakSize = 8 + mdiaSize
    val moovSize = 8 + trakSize
    w32(16); tag4("ftyp"); tag4("isom"); w32(512)
    w32(moovSize); tag4("moov")
    w32(trakSize); tag4("trak")
    w32(mdiaSize); tag4("mdia")
    w32(mdhdSize); tag4("mdhd"); w32(0); w32(0); w32(0); w32(1000); w32(99); w32(0)
    w32(hdlrSize); tag4("hdlr"); w32(0); w32(0); tag4(handler); zeros(12); zeros(1)
    w32(minfSize); tag4("minf")
    w32(stblSize); tag4("stbl")
    w32(sttsSize); tag4("stts"); w32(0); w32(runs.length)
    runs.foreach { case (c, d) => w32(c); w32(d) }
    w32(stszSize); tag4("stsz"); w32(0); w32(uniform); w32(n)
    if (uniform == 0) sizes.foreach(w32)
    out.toByteArray
  }

  /** Two-frame MPEG-4 ADTS, CRC-less, with the given total frame
    * lengths (header included). */
  private def adts(frameLens: Seq[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    for (len <- frameLens) {
      out.write(0xFF); out.write(0xF1) // sync, MPEG-4, layer 0, no CRC
      out.write((1 << 6) | (4 << 2))   // AAC-LC, 44.1 kHz
      out.write((2 << 6) | ((len >> 11) & 3)) // 2ch + len high bits
      out.write((len >> 3) & 0xFF)
      out.write(((len & 7) << 5) | 0x1F)
      out.write(0xFC)
      (0 until len - 7).foreach(_ => out.write(0xAB))
    }
    out.toByteArray
  }

  // ---- walks -------------------------------------------------------------

  test("IVF walk: lengths from frame headers, durations from PTS deltas, last = previous") {
    val b = ivf(Seq((10, 0L), (20, 7L), (15, 9L), (31, 14L)))
    val fs = StructFingerprint.frameSeq(b).get
    assert(fs.container === "ivf")
    assert(fs.lens.toSeq === Seq(10L, 20L, 15L, 31L))
    assert(fs.durs.toSeq === Seq(7L, 2L, 5L, 5L))
  }

  test("IVF walk: single frame gets duration 1; fourcc is ignored (codec-blind)") {
    val fs = StructFingerprint.frameSeq(ivf(Seq((9, 0L)))).get
    assert(fs.lens.toSeq === Seq(9L))
    assert(fs.durs.toSeq === Seq(1L))
  }

  test("IVF walk: trailing partial frame stops the walk; header count not trusted") {
    val whole = ivf(Seq((10, 0L), (20, 5L), (30, 11L)))
    val cut = whole.take(whole.length - 10) // truncate inside frame 2
    val fs = StructFingerprint.frameSeq(cut).get
    assert(fs.lens.toSeq === Seq(10L, 20L))
    // header-declared count deliberately wrong: the walk counts what's present
    val lying = ivf(Seq((10, 0L), (20, 5L)), hdrFrames = 7)
    assert(StructFingerprint.frameSeq(lying).get.lens.length === 2)
  }

  test("IVF walk fail-closed: non-monotonic PTS refuses") {
    assert(StructFingerprint.frameSeq(ivf(Seq((10, 0L), (20, 5L), (30, 5L)))).isEmpty)
    assert(StructFingerprint.frameSeq(ivf(Seq((10, 9L), (20, 5L)))).isEmpty)
  }

  test("MP4 walk: stts runs expand to per-sample durations, stsz to sizes") {
    val b = mp4(runs = Seq((2L, 5L), (1L, 9L)), sizes = Seq(100L, 200L, 50L))
    val fs = StructFingerprint.frameSeq(b).get
    assert(fs.container === "mp4")
    assert(fs.lens.toSeq === Seq(100L, 200L, 50L))
    assert(fs.durs.toSeq === Seq(5L, 5L, 9L))
  }

  test("MP4 walk: uniform stsz (sample_size != 0) replicates the constant") {
    val b = mp4(runs = Seq((4L, 3L)), sizes = Nil, uniform = 77L)
    val fs = StructFingerprint.frameSeq(b).get
    assert(fs.lens.toSeq === Seq(77L, 77L, 77L, 77L))
    assert(fs.durs.toSeq === Seq(3L, 3L, 3L, 3L))
  }

  test("MP4 walk fail-closed: count mismatch, zero delta, zero size") {
    assert(StructFingerprint.frameSeq(
      mp4(Seq((2L, 5L)), Seq(10L, 20L, 30L))).isEmpty) // stts 2 vs stsz 3
    assert(StructFingerprint.frameSeq(
      mp4(Seq((3L, 5L)), Seq(10L, 20L), sampleCountOverride = 2L)).isEmpty)
    assert(StructFingerprint.frameSeq(
      mp4(Seq((2L, 0L)), Seq(10L, 20L))).isEmpty) // delta 0
    assert(StructFingerprint.frameSeq(
      mp4(Seq((2L, 5L)), Seq(10L, 0L))).isEmpty) // size 0
  }

  test("ADTS walk: 13-bit lengths, constant duration 1") {
    val fs = StructFingerprint.frameSeq(adts(Seq(31, 44, 29))).get
    assert(fs.container === "adts")
    assert(fs.lens.toSeq === Seq(31L, 44L, 29L))
    assert(fs.durs.toSeq === Seq(1L, 1L, 1L))
  }

  test("fail-closed: null, garbage, empty") {
    assert(StructFingerprint.frameSeq(null).isEmpty)
    assert(StructFingerprint.frameSeq(Array[Byte]()).isEmpty)
    assert(StructFingerprint.frameSeq(Array.fill[Byte](64)(0x55)).isEmpty)
    assert(StructFingerprint.fingerprint(Array.fill[Byte](64)(0x55)) === null)
  }

  // ---- fingerprint closed-form cross-check -------------------------------

  test("fingerprintOf matches an independent straightforward reimplementation") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 50) {
      val n = rnd.nextInt(40) + 1
      val lens = Array.fill(n)(rnd.nextInt(1000) + 1L)
      val durs = Array.fill(n)(rnd.nextInt(20) + 1L)
      val got = StructFingerprint.fingerprintOf(lens, durs)
      // independent: materialize per-tick lens, then sum cells directly
      val dTot = durs.sum
      val perTick = new Array[Long](dTot.toInt)
      var t = 0
      for (i <- 0 until n; _ <- 0L until durs(i)) { perTick(t) = lens(i); t += 1 }
      var expected = 0L
      val cellA = (0 until 33).map { c =>
        val c0 = c * dTot / 33
        val c1 = math.max(c0 + 1, (c + 1) * dTot / 33)
        (c0 until c1).filter(_ < dTot).map(i => BigInt(perTick(i.toInt))).sum
      }
      for (c <- 0 until 32 if cellA(c) < cellA(c + 1)) expected |= 1L << c
      val cellB = (0 until 33).map { c =>
        val i0 = c * n / 33
        val i1 = math.max(i0 + 1, (c + 1) * n / 33)
        (BigInt((i0 until i1).map(lens(_)).sum), (i1 - i0).toLong)
      }
      for (c <- 0 until 32
           if cellB(c)._1 * cellB(c + 1)._2 < cellB(c + 1)._1 * cellB(c)._2)
        expected |= 1L << (32 + c)
      assert(got === expected, s"n=$n lens=${lens.toSeq} durs=${durs.toSeq}")
    }
  }

  // ---- the re-mux and the invariances ------------------------------------

  test("ivf_to_mp4 is a faithful re-mux: same (len, dur) sequence, real sample tables") {
    for (d <- 0L until 300L) {
      val src = StructFingerprint.generate(d, 1, 1, 0)
      val dst = StructFingerprint.ivfToMp4(src)
      assert(dst != null, s"d=$d")
      val a = StructFingerprint.frameSeq(src).get
      val b = StructFingerprint.frameSeq(dst).get
      assert(b.container === "mp4")
      assert(a.lens.toSeq === b.lens.toSeq, s"d=$d")
      assert(a.durs.toSeq === b.durs.toSeq, s"d=$d")
      // and the MP4 is a real ISO-BMFF file the header tier also reads
      val meta = graft.pipeline.AvHeader.parse(dst)
      assert(meta.exists(_.container == "mp4"), s"d=$d")
    }
  }

  test("re-wrap invariance: fingerprint(ivf_to_mp4(x)) == fingerprint(x), hamming 0") {
    for (d <- 0L until 300L)
      assert(ham(fp(StructFingerprint.generate(d, 1, 1, 0)),
        fp(StructFingerprint.ivfToMp4(StructFingerprint.generate(d, 1, 1, 0)))) === 0, s"d=$d")
  }

  test("re-time ×k invariance: every delay ×k is hamming 0 (33 | D alignment)") {
    for (d <- 0L until 300L; k <- Seq(2L, 3L, 7L)) {
      val f1 = fp(StructFingerprint.generate(d, 1, 1, 0))
      val fk = fp(StructFingerprint.generate(d, k, 1, 0))
      assert(ham(f1, fk) === 0, s"d=$d k=$k")
    }
  }

  test("bitrate ×m invariance: every length ×m is hamming 0, no alignment needed") {
    for (d <- 0L until 300L; m <- Seq(2L, 3L, 9L)) {
      val f1 = fp(StructFingerprint.generate(d, 1, 1, 0))
      val fm = fp(StructFingerprint.generate(d, 1, m, 0))
      assert(ham(f1, fm) === 0, s"d=$d m=$m")
    }
  }

  test("localized edit: one frame's size bump stays a near-dup; distinct content does not") {
    var worst = 0
    for (d <- 0L until 300L) {
      val h = ham(fp(StructFingerprint.generate(d, 1, 1, 0)),
        fp(StructFingerprint.generate(d, 1, 1, 17 + d % 5)))
      worst = math.max(worst, h)
    }
    // the bumped frame overlaps a bounded set of time/index cells;
    // measured envelope over this family (d < 300, bump 17..21):
    assert(worst <= 6, s"edit-twin envelope grew to $worst")
    // sanity: unrelated seeds are NOT near-dups in the typical case
    val far = (0L until 100L).count(d =>
      ham(fp(StructFingerprint.generate(d, 1, 1, 0)),
        fp(StructFingerprint.generate(d + 1000, 1, 1, 0))) > 3)
    assert(far > 90, s"only $far/100 unrelated pairs exceeded the threshold")
  }

  test("generate: closed forms (the ones the oracle replays)") {
    for (d <- Seq(0L, 5L, 42L, 137L)) {
      val n = (d % 9 + 4).toInt
      val u = new Array[Long](n)
      var s = 0L
      for (i <- 1 until n) {
        val j = if (i == n - 1) n - 2 else i
        u(i) = (d * 5 + j * 17) % 11 + 2
        s += u(i)
      }
      u(0) = 33 - s % 33
      assert(u.sum % 33 === 0L, s"d=$d")
      val lens = (0 until n).map(i => (d * 13 + i * 29) % 211 + 24)
      val fs = StructFingerprint.frameSeq(StructFingerprint.generate(d, 1, 1, 0)).get
      assert(fs.lens.toSeq === lens)
      assert(fs.durs.toSeq === u.toSeq)
    }
  }

  test("timeline bound: a PTS jump past 2^48 refuses") {
    val b = ivf(Seq((5, 0L), (5, 1L << 50)))
    assert(StructFingerprint.frameSeq(b).isEmpty)
  }
}
