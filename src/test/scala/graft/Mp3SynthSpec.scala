package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Mp3L3, Mp3Synth}

/** Layer III numeric back half. The ISO-exact stages are pinned by
  * INDEPENDENT properties, not by re-running their own formulas:
  * requantization at integer-exact points, alias butterflies as
  * energy-preserving rotations, IMDCT against a locally-written forward
  * MDCT through the TDAC perfect-reconstruction identity, and the full
  * chain producing real PCM from an actual generated frame. */
class Mp3SynthSpec extends AnyFunSuite {

  test("requantization hits its integer-exact points and scalefactor scaling") {
    def gran(is: Array[Int], gain: Int, sfs: Int, sf: Array[Int], pre: Int) =
      Mp3L3.Granule(0, 0, gain, 0, Array(1, 1, 1), 3, 3, pre, sfs, 0,
        sf, is.padTo(576, 0), 0, 0)
    // gain 210 → 2^0; 8^(4/3) = 16 and 27^(4/3) = 81 exactly
    val is = Array(8, -27, 1)
    val xr = Mp3Synth.requantize(gran(is, 210, 0, new Array[Int](21), 0))
    assert(math.abs(xr(0) - 16.0) < 1e-9)
    assert(math.abs(xr(1) + 81.0) < 1e-9, "sign must carry through")
    assert(math.abs(xr(2) - 1.0) < 1e-9)
    assert(xr.drop(3).forall(_ == 0.0))
    // each global_gain step of 4 doubles the output
    val xr2 = Mp3Synth.requantize(gran(is, 214, 0, new Array[Int](21), 0))
    assert(math.abs(xr2(0) / xr(0) - 2.0) < 1e-12)
    // scalefac_scale=0 → mult 1/2: scalefactor 2 in band 0 halves lines 0-3
    val sf = new Array[Int](21); sf(0) = 2
    val xr3 = Mp3Synth.requantize(gran(is, 210, 0, sf, 0))
    assert(math.abs(xr3(0) - 8.0) < 1e-9)
    // scalefac_scale=1 → mult 1: same scalefactor now quarters
    val xr4 = Mp3Synth.requantize(gran(is, 210, 1, sf, 0))
    assert(math.abs(xr4(0) - 4.0) < 1e-9)
    // preflag adds pretab: band 17 (lines 196..237) has pretab 3
    val is17 = new Array[Int](576); is17(200) = 8
    val g5 = Mp3L3.Granule(0, 0, 210, 0, Array(1, 1, 1), 3, 3, 1, 1, 0,
      new Array[Int](21), is17, 0, 0)
    assert(math.abs(Mp3Synth.requantize(g5)(200) - 16.0 / 8.0) < 1e-9,
      "preflag·pretab[17]=3 at mult 1 must scale by 2^-3")
  }

  test("alias butterflies are rotations: cs²+ca² = 1, energy preserved, involution-consistent") {
    for (i <- 0 until 8)
      assert(math.abs(Mp3Synth.Cs(i) * Mp3Synth.Cs(i) +
        Mp3Synth.Ca(i) * Mp3Synth.Ca(i) - 1.0) < 1e-12)
    val rnd = new scala.util.Random(7)
    val xr = Array.fill(576)(rnd.nextDouble() - 0.5)
    val ar = Mp3Synth.aliasReduce(xr)
    def e(a: Array[Double]) = a.map(v => v * v).sum
    assert(math.abs(e(ar) - e(xr)) < 1e-9, "rotations preserve total energy")
    // inverting each butterfly (the encoder-side aliasing) restores xr
    val inv = ar.clone()
    for (sb <- 1 until 32; i <- 0 until 8) {
      val lo = 18 * sb - 1 - i; val hi = 18 * sb + i
      val a = inv(lo); val b = inv(hi)
      inv(lo) = a * Mp3Synth.Cs(i) + b * Mp3Synth.Ca(i)
      inv(hi) = b * Mp3Synth.Cs(i) - a * Mp3Synth.Ca(i)
    }
    assert(xr.zip(inv).forall { case (a, b) => math.abs(a - b) < 1e-9 })
  }

  test("IMDCT satisfies TDAC: forward MDCT → IMDCT → windowed overlap-add reconstructs") {
    // forward MDCT written HERE, independent of Mp3Synth.imdct36:
    // X[k] = Σ_i w[i]·x[i]·cos(π/72 (2i+1+18)(2k+1))
    def mdct(x: Array[Double]): Array[Double] =
      Array.tabulate(18) { k =>
        (0 until 36).map(i => Mp3Synth.LongWindow(i) * x(i) *
          math.cos(math.Pi / 72.0 * (2 * i + 1 + 18) * (2 * k + 1))).sum
      }
    val rnd = new scala.util.Random(42)
    // three consecutive 18-sample blocks → two overlapping 36-windows
    val signal = Array.fill(54)(rnd.nextDouble() - 0.5)
    val b0 = signal.slice(0, 36)
    val b1 = signal.slice(18, 54)
    val y0 = Mp3Synth.imdct36(mdct(b0)).zipWithIndex.map { case (v, i) =>
      v * Mp3Synth.LongWindow(i) }
    val y1 = Mp3Synth.imdct36(mdct(b1)).zipWithIndex.map { case (v, i) =>
      v * Mp3Synth.LongWindow(i) }
    // the middle 18 samples: tail of window 0 + head of window 1,
    // scaled by the transform's constant 18/2 = 9
    for (t <- 0 until 18) {
      val rec = (y0(18 + t) + y1(t)) / 9.0
      assert(math.abs(rec - signal(18 + t)) < 1e-9,
        s"TDAC reconstruction failed at $t")
    }
  }

  test("polyphase lowpass: a DC subband-0 signal yields near-constant PCM") {
    val st = new Mp3Synth.SynthState()
    val s = new Array[Double](32); s(0) = 1.0
    // warm the 16-slot deep FIFO past its transient
    var last: Array[Double] = null
    for (_ <- 0 until 40) last = st.slot(s)
    val mean = last.sum / 32.0
    assert(mean > 0.1, "subband 0 carries DC through the filterbank")
    // the per-residue Nyquist normalization makes DC reconstruction
    // EXACTLY flat: cos²θ + sin²θ across the two half-phase tap sets
    val dev = last.map(v => math.abs(v - mean)).max
    assert(dev < 1e-9 * math.max(1.0, math.abs(mean)),
      s"DC must reconstruct exactly flat, got mean $mean dev $dev")
    // and a HIGH subband must not leak into the lowpass branch shape:
    // subband 31 input produces an oscillating slot (sign changes)
    val st2 = new Mp3Synth.SynthState()
    val hi = new Array[Double](32); hi(31) = 1.0
    var lastHi: Array[Double] = null
    for (_ <- 0 until 40) lastHi = st2.slot(hi)
    val signFlips = lastHi.sliding(2).count(p => p(0) * p(1) < 0)
    assert(signFlips > 20, s"subband 31 must alternate per sample, flips=$signFlips")
  }

  test("short-block requantization: subblock gains and triplet scalefactors land per window") {
    def gran(is: Array[Int], gain: Int, sfs: Int, sbg: Array[Int],
        sfShort: Array[Int]) =
      Mp3L3.Granule(0, 0, gain, 0, Array(1, 1, -1), -1, -1, 0, sfs, 0,
        new Array[Int](21), is.padTo(576, 0), 0, 0, 2, sbg, sfShort)
    // coded index 0 = band 0 window 0; band widths start at 4, so coded
    // 4..7 = band 0 window 1, coded 8..11 = band 0 window 2
    val is = new Array[Int](576); is(0) = 8; is(4) = 8; is(8) = 8
    val flat = gran(is, 210, 0, Array(0, 0, 0), new Array[Int](36))
    val x0 = Mp3Synth.requantizeShort(flat)
    assert(math.abs(x0(0) - 16.0) < 1e-9 && math.abs(x0(4) - 16.0) < 1e-9 &&
      math.abs(x0(8) - 16.0) < 1e-9)
    // subblock_gain[1] = 1 halves window 1 twice (2^-2), windows 0/2 untouched
    val g1 = Mp3Synth.requantizeShort(gran(is, 210, 0, Array(0, 1, 0),
      new Array[Int](36)))
    assert(math.abs(g1(0) - 16.0) < 1e-9, "window 0 unaffected")
    assert(math.abs(g1(4) - 4.0) < 1e-9, "subblock gain 1 scales by 2^-2")
    assert(math.abs(g1(8) - 16.0) < 1e-9, "window 2 unaffected")
    // short scalefactor (band 0, window 2) = 2 at scalefac_scale 0 → ×2^-1
    val sf = new Array[Int](36); sf(2) = 2
    val g2 = Mp3Synth.requantizeShort(gran(is, 210, 0, Array(0, 0, 0), sf))
    assert(math.abs(g2(0) - 16.0) < 1e-9 && math.abs(g2(8) - 8.0) < 1e-9)
    // no pretab for short blocks: the long path's band-17 emphasis has
    // no analog here — same inputs with preflag set decode identically
    // (preflag is simply not consulted by requantizeShort)
  }

  test("short-block reorder is the spec bijection: (window w, line l) -> 3l + w") {
    val xr = Array.tabulate(576)(_.toDouble + 1)
    val re = Mp3Synth.reorderShort(xr)
    assert(re.toSet === xr.toSet, "reorder must be a bijection (no loss)")
    // band 0 (width 4): coded 0..3 = window 0 lines 0..3 → 3l+0
    assert(re(0) === xr(0) && re(3) === xr(1) && re(6) === xr(2) && re(9) === xr(3))
    // coded 4 = window 1 line 0 → position 1; coded 8 = window 2 line 0 → 2
    assert(re(1) === xr(4) && re(2) === xr(8))
    // band 4 (width 6, lines 16..21): coded start 48; window 2 line 17
    // sits at coded 48 + 2*6 + 1 = 61 → position 3*17+2 = 53
    assert(re(53) === xr(61))
    // the rzero tail (coded >= 408) maps identically
    assert(re(500) === xr(500))
  }

  test("IMDCT-12 satisfies TDAC against an independent forward MDCT-12") {
    def mdct12(x: Array[Double]): Array[Double] =
      Array.tabulate(6) { k =>
        (0 until 12).map(i => Mp3Synth.ShortWindow(i) * x(i) *
          math.cos(math.Pi / 24.0 * (2 * i + 1 + 6) * (2 * k + 1))).sum
      }
    val rnd = new scala.util.Random(11)
    val signal = Array.fill(18)(rnd.nextDouble() - 0.5)
    val y0 = Mp3Synth.imdct12(mdct12(signal.slice(0, 12))).zipWithIndex
      .map { case (v, i) => v * Mp3Synth.ShortWindow(i) }
    val y1 = Mp3Synth.imdct12(mdct12(signal.slice(6, 18))).zipWithIndex
      .map { case (v, i) => v * Mp3Synth.ShortWindow(i) }
    // middle 6 samples reconstruct at the transform's n/4 = 3 gain
    for (t <- 0 until 6) {
      val rec = (y0(6 + t) + y1(t)) / 3.0
      assert(math.abs(rec - signal(6 + t)) < 1e-9, s"short TDAC failed at $t")
    }
  }

  test("start/stop windows: closed-form shapes splice long and short halves") {
    val st = Mp3Synth.StartWindow; val sp = Mp3Synth.StopWindow
    for (i <- 0 until 18)
      assert(st(i) === Mp3Synth.LongWindow(i), "start rises like the long window")
    for (i <- 18 until 24) assert(st(i) === 1.0)
    for (i <- 30 until 36) assert(st(i) === 0.0)
    // stop is start mirrored: w_stop(i) = w_start(35 - i)
    for (i <- 0 until 36)
      assert(math.abs(sp(i) - st(35 - i)) < 1e-12, s"mirror broke at $i")
  }

  test("full chain handles window-switching frames: short/start/stop granules reach PCM") {
    for (seed <- 0L until 8L) {
      val pcm = Mp3Synth.decodePcm(Mp3L3.genShort(seed))
        .getOrElse(fail(s"seed $seed: no decode"))
      assert(pcm.length === 1152)
      assert(pcm.forall(v => !v.isNaN && !v.isInfinite))
      assert(pcm.exists(_ != 0.0), s"seed $seed: window-switched frame carries signal")
    }
  }

  test("mixed-block reorder: identity on the long region, short bijection above") {
    val xr = Array.tabulate(576)(_.toDouble + 1)
    val out = Mp3Synth.reorderMixed(xr)
    // lines 0–35 (the two long-windowed subbands) stay in place
    assert(out.take(36).toSeq === xr.take(36).toSeq)
    // lines 36+ are a permutation of the coded 36+ values (bijection)
    assert(out.drop(36).sorted.toSeq === xr.drop(36).sorted.toSeq)
    assert(out.drop(36).toSeq !== xr.drop(36).toSeq, "the short map does move lines")
  }

  test("mixed-block requantization: pretab on the long region, subblock gains above") {
    import graft.pipeline.Mp3L3.Granule
    def gran(preflag: Int, sbg: Array[Int]): Granule = {
      val is = new Array[Int](576)
      is(30) = 8    // long region, band 7 (lines 30..35)
      is(36) = 8    // short region start: band 3, window 0
      Granule(0, 0, 210, 0, Array(1, 1, -1), -1, -1, preflag, 0, 0,
        new Array[Int](21), is, 0, 0, blockType = 2, subblockGain = sbg,
        scalefacsShort = new Array[Int](36), mixed = 1)
    }
    val plain = Mp3Synth.requantizeMixed(gran(0, Array(0, 0, 0)))
    assert(math.abs(plain(30) - 16.0) < 1e-12, "8^(4/3) = 16 at gain 210")
    assert(math.abs(plain(36) - 16.0) < 1e-12)
    // preflag applies pretab only to the LONG region (band 7 → pretab 0;
    // use band 17 line? long region is bands 0..7 — pretab(7) = 0, so
    // check instead that the short region ignores a live subblock gain
    // on window 0 while the long region keeps it out entirely
    val gained = Mp3Synth.requantizeMixed(gran(0, Array(1, 0, 0)))
    assert(math.abs(gained(30) - 16.0) < 1e-12, "long region has no subblock gain")
    assert(math.abs(gained(36) - 16.0 / 4.0) < 1e-12,
      "short window 0 scales by 2^(-2·sbg)")
  }

  test("MS un-matrixing is the spec rotation: L=(M+S)/√2, R=(M−S)/√2") {
    val m = Array.tabulate(576)(i => math.sin(i * 0.1))
    val s = Array.tabulate(576)(i => math.cos(i * 0.17))
    val m0 = m.clone(); val s0 = s.clone()
    Mp3Synth.msMatrix(m, s)
    val inv = 1.0 / math.sqrt(2.0)
    (0 until 576).foreach { i =>
      assert(math.abs(m(i) - (m0(i) + s0(i)) * inv) < 1e-12)
      assert(math.abs(s(i) - (m0(i) - s0(i)) * inv) < 1e-12)
    }
    // matrixing twice is the identity (the transform is an involution
    // up to the orthonormal scaling): M' = (L+R)/√2 = M
    Mp3Synth.msMatrix(m, s)
    (0 until 576).foreach { i =>
      assert(math.abs(m(i) - m0(i)) < 1e-12 && math.abs(s(i) - s0(i)) < 1e-12)
    }
  }

  test("full chain handles stereo frames: plain and MS both reach 2×1152 PCM") {
    for (seed <- 0L until 8L) {
      val pcm = Mp3Synth.decodePcmStereo(Mp3L3.genStereo(seed))
        .getOrElse(fail(s"seed $seed: no stereo decode"))
      assert(pcm.length === 2 && pcm.forall(_.length == 1152))
      assert(pcm.forall(_.forall(v => !v.isNaN && !v.isInfinite)))
      assert(pcm(0).exists(_ != 0.0) && pcm(1).exists(_ != 0.0),
        s"seed $seed: both channels carry signal")
      // mono path refuses stereo input and vice versa
      assert(Mp3Synth.decodePcm(Mp3L3.genStereo(seed)) === None)
      assert(Mp3Synth.decodePcmStereo(Mp3L3.gen(seed)) === None)
    }
  }

  test("plain-stereo channels synthesize independently: ch0 matches a mono chain") {
    // seed 0 → mode 00 (no MS): channel 0's payloads are GranParams
    // slots 0 and 2; a hand-built mono frame with those same params
    // must produce identical PCM through the full chain
    val st = Mp3Synth.decodePcmStereo(Mp3L3.genStereo(0L)).get
    val d = Mp3L3.decode(Mp3L3.genStereo(0L)).get
    val overlap = Array.ofDim[Double](32, 18)
    val state = new Mp3Synth.SynthState()
    val expect = new Array[Double](1152)
    for (g <- 0 until 2) {
      val gr = d.granules(2 * g) // channel 0 of granule g
      val xr = Mp3Synth.aliasReduce(Mp3Synth.requantize(gr))
      val slots = Mp3Synth.subbandSynth(xr, overlap, gr.blockType)
      for (t <- 0 until 18)
        System.arraycopy(state.slot(slots(t)), 0, expect, g * 576 + t * 32, 32)
    }
    assert(st(0).toSeq === expect.toSeq)
  }

  test("intensity stereo: zero-region bands reconstruct from is_pos, lower bands MS or pass") {
    import graft.pipeline.Mp3L3
    import graft.pipeline.Mp3L3.Granule
    // right channel coded through line 35 (band 7 ends at 36): the
    // intensity region starts at band 8 (line 36)
    def gran(sf: Array[Int], nzUpTo: Int): Granule = {
      val is = new Array[Int](576)
      (0 until nzUpTo).foreach(i => is(i) = 1)
      Granule(0, 0, 210, 0, Array(1, 1, 1), 3, 3, 0, 0, 0,
        sf, is, 0, 0)
    }
    val sfR = new Array[Int](21)
    sfR(8) = 3  // is_pos 3 → tan(π/4) = 1 → 50/50 split
    sfR(9) = 6  // all left
    sfR(10) = 0 // all right
    sfR(11) = 7 // illegal → MS under ext 11, untouched under ext 01
    sfR(20) = 6 // band 21 (no scalefactor of its own) must REUSE this
    val grR = gran(sfR, 36)
    def freshLR(): (Array[Double], Array[Double]) = {
      val l = new Array[Double](576)
      val r = new Array[Double](576)
      (0 until 576).foreach { i => l(i) = 8.0; r(i) = if (i < 36) 2.0 else 0.0 }
      (l, r)
    }
    val s8 = Mp3L3.Sfb44100(8); val s9 = Mp3L3.Sfb44100(9)
    val s10 = Mp3L3.Sfb44100(10); val s11 = Mp3L3.Sfb44100(11)
    // ext 01: intensity only — lower bands untouched
    val (l1, r1) = freshLR()
    Mp3Synth.intensityStereo(l1, r1, grR, ms = false)
    assert(l1(0) === 8.0 && r1(0) === 2.0, "below the region: pass-through")
    assert(math.abs(l1(s8) - 4.0) < 1e-12 && math.abs(r1(s8) - 4.0) < 1e-12,
      "is_pos 3 splits 50/50")
    assert(l1(s9) === 8.0 && r1(s9) === 0.0, "is_pos 6: all left")
    assert(l1(s10) === 0.0 && r1(s10) === 8.0, "is_pos 0: all right")
    assert(l1(s11) === 8.0 && r1(s11) === 0.0, "is_pos 7 without MS: untouched")
    val s20 = Mp3L3.Sfb44100(20); val s21 = Mp3L3.Sfb44100(21)
    assert(l1(s20) === 8.0 && r1(s20) === 0.0, "band 20: is_pos 6 all left")
    assert(l1(s21) === 8.0 && r1(s21) === 0.0,
      "band 21 reuses the PRECEDING band's is_pos (§2.4.3.4.9.3), not 0")
    // ext 11: intensity + MS — lower bands and illegal-is_pos bands MS
    val (l2, r2) = freshLR()
    Mp3Synth.intensityStereo(l2, r2, grR, ms = true)
    val inv = 1.0 / math.sqrt(2.0)
    assert(math.abs(l2(0) - 10.0 * inv) < 1e-12 && math.abs(r2(0) - 6.0 * inv) < 1e-12,
      "below the region: MS")
    assert(math.abs(l2(s11) - 8.0 * inv) < 1e-12 && math.abs(r2(s11) - 8.0 * inv) < 1e-12,
      "is_pos 7 under ext 11: MS")
    assert(math.abs(l2(s8) - 4.0) < 1e-12, "intensity bands unchanged by the MS flag")
  }

  test("full chain handles intensity frames: ext 01 and 11 reach 2×1152 PCM") {
    for (seed <- 0L until 8L) {
      val pcm = Mp3Synth.decodePcmStereo(Mp3L3.genStereoInt(seed))
        .getOrElse(fail(s"seed $seed: no intensity decode"))
      assert(pcm.length === 2 && pcm.forall(_.length == 1152))
      assert(pcm.forall(_.forall(v => !v.isNaN && !v.isInfinite)))
      assert(pcm(0).exists(_ != 0.0), s"seed $seed: left carries signal")
    }
  }

  test("full chain handles mixed-block frames: both granule flavors reach PCM") {
    for (seed <- 0L until 8L) {
      val pcm = Mp3Synth.decodePcm(Mp3L3.genMixed(seed))
        .getOrElse(fail(s"seed $seed: no decode"))
      assert(pcm.length === 1152)
      assert(pcm.forall(v => !v.isNaN && !v.isInfinite))
      assert(pcm.exists(_ != 0.0), s"seed $seed: mixed frame carries signal")
    }
  }

  test("full chain: a generated frame decodes to 1152 finite, nonzero PCM samples") {
    for (seed <- Seq(3L, 42L)) {
      val pcm = Mp3Synth.decodePcm(Mp3L3.gen(seed))
        .getOrElse(fail(s"seed $seed: no decode"))
      assert(pcm.length === 1152)
      assert(pcm.forall(v => !v.isNaN && !v.isInfinite))
      assert(pcm.count(_ != 0.0) > 600, "the frame carries signal")
      // escape-edition frames reach PCM too
      val pcmEsc = Mp3Synth.decodePcm(Mp3L3.genEsc(seed))
        .getOrElse(fail(s"seed $seed esc: no decode"))
      assert(pcmEsc.length === 1152 && pcmEsc.exists(_ != 0.0))
    }
    // out-of-scope stays None through the chain
    assert(Mp3Synth.decodePcm(Array[Byte](1, 2, 3)) === None)
    // the ISO-window seam: a caller-supplied window is used verbatim
    val zeroWin = new Array[Double](512)
    val silent = Mp3Synth.withWindow(Mp3L3.gen(3L), zeroWin).get
    assert(silent.forall(_ == 0.0), "zero window ⇒ zero PCM (seam is live)")
  }
}
