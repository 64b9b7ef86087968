package graft.pipeline

/** MPEG-1 Layer III numeric back half: spectral lines → PCM samples.
  * Continues where [[Mp3L3]] (the entropy half) stops — requantization
  * (ISO/IEC 11172-3 §2.4.3.4.7.1, incl. short-block subblock gains),
  * the short-block reorder (§2.4.3.4.8), alias reduction
  * (§2.4.3.4.10.1, long-type granules), the 36- and 12-point IMDCTs
  * with all four window types + overlap-add (§2.4.3.4.12), frequency
  * inversion, and the polyphase synthesis filterbank (§2.4.3.4.13) —
  * mono, 44.1 kHz, long/start/short/stop block types INCLUDING mixed
  * blocks (block_type 2 + mixed_block_flag: the two lowest subbands
  * long-windowed over long scalefactor bands 0–7 with pretab, lines
  * 36+ short bands 3–11, alias reduction confined to the one
  * long–long boundary).
  *
  * Faithfulness boundary, stage by stage:
  *   - requantization, alias reduction, IMDCT, windowing, overlap-add,
  *     frequency inversion, and the polyphase MATRIXING
  *     `N(i,k) = cos((16+i)(2k+1)π/64)` are all CLOSED FORMS in the
  *     standard and implemented exactly (Mp3SynthSpec pins the
  *     rotation identity of the alias butterflies, the TDAC
  *     perfect-reconstruction property of the IMDCT against an
  *     independently-written forward MDCT, and requantization's
  *     integer-exact points such as 8^(4/3) = 16);
  *   - the 512-tap synthesis WINDOW `D` (Annex B Table B.3) is TABLE
  *     DATA with no closed form. [[synthesisWindow]] is a documented
  *     SUBSTITUTE — a Blackman-windowed sinc lowpass at the same
  *     cutoff (π/64), the textbook prototype the MUSICAM window was
  *     designed as — so the chain produces real, correctly-shaped PCM;
  *     bit-exact ISO output requires swapping in the Annex B values at
  *     this one seam ([[withWindow]]). Every stage before the window
  *     is ISO-exact regardless.
  *
  * Scale: pure per-row kernels invoked from scan-stage expressions;
  * nothing here shuffles or leaves the task.
  */
object Mp3Synth {

  // ==== §2.4.3.4.7.1 requantization ======================================

  /** ISO pretab: the preflag emphasis added to the scalefactor of each
    * long-block band. */
  val Pretab: Array[Int] = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0)

  /** Spectral line index → long-block scalefactor band (0..20; lines at
    * or past sfb 21's start keep band 21 = no scalefactor). */
  private val bandOfLine: Array[Int] = {
    val a = new Array[Int](576)
    var b = 0
    var i = 0
    while (i < 576) {
      while (b < 21 && i >= Mp3L3.Sfb44100(b + 1)) b += 1
      a(i) = b
      i += 1
    }
    a
  }

  /** xr[i] = sign(is) · |is|^(4/3) · 2^((gain−210)/4) ·
    * 2^(−mult·(scalefac[sfb] + preflag·pretab[sfb])), mult =
    * (scalefac_scale + 1) / 2 ∈ {0.5, 1}. */
  def requantize(g: Mp3L3.Granule): Array[Double] = {
    val xr = new Array[Double](576)
    val gainPow = math.pow(2.0, (g.globalGain - 210) / 4.0)
    val mult = 0.5 * (g.scalefacScale + 1)
    var i = 0
    while (i < 576) {
      val v = g.is(i)
      if (v != 0) {
        val band = bandOfLine(i)
        val sf = if (band < 21) g.scalefacs(band) + g.preflag * Pretab(band) else 0
        val mag = math.pow(math.abs(v).toDouble, 4.0 / 3.0) *
          gainPow * math.pow(2.0, -mult * sf)
        xr(i) = if (v < 0) -mag else mag
      }
      i += 1
    }
    xr
  }

  // ==== short blocks: requantize + reorder (§2.4.3.4.7.1, §2.4.3.4.8) ====

  /** Coded-order short-block band layout: coded index k sits in band b
    * where 3·SfbShort(b) ≤ k < 3·SfbShort(b+1), at window
    * w = (k − 3·SfbShort(b)) / width(b). Precomputed per line. */
  private val shortBandOfCoded: Array[Int] = new Array[Int](576)
  private val shortWindowOfCoded: Array[Int] = new Array[Int](576)
  private val shortLineOfCoded: Array[Int] = new Array[Int](576)
  locally {
    val s = Mp3L3.SfbShort44100
    var k = 0
    while (k < 576) {
      if (k >= 3 * s(12)) {
        // rzero tail past the last short band: band 11 scaling by
        // convention; the triplet structure ℓ = k/3, w = k mod 3 makes
        // the reorder the identity here (3ℓ + w = k), keeping it a
        // bijection overall
        shortBandOfCoded(k) = 11
        shortWindowOfCoded(k) = k % 3
        shortLineOfCoded(k) = k / 3
      } else {
        var b = 0
        while (k >= 3 * s(b + 1)) b += 1
        val width = s(b + 1) - s(b)
        val off = k - 3 * s(b)
        shortBandOfCoded(k) = b
        shortWindowOfCoded(k) = off / width
        shortLineOfCoded(k) = s(b) + off % width
      }
      k += 1
    }
  }

  /** Short-block (block_type 2, non-mixed) requantization in CODED
    * order: no pretab, and each window carries its subblock gain
    * 2^(−2·subblock_gain[w]) on top of the global gain
    * (§2.4.3.4.7.1's 8·subblock_gain[w]/4 exponent term). */
  def requantizeShort(g: Mp3L3.Granule): Array[Double] = {
    val xr = new Array[Double](576)
    val mult = 0.5 * (g.scalefacScale + 1)
    val winGain = Array.tabulate(3)(w =>
      math.pow(2.0, (g.globalGain - 210 - 8 * g.subblockGain(w)) / 4.0))
    var k = 0
    while (k < 576) {
      val v = g.is(k)
      if (v != 0) {
        val b = shortBandOfCoded(k)
        val w = shortWindowOfCoded(k)
        val sf = if (b < 12 && g.scalefacsShort != null) g.scalefacsShort(b * 3 + w) else 0
        val mag = math.pow(math.abs(v).toDouble, 4.0 / 3.0) *
          winGain(w) * math.pow(2.0, -mult * sf)
        xr(k) = if (v < 0) -mag else mag
      }
      k += 1
    }
    xr
  }

  /** §2.4.3.4.8 reorder: coded band-major triplets → the filterbank's
    * interleaved layout, where (window w, within-window line ℓ) lands
    * at 3ℓ + w — so subband sb's 18 lines are its 6 points × 3
    * windows, point-major. A bijection on 0..575 (spec-pinned). */
  def reorderShort(xr: Array[Double]): Array[Double] = {
    val out = new Array[Double](576)
    var k = 0
    while (k < 576) {
      out(3 * shortLineOfCoded(k) + shortWindowOfCoded(k)) = xr(k)
      k += 1
    }
    out
  }

  // ==== mixed blocks (block_type 2 + mixed_block_flag) ===================

  /** Mixed-block requantization in coded order: lines 0–35 (the two
    * long-windowed subbands) long-style over long bands 0–7 WITH
    * pretab; lines 36+ short-style over short bands 3–11 with
    * subblock gains. Short band 3 starts at line 12 and 3·12 = 36, so
    * the short-region triplet layout begins exactly where the long
    * region ends. */
  def requantizeMixed(g: Mp3L3.Granule): Array[Double] = {
    val xr = new Array[Double](576)
    val mult = 0.5 * (g.scalefacScale + 1)
    val gainPow = math.pow(2.0, (g.globalGain - 210) / 4.0)
    val winGain = Array.tabulate(3)(w =>
      math.pow(2.0, (g.globalGain - 210 - 8 * g.subblockGain(w)) / 4.0))
    var k = 0
    while (k < 576) {
      val v = g.is(k)
      if (v != 0) {
        val mag =
          if (k < 36) {
            val band = bandOfLine(k) // 0..7 here
            val sf = g.scalefacs(band) + g.preflag * Pretab(band)
            math.pow(math.abs(v).toDouble, 4.0 / 3.0) * gainPow *
              math.pow(2.0, -mult * sf)
          } else {
            val b = shortBandOfCoded(k) // ≥ 3 for k ≥ 36
            val w = shortWindowOfCoded(k)
            val sf = if (b < 12 && g.scalefacsShort != null) g.scalefacsShort(b * 3 + w) else 0
            math.pow(math.abs(v).toDouble, 4.0 / 3.0) * winGain(w) *
              math.pow(2.0, -mult * sf)
          }
        xr(k) = if (v < 0) -mag else mag
      }
      k += 1
    }
    xr
  }

  /** Mixed-block reorder: identity on the long region (lines 0–35),
    * the §2.4.3.4.8 triplet map on lines 36+ — which lands entirely in
    * [36, 576) because the coded short region starts at band 3
    * (ℓ ≥ SfbShort(3) = 12 ⇒ 3ℓ + w ≥ 36), so the two regions never
    * collide and the whole map stays a bijection. */
  def reorderMixed(xr: Array[Double]): Array[Double] = {
    val out = new Array[Double](576)
    System.arraycopy(xr, 0, out, 0, 36)
    var k = 36
    while (k < 576) {
      out(3 * shortLineOfCoded(k) + shortWindowOfCoded(k)) = xr(k)
      k += 1
    }
    out
  }

  // ==== §2.4.3.4.10.1 alias reduction ====================================

  private val Ci: Array[Double] =
    Array(-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037)
  val Cs: Array[Double] = Ci.map(c => 1.0 / math.sqrt(1.0 + c * c))
  val Ca: Array[Double] = Ci.map(c => c / math.sqrt(1.0 + c * c))

  /** Eight butterflies across each of the first `nBounds` subband
    * boundaries (long blocks reduce all 31; MIXED blocks only the one
    * boundary between the two long-windowed subbands, §2.4.3.4.10.1).
    * In place on a copy. */
  def aliasReduce(xr: Array[Double], nBounds: Int = 31): Array[Double] = {
    val x = xr.clone()
    var sb = 1
    while (sb < 1 + nBounds) {
      val base = 18 * sb
      var i = 0
      while (i < 8) {
        val lo = base - 1 - i
        val hi = base + i
        val a = x(lo); val b = x(hi)
        x(lo) = a * Cs(i) - b * Ca(i)
        x(hi) = b * Cs(i) + a * Ca(i)
        i += 1
      }
      sb += 1
    }
    x
  }

  // ==== §2.4.3.4.12 IMDCT, window, overlap-add ===========================

  /** 18-in / 36-out long-block IMDCT:
    * x[i] = Σ_k X[k] cos(π/72 (2i+1+18)(2k+1)). */
  def imdct36(xk: Array[Double]): Array[Double] = {
    val out = new Array[Double](36)
    var i = 0
    while (i < 36) {
      var s = 0.0
      var k = 0
      while (k < 18) {
        s += xk(k) * math.cos(math.Pi / 72.0 * (2 * i + 1 + 18) * (2 * k + 1))
        k += 1
      }
      out(i) = s
      i += 1
    }
    out
  }

  /** Long-block (block_type 0) sine window. */
  val LongWindow: Array[Double] =
    Array.tabulate(36)(i => math.sin(math.Pi / 36.0 * (i + 0.5)))

  /** Block_type 1 (start): long rise, flat top, short fall into the
    * zero tail that the following short block's lead-in occupies
    * (§2.4.3.4.12.3 — all closed forms). */
  val StartWindow: Array[Double] = Array.tabulate(36) { i =>
    if (i < 18) math.sin(math.Pi / 36.0 * (i + 0.5))
    else if (i < 24) 1.0
    else if (i < 30) math.sin(math.Pi / 12.0 * (i - 18 + 0.5))
    else 0.0
  }

  /** Block_type 3 (stop): the start window mirrored. */
  val StopWindow: Array[Double] = Array.tabulate(36) { i =>
    if (i < 6) 0.0
    else if (i < 12) math.sin(math.Pi / 12.0 * (i - 6 + 0.5))
    else if (i < 18) 1.0
    else math.sin(math.Pi / 36.0 * (i + 0.5))
  }

  /** Short sine window over the 12-sample short transform. */
  val ShortWindow: Array[Double] =
    Array.tabulate(12)(i => math.sin(math.Pi / 12.0 * (i + 0.5)))

  /** 6-in / 12-out short-block IMDCT:
    * x[i] = Σ_k X[k] cos(π/24 (2i+1+6)(2k+1)). */
  def imdct12(xk: Array[Double]): Array[Double] = {
    val out = new Array[Double](12)
    var i = 0
    while (i < 12) {
      var s = 0.0
      var k = 0
      while (k < 6) {
        s += xk(k) * math.cos(math.Pi / 24.0 * (2 * i + 1 + 6) * (2 * k + 1))
        k += 1
      }
      out(i) = s
      i += 1
    }
    out
  }

  /** One short-block subband: 18 reordered lines (6 points × 3 windows,
    * point-major: line 3p + w) → the 36-sample vector the overlap-add
    * consumes. Each window's 12 windowed IMDCT samples overlap at
    * 6-sample offsets starting at position 6 (§2.4.3.4.12.4): the
    * first/last 6 slots stay zero, which is exactly what the
    * neighboring start/stop windows' flat-and-zero regions expect. */
  def shortSubband(sub: Array[Double], off: Int): Array[Double] = {
    val out = new Array[Double](36)
    var w = 0
    while (w < 3) {
      val xk = new Array[Double](6)
      var p = 0
      while (p < 6) { xk(p) = sub(off + 3 * p + w); p += 1 }
      val x = imdct12(xk)
      var i = 0
      while (i < 12) { out(6 + 6 * w + i) += x(i) * ShortWindow(i); i += 1 }
      w += 1
    }
    out
  }

  /** One granule's 32 subbands: per-subband inverse transform + window
    * (by `blockType`: 0 long sine, 1 start, 2 three short transforms,
    * 3 stop; with `mixed` the two lowest subbands of a type-2 granule
    * take the LONG sine window per §2.4.3.4.12), overlap-add with the
    * carried state (18 doubles per subband), frequency inversion on
    * odd samples of odd subbands. Returns 18 time slots × 32 subband
    * samples; `overlap` is updated in place. */
  def subbandSynth(xr: Array[Double], overlap: Array[Array[Double]],
      blockType: Int = 0, mixed: Boolean = false): Array[Array[Double]] = {
    val slots = Array.ofDim[Double](18, 32)
    val longWin = blockType match {
      case 1 => StartWindow
      case 3 => StopWindow
      case _ => LongWindow
    }
    var sb = 0
    while (sb < 32) {
      val x =
        if (blockType == 2 && !(mixed && sb < 2)) shortSubband(xr, 18 * sb)
        else {
          val xk = java.util.Arrays.copyOfRange(xr, 18 * sb, 18 * sb + 18)
          val z = imdct36(xk)
          var i = 0
          while (i < 36) { z(i) *= longWin(i); i += 1 }
          z
        }
      val ov = overlap(sb)
      var t = 0
      while (t < 18) {
        var v = x(t) + ov(t)
        // frequency inversion: odd time samples of odd subbands negate
        if ((sb & 1) == 1 && (t & 1) == 1) v = -v
        slots(t)(sb) = v
        t += 1
      }
      t = 0
      while (t < 18) { ov(t) = x(18 + t); t += 1 }
      sb += 1
    }
    slots
  }

  // ==== §2.4.3.4.13 polyphase synthesis ==================================

  /** Matrixing N(i,k) = cos((16+i)(2k+1)π/64), 64×32 — closed form. */
  private val N: Array[Array[Double]] = Array.tabulate(64, 32) { (i, k) =>
    math.cos((16 + i) * (2 * k + 1) * math.Pi / 64.0)
  }

  /** The synthesis window seam. Annex B Table B.3 is unreproducible
    * table data (no closed form exists); this substitute carries the
    * same STRUCTURE the ISO window does — a smooth lowpass envelope
    * times the filterbank's own modulation pattern, which is why the
    * ISO table is signed:
    *
    *   D[n] = e[n] / S[n mod 64] · cos((16 + n mod 64) π/64)
    *
    * with e a Blackman-windowed sinc at cutoff π/64 (the 32-band
    * subband width) and S[r] = Σ_m e[r + 64m] the per-residue
    * polyphase sum. The normalization makes the per-residue Nyquist
    * condition EXACT, so a constant subband input reconstructs to an
    * exactly constant PCM level (cos²θ + sin²θ = 1 across the two
    * half-phase tap sets) — the filterbank is near-perfect-
    * reconstruction by construction, not merely lowpass-shaped. Swap
    * in the Annex B values via [[withWindow]] for bit-exact ISO
    * output; every stage before this seam is ISO-exact already. */
  val synthesisWindow: Array[Double] = {
    val e = Array.tabulate(512) { n =>
      val x = n - 255.5
      val a = math.Pi * x / 64.0
      val sinc = if (math.abs(a) < 1e-12) 1.0 else math.sin(a) / a
      val w = 0.42 - 0.5 * math.cos(2 * math.Pi * n / 511.0) +
        0.08 * math.cos(4 * math.Pi * n / 511.0)
      sinc * w
    }
    val s = new Array[Double](64)
    for (n <- 0 until 512) s(n % 64) += e(n)
    Array.tabulate(512) { n =>
      val r = n % 64
      e(n) / s(r) * math.cos((16 + r) * math.Pi / 64.0)
    }
  }

  /** Streaming polyphase state: the 1024-deep V FIFO. */
  final class SynthState(val window: Array[Double] = synthesisWindow) {
    val v = new Array[Double](1024)

    /** One time slot: 32 subband samples → 32 PCM samples. */
    def slot(s: Array[Double]): Array[Double] = {
      // shift V by 64
      System.arraycopy(v, 0, v, 64, 1024 - 64)
      var i = 0
      while (i < 64) {
        var acc = 0.0
        var k = 0
        while (k < 32) { acc += N(i)(k) * s(k); k += 1 }
        v(i) = acc
        i += 1
      }
      // build U (§2.4.3.4.13 alternating halves), window, sum 16 taps
      val u = new Array[Double](512)
      var j = 0
      while (j < 8) {
        var c = 0
        while (c < 32) {
          u(j * 64 + c) = v(j * 128 + c)
          u(j * 64 + 32 + c) = v(j * 128 + 96 + c)
          c += 1
        }
        j += 1
      }
      val pcm = new Array[Double](32)
      var p = 0
      while (p < 32) {
        var acc = 0.0
        var t = 0
        while (t < 16) { acc += u(p + 32 * t) * window(p + 32 * t); t += 1 }
        pcm(p) = acc
        p += 1
      }
      pcm
    }
  }

  /** §2.4.3.4.9.1 MS un-matrixing on requantized spectra:
    * L = (M + S)/√2, R = (M − S)/√2, in place over both arrays. */
  def msMatrix(m: Array[Double], s: Array[Double]): Unit =
    msMatrixRange(m, s, 0, 576)

  private def msMatrixRange(m: Array[Double], s: Array[Double],
      from: Int, until: Int): Unit = {
    val inv = 1.0 / math.sqrt(2.0)
    var i = from
    while (i < until) {
      val mi = m(i); val si = s(i)
      m(i) = (mi + si) * inv
      s(i) = (mi - si) * inv
      i += 1
    }
  }

  /** §2.4.3.4.9.3 INTENSITY stereo on requantized LONG-block spectra,
    * in place. The intensity region starts at the first scalefactor
    * band boundary at or past the right channel's last coded nonzero
    * line (§2.4.3.4.9.2's zero part); in it, each band's right-channel
    * scalefactor is the intensity position: is_ratio = tan(is_pos·π/12),
    * L = v·ratio/(1+ratio), R = v/(1+ratio) from the left channel's v
    * (is_pos 6 is the all-left pole, handled exactly; band 21 has no
    * scalefactor of its own and REUSES the previous band's is_pos per
    * §2.4.3.4.9.3's "sfb of the preceding partition" rule). An
    * illegal is_pos 7 leaves the band to
    * MS (when `ms`, the ext-11 combination) or untouched — and bands
    * BELOW the region get MS under ext 11, pass-through under ext 01. */
  def intensityStereo(l: Array[Double], r: Array[Double],
      grR: Mp3L3.Granule, ms: Boolean): Unit = {
    var last = -1
    var i = 0
    while (i < 576) { if (grR.is(i) != 0) last = i; i += 1 }
    var startBand = 0
    while (startBand < 22 && Mp3L3.Sfb44100(startBand) < last + 1) startBand += 1
    if (ms) msMatrixRange(l, r, 0, Mp3L3.Sfb44100(startBand))
    var b = startBand
    while (b < 22) {
      // Band 21 carries no transmitted scalefactor; ISO reuses the
      // PRECEDING band's is_pos for that top partition (not 0, which
      // would hard-pan it right).
      val isPos = if (b < 21) grR.scalefacs(b) else grR.scalefacs(20)
      val lo = Mp3L3.Sfb44100(b)
      val hi = Mp3L3.Sfb44100(b + 1)
      if (isPos == 6) {
        var k = lo
        while (k < hi) { r(k) = 0.0; k += 1 } // tan(π/2) pole: all left
      } else if (isPos < 7) {
        val ratio = math.tan(isPos * math.Pi / 12.0)
        val cl = ratio / (1.0 + ratio)
        val cr = 1.0 / (1.0 + ratio)
        var k = lo
        while (k < hi) {
          val v = l(k)
          l(k) = v * cl
          r(k) = v * cr
          k += 1
        }
      } else if (ms) msMatrixRange(l, r, lo, hi)
      b += 1
    }
  }

  /** One granule's coded spectrum → filterbank-order xr by block
    * type: requantize (+ reorder) + the block-type-appropriate alias
    * reduction. */
  private def granXr(gr: Mp3L3.Granule): Array[Double] =
    if (gr.blockType == 2 && gr.mixed == 1)
      aliasReduce(reorderMixed(requantizeMixed(gr)), 1)
    else if (gr.blockType == 2) reorderShort(requantizeShort(gr))
    else aliasReduce(requantize(gr))

  /** Decode a full frame to PCM: entropy half → requantize (+ reorder
    * for short granules) → alias (long-type granules only) →
    * inverse transform/overlap by block type → polyphase. Two
    * granules × 18 slots × 32 samples = 1152 doubles, or None outside
    * the entropy half's MONO scope (stereo goes through
    * [[decodePcmStereo]]). */
  def decodePcm(frame: Array[Byte],
      window: Array[Double] = synthesisWindow): Option[Array[Double]] =
    Mp3L3.decode(frame).filter(_.channels == 1).map { d =>
      val overlap = Array.ofDim[Double](32, 18)
      val state = new SynthState(window)
      val out = new Array[Double](1152)
      var g = 0
      while (g < 2) {
        val gr = d.granules(g)
        val xr = granXr(gr)
        val slots = subbandSynth(xr, overlap, gr.blockType, gr.mixed == 1)
        var t = 0
        while (t < 18) {
          val pcm = state.slot(slots(t))
          System.arraycopy(pcm, 0, out, g * 576 + t * 32, 32)
          t += 1
        }
        g += 1
      }
      out
    }

  /** STEREO decode to PCM: per-channel requantize (+ reorder), the
    * §2.4.3.4.9.1 MS un-matrixing when the frame's joint-stereo MS
    * extension is on — applied to the requantized spectra BEFORE
    * alias reduction, so the alias/IMDCT stages run on each
    * reconstructed channel exactly as they do in mono — then
    * per-channel overlap-add state and polyphase FIFO. Returns
    * 2 × 1152 samples, or None for mono/out-of-scope streams. */
  def decodePcmStereo(frame: Array[Byte],
      window: Array[Double] = synthesisWindow): Option[Array[Array[Double]]] =
    Mp3L3.decode(frame).filter { d =>
      // intensity processing is long-block scoped here: the per-window
      // zero boundaries of short/mixed granules are out of scope
      d.channels == 2 &&
        (!d.intensity || d.granules.forall(_.blockType != 2))
    }.map { d =>
      val overlap = Array.fill(2)(Array.ofDim[Double](32, 18))
      val states = Array.fill(2)(new SynthState(window))
      val out = Array.ofDim[Double](2, 1152)
      var g = 0
      while (g < 2) {
        val grL = d.granules(2 * g)
        val grR = d.granules(2 * g + 1)
        // MS matrixing is defined on requantized values; both channels
        // must share block geometry for the per-line sum to be
        // meaningful (our generator always does)
        val xrs =
          if (d.intensity) {
            val l = requantize(grL)
            val r = requantize(grR)
            intensityStereo(l, r, grR, d.msStereo)
            Array(aliasReduce(l), aliasReduce(r))
          } else if (d.msStereo) {
            val m = if (grL.blockType == 2 && grL.mixed == 1)
              reorderMixed(requantizeMixed(grL))
            else if (grL.blockType == 2) reorderShort(requantizeShort(grL))
            else requantize(grL)
            val s = if (grR.blockType == 2 && grR.mixed == 1)
              reorderMixed(requantizeMixed(grR))
            else if (grR.blockType == 2) reorderShort(requantizeShort(grR))
            else requantize(grR)
            msMatrix(m, s)
            Array(
              if (grL.blockType == 2 && grL.mixed == 1) aliasReduce(m, 1)
              else if (grL.blockType == 2) m else aliasReduce(m),
              if (grR.blockType == 2 && grR.mixed == 1) aliasReduce(s, 1)
              else if (grR.blockType == 2) s else aliasReduce(s))
          } else Array(granXr(grL), granXr(grR))
        var c = 0
        while (c < 2) {
          val gr = if (c == 0) grL else grR
          val slots = subbandSynth(xrs(c), overlap(c), gr.blockType, gr.mixed == 1)
          var t = 0
          while (t < 18) {
            val pcm = states(c).slot(slots(t))
            System.arraycopy(pcm, 0, out(c), g * 576 + t * 32, 32)
            t += 1
          }
          c += 1
        }
        g += 1
      }
      out
    }

  /** decodePcm with a caller-supplied window (the ISO Table B.3 seam). */
  def withWindow(frame: Array[Byte], window: Array[Double]): Option[Array[Double]] =
    decodePcm(frame, window)
}
