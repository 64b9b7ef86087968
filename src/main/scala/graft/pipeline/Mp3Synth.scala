package graft.pipeline

/** MPEG-1 Layer III TRANSFORM-SAMPLE decode, part 2 of 2: the NUMERIC
  * back half — requantization, alias reduction, and the IMDCT with
  * windowing + overlap-add — carrying [[Mp3L3]]'s decoded spectral lines
  * down to the 32×18 SUBBAND TIME SAMPLES per granule (ISO/IEC 11172-3
  * §2.4.3.4.7.x, Annex B Table B.9 pretab, §2.4.3.4.10.1–3). Every
  * constant in this half is a CLOSED FORM of the spec — the power-law
  * requantizer, the eight alias-butterfly coefficients (derived from the
  * published ci list), the IMDCT cosine kernel, the sine window — so
  * nothing here depends on recalling a large arbitrary table. The ONLY
  * remaining piece of full PCM reconstruction is the polyphase synthesis
  * filterbank, whose 512-entry D[] window IS an arbitrary ISO table —
  * that is the (final, documented) stub boundary.
  *
  * Scope matches [[Mp3L3.decode]]: MPEG-1, long blocks (block type 0),
  * mono. Numeric contract (pinned in Mp3SynthSpec):
  *   - requantize: xr(i) = sign(is)·|is|^(4/3) · 2^((global_gain−210)/4)
  *     · 2^(−step·(scalefac(band) + preflag·pretab(band))), where step is
  *     1.0 when scalefac_scale=1 else 0.5 — checked against hand-derived
  *     closed-form points (is=±1, gain 210 → ±1.0)
  *   - alias reduction: the 8 (cs, ca) butterflies at each of the 31
  *     subband boundaries, cs=1/√(1+ci²), ca=ci/√(1+ci²) from the
  *     published ci = {−0.6, −0.535, −0.33, −0.185, −0.095, −0.041,
  *     −0.0142, −0.0037}
  *   - IMDCT-36: x(i) = Σ_{k<18} X(k)·cos(π/72·(2i+19)·(2k+1)), sine
  *     window w(i) = sin(π/36·(i+½)), 50% overlap-add — verified in-spec
  *     against an INDEPENDENT forward MDCT: the TDAC (Princen–Bradley)
  *     round trip must reconstruct a random signal exactly up to the
  *     transform's fixed gain, which the spec pins
  *   - frequency inversion: odd time samples of odd subbands negated
  *     (§2.4.3.4.10.3's synthesis-prep step)
  */
object Mp3Synth {

  /** Annex B Table B.9: the preflag emphasis table, one entry per long
    * scalefactor band (21 coded bands + the uncoded top band). */
  val Pretab: Array[Int] =
    Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0)

  /** §2.4.3.4.7: power-law requantization of one granule's spectral
    * lines at 44.1 kHz long blocks. Lines above the last band boundary
    * take band 21's (pretab-only) scaling per the spec's rzero/top-band
    * convention. */
  def requantize(is: Array[Int], scalefacs: Array[Int], globalGain: Int,
      scalefacScale: Int, preflag: Int): Array[Double] = {
    require(is.length == 576, "one granule = 576 spectral lines")
    val step = if (scalefacScale == 1) 1.0 else 0.5
    val gain = math.pow(2.0, (globalGain - 210) / 4.0)
    val out = new Array[Double](576)
    val sfb = Mp3L3.Sfb44100
    var band = 0
    var i = 0
    while (i < 576) {
      while (band < 21 && i >= sfb(band + 1)) band += 1
      val sf = if (band < 21) scalefacs(band) else 0
      val scale = math.pow(2.0, -step * (sf + preflag * Pretab(band)))
      val v = is(i)
      if (v != 0) {
        val mag = math.pow(math.abs(v).toDouble, 4.0 / 3.0)
        out(i) = math.signum(v.toDouble) * mag * gain * scale
      }
      i += 1
    }
    out
  }

  /** §2.4.3.4.10.1: the published butterfly list. */
  private val Ci = Array(-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037)
  val Cs: Array[Double] = Ci.map(c => 1.0 / math.sqrt(1.0 + c * c))
  val Ca: Array[Double] = Ci.map(c => c / math.sqrt(1.0 + c * c))

  /** Alias reduction across the 31 subband boundaries (long blocks),
    * in place on a copy: for boundary b at line 18(b+1), the 8
    * butterflies mix lines (18(b+1)−1−k, 18(b+1)+k). */
  def aliasReduce(xr: Array[Double]): Array[Double] = {
    val out = xr.clone()
    var b = 0
    while (b < 31) {
      val base = 18 * (b + 1)
      var k = 0
      while (k < 8) {
        val lo = out(base - 1 - k)
        val hi = out(base + k)
        out(base - 1 - k) = lo * Cs(k) - hi * Ca(k)
        out(base + k) = hi * Cs(k) + lo * Ca(k)
        k += 1
      }
      b += 1
    }
    out
  }

  /** §2.4.3.4.10.3, n=36 (long blocks): 18 spectral lines → 36 time
    * samples. */
  def imdct36(x: Array[Double]): Array[Double] = {
    require(x.length == 18)
    val out = new Array[Double](36)
    var i = 0
    while (i < 36) {
      var acc = 0.0
      var k = 0
      while (k < 18) {
        acc += x(k) * math.cos(math.Pi / 72.0 * (2 * i + 19) * (2 * k + 1))
        k += 1
      }
      out(i) = acc
      i += 1
    }
    out
  }

  /** Block-type-0 sine window. */
  def window36(z: Array[Double]): Array[Double] =
    Array.tabulate(36)(i => z(i) * math.sin(math.Pi / 36.0 * (i + 0.5)))

  /** One granule's subband time samples: per subband, windowed IMDCT of
    * its 18 lines overlap-added with the previous granule's tail
    * (`overlap`, 32×18, MUTATED to carry this granule's tail forward),
    * then the odd-subband frequency inversion. Returns 32×18. */
  def subbandSamples(xr: Array[Double],
      overlap: Array[Array[Double]]): Array[Array[Double]] = {
    require(xr.length == 576 && overlap.length == 32)
    val out = Array.ofDim[Double](32, 18)
    var sb = 0
    while (sb < 32) {
      val lines = java.util.Arrays.copyOfRange(xr, 18 * sb, 18 * (sb + 1))
      val z = window36(imdct36(lines))
      var i = 0
      while (i < 18) {
        out(sb)(i) = z(i) + overlap(sb)(i)
        overlap(sb)(i) = z(18 + i)
        i += 1
      }
      // frequency inversion: odd time samples of odd subbands
      if (sb % 2 == 1) {
        var j = 1
        while (j < 18) { out(sb)(j) = -out(sb)(j); j += 2 }
      }
      sb += 1
    }
    out
  }

  /** The composed chain for one granule: spectra → requantize → alias
    * reduce → subband samples (overlap carried by the caller). */
  def granuleToSubbands(g: Mp3L3.Granule,
      overlap: Array[Array[Double]]): Array[Array[Double]] =
    subbandSamples(
      aliasReduce(requantize(g.is, g.scalefacs, g.globalGain,
        g.scalefacScale, g.preflag)),
      overlap)
}
