package graft

import graft.pipeline.{AacLc, AacSynth}

/** AAC-LC numeric half: closed-form window properties, IMDCT TDAC
  * perfect reconstruction against an independently-written forward
  * MDCT, requantization exact points, EIGHT_SHORT entropy identity
  * (grouping, per-group scalefactors, interleaved spectra), and the
  * full gen → decode → synthesize chain for all four window
  * sequences. */
class AacSynthSpec extends SparkSpec {

  test("sine and KBD windows satisfy Princen-Bradley exactly") {
    for ((w, tag) <- Seq((AacSynth.sineRise(1024), "sine-long"),
                         (AacSynth.sineRise(128), "sine-short"),
                         (AacSynth.kbdRise(1024, 4.0), "kbd-long"),
                         (AacSynth.kbdRise(128, 6.0), "kbd-short"))) {
      val h = w.length
      for (n <- 0 until h) {
        val s = w(n) * w(n) + w(h - 1 - n) * w(h - 1 - n)
        assert(math.abs(s - 1.0) < 1e-12, s"$tag at $n: $s")
      }
      assert(w.zip(w.tail).forall { case (a, b) => a <= b + 1e-15 }, s"$tag monotone")
    }
  }

  /** Independently-written forward MDCT (the analysis twin of
    * AacSynth.imdct, the encoder-side 2·Σ convention that pairs with
    * the ISO (2/N)·Σ inverse): X[k] = 2·Σ_{n<N} x[n]·cos(2π/N·(n+n₀)(k+½)). */
  private def mdct(x: Array[Double], half: Int): Array[Double] = {
    val n2 = 2 * half
    val n0 = (half + 1) / 2.0
    Array.tabulate(half) { k =>
      var acc = 0.0
      var n = 0
      while (n < n2) {
        acc += x(n) * math.cos(math.Pi * 2.0 / n2 * (n + n0) * (k + 0.5))
        n += 1
      }
      2.0 * acc
    }
  }

  test("IMDCT TDAC: two overlapped windowed blocks reconstruct the middle") {
    for ((half, shape) <- Seq((128, 0), (128, 1), (1024, 0))) {
      val n2 = 2 * half
      val rng = new scala.util.Random(7)
      val s = Array.fill(3 * half)(rng.nextDouble() * 2 - 1)
      val w = AacSynth.rise(long = half == 1024, shape)
      def window(x: Array[Double]): Array[Double] =
        Array.tabulate(n2)(n => x(n) * (if (n < half) w(n) else w(n2 - 1 - n)))
      val b1 = window(s.slice(0, n2))
      val b2 = window(s.slice(half, 3 * half))
      val y1 = AacSynth.imdct(mdct(b1, half), 0, half)
      val y2 = AacSynth.imdct(mdct(b2, half), 0, half)
      val r1 = window(y1)
      val r2 = window(y2)
      for (n <- 0 until half) {
        val rec = r1(half + n) + r2(n)
        assert(math.abs(rec - s(half + n)) < 1e-9,
          s"half=$half shape=$shape n=$n: $rec vs ${s(half + n)}")
      }
    }
  }

  test("requantization exact points: 8^(4/3) = 16 at sf 100") {
    val spec = new Array[Int](1024)
    spec(0) = 8; spec(17) = -1
    val sf = Array.fill(32)(Int.MinValue)
    sf(0) = 100 // gain 2^0 = 1
    sf(1) = 104 // gain 2^1 = 2
    val ics = AacLc.Ics(0, 0, 32, 100, 1, 0L, 0L, 0, 0, spec, sf,
      Array(1), Array(Array.empty[Int]))
    val x = AacSynth.requantize(ics)
    assert(math.abs(x(0) - 16.0) < 1e-12) // 8^(4/3) = 2^4, one ulp of pow
    assert(math.abs(x(17) + 2.0) < 1e-12) // bin 17 is band 1: |−1|^(4/3)·2
    assert(x(1) === 0.0 && x(33) === 0.0)
  }

  test("long-family chain: gen → decode → PCM for every seed 0..49") {
    val wsSeen = collection.mutable.Set.empty[Int]
    for (seed <- 0L until 50L) {
      val pcm = AacSynth.decodePcm(AacLc.gen(seed))
        .getOrElse(fail(s"seed $seed: no decode"))
      assert(pcm.length === 2 && pcm.forall(_.length == 1024))
      assert(pcm.forall(_.forall(v => !v.isNaN && !v.isInfinite)))
      assert(pcm.exists(_.exists(_ != 0.0)), s"seed $seed: carries signal")
      AacLc.decode(AacLc.gen(seed)).get.frames.foreach(f => wsSeen += f.windowSequence)
    }
    assert(wsSeen === Set(0, 1, 3), "only/start/stop all appear")
  }

  test("EIGHT_SHORT entropy identity: grouping, per-group sf, interleave") {
    for (seed <- 0L until 100L) {
      val dec = AacLc.decode(AacLc.genShort(seed))
        .getOrElse(fail(s"seed $seed: no short decode"))
      for (f <- 0 until 2) {
        val p = AacLc.GenShortParams(seed, f)
        val ics = dec.frames(f)
        assert(ics.windowSequence === 2)
        assert(ics.maxSfb === p.maxSfb)
        assert(ics.groups.toSeq === p.groups.toSeq, s"seed $seed f$f grouping")
        // deinterleaved coefficients by final position
        val expect = new Array[Int](1024)
        val winOf = p.groups.scanLeft(0)(_ + _)
        for (g <- p.groups.indices) {
          p.sections(g).foreach { case (cb, first, n) =>
            if (cb != 0) {
              val m = AacLc.CbMetas(cb)
              for (band <- first until first + n;
                   wIn <- 0 until p.groups(g);
                   o <- AacLc.ShortBands(band) until AacLc.ShortBands(band + 1)) {
                val k = (winOf(g) + wIn) * 128 + o
                val raw = p.mag(cb, k)
                expect(k) =
                  if (m.signedCb) raw
                  else if (raw == 0) 0
                  else (if (p.negative(k)) -raw else raw)
              }
            }
          }
        }
        assert(ics.spec.toSeq === expect.toSeq, s"seed $seed f$f spectrum")
        // per-group DPCM scalefactor chain (global across groups)
        var run = p.globalGain
        for (g <- p.groups.indices) {
          p.sections(g).foreach { case (cb, first, n) =>
            if (cb != 0) for (b <- first until first + n) {
              run += p.dpcm(g, b)
              assert(ics.sfShort(g)(b) === run, s"seed $seed f$f g$g sf($b)")
            }
          }
        }
      }
    }
  }

  test("EIGHT_SHORT chain reaches PCM; grouping variety is exercised") {
    val groupCounts = collection.mutable.Set.empty[Int]
    for (seed <- 0L until 50L) {
      val pcm = AacSynth.decodePcm(AacLc.genShort(seed))
        .getOrElse(fail(s"seed $seed"))
      assert(pcm.length === 2 && pcm.forall(_.length == 1024))
      assert(pcm.forall(_.forall(v => !v.isNaN && !v.isInfinite)))
      assert(pcm.exists(_.exists(_ != 0.0)))
      AacLc.decode(AacLc.genShort(seed)).get.frames
        .foreach(f => groupCounts += f.groups.length)
    }
    assert(groupCounts.size >= 4, s"grouping variety: $groupCounts")
  }

  test("a pure-tone spectrum synthesizes periodic output (sanity)") {
    // constant spectral line in band 0 at sf 100 through ONLY_LONG:
    // output must be a windowed cosine — symmetric energy, zero mean
    val spec = new Array[Int](1024)
    spec(4) = 2
    val sf = Array.fill(32)(Int.MinValue); sf(0) = 100
    val ics = AacLc.Ics(0, 0, 32, 100, 1, 0L, 0L, 0, 0, spec, sf,
      Array(1), Array(Array.empty[Int]))
    val t = AacSynth.frameTime(ics, 0)
    assert(t.length === 2048)
    val mean = t.sum / t.length
    assert(math.abs(mean) < 1e-9, s"zero mean, got $mean")
    // amplitude scale: (2/N)·2^(4/3) ≈ 0.0025 before windowing
    assert(t.exists(v => math.abs(v) > 0.001))
  }
}
