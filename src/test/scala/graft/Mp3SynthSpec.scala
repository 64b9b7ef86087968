package graft

import graft.pipeline.{Mp3L3, Mp3Synth}

/** The numeric back half of Layer III decode: requantization closed
  * forms, alias-butterfly unitarity, and the IMDCT/window/overlap-add
  * chain verified against an INDEPENDENT forward MDCT implemented here
  * in the spec — the TDAC (Princen–Bradley) round trip must reconstruct
  * a random signal up to the transform's fixed gain. */
class Mp3SynthSpec extends SparkSpec {

  test("requantize: hand-derived closed-form points") {
    val is = new Array[Int](576)
    is(0) = 1; is(1) = -1; is(20) = 8
    val sf = new Array[Int](21)
    // neutral settings: gain 210, no scalefactors → xr = ±|is|^(4/3)
    val x0 = Mp3Synth.requantize(is, sf, 210, 0, 0)
    assert(x0(0) === 1.0)
    assert(x0(1) === -1.0)
    assert(math.abs(x0(20) - math.pow(8.0, 4.0 / 3.0)) < 1e-12)
    assert(x0(2) === 0.0)
    // global_gain: +4 steps of gain = one doubling
    val x1 = Mp3Synth.requantize(is, sf, 214, 0, 0)
    assert(math.abs(x1(0) - 2.0) < 1e-12)
    // scalefactor: band 0 covers lines 0..3; sf=2 at step 0.5 → ×2^-1
    sf(0) = 2
    val x2 = Mp3Synth.requantize(is, sf, 210, 0, 0)
    assert(math.abs(x2(0) - 0.5) < 1e-12)
    // scalefac_scale=1 → step 1.0 → ×2^-2
    val x3 = Mp3Synth.requantize(is, sf, 210, 1, 0)
    assert(math.abs(x3(0) - 0.25) < 1e-12)
    // preflag: band 20 (lines 342..417) has pretab 2; line 350
    val is2 = new Array[Int](576); is2(350) = 1
    val x4 = Mp3Synth.requantize(is2, new Array[Int](21), 210, 0, 1)
    assert(math.abs(x4(350) - 0.5) < 1e-12) // 2^(-0.5·2)
  }

  test("alias butterflies are rotations: cs² + ca² = 1, reduction is invertible") {
    for (k <- 0 until 8)
      assert(math.abs(Mp3Synth.Cs(k) * Mp3Synth.Cs(k)
        + Mp3Synth.Ca(k) * Mp3Synth.Ca(k) - 1.0) < 1e-15)
    // a rotation preserves the two-point energy at every butterfly
    val rng = new scala.util.Random(7)
    val xr = Array.fill(576)(rng.nextDouble() * 2 - 1)
    val red = Mp3Synth.aliasReduce(xr)
    val e0 = xr.map(v => v * v).sum
    val e1 = red.map(v => v * v).sum
    assert(math.abs(e0 - e1) < 1e-9 * e0, "alias reduction must preserve energy")
    assert(!(xr sameElements red), "butterflies must actually mix boundaries")
  }

  test("IMDCT/window/overlap-add inverts an independent forward MDCT (TDAC)") {
    // forward MDCT, written HERE, not shared with the library:
    // X(k) = Σ_i w(i)·s(i)·cos(π/72·(2i+19)·(2k+1))
    def mdct36(block: Array[Double]): Array[Double] =
      Array.tabulate(18) { k =>
        (0 until 36).map { i =>
          block(i) * math.sin(math.Pi / 36.0 * (i + 0.5)) *
            math.cos(math.Pi / 72.0 * (2 * i + 19) * (2 * k + 1))
        }.sum
      }
    val rng = new scala.util.Random(42)
    val nBlocks = 8
    val s = Array.fill(18 * (nBlocks + 1))(rng.nextDouble() * 2 - 1)
    // analysis at hop 18, synthesis via the library half
    val z = (0 until nBlocks).map { b =>
      Mp3Synth.window36(Mp3Synth.imdct36(mdct36(s.slice(18 * b, 18 * b + 36))))
    }
    // interior samples (skip the first and last half-block edges)
    val recon = (1 until nBlocks).flatMap { b =>
      (0 until 18).map(i => z(b)(i) + z(b - 1)(18 + i))
    }.toArray
    val orig = s.slice(18, 18 * nBlocks)
    // TDAC: recon = gain·orig with ONE fixed gain; measure it at the
    // largest sample, then pin uniformity everywhere and its value
    // (n/4 = 9 for this unnormalized cosine-kernel pair)
    val iMax = orig.indices.maxBy(i => math.abs(orig(i)))
    val gain = recon(iMax) / orig(iMax)
    assert(math.abs(gain - 9.0) < 1e-9, s"TDAC gain $gain ≠ n/4")
    orig.indices.foreach { i =>
      assert(math.abs(recon(i) - gain * orig(i)) < 1e-9,
        s"TDAC broke at interior sample $i")
    }
  }

  test("decoded stream flows end-to-end to finite subband samples") {
    val d = Mp3L3.decode(Mp3L3.gen(11L)).get
    val overlap = Array.ofDim[Double](32, 18)
    val g0 = Mp3Synth.granuleToSubbands(d.granules(0), overlap)
    val g1 = Mp3Synth.granuleToSubbands(d.granules(1), overlap)
    for (g <- Seq(g0, g1); sb <- g; v <- sb)
      assert(java.lang.Double.isFinite(v))
    // the granules carry nonzero spectra, so samples must be nonzero
    assert(g0.flatten.exists(_ != 0.0) && g1.flatten.exists(_ != 0.0))
    // overlap carry: granule 1's samples depend on granule 0's tail —
    // decoding granule 1 with a FRESH overlap must differ
    val fresh = Array.ofDim[Double](32, 18)
    val g1Fresh = Mp3Synth.granuleToSubbands(d.granules(1), fresh)
    assert(g1.flatten.toSeq != g1Fresh.flatten.toSeq,
      "overlap-add state was not carried between granules")
  }
}
