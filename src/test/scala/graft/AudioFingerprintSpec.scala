package graft

import org.apache.spark.sql.functions.col

import graft.pipeline.{AudioFingerprint, AudioNorm, AvHeader, Dedup}

/** audio_fingerprint: the band-energy comparison-bit definition, the
  * perceptual invariances (exact under k-fold zero-order-hold
  * resampling with 33 | n, uniform amplitude scaling, mono→stereo
  * duplication, and cross-container re-encoding through AudioNorm's
  * sample-exact paths), the localized-edit hamming bound, the near-dup
  * demonstration through the shared banded pairing, and the NULL
  * discipline. */
class AudioFingerprintSpec extends SparkSpec {

  private def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  /** Mono PCM16 WAV from an explicit sample function. */
  private def wav(n: Int, rate: Int = 8000)(f: Int => Int): Array[Byte] =
    AvHeader.encodePcm16Wav(Array.tabulate(n)(f), rate, 1)

  /** The d13 corpus's per-cell two-amplitude pattern (quadratic
    * congruential mix), mirrored here so the spec exercises the same
    * signal family the gate oracle replays. */
  private def patternSample(d: Long, q: Int)(i: Int): Int = {
    val c = i / q
    val ha = d * 8191L + c * 127L + 1
    val hb = d * 4099L + c * 211L + 3
    val a = ((ha * ha % 8923) % 89 + 8).toInt
    val b = ((hb * hb % 7919) % 83 + 8).toInt
    val sign = 1 - 2 * ((i / 2) % 2)
    sign * (if (i % 2 == 0) a else b)
  }

  test("definition: fingerprint(wav) equals fingerprintOfMono of its samples") {
    for (d <- Seq(0L, 7L, 123L)) {
      val q = 8 + (d % 5).toInt
      val n = 33 * q
      val samples = Array.tabulate(n)(patternSample(d, q))
      val viaBytes = AudioFingerprint.fingerprint(wav(n)(samples)).longValue()
      val viaMono = AudioFingerprint.fingerprintOfMono(samples.map(_.toLong))
      assert(viaBytes === viaMono, s"d=$d")
    }
  }

  test("definition: monotone envelope is all-ones, constant is zero") {
    // strictly-increasing per-cell amplitude on an alternating-sign
    // carrier: every low(t) < low(t+1) and diff(t) < diff(t+1) holds
    val q = 10
    val up = wav(33 * q)(i => (1 - 2 * (i % 2)) * (10 + 30 * (i / q)))
    assert(AudioFingerprint.fingerprint(up).longValue() === 0xFFFFFFFFFFFFFFFFL)
    // constant amplitude: no low comparison holds; in the diff band
    // only cell 0 is smaller (it has q−1 in-cell diffs and no
    // cross-boundary diff where every later cell has q), so exactly
    // bit 32 (diff(0) < diff(1)) is set
    val flat = wav(33 * q)(i => (1 - 2 * (i % 2)) * 500)
    assert(AudioFingerprint.fingerprint(flat).longValue() === (1L << 32))
  }

  test("perceptual invariances: k-fold ZOH resample, amplitude scale, stereo dup") {
    for (d <- Seq(1L, 42L, 307L)) {
      val q = 8 + (d % 5).toInt
      val n = 33 * q
      val samples = Array.tabulate(n)(patternSample(d, q))
      val base = wav(n)(samples)
      val h0 = AudioFingerprint.fingerprint(base).longValue()
      // k-fold zero-order hold: bit-identical when 33 | n (cell
      // boundaries align, low scales by k, diff is preserved exactly)
      for (k <- Seq(2, 3, 5)) {
        val res = AvHeader.resampleWav(base, 8000 * k)
        assert(ham(h0, AudioFingerprint.fingerprint(res).longValue()) === 0,
          s"d=$d k=$k")
      }
      // uniform amplitude scaling: comparisons are scale-invariant
      val loud = wav(n)(i => samples(i) * 13)
      assert(AudioFingerprint.fingerprint(loud).longValue() === h0, s"d=$d loud")
      // mono→stereo duplication: the channel SUM doubles every frame
      val stereo = AvHeader.encodePcm16Wav(
        samples.flatMap(s => Array(s, s)), 8000, 2)
      assert(AudioFingerprint.fingerprint(stereo).longValue() === h0,
        s"d=$d stereo")
    }
  }

  test("cross-codec identity: FLAC/MP3/AAC fingerprint as their normalized WAV") {
    // the fingerprint is a function of AudioNorm's canonical PCM, not
    // the container: any supported compressed stream and its
    // audio_to_wav re-encode must fingerprint identically — the
    // re-encoded-twin dedup claim, across all three transform codecs
    val streams = Seq(
      "flac" -> graft.pipeline.FlacPcm.gen(9L),
      "mp3" -> graft.pipeline.Mp3L3.gen(9L),
      "aac" -> graft.pipeline.AacLc.gen(9L))
    for ((tag, bytes) <- streams) {
      val direct = AudioFingerprint.fingerprint(bytes)
      val rewrapped = AudioFingerprint.fingerprint(AudioNorm.toWav(bytes))
      assert(direct != null && direct.longValue() === rewrapped.longValue(), tag)
    }
  }

  test("localized edit: a one-frame bump in the last cell flips ≤ 2 bits") {
    for (d <- Seq(5L, 66L, 467L)) {
      val q = 8 + (d % 5).toInt
      val n = 33 * q
      val samples = Array.tabulate(n)(patternSample(d, q))
      val h0 = AudioFingerprint.fingerprint(wav(n)(samples)).longValue()
      val bumped = wav(n)(i => if (i == 32 * q + 3) samples(i) - 4000 else samples(i))
      val h1 = AudioFingerprint.fingerprint(bumped).longValue()
      assert(ham(h0, h1) <= 2, s"d=$d ham=${ham(h0, h1)}")
      // only the two t=31 comparisons (bits 31 and 63) may differ
      assert(((h0 ^ h1) & ~((1L << 31) | (1L << 63))) === 0L, s"d=$d")
    }
  }

  test("near-dup demo: resampled twin found by banded pairing, unrelated not") {
    import spark.implicits._
    val q = 9
    val n = 33 * q
    val base = wav(n)(patternSample(17L, q))
    val twin = AvHeader.resampleWav(base, 24000)
    val unrelated = wav(n)(patternSample(18L, q))
    val fp = Seq(
      (1L, AudioFingerprint.fingerprint(base).longValue()),
      (2L, AudioFingerprint.fingerprint(twin).longValue()),
      (3L, AudioFingerprint.fingerprint(unrelated).longValue()))
      .toDF("__id", "__sim")
    val pairs = Dedup.simHashNearDupPairsFromFingerprints(
        fp, maxHamming = 3, bands = 4, bits = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)), s"got $pairs")
    // the unrelated stream is far in hamming, not just unbucketed
    assert(ham(AudioFingerprint.fingerprint(base).longValue(),
      AudioFingerprint.fingerprint(unrelated).longValue()) > 10)
  }

  test("SQL surface matches the direct calls; NULL discipline holds") {
    import spark.implicits._
    val rows = spark.sql(
      """SELECT seed, audio_fingerprint(flac_gen_audio(seed)) AS f
         FROM range(0, 30) t(seed)""")
      .collect()
    for (r <- rows) {
      val s = r.getLong(0)
      assert(r.getLong(1) ===
        AudioFingerprint.fingerprint(graft.pipeline.FlacPcm.gen(s)).longValue(),
        s"seed=$s")
    }
    assert(AudioFingerprint.fingerprint(null) === null)
    assert(AudioFingerprint.fingerprint(Array[Byte](1, 2, 3)) === null)
    assert(AudioFingerprint.fingerprint("not audio".getBytes) === null)
    val nulls = Seq(Array[Byte](9, 9, 9)).toDF("b")
      .selectExpr("audio_fingerprint(b)").collect()(0)
    assert(nulls.isNullAt(0))
    // header-only WAV (zero frames) is NULL, not a crash
    val empty = AvHeader.encodePcm16Wav(Array.empty[Int], 8000, 1)
    assert(AudioFingerprint.fingerprint(empty) === null)
  }

  test("short streams (n < 33 cells) fingerprint deterministically") {
    // cells overlap via the max(t0+1, …) bound — same arithmetic an
    // oracle would replay; no exception, stable value
    val tiny = wav(5)(i => Array(100, -200, 300, -50, 75)(i))
    val h1 = AudioFingerprint.fingerprint(tiny)
    val h2 = AudioFingerprint.fingerprint(tiny)
    assert(h1 != null && h1.longValue() === h2.longValue())
    val one = wav(1)(_ => 1234)
    assert(AudioFingerprint.fingerprint(one) != null) // all sums equal → 0
    assert(AudioFingerprint.fingerprint(one).longValue() === 0L)
  }
}
