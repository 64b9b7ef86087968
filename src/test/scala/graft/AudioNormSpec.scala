package graft

import graft.pipeline.{AacLc, AacSynth, AudioNorm, AvHeader, FlacPcm, Mp3L3, Mp3Synth}

/** audio_to_wav: container dispatch, sample-exact integer paths,
  * float-path quantization consistency, and the NULL discipline. */
class AudioNormSpec extends SparkSpec {

  test("WAV arm: PCM16 round-trips; compressed codecs expand") {
    val src = Array(100, -200, 30000, -30001)
    val wav = AvHeader.encodePcm16Wav(src, 8000, 1)
    val out = AvHeader.decodeWavSamples(AudioNorm.toWav(wav)).get
    assert(out.codec === "pcm_s16le" && out.sampleRate === 8000)
    assert(out.samples.toSeq === src.toSeq)
    // a µ-law container comes out expanded
    val bb = java.nio.ByteBuffer.allocate(48)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(40).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(7).putShort(1)
      .putInt(8000).putInt(8000).putShort(1).putShort(8)
    bb.put("data".getBytes).putInt(4)
    Seq(0xFF, 0x7F, 0x80, 0x00).foreach(v => bb.put(v.toByte))
    val norm = AvHeader.decodeWavSamples(AudioNorm.toWav(bb.array())).get
    assert(norm.codec === "pcm_s16le")
    assert(norm.samples.toSeq ===
      Seq(0xFF, 0x7F, 0x80, 0x00).map(AvHeader.ulaw2linear))
  }

  test("FLAC arm: sample-exact interleave at the STREAMINFO rate") {
    for (seed <- 0L until 40L) {
      val flac = FlacPcm.gen(seed)
      val wav = AudioNorm.toWav(flac)
      assert(wav !== null, s"seed $seed")
      val out = AvHeader.decodeWavSamples(wav).get
      val audio = FlacPcm.decode(flac).get
      assert(out.sampleRate === 44100 && out.channels === audio.channels)
      val expect = (0 until audio.blockSize).flatMap(i =>
        (0 until audio.channels).map(c => audio.samples(c)(i)))
      assert(out.samples.toSeq === expect, s"seed $seed interleave")
    }
  }

  test("AAC arm: every frame quantized round(v*32768) at the ADTS rate") {
    for (seed <- 0L until 20L) {
      val adts = AacLc.gen(seed)
      val out = AvHeader.decodeWavSamples(AudioNorm.toWav(adts)).get
      assert(out.sampleRate === 44100 && out.channels === 1)
      assert(out.samples.length === 2048) // two frames
      val pcm = AacSynth.decodePcm(adts).get
      val expect = pcm.flatMap(_.map { v =>
        val r = math.rint(v * 32768.0)
        math.max(-32768, math.min(32767, r.toInt))
      }).toSeq
      assert(out.samples.toSeq === expect, s"seed $seed")
    }
  }

  test("MP3 arm: mono 1152; stereo interleaves L/R") {
    val mono = AudioNorm.toWav(Mp3L3.gen(3L))
    val m = AvHeader.decodeWavSamples(mono).get
    assert(m.channels === 1 && m.sampleRate === 44100 && m.samples.length === 1152)
    val st = AudioNorm.toWav(Mp3L3.genStereo(3L))
    val s2 = AvHeader.decodeWavSamples(st).get
    assert(s2.channels === 2 && s2.samples.length === 2 * 1152)
    val ch = Mp3Synth.decodePcmStereo(Mp3L3.genStereo(3L)).get
    def q(v: Double) =
      math.max(-32768, math.min(32767, math.rint(v * 32768.0).toInt))
    assert(s2.samples.toSeq === (0 until 1152).flatMap(i =>
      Seq(q(ch(0)(i)), q(ch(1)(i)))))
  }

  // ==== hand-assembled FLAC at non-16 bit depths =========================
  // (the generator pins bps 16; the scaling contract needs 8 and 24)

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

  /** Mono single-frame FLAC with a verbatim subframe at `bps`
    * (frame-header size code; STREAMINFO carries 16 — the per-frame
    * code wins, which is exactly the path AudioNorm must scale). */
  private def flacAt(bps: Int, vals: Array[Int]): Array[Byte] = {
    val szCode = bps match { case 8 => 1; case 12 => 2; case 16 => 4
      case 20 => 5; case 24 => 6 }
    val container = "fLaC".getBytes ++
      Array(0x80, 0x00, 0x00, 0x22).map(_.toByte) ++
      Array[Byte](0, 64, 0, 64) ++ Array.fill(6)(0.toByte) ++
      Array(0x0a, 0xc4, 0x40, 0xf0, 0, 0, 0, 0).map(_.toByte) ++
      Array.fill(16)(0.toByte)
    val h = new Bw
    h.u(0x3ffe, 14); h.u(0, 1); h.u(0, 1)
    h.u(7, 4); h.u(9, 4); h.u(0, 4)
    h.u(szCode, 3); h.u(0, 1)
    h.u(0, 8); h.u(vals.length - 1, 16)
    val hdr = h.align()
    val body = new Bw
    body.u(0, 1); body.u(1, 6); body.u(0, 1) // verbatim, no wasted bits
    vals.foreach(v => body.u(v & ((1 << bps) - 1), bps))
    val frame = (hdr :+ FlacPcm.crc8(hdr, 0, hdr.length).toByte) ++ body.align()
    val full = container ++ frame
    val crc = FlacPcm.crc16(full, 42, full.length)
    full ++ Array(((crc >> 8) & 0xff).toByte, (crc & 0xff).toByte)
  }

  test("FLAC arm scales native bit depth to the 16-bit canon") {
    // 8-bit: full-scale must map to full-scale (<< 8), not come out
    // 256x too quiet
    val v8 = Array(127, -128, 1, 0, -1)
    val out8 = AvHeader.decodeWavSamples(AudioNorm.toWav(flacAt(8, v8))).get
    assert(out8.samples.toSeq === v8.map(_ << 8).toSeq)
    // 24-bit: arithmetic >> 8, not a hard clip to +/-32767
    val v24 = Array(8388607, -8388608, 65536, -65536, 255, -256, 0)
    val out24 = AvHeader.decodeWavSamples(AudioNorm.toWav(flacAt(24, v24))).get
    assert(out24.samples.toSeq === v24.map(_ >> 8).toSeq)
    // 12 and 20 complete the family
    val v12 = Array(2047, -2048, 3)
    assert(AvHeader.decodeWavSamples(AudioNorm.toWav(flacAt(12, v12))).get
      .samples.toSeq === v12.map(_ << 4).toSeq)
    val v20 = Array(524287, -524288, 16)
    assert(AvHeader.decodeWavSamples(AudioNorm.toWav(flacAt(20, v20))).get
      .samples.toSeq === v20.map(_ >> 4).toSeq)
    // 16 stays the identity (the gate's arm)
    val v16 = Array(32767, -32768, 5)
    assert(AvHeader.decodeWavSamples(AudioNorm.toWav(flacAt(16, v16))).get
      .samples.toSeq === v16.toSeq)
  }

  test("MP3 arm: non-44.1 kHz samplerate index fails CLOSED") {
    // header byte 2 bits 3-2 = samplerate index: 0 = 44.1 (the decoded
    // scope), 1 = 48 kHz, 2 = 32 kHz. Mp3L3's frame walk and band
    // layout assume 44.1, so a 48/32-flagged frame must be NULL -
    // never a WAV mislabeled with a constant rate.
    val good = Mp3L3.gen(3L)
    assert(AudioNorm.toWav(good) !== null)
    for (idx <- 1 to 2) {
      val bad = good.clone()
      bad(2) = ((bad(2) & ~0x0C) | (idx << 2)).toByte
      assert(Mp3L3.decode(bad).isEmpty, s"idx $idx")
      assert(AudioNorm.toWav(bad) === null, s"idx $idx")
    }
  }

  test("AAC arm: amplification cap - minimal-frame flood is NULL, not OOM") {
    // a ~11-byte ADTS frame expands to 1024 samples; 2^18+1 frames
    // cross the 2^28-sample bound, and the pre-walk rejects on the
    // HEADER count alone (no spectral work, no per-frame state)
    val one = Array[Byte](0xFF.toByte, 0xF1.toByte, 0x54, 0x40, 1, 0x1F, 0xFC.toByte, 0)
    assert(((one(3) & 3) << 11 | (one(4) & 0xFF) << 3 | (one(5) >> 5) & 7) === 8)
    val flood = new Array[Byte](8 * 262145)
    var i = 0
    while (i < 262145) { System.arraycopy(one, 0, flood, 8 * i, 8); i += 1 }
    val t0 = System.nanoTime()
    assert(AacLc.decode(flood).isEmpty)
    assert(AudioNorm.toWav(flood) === null)
    // header-walk rejection is near-instant - seconds would mean the
    // spectral decoder ran
    assert((System.nanoTime() - t0) < 2e9)
    // just under the cap, the walk proceeds past the pre-check (these
    // frames then fail SCE decode, which is fine - different guard)
    val two = flood.take(16)
    assert(AacLc.decode(two).isEmpty) // malformed payload, not the cap
    // the real generator still decodes (cap does not over-trigger)
    assert(AacLc.decode(AacLc.gen(7L)).isDefined)
  }

  test("undecodable input is NULL, never a crash") {
    assert(AudioNorm.toWav(null) === null)
    assert(AudioNorm.toWav(Array[Byte]()) === null)
    assert(AudioNorm.toWav(Array.fill[Byte](64)(0x55)) === null)
    assert(AudioNorm.toWav("RIFFxxxxWAVEgarbage!".getBytes) === null)
    // truncated FLAC
    assert(AudioNorm.toWav(FlacPcm.gen(1L).dropRight(5)) === null)
    // ADTS with a flipped payload bit either decodes differently or is
    // NULL - never throws
    val adts = AacLc.gen(5L)
    for (i <- 40 to 60) {
      val bad = adts.clone(); bad(i) = (bad(i) ^ 0x10).toByte
      AudioNorm.toWav(bad)
    }
  }
}
