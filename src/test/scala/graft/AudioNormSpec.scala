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
