package graft.pipeline

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** AUDIO NORMALIZATION to one canonical format — the single entry
  * point a training-data pipeline wants for an `audio` column of mixed
  * provenance: `audio_to_wav(bytes)` decodes ANY supported container /
  * codec and re-encodes as canonical PCM16 WAV at the source rate,
  * completing the normalization tier next to `wav_resample` (rate) and
  * `image_resize` (dimensions). Dispatch is by container magic:
  *
  *   - RIFF/WAVE (PCM16, G.711 µ-law/A-law, IMA ADPCM) — expanded
  *     through [[AvHeader]]'s integer-exact decoders (lossless in,
  *     sample-exact out)
  *   - fLaC — the first frame through [[FlacPcm]] (sample-exact,
  *     no seam), channels interleaved, rate from STREAMINFO
  *   - ADTS AAC-LC (0xFFF sync, layer 00) — [[AacLc]]/[[AacSynth]] to
  *     PCM doubles, quantized round(v·32768) clamped to int16
  *   - MPEG-1 Layer III (0xFFF sync, layer 01) — [[Mp3L3]]/[[Mp3Synth]]
  *     mono or stereo to PCM doubles, same quantization
  *
  * The integer paths (WAV codecs, FLAC) are bit-replayable by an
  * external oracle; the transform-codec paths inherit their modules'
  * documented seams (MP3's Annex B window, AAC's substitute books).
  * NULL on anything undecodable — never a task kill.
  *
  * Scale: one codegen'd expression per row; bytes never leave the
  * task, nothing shuffles.
  */
object AudioNorm {

  /** Quantize a nominal-full-scale double to int16. */
  private def s16(v: Double): Int = {
    val r = math.rint(v * 32768.0)
    if (r > 32767.0) 32767 else if (r < -32768.0) -32768 else r.toInt
  }

  def toWav(b: Array[Byte]): Array[Byte] =
    try {
      val ws = decodeUnsafe(b)
      if (ws == null) null
      else AvHeader.encodePcm16Wav(ws.samples, ws.sampleRate, ws.channels)
    } catch { case _: RuntimeException => null }

  /** Decode any supported container straight to interleaved 16-bit
    * samples + stream parameters — the same canonical PCM `toWav`
    * wraps in a RIFF container, WITHOUT the WAV byte round-trip.
    * Consumers that want samples (fingerprinting) call this;
    * consumers that want bytes (`audio_to_wav`) call [[toWav]], which
    * is exactly this plus one encode — the two can never diverge.
    * Null when the bytes don't decode. */
  def decodeSamples(b: Array[Byte]): AvHeader.WavSamples =
    try decodeUnsafe(b)
    catch { case _: RuntimeException => null }

  private def decodeUnsafe(b: Array[Byte]): AvHeader.WavSamples = {
    if (b == null || b.length < 12) return null
    // RIFF/WAVE: expand whatever codec the container carries
    if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') {
      return AvHeader.decodeWavSamples(b) match {
        case Some(ws) => AvHeader.WavSamples(ws.sampleRate, ws.channels,
          "pcm16", ws.samples)
        case None => null
      }
    }
    // FLAC: sample-exact first frame; rate from STREAMINFO. Samples
    // arrive at NATIVE bit depth (FlacPcm decodes 8/12/16/20/24), so
    // rescale to the 16-bit canon: shift left by (16−bps) below 16,
    // arithmetic-shift right by (bps−16) above — full-scale maps to
    // full-scale instead of 8-bit audio coming out 256× too quiet or
    // 24-bit hard-clipping.
    if (b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C') {
      val audio = FlacPcm.decode(b).getOrElse(return null)
      val meta = FlacHeader.parse(b).getOrElse(return null)
      val nch = audio.channels
      val bps = audio.bps
      if (bps < 4 || bps > 24) return null
      val out = new Array[Int](audio.blockSize * nch)
      var i = 0
      while (i < audio.blockSize) {
        var c = 0
        while (c < nch) {
          val raw = audio.samples(c)(i)
          val s = if (bps < 16) raw << (16 - bps)
                  else if (bps > 16) raw >> (bps - 16)
                  else raw
          out(i * nch + c) = if (s > 32767) 32767 else if (s < -32768) -32768 else s
          c += 1
        }
        i += 1
      }
      return AvHeader.WavSamples(meta.sampleRate, nch, "pcm16", out)
    }
    // 0xFFF sync: ADTS AAC (layer bits 00) vs MPEG audio (Layer III 01)
    if ((b(0) & 0xFF) == 0xFF && (b(1) & 0xE0) == 0xE0) {
      if ((b(1) & 0x06) == 0) {
        // ADTS: every frame to 1024 mono samples. AacLc.decode caps
        // total output at MaxSamples (2^28) from the header walk, so
        // a crafted minimal-frame stream can't amplify ~11 bytes into
        // an OOM; the Long-space re-check keeps this arm safe even if
        // that invariant ever moves.
        val rate = AacLc.decode(b).getOrElse(return null).rate
        val pcm = AacSynth.decodePcm(b).getOrElse(return null)
        if (pcm.length.toLong * 1024L > AacLc.MaxSamples) return null
        val out = new Array[Int](pcm.length * 1024)
        var f = 0
        while (f < pcm.length) {
          var i = 0
          while (i < 1024) { out(f * 1024 + i) = s16(pcm(f)(i)); i += 1 }
          f += 1
        }
        return AvHeader.WavSamples(rate, 1, "pcm16", out)
      }
      // MPEG-1 Layer III: the rate comes from the 4-byte HEADER's
      // samplerate index (ISO 11172-3 MPEG-1 table: 00=44.1k, 01=48k,
      // 10=32k, 11 reserved) — no extra entropy decode; Mp3Synth runs
      // the full Mp3L3.decode internally and fails closed on any shape
      // the decoder doesn't support (today: anything but 44.1 kHz
      // MPEG-1, whose band layout its Huffman walk assumes), so a
      // frame this label disagrees with can never produce samples —
      // the header parse only has to name the WAV container's rate.
      // The table below is the MPEG-1 table ONLY, so require the
      // version bits to say MPEG-1 (b1 & 0x18 == 0x18) here too —
      // relying on the decoder guard alone would let a future MPEG-2
      // (0xF3) decoder extension mislabel 22.05/24/16 kHz streams
      // through this arm. Stereo first, mono fallback.
      if ((b(1) & 0x18) != 0x18) return null
      val mp3Rate = ((b(2) >> 2) & 3) match {
        case 0 => 44100
        case 1 => 48000
        case 2 => 32000
        case _ => return null // reserved index
      }
      Mp3Synth.decodePcmStereo(b) match {
        case Some(ch) =>
          val n = ch(0).length
          val out = new Array[Int](2 * n)
          var i = 0
          while (i < n) {
            out(2 * i) = s16(ch(0)(i))
            out(2 * i + 1) = s16(ch(1)(i))
            i += 1
          }
          return AvHeader.WavSamples(mp3Rate, 2, "pcm16", out)
        case None =>
          val mono = Mp3Synth.decodePcm(b).getOrElse(return null)
          val out = new Array[Int](mono.length)
          var i = 0
          while (i < mono.length) { out(i) = s16(mono(i)); i += 1 }
          return AvHeader.WavSamples(mp3Rate, 1, "pcm16", out)
      }
    }
    null
  }

  /** `audio_to_wav(bytes)`: normalize any supported audio container to
    * canonical PCM16 WAV, else NULL. */
  case class AudioToWavExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"audio_to_wav requires binary input, got ${child.dataType.catalogString}")
    override def nullSafeEval(input: Any): Any =
      AudioNorm.toWav(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |${ev.value} = graft.pipeline.AudioNorm.toWav($c);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "audio_to_wav"
  }
}
