package graft.pipeline

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real audio/video CONTAINER header parsing — the second concrete codec
  * family behind the [[Multimodal]] decode seam, shrinking the stub to
  * codec (sample/pixel) decode only. Pure-JVM byte inspection of the two
  * dominant containers:
  *
  *   - WAV/RIFF: "RIFF" + size + "WAVE", then a chunk walk (chunks are
  *     `[4cc][le32 size][payload]`, word-aligned) to the `fmt ` chunk
  *     for channels / sample rate / byte rate and the `data` chunk for
  *     payload size; duration = data size ÷ byte rate (RIFF spec /
  *     RFC 2361 layout).
  *   - MP4 (ISO BMFF, ISO 14496-12): `[be32 size][4cc]` box walk — the
  *     file must lead with `ftyp`; `moov`→`mvhd` carries timescale and
  *     duration (v0 32-bit / v1 64-bit fields), `moov`→`trak`→`tkhd`
  *     carries presentation width/height as 16.16 fixed point. Handles
  *     largesize (size==1) and to-end (size==0) boxes.
  *
  * Exposed as the `av_meta(bytes)` Catalyst expression returning
  * `struct<container, sample_rate, channels, duration_s, width, height>`
  * (null for unrecognizable bytes), codegen'd like
  * [[ImageHeader.ImageMetaExpr]] so media scans stay inside whole-stage
  * codegen.
  *
  * AUDIO codec decode is real too: [[decodeWavPcm]] / `wav_pcm(bytes)`
  * decodes the `data` chunk through the format's actual codec —
  * 16-bit PCM words, G.711 µ-law/A-law companding expansion
  * ([[ulaw2linear]]/[[alaw2linear]]), or the IMA ADPCM adaptive
  * state machine — into integer-exact sample statistics, all pure
  * JVM. FRAME RATE is real as well: the `mdia`→`mdhd` media timescale
  * plus the `stbl`→`stts` sample table give fps = round(samples ·
  * timescale / Σ count·delta) — still container metadata, no codec
  * required. MP3 framing is decoded for real too ([[Mp3Header]]: sync
  * scan, frame walk, Xing/VBR). What remains outside is transform
  * DECODE only (AAC, H.264 sample reconstruction): that residue is the
  * [[Multimodal]] stub.
  */
object AvHeader {

  /** Parse result as a Catalyst row, or null if neither container. */
  def parseRow(bytes: Array[Byte]): InternalRow = parse(bytes) match {
    case Some(m) => InternalRow(
      UTF8String.fromString(m.container),
      boxInt(m.sampleRate), boxInt(m.channels), boxInt(m.durationS),
      boxInt(m.width), boxInt(m.height), boxInt(m.fps))
    case None => null
  }

  private def boxInt(v: Int): Any =
    if (v < 0) null else Int.box(v)

  /** Parsed header; -1 marks a field the container does not carry. */
  final case class AvMeta(container: String, sampleRate: Int, channels: Int,
      durationS: Int, width: Int, height: Int, fps: Int = -1)

  def parse(b: Array[Byte]): Option[AvMeta] =
    if (b == null) None else wav(b).orElse(mp4(b))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)) & 0xffffffffL
  private def be32(b: Array[Byte], i: Int): Long =
    ((u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)) & 0xffffffffL
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def tag(b: Array[Byte], i: Int): String = new String(b, i, 4, "US-ASCII")

  // ---- WAV/RIFF ----------------------------------------------------------

  private def wav(b: Array[Byte]): Option[AvMeta] = {
    if (b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    var i = 12
    var channels = -1
    var sampleRate = -1L
    var byteRate = -1L
    var dataSize = -1L
    while (i + 8 <= b.length && (sampleRate < 0 || dataSize < 0)) {
      val id = tag(b, i)
      val sz = le32(b, i + 4)
      if (id == "fmt ") {
        // PCM fmt payload: format u16, channels u16, sample rate le32,
        // byte rate le32, block align u16, bits u16
        if (sz < 16 || i + 8 + 16 > b.length) return None
        channels = le16(b, i + 10)
        sampleRate = le32(b, i + 12)
        byteRate = le32(b, i + 16)
      } else if (id == "data") {
        // duration comes from the DECLARED size: a header-only scan must
        // not require the (possibly truncated/streamed) payload bytes
        dataSize = sz
      }
      val step = sz + (sz & 1L) // chunks are word-aligned
      if (step > Int.MaxValue - 8 - i) {
        // declared size walks past any plausible buffer — stop the scan;
        // whatever was already found decides
        i = b.length
      } else i += 8 + step.toInt
    }
    if (channels < 1 || sampleRate < 1 || byteRate < 1 || dataSize < 0) None
    else Some(AvMeta("wav", sampleRate.toInt, channels,
      (dataSize / byteRate).toInt, -1, -1))
  }

  // ---- MP4 / ISO BMFF ----------------------------------------------------

  /** Walk the boxes in `[lo, hi)`, calling `f(type, payloadLo, boxEnd)`.
    * Returns false on a structurally-broken box. (Shared with
    * [[StructFingerprint]]'s sample-table walk.) */
  private[pipeline] def walkBoxes(b: Array[Byte], lo: Int, hi: Int)(
      f: (String, Int, Int) => Unit): Boolean = {
    var i = lo
    while (i + 8 <= hi) {
      var size = be32(b, i)
      val typ = tag(b, i + 4)
      var payload = i + 8
      if (size == 1L) { // 64-bit largesize
        if (i + 16 > hi) return false
        size = be64(b, i + 8)
        payload = i + 16
      } else if (size == 0L) size = (hi - i).toLong // box runs to the end
      if (size < (payload - i).toLong || size > (hi - i).toLong) return false
      f(typ, payload, i + size.toInt)
      i += size.toInt
    }
    true
  }

  private def mp4(b: Array[Byte]): Option[AvMeta] = {
    if (b.length < 8 || be32(b, 0) < 8 || tag(b, 4) != "ftyp") return None
    var durationS = -1L
    var width = -1
    var height = -1
    var fpsVide = -1 // from a trak whose hdlr declares 'vide'
    var fpsAny = -1  // fallback: first trak with a sample table at all
    val ok = walkBoxes(b, 0, b.length) { (typ, lo, hi) =>
      if (typ == "moov") walkBoxes(b, lo, hi) { (t2, lo2, hi2) =>
        if (t2 == "mvhd" && hi2 - lo2 >= 20) {
          val v = u8(b, lo2)
          // v0: ver/flags, creation u32, modification u32, timescale,
          // duration u32; v1 widens the times to u64
          val (ts, dur) =
            if (v == 0) (be32(b, lo2 + 12), be32(b, lo2 + 16))
            else if (hi2 - lo2 >= 32) (be32(b, lo2 + 20), be64(b, lo2 + 24))
            else (0L, 0L)
          if (ts > 0) durationS = dur / ts
        } else if (t2 == "trak") walkBoxes(b, lo2, hi2) { (t3, lo3, hi3) =>
          if (t3 == "tkhd" && width < 0) {
            val v = u8(b, lo3)
            // 16.16 fixed-point presentation dims at the end of tkhd
            val (wOff, hOff) = if (v == 0) (76, 80) else (88, 92)
            if (hi3 - lo3 >= hOff + 4) {
              width = (be32(b, lo3 + wOff) >> 16).toInt
              height = (be32(b, lo3 + hOff) >> 16).toInt
            }
          } else if (t3 == "mdia") {
            // frame rate from the SAMPLE TABLE (still container
            // metadata, no codec needed): total stts sample count over
            // the media-timescale duration — mdia→mdhd carries the
            // media timescale (the movie timescale does NOT apply to
            // sample deltas), mdia→minf→stbl→stts the (count, delta)
            // runs. fps = round(samples · ts / Σ count·delta). The
            // hdlr handler type disambiguates tracks: an audio-first
            // file's stts would otherwise report the AAC packet rate
            // as the frame rate — only a 'vide' trak's rate wins;
            // handler-less files fall back to the first sample table.
            var mdhdTs = -1L
            var nSamples = -1L
            var sampleDur = -1L
            var handler: String = null
            walkBoxes(b, lo3, hi3) { (t4, lo4, hi4) =>
              if (t4 == "mdhd" && hi4 - lo4 >= 24) {
                val v = u8(b, lo4)
                mdhdTs =
                  if (v == 0) be32(b, lo4 + 12)
                  else if (hi4 - lo4 >= 32) be32(b, lo4 + 20)
                  else -1L
              } else if (t4 == "hdlr" && hi4 - lo4 >= 12) {
                handler = tag(b, lo4 + 8)
              } else if (t4 == "minf") walkBoxes(b, lo4, hi4) { (t5, lo5, hi5) =>
                if (t5 == "stbl") walkBoxes(b, lo5, hi5) { (t6, lo6, hi6) =>
                  if (t6 == "stts" && hi6 - lo6 >= 8) {
                    val entries = be32(b, lo6 + 4)
                    if (lo6 + 8 + entries * 8 <= hi6) {
                      // cnt and delta are UNSIGNED 32-bit from untrusted
                      // bytes: cnt·delta alone can reach ~2^64 and wrap
                      // Long, yielding a wrong-but-plausible fps. Bound
                      // the running sums to 2^53 (far beyond any real
                      // sample table) and reject the whole stts on
                      // overflow — fps stays -1 rather than lying.
                      val cap = 1L << 53
                      var e = 0L
                      var ns = 0L
                      var nd = 0L
                      var sane = true
                      while (e < entries && sane) {
                        val off = (lo6 + 8 + e * 8).toInt
                        val cnt = be32(b, off)
                        val del = be32(b, off + 4)
                        ns += cnt
                        if (ns > cap || (del != 0 && cnt > cap / del)) sane = false
                        else {
                          nd += cnt * del
                          if (nd > cap) sane = false
                        }
                        e += 1
                      }
                      if (sane) {
                        nSamples = ns
                        sampleDur = nd
                      }
                    }
                  }
                }
              }
            }
            // nSamples ≤ 2^53 and mdhdTs ≤ 2^32-1, so the product can
            // still wrap Long on adversarial tables — guard the multiply
            // and the Int narrowing; on either, fps stays -1.
            if (mdhdTs > 0 && sampleDur > 0 && nSamples >= 0 &&
                nSamples <= (Long.MaxValue - sampleDur / 2) / mdhdTs) {
              val f64 = (nSamples * mdhdTs + sampleDur / 2) / sampleDur
              if (f64 >= 0 && f64 <= Int.MaxValue) {
                val f = f64.toInt
                if (handler == "vide" && fpsVide < 0) fpsVide = f
                if (handler == null && fpsAny < 0) fpsAny = f
              }
            }
          }
        }
      }
    }
    if (!ok || durationS < 0) None
    else Some(AvMeta("mp4", -1, -1, durationS.toInt, width, height,
      if (fpsVide >= 0) fpsVide else fpsAny))
  }

  // ---- WAV PCM sample decode --------------------------------------------

  /** Decoded sample statistics — CODEC-level decode, not a header walk:
    * every sample word in the `data` chunk is read (and for compressed
    * formats, expanded through the codec's integer state machine).
    * Integer-exact fields only (min/max/sum/sum-of-squares over signed
    * 16-bit values) so an external engine can replay the decode
    * bit-for-bit from the construction parameters. `codec` names the
    * decode path taken: `pcm_s16le`, `ulaw`, `alaw`, `ima_adpcm`. */
  final case class PcmStats(sampleRate: Int, channels: Int, nSamples: Long,
    minS: Long, maxS: Long, sumS: Long, sumSq: Long, codec: String = "pcm_s16le")

  // ---- G.711 (ITU-T) expansion: COMPRESSED telephony audio ------------
  // Table-free integer forms of the canonical segmented decode (the
  // same arithmetic the published reference tables are generated from).

  /** µ-law byte → linear int16 (range ±32124). */
  def ulaw2linear(byte: Int): Int = {
    val u = (~byte) & 0xFF
    var t = ((u & 0x0F) << 3) + 0x84
    t <<= (u & 0x70) >> 4
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** A-law byte → linear int16 (range ±32256). */
  def alaw2linear(byte: Int): Int = {
    val a = (byte ^ 0x55) & 0xFF
    var t = (a & 0x0F) << 4
    val seg = (a & 0x70) >> 4
    if (seg == 0) t += 8
    else if (seg == 1) t += 0x108
    else { t += 0x108; t <<= seg - 1 }
    if ((a & 0x80) != 0) t else -t
  }

  // ---- IMA/DVI ADPCM (4 bits/sample): COMPRESSED 4:1 audio ------------

  private val ImaStep: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  private val ImaIndexAdjust: Array[Int] = Array(
    -1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** Decode the sample payload of a WAV byte stream: chunk-walk to
    * `fmt ` and `data`, then expand every sample through the format's
    * codec:
    *
    *   - format 1, 16-bit: interleaved little-endian int16 PCM
    *   - format 7, 8-bit: G.711 µ-law (COMPRESSED — each byte expands
    *     through the segmented [[ulaw2linear]] curve)
    *   - format 6, 8-bit: G.711 A-law ([[alaw2linear]])
    *   - format 0x11, 4-bit mono: IMA ADPCM (COMPRESSED 4:1 — block
    *     header carries the int16 predictor seed + step index; every
    *     nibble advances the adaptive step-size state machine)
    *
    * Samples are whatever portion of the declared data size is actually
    * present in the buffer (a header-only stream decodes zero samples —
    * distinguishable from silence by `nSamples`). None when the bytes
    * are not WAV or the format is not one of the four above. */
  /** Decoded linear samples (interleaved when multichannel) plus the
    * stream parameters — the materialized twin of [[decodeWavPcm]],
    * feeding [[resampleWav]]. */
  final case class WavSamples(sampleRate: Int, channels: Int,
      codec: String, samples: Array[Int])

  /** [[decodeWavPcm]] with the expanded samples materialized. */
  def decodeWavSamples(b: Array[Byte]): Option[WavSamples] = {
    val out = new java.util.ArrayList[Integer]()
    decodeWavWith(b, s => out.add(Int.box(s))).map { case (rate, ch, codec) =>
      val arr = new Array[Int](out.size())
      var i = 0
      while (i < arr.length) { arr(i) = out.get(i); i += 1 }
      WavSamples(rate, ch, codec, arr)
    }
  }

  def decodeWavPcm(b: Array[Byte]): Option[PcmStats] = {
    var n = 0L
    var mn = Long.MaxValue
    var mx = Long.MinValue
    var sum = 0L
    var sumSq = 0L
    decodeWavWith(b, { s =>
      val v = s.toLong
      if (v < mn) mn = v
      if (v > mx) mx = v
      sum += v
      sumSq += v * v
      n += 1
    }).map { case (rate, ch, codec) =>
      if (n == 0) { mn = 0L; mx = 0L }
      PcmStats(rate, ch, n, mn, mx, sum, sumSq, codec)
    }
  }

  private def decodeWavWith(b: Array[Byte],
      emit: Int => Unit): Option[(Int, Int, String)] = {
    if (b == null || b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE")
      return None
    var i = 12
    var channels = -1
    var sampleRate = -1L
    var bits = -1
    var fmt = -1
    var blockAlign = -1
    var dataLo = -1
    var dataSize = -1L
    while (i + 8 <= b.length && (bits < 0 || dataLo < 0)) {
      val id = tag(b, i)
      val sz = le32(b, i + 4)
      if (id == "fmt ") {
        if (sz < 16 || i + 8 + 16 > b.length) return None
        fmt = le16(b, i + 8)
        channels = le16(b, i + 10)
        sampleRate = le32(b, i + 12)
        blockAlign = le16(b, i + 20)
        bits = le16(b, i + 22)
      } else if (id == "data") {
        dataLo = i + 8
        dataSize = sz
      }
      val step = sz + (sz & 1L)
      if (step > Int.MaxValue - 8 - i) i = b.length else i += 8 + step.toInt
    }
    if (channels < 1 || sampleRate < 1 || dataLo < 0) return None
    val avail = math.min(dataSize, (b.length - dataLo).toLong)
    val codec = (fmt, bits) match {
      case (1, 16) =>
        var k = 0L
        val words = avail / 2
        while (k < words) {
          emit(le16(b, dataLo + (k * 2).toInt).toShort.toInt)
          k += 1
        }
        "pcm_s16le"
      case (7, 8) =>
        var k = 0L
        while (k < avail) { emit(ulaw2linear(b(dataLo + k.toInt))); k += 1 }
        "ulaw"
      case (6, 8) =>
        var k = 0L
        while (k < avail) { emit(alaw2linear(b(dataLo + k.toInt))); k += 1 }
        "alaw"
      case (0x11, 4) if channels == 1 && blockAlign >= 5 =>
        // Mono IMA blocks: [int16 LE predictor][u8 step index][reserved]
        // then 4-bit codes, LOW nibble first. The header predictor IS
        // the block's first output sample; a trailing partial block
        // decodes whatever codes are present.
        var pos = dataLo
        val end = dataLo + avail.toInt
        while (pos + 4 <= end) {
          var pred = le16(b, pos).toShort.toInt
          var idx = math.min(b(pos + 2) & 0xFF, 88)
          emit(pred)
          var p = pos + 4
          val blockEnd = math.min(pos + blockAlign, end)
          while (p < blockEnd) {
            val w = b(p) & 0xFF
            var half = 0
            while (half < 2) {
              val code = if (half == 0) w & 0x0F else (w >> 4) & 0x0F
              val step = ImaStep(idx)
              var diff = step >> 3
              if ((code & 4) != 0) diff += step
              if ((code & 2) != 0) diff += step >> 1
              if ((code & 1) != 0) diff += step >> 2
              pred = if ((code & 8) != 0) pred - diff else pred + diff
              if (pred > 32767) pred = 32767
              if (pred < -32768) pred = -32768
              idx += ImaIndexAdjust(code)
              if (idx < 0) idx = 0
              if (idx > 88) idx = 88
              emit(pred)
              half += 1
            }
            p += 1
          }
          pos += blockAlign
        }
        "ima_adpcm"
      case _ => return None
    }
    Some((sampleRate.toInt, channels, codec))
  }

  /** AUDIO RESAMPLE — the audio normalization operator of a
    * training-data pipeline: decode any supported WAV (PCM16 / µ-law /
    * A-law / IMA ADPCM), zero-order-hold resample to `outRate`, and
    * re-encode as a canonical PCM16 WAV — so compressed telephony
    * audio comes out as normalized linear PCM at the target rate. The
    * resampler is exact integer arithmetic (output frame j reads
    * source frame ⌊j·inRate/outRate⌋, nOut = ⌊nIn·outRate/inRate⌋
    * frames), so an external oracle replays every output sample.
    * Null on undecodable input, an out-of-range target rate, or an
    * output that would exceed 2^28 samples (amplification guard). */
  def resampleWav(b: Array[Byte], outRate: Int): Array[Byte] =
    try resampleWavUnsafe(b, outRate)
    catch { case _: RuntimeException => null } // malformed input → NULL, never a task kill

  private def resampleWavUnsafe(b: Array[Byte], outRate: Int): Array[Byte] = {
    if (outRate < 1 || outRate > 768000) return null
    decodeWavSamples(b) match {
      case None => null
      case Some(ws) =>
        val ch = ws.channels
        if (ch < 1 || ws.samples.length % ch != 0) return null
        val inFrames = ws.samples.length / ch
        // Bound the output in LONG space before allocating: a crafted
        // header (sampleRate=1, outRate=768000) amplifies memory ~10^6×
        // and (inFrames·outRate/sampleRate)·ch can exceed Int range —
        // `.toInt` would wrap to a negative/bogus allocation size and
        // kill the task instead of returning NULL per the contract.
        // 1 GiB of int16 output frames is far past any sane normalize
        // target; reject rather than allocate.
        val outFramesL = inFrames.toLong * outRate / ws.sampleRate
        if (outFramesL * ch > (1L << 28)) return null
        val outFrames = outFramesL.toInt
        val out = new Array[Int](outFrames * ch)
        var j = 0
        while (j < outFrames) {
          val src = (j.toLong * ws.sampleRate / outRate).toInt
          var c = 0
          while (c < ch) { out(j * ch + c) = ws.samples(src * ch + c); c += 1 }
          j += 1
        }
        encodePcm16Wav(out, outRate, ch)
    }
  }

  /** Canonical PCM16 WAV writer (RIFF + fmt(16, format 1) + data). */
  def encodePcm16Wav(samples: Array[Int], rate: Int, channels: Int): Array[Byte] = {
    val dataSize = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * channels * 2)          // byte rate
      .putShort((channels * 2).toShort)     // block align
      .putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < samples.length) {
      val v = math.max(-32768, math.min(32767, samples(i)))
      bb.putShort(v.toShort)
      i += 1
    }
    bb.array()
  }

  /** Boxed entry point for [[resampleWav]] shared by eval and codegen. */
  def resampleEval(b: Array[Byte], rate: Long): Array[Byte] =
    if (rate < 1 || rate > 768000) null else resampleWav(b, rate.toInt)

  /** `wav_resample(bytes, rate)`: zero-order-hold resample to `rate`,
    * re-encoded as canonical PCM16 WAV; NULL on undecodable input. */
  case class WavResampleExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = left.dataType == BinaryType &&
        (right.dataType == LongType || right.dataType == IntegerType)
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "wav_resample requires (binary, integral)")
    }
    override def nullSafeEval(b: Any, r: Any): Any = {
      val rate = r match {
        case l: java.lang.Long => l.longValue
        case i: java.lang.Integer => i.longValue
      }
      AvHeader.resampleEval(b.asInstanceOf[Array[Byte]], rate)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (b, r) => {
        s"""
           |${ev.value} = graft.pipeline.AvHeader.resampleEval($b, (long) $r);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(l, r)
    override def prettyName: String = "wav_resample"
  }

  /** [[decodeWavPcm]] as a Catalyst row for [[WavPcmExpr]]. */
  def decodePcmRow(bytes: Array[Byte]): InternalRow = decodeWavPcm(bytes) match {
    case Some(s) => InternalRow(Int.box(s.sampleRate), Int.box(s.channels),
      Long.box(s.nSamples), Long.box(s.minS), Long.box(s.maxS),
      Long.box(s.sumS), Long.box(s.sumSq), UTF8String.fromString(s.codec))
    case None => null
  }

  /** `wav_pcm(bytes)`: decoded sample statistics (PCM16 / µ-law / A-law
    * / IMA ADPCM), null when the bytes are not a decodable WAV stream.
    * Codegen'd like [[AvMetaExpr]] so audio scans stay inside
    * whole-stage codegen. */
  case class WavPcmExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = WavPcmExpr.schema
    override def nullable: Boolean = true
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == BinaryType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"wav_pcm requires binary input, got ${child.dataType.catalogString}")
    override def nullSafeEval(input: Any): Any =
      AvHeader.decodePcmRow(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |${ev.value} = graft.pipeline.AvHeader.decodePcmRow($c);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "wav_pcm"
  }

  object WavPcmExpr {
    val schema: StructType = StructType(Seq(
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("n_samples", LongType),
      StructField("min_s", LongType),
      StructField("max_s", LongType),
      StructField("sum_s", LongType),
      StructField("sum_sq", LongType),
      StructField("codec", StringType)))
  }

  /** `av_meta(bytes)`: container metadata struct, null when the bytes are
    * not a recognized WAV/MP4 stream. */
  case class AvMetaExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = AvMetaExpr.schema
    override def nullable: Boolean = true
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == BinaryType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"av_meta requires binary input, got ${child.dataType.catalogString}")
    override def nullSafeEval(input: Any): Any =
      AvHeader.parseRow(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |${ev.value} = graft.pipeline.AvHeader.parseRow($c);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "av_meta"
  }

  object AvMetaExpr {
    val schema: StructType = StructType(Seq(
      StructField("container", StringType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("duration_s", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("fps", IntegerType)))
  }
}
