package graft.pipeline

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MPEG audio (MP3) FRAME-HEADER walk — the transform-coded audio half
  * of the multimodal tier that IS decodable from public structure alone:
  * the frame headers. Full PCM reconstruction would need the Huffman +
  * IMDCT pipeline (the remaining documented stub); everything a corpus
  * pipeline actually asks of an .mp3 column — codec parameters, frame
  * count, duration, real-vs-declared bitrate, VBR detection — lives in
  * the fixed 4-byte headers and the Xing/Info tag, implemented here from
  * the public MPEG-1/2/2.5 audio framing spec (ISO/IEC 11172-3 §2.4.1,
  * the de-facto 2.5 extension, and the Xing VBR header layout).
  *
  * Decode contract:
  *   - sync SCAN: leading non-audio bytes (ID3 prefix junk, stream
  *     capture noise) are skipped to the first byte offset where a
  *     structurally-valid header parses (11-bit sync + no reserved
  *     version/layer/bitrate/samplerate codes)
  *   - frame WALK: from there, frames must tile back-to-back (each
  *     next header re-validated); the walk stops at the first byte that
  *     no longer parses, and only FULLY-PRESENT frames count
  *   - Xing/Info: in the FIRST frame (Layer III), at the spec offset
  *     (4 + side-info size for the version/mode), `Xing` (VBR) or
  *     `Info` (CBR) + flags; the frame-count field is surfaced when its
  *     flag bit is set
  *   - stats are INTEGER-EXACT and oracle-replayable: duration_ms =
  *     frames·spf·1000 ÷ rate, avg_kbps = bytes·8·rate ÷ (frames·spf)
  *     ÷ 1000 — sequential integer divisions, fixed order
  *
  * Scale: one narrow codegen'd expression per row; bytes never leave
  * the task, nothing shuffles.
  */
object Mp3Header {

  /** kbps by [version, layer, index 1..14]; index 0 (free-format) and 15
    * are rejected as unwalkable. Public table, ISO 11172-3 / 13818-3. */
  private val V1L1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  private val V1L2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  private val V1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val V2L1 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
  private val V2L23 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  /** Hz by [version, index 0..2]; index 3 reserved. */
  private val RateV1 = Array(44100, 48000, 32000)
  private val RateV2 = Array(22050, 24000, 16000)
  private val RateV25 = Array(11025, 12000, 8000)

  /** One parsed frame header. `version`: 1=MPEG1, 2=MPEG2, 25=MPEG2.5. */
  private final case class Frame(version: Int, layer: Int, kbps: Int,
      rate: Int, padding: Int, channels: Int, frameLen: Int) {
    def samplesPerFrame: Int = layer match {
      case 1 => 384
      case 2 => 1152
      case _ => if (version == 1) 1152 else 576
    }
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  /** Parse the 4-byte header at `i`; None for anything reserved/invalid. */
  private def header(b: Array[Byte], i: Int): Option[Frame] = {
    if (i + 4 > b.length) return None
    if (u8(b, i) != 0xff || (u8(b, i + 1) & 0xe0) != 0xe0) return None
    val verBits = (u8(b, i + 1) >> 3) & 3
    val layerBits = (u8(b, i + 1) >> 1) & 3
    if (verBits == 1 || layerBits == 0) return None // reserved codes
    val version = verBits match { case 3 => 1; case 2 => 2; case _ => 25 }
    val layer = 4 - layerBits // 11→1, 10→2, 01→3
    val bi = (u8(b, i + 2) >> 4) & 15
    val si = (u8(b, i + 2) >> 2) & 3
    if (bi == 0 || bi == 15 || si == 3) return None // free-format/reserved
    val kbps = (version, layer) match {
      case (1, 1) => V1L1(bi)
      case (1, 2) => V1L2(bi)
      case (1, 3) => V1L3(bi)
      case (_, 1) => V2L1(bi)
      case _ => V2L23(bi)
    }
    val rate = version match {
      case 1 => RateV1(si)
      case 2 => RateV2(si)
      case _ => RateV25(si)
    }
    val padding = (u8(b, i + 2) >> 1) & 1
    val channels = if (((u8(b, i + 3) >> 6) & 3) == 3) 1 else 2
    val frameLen =
      if (layer == 1) (12 * kbps * 1000 / rate + padding) * 4
      else {
        val spf = if (layer == 2 || version == 1) 1152 else 576
        spf / 8 * kbps * 1000 / rate + padding
      }
    if (frameLen < 4) None
    else Some(Frame(version, layer, kbps, rate, padding, channels, frameLen))
  }

  /** Layer III side-info size for (version, channels) — the Xing tag
    * sits right after it (public Xing header layout). */
  private def sideInfoSize(version: Int, channels: Int): Int =
    if (version == 1) { if (channels == 1) 17 else 32 }
    else { if (channels == 1) 9 else 17 }

  final case class Mp3Meta(version: Int, layer: Int, sampleRate: Int,
      channels: Int, bitrateKbps: Int, frames: Long, totalBytes: Long,
      durationMs: Long, avgKbps: Long, xingFrames: Option[Long], vbr: Boolean)

  def parse(b: Array[Byte]): Option[Mp3Meta] = {
    if (b == null || b.length < 4) return None
    // sync scan: first offset where a header structurally parses
    var start = 0
    var first: Option[Frame] = None
    while (start + 4 <= b.length && first.isEmpty) {
      first = header(b, start)
      if (first.isEmpty) start += 1
    }
    val f0 = first.getOrElse(return None)
    // frame walk: count fully-present, back-to-back-parsing frames
    var i = start
    var frames = 0L
    var bytes = 0L
    var walking = true
    while (walking) {
      header(b, i) match {
        case Some(f) if i + f.frameLen <= b.length =>
          frames += 1
          bytes += f.frameLen
          i += f.frameLen
        case _ => walking = false
      }
    }
    if (frames == 0) return None
    // Xing/Info in the first frame (Layer III): tag after the side info
    var xingFrames: Option[Long] = None
    var vbr = false
    if (f0.layer == 3) {
      val off = start + 4 + sideInfoSize(f0.version, f0.channels)
      if (off + 8 <= b.length && off + 8 <= start + f0.frameLen) {
        val tag = new String(b, off, 4, "US-ASCII")
        if (tag == "Xing" || tag == "Info") {
          vbr = tag == "Xing"
          val flags = ((u8(b, off + 4) << 24) | (u8(b, off + 5) << 16) |
            (u8(b, off + 6) << 8) | u8(b, off + 7)).toLong
          // count read bounded by the FIRST FRAME's extent too (not
          // just b.length): a short first frame must not let the 4
          // count bytes be read out of the next frame's data
          if ((flags & 1L) != 0 && off + 12 <= b.length &&
              off + 12 <= start + f0.frameLen)
            xingFrames = Some(((u8(b, off + 8).toLong << 24) |
              (u8(b, off + 9) << 16) | (u8(b, off + 10) << 8) |
              u8(b, off + 11)) & 0xffffffffL)
        }
      }
    }
    val spf = f0.samplesPerFrame.toLong
    Some(Mp3Meta(f0.version, f0.layer, f0.rate, f0.channels, f0.kbps,
      frames, bytes,
      durationMs = frames * spf * 1000L / f0.rate,
      avgKbps = bytes * 8L * f0.rate / (frames * spf) / 1000L,
      xingFrames = xingFrames, vbr = vbr))
  }

  def parseRow(bytes: Array[Byte]): InternalRow = parse(bytes) match {
    case Some(m) => InternalRow(
      UTF8String.fromString(if (m.version == 25) "2.5" else m.version.toString),
      m.layer, m.sampleRate, m.channels, m.bitrateKbps, m.frames,
      m.totalBytes, m.durationMs, m.avgKbps,
      m.xingFrames.map(Long.box).orNull, m.vbr)
    case None => null
  }

  /** Per-frame walk rows for [[Mp3FramesExpr]]: one entry per
    * fully-present frame — its byte offset in the stream, on-wire
    * length, padding bit, and codec parameters. The offsets come from
    * the ACTUAL walk (junk prefix included), so the gate's closed-form
    * prefix-sum oracle pins the frame-length arithmetic per frame, not
    * just in aggregate. */
  def framesRows(b: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (b == null || b.length < 4) return null
    var start = 0
    var first: Option[Frame] = None
    while (start + 4 <= b.length && first.isEmpty) {
      first = header(b, start)
      if (first.isEmpty) start += 1
    }
    if (first.isEmpty) return null
    val rows = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var i = start
    var idx = 0
    var walking = true
    while (walking) {
      header(b, i) match {
        case Some(f) if i + f.frameLen <= b.length =>
          rows += InternalRow(idx, i.toLong, f.frameLen, f.padding, f.kbps, f.rate)
          i += f.frameLen
          idx += 1
        case _ => walking = false
      }
    }
    if (rows.isEmpty) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(rows.toArray[Any])
  }

  /** `mp3_frames(binary)`: array of per-frame structs (index, byte
    * offset, on-wire length, padding bit, kbps, rate), null if no
    * structurally-valid frame — the audio analog of video frame
    * sampling: downstream explodes ONLY this tiny struct array, the
    * payload bytes never leave their row. */
  case class Mp3FramesExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = Mp3FramesExpr.schema
    override def nullable: Boolean = true
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == BinaryType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"mp3_frames requires binary input, got ${child.dataType.catalogString}")
    override def nullSafeEval(input: Any): Any =
      Mp3Header.framesRows(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |${ev.value} = graft.pipeline.Mp3Header.framesRows($c);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "mp3_frames"
  }

  object Mp3FramesExpr {
    val element: StructType = StructType(Seq(
      StructField("frame_idx", IntegerType),
      StructField("offset", LongType),
      StructField("frame_len", IntegerType),
      StructField("padding", IntegerType),
      StructField("kbps", IntegerType),
      StructField("rate", IntegerType)))
    val schema: DataType = ArrayType(element, containsNull = false)
  }

  /** `mp3_meta(binary)`: parsed frame-header stats, null if no frame. */
  case class Mp3MetaExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = Mp3MetaExpr.schema
    override def nullable: Boolean = true
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == BinaryType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"mp3_meta requires binary input, got ${child.dataType.catalogString}")
    override def nullSafeEval(input: Any): Any =
      Mp3Header.parseRow(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |${ev.value} = graft.pipeline.Mp3Header.parseRow($c);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "mp3_meta"
  }

  object Mp3MetaExpr {
    val schema: StructType = StructType(Seq(
      StructField("version", StringType),
      StructField("layer", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("bitrate_kbps", IntegerType),
      StructField("frames", LongType),
      StructField("total_bytes", LongType),
      StructField("duration_ms", LongType),
      StructField("avg_kbps", LongType),
      StructField("xing_frames", LongType, nullable = true),
      StructField("vbr", BooleanType)))
  }
}
