package graft.pipeline

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** AAC ADTS FRAME-HEADER walk — the second transform-coded audio codec
  * whose STRUCTURE is decodable from public framing alone (ISO/IEC
  * 13818-7 §6.2: the Audio Data Transport Stream header). Sample
  * reconstruction (the Huffman + IMDCT filterbank) stays behind the
  * documented codec seam; codec parameters, frame count, CRC presence,
  * and integer-exact duration/bitrate — everything a corpus pipeline
  * asks of an .aac column — live in the 7/9-byte headers.
  *
  * Decode contract:
  *   - sync SCAN: leading non-audio bytes are skipped to the first
  *     offset where a header structurally parses (12-bit 0xFFF sync,
  *     layer==0, non-reserved sampling_frequency_index, nonzero
  *     channel_configuration, frame length ≥ header length)
  *   - frame WALK: `aac_frame_length` (13 bits, INCLUDING the header)
  *     jumps to the next frame, which must re-validate — the walk never
  *     re-syncs on payload bytes, so a planted `FF F1` inside a payload
  *     must not count as a frame; only fully-present frames count
  *   - protection_absent=0 means a 2-byte CRC follows the 7-byte
  *     header; the CRC is skipped, not verified (checksum, not
  *     structure)
  *   - stats are INTEGER-EXACT and oracle-replayable: each frame
  *     carries 1024 PCM samples per channel, so duration_ms =
  *     frames·1024·1000 ÷ rate and avg_kbps = bytes·8·rate ÷
  *     (frames·1024) ÷ 1000, sequential integer divisions in that
  *     fixed order
  *
  * The gate's fixture is built in pure SQL column arithmetic (the
  * byte-packing formulas inverted), so the oracle replays construction
  * AND expected stats in closed form — the parser is pinned as genuinely
  * reading the bit fields, not echoing a generator twin.
  *
  * Scale: one narrow codegen'd expression per row; bytes never leave
  * the task, nothing shuffles.
  */
object AdtsHeader {

  /** Hz by sampling_frequency_index 0..11 (12 reserved). Public table,
    * ISO 13818-7 / 14496-3. */
  private val Rates = Array(96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  /** One parsed header: (mpegVersion 2|4, profile+1 = audio object
    * type 1..4, rate, channels, crcPresent, frameLen). (Header parse
    * shared with [[StructFingerprint]]'s codec-blind frame walk.) */
  private[pipeline] final case class Frame(mpegVersion: Int, objectType: Int,
      rate: Int, channels: Int, crc: Boolean, frameLen: Int)

  private[pipeline] def header(b: Array[Byte], i: Int): Option[Frame] = {
    if (i + 7 > b.length) return None
    if (u8(b, i) != 0xff || (u8(b, i + 1) & 0xf0) != 0xf0) return None
    if (((u8(b, i + 1) >> 1) & 3) != 0) return None // layer must be 00
    val mpegVersion = if (((u8(b, i + 1) >> 3) & 1) == 1) 2 else 4
    val crc = (u8(b, i + 1) & 1) == 0 // protection_absent inverted
    val objectType = ((u8(b, i + 2) >> 6) & 3) + 1
    val sfi = (u8(b, i + 2) >> 2) & 15
    if (sfi >= Rates.length) return None // 12..15 reserved
    val chanCfg = ((u8(b, i + 2) & 1) << 2) | ((u8(b, i + 3) >> 6) & 3)
    if (chanCfg == 0) return None // 0 = channel config in PCE, unwalkable here
    // channel_configuration 1..6 == channel count; 7 means 7.1 = 8
    // channels (ISO 14496-3 Table 1.19) — surface the COUNT, not the
    // raw config, so 8-channel streams aren't misreported as 7
    val channels = if (chanCfg == 7) 8 else chanCfg
    val frameLen = ((u8(b, i + 3) & 3) << 11) | (u8(b, i + 4) << 3) |
      ((u8(b, i + 5) >> 5) & 7)
    val headerLen = if (crc) 9 else 7
    if (frameLen < headerLen) return None
    Some(Frame(mpegVersion, objectType, Rates(sfi), channels, crc, frameLen))
  }

  final case class AdtsMeta(mpegVersion: Int, objectType: Int, rate: Int,
      channels: Int, crc: Boolean, frames: Long, totalBytes: Long,
      durationMs: Long, avgKbps: Long)

  def parse(b: Array[Byte]): Option[AdtsMeta] = {
    if (b == null || b.length < 7) return None
    var start = 0
    var first: Option[Frame] = None
    while (start + 7 <= b.length && first.isEmpty) {
      first = header(b, start)
      if (first.isEmpty) start += 1
    }
    val f0 = first.getOrElse(return None)
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
    Some(AdtsMeta(f0.mpegVersion, f0.objectType, f0.rate, f0.channels,
      f0.crc, frames, bytes,
      durationMs = frames * 1024L * 1000L / f0.rate,
      avgKbps = bytes * 8L * f0.rate / (frames * 1024L) / 1000L))
  }

  def parseRow(bytes: Array[Byte]): InternalRow = parse(bytes) match {
    case Some(m) => InternalRow(m.mpegVersion, m.objectType, m.rate,
      m.channels, m.crc, m.frames, m.totalBytes, m.durationMs, m.avgKbps)
    case None => null
  }

  /** Per-frame walk rows for [[AdtsFramesExpr]]: one entry per
    * fully-present ADTS frame — index, byte offset (junk prefix
    * included: the offsets come from the ACTUAL sync scan + walk),
    * on-wire frame length from the 13-bit field, CRC-header flag, and
    * the payload length after the 7/9-byte header. The third
    * frame-walk explode alongside `mp3_frames` and `vp9_frames`. */
  def framesRows(b: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (b == null || b.length < 7) return null
    var start = 0
    var first: Option[Frame] = None
    while (start + 7 <= b.length && first.isEmpty) {
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
          rows += InternalRow(idx, i.toLong, f.frameLen,
            if (f.crc) 1 else 0, f.frameLen - (if (f.crc) 9 else 7))
          i += f.frameLen
          idx += 1
        case _ => walking = false
      }
    }
    if (rows.isEmpty) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(rows.toArray[Any])
  }

  /** `adts_frames(binary)`: array of per-frame structs (index, byte
    * offset, on-wire length, crc flag, payload length) from an ADTS
    * frame walk, null if no structurally-valid frame. */
  case class AdtsFramesExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = AdtsFramesExpr.schema
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"adts_frames requires binary input, got ${child.dataType.catalogString}")
    override def nullSafeEval(input: Any): Any =
      AdtsHeader.framesRows(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |${ev.value} = graft.pipeline.AdtsHeader.framesRows($c);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "adts_frames"
  }

  object AdtsFramesExpr {
    val schema: DataType = ArrayType(StructType(Seq(
      StructField("frame_idx", IntegerType),
      StructField("offset", LongType),
      StructField("frame_len", IntegerType),
      StructField("crc_present", IntegerType),
      StructField("payload_len", IntegerType))))
  }

  /** `adts_meta(binary)`: parsed ADTS stream stats, null if no frame. */
  case class AdtsMetaExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = AdtsMetaExpr.schema
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"adts_meta requires binary input, got ${child.dataType.catalogString}")
    override def nullSafeEval(input: Any): Any =
      AdtsHeader.parseRow(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |${ev.value} = graft.pipeline.AdtsHeader.parseRow($c);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "adts_meta"
  }

  object AdtsMetaExpr {
    val schema: StructType = StructType(Seq(
      StructField("mpeg_version", IntegerType),
      StructField("object_type", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("crc_present", BooleanType),
      StructField("frames", LongType),
      StructField("total_bytes", LongType),
      StructField("duration_ms", LongType),
      StructField("avg_kbps", LongType)))
  }
}
