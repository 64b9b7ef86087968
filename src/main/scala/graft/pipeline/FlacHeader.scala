package graft.pipeline

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** FLAC STREAMINFO decode — lossless-compressed audio's structural
  * layer, from the public FLAC format spec (also RFC 9639): the `fLaC`
  * marker, the metadata-block walk (1-byte last-flag+type header +
  * 24-bit big-endian length per block), and the 34-byte STREAMINFO
  * block's packed fields — block/frame size bounds, the 20-bit sample
  * rate, 3-bit channels-minus-1, 5-bit bits-per-sample-minus-1, and the
  * 36-bit total-sample count that crosses byte boundaries with all of
  * them. Audio reconstruction (the LPC/Rice-coded subframes) stays
  * behind the codec seam; everything a corpus pipeline asks of a .flac
  * column — codec parameters, exact duration, stream MD5 — is here.
  *
  * Decode contract:
  *   - `fLaC` at offset 0 (no junk tolerance: the marker IS the spec)
  *   - STREAMINFO must be the first block (spec-mandated), 34 bytes
  *   - the block WALK continues past STREAMINFO by each block's own
  *     24-bit length until the last-block flag, a malformed header, or
  *     truncation — only fully-present blocks count
  *   - duration_ms = total_samples·1000 ÷ sample_rate, integer-exact
  *     (0 when the rate field is 0, which the spec allows for unknown)
  *
  * The gate fixture is built in pure SQL byte-packing arithmetic, so
  * the oracle replays construction AND the parsed stats in closed form.
  *
  * Scale: one narrow codegen'd expression per row; bytes never leave
  * the task, nothing shuffles.
  */
object FlacHeader {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be24(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 16) | (u8(b, i + 1) << 8) | u8(b, i + 2)

  final case class FlacMeta(minBlock: Int, maxBlock: Int, minFrame: Int,
      maxFrame: Int, sampleRate: Int, channels: Int, bitsPerSample: Int,
      totalSamples: Long, durationMs: Long, nBlocks: Int, md5Hex: String)

  def parse(b: Array[Byte]): Option[FlacMeta] = {
    if (b == null || b.length < 4 + 4 + 34) return None
    if (b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C') return None
    // first metadata block header: must be STREAMINFO (type 0), len 34
    val h0 = u8(b, 4)
    if ((h0 & 0x7f) != 0) return None
    if (be24(b, 5) != 34) return None
    val s = 8 // STREAMINFO payload offset
    val minBlock = be16(b, s)
    val maxBlock = be16(b, s + 2)
    val minFrame = be24(b, s + 4)
    val maxFrame = be24(b, s + 7)
    // 20-bit rate | 3-bit channels-1 | 5-bit bps-1 | 36-bit samples
    val rate = (u8(b, s + 10) << 12) | (u8(b, s + 11) << 4) | (u8(b, s + 12) >> 4)
    val channels = ((u8(b, s + 12) >> 1) & 7) + 1
    val bps = (((u8(b, s + 12) & 1) << 4) | (u8(b, s + 13) >> 4)) + 1
    val total = ((u8(b, s + 13) & 0xf).toLong << 32) |
      (u8(b, s + 14).toLong << 24) | (u8(b, s + 15).toLong << 16) |
      (u8(b, s + 16).toLong << 8) | u8(b, s + 17).toLong
    val md5 = b.slice(s + 18, s + 34).map(x => f"${x & 0xff}%02x").mkString
    // walk the remaining metadata blocks by their own lengths
    var nBlocks = 1
    var last = (h0 & 0x80) != 0
    var i = s + 34
    while (!last && i + 4 <= b.length) {
      val h = u8(b, i)
      if ((h & 0x7f) == 127) last = true // type 127 is invalid per spec
      else {
        val len = be24(b, i + 1)
        if (i + 4 + len > b.length) last = true // truncated: don't count
        else {
          nBlocks += 1
          last = (h & 0x80) != 0
          i += 4 + len
        }
      }
    }
    Some(FlacMeta(minBlock, maxBlock, minFrame, maxFrame, rate, channels,
      bps, total,
      durationMs = if (rate == 0) 0L else total * 1000L / rate,
      nBlocks, md5))
  }

  def parseRow(bytes: Array[Byte]): InternalRow = parse(bytes) match {
    case Some(m) => InternalRow(m.minBlock, m.maxBlock, m.minFrame,
      m.maxFrame, m.sampleRate, m.channels, m.bitsPerSample,
      m.totalSamples, m.durationMs, m.nBlocks,
      org.apache.spark.unsafe.types.UTF8String.fromString(m.md5Hex))
    case None => null
  }

  /** `flac_meta(binary)`: STREAMINFO + metadata-block walk, null when
    * the marker or the mandatory first block is malformed. */
  case class FlacMetaExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = FlacMetaExpr.schema
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"flac_meta requires binary input, got ${child.dataType.catalogString}")
    override def nullSafeEval(input: Any): Any =
      FlacHeader.parseRow(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |${ev.value} = graft.pipeline.FlacHeader.parseRow($c);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "flac_meta"
  }

  object FlacMetaExpr {
    val schema: StructType = StructType(Seq(
      StructField("min_block", IntegerType),
      StructField("max_block", IntegerType),
      StructField("min_frame", IntegerType),
      StructField("max_frame", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("channels", IntegerType),
      StructField("bits_per_sample", IntegerType),
      StructField("total_samples", LongType),
      StructField("duration_ms", LongType),
      StructField("n_blocks", IntegerType),
      StructField("md5_hex", StringType)))
  }
}
