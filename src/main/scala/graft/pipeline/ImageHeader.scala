package graft.pipeline

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real (non-stubbed) image container header parsing — the first concrete
  * codec behind the [[Multimodal]] decode seam. Pure-JVM byte inspection
  * of the three dominant web-image containers:
  *
  *   - PNG: 8-byte signature, then the IHDR chunk fixes width/height as
  *     big-endian u32 at offsets 16/20 (PNG spec §11.2.2).
  *   - JPEG: marker walk from SOI (FFD8) to the first frame header
  *     SOF0–SOF15 (excluding DHT/JPG/DAC), which carries height then
  *     width as big-endian u16 (ITU T.81 §B.2.2).
  *   - GIF: 6-byte version signature, then width/height as
  *     little-endian u16 in the logical screen descriptor.
  *
  * Exposed as a custom Catalyst expression returning
  * `struct<format string, width int, height int>` (null for bytes that
  * are not a recognizable image), with `doGenCode` emitting a static
  * call so the parse stays inside whole-stage codegen — media scans
  * interleave it with the surrounding projection instead of breaking
  * the codegen span the way a UDF would.
  */
object ImageHeader {

  /** Parse result as a Catalyst row, or null if not a recognized image.
    * Called from generated code — keep the signature static-friendly. */
  def parseRow(bytes: Array[Byte]): InternalRow = parse(bytes) match {
    case Some((fmt, w, h)) =>
      InternalRow(UTF8String.fromString(fmt), w, h)
    case None => null
  }

  /** (format, width, height) of a PNG/JPEG/GIF byte stream. */
  def parse(b: Array[Byte]): Option[(String, Int, Int)] =
    if (b == null) None
    else png(b).orElse(jpeg(b)).orElse(gif(b))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  private def be32(b: Array[Byte], i: Int): Long =
    ((u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)) & 0xffffffffL

  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)

  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def png(b: Array[Byte]): Option[(String, Int, Int)] = {
    // signature + IHDR length/type + 8 bytes of dims
    if (b.length < 24 || !b.startsWith(PngSig)) return None
    // first chunk must be IHDR (spec §5.6); its type tag sits at 12..15
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    // spec caps dims at 2^31-1; 0 is invalid
    if (w < 1 || h < 1 || w > Int.MaxValue || h > Int.MaxValue) None
    else Some(("png", w.toInt, h.toInt))
  }

  private def jpeg(b: Array[Byte]): Option[(String, Int, Int)] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return None // desynced: not a marker where one is required
      var marker = u8(b, i + 1)
      // fill bytes: any number of FFs may precede a marker (T.81 §B.1.1.2)
      while (marker == 0xff && i + 2 < b.length) { i += 1; marker = u8(b, i + 1) }
      marker match {
        case 0xd8 | 0x01 => i += 2 // standalone, no length
        case m if m >= 0xd0 && m <= 0xd7 => i += 2 // RSTn, standalone
        case 0xd9 => return None // EOI before any frame header
        case m if m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc =>
          // SOFn segment: length u16, precision u8, height u16, width u16
          if (i + 9 > b.length) return None
          val h = be16(b, i + 5)
          val w = be16(b, i + 7)
          return if (w < 1 || h < 1) None else Some(("jpeg", w, h))
        case _ =>
          if (i + 3 >= b.length) return None
          val len = be16(b, i + 2)
          if (len < 2) return None
          i += 2 + len
      }
    }
    None
  }

  private def gif(b: Array[Byte]): Option[(String, Int, Int)] = {
    if (b.length < 10) return None
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val w = le16(b, 6)
    val h = le16(b, 8)
    if (w < 1 || h < 1) None else Some(("gif", w, h))
  }

  /** `image_meta(bytes)`: `struct<format string, width int, height int>`,
    * null when the bytes are not a recognized PNG/JPEG/GIF stream. */
  case class ImageMetaExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ImageMetaExpr.schema
    override def nullable: Boolean = true
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == BinaryType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"image_meta requires binary input, got ${child.dataType.catalogString}")
    override def nullSafeEval(input: Any): Any =
      ImageHeader.parseRow(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |${ev.value} = graft.pipeline.ImageHeader.parseRow($c);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "image_meta"
  }

  object ImageMetaExpr {
    val schema: StructType = StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)))
  }
}
