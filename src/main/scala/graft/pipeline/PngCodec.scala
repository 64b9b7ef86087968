package graft.pipeline

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Real COMPRESSED image codec behind the [[Multimodal]] decode seam:
  * PNG (RFC 2083) — zlib/DEFLATE-compressed scanlines with per-row
  * prediction filters and CRC-32-framed chunks. Unlike the header-only
  * [[ImageHeader]] tier, this path decodes PIXELS: `image_pixels(bytes)`
  * inflates the IDAT stream, un-filters every scanline, and folds each
  * pixel's first-band sample into integer-exact statistics.
  *
  * The encode and decode paths are deliberately INDEPENDENT codec
  * implementations: [[pngBytes]] writes the container by hand
  * (`java.util.zip.Deflater` for the zlib stream, `CRC32` for chunk
  * frames), while [[decodePixels]] decodes through `javax.imageio` —
  * the JDK's own PNG codec, which knows nothing of the writer. A gate
  * query that constructs a known pixel pattern, round-trips it through
  * both, and compares statistics against an external oracle's
  * closed-form replay of the pattern therefore pins BOTH codecs, not a
  * shared helper. (Lossless compression is what makes the oracle exact;
  * the same construct→decode trick on JPEG would need a tolerance.)
  *
  * Scale: both are per-row expressions over the binary column — no
  * shuffle, no driver involvement; the bytes never leave the task.
  * Reference for the seam's role: denniswon/evm-indexer has no media
  * tier; this implements the training-data north star (multimodal
  * columns with real decode where pure-JVM codecs exist).
  */
object PngCodec {

  // javax.imageio's default file-backed stream cache would add a temp
  // file per decode; tiny in-memory payloads never want that.
  javax.imageio.ImageIO.setUseCache(false)

  /** Deterministic 8-bit GRAYSCALE test image: dimensions and pixels are
    * closed-form in `seed` (w = seed%16+4, h = seed·7%12+4, pixel(x,y) =
    * (seed·31 + x·7 + y·13) mod 256), so an external engine can compute
    * the expected statistics without decoding anything. */
  def pngBytes(seed: Long): Array[Byte] = {
    val w = (math.floorMod(seed, 16) + 4).toInt
    val h = (math.floorMod(seed * 7, 12) + 4).toInt
    // raw scanlines: filter byte 0 (None) + w gray samples per row
    val raw = new Array[Byte]((w + 1) * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raw(y * (w + 1) + 1 + x) =
          math.floorMod(seed * 31 + x * 7 + y * 13, 256).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val idat = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](512)
    while (!deflater.finished()) idat.write(buf, 0, deflater.deflate(buf))
    deflater.end()

    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A))
    def chunk(typ: String, body: Array[Byte]): Unit = {
      val bb = java.nio.ByteBuffer.allocate(12 + body.length)
      bb.putInt(body.length).put(typ.getBytes("US-ASCII")).put(body)
      val crc = new java.util.zip.CRC32()
      crc.update(bb.array(), 4, 4 + body.length)
      bb.putInt(crc.getValue.toInt)
      out.write(bb.array())
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte)  // bit depth
      .put(0.toByte)  // color type 0 = grayscale
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, filter 0, no interlace
    chunk("IHDR", ihdr.array())
    chunk("IDAT", idat.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Integer-exact pixel statistics over the decoded image's FIRST band
    * (the gray channel for grayscale, red for RGB). */
  final case class PixStats(width: Int, height: Int, nPx: Long,
    minPx: Long, maxPx: Long, sumPx: Long, sumSq: Long)

  /** Decode any ImageIO-supported compressed image (PNG/JPEG/GIF/BMP)
    * to pixels and fold band-0 samples into [[PixStats]]. None when the
    * bytes do not decode. */
  def decodePixels(bytes: Array[Byte]): Option[PixStats] = {
    if (bytes == null || bytes.length < 8) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException | _: RuntimeException => null }
    if (img == null) return None
    val raster = img.getRaster
    val w = img.getWidth
    val h = img.getHeight
    var mn = Long.MaxValue
    var mx = Long.MinValue
    var sum = 0L
    var sumSq = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = raster.getSample(x, y, 0).toLong
        if (v < mn) mn = v
        if (v > mx) mx = v
        sum += v
        sumSq += v * v
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    if (n == 0) { mn = 0L; mx = 0L }
    Some(PixStats(w, h, n, mn, mx, sum, sumSq))
  }

  /** [[decodePixels]] as a Catalyst row for [[ImagePixelsExpr]]. */
  def decodePixelsRow(bytes: Array[Byte]): InternalRow = decodePixels(bytes) match {
    case Some(s) => InternalRow(Int.box(s.width), Int.box(s.height),
      Long.box(s.nPx), Long.box(s.minPx), Long.box(s.maxPx),
      Long.box(s.sumPx), Long.box(s.sumSq))
    case None => null
  }

  /** `png_gen(seed)`: the deterministic grayscale PNG for `seed` —
    * fixture construction as a codegen'd expression so gate queries
    * build real compressed containers in-plan. */
  case class PngGenExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == LongType || child.dataType == IntegerType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"png_gen requires an integral seed, got ${child.dataType.catalogString}")
    override def nullSafeEval(input: Any): Any = input match {
      case l: java.lang.Long => PngCodec.pngBytes(l)
      case i: java.lang.Integer => PngCodec.pngBytes(i.toLong)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.pipeline.PngCodec.pngBytes((long) $c);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "png_gen"
  }

  /** `image_pixels(bytes)`: decoded pixel statistics, null when the
    * bytes are not a decodable compressed image. */
  case class ImagePixelsExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ImagePixelsExpr.schema
    override def nullable: Boolean = true
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == BinaryType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"image_pixels requires binary input, got ${child.dataType.catalogString}")
    override def nullSafeEval(input: Any): Any =
      PngCodec.decodePixelsRow(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |${ev.value} = graft.pipeline.PngCodec.decodePixelsRow($c);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "image_pixels"
  }

  object ImagePixelsExpr {
    val schema: StructType = StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_px", LongType),
      StructField("min_px", LongType),
      StructField("max_px", LongType),
      StructField("sum_px", LongType),
      StructField("sum_sq", LongType)))
  }
}
