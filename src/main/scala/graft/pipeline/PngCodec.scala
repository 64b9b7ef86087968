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
    val pix = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        pix(y * w + x) = math.floorMod(seed * 31 + x * 7 + y * 13, 256).toInt
        x += 1
      }
      y += 1
    }
    encodeGrayPng(pix, w, h)
  }

  /** General grayscale-8 PNG encoder: filter-None scanlines through
    * `java.util.zip.Deflater`, CRC-32-framed IHDR/IDAT/IEND. The
    * output half of [[resize]] and of [[pngBytes]]. */
  def encodeGrayPng(pix: Array[Int], w: Int, h: Int): Array[Byte] = {
    // raw scanlines: filter byte 0 (None) + w gray samples per row
    val raw = new Array[Byte]((w + 1) * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raw(y * (w + 1) + 1 + x) = (pix(y * w + x) & 0xff).toByte
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

  /** Decode any ImageIO-supported image to its band-0 grid. */
  private[pipeline] def decodeGrid(bytes: Array[Byte]): Option[(Array[Int], Int, Int)] = {
    if (bytes == null || bytes.length < 8) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException | _: RuntimeException => null }
    if (img == null) return None
    val raster = img.getRaster
    val w = img.getWidth
    val h = img.getHeight
    if (w <= 0 || h <= 0) return None
    val pix = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { pix(y * w + x) = raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    Some((pix, w, h))
  }

  /** IMAGE RESIZE — the thumbnailing operator of a training-data
    * pipeline: decode any ImageIO-supported image, resample its band-0
    * plane to `w2 × h2`, re-encode as a grayscale PNG. Two exact
    * integer resamplers (both oracle-replayable closed forms):
    *   - `nearest`: out(x,y) = src(⌊x·w/w2⌋, ⌊y·h/h2⌋)
    *   - `box`: the area-average thumbnail filter — source box
    *     [x0,x1)×[y0,y1) with x0 = ⌊x·w/w2⌋, x1 = max(x0+1, ⌊(x+1)·w/w2⌋)
    *     (so every output pixel reads ≥1 source pixel even when
    *     upscaling), value = ⌊Σ src / count⌋, exact integer division
    * Null on undecodable input, out-of-range target dims, or an
    * unknown mode. Runs entirely inside the task: bytes in, bytes out,
    * nothing shuffles. */
  def resize(bytes: Array[Byte], w2: Int, h2: Int, mode: String): Array[Byte] = {
    if (w2 < 1 || h2 < 1 || w2 > 8192 || h2 > 8192) return null
    val nearest = mode == "nearest"
    if (!nearest && mode != "box") return null
    decodeGrid(bytes) match {
      case None => null
      case Some((pix, w, h)) =>
        val out = new Array[Int](w2 * h2)
        var y = 0
        while (y < h2) {
          var x = 0
          while (x < w2) {
            out(y * w2 + x) =
              if (nearest)
                pix((y.toLong * h / h2).toInt * w + (x.toLong * w / w2).toInt)
              else {
                val x0 = (x.toLong * w / w2).toInt
                val x1 = math.max(x0 + 1, ((x + 1).toLong * w / w2).toInt)
                val y0 = (y.toLong * h / h2).toInt
                val y1 = math.max(y0 + 1, ((y + 1).toLong * h / h2).toInt)
                var s = 0L
                var sy = y0
                while (sy < y1) {
                  var sx = x0
                  while (sx < x1) { s += pix(sy * w + sx); sx += 1 }
                  sy += 1
                }
                (s / ((x1 - x0).toLong * (y1 - y0))).toInt
              }
            x += 1
          }
          y += 1
        }
        encodeGrayPng(out, w2, h2)
    }
  }

  /** [[decodePixels]] as a Catalyst row for [[ImagePixelsExpr]]. */
  def decodePixelsRow(bytes: Array[Byte]): InternalRow = decodePixels(bytes) match {
    case Some(s) => InternalRow(Int.box(s.width), Int.box(s.height),
      Long.box(s.nPx), Long.box(s.minPx), Long.box(s.maxPx),
      Long.box(s.sumPx), Long.box(s.sumSq))
    case None => null
  }

  /** Boxed entry point for [[resize]] used from both eval and codegen
    * (casts + null discipline in one place). */
  def resizeEval(bytes: Array[Byte], w2: Long, h2: Long,
      mode: org.apache.spark.unsafe.types.UTF8String): Array[Byte] =
    if (w2 > 8192 || h2 > 8192 || w2 < 1 || h2 < 1 || mode == null) null
    else resize(bytes, w2.toInt, h2.toInt, mode.toString)

  /** `image_resize(bytes, w, h, mode)`: resample to w×h by 'nearest'
    * or 'box' (area average) and re-encode as a grayscale PNG; NULL on
    * undecodable input or bad parameters. */
  case class ImageResizeExpr(first: Expression, second: Expression,
      third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = first.dataType == BinaryType &&
        Seq(second, third).forall(e =>
          e.dataType == LongType || e.dataType == IntegerType) &&
        fourth.dataType == StringType
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "image_resize requires (binary, integral, integral, string)")
    }
    private def asLong(v: Any): Long = v match {
      case l: java.lang.Long => l
      case i: java.lang.Integer => i.toLong
    }
    override def nullSafeEval(b: Any, w: Any, h: Any, m: Any): Any =
      PngCodec.resizeEval(b.asInstanceOf[Array[Byte]], asLong(w), asLong(h),
        m.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (b, w, h, m) => {
        s"""
           |${ev.value} = graft.pipeline.PngCodec.resizeEval($b, (long) $w, (long) $h, $m);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(f: Expression, s: Expression,
        t: Expression, q: Expression): Expression = copy(f, s, t, q)
    override def prettyName: String = "image_resize"
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
