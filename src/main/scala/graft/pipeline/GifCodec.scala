package graft.pipeline

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Second REAL compressed image codec behind the [[Multimodal]] decode
  * seam: GIF89a — variable-width LZW with clear/EOI codes, LSB-first bit
  * packing, 255-byte sub-block framing, and a palette-indexed raster.
  *
  * Mirror-image of the [[PngCodec]] independence argument, with the
  * hand-written half SWAPPED: PNG hand-writes the ENCODER and decodes
  * through `javax.imageio`; here [[decodePixels]] is a from-scratch LZW
  * DECODER (dictionary rebuild, the deferred-clear rule, the KwKwK
  * corner case where a code references the entry being defined, width
  * bumps at 512/1024/2048, max-table behavior) and [[gifBytes]] is a
  * from-scratch LZW ENCODER. MultimodalSpec cross-checks this decoder
  * pixel-for-pixel against the JDK's own GIF codec reading the same
  * bytes, and the p_mm10 gate pins construct→decode against the
  * pattern's closed form in an external engine — so encoder and decoder
  * cannot share a defect and survive.
  *
  * The palette is the identity gray ramp (entry i = (i,i,i)), so a
  * pixel's palette INDEX equals its gray value — the same band-0
  * convention `javax.imageio`'s indexed raster reports, which is what
  * makes the two decoders directly comparable.
  *
  * Scale: per-row codegen'd expressions over the binary column — no
  * shuffle, no driver involvement, bytes never leave the task.
  */
object GifCodec {

  /** Deterministic grayscale GIF89a: dims and pixels closed-form in
    * `seed` (w = seed%14+5, h = seed·5%11+5, pixel(x,y) = (seed·17 +
    * x·11 + y·29) mod 256) — distinct constants from [[PngCodec]] so
    * the two gates can never shadow each other. */
  def gifBytes(seed: Long): Array[Byte] = {
    val w = (math.floorMod(seed, 14) + 5).toInt
    val h = (math.floorMod(seed * 5, 11) + 5).toInt
    val px = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        px(y * w + x) = math.floorMod(seed * 17 + x * 11 + y * 29, 256).toByte
        x += 1
      }
      y += 1
    }
    gifBytesOf(w, h, px)
  }

  /** A complete grayscale GIF89a around an arbitrary index buffer —
    * split out so specs can wrap buffers large enough to cross every
    * LZW width bump and the 4096 table reset, and write INTERLACED
    * streams (rows permuted into the 8/8/4/2 pass order, flag set). */
  private[graft] def gifBytesOf(w: Int, h: Int, pxIn: Array[Byte],
      interlaced: Boolean = false): Array[Byte] = {
    val px =
      if (!interlaced) pxIn
      else { // stream row i carries actual row order(i)
        val order = interlaceRows(h)
        val permuted = new Array[Byte](pxIn.length)
        var i = 0
        while (i < h) {
          System.arraycopy(pxIn, order(i) * w, permuted, i * w, w)
          i += 1
        }
        permuted
      }
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    le16(w); le16(h)
    out.write(0xF7) // global color table, 8-bit resolution, 256 entries
    out.write(0)    // background color index
    out.write(0)    // aspect ratio
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    out.write(0x2C) // image descriptor
    le16(0); le16(0); le16(w); le16(h)
    out.write(if (interlaced) 0x40 else 0) // no local table
    out.write(8)    // LZW minimum code size
    val lzw = lzwEncode(px, minCodeSize = 8)
    var off = 0
    while (off < lzw.length) { // 255-byte sub-block framing
      val n = math.min(255, lzw.length - off)
      out.write(n)
      out.write(lzw, off, n)
      off += n
    }
    out.write(0)    // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** GIF-flavor LZW compress: codes start at minCodeSize+1 bits,
    * CLEAR = 2^min, EOI = CLEAR+1, dictionary entries from CLEAR+2,
    * width bumps when the NEXT code would not fit, table capped at 4096
    * (emit CLEAR, restart). LSB-first bit packing. */
  private[graft] def lzwEncode(data: Array[Byte], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    var width = minCodeSize + 1
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += width
      while (bitCnt >= 8) {
        out.write((bitBuf & 0xFF).toInt)
        bitBuf >>>= 8
        bitCnt -= 8
      }
    }
    // (prefixCode << 8 | byte) -> code; rebuilt on clear
    var dict = new java.util.HashMap[Integer, Integer]()
    var nextCode = eoi + 1
    emit(clear)
    var prefix = -1
    var i = 0
    while (i < data.length) {
      val b = data(i) & 0xFF
      if (prefix < 0) prefix = b
      else {
        val k = Integer.valueOf((prefix << 8) | b)
        val hit = dict.get(k)
        if (hit != null) prefix = hit.intValue
        else {
          emit(prefix)
          if (nextCode < 4096) {
            dict.put(k, Integer.valueOf(nextCode))
            // the DECODER adds its mirror entry on receiving this code,
            // so the width bump keys off the code about to be assigned
            if (nextCode == (1 << width) && width < 12) width += 1
            nextCode += 1
          } else { // table full: reset both sides
            emit(clear)
            dict = new java.util.HashMap[Integer, Integer]()
            nextCode = eoi + 1
            width = minCodeSize + 1
          }
          prefix = b
        }
      }
      i += 1
    }
    if (prefix >= 0) emit(prefix)
    emit(eoi)
    if (bitCnt > 0) out.write((bitBuf & 0xFF).toInt)
    out.toByteArray
  }

  /** The GIF89a §appendix-E interlace row order: pass 1 every 8th row
    * from 0, pass 2 every 8th from 4, pass 3 every 4th from 2, pass 4
    * every 2nd from 1. Returns stream position → actual row. */
  private[graft] def interlaceRows(h: Int): Array[Int] = {
    val order = new Array[Int](h)
    var i = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2)); r <- start until h by step) {
      order(i) = r
      i += 1
    }
    order
  }

  /** Hand-written GIF decode to the raw index buffer in ROW-MAJOR order
    * (interlaced streams are de-permuted). None on anything that is not
    * a well-formed GIF87a/89a. */
  private[graft] def decodeIndices(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes == null || bytes.length < 13) return None
    val sig = new String(bytes, 0, 6, "US-ASCII")
    if (sig != "GIF89a" && sig != "GIF87a") return None
    var p = 6
    def u8(): Int = { val v = bytes(p) & 0xFF; p += 1; v }
    def le16(): Int = { val v = (bytes(p) & 0xFF) | ((bytes(p + 1) & 0xFF) << 8); p += 2; v }
    try {
      le16(); le16() // logical screen dims (image descriptor rules)
      val packed = u8()
      u8(); u8() // background, aspect
      if ((packed & 0x80) != 0) p += 3 * (1 << ((packed & 7) + 1)) // GCT
      // walk blocks to the first image descriptor
      while (p < bytes.length && (bytes(p) & 0xFF) == 0x21) { // extension
        p += 2 // introducer + label
        var n = u8()
        while (n != 0) { p += n; n = u8() } // sub-blocks
      }
      if (p >= bytes.length || (bytes(p) & 0xFF) != 0x2C) return None
      p += 1
      le16(); le16() // left, top
      val w = le16()
      val h = le16()
      val ipacked = u8()
      val interlaced = (ipacked & 0x40) != 0
      if ((ipacked & 0x80) != 0) p += 3 * (1 << ((ipacked & 7) + 1)) // LCT
      val minCodeSize = u8()
      if (minCodeSize < 2 || minCodeSize > 8) return None
      // concatenate sub-blocks
      val data = new java.io.ByteArrayOutputStream()
      var n = u8()
      while (n != 0) {
        data.write(bytes, p, n)
        p += n
        n = u8()
      }
      val px = lzwDecode(data.toByteArray, minCodeSize, w.toLong * h)
      if (px == null) return None
      if (!interlaced) Some((w, h, px))
      else { // stream row i is actual row order(i)
        val order = interlaceRows(h)
        val out = new Array[Byte](px.length)
        var i = 0
        while (i < h) {
          System.arraycopy(px, i * w, out, order(i) * w, w)
          i += 1
        }
        Some((w, h, out))
      }
    } catch { // truncated container: any read past the buffer is a refusal
      case _: IndexOutOfBoundsException | _: NegativeArraySizeException => None
    }
  }

  /** [[decodeIndices]] folded to band-0 (= palette index = gray value)
    * statistics. */
  def decodePixels(bytes: Array[Byte]): Option[PngCodec.PixStats] =
    decodeIndices(bytes).map { case (w, h, px) =>
      var mn = Long.MaxValue
      var mx = Long.MinValue
      var sum = 0L
      var sumSq = 0L
      var i = 0
      while (i < px.length) {
        val v = (px(i) & 0xFF).toLong
        if (v < mn) mn = v
        if (v > mx) mx = v
        sum += v
        sumSq += v * v
        i += 1
      }
      if (px.length == 0) { mn = 0L; mx = 0L }
      PngCodec.PixStats(w, h, px.length.toLong, mn, mx, sum, sumSq)
    }

  /** GIF-flavor LZW decompress of exactly `expected` pixels: variable
    * width LSB-first codes, dictionary rebuilt from the stream (entry =
    * previous string + first byte of current — including the KwKwK case
    * where the code IS the entry being defined), clear resets, EOI or
    * pixel-count completion ends. Null on a malformed stream. */
  private[graft] def lzwDecode(data: Array[Byte], minCodeSize: Int,
      expected: Long): Array[Byte] = {
    if (expected < 0 || expected > Int.MaxValue) return null
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new Array[Byte](expected.toInt)
    var outN = 0
    // dictionary as prefix-linked entries: suffix byte + prefix code
    val suffix = new Array[Byte](4096)
    val prefixOf = new Array[Int](4096)
    var nextCode = eoi + 1
    var width = minCodeSize + 1
    var prev = -1
    var bitBuf = 0L
    var bitCnt = 0
    var p = 0
    val stack = new Array[Byte](4096)
    def expand(code: Int): Int = { // push string for `code`, return first byte
      var c = code
      var sp = 0
      while (c >= clear + 2) { stack(sp) = suffix(c); sp += 1; c = prefixOf(c) }
      val first = c
      if (outN + sp + 1 > out.length) return -1
      out(outN) = first.toByte
      outN += 1
      while (sp > 0) { sp -= 1; out(outN) = stack(sp); outN += 1 }
      first
    }
    while (outN < out.length) {
      while (bitCnt < width) {
        if (p >= data.length) return null // ran dry before the pixels did
        bitBuf |= (data(p) & 0xFFL) << bitCnt
        bitCnt += 8
        p += 1
      }
      val code = (bitBuf & ((1L << width) - 1)).toInt
      bitBuf >>>= width
      bitCnt -= width
      if (code == clear) {
        nextCode = eoi + 1
        width = minCodeSize + 1
        prev = -1
      } else if (code == eoi) {
        return if (outN == out.length) out else null
      } else if (prev < 0) {
        if (code >= clear) return null // first code must be a literal
        out(outN) = code.toByte
        outN += 1
        prev = code
      } else {
        var first = 0
        if (code < nextCode && (code < clear || code >= clear + 2)) {
          first = expand(code)
        } else if (code == nextCode) { // KwKwK: prev string + its first byte
          first = expand(prev)
          if (first < 0) return null
          if (outN >= out.length) return null
          out(outN) = first.toByte
          outN += 1
        } else return null // code beyond the table: corrupt
        if (first < 0) return null
        if (nextCode < 4096) {
          suffix(nextCode) = first.toByte
          prefixOf(nextCode) = prev
          nextCode += 1
          // width sync: the DECODER's table lags the encoder's by one
          // entry, so its bump is after-increment where the encoder's is
          // at-assignment — both flip between the same two codes
          if (nextCode == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    out
  }

  /** [[decodePixels]] as a Catalyst row for [[GifPixelsExpr]]. */
  def decodePixelsRow(bytes: Array[Byte]): InternalRow = decodePixels(bytes) match {
    case Some(s) => InternalRow(Int.box(s.width), Int.box(s.height),
      Long.box(s.nPx), Long.box(s.minPx), Long.box(s.maxPx),
      Long.box(s.sumPx), Long.box(s.sumSq))
    case None => null
  }

  /** `gif_gen(seed)`: the deterministic grayscale GIF89a for `seed`. */
  case class GifGenExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == LongType || child.dataType == IntegerType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gif_gen requires an integral seed, got ${child.dataType.catalogString}")
    override def nullSafeEval(input: Any): Any = input match {
      case l: java.lang.Long => GifCodec.gifBytes(l)
      case i: java.lang.Integer => GifCodec.gifBytes(i.toLong)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.pipeline.GifCodec.gifBytes((long) $c);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "gif_gen"
  }

  /** `gif_pixels(bytes)`: pixel statistics through the HAND-WRITTEN LZW
    * decoder, null when the bytes are not a decodable GIF. */
  case class GifPixelsExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = PngCodec.ImagePixelsExpr.schema
    override def nullable: Boolean = true
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == BinaryType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gif_pixels requires binary input, got ${child.dataType.catalogString}")
    override def nullSafeEval(input: Any): Any =
      GifCodec.decodePixelsRow(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |${ev.value} = graft.pipeline.GifCodec.decodePixelsRow($c);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "gif_pixels"
  }
}
