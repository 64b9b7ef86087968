package graft.pipeline

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** ANIMATED GIF89a — the VIDEO decode tier behind the [[Multimodal]]
  * seam: the one video format in the library whose SAMPLES (frame
  * pixels) are fully reconstructable from public specs alone, extending
  * the single-frame [[GifCodec]] (whose LZW halves this reuses) to the
  * complete GIF89a animation model:
  *
  *   - the block-level walk: any number of image descriptors, Graphic
  *     Control Extensions (delay in centiseconds, disposal method,
  *     transparency index), application/comment extensions (skipped by
  *     sub-block framing), GIF87a streams (no GCE → delay 0, disposal
  *     0);
  *   - per-frame SUB-RECTANGLE compositing at (left, top, fw, fh) onto
  *     the logical-screen canvas, honoring disposal 0/1 (leave), 2
  *     (restore the frame's rect to the background color) and 3
  *     (restore the canvas to its pre-frame state), with transparent
  *     pixels leaving the underlying canvas untouched;
  *   - palette-AWARE sample reconstruction: each index maps through its
  *     color table (local over global) to integer BT.601 luminance
  *     ⌊(299·R + 587·G + 114·B)/1000⌋ — so a palette-rotated re-encode
  *     (indices remapped, table permuted, bytes completely different)
  *     decodes to the identical gray canvas, which is what lets
  *     [[VideoFingerprint]] claim re-encode invariance;
  *   - per-frame interlace de-permutation (the §appendix-E 8/8/4/2
  *     order, reusing [[GifCodec.interlaceRows]]).
  *
  * Decode is fail-closed: malformed streams (bad signature, frame rect
  * outside the canvas, palette-less image, index past the table, LZW
  * defects, truncated reads) return None — never a task kill, never a
  * partial canvas.
  *
  * The generator half ([[generate]]) builds closed-form animations for
  * the p_mm34/p_d17-family gates: every frame pixel, rect, and delay is
  * a pure integer function of the seed, so the DuckDB oracle replays
  * construct → LZW encode → block walk → LZW decode → composite from
  * the seed alone. Timing is cell-aligned by construction (per-frame
  * delays are multiples of the q tick, summing to 33q) so the
  * temporal-scale twin class in [[VideoFingerprint]] is provably
  * hamming-0, the way the audio corpus pinned n = 33q
  * (reference behavior: the evm-indexer has no media tier; this extends
  * the training-data pipeline surface alongside text/image/audio).
  *
  * Scale: one codegen'd expression per row; frame bytes never leave the
  * task. [[foldFrames]] streams composited canvases to a visitor so the
  * fingerprint's working set is one canvas + one accumulator, not the
  * whole animation.
  */
object GifAnim {

  /** Descriptor of one rendered frame (canvas-composited). */
  final case class FrameMeta(left: Int, top: Int, fw: Int, fh: Int,
      delayCs: Int, disposal: Int)

  /** A fully-decoded animation: logical-screen dims, per-frame
    * DISPLAYED canvases (luminance 0..255, row-major w·h) and metas. */
  final case class Anim(w: Int, h: Int, frames: Array[Array[Int]],
      metas: Array[FrameMeta])

  /** One frame to encode: gray values (NOT indices — [[encode]] maps
    * them through the palette rotation) in row-major fw·fh order. */
  final case class EncFrame(left: Int, top: Int, fw: Int, fh: Int,
      gray: Array[Byte], delayCs: Int, disposal: Int = 1,
      transparentGray: Int = -1)

  // ==== encoder ===========================================================

  /** Complete GIF89a animation writer. `paletteRot` r permutes the
    * global table (entry j = gray (j − r) mod 256) and remaps every
    * index to (gray + r) mod 256 — byte-level completely different,
    * pixel-level identical: the re-encode twin construction. */
  def encode(w: Int, h: Int, frames: Seq[EncFrame], paletteRot: Int = 0,
      interlaced: Boolean = false, loopExt: Boolean = true): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(w); le16(h)
    out.write(0xF7) // GCT present, 8-bit resolution, 256 entries
    out.write(0)    // background color index
    out.write(0)    // aspect ratio
    val r = math.floorMod(paletteRot, 256)
    var j = 0
    while (j < 256) { // entry j renders gray (j - r) mod 256
      val g = math.floorMod(j - r, 256)
      out.write(g); out.write(g); out.write(g)
      j += 1
    }
    if (loopExt) { // NETSCAPE2.0 infinite loop — skipped by sub-block framing
      out.write(0x21); out.write(0xFF); out.write(11)
      out.write("NETSCAPE2.0".getBytes("US-ASCII"))
      out.write(3); out.write(1); le16(0); out.write(0)
    }
    for (f <- frames) {
      out.write(0x21); out.write(0xF9); out.write(4) // GCE
      val transFlag = if (f.transparentGray >= 0) 1 else 0
      out.write(((f.disposal & 7) << 2) | transFlag)
      le16(f.delayCs)
      out.write(if (transFlag == 1) (f.transparentGray + r) & 0xFF else 0)
      out.write(0) // GCE terminator
      out.write(0x2C) // image descriptor
      le16(f.left); le16(f.top); le16(f.fw); le16(f.fh)
      out.write(if (interlaced) 0x40 else 0) // no local table
      out.write(8) // LZW minimum code size
      val idx = new Array[Byte](f.gray.length)
      var i = 0
      while (i < idx.length) { idx(i) = ((f.gray(i) & 0xFF) + r).toByte; i += 1 }
      val stream =
        if (!interlaced) idx
        else { // stream row i carries actual row order(i)
          val order = GifCodec.interlaceRows(f.fh)
          val permuted = new Array[Byte](idx.length)
          var k = 0
          while (k < f.fh) {
            System.arraycopy(idx, order(k) * f.fw, permuted, k * f.fw, f.fw)
            k += 1
          }
          permuted
        }
      val lzw = GifCodec.lzwEncode(stream, minCodeSize = 8)
      var off = 0
      while (off < lzw.length) {
        val n = math.min(255, lzw.length - off)
        out.write(n)
        out.write(lzw, off, n)
        off += n
      }
      out.write(0) // block terminator
    }
    out.write(0x3B) // trailer
    out.toByteArray
  }

  // ==== decoder ===========================================================

  private def lum(rr: Int, gg: Int, bb: Int): Int =
    (299 * rr + 587 * gg + 114 * bb) / 1000

  /** Walk the animation, invoking `onFrame` with the live composited
    * canvas (luminance, row-major w·h — NOT retained by the walker, so
    * visitors must copy if they keep it) after each frame renders.
    * Returns Some((w, h, nFrames)) on a clean decode, None on any
    * malformation. */
  def foldFrames(bytes: Array[Byte])(
      onFrame: (Array[Int], FrameMeta) => Unit): Option[(Int, Int, Int)] = {
    if (bytes == null || bytes.length < 13) return None
    val sig = new String(bytes, 0, 6, "US-ASCII")
    if (sig != "GIF89a" && sig != "GIF87a") return None
    var p = 6
    def u8(): Int = { val v = bytes(p) & 0xFF; p += 1; v }
    def le16(): Int = { val v = (bytes(p) & 0xFF) | ((bytes(p + 1) & 0xFF) << 8); p += 2; v }
    def readTable(n: Int): Array[Int] = {
      val t = new Array[Int](n)
      var i = 0
      while (i < n) { t(i) = lum(u8(), u8(), u8()); i += 1 }
      t
    }
    try {
      val w = le16()
      val h = le16()
      if (w <= 0 || h <= 0 || w.toLong * h > 64000000L) return None
      val packed = u8()
      val bg = u8()
      u8() // aspect ratio
      val gct = if ((packed & 0x80) != 0) readTable(1 << ((packed & 7) + 1)) else null
      val bgLum = if (gct != null && bg < gct.length) gct(bg) else 0
      var canvas = Array.fill(w * h)(bgLum)
      var nFrames = 0
      // pending GCE state (applies to the next rendering block only)
      var delay = 0
      var disposal = 0
      var transIdx = -1
      var done = false
      while (!done && p < bytes.length) {
        u8() match {
          case 0x3B => done = true
          case 0x21 =>
            val label = u8()
            if (label == 0xF9) {
              // GIF89a mandates a GCE block size of exactly 4 (packed,
              // 2-byte delay, transparent index); anything else is a
              // malformed stream and the contract is fail-closed — refuse
              // rather than guess at the framing.
              val size = u8()
              if (size != 4) return None
              val gpacked = u8()
              delay = le16()
              val t = u8()
              disposal = (gpacked >> 2) & 7
              transIdx = if ((gpacked & 1) != 0) t else -1
              var n = u8()
              while (n != 0) { p += n; n = u8() }
            } else {
              var n = u8()
              while (n != 0) { p += n; n = u8() }
            }
          case 0x2C =>
            val left = le16()
            val top = le16()
            val fw = le16()
            val fh = le16()
            if (fw <= 0 || fh <= 0 || left + fw > w || top + fh > h) return None
            val ipacked = u8()
            val lct = if ((ipacked & 0x80) != 0) readTable(1 << ((ipacked & 7) + 1)) else null
            val interlaced = (ipacked & 0x40) != 0
            val palette = if (lct != null) lct else gct
            if (palette == null) return None
            val minCodeSize = u8()
            if (minCodeSize < 2 || minCodeSize > 8) return None
            val data = new java.io.ByteArrayOutputStream()
            var n = u8()
            while (n != 0) {
              if (p + n > bytes.length) return None
              data.write(bytes, p, n)
              p += n
              n = u8()
            }
            val raw = GifCodec.lzwDecode(data.toByteArray, minCodeSize, fw.toLong * fh)
            if (raw == null) return None
            val px =
              if (!interlaced) raw
              else { // stream row i is actual row order(i)
                val order = GifCodec.interlaceRows(fh)
                val o = new Array[Byte](raw.length)
                var i = 0
                while (i < fh) {
                  System.arraycopy(raw, i * fw, o, order(i) * fw, fw)
                  i += 1
                }
                o
              }
            val prev = if (disposal == 3) canvas.clone() else null
            var yy = 0
            while (yy < fh) {
              var xx = 0
              while (xx < fw) {
                val idx = px(yy * fw + xx) & 0xFF
                if (idx != transIdx) {
                  if (idx >= palette.length) return None
                  canvas((top + yy) * w + (left + xx)) = palette(idx)
                }
                xx += 1
              }
              yy += 1
            }
            onFrame(canvas, FrameMeta(left, top, fw, fh, delay, disposal))
            nFrames += 1
            disposal match {
              case 2 => // restore the frame's rect to background
                var ry = 0
                while (ry < fh) {
                  var rx = 0
                  while (rx < fw) {
                    canvas((top + ry) * w + (left + rx)) = bgLum
                    rx += 1
                  }
                  ry += 1
                }
              case 3 => canvas = prev
              case _ => ()
            }
            delay = 0; disposal = 0; transIdx = -1
          case _ => return None
        }
      }
      // strict termination: a stream that runs out of bytes without the
      // 0x3B trailer is truncated — refuse it even if frames decoded
      if (nFrames == 0 || !done) None else Some((w, h, nFrames))
    } catch { // truncated container: any read past the buffer is a refusal
      case _: IndexOutOfBoundsException | _: NegativeArraySizeException => None
    }
  }

  /** Materialized decode — every DISPLAYED composited canvas plus frame
    * metas. Gate/spec surface; the fingerprint hot path uses
    * [[foldFrames]] and never holds more than one canvas. */
  def decodeAnim(bytes: Array[Byte]): Option[Anim] = {
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
    val metas = scala.collection.mutable.ArrayBuffer.empty[FrameMeta]
    foldFrames(bytes) { (canvas, meta) =>
      frames += canvas.clone()
      metas += meta
    }.map { case (w, h, _) => Anim(w, h, frames.toArray, metas.toArray) }
  }

  // ==== closed-form generator (gate fixtures) =============================
  //
  // Per seed d (all arithmetic floorMod, replayed verbatim by the
  // oracle CTEs in PipelineQueries):
  //   w = d%12+6, h = (d·3)%10+5, F = d%4+3 frames, q = d%3+2 ticks
  //   frame f: m_f cells — last frame exactly 1, earlier frames split 32
  //     as ⌊32/(F−1)⌋ + (1 if f < 32 mod (F−1)) — so delays q·m_f·scale
  //     centiseconds always sum to 33·q·scale: every frame boundary
  //     lands exactly on a fingerprint cell boundary (the hamming-0
  //     temporal-scale proof needs this alignment)
  //   rect: frame 0 full; frame f>0 paints (f%3, f%2)..(w−1, h−1) with
  //     disposal 1 (do not dispose) — compositing is exercised, and the
  //     bottom-right corner is repainted by EVERY frame
  //   pixel (canvas coords): ((d·23 + f·31 + x·7 + y·19 + 5)² mod 8191)
  //     mod 256 — quadratic mix, same rationale as the audio corpus
  //     (a linear form makes comparison bits near-constant)
  //   bump ≠ 0: the LAST frame's bottom-right pixel becomes
  //     (pixel + bump) mod 256 — it lives in ONE spatial box (≤1
  //     comparison names box column 8) and, by the m-alignment, in ONE
  //     temporal cell (cell 32, named only by comparison t=31), so the
  //     twin is provably hamming ≤ 2: the sub-threshold near-dup class.

  private[graft] def genPixel(d: Long, f: Int, x: Int, y: Int): Int = {
    val v = math.floorMod(d, 8191) * 23 + f * 31 + x * 7 + y * 19 + 5
    math.floorMod(math.floorMod(v * v, 8191L), 256L).toInt
  }

  /** Deterministic closed-form animation for `d`; `delayScale` builds
    * the temporal-scale twin (every delay ×k), `bump` the localized
    * perturbation twin. */
  def generate(d: Long, delayScale: Long, bump: Long): Array[Byte] = {
    if (delayScale < 1 || delayScale > 256) return null
    val w = (math.floorMod(d, 12) + 6).toInt
    val h = (math.floorMod(d * 3, 10) + 5).toInt
    val nF = (math.floorMod(d, 4) + 3).toInt
    val q = (math.floorMod(d, 3) + 2).toInt
    val frames = (0 until nF).map { f =>
      val m =
        if (f == nF - 1) 1
        else 32 / (nF - 1) + (if (f < 32 % (nF - 1)) 1 else 0)
      val left = if (f == 0) 0 else f % 3
      val top = if (f == 0) 0 else f % 2
      val fw = w - left
      val fh = h - top
      val gray = new Array[Byte](fw * fh)
      var yy = 0
      while (yy < fh) {
        var xx = 0
        while (xx < fw) {
          var v = genPixel(d, f, left + xx, top + yy)
          if (bump != 0 && f == nF - 1 && left + xx == w - 1 && top + yy == h - 1)
            v = math.floorMod(v + bump, 256L).toInt
          gray(yy * fw + xx) = v.toByte
          xx += 1
        }
        yy += 1
      }
      EncFrame(left, top, fw, fh, gray, delayCs = (q * m * delayScale).toInt)
    }
    encode(w, h, frames)
  }

  /** Pixel-replication upscale ×k as a GIF-to-GIF transcode: every
    * DISPLAYED canvas is replicated k×k and re-encoded as a full-size
    * frame with its original delay — a pixel-timeline-preserving
    * transform whose samples CHANGE (the lossy-twin construction for
    * the video fingerprint: frame sums scale by exactly k², so the
    * TEMPORAL band is provably invariant, while spatial box bounds
    * shift by sub-pixel amounts — the measured-robustness regime
    * VideoRobustnessSpec pins). Sub-rects are normalized away (the
    * transcode re-frames each composited canvas), exactly as a real
    * transcoder would. Null on undecodable bytes, k outside 1..16, or
    * an output canvas past the decoder's own 64 MP refusal bound. */
  def upscale(bytes: Array[Byte], k: Long): Array[Byte] = {
    if (k < 1 || k > 16) return null
    val kk = k.toInt
    decodeAnim(bytes) match {
      case None => null
      case Some(anim) =>
        val (w, h) = (anim.w, anim.h)
        if (w.toLong * kk * h * kk > 64000000L) return null
        val frames = anim.frames.zip(anim.metas).map { case (cv, m) =>
          val gray = new Array[Byte](w * kk * h * kk)
          var y = 0
          while (y < h * kk) {
            var x = 0
            while (x < w * kk) {
              gray(y * w * kk + x) = cv((y / kk) * w + (x / kk)).toByte
              x += 1
            }
            y += 1
          }
          EncFrame(0, 0, w * kk, h * kk, gray, m.delayCs)
        }
        encode(w * kk, h * kk, frames.toSeq)
    }
  }

  // ==== expressions =======================================================

  /** `gif_anim_gen(seed, delay_scale, bump)`: the deterministic
    * closed-form animated GIF89a — fixture construction as a codegen'd
    * expression so gate queries build real multi-frame containers
    * in-plan. */
  case class GifAnimGenExpr(first: Expression, second: Expression,
      third: Expression) extends TernaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult = {
      val ok = Seq(first, second, third).forall(e =>
        e.dataType == LongType || e.dataType == IntegerType)
      if (ok) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        "gif_anim_gen requires (integral, integral, integral)")
    }
    private def asLong(v: Any): Long = v match {
      case l: java.lang.Long => l
      case i: java.lang.Integer => i.toLong
    }
    override def nullSafeEval(d: Any, s: Any, b: Any): Any =
      GifAnim.generate(asLong(d), asLong(s), asLong(b))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (d, s, b) => {
        s"""
           |${ev.value} = graft.pipeline.GifAnim.generate((long) $d, (long) $s, (long) $b);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(f: Expression, s: Expression,
        t: Expression): Expression = copy(f, s, t)
    override def prettyName: String = "gif_anim_gen"
  }

  /** Scan-time animation meta for the MediaSource `decode=gifanim`
    * seam: ONE [[foldFrames]] pass computes the container geometry, the
    * timeline total, the summed displayed-canvas luminance, AND the
    * [[VideoFingerprint]] — so a media crawl fingerprints clips the
    * moment it scans them, with no second decode. Null (whole struct)
    * on undecodable bytes. */
  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("total_delay_cs", LongType),
    StructField("sum_px", LongType),
    StructField("fingerprint", LongType)))

  def metaRow(bytes: Array[Byte]): InternalRow = {
    val coll = new VideoFingerprint.FrameCollector
    foldFrames(bytes)(coll.onFrame) match {
      case None => null
      case Some((w, h, n)) =>
        InternalRow(w, h, n, coll.delayTotalCs, coll.sumPx,
          coll.fingerprint(w, h))
    }
  }

  /** `gif_upscale(bytes, k)`: the pixel-replication ×k transcode — the
    * samples-change twin constructor for video-dedup gates. */
  case class GifUpscaleExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult = {
      val ok = left.dataType == BinaryType &&
        (right.dataType == LongType || right.dataType == IntegerType)
      if (ok) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        "gif_upscale requires (binary, integral)")
    }
    private def asLong(v: Any): Long = v match {
      case l: java.lang.Long => l
      case i: java.lang.Integer => i.toLong
    }
    override def nullSafeEval(b: Any, k: Any): Any =
      GifAnim.upscale(b.asInstanceOf[Array[Byte]], asLong(k))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (b, k) => {
        s"""
           |${ev.value} = graft.pipeline.GifAnim.upscale($b, (long) $k);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression,
        r: Expression): Expression = copy(l, r)
    override def prettyName: String = "gif_upscale"
  }

  /** Per-frame rows for `gif_frames`: the rendered-frame walk with each
    * DISPLAYED canvas folded to its pixel sum — the compositing
    * observable the mm34 oracle replays (sum over the arg-max painting
    * frame per pixel). */
  def framesRows(bytes: Array[Byte]): GenericArrayData = {
    val rows = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var idx = 0
    val ok = foldFrames(bytes) { (canvas, meta) =>
      var s = 0L
      var i = 0
      while (i < canvas.length) { s += canvas(i); i += 1 }
      rows += InternalRow(idx, meta.delayCs, meta.left, meta.top, meta.fw,
        meta.fh, s)
      idx += 1
    }
    if (ok.isEmpty) null else new GenericArrayData(rows.toArray[Any])
  }

  /** `gif_frames(binary)`: array of per-frame structs (index, GCE delay
    * in centiseconds, sub-rect descriptor, composited-canvas pixel sum)
    * from the animation walk, null on malformed bytes — downstream
    * explodes only this tiny struct array; pixels never leave their
    * row. */
  case class GifFramesExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = GifFramesExpr.schema
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"gif_frames requires binary input, got ${child.dataType.catalogString}")
    override def nullSafeEval(input: Any): Any =
      GifAnim.framesRows(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |${ev.value} = graft.pipeline.GifAnim.framesRows($c);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "gif_frames"
  }

  object GifFramesExpr {
    val schema: DataType = ArrayType(StructType(Seq(
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("delay_cs", IntegerType, nullable = false),
      StructField("f_left", IntegerType, nullable = false),
      StructField("f_top", IntegerType, nullable = false),
      StructField("f_w", IntegerType, nullable = false),
      StructField("f_h", IntegerType, nullable = false),
      StructField("sum_px", LongType, nullable = false))),
      containsNull = false)
  }
}
