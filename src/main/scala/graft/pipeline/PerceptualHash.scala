package graft.pipeline

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** IMAGE PERCEPTUAL HASHING — the dedup modality for image columns.
  * Byte-identity catches exact copies; these 64-bit fingerprints catch
  * re-encoded / resized twins, the dominant image-duplication mode in a
  * scraped training corpus (same photo at thumbnail and full size, PNG
  * vs re-save). Reference behavior source: the classic dHash/aHash
  * family (difference hash / average hash) as used by every large-scale
  * image-dedup pipeline; the arithmetic here is the integer-exact
  * variant so an external engine can replay it from pixel closed forms.
  *
  *   - `image_dhash(bytes)`: decode → BOX-resample to a 9×8 grayscale
  *     grid (the same floor-division area-average arithmetic as
  *     [[PngCodec.resize]]'s 'box' mode, so one oracle replays both) →
  *     bit (y·8+x) set iff grid(x,y) < grid(x+1,y). Gradient direction
  *     survives rescaling and constant brightness shifts, which is
  *     what makes the hash perceptual rather than cryptographic.
  *   - `image_ahash(bytes)`: decode → box to 8×8 → integer mean
  *     (floor of sum/64) → bit (y·8+x) set iff grid(x,y) > mean.
  *
  * NULL on undecodable bytes — never a task kill. Near-dup pairing
  * reuses the SimHash machinery unchanged ([[Dedup
  * .simHashNearDupPairsFromFingerprints]]): 4×16-bit banded blocking is
  * pigeonhole-exact for hamming ≤ 3, fingerprints persist through the
  * [[DedupIndex]] segmented-artifact lifecycle, and the pair join is
  * bucket-local — no all-pairs anywhere, so the path holds at 100 TB
  * exactly like the text SimHash path it shares.
  *
  * Scale: one codegen'd expression per row; bytes never leave the task;
  * the 9×8/8×8 grids are O(w·h) single-pass folds.
  */
object PerceptualHash {

  /** Integer box resample (area average with floor division) of a
    * grayscale grid — IDENTICAL arithmetic to [[PngCodec.resize]]'s
    * 'box' mode: source box [⌊x·w/w2⌋, max(+1, ⌊(x+1)·w/w2⌋)) per
    * output cell, sum / area in Long space. */
  private[pipeline] def boxGrid(pix: Array[Int], w: Int, h: Int,
      w2: Int, h2: Int): Array[Int] = {
    val out = new Array[Int](w2 * h2)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
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
        out(y * w2 + x) = (s / ((x1 - x0).toLong * (y1 - y0))).toInt
        x += 1
      }
      y += 1
    }
    out
  }

  /** 64-bit difference hash; null when the bytes don't decode. */
  def dHash(bytes: Array[Byte]): java.lang.Long =
    PngCodec.decodeGrid(bytes) match {
      case None => null
      case Some((pix, w, h)) =>
        val g = boxGrid(pix, w, h, 9, 8)
        var hash = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            if (g(y * 9 + x) < g(y * 9 + x + 1)) hash |= 1L << (y * 8 + x)
            x += 1
          }
          y += 1
        }
        java.lang.Long.valueOf(hash)
    }

  /** 64-bit average hash; null when the bytes don't decode. */
  def aHash(bytes: Array[Byte]): java.lang.Long =
    PngCodec.decodeGrid(bytes) match {
      case None => null
      case Some((pix, w, h)) =>
        val g = boxGrid(pix, w, h, 8, 8)
        var sum = 0L
        var i = 0
        while (i < 64) { sum += g(i); i += 1 }
        val mean = sum / 64
        var hash = 0L
        i = 0
        while (i < 64) {
          if (g(i) > mean) hash |= 1L << i
          i += 1
        }
        java.lang.Long.valueOf(hash)
    }

  abstract class HashExpr extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got ${child.dataType.catalogString}")
    protected def method: String
    override def nullSafeEval(input: Any): Any = {
      val h =
        if (method == "dHash") PerceptualHash.dHash(input.asInstanceOf[Array[Byte]])
        else PerceptualHash.aHash(input.asInstanceOf[Array[Byte]])
      if (h == null) null else h.longValue()
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val boxed = ctx.freshName("ph")
        s"""
           |java.lang.Long $boxed = graft.pipeline.PerceptualHash.$method($c);
           |if ($boxed == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $boxed.longValue(); }
         """.stripMargin
      })
  }

  /** `image_dhash(bytes)`: 64-bit difference hash, else NULL. */
  case class ImageDHashExpr(child: Expression) extends HashExpr {
    override protected def method: String = "dHash"
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "image_dhash"
  }

  /** `image_ahash(bytes)`: 64-bit average hash, else NULL. */
  case class ImageAHashExpr(child: Expression) extends HashExpr {
    override protected def method: String = "aHash"
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "image_ahash"
  }
}
