package graft

import graft.pipeline.{GifAnim, GifCodec}
import graft.pipeline.GifAnim.EncFrame

/** Animated GIF89a: sub-rect compositing under all four disposal
  * methods, transparency, palette-awareness (rotation invariance),
  * per-frame interlacing, the GCE-less (GIF87a-style) path, the frame
  * walk expression, fail-closed malformation handling — and an
  * INDEPENDENT cross-check of the whole decode against the JDK's own
  * GIF reader compositing the same bytes. */
class GifAnimSpec extends SparkSpec {

  private def canvases(b: Array[Byte]): Array[Array[Int]] =
    GifAnim.decodeAnim(b).get.frames

  test("sub-rect compositing under disposal 1 (do not dispose)") {
    // 4×3 canvas; frame 0 paints 0..11, frame 1 paints a 3×2 rect of
    // 100 at (1,1): the displayed second canvas keeps column 0 / row 0
    val f0 = EncFrame(0, 0, 4, 3, Array.tabulate(12)(_.toByte), delayCs = 10)
    val f1 = EncFrame(1, 1, 3, 2, Array.fill(6)(100.toByte), delayCs = 20)
    val anim = GifAnim.decodeAnim(GifAnim.encode(4, 3, Seq(f0, f1))).get
    assert(anim.w === 4 && anim.h === 3 && anim.frames.length === 2)
    assert(anim.frames(0).toSeq === (0 until 12))
    assert(anim.frames(1).toSeq ===
      Seq(0, 1, 2, 3, 4, 100, 100, 100, 8, 100, 100, 100))
    assert(anim.metas(0).delayCs === 10 && anim.metas(1).delayCs === 20)
    assert(anim.metas(1).left === 1 && anim.metas(1).top === 1)
  }

  test("disposal 2 restores the frame's rect to the background color") {
    // background index 0 = gray 0 under the identity ramp: frame 0
    // (full, gray 50, disposal 2) is wiped before frame 1 paints its
    // 2×1 rect of 200
    val f0 = EncFrame(0, 0, 4, 2, Array.fill(8)(50.toByte), delayCs = 5,
      disposal = 2)
    val f1 = EncFrame(0, 0, 2, 1, Array.fill(2)(200.toByte), delayCs = 5)
    val fr = canvases(GifAnim.encode(4, 2, Seq(f0, f1)))
    assert(fr(0).toSeq === Seq.fill(8)(50))
    assert(fr(1).toSeq === Seq(200, 200, 0, 0, 0, 0, 0, 0))
  }

  test("disposal 3 restores the pre-frame canvas") {
    val f0 = EncFrame(0, 0, 3, 2, Array.fill(6)(10.toByte), delayCs = 5)
    val f1 = EncFrame(0, 0, 3, 2, Array.fill(6)(77.toByte), delayCs = 5,
      disposal = 3)
    val f2 = EncFrame(0, 0, 1, 1, Array(200.toByte), delayCs = 5)
    val fr = canvases(GifAnim.encode(3, 2, Seq(f0, f1, f2)))
    assert(fr(0).toSeq === Seq.fill(6)(10))
    assert(fr(1).toSeq === Seq.fill(6)(77))
    // frame 1's canvas was rolled back before frame 2 painted one pixel
    assert(fr(2).toSeq === Seq(200, 10, 10, 10, 10, 10))
  }

  test("transparent pixels leave the underlying canvas untouched") {
    val f0 = EncFrame(0, 0, 4, 1, Array[Byte](0, 9, 0, 9), delayCs = 5)
    // gray 5 declared transparent: positions holding 5 keep the old
    // canvas, the rest paint 30
    val f1 = EncFrame(0, 0, 4, 1, Array[Byte](5, 30, 30, 5), delayCs = 5,
      transparentGray = 5)
    val fr = canvases(GifAnim.encode(4, 1, Seq(f0, f1)))
    assert(fr(1).toSeq === Seq(0, 30, 30, 9))
  }

  test("palette rotation and per-frame interlacing are decode-invariant") {
    for (d <- Seq(3L, 44L, 131L)) {
      val base = GifAnim.generate(d, 1, 0)
      val anim = GifAnim.decodeAnim(base).get
      // re-encode the same frames with a rotated table and interlaced
      // rasters: bytes differ, decoded canvases are identical
      val frames = (0 until anim.frames.length).map { f =>
        val m = anim.metas(f)
        val gray = new Array[Byte](m.fw * m.fh)
        var i = 0
        while (i < gray.length) {
          val x = m.left + i % m.fw
          val y = m.top + i / m.fw
          gray(i) = GifAnim.genPixel(d, f, x, y).toByte
          i += 1
        }
        EncFrame(m.left, m.top, m.fw, m.fh, gray, m.delayCs)
      }
      for ((rot, inter) <- Seq((97, false), (0, true), (201, true))) {
        val re = GifAnim.encode(anim.w, anim.h, frames, paletteRot = rot,
          interlaced = inter)
        assert(!java.util.Arrays.equals(re, base), s"d=$d rot=$rot")
        val again = GifAnim.decodeAnim(re).get
        assert(again.frames.length === anim.frames.length)
        for (f <- anim.frames.indices)
          assert(again.frames(f).toSeq === anim.frames(f).toSeq,
            s"d=$d rot=$rot inter=$inter f=$f")
      }
    }
  }

  test("GCE-less single-frame stream (the GifCodec writer) decodes: delay 0, disposal 0") {
    for (seed <- Seq(0L, 9L, 77L)) {
      val bytes = GifCodec.gifBytes(seed)
      val anim = GifAnim.decodeAnim(bytes).get
      assert(anim.frames.length === 1)
      assert(anim.metas(0).delayCs === 0 && anim.metas(0).disposal === 0)
      // identity ramp: luminance == palette index == GifCodec's pixels
      val (w, h, px) = GifCodec.decodeIndices(bytes).get
      assert(anim.w === w && anim.h === h)
      assert(anim.frames(0).toSeq === px.map(_ & 0xFF).toSeq)
    }
  }

  test("JDK cross-check: composited canvases match ImageIO frame-by-frame compositing") {
    for (d <- Seq(2L, 58L, 419L)) {
      val bytes = GifAnim.generate(d, 1, 0)
      val ours = GifAnim.decodeAnim(bytes).get
      val rd = javax.imageio.ImageIO
        .getImageReadersByFormatName("gif").next()
      rd.setInput(javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes)))
      val n = rd.getNumImages(true)
      assert(n === ours.frames.length, s"d=$d")
      // independent compositing of the JDK's RAW frames (disposal 1,
      // no transparency in the generator) using the JDK's own metadata
      // for each frame's placement
      val canvas = Array.fill(ours.w * ours.h)(0)
      for (f <- 0 until n) {
        val img = rd.read(f)
        val md = rd.getImageMetadata(f)
          .getAsTree("javax_imageio_gif_image_1.0")
          .asInstanceOf[org.w3c.dom.Element]
        val desc = md.getElementsByTagName("ImageDescriptor").item(0)
          .asInstanceOf[org.w3c.dom.Element]
        val left = desc.getAttribute("imageLeftPosition").toInt
        val top = desc.getAttribute("imageTopPosition").toInt
        assert(left === ours.metas(f).left && top === ours.metas(f).top)
        for (yy <- 0 until img.getHeight; xx <- 0 until img.getWidth) {
          val rgb = img.getRGB(xx, yy)
          val lum = (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
            114 * (rgb & 0xFF)) / 1000
          canvas((top + yy) * ours.w + (left + xx)) = lum
        }
        assert(canvas.toSeq === ours.frames(f).toSeq, s"d=$d f=$f")
      }
      rd.dispose()
    }
  }

  test("frame walk rows carry the rect, delay, and composited sums") {
    val d = 23L
    val anim = GifAnim.decodeAnim(GifAnim.generate(d, 2, 0)).get
    val rows = GifAnim.framesRows(GifAnim.generate(d, 2, 0))
    assert(rows.numElements() === anim.frames.length)
    for (f <- anim.frames.indices) {
      val r = rows.getStruct(f, 7)
      assert(r.getInt(0) === f)
      assert(r.getInt(1) === anim.metas(f).delayCs)
      assert(r.getInt(2) === anim.metas(f).left)
      assert(r.getInt(3) === anim.metas(f).top)
      assert(r.getInt(4) === anim.metas(f).fw)
      assert(r.getInt(5) === anim.metas(f).fh)
      assert(r.getLong(6) === anim.frames(f).map(_.toLong).sum)
    }
  }

  test("fail-closed: truncation, out-of-canvas rects, bad signatures, junk") {
    val good = GifAnim.generate(5L, 1, 0)
    assert(GifAnim.decodeAnim(good).isDefined)
    for (cut <- Seq(1, good.length / 3, good.length - 1))
      assert(GifAnim.decodeAnim(good.take(cut)).isEmpty, s"cut=$cut")
    // frame rect extends past the logical screen
    val oob = GifAnim.encode(4, 3,
      Seq(EncFrame(2, 0, 3, 3, Array.fill(9)(1.toByte), delayCs = 5)))
    assert(GifAnim.decodeAnim(oob).isEmpty)
    assert(GifAnim.decodeAnim("NOTAGIF89a".getBytes ++ good.drop(10)).isEmpty)
    assert(GifAnim.decodeAnim(Array.fill[Byte](40)(7)).isEmpty)
    assert(GifAnim.decodeAnim(null).isEmpty)
  }

  test("fail-closed: GCE block size != 4 refuses (no rewind, no guess)") {
    val good = GifAnim.generate(5L, 1, 0)
    // locate the first GCE (0x21 0xF9 0x04) — generate always emits one
    val gce = good.indices.find(i => i + 2 < good.length &&
      (good(i) & 0xFF) == 0x21 && (good(i + 1) & 0xFF) == 0xF9 &&
      (good(i + 2) & 0xFF) == 0x04).get
    for (badSize <- Seq(0, 3, 5, 255)) {
      val mut = good.clone()
      mut(gce + 2) = badSize.toByte
      assert(GifAnim.decodeAnim(mut).isEmpty, s"GCE size=$badSize must refuse")
    }
    // sanity: restoring size 4 decodes again
    assert(GifAnim.decodeAnim(good).isDefined)
  }
}
