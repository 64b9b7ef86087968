package graft

import graft.pipeline.{GifAnim, GifCodec, VideoFingerprint}
import graft.pipeline.GifAnim.EncFrame

/** video_fingerprint: the temporal+spatial comparison-bit definition
  * replayed INDEPENDENTLY from the generator's closed forms (pixel mix,
  * rects, cell-aligned delays — compositing, timeline, box sums and
  * comparisons all reimplemented here, no GifAnim/VideoFingerprint
  * internals), the perceptual invariances (re-encode via palette
  * rotation / interlacing, exact temporal scaling, delay-0 ticks), the
  * localized-edit hamming bound, unrelated-pair separation, and the
  * NULL discipline. */
class VideoFingerprintSpec extends SparkSpec {

  private def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  private def fp(b: Array[Byte]): Long =
    VideoFingerprint.fingerprint(b).longValue()

  /** Independent closed-form replay of the whole chain for
    * generate(d, scale, bump) — mirrors the DuckDB oracle's CTEs, not
    * the Scala implementation. */
  private def expected(d: Long, scale: Int, bump: Int): Long = {
    val w = (d % 12 + 6).toInt
    val h = (d * 3 % 10 + 5).toInt
    val nF = (d % 4 + 3).toInt
    val q = (d % 3 + 2).toInt
    def pix(f: Int, x: Int, y: Int): Long = {
      val v = d * 23 + f * 31 + x * 7 + y * 19 + 5
      val base = v * v % 8191 % 256
      if (bump != 0 && f == nF - 1 && x == w - 1 && y == h - 1)
        (base + bump) % 256
      else base
    }
    // composited canvas: latest frame g <= f painting (x, y) wins
    def comp(f: Int, x: Int, y: Int): Long = {
      var g = f
      while (g > 0 && !(x >= g % 3 && y >= g % 2)) g -= 1
      pix(g, x, y)
    }
    val m = Array.tabulate(nF)(f =>
      if (f == nF - 1) 1 else 32 / (nF - 1) + (if (f < 32 % (nF - 1)) 1 else 0))
    val delay = m.map(_.toLong * q * scale)
    val start = delay.scanLeft(0L)(_ + _)
    val dTot = start(nF)
    val fsum = Array.tabulate(nF)(f =>
      (for (y <- 0 until h; x <- 0 until w) yield comp(f, x, y)).sum)
    var hash = 0L
    val cell = Array.tabulate(33) { c =>
      val c0 = c * dTot / 33
      val c1 = math.max(c0 + 1, (c + 1) * dTot / 33)
      (0 until nF).map(f => math.max(0L,
        math.min(start(f) + delay(f), c1) - math.max(start(f), c0)) * fsum(f)).sum
    }
    for (c <- 0 until 32 if cell(c) < cell(c + 1)) hash |= 1L << c
    val a = Array.tabulate(h, w)((y, x) =>
      (0 until nF).map(f => delay(f) * comp(f, x, y)).sum)
    def bounds(i: Int, n: Int, parts: Int) = {
      val lo = i * n / parts
      (lo, math.max(lo + 1, (i + 1) * n / parts))
    }
    val s = Array.tabulate(4, 9) { (gy, gx) =>
      val (x0, x1) = bounds(gx, w, 9)
      val (y0, y1) = bounds(gy, h, 4)
      ((for (y <- y0 until y1; x <- x0 until x1) yield a(y)(x)).sum,
        (x1 - x0).toLong * (y1 - y0))
    }
    for (gy <- 0 until 4; gx <- 0 until 8) {
      val (s1, a1) = s(gy)(gx)
      val (s2, a2) = s(gy)(gx + 1)
      if (BigInt(s1) * a2 < BigInt(s2) * a1) hash |= 1L << (32 + gy * 8 + gx)
    }
    hash
  }

  test("definition: fingerprint(bytes) equals the independent closed-form replay") {
    for (d <- Seq(0L, 1L, 7L, 13L, 58L, 144L, 419L, 599L);
         (scale, bump) <- Seq((1, 0), (2, 0), (3, 0), (1, 96)))
      assert(fp(GifAnim.generate(d, scale, bump)) === expected(d, scale, bump),
        s"d=$d scale=$scale bump=$bump")
  }

  test("re-encode invariance: palette rotation and interlacing are hamming 0") {
    for (d <- Seq(4L, 71L, 240L)) {
      val base = GifAnim.generate(d, 1, 0)
      val anim = GifAnim.decodeAnim(base).get
      val frames = anim.metas.zipWithIndex.map { case (mt, f) =>
        EncFrame(mt.left, mt.top, mt.fw, mt.fh,
          Array.tabulate(mt.fw * mt.fh)(i =>
            GifAnim.genPixel(d, f, mt.left + i % mt.fw, mt.top + i / mt.fw).toByte),
          mt.delayCs)
      }.toSeq
      val re = GifAnim.encode(anim.w, anim.h, frames, paletteRot = 119,
        interlaced = true)
      assert(!java.util.Arrays.equals(re, base))
      assert(ham(fp(base), fp(re)) === 0, s"d=$d")
    }
  }

  test("temporal-scale invariance: every delay ×k is hamming 0 (cell-aligned)") {
    for (d <- Seq(2L, 33L, 197L, 598L); k <- Seq(2, 3, 4))
      assert(ham(fp(GifAnim.generate(d, 1, 0)), fp(GifAnim.generate(d, k, 0))) === 0,
        s"d=$d k=$k")
  }

  test("localized edit: the corner bump flips at most 2 bits (1 cell + 1 box)") {
    for (d <- 0L until 60L) {
      val dist = ham(fp(GifAnim.generate(d, 1, 0)), fp(GifAnim.generate(d, 1, 96)))
      assert(dist <= 2, s"d=$d dist=$dist")
    }
  }

  test("unrelated clips separate: no pair of distinct seeds within hamming 3") {
    val fps = (0L until 60L).map(d => fp(GifAnim.generate(d, 1, 0)))
    val close = for {
      i <- fps.indices
      j <- fps.indices if j > i && ham(fps(i), fps(j)) <= 3
    } yield (i, j, ham(fps(i), fps(j)))
    assert(close.isEmpty, s"colliding pairs: $close")
  }

  test("delay 0 counts as one tick") {
    val gray = Array.tabulate(12)(i => (i * 19 % 256).toByte)
    val g2 = Array.tabulate(12)(i => ((i * 7 + 3) % 256).toByte)
    def anim(d0: Int, d1: Int) = GifAnim.encode(4, 3, Seq(
      EncFrame(0, 0, 4, 3, gray, delayCs = d0),
      EncFrame(0, 0, 4, 3, g2, delayCs = d1)))
    assert(fp(anim(0, 0)) === fp(anim(1, 1)))
  }

  test("single-frame streams fingerprint with an all-zero temporal band") {
    for (seed <- Seq(3L, 91L)) {
      val h = VideoFingerprint.fingerprint(GifCodec.gifBytes(seed))
      assert(h != null)
      assert((h.longValue() & 0xFFFFFFFFL) === 0L, s"seed=$seed")
    }
  }

  test("null discipline: undecodable bytes never throw") {
    assert(VideoFingerprint.fingerprint(null) == null)
    assert(VideoFingerprint.fingerprint(Array.empty[Byte]) == null)
    assert(VideoFingerprint.fingerprint(Array.fill[Byte](64)(3)) == null)
    assert(VideoFingerprint.fingerprint(
      graft.pipeline.PngCodec.pngBytes(5L)) == null)
    val good = GifAnim.generate(9L, 1, 0)
    assert(VideoFingerprint.fingerprint(good.take(good.length / 2)) == null)
  }

  test("gate twins pair under the banded near-dup machinery") {
    import spark.implicits._
    val rows = (0L until 30L).flatMap { d =>
      Seq((d, GifAnim.generate(d, 1, 0))) ++
        (if (d % 7 == 0) Seq((d + 10000L, GifAnim.generate(d, 2 + (d % 2).toInt, 0))) else Nil) ++
        (if (d % 13 == 0) Seq((d + 20000L, GifAnim.generate(d, 1, 96))) else Nil)
    }
    val fpDf = rows.toDF("vid_id", "vid")
      .selectExpr("vid_id AS __id", "video_fingerprint(vid) AS __sim")
    val pairs = graft.pipeline.Dedup
      .simHashNearDupPairsFromFingerprints(fpDf, maxHamming = 3, bands = 4, bits = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every twin pairs with its base; scale twins at hamming 0 also
    // pair with their doc's bump twin when both exist (transitivity
    // through the base is resolved by d19's components, not here)
    for (d <- 0L until 30L) {
      if (d % 7 == 0) assert(pairs.contains((d, d + 10000L)), s"scale d=$d")
      if (d % 13 == 0) assert(pairs.contains((d, d + 20000L)), s"bump d=$d")
    }
  }
}
