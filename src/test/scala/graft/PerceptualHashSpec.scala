package graft

import graft.pipeline.{Dedup, PerceptualHash, PngCodec}

/** image_dhash / image_ahash: hash definitions on constructed images,
  * scale- and brightness-invariance (the perceptual claims), the
  * near-dup demonstration (resized twin found, unrelated image not),
  * and the NULL discipline. */
class PerceptualHashSpec extends SparkSpec {

  /** Grayscale PNG from an explicit pixel function. */
  private def png(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] =
    PngCodec.encodeGrayPng(
      Array.tabulate(w * h)(i => f(i % w, i / w) & 0xff), w, h)

  private def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  test("dHash definition: ramp is all-ones, constant is zero") {
    // strictly-increasing horizontal ramp: every left < right comparison
    // holds in every 9x8 cell, so all 64 bits set
    val ramp = png(18, 16)((x, _) => x * 14)
    assert(PerceptualHash.dHash(ramp).longValue() === -1L)
    // reversed ramp: no comparison holds
    val rev = png(18, 16)((x, _) => (17 - x) * 14)
    assert(PerceptualHash.dHash(rev).longValue() === 0L)
    // constant image: no gradient, no bits; aHash also zero (v > mean
    // is strict)
    val flat = png(18, 16)((_, _) => 77)
    assert(PerceptualHash.dHash(flat).longValue() === 0L)
    assert(PerceptualHash.aHash(flat).longValue() === 0L)
  }

  test("aHash definition: above-integer-mean bits on a two-level image") {
    // left half 0, right half 200 at 16x16: cells 0..3 of each 8x8 row
    // average 0, cells 4..7 average 200; mean = 100 -> right-half bits
    val two = png(16, 16)((x, _) => if (x < 8) 0 else 200)
    val expected = (0 until 8).map { y =>
      (4 until 8).map(x => 1L << (y * 8 + x)).sum
    }.sum
    assert(PerceptualHash.aHash(two).longValue() === expected)
  }

  test("perceptual invariances: rescale and brightness shift preserve dHash") {
    val base = png(18, 16)((x, y) => x * 9 + y * 4)
    val h0 = PerceptualHash.dHash(base).longValue()
    // box-resized twins at several scales hash within 0 hamming: the
    // gradient DIRECTION field is what the hash keeps
    for ((w2, h2) <- Seq((36, 32), (27, 24), (9, 8))) {
      val twin = PngCodec.resize(base, w2, h2, "box")
      assert(ham(h0, PerceptualHash.dHash(twin).longValue()) === 0,
        s"twin $w2 x $h2")
    }
    // +40 brightness (no wrap: max 17*9+15*4 = 213 + 40 = 253): every
    // comparison unchanged
    val bright = png(18, 16)((x, y) => x * 9 + y * 4 + 40)
    assert(PerceptualHash.dHash(bright).longValue() === h0)
  }

  test("near-dup demo: resized twin found by banded pairing, unrelated not") {
    import spark.implicits._
    val base = png(18, 16)((x, y) => x * 9 + y * 4)
    val twin = PngCodec.resize(base, 27, 24, "box")
    val unrelated = png(18, 16)((x, y) => (17 - x) * 9 + y * 4)
    val fp = Seq(
      (1L, PerceptualHash.dHash(base).longValue()),
      (2L, PerceptualHash.dHash(twin).longValue()),
      (3L, PerceptualHash.dHash(unrelated).longValue()))
      .toDF("__id", "__sim")
    val pairs = Dedup.simHashNearDupPairsFromFingerprints(
        fp, maxHamming = 3, bands = 4, bits = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)), s"got $pairs")
    // the unrelated image is far in hamming, not just unbucketed
    assert(ham(PerceptualHash.dHash(base).longValue(),
      PerceptualHash.dHash(unrelated).longValue()) > 30)
  }

  test("SQL surface matches the direct calls; NULL discipline holds") {
    import spark.implicits._
    val rows = spark.sql(
      """SELECT doc_id, image_dhash(png_gen(doc_id)) AS dh,
                image_ahash(png_gen(doc_id)) AS ah
         FROM range(0, 50) t(doc_id)""".stripMargin)
      .collect()
    for (r <- rows) {
      val d = r.getLong(0)
      val bytes = PngCodec.pngBytes(d)
      assert(r.getLong(1) === PerceptualHash.dHash(bytes).longValue(), s"d=$d")
      assert(r.getLong(2) === PerceptualHash.aHash(bytes).longValue(), s"d=$d")
    }
    // undecodable bytes are NULL from SQL, null from the direct call
    assert(PerceptualHash.dHash(null) === null)
    assert(PerceptualHash.dHash(Array[Byte](1, 2, 3)) === null)
    assert(PerceptualHash.aHash("not a png".getBytes) === null)
    val nulls = Seq(Array[Byte](9, 9, 9)).toDF("b")
      .selectExpr("image_dhash(b)", "image_ahash(b)").collect()(0)
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("cross-container identity: same pixels hash equal as PNG and GIF") {
    // the perceptual hash is a function of DECODED pixels, not the
    // container: one pixel buffer encoded through the hand-written
    // PNG encoder (Deflate) and through the hand-written GIF LZW
    // encoder must produce the same dHash and aHash after their two
    // INDEPENDENT decode paths (both via javax.imageio here)
    for (seed <- Seq(3L, 17L, 40L)) {
      val w = (seed % 14 + 5).toInt
      val h = (seed * 5 % 11 + 5).toInt
      val px = Array.tabulate(w * h)(i =>
        ((seed * 17 + (i % w) * 11 + (i / w) * 29) % 256).toInt)
      val asPng = PngCodec.encodeGrayPng(px, w, h)
      val asGif = graft.pipeline.GifCodec.gifBytesOf(w, h, px.map(_.toByte))
      assert(PerceptualHash.dHash(asPng).longValue() ===
        PerceptualHash.dHash(asGif).longValue(), s"dHash seed $seed")
      assert(PerceptualHash.aHash(asPng).longValue() ===
        PerceptualHash.aHash(asGif).longValue(), s"aHash seed $seed")
    }
  }

  test("banding arithmetic: the four 16-bit keys tile the hash exactly") {
    // incl. a hash with bit 63 set — arithmetic shift + mask must
    // extract band 3 logically (sign bits die under the mask)
    for (h <- Seq(0L, -1L, Long.MinValue, 0x8000FFFF0000AAAAL, 42L)) {
      val bands = (0 until 4).map(i => (h >> (16 * i)) & 0xFFFFL)
      val rebuilt = bands.zipWithIndex.map { case (b, i) => b << (16 * i) }
        .reduce(_ | _)
      assert(rebuilt === h, s"h=$h bands=$bands")
    }
  }
}
