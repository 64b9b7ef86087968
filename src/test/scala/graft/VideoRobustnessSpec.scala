package graft

import graft.pipeline.{GifAnim, VideoFingerprint}
import graft.pipeline.GifAnim.EncFrame

/** video_fingerprint under transformations where SAMPLES CHANGE — the
  * video counterpart of AudioRobustnessSpec. Two regimes:
  *
  *   - PROVABLE: pixel-replication upscaling multiplies every frame sum
  *     by exactly k², so the temporal band (bits 0..31) is invariant for
  *     every clip; and a frame SPLIT re-encode (one frame re-emitted as
  *     two sub-delays summing to the original) leaves the displayed
  *     pixel timeline identical, so the whole fingerprint is hamming 0.
  *
  *   - MEASURED: the spatial band under upscaling — box bounds
  *     ⌊gx·kw/9⌋ land sub-pixel off k·⌊gx·w/9⌋, so box sums deviate
  *     from exact k²-scaling by partial boundary rows/columns. Over
  *     the d20 family (×3 base vs ×6 twin, canvases 18..51 px wide)
  *     the measured envelope is: max hamming 6, ≥ 85% of clips within
  *     the ≤ 3 pairing threshold. The envelope is pinned here — NOT
  *     hidden — and the d20 gate's oracle brute-force replays exactly
  *     which twins fall in/out, so the banded pairing can never
  *     silently disagree. */
class VideoRobustnessSpec extends SparkSpec {

  private def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)

  private def fp(b: Array[Byte]): Long =
    VideoFingerprint.fingerprint(b).longValue()

  test("upscale: temporal band exactly invariant for every clip (k² frame-sum proof)") {
    for (d <- 0L until 200L) {
      val base = GifAnim.generate(d, 1, 0)
      val f1 = fp(base)
      for (k <- Seq(2L, 3L)) {
        val fu = fp(GifAnim.upscale(base, k))
        assert(((f1 ^ fu) & 0xFFFFFFFFL) === 0L, s"d=$d k=$k")
      }
    }
  }

  test("upscale composes: x6 equals x2 of x3 pixel-for-pixel") {
    for (d <- Seq(1L, 86L, 333L)) {
      val base = GifAnim.generate(d, 1, 0)
      val via = GifAnim.decodeAnim(GifAnim.upscale(GifAnim.upscale(base, 3), 2)).get
      val direct = GifAnim.decodeAnim(GifAnim.upscale(base, 6)).get
      assert(via.w === direct.w && via.h === direct.h)
      for (f <- via.frames.indices)
        assert(via.frames(f).toSeq === direct.frames(f).toSeq, s"d=$d f=$f")
    }
  }

  test("measured envelope: x3-vs-x6 spatial hamming <= 6, >= 85% within the pairing threshold") {
    val dist = (0L until 400L).map { d =>
      val base = GifAnim.generate(d, 1, 0)
      ham(fp(GifAnim.upscale(base, 3)), fp(GifAnim.upscale(base, 6)))
    }
    assert(dist.max <= 6, s"max=${dist.max}")
    val within = dist.count(_ <= 3)
    assert(within >= 340, s"within-threshold $within/400")
    // and the transform is not a no-op: a sizable fraction DOES move bits
    assert(dist.count(_ > 0) >= 200, s"moved=${dist.count(_ > 0)}")
  }

  test("frame split re-encode is hamming 0 (identical displayed timeline)") {
    for (d <- Seq(5L, 48L, 371L)) {
      val base = GifAnim.generate(d, 1, 0)
      val anim = GifAnim.decodeAnim(base).get
      // re-encode from the composited canvases with the FIRST frame
      // emitted twice, its delay split 1 + (delay-1); every frame
      // becomes a full-canvas paint, so pixels are timeline-identical
      val full = anim.frames.zip(anim.metas).map { case (cv, m) =>
        EncFrame(0, 0, anim.w, anim.h, cv.map(_.toByte), m.delayCs)
      }
      val split = Seq(full.head.copy(delayCs = 1),
          full.head.copy(delayCs = full.head.delayCs - 1)) ++ full.tail
      val re = GifAnim.encode(anim.w, anim.h, split)
      assert(ham(fp(base), fp(re)) === 0, s"d=$d")
    }
  }

  test("upscale null discipline: bad factor, undecodable bytes, size refusal") {
    val good = GifAnim.generate(3L, 1, 0)
    assert(GifAnim.upscale(good, 0) == null)
    assert(GifAnim.upscale(good, 17) == null)
    assert(GifAnim.upscale(null, 2) == null)
    assert(GifAnim.upscale(Array.fill[Byte](32)(9), 2) == null)
    // 16x of a 16x is already past the 64 MP decode bound long before
    // a second hop; a single hop stays within it for the tiny fixtures
    assert(GifAnim.upscale(good, 16) != null)
  }
}
