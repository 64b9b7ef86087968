package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Vp9Ivf

/** VP9-in-IVF structural decode: container walk + uncompressed keyframe
  * header. The keyframe vector is HAND-ASSEMBLED bit-by-bit (derivation
  * in the comment), independent of `vp9_gen`. */
class Vp9IvfSpec extends SparkSpec {

  /** VP9 keyframe header bits (spec §6.2), 176×144 profile 0:
    *   marker 10, profile_low 0, profile_high 0, show_existing 0,
    *   frame_type 0 (KEY), show_frame 1, error_resilient 0
    *     → 1000 0010 = 0x82
    *   sync 0x49 0x83 0x42
    *   color_space 2 (010), color_range 1, width_minus_1 175
    *   (0000000010101111), height_minus_1 143 (0000000010001111),
    *   render_differs 0, pad
    *     → 0101|0000 = 0x50, 0x0A, 1111|0000 = 0xF0, 0x08,
    *       1111|0|000 = 0xF0 */
  private val handKeyframe =
    Array(0x82, 0x49, 0x83, 0x42, 0x50, 0x0a, 0xf0, 0x08, 0xf0).map(_.toByte)

  private def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int) =
    (0 until 4).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
  private def le64(v: Long) =
    (0 until 8).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray

  private val handIvf =
    "DKIF".getBytes ++ le16(0) ++ le16(32) ++ "VP90".getBytes ++
      le16(176) ++ le16(144) ++ le32(30) ++ le32(1) ++ le32(1) ++ le32(0) ++
      le32(handKeyframe.length) ++ le64(0L) ++ handKeyframe

  test("hand-assembled IVF + keyframe vector parses to the spec values") {
    val m = Vp9Ivf.parse(handIvf).get
    assert(m.fourcc === "VP90" && m.ivfWidth === 176 && m.ivfHeight === 144)
    assert(m.tbDen === 30L && m.tbNum === 1L)
    assert(m.hdrFrames === 1L && m.frames === 1L && m.keyFrames === 1L)
    val k = m.key.get
    assert(k.profile === 0 && k.bitDepth === 8)
    assert(k.colorSpace === 2 && k.colorRange === 1)
    assert(k.width === 176 && k.height === 144)
  }

  test("generate→parse roundtrip matches the closed forms for 200 seeds") {
    (0L until 200L).foreach { d =>
      val m = Vp9Ivf.parse(Vp9Ivf.generate(d)).get
      val n = (d % 7) + 1
      assert(m.frames === n && m.hdrFrames === n, s"seed $d")
      assert(m.keyFrames === 1L && m.interFrames === n - 1)
      val base = (d % 40) + 12
      assert(m.payloadBytes === n * base + n * (n - 1) / 2, s"seed $d")
      assert(m.lastPts === d * 7 + (n - 1) * 1000)
      val k = m.key.get
      assert(k.profile === ((d % 2) * 2).toInt)
      assert(k.bitDepth === (if (d % 2 == 0) 8 else if ((d % 4) / 2 == 1) 12 else 10))
      // the gate's provenance trick: bitstream dims differ from container
      assert(k.width === m.ivfWidth + 1 && k.height === m.ivfHeight + 2, s"seed $d")
    }
  }

  test("truncated final frame is not counted; wrong sync code fails the keyframe") {
    val full = Vp9Ivf.generate(9L)
    val cut = full.take(full.length - 3)
    val m = Vp9Ivf.parse(cut).get
    assert(m.frames === Vp9Ivf.parse(full).get.frames - 1)
    val broken = handIvf.clone()
    broken(45) = 0x00 // second sync byte (32 hdr + 12 frame hdr + offset 1)
    assert(Vp9Ivf.parse(broken).get.key.isEmpty)
  }

  test("fuzz: corrupted/truncated IVF never throws") {
    var x = 0xf00dL
    def next(): Long = { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; x }
    val base = Vp9Ivf.generate(42L)
    (0 until 300).foreach { trial =>
      val b = base.clone()
      (0 until 2).foreach { _ =>
        b(((next() % b.length + b.length) % b.length).toInt) = (next() & 0xff).toByte
      }
      val cut = if ((next() & 1) == 0) b.length
        else 1 + ((next() % b.length + b.length) % b.length).toInt
      withClue(s"trial $trial") { Vp9Ivf.parse(b.take(cut)) }
    }
  }

  test("vp9_frames walk: closed-form offsets, key flag, truncation drops the tail") {
    import graft.pipeline.Vp9Ivf
    for (seed <- 0L until 40L) {
      val b = Vp9Ivf.generate(seed)
      val rows = Vp9Ivf.framesRows(b)
      val nf = (seed % 7).toInt + 1
      val base = (seed % 40).toInt + 12
      assert(rows !== null)
      assert(rows.numElements === nf, s"seed $seed")
      (0 until nf).foreach { f =>
        val r = rows.getStruct(f, 5)
        assert(r.getInt(0) === f)
        assert(r.getLong(1) === 32L + 12 * f + f.toLong * base + f * (f - 1) / 2,
          s"seed $seed frame $f offset")
        assert(r.getLong(2) === base + f)
        assert(r.getLong(3) === seed * 7 + f * 1000L)
        assert(r.getInt(4) === (if (f == 0) 1 else 0))
      }
      // a truncated final frame drops out of the walk
      val cut = Vp9Ivf.framesRows(b.dropRight(1))
      if (nf > 1) assert(cut.numElements === nf - 1, s"seed $seed truncated")
    }
    assert(Vp9Ivf.framesRows(Array[Byte](1, 2, 3)) === null)
    assert(Vp9Ivf.framesRows(null) === null)
  }

  test("p_mm14 registry entry agrees with the closed forms") {
    val r = SparkEntry.queries("p_mm14_vp9_ivf")(spark, sf0001)
      .filter(col("doc_id") === 10L).collect().head
    // doc 10: n=4 frames, base=22: payload = 4·22+6 = 94; profile 0
    assert(r.getAs[Long]("frames") === 4L)
    assert(r.getAs[Long]("payload_bytes") === 94L)
    assert(r.getAs[Long]("profile") === 0L && r.getAs[Long]("bit_depth") === 8L)
    assert(r.getAs[Long]("width") === r.getAs[Long]("ivf_width") + 1)
  }
}
