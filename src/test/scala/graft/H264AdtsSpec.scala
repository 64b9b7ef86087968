package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{AdtsHeader, H264Nal}

/** Structural decode of the transform-coded containers: H.264 Annex-B
  * NAL walk + exp-Golomb SPS parse, and AAC ADTS frame walk.
  *
  * The known-answer vectors here are HAND-ASSEMBLED bit literals (the
  * derivations are in the comments), independent of the `h264_gen`
  * construction path — so the parser is pinned against the public spec,
  * not against the repo's own encoder; the p_mm12/p_mm13 gates then pin
  * both halves against the DuckDB closed-form oracle.
  */
class H264AdtsSpec extends SparkSpec {

  // ---- H.264 -------------------------------------------------------------

  /** SPS RBSP assembled bit-by-bit from ISO 14496-10 §7.3.2.1.1:
    * profile 66 (0x42), constraints 0x00, level 30 (0x1E), then
    *   sps_id ue(0)=1, log2_max_frame_num_minus4 ue(0)=1,
    *   poc_type ue(2)=011, max_num_ref_frames ue(1)=010, gaps=0,
    *   pic_width_in_mbs_minus1 ue(4)=00101  (5 mbs → width 80),
    *   pic_height_in_map_units_minus1 ue(2)=011  (3 units → height 48),
    *   frame_mbs_only=1, direct_8x8=1, cropping=0, vui=0, stop=1, pad 00
    * = bits 11011010 00010101 111001(00) = DA 15 E4. */
  private val handSps = Array(0x42, 0x00, 0x1e, 0xda, 0x15, 0xe4).map(_.toByte)

  test("h264: hand-assembled SPS bit vector parses to the spec values") {
    val stream = Array[Byte](0, 0, 0, 1, 0x67) ++ handSps
    val m = H264Nal.parse(stream).get
    assert(m.nalTotal === 1 && m.spsCount === 1)
    val s = m.sps.get
    assert(s.profileIdc === 66 && s.levelIdc === 30 && s.spsId === 0)
    assert(s.log2MaxFrameNum === 4 && s.pocType === 2 && s.maxRefFrames === 1)
    assert(s.width === 80 && s.height === 48)
    assert(s.frameMbsOnly && s.cropRightPx === 0 && s.cropBottomPx === 0)
  }

  test("h264: emulation-prevention 00 00 03 de-escapes; planted run opens no NAL") {
    // on-wire IDR payload 00 00 03 01 → RBSP 00 00 01 (3 bytes), ONE NAL
    val stream = Array[Byte](0, 0, 1, 0x65, 0, 0, 3, 1)
    val m = H264Nal.parse(stream).get
    assert(m.nalTotal === 1 && m.idrCount === 1)
    assert(m.sliceRbspBytes === 3L)
  }

  test("h264: generate→parse roundtrip matches the closed forms for 200 seeds") {
    (0L until 200L).foreach { d =>
      val m = H264Nal.parse(H264Nal.generate(d)).get
      val n = (d % 6).toInt + 1
      assert(m.nalTotal === n + 2, s"seed $d")
      assert(m.spsCount === 1 && m.ppsCount === 1 && m.idrCount === 1)
      assert(m.sliceCount === n - 1)
      val base = (d % 17) + 8
      assert(m.sliceRbspBytes === n * base + n.toLong * (n - 1) / 2, s"seed $d")
      val s = m.sps.get
      assert(s.profileIdc === Array(66, 77, 100)((d % 3).toInt))
      val cr = if (d % 2 == 0) (d % 8).toInt else 0
      val cb = if (d % 2 == 0) (d % 4).toInt else 0
      assert(s.width === ((d % 120).toInt + 1) * 16 - 2 * cr, s"seed $d")
      assert(s.height === ((d % 68).toInt + 1) * 16 - 2 * cb, s"seed $d")
      assert(s.log2MaxFrameNum === 4 + (d % 13).toInt)
      assert(s.pocType === (if (d % 2 == 0) 0 else 2))
    }
  }

  test("h264: no start code → null; junk prefix is skipped") {
    assert(H264Nal.parse(Array[Byte](0x12, 0x34, 0x56, 0x78)).isEmpty)
    val withJunk = Array[Byte](0xaa.toByte, 0xaa.toByte) ++
      Array[Byte](0, 0, 1, 0x65, 7, 7, 7)
    assert(H264Nal.parse(withJunk).get.idrCount === 1)
  }

  // ---- ADTS --------------------------------------------------------------

  /** One hand-packed CRC-less frame (ISO 13818-7 §6.2): sync FFF, id=0
    * (MPEG-4), layer 00, protection_absent=1 → FF F1; profile LC (code 1)
    * and sfi 4 (44100 Hz) → 01 0100 0 0 = 0x50; channel config 2 →
    * 10 000000 = 0x80; frame length 20 (7 header + 13 payload):
    * 13 bits 0000000010100 split 2/8/3 → b3 low bits 00, b4 = 00000010,
    * b5 top 3 = 100; fullness 0x7FF → b5 = 100 11111 = 0x9F, b6 = 0xFC. */
  private val handAdts =
    Array(0xff, 0xf1, 0x50, 0x80, 0x02, 0x9f, 0xfc).map(_.toByte) ++
      Array.fill(13)(0xab.toByte)

  test("adts: hand-packed header parses to the spec values") {
    val m = AdtsHeader.parse(handAdts).get
    assert(m.mpegVersion === 4 && m.objectType === 2)
    assert(m.rate === 44100 && m.channels === 2 && !m.crc)
    assert(m.frames === 1L && m.totalBytes === 20L)
    // 1·1024·1000 / 44100 = 23 ms; 20·8·44100 / 1024 / 1000 = 6 kbps
    assert(m.durationMs === 23L && m.avgKbps === 6L)
  }

  test("adts: walk jumps by frame_length — planted FF F1 in payload not counted") {
    val planted = handAdts.clone()
    planted(7) = 0xff.toByte
    planted(8) = 0xf1.toByte
    val two = planted ++ handAdts
    val m = AdtsHeader.parse(two).get
    assert(m.frames === 2L && m.totalBytes === 40L)
  }

  test("adts: truncated final frame is not counted; junk prefix skipped") {
    val truncated = handAdts ++ handAdts.take(10) // second frame cut short
    assert(AdtsHeader.parse(truncated).get.frames === 1L)
    val withJunk = Array.fill(3)(0xaa.toByte) ++ handAdts
    assert(AdtsHeader.parse(withJunk).get.frames === 1L)
    assert(AdtsHeader.parse(Array.fill(16)(0x11.toByte)).isEmpty)
  }

  test("adts: CRC header variant is 9 bytes and surfaces crc_present") {
    // same frame re-packed with protection_absent=0: frameLen 22 = 9 + 13
    val crcFrame =
      Array(0xff, 0xf0, 0x50, 0x80, 0x02, 0xdf, 0xfc, 0x12, 0x34).map(_.toByte) ++
        Array.fill(13)(0xab.toByte)
    // frame length 22: 13 bits 0000000010110 → b4 = 00000010, b5 top = 110
    val m = AdtsHeader.parse(crcFrame).get
    assert(m.crc && m.frames === 1L && m.totalBytes === 22L)
  }

  test("adts_frames: per-frame rows tile the stream, junk offset included") {
    val withJunk = Array.fill(3)(0xaa.toByte) ++ handAdts ++ handAdts
    val rows = AdtsHeader.framesRows(withJunk)
    assert(rows.numElements === 2)
    val r0 = rows.getStruct(0, 5)
    val r1 = rows.getStruct(1, 5)
    assert(r0.getInt(0) === 0 && r0.getLong(1) === 3L && r0.getInt(2) === 20)
    assert(r0.getInt(3) === 0 && r0.getInt(4) === 13) // 20 - 7
    assert(r1.getInt(0) === 1 && r1.getLong(1) === 23L)
    // truncated tail frame drops out; garbage is null
    assert(AdtsHeader.framesRows(withJunk.dropRight(5)).numElements === 1)
    assert(AdtsHeader.framesRows(Array.fill(16)(0x11.toByte)) === null)
  }

  // ---- mp3 per-frame walk -------------------------------------------------

  test("mp3_frames: per-frame rows tile the stream back-to-back") {
    val rows = SparkEntry.queries("p_mm17_mp3_frame_explode")(spark, sf0001)
      .filter(col("doc_id") < 20L).collect()
      .groupBy(_.getAs[Long]("doc_id")).toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (d, fs) =>
      val sorted = fs.sortBy(_.getAs[Long]("frame_idx"))
      assert(sorted.head.getAs[Long]("offset") === d % 5, s"doc $d junk prefix")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("offset") ===
            a.getAs[Long]("offset") + a.getAs[Long]("frame_len"), s"doc $d")
        case _ => ()
      }
    }
  }

  // ---- corruption fuzz: hostile bytes must never throw -------------------

  /** Deterministic xorshift so the fuzz corpus is reproducible. */
  private def rng(seed: Long): () => Long = {
    var x = seed | 1
    () => { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; x }
  }

  test("fuzz: corrupted/truncated streams never throw across all three parsers") {
    val next = rng(0x5eed)
    val bases = Seq(
      H264Nal.generate(12L),
      handAdts ++ handAdts,
      Array[Byte](0, 0, 0, 1, 0x67) ++ handSps)
    for (base <- bases; trial <- 0 until 200) {
      val b = base.clone()
      // flip 1-3 bytes, then sometimes truncate
      (0 until 1 + (next() & 3).toInt.min(2)).foreach { _ =>
        val i = ((next() % b.length + b.length) % b.length).toInt
        b(i) = (next() & 0xff).toByte
      }
      val cut = if ((next() & 1) == 0) b.length
        else 1 + ((next() % b.length + b.length) % b.length).toInt
      val mutated = b.take(cut)
      // parse must return (possibly None) without throwing — trial index
      // in the clue so a failing corruption is reproducible
      withClue(s"trial $trial") {
        H264Nal.parse(mutated)
        AdtsHeader.parse(mutated)
        graft.pipeline.Mp3Header.parse(mutated)
      }
    }
    // pure-noise buffers too
    (0 until 100).foreach { _ =>
      val n = 1 + (next() & 1023).toInt
      val noise = Array.fill(n)((next() & 0xff).toByte)
      H264Nal.parse(noise); AdtsHeader.parse(noise)
      graft.pipeline.Mp3Header.parse(noise)
    }
  }

  // ---- registry entries drive the Catalyst expressions end-to-end --------

  test("p_mm12 / p_mm13 registry entries run and agree with the closed forms") {
    val h = SparkEntry.queries("p_mm12_h264_nals")(spark, sf0001)
      .filter(col("doc_id") === 7L).collect().head
    // doc 7: n=2 slices, base=15+8? (7%17=7 → base 15): rbsp = 2·15+1 = 31
    assert(h.getAs[Long]("nal_total") === 4L)
    assert(h.getAs[Long]("slice_rbsp_bytes") === 31L)
    assert(h.getAs[Long]("width") === (7 % 120 + 1) * 16L)
    val a = SparkEntry.queries("p_mm13_adts_frames")(spark, sf0001)
      .filter(col("doc_id") === 4L).collect().head
    // doc 4: nf=6, crc=1 (9-byte headers), basepay=14: total = 6·23+15 = 153
    assert(a.getAs[Long]("frames") === 6L)
    assert(a.getAs[Long]("crc_present") === 1L)
    assert(a.getAs[Long]("total_bytes") === 153L)
    assert(a.getAs[Long]("sample_rate") === 44100L)
  }
}
