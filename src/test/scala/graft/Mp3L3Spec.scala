package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Mp3L3

/** Layer III entropy decode: table integrity (every embedded ISO Huffman
  * table must be a complete prefix code), a hand-assembled bit-literal
  * decode vector independent of the encoder half, gen→decode identity,
  * and malformed-stream rejection. */
class Mp3L3Spec extends SparkSpec {
  import spark.implicits._

  test("every embedded Huffman table is a complete prefix code (Kraft sum = 1)") {
    def check(name: String, hlen: Array[Int], hcod: Array[Int]): Unit = {
      val entries = hlen.zip(hcod).filter(_._1 > 0)
      // completeness: Σ 2^-len == 1 exactly (scaled to the max length)
      val maxLen = entries.map(_._1).max
      val kraft = entries.map { case (l, _) => 1L << (maxLen - l) }.sum
      assert(kraft === (1L << maxLen), s"$name is not a complete code")
      // prefix-freeness: no code is a prefix of another
      val codes = entries.map { case (l, c) =>
        (0 until l).map(i => (c >> (l - 1 - i)) & 1).mkString
      }
      assert(codes.distinct.length === codes.length, s"$name has duplicate codes")
      for (a <- codes; b <- codes if a != b)
        assert(!b.startsWith(a), s"$name: $a is a prefix of $b")
    }
    for ((id, t) <- Mp3L3.BvTables if id != 0)
      check(s"big-value table $id", t.hlen, t.hcod)
    check("count1 table A", Mp3L3.Cnt1ALen, Mp3L3.Cnt1ACod)
    check("count1 table B", Mp3L3.Cnt1BLenArr, Mp3L3.Cnt1BCodArr)
  }

  test("hand-assembled bit vector decodes to the expected spectral lines") {
    // built with a LOCAL bit packer — independent of Mp3L3's encoder half
    val bits = scala.collection.mutable.ArrayBuffer.empty[Int]
    def u(v: Int, n: Int): Unit = (n - 1 to 0 by -1).foreach(i => bits += ((v >> i) & 1))
    // header: FF FB A0 C0 (MPEG-1 L3 no-CRC, 160 kbps, 44.1 kHz, mono)
    u(0xff, 8); u(0xfb, 8); u(0xa0, 8); u(0xc0, 8)
    // side info: main_data_begin 0, private 0, scfsi 0000
    u(0, 9); u(0, 5); u(0, 4)
    // granule 0: p23=14, bv=2, gg=100, sc=0, long blocks, tables (1,1,1),
    // r0=3, r1=3, pre=0, sfs=0, count1 table B
    u(14, 12); u(2, 9); u(100, 8); u(0, 4); u(0, 1)
    u(1, 5); u(1, 5); u(1, 5); u(3, 4); u(3, 3); u(0, 1); u(0, 1); u(1, 1)
    // granule 1: fully empty (p23=0, table 0 everywhere)
    u(0, 12); u(0, 9); u(0, 8); u(0, 4); u(0, 1)
    u(0, 5); u(0, 5); u(0, 5); u(0, 4); u(0, 3); u(0, 1); u(0, 1); u(0, 1)
    assert(bits.length === (4 + 17) * 8)
    // main data, granule 0 (no scalefactor bits at sc=0):
    //   pair (1,-1): table 1 idx 3 → '000', signs 0 (pos) and 1 (neg)
    //   pair (0,1):  table 1 idx 1 → '001', sign 0
    //   quad (0,0,-1,0): table B idx 2 → code ~2 = 13 '1101', sign 1
    u(0, 3); u(0, 1); u(1, 1)
    u(1, 3); u(0, 1)
    u(13, 4); u(1, 1)
    while (bits.length % 8 != 0) bits += 0
    val frameLen = 144 * 160000 / 44100
    val b = new Array[Byte](frameLen)
    bits.grouped(8).zipWithIndex.foreach { case (g, i) =>
      b(i) = g.foldLeft(0)((a, x) => (a << 1) | x).toByte
    }
    val d = Mp3L3.decode(b).get
    val g0 = d.granules(0)
    assert(d.sampleRate === 44100 && d.bitrateKbps === 160)
    assert(g0.part23Length === 14 && g0.bitsUsed === 14)
    assert(g0.is.take(8).toSeq === Seq(1, -1, 0, 1, 0, 0, -1, 0))
    assert(g0.is.drop(8).forall(_ == 0))
    assert(g0.count1Quads === 1)
    val g1 = d.granules(1)
    assert(g1.bitsUsed === 0 && g1.is.forall(_ == 0))
  }

  test("gen → decode identity: every surfaced functional matches the closed form") {
    for (seed <- Seq(0L, 1L, 7L, 42L, 123L, 999L)) {
      val d = Mp3L3.decode(Mp3L3.gen(seed)).getOrElse(fail(s"seed $seed: no decode"))
      for (g <- 0 to 1) {
        val p = Mp3L3.GranParams(seed, g)
        val gr = d.granules(g)
        assert(gr.bigValues === p.bigValues, s"seed $seed g$g big_values")
        assert(gr.globalGain === p.globalGain)
        assert(gr.scalefacCompress === p.scalefacCompress)
        assert(gr.tableSelect.toSeq === Seq(0, 1, 2).map(p.tableSelect))
        assert(gr.count1Table === p.count1Table)
        assert(gr.count1Quads === p.nQuads)
        assert(gr.bitsUsed === gr.part23Length, "decode must close the bit count")
        assert(gr.scalefacs.toSeq === (0 until 21).map(p.scalefac))
        // spectral lines, coefficient by coefficient
        val expected = new Array[Int](576)
        for (i <- 0 until p.bigValues) {
          val (x, y) = p.pair(i)
          expected(2 * i) = x; expected(2 * i + 1) = y
        }
        for (j <- 0 until p.nQuads) {
          val (v, w, x, y) = p.quad(j)
          val base = 2 * p.bigValues + 4 * j
          expected(base) = v; expected(base + 1) = w
          expected(base + 2) = x; expected(base + 3) = y
        }
        assert(gr.is.toSeq === expected.toSeq, s"seed $seed g$g spectral lines")
      }
    }
  }

  test("escape edition: genEsc → decode identity across all Table B.7 selects") {
    val seenSelects = scala.collection.mutable.Set.empty[Int]
    var sawEscape = false
    val seenLinbits = scala.collection.mutable.Set.empty[Int]
    for (seed <- 0L until 60L) {
      val d = Mp3L3.decode(Mp3L3.genEsc(seed)).getOrElse(fail(s"seed $seed: no decode"))
      for (g <- 0 to 1) {
        val p = Mp3L3.GranEscParams(seed, g)
        val gr = d.granules(g)
        assert(gr.tableSelect.toSeq === Seq(0, 1, 2).map(p.tableSelect))
        assert(gr.bitsUsed === gr.part23Length,
          s"seed $seed g$g: decode must close the bit count")
        val expected = new Array[Int](576)
        for (i <- 0 until p.bigValues) {
          val (x, y) = p.pair(i)
          expected(2 * i) = x; expected(2 * i + 1) = y
          if (math.abs(x) > 15 || math.abs(y) > 15) {
            sawEscape = true
            seenLinbits += Mp3L3.BvTables(p.tableForLine(2 * i)).linbits
          }
        }
        for (j <- 0 until p.nQuads) {
          val (v, w, x, y) = p.quad(j)
          val base = 2 * p.bigValues + 4 * j
          expected(base) = v; expected(base + 1) = w
          expected(base + 2) = x; expected(base + 3) = y
        }
        assert(gr.is.toSeq === expected.toSeq, s"seed $seed g$g spectral lines")
        seenSelects ++= gr.tableSelect
      }
    }
    assert(sawEscape, "the fixture sweep must exercise linbits escapes (|v| > 15)")
    assert(seenLinbits.size >= 5,
      s"multiple linbits widths must be exercised, saw $seenLinbits")
    assert((16 to 23).exists(seenSelects) && (24 to 31).exists(seenSelects),
      s"both escape table families must be selected, saw $seenSelects")
    assert(Seq(5, 6, 7, 8, 9, 10, 11, 12, 13, 15).count(seenSelects) >= 8,
      s"the non-escape tables 5-15 must be selected, saw $seenSelects")
  }

  test("window-switching edition: genShort → decode identity over block types 1/2/3") {
    val seenBt = scala.collection.mutable.Set.empty[Int]
    for (seed <- 0L until 24L) {
      val d = Mp3L3.decode(Mp3L3.genShort(seed))
        .getOrElse(fail(s"seed $seed: no decode"))
      for (g <- 0 to 1) {
        val p = Mp3L3.GranShortParams(seed, g)
        val gr = d.granules(g)
        seenBt += gr.blockType
        assert(gr.blockType === p.blockType, s"seed $seed g$g block_type")
        assert(gr.bigValues === p.bigValues)
        assert(gr.globalGain === p.globalGain)
        assert(gr.tableSelect.toSeq === Seq(p.tableSelect(0), p.tableSelect(1), -1),
          "switched side info carries two selects, region2 absent")
        assert(gr.region0Count === -1 && gr.region1Count === -1,
          "region counts are not transmitted under window switching")
        assert(gr.subblockGain.toSeq === (0 until 3).map(p.subblockGain),
          s"seed $seed g$g subblock gains")
        assert(gr.bitsUsed === gr.part23Length,
          s"seed $seed g$g: decode must close the bit count")
        if (gr.blockType == 2) {
          assert(gr.scalefacsShort !== null)
          val exp = for (b <- 0 until 12; w <- 0 until 3) yield p.scalefacShort(b, w)
          assert(gr.scalefacsShort.toSeq === exp, s"seed $seed g$g short scalefacs")
          assert(gr.scalefacs.forall(_ == 0))
        } else {
          assert(gr.scalefacsShort === null)
          assert(gr.scalefacs.toSeq === (0 until 21).map(p.scalefac))
        }
        // spectral lines across the fixed boundary 36: region0 table
        // below, region1 table above
        val expected = new Array[Int](576)
        for (i <- 0 until p.bigValues) {
          val (x, y) = p.pair(i)
          expected(2 * i) = x; expected(2 * i + 1) = y
        }
        for (j <- 0 until p.nQuads) {
          val (v, w, x, y) = p.quad(j)
          val base = 2 * p.bigValues + 4 * j
          expected(base) = v; expected(base + 1) = w
          expected(base + 2) = x; expected(base + 3) = y
        }
        assert(gr.is.toSeq === expected.toSeq, s"seed $seed g$g spectral lines")
      }
    }
    assert(seenBt === Set(1, 2, 3), s"all three switched block types, saw $seenBt")
  }

  test("mixed-block edition: genMixed → decode identity over both scalefactor layouts") {
    val seenMixed = scala.collection.mutable.Set.empty[Int]
    for (seed <- 0L until 24L) {
      val d = Mp3L3.decode(Mp3L3.genMixed(seed))
        .getOrElse(fail(s"seed $seed: no decode"))
      for (g <- 0 to 1) {
        val p = Mp3L3.GranMixedParams(seed, g)
        val gr = d.granules(g)
        seenMixed += gr.mixed
        assert(gr.blockType === 2 && gr.mixed === p.mixed, s"seed $seed g$g")
        assert(gr.bitsUsed === gr.part23Length,
          s"seed $seed g$g: decode must close the bit count")
        assert(gr.subblockGain.toSeq === (0 until 3).map(p.subblockGain))
        if (gr.mixed == 1) {
          // long bands 0–7 transmitted at slen1, 8+ untouched
          assert(gr.scalefacs.take(8).toSeq === (0 until 8).map(p.scalefac),
            s"seed $seed g$g mixed long scalefacs")
          assert(gr.scalefacs.drop(8).forall(_ == 0))
          // short slots: bands 0–2 never transmitted, 3–11 band-major
          assert(gr.scalefacsShort.take(9).forall(_ == 0))
          val exp = for (b <- 3 until 12; w <- 0 until 3) yield p.scalefacShort(b, w)
          assert(gr.scalefacsShort.drop(9).toSeq === exp,
            s"seed $seed g$g mixed short scalefacs")
        } else {
          assert(gr.scalefacs.forall(_ == 0))
          val exp = for (b <- 0 until 12; w <- 0 until 3) yield p.scalefacShort(b, w)
          assert(gr.scalefacsShort.toSeq === exp)
        }
        val expected = new Array[Int](576)
        for (i <- 0 until p.bigValues) {
          val (x, y) = p.pair(i)
          expected(2 * i) = x; expected(2 * i + 1) = y
        }
        for (j <- 0 until p.nQuads) {
          val (v, w, x, y) = p.quad(j)
          val base = 2 * p.bigValues + 4 * j
          expected(base) = v; expected(base + 1) = w
          expected(base + 2) = x; expected(base + 3) = y
        }
        assert(gr.is.toSeq === expected.toSeq, s"seed $seed g$g spectral lines")
      }
    }
    assert(seenMixed === Set(0, 1), "both mixed and non-mixed granules exercised")
  }

  test("stereo edition: genStereo → decode identity over all four payload slots") {
    for (seed <- 0L until 16L) {
      val d = Mp3L3.decode(Mp3L3.genStereo(seed))
        .getOrElse(fail(s"seed $seed: no decode"))
      assert(d.channels === 2)
      assert(d.msStereo === (seed % 2 == 1), s"seed $seed MS flag")
      assert(d.granules.length === 4)
      for (slot <- 0 until 4) {
        val p = Mp3L3.GranParams(seed, slot)
        val gr = d.granules(slot)
        assert(gr.bigValues === p.bigValues, s"seed $seed slot $slot")
        assert(gr.globalGain === p.globalGain)
        assert(gr.scalefacs.toSeq === (0 until 21).map(p.scalefac),
          s"seed $seed slot $slot scalefacs")
        assert(gr.bitsUsed === gr.part23Length,
          s"seed $seed slot $slot: every payload must close its bit count")
        val expected = new Array[Int](576)
        for (i <- 0 until p.bigValues) {
          val (x, y) = p.pair(i)
          expected(2 * i) = x; expected(2 * i + 1) = y
        }
        for (j <- 0 until p.nQuads) {
          val (v, w, x, y) = p.quad(j)
          val base = 2 * p.bigValues + 4 * j
          expected(base) = v; expected(base + 1) = w
          expected(base + 2) = x; expected(base + 3) = y
        }
        assert(gr.is.toSeq === expected.toSeq, s"seed $seed slot $slot spectral")
      }
      // the mono surface rejects stereo streams; the stereo one mono
      assert(Mp3L3.spectralRow(Mp3L3.genStereo(seed)) === null)
      assert(Mp3L3.spectralStRow(Mp3L3.gen(seed)) === null)
    }
  }

  test("joint-stereo extensions dispatch: MS/intensity flags surface; dual rejected") {
    val b = Mp3L3.genStereo(1L) // joint stereo, ext = 2 (MS only)
    val d = Mp3L3.decode(b).get
    assert(d.msStereo && !d.intensity)
    val intensity = b.clone()
    intensity(3) = ((intensity(3) & 0xcf) | 0x10).toByte // ext = 01
    val di = Mp3L3.decode(intensity).get
    assert(!di.msStereo && di.intensity)
    val both = Mp3L3.decode(Mp3L3.genStereoInt(1L)).get // ext = 11
    assert(both.msStereo && both.intensity)
    assert(Mp3L3.decode(Mp3L3.genStereoInt(0L)).exists(x =>
      x.intensity && !x.msStereo)) // ext = 01
    val dual = b.clone()
    dual(3) = ((dual(3) & 0x3f) | 0x80).toByte // mode = 10
    assert(Mp3L3.decode(dual) === None)
  }

  test("a mixed flag on a non-short block type is rejected") {
    // genShort seed 1 makes granule 0 block_type 1 (start); setting its
    // mixed_block_flag (side-info bit 18 + 12+9+8+4+1+2 = 54) must NULL
    val b = Mp3L3.genShort(1L)
    assert(Mp3L3.decode(b).isDefined)
    assert(Mp3L3.GranShortParams(1L, 0).blockType === 1)
    val p = 32 + 54
    val mask = 1 << (7 - (p & 7))
    val bad = b.clone()
    bad(p >> 3) = ((bad(p >> 3) | mask).toByte)
    assert(Mp3L3.decode(bad) === None)
  }

  test("malformed or out-of-scope streams return null") {
    val good = Mp3L3.gen(5L)
    assert(Mp3L3.decode(good.take(20)) === None)        // truncated
    assert(Mp3L3.decode(Array[Byte](1, 2, 3)) === None) // no sync
    // stereo header is out of scope
    val stereo = good.clone(); stereo(3) = 0x00
    assert(Mp3L3.decode(stereo) === None)
    // the invalid table id 4 in granule 0 is rejected: table bits live
    // at side-info bit offset 18 + 12+9+8+4+1 = 52
    val esc = good.clone()
    val bitOff = 32 + 52
    def setBits(b: Array[Byte], off: Int, v: Int, n: Int): Unit =
      (0 until n).foreach { i =>
        val bit = (v >> (n - 1 - i)) & 1
        val p = off + i
        val mask = 1 << (7 - (p & 7))
        b(p >> 3) = (((b(p >> 3) & ~mask) | (if (bit == 1) mask else 0)).toByte)
      }
    setBits(esc, bitOff, 4, 5)
    assert(Mp3L3.decode(esc) === None)
    // corrupting the part2_3_length must break the exact-bit-count close
    val bad = good.clone()
    setBits(bad, 32 + 18, 1, 12)
    assert(Mp3L3.decode(bad) === None)
  }

  test("mp3l3_gen / mp3l3_spectral are registered SQL functions") {
    val row = spark.range(3, 4)
      .select(call_function("mp3l3_spectral",
        call_function("mp3l3_gen", col("id"))).as("m"))
      .select(col("m.sample_rate"), col("m.g0_big_values"), col("m.g1_spec_nonzero"))
      .collect().head
    assert(row.getLong(0) === 44100L)
    val p = Mp3L3.GranParams(3L, 0)
    assert(row.getLong(1) === p.bigValues.toLong)
    assert(row.getLong(2) > 0L)
  }
}
