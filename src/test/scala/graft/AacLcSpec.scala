package graft

import graft.pipeline.{AacLc, FlacPcm, Mp3L3}

/** AAC-LC entropy half: encoder→decoder identity across the seed
  * sweep, substitute-book structural validity (prefix-free, Kraft ≤ 1,
  * closed-form length profile), escape mechanics, and fail-closed
  * paths. */
class AacLcSpec extends SparkSpec {

  test("substitute books are prefix-free with the closed-form length profile") {
    // Kraft sum ≤ 1 and no codeword is a prefix of another — a wrong
    // canonical assignment cannot hide
    def check(len: Array[Int], code: Array[Int]): Unit = {
      val kraft = len.map(l => math.pow(2, -l)).sum
      assert(kraft <= 1.0 + 1e-12, s"Kraft $kraft")
      // prefix-freeness in O(n log n): sort the padded binary words —
      // any prefix relation must appear between sorted neighbors
      val words = len.zip(code).map { case (l, c) =>
        String.format("%" + l + "s", Integer.toBinaryString(c)).replace(' ', '0')
      }.sorted
      for (i <- 0 until words.length - 1)
        assert(!words(i + 1).startsWith(words(i)),
          s"'${words(i)}' prefixes '${words(i + 1)}'")
      assert(words.distinct.length == words.length, "duplicate codewords")
    }
    for (cb <- 1 to 11) { // EVERY book, full alphabet (up to 289 symbols)
      val meta = AacLc.CbMetas(cb)
      val b = new AacLc.Book(Array.tabulate(meta.nSym)(AacLc.gammaLen))
      assert(b.len.zipWithIndex.forall { case (l, i) => l == AacLc.gammaLen(i) })
      check(b.len, b.code)
    }
    check(Array.tabulate(121)(AacLc.gammaLen),
      new AacLc.Book(Array.tabulate(121)(AacLc.gammaLen)).code)
    // the closed form itself: 2*floor(log2(i+1))+1
    assert(AacLc.gammaLen(0) === 1 && AacLc.gammaLen(1) === 3 &&
      AacLc.gammaLen(2) === 3 && AacLc.gammaLen(3) === 5 &&
      AacLc.gammaLen(6) === 5 && AacLc.gammaLen(7) === 7)
  }

  test("encode→decode identity: every coefficient, every seed 0..199") {
    for (seed <- 0L until 200L) {
      val bytes = AacLc.gen(seed)
      val dec = AacLc.decode(bytes).getOrElse(fail(s"seed $seed: no decode"))
      assert(dec.rate === 44100 && dec.frames.length === 2, s"seed $seed")
      for (f <- 0 until 2) {
        val p = AacLc.GenParams(seed, f)
        val ics = dec.frames(f)
        assert(ics.windowSequence === p.windowSequence, s"seed $seed f$f ws")
        assert(ics.windowShape === p.windowShape)
        assert(ics.maxSfb === p.maxSfb)
        assert(ics.globalGain === p.globalGain)
        assert(ics.nSections === p.sections.length)
        // every quantized coefficient, with sign and escape resolution
        val expect = new Array[Int](1024)
        p.sections.foreach { case (cb, first, n) =>
          if (cb != 0) {
            val m = AacLc.CbMetas(cb)
            for (b <- first until first + n;
                 k <- AacLc.LongBands(b) until AacLc.LongBands(b + 1)) {
              val raw = p.mag(cb, k)
              expect(k) =
                if (m.signedCb) raw
                else if (raw == 0) 0
                else (if (p.negative(k)) -raw else raw)
            }
          }
        }
        assert(ics.spec.toSeq === expect.toSeq, s"seed $seed f$f spectrum")
        // scalefactors: DPCM chain from global_gain over coded bands
        var run = p.globalGain
        p.sections.foreach { case (cb, first, n) =>
          if (cb != 0) for (b <- first until first + n) {
            run += p.dpcm(b)
            assert(ics.sf(b) === run, s"seed $seed f$f sf($b)")
          }
        }
      }
    }
  }

  test("the seed sweep exercises every codebook and the escape path") {
    val seen = collection.mutable.Set.empty[Int]
    var escs = 0L
    for (seed <- 0L until 200L; f <- 0 until 2) {
      val p = AacLc.GenParams(seed, f)
      p.sections.foreach { case (cb, _, _) => seen += cb }
    }
    for (seed <- 0L until 50L) {
      val dec = AacLc.decode(AacLc.gen(seed)).get
      escs += dec.frames.map(_.escCount.toLong).sum
    }
    assert(seen === (0 to 11).toSet, s"codebooks seen: $seen")
    assert(escs > 0, "codebook-11 escapes must occur in the sweep")
    // escaped magnitudes reconstruct as 16 + word (N = 4)
    val withEsc = (0L until 50L).map(s => AacLc.decode(AacLc.gen(s)).get)
      .flatMap(_.frames).filter(_.escCount > 0)
    assert(withEsc.nonEmpty)
    assert(withEsc.forall(_.spec.forall(v => math.abs(v) <= 19)),
      "gen magnitudes stay in the N=4 escape range")
    assert(withEsc.exists(_.spec.exists(v => math.abs(v) >= 16)))
  }

  test("part_len closes: independent bit recount matches the reader") {
    for (seed <- 0L until 100L; f <- 0 until 2) {
      val p = AacLc.GenParams(seed, f)
      val ics = AacLc.decode(AacLc.gen(seed)).get.frames(f)
      var bits = 0L
      p.sections.foreach { case (cb, first, n) =>
        bits += 4 + 5 // sect_cb + one length chunk (sections ≤ 4 sfbs)
        if (cb != 0) {
          val m = AacLc.CbMetas(cb)
          for (b <- first until first + n) {
            bits += AacLc.gammaLen(AacLc.sfZigzag(p.dpcm(b)))
            var k = AacLc.LongBands(b)
            while (k < AacLc.LongBands(b + 1)) {
              val vals = Array.tabulate(m.dim)(i => p.mag(cb, k + i))
              bits += AacLc.gammaLen(AacLc.tupleIndex(cb, vals))
              if (!m.signedCb) bits += vals.count(_ != 0)
              if (cb == 11) bits += 5L * vals.count(_ >= 16)
              k += m.dim
            }
          }
        }
      }
      bits += 3 // pulse/tns/gain presence flags
      assert(ics.partLenBits.toLong === bits, s"seed $seed f$f")
    }
  }

  test("malformed streams fail closed") {
    val good = AacLc.gen(7L)
    assert(AacLc.decode(null).isEmpty)
    assert(AacLc.decode(Array[Byte]()).isEmpty)
    assert(AacLc.decode(good.dropRight(1)).isEmpty) // truncation
    // CRC frame (protection_absent = 0): out of scope, never wrong
    val crc = good.clone(); crc(1) = (crc(1) & 0xFE).toByte
    assert(AacLc.decode(crc).isEmpty)
    // non-LC profile
    val main = good.clone(); main(2) = (main(2) & 0x3F).toByte
    assert(AacLc.decode(main).isEmpty)
    // stereo channel config
    val st = good.clone(); st(3) = ((st(3) & 0x3F) | 0x80).toByte
    assert(AacLc.decode(st).isEmpty)
    // flipped payload bit desynchronizes the walk — either a bad code,
    // a section overrun, or a frame-boundary miss; must be None or a
    // DIFFERENT decode, never a crash
    for (bit <- 60 to 100) {
      val bad = good.clone()
      bad(bit / 8) = (bad(bit / 8) ^ (1 << (bit % 8))).toByte
      AacLc.decode(bad) // must not throw
    }
  }

  test("byte-flip fuzz: no corruption of any stream family ever throws") {
    // every single-byte corruption of whole streams across all four
    // generator families must yield Some (a different valid decode) or
    // None — never an escaped exception from the expression path
    for (seed <- 0L until 4L;
         gen <- Seq(AacLc.gen _, AacLc.genShort _, AacLc.genTns _,
                    AacLc.genPulse _)) {
      val good = gen(seed)
      for (i <- good.indices; bit <- Seq(0x01, 0x80)) {
        val bad = good.clone()
        bad(i) = (bad(i) ^ bit).toByte
        AacLc.decode(bad)      // must not throw
        AacLc.spectralRow(bad) // the Catalyst surface either
        // the synthesis arm runs the O(N²) IMDCT per frame — sample
        // every 29th position so the sweep stays seconds, not minutes
        // (the entropy walk above is the exhaustive half; a corrupted
        // stream that survives it decodes like any valid stream)
        if (i % 29 == 0) graft.pipeline.AudioNorm.toWav(bad)
      }
    }
  }

  test("section-length escape chunks decode (31 then remainder)") {
    // hand-encode one SCE whose single zero section covers 31 sfbs:
    // written as 31 + 0 chunks; decoder must sum the chunks
    // (bands 0..30 of 32, maxSfb 31, one ZERO_CB section = no sf, no
    // spectral data)
    val w = new java.io.ByteArrayOutputStream()
    var cur = 0; var n = 0
    var bits = 0L
    def u(v: Int, b: Int): Unit = {
      var i = b - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1); n += 1; bits += b - b + 1
        if (n == 8) { w.write(cur); cur = 0; n = 0 }
        i -= 1
      }
    }
    u(0, 3); u(0, 4)    // SCE, tag
    u(100, 8)           // global_gain
    u(0, 1); u(0, 2); u(0, 1) // reserved, ONLY_LONG, sine
    u(31, 6); u(0, 1)   // max_sfb 31, no predictor
    u(0, 4); u(31, 5); u(0, 5) // ZERO section: len 31 as 31+0
    u(0, 1); u(0, 1); u(0, 1) // pulse/tns/gain
    u(7, 3)             // END
    if (n != 0) { cur <<= (8 - n); w.write(cur) }
    val rdb = w.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    val frameLen = 7 + rdb.length
    out.write(0xFF); out.write(0xF1)
    out.write((1 << 6) | (4 << 2))
    out.write((1 << 6) | ((frameLen >> 11) & 3))
    out.write((frameLen >> 3) & 0xFF)
    out.write(((frameLen & 7) << 5) | 0x1F)
    out.write(0xFC)
    out.write(rdb, 0, rdb.length)
    // two copies so the ≥2-frame surface accepts it
    val one = out.toByteArray
    val two = one ++ one
    val dec = AacLc.decode(two)
    assert(dec.isDefined, "escape-chunk section must decode")
    assert(dec.get.frames(0).nSections === 1)
    assert(dec.get.frames(0).maxSfb === 31)
    assert(dec.get.frames(0).spec.forall(_ == 0))
    assert(AacLc.spectralRow(two) !== null)
  }

  test("generators survive Long.MinValue (abs(MinValue) is negative)") {
    // math.abs(Long.MinValue) == Long.MinValue, so a seed fold through
    // abs would feed negative moduli into table lookups and kill the
    // task from inside codegen; the & Long.MaxValue fold cannot
    for (g <- Seq[Long => Array[Byte]](AacLc.gen, AacLc.genShort,
        AacLc.genPulse, AacLc.genTns, FlacPcm.gen _, Mp3L3.gen _)) {
      val b = g(Long.MinValue)
      assert(b != null && b.length > 0)
    }
    assert(AacLc.decode(AacLc.gen(Long.MinValue)).isDefined)
    assert(AacLc.decode(AacLc.genPulse(Long.MinValue)).isDefined)
  }
}
