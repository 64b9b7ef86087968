package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Multimodal

/** Multimodal plumbing: schema/typing of the stubbed decode path, frame
  * sampling explode semantics, and the batched feature-extract boundary. */
class MultimodalSpec extends SparkSpec {

  private lazy val media =
    Multimodal.mediaFromDocuments(Tables.documents(spark, sf0001)).cache()

  test("mediaFromDocuments: binary payload + cyclic kinds") {
    val kinds = media.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds === Set("image", "audio", "video"))
    assert(media.schema("bytes").dataType.typeName === "binary")
  }

  test("decodeMetaStub: per-kind nullability pattern") {
    val meta = Multimodal.decodeMetaStub(col("kind"), col("bytes"))
    val rows = media.select(col("kind"), meta.as("m")).collect()
    rows.foreach { r =>
      val kind = r.getString(0)
      val m = r.getStruct(1)
      assert(!m.isNullAt(m.fieldIndex("size_bytes")))
      assert(m.isNullAt(m.fieldIndex("width")) === (kind != "image"))
      assert(m.isNullAt(m.fieldIndex("sample_rate")) === (kind != "audio"))
      assert(m.isNullAt(m.fieldIndex("fps")) === (kind != "video"))
    }
  }

  test("sampleFrames explodes one row per sampled frame") {
    val meta = Multimodal.decodeMetaStub(col("kind"), col("bytes"))
    val videos = media.filter(col("kind") === "video").limit(3)
      .withColumn("m", meta)
    val sampled = Multimodal.sampleFrames(videos, col("m"), everyNth = 10)
    val counts = sampled.groupBy("media_id").count().collect()
    val expected = videos.select(col("media_id"),
        (floor((col("m.duration_s") * col("m.fps") - 1) / 10) + 1).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    counts.foreach(r => assert(r.getLong(1) === expected(r.getLong(0))))
  }

  // ---- real image-header decode ---------------------------------------

  /** Minimal valid PNG: signature + IHDR(w, h) + bit depth/color/etc. */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val sig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)
    val be32 = (v: Int) => Array(v >>> 24, (v >>> 16) & 0xff, (v >>> 8) & 0xff, v & 0xff)
    (sig ++ be32(13) ++ "IHDR".map(_.toInt) ++ be32(w) ++ be32(h) ++
      Array(8, 6, 0, 0, 0) ++ be32(0)).map(_.toByte)
  }

  /** Minimal JPEG: SOI, APP0 (JFIF), DQT filler, SOF0 carrying (h, w). */
  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val be16 = (v: Int) => Array(v >>> 8, v & 0xff)
    (Array(0xff, 0xd8) ++
      (Array(0xff, 0xe0) ++ be16(16) ++ "JFIF".map(_.toInt) ++ Array.fill(10)(0)) ++
      (Array(0xff, 0xdb) ++ be16(4) ++ Array(0, 0)) ++
      (Array(0xff, 0xc0) ++ be16(11) ++ Array(8) ++ be16(h) ++ be16(w) ++ Array(1, 0x11, 0, 0))
    ).map(_.toByte)
  }

  private def gifBytes(w: Int, h: Int): Array[Byte] =
    ("GIF89a".map(_.toInt).toArray ++
      Array(w & 0xff, w >>> 8, h & 0xff, h >>> 8) ++ Array(0, 0, 0)).map(_.toByte)

  test("image_meta parses real PNG/JPEG/GIF headers; null for non-images") {
    import spark.implicits._
    val df = Seq(
      ("png", pngBytes(640, 480)),
      ("jpeg", jpegBytes(1920, 1080)),
      ("gif", gifBytes(320, 200)),
      ("trunc", pngBytes(640, 480).take(20)),
      ("text", "just some document text".getBytes("UTF-8"))
    ).toDF("tag", "bytes")
    // via the Column API (codegen'd expression)
    val got = df.select(col("tag"), Multimodal.imageMeta(col("bytes")).as("m"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null
         else { val m = r.getStruct(1); (m.getString(0), m.getInt(1), m.getInt(2)) })).toMap
    assert(got("png") === ("png", 640, 480))
    assert(got("jpeg") === ("jpeg", 1920, 1080))
    assert(got("gif") === ("gif", 320, 200))
    assert(got("trunc") === null)
    assert(got("text") === null)
    // via SQL (FunctionRegistry path)
    val sql = df.selectExpr("tag", "image_meta(bytes) AS m")
      .where("m IS NOT NULL").count()
    assert(sql === 3)
  }

  test("image_meta property: construct→parse is the identity on 150 random dims; garbage nulls") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val cases = Seq.fill(150) {
      val w = rng.nextInt(65535) + 1
      val h = rng.nextInt(65535) + 1
      rng.nextInt(3) match {
        case 0 => ("png", w, h, pngBytes(w, h))
        case 1 => ("jpeg", w, h, jpegBytes(w, h))
        case _ => ("gif", w, h, gifBytes(w, h))
      }
    } ++ Seq.fill(30) { // random garbage never parses
      val b = new Array[Byte](rng.nextInt(64) + 1); rng.nextBytes(b)
      ("none", 0, 0, b)
    }
    val got = cases.zipWithIndex.map { case ((f, w, h, b), i) => (i.toLong, f, w, h, b) }
      .toDF("i", "f", "w", "h", "bytes")
      .select(col("i"), col("f"), col("w"), col("h"),
        Multimodal.imageMeta(col("bytes")).as("m"))
      .collect()
    got.foreach { r =>
      if (r.getString(1) == "none") assert(r.isNullAt(4), s"garbage parsed: $r")
      else {
        val m = r.getStruct(4)
        assert((m.getString(0), m.getInt(1), m.getInt(2)) ===
          ((r.getString(1), r.getInt(2), r.getInt(3))), s"case ${r.getLong(0)}")
      }
    }
  }

  test("decodeMeta: real dims for real images, stub fallback otherwise") {
    import spark.implicits._
    val df = Seq(
      (1L, "image", jpegBytes(800, 600)),
      (2L, "image", "fake payload".getBytes("UTF-8")),
      (3L, "audio", "fake payload".getBytes("UTF-8"))
    ).toDF("media_id", "kind", "bytes")
    val rows = df.select(col("media_id"),
        Multimodal.decodeMeta(col("kind"), col("bytes")).as("m"),
        Multimodal.decodeMetaStub(col("kind"), col("bytes")).as("stub"))
      .collect().map(r => r.getLong(0) -> (r.getStruct(1), r.getStruct(2))).toMap
    val (real, _) = rows(1L)
    assert(real.getAs[Int]("width") === 800 && real.getAs[Int]("height") === 600)
    val (fake, fakeStub) = rows(2L)
    assert(fake === fakeStub) // unparseable image falls back to the stub
    val (audio, audioStub) = rows(3L)
    assert(audio === audioStub) // non-image kinds always take the stub
  }

  test("mediaFromDocuments payloads never parse as containers, even GIF-prefixed text") {
    import spark.implicits._
    // a document whose TEXT begins with a valid GIF header must still take
    // the stub branch: the fixture's NUL prefix keeps fake payloads
    // unambiguous, so the stub-replaying mm1 oracle is corpus-independent
    val docs = Seq((0L, "GIF89a" + new String(Array[Byte](16, 0, 16, 0)) + "rest"))
      .toDF("doc_id", "text")
    val media = Multimodal.mediaFromDocuments(docs)
    val r = media.select(
        Multimodal.imageMeta(col("bytes")).as("real"),
        Multimodal.decodeMeta(col("kind"), col("bytes")).as("m"),
        Multimodal.decodeMetaStub(col("kind"), col("bytes")).as("stub"))
      .collect().head
    assert(r.isNullAt(0), "NUL-prefixed payload must not parse as a container")
    assert(r.getStruct(1) === r.getStruct(2))
  }

  test("AvHeader: WAV chunk walk — rate, channels, declared-size duration") {
    import java.nio.ByteBuffer
    import java.nio.ByteOrder.LITTLE_ENDIAN
    def wav(sr: Int, ch: Int, dataSize: Int, junkChunk: Boolean): Array[Byte] = {
      val bb = ByteBuffer.allocate(128).order(LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
      if (junkChunk) // a LIST chunk before fmt: the walk must skip it
        bb.put("LIST".getBytes).putInt(4).put("INFO".getBytes)
      bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(ch.toShort)
        .putInt(sr).putInt(sr * ch * 2).putShort((ch * 2).toShort).putShort(16)
      bb.put("data".getBytes).putInt(dataSize)
      java.util.Arrays.copyOf(bb.array(), bb.position())
    }
    val m = pipeline.AvHeader.parse(wav(44100, 2, 44100 * 4 * 3 + 7, junkChunk = false)).get
    assert((m.container, m.sampleRate, m.channels, m.durationS) === ("wav", 44100, 2, 3))
    val j = pipeline.AvHeader.parse(wav(16000, 1, 16000 * 2 * 5, junkChunk = true)).get
    assert((j.sampleRate, j.channels, j.durationS) === (16000, 1, 5))
    // not a container: RIFF without WAVE, truncated RIFF, text bytes
    assert(pipeline.AvHeader.parse("RIFFxxxxAVI LIST".getBytes).isEmpty)
    assert(pipeline.AvHeader.parse("RIFF".getBytes).isEmpty)
    assert(pipeline.AvHeader.parse((0.toByte +: "some document text".getBytes).toArray).isEmpty)
  }

  test("AvHeader: MP4 box walk — mvhd duration, tkhd 16.16 dims, v1 fields") {
    import java.nio.ByteBuffer
    def mp4(ts: Int, dur: Long, w: Int, h: Int, v1: Boolean): Array[Byte] = {
      val bb = ByteBuffer.allocate(512) // big-endian by default
      bb.put(Array[Byte](0, 0, 0, 16)).put("ftyp".getBytes)
        .put("isom".getBytes).putInt(512)
      val mvhdSz = if (v1) 120 else 108
      val tkhdSz = if (v1) 104 else 92
      bb.putInt(8 + mvhdSz + 8 + tkhdSz).put("moov".getBytes)
      bb.putInt(mvhdSz).put("mvhd".getBytes)
      if (v1) bb.putInt(0x01000000).putLong(0L).putLong(0L).putInt(ts).putLong(dur)
      else bb.putInt(0).putInt(0).putInt(0).putInt(ts).putInt(dur.toInt)
      bb.putInt(0x00010000).putShort(0x0100.toShort).put(new Array[Byte](10))
        .put(new Array[Byte](36)).put(new Array[Byte](24)).putInt(2)
      bb.putInt(8 + tkhdSz).put("trak".getBytes)
      bb.putInt(tkhdSz).put("tkhd".getBytes)
      if (v1) bb.putInt(0x01000007).putLong(0L).putLong(0L).putInt(1).putInt(0).putLong(dur)
      else bb.putInt(7).putInt(0).putInt(0).putInt(1).putInt(0).putInt(dur.toInt)
      bb.put(new Array[Byte](8)).put(new Array[Byte](8)).put(new Array[Byte](36))
        .putInt(w << 16).putInt(h << 16)
      java.util.Arrays.copyOf(bb.array(), bb.position())
    }
    val m0 = pipeline.AvHeader.parse(mp4(90000, 90000L * 42 + 123, 1920, 1080, v1 = false)).get
    assert((m0.container, m0.durationS, m0.width, m0.height) === ("mp4", 42, 1920, 1080))
    val m1 = pipeline.AvHeader.parse(mp4(600, 600L * 7, 640, 360, v1 = true)).get
    assert((m1.durationS, m1.width, m1.height) === (7, 640, 360))
    // a box declaring a size past the buffer is structurally broken
    val broken = mp4(600, 600L, 64, 64, v1 = false)
    broken(3) = 0x7f.toByte // ftyp size → huge
    assert(pipeline.AvHeader.parse(broken).isEmpty)
    assert(pipeline.AvHeader.parse("not an mp4 at all, truly".getBytes).isEmpty)
  }

  test("AvHeader: fps folds the stts sample runs over the MEDIA timescale") {
    import java.nio.ByteBuffer
    // moov[ mvhd + trak[ tkhd + mdia[ mdhd(mediaTs) + minf[ stbl[ stts ]]]]]
    // with a DIFFERENT movie timescale, so using the wrong one is caught
    def mp4(movieTs: Int, mediaTs: Int, runs: Seq[(Int, Int)]): Array[Byte] = {
      val bb = ByteBuffer.allocate(1024)
      bb.put(Array[Byte](0, 0, 0, 16)).put("ftyp".getBytes)
        .put("isom".getBytes).putInt(512)
      val sttsSz = 16 + 8 * runs.size
      val stblSz = 8 + sttsSz
      val minfSz = 8 + stblSz
      val mdiaSz = 8 + 32 + minfSz
      val trakSz = 8 + 92 + mdiaSz
      bb.putInt(8 + 108 + trakSz).put("moov".getBytes)
      bb.putInt(108).put("mvhd".getBytes)
        .putInt(0).putInt(0).putInt(0).putInt(movieTs).putInt(movieTs * 9)
        .putInt(0x00010000).putShort(0x0100.toShort).put(new Array[Byte](10))
        .put(new Array[Byte](36)).put(new Array[Byte](24)).putInt(2)
      bb.putInt(trakSz).put("trak".getBytes)
      bb.putInt(92).put("tkhd".getBytes)
        .putInt(7).putInt(0).putInt(0).putInt(1).putInt(0).putInt(movieTs * 9)
        .put(new Array[Byte](8)).put(new Array[Byte](8)).put(new Array[Byte](36))
        .putInt(640 << 16).putInt(360 << 16)
      bb.putInt(mdiaSz).put("mdia".getBytes)
      bb.putInt(32).put("mdhd".getBytes)
        .putInt(0).putInt(0).putInt(0).putInt(mediaTs).putInt(0).putInt(0)
      bb.putInt(minfSz).put("minf".getBytes)
      bb.putInt(stblSz).put("stbl".getBytes)
      bb.putInt(sttsSz).put("stts".getBytes).putInt(0).putInt(runs.size)
      runs.foreach { case (c, d) => bb.putInt(c).putInt(d) }
      java.util.Arrays.copyOf(bb.array(), bb.position())
    }
    // an hdlr-typed trak builder for multi-trak dispatch tests
    def trak(bb: ByteBuffer, handler: String, mediaTs: Int,
        runs: Seq[(Int, Int)]): Unit = {
      val sttsSz = 16 + 8 * runs.size
      val stblSz = 8 + sttsSz
      val minfSz = 8 + stblSz
      val hdlrSz = 33
      val mdiaSz = 8 + 32 + hdlrSz + minfSz
      bb.putInt(8 + 92 + mdiaSz).put("trak".getBytes)
      bb.putInt(92).put("tkhd".getBytes)
        .putInt(7).putInt(0).putInt(0).putInt(1).putInt(0).putInt(9000)
        .put(new Array[Byte](8)).put(new Array[Byte](8)).put(new Array[Byte](36))
        .putInt(640 << 16).putInt(360 << 16)
      bb.putInt(mdiaSz).put("mdia".getBytes)
      bb.putInt(32).put("mdhd".getBytes)
        .putInt(0).putInt(0).putInt(0).putInt(mediaTs).putInt(0).putInt(0)
      bb.putInt(hdlrSz).put("hdlr".getBytes)
        .putInt(0).putInt(0).put(handler.getBytes("US-ASCII"))
        .put(new Array[Byte](12)).put(new Array[Byte](1))
      bb.putInt(minfSz).put("minf".getBytes)
      bb.putInt(stblSz).put("stbl".getBytes)
      bb.putInt(sttsSz).put("stts".getBytes).putInt(0).putInt(runs.size)
      runs.foreach { case (c, d) => bb.putInt(c).putInt(d) }
    }
    def mp4Traks(specs: Seq[(String, Int, Seq[(Int, Int)])]): Array[Byte] = {
      val bb = ByteBuffer.allocate(2048)
      bb.put(Array[Byte](0, 0, 0, 16)).put("ftyp".getBytes)
        .put("isom".getBytes).putInt(512)
      val moovStart = bb.position()
      bb.putInt(0).put("moov".getBytes) // size patched below
      bb.putInt(108).put("mvhd".getBytes)
        .putInt(0).putInt(0).putInt(0).putInt(1000).putInt(9000)
        .putInt(0x00010000).putShort(0x0100.toShort).put(new Array[Byte](10))
        .put(new Array[Byte](36)).put(new Array[Byte](24)).putInt(2)
      specs.foreach { case (h, ts, runs) => trak(bb, h, ts, runs) }
      bb.putInt(moovStart, bb.position() - moovStart)
      java.util.Arrays.copyOf(bb.array(), bb.position())
    }
    // AUDIO-FIRST file: the AAC-ish trak's packet rate (44100/1024 ≈ 43)
    // must NOT be reported as fps — the later 'vide' trak (24 fps) wins
    val av = pipeline.AvHeader.parse(mp4Traks(Seq(
      ("soun", 44100, Seq(430 -> 1024)),
      ("vide", 12288, Seq(240 -> 512))))).get
    assert(av.fps === 24, s"audio-first fps dispatch: got ${av.fps}")
    // audio-ONLY file: a declared non-video handler never yields fps
    val audioOnly = pipeline.AvHeader.parse(mp4Traks(Seq(
      ("soun", 44100, Seq(430 -> 1024))))).get
    assert(audioOnly.fps === -1)

    // 240 samples over 240·512 media units at ts 12288 → 24 fps exactly
    val exact = pipeline.AvHeader.parse(mp4(1000, 12288, Seq(240 -> 512))).get
    assert(exact.fps === 24)
    // mixed runs round: (100·400 + 50·600) = 70000 units, 150 samples,
    // ts 12288 → 150·12288/70000 = 26.33… → 26
    val mixed = pipeline.AvHeader.parse(mp4(1000, 12288, Seq(100 -> 400, 50 -> 600))).get
    assert(mixed.fps === 26)
    // no stts → fps stays unset (null through the expression)
    val m0 = pipeline.AvHeader.parse(mp4(1000, 12288, Seq.empty)).get
    assert(m0.fps === -1)
    // ADVERSARIAL stts: cnt = delta = 0xFFFFFFFF (unsigned max) would
    // wrap cnt·delta past Long and yield a wrong-but-plausible fps;
    // the fold must refuse (-1), never compute from wrapped sums
    val hostile = pipeline.AvHeader.parse(mp4(1000, 12288, Seq(-1 -> -1))).get
    assert(hostile.fps === -1, s"overflowing stts must not yield fps: ${hostile.fps}")
  }

  test("decodeWavPcm: every sample word decodes with sign extension") {
    import java.nio.ByteBuffer
    import java.nio.ByteOrder.LITTLE_ENDIAN
    def wav(sr: Int, ch: Int, samples: Seq[Short], declared: Option[Int] = None,
        fmt: Short = 1, bits: Short = 16): Array[Byte] = {
      val dataSize = declared.getOrElse(samples.size * 2)
      val bb = ByteBuffer.allocate(64 + samples.size * 2).order(LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36 + dataSize).put("WAVE".getBytes)
      bb.put("fmt ".getBytes).putInt(16).putShort(fmt).putShort(ch.toShort)
        .putInt(sr).putInt(sr * ch * 2).putShort((ch * 2).toShort).putShort(bits)
      bb.put("data".getBytes).putInt(dataSize)
      samples.foreach(bb.putShort)
      java.util.Arrays.copyOf(bb.array(), bb.position())
    }
    val s = pipeline.AvHeader.decodeWavPcm(
      wav(16000, 1, Seq[Short](100, -200, 32767, -32768, 0))).get
    assert((s.sampleRate, s.channels, s.nSamples) === (16000, 1, 5L))
    assert((s.minS, s.maxS) === (-32768L, 32767L))
    assert(s.sumS === 100L - 200L + 32767L - 32768L)
    assert(s.sumSq === 100L * 100 + 200L * 200 + 32767L * 32767 + 32768L * 32768)
    // a header-only stream (declared size, absent payload) is zero samples
    val h = pipeline.AvHeader.decodeWavPcm(wav(8000, 1, Seq.empty, Some(4000))).get
    assert((h.nSamples, h.minS, h.maxS, h.sumS, h.sumSq) === (0L, 0L, 0L, 0L, 0L))
    // non-PCM format / non-16-bit / non-WAV bytes refuse, not garbage-decode
    assert(pipeline.AvHeader.decodeWavPcm(wav(8000, 1, Seq[Short](1), fmt = 3)).isEmpty)
    assert(pipeline.AvHeader.decodeWavPcm(wav(8000, 1, Seq[Short](1), bits = 8)).isEmpty)
    assert(pipeline.AvHeader.decodeWavPcm("just some text bytes".getBytes).isEmpty)
  }

  test("mp3_meta: sync scan, version/layer branches, Xing/Info, truncation") {
    import pipeline.Mp3Header

    /** Build one frame: 4-byte header + zero payload to frameLen. */
    def frame(verBits: Int, layerBits: Int, bi: Int, si: Int, pad: Int,
        mono: Boolean, lenOverride: Int = -1): Array[Byte] = {
      val h = Array[Byte](0xff.toByte,
        (0xe0 | (verBits << 3) | (layerBits << 1) | 1).toByte,
        ((bi << 4) | (si << 2) | (pad << 1)).toByte,
        (if (mono) 0xc0 else 0x00).toByte)
      val parsed = Mp3Header.parse(h ++ new Array[Byte](8192)).get
      val len = if (lenOverride >= 0) lenOverride
        else (parsed.totalBytes / parsed.frames).toInt
      h ++ new Array[Byte](len - 4)
    }

    // MPEG1 Layer III stereo 128 kbps @ 44100: frameLen 417+pad
    val f = frame(3, 1, 9, 0, 0, mono = false)
    assert(f.length === 417)
    val m = Mp3Header.parse(f ++ f ++ f).get
    assert((m.version, m.layer, m.sampleRate, m.channels) === (1, 3, 44100, 2))
    assert((m.bitrateKbps, m.frames, m.totalBytes) === (128, 3L, 1251L))
    assert(m.durationMs === 3L * 1152 * 1000 / 44100)
    assert(m.avgKbps === 1251L * 8 * 44100 / (3 * 1152) / 1000)
    assert(m.xingFrames.isEmpty && !m.vbr)

    // sync scan skips junk INCLUDING a lone 0xFF that fails re-validation
    val junk = Array[Byte](0, 0x49, 0x44, 0x33, 0xff.toByte, 0)
    assert(Mp3Header.parse(junk ++ f).get.frames === 1L)

    // a truncated final frame never counts
    assert(Mp3Header.parse(f ++ f.take(100)).get.frames === 1L)

    // padding bit lengthens the frame by exactly one byte
    assert(frame(3, 1, 9, 0, 1, mono = false).length === 418)

    // MPEG2 Layer III mono: 576-sample frames, the V2 rate/bitrate tables
    val m2 = Mp3Header.parse(frame(2, 1, 4, 1, 0, mono = true)).get
    assert((m2.version, m2.sampleRate, m2.bitrateKbps) === (2, 24000, 32))
    assert(m2.durationMs === 576L * 1000 / 24000)

    // Layer I frame-length formula: (12·bitrate/rate + pad)·4
    val m1 = Mp3Header.parse(frame(3, 3, 1, 0, 0, mono = false)).get
    assert((m1.layer, m1.totalBytes) === (1, (12 * 32000 / 44100) * 4L))

    // Xing (VBR) and Info (CBR) at the mono-V1 offset 4+17
    def withTag(tag: String): Array[Byte] = {
      val base = frame(3, 1, 9, 0, 0, mono = true)
      System.arraycopy(tag.getBytes("US-ASCII"), 0, base, 21, 4)
      System.arraycopy(Array[Byte](0, 0, 0, 1), 0, base, 25, 4) // flags: frames
      System.arraycopy(Array[Byte](0, 0, 1, 42), 0, base, 29, 4) // 0x012A
      base
    }
    val x = Mp3Header.parse(withTag("Xing")).get
    assert(x.vbr && x.xingFrames === Some(298L)) // 0x0000012A
    val i = Mp3Header.parse(withTag("Info")).get
    assert(!i.vbr && i.xingFrames === Some(298L))

    // free-format (bi=0) and reserved codes refuse
    assert(Mp3Header.parse(Array[Byte](0xff.toByte, 0xfb.toByte, 0x02, 0)).isEmpty)
    assert(Mp3Header.parse(Array[Byte](0xff.toByte, 0xeb.toByte, 0x92.toByte, 0)).isEmpty) // ver=01
    assert(Mp3Header.parse("not audio at all".getBytes) === None)
  }

  test("G.711 expansion: published extreme/zero points and curve symmetry") {
    import pipeline.AvHeader.{alaw2linear, ulaw2linear}
    // µ-law: 0x00 is the negative extreme (-32124), 0x80 the positive
    // (+32124); 0xFF and 0x7F are the two zeros
    assert(ulaw2linear(0x00) === -32124)
    assert(ulaw2linear(0x80) === 32124)
    assert(ulaw2linear(0xFF) === 0)
    assert(ulaw2linear(0x7F) === 0)
    // A-law: no zero code — smallest magnitudes are ±8 (0x55/0xD5),
    // extremes ±32256 (0x2A/0xAA)
    assert(alaw2linear(0x55) === -8)
    assert(alaw2linear(0xD5) === 8)
    assert(alaw2linear(0x2A) === -32256)
    assert(alaw2linear(0xAA) === 32256)
    // sign symmetry across the full byte range: flipping the sign bit
    // negates the decode, for both curves
    (0 until 128).foreach { c =>
      assert(ulaw2linear(c) === -ulaw2linear(c | 0x80))
      assert(alaw2linear(c) === -alaw2linear(c | 0x80))
    }
    // µ-law decode is monotone within each sign half (codes order by
    // magnitude): 0x00..0x7F strictly increasing
    val neg = (0x00 to 0x7F).map(ulaw2linear)
    assert(neg === neg.sorted)
  }

  test("decodeWavPcm: G.711 and IMA ADPCM payloads decode through the codec, not raw bytes") {
    import java.nio.ByteBuffer
    import java.nio.ByteOrder.LITTLE_ENDIAN
    def wav(fmt: Int, ch: Int, bits: Int, blockAlign: Int, data: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(64 + data.length).order(LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36 + data.length).put("WAVE".getBytes)
      bb.put("fmt ".getBytes).putInt(16).putShort(fmt.toShort).putShort(ch.toShort)
        .putInt(8000).putInt(8000).putShort(blockAlign.toShort).putShort(bits.toShort)
      bb.put("data".getBytes).putInt(data.length).put(data)
      java.util.Arrays.copyOf(bb.array(), bb.position())
    }
    // µ-law: bytes 0x00, 0xFF, 0x80 → -32124, 0, +32124
    val u = pipeline.AvHeader.decodeWavPcm(
      wav(7, 1, 8, 1, Array(0x00, 0xFF, 0x80).map(_.toByte))).get
    assert((u.codec, u.nSamples, u.minS, u.maxS, u.sumS) ===
      ("ulaw", 3L, -32124L, 32124L, 0L))
    // A-law: 0x55, 0xD5 → -8, +8
    val a = pipeline.AvHeader.decodeWavPcm(
      wav(6, 1, 8, 1, Array(0x55, 0xD5).map(_.toByte))).get
    assert((a.codec, a.nSamples, a.minS, a.maxS, a.sumS) === ("alaw", 2L, -8L, 8L, 0L))
    // IMA ADPCM, hand-stepped: pred0=0 idx0=0 (step 7), codes [7, 7]:
    //   code 7 @ step 7  → diff 0+7+3+1 = 11 → pred 11, idx 8 (step 16)
    //   code 7 @ step 16 → diff 2+16+8+4 = 30 → pred 41
    // samples = [0, 11, 41]
    val block = Array[Byte](0, 0, 0, 0, 0x77)
    val ad = pipeline.AvHeader.decodeWavPcm(wav(0x11, 1, 4, 5, block)).get
    assert((ad.codec, ad.nSamples) === ("ima_adpcm", 3L))
    assert((ad.minS, ad.maxS, ad.sumS, ad.sumSq) === (0L, 41L, 52L, 11L * 11 + 41L * 41))
    // two blocks: the second block's header RESEEDS the predictor —
    // state must not leak across block boundaries
    val b2 = ByteBuffer.allocate(10).order(LITTLE_ENDIAN)
      .putShort(100.toShort).put(0.toByte).put(0.toByte).put(0x00.toByte)
      .putShort(-50.toShort).put(0.toByte).put(0.toByte).put(0x00.toByte)
    val two = pipeline.AvHeader.decodeWavPcm(wav(0x11, 1, 4, 5, b2.array())).get
    // code 0 @ step 7 → diff 0 → pred unchanged, twice per block
    assert((two.nSamples, two.minS, two.maxS, two.sumS) === (6L, -50L, 100L, 150L))
    // stereo / short-block ADPCM refuses rather than garbage-decodes
    assert(pipeline.AvHeader.decodeWavPcm(wav(0x11, 2, 4, 8, block)).isEmpty)
    assert(pipeline.AvHeader.decodeWavPcm(wav(0x11, 1, 4, 4, block)).isEmpty)
  }

  test("PNG codec: hand-rolled DEFLATE encode decodes through javax.imageio to the exact pattern") {
    val seed = 5L
    val w = (seed % 16 + 4).toInt
    val h = (seed * 7 % 12 + 4).toInt
    val s = pipeline.PngCodec.decodePixels(pipeline.PngCodec.pngBytes(seed)).get
    assert((s.width, s.height, s.nPx) === (w, h, w.toLong * h))
    val expected = for { y <- 0 until h; x <- 0 until w }
      yield math.floorMod(seed * 31 + x * 7 + y * 13, 256)
    assert(s.sumPx === expected.sum)
    assert(s.sumSq === expected.map(v => v * v).sum)
    assert(s.minPx === expected.min && s.maxPx === expected.max)
    // non-image bytes refuse
    assert(pipeline.PngCodec.decodePixels("not an image".getBytes).isEmpty)
    assert(pipeline.PngCodec.decodePixels(Array.emptyByteArray).isEmpty)
    // a corrupted IDAT (flipped byte mid-stream) must not decode to a
    // plausible-but-wrong fold: either refuses or fails CRC inside ImageIO
    val png = pipeline.PngCodec.pngBytes(seed)
    png(png.length - 20) = (png(png.length - 20) ^ 0x7F).toByte
    val corrupt = pipeline.PngCodec.decodePixels(png)
    assert(corrupt.isEmpty || corrupt.get.sumPx != s.sumPx)
  }

  test("GIF codec: hand-written LZW encode+decode match the pattern AND javax.imageio, 150 seeds") {
    for (seed <- 0L until 150L) {
      val bytes = pipeline.GifCodec.gifBytes(seed)
      val w = (seed % 14 + 5).toInt
      val h = (seed * 5 % 11 + 5).toInt
      val mine = pipeline.GifCodec.decodePixels(bytes).get
      val expected = for { y <- 0 until h; x <- 0 until w }
        yield math.floorMod(seed * 17 + x * 11 + y * 29, 256)
      assert((mine.width, mine.height, mine.nPx) === (w, h, w.toLong * h), s"seed $seed dims")
      assert(mine.sumPx === expected.sum, s"seed $seed sum")
      assert(mine.sumSq === expected.map(v => v * v).sum, s"seed $seed sumSq")
      assert(mine.minPx === expected.min && mine.maxPx === expected.max, s"seed $seed extremes")
      // the JDK's own GIF codec must read the hand-encoded bytes to the
      // SAME indexed raster (identity gray palette: index == gray value),
      // so neither hand-written half can hide a defect in the other
      assert(pipeline.PngCodec.decodePixels(bytes).get === mine,
        s"seed $seed: javax.imageio disagrees with the hand decoder")
    }
  }

  test("GIF LZW: width bumps at 512/1024/2048 and the 4096 table reset, vs javax.imageio") {
    // high-entropy 120x120: the dictionary grows ~1 entry/code, crossing
    // every width bump and forcing the 4096 clear-reset several times —
    // the corner cases the small pattern images never reach
    val (w, h) = (120, 120)
    val px = new Array[Byte](w * h)
    var x = 0x12345678
    for (i <- px.indices) { x = x * 1103515245 + 12345; px(i) = (x >>> 16).toByte }
    val enc = pipeline.GifCodec.lzwEncode(px, 8)
    val dec = pipeline.GifCodec.lzwDecode(enc, 8, px.length.toLong)
    assert(dec != null && java.util.Arrays.equals(dec, px), "raw LZW round-trip")
    val gif = pipeline.GifCodec.gifBytesOf(w, h, px)
    val mine = pipeline.GifCodec.decodePixels(gif).get
    val jdk = pipeline.PngCodec.decodePixels(gif).get
    assert(mine === jdk, "javax.imageio disagrees past the width bumps / table reset")
    assert(mine.nPx === w.toLong * h)
    assert(mine.sumPx === px.map(b => (b & 0xFF).toLong).sum)
  }

  test("GIF interlace: 8/8/4/2 pass order de-permutes to the exact raster, vs javax.imageio") {
    // hand-check the pass order itself on a 10-row image
    assert(pipeline.GifCodec.interlaceRows(10).toSeq ===
      Seq(0, 8, 4, 2, 6, 1, 3, 5, 7, 9))
    val (w, h) = (23, 19)
    val px = new Array[Byte](w * h)
    for (i <- px.indices) px(i) = ((i * 37 + 11) % 256).toByte
    val gif = pipeline.GifCodec.gifBytesOf(w, h, px, interlaced = true)
    val (dw, dh, mine) = pipeline.GifCodec.decodeIndices(gif).get
    assert((dw, dh) === (w, h))
    // POSITION-exact: pixel statistics are permutation-blind, so an
    // interlace bug is invisible to the stats fold — compare the raster
    assert(java.util.Arrays.equals(mine, px), "deinterlaced buffer mismatch")
    // and the JDK's decoder agrees sample-for-sample on the same bytes
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gif))
    for (y <- 0 until h; x <- 0 until w)
      assert(img.getRaster.getSample(x, y, 0) === (px(y * w + x) & 0xFF),
        s"pixel ($x,$y)")
  }

  test("GIF sub-rectangle frame: decoder reports FRAME dims, agreeing with javax.imageio") {
    // real-world optimized GIFs place a frame smaller than the logical
    // screen at a nonzero offset. javax.imageio decodes the FRAME (not a
    // screen canvas) — probed empirically — and this decoder must agree,
    // or gif_pixels and image_pixels would diverge on the same bytes.
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    le16(10); le16(10) // logical screen 10x10
    out.write(0xF7); out.write(0); out.write(0)
    for (i <- 0 until 256) { out.write(i); out.write(i); out.write(i) }
    out.write(0x2C)
    le16(2); le16(1)   // frame offset (2,1)
    le16(4); le16(3)   // frame 4x3
    out.write(0); out.write(8)
    val px = Array.tabulate[Byte](12)(i => (50 + i).toByte)
    val z = pipeline.GifCodec.lzwEncode(px, 8)
    out.write(z.length); out.write(z, 0, z.length); out.write(0); out.write(0x3B)
    val gif = out.toByteArray
    val mine = pipeline.GifCodec.decodePixels(gif).get
    val jdk = pipeline.PngCodec.decodePixels(gif).get
    assert((mine.width, mine.height, mine.nPx) === (4, 3, 12L))
    assert(mine === jdk, "frame-vs-canvas divergence from javax.imageio")
  }

  test("gif_pixels refuses garbage; corrupt LZW never folds to plausible stats") {
    assert(pipeline.GifCodec.decodePixels("GIF89a but not an image".getBytes).isEmpty)
    assert(pipeline.GifCodec.decodePixels("not an image at all....".getBytes).isEmpty)
    assert(pipeline.GifCodec.decodePixels(Array.emptyByteArray).isEmpty)
    val good = pipeline.GifCodec.gifBytes(9L)
    assert(pipeline.GifCodec.decodePixels(good.take(30)).isEmpty, "truncated header")
    assert(pipeline.GifCodec.decodePixels(good.dropRight(8)).isEmpty, "truncated stream")
    val ok = pipeline.GifCodec.decodePixels(good).get
    val flipped = good.clone()
    flipped(good.length - 12) = (flipped(good.length - 12) ^ 0x55).toByte
    val corrupt = pipeline.GifCodec.decodePixels(flipped)
    assert(corrupt.isEmpty || corrupt.get != ok, "corrupt LZW decoded to the same fold")
  }

  test("gif_gen/gif_pixels run in-plan and match the local decoder") {
    import org.apache.spark.sql.functions._
    val rows = spark.range(24).select(col("id"),
      call_function("gif_pixels", call_function("gif_gen", col("id"))).as("m"))
      .select(col("id"), col("m.n_px"), col("m.sum_px"), col("m.sum_sq"))
      .collect()
    for (r <- rows) {
      val s = pipeline.GifCodec.decodePixels(
        pipeline.GifCodec.gifBytes(r.getLong(0))).get
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) === (s.nPx, s.sumPx, s.sumSq))
    }
  }

  test("wav_pcm expression decodes in-plan and stays inside codegen") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val samples = Seq[Short](7, -7, 300)
    val bb = java.nio.ByteBuffer.allocate(64 + samples.size * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + 6).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(22050).putInt(22050 * 2).putShort(2).putShort(16)
    bb.put("data".getBytes).putInt(6)
    samples.foreach(bb.putShort)
    val bytes = java.util.Arrays.copyOf(bb.array(), bb.position())
    // anchor the input to a real scan column (a zero-length slice of the
    // text bytes appended to the fixed WAV), else constant folding /
    // local-relation collapse evaluates the expression at plan time and
    // no codegen'd projection remains to assert on
    val df = Tables.documents(spark, sf0001).limit(1)
      .select(pipeline.Multimodal.wavPcm(
        concat(lit(bytes), expr("substring(encode(text, 'UTF-8'), 1, 0)"))).as("m"))
    val r = df.select("m.n_samples", "m.sum_s", "m.sum_sq", "m.sample_rate").head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)) ===
      (3L, 300L, 49L + 49L + 90000L, 22050))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project"), s"expected codegen'd projection:\n$p")
  }

  test("decodeMeta: real WAV/MP4 containers beat the stub; text stays stubbed") {
    import java.nio.ByteBuffer
    import java.nio.ByteOrder.LITTLE_ENDIAN
    val bb = ByteBuffer.allocate(64).order(LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + 32000).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(16000).putInt(32000).putShort(2).putShort(16)
      .put("data".getBytes).putInt(32000)
    val wavBytes = java.util.Arrays.copyOf(bb.array(), bb.position())
    import spark.implicits._
    val df = Seq(("audio", wavBytes), ("audio", Array[Byte](0, 65, 66)))
      .toDF("kind", "bytes")
      .select(Multimodal.decodeMeta(col("kind"), col("bytes")).as("m"))
    val rows = df.select(col("m.sample_rate"), col("m.duration_s")).collect()
    assert((rows(0).getInt(0), rows(0).getInt(1)) === (16000, 1)) // real parse
    assert(rows(1).getInt(0) === 16000 || rows(1).getInt(0) === 32000 || rows(1).getInt(0) === 48000)
  }

  test("image_resize: nearest and box match a brute-force resample, any input format") {
    import graft.pipeline.{GifCodec, PngCodec}
    // source pattern from png_gen's closed form, seed 5: w = 5%16+4 = 9,
    // h = (5·7)%12+4 = 15
    val seed = 5L
    val src = PngCodec.pngBytes(seed)
    val w = 9; val h = 15
    def pat(x: Int, y: Int): Int = math.floorMod(seed * 31 + x * 7 + y * 13, 256).toInt
    // downscale 4×3 nearest
    val near = PngCodec.resize(src, 4, 3, "nearest")
    val img1 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(near))
    assert(img1.getWidth === 4 && img1.getHeight === 3)
    for (y <- 0 until 3; x <- 0 until 4)
      assert(img1.getRaster.getSample(x, y, 0) === pat(x * w / 4, y * h / 3))
    // box average, mixed up/down (12×3): wide upscale keeps ≥1 src px
    val box = PngCodec.resize(src, 12, 3, "box")
    val img2 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(box))
    for (y <- 0 until 3; x <- 0 until 12) {
      val x0 = x * w / 12; val x1 = math.max(x0 + 1, (x + 1) * w / 12)
      val y0 = y * h / 3; val y1 = math.max(y0 + 1, (y + 1) * h / 3)
      val vs = for (sy <- y0 until y1; sx <- x0 until x1) yield pat(sx, sy).toLong
      assert(img2.getRaster.getSample(x, y, 0) === (vs.sum / vs.length).toInt,
        s"box ($x,$y)")
    }
    // the input side is format-agnostic: a GIF resizes identically to
    // the equivalent PNG (gif_gen shares the closed-form pattern shape)
    val gif = GifCodec.gifBytes(seed)
    val gifImg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gif))
    val viaGif = PngCodec.resize(gif, 3, 3, "nearest")
    val img3 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(viaGif))
    for (y <- 0 until 3; x <- 0 until 3)
      assert(img3.getRaster.getSample(x, y, 0) ===
        gifImg.getRaster.getSample(x * gifImg.getWidth / 3, y * gifImg.getHeight / 3, 0))
    // guards
    assert(PngCodec.resize(src, 4, 3, "bicubic") === null)
    assert(PngCodec.resize(src, 0, 3, "nearest") === null)
    assert(PngCodec.resize(Array[Byte](1, 2), 4, 3, "nearest") === null)
  }

  test("wav_resample: exact zero-order-hold mapping, compressed inputs normalize") {
    import graft.pipeline.AvHeader
    val src = Array(100, -200, 300, -400, 500, -600, 700, -800)
    val wav = AvHeader.encodePcm16Wav(src, 8000, 1)
    // downsample 2:1 — every second frame
    val down = AvHeader.decodeWavSamples(AvHeader.resampleWav(wav, 4000)).get
    assert(down.sampleRate === 4000 && down.codec === "pcm_s16le")
    assert(down.samples.toSeq === Seq(100, 300, 500, 700))
    // upsample 2:1 — zero-order hold doubles every frame
    val up = AvHeader.decodeWavSamples(AvHeader.resampleWav(wav, 16000)).get
    assert(up.samples.toSeq === src.flatMap(v => Seq(v, v)).toSeq)
    // non-integral ratio: out j reads src floor(j*8000/12000)
    val odd = AvHeader.decodeWavSamples(AvHeader.resampleWav(wav, 12000)).get
    assert(odd.samples.length === 8 * 12000 / 8000)
    odd.samples.zipWithIndex.foreach { case (v, j) =>
      assert(v === src((j.toLong * 8000 / 12000).toInt), s"frame $j")
    }
    // stereo frames move together
    val st = AvHeader.encodePcm16Wav(Array(1, -1, 2, -2, 3, -3, 4, -4), 8000, 2)
    val st2 = AvHeader.decodeWavSamples(AvHeader.resampleWav(st, 4000)).get
    assert(st2.channels === 2 && st2.samples.toSeq === Seq(1, -1, 3, -3))
    // a compressed µ-law input comes out as linear PCM16 at the new rate
    val ulawBytes = Array[Int](0xFF, 0x7F, 0x80, 0x00) // ±0 and the loudest codes
    val ulawWav = {
      val bb = java.nio.ByteBuffer.allocate(44 + 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36 + 4).put("WAVE".getBytes)
      bb.put("fmt ".getBytes).putInt(16).putShort(7).putShort(1)
        .putInt(8000).putInt(8000).putShort(1).putShort(8)
      bb.put("data".getBytes).putInt(4)
      ulawBytes.foreach(v => bb.put(v.toByte))
      bb.array()
    }
    val norm = AvHeader.decodeWavSamples(AvHeader.resampleWav(ulawWav, 8000)).get
    assert(norm.codec === "pcm_s16le")
    assert(norm.samples.toSeq ===
      ulawBytes.map(AvHeader.ulaw2linear).toSeq, "expansion then identity resample")
    // guards
    assert(AvHeader.resampleWav(wav, 0) === null)
    assert(AvHeader.resampleWav(Array[Byte](1, 2, 3), 8000) === null)
    // amplification guard: a crafted sampleRate=1 header would expand
    // every input frame 768000× — the output must be REJECTED as NULL
    // in Long space before any allocation, not wrap `.toInt` into a
    // NegativeArraySizeException that kills the task
    val tiny = {
      val bb = java.nio.ByteBuffer.allocate(44 + 8192 * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36 + 8192 * 2).put("WAVE".getBytes)
      bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
        .putInt(1).putInt(2).putShort(2).putShort(16) // sampleRate = 1 Hz
      bb.put("data".getBytes).putInt(8192 * 2)
      bb.array()
    }
    assert(AvHeader.resampleWav(tiny, 768000) === null)
  }

  test("extractFeaturesStub: one feature row per media row, deterministic") {
    implicit val s = spark
    val feats = Multimodal.extractFeaturesStub(media, batchSize = 16).collect()
    assert(feats.length === media.count())
    assert(feats.forall(_.dim === 64))
    val again = Multimodal.extractFeaturesStub(media, batchSize = 7).collect()
    assert(feats.sortBy(_.media_id).map(_.checksum).toSeq ===
      again.sortBy(_.media_id).map(_.checksum).toSeq) // batch size must not change features
  }
}
