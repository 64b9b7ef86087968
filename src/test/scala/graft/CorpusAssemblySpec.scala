package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.{Components, Curation, Dedup, TextAnalysis => TA}

/** End-to-end corpus assembly — the whole training-data pipeline run as
  * ONE library, stage chained into stage on a deliberately dirty corpus:
  *
  *   gzip-framed arrivals → decode → quality gate (language, repetition,
  *   PII redaction) → exact dedup → exact-substring span cutting →
  *   MinHash near-dup cluster resolution → source-mixture sampling →
  *   token packing → deterministic shard export.
  *
  * Each stage's effect is asserted against the planted dirt (compressed
  * members, an exact copy, a truncated near-copy, a spliced substring
  * thief, a PII doc, a degenerate repetition doc), and the export at the
  * end is read back and checked for exact membership and order. This is
  * the "switch your pipeline to this engine" integration proof — every
  * stage is the same production operator the gate entries verify. */
class CorpusAssemblySpec extends SparkSpec {
  import spark.implicits._

  test("dirty corpus in, deduplicated packed shards out — every stage observable") {
    val base = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"), col("source"))
      .filter(col("doc_id") < 120)
    val nBase = base.count()

    // ---- plant the dirt -------------------------------------------------
    val w = split(col("text"), " ")
    val exactCopy = base.filter(col("doc_id") === 7)
      .select((col("doc_id") + 1000).as("doc_id"), col("text"), col("source"))
    val nearCopy = base.filter(col("doc_id") === 11) // head-truncated: near-dup
      .select((col("doc_id") + 2000).as("doc_id"),
        array_join(slice(w, lit(3), size(w)), " ").as("text"), col("source"))
    val piiDoc = Seq((3000L, "contact me at spam@example.com or 10.1.2.3 thanks", "src0"))
      .toDF("doc_id", "text", "source")
    val junkDoc = Seq((3001L, ("lorem " * 60).trim, "src0")) // repetition junk
      .toDF("doc_id", "text", "source")
    val dirty = base.union(exactCopy).union(nearCopy).union(piiDoc).union(junkDoc)

    // ---- stage 0: corpora arrive gzip-framed; decode in-plan ------------
    val arrived = dirty.select(col("doc_id"),
      call_function("gzip_text", col("text")).as("gz"), col("source"))
    val decoded = arrived.select(col("doc_id"),
      call_function("gunzip_text", col("gz")).as("text"), col("source"))
    assert(decoded.filter(col("text").isNull).count() === 0)

    // ---- stage 1: quality gate + PII redaction --------------------------
    // threshold 0.9: the fixture's ~31-word lexicon gives NATURAL docs
    // duplicate-word fractions up to ~0.72, so the gate must sit between
    // that and the planted degenerate doc's ~0.98
    val gated = decoded
      .withColumn("text", TA.redactPii(col("text")))
      .filter(TA.duplicateWordFraction(col("text")) < 0.9)
    assert(gated.filter(col("doc_id") === 3001L).count() === 0,
      "repetition junk must fall to the quality gate")
    val redacted = gated.filter(col("doc_id") === 3000L)
      .select("text").as[String].collect().head
    assert(!redacted.contains("spam@example.com") && !redacted.contains("10.1.2.3"),
      s"PII must be redacted, got: $redacted")

    // ---- stage 2: exact dedup (first occurrence wins) -------------------
    val exact = Dedup.exactDedup(gated, "text", "doc_id")
    assert(exact.filter(col("doc_id") === 1007L).count() === 0,
      "the exact copy must lose to doc 7")
    assert(exact.filter(col("doc_id") === 7L).count() === 1)

    // ---- stage 3: exact-substring span cutting --------------------------
    // the truncated near-copy shares its whole text with doc 11 as
    // substrings: the cut empties it (first occurrence keeps everything)
    val cut = Dedup.substringDedup(exact, "doc_id", "text", window = 8)
      .withColumnRenamed("clean_text", "text")
    val victim = cut.filter(col("doc_id") === 2011L).collect().head
    assert(victim.getAs[Long]("dup_tokens") > 0 &&
      victim.getAs[String]("text").isEmpty,
      "the substring thief must be cut to nothing")
    assert(cut.filter(col("doc_id") === 11L)
      .collect().head.getAs[Long]("dup_tokens") === 0L,
      "the first occurrence keeps its text")
    val afterCut = cut.filter(length(col("text")) > 0)
      .join(exact.drop("text"), "doc_id")
      .select("doc_id", "text", "source")

    // ---- stage 4: near-dup cluster resolution (MinHash-LSH) -------------
    val pairs = Dedup.minHashNearDupPairs(afterCut, "doc_id", "text",
      threshold = 0.8, shingleN = 3, numHashes = 32, bands = 16)
    val resolved = Components.dedupByPairs(afterCut, pairs, "doc_id")
    val resolvedIds = resolved.select("doc_id").as[Long].collect().toSet
    assert(resolvedIds.contains(7L) && resolvedIds.contains(11L),
      "the kept originals ride through every dedup tier")
    assert(!resolvedIds.contains(1007L) && !resolvedIds.contains(2011L) &&
      !resolvedIds.contains(3001L), "every planted defect is gone")

    // ---- stage 5: mixture + packing + export ----------------------------
    val mixed = Curation.sampleToMixture(resolved, "source", "doc_id",
      parts = Map("src0" -> 5L, "src1" -> 3L, "src2" -> 2L),
      bucket = Curation.md5Bucket)
    val packed = Curation.packByTokenBudget(
      mixed.withColumn("n_tokens", TA.tokenCount(col("text"))),
      shardCol = "source", orderCol = "doc_id", nTokensCol = "n_tokens",
      budget = 512L)
    assert(packed.filter(col("chunk") < 0).count() === 0)

    val out = java.nio.file.Files.createTempDirectory("assembly").toString
    Curation.writeShards(packed.select("doc_id", "text", "source"),
      "doc_id", out, numShards = 4, ordFn = Curation.md5Ord)
    val back = spark.read.parquet(out)
    assert(back.count() === packed.count())
    assert(back.select("doc_id").distinct().count() === packed.count())

    // conservation ledger: the export is exactly the mixture-sampled set
    // (mixture legitimately downsamples the non-binding sources, so the
    // kept-original assertions live at the pre-mixture stage above)
    val survivors = back.select("doc_id").as[Long].collect().toSet
    assert(survivors.subsetOf(resolvedIds))
    assert(!survivors.contains(1007L) && !survivors.contains(2011L) &&
      !survivors.contains(3001L))
    assert(survivors.size <= nBase + 1) // base + redacted PII doc at most
  }

  test("image corpus in, perceptually deduplicated out — the d10-d12 lifecycle") {
    // the image counterpart of the text dedup stages: PNGs (including
    // a planted box-resized twin and a byte-identical copy) ->
    // ingest-time dHash fingerprints -> banded near-dup pairs ->
    // connected-components resolution -> dedupByPairs keeps one
    // representative per perceptual cluster
    import graft.pipeline.{Components, Dedup, PerceptualHash, PngCodec}
    import spark.implicits._

    def png(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] =
      PngCodec.encodeGrayPng(
        Array.tabulate(w * h)(i => f(i % w, i / w) & 0xff), w, h)
    val a = png(18, 16)((x, y) => x * 9 + y * 4)        // keeper (min id)
    val aCopy = a.clone()                               // exact copy
    val aTwin = PngCodec.resize(a, 27, 24, "box")       // resized twin
    val b = png(18, 16)((x, y) => (17 - x) * 9 + y * 4) // unrelated
    val corpus = Seq((1L, a), (2L, aCopy), (3L, aTwin), (4L, b))
      .toDF("img_id", "img")

    val fp = corpus.select(col("img_id").as("__id"),
      call_function("image_dhash", col("img")).as("__sim"))
    val pairs = Dedup.simHashNearDupPairsFromFingerprints(
      fp, maxHamming = 3, bands = 4, bits = 64)
    val kept = Components.dedupByPairs(corpus, pairs, "img_id")
      .select("img_id").as[Long].collect().toSet
    assert(kept === Set(1L, 4L),
      s"copy and twin collapse onto image 1; the unrelated image survives: $kept")
    // and the twin really was a DIFFERENT byte stream (perceptual, not
    // byte, identity did the work)
    assert(!java.util.Arrays.equals(a, aTwin))
    assert(PerceptualHash.dHash(a).longValue() ===
      PerceptualHash.dHash(aTwin).longValue())
  }

  test("audio corpus in, perceptually deduplicated out — the d13-d15 lifecycle") {
    // the audio counterpart of the image dedup stages: streams
    // (including a byte-identical copy, a zero-order-hold resampled
    // twin, and a CROSS-CONTAINER pair — a FLAC stream and its
    // audio_to_wav WAV re-encode) -> ingest-time audio fingerprints ->
    // banded near-dup pairs -> connected-components resolution ->
    // dedupByPairs keeps one representative per perceptual cluster
    import graft.pipeline.{AudioFingerprint, AudioNorm, AvHeader, Components, Dedup, FlacPcm}
    import spark.implicits._

    // the d13 gate's two-amplitude cell pattern (33 cells of q frames)
    def pattern(seed: Long, q: Int): Array[Int] = Array.tabulate(33 * q) { i =>
      val c = i / q
      val ha = seed * 8191L + c * 127L + 1
      val hb = seed * 4099L + c * 211L + 3
      val mag = if (i % 2 == 0) ((ha * ha % 8923) % 89 + 8).toInt
                else ((hb * hb % 7919) % 83 + 8).toInt
      (1 - 2 * ((i / 2) % 2)) * mag
    }
    val a = AvHeader.encodePcm16Wav(pattern(21L, 9), 8000, 1) // keeper (min id)
    val aCopy = a.clone()                                     // exact copy
    val aTwin = AvHeader.resampleWav(a, 24000)                // 3× ZOH twin
    val b = AvHeader.encodePcm16Wav(pattern(22L, 9), 8000, 1) // unrelated
    val f = FlacPcm.gen(4L)                                   // FLAC stream
    val fWav = AudioNorm.toWav(f)                             // its WAV re-encode
    val corpus = Seq((1L, a), (2L, aCopy), (3L, aTwin), (4L, b),
      (5L, f), (6L, fWav)).toDF("aud_id", "aud")

    val fp = corpus.select(col("aud_id").as("__id"),
      call_function("audio_fingerprint", col("aud")).as("__sim"))
    val pairs = Dedup.simHashNearDupPairsFromFingerprints(
      fp, maxHamming = 3, bands = 4, bits = 64)
    val kept = Components.dedupByPairs(corpus, pairs, "aud_id")
      .select("aud_id").as[Long].collect().toSet
    assert(kept === Set(1L, 4L, 5L),
      s"copy+twin collapse onto 1, WAV re-encode onto its FLAC; unrelated survives: $kept")
    // the twins really were DIFFERENT byte streams (perceptual, not
    // byte, identity did the work) — and the cross-container pair
    // crossed a real codec boundary
    assert(!java.util.Arrays.equals(a, aTwin))
    assert(!java.util.Arrays.equals(f, fWav))
    assert(AudioFingerprint.fingerprint(f).longValue() ===
      AudioFingerprint.fingerprint(fWav).longValue())
  }

  test("mixed-provenance audio in, one canonical rate out — every dispatch arm") {
    // The audio normalization tier run as a CHAIN, not per-operator: a
    // corpus whose rows span every supported container family
    //
    //   WAV-PCM16, WAV-µlaw, FLAC, ADTS AAC-LC (long + EIGHT_SHORT),
    //   MPEG-1 Layer III (mono + stereo)
    //
    // flows audio_to_wav → wav_resample(16k) → wav_pcm, and each row is
    // asserted to have hit ITS dispatch arm (native rate/channels/counts
    // per family) before landing at the shared canonical format.
    import graft.pipeline.{AacLc, AvHeader, FlacPcm, Mp3L3, Multimodal}

    def ulawWav(samples: Seq[Int], rate: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(44 + samples.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36 + samples.length).put("WAVE".getBytes)
      bb.put("fmt ".getBytes).putInt(16).putShort(7).putShort(1)
        .putInt(rate).putInt(rate).putShort(1).putShort(8)
      bb.put("data".getBytes).putInt(samples.length)
      samples.foreach(v => bb.put(v.toByte))
      bb.array()
    }

    val flacMeta = FlacPcm.decode(FlacPcm.gen(4L)).get
    val corpus: Seq[(Long, String, Array[Byte])] = Seq(
      (1L, "wav_pcm16", AvHeader.encodePcm16Wav(
        Array.tabulate(200)(i => (i * 37 - 3000) % 30000), 8000, 1)),
      (2L, "wav_ulaw", ulawWav((0 until 160).map(i => (i * 7) % 256), 8000)),
      (3L, "flac", FlacPcm.gen(4L)),
      (4L, "aac_long", AacLc.gen(9L)),
      (5L, "aac_short", AacLc.genShort(9L)),
      (6L, "mp3_mono", Mp3L3.gen(9L)),
      (7L, "mp3_stereo", Mp3L3.genStereo(9L)))

    val df = spark.createDataFrame(corpus).toDF("id", "kind", "bytes")
      .withColumn("wav", call_function("audio_to_wav", col("bytes")))
      .withColumn("rs", call_function("wav_resample", col("wav"), lit(16000)))
      .withColumn("nat", Multimodal.wavPcm(col("wav")))
      .withColumn("out", Multimodal.wavPcm(col("rs")))
    val rows = df.select("id", "kind", "wav", "rs",
        "nat.codec", "nat.sample_rate", "nat.channels", "nat.n_samples",
        "out.sample_rate", "out.channels", "out.n_samples", "out.sum_sq")
      .collect().map(r => r.getString(1) -> r).toMap

    assert(rows.size === corpus.size)
    for ((kind, r) <- rows) {
      assert(!r.isNullAt(2), s"$kind: audio_to_wav must decode")
      assert(!r.isNullAt(3), s"$kind: wav_resample must decode")
      assert(r.getString(4) === "pcm_s16le", s"$kind: canonical codec")
      assert(r.getInt(8) === 16000, s"$kind: resampled rate")
      assert(r.getLong(10) > 0, s"$kind: resampled samples")
      assert(r.getInt(9) === r.getInt(6), s"$kind: channels preserved")
    }
    // native rates prove the right arm ran (not a default)
    def nat(kind: String, rate: Int, ch: Int, n: Long): Unit = {
      val r = rows(kind)
      assert(r.getInt(5) === rate, s"$kind native rate")
      assert(r.getInt(6) === ch, s"$kind channels")
      assert(r.getLong(7) === n, s"$kind native samples")
    }
    nat("wav_pcm16", 8000, 1, 200)
    nat("wav_ulaw", 8000, 1, 160)
    nat("flac", 44100, flacMeta.channels,
      flacMeta.blockSize.toLong * flacMeta.channels)
    nat("aac_long", 44100, 1, 2 * 1024)   // two-frame generators
    nat("aac_short", 44100, 1, 2 * 1024)
    nat("mp3_mono", 44100, 1, 1152)
    nat("mp3_stereo", 44100, 2, 2 * 1152)
    // the chain carries real signal, not silence — for the families
    // whose generators emit at int16 scale. The MP3 generator's
    // synthetic global_gain keeps requantized amplitudes below the
    // int16 quantum (2^((gg-210)/4) with gg well under 210), so its
    // canonical PCM is legitimately zero-valued; its dispatch proof is
    // the exact frame-count/rate/channel assertions above.
    for (kind <- Seq("wav_pcm16", "wav_ulaw", "flac", "aac_long", "aac_short"))
      assert(rows(kind).getLong(11) > 0, s"$kind: expected nonzero signal")
  }
}
