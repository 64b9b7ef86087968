package graft

import graft.pipeline.{AvHeader, Mp3Header}

/** CROSS-ECOSYSTEM known-answer vectors: bitstreams this repo did NOT
  * generate, decoded to pinned samples — the external-truth anchor the
  * gzip codec has had since round 9 (python-zlib vector, p_t9),
  * extended to the audio codecs. Two independent sources:
  *
  *   - CPython's `audioop` module (CPython Modules/audioop.c — an
  *     implementation with no code or tables in common with this repo)
  *     ENCODED a fixed 128-sample PCM signal to G.711 u-law, G.711
  *     A-law, and IMA/DVI ADPCM; the encoded bytes AND audioop's own
  *     decode of them are pinned below as literals. Our decoders must
  *     reproduce every sample of audioop's decode from audioop's
  *     bytes. (Generated once with CPython 3.11; the deprecation of
  *     audioop in 3.13 is why the bytes are pinned rather than
  *     regenerated per-run.)
  *   - the 9,436-byte MPEG-2 Layer III file shipped as public test
  *     data in Google's gsutil (Apache-2.0,
  *     gslib/tests/test_data/test.mp3, sha256 324320b0...f421a8a5),
  *     committed at src/test/resources/external/gsutil_test.mp3: an
  *     independently-encoded bitstream whose structural walk (sync
  *     offset, per-frame lengths incl. the padding-bit 208/209
  *     alternation, exact tiling of the file) was derived by hand from
  *     the framing spec and is pinned below.
  *
  * Why this matters: every other codec gate decodes streams built by
  * this repo's own encoder halves — internally consistent, but a
  * shared misreading of the spec would cancel out. These vectors can
  * only pass if the decode agrees with an implementation written by
  * someone else.
  */
class ExternalVectorsSpec extends SparkSpec {

  // ULAW encoded by CPython audioop (Modules/audioop.c)
  private val ulawEnc: Array[Byte] = Array[Byte](
    6, 12, 21, 33, 57, -56, -83, -91, -95, -94, -89, -79, -34, 49, 31, 20,
    13, 7, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 7, 13,
    22, 37, 91, -85, -100, -108, -114, -116, -117, -116, -115, -113, -107, -98, -82, 79,
    38, 24, 15, 10, 6, 3, 0, 0, 0, 0, 2, 5, 9, 14, 23, 39,
    -1, -89, -105, -114, -119, -123, -126, -128, -128, -128, -128, -125, -122, -118, -113, -104,
    -90, -49, 46, 30, 21, 15, 13, 12, 11, 12, 14, 20, 28, 43, -37, -91,
    -106, -115, -121, -127, -128, -128, -128, -128, -128, -128, -128, -128, -128, -128, -126, -121,
    -115, -108, -97, -79, 94, 49, 39, 34, 33, 37, 45, 72, -71, -95, -107, -116)
  private val ulawExpect: Array[Int] = Array(
    -25980, -19836, -13436, -7676, -2748, 1372, 4604, 6652, 7676, 7420,
    6140, 3772, 428, -3772, -8316, -13948, -18812, -24956, -30076, -32124,
    -32124, -32124, -32124, -32124, -32124, -32124, -32124, -32124, -32124, -31100,
    -24956, -18812, -12924, -6652, -524, 5116, 9852, 13948, 17788, 19836,
    20860, 19836, 18812, 16764, 13436, 8828, 4348, -924, -6396, -11900,
    -16764, -21884, -25980, -29052, -32124, -32124, -32124, -32124, -30076, -27004,
    -22908, -17788, -12412, -6140, 0, 6140, 12412, 17788, 22908, 27004,
    30076, 32124, 32124, 32124, 32124, 29052, 25980, 21884, 16764, 11900,
    6396, 924, -4348, -8828, -13436, -16764, -18812, -19836, -20860, -19836,
    -17788, -13948, -9852, -5116, 524, 6652, 12924, 18812, 24956, 31100,
    32124, 32124, 32124, 32124, 32124, 32124, 32124, 32124, 32124, 32124,
    30076, 24956, 18812, 13948, 8316, 3772, -428, -3772, -6140, -7420,
    -7676, -6652, -4604, -1372, 2748, 7676, 13436, 19836)

  // ALAW encoded by CPython audioop (Modules/audioop.c)
  private val alawEnc: Array[Byte] = Array[Byte](
    45, 39, 63, 11, 16, -32, -124, -116, -120, -119, -126, -104, -52, 24, 53, 63,
    39, 45, 40, 42, 42, 42, 42, 42, 42, 42, 42, 42, 42, 40, 45, 39,
    61, 12, 117, -122, -74, -66, -91, -89, -90, -90, -89, -91, -68, -76, -123, 120,
    13, 50, 37, 32, 44, 41, 43, 42, 42, 42, 40, 47, 35, 36, 50, 13,
    -43, -115, -78, -92, -93, -81, -88, -86, -86, -86, -85, -87, -84, -96, -91, -78,
    -116, -8, 5, 52, 60, 37, 39, 38, 38, 39, 37, 62, 54, 6, -11, -116,
    -68, -89, -83, -88, -86, -86, -86, -86, -86, -86, -86, -86, -86, -86, -88, -83,
    -89, -65, -75, -104, 76, 24, 2, 9, 8, 12, 4, 97, -112, -117, -65, -89)
  private val alawExpect: Array[Int] = Array(
    -25088, -18944, -13568, -7808, -2752, 1376, 4480, 6528, 7552, 7296,
    6016, 3776, 408, -3776, -8448, -13568, -18944, -25088, -30208, -32256,
    -32256, -32256, -32256, -32256, -32256, -32256, -32256, -32256, -32256, -30208,
    -25088, -18944, -12544, -6528, -528, 4992, 9984, 14080, 16896, 18944,
    19968, 19968, 18944, 16896, 13056, 8960, 4224, -944, -6272, -12032,
    -16896, -22016, -26112, -29184, -31232, -32256, -32256, -32256, -30208, -27136,
    -23040, -17920, -12032, -6272, 8, 6272, 12032, 17920, 23040, 27136,
    30208, 32256, 32256, 32256, 31232, 29184, 26112, 22016, 16896, 12032,
    6528, 944, -4224, -8960, -13056, -16896, -18944, -19968, -19968, -18944,
    -16896, -14080, -9984, -4992, 528, 6528, 13056, 18944, 25088, 30208,
    32256, 32256, 32256, 32256, 32256, 32256, 32256, 32256, 32256, 32256,
    30208, 25088, 18944, 13568, 8448, 3776, -408, -3776, -6016, -7296,
    -7552, -6528, -4480, -1312, 2752, 7808, 13568, 18944)

  // IMA/DVI ADPCM encoded by CPython audioop (state None => pred 0, idx 0);
  // audioop packs the FIRST sample of each byte pair in the HIGH nibble
  private val adpcmEnc: Array[Byte] = Array[Byte](
    -1, -1, -9, 119, 48, -85, -35, -67, -69, -70, 8, -128, -120, 8, -124, 118,
    35, 51, 35, 34, 8, -102, -37, -36, -84, -85, -86, -103, 0, 35, 99, 83,
    67, 52, 34, 33, 0, -102, -67, -53, -53, -54, -70, -103, 0, 36, 68, 67,
    67, 51, 16, 0, 0, 0, 0, -34, -53, -69, -70, -87, -127, 52, 84, 67)
  private val adpcmExpect: Array[Int] = Array(
    -11, -41, -104, -240, -533, 98, 1455, 4365, 7274, 7652,
    5935, 3750, 626, -3947, -8207, -14295, -19968, -25124, -29811, -32768,
    -32215, -32718, -32768, -32353, -32731, -32768, -32456, -32740, -32768, -30656,
    -26396, -18482, -13089, -6226, 14, 5687, 9370, 14057, 17100, 19867,
    20370, 19913, 18667, 16777, 12998, 9476, 4444, -1583, -5635, -12265,
    -16722, -22395, -26078, -29426, -31251, -32768, -32265, -31808, -29730, -27084,
    -22618, -18358, -12270, -6597, 33, 6273, 11946, 18576, 23033, 27085,
    30768, 32767, 32767, 32767, 31258, 28971, 26062, 21904, 16923, 12236,
    6757, 1601, -4426, -8478, -13634, -16982, -18807, -20467, -19964, -19507,
    -17429, -14027, -9910, -4929, 1098, 6771, 13401, 19641, 25314, 30470,
    32478, 32767, 32767, 32767, 32767, 32767, 32767, 32767, 32767, 32767,
    29927, 25013, 18986, 13313, 8157, 3470, -790, -3557, -6073, -7445,
    -7860, -6726, -4322, -1511, 2647, 7628, 13655, 19328)

  private val srcPcm: Array[Int] = Array(
    -25600, -19348, -13320, -7733, -2787, 1344, 4516, 6623, 7600, 7423,
    6116, 3744, 413, -3733, -8520, -13748, -19200, -24652, -29880, -32768,
    -32768, -32768, -32768, -32768, -32768, -32768, -32768, -32768, -32768, -30667,
    -25080, -19052, -12800, -6548, -520, 5067, 10013, 14144, 17316, 19423,
    20400, 20223, 18916, 16544, 13213, 9067, 4280, -948, -6400, -11852,
    -17080, -21867, -26013, -29344, -31716, -32768, -32768, -32223, -30116, -26944,
    -22813, -17867, -12280, -6252, 0, 6252, 12280, 17867, 22813, 26944,
    30116, 32223, 32767, 32767, 31716, 29344, 26013, 21867, 17080, 11852,
    6400, 948, -4280, -9067, -13213, -16544, -18916, -20223, -20400, -19423,
    -17316, -14144, -10013, -5067, 520, 6548, 12800, 19052, 25080, 30667,
    32767, 32767, 32767, 32767, 32767, 32767, 32767, 32767, 32767, 32767,
    29880, 24652, 19200, 13748, 8520, 3733, -413, -3744, -6116, -7423,
    -7600, -6623, -4516, -1344, 2787, 7733, 13320, 19348)

  /** The 128-sample source signal the vectors were encoded from:
    * 30000·sin(2*pi*i/32) + (i−64)·400, clamped to int16 — full-range
    * sweep through every u-law/A-law segment. Kept for documentation
    * and the round-trip sanity check; the DECODE assertions below pin
    * against audioop's decode, not against this. */

  private def wav8(fmt: Int, data: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + data.length).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(fmt.toShort).putShort(1)
      .putInt(8000).putInt(8000).putShort(1).putShort(8)
    bb.put("data".getBytes).putInt(data.length)
    bb.put(data)
    bb.array()
  }

  test("u-law bytes encoded by CPython audioop decode sample-exactly") {
    // expansion-curve check: byte-level decode
    assert(ulawEnc.map(b => AvHeader.ulaw2linear(b)).toSeq === ulawExpect.toSeq)
    // end-to-end through the WAV container path
    val ws = AvHeader.decodeWavSamples(wav8(7, ulawEnc)).get
    assert(ws.codec === "ulaw" && ws.samples.toSeq === ulawExpect.toSeq)
  }

  test("A-law bytes encoded by CPython audioop decode sample-exactly") {
    assert(alawEnc.map(b => AvHeader.alaw2linear(b)).toSeq === alawExpect.toSeq)
    val ws = AvHeader.decodeWavSamples(wav8(6, alawEnc)).get
    assert(ws.codec === "alaw" && ws.samples.toSeq === alawExpect.toSeq)
  }

  test("IMA ADPCM bytes encoded by CPython audioop decode sample-exactly") {
    // audioop emits a raw nibble stream from initial state (pred 0,
    // idx 0), FIRST sample in the HIGH nibble; WAV IMA blocks are
    // low-nibble-first with a block header carrying the seed state and
    // the header predictor emitted as the block's first sample. Swap
    // nibbles, seed the header with (0, 0): the decode must then be
    // 0 followed by audioop's own 128 decoded samples.
    val swapped = adpcmEnc.map { b =>
      val u = b & 0xFF
      (((u & 0x0F) << 4) | ((u >> 4) & 0x0F)).toByte
    }
    val blockAlign = 4 + swapped.length
    val bb = java.nio.ByteBuffer.allocate(44 + 4 + swapped.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + 4 + swapped.length).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(0x11).putShort(1)
      .putInt(8000).putInt(4000).putShort(blockAlign.toShort).putShort(4)
    bb.put("data".getBytes).putInt(4 + swapped.length)
    bb.putShort(0).put(0.toByte).put(0.toByte) // seed: pred 0, idx 0
    bb.put(swapped)
    val ws = AvHeader.decodeWavSamples(bb.array()).get
    assert(ws.codec === "ima_adpcm")
    assert(ws.samples.toSeq === (0 +: adpcmExpect.toSeq))
  }

  private def externalMp3: Array[Byte] = {
    val in = getClass.getResourceAsStream("/external/gsutil_test.mp3")
    try in.readAllBytes() finally in.close()
  }

  test("externally-encoded MPEG-2 Layer III file: structural walk pins") {
    val b = externalMp3
    assert(b.length === 9436)
    val m = Mp3Header.parse(b).get
    // hand-derived from the framing spec over the raw bytes: MPEG-2
    // Layer III, 22.05 kHz mono 64 kbps CBR, 45 back-to-back frames
    // starting after the 32-byte ID3v2 tag and tiling the file exactly
    assert(m.version === 2 && m.layer === 3)
    assert(m.sampleRate === 22050 && m.channels === 1 && m.bitrateKbps === 64)
    assert(m.frames === 45L)
    assert(m.totalBytes === 9404L)        // 9436 − 32 bytes of ID3v2
    assert(m.durationMs === 1175L)        // 45·576·1000 / 22050
    // integer-exact: 9404·8·22050 / (45·576) = 63999 → /1000 = 63
    // (the true average sits just under the nominal 64 kbps because
    // padding does not land on every frame)
    assert(m.avgKbps === 63L)
    assert(!m.vbr)
  }

  test("external bytes flow through the SQL surface (wav_pcm, mp3_meta)") {
    // same vectors, but through the registered Catalyst expressions in
    // a real Spark plan — the engine-facing path a pipeline would use
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val wav = wav8(7, ulawEnc)
    val row = Seq((1L, wav)).toDF("id", "bytes")
      .select(call_function("wav_pcm", col("bytes")).as("m"))
      .select($"m.codec", $"m.n_samples", $"m.sum_s", $"m.min_s", $"m.max_s")
      .head()
    assert(row.getString(0) === "ulaw")
    assert(row.getLong(1) === ulawExpect.length.toLong)
    assert(row.getLong(2) === ulawExpect.map(_.toLong).sum)
    assert(row.getLong(3) === ulawExpect.min.toLong)
    assert(row.getLong(4) === ulawExpect.max.toLong)
    val mp3 = Seq((1L, externalMp3)).toDF("id", "bytes")
      .select(call_function("mp3_meta", col("bytes")).as("m"))
      .select($"m.frames", $"m.sample_rate", $"m.duration_ms")
      .head()
    assert(mp3.getLong(0) === 45L)
    assert(mp3.getInt(1) === 22050)
    assert(mp3.getLong(2) === 1175L)
  }

  test("externally-encoded MP3: per-frame offsets tile the file") {
    val b = externalMp3
    val arr = Mp3Header.framesRows(b)
    assert(arr !== null)
    assert(arr.numElements === 45)
    // frame 0 at the first post-ID3 byte; unpadded frames are 208
    // bytes (576/8·64000/22050 = 208.97... floored +pad), padded 209
    val r0 = arr.getStruct(0, 6)
    assert(r0.getLong(1) === 32L && r0.getInt(2) === 208)
    val r1 = arr.getStruct(1, 6)
    assert(r1.getLong(1) === 240L && r1.getInt(2) === 209)
    var end = 0L
    var i = 0
    while (i < 45) {
      val r = arr.getStruct(i, 6)
      assert(r.getInt(0) === i)
      if (i > 0) assert(r.getLong(1) === end, s"frame $i contiguous")
      end = r.getLong(1) + r.getInt(2)
      assert(r.getInt(5) === 22050)
      i += 1
    }
    assert(end === 9436L, "the walk tiles the file to its last byte")
  }
}
