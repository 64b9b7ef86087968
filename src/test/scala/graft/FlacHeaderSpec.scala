package graft

import graft.pipeline.FlacHeader

/** FLAC STREAMINFO + metadata-block walk, pinned against a
  * hand-assembled byte vector (derivation in the comment) independent
  * of the SQL-side gate fixture. */
class FlacHeaderSpec extends SparkSpec {

  /** 44.1 kHz stereo 16-bit, 1,234,567 samples, zero MD5, STREAMINFO
    * only (last-flag set). Packed group bytes 10–17:
    *   b10 = 44100>>12 = 0x0A, b11 = (44100>>4)&FF = 0xC4,
    *   b12 = (44100&F)<<4 | (2−1)<<1 | (16−1)>>4 = 0x42,
    *   b13 = ((16−1)&F)<<4 | samples>>32 = 0xF0,
    *   samples 1,234,567 = 0x0012D687. */
  private val hand: Array[Byte] =
    "fLaC".getBytes ++
      Array(0x80, 0x00, 0x00, 0x22).map(_.toByte) ++
      Array(0x10, 0x00, 0x10, 0x00).map(_.toByte) ++ // block sizes 4096/4096
      Array.fill(6)(0x00.toByte) ++ // frame size bounds 0/0
      Array(0x0a, 0xc4, 0x42, 0xf0, 0x00, 0x12, 0xd6, 0x87).map(_.toByte) ++
      Array.fill(16)(0x00.toByte) // md5

  test("hand-assembled STREAMINFO parses to the spec values") {
    val m = FlacHeader.parse(hand).get
    assert(m.sampleRate === 44100 && m.channels === 2 && m.bitsPerSample === 16)
    assert(m.minBlock === 4096 && m.maxBlock === 4096)
    assert(m.totalSamples === 1234567L)
    assert(m.durationMs === 1234567L * 1000 / 44100) // 27994, integer-exact
    assert(m.nBlocks === 1 && m.md5Hex === "0" * 32)
  }

  test("metadata walk counts trailing blocks; truncated tails don't count") {
    val open = hand.clone(); open(4) = 0x00 // clear last-flag
    val tail = Array(0x84, 0x00, 0x00, 0x03, 0x41, 0x42, 0x43).map(_.toByte)
    val m = FlacHeader.parse(open ++ tail).get
    assert(m.nBlocks === 2)
    val cut = FlacHeader.parse(open ++ tail.take(5)).get
    assert(cut.nBlocks === 1) // declared 3-byte payload, only 1 present
  }

  test("marker/first-block violations are null, not errors") {
    assert(FlacHeader.parse("flaC".getBytes ++ hand.drop(4)).isEmpty)
    val wrongType = hand.clone(); wrongType(4) = 0x84.toByte // first block not STREAMINFO
    assert(FlacHeader.parse(wrongType).isEmpty)
    assert(FlacHeader.parse(hand.take(20)).isEmpty)
  }

  test("fuzz: corrupted/truncated streams never throw") {
    var x = 0xf1acL
    def next(): Long = { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; x }
    (0 until 300).foreach { trial =>
      val b = hand.clone()
      (0 until 2).foreach { _ =>
        b(((next() % b.length + b.length) % b.length).toInt) = (next() & 0xff).toByte
      }
      val cut = if ((next() & 1) == 0) b.length
        else 1 + ((next() % b.length + b.length) % b.length).toInt
      withClue(s"trial $trial") { FlacHeader.parse(b.take(cut)) }
    }
  }
}
