package graft.pipeline

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** MPEG-1 Layer III TRANSFORM-SAMPLE decode, part 1 of 2: the entropy
  * layer — side info, scalefactors, and Huffman big-values/count1 decode
  * down to the per-granule SPECTRAL LINES `is[0..575]` (ISO/IEC 11172-3
  * §2.4.1.7, §2.4.2.7, §2.4.3.4). This is the half of MP3 sample
  * reconstruction that was previously the documented stub boundary:
  * [[Mp3Header]] stops at the frame headers; this module decodes the
  * compressed payload bits into quantized spectral coefficients. The
  * remaining stub is the numeric back half only — requantization
  * (is^(4/3) scaling), alias reduction, IMDCT, and the polyphase
  * synthesis filterbank.
  *
  * Decode contract (the GIF pattern: hand-written encoder half,
  * independent decoder half, coefficient-exact oracle):
  *   - scope: MPEG-1 Layer III, 44.1 kHz, mono, long blocks
  *     (`windows_switching_flag = 0`), `main_data_begin = 0` (no bit
  *     reservoir), big-value Huffman tables 0–3 and count1 tables A/B —
  *     the non-escape subset of ISO 11172-3 Table B.7; streams selecting
  *     the linbits escape tables (16–31) or short blocks return NULL
  *   - side info (§2.4.1.7, 17 bytes mono): part2_3_length, big_values,
  *     global_gain, scalefac_compress, table_select×3, region counts,
  *     preflag, scalefac_scale, count1table_select — all surfaced
  *   - scalefactors (§2.4.2.7): 21 long-block bands, bands 0–10 at
  *     slen1 bits and 11–20 at slen2 per the public scalefac_compress
  *     table; scfsi honored per group (a set bit copies granule 0's
  *     bands into granule 1)
  *   - Huffman (§2.4.3.4.6): big-value PAIRS region-switched at the
  *     scalefactor-band boundaries sfb[region0_count+1] and
  *     sfb[region0_count+region1_count+2] (44.1 kHz long-block table,
  *     ISO 11172-3 Table B.8), one sign bit per nonzero value (1 =
  *     negative); then count1 QUADS until part2_3_length is exhausted;
  *     a decode that does not land EXACTLY on part2_3_length is
  *     malformed → NULL (the identity gate's strongest pin: every
  *     Huffman code length must be right for the bit count to close)
  *   - every embedded Huffman table is a COMPLETE prefix code (Kraft sum
  *     = 1), spec-asserted programmatically in Mp3L3Spec — a
  *     misremembered table entry cannot hide
  *
  * The surfaced spectral stats are integer-exact functionals that pin
  * every coefficient and its POSITION: nonzero count, signed sum, and
  * the position-weighted sum Σ (i+1)·is[i] — two different decoded
  * streams cannot collide on all three without decoding identically.
  *
  * Scale: one narrow codegen'd expression per row; bytes never leave
  * the task, nothing shuffles.
  */
object Mp3L3 {

  // ==== public ISO data ===================================================

  /** ISO 11172-3 Table B.8: 44.1 kHz MPEG-1 long-block scalefactor band
    * boundaries in spectral lines (22 bands, boundary 22 = 576). */
  val Sfb44100: Array[Int] = Array(
    0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62,
    74, 90, 110, 134, 162, 196, 238, 288, 342, 418, 576)

  /** §2.4.2.7: scalefac_compress → (slen1, slen2). */
  val Slen: Array[(Int, Int)] = Array(
    (0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
    (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3))

  /** One big-value Huffman table: max value per axis, then (hlen, hcod)
    * indexed by `x·(max+1)+y`. Tables 0–3 of ISO 11172-3 Table B.7 (the
    * non-escape, no-linbits subset). Table 0 codes nothing (all-zero
    * region, zero bits). */
  final case class BvTable(maxV: Int, hlen: Array[Int], hcod: Array[Int])

  val BvTables: Map[Int, BvTable] = Map(
    0 -> BvTable(0, Array(0), Array(0)),
    1 -> BvTable(1,
      Array(1, 3, 2, 3),
      Array(1, 1, 1, 0)),
    2 -> BvTable(2,
      Array(1, 3, 6, 3, 3, 5, 5, 5, 6),
      Array(1, 2, 1, 3, 1, 1, 3, 2, 0)),
    3 -> BvTable(2,
      Array(2, 2, 6, 3, 2, 5, 5, 5, 6),
      Array(3, 2, 1, 1, 1, 1, 3, 2, 0)))

  /** Count1 table A (§2.4.3.4.6, quads indexed v·8+w·4+x·2+y). */
  val Cnt1ALen: Array[Int] = Array(1, 4, 4, 5, 4, 6, 5, 6, 4, 5, 5, 6, 5, 6, 6, 6)
  val Cnt1ACod: Array[Int] = Array(1, 5, 4, 5, 6, 5, 4, 4, 7, 3, 6, 0, 7, 2, 3, 1)

  /** Count1 table B: every quad at 4 bits, code = bitwise complement of
    * the quad index. */
  def cnt1BLen(i: Int): Int = 4
  def cnt1BCod(i: Int): Int = (~i) & 0xf
  val Cnt1BLenArr: Array[Int] = Array.fill(16)(4)
  val Cnt1BCodArr: Array[Int] = Array.tabulate(16)(cnt1BCod)

  // ==== bit-level plumbing ================================================

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    var bitCount: Long = 0
    def u(v: Int, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1)
        nBits += 1
        bitCount += 1
        if (nBits == 8) { out.write(cur); cur = 0; nBits = 0 }
        i -= 1
      }
    }
    /** Zero-pad to a byte boundary and return the bytes. */
    def align(): Array[Byte] = {
      if (nBits != 0) { cur <<= (8 - nBits); out.write(cur); cur = 0; nBits = 0 }
      out.toByteArray
    }
  }

  private final class BitReader(b: Array[Byte], startBit: Long) {
    var pos: Long = startBit
    def u(bits: Int): Int = {
      var v = 0
      var i = 0
      while (i < bits) {
        if (pos >= b.length.toLong * 8) throw new IllegalArgumentException("eof")
        v = (v << 1) | ((b((pos >> 3).toInt) >> (7 - (pos & 7).toInt)) & 1)
        pos += 1
        i += 1
      }
      v
    }
  }

  // ==== the encoder half ==================================================

  /** Per-granule construction parameters, doc_id-derived — the closed
    * forms the DuckDB oracle replays. Values exercise all three regions,
    * all four embedded big-value tables, both count1 tables, and every
    * scalefactor bit width as `seed` varies. */
  final case class GranParams(seed: Long, g: Int) {
    val bigValues: Int = 18 + ((seed + g) % 11).toInt   // 18..28 pairs
    val region0Count: Int = 3 + ((seed + g) % 4).toInt  // sfb 0..r0+1
    val region1Count: Int = 3
    def tableSelect(r: Int): Int = ((seed + g + r) % 3).toInt + 1
    val count1Table: Int = ((seed + g) % 2).toInt       // 0 = A, 1 = B
    val nQuads: Int = 4 + ((seed + g) % 4).toInt        // 4..7 quads
    val scalefacCompress: Int = ((seed + g) % 16).toInt
    val globalGain: Int = (seed % 64).toInt + 100
    val preflag: Int = (seed % 2).toInt
    val scalefacScale: Int = ((seed >> 1) % 2).toInt
    def slen: (Int, Int) = Slen(scalefacCompress)
    def scalefac(band: Int): Int = {
      val s = if (band < 11) slen._1 else slen._2
      if (s == 0) 0 else ((seed + band + g) % (1L << s)).toInt
    }
    /** Region boundaries in lines (clamped by the big-value extent). */
    def b1: Int = Sfb44100(region0Count + 1)
    def b2: Int = Sfb44100(region0Count + region1Count + 2)
    def tableForLine(l: Int): Int =
      if (l < b1) tableSelect(0) else if (l < b2) tableSelect(1) else tableSelect(2)
    /** Big-value pair i → (x, y) SIGNED, magnitudes within the region
      * table's range. */
    def pair(i: Int): (Int, Int) = {
      val t = BvTables(tableForLine(2 * i))
      // signs cycle at period 3 against period-2/3 magnitudes, so both
      // sign polarities occur for every magnitude as the seed varies
      val mx = (seed + g + i) % (t.maxV + 1)
      val my = (seed + g + i + 1) % (t.maxV + 1)
      val sx = if ((seed + i) % 3 == 0) 1 else -1
      val sy = if ((seed + i + 1) % 3 == 0) 1 else -1
      (sx * mx.toInt, sy * my.toInt)
    }
    /** Count1 quad j → (v, w, x, y) SIGNED, magnitudes 0/1. */
    def quad(j: Int): (Int, Int, Int, Int) = {
      def m(k: Long) = (k % 2).toInt
      def s(k: Long) = if (k % 3 == 0) 1 else -1
      (s(seed + j) * m(seed + j), s(seed + j + 1) * m(seed + j + 1),
        s(seed + j + g) * m(seed + j + g), s(seed + j + g + 1) * m(seed + j + g + 1))
    }
  }

  private val BitrateKbps = Array(160, 192, 224, 256, 320) // indices 10..14

  /** Deterministic single-frame MPEG-1 Layer III mono stream for `seed`:
    * 4-byte header (44.1 kHz, bitrate index 10 + seed%5), 17-byte side
    * info, then the two granules' scalefactor + Huffman main data,
    * zero-padded to the frame length. */
  def gen(seed: Long): Array[Byte] = {
    val d = if (seed < 0) -seed else seed
    val biIdx = (d % 5).toInt
    val kbps = BitrateKbps(biIdx)
    val frameLen = 144 * kbps * 1000 / 44100 // padding bit 0
    val g0 = GranParams(d, 0)
    val g1 = GranParams(d, 1)

    // main data first (two-pass: side info needs part2_3_length)
    val main = new BitWriter
    val p23 = Array(g0, g1).map { p =>
      val before = main.bitCount
      // scalefactors: 21 long-block bands
      var band = 0
      while (band < 21) {
        val s = if (band < 11) p.slen._1 else p.slen._2
        if (s > 0) main.u(p.scalefac(band), s)
        band += 1
      }
      // big-value pairs
      var i = 0
      while (i < p.bigValues) {
        val t = BvTables(p.tableForLine(2 * i))
        val (x, y) = p.pair(i)
        val ax = math.abs(x); val ay = math.abs(y)
        val idx = ax * (t.maxV + 1) + ay
        if (t.hlen(idx) > 0) main.u(t.hcod(idx), t.hlen(idx))
        if (ax != 0) main.u(if (x < 0) 1 else 0, 1)
        if (ay != 0) main.u(if (y < 0) 1 else 0, 1)
        i += 1
      }
      // count1 quads
      var j = 0
      while (j < p.nQuads) {
        val (v, w, x, y) = p.quad(j)
        val idx = math.abs(v) * 8 + math.abs(w) * 4 + math.abs(x) * 2 + math.abs(y)
        if (p.count1Table == 0) main.u(Cnt1ACod(idx), Cnt1ALen(idx))
        else main.u(cnt1BCod(idx), cnt1BLen(idx))
        Seq(v, w, x, y).foreach(s => if (s != 0) main.u(if (s < 0) 1 else 0, 1))
        j += 1
      }
      (main.bitCount - before).toInt
    }
    val mainBytes = main.align()

    val out = new BitWriter
    // header: sync, MPEG-1 (11), Layer III (01), no CRC (1)
    out.u(0xff, 8); out.u(0xfb, 8)
    out.u(10 + biIdx, 4); out.u(0, 2) /* 44.1 kHz */ ; out.u(0, 1); out.u(0, 1)
    out.u(3, 2) /* mono */ ; out.u(0, 2); out.u(0, 1); out.u(0, 1); out.u(0, 2)
    // side info, mono: main_data_begin 9, private 5, scfsi 4
    out.u(0, 9); out.u(0, 5); out.u(0, 4)
    Seq(g0, g1).zip(p23).foreach { case (p, len) =>
      out.u(len, 12)
      out.u(p.bigValues, 9)
      out.u(p.globalGain, 8)
      out.u(p.scalefacCompress, 4)
      out.u(0, 1) // windows_switching_flag: long blocks
      out.u(p.tableSelect(0), 5); out.u(p.tableSelect(1), 5); out.u(p.tableSelect(2), 5)
      out.u(p.region0Count, 4)
      out.u(p.region1Count, 3)
      out.u(p.preflag, 1)
      out.u(p.scalefacScale, 1)
      out.u(p.count1Table, 1)
    }
    val head = out.align()
    val full = new Array[Byte](frameLen)
    System.arraycopy(head, 0, full, 0, head.length)
    System.arraycopy(mainBytes, 0, full, head.length,
      math.min(mainBytes.length, frameLen - head.length))
    full
  }

  // ==== the decoder half ==================================================

  /** Decoded per-granule spectral state. */
  final case class Granule(part23Length: Int, bigValues: Int, globalGain: Int,
      scalefacCompress: Int, tableSelect: Array[Int], region0Count: Int,
      region1Count: Int, preflag: Int, scalefacScale: Int, count1Table: Int,
      scalefacs: Array[Int], is: Array[Int], count1Quads: Int, bitsUsed: Int)

  final case class L3Decoded(sampleRate: Int, bitrateKbps: Int,
      granules: Array[Granule])

  /** Prefix-decode one symbol from (hlen, hcod) arrays. Returns the
    * symbol index; throws on a code that matches nothing within the
    * table's maximum length (malformed stream). */
  private def huffDecode(r: BitReader, hlen: Array[Int], hcod: Array[Int]): Int = {
    var code = 0
    var len = 0
    val maxLen = { var m = 0; var i = 0; while (i < hlen.length) { if (hlen(i) > m) m = hlen(i); i += 1 }; m }
    while (len < maxLen || maxLen == 0) {
      if (maxLen == 0) return 0 // table 0: zero bits, symbol (0,0)
      code = (code << 1) | r.u(1)
      len += 1
      var i = 0
      while (i < hlen.length) {
        if (hlen(i) == len && hcod(i) == code) return i
        i += 1
      }
    }
    throw new IllegalArgumentException("bad huffman code")
  }

  /** Decode one frame's two granules to spectral lines. None when the
    * stream is outside the supported scope (non-MPEG1/L3/44.1/mono,
    * short blocks, escape tables, bit reservoir) or malformed (a granule
    * that does not consume exactly part2_3_length bits). */
  def decode(b: Array[Byte]): Option[L3Decoded] = {
    try {
      if (b == null || b.length < 21) return None
      // header: accept exactly the supported shape
      if ((b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xfb) return None
      val biIdx = (b(2) >> 4) & 15
      if (biIdx < 1 || biIdx > 14) return None
      val kbps = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)(biIdx)
      if (((b(2) >> 2) & 3) != 0) return None // 44.1 kHz only
      if (((b(3) >> 6) & 3) != 3) return None // mono only
      val r = new BitReader(b, 32)
      val mainDataBegin = r.u(9)
      if (mainDataBegin != 0) return None // bit reservoir unsupported
      r.u(5) // private_bits
      val scfsi = Array.fill(4)(r.u(1))
      final case class Side(p23: Int, bv: Int, gg: Int, sc: Int, ts: Array[Int],
          r0: Int, r1: Int, pre: Int, sfs: Int, c1t: Int)
      val sides = (0 until 2).map { _ =>
        val p23 = r.u(12)
        val bv = r.u(9)
        val gg = r.u(8)
        val sc = r.u(4)
        if (r.u(1) != 0) return None // short/mixed blocks unsupported
        val ts = Array(r.u(5), r.u(5), r.u(5))
        if (ts.exists(t => !BvTables.contains(t))) return None // escape tables
        val r0 = r.u(4)
        val r1 = r.u(3)
        if (r0 + r1 + 2 >= Sfb44100.length) return None
        val pre = r.u(1)
        val sfs = r.u(1)
        val c1t = r.u(1)
        Side(p23, bv, gg, sc, ts, r0, r1, pre, sfs, c1t)
      }
      // main data starts right after the 17-byte side info (no reservoir)
      val main = new BitReader(b, (4 + 17).toLong * 8)
      var g0Scalefacs: Array[Int] = null
      val granules = sides.zipWithIndex.map { case (s, g) =>
        val start = main.pos
        val (slen1, slen2) = Slen(s.sc)
        val sf = new Array[Int](21)
        var band = 0
        while (band < 21) {
          val slen = if (band < 11) slen1 else slen2
          // scfsi groups (§2.4.2.7): 0–5, 6–10, 11–15, 16–20; a set bit
          // means granule 1 reuses granule 0's scalefactors, no bits read
          val group = if (band < 6) 0 else if (band < 11) 1 else if (band < 16) 2 else 3
          if (g == 1 && scfsi(group) == 1) sf(band) = g0Scalefacs(band)
          else if (slen > 0) sf(band) = main.u(slen)
          band += 1
        }
        if (g == 0) g0Scalefacs = sf
        val is = new Array[Int](576)
        val b1 = Sfb44100(s.r0 + 1)
        val b2 = Sfb44100(s.r0 + s.r1 + 2)
        var line = 0
        while (line < 2 * s.bv) {
          val t = BvTables(
            if (line < b1) s.ts(0) else if (line < b2) s.ts(1) else s.ts(2))
          val sym = huffDecode(main, t.hlen, t.hcod)
          var x = sym / (t.maxV + 1)
          var y = sym % (t.maxV + 1)
          if (x != 0 && main.u(1) == 1) x = -x
          if (y != 0 && main.u(1) == 1) y = -y
          if (line + 1 >= 576) return None
          is(line) = x; is(line + 1) = y
          line += 2
        }
        // count1: quads until part2_3_length is exhausted
        var quads = 0
        while (main.pos - start < s.p23 && line + 3 < 576) {
          val idx =
            if (s.c1t == 0) huffDecode(main, Cnt1ALen, Cnt1ACod)
            else huffDecode(main, Cnt1BLenArr, Cnt1BCodArr)
          var k = 0
          while (k < 4) {
            var v = (idx >> (3 - k)) & 1
            if (v != 0 && main.u(1) == 1) v = -v
            is(line + k) = v
            k += 1
          }
          line += 4
          quads += 1
        }
        val used = (main.pos - start).toInt
        if (used != s.p23) return None // must land EXACTLY on the bit count
        Granule(s.p23, s.bv, s.gg, s.sc, s.ts, s.r0, s.r1, s.pre, s.sfs,
          s.c1t, sf, is, quads, used)
      }
      Some(L3Decoded(44100, kbps, granules.toArray))
    } catch { case _: IllegalArgumentException | _: ArrayIndexOutOfBoundsException => None }
  }

  // ==== Catalyst surface ==================================================

  /** `mp3l3_gen(seed)`: deterministic single-frame Layer III stream. */
  case class Mp3L3GenExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"mp3l3_gen requires an integral seed, got ${t.catalogString}")
    }
    override def nullSafeEval(input: Any): Any = input match {
      case l: java.lang.Long => Mp3L3.gen(l)
      case i: java.lang.Integer => Mp3L3.gen(i.toLong)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.pipeline.Mp3L3.gen((long) $c);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "mp3l3_gen"
  }

  /** The integer-exact spectral functionals surfaced per granule. */
  def spectralRow(b: Array[Byte]): InternalRow = decode(b) match {
    case None => null
    case Some(d) =>
      def stats(g: Granule): Seq[Any] = {
        var nz = 0L; var sum = 0L; var wsum = 0L
        var i = 0
        while (i < 576) {
          val v = g.is(i)
          if (v != 0) nz += 1
          sum += v
          wsum += (i + 1).toLong * v
          i += 1
        }
        var sfw = 0L
        var band = 0
        while (band < 21) { sfw += (band + 1).toLong * g.scalefacs(band); band += 1 }
        Seq(g.part23Length.toLong, g.bigValues.toLong, g.globalGain.toLong,
          g.scalefacCompress.toLong, g.region0Count.toLong, g.region1Count.toLong,
          g.tableSelect(0).toLong, g.tableSelect(1).toLong, g.tableSelect(2).toLong,
          g.count1Table.toLong, g.preflag.toLong, g.scalefacScale.toLong,
          sfw, nz, sum, wsum, g.count1Quads.toLong)
      }
      InternalRow.fromSeq(
        Seq(d.sampleRate.toLong, d.bitrateKbps.toLong) ++
          stats(d.granules(0)) ++ stats(d.granules(1)))
  }

  private def granFields(p: String): Seq[StructField] = Seq(
    StructField(s"${p}_part2_3_length", LongType),
    StructField(s"${p}_big_values", LongType),
    StructField(s"${p}_global_gain", LongType),
    StructField(s"${p}_scalefac_compress", LongType),
    StructField(s"${p}_region0_count", LongType),
    StructField(s"${p}_region1_count", LongType),
    StructField(s"${p}_table0", LongType),
    StructField(s"${p}_table1", LongType),
    StructField(s"${p}_table2", LongType),
    StructField(s"${p}_count1_table", LongType),
    StructField(s"${p}_preflag", LongType),
    StructField(s"${p}_scalefac_scale", LongType),
    StructField(s"${p}_sf_wsum", LongType),
    StructField(s"${p}_spec_nonzero", LongType),
    StructField(s"${p}_spec_sum", LongType),
    StructField(s"${p}_spec_wsum", LongType),
    StructField(s"${p}_count1_quads", LongType))

  val SpectralSchema: StructType = StructType(
    Seq(StructField("sample_rate", LongType), StructField("bitrate_kbps", LongType))
      ++ granFields("g0") ++ granFields("g1"))

  /** `mp3l3_spectral(bytes)`: side-info fields + integer-exact spectral
    * functionals of both granules, NULL outside the supported scope or
    * on any malformed stream. */
  case class Mp3L3SpectralExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = SpectralSchema
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"mp3l3_spectral requires binary input, got ${child.dataType.catalogString}")
    override def nullSafeEval(input: Any): Any =
      Mp3L3.spectralRow(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |${ev.value} = graft.pipeline.Mp3L3.spectralRow($c);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin
      })
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "mp3l3_spectral"
  }
}
