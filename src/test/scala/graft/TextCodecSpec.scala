package graft

import org.apache.spark.sql.functions._

import graft.pipeline.TextCodec

/** Gzip text codec: round-trip, the multi-member WARC layout, corruption
  * rejection, an external (python zlib) vector pinning cross-ecosystem
  * compatibility, and in-plan execution through the registered SQL
  * functions. */
class TextCodecSpec extends SparkSpec {
  import spark.implicits._

  test("round-trip: text → gzip → text, including empty and unicode") {
    val texts = Seq("", "a", "hello world", "ünïcødé — 東京 🚀",
      "x" * 100000)
    texts.foreach { t =>
      val bytes = TextCodec.gzipBytes(t.getBytes("UTF-8"))
      assert(new String(TextCodec.gunzipBytes(bytes), "UTF-8") === t)
    }
  }

  test("external vector: python-zlib bytes (mtime 0) decode exactly") {
    val v = Array(0x1f, 0x8b, 0x08, 0x00, 0x00, 0x00, 0x00, 0x00, 0x02, 0xff,
      0xcb, 0x48, 0xcd, 0xc9, 0xc9, 0x57, 0x48, 0xaf, 0xca, 0x2c, 0x50, 0x28,
      0xcf, 0x2f, 0xca, 0x49, 0x01, 0x00, 0x6b, 0x7d, 0xe8, 0xb7, 0x10, 0x00,
      0x00, 0x00).map(_.toByte)
    assert(new String(TextCodec.gunzipBytes(v), "UTF-8") === "hello gzip world")
  }

  test("concatenated members decode to the concatenation (WARC layout)") {
    val a = TextCodec.gzipBytes("first record ".getBytes("UTF-8"))
    val b = TextCodec.gzipBytes("second record".getBytes("UTF-8"))
    val got = new String(TextCodec.gunzipBytes(a ++ b), "UTF-8")
    assert(got === "first record second record")
  }

  test("corruption rejected whole: bad CRC, truncation, wrong magic → null") {
    val good = TextCodec.gzipBytes("some payload to corrupt".getBytes("UTF-8"))
    val badCrc = good.clone()
    badCrc(badCrc.length - 5) = (badCrc(badCrc.length - 5) ^ 0x7f).toByte
    assert(TextCodec.gunzipBytes(badCrc) === null)
    assert(TextCodec.gunzipBytes(good.take(good.length - 4)) === null)
    assert(TextCodec.gunzipBytes("not gzip at all".getBytes("UTF-8")) === null)
    assert(TextCodec.gunzipBytes(Array[Byte](0x1f, 0x8b.toByte)) === null)
    // bad ISIZE with a good CRC: the length word is verified too
    val badLen = good.clone()
    badLen(badLen.length - 1) = (badLen(badLen.length - 1) ^ 0x01).toByte
    assert(TextCodec.gunzipBytes(badLen) === null)
  }

  test("NO silent partial text: garbage or truncation AFTER a valid " +
      "member rejects the whole value") {
    // the JDK's GZIPInputStream treats a malformed second-member header
    // as end-of-stream and would return the first member's text — a
    // silently partial corpus document; the hand framer must refuse
    val good = TextCodec.gzipBytes("first member".getBytes("UTF-8"))
    assert(TextCodec.gunzipBytes(good ++ "JUNK TRAILING".getBytes) === null)
    val second = TextCodec.gzipBytes("second member".getBytes("UTF-8"))
    assert(TextCodec.gunzipBytes(good ++ second.take(7)) === null)
    assert(TextCodec.gunzipBytes(good ++ Array[Byte](0x1f, 0x8b.toByte)) === null)
    // and the clean two-member stream still decodes (control)
    assert(new String(TextCodec.gunzipBytes(good ++ second), "UTF-8")
      === "first membersecond member")
  }

  test("header fields framed correctly: FNAME/FCOMMENT/FEXTRA/FHCRC members decode") {
    // python can emit FNAME-bearing members; construct one by hand from
    // a known-good stream: set FNAME and splice a name after the header
    val base = TextCodec.gzipBytes("named payload".getBytes("UTF-8"))
    val withName = Array.concat(
      base.take(3), Array((base(3) | 8).toByte), base.slice(4, 10),
      "file.txt".getBytes("ISO-8859-1") :+ 0.toByte, base.drop(10))
    assert(new String(TextCodec.gunzipBytes(withName), "UTF-8") === "named payload")
    // FEXTRA: 4-byte payload, little-endian length
    val withExtra = Array.concat(
      base.take(3), Array((base(3) | 4).toByte), base.slice(4, 10),
      Array[Byte](4, 0, 9, 9, 9, 9), base.drop(10))
    assert(new String(TextCodec.gunzipBytes(withExtra), "UTF-8") === "named payload")
    // reserved FLG bits are refused
    val badFlg = Array.concat(base.take(3), Array(0x80.toByte), base.drop(4))
    assert(TextCodec.gunzipBytes(badFlg) === null)
  }

  test("fuzz: single-byte corruption anywhere never throws and never " +
      "yields wrong text — null or the exact original only") {
    val text = "fuzz target payload with some length to it " * 3
    val good = TextCodec.gzipBytes(text.getBytes("UTF-8"))
    val rnd = new scala.util.Random(42)
    var nulls = 0
    (1 to 400).foreach { _ =>
      val pos = rnd.nextInt(good.length)
      val mutated = good.clone()
      mutated(pos) = (mutated(pos) ^ (1 << rnd.nextInt(8))).toByte
      val out = TextCodec.gunzipBytes(mutated) // must not throw
      if (out == null) nulls += 1
      else assert(new String(out, "UTF-8") === text,
        s"corruption at $pos decoded to WRONG text")
    }
    // most flips land in deflate data or the trailer and must reject
    assert(nulls > 300, s"only $nulls/400 corruptions rejected")
    // truncation at every length: never throws, never wrong
    (0 until good.length).foreach { len =>
      val out = TextCodec.gunzipBytes(good.take(len))
      assert(out == null || new String(out, "UTF-8") === text)
    }
  }

  test("bomb guard: output cap rejects during inflation, not after") {
    // 8 MiB of zeros compresses to ~8 KiB; a 4 KiB cap must reject it
    // (return null) instead of inflating the whole payload first
    val big = new Array[Byte](8 << 20)
    val bomb = TextCodec.gzipBytes(big)
    assert(bomb.length < (64 << 10))
    assert(TextCodec.gunzipBytes(bomb, maxOut = 4096L) === null)
    // under the cap the same member decodes fine
    assert(TextCodec.gunzipBytes(bomb, maxOut = 16L << 20).length === big.length)
    // the default cap still accepts ordinary documents
    assert(new String(TextCodec.gunzipBytes(
      TextCodec.gzipBytes("ordinary".getBytes("UTF-8"))), "UTF-8") === "ordinary")
  }

  test("in-plan through the registered SQL functions, inside codegen") {
    val df = spark.range(2)
      .select(col("id"), concat(lit("text-"), col("id")).as("text"))
      .select(col("id"),
        call_function("gunzip_text",
          call_function("gzip_text", col("text"))).as("rt"),
        call_function("gunzip_text",
          call_function("gzip_text", col("text")).substr(lit(1), lit(9))).as("bad"))
    val rows = df.orderBy("id").collect()
    assert(rows.map(_.getString(1)).toSeq === Seq("text-0", "text-1"))
    assert(rows.forall(_.isNullAt(2)))
    // '*(n)' prefixes mark WholeStageCodegen spans in the plan rendering
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"codegen lost:\n$plan")
  }
}
