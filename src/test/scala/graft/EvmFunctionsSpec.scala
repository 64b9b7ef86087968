package graft

import org.apache.spark.sql.functions._

import graft.functions.{EvmFunctions => F}

/** Golden tests for the scalar layer F1–F17 (SURVEY §2.8) — the JSON
  * shaping quirks of the reference's API output
  * (`app/data/tx.go:36-52`, `app/data/event.go:32-35`, `app/util/util.go`). */
class EvmFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): String = {
    val r = Seq(Tuple1(1)).toDF("x").select(c.cast("string").as("v")).collect().head
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("F1 hexEncode: 0x-prefix lowercase, empty and null → empty string") {
    assert(one(F.hexEncode(lit(Array[Byte](0x0a, 0x1b, -1)))) === "0x0a1bff")
    assert(one(F.hexEncode(lit(Array.empty[Byte]))) === "")
    assert(one(F.hexEncode(lit(null).cast("binary"))) === "")
  }

  test("F2 eventDataJson: 32 zero bytes suppressed to empty (event.go:33)") {
    assert(one(F.eventDataJson(lit(new Array[Byte](32)))) === "")
    assert(one(F.eventDataJson(lit(Array[Byte](0, 1)))) === "0x0001")
    assert(one(F.eventDataJson(lit(new Array[Byte](31)))) === "0x" + "00" * 31)
  }

  test("F3 hexDecode inverts hexEncode") {
    val df = Seq(Array[Byte](1, 2, 3), Array[Byte](-128, 127)).toDF("b")
    val back = df.select(F.hexDecode(F.hexEncode(col("b"))).as("r"), col("b"))
      .collect()
    back.foreach(r => assert(r.getAs[Array[Byte]]("r").toSeq === r.getAs[Array[Byte]]("b").toSeq))
  }

  test("F4 parseNumber: decimal strings parse; malformed input → null, not ANSI throw") {
    val got = Seq("12345", "0", "nope", "", "18446744073709551616")
      .toDF("s").select(F.parseNumber(col("s")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    // the reference returns an error for the last three (common.go:51-62);
    // here that is a rejectable null — a bad row must never fail the query
    assert(got.toSeq === Seq(Some(12345L), Some(0L), None, None, None))
  }

  test("F7/F8 address validation and zero-address") {
    assert(one(F.isValidAddress(lit("0x" + "aB3f" * 10))) === "true")
    assert(one(F.isValidAddress(lit("0x1234"))) === "false")
    assert(one(F.isValidAddress(lit("1234" * 11))) === "false")
    assert(one(F.isZeroAddress(lit("0x" + "0" * 40))) === "true")
    assert(one(F.isZeroAddress(lit("0x" + "0" * 39 + "1"))) === "false")
  }

  test("F9 toDecimal scales wei strings; F10 calcGasCost exact decimal string") {
    assert(one(F.toDecimal(lit("1000000000000000000"), 18)) === "1.0")
    assert(one(F.calcGasCost(lit(21000L), lit("1000000000"))) === "21000000000000")
  }

  test("F14 txJson emits contract XOR to (tx.go:42-52) with stringified numerics") {
    val creation = F.txJson(lit("0xh"), lit("0xf"), lit(""), lit("0xc"), lit("5"),
      lit(Array[Byte](1)), lit(21000L), lit("9"), lit("10"), lit(3L), lit(1), lit("0xb"))
    val normal = F.txJson(lit("0xh"), lit("0xf"), lit("0xt"), lit(""), lit("5"),
      lit(Array.empty[Byte]), lit(21000L), lit("9"), lit("10"), lit(3L), lit(1), lit("0xb"))
    val cj = one(creation)
    val nj = one(normal)
    assert(cj.contains(""""contract":"0xc"""") && !cj.contains(""""to":"""))
    assert(nj.contains(""""to":"0xt"""") && !nj.contains(""""contract":"""))
    assert(cj.contains(""""gas":"21000"""") && cj.contains(""""nonce":"3""""))
    assert(nj.contains(""""data":""""")) // empty data → empty string, key kept
  }

  test("F16/F17 similarity and topic padding") {
    assert(one(F.checkSimilarity(lit("0xAbC"), lit("0xaBc"))) === "true")
    assert(F.fillUpTopicArray(Seq("a")) === Seq("a", "", "", ""))
    assert(F.fillUpTopicArray(Seq("a", "b", "c", "d")) === Seq("a", "b", "c", "d"))
  }

  test("F5 checkRange guardrails (common.go:66-84)") {
    assert(F.checkRange(0, 99, 100))
    assert(!F.checkRange(0, 100, 100))
    assert(!F.checkRange(10, 9, 100))
  }
}
