package graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.functions.{EvmFunctions => F, Keccak}

/** Keccak-256 against published test vectors, the derived address path,
  * and the SQL registration. */
class KeccakSpec extends SparkSpec {
  import spark.implicits._

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("keccak256 known vectors (Ethereum padding variant)") {
    // the empty-input digest every Ethereum dev knows by heart
    assert(hex(Keccak.hash256(Array.empty[Byte])) ===
      "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert(hex(Keccak.hash256("abc".getBytes(StandardCharsets.UTF_8))) ===
      "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    // multi-block input (> 136 bytes rate)
    val long = Array.fill[Byte](200)(0x61)
    assert(hex(Keccak.hash256(long)) === hex(Keccak.hash256(long))) // deterministic
    assert(Keccak.hash256(long).length === 32)
  }

  test("expression + SQL registration produce the same digest") {
    val df = Seq("abc").toDF("s").select(F.keccak256(encode(col("s"), "UTF-8")).as("h"))
    assert(hex(df.collect().head.getAs[Array[Byte]]("h")) ===
      "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    val viaSql = spark.sql("SELECT keccak256(encode('abc', 'UTF-8')) AS h").collect().head
    assert(hex(viaSql.getAs[Array[Byte]]("h")) ===
      "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
  }

  test("keccak256 projection stays inside whole-stage codegen") {
    val p = spark.range(4)
      .select(F.keccak256(encode(col("id").cast("string"), "UTF-8")).as("h"))
      .queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project"), s"expected codegen'd projection:\n$p")
    // and the codegen'd digest matches the interpreted known vector
    val h = spark.range(1).select(
      F.keccak256(encode(lit("abc"), "UTF-8")).as("h")).collect().head
    assert(hex(h.getAs[Array[Byte]]("h")) ===
      "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
  }

  test("publicKeyToAddress: known secp256k1 test vector (util.go:18-27)") {
    // The well-known private key 0x01's uncompressed public key:
    val pub = ("04" +
      "79be667ef9dcbbac55a06295ce870b07029bfcdb2dce28d959f2815b16f81798" +
      "483ada7726a3c4655da4fbfc0e1108a8fd17b448a68554199c47d08ffb10d4b8")
    val bytes = pub.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val addr = Seq(Tuple1(bytes)).toDF("pk")
      .select(F.publicKeyToAddress(col("pk")).as("a")).collect().head.getString(0)
    // address of private key 1, a standard test vector
    assert(addr === "0x7e5f4552091a69125d5dfcb7b8c2659029395bdf")
  }

  test("sigRSV splits a 65-byte signature and normalizes v") {
    val sig = Array.tabulate[Byte](65)(i => if (i == 64) 28 else i.toByte)
    val r = Seq(Tuple1(sig)).toDF("sig").select(
      F.sigR(col("sig")).as("r"), F.sigS(col("sig")).as("s"), F.sigV(col("sig")).as("v"))
      .collect().head
    assert(r.getAs[Array[Byte]]("r").toSeq === sig.slice(0, 32).toSeq)
    assert(r.getAs[Array[Byte]]("s").toSeq === sig.slice(32, 64).toSeq)
    assert(r.getAs[Int]("v") === 1)
  }
}
