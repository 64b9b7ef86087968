package graft

import java.math.BigInteger

import org.apache.spark.sql.functions._

import graft.functions.{EvmFunctions => F, Keccak, Rlp, Secp256k1, TxSender}

/** F13 sender recovery: RLP spec vectors, the EIP-155 worked example, and
  * self-signed round-trips through all four signer schemes, driver-side
  * and through the codegen'd ecrecover expression. */
class TxSenderSpec extends SparkSpec {
  import spark.implicits._

  private def hexStr(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  test("RLP encoding: yellow-paper appendix B vectors") {
    assert(hexStr(Rlp.encode(Rlp.Str("dog".getBytes))) === "83646f67")
    assert(hexStr(Rlp.encode(Rlp.Lst(Seq(
      Rlp.Str("cat".getBytes), Rlp.Str("dog".getBytes))))) === "c88363617483646f67")
    assert(hexStr(Rlp.encode(Rlp.Str(Array.emptyByteArray))) === "80")
    assert(hexStr(Rlp.encode(Rlp.Lst(Nil))) === "c0")
    assert(hexStr(Rlp.encode(Rlp.int(0L))) === "80")   // zero = empty string
    assert(hexStr(Rlp.encode(Rlp.int(15L))) === "0f")  // single byte < 0x80
    assert(hexStr(Rlp.encode(Rlp.int(1024L))) === "820400")
    val lorem = "Lorem ipsum dolor sit amet, consectetur adipisicing elit"
    assert(hexStr(Rlp.encode(Rlp.Str(lorem.getBytes))).startsWith("b838"))
  }

  test("EIP-155 worked example: signing hash and recovered sender") {
    // The example transaction from the EIP-155 specification text:
    // nonce 9, gasPrice 20 gwei, gas 21000, to 0x3535…35, value 10^18,
    // empty data, chainId 1, private key 0x4646…46.
    val sigHash = TxSender.sigHashEip155(chainId = 1, nonce = 9,
      gasPrice = "20000000000", gas = 21000,
      to = "0x3535353535353535353535353535353535353535",
      value = "1000000000000000000", data = Array.emptyByteArray)
    // The EIP-155 text's published signing hash begins daf5a779ae97… —
    // the full value is pinned here as a regression constant (derived
    // once from the RLP construction, which the appendix-B vectors above
    // verify independently).
    assert(hexStr(sigHash) ===
      "daf5a779ae972f972197303d7b574746c7ef83eadac0f2791ad23db92e4c8e53")

    // sign with the spec's private key (nonce k chosen by us — recovery
    // must return the key's address regardless of k)
    val d = new BigInteger("46".repeat(32), 16)
    val (r, s, recId) = Secp256k1.signWithK(sigHash, d,
      new BigInteger("1234567890deadbeef1234567890deadbeef1234567890deadbeef12345678", 16))
    val pub = Secp256k1.recover(sigHash, r, s, recId).get
    // the key's address, derived independently from d·G
    val Some((px, py)) = Secp256k1.mul(d, Secp256k1.G): @unchecked
    def pad32(v: BigInteger) = {
      val raw = v.toByteArray.dropWhile(_ == 0); Array.fill[Byte](32 - raw.length)(0) ++ raw
    }
    val expectedPub = Array(0x04.toByte) ++ pad32(px) ++ pad32(py)
    assert(hexStr(pub) === hexStr(expectedPub))
    val addr = Keccak.hash256(expectedPub.drop(1)).drop(12)
    assert("0x" + hexStr(addr) === "0x9d8a62f656a8d1615c1294fd71e9cfb3e4855a4f")
  }

  test("all four signer schemes produce distinct hashes and round-trip recovery") {
    val d = new BigInteger("1234500000000000000000000000000000000000000000000000000000012345", 16)
    val k = new BigInteger("6789600000000000000000000000000000000000000000000000000000067896", 16)
    val Some((px, py)) = Secp256k1.mul(d, Secp256k1.G): @unchecked
    val to = "0x3535353535353535353535353535353535353535"
    val al: TxSender.AccessList =
      Seq((to, Seq("0x" + "11" * 32, "0x" + "22" * 32)))
    val hashes = Seq(
      TxSender.sigHashLegacy(9, "20000000000", 21000, to, "1000", Array(1, 2)),
      TxSender.sigHashEip155(5, 9, "20000000000", 21000, to, "1000", Array(1, 2)),
      TxSender.sigHashEip2930(5, 9, "20000000000", 21000, to, "1000", Array(1, 2), al),
      TxSender.sigHashEip1559(5, 9, "1000000000", "30000000000", 21000, to, "1000", Array(1, 2), al))
    assert(hashes.map(hexStr).distinct.length === 4)
    hashes.foreach { h =>
      val (r, s, recId) = Secp256k1.signWithK(h, d, k)
      val pub = Secp256k1.recover(h, r, s, recId).get
      assert(new BigInteger(1, pub.slice(1, 33)) === px)
      assert(new BigInteger(1, pub.slice(33, 65)) === py)
    }
    // creation tx: empty `to` encodes as an empty byte string
    val creation = TxSender.sigHashEip155(1, 0, "1", 53000, "", "0", Array(0x60, 0x00))
    assert(creation.length === 32)
  }

  test("recIdOf normalizes legacy, EIP-155, and typed v values") {
    assert(TxSender.recIdOf(27) === 0)
    assert(TxSender.recIdOf(28) === 1)
    assert(TxSender.recIdOf(37, chainId = 1) === 0) // EIP-155, chainId 1
    assert(TxSender.recIdOf(38, chainId = 1) === 1)
    assert(TxSender.recIdOf(0) === 0 && TxSender.recIdOf(1) === 1) // typed
    assert(TxSender.recIdOf(29) === -1)
    assert(TxSender.recIdOf(38, chainId = 5) === -1) // wrong chain
  }

  test("recIdCol matches recIdOf on malformed v, including beyond Int range (ANSI-safe)") {
    import spark.implicits._
    val vs = Seq(27L, 28L, 37L, 38L, 0L, 3L, 29L, 34L, -5L,
      5_000_000_000L, Long.MaxValue)
    val got = vs.toDF("v")
      .select(TxSender.recIdCol(col("v"), lit(1L)).as("rid"))
      .collect().map(_.getInt(0)).toSeq
    assert(got === vs.map(TxSender.recIdOf(_, chainId = 1L)))
  }

  test("vectorized recovery: 100 random keys round-trip through the column path") {
    val rng = new scala.util.Random(31)
    def pad32(v: BigInteger) = {
      val raw = v.toByteArray.dropWhile(_ == 0); Array.fill[Byte](32 - raw.length)(0) ++ raw
    }
    val rows = (1 to 100).map { i =>
      val d = new BigInteger(250, rng.self).add(BigInteger.ONE)
      val k = new BigInteger(250, rng.self).add(BigInteger.TWO)
      val h = new Array[Byte](32); rng.nextBytes(h)
      val (r, s, recId) = Secp256k1.signWithK(h, d, k)
      val Some((px, py)) = Secp256k1.mul(d, Secp256k1.G): @unchecked
      val expected = "0x" + hexStr(
        Keccak.hash256(pad32(px) ++ pad32(py)).drop(12))
      // raw v in mixed conventions: legacy for even i, EIP-155 chain 1 odd
      val rawV = if (i % 2 == 0) 27L + recId else 35L + 2L + recId
      val chain = if (i % 2 == 0) 0L else 1L
      (h, pad32(r), pad32(s), rawV, chain, expected)
    }
    val df = rows.toDF("h", "r", "s", "v", "chain", "expected")
    val bad = df.select(
      TxSender.senderAddress(col("h"), col("r"), col("s"),
        TxSender.recIdCol(col("v"), col("chain"))).as("sender"),
      col("expected"))
      .filter(col("sender") =!= col("expected")).count()
    assert(bad === 0L)
  }

  test("ecrecover expression: codegen'd column path recovers the sender address") {
    val d = new BigInteger("46".repeat(32), 16)
    val sigHash = TxSender.sigHashEip155(1, 9, "20000000000", 21000,
      "0x3535353535353535353535353535353535353535", "1000000000000000000",
      Array.emptyByteArray)
    val (r, s, recId) = Secp256k1.signWithK(sigHash, d,
      new BigInteger("77777777777777777777777777777777", 16))
    def pad32(v: BigInteger) = {
      val raw = v.toByteArray.dropWhile(_ == 0); Array.fill[Byte](32 - raw.length)(0) ++ raw
    }
    val df = Seq((sigHash, pad32(r), pad32(s), recId)).toDF("h", "r", "s", "v")
    val addr = df.select(
      TxSender.senderAddress(col("h"), col("r"), col("s"), col("v")).as("sender"))
      .collect().head.getString(0)
    assert(addr === "0x9d8a62f656a8d1615c1294fd71e9cfb3e4855a4f")
    // SQL path + invalid signature → null
    val viaSql = df.selectExpr("ecrecover(h, r, s, v) AS pub",
      "ecrecover(h, r, s, 3) AS bad").collect().head
    assert(!viaSql.isNullAt(0))
    assert(viaSql.isNullAt(1)) // recId 3: r + n exceeds the field prime
  }
}
