package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._

import graft.fixtures.EvmFixtures
import graft.schema.{Model, Schemas}
import graft.streaming.{ChainSimSource, HttpTransport, JsonRpc, JsonRpcFetcher, RpcTransport}

/** The Ethereum JSON-RPC connector: wire-form round-trips, packed-block
  * construct→parse identity over the simulated chain, hole semantics for
  * every failure shape, and the fetcher driven over REAL HTTP against an
  * in-process node — including the DSv2 stream selecting it through the
  * `fetcher=rpc:<endpoint>` option. */
class JsonRpcSpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  /** Canonical bytes of a packed block: the node-side encoding (id 0).
    * Re-encoding an assembled block must reproduce them exactly — this
    * makes null-vs-empty byte columns compare canonically (both `0x`). */
  private def canon(pb: Model.PackedBlock): String = JsonRpc.encodeBlock(0, pb)

  /** An in-memory node over the sim chain: dispatches the three methods
    * the connector issues, serves gaps as null results. */
  private class SimNode(maxNumber: Long) {
    private val byNumber: Map[Long, Model.PackedBlock] =
      (0L to maxNumber).flatMap(n => ChainSimSource.fetchBlock(n).map(n -> _)).toMap
    private val receiptByTx: Map[String, Model.PackedTransaction] =
      byNumber.values.flatMap(_.transactions.map(pt => pt.tx.hash -> pt)).toMap

    def respond(body: String): String = {
      val req = mapper.readTree(body)
      val id = req.get("id").asLong()
      req.get("method").asText() match {
        case "eth_blockNumber" => JsonRpc.encodeHead(id, maxNumber)
        case "eth_getBlockByNumber" =>
          val n = JsonRpc.parseQuantityLong(req.get("params").get(0).asText())
          byNumber.get(n).map(JsonRpc.encodeBlock(id, _))
            .getOrElse(JsonRpc.encodeNull(id))
        case "eth_getTransactionReceipt" =>
          receiptByTx.get(req.get("params").get(0).asText())
            .map(JsonRpc.encodeReceipt(id, _))
            .getOrElse(JsonRpc.encodeNull(id))
        case other =>
          s"""{"jsonrpc":"2.0","id":$id,"error":{"code":-32601,"message":"$other"}}"""
      }
    }
  }

  test("hex wire forms round-trip (QUANTITY minimal, DATA even-length)") {
    assert(JsonRpc.quantity(BigInt(0)) === "0x0")
    assert(JsonRpc.quantity(BigInt(436)) === "0x1b4")
    assert(JsonRpc.parseQuantityLong("0x1b4") === 436L)
    val big = BigInt(2).pow(200) + 12345
    assert(JsonRpc.parseQuantity(JsonRpc.quantity(big)) === big)
    assert(JsonRpc.dataHex(null) === "0x" && JsonRpc.dataHex(Array.empty) === "0x")
    assert(JsonRpc.parseData("0x").isEmpty)
    val bytes = Array[Byte](0, 127, -128, -1)
    assert(JsonRpc.parseData(JsonRpc.dataHex(bytes)).sameElements(bytes))
    intercept[IllegalArgumentException](JsonRpc.parseQuantity("1b4"))
    intercept[IllegalArgumentException](JsonRpc.parseData("0xabc")) // odd length
  }

  test("requests are well-formed JSON-RPC 2.0") {
    val r = mapper.readTree(JsonRpc.blockByNumberRequest(7, 2003))
    assert(r.get("jsonrpc").asText() === "2.0" && r.get("id").asLong() === 7L)
    assert(r.get("method").asText() === "eth_getBlockByNumber")
    assert(r.get("params").get(0).asText() === "0x7d3" && r.get("params").get(1).asBoolean())
    val h = mapper.readTree(JsonRpc.blockNumberRequest(1))
    assert(h.get("method").asText() === "eth_blockNumber" && h.get("params").size() === 0)
  }

  test("construct→parse identity across block shapes (pack_tx.go mapping)") {
    // 1500: 0 txs, empty extradata; 1502: creations + zero-data events;
    // 7: null extradata (n%11==7); 2003: 5 txs incl. >2^127 values
    for (n <- Seq(1500L, 1502L, 7L, 2003L, 0L)) {
      val pb = ChainSimSource.fetchBlock(n).get
      val receipts = pb.transactions.map(pt =>
        pt.tx.hash -> JsonRpc.result(JsonRpc.encodeReceipt(1, pt)).get).toMap
      val assembled = JsonRpc.assemble(
        JsonRpc.result(JsonRpc.encodeBlock(1, pb)).get, receipts.get).get
      assert(canon(assembled) === canon(pb), s"block $n")
      // the computed cost survived: gasPrice*gas + value (tx.Cost())
      assembled.transactions.zip(pb.transactions).foreach { case (a, b) =>
        assert(a.tx.cost === b.tx.cost && a.tx.contract === b.tx.contract)
      }
    }
  }

  test("every failure shape degrades to a hole (ST9 retry semantics)") {
    assert(JsonRpc.result("""{"jsonrpc":"2.0","id":1,"result":null}""").isEmpty)
    assert(JsonRpc.result(
      """{"jsonrpc":"2.0","id":1,"error":{"code":-32000,"message":"x"}}""").isEmpty)
    // a block whose receipt is missing assembles to None, not a partial block
    val pb = ChainSimSource.fetchBlock(2003L).get
    val node = JsonRpc.result(JsonRpc.encodeBlock(1, pb)).get
    assert(JsonRpc.assemble(node, _ => None).isEmpty)
    // fetcher-level: malformed transport output is a hole too
    val garbage = new RpcTransport { def call(body: String) = "not json" }
    assert(JsonRpcFetcher(garbage).fetchBlock(5L).isEmpty)
  }

  test("fetcher over real HTTP against an in-process node") {
    val sim = new SimNode(maxNumber = 60)
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val resp = sim.respond(body).getBytes(UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, resp.length)
      ex.getResponseBody.write(resp)
      ex.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/"
      val fetcher = JsonRpcFetcher(HttpTransport(url))
      assert(fetcher.head() === 60L)
      assert(fetcher.fetchBlock(13L).isEmpty) // fixture gap → null result
      val got = fetcher.fetchBlock(5L).get
      assert(canon(got) === canon(ChainSimSource.fetchBlock(5L).get))

      // the DSv2 stream selects the SAME connector via fetcher=rpc:<url>:
      // packed blocks arrive over the wire, not from the built-in sim
      val root = Files.createTempDirectory("graft-rpcstream").toString
      val nums = scala.collection.mutable.ArrayBuffer.empty[Long]
      val stream = spark.readStream
        .format(classOf[ChainSimSource].getName)
        .option("blocksPerBatch", "20")
        .option("maxNumber", "60")
        .option("fetcher", s"rpc:$url")
        .load()
        .select(from_json(col("value"), Schemas.packedBlock).as("p"))
        .select("p.block.number")
      val query = stream.writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          nums ++= df.collect().map(_.getLong(0)); ()
        }.start()
      try query.processAllAvailable() finally query.stop()
      assert(nums.toSet === (0L to 60L).filterNot(EvmFixtures.isGap).toSet)
    } finally server.stop(0)
  }
}
