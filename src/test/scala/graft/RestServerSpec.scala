package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import com.fasterxml.jackson.databind.ObjectMapper

import graft.api.{QueryService, RestServer}
import graft.fixtures.EvmFixtures
import graft.queries.EvmQueries

/** End-to-end HTTP: the server is started on an ephemeral port and driven
  * with `java.net.http.HttpClient` — route grammar, dispatch order, status
  * codes, and document shapes all asserted over the wire, mirroring
  * `app/rest/rest.go:59-758`. */
class RestServerSpec extends SparkSpec with org.scalatest.BeforeAndAfterAll {

  private lazy val svc = new QueryService(
    EvmQueries.blocks(spark), EvmQueries.txs(spark), EvmQueries.events(spark))

  private lazy val server = {
    val s = new RestServer(svc, () => RestServer.SyncStatus(
      latestBlockNumber = 2999, blockCountInDB = 2969,
      processed = 2969, elapsedSeconds = 120.0, state = "syncing"))
    s.start()
    s
  }

  private lazy val client = HttpClient.newHttpClient()
  private val mapper = new ObjectMapper()

  private def get(pathAndQuery: String): (Int, String) = {
    val req = HttpRequest.newBuilder(
      URI.create(s"http://127.0.0.1:${server.boundPort}$pathAndQuery")).GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  override def afterAll(): Unit = {
    try server.stop() finally super.afterAll()
  }

  test("/v1/block single-by-hash returns the reference's exact document bytes") {
    val b = EvmFixtures.buildBlock(1500, EvmFixtures.txCount(1500L))
    val (code, body) = get(s"/v1/block?hash=${b.hash}")
    assert(code === 200)
    val expected = String.format(java.util.Locale.US,
      "{\"hash\":\"%s\",\"number\":%d,\"time\":%d,\"parentHash\":\"%s\"," +
        "\"difficulty\":\"%s\",\"gasUsed\":%d,\"gasLimit\":%d,\"nonce\":\"%s\"," +
        "\"miner\":\"%s\",\"size\":%f,\"stateRootHash\":\"%s\",\"uncleHash\":\"%s\"," +
        "\"txRootHash\":\"%s\",\"receiptRootHash\":\"%s\",\"extraData\":\"%s\"}",
      b.hash, Long.box(b.number), Long.box(b.time), b.parenthash, b.difficulty,
      Long.box(b.gasused), Long.box(b.gaslimit), b.nonce, b.miner,
      Double.box(b.size), b.stateroothash, b.unclehash, b.txroothash,
      b.receiptroothash,
      "") // 1500 % 5 == 0 → empty extradata → "" (block.go:38-41)
    assert(body === expected)
  }

  test("/v1/block dispatch order and wrappers (rest.go:93-225)") {
    // hash + tx=yes wins over single-block: transactions wrapper
    val (c1, b1) = get(s"/v1/block?hash=${EvmFixtures.blockHash(2003)}&tx=yes")
    assert(c1 === 200)
    val txs = mapper.readTree(b1).get("transactions")
    assert(txs != null && txs.size() === EvmFixtures.txCount(2003L))

    // number + tx=yes: same set through the scalar-subquery plan
    val (c2, b2) = get("/v1/block?number=2003&tx=yes")
    assert(c2 === 200 && mapper.readTree(b2).get("transactions").size() === txs.size())

    // number range: wrapped blocks, width-capped
    val (c3, b3) = get("/v1/block?fromBlock=1000&toBlock=1099")
    assert(c3 === 200)
    // 1013 is a fixture gap (1013 % 97 == 43? no — use the real gap rule)
    val expectedBlocks = (1000L to 1099L).count(!EvmFixtures.isGap(_))
    assert(mapper.readTree(b3).get("blocks").size() === expectedBlocks)

    // width violation and parse failure → the arm's 400 message
    assert(get("/v1/block?fromBlock=0&toBlock=100") ===
      (400, """{"msg":"Bad block number range"}"""))
    assert(get("/v1/block?number=abc") === (400, """{"msg":"Bad block number"}"""))
    // a gap number → 404, empty params → 400
    assert(get("/v1/block?number=13")._1 === 404)
    assert(get("/v1/block") === (400, """{"msg":"Bad query param(s)"}"""))
    // httpserver prefix-matching must not leak: unknown paths 404 exactly
    assert(get(s"/v1/blockchain?hash=${EvmFixtures.blockHash(1500)}")._1 === 404)
    assert(get("/v1/block/extra?number=1500")._1 === 404)
  }

  test("/v1/transaction dispatch arms (rest.go:228-487)") {
    val txHash = EvmFixtures.txHash(2003, 0)
    val (c1, b1) = get(s"/v1/transaction?hash=$txHash")
    assert(c1 === 200 && mapper.readTree(b1).get("hash").asText() === txHash)

    // nonce arm: parse failure vs absent row
    assert(get(s"/v1/transaction?fromAccount=${EvmFixtures.account(2)}&nonce=zz") ===
      (400, """{"msg":"Bad account nonce"}"""))
    assert(get(s"/v1/transaction?fromAccount=${EvmFixtures.account(2)}&nonce=99999999")._1 === 404)

    // from-account number range: wrapped collection
    val (c2, b2) = get(s"/v1/transaction?fromAccount=${EvmFixtures.account(2)}" +
      "&fromBlock=1000&toBlock=1099")
    assert(c2 === 200 && mapper.readTree(b2).get("transactions").size() > 0)

    // deployer arm precedes from/to-account arms and filters to creations
    val (c3, b3) = get(s"/v1/transaction?deployer=${EvmFixtures.account(2)}" +
      "&fromBlock=1000&toBlock=1099")
    assert(c3 === 200)
    val creations = mapper.readTree(b3).get("transactions")
    (0 until creations.size()).foreach { i =>
      assert(creations.get(i).has("contract")) // F14: creations emit contract, not to
    }

    assert(get(s"/v1/transaction?toAccount=${EvmFixtures.account(5)}" +
      "&fromTime=0&toTime=7200") === (400, """{"msg":"Bad block time range"}"""))
    assert(get("/v1/transaction") === (400, """{"msg":"Bad query param(s)"}"""))
  }

  test("/v1/event dispatch arms (rest.go:489-758)") {
    val bh = EvmFixtures.blockHash(2003)

    // blockHash + logIndex: single event document
    val (c1, b1) = get(s"/v1/event?blockHash=$bh&logIndex=1")
    assert(c1 === 200)
    val ev = mapper.readTree(b1)
    assert(ev.get("index").asLong() === 1L && ev.get("blockHash").asText() === bh)
    assert(get(s"/v1/event?blockHash=$bh&logIndex=zz") ===
      (400, """{"msg":"Bad log index"}"""))

    // blockNumber + logIndex: the two-step plan returns the same event
    val (c2, b2) = get("/v1/event?blockNumber=2003&logIndex=1")
    assert(c2 === 200 && mapper.readTree(b2) === ev)

    // blockHash alone: collection
    val (c3, b3) = get(s"/v1/event?blockHash=$bh")
    assert(c3 === 200 && mapper.readTree(b3).get("events").size() > 1)

    // txHash: that tx's events only
    val (c4, b4) = get(s"/v1/event?txHash=${EvmFixtures.txHash(2003, 1)}")
    assert(c4 === 200)
    val evs = mapper.readTree(b4).get("events")
    (0 until evs.size()).foreach { i =>
      assert(evs.get(i).get("txHash").asText() === EvmFixtures.txHash(2003, 1))
    }

    // contract + count arm with its two failure messages
    val (c5, b5) = get(s"/v1/event?contract=${EvmFixtures.contractAddr(0)}&count=10")
    assert(c5 === 200 && mapper.readTree(b5).get("events").size() === 10)
    assert(get(s"/v1/event?contract=${EvmFixtures.contractAddr(0)}&count=51") ===
      (400, """{"msg":"Too many events requested"}"""))
    assert(get(s"/v1/event?contract=${EvmFixtures.contractAddr(0)}&count=x") ===
      (400, """{"msg":"Bad event count"}"""))
    // LIMIT 0 semantics: empty collection, not an error (query.go:503-513)
    assert(get(s"/v1/event?contract=${EvmFixtures.contractAddr(0)}&count=0") ===
      (200, """{"events":[]}"""))

    // contract + range + topic0: every doc's first topic matches
    val (c6, b6) = get(s"/v1/event?contract=${EvmFixtures.contractAddr(7)}" +
      s"&fromBlock=1000&toBlock=1099&topic0=${EvmFixtures.sig(2)}")
    assert(c6 === 200)
    val topicEvs = mapper.readTree(b6).get("events")
    assert(topicEvs.size() > 0)
    (0 until topicEvs.size()).foreach { i =>
      assert(topicEvs.get(i).get("topics").get(0).asText() === EvmFixtures.sig(2))
    }

    // contract + plain range (no topics): the round-tripped F2 suppression
    val (c7, b7) = get(s"/v1/event?contract=${EvmFixtures.contractAddr(7)}" +
      "&fromBlock=1000&toBlock=1099")
    assert(c7 === 200 && mapper.readTree(b7).get("events").size() >= topicEvs.size())
  }

  test("/v1/synced reports the reference's progress shape (rest.go:69-90)") {
    val (code, body) = get("/v1/synced")
    assert(code === 200)
    val s = mapper.readTree(body)
    assert(s.get("synced").asText() === "98.97 %")
    assert(s.get("processed").asLong() === 2969L)
    assert(s.get("elapsed").asText() === "2m0s")
    assert(s.get("status").asText() === "syncing")
    // eta = 120/2969 * 31 remaining ≈ 1.25 s → "1s"
    assert(s.get("eta").asText() === "1s")
  }

  test("goDuration renders Go's duration shapes") {
    assert(RestServer.goDuration(0) === "0s")
    assert(RestServer.goDuration(5.4) === "5s")
    assert(RestServer.goDuration(5.6) === "5s") // TRUNCATED, not rounded
    assert(RestServer.goDuration(72) === "1m12s")
    assert(RestServer.goDuration(7205) === "2h0m5s")
    assert(RestServer.goDuration(Double.PositiveInfinity) === "0s")
  }
}
