package graft.api

import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.DataFrame

object RestServer {

  /** The /v1/synced inputs — the reference's mutexed `StatusHolder`
    * (`app/data/data.go:54-82`); here the caller supplies a snapshot
    * (e.g. from [[graft.streaming.IngestJob]]'s observed metrics). */
  final case class SyncStatus(latestBlockNumber: Long, blockCountInDB: Long,
      processed: Long, elapsedSeconds: Double, state: String)

  /** Go `time.Duration.String()` shape at whole-second resolution —
    * `"5s"`, `"1m12s"`, `"2h0m5s"` (the reference truncates its ETA to
    * seconds before rendering, rest.go:82). */
  def goDuration(seconds: Double): String = {
    val s = if (seconds.isNaN || seconds <= 0 || seconds.isInfinite) 0L
      else seconds.toLong // TRUNCATE, as float→Duration conversion does
    val (h, m, sec) = (s / 3600, s % 3600 / 60, s % 60)
    if (h > 0) s"${h}h${m}m${sec}s"
    else if (m > 0) s"${m}m${sec}s"
    else s"${sec}s"
  }
}

/** The HTTP half of the reference's API tier (`app/rest/rest.go:59-902`,
  * a gin router) served over [[QueryService]]: the same route set
  * (`/v1/synced`, `/v1/block`, `/v1/transaction`, `/v1/event`), the same
  * if-chain dispatch ORDER inside each route, the same 400/404 bodies,
  * and the same response document shapes (tx docs via F14/F15, block and
  * event docs via [[graft.functions.EvmFunctions.blockJson]]/`eventJson`,
  * collections wrapped `{"blocks":[…]}` / `{"transactions":[…]}` /
  * `{"events":[…]}` per `app/data/{block,tx,event}.go`).
  *
  * Serving is JDK `com.sun.net.httpserver` — no added dependencies; the
  * engine below is untouched Spark. Every endpoint reaches the engine
  * through QueryService, whose guardrails (hash/address shapes, range
  * width caps, the 50-event top-K cap) bound each request to a small
  * scan BEFORE planning — so the `collect()` here materializes only
  * guardrail-bounded results, the reference's own API contract (10-block
  * / 60-second windows, rest.go:171-225).
  *
  * `/v1/graphql` serves the reference's schema through [[GraphQl]] (same
  * QueryService arms, gqlgen's response envelope). The websocket route
  * lives in [[WsServer]] — RFC 6455 needs a raw socket, which
  * `com.sun.net.httpserver` cannot hijack, so it binds its own port like
  * the reference's upgrade path owns its connection. */
final class RestServer(service: QueryService,
    status: () => RestServer.SyncStatus, port: Int = 0) {
  import RestServer._

  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  // daemon workers: the server never pins the JVM by itself — the caller
  // owns process lifetime (the reference blocks in router.Run the same way)
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4, r => {
    val t = new Thread(r, "rest-server")
    t.setDaemon(true)
    t
  }))
  server.createContext("/v1/synced", (ex: HttpExchange) => handle(ex)(synced))
  server.createContext("/v1/block", (ex: HttpExchange) => handle(ex)(block))
  server.createContext("/v1/transaction", (ex: HttpExchange) => handle(ex)(transaction))
  server.createContext("/v1/event", (ex: HttpExchange) => handle(ex)(event))
  private val graphql = new GraphQl(service)
  server.createContext("/v1/graphql", (ex: HttpExchange) =>
    try {
      if (notExact(ex)) send404(ex)
      else {
      val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      // resolver/engine failures still produce the envelope, as gqlgen's
      // recover handler does — the route never drops the response
      val resp = (try graphql.execute(body) catch {
        case scala.util.control.NonFatal(_) =>
          """{"errors":[{"message":"internal system error"}],"data":null}"""
      }).getBytes(UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(200, resp.length) // gqlgen always responds 200
      ex.getResponseBody.write(resp)
      }
    } finally ex.close())

  // rest.go:887-900 serves gqlgen's playground page here; offline, a
  // self-contained console that posts to the same /v1/graphql endpoint
  server.createContext("/v1/graphql-playground", (ex: HttpExchange) =>
    try {
      if (notExact(ex)) send404(ex)
      else {
      val page = ("<!DOCTYPE html><html><head><title>graft graphql</title></head>" +
        "<body><h3>GraphQL console</h3>" +
        "<textarea id=q rows=8 cols=80>{ blockByNumber(number: \"1\") { hash number } }</textarea>" +
        "<br><button onclick=\"fetch('/v1/graphql',{method:'POST'," +
        "headers:{'Content-Type':'application/json'}," +
        "body:JSON.stringify({query:document.getElementById('q').value})})" +
        ".then(r=>r.text()).then(t=>document.getElementById('o').textContent=t)\">" +
        "run</button><pre id=o></pre></body></html>").getBytes(UTF_8)
      ex.getResponseHeaders.set("Content-Type", "text/html")
      ex.sendResponseHeaders(200, page.length)
      ex.getResponseBody.write(page)
      }
    } finally ex.close())

  def start(): Unit = server.start()
  def stop(): Unit = server.stop(0)
  /** Actual port after binding (`port = 0` requests an ephemeral one). */
  def boundPort: Int = server.getAddress.getPort

  // ---- plumbing ---------------------------------------------------------

  private type Params = Map[String, String]

  private def parseParams(raw: String): Params =
    if (raw == null || raw.isEmpty) Map.empty
    else raw.split("&").toSeq.flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => Some(URLDecoder.decode(k, UTF_8) -> URLDecoder.decode(v, UTF_8))
        case Array(k) if k.nonEmpty => Some(URLDecoder.decode(k, UTF_8) -> "")
        case _ => None
      }
    }.toMap

  // httpserver contexts match by string PREFIX; gin routes are exact, so
  // /v1/blockfoo (or /v1/graphql-playgroundzzz) must 404, not dispatch
  private def notExact(ex: HttpExchange): Boolean =
    ex.getRequestURI.getPath != ex.getHttpContext.getPath

  private def send404(ex: HttpExchange): Unit = {
    val bytes = notFound._2.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(404, bytes.length)
    ex.getResponseBody.write(bytes)
  }

  private def handle(ex: HttpExchange)(route: Params => (Int, String)): Unit =
    try {
      val (code, body) =
        if (notExact(ex)) notFound
        else try route(parseParams(ex.getRequestURI.getRawQuery))
        catch { // rest.go:36-44: encoding/query failure → 500
          case scala.util.control.NonFatal(_) => (500, jsonMsg("JSON encoding failed"))
        }
      val bytes = body.getBytes(UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
    } finally ex.close()

  private def jsonMsg(msg: String) = s"""{"msg":"$msg"}"""
  private val notFound = (404, jsonMsg("Not found"))
  private val badParams = (400, jsonMsg("Bad query param(s)"))

  private def isHash(s: String) = s.matches("^0x[0-9a-fA-F]{64}$")
  private def isAddr(s: String) = s.matches("^0x[0-9a-fA-F]{40}$")
  private def parseLong(s: String): Option[Long] =
    try { val n = java.lang.Long.parseLong(s); if (n >= 0) Some(n) else None }
    catch { case _: NumberFormatException => None }

  private def docs(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(_.getString(0))

  private def single(df: DataFrame): (Int, String) =
    docs(df).headOption.map((200, _)).getOrElse(notFound)

  private def collection(wrapper: String, df: DataFrame): (Int, String) =
    (200, s"""{"$wrapper":[${docs(df).mkString(",")}]}""")

  /** Range arms: the reference folds parse AND width failures into one
    * message per arm (`cmn.RangeChecker`, rest.go:174-179), so a service
    * Left here maps to the arm's message, not the internal one. */
  private def ranged(lo: String, hi: String, msg: String)(
      run: (Long, Long) => Either[String, DataFrame])(
      render: DataFrame => (Int, String)): (Int, String) =
    (parseLong(lo), parseLong(hi)) match {
      case (Some(f), Some(t)) =>
        run(f, t).fold(_ => (400, jsonMsg(msg)), render)
      case _ => (400, jsonMsg(msg))
    }

  // ---- /v1/synced (rest.go:69-90) ---------------------------------------

  private def synced(p: Params): (Int, String) = {
    val s = status()
    val total = s.latestBlockNumber + 1
    val remaining = total - s.blockCountInDB
    val pct = if (total <= 0) 0.0 else s.blockCountInDB.toDouble / total * 100.0
    val eta =
      if (remaining > 0 && s.processed > 0) s.elapsedSeconds / s.processed * remaining
      else 0.0
    (200, f"""{"synced":"$pct%.2f %%","processed":${s.processed},""" +
      s""""elapsed":"${goDuration(s.elapsedSeconds)}","eta":"${goDuration(eta)}",""" +
      s""""status":"${s.state}"}""")
  }

  // ---- /v1/block (rest.go:93-225) ---------------------------------------

  private def block(p: Params): (Int, String) = {
    val hash = p.getOrElse("hash", "")
    val number = p.getOrElse("number", "")
    val tx = p.getOrElse("tx", "")
    val (fromBlock, toBlock) = (p.getOrElse("fromBlock", ""), p.getOrElse("toBlock", ""))
    val (fromTime, toTime) = (p.getOrElse("fromTime", ""), p.getOrElse("toTime", ""))

    if (isHash(hash) && tx == "yes")
      service.transactionsByBlockHash(hash)
        .fold(m => (400, jsonMsg(m)), df => collection("transactions", service.transactionsAsJson(df)))
    else if (number.nonEmpty && tx == "yes")
      parseLong(number) match {
        case None => (400, jsonMsg("Bad block number"))
        case Some(n) => service.transactionsByBlockNumber(n)
          .fold(m => (400, jsonMsg(m)), df => collection("transactions", service.transactionsAsJson(df)))
      }
    else if (isHash(hash))
      service.blockByHash(hash)
        .fold(m => (400, jsonMsg(m)), df => single(service.blocksAsJson(df)))
    else if (number.nonEmpty)
      parseLong(number) match {
        case None => (400, jsonMsg("Bad block number"))
        case Some(n) => service.blockByNumber(n)
          .fold(m => (400, jsonMsg(m)), df => single(service.blocksAsJson(df)))
      }
    else if (fromBlock.nonEmpty && toBlock.nonEmpty)
      ranged(fromBlock, toBlock, "Bad block number range")(service.blocksByNumberRange)(
        df => collection("blocks", service.blocksAsJson(df)))
    else if (fromTime.nonEmpty && toTime.nonEmpty)
      ranged(fromTime, toTime, "Bad block time range")(service.blocksByTimeRange)(
        df => collection("blocks", service.blocksAsJson(df)))
    else badParams
  }

  // ---- /v1/transaction (rest.go:228-487) --------------------------------

  private def transaction(p: Params): (Int, String) = {
    val hash = p.getOrElse("hash", "")
    val (fromBlock, toBlock) = (p.getOrElse("fromBlock", ""), p.getOrElse("toBlock", ""))
    val (fromTime, toTime) = (p.getOrElse("fromTime", ""), p.getOrElse("toTime", ""))
    val deployer = p.getOrElse("deployer", "")
    val fromAccount = p.getOrElse("fromAccount", "")
    val toAccount = p.getOrElse("toAccount", "")
    val nonce = p.getOrElse("nonce", "")

    def txColl(df: DataFrame) = collection("transactions", service.transactionsAsJson(df))
    val numRange = fromBlock.nonEmpty && toBlock.nonEmpty
    val timeRange = fromTime.nonEmpty && toTime.nonEmpty

    if (isHash(hash))
      service.transactionByHash(hash)
        .fold(m => (400, jsonMsg(m)), df => single(service.transactionsAsJson(df)))
    else if (nonce.nonEmpty && isAddr(fromAccount))
      parseLong(nonce) match {
        case None => (400, jsonMsg("Bad account nonce"))
        case Some(n) => service.transactionFromAccountWithNonce(fromAccount, n)
          .fold(m => (400, jsonMsg(m)), df => single(service.transactionsAsJson(df)))
      }
    else if (numRange && isAddr(deployer))
      ranged(fromBlock, toBlock, "Bad block number range")(
        service.contractCreationsFromAccount(deployer, _, _))(txColl)
    else if (timeRange && isAddr(deployer))
      ranged(fromTime, toTime, "Bad block time range")(
        service.contractCreationsFromAccountByTimeRange(deployer, _, _))(txColl)
    else if (numRange && isAddr(fromAccount) && isAddr(toAccount))
      ranged(fromBlock, toBlock, "Bad block number range")(
        service.transactionsBetweenAccountsByNumberRange(fromAccount, toAccount, _, _))(txColl)
    else if (timeRange && isAddr(fromAccount) && isAddr(toAccount))
      ranged(fromTime, toTime, "Bad block time range")(
        service.transactionsBetweenAccountsByTimeRange(fromAccount, toAccount, _, _))(txColl)
    else if (numRange && isAddr(fromAccount))
      ranged(fromBlock, toBlock, "Bad block number range")(
        service.transactionsFromAccountByNumberRange(fromAccount, _, _))(txColl)
    else if (timeRange && isAddr(fromAccount))
      ranged(fromTime, toTime, "Bad block time range")(
        service.transactionsFromAccountByTimeRange(fromAccount, _, _))(txColl)
    else if (numRange && isAddr(toAccount))
      ranged(fromBlock, toBlock, "Bad block number range")(
        service.transactionsToAccountByNumberRange(toAccount, _, _))(txColl)
    else if (timeRange && isAddr(toAccount))
      ranged(fromTime, toTime, "Bad block time range")(
        service.transactionsToAccountByTimeRange(toAccount, _, _))(txColl)
    else badParams
  }

  // ---- /v1/event (rest.go:489-758) --------------------------------------

  private def event(p: Params): (Int, String) = {
    val (fromBlock, toBlock) = (p.getOrElse("fromBlock", ""), p.getOrElse("toBlock", ""))
    val (fromTime, toTime) = (p.getOrElse("fromTime", ""), p.getOrElse("toTime", ""))
    val contract = p.getOrElse("contract", "")
    val count = p.getOrElse("count", "")
    val topicParams = (0 to 3).map(i => i -> p.getOrElse(s"topic$i", "")).toMap
    val blockHash = p.getOrElse("blockHash", "")
    val txHash = p.getOrElse("txHash", "")
    val logIndex = p.getOrElse("logIndex", "")
    val blockNumber = p.getOrElse("blockNumber", "")

    def evColl(df: DataFrame) = collection("events", service.eventsAsJson(df))
    val numRange = fromBlock.nonEmpty && toBlock.nonEmpty
    val timeRange = fromTime.nonEmpty && toTime.nonEmpty
    // malformed topicN params drop out of the ARM CONDITION, so a request
    // with only invalid topics dispatches to the plain-range arm — exactly
    // the reference's behavior (rest.go:633: the topics arm requires at
    // least one shape-valid topic; invalid ones are never 400s)
    val validTopics = topicParams.filter { case (_, t) => isHash(t) }
    val anyTopic = validTopics.nonEmpty

    if (logIndex.nonEmpty && isHash(blockHash))
      parseLong(logIndex) match {
        case None => (400, jsonMsg("Bad log index"))
        case Some(i) => service.eventByBlockHashAndLogIndex(blockHash, i)
          .fold(m => (400, jsonMsg(m)), df => single(service.eventsAsJson(df)))
      }
    else if (logIndex.nonEmpty && blockNumber.nonEmpty)
      (parseLong(blockNumber), parseLong(logIndex)) match {
        case (None, _) => (400, jsonMsg("Bad block number"))
        case (_, None) => (400, jsonMsg("Bad log index"))
        case (Some(n), Some(i)) => service.eventByBlockNumberAndLogIndex(n, i)
          .fold(m => (400, jsonMsg(m)), df => single(service.eventsAsJson(df)))
      }
    else if (isHash(blockHash))
      service.eventsByBlockHash(blockHash).fold(m => (400, jsonMsg(m)), evColl)
    else if (isHash(txHash))
      service.eventsByTransactionHash(txHash).fold(m => (400, jsonMsg(m)), evColl)
    else if (count.nonEmpty && isAddr(contract))
      parseLong(count) match {
        case None => (400, jsonMsg("Bad event count"))
        case Some(k) if k > service.maxTopK => // rest.go:612-617, shared cap
          (400, jsonMsg("Too many events requested"))
        case Some(0) => (200, """{"events":[]}""") // LIMIT 0: empty, not an error
        case Some(k) => service.lastEventsFromContract(contract, k.toInt)
          .fold(m => (400, jsonMsg(m)), evColl)
      }
    else if (numRange && isAddr(contract) && anyTopic)
      ranged(fromBlock, toBlock, "Bad block number range")(
        service.eventsFromContractWithTopics(contract, _, _, validTopics))(evColl)
    else if (timeRange && isAddr(contract) && anyTopic)
      ranged(fromTime, toTime, "Bad block time range")(
        service.eventsFromContractWithTopicsByTimeRange(contract, _, _, validTopics))(evColl)
    else if (numRange && isAddr(contract))
      ranged(fromBlock, toBlock, "Bad block number range")(
        service.eventsFromContractByNumberRange(contract, _, _))(evColl)
    else if (timeRange && isAddr(contract))
      ranged(fromTime, toTime, "Bad block time range")(
        service.eventsFromContractByTimeRange(contract, _, _))(evColl)
    else badParams
  }
}
