package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}

import graft.api.{QueryService, RestServer, WsServer}
import graft.ingest.BlockStore
import graft.streaming.{ChainSimSource, IngestJob}

/** The composed single-process deployment — the reference's `app.Run`
  * (`app/app.go:17-72`, `app/setup.go:19-66`): one process that
  *
  *   1. subscribes to the chain (ws heads + JSON-RPC bodies, or polling
  *      JSON-RPC, or the in-repo sim — the `BlockFetcher` seam selected
  *      by config, reference `setup.go:28-32`),
  *   2. runs streaming ingest into the two-tier [[BlockStore]] with
  *      reorg replacement, the confirmation watermark, and the
  *      publish-once gate ([[IngestJob]]),
  *   3. serves the historical query surface over REST + GraphQL
  *      ([[RestServer]] on `PORT`, `rest.go:59-902`), and
  *   4. fans real-time notifications out to websocket subscribers
  *      ([[WsServer]] — the in-process analog of the reference's
  *      Redis pub/sub + ws upgrade tier, `setup.go:55-60`).
  *
  * Config arrives as the reference's `.env` contract — same key names,
  * same defaults (`.env.example`, `app/config/config.go`): `RPCUrl`,
  * `WebsocketUrl`, `PORT`, `BlockConfirmations`, `BlockRange`,
  * `TimeRange`, `ConcurrencyFactor`, `Production`. Keys that configured
  * Postgres/Redis in the reference map to their in-process analogs here:
  * `StoreRoot` (the parquet store + checkpoint root — the `DB_*` block)
  * and `WsPort` (the fanout tier's own socket — the `Redis*` block;
  * RFC 6455 needs a raw socket, so it cannot ride the REST port's
  * `com.sun.net.httpserver`). Engine-side extras: `Fetcher` (explicit
  * connector option, overrides the URL-derived one — how tests and
  * exotic deployments plug in), `BlocksPerBatch`, `MaxNumber` (finite
  * chain bound for sim/demo runs), `Master` (Spark master for `main`).
  *
  * Concurrency: the reference fans `ConcurrencyFactor` workers over the
  * fetch backlog (`config.go:24-39`); here the backlog splits into
  * per-task slices of `BlocksPerBatch / ConcurrencyFactor` blocks, so a
  * larger factor yields proportionally more parallel fetch tasks under
  * Spark's scheduler — same knob, executor-pool execution.
  *
  * `/v1/synced` state mirrors `data.go:12-25`: block count in store =
  * count at startup + blocks inserted since (the insert counter rides
  * the stream's `observe()` metrics via a [[StreamingQueryListener]] —
  * no extra pass over the data, ST13/A7).
  */
object Serve {

  /** Parsed `.env` (reference `config.go:11-20` reads the same file
    * shape through viper). `KEY=VALUE` lines; `#` comments and blanks
    * skipped; first `=` splits. */
  def parseEnv(text: String): Map[String, String] =
    text.linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains("="))
      .map { l =>
        val i = l.indexOf('=')
        l.substring(0, i).trim -> l.substring(i + 1).trim
      }.toMap

  final case class Config(
      rpcUrl: String = "",              // RPCUrl
      websocketUrl: String = "",        // WebsocketUrl
      port: Int = 7000,                 // PORT (.env.example)
      blockConfirmations: Long = 200L,  // BlockConfirmations
      blockRange: Long = 100L,          // BlockRange
      timeRange: Long = 3600L,          // TimeRange
      concurrencyFactor: Long = 5L,     // ConcurrencyFactor
      production: Boolean = false,      // Production=yes/no
      storeRoot: String = "serve_data", // DB_* analog
      wsPort: Int = 0,                  // Redis*/ws tier analog (0 = ephemeral)
      fetcherOverride: String = "",     // Fetcher (explicit connector option)
      blocksPerBatch: Long = 50L,       // BlocksPerBatch (pre-split batch slice)
      maxNumber: Long = 1000000L,       // MaxNumber (sim/demo chain bound)
      master: String = "local[32]") {   // Master (main's Spark master)

    /** The DSv2 `fetcher` option this config selects — the
      * `setup.go:28-32` connection split: ws heads + rpc bodies when
      * both URLs are present, polling rpc when only `RPCUrl` is, the
      * deterministic sim otherwise (the zero-config demo mode). */
    def fetcherOption: String =
      if (fetcherOverride.nonEmpty) fetcherOverride
      else if (websocketUrl.nonEmpty && rpcUrl.nonEmpty) s"ws:$websocketUrl|$rpcUrl"
      else if (rpcUrl.nonEmpty) s"rpc:$rpcUrl"
      else "sim"

    /** Per-fetch-task slice width (see class doc: ConcurrencyFactor is
      * the parallelism knob, as in the reference's worker pool). */
    def sliceBlocks: Long = math.max(1L, blocksPerBatch / math.max(1L, concurrencyFactor))
  }

  object Config {
    def fromEnv(env: Map[String, String]): Config = {
      val d = Config()
      def long(k: String, dflt: Long) =
        env.get(k).filter(_.nonEmpty).map(_.toLong).getOrElse(dflt)
      Config(
        rpcUrl = env.getOrElse("RPCUrl", d.rpcUrl),
        websocketUrl = env.getOrElse("WebsocketUrl", d.websocketUrl),
        port = long("PORT", d.port.toLong).toInt,
        blockConfirmations = long("BlockConfirmations", d.blockConfirmations),
        blockRange = long("BlockRange", d.blockRange),
        timeRange = long("TimeRange", d.timeRange),
        concurrencyFactor = long("ConcurrencyFactor", d.concurrencyFactor),
        production = env.get("Production").exists(_.equalsIgnoreCase("yes")),
        storeRoot = env.getOrElse("StoreRoot", d.storeRoot),
        wsPort = long("WsPort", d.wsPort.toLong).toInt,
        fetcherOverride = env.getOrElse("Fetcher", d.fetcherOverride),
        blocksPerBatch = long("BlocksPerBatch", d.blocksPerBatch),
        maxNumber = long("MaxNumber", d.maxNumber),
        master = env.getOrElse("Master", d.master))
    }

    def fromEnvFile(path: String): Config =
      fromEnv(parseEnv(new String(Files.readAllBytes(Paths.get(path)),
        java.nio.charset.StandardCharsets.UTF_8)))
  }

  /** A running deployment: every tier live, every port bound. `stop()`
    * tears down in reverse dependency order; idempotent. */
  final class Running(
      val store: BlockStore,
      val job: IngestJob,
      val query: StreamingQuery,
      val rest: RestServer,
      val fanout: WsServer,
      spark: SparkSession,
      listener: StreamingQueryListener) {
    def restPort: Int = rest.boundPort
    def wsPort: Int = fanout.boundPort
    @volatile private var stopped = false
    def stop(): Unit = synchronized {
      if (!stopped) {
        stopped = true
        try query.stop() catch { case scala.util.control.NonFatal(_) => () }
        spark.streams.removeListener(listener)
        rest.stop()
        fanout.stop()
      }
    }
  }

  /** Boot every tier against `spark` and return the running handle —
    * `bootstrap` + the three `go`-routines of `app.Run`, minus the
    * blocking: the caller (or [[main]]) owns process lifetime. */
  def run(spark: SparkSession, cfg: Config): Running = {
    val store = new BlockStore(spark, s"${cfg.storeRoot}/store")

    // fanout tier first: subscribers connected before the first publish
    // see every notification, as with the reference's Redis topics
    val fanout = new WsServer(cfg.wsPort)
    fanout.start()

    val job = new IngestJob(spark, store, cfg.blockConfirmations,
      onPublish = fanout.publish)

    // SyncState (data.go:13-25): count at startup + inserted since
    val startCount = store.view("blocks").count()
    val startedAtNanos = System.nanoTime()
    val inserted = new AtomicLong(0L)

    val stream = spark.readStream
      .format(classOf[ChainSimSource].getName)
      .option("blocksPerBatch", cfg.sliceBlocks.toString)
      .option("maxNumber", cfg.maxNumber.toString)
      .option("fetcher", cfg.fetcherOption)
      .load()
      .select(org.apache.spark.sql.functions.from_json(
        org.apache.spark.sql.functions.col("value"),
        graft.schema.Schemas.packedBlock).as("p"))
      .select("p.*")

    val query = job.start(stream, s"${cfg.storeRoot}/checkpoint")

    // IncrementBlocksInserted (data.go:55-61) off the observe() metric —
    // the counter the ingest pass already computes, no extra job
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.id == query.id) {
          val m = e.progress.observedMetrics.get("ingest")
          if (m != null && !m.isNullAt(m.fieldIndex("blocks_processed"))) {
            inserted.addAndGet(m.getAs[Long]("blocks_processed")); ()
          }
        }
    }
    spark.streams.addListener(listener)

    // the query tier reads the LIVE store: QueryService's by-name params
    // re-resolve store.view per request, so committed batches are visible
    val service = new QueryService(
      store.view("blocks"), store.view("transactions"), store.view("events"),
      maxBlockRange = cfg.blockRange, maxTimeRange = cfg.timeRange)

    def status(): RestServer.SyncStatus = {
      val latest = job.latest.get()
      val count = startCount + inserted.get()
      RestServer.SyncStatus(
        latestBlockNumber = latest,
        blockCountInDB = count,
        processed = inserted.get(),
        elapsedSeconds = (System.nanoTime() - startedAtNanos) / 1e9,
        state = if (latest >= 0 && count >= latest + 1) "synced" else "syncing")
    }

    val rest = new RestServer(service, () => status(), cfg.port)
    rest.start()

    new Running(store, job, query, rest, fanout, spark, listener)
  }

  /** `app.Run`: bootstrap, then block for the process's lifetime.
    * Usage: `runMain graft.Serve [path/to/.env]` (missing file → all
    * defaults, i.e. the sim chain demo). Ctrl-C runs the graceful
    * shutdown hook, the reference's SIGINT path (`app.go:24-62`). */
  def main(args: Array[String]): Unit = {
    val cfg = args.headOption match {
      case Some(p) if Files.exists(Paths.get(p)) => Config.fromEnvFile(p)
      case _ => Config()
    }
    val spark = GraftSession.get(master = cfg.master)
    val running = run(spark, cfg)
    // scalastyle:off println
    println(s"graft serve: REST on :${running.restPort}  ws on :${running.wsPort}  " +
      s"fetcher=${cfg.fetcherOption}  store=${cfg.storeRoot}")
    // scalastyle:on println
    Runtime.getRuntime.addShutdownHook(new Thread(() => running.stop(), "serve-shutdown"))
    running.query.awaitTermination()
  }
}
