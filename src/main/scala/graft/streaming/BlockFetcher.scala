package graft.streaming

import graft.schema.Model.PackedBlock

/** S2/S3 connector seam (SURVEY §2.1; reference `app/block/fetch.go:21-98`
  * and `listener.go:20-171`): how the stream source learns the chain head
  * and obtains packed blocks. This is the HALF of S1–S3 that talks to a
  * node; everything downstream (offsets, ranges, checkpoints, the store)
  * is connector-agnostic.
  *
  * Implementations are Serializable CONFIG, not live connections: the
  * partition reader instantiates per-partition state on the executor (a
  * JSON-RPC implementation holds its endpoint URL and opens its HTTP
  * client lazily — sockets never serialize). The deterministic chain
  * simulator is the default; a production deployment selects another
  * implementation through the `fetcher` option — a config change, not a
  * source-class swap.
  */
trait BlockFetcher extends Serializable {

  /** Latest block number the chain can serve (inclusive head) — a
    * JSON-RPC impl issues `eth_blockNumber` here. */
  def head(): Long

  /** One packed block (header + txs + receipts' events), or None for a
    * hole (gap, pruned, or not yet present) — `eth_getBlockByNumber`
    * plus per-tx receipts in a real connector. */
  def fetchBlock(n: Long): Option[PackedBlock]

  /** Append-only log of REORG SIGNALS the connector has observed: a
    * `newHeads` notification at an already-seen height means the chain
    * replaced that block, and the reference reprocesses it immediately
    * (`app/block/listener.go:49-73` — a repeated number IS the signal)
    * rather than waiting for the confirmation pass. The stream's offset
    * carries the log's length, so each signal is consumed by exactly one
    * micro-batch (which refetches the height; last-writer-wins in the
    * hot tier replaces the block). Connectors without a push channel
    * (polling JSON-RPC, the sim) have no such signal — empty log. */
  def reorgs(): IndexedSeq[Long] = IndexedSeq.empty
}

object BlockFetcher {

  /** Resolve the DSv2 `fetcher` option: `"sim"` (default) is the
    * deterministic fixture chain; `"rpc:<endpoint>"` is the real
    * JSON-RPC connector ([[JsonRpcFetcher]] over [[HttpTransport]]);
    * any other value is the fully-qualified class name of a zero-arg
    * [[BlockFetcher]] implementation on the classpath — how a deployment
    * plugs in its node connector without touching this source. */
  def forOption(name: String, maxNumber: Long): BlockFetcher = name match {
    case "sim" => ChainSimFetcher(maxNumber)
    case rpc if rpc.startsWith("rpc:") =>
      JsonRpcFetcher(HttpTransport(rpc.stripPrefix("rpc:")))
    case ws if ws.startsWith("ws:") =>
      // "ws:ws://host:port/path|http://host:port" — heads arrive by
      // eth_subscribe newHeads over the websocket (the reference's
      // listener.go split), block bodies by JSON-RPC over HTTP. A
      // `wss://` head URI runs the subscription over TLS (platform
      // trust, or the context installed via WsTransport.setSslContext).
      ws.stripPrefix("ws:").split('|') match {
        case Array(wsUri, httpUri) =>
          val u = java.net.URI.create(wsUri)
          require(u.getScheme == "ws" || u.getScheme == "wss",
            s"unsupported scheme ${u.getScheme} (want ws or wss)")
          // fail the CONFIG loudly: a missing port would otherwise surface
          // as a swallowed connect error indistinguishable from "no heads"
          require(u.getPort > 0, s"ws fetcher URI needs an explicit port: $wsUri")
          WsTransport.WsSubscribingFetcher(u.getHost, u.getPort,
            if (u.getPath == null || u.getPath.isEmpty) "/" else u.getPath,
            HttpTransport(httpUri), tls = u.getScheme == "wss")
        case _ => throw new IllegalArgumentException(
          s"ws fetcher needs 'ws:<ws-uri>|<http-uri>', got: $ws")
      }
    case fqcn => Class.forName(fqcn).getDeclaredConstructor()
      .newInstance().asInstanceOf[BlockFetcher]
  }
}

/** The simulated node as a [[BlockFetcher]]: head is the configured
  * chain tip, blocks come from the deterministic fixture builder
  * (gaps → None, exercising the backfill path with zero network). */
final case class ChainSimFetcher(maxNumber: Long) extends BlockFetcher {
  override def head(): Long = maxNumber
  override def fetchBlock(n: Long): Option[PackedBlock] =
    ChainSimSource.fetchBlock(n)
}
