package graft.streaming

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{StructField, StructType, StringType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.fixtures.EvmFixtures
import graft.schema.Model._

/** S1: a custom DataSource V2 `MicroBatchStream` — the push source of new
  * block headers (SURVEY §2.1; `app/block/listener.go:20-171`).
  *
  * The node connector is the [[BlockFetcher]] seam, selected by the
  * `fetcher` option: `latestOffset` asks it for the chain head, and each
  * partition reader fetches its block range through it (S2/S3 — a
  * production deployment registers a JSON-RPC implementation's class
  * name; no source-class swap). The default is the deterministic
  * [[EvmFixtures]] chain simulator, so the whole ingest path — offsets,
  * ranges, restarts, checkpoints — is exercised for real with zero
  * network. Payload schema is one JSON string per packed block (the Kafka
  * convention: bytes in, `from_json` downstream), which keeps the reader
  * trivial and the parse inside Catalyst.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft.streaming.ChainSimSource")
  *     .option("blocksPerBatch", "10").option("maxNumber", "99").load()
  *     .select(from_json($"value", Schemas.packedBlock).as("p")).select("p.*")
  * }}}
  */
class ChainSimSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChainSimSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = new ChainSimTable
}

object ChainSimSource {
  val schema: StructType = StructType(Seq(StructField("value", StringType, nullable = false)))

  /** Serialize a packed block to the JSON `from_json` reads back with
    * [[graft.schema.Schemas.packedBlock]] (binary as base64). */
  def toJson(p: PackedBlock): String = {
    val b64 = java.util.Base64.getEncoder
    def jstr(s: String) = "\"" + s + "\"" // hex/decimal strings: no escaping needed
    def jbin(b: Array[Byte]) = if (b == null) "null" else jstr(b64.encodeToString(b))
    def block(bl: Block) =
      s"""{"hash":${jstr(bl.hash)},"number":${bl.number},"time":${bl.time},""" +
      s""""parenthash":${jstr(bl.parenthash)},"difficulty":${jstr(bl.difficulty)},""" +
      s""""gasused":${bl.gasused},"gaslimit":${bl.gaslimit},"nonce":${jstr(bl.nonce)},""" +
      s""""miner":${jstr(bl.miner)},"size":${bl.size},""" +
      s""""stateroothash":${jstr(bl.stateroothash)},"unclehash":${jstr(bl.unclehash)},""" +
      s""""txroothash":${jstr(bl.txroothash)},"receiptroothash":${jstr(bl.receiptroothash)},""" +
      s""""extradata":${jbin(bl.extradata)}}"""
    def tx(t: Transaction) =
      s"""{"hash":${jstr(t.hash)},"from":${jstr(t.from)},"to":${jstr(t.to)},""" +
      s""""contract":${jstr(t.contract)},"value":${jstr(t.value)},"data":${jbin(t.data)},""" +
      s""""gas":${t.gas},"gasprice":${jstr(t.gasprice)},"cost":${jstr(t.cost)},""" +
      s""""nonce":${t.nonce},"state":${t.state},"blockhash":${jstr(t.blockhash)}}"""
    def ev(e: Event) =
      s"""{"blockhash":${jstr(e.blockhash)},"index":${e.index},"origin":${jstr(e.origin)},""" +
      s""""topics":${e.topics.map(jstr).mkString("[", ",", "]")},"data":${jbin(e.data)},""" +
      s""""txhash":${jstr(e.txhash)}}"""
    def pt(p: PackedTransaction) = s"""{"tx":${tx(p.tx)},"events":${p.events.map(ev).mkString("[", ",", "]")}}"""
    s"""{"block":${block(p.block)},"transactions":${p.transactions.map(pt).mkString("[", ",", "]")}}"""
  }

  /** The simulated node: deterministically rebuild packed block `n`
    * (same content as the committed fixtures, gaps skipped → parent
    * linkage intact but numbers non-contiguous, like a reorg-free chain
    * with deliberate holes for backfill tests). */
  def fetchBlock(n: Long): Option[PackedBlock] =
    if (EvmFixtures.isGap(n)) None
    else {
      val nTx = EvmFixtures.txCount(n)
      var logIndex = 0
      val txs = (0 until nTx).map { j =>
        val t = EvmFixtures.buildTx(n, j, nonce = n * 10 + j) // per-source nonce domain
        val evs = (0 until EvmFixtures.eventCount(n, j)).map { e =>
          val x = EvmFixtures.buildEvent(n, j, e, logIndex); logIndex += 1; x
        }
        PackedTransaction(t, evs)
      }
      Some(PackedBlock(EvmFixtures.buildBlock(n, nTx), txs))
    }
}

class ChainSimTable extends Table with SupportsRead {
  override def name(): String = "chainsim"
  override def schema(): StructType = ChainSimSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  // options arrive HERE (not in TableProvider.getTable's properties)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val blocksPerBatch = options.getLong("blocksPerBatch", 10L)
    val maxNumber = options.getLong("maxNumber", 1000000L)
    // S2/S3 seam: the node connector is an option-selected implementation
    val fetcher = BlockFetcher.forOption(
      options.getOrDefault("fetcher", "sim"), maxNumber)
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = ChainSimSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new ChainSimStream(blocksPerBatch, maxNumber, fetcher)
      }
    }
  }
}

/** Offset = next block number to emit (exclusive high-water mark) PLUS
  * the length of the connector's reorg-signal log consumed so far —
  * both monotone, so the pair is a valid streaming offset. The JSON form
  * is `next` alone when no signal has ever fired (also the legacy
  * checkpoint format) and `next,reorgSeq` after the first one. */
case class ChainOffset(next: Long, reorgSeq: Int = 0) extends Offset {
  override def json(): String =
    if (reorgSeq == 0) next.toString else s"$next,$reorgSeq"
}

object ChainOffset {
  def parse(json: String): ChainOffset = json.split(',') match {
    case Array(n) => ChainOffset(n.toLong)
    case Array(n, r) => ChainOffset(n.toLong, r.toInt)
  }
}

class ChainSimStream(blocksPerBatch: Long, maxNumber: Long,
    fetcher: BlockFetcher) extends MicroBatchStream {
  override def initialOffset(): Offset = ChainOffset(0L)
  override def deserializeOffset(json: String): Offset = ChainOffset.parse(json)
  override def latestOffset(): Offset = ChainOffset(
    // the connector reports the chain head ([[BlockFetcher.head]]);
    // maxNumber bounds the stream for finite test runs
    math.min(fetcher.head() + 1, maxNumber + 1),
    fetcher.reorgs().size)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[ChainOffset].next
    val hi = end.asInstanceOf[ChainOffset].next
    // chunked like the reference's range syncer (syncer.go:65) — one
    // partition per blocksPerBatch-sized slice, fetched in parallel
    val ranges = (lo until hi by blocksPerBatch).map(s =>
      ChainRangePartition(s, math.min(s + blocksPerBatch, hi)): InputPartition)
    // ST7 hot path: reorg signals claimed by THIS batch (offset range in
    // the connector's log) refetch their height immediately — the
    // replacement block rides the same batch and last-writer-wins in the
    // hot tier replaces the stale one (listener.go:49-73 semantics).
    // Heights the range partitions already cover are skipped; a signal
    // beyond the log snapshot (restart with a fresh connector) is inert.
    val rlo = start.asInstanceOf[ChainOffset].reorgSeq
    val rhi = end.asInstanceOf[ChainOffset].reorgSeq
    val log = fetcher.reorgs()
    val refetch = log.slice(rlo, math.min(rhi, log.size)).distinct
      .filter(_ < lo) // in [lo,hi) the range partitions fetch it anyway;
      .map(h => ChainRangePartition(h, h + 1): InputPartition) // ≥ hi can't occur (signal ≤ old head)
    (ranges ++ refetch).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val f = fetcher // serializable config captured into the factory closure
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[ChainRangePartition]
      new PartitionReader[InternalRow] {
        private var n = p.from - 1
        private var row: InternalRow = _
        override def next(): Boolean = {
          n += 1
          var fetched: Option[graft.schema.Model.PackedBlock] = None
          while (n < p.until && { fetched = f.fetchBlock(n); fetched.isEmpty }) n += 1
          if (n >= p.until) false
          else {
            row = InternalRow(UTF8String.fromString(
              ChainSimSource.toJson(fetched.get)))
            true
          }
        }
        override def get(): InternalRow = row
        override def close(): Unit = ()
      }
    }
  }
}

case class ChainRangePartition(from: Long, until: Long) extends InputPartition
