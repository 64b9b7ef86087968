package graft.fixtures

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.security.MessageDigest

import org.apache.spark.sql.{SaveMode, SparkSession}

import graft.GraftSession
import graft.schema.Model._

/** Deterministic EVM-domain fixtures (FIXTURES.md §"Domain fixtures").
  *
  * The reference ships no test corpus (SURVEY §5), so parity tests need a
  * generated one that exercises every semantic corner of the data model
  * (`/root/reference/app/db/model.go:15-109`): topics arrays of length 0–4,
  * zero-data events (F2 suppression), contract-creation txs (to XOR
  * contract), uint256 value strings > 2^127, deliberate block-number gaps
  * (J10 backfill), and (from, nonce) uniqueness (Q7).
  *
  * Everything is a pure function of labels hashed with SHA-256, so the
  * corpus is reproducible bit-for-bit and query constants (a block hash, an
  * account address) can be *recomputed* at query-build time instead of
  * hard-coded. The parquet output is committed to `fixtures/evm/` so the
  * driver's DuckDB oracle can read the exact same files via
  * `read_parquet('<dir>/<table>.parquet')`.
  */
object EvmFixtures {

  val dir: String = sys.env.getOrElse("GRAFT_EVM_FIXTURES", "/root/repo/fixtures/evm")

  // ---- deterministic identity helpers ----------------------------------

  private def sha(label: String): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(label.getBytes(StandardCharsets.UTF_8))

  private def hex(bytes: Array[Byte]): String = bytes.map("%02x".format(_)).mkString

  /** 0x + 64 hex chars — block/tx hashes, topics, roots. */
  def hash32(label: String): String = "0x" + hex(sha(label))

  /** 0x + 40 hex chars — addresses. */
  def addr20(label: String): String = "0x" + hex(sha(label)).take(40)

  def blockHash(n: Long): String = if (n < 0) hash32("genesis-parent") else hash32(s"block-$n")
  def txHash(n: Long, j: Int): String = hash32(s"tx-$n-$j")
  def account(i: Int): String = addr20(s"acct-$i")
  def contractAddr(i: Int): String = addr20(s"contract-$i")
  def createdAddr(n: Long, j: Int): String = addr20(s"created-$n-$j")
  def miner(i: Int): String = addr20(s"miner-$i")
  def sig(i: Int): String = hash32(s"sig-$i")       // topic0 pool (event signatures)
  def arg(i: Int): String = hash32(s"arg-$i")       // topic1..3 pool

  // ---- corpus shape -----------------------------------------------------

  val MaxNumber: Long = 2999L
  val BaseTime: Long = 1700000000L
  val SecondsPerBlock: Long = 12L

  /** Deliberate holes for the J10 gap detector / ST2 backfill tests. */
  def isGap(n: Long): Boolean = n % 97 == 13
  def presentNumbers: Seq[Long] = (0L to MaxNumber).filterNot(isGap)
  def gapNumbers: Seq[Long] = (0L to MaxNumber).filter(isGap)

  def txCount(n: Long): Int = (n % 6).toInt
  def isCreation(n: Long, j: Int): Boolean = (n + j) % 11 == 0
  def eventCount(n: Long, j: Int): Int = ((n + j) % 4).toInt

  private val zeroData32 = new Array[Byte](32)

  def buildBlock(n: Long, nTx: Int): Block = Block(
    hash = blockHash(n), number = n, time = BaseTime + n * SecondsPerBlock,
    parenthash = blockHash(n - 1),
    difficulty = (BigInt(10).pow(15) + BigInt(n) * 1234567L).toString,
    gasused = 21000L * nTx + n % 1000, gaslimit = 30000000L,
    nonce = "0x%016x".format(n * 2654435761L),
    miner = miner((n % 10).toInt), size = 1000.0 + (n % 500).toDouble,
    stateroothash = hash32(s"state-$n"), unclehash = hash32(s"uncle-$n"),
    txroothash = hash32(s"txroot-$n"), receiptroothash = hash32(s"rcptroot-$n"),
    extradata =
      if (n % 11 == 7) null
      else if (n % 5 == 0) Array.empty[Byte]
      else sha(s"extra-$n").take((n % 28).toInt + 1),
  )

  def buildTx(n: Long, j: Int, nonce: Long): Transaction = {
    val creation = isCreation(n, j)
    val gas = 21000L + (n % 50) * 1000
    val gasprice = BigInt(1000000000L + (n % 1000) * 1000000L)
    val value =
      if ((n + j) % 13 == 0) BigInt(2).pow(128 + (n % 100).toInt) // uint256 > 2^127
      else BigInt(n * 1000003L + j) * 1000000000L
    Transaction(
      hash = txHash(n, j),
      from = account(((n * 7 + j) % 20).toInt),
      to = if (creation) "" else account(((n * 13 + j * 5 + 1) % 20).toInt),
      contract = if (creation) createdAddr(n, j) else "",
      value = value.toString,
      data = if (j % 3 == 0) Array.empty[Byte] else sha(s"txdata-$n-$j").take((n % 32).toInt + 1),
      gas = gas, gasprice = gasprice.toString,
      cost = (gasprice * gas + value).toString, // go-ethereum tx.Cost() = gasPrice*gas + value
      nonce = nonce, state = if ((n + j) % 10 == 0) 0 else 1,
      blockhash = blockHash(n),
    )
  }

  def buildEvent(n: Long, j: Int, e: Int, logIndex: Int): Event = {
    val nTopics = ((n + j + e) % 5).toInt // 0..4, exercises short-array semantics
    val topics = (0 until nTopics).map { k =>
      if (k == 0) sig(((n + e) % 5).toInt)
      else arg(((n + j * 3 + e * 5 + k) % 10).toInt)
    }
    Event(
      blockhash = blockHash(n), index = logIndex,
      origin = contractAddr(((n * 3 + j + e) % 8).toInt),
      topics = topics,
      data =
        if ((n + e) % 7 == 0) zeroData32.clone() // F2: 32 zero bytes → "" in JSON
        else if ((n + e) % 3 == 0) Array.empty[Byte]
        else sha(s"evdata-$n-$j-$e").take((n % 48).toInt + 1),
      txhash = txHash(n, j),
    )
  }

  /** The whole corpus as packed blocks (the ingest-unit shape, model.go:96-109). */
  def packedBlocks: Seq[PackedBlock] = {
    val nonces = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    presentNumbers.map { n =>
      val nTx = txCount(n)
      var logIndex = 0
      val txs = (0 until nTx).map { j =>
        val from = account(((n * 7 + j) % 20).toInt)
        val tx = buildTx(n, j, nonces(from))
        nonces(from) += 1
        val evs = (0 until eventCount(n, j)).map { e =>
          val ev = buildEvent(n, j, e, logIndex)
          logIndex += 1
          ev
        }
        PackedTransaction(tx, evs)
      }
      PackedBlock(buildBlock(n, nTx), txs)
    }
  }

  // ---- writer -----------------------------------------------------------

  /** Writes one flat parquet file per table (Spark dir output → renamed to
    * a plain file so DuckDB's `read_parquet` and Spark both read it). */
  def write(spark: SparkSession, outDir: String): Unit = {
    import spark.implicits._
    val packed = packedBlocks
    val blocks = packed.map(_.block)
    val txs = packed.flatMap(_.transactions.map(_.tx))
    val events = packed.flatMap(_.transactions.flatMap(_.events))

    def flatten(tmp: String, target: Path): Unit = {
      val part = Files.list(Paths.get(tmp)).filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.createDirectories(target.getParent)
      Files.move(part, target, StandardCopyOption.REPLACE_EXISTING)
    }

    def dump[T](ds: org.apache.spark.sql.Dataset[T], name: String): Unit = {
      val tmp = s"$outDir/_tmp_$name"
      ds.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
      flatten(tmp, Paths.get(s"$outDir/$name.parquet"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }

    dump(blocks.toDS(), "blocks")
    dump(txs.toDS(), "transactions")
    dump(events.toDS(), "events")
    dump(packed.toDS(), "packed_blocks")
    println(s"[fixtures] ${blocks.size} blocks, ${txs.size} txs, ${events.size} events → $outDir")
  }

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else dir
    val spark = GraftSession.get()
    write(spark, out)
    spark.stop()
  }
}
