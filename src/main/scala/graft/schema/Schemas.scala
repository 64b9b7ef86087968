package graft.schema

import org.apache.spark.sql.types._

/** Canonical schemas of the EVM data model (SURVEY §1).
  *
  * Mirrors the reference's three PostgreSQL tables
  * (`/root/reference/app/db/model.go:15-89`) and the nested in-flight
  * packed-block document (`model.go:96-109`, `proto/block.proto:6-23`).
  *
  * Representation choices (SURVEY §1.2):
  *   - hashes/addresses: lowercase `0x…` hex StringType
  *   - uint256 quantities (difficulty, value, gasprice, cost): decimal
  *     strings, exactly like the reference (`big.Int.String()` at
  *     `app/block/pack_tx.go:25-27`) — DecimalType(38) cannot hold 2^256
  *   - time: unix-seconds LongType (not TimestampType) for exact parity
  *   - tx input / event data / extradata: BinaryType
  *   - topics: ArrayType(StringType) with 0–4 positional elements
  *   - `to` XOR `contract`: empty-string encoding as used by the
  *     reference's predicates (`app/db/query.go:377` `contract <> ''`)
  *
  * All column names are lowercase so Spark-written parquet and DuckDB
  * SQL agree on identifiers without quoting games.
  */
object Schemas {

  val blocks: StructType = StructType(Seq(
    StructField("hash", StringType, nullable = false),
    StructField("number", LongType, nullable = false),
    StructField("time", LongType, nullable = false),
    StructField("parenthash", StringType, nullable = false),
    StructField("difficulty", StringType, nullable = false),
    StructField("gasused", LongType, nullable = false),
    StructField("gaslimit", LongType, nullable = false),
    StructField("nonce", StringType, nullable = false),
    StructField("miner", StringType, nullable = false),
    StructField("size", DoubleType, nullable = false),
    StructField("stateroothash", StringType, nullable = false),
    StructField("unclehash", StringType, nullable = false),
    StructField("txroothash", StringType, nullable = false),
    StructField("receiptroothash", StringType, nullable = false),
    StructField("extradata", BinaryType, nullable = true),
  ))

  val transactions: StructType = StructType(Seq(
    StructField("hash", StringType, nullable = false),
    StructField("from", StringType, nullable = false),
    StructField("to", StringType, nullable = false),       // "" for creations
    StructField("contract", StringType, nullable = false), // "" for normal txs
    StructField("value", StringType, nullable = false),    // uint256 decimal string
    StructField("data", BinaryType, nullable = true),
    StructField("gas", LongType, nullable = false),
    StructField("gasprice", StringType, nullable = false),
    StructField("cost", StringType, nullable = false),
    StructField("nonce", LongType, nullable = false),
    StructField("state", IntegerType, nullable = false),   // receipt status 0/1
    StructField("blockhash", StringType, nullable = false),
  ))

  val events: StructType = StructType(Seq(
    StructField("blockhash", StringType, nullable = false),
    StructField("index", IntegerType, nullable = false),
    StructField("origin", StringType, nullable = false),
    StructField("topics", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("data", BinaryType, nullable = true),
    StructField("txhash", StringType, nullable = false),
  ))

  /** Nested in-flight unit for the streaming path (model.go:96-109):
    * block + its transactions, each with its events. */
  val packedBlock: StructType = StructType(Seq(
    StructField("block", blocks, nullable = false),
    StructField("transactions", ArrayType(StructType(Seq(
      StructField("tx", transactions, nullable = false),
      StructField("events", ArrayType(events, containsNull = false), nullable = false),
    )), containsNull = false), nullable = false),
  ))
}

/** Case classes for the typed ingest boundary (Dataset[PackedBlock]).
  * The query layer stays untyped DataFrame — every reference query is
  * dynamic filter/join/project with no per-row business logic. */
object Model {
  final case class Block(
      hash: String, number: Long, time: Long, parenthash: String,
      difficulty: String, gasused: Long, gaslimit: Long, nonce: String,
      miner: String, size: Double, stateroothash: String, unclehash: String,
      txroothash: String, receiptroothash: String, extradata: Array[Byte])

  final case class Transaction(
      hash: String, from: String, to: String, contract: String,
      value: String, data: Array[Byte], gas: Long, gasprice: String,
      cost: String, nonce: Long, state: Int, blockhash: String)

  final case class Event(
      blockhash: String, index: Int, origin: String, topics: Seq[String],
      data: Array[Byte], txhash: String)

  final case class PackedTransaction(tx: Transaction, events: Seq[Event])

  final case class PackedBlock(block: Block, transactions: Seq[PackedTransaction])
}
