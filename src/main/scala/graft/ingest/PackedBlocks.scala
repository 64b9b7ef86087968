package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.Schemas

/** S4: packed-block assembly/normalization (SURVEY §2.1).
  *
  * The reference builds a nested `PackedBlock{Block, []PackedTransaction
  * {Tx, []Event}}` per block in flight (`app/db/model.go:96-109`,
  * `app/block/pack_block.go:11-36`, `pack_tx.go:12-67`) and then writes
  * three relational tables. Here the same normalization is three
  * `explode`-projections of one nested DataFrame — executed together they
  * share the single scan of the packed input.
  */
object PackedBlocks {

  /** Read a drop-zone of packed-block parquet as a stream — the file-based
    * v1 stand-in for a chain-node subscription source (S1). A custom
    * `MicroBatchStream` wrapping JSON-RPC would slot in here without
    * touching anything downstream. */
  def readStream(spark: SparkSession, dropZone: String): DataFrame =
    spark.readStream.schema(Schemas.packedBlock).parquet(dropZone)

  def readBatch(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.packedBlock).parquet(path)

  /** The `blocks` rows of a packed frame. */
  def blocksOf(packed: DataFrame): DataFrame =
    packed.select(col("block.*"))

  /** The `transactions` rows — one `explode` (model.go:96-103). */
  def transactionsOf(packed: DataFrame): DataFrame =
    packed.select(explode(col("transactions")).as("pt")).select(col("pt.tx.*"))

  /** The `events` rows — two nested explodes (model.go:105-109). */
  def eventsOf(packed: DataFrame): DataFrame =
    packed
      .select(explode(col("transactions")).as("pt"))
      .select(explode(col("pt.events")).as("ev"))
      .select(col("ev.*"))

  /** ST1 sanity checks on an incoming micro-batch, mirroring the header
    * listener (`app/block/listener.go:49-73`): returns the numbers that
    * jump ahead of `expectedNext` (crash-worthy in the reference) — reorg
    * replays (number ≤ latest) are legal and handled by the store. */
  def aheadOf(packed: DataFrame, expectedNext: Long): DataFrame =
    blocksOf(packed).select(col("number")).filter(col("number") > expectedNext)
}
