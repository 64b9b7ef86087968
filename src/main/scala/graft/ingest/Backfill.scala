package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ST2/ST3/ST4 + ST9: gap sync and the retry ledger (SURVEY §2.9).
  *
  * The reference walks ranges in 10k chunks, binary-searches each candidate
  * against the DB, and pushes misses to a worker pool
  * (`app/block/syncer.go:44-101`); a daemon rescans every minute
  * (`:152-207`); failures retry with fibonacci-ratio backoff capped at
  * 3600 s (`app/queue/queue.go:33-40`).
  *
  * Spark-first: hole detection is ONE distributed anti-join over the whole
  * range — Spark's task scheduler replaces the chunk loop and worker pool.
  * The retry ledger stays a driver-side policy object (deliberate: it is
  * control-plane state, not data-plane — SURVEY §7.3).
  */
object Backfill {

  /** ST2/J10: every number in `[from, to]` not present in `blocks`. */
  def missingNumbers(spark: SparkSession, blocks: DataFrame,
      from: Long, to: Long): DataFrame =
    spark.range(from, to + 1).toDF("number")
      .join(blocks.select("number"), Seq("number"), "left_anti")

  /** ST4 daemon predicate (`syncer.go:158-170`): holes exist iff
    * count < max − min + 1. Computed in one aggregate pass. */
  def hasHoles(blocks: DataFrame): Boolean = {
    val r = blocks.agg(
      min(col("number")).as("lo"), max(col("number")).as("hi"),
      count(lit(1)).as("n")).collect()(0)
    if (r.isNullAt(0)) false else r.getLong(2) < r.getLong(1) - r.getLong(0) + 1
  }

  /** ST9: fibonacci-ratio backoff, capped — `app/queue/queue.go:33-40`:
    * delay grows by the golden ratio per attempt, modulo-capped at 3600 s,
    * reset to 1 s on success. */
  def backoffSeconds(attempts: Int, capSeconds: Long = 3600L): Long = {
    val phi = (1.0 + math.sqrt(5.0)) / 2.0
    val d = math.pow(phi, attempts.toDouble).toLong.max(1L)
    if (d >= capSeconds) capSeconds else d
  }

  /** ST9/ST10: the per-block retry ledger — the queue actor's state
    * (`app/queue/queue.go:20-28,333-605`) reduced to a pure value. */
  final case class RetryEntry(number: Long, attempts: Int, nextAttemptAt: Long)

  final case class RetryLedger(entries: Map[Long, RetryEntry] = Map.empty) {
    /** A block failed: bump attempts, schedule the next try. */
    def failed(number: Long, now: Long): RetryLedger = {
      val attempts = entries.get(number).map(_.attempts + 1).getOrElse(1)
      copy(entries + (number -> RetryEntry(number, attempts, now + backoffSeconds(attempts))))
    }

    /** A block succeeded: drop it (delay resets — queue.go:404). */
    def succeeded(number: Long): RetryLedger = copy(entries - number)

    /** The retry pump's poll (`app/block/retry.go:20-61`): due entries. */
    def due(now: Long): Seq[RetryEntry] =
      entries.values.filter(_.nextAttemptAt <= now).toSeq.sortBy(_.number)
  }

  /** S9: publish-once gate (`app/queue/queue.go:160-189,358-381`) — pure
    * set semantics so stream restarts can rebuild it from a checkpoint. */
  final case class PublishGate(published: Set[Long] = Set.empty) {
    def canPublish(number: Long): Boolean = !published(number)
    def markPublished(numbers: Seq[Long]): PublishGate = copy(published ++ numbers)
    /** Filter a batch down to publishable blocks, oldest first
      * (publish ordering block→tx→event is per entity within a batch). */
    def publishable(packed: DataFrame): DataFrame = {
      val gate = published
      if (gate.isEmpty) packed
      else packed.filter(!col("block.number").isin(gate.toSeq: _*))
    }
  }
}
