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

  /** ST4 daemon summary (`syncer.go:158-170`): one aggregate pass over
    * the store — (lo, hi, n, has_holes) where holes exist iff
    * count < max − min + 1. */
  def holeSummary(blocks: DataFrame): DataFrame =
    blocks.agg(
      min(col("number")).as("lo"), max(col("number")).as("hi"),
      count(lit(1)).as("n"))
      .select(col("lo"), col("hi"), col("n"),
        (col("n") < col("hi") - col("lo") + 1).as("has_holes"))

  /** ST4 daemon predicate: the boolean the rescan loop polls. */
  def hasHoles(blocks: DataFrame): Boolean = {
    val r = holeSummary(blocks).collect()(0)
    !r.isNullAt(0) && r.getBoolean(3)
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

  object RetryLedger {
    /** Restart semantics: the ledger is deliberately NOT persisted. The
      * reference re-enqueues every unprocessed block from the store on
      * startup with fresh retry state (`app/block/syncer.go:44-101` runs
      * the same gap scan at boot; queue delays reset) — so after a crash
      * the ledger is REBUILT from the data plane: one entry per hole the
      * [[missingNumbers]] anti-join reports, due immediately, attempts
      * reset so backoff restarts from 1 s. Driver-side `.collect()` is
      * deliberate: holes are control-plane state, bounded by the gap
      * count, not by history (SURVEY §7.3). */
    def rebuild(spark: SparkSession, blocks: DataFrame, from: Long, to: Long,
        now: Long): RetryLedger =
      RetryLedger(missingNumbers(spark, blocks, from, to)
        .collect().map(_.getLong(0))
        .map(n => n -> RetryEntry(n, 0, now)).toMap)
  }

  /** S9: publish-once gate (`app/queue/queue.go:160-189,358-381`).
    *
    * **Bounded**: everything at or below `floor` (the confirmation
    * watermark of the last [[prune]]) is accounted for by the confirmed
    * tier itself, so the in-memory `published` set only holds numbers
    * above the floor — O(confirmation depth), not O(history). The
    * reference gets the same bound by evicting queue entries past the
    * confirmation pass (`queue.go:320-328`).
    *
    * **Restart-safe**: [[save]]/[[load]] round-trip the state through a
    * tiny control-plane file next to the stream checkpoint (atomic
    * tmp+rename). Publish→persist is at-least-once across a crash — the
    * same contract as the reference's Redis publish vs Postgres commit,
    * which are not transactional with each other either. */
  final case class PublishGate(floor: Long = -1L, published: Set[Long] = Set.empty) {
    def canPublish(number: Long): Boolean = number > floor && !published(number)
    def markPublished(numbers: Seq[Long]): PublishGate =
      copy(published = published ++ numbers.filter(_ > floor))
    /** Collapse everything the confirmation watermark made immutable into
      * the floor — the set stays O(depth). Call AFTER the batch's publish,
      * BEFORE its promotion (see `IngestJob.processBatch`). */
    def prune(watermark: Long): PublishGate =
      if (watermark <= floor) this
      else PublishGate(watermark, published.filter(_ > watermark))

    /** Filter a batch down to publishable blocks. Above the floor the
      * in-memory set decides; at or below it (gap backfill of history) the
      * confirmed tier decides via a bucket-pruned broadcast anti-join — a
      * backfilled hole IS publishable (the reference pushes backfilled
      * blocks through the same queue+publish path, `syncer.go:44-101`), a
      * redelivered already-confirmed block is not. */
    def publishable(packed: DataFrame, store: BlockStore): DataFrame = {
      val num = col("block.number")
      val fresh = packed.filter(num > floor)
      val recent =
        if (published.isEmpty) fresh
        else fresh.filter(!num.isin(published.toSeq: _*))
      if (floor < 0L) recent
      else {
        val old = packed.filter(num <= floor)
        val b = old.agg(min(num), max(num)).collect()(0)
        if (b.isNullAt(0)) recent
        else {
          val done = store.confirmedByNumberRange("blocks", b.getLong(0), b.getLong(1))
            .select(col("number").as("__done")).distinct()
          recent.unionByName(
            old.join(broadcast(done), num === col("__done"), "left_anti"))
        }
      }
    }

    /** Persist atomically (tmp + ATOMIC_MOVE): `floor` then one published
      * number per line. Driver-side control-plane state, like the retry
      * ledger (SURVEY §7.3) — no Spark job for a few dozen longs. */
    def save(path: String): Unit = {
      import java.nio.file.{Files, Paths, StandardCopyOption}
      val p = Paths.get(path)
      Option(p.getParent).foreach(Files.createDirectories(_))
      val tmp = Paths.get(path + ".tmp")
      val body = (floor +: published.toSeq.sorted).mkString("\n")
      Files.write(tmp, body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
  }

  object PublishGate {
    /** Rebuild the gate from its persisted state (fresh gate if absent). */
    def load(path: String): PublishGate = {
      import java.nio.file.{Files, Paths}
      val p = Paths.get(path)
      if (!Files.exists(p)) PublishGate()
      else {
        val lines = new String(Files.readAllBytes(p),
          java.nio.charset.StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty)
        PublishGate(lines.head.toLong, lines.tail.map(_.toLong).toSet)
      }
    }
  }
}
