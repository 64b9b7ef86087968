package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ingest.{Backfill, BlockStore, PackedBlocks}

/** The end-to-end streaming ingest job (SURVEY §3.3): packed blocks →
  * two-tier store with reorg handling → confirmation-watermark promotion →
  * publish-once notification stream — `foreachBatch` giving the same
  * per-batch atomicity the reference gets from one DB transaction per
  * block (`app/db/block.go:24-106`).
  *
  * A7/ST13: progress counters ride Structured Streaming's `observe()`
  * metrics instead of the reference's mutexed in-memory counters
  * (`app/data/data.go:54-82`) — no extra pass over the data.
  */
class IngestJob(spark: SparkSession, store: BlockStore, confirmations: Long,
    onPublish: DataFrame => Unit = _ => ()) {

  /** Monotonic high-water mark of seen block numbers (ST1 `latest`). */
  val latest = new AtomicReference[Long](-1L)

  /** S9 gate state file — control-plane state persisted next to the data
    * it gates, so a restarted job resumes publish-once where it left off. */
  val gatePath: String = s"${store.root}/publish_gate"
  /** S9 publish-once gate: survives across batches in memory and across
    * restarts via [[gatePath]]. */
  val gate = new AtomicReference(Backfill.PublishGate.load(gatePath))

  /** Process one micro-batch: store → publish → promote — publish precedes
    * promotion, as in the reference (the queue publishes on store,
    * `queue.go:160-189`; the confirmation pass runs later), which is what
    * lets the gate treat "in the confirmed tier" as "published long ago".
    * Usable both as a `foreachBatch` body and directly for batch backfill
    * jobs (ST2/ST3 use the same code path, as in the reference). */
  def processBatch(packed: DataFrame, batchId: Long): Unit = {
    // an idle trigger (stream started before the connector knows a head)
    // delivers an EMPTY batch: nothing to store, publish, or promote —
    // and the observe() metric below never materializes on a plan whose
    // source is empty, so skipping is correctness, not just economy
    if (packed.isEmpty) return
    store.storeBatch(packed, batchId)

    val batchMax = PackedBlocks.blocksOf(packed).agg(max("number")).collect()(0)
    if (!batchMax.isNullAt(0))
      latest.getAndUpdate(l => math.max(l, batchMax.getLong(0)))

    val g = gate.get()
    // The gate needs the batch's published numbers; they ride an
    // `observe()` metric on the frame handed to the publisher, so the
    // publisher's own sink action computes them — no separate driver job
    // per batch just to learn what was published. A publisher that runs
    // no action (or only a short-circuiting probe) leaves the metric
    // incomplete; one count() then settles it. Either way the numbers
    // reach the gate BEFORE it persists, preserving at-least-once
    // publish across a crash.
    val obs = org.apache.spark.sql.Observation()
    val toPublish = g.publishable(packed, store)
      .observe(obs, collect_set(col("block.number")).as("nums"))
      .cache()
    onPublish(toPublish)
    if (!obs.future.isCompleted) toPublish.count()
    // an all-filtered batch (e.g. a reorg refetch of an already-published
    // number) can optimize the CollectMetrics subtree away entirely —
    // a missing/incomplete metric then means "nothing was published",
    // and under-marking errs to at-least-once republish, never loss
    val nums: Seq[Long] =
      if (!obs.future.isCompleted) Seq.empty
      else try (obs.get("nums"): @unchecked) match {
        case s: scala.collection.Seq[_] => s.iterator.map(_.asInstanceOf[Long]).toSeq
        case a: Array[_] => a.iterator.map(_.asInstanceOf[Long]).toSeq
      } catch { case _: NoSuchElementException => Seq.empty }
    toPublish.unpersist()

    // prune keeps the gate O(confirmation depth); persist before promotion
    // so a crash replays as at-least-once publish, never publish-loss
    val pruned = g.markPublished(nums).prune(latest.get() - confirmations)
    gate.set(pruned)
    pruned.save(gatePath)

    store.promote(latest.get(), confirmations)
  }

  /** Wire the job to a packed-block stream with observed counters. */
  def start(packedStream: DataFrame, checkpoint: String): StreamingQuery =
    packedStream
      .observe("ingest",
        count(lit(1)).as("blocks_processed"),
        sum(size(col("transactions"))).as("txs_processed"))
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) => processBatch(batch, id) }
      .start()

  /** ST13 sync status (`app/rest/rest.go:69-90`): %synced and ETA from
    * elapsed/done × remaining. */
  def syncStatus(done: Long, target: Long, elapsedSeconds: Double): (Double, Double) = {
    val pct = if (target == 0) 100.0 else done.toDouble / target * 100.0
    val eta = if (done == 0) Double.PositiveInfinity
      else elapsedSeconds / done * (target - done)
    (pct, eta)
  }
}
