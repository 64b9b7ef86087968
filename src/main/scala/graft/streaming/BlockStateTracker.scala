package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ST10 in-stream: the reference's per-block queue state machine
  * (`app/queue/queue.go:20-28`, actor loop `:333-605`) as
  * `flatMapGroupsWithState` custom state — the Structured Streaming form
  * for deployments that keep tracking state inside the stream instead of
  * the driver-side ledger ([[graft.ingest.Backfill.RetryLedger]]).
  *
  * Events: "seen" (header arrived), "stored" (unconfirmed tier write),
  * "confirmed" (watermark promotion), "published" (notification sent).
  * State per block number mirrors the reference's StatusOf flags; a block
  * reaching published+confirmed is emitted once and its state dropped —
  * the 100 ms GC of completed entries (`queue.go:590-600`) becomes state
  * removal. No processing-time timeout: arming one makes the engine run
  * timeout-check batches continuously (a busy loop under
  * `processAllAvailable`); abandoned-entry eviction belongs to the
  * upstream retry ledger's re-fetch path. */
object BlockStateTracker {

  final case class BlockEvent(number: Long, kind: String)
  final case class BlockState(
      seen: Boolean = false, stored: Boolean = false,
      confirmed: Boolean = false, published: Boolean = false)
  final case class BlockDone(number: Long)

  def track(events: Dataset[BlockEvent])(
      implicit spark: SparkSession): Dataset[BlockDone] = {
    import spark.implicits._
    events.groupByKey(_.number)
      .flatMapGroupsWithState[BlockState, BlockDone](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (number: Long, evs: Iterator[BlockEvent], state: GroupState[BlockState]) =>
          var s = state.getOption.getOrElse(BlockState())
          evs.foreach { e =>
            s = e.kind match {
              case "seen" => s.copy(seen = true)
              case "stored" => s.copy(stored = true)
              case "confirmed" => s.copy(confirmed = true)
              case "published" => s.copy(published = true)
              case _ => s
            }
          }
          if (s.confirmed && s.published) {
            // terminal: emit once, GC the entry (queue.go:590-600)
            state.remove()
            Iterator.single(BlockDone(number))
          } else {
            state.update(s)
            Iterator.empty
          }
      }
  }
}
