package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{EvmFunctions => F}
import graft.ingest.PackedBlocks

/** S8: the notification sink (SURVEY §2.1) — the reference publishes each
  * stored block to Redis as JSON, strictly block → its txs → its events,
  * short-circuiting on failure (`app/block/publish_block.go:12-47`,
  * `publish_tx.go:13-96`, `publish_event.go:13-61`).
  *
  * Spark-first: one DataFrame of ordered notification messages per
  * micro-batch — `(number, tier, seq, subseq, topic, payload)` sorted by
  * (number, tier, seq, subseq) reproduces the reference's ordering exactly:
  * block first, then its transactions in packed position, then each tx's
  * events in packed position. The API tier drains it to whatever bus it
  * fronts (websocket fanout via [[SubscriptionFilter]]). */
object Publisher {

  private val msgCols = Seq(
    col("number"), col("tier"), col("seq"), col("subseq"),
    col("topic"), col("payload"))

  /** Block-tier messages plus the header columns fanout predicates need
    * (block subscriptions are unconditional, so none beyond the core). */
  private def blockFrame(packed: DataFrame): DataFrame =
    PackedBlocks.blocksOf(packed).select(
      col("number"), lit(0).as("tier"),
      lit(0).as("seq"), lit(0).as("subseq"), lit("block").as("topic"),
      to_json(struct(
        col("hash"), col("number"), col("time"), col("parenthash"),
        col("difficulty"), col("gasused"), col("gaslimit"), col("nonce"),
        col("miner"), col("size"),
        F.hexEncode(col("extradata")).as("extradata"))).as("payload"))

  private def txFrames(packed: DataFrame): DataFrame =
    packed.select(col("block.number").as("number"),
      posexplode(col("transactions")).as(Seq("seq", "pt")))

  /** Transaction-tier messages with the entity columns the ST11 matchers
    * compile against (`from`/`to`/`contract`), so tagging composes in the
    * same pass that shapes the payload. */
  private def txFrame(packed: DataFrame): DataFrame =
    txFrames(packed).select(
      col("number"), lit(1).as("tier"), col("seq"), lit(0).as("subseq"),
      lit("transaction").as("topic"),
      F.txJson(col("pt.tx.hash"), col("pt.tx.from"), col("pt.tx.to"),
        col("pt.tx.contract"), col("pt.tx.value"), col("pt.tx.data"),
        col("pt.tx.gas"), col("pt.tx.gasprice"), col("pt.tx.cost"),
        col("pt.tx.nonce"), col("pt.tx.state"), col("pt.tx.blockhash")).as("payload"),
      col("pt.tx.from").as("from"), col("pt.tx.to").as("to"),
      col("pt.tx.contract").as("contract"))

  /** Event-tier messages with `origin`/`topics` for the matchers. */
  private def evFrame(packed: DataFrame): DataFrame =
    txFrames(packed)
      .select(col("number"), col("seq"),
        posexplode(col("pt.events")).as(Seq("subseq", "ev")))
      .select(col("number"), lit(2).as("tier"), col("seq"), col("subseq"),
        lit("event").as("topic"),
        to_json(struct(
          col("ev.origin"), col("ev.index"), col("ev.topics"),
          F.eventDataJson(col("ev.data")).as("data"),
          col("ev.txhash"), col("ev.blockhash"))).as("payload"),
        col("ev.origin").as("origin"), col("ev.topics").as("topics"))

  /** The three ordered message tiers of one packed-block batch. `seq` is
    * the transaction's position in the packed block, `subseq` the event's
    * position within its transaction — the same ordering the reference
    * walks in `publish_tx.go:13-96` / `publish_event.go:13-61` (NOT
    * payload-string order, which interleaves hashes lexicographically). */
  def messages(packed: DataFrame): DataFrame =
    blockFrame(packed).select(msgCols: _*)
      .unionByName(txFrame(packed).select(msgCols: _*))
      .unionByName(evFrame(packed).select(msgCols: _*))
      .orderBy(col("number"), col("tier"), col("seq"), col("subseq"))

  /** [[messages]] with each row tagged by the subscriber ids whose ST11
    * predicate matches it, dropped when none do — the deployment shape
    * the websocket tier drains ([[graft.api.WsServer]]): one pass, the
    * matchers evaluated on the entity columns BEFORE JSON shaping, no
    * join against a second deliveries frame. */
  def deliveredMessages(packed: DataFrame,
      subs: Seq[(String, SubscriptionFilter.Subscription)]): DataFrame = {
    import SubscriptionFilter._
    val blockSubs = subs.collect { case (id, BlockSub) => id }
    val txSubs = subs.collect { case s @ (_, _: TransactionSub) => s }
    val evSubs = subs.collect { case s @ (_, _: EventSub) => s }
    val subscribers = col("subscribers")

    val tagged = blockFrame(packed)
      .select(msgCols :+ array(blockSubs.map(lit(_)): _*)
        .cast("array<string>").as("subscribers"): _*)
      .unionByName(txFrame(packed)
        .select(msgCols :+ SubscriptionFilter.tagMatches(txSubs)
          .cast("array<string>").as("subscribers"): _*))
      .unionByName(evFrame(packed)
        .select(msgCols :+ SubscriptionFilter.tagMatches(evSubs)
          .cast("array<string>").as("subscribers"): _*))
    tagged.filter(size(subscribers) > 0)
      .orderBy(col("number"), col("tier"), col("seq"), col("subseq"))
  }

  /** ST11 delivery: tag every message with the subscription ids it
    * matches, in the same single pass the matchers compile to. Transaction
    * and event subscriptions filter on entity columns, so tagging happens
    * on the entity frames before JSON shaping in a real deployment — this
    * variant re-derives the columns for a self-contained demo. */
  def deliveries(packed: DataFrame,
      subs: Seq[(String, SubscriptionFilter.Subscription)]): DataFrame = {
    import SubscriptionFilter._
    val blockSubs = subs.collect { case (id, BlockSub) => id }
    val txSubs = subs.collect { case s @ (_, _: TransactionSub) => s }
    val evSubs = subs.collect { case s @ (_, _: EventSub) => s }

    val blockD = PackedBlocks.blocksOf(packed).select(col("number"),
      lit("block").as("topic"), col("hash").as("key"),
      array(blockSubs.map(lit(_)): _*).as("subscribers"))
    val txD = PackedBlocks.transactionsOf(packed).select(
      lit(null).cast("long").as("number"), lit("transaction").as("topic"),
      col("hash").as("key"), SubscriptionFilter.tagMatches(txSubs).as("subscribers"))
    val evD = PackedBlocks.eventsOf(packed).select(
      lit(null).cast("long").as("number"), lit("event").as("topic"),
      concat(col("blockhash"), lit("#"), col("index")).as("key"),
      SubscriptionFilter.tagMatches(evSubs).as("subscribers"))

    blockD.unionByName(txD).unionByName(evD).filter(size(col("subscribers")) > 0)
  }
}
