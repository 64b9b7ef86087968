package graft.ingest

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.Schemas

/** S5/S6/S7 + ST6/ST7: the write path on immutable storage (SURVEY §7.4
  * hard part #1).
  *
  * The reference stores each block atomically in one Postgres transaction
  * with reorg-aware replace semantics: same number + different hash →
  * cascade-delete the old block's txs/events and reinsert
  * (`app/db/block.go:24-106`, `:44-58`; equality audit `SimilarTo`
  * `app/db/model.go:41-57`), gated by a confirmation watermark
  * (`app/queue/queue.go:320-328`).
  *
  * Spark-first translation — a two-tier table:
  *
  *   - **Unconfirmed (hot) tier**: packed rows, one per block, keyed by
  *     `number` with an `(ingest_seq, batch_seq)` version stamp. Bounded by
  *     the confirmation depth × reorg window, so rewriting it wholesale per
  *     micro-batch is O(depth), not O(history). Replace-by-number IS the
  *     cascade delete: txs/events live inside the packed row.
  *   - **Confirmed tier**: exploded blocks/transactions/events, partitioned
  *     by `bucket = number / bucketSize`, append-only. Promotion moves
  *     `number ≤ latest − confirmations` out of the hot tier
  *     (`listener.go:124-148` re-verify pass ≙ promotion batch).
  *
  * Crash-safety contract (what the reference gets from one Postgres
  * transaction per block, re-expressed on rename-atomic storage):
  *
  *   - The hot tier swaps via write-tmp → move-aside → move-in → drop-aside;
  *     [[recoverDir]] repairs every intermediate crash state on next open,
  *     so a live hot tier always survives (old or new — never neither).
  *   - Confirmed-tier appends are **all-or-nothing**: each append writes a
  *     whole new segment directory and commits it with one atomic rename of
  *     the `_segments` manifest (the same commit-log idea Delta/Iceberg use,
  *     scaled down to one text file). A plain parquet append is NOT atomic —
  *     the committer moves task files into place one by one, so a crash
  *     mid-append would leave a block partially visible and the replay
  *     anti-join would then skip its missing rows forever. With segments, an
  *     uncommitted append is fully invisible and swept on the next write.
  *   - Promotion is **idempotent at block granularity per table**: each
  *     append anti-joins against what the confirmed tier already holds in
  *     the affected bucket range, so a foreachBatch replay after a crash
  *     between the three appends (or before the hot-tier shrink) re-appends
  *     only the rows that are actually missing.
  *
  * At 100 TB the confirmed tier is the big one and it only ever appends
  * whole partitions; the mutable working set stays O(confirmation depth).
  */
class BlockStore(spark: SparkSession, val root: String, bucketSize: Long = 1000L,
    vacuumGraceMs: Long = 60L * 60 * 1000) {

  val hotDir = s"$root/unconfirmed"
  val confirmedDir = s"$root/confirmed"

  private def hotExists: Boolean = {
    recoverDir(hotDir)
    Files.exists(Paths.get(hotDir))
  }
  private def tableDir(table: String) = s"$confirmedDir/$table"
  private def manifestOf(table: String) = s"${tableDir(table)}/_segments"

  /** Committed segment dir names, in commit order. The manifest file IS the
    * table: a segment directory not listed here does not exist as far as
    * any reader is concerned. Pure read — never mutates the directory
    * (readers may sit on read-only storage; migration is writer work). */
  private[graft] def listSegments(table: String): Seq[String] = {
    val m = Paths.get(manifestOf(table))
    if (Files.exists(m)) {
      import scala.jdk.CollectionConverters._
      Files.readAllLines(m).asScala.toSeq.filter(_.nonEmpty)
    } else Seq.empty
  }

  /** Pre-manifest layout detector: bucket= dirs directly under the table
    * dir with no `_segments` (what the pre-segment code wrote). */
  private def legacyBuckets(table: String): Seq[java.nio.file.Path] = {
    val dir = Paths.get(tableDir(table))
    if (Files.exists(dir) && !Files.exists(Paths.get(manifestOf(table)))) {
      val stream = Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        stream.iterator().asScala
          .filter(_.getFileName.toString.startsWith("bucket=")).toList
      } finally stream.close()
    } else Seq.empty
  }

  private def writeManifest(table: String, segs: Seq[String]): Unit = {
    import java.nio.file.StandardOpenOption._
    val tmp = Paths.get(manifestOf(table) + "__tmp")
    // SYNC + directory fsync: the rename alone is atomic only against
    // process crashes — on power loss some filesystems persist the rename
    // before the file data, surfacing an empty manifest that would read
    // as "no segments committed"
    Files.write(tmp, segs.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8),
      WRITE, CREATE, TRUNCATE_EXISTING, SYNC)
    Files.move(tmp, Paths.get(manifestOf(table)),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    try {
      val dirCh = java.nio.channels.FileChannel.open(Paths.get(tableDir(table)), READ)
      try dirCh.force(true) finally dirCh.close()
    } catch { case _: Exception => () } // best-effort on filesystems that refuse
  }

  /** Sweep staging dirs a crashed append left behind. Only `__seg_*`
    * STAGING dirs are swept — they were never visible to any reader, so
    * deleting them can never race an in-flight scan. A committed-then-
    * retired `seg=` dir (after [[compactConfirmed]]) may still back a
    * running query's plan and is only removed by [[vacuumConfirmed]]. */
  private def recoverConfirmed(table: String): Unit = {
    val dir = Paths.get(tableDir(table))
    if (Files.exists(dir)) {
      val stream = Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        stream.iterator().asScala
          .filter(_.getFileName.toString.startsWith("__seg_"))
          .foreach(p => deleteIfExists(p.toString))
      } finally stream.close()
    }
  }

  /** WRITER-ONLY: fold a pre-manifest-layout table (see [[legacyBuckets]])
    * into a `seg=legacy0` segment so the data keeps its history across the
    * upgrade. Readers never call this — [[confirmed]] can read the legacy
    * layout in place — so reads stay mutation-free (read-only storage,
    * no cross-process migration races). Idempotent and resumable: a crash
    * mid-move leaves some bucket= dirs unmoved and no manifest; the next
    * promote moves the rest and then commits. */
  private def migrateLegacyLayout(table: String): Unit = {
    val buckets = legacyBuckets(table)
    val legacy = Paths.get(s"${tableDir(table)}/seg=legacy0")
    if ((buckets.nonEmpty || Files.exists(legacy)) &&
        !Files.exists(Paths.get(manifestOf(table)))) {
      Files.createDirectories(legacy)
      buckets.foreach { b =>
        try Files.move(b, legacy.resolve(b.getFileName))
        catch { case _: java.nio.file.NoSuchFileException => () } // already moved
      }
      val success = Paths.get(s"${tableDir(table)}/_SUCCESS")
      try {
        if (Files.exists(success)) Files.move(success, legacy.resolve("_SUCCESS"))
      } catch { case _: java.nio.file.NoSuchFileException => () }
      writeManifest(table, Seq("seg=legacy0"))
    }
  }

  /** Physically delete retired segments — committed once, superseded by
    * [[compactConfirmed]], and retired for longer than `graceMs`. Split
    * from the manifest swap for the same reason Delta/Iceberg separate
    * commit from vacuum: a reader that resolved its file list before the
    * swap may still be scanning the old segments. The grace clock starts
    * at RETIREMENT (the swap touches the superseded dirs' mtimes), not at
    * segment write time — a segment written hours ago must still get its
    * full grace after the swap. Pick a grace comfortably above the
    * longest query; [[promote]] runs this automatically so crash-orphaned
    * segments (renamed but never committed) self-heal too. */
  def vacuumConfirmed(table: String, graceMs: Long): Unit = {
    val dir = Paths.get(tableDir(table))
    if (Files.exists(dir)) {
      val committed = listSegments(table).toSet
      val cutoff = System.currentTimeMillis() - graceMs
      val stream = Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        stream.iterator().asScala
          .filter(p => p.getFileName.toString.startsWith("seg="))
          .filterNot(p => committed(p.getFileName.toString))
          .filter(p => Files.getLastModifiedTime(p).toMillis < cutoff)
          .foreach(p => deleteIfExists(p.toString))
      } finally stream.close()
    }
  }

  def hot: DataFrame =
    if (hotExists) spark.read.parquet(hotDir)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      Schemas.packedBlock.add("ingest_seq", "long").add("batch_seq", "long"))

  def confirmed(table: String): DataFrame = {
    val schema = table match {
      case "blocks" => Schemas.blocks
      case "transactions" => Schemas.transactions
      case "events" => Schemas.events
    }
    val segs = listSegments(table)
    if (segs.nonEmpty)
      // segment dirs are named `seg=<uuid>` so discovery sees them as one
      // more partition level (Spark rejects non-k=v dirs between basePath
      // and the partition dirs): one FileIndex spans all committed
      // segments and PartitionFilters pruning on `bucket` keeps working
      spark.read.schema(schema.add("bucket", "long").add("seg", "string"))
        .option("basePath", tableDir(table))
        .parquet(segs.map(s => s"${tableDir(table)}/$s"): _*)
        .drop("seg")
    else {
      // no manifest: a pre-manifest layout, possibly with a writer's
      // migration crash mid-move — some bucket= dirs already under
      // seg=legacy0, some still at top level. Read BOTH groups by
      // explicit paths without mutating anything (the store may be
      // read-only on the query side); a single in-place read would see
      // mixed partition depths and fail, and ignoring either group
      // would silently hide rows until the writer's next promote heals.
      val legacy = Paths.get(s"${tableDir(table)}/seg=legacy0")
      val buckets = legacyBuckets(table)
      val parts = Seq(
        if (Files.exists(legacy))
          Some(spark.read.schema(schema.add("bucket", "long"))
            .parquet(legacy.toString))
        else None,
        if (buckets.nonEmpty)
          Some(spark.read.schema(schema.add("bucket", "long"))
            .option("basePath", tableDir(table))
            .parquet(buckets.map(_.toString): _*))
        else None).flatten
      if (parts.nonEmpty) parts.reduce(_ unionByName _)
      else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schema.add("bucket", "long"))
    }
  }

  /** The queryable union view per table: confirmed ∪ normalized hot. */
  def view(table: String): DataFrame = {
    val hotPacked = hot.drop("ingest_seq", "batch_seq")
    val hotRows = table match {
      case "blocks" => PackedBlocks.blocksOf(hotPacked)
      case "transactions" => PackedBlocks.transactionsOf(hotPacked)
      case "events" => PackedBlocks.eventsOf(hotPacked)
    }
    confirmed(table).drop("bucket").unionByName(hotRows)
  }

  /** Bucket-pruned range access to the confirmed tier — the replacement
    * for the reference's B-tree index on `number` (SURVEY §4): the bucket
    * partition column prunes whole directories before any file is read
    * (`PartitionFilters` in the plan), then min/max row-group stats prune
    * within the bucket. */
  def confirmedByNumberRange(table: String, lo: Long, hi: Long): DataFrame =
    confirmed(table).filter(
      col("bucket").between(lo / bucketSize, hi / bucketSize))

  /** S5 + ST7 + ST8: store a micro-batch of packed blocks into the hot
    * tier. Last writer wins per `number` (ST8 in-batch dedup + reorg
    * replace across batches — replacing the packed row cascades to its
    * txs/events by construction). `batch_seq` breaks ties WITHIN one
    * micro-batch in arrival (partition-major) order — two versions of the
    * same block in one batch resolve to the later one, matching the
    * reference's sequential per-block upsert (`app/db/block.go:44-63`),
    * instead of an arbitrary row_number pick. Blocks already promoted to
    * the confirmed tier are immutable, as in the reference after the
    * confirmed pass. */
  def storeBatch(packed: DataFrame, batchId: Long): Unit = {
    val stamped = packed
      .withColumn("ingest_seq", lit(batchId))
      .withColumn("batch_seq", monotonically_increasing_id())
    val merged = hot.unionByName(stamped)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("block.number"))
      .orderBy(col("ingest_seq").desc, col("batch_seq").desc)
    val deduped = merged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    replaceDir(deduped, hotDir)
  }

  /** ST6: promote everything at `number ≤ latest − confirmations` to the
    * confirmed tier (append, bucket-partitioned) and shrink the hot tier.
    * Idempotent: a replay of the same promotion (crash before the hot-tier
    * shrink, foreachBatch redelivery) appends nothing the confirmed tier
    * already holds — see [[appendConfirmed]]. */
  def promote(latest: Long, confirmations: Long): Long = {
    // writer-entry housekeeping, here rather than in appendConfirmed so a
    // replay that appends nothing still runs it: fold any pre-manifest
    // layout into its legacy segment, sweep staging dirs a crashed append
    // left behind, and grace-gated-vacuum retired/orphaned segments
    Seq("blocks", "transactions", "events").foreach { t =>
      migrateLegacyLayout(t)
      recoverConfirmed(t)
      vacuumConfirmed(t, vacuumGraceMs)
    }
    val watermark = latest - confirmations
    val h = hot.cache()
    val below = h.filter(col("block.number") <= watermark)
      .drop("ingest_seq", "batch_seq")
    val bounds = below.agg(
      min(col("block.number")), max(col("block.number"))).collect()(0)
    var promoted = 0L
    if (!bounds.isNullAt(0)) {
      val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
      // A number already in the confirmed tier never promotes again: a
      // replay of a fully-promoted block is a no-op, and a reorg DEEPER
      // than the confirmation depth is ignored rather than appended as a
      // duplicate number — the reference's exact semantics once the
      // confirmed pass ran (`app/db/block.go:59-63`, `queue.go:320-328`).
      val doneNums = confirmedByNumberRange("blocks", lo, hi)
        .select(col("number").as("__done")).distinct()
      val eligible = below
        .join(broadcast(doneNums), col("block.number") === col("__done"), "left_anti")
        .cache()
      promoted = eligible.count()
      if (promoted > 0) {
        // child tables carry no number; bucket them via their parent block
        // hash with a broadcast join (the promotion batch is O(confirmation
        // depth), always broadcastable). Children append FIRST and the
        // parent blocks table LAST: the blocks row is the commit marker the
        // pre-filter above keys on, so a crash between the three appends
        // replays into "children skip via their own anti-join, the rest
        // appends" instead of orphaning child rows.
        val numbers = broadcast(PackedBlocks.blocksOf(eligible)
          .select(col("hash").as("blockhash"), col("number").as("__bnum")))
        appendConfirmed(PackedBlocks.eventsOf(eligible)
          .join(numbers, Seq("blockhash")), "events", col("blockhash"), lo, hi)
        appendConfirmed(PackedBlocks.transactionsOf(eligible)
          .join(numbers, Seq("blockhash")), "transactions", col("blockhash"), lo, hi)
        appendConfirmed(PackedBlocks.blocksOf(eligible)
          .withColumn("__bnum", col("number")), "blocks", col("number"), lo, hi)
      }
      eligible.unpersist()
      replaceDir(h.filter(col("block.number") > watermark), hotDir)
    }
    h.unpersist()
    promoted
  }

  /** Append rows to a confirmed table, skipping whole blocks the table
    * already holds (anti-join on `key` against the bucket-pruned confirmed
    * slice). Each table is independently idempotent at block granularity,
    * so a crash between the three appends replays cleanly: the tables that
    * committed skip everything, the ones that didn't append their rows.
    * The append itself is all-or-nothing: the rows land in a fresh segment
    * dir that becomes visible only when the manifest rename commits it, so
    * a crash mid-write can never leave a block half-appended (which would
    * defeat the block-granularity anti-join on replay).
    * The confirmed side of the anti-join is O(bucket), broadcastable. */
  private def appendConfirmed(rows: DataFrame, table: String,
      key: org.apache.spark.sql.Column, lo: Long, hi: Long): Unit = {
    val done = confirmedByNumberRange(table, lo, hi)
      .select(key.as("__seen")).distinct()
    val fresh = rows.join(broadcast(done), key === col("__seen"), "left_anti")
    // stage under a __seg_ name (writer-sweepable, never reader-visible),
    // take the committed seg= name only at the last moment: a dir that
    // ever carried a seg= name may back an in-flight reader's plan
    val uuid = java.util.UUID.randomUUID().toString.replace("-", "")
    val stage = s"${tableDir(table)}/__seg_$uuid"
    val seg = s"seg=$uuid"
    fresh.withColumn("bucket", (col("__bnum") / bucketSize).cast("long"))
      .drop("__bnum")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("bucket")
      .parquet(stage)
    // an all-duplicates replay writes a dataless segment (just _SUCCESS);
    // committing it would give partition discovery a partitionless root
    if (hasBucketDirs(stage)) {
      Files.move(Paths.get(stage), Paths.get(s"${tableDir(table)}/$seg"))
      writeManifest(table, listSegments(table) :+ seg)
    } else deleteIfExists(stage)
  }

  private def hasBucketDirs(dir: String): Boolean = {
    val stream = Files.list(Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      stream.iterator().asScala.exists(_.getFileName.toString.startsWith("bucket="))
    } finally stream.close()
  }

  /** Rewrite all committed segments of a table into one — the small-files
    * countermeasure for a long-running stream (every promotion adds a
    * segment; at 100 TB you run this per bucket range on a schedule).
    * Crash-safe by the same staging + manifest rule as appends. The
    * superseded segment dirs are NOT deleted here: a concurrent reader
    * that resolved its file list before the swap may still be scanning
    * them — [[vacuumConfirmed]] removes them after a grace period. */
  /** Per-table clustering key for compacted files: the column(s) the
    * point-lookup surface probes (Q1/Q2 blocks by number, Q6 txs by
    * hash, Q11 events by (blockhash, index)). Sorting each compacted
    * file by it makes parquet min/max row-group stats TIGHT, so a point
    * lookup over the compacted tier skips every non-matching row group —
    * the within-bucket half of the B-tree replacement (the bucket
    * partition dirs are the other half). */
  private def sortKeyOf(table: String): Seq[org.apache.spark.sql.Column] =
    table match {
      case "blocks" => Seq(col("number"))
      case "transactions" => Seq(col("hash"))
      case "events" => Seq(col("blockhash"), col("index"))
      case _ => Seq.empty // unknown table: compact unclustered, never throw
    }

  def compactConfirmed(table: String, rowGroupBytes: Long = 128L << 20): Unit = {
    val retired = listSegments(table)
    if (retired.length > 1) {
      val uuid = java.util.UUID.randomUUID().toString.replace("-", "")
      val stage = s"${tableDir(table)}/__seg_$uuid"
      confirmed(table)
        // one task per bucket: each bucket dir gets ONE key-sorted file
        // (not one per upstream partition), stats tight per row group
        .repartition(col("bucket"))
        .sortWithinPartitions(col("bucket") +: sortKeyOf(table): _*)
        .write.mode(SaveMode.Overwrite)
        .option("parquet.block.size", rowGroupBytes.toString)
        .partitionBy("bucket")
        .parquet(stage)
      val seg = s"seg=$uuid"
      Files.move(Paths.get(stage), Paths.get(s"${tableDir(table)}/$seg"))
      // start the vacuum grace clock BEFORE the swap: a rename keeps the
      // original write mtime, and grace must measure time since
      // RETIREMENT or a segment written hours ago would be deletable the
      // instant the swap lands, while a reader may still be scanning it.
      // Touch-then-crash-pre-swap is harmless (the segments stay
      // committed); swap-then-crash-pre-touch would hand promote's
      // auto-vacuum stale mtimes and zero effective grace.
      val now = java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis())
      retired.foreach { s =>
        val p = Paths.get(s"${tableDir(table)}/$s")
        if (Files.exists(p)) Files.setLastModifiedTime(p, now)
      }
      writeManifest(table, Seq(seg))
    }
  }

  // ---- crash-safe directory replacement --------------------------------

  private def tmpOf(dir: String) = dir + "__tmp"
  private def oldOf(dir: String) = dir + "__old"

  /** Parquet has no in-place replace: write the new contents to a temp
    * dir, then swap with two renames. The live dir is moved ASIDE, never
    * deleted before the new one is in place — every crash point leaves a
    * state [[recoverDir]] can repair without data loss (the round-2 advice
    * finding: delete-then-move loses the hot tier on a crash between the
    * two). Renames on one filesystem are atomic; the `_SUCCESS` marker
    * distinguishes a complete tmp write from a torn one. */
  private def replaceDir(df: DataFrame, dir: String): Unit = {
    recoverDir(dir)
    val tmp = tmpOf(dir); val old = oldOf(dir)
    // step 1: materialize the new contents (reads the live dir, which
    // stays untouched until the write has fully committed)
    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    // step 2: live → aside (skipped on first-ever write)
    if (Files.exists(Paths.get(dir)))
      Files.move(Paths.get(dir), Paths.get(old))
    // step 3: tmp → live
    Files.move(Paths.get(tmp), Paths.get(dir))
    // step 4: drop the aside copy
    deleteIfExists(old)
  }

  /** Repair any crash state of [[replaceDir]] — called before every open
    * and every replace. Invariant restored: exactly the live dir exists
    * (holding either the pre-crash or the post-crash contents, whichever
    * the swap reached durably), no `__tmp`/`__old` leftovers remain. */
  private def recoverDir(dir: String): Unit = {
    val tmp = tmpOf(dir); val old = oldOf(dir)
    val tmpComplete = Files.exists(Paths.get(s"$tmp/_SUCCESS"))
    if (Files.exists(Paths.get(old))) {
      if (Files.exists(Paths.get(dir))) {
        // crashed after step 3: swap finished, aside not yet dropped
        deleteIfExists(old); deleteIfExists(tmp)
      } else if (tmpComplete) {
        // crashed between steps 2 and 3 with a complete tmp: roll forward
        Files.move(Paths.get(tmp), Paths.get(dir))
        deleteIfExists(old)
      } else {
        // aside exists, no complete tmp: roll back to the pre-crash live
        deleteIfExists(tmp)
        Files.move(Paths.get(old), Paths.get(dir))
      }
    } else if (Files.exists(Paths.get(tmp))) {
      if (!Files.exists(Paths.get(dir)) && tmpComplete) {
        // first-ever write crashed between steps 1 and 3: roll forward
        Files.move(Paths.get(tmp), Paths.get(dir))
      } else {
        // torn or superseded tmp write: the live dir (if any) is intact
        deleteIfExists(tmp)
      }
    }
  }

  private def deleteIfExists(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p))
      org.apache.commons.io.FileUtils.deleteDirectory(p.toFile)
  }
}
