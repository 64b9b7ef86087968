package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.fixtures.EvmFixtures
import graft.ingest.{Backfill, BlockStore, PackedBlocks}
import graft.schema.Model._
import graft.streaming.IngestJob

/** The write path end-to-end (FIXTURES.md streaming scenarios): normalize,
  * two-tier store, confirmation watermark, reorg retraction, duplicate
  * replay, gap backfill, publish-once. */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir = Files.createTempDirectory("graft-ingest").toString

  /** A tiny deterministic packed chain n ∈ [0, 9]. */
  private def packed(n: Long, salt: String = ""): PackedBlock = {
    val nTx = (n % 3).toInt
    val block = EvmFixtures.buildBlock(n, nTx)
      .copy(hash = EvmFixtures.hash32(s"block-$n$salt"))
    val txs = (0 until nTx).map { j =>
      val tx = EvmFixtures.buildTx(n, j, j).copy(
        hash = EvmFixtures.hash32(s"tx-$n-$j$salt"), blockhash = block.hash)
      val evs = (0 until (n % 2).toInt).map(e =>
        EvmFixtures.buildEvent(n, j, e, e).copy(
          blockhash = block.hash, txhash = tx.hash))
      PackedTransaction(tx, evs)
    }
    PackedBlock(block, txs)
  }

  test("normalize: explode packed → 3 tables with consistent FKs") {
    val df = Seq(packed(1), packed(2), packed(5)).toDF()
    assert(PackedBlocks.blocksOf(df).count() === 3)
    val txs = PackedBlocks.transactionsOf(df)
    val evs = PackedBlocks.eventsOf(df)
    assert(txs.count() === (1 % 3) + (2 % 3) + (5 % 3))
    val blockHashes = PackedBlocks.blocksOf(df).select("hash")
      .collect().map(_.getString(0)).toSet
    assert(txs.select("blockhash").collect().map(_.getString(0)).forall(blockHashes))
    assert(evs.select("blockhash").collect().map(_.getString(0)).forall(blockHashes))
  }

  test("two-tier store: nothing promotes before depth N (queue.go:320-328)") {
    val store = new BlockStore(spark, tmpDir)
    val job = new IngestJob(spark, store, confirmations = 3)
    job.processBatch((0L to 5L).map(packed(_)).toDF(), batchId = 0)
    // latest=5, depth 3 → watermark 2: blocks 0..2 confirmed, 3..5 hot
    assert(store.confirmed("blocks").select("number").collect()
      .map(_.getLong(0)).toSet === Set(0L, 1L, 2L))
    assert(store.hot.select("block.number").collect()
      .map(_.getLong(0)).toSet === Set(3L, 4L, 5L))
    // the queryable view sees everything exactly once
    assert(store.view("blocks").select("number").collect()
      .map(_.getLong(0)).sorted.toSeq === (0L to 5L))
  }

  test("reorg replay replaces exactly one block's rows, children cascade (block.go:44-58)") {
    val store = new BlockStore(spark, tmpDir)
    val job = new IngestJob(spark, store, confirmations = 5)
    job.processBatch((0L to 6L).map(packed(_)).toDF(), batchId = 0)
    val before = store.view("transactions").collect().map(_.getAs[String]("hash")).toSet

    // block 4 re-arrives with a different hash (SimilarTo fails → replace)
    job.processBatch(Seq(packed(4, salt = "-reorg")).toDF(), batchId = 1)
    val blocks4 = store.view("blocks").filter(col("number") === 4)
      .collect().map(_.getAs[String]("hash"))
    assert(blocks4.length === 1)
    assert(blocks4.head === EvmFixtures.hash32("block-4-reorg"))
    // children of the old block-4 are gone; other blocks untouched
    val after = store.view("transactions").collect().map(_.getAs[String]("hash")).toSet
    val oldTx = EvmFixtures.hash32("tx-4-0")
    val newTx = EvmFixtures.hash32("tx-4-0-reorg")
    assert(before.contains(oldTx) && !after.contains(oldTx) && after.contains(newTx))
    assert((before - oldTx) === (after - newTx))
  }

  test("duplicate replay is a no-op (block.go:59-63)") {
    val store = new BlockStore(spark, tmpDir)
    val job = new IngestJob(spark, store, confirmations = 5)
    job.processBatch((0L to 4L).map(packed(_)).toDF(), batchId = 0)
    val before = store.view("blocks").collect().map(_.getAs[String]("hash")).sorted
    job.processBatch(Seq(packed(3)).toDF(), batchId = 1)
    val after = store.view("blocks").collect().map(_.getAs[String]("hash")).sorted
    assert(before.sameElements(after))
  }

  test("gap backfill finds exactly the holes (syncer.go:21-37, ST2)") {
    val store = new BlockStore(spark, tmpDir)
    val job = new IngestJob(spark, store, confirmations = 0)
    job.processBatch(Seq(0L, 1L, 2L, 5L, 6L, 9L).map(packed(_)).toDF(), batchId = 0)
    val blocks = store.view("blocks")
    assert(Backfill.hasHoles(blocks))
    val holes = Backfill.missingNumbers(spark, blocks, 0, 9)
      .collect().map(_.getLong(0)).toSet
    assert(holes === Set(3L, 4L, 7L, 8L))
    // backfill runs through the same code path; afterwards no holes remain
    job.processBatch(Seq(3L, 4L, 7L, 8L).map(packed(_)).toDF(), batchId = 1)
    assert(!Backfill.hasHoles(store.view("blocks")))
  }

  test("publish-once gate: re-delivery does not republish (queue.go:358-381)") {
    val store = new BlockStore(spark, tmpDir)
    var published = Vector.empty[Long]
    val job = new IngestJob(spark, store, confirmations = 0,
      onPublish = df => published ++= PackedBlocks.blocksOf(df)
        .select("number").collect().map(_.getLong(0)).sorted)
    job.processBatch((0L to 3L).map(packed(_)).toDF(), batchId = 0)
    job.processBatch(Seq(packed(2), packed(4)).toDF(), batchId = 1)
    assert(published === Vector(0L, 1L, 2L, 3L, 4L)) // 2 published exactly once
  }

  test("hot-tier swap: every crash state recovers without losing the tier") {
    import java.nio.file.{Files => F, Paths => P}
    val store = new BlockStore(spark, tmpDir)
    val job = new IngestJob(spark, store, confirmations = 10)
    job.processBatch((0L to 3L).map(packed(_)).toDF(), batchId = 0)
    val want = store.view("blocks").select("number").collect()
      .map(_.getLong(0)).toSet
    assert(want === (0L to 3L).toSet)

    // crash between live→aside and tmp→live, tmp torn (no _SUCCESS): the
    // aside copy must be restored
    F.move(P.get(store.hotDir), P.get(store.hotDir + "__old"))
    F.createDirectories(P.get(store.hotDir + "__tmp"))
    assert(store.hot.select("block.number").collect()
      .map(_.getLong(0)).toSet === want)
    assert(!F.exists(P.get(store.hotDir + "__old")))
    assert(!F.exists(P.get(store.hotDir + "__tmp")))

    // crash after tmp→live but before dropping the aside copy: the live
    // (newer) dir must win and the aside copy must be dropped
    F.createDirectories(P.get(store.hotDir + "__old"))
    assert(store.hot.select("block.number").collect()
      .map(_.getLong(0)).toSet === want)
    assert(!F.exists(P.get(store.hotDir + "__old")))

    // crash between a COMPLETE tmp write and the swap: roll forward
    val tmp = store.hotDir + "__tmp"
    org.apache.commons.io.FileUtils.copyDirectory(
      P.get(store.hotDir).toFile, P.get(tmp).toFile)
    F.move(P.get(store.hotDir), P.get(store.hotDir + "__old"))
    assert(F.exists(P.get(s"$tmp/_SUCCESS")), "fixture assumes _SUCCESS marker")
    assert(store.hot.select("block.number").collect()
      .map(_.getLong(0)).toSet === want)
    assert(!F.exists(P.get(store.hotDir + "__old")))
    assert(!F.exists(P.get(tmp)))
  }

  test("promote is idempotent: replay and per-table crash replay append nothing twice") {
    val store = new BlockStore(spark, tmpDir)
    val job = new IngestJob(spark, store, confirmations = 3)
    job.processBatch((0L to 5L).map(packed(_)).toDF(), batchId = 0)
    val counts = Seq("blocks", "transactions", "events")
      .map(t => t -> store.confirmed(t).count()).toMap
    assert(counts("blocks") === 3L) // 0..2 promoted

    // plain replay of the same promotion: a no-op
    assert(store.promote(latest = 5, confirmations = 3) === 0L)
    counts.foreach { case (t, n) => assert(store.confirmed(t).count() === n) }

    // simulate a crash where children committed but the parent blocks
    // append did not (blocks is written LAST = it is the commit marker):
    // redelivery must re-append exactly the blocks rows and no child rows
    org.apache.commons.io.FileUtils.deleteDirectory(
      java.nio.file.Paths.get(s"${store.confirmedDir}/blocks").toFile)
    job.processBatch((0L to 2L).map(packed(_)).toDF(), batchId = 1)
    counts.foreach { case (t, n) => assert(store.confirmed(t).count() === n,
      s"$t row count changed across crash replay") }
    assert(store.view("transactions").count() ===
      store.view("transactions").select("hash").distinct().count())
  }

  test("torn confirmed append is invisible and swept; replay restores the rows") {
    val store = new BlockStore(spark, tmpDir)
    val job = new IngestJob(spark, store, confirmations = 3)
    job.processBatch((0L to 5L).map(packed(_)).toDF(), batchId = 0)
    val want = store.confirmed("events").count()

    // simulate a crash mid-append: a segment dir holding SOME of a block's
    // rows exists on disk but the manifest rename never ran. A plain
    // parquet append would have made these rows visible (and the replay
    // anti-join would then skip the block's missing rows forever); the
    // manifest rule keeps the whole segment invisible instead.
    val torn = s"${store.confirmedDir}/events/__seg_torn0000"
    store.confirmed("events").limit(1)
      .write.partitionBy("bucket").parquet(torn)
    assert(store.confirmed("events").count() === want, "uncommitted segment leaked")

    // replay of the same promotion: still a no-op row-wise, and the torn
    // segment is swept by the writer before it appends
    job.processBatch((0L to 2L).map(packed(_)).toDF(), batchId = 1)
    assert(store.confirmed("events").count() === want)
    assert(!Files.exists(java.nio.file.Paths.get(torn)), "torn segment not swept")
  }

  test("compactConfirmed folds segments into one; vacuum removes retired dirs") {
    val store = new BlockStore(spark, tmpDir)
    val job = new IngestJob(spark, store, confirmations = 0)
    job.processBatch((0L to 4L).map(packed(_)).toDF(), batchId = 0)
    job.processBatch((5L to 9L).map(packed(_)).toDF(), batchId = 1)
    val before = store.confirmed("transactions").collect()
      .map(_.getAs[String]("hash")).sorted.toSeq
    store.compactConfirmed("transactions")
    def segDirs = java.nio.file.Paths.get(s"${store.confirmedDir}/transactions")
      .toFile.listFiles().count(_.getName.startsWith("seg="))
    // the swap retires the old segments but does NOT delete them — an
    // in-flight reader may still be scanning; physical removal is vacuum's
    assert(segDirs === 3, "retired segments must survive the manifest swap")
    val after = store.confirmed("transactions").collect()
      .map(_.getAs[String]("hash")).sorted.toSeq
    assert(after === before)
    // inside the grace period nothing is deleted (the swap touched the
    // retired dirs' mtimes, so the clock starts at retirement)
    store.vacuumConfirmed("transactions", graceMs = 60000)
    assert(segDirs === 3, "vacuum within the grace period must keep retired segments")
    Thread.sleep(50)
    store.vacuumConfirmed("transactions", graceMs = 10)
    assert(segDirs === 1, "vacuum past the grace period drops retired segments")
    assert(store.confirmed("transactions").count() === before.length)
  }

  test("compaction clusters every bucket file by its lookup key") {
    val store = new BlockStore(spark, tmpDir)
    val job = new IngestJob(spark, store, confirmations = 0)
    // two appends in REVERSE number order: the pre-compaction segments
    // are deliberately unsorted, so any ordering below is compaction's
    job.processBatch((20L to 39L).reverse.map(packed(_)).toDF(), batchId = 0)
    job.processBatch((0L to 19L).reverse.map(packed(_)).toDF(), batchId = 1)
    store.compactConfirmed("blocks", rowGroupBytes = 4 * 1024)
    store.compactConfirmed("transactions")

    def compactedFiles(table: String): Seq[String] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(
          java.nio.file.Paths.get(s"${store.confirmedDir}/$table"))
        .iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") &&
          !p.getFileName.toString.startsWith("_"))
        .map(_.toString).toSeq
        // only the LIVE segment (the compacted one): retired segments
        // keep their unsorted files until vacuum
        .filter(_.contains(store.listSegments(table).head))
    }
    // within every compacted blocks file, numbers are ascending — the
    // invariant that makes min/max row-group stats disjoint, so the
    // point-lookup surface (Q1/Q2) skips non-matching groups
    // (SortedLayoutSpec pins the resulting scan metrics at volume)
    val blockFiles = compactedFiles("blocks")
    assert(blockFiles.nonEmpty)
    for (f <- blockFiles) {
      val nums = spark.read.parquet(f).select("number")
        .collect().map(_.getLong(0)).toSeq
      assert(nums === nums.sorted, s"compacted file $f is not number-sorted")
    }
    // and transactions files are hash-sorted (Q6's probe key)
    for (f <- compactedFiles("transactions")) {
      val hs = spark.read.parquet(f).select("hash")
        .collect().map(_.getString(0)).toSeq
      assert(hs === hs.sorted, s"compacted file $f is not hash-sorted")
    }
    // compaction reorders storage, never rows: the tier round-trips
    assert(store.confirmed("blocks").select("number").collect()
      .map(_.getLong(0)).sorted.toSeq === (0L to 39L))
  }

  test("pre-manifest layout migrates to seg=legacy0 instead of vanishing") {
    import java.nio.file.{Files => F, Paths => P}
    val store = new BlockStore(spark, tmpDir)
    val job = new IngestJob(spark, store, confirmations = 0)
    job.processBatch((0L to 5L).map(packed(_)).toDF(), batchId = 0)
    val want = store.confirmed("blocks").count()

    // rewrite the table dir into the OLD layout: bucket= dirs at top
    // level, no _segments manifest (what pre-segment code wrote)
    val dir = P.get(s"${store.confirmedDir}/blocks")
    val seg = dir.toFile.listFiles().filter(_.getName.startsWith("seg=")).head
    F.delete(dir.resolve("_segments"))
    seg.listFiles().foreach(f => F.move(f.toPath, dir.resolve(f.getName)))
    F.delete(seg.toPath)

    // readers see the legacy layout IN PLACE without mutating anything
    // (the store may be mounted read-only on the query side)
    assert(store.confirmed("blocks").count() === want, "legacy rows lost")
    assert(!F.exists(dir.resolve("_segments")), "a read must not migrate")

    // writer crashed MID-migration: one bucket already under seg=legacy0,
    // the rest still at top level, no manifest — the reader must union
    // both groups, not error on mixed depths or drop either side
    val firstBucket = dir.toFile.listFiles()
      .filter(_.getName.startsWith("bucket=")).minBy(_.getName)
    F.createDirectories(dir.resolve("seg=legacy0"))
    F.move(firstBucket.toPath, dir.resolve("seg=legacy0").resolve(firstBucket.getName))
    assert(store.confirmed("blocks").count() === want, "mid-migration rows lost")

    // crash JUST before the manifest write: everything moved, no manifest
    dir.toFile.listFiles().filter(_.getName.startsWith("bucket=")).foreach(b =>
      F.move(b.toPath, dir.resolve("seg=legacy0").resolve(b.getName)))
    assert(store.confirmed("blocks").count() === want, "pre-manifest rows lost")

    // the writer resumes and completes on its next batch; the table then
    // works as a normal segmented one
    job.processBatch(Seq(packed(6)).toDF(), batchId = 1)
    assert(F.exists(dir.resolve("seg=legacy0")) && F.exists(dir.resolve("_segments")))
    assert(store.confirmed("blocks").count() === want + 1)
  }

  test("reorg deeper than the confirmation depth is ignored (block.go:59-63)") {
    val store = new BlockStore(spark, tmpDir)
    val job = new IngestJob(spark, store, confirmations = 1)
    job.processBatch((0L to 4L).map(packed(_)).toDF(), batchId = 0)
    // block 1 is long confirmed; a conflicting version arrives late
    job.processBatch(Seq(packed(1, salt = "-deep")).toDF(), batchId = 1)
    val b1 = store.view("blocks").filter(col("number") === 1)
      .collect().map(_.getAs[String]("hash"))
    assert(b1.toSeq === Seq(EvmFixtures.hash32("block-1")),
      "confirmed tier must keep the original block, once")
  }

  test("in-batch duplicate of one number resolves to the LATER arrival (ST8)") {
    val store = new BlockStore(spark, tmpDir)
    val job = new IngestJob(spark, store, confirmations = 10)
    job.processBatch(Seq(packed(4), packed(4, salt = "-b")).toDF(), batchId = 0)
    val b4 = store.view("blocks").filter(col("number") === 4)
      .collect().map(_.getAs[String]("hash"))
    assert(b4.toSeq === Seq(EvmFixtures.hash32("block-4-b")))
  }

  test("publish gate survives a restart and stays bounded (S9)") {
    val dir = tmpDir
    val store = new BlockStore(spark, dir)
    var published = Vector.empty[Long]
    val job = new IngestJob(spark, store, confirmations = 2,
      onPublish = df => published ++= PackedBlocks.blocksOf(df)
        .select("number").collect().map(_.getLong(0)).sorted)
    job.processBatch((0L to 5L).map(packed(_)).toDF(), batchId = 0)
    assert(published === Vector(0L, 1L, 2L, 3L, 4L, 5L))
    // bounded: watermark = 3 → only numbers above it stay in the set
    assert(job.gate.get().floor === 3L)
    assert(job.gate.get().published.forall(_ > 3L))

    // a NEW job on the same store (restart) must not republish anything —
    // neither above the floor (persisted set) nor below it (confirmed tier)
    val job2 = new IngestJob(spark, store, confirmations = 2,
      onPublish = df => published ++= PackedBlocks.blocksOf(df)
        .select("number").collect().map(_.getLong(0)).sorted)
    assert(job2.gate.get() === job.gate.get())
    job2.processBatch(Seq(packed(2), packed(5), packed(6)).toDF(), batchId = 1)
    assert(published === Vector(0L, 1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("retry ledger: fibonacci backoff capped, reset on success (queue.go:33-40)") {
    import Backfill._
    assert(backoffSeconds(1) === 1L)
    assert(backoffSeconds(5) === 11L)
    assert((1 to 30).map(backoffSeconds(_)).max === 3600L)
    assert(backoffSeconds(8) > backoffSeconds(5))

    var ledger = RetryLedger()
    ledger = ledger.failed(7, now = 100)
    ledger = ledger.failed(7, now = 100)
    ledger = ledger.failed(9, now = 100)
    assert(ledger.entries(7).attempts === 2)
    assert(ledger.due(now = 100 + 3600).map(_.number) === Seq(7L, 9L))
    assert(ledger.due(now = 100).isEmpty)
    ledger = ledger.succeeded(7)
    assert(!ledger.entries.contains(7L))
  }

  test("retry ledger restart: rebuilt from store holes, attempts reset (ST9)") {
    import Backfill._
    import spark.implicits._
    // pre-crash: 3 and 7 failing with climbing backoff, 5 succeeded
    var ledger = RetryLedger()
    (1 to 4).foreach(_ => ledger = ledger.failed(3, now = 100))
    ledger = ledger.failed(7, now = 100)
    ledger = ledger.succeeded(5)
    assert(ledger.entries(3L).attempts === 4)

    // crash: ledger is gone; the store has everything in [0, 9] except 3, 7, 8
    val blocks = (0L to 9L).filterNot(Set(3L, 7L, 8L)).toDF("number")
    val rebuilt = RetryLedger.rebuild(spark, blocks, from = 0, to = 9, now = 500)

    // exactly the holes, all due immediately, attempts reset
    assert(rebuilt.entries.keySet === Set(3L, 7L, 8L))
    assert(rebuilt.due(now = 500).map(_.number) === Seq(3L, 7L, 8L))
    assert(rebuilt.entries.values.forall(_.attempts === 0))
    // backoff restarts from the bottom of the curve, as on a reference boot
    val after = rebuilt.failed(3, now = 500)
    assert(after.entries(3L).nextAttemptAt === 500 + backoffSeconds(1))
  }

  test("confirmed tier prunes by bucket partition before reading files") {
    val store = new BlockStore(spark, tmpDir, bucketSize = 2)
    val job = new IngestJob(spark, store, confirmations = 0)
    job.processBatch((0L to 9L).map(packed(_)).toDF(), batchId = 0)
    val pruned = store.confirmedByNumberRange("blocks", 4, 5)
    assert(pruned.collect().map(_.getAs[Long]("number")).toSet === Set(4L, 5L))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"expected partition pruning in plan:\n$plan")
  }

  test("ST1 monotonicity probe flags numbers ahead of the expected head") {
    val df = Seq(packed(5), packed(9)).toDF()
    assert(PackedBlocks.aheadOf(df, expectedNext = 6).collect()
      .map(_.getLong(0)).toSet === Set(9L))
  }
}
