package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.pipeline.{H264Nal, Vp9Ivf}
import graft.sources.MediaSource

/** DSv2 batch media source: directory scan → (path, size, mtime, bytes,
  * meta) with structural decode at scan time, size-balanced partitions,
  * and column pruning that skips the file read entirely for
  * metadata-only projections. */
class MediaSourceSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("media_src").toString
    Files.createDirectories(Paths.get(d, "sub"))
    (0 until 6).foreach { i =>
      Files.write(Paths.get(d, f"clip_$i%02d.ivf"), Vp9Ivf.generate(i.toLong))
    }
    (0 until 4).foreach { i =>
      Files.write(Paths.get(d, "sub", f"clip_$i%02d.h264"), H264Nal.generate(i.toLong))
    }
    d
  }

  private def read(decode: String) =
    spark.read.format("graft.sources.MediaSource")
      .option("decode", decode).load(dir)

  test("recursive listing surfaces every file with its true size") {
    val rows = read("none").select("path", "size").collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      assert(r.getLong(1) === Files.size(Paths.get(r.getString(0))))
    }
    assert(rows.count(_.getString(0).contains("/sub/")) === 4)
  }

  test("bytes column round-trips file content exactly") {
    val r = read("none").filter(col("path").endsWith("clip_03.ivf"))
      .select("bytes").collect().head
    assert(r.getAs[Array[Byte]](0).toSeq === Vp9Ivf.generate(3L).toSeq)
  }

  test("decode=vp9 runs the structural parser at scan time") {
    val m = read("vp9").filter(col("path").endsWith("clip_05.ivf"))
      .select("meta.frames", "meta.width", "meta.ivf_width").collect().head
    assert(m.getLong(0) === (5 % 7) + 1)
    assert(m.getInt(1) === m.getInt(2) + 1) // bitstream width ≠ container width
    // non-VP9 files in the same tree decode to null, not an error
    val h = read("vp9").filter(col("path").endsWith(".h264"))
      .select("meta").collect()
    assert(h.length === 4 && h.forall(_.isNullAt(0)))
  }

  test("decode=h264 surfaces the SPS geometry") {
    val m = read("h264").filter(col("path").endsWith("clip_02.h264"))
      .select("meta.width", "meta.profile_idc").collect().head
    assert(m.getInt(0) === (2 % 120 + 1) * 16 - 2 * (2 % 8))
    assert(m.getInt(1) === 100) // seed 2 → profile index 2
  }

  test("metadata-only projection never opens a file") {
    MediaSource.contentReads.set(0)
    val n = read("vp9").select("path", "size", "mtime_ms").count()
    assert(n === 10)
    assert(MediaSource.contentReads.get() === 0L,
      "path/size/count projection must not read file contents")
    // count() prunes even an explicit select(meta) to zero columns —
    // still no read. Materializing meta DOES read, once per file.
    MediaSource.contentReads.set(0)
    assert(read("vp9").select("meta").count() === 10)
    assert(MediaSource.contentReads.get() === 0L)
    MediaSource.contentReads.set(0)
    read("vp9").select("meta").collect()
    assert(MediaSource.contentReads.get() === 10L)
  }

  test("partitions bin-pack by cumulative size") {
    val tiny = spark.read.format("graft.sources.MediaSource")
      .option("decode", "none").option("partitionTargetBytes", "1").load(dir)
    assert(tiny.rdd.getNumPartitions === 10) // one per file at a 1-byte target
    val one = read("none")
    assert(one.rdd.getNumPartitions === 1) // all files fit 128 MiB
  }

  test("path-suffix and size filters push into the listing") {
    val ivf = read("none").filter(col("path").endsWith(".ivf"))
      .select("path").collect()
    assert(ivf.length === 6)
    assert(MediaSource.filesListedLastWalk.get() === 6L,
      "suffix filter must drop files at the walk, not post-scan")
    val cut = read("none").filter(col("size") > 100L).select("path", "size").collect()
    cut.foreach(r => assert(r.getLong(1) > 100L))
    assert(MediaSource.filesListedLastWalk.get() === cut.length.toLong)
  }

  test("a path-prefix filter prunes whole subtrees before descent") {
    val sub = read("none")
      .filter(col("path").startsWith(Paths.get(dir, "sub").toString))
      .select("path").collect()
    assert(sub.length === 4)
    // the walk surfaced ONLY the subtree's files — the 6 top-level
    // files were never listed (subtree skip, not post-filter)
    assert(MediaSource.filesListedLastWalk.get() === 4L)
  }

  test("a pushed limit stops the walk early") {
    val three = read("none").select("path").limit(3).collect()
    assert(three.length === 3)
    assert(MediaSource.filesListedLastWalk.get() <= 3L,
      "limit must stop the directory walk, not list everything")
  }

  test("streaming: each micro-batch claims only newly-arrived files, decoded") {
    val sdir = Files.createTempDirectory("media_stream").toString
    (0 until 3).foreach { i =>
      Files.write(Paths.get(sdir, f"v_$i%02d.ivf"), Vp9Ivf.generate(i.toLong))
    }
    val q = spark.readStream.format("graft.sources.MediaSource")
      .option("decode", "vp9").load(sdir)
      .select(col("path"), col("meta.frames").as("frames"))
      .writeStream.format("memory").queryName("media_stream")
      .option("checkpointLocation",
        Files.createTempDirectory("media_ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      val first = spark.sql("select * from media_stream").collect()
      assert(first.length === 3)
      assert(first.map(_.getLong(1)).sorted.toSeq ===
        (0 until 3).map(i => (i % 7) + 1L).sorted)
      // late arrivals: a later mtime key → claimed by the next batch
      (3 until 5).foreach { i =>
        val p = Paths.get(sdir, f"v_$i%02d.ivf")
        Files.write(p, Vp9Ivf.generate(i.toLong))
        Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime
          .fromMillis(System.currentTimeMillis() + 2000))
      }
      q.processAllAvailable()
      val all = spark.sql("select * from media_stream").collect()
      assert(all.length === 5, "two new files claimed exactly once")
      assert(all.map(_.getString(0)).distinct.length === 5)
    } finally q.stop()
  }

  test("streaming + mtimeSlackMs: a BACKDATED file is claimed exactly once") {
    val sdir = Files.createTempDirectory("media_slack").toString
    (0 until 3).foreach { i =>
      Files.write(Paths.get(sdir, f"v_$i%02d.ivf"), Vp9Ivf.generate(i.toLong))
    }
    val q = spark.readStream.format("graft.sources.MediaSource")
      .option("decode", "none").option("mtimeSlackMs", "3600000").load(sdir)
      .select(col("path"))
      .writeStream.format("memory").queryName("media_slack")
      .option("checkpointLocation",
        Files.createTempDirectory("media_slack_ckpt").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.sql("select * from media_slack").count() === 3)
      // a file lands with an OLDER mtime than the high-water mark
      // (mv-into-place preserving timestamps) — the strict append-only
      // offset would skip it forever; the slack window rescues it
      val back = Paths.get(sdir, "v_backdated.ivf")
      Files.write(back, Vp9Ivf.generate(9L))
      Files.setLastModifiedTime(back, java.nio.file.attribute.FileTime
        .fromMillis(System.currentTimeMillis() - 60000))
      q.processAllAvailable()
      val rows = spark.sql("select * from media_slack").collect().map(_.getString(0))
      assert(rows.count(_.endsWith("v_backdated.ivf")) === 1,
        "the backdated file must be claimed exactly once")
      assert(rows.length === 4)
      // further triggers with no new files must NOT re-emit it
      q.processAllAvailable()
      q.processAllAvailable()
      assert(spark.sql("select * from media_slack").count() === 4,
        "no re-emission on later empty triggers")
    } finally q.stop()
  }

  test("distributed listing (listParallelism) surfaces the identical file set") {
    // a wider tree: files at the root AND in several subdirectories
    val d = Files.createTempDirectory("media_dist").toString
    (0 until 3).foreach { i =>
      Files.write(Paths.get(d, f"root_$i.ivf"), Vp9Ivf.generate(i.toLong))
    }
    (0 until 4).foreach { s =>
      Files.createDirectories(Paths.get(d, s"shard_$s"))
      (0 until 5).foreach { i =>
        Files.write(Paths.get(d, s"shard_$s", f"clip_$i%02d.ivf"),
          Vp9Ivf.generate((s * 10 + i).toLong))
      }
    }
    def list(extra: Map[String, String]) = {
      var r = spark.read.format("graft.sources.MediaSource").option("decode", "none")
      extra.foreach { case (k, v) => r = r.option(k, v) }
      r.load(d).select("path", "size", "mtime_ms").collect()
        .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).sortBy(_._1).toSeq
    }
    val driver = list(Map.empty)
    val dist = list(Map("listParallelism" -> "4"))
    assert(driver.length === 23)
    assert(dist === driver, "driver and distributed walks must agree exactly")
    // pushed subtree pruning survives the fan-out: a prefix filter
    // over one shard lists only that shard's files
    val one = spark.read.format("graft.sources.MediaSource")
      .option("decode", "none").option("listParallelism", "4").load(d)
      .filter(col("path").startsWith(Paths.get(d, "shard_2").toString))
      .select("path").collect()
    assert(one.length === 5)
    assert(MediaSource.filesListedLastWalk.get() === 5L,
      "prefix pruning must hold under the distributed walk")
  }

  test("skewed trees re-fan: distributed listing engages below a single-child root") {
    // the worst case for a one-level fan-out: the root has ONE child,
    // and all the width hides underneath it
    val d = Files.createTempDirectory("media_skew").toString
    val only = Paths.get(d, "archive")
    Files.createDirectories(only)
    (0 until 8).foreach { s =>
      // each shard nests one level deeper, so a budget-1 task must
      // leave its subdirectory pending — forcing a second round
      val shard = only.resolve(s"shard_$s")
      Files.createDirectories(shard.resolve("deep"))
      Files.write(shard.resolve("top.ivf"), Vp9Ivf.generate(s.toLong))
      (0 until 2).foreach { i =>
        Files.write(shard.resolve("deep").resolve(f"clip_$i%02d.ivf"),
          Vp9Ivf.generate((s * 10 + i).toLong))
      }
    }
    def list(extra: Map[String, String]) = {
      var r = spark.read.format("graft.sources.MediaSource").option("decode", "none")
      extra.foreach { case (k, v) => r = r.option(k, v) }
      r.load(d).select("path", "size").collect()
        .map(x => (x.getString(0), x.getLong(1))).sortBy(_._1).toSeq
    }
    val driver = list(Map.empty)
    assert(driver.length === 24)
    // budget 1 forces every round to leave work behind, so the walk
    // must re-fan repeatedly — and still agree with the driver walk
    val dist = list(Map("listParallelism" -> "4", "listDirBudget" -> "1"))
    assert(dist === driver, "skewed-tree re-fanned walk must agree exactly")
    assert(MediaSource.distributedRoundsLastWalk.get() >= 2L,
      "a single-child root must still reach distributed rounds (re-fanning)")
    // sanity: a generous budget lists identically in fewer rounds
    val dist2 = list(Map("listParallelism" -> "4"))
    assert(dist2 === driver)
  }

  test("maxListedFiles fail-fast guards the driver-side array on both walk paths") {
    val e1 = intercept[IllegalStateException] {
      spark.read.format("graft.sources.MediaSource").option("decode", "none")
        .option("maxListedFiles", "3").load(dir).count()
    }
    assert(e1.getMessage.contains("maxListedFiles"))
    val e2 = intercept[IllegalStateException] {
      spark.read.format("graft.sources.MediaSource").option("decode", "none")
        .option("maxListedFiles", "3").option("listParallelism", "2")
        .load(dir).count()
    }
    assert(e2.getMessage.contains("maxListedFiles"))
    // a pushed LIMIT below the guard keeps the scan inside it
    val ok = spark.read.format("graft.sources.MediaSource").option("decode", "none")
      .option("maxListedFiles", "3").load(dir).select("path").limit(2).collect()
    assert(ok.length === 2)
  }

  test("a pushed limit does NOT truncate the streaming listing") {
    // batch scan with a pushed limit of 1, streamed through the same
    // MediaScan: latestOffset must still see the FULL tree, or files
    // below the claimed high-water mark outside the first `limit`
    // survivors would be lost forever
    val sdir = Files.createTempDirectory("media_lim").toString
    (0 until 4).foreach { i =>
      Files.write(Paths.get(sdir, f"v_$i%02d.ivf"), Vp9Ivf.generate(i.toLong))
    }
    val b = new graft.sources.MediaScanBuilder(sdir, "none", 128L * 1024 * 1024)
    assert(!b.pushLimit(1)) // partial push, Spark keeps the global limit
    val scan = b.build().asInstanceOf[graft.sources.MediaScan]
    val stream = scan.toMicroBatchStream(
      Files.createTempDirectory("media_lim_ckpt").toString)
    val start = stream.initialOffset()
    val end = stream.latestOffset()
    val parts = stream.planInputPartitions(start, end)
    val n = parts.map(_.asInstanceOf[graft.sources.MediaFilesPartition].files.length).sum
    assert(n === 4, "the streaming path must list every file despite the pushed limit")
  }

  test("MediaOffset.parse round-trips all three serialized forms") {
    import graft.sources.MediaOffset
    // initial offset, legacy (pre-seq) form
    assert(MediaOffset.parse("-1:") === MediaOffset(-1L, "", 0L))
    // legacy form with a colon-bearing absolute path: everything after
    // the first ':' is the path, seq = 0
    assert(MediaOffset.parse("1000:/a:b") === MediaOffset(1000L, "/a:b", 0L))
    // new three-field form, including a colon-bearing path
    assert(MediaOffset.parse("5:0:/p") === MediaOffset(5L, "/p", 0L))
    val o = MediaOffset(123L, "/x/y:z.ivf", 7L)
    assert(MediaOffset.parse(o.json()) === o)
    val init = MediaOffset(-1L, "")
    assert(MediaOffset.parse(init.json()) === init)
  }

  test("slack claim ledger lives in the checkpoint and a restart from a " +
      "changed working directory does not re-emit") {
    val sdir = Files.createTempDirectory("media_slack_cwd").toString
    val ckpt = Files.createTempDirectory("media_slack_cwd_ckpt").toString
    (0 until 2).foreach { i =>
      Files.write(Paths.get(sdir, f"v_$i%02d.ivf"), Vp9Ivf.generate(i.toLong))
    }
    // foreachBatch (checkpoint-recoverable, unlike the memory sink)
    // collecting into a driver-side queue
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def start() =
      spark.readStream.format("graft.sources.MediaSource")
        .option("decode", "none").option("mtimeSlackMs", "3600000").load(sdir)
        .select(col("path"))
        .writeStream.foreachBatch {
          (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
            df.collect().foreach(r => emitted.add(r.getString(0))); ()
        }
        .option("checkpointLocation", ckpt).start()
    val q1 = start()
    try {
      q1.processAllAvailable()
      // a backdated arrival exercises the slack rescue → enters the ledger
      val back = Paths.get(sdir, "v_backdated.ivf")
      Files.write(back, Vp9Ivf.generate(9L))
      Files.setLastModifiedTime(back, java.nio.file.attribute.FileTime
        .fromMillis(System.currentTimeMillis() - 60000))
      q1.processAllAvailable()
      assert(emitted.size === 3)
    } finally q1.stop()
    // the ledger must live INSIDE the checkpoint (Hadoop-Path-resolved
    // from the qualified URI Spark hands over), never under the CWD
    assert(Files.exists(Paths.get(ckpt, "sources", "0", "graft-media-claims")),
      "claim ledger must be persisted inside the stream checkpoint")
    assert(!Files.exists(Paths.get(sys.props("user.dir"), "file:")),
      "no scheme-named ledger directory may appear under the working directory")
    // simulate resuming from a different working directory: repoint the
    // cached local FileSystem's working directory, under which any
    // CWD-relative (i.e. buggy) ledger resolution would now land
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI("file:///"),
      spark.sparkContext.hadoopConfiguration)
    val prevWd = fs.getWorkingDirectory
    val otherCwd = Files.createTempDirectory("media_other_cwd").toString
    fs.setWorkingDirectory(new org.apache.hadoop.fs.Path(otherCwd))
    try {
      emitted.clear()
      val q2 = start()
      try {
        q2.processAllAvailable()
        q2.processAllAvailable()
        // the resumed stream loads the ledger from the checkpoint: the
        // backdated file is already claimed, so nothing re-emits
        assert(emitted.isEmpty,
          "a checkpoint resume from another working directory must not re-emit")
      } finally q2.stop()
      assert(!Files.exists(Paths.get(otherCwd, "file:")),
        "the resumed stream must not write a CWD-relative ledger")
    } finally fs.setWorkingDirectory(prevWd)
  }

  test("unknown decode option fails loudly") {
    val e = intercept[Exception] {
      spark.read.format("graft.sources.MediaSource")
        .option("decode", "wavelet").load(dir).collect()
    }
    assert(e.getMessage.contains("unknown decode option") ||
      Option(e.getCause).exists(_.getMessage.contains("unknown decode option")))
  }

  test("streaming video ingest: each micro-batch appends its clips' fingerprints " +
      "to the segmented DedupIndex, and the grown artifact equals a full rebuild") {
    // the streaming-era media-ingest cadence end-to-end for video: a
    // crawl drops clips on the landing tree, each micro-batch claims
    // only ITS files, and foreachBatch appends ONLY that batch's
    // fingerprints — base ∪ deltas must be bit-identical to rebuilding
    // over everything (the pure-per-row-function contract the
    // ensure*Segmented families pin)
    import graft.pipeline.{DedupIndex, GifAnim}
    val sdir = Files.createTempDirectory("media_vstream").toString
    (0 until 3).foreach { i =>
      Files.write(Paths.get(sdir, f"clip_$i%02d.gif"),
        GifAnim.generate(i.toLong, 1, 0))
    }
    val artRoot = Files.createTempDirectory("media_vstream_art").toString
    val corpusDir = "/nonexistent/vstream"
    val seen = new java.util.concurrent.atomic.AtomicBoolean(false)
    val stream = spark.readStream.format("graft.sources.MediaSource")
      .option("decode", "none").load(sdir)
      .select(regexp_extract(col("path"), "clip_(\\d+)\\.gif", 1)
        .cast("long").as("vid_id"), col("bytes"))
    val q = stream.writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("media_vstream_ckpt").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (batch.isEmpty) ()
        else if (seen.compareAndSet(false, true))
          DedupIndex.ensureVideoFingerprintSegmented(spark, corpusDir, batch,
            "vid_id", "bytes", variant = "vstream",
            artifactRootOverride = Some(artRoot))
        else
          DedupIndex.appendVideoFingerprint(spark, corpusDir, batch,
            "vid_id", "bytes", variant = "vstream",
            artifactRootOverride = Some(artRoot))
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      (3 until 5).foreach { i =>
        val p = Paths.get(sdir, f"clip_$i%02d.gif")
        Files.write(p, GifAnim.generate(i.toLong, 1, 0))
        Files.setLastModifiedTime(p, java.nio.file.attribute.FileTime
          .fromMillis(System.currentTimeMillis() + 2000))
      }
      q.processAllAvailable()
    } finally q.stop()
    import spark.implicits._
    // re-ensure with the (already-ingested) base: a fresh segmented
    // artifact returns as-is — the read-back path, not a rebuild
    val base = (0L until 3L).map(i => (i, GifAnim.generate(i, 1, 0)))
      .toDF("vid_id", "bytes")
    val grown = DedupIndex.ensureVideoFingerprintSegmented(spark, corpusDir,
      base, "vid_id", "bytes", variant = "vstream",
      artifactRootOverride = Some(artRoot))
    val rebuild = (0L until 5L).map(i => (i, GifAnim.generate(i, 1, 0)))
      .toDF("vid_id", "vid")
      .selectExpr("vid_id AS __id", "video_fingerprint(vid) AS __sim")
    assert(grown.collect().map(_.toString).sorted.toSeq ===
      rebuild.collect().map(_.toString).sorted.toSeq)
    assert(grown.count() === 5)
  }

  test("decode=gifanim: scan-time animation decode + fingerprint in one fold") {
    import graft.pipeline.{GifAnim, VideoFingerprint}
    val droot = Files.createTempDirectory("media_gifanim").toString
    for (d <- Seq(3L, 47L, 212L))
      Files.write(Paths.get(droot, f"clip_$d%04d.gif"), GifAnim.generate(d, 1, 0))
    Files.write(Paths.get(droot, "not_a_clip.gif"), Array.fill[Byte](40)(9))
    val rows = spark.read.format("graft.sources.MediaSource")
      .option("decode", "gifanim").load(droot)
      .select(col("path"), col("meta")).collect()
      .map(r => (r.getString(0), r.get(1))).toMap
    for (d <- Seq(3L, 47L, 212L)) {
      val anim = GifAnim.decodeAnim(GifAnim.generate(d, 1, 0)).get
      val m = rows.collectFirst {
        case (p, v) if p.endsWith(f"clip_$d%04d.gif") =>
          v.asInstanceOf[org.apache.spark.sql.Row]
      }.get
      assert(m.getInt(0) === anim.w && m.getInt(1) === anim.h)
      assert(m.getInt(2) === anim.frames.length)
      assert(m.getLong(3) === anim.metas.map(_.delayCs.toLong).sum)
      assert(m.getLong(4) === anim.frames.map(_.map(_.toLong).sum).sum)
      assert(m.getLong(5) ===
        VideoFingerprint.fingerprint(GifAnim.generate(d, 1, 0)).longValue())
    }
    // malformed bytes surface a NULL meta, never a task kill
    assert(rows.collectFirst {
      case (p, v) if p.endsWith("not_a_clip.gif") => v
    }.get == null)
  }

  test("video dedup lifecycle crosses the real file boundary: scan → fingerprint → resolve") {
    // the d17–d19 gates build clips in-plan; this composes the same
    // lifecycle over REAL FILES — a tree of animated GIFs with one
    // re-timed re-encode (temporal-scale twin, provably hamming 0, in
    // a subdirectory) read through the MediaSource scan, fingerprinted
    // into the DedupIndex artifact, paired through the banded
    // blocking, resolved through connected components: the re-timed
    // copy must collapse onto its original across the file seam
    import graft.pipeline.{Components, Dedup, DedupIndex, GifAnim}
    val droot = Files.createTempDirectory("media_vdedup").toString
    Files.createDirectories(Paths.get(droot, "retimed"))
    Files.write(Paths.get(droot, "vid_90.gif"), GifAnim.generate(90L, 1, 0))
    Files.write(Paths.get(droot, "retimed", "vid_91.gif"),
      GifAnim.generate(90L, 3, 0))
    (0 until 6).foreach { i =>
      Files.write(Paths.get(droot, f"vid_$i%02d.gif"),
        GifAnim.generate(i.toLong, 1, 0))
    }
    val artRoot = Files.createTempDirectory("media_vdedup_art").toString
    val scan = spark.read.format("graft.sources.MediaSource")
      .option("decode", "none").load(droot)
      .select(regexp_extract(col("path"), "vid_(\\d+)\\.gif", 1)
        .cast("long").as("vid_id"), col("bytes"))
    val fp = DedupIndex.ensureVideoFingerprint(spark, "/nonexistent/mediavdedup",
      scan, "vid_id", "bytes", variant = "mediaspec",
      artifactRootOverride = Some(artRoot))
    assert(fp.count() === 8) // every file decoded and fingerprinted
    val pairs = Dedup.simHashNearDupPairsFromFingerprints(fp, maxHamming = 3,
      bands = 4, bits = 64)
    val resolved = Components.nearDupClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(resolved.get(91L) === Some(90L),
      s"the re-timed copy must resolve to its original, got $resolved")
    assert(resolved.filter(_._2 == 90L).keySet === Set(90L, 91L))
  }

  test("image dedup lifecycle crosses the real file boundary: scan → fingerprint → resolve") {
    // the d10–d12 gates build PNGs in-plan; this composes the same
    // lifecycle over REAL FILES — a tree of images (one box-resized
    // thumbnail of an original, in a subdirectory) read through the
    // MediaSource scan, fingerprinted into the DedupIndex artifact,
    // paired through the banded blocking, resolved through connected
    // components: the thumbnail must collapse onto its original across
    // the file seam, exactly as the ingest-time path would at scale
    import graft.pipeline.{Components, Dedup, DedupIndex, PngCodec}
    val droot = Files.createTempDirectory("media_dedup").toString
    Files.createDirectories(Paths.get(droot, "thumbs"))
    // the PerceptualHashSpec-pinned hamming-0 twin pair: a linear ramp
    // and its 1.5× box resize
    val ramp = PngCodec.encodeGrayPng(
      Array.tabulate(18 * 16)(i => ((i % 18) * 9 + (i / 18) * 4) & 0xff), 18, 16)
    Files.write(Paths.get(droot, "img_90.png"), ramp)
    Files.write(Paths.get(droot, "thumbs", "img_91.png"),
      PngCodec.resize(ramp, 27, 24, "box"))
    (0 until 6).foreach { i =>
      Files.write(Paths.get(droot, f"img_$i%02d.png"), PngCodec.pngBytes(i.toLong))
    }
    val artRoot = Files.createTempDirectory("media_dedup_art").toString
    val scan = spark.read.format("graft.sources.MediaSource")
      .option("decode", "none").load(droot)
      .select(regexp_extract(col("path"), "img_(\\d+)\\.png", 1)
        .cast("long").as("img_id"), col("bytes"))
    val fp = DedupIndex.ensureImageDHash(spark, "/nonexistent/mediadedup", scan,
      "img_id", "bytes", variant = "mediaspec",
      artifactRootOverride = Some(artRoot))
    assert(fp.count() === 8) // every file decoded and fingerprinted
    val pairs = Dedup.simHashNearDupPairsFromFingerprints(fp, maxHamming = 3,
      bands = 4, bits = 64)
    val resolved = Components.nearDupClusters(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(resolved.get(91L) === Some(90L),
      s"thumbnail must resolve to its original, got $resolved")
    // the twin cluster is exactly {original, thumbnail}
    assert(resolved.filter(_._2 == 90L).keySet === Set(90L, 91L))
  }
}
