package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, DedupIndex}

/** Dedup operators: shingling semantics, exact groups, and the MinHash-LSH
  * recall contract against brute force on the sf0.001 documents corpus. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: distinct word trigrams; short texts → empty array") {
    val df = Seq("a b c d", "a b", "x y z x y z x y z").toDF("text")
    val got = df.select(Dedup.shingles(col("text"), 3).as("sh")).collect()
      .map(_.getSeq[String](0).toSet)
    assert(got(0) === Set("a b c", "b c d"))
    assert(got(1) === Set.empty)
    assert(got(2) === Set("x y z", "y z x", "z x y")) // distinct across repeats
  }

  test("exactDupGroups finds exactly the injected copies, keeps min id") {
    val df = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "aaa"), (5L, "ccc"))
      .toDF("doc_id", "text")
    val groups = Dedup.exactDupGroups(df, "text", "doc_id").collect()
    assert(groups.length === 1)
    assert(groups.head.getAs[Long]("keep_id") === 1L)
    assert(groups.head.getAs[Long]("n_copies") === 3L)
    assert(Dedup.exactDedup(df, "text", "doc_id").count() === 3)
  }

  test("jaccard: exact set semantics") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("a", "b")
    val j = df.select(Dedup.jaccard(col("a"), col("b"))).collect().head.getDouble(0)
    assert(j === 2.0 / 4.0)
  }

  /** Mutated corpus shared with the registry queries: head-truncated copies. */
  private def corpus = {
    val docs = Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
    val w = split(col("text"), " ")
    docs.union(
      docs.filter(pmod(col("doc_id"), lit(7)) === 0).select(
        (col("doc_id") + 10000).as("doc_id"),
        array_join(slice(w, lit(3), size(w)), " ").as("text")))
  }

  test("MinHash-LSH(32, 16×2) recovers every brute-force pair at j ≥ 0.8") {
    val brute = Dedup.bruteForceNearDupPairs(corpus, corpus, "doc_id", "text", 0.8)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minHashNearDupPairs(corpus, "doc_id", "text", 0.8,
        numHashes = 32, bands = 16)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "corpus must contain constructed near-dups")
    assert(lsh === brute) // recall 1 at these band settings, and no false positives survive the exact-j filter
  }

  test("LSH candidate volume stays far below all-pairs") {
    val n = corpus.count()
    val sh = corpus.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
    val cands = Dedup.lshCandidatePairs(sh, "doc_id", "sh", 32, 16).count()
    assert(cands < n * (n - 1) / 20, s"candidates $cands vs all-pairs ${n * (n - 1) / 2}")
  }

  test("SimHash: banded blocking yields EXACTLY the hamming<=3 pairs (pigeonhole)") {
    val got = Dedup.simHashNearDupPairs(corpus, "doc_id", "text",
        maxHamming = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth: driver-side all-pairs hamming over the fingerprints
    val f = Dedup.simHashFingerprints(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val truth = (for {
      (a, fa) <- f; (b, fb) <- f if a < b
      if java.lang.Long.bitCount(fa ^ fb) <= 3
    } yield (a, b)).toSet
    assert(truth.nonEmpty, "corpus must contain hamming<=3 pairs")
    assert(got === truth)
  }

  test("SimHash: mutated copies land within hamming<=3 for most long docs") {
    val got = Dedup.simHashNearDupPairs(corpus, "doc_id", "text",
        maxHamming = 3, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mutated = corpus.filter(col("doc_id") >= 10000)
      .select((col("doc_id") - 10000).as("a"), col("doc_id").as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recalled = mutated intersect got
    assert(recalled.size >= mutated.size / 2, s"recall ${recalled.size}/${mutated.size}")
  }

  test("sha60 equals the sha256 hex-prefix value (cross-engine hash contract)") {
    val inputs = Seq("hello world", "the quick brown fox", "", "a b c")
    val got = inputs.toDF("s").select(Dedup.sha60(col("s"))).collect().map(_.getLong(0))
    val exp = inputs.map { s =>
      val hex = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    assert(got.toSeq === exp)
  }

  test("sha60-fingerprint pipeline matches xxhash pipeline's pair structure shape") {
    // the cross-engine hash must produce a usable fingerprint: the exact
    // blocking contract holds regardless of the per-shingle hash function
    val got = Dedup.simHashNearDupPairs(corpus, "doc_id", "text",
        maxHamming = 3, bands = 4, hashFn = Dedup.sha60, bits = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val f = Dedup.simHashFingerprints(corpus, "doc_id", "text",
        hashFn = Dedup.sha60, bits = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val truth = (for {
      (a, fa) <- f; (b, fb) <- f if a < b
      if java.lang.Long.bitCount(fa ^ fb) <= 3
    } yield (a, b)).toSet
    assert(got === truth)
    assert(truth.nonEmpty)
  }

  test("persisted sketch index: indexed paths ≡ inline paths, build is cached") {
    val root = java.nio.file.Files.createTempDirectory("dedup-idx-").toString
    val pairs = (df: org.apache.spark.sql.DataFrame) =>
      df.select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val sig = DedupIndex.ensureMinHash(spark, sf0001, corpus, "doc_id", "text",
      variant = "spec", artifactRootOverride = Some(root))
    val mhIndexed = pairs(Dedup.minHashNearDupPairsIndexed(
      corpus, sig, "doc_id", "text", 0.8, numHashes = 32, bands = 16))
    val mhInline = pairs(Dedup.minHashNearDupPairs(
      corpus, "doc_id", "text", 0.8, numHashes = 32, bands = 16))
    assert(mhIndexed === mhInline)
    assert(mhIndexed.nonEmpty)

    val fp = DedupIndex.ensureSimHash(spark, sf0001, corpus, "doc_id", "text",
      variant = "spec", hashTag = "xx", hashFn = Dedup.xxHash,
      artifactRootOverride = Some(root))
    val shIndexed = pairs(Dedup.simHashNearDupPairsFromFingerprints(fp, 3, 4))
    val shInline = pairs(Dedup.simHashNearDupPairs(corpus, "doc_id", "text", 3, 4))
    assert(shIndexed === shInline)
    assert(shIndexed.nonEmpty)

    val wfp = DedupIndex.ensureWinnowing(spark, sf0001, corpus, "doc_id", "text",
      variant = "spec", artifactRootOverride = Some(root))
    val wIndexed = pairs(graft.pipeline.TextAnalysis
      .rollingOverlapPairsFromFingerprints(wfp, minShared = 5L))
    val wInline = pairs(graft.pipeline.TextAnalysis
      .rollingOverlapPairs(corpus, "doc_id", "text", window = 8, minShared = 5L))
    assert(wIndexed === wInline)
    assert(wIndexed.nonEmpty)

    // second ensure() reuses the committed artifact (no rebuild): same dir listing
    val before = new java.io.File(root).list().sorted.toSeq
    DedupIndex.ensureMinHash(spark, sf0001, corpus, "doc_id", "text",
      variant = "spec", artifactRootOverride = Some(root))
    assert(new java.io.File(root).list().sorted.toSeq === before)
    assert(before.count(_.startsWith("__build_")) === 0, "tmp dirs must not leak")
  }

  test("segmented index: base + appends ≡ full rebuild; crashed append invisible") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_seg").toString
    val docs = (1L to 60L).map(i => (i, s"w$i x$i y$i z$i a b c d e f"))
      .toDF("doc_id", "text")
    val base = docs.filter(col("doc_id") <= 20)
    val d1 = docs.filter(col("doc_id") > 20 && col("doc_id") <= 40)
    val d2 = docs.filter(col("doc_id") > 40)

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq

    val corpusDir = "/nonexistent/segspec" // no staleness source in-spec
    graft.pipeline.DedupIndex.ensureMinHashSegmented(spark, corpusDir, base,
      "doc_id", "text", variant = "segspec", artifactRootOverride = Some(root))
    graft.pipeline.DedupIndex.appendMinHash(spark, corpusDir, d1,
      "doc_id", "text", variant = "segspec", artifactRootOverride = Some(root))

    // crash debris: a staging dir that never committed, and a renamed
    // segment the manifest never recorded — readers must see neither.
    // NO concurrent-safe operation may sweep them (multi-writer
    // contract: the "orphan" could be a live appender's
    // renamed-but-not-yet-claimed segment); only the exclusive-access
    // maintenance sweep drops both
    val key = new java.io.File(root).list().filter(_.startsWith("minhashseg_")).head
    val junk = java.nio.file.Paths.get(s"$root/$key/__seg_crashed")
    val orphan = java.nio.file.Paths.get(s"$root/$key/seg_orphan")
    java.nio.file.Files.createDirectories(junk)
    java.nio.file.Files.createDirectories(orphan)
    val afterCrash = rows(graft.pipeline.ArtifactStore.readSegmented(spark, root, key))

    graft.pipeline.DedupIndex.appendMinHash(spark, corpusDir, d2,
      "doc_id", "text", variant = "segspec", artifactRootOverride = Some(root))
    assert(java.nio.file.Files.exists(junk) && java.nio.file.Files.exists(orphan),
      "appends must not sweep — debris could be a live appender's segment")
    graft.pipeline.ArtifactStore.compactSegments(spark, root, key)
    assert(java.nio.file.Files.exists(junk) && java.nio.file.Files.exists(orphan),
      "compaction must not sweep either — it is concurrent-append-safe")
    graft.pipeline.ArtifactStore.sweepOrphans(s"$root/$key")
    assert(!java.nio.file.Files.exists(junk), "staging dir swept by maintenance")
    assert(!java.nio.file.Files.exists(orphan), "unmanifested segment swept")

    val segmented = rows(graft.pipeline.ArtifactStore.readSegmented(spark, root, key))
    val full = rows(graft.pipeline.Dedup.minHashSignatureRows(docs, "doc_id", "text"))
    assert(segmented === full, "base + appends must equal a full rebuild")
    assert(afterCrash.size === 40) // base + first delta only, junk invisible
    // ensureSegmented on an existing artifact is a pure read (no rebuild)
    val again = rows(graft.pipeline.DedupIndex.ensureMinHashSegmented(spark,
      corpusDir, base,
      "doc_id", "text", variant = "segspec", artifactRootOverride = Some(root)))
    assert(again === full)
  }

  test("compactSegments: base+deltas fold to one segment, readers unchanged, orphans swept") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_seg_cmp").toString
    val key = "compact_spec"
    def build(lo: Int, hi: Int)(tmp: String): Unit =
      (lo to hi).map(i => (i.toLong, s"row$i")).toDF("id", "v").write.parquet(tmp)
    graft.pipeline.ArtifactStore.ensureSegmented(spark, root, key)(build(1, 10))
    graft.pipeline.ArtifactStore.appendSegment(spark, root, key)(build(11, 20))
    graft.pipeline.ArtifactStore.appendSegment(spark, root, key)(build(21, 30))
    def rows() = graft.pipeline.ArtifactStore.readSegmented(spark, root, key)
      .collect().map(_.getLong(0)).sorted.toSeq
    def segDirs() = new java.io.File(s"$root/$key").list()
      .filter(_.startsWith("seg_")).toSeq
    def manifest() = { // newest CAS generation file
      val gen = new java.io.File(s"$root/$key").list()
        .filter(_.startsWith("_segments.v")).max
      java.nio.file.Files
        .readAllLines(java.nio.file.Paths.get(s"$root/$key/$gen"))
        .toArray.map(_.toString).filter(l => l.nonEmpty && l != "#end").toSeq
    }
    val before = rows()
    assert(before === (1L to 30L))
    val baseMtime = java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(s"$root/$key/seg_base"))
    assert(graft.pipeline.ArtifactStore.compactSegments(spark, root, key) === 3)
    assert(rows() === before)
    // ONE committed segment; the replaced dirs stay on disk as orphans
    // (a reader holding the old listing can finish its scan) until the
    // next writer operation sweeps them
    assert(manifest().size === 1)
    assert(segDirs().size === 4)
    // the compacted segment inherits the base build's mtime, so the
    // ensureSegmented staleness reference still predates any source
    // regeneration that happened after the base build
    assert(java.nio.file.Files.getLastModifiedTime(
      java.nio.file.Paths.get(s"$root/$key/${manifest().head}")) === baseMtime)
    // a re-compaction finds nothing to fold; the replaced orphans stay
    // until the EXCLUSIVE maintenance sweep (neither appends nor
    // compaction may sweep — both are concurrent-safe operations)
    assert(graft.pipeline.ArtifactStore.compactSegments(spark, root, key) === 0)
    assert(segDirs().size === 4)
    graft.pipeline.ArtifactStore.sweepOrphans(s"$root/$key")
    assert(segDirs().size === 1) // orphans swept by the maintenance pass
    graft.pipeline.ArtifactStore.appendSegment(spark, root, key)(build(31, 35))
    assert(rows() === (1L to 35L))
    assert(segDirs().size === 2) // compacted + fresh delta only
    // ensureSegmented stays a pure read (a rebuild would inject the marker)
    val again = graft.pipeline.ArtifactStore.ensureSegmented(spark, root, key)(build(90, 99))
    assert(again.collect().map(_.getLong(0)).sorted.toSeq === (1L to 35L))
  }

  test("concurrent appends: every racing writer's segment survives the CAS manifest") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_seg_race").toString
    val key = "race_spec"
    def build(id: Long)(tmp: String): Unit =
      Seq((id, s"w$id")).toDF("id", "v").write.parquet(tmp)
    graft.pipeline.ArtifactStore.ensureSegmented(spark, root, key)(build(0L))
    // 8 appenders race from a start latch; under last-writer-wins
    // manifest replacement some of their committed segments would vanish
    val writers = 8
    val start = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (1 to writers).foreach { w =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          try graft.pipeline.ArtifactStore.appendSegment(spark, root, key)(build(w.toLong))
          catch { case t: Throwable => failures.add(t) }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, java.util.concurrent.TimeUnit.SECONDS))
    assert(failures.isEmpty, s"appender threw: ${failures.peek()}")
    val got = graft.pipeline.ArtifactStore.readSegmented(spark, root, key)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got === (0L to writers.toLong),
      "every concurrent append must be committed — none lost to a manifest race")
  }

  test("torn newest manifest generation: readers fall back, appends build past it, sweep drops it") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_seg_torn").toString
    val key = "torn_spec"
    def build(id: Long)(tmp: String): Unit =
      Seq((id, s"w$id")).toDF("id", "v").write.parquet(tmp)
    graft.pipeline.ArtifactStore.ensureSegmented(spark, root, key)(build(0L))
    graft.pipeline.ArtifactStore.appendSegment(spark, root, key)(build(1L))
    val dir = s"$root/$key"
    def gens() = new java.io.File(dir).list().filter(_.startsWith("_segments.v")).sorted.toSeq
    val committed = gens()
    // Simulate a crashed copy-mode claim (no-hard-link filesystem): the
    // next generation name exists but its content is a PREFIX — a
    // truncated segment line, no #end terminator.
    val maxVer = committed.max.stripPrefix("_segments.v").toLong
    val torn = f"${dir}/_segments.v${maxVer + 1}%019d"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(torn), "seg_trunc")
    def rows() = graft.pipeline.ArtifactStore.readSegmented(spark, root, key)
      .collect().map(_.getLong(0)).sorted.toSeq
    // reader steps back to the newest TERMINATED generation
    assert(rows() === Seq(0L, 1L))
    // an append claims PAST the torn name (never re-claims it) and
    // carries the terminated generation's segments forward
    graft.pipeline.ArtifactStore.appendSegment(spark, root, key)(build(2L))
    assert(rows() === Seq(0L, 1L, 2L))
    assert(gens().max.stripPrefix("_segments.v").toLong === maxVer + 2)
    // maintenance sweep keeps only the generation readers resolve; the
    // torn file goes with the stale ones
    graft.pipeline.ArtifactStore.sweepOrphans(dir)
    assert(gens() === Seq(f"_segments.v${maxVer + 2}%019d"))
    assert(rows() === Seq(0L, 1L, 2L))
  }

  test("segmented staleness keys off the base build — appends don't mask a regenerated corpus") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_seg_stale").toString
    val src = java.nio.file.Files.createTempDirectory("graft_seg_src")
      .resolve("corpus.txt")
    java.nio.file.Files.writeString(src, "v1")
    def build(marker: String)(tmp: String): Unit =
      Seq((1L, marker)).toDF("id", "m").write.parquet(tmp)
    val key = "stale_spec"
    graft.pipeline.ArtifactStore.ensureSegmented(spark, root, key,
      Some(src.toString))(build("base1"))
    // age the base build, then REGENERATE the corpus, then append: the
    // append rewrites the manifest, so a manifest-mtime staleness check
    // would see "artifact newer than corpus" and silently reuse v1 state
    val basePath = java.nio.file.Paths.get(s"$root/$key/seg_base")
    java.nio.file.Files.setLastModifiedTime(basePath,
      java.nio.file.attribute.FileTime.fromMillis(
        java.nio.file.Files.getLastModifiedTime(basePath).toMillis - 60000))
    java.nio.file.Files.writeString(src, "v2")
    graft.pipeline.ArtifactStore.appendSegment(spark, root, key)(build("delta1"))
    val after = graft.pipeline.ArtifactStore.ensureSegmented(spark, root, key,
      Some(src.toString))(build("base2"))
    assert(after.collect().map(_.getString(1)).toSeq === Seq("base2"),
      "regenerated corpus must force a full rebuild (stale base AND stale deltas dropped)")
  }

  test("tokenLines: fixed-width slices with partial tail, empty text dropped") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e"), (2L, "")).toDF("doc_id", "text")
    val got = graft.pipeline.Dedup.tokenLines(df, "doc_id", "text", width = 2)
      .orderBy("__id", "__ln").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(got.toSeq === Seq((1L, 0, "a b"), (1L, 1, "c d"), (1L, 2, "e")))
  }

  test("line dedup: first corpus occurrence wins; copies vanish on reassembly") {
    import spark.implicits._
    val df = Seq(
      (1L, "x x x x y y y y"),  // lines (w=4): "x x x x", "y y y y"
      (2L, "x x x x z z z z"),  // first line duplicates doc 1's
      (3L, "x x x x y y y y")   // full copy of doc 1 — every line dropped
    ).toDF("doc_id", "text")
    val kept = graft.pipeline.Dedup.dedupLines(
      graft.pipeline.Dedup.tokenLines(df, "doc_id", "text", width = 4))
    val out = graft.pipeline.Dedup.reassembleLines(kept)
      .orderBy("__id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq === Seq(
      (1L, 2L, "x x x x y y y y"),  // keeps both lines (first occurrence)
      (2L, 1L, "z z z z")))         // lost the shared line, kept its own
    // doc 3 lost every line → absent entirely
  }

  // ---- exact substring dedup (ExactSubstr) ------------------------------

  test("mergeSpans: overlapping and touching intervals fuse, gapped don't") {
    import spark.implicits._
    val spans = Seq(
      (1L, 1L, 8L), (1L, 3L, 10L),   // overlap → [1,10]
      (1L, 12L, 19L), (1L, 20L, 27L), // touching (20 = 19+1) → [12,27]
      (1L, 29L, 30L),                 // gap of 1 at 28 → own island
      (2L, 4L, 11L)
    ).toDF("__id", "__s", "__e")
    val got = Dedup.mergeSpans(spans).orderBy("__id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      (1L, 1L, 10L), (1L, 12L, 27L), (1L, 29L, 30L), (2L, 4L, 11L)))
  }

  test("substring dedup: globally-first site kept, every later site cut") {
    import spark.implicits._
    // doc 1: tokens t1..t12; doc 2 repeats doc 1's tokens 3..10 inside
    // novel text; doc 3 is an exact copy of doc 1.
    val d1 = (1 to 12).map("t" + _).mkString(" ")
    val d2 = ("n1 n2 " + (3 to 10).map("t" + _).mkString(" ") + " n3 n4")
    val df = Seq((1L, d1), (2L, d2), (3L, d1)).toDF("doc_id", "text")
    val spans = Dedup.substringDupSpans(df, "doc_id", "text", window = 8)
      .orderBy("__id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1 is first everywhere → untouched; doc 2's embedded run covers
    // tokens 3..10 (one 8-token window); doc 3 loses everything.
    assert(spans.toSeq === Seq((2L, 3L, 10L), (3L, 1L, 12L)))

    val out = Dedup.substringDedup(df, "doc_id", "text", window = 8)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq === Seq(
      (1L, 12L, 0L, d1),                 // verbatim round-trip
      (2L, 12L, 8L, "n1 n2 n3 n4"),      // interior run cut, edges kept
      (3L, 12L, 12L, "")))               // full copy → empty
  }

  test("substring dedup: within-document repeats keep only the first run") {
    import spark.implicits._
    val run = (1 to 8).map("w" + _).mkString(" ")
    val df = Seq((5L, s"$run x1 x2 $run")).toDF("doc_id", "text")
    val out = Dedup.substringDedup(df, "doc_id", "text", window = 8)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq === Seq((18L, 8L, s"$run x1 x2")))
  }

  test("segmented substring windows: base + appends ≡ full rebuild; " +
      "spans from merged segments ≡ inline") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("substrseg").toString
    val docs = Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
      .filter(col("doc_id") < 90)
    val base = docs.filter(col("doc_id") < 60)
    val delta = docs.filter(col("doc_id") >= 60).union(
      docs.filter(col("doc_id") < 30)
        .select((col("doc_id") + 10000).as("doc_id"), col("text")))
    val full = base.union(delta)

    DedupIndex.ensureSubstrWindowsSegmented(spark, sf0001, base,
      "doc_id", "text", variant = "segspec", window = 8,
      artifactRootOverride = Some(tmp))
    DedupIndex.appendSubstrWindows(spark, sf0001, delta,
      "doc_id", "text", variant = "segspec", window = 8,
      artifactRootOverride = Some(tmp))
    val merged = DedupIndex.ensureSubstrWindowsSegmented(spark, sf0001, base,
      "doc_id", "text", variant = "segspec", window = 8,
      artifactRootOverride = Some(tmp))
    assert(merged.orderBy("__id", "__start").collect().toSeq ===
      Dedup.windowFingerprintRows(full, "doc_id", "text", 8)
        .orderBy("__id", "__start").collect().toSeq)
    // election over the merged segments ≡ the inline path — the +10000
    // copies must surface as full-coverage spans
    val idx = Dedup.substringDupSpansFromFingerprints(merged, window = 8)
      .orderBy("__id", "span_start").collect().toSeq
    val inline = Dedup.substringDupSpans(full, "doc_id", "text", window = 8)
      .orderBy("__id", "span_start").collect().toSeq
    assert(idx === inline)
    assert(idx.nonEmpty)
  }

  test("substring dedup: indexed spans ≡ inline spans, sketch cached") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("substr").toString
    val docs = Tables.documents(spark, sf0001).select(col("doc_id"), col("text"))
      .filter(col("doc_id") < 60)
    val corpus = docs.union(docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 10000).as("doc_id"), col("text")))
    val fps = DedupIndex.ensureSubstrWindows(spark, sf0001, corpus,
      "doc_id", "text", variant = "spec60", window = 8,
      artifactRootOverride = Some(tmp))
    val indexed = Dedup.substringDupSpansFromFingerprints(fps, window = 8)
      .orderBy("__id", "span_start").collect().toSeq
    val inline = Dedup.substringDupSpans(corpus, "doc_id", "text", window = 8)
      .orderBy("__id", "span_start").collect().toSeq
    assert(indexed === inline)
    assert(indexed.nonEmpty) // the +10000 copies must surface as spans
  }

  test("pure-fn segmented families: SimHash / image dHash / audio fp append ≡ rebuild") {
    // every fingerprint here is a pure per-row function of its input,
    // so a segmented artifact grown by append must be bit-identical to
    // a full rebuild — the same streaming-era contract the MinHash and
    // substring-window families already pin
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_seg_fp").toString
    val corpusDir = "/nonexistent/segfp" // no staleness source in-spec
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq

    // SimHash over text
    val docs = (1L to 40L)
      .map(i => (i, s"alpha$i beta$i gamma$i delta epsilon zeta eta theta i$i"))
      .toDF("doc_id", "text")
    val tBase = docs.filter(col("doc_id") <= 25)
    val tDelta = docs.filter(col("doc_id") > 25)
    DedupIndex.ensureSimHashSegmented(spark, corpusDir, tBase, "doc_id", "text",
      variant = "segfp", hashTag = "xx", hashFn = Dedup.xxHash,
      artifactRootOverride = Some(root))
    DedupIndex.appendSimHash(spark, corpusDir, tDelta, "doc_id", "text",
      variant = "segfp", hashTag = "xx", hashFn = Dedup.xxHash,
      artifactRootOverride = Some(root))
    val segT = rows(DedupIndex.ensureSimHashSegmented(spark, corpusDir, tBase,
      "doc_id", "text", variant = "segfp", hashTag = "xx", hashFn = Dedup.xxHash,
      artifactRootOverride = Some(root)))
    assert(segT === rows(Dedup.simHashFingerprints(docs, "doc_id", "text",
      3, Dedup.xxHash, 64)))
    assert(segT.size === 40)

    // image dHash over encoded PNGs
    val imgs = (0L until 30L)
      .map(i => (i, graft.pipeline.PngCodec.pngBytes(i))).toDF("img_id", "img")
    val iBase = imgs.filter(col("img_id") < 20)
    val iDelta = imgs.filter(col("img_id") >= 20)
    DedupIndex.ensureImageDHashSegmented(spark, corpusDir, iBase, "img_id", "img",
      variant = "segfp", artifactRootOverride = Some(root))
    DedupIndex.appendImageDHash(spark, corpusDir, iDelta, "img_id", "img",
      variant = "segfp", artifactRootOverride = Some(root))
    val segI = rows(DedupIndex.ensureImageDHashSegmented(spark, corpusDir, iBase,
      "img_id", "img", variant = "segfp", artifactRootOverride = Some(root)))
    assert(segI === rows(imgs.selectExpr("img_id AS __id",
      "image_dhash(img) AS __sim").where("__sim IS NOT NULL")))
    assert(segI.size === 30)

    // audio fingerprint over FLAC streams
    val auds = (0L until 24L)
      .map(i => (i, graft.pipeline.FlacPcm.gen(i))).toDF("aud_id", "aud")
    val aBase = auds.filter(col("aud_id") < 16)
    val aDelta = auds.filter(col("aud_id") >= 16)
    DedupIndex.ensureAudioFingerprintSegmented(spark, corpusDir, aBase,
      "aud_id", "aud", variant = "segfp", artifactRootOverride = Some(root))
    DedupIndex.appendAudioFingerprint(spark, corpusDir, aDelta,
      "aud_id", "aud", variant = "segfp", artifactRootOverride = Some(root))
    val segA = rows(DedupIndex.ensureAudioFingerprintSegmented(spark, corpusDir,
      aBase, "aud_id", "aud", variant = "segfp",
      artifactRootOverride = Some(root)))
    assert(segA === rows(auds.selectExpr("aud_id AS __id",
      "audio_fingerprint(aud) AS __sim").where("__sim IS NOT NULL")))
    assert(segA.size === 24)

    // video fingerprint over animated GIFs
    val vids = (0L until 24L)
      .map(i => (i, graft.pipeline.GifAnim.generate(i, 1, 0)))
      .toDF("vid_id", "vid")
    val vBase = vids.filter(col("vid_id") < 16)
    val vDelta = vids.filter(col("vid_id") >= 16)
    DedupIndex.ensureVideoFingerprintSegmented(spark, corpusDir, vBase,
      "vid_id", "vid", variant = "segfp", artifactRootOverride = Some(root))
    DedupIndex.appendVideoFingerprint(spark, corpusDir, vDelta,
      "vid_id", "vid", variant = "segfp", artifactRootOverride = Some(root))
    val segV = rows(DedupIndex.ensureVideoFingerprintSegmented(spark, corpusDir,
      vBase, "vid_id", "vid", variant = "segfp",
      artifactRootOverride = Some(root)))
    assert(segV === rows(vids.selectExpr("vid_id AS __id",
      "video_fingerprint(vid) AS __sim").where("__sim IS NOT NULL")))
    assert(segV.size === 24)

    // structural AV fingerprint over mixed IVF/MP4 containers
    val avs = (0L until 24L)
      .map { i =>
        val ivf = graft.pipeline.StructFingerprint.generate(i, 1, 1, 0)
        (i, if (i % 2 == 0) ivf else graft.pipeline.StructFingerprint.ivfToMp4(ivf))
      }.toDF("av_id", "av")
    val sBase = avs.filter(col("av_id") < 16)
    val sDelta = avs.filter(col("av_id") >= 16)
    DedupIndex.ensureStructFingerprintSegmented(spark, corpusDir, sBase,
      "av_id", "av", variant = "segfp", artifactRootOverride = Some(root))
    DedupIndex.appendStructFingerprint(spark, corpusDir, sDelta,
      "av_id", "av", variant = "segfp", artifactRootOverride = Some(root))
    val segS = rows(DedupIndex.ensureStructFingerprintSegmented(spark, corpusDir,
      sBase, "av_id", "av", variant = "segfp",
      artifactRootOverride = Some(root)))
    assert(segS === rows(avs.selectExpr("av_id AS __id",
      "av_struct_fingerprint(av) AS __sim").where("__sim IS NOT NULL")))
    assert(segS.size === 24)
  }
}
