package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one shared lifecycle for ingest-time artifacts ([[IvfIndex]],
  * [[LshIndex]], [[DedupIndex]]): stale-check against the source corpus
  * mtime, build into a unique per-attempt staging dir, commit with one
  * atomic rename, tolerate losing a concurrent-build race, read back.
  * Keeping it in one place means a lifecycle fix (visibility, races,
  * staleness) lands everywhere at once instead of drifting per index.
  */
object ArtifactStore {

  /** Read the artifact `root/key`, building it first if missing or stale.
    *
    * @param sourceFile the corpus file whose mtime invalidates the
    *        artifact: regenerated corpus → rebuild, never silent reuse
    * @param build writes the artifact's parquet to the given staging path
    *        (the caller picks options like `partitionBy`)
    */
  def ensure(spark: SparkSession, sourceFile: String, root: String,
      key: String)(build: String => Unit): DataFrame = {
    val target = Paths.get(s"$root/$key")
    val source = Paths.get(sourceFile)
    if (Files.exists(target) && Files.exists(source) &&
        Files.getLastModifiedTime(source).compareTo(Files.getLastModifiedTime(target)) > 0)
      org.apache.commons.io.FileUtils.deleteDirectory(target.toFile)
    if (!Files.exists(target)) {
      // unique per-attempt staging dir: concurrent builders each write
      // their own area; exactly one wins the atomic rename
      val tmp = Paths.get(s"$root/__build_${key}_${java.util.UUID.randomUUID()}")
      build(tmp.toString)
      try Files.move(tmp, target)
      catch { // lost the race: the winner's artifact is equivalent
        case _: java.nio.file.FileAlreadyExistsException =>
          org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
      }
    }
    spark.read.parquet(target.toString)
  }

  // ---- segmented artifacts (incremental append) -------------------------
  //
  // The single-shot `ensure` rebuilds the whole artifact when the corpus
  // changes — right for bounded fixtures, wrong for a 100 TB streaming
  // corpus where each micro-batch adds documents. Segmented artifacts
  // commit APPENDS the way the confirmed block tier does: a new segment
  // directory becomes visible only through one fsynced atomic manifest
  // swap, so readers never see a torn append; whatever a crash leaves
  // (a `__seg_*` staging dir, or a renamed segment the manifest never
  // recorded) is invisible to readers and swept by the next append.
  // Appends are SINGLE-WRITER (the ingest job), same as the block
  // store; concurrent base builds collide on the base segment's fixed
  // name — one atomic rename wins, the manifest write is idempotent.

  private def manifestOf(dir: String) = s"$dir/_segments"

  private def listSegments(dir: String): Seq[String] = {
    val m = Paths.get(manifestOf(dir))
    if (Files.exists(m)) {
      import scala.jdk.CollectionConverters._
      Files.readAllLines(m).asScala.toSeq.filter(_.nonEmpty)
    } else Seq.empty
  }

  private def writeManifest(dir: String, segs: Seq[String]): Unit = {
    import java.nio.file.StandardOpenOption._
    // UNIQUE per-attempt tmp: racing writers each rename their own file
    // (ATOMIC_MOVE over an existing manifest replaces it atomically, so
    // a raced duplicate write just re-commits identical content) — a
    // shared tmp name would make the losing rename throw NoSuchFile
    val tmp = Paths.get(manifestOf(dir) + "__tmp_" + java.util.UUID.randomUUID())
    // SYNC + dir fsync: rename alone is atomic only against process
    // crashes; on power loss some filesystems persist the rename before
    // the data, surfacing an empty manifest
    Files.write(tmp,
      segs.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8),
      WRITE, CREATE, TRUNCATE_EXISTING, SYNC)
    Files.move(tmp, Paths.get(manifestOf(dir)),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    try {
      val ch = java.nio.channels.FileChannel.open(Paths.get(dir), READ)
      try ch.force(true) finally ch.close()
    } catch { case _: Exception => () } // best-effort where unsupported
  }

  /** WRITER-ONLY sweep (the single appender calls this; a reader must
    * never delete — it could race the live writer's staging dir): drops
    * `__seg_*` staging dirs AND committed-name `seg_*` dirs absent from
    * the manifest (a crash between segment rename and manifest write
    * orphans one; it was never visible to readers). */
  private def recoverSegments(dir: String): Unit = {
    val d = Paths.get(dir)
    if (Files.exists(d)) {
      val committed = listSegments(dir).toSet
      val stream = Files.list(d)
      try {
        import scala.jdk.CollectionConverters._
        stream.iterator().asScala.toList
          .filter { p =>
            val n = p.getFileName.toString
            n.startsWith("__seg_") || (n.startsWith("seg_") && !committed(n))
          }
          .foreach(p => org.apache.commons.io.FileUtils.deleteDirectory(p.toFile))
      } finally stream.close()
    }
  }

  /** Read the segmented artifact `root/key`, building its base segment
    * first if the manifest is missing (or the whole artifact if
    * `sourceFile` exists and is newer than the BASE BUILD — regenerated
    * corpus, never silent reuse). Staleness compares against the
    * `seg_base` directory's mtime, which only the base build sets:
    * every append rewrites the manifest, so the manifest's mtime would
    * race past a later-regenerated corpus and silently mask staleness.
    * Concurrent base builds of a FRESH artifact are safe: the base
    * segment has a FIXED name, so racers collide on the atomic rename
    * (loser sweeps its staging dir; a racer whose parent dir vanished
    * retries), and the manifest write is idempotent — never two base
    * segments. REGENERATION (the staleness delete) is single-builder,
    * like appends: a regenerating builder racing other builders could
    * delete a base a racer is about to reference, which the
    * exists-guard before the manifest write narrows but cannot close. */
  def ensureSegmented(spark: SparkSession, root: String, key: String,
      sourceFile: Option[String] = None)(
      buildBase: String => Unit): DataFrame = {
    val dir = s"$root/$key"
    val manifest = Paths.get(manifestOf(dir))
    val basePath = Paths.get(s"$dir/seg_base")
    sourceFile.foreach { src =>
      val s = Paths.get(src)
      // the staleness reference is the OLDEST committed segment (the
      // base, or the compacted segment that replaced it): appends never
      // touch it, so they cannot mask a regeneration the way the
      // manifest's mtime would — and compaction PRESERVES the oldest
      // segment's mtime on its output for exactly the same reason (it
      // rewrites old data without consulting the source, so a fresh
      // timestamp would mask a regeneration that preceded it)
      val stale = Files.exists(s) && Files.exists(manifest) &&
        listSegments(dir).headOption.forall { seg =>
          val p = Paths.get(s"$dir/$seg")
          !Files.exists(p) || // manifest without its segment: torn state
            Files.getLastModifiedTime(s).compareTo(Files.getLastModifiedTime(p)) > 0
        }
      if (stale)
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
    // bounded retry: a racing regeneration can delete the dir between a
    // builder's rename and manifest write — the loser rebuilds cleanly
    var attempt = 0
    while (listSegments(dir).isEmpty && attempt < 3) {
      attempt += 1
      Files.createDirectories(Paths.get(dir))
      val tmp = Paths.get(s"$dir/__seg_base_${java.util.UUID.randomUUID()}")
      buildBase(tmp.toString)
      try Files.move(tmp, basePath)
      catch { // lost the race — the winner's base is equivalent
        case _: java.nio.file.FileAlreadyExistsException =>
          org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
        case _: java.nio.file.NoSuchFileException => // parent deleted under us
          org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
      }
      // idempotent under the race (same single-line content), and also
      // heals a crash that renamed seg_base but never wrote the manifest;
      // never commit a manifest whose base a racing delete removed
      if (listSegments(dir).isEmpty && Files.exists(basePath))
        writeManifest(dir, Seq("seg_base"))
    }
    readSegmented(spark, root, key)
  }

  /** Append one delta segment (SINGLE writer, like the block store). The
    * delta becomes visible atomically; a crash mid-append changes
    * nothing for readers and is swept by the next append. */
  def appendSegment(spark: SparkSession, root: String, key: String)(
      buildDelta: String => Unit): Unit = {
    val dir = s"$root/$key"
    require(listSegments(dir).nonEmpty,
      s"segmented artifact $dir has no base — call ensureSegmented first")
    recoverSegments(dir)
    // full UUID: a truncated name's birthday collision with an existing
    // committed segment would abort the append on the rename
    val name = s"seg_${java.util.UUID.randomUUID()}"
    val tmp = Paths.get(s"$dir/__seg_$name")
    buildDelta(tmp.toString)
    Files.move(tmp, Paths.get(s"$dir/$name"))
    writeManifest(dir, listSegments(dir) :+ name)
  }

  /** Union of all committed segments, in commit order. */
  def readSegmented(spark: SparkSession, root: String, key: String): DataFrame = {
    val dir = s"$root/$key"
    val segs = listSegments(dir)
    require(segs.nonEmpty, s"segmented artifact $dir has no committed segments")
    spark.read.parquet(segs.map(s => s"$dir/$s"): _*)
  }

  /** Fold all committed segments into one — the small-files
    * countermeasure a long-appending artifact needs (the analog of the
    * block store's confirmed-tier compaction). SINGLE-WRITER like
    * appends. The compacted data lands as a new `seg_*` written to a
    * staging dir first, then ONE manifest swap makes it the only
    * committed segment; readers see either the old segment list or the
    * compacted one, never a mix. The replaced segments deliberately
    * stay on disk as unmanifested orphans until the NEXT writer
    * operation sweeps them — a reader that resolved the old manifest
    * (parquet file listings are eager) can still finish its scan. The
    * compacted segment inherits the OLDEST input segment's mtime, so
    * the [[ensureSegmented]] staleness reference still dates from the
    * base build and a source regeneration that preceded the compaction
    * is not masked. Returns the number of segments folded (0 = already
    * compact). */
  def compactSegments(spark: SparkSession, root: String, key: String): Int = {
    val dir = s"$root/$key"
    val before = listSegments(dir)
    if (before.size <= 1) return 0
    val oldestMtime = Files.getLastModifiedTime(Paths.get(s"$dir/${before.head}"))
    val name = s"seg_${java.util.UUID.randomUUID()}"
    val tmp = s"$dir/__seg_$name"
    readSegmented(spark, root, key).write.mode("overwrite").parquet(tmp)
    Files.move(Paths.get(tmp), Paths.get(s"$dir/$name"))
    Files.setLastModifiedTime(Paths.get(s"$dir/$name"), oldestMtime)
    writeManifest(dir, Seq(name))
    before.size
  }
}
