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
  // swap, so readers never see a torn append and a crashed append leaves
  // only an invisible `__seg_*` staging dir (swept by the next writer).
  // Appends are SINGLE-WRITER (the ingest job), same as the block store;
  // concurrent `ensureSegmented` base builds tolerate races like
  // `ensure` does — one manifest wins, the loser's segment is swept.

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
    val tmp = Paths.get(manifestOf(dir) + "__tmp")
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

  /** Sweep `__seg_*` staging dirs a crashed writer left — never visible
    * to readers, so deletion cannot race an in-flight scan. */
  private def recoverSegments(dir: String): Unit = {
    val d = Paths.get(dir)
    if (Files.exists(d)) {
      val stream = Files.list(d)
      try {
        import scala.jdk.CollectionConverters._
        stream.iterator().asScala
          .filter(_.getFileName.toString.startsWith("__seg_"))
          .toList
          .foreach(p => org.apache.commons.io.FileUtils.deleteDirectory(p.toFile))
      } finally stream.close()
    }
  }

  private def commitSegment(dir: String, build: String => Unit): Unit = {
    val name = s"seg_${java.util.UUID.randomUUID().toString.take(8)}"
    val tmp = Paths.get(s"$dir/__seg_$name")
    build(tmp.toString)
    Files.move(tmp, Paths.get(s"$dir/$name"))
    writeManifest(dir, listSegments(dir) :+ name)
  }

  /** Read the segmented artifact `root/key`, building its base segment
    * first if the manifest is missing. */
  def ensureSegmented(spark: SparkSession, root: String, key: String)(
      buildBase: String => Unit): DataFrame = {
    val dir = s"$root/$key"
    Files.createDirectories(Paths.get(dir))
    recoverSegments(dir)
    if (listSegments(dir).isEmpty) commitSegment(dir, buildBase)
    readSegmented(spark, root, key)
  }

  /** Append one delta segment (single writer). The delta becomes visible
    * atomically; a crash mid-append changes nothing for readers. */
  def appendSegment(spark: SparkSession, root: String, key: String)(
      buildDelta: String => Unit): Unit = {
    val dir = s"$root/$key"
    require(listSegments(dir).nonEmpty,
      s"segmented artifact $dir has no base — call ensureSegmented first")
    recoverSegments(dir)
    commitSegment(dir, buildDelta)
  }

  /** Union of all committed segments, in commit order. */
  def readSegmented(spark: SparkSession, root: String, key: String): DataFrame = {
    val dir = s"$root/$key"
    val segs = listSegments(dir)
    require(segs.nonEmpty, s"segmented artifact $dir has no committed segments")
    spark.read.parquet(segs.map(s => s"$dir/$s"): _*)
  }
}
