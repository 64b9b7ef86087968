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
}
