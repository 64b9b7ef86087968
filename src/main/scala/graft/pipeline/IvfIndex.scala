package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lifecycle of the IVF coarse index: the [[Similarity.ivfAssign]] output
  * is an INGEST-TIME artifact — computed once per corpus, persisted
  * partitioned by centroid id, and only read at query time. Recomputing
  * the O(N × centroids) assignment per query would defeat the point of
  * IVF at scale; queries must touch only the `nprobe` probed partitions.
  *
  * The artifact is keyed by the corpus directory name so every scale
  * factor gets its own index. Build is write-to-temp + atomic rename, so
  * concurrent/restarted builders never expose a partial index.
  */
object IvfIndex {

  /** Deterministic centroid set: every `stride`-th vector — the
    * k-means-lite coarse quantizer (a trained codebook plugs in the same
    * way: any small (c_id, c_emb) frame works). */
  def centroids(emb: DataFrame, idCol: String, embCol: String,
      stride: Int = 25): DataFrame =
    emb.filter(pmod(col(idCol), lit(stride)) === 0)
      .select(col(idCol).as("c_id"), col(embCol).as("c_emb"))

  /** Read the persisted assignment for the corpus at `corpusDir`,
    * building it first if missing. Returns (idCol, embCol, c_id) rows
    * partitioned on disk by c_id. */
  def ensure(spark: SparkSession, corpusDir: String, emb: DataFrame,
      embCol: String, idCol: String, stride: Int = 25,
      artifactRoot: String = "/root/repo/artifacts/ivf"): DataFrame = {
    val key = Paths.get(corpusDir).getFileName.toString
    val target = Paths.get(s"$artifactRoot/$key")
    // stale-index guard: a corpus regenerated after the index was built
    // invalidates the artifact (compare against the source parquet mtime)
    val source = Paths.get(s"$corpusDir/embeddings.parquet")
    if (Files.exists(target) && Files.exists(source) &&
        Files.getLastModifiedTime(source).compareTo(Files.getLastModifiedTime(target)) > 0)
      org.apache.commons.io.FileUtils.deleteDirectory(target.toFile)
    if (!Files.exists(target)) {
      val tmp = Paths.get(s"$artifactRoot/__build_$key")
      Similarity.ivfAssign(emb, embCol, idCol, centroids(emb, idCol, embCol, stride))
        .write.mode("overwrite").partitionBy("c_id").parquet(tmp.toString)
      try Files.move(tmp, target)
      catch { // lost a concurrent build race: the winner's index is equivalent
        case _: java.nio.file.FileAlreadyExistsException =>
          org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
      }
    }
    // partition-column type inference may narrow c_id to int; restore long
    spark.read.parquet(target.toString).withColumn("c_id", col("c_id").cast("long"))
  }
}
