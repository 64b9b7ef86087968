package graft.pipeline

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lifecycle of the IVF coarse index: the [[Similarity.ivfAssign]] output
  * is an INGEST-TIME artifact — computed once per corpus, persisted
  * partitioned by centroid id, and only read at query time. Recomputing
  * the O(N × centroids) assignment per query would defeat the point of
  * IVF at scale; queries must touch only the `nprobe` probed partitions.
  *
  * The artifact is keyed by (corpus directory, builder format version,
  * every build parameter) so a different `stride` — or a future change to
  * the assignment algorithm — can never silently reuse an index built
  * under different settings. Build is write-to-unique-temp + atomic
  * rename, so concurrent/restarted builders never expose a partial index
  * and never trample each other's in-progress writes.
  */
object IvfIndex {

  /** Bump when the assignment algorithm or artifact layout changes —
    * part of the cache key, so stale-format indexes rebuild. */
  val FormatVersion = 2

  /** Session conf key for the artifact root; falls back to a directory
    * under the JVM working dir rather than any absolute literal. */
  val RootConfKey = "graft.ivf.artifactRoot"

  def artifactRoot(spark: SparkSession): String =
    spark.conf.getOption(RootConfKey)
      .orElse(sys.env.get("GRAFT_IVF_ROOT"))
      .getOrElse(Paths.get("artifacts", "ivf").toAbsolutePath.toString)

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
      artifactRootOverride: Option[String] = None): DataFrame = {
    val root = artifactRootOverride.getOrElse(artifactRoot(spark))
    val corpus = Paths.get(corpusDir).getFileName.toString
    val key = s"${corpus}_v${FormatVersion}_s$stride"
    ArtifactStore.ensure(spark, s"$corpusDir/embeddings.parquet", root, key) { tmp =>
      Similarity.ivfAssign(emb, embCol, idCol, centroids(emb, idCol, embCol, stride))
        .write.mode("overwrite").partitionBy("c_id").parquet(tmp)
    // partition-column type inference may narrow c_id to int; restore long
    }.withColumn("c_id", col("c_id").cast("long"))
  }
}
