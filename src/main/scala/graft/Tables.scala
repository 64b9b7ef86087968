package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * The reference engine's storage is three relational tables in PostgreSQL
  * (blocks / transactions / events — /root/reference/app/db/model.go:15-89);
  * the synthetic fixtures model the same shapes: a keyed dimension with a
  * time axis (`orders` ≙ blocks: unique key + timestamp), a fact table with
  * FK + secondary-key predicates (`lineitem` ≙ transactions), and an event
  * stream (`events` ≙ events). `documents` / `embeddings` back the
  * training-data-pipeline extensions (dedup, similarity, text analysis).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    RelationCache.parquet(spark, s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  /** `events.ts` has shipped as both parquet TIMESTAMP(NANOS) — which Spark
    * reads as a nanosecond long under `spark.sql.legacy.parquet.nanosAsLong`
    * — and plain TIMESTAMP(MICROS). Normalize either to microsecond
    * TIMESTAMP_NTZ — the same truncation DuckDB applies when casting
    * TIMESTAMP_NS to TIMESTAMP (its `CAST(ts AS TIMESTAMP)` is a no-op on
    * µs data) — so engine and oracle agree on both vintages. */
  /** Directories whose int64 `events.ts` already passed the ns-magnitude
    * probe — the check reads one row once per directory VERSION, not per
    * query. Keyed on the parquet path's mtime so a fixture regenerated
    * in-place with different units mid-session re-probes instead of
    * riding a stale pass. */
  private val nsProbed = new java.util.concurrent.ConcurrentHashMap[String, Long]()

  private def eventsMtime(dir: String): Long =
    try java.nio.file.Files
      .getLastModifiedTime(java.nio.file.Paths.get(s"$dir/events.parquet"))
      .toMillis
    catch { case _: java.io.IOException => -1L } // non-local path: probe every call

  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types._
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType =>
        // the int64 must be NANOSECONDS since epoch (the nanosAsLong
        // vintage). Spark's type alone can't distinguish ns from a plain
        // INT64-micros encoding, and dividing µs by 1000 would silently
        // shift every timestamp 1000× — so probe ONE row's magnitude
        // (units are uniform per file): ns since epoch for any plausible
        // fixture date (≥ ~1973) is ≥ 1e17, µs is ~1e15.
        val mtime = eventsMtime(dir)
        if (mtime < 0 || nsProbed.get(dir) != mtime) {
          // first NON-NULL value: a null in the sampled row would unbox
          // to 0 and fail the magnitude check spuriously
          df.select("ts").filter(org.apache.spark.sql.functions.col("ts").isNotNull)
            .head(1).foreach { r =>
              val ts = r.getLong(0)
              require(ts > 100_000_000_000_000_000L,
                s"events.ts int64 magnitude $ts is not nanoseconds since " +
                  "epoch (expected ≥ 1e17); refusing to guess the unit")
            }
          if (mtime >= 0) nsProbed.put(dir, mtime)
        }
        df.withColumn("ts", expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)"))
      case TimestampType | TimestampNTZType =>
        df.withColumn("ts", expr("CAST(ts AS TIMESTAMP_NTZ)"))
      case dt =>
        // a catch-all cast here would turn e.g. a malformed string
        // vintage into silent NULLs under non-ANSI semantics
        throw new IllegalStateException(s"unexpected events.ts type: $dt")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Register every fixture table as a session temp view, so the whole
    * analytics surface is reachable from pure `spark.sql(...)` — the
    * DataFrame registry and the SQL text route hit the same Catalyst
    * plans, and the custom functions ([[GraftExtensions]]: keccak256,
    * uint256_*, vec_dot*, gzip_text/gunzip_text, image/av decode) are
    * already in the session FunctionRegistry. `events` goes through
    * [[events]], so its timestamp normalization applies to SQL too. */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    // route through the per-table accessors, not raw load(): any
    // normalization an accessor carries (events' ns/µs probe today, any
    // future one) must reach SQL users too, or the SQL-≡-DataFrame
    // equivalence SqlSurfaceSpec pins silently breaks
    val loaders: Map[String, (SparkSession, String) => DataFrame] = Map(
      "region" -> (region _), "nation" -> (nation _), "customer" -> (customer _),
      "supplier" -> (supplier _), "part" -> (part _), "orders" -> (orders _),
      "lineitem" -> (lineitem _), "events" -> (events _),
      "documents" -> (documents _), "embeddings" -> (embeddings _))
    all.foreach(name => loaders(name)(spark, dir).createOrReplaceTempView(name))
  }
}
