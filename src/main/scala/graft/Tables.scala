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
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  /** `events.ts` is stored as parquet TIMESTAMP(NANOS); Spark reads it as a
    * nanosecond long (spark.sql.legacy.parquet.nanosAsLong). Normalize to
    * microsecond TIMESTAMP_NTZ — the same truncation DuckDB applies when
    * casting TIMESTAMP_NS to TIMESTAMP — so engine and oracle agree. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    load(spark, dir, "events")
      .withColumn("ts", expr("CAST(timestamp_micros(ts DIV 1000) AS TIMESTAMP_NTZ)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
