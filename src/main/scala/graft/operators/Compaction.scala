package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** S7: upsert semantics over append-only storage (SURVEY §2.1).
  *
  * The reference upserts with `INSERT … ON CONFLICT UPDATE ALL` keyed on
  * the PK (`app/db/transaction.go:17-25`, `app/db/event.go:17-25`). On
  * immutable parquet the same contract is a last-writer-wins compaction
  * view: latest `versionCol` per key wins. The BlockStore hot tier applies
  * this to whole packed blocks; this operator is the general form for flat
  * tables (and the periodic rewrite that physically drops shadowed rows).
  *
  * Scale: one hash-shuffle on the PK; at 100 TB run it per partition
  * bucket so compaction parallelizes and only rewritten buckets churn. */
object Compaction {

  /** Latest row per key — the queryable upsert view. */
  def latestByKey(df: DataFrame, keys: Seq[String], versionCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** MERGE-style delta application: rows in `updates` replace same-key
    * rows in `base`; new keys append. Both sides one shuffle on the key. */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val keyCols: Seq[Column] = keys.map(col)
    base.join(updates.select(keyCols: _*), keys, "left_anti")
      .unionByName(updates)
  }
}
