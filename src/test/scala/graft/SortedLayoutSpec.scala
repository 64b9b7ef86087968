package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

import graft.sources.SortedLayout

/** Pruning evidence for the key-clustered layout: at 10x fixture volume a
  * point lookup must (a) read FEWER FILES than the table has — directory
  * pruning from the derived bucket predicate, pinned via the scan's
  * `numFiles` metric — and (b) emit roughly ONE ROW GROUP of rows from
  * the scan, not one bucket — min/max row-group stats pruning from the
  * key sort, pinned via the scan's `numOutputRows`. This is the 10M-row
  * point-lookup story measured, not claimed: lookup cost is bounded by
  * (one dir, one row group) regardless of table size.
  */
class SortedLayoutSpec extends SparkSpec {

  private def finalPlan(qe: org.apache.spark.sql.execution.QueryExecution) =
    qe.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }

  private def scanMetrics(qe: org.apache.spark.sql.execution.QueryExecution) = {
    val scans = finalPlan(qe).collectLeaves().collect {
      case f: FileSourceScanExec => f
    }
    assert(scans.nonEmpty, s"no FileSourceScanExec in:\n${finalPlan(qe)}")
    (scans.head.metrics("numFiles").value,
      scans.head.metrics("numOutputRows").value)
  }

  private def parquetFiles(dir: String): Long = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
      .count(p => p.toString.endsWith(".parquet") &&
        !p.getFileName.toString.startsWith("_"))
  }

  test("point lookup prunes to one bucket dir and ~one row group at 10x volume") {
    val dir = Files.createTempDirectory("graft-layout").toString + "/blocks"
    val n = 1000000L // 10x the sf0.01 block count scale
    val blocks = spark.range(n).select(col("id").as("number"),
      (col("id") * 2654435761L % 1000003).as("gas_used"),
      lpad(col("id").cast("string"), 24, "0").as("hash_ish"))
    // span 65536 → ~16 bucket dirs; 64 KB row groups → ~40+ groups/file
    SortedLayout.write(blocks, dir, "number", span = 65536L,
      rowGroupBytes = 64L * 1024)
    val total = parquetFiles(dir)
    assert(total >= 10, s"fixture wrote only $total files — layout broken?")

    val q = SortedLayout.pointLookup(spark, dir, 123456L)
    val qe = q.queryExecution
    val hits = qe.executedPlan.execute().count()
    assert(hits == 1L, s"point lookup returned $hits rows")

    val (filesRead, scanRows) = scanMetrics(qe)
    info(s"point lookup: $filesRead of $total files, $scanRows rows off the scan")
    // directory pruning: the planner kept only the matching __kb dir
    assert(filesRead < total,
      s"scan read $filesRead of $total files — bucket dirs did not prune")
    assert(filesRead >= 1 && filesRead <= 2,
      s"scan read $filesRead files for a single-bucket lookup")
    // row-group pruning: the key sort made min/max stats tight, so the
    // pushed predicate skipped all but ~one group of the 65536-row bucket
    assert(scanRows < 65536 / 4,
      s"scan emitted $scanRows rows — row-group stats did not prune " +
        "within the bucket (is the file key-sorted?)")
  }

  test("hash lookup: bloom filters prune row groups that min/max stats cannot") {
    val n = 200000L
    // uniform hashes: every row group's [min, max] spans nearly the whole
    // hex space, so a hash-equality predicate survives every stats check
    val blocks = spark.range(n).select(col("id").as("number"),
      md5(col("id").cast("string")).as("hash"))
    val target = blocks.filter(col("number") === 123456L)
      .select("hash").head().getString(0)

    def lookupRows(bloom: Boolean): (Long, Long) = {
      val dir = Files.createTempDirectory(s"graft-layout-h$bloom").toString + "/b"
      SortedLayout.write(blocks, dir, "number", span = 65536L,
        rowGroupBytes = 64L * 1024,
        bloomCols = if (bloom) Seq("hash") else Nil, bloomNdv = 4096L)
      val q = SortedLayout.hashLookup(spark, dir, "hash", target)
      val qe = q.queryExecution
      val hits = qe.executedPlan.execute().count()
      (hits, scanMetrics(qe)._2)
    }

    val (hitsOff, rowsOff) = lookupRows(bloom = false)
    val (hitsOn, rowsOn) = lookupRows(bloom = true)
    assert(hitsOff == 1L && hitsOn == 1L, "hash lookup must find its row")
    info(s"hash lookup scan rows: $rowsOff without bloom, $rowsOn with bloom")
    // without bloom the uniform hash defeats stats pruning: the scan
    // materializes (nearly) the whole table
    assert(rowsOff > n / 2,
      s"control broken: $rowsOff rows scanned without bloom — stats pruned " +
        "a uniform hash?")
    // with bloom, only bloom-passing row groups read: ~one group + FPs
    assert(rowsOn < n / 10,
      s"bloom did not prune: $rowsOn rows off the scan (without: $rowsOff)")
  }

  test("range lookup touches only covering bucket dirs and matches a plain filter") {
    val dir = Files.createTempDirectory("graft-layout-r").toString + "/blocks"
    val n = 200000L
    val blocks = spark.range(n).select(col("id").as("number"),
      (col("id") * 31 % 997).as("gas_used"))
    SortedLayout.write(blocks, dir, "number", span = 16384L,
      rowGroupBytes = 64L * 1024)
    val total = parquetFiles(dir)

    val (lo, hi) = (50000L, 52000L) // spans at most 2 buckets
    val q = SortedLayout.rangeLookup(spark, dir, lo, hi)
    val qe = q.queryExecution
    val rows = qe.executedPlan.execute().count()
    assert(rows == hi - lo + 1, s"range lookup returned $rows rows")
    val (filesRead, _) = scanMetrics(qe)
    info(s"range lookup: $filesRead of $total files")
    assert(filesRead < total,
      s"scan read $filesRead of $total files — bucket dirs did not prune")

    // correctness: the layout round-trips the data (sum is order-free)
    val got = SortedLayout.rangeLookup(spark, dir, 0, n - 1)
      .agg(sum("gas_used"), count("*")).head()
    val want = blocks.agg(sum("gas_used"), count("*")).head()
    assert(got == want, s"layout round-trip mismatch: $got vs $want")
  }
}
