package graft.tools

import graft._

/** Throwaway iteration probe (not part of the library): a SUBSET
  * [[Verify]] — dump only the named registry queries (plus their oracle
  * SQL) through [[Verify.dump]] so `tools/compare.py` can gate-check
  * work in progress without replaying the full registry.
  *
  * Usage: runMain graft.tools.Probe <sfDir> <outDir> <name1,name2,...>
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names) = args
    val wanted = names.split(',').toSet
    val spark = GraftSession.get()
    Verify.dump(spark, sfDir, outDir,
      SparkEntry.queries.filter(kv => wanted(kv._1)),
      SparkEntry.oracleSql.filter(kv => wanted(kv._1)))
    spark.stop()
  }
}
