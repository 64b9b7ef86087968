package graft.tools

import java.nio.file.{Files, Paths}

import graft._

/** Throwaway measurement / iteration probe (not part of the library):
  * a SUBSET [[Verify]] — dump only the named registry queries (plus their
  * oracle SQL) so `tools/compare.py` can gate-check work in progress
  * without replaying all 140+ entries.
  *
  * Usage: runMain graft.tools.Probe <sfDir> <outDir> <name1,name2,...>
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, names) = args
    val wanted = names.split(',').toSet
    val spark = GraftSession.get()
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter(kv => wanted(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[probe] $name failed: ${e.getMessage}")
      }
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => wanted(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
