package graft.tools

import java.nio.file.{Files, Paths}

/** Dev tool (not part of the library surface): writes the FormattedMode
  * physical plan of registry queries to files — the before/after plan
  * evidence the optimization rounds commit under `plans/`.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> [name...]
  * With no names, dumps every registry entry.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names =
      if (args.length > 3) args.drop(3).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = graft.GraftSession.get()
    Files.createDirectories(Paths.get(outDir))
    for (name <- names) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"PLANDUMP wrote $name")
    }
    spark.stop()
  }
}
