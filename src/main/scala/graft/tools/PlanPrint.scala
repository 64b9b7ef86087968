package graft.tools

/** Dev tool (not part of the library surface): prints the SimpleMode
  * physical plan of registry queries for plan audits.
  * `runMain graft.tools.PlanPrint <name>...` */
object PlanPrint {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.get()
    for (name <- args) {
      val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      println(s"===== $name =====")
      println(df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode))
    }
    spark.stop()
  }
}
