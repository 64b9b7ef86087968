package graft.tools

/** Throwaway repro (dev tool): connected components on a tiny edge frame
  * under whatever master SPARK_GRAFT_MASTER selects, printing the FULL
  * stack on failure — the local-cluster Kryo failure's message alone
  * ("Unable to create serializer ... HeapByteBuffer") names no frame.
  * Usage: runMain graft.tools.CcLcRepro
  */
object CcLcRepro {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val spark = graft.GraftSession.get(master, cpus.toInt)
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("a_id", "b_id")
    try {
      val out = graft.pipeline.Components.nearDupClusters(edges)
        .orderBy("doc_id").collect()
      println("CCLCREPRO OK " + out.mkString(" "))
    } catch {
      case e: Throwable =>
        println("CCLCREPRO FAIL " + e)
        e.printStackTrace()
        var c = e.getCause
        while (c != null) { println("CAUSE: " + c); c.printStackTrace(); c = c.getCause }
    }
    spark.stop()
  }
}
