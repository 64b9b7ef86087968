package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Dev profiling tool (not part of the library surface): runs registry
  * queries with the Bench forcing protocol and reports, per query, the
  * warm wall time alongside the number of Spark jobs, stages and tasks
  * and the total shuffle bytes a single warm pass launches — the
  * scheduling-overhead picture the wall number alone hides.
  *
  * Usage: runMain graft.tools.JobProfile <sfDir> <name1,name2,...|all>
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val wanted: String => Boolean =
      if (args(1) == "all") _ => true else args(1).split(',').toSet
    val spark = graft.GraftSession.get()

    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val shuffleRead = new AtomicLong
    val shuffleWrite = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = ()
    })

    def isolate(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      System.gc()
    }

    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => wanted(kv._1))
      .foreach { case (name, fn) =>
        // one untimed pass so codegen/artifact builds don't pollute counts
        try {
          graft.Bench.force(name, fn(spark, sfDir))
          isolate()
          // drain listener events from the warmup before counting
          Thread.sleep(300)
          jobs.set(0); stages.set(0); tasks.set(0)
          shuffleRead.set(0); shuffleWrite.set(0)
          val t0 = System.nanoTime()
          graft.Bench.force(name, fn(spark, sfDir))
          val sec = (System.nanoTime() - t0) / 1e9
          Thread.sleep(300)
          println(f"JOBPROFILE $name%-32s warm=$sec%7.3f jobs=${jobs.get}%3d " +
            f"stages=${stages.get}%3d tasks=${tasks.get}%5d " +
            f"shufR=${shuffleRead.get / 1024}%8dK shufW=${shuffleWrite.get / 1024}%8dK")
        } catch {
          case e: Throwable =>
            println(s"JOBPROFILE $name ERROR ${Option(e.getMessage).getOrElse(e.getClass.getName).take(120)}")
        }
      }
    spark.stop()
  }
}
