package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM per `sbt test` fork). */
object TestSession {
  lazy val spark: SparkSession = GraftSession.get("local[4]", 4)
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  lazy val sf0001 = "/root/testdata/sf0.001"
}

/** Shared 1×/10× linear-growth harness for the perf tripwires. Warms both
  * bodies (codegen + JIT), measures each once, and bounds
  * t10 ≤ max(factor · t1, absFloor). Wall time on a shared box is
  * noisy-neighbor-inflated — a concurrent build can triple one sample —
  * so a failing first comparison re-measures both scales once and asserts
  * on the per-scale MINIMUM across passes: a real data-proportional
  * regression fails every pass, a load spike fails at most one. */
trait GrowthChecks { this: SparkSpec =>
  private def timedOnce(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  def assertGrowth(label: String, factor: Double, absFloor: Double)(
      t1Body: => Unit)(t10Body: => Unit): Unit = {
    t1Body; t10Body // warm
    var t1 = timedOnce(t1Body)
    var t10 = timedOnce(t10Body)
    if (t10 > math.max(factor * t1, absFloor)) {
      t1 = math.min(t1, timedOnce(t1Body))
      t10 = math.min(t10, timedOnce(t10Body))
    }
    info(f"$label: 1x $t1%.2f s, 10x $t10%.2f s")
    assert(t10 <= math.max(factor * t1, absFloor),
      f"10x $label took $t10%.2f s vs 1x $t1%.2f s — superlinear growth")
  }
}
