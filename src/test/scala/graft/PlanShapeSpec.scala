package graft

import org.apache.spark.sql.execution.SimpleMode

/** Plan-shape regression guards: the properties that make the read path
  * scale (pushdown, pruning, bounded broadcasts) asserted on the actual
  * physical plans, so a refactor cannot silently lose them. */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.explainString(SimpleMode)

  test("point lookup pushes the hash predicate into the parquet scan") {
    val p = plan("ev_q1_block_by_hash")
    assert(p.contains("PushedFilters") && p.contains("EqualTo(hash"))
  }

  test("projection query reads exactly one column") {
    val p = plan("q05_range_projection")
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint>"))
    assert(p.contains("GreaterThanOrEqual(o_orderkey"))
  }

  test("ranged fact-dim join broadcasts the pruned dim side with pushed range") {
    val p = plan("ev_j1_txs_from_by_number_range")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("GreaterThanOrEqual(number,1000)"))
    assert(p.contains("EqualTo(from,"))
  }

  test("topics matcher predicates evaluate in the scan stage, origin pushed") {
    val p = plan("ev_topics_range")
    assert(p.contains("EqualTo(origin,"))
    assert(p.contains("element_at"))
    assert(!p.contains("SortMergeJoin")) // the blocks side stays broadcast
  }

  test("unbounded dim side is NOT hint-broadcast (AQE decides at runtime)") {
    val p = plan("j8_events_dim_enrich")
    assert(p.contains("AdaptiveSparkPlan"))
  }

  test("top-K plans as TakeOrderedAndProject, never a global sort") {
    val p = plan("ev_t2_last50_events_from_contract")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("anti-join gap detection has no distinct aggregation on the present side") {
    val p = plan("ev_j10_missing_blocks")
    assert(p.contains("LeftAnti"))
    assert(!p.contains("HashAggregate")) // the r1 .distinct() regression
  }
}
