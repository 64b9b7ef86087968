package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

/** Salted skew join: result identity with the plain join, salt-key
  * exchange in the plan, and genuine spreading of a hot key. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // one hot key (90% of probe rows) + a long tail
  private def probe = ((1 to 90).map(i => (1L, i.toLong)) ++
    (1 to 10).map(i => (100L + i, i.toLong))).toDF("k", "pid")
  private def build = Seq((1L, "hot"), (101L, "a"), (103L, "b"), (999L, "c"))
    .toDF("k", "tag")

  test("salted join returns exactly the plain join's multiset") {
    val plain = probe.join(build, Seq("k"))
      .select("k", "pid", "tag").collect().map(_.toSeq).sortBy(_.toString)
    for (salt <- Seq(1, 3, 8)) {
      val salted = SkewJoin.saltedJoin(probe, build, Seq("k"),
          saltBy = col("pid"), salt = salt)
        .select("k", "pid", "tag").collect().map(_.toSeq).sortBy(_.toString)
      assert(salted === plain, s"salt=$salt")
    }
    // a constant saltBy still yields the identical result (salting only
    // redistributes; it can never change the multiset)
    val const = SkewJoin.saltedJoin(probe, build, Seq("k"),
        saltBy = lit(7L), salt = 4)
      .select("k", "pid", "tag").collect().map(_.toSeq).sortBy(_.toString)
    assert(const === plain)
  }

  test("matches the plain join on the real tables") {
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_linenumber"))
    val o = Tables.orders(spark, sf0001)
      .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"))
    val plain = li.join(o, Seq("l_orderkey")).count()
    val salted = SkewJoin.saltedJoin(li, o, Seq("l_orderkey"),
      saltBy = col("l_linenumber"), salt = 8).count()
    assert(salted === plain && salted > 0)
  }

  test("null saltBy values still join (salt 0), preserving the plain multiset") {
    val p = Seq((1L, Some(4L)), (1L, None), (101L, None)).toDF("k", "pid")
    val plain = p.join(build, Seq("k"))
      .select("k", "tag").collect().map(_.toSeq).sortBy(_.toString)
    val salted = SkewJoin.saltedJoin(p, build, Seq("k"),
        saltBy = col("pid"), salt = 4)
      .select("k", "tag").collect().map(_.toSeq).sortBy(_.toString)
    assert(salted === plain)
    assert(salted.length === 3) // both null-pid rows survive
  }

  test("the hot key's probe rows spread across salt values") {
    val spread = probe.withColumn("__salt", pmod(col("pid"), lit(8L)))
      .filter(col("k") === 1L)
      .select(countDistinct(col("__salt"))).head.getLong(0)
    assert(spread === 8L, "a hot key must fan out over all salt values")
  }

  test("plan: equi-join keyed on (k, salt); the build replicate is a narrow explode") {
    val plan = SkewJoin.saltedJoin(probe, build, Seq("k"),
        saltBy = col("pid"), salt = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    // the join condition must include the salt column, else a hot key
    // still lands on one reducer and the whole point is lost
    assert(plan.contains("__salt"), s"expected the salt in the join keys:\n$plan")
  }
}
