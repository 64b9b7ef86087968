package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Operator-shape semantics of the relational layer (SURVEY §2.2–2.6). */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L), (4L, "c", 40L), (2L, "b", 99L),
  ).toDF("k", "s", "v")

  test("pointLookup enforces LIMIT-1 First semantics (query.go:82)") {
    assert(Relational.pointLookup(df, col("s") === "b").count() === 1)
    assert(Relational.pointLookup(df, col("s") === "zz").count() === 0)
  }

  test("filterScan returns the full matching set") {
    assert(Relational.filterScan(df, col("s") === "b").count() === 2)
  }

  test("keyRangeScan is closed-range and sorted") {
    val got = Relational.keyRangeScan(df, col("k"), 2, 3).select("k")
      .collect().map(_.getLong(0))
    assert(got.sorted.sameElements(got))
    assert(got.toSet === Set(2L, 3L))
  }

  test("semiJoin keeps fact rows with a matching dim key, no duplication") {
    val dim = Seq((10L, "x"), (10L, "y"), (30L, "z")).toDF("dk", "tag")
    val got = Relational.semiJoin(df, dim, "v", "dk", lit(true)).collect()
    // v=10 (k=1) and v=30 (k=3) match; duplicate dim keys must not duplicate facts
    assert(got.length === 2)
  }

  test("antiJoin finds exactly the missing candidates (syncer.go:21-37)") {
    val present = Seq(0L, 1L, 3L, 4L).toDF("n")
    val got = Relational.antiJoin(spark.range(0, 6).toDF("n"), present, "n")
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(2L, 5L))
  }

  test("topK returns k rows in order with deterministic tie-break") {
    val got = Relational.topK(df, 2, col("v").desc, col("k")).collect().map(_.getLong(2))
    assert(got.sameElements(Array(99L, 40L)))
  }

  test("saltedJoin: row-identical to the plain join, hot key spread over salts") {
    // skewed fact: one hot key carrying most rows
    val fact = ((1 to 900).map(i => (7L, s"hot$i")) ++ (1 to 100).map(i => (i.toLong % 5, s"cold$i")))
      .toDF("fk", "payload")
    val dim = Seq((7L, "seven"), (0L, "zero"), (1L, "one"), (2L, "two"),
      (3L, "three"), (4L, "four")).toDF("dk", "name")
    val plain = fact.join(dim, fact("fk") === dim("dk"))
      .select("fk", "payload", "name").collect().map(_.toString).sorted
    val salted = Relational.saltedJoin(fact, dim, "fk", "dk", salts = 8)
      .select("fk", "payload", "name").collect().map(_.toString).sorted
    assert(salted === plain)
    assert(salted.length === 1000)
    // plain-join shape contract: the dim's key column stays addressable
    val withDk = Relational.saltedJoin(fact, dim, "fk", "dk", salts = 8)
      .select("dk").distinct().collect().map(_.getLong(0)).sorted
    assert(withDk === Array(0L, 1L, 2L, 3L, 4L, 7L))
    // the dim side really replicates: 6 keys × 8 salts rows on the build side
    val replicated = dim.withColumn("__salt",
      explode(array((0 until 8).map(s => lit(s.toLong)): _*)))
    assert(replicated.count() === 48)
  }

  test("factJoinDim prunes both sides before the join") {
    val dim = Seq((1L, 100L), (2L, 200L), (3L, 300L)).toDF("dk", "dv")
    val got = Relational.factJoinDim(df, dim, "k", "dk",
      col("s") === "a", col("dv") >= 200L).collect()
    assert(got.length === 1) // only (k=3, s=a) ⋈ (dk=3, dv=300)
  }
}
