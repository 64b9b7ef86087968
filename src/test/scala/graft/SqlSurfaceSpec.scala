package graft

import org.apache.spark.sql.functions._

/** The pure-SQL route: `Tables.registerViews` + `spark.sql(...)` must
  * reach the same plans (and the same custom functions) as the DataFrame
  * registry — a user can drive the whole engine from SQL text alone. */
class SqlSurfaceSpec extends SparkSpec {

  test("registerViews: every fixture table queryable from SQL text") {
    Tables.registerViews(spark, sf0001)
    Tables.all.foreach { t =>
      assert(spark.sql(s"SELECT * FROM $t LIMIT 1").count() === 1L, t)
    }
  }

  test("SQL text ≡ DataFrame registry on a join-aggregate query") {
    Tables.registerViews(spark, sf0001)
    val viaSql = spark.sql(
      """SELECT o.o_custkey AS k, count(*) AS n, sum(l.l_quantity) AS q
        |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderkey BETWEEN 100 AND 500
        |GROUP BY 1 ORDER BY k""".stripMargin).collect().toSeq
    val viaDf = Tables.orders(spark, sf0001).as("o")
      .filter(col("o_orderkey").between(100, 500))
      .join(Tables.lineitem(spark, sf0001).as("l"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("k"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("q"))
      .orderBy(col("k")).collect().toSeq
    assert(viaSql === viaDf)
  }

  test("custom functions compose with views in one SQL statement") {
    Tables.registerViews(spark, sf0001)
    // gzip round-trip + content digest over the documents view, and the
    // pipeline's vector dot over embeddings — all from SQL text
    val r = spark.sql(
      """SELECT count(*) AS n,
        |  sum(CASE WHEN gunzip_text(gzip_text(text)) = text THEN 1 ELSE 0 END) AS rt,
        |  count(DISTINCT keccak256(encode(text, 'UTF-8'))) AS digests
        |FROM documents""".stripMargin).collect().head
    assert(r.getLong(0) > 0 && r.getLong(1) === r.getLong(0))
    assert(r.getLong(2) > 0)
    val dot = spark.sql(
      """SELECT a.vec_id, vec_dot(a.embedding, b.embedding) AS d
        |FROM embeddings a JOIN embeddings b ON b.vec_id = 0
        |WHERE a.vec_id < 3 ORDER BY a.vec_id""".stripMargin).collect()
    assert(dot.length === 3 && !dot.head.isNullAt(1))
  }

  test("events view carries the normalized timestamp type into SQL") {
    Tables.registerViews(spark, sf0001)
    val dt = spark.sql("SELECT ts FROM events LIMIT 1").schema.head.dataType
    assert(dt.typeName.startsWith("timestamp"), dt.toString)
  }
}
