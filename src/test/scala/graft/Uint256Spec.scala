package graft

import org.apache.spark.sql.functions._

import graft.functions.Uint256

/** Property tests for the custom uint256 expressions vs BigInt, including
  * values far beyond DecimalType(38) and the SQL registration path. */
class Uint256Spec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(7)
  private def randBig(): BigInt = BigInt(rng.nextInt(256), rng.rng)

  // scala.util.Random does not expose its underlying j.u.Random; adapt:
  private implicit class RngOps(r: scala.util.Random) { def rng: java.util.Random = r.self }

  test("uint256 add/mul/cmp agree with BigInt on 200 random pairs up to 2^256") {
    val pairs = Seq.fill(200)((randBig(), randBig()))
    val df = pairs.map { case (a, b) => (a.toString, b.toString) }.toDF("a", "b")
    val got = df.select(
      Uint256.add(col("a"), col("b")).as("s"),
      Uint256.mul(col("a"), col("b")).as("p"),
      Uint256.cmp(col("a"), col("b")).as("c"),
      col("a"), col("b")).collect()
    got.foreach { r =>
      val (a, b) = (BigInt(r.getAs[String]("a")), BigInt(r.getAs[String]("b")))
      assert(r.getAs[String]("s") === (a + b).toString)
      assert(r.getAs[String]("p") === (a * b).toString)
      assert(r.getAs[Int]("c") === a.compare(b))
    }
  }

  test("lexicographic vs numeric ordering divergence is handled") {
    val df = Seq(("9", "10")).toDF("a", "b")
    // string ordering says "9" > "10"; uint256_cmp must say 9 < 10
    assert(df.select(Uint256.lt(col("a"), col("b"))).collect().head.getBoolean(0))
    assert(df.select(col("a") > col("b")).collect().head.getBoolean(0))
  }

  test("SQL registration via GraftExtensions: uint256_* callable from spark.sql") {
    val big1 = BigInt(2).pow(200).toString
    val big2 = BigInt(2).pow(199).toString
    val r = spark.sql(
      s"SELECT uint256_add('$big1', '$big2') AS s, uint256_cmp('$big1', '$big2') AS c")
      .collect().head
    assert(r.getString(0) === (BigInt(2).pow(200) + BigInt(2).pow(199)).toString)
    assert(r.getInt(1) === 1)
  }

  test("SumAggregator: exact distributed sum beyond Decimal(38) range") {
    val vals = Seq.fill(300)(randBig()).map(_.toString)
    val expected = vals.map(BigInt(_)).sum.toString
    val got = vals.toDF("v").repartition(8)
      .agg(Uint256.sum(col("v")).as("total")).collect().head.getString(0)
    assert(got === expected)
  }

  test("recomputing tx cost = gas*gasPrice + value matches stored cost on domain fixtures") {
    val txs = graft.queries.EvmQueries.txs(spark)
    val mismatches = txs.select(
      Uint256.add(Uint256.mul(col("gasprice"), col("gas").cast("string")), col("value")).as("recomputed"),
      col("cost"))
      .filter(col("recomputed") =!= col("cost"))
      .count()
    assert(mismatches === 0)
  }
}
