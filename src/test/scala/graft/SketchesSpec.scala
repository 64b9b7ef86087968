package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Sketches

/** Mergeable sketches: CMS upper-bound + merge law, HLL register
  * semantics (rank arithmetic vs the JVM's leading-zero count),
  * duplicate-insensitivity, accuracy regime, and the segmented-artifact
  * lifecycle (base + append ≡ full rebuild under the sketch's merge). */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def termsOf(n: Int, tag: String) =
    spark.range(n).select(concat(lit(tag), col("id")).as("term"))

  test("bitLen52 equals 64 - numberOfLeadingZeros for every magnitude") {
    val vals = (0 until 52).map(1L << _) ++ Seq(3L, 12345L, (1L << 52) - 1)
    val got = vals.toDF("r")
      .select(col("r"), Sketches.bitLen52(col("r")).as("bl")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    got.foreach { case (r, bl) =>
      assert(bl === (64 - java.lang.Long.numberOfLeadingZeros(r)).toLong,
        s"bitLen52($r)")
    }
  }

  test("CMS estimates never underestimate; exact when collision-free") {
    val tc = Seq(("alpha", 100L), ("beta", 7L), ("gamma", 1L))
      .toDF("term", "c")
    val cells = Sketches.cmsCells(tc, "term", "c", width = 512)
    val est = Sketches.cmsEstimate(cells, tc.select("term"), "term", 512)
      .join(tc, "term").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    est.foreach { case (t, e, c) => assert(e >= c, s"$t under-estimated") }
    // 3 terms × 4 rows over 512 buckets: collisions are astronomically
    // unlikely — the estimate must be EXACT here
    est.foreach { case (t, e, c) => assert(e === c, s"$t collided") }
  }

  test("CMS merge law: cells(A ∪ B) == sum-merge(cells(A), cells(B))") {
    val a = termsOf(300, "x").groupBy("term").agg(count(lit(1)).as("c"))
    val b = termsOf(200, "y").union(termsOf(100, "x"))
      .groupBy("term").agg(count(lit(1)).as("c"))
    val full = termsOf(300, "x").union(termsOf(200, "y")).union(termsOf(100, "x"))
      .groupBy("term").agg(count(lit(1)).as("c"))
    val merged = Sketches.mergeCms(
      Sketches.cmsCells(a, "term", "c", 64)
        .union(Sketches.cmsCells(b, "term", "c", 64)))
      .orderBy("j", "bucket").collect().toSeq
    val direct = Sketches.cmsCells(full, "term", "c", 64)
      .orderBy("j", "bucket").collect().toSeq
    assert(merged === direct)
  }

  test("HLL registers: duplicate-insensitive, max-mergeable, ~6% accurate") {
    val n = 10000
    val once = termsOf(n, "v")
    val thrice = once.union(once).union(once)
    val rOnce = Sketches.hllRegisters(once, "term").orderBy("bucket").collect().toSeq
    val rThrice = Sketches.hllRegisters(thrice, "term").orderBy("bucket").collect().toSeq
    assert(rOnce === rThrice) // multiplicity never moves a register

    val half1 = termsOf(n / 2, "v")
    val half2 = spark.range(n / 2, n).select(concat(lit("v"), col("id")).as("term"))
    val merged = Sketches.mergeHll(
      Sketches.hllRegisters(half1, "term")
        .union(Sketches.hllRegisters(half2, "term")))
      .orderBy("bucket").collect().toSeq
    assert(merged === rOnce) // merge(max) ≡ one pass over the union

    val est = Sketches.hllEstimate(Sketches.hllRegisters(once, "term"))
      .collect()(0).getDouble(1)
    // raw-estimate error is ~1.04/sqrt(256) ≈ 6.5%; allow 3 sigma
    assert(math.abs(est - n) / n < 0.20, s"estimate $est for true $n")
  }

  test("segmented sketch artifacts: base + append ≡ full rebuild") {
    val tmp = java.nio.file.Files.createTempDirectory("sketchseg").toString
    val base = termsOf(500, "s").groupBy("term").agg(count(lit(1)).as("c"))
    val delta = termsOf(200, "t").union(termsOf(100, "s"))
      .groupBy("term").agg(count(lit(1)).as("c"))
    val full = termsOf(500, "s").union(termsOf(200, "t")).union(termsOf(100, "s"))
      .groupBy("term").agg(count(lit(1)).as("c"))

    Sketches.ensureCmsSegmented(spark, sf0001, base, "term", "c",
      variant = "specseg", width = 64, artifactRootOverride = Some(tmp))
    Sketches.appendCmsSegment(spark, sf0001, delta, "term", "c",
      variant = "specseg", width = 64, artifactRootOverride = Some(tmp))
    val merged = Sketches.ensureCmsSegmented(spark, sf0001, base, "term", "c",
      variant = "specseg", width = 64, artifactRootOverride = Some(tmp))
      .orderBy("j", "bucket").collect().toSeq
    val direct = Sketches.cmsCells(full, "term", "c", 64)
      .orderBy("j", "bucket").collect().toSeq
    assert(merged === direct)

    Sketches.ensureHllSegmented(spark, sf0001, termsOf(500, "s"), "term",
      variant = "specseg", artifactRootOverride = Some(tmp))
    Sketches.appendHllSegment(spark, sf0001, termsOf(200, "t"), "term",
      variant = "specseg", artifactRootOverride = Some(tmp))
    val hm = Sketches.ensureHllSegmented(spark, sf0001, termsOf(500, "s"), "term",
      variant = "specseg", artifactRootOverride = Some(tmp))
      .orderBy("bucket").collect().toSeq
    val hd = Sketches.hllRegisters(termsOf(500, "s").union(termsOf(200, "t")), "term")
      .orderBy("bucket").collect().toSeq
    assert(hm === hd)
  }
}
