package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Sketches

/** Seeded randomized contracts for the sketch family, against
  * driver-side brute-force twins: CMS never under-estimates and merges
  * by sum, HLL registers are exactly the per-bucket max of the hash
  * ranks and merge by max, Bloom never false-negatives and merges by
  * OR — on arbitrary multisets with duplicates, skew, and arbitrary
  * split points. Fixed seeds keep failures reproducible. */
class SketchesPropertySpec extends SparkSpec {
  import spark.implicits._

  private def randomCounts(seed: Int, nTerms: Int, maxC: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to nTerms).map(i => (s"term-$seed-$i-${rnd.nextInt(1000)}",
      (rnd.nextInt(maxC) + 1).toLong))
      .groupBy(_._1).map { case (t, xs) => (t, xs.map(_._2).sum) }.toSeq
  }

  test("CMS: estimate >= exact always; arbitrary split merges = one-shot") {
    for (seed <- 1 to 3; width <- Seq(16, 64)) {
      val counts = randomCounts(seed, nTerms = 200, maxC = 50)
      val tc = counts.toDF("term", "c")
      val cells = Sketches.cmsCells(tc, "term", "c", width)
      val est = Sketches.cmsEstimate(cells, tc.select("term"), "term", width)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = counts.toMap
      exact.foreach { case (t, c) =>
        assert(est(t) >= c, s"seed=$seed width=$width term=$t under-estimated")
      }
      // split at a random point; cell-wise-sum merge must equal one-shot
      val rnd = new scala.util.Random(seed * 31)
      val (a, b) = counts.partition(_ => rnd.nextBoolean())
      def cellsOf(xs: Seq[(String, Long)]) =
        if (xs.isEmpty) Sketches.cmsCells(tc.limit(0), "term", "c", width)
        else Sketches.cmsCells(xs.toDF("term", "c"), "term", "c", width)
      val merged = Sketches.mergeCms(cellsOf(a).union(cellsOf(b)))
        .orderBy("j", "bucket").collect().toSeq
      assert(merged === cells.orderBy("j", "bucket").collect().toSeq,
        s"seed=$seed width=$width merge law")
    }
  }

  test("HLL: registers equal the brute-force per-bucket max rank; merge by max") {
    for (seed <- 1 to 3) {
      val terms = randomCounts(seed, nTerms = 300, maxC = 3)
        .flatMap { case (t, c) => Seq.fill(c.toInt)(t) } // with duplicates
      val df = terms.toDF("term")
      val got = Sketches.hllRegisters(df, "term")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // driver-side brute force over the same sha-derived 60-bit hash
      val expected = terms.distinct.map { t =>
        val hex = java.security.MessageDigest.getInstance("SHA-256")
          .digest(t.getBytes("UTF-8")).take(8)
          .map(b => f"$b%02x").mkString.take(15)
        val h = java.lang.Long.parseLong(hex, 16)
        val bucket = h >>> 52
        val r = h & ((1L << 52) - 1)
        val rho = if (r == 0) 53L else 53L - (64 - java.lang.Long.numberOfLeadingZeros(r))
        bucket -> rho
      }.groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).max }
      assert(got === expected, s"seed=$seed registers")
      // merge law on an arbitrary split
      val rnd = new scala.util.Random(seed * 17)
      val (a, b) = terms.partition(_ => rnd.nextBoolean())
      def regsOf(xs: Seq[String]) =
        if (xs.isEmpty) Sketches.hllRegisters(df.limit(0), "term")
        else Sketches.hllRegisters(xs.toDF("term"), "term")
      val merged = Sketches.mergeHll(regsOf(a).union(regsOf(b)))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(merged === got, s"seed=$seed merge law")
    }
  }

  test("Bloom: no false negative ever, under any split-merge") {
    for (seed <- 1 to 3) {
      val members = randomCounts(seed, nTerms = 400, maxC = 1).map(_._1)
      val rnd = new scala.util.Random(seed * 7)
      val (a, b) = members.partition(_ => rnd.nextBoolean())
      def wordsOf(xs: Seq[String]) =
        if (xs.isEmpty) Sketches.bloomWords(members.toDF("term").limit(0), "term", 4096)
        else Sketches.bloomWords(xs.toDF("term"), "term", 4096)
      val merged = Sketches.mergeBloom(wordsOf(a).union(wordsOf(b)))
      val misses = Sketches.bloomProbe(merged, members.toDF("term"), "term", 4096)
        .filter(!col("hit")).count()
      assert(misses === 0L, s"seed=$seed false negatives after merge")
    }
  }
}
