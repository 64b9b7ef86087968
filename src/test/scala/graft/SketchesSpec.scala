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

    // empty register frame (empty corpus/segment): the defined
    // all-registers-absent numerator 256·2^53, never a NULL-poisoned sum
    val emptyRow = Sketches.hllEstimate(
      Sketches.hllRegisters(once.filter(lit(false)), "term")).collect()(0)
    assert(emptyRow.getLong(0) === 256L * (1L << 53))
    assert(!emptyRow.isNullAt(1))
  }

  test("bloom filter: zero false negatives, OR-merge law, bounded FP rate") {
    val n = 2000
    val in = termsOf(n, "member")
    val words = Sketches.bloomWords(in, "term", bits = 65536)
    // every member hits — the structural no-false-negative contract
    val memberHits = Sketches.bloomProbe(words, in, "term", 65536)
      .filter(!col("hit")).count()
    assert(memberHits === 0L)
    // strangers: FP rate at k=4, n=2000, m=65536 is (1-e^(-kn/m))^4 ≈ 1.2e-4
    val strangers = termsOf(2000, "stranger")
    val fp = Sketches.bloomProbe(words, strangers, "term", 65536)
      .filter(col("hit")).count()
    assert(fp <= 5L, s"$fp false positives out of 2000")
    // merge law: words(A ∪ B) == or-merge(words(A), words(B))
    val a = termsOf(700, "member")
    val b = spark.range(700, n).select(concat(lit("member"), col("id")).as("term"))
    val merged = Sketches.mergeBloom(
      Sketches.bloomWords(a, "term", 65536)
        .union(Sketches.bloomWords(b, "term", 65536)))
      .orderBy("word").collect().toSeq
    assert(merged === words.orderBy("word").collect().toSeq)
  }

  test("streaming micro-batches maintain both sketches via foreachBatch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = java.nio.file.Files.createTempDirectory("sketchstream").toString
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 150)
      .as[(Long, String)].collect()
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("sketchstream-ck").toString
    def terms(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(split(col("text"), " ")).as("term"))
        .filter(col("term") =!= "")
    def tcOf(df: org.apache.spark.sql.DataFrame) =
      terms(df).groupBy("term").agg(count(lit(1)).as("c"))
    val query = input.toDF().toDF("doc_id", "text")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        // each batch contributes ONE O(batch) segment per sketch; the
        // corpus is never re-scanned — the merge happens at read
        val cmsDir = new java.io.File(
          s"$root/${Sketches.cmsKey(sf0001, "stream", 64)}")
        if (!cmsDir.exists()) {
          Sketches.ensureCmsSegmented(spark, sf0001, tcOf(df), "term", "c",
            variant = "stream", width = 64, artifactRootOverride = Some(root))
          Sketches.ensureHllSegmented(spark, sf0001, terms(df), "term",
            variant = "stream", artifactRootOverride = Some(root))
        } else {
          Sketches.appendCmsSegment(spark, sf0001, tcOf(df), "term", "c",
            variant = "stream", width = 64, artifactRootOverride = Some(root))
          Sketches.appendHllSegment(spark, sf0001, terms(df), "term",
            variant = "stream", artifactRootOverride = Some(root))
        }
        ()
      }.start()
    try {
      input.addData(docs.take(50).toSeq); query.processAllAvailable()
      input.addData(docs.slice(50, 100).toSeq); query.processAllAvailable()
      input.addData(docs.drop(100).toSeq); query.processAllAvailable()
    } finally query.stop()

    val allDocs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 150)
    val streamedCms = Sketches.ensureCmsSegmented(spark, sf0001,
        tcOf(allDocs.limit(0)), "term", "c", variant = "stream", width = 64,
        artifactRootOverride = Some(root))
      .orderBy("j", "bucket").collect().toSeq
    val directCms = Sketches.cmsCells(tcOf(allDocs), "term", "c", 64)
      .orderBy("j", "bucket").collect().toSeq
    assert(streamedCms === directCms)
    val streamedHll = Sketches.ensureHllSegmented(spark, sf0001,
        terms(allDocs).limit(0), "term", variant = "stream",
        artifactRootOverride = Some(root))
      .orderBy("bucket").collect().toSeq
    val directHll = Sketches.hllRegisters(terms(allDocs), "term")
      .orderBy("bucket").collect().toSeq
    assert(streamedHll === directHll)
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
