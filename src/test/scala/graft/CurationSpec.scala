package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Curation

/** Curation primitives: split determinism/partitioning and quota
  * semantics. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("withSplit: total partition, deterministic, seed changes membership") {
    val df = (1L to 1000L).toDF("id")
    val cuts = Seq(("train", 90), ("val", 95), ("test", 100))
    val split = Curation.withSplit(df, "id", cuts)
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 1000L)               // total partition, no nulls
    assert(counts("train") > counts("val"))           // roughly proportional
    // determinism: identical across runs
    val again = Curation.withSplit(df, "id", cuts).collect().map(_.toString).sorted
    assert(split.collect().map(_.toString).sorted === again)
    // a different seed moves some ids
    val seeded = Curation.withSplit(df, "id", cuts, Curation.splitBucket(_, seed = 7L))
    val moved = split.as("a").join(seeded.as("b"), "id")
      .filter(col("a.split") =!= col("b.split")).count()
    assert(moved > 0)
  }

  test("md5Bucket matches a driver-side reference") {
    val got = Seq(1L, 42L, 999L).toDF("id")
      .select(Curation.md5Bucket(col("id")).as("b")).collect().map(_.getLong(0))
    val exp = Seq(1L, 42L, 999L).map { id =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16) % 100
    }
    assert(got.toSeq === exp)
  }

  test("quotaPerGroup: at most n per group, top by ordering, deterministic ties") {
    val df = Seq(
      ("en", 1L, 50), ("en", 2L, 70), ("en", 3L, 70), ("en", 4L, 10),
      ("de", 5L, 30), ("de", 6L, 20)
    ).toDF("lang", "id", "len")
    val kept = Curation.quotaPerGroup(df, Seq("lang"), n = 2,
        col("len").desc, col("id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // en: the two len-70 docs win (id tiebreak keeps both, drops 50/10)
    assert(kept === Set(("en", 2L), ("en", 3L), ("de", 5L), ("de", 6L)))
  }

  test("sampleByStratum: per-stratum rates, nested as rates grow, edge rates") {
    val df = (1L to 2000L).map(i => (if (i % 2 == 0) "web" else "books", i))
      .toDF("source", "id")
    def keptAt(webRate: Int) = Curation.sampleByStratum(
        df, "source", "id", rates = Map("web" -> webRate), defaultRate = 100)
      .filter(col("source") === "web").collect().map(_.getLong(1)).toSet

    val at10 = keptAt(10); val at30 = keptAt(30)
    assert(at10.nonEmpty && at10.size < 1000)
    assert(at10.subsetOf(at30), "raising a rate must only ADD rows, never resample")
    assert(keptAt(0).isEmpty && keptAt(100).size === 1000)
    // untouched stratum keeps everything under defaultRate = 100
    val books = Curation.sampleByStratum(df, "source", "id", Map("web" -> 10))
      .filter(col("source") === "books").count()
    assert(books === 1000L)
  }

  test("packByTokenBudget: shard-local offsets, chunk = start / budget") {
    val df = Seq(
      (0L, 0L, 300L), (1L, 0L, 300L), (2L, 0L, 300L), (3L, 0L, 100L),
      (10L, 1L, 600L), (11L, 1L, 50L),
    ).toDF("id", "shard", "n")
    val got = Curation.packByTokenBudget(df, "shard", "id", "n", budget = 512)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("start_offset"), r.getAs[Long]("chunk")))
    assert(got.toSeq === Seq(
      (0L, 0L, 0L), (1L, 300L, 0L), (2L, 600L, 1L), (3L, 900L, 1L),
      (10L, 0L, 0L), (11L, 600L, 1L))) // shard 1 restarts at offset 0
  }

  test("domain blocklist: case- and port-insensitive host match, anti-join drops blocked") {
    val docs = Seq(
      (1L, "https://ok.org/a"),
      (2L, "https://spam.test/x?q=1"),
      (3L, "http://spam.test:8080/y"),   // explicit port must not evade
      (4L, "HTTPS://SPAM.TEST/z"),       // RFC 3986: scheme+host case-insensitive
      (5L, "https://ok.org/b#frag"),
    ).toDF("id", "url")
    val block = Seq("Spam.Test").toDF("domain") // blocklist casing ignored too
    val kept = Curation.filterBlockedDomains(docs, "url", block)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 5L))
    assert(Curation.filterBlockedDomains(docs, "url", block).columns.toSeq
      === Seq("id", "url")) // helper column dropped
  }

  test("sampleToMixture: binding stratum keeps all, others hit exact ratios") {
    // ids 0..99 per source with an identity bucket → rates ARE counts
    val docs = for (s <- Seq("web", "code", "books"); i <- 0L until 100L)
      yield (s, i)
    val df = docs.toDF("source", "id")
    val out = Curation.sampleToMixture(df, "source", "id",
        parts = Map("web" -> 5L, "code" -> 3L, "books" -> 2L),
        bucket = id => pmod(id, lit(100L)))
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // equal counts → "web" binds (smallest n/w): rates 100/60/40 exactly
    assert(out === Map("web" -> 100L, "code" -> 60L, "books" -> 40L))
  }

  test("sampleToMixture: uneven counts bind on smallest n/w; unlisted dropped") {
    val docs = (0L until 10L).map(i => ("small", i)) ++
      (0L until 100L).map(i => ("big", i)) ++
      (0L until 50L).map(i => ("unlisted", i))
    val df = docs.toDF("source", "id")
    val out = Curation.sampleToMixture(df, "source", "id",
        parts = Map("small" -> 1L, "big" -> 1L),
        bucket = id => pmod(id, lit(100L)))
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 1:1 target, "small" binds with 10 docs → "big" down-samples to 10
    assert(out === Map("small" -> 10L, "big" -> 10L))
  }

  test("canonicalUrl: case/www/tracking/fragment/slash variants collapse; idempotent") {
    val cases = Seq(
      "https://example.org/p/1" -> "https://example.org/p/1",
      "HTTPS://EXAMPLE.ORG/p/1" -> "https://example.org/p/1",
      "https://www.example.org/p/1" -> "https://example.org/p/1",
      "https://example.org/p/1?utm_source=x&utm_campaign=y" -> "https://example.org/p/1",
      "https://example.org/p/1/#frag" -> "https://example.org/p/1",
      // tracking param FIRST: the orphaned '&' is promoted back to '?'
      "https://example.org/p?utm_source=x&real=1" -> "https://example.org/p?real=1",
      // path case preserved; non-tracking query preserved
      "http://a.org/CaseSensitive?q=1&ref=spam" -> "http://a.org/CaseSensitive?q=1",
      // '&' is a legal PATH character — never promoted into a query
      "https://example.org/a&b" -> "https://example.org/a&b",
      "https://e.org/a&b?x=1" -> "https://e.org/a&b?x=1",
      // slash-trim touches the path only, never a query value
      "https://e.org/p/?next=/home/" -> "https://e.org/p?next=/home/",
      "https://example.org//" -> "https://example.org",
      "https://example.org/" -> "https://example.org")
    val df = cases.map(_._1).toDF("url")
      .select(col("url"), Curation.canonicalUrl(col("url")).as("c"))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    for ((in, want) <- cases) assert(got(in) === want, s"for $in")
    // idempotence: canonical of canonical is itself
    val twice = df.select(col("c"), Curation.canonicalUrl(col("c")).as("cc"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    twice.foreach { case (c, cc) => assert(c === cc) }
  }

  test("writeShards: partitioned dirs, exact membership, stored order = " +
      "ord order, rewrite reproduces it, appends never reorder") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 200)
    val out1 = java.nio.file.Files.createTempDirectory("shards1").toString
    Curation.writeShards(docs, "doc_id", out1, numShards = 4,
      ordFn = Curation.md5Ord)

    val dirs = new java.io.File(out1).listFiles().filter(_.isDirectory)
      .map(_.getName).sorted
    assert(dirs.toSeq === Seq("shard=0", "shard=1", "shard=2", "shard=3"))

    val back = spark.read.parquet(out1)
    assert(back.count() === docs.count())
    assert(back.select("doc_id").distinct().count() === docs.count())
    // every row sits in ITS shard, and file order == the plan's ord order
    val plan = Curation.shardForExport(docs, "doc_id", 4, Curation.md5Ord)
    (0 until 4).foreach { k =>
      val expect = plan.filter(col("shard") === k)
        .orderBy(col("__ord"), col("doc_id"))
        .select("doc_id").as[Long].collect().toSeq
      val stored = spark.read.parquet(s"$out1/shard=$k")
        .select("doc_id").as[Long].collect().toSeq // single file: read order = write order
      assert(stored === expect, s"shard $k order")
    }
    // reproducibility: a second materialization is identical per shard
    val out2 = java.nio.file.Files.createTempDirectory("shards2").toString
    Curation.writeShards(docs, "doc_id", out2, numShards = 4,
      ordFn = Curation.md5Ord)
    (0 until 4).foreach { k =>
      val a = spark.read.parquet(s"$out1/shard=$k").select("doc_id").as[Long].collect().toSeq
      val b = spark.read.parquet(s"$out2/shard=$k").select("doc_id").as[Long].collect().toSeq
      assert(a === b)
    }
    // append-stability: growing the corpus only INSERTS into each
    // shard's sequence — the old docs' relative order is untouched
    val grown = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 300)
    val planG = Curation.shardForExport(grown, "doc_id", 4, Curation.md5Ord)
    (0 until 4).foreach { k =>
      val oldSeq = plan.filter(col("shard") === k)
        .orderBy(col("__ord"), col("doc_id")).select("doc_id").as[Long].collect().toSeq
      val newSeq = planG.filter(col("shard") === k)
        .orderBy(col("__ord"), col("doc_id")).select("doc_id").as[Long].collect().toSeq
        .filter(_ < 200)
      assert(newSeq === oldSeq, s"shard $k append stability")
    }
  }
}
