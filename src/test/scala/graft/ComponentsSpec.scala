package graft

import graft.pipeline.Components

/** Cluster resolution over near-dup pairs: the distributed min-label +
  * pointer-doubling components against an in-test union-find reference. */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Reference union-find (union by min, path compression). */
  private def expected(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- edges) {
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("path graph collapses to its minimum") {
    assert(cc(Seq((1L, 2L), (2L, 3L), (3L, 4L))) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("disjoint components keep separate representatives") {
    val got = cc(Seq((10L, 2L), (2L, 7L), (30L, 40L), (5L, 5L)))
    assert(got === Map(10L -> 2L, 2L -> 2L, 7L -> 2L, 30L -> 30L,
      40L -> 30L, 5L -> 5L))
  }

  test("64-node shuffled path converges (doubling beats O(diameter))") {
    // permutation via a unit multiplier mod 64 — worst-case chain shape
    val perm = (0 until 64).map(i => ((i * 37) % 64).toLong)
    val edges = perm.sliding(2).map(p => (p(0), p(1))).toSeq
    val got = cc(edges)
    assert(got.size === 64 && got.values.forall(_ == 0L))
  }

  test("pseudo-random graph matches union-find") {
    // deterministic LCG edge stream, no RNG state in the suite
    val edges = (1 to 120).map { i =>
      val a = (i * 6364136223846793005L + 1442695040888963407L) % 97
      val b = (a * 2862933555777941757L + 3037000493L) % 97
      (math.abs(a), math.abs(b))
    }
    assert(cc(edges) === expected(edges))
  }

  test("empty edge list yields an empty result") {
    assert(cc(Seq.empty).isEmpty)
  }

  test("non-integral edge ids are rejected, not silently nulled") {
    val strEdges = Seq(("a", "b")).toDF("a_id", "b_id")
    val e = intercept[IllegalArgumentException] {
      Components.connectedComponents(strEdges)
    }
    assert(e.getMessage.contains("integral id type"))
  }

  test("reliable checkpoint dir: same labels, rounds commit to the dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt-")
    val edges = Seq((1L, 2L), (2L, 3L), (30L, 40L)).toDF("a_id", "b_id")
    val got = Components.connectedComponents(edges,
        checkpointDir = Some(dir.toString))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 30L -> 30L, 40L -> 30L))
    // the rounds actually went through the reliable dir, not local blocks
    def files(p: java.nio.file.Path): Long = {
      val s = java.nio.file.Files.walk(p)
      try s.filter(java.nio.file.Files.isRegularFile(_)).count()
      finally s.close()
    }
    assert(files(dir) > 0, "no checkpoint files were written to the dir")
  }

  test("exceeding maxIter throws instead of returning partial labels") {
    // an 8-node shuffled path needs several doubling rounds; 1 is too few
    val perm = Seq(3L, 6L, 1L, 4L, 7L, 2L, 5L, 0L)
    val edges = perm.sliding(2).map(p => (p(0), p(1))).toSeq.toDF("a_id", "b_id")
    val e = intercept[IllegalStateException] {
      Components.connectedComponents(edges, maxIter = 1)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("negative ids resolve correctly through the hash-partitioned loop") {
    // the r16 RDD loop keys rounds on a HashPartitioner; negative node
    // ids must land in valid partitions (nonNegativeMod) and still
    // resolve to the component minimum
    val edges = Seq((-5L, 2L), (2L, -9L), (7L, -5L))
    assert(cc(edges) === Map(-5L -> -9L, 2L -> -9L, -9L -> -9L, 7L -> -9L))
  }

  test("resolve runs a bounded number of jobs (one per round, not per exchange)") {
    // the r16 optimization claim: each round of the loop is ONE Spark job
    // (shared partitioner, narrow lookups), not one job per AQE exchange.
    // A 16-node shuffled path converges in ≤ 5 doubling rounds; with
    // setup (edge ingest, adjacency, init) + one aggregate per round the
    // whole resolve must stay well under the ~50 jobs the DataFrame loop
    // used to launch. Generous bound: 20.
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val perm = (0 until 16).map(i => ((i * 11) % 16).toLong)
      val edges = perm.sliding(2).map(p => (p(0), p(1))).toSeq
      val got = cc(edges)
      assert(got.size === 16 && got.values.forall(_ == 0L))
      assert(jobs.get <= 20,
        s"components resolve launched ${jobs.get} jobs — the one-job-per-round loop regressed")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("dedupByPairs keeps one representative per cluster, singletons pass") {
    val corpus = (1L to 10L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a_id", "b_id")
    val kept = Components.dedupByPairs(corpus, pairs, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept === Array(1L, 4L, 5L, 7L, 8L, 9L, 10L))
  }
}
