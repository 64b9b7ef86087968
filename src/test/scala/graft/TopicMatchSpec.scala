package graft

import org.apache.spark.sql.functions._

import graft.functions.TopicMatch

/** Property-style tests pinning the topics matcher to the reference
  * semantics: `DoesItMatch` (`/root/reference/app/db/query.go:473-485`) —
  * for each pinned (k, v): `len(topics) > k && topics[k] == v` — and the
  * pub/sub wildcard matcher (`app/pubsub/subscription.go:74-124`).
  *
  * Every topics array over a 4-value alphabet up to length 4 (341 arrays)
  * is evaluated in ONE DataFrame batch per sampled predicate, against a
  * driver-side re-implementation of the reference semantics. Seeded
  * sampling keeps the run deterministic. */
class TopicMatchSpec extends SparkSpec {
  import spark.implicits._

  private def doesItMatch(pins: Map[Int, String], topics: Seq[String]): Boolean =
    pins.forall { case (k, v) => topics.length > k && topics(k) == v }

  private def wildcardMatch(patterns: Seq[String], topics: Seq[String]): Boolean =
    patterns.zipWithIndex.forall { case (p, k) =>
      p == "*" || p.isEmpty || (topics.length > k && topics(k).equalsIgnoreCase(p))
    }

  private val alphabet = Seq("0xaa", "0xbb", "0xcc", "0xdd")

  /** All arrays over the alphabet with length 0..4 — 341 of them. */
  private val allTopics: Seq[Seq[String]] =
    (0 to 4).flatMap(n =>
      Seq.fill(n)(alphabet).foldLeft(Seq(Seq.empty[String])) { (acc, vals) =>
        acc.flatMap(prefix => vals.map(prefix :+ _))
      })

  private lazy val topicsDF = allTopics.map(Tuple1(_)).toDF("topics").cache()

  private def checkAgainstReference(pred: org.apache.spark.sql.Column,
      ref: Seq[String] => Boolean, label: String): Unit = {
    val got = topicsDF.select(col("topics"), pred.as("m")).collect()
    got.foreach { r =>
      val topics = r.getSeq[String](0)
      assert(r.getBoolean(1) === ref(topics), s"$label mismatch on topics=$topics")
    }
  }

  test("topicsMatch ≡ reference DoesItMatch over sampled pins × all arrays") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 25) {
      val pins = (0 to 3).filter(_ => rng.nextBoolean())
        .map(k => k -> alphabet(rng.nextInt(alphabet.size))).toMap
      checkAgainstReference(TopicMatch.topicsMatch(pins),
        doesItMatch(pins, _), s"pins=$pins")
      checkAgainstReference(TopicMatch.topicsMatchTwoPhase(pins),
        doesItMatch(pins, _), s"twoPhase pins=$pins")
    }
  }

  test("topicsMatchWildcard ≡ reference wildcard semantics incl. case-insensitivity") {
    val patternVals = Seq("*", "", "0xaa", "0xBB", "0xcc")
    val rng = new scala.util.Random(43)
    for (_ <- 1 to 25) {
      val patterns = Seq.fill(4)(patternVals(rng.nextInt(patternVals.size)))
      checkAgainstReference(TopicMatch.topicsMatchWildcard(patterns),
        wildcardMatch(patterns, _), s"patterns=$patterns")
    }
  }

  test("empty pin map matches everything (no topics filter requested)") {
    checkAgainstReference(TopicMatch.topicsMatch(Map.empty), _ => true, "empty pins")
  }

  test("short arrays never match a pinned position (query.go:474-476)") {
    checkAgainstReference(TopicMatch.topicsMatch(Map(3 -> "0xaa")),
      t => t.length > 3 && t(3) == "0xaa", "pin at 3")
    // but wildcard patterns DO match short arrays (subscription.go:84-86)
    checkAgainstReference(TopicMatch.topicsMatchWildcard(Seq("*", "*", "*", "*")),
      _ => true, "all-wildcard")
  }

  test("prefix form pads with empties ≡ pinning only the non-empty prefix") {
    checkAgainstReference(TopicMatch.topicsMatchPrefix(Seq("0xaa")),
      t => t.nonEmpty && t.head == "0xaa", "prefix")
    checkAgainstReference(TopicMatch.topicsMatchPrefix(Seq("0xaa", "0xbb")),
      t => t.length > 1 && t.head == "0xaa" && t(1) == "0xbb", "prefix2")
  }
}
