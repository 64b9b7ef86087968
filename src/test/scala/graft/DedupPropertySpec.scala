package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Seeded randomized contract for exact substring dedup: the
  * election/island/cut composition must agree with a driver-side
  * brute-force twin on random corpora over a TINY alphabet (which
  * forces heavy window collisions: multi-site fingerprints, within-doc
  * repeats, overlapping and touching removable windows, whole-doc
  * wipeouts). Fixed seeds keep failures reproducible. */
class DedupPropertySpec extends SparkSpec {
  import spark.implicits._

  private val W = 4 // small window so short random docs still collide

  /** Driver-side twin: windows → winner per content → removable sites →
    * interval merge → spans and cut text, all in plain Scala. */
  private def bruteForce(docs: Seq[(Long, String)])
      : (Seq[(Long, Long, Long)], Map[Long, String]) = {
    val sites = for {
      (id, text) <- docs
      toks = text.split(" ", -1)
      if toks.length >= W
      s <- 1 to (toks.length - W + 1)
    } yield (toks.slice(s - 1, s - 1 + W).mkString(" "), id, s.toLong)
    val byContent = sites.groupBy(_._1)
    val removable = byContent.values.filter(_.size >= 2).flatMap { xs =>
      val winner = xs.map(x => (x._2, x._3)).min
      xs.map(x => (x._2, x._3)).filterNot(_ == winner)
    }.toSeq
    val spans = removable.groupBy(_._1).toSeq.flatMap { case (id, ss) =>
      val ivs = ss.map(s => (s._2, s._2 + W - 1)).sortBy(x => x)
      val merged = ivs.foldLeft(List.empty[(Long, Long)]) {
        case (acc, (s, e)) => acc match {
          case (ps, pe) :: rest if s <= pe + 1 => (ps, math.max(pe, e)) :: rest
          case _ => (s, e) :: acc
        }
      }.reverse
      merged.map { case (s, e) => (id, s, e) }
    }
    val spansByDoc = spans.groupBy(_._1)
    val clean = docs.map { case (id, text) =>
      val toks = text.split(" ", -1)
      val cover = spansByDoc.getOrElse(id, Seq.empty)
      id -> toks.zipWithIndex.collect {
        case (t, i) if !cover.exists(sp => i + 1 >= sp._2 && i + 1 <= sp._3) => t
      }.mkString(" ")
    }.toMap
    (spans.sortBy(x => (x._1, x._2)), clean)
  }

  test("substringDupSpans + substringDedup ≡ brute force on random corpora") {
    val alphabet = Seq("a", "b", "c")
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val docs = (1L to 25L).map { id =>
        val n = 2 + rnd.nextInt(14)
        id -> (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString(" ")
      }
      val df = docs.toDF("doc_id", "text")
      val (expSpans, expClean) = bruteForce(docs)

      val gotSpans = Dedup.substringDupSpans(df, "doc_id", "text", window = W)
        .orderBy("__id", "span_start").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(gotSpans === expSpans, s"seed=$seed spans")

      val gotClean = Dedup.substringDedup(df, "doc_id", "text", window = W)
        .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
      assert(gotClean === expClean, s"seed=$seed clean text")
    }
  }
}
