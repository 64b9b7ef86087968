package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, RangeJoin, SkewJoin}

/** Seeded randomized equivalence: the binned/bucketed/salted operator
  * forms must agree with their brute-force or plain twins on arbitrary
  * inputs — boundary collisions, duplicate timestamps, inverted and
  * zero-length intervals, keys missing from either side, and bin/bucket
  * sizes that do not divide the data's spans. Fixed seeds keep failures
  * reproducible. */
class TemporalJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  test("asOf and asOfBucketed match the brute-force argmax on random inputs") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val nKeys = 5
      // right side deduped per (key, ts): the operator's determinism
      // contract (an order-dependent winner is out of scope by design)
      val right = (1 to 120).map { i =>
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(200).toLong, i.toLong)
      }.groupBy(t => (t._1, t._2)).map(_._2.head).toSeq
      val left = (1 to 150).map { i =>
        (rnd.nextInt(nKeys + 1).toLong, rnd.nextInt(220).toLong, i.toLong)
      }
      val l = left.toDF("k", "t", "lid")
      val r = right.toDF("k", "rt", "rid")
      val strict = seed % 2 == 0
      // brute force: per left row, the max-(rt, rid) right row at-or-before
      val rightBy = right.groupBy(_._1)
      val expected = left.map { case (k, t, lid) =>
        val cands = rightBy.getOrElse(k, Seq.empty)
          .filter(c => if (strict) c._2 < t else c._2 <= t)
        lid -> (if (cands.isEmpty) None
                else Some(cands.maxBy(c => (c._2, c._3))._3))
      }.toMap
      def got(df: org.apache.spark.sql.DataFrame) = df
        .select(col("lid"), col("asof_rid"))
        .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
        .toMap
      val plain = got(AsOfJoin.asOf(l, r, Seq("k"), "t", "rt", strict = strict))
      assert(plain === expected, s"asOf vs brute force, seed=$seed strict=$strict")
      for (bucket <- Seq(1L, 7L, 64L, 1000L)) {
        val bucketed = got(AsOfJoin.asOfBucketed(l, r, Seq("k"), "t", "rt",
          bucketSize = bucket, strict = strict))
        assert(bucketed === expected, s"asOfBucketed seed=$seed bucket=$bucket")
      }
    }
  }

  test("pointInInterval matches the brute-force inequality join on random inputs") {
    for (seed <- 4 to 6) {
      val rnd = new scala.util.Random(seed)
      val points = (1 to 120).map { i =>
        (rnd.nextInt(4).toLong, i.toLong, rnd.nextInt(300).toLong)
      }
      // random spans: some inverted, some zero-length, some far-future
      val ivs = (1 to 40).map { i =>
        val s = rnd.nextInt(300).toLong
        val e = rnd.nextInt(4) match {
          case 0 => s - rnd.nextInt(50)          // inverted → dead
          case 1 => s                            // zero-length → dead
          case 2 => s + rnd.nextInt(60) + 1
          case _ => 99999999999L                 // open-ended
        }
        (rnd.nextInt(4).toLong, 1000L + i, s, e)
      }
      val expected = (for {
        (pk, pid, t) <- points
        (ik, iid, s, e) <- ivs
        if pk == ik && t >= s && t < e
      } yield (pid, iid)).sorted
      for (bin <- Seq(1L, 13L, 100L)) {
        val got = RangeJoin.pointInInterval(
            points.toDF("k", "pid", "t"), ivs.toDF("k", "iid", "s", "e"),
            Seq("k"), "t", "s", "e", binSize = bin)
          .select("pid", "iid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        assert(got === expected, s"seed=$seed bin=$bin")
      }
    }
  }

  test("intervalOverlap matches the brute-force inequality join on random inputs") {
    for (seed <- 7 to 9) {
      val rnd = new scala.util.Random(seed)
      def spans(n: Int, idBase: Long) = (1 to n).map { i =>
        val s = rnd.nextInt(250).toLong
        val e = if (rnd.nextInt(5) == 0) 99999999999L
                else s + rnd.nextInt(80) - 10 // some inverted/zero
        (rnd.nextInt(3).toLong, idBase + i, s, e)
      }
      val ls = spans(35, 0L)
      val rs = spans(35, 500L)
      val expected = (for {
        (lk, lid, lsx, lex) <- ls
        (rk, rid, rsx, rex) <- rs
        if lk == rk && lsx < rex && rsx < lex && lex > lsx && rex > rsx
      } yield (lid, rid)).sorted
      for (bin <- Seq(1L, 17L, 90L)) {
        val got = RangeJoin.intervalOverlap(
            ls.toDF("k", "lid", "ls", "le"), rs.toDF("k", "rid", "rs", "re"),
            Seq("k"), "ls", "le", "rs", "re", binSize = bin)
          .select("lid", "rid").collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        assert(got === expected, s"seed=$seed bin=$bin")
      }
    }
  }

  test("saltedJoin matches the plain join on random inputs") {
    for (seed <- 10 to 11) {
      val rnd = new scala.util.Random(seed)
      val probe = (1 to 200).map { i =>
        (rnd.nextInt(6).toLong, i.toLong)
      }.toDF("k", "pid")
      val build = (1 to 20).map { i =>
        (rnd.nextInt(8).toLong, s"t$i")
      }.groupBy(_._1).map(_._2.head).toSeq.toDF("k", "tag") // unique keys
      val plain = probe.join(build, Seq("k"))
        .collect().map(_.toSeq).sortBy(_.toString)
      for (salt <- Seq(2, 5)) {
        val salted = SkewJoin.saltedJoin(probe, build, Seq("k"),
            saltBy = col("pid") * 31 + lit(seed), salt = salt)
          .collect().map(_.toSeq).sortBy(_.toString)
        assert(salted === plain, s"seed=$seed salt=$salt")
      }
    }
  }
}
