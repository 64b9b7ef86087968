package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join — the standard mitigation for HOT-KEY skew in a
  * shuffle join that cannot broadcast (both sides large). A plain
  * equi-join hashes each key to one reducer, so one hot key (the
  * zero-address, a celebrity account, an empty-string default) turns
  * into one straggler task holding the key's entire pairing work. AQE's
  * skew-join split handles sort-merge joins after the fact; salting is
  * the PLANNED form, and the only option when the skew is in the
  * JOIN KEY's build side replication itself.
  *
  * Shape: the probe (large, skewed) side tags each row with a
  * deterministic salt in `[0, salt)` derived from a caller-chosen
  * per-row expression; the build side replicates each row `salt` times
  * (explode of a literal range — build rows are the small-ish side of
  * the pair work, so ×salt is bounded). The join becomes an equi-join
  * on (keys, salt): a hot key's probe rows spread across `salt`
  * reducers, each holding a full copy of that key's build rows. The
  * result is EXACTLY the plain join's multiset for any salt expression
  * (even a constant — salting only redistributes), which is what the
  * cross-engine oracle pins.
  *
  * At 100 TB: pick `salt` ≈ the hot key's row count over the target
  * per-task row count; `saltBy` should spread the hot key's rows (a
  * per-row id or hash), not correlate with the key.
  */
object SkewJoin {

  /** Inner equi-join of `probe` to `build` on `keys`, salted `salt`
    * ways. `saltBy` is any per-row numeric expression on the probe side
    * (a row id, a hash); its distribution controls how evenly a hot
    * key spreads. A null `saltBy` value falls to salt 0 (the row must
    * still join — a null salt in the equi-join would silently drop it).
    * Non-key column names must be disjoint. */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
      saltBy: Column, salt: Int): DataFrame = {
    require(keys.nonEmpty, "salted join requires at least one equality key")
    require(salt > 0, "salt must be positive")
    val overlap = (probe.columns.toSet -- keys)
      .intersect(build.columns.toSet -- keys)
    require(overlap.isEmpty, s"non-key columns collide: $overlap")
    val p = probe.withColumn("__salt",
      coalesce(pmod(saltBy.cast("long"), lit(salt.toLong)), lit(0L)))
    val b = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    p.join(b, keys :+ "__salt").drop("__salt")
  }
}
