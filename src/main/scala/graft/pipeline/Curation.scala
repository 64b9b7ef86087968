package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Training-data curation primitives: reproducible splits and per-group
  * quotas. Everything is a deterministic function of stable ids — no
  * `rand()` — so splits are stable across runs, executors, and engines
  * (re-runnable ETL, auditable held-out sets), and cross-engine
  * hash-checkable by the oracle gate.
  *
  * Scale: both operators are one narrow projection plus (for quotas) one
  * hash-shuffle on the group key with a windowed rank — no joins, no
  * driver-side state.
  */
object Curation {

  /** Deterministic split bucket in [0, 100): `xxhash64(id, seed) mod 100`
    * — the production default (cheapest codegen'd hash). */
  def splitBucket(id: Column, seed: Long = 0L): Column =
    pmod(xxhash64(id, lit(seed)), lit(100L))

  /** Cross-engine-reproducible bucket (cf. [[Dedup.sha60]]): the first 8
    * md5 hex digits of the id's decimal string, mod 100. Any engine with
    * md5 replays it — this is the variant the oracle gate verifies. */
  def md5Bucket(id: Column): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long"), lit(100L))

  /** Tag each row with a named split: `cuts` are cumulative upper bounds,
    * e.g. `Seq(("train", 90), ("val", 95), ("test", 100))`. */
  def withSplit(df: DataFrame, idCol: String, cuts: Seq[(String, Int)],
      bucket: Column => Column = splitBucket(_), out: String = "split"): DataFrame = {
    require(cuts.nonEmpty && cuts.last._2 == 100, "cuts must end at 100")
    val b = bucket(col(idCol))
    val tag = cuts.foldRight(lit(null).cast("string"): Column) {
      case ((name, hi), rest) => when(b < hi, lit(name)).otherwise(rest)
    }
    df.withColumn(out, tag)
  }

  /** Cross-engine-reproducible 60-bit order hash: the first 15 md5 hex
    * digits of the id's decimal string (the [[Dedup.sha60]] trick on
    * md5) — the oracle-verifiable variant of [[xxOrd]]. */
  def md5Ord(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long")

  /** Production order hash: codegen'd xxhash64 of the id. */
  def xxOrd(id: Column): Column = xxhash64(id)

  /** Deterministic export plan — the "global shuffle" of training-data
    * assembly, made reproducible and resumable: every row gets a
    * pseudo-random 60-bit order key (a pure function of its id and
    * nothing else) and a shard = key mod `numShards`. Sorting each shard
    * by the key yields a stable global scramble: re-running the plan on
    * the same corpus reproduces byte-identical shard contents and order,
    * appending new documents never reorders old ones, and any shard can
    * be re-exported alone. Adds (`__ord`, `shard`). */
  def shardForExport(df: DataFrame, idCol: String, numShards: Int,
      ordFn: Column => Column = xxOrd): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    df.withColumn("__ord", ordFn(col(idCol)))
      .withColumn("shard", pmod(col("__ord"), lit(numShards.toLong)))
  }

  /** Materialize the plan: one RANGE shuffle to `numShards` write tasks
    * (range partitioning over the dense 0..N-1 shard values lands ~one
    * shard per task — hash `repartition(n, col)` routes by hash(shard)
    * mod n, which collides and leaves write slots idle), each task
    * sorting its shard(s) by the order key and writing
    * `shard=<k>/part-*.parquet` — consumers stream shards in file order
    * and see the deterministic scramble. (Pick shard counts ≥ cluster
    * parallelism, the usual export-layout rule.) */
  def writeShards(df: DataFrame, idCol: String, outDir: String,
      numShards: Int, ordFn: Column => Column = xxOrd): Unit =
    shardForExport(df, idCol, numShards, ordFn)
      .repartitionByRange(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__ord"), col(idCol))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)

  /** Per-group quota: keep the top `n` rows of each group under a
    * deterministic ordering (e.g. quality desc, id) — the
    * class-balancing / per-language capping step of corpus assembly.
    * One shuffle on the group key; rank, filter, done. */
  def quotaPerGroup(df: DataFrame, groupCols: Seq[String], n: Int,
      ordering: Column*): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= n)
      .drop("__rank")
  }

  /** Sequence packing by token budget: assign each document a chunk id
    * such that consecutive documents (by `orderCol`, within a shard)
    * accumulate into ~`budget`-token chunks — the context-window packing
    * step of training-data assembly. A document's chunk is its cumulative
    * token START offset divided by the budget, so chunk boundaries are a
    * pure function of the ordered token counts: deterministic,
    * replayable, and resumable from any shard.
    *
    * Sharding is what makes this scale: the running sum is a window per
    * `shardCol` (one shuffle, shards pack in parallel). A global pack
    * would serialize 100 TB through one partition — shard first (any
    * stable grouping: source file, id range), pack within.
    * Returns the input plus (start_offset, chunk). */
  def packByTokenBudget(df: DataFrame, shardCol: String, orderCol: String,
      nTokensCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("start_offset",
        coalesce(sum(col(nTokensCol)).over(w), lit(0L)))
      .withColumn("chunk", (col("start_offset") / budget).cast("long"))
  }

  /** Domain blocklist filter: drop rows whose URL's host appears in the
    * blocklist — the URL-level hygiene pass of web-corpus curation. The
    * blocklist rides as a broadcast anti-join (it is tiny next to the
    * corpus; no shuffle of the fact side), and the host comes from one
    * codegen'd regexp_extract. Scheme and host are case-insensitive per
    * RFC 3986 and a `:port` never changes the domain, so the URL is
    * lowercased before extraction, the pattern stops the host at `:`,
    * and both join sides compare lowercased — otherwise
    * 'HTTPS://SPAM.TEST:443/x' would waltz past a 'spam.test' block. */
  val HostPattern = "^[a-z][a-z0-9+.-]*://([^/?#:]+)"

  def urlHost(url: Column): Column = regexp_extract(lower(url), HostPattern, 1)

  def filterBlockedDomains(df: DataFrame, urlCol: String,
      blocklist: DataFrame, domainCol: String = "domain"): DataFrame =
    df.withColumn("__host", urlHost(col(urlCol)))
      .join(broadcast(blocklist.select(lower(col(domainCol)).as("__host"))),
        Seq("__host"), "left_anti")
      .drop("__host")

  /** Stratified sampling: keep each row with its stratum's rate (percent
    * in [0, 100]), decided by the row's deterministic id bucket — the
    * down-weighting step of corpus mixing (e.g. keep 10% of crawl, 100%
    * of books). Pure per-row filter: no shuffle, no rand(), stable
    * across runs/executors/engines, and a row keeps or drops
    * CONSISTENTLY as rates move (rate 20 keeps a superset of rate 10 —
    * bucket thresholds, not resampling). `rates` maps stratum value →
    * percent; strata absent from the map keep `defaultRate`. */
  def sampleByStratum(df: DataFrame, stratumCol: String, idCol: String,
      rates: Map[String, Int], defaultRate: Int = 100,
      bucket: Column => Column = splitBucket(_)): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 100),
      "rates are percents in [0, 100]")
    // map lookup, not a when-chain: the stratum column appears ONCE in
    // the predicate, so a computed stratum (e.g. langId) isn't duplicated
    // per configured rate when the filter collapses into the scan
    val rate =
      if (rates.isEmpty) lit(defaultRate)
      else coalesce(element_at(
        map(rates.toSeq.flatMap { case (s, r) => Seq(lit(s), lit(r)) }: _*),
        col(stratumCol)), lit(defaultRate))
    df.filter(bucket(col(idCol)) < rate)
  }

  /** Scheme-and-host pattern shared by the canonicalizer's extract and
    * strip steps (absolute http(s)-style URLs). */
  private val SchemeHostPattern = "^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)"

  /** URL canonicalization — the normalize-before-dedup step of web
    * curation: lowercase scheme and host (paths stay case-sensitive),
    * strip a leading `www.`, drop the fragment, drop tracking query
    * params (`utm_*`, `fbclid`, `gclid`, `ref`), repair the query
    * separator the removal may orphan, drop an empty query, and strip a
    * trailing path slash. `canonicalUrl(a) == canonicalUrl(b)` then
    * keys exact URL-dup groups. Every step is a plain RE2-compatible
    * regexp (no lookaround), so an external engine replays the chain
    * verbatim (the same contract as the PII patterns); expects absolute
    * URLs. Pure per-row expressions — zero shuffles at any scale, and
    * idempotent (spec-pinned). */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, SchemeHostPattern, 1))
    val host = regexp_replace(
      lower(regexp_extract(url, SchemeHostPattern, 2)), "^www\\.", "")
    val rest = regexp_replace(url, SchemeHostPattern, "")
    val noFrag = regexp_replace(rest, "#.*$", "")
    // split path from query BEFORE touching either: '&' is a legal path
    // character (RFC 3986), so tracking-param surgery must never see the
    // path, and slash-trimming must never see a query value
    val path = regexp_replace(regexp_extract(noFrag, "^[^?]*", 0), "/+$", "")
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    // drop a tracking param together with WHICHEVER separator precedes
    // it (start-of-query or '&'), then strip a leading '&' left when the
    // first param was dropped
    val cleaned = regexp_replace(
      regexp_replace(query, "(?:^|&)(utm_[a-z]+|fbclid|gclid|ref)=[^&]*", ""),
      "^&", "")
    concat(scheme, lit("://"), host, path,
      when(cleaned === "", lit("")).otherwise(concat(lit("?"), cleaned)))
  }

  /** Down-sample strata to a TARGET MIXTURE — the data-mixing step of
    * training-corpus assembly (Pile/LLaMA-style "30% web, 20% code"
    * recipes). `parts` are integer mixture weights (5:3:2, not floats —
    * integer parts keep the rate arithmetic exact: the binding stratum's
    * rate is exactly 100, not 99 via a float wobble). The largest
    * feasible plan is chosen: the stratum with the smallest n/w keeps
    * 100% and every other stratum is down-sampled to match the weight
    * ratios (at the 1%-granularity of the deterministic id bucket).
    * Strata absent from `parts` are dropped.
    *
    * Everything stays in-frame — no driver collect, no rand(): one
    * per-stratum count aggregate, a one-row struct-min (the binding
    * stratum), and a ≤|parts|-row rate frame broadcast back onto the
    * corpus (bounded by the literal mixture spec, so the hint is safe).
    * Rows keep/drop by the same consistent id-bucket rule as
    * [[sampleByStratum]], so a recipe change re-uses, not re-samples,
    * the kept set. */
  def sampleToMixture(df: DataFrame, stratumCol: String, idCol: String,
      parts: Map[String, Long],
      bucket: Column => Column = splitBucket(_)): DataFrame = {
    require(parts.nonEmpty && parts.values.forall(_ > 0L),
      "mixture parts must be positive integers")
    val lits = parts.toSeq.sortBy(_._1).map { case (s, p) =>
      struct(lit(s).as("__stratum"), lit(p).as("__w"))
    }
    val wdf = df.sparkSession.range(1)
      .select(explode(array(lits: _*)).as("__sw"))
      .select(col("__sw.__stratum").as("__stratum"), col("__sw.__w").as("__w"))
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n"))
      .select(col(stratumCol).as("__stratum"), col("__n"))
    val joined = counts.join(wdf, Seq("__stratum"))
    // binding stratum: smallest n/w (double ONLY for comparison — both
    // engines see identical IEEE bits; ties break on (n, w)). A window
    // min, not agg + self-join: the frame is ≤|parts| rows, so the
    // single-partition window is bounded by the recipe — and the counts
    // aggregate is planned ONCE instead of once per branch (at corpus
    // scale that second branch was a second full-column scan). The
    // constant partition key exists only to declare the bound (a
    // non-foldable one — a literal is folded away and WindowExec then
    // warns about an undeclared global window; `__stratum` is a join
    // key, so isNull is constant-false across the frame).
    val winAll = Window.partitionBy(col("__stratum").isNull)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val withBinding = joined.withColumn("__m", min(struct(
      (col("__n").cast(DoubleType) / col("__w").cast(DoubleType)).as("__q"),
      col("__n").as("__ns"), col("__w").as("__ws"))).over(winAll))
    // rate = (100 * nstar * w) div (wstar * n) — INTEGER division, which
    // is floor for non-negative operands and exact at any count (a
    // float floor would shave the binding stratum to 99 once 100·n·w
    // passes 2^53; longs hold to ~9.2e16 corpus rows per stratum at
    // w ≤ 1000)
    val rates = withBinding
      .select(col("__stratum"), col("__m.__ns").as("__ns"),
        col("__m.__ws").as("__ws"), col("__w"), col("__n"))
      .select(col("__stratum"),
        expr("(100 * __ns * __w) div (__ws * __n)").as("__rate"))
    df.join(broadcast(rates), df(stratumCol) === rates("__stratum"))
      .filter(bucket(col(idCol)) < col("__rate"))
      .drop("__stratum", "__rate")
  }
}
