package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Deduplication operators for large-scale training-data pipelines —
  * exact, MinHash-LSH, SimHash, and n-gram Jaccard — designed so that no
  * stage ever materializes the all-pairs product.
  *
  * Scale design (100 TB):
  *   - Exact dedup is a single hash-shuffle on a 32-byte digest (map-side
  *     partial aggregation applies; the text column itself never shuffles).
  *   - MinHash-LSH shuffles once on (band, bandHash) buckets; candidate
  *     pairs are generated only inside buckets (cf. the distributed
  *     set-similarity-join literature in PAPERS.md). Brute-force Jaccard
  *     runs only on the candidate set.
  *   - Signatures/fingerprints are computed with per-row higher-order
  *     expressions (`transform`/`aggregate`) — whole-stage codegen, zero
  *     shuffles, no UDFs.
  */
object Dedup {

  // ---- shingling --------------------------------------------------------

  /** Distinct word n-gram shingles of a whitespace-tokenized text. */
  def shingles(text: Column, n: Int = 3): Column = {
    val w = split(text, " ")
    when(size(w) >= n,
      array_distinct(transform(
        sequence(lit(0), size(w) - n),
        i => array_join(slice(w, i + lit(1), lit(n)), " "))))
    .otherwise(array().cast("array<string>"))
  }

  /** Exact set Jaccard of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val uni = size(array_union(a, b))
    when(uni === 0, lit(0.0))
      .otherwise(size(array_intersect(a, b)).cast(DoubleType) / uni.cast(DoubleType))
  }

  // ---- exact dedup ------------------------------------------------------

  /** Exact duplicate groups keyed by content digest: one row per group of
    * ≥ `minCopies` identical values, with the canonical (minimum) id.
    * A 64-char digest shuffles instead of the document body. */
  def exactDupGroups(df: DataFrame, textCol: String, idCol: String,
      minCopies: Long = 2L): DataFrame =
    df.groupBy(sha2(col(textCol), 256).as("text_sha"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") >= minCopies)

  /** Exact dedup: keep one row per distinct text (the minimum id wins) —
    * the reference pattern for last-writer-wins compaction applies, but
    * deterministic. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(sha2(col(textCol), 256)).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  // ---- MinHash + banded LSH --------------------------------------------

  /** MinHash signature (length `numHashes`) over a shingle array. One base
    * xxhash64 per element, then one cheap long-rehash per (element, seed) —
    * all inside codegen, no shuffle. */
  def minHashSignature(shingleArr: Column, numHashes: Int = 32): Column = {
    val base = transform(shingleArr, s => xxhash64(s))
    array((0 until numHashes).map { seed =>
      array_min(transform(base, h => xxhash64(h, lit(seed))))
    }: _*)
  }

  /** Band hashes of a MinHash signature: `bands` hashes each covering
    * `rows` consecutive signature slots. */
  def lshBandHashes(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      xxhash64(lit(b), slice(sig, lit(b * rows + 1), lit(rows)))
    }: _*)

  /** Candidate near-duplicate pairs via banded LSH: explode band hashes,
    * self-join on (band, bandHash) — the only shuffle is on bucket keys,
    * never all-pairs. Returns distinct (a_id, b_id) with a_id < b_id. */
  def lshCandidatePairs(df: DataFrame, idCol: String, shingleCol: String,
      numHashes: Int = 32, bands: Int = 8): DataFrame = {
    val rows = numHashes / bands
    val sig = df
      .filter(size(col(shingleCol)) > 0)
      .select(col(idCol),
        lshBandHashes(minHashSignature(col(shingleCol), numHashes), bands, rows).as("bh"))
      .select(col(idCol), posexplode(col("bh")).as(Seq("band", "bucket")))
    val a = sig.select(col(idCol).as("a_id"), col("band"), col("bucket"))
    val b = sig.select(col(idCol).as("b_id"), col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket")).filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
  }

  /** Full MinHash-LSH near-dup pipeline: LSH candidates, then exact
    * Jaccard computed only on the candidate set, thresholded. */
  def minHashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleN: Int = 3, numHashes: Int = 32,
      bands: Int = 8): DataFrame = {
    val sh = df.select(col(idCol).as("__id"), shingles(col(textCol), shingleN).as("__sh"))
    val cands = lshCandidatePairs(sh, "__id", "__sh", numHashes, bands)
    cands
      .join(sh.select(col("__id").as("a_id"), col("__sh").as("a_sh")), Seq("a_id"))
      .join(sh.select(col("__id").as("b_id"), col("__sh").as("b_sh")), Seq("b_id"))
      .select(col("a_id"), col("b_id"), jaccard(col("a_sh"), col("b_sh")).as("j"))
      .filter(col("j") >= threshold)
  }

  /** Brute-force n-gram Jaccard pairs — the oracle-checkable baseline the
    * LSH path is validated against. All-pairs: only for bounded slices. */
  def bruteForceNearDupPairs(left: DataFrame, right: DataFrame, idCol: String,
      textCol: String, threshold: Double, shingleN: Int = 3): DataFrame = {
    val a = left.select(col(idCol).as("a_id"), shingles(col(textCol), shingleN).as("a_sh"))
    val b = right.select(col(idCol).as("b_id"), shingles(col(textCol), shingleN).as("b_sh"))
    a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), jaccard(col("a_sh"), col("b_sh")).as("j"))
      .filter(col("j") >= threshold)
  }

  // ---- SimHash ----------------------------------------------------------

  /** 64-bit SimHash of a token array: per-bit signed vote over element
    * hashes, folded per-row with `aggregate` — no shuffle, no UDF. */
  def simHash64(tokens: Column): Column = {
    val hashes = transform(array_distinct(tokens), t => xxhash64(t))
    val bits = (0 until 64).map { k =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, k).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      when(vote > 0, shiftleft(lit(1L), k).cast(LongType)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup buckets: group by the top `prefixBits` of the
    * fingerprint (cheap blocking), compare within blocks only. The
    * fingerprint is computed over shingles, not raw tokens — on
    * small-vocabulary corpora token sets saturate and every fingerprint
    * collides. */
  def simHashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, prefixBits: Int = 12, shingleN: Int = 3): DataFrame = {
    val f = df.select(col(idCol).as("__id"),
      simHash64(shingles(col(textCol), shingleN)).as("__sim"))
    val keyed = f.withColumn("__blk", shiftright(col("__sim"), 64 - prefixBits))
    val a = keyed.select(col("__id").as("a_id"), col("__sim").as("a_sim"), col("__blk"))
    val b = keyed.select(col("__id").as("b_id"), col("__sim").as("b_sim"), col("__blk"))
    a.join(b, Seq("__blk")).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), hamming64(col("a_sim"), col("b_sim")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
