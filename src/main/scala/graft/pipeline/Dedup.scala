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

  /** Shingles from an ALREADY-SPLIT word array column. The word array must
    * be a materialized attribute: this expression references it once per
    * shingle index, and interpreted higher-order functions would otherwise
    * re-split the text per index. */
  def shinglesOfWords(words: Column, n: Int = 3): Column =
    when(size(words) >= n,
      array_distinct(transform(
        sequence(lit(0), size(words) - n),
        i => array_join(slice(words, i + lit(1), lit(n)), " "))))
    .otherwise(array().cast("array<string>"))

  /** Distinct word n-gram shingles of a whitespace-tokenized text.
    * Convenience single-expression form for tests/small frames — inside
    * operator pipelines use [[withShingles]], which stages the split. */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesOfWords(split(text, " "), n)

  /** Staged projection: id + distinct shingles, with the word split
    * materialized once per row. */
  def withShingles(df: DataFrame, idCol: String, textCol: String,
      n: Int, out: String): DataFrame =
    df.select(col(idCol), split(col(textCol), " ").as("__words"))
      .select(col(idCol), shinglesOfWords(col("__words"), n).as(out))

  /** Exact set Jaccard of two (distinct-element) arrays. The union size
    * is derived by inclusion-exclusion (|a| + |b| − |a∩b|) instead of a
    * second `array_union` hash pass — exact for distinct-element inputs
    * (the stated contract), so the quotient is bit-identical to the
    * two-pass form while the per-pair work halves (r16 opt; the
    * intersection subtree is shared by codegen subexpression
    * elimination). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val uni = size(a) + size(b) - inter
    when(uni === 0, lit(0.0))
      .otherwise(inter.cast(DoubleType) / uni.cast(DoubleType))
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

  /** Streaming twin of [[exactDedup]]: in-flight exact dedup on a
    * stream, keyed by content digest, with state bounded by the
    * event-time watermark (`dropDuplicatesWithinWatermark` — a digest's
    * state is dropped once the watermark passes it, so state is
    * O(arrival rate × delay), never O(corpus)). Exactly one row per
    * digest survives the window; duplicates arriving in LATER
    * micro-batches are always dropped in favour of the earlier arrival,
    * but WITHIN one micro-batch the surviving row is engine-chosen (the
    * built-in keeps whichever row reaches the state store first) — a
    * deterministic winner (min id) is the batch layer's job
    * ([[exactDedup]] over the stored tier), the same split the block
    * ingest path uses (hot vs confirmed). */
  def streamingExactDedup(stream: DataFrame, textCol: String, tsCol: String,
      delay: String): DataFrame =
    stream.withColumn("__digest", sha2(col(textCol), 256))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("__digest")
      .drop("__digest")

  // ---- line-level dedup (C4-style) -------------------------------------

  /** Explode text into "lines": non-overlapping `width`-token slices,
    * `(__id, __ln, __line)` — the line analog for corpora without
    * natural newlines (real corpora pass their own exploded line frame
    * straight to [[dedupLines]]). Narrow per-row expressions; the
    * partial last slice is kept. */
  def tokenLines(df: DataFrame, idCol: String, textCol: String,
      width: Int = 10): DataFrame = {
    val staged = df
      .filter(length(col(textCol)) > 0) // split("") is [""], not [] — an
      .select(col(idCol).as("__id"), split(col(textCol), " ").as("__w")) // empty doc has no lines
    staged.select(col("__id"),
      posexplode(transform(
        sequence(lit(0L), floor((size(col("__w")) - 1) / lit(width))),
        i => array_join(
          slice(col("__w"), (i * width + 1).cast("int"), lit(width)), " ")))
        .as(Seq("__ln", "__line")))
  }

  /** Corpus-wide line dedup (the C4 recipe, Raffel et al. 2020 §2.2:
    * any span occurring more than once in the corpus keeps ONE
    * occurrence): every distinct line survives only at its first
    * occurrence — minimum (id, line_no) — and every later occurrence in
    * ANY document is dropped. The window partitions on the line's
    * 32-byte digest, so line text never shuffles (the [[exactDedup]]
    * digest trick at line granularity). */
  def dedupLines(lines: DataFrame, idCol: String = "__id",
      lineNoCol: String = "__ln", lineCol: String = "__line"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(sha2(col(lineCol), 256))
      .orderBy(col(idCol), col(lineNoCol))
    lines.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Reassemble per-document text from surviving lines, in line order:
    * `(idCol, n_lines, text)`. Documents that lost every line are
    * absent. One shuffle on the doc id; the sort is per-document
    * row-local (array_sort over the collected lines). */
  def reassembleLines(kept: DataFrame, idCol: String = "__id",
      lineNoCol: String = "__ln", lineCol: String = "__line",
      sep: String = " "): DataFrame =
    kept.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lines"),
        array_join(transform(
          array_sort(collect_list(struct(col(lineNoCol), col(lineCol)))),
          x => x.getField(lineCol)), sep).as("text"))

  // ---- exact substring dedup (ExactSubstr) ------------------------------

  /** Positioned window-fingerprint rows `(__id, __start, __fp)`: the md5
    * of every w-token window, with its 1-based token start. Unlike the
    * winnowing sketch ([[graft.pipeline.TextAnalysis.rollingFingerprintRows]])
    * this keeps positions and multiplicity — which is what lets the
    * caller CUT the duplicated span, not merely detect overlap. The
    * split is staged once per row; the per-window md5 shuffles 16 bytes,
    * never the window text. Cf. reference semantics for content-addressed
    * dedup; the algorithm is the ExactSubstr recipe of Lee et al. 2022
    * ("Deduplicating Training Data Makes Language Models Better"). */
  def windowFingerprintRows(df: DataFrame, idCol: String, textCol: String,
      window: Int): DataFrame =
    df.select(col(idCol).as("__id"), split(col(textCol), " ").as("__w"))
      .filter(size(col("__w")) >= window)
      .select(col("__id"),
        posexplode(transform(
          sequence(lit(1), size(col("__w")) - (window - 1)),
          i => md5(array_join(slice(col("__w"), i, lit(window)), " "))))
          .as(Seq("__p", "__fp")))
      .select(col("__id"), (col("__p") + 1).cast(LongType).as("__start"),
        col("__fp"))

  /** Removable window sites `(__id, __start)`: for every fingerprint with
    * ≥ 2 sites corpus-wide, every site EXCEPT the globally-first one
    * (minimum (doc, start), lexicographic) — the kept occurrence.
    *
    * ONE fingerprint-keyed exchange end to end (r16 opt): per-fp site
    * count and first-site election run as unordered-frame window
    * aggregates over the shuffled sites. The previous aggregate +
    * join-back form was sold on map-side partial aggregation, but the
    * join-back re-shuffled (and re-scanned) every site row anyway — the
    * same bytes this window moves once — plus a second exchange and a
    * second pass over the sketch (guide §2.4: two operations keyed the
    * same way share one exchange).
    *
    * SKEW TRADEOFF (deliberate): both the old and new forms gather every
    * site of one fingerprint into one task (a window cannot split a key,
    * and the old join hashed on __fp too), so a degenerate corpus where
    * one substring fingerprint dominates makes that task a straggler —
    * WindowExec at least buffers spillably. If corpus-scale fp skew is
    * expected, the fix is a count-threshold salted two-phase election
    * (elect per (fp, salt), then elect among the ≤k salt winners), at
    * the cost of a second small exchange; not taken here because the
    * fixtures and the Lee et al. recipe's hash-sized windows keep per-fp
    * multiplicity tiny. */
  def removableWindowSites(fps: DataFrame): DataFrame = {
    val byFp = org.apache.spark.sql.expressions.Window.partitionBy(col("__fp"))
    val site = struct(col("__id"), col("__start"))
    fps
      .withColumn("__n", count(lit(1)).over(byFp))
      .withColumn("__keep", min(site).over(byFp))
      .filter(col("__n") >= 2 && !(site === col("__keep")))
      .select(col("__id"), col("__start"))
  }

  /** Merge per-document intervals `(__id, __s, __e)` that overlap or
    * touch into maximal spans (gaps-and-islands): running max-end over a
    * per-document window keyed by the unique start — a new island opens
    * when a start clears the previous maximum end by more than 1. */
  def mergeSpans(spans: DataFrame, idCol: String = "__id"): DataFrame = {
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__s"))
    val pmax = max(col("__e"))
      .over(byDoc.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1))
    spans
      .withColumn("__nw",
        when(col("__s") > coalesce(pmax, col("__s") - 2) + 1, 1L).otherwise(0L))
      .withColumn("__isl", sum(col("__nw")).over(
        byDoc.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col(idCol), col("__isl"))
      .agg(min(col("__s")).as("span_start"), max(col("__e")).as("span_end"))
      .drop("__isl")
  }

  /** Maximal removable spans per document from a positioned fingerprint
    * frame (the persisted [[DedupIndex.ensureSubstrWindows]] sketch at
    * scale): duplicate sites widened to their w-token extent, then
    * island-merged. Returns `(__id, span_start, span_end)`. */
  def substringDupSpansFromFingerprints(fps: DataFrame, window: Int): DataFrame =
    mergeSpans(removableWindowSites(fps)
      .select(col("__id"), col("__start").as("__s"),
        (col("__start") + (window - 1)).as("__e")))

  /** [[substringDupSpansFromFingerprints]] with fingerprints computed
    * inline. */
  def substringDupSpans(df: DataFrame, idCol: String, textCol: String,
      window: Int = 8): DataFrame =
    substringDupSpansFromFingerprints(
      windowFingerprintRows(df, idCol, textCol, window), window)

  /** Cut the merged duplicate spans out of each document: tokens covered
    * by any span are dropped, the rest re-join in order. Returns
    * `(idCol, tot_tokens, dup_tokens, clean_text)` — every input
    * document appears (unaffected docs keep their text verbatim; fully
    * duplicated docs come back empty). The span list is per-document and
    * island-merged, so the collected array is bounded by the document's
    * own token count; the token filter is a per-row lambda over that
    * small array, not a join against exploded positions. */
  def substringDedup(df: DataFrame, idCol: String, textCol: String,
      window: Int = 8,
      spansOverride: Option[DataFrame] = None): DataFrame = {
    val spans = spansOverride
      .getOrElse(substringDupSpans(df, idCol, textCol, window))
    val perDoc = spans.groupBy(col("__id"))
      .agg(
        collect_list(struct(col("span_start").as("s"), col("span_end").as("e")))
          .as("__spans"),
        sum(col("span_end") - col("span_start") + 1).as("__dup"))
    df.select(col(idCol), col(textCol), split(col(textCol), " ").as("__w"))
      .join(perDoc, col(idCol) === col("__id"), "left")
      .select(
        col(idCol),
        size(col("__w")).cast(LongType).as("tot_tokens"),
        coalesce(col("__dup"), lit(0L)).as("dup_tokens"),
        when(col("__spans").isNull, col(textCol))
          .otherwise(array_join(
            filter(col("__w"), (t, i) => !exists(col("__spans"),
              sp => (i + 1) >= sp.getField("s") && (i + 1) <= sp.getField("e"))),
            " "))
          .as("clean_text"))
  }

  // ---- MinHash + banded LSH --------------------------------------------

  /** MinHash signature (length `numHashes`) over an ALREADY-HASHED element
    * array (`array<bigint>`): one cheap long-rehash per (element, seed).
    *
    * The element hashing happens in a SEPARATE projection (see
    * [[lshCandidatePairs]]): higher-order functions evaluate interpreted
    * with no common-subexpression elimination, so inlining the base-hash
    * tree here would duplicate it `numHashes` times per row — referencing a
    * materialized attribute instead keeps it computed once (CollapseProject
    * refuses to inline non-cheap producers referenced many times). */
  def minHashSignature(hashedElems: Column, numHashes: Int = 32): Column =
    array((0 until numHashes).map { seed =>
      array_min(transform(hashedElems, h => xxhash64(h, lit(seed))))
    }: _*)

  /** Band hashes of a MinHash signature: `bands` hashes each covering
    * `rows` consecutive signature slots. */
  def lshBandHashes(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      xxhash64(lit(b), slice(sig, lit(b * rows + 1), lit(rows)))
    }: _*)

  /** MinHash signature rows `(__id, __m0 … __m{numHashes-1})` from a
    * SHINGLED frame — the ingest-time sketch [[DedupIndex]] persists.
    * MinHash via explode + plain projections + partial aggregation, NOT
    * array higher-order functions: HOF lambdas evaluate interpreted (no
    * whole-stage codegen, no subexpression elimination) — measured 100×
    * slower at sf0.1. Exploding keeps every per-element hash inside
    * codegen, and min() partial-aggregates map-side, so the only shuffle
    * is one signature row per document. */
  def minHashSignaturesOfShingles(df: DataFrame, idCol: String,
      shingleCol: String, numHashes: Int = 32): DataFrame = {
    val exploded = df.filter(size(col(shingleCol)) > 0)
      .select(col(idCol).as("__id"), explode(col(shingleCol)).as("__s"))
    val hashed = exploded.select(
      col("__id") +: (0 until numHashes).map(i => xxhash64(lit(i), col("__s")).as(s"__h$i")): _*)
    hashed.groupBy(col("__id")).agg(
      min(col("__h0")).as("__m0"),
      (1 until numHashes).map(i => min(col(s"__h$i")).as(s"__m$i")): _*)
  }

  /** Signature rows straight from a raw (id, text) frame. */
  def minHashSignatureRows(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 32): DataFrame =
    minHashSignaturesOfShingles(
      withShingles(df, idCol, textCol, shingleN, "__sh"), idCol, "__sh", numHashes)

  /** Candidate pairs from a signature frame `(__id, __m*)`: explode band
    * hashes, self-join on (band, bandHash) — the only shuffle is on bucket
    * keys, never all-pairs. Returns distinct (a_id, b_id), a_id < b_id. */
  def lshCandidatePairsFromSignatures(sig: DataFrame,
      numHashes: Int = 32, bands: Int = 8): DataFrame = {
    val rows = numHashes / bands
    val withBands = sig.select(col("__id"),
      posexplode(array((0 until bands).map { b =>
        xxhash64(lit(b) +: (0 until rows).map(r => col(s"__m${b * rows + r}")): _*)
      }: _*)).as(Seq("band", "bucket")))
    val a = withBands.select(col("__id").as("a_id"), col("band"), col("bucket"))
    val b = withBands.select(col("__id").as("b_id"), col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket")).filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
  }

  /** Candidate near-duplicate pairs via banded LSH from a shingled frame
    * (signatures computed inline — see the indexed variant for the
    * persisted-sketch lifecycle). */
  def lshCandidatePairs(df: DataFrame, idCol: String, shingleCol: String,
      numHashes: Int = 32, bands: Int = 8): DataFrame =
    lshCandidatePairsFromSignatures(
      minHashSignaturesOfShingles(df, idCol, shingleCol, numHashes), numHashes, bands)

  /** Exact-Jaccard verification of candidate (a_id, b_id) pairs against
    * the corpus text, thresholded. Shingles are one codegen'd projection
    * per side; only candidate rows survive the joins. */
  private def verifyJaccard(cands: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String, threshold: Double, shingleN: Int): DataFrame = {
    val sh = withShingles(corpus, idCol, textCol, shingleN, "__sh")
      .withColumnRenamed(idCol, "__id")
    cands
      .join(sh.select(col("__id").as("a_id"), col("__sh").as("a_sh")), Seq("a_id"))
      .join(sh.select(col("__id").as("b_id"), col("__sh").as("b_sh")), Seq("b_id"))
      .select(col("a_id"), col("b_id"), jaccard(col("a_sh"), col("b_sh")).as("j"))
      .filter(col("j") >= threshold)
  }

  /** Full MinHash-LSH near-dup pipeline: LSH candidates, then exact
    * Jaccard computed only on the candidate set, thresholded. */
  def minHashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleN: Int = 3, numHashes: Int = 32,
      bands: Int = 8): DataFrame = {
    val sh = withShingles(df, idCol, textCol, shingleN, "__sh")
      .withColumnRenamed(idCol, "__id")
    val cands = lshCandidatePairsFromSignatures(
      minHashSignaturesOfShingles(sh, "__id", "__sh", numHashes), numHashes, bands)
    verifyJaccard(cands, df, idCol, textCol, threshold, shingleN)
  }

  /** [[minHashNearDupPairs]] over a PERSISTED signature frame (see
    * [[DedupIndex.ensureMinHash]]): the explode → numHashes-column
    * aggregation never runs at query time; candidates come from banding
    * the stored sketch, verification re-shingles only to score them. */
  def minHashNearDupPairsIndexed(corpus: DataFrame, sig: DataFrame,
      idCol: String, textCol: String, threshold: Double, shingleN: Int = 3,
      numHashes: Int = 32, bands: Int = 8): DataFrame =
    verifyJaccard(lshCandidatePairsFromSignatures(sig, numHashes, bands),
      corpus, idCol, textCol, threshold, shingleN)

  /** Brute-force n-gram Jaccard pairs — the oracle-checkable baseline the
    * LSH path is validated against. All-pairs: only for bounded slices. */
  def bruteForceNearDupPairs(left: DataFrame, right: DataFrame, idCol: String,
      textCol: String, threshold: Double, shingleN: Int = 3): DataFrame = {
    val a = withShingles(left, idCol, textCol, shingleN, "a_sh")
      .withColumnRenamed(idCol, "a_id")
    val b = withShingles(right, idCol, textCol, shingleN, "b_sh")
      .withColumnRenamed(idCol, "b_id")
    a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), jaccard(col("a_sh"), col("b_sh")).as("j"))
      .filter(col("j") >= threshold)
  }

  // ---- SimHash ----------------------------------------------------------

  /** 64-bit SimHash over an ALREADY-HASHED element array (`array<bigint>`):
    * per-bit signed vote folded per-row with `aggregate` — no shuffle, no
    * UDF. Like [[minHashSignature]], the element hashing must live in its
    * own projection: this expression references the array 64 times. */
  def simHash64(hashedElems: Column): Column = {
    val bits = (0 until 64).map { k =>
      val vote = aggregate(hashedElems, lit(0L),
        (acc, h) => acc + when(shiftright(h, k).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      when(vote > 0, shiftleft(lit(1L), k).cast(LongType)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  private def bitVote(k: Int): Column =
    sum(when(shiftright(col("__h"), k).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** The production per-shingle hash: xxhash64 (codegen'd, fastest). */
  def xxHash(c: Column): Column = xxhash64(c)

  /** Cross-engine-reproducible 60-bit hash: the first 15 hex digits of
    * sha256, as a long. Any engine with sha256 can replay it exactly
    * (DuckDB: fold the hex digits with BIGINT shifts), which is what lets
    * the driver gate hash-verify the whole SimHash pipeline. 60 bits so
    * the unsigned `conv` result always fits a signed long. */
  def sha60(c: Column): Column =
    conv(substring(sha2(c, 256), 1, 15), 16, 10).cast(LongType)

  /** SQL twin of [[sha60]] for DuckDB oracles: digit-wise BIGINT fold of
    * the sha256 hex prefix. */
  def sha60Sql(c: String): String =
    s"CAST(list_sum(list_transform(range(1, 16), i -> " +
      s"CAST(strpos('0123456789abcdef', substring(sha256($c), CAST(i AS INT), 1)) - 1 AS BIGINT) " +
      s"* (CAST(1 AS BIGINT) << CAST(4 * (15 - i) AS INT)))) AS BIGINT)"

  /** Per-document SimHash fingerprint over shingles: explode + codegen
    * hash projections + partial-agg bit votes (the same shape as
    * [[lshCandidatePairs]] — HOF lambdas would interpret ~100× slower).
    * `bits` ≤ 63; a tie vote (0) counts as bit 0. Docs with no shingles
    * (< shingleN words) carry no fingerprint and never pair. */
  def simHashFingerprints(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, hashFn: Column => Column = xxHash,
      bits: Int = 64): DataFrame = {
    val exploded = withShingles(df, idCol, textCol, shingleN, "__sh")
      .withColumnRenamed(idCol, "__id")
      .filter(size(col("__sh")) > 0)
      .select(col("__id"), explode(col("__sh")).as("__s"))
      .select(col("__id"), hashFn(col("__s")).as("__h"))
    val votes = exploded.groupBy(col("__id")).agg(
      bitVote(0).as("__v0"), (1 until bits).map(k => bitVote(k).as(s"__v$k")): _*)
    votes.select(col("__id"),
      (0 until bits).map { k =>
        when(col(s"__v$k") > 0, shiftleft(lit(1L), k).cast(LongType)).otherwise(lit(0L))
      }.reduce(_ + _).as("__sim"))
  }

  /** SimHash near-dup pairs with banded blocking: the fingerprint splits
    * into `bands` disjoint slices and pairs agreeing on ANY slice are
    * candidates — one shuffle on (band, slice), never all-pairs, and
    * slices of ≥ 15 bits keep buckets tiny at corpus scale. By
    * pigeonhole the blocking is EXACT whenever `maxHamming < bands`
    * (< bands flipped bits cannot touch every band), so with the default
    * (3, 4) the output is precisely every pair at hamming ≤ 3 — the
    * standard web-dedup operating point (Manku et al., WWW'07; PAPERS.md).
    * Candidate pairs are deduped BEFORE the hamming distance is computed
    * — one comparison per pair, not per shared band. */
  def simHashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, bands: Int = 4, shingleN: Int = 3,
      hashFn: Column => Column = xxHash, bits: Int = 64): DataFrame =
    simHashNearDupPairsFromFingerprints(
      simHashFingerprints(df, idCol, textCol, shingleN, hashFn, bits),
      maxHamming, bands, bits)

  /** [[simHashNearDupPairs]] over a PERSISTED fingerprint frame
    * `(__id, __sim)` (see [[DedupIndex.ensureSimHash]]): the explode →
    * bit-vote aggregation never runs at query time — banding, in-bucket
    * pairing, and the hamming check are all codegen'd long arithmetic on
    * the stored sketch. */
  def simHashNearDupPairsFromFingerprints(f: DataFrame, maxHamming: Int = 3,
      bands: Int = 4, bits: Int = 64): DataFrame = {
    require(maxHamming < bands,
      s"banded blocking is exact only for maxHamming < bands (got $maxHamming, $bands)")
    val sliceBits = bits / bands
    val mask = (1L << sliceBits) - 1
    val banded = f.select(col("__id"), col("__sim"),
      posexplode(array((0 until bands).map { b =>
        shiftright(col("__sim"), b * sliceBits).bitwiseAND(lit(mask))
      }: _*)).as(Seq("__band", "__key")))
    val a = banded.select(col("__id").as("a_id"), col("__sim").as("a_sim"),
      col("__band"), col("__key"))
    val b = banded.select(col("__id").as("b_id"), col("__sim").as("b_sim"),
      col("__band"), col("__key"))
    // count-once rule: a pair colliding in SEVERAL bands surfaces once
    // per collision; keep only the FIRST matching band — a codegen'd
    // filter over the two fingerprints already on the row (the
    // RangeJoin first-shared-bin trick), where the old distinct()
    // re-shuffled every candidate pair to deduplicate (guide §2.4:
    // remove the exchange outright). Joined rows match in ≥ 1 band by
    // construction, so the least() is always < `bands`.
    val firstBand = least((0 until bands).map { bb =>
      val sa = shiftright(col("a_sim"), bb * sliceBits).bitwiseAND(lit(mask))
      val sb = shiftright(col("b_sim"), bb * sliceBits).bitwiseAND(lit(mask))
      when(sa === sb, lit(bb)).otherwise(lit(bands))
    }: _*)
    a.join(b, Seq("__band", "__key")).filter(col("a_id") < col("b_id"))
      .filter(col("__band") === firstBand)
      .select(col("a_id"), col("b_id"), hamming64(col("a_sim"), col("b_sim")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
