package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, fingerprinting. All per-row
  * expressions — linear scans with zero shuffles at any scale. */
object TextAnalysis {

  def tokens(text: Column): Column = split(text, " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword estimate: words plus punctuation splits plus a
    * length penalty for long words (≈ GPT-style ~4 chars/token).
    * Formulated as insert-space-before-punct + trim + `\s+` split rather
    * than a lookahead split, so the RE2-based DuckDB oracle replays it
    * verbatim (RE2 has no lookahead). One deliberate divergence from the
    * old lookahead form: punctuation-INITIAL text no longer counts a
    * leading empty token ("!a" → 1, was 2 with Java's split keeping the
    * empty string before the boundary) — the trimmed count is the more
    * honest one. */
  def bpeishTokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(
      size(split(trim(regexp_replace(text, "([.,!?;:])", " $1")), "\\s+"))) +
      (length(text) / lit(16)).cast("int")

  /** Compact stopword lists per language — the n-gram-heuristic shape of
    * fasttext-style lang-ID, reduced to codegen-able set overlap. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "un", "une"),
    "es" -> Seq("el", "la", "los", "las", "es", "un", "una", "que"),
  )

  /** Per-language stopword hit count over the distinct token set. */
  def langScore(text: Column, lang: String): Column =
    size(array_intersect(
      array_distinct(tokens(lower(text))),
      array(stopwords(lang).map(lit(_)): _*)))

  /** Argmax language with deterministic tie-break (alphabetical order of
    * the language code, "und" when nothing matches).
    *
    * Shaped as ONE `greatest` over (score, rank, lang) structs — struct
    * comparison is lexicographic, so the max score wins and the rank
    * breaks ties toward the alphabetically first language — rather than
    * a when-chain re-embedding `greatest(scores)` per language: that form
    * repeated every langScore ~5×, and each *use* of langId (a filter
    * plus a grouping key, say) multiplied it again, bloating plans to
    * dozens of array_intersect nodes whose optimizer/codegen time, not
    * execution, dominated small queries. */
  def langId(text: Column): Column = {
    val ordered = stopwords.keys.toSeq.sorted
    val entries = ordered.zipWithIndex.map { case (l, i) =>
      struct(langScore(text, l).as("s"), lit(ordered.size - i).as("r"), lit(l).as("l"))
    }
    val top = greatest(entries: _*)
    when(top.getField("s") > 0, top.getField("l")).otherwise(lit("und"))
  }

  /** Quality metrics: char/token counts, type-token ratio, mean word
    * length, uppercase+punct ratio — the usual cheap pretraining filters. */
  def nChars(text: Column): Column = length(text)

  def typeTokenRatio(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0))
      .otherwise(size(array_distinct(t)).cast(DoubleType) / size(t).cast(DoubleType))
  }

  def meanWordLength(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0))
      .otherwise((length(text) - (size(t) - 1)).cast(DoubleType) / size(t).cast(DoubleType))
  }

  /** Fraction of characters that are not lowercase letters or spaces. */
  def nonAlphaRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(
        (length(text) - length(regexp_replace(text, "[^a-z ]", ""))).cast(DoubleType)
          / length(text).cast(DoubleType))

  /** Composite keep/drop flag with pretraining-ish defaults. */
  def qualityKeep(text: Column, minTokens: Int = 8, maxMeanWordLen: Double = 12.0,
      minTtr: Double = 0.05): Column =
    tokenCount(text) >= minTokens &&
      meanWordLength(text) <= maxMeanWordLen &&
      typeTokenRatio(text) >= minTtr

  /** Content fingerprints: md5 (cross-engine canonical) and xxhash64
    * (cheap 8-byte variant for shuffle keys at scale). */
  def fingerprintMd5(text: Column): Column = md5(text)
  def fingerprint64(text: Column): Column = xxhash64(text)

  /** Rolling-window fingerprints: xxhash64 of each w-token window —
    * the winnowing building block for robust partial-overlap detection. */
  def rollingFingerprints(text: Column, window: Int = 8): Column = {
    val w = tokens(text)
    when(size(w) >= window,
      transform(sequence(lit(0), size(w) - window),
        i => xxhash64(array_join(slice(w, i + lit(1), lit(window)), " "))))
    .otherwise(array().cast("array<bigint>"))
  }

  /** The raw w-token windows (strings) of a text — explode these and hash
    * with a plain projection for the scale path (HOF lambdas interpret;
    * see Dedup.lshCandidatePairs). */
  def rollingWindows(words: Column, window: Int = 8): Column =
    when(size(words) >= window,
      transform(sequence(lit(0), size(words) - window),
        i => array_join(slice(words, i + lit(1), lit(window)), " ")))
    .otherwise(array().cast("array<string>"))

  /** Corpus vocabulary statistics: per-term document frequency and
    * collection frequency over whitespace tokens — the aggregation shape
    * behind vocabulary building, stopword mining, and idf tables. One
    * explode + one aggregate; the shuffle carries (term, partial counts)
    * pairs, map-side combined — document bodies never shuffle. */
  def vocabStats(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    df.select(col(idCol).as("__id"), explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term"))
      .agg(countDistinct(col("__id")).as("df"), count(lit(1)).as("cf"))

  /** Overlapping token chunks — the retrieval-prep (RAG) step feeding
    * the BM25/ANN index builders: windows of `width` tokens advancing by
    * `stride` (< width ⇒ consecutive chunks overlap by width − stride,
    * so no query phrase straddles a boundary unseen). Chunk k starts at
    * token 1 + k·stride; the count is 1 + ⌈(n − width)/stride⌉ for
    * n > width, else 1 — the last chunk keeps the partial tail. Empty
    * docs have no chunks. Narrow per-row expressions (the ceil-division
    * runs on token counts, far below the 2^53 double-exactness bound).
    * Returns `(__id, __chunk, __text, __n)`. */
  def tokenChunks(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, width: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    require(width > 0 && stride > 0 && stride <= width,
      "need 0 < stride <= width")
    val staged = df.filter(length(col(textCol)) > 0)
      .select(col(idCol).as("__id"), split(col(textCol), " ").as("__w"))
    val n = size(col("__w"))
    val m = lit(1) + when(n > width,
      floor((n - lit(width) + lit(stride - 1)) / lit(stride)).cast("int"))
      .otherwise(lit(0))
    staged.select(col("__id"),
        posexplode(transform(sequence(lit(0), m - 1), k => struct(
          array_join(slice(col("__w"), k * stride + 1, lit(width)), " ").as("t"),
          least(lit(width), n - k * stride).cast("long").as("n"))))
          .as(Seq("__chunk", "__c")))
      .select(col("__id"), col("__chunk").cast("long").as("__chunk"),
        col("__c.t").as("__text"), col("__c.n").as("__n"))
  }

  /** Distinct window-fingerprint rows `(__id, __fp)` of a corpus — the
    * winnowing sketch [[DedupIndex.ensureWinnowing]] persists at ingest.
    * md5 so an external engine can reproduce the keys. */
  def rollingFingerprintRows(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, window: Int = 8): org.apache.spark.sql.DataFrame =
    df.select(col(idCol).as("__id"), split(col(textCol), " ").as("__words"))
      .select(col("__id"),
        explode(array_distinct(rollingWindows(col("__words"), window))).as("__w"))
      .select(col("__id"), md5(col("__w")).as("__fp"))

  /** Partial-overlap pairs from a fingerprint frame `(__id, __fp)`:
    * self-join on fingerprint keys only — never all-pairs. */
  def rollingOverlapPairsFromFingerprints(fps: org.apache.spark.sql.DataFrame,
      minShared: Long = 1L): org.apache.spark.sql.DataFrame = {
    val a = fps.select(col("__id").as("a_id"), col("__fp"))
    val b = fps.select(col("__id").as("b_id"), col("__fp"))
    a.join(b, Seq("__fp")).filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Partial-overlap pairs: documents sharing ≥ `minShared` distinct
    * w-token windows, fingerprints computed inline (see the indexed
    * variant in [[DedupIndex]] for the persisted-sketch lifecycle). */
  def rollingOverlapPairs(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, window: Int = 8, minShared: Long = 1L): org.apache.spark.sql.DataFrame =
    rollingOverlapPairsFromFingerprints(
      rollingFingerprintRows(df, idCol, textCol, window), minShared)

  /** Benchmark decontamination: training documents sharing ≥ `minShared`
    * distinct w-token windows with ANY document of an evaluation set —
    * the standard n-gram contamination check run before training. Same
    * fingerprint-key join as [[rollingOverlapPairs]], across two frames:
    * the shuffle carries fingerprints, never text, and the (usually
    * tiny) eval side's fingerprints broadcast when AQE sees their size.
    * At 100 TB the corpus side reads its persisted [[DedupIndex]]
    * winnowing sketch; the eval set is fingerprinted on the fly.
    * Returns (corpus_id, eval_id, n_shared). */
  def contaminationPairs(corpus: org.apache.spark.sql.DataFrame,
      eval: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      window: Int = 8, minShared: Long = 1L): org.apache.spark.sql.DataFrame =
    contaminationPairsFromFingerprints(
      rollingFingerprintRows(corpus, idCol, textCol, window),
      rollingFingerprintRows(eval, idCol, textCol, window), minShared)

  /** [[contaminationPairs]] over pre-fingerprinted frames (corpus side
    * from the persisted index at scale). */
  def contaminationPairsFromFingerprints(corpusFps: org.apache.spark.sql.DataFrame,
      evalFps: org.apache.spark.sql.DataFrame,
      minShared: Long): org.apache.spark.sql.DataFrame =
    corpusFps.select(col("__id").as("corpus_id"), col("__fp"))
      .join(evalFps.select(col("__id").as("eval_id"), col("__fp")), Seq("__fp"))
      .groupBy(col("corpus_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)

  // ---- repetition filters (Gopher-style) --------------------------------

  /** Fraction of whitespace tokens that repeat an earlier token — the
    * word-level duplicate-content signal of the Gopher/MassiveText
    * quality rules (Rae et al. 2021, appendix A1.1; same family as C4's
    * repetition filters). Per-row, codegen'd; 0 for empty text. */
  def duplicateWordFraction(text: Column): Column = {
    val ws = split(trim(text), "\\s+")
    when(length(trim(text)) === 0, lit(0.0))
      .otherwise(lit(1.0) -
        size(array_distinct(ws)).cast(DoubleType) / size(ws).cast(DoubleType))
  }

  /** Per-document most-frequent word bigram and the fraction of the
    * document's characters its occurrences cover — Gopher's top-n-gram
    * repetition filter at n = 2. Adjacent pairs are formed ROW-LOCALLY by
    * zipping the token array with its own tail (plain collection
    * expressions, codegen'd — no per-word `lead` window, which would
    * shuffle and sort every exploded word row by document first), so the
    * first exchange in the plan is the map-side-combined (id, bigram)
    * count aggregate: only (id, bigram, count) triples ever shuffle,
    * never document bodies. Ties break to the lexicographically smallest
    * bigram so the argmax is deterministic cross-engine; documents with
    * fewer than two tokens drop out. `carry` names per-document columns
    * of `df` to pass through (avoids a re-scan + self-join for callers
    * that also need per-row stats).
    * Returns (idCol, carry..., top_bigram, top_bigram_n,
    * top_bigram_char_frac). */
  def topBigramStats(df: DataFrame, idCol: String, textCol: String,
      carry: Seq[String] = Nil): DataFrame = {
    val keys = col(idCol) +: carry.map(col)
    // stage the token array as an attribute first: `__ws` is referenced
    // three times below, and repeating the split() tree at each site
    // inflates plan size (optimizer/codegen time, not execution, is what
    // dominates these small-row queries)
    val tokenized = df.select(
      (keys :+ length(col(textCol)).as("__chars")) :+
        split(trim(col(textCol)), "\\s+").as("__ws"): _*)
    val ws = col("__ws")
    // zip tokens with their tail: pair i = (w(i), w(i+1)); the final
    // (w(n-1), null) pad drops via a codegen'd ROW filter after the
    // explode (an array-level filter(...) lambda would be an interpreted
    // HOF — the pitfall vec_dot exists to avoid)
    val pairs =
      arrays_zip(ws.as("a"), slice(ws, lit(2), greatest(size(ws) - 1, lit(0))).as("b"))
    val bigrams = tokenized
      .select((keys :+ col("__chars")) :+ explode(pairs).as("__p"): _*)
      .filter(col("__p.b").isNotNull)
      .select((keys :+ col("__chars")) :+
        concat_ws(" ", col("__p.a"), col("__p.b")).as("__bg"): _*)
    val counts = bigrams.groupBy((keys :+ col("__chars")) :+ col("__bg"): _*)
      .agg(count(lit(1)).as("__n"))
    // argmax as a min-struct AGGREGATE, not a ranking window (r16 opt):
    // min(struct(-n, bigram)) picks the highest count and breaks ties to
    // the lexicographically smallest bigram — the identical winner the
    // row_number window chose — but partial-aggregates MAP-SIDE, so the
    // second exchange carries one candidate per (doc, map task) instead
    // of every (doc, bigram, count) triple, and the per-doc sort the
    // window needed disappears entirely.
    val top = counts
      .groupBy((keys :+ col("__chars")): _*)
      .agg(min(struct((-col("__n")).as("nn"), col("__bg").as("bg"))).as("__t"))
    top.select(keys ++ Seq(col("__t.bg").as("top_bigram"),
        (-col("__t.nn")).as("top_bigram_n"),
        ((-col("__t.nn") * length(col("__t.bg"))).cast(DoubleType) /
          col("__chars").cast(DoubleType)).as("top_bigram_char_frac")): _*)
  }

  // ---- PII redaction ----------------------------------------------------

  /** RE2-compatible patterns (plain classes and quantifiers, no
    * lookaround), so an external engine replays the redaction verbatim. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhonePattern = "\\+[0-9]{7,15}"

  /** Scrub emails, IPv4 addresses, and international-format phone
    * numbers, in that order (emails first so their dotted domains are
    * never half-eaten by the IP rule). Deliberately recall-leaning, as
    * curation scrubbers are: an over-redacted token costs little next to
    * leaked PII. Pure per-row regexp_replace chain — codegen'd, zero
    * shuffles at any scale. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")

  /** Per-kind PII occurrence counts (pre-redaction). */
  def piiCounts(text: Column): Column = struct(
    regexp_count(text, lit(EmailPattern)).cast("long").as("n_email"),
    regexp_count(text, lit(Ipv4Pattern)).cast("long").as("n_ip"),
    regexp_count(text, lit(PhonePattern)).cast("long").as("n_phone"))

  // ---- unigram LM scoring (CCNet-style quality filtering) ---------------

  /** One row per non-empty whitespace token: `(__id, term)` — THE
    * tokenization every term-level aggregate in this module and
    * [[Retrieval]] builds on, kept in one place so tf/df/dl/model
    * counts can never drift apart (the oracle SQL twins all mirror the
    * same `string_split` + non-empty filter). */
  def explodedTokens(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("__id"), explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")

  /** Corpus unigram model `(term, c)`: collection frequency over
    * whitespace tokens. One explode + one map-side-combined count — only
    * (term, partial count) pairs shuffle, never document bodies. At
    * 100 TB the model is orders of magnitude smaller than the corpus
    * (vocabulary, not volume); it is the "train the LM on a reference
    * corpus" half of CCNet-style perplexity filtering (Wenzek et al.
    * 2019 use KenLM; a unigram model is the same lifecycle with an
    * exactly-replayable score). */
  def unigramModel(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("c"))

  /** Integer-exact per-document frequency statistics against a unigram
    * model — the gate-checkable core of LM-style quality filtering:
    * `n_tokens`, `n_oov` (tokens absent from the model), `n_rare`
    * (model count ≤ `rareMax`), `freq_sum` (sum of model counts, OOV
    * contributing 0). All integers, so the cross-engine oracle matches
    * bit-for-bit — the float log-prob path lives in [[unigramNll]] and
    * is pinned by in-JVM spec instead (ln is the one primitive whose
    * last ulp libms disagree on). The model join is left unhinted: AQE
    * broadcasts a small vocabulary at runtime, and an unboundedly large
    * one degrades to a shuffle join instead of an OOM (the T2 lesson).
    * Empty-token documents have no token rows and drop out. */
  def unigramFreqStats(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, rareMax: Long = 2L): DataFrame = {
    val toks = explodedTokens(docs, idCol, textCol)
    toks.join(model, Seq("term"), "left")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("c").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(when(col("c").isNotNull && col("c") <= rareMax, 1L)
          .otherwise(0L)).as("n_rare"),
        sum(coalesce(col("c"), lit(0L))).as("freq_sum"))
      .select(col("__id").as(idCol), col("n_tokens"), col("n_oov"),
        col("n_rare"), col("freq_sum"))
  }

  /** Per-document average negative log-likelihood under an add-α-smoothed
    * unigram model: p(w) = (c(w)+α) / (C + α(V+1)), unseen terms get
    * c = 0 — the float half of CCNet-style filtering (low avg-NLL ≈ low
    * perplexity ≈ fluent text; high ≈ gibberish/rare-token soup).
    *
    * Determinism: float addition is order-sensitive, so the per-document
    * sum is NOT a groupBy sum (partition order would make reruns
    * hash-unstable). Tokens keep their position through `posexplode`,
    * the scored list is `array_sort`ed back into document order, and the
    * sum is a sequential left fold (`aggregate` HOF) — bit-identical on
    * every run and every partitioning. The model plan fans into the
    * per-term/totals/unseen branches; exchange reuse executes the
    * vocabulary aggregate once, and a production pipeline passes a
    * PERSISTED model frame (the [[DedupIndex]] lifecycle) rather than
    * recomputing it per scoring query. Output: (idCol, n_tokens,
    * avg_nll). */
  def unigramNll(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, alpha: Double = 0.5): DataFrame = {
    val totals = model.agg(
      sum(col("c")).cast(DoubleType).as("__C"),
      count(lit(1)).cast(DoubleType).as("__V"))
    val lpModel = model.crossJoin(broadcast(totals))
      .select(col("term"),
        log((col("c").cast(DoubleType) + lit(alpha)) /
          (col("__C") + lit(alpha) * (col("__V") + lit(1.0)))).as("__lp"))
    val unseen = broadcast(totals.select(
      log(lit(alpha) /
        (col("__C") + lit(alpha) * (col("__V") + lit(1.0)))).as("__unseen")))
    val toks = docs.select(col(idCol).as("__id"),
        posexplode(split(col(textCol), " ")).as(Seq("__pos", "term")))
      .filter(col("term") =!= "")
    toks.join(lpModel, Seq("term"), "left")
      .crossJoin(unseen)
      .select(col("__id"), col("__pos"),
        coalesce(col("__lp"), col("__unseen")).as("__lp"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_tokens"),
        collect_list(struct(col("__pos"), col("__lp"))).as("__scored"))
      .select(col("__id").as(idCol), col("n_tokens"),
        (-aggregate(array_sort(col("__scored")), lit(0.0),
          (acc, x) => acc + x.getField("__lp")) /
          col("n_tokens").cast(DoubleType)).as("avg_nll"))
  }

  // ---- DSIR-style importance filtering ----------------------------------

  /** Data Selection via Importance Resampling (Xie et al. 2023,
    * arXiv:2302.03169) re-expressed with this module's exactly-replayable
    * unigram machinery: train a TARGET model on the wanted domain and a
    * BACKGROUND model on the general corpus, then keep candidates whose
    * tokens are relatively more probable under the target.
    *
    * The paper weights candidates by log(p_target(x)/p_raw(x)) over
    * hashed n-gram features and Gumbel-resamples; that float path is the
    * [[unigramNll]]-difference (spec-pinned, ln being the primitive whose
    * last ulp libms disagree on). The GATE decision here is the
    * integer-exact cross-multiplied comparison of per-document average
    * model frequency:
    *
    *   selected(x)  iff  t_sum(x) · C_bg  >  r_sum(x) · C_target
    *
    * where t_sum/r_sum are the sums of each model's counts over x's
    * tokens and C is total model mass — i.e. compare the frequency-ratio
    * estimates of p under the two unsmoothed models, OOV contributing 0
    * to both sides. Monotone in the paper's ratio for unigram features,
    * and replayable bit-for-bit by an external engine in 128-bit integer
    * arithmetic. Products run in DECIMAL(38,0): two longs can overflow
    * Long, and a silent wrap would flip selections.
    *
    * Scale: token rows join two vocabulary-sized models (AQE broadcasts
    * small ones, an unboundedly large one degrades to a shuffle join,
    * never an OOM); document bodies shuffle only once into the per-doc
    * aggregate; both models are persisted artifacts in the gate
    * lifecycle ([[PostingsIndex.ensureUnigramModel]]). */
  def importanceStats(docs: DataFrame, idCol: String, textCol: String,
      target: DataFrame, background: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val toks = explodedTokens(docs, idCol, textCol)
    val tgt = target.select(col("term"), col("c").as("__ct"))
    val bg = background.select(col("term"), col("c").as("__cr"))
    val masses =
      tgt.agg(sum("__ct").as("__Ct")).crossJoin(bg.agg(sum("__cr").as("__Cr")))
    toks.join(tgt, Seq("term"), "left")
      .join(bg, Seq("term"), "left")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("__ct"), lit(0L))).as("t_sum"),
        sum(coalesce(col("__cr"), lit(0L))).as("r_sum"))
      .crossJoin(broadcast(masses))
      .select(col("__id").as(idCol), col("n_tokens"), col("t_sum"), col("r_sum"),
        // an EMPTY model makes its mass NULL and the comparison NULL —
        // coalesce to false so `selected` is always 0/1 (the oracle's
        // CASE maps the NULL comparison to 0 the same way)
        coalesce(col("t_sum").cast(dec) * col("__Cr").cast(dec) >
          col("r_sum").cast(dec) * col("__Ct").cast(dec), lit(false))
          .cast("int").as("selected"))
  }
}
