package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Keyword retrieval over a document corpus: inverted-index postings and
  * Okapi BM25 ranking (Robertson & Zaragoza 2009, §3.3 — the standard
  * probabilistic relevance formula) — the "find training examples
  * mentioning X" primitive of corpus inspection, and the lexical half of
  * hybrid (BM25 + embedding) retrieval next to [[Similarity]].
  *
  * Scale shape: the postings frame IS the inverted index — one explode +
  * one map-side-combined (term, id) count; only (term, id, tf) triples
  * ever shuffle, never document bodies. At 100 TB postings are an
  * ingest-time artifact partitioned by term (same lifecycle as
  * [[DedupIndex]]/[[LshIndex]]); a query then prunes to its terms'
  * partitions, and every downstream frame (per-term document
  * frequencies, matched postings, scores) is proportional to the match
  * set, not the corpus. Document length and corpus stats derive FROM the
  * postings (sum/avg of tf), so there is exactly one tokenization pass
  * and no drift between tf and dl.
  */
object Retrieval {

  /** Inverted-index postings `(term, id, tf)` over whitespace tokens
    * (the shared [[TextAnalysis.explodedTokens]] tokenization). */
  def postings(df: DataFrame, idCol: String, textCol: String): DataFrame =
    TextAnalysis.explodedTokens(df, idCol, textCol)
      .select(col("__id").as("id"), col("term"))
      .groupBy("term", "id").agg(count(lit(1)).as("tf"))

  /** Per-document token length `(id, dl)`, derived from postings so tf
    * and dl can never disagree on tokenization. */
  def docLengths(post: DataFrame): DataFrame =
    post.groupBy("id").agg(sum("tf").as("dl"))

  /** BM25 top-`k` documents for a bag-of-terms query.
    *
    * Determinism: the per-document score is a sum of per-term floats, so
    * it is NOT a groupBy sum (partition order would make reruns
    * hash-unstable) — matched terms are collected, sorted, and folded
    * sequentially, the same ordered-fold contract as
    * [[TextAnalysis.unigramNll]]. Ties break on id. Top-k plans as
    * TakeOrderedAndProject, never a global sort. */
  def bm25TopK(corpus: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // `post` fans into the matched/df/dl branches of one plan; Spark's
    // exchange reuse executes the identical postings aggregate once per
    // run, and the 100 TB lifecycle reads a persisted postings artifact
    // here instead (see the object scaladoc) — so the fan-out is a
    // local-convenience shape, not a scale cost
    val post = postings(corpus, idCol, textCol)
    val dl = docLengths(post)
    val stats = dl.agg(count(lit(1)).cast(DoubleType).as("__N"),
      avg(col("dl").cast(DoubleType)).as("__avgdl"))
    val matched = post.filter(col("term").isin(queryTerms.distinct: _*))
    val dfs = matched.groupBy("term").agg(countDistinct("id").as("df"))
    val scored = matched.join(dfs, Seq("term")).join(dl, Seq("id"))
      .crossJoin(broadcast(stats))
      .select(col("id"), col("term"),
        (log(lit(1.0) + (col("__N") - col("df").cast(DoubleType) + lit(0.5)) /
            (col("df").cast(DoubleType) + lit(0.5))) *
          (col("tf").cast(DoubleType) * lit(k1 + 1.0)) /
          (col("tf").cast(DoubleType) +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast(DoubleType) /
              col("__avgdl")))).as("__s"))
    scored.groupBy("id")
      .agg(collect_list(struct(col("term"), col("__s"))).as("__parts"))
      .select(col("id").as(idCol),
        aggregate(array_sort(col("__parts")), lit(0.0),
          (acc, x) => acc + x.getField("__s")).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
