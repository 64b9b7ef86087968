package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DecimalType, IntegerType, LongType, ShortType}

/** Connected-component resolution over near-duplicate pair output — the
  * step that turns "A≈B, B≈C" edges into dedup clusters with one
  * canonical keeper each. Pair emission ([[Dedup.minHashNearDupPairs]],
  * [[Dedup.simHashNearDupPairsFromFingerprints]],
  * [[TextAnalysis.rollingOverlapPairs]]) is only half of corpus dedup:
  * without transitive closure, dropping "the second member of every pair"
  * both over-deletes (B and C each lose against A independently — fine)
  * and under-deletes (B≈C pairs where neither compares against the
  * already-kept A survive as a duplicate pair). The component
  * representative is the well-defined keeper.
  *
  * Algorithm: alternating min-label propagation and pointer doubling
  * (path halving), the DataFrame form of the classic MapReduce
  * connected-components recipe (Kiveris et al., "Connected Components in
  * MapReduce and Beyond" — large-star/small-star; plain propagation alone
  * needs O(diameter) rounds, the doubling step cuts chains in half each
  * round so convergence is O(log diameter)). Each round is bounded work:
  * one shuffle join of the edge list against the label frame, one
  * map-side-combined min-aggregate, and one self-join for the shortcut —
  * never an all-pairs product, and the label frame never exceeds one row
  * per node that appears in an edge (docs with no near-dup pair never
  * enter the graph at all, which at 100 TB is almost all of them: the
  * graph this runs on is the PAIR set, orders of magnitude smaller than
  * the corpus).
  *
  * Driver-side control flow is intentional and scale-safe: the loop runs
  * O(log diameter) times (dedup clusters are shallow — a handful of
  * rounds), each iteration materializes via a checkpoint so the plan
  * stays O(1) deep instead of growing a 2^rounds lineage, and
  * convergence is decided by one scalar aggregate per round (the sum
  * of labels, exact decimal so 63-bit ids cannot wrap), which is strictly
  * monotone decreasing until the fixpoint. `checkpointDir` picks the
  * materialization: on a real cluster pass a reliable (HDFS/object-store)
  * directory and each round commits through `df.checkpoint`; unset, the
  * local[] default uses executor-memory `localCheckpoint` — same shape,
  * it is a CONFIG choice, not a code edit.
  */
object Components {

  /** Connected components of the undirected graph given by an edge list:
    * one row per node, `(id, rep)`, where `rep` is the smallest node id
    * in the node's component. Edge direction and duplicate edges are
    * irrelevant (the edge list is symmetrized and the algebra is min).
    *
    * Throws if `maxIter` rounds pass without reaching the fixpoint:
    * partially-merged labels would silently under-deduplicate downstream
    * ([[dedupByPairs]] would keep documents of an unresolved cluster).
    * Pointer doubling converges in O(log diameter), so the default bound
    * covers any real graph; hitting it means the bound was mis-set. */
  def connectedComponents(edges: DataFrame, aCol: String = "a_id",
      bCol: String = "b_id", maxIter: Int = 50,
      checkpointDir: Option[String] = None): DataFrame = {
    // fail loudly on non-integral id columns: a silent cast of e.g.
    // string digests would null every edge and "resolve" zero clusters
    for (c <- Seq(aCol, bCol)) {
      val dt = edges.schema(c).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"edge column '$c' must be an integral id type, got ${dt.catalogString}")
    }
    // reliable checkpointing when a dir is given (cluster mode); RDD
    // checkpoints go through the SparkContext-level dir
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    def materialize(df: DataFrame, eager: Boolean): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(eager)
      else df.localCheckpoint(eager)

    val sym = materialize(edges
      .select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull), eager = true)
    val both = sym.union(sym.select(col("v").as("u"), col("u").as("v")))

    // initial label = min(id, min neighbour): the first propagation
    // round folded into initialization (every node appears as `u` in the
    // symmetrized list, so this is also the node enumeration)
    var labels = materialize(both.groupBy(col("u"))
      .agg(min(col("v")).as("__mn"))
      .select(col("u").as("id"), least(col("u"), col("__mn")).as("rep")),
      eager = false)

    // Exact label mass: strictly decreases every non-fixpoint round.
    def mass(l: DataFrame): java.math.BigDecimal = {
      val d = l.agg(sum(col("rep").cast(DecimalType(38, 0)))).head.getDecimal(0)
      if (d == null) java.math.BigDecimal.ZERO else d
    }

    var prev = mass(labels)
    var done = prev.signum() == 0 && labels.isEmpty
    var iter = 0
    while (!done && iter < maxIter) {
      // 1. min over self and neighbours: labels reach one hop per round…
      val viaEdges = both.join(labels, col("v") === col("id"))
        .select(col("u").as("id"), col("rep"))
      val m = labels.union(viaEdges)
        .groupBy("id").agg(min("rep").as("rep"))
      // 2. …then pointer doubling halves every chain: rep ← rep(rep).
      //    rep values are always node ids (inductively: min of ids), so
      //    the lookup side always matches; coalesce is belt-and-braces.
      // lazy checkpoint: the convergence aggregate right below is the
      // single job that materializes the round (eager + mass was two)
      val next = materialize(m
        .join(m.select(col("id").as("__rid"), col("rep").as("__rrep")),
          col("rep") === col("__rid"), "left")
        .select(col("id"), coalesce(col("__rrep"), col("rep")).as("rep")),
        eager = false)
      val cur = mass(next)
      done = cur.compareTo(prev) == 0
      prev = cur
      labels = next
      iter += 1
    }
    if (!done) throw new IllegalStateException(
      s"connected components did not converge within $maxIter rounds " +
        "(label mass still decreasing); raise maxIter — returning " +
        "partially-merged labels would silently under-deduplicate")
    labels
  }

  /** Dedup clusters from near-dup pairs: `(doc_id, rep_id)` for every
    * document that belongs to a cluster (`rep_id` = smallest member).
    * Documents with no pair membership are absent — they are their own
    * trivial cluster and need no row. */
  def nearDupClusters(pairs: DataFrame, aCol: String = "a_id",
      bCol: String = "b_id",
      checkpointDir: Option[String] = None): DataFrame =
    connectedComponents(pairs, aCol, bCol, checkpointDir = checkpointDir)
      .select(col("id").as("doc_id"), col("rep").as("rep_id"))

  /** Keep one document per near-dup cluster: drops every clustered doc
    * except its component-minimum representative; docs outside any pair
    * pass through untouched. The victim list is one anti-join key column
    * — no hint, AQE broadcasts it when (as is typical) it is small
    * relative to the corpus; the corpus text never shuffles. */
  def dedupByPairs(corpus: DataFrame, pairs: DataFrame, idCol: String,
      aCol: String = "a_id", bCol: String = "b_id",
      checkpointDir: Option[String] = None): DataFrame = {
    val victims = nearDupClusters(pairs, aCol, bCol, checkpointDir)
      .filter(col("doc_id") =!= col("rep_id"))
      .select(col("doc_id").as("__victim"))
    corpus.join(victims, corpus(idCol) === col("__victim"), "left_anti")
  }
}
