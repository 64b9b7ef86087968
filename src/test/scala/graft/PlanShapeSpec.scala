package graft

import org.apache.spark.sql.execution.SimpleMode

/** Plan-shape regression guards: the properties that make the read path
  * scale (pushdown, pruning, bounded broadcasts) asserted on the actual
  * physical plans, so a refactor cannot silently lose them. */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.explainString(SimpleMode)

  test("point lookup pushes the hash predicate into the parquet scan") {
    val p = plan("ev_q1_block_by_hash")
    assert(p.contains("PushedFilters") && p.contains("EqualTo(hash"))
  }

  test("projection query reads exactly one column") {
    val p = plan("q05_range_projection")
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint>"))
    assert(p.contains("GreaterThanOrEqual(o_orderkey"))
  }

  test("ranged fact-dim join broadcasts the pruned dim side with pushed range") {
    val p = plan("ev_j1_txs_from_by_number_range")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("GreaterThanOrEqual(number,1000)"))
    assert(p.contains("EqualTo(from,"))
  }

  test("topics matcher predicates evaluate in the scan stage, origin pushed") {
    val p = plan("ev_topics_range")
    assert(p.contains("EqualTo(origin,"))
    assert(p.contains("element_at"))
    assert(!p.contains("SortMergeJoin")) // the blocks side stays broadcast
  }

  test("unbounded dim side is NOT hint-broadcast (AQE decides at runtime)") {
    val p = plan("j8_events_dim_enrich")
    assert(p.contains("AdaptiveSparkPlan"))
  }

  test("top-K plans as TakeOrderedAndProject, never a global sort") {
    val p = plan("ev_t2_last50_events_from_contract")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("bm25 stats read the persisted postings: bucket-pruned, predicates pushed") {
    val p = plan("p_t7_bm25_stats")
    // the matched-postings scan reads the PERSISTED artifact with its
    // term-hash bucket predicate as a PARTITION filter — only the query
    // terms' buckets are listed/read — and the exact term + id bounds
    // pushed to parquet; no query-time tokenize/explode anywhere
    assert(p.contains("PartitionFilters: [__tb"), s"expected __tb bucket pruning:\n$p")
    assert(p.contains("In(term, [customer,merge,vector])"))
    assert(p.contains("LessThan(id,60)"))
    assert(!p.contains("Generate explode"),
      "postings must come from the artifact, not a query-time explode")
    assert(!p.contains("CartesianProduct"))
  }

  test("unigram-LM model join is unhinted and streams the token side") {
    val p = plan("p_t6_unigram_lm")
    // model (right) side builds, token stream probes; model counts are
    // map-side partial; no forced broadcast hint in the query code —
    // the small model broadcasts via stats/AQE, a huge one degrades to
    // a shuffle join instead of an OOM
    assert(p.contains("AdaptiveSparkPlan"))
    assert(p.contains("partial_count"))
    assert(p.contains("LeftOuter, BuildRight"))
  }

  test("mixture: rate frame broadcasts, bucket filter rides the join, narrow scan") {
    val p = plan("p_c6_mixture")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("pmod")) // keep/drop decided inside the join filter
    assert(p.contains("ReadSchema: struct<doc_id:bigint,source:string>"))
    // the per-stratum counts subtree is planned once: a single binding
    // window over the recipe-sized frame, not an agg + self-join
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("line dedup: rank-limit pushes map-side, doc bound reaches the scans") {
    val p = plan("p_d7_line_dedup")
    // WindowGroupLimit Partial prunes duplicate lines BEFORE the digest
    // shuffle — only one candidate row per (digest, partition) shuffles
    assert(p.contains("WindowGroupLimit"))
    assert(p.contains("LessThan(doc_id,300)"))
    assert(!p.contains("CartesianProduct"))
  }

  test("quantized ANN: one scan, 1-row broadcast, TakeOrdered — no shuffle join") {
    val p = plan("p_s5_quantized_topk")
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("IdentityBroadcastMode")) // the quantized query row
    assert(!p.contains("SortMergeJoin"))
  }

  test("IVF-SQ8 probed scan reads codes only, with dynamic bucket pruning") {
    val p = plan("p_s6_ivf_sq_topk")
    // the probed scan reads the persisted codes artifact: packed-byte
    // codes + scale, never the float embedding column — the 4× bandwidth
    // win SQ8 exists for (at 100 TB the probed buckets are the ONLY
    // bytes read)
    assert(p.contains("ReadSchema: struct<vec_id:bigint,codes:binary,scale:double>"),
      s"expected a packed-codes-only scan of the SQ8 artifact:\n$p")
    // the nprobe bucket selection prunes partitions DYNAMICALLY: only
    // the probed c_id directories are listed and read
    assert(p.contains("dynamicpruning"),
      s"expected dynamic partition pruning on c_id:\n$p")
    assert(!p.contains("SortMergeJoin"))
  }

  test("flat PQ ADC: scan reads only id + 8-byte codes, 1-row LUT broadcast, TakeOrdered") {
    val p = plan("p_s7_pq_adc_topk")
    // the corpus-side scan touches the PQ codes artifact only — never
    // the float embedding column; the ADC table rides a 1-row broadcast
    assert(p.contains("ReadSchema: struct<vec_id:bigint,codes:binary>"),
      s"expected a codes-only scan of the PQ artifact:\n$p")
    assert(p.contains("IdentityBroadcastMode"))
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("IVF-PQ probed scan reads codes only, with dynamic bucket pruning") {
    val p = plan("p_s8_ivf_pq_topk")
    assert(p.contains("ReadSchema: struct<vec_id:bigint,codes:binary>"),
      s"expected a codes-only scan of the IVF-PQ artifact:\n$p")
    assert(p.contains("dynamicpruning"),
      s"expected dynamic partition pruning on c_id:\n$p")
    assert(!p.contains("SortMergeJoin"))
  }

  test("PQ rerank: refine is a bounded broadcast semi-join, never a shuffle join") {
    val p = plan("p_s9_pq_rerank")
    // the r-row ADC candidate list broadcasts into a LeftSemi against
    // the float vectors — the only stage that touches floats
    assert(p.contains("LeftSemi"))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"))
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("PQ codes artifact is materially smaller than the SQ8 codes artifact") {
    // the structural 32×-vs-4× claim: 8 one-byte PQ codes per vector
    // persist in well under half the bytes of the 64 one-byte SQ8 codes
    // (both parquet-encoded, both carrying the same id column)
    def dirBytes(d: java.io.File): Long =
      if (d.isFile) d.length
      else Option(d.listFiles).map(_.map(dirBytes).sum).getOrElse(0L)
    val emb = Tables.embeddings(spark, sf0001)
    val pqRoot = java.nio.file.Files.createTempDirectory("graft-pqsz-").toString
    val sqRoot = java.nio.file.Files.createTempDirectory("graft-sqsz2-").toString
    graft.pipeline.PqIndex.ensure(spark, sf0001, emb, "embedding", "vec_id",
      artifactRootOverride = Some(pqRoot))
    graft.pipeline.SqIndex.ensure(spark, sf0001, emb, "embedding", "vec_id",
      artifactRootOverride = Some(sqRoot))
    // compare the per-vector codes artifacts only (the codebook is a
    // separate corpus-size-independent artifact under the same root)
    val pq = new java.io.File(pqRoot).listFiles
      .filter(_.getName.contains("_codes_")).map(dirBytes).sum
    val sq = dirBytes(new java.io.File(sqRoot))
    assert(pq > 0 && sq > 0)
    assert(pq < sq / 2, s"PQ artifact $pq B should be <1/2 of SQ8 $sq B")
  }

  test("SQ8 artifact is materially smaller than the float IVF assignment") {
    // the structural half of the bandwidth claim: int8 codes + one scale
    // per vector persist in well under half the bytes of the float32
    // assignment rows they derive from (parquet-encoded; the raw-array
    // ratio is 4×)
    def dirBytes(d: java.io.File): Long =
      if (d.isFile) d.length
      else Option(d.listFiles).map(_.map(dirBytes).sum).getOrElse(0L)
    val emb = Tables.embeddings(spark, sf0001)
    val sqRoot = java.nio.file.Files.createTempDirectory("graft-sqsz-").toString
    val ivfRoot = java.nio.file.Files.createTempDirectory("graft-ivfsz-").toString
    graft.pipeline.SqIndex.ensureIvf(spark, sf0001, emb, "embedding", "vec_id",
      artifactRootOverride = Some(sqRoot), ivfArtifactRootOverride = Some(ivfRoot))
    val sq = dirBytes(new java.io.File(sqRoot))
    val ivf = dirBytes(new java.io.File(ivfRoot))
    assert(sq > 0 && ivf > 0)
    assert(sq < ivf / 2, s"SQ8 artifact $sq B should be <1/2 of float IVF $ivf B")
  }

  test("repetition bigrams form row-locally: no exchange below the count aggregate") {
    val p = plan("p_t4_repetition")
    // the first shuffle must be the partial-agg'd bigram count, not a
    // per-word window sort: below the HashAggregate there is only
    // scan -> project/explode/filter (word rows never shuffle)
    // SimpleMode prints top-down (deepest last): the DEEPEST aggregate
    // (the map-side partial) must sit below every exchange
    assert(p.contains("HashAggregate") && p.contains("Exchange"))
    assert(p.lastIndexOf("HashAggregate") > p.lastIndexOf("Exchange"),
      s"expected no exchange below the partial bigram count:\n$p")
    assert(!p.contains("lead("), "bigram formation must not use a window")
  }

  test("ws fanout tags in one pass: no join, the final order is the only sort") {
    import graft.streaming.SubscriptionFilter._
    val packed = graft.fixtures.EvmFixtures.packedBlocks.take(20)
    import spark.implicits._
    val subs = Seq(
      "c1#block" -> parse("block").get,
      "c1#transaction" -> parse("transaction").get,
      "c2#event" -> parse("event").get)
    val p = graft.streaming.Publisher.deliveredMessages(packed.toDF(), subs)
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    // predicate tagging rides the projection over entity columns — a
    // regression to a message⋈deliveries join or a per-tier sort would
    // show up as Join/extra Sort nodes
    assert(!p.contains("Join"), p)
    assert(p.linesIterator.count(_.contains("Sort ")) <= 1, p)
  }

  test("anti-join gap detection has no distinct aggregation on the present side") {
    val p = plan("ev_j10_missing_blocks")
    assert(p.contains("LeftAnti"))
    assert(!p.contains("HashAggregate")) // the r1 .distinct() regression
  }

  test("packed explode-normalize is narrow: no exchange before the explode") {
    val p = plan("ev_s4_packed_tx_explode")
    // scan → generate (explode) → project; the only exchange is the
    // final oracle-determinism sort
    assert(p.contains("Generate explode"))
    assert(p.indexOf("Exchange") === p.lastIndexOf("Exchange"),
      s"expected exactly one exchange (the output sort):\n$p")
  }

  test("sessionization plans one key exchange shared by both window passes") {
    val p = plan("ev_w2_account_sessions")
    // lag + running sum + per-session agg must reuse ONE hash exchange on
    // the session key (plus broadcast for the dim join and the final
    // sort) — a second hashpartitioning(acct) would mean the window
    // passes re-shuffle
    val keyExchanges = "hashpartitioning\\(acct".r.findAllIn(p).length
    assert(keyExchanges === 1, s"expected one acct exchange, got $keyExchanges:\n$p")
  }

  test("substring dedup: one fingerprint exchange, no join-back, no text shuffle") {
    val p = plan("p_d8_substring_spans")
    // r16 shape: the per-fp site count and first-site election are
    // unbounded-frame WINDOW aggregates over ONE fingerprint-keyed
    // shuffle — the previous aggregate + join-back form re-shuffled (and
    // re-scanned) every site row a second time
    val fpExchanges = "hashpartitioning\\(__fp".r.findAllIn(p).length
    assert(fpExchanges === 1,
      s"expected exactly one fingerprint exchange, got $fpExchanges:\n$p")
    assert(!p.contains("Join"), s"site election must not join back:\n$p")
    assert(!p.contains("CartesianProduct"))
    // the shuffled keys are the fingerprint, never document text
    assert(!p.contains("hashpartitioning(text"), "text must never shuffle")
  }

  test("CMS probe is join-free: dense lookups folded into the top-k projection") {
    val p = plan("p_k1_cms_heavy_hitters")
    // r16 shape: the bounded depth×width sketch rides as dense literal
    // arrays, so the probe is element_at lookups in the projection —
    // a regression to per-depth joins (or worse, the posexplode →
    // re-aggregate form) shows up as Join/extra-aggregate nodes
    // the corpus BOOST is a legitimate 50-row nested-loop cross join;
    // the PROBE must not be a join of any keyed kind
    assert(!p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin") &&
      !p.contains("ShuffledHashJoin"), s"sketch probe must not join:\n$p")
    // (the dense element_at lookups live in TakeOrderedAndProject's
    // projection, which SimpleMode does not print — join-freedom plus
    // the take-order shape is the guarded invariant)
    assert(p.contains("TakeOrderedAndProject"), s"top-20 must take-order:\n$p")
    assert(p.contains("partial_count"),
      "the trigram exact-count aggregate must combine map-side")
    assert(!p.contains("CartesianProduct"))
  }

  test("bloom probe is join-free — dense lookups, never a shuffle join") {
    // r17: the bounded word table (≤ bits/32 rows by construction) rides
    // to the driver as a dense literal and the probe is k element_at
    // lookups in one projection — zero joins of ANY kind (the r16 form
    // broadcast-joined the words and re-aggregated per probe value)
    val p = plan("p_k4_bloom_membership")
    assert(!p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin") &&
      !p.contains("ShuffledHashJoin"), s"bloom probe must not join:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("batched IVF recall: probed buckets join by hash, windows per probe") {
    val p = plan("p_s11_ivf_recall")
    // probes × k-row codebook ride broadcast nested loops (tiny), but the
    // corpus-side candidate join must be a hash join on (c_id | keys) —
    // an unkeyed product against the corpus would be quadratic
    assert(p.contains("BroadcastHashJoin"), s"candidate join shape:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("no registered query ranks through an unbounded single-partition window") {
    // Class-wide guard for the termOverlapTopK scale-killer pattern: a
    // WindowExec whose partition spec is empty OR all-constant funnels
    // its ENTIRE input through one task, so every registered plan must
    // either genuinely partition its windows or bound the window's input
    // with a limit first (TakeOrderedAndProject / GlobalLimit ⇒ ≤ k rows
    // reach the window). The foldable check closes the partitionBy(lit)
    // loophole. Checked on the pre-AQE physical plan, where WindowExec
    // nodes are visible.
    import org.apache.spark.sql.execution.{SparkPlan, GlobalLimitExec,
      TakeOrderedAndProjectExec, CollectLimitExec}
    import org.apache.spark.sql.execution.window.WindowExec
    def boundedBelow(p: SparkPlan): Boolean =
      p.collectFirst {
        case _: GlobalLimitExec => ()
        case _: TakeOrderedAndProjectExec => ()
        case _: CollectLimitExec => ()
      }.isDefined
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      SparkEntry.queries(name)(spark, sf0001).queryExecution.sparkPlan.collect {
        case w: WindowExec if w.partitionSpec.forall(_.foldable) &&
            !boundedBelow(w.child) =>
          s"$name: ${w.simpleString(120)}"
      }
    }
    assert(offenders.isEmpty,
      s"unbounded single-partition windows:\n${offenders.mkString("\n")}")
  }

  test("image_meta stays inside whole-stage codegen") {
    // Assert on a sort-free projection: AQE defers codegen collapse for
    // exchange-bearing plans until execution, so the registry entry's own
    // pre-execution explain can't show the stage. The guard's point is
    // that the custom expression itself never forces a fallback — its
    // projection must carry the WholeStageCodegen `*(n)` marker.
    import org.apache.spark.sql.functions._
    val p = Tables.documents(spark, sf0001)
      .select(graft.pipeline.Multimodal.imageMeta(encode(col("text"), "UTF-8")).as("m"))
      .queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project"), s"expected codegen'd projection:\n$p")
  }

  test("image perceptual hashes stay inside whole-stage codegen") {
    // the decode -> box-grid -> hash chain is one codegen'd projection
    // over the scan, same guard as image_meta
    import org.apache.spark.sql.functions._
    val p = Tables.documents(spark, sf0001)
      .select(call_function("image_dhash",
          call_function("png_gen", col("doc_id"))).as("dh"),
        call_function("image_ahash",
          call_function("png_gen", col("doc_id"))).as("ah"))
      .queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project"), s"expected codegen'd projection:\n$p")
  }

  test("AAC decode and audio normalization stay inside whole-stage codegen") {
    // same guard as image_meta: the gen→decode chain is one codegen'd
    // projection over the scan — a fallback to interpreted eval (e.g. a
    // CodegenFallback expression) would drop the `*(n)` marker
    import org.apache.spark.sql.functions._
    val aac = Tables.documents(spark, sf0001)
      .select(call_function("aac_spectral",
        call_function("aac_gen", col("doc_id"))).as("m"))
      .queryExecution.executedPlan.toString
    assert(aac.contains("*(1) Project"), s"expected codegen'd projection:\n$aac")
    val norm = Tables.documents(spark, sf0001)
      .select(graft.pipeline.Multimodal.wavPcm(
        call_function("audio_to_wav",
          call_function("flac_gen_audio", col("doc_id")))).as("m"))
      .queryExecution.executedPlan.toString
    assert(norm.contains("*(1) Project"), s"expected codegen'd projection:\n$norm")
  }

  test("audio fingerprint stays inside whole-stage codegen") {
    // decode → channel fold → band sums → comparison bits is one
    // codegen'd projection over the scan, same guard as image_dhash
    import org.apache.spark.sql.functions._
    val p = Tables.documents(spark, sf0001)
      .select(call_function("audio_fingerprint",
        call_function("flac_gen_audio", col("doc_id"))).as("f"))
      .queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project"), s"expected codegen'd projection:\n$p")
  }

  test("audio hamming top-k: 1-row broadcast + TakeOrdered — no shuffle join") {
    // the s12 image-search shape on the audio fingerprint artifact:
    // the scan side reads 8-byte longs, the query side broadcasts one
    // row, ranking never globally sorts
    val p = plan("p_s13_audio_hamming_topk")
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("IdentityBroadcastMode")) // the 1-row query side
    assert(!p.contains("SortMergeJoin"))
  }

  test("video fingerprint stays inside whole-stage codegen") {
    // animated decode → compositing fold → temporal/spatial comparison
    // bits is one codegen'd projection over the scan, same guard as
    // image_dhash and audio_fingerprint
    import org.apache.spark.sql.functions._
    val p = Tables.documents(spark, sf0001)
      .select(call_function("video_fingerprint",
        call_function("gif_anim_gen", col("doc_id"),
          org.apache.spark.sql.functions.lit(1L),
          org.apache.spark.sql.functions.lit(0L))).as("f"))
      .queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project"), s"expected codegen'd projection:\n$p")
  }

  test("video hamming top-k: 1-row broadcast + TakeOrdered — no shuffle join") {
    // the same search shape on the video fingerprint artifact
    val p = plan("p_s14_video_hamming_topk")
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("IdentityBroadcastMode")) // the 1-row query side
    assert(!p.contains("SortMergeJoin"))
  }

  test("structural AV fingerprint stays inside whole-stage codegen") {
    // container walk → (len, dur) sequence → temporal/stream-order
    // comparison bits is one codegen'd projection over the scan
    import org.apache.spark.sql.functions._
    val p = Tables.documents(spark, sf0001)
      .select(call_function("av_struct_fingerprint",
        call_function("struct_av_gen", col("doc_id"), lit(1L), lit(1L),
          lit(0L))).as("f"))
      .queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project"), s"expected codegen'd projection:\n$p")
  }

  test("structural AV hamming top-k: 1-row broadcast + TakeOrdered — no shuffle join") {
    val p = plan("p_s15_struct_hamming_topk")
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("IdentityBroadcastMode")) // the 1-row query side
    assert(!p.contains("SortMergeJoin"))
  }
}
