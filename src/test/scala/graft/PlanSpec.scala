package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audit: the properties that matter at 100 TB, asserted so
  * a regression in plan shape fails CI, not just the benchmark.
  *
  *  - filters reach the parquet scan (PushedFilters);
  *  - scans read only referenced columns (nested pruning / ReadSchema);
  *  - dimension joins broadcast (no fact-table shuffle);
  *  - semi/anti semantics use the dedicated join types;
  *  - aggregates are partial+final (map-side combine);
  *  - top-k compiles to TakeOrderedAndProject (no global sort of N).
  */
class PlanSpec extends AnyFunSuite {

  private val spark = SparkSessionHelper.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, dir)
    val qe: QueryExecution = df.queryExecution
    qe.executedPlan.toString
  }

  test("q02: predicate pushdown and column pruning reach the scan") {
    val p = plan("q02_filter_pushdown")
    assert(p.contains("PushedFilters: ["), p.take(2000))
    assert(p.contains("GreaterThanOrEqual(l_shipdate") ||
      p.contains("GreaterThanOrEqual(l_quantity"), p.take(2000))
    // projection needs 5 columns; the scan schema must not exceed them
    val readSchema = "ReadSchema: struct<(.*?)>".r
      .findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(readSchema.split(",").length <= 5, readSchema)
  }

  test("q03/q04: dimension joins broadcast, no fact shuffle on the dims") {
    assert(plan("q03_broadcast_join_agg").contains("BroadcastHashJoin"))
    val p4 = plan("q04_multiway_join")
    assert(p4.contains("BroadcastHashJoin"))
    // nation + region + customer all broadcast -> at least 3 exchanges
    assert("BroadcastExchange".r.findAllIn(p4).size >= 3, p4.take(3000))
  }

  test("q05/q06: semi and anti join types are preserved") {
    assert(plan("q05_semi_join").contains("LeftSemi"))
    assert(plan("q06_anti_join").contains("LeftAnti"))
  }

  test("q01: aggregation is partial+final (map-side combine)") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_"), p.take(3000))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(3000))
  }

  test("q07: top-k compiles to TakeOrderedAndProject") {
    assert(plan("q07_topk").contains("TakeOrderedAndProject"))
  }

  test("dd_simhash_pairs: candidate generation is an equi hash join") {
    val p = plan("dd_simhash_pairs")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("sim_lsh_ann: bucket-local candidates, not a cross product") {
    val p = plan("sim_lsh_ann")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      p.take(3000))
  }

  test("dd_jaccard: banded candidates — no all-pairs or constant-key join") {
    // the served key is the membership expansion over the registry's
    // checkpointed rep pairs (r17); the banded-candidate claim lives
    // in the VERIFY the registry materializes — pin its lazy frame
    val p = operators.Dedup.jacRepVerifyFrame(spark, dir)
      ._2.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // the round-3 shape joined on a literal 0=0 column pair (k = kb);
    // every join must now key on real band/id columns
    assert(!p.contains("[k#") && !p.contains("[kb#"), p.take(3000))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p.take(3000))
    // ...and the served expansion itself stays equi-join-only
    val e = plan("dd_jaccard")
    assert(!e.contains("BroadcastNestedLoopJoin") &&
      !e.contains("CartesianProduct"), e.take(3000))
  }

  test("dd_containment: banded candidates — no all-pairs or constant-key join") {
    // r18: the served key is the membership expansion over the
    // registry's checkpointed rep pairs — the banded-candidate claim
    // lives in the verify; pin its lazy frame (the jac/cos idiom)
    val p = operators.Dedup.contRepVerifyFrame(spark, dir)
      ._2.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("[k#") && !p.contains("[kb#"), p.take(3000))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p.take(3000))
    // ...and the served expansion itself stays equi-join-only
    val e = plan("dd_containment")
    assert(!e.contains("BroadcastNestedLoopJoin") &&
      !e.contains("CartesianProduct"), e.take(3000))
  }

  test("dd_containment_smallside: inverted-index equi join, no cross product") {
    val p = operators.Dedup.contpRepVerifyFrame(spark, dir)
      ._2.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p.take(3000))
    val e = plan("dd_containment_smallside")
    assert(!e.contains("BroadcastNestedLoopJoin") &&
      !e.contains("CartesianProduct"), e.take(3000))
  }

  test("txt_budget_select: per-score table broadcasts, doc window is partitioned") {
    val p = plan("txt_budget_select")
    // the tiny cumulative table joins back via broadcast; the doc-side
    // running sum must be a (score, sub-bucket)-partitioned window, so
    // the only unpartitioned window ever sees aggregate rows
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(p.contains("Window"), p.take(3000))
    // skew guard: no window may partition on score_u alone — quality
    // scores concentrate on real corpora, so every per-doc window must
    // carry the bkt sub-key right after score_u in its partition spec
    assert("windowspecdefinition\\(score_u#\\d+L?, doc_id".r
      .findFirstIn(p).isEmpty, p.take(3000))
    assert("windowspecdefinition\\(score_u#\\d+L?, bkt#\\d+L?, doc_id"
      .r.findFirstIn(p).isDefined, p.take(3000))
  }

  test("txt_mixture / txt_shuffle_shard: rate table broadcast, windows per key") {
    val pm = plan("txt_mixture")
    assert(pm.contains("BroadcastHashJoin"), pm.take(3000))
    assert(!pm.contains("CartesianProduct"), pm.take(3000))
    val ps = plan("txt_shuffle_shard")
    // one narrow map then a shard-partitioned window — no join at all
    assert(!ps.contains("Join"), ps.take(3000))
    assert(ps.contains("Window"), ps.take(3000))
  }

  test("sim_range_search: query side broadcast against a single corpus scan") {
    val p = plan("sim_range_search")
    // the nested loop is the intended broadcast-queries shape: the 8
    // query vectors broadcast, the corpus streams through one scan and
    // never shuffles for the join (the only shuffle is the
    // presentation sort's range partitioning)
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(p.contains("BroadcastExchange"), p.take(3000))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      p.take(3000))
  }

  test("sim_ann_recall: probe candidates are a (band, bval) equi-join") {
    // the candidate generator alone — the production index probe — must
    // be pure equi-join: no nested loop, no cross product
    val pc = graft.operators.Similarity.annCandidates(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!pc.contains("BroadcastNestedLoopJoin"), pc.take(3000))
    assert(!pc.contains("CartesianProduct"), pc.take(3000))
    assert(pc.contains("BroadcastHashJoin") || pc.contains("SortMergeJoin") ||
      pc.contains("ShuffledHashJoin"), pc.take(3000))
    // the full report keeps exactly one nested loop: the labeled exact
    // ground-truth side (sim_topk_brute's broadcast-sample spec regime)
    val p = plan("sim_ann_recall")
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("sim_ivfpq_pretrained: serving plan scores against the stored index") {
    val p = plan("sim_ivfpq_pretrained")
    // model relations are local (broadcastable 4-row tables) and the PQ
    // code table is a lineage-truncated checkpoint — the Lloyd training
    // round (its posexplode centroid update) must NOT be in the plan
    assert(p.contains("LocalTableScan"), p.take(3000))
    assert(p.contains("Scan ExistingRDD"), p.take(3000))
    assert(!p.contains("posexplode"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // the ADC LUT is the broadcast-codebook kernel (O(1) generated code
    // in the cell count), not the literal per-centroid distance arrays
    // whose codegen grows O(K·dim)
    assert(p.contains("graft_dist_lut"), p.take(3000))
    assert(!p.contains("array_min"), p.take(3000))
  }

  test("sim_ivfpq_refine: refine joins stay training-free point lookups") {
    val p = plan("sim_ivfpq_refine")
    // same serving contract as pretrained — no Lloyd round (the
    // coarse assign's broadcast cross join against the 4-row centroid
    // relation is the one intentional non-equi join, as in every
    // k-means assignment), no unbroadcast cross product, and the
    // final ranking bounded by WindowGroupLimit rather than a full
    // per-query sort-and-filter
    assert(!p.contains("posexplode"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(p.contains("WindowGroupLimit"), p.take(3000))
  }

  test("dd_incremental: cross-boundary banding stays equi-join, no cross product") {
    val p = plan("dd_incremental")
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p.take(3000))
  }

  test("dd_span: semi join on gram keys, per-doc windows, no cross product") {
    val p = plan("dd_span")
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(p.contains("LeftSemi"), p.take(3000))
    // islands merge under a doc-partitioned window, never a global sort
    // of the gram table
    assert(p.contains("Window"), p.take(3000))
  }

  test("dd_span: the dup aggregate is partial+final (duplicate grams " +
      "collapse map-side before the wire) and the probe side pays no " +
      "shuffle of its own before the per-doc window") {
    // the two-branch (two-scan) shape is deliberate — see the ddSpan
    // comment: a shared k-exchange would shuffle the full-width gram
    // table where this shuffles only combined (k, min, max) triples
    operators.Dedup.withAqeOff(spark) {
      val p = SparkEntry.queries("dd_span")(spark, dir)
        .queryExecution.executedPlan.toString
      assert(p.contains("partial_min"), p.take(3000))
      // exactly two exchanges besides the presentation sort: the dup
      // aggregate's combined triples and the window's doc_id
      // repartition — the probe side streams into the semi join
      // (the trailing rangepartitioning is the presentation ORDER BY)
      val shuffles = "Exchange (hash|range)partitioning\\((\\w+)".r
        .findAllMatchIn(p).map(m => (m.group(1), m.group(2))).toList
      assert(shuffles.count(_ == ("hash", "k")) <= 1,
        shuffles.toString + p.take(2000))
      assert(shuffles.count(_ == ("hash", "doc_id")) == 1,
        shuffles.toString)
    }
  }

  test("st_funnel: all funnel joins are equi joins on the user key") {
    val p = plan("st_funnel")
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("txt_tfidf: df model and N are broadcast, no global sort before top-k") {
    val p = plan("txt_tfidf")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    // the rnk<=3 filter must run on a per-doc window partitioning, not
    // after a global ordering
    assert(p.contains("Window"), p.take(3000))
  }

  test("dd_simhash64: pigeonhole bands join as equi hash joins") {
    val p = plan("dd_simhash64")
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p.take(3000))
  }

  test("dd_embed pair re-score: fused graft_cos kernel with the raw " +
       "prefilter ahead of the rounded threshold") {
    // the kernel + prefilter live in the registry-materialized verify
    // (r17: the served key is the membership expansion) — pin the
    // verify's lazy frame
    val p = operators.Dedup.cosRepVerifyFrame(spark, dir)
      ._2.queryExecution.executedPlan.toString
    // one kernel call per pair instead of a dot/sqrt/divide tree, and
    // the primitive-compare prefilter that keeps BigDecimal rounding
    // off the hot path (provably looser than round(cs,6) >= 0.4)
    assert(p.contains("graft_cos("), p.take(3000))
    assert(p.contains("0.3999994"), p.take(3000))
  }

  test("dd_embed_cosine_lsh: banded candidates — no all-pairs or constant-key join") {
    val p = operators.Dedup.cosRepVerifyFrame(spark, dir)
      ._2.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("[k#") && !p.contains("[kb#"), p.take(3000))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p.take(3000))
    val e = plan("dd_embed_cosine_lsh")
    assert(!e.contains("BroadcastNestedLoopJoin") &&
      !e.contains("CartesianProduct"), e.take(3000))
  }

  test("q27: range join is bucketed into an equi join") {
    val p = plan("q27_range_join")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("txt_tokens: scan prunes to the referenced document columns") {
    val p = plan("txt_tokens")
    val readSchema = "ReadSchema: struct<(.*?)>".r
      .findFirstMatchIn(p).map(_.group(1)).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text"))
    assert(!readSchema.contains("source"), readSchema)
  }

  test("txt_pack / txt_stratified_sample: windows stay partitioned") {
    // packing/sampling must parallelize across shards/strata — a global
    // (unpartitioned) window would collapse to one partition
    for (q <- Seq("txt_pack", "txt_stratified_sample")) {
      val p = plan(q)
      assert(p.contains("Window"), q)
      assert(!p.contains("Exchange SinglePartition"), s"$q: ${p.take(2000)}")
    }
  }

  test("q30: KMV sketch aggregates partial+final (map-side combine)") {
    val p = plan("q30_kmv_distinct")
    assert(p.contains("partial_kmvdistinct"), p.take(3000))
    assert(p.contains("ObjectHashAggregate"), p.take(3000))
  }

  test("dd_cluster: propagation rounds are equi joins, no cross product") {
    val p = plan("dd_cluster")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("txt_decontaminate: eval grams broadcast, no corpus cross product") {
    val p = plan("txt_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("sim_ivfpq: ADC scoring is an equi join, training stays out of plan") {
    val p = plan("sim_ivfpq")
    // training runs as staged jobs inside the query CALL (literal-argmin
    // passes over a checkpointed base); the returned plan is the ADC
    // serving join — cell equi-join into the checkpointed code table,
    // no Lloyd round (posexplode), no cross product
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p.take(3000))
    assert(p.contains("Scan ExistingRDD"), p.take(3000))
    assert(!p.contains("posexplode"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("mm_shard_pack: packing window stays partitioned") {
    val p = plan("mm_shard_pack")
    assert(p.contains("Window"), p.take(2000))
    assert(!p.contains("Exchange SinglePartition"), p.take(2000))
  }

  test("st_anomaly_hours: stats join is not a cross product") {
    val p = plan("st_anomaly_hours")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("txt_ccnet_buckets: tertile window stays partitioned by lang") {
    val p = plan("txt_ccnet_buckets")
    assert(p.contains("Window"), p.take(2000))
    assert(!p.contains("Exchange SinglePartition"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("txt_novelty: attribution is two equi aggregations, no cross join") {
    val p = plan("txt_novelty")
    // gram relation is cached (feeds owner + totals without recompute)
    assert(p.contains("InMemoryTableScan"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("dd_source_overlap: source lookups are equi-joins with map-side agg") {
    val p = plan("dd_source_overlap")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    // the (source_a, source_b) count must partial-aggregate before its
    // exchange (the pair list is large, the matrix is |sources|^2)
    assert(p.contains("partial_count") || p.contains("partial"), p.take(3000))
  }

  test("q35: WindowTopKRewrite retargets the plain idiom onto TopKPerKey") {
    val p = plan("q35_topk_rewrite")
    assert(p.contains("TopKPerKey 2"), p.take(3000))
    // the residual Window re-ranks only the <=k survivors per key; the
    // full-input sort-based filter path must be gone
    assert(p.contains("Window"), p.take(3000))
  }

  test("q29: custom TopKPerKeyExec appears with exactly one exchange") {
    val p = plan("q29_topk_per_key")
    assert(p.contains("TopKPerKey 3"), p.take(3000))
    // one hash exchange for the key clustering (plus the final sort's
    // range exchange) — and crucially NO per-partition Window sort
    assert(!p.contains("Window"), p.take(3000))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      p.take(3000))
  }

  test("dd_incremental_bloom: Bloom gate below the exact join, corpus " +
      "folds map-side") {
    // The 100 TB incremental pattern: a refactor that silently reverts
    // to the full corpus equi-join would drop the probe-side
    // graft_bloom_contains filter and the one-row Bloom partial-merge
    // aggregate from the plan — pinned here so it can't.
    val p = plan("dd_incremental_bloom")
    // probe side filters on the broadcast Bloom BEFORE the exact join
    assert(p.contains("graft_bloom_contains"), p.take(4000))
    // the corpus digests fold into the filter with a map-side partial
    // merge (partial_... aggregate), one row out; the fold lives in
    // the scalar subquery, which executedPlan.toString omits — read
    // the formatted explain, which prints the subquery plans too
    val full = SparkEntry.queries("dd_incremental_bloom")(spark, dir)
      .queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(full.toLowerCase.contains("partial_graft_bloom_agg"),
      full.takeRight(4000))
    // candidate generation stays banded equi-join — no cross product
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(4000))
  }

  test("dd_containment_smallside: probe join parallelism is pinned " +
      "against AQE coalescing") {
    // The probe relation's map output is tiny (a rarest-first prefix
    // of each doc's hashes) but the inverted-index join's OUTPUT
    // explodes; AQE's input-sized coalescer once folded that stage to
    // 2 tasks and serialized ~6 CPU-s of fan-out (r16 ProfileOne).
    // The fix is a user-NUMBERED repartition on the probe side, which
    // the coalescer is contractually exempt from — pinned here as the
    // REPARTITION_BY_NUM marker on an exchange over the probe key.
    // (r18: the hint lives in the registry-materialized verify — pin
    // its lazy frame; the served key is the membership expansion.)
    val p = operators.Dedup.contpRepVerifyFrame(spark, dir)
      ._2.queryExecution.executedPlan.toString
    assert(p.contains("REPARTITION_BY_NUM"), p.take(4000))
    // and the explosive join itself stays an equi (shuffled hash /
    // sort-merge) join, never a cross product
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(4000))
  }

  test("dd_cluster_fold_stored: the store probe join is an equi-join " +
      "on (band, bk), never a nested-loop fallback") {
    // The 100 TB claim for the persistent store is that a fold costs
    // bands(new) probing the STORED index — an equi-join a deployment
    // co-locates by bucketing bands/ on (band, bk). Pin the physical
    // shape of the verified-edge frame (exposed lazily by
    // clusterStoreEdgeFrame, the exact frame the fold checkpoints)
    // under the same AQE-off planning scope the fold executes under.
    val store = operators.Dedup.ensureClusterStore(spark, dir)
    val (_, edges) = operators.Dedup.clusterStoreEdgeFrame(
      spark, dir, store, "cast(substring(source, 4) as int) >= 10")
    val p = operators.Dedup.withAqeOff(spark)(
      edges.queryExecution.executedPlan.toString)
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(4000))
    // both candidate branches join on the two-part band key
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[band".r
      .findAllIn(p).size >= 2, p.take(4000))
    // and the stored index is scanned from parquet, not recomputed
    assert(p.contains("graft_cstore_") || p.toLowerCase.contains("parquet"),
      p.take(4000))
  }

  test("dd_embed_cluster_fold_stored: the store probe join is an " +
      "equi-join on (band, bkt), never a nested-loop fallback") {
    // Same 100 TB claim as the jaccard-side fold: a vector increment
    // costs bands(new) probing the STORED RH-LSH index — equi-join on
    // (band, bkt) — plus verify joins on vec_id against stored vecs.
    val store = operators.Dedup.ensureEmbedStore(spark, dir)
    val (_, edges) = operators.Dedup.embedStoreEdgeFrame(spark, dir, store)
    val p = operators.Dedup.withAqeOff(spark)(
      edges.queryExecution.executedPlan.toString)
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(4000))
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[band".r
      .findAllIn(p).size >= 2, p.take(4000))
  }

  test("storeNearDupStream: the text serve path is equi-joins only — " +
      "(band, bk) into the stored index, owner_id into stored sigs") {
    // The streaming serve claim: per-document work is 8 band keys
    // probing bands/ plus ONE verify per distinct candidate against
    // sigs/ — both co-locatable equi-joins at deployment. Pin the
    // physical shape on a batch shadow of the same pipeline (the
    // stream-static joins plan identically; EliminateEventTimeWatermark
    // drops the watermark node in batch).
    val store = operators.Dedup.ensureClusterStore(spark, dir)
    val docs = Engine.table(spark, dir, "documents")
      .selectExpr("doc_id", "(doc_id + 1) * 1000000000L AS ts", "text")
    val p = streaming.Streams.storeNearDupStream(docs, store)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(4000))
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[band".r
      .findAllIn(p).nonEmpty, p.take(4000))
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[owner_id".r
      .findAllIn(p).nonEmpty, p.take(4000))
  }

  test("storePhashStream: the media serve path is equi-joins only — " +
      "(band, bv) into the stored index, owner_id into stored sigs — " +
      "and the payload never reaches a join") {
    val store = operators.Multimodal.ensurePhashStore(spark, dir)
    val docs = Engine.table(spark, dir, "documents")
      .selectExpr("doc_id", "(doc_id + 1) * 1000000000L AS ts", "text")
    val p = streaming.Streams.storePhashStream(docs, store)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(4000))
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[band".r
      .findAllIn(p).nonEmpty, p.take(4000))
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[owner_id".r
      .findAllIn(p).nonEmpty, p.take(4000))
    // payloads never shuffle: no join operator's key/output list may
    // carry the text column (it dies in the signature projection)
    "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)[^\\n]*".r
      .findAllIn(p).foreach(j => assert(!j.contains("text"), j))
  }

  /** r19: the bucketed store layout's whole point — the branch of a
    * probe join that reads a SEALED store relation must contain a
    * bucketed scan and NO exchange of any kind (its reported
    * HashPartitioning satisfies the join's distribution). Broadcast
    * is disabled for the audit: at fixture scale Spark would
    * broadcast the tiny store side, which is exactly the shape that
    * does NOT survive a 100 TB store.
    */
  private def assertStoreSideExchangeFree(
      p: org.apache.spark.sql.execution.SparkPlan,
      relPathPart: String): Unit = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    // A store relation may be served either directly from its bucketed
    // parquet scan or through a cache entry another consumer populated
    // (r22: the streaming serve paths cache their static sides, and the
    // session cache manager substitutes InMemoryRelation into every
    // later plan over the same table). Both count — the cached
    // relation preserves the bucketed scan's reported partitioning,
    // which is what the exchange-free claim rests on — so the matcher
    // looks THROUGH InMemoryTableScan into the cached plan.
    def fileScans(c: SparkPlan): Seq[FileSourceScanExec] =
      c.collect {
        case f: FileSourceScanExec if f.relation.location.rootPaths
          .exists(_.toString.contains(relPathPart)) => f
      }
    def storeScans(c: SparkPlan): Seq[FileSourceScanExec] =
      c.collect {
        case f: FileSourceScanExec if f.relation.location.rootPaths
          .exists(_.toString.contains(relPathPart)) => Seq(f)
        case m: InMemoryTableScanExec => fileScans(m.relation.cachedPlan)
      }.flatten
    val joins = p.collect {
      case j: BaseJoinExec if j.children.exists(storeScans(_).nonEmpty) => j
    }
    assert(joins.nonEmpty,
      s"no join reads $relPathPart:\n${p.toString.take(4000)}")
    // the INNERMOST such join is the probe: its store-side child must
    // be exchange-free scan→filter→project only (exchanges INSIDE a
    // cached plan would be a one-time cache-build cost, but the
    // bucketed relations are cached as bare scans — assert that too)
    val probe = joins.last
    val storeSide = probe.children.filter(storeScans(_).nonEmpty)
    assert(storeSide.nonEmpty)
    storeSide.foreach { c =>
      assert(c.collect { case e: Exchange => e }.isEmpty,
        s"the $relPathPart side of the probe join shuffles:\n" +
          c.toString.take(3000))
      def cachedPlans(x: SparkPlan): Seq[SparkPlan] =
        x.collect { case m: InMemoryTableScanExec => m.relation.cachedPlan }
      cachedPlans(c).foreach { cp =>
        assert(cp.collect { case e: Exchange => e }.isEmpty,
          s"the cached $relPathPart relation was built over a " +
            s"shuffle:\n${cp.toString.take(3000)}")
      }
      assert(storeScans(c).forall(_.bucketedScan),
        s"the $relPathPart scan is not bucketed:\n${c.toString.take(3000)}")
    }
  }

  private def withNoBroadcast[T](body: => T): T = {
    val k = "spark.sql.autoBroadcastJoinThreshold"
    val was = spark.conf.get(k)
    spark.conf.set(k, "-1")
    try body finally spark.conf.set(k, was)
  }

  test("dd_cluster_fold_stored probe: the sealed store's bands side " +
      "is a bucketed scan with NO exchange — the fold probe is " +
      "co-located by layout, not by a per-fold shuffle") {
    val store = operators.Dedup.ensureClusterStore(spark, dir)
    withNoBroadcast {
      operators.Dedup.withAqeOff(spark) {
        val (_, edges) = operators.Dedup.clusterStoreEdgeFrame(
          spark, dir, store, "cast(substring(source, 4) as int) >= 10")
        assertStoreSideExchangeFree(
          edges.queryExecution.executedPlan, "/bands")
      }
    }
  }

  test("dd_cluster_fold_stored verify: the sealed store's SIGS side " +
      "is a bucketed scan with NO exchange — the r22 side-split; " +
      "before it, stored signature arrays re-shuffled through the " +
      "allsigs union on every fold") {
    val store = operators.Dedup.ensureClusterStore(spark, dir)
    withNoBroadcast {
      operators.Dedup.withAqeOff(spark) {
        val (_, edges) = operators.Dedup.clusterStoreEdgeFrame(
          spark, dir, store, "cast(substring(source, 4) as int) >= 10")
        assertStoreSideExchangeFree(
          edges.queryExecution.executedPlan, "/sigs")
      }
    }
  }

  test("dd_embed_cluster_fold_stored verify: the sealed store's VECS " +
      "side is a bucketed scan with NO exchange — the r22 side-split " +
      "for the embedding payloads") {
    val store = operators.Dedup.ensureEmbedStore(spark, dir)
    withNoBroadcast {
      operators.Dedup.withAqeOff(spark) {
        val (_, edges) = operators.Dedup.embedStoreEdgeFrame(
          spark, dir, store)
        assertStoreSideExchangeFree(
          edges.queryExecution.executedPlan, "/vecs")
      }
    }
  }

  test("storeDedupStream probe: the sealed store's bands AND vecs " +
      "sides are bucketed scans with NO exchange — each micro-batch " +
      "shuffles only the arriving vectors, never the corpus-scale " +
      "index or the full-width verify relation") {
    val store = operators.Dedup.ensureEmbedStore(spark, dir)
    val vecs = Engine.table(spark, dir, "embeddings")
      .selectExpr("vec_id", "(vec_id + 1) * 1000000000L AS ts",
        "embedding")
    withNoBroadcast {
      operators.Dedup.withAqeOff(spark) {
        val p = streaming.Streams.storeDedupStream(vecs, store)
          .queryExecution.executedPlan
        assertStoreSideExchangeFree(p, "/bands")
        // the verify join's static side (vecs, bucketed by vec_id and
        // renamed owner_id — alias-aware partitioning) is also
        // exchange-free: only the band-surviving candidates move
        assertStoreSideExchangeFree(p, "/vecs")
      }
    }
  }

  test("storeNearDupStream probe: the sealed cluster store's bands " +
      "and sigs sides are bucketed scans with NO exchange") {
    val store = operators.Dedup.ensureClusterStore(spark, dir)
    val docs = Engine.table(spark, dir, "documents")
      .selectExpr("doc_id", "(doc_id + 1) * 1000000000L AS ts", "text")
    withNoBroadcast {
      operators.Dedup.withAqeOff(spark) {
        val p = streaming.Streams.storeNearDupStream(docs, store)
          .queryExecution.executedPlan
        assertStoreSideExchangeFree(p, "/bands")
        assertStoreSideExchangeFree(p, "/sigs")
      }
    }
  }

  test("storePhashStream probe: the sealed phash store's bands and " +
      "sigs sides are bucketed scans with NO exchange") {
    val store = operators.Multimodal.ensurePhashStore(spark, dir)
    val docs = Engine.table(spark, dir, "documents")
      .selectExpr("doc_id", "(doc_id + 1) * 1000000000L AS ts", "text")
    withNoBroadcast {
      operators.Dedup.withAqeOff(spark) {
        val p = streaming.Streams.storePhashStream(docs, store)
          .queryExecution.executedPlan
        assertStoreSideExchangeFree(p, "/bands")
        assertStoreSideExchangeFree(p, "/sigs")
      }
    }
  }

  test("annServeCandidates: ANN serving delivers candidates by ONE " +
      "cell equi-join against the stored code table") {
    // The retrieval serve claim: per-query work is nprobe cell slices
    // of the code table — one equi-join a deployment co-locates by
    // bucketing codes/ on cell — never a corpus scan per query.
    val store = operators.Similarity.ensureIvfPqStore(spark, dir)
    val model = operators.Similarity.IvfPqStore.load(spark, store)
    val queries = Engine.table(spark, dir, "embeddings")
      .where(s"vec_id >= ${operators.Similarity.IvfQ}")
      .selectExpr("vec_id", "cast(1 as bigint) AS ts", "embedding")
    val p = operators.Similarity.annServeCandidates(queries, model)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(4000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(4000))
    assert("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[cell".r
      .findAllIn(p).nonEmpty, p.take(4000))
  }
}
