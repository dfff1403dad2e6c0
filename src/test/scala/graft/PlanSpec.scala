package graft

import org.apache.spark.sql.DataFrame

/** Physical-plan assertions: the optimizations the engine relies on at
  * scale must actually appear in the executed plan — filter pushdown,
  * column pruning at the scan, broadcast joins for dimension/digest
  * tables, map-side partial aggregation. Guard rails against silent
  * plan regressions (SURVEY §4, BASELINE scale gate).
  */
class PlanSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  def executed(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  /** The operator's own plan shape, isolated from the INPUT-layer scan
    * fan-out (since round 9 Tables.fanOut is opt-in at kernel-heavy
    * call sites, not global — round-8 verdict #1): shuffle-free /
    * codegen-span contracts are about what the OPERATOR contributes, so
    * gates that wire the fan-out assert with the policy off. Fan-out
    * behavior itself is pinned by the dedicated tests at the bottom of
    * this suite.
    */
  def withoutFanout[A](body: => A): A = {
    spark.conf.set("spark.graft.scan.fanout", "false")
    try body finally spark.conf.set("spark.graft.scan.fanout", "true")
  }
  def executedNoFanout(name: String): String = withoutFanout(executed(name))

  test("p2_filter_in: predicates reach the parquet scan, columns pruned") {
    val p = executed("p2_filter_in")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderpriority), In(o_orderstatus"))
    // only the 4 touched columns are read, not the 6-column table
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint," +
      "o_orderstatus:string,o_orderpriority:string>"))
  }

  test("j1_anti_blacklist: broadcast hash anti-join, build right") {
    val p = executed("j1_anti_blacklist")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("LeftAnti"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("j2_inner_join: dimension side broadcast, no sort-merge") {
    val p = executed("j2_inner_join")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q1_agg: partial aggregation before the exchange (map-side combine)") {
    val p = executed("q1_agg")
    assert(p.contains("partial_sum") || p.contains("partial_count"))
  }

  test("llr_pairs: marginal joins broadcast; scan reads only join/agg columns") {
    val p = executed("llr_pairs")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint>"))
  }

  test("t_token_stats: documents scan prunes to doc_id + text") {
    val p = executed("t_token_stats")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"))
  }

  test("explode_tokens: generator runs after column pruning") {
    val p = executed("explode_tokens")
    assert(p.contains("Generate explode"))
    assert(p.contains("ReadSchema: struct<text:string>"))
  }

  test("significant pairs plan contains no cartesian product") {
    val p = executed("significant_pairs")
    assert(!p.contains("CartesianProduct"))
  }

  test("j10_asof_join: one shuffle, no join, native single-pass carry") {
    val p = executed("j10_asof_join")
    assert(!p.contains("Join"), s"as-of must not plan a join:\n$p")
    // since r6 the carry is the CarryForward exec — same exchange+sort,
    // no WindowExec group buffering
    assert(p.contains("CarryForward ["), s"native carry missing:\n$p")
    assert(!p.contains("Window ["), s"window buffering must be gone:\n$p")
    // union of the two sides shuffles once on the key
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1)
  }

  test("e_ivf_topk: probe side broadcast, corpus never shuffled for the join") {
    val p = executed("e_ivf_topk")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("j9_salted_join: still a hash join, no cartesian from the salt") {
    val p = executed("j9_salted_join")
    assert(p.contains("HashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("shingle expression runs inside whole-stage codegen (no fallback hop)") {
    import org.apache.spark.sql.functions.col
    // fan-out off: the input exchange makes the final plan adaptive with
    // the codegen span inside an opaque query stage, which this tree
    // traversal cannot reach — the contract is about the expression
    val df = withoutFanout(graft.Tables.documents(spark, dir))
      .select(graft.operators.Dedup.shingles(col("text"), 3, distinct = true)
        .as("sh"))
    df.collect()
    val plan = df.queryExecution.executedPlan
    val inSpan = plan
      .collect { case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w }
      .exists(_.collect {
        case n if n.expressions.exists(
          _.exists(_.isInstanceOf[graft.functions.NGramShingles])) => n
      }.nonEmpty)
    assert(inSpan, s"NGramShingles not inside a codegen span:\n$plan")
  }

  test("hash split / stratified / mixture sampling: shuffle-free scans") {
    for (q <- Seq("s_hash_split", "s_stratified_hash", "s_mixture_upsample")) {
      val p = executedNoFanout(q)
      assert(!p.contains("Exchange"), s"$q plans a shuffle:\n$p")
    }
    assert(executedNoFanout("s_mixture_upsample").contains("Generate"))
  }

  test("incremental near-dup against a persisted index: no corpus shingle recompute") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft-sigidx").toString
    graft.operators.Dedup.buildSignatureIndex(docs).write(tmp)
    val idx = graft.operators.SignatureIndex.read(spark, tmp)
    val batch = docs.where(col("doc_id") % 7 === 0)
      .select((col("doc_id") + lit(5000000L)).as("doc_id"), col("text"))
    val lp = graft.operators.Dedup
      .nearDuplicatesAgainst(batch, idx, "text", 0.9)
      .queryExecution.optimizedPlan
    // tree traversal, not string match: a cached relation PRINTS its
    // provenance plan (the batch-side shingle fill) but collect() does not
    // descend into it — so any LIVE NGramShingles node here means text is
    // being re-shingled per increment, the round-2 scale gap
    val live = lp.collect {
      case n if n.expressions.exists(
        _.exists(_.isInstanceOf[graft.functions.NGramShingles])) => n
    }
    assert(live.isEmpty,
      s"index-based increment must not recompute shingles:\n$lp")
    // the corpus side must come from the persisted index files
    val scannedPaths = lp.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            f.location.rootPaths.map(_.toString)
          case _ => Seq.empty
        }
    }.flatten
    assert(scannedPaths.exists(_.contains(tmp)),
      s"corpus side must scan the index at $tmp, scanned: $scannedPaths")

    // appendTo folds an increment into the SAME files; the next batch's
    // plan must still read only the index — appending must never put the
    // already-indexed corpus (or the increment it just indexed) back on a
    // live re-shingle path
    val day2 = docs.where(col("doc_id") % 7 === 1)
      .select((col("doc_id") + lit(6000000L)).as("doc_id"), col("text"))
    val idx2 = graft.operators.SignatureIndex.appendTo(spark, tmp, day2)
    val lp2 = graft.operators.Dedup
      .nearDuplicatesAgainst(batch, idx2, "text", 0.9)
      .queryExecution.optimizedPlan
    val live2 = lp2.collect {
      case n if n.expressions.exists(
        _.exists(_.isInstanceOf[graft.functions.NGramShingles])) => n
    }
    // the only legitimate NGramShingles work is the BATCH side, which is
    // cache-filled inside nearDuplicatesAgainst — so none may be live
    assert(live2.isEmpty,
      s"post-append increment must not recompute shingles:\n$lp2")
    val scanned2 = lp2.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case f: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            f.location.rootPaths.map(_.toString)
          case _ => Seq.empty
        }
    }.flatten
    assert(scanned2.exists(_.contains(tmp)),
      s"post-append corpus side must scan the index at $tmp, scanned: $scanned2")
  }

  test("runtime bloom filter prunes the fact side of a selective dim join") {
    // production config: Tables scans are bare since round 9 (fan-out is
    // opt-in per call site), so InjectRuntimeFilter's bare-scan pattern
    // matches without any kill switch (round-8 verdict #8)
    import org.apache.spark.sql.functions._
    // at 100 TB a selective dimension filter should reach the fact scan as
    // a runtime bloom filter, not be applied post-shuffle; the application
    // side threshold defaults to 10 GB, so shrink it to test scale
    val conf = spark.conf
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val orders = Tables.orders(spark, dir)
        .where(col("o_orderpriority") === "1-URGENT")
      val plan = Tables.lineitem(spark, dir)
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .queryExecution.optimizedPlan.toString.toLowerCase
      assert(plan.contains("might_contain") || plan.contains("bloomfilter"),
        s"selective join did not inject a runtime bloom filter:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("semantic self-join under one giant cluster: AQE skew-join splits it") {
    import org.apache.spark.sql.functions._
    // the Clustering scaladoc claims AQE skew-split applies to the
    // within-cluster self-join because the key is a plain int column —
    // prove it triggers: ~95% of vectors land in centroid 0's cluster
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // shrink the skew thresholds to test scale: the hot cluster's
      // shuffle partition must exceed threshold AND 5× the median
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16k")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
      val dim = 16
      val corpus = spark.range(0, 3000).toDF("vec_id")
        .withColumn("embedding",
          transform(sequence(lit(0), lit(dim - 1)), i =>
            // 95% hug basis vector e0 (cluster 0), 5% hug e1 — plus a
            // per-row wobble so every vector is distinct
            when(i === 0 && col("vec_id") % 20 =!= 0, 1.0d)
              .when(i === 1 && col("vec_id") % 20 === 0, 1.0d)
              .otherwise(sin(col("vec_id") * 31 + i) * 0.3d)))
      val centroids = Array.tabulate(4, dim)((c, i) => if (i == c) 1.0 else 0.0)
      val pairs = graft.operators.Clustering
        .semanticPrunePairs(corpus, centroids, tau = 1.1) // plan-only output
      pairs.collect() // AQE finalizes only after executing THIS frame
      val plan = pairs.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"giant-cluster self-join did not trigger AQE skew-split:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("t_quality_filter: all signals in one shuffle-free projection") {
    val p = executedNoFanout("t_quality_filter")
    assert(!p.contains("Exchange"), s"quality filter plans a shuffle:\n$p")
  }

  test("t_rm_boilerplate: boilerplate set joins back as broadcast anti-join") {
    val p = executed("t_rm_boilerplate")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"))
    assert(!p.contains("CartesianProduct"))
  }

  test("t_tfidf_topk: corpus-count cross join broadcasts one row, no cartesian") {
    val p = executed("t_tfidf_topk")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("partial_count") || p.contains("partial_sum"))
  }

  test("t_vocab / t_bigram_pmi: map-side partial aggregation, no cartesian") {
    for (q <- Seq("t_vocab", "t_bigram_pmi")) {
      val p = executed(q)
      assert(p.contains("partial_count") || p.contains("partial_sum"),
        s"$q census must partial-aggregate map-side:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian:\n$p")
    }
  }

  test("t_vocab: rank is per-shard — no single-partition window anywhere") {
    val df = SparkEntry.queries("t_vocab")(spark, dir)
    df.collect() // AQE: executedPlan is final only after execution
    val p = df.queryExecution.executedPlan.toString
    val windows = p.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windows.nonEmpty, s"expected the per-shard rank window:\n$p")
    windows.foreach(w => assert(w.contains("_shard"),
      s"vocabulary rank must partition by _shard, found global window:\n$w"))
  }

  test("t_dsir_scores: ratio table broadcasts onto the token stream, no cartesian") {
    val p = executed("t_dsir_scores")
    assert(p.contains("BroadcastHashJoin"),
      s"the <=B-row log-ratio table must broadcast-join the feature stream:\n$p")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "bucket censuses and per-doc sums must partial-aggregate map-side")
  }

  test("d_semantic_decontaminate: benchmark side broadcast, corpus never exploded") {
    val p = executed("d_semantic_decontaminate")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    // exactly one Generate (the nProbe explode) — on the benchmark side only
    assert(p.linesIterator.count(_.contains("Generate")) == 1,
      s"only the small probe side may explode:\n$p")
  }

  test("s_shuffle_perm: offset table broadcasts back; shard windows partition by shard") {
    val p = executed("s_shuffle_perm")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("t_line_filter: line-level filter is one shuffle-free projection") {
    val p = executedNoFanout("t_line_filter")
    assert(!p.contains("Exchange"),
      s"per-line predicates need no shuffle — the whole op must be a scan:\n$p")
  }

  test("s_source_cap: salted pre-rank bounds the hot-group window") {
    val p = executed("s_source_cap")
    // two ranked phases: the salted (group, bucket) local top-k, then
    // the exact per-group rank over ≤ salt·cap survivors — each phase
    // is a Window or (since InferGroupedTopK) a heap top-k pair
    assert(p.linesIterator.count(l =>
      l.contains("Window [") || l.contains("GroupedTopK [")) >= 2, p)
    assert(!p.contains("CartesianProduct"))
  }

  test("perplexity buckets: approx mode plans no global-sort window") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, dir)
    val approx = graft.operators.TextAnalysis
      .perplexityBuckets(docs, exact = false)
      .queryExecution.executedPlan.toString
    assert(!approx.contains("Window"),
      s"approx bucketing must not plan a window:\n$approx")
    val exact = graft.operators.TextAnalysis
      .perplexityBuckets(docs, exact = true)
      .queryExecution.executedPlan.toString
    assert(exact.contains("Window"), "exact mode ranks via one window")
  }

  test("a12_dataset_card: map-side partial aggregation before the group exchange") {
    val p = executed("a12_dataset_card")
    assert(p.contains("partial_"))
  }

  test("f_sql_cosine: SQL-registered cosine stays inside whole-stage codegen") {
    val df = SparkEntry.queries("f_sql_cosine")(spark, dir)
    df.collect() // executes THIS QueryExecution, finalizing its adaptive plan
                 // (count() would build and finalize a different one)
    val p = df.queryExecution.executedPlan.toString
    // codegen spans print as "*(n) Operator" in the simple plan string
    assert("""\*\(\d+\)""".r.findFirstIn(p).isDefined, s"no codegen span:\n$p")
    assert(!p.toLowerCase.contains("batchevalpython"))
  }

  test("s4_partitioned_source: lang predicate prunes at the partition level") {
    val p = executed("s4_partitioned_source")
    assert(p.contains("PartitionFilters: ["), s"no partition filters:\n$p")
    assert("""PartitionFilters: \[[^\]]*lang""".r.findFirstIn(p).isDefined,
      s"lang not in partition filters:\n$p")
    // the pruned predicate must NOT fall through to a data filter
    assert(!p.contains("PushedFilters: [IsNotNull(lang)"), s"lang read as data column:\n$p")
  }

  test("e_kmeans_assign: nearest-centroid argmin is a shuffle-free scan") {
    val p = executedNoFanout("e_kmeans_assign")
    assert(!p.contains("Exchange"), s"centroid assignment plans a shuffle:\n$p")
    assert(!p.contains("Join"), s"centroid assignment plans a join:\n$p")
  }

  test("e_semantic_pairs: within-cluster self-join is a hash join on cluster_id, no cartesian") {
    val p = executed("e_semantic_pairs")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"expected an equi-join on cluster_id:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in semantic pairs:\n$p")
  }

  test("e_quantize_int8: quantization is a shuffle-free projection") {
    val p = executedNoFanout("e_quantize_int8")
    assert(!p.contains("Exchange"), s"quantization plans a shuffle:\n$p")
  }

  test("e_quantized_topk: query side broadcast, corpus scanned once") {
    val p = executed("e_quantized_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"expected broadcast of the query side:\n$p")
    assert(!p.contains("SortMergeJoin"))
  }

  test("j11_range_join: bucket explode makes it a hash join, never nested-loop") {
    val p = executed("j11_range_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"range join fell back to a nested loop:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"expected an equi-join on the bucket id:\n$p")
    assert(p.contains("Generate"), "interval side must explode into buckets")
  }

  test("e_pq_topk: codebook and LUT broadcast; no cartesian; argmin partial-aggregates") {
    val p = executed("e_pq_topk")
    assert(p.contains("BroadcastHashJoin"),
      s"codebook/LUT must broadcast onto the exploded corpus rows:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in PQ:\n$p")
    assert(p.contains("partial_min") || p.contains("partial_sum"),
      "per-(id, j) argmin / ADC sums must partial-aggregate map-side")
  }

  test("e_ivfpq_topk: residual codes broadcast-join per-list LUTs; no cartesian") {
    val p = executed("e_ivfpq_topk")
    assert(p.contains("BroadcastHashJoin"),
      s"codebook + per-list LUT must broadcast onto the corpus rows:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in residual IVF-PQ:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"every join side here is broadcast-sized:\n$p")
    assert(p.contains("partial_min") || p.contains("partial_sum"),
      "argmin codes / ADC sums must partial-aggregate map-side")
  }

  test("t_langid_nb: stateless serving is join-free after training") {
    // training collects the model; the SERVED projection (the returned
    // frame) must contain no join and no aggregation — dense-array
    // lookups and a struct-min only, the readStream-compatible shape
    val df = SparkEntry.queries("t_langid_nb")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"langid serving must not join:\n$p")
    assert(!p.contains("HashAggregate"), s"langid serving must not aggregate:\n$p")
  }

  test("round-5b shapes: entropy/novelty partial-aggregate, temperature broadcasts, mojibake scans") {
    val ent = executed("t_char_entropy")
    assert(ent.contains("partial_count") || ent.contains("partial_sum"),
      s"char census must partial-aggregate map-side:\n$ent")
    val nov = executed("t_novelty")
    assert(!nov.contains("CartesianProduct") && !nov.contains("BroadcastNestedLoopJoin"),
      s"novelty join must stay an equi-join:\n$nov")
    val tmp = executed("s_temperature_mix")
    assert(tmp.contains("BroadcastHashJoin"),
      s"the group-grain budget table must broadcast back:\n$tmp")
    assert(!tmp.contains("CartesianProduct"))
    val moj = executedNoFanout("t_fix_mojibake")
    assert(!moj.contains("Exchange") && !moj.contains("Join"),
      s"mojibake repair must be one shuffle-free scan:\n$moj")
  }

  test("e_incremental_embdup: stored buckets equi-join the probe, no cartesian") {
    val p = executed("e_incremental_embdup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"bucket probe must be an equi-join:\n$p")
  }

  test("e_rand_proj: sign projection is a shuffle-free scan") {
    val p = executedNoFanout("e_rand_proj")
    assert(!p.contains("Exchange"), s"JL projection plans a shuffle:\n$p")
    assert(!p.contains("Generate"), s"JL projection must not explode:\n$p")
  }

  test("t_nb_classifier: weight table broadcasts onto the feature stream") {
    val p = executed("t_nb_classifier")
    assert(p.contains("BroadcastHashJoin"),
      s"the <=B-row weight table must broadcast-join the feature stream:\n$p")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "training censuses and per-doc sums must partial-aggregate map-side")
  }

  test("e_pca_cov: moment census partial-aggregates to one d²-bounded shuffle") {
    val p = executed("e_pca_cov")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"moment census must shuffle exactly once:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "moment sums must partial-aggregate map-side")
  }

  test("t_blocklist: automaton tagging is a shuffle-free, join-free scan") {
    val p = executedNoFanout("t_blocklist")
    assert(!p.contains("Exchange"),
      s"blocklist tagging must not shuffle (the automaton ships in the closure):\n$p")
    assert(!p.contains("Join"), s"blocklist tagging must not join:\n$p")
  }

  test("t_nb_stateless: model serving is one shuffle-free projection") {
    val p = executedNoFanout("t_nb_stateless")
    assert(!p.contains("Exchange"),
      s"stateless scoring must not shuffle (streaming-safe contract):\n$p")
    assert(!p.contains("Join"), s"stateless scoring must not join:\n$p")
  }

  test("r_bm25_topk: inverted-index join, no cartesian, partial-agg censuses") {
    val p = executed("r_bm25_topk")
    assert(!p.contains("CartesianProduct"), s"doc x query product in BM25:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "postings census must partial-aggregate map-side")
  }

  test("k_theta_overlap: sketch agg partial-aggregates; matrix join broadcasts") {
    val p = executed("k_theta_overlap")
    assert(p.contains("partial_theta_sketch_agg"),
      s"theta union gadget must combine map-side, not ship raw values:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the k-row pairwise matrix must broadcast, never shuffle")
    assert(!p.contains("CartesianProduct"))
  }

  test("t_url_psl: rule table broadcasts onto the bounded candidate explode") {
    val p = executed("t_url_psl")
    assert(p.contains("BroadcastHashJoin"), s"PSL rules must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("s_token_budget: salted pre-prune bounds the hot-group window") {
    val p = executed("s_token_budget")
    // two window nodes: bucket-local prefix sum, then the exact window
    // over survivors — the same two-phase shape as s_source_cap
    assert("RunningWindowFunction|Window".r.findAllIn(p).size >= 2 ||
      p.split("Window").length - 1 >= 2, s"expected two window phases:\n$p")
  }

  test("t_bpe_apply: merge fold is literal replaces, no merge-table join") {
    val q = SparkEntry.queries("t_bpe_apply")(spark, dir)
    val analyzed = q.queryExecution.analyzed.toString
    // 20 chained literal replaces on the word frame; the only joins are
    // the word-stream equi-join and the final left_outer doc join
    assert(analyzed.contains("replace("), "encode fold must be inline replaces")
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
  }

  test("i_apply_changes: only the changeset is windowed, with rank-limit pushdown") {
    val p = executed("i_apply_changes")
    // the latest-per-key window exists once per consumer branch (anti
    // key list + upsert payloads) and ONLY over the changeset — every
    // Window node must order by seq DESC, a column the snapshot lacks
    val ranked = p.linesIterator.filter(l =>
      l.contains("windowspecdefinition") || l.contains("GroupedTopK [")).toSeq
    assert(ranked.nonEmpty && ranked.forall(_.contains("seq#")),
      s"every ranked node must order by the changeset seq:\n${ranked.mkString("\n")}")
    // rows must be pruned to 1/key BEFORE the shuffle — either Spark's
    // WindowGroupLimit pushdown or the partial GroupedTopK heap pass
    // (printed with partial=true), the property that keeps
    // latest-per-key cheap at scale
    assert(p.contains("WindowGroupLimit") ||
      p.linesIterator.exists(l => l.contains("GroupedTopK [") && l.contains(", true")),
      s"expected a partial rank limit below the changeset shuffle:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("k_histogram: census partial-aggregates map-side to bucket grain") {
    val p = executed("k_histogram")
    assert(p.contains("partial_count"),
      s"bucket census must map-side combine:\n$p")
    assert(!p.contains("Join"), s"histogram is a single-pass census:\n$p")
  }

  test("x_cohort_retention: user-keyed chain, no cartesian, partial aggs") {
    val p = executed("x_cohort_retention")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"cohort chain must stay equi-keyed:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_min"),
      s"cohort censuses must map-side combine:\n$p")
  }

  test("x_funnel: chained step joins stay equi-joins") {
    val p = executed("x_funnel")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"funnel steps must join on user_id, never nested-loop:\n$p")
    assert(p.contains("partial_min"),
      s"per-step conditional mins must partial-aggregate:\n$p")
  }

  test("e_hard_negatives: anchor batch broadcasts onto the corpus scan") {
    val p = executed("e_hard_negatives")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"the anchor batch must broadcast; the corpus is never shuffled pre-rank:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("t_wordpiece: serving is join-free (model ships in the closure)") {
    val p = executed("t_wordpiece")
    assert(!p.contains("Join"),
      s"the greedy walk must run off a broadcast model, not a vocab join:\n$p")
  }

  test("s_shard_assign: every window is partitioned — no global prefix sum") {
    val p = executed("s_shard_assign")
    val specs = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(specs.nonEmpty)
    // windowspecdefinition(part1, part2, ..., orderSpec, frame): an
    // UNPARTITIONED window starts directly with the order spec — every
    // window here must name a partition column first (_rb or shard)
    assert(specs.forall(s => s.contains("_rb#") || s.contains("shard#")),
      s"found a window without a range-bucket/shard partition:\n${specs.mkString("\n")}")
    // ...except the ≤rangeShards-row offset-table rank, which is the
    // documented bounded exception (same as Shuffle's offset table)
  }

  test("r_phrase_search: postings join stays an equi-join on the term") {
    val p = executed("r_phrase_search")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"phrase search must join on term, never nested-loop:\n$p")
    assert(p.contains("partial_count"),
      s"(q, d, base) groups must partial-aggregate map-side:\n$p")
  }

  test("t_unigram_lm: serving is join-free (model ships in the closure)") {
    val p = executed("t_unigram_lm")
    assert(!p.contains("Join"),
      s"the Viterbi walk must run off a broadcast model, not a score join:\n$p")
  }

  test("a16_pivot: explicit value list plans ONE aggregate, no discovery scan") {
    val p = executed("a16_pivot")
    assert(!p.contains("Join"), s"pivot with explicit values must not join:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_pivotfirst") ||
      p.contains("partial_first"),
      s"pivot must map-side combine:\n$p")
  }

  test("k_profile and k_corr: wide partial aggs, no per-column jobs, codegen kept") {
    val corr = executed("k_corr")
    assert(!corr.contains("Union"), s"k_corr must not union per-column scans:\n$corr")
    assert(corr.contains("partial_"), s"k_corr must map-side combine:\n$corr")
    assert("Scan parquet".r.findAllIn(corr).size == 1,
      s"k_corr must read the table once:\n$corr")
    val prof = executed("k_profile")
    assert(!prof.contains("Union"), s"k_profile must not union per-column scans:\n$prof")
    // two scans by design (moment pass + broadcast distinct pass — the
    // second hides behind an AQE broadcast stage pre-finalization, so
    // the count is not assertable here). A keyless SortAggregate is
    // EXPECTED: min/max over a string column cannot use the mutable
    // hash-agg buffer (and with no grouping key it sorts nothing). The
    // pinned regression is the MIXED-distinct shape, whose
    // first()-wrapped aggregates ran the 5×-expanded stream through
    // that fallback and measured 7.8 s vs 2.5 s split.
    // (the distinct pass's Expand is expected and stays in hash
    // aggregation — only the count-distincts ride it)
    assert(!prof.contains("first("),
      s"no first()-wrapped aggregates (the mixed-distinct shape):\n$prof")
  }

  test("x_resample: one user-partition window, no range join") {
    val p = executed("x_resample")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"resample must not range-join the grid:\n$p")
    val specs = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(specs.nonEmpty && specs.forall(_.contains("user_id#")),
      s"carry window must partition by user:\n${specs.mkString("\n")}")
  }

  test("g_anchor_text: rank join equi-keyed on src; census partial-aggregates") {
    val p = executed("g_anchor_text")
    // PageRank's 1-row node-count frame broadcasts via a documented
    // BroadcastNestedLoopJoin (k-bounded); a CartesianProduct anywhere
    // would be corpus-sized and is the thing this pin forbids
    assert(!p.contains("CartesianProduct"),
      s"anchor aggregation must stay equi-keyed:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"(dst, term) census must map-side combine:\n$p")
  }

  test("d_setsim_join: candidate join stays an equi-join on the prefix token") {
    val p = executed("d_setsim_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"set-sim join must never go all-pairs:\n$p")
    // per-doc prefix ranking is a doc-partitioned window, never global —
    // selfJoin pins the prefix behind a lazy localCheckpoint (round-8
    // advice: no CacheManager leak), which truncates it from the
    // end-to-end plan string, so the window contract asserts on the
    // prefix stage directly
    val pref = graft.operators.SetSimJoin.rankedPrefix(
      graft.operators.SetSimJoin.tokenRows(
        Tables.documents(spark, dir).select("doc_id", "text")), 9, 10)
    val specs = pref.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(specs.nonEmpty && specs.forall(_.contains("doc_id#")),
      s"prefix rank window must partition by doc_id:\n${specs.mkString("\n")}")
  }

  test("e_binary_topk: stage 1 reads packed longs, queries broadcast") {
    val p = executed("e_binary_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"bounded query side must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no shuffle join on the corpus:\n$p")
  }

  test("g_lpa: vote census partial-aggregates; argmax windows partition by node") {
    val p = executed("g_lpa")
    assert(p.contains("partial_count"),
      s"neighbor-vote census must map-side combine:\n$p")
    val ranked = p.linesIterator.filter(l =>
      l.contains("windowspecdefinition") || l.contains("GroupedTopK [")).toSeq
    assert(ranked.nonEmpty && ranked.forall(s => s.contains("node#") || s.contains("label#")),
      s"argmax ranking must be node-partitioned:\n${ranked.mkString("\n")}")
  }

  test("x_ipf_raking: cell-grain partial aggs, totals broadcast") {
    val p = executed("x_ipf_raking")
    assert(p.contains("partial_sum"),
      s"marginal sums must map-side combine:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"totals frame must broadcast (1 row), not cartesian:\n$p")
  }

  test("g_triangles: wedge and closing joins stay equi-joins") {
    val p = executed("g_triangles")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"triangle enumeration must never go all-pairs:\n$p")
  }

  test("x_covisitation: session pairing equi-keyed, census partial-aggregates") {
    val p = executed("x_covisitation")
    assert(!p.contains("CartesianProduct"),
      s"covisitation pairing must stay session-keyed:\n$p")
    assert(p.contains("partial_count"),
      s"pair census must map-side combine:\n$p")
  }

  test("r_vsm_topk: postings join stays equi-keyed on the term") {
    val p = executed("r_vsm_topk")
    assert(!p.contains("CartesianProduct"),
      s"VSM scoring must never go doc×query:\n$p")
    val ranked = p.linesIterator.filter(l =>
      l.contains("windowspecdefinition") || l.contains("GroupedTopK [")).toSeq
    assert(ranked.nonEmpty && ranked.forall(_.contains("query_id#")),
      s"top-k ranking must partition by query:\n${ranked.mkString("\n")}")
  }

  test("x_moving_avg and x_transitions: windows partition by user") {
    for (q <- Seq("x_moving_avg", "x_transitions")) {
      val p = executed(q)
      val specs = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
      assert(specs.nonEmpty && specs.forall(_.contains("user_id#")),
        s"$q window must partition by user:\n${specs.mkString("\n")}")
    }
  }

  test("v_kanon / v_ldiv / v_dp_counts: QI census partial-aggregates, scan pruned") {
    for ((q, schema) <- Seq(
      "v_kanon" -> "struct<lang:string,n_chars:bigint>",
      "v_ldiv" -> "struct<lang:string,source:string,n_chars:bigint>")) {
      val p = executed(q)
      assert(p.contains("partial_count"),
        s"$q census must map-side combine:\n$p")
      assert(p.contains(s"ReadSchema: $schema"),
        s"$q must read only the QI (+sensitive) columns:\n$p")
    }
    val p = executed("v_dp_counts")
    assert(p.contains("partial_count"))
    assert(p.contains("ReadSchema: struct<lang:string,source:string>"),
      s"dp census must read only the release dims:\n$p")
  }

  test("x_ewma: one shuffle on the key, no global window") {
    val p = executed("x_ewma")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"EWMA is one groupBy shuffle, got $exchanges:\n$p")
    assert(!p.contains("windowspecdefinition"),
      s"the recurrence must fold inside aggregate(), not a window:\n$p")
  }

  test("r_mmr: corpus pass broadcasts queries; greedy windows partition by query") {
    val p = executed("r_mmr")
    assert(!p.contains("CartesianProduct"),
      s"relevance pass must broadcast the query side:\n$p")
    val ranked = p.linesIterator.filter(l =>
      l.contains("windowspecdefinition") || l.contains("GroupedTopK [")).toSeq
    assert(ranked.nonEmpty && ranked.forall(_.contains("query_id#")),
      s"every MMR ranking must partition by query:\n${ranked.mkString("\n")}")
  }

  test("x_pareto: suffix max is sharded (no single-partition window), verdict broadcast") {
    val p = executed("x_pareto")
    val specs = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(specs.nonEmpty && specs.forall(_.contains("_shard#")),
      s"census suffix-max must partition by shard:\n${specs.mkString("\n")}")
    assert(p.contains("BroadcastHashJoin"),
      s"the (x, M) verdict table must broadcast back to the corpus:\n$p")
  }

  test("top-k spelling plans the heap operator: partial limit before the exchange, no sort") {
    val p = executed("e_cosine_topk")
    // InferGroupedTopK upgrades the row_number filter past Spark's own
    // WindowGroupLimit: partial heap (k rows per group × partition)
    // below the exchange, final heap above, and NO sort anywhere
    assert(p.linesIterator.exists(l => l.contains("GroupedTopK [") && l.contains(", true")),
      s"rank<=k must plan a partial heap below the shuffle:\n$p")
    assert(p.linesIterator.exists(l => l.contains("GroupedTopK [") && l.contains(", false")),
      s"rank<=k must plan the final heap above the shuffle:\n$p")
    assert(!p.contains("WindowExec") && !p.linesIterator.exists(_.trim.startsWith("Sort ")),
      s"the heap plan must not sort:\n$p")
  }

  test("x_topk_rank: rank() spelling plans ties-mode heap pair, no window, no sort") {
    val p = executed("x_topk_rank")
    assert(p.linesIterator.count(_.contains("GroupedTopK [")) >= 2,
      s"rank()<=k must plan the partial+final heap pair:\n$p")
    assert(!p.contains("WindowExec") &&
      !p.linesIterator.exists(_.trim.startsWith("Sort ")),
      s"the ties-mode heap plan must not sort or window:\n$p")
  }

  test("t_dsir_sample: the fused md5 uniform kernel is in the executed plan") {
    val p = executed("t_dsir_sample")
    assert(p.contains("md5_prefix60"),
      s"FuseMd5Uniform must rewrite the portable-uniform idiom:\n$p")
  }

  test("t_span_corrupt: one doc-grain shuffle, fold replaces any window") {
    val p = executed("t_span_corrupt")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"span walk is one groupBy shuffle, got $exchanges:\n$p")
    assert(!p.contains("windowspecdefinition"),
      s"the walk must fold inside aggregate(), not a window:\n$p")
  }

  test("m_audio_fp: fingerprinting is a shuffle-free scan") {
    val p = executedNoFanout("m_audio_fp")
    assert(!p.contains("Exchange"),
      s"PCM fingerprints must never shuffle payload bytes:\n$p")
  }

  test("w_window_rewrite: whole-partition windows become a census join — no WindowExec, no sort") {
    val p = executed("w_window_rewrite")
    assert(!p.contains("Window ["),
      s"RewriteWholePartitionWindow must remove WindowExec:\n$p")
    assert(!p.toLowerCase.contains("sort ["),
      s"the census-join plan never sorts:\n$p")
    assert(p.contains("HashAggregate"), s"census aggregate missing:\n$p")
  }

  test("llr_pairs_windowed: the compat windows also ride the census-join rewrite") {
    val p = executed("llr_pairs_windowed")
    assert(!p.contains("Window ["),
      s"the three compat windows should rewrite:\n$p")
  }

  test("v_constraints: the whole suite is ONE aggregation pass over one scan") {
    val p = executed("v_constraints")
    // a per-check job would show N scans; the suite folds into a single
    // scan of documents (Expand for the distinct aggregate is expected)
    val scans = p.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("documents"))
    assert(scans == 1, s"expected ONE documents scan, got $scans:\n$p")
  }

  test("scan fan-out (round 9, opt-in): bare scans by default; kernel call " +
    "sites gain a round-robin exchange; pruning/pushdown survive; tiny " +
    "tables and the kill switch opt out") {
    import org.apache.spark.sql.functions.col
    // DEFAULT: a plain table access stays a bare single-task scan —
    // round 8's global fan-out added one exchange per table reference
    // and regressed 320 small queries (round-8 verdict #1)
    val bare = Tables.documents(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!bare.contains("RoundRobinPartitioning"),
      s"plain scans must stay bare since round 9:\n$bare")
    // OPT-IN: a kernel-heavy call site wraps its scan in Tables.fanOut
    // (documents: 65 KB at sf0.001, one file = one scan task)
    val d = Tables.fanOut(Tables.documents(spark, dir))
      .where(col("doc_id") % 7 === 0).select("text")
    val p = d.queryExecution.executedPlan.toString
    assert(p.contains("RoundRobinPartitioning"), s"fan-out missing:\n$p")
    // …without losing column pruning or scan pushdown (round-robin
    // references no key column, and filters push through Repartition)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
    assert(p.contains("PushedFilters: [IsNotNull(doc_id)"), p)
    // a wired gate carries the exchange end-to-end
    val chrf = executed("x_chrf")
    assert(chrf.contains("RoundRobinPartitioning"),
      s"x_chrf must fan out its gram kernel input:\n$chrf")
    // 5-row region stays put (≥16 KiB/partition floor)
    val r = Tables.fanOut(Tables.region(spark, dir))
      .queryExecution.executedPlan.toString
    assert(!r.contains("RoundRobinPartitioning"),
      s"tiny dimension table must not fan out:\n$r")
    // kill switch
    val off = withoutFanout(Tables.fanOut(Tables.documents(spark, dir)))
      .queryExecution.executedPlan.toString
    assert(!off.contains("RoundRobinPartitioning"), off)
  }
}
