package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end training-data preparation chain the individual
  * operators are designed to compose into — one documented entry point
  * running the standard web-corpus recipe:
  *
  *  1. markup stripping ([[TextAnalysis.stripMarkup]])
  *  2. quality filtering ([[QualityFilter]], Gopher-style rules)
  *  3. boilerplate line removal ([[Boilerplate.removeBoilerplate]])
  *  3b. model-based quality filter ([[Classifier.filterByClassifier]],
  *     fastText-style NB trained on caller-supplied seed corpora;
  *     skipped when no seeds are supplied) — after the heuristic
  *     rules, before dedup, the GPT-3/LLaMA recipe order
  *  4. exact dedup ([[Dedup.exactDeduped]])
  *  5. near-dedup ([[Dedup.dedupClusters]] — MinHash+LSH with
  *     connected-components closure, keep cluster representatives)
  *  6. repeated-span removal ([[SpanDedup.removeRepeatedSpans]])
  *  7. benchmark decontamination ([[Decontaminate.contaminatedTrainIds]]
  *     → left_anti; skipped when no benchmark frame is supplied)
  *  7b. per-group token-budget fill ([[HashSplit.takeToTokenBudget]];
  *     skipped unless `cfg.tokenBudget > 0` and a (doc_id, grp) frame
  *     is supplied) — mixture weights become an actual corpus here,
  *     after decontamination so leaked docs never consume budget,
  *     before chunking so budgets count document tokens once
  *  8. context-window chunking ([[SpanDedup.chunk]])
  *
  * Stage ORDER is deliberate, and the dedup-before-span-removal part is
  * load-bearing: a document duplicated m times has EVERY k-window
  * repeated, so span removal run before dedup would edit all m copies —
  * including the one that should survive — down to nothing. Dedup first
  * leaves one representative whose text is intact; the spans the span
  * stage then removes are genuine cross-document repetition. Exact
  * dedup precedes MinHash so LSH never wastes candidates on identical
  * payloads, and chunking runs last so every upstream decision happens
  * once per document, not once per chunk.
  *
  * Every stage is individually oracle-gated; the composition is pinned
  * by DataPipelineSpec (stage-by-stage row accounting on a corpus with
  * planted markup, low-quality docs, boilerplate, copies, near-copies,
  * and benchmark contamination).
  */
object DataPipeline {

  private val log =
    org.slf4j.LoggerFactory.getLogger("graft.operators.DataPipeline")

  /** Time an eager stage materialization and log it (INFO) — the
    * per-stage wall time IS the ops observability a composed pipeline
    * needs (and what tools.ProfilePipe reads); a no-op when the
    * boundary is lazy.
    */
  private def timedPin(name: String, eager: Boolean)(body: => DataFrame): DataFrame =
    if (!eager) body
    else {
      val t0 = System.nanoTime()
      val out = body
      log.info(f"stage $name materialized in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      out
    }

  /** @param quality        Gopher-style keep rules
    * @param spanK          repeated-span window (tokens); 0 disables
    * @param nearDupThreshold MinHash-verified Jaccard threshold
    * @param contaminationThreshold n-gram containment threshold for the
    *                       benchmark drop set
    * @param chunkTokens    context-window size; 0 disables chunking
    * @param chunkOverlap   tokens shared between consecutive chunks
    * @param tokenBudget    stage 7b per-group token budget
    *                       ([[HashSplit.takeToTokenBudget]]); 0 disables.
    *                       Needs a `budgetGroups` frame at the call site.
    * @param budgetSeed     draw seed for the budget fill order
    */
  final case class Config(
      quality: QualityFilter.Rules = QualityFilter.Rules(),
      spanK: Int = 8,
      nearDupThreshold: Double = 0.8,
      contaminationThreshold: Double = 0.8,
      chunkTokens: Int = 2048,
      chunkOverlap: Int = 0,
      classifierMargin: Double = 0.0,
      tokenBudget: Long = 0L,
      budgetSeed: Long = 0L,
      boilerplateSep: String = "\n",
      boilerplateMinDocs: Long = 10L,
      classifierBuckets: Int = 4096,
      contaminationMaxDf: Long = Decontaminate.DefaultMaxDf,
      scheme: HashScheme = HashScheme.Fast)

  /** Shared per-document cleaning head (stages 1-3): markup strip →
    * quality filter → boilerplate removal. removeBoilerplate coalesces
    * all-boilerplate docs to ""; those empties are dropped HERE —
    * otherwise exact dedup conflates every unrelated emptied doc into
    * one ""-fingerprint group and one of them flows through as an empty
    * "training document".
    */
  private def cleanHead(docs: DataFrame, cfg: Config,
                        seeds: Option[(DataFrame, DataFrame)]): DataFrame = {
    val stripped = docs.withColumn("text",
      TextAnalysis.stripMarkup(col("text")))
    val cleaned = Boilerplate.removeBoilerplate(QualityFilter(stripped, cfg.quality),
        cfg.boilerplateSep, cfg.boilerplateMinDocs)
      .select(col("doc_id"), col("clean_text").as("text"))
      .where(length(col("text")) > 0)
    // stage 3b: model-based filter — trains per run for convenience; at
    // scale train once (Classifier.trainNaiveBayes) and reuse the model
    seeds match {
      case None => cleaned
      case Some((pos, neg)) =>
        // pin the regex head once (round 9, guide §5/§7.2): the filter
        // references `cleaned` TWICE (the candidates side of the semi
        // join AND the score stream inside scoreAgainst), so without a
        // pin the strip→quality→boilerplate chain — the pipeline's
        // dominant per-row cost — evaluates twice per materialization
        Classifier.filterByClassifier(cleaned.localCheckpoint(false),
          pos, neg, cfg.classifierMargin, cfg.classifierBuckets)
    }
  }

  /** Shared tail (stages 6-8): span removal → decontamination →
    * token-budget mixture fill → chunking, over an already-deduplicated
    * doc frame. The budget stage (7b) runs AFTER decontamination (a
    * budget filled with leaked docs under-represents the group once
    * they're dropped) and BEFORE chunking (budgets count document
    * tokens once, not once per chunk).
    */
  private def finishTailStaged(deduped: DataFrame, benchmarks: Option[DataFrame],
                               cfg: Config,
                               budgetGroups: Option[DataFrame],
                               pin: (String, DataFrame) => DataFrame = (_, df) => df): Seq[(String, DataFrame)] = {
    val deSpan = pin("despan",
      if (cfg.spanK <= 0) deduped
      else SpanDedup.removeRepeatedSpans(deduped, cfg.spanK)
        .select(col("doc_id"), col("clean_text").as("text"))
        .where(length(col("text")) > 0)) // span-emptied docs carry no signal
    val decontaminated = pin("decontaminated", benchmarks match {
      case None => deSpan
      case Some(bench) =>
        deSpan.join(
          Decontaminate.contaminatedTrainIds(bench, deSpan,
            threshold = cfg.contaminationThreshold,
            maxDf = cfg.contaminationMaxDf),
          Seq("doc_id"), "left_anti")
    })
    val budgeted = budgetGroups match {
      case Some(groups) if cfg.tokenBudget > 0 =>
        // group membership joins back from the caller's frame (cleaning
        // stages deliberately carry only (doc_id, text)); docs absent
        // from it pool under "" so nothing silently bypasses the budget
        val withGrp = decontaminated
          .join(groups.select(col("doc_id"), col("grp")),
            Seq("doc_id"), "left_outer")
          .withColumn("_grp", coalesce(col("grp"), lit("")))
        pin("budgeted", HashSplit.takeToTokenBudget(withGrp, col("_grp"),
            size(TextAnalysis.kernelTokens(col("text"))).cast("long"),
            cfg.tokenBudget, col("doc_id"), cfg.budgetSeed)
          .drop("_grp", "grp", "cum_tokens"))
      case _ => decontaminated // already pinned; re-pinning would copy it
    }
    val chunks =
      if (cfg.chunkTokens <= 0) budgeted
      else SpanDedup.chunk(budgeted, cfg.chunkTokens, cfg.chunkOverlap)
    Seq("despan" -> deSpan, "decontaminated" -> decontaminated,
      "budgeted" -> budgeted, "chunks" -> chunks)
  }

  private def finishTail(deduped: DataFrame, benchmarks: Option[DataFrame],
                         cfg: Config,
                         budgetGroups: Option[DataFrame]): DataFrame =
    finishTailStaged(deduped, benchmarks, cfg, budgetGroups).last._2

  /** Run the full chain. Returns chunk-grain rows when chunking is on
    * ((doc_id, chunk_id, chunk_text, chunk_start, chunk_tokens)),
    * doc-grain (doc_id, text) otherwise.
    */
  def prepare(docs: DataFrame, benchmarks: Option[DataFrame] = None,
              cfg: Config = Config(),
              seeds: Option[(DataFrame, DataFrame)] = None,
              budgetGroups: Option[DataFrame] = None): DataFrame =
    prepareStaged(docs, benchmarks, cfg, seeds, budgetGroups).last._2

  /** [[prepare]] with per-stage observability: the SAME composition
    * (shared code path, so the stages can never drift from prepare), but
    * every stage boundary is returned alongside its name so callers (the
    * end-to-end gate, ops dashboards, sample-and-inspect tooling) can
    * count or audit what each stage dropped. Last frame == prepare's
    * output. Stage names, in order: cleaned (strip → quality →
    * boilerplate → empty-drop → optional NB filter), exact, deduped,
    * despan, decontaminated, budgeted, chunks — stages configured off
    * collapse into their input frame (same composition [[prepare]] uses).
    */
  /** @param materialize localCheckpoint each stage boundary (eager) and
    *        build the next stage from the pinned frame. Without it every
    *        returned stage frame re-derives the WHOLE upstream chain
    *        (the lineage-multiplication hazard the scaladoc documents —
    *        counting all 7 stages re-ran the pipeline 7×, measured ~7 min
    *        vs tens of seconds at sf0.1). Costs executor-local block
    *        storage of each boundary; prepareIncrement always pins (its
    *        increments are small), batch callers opt in.
    */
  def prepareStaged(docs: DataFrame, benchmarks: Option[DataFrame] = None,
                    cfg: Config = Config(),
                    seeds: Option[(DataFrame, DataFrame)] = None,
                    budgetGroups: Option[DataFrame] = None,
                    materialize: Boolean = false): Seq[(String, DataFrame)] = {
    def pin(name: String, df: DataFrame): DataFrame =
      if (materialize) timedPin(name, eager = true)(df.localCheckpoint(true))
      else df
    val cleaned = pin("cleaned", cleanHead(docs, cfg, seeds))
    val exact = pin("exact", Dedup.exactDeduped(cleaned))
    val survivors = Dedup.dedupClusters(exact, threshold = cfg.nearDupThreshold,
        scheme = cfg.scheme)
      .where(col("is_survivor")).select("doc_id")
    val deduped = pin("deduped", exact.join(survivors, Seq("doc_id"), "left_semi"))
    Seq("cleaned" -> cleaned, "exact" -> exact, "deduped" -> deduped) ++
      finishTailStaged(deduped, benchmarks, cfg, budgetGroups, pin)
  }

  /** The daily-loop (incremental) variant: prepare an ARRIVING increment
    * against the already-ingested corpus without touching corpus text —
    * the corpus participates only through its two compact artifacts:
    *
    *  - `corpusFps`: one `fp` column (md5 content fingerprints) — drives
    *    the exact-dedup anti-join ([[Dedup.dedupAgainstExact]] shape)
    *  - `corpusIndex`: the persisted [[SignatureIndex]] — drives
    *    MinHash near-dup detection ([[Dedup.nearDuplicatesAgainst]])
    *
    * Stage order mirrors [[prepare]]: per-doc cleaning → exact dedup
    * (vs corpus, then in-batch) → near-dedup (vs corpus, then in-batch
    * closure) → span removal WITHIN the increment (cross-corpus span
    * granularity would need a persisted window census — the documented
    * boundary of this composition) → decontamination → chunking.
    *
    * After the run, fold the kept documents back:
    * `corpusIndex.append(kept)` / [[SignatureIndex.appendTo]] and union
    * their fingerprints into `corpusFps` — each day's cost stays
    * increment-proportional.
    *
    * doc_id spaces of increment and corpus must be disjoint (same
    * contract as the underlying incremental operators).
    */
  def prepareIncrement(newDocs: DataFrame, corpusIndex: SignatureIndex,
                       corpusFps: DataFrame,
                       benchmarks: Option[DataFrame] = None,
                       cfg: Config = Config(),
                       seeds: Option[(DataFrame, DataFrame)] = None,
                       budgetGroups: Option[DataFrame] = None): DataFrame = {
    // exact: drop docs whose content already exists in the corpus, then
    // collapse in-batch exact duplicates. The stage boundary is
    // MATERIALIZED (localCheckpoint): the downstream near-dup chain
    // references this frame many times (shingling, candidate join,
    // verification, cluster closure), and each lazy reference would
    // clone the whole cleaning lineage into the plan — the tree grows
    // multiplicatively per stage and Catalyst analysis itself becomes
    // the bottleneck (measured: minutes on a 4-doc increment).
    // Increments are small by definition, so pinning them is cheap at
    // any corpus scale.
    val freshContent = cleanHead(newDocs, cfg, seeds)
      .withColumn("_fp", TextAnalysis.fingerprint(col("text")))
      .join(corpusFps.select(col("fp").as("_fp")), Seq("_fp"), "left_anti")
      .drop("_fp")
    val exact = Dedup.exactDeduped(freshContent).localCheckpoint(true)
    // near: drop docs near-duplicating the CORPUS (index-only work),
    // then close in-batch near-dup clusters among what remains
    val corpusNearIds = Dedup
      .nearDuplicatesAgainst(exact, corpusIndex, "text", cfg.nearDupThreshold)
      .select(col("doc_a").as("doc_id")).distinct()
    val freshNear = exact.join(corpusNearIds, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    val survivors = Dedup.dedupClusters(freshNear, threshold = cfg.nearDupThreshold,
        scheme = cfg.scheme) // was silently defaulting to Fast, ignoring cfg
      .where(col("is_survivor")).select("doc_id")
    val deduped = freshNear.join(survivors, Seq("doc_id"), "left_semi")
    finishTail(deduped, benchmarks, cfg, budgetGroups)
  }

  /** Final emit stage: lay the pipeline's chunk-grain output into
    * ~`shardTokens`-token training shards ([[Sharding.assign]] keyed on
    * (doc_id, chunk_id)) — the frame a writer range-partitions by
    * (shard, shard_pos) and writes `partitionBy("shard")`, closing the
    * prepare → shards loop. Requires chunking on (`chunk_tokens` is the
    * weight column).
    */
  def emitShards(chunks: DataFrame, shardTokens: Long,
                 seed: Long = 42L): DataFrame = {
    val keyed = chunks.withColumn("_sid",
      concat(col("doc_id").cast("string"), lit(":"),
        col("chunk_id").cast("string")))
    Sharding.assign(keyed, col("_sid"), col("chunk_tokens"), shardTokens, seed)
      .drop("_sid")
  }
}
