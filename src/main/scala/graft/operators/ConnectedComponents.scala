package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the closure step a
  * dedup pipeline needs between [[Dedup.nearDuplicateClusters]]' edge list
  * and actually dropping rows (no reference analog; LLM-pipeline brief).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) expressed as
  * DataFrame joins — converges in O(log n) rounds on any graph shape, no
  * driver-side graph, no collect. Each round is two self-joins keyed on a
  * node id; per-round results are localCheckpoint'ed to truncate lineage
  * (iterative plans otherwise grow exponentially and re-execute from the
  * source each round).
  *
  * At 100 TB grain the edge list for a dedup workload is tiny relative to
  * the corpus (near-dup pairs among distinct-content representatives), so
  * the per-round shuffles are on the small frame; the single corpus-sized
  * operation in [[Dedup.dedupClusters]] is one broadcast-or-shuffle join
  * of the final (node → component) map against doc ids.
  */
object ConnectedComponents {

  /** (node, component) for every node appearing in `edges`; component is
    * the minimum node id of the connected component. Self-loops and null
    * endpoints are dropped (a null key identifies nothing to connect).
    *
    * @param reliable per-round checkpoint durability, same contract as
    *          [[SpanDedup.removeRepeatedSpans]]: false (default) uses
    *          `localCheckpoint` — fastest, but an executor lost mid-run
    *          fails the job (lineage truncated); true checkpoints each
    *          round to the session's configured checkpoint directory so
    *          a long-running 100 TB closure survives executor churn at
    *          the cost of a write+read of the (small) edge frame per
    *          round.
    */
  def assign(edges: DataFrame, srcCol: String = "doc_a",
             dstCol: String = "doc_b", maxIter: Int = 50,
             reliable: Boolean = false): DataFrame = {
    require(!reliable ||
      edges.sparkSession.sparkContext.getCheckpointDir.isDefined,
      "ConnectedComponents.assign(reliable = true) needs a checkpoint " +
        "directory: call spark.sparkContext.setCheckpointDir(<path>) first")
    // LAZY checkpoints (the [[Scc]] discipline): every ckpt() result is
    // immediately consumed by signature(), which materializes the
    // checkpoint in the SAME job — eager paid a second, redundant
    // driver-synced job per round, and rounds are the cost driver here
    def ckpt(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(false) else df.localCheckpoint(false)
    val e0 = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .where(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      // canonical orientation (hi → lo) + dedup: halves the working set
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()

    var cur = ckpt(e0)
    var curSig = signature(cur)
    var done = false
    var i = 0
    while (!done && i < maxIter) {
      val next = ckpt(smallStar(largeStar(cur)))
      val nextSig = signature(next)
      done = nextSig == curSig
      cur = next
      curSig = nextSig
      i += 1
    }
    // non-convergence must fail loudly: returning the raw edge set as
    // (node, component) could map one node to several components with no
    // error raised. maxIter=50 is far past the O(log n) bound, so this
    // only fires on a genuine algorithmic regression.
    require(done,
      s"connected components did not converge within $maxIter rounds " +
        s"(edge-set fingerprint still changing: $curSig)")
    // fixed point = star graphs: every edge is (node → component root).
    // Roots themselves appear only on the v side.
    val members = cur.select(col("u").as("node"), col("v").as("component"))
    val roots = cur.select(col("v").as("node"), col("v").as("component")).distinct()
    members.unionByName(roots).distinct()
  }

  /** INCREMENTAL closure — the daily crawl-merge path (round-6 verdict
    * #5: the [[Dedup.SignatureIndex]] / warm-PageRank discipline applied
    * to graphs). A persisted (node → component) map plus a new edge
    * batch re-runs the closure only on the QUOTIENT graph: each new
    * edge's endpoints CONTRACT to their old component id (new nodes map
    * to themselves), already-internal edges vanish, and
    * [[assign]] runs on what remains — a frame bounded by the BATCH
    * size, never the accumulated graph. Old components untouched by the
    * batch keep their labels without any recomputation.
    *
    * Exactly ≡ cold: old component ids are their minimum member ids, so
    * the quotient closure's min-label per quotient component IS the
    * global minimum over the merged member set — `incremental(assign(E₁),
    * E₂) ≡ assign(E₁ ∪ E₂)` row for row (spec-pinned, including a batch
    * edge that bridges two old components).
    *
    * Scale: one left join of the batch against the persisted map (the
    * map side can bucket/broadcast), the closure at batch grain, one
    * component-relabel join back over the map. Output covers prev nodes
    * ∪ new-edge endpoints.
    */
  def incremental(prev: DataFrame, newEdges: DataFrame,
                  srcCol: String = "doc_a", dstCol: String = "doc_b",
                  maxIter: Int = 50, reliable: Boolean = false): DataFrame = {
    val p = prev.select(col("node").cast("long").as("node"),
      col("component").cast("long").as("component"))
    val e = newEdges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .where(col("u").isNotNull && col("v").isNotNull)
    // contract endpoints to their old components; edges internal to one
    // (old or trivially-new) component vanish before the closure
    val contracted = e
      .join(p.select(col("node").as("u"), col("component").as("_cu")),
        Seq("u"), "left_outer")
      .join(p.select(col("node").as("v"), col("component").as("_cv")),
        Seq("v"), "left_outer")
      .select(coalesce(col("_cu"), col("u")).as("doc_a"),
        coalesce(col("_cv"), col("v")).as("doc_b"))
      .where(col("doc_a") =!= col("doc_b"))
    val delta = assign(contracted, maxIter = maxIter, reliable = reliable)
      .localCheckpoint(true)
    // relabel prev through the delta map (absent = untouched component)
    val updatedPrev = p
      .join(delta.select(col("node").as("component"), col("component").as("_nc")),
        Seq("component"), "left_outer")
      .select(col("node"), coalesce(col("_nc"), col("component")).as("component"))
    // new-edge endpoints unseen by prev; nodes whose every edge vanished
    // in contraction (self-loops, duplicates of one new pair) stand alone
    val newNodes = e.select(col("u").as("node"))
      .unionByName(e.select(col("v").as("node")))
      .distinct()
      .join(p.select("node"), Seq("node"), "left_anti")
    val assignedNew = newNodes
      .join(delta.select(col("node"), col("component").as("_nc")),
        Seq("node"), "left_outer")
      .select(col("node"), coalesce(col("_nc"), col("node")).as("component"))
    updatedPrev.unionByName(assignedNew)
  }

  /** Edge-set fingerprint for the convergence test: one tiny aggregate per
    * round. (count, xor of per-edge hashes) — order-insensitive, and the
    * xor can't collide across iterations of a monotone algorithm in any
    * way that also preserves the count, short of a 64-bit hash collision.
    */
  private def signature(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)),
      coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Large-star: every node connects its strictly-larger neighbors to its
    * smallest neighbor (or itself). Input/output edges oriented hi → lo is
    * not assumed here — the symmetric view is built internally.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("u"), col("v"))
      .unionAll(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u")
      .agg(min(col("v")).as("_mv"))
      .select(col("u"), least(col("_mv"), col("u")).as("m"))
    // no dedup here: duplicate edges don't change smallStar's groupBy-min,
    // and its output distinct restores the invariant — one fewer
    // full-frame shuffle per round
    sym.join(mins, Seq("u"))
      .where(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
  }

  /** Small-star on hi → lo oriented edges: every node connects its smaller
    * neighbors (and itself) to the smallest of them.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy("u").agg(min(col("v")).as("m"))
    val relink = e.join(mins, Seq("u"))
      .where(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
    val self = mins.where(col("u") =!= col("m"))
      .select(col("u"), col("m").as("v"))
    relink.unionAll(self).distinct()
  }
}
