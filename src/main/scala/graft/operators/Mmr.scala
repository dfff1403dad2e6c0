package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Maximal Marginal Relevance (Carbonell & Goldstein 1998) — diversified
  * top-k: greedily pick the candidate maximizing
  * λ·rel(q, d) − (1−λ)·max_{s ∈ selected} sim(d, s), so the result list
  * trades relevance against redundancy — the retrieval-side twin of
  * [[Coreset]] (which diversifies with no query). The training-data use:
  * dedup-aware example selection for few-shot prompts and eval panels,
  * where the plain top-k is k near-copies of the same document.
  * Beyond-reference surface (SURVEY §2.13).
  *
  * Determinism/portability: vectors run on the [[Quantize]] int8 grid
  * and every cosine is rounded ONCE to integer micro; from there the
  * greedy recurrence is pure long arithmetic — mmr_e12 =
  * λµ·relµ − (1e6−λµ)·maxsimµ (products ≤ 1e12, exact) — so ranking
  * ties break on doc_id and the SQL oracle replays the whole selection.
  * The empty-set penalty is 0 and maxsim has a 0 floor (anti-similar
  * documents earn no bonus) — the standard formulation.
  *
  * Scale shape: corpus-sized work is ONE scan (the broadcast-query
  * relevance pass, [[Quantize.quantizedTopK]]'s plan) ending in a
  * per-query top-`pool` window; everything after is POOL-bounded —
  * pairwise sims are pool² per query (never corpus²), each greedy round
  * is a window argmax + two equi-joins over query×pool rows, and no
  * data ever lands on the driver.
  */
object Mmr {

  /** Diversified top-k per query: (query_id, doc_id, mmr_rank,
    * rel_micro, mmr_e12). λ in micro units (700000 ≡ 0.7 relevance
    * weight). `pool` is the relevance short-list MMR reranks.
    */
  def diversifiedTopK(corpus: DataFrame, queries: DataFrame, pool: Int,
                      k: Int, lambdaMicro: Long, idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && k <= pool, s"need 1 <= k <= pool, got k=$k pool=$pool")
    require(lambdaMicro > 0 && lambdaMicro <= 1000000L,
      s"lambdaMicro must be in (0, 1e6], got $lambdaMicro")
    val lam = lambdaMicro
    val c = Quantize.int8(corpus, idCol, vecCol)
      .select(col(idCol).cast("long").as("doc_id"), col("qvec").as("_cv"))
    val q = Quantize.int8(queries, idCol, vecCol)
      .select(col(idCol).cast("long").as("query_id"), col("qvec").as("_qv"))

    val wRel = Window.partitionBy(col("query_id"))
      .orderBy(col("rel_micro").desc, col("doc_id").asc)
    val rel = c.crossJoin(broadcast(q))
      .where(col("doc_id") =!= col("query_id"))
      .withColumn("rel_micro",
        round(VectorOps.cosine(col("_cv"), col("_qv")) * 1e6).cast("long"))
      .withColumn("_rn", row_number().over(wRel))
      .where(col("_rn") <= pool)
      .select(col("query_id"), col("doc_id"), col("_cv"), col("rel_micro"))
      .localCheckpoint()

    val sims = rel.select(col("query_id"), col("doc_id").as("a_id"),
        col("_cv").as("_av"))
      .join(rel.select(col("query_id"), col("doc_id").as("b_id"),
        col("_cv").as("_bv")), Seq("query_id"))
      .where(col("a_id") =!= col("b_id"))
      .withColumn("sim_micro",
        round(VectorOps.cosine(col("_av"), col("_bv")) * 1e6).cast("long"))
      .select(col("query_id"), col("a_id"), col("b_id"), col("sim_micro"))
      .localCheckpoint()

    val wPick = Window.partitionBy(col("query_id"))
      .orderBy(col("mmr_e12").desc, col("doc_id").asc)
    var cand = rel.select(col("query_id"), col("doc_id"), col("rel_micro"))
      .withColumn("maxsim", lit(0L))
    var out: DataFrame = null
    var i = 1
    while (i <= k) {
      val win = cand
        .withColumn("mmr_e12",
          lit(lam) * col("rel_micro") - lit(1000000L - lam) * col("maxsim"))
        .withColumn("_rn", row_number().over(wPick))
        .where(col("_rn") === 1)
        .select(col("query_id"), col("doc_id"),
          lit(i.toLong).as("mmr_rank"), col("rel_micro"), col("mmr_e12"))
      out = if (out == null) win else out.unionByName(win)
      if (i < k) {
        val simsR = sims.select(col("query_id").as("_sq"), col("a_id"),
          col("b_id"), col("sim_micro"))
        cand = cand
          .join(win.select(col("query_id"), col("doc_id").as("_w")),
            Seq("query_id"))
          .where(col("doc_id") =!= col("_w"))
          .join(simsR, col("query_id") === col("_sq") &&
            col("doc_id") === col("a_id") && col("_w") === col("b_id"))
          .withColumn("maxsim", greatest(col("maxsim"), col("sim_micro")))
          .select(col("query_id"), col("doc_id"), col("rel_micro"),
            col("maxsim"))
        if (i % 4 == 0) cand = cand.localCheckpoint()
      }
      i += 1
    }
    out
  }
}
