package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weighted sampling WITHOUT replacement — Efraimidis–Spirakis A-ES
  * ("Weighted random sampling with a reservoir", IPL 2006): each item
  * draws key u_i^(1/w_i) and the k largest keys ARE a weighted sample
  * without replacement. The training-data uses: pick a token-budget
  * subset biased to quality scores, build eval panels weighted by
  * traffic, downsample a domain proportionally to importance — all
  * as one deterministic, coordination-free top-k. Beyond-reference
  * surface (SURVEY §2.13); the unweighted cousin is
  * [[HashSplit.capPerGroup]]'s uniform md5 draw.
  *
  * Two key ladders, one distribution:
  *  - [[weightedTopK]] (gate-exact, integer weights ≤ `maxWeight`):
  *    u^(1/w) has the law of the MAX of w iid uniforms, so the key is
  *    max_{j=1..w} h60(seed,id,j) over 60-bit md5 integers — pure
  *    integer arithmetic, hash-replayable on any engine, cost O(Σw).
  *  - [[weightedTopKLog]] (the 100 TB path, unbounded weights): the
  *    standard ln(u)/w key (monotone in u^(1/w)), ONE ln per row,
  *    nano-rounded once before ranking (ids break post-round ties
  *    deterministically).
  *
  * Scale shape: both variants end in orderBy(key).limit(k) — Spark
  * plans TakeOrderedAndProject (per-partition heap + driver merge of
  * k·partitions rows), never a global sort. The per-group variant
  * windows on the GROUP (bounded partitions), not globally.
  */
object WeightedSample {

  /** 60-bit md5 integer draw on (seed, id, j) — the [[Bootstrap]] /
    * [[Dsir]] uniform, left as an exact long.
    */
  private def h60(seed: Long, id: Column, j: Column): Column =
    conv(substring(md5(concat(lit(s"aes:$seed:"), id.cast("string"),
      lit(":"), j.cast("string"))), 1, 15), 16, 10).cast("long")

  /** Weight-contract guard, enforced (not just documented): w = 0 in
    * the integer path hits Spark's DESCENDING `sequence(1, 0)` =
    * [1, 0] and draws TWICE (behaves like weight 2 instead of
    * exclusion); a negative weight in the log path flips ln(u)/w
    * positive and outranks every valid row. Fail loudly rather than
    * silently mis-sample.
    */
  private def guardWeight(w: Column, ok: Column, contract: String,
                          who: String): Column =
    when(ok, w).otherwise(raise_error(concat(
      lit(s"$who requires weight $contract, got "), w.cast("string"))))

  /** Exact-integer A-ES: weighted k-sample without replacement, key =
    * max of w 60-bit uniforms. Weights must be integers in
    * [1, maxWeight] (cost is O(Σ w) hash evaluations — use
    * [[weightedTopKLog]] beyond that). Output: (id, weight, key_h)
    * for the k winners.
    */
  def weightedTopK(df: DataFrame, id: Column, weight: Column, k: Int,
                   seed: Long = 42L, maxWeight: Long = 4096L): DataFrame = {
    val base = df.select(id.cast("long").as("id"),
      guardWeight(weight.cast("long"), weight.cast("long") >= 1,
        ">= 1", "weightedTopK").as("w"))
    val keys = base
      .select(col("id"), col("w"),
        explode(sequence(lit(1L), least(col("w"), lit(maxWeight)))).as("j"))
      .groupBy("id", "w")
      .agg(max(h60(seed, col("id"), col("j"))).as("key_h"))
    keys.orderBy(col("key_h").desc, col("id").asc).limit(k)
  }

  /** Scale-path A-ES: key = ln(u)/w (monotone transform of u^(1/w)),
    * one 60-bit uniform and one ln per row, nano-rounded once; top-k
    * by (key desc, id asc). Weights: any positive double. Same law as
    * [[weightedTopK]], O(rows) instead of O(Σ w).
    */
  def weightedTopKLog(df: DataFrame, id: Column, weight: Column, k: Int,
                      seed: Long = 42L): DataFrame = {
    val base = df.select(id.cast("long").as("id"),
      guardWeight(weight.cast("double"), weight.cast("double") > 0,
        "> 0", "weightedTopKLog").as("w"))
    val u = (h60(seed, col("id"), lit(0)).cast("double") + 0.5d) /
      1.152921504606846976e18d
    val keyed = base.withColumn("key_nano",
      round(log(u) / col("w") * 1e9).cast("long"))
    keyed.orderBy(col("key_nano").desc, col("id").asc).limit(k)
  }

  /** Per-group exact A-ES: k winners per group (stratified weighted
    * pick — eval panels per language, per-domain quotas). One shuffle
    * on the group key; the rank window partitions by GROUP, never
    * globally. Output: (grp, id, weight, key_h, rank).
    */
  def weightedTopKPerGroup(df: DataFrame, grp: Column, id: Column,
                           weight: Column, k: Int, seed: Long = 42L,
                           maxWeight: Long = 4096L): DataFrame = {
    val base = df.select(grp.cast("string").as("grp"),
      id.cast("long").as("id"),
      guardWeight(weight.cast("long"), weight.cast("long") >= 1,
        ">= 1", "weightedTopKPerGroup").as("w"))
    val keys = base
      .select(col("grp"), col("id"), col("w"),
        explode(sequence(lit(1L), least(col("w"), lit(maxWeight)))).as("j"))
      .groupBy("grp", "id", "w")
      .agg(max(h60(seed, col("id"), col("j"))).as("key_h"))
    val w = Window.partitionBy("grp")
      .orderBy(col("key_h").desc, col("id").asc)
    keys.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }
}
