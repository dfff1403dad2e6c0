package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank-2 ALS matrix factorization over a (user, item, rating) frame —
  * the collaborative-filtering / interaction-embedding primitive of a
  * training-data pipeline (user↔document preference factors, co-click
  * embeddings, implicit-feedback curation priors). Beyond-reference
  * surface (SURVEY §2.13).
  *
  * d is FIXED AT 2: the alternating ridge solve is then a closed-form
  * 2×2 normal-equation inverse, which makes the whole training loop
  * oracle-replayable (the same exactness regime as [[Platt]]'s 2×2
  * Newton). Production d=64 factorization is a different operator
  * (blocked factor shipping, Cholesky per entity — MLlib territory);
  * rank-2 is the honest exact-replay contract and still carries the
  * semantics end-to-end: normal-equation accumulation, ridge damping,
  * alternation, serving.
  *
  * Determinism / engine portability:
  *  - factors are MICRO longs (1.0 ≡ 1e6); item side seeds at
  *    f1 = 1e6, f2 = md5₆₀("als:"‖item) mod 1e6 — an exact integer
  *    draw on both engines, no float in the init;
  *  - each half-round accumulates the normal equations as EXACT integer
  *    sums (micro·micro and micro·rating products of longs —
  *    association-order-free by construction);
  *  - the 2×2 solve is ONE fixed double chain per entity from those
  *    exact integers (a = S/1e12 + λ, det = a11·a22 − a12², Cramer),
  *    snapped straight back to micro — so cross-engine ulp wobble
  *    cannot compound across rounds and the `r_als_factors` oracle
  *    replays every half-round verbatim. λ > 0 keeps det ≥ λ² > 0
  *    (no singular solves).
  *
  * 100 TB shape: per half-round ONE equi-join of the ratings stream to
  * the opposite factor table (item table broadcasts when small; both
  * sides shuffle-join at catalog scale) and ONE partial-aggregated
  * shuffle to entity grain (5 long columns per entity — map-side
  * combine collapses each task to its distinct entities). Factor
  * tables are entity-grain; NO driver data path; `localCheckpoint` per
  * half-round bounds lineage to one join + one agg.
  */
object Als {

  /** 60-bit md5 prefix mod 1e6 — the exact-integer init draw. */
  private def seedDraw(id: org.apache.spark.sql.Column) =
    pmod(conv(substring(md5(concat(lit("als:"), id.cast("string"))), 1, 15),
      16, 10).cast("long"), lit(1000000L))

  /** Alternating rounds over `ratings` (user, item, r — r a small
    * positive integer; quantize upstream). Returns (userFactors,
    * itemFactors), each (id, f1_micro, f2_micro). One "round" = a user
    * solve from the current item factors followed by an item solve
    * from the new user factors; item factors seed the chain.
    */
  def factorize(ratings: DataFrame, rounds: Int, lambda: Double = 0.1,
                userCol: String = "user", itemCol: String = "item",
                ratingCol: String = "r"): (DataFrame, DataFrame) = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(lambda > 0, s"lambda must be > 0 (singular-solve guard), got $lambda")
    val rt = ratings.select(col(userCol).cast("long").as("user"),
        col(itemCol).cast("long").as("item"),
        col(ratingCol).cast("long").as("r"))
      .where(col("user").isNotNull && col("item").isNotNull &&
        col("r").isNotNull)
      .localCheckpoint()
    var itemF = rt.select(col("item").as("id")).distinct()
      .select(col("id"), lit(1000000L).as("f1"), seedDraw(col("id")).as("f2"))
      .localCheckpoint()
    var userF: DataFrame = null
    var i = 0
    while (i < rounds) {
      userF = solveSide(rt, itemF, "user", "item", lambda).localCheckpoint()
      itemF = solveSide(rt, userF, "item", "user", lambda).localCheckpoint()
      i += 1
    }
    (userF, itemF)
  }

  /** One ridge half-round: solve `solveKey` factors from the fixed
    * `fixedKey` side. Exact integer normal-equation sums, then the one
    * double Cramer chain, snapped to micro.
    */
  private def solveSide(rt: DataFrame, fixed: DataFrame, solveKey: String,
                        fixedKey: String, lambda: Double): DataFrame = {
    val sums = rt
      .join(fixed.withColumnRenamed("id", fixedKey), Seq(fixedKey))
      .groupBy(col(solveKey).as("id"))
      .agg(sum(col("f1") * col("f1")).as("s11"),
        sum(col("f1") * col("f2")).as("s12"),
        sum(col("f2") * col("f2")).as("s22"),
        sum(col("f1") * col("r")).as("b1"),
        sum(col("f2") * col("r")).as("b2"))
    // the ONE double chain (mirrored verbatim by the oracle): A in real
    // units from the micro² sums, b from the micro sums, Cramer, snap
    val a11 = col("s11").cast("double") / 1e12 + lambda
    val a12 = col("s12").cast("double") / 1e12
    val a22 = col("s22").cast("double") / 1e12 + lambda
    val b1 = col("b1").cast("double") / 1e6
    val b2 = col("b2").cast("double") / 1e6
    val det = a11 * a22 - a12 * a12
    sums.select(col("id"),
      round((a22 * b1 - a12 * b2) / det * 1e6).cast("long").as("f1"),
      round((a11 * b2 - a12 * b1) / det * 1e6).cast("long").as("f2"))
  }

  /** Serving path: top-`k` UNRATED items per user by predicted rating
    * p·q — an EXACT integer dot product of micro factors (micro² units,
    * ties broken by item id), so ranking is deterministic and
    * oracle-replayable. Candidate generation is user×item at item-table
    * grain: the item factor table broadcasts (rank-2 rows are 24
    * bytes — a 10M-item catalog is 240 MB, still broadcastable; beyond
    * that, serve through an ANN index over the item factors instead),
    * and the rated-pair anti-join prunes before the per-user top-k
    * (GroupedTopK-rewritable rank pattern).
    */
  def recommend(ratings: DataFrame, userF: DataFrame, itemF: DataFrame,
                k: Int, userCol: String = "user",
                itemCol: String = "item"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val rated = ratings.select(col(userCol).cast("long").as("user"),
      col(itemCol).cast("long").as("item")).distinct()
    val scored = userF.select(col("id").as("user"),
        col("f1").as("p1"), col("f2").as("p2"))
      .crossJoin(broadcast(itemF.select(col("id").as("item"),
        col("f1").as("q1"), col("f2").as("q2"))))
      .join(rated, Seq("user", "item"), "left_anti")
      .select(col("user"), col("item"),
        (col("p1") * col("q1") + col("p2") * col("q2")).as("score_micro2"))
    scored
      .withColumn("rk", row_number().over(Window.partitionBy("user")
        .orderBy(col("score_micro2").desc, col("item"))))
      .where(col("rk") <= k)
      .select(col("user"), col("item"), col("score_micro2"),
        col("rk").cast("long").as("rk"))
  }
}
