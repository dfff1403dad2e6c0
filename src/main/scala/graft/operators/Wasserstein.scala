package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped 1-D Wasserstein-1 (earth-mover) distance between two
  * empirical distributions — the INTEGRATED drift metric next to KS's
  * sup and PSI's binned log-ratio: W₁ = ∫ |F_a(v) − F_b(v)| dv, i.e.
  * how far probability mass must move, in the value's own units. KS
  * saturates on any clean separation and PSI depends on a bin choice;
  * W₁ is bin-free and proportional to the SIZE of the shift — the
  * number a "how much did token-length / score / latency drift" alert
  * should threshold on.
  *
  * Exactness: for integer-valued samples both ECDFs are step functions
  * jumping only at observed values, so the integral is the finite sum
  * Σ_i |F_a(v_i) − F_b(v_i)| · (v_{i+1} − v_i) over the merged value
  * census. Cross-multiplying clears the denominators: |cum_a·N_b −
  * cum_b·N_a| · gap in DECIMAL(38,0) (the [[Hypothesis.ksTest]]
  * convention — exact far past the long range), divided once by
  * N_a·N_b at the end and rounded to 6dp.
  *
  * Scale shape: one partial-aggregable shuffle to the (group × value)
  * census, cumulative windows AT CENSUS GRAIN partitioned by group
  * (value domains — chars, cents, ms — are bounded by contract; the
  * ungrouped single-series case is [[Hypothesis.ksTest]]'s sharded
  * two-phase territory), one broadcast join of the ≤groups-row totals
  * frame. Empty sides yield null distance, never a division blow-up.
  */
object Wasserstein {

  /** Per group: (key, n_a, n_b, w1) with `sideB` selecting the b-side
    * rows inside each group. Values must be integer-valued (cast
    * upstream); w1 is in those units.
    */
  def w1ByGroup(df: DataFrame, group: Column, value: Column,
                sideB: Column): DataFrame = {
    val base = df.select(group.cast("string").as("key"),
      value.cast("long").as("v"), sideB.as("isb"))
    val census = base.groupBy("key", "v")
      .agg(sum(when(!col("isb"), 1L).otherwise(0L)).as("na"),
        sum(when(col("isb"), 1L).otherwise(0L)).as("nb"))
    val totals = census.groupBy("key")
      .agg(sum("na").as("n_a"), sum("nb").as("n_b"))
    val w = Window.partitionBy("key").orderBy(col("v").asc)
    val cum = census
      .withColumn("cuma",
        sum(col("na")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("cumb",
        sum(col("nb")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("gap",
        coalesce(lead(col("v"), 1).over(w) - col("v"), lit(0L)))
    cum.join(broadcast(totals), Seq("key"))
      .groupBy(col("key"))
      .agg(first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
        sum(abs(col("cuma").cast("decimal(38,0)") * col("n_b")
          - col("cumb").cast("decimal(38,0)") * col("n_a"))
          * col("gap")).as("_num"))
      .select(col("key"), col("n_a"), col("n_b"),
        when(col("n_a") > 0L && col("n_b") > 0L,
          round(col("_num").cast("double")
            / (col("n_a").cast("double") * col("n_b")), 6)).as("w1"))
  }
}
