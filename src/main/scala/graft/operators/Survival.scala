package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival over user lifetimes with right-censoring — the
  * retention statistic [[EventAnalytics]]'s cohort table cannot give
  * once observation windows truncate lifetimes: a user still active at
  * the horizon is CENSORED (lifetime ≥ observed), not churned, and
  * treating them as churned biases every retention number down. KM
  * handles it exactly: S(t) = Π_{t_i ≤ t} (1 − d_i/n_i) with censored
  * users leaving the risk set silently. Beyond-reference surface
  * (SURVEY §2.13).
  *
  * Determinism/portability: the survival product is the [[Smoothing]]
  * recurrence pattern — per-step EXACT integer arithmetic,
  * S_k = (S_{k−1}·(n_k−d_k)) div n_k in micro units (product ≤ 1e6·n,
  * long-safe), so a recursive SQL CTE replays every step bit-for-bit.
  *
  * Scale shape: one shuffle to user grain (min/max timestamps), one
  * partial agg to the DAY census, suffix-sum risk sets over the census
  * (bounded by the lifetime-day domain), and the product folds over
  * the sorted census array — census-grain throughout.
  */
object Survival {

  /** KM curve: (t_days, n_risk, d, s_micro, s) — one row per lifetime
    * day with ≥ 1 churn, survival after that day in micro units.
    * Censoring: users whose last event falls within `censorDays` of the
    * global horizon are censored at their observed lifetime.
    */
  def kaplanMeier(events: DataFrame, censorDays: Int = 3): DataFrame = {
    require(censorDays >= 0, s"censorDays must be >= 0, got $censorDays")
    val day = 86400000000L
    val users = events
      .groupBy("user_id")
      .agg(min(unix_micros(col("ts"))).as("first_us"),
        max(unix_micros(col("ts"))).as("last_us"))
    val horizon = users.agg(max(col("last_us")).as("h"))
    val obs = users.crossJoin(broadcast(horizon))
      .select(col("user_id"),
        expr(s"(last_us - first_us) div $day").as("t_days"),
        (col("last_us") < col("h") - lit(censorDays.toLong * day))
          .as("churned"))
    val byDay = obs.groupBy("t_days")
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("churned"), 1L).otherwise(0L)).as("d"))
    // risk set: users with observed lifetime ≥ t — suffix sum over the
    // day census (census-grain window)
    val wSuffix = Window.orderBy(col("t_days").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val risk = byDay
      .withColumn("n_risk", sum(col("n_users")).over(wSuffix))
      .where(col("d") > 0)
    // exact integer survival fold over the sorted census
    val folded = risk
      .agg(array_sort(collect_list(struct(col("t_days"), col("n_risk"),
        col("d")))).as("xs"))
      .withColumn("sm", expr(
        """aggregate(
          |  xs,
          |  named_struct('s', CAST(1000000 AS BIGINT),
          |               'out', CAST(array() AS ARRAY<BIGINT>)),
          |  (acc, e) -> named_struct(
          |    's', (acc.s * (e.n_risk - e.d)) div e.n_risk,
          |    'out', acc.out || array((acc.s * (e.n_risk - e.d)) div e.n_risk)),
          |  acc -> acc.out)""".stripMargin))
    folded.select(posexplode(arrays_zip(col("xs"), col("sm"))))
      .select(col("col.xs.t_days").as("t_days"),
        col("col.xs.n_risk").as("n_risk"), col("col.xs.d").as("d"),
        col("col.sm").as("s_micro"),
        round(col("col.sm").cast("double") / 1e6, 6).as("s"))
  }
}
