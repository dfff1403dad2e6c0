package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exponentially-weighted moving average over per-key event series —
  * the standard smoother for metric streams (monitoring, engagement
  * scores, rate estimates) that [[EventAnalytics]]'s window aggregates
  * can't express: EWMA is a RECURRENCE (s_t = α·x_t + (1−α)·s_{t−1}),
  * not a frame aggregate. Beyond-reference surface (SURVEY §2.13).
  *
  * Integer-exact portability: values and α live in MICRO units and each
  * step is one integer chain — s_t = (α·x_t + (1e6−α)·s_{t−1}) div 1e6
  * — so all arithmetic is exact long math (headroom: the pre-division
  * sum stays below 2⁶³ for |x| up to ~9·10⁶ in real units) and a
  * recursive SQL CTE replays every step bit-for-bit. Values must be
  * non-negative (div truncates toward zero, the oracle's // floors —
  * identical only on non-negatives; shift upstream if needed).
  *
  * Scale shape: ONE shuffle on the key, then each series folds inside
  * `aggregate` over its sorted event array — the [[Sessionize]]
  * contract: per-key series must fit an executor (bounded sessions /
  * bounded lookback upstream — at 100 TB you EWMA a windowed slice, not
  * all history; the recurrence composes across chunks by carrying the
  * last state forward, which is exactly what [[graft.streaming]] state
  * does for the unbounded case). No driver data path, no UDF — the fold
  * is a codegen'd higher-order function.
  */
object Smoothing {

  /** Per-key EWMA: one output row per event, (key, rn, o, t,
    * value_micro, ewma_micro, ewma) with rn the 1-based position in
    * (order, tie) order and o/t the order and tie values carried
    * through. s_1 = x_1; α in micro units (e.g. 300000 ≡ 0.3).
    */
  def ewma(df: DataFrame, key: Column, order: Column, tie: Column,
           value: Column, alphaMicro: Long): DataFrame = {
    require(alphaMicro > 0 && alphaMicro <= 1000000L,
      s"alphaMicro must be in (0, 1e6], got $alphaMicro")
    val a = alphaMicro
    // ENFORCE the documented non-negative contract (div truncates, the
    // oracle's // floors — they disagree on negatives, and the -1
    // no-state sentinel in the fold below is only unambiguous when
    // legitimate values can't be negative): fail loudly, don't mis-smooth
    val xm = round(value * 1e6).cast("long")
    val guarded = when(xm >= 0, xm).otherwise(raise_error(concat(
      lit("Smoothing.ewma requires non-negative values, got micro="),
      xm.cast("string"))))
    val series = df.select(key.as("k"), order.as("o"), tie.as("t"),
        guarded.as("x"))
      .groupBy(col("k"))
      .agg(array_sort(collect_list(struct(col("o"), col("t"), col("x"))))
        .as("xs"))
    // fold: acc = struct(prev: long, out: array<long>); each step is the
    // exact integer recurrence, appended to out.
    val folded = series.withColumn("sm",
      expr(
        s"""aggregate(
           |  xs,
           |  named_struct('prev', CAST(-1 AS BIGINT),
           |               'out', CAST(array() AS ARRAY<BIGINT>)),
           |  (acc, e) -> named_struct(
           |    'prev', CASE WHEN acc.prev < 0 THEN e.x
           |                 ELSE ($a * e.x + ${1000000L - a} * acc.prev) div 1000000 END,
           |    'out', acc.out || array(
           |      CASE WHEN acc.prev < 0 THEN e.x
           |           ELSE ($a * e.x + ${1000000L - a} * acc.prev) div 1000000 END)),
           |  acc -> acc.out)""".stripMargin))
    folded.select(col("k"), posexplode(arrays_zip(col("xs"), col("sm"))))
      .select(col("k").as("key"), (col("pos") + 1).cast("long").as("rn"),
        col("col.xs.o").as("o"), col("col.xs.t").as("t"),
        col("col.xs.x").as("value_micro"),
        col("col.sm").as("ewma_micro"),
        round(col("col.sm").cast("double") / 1e6, 6).as("ewma"))
  }
}
