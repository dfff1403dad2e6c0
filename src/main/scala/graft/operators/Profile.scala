package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Column profiling + robust outlier flagging — the data-ops
  * introspection layer (beyond-reference surface, SURVEY §2.13): what a
  * warehouse runs over every new table before trusting it.
  *
  * [[profile]] is ONE pass: every column's stats are parallel aggregate
  * expressions in a single partial-agg plan (no per-column jobs, no
  * driver loop over columns — the column list is schema-derived at plan
  * time, which is plan construction, not a data path). Output is
  * long-form (one row per column) so downstream checks join on
  * column name.
  *
  * [[madOutliers]] composes [[HistQuantile]]: median and MAD both come
  * from histogram censuses (two bounded census passes, no sort), and
  * the flagging pass is a shuffle-free scan against two broadcast
  * scalars — the robust z-score |x − median| > k·MAD with the
  * bucket-width-bounded estimate error the census documents.
  */
object Profile {

  /** One row per profiled column: (column, n_rows, n_nulls, n_distinct,
    * min_str / max_str — values rendered to strings so heterogeneous
    * column types share one output schema; 6dp for doubles).
    *
    * TWO scans, both whole-stage-codegen: a moment pass (counts, nulls,
    * typed min/max — one HashAggregate) and a distinct pass (all
    * count-distincts — one Expand + HashAggregate), cross-joined on
    * their 1-row results and stack-unpivoted. NOT one pass on purpose:
    * mixing distinct and non-distinct aggregates makes Catalyst wrap
    * the non-distinct side in `first()` over the expanded stream, which
    * falls out of codegen into a SortAggregate — measured 7.8 s vs
    * sub-second split, at sf0.1.
    */
  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "no columns to profile")
    val basicAggs = columns.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        min(col(c)).as(s"${c}__min"),
        max(col(c)).as(s"${c}__max"))
    } :+ count(lit(1)).as("__n")
    val distinctAggs = columns.map(c =>
      count_distinct(col(c)).as(s"${c}__distinct"))
    def render(c: String, suffix: String) = {
      val v = col(s"${c}__$suffix")
      (df.schema(c).dataType match {
        case _: NumericType => round(v.cast("double"), 6).cast("string")
        case StringType     => v
        case _              => v.cast("string")
      }).as(s"${c}__$suffix")
    }
    val wide = df.agg(basicAggs.head, basicAggs.tail: _*)
      .crossJoin(broadcast(df.agg(distinctAggs.head, distinctAggs.tail: _*)))
      .select(col("__n") +: columns.flatMap(c =>
        Seq(col(s"${c}__nulls"), col(s"${c}__distinct"),
          render(c, "min"), render(c, "max"))): _*)
    val stackArgs = columns.map(c =>
      s"'$c', `${c}__nulls`, `${c}__distinct`, `${c}__min`, `${c}__max`")
      .mkString(", ")
    wide.select(col("__n").as("n_rows"),
        expr(s"stack(${columns.length}, $stackArgs) AS " +
          "(column, n_nulls, n_distinct, min_str, max_str)"))
      .select("column", "n_rows", "n_nulls", "n_distinct", "min_str", "max_str")
  }

  /** Pairwise Pearson correlations of numeric columns — ONE pass: the
    * raw moments (Σx, Σx², Σxy per pair, n) ride a single wide partial
    * agg; the division happens on the 1-row result GUARDED by the
    * variance terms, so constant columns yield null instead of the
    * ANSI divide-by-zero `corr` itself raises. 6dp-rounded (the libm
    * rule), and the identical raw-moment arithmetic replays in SQL.
    * Raw moments lose precision when mean² · n ≫ variance (values like
    * 10⁹ ± 1) — center such columns first; profiling-grade data is far
    * from that regime.
    */
  def correlations(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.size >= 2, "need at least two columns to correlate")
    val pairs = for {
      i <- columns.indices; j <- (i + 1) until columns.size
    } yield (columns(i), columns(j))
    def d(c: String) = col(c).cast("double")
    val aggs =
      columns.flatMap(c => Seq(
        sum(d(c)).as(s"${c}__s"), sum(d(c) * d(c)).as(s"${c}__ss"))) ++
      pairs.map { case (a, b) => sum(d(a) * d(b)).as(s"${a}__${b}__sp") } :+
      count(lit(1)).as("__n")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    def vvar(c: String) =
      col(s"${c}__ss") - col(s"${c}__s") * col(s"${c}__s") / col("__n")
    val rendered = wide.select(col("__n") +: pairs.map { case (a, b) =>
      val cov = col(s"${a}__${b}__sp") - col(s"${a}__s") * col(s"${b}__s") / col("__n")
      round(when(vvar(a) > 0 && vvar(b) > 0,
        cov / sqrt(vvar(a) * vvar(b))), 6).as(s"${a}__${b}")
    }: _*)
    val stackArgs = pairs.map { case (a, b) => s"'$a', '$b', `${a}__${b}`" }
      .mkString(", ")
    rendered.select(expr(
      s"stack(${pairs.size}, $stackArgs) AS (col_a, col_b, corr)"))
  }

  /** Rows whose value is a robust outlier: |x − median| > k · MAD, with
    * median and MAD estimated from equi-width histogram censuses over
    * [lo, hi) (error ≤ one bucket width each — size `buckets`
    * accordingly). Returns the flagged rows plus the (median, mad)
    * estimates as literal columns, 6dp.
    */
  def madOutliers(df: DataFrame, value: String, lo: Double, hi: Double,
                  buckets: Int, k: Double = 3.0): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val med = HistQuantile.quantiles(
      HistQuantile.histogram(df, col(value), lo, hi, buckets),
      lo, hi, buckets, Seq(0.5))
      .select(col("qtile")).head().getDouble(0)
    val dev = df.select(abs(col(value) - med).as("_d"))
    val mad = HistQuantile.quantiles(
      HistQuantile.histogram(dev, col("_d"), 0.0, hi - lo, buckets),
      0.0, hi - lo, buckets, Seq(0.5))
      .select(col("qtile")).head().getDouble(0)
    df.where(abs(col(value) - med) > k * mad)
      .withColumn("median_est", lit(med))
      .withColumn("mad_est", lit(mad))
  }

  /** Winsorization: clip `value` to the [pLo, pHi] quantile band — the
    * standard outlier treatment when rows must be KEPT (an ML feature
    * pipeline can't drop rows the way [[madOutliers]] flags them).
    * Bounds come from the same [[HistQuantile]] census (one bounded
    * pass), then the clip is a shuffle-free scan against two broadcast
    * scalars. Output: input columns + `clipped` (6dp) + the bound
    * columns.
    */
  def winsorize(df: DataFrame, value: String, lo: Double, hi: Double,
                buckets: Int, pLo: Double = 0.05,
                pHi: Double = 0.95): DataFrame = {
    require(pLo > 0 && pHi <= 1 && pLo < pHi,
      s"need 0 < pLo < pHi <= 1, got ($pLo, $pHi)")
    val qs = HistQuantile.quantiles(
      HistQuantile.histogram(df, col(value), lo, hi, buckets),
      lo, hi, buckets, Seq(pLo, pHi))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val (bLo, bHi) = (qs(pLo), qs(pHi))
    // null inputs stay null (Spark's greatest would silently substitute
    // the bound — engines disagree on null-skipping, so be explicit)
    df.withColumn("clipped",
        when(col(value).isNotNull,
          round(least(greatest(col(value).cast("double"), lit(bLo)),
            lit(bHi)), 6)))
      .withColumn("clip_lo", lit(bLo))
      .withColumn("clip_hi", lit(bHi))
  }
}
