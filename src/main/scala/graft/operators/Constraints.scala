package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite (the Deequ shape): a list
  * of checks over a table, evaluated in ONE aggregation pass, reported
  * as one row per check — the validation gate a 100 TB ingest runs
  * before promoting a snapshot, next to [[Profile]] (descriptive stats)
  * and [[CorpusStats]] (dataset cards). Beyond-reference surface
  * (SURVEY §2.13).
  *
  * Scale shape: every metric is an aggregate expression folded into a
  * SINGLE `agg` over the table — one scan, partial aggregation, one
  * 1-row result exploded to the report grain (no per-check jobs, no
  * driver loops). `Unique` uses exact count_distinct (Catalyst plans
  * the distinct aggregates via Expand — still one scan); swap in
  * approx_count_distinct at trillion-row scale if the 2–5% HLL error is
  * acceptable for the uniqueness ratio (the check contract stays the
  * same).
  *
  * Ratio metrics are defined over NON-NULL values (completeness is its
  * own check — conflating the two makes a null-heavy column pass
  * pattern checks vacuously in one direction or fail them spuriously
  * in the other). An all-null / empty input yields a null metric, and
  * null metrics FAIL their check (fail-closed: an empty snapshot
  * passing validation is the worst outcome).
  */
object Constraints {

  sealed trait Check {
    def column: String
    def name: String
    def threshold: Double
  }
  /** fraction of rows with `column` non-null ≥ threshold */
  final case class Complete(column: String, threshold: Double) extends Check {
    val name = "complete"
  }
  /** n_distinct / n_nonnull ≥ threshold (1.0 = primary-key-like) */
  final case class Unique(column: String, threshold: Double = 1.0) extends Check {
    val name = "unique"
  }
  /** min(column) ≥ threshold */
  final case class MinValue(column: String, threshold: Double) extends Check {
    val name = "min_value"
  }
  /** max(column) ≤ threshold */
  final case class MaxValue(column: String, threshold: Double) extends Check {
    val name = "max_value"
  }
  /** fraction of non-null values in `values` ≥ threshold */
  final case class InSet(column: String, values: Seq[String],
                         threshold: Double = 1.0) extends Check {
    val name = "in_set"
  }
  /** fraction of non-null values matching `regex` ≥ threshold */
  final case class Matches(column: String, regex: String,
                           threshold: Double) extends Check {
    val name = "matches"
  }
  /** Functional dependency `column → dependent`:
    * count_distinct(column) / count_distinct(column, dependent) ≥
    * threshold — exactly 1.0 ⟺ every determinant value maps to one
    * dependent value. Folds into the same single-pass agg (one more
    * Expand branch), so FD profiling costs no extra scan. Assumes
    * null-free determinant/dependent columns (Spark's multi-argument
    * DISTINCT drops any-null tuples — pair with [[Complete]] checks).
    */
  final case class FunctionalDep(column: String, dependent: String,
                                 threshold: Double = 1.0) extends Check {
    val name = "functional_dep"
  }

  private def metric(c: Check): Column = c match {
    case Complete(col0, _) =>
      avg(when(col(col0).isNotNull, 1.0d).otherwise(0.0d))
    case Unique(col0, _) =>
      // try_divide: empty/all-null input → null metric (fails closed),
      // not an ANSI DIVIDE_BY_ZERO killing the whole suite
      try_divide(count_distinct(col(col0)).cast("double"), count(col(col0)))
    case MinValue(col0, _) => min(col(col0)).cast("double")
    case MaxValue(col0, _) => max(col(col0)).cast("double")
    // null inputs are EXCLUDED from the ratio (avg skips the null
    // branch): non-null denominator per the contract above
    case InSet(col0, vs, _) =>
      avg(when(col(col0).isNotNull,
        when(col(col0).isin(vs.map(lit): _*), 1.0d).otherwise(0.0d)))
    case Matches(col0, re, _) =>
      avg(when(col(col0).isNotNull,
        when(regexp_like(col(col0), lit(re)), 1.0d).otherwise(0.0d)))
    case FunctionalDep(det, dep, _) =>
      try_divide(count_distinct(col(det)).cast("double"),
        count_distinct(col(det), col(dep)))
  }

  private def passed(c: Check, m: Column): Column = {
    val cmp = c match {
      case _: MaxValue => m <= lit(c.threshold)
      case _           => m >= lit(c.threshold)
    }
    coalesce(cmp, lit(false)) // null metric (empty/all-null input) fails
  }

  /** One report row per check: (check, column, metric, threshold,
    * passed) — metric rounded to 6dp for cross-engine comparability.
    */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "validate needs at least one check")
    val aggs = checks.zipWithIndex.map { case (c, i) => metric(c).as(s"_m$i") }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = checks.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c.name).as("check"),
        lit(c.column).as("column"),
        round(col(s"_m$i").cast("double"), 6).as("metric"),
        lit(c.threshold).as("threshold"),
        passed(c, col(s"_m$i")).as("passed"))
    }
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
  }

  /** Referential-integrity check — the one constraint that cannot fold
    * into the single-pass agg (it needs the reference table): count of
    * non-null `column` values absent from `refCol` of `ref`. One
    * left_anti join (broadcast when the reference is dimension-sized).
    */
  def orphans(df: DataFrame, column: String, ref: DataFrame,
              refCol: String): DataFrame =
    df.select(col(column).as("_k")).where(col("_k").isNotNull)
      .join(ref.select(col(refCol).as("_k")).distinct(), Seq("_k"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
}
