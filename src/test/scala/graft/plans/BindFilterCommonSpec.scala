package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Filter-predicate CSE (BindFilterCommon): repeated heavy subtrees in a
  * Filter condition are bound to ONE evaluation via With/CommonExprRef +
  * RewriteWithExpression — plus the round-8-verdict ANSI-safety guard: a
  * can-throw subtree whose every occurrence sits under a conditional
  * guard must NOT be hoisted to unconditional evaluation (under ANSI
  * mode, Spark 4's default, that can fail rows the original plan
  * accepted).
  */
class BindFilterCommonSpec extends SparkSpec {

  // a file-source input: a local relation would be folded away by
  // ConvertToLocalRelation before the last optimizer batch runs
  private def docs: DataFrame =
    graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "lang", "text")

  private def copies(df: DataFrame): Int =
    "regexp_replace".r.findAllIn(df.queryExecution.optimizedPlan.toString).size

  test("repeated heavy total subtrees bind to one evaluation (even under guards)") {
    val strip = regexp_replace(col("text"), "[0-9]", "")
    // two occurrences of the same regexp chain, both under CaseWhen
    // branches — TOTAL functions are safe to hoist, so they still bind
    val cond = when(col("lang") === "aa", length(strip) > 3)
      .otherwise(length(strip) > 5)
    val df = docs.where(cond)
    assert(copies(df) == 1,
      s"two occurrences must bind to one:\n${df.queryExecution.optimizedPlan}")
    df.collect() // and the bound plan must execute
  }

  test("ANSI guard: a can-throw subtree under conditional guards is NOT hoisted") {
    assert(spark.conf.get("spark.sql.ansi.enabled").toBoolean,
      "Spark 4 sessions here run ANSI mode; the guard test needs it")
    // the MINIMAL repeated heavy subtree (the regexp chain — nothing
    // repeated-heavy strictly inside) contains an IntegralDivide that
    // THROWS for every third row (doc_id % 3 == 0 → div by zero); both
    // occurrences sit under never-taken CaseWhen branches, so the
    // original plan evaluates it for NO row
    val boom = length(regexp_replace(
      expr("cast(n_chars div (doc_id % 3) as string)"), "0", "#"))
    val cond = when(col("lang") === "zz_never", boom > 0)
      .when(col("lang") === "zz_other", boom < 100)
      .otherwise(lit(true))
    val df = docs.where(cond)
    // not bound: both copies stay in place under their guards...
    assert(copies(df) == 2,
      s"guarded can-throw subtree must not bind:\n${df.queryExecution.optimizedPlan}")
    // ...and the query runs: hoisting would evaluate the divide per row
    // and throw DIVIDE_BY_ZERO on the first doc_id % 3 == 0 row
    assert(df.count() == docs.count())
  }

  test("can-throw subtree with an occurrence on the unconditional path still binds") {
    // same throwing CLASS inside the heavy subtree (IntegralDivide —
    // here with a never-zero divisor so evaluation is safe), but one
    // occurrence is a top-level conjunct: the unconditional path already
    // evaluates it for every row, so hoisting changes nothing and the
    // guard permits binding
    val num = length(regexp_replace(
      expr("cast(n_chars div (doc_id % 3 + 1) as string)"), "0", "#"))
    val cond = num >= 0 &&
      when(col("lang") === "aa", num < 10).otherwise(lit(true))
    val df = docs.where(cond)
    assert(copies(df) == 1,
      s"unconditional occurrence must allow binding:\n${df.queryExecution.optimizedPlan}")
    df.collect()
  }

  test("kill switch restores the inlined copies") {
    spark.conf.set("spark.graft.bind.filterCse", "false")
    try {
      val strip = regexp_replace(col("text"), "[0-9]", "")
      val df = docs.where(length(strip) > 3 && substring(strip, 1, 1) =!= "q")
      assert(copies(df) == 2,
        s"kill switch must keep the literal plan:\n${df.queryExecution.optimizedPlan}")
    } finally spark.conf.unset("spark.graft.bind.filterCse")
  }
}
