package graft.plans

import graft.SparkSpec
import graft.functions.NGramShingles
import org.apache.spark.sql.functions._

class FuseShingleDistinctSpec extends SparkSpec {

  import spark.implicits._

  test("array_distinct over non-distinct shingles fuses into the kernel") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(array_distinct(
        NGramShingles.shingles(col("text"), 3, distinct = false)).as("sh"))
    val plan = docs.queryExecution.optimizedPlan.toString
    assert(!plan.contains("array_distinct"),
      s"array_distinct survived the rewrite:\n$plan")
    assert(plan.contains("ngramshingles(text#") && plan.contains(", true)"),
      s"kernel distinct mode missing from the optimized plan:\n$plan")
  }

  test("fused result equals the unfused semantics (first-occurrence order)") {
    val df = Seq("a b a b a b c", "x x x", "").toDF("text")
    val fused = df.select(array_distinct(
        NGramShingles.shingles(col("text"), 2, distinct = false)).as("sh"))
      .collect().map(_.getSeq[String](0))
    // reference: dedup in plain Scala, preserving first occurrence
    val reference = df.select(
        NGramShingles.shingles(col("text"), 2, distinct = false).as("sh"))
      .collect().map(_.getSeq[String](0).distinct)
    assert(fused.toSeq === reference.toSeq)
  }

  test("a redundant array_distinct over distinct shingles is dropped") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(array_distinct(
        NGramShingles.shingles(col("text"), 3, distinct = true)).as("sh"))
    val plan = docs.queryExecution.optimizedPlan.toString
    assert(!plan.contains("array_distinct"),
      s"redundant array_distinct survived:\n$plan")
  }

  test("unrelated array_distinct calls are left alone") {
    val df = Seq(Seq("a", "a", "b")).toDF("xs")
      .select(array_distinct(col("xs")).as("d"))
    assert(df.head().getSeq[String](0) === Seq("a", "b"))
  }
}
