package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RewriteWholePartitionWindowSpec extends SparkSpec {

  import spark.implicits._

  private def optimized(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  private def withRuleOff[A](body: => A): A = {
    spark.conf.set("spark.graft.window.rewrite", "false")
    try body finally spark.conf.unset("spark.graft.window.rewrite")
  }

  private def base: DataFrame =
    (0L until 200L).map(i => (i % 7, i, (i % 11).toDouble)).toDF("k", "v", "d")

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("sum(long) over partition rewrites: no Window node, null-safe join census") {
    val df = base.withColumn("s", sum("v").over(Window.partitionBy("k")))
    val plan = optimized(df)
    assert(!plan.contains("Window "), s"Window survived:\n$plan")
    assert(plan.contains("Join Inner"), s"no join:\n$plan")
    val expected = withRuleOff {
      sortedRows(base.withColumn("s", sum("v").over(Window.partitionBy("k"))))
    }
    assert(sortedRows(df) == expected)
  }

  test("kill switch keeps WindowExec") {
    withRuleOff {
      val df = base.withColumn("s", sum("v").over(Window.partitionBy("k")))
      assert(optimized(df).contains("Window "))
    }
  }

  test("double sum is NOT rewritten (reassociation would change low bits)") {
    val df = base.withColumn("s", sum("d").over(Window.partitionBy("k")))
    assert(optimized(df).contains("Window "))
  }

  test("ordered running frame is NOT rewritten; unbounded frame with ORDER BY is") {
    val running = base.withColumn("s",
      sum("v").over(Window.partitionBy("k").orderBy("v")))
    assert(optimized(running).contains("Window "))
    val whole = Window.partitionBy("k").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val df = base.withColumn("s", sum("v").over(whole))
    assert(!optimized(df).contains("Window "))
    val expected = withRuleOff {
      sortedRows(base.withColumn("s", sum("v").over(whole)))
    }
    assert(sortedRows(df) == expected)
  }

  test("rank windows stay (GroupedTopK territory, genuinely ordered)") {
    val df = base.withColumn("r",
      row_number().over(Window.partitionBy("k").orderBy("v")))
    val plan = optimized(df)
    assert(plan.contains("Window ") || plan.contains("GroupedTopK"))
  }

  test("null partition keys group together (null-safe join)") {
    val withNulls = (0L until 60L)
      .map(i => (if (i % 3 == 0) null else s"g${i % 4}", i))
      .toDF("k", "v")
    val df = withNulls.withColumn("c", count(lit(1)).over(Window.partitionBy("k")))
      .withColumn("s", sum("v").over(Window.partitionBy("k")))
    assert(!optimized(df).contains("Window "))
    val got = sortedRows(df)
    val expected = withRuleOff {
      sortedRows(withNulls
        .withColumn("c", count(lit(1)).over(Window.partitionBy("k")))
        .withColumn("s", sum("v").over(Window.partitionBy("k"))))
    }
    assert(got == expected)
    // the 20 null-key rows all see the same 20-row group
    val nullRows = df.where(col("k").isNull).select("c").distinct().collect()
    assert(nullRows.map(_.getLong(0)).toSeq == Seq(20L))
  }

  test("empty PARTITION BY (global aggregate window) rewrites to a broadcastable cross join") {
    val df = base.withColumn("mx", max("v").over(Window.partitionBy()))
    assert(!optimized(df).contains("Window "))
    assert(df.select("mx").distinct().collect().map(_.getLong(0)).toSeq == Seq(199L))
  }

  test("the whole safe-function family rewrites with identical results") {
    val w = Window.partitionBy("k")
    def q(df: DataFrame): DataFrame = df
      .withColumn("c", count(lit(1)).over(w))
      .withColumn("mn", min("v").over(w))
      .withColumn("mx", max("v").over(w))
      .withColumn("av", avg("v").over(w))
      .withColumn("ad", approx_count_distinct("v").over(w))
      .withColumn("cs", size(collect_set(col("v") % 5).over(w)))
    val df = q(base)
    assert(!optimized(df).contains("Window "))
    val expected = withRuleOff(sortedRows(q(base)))
    assert(sortedRows(df) == expected)
  }

  test("a node mixing an eligible and an ineligible function stays a Window") {
    val w = Window.partitionBy("k")
    val df = base
      .withColumn("s", sum("v").over(w))
      .withColumn("sd", sum("d").over(w))
    assert(optimized(df).contains("Window "),
      "all-or-nothing per node: the double sum must keep the node")
  }

  test("size(collect_set) fuses to count(DISTINCT): no Window, no set materialization") {
    val w = Window.partitionBy("k")
    def q(df: DataFrame): DataFrame = df
      .withColumn("nd", size(collect_set(col("v") % 5).over(w)))
      .withColumn("c", count(lit(1)).over(w))
    val df = q(base)
    val plan = optimized(df)
    assert(!plan.contains("Window "), s"Window survived:\n$plan")
    assert(!plan.contains("collect_set"),
      s"the set must not materialize when only its size is read:\n$plan")
    assert(plan.contains("distinct"), s"count(DISTINCT) missing:\n$plan")
    val expected = withRuleOff(sortedRows(q(base)))
    assert(sortedRows(df) == expected)
    // exact distinct counts per group
    val perGroup = base.groupBy("k")
      .agg(countDistinct(col("v") % 5).cast("int").as("nd"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    df.select("k", "nd").distinct().collect()
      .foreach(r => assert(r.getInt(1) == perGroup(r.getLong(0))))
  }

  test("collect_set also consumed raw keeps the set aggregate (no fusion), still rewritten") {
    val w = Window.partitionBy("k")
    def q(df: DataFrame): DataFrame = df
      .withColumn("cs", collect_set(col("v") % 5).over(w))
      .select(col("k"), col("v"), size(col("cs")).as("nd"),
        array_sort(col("cs")).as("sorted_set"))
    val df = q(base)
    val plan = optimized(df)
    assert(!plan.contains("Window "), s"Window survived:\n$plan")
    assert(plan.contains("collect_set"),
      s"raw set consumption must keep the set aggregate:\n$plan")
    val expected = withRuleOff(sortedRows(q(base)))
    assert(sortedRows(df) == expected)
  }

  test("a non-deterministic child blocks the rewrite (dual-scan would diverge)") {
    // the census join scans the child twice; rand() would be redrawn,
    // attaching group stats from a different evaluation than the rows
    // NB: a LocalRelation source would not exercise the guard —
    // ConvertToLocalRelation materializes rand() into the relation
    // before this rule runs (one evaluation, so the rewrite would be
    // safe there anyway); Range is a real leaf.
    val w = Window.partitionBy("k")
    val src = spark.range(200).select((col("id") % 7).as("k"), col("id").as("v"))
    val nd = src.withColumn("r", rand(0) + rand())
    val df = nd.withColumn("s", sum("v").over(w))
    assert(optimized(df).contains("Window "),
      "non-deterministic child must keep WindowExec's single materialization")
    // same query with the non-determinism removed still rewrites
    val det = src.withColumn("r", col("v") * 2)
      .withColumn("s", sum("v").over(w))
    assert(!optimized(det).contains("Window "))
  }

  test("order-sensitive aggregates (first, collect_list) are not rewritten") {
    // the analyzer already rejects DISTINCT window functions, so the
    // rule's isDistinct guard is unreachable belt-and-braces; the
    // reachable exclusions are the order-sensitive aggregates
    val w = Window.partitionBy("k")
    assert(optimized(base.withColumn("f", first("v").over(w)))
      .contains("Window "))
    assert(optimized(base.withColumn("l", collect_list("v").over(w)))
      .contains("Window "))
  }
}
