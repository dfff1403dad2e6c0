package graft.plans

import graft.SparkSpec
import graft.operators.TopK
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

class GroupedTopKSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def docs = {
    val rng = new scala.util.Random(7)
    (1 to 500).map { i =>
      (i.toLong, s"g${rng.nextInt(13)}", rng.nextInt(1000))
    }.toDF("id", "grp", "score")
  }

  test("groupedTopK equals the row_number window result") {
    val df = docs
    val got = TopK.groupedTopK(df, Seq("grp"), Seq(("score", false), ("id", true)), 3)
    val want = df
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"grp").orderBy($"score".desc, $"id".asc)))
      .filter($"rn" <= 3).drop("rn")
    assert(got.columns.toSeq == df.columns.toSeq)
    val g = got.orderBy("grp", "id").collect().toSeq
    val w = want.orderBy("grp", "id").collect().toSeq
    assert(g == w)
  }

  test("k larger than every group returns the whole frame") {
    val df = docs
    val got = TopK.groupedTopK(df, Seq("grp"), Seq(("id", true)), 10000)
    assert(got.count() == df.count())
  }

  test("multi-column groups and ascending order") {
    val df = docs.withColumn("par", $"id" % 2)
    val got = TopK.groupedTopK(df, Seq("grp", "par"), Seq(("score", true), ("id", true)), 2)
    val want = df
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"grp", $"par").orderBy($"score".asc, $"id".asc)))
      .filter($"rn" <= 2).drop("rn")
    assert(got.orderBy("grp", "par", "id").collect().toSeq ==
      want.orderBy("grp", "par", "id").collect().toSeq)
  }

  test("plan: partial + final heap execs around one shuffle, no sort, no window") {
    val got = TopK.groupedTopK(docs, Seq("grp"), Seq(("score", false), ("id", true)), 3)
    got.collect() // finalize AQE
    val plan = got.queryExecution.executedPlan
    val topks = collect(plan) { case e: GroupedTopKExec => e }
    assert(topks.map(_.partial).sorted == Seq(false, true),
      s"want one partial and one final GroupedTopKExec, got $topks")
    assert(collect(plan) { case e: ShuffleExchangeLike => e }.size == 1)
    assert(collect(plan) { case s: org.apache.spark.sql.execution.SortExec => s }.isEmpty,
      "heap top-k must not sort")
    assert(collect(plan) { case w: org.apache.spark.sql.execution.window.WindowExec => w }.isEmpty)
  }

  test("InferGroupedTopK rewrites the row_number-filter spelling (rank kept)") {
    val df = docs
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"grp").orderBy($"score".desc, $"id".asc)))
      .filter($"rank" <= 4)
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan
    assert(collect(plan) { case e: GroupedTopKExec => e }.nonEmpty,
      s"window spelling should plan as GroupedTopKExec:\n$plan")
    assert(collect(plan) { case w: org.apache.spark.sql.execution.window.WindowExec => w }.isEmpty)
    // ranks are right: per group exactly 1..min(4, groupSize), order-matched
    val byGroup = rows.groupBy(_.getString(1))
    byGroup.foreach { case (_, rs) =>
      val sorted = rs.sortBy(r => (-r.getInt(2), r.getLong(0)))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to rs.length))
    }
    // and equal to the un-extension truth computed via a plain sort
    val want = docs.collect().groupBy(_.getString(1)).toSeq.flatMap { case (_, rs) =>
      rs.sortBy(r => (-r.getInt(2), r.getLong(0))).take(4).toSeq
    }
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet ==
      want.map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet)
  }

  test("InferGroupedTopK keeps residual predicates and rank references") {
    val df = docs
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"grp").orderBy($"score".desc, $"id".asc)))
      .filter($"rank" <= 4 && $"rank" =!= 2 && $"score" > 10)
    val rows = df.collect()
    assert(collect(df.queryExecution.executedPlan) { case e: GroupedTopKExec => e }.nonEmpty)
    assert(rows.forall(r => r.getInt(3) != 2 && r.getInt(3) <= 4 && r.getInt(2) > 10))
  }

  test("InferGroupedTopK leaves rank-only windows and other rank functions alone") {
    // no filter -> no rewrite
    val unfiltered = docs.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy($"grp").orderBy($"score".desc, $"id".asc)))
    unfiltered.collect()
    assert(collect(unfiltered.queryExecution.executedPlan) {
      case e: GroupedTopKExec => e }.isEmpty)
    // dense_rank() has no bounded-survivor contract -> no rewrite
    val ranked = docs.withColumn("rank", dense_rank().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy($"grp").orderBy($"score".desc)))
      .filter($"rank" <= 3)
    ranked.collect()
    assert(collect(ranked.queryExecution.executedPlan) {
      case e: GroupedTopKExec => e }.isEmpty)
  }

  test("InferGroupedTopK rewrites rank() <= k with boundary ties kept") {
    // score-only order on a frame engineered to tie at every boundary
    val df = (1 to 600).map(i => (i.toLong, s"g${i % 7}", (i / 3) % 11))
      .toDF("id", "grp", "score")
    val ranked = df.withColumn("rank", rank().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy($"grp").orderBy($"score".desc)))
      .filter($"rank" <= 3)
    val rows = ranked.collect()
    assert(collect(ranked.queryExecution.executedPlan) {
      case e: GroupedTopKExec => e }.exists(_.ties),
      "rank() spelling should plan as ties-mode GroupedTopKExec")
    assert(collect(ranked.queryExecution.executedPlan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w }.isEmpty)
    // truth from the un-rewritten window plan
    spark.conf.set("spark.graft.topk.rewrite", "false")
    try {
      val w = df.withColumn("rank", rank().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"grp").orderBy($"score".desc)))
        .filter($"rank" <= 3)
      assert(collect(w.queryExecution.executedPlan) {
        case e: GroupedTopKExec => e }.isEmpty)
      val wd = w.collect()
      assert(rows.map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).toSet ==
        wd.map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).toSet)
      assert(rows.length == wd.length)
      // ties really happen: some group keeps more than k rows
      assert(rows.groupBy(_.getString(1)).values.exists(_.length > 3))
    } finally spark.conf.set("spark.graft.topk.rewrite", "true")
  }

  test("partial flush is byte-accounted: wide rows trip it and stay exact") {
    val wide = (1 to 400).map { i =>
      (i.toLong, s"g${i % 89}", i * 37 % 211, "x" * 2048)
    }.toDF("id", "grp", "score", "payload")
    spark.conf.set("spark.graft.topk.partial.flushBytes", "65536")
    try {
      val got = TopK.groupedTopK(wide, Seq("grp"),
        Seq(("score", false), ("id", true)), 2)
      val rows = got.collect()
      val partials = collect(got.queryExecution.executedPlan) {
        case e: GroupedTopKExec if e.partial => e
      }
      assert(partials.nonEmpty)
      assert(partials.head.metrics("partialFlushes").value > 0,
        "64 KiB ceiling over ~800 KiB of retained payload must flush")
      val want = wide
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"grp").orderBy($"score".desc, $"id".asc)))
        .filter($"rn" <= 2).drop("rn")
      assert(rows.map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet ==
        want.collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet)
    } finally spark.conf.unset("spark.graft.topk.partial.flushBytes")
  }

  test("partial flush keeps the operator exact (flush smaller than a group)") {
    // force many distinct groups so the partial map carries weight, and
    // verify against the window plan on the same total order
    val df = (1 to 2000).map(i => (i.toLong, s"g${i % 997}", i * 31 % 503)).toDF("id", "grp", "score")
    val got = TopK.groupedTopK(df, Seq("grp"), Seq(("score", false), ("id", true)), 2)
    val want = df
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"grp").orderBy($"score".desc, $"id".asc)))
      .filter($"rn" <= 2).drop("rn")
    assert(got.orderBy("grp", "id").collect().toSeq ==
      want.orderBy("grp", "id").collect().toSeq)
  }
}
