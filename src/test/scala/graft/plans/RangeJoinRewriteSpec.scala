package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class RangeJoinRewriteSpec extends SparkSpec {

  import spark.implicits._

  private val W = "spark.graft.rangejoin.bucketWidth"

  private def withWidth[A](w: Long)(f: => A): A = {
    spark.conf.set(W, w.toString)
    try f finally spark.conf.unset(W)
  }

  private def points(vs: Long*) = vs.toDF("p")
  private def intervals(iv: (Long, Long, String)*) =
    iv.toSeq.toDF("s", "e", "tag")

  private def planOf(df: DataFrame): String = {
    df.collect() // AQE: executedPlan is final only after execution
    df.queryExecution.executedPlan.toString
  }

  test("naive theta spelling plans BNLJ off, bucketed equi-join on") {
    val pt = points(1L, 5L, 12L, 99L)
    val iv = intervals((0L, 10L, "a"), (10L, 20L, "b"))
    val naive = pt.join(iv, col("p") >= col("s") && col("p") < col("e"))
    assert(planOf(naive).contains("BroadcastNestedLoopJoin"))
    withWidth(10L) {
      val fast = pt.join(iv, col("p") >= col("s") && col("p") < col("e"))
      val plan = planOf(fast)
      assert(!plan.contains("BroadcastNestedLoopJoin")
        && !plan.contains("CartesianProduct"), plan)
      assert(plan.contains("_graft_bkt"), plan)
    }
  }

  test("rewrite is result-identical to the naive plan, all variants") {
    val pt = points(-25L, -10L, -1L, 0L, 1L, 9L, 10L, 11L, 37L, 100L)
    val iv = intervals((-30L, -5L, "neg"), (0L, 10L, "a"), (10L, 20L, "b"),
      (5L, 5L, "empty"), (8L, 40L, "wide"), (90L, 200L, "tail"))
    def run(c: org.apache.spark.sql.Column) = {
      val naive = pt.join(iv, c).orderBy("p", "tag")
        .collect().map(_.toSeq).toSeq
      val fast = withWidth(7L) {
        pt.join(iv, c).orderBy("p", "tag").collect().map(_.toSeq).toSeq
      }
      (naive, fast)
    }
    val exc = run(col("p") >= col("s") && col("p") < col("e"))
    assert(exc._1 === exc._2 && exc._1.nonEmpty)
    val inc = run(col("p") >= col("s") && col("p") <= col("e"))
    assert(inc._1 === inc._2 && inc._1.size > exc._1.size,
      "inclusive end must admit the boundary points")
    val strict = run(col("p") > col("s") && col("p") < col("e"))
    assert(strict._1 === strict._2)
    val flipped = run(col("s") <= col("p") && col("e") > col("p"))
    assert(flipped._1 === flipped._2 && flipped._1 === exc._1)
  }

  test("residual conjuncts survive; cross-side equality disables the rewrite") {
    val pt = Seq((1L, "x"), (15L, "y")).toDF("p", "ptag")
    val iv = Seq((0L, 20L, "x"), (0L, 20L, "y")).toDF("s", "e", "tag")
    withWidth(10L) {
      val res = pt.join(iv, col("p") >= col("s") && col("p") < col("e")
          && col("ptag") === col("tag"))
      // equi conjunct exists -> hash join already; rule must skip
      assert(!planOf(res).contains("_graft_bkt"))
      assert(res.count() === 2)
      val res2 = pt.join(iv, col("p") >= col("s") && col("p") < col("e")
        && col("ptag") =!= lit("zzz"))
      assert(planOf(res2).contains("_graft_bkt"))
      assert(res2.count() === 4)
    }
  }

  test("sentinel-wide intervals route to the fallback branch, not a giant sequence()") {
    // e = Long.MaxValue with width 4 would ask sequence() for ~2^61
    // elements — hard failure before the cap. With the cap the wide
    // interval joins through the un-exploded fallback branch and the
    // result still matches the naive plan.
    val pt = points(1L, 5L, 12L, 1000000L)
    val iv = intervals((0L, 10L, "narrow"), (3L, Long.MaxValue, "open"))
    val c = col("p") >= col("s") && col("p") < col("e")
    val naive = pt.join(iv, c).orderBy("p", "tag").collect().map(_.toSeq).toSeq
    withWidth(4L) {
      val fast = pt.join(iv, c)
      val plan = planOf(fast)
      assert(plan.contains("Union"), plan) // two-branch routing present
      assert(fast.orderBy("p", "tag").collect().map(_.toSeq).toSeq === naive)
    }
  }

  test("mixed wide/narrow intervals stay exactly-once (rule does not re-fire on its own fallback)") {
    val pt = points((-3L to 40L): _*)
    val iv = intervals((0L, 10L, "a"), (-100L, 120L, "wide1"),
      (5L, 500L, "wide2"), (8L, 12L, "b"))
    val c = col("p") >= col("s") && col("p") <= col("e")
    val naive = pt.join(iv, c).collect().map(_.toSeq).toSeq.sortBy(_.toString)
    spark.conf.set("spark.graft.rangejoin.maxBuckets", "8")
    try withWidth(3L) {
      // a re-fire on the fallback branch would union in another copy of
      // the wide matches — row counts, not just sets, must agree
      val fast = pt.join(iv, c).collect().map(_.toSeq).toSeq.sortBy(_.toString)
      assert(fast === naive)
    } finally spark.conf.unset("spark.graft.rangejoin.maxBuckets")
  }

  test("lowest width-band above Long.MinValue buckets correctly (wrap-safe floorDiv)") {
    val lo = Long.MinValue
    val pt = points(lo + 1L, lo + 3L, 0L)
    val iv = intervals((lo + 1L, lo + 5L, "band"), (-2L, 3L, "zero"))
    val c = col("p") >= col("s") && col("p") < col("e")
    val naive = pt.join(iv, c).orderBy("p", "tag").collect().map(_.toSeq).toSeq
    val fast = withWidth(4L) {
      pt.join(iv, c).orderBy("p", "tag").collect().map(_.toSeq).toSeq
    }
    assert(fast === naive && naive.size === 3)
  }

  test("null bounds and null points match nothing, as in the naive plan") {
    val pt = Seq(Some(5L), None).toDF("p")
    val iv = Seq((Some(0L), Some(10L)), (None, Some(10L)),
      (Some(0L), None)).toDF("s", "e")
    val c = col("p") >= col("s") && col("p") < col("e")
    val naive = pt.join(iv, c).collect().map(_.toSeq).toSeq
    val fast = withWidth(4L) {
      pt.join(iv, c).collect().map(_.toSeq).toSeq }
    assert(fast === naive && fast.size === 1)
  }
}
