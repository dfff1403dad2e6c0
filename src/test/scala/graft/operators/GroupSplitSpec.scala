package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GroupSplitSpec extends SparkSpec {

  import spark.implicits._

  test("group-safe splits never straddle a group") {
    val df = (0 until 300).map(i => (i.toLong, s"g${i % 40}"))
      .toDF("doc_id", "cluster")
    val out = HashSplit.groupSafeSplits(df, col("cluster"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(out.count() === 300L)
    val perGroup = out.groupBy("cluster")
      .agg(count_distinct(col("split")).as("k"))
      .agg(max(col("k"))).head().getLong(0)
    assert(perGroup === 1L, "every group must land in exactly one split")
    // group assignment must equal assignSplits on the group key itself
    val direct = HashSplit.assignSplits(
        df.select(col("cluster")).distinct(), col("cluster"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    out.select("cluster", "split").distinct().collect().foreach { r =>
      assert(direct(r.getString(0)) === r.getString(1))
    }
  }

  test("exact stratified splits hit the floor counts per stratum") {
    val df = ((0 until 100).map(i => (i.toLong, "a")) ++
      (1000 until 1037).map(i => (i.toLong, "b"))).toDF("doc_id", "lang")
    val out = HashSplit.exactStratifiedSplits(df, col("doc_id"), col("lang"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect()
    val counts = out.groupBy(r => (r.getString(1), r.getString(2)))
      .view.mapValues(_.size).toMap
    // stratum a: n=100 → 80 / 10 / 10 exactly
    assert(counts(("a", "train")) === 80 && counts(("a", "val")) === 10
      && counts(("a", "test")) === 10)
    // stratum b: n=37 → floor(29.6)=29 train, floor(33.3)−29=4 val, 4 test
    assert(counts(("b", "train")) === 29 && counts(("b", "val")) === 4
      && counts(("b", "test")) === 4)
  }

  test("exact split assignment is deterministic and seed-sensitive") {
    val df = (0 until 50).map(i => (i.toLong, "x")).toDF("doc_id", "lang")
    def run(seed: Long) = HashSplit.exactStratifiedSplits(df, col("doc_id"),
        col("lang"), Seq("train" -> 0.5, "test" -> 0.5), seed = seed)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(run(42L) === run(42L))
    assert(run(42L) !== run(7L), "different seeds must reshuffle")
  }
}
