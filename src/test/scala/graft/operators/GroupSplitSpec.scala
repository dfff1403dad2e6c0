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

  private def tsFrame(micros: Seq[Long]) =
    micros.zipWithIndex
      .map { case (us, i) => (i.toLong, new java.sql.Timestamp(us / 1000)) }
      .toDF("id", "ts")

  test("temporal split: train takes the exact k-th cut, embargo gap excluded") {
    // 10 rows at second marks 0..9; k = 10*7 div 10 = 7 → cut = 7th
    // smallest = t6; embargo 2s → t7, t8 embargoed, t9 test
    val df = tsFrame((0 until 10).map(_ * 1000000L))
    val out = HashSplit.temporalSplit(df, col("ts"), 7L, 10L, 2000000L)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert((0 to 6).forall(i => out(i.toLong) == "train"))
    assert(out(7L) === "embargo" && out(8L) === "embargo")
    assert(out(9L) === "test")
  }

  test("temporal split: no row in test is within embargo of any train row") {
    val df = tsFrame((0 until 97).map(i => (i.toLong * 31L + 7L) * 1000000L))
    val out = HashSplit.temporalSplit(df, col("ts"), 4L, 5L, 60000000L)
      .withColumn("us", unix_micros(col("ts")))
      .collect().map(r => (r.getString(2), r.getAs[Long]("us")))
    val trainMax = out.collect { case ("train", us) => us }.max
    val testMin = out.collect { case ("test", us) => us }.min
    assert(testMin > trainMax + 60000000L)
  }

  test("temporal split: ties at the cut all land in train") {
    val df = tsFrame(Seq(0L, 1000000L, 1000000L, 1000000L, 2000000L, 3000000L))
    // n=6, k = 6*1 div 2 = 3 → cut = 3rd smallest = 1s; all three ties ≤ cut
    val out = HashSplit.temporalSplit(df, col("ts"), 1L, 2L, 0L)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(Seq(0L, 1L, 2L, 3L).forall(out(_) == "train"))
    assert(out(4L) === "test" && out(5L) === "test")
  }
}
