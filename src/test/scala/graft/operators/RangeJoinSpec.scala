package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val points = Seq(
    (1L, 5L), (2L, 10L), (3L, 19L), (4L, 20L), (5L, 35L), (6L, 100L))
    .toDF("pid", "p")
  private val intervals = Seq(
    (10L, 10L, 20L), (20L, 0L, 6L), (30L, 30L, 40L))
    .toDF("iid", "s", "e")

  private def resultSet(bucketWidth: Long): Set[(Long, Long)] =
    RangeJoin.bucketed(points, intervals, "p", "s", "e", bucketWidth)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("matches the naive theta join; start inclusive, end exclusive") {
    val naive = points.join(intervals, $"p" >= $"s" && $"p" < $"e")
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive == Set((1L, 20L), (2L, 10L), (3L, 10L), (5L, 30L)),
      s"test fixture sanity: $naive")
    assert(resultSet(7) == naive)
    // point 4 at p=20 is excluded: end-exclusive
    assert(!resultSet(7).exists(_._1 == 4L))
  }

  test("result is bucket-width invariant (incl. widths hitting boundaries)") {
    val expected = resultSet(7)
    for (w <- Seq(1L, 2L, 5L, 10L, 13L, 100L))
      assert(resultSet(w) == expected, s"bucket width $w changed the result")
  }

  test("no duplicate pairs: each match meets in exactly one bucket") {
    val rows = RangeJoin.bucketed(points, intervals, "p", "s", "e", 3)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length == rows.toSet.size, s"duplicates in $rows")
  }

  test("empty and inverted intervals are dropped") {
    val bad = Seq((40L, 50L, 50L), (41L, 60L, 55L)).toDF("iid", "s", "e")
    assert(RangeJoin.bucketed(points, bad, "p", "s", "e", 10).count() == 0)
  }
}
