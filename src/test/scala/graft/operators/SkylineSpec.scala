package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class SkylineSpec extends SparkSpec {

  import spark.implicits._

  private def front(rows: Seq[(Long, Long, Long)]): Set[Long] =
    Skyline.frontier2(rows.toDF("id", "x", "y"),
      col("id"), col("x"), col("y"))
      .collect().map(_.getLong(0)).toSet

  test("hand case: staircase survives, interior dominated") {
    // (10,1) (5,5) (1,10) form the frontier; (4,4) and (5,1) dominated
    val rows = Seq((1L, 10L, 1L), (2L, 5L, 5L), (3L, 1L, 10L),
      (4L, 4L, 4L), (5L, 5L, 1L))
    assert(front(rows) === Set(1L, 2L, 3L))
  }

  test("exact-duplicate points are both on the frontier") {
    val rows = Seq((1L, 5L, 5L), (2L, 5L, 5L), (3L, 1L, 1L))
    assert(front(rows) === Set(1L, 2L))
  }

  test("same x, different y: only the max-y row survives") {
    val rows = Seq((1L, 5L, 5L), (2L, 5L, 4L), (3L, 6L, 1L))
    assert(front(rows) === Set(1L, 3L))
  }

  test("matches brute-force dominance on pseudo-random data") {
    val rnd = new scala.util.Random(42)
    val rows = (1L to 200L).map(i =>
      (i, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    def dominated(t: (Long, Long, Long)) = rows.exists(o =>
      o._2 >= t._2 && o._3 >= t._3 && (o._2 > t._2 || o._3 > t._3))
    val expect = rows.filterNot(dominated).map(_._1).toSet
    assert(front(rows) === expect)
  }
}
