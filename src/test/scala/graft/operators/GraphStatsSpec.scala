package graft.operators

import graft.SparkSpec

class GraphStatsSpec extends SparkSpec {

  import spark.implicits._

  private def r(edges: Seq[(Long, Long)]): (Long, Option[Double]) = {
    val row = GraphStats.assortativity(edges.toDF("src", "dst")).head()
    (row.getAs[Long]("m"),
      if (row.isNullAt(row.fieldIndex("r"))) None
      else Some(row.getAs[Double]("r")))
  }

  test("star is maximally disassortative (r = -1)") {
    val (m, rv) = r(Seq((1L, 2L), (1L, 3L), (1L, 4L)))
    assert(m == 6) // symmetric
    assert(rv.contains(-1.0))
  }

  test("regular graph has zero degree variance → null r") {
    // ring: every degree 2
    val (_, rv) = r(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    assert(rv.isEmpty)
  }

  test("two hubs cross-linked push r positive vs the star") {
    // hubs 1,2 linked to each other and to their own leaves
    val hubby = r(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 5L), (2L, 6L)))._2.get
    val star = r(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L)))._2.get
    assert(star == -1.0)
    assert(hubby > star)
  }

  test("direction and duplicates don't change the coefficient") {
    val a = r(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 5L)))
    val b = r(Seq((2L, 1L), (3L, 1L), (1L, 4L), (2L, 5L), (1L, 2L), (5L, 2L)))
    assert(a == b)
  }
}
