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

  private def q(edges: Seq[(Long, Long)], labels: Seq[(Long, Long)]) =
    GraphStats.modularity(edges.toDF("src", "dst"),
      labels.toDF("node", "label")).head()

  test("modularity: two separate triangles as two communities = 0.5") {
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L), (6L, 4L))
    val r = q(tri, Seq(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L))
    assert(r.getLong(0) === 6L && r.getLong(1) === 2L)
    assert(r.getDouble(2) === 0.5)
  }

  test("modularity: everything in one community scores 0") {
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L), (6L, 4L))
    val r = q(tri, (1L to 6L).map(_ -> 1L))
    assert(r.getDouble(2) === 0.0)
  }

  test("modularity: splitting a clique hurts (negative-leaning Q)") {
    // K4 split down the middle: Q = 2·(1/6 − (6/12)²) ... with e_c = 1,
    // d_c = 6 per half over m = 6: Q = 2·(4·6·1 − 36)/(4·36) = -1/6
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val r = q(k4.toSeq, Seq(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
    assert(r.getDouble(2) === -0.166667)
  }

  test("modularity: direction/duplicates/self-loops are normalized away") {
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val noisy = tri ++ tri.map(_.swap) ++ Seq((2L, 2L))
    val lab = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L)
    assert(q(tri, lab).toSeq === q(noisy, lab).toSeq)
  }
}
