package graft.operators

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {

  import spark.implicits._

  private def counts(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Option[Double])] =
    Triangles.count(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap

  test("one triangle: every corner counts it once, coeff 1") {
    val got = counts(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    assert(got.values.forall(_ == ((2L, 1L, Some(1.0)))))
  }

  test("triangle + pendant: pendant has no triangles, degree-1 coeff null") {
    val got = counts(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)))
    assert(got(1L) == ((2L, 1L, Some(1.0))))
    assert(got(3L)._1 == 3L && got(3L)._2 == 1L)
    assert(got(3L)._3.contains(0.333333)) // 2·1/(3·2), 6dp
    assert(got(4L) == ((1L, 0L, None)))
  }

  test("K4: every node in 3 triangles, coeff 1") {
    val k4 = for (i <- 1L to 4L; j <- 1L to 4L if i < j) yield (i, j)
    val got = counts(k4)
    assert(got.values.forall(_ == ((3L, 3L, Some(1.0)))))
  }

  test("square (C4): no triangles, coeff 0") {
    val got = counts(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    assert(got.values.forall { case (d, t, c) => d == 2L && t == 0L && c.contains(0.0) })
  }

  test("duplicates, reversed edges, and self-loops don't change counts") {
    val base = counts(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    val noisy = counts(Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L),
      (1L, 3L), (2L, 2L), (1L, 2L)))
    assert(base == noisy)
  }
}
