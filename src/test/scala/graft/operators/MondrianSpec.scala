package graft.operators

import graft.SparkSpec

class MondrianSpec extends SparkSpec {

  import spark.implicits._

  test("uniform 1-dim domain splits into exact k-sized classes") {
    val df = (1L to 100L).toDF("v")
    val out = Privacy.mondrian(df, Seq("v"), k = 25)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    // 100 uniform values, k=25 -> 4 classes of exactly 25
    val classes = out.map(t => (t._2, t._3)).distinct.sorted
    assert(classes === Seq((1L, 25L), (26L, 50L), (51L, 75L), (76L, 100L)))
    assert(out.forall(_._4 == 25L))
    assert(out.forall(_._5))
    // every value sits inside its class range
    assert(out.forall(t => t._1 >= t._2 && t._1 <= t._3))
  }

  test("2-dim: every class keeps >= k rows and ranges are disjoint boxes") {
    val df = (0 until 400).map(i => ((i % 23).toLong, (i % 17).toLong))
      .toDF("a", "b")
    val out = Privacy.mondrian(df, Seq("a", "b"), k = 30).collect()
    val classes = out.map(r => (r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6))).distinct
    assert(classes.forall(_._5 >= 30L), "every class >= k")
    assert(classes.length > 1, "the domain must actually split")
    // class sizes add to the corpus
    assert(classes.map(_._5).sum === 400L)
    // boxes are pairwise disjoint (no (a,b) cell can be in two classes)
    val cells = out.map(r => (r.getLong(0), r.getLong(1)))
    assert(cells.distinct.length === cells.length)
  }

  test("total below k yields one non-anonymous partition") {
    val df = Seq(1L, 2L, 3L).toDF("v")
    val out = Privacy.mondrian(df, Seq("v"), k = 25).collect()
    assert(out.length === 3)
    assert(out.forall(!_.getBoolean(4)))
    assert(out.forall(_.getLong(3) === 3L))
  }

  test("the widest normalized dimension splits first") {
    // dim a spans 0..99, dim b only 0..1 — first split must be on a
    val df = (0 until 200).map(i => ((i % 100).toLong, (i % 2).toLong))
      .toDF("a", "b")
    val out = Privacy.mondrian(df, Seq("a", "b"), k = 50).collect()
    val aRanges = out.map(r => (r.getLong(2), r.getLong(4))).distinct
    assert(aRanges.length > 1, "dimension a must have been cut")
  }
}
