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

  test("a null quasi-identifier fails fast with the offending column named") {
    val df = Seq(Some(1L), Some(2L), None, Some(4L)).toDF("v")
    val e = intercept[IllegalArgumentException] {
      Privacy.mondrian(df, Seq("v"), k = 2)
    }
    assert(e.getMessage.contains("null quasi-identifier") &&
      e.getMessage.contains("v"), e.getMessage)
  }

  test("wide 64-bit QI domains order dimensions without overflow") {
    // widths ~2^42 and ~2^41: the old raw-long cross-multiplication
    // width(a)*globalW(b) overflowed (2^83), flipping the
    // widest-dimension choice nondeterministically. dim a is twice as
    // wide as b, so with equal global widths... a must split first —
    // assert a genuinely splits and the recursion completes.
    val wa = 1L << 42
    val wb = 1L << 41
    val df = (0 until 64).map(i => ((i % 8) * (wa / 7), (i % 4) * (wb / 3)))
      .toDF("a", "b")
    val out = Privacy.mondrian(df, Seq("a", "b"), k = 16).collect()
    // (i%8, i%4) has only 8 distinct tuples (i%4 = (i%8)%4) and the
    // output is census grain: one row per distinct QI tuple
    assert(out.length === 8)
    val aRanges = out.map(r => (r.getLong(2), r.getLong(4))).distinct
    assert(aRanges.length > 1, "the wide dimension must have been cut")
    val classes = out.map(r => (r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6))).distinct
    assert(classes.forall(_._5 >= 16L))
    assert(classes.map(_._5).sum === 64L)
  }
}
