package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SetCoverSpec extends SparkSpec {

  private def run(pairs: Seq[(Long, String)], k: Int) = {
    import spark.implicits._
    SetCover.greedyCoverage(pairs.toDF("id", "w"), col("id"), col("w"), k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
  }

  test("greedy picks the largest marginal gain each round") {
    // doc 1 covers {a,b,c}, doc 2 covers {c,d}, doc 3 covers {d}
    val out = run(Seq(1L -> "a", 1L -> "b", 1L -> "c",
      2L -> "c", 2L -> "d", 3L -> "d"), 3)
    assert(out(0) === ((1L, 1L, 3L, 3L)))
    // after 1: doc 2 adds only d (gain 1), doc 3 adds d (gain 1) — tie
    // breaks to the lower id
    assert(out(1) === ((2L, 2L, 1L, 4L)))
    assert(out(2) === ((3L, 3L, 0L, 4L)))
  }

  test("greedy beats the naive biggest-set order when sets overlap") {
    // doc 1 = {a,b,c,d}, doc 2 = {a,b,c}, doc 3 = {e,f} — after doc 1,
    // doc 3's fresh elements beat doc 2's fully-covered set
    val out = run(Seq(1L -> "a", 1L -> "b", 1L -> "c", 1L -> "d",
      2L -> "a", 2L -> "b", 2L -> "c", 3L -> "e", 3L -> "f"), 2)
    assert(out.map(_._2).toSeq === Seq(1L, 3L))
    assert(out(1)._4 === 6L)
  }

  test("duplicate pairs count once and k beyond the doc count stops") {
    val out = run(Seq(1L -> "a", 1L -> "a", 2L -> "b"), 5)
    assert(out.length === 2)
    assert(out(0) === ((1L, 1L, 1L, 1L)))
    assert(out(1) === ((2L, 2L, 1L, 2L)))
  }
}
