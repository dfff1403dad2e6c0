package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TermStatsSpec extends SparkSpec {

  import spark.implicits._

  test("burstiness separates clumped from evenly-spread terms") {
    // 'even' once in all 10 docs; 'bursty' 10 times in one doc
    val docs = (0 until 10).map { i =>
      (i.toLong, if (i == 0) "even " + Seq.fill(10)("bursty").mkString(" ")
        else "even filler")
    }.toDF("doc_id", "text")
    val out = TermStats.burstiness(docs, minTf = 9L)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    // even: per-doc counts all 1 across 10 docs -> var 0 -> D = 0
    assert(out("even") === 0.0)
    // bursty: one doc of 10 -> mean 1, var (10*100-100)/100=9 -> D = 9
    assert(out("bursty") === 9.0)
  }

  test("burstiness hand formula and minTf gate") {
    // term in 2 of 4 docs with counts 3, 1: tf=4, sx2=10, n=4
    // D = (4*10 - 16)/(4*4) = 24/16 = 1.5
    val docs = Seq((1L, "w w w"), (2L, "w"), (3L, "x"), (4L, "x"))
      .toDF("doc_id", "text")
    val out = TermStats.burstiness(docs, minTf = 3L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("w") === ((2L, 4L, 1.5)))
    assert(!out.contains("x"), "below-minTf terms are dropped")
  }

  test("Good-Turing: r* = (r+1) N_{r+1}/N_r, unseen mass, honest holes") {
    // counts: a,b,c once; d twice; e 4 times
    // N1=3, N2=1, N4=1; total = 3 + 2 + 4 = 9
    val docs = Seq((1L, "a b c d d e e e e")).toDF("doc_id", "text")
    val out = TermStats.goodTuring(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1),
          if (r.isNullAt(2)) null else java.lang.Double.valueOf(r.getDouble(2)),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    // r=1: r* = 2 * N2/N1 = 2/3
    assert(out(1L)._1 === 3L)
    assert(out(1L)._2 === 0.666667)
    // r=2: N3 = 0 -> hole, null (no fabricated curve)
    assert(out(2L)._2 === null && out(2L)._3 === -1L)
    // unseen mass: N1/total = 3/9
    assert(out(0L)._2 === 0.333333)
    assert(out(0L)._3 === math.round(3 * 1e6 / 9.0))
    // top count r=4 has no successor -> null
    assert(out(4L)._2 === null)
  }
}
