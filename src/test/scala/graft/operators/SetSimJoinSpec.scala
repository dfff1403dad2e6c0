package graft.operators

import graft.SparkSpec

class SetSimJoinSpec extends SparkSpec {

  import spark.implicits._

  private def asSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
    df.collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
      r.getAs[Long]("inter"), r.getAs[Long]("uni"))).toSet

  test("hand case: identical, boundary-exact, and below-threshold pairs") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "ALPHA beta, gamma delta!"),      // identical after normalize → J=1
      (3L, "alpha beta gamma epsilon"),      // vs 1: inter 3, uni 5 → 0.6
      (4L, "zeta eta theta iota")            // disjoint
    ).toDF("doc_id", "text")
    // t = 3/5: pair (1,3) sits exactly on the boundary and must be KEPT
    val got = asSet(SetSimJoin.selfJoin(docs, tNum = 3, tDen = 5))
    assert(got.contains((1L, 2L, 4L, 4L)))
    assert(got.contains((1L, 3L, 3L, 5L)))
    assert(got.contains((2L, 3L, 3L, 5L)))
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L))
    // t just above the boundary drops the 0.6 pairs, keeps the identical one
    val tighter = asSet(SetSimJoin.selfJoin(docs, tNum = 61, tDen = 100))
    assert(tighter == Set((1L, 2L, 4L, 4L)))
  }

  test("no false negatives: filtered join ≡ brute force across thresholds") {
    // deliberately skewed vocabulary: 'the'/'of' appear in most docs, so
    // the prefix filter must rely on rare-token ordering to stay exact
    val docs = Seq(
      (1L, "the cat sat of the mat"),
      (2L, "the cat sat of the hat"),
      (3L, "the dog sat of the mat"),
      (4L, "a dog barked at the cat"),
      (5L, "entirely different words here now"),
      (6L, "entirely different words here today"),
      (7L, "the the the of of of"),           // collapses to {the, of}
      (8L, "of the"),                          // same token set as 7
      (9L, ""),                                // empty → no pairs
      (10L, "cat")                             // singleton set
    ).toDF("doc_id", "text")
    for ((n, d) <- Seq((1, 2), (1, 3), (2, 5), (7, 10), (9, 10))) {
      val fast  = asSet(SetSimJoin.selfJoin(docs, tNum = n, tDen = d))
      val brute = asSet(SetSimJoin.bruteForce(docs, "text", n, d))
      assert(fast == brute, s"mismatch at t=$n/$d: fast=$fast brute=$brute")
    }
  }

  test("empty and blank docs never pair; t=1 keeps only identical sets") {
    val docs = Seq(
      (1L, "x y z"), (2L, "z y x"), (3L, "x y"), (4L, "   "), (5L, "")
    ).toDF("doc_id", "text")
    val got = asSet(SetSimJoin.selfJoin(docs, tNum = 1, tDen = 1))
    assert(got == Set((1L, 2L, 3L, 3L)))
  }

  test("rep-collapse: copies fold into one node, sizes carried, pairs agree") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),    // exact dup of 1
      (3L, "ALPHA beta gamma delta!"),   // normalizes identical too
      (4L, "alpha beta gamma epsilon"),  // J = 3/5 vs the group
      (5L, "unrelated tokens entirely")
    ).toDF("doc_id", "text")
    val reps = SetSimJoin.selfJoinReps(docs, tNum = 3, tDen = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(5), r.getLong(6)))
    // group {1,2,3} collapses to rep 1 (size 3); pair (1, 4) at J=0.6
    assert(reps.toSeq == Seq((1L, 4L, 3L, 1L)))
    // the rep-grain pair set matches the full join collapsed by identity
    val full = SetSimJoin.selfJoin(docs, tNum = 3, tDen = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == Set((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L), (3L, 4L)))
  }

  test("invalid thresholds rejected") {
    val docs = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] { SetSimJoin.selfJoin(docs, tNum = 0, tDen = 5) }
    intercept[IllegalArgumentException] { SetSimJoin.selfJoin(docs, tNum = 6, tDen = 5) }
  }
}
