package graft.operators

import graft.SparkSpec

class ForgetSpec extends SparkSpec {

  import spark.implicits._

  test("purge removes exactly the forget-set rows, all occurrences") {
    val t = Seq((1L, "a"), (2L, "b"), (2L, "b2"), (3L, "c")).toDF("doc_id", "v")
    val f = Seq(2L).toDF("doc_id")
    val kept = Forget.purge(t, f).collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
  }

  test("audit: one row per table, arithmetic consistent, zero-hit tables clean") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("doc_id", "v")
    val b = Seq((2L, 1.0), (2L, 2.0), (9L, 3.0)).toDF("doc_id", "m")
    val f = Seq(2L, 100L).toDF("doc_id") // 100 hits nothing anywhere
    val rows = Forget.audit(f, Seq("a" -> a, "b" -> b))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows("a") == ((2L, 1L, 1L)))
    assert(rows("b") == ((3L, 2L, 1L))) // both rows of key 2 counted
    // invariant: n_after == purge count
    assert(Forget.purge(b, f).count() == 1L)
  }

  test("empty forget-set: audit reports zero removals everywhere") {
    val t = Seq((1L, "x")).toDF("doc_id", "v")
    val rows = Forget.audit(Seq.empty[Long].toDF("doc_id"), Seq("t" -> t))
      .head()
    assert(rows.getLong(1) == 1L && rows.getLong(2) == 0L && rows.getLong(3) == 1L)
  }
}
