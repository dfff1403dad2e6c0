package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CoocSpec extends SparkSpec {

  import spark.implicits._

  test("hand-computed window-2 census with 1/d weights") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    val out = SkipGram.weightedCooccurrence(df, window = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(out(("a", "b")) === ((1L, 1000000L)))
    assert(out(("b", "a")) === ((1L, 1000000L)))
    assert(out(("b", "c")) === ((1L, 1000000L)))
    assert(out(("a", "c")) === ((1L, 500000L)))
    assert(out(("c", "a")) === ((1L, 500000L)))
    assert(out.size === 6)
  }

  test("repeats accumulate and symmetry holds") {
    val df = Seq((1L, "x y x")).toDF("doc_id", "text")
    val out = SkipGram.weightedCooccurrence(df, window = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // (x,y): pos0→1 d1 and pos2→1 d1 → n=2, x=2e6
    assert(out(("x", "y")) === ((2L, 2000000L)))
    assert(out(("y", "x")) === ((2L, 2000000L)))
    // (x,x): pos0↔2 d2 both directions → n=2, x=1e6
    assert(out(("x", "x")) === ((2L, 1000000L)))
  }

  test("windows never cross documents") {
    val df = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    val keys = SkipGram.weightedCooccurrence(df, window = 5).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(keys === Set(("a", "b"), ("b", "a"), ("c", "d"), ("d", "c")))
  }
}
