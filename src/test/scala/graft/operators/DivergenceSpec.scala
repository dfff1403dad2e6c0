package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DivergenceSpec extends SparkSpec {

  import spark.implicits._

  test("identical corpora diverge by zero") {
    val d = Seq((1L, "a b c"), (2L, "c d")).toDF("doc_id", "text")
    val r = Drift.tokenDivergence(d, d).head()
    assert(r.getLong(0) === 4L)
    assert(r.getDouble(1) === 0.0 && r.getDouble(2) === 0.0
      && r.getDouble(3) === 0.0)
  }

  test("mirror-image corpora give symmetric KL and JS below ln 2") {
    val a = Seq((1L, "x x x y")).toDF("doc_id", "text")
    val b = Seq((2L, "y y y x")).toDF("doc_id", "text")
    val r = Drift.tokenDivergence(a, b).head()
    assert(r.getDouble(1) === r.getDouble(2), "symmetric counts → equal KLs")
    assert(r.getDouble(3) > 0.0 && r.getDouble(3) < math.log(2.0))
    assert(r.getDouble(3) < r.getDouble(1), "JS is bounded by the KLs")
  }

  test("smoothing keeps disjoint vocabularies finite") {
    val a = Seq((1L, "aa bb cc")).toDF("doc_id", "text")
    val b = Seq((2L, "dd ee ff")).toDF("doc_id", "text")
    val r = Drift.tokenDivergence(a, b).head()
    assert(r.getLong(0) === 6L)
    assert(!r.getDouble(1).isNaN && !r.getDouble(1).isInfinite)
    assert(r.getDouble(1) > 0.0)
  }

  test("null texts contribute nothing") {
    val a = Seq((1L, Some("a b")), (2L, None: Option[String]))
      .toDF("doc_id", "text")
    val b = Seq((3L, Some("a b"))).toDF("doc_id", "text")
    val r = Drift.tokenDivergence(a, b).head()
    assert(r.getLong(0) === 2L && r.getDouble(3) === 0.0)
  }
}
