package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TableDiffSpec extends SparkSpec {

  import spark.implicits._

  private def mk(rows: Seq[(Long, Option[Long], String)]) =
    rows.toDF("k", "v", "s")

  private def run(before: Seq[(Long, Option[Long], String)],
                  after: Seq[(Long, Option[Long], String)]) =
    TableDiff.diff(mk(before), mk(after), Seq("k"))
      .collect().map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) null else r.getSeq[String](2).toList)).toMap

  test("adds, removes, per-column change attribution; identical rows dropped") {
    val before = Seq((1L, Some(10L), "a"), (2L, Some(20L), "b"),
      (3L, Some(30L), "c"), (4L, Some(40L), "d"))
    val after = Seq((2L, Some(20L), "b"), (3L, Some(31L), "c"),
      (4L, Some(41L), "e"), (5L, Some(50L), "f"))
    val out = run(before, after)
    assert(out(1L) === (("removed", null)))
    assert(out(5L) === (("added", null)))
    assert(out(3L) === (("changed", List("v"))))
    assert(out(4L) === (("changed", List("v", "s"))))
    assert(!out.contains(2L), "identical rows must not appear")
  }

  test("null transitions are changes; null-to-null is not") {
    val out = run(
      Seq((1L, Some(1L), "x"), (2L, None, "x"), (3L, None, "x")),
      Seq((1L, None, "x"), (2L, Some(9L), "x"), (3L, None, "x")))
    assert(out(1L)._2 === List("v"))
    assert(out(2L)._2 === List("v"))
    assert(!out.contains(3L))
  }

  test("schema mismatch fails fast") {
    intercept[IllegalArgumentException] {
      TableDiff.diff(mk(Seq((1L, Some(1L), "a"))),
        Seq((1L, 1L)).toDF("k", "v"), Seq("k"))
    }
  }
}
