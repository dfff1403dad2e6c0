package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AssociationRulesSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(String, String)], minSup: Long = 0L,
                  minConf: Long = 0L) =
    AssociationRules.rules(rows.toDF("bk", "it"),
        col("bk"), col("it"), minSup, minConf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap

  test("hand-computed support, confidence, lift on 4 baskets") {
    // b1{x,y} b2{x,y} b3{x} b4{y,z}: n_x=3 n_y=3 n_xy=2 B=4
    val rows = Seq("1" -> "x", "1" -> "y", "2" -> "x", "2" -> "y",
      "3" -> "x", "4" -> "y", "4" -> "z")
    val out = run(rows)
    val xy = out(("x", "y"))
    assert(xy.getLong(2) === 4L && xy.getLong(3) === 3L
      && xy.getLong(5) === 2L)
    assert(xy.getDouble(6) === 0.5) // support 2/4
    assert(xy.getDouble(7) === 2.0 / 3.0)
    assert(xy.getDouble(8) === 2.0 * 4 / (3.0 * 3)) // lift 8/9 < 1
    // both directions exist with symmetric support, per-side confidence
    assert(out(("y", "x")).getDouble(6) === 0.5)
  }

  test("presence semantics: duplicate items in a basket count once") {
    val rows = Seq("1" -> "x", "1" -> "x", "1" -> "y", "2" -> "x",
      "2" -> "y")
    val out = run(rows)
    assert(out(("x", "y")).getLong(5) === 2L)
    assert(out(("x", "y")).getDouble(7) === 1.0)
  }

  test("thresholds are exact integer gates, not float comparisons") {
    // support xy = 1/3; minSup exactly 1/3 in micro must KEEP the rule
    // under cross-multiplication (1*1e6 >= 333333*3 is false only for
    // the rounded-down micro -- use 333334 to show the reject side)
    val rows = Seq("1" -> "x", "1" -> "y", "2" -> "x", "3" -> "y")
    assert(run(rows, minSup = 333333L).contains(("x", "y")))
    assert(!run(rows, minSup = 333334L).contains(("x", "y")))
  }

  test("conviction is null exactly at confidence 1") {
    val rows = Seq("1" -> "x", "1" -> "y", "2" -> "x", "2" -> "y",
      "3" -> "y")
    val out = run(rows)
    assert(out(("x", "y")).isNullAt(10), "conf(x->y)=1 -> null conviction")
    val yx = out(("y", "x"))
    assert(!yx.isNullAt(10))
    // conviction(y->x) = (1 - 2/3)/(1 - 2/3) = 1
    assert(yx.getDouble(10) === 1.0)
  }
}
