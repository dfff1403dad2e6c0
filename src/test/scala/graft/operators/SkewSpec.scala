package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val big = Seq(
    (1L, "a"), (1L, "b"), (1L, "c"), (1L, "d"), // hot key
    (2L, "e"), (3L, "f")).toDF("k", "v")
  private lazy val dim = Seq((1L, "one"), (2L, "two"), (4L, "four")).toDF("k", "name")

  test("salted inner join equals the plain join") {
    val plain = big.join(dim, Seq("k")).select("k", "v", "name")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(big, dim, Seq("k"), buckets = 3)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted === plain)
  }

  test("salted left join keeps unmatched big-side rows exactly once") {
    val salted = Skew.saltedJoin(big, dim, Seq("k"), buckets = 3, joinType = "left")
    assert(salted.count() === big.count())
    assert(salted.where($"k" === 3L && $"name".isNull).count() === 1)
  }

  test("salted aggregation equals one-phase groupBy") {
    val df = Seq(("x", 1.0), ("x", 2.0), ("x", 3.0), ("y", 4.0)).toDF("g", "val")
    val got = Skew.saltedSumCount(df, Seq("g"), "val", buckets = 4)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got === Set(("x", 6.0, 3L), ("y", 4.0, 1L)))
  }

  test("unsupported join types are rejected") {
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(big, dim, Seq("k"), buckets = 2, joinType = "full_outer")
    }
  }
}
