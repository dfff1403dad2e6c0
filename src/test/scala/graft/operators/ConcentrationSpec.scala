package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class ConcentrationSpec extends SparkSpec {

  import spark.implicits._

  private def censusOf(masses: Map[String, Int]) =
    masses.toSeq.flatMap { case (g, n) => Seq.fill(n)(g) }
      .toDF("g").groupBy("g").count().withColumnRenamed("count", "cnt")

  test("gini: uniform mix scores 0, heavy concentration approaches 1") {
    val uniform = Concentration.gini(
      censusOf(Map("a" -> 25, "b" -> 25, "c" -> 25, "d" -> 25))).head()
    assert(uniform.getDouble(2) === 0.0)
    val skewed = Concentration.gini(
      censusOf(Map("a" -> 97, "b" -> 1, "c" -> 1, "d" -> 1))).head()
    assert(skewed.getDouble(2) > 0.7, s"skew must score high: $skewed")
  }

  test("entropy: uniform → norm 1, degenerate single group → null norm") {
    val u = Concentration.entropy(
      censusOf(Map("a" -> 10, "b" -> 10, "c" -> 10, "d" -> 10))).head()
    assert(math.abs(u.getDouble(3) - 1.0) < 1e-5)
    assert(math.abs(u.getDouble(2) - math.log(4)) < 1e-5)
    val one = Concentration.entropy(censusOf(Map("a" -> 42))).head()
    assert(one.getDouble(2) === 0.0 && one.isNullAt(3))
  }

  test("coverage: monotone non-decreasing, hits 1.0 at the full census") {
    val cov = Concentration.coverage(
        censusOf(Map("a" -> 50, "b" -> 30, "c" -> 15, "d" -> 5)), topK = 4)
      .orderBy("rank").collect()
    val shares = cov.map(_.getDouble(3))
    assert(shares.zip(shares.tail).forall { case (x, y) => x <= y })
    assert(shares.last === 1.0)
    assert(cov.head.getString(1) === "a" && shares.head === 0.5)
  }
}
