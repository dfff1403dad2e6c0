package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val train = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2L, "one two three four five six seven eight nine ten"),
    (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa extra tail words here")
  ).toDF("doc_id", "text")

  test("a prefix of a train doc scores containment 1.0 against it") {
    val test = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val r = Decontaminate.report(test, train, threshold = 0.8)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2), x.getLong(3)))
    assert(r.length == 1)
    val (tid, best, c, n) = r.head
    assert(tid == 100L && c == 1.0)
    assert(best == 1L, "min train_id tiebreak between docs 1 and 3")
    assert(n == 2L, "prefix is contained in both 1 and its superset 3")
  }

  test("asymmetry: short test inside long train scores 1.0, not diluted") {
    val test = Seq((100L, "one two three four")).toDF("doc_id", "text")
    val r = Decontaminate.report(test, train, threshold = 0.99).collect()
    assert(r.length == 1 && r.head.getDouble(2) == 1.0)
    // the symmetric jaccard of the same pair would be far below 1
    val j = Dedup.ngramJaccard(
        Seq((100L, 2L)).toDF("doc_a", "doc_b"),
        test.unionByName(train.where($"doc_id" === 2L)))
      .head().getAs[Double]("jaccard")
    assert(j < 0.5)
  }

  test("unrelated text reports nothing") {
    val test = Seq((100L, "completely unrelated words not present")).toDF("doc_id", "text")
    assert(Decontaminate.report(test, train, threshold = 0.5).count() == 0)
  }

  test("maxDf stop-shingle cap only lowers scores (false negatives, never positives)") {
    // shingle "alpha beta gamma" occurs in train docs 1 and 3 → df = 2
    val test = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val uncapped = Decontaminate.report(test, train, threshold = 0.0)
      .select("max_containment").head().getDouble(0)
    val capped = Decontaminate.report(test, train, threshold = 0.0, maxDf = 1L)
      .collect().map(_.getAs[Double]("max_containment")).headOption.getOrElse(0.0)
    assert(capped <= uncapped)
    assert(capped < 1.0, "df-2 shingles dropped from the index")
  }
}
