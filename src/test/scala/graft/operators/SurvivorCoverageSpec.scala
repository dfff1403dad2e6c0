package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SurvivorCoverageSpec extends SparkSpec {

  import spark.implicits._

  test("survivor policy keeps the preferred copy, not the min id") {
    val docs = Seq(
      (1L, "same text", 10L), (2L, "same text", 99L), // prefer 2 (longer)
      (3L, "other", 5L)).toDF("doc_id", "text", "quality")
    val kept = Dedup.exactDedupedBy(docs, col("quality"))
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 3L))
    // ties fall back to the lowest id
    val tied = Seq((5L, "t", 1L), (4L, "t", 1L)).toDF("doc_id", "text", "q")
    assert(Dedup.exactDedupedBy(tied, col("q")).head().getLong(0) === 4L)
  }

  test("coverage curve is monotone and saturates at the full vocabulary") {
    val docs = Seq((1L, "a a a a b b c d")).toDF("doc_id", "text")
    val rows = Salience.vocabCoverage(docs, sizes = Seq(1L, 2L, 4L, 8L))
      .orderBy("size").collect()
    assert(rows.map(_.getLong(1)).toSeq === Seq(4L, 6L, 8L, 8L))
    assert(rows.map(_.getDouble(3)).toSeq === Seq(0.5, 0.75, 1.0, 1.0))
    val cov = rows.map(_.getDouble(3))
    assert(cov.zip(cov.tail).forall { case (x, y) => x <= y })
  }
}
