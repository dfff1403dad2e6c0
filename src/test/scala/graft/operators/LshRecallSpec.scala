package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LshRecallSpec extends SparkSpec {

  import spark.implicits._

  private val base = "alpha beta gamma delta epsilon zeta eta theta " +
    "iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon"

  test("exact copies are always recalled (J=1 matches every band)") {
    val docs = Seq(
      (1L, base), (2L, base), // the true pair
      (3L, "completely different words here entirely unrelated text")
    ).toDF("doc_id", "text")
    val r = Dedup.lshRecallReport(docs, threshold = 0.8).head()
    assert(r.getLong(0) === 1L) // one true pair
    assert(r.getLong(2) === 1L)
    assert(r.getDouble(3) === 1.0)
  }

  test("empty truth set reports recall 1 (vacuous)") {
    val docs = Seq(
      (1L, base),
      (2L, "completely different words here entirely unrelated text")
    ).toDF("doc_id", "text")
    val r = Dedup.lshRecallReport(docs, threshold = 0.8).head()
    assert(r.getLong(0) === 0L && r.getDouble(3) === 1.0)
  }

  test("candidate precision counts band junk against the truth") {
    // three mutual copies → 3 true pairs, all candidates, precision 1
    val docs = Seq((1L, base), (2L, base), (3L, base))
      .toDF("doc_id", "text")
    val r = Dedup.lshRecallReport(docs, threshold = 0.8).head()
    assert(r.getLong(0) === 3L && r.getLong(1) === 3L)
    assert(r.getDouble(4) === 1.0)
  }

  test("bands must divide numHashes") {
    val docs = Seq((1L, base)).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.lshRecallReport(docs, numHashes = 32, bands = 5)
    }
  }
}
