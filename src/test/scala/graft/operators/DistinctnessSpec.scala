package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DistinctnessSpec extends SparkSpec {

  import spark.implicits._

  test("unique docs score 0, exact copies score 1, partial shares between") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"), // shares 3-grams with 2
      (2L, "alpha beta gamma delta zeta"), // shares the first shingle
      (3L, "utterly different text entirely here")) // unique
      .toDF("doc_id", "text")
    val out = Dedup.distinctness(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // docs 1,2: 3 shingles each, sharing 'alpha beta gamma' and
    // 'beta gamma delta' → 2 shared
    assert(out(1L) === ((3L, 2L)))
    assert(out(2L) === ((3L, 2L)))
    assert(out(3L) === ((3L, 0L)))
    val copies = Seq((1L, "a b c d"), (2L, "a b c d")).toDF("doc_id", "text")
    Dedup.distinctness(copies).collect().foreach { r =>
      assert(r.getDouble(3) === 1.0)
    }
  }
}
