package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkipGramSpec extends SparkSpec {

  import spark.implicits._

  test("pairs: window-2 offsets, both directions, positions are the center's") {
    val docs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val got = SkipGram.pairs(docs, window = 2)
      .collect().map(r => (r.getInt(1), r.getString(2), r.getString(3))).toSet
    val expected = Set(
      // d=1 forward + reverse
      (0, "a", "b"), (1, "b", "a"), (1, "b", "c"), (2, "c", "b"),
      (2, "c", "d"), (3, "d", "c"),
      // d=2 forward + reverse
      (0, "a", "c"), (2, "c", "a"), (1, "b", "d"), (3, "d", "b"))
    assert(got == expected)
  }

  test("window 1 degenerates to adjacent pairs only") {
    val docs = Seq((1L, "x y z")).toDF("doc_id", "text")
    val n = SkipGram.pairs(docs, window = 1).count()
    assert(n == 4) // (x,y),(y,x),(y,z),(z,y)
  }

  test("negatives: deterministic, k per pair, always a vocabulary term") {
    val docs = Seq((1L, "cat dog cat dog bird"), (2L, "cat dog fish"))
      .toDF("doc_id", "text")
    val vocab = Salience.vocabulary(docs, minCount = 2).cache()
    val vTerms = vocab.select("term").collect().map(_.getString(0)).toSet
    val out = SkipGram.withNegatives(docs, vocab, window = 2, k = 3).cache()
    val pairsN = SkipGram.pairs(docs, window = 2).count()
    assert(out.count() == pairsN * 3)
    assert(out.select("neg_term").collect().forall(r => vTerms(r.getString(0))))
    // rerun is bit-identical (no RNG anywhere)
    val again = SkipGram.withNegatives(docs, vocab, window = 2, k = 3)
    assert(out.except(again).count() == 0 && again.except(out).count() == 0)
  }

  test("empty docs contribute nothing") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "solo")).toDF("doc_id", "text")
    assert(SkipGram.pairs(docs, window = 2).count() == 0)
  }
}
