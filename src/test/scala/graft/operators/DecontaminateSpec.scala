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

  // two well-separated directions in R³; paraphrase = same direction,
  // different magnitude (cosine 1.0, zero n-gram overlap by analogy)
  private val centroids = Array(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0))
  private val trainVecs = Seq(
    (1L, Seq(0.9f, 0.1f, 0.0f)),
    (2L, Seq(0.0f, 1.0f, 0.2f)),
    (3L, Seq(2.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("semantic report flags a paraphrase (same direction, different norm)") {
    val bench = Seq((100L, Seq(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val r = Decontaminate.semanticReport(bench, trainVecs, centroids,
      tau = 0.9, nProbe = 1).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(0) == 100L)
    assert(row.getLong(1) == 3L, "cosine-1.0 rescaled twin beats the 0.99 one")
    assert(row.getAs[Double]("max_cosine") == 1.0)
    assert(row.getLong(3) == 2L, "vecs 1 and 3 both clear tau in cluster 0")
  }

  test("semantic report: nProbe=1 misses a cross-cluster match that nProbe=2 finds") {
    // benchmark vector between the clusters, nearer centroid 0 (x > y);
    // its only ≥tau train match (vec 2) lives in cluster 1
    val bench = Seq((100L, Seq(0.75f, 0.65f, 0.0f))).toDF("vec_id", "embedding")
    val tr = trainVecs.where($"vec_id" === 2L)
    assert(Decontaminate.semanticReport(bench, tr, centroids,
      tau = 0.6, nProbe = 1).count() == 0)
    val r2 = Decontaminate.semanticReport(bench, tr, centroids,
      tau = 0.6, nProbe = 2).collect()
    assert(r2.length == 1 && r2.head.getLong(1) == 2L)
  }

  test("semanticContaminatedTrainIds is the distinct ≥tau train set") {
    val bench = Seq((100L, Seq(1.0f, 0.0f, 0.0f)),
      (101L, Seq(0.95f, 0.05f, 0.0f))).toDF("vec_id", "embedding")
    val ids = Decontaminate.semanticContaminatedTrainIds(bench, trainVecs,
      centroids, tau = 0.9, nProbe = 1)
      .as[Long].collect().toSet
    assert(ids == Set(1L, 3L), s"both benchmark vecs flag 1 and 3 once: $ids")
  }

  test("leakedSpans: recovers planted islands with exact start/len/text; clean docs absent") {
    val train = Seq(
      (1L, "a b c d e f g h i j k l"),   // 12 tokens
      (2L, "p q r s t u v w")            // 8 tokens
    ).toDF("doc_id", "text")
    val test = Seq(
      // leak of train-1's first 10 tokens, 4 novel, then train-2 verbatim
      (100L, "a b c d e f g h i j n1 n2 n3 n4 p q r s t u v w"),
      (101L, "x1 x2 x3 x4 x5 x6 x7 x8 x9")  // fully novel
    ).toDF("doc_id", "text")
    val got = Decontaminate.leakedSpans(test, train, k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(got == Set(
      (100L, 0L, 10L, "a b c d e f g h i j"),
      (100L, 14L, 8L, "p q r s t u v w")),
      s"unexpected spans: $got")
  }

  test("selfContainment: excerpt-in-article found at containment 1.0, direction fixed") {
    import spark.implicits._
    val article = (1 to 40).map(i => s"w$i").mkString(" ")
    val excerpt = (10 to 17).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, article), (2L, excerpt), (3L, "totally different words here"))
      .toDF("doc_id", "text")
    val pairs = Decontaminate.selfContainment(docs, threshold = 0.9,
        maxDf = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    // Jaccard would be ~6/38 ≈ 0.16 — far below any dedup threshold
    assert(pairs.toSeq === Seq((2L, 1L, 1.0)),
      s"excerpt must be contained in the article: ${pairs.toSeq}")
  }

  test("selfContainment: the df cap drops ubiquitous shingles from the index") {
    import spark.implicits._
    // the shared boilerplate shingle appears in EVERY doc — capped out,
    // so no pair survives; unique-content containment is unaffected
    val docs = (1L to 6L).map(i => (i, s"common boiler plate line u$i v$i"))
      .toDF("doc_id", "text")
    val capped = Decontaminate.selfContainment(docs, threshold = 0.5,
      shingleSize = 3, maxDf = 2L)
    assert(capped.count() === 0L)
  }
}
