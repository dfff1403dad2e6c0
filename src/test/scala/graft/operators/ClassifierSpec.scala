package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // two separable vocabularies, as in DsirSpec
  private val pos = Seq(
    (1L, "cat kitten purr cat whiskers feline cat nap"),
    (2L, "kitten feline purr whiskers cat cat tail"),
    (3L, "purr cat feline kitten whiskers soft fur")
  ).toDF("doc_id", "text")

  private val neg = Seq(
    (11L, "stock market index futures bond yield trading"),
    (12L, "bond yield curve market trading futures index"),
    (13L, "futures trading market stock bond index price")
  ).toDF("doc_id", "text")

  private val candidates = Seq(
    (21L, "cat purr kitten feline"),
    (22L, "market bond futures yield"),
    (23L, "   ")
  ).toDF("doc_id", "text")

  test("classifier separates the two vocabularies; margin signs match") {
    val s = Classifier.scoreAgainst(candidates, pos, neg, buckets = 256)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(s(21L).getBoolean(4), "cat doc must classify positive")
    assert(!s(22L).getBoolean(4), "finance doc must classify negative")
    assert(s(21L).getDouble(3) > 0 && s(22L).getDouble(3) < 0,
      "per-feature margins must carry the class sign")
  }

  test("zero-feature doc keeps a row, null margin, prior-only decision") {
    val s = Classifier.scoreAgainst(candidates, pos, neg, buckets = 256)
      .where($"doc_id" === 23L).collect()
    assert(s.length == 1)
    assert(s.head.getLong(1) == 0L, "n_feats must be 0")
    assert(s.head.isNullAt(3), "w_per_feat must be null, never NaN")
    // equal-sized classes: prior_micro = 0, score_micro = 0, pred = false
    assert(s.head.getLong(2) == 0L && !s.head.getBoolean(4))
  }

  test("filterByClassifier keeps positives, drops negatives and empties") {
    val kept = Classifier.filterByClassifier(candidates, pos, neg,
      minWPerFeat = 0.0, buckets = 256).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(21L), s"expected only the cat doc, got $kept")
  }

  test("stateless scorer equals the join-based path bit for bit") {
    val model = Classifier.trainNaiveBayes(pos, neg, buckets = 256)
    val prior = Classifier.classPrior(pos, neg)
    val joined = Classifier.score(candidates, model, prior, buckets = 256)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)), r.getBoolean(4))).toMap
    val stateless = Classifier.scoreStateless(candidates, model, prior,
        buckets = 256)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)), r.getBoolean(4))).toMap
    assert(stateless == joined,
      s"stateless != joined:\n$stateless\n$joined")
  }

  test("trained language ID recovers separable vocabularies and beats majority on real labels") {
    // three separable "languages"
    val labeled = Seq(
      (1L, "cat kitten purr whiskers feline fur", "aa"),
      (2L, "kitten feline purr whiskers cat tail", "aa"),
      (3L, "stock market index futures bond yield", "bb"),
      (4L, "bond yield curve market trading futures", "bb"),
      (5L, "spark shuffle partition executor task stage", "cc"),
      (6L, "executor task stage shuffle partition codegen", "cc")
    ).toDF("doc_id", "text", "lang")
    val model = Classifier.trainLanguageNB(labeled, buckets = 256)
    assert(model.classes == Seq("aa", "bb", "cc"))
    val pred = Classifier.classifyLanguage(
        Seq((21L, "purr kitten cat"), (22L, "market bond index"),
          (23L, "partition shuffle executor"), (24L, null.asInstanceOf[String]))
          .toDF("doc_id", "text"), model)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(pred(21L)._2 == "aa" && pred(22L)._2 == "bb" && pred(23L)._2 == "cc")
    // zero-feature doc: bare priors, all classes tie on count 2 → lowest class
    assert(pred(24L) == (0L, "aa"))

    // real labels on the shared-vocabulary corpus: self-train accuracy
    // must beat the majority-class baseline (the labels ARE learnable)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m2 = Classifier.trainLanguageNB(docs, buckets = 1024)
    val acc = Classifier.classifyLanguage(docs, m2)
      .join(docs.select(col("doc_id"),
        coalesce(col("lang"), lit("und")).as("lang")), Seq("doc_id"))
      .agg(avg(when(col("pred_lang") === col("lang"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    val majority = docs.groupBy("lang").count().agg(max("count")).head().getLong(0)
      .toDouble / docs.count()
    assert(acc > majority + 0.1,
      f"trained langid must beat majority baseline: acc=$acc%.3f vs $majority%.3f")
  }

  test("unbalanced classes shift the prior, not the per-feature weights") {
    val posBig = pos.unionByName(pos.select(($"doc_id" + 100).as("doc_id"), $"text"))
    val p = Classifier.classPrior(posBig, neg).head().getLong(0)
    assert(p > 0, "more positive docs must give a positive prior")
    val pEq = Classifier.classPrior(pos, neg).head().getLong(0)
    assert(pEq == 0L, "equal doc counts must give a zero prior")
  }

  test("labelNoise: a planted mislabel is flagged with the right suggestion") {
    // hand-built score frame: docs 1-3 labeled "en", doc 4 labeled "de"
    // but scoring like the en docs. Thresholds: t_en over {1,2,3}'s en
    // scores, t_de over {4}'s de score.
    val scored = Seq(
      (1L, "en", 100L), (1L, "de", -50L),
      (2L, "en", 120L), (2L, "de", -60L),
      (3L, "en", 80L), (3L, "de", -40L),
      (4L, "en", 110L), (4L, "de", -500L) // mislabeled: en-like scores
    ).toDF("doc_id", "cls", "score_micro")
    val labels = Seq(1L -> "en", 2L -> "en", 3L -> "en", 4L -> "de")
      .toDF("doc_id", "label")
    val out = Classifier.labelNoise(scored, labels).collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getBoolean(3))).toMap
    // t_en = 100 (mean of 100,120,80); t_de = -500 (mean of {-500})
    // doc 4: en score 110 ≥ 100 AND de score -500 ≥ -500 → argmax en → flagged
    assert(out(4L) === ("en", true))
    // doc 3: en 80 < 100, de -40 ≥ -500 → suggested de?? No: doc 3's de
    // score -40 clears t_de, and its en score misses t_en — the
    // confident set is {de}, so it flags too (borderline examples near
    // their class mean do that in the threshold variant)
    assert(out(3L) === ("de", true))
    // docs 1-2 clear t_en and also t_de; argmax = en = label → unflagged
    assert(out(1L) === ("en", false))
    assert(out(2L) === ("en", false))
  }

  test("labelNoise: empty confident set keeps the label unflagged") {
    val scored = Seq(
      (1L, "en", 100L), (2L, "en", 200L),
      (1L, "de", 10L), (2L, "de", 20L)).toDF("doc_id", "cls", "score_micro")
    // doc 1 misses both thresholds (t_en = 150 over both docs, t_de = 15)
    val labels = Seq(1L -> "en", 2L -> "en").toDF("doc_id", "label")
    val one = Classifier.labelNoise(scored, labels).collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getBoolean(3))).toMap
    assert(one(1L) === ("en", false))
    assert(one(2L) === ("en", false)) // de 20 ≥ ... no de-labeled docs → no t_de
  }

  test("explain: attributions sum to the score minus the prior") {
    val model = Classifier.trainNaiveBayes(pos, neg, buckets = 1024)
    val cand = Seq((21L, "cat purr market cat")).toDF("doc_id", "text")
    val exp = Classifier.explain(cand, model, k = 100, buckets = 1024)
      .collect().map(r => r.getString(1) -> (r.getLong(3), r.getLong(4)))
      .toMap
    // n_occ carries multiplicity: 'cat' appears twice
    assert(exp("cat")._1 === 2L)
    assert(exp("cat")._2 > 0 && exp("purr")._2 > 0)
    assert(exp("market")._2 < 0)
    val scored = Classifier.score(cand, model,
      Classifier.classPrior(pos, neg), buckets = 1024).head()
    val prior = Classifier.classPrior(pos, neg).head().getLong(0)
    assert(exp.values.map(_._2).sum === scored.getLong(2) - prior,
      "exact decomposition: contributions must reconstruct the score")
  }

  test("codeSwitching flags mixed docs a whole-doc langid averages away") {
    val labeled = pos.withColumn("lang", lit("cat"))
      .unionByName(neg.withColumn("lang", lit("fin")))
    val model = Classifier.trainLanguageNB(labeled, buckets = 1024)
    val mixed = "cat kitten purr whiskers feline cat purr cat " +
      "stock market index futures bond yield trading bond"
    val pure = "cat kitten purr whiskers feline cat purr cat"
    val out = Classifier.codeSwitching(
      Seq((50L, mixed), (51L, pure)).toDF("doc_id", "text"),
      model, segTokens = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3),
          r.getDouble(5), r.getBoolean(6))).toMap
    assert(out(50L) === ((2L, 2L, "cat", 0.5, true)))
    assert(out(51L) === ((1L, 1L, "cat", 1.0, false)))
  }

  test("codeSwitching: segment count is ceil(tokens/segTokens)") {
    val labeled = pos.withColumn("lang", lit("cat"))
      .unionByName(neg.withColumn("lang", lit("fin")))
    val model = Classifier.trainLanguageNB(labeled, buckets = 1024)
    val nine = "cat cat cat cat cat cat cat cat cat" // 9 tokens, seg=4
    val r = Classifier.codeSwitching(
      Seq((60L, nine)).toDF("doc_id", "text"), model, segTokens = 4)
      .head()
    assert(r.getLong(1) === 3L) // segments of 4, 4, 1 tokens
  }

  test("explain: top-k ranks by |contribution|, ties by token") {
    val model = Classifier.trainNaiveBayes(pos, neg, buckets = 1024)
    val cand = Seq((22L, "cat cat cat market soft")).toDF("doc_id", "text")
    val rows = Classifier.explain(cand, model, k = 2, buckets = 1024)
      .orderBy("rank").collect()
    assert(rows.length === 2)
    assert(rows.map(_.getInt(5)).toSeq === Seq(1, 2))
    // triple 'cat' must out-rank everything by magnitude
    assert(rows.head.getString(1) === "cat")
  }
}
