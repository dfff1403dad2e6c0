package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DataOpsSpec extends SparkSpec {

  import spark.implicits._

  test("shingles: sliding 3-grams, short text collapses, empty → [\"\"]") {
    val df = Seq((1L, "a b c d e"), (2L, "x y"), (3L, ""), (4L, "a b c a b c"))
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("a b c", "b c d", "c d e"))
    assert(got(2L) == Seq("x y"))
    assert(got(3L) == Seq(""))
    assert(got(4L) == Seq("a b c", "b c a", "c a b", "a b c"))
    val distinct = df.where($"doc_id" === 4)
      .select(Dedup.shingles(col("text"), 3, distinct = true)).head().getSeq[String](0)
    assert(distinct == Seq("a b c", "b c a", "c a b"))
  }

  test("shingles normalize: case/punctuation-insensitive") {
    val df = Seq((1L, "Hello, World! Foo"), (2L, "hello world foo")).toDF("doc_id", "text")
    val sh = df.select(Dedup.shingles(col("text"), 3)).collect().map(_.getSeq[String](0))
    assert(sh(0) == sh(1))
  }

  test("exact dedup: duplicate groups and survivors") {
    val df = Seq(
      (1L, "The quick brown fox"), (2L, "the quick brown fox!"),
      (3L, "something else entirely"), (4L, "THE QUICK  brown fox")
    ).toDF("doc_id", "text")
    val groups = Dedup.exact(df).collect()
    assert(groups.map(_.getLong(0)).toSet == Set(1L, 2L, 4L))
    assert(groups.map(_.getAs[Long]("canonical_id")).toSet == Set(1L))
    val kept = Dedup.exactDeduped(df).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
  }

  test("minhash LSH: identical docs are candidates, disjoint docs are not") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val other = "one two three four five six seven eight nine ten"
    val df = Seq((1L, base), (2L, base), (3L, other)).toDF("doc_id", "text")
    val cands = Dedup.minhashCandidates(df, numHashes = 16, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((1L, 2L)))
    assert(!cands.contains((1L, 3L)) && !cands.contains((2L, 3L)))
  }

  test("ngram jaccard: hand-computed overlap") {
    // doc1: shingles {a b c, b c d}; doc2: {b c d, c d e} → inter 1, union 3
    val docs = Seq((1L, "a b c d"), (2L, "b c d e")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val r = Dedup.ngramJaccard(pairs, docs).head()
    assert(r.getAs[Long]("inter") == 1L)
    assert(r.getAs[Long]("uni") == 3L)
    assert(math.abs(r.getAs[Double]("jaccard") - 1.0 / 3) < 1e-6)
  }

  test("nearDuplicates finds the engineered near-dup and skips the distinct doc") {
    val a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    val aTweaked = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w13"
    val b = "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11 z12"
    val df = Seq((1L, a), (2L, aTweaked), (3L, b)).toDF("doc_id", "text")
    val nd = Dedup.nearDuplicates(df, threshold = 0.5, numHashes = 16, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nd.contains((1L, 2L)))
    assert(!nd.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("nearDuplicates: rep-collapse path ≡ naive all-docs LSH on a copy-heavy corpus") {
    // 6 exact copies + a near variant + a distinct doc: the restructured
    // operator (LSH among representatives, pairs expanded back) must
    // produce exactly the pair set of the naive formulation that buckets
    // every copy (same candidates because copies share signatures)
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = ((1L to 6L).map(i => (i, base)) ++ Seq(
      (7L, base + " tail"),
      (8L, "completely unrelated words that share nothing at all with others")
    )).toDF("doc_id", "text")
    val fast = Dedup.nearDuplicates(docs, threshold = 0.5)
      .select("doc_a", "doc_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val naive = Dedup.ngramJaccard(
        Dedup.minhashCandidates(docs), docs)
      .where($"jaccard" >= 0.5)
      .select("doc_a", "doc_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fast == naive)
    // all 15 copy pairs present at jaccard 1.0, plus copy↔variant pairs
    assert(fast.count(t => t._3 == 1.0) == 15)
    assert(fast.exists(t => t._2 == 7L && t._3 < 1.0))
    assert(!fast.exists(t => t._1 == 8L || t._2 == 8L))
  }

  test("native expressions reject wrong-typed args at analysis time") {
    graft.session.GraftFunctions.register(spark)
    val df = Seq((1L, "text")).toDF("id", "txt")
    df.createOrReplaceTempView("typecheck_probe")
    def analysisFails(sql: String, fragment: String): Unit = {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(sql).collect()
      }
      assert(e.getMessage.toLowerCase.contains(fragment), e.getMessage)
    }
    analysisFails("SELECT vec_dot(id, id) FROM typecheck_probe", "array<float")
    analysisFails("SELECT cosine_sim(txt, txt) FROM typecheck_probe", "array<float")
    analysisFails("SELECT ngram_shingles(id, 3) FROM typecheck_probe", "string")
    analysisFails("SELECT rolling_hash(id) FROM typecheck_probe", "string")
  }

  test("simhash: equal texts hash equal, deterministic across runs") {
    val df = Seq((1L, "spark hash join table"), (2L, "spark hash join table"),
      (3L, "completely different words here")).toDF("doc_id", "text")
    val h = Dedup.simhash(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L))
    assert(h(1L) != h(3L))
    val h2 = Dedup.simhash(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h == h2)
  }

  test("brute-force cosine top-k: hand-checked ordering") {
    val corpus = Seq(
      (10L, Seq(1.0f, 0.0f)), (11L, Seq(0.9f, 0.1f)),
      (12L, Seq(0.0f, 1.0f)), (13L, Seq(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val queries = Seq((10L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Similarity.bruteForceTopK(corpus, queries, k = 3)
      .orderBy("rank").collect()
    assert(got.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(11L, 12L, 13L))
    assert(got.head.getAs[Double]("cosine") > 0.99)
  }

  test("ANN recall: every query finds planted near-neighbors in its bucket") {
    // on UNIFORM random vectors LSH recall is legitimately poor (nothing
    // is near anything); plant 5 tight neighbors per query so each true
    // top-5 sits at cosine ≈ 1 — almost always on the query's side of
    // every hyperplane — and per-query recall is a meaningful assertion
    val rnd = new scala.util.Random(5)
    val queries = (0L until 3L).map(i =>
      (i, Seq.fill(16)(rnd.nextGaussian().toFloat)))
    val planted = queries.flatMap { case (qid, v) =>
      (0 until 5).map(j => (100L + qid * 10 + j,
        v.map(x => x + rnd.nextGaussian().toFloat * 0.01f)))
    }
    val noise = (500L until 700L).map(i =>
      (i, Seq.fill(16)(rnd.nextGaussian().toFloat)))
    val df = (queries ++ planted ++ noise).toDF("vec_id", "embedding")
    val q = df.where($"vec_id" < 3)
    val exact = Similarity.bruteForceTopK(df, q, 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.annTopK(df, q, 5, dim = 16, planes = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (qid <- 0L until 3L) {
      val a = approx.filter(_._1 == qid)
      val e = exact.filter(_._1 == qid)
      // exact top-5 must be exactly the planted neighbors
      assert(e.map(_._2).forall(n => n >= 100 + qid * 10 && n < 105 + qid * 10))
      assert(a.nonEmpty, s"query $qid returned nothing")
      assert((a intersect e).nonEmpty, s"query $qid shares no hit with brute force")
    }
  }

  test("IVF top-k: finds the same best neighbor as brute force on clustered data") {
    val rnd = new scala.util.Random(11)
    // two well-separated clusters so coarse quantization must route right
    val vecs = (0L until 100L).map { i =>
      val base = if (i % 2 == 0) 5.0 else -5.0
      (i, Seq.fill(8)((base + rnd.nextGaussian() * 0.1).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val q = df.where($"vec_id" < 2)
    val exact = Similarity.bruteForceTopK(df, q, 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivf = Similarity.ivfTopK(df, q, 1, nLists = 4, nProbe = 2)
      .select("query_id", "neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ivf == exact)
  }

  test("embedding near-dup: identical vectors pair at cosine 1, opposites never") {
    val vecs = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f, 4.0f)), (2L, Seq(1.0f, 2.0f, 3.0f, 4.0f)),
      (3L, Seq(-1.0f, -2.0f, -3.0f, -4.0f)))
    val df = vecs.toDF("vec_id", "embedding")
    val nd = Dedup.embeddingNearDuplicates(df, dim = 4, threshold = 0.999, planes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nd == Set((1L, 2L)))
  }

  test("near-dup clusters: copies collapse to exact edges, variants to near edges") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox jumps over the lazy dog"),
      (4L, "the quick brown fox jumps over the lazy cat"),
      (5L, "completely different content about something else entirely here")
    ).toDF("doc_id", "text")
    val edges = Dedup.nearDuplicateClusters(docs, threshold = 0.35,
        numHashes = 16, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet
    // copies 2,3 collapse onto canonical 1; only representative 1 (not 2/3)
    // can pair with the near-variant 4; 5 joins nothing
    assert(edges.filter(_._3 == "exact") === Set((2L, 1L, "exact"), (3L, 1L, "exact")))
    assert(edges.filter(_._3 == "near") === Set((1L, 4L, "near")))
  }

  test("simhash covers empty/null-text docs with the 0 sentinel") {
    val docs = Seq((1L, "some real text"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet === Set(1L, 2L, 3L))
    assert(out(2L) === 0L && out(3L) === 0L)
    assert(out(1L) !== 0L)
  }

  test("ngramJaccard: duplicate caller pairs don't inflate the intersection") {
    val docs = Seq((1L, "a b c d"), (2L, "a b c d")).toDF("doc_id", "text")
    val dupPairs = Seq((1L, 2L), (1L, 2L), (1L, 2L)).toDF("doc_a", "doc_b")
    val rows = Dedup.ngramJaccard(dupPairs, docs).collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Double]("jaccard") === 1.0)
  }

  test("ngramJaccard: a pair with a null-text doc surfaces instead of vanishing") {
    val docs = Seq((1L, "a b c"), (2L, null.asInstanceOf[String]),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val rows = Dedup.ngramJaccard(Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b"), docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    // (1,2): doc 2 contributes no shingles → jaccard 0 over doc 1's set
    assert(rows((1L, 2L)).getAs[Double]("jaccard") === 0.0)
    // (2,3): both empty → 0/0 → null, but the row is still there
    assert(rows((2L, 3L)).isNullAt(rows((2L, 3L)).fieldIndex("jaccard")))
  }

  test("rolling-hash fingerprint: same identity classes as md5 fingerprint") {
    val docs = Seq(
      (1L, "Same   Content here"), (2L, "same content HERE"), // normalize-equal
      (3L, "different content"), (4L, "")).toDF("doc_id", "text")
    val rfp = docs.select($"doc_id",
        TextAnalysis.rollingFingerprint($"text").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rfp(1L) === rfp(2L))
    assert(rfp(1L) !== rfp(3L))
    // interpreted eval agrees with the codegen'd dataframe path
    val interp = graft.functions.RollingHash64(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString("same content here")),
      graft.functions.RollingHash64.DefaultBase).eval(null)
    assert(interp === rfp(1L))
  }

  test("token stats + quality + fingerprint basics") {
    val df = Seq((1L, "the quick brown fox."), (2L, ""), (3L, "  a  b  "))
      .toDF("doc_id", "text")
    val ts = TextAnalysis.tokenStats(df).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(ts == Map(1L -> 4, 2L -> 0, 3L -> 2))
    val q = TextAnalysis.qualityScore(df).where($"doc_id" === 1).head()
    assert(q.getAs[Double]("punct_ratio") > 0)
    assert(q.getAs[Double]("stopword_frac") == 0.25) // "the"
    val fp = TextAnalysis.fingerprints(df).collect().map(_.getString(1))
    assert(fp.distinct.length == 3)
  }

  test("language id: marker argmax with und fallback") {
    val df = Seq(
      (1L, "the cat and the dog is a pet"),
      (2L, "der hund und die katze ist ein tier"),
      (3L, "xyzzy plugh qwerty")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.languageId(df).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "und"))
  }

  test("repetition score: duplicate n-gram fractions") {
    val df = Seq(
      (1L, "a b a b a b"),         // 2-grams: ab ba ab ba ab → 2 distinct of 5
      (2L, "one two three four"),  // all n-grams distinct
      (3L, "")                     // degenerate: single empty shingle
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionScore(df).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got(1L)._1 == 0.6)      // 1 - 2/5
    assert(got(2L) == ((0.0, 0.0)))
    assert(got(3L) == ((0.0, 0.0)))
    assert(got(1L)._2 == 0.5)      // 3-grams: aba bab aba bab → 1 - 2/4
  }

  test("pii redaction: emails, ipv4, phones replaced; clean text untouched") {
    val df = Seq(
      (1L, "mail me at First.Last+tag@sub.example.co or call 555-123-4567"),
      (2L, "server at 192.168.0.1 answered"),
      (3L, "version 1.2 of chapter 3.4 unchanged, price $12.34")
    ).toDF("doc_id", "text")
    val got = df.select($"doc_id", TextAnalysis.redactPii($"text").as("r"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "mail me at <EMAIL> or call <PHONE>")
    assert(got(2L) == "server at <IP> answered")
    assert(got(3L) == "version 1.2 of chapter 3.4 unchanged, price $12.34")
  }

  test("tfidf: corpus-unique terms outrank ubiquitous ones; ranks deterministic") {
    val df = Seq(
      (1L, "apple apple banana the the"),
      (2L, "banana cherry the"),
      (3L, "the date date date")
    ).toDF("doc_id", "text")
    val top = Salience.tfidfTopK(df, k = 2).collect()
      .groupBy(_.getLong(0)).map { case (id, rs) =>
        id -> rs.sortBy(_.getInt(5)).map(_.getString(1)).toSeq }
    // "the" is in all 3 docs → idf 0 → never first while a rarer term exists
    assert(top(1L) == Seq("apple", "banana"))
    assert(top(2L) == Seq("cherry", "banana"))
    assert(top(3L) == Seq("date", "the"))
    val appleScore = Salience.tfidfTopK(df, k = 2)
      .where($"doc_id" === 1 && $"term" === "apple").head().getDouble(4)
    assert(appleScore == BigDecimal(2 * math.log(3.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("heavy hitters: global frequency order with term tie-break") {
    val df = Seq((1L, "b b b a a c"), (2L, "a c z")).toDF("doc_id", "text")
    val hh = Salience.heavyHitters(df, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(hh == Seq(("a", 3L), ("b", 3L), ("c", 2L)))
  }

  test("hash split: deterministic, disjoint-exhaustive, near-declared fractions") {
    val keys = spark.range(0, 2000).toDF("doc_id")
    val s1 = HashSplit.assignSplits(keys, $"doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val s2 = HashSplit.assignSplits(keys.repartition(7), $"doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val m1 = s1.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val m2 = s2.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m1 == m2)                    // partitioning-independent
    assert(m1.size == 2000)             // exhaustive
    val frac = m1.values.groupBy(identity).view.mapValues(_.size / 2000.0).toMap
    assert(math.abs(frac("train") - 0.8) < 0.05)
    assert(math.abs(frac("val") - 0.1) < 0.03)
    assert(math.abs(frac("test") - 0.1) < 0.03)
    val sampled = HashSplit.sampleByHash(keys, $"doc_id", 0.25).count()
    assert(math.abs(sampled / 2000.0 - 0.25) < 0.05)
    assert(HashSplit.sampleByHash(keys, $"doc_id", 0.0).count() == 0)
    assert(HashSplit.sampleByHash(keys, $"doc_id", 1.0).count() == 2000)
  }

  test("boilerplate removal: repeated lines stripped, order kept, grain preserved") {
    val df = Seq(
      (1L, "intro\ncookie banner\nbody one\nfooter"),
      (2L, "cookie banner\nbody two\nfooter"),
      (3L, "cookie banner\nfooter"),
      (4L, "unique only")
    ).toDF("doc_id", "text")
    val bp = Boilerplate.boilerplateLines(df, minDocs = 3).collect()
      .map(_.getString(1)).toSet
    assert(bp == Set("cookie banner", "footer"))
    val out = Boilerplate.removeBoilerplate(df, minDocs = 3).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("intro\nbody one", 2L, 2L)))
    assert(out(2L) == (("body two", 1L, 2L)))
    assert(out(3L) == (("", 0L, 2L)))   // fully-boilerplate doc survives, empty
    assert(out(4L) == (("unique only", 1L, 0L)))
  }

  test("boilerplate: trailing separator keeps empty segment (engine-portable split)") {
    val df = Seq((1L, "a\n"), (2L, "a\n"), (3L, "b")).toDF("doc_id", "text")
    // "a\n" → ["a", ""]; both segments occur in 2 docs → stripped at minDocs=2
    val out = Boilerplate.removeBoilerplate(df, minDocs = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(1L) == 2L && out(2L) == 2L && out(3L) == 0L)
  }

  test("line-level quality filter: word floor, terminal punct, blocklist; nulls propagate") {
    val df = Seq(
      (1L, "one two three four.\nshort line.\nhas javascript one two three.\n" +
        "no terminal punct here\nfive words ending in bang!"),
      (2L, ""),
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Boilerplate.removeLowQualityLines(df, minWords = 4).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) == "one two three four.\nfive words ending in bang!")
    assert(out(1L).getInt(2) == 5 && out(1L).getInt(3) == 2 && out(1L).getInt(4) == 3)
    // empty text = one blank line, which fails the word floor
    assert(out(2L).getString(1) == "" && out(2L).getInt(3) == 0)
    assert(out(3L).isNullAt(1) && out(3L).isNullAt(2))
    // punct rule off: the unpunctuated 4-word line survives too
    val lax = Boilerplate.removeLowQualityLines(df, minWords = 4,
      requireTerminalPunct = false).collect().map(r => r.getLong(0) -> r).toMap
    assert(lax(1L).getInt(3) == 3)
  }

  test("per-group cap: salted ≡ unsalted, cap respected, small groups intact") {
    val df = spark.range(0, 500)
      .select(concat(lit("g"), ($"id" % 7).cast("string")).as("source"), $"id".as("doc_id"))
      .unionByName(spark.range(1000, 1004)
        .select(lit("tiny").as("source"), $"id".as("doc_id")))
    def rows(salt: Int) =
      HashSplit.capPerGroup(df, $"source", 10, $"doc_id", seed = 3L, saltBuckets = salt)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val plain = rows(0)
    assert(rows(8) == plain)            // salt changes the shape, never the result
    val perGroup = plain.groupBy(_._1).view.mapValues(_.size).toMap
    assert((0 until 7).forall(i => perGroup(s"g$i") == 10))
    assert(perGroup("tiny") == 4)       // under-cap group kept whole
    assert(plain.forall(_._3 <= 10))
  }

  test("token budget: salted ≡ unsalted, crossing doc included, budget hit") {
    // 60 docs per group, 100 tokens each → budget 1000 keeps exactly 10
    // (the 10th crosses at exactly 1000); uneven sizes exercise the
    // crossing-doc rule
    val df = spark.range(0, 120).select(
      when($"id" % 2 === 0, "a").otherwise("b").as("grp"),
      $"id".as("doc_id"), lit(100L).as("n_toks"))
    def rows(salt: Int) =
      HashSplit.takeToTokenBudget(df, $"grp", $"n_toks", budget = 1000L,
          id = $"doc_id", seed = 1L, saltBuckets = salt)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val plain = rows(0)
    assert(rows(8) == plain, "salt must not change the selected set")
    assert(plain.groupBy(_._1).view.mapValues(_.size).toMap ==
      Map("a" -> 10, "b" -> 10))
    // crossing-doc inclusion: budget 950 still keeps 10 docs (the 10th
    // crosses the line), budget 1001 keeps 11
    def n(b: Long) = HashSplit.takeToTokenBudget(df, $"grp", $"n_toks",
      budget = b, id = $"doc_id").where($"grp" === "a").count()
    assert(n(950L) == 10L && n(1001L) == 11L)
    // a budget smaller than any doc still yields one doc per group
    assert(n(5L) == 1L)
  }

  test("temperature mixture: α flattens toward uniform, α=1 keeps proportions, fill honors per-group budgets") {
    // one rich group (90k tokens) and one poor group (10k)
    val df = spark.range(0, 1000).select(
      when($"id" % 10 === 0, "poor").otherwise("rich").as("grp"),
      $"id".as("doc_id"), lit(100L).as("n_toks"))
    def weights(alpha: Double) =
      HashSplit.temperatureBudgets(df, $"grp", $"n_toks", alpha, 10000L)
        .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getLong(3))).toMap
    val w1 = weights(1.0)
    // α = 1: natural proportions (0.9 / 0.1)
    assert(math.abs(w1("rich")._1 - 0.9) < 1e-6 && math.abs(w1("poor")._1 - 0.1) < 1e-6)
    val w3 = weights(0.3)
    // α < 1 flattens: the poor group's share rises, the rich one's falls
    assert(w3("poor")._1 > 0.1 && w3("rich")._1 < 0.9)
    assert(math.abs(w3("poor")._1 + w3("rich")._1 - 1.0) < 1e-5)
    // materialized fill: each group's kept tokens land at its own budget
    // (crossing doc included → within one doc of the target)
    val got = HashSplit.temperatureResample(df, $"grp", $"n_toks",
        alpha = 0.3, totalTokens = 10000L, id = $"doc_id", seed = 1L)
      .groupBy("grp").agg(sum("n_toks").as("tok"), first("budget").as("b"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    got.foreach { case (g, (tok, b)) =>
      assert(tok >= b && tok < b + 100, s"$g filled $tok vs budget $b") }
    // salted ≡ unsalted for the per-group budget-column path
    val plain = HashSplit.temperatureResample(df, $"grp", $"n_toks",
      alpha = 0.3, totalTokens = 10000L, id = $"doc_id", seed = 1L)
      .select("doc_id").as[Long].collect().toSet
    val salted = HashSplit.temperatureResample(df, $"grp", $"n_toks",
      alpha = 0.3, totalTokens = 10000L, id = $"doc_id", seed = 1L,
      saltBuckets = 8)
      .select("doc_id").as[Long].collect().toSet
    assert(plain == salted)
  }

  test("stratified hash sample: per-stratum rates, deterministic membership") {
    val df = spark.range(0, 3000)
      .select($"id".as("doc_id"),
        when($"id" % 3 === 0, "en").when($"id" % 3 === 1, "zh").otherwise("de").as("lang"))
    val out = HashSplit.sampleByStratum(df, $"doc_id", $"lang",
      Map("en" -> 0.2, "zh" -> 1.0), defaultFraction = 0.5)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("zh") == 1000L)                       // fraction 1.0 keeps all
    assert(math.abs(byLang("en") / 1000.0 - 0.2) < 0.06)
    assert(math.abs(byLang("de") / 1000.0 - 0.5) < 0.06)
    // sampled set is a subset of the full-rate hash sample semantics: rerun equal
    val again = HashSplit.sampleByStratum(df.repartition(13), $"doc_id", $"lang",
      Map("en" -> 0.2, "zh" -> 1.0), defaultFraction = 0.5)
    assert(out.collect().map(_.getLong(0)).toSet == again.collect().map(_.getLong(0)).toSet)
  }

  test("quality filter: reasons in fixed order, apply keeps exactly tagged survivors") {
    val df = Seq(
      (1L, "the quick brown fox jumps over a lazy dog today"),  // 10 tokens, kept
      (2L, "hi"),                                               // too few tokens
      (3L, "go go go go go go go go go go"),                    // repetitive + no stopwords
      (4L, "supercalifragilistic expialidocious pneumonoultramicroscopic volcanoconiosis antidisestablishmentarianism floccinaucinihilipilification honorificabilitudinitatibus sesquipedalian incomprehensibilities extraordinarily")
    ).toDF("doc_id", "text")
    val rules = QualityFilter.Rules(minTokens = 5, maxTokens = 100,
      minMeanTokenLen = 2.0, maxMeanTokenLen = 12.0,
      minStopwordFrac = 0.05, maxDup2gramFrac = 0.5, maxDup3gramFrac = 0.5)
    val tags = QualityFilter.tag(df, rules).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("reasons")).toMap
    assert(tags(1L) == "")
    assert(tags(2L) == "too_few_tokens,stopword_frac_low")
    assert(tags(3L) == "stopword_frac_low,dup_2gram_high,dup_3gram_high")
    assert(tags(4L) == "mean_token_len_high,stopword_frac_low")
    val kept = QualityFilter(df, rules).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L))
    // apply ≡ tag.keep on a wider corpus
    val docs = Seq.tabulate(50)(i => (i.toLong, ("w" * (i % 7 + 1) + " ") * (i % 30 + 1))).toDF("doc_id", "text")
    val viaTag = QualityFilter.tag(docs, rules).where($"keep").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val viaApply = QualityFilter(docs, rules).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaTag == viaApply)
  }

  test("dataset card: exact per-group stats and dup fraction") {
    val df = Seq(
      (1L, "a b c", "en", "s0"), (2L, "a b c", "en", "s0"),
      (3L, "d e", "en", "s0"), (4L, "x y z w", "de", "s1")
    ).toDF("doc_id", "text", "lang", "source")
    val card = CorpusStats.datasetCard(df).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(6), r.getDouble(7)))).toMap
    assert(card(("en", "s0")) == ((3L, 8L, 2L, BigDecimal(1.0 - 2.0 / 3).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(card(("de", "s1")) == ((1L, 4L, 1L, 0.0)))
    // HLL scale path returns the same grain
    assert(CorpusStats.datasetCard(df, exact = false).count() == 2)
  }

  test("mixture upsampling: floor copies guaranteed, fractional copy hashed, w<1 downsamples") {
    val df = spark.range(0, 1200)
      .select($"id".as("doc_id"),
        when($"id" % 3 === 0, "s0").when($"id" % 3 === 1, "s1").otherwise("s2").as("source"))
    val out = HashSplit.upsampleByWeight(df, $"doc_id", $"source",
      Map("s0" -> 2.5, "s1" -> 0.25, "s2" -> 0.0)).cache()
    val perSource = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!perSource.contains("s2"))                       // weight 0 drops all
    assert(math.abs(perSource("s0") / 400.0 - 2.5) < 0.2)   // ~2.5 epochs
    assert(math.abs(perSource("s1") / 400.0 - 0.25) < 0.1)  // downsample
    // every s0 doc has copies 0 and 1 (floor guarantee)
    val s0Full = out.where($"source" === "s0" && $"copy" < 2)
      .groupBy("doc_id").count().collect()
    assert(s0Full.length == 400 && s0Full.forall(_.getLong(1) == 2L))
    // deterministic under repartitioning
    val again = HashSplit.upsampleByWeight(df.repartition(11), $"doc_id", $"source",
      Map("s0" -> 2.5, "s1" -> 0.25, "s2" -> 0.0))
    assert(out.collect().map(r => (r.getLong(0), r.getInt(2))).toSet ==
      again.collect().map(r => (r.getLong(0), r.getInt(2))).toSet)
    out.unpersist()
  }

  test("incremental dedup: batch copies dropped, novel kept; near-dup pairs cross-corpus only") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps"), (2L, "pack my box with five dozen"),
      (3L, "entirely different content here")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (101L, "THE QUICK brown fox, jumps"),   // normalizes to doc 1 → dropped
      (102L, "a genuinely new document"),      // kept
      (103L, "pack my box with five dozen")    // = doc 2 → dropped
    ).toDF("doc_id", "text")
    val kept = Dedup.dedupAgainstExact(batch, corpus).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(102L))
    val pairs = Dedup.nearDuplicatesAgainst(batch, corpus, threshold = 0.999)
      .select("doc_a", "doc_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs == Set((101L, 1L, 1.0), (103L, 2L, 1.0)))
  }

  test("portable hash scheme: digests match independently computed md5/affine values") {
    import org.apache.spark.sql.functions.{lit, typedLit}
    val g = HashScheme.Portable.key(lit("hello"))
    val x = HashScheme.Portable.prep(g)
    val r = spark.range(1).select(
      g.as("k"),
      HashScheme.Portable.tokenHash(lit("hello")).as("h"),
      x.as("x"),
      HashScheme.Portable.seeded(x, 0).as("s0"),
      HashScheme.Portable.seeded(x, 1).as("s1"),
      HashScheme.Portable.seeded(x, 3).as("s3"),
      HashScheme.Portable.band(typedLit(Seq(1L, 2L, 3L))).as("b")).head()
    // values computed with Python hashlib + a python splitmix64, not
    // Spark — cross-engine pin of the v2 affine family
    assert(r.getAs[String]("k") == "5d41402abc4b2a76b9719d911017c592")
    assert(r.getAs[Long]("h") == 419982666956583591L)  // int(md5("hello")[:15], 16)
    assert(r.getAs[Long]("x") == 929880748L)           // int(k[:15], 16) % (2^31-1)
    assert(r.getAs[Long]("s0") == 601537510L)          // (a0·x + b0) % p
    assert(r.getAs[Long]("s1") == 376076919L)
    assert(r.getAs[Long]("s3") == 1057899255L)
    // coefficient derivation itself is pinned (python splitmix64)
    assert(HashScheme.Portable.affineA(0) == 60845732L)
    assert(HashScheme.Portable.affineB(0) == 722909340L)
    assert(r.getAs[String]("b") == "02b12e930c8bcc7e92e74ff5d96ce118") // md5("1|2|3")
  }

  test("portable scheme minhash/simhash: same near-dup verdicts as the fast scheme") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely unrelated words describing some other topic entirely"),
      (4L, "")
    ).toDF("doc_id", "text")
    def pairs(scheme: HashScheme) =
      Dedup.nearDuplicates(docs, threshold = 0.9, scheme = scheme)
        .select("doc_a", "doc_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // identical docs share every band under ANY hash family; the verified
    // jaccard is hash-independent
    assert(pairs(HashScheme.Fast) == pairs(HashScheme.Portable))
    assert(pairs(HashScheme.Portable).contains((1L, 2L, 1.0)))
    // simhash: identical texts agree, and the portable width caps at 60 bits
    val sh = Dedup.simhash(docs, scheme = HashScheme.Portable)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L) && sh(1L) != sh(3L))
    assert(sh.values.forall(v => v >= 0 && v < (1L << 60)))
    assert(sh(4L) == 0L)
  }

  test("incremental near-dup via persisted index ≡ convenience path, across write/read") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "entirely different content here today"),
      (4L, "")                                        // empty doc in the index
    ).toDF("doc_id", "text")
    val batch = Seq(
      (101L, "THE QUICK brown fox jumps over the lazy dog"),
      (102L, "a genuinely new document nothing shares"),
      (103L, "pack my box with five dozen liquor jugs")
    ).toDF("doc_id", "text")
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_a", "doc_b", "inter", "uni", "jaccard")
      .collect().map(_.toSeq).toSet
    val direct = norm(Dedup.nearDuplicatesAgainst(batch, corpus, threshold = 0.9))
    // in-session index
    val idx = Dedup.buildSignatureIndex(corpus).cached()
    assert(norm(Dedup.nearDuplicatesAgainst(batch, idx, "text", 0.9)) == direct)
    // parquet round-trip: params + frames survive, results identical
    val tmp = java.nio.file.Files.createTempDirectory("graft-sigidx-rt").toString
    idx.write(tmp)
    val loaded = SignatureIndex.read(spark, tmp)
    assert((loaded.shingleSize, loaded.numHashes, loaded.numBands) == ((3, 32, 8)))
    assert(norm(Dedup.nearDuplicatesAgainst(batch, loaded, "text", 0.9)) == direct)
  }

  test("perplexityBuckets: common-token docs head, rare-token docs tail") {
    // doc 1-4: all common tokens; doc 5-6 mixed; doc 7-8: unique tokens
    val docs = ((1L to 4L).map(i => (i, "the the the the")) ++
      Seq((5L, "the the rare5a rare5b"), (6L, "the the rare6a rare6b")) ++
      Seq((7L, "zq7a zq7b zq7c zq7d"), (8L, "zq8a zq8b zq8c zq8d")) :+
      (9L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.perplexityBuckets(docs, headFrac = 0.25, tailFrac = 0.25)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(!got.contains(9L), "token-less docs are not bucketed")
    assert(got(1L) == "head", s"most-typical doc must rank head: $got")
    assert(got(7L) == "tail" || got(8L) == "tail", s"rare-token docs rank tail: $got")
    assert(got.values.toSet.subsetOf(Set("head", "middle", "tail")))
    // scale mode: same schema, only valid buckets, most-typical stays head
    val approx = TextAnalysis.perplexityBuckets(docs, headFrac = 0.25,
      tailFrac = 0.25, exact = false)
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(approx(1L) == "head")
    assert(approx.values.toSet.subsetOf(Set("head", "middle", "tail")))
  }

  test("snapshotDiff: added/removed/changed/unchanged incl. null-text docs") {
    val prev = Seq[(Long, String)](
      (1L, "stays the same"), (2L, "will change"), (3L, "will vanish"),
      (4L, null), (5L, "WILL   change?"))
      .toDF("doc_id", "text")
    val cur = Seq[(Long, String)](
      (1L, "stays the same"), (2L, "has changed"),
      (4L, null),                       // null both sides: unchanged
      (5L, "will change"),              // equal AFTER normalization
      (6L, "brand new"))
      .toDF("doc_id", "text")
    val got = CorpusStats.snapshotDiff(prev, cur)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "unchanged", 6L -> "added"))
  }

  test("simhashNearDuplicates ≡ brute-force popcount filter (pigeonhole recall)") {
    import org.apache.spark.sql.functions.{bit_count, col}
    // perturbed copies sit at small Hamming distances, unrelated docs far
    val docs = ((1 to 12).map(i =>
      (i.toLong, s"shared prefix words alpha beta gamma delta tail$i")) ++
      Seq((100L, "completely unrelated content about something else"),
        (101L, "completely unrelated content about something else"), // exact copy
        (102L, "")) // empty doc: fingerprint 0
    ).toDF("doc_id", "text")
    val t = 12
    val got = Dedup.simhashNearDuplicates(docs, maxHamming = t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force over ALL pairs — banding must find exactly this set
    // (pigeonhole guarantees no missed pair within distance t)
    val fp = Dedup.simhash(docs)
    val brute = fp.select(col("doc_id").as("doc_a"), col("simhash").as("sa"))
      .crossJoin(fp.select(col("doc_id").as("doc_b"), col("simhash").as("sb")))
      .where(col("doc_a") < col("doc_b"))
      .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))))
      .where(col("hamming") <= t)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(4))).toSet
    assert(got == brute, s"banded=${got.size} brute=${brute.size}")
    assert(got.exists { case (a, b, h) => a == 100L && b == 101L && h == 0 },
      "exact copy pair must verify at hamming 0")
  }

  test("SignatureIndex append / appendTo: incremented index ≡ full rebuild") {
    val day1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs")
    ).toDF("doc_id", "text")
    val day2 = Seq(
      (3L, "entirely different content here today"),
      (4L, "")                                        // empty doc arrives late
    ).toDF("doc_id", "text")
    val batch = Seq(
      (101L, "THE QUICK brown fox jumps over the lazy dog"), // matches day1
      (102L, "entirely different content here today"),       // matches day2
      (103L, "a genuinely new document nothing shares")
    ).toDF("doc_id", "text")
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_a", "doc_b", "inter", "uni", "jaccard")
      .collect().map(_.toSeq).toSet
    val direct = norm(
      Dedup.nearDuplicatesAgainst(batch, day1.unionByName(day2), threshold = 0.9))
    assert(direct.exists(_.head == 102L), "fixture must exercise the appended half")
    // in-memory fold
    val appended = Dedup.buildSignatureIndex(day1).append(day2).cached()
    assert(norm(Dedup.nearDuplicatesAgainst(batch, appended, "text", 0.9)) == direct)
    // persisted fold: only increment rows are written; params untouched
    val tmp = java.nio.file.Files.createTempDirectory("graft-sigidx-app").toString
    Dedup.buildSignatureIndex(day1).write(tmp)
    val updated = SignatureIndex.appendTo(spark, tmp, day2)
    assert((updated.shingleSize, updated.numHashes, updated.numBands) == ((3, 32, 8)))
    assert(norm(Dedup.nearDuplicatesAgainst(batch, updated, "text", 0.9)) == direct)
    // a second read sees the appended rows too (they live in the files)
    val reread = SignatureIndex.read(spark, tmp)
    assert(norm(Dedup.nearDuplicatesAgainst(batch, reread, "text", 0.9)) == direct)
  }

  test("multimodal: stubbed decode is deterministic, frame sampling chunks payload") {
    val docs = Seq((1L, "abcdefgh" * 8, "en", "s", 64L), (2L, "short", "en", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.syntheticMedia(docs)
    val f1 = Multimodal.decodeFeatures(media, dim = 8).orderBy("media_id").collect()
    val f2 = Multimodal.decodeFeatures(media, dim = 8).orderBy("media_id").collect()
    assert(f1.map(_.getSeq[Float](3)).toSeq == f2.map(_.getSeq[Float](3)).toSeq)
    assert(f1.head.getSeq[Float](3).length == 8)
    val frames = Multimodal.sampleFrames(media).where($"media_id" === 1).collect()
    assert(frames.map(_.getInt(1)).toSeq.sorted == Seq(0, 2, 4, 6))
    frames.foreach(r => assert(r.getAs[Array[Byte]]("frame_payload").length == 8))
  }

  test("audioFingerprint: perturbed clip stays near, determinism, null-safe") {
    val docs = (1L to 30L)
      .map(i => (i, "x" * (20 + (i % 40)).toInt)).toSeq.toDF("doc_id", "text")
    val orig = Multimodal.syntheticWavMedia(docs)
    val pert = Multimodal.syntheticWavMediaPerturbed(docs, 5000000L)
    val fp1 = Multimodal.audioFingerprint(orig, frameLen = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fp2 = Multimodal.audioFingerprint(orig, frameLen = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp1 === fp2, "fingerprints must be deterministic")
    val fpP = Multimodal.audioFingerprint(pert, frameLen = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hams = fp1.map { case (id, f) =>
      java.lang.Long.bitCount(f ^ fpP(id + 5000000L))
    }
    assert(hams.max <= 4, s"one-sample edit must stay near: ${hams.max}")
    // pairing finds every planted pair at maxHamming 4
    val pairs = Multimodal.audioNearDuplicates(
        orig.unionByName(pert), maxHamming = 4, frameLen = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (1L to 30L).foreach { id =>
      assert(pairs.contains((id, id + 5000000L)), s"missing planted pair $id")
    }
    // null payloads fingerprint to null and never pair
    val withNull = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(99L, null, null))),
      Multimodal.mediaSchema)
    val nf = Multimodal.audioFingerprint(withNull).collect()
    assert(nf.length == 1 && nf.head.isNullAt(1))
  }

  test("PpmDecoder / WavDecoder: real header parse, features from payload bytes") {
    // 2×1 P6 with a header comment: pixels (0,0,0) and (255,255,255)
    val ppm = "P6\n# a comment\n2 1\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      Array[Byte](0, 0, 0, -1, -1, -1)
    val d = Multimodal.PpmDecoder.decode(ppm, 2)
    assert(d.width == 2 && d.height == 1)
    // dim=2 round-robin over 6 raster bytes: bucket0 ← idx 0,2,4 = 0,0,255;
    // bucket1 ← idx 1,3,5 = 0,255,255 — means normalized by 255
    assert(d.features.toSeq ==
      Seq((255.0 / 3 / 255.0).toFloat, (510.0 / 3 / 255.0).toFloat))
    // truncated raster / wrong magic decode to nulls, never throw
    assert(Multimodal.PpmDecoder.decode(
      "P6\n9999 9999\n255\n".getBytes, 2).width == null)
    assert(Multimodal.PpmDecoder.decode("JFIF****".getBytes, 2).width == null)

    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    val samples = Array[Byte](0, 64, -128, -1) // 0, 64, 128, 255 unsigned
    val wav = "RIFF".getBytes ++ le32(36 + samples.length) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
      le32(8000) ++ le16(1) ++ le16(8) ++
      "data".getBytes ++ le32(samples.length) ++ samples
    val wd = Multimodal.WavDecoder.decode(wav, 2)
    assert(wd.width == 8000 && wd.height == 1) // sample rate + channels
    assert(wd.features.toSeq ==
      Seq((128.0 / 2 / 255.0).toFloat, (319.0 / 2 / 255.0).toFloat))
    assert(Multimodal.WavDecoder.decode("RIFFxxxxWAVE".getBytes, 2).width == null)
    // crafted negative chunk length must terminate (nulls), not spin the
    // chunk walk forever
    val evil = "RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes ++
      "junk".getBytes ++ le32(-8) ++ new Array[Byte](32)
    assert(Multimodal.WavDecoder.decode(evil, 2).width == null)
    // zero-dimension and int-overflow PPM headers are rejected at parse
    assert(Multimodal.PpmDecoder.decode("P6\n0 0\n255\n".getBytes, 2).width == null)
    assert(Multimodal.PpmDecoder.decode(
      "P6\n100000 100000\n255\n".getBytes ++ new Array[Byte](64), 2).width == null)
    // pcm extraction: exact data bytes back; malformed → empty
    assert(Multimodal.WavDecoder.pcm(wav).toSeq == samples.toSeq)
    assert(Multimodal.WavDecoder.pcm("nope".getBytes).isEmpty)
  }

  test("wavFrameFeatures: hand-computed RMS and zero crossings per frame") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    // 6 samples: centered values +72, -68, +72, -68, 0, 0
    val samples = Array[Byte](200.toByte, 60, 200.toByte, 60, 128.toByte, 128.toByte)
    val wav = "RIFF".getBytes ++ le32(36 + samples.length) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
      le32(8000) ++ le16(1) ++ le16(8) ++
      "data".getBytes ++ le32(samples.length) ++ samples
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, wav))),
      StructType(Seq(StructField("media_id", LongType),
        StructField("payload", BinaryType))))
    // frameLen 4: frame 0 = [+72,-68,+72,-68] → 3 crossings,
    // rms = sqrt((72²+68²+72²+68²)/4); frame 1 = [0,0] → rms 0, zc 0
    // (center 0 counts as non-negative: no flip against itself)
    val rows = Multimodal.wavFrameFeatures(media, frameLen = 4)
      .orderBy("frame_idx").collect()
    assert(rows.length == 2)
    val f0 = rows(0)
    assert(f0.getInt(1) == 0 && f0.getInt(2) == 4 && f0.getLong(4) == 3L)
    val expRms = BigDecimal(math.sqrt((72.0 * 72 + 68 * 68 + 72 * 72 + 68 * 68) / 4))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(f0.getDouble(3) == expRms)
    val f1 = rows(1)
    assert(f1.getInt(1) == 1 && f1.getInt(2) == 2 &&
      f1.getDouble(3) == 0.0 && f1.getLong(4) == 0L)
  }

  test("resizePpm: nearest-neighbor sampling, valid output PPM, bad input → null") {
    val src = "P6\n2 1\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      Array[Byte](1, 2, 3, -56, -55, -54) // pixels A=(1,2,3), B=(200,201,202)
    val media = Seq((1L, src, ("image", "ppm")), (2L, "JFIF**garbage**".getBytes, ("image", "jpeg")))
      .map { case (id, p, (t, f)) => (id, p, t, f) }
      .toDF("media_id", "payload", "t", "f")
      .select(col("media_id"), col("payload"),
        struct(col("t").as("media_type"), col("f").as("format"),
          lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
          lit(null).cast("long").as("duration_ms")).as("meta"))
    val out = Multimodal.resizePpm(media, outW = 4, outH = 2)
      .orderBy("media_id").collect()
    val p1 = out(0).getAs[Array[Byte]](1)
    // header + 4×2 raster; sx per x = 0,0,1,1 so each row is A A B B
    val header = "P6\n4 2\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val row = Array[Byte](1, 2, 3, 1, 2, 3, -56, -55, -54, -56, -55, -54)
    assert(p1.sameElements(header ++ row ++ row))
    assert(out(1).isNullAt(1), "non-PPM payload must resize to null, not throw")
    // the resized payload is itself a decodable PPM
    val d = Multimodal.PpmDecoder.decode(p1, 1)
    assert(d.width == 4 && d.height == 2)
  }

  test("syntheticPpmMedia → PpmDecoder round trip in Spark") {
    val docs = Seq((7L, "abcdefghij"), (8L, ""), (9L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = Multimodal.decodeFeatures(
        Multimodal.syntheticPpmMedia(docs), decoder = Multimodal.PpmDecoder)
      .orderBy("media_id").collect()
    // n=10 → w=14, h=14; n=0 (empty AND null text) → w=4, h=4
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq ==
      Seq((7L, 14, 14), (8L, 4, 4), (9L, 4, 4)))
    // f0 for doc 8: raster bytes (8 + i) % 256 at i ≡ 0 (mod 16), N = 48
    val want = ((8.0 + 24.0 + 40.0) / 3 / 255.0).toFloat
    assert(out(1).getSeq[Float](3).head == want)
  }

  test("ImageIoDecoder: real PNG/JPEG codec decode; lossless ≡ PpmDecoder; bad input → null") {
    // PNG round trip: encode known pixels, decode must return them exactly
    val img = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, (1 << 16) | (2 << 8) | 3)
    img.setRGB(1, 0, (200 << 16) | (201 << 8) | 202)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val d = Multimodal.ImageIoDecoder.decode(png, 2)
    assert(d.width == 2 && d.height == 1)
    // identical raster through the PPM path → identical features
    val ppm = "P6\n2 1\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      Array[Byte](1, 2, 3, -56, -55, -54)
    assert(d.features.toSeq == Multimodal.PpmDecoder.decode(ppm, 2).features.toSeq)
    // raster() feeds averageHash/resizeImage: same bytes, offset 0
    val Some((w, h, bytes, off)) = Multimodal.ImageIoDecoder.raster(png)
    assert(w == 2 && h == 1 && off == 0 &&
      bytes.sameElements(Array[Byte](1, 2, 3, -56, -55, -54)))
    // JPEG: lossy, so just prove the codec actually runs (dims recovered)
    val jbos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jbos)
    val jd = Multimodal.ImageIoDecoder.decode(jbos.toByteArray, 2)
    assert(jd.width == 2 && jd.height == 1 && jd.features.length == 2)
    // malformed / non-image payloads decode to nulls, never throw
    assert(Multimodal.ImageIoDecoder.decode("not an image".getBytes, 2).width == null)
    assert(Multimodal.ImageIoDecoder.decode(Array.empty[Byte], 2).width == null)
  }

  test("syntheticPngMedia → ImageIoDecoder ≡ syntheticPpmMedia → PpmDecoder") {
    val docs = Seq((7L, "abcdefghij"), (8L, ""), (9L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val viaPng = Multimodal.decodeFeatures(
        Multimodal.syntheticPngMedia(docs), decoder = Multimodal.ImageIoDecoder)
      .orderBy("media_id").collect()
    val viaPpm = Multimodal.decodeFeatures(
        Multimodal.syntheticPpmMedia(docs), decoder = Multimodal.PpmDecoder)
      .orderBy("media_id").collect()
    // PNG is lossless: codec decode must reproduce the PPM path exactly —
    // dimensions AND every feature value
    assert(viaPng.map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getSeq[Float](3))).toSeq ==
      viaPpm.map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getSeq[Float](3))).toSeq)
    // and the hash chain sees the same rasters too
    val hPng = Multimodal.averageHash(Multimodal.syntheticPngMedia(docs),
      decoder = Multimodal.ImageIoDecoder).orderBy("media_id").collect()
    val hPpm = Multimodal.averageHash(Multimodal.syntheticPpmMedia(docs))
      .orderBy("media_id").collect()
    assert(hPng.map(_.getLong(3)).toSeq == hPpm.map(_.getLong(3)).toSeq)
  }

  test("compressionRatio: repetition compresses, noise doesn't; null/empty → null") {
    val docs = Seq(
      (1L, "word " * 400),                                   // one token repeated
      (2L, (1 to 400).map(i => s"tok${i * 7919 % 997}").mkString(" ")), // varied
      (3L, null.asInstanceOf[String]),
      (4L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.compressionRatio(docs).orderBy("doc_id").collect()
    val r1 = got(0).getDouble(3)
    val r2 = got(1).getDouble(3)
    assert(r1 < 0.05, s"pure repetition should compress hard, ratio $r1")
    assert(r2 > 2 * r1, s"varied text must compress worse than repetition ($r2 vs $r1)")
    assert(got(2).isNullAt(1) && got(2).isNullAt(3))
    assert(got(3).getInt(1) == 0 && got(3).isNullAt(3))
    // raw_len is the exact utf-8 byte count — the externally checkable half
    assert(got(0).getInt(1) == 2000)
  }

  test("dedupLines: corpus-first paragraph survives, later copies drop, within-doc repeats too") {
    val docs = Seq(
      (1L, "shared para\nunique one"),
      (2L, "unique two\nshared para"),          // cross-doc dup: doc 1 wins
      (3L, "rep\nrep\nunique three"),           // within-doc dup: pos 0 wins
      (4L, "shared para"),                      // whole doc a later dup → empties
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = Boilerplate.dedupLines(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ("shared para\nunique one", 2L, 0L))
    assert(got(2L) == ("unique two", 2L, 1L))
    assert(got(3L) == ("rep\nunique three", 3L, 1L))
    assert(got(4L) == ("", 1L, 1L))
    assert(got(5L) == ("", 0L, 0L))
  }

  test("bloom-prefiltered exact dedup ≡ plain anti-join; filter admits every corpus fp") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val batch = docs.where(col("doc_id") % 2 === 0)
      .select((col("doc_id") + 500000L).as("doc_id"), col("text"))       // dups
      .unionByName(docs.where(col("doc_id") % 2 === 1)
        .select((col("doc_id") + 900000L).as("doc_id"),
          concat(coalesce(col("text"), lit("")), lit(" fresh")).as("text"))) // novel
    val plain = Dedup.dedupAgainstExact(batch, docs)
      .select("doc_id").as[Long].collect().toSet
    val bloomed = Dedup.dedupAgainstExactBloom(batch, docs)
      .select("doc_id").as[Long].collect().toSet
    assert(bloomed == plain && plain.nonEmpty,
      "the bloom tier must be result-identical to the anti-join")

    // no false negatives: every known corpus fingerprint must probe true
    val fps = docs.select(TextAnalysis.fingerprint(col("text")).as("fp"))
      .where(col("fp").isNotNull).distinct()
    val bloom = graft.functions.BloomOps.buildFilter(fps, "fp", 1000L)
    val misses = fps.where(!graft.functions.BloomOps.mightContain(col("fp"), bloom))
      .count()
    assert(misses == 0L, "a Bloom filter can never false-negative its own inserts")
  }

  test("EmbeddingIndex: probe ≡ full near-dup restricted; append ≡ rebuild; parquet round trip") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").where(col("vec_id") < 300).cache()
    def shifted(m: Int, off: Long) = emb.where(pmod(col("vec_id"), lit(m)) === 0)
      .select((col("vec_id") + lit(off)).as("vec_id"), col("embedding"))
    val inc1 = shifted(2, 1000000L)
    val inc2 = shifted(3, 2000000L)

    // probe against the index ≡ the batch near-dup on corpus ∪ increment,
    // restricted to (corpus, increment) cross pairs
    val idx = Dedup.buildEmbeddingIndex(emb, dim = 64).cached()
    val got = Dedup.embeddingNearDuplicatesAgainst(inc1, idx, threshold = 0.999)
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSet
    val full = Dedup.embeddingNearDuplicates(emb.unionByName(inc1), dim = 64,
        threshold = 0.999)
      .where(col("id_a") < 1000000L && col("id_b") >= 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == full && got.nonEmpty,
      s"index probe must equal the restricted batch result (${got.size} vs ${full.size})")

    // in-memory append ≡ full rebuild for the NEXT increment
    val viaAppend = Dedup.embeddingNearDuplicatesAgainst(inc2,
        idx.append(inc1), threshold = 0.999)
      .collect().map(_.toSeq).toSet
    val viaRebuild = Dedup.embeddingNearDuplicatesAgainst(inc2,
        Dedup.buildEmbeddingIndex(emb.unionByName(inc1), dim = 64),
        threshold = 0.999)
      .collect().map(_.toSeq).toSet
    assert(viaAppend == viaRebuild && viaAppend.nonEmpty)

    // storage round trip: write, appendTo (increment-only IO), read, probe
    val dir = java.nio.file.Files.createTempDirectory("graft-embidx").toString
    idx.write(dir)
    val stored = EmbeddingIndex.appendTo(spark, dir, inc1)
    assert(stored.dim == 64 && stored.planes == 12 && stored.seed == 42L)
    val viaDisk = Dedup.embeddingNearDuplicatesAgainst(inc2, stored,
        threshold = 0.999)
      .collect().map(_.toSeq).toSet
    assert(viaDisk == viaRebuild)
  }

  test("fixMojibake: double-encoded text restores; clean text untouched; idempotent") {
    val clean = "café — naïve “quotes” … €5 ™ ©2024 señor"
    val garbled = new String(
      clean.getBytes(java.nio.charset.StandardCharsets.UTF_8), "windows-1252")
    assert(garbled != clean && garbled.contains("Ã©"))
    val df = Seq((1L, garbled), (2L, clean),
      (3L, "plain ascii stays"), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        TextAnalysis.fixMojibake(col("text")).as("t"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got(1L) == clean, s"repair failed: ${got(1L)}")
    assert(got(2L) == clean, "already-clean text must pass through")
    assert(got(3L) == "plain ascii stays")
    assert(got(4L) == null)
    // idempotent: repairing repaired text changes nothing
    val twice = df.select(TextAnalysis.fixMojibake(
      TextAnalysis.fixMojibake(col("text"))).as("t"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSet
    assert(twice == got.values.toSet)
  }

  test("charEntropy: repetition < natural < noise ordering; hand-checked uniform case") {
    val docs = Seq(
      (1L, "aaaaaaaaaaaaaaaa"),                       // 1 symbol → H = 0
      (2L, "abababababababab"),                       // 2 symbols uniform → 1 bit
      (3L, "the quick brown fox jumps over the dog"), // natural
      (4L, "q7#xZ!p9@wL2$vK8%mR4&nT6*bY1(cJ3)"),      // near-noise
      (5L, null.asInstanceOf[String]), (6L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.charEntropy(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    assert(got(1L)._2 == 0.0)
    assert(math.abs(got(2L)._2 - 1.0) < 1e-5, s"two uniform symbols = 1 bit, got ${got(2L)}")
    assert(got(2L)._2 < got(3L)._2 && got(3L)._2 < got(4L)._2,
      s"entropy must order rep < natural < noise: $got")
    assert(got(5L) == (0L, Double.NaN) || got(5L)._1 == 0L)
    assert(got(6L)._1 == 0L && got(6L)._2.isNaN)
  }

  test("noveltyScores: reference members 0, disjoint docs 1, half-overlap in between") {
    val ref = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),    // = reference → 0
      (2L, "one two three four five six"),            // disjoint → 1
      (3L, "alpha beta gamma delta x y"),             // shares a prefix
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = Decontaminate.noveltyScores(docs, ref).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toMap
    assert(got(1L)._3 == 0.0)
    assert(got(2L)._3 == 1.0)
    // doc 3: 4 distinct 3-shingles, 2 seen ("alpha beta gamma", "beta gamma delta")
    assert(got(3L) == (4L, 2L, 0.5))
    assert(got(4L)._1 == 0L && got(4L)._3.isNaN)
  }

  test("averageHash: hand-computed bits, uniform image packs all 64, bad input → null") {
    def ppm(w: Int, h: Int, raster: Array[Byte]) =
      s"P6\n$w $h\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ raster
    // 2×1 image, 2×1 grid: cell sums 6 and 603; only cell 1 ≥ mean → hash 2
    val tiny = ppm(2, 1, Array[Byte](1, 2, 3, -56, -55, -54))
    val uniform = ppm(3, 2, Array.fill[Byte](18)(17))
    val media = Seq((1L, tiny), (2L, uniform), (3L, "JFIF**".getBytes))
      .toDF("media_id", "payload")
    val small = Multimodal.averageHash(media.where(col("media_id") === 1),
      gridW = 2, gridH = 1).collect().head
    assert(small.getLong(3) == 2L &&
      small.getInt(1) == 2 && small.getInt(2) == 1)
    val full = Multimodal.averageHash(media).orderBy("media_id").collect()
    // uniform color: every cell sum equals the mean → all 64 bits set = -1L
    assert(full(1).getLong(3) == -1L)
    assert(full(2).isNullAt(3), "malformed payload must hash to null, not throw")
  }

  test("phashNearDuplicates ≡ brute-force popcount filter; perturbed copies pair close") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(80)
    val media = Multimodal.syntheticPpmMedia(docs).unionByName(
      Multimodal.syntheticPpmMediaPerturbed(docs, idOffset = 1000000L))
    val banded = Multimodal.phashNearDuplicates(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded.nonEmpty, "planted perturbed copies must produce pairs")
    // brute force over all hash pairs — pigeonhole banding must lose nothing
    val h = Multimodal.averageHash(media).where(col("phash").isNotNull)
    val a = h.select(col("media_id").as("media_a"), col("phash").as("pa"))
    val b = h.select(col("media_id").as("media_b"), col("phash").as("pb"))
    val brute = a.join(b, col("media_a") < col("media_b"))
      .withColumn("hamming", bit_count(col("pa").bitwiseXOR(col("pb"))))
      .where(col("hamming") <= 3)
      .select("media_a", "media_b", "hamming")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute)
    // a 3-byte flip perturbs exactly one sampled cell: most copies stay
    // within Hamming 3 of their original
    val selfPairs = banded.count { case (x, y, _) => y == x + 1000000L }
    assert(selfPairs >= 40, s"only $selfPairs of 80 copies paired with their original")
  }

  test("removeRepeatedSpans(keepFirst = true): one copy of each span survives") {
    val df = Seq(
      (1L, "alpha beta gamma delta unique1 tail1"),
      (2L, "prefix2 alpha beta gamma delta tail2"),
      (3L, "totally different words here now ok")
    ).toDF("doc_id", "text")
    val got = SpanDedup.removeRepeatedSpans(df, k = 4, keepFirst = true)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // doc 1 holds the canonical occurrence of the shared 4-token span —
    // it keeps its full text; doc 2's copy is removed; doc 3 untouched
    assert(got(1L) == (("alpha beta gamma delta unique1 tail1", 6L, 0L)))
    assert(got(2L) == (("prefix2 tail2", 6L, 4L)))
    assert(got(3L) == (("totally different words here now ok", 6L, 0L)))
    // the default policy removes BOTH occurrences — sanity-contrast
    val both = SpanDedup.removeRepeatedSpans(df, k = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(both(1L) == "unique1 tail1" && both(2L) == "prefix2 tail2")
  }

  test("maximalRepeatedSpans: islands merge into true variable-length spans") {
    val df = Seq(
      // docs 1/2 share a 5-token span → one maximal island of length 5
      // (> k = 4), reported once per doc with the true length and text
      (1L, "alpha beta gamma delta echo unique1 tail1"),
      (2L, "prefix2 alpha beta gamma delta echo tail2"),
      (3L, "totally different words here now ok")
    ).toDF("doc_id", "text")
    val got = SpanDedup.maximalRepeatedSpans(df, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSet
    assert(got == Set(
      (1L, 0L, 5L, "alpha beta gamma delta echo"),
      (2L, 1L, 5L, "alpha beta gamma delta echo")))
    // two disjoint repeats inside one doc → two islands, not one
    val df2 = Seq(
      (1L, "a b c d X Y Z p q r s"),
      (2L, "a b c d J K L p q r s")).toDF("doc_id", "text")
    val spans2 = SpanDedup.maximalRepeatedSpans(df2, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans2 == Set((1L, 0L, 4L), (1L, 7L, 4L),
      (2L, 0L, 4L), (2L, 7L, 4L)))
  }

  test("removeRepeatedSpans(reliable = true): checkpointed run ≡ default run") {
    val df = Seq(
      (1L, "alpha beta gamma delta unique1 tail1"),
      (2L, "prefix2 alpha beta gamma delta tail2"),
      (3L, "totally different words here now ok")
    ).toDF("doc_id", "text")
    def norm(out: org.apache.spark.sql.DataFrame) =
      out.collect().map(_.toSeq).toSet
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      // a reliable run without a checkpoint dir must fail loudly up front,
      // not die mid-job inside the checkpoint write
      intercept[IllegalArgumentException] {
        SpanDedup.removeRepeatedSpans(df, k = 4, reliable = true)
      }
      spark.sparkContext.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
    }
    assert(norm(SpanDedup.removeRepeatedSpans(df, k = 4, reliable = true)) ==
      norm(SpanDedup.removeRepeatedSpans(df, k = 4)))
  }

  test("removeRepeatedSpans: shared k-window spans removed, unique text survives") {
    // docs 1 and 2 share an exact 4-token span; doc 3 is unrelated;
    // doc 4 is shorter than k and must never be edited even though its
    // whole text equals doc 5's (no k-window exists in either)
    val df = Seq(
      (1L, "alpha beta gamma delta unique1 tail1"),
      (2L, "prefix2 alpha beta gamma delta tail2"),
      (3L, "totally different words here now ok"),
      (4L, "tiny doc"),
      (5L, "tiny doc")
    ).toDF("doc_id", "text")
    val got = SpanDedup.removeRepeatedSpans(df, k = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // doc1: window (alpha..delta) repeated → tokens 0-3 dropped
    assert(got(1L) == (("unique1 tail1", 6L, 4L)))
    // doc2: same window at position 1 → tokens 1-4 dropped
    assert(got(2L) == (("prefix2 tail2", 6L, 4L)))
    assert(got(3L) == (("totally different words here now ok", 6L, 0L)))
    assert(got(4L) == (("tiny doc", 2L, 0L)))
    assert(got(5L) == (("tiny doc", 2L, 0L)))
  }

  test("removeRepeatedSpans: null text keeps the non-null clean_text contract") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType, nullable = true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, null),
        org.apache.spark.sql.Row(2L, "a b c d e"))), schema)
    val got = SpanDedup.removeRepeatedSpans(df, k = 4)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == (("", 0L, 0L)), "null text → empty clean_text, zero counts")
    assert(got(2L) == (("a b c d e", 5L, 0L)))
  }

  test("removeRepeatedSpans: intra-document repetition is also a repeated span") {
    val df = Seq((1L, "a b c d x y a b c d"), (2L, "nothing shared at all here")).toDF("doc_id", "text")
    val got = SpanDedup.removeRepeatedSpans(df, k = 4)
      .where($"doc_id" === 1).head()
    // the 4-gram "a b c d" occurs twice inside doc 1 → both occurrences
    // covered; x y survive
    assert(got.getString(1) == "x y")
    assert(got.getLong(3) == 8L)
  }

  test("chunk: strided windows with overlap, tail kept, short docs single-chunk") {
    val df = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"), // 10 tokens
      (2L, "a b c"),                         // shorter than maxTokens
      (3L, "")                               // no tokens → no chunks
    ).toDF("doc_id", "text")
    val got = SpanDedup.chunk(df, maxTokens = 4, overlap = 1) // stride 3
      .orderBy("doc_id", "chunk_id").collect()
    val d1 = got.filter(_.getLong(0) == 1L)
    // starts 0,3,6 (ceil((10-4)/3)=2 → last start 6): windows of 4, tail 4
    assert(d1.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L))
    assert(d1.map(_.getString(2)).toSeq ==
      Seq("t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9"))
    assert(d1.map(_.getLong(4)).toSeq == Seq(4L, 4L, 4L))
    val d2 = got.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2.head.getString(2) == "a b c" && d2.head.getLong(4) == 3L)
    assert(!got.exists(_.getLong(0) == 3L))
    // every token of doc 1 appears in at least one chunk
    val covered = d1.flatMap(r => r.getString(2).split(" ")).toSet
    assert(covered == (0 until 10).map(i => s"t$i").toSet)
  }

  test("stripMarkup: tags, blocks, comments, and entities removed") {
    val df = Seq(
      (1L, "<html><body><p>keep this</p><script>drop();</script></body></html>"),
      (2L, "<style>p { color: red }</style>before <!-- note --> after"),
      (3L, "a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39;"),
      (4L, "<ScRiPt>case insensitive</sCrIpT>ok"),
      (5L, "<script>\nmultiline\n</script>text")
    ).toDF("doc_id", "text")
    val got = df.select($"doc_id", TextAnalysis.stripMarkup($"text").as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "keep this")
    assert(got(2L) == "before after")
    assert(got(3L) == "a & b <c> \"d\" 'e'")
    assert(got(4L) == "ok")
    assert(got(5L) == "text")
  }

  test("stripMarkup preserves line structure for downstream line censuses") {
    val df = Seq(
      (1L, "body line one\nCOMMON FOOTER\nbody line two"),
      (2L, "a  \n\n  b")).toDF("doc_id", "text")
    val got = df.select($"doc_id", TextAnalysis.stripMarkup($"text").as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "body line one\nCOMMON FOOTER\nbody line two")
    assert(got(2L) == "a\nb", "blank-line runs collapse to one newline")
  }

  test("unigramLogProb: hand-checked micro-log sums, exact integers") {
    // corpus: a a a b  → P(a)=3/4, P(b)=1/4
    val df = Seq((1L, "a a a"), (2L, "b"), (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogProb(df).orderBy("doc_id").collect()
    val lpA = math.round(math.log10(3.0 / 4.0) * 1e6) // -124939
    val lpB = math.round(math.log10(1.0 / 4.0) * 1e6) // -602060
    assert(got(0).getLong(1) == 3L && got(0).getLong(2) == 3 * lpA)
    assert(got(1).getLong(1) == 1L && got(1).getLong(2) == lpB)
    assert(got(2).getLong(1) == 0L && got(2).isNullAt(2) && got(2).isNullAt(3))
    // derived average is the deterministic integer-ratio round
    assert(got(0).getDouble(3) ==
      BigDecimal(3.0 * lpA / 3 / 1e6).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("mergeable card: shard merge keeps counters exact, HLL within 5%") {
    val docs = (1L to 90L).map { i =>
      // duplicates planted ACROSS shard boundaries (i, i+1, i+2 share text
      // for every i % 9 == 0) so per-shard sketches must union correctly
      val t = if (i % 9 < 3) s"dup text ${(i / 9) * 9}" else s"unique text $i"
      (i, t, if (i % 2 == 0) "en" else "de", s"src${i % 3}")
    }.toDF("doc_id", "text", "lang", "source")
    val shards = (0 to 2).map(k =>
      CorpusStats.datasetCardSketch(docs.where($"doc_id" % 3 === k)))
    val merged = CorpusStats.mergeCards(shards)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(6))).toMap
    val exact = CorpusStats.datasetCard(docs)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(6))).toMap
    assert(merged.keySet == exact.keySet)
    for ((g, (nd, nt, est)) <- merged) {
      val (xd, xt, xdist) = exact(g)
      assert(nd == xd && nt == xt, s"group $g: counters must merge exactly")
      assert(math.abs(est - xdist) <= math.max(1L, xdist / 20),
        s"group $g: estimate $est vs exact $xdist")
    }
  }

  test("bigramLogProb: hand-checked interpolated micro-log sums") {
    // corpus: "a b a b" + "a b" → uni a:3 b:3 N=6; bigrams "a b":3 "b a":1
    val df = Seq((1L, "a b a b"), (2L, "a b"), (3L, "  ")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLogProb(df, lambda = 0.7).orderBy("doc_id").collect()
    val lpFirstA = math.round(math.log10(3.0 / 6.0) * 1e6)
    val lpAB = math.round(math.log10(0.7 * 3.0 / 3.0 + (1.0 - 0.7) * 3.0 / 6.0) * 1e6)
    val lpBA = math.round(math.log10(0.7 * 1.0 / 3.0 + (1.0 - 0.7) * 3.0 / 6.0) * 1e6)
    assert(got(0).getLong(1) == 4L)
    assert(got(0).getLong(2) == lpFirstA + 2 * lpAB + lpBA)
    assert(got(1).getLong(1) == 2L && got(1).getLong(2) == lpFirstA + lpAB)
    assert(got(2).getLong(1) == 0L && got(2).isNullAt(2) && got(2).isNullAt(3))
  }

  test("bigramLogProbKN: hand-checked Kneser-Ney micro-log sums") {
    // bigrams: "a b" x3, "b a" x1 → T=2 types, V=2; cprev(a)=3 n1prev(a)=1,
    // cprev(b)=1 n1prev(b)=1; n1w(a)=n1w(b)=1
    val df = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLogProbKN(df, discount = 0.75)
      .orderBy("doc_id").collect()
    val lpFirst = math.round(math.log10((1.0 + 1.0) / (2.0 + 2.0)) * 1e6)
    val lpAB = math.round(math.log10((3.0 - 0.75) / 3.0 + 0.75 * 1 / 3.0 * (1.0 / 2.0)) * 1e6)
    val lpBA = math.round(math.log10((1.0 - 0.75) / 1.0 + 0.75 * 1 / 1.0 * (1.0 / 2.0)) * 1e6)
    assert(got(0).getLong(1) == 4L && got(0).getLong(2) == lpFirst + 2 * lpAB + lpBA)
    assert(got(1).getLong(1) == 2L && got(1).getLong(2) == lpFirst + lpAB)
  }

  test("trigramLogProbKN: matches an independent plain-Scala KN reference") {
    val corpus = Seq((1L, "a b c a b c"), (2L, "a b d"), (3L, "c a b"),
      (4L, ""), (5L, "q"))
    val D = 0.75
    // reference model: censuses over plain Maps, same fixed-order float
    // chain — an independent implementation of the documented recursion
    val toks = corpus.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
    val tris = toks.values.flatMap(_.sliding(3).filter(_.size == 3)).toSeq
    val bigs = toks.values.flatMap(_.sliding(2).filter(_.size == 2)).toSeq
    val c3 = tris.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cab = bigs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cuv = c3.groupBy(_._1.take(2)).view.mapValues(_.values.sum).toMap
    val n1uv = c3.groupBy(_._1.take(2)).view.mapValues(_.size.toLong).toMap
    val n1vw = c3.keys.groupBy(_.drop(1)).view.mapValues(_.size.toLong).toMap
    val n1vmid = c3.keys.groupBy(t => t(1)).view.mapValues(_.size.toLong).toMap
    val cprev = cab.groupBy(_._1.head).view.mapValues(_.values.sum).toMap
    val n1prev = cab.keys.groupBy(_.head).view.mapValues(_.size.toLong).toMap
    val n1w = cab.keys.groupBy(_.last).view.mapValues(_.size.toLong).toMap
    val tt = cab.size.toDouble
    val vv = toks.values.flatten.toSet.size.toDouble
    def lp(ts: Seq[String], pos: Int): Long = {
      val w = ts(pos)
      val x =
        if (pos == 0) (n1w.getOrElse(w, 0L).toDouble + 1.0) / (tt + vv)
        else if (pos == 1) {
          val p = ts(pos - 1)
          (cab(Seq(p, w)) - D) / cprev(p) +
            D * n1prev(p) / cprev(p) * (n1w(w).toDouble / tt)
        } else {
          val k3 = Seq(ts(pos - 2), ts(pos - 1), w); val k2 = k3.take(2)
          val v = ts(pos - 1)
          (c3(k3) - D) / cuv(k2) + D * n1uv(k2) / cuv(k2) *
            ((n1vw(Seq(v, w)) - D) / n1vmid(v) +
              D * n1prev(v) / n1vmid(v) * (n1w(w).toDouble / tt))
        }
      math.round(math.log10(x) * 1e6)
    }
    val want = toks.view.mapValues(ts =>
      ts.indices.map(lp(ts, _)).sum).toMap
    val got = TextAnalysis.trigramLogProbKN(
        corpus.toDF("doc_id", "text"), discount = D)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) null else r.getLong(2))).toMap
    for ((id, ts) <- toks) {
      assert(got(id)._1 == ts.size.toLong, s"doc $id token count")
      if (ts.nonEmpty) assert(got(id)._2 == want(id), s"doc $id micro sum")
      else assert(got(id)._2 == null, s"doc $id must have null sum")
    }
  }

  test("bigramLogProbKN: doc-initial-only tokens get a finite fallback") {
    val df = Seq((1L, "a b a b"), (2L, "z")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLogProbKN(df)
      .where($"doc_id" === 2L).head()
    // z never appears as a continuation: (0+1)/(T+V) keeps it finite
    assert(got.getLong(1) == 1L && !got.isNullAt(2),
      "single never-continued token must still score")
  }

  test("bigramLogProb: deterministic transitions outscore the unigram model") {
    val df = (1L to 6L).map(i => (i, "x y z x y z x y z")).toDF("doc_id", "text")
    val bi = TextAnalysis.bigramLogProb(df).collect().map(_.getDouble(3)).head
    val uni = TextAnalysis.unigramLogProb(df).collect().map(_.getDouble(3)).head
    assert(bi > uni,
      s"predictable transitions must score higher under the bigram model: $bi <= $uni")
  }

  test("bigramLogProb: pruned transitions fall back to the unigram floor") {
    val df = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val full = TextAnalysis.bigramLogProb(df, lambda = 0.7)
      .where($"doc_id" === 1L).head().getLong(2)
    // minPairCount=2 prunes "b a" (count 1): its transition loses the
    // bigram term and the score drops
    val pruned = TextAnalysis.bigramLogProb(df, lambda = 0.7, minPairCount = 2)
      .where($"doc_id" === 1L).head().getLong(2)
    assert(pruned < full, s"pruning must lower the score: $pruned >= $full")
  }
}
