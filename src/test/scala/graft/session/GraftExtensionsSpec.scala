package graft.session

import graft.SparkSpec

/** The extension seam: graft's native expressions must resolve by name in
  * SQL text after registration (either session-build `withExtensions` or
  * live-session [[GraftFunctions.register]] — both go through the same
  * injected-function list).
  */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftFunctions.register(spark)
  }

  test("cosine_sim and vec_dot resolve in SQL") {
    Seq((1L, Seq(1.0f, 0.0f), Seq(0.5f, 0.0f)))
      .toDF("id", "a", "b").createOrReplaceTempView("v")
    val r = spark.sql("SELECT vec_dot(a, b) AS d, cosine_sim(a, b) AS c FROM v").head()
    assert(r.getDouble(0) === 0.5)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("ngram_shingles resolves with and without the distinct flag") {
    Seq(Tuple1("a b a b")).toDF("t").createOrReplaceTempView("docs_v")
    val all = spark.sql("SELECT ngram_shingles(t, 2) AS s FROM docs_v")
      .head().getSeq[String](0)
    assert(all === Seq("a b", "b a", "a b"))
    val dist = spark.sql("SELECT ngram_shingles(t, 2, true) AS s FROM docs_v")
      .head().getSeq[String](0)
    assert(dist === Seq("a b", "b a"))
  }

  test("rolling_hash resolves in SQL and matches the Column API") {
    Seq(Tuple1("some text")).toDF("t").createOrReplaceTempView("rh_v")
    val viaSql = spark.sql("SELECT rolling_hash(t) AS h FROM rh_v").head().getLong(0)
    val viaCol = spark.table("rh_v")
      .select(graft.functions.RollingHash64.rollingHash($"t").as("h"))
      .head().getLong(0)
    assert(viaSql === viaCol)
  }

  test("non-literal shingle size is rejected at resolution") {
    Seq((1, "x y z")).toDF("n", "t").createOrReplaceTempView("bad_v")
    val e = intercept[Exception] {
      spark.sql("SELECT ngram_shingles(t, n) FROM bad_v").collect()
    }
    assert(e.getMessage.contains("literal int"))
  }

  test("the extension object declares the full function surface") {
    // EngineSession.build cannot run here (the JVM-shared suite session
    // wins getOrCreate), so the session-build seam is exercised by the
    // Verify/Bench mains; this pins the declared name set
    assert(GraftFunctions.all.map(_._1.funcName).toSet ===
      Set("vec_dot", "cosine_sim", "ngram_shingles", "rolling_hash",
        "unicode_norm", "theta_sketch", "theta_estimate", "freq_sketch",
        "kll_sketch", "kll_quantile", "bloom_agg", "bloom_contains",
        "md5_prefix60"))
  }
}
