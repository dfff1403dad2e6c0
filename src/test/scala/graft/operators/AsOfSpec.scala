package graft.operators

import graft.SparkSpec

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val trades = Seq(
    ("A", 10L, 100.0), ("A", 20L, 101.0), ("A", 5L, 99.0),
    ("B", 10L, 50.0)).toDF("sym", "t", "px")
  private lazy val quotes = Seq(
    ("A", 8L, 1.0), ("A", 10L, 2.0), ("A", 15L, 3.0),
    ("C", 1L, 9.0)).toDF("sym", "q_t", "bid")

  test("backward as-of: latest right row with time <= left time") {
    val r = AsOf.asOfJoin(trades, quotes, Seq("sym"), "t", "q_t", Seq("bid"))
      .select("sym", "t", "bid")
      .collect().map(x => (x.getString(0), x.getLong(1)) ->
        Option(x.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(r(("A", 10L)) === Some(2.0)) // equal time matches
    assert(r(("A", 20L)) === Some(3.0)) // most recent, not first
    assert(r(("A", 5L)) === None)       // nothing precedes
    assert(r(("B", 10L)) === None)      // key missing on right
  }

  test("forward as-of: nearest right row with time >= left time") {
    val r = AsOf.asOfJoinForward(trades, quotes, Seq("sym"), "t", "q_t", Seq("bid"))
      .select("sym", "t", "bid")
      .collect().map(x => (x.getString(0), x.getLong(1)) ->
        Option(x.get(2)).map(_.asInstanceOf[Double])).toMap
    assert(r(("A", 10L)) === Some(2.0)) // equal time matches
    assert(r(("A", 5L)) === Some(1.0))  // nearest NEXT, not latest
    assert(r(("A", 20L)) === None)      // nothing follows
    assert(r(("B", 10L)) === None)      // key missing on right
  }

  test("forward as-of: null LEFT time matches nothing") {
    val l = Seq(("A", Option.empty[Long], 1.0), ("A", Some(5L), 2.0))
      .toDF("sym", "t", "px")
    val r = AsOf.asOfJoinForward(l, quotes, Seq("sym"), "t", "q_t", Seq("bid"))
      .select("t", "bid").collect()
      .map(x => Option(x.get(0)) -> Option(x.get(1))).toMap
    assert(r(None) === None, "a null probe time must not grab the first quote")
    assert(r(Some(5L)) === Some(1.0))
  }

  test("left row count is preserved (no amplification, no drops)") {
    val r = AsOf.asOfJoin(trades, quotes, Seq("sym"), "t", "q_t", Seq("bid"))
    assert(r.count() === trades.count())
    assert(r.columns.toSeq === Seq("sym", "t", "px", "bid"))
  }

  test("a null value on the matched right row is carried as null, not skipped") {
    val q = Seq(("A", 5L, Some(3.0)), ("A", 10L, None))
      .toDF("sym", "q_t", "bid")
    val r = AsOf.asOfJoin(trades.where($"sym" === "A" && $"t" === 20L), q,
        Seq("sym"), "t", "q_t", Seq("bid", "q_t"))
      .select("bid", "q_t").head()
    // ASOF semantics: the t=10 row matches; its bid is genuinely null —
    // carrying 3.0 from t=5 (or mixing q_t=10 with bid from t=5) is wrong
    assert(r.isNullAt(0))
    assert(r.getLong(1) === 10L)
  }

  test("null-time reference rows match nothing (not everything)") {
    val q = Seq(("B", null.asInstanceOf[java.lang.Long], 99.0))
      .toDF("sym", "q_t", "bid")
    val r = AsOf.asOfJoin(trades.where($"sym" === "B"), q,
      Seq("sym"), "t", "q_t", Seq("bid")).head()
    assert(r.isNullAt(r.fieldIndex("bid")))
  }

  test("null join keys match nothing (SQL/DuckDB ASOF semantics)") {
    val l = Seq((null.asInstanceOf[String], 10L, 1.0), ("A", 10L, 2.0))
      .toDF("sym", "t", "px")
    val q = Seq((null.asInstanceOf[String], 5L, 7.0), ("A", 5L, 8.0))
      .toDF("sym", "q_t", "bid")
    val r = AsOf.asOfJoin(l, q, Seq("sym"), "t", "q_t", Seq("bid"))
      .collect().map(x => Option(x.getString(0)) ->
        Option(x.get(x.fieldIndex("bid")))).toMap
    assert(r(Some("A")) === Some(8.0))
    // a null-keyed left row must NOT pick up the null-keyed quote
    assert(r(None) === None)
    assert(r.size === 2, "null-keyed left rows are kept, unmatched")
  }

  test("carried-column collision is rejected") {
    intercept[IllegalArgumentException] {
      AsOf.asOfJoin(trades, quotes.withColumnRenamed("bid", "px"),
        Seq("sym"), "t", "q_t", Seq("px"))
    }
  }

  test("native carry plans CarryForwardExec with no window, no buffering") {
    val df = AsOf.asOfJoin(trades, quotes, Seq("sym"), "t", "q_t", Seq("bid"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("CarryForward ["), s"native exec missing:\n$plan")
    assert(!plan.contains("Window ["), s"window must be gone:\n$plan")
  }

  test("native and window paths are row-identical on skewed random data") {
    val rng = new scala.util.Random(11)
    // key 0 is a marathon key (80% of rows) — the regime the native
    // pass exists for; duplicate times force the side tie-break
    val lhs = (1 to 800).map { i =>
      val k = if (rng.nextInt(5) > 0) 0L else rng.nextInt(9).toLong
      (k, rng.nextInt(50).toLong, i.toLong)
    }.toDF("k", "t", "lid")
    val rhs = (1 to 400).map { i =>
      val k = if (rng.nextInt(5) > 0) 0L else rng.nextInt(9).toLong
      (k, rng.nextInt(50).toLong, i * 1000L)
    }.toDF("k", "rt", "rv")
    // a non-total right order (duplicate (k, rt)) makes the carried
    // VALUE ambiguous; collapse to a deterministic reference side first
    val rhsU = rhs.groupBy("k", "rt")
      .agg(org.apache.spark.sql.functions.max("rv").as("rv"))
    def run(): (Set[Seq[Any]], Set[Seq[Any]]) = (
      AsOf.asOfJoin(lhs, rhsU, Seq("k"), "t", "rt", Seq("rv"))
        .collect().map(_.toSeq).toSet,
      AsOf.asOfJoinForward(lhs, rhsU, Seq("k"), "t", "rt", Seq("rv"))
        .collect().map(_.toSeq).toSet)
    val (nb, nf) = run()
    spark.conf.set("spark.graft.asof.native", "false")
    try {
      val (wb, wf) = run()
      assert(nb === wb, "backward: native must equal the window path")
      assert(nf === wf, "forward: native must equal the window path")
    } finally spark.conf.unset("spark.graft.asof.native")
  }

  test("auto mode detects the injected strategy; a session without it would fall back") {
    import org.apache.spark.sql.GraftBridge
    // this suite's session has GraftExtensions: detection must be true,
    // and 'auto' (the default) must pick the native exec
    assert(GraftBridge.hasStrategy(spark, graft.plans.CarryForwardStrategy))
    // a strategy NOT injected into the session reads false — the signal
    // the auto path uses to route a plain session to the window spelling
    object NotInjected extends org.apache.spark.sql.execution.SparkStrategy {
      override def apply(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) = Nil
    }
    assert(!GraftBridge.hasStrategy(spark, NotInjected))
    spark.conf.set("spark.graft.asof.native", "auto")
    try {
      val df = AsOf.asOfJoin(trades, quotes, Seq("sym"), "t", "q_t", Seq("bid"))
      df.collect()
      assert(df.queryExecution.executedPlan.toString.contains("CarryForward ["))
    } finally spark.conf.unset("spark.graft.asof.native")
  }
}
