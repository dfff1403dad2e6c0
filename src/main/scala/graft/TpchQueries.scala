package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operator coverage (SURVEY.md §2) expressed over the
  * driver-generated synthetic star schema, each with a DuckDB oracle.
  *
  * Numeric-stability rule for the oracle hash-compare: prefer aggregates
  * that are exact in IEEE double (sums of integer-valued doubles, counts,
  * min/max, value-copies like lag); round anything that goes through
  * libm (log, division) to 6 decimals on BOTH sides.
  */
object TpchQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // A-family: groupBy aggregate (SURVEY §2.5). Map-side partial agg, one shuffle.
    "q1_agg" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(sum("l_quantity").as("sum_qty"),
             count("*").as("n_rows"),
             countDistinct("l_orderkey").as("n_orders"))
    }),

    // S1/P1: scan + projection with the FAERS normalization expression set
    // (ifnull / lower / trim / translate — OpenFdaEtl.scala:72-84 semantics).
    "s1_scan_project" -> ((s, dir) => {
      Tables.part(s, dir).selectExpr(
        "p_partkey",
        "trim(translate(lower(p_name), '^', '\\'')) as p_name_norm",
        "ifnull(p_brand, '') as brand",
        "p_size")
    }),

    // P2/P3: IN-list + equality + null filters (OpenFdaEtl.scala:88-89,104-106).
    "p2_filter_in" -> ((s, dir) => {
      Tables.orders(s, dir)
        .where(col("o_orderstatus").isInCollection(Seq("O", "F")) &&
          col("o_orderpriority") =!= "1-URGENT" && col("o_custkey").isNotNull)
        .select("o_orderkey", "o_custkey", "o_orderstatus")
    }),

    // J1: broadcast left_anti against a small blacklist (OpenFdaEtl.scala:57-61).
    "j1_anti_blacklist" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val bl = Tables.part(s, dir).where(col("p_size") > 40)
        .select(col("p_partkey").as("bl_key"))
      li.join(broadcast(bl), li("l_partkey") === bl("bl_key"), "left_anti")
        .groupBy("l_returnflag")
        .agg(count("*").as("n"), sum("l_quantity").as("qty"))
    }),

    // J2: inner equi-join fact-to-dim (OpenFdaEtl.scala:33-34); dim broadcasts.
    "j2_inner_join" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val sup = Tables.supplier(s, dir)
      li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"), "inner")
        .groupBy("s_name")
        .agg(sum("l_quantity").as("qty"), count("*").as("n"))
    }),

    // J3/J4 + coalesce: left_outer enrich with fallback (OpenFdaEtl.scala:176-187).
    "j3_left_coalesce" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir).where(col("c_acctbal") > 0)
        .select("c_custkey", "c_mktsegment")
      o.join(c, o("o_custkey") === c("c_custkey"), "left_outer")
        .select(o("o_orderkey"),
                coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"))
    }),

    // J6: full_outer on a single key + distinct == set union of key sets
    // (StratifiedSampling.scala:25-26).
    "j6_full_outer_union" -> ((s, dir) => {
      val a = Tables.orders(s, dir).where(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("k")).distinct()
      val b = Tables.customer(s, dir).where(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("k")).distinct()
      a.join(b, Seq("k"), "full_outer").distinct()
    }),

    // 2.8+: set intersection (beyond ref — the reference's only set ops
    // are union + distinct). Plans as a left-semi aggregate.
    "u1_intersect" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      o.where(col("o_orderstatus") === "O").select("o_custkey")
        .intersect(o.where(col("o_orderstatus") === "F").select("o_custkey"))
    }),

    // 2.8+: multiset EXCEPT ALL — bag-count semantics (each part key
    // survives count(li) − count(filtered parts) times).
    "u2_except_all" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select("l_partkey")
      val p = Tables.part(s, dir).where(col("p_size") > 25)
        .select(col("p_partkey").as("l_partkey"))
      li.exceptAll(p)
    }),

    // J8: left_semi by intent (StratifiedSampling.scala:37-39).
    "j8_semi_join" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val urgent = Tables.orders(s, dir).where(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      li.join(urgent, li("l_orderkey") === urgent("o_orderkey"), "left_semi")
        .groupBy("l_returnflag").agg(count("*").as("n"))
    }),

    // A4-analog: deterministic dedup-by-subset — row_number window instead of
    // nondeterministic first-row-wins dropDuplicates (OpenFdaEtl.scala:189,
    // SURVEY §7.6.3 deterministic tie-break).
    "a4_dedup_subset" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      Tables.lineitem(s, dir)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select("l_orderkey", "l_partkey", "l_linenumber")
    }),

    // A5-analog: groupBy + collect_list, made deterministic/hashable via
    // sort + string join (MonteCarloSampling.scala:25-31).
    "a5_collect_list" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_suppkey").as("drug"))
        .agg(concat_ws(",", sort_array(collect_set(col("l_returnflag")))).as("events"),
             countDistinct(col("l_orderkey")).as("n_reports"))
    }),

    // 2.6-beyond: ordered analytic window (lag + row_number) — exact values,
    // no float arithmetic.
    "w_analytic_lag" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .select("o_orderkey", "o_custkey", "rn", "prev_price")
    }),

    // O1/O2: global sort (cosmetic in reference; hash-compare is order-blind).
    "o1_orderby" -> ((s, dir) => {
      Tables.supplier(s, dir).orderBy(col("s_name"))
        .select("s_suppkey", "s_name", "s_nationkey")
    }),

    // S6: the MedDRA $-separated parser semantics (collapse $-runs, split,
    // positional projection, lower names) over lines synthesized from part.
    "s6_meddra_parse" -> ((s, dir) => {
      Tables.part(s, dir)
        .select(concat(col("p_partkey"), lit("$$"), col("p_brand"), lit("$"),
          col("p_name"), lit("$$$")).as("_c0"))
        .withColumn("_c0", regexp_replace(col("_c0"), "\\$+", ","))
        .withColumn("_c0", split(col("_c0"), ","))
        .select(col("_c0").getItem(0).as("code"),
          col("_c0").getItem(1).as("brand"),
          lower(col("_c0").getItem(2)).as("name"))
    }),

    // 2.9 explode: split + explode + re-aggregate over document tokens.
    "explode_tokens" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("token"))
        .where(col("token") =!= "")
        .groupBy("token").agg(count("*").as("n"))
    }),

    // Skew surface: salted replicated-dim join — identical semantics to the
    // plain equi-join (the oracle is the plain join), hot keys spread over
    // `buckets` reducers.
    "j9_salted_join" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val sup = Tables.supplier(s, dir)
        .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
      operators.Skew.saltedJoin(li, sup, Seq("l_suppkey"), buckets = 4)
        .select("l_orderkey", "l_partkey", "l_suppkey", "s_name")
    }),

    // Skew surface: two-phase (key, salt) aggregation; exact for integer-
    // valued double sums, so hash-comparable against the one-phase oracle.
    "a8_salted_agg" -> ((s, dir) =>
      operators.Skew.saltedSumCount(Tables.lineitem(s, dir),
        Seq("l_returnflag"), "l_quantity", buckets = 8)),

    // Beyond-ref relational completeness: hierarchical aggregates in one
    // pass (Expand feeds one shuffle — not one job per grouping level).
    "a9_rollup" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_qty"), col("n"))),

    // min/max, not float sums: order-independent, so hash-exact vs DuckDB
    "a10_cube" -> ((s, dir) =>
      Tables.orders(s, dir)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"), min("o_totalprice").as("tp_min"),
          max("o_totalprice").as("tp_max"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("st"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("pri"),
          col("n"), col("tp_min"), col("tp_max"))),

    // Exact interpolated percentiles (both engines: linear / R type-7).
    "a11_percentile" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
          round(expr("percentile(l_quantity, 0.9)"), 6).as("p90"),
          round(expr("percentile(l_extendedprice, 0.99)"), 6).as("price_p99"))),

    // FORWARD as-of: each signup gets the user's NEXT purchase at or
    // after it (conversion lookup) — mirrored union-and-carry window,
    // DuckDB ASOF with the inequality flipped as the oracle.
    "j12_asof_forward" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val signups = ev.where(col("event_type") === "signup")
        .select("event_id", "user_id", "ts", "value")
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"), col("value").as("p_value"))
      operators.AsOf.asOfJoinForward(signups, purchases, Seq("user_id"),
          leftTime = "ts", rightTime = "p_ts", carry = Seq("p_value", "p_ts"))
        .select(col("event_id"), col("user_id"), col("p_value"),
          date_format(col("p_ts"), "yyyy-MM-dd HH:mm:ss").as("p_t"))
    }),

    // As-of join (custom temporal operator; DuckDB ASOF JOIN is the
    // oracle): each purchase gets the user's most recent prior signup.
    "j10_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val signups = ev.where(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("s_ts"), col("value").as("s_value"))
      operators.AsOf.asOfJoin(purchases, signups, Seq("user_id"),
          leftTime = "ts", rightTime = "s_ts", carry = Seq("s_value", "s_ts"))
        .select(col("event_id"), col("user_id"), col("s_value"),
          date_format(col("s_ts"), "yyyy-MM-dd HH:mm:ss").as("s_t"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, sum(l_quantity) AS sum_qty, count(*) AS n_rows,
        |count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem GROUP BY 1""".stripMargin,

    "s1_scan_project" ->
      """SELECT p_partkey, trim(translate(lower(p_name), '^', '''')) AS p_name_norm,
        |coalesce(p_brand, '') AS brand, p_size FROM part""".stripMargin,

    "p2_filter_in" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        |WHERE o_orderstatus IN ('O','F') AND o_orderpriority <> '1-URGENT'
        |AND o_custkey IS NOT NULL""".stripMargin,

    "j1_anti_blacklist" ->
      """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS qty FROM lineitem
        |WHERE l_partkey NOT IN (SELECT p_partkey FROM part WHERE p_size > 40)
        |GROUP BY 1""".stripMargin,

    "j2_inner_join" ->
      """SELECT s_name, sum(l_quantity) AS qty, count(*) AS n
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey GROUP BY 1""".stripMargin,

    "j3_left_coalesce" ->
      """SELECT o_orderkey, coalesce(c_mktsegment, 'UNKNOWN') AS segment
        |FROM orders LEFT JOIN (SELECT c_custkey, c_mktsegment FROM customer
        |WHERE c_acctbal > 0) c ON o_custkey = c_custkey""".stripMargin,

    "j6_full_outer_union" ->
      """SELECT DISTINCT k FROM (
        |SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
        |UNION SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING')""".stripMargin,

    "j8_semi_join" ->
      """SELECT l_returnflag, count(*) AS n FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
        |WHERE o_orderpriority = '1-URGENT') GROUP BY 1""".stripMargin,

    "u1_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin,

    "u2_except_all" ->
      """SELECT l_partkey FROM lineitem
        |EXCEPT ALL
        |SELECT p_partkey FROM part WHERE p_size > 25""".stripMargin,

    "a4_dedup_subset" ->
      """SELECT l_orderkey, l_partkey, l_linenumber FROM (
        |SELECT l_orderkey, l_partkey, l_linenumber,
        |row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_suppkey) AS rn
        |FROM lineitem) WHERE rn = 1""".stripMargin,

    "a5_collect_list" ->
      """SELECT l_suppkey AS drug,
        |string_agg(DISTINCT l_returnflag, ',' ORDER BY l_returnflag) AS events,
        |count(DISTINCT l_orderkey) AS n_reports
        |FROM lineitem GROUP BY 1""".stripMargin,

    "w_analytic_lag" ->
      """SELECT o_orderkey, o_custkey,
        |row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn,
        |lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price
        |FROM orders""".stripMargin,

    "o1_orderby" ->
      "SELECT s_suppkey, s_name, s_nationkey FROM supplier ORDER BY s_name",

    "s6_meddra_parse" ->
      """SELECT string_split(line, ',')[1] AS code,
        |string_split(line, ',')[2] AS brand,
        |lower(string_split(line, ',')[3]) AS name FROM (
        |SELECT regexp_replace(p_partkey || '$$' || p_brand || '$' || p_name || '$$$',
        |'\$+', ',', 'g') AS line FROM part)""".stripMargin,

    "explode_tokens" ->
      """SELECT token, count(*) AS n FROM (
        |SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |WHERE token <> '' GROUP BY 1""".stripMargin,

    "j9_salted_join" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, s_name
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey""".stripMargin,

    "a8_salted_agg" ->
      """SELECT l_returnflag, sum(l_quantity) AS sum_l_quantity,
        |count(*) AS n_rows FROM lineitem GROUP BY 1""".stripMargin,

    "a9_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        |  coalesce(l_linestatus, 'ALL') AS ls,
        |  sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "a10_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS st,
        |  coalesce(o_orderpriority, 'ALL') AS pri,
        |  count(*) AS n, min(o_totalprice) AS tp_min, max(o_totalprice) AS tp_max
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,

    "a11_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 6) AS p50,
        |  round(quantile_cont(l_quantity, 0.9), 6) AS p90,
        |  round(quantile_cont(l_extendedprice, 0.99), 6) AS price_p99
        |FROM lineitem GROUP BY 1""".stripMargin,

    // ts casts truncate ns→µs so both engines see Spark's precision
    "j10_asof_join" ->
      """SELECT e.event_id, e.user_id, s.value AS s_value,
        |  strftime(s.ts::TIMESTAMP, '%Y-%m-%d %H:%M:%S') AS s_t
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') e
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        |  ON e.user_id = s.user_id AND e.ts::TIMESTAMP >= s.ts::TIMESTAMP""".stripMargin,

    "j12_asof_forward" ->
      """SELECT e.event_id, e.user_id, p.value AS p_value,
        |  strftime(p.ts::TIMESTAMP, '%Y-%m-%d %H:%M:%S') AS p_t
        |FROM (SELECT * FROM events WHERE event_type = 'signup') e
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON e.user_id = p.user_id AND e.ts::TIMESTAMP <= p.ts::TIMESTAMP""".stripMargin
  )
}
