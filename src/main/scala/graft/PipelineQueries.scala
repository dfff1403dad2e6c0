package graft

import graft.operators.{Contingency, Meddra, MonteCarlo, Stratified}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FAERS-pipeline operators exercised over the synthetic star schema:
  * the (report, drug, event) analog is (l_orderkey, s_name, p_brand) —
  * a supplier "causes" a brand "reaction" within an order "report".
  * Exact distinct counts make the contingency/LLR stage DuckDB-checkable;
  * the Monte-Carlo stage is RNG-based and therefore rows-only.
  */
object PipelineQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Per-process scratch dir for source round-trip gates: keyed by the
    * SparkSession's applicationId so two concurrent bench/verify runs on
    * one host never race on the same path (mode overwrite would corrupt
    * whichever run reads second). Best-effort deleted on JVM exit.
    */
  private[graft] def scratchDir(s: SparkSession, kind: String, dir: String): String = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_${s.sparkContext.applicationId}"
    registerCleanup(root)
    s"$root/$kind/" + dir.replaceAll("[^A-Za-z0-9.]", "_")
  }

  private val cleanupRegistered = new java.util.concurrent.atomic.AtomicBoolean(false)
  private def registerCleanup(root: String): Unit =
    if (cleanupRegistered.compareAndSet(false, true)) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(): Unit
        }
        rm(new java.io.File(root))
      }))
    }

  /** The event-rows analog frame, named per the pipeline's contract. */
  private def analogEvents(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val sup = Tables.supplier(s, dir)
    val part = Tables.part(s, dir)
    li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(part), li("l_partkey") === part("p_partkey"))
      // rid stays LONG: the real pipeline's FAERS ids are strings, but the
      // analog's counts are type-agnostic and long keys halve the
      // distinct/shuffle bytes of every contingency pass
      .select(col("l_orderkey").as("safetyreportid"),
        col("s_name").as("chembl_id"),
        col("p_brand").as("reaction_reactionmeddrapt"))
  }

  val queries: Map[String, Q] = Map(
    // A1-A3 + LLR (exact mode): the contingency spine, oracle-checked.
    // The event frame feeds four aggregation passes (pairs, two marginals,
    // total) → cache it, as the reference persists its stage-1 frame.
    "llr_pairs" -> ((s, dir) => {
      val ev = analogEvents(s, dir).cache()
      // eager fill: the four aggregation passes otherwise race each other
      // computing the unfilled cache's subtree inside one action
      ev.count()
      Contingency.pairStatistics(ev, exact = true)
        .select(col("chembl_id").as("drug"),
          col("reaction_reactionmeddrapt").as("event"),
          col("A"), col("B"), col("C"), col("D"),
          round(col("llr"), 6).as("llr"))
    }),

    // A1+A2+A3 via the reference's actual physical strategy (OpenFdaEtl
    // .scala:113-160): three whole-partition windows attach the marginals
    // to every report-grain row, eager driver-literal total, full-row
    // distinct to pair grain. Exact windowed counts (collect_set size)
    // stand in for HLL++ so the result is oracle-hashable; must equal
    // llr_pairs exactly (same statistic, different plan).
    //
    // SLOWEST QUERY IN THE SUITE BY DESIGN (~3.3× llr_pairs): this is the
    // opt-in FdaConfig.compat = true plan, benchmarked to pin reference
    // parity — NOT the default. Pipeline.pairGrain and the llr_pairs gate
    // above use Contingency.pairStatistics, the scale path; a config test
    // pins compat = false as the default contract.
    "llr_pairs_windowed" -> ((s, dir) => {
      Contingency.prepareForMonteCarloFromWindowed(
        Contingency.summaryStatisticsWindowed(analogEvents(s, dir), exact = true))
        .select(col("chembl_id").as("drug"),
          col("reaction_reactionmeddrapt").as("event"),
          col("A"), col("B"), col("C"), col("D"),
          round(col("llr"), 6).as("llr"))
    }),

    // Full significance pipeline incl. seeded Monte-Carlo (A5/UDF/J5/P5/P8).
    // Emits ALL pairs with critval + flag (not just significant ones) so the
    // smoke check always sees rows; RNG → no SQL oracle (rows-only).
    "significant_pairs" -> ((s, dir) => {
      val ev = analogEvents(s, dir).cache()
      ev.count()
      val pairs = Meddra.withEmptyCode(
        Contingency.pairStatistics(ev, exact = true))
        .cache()
      // sequential cache fills (events → pairs → consumers): a single lazy
      // action over the twice-referenced unfilled caches evaluates the
      // whole contingency subtree once per referencing branch — measured
      // 2.3× the sequential cost at sf0.1. The reference pipeline has the
      // same eager barrier (its driver-literal distinct count).
      pairs.count()
      val crit = MonteCarlo.criticalValues(pairs, percentile = 0.95,
        permutations = 50, seed = Some(42L))
      pairs.join(crit, Seq("chembl_id"), "inner")
        .select(col("chembl_id").as("drug"),
          col("reaction_reactionmeddrapt").as("event"),
          col("A").as("count"), round(col("llr"), 6).as("llr"),
          round(col("critVal_drug"), 6).as("critval"),
          (col("llr") > col("critVal_drug") && col("critVal_drug") > 0)
            .as("significant"))
    }),

    // S1/S2 JSON read path under the oracle: the parquet-backed gates never
    // exercise the explicit-schema JSON reader, so derive a JSON-lines copy
    // of supplier (nested struct, like the FAERS patient payload), read it
    // back through spark.read.schema(..).json(..) with nested-field
    // extraction, and hash-compare against the parquet original.
    "s2_json_source" -> ((s, dir) => {
      val jsonDir = scratchDir(s, "json_src", dir) + "/supplier"
      Tables.supplier(s, dir)
        .select(col("s_suppkey"),
          struct(col("s_name"), col("s_nationkey")).as("info"),
          col("s_acctbal"))
        .write.mode("overwrite").json(jsonDir)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("s_suppkey",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("info",
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("s_name",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("s_nationkey",
              org.apache.spark.sql.types.LongType)))),
        org.apache.spark.sql.types.StructField("s_acctbal",
          org.apache.spark.sql.types.DoubleType)))
      s.read.schema(schema).json(jsonDir).selectExpr(
        "s_suppkey as suppkey",
        "info.s_name as name",
        "info.s_nationkey as nationkey",
        "s_acctbal as acctbal")
    }),

    // ORC source round-trip: columnar-format coverage beyond parquet —
    // write a supplier projection as ORC, read it back through an
    // explicit schema (predicate/column pushdown applies as with
    // parquet), gate against the parquet-derived oracle.
    "s3_orc_source" -> ((s, dir) => {
      val orcDir = scratchDir(s, "orc_src", dir) + "/supplier"
      Tables.supplier(s, dir)
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal"))
        .write.mode("overwrite").orc(orcDir)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("s_suppkey",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("s_name",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("s_nationkey",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("s_acctbal",
          org.apache.spark.sql.types.DoubleType)))
      s.read.schema(schema).orc(orcDir)
        .where(col("s_acctbal") > 0)
        .selectExpr("s_suppkey as suppkey", "s_name as name",
          "s_nationkey as nationkey", "s_acctbal as acctbal")
    }),

    // Hive-style partitioned layout: write documents partitioned by lang,
    // read back one partition — the predicate must prune at the DIRECTORY
    // level (PartitionFilters, plan-asserted), which is the layout a
    // 100 TB corpus ships in (partition by source/date/lang so a
    // one-language job reads one subtree, not the whole corpus).
    "s4_partitioned_source" -> ((s, dir) => {
      val partDir = scratchDir(s, "part_src", dir) + "/documents"
      Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("n_chars"), col("lang"))
        .write.mode("overwrite").partitionBy("lang").parquet(partDir)
      s.read.parquet(partDir)
        .where(col("lang") === "en")
        .select("doc_id", "source", "n_chars", "lang")
    }),

    // Malformed-record-tolerant JSON ingestion: stage a JSONL file where
    // every 7th record is truncated mid-object, read it PERMISSIVE with
    // an explicit schema + corrupt-record column (the 100 TB ingest
    // contract: bad upstream bytes must land in a quarantine column, not
    // kill the job or silently vanish). The staged bytes derive
    // deterministically from documents, so the oracle recomputes the
    // expected parse results without reading the file; the DROPMALFORMED
    // twin count is require-pinned in-gate.
    "s9_corrupt_json" -> ((s, dir) => {
      val stage = scratchDir(s, "corrupt_src", dir) + "/data"
      val id = col("doc_id").cast("string")
      Tables.documents(s, dir).select(
        when(col("doc_id") % 7 === 0,
          concat(lit("{\"id\": "), id, lit(", \"v\":")))
        .otherwise(concat(lit("{\"id\": "), id, lit(", \"v\": "),
          col("n_chars").cast("string"), lit("}"))).as("value"))
        .write.mode("overwrite").text(stage)
      import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
      val schema = StructType(Seq(
        StructField("id", LongType),
        StructField("v", LongType),
        StructField("corrupt", StringType)))
      val parsed = s.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "corrupt")
        .json(stage)
      val dropSchema = StructType(schema.fields.take(2))
      val nKept = s.read.schema(dropSchema)
        .option("mode", "DROPMALFORMED").json(stage).count()
      val nDocs = Tables.documents(s, dir).count()
      val nBad = Tables.documents(s, dir)
        .where(col("doc_id") % 7 === 0).count()
      require(nKept == nDocs - nBad,
        s"DROPMALFORMED kept $nKept of $nDocs, expected ${nDocs - nBad}")
      parsed
    }),

    // Schema evolution on read: two parquet batches with DIFFERENT
    // column sets under one root (the columns-added-over-time layout
    // every long-lived 100 TB dataset grows into), read back with
    // mergeSchema — the union schema with nulls where a batch lacks a
    // column, plus the Hive partition column. The staged bytes derive
    // from documents, so the oracle recomputes the merged result.
    "s10_schema_merge" -> ((s, dir) => {
      val root = scratchDir(s, "merge_src", dir) + "/docs"
      val d = Tables.documents(s, dir)
      d.where(col("doc_id") % 2 === 0).select("doc_id", "n_chars")
        .write.mode("overwrite").parquet(root + "/batch=a")
      d.where(col("doc_id") % 2 === 1).select("doc_id", "lang", "source")
        .write.mode("overwrite").parquet(root + "/batch=b")
      s.read.option("mergeSchema", "true").parquet(root)
        .select("doc_id", "n_chars", "lang", "source", "batch")
    }),

    // Manifest-commit round trip: two committed batches + a PLANTED
    // ORPHAN parquet file in the table directory (the debris a crashed
    // write leaves). readCommitted must return exactly the two batches
    // — the orphan is invisible because readers enumerate the manifest,
    // never the directory. The oracle recomputes the committed rows.
    "s11_manifest_source" -> ((s, dir) => {
      val table = scratchDir(s, "manifest_src", dir) + "/docs"
      // idempotent under bench re-runs: each invocation starts a fresh
      // table (commits append by design — re-running the gate must not)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete(): Unit
      }
      rm(new java.io.File(table))
      val d = Tables.documents(s, dir).select("doc_id", "lang", "n_chars")
      graft.sinks.Sinks.commitParquet(d.where(col("doc_id") % 2 === 0), table)
      graft.sinks.Sinks.commitParquet(d.where(col("doc_id") % 2 === 1), table)
      // orphan: a valid parquet file that was never committed
      val orphanTmp = scratchDir(s, "manifest_orphan", dir)
      d.limit(7).withColumn("doc_id", col("doc_id") + lit(9000000L))
        .coalesce(1).write.mode("overwrite").parquet(orphanTmp)
      val part = new java.io.File(orphanTmp).listFiles()
        .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
        .getOrElse(sys.error("no orphan part written"))
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(table, "orphan-crashed-write.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      graft.sinks.Sinks.readCommitted(s, table)
    }),

    // Stratified sampling (J6-J8, P10 analog): seeded Bernoulli sample →
    // rows-only (sampling is engine-RNG-specific, not SQL-expressible).
    "stratified_sample" -> ((s, dir) => {
      implicit val spark: SparkSession = s
      val ev = analogEvents(s, dir).cache()
      // "significant" stand-in: drugs with ≥5 distinct reports (the MC
      // output in the real pipeline) — one aggregation pass, not the full
      // contingency stats, which sampling doesn't need.
      val significant = ev.groupBy("chembl_id")
        .agg(count_distinct(col("safetyreportid")).as("n"))
        .where(col("n") >= 5).select("chembl_id")
      val raw = Tables.orders(s, dir)
        .withColumn("safetyreportid", col("o_orderkey"))
      Stratified.sample(ev, significant, raw, sampleSize = 0.3, seed = Some(42L))
    })
  )

  private val llrOracle: String =
      """WITH ev AS (
        |  SELECT l_orderkey AS rid, s_name AS drug, p_brand AS event
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN part ON l_partkey = p_partkey),
        |pairs AS (SELECT drug, event, count(DISTINCT rid) AS a FROM ev GROUP BY 1, 2),
        |bydrug AS (SELECT drug, count(DISTINCT rid) AS nd FROM ev GROUP BY 1),
        |byevent AS (SELECT event, count(DISTINCT rid) AS ne FROM ev GROUP BY 1),
        |tot AS (SELECT count(DISTINCT rid) AS n FROM ev),
        |cont AS (
        |  SELECT drug, event, a AS "A", ne - a AS "B", nd - a AS "C",
        |         n - nd - ne + a AS "D"
        |  FROM pairs JOIN bydrug USING (drug) JOIN byevent USING (event) CROSS JOIN tot),
        |llr AS (
        |  SELECT *,
        |    "A" * ((CASE WHEN "A" > 0 THEN ln("A") END) - (CASE WHEN "A" + "B" > 0 THEN ln("A" + "B") END)) AS aterm,
        |    "C" * ((CASE WHEN "C" > 0 THEN ln("C") END) - (CASE WHEN "C" + "D" > 0 THEN ln("C" + "D") END)) AS cterm,
        |    ("A" + "C") * ((CASE WHEN "A" + "C" > 0 THEN ln("A" + "C") END) - (CASE WHEN "A" + "B" + "C" + "D" > 0 THEN ln("A" + "B" + "C" + "D") END)) AS acterm
        |  FROM cont)
        |SELECT drug, event, "A", "B", "C", "D",
        |       round(aterm + cterm - acterm, 6) AS llr
        |FROM llr
        |WHERE aterm + cterm - acterm IS NOT NULL
        |  AND NOT isnan(aterm + cterm - acterm)""".stripMargin

  val oracles: Map[String, String] = Map(
    "llr_pairs" -> llrOracle,
    // same statistic, exact counts on both plans → same oracle
    "llr_pairs_windowed" -> llrOracle,
    // the JSON round-trip must reproduce the parquet rows exactly
    "s2_json_source" ->
      """SELECT s_suppkey AS suppkey, s_name AS name, s_nationkey AS nationkey,
        |       s_acctbal AS acctbal
        |FROM supplier""".stripMargin,

    "s3_orc_source" ->
      """SELECT s_suppkey AS suppkey, s_name AS name, s_nationkey AS nationkey,
        |       s_acctbal AS acctbal
        |FROM supplier WHERE s_acctbal > 0""".stripMargin,

    "s4_partitioned_source" ->
      """SELECT doc_id, source, n_chars, lang
        |FROM documents WHERE lang = 'en'""".stripMargin,

    // the staged bytes derive from documents, so the expected PERMISSIVE
    // parse (nulls + quarantined raw line for every 7th record) is
    // recomputable without reading the staged file
    "s9_corrupt_json" ->
      """SELECT
        |  CASE WHEN doc_id % 7 = 0 THEN NULL ELSE doc_id END AS id,
        |  CASE WHEN doc_id % 7 = 0 THEN NULL ELSE n_chars END AS v,
        |  CASE WHEN doc_id % 7 = 0 THEN '{"id": ' || doc_id || ', "v":' END AS corrupt
        |FROM documents""".stripMargin,

    // committed batches only — the planted orphan must be invisible
    "s11_manifest_source" ->
      """SELECT doc_id, lang, n_chars FROM documents""".stripMargin,

    // the merged read = union schema with nulls + partition column
    "s10_schema_merge" ->
      """SELECT doc_id, n_chars, NULL AS lang, NULL AS source, 'a' AS batch
        |FROM documents WHERE doc_id % 2 = 0
        |UNION ALL
        |SELECT doc_id, NULL, lang, source, 'b'
        |FROM documents WHERE doc_id % 2 = 1""".stripMargin
  )
}
