package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Input readers (SURVEY §2.1 S1–S7).
  *
  * Unlike the reference (schema inference over the full 130 GB corpus —
  * /root/reference .. utils/Loaders.scala:38), every JSON source here
  * carries an explicit StructType: one pass over the data instead of two,
  * and the parser only materializes the fields the pipeline touches
  * (column pruning at the source).
  */
object Sources {

  /** Exactly the FAERS fields the pipeline consumes (FIXTURES.md §1). */
  val faersSchema: StructType = StructType(Seq(
    StructField("safetyreportid", StringType),
    StructField("serious", StringType),
    StructField("seriousnessdeath", StringType),
    StructField("receivedate", StringType),
    StructField("primarysource",
      StructType(Seq(StructField("qualification", StringType)))),
    StructField("patient", StructType(Seq(
      StructField("reaction", ArrayType(StructType(Seq(
        StructField("reactionmeddrapt", StringType))))),
      StructField("drug", ArrayType(StructType(Seq(
        StructField("medicinalproduct", StringType),
        StructField("drugcharacterization", StringType),
        StructField("openfda", StructType(Seq(
          StructField("generic_name", ArrayType(StringType)),
          StructField("brand_name", ArrayType(StringType)),
          StructField("substance_name", ArrayType(StringType)))))))))
    )))
  ))

  /** ChEMBL drug-index fields consumed (FIXTURES.md §2). */
  val chemblSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("synonyms", ArrayType(StringType)),
    StructField("tradeNames", ArrayType(StringType))
  ))

  /** S1: raw FAERS JSON-lines scan + top-level projection
    * (Loaders.scala:34-46 semantics).
    */
  def faers(path: String)(implicit spark: SparkSession): DataFrame =
    spark.read.schema(faersSchema).json(path).selectExpr(
      "safetyreportid",
      "serious",
      "seriousnessdeath",
      "receivedate",
      "primarysource.qualification as qualification",
      "patient")

  /** S2: ChEMBL drug index scan (Loaders.scala:10-18). */
  def chembl(path: String)(implicit spark: SparkSession): DataFrame =
    spark.read.schema(chemblSchema).json(path).selectExpr(
      "id as chembl_id",
      "synonyms as synonyms",
      "name as pref_name",
      "tradeNames as trade_names")

  /** S3: blacklist of reaction terms — tab-sep headerless CSV, trimmed,
    * lowercased, caret un-escaped to apostrophe (Loaders.scala:49-62).
    * The orderBy is reference parity (cosmetic before a broadcast anti-join).
    */
  def blacklist(path: String)(implicit spark: SparkSession): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("ignoreLeadingWhiteSpace", "true")
      .option("ignoreTrailingWhiteSpace", "true")
      .csv(path)
      .toDF("reactions")
      .withColumn("reactions", translate(trim(lower(col("reactions"))), "^", "'"))
      .orderBy(col("reactions").asc)

  /** S6: generic MedDRA `.asc` parser — `$`-separated with runs of `$`
    * collapsed (empty fields skipped) and trailing `$` stripped, then a
    * positional projection; `*name*` columns lowercased
    * (Loaders.scala:86-99). The run-collapsing is semantics, not an
    * accident — plain sep='$' parsing would keep empty fields.
    *
    * Read as raw text, not csv: the default csv reader pre-splits on
    * commas, truncating any term containing one ("Arthritis, rheumatoid");
    * splitting on `\$+` directly also removes the comma intermediate that
    * corrupted comma-bearing terms after the `$`→`,` rewrite.
    */
  def meddra(path: String, columns: Seq[String])(implicit spark: SparkSession): DataFrame = {
    val raw = spark.read.text(path)
    val parsed = raw
      .withColumn("_parts", split(regexp_replace(col("value"), "\\$+$", ""), "\\$+"))
      .select(columns.zipWithIndex.map { case (c, i) => col("_parts").getItem(i).as(c) }: _*)
    columns.filter(_.contains("name"))
      .foldLeft(parsed)((df, c) => df.withColumn(c, lower(col(c))))
  }

  /** S4: MedDRA preferred terms (Loaders.scala:64-68). */
  def meddraPreferredTerms(release: String)(implicit spark: SparkSession): DataFrame =
    meddra(release.stripSuffix("/") + "/MedAscii/pt.asc", Seq("pt_code", "pt_name"))

  /** S5: MedDRA low-level terms (Loaders.scala:70-74). */
  def meddraLowLevelTerms(release: String)(implicit spark: SparkSession): DataFrame =
    meddra(release.stripSuffix("/") + "/MedAscii/llt.asc", Seq("llt_code", "llt_name"))

  /** Binary-file ingestion (beyond-reference): Spark's `binaryFile`
    * source reads each file as one row (path, modificationTime, length,
    * content) — the entry point for raw media crawl output (images,
    * audio) feeding [[graft.operators.Multimodal]]'s decoders. The
    * source is splittable only per-file, so at 100 TB the file layout
    * IS the parallelism — millions of small objects list-partition
    * fine; a tarball does not (unpack to WARC or per-file objects
    * upstream). pathGlobFilter prunes at listing time, before any
    * bytes are read.
    */
  def binaryFiles(dir: String, glob: String)(implicit spark: SparkSession): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
}
