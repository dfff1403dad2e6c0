package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cleaning/flattening of raw FAERS reports into (report, drug_name,
  * reaction) rows — the reference's `prepareAdverseEventsData`
  * (/root/reference .. stage/OpenFdaEtl.scala:64-106), re-ordered for
  * scale.
  *
  * Semantics preserved; plan improved (SURVEY §7.6.4 — explode fanout is
  * the 100 TB hazard):
  *   - report-level filters (qualification, seriousness_death, ids) run
  *     BEFORE any explode, so dropped reports never fan out;
  *   - the per-drug `drugcharacterization = '1'` filter is applied inside
  *     the array (functions.filter) BEFORE the drug explode;
  *   - the reaction×drug×name triple explode therefore only sees
  *     surviving rows.
  * Both orderings produce the same row set: the filters only reference
  * report-level columns or the exploded element itself.
  */
object AdverseEvents {

  /** @param faers output of Sources.faers: (safetyreportid, serious,
    *              seriousnessdeath, receivedate, qualification, patient)
    * @return rows of (safetyreportid, serious, receivedate,
    *         seriousness_death, qualification, reaction_reactionmeddrapt,
    *         drug_medicinalproduct, drugcharacterization, drug_names,
    *         drug_name)
    */
  def clean(faers: DataFrame): DataFrame = {
    faers
      // ifnull default '0' (OpenFdaEtl.scala:75) then report-level filters
      // (:88-89 qualification, :104-106 death/id) hoisted above the explodes.
      .withColumn("seriousness_death", expr("ifnull(seriousnessdeath, '0')"))
      .where(col("qualification").isInCollection(Seq("1", "2", "3")) &&
        col("seriousness_death") === "0" && col("safetyreportid").isNotNull)
      // suspect-drug filter (:89 drugcharacterization='1') pushed inside the
      // array before exploding.
      .withColumn("drug",
        explode(filter(col("patient.drug"), d => d.getField("drugcharacterization") === "1")))
      .withColumn("reaction", explode(col("patient.reaction")))
      .selectExpr(
        "safetyreportid",
        "serious",
        "receivedate",
        "seriousness_death",
        "qualification",
        "trim(translate(lower(reaction.reactionmeddrapt), '^', '\\'')) as reaction_reactionmeddrapt",
        "ifnull(lower(drug.medicinalproduct), '') as drug_medicinalproduct",
        "ifnull(drug.openfda.generic_name, array()) as drug_generic_name_list",
        "ifnull(drug.openfda.brand_name, array()) as drug_brand_name_list",
        "ifnull(drug.openfda.substance_name, array()) as drug_substance_name_list",
        "drug.drugcharacterization as drugcharacterization"
      )
      // assemble the synonym set exactly as the reference (:91-98): brand ∪
      // {medicinalproduct} ∪ generic ∪ substance, deduped, then exploded.
      .withColumn("drug_names",
        array_distinct(concat(
          col("drug_brand_name_list"),
          array(col("drug_medicinalproduct")),
          col("drug_generic_name_list"),
          col("drug_substance_name_list"))))
      .withColumn("_drug_name", explode(col("drug_names")))
      .withColumn("drug_name", lower(col("_drug_name")))
      .drop("drug_generic_name_list", "drug_brand_name_list",
        "drug_substance_name_list", "_drug_name")
      .where(col("drug_name").isNotNull && col("reaction_reactionmeddrapt").isNotNull &&
        col("drug_name") =!= "")
  }
}
