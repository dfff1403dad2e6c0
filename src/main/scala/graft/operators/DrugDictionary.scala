package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ChEMBL synonym dictionary: (chembl_id, drug_name) distinct, lowercased,
  * from tradeNames ∪ {name} ∪ synonyms — the reference's
  * `loadChemblDrugList` tail (/root/reference .. utils/Loaders.scala:19-25)
  * plus `generateDrugList`'s cosmetic orderBy (OpenFdaEtl.scala:162-165).
  *
  * Parity note: like the reference, a record whose tradeNames or synonyms
  * array is NULL yields no rows at all (flatten of a null element is null,
  * explode drops it) — callers should coalesce to empty arrays upstream if
  * they want name-only records kept.
  */
object DrugDictionary {

  def fromChembl(chembl: DataFrame): DataFrame =
    chembl
      .withColumn("drug_names",
        array_distinct(flatten(array(
          col("trade_names"), array(col("pref_name")), col("synonyms")))))
      .withColumn("_drug_name", explode(col("drug_names")))
      .withColumn("drug_name", lower(col("_drug_name")))
      .select("chembl_id", "drug_name")
      .distinct()
      .orderBy(col("drug_name"))
}
