package graft.operators

import graft.SparkSpec
import graft.sources.Sources

class DrugDictionarySpec extends SparkSpec {
  implicit lazy val ss: org.apache.spark.sql.SparkSession = spark

  lazy val dict = DrugDictionary.fromChembl(Sources.chembl(resource("drug_dict.jsonl")))

  test("schema is exactly (chembl_id, drug_name) — reference OpenFdaEtlTest:29-34") {
    assert(dict.columns.toSeq == Seq("chembl_id", "drug_name"))
  }

  test("names are lowercased union of tradeNames ∪ name ∪ synonyms, distinct") {
    val byId = dict.collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getString(1)).toSet).toMap
    assert(byId("CHEMBL0001") == Set("aspibrand", "aspirinol", "aspirinol acid"))
    assert(byId("CHEMBL0006") == Set("zetabrand", "zetaquiline", "zetaquil"))
    // reference parity: null synonyms → flatten null → record contributes nothing
    assert(!byId.contains("CHEMBL0007"))
  }
}
