package graft.sources

import graft.SparkSpec

class SourcesSpec extends SparkSpec {
  implicit lazy val ss: org.apache.spark.sql.SparkSession = spark

  test("blacklist: trimmed, lowercased, caret → apostrophe") {
    val bl = Sources.blacklist(resource("blacklist.txt")).collect().map(_.getString(0))
    assert(bl.toSet == Set(
      "drug ineffective", "adverse drug reaction", "drug interaction",
      "patient's condition aggravated"))
  }

  test("meddra pt: $$ runs collapse, trailing $ stripped, names lowercased") {
    val pt = Sources.meddraPreferredTerms(resource("meddra") + "/")
    assert(pt.columns.toSeq == Seq("pt_code", "pt_name"))
    val rows = pt.collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(rows("10019211") == "headache")
    assert(rows("10011401") == "crohn^s disease") // parser does NOT un-escape carets
    assert(rows.size == 7)
  }

  test("meddra llt: same parser, llt columns") {
    val llt = Sources.meddraLowLevelTerms(resource("meddra") + "/")
    assert(llt.columns.toSeq == Seq("llt_code", "llt_name"))
    assert(llt.count() == 4)
  }

  test("faers: explicit schema projects exactly the consumed fields") {
    val fda = Sources.faers(resource("faers_sample.jsonl"))
    assert(fda.columns.toSeq == Seq("safetyreportid", "serious",
      "seriousnessdeath", "receivedate", "qualification", "patient"))
    assert(fda.count() == 118)
  }

  test("chembl: renamed projection") {
    val c = Sources.chembl(resource("drug_dict.jsonl"))
    assert(c.columns.toSeq == Seq("chembl_id", "synonyms", "pref_name", "trade_names"))
    assert(c.count() == 7)
  }

  test("faers: malformed lines null out, never kill the scan (PERMISSIVE)") {
    // the 100 TB contract: one corrupt line in a multi-TB crawl must not
    // fail the job — Spark's default PERMISSIVE mode nulls the row's
    // fields; downstream null filters (P3) then drop it naturally
    val dir = java.nio.file.Files.createTempDirectory("graft-badjson")
    val good = """{"safetyreportid":"r1","serious":"1","receivedate":"20200101","primarysource":{"qualification":"1"}}"""
    java.nio.file.Files.writeString(dir.resolve("mixed.jsonl"),
      good + "\n{not json at all\n" + good.replace("r1", "r2") + "\n")
    val fda = Sources.faers(dir.toString + "/mixed.jsonl")
    val rows = fda.collect()
    assert(rows.length == 3, "PERMISSIVE keeps the malformed row (nulled)")
    val ids = rows.map(r => Option(r.getString(0)))
    assert(ids.count(_.isDefined) == 2 && ids.contains(None))
  }

  test("binaryFiles: glob prunes at listing, bytes round-trip, ids parse") {
    val dir = java.nio.file.Files.createTempDirectory("graft-binsrc")
    java.nio.file.Files.write(dir.resolve("7.ppm"), Array[Byte](1, 2, 3))
    java.nio.file.Files.write(dir.resolve("9.ppm"), Array[Byte](4, 5))
    java.nio.file.Files.write(dir.resolve("9.wav"), Array[Byte](9))
    val read = graft.operators.Multimodal.fromBinaryFiles(
      Sources.binaryFiles(dir.toString, "*.ppm"), "ppm")
    val rows = read.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(rows.keySet === Set(7L, 9L), "glob must exclude the .wav")
    assert(rows(7L) === Seq[Byte](1, 2, 3) && rows(9L) === Seq[Byte](4, 5))
  }
}
