package graft.operators

import graft.SparkSpec
import graft.sources.Sources
import org.apache.spark.sql.functions._

class AdverseEventsSpec extends SparkSpec {
  implicit lazy val ss: org.apache.spark.sql.SparkSession = spark

  lazy val clean = AdverseEvents.clean(Sources.faers(resource("faers_sample.jsonl"))).cache()

  test("report-level drops: death=1, qualification 4/null never survive") {
    val ids = clean.select("safetyreportid").distinct().collect().map(_.getString(0)).toSet
    // the five edge reports engineered to be dropped (gen_fixtures.py)
    assert(!ids.contains("1081")) // seriousnessdeath=1
    assert(!ids.contains("1082")) // qualification=4
    assert(!ids.contains("1083")) // qualification null
    assert(!ids.contains("1084")) // drugcharacterization=2
    assert(!ids.contains("1088")) // only empty drug name
  }

  test("caret apostrophes are un-escaped in reactions but kept in drug names") {
    val reactions = clean.select("reaction_reactionmeddrapt").distinct()
      .collect().map(_.getString(0)).toSet
    assert(reactions.contains("crohn's disease"))
    assert(!reactions.exists(_.contains("^")))
  }

  test("reaction terms are trimmed and lowercased") {
    val reactions = clean.select("reaction_reactionmeddrapt").distinct()
      .collect().map(_.getString(0)).toSet
    assert(reactions.contains("fatigue"))
    assert(!reactions.exists(r => r != r.trim || r != r.toLowerCase))
  }

  test("drug_names deduped across the four name sources (array_distinct)") {
    val zeta = clean.where(col("drug_medicinalproduct") === "zetaquil")
      .select("drug_names").head().getSeq[String](0)
    assert(zeta.toSet == Set("ZetaBrand", "zetaquil", "zetaquiline"))
    assert(zeta.size == 3) // the generic/substance duplicate collapsed
  }

  test("no null/empty drug names or null reactions survive") {
    assert(clean.where(col("drug_name").isNull || col("drug_name") === "" ||
      col("reaction_reactionmeddrapt").isNull).count() == 0)
  }

  test("explode fanout: reports with 2 drugs × k reactions × m names fan out fully") {
    // report 1000 has drugs Deltazol(1 name) + Aspirinol(4 names incl. lower dupe) and 1 reaction
    val r1000 = clean.where(col("safetyreportid") === "1000")
    // aspirinol: brand AspiBrand + medicinal aspirinol + generic aspirinol + substance "ASPIRINOL ACID"
    //   → array_distinct(["AspiBrand","aspirinol","aspirinol","ASPIRINOL ACID"]) = 3 names
    // deltazol: 1 name
    assert(r1000.count() == 4)
  }
}
