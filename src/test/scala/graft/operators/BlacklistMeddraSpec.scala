package graft.operators

import graft.SparkSpec
import graft.sources.Sources
import org.apache.spark.sql.functions._

class BlacklistMeddraSpec extends SparkSpec {

  import spark.implicits._

  test("anti-join removes exactly the blacklisted reactions (inverse property, reference OpenFdaEtlTest:47-55)") {
    implicit val ss: org.apache.spark.sql.SparkSession = spark
    val events = Seq(
      ("r1", "drug ineffective"), ("r2", "headache"),
      ("r3", "drug interaction"), ("r4", "nausea"), ("r5", "headache")
    ).toDF("safetyreportid", "reaction_reactionmeddrapt")
    val bl = Sources.blacklist(resource("blacklist.txt"))
    val kept = Blacklist.filter(events, bl)
    assert(kept.select("reaction_reactionmeddrapt").collect().map(_.getString(0)).toSet ==
      Set("headache", "nausea"))
    // inverse: re-semi-joining the kept rows against the blacklist is empty
    assert(kept.join(bl, kept("reaction_reactionmeddrapt") === bl("reactions"), "left_semi")
      .count() == 0)
  }

  test("meddra annotate: pt preferred over llt, deterministic smallest-code pick") {
    implicit val ss: org.apache.spark.sql.SparkSession = spark
    val pairs = Seq(
      ("D1", "headache", 5.0), // in pt (10019211) AND llt (2 codes) → pt wins
      ("D1", "fatigue", 4.0),  // llt only → 10016254
      ("D1", "unknownterm", 3.0) // no match → null code
    ).toDF("chembl_id", "reaction_reactionmeddrapt", "llr")
    val pt = Sources.meddraPreferredTerms(resource("meddra") + "/")
    val llt = Sources.meddraLowLevelTerms(resource("meddra") + "/")
    val out = Meddra.annotate(pairs, pt, llt, deterministic = true)
    val codes = out.collect()
      .map(r => r.getString(1) -> r.getString(3)).toMap
    assert(codes("headache") == "10019211")
    assert(codes("fatigue") == "10016254")
    assert(codes("unknownterm") == null)
    // fanout deduped: one row per pair
    assert(out.count() == 3)
  }

  test("withEmptyCode adds the literal fallback column") {
    val pairs = Seq(("D1", "headache")).toDF("chembl_id", "reaction_reactionmeddrapt")
    val out = Meddra.withEmptyCode(pairs)
    assert(out.select("meddraCode").head().getString(0) == "")
  }
}
