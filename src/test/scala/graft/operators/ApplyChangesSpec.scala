package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ApplyChangesSpec extends SparkSpec {
  import spark.implicits._

  private def snap = Seq(
    (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")
  ).toDF("k", "v")

  private def changes = Seq(
    (2L, "b2", "upsert", 10L),  // update
    (3L, "c2", "upsert", 10L),  // update then delete — delete wins
    (3L, "c3", "delete", 11L),
    (4L, "d2", "delete", 10L),  // delete then re-insert — upsert wins
    (4L, "d3", "upsert", 11L),
    (5L, "e", "upsert", 10L)    // brand-new key
  ).toDF("k", "v", "op", "seq")

  test("apply: last-writer-wins upsert/delete merge") {
    val out = ApplyChanges(snap, changes, "k", "seq")
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "a", 2L -> "b2", 4L -> "d3", 5L -> "e"),
      s"unexpected snapshot: $out")
  }

  test("apply rejects unknown ops at the first action") {
    val bad = Seq((1L, "x", "replace", 1L)).toDF("k", "v", "op", "seq")
    val e = intercept[Exception] {
      ApplyChanges(snap, bad, "k", "seq").collect()
    }
    assert(e.getMessage != null)
  }

  test("history: validity intervals chain and exactly one current per key") {
    val log = snap.withColumn("op", lit("upsert")).withColumn("seq", lit(1L))
      .unionByName(changes)
    val h = ApplyChanges.history(log, "k", "seq").cache()
    // every key has exactly one open interval
    val open = h.where($"is_current").groupBy("k").count()
      .as[(Long, Long)].collect().toMap
    assert(open.values.forall(_ == 1L))
    // intervals chain: valid_to of version i == valid_from of version i+1
    val nexts = h.select($"k".as("k2"), $"valid_from".as("next_from"))
    val chained = h.where(!$"is_current")
      .join(nexts, $"k" === $"k2" && $"valid_to" === $"next_from")
    assert(chained.count() == h.where(!$"is_current").count())
    // current version of key 3 is the tombstone
    val cur3 = h.where($"is_current" && $"k" === 3L).select("op").as[String].head()
    assert(cur3 == "delete")
  }

  test("snapshotOf replays apply at the log head and respects as-of") {
    val log = snap.withColumn("op", lit("upsert")).withColumn("seq", lit(1L))
      .unionByName(changes)
    val head = ApplyChanges.snapshotOf(log, "k", "seq").drop("seq")
      .as[(Long, String)].collect().toMap
    val applied = ApplyChanges(snap, changes, "k", "seq")
      .as[(Long, String)].collect().toMap
    assert(head == applied, "snapshotOf(latest) must equal apply()")
    // as-of seq 10: key 3 still live (c2), key 4 deleted, key 5 present
    val asOf10 = ApplyChanges.snapshotOf(log, "k", "seq", Some(lit(10L)))
      .drop("seq").as[(Long, String)].collect().toMap
    assert(asOf10 == Map(1L -> "a", 2L -> "b2", 3L -> "c2", 5L -> "e"),
      s"unexpected as-of snapshot: $asOf10")
  }

  test("vacuum: snapshots at/after the horizon are unchanged; log shrinks") {
    val log = snap.withColumn("op", lit("upsert")).withColumn("seq", lit(1L))
      .unionByName(changes).cache()
    val vac = ApplyChanges.vacuum(log, "k", "seq", beforeSeq = 11L).cache()
    // history-sized → snapshot-sized + kept tail
    assert(vac.count() < log.count())
    for (asOf <- Seq(Some(lit(11L)), None)) {
      val a = ApplyChanges.snapshotOf(log, "k", "seq", asOf)
        .drop("seq").as[(Long, String)].collect().toMap
      val b = ApplyChanges.snapshotOf(vac, "k", "seq", asOf)
        .drop("seq").as[(Long, String)].collect().toMap
      assert(a == b, s"vacuum visible at asOf=$asOf: $a vs $b")
    }
    // a key whose last pre-horizon op was delete is GONE from the
    // compacted prefix (the tombstone did its job): key 3's seq-10
    // upsert was superseded... within the prefix seq<11, key 3's latest
    // is the c2 upsert, so it survives compaction; key 4's latest
    // pre-11 is a delete → vanishes from the prefix, reappears via the
    // kept seq-11 re-insert
    val prefixKeys = vac.where($"seq" < 11L).select("k")
      .as[Long].collect().toSet
    assert(!prefixKeys.contains(4L))
    assert(prefixKeys.contains(3L))
  }
}
