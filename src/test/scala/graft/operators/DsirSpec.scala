package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // raw corpus: 4 docs in the target's domain vocabulary, 4 outside it
  private val raw = Seq(
    (1L, "cat kitten purr cat whiskers feline cat nap"),
    (2L, "kitten feline purr whiskers cat cat tail"),
    (3L, "purr cat feline kitten whiskers soft fur"),
    (4L, "cat cat kitten purr feline whiskers meow"),
    (5L, "stock market index futures bond yield trading"),
    (6L, "bond yield curve market trading futures index"),
    (7L, "futures trading market stock bond index price"),
    (8L, "yield price stock futures market bond curve")
  ).toDF("doc_id", "text")

  private val target = Seq(
    (100L, "cat kitten purr feline whiskers"),
    (101L, "kitten cat purr soft feline")
  ).toDF("doc_id", "text")

  test("target-domain documents outscore off-domain documents") {
    val s = Dsir.scores(raw, target, buckets = 256)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val catMin = (1L to 4L).map(s).min
    val finMax = (5L to 8L).map(s).max
    assert(catMin > finMax,
      s"every cat doc must outscore every finance doc: $s")
  }

  test("scores keep zero-feature docs with null score; resample drops them") {
    val withEmpty = raw.unionByName(Seq((9L, "   ")).toDF("doc_id", "text"))
    val s = Dsir.scores(withEmpty, target, buckets = 256)
    val empty = s.where($"doc_id" === 9L).collect()
    assert(empty.length == 1 && empty.head.getLong(1) == 0 && empty.head.isNullAt(2))
    val picked = Dsir.resample(withEmpty, target, k = 100, buckets = 256)
      .select("doc_id").as[Long].collect()
    assert(picked.length == 8 && !picked.contains(9L))
  }

  test("low temperature concentrates the sample on the high-score half") {
    val picked = Dsir.resample(raw, target, k = 4, buckets = 256,
      temperature = 0.01, seed = 1L)
      .select("doc_id").as[Long].collect().toSet
    assert(picked == Set(1L, 2L, 3L, 4L),
      s"T→0 must degenerate to hard top-k by score, got $picked")
  }

  test("resample is deterministic in (seed, corpus) and seed-sensitive") {
    val a = Dsir.resample(raw, target, k = 6, seed = 11L).collect().toSeq
    val b = Dsir.resample(raw, target, k = 6, seed = 11L).collect().toSeq
    assert(a == b)
    val keysA = a.map(_.getDouble(3)).toSet
    val keysC = Dsir.resample(raw, target, k = 6, seed = 12L)
      .collect().map(_.getDouble(3)).toSet
    assert(keysA != keysC, "different seed must draw different Gumbel noise")
  }

  test("bucket ratios rank target vocabulary above off-target vocabulary") {
    // absolute signs are prior-dominated on a micro corpus (add-one
    // smoothing adds B=256 pseudo-counts to both totals), so assert the
    // ORDER the resampler actually consumes: a target-heavy term's bucket
    // must out-rate an absent-from-target term's bucket.
    val lrByBucket = Dsir.bucketLogRatios(target, raw, buckets = 256)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def bucketOf(term: String): Long =
      raw.sparkSession.range(1)
        .select(Dsir.featureBucket(lit(term), 256)).head().getLong(0)
    assert(lrByBucket(bucketOf("purr")) > lrByBucket(bucketOf("bond")),
      s"purr (in-target) must out-rate bond (off-target): $lrByBucket")
  }
}
