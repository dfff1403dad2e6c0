package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShuffleSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 300L).map(i => (i, s"doc $i")).toDF("doc_id", "text")

  test("permutation is a bijection onto 1..N with contiguous shards") {
    val p = Shuffle.permutation(docs, $"doc_id", seed = 1L, shards = 4)
      .select($"shard", $"global_pos").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(p.map(_._2).sorted.toSeq == (1L to 300L),
      "global_pos must be a permutation of 1..N")
    val ranges = p.groupBy(_._1).view.mapValues(v =>
      (v.map(_._2).min, v.map(_._2).max)).toMap
    for (s <- ranges.keys.toSeq.sorted.init) {
      assert(ranges(s)._2 < ranges(s + 1)._1,
        s"shard $s range ${ranges(s)} must precede shard ${s + 1} ${ranges(s + 1)}")
    }
  }

  test("order is independent of input partitioning and input order") {
    val a = Shuffle.permutation(docs, $"doc_id", 7L, 8)
      .select("doc_id", "global_pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Shuffle.permutation(docs.repartition(13).orderBy($"doc_id".desc),
        $"doc_id", 7L, 8)
      .select("doc_id", "global_pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "permutation must depend only on (corpus, seed)")
  }

  test("different seeds permute differently; same seed replays") {
    def perm(seed: Long) = Shuffle.permutation(docs, $"doc_id", seed, 8)
      .orderBy("global_pos").select("doc_id").as[Long].collect().toSeq
    assert(perm(1L) == perm(1L))
    assert(perm(1L) != perm(2L))
  }

  test("materialized: shards partitions, each sorted by the permutation") {
    val m = Shuffle.materialized(docs, $"doc_id", 5L, 4)
    assert(m.rdd.getNumPartitions == 4)
    val perPart = m.select($"global_pos").rdd
      .mapPartitions(it => Iterator(it.map(_.getLong(0)).toSeq)).collect()
    perPart.foreach { xs =>
      assert(xs == xs.sorted, "rows inside a partition must be in permuted order")
    }
    // partition boundaries respect the global order
    val bounds = perPart.filter(_.nonEmpty).map(xs => (xs.head, xs.last)).sortBy(_._1)
    for (Seq((_, hi), (lo, _)) <- bounds.sliding(2).map(_.toSeq).toSeq
         if bounds.length > 1) {
      assert(hi < lo, "partitions must hold disjoint contiguous ranges")
    }
  }

  test("shard balance: uniform hash keeps shard sizes within 3x of each other") {
    val sizes = Shuffle.permutation(docs, $"doc_id", 3L, 4)
      .groupBy("shard").count().as[(Int, Long)].collect().map(_._2)
    assert(sizes.length == 4 && sizes.max <= 3 * sizes.min,
      s"300 uniform draws over 4 shards should be roughly even: ${sizes.toSeq}")
  }

  test("curriculumOrder: buckets stage the order, the draw shuffles within") {
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val out = Shuffle.curriculumOrder(real, seed = 5L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out.nonEmpty)
    // the sortable key puts every head doc before every middle before
    // every tail — string order IS curriculum order
    val sorted = out.sortBy(_._3).map(_._2)
    val firstMiddle = sorted.indexOf("middle")
    val firstTail = sorted.indexOf("tail")
    assert(sorted.lastIndexOf("head") < firstMiddle,
      "every head doc must precede every middle doc")
    assert(sorted.lastIndexOf("middle") < firstTail)
    // within a bucket the order is the seed's permutation — a different
    // seed reorders inside buckets but never across them
    val other = Shuffle.curriculumOrder(real, seed = 6L)
      .collect().map(r => (r.getLong(0), r.getString(2))).sortBy(_._2).map(_._1)
    val ours = out.sortBy(_._3).map(_._1)
    assert(other.toSeq != ours.toSeq, "different seeds must reorder")
    assert(other.toSet == ours.toSet)
  }
}
