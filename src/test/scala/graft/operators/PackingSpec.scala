package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("greedy boundaries: pack closes exactly when the budget would overflow") {
    val docs = Seq((1L, 100L), (2L, 100L), (3L, 57L), (4L, 1L), (5L, 256L))
      .toDF("doc_id", "n_tokens")
    val packed = Packing.packGreedy(docs.repartitionByRange(1, $"doc_id"), 256)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // 100+100=200 fits; +57 overflows → new pack; +1 fits; 256 overflows → new
    assert(packed(1L) == packed(2L))
    assert(packed(3L) != packed(1L) && packed(3L) == packed(4L))
    assert(packed(5L) != packed(3L))
  }

  test("a document larger than the budget gets its own pack") {
    val docs = Seq((1L, 10L), (2L, 9999L), (3L, 10L)).toDF("doc_id", "n_tokens")
    val packed = Packing.packGreedy(docs.repartitionByRange(1, $"doc_id"), 100)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(Set(packed(1L), packed(2L), packed(3L)).size == 3)
  }

  test("partition-parallel: ids unique across partitions, budget respected") {
    val docs = (1L to 400L).map(i => (i, 40L + i % 7)).toDF("doc_id", "n_tokens")
    val packed = Packing.packGreedy(docs.repartition(8, $"doc_id"), 256)
    val stats = packed.groupBy("pack_id").agg(sum("n_tokens").as("t")).collect()
    assert(stats.forall(_.getLong(1) <= 256), "no pack exceeds the budget")
    assert(packed.count() == 400, "every doc packed exactly once")
    // pack ids from different partitions never collide (high-bits scheme)
    val perDoc = packed.select("doc_id", "pack_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDoc.size == 400)
  }

  test("packStats: fill rate and pack count") {
    val docs = Seq((1L, 128L), (2L, 128L), (3L, 128L)).toDF("doc_id", "n_tokens")
    val st = Packing.packStats(
      Packing.packGreedy(docs.repartitionByRange(1, $"doc_id"), 256), 256).head()
    assert(st.getLong(0) == 2)           // packs: {1,2}, {3}
    assert(st.getLong(2) == 256L)        // max tokens
  }
}
