package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (1L to 200L).map(i => (i, 10L + (i % 7))).toDF("doc_id", "n_tokens")

  test("cum_tokens is the exact prefix sum in draw order; shard = first-token cut") {
    val out = Sharding.assign(docs, $"doc_id", $"n_tokens", shardTokens = 100L)
      .select("doc_id", "n_tokens", "cum_tokens", "shard")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._3)
    var run = 0L
    for ((_, t, cum, sh) <- out) {
      run += t
      assert(cum == run, "prefix sum must be gapless in draw order")
      assert(sh == (cum - t) / 100L, "shard is the integer cut of the first token")
    }
    assert(out.map(_._4).distinct.length > 1, "multiple shards produced")
  }

  test("every shard except the last reaches its token budget") {
    val out = Sharding.assign(docs, $"doc_id", $"n_tokens", shardTokens = 100L)
      .groupBy("shard").agg(sum("n_tokens").as("t"), max("cum_tokens").as("hi"))
      .orderBy("shard").as[(Long, Long, Long)].collect()
    for ((sh, t, hi) <- out.init) {
      assert(hi >= (sh + 1) * 100L, s"shard $sh ended at $hi before its boundary")
    }
  }

  test("shard_pos is 1..n within each shard, ordered by the draw") {
    val out = Sharding.assign(docs, $"doc_id", $"n_tokens", shardTokens = 100L)
      .select("shard", "shard_pos", "cum_tokens")
      .as[(Long, Long, Long)].collect()
    out.groupBy(_._1).foreach { case (sh, rows) =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.map(_._2).toSeq == (1L to rows.length).toSeq,
        s"shard $sh positions must be dense and draw-ordered")
    }
  }

  test("assignment is independent of input partitioning and order") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Sharding.assign(df, $"doc_id", $"n_tokens", shardTokens = 100L)
        .select("doc_id", "shard", "shard_pos")
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(run(docs) == run(docs.repartition(13).orderBy($"doc_id".desc)))
  }
}
