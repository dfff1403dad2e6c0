package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-shard assignment — the webdataset/LLM-shard writer's core:
  * lay the corpus out in the deterministic [[Shuffle]] draw order and
  * cut it into ~`shardTokens`-token shards, so a training job streams
  * shard files in order and sees a reproducible global example order.
  * Beyond-reference surface (SURVEY §2.13).
  *
  * A document belongs to the shard its FIRST token lands in
  * (shard = (cum − tokens) ÷ shardTokens, integer arithmetic), so
  * shards overshoot by at most one document — the standard cut rule,
  * identical on every engine.
  *
  * 100 TB shape: the global token prefix-sum never runs as one window —
  * [[Shuffle.permutation]]'s two-phase shape applied to token sums:
  * contiguous hash-range buckets from the draw's top bits, a per-bucket
  * local prefix sum in parallel, and a ≤rangeShards-row broadcast
  * offset table of bucket token totals. The final within-shard position
  * is a window partitioned by the OUTPUT shard — bounded by
  * shardTokens's worth of documents per partition. Writing is then
  * `.repartitionByRange(col("shard"), col("shard_pos"))` +
  * partitionBy("shard") — one range shuffle.
  */
object Sharding {

  /** Input columns + (shard, shard_pos, cum_tokens). `rangeShards`
    * must be a power of two (top-bits arithmetic, as in
    * [[Shuffle.permutation]]).
    */
  def assign(df: DataFrame, id: Column, tokens: Column, shardTokens: Long,
             seed: Long = 42L, rangeShards: Int = 8): DataFrame = {
    require(shardTokens >= 1, s"shardTokens must be >= 1, got $shardTokens")
    require(rangeShards >= 1 && (rangeShards & (rangeShards - 1)) == 0,
      s"rangeShards must be a power of two, got $rangeShards")
    val bits = 31 - Integer.numberOfLeadingZeros(rangeShards)
    val hx = Shuffle.orderHash(id, seed)
    val withBucket = df
      .withColumn("_hx", hx)
      .withColumn("_rb",
        shiftright(conv(substring(col("_hx"), 1, 15), 16, 10).cast("long"),
          60 - bits).cast("int"))
    val local = withBucket.withColumn("_lc",
      sum(tokens).over(Window.partitionBy(col("_rb"))
        .orderBy(col("_hx").asc, id.asc)
        .rowsBetween(Window.unboundedPreceding, 0)))
    val totals = withBucket.groupBy("_rb").agg(sum(tokens).as("_t"))
    val offsets = totals
      .withColumn("_off",
        coalesce(sum(col("_t")).over(
          Window.orderBy(col("_rb"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_rb", "_off")
    local.join(broadcast(offsets), Seq("_rb"))
      .withColumn("cum_tokens", col("_off") + col("_lc"))
      // integer division, not a double round-trip: exact at any scale
      .withColumn("_start", col("cum_tokens") - tokens)
      .withColumn("shard", expr(s"_start div ${shardTokens}L"))
      .withColumn("shard_pos", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col("_hx").asc, id.asc)).cast("long"))
      .drop("_hx", "_rb", "_lc", "_off", "_start")
  }
}
