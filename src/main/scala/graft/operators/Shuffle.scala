package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus shuffle — a reproducible pseudo-random global
  * permutation of the training corpus (beyond-reference surface, SURVEY
  * §2.13). Training-data order matters (curriculum effects, dedup-aware
  * interleaving) and must be REPRODUCIBLE: the same (corpus, seed) must
  * yield the same example order on every run, engine, and partition
  * layout, which `orderBy(rand(seed))` does not give (rand is
  * partition-layout-dependent) — so the order key is md5(seed, key),
  * engine-portable like every other hash in this library.
  *
  * The permutation is expressed as (shard, pos, global_pos):
  *  - `shard` = the top log2(shards) bits of the 60-bit hash — CONTIGUOUS
  *    ranges of the global hash order, so concatenating shards 0..S-1 in
  *    order replays the full permutation (a mod assignment would
  *    interleave them);
  *  - `pos` = rank within the shard (hash order, key tiebreak on the
  *    measure-zero chance of a 128-bit collision);
  *  - `global_pos` = shard offset + pos, a total order 1..N.
  *
  * 100 TB shape: the shard assignment is a shuffle-free projection; the
  * per-shard rank windows over corpus/shards rows — `shards` is the
  * caller's parallelism knob and should scale with the corpus (e.g. one
  * shard per output file); the offset table is `shards` rows, windowed
  * and broadcast back. Physically materializing the order is then
  * `repartitionByRange(col("shard"), col("pos"))` + sortWithinPartitions
  * — one range shuffle, uniformly balanced by construction (the hash is
  * uniform), immune to input skew and input ordering.
  */
object Shuffle {

  /** Engine-portable order hash (full md5 hex) for (seed, key). */
  def orderHash(key: Column, seed: Long): Column =
    md5(concat(lit("shuffle:"), lit(seed.toString), lit(":"),
      key.cast("string")))

  /** The permutation frame: input columns + (shard, pos, global_pos).
    *
    * @param shards number of contiguous output shards; must be a power of
    *               two ≤ 2^30 so shard = top bits of the hash is exact
    *               integer arithmetic in every engine.
    */
  def permutation(df: DataFrame, key: Column, seed: Long = 42L,
                  shards: Int = 8): DataFrame = {
    require(shards >= 1 && (shards & (shards - 1)) == 0 && shards <= (1 << 30),
      s"shards must be a power of two in [1, 2^30], got $shards")
    val bits = 31 - Integer.numberOfLeadingZeros(shards)
    val hx = orderHash(key, seed)
    val withShard = df
      .withColumn("_hx", hx)
      .withColumn("shard",
        shiftright(conv(substring(col("_hx"), 1, 15), 16, 10).cast("long"),
          60 - bits).cast("int"))
    val pos = row_number().over(
      Window.partitionBy(col("shard")).orderBy(col("_hx").asc, key.asc))
    val ranked = withShard.withColumn("pos", pos.cast("long"))
    // counts from the pre-window frame: the offset table must not force
    // the rank computation a second time
    val counts = withShard.groupBy("shard").agg(count(lit(1)).as("_n"))
    val offsets = counts
      .withColumn("_off",
        coalesce(sum(col("_n")).over(
          Window.orderBy(col("shard"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("shard", "_off")
    ranked.join(broadcast(offsets), Seq("shard"))
      .withColumn("global_pos", col("_off") + col("pos"))
      .drop("_hx", "_off")
  }

  /** Curriculum ordering — quality-staged training order with a
    * REPRODUCIBLE shuffle inside each stage: documents sort by
    * perplexity bucket (head = most-natural text first, the
    * easy-to-hard curriculum) and within a bucket by the same
    * md5(seed, key) draw [[permutation]] uses, so the order is
    * engine/partition-layout independent end to end. The key is one
    * sortable string (bucket ordinal ‖ ':' ‖ 32-hex draw): consumers
    * range-partition + sort on it ([[materialized]]'s shape) to stream
    * examples in curriculum order without any global rank.
    * Token-less docs carry no perplexity and are absent (the bucket
    * stage scores only n_tokens > 0 — route them separately if they
    * should train at all).
    *
    * Output: (doc_id, bucket, curriculum_key).
    */
  def curriculumOrder(docs: DataFrame, seed: Long = 42L,
                      textCol: String = "text",
                      exact: Boolean = true): DataFrame =
    TextAnalysis.perplexityBuckets(docs, textCol = textCol, exact = exact)
      .select(col("doc_id"), col("bucket"),
        concat(
          when(col("bucket") === "head", "0")
            .when(col("bucket") === "middle", "1")
            .when(col("bucket") === "tail", "2")
            .otherwise("3"),
          lit(":"), orderHash(col("doc_id"), seed)).as("curriculum_key"))

  /** The physically shuffled corpus: rows range-partitioned into `shards`
    * output partitions and sorted by the permutation within each — ready
    * for a partition-per-file write that streams training examples in
    * permuted order. Carries (shard, pos, global_pos) for auditability.
    */
  def materialized(df: DataFrame, key: Column, seed: Long = 42L,
                   shards: Int = 8): DataFrame =
    permutation(df, key, seed, shards)
      .repartitionByRange(shards, col("shard"), col("pos"))
      .sortWithinPartitions(col("shard"), col("pos"))
}
