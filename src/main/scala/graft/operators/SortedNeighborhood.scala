package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sorted-neighborhood dedup (Hernández & Stolfo 1995) — the third
  * candidate-generation family next to LSH banding (probabilistic) and
  * prefix filtering (exact-threshold): sort the corpus by a blocking
  * key and compare each record only to its `w−1` successors in the sort
  * order. Candidates are O(n·w) by construction — no bucket can blow up
  * the way a hot LSH band or prefix token can — at the cost of recall
  * that depends on the key sorting near-duplicates adjacently (the
  * classic trade; with the normalized text itself as the key, texts
  * that differ late in the string sort together). Beyond-reference
  * surface (SURVEY §2.13).
  *
  * Scale shape: the global sequence number is the TWO-PHASE rank shape
  * ([[Salience.vocabulary]]'s pattern — range partitions, per-shard
  * row_number, broadcast offset table), never one global window; the
  * w-neighborhood join is an EQUI-join on the block id seq div w (a
  * pair within distance < w is same-block or adjacent-block, so the
  * left side explodes to 2 block keys — bounded fanout 2), and
  * verification is candidate-bounded token-Jaccard.
  */
object SortedNeighborhood {

  /** (doc_id, _k, seq): global 0-based rank under the (key, doc_id)
    * total order. Partitioning-independent values (the order is total);
    * the spark_partition_id detour is an implementation detail of the
    * two-phase shape.
    */
  def ranked(docs: DataFrame, key: Column, shards: Int = 32): DataFrame = {
    val keyed = docs.select(col("doc_id"), key.as("_k"))
    val sharded = keyed
      .repartitionByRange(shards, col("_k").asc, col("doc_id").asc)
      .withColumn("_shard", spark_partition_id())
      .cache()
    val counts = sharded.groupBy("_shard").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.map(_._1).zip(counts.map(_._2).scanLeft(0L)(_ + _))
    val offLookup: Column =
      if (offsets.isEmpty) lit(0L)
      else element_at(
        map(offsets.flatMap { case (s, off) => Seq(lit(s), lit(off)) }: _*),
        col("_shard"))
    val w = Window.partitionBy("_shard")
      .orderBy(col("_k").asc, col("doc_id").asc)
    sharded
      .withColumn("seq", offLookup + (row_number().over(w) - 1).cast("long"))
      .select("doc_id", "_k", "seq")
  }

  /** Candidate pairs within sort distance < w: (doc_a, doc_b) with
    * doc_a the EARLIER record in the sort order.
    */
  def candidatePairs(docs: DataFrame, key: Column, w: Int,
                     shards: Int = 32): DataFrame = {
    require(w >= 2, s"window must be >= 2, got $w")
    val r = ranked(docs, key, shards).localCheckpoint()
    val a = r.select(col("doc_id").as("doc_a"), col("seq").as("seq_a"),
        explode(array(expr(s"seq div $w"), expr(s"seq div $w + 1"))).as("g"))
    val b = r.select(col("doc_id").as("doc_b"), col("seq").as("seq_b"),
      expr(s"seq div $w").as("g"))
    a.join(b, Seq("g"))
      .where(col("seq_b") - col("seq_a") >= 1 &&
        col("seq_b") - col("seq_a") < w)
      .select("doc_a", "doc_b")
  }

  /** Sorted-neighborhood near-duplicates: candidates verified by
    * word-token Jaccard ≥ tNum/tDen (integer threshold test — the
    * [[SetSimJoin]] verification contract). Output (doc_a, doc_b,
    * inter, uni, jaccard) with doc_a the earlier record in sort order.
    */
  def nearDuplicates(docs: DataFrame, key: Column, w: Int,
                     tNum: Int = 9, tDen: Int = 10,
                     textCol: String = "text",
                     shards: Int = 32): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen,
      s"threshold must be a rational in (0, 1]: $tNum/$tDen")
    val cand = candidatePairs(docs, key, w, shards)
    val tok = SetSimJoin.tokenRows(docs, textCol)
    val sz = tok.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(tok.select(col("doc_id").as("doc_a"), col("tok")), Seq("doc_a"))
      .join(tok.select(col("doc_id").as("doc_b"), col("tok")), Seq("doc_b", "tok"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sz.select(col("doc_id").as("doc_a"), col("n").as("n_a")), Seq("doc_a"))
      .join(sz.select(col("doc_id").as("doc_b"), col("n").as("n_b")), Seq("doc_b"))
      .withColumn("uni", col("n_a") + col("n_b") - col("inter"))
      .where(col("inter") * tDen >= col("uni") * tNum)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("uni"),
        round(col("inter").cast("double") / col("uni"), 6).as("jaccard"))
  }
}
