package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline, Börzsönyi et al. 2001): the rows not
  * dominated on two maximize-both metrics — the data-selection shape
  * "show me the candidates where you can't improve one axis without
  * giving up the other" (quality vs length, score vs recency, relevance
  * vs cost). Beyond-reference surface (SURVEY §2.13).
  *
  * Dominance (maximize x and y): a row is dominated iff some other row
  * is ≥ on both axes and strictly > on at least one. Exact-duplicate
  * (x, y) pairs are both on the frontier. For integer metrics the whole
  * decision is exact arithmetic, so the NOT EXISTS oracle replays it.
  *
  * Scale shape — the skyline reduces to a CENSUS problem: a row is on
  * the frontier iff y == M(x) and M(x) > P(x), where M(x) = max y at
  * this exact x and P(x) = max y over all strictly larger x. So:
  * (1) one partial-agg shuffle to the x-grain census (bounded by
  * |distinct x| — token counts, price cents, days — ≪ rows);
  * (2) the suffix-max P over the census, TWO-PHASE like
  * [[Salience.vocabulary]]'s rank (never a single-partition window):
  * range-partition the census into contiguous (x desc) slices, take the
  * per-shard running suffix max in parallel, and fold in each shard's
  * carry-in — the max of all earlier shards' maxima — from a
  * driver-collected ≤shards-row table (x is unique after the census
  * groupBy, so slices have no boundary ties);
  * (3) one broadcast join of the (x, M, P) verdict table back to the
  * corpus — shuffle-free on the big side. Never the O(n²) self-join.
  */
object Skyline {

  /** Frontier rows: (id, x, y) for every non-dominated row, both
    * metrics maximized. x and y must be integer-valued (cents, days,
    * counts — cast upstream) for cross-engine determinism; y values of
    * Long.MinValue are reserved as the carry-in floor.
    */
  def frontier2(df: DataFrame, id: Column, x: Column, y: Column,
                shards: Int = 32): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val base = df.select(id.as("id"), x.cast("long").as("x"),
      y.cast("long").as("y"))
    val census = base.groupBy("x").agg(max("y").as("_m"))
    // contiguous (x desc) slices; cached so the carry pass and the
    // window pass see the same sampled range bounds
    val sharded = census.repartitionByRange(shards, col("x").desc)
      .withColumn("_shard", spark_partition_id())
      .cache()
    val shardMax = sharded.groupBy("_shard").agg(max(col("_m")).as("mx"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val carries = shardMax.map(_._1)
      .zip(shardMax.map(_._2).scanLeft(Long.MinValue)(math.max))
    val carryLookup: Column =
      if (carries.isEmpty) lit(Long.MinValue)
      else element_at(
        map(carries.flatMap { case (s, c) => Seq(lit(s), lit(c)) }: _*),
        col("_shard"))
    val w = Window.partitionBy("_shard").orderBy(col("x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val verdict = sharded
      .withColumn("_p",
        greatest(coalesce(max(col("_m")).over(w), lit(Long.MinValue)),
          carryLookup))
      .where(col("_m") > col("_p"))
      .select(col("x"), col("_m"))
    base.join(broadcast(verdict), Seq("x"))
      .where(col("y") === col("_m"))
      .select(col("id"), col("x"), col("y"))
  }
}
