package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-k change detection between two periods — "what entered, left,
  * or moved in today's top terms vs yesterday's": the heavy-hitter
  * DIFF that turns two leaderboards into an alertable changelog
  * (emerging topics, trending queries, a crawl suddenly dominated by
  * one domain). [[FreqSketch]] finds a period's heavy hitters;
  * [[Rbo]] scores how similar two rankings are overall; this names
  * the individual movers.
  *
  * Ranks are deterministic (count desc, item asc — a total order) and
  * the per-period top-k is the row_number spelling, so both
  * leaderboards ride the GroupedTopK heap rewrite. Output is one row
  * per item in EITHER top-k: counts and ranks from both periods (null
  * rank = outside that period's top-k, with the true count still
  * reported via the census join) and a status verdict.
  *
  * Scale shape: one (period × item) partial-agg census shuffle, two
  * k-bounded heap top-ks, one ≤2k-row full-outer join plus a census
  * lookup for the off-board counts. Output ≤ 2k rows.
  */
object Trending {

  /** (item, n_a, n_b, rank_a, rank_b, status) — status ∈ 'new' (top-k
    * only in B), 'dropped' (only in A), 'up' / 'down' / 'flat' (both).
    * `periodB` selects the later period's rows.
    */
  def topChanges(df: DataFrame, item: Column, periodB: Column,
                 k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val census = df.select(item.cast("string").as("item"),
        when(periodB, lit("b")).otherwise(lit("a")).as("p"))
      .groupBy("p", "item").agg(count(lit(1)).as("n"))
      .localCheckpoint(false)
    val w = Window.partitionBy("p")
      .orderBy(col("n").desc, col("item").asc)
    // filter on the raw rank (the shape the heap rewrite matches),
    // widen to long after — DuckDB's row_number is BIGINT natively
    val top = census
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .withColumn("rank", col("rank").cast("long"))
    val ta = top.where(col("p") === "a")
      .select(col("item"), col("rank").as("rank_a"))
    val tb = top.where(col("p") === "b")
      .select(col("item"), col("rank").as("rank_b"))
    val ca = census.where(col("p") === "a")
      .select(col("item"), col("n").as("n_a"))
    val cb = census.where(col("p") === "b")
      .select(col("item"), col("n").as("n_b"))
    ta.join(tb, Seq("item"), "full_outer")
      .join(ca, Seq("item"), "left_outer")
      .join(cb, Seq("item"), "left_outer")
      .na.fill(0L, Seq("n_a", "n_b"))
      .withColumn("status",
        when(col("rank_a").isNull, "new")
          .when(col("rank_b").isNull, "dropped")
          .when(col("rank_b") < col("rank_a"), "up")
          .when(col("rank_b") > col("rank_a"), "down")
          .otherwise("flat"))
      .select("item", "n_a", "n_b", "rank_a", "rank_b", "status")
  }
}
