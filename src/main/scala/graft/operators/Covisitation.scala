package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Session co-visitation matrix — the recsys candidate-generation
  * workhorse (items visited in the same session are related; the top-k
  * co-visited items per item are the cheap nearest-neighbor candidates
  * that need no embeddings at all). Beyond-reference surface (SURVEY
  * §2.13).
  *
  * Pipeline: [[Sessionize.assign]] (gap-based sessions) → distinct
  * (session, item) → within-session item pairs → pair census → top-k
  * co-items per item. The within-session self-join is the classic
  * quadratic hazard; `maxItemsPerSession` drops marathon sessions
  * BEFORE pairing (the standard recsys-competition mitigation — a
  * 10k-item bot session would contribute 5·10⁷ pairs of near-zero
  * signal), so per-session fanout is bounded by construction and the
  * census shuffle carries at most sessions·maxItems²/2 rows.
  *
  * All counts integer, ties broken by co_item asc — fully replayable.
  */
object Covisitation {

  /** (item, co_item, cnt, rank): top-k co-visited items per item, both
    * directions, ranked by (cnt desc, co_item asc). `itemOf` defaults
    * to the integer `k` property of the event's JSON props.
    */
  def topCovisited(events: DataFrame, k: Int = 5,
                   gapUs: Long = 1800000000L,
                   maxItemsPerSession: Int = 50): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxItemsPerSession >= 2,
      s"maxItemsPerSession must be >= 2, got $maxItemsPerSession")
    val items = events.select(col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("item"))
    val si = Sessionize.assign(events, gapUs)
      .join(items, Seq("event_id"))
      .where(col("item").isNotNull)
      .select("user_id", "session_id", "item")
      .distinct()
    val sizes = si.groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("_ns"))
      .where(col("_ns") <= maxItemsPerSession)
      .select("user_id", "session_id")
    val bounded = si.join(sizes, Seq("user_id", "session_id"))
    val a = bounded.select(col("user_id"), col("session_id"),
      col("item").as("item_a"))
    val b = bounded.select(col("user_id"), col("session_id"),
      col("item").as("item_b"))
    val census = a.join(b, Seq("user_id", "session_id"))
      .where(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("cnt"))
    val directed = census
      .select(col("item_a").as("item"), col("item_b").as("co_item"), col("cnt"))
      .unionByName(census.select(col("item_b").as("item"),
        col("item_a").as("co_item"), col("cnt")))
    val w = Window.partitionBy("item")
      .orderBy(col("cnt").desc, col("co_item").asc)
    directed
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("item", "co_item", "cnt", "rank")
  }
}
