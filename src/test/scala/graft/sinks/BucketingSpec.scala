package graft.sinks

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The write-side partitioning contract: two tables bucketed on their join
  * keys with equal bucket counts must plan an equi-join with no shuffle on
  * either side — the co-located-join scale path.
  */
class BucketingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bucketed tables join without any Exchange; results match plain join") {
    Sinks.writeBucketed(Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice"), "orders_bkt", "o_orderkey", 8)
    Sinks.writeBucketed(Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_quantity"), "lineitem_bkt", "l_orderkey", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-exchange decision to be bucketing's, not broadcast's
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("lineitem_bkt")
        .join(spark.table("orders_bkt"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")

      val expected = Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(joined.count() === expected)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("bucketed groupBy on the bucket key needs no shuffle") {
    // re-write (overwrite) so this test stands alone
    Sinks.writeBucketed(Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_quantity"), "lineitem_bkt", "l_orderkey", 8)
    val agg = spark.table("lineitem_bkt")
      .groupBy("l_orderkey").agg(sum("l_quantity").as("qty"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free aggregation:\n$plan")
  }
}
