package graft.sinks

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Partitioned-write contract: a filter on the partition column must
  * become a planning-time PartitionFilter (directory pruning), not a
  * post-scan predicate over all files.
  */
class PartitionedWriteSpec extends SparkSpec {

  test("partition-column filter prunes at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    Sinks.writePartitioned(events, dir, Seq("event_type"))

    val q = spark.read.parquet(dir).where(col("event_type") === "click")
    val plan = q.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("event_type"),
      s"expected event_type in PartitionFilters:\n$plan")
    // pruned read still returns exactly the filtered rows
    assert(q.count() === events.where(col("event_type") === "click").count())
  }

  test("dynamic partition pruning: a filtered dim join prunes fact partitions at runtime") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    Sinks.writePartitioned(events, dir, Seq("event_type"))

    // the fact side carries NO static partition filter — the only way
    // to prune is the runtime subquery DPP injects from the dim filter.
    // The dim must be a real source with a surviving Filter node: a
    // local Seq constant-folds the filter away and DPP's selective-
    // predicate check never fires.
    import spark.implicits._
    val dimDir = java.nio.file.Files.createTempDirectory("graft-dpp-dim").toString
    Seq(("click", 1), ("purchase", 2)).toDF("event_type", "weight")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).where($"weight" === 1)
    val fact = spark.read.parquet(dir)
    val q = fact.join(dim, "event_type").groupBy("event_type")
      .agg(count(lit(1)).as("n"))
    val rows = q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamic-partition-pruning subquery on the fact scan:\n$plan")
    assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("click" -> events.where($"event_type" === "click").count()))
  }
}
