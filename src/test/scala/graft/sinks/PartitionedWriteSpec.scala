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
}
