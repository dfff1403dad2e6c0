package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StreamingSpec extends SparkSpec {

  val eventsDir = "/root/testdata/sf0.001"

  test("incremental windowedCounts equals the batch result (memory sink)") {
    val batchEvents = graft.Tables.events(spark, eventsDir)
    val expected = EventStream.windowedCounts(batchEvents)
      .collect().map(_.toSeq).toSet

    // drive the SAME transform incrementally from a parquet stream
    // (FileStreamSource needs a directory; stage the single file into one)
    val streamDir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$eventsDir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val stream = EventStream.readStream(spark, streamDir.toString)
    val q = EventStream.windowedCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("win_out").collect().map(_.toSeq).toSet
    assert(got == expected)
  }

  test("mapGroupsWithState running counts match per-user totals") {
    val batchEvents = graft.Tables.events(spark, eventsDir)
    val expected = batchEvents.groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = EventStream.runningUserCounts(batchEvents)
      .collect().map(s => s.userId -> s.events).toMap
    assert(got == expected)
  }

  test("session counts: per-user sessions partition all events") {
    val batchEvents = graft.Tables.events(spark, eventsDir)
    val sessions = EventStream.sessionCounts(batchEvents)
    val totalEvents = sessions.agg(sum("n_events")).head().getLong(0)
    assert(totalEvents == batchEvents.count())
  }
}
