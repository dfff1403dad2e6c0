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
    assert(q.awaitTermination(120000))
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
    assert(q.awaitTermination(120000))
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
    assert(q.awaitTermination(120000))
    val out = spark.table("enrich_out")
    assert(out.count() == graft.Tables.events(spark, eventsDir).count())
    assert(out.where(col("segment").isNull).count() == 0)
  }

  test("flatMapGroupsWithState sequences: single trigger equals batch") {
    val batchEvents = graft.Tables.events(spark, eventsDir)
    val expected = EventStream.sequencedEvents(batchEvents)
      .collect().map(s => (s.user_id, s.event_id) -> s.seq).toMap
    val streamDir = java.nio.file.Files.createTempDirectory("graft-seq")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$eventsDir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val q = EventStream.sequencedEvents(EventStream.readStream(spark, streamDir.toString))
      .writeStream.outputMode("append")
      .format("memory").queryName("seq_out")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000))
    val got = spark.table("seq_out")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected) // single file => single trigger => exact match
  }

  test("flatMapGroupsWithState sequences continue across micro-batches") {
    // TWO disjoint files => (at least) two triggers with maxFilesPerTrigger=1.
    // If the per-user counter reset between triggers, seqs would repeat;
    // lifetime continuation means every user's seq set is exactly 1..n.
    val batchEvents = graft.Tables.events(spark, eventsDir).cache()
    val streamDir = java.nio.file.Files.createTempDirectory("graft-seq2")
    batchEvents.where(col("event_id") % 2 === 0)
      .write.parquet(streamDir.resolve("a.parquet").toString)
    batchEvents.where(col("event_id") % 2 === 1)
      .write.parquet(streamDir.resolve("b.parquet").toString)
    val stream = spark.readStream
      .schema(batchEvents.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(streamDir.toString)
    val q = EventStream.sequencedEvents(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("seq2_out")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000))
    val perUser = spark.table("seq2_out")
      .collect().groupBy(_.getLong(0)).map { case (u, rows) =>
        u -> rows.map(_.getLong(2)).sorted.toSeq }
    val counts = batchEvents.groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    perUser.foreach { case (u, seqs) =>
      assert(seqs == (1L to counts(u)).toSeq,
        s"user $u seqs not a contiguous 1..n run: ${seqs.take(5)}...")
    }
  }
}
