package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class RecentItemsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def stage(df: DataFrame, into: java.nio.file.Path, name: String): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ri-stage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = tmp.toFile.listFiles()
      .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .getOrElse(sys.error(s"no part file under $tmp"))
    java.nio.file.Files.move(part.toPath, into.resolve(name))
  }

  private def batchExpected(ev: DataFrame, k: Int): Map[Long, (Long, Long, String)] = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_us").desc, col("event_id").desc)
    ev.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        coalesce(col("event_type"), lit("")).as("et"))
      .where(col("user_id").isNotNull && col("ts_us").isNotNull)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), countDistinct("et").as("t"),
        max(when(col("rk") === 1, col("et"))).as("lt"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getString(3)))).toMap
  }

  test("batch analog equals the last-K window query") {
    val ev = graft.Tables.events(spark, dir)
    val got = RecentItems.recentItems(ev, k = 5).collect()
      .map(o => o.user_id -> ((o.n_recent, o.n_types, o.last_type))).toMap
    assert(got == batchExpected(ev, 5))
  }

  test("streaming: ListState carries across triggers; last emission per user is exact") {
    val ev = graft.Tables.events(spark, dir)
    val srcDir = java.nio.file.Files.createTempDirectory("graft-ri-stream")
    stage(ev.where(col("event_id") % 2 === 0), srcDir, "a.parquet")
    stage(ev.where(col("event_id") % 2 === 1), srcDir, "b.parquet")
    val perBatch = scala.collection.mutable.Map[Long, Seq[(Long, Long, Long, String)]]()
    val q = RecentItems.recentItems(
        EventStream.readStream(spark, srcDir.toString), k = 5)
      .writeStream.outputMode("append")
      .option("maxFilesPerTrigger", "1")
      .foreachBatch { (out: org.apache.spark.sql.Dataset[RecentItems.RecentOut], id: Long) =>
        perBatch.synchronized {
          perBatch(id) = out.collect().toSeq
            .map(o => (o.user_id, o.n_recent, o.n_types, o.last_type))
        }
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000))
    assert(perBatch.size >= 2, s"expected 2 triggers, saw ${perBatch.keySet}")
    // the LAST emission per user (highest batch id) is the full-history
    // last-K census — proof the carried list merged with batch B
    val last = scala.collection.mutable.Map[Long, (Long, Long, String)]()
    perBatch.toSeq.sortBy(_._1).foreach { case (_, rows) =>
      rows.foreach { case (u, n, t, lt) => last(u) = (n, t, lt) }
    }
    assert(last.toMap == batchExpected(ev, 5))
  }

  test("state TTL expires a quiet user's list (ProcessingTime mode, real trigger)") {
    val ev = graft.Tables.events(spark, dir)
      .where(col("user_id").isNotNull).limit(200).cache()
    val srcDir = java.nio.file.Files.createTempDirectory("graft-ri-ttl")
    val half = ev.count() / 2
    val a = ev.where(col("event_id") % 2 === 0)
    val b = ev.where(col("event_id") % 2 === 1)
    stage(a, srcDir, "a.parquet")
    val perBatch = scala.collection.mutable.Map[Long, Map[Long, Long]]()
    val q = RecentItems.recentItems(
        EventStream.readStream(spark, srcDir.toString), k = 1000,
        ttl = Some(java.time.Duration.ofSeconds(2)))
      .writeStream.outputMode("append")
      .foreachBatch { (out: org.apache.spark.sql.Dataset[RecentItems.RecentOut], id: Long) =>
        perBatch.synchronized {
          perBatch(id) = out.collect().map(o => o.user_id -> o.n_recent).toMap
        }
      }
      .start() // default micro-batch trigger: the ProcessingTime contract
    // ProcessingTime mode never signals noNewData (unconditional
    // shouldRunAnotherBatch — see ProcessingTimeTwsSpec), so
    // processAllAvailable would hang; poll the foreachBatch capture.
    def nonEmptyBatches(): Int =
      perBatch.synchronized(perBatch.values.count(_.nonEmpty))
    def awaitBatches(n: Int): Unit = {
      val deadline = System.nanoTime() + 120L * 1000000000L
      while (nonEmptyBatches() < n && System.nanoTime() < deadline)
        Thread.sleep(200)
      assert(nonEmptyBatches() >= n, s"saw ${nonEmptyBatches()} batches, wanted $n")
    }
    try {
      awaitBatches(1)
      Thread.sleep(6000) // > TTL: every list written above expires
      stage(b, srcDir, "b.parquet")
      awaitBatches(2)
    } finally {
      spark.conf.set("spark.sql.streaming.stopTimeout", "15s")
      try q.stop()
      catch { case _: java.util.concurrent.TimeoutException => () }
      finally spark.conf.set("spark.sql.streaming.stopTimeout", "0")
    }
    assert(half > 0 && perBatch.nonEmpty)
    val bCounts = b.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // empty triggers also hit foreachBatch — take the last NONEMPTY one
    val lastBatch = perBatch.synchronized(
      perBatch.toSeq.filter(_._2.nonEmpty).maxBy(_._1)._2)
    // expired state: the second emission counts ONLY batch-B events
    val common = lastBatch.keySet.intersect(bCounts.keySet)
    assert(common.nonEmpty)
    common.foreach { u =>
      assert(lastBatch(u) == bCounts(u),
        s"user $u kept pre-TTL items: ${lastBatch(u)} vs batch-only ${bCounts(u)}")
    }
  }
}
