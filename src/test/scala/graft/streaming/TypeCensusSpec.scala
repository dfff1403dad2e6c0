package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class TypeCensusSpec extends SparkSpec {

  private val eventsDir = "/root/testdata/sf0.001"

  private def stage(df: org.apache.spark.sql.DataFrame,
                    dir: java.nio.file.Path, name: String): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-tc-stage")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = tmp.toFile.listFiles()
      .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .getOrElse(sys.error(s"no part file under $tmp"))
    java.nio.file.Files.move(part.toPath, dir.resolve(name))
  }

  private def batchCensus(): Map[Long, (Long, Long)] =
    graft.Tables.events(spark, eventsDir)
      .where(col("user_id").isNotNull)
      .groupBy("user_id")
      .agg(countDistinct(coalesce(col("event_type"), lit(""))).as("t"),
        count(lit(1)).as("e"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("batch analog emits the exact full-corpus distinct-type census") {
    val got = TypeCensus.typeCensus(graft.Tables.events(spark, eventsDir))
      .collect().map(t => t.user_id -> (t.n_types, t.n_events)).toMap
    assert(got == batchCensus())
  }

  test("streaming: MapState carries across triggers; latest row per user is exact") {
    val ev = graft.Tables.events(spark, eventsDir)
    val streamDir = java.nio.file.Files.createTempDirectory("graft-tc-stream")
    stage(ev.where(col("event_id") % 2 === 0), streamDir, "a.parquet")
    stage(ev.where(col("event_id") % 2 === 1), streamDir, "b.parquet")
    val q = TypeCensus.typeCensus(
        EventStream.readStream(spark, streamDir.toString))
      .writeStream.outputMode("append")
      .format("memory").queryName("tc_out")
      .option("maxFilesPerTrigger", "1")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(180000))
    val rows = spark.table("tc_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // two triggers -> up to two rows per user; the census is monotone,
    // so the MAX per user is the final state and must equal batch
    val last = rows.groupBy(_._1).map { case (u, rs) =>
      u -> ((rs.map(_._2).max, rs.map(_._3).max)) }
    assert(last == batchCensus())
    // at least one user emitted twice with a GROWING event count —
    // proof the map state carried over instead of restarting
    val grew = rows.groupBy(_._1).values
      .exists(rs => rs.size == 2 && rs.map(_._3).distinct.size == 2)
    assert(grew, "no user showed cross-trigger state growth")
  }
}
