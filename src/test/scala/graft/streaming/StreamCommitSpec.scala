package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StreamCommitSpec extends SparkSpec {

  import spark.implicits._

  private def tempDir(): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory("graft-sc")

  test("a replayed epoch cannot double-commit") {
    val table = tempDir().resolve("t").toString
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    assert(StreamCommit.commitEpoch(b0, table, 0L))
    assert(StreamCommit.commitEpoch(Seq((3L, "c")).toDF("id", "v"), table, 1L))
    val before = StreamCommit.readCommitted(spark, table)
      .collect().map(_.toSeq).toSet
    // the retry: SAME epoch id, same (or even different) payload — the
    // manifest already lists epoch-0, so this must be a no-op
    assert(!StreamCommit.commitEpoch(b0, table, 0L))
    assert(StreamCommit.readCommitted(spark, table)
      .collect().map(_.toSeq).toSet === before)
    assert(before.size === 3)
  }

  test("a crashed half-write is invisible, then cleanly recommitted") {
    val dirP = tempDir()
    val table = dirP.resolve("t").toString
    assert(StreamCommit.commitEpoch(Seq((1L, "a")).toDF("id", "v"), table, 0L))
    // simulate epoch-1 crashing after its files landed but BEFORE the
    // manifest swap: write the directory directly
    Seq((9L, "junk")).toDF("id", "v")
      .write.parquet(new java.io.File(table, "epoch-1").getPath)
    assert(StreamCommit.readCommitted(spark, table).count() === 1L,
      "readers enumerate the manifest, not the directory")
    // the replayed epoch must clear the orphan and commit its own rows
    assert(StreamCommit.commitEpoch(Seq((2L, "b")).toDF("id", "v"), table, 1L))
    val rows = StreamCommit.readCommitted(spark, table)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows === Set((1L, "a"), (2L, "b")), "no junk from the half-write")
  }

  test("an empty epoch commits (marking it done) and adds no rows") {
    val table = tempDir().resolve("t").toString
    assert(StreamCommit.commitEpoch(Seq((1L, "a")).toDF("id", "v"), table, 0L))
    val empty = Seq.empty[(Long, String)].toDF("id", "v")
    assert(StreamCommit.commitEpoch(empty, table, 1L))
    assert(StreamCommit.readCommitted(spark, table).count() === 1L)
    // and its retry is now a pure no-op
    assert(!StreamCommit.commitEpoch(empty, table, 1L))
    assert(StreamCommit.readCommitted(spark, table).count() === 1L)
  }

  test("streamed drain equals batch, resumes from the checkpoint") {
    val root = tempDir()
    val src = root.resolve("src"); java.nio.file.Files.createDirectories(src)
    val table = root.resolve("table").toString
    val ckpt = root.resolve("ckpt").toString
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val st = java.nio.file.Files.createTempDirectory("graft-sc-stage")
      df.coalesce(1).write.mode("overwrite").parquet(st.toString)
      val part = st.toFile.listFiles()
        .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
        .get
      java.nio.file.Files.move(part.toPath, src.resolve(name))
    }
    val all = (1 to 100).map(i => (i.toLong, s"v$i"))
    stage(all.take(50).toDF("id", "v"), "a.parquet")
    def stream = spark.readStream
      .schema(all.toDF("id", "v").schema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    StreamCommit.runCommitted(stream, table, ckpt)
    assert(StreamCommit.readCommitted(spark, table).count() === 50L)
    // second run: new file only — the checkpoint resumes past epoch 0,
    // and the new epoch id continues (no collision with the committed one)
    stage(all.drop(50).toDF("id", "v"), "b.parquet")
    StreamCommit.runCommitted(stream, table, ckpt)
    val got = StreamCommit.readCommitted(spark, table)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === all.toSet)
  }
}
