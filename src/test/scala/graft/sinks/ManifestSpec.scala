package graft.sinks

import graft.SparkSpec

class ManifestSpec extends SparkSpec {

  import spark.implicits._

  private def freshTable(): String =
    java.nio.file.Files.createTempDirectory("graft-manifest").toString + "/t"

  test("commits append; readers see exactly the union of committed batches") {
    val t = freshTable()
    assert(Sinks.commitParquet(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), t) == 0)
    assert(Sinks.commitParquet(Seq((3L, "c")).toDF("id", "v"), t) == 1)
    val got = Sinks.readCommitted(spark, t)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("orphan files from a crashed write are invisible to readers") {
    val t = freshTable()
    Sinks.commitParquet(Seq((1L, "a")).toDF("id", "v"), t)
    // a valid parquet file dropped into the table dir, never committed
    val tmp = java.nio.file.Files.createTempDirectory("graft-orphan")
    Seq((99L, "junk")).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = tmp.toFile.listFiles()
      .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith(".")).get
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(t, "orphan.parquet"))
    val got = Sinks.readCommitted(spark, t)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L), s"orphan leaked into the committed snapshot: $got")
    // a naive directory read DOES pick the junk up (it sees the
    // top-level orphan; committed data lives in batch-* subdirs a flat
    // read doesn't even recurse into — wrong in both directions)
    val listed = spark.read.parquet(t).collect().map(_.getLong(0)).toSet
    assert(listed.contains(99L) && !listed.contains(1L))
  }

  test("nothing committed → loud failure, not an empty frame") {
    val t = freshTable()
    new java.io.File(t).mkdirs()
    intercept[IllegalArgumentException] { Sinks.readCommitted(spark, t) }
  }
}
