package graft.sinks

import graft.SparkSpec

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def parquetFiles(dir: String) =
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))

  test("compact rewrites a many-file directory to the byte-targeted count, losslessly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact")
      .resolve("t").toString
    // 40 tiny files — the accreted micro-batch shape
    (1 to 1000).map(i => (i.toLong, s"row $i")).toDF("id", "s")
      .repartition(40).write.parquet(dir)
    assert(parquetFiles(dir).length == 40)
    val before = spark.read.parquet(dir).collect().map(_.toSeq).toSet
    val total = parquetFiles(dir).map(_.length()).sum

    val n = Sinks.compact(spark, dir, targetBytes = total / 4 + 1)
    assert(n >= 1 && n <= 4, s"expected <=4 target-sized files, got $n")
    assert(parquetFiles(dir).length == n, "directory holds exactly n files")
    val after = spark.read.parquet(dir).collect().map(_.toSeq).toSet
    assert(after == before, "compaction must not change the data")
  }

  test("compact to one file when the target exceeds the total size") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact1")
      .resolve("t").toString
    (1 to 100).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
      .repartition(8).write.parquet(dir)
    assert(Sinks.compact(spark, dir, targetBytes = Long.MaxValue) == 1)
    assert(parquetFiles(dir).length == 1)
    assert(spark.read.parquet(dir).count() == 100)
  }

  test("compact refuses an empty directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-e").toString
    intercept[IllegalArgumentException] {
      Sinks.compact(spark, dir, targetBytes = 1024L)
    }
  }
}
