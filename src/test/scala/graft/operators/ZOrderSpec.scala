package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("z-values interleave bits exactly") {
    def morton(a: Long, b: Long): Long =
      (0 until 16).map(i =>
        (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L),
      (12345L, 54321L))
    val got = pts.toDF("a", "b")
      .select($"a", $"b", ZOrder.zValue2($"a", $"b").as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((a, b) <- pts)
      assert(got((a, b)) == morton(a, b), s"($a,$b)")
    // wide inputs mask to the low 16 bits (documented)
    val wide = Seq((65536L + 3L, 5L)).toDF("a", "b")
      .select(ZOrder.zValue2($"a", $"b")).head().getLong(0)
    assert(wide == morton(3L, 5L))
  }

  test("z layout prunes partitions for predicates on the OTHER column") {
    // with uniform data, z boxes and x stripes have the SAME average
    // area — the z win is SHAPE: near-square boxes mean a narrow
    // predicate on y overlaps only ~sqrt(P) partitions' min/max, while
    // x-sorted stripes all span the full y domain (zero skipping).
    val rnd = new scala.util.Random(42)
    val pts = (1 to 4096).map(_ =>
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
      .toDF("x", "y")
    def overlapping(laid: org.apache.spark.sql.DataFrame): Long =
      laid.withColumn("_p", spark_partition_id())
        .groupBy("_p")
        .agg(min($"y").as("ymin"), max($"y").as("ymax"))
        .where($"ymin" <= 30100L && $"ymax" >= 30000L)
        .count()
    val zHit = overlapping(ZOrder.layout(pts, "x", "y", partitions = 16))
    val xHit = overlapping(
      pts.repartitionByRange(16, $"x").sortWithinPartitions("x"))
    assert(xHit == 16L, s"x stripes must all span the y predicate: $xHit")
    assert(zHit <= 8L,
      s"z layout must let min/max skip most partitions on y: $zHit of 16")
  }

  test("writeZOrdered: ON-DISK file stats prune on the second column") {
    val rnd = new scala.util.Random(7)
    val pts = (1 to 4096).map(_ =>
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
      .toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft-zsink")
    graft.sinks.Sinks.writeZOrdered(pts, dir.toString, "x", "y", files = 16)
    val parts = dir.toFile.listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    assert(parts.length == 16, s"expected 16 files, got ${parts.length}")
    // read each FILE back and test its actual y bounds against a narrow
    // predicate — what a footer-stats skipper would do
    val hit = parts.count { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min($"y"), max($"y")).head()
      r.getLong(0) <= 30100L && r.getLong(1) >= 30000L
    }
    assert(hit <= 8, s"on-disk z files must be y-prunable: $hit of 16 overlap")
  }
}
