package graft.functions

import graft.SparkSpec
import graft.operators.SketchOps
import org.apache.spark.sql.functions._

class ThetaSketchSpec extends SparkSpec {

  import spark.implicits._

  test("thetaAgg: exact-mode estimate equals the exact distinct count") {
    // 4 partitions force partial-agg serialize/merge through the
    // Union buffer, not a single-pass update
    val df = (1L to 1000L).map(i => ("g", s"v${i % 317}"))
      .toDF("grp", "v").repartition(4)
    val est = df.groupBy("grp")
      .agg(ThetaSketch.thetaAgg(col("v")).as("sk"))
      .select(round(ThetaSketch.estimate(col("sk"))).cast("long"))
      .head().getLong(0)
    assert(est == 317L)
  }

  test("set-op estimates on planted overlapping sets are exact") {
    // A = 0..599, B = 400..999 → |A∩B| = 200, |A∪B| = 1000, |A\B| = 400
    val df = (0L until 600L).map(i => ("a", i))
      .union((400L until 1000L).map(i => ("b", i)))
      .toDF("grp", "v").repartition(5)
    val sk = df.groupBy("grp").agg(ThetaSketch.thetaAgg(col("v")).as("sk"))
    val a = sk.where($"grp" === "a").select($"sk".as("sa"))
    val b = sk.where($"grp" === "b").select($"sk".as("sb"))
    val r = a.crossJoin(b).select(
      round(ThetaSketch.intersectEstimate($"sa", $"sb")).cast("long"),
      round(ThetaSketch.unionEstimate($"sa", $"sb")).cast("long"),
      round(ThetaSketch.aNotBEstimate($"sa", $"sb")).cast("long")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((200L, 1000L, 400L)))
  }

  test("sketch bytes survive a parquet round trip and stay mergeable") {
    val dir = java.nio.file.Files.createTempDirectory("theta").toString
    val docs = (1L to 60L).map(i => (i, s"doc body number ${i % 20}"))
      .toDF("doc_id", "text").withColumn("grp",
        when($"doc_id" % 2 === 0, "even").otherwise("odd"))
    SketchOps.groupSketches(docs, "grp").write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    // evens hit (i%20) ∈ {0,2,..,18}, odds {1,3,..,19} → disjoint 10+10
    val m = SketchOps.overlapMatrix(back).head()
    assert(m.getLong(2) == 10L && m.getLong(3) == 10L)   // card_a, card_b
    assert(m.getLong(4) == 0L && m.getLong(5) == 20L)    // ∩, ∪
  }

  test("null values are ignored like count_distinct") {
    val df = Seq(("g", "x"), ("g", null), ("g", "x"), ("g", "y"))
      .toDF("grp", "v")
    val est = df.groupBy("grp")
      .agg(ThetaSketch.thetaAgg(col("v")).as("sk"))
      .select(round(ThetaSketch.estimate(col("sk"))).cast("long"))
      .head().getLong(0)
    assert(est == 2L)
  }
}
