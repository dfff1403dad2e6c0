package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantileBinsSpec extends SparkSpec {

  import spark.implicits._

  test("uniform 0..99 with 4 bins: edges at the exact quartile order statistics") {
    val df = (0L until 100L).toDF("x")
    val edges = QuantileBins.fit(df, Seq(col("x")), bins = 4)
    assert(edges == Seq(Seq(24L, 49L, 74L)))
    val bins = QuantileBins.transform(df, Seq(col("x")), edges)
      .groupBy("_qb0").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bins == Map(0L -> 25L, 1L -> 25L, 2L -> 25L, 3L -> 25L))
  }

  test("heavy skew: quantile bins separate the tail where fixed-width cannot") {
    // 850 zeros + 150 tail values spread to 1.5e6: fixed-width 10-bin
    // puts ~99% of rows in bin 0; quantile bins keep the tail separable
    val df = ((0L until 850L).map(_ => 0L) ++
      (1L to 150L).map(_ * 10000L)).toDF("x")
    val Seq(edges) = QuantileBins.fit(df, Seq(col("x")), bins = 10)
    assert(edges.size == 9)
    // ranks 100..800 all land inside the 850-row mass point; rank 900
    // reaches 50 tail rows in: edge_9 = 500000
    assert(edges.count(_ == 0L) == 8 && edges.last == 500000L,
      s"expected eight collapsed edges + one tail edge: $edges")
    val q = QuantileBins.transform(df, Seq(col("x")), Seq(edges))
      .groupBy("_qb0").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(q == Map(0L -> 850L, 8L -> 50L, 9L -> 100L),
      s"tail not separated: $q")
    val fixedBins = df
      .select(DecisionTree.binColumn(col("x"), 0L, 1000001L, 10).as("b"))
      .groupBy("b").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fixedBins(0L) >= 850L,
      s"fixed-width should cram the mass point into bin 0: $fixedBins")
  }

  test("a value equal to an edge stays in the LOWER bin") {
    val df = (0L until 100L).toDF("x")
    val edges = Seq(Seq(24L, 49L, 74L))
    val got = QuantileBins.transform(df, Seq(col("x")), edges)
      .where(col("x").isin(24L, 25L, 49L, 50L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(24L -> 0L, 25L -> 1L, 49L -> 1L, 50L -> 2L))
  }

  test("quantile bins compose with the binned trainers (identity bin spec)") {
    val df = (0L until 200L).map(i => (i, i >= 120L)).toDF("x", "y")
    val edges = QuantileBins.fit(df, Seq(col("x")), bins = 10)
    val binned = QuantileBins.transform(df, Seq(col("x")), edges)
    // DecisionTree.binColumn is the identity on [0, bins) input
    val ident = binned.select(col("_qb0"),
      DecisionTree.binColumn(col("_qb0"), 0L, 10L, 10).as("b")).collect()
    assert(ident.forall(r => r.getLong(0) == r.getLong(1)))
    val tree = DecisionTree.train(binned, col("y"),
      Seq((col("_qb0"), 0L, 10L)), depth = 2, bins = 10, minLeaf = 1)
    // 120 = the rank-0.6 boundary = bin edge -> exact split, pure leaves
    assert(tree.head.kind == "split")
    val leaves = tree.filter(_.kind == "leaf")
    assert(leaves.forall(l => l.pos == 0L || l.pos == l.n),
      s"boundary on a quantile edge should give pure leaves: $tree")
  }

  test("guards") {
    val df = Seq(1L).toDF("x")
    intercept[IllegalArgumentException](QuantileBins.fit(df, Seq(col("x")), 1))
    intercept[IllegalArgumentException](QuantileBins.fit(df, Seq.empty, 4))
    intercept[IllegalArgumentException](
      QuantileBins.transform(df, Seq(col("x")), Seq.empty))
    intercept[IllegalArgumentException](
      QuantileBins.fit(df.where(col("x") > 5), Seq(col("x")), 4))
  }
}
