package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecisionTreeSpec extends SparkSpec {

  import spark.implicits._
  import DecisionTree.TreeNode

  test("perfectly separable 1-D: exact split at the boundary bin, pure children") {
    // xs 0..99, label = x >= 60; bins of width 10 -> split at t = 5
    // (bin <= 5 means x < 60 goes left)
    val df = (0L until 100L).map(x => (x, x >= 60L)).toDF("x", "y")
    val tree = DecisionTree.train(df, col("y"),
      Seq((col("x"), 0L, 100L)), depth = 2, bins = 10, minLeaf = 1)
    assert(tree == Seq(
      TreeNode(1, "split", 0, 5, 100, 40),
      TreeNode(2, "leaf", -1, -1, 60, 0),
      TreeNode(3, "leaf", -1, -1, 40, 40)))
  }

  test("pure node is a leaf; no-gain node is a leaf") {
    val pure = (0L until 20L).map(x => (x, true)).toDF("x", "y")
    assert(DecisionTree.train(pure, col("y"), Seq((col("x"), 0L, 20L)),
      depth = 3, bins = 4, minLeaf = 1) ==
      Seq(TreeNode(1, "leaf", -1, -1, 20, 20)))
    // label independent of the feature WITHIN every bin and perfectly
    // balanced across bins: every candidate split has the parent's
    // 50/50 mix, so no split strictly improves -> root stays a leaf
    val noGain = (0L until 40L).map(x => (x, x % 2 == 0)).toDF("x", "y")
    val t = DecisionTree.train(noGain, col("y"),
      Seq((col("x") % 2, 0L, 2L)), depth = 2, bins = 2, minLeaf = 1)
    // x % 2 IS the label here - that splits; use a constant feature
    val const = DecisionTree.train(noGain, col("y"),
      Seq((lit(7L), 0L, 20L)), depth = 2, bins = 4, minLeaf = 1)
    assert(const == Seq(TreeNode(1, "leaf", -1, -1, 40, 20)))
    assert(t.head.kind == "split") // sanity: the informative spelling splits
  }

  test("minLeaf blocks splits that would starve a child") {
    // 10 rows, 9 left of any boundary only at the last bin edge;
    // minLeaf 6 forbids every cut (best imbalance is 4/6)
    val df = (0L until 10L).map(x => (x, x >= 6L)).toDF("x", "y")
    val tree = DecisionTree.train(df, col("y"),
      Seq((col("x"), 0L, 10L)), depth = 1, bins = 10, minLeaf = 6)
    assert(tree == Seq(TreeNode(1, "leaf", -1, -1, 10, 4)))
  }

  test("tie-break picks the lowest feature index on identical costs") {
    val df = (0L until 100L).map(x => (x, x >= 50L)).toDF("x", "y")
    val tree = DecisionTree.train(df, col("y"),
      Seq((col("x"), 0L, 100L), (col("x"), 0L, 100L)),
      depth = 1, bins = 10, minLeaf = 1)
    assert(tree.head == TreeNode(1, "split", 0, 4, 100, 50))
  }

  test("noise feature loses to the predictive one") {
    val df = (0L until 200L).map(x => (x, (x * 37 + 11) % 199, x >= 120L))
      .toDF("x", "noise", "y")
    val tree = DecisionTree.train(df, col("y"),
      Seq((col("noise"), 0L, 199L), (col("x"), 0L, 200L)),
      depth = 1, bins = 10, minLeaf = 1)
    assert(tree.head.kind == "split" && tree.head.feature == 1L)
  }

  test("score routes every row to a leaf whose stats match the tree") {
    val df = (0L until 100L)
      .map(x => (x, (x * 13 + 5) % 97, x % 3 == 0 || x >= 70L))
      .toDF("a", "b", "y")
    val feats = Seq((col("a"), 0L, 100L), (col("b"), 0L, 97L))
    val tree = DecisionTree.train(df, col("y"), feats,
      depth = 3, bins = 8, minLeaf = 3)
    val leaves = tree.filter(_.kind == "leaf").map(t => t.node -> (t.n, t.pos)).toMap
    val got = DecisionTree.score(df, feats, tree, bins = 8)
      .groupBy("leaf")
      .agg(count(lit(1)).as("n"), sum(col("y").cast("long")).as("p"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == leaves, s"score census $got vs tree leaves $leaves")
    // depth bound respected
    assert(tree.map(_.node).max < 16)
  }

  test("binColumn clamps out-of-domain values into the edge bins") {
    val df = Seq(-50L, 0L, 99L, 500L).toDF("x")
    val bins = df.select(DecisionTree.binColumn(col("x"), 0L, 100L, 10).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(bins == Seq(0L, 0L, 9L, 9L))
  }

  test("argument guards") {
    val df = Seq((1L, true)).toDF("x", "y")
    intercept[IllegalArgumentException](DecisionTree.train(df, col("y"),
      Seq((col("x"), 0L, 10L)), depth = 0))
    intercept[IllegalArgumentException](DecisionTree.train(df, col("y"),
      Seq((col("x"), 0L, 10L)), depth = 1, bins = 1))
    intercept[IllegalArgumentException](DecisionTree.train(df, col("y"),
      Seq((col("x"), 5L, 5L)), depth = 1))
    intercept[IllegalArgumentException](DecisionTree.train(df, col("y"),
      Seq.empty, depth = 1))
  }
}
