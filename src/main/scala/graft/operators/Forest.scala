package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Random forest of binned CART trees — the ensemble rung of the
  * quality-classifier ladder ([[Classifier]] NB → [[DecisionTree]] →
  * [[Boost]] → this), Breiman-style: per tree a ROW BAG and a FEATURE
  * SUBSET decorrelate the members, majority vote aggregates, and the
  * out-of-bag rows give a validation estimate without a held-out
  * split. Beyond-reference surface (SURVEY §2.13).
  *
  * Determinism / engine portability:
  *  - row bagging is a PORTABLE md5 Bernoulli — row r joins tree t iff
  *    md5₆₀("rfbag:t:"‖key) mod 1e6 < bagMicro — the scalable spelling
  *    of the bootstrap (Bernoulli(p) ≈ Poisson(1)-with-replacement for
  *    ranking purposes; exact integer draw, identical in Spark and
  *    DuckDB);
  *  - feature subsets rank features by md5("rffeat:t:f") on the DRIVER
  *    (the subsets are constants interpolated into both the plan and
  *    the oracle — shared by construction);
  *  - each member is a [[DecisionTree.train]] run (exact integer
  *    histograms, deterministic argmins), so the whole forest replays
  *    level for level; votes and OOB tallies are integer counts with
  *    the 2·pos ≥ n tie-to-positive convention everywhere.
  *
  * 100 TB shape: nTrees × depth census shuffles over one
  * localCheckpointed projection (each census bounded by
  * 2^depth·F·bins); bagging filters are codegen'd scans, never
  * shuffles; voting/OOB is a shuffle-free nested-CASE scan per tree
  * over the full corpus.
  */
object Forest {

  /** One trained member: global-feature-indexed tree rows. */
  final case class Member(tree: Int, nodes: Seq[DecisionTree.TreeNode],
                          features: Seq[Int])

  private def md5Long(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  /** Deterministic per-tree feature subsets: rank features by
    * md5("rffeat:t:f"), take the `perTree` smallest, ascending.
    */
  def featureSubsets(nTrees: Int, nFeatures: Int, perTree: Int): Seq[Seq[Int]] =
    (0 until nTrees).map { t =>
      (0 until nFeatures).sortBy(f => (md5Long(s"rffeat:$t:$f"), f))
        .take(perTree).sorted
    }

  /** The portable bag predicate for tree `t` keyed on `key`. */
  def bagged(key: Column, t: Int, bagMicro: Long): Column =
    pmod(conv(substring(md5(concat(lit(s"rfbag:$t:"),
      key.cast("string"))), 1, 15), 16, 10).cast("long"),
      lit(1000000L)) < bagMicro

  /** Train `nTrees` members. `key` must be a stable unique row id (the
    * bag draw is keyed on it). Feature indices in the returned members
    * are GLOBAL (into `features`).
    */
  def train(df: DataFrame, label: Column,
            features: Seq[(Column, Long, Long)], key: Column,
            nTrees: Int, perTree: Int, depth: Int, bins: Int = 16,
            minLeaf: Long = 1, bagMicro: Long = 700000L): Seq[Member] = {
    require(nTrees >= 1 && nTrees <= 64, s"nTrees in [1,64], got $nTrees")
    require(perTree >= 1 && perTree <= features.size,
      s"perTree in [1, ${features.size}], got $perTree")
    require(bagMicro >= 1 && bagMicro <= 1000000L,
      s"bagMicro in [1, 1e6], got $bagMicro")
    val subsets = featureSubsets(nTrees, features.size, perTree)
    subsets.zipWithIndex.map { case (fs, t) =>
      val nodes = DecisionTree.train(df.where(bagged(key, t, bagMicro)),
        label, fs.map(features), depth, bins, minLeaf)
      Member(t, nodes.map(n =>
        if (n.kind == "split") n.copy(feature = fs(n.feature.toInt)) else n),
        fs)
    }
  }

  /** Forest table for the gate surface: (tree, node, kind, feature,
    * bin, n, pos) with GLOBAL feature indices.
    */
  def forestFrame(spark: org.apache.spark.sql.SparkSession,
                  forest: Seq[Member]): DataFrame = {
    import spark.implicits._
    forest.flatMap(m => m.nodes.map(n =>
      (m.tree.toLong, n.node, n.kind, n.feature, n.bin, n.n, n.pos)))
      .toDF("tree", "node", "kind", "feature", "bin", "n", "pos")
  }

  /** Majority vote + OOB tallies for every row: adds
    * `votes_pos` (trees voting 1), `pred` (2·votes_pos ≥ nTrees),
    * `oob_votes`/`oob_pos` (trees where the row was NOT bagged) and
    * `oob_pred` (null when the row was in every bag). One shuffle-free
    * nested-CASE scan; each tree's leaf router and class map are plan
    * literals.
    */
  def vote(df: DataFrame, features: Seq[(Column, Long, Long)],
           forest: Seq[Member], key: Column, bins: Int = 16,
           bagMicro: Long = 700000L): DataFrame = {
    require(forest.nonEmpty, "empty forest")
    // bin every GLOBAL feature once; per tree route via its subset
    val binned = features.zipWithIndex.map { case ((c, lo, hi), i) =>
      DecisionTree.binColumn(c, lo, hi, bins).as(s"_fb$i") }
    val withBins = df.select(col("*") +: binned: _*)
    def routerCol(m: Member): Column = {
      val splits = m.nodes.filter(_.kind == "split")
        .map(n => n.node -> (n.feature.toInt, n.bin)).toMap
      val depth = if (splits.isEmpty) 0
        else (63 - java.lang.Long.numberOfLeadingZeros(splits.keys.max)) + 1
      var leaf: Column = lit(1L)
      for (l <- 0 until depth) {
        val prev = leaf
        val lvl = splits.toSeq
          .filter { case (k, _) => k >= (1L << l) && k < (2L << l) }
          .sortBy(_._1)
        leaf = if (l == 0)
          lvl.headOption.map { case (_, (fi, t)) =>
            (lit(2L) + when(col(s"_fb$fi") <= t, 0L).otherwise(1L)): Column
          }.getOrElse(prev)
        else lvl.foldLeft(prev) { case (acc, (k, (fi, t))) =>
          when(prev === k,
            lit(2 * k) + when(col(s"_fb$fi") <= t, 0L).otherwise(1L))
            .otherwise(acc)
        }
      }
      val leafCls = m.nodes.filter(_.kind == "leaf")
        .map(n => n.node -> (if (2 * n.pos >= n.n) 1L else 0L))
      leafCls.foldLeft(lit(0L)) { case (acc, (node, cls)) =>
        when(leaf === node, cls).otherwise(acc)
      }
    }
    val preds = forest.map(routerCol)
    val inBag = forest.map(m => bagged(key, m.tree, bagMicro))
    val votesPos = preds.reduce(_ + _)
    val oobVotes = inBag.map(b => when(b, 0L).otherwise(1L)).reduce(_ + _)
    val oobPos = preds.zip(inBag)
      .map { case (p, b) => when(b, 0L).otherwise(p) }.reduce(_ + _)
    withBins
      .withColumn("votes_pos", votesPos)
      .withColumn("pred",
        (votesPos * 2 >= forest.size).cast("long"))
      .withColumn("oob_votes", oobVotes)
      .withColumn("oob_pos", oobPos)
      .withColumn("oob_pred", when(col("oob_votes") === 0L, lit(null))
        .otherwise((col("oob_pos") * 2 >= col("oob_votes")).cast("long")))
      .drop(features.indices.map(i => s"_fb$i"): _*)
  }
}
