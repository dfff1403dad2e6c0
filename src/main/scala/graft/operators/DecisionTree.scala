package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Level-wise binned CART decision tree over integer features — the
  * nonlinear quality-classifier trainer of a data-curation pipeline
  * (the step after [[Classifier]]'s linear Naive Bayes when the junk
  * boundary isn't linear in the features: length×symbol-ratio
  * interactions, langid-score thresholds that differ per source).
  * Beyond-reference surface (SURVEY §2.13).
  *
  * The MLlib tree shape, re-derived: features are pre-binned into
  * `bins` fixed-width integer buckets, and each LEVEL costs exactly ONE
  * partial-aggregated shuffle producing the (node × feature × bin)
  * label histogram — a census bounded by 2^depth·F·bins rows REGARDLESS
  * of data size (map-side combine collapses every task to census
  * grain). The driver folds each level's census into split choices
  * (the [[Privacy.mondrian]] bounded-census discipline): per node the
  * best (feature, threshold-bin) by weighted Gini, computed as ONE
  * double chain from exact integer prefix sums, candidates ordered
  * (cost, feature, bin) so ties are deterministic and the
  * `v_tree_train` oracle replays every level's argmin verbatim. A node
  * leafs when pure, under 2·minLeaf rows, either child would be under
  * minLeaf, or no split strictly beats the parent impurity.
  *
  * Exactness / portability contract:
  *  - features must be INTEGER-valued (long) columns with a declared
  *    [lo, hi) domain — quantize floats upstream (the established
  *    micro discipline); binning is exact integer arithmetic
  *    (clamp, then (x−lo)·bins div (hi−lo));
  *  - histogram counts are exact longs; the Gini cost is the RATIONAL
  *    (aL·nR + aR·nL) / (nL·nR) with a = n² − pos² − neg², and split
  *    selection compares rationals by BigInt cross-multiplication —
  *    exact at ANY per-node row count, no Long wrap, no double
  *    rounding. The DuckDB oracle mirrors the comparison in HUGEINT
  *    (exact to ~3×10^7 rows/node — far past any gate fixture; the
  *    production side has no bound).
  *
  * 100 TB shape: `depth` scans of a localCheckpointed (bins…, label)
  * projection, each ONE census shuffle; driver traffic is the census,
  * never rows; scoring ([[DecisionTree.score]]) is a codegen'd nested
  * CASE chain — shuffle-free, broadcast-nothing.
  */
object DecisionTree {

  /** One tree row: a split (feature ≥ 0: go LEFT when
    * bin(feature) ≤ bin) or a leaf (feature = bin = −1). `n`/`pos` are
    * the node's row and positive-label counts.
    */
  final case class TreeNode(node: Long, kind: String, feature: Long,
                            bin: Long, n: Long, pos: Long)

  /** Exact integer floor division for NON-NEGATIVE operands: numerator
    * minus its pmod, then one exact double division (the quotient is an
    * exact small integer, so the double path is value-identical to an
    * integral divide on every engine).
    */
  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** Clamp to [lo, hi) then exact fixed-width bin in [0, bins). */
  def binColumn(c: Column, lo: Long, hi: Long, bins: Int): Column = {
    val clamped = least(greatest(c.cast("long"), lit(lo)), lit(hi - 1))
    idiv((clamped - lit(lo)) * bins, lit(hi - lo))
  }

  /** Train on `df`: `features` are (column, lo, hi) integer specs,
    * `label` a boolean/0-1 column. Returns the tree rows (bounded by
    * 2^(depth+1) nodes).
    */
  def train(df: DataFrame, label: Column, features: Seq[(Column, Long, Long)],
            depth: Int, bins: Int = 16, minLeaf: Long = 1): Seq[TreeNode] = {
    require(depth >= 1 && depth <= 12, s"depth must be in [1,12], got $depth")
    require(bins >= 2, s"bins must be >= 2, got $bins")
    require(minLeaf >= 1, s"minLeaf must be >= 1, got $minLeaf")
    require(features.nonEmpty, "need at least one feature")
    features.foreach { case (_, lo, hi) =>
      require(hi > lo, s"feature domain [$lo, $hi) is empty") }
    val f = features.size
    val binCols = features.zipWithIndex.map { case ((c, lo, hi), i) =>
      binColumn(c, lo, hi, bins).as(s"_b$i") }
    // lazy pin: level 0's census collect() materializes it in the same
    // job (eager paid a separate up-front materialization job)
    val base = df.select(binCols :+
        label.cast("boolean").cast("long").as("_y"): _*)
      .where(col("_y").isNotNull)
      .localCheckpoint(false)

    val out = scala.collection.mutable.ArrayBuffer.empty[TreeNode]
    var assigned = base.withColumn("_node", lit(1L))
    var level = 0
    var open = true
    while (level < depth && open) {
      val lowId = 1L << level
      // the level's ONE shuffle: (node × feature × bin) label histogram
      val census = assigned
        .where(col("_node") >= lowId)
        .select(col("_node"), col("_y"),
          posexplode(array((0 until f).map(i => col(s"_b$i")): _*))
            .as(Seq("_f", "_bin")))
        .groupBy("_node", "_f", "_bin")
        .agg(count(lit(1)).as("n"), sum("_y").as("p"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      val byNode = census.groupBy(_._1)
      val splits = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long)]
      for (node <- byNode.keys.toSeq.sorted) {
        val rows = byNode(node)
        val n = rows.filter(_._2 == 0).map(_._4).sum
        val pos = rows.filter(_._2 == 0).map(_._5).sum
        val parentNum = costNum(n, pos) // parent cost = parentNum / n
        // best = (num, den, fi, t, nL, pL); cost num/den compared by
        // exact BigInt cross-multiplication, ties broken (feature, bin)
        var best: Option[(BigInt, BigInt, Int, Long, Long, Long)] = None
        if (pos > 0 && pos < n && n >= 2 * minLeaf) {
          for (fi <- 0 until f) {
            val hist = Array.fill(bins)((0L, 0L))
            rows.filter(_._2 == fi).foreach { case (_, _, b, cn, cp) =>
              hist(b.toInt) = (cn, cp) }
            var nL = 0L; var pL = 0L
            var t = 0
            while (t <= bins - 2) {
              nL += hist(t)._1; pL += hist(t)._2
              val nR = n - nL; val pR = pos - pL
              if (nL >= minLeaf && nR >= minLeaf) {
                val num = costNum(nL, pL) * nR + costNum(nR, pR) * nL
                val den = BigInt(nL) * nR
                val better = best match {
                  case None => true
                  case Some((bn, bd, bf, bt, _, _)) =>
                    val lhs = num * bd; val rhs = bn * den
                    lhs < rhs || (lhs == rhs &&
                      (fi < bf || (fi == bf && t < bt)))
                }
                if (better) best = Some((num, den, fi, t.toLong, nL, pL))
              }
              t += 1
            }
          }
        }
        best match {
          case Some((num, den, fi, t, nL, pL)) if num * n < parentNum * den =>
            out += TreeNode(node, "split", fi.toLong, t, n, pos)
            splits += ((node, fi, t))
            if (level == depth - 1) {
              // children are final leaves — stats known from the split
              out += TreeNode(2 * node, "leaf", -1L, -1L, nL, pL)
              out += TreeNode(2 * node + 1, "leaf", -1L, -1L, n - nL, pos - pL)
            }
          case _ =>
            out += TreeNode(node, "leaf", -1L, -1L, n, pos)
        }
      }
      if (splits.isEmpty) open = false
      else {
        val reassign = splits.foldLeft(col("_node")) { case (acc, (k, fi, t)) =>
          when(col("_node") === k,
            lit(2 * k) + when(col(s"_b$fi") <= t, 0L).otherwise(1L))
            .otherwise(acc)
        }
        assigned = assigned.withColumn("_node", reassign)
      }
      level += 1
    }
    out.sortBy(_.node).toSeq
  }

  /** Gini numerator n − (pos² + neg²)/n, scaled by n: n² − pos² − neg².
    * BigInt — exact at any node size (n² wraps Long past ~3×10^9 rows).
    */
  private def costNum(n: Long, pos: Long): BigInt =
    BigInt(n) * n - BigInt(pos) * pos - BigInt(n - pos) * (n - pos)

  /** Tree rows as a DataFrame (gate / persistence surface). */
  def treeFrame(spark: org.apache.spark.sql.SparkSession,
                tree: Seq[TreeNode]): DataFrame = {
    import spark.implicits._
    tree.toDF()
  }

  /** Scoring: route every row to its leaf through the split table —
    * a driver-built nested CASE chain over the binned features
    * (shuffle-free, codegen'd; the tree is bounded so the expression
    * is too). Adds `leaf` (node id) to `df`.
    */
  def score(df: DataFrame, features: Seq[(Column, Long, Long)],
            tree: Seq[TreeNode], bins: Int = 16): DataFrame = {
    val splits = tree.filter(_.kind == "split")
      .map(t => t.node -> (t.feature.toInt, t.bin)).toMap
    val binned = features.zipWithIndex.map { case ((c, lo, hi), i) =>
      binColumn(c, lo, hi, bins).as(s"_b$i") }
    val withBins = df.select(col("*") +: binned: _*)
    val depth = if (splits.isEmpty) 0
      else (63 - java.lang.Long.numberOfLeadingZeros(splits.keys.max)) + 1
    var leaf: Column = lit(1L)
    for (l <- 0 until depth) {
      // fold only this level's splits: keeps the expression size
      // Π(level-l split count + 1) — bounded for any tree the depth
      // guard in train admits at the gates' depths
      val prev = leaf
      val lvl = splits.toSeq
        .filter { case (k, _) => k >= (1L << l) && k < (2L << l) }
        .sortBy(_._1)
      leaf = if (l == 0) {
        // the root is a literal 1 — branch directly instead of emitting
        // a trivially-true equals
        lvl.headOption.map { case (_, (fi, t)) =>
          (lit(2L) + when(col(s"_b$fi") <= t, 0L).otherwise(1L)): Column
        }.getOrElse(prev)
      } else lvl.foldLeft(prev) {
        case (acc, (k, (fi, t))) =>
          when(prev === k,
            lit(2 * k) + when(col(s"_b$fi") <= t, 0L).otherwise(1L))
            .otherwise(acc)
      }
    }
    withBins.withColumn("leaf", leaf)
      .drop(features.indices.map(i => s"_b$i"): _*)
  }
}
