package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ForestSpec extends SparkSpec {

  import spark.implicits._

  private def fixture = (0L until 300L).map { i =>
    (i, i % 100, (i * 37 + 11) % 199, (i % 100) >= 55 || i % 17 == 0)
  }.toDF("id", "x", "noise", "y")

  private val feats = Seq(
    (col("x"), 0L, 100L), (col("noise"), 0L, 199L))

  test("feature subsets are deterministic, sized, in range, and tree-varying") {
    val s1 = Forest.featureSubsets(8, 4, 2)
    assert(s1 == Forest.featureSubsets(8, 4, 2))
    assert(s1.forall(fs => fs.size == 2 && fs == fs.sorted &&
      fs.forall(f => f >= 0 && f < 4)))
    assert(s1.distinct.size > 1, "all trees drew the same subset")
  }

  test("bag draw is a ~p Bernoulli keyed on (tree, row)") {
    val n = 2000
    val ids = (0L until n.toLong).toDF("id")
    val in0 = ids.where(Forest.bagged(col("id"), 0, 700000L)).count()
    val in1 = ids.where(Forest.bagged(col("id"), 1, 700000L)).count()
    assert(math.abs(in0 - 1400) < 100, s"tree-0 bag $in0 far from 1400")
    assert(in0 != in1, "different trees must draw different bags")
  }

  test("members carry GLOBAL feature indices from their subset") {
    val forest = Forest.train(fixture, col("y"), feats, col("id"),
      nTrees = 4, perTree = 1, depth = 2, bins = 10, minLeaf = 5)
    assert(forest.size == 4)
    for (m <- forest; n <- m.nodes if n.kind == "split")
      assert(m.features.contains(n.feature.toInt),
        s"tree ${m.tree} split on feature ${n.feature} outside ${m.features}")
  }

  test("vote = per-tree leaf-class majority; OOB tallies match the bag draws") {
    val df = fixture
    val forest = Forest.train(df, col("y"), feats, col("id"),
      nTrees = 3, perTree = 2, depth = 2, bins = 10, minLeaf = 5)
    val got = Forest.vote(df, feats, forest, col("id"), bins = 10)
      .select("id", "votes_pos", "pred", "oob_votes", "oob_pos", "oob_pred")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) -1L else r.getLong(5))).toMap

    // driver-side re-derivation: route each row through each member
    val rows = df.select("id", "x", "noise").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def bin(v: Long, lo: Long, hi: Long, bins: Int): Long = {
      val c = math.min(math.max(v, lo), hi - 1)
      (c - lo) * bins / (hi - lo)
    }
    val bagSets = forest.map { m =>
      df.where(Forest.bagged(col("id"), m.tree, 700000L))
        .select("id").collect().map(_.getLong(0)).toSet
    }
    for ((id, x, noise) <- rows.take(80)) {
      val bins10 = Seq(bin(x, 0, 100, 10), bin(noise, 0, 199, 10))
      val preds = forest.map { m =>
        val splits = m.nodes.filter(_.kind == "split")
          .map(n => n.node -> (n.feature.toInt, n.bin)).toMap
        var node = 1L
        var continue = true
        while (continue) splits.get(node) match {
          case Some((f, t)) => node = 2 * node + (if (bins10(f) <= t) 0 else 1)
          case None => continue = false
        }
        val leaf = m.nodes.find(n => n.kind == "leaf" && n.node == node).get
        if (2 * leaf.pos >= leaf.n) 1L else 0L
      }
      val (vp, pred, ov, op, opd) = got(id)
      assert(vp == preds.sum, s"row $id votes")
      assert(pred == (if (2 * preds.sum >= 3) 1L else 0L), s"row $id pred")
      val oobIdx = forest.indices.filterNot(t => bagSets(t).contains(id))
      assert(ov == oobIdx.size.toLong, s"row $id oob_votes")
      assert(op == oobIdx.map(preds).sum, s"row $id oob_pos")
      if (oobIdx.isEmpty) assert(opd == -1L, s"row $id oob_pred not null")
      else assert(opd == (if (2 * oobIdx.map(preds).sum >= oobIdx.size) 1L else 0L))
    }
  }

  test("forest learns the separable part: in-bag and OOB accuracy high") {
    // boundary on a bin edge (60 with width-10 bins) so the learnable
    // part is exactly expressible
    val df = (0L until 500L).map { i =>
      (i, i % 100, (i * 37 + 11) % 199, (i % 100) >= 60)
    }.toDF("id", "x", "noise", "y")
    val forest = Forest.train(df, col("y"), feats, col("id"),
      nTrees = 5, perTree = 2, depth = 3, bins = 10, minLeaf = 5)
    val v = Forest.vote(df, feats, forest, col("id"), bins = 10)
      .select(col("y").cast("long").as("y"), col("pred"), col("oob_pred"))
      .collect()
    val acc = v.count(r => r.getLong(0) == r.getLong(1)).toDouble / v.length
    assert(acc > 0.95, s"in-bag accuracy $acc")
    val oob = v.filter(!_.isNullAt(2))
    val oobAcc = oob.count(r => r.getLong(0) == r.getLong(2)).toDouble /
      math.max(oob.length, 1)
    assert(oobAcc > 0.9, s"OOB accuracy $oobAcc over ${oob.length} rows")
  }

  test("argument guards") {
    val df = fixture
    intercept[IllegalArgumentException](Forest.train(df, col("y"), feats,
      col("id"), nTrees = 0, perTree = 1, depth = 1))
    intercept[IllegalArgumentException](Forest.train(df, col("y"), feats,
      col("id"), nTrees = 1, perTree = 3, depth = 1))
    intercept[IllegalArgumentException](Forest.vote(df, feats, Seq.empty,
      col("id")))
  }
}
