package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinkPredictionSpec extends SparkSpec {

  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], maxDegree: Long = 65536L) =
    LinkPrediction.adamicAdar(edges.toDF("src", "dst"), maxDegree)
      .orderBy("a", "b").collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap

  private def w(deg: Int): Long = math.round(1e6 / math.log(deg.toDouble))

  test("path a-b-c predicts (a,c) through b with weight 1/ln(2)") {
    val out = run(Seq((1L, 2L), (2L, 3L)))
    assert(out === Map((1L, 3L) -> ((1L, w(2)))))
  }

  test("two common neighbors sum; the rarer neighbor weighs more") {
    // 1 and 4 share w=2 (degree 2) and w=3 (degree 3, also tied to 5)
    val out = run(Seq((1L, 2L), (2L, 4L), (1L, 3L), (3L, 4L), (3L, 5L)))
    assert(out((1L, 4L)) === ((2L, w(2) + w(3))))
    assert(w(2) > w(3), "rarer neighbor must carry more weight")
  }

  test("existing edges are never scored; direction and dups don't matter") {
    // triangle 1-2-3: every pair is an edge, nothing to predict there;
    // edges arrive duplicated and in both directions
    val out = run(Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L),
      (1L, 3L), (1L, 3L), (3L, 4L)))
    assert(!out.contains((1L, 2L)) && !out.contains((1L, 3L)))
    // 4 shares neighbor 3 with 1 and 2
    assert(out((1L, 4L))._1 === 1L && out((2L, 4L))._1 === 1L)
  }

  test("held-out-edge AUC protocol: transitive graph scores high") {
    // path 4th power on 0..40: hold out (a+b)%5 edges, score the rest
    val edges = (0L until 40L).flatMap(d =>
      (1 to 4).map(k => (d, d + k))).filter(_._2 <= 40L)
    val canon = edges.toDF("src", "dst")
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b")).distinct()
    val test = canon.where((col("a") + col("b")) % 5 === 0)
    val train = canon.where((col("a") + col("b")) % 5 =!= 0)
    val cand = LinkPrediction.adamicAdar(
        train.select(col("a").as("src"), col("b").as("dst")))
      .select(col("a"), col("b"), col("aa_micro"))
    val labeled = cand
      .join(test.withColumn("_t", lit(1)), Seq("a", "b"), "full_outer")
      .select(coalesce(col("aa_micro"), lit(0L)).as("score_micro"),
        col("_t").isNotNull.as("label"))
    val auc = Evaluation.rocAuc(labeled).head().getDouble(2)
    assert(auc > 0.8, s"AUC $auc should reflect real transitivity")
  }

  test("maxDegree drops hub pivots but keeps the rest") {
    // star hub 0 touches 1..5 (degree 5); 1-6 and 2-6 give 6 a real pivot
    val star = (1L to 5L).map(n => (0L, n))
    val out = run(star ++ Seq((1L, 6L), (2L, 6L)), maxDegree = 4)
    // all pairs through the hub are gone; (1,2) survives via pivot 6
    // (degree 2) and (0,6) via pivots 1 and 2 (degree 2 each)
    assert(out.keySet === Set((1L, 2L), (0L, 6L)))
    assert(out((1L, 2L)) === ((1L, w(2))))
    assert(out((0L, 6L)) === ((2L, 2 * w(2))))
    // uncapped, the hub mints all C(5,2) pairs minus its own edges
    val full = run(star ++ Seq((1L, 6L), (2L, 6L)))
    assert(full.size === 10 + 1)
  }
}
