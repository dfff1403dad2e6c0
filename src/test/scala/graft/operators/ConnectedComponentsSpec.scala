package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Correctness of the large-star/small-star closure against a driver-side
  * union-find oracle on random graphs, plus shape-specific cases (chains,
  * stars, forests, null/self edges) that stress the iteration.
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side union-find for the expected assignment. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // root = min id of the component by construction of the union above
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def got(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.assign(edges.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("random graphs match union-find") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 60 + trial * 40
      val edges = Seq.fill(n)((rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
        .filter { case (a, b) => a != b }
      assert(got(edges) == unionFind(edges), s"trial $trial diverged")
    }
  }

  test("deep chain collapses to its minimum") {
    val edges = (1L until 64L).map(i => (i, i - 1))
    val g = got(edges)
    assert(g.size == 64 && g.values.forall(_ == 0L))
  }

  test("disjoint stars and a bridge") {
    // two stars (0←1..5, 10←11..15), then a bridge 5—11 merges them
    val stars = (1L to 5L).map((_, 0L)) ++ (11L to 15L).map((_, 10L))
    val g1 = got(stars)
    assert(g1.filter(_._1 <= 5).values.forall(_ == 0L))
    assert(g1.filter(_._1 >= 10).values.forall(_ == 10L))
    val g2 = got(stars :+ (5L, 11L))
    assert(g2.values.forall(_ == 0L))
  }

  test("self-loops and null endpoints are ignored") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 1L), (null, 2L), (3L, null), (4L, 5L))
      .toDF("doc_a", "doc_b")
    val g = ConnectedComponents.assign(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g == Map(4L -> 4L, 5L -> 4L))
  }

  test("assign(reliable = true): checkpointed rounds ≡ default rounds") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(120)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      intercept[IllegalArgumentException] {
        ConnectedComponents.assign(edges.toDF("doc_a", "doc_b"), reliable = true)
      }
      spark.sparkContext.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString)
    }
    val rel = ConnectedComponents
      .assign(edges.toDF("doc_a", "doc_b"), reliable = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rel == got(edges))
  }

  test("dedupClusters: every doc gets exactly one cluster; copies collapse") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // exact copy of 1
      (3L, "totally different content here now"),
      (4L, "alpha beta gamma delta epsilon"), // another copy of 1
      (5L, "")                                  // empty text: own cluster
    ).toDF("doc_id", "text")
    val out = Dedup.dedupClusters(docs, threshold = 1.0)
    val m = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(m.length == 5, "one row per doc")
    val byId = m.map(t => t._1 -> t._2).toMap
    assert(byId(1L) == 1L && byId(2L) == 1L && byId(4L) == 1L)
    assert(byId(3L) == 3L && byId(5L) == 5L)
    assert(m.count(_._3) == 3, "three survivors (clusters {1,2,4},{3},{5})")
  }
}
