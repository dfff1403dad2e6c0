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

  test("incremental ≡ cold on appended edges; a new edge bridges two old components") {
    // old graph: two chains 0-1-2-3 and 10-11-12, one isolated pair 20-21
    val oldE = Seq((1L, 0L), (2L, 1L), (3L, 2L), (11L, 10L), (12L, 11L),
      (21L, 20L))
    val prev = ConnectedComponents.assign(oldE.toDF("doc_a", "doc_b"))
    // batch: a BRIDGE between the two old components (3-10), an edge
    // internal to an old component (0-2, must be a no-op), a new node
    // attaching to an old component (21-30), and a fully-new pair (40-41)
    val batch = Seq((3L, 10L), (0L, 2L), (21L, 30L), (40L, 41L))
    val inc = ConnectedComponents
      .incremental(prev, batch.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cold = got(oldE ++ batch)
    assert(inc === cold, s"incremental diverged from cold:\n$inc\nvs\n$cold")
    // the bridge genuinely merged: both old chains now label at 0
    assert(inc(10L) === 0L && inc(12L) === 0L && inc(3L) === 0L)
    // new node joined the old 20-component; the new pair stands alone
    assert(inc(30L) === 20L && inc(40L) === 40L && inc(41L) === 40L)
  }

  test("incremental with an all-internal batch changes nothing") {
    val oldE = Seq((1L, 0L), (2L, 1L), (11L, 10L))
    val prev = ConnectedComponents.assign(oldE.toDF("doc_a", "doc_b"))
    val inc = ConnectedComponents
      .incremental(prev, Seq((2L, 0L), (10L, 11L)).toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = prev.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc === base)
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
