package graft.operators

import graft.SparkSpec

class HitsSpec extends SparkSpec {
  import spark.implicits._

  test("one round on a star: center is the authority, leaves the hubs") {
    // 1->0, 2->0, 3->0
    val e = Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("src", "dst")
    val out = Hits.hits(e, iterations = 1)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // auth raw: node0 = 3e6, others 0 -> normalized: node0 = 1e6
    // hub raw: leaves = auth(0) = 1e6 each, node0 = 0 -> leaves 1e6
    assert(out(0L) == ((0L, 1000000L)), "center: pure authority")
    assert(out(1L) == ((1000000L, 0L)) && out(2L) == ((1000000L, 0L)) &&
      out(3L) == ((1000000L, 0L)), "leaves: pure hubs")
  }

  test("hand-computed second round on an asymmetric graph") {
    // 1->3, 2->3, 2->4: node3 has in-degree 2, node4 in-degree 1,
    // node2 out-degree 2 (the better hub)
    val e = Seq((1L, 3L), (2L, 3L), (2L, 4L)).toDF("src", "dst")
    val out = Hits.hits(e, iterations = 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // r1: authRaw 3=2e6, 4=1e6 -> auth 3=1e6, 4=500000
    //     hubRaw 1=1e6, 2=1.5e6 -> hub 1=666667, 2=1e6
    // r2: authRaw 3=hub1+hub2=1666667, 4=hub2=1e6
    //     -> auth 3=1e6, 4=round(1e6/1666667*1e6)=600000
    //     hubRaw 1=auth3=1e6, 2=auth3+auth4=1.6e6
    //     -> hub 1=round(1e6/1.6e6*1e6)=625000, 2=1e6
    assert(out(3L)._2 == 1000000L && out(4L)._2 == 600000L,
      s"authorities after 2 rounds: $out")
    assert(out(2L)._1 == 1000000L && out(1L)._1 == 625000L,
      s"hubs after 2 rounds: $out")
    assert(out(1L)._2 == 0L && out(2L)._2 == 0L, "sources have no authority")
    assert(out(3L)._1 == 0L && out(4L)._1 == 0L, "sinks are not hubs")
  }

  test("scores are input-partitioning-independent and replay exactly") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst")
    val a = Hits.hits(e, iterations = 5)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val b = Hits.hits(e.repartition(7).orderBy($"dst"), iterations = 5)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }
}
