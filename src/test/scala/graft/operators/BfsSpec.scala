package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

class BfsSpec extends SparkSpec {

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }
  private def seeds(ids: Long*) = {
    import spark.implicits._
    ids.toDF("node")
  }
  private def result(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain distances from a single seed") {
    val d = Bfs.distances(edges(0L -> 1L, 1L -> 2L, 2L -> 3L), seeds(0L), 10)
    assert(result(d) === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("maxHops caps the reach — filtering semantics") {
    val d = Bfs.distances(edges(0L -> 1L, 1L -> 2L, 2L -> 3L), seeds(0L), 2)
    assert(result(d) === Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
  }

  test("multi-source takes the nearest seed; direction is respected") {
    // 0 -> 1 -> 2 -> 3 -> 4 with seeds {0, 3}: node 2 is 2 hops from 0
    // (3 cannot reach it backwards), node 4 is 1 hop from 3
    val d = Bfs.distances(
      edges(0L -> 1L, 1L -> 2L, 2L -> 3L, 3L -> 4L), seeds(0L, 3L), 10)
    assert(result(d) ===
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 0L, 4L -> 1L))
  }

  test("cycles terminate and keep the first arrival") {
    val d = Bfs.distances(edges(0L -> 1L, 1L -> 2L, 2L -> 0L), seeds(0L), 50)
    assert(result(d) === Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
  }

  test("unreachable nodes are absent; duplicate seeds tolerated") {
    val d = Bfs.distances(edges(0L -> 1L, 5L -> 6L), seeds(0L, 0L), 10)
    assert(result(d) === Map(0L -> 0L, 1L -> 1L))
  }

  test("maxHops = 0 returns the seeds only") {
    val d = Bfs.distances(edges(0L -> 1L), seeds(0L), 0)
    assert(result(d) === Map(0L -> 0L))
  }
}
