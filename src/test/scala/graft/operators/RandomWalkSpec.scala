package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RandomWalkSpec extends SparkSpec {

  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], w: Int, l: Int, seed: Long) =
    RandomWalk.walks(edges.toDF("src", "dst"), w, l, seed)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)) -> r.getLong(3))
      .toMap

  test("a chain walks deterministically and stops at the sink") {
    val out = run(Seq((1L, 2L), (2L, 3L)), w = 1, l = 5, seed = 7L)
    assert(out((1L, 1L, 0)) === 1L)
    assert(out((1L, 1L, 1)) === 2L)
    assert(out((1L, 1L, 2)) === 3L)
    assert(!out.contains((1L, 1L, 3)), "sink must end the walk")
    // the sink node still contributes its step-0 row
    assert(out((3L, 1L, 0)) === 3L)
  }

  test("branch choices replay the md5 formula exactly") {
    val out = run(Seq((1L, 10L), (1L, 20L)), w = 2, l = 1, seed = 42L)
    def pick(wid: Long): Long = {
      val key = s"rw:42:1:$wid:1"
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val u = java.lang.Long.parseLong(md5.substring(0, 15), 16)
      if (u % 2 == 0) 10L else 20L // idx 1 -> dst 10, idx 2 -> dst 20
    }
    assert(out((1L, 1L, 1)) === pick(1L))
    assert(out((1L, 2L, 1)) === pick(2L))
  }

  test("walk volume: every node starts W walks; duplicates edges ignored") {
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 1L))
    val df = RandomWalk.walks(edges.toDF("src", "dst"), 3, 4, 1L)
    assert(df.where(col("step") === 0).count() === 2 * 3)
    // 2-cycle: every walk runs the full length
    assert(df.count() === 2 * 3 * 5)
    // dedup means the only choice from 1 is 2 and vice versa
    assert(df.where(col("step") === 1 && col("start") === 1L)
      .select("node").distinct().head().getLong(0) === 2L)
  }

  test("runs are idempotent; a different seed changes some walk") {
    val edges = (0L until 30L).map(i => (i, (i * 7 + 1) % 30)) ++
      (0L until 30L).map(i => (i, (i * 11 + 2) % 30))
    val a = run(edges, 2, 4, 5L)
    val b = run(edges, 2, 4, 5L)
    assert(a === b)
    val c = run(edges, 2, 4, 6L)
    assert(a !== c)
  }
}
