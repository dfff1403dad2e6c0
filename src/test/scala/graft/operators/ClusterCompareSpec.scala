package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusterCompareSpec extends SparkSpec {

  import spark.implicits._

  private def asg(pairs: (Long, Int)*) =
    pairs.toSeq.toDF("vec_id", "cluster_id")

  test("identical partitions score ARI 1 and NMI 1") {
    val a = asg(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1)
    val r = Clustering.compareClusterings(a, a).head()
    assert(r.getLong(0) === 4L)
    assert(r.getDouble(2) === 1.0)
    assert(r.getDouble(3) === 1.0)
  }

  test("label permutation does not matter") {
    val a = asg(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1)
    val b = asg(1L -> 7, 2L -> 7, 3L -> 2, 4L -> 2)
    val r = Clustering.compareClusterings(a, b).head()
    assert(r.getDouble(2) === 1.0 && r.getDouble(3) === 1.0)
  }

  test("one trivial side: ARI 0, NMI null (zero entropy)") {
    val a = asg(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1)
    val b = asg(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 0)
    val r = Clustering.compareClusterings(a, b).head()
    assert(r.getDouble(2) === 0.0)
    assert(r.isNullAt(3))
  }

  test("hand-computed half-agreement ARI") {
    // a: {1,2}{3,4}; b: {1,3}{2,4} — fully crossed: every cell n=1
    // index=0, Σa=Σb=2, C(4,2)=6 → exp=2/3, max=2
    // ari = (0-2/3)/(2-2/3) = -0.5
    val a = asg(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1)
    val b = asg(1L -> 0, 2L -> 1, 3L -> 0, 4L -> 1)
    val r = Clustering.compareClusterings(a, b).head()
    assert(r.getDouble(2) === -0.5)
    // fully crossed partitions share no information
    assert(r.getDouble(3) === 0.0)
  }
}
