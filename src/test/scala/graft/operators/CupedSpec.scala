package graft.operators

import graft.SparkSpec

class CupedSpec extends SparkSpec {

  import spark.implicits._

  test("perfectly predictive covariate removes nearly all variance") {
    // y = x + small arm effect; x varies a lot between users
    val units = (1 to 40).map { i =>
      val arm = i % 2
      val x = 1000L * (i / 2)
      (arm, x, x + (if (arm == 0) 500L else 0L))
    }.toDF("arm", "x_micro", "y_micro")
    val r = Cuped.zTest(units).head()
    assert(r.getLong(0) === 20L && r.getLong(1) === 20L)
    val theta = r.getDouble(2)
    assert(math.abs(theta - 1.0) < 0.01, s"theta should be ~1, got $theta")
    // raw z can't see the 500-micro effect under 1000-step noise;
    // adjusted z must (variance nearly eliminated)
    assert(math.abs(r.getDouble(3)) < 2.0, "raw z should be weak")
    assert(math.abs(r.getDouble(4)) > 5.0, "adjusted z should be decisive")
    assert(r.getDouble(6) < 0.05, s"var_ratio should collapse, got ${r.getDouble(6)}")
  }

  test("constant covariate: theta = 0, adjusted equals raw") {
    val units = (1 to 20).map { i =>
      (i % 2, 7L, 100L + (i % 5) * 10L)
    }.toDF("arm", "x_micro", "y_micro")
    val r = Cuped.zTest(units).head()
    assert(r.getDouble(2) === 0.0)
    assert(r.getDouble(3) === r.getDouble(4), "z_adj must equal z_raw")
    assert(r.getDouble(6) === 1.0)
  }

  test("an arm below 2 units yields null z") {
    val units = Seq((0, 1L, 10L), (0, 2L, 20L), (1, 3L, 30L))
      .toDF("arm", "x_micro", "y_micro")
    val r = Cuped.zTest(units).head()
    assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5))
  }
}
