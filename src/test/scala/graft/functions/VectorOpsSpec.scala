package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The fused vector expressions have two execution paths — interpreted
  * nullSafeEval (used e.g. under Filter before codegen kicks in) and
  * doGenCode (whole-stage codegen). DataOps end-to-end specs exercise the
  * codegen path; this spec pins the interpreted path and cross-checks both
  * against each other and a hand computation, including mixed
  * float/double operands.
  */
class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  private def litArr(xs: Seq[Double]): Literal =
    Literal.create(new GenericArrayData(xs.toArray[Any]), ArrayType(DoubleType, false))

  private def litArrF(xs: Seq[Float]): Literal =
    Literal.create(new GenericArrayData(xs.toArray[Any]), ArrayType(FloatType, false))

  test("interpreted eval: dot and cosine match hand computation") {
    val a = Seq(1.0, 2.0, 3.0); val b = Seq(4.0, -5.0, 6.0)
    val dot = ArrayDot(litArr(a), litArr(b)).eval(null).asInstanceOf[Double]
    assert(dot === (4.0 - 10.0 + 18.0))
    val cos = CosineSimilarity(litArr(a), litArr(b)).eval(null).asInstanceOf[Double]
    val expected = dot / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(cos - expected) < 1e-12)
  }

  test("interpreted eval: mixed float/double operands") {
    val dot = ArrayDot(litArrF(Seq(1.0f, 2.0f)), litArr(Seq(3.0, 4.0)))
      .eval(null).asInstanceOf[Double]
    assert(dot === 11.0)
  }

  test("codegen path agrees with interpreted on float vectors") {
    val df = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
      (Seq(-1.0f, 0.0f, 2.5f), Seq(2.0f, -3.0f, 0.5f))
    ).toDF("a", "b")
    val rows = df.select(
      VectorOps.dot($"a", $"b").as("dot"),
      VectorOps.cosine($"a", $"b").as("cos")).collect()
    val interp = df.collect().map { r =>
      val a = r.getSeq[Float](0).map(_.toDouble); val b = r.getSeq[Float](1).map(_.toDouble)
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val cos = dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      (dot, cos)
    }
    rows.zip(interp).foreach { case (row, (dot, cos)) =>
      assert(math.abs(row.getDouble(0) - dot) < 1e-9)
      assert(math.abs(row.getDouble(1) - cos) < 1e-9)
    }
  }

  test("length mismatch raises instead of silently truncating") {
    val e = intercept[Exception] {
      ArrayDot(litArr(Seq(1.0, 2.0)), litArr(Seq(1.0, 2.0, 3.0))).eval(null)
    }
    assert(e.getMessage.contains("length mismatch"))
    // codegen path too
    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val e2 = intercept[Exception] {
      spark.read.parquet {
        val d = java.nio.file.Files.createTempDirectory("vlen").toString
        df.write.mode("overwrite").parquet(d); d
      }.select(VectorOps.dot($"a", $"b")).collect()
    }
    // the mismatch message must survive Spark's exception wrapping
    val messages = Iterator.iterate(e2: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(messages.exists(_.contains("length mismatch")), messages.mkString(" | "))
  }

  test("zero vector yields NaN cosine (0/0), not an error") {
    val v = CosineSimilarity(litArr(Seq(0.0, 0.0)), litArr(Seq(1.0, 1.0)))
      .eval(null).asInstanceOf[Double]
    assert(v.isNaN)
  }

  test("expressions survive Column round-trip and filters") {
    val df = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)), (3L, Seq(1.0f, 1.0f)))
      .toDF("id", "v")
    val close = df
      .where(VectorOps.cosine($"v", GraftBridge.column(litArr(Seq(1.0, 0.0)))) > 0.5)
      .select("id").as[Long].collect().toSet
    assert(close === Set(1L, 3L))
  }
}
