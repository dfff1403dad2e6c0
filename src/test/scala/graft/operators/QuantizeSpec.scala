package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalactic.Tolerance._

class QuantizeSpec extends SparkSpec {

  private def vecsDf(rows: Seq[(Long, Seq[Float])]): DataFrame = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, v) => Row(id, v) }),
      schema)
  }

  test("int8: max-abs element maps to ±127, zero vector to zeros") {
    val df = vecsDf(Seq(
      (0L, Seq(0.5f, -1.0f, 0.25f)),
      (1L, Seq(0f, 0f, 0f))))
    val rows = Quantize.int8(df).orderBy("vec_id").collect()
    val q0 = rows(0).getSeq[Int](2)
    assert(q0(1) === -127, "the max-abs element saturates")
    assert(q0(0) === 64 && q0(2) === 32) // round(0.5*127)=64, round(0.25*127)=32
    assert(rows(0).getDouble(1) === (1.0 / 127.0) +- 1e-9) // scale rounds to 9dp
    assert(rows(1).getSeq[Int](2) === Seq(0, 0, 0))
    assert(rows(1).getDouble(1) === 0.0)
  }

  test("dequantized values stay within half a quantization step") {
    val df = vecsDf(Seq(
      (0L, Seq(0.31f, -0.77f, 0.05f, 0.99f)),
      (1L, Seq(12f, -3f, 0.5f, 7.25f))))
    Quantize.int8(df).collect().foreach { r =>
      val scale = r.getDouble(1)
      val q = r.getSeq[Int](2)
      val orig = df.where(col("vec_id") === r.getLong(0))
        .head().getSeq[Float](1)
      q.zip(orig).foreach { case (qi, oi) =>
        assert(math.abs(qi * scale - oi) <= scale / 2 + 1e-9,
          s"|dequant - orig| bounded by scale/2: q=$qi scale=$scale orig=$oi")
      }
    }
  }

  test("quantized cosine approximates float cosine (recall@10 on real embeddings)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.where(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(emb, q, k = 10)
      .select("query_id", "neighbor_id")
    val quant = Quantize.quantizedTopK(emb, q, k = 10)
      .select("query_id", "neighbor_id")
    val hits = exact.join(quant, Seq("query_id", "neighbor_id"), "left_semi").count()
    val total = exact.count()
    assert(total > 0)
    // int8 keeps ~2 decimal digits of cosine — overlap should be near-total
    assert(hits.toDouble / total >= 0.8,
      s"quantized recall@10 degraded: $hits/$total")
  }

  test("quantized cosine of a vector with its own copy is 1") {
    val df = vecsDf(Seq((0L, Seq(0.3f, -0.2f, 0.9f)), (1L, Seq(0.3f, -0.2f, 0.9f))))
    val top = Quantize.quantizedTopK(df, df.where(col("vec_id") === 0), k = 1)
      .head()
    assert(top.getLong(1) === 1L)
    assert(top.getDouble(2) === 1.0)
  }
}
