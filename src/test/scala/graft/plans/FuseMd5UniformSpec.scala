package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuseMd5UniformSpec extends SparkSpec {

  import spark.implicits._

  private def composed(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10)

  /** Reference value straight from the contract's definition: parse the
    * first 15 hex chars of the md5 hex digest, base 16.
    */
  private def reference(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.map(b => f"$b%02x").mkString.substring(0, 15), 16)
  }

  test("fused long cast equals the hex-parse definition") {
    val rows = Seq("", "a", "dsir:42:17", "boot:7:3:99", "日本語テキスト")
    val out = rows.toDF("s")
      .select(col("s"), composed(col("s")).cast("long").as("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { s =>
      assert(out(s) === reference(s), s"mismatch for '$s'")
    }
  }

  test("double and string casts agree with the long kernel") {
    val df = Seq("x", "y").toDF("s").select(
      composed(col("s")).cast("long").as("l"),
      composed(col("s")).cast("double").as("d"),
      composed(col("s")).as("st"))
    df.collect().foreach { r =>
      assert(r.getDouble(1) === r.getLong(0).toDouble)
      assert(r.getString(2) === r.getLong(0).toString)
    }
  }

  test("the optimizer actually rewrites: md5_prefix60 in, conv out") {
    // parquet-backed (a literal frame constant-folds away before the
    // plan can be inspected)
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), (composed(col("text")).cast("double") / 2.0).as("u"),
        composed(col("text")).cast("long").as("l"))
    val plan = docs.queryExecution.optimizedPlan.toString
    assert(plan.contains("md5_prefix60"),
      s"fused kernel missing from the optimized plan:\n$plan")
    assert(!plan.toLowerCase.contains("conv("),
      s"composed conv survived the rewrite:\n$plan")
    // and the rewritten plan still computes the right values
    docs.limit(20).collect().foreach { r =>
      assert(r.getDouble(1) === r.getLong(2).toDouble / 2.0)
    }
  }

  test("non-matching conv calls are left alone") {
    val df = Seq("ff").toDF("s").select(conv(col("s"), 16, 10).as("v"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.toLowerCase.contains("conv(") || df.head().getString(0) == "255")
    assert(df.head().getString(0) === "255")
  }
}
