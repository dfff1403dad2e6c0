package graft.tools
import graft._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries("e_ann_recall")(spark, sf)
      val r = df.agg(avg("recall_ann"), avg("recall_ivf"), count(lit(1))).head()
      println(f"$sf  ann=${r.getDouble(0)}%.3f ivf=${r.getDouble(1)}%.3f rows=${r.getLong(2)} (${(System.nanoTime()-t0)/1e9}%.1f s)")
    }
    spark.stop()
  }
}
