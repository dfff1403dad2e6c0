package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object SccProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.session.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select("doc_id")
    val base = (col("doc_id") - col("doc_id") % 10)
    def ringEdge(off: Int) = d.select(col("doc_id").as("src"),
      (base + (col("doc_id") % 10 + off) % 10).as("dst"))
    val cycle = ringEdge(1).unionByName(ringEdge(3))
    val bridges = d.where(col("doc_id") % 20 === 0)
      .select(col("doc_id").as("src"), (col("doc_id") + 10).as("dst"))
      .join(d.select(col("doc_id").as("dst")), Seq("dst"), "left_semi")
    val edges = cycle.unionByName(bridges)
    val t0 = System.nanoTime()
    val r = graft.operators.Scc.assign(edges)
    println(s"rows=${r.count()} t=${(System.nanoTime()-t0)/1e9}")
    spark.stop()
  }
}
