package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session — ONE PER JVM, not per suite: getOrCreate
  * returns the first suite's session, so later suites' .config calls are
  * no-ops and session state (temp views, registered functions) is shared
  * across suites. Tests must not assume a fresh session. (Reference
  * analog: SparkSessionSetup — /root/reference .. LoadersTest.scala:20-32.)
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .withExtensions(new graft.session.GraftExtensions)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // same as EngineSession: naive parquet timestamps read as LTZ (UTC)
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    .config("spark.ui.enabled", "false")
    // managed tables (bucketing specs) land in tmp, not the repo tree
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
    .getOrCreate()

  def resource(name: String): String =
    getClass.getClassLoader.getResource(name).getPath
}
