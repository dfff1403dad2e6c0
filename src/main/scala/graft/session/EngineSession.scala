package graft.session

import org.apache.spark.sql.SparkSession

/** SparkSession factory — the reference's ETLSessionContext
  * (/root/reference .. config/ETLSessionContext.scala:16-33): same conf
  * (maxResultSize=0, maxToStringFields=2000, optional master URI) plus the
  * settings a Spark-4 deployment wants pinned (UTC, AQE on, sized shuffle
  * partitions instead of the 200 default).
  */
object EngineSession {

  def build(appName: String = "graft",
            masterUri: Option[String] = None,
            shufflePartitions: Int = 32): SparkSession = {
    val b = SparkSession.builder()
      .appName(appName)
      .withExtensions(new GraftExtensions)
      .config("spark.driver.maxResultSize", "0")
      .config("spark.debug.maxToStringFields", "2000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // parquet `timestamp[us]` with no timezone must read as TIMESTAMP
      // (LTZ), not TIMESTAMP_NTZ: the session tz is pinned UTC so the
      // wall-clock values match a naive reader (the DuckDB oracle), and
      // unix_micros()/window() accept the column without casts.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    // reference default: spark-uri local[*] (application.conf:1); under
    // spark-submit the launcher-provided master wins over this default
    val master = masterUri.orElse(sys.props.get("spark.master")).getOrElse("local[*]")
    b.master(master).getOrCreate()
  }
}
