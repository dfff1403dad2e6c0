package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted hyperplane-LSH bucket index for INCREMENTAL embedding-space
  * near-dedup — the embedding-side twin of [[SignatureIndex]], closing
  * the daily loop for semantic duplicates the way the signature index
  * closes it for lexical ones: today's increment is checked against the
  * stored corpus WITHOUT re-bucketing (or even re-reading) yesterday's
  * vectors, and the kept rows fold back with increment-proportional IO.
  *
  * The stored frame is (bucket, idCol, vecCol): the bucket key is the
  * seeded random-hyperplane sign pattern ([[Similarity.lshBuckets]] —
  * the same plane family every embedding-LSH oracle replays), and the
  * vector rides along because candidate verification is an exact cosine
  * (a signature index can verify from digests alone; cosine needs the
  * coordinates). At 100 TB the parquet lives partitioned by bucket, so
  * an increment's probe touches only its own buckets' files.
  *
  * Params (dim, planes, seed) are pinned in params.json exactly like
  * the signature index: probing with a different plane family would
  * silently produce empty candidate sets, so mismatches must fail at
  * read time, loudly.
  */
final case class EmbeddingIndex(buckets: DataFrame, dim: Int, planes: Int,
                                seed: Long, idCol: String = "vec_id",
                                vecCol: String = "embedding") {
  /** Eagerly cache the bucket frame (each increment probes it once per
    * batch; the daily loop touches it for probe + append).
    */
  def cached(): EmbeddingIndex = {
    buckets.cache().count()
    this
  }

  /** Fold an increment in-memory: the increment is bucketed under THIS
    * index's plane family and unioned on. id spaces must be disjoint
    * (same contract as the signature index). For an on-storage index use
    * [[EmbeddingIndex.appendTo]].
    */
  def append(newVecs: DataFrame): EmbeddingIndex =
    copy(buckets = buckets.unionByName(
      Dedup.embeddingBucketRows(newVecs, dim, planes, seed, idCol, vecCol)))

  def write(path: String): Unit = {
    buckets.write.mode("overwrite").parquet(s"$path/buckets")
    SignatureIndex.writeText(buckets.sparkSession, s"$path/params.json",
      s"""{"dim":$dim,"planes":$planes,"seed":$seed,"idCol":"$idCol","vecCol":"$vecCol"}""")
  }
}

object EmbeddingIndex {
  /** Persisted append: parquet-APPENDS only the increment's bucket rows;
    * the corpus-sized existing files are never read or rewritten.
    * Re-running after a crash is safe — duplicated bucket rows only
    * produce duplicate candidates, and the probe's `distinct()`
    * collapses them.
    */
  def appendTo(spark: SparkSession, path: String,
               newVecs: DataFrame): EmbeddingIndex = {
    val idx = read(spark, path)
    Dedup.embeddingBucketRows(newVecs, idx.dim, idx.planes, idx.seed,
        idx.idCol, idx.vecCol)
      .write.mode("append").parquet(s"$path/buckets")
    read(spark, path)
  }

  def read(spark: SparkSession, path: String): EmbeddingIndex = {
    val params = SignatureIndex.readTextFile(spark, s"$path/params.json")
    def num(name: String): Long =
      s""""$name":(-?\\d+)""".r.findFirstMatchIn(params)
        .map(_.group(1).toLong)
        .getOrElse(sys.error(s"EmbeddingIndex at $path: missing $name in params.json"))
    def str(name: String): String =
      s""""$name":"([^"]+)"""".r.findFirstMatchIn(params)
        .map(_.group(1))
        .getOrElse(sys.error(s"EmbeddingIndex at $path: missing $name in params.json"))
    EmbeddingIndex(spark.read.parquet(s"$path/buckets"),
      num("dim").toInt, num("planes").toInt, num("seed"),
      str("idCol"), str("vecCol"))
  }
}
