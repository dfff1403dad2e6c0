package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Greedy maximum-coverage selection — the SUBMODULAR data-selection
  * primitive next to [[Coreset.kCenters]]' geometric one: pick k
  * documents whose element sets (vocabulary, n-grams, covered topics)
  * jointly cover the most ground, where each round's winner is the doc
  * adding the most NOT-YET-COVERED elements. The greedy sweep is the
  * classic (1 − 1/e)-approximation (Nemhauser–Wolsey–Fisher 1978) and
  * is exactly "choose a small eval/seed panel that exercises the most
  * vocabulary" / "pick k exemplar docs that span the corpus".
  *
  * Determinism contract: gains are exact longs; ties break to the
  * smaller doc id; selected docs are excluded from later rounds (their
  * residual gain is 0 by construction, but exclusion also pins the
  * tie order); a round where every remaining doc has gain 0 still
  * selects (the lowest remaining id) so the output is always k rows —
  * the oracle replays each round's argmax verbatim.
  *
  * Scale shape: the doc–element frame is de-duplicated ONCE and
  * cached; each of the k rounds is one left_anti join against the
  * covered-element set (itself a semi-join of the same frame on the
  * ≤k-id selection literal — broadcast-friendly by construction), one
  * partial-aggregable count to doc grain, and ONE driver row (the
  * winner). k is small (a panel, not a corpus), so total cost is
  * k scans of the element frame — never pairwise, never a window.
  */
object SetCover {

  /** (rank, id, gain, covered) — selection order, the winner's new
    * elements that round, and the running covered-element total.
    */
  def greedyCoverage(pairs: DataFrame, id: Column, elem: Column,
                     k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = pairs.sparkSession
    val de = pairs.select(id.cast("long").as("id"), elem.as("elem"))
      .where(col("id").isNotNull && col("elem").isNotNull)
      .distinct()
      .localCheckpoint(false)
    var selected = List.empty[Long]
    val out = Seq.newBuilder[(Long, Long, Long, Long)]
    var covered = 0L
    var r = 1
    while (r <= k) {
      val coveredElems = de.where(col("id").isin(selected: _*)).select("elem")
      val gains = de
        .where(!col("id").isin(selected: _*))
        .join(coveredElems.distinct(), Seq("elem"), "left_anti")
        .groupBy("id").agg(count(lit(1)).as("gain"))
      // zero-gain docs drop out of the census; re-attach them so the
      // all-covered tail still selects deterministically by id
      val rest = de.select("id").distinct()
        .where(!col("id").isin(selected: _*))
        .join(gains, Seq("id"), "left")
        .select(col("id"), coalesce(col("gain"), lit(0L)).as("gain"))
        .orderBy(col("gain").desc, col("id").asc)
        .limit(1).collect()
      if (rest.isEmpty) r = k + 1
      else {
        val w = rest.head
        val (wid, wgain) = (w.getLong(0), w.getLong(1))
        covered += wgain
        out += ((r.toLong, wid, wgain, covered))
        selected = wid :: selected
        r += 1
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out.result().map {
        case (a, b, c, d) => Row(a, b, c, d)
      }, 1),
      StructType(Seq(StructField("rank", LongType), StructField("id", LongType),
        StructField("gain", LongType), StructField("covered", LongType))))
  }
}
