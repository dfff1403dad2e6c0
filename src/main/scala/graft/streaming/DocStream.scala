package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming document ingestion for a training-data pipeline: a document
  * stream is deduplicated against the already-ingested corpus AND within
  * itself before it is appended — the streaming counterpart of the batch
  * incremental-dedup path ([[graft.operators.Dedup.dedupAgainstExact]] /
  * the persisted fingerprint index).
  *
  * Batch/stream agnostic like [[EventStream]]: the same transform runs as
  * a batch query (what the correctness gate replays in SQL) or
  * incrementally under a streaming source.
  */
object DocStream {

  /** Documents not yet in the corpus, one survivor per content
    * fingerprint.
    *
    *  - new-vs-corpus: stream-static LEFT ANTI join on the md5 content
    *    fingerprint. The static side is re-read every micro-batch, so
    *    corpus compactions are picked up without restarting the query. No
    *    forced broadcast: at 100 TB the fingerprint index is itself large —
    *    leave the strategy to the planner (bucketed/partitioned parquet on
    *    fp makes it a co-located join; a bloom pre-filter is the
    *    documented next step if the index outgrows that).
    *  - in-stream collapse: streaming uses dropDuplicatesWithinWatermark
    *    (state bounded by the watermark horizon — an unbounded
    *    dropDuplicates grows state forever on an endless stream); batch
    *    uses plain dropDuplicates. Streaming input must therefore carry an
    *    event-time column `ts`.
    *
    * @param corpusFps one `fp` column (md5 hex) — the ingested corpus's
    *                  fingerprint set
    */
  def newUniqueDocs(docs: DataFrame, corpusFps: DataFrame,
                    textCol: String = "text",
                    watermark: String = "10 minutes"): DataFrame = {
    val fresh = docs
      .withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
      .join(corpusFps.select("fp"), Seq("fp"), "left_anti")
    if (docs.isStreaming)
      fresh.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(Seq("fp"))
    else fresh.dropDuplicates(Seq("fp"))
  }
}
