package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequence packing for LLM training: group documents into packs whose
  * token totals stay within a fixed budget (the classic pre-tokenization
  * step that turns a document corpus into fixed-length training rows).
  *
  * Exact greedy packing is a sequential recurrence (each pack boundary
  * depends on the full prefix), which cannot be a window expression and
  * must not be a driver loop. The scalable contract: documents are packed
  * greedily IN idCol ORDER WITHIN EACH PARTITION, with partition-unique
  * pack ids — embarrassingly parallel, deterministic for a fixed
  * partitioning, and the per-partition boundary waste is at most one
  * underfull pack per partition (negligible when partitions hold
  * thousands of documents). `repartitionByRange(1, col(idCol))` upstream
  * recovers the globally-sequential packing (the oracle gate does this;
  * a 100 TB run uses the partition-parallel form).
  *
  * This is the one justified `mapPartitions` shape (per-partition
  * sequential state, like the multimodal decoder): a streaming iterator
  * carrying (pack, used) — no partition materialization, no collect.
  */
object Packing {

  /** @param docs     frame carrying idCol + tokenCol
    * @param budget   max token sum per pack; a document alone larger than
    *                 the budget gets its own (overflowing) pack
    * @param idCol    long id defining the packing order within a partition
    * @param tokenCol long token count per document
    * @return (idCol, n_tokens, pack_id) — pack_id unique across partitions
    */
  def packGreedy(docs: DataFrame, budget: Long, idCol: String = "doc_id",
                 tokenCol: String = "n_tokens"): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("pack_id", LongType, nullable = false)))
    docs
      .select(col(idCol).cast("long"), col(tokenCol).cast("long").as("n_tokens"))
      .sortWithinPartitions(idCol)
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId().toLong
        // partition-unique pack ids: high bits = partition, low = local
        var pack = pid << 40
        var used = 0L
        var first = true
        it.map { r =>
          val id = r.getLong(0); val n = r.getLong(1)
          if (first) { used = n; first = false }
          else if (used + n > budget) { pack += 1; used = n }
          else used += n
          Row(id, n, pack)
        }
      }(Encoders.row(outSchema))
  }

  /** Pack-level summary (packs, fill rate) — the number a pipeline tunes
    * budget against.
    */
  def packStats(packed: DataFrame, budget: Long): DataFrame =
    packed.groupBy("pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tokens"))
      .agg(count(lit(1)).as("n_packs"),
        round(avg(col("tokens")) / budget.toDouble, 6).as("mean_fill"),
        max("tokens").as("max_tokens"))
}
