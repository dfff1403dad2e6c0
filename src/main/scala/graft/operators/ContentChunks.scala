package graft.operators

import graft.functions.GearChunks
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking of documents into a chunk table — the
  * storage/delta-dedup grain between document-level fingerprints
  * ([[Dedup]]) and token-window shingles ([[SpanDedup]]): chunk
  * fingerprints survive insert/delete edits (boundaries re-align one
  * chunk after the edit, see [[graft.functions.GearChunks]]) so
  * cross-version and cross-document chunk reuse is visible as plain
  * fingerprint equality.
  *
  * Scale shape: boundary discovery is a codegen'd projection (one pass
  * over codepoints, no shuffle); the chunk table is output-proportional
  * (Σ chunks, each row carrying positions + one md5 — never the chunk
  * text unless asked); any downstream dedup joins on the 16-byte
  * digest, the [[Dedup]] discipline.
  */
object ContentChunks {

  /** (id, chunk_idx, start_pos, chunk_len, chunk_md5) — positions in
    * codepoints, start 0-based, md5 over the chunk substring. Rows with
    * null/empty text produce no chunks.
    */
  def chunks(df: DataFrame, id: Column, text: Column, minLen: Int,
             maskBits: Int, maxLen: Int): DataFrame = {
    val ends = GearChunks.gearChunks(text, minLen, maskBits, maxLen)
    df.select(id.as("id"), text.as("_t"), ends.as("_e"))
      .where(col("_t").isNotNull && size(col("_e")) > 0)
      .select(col("id"), col("_t"),
        posexplode(arrays_zip(
          concat(array(lit(0L)), slice(col("_e"), lit(1), size(col("_e")) - 1))
            .as("s"),
          col("_e").as("e"))))
      .select(col("id"), col("pos").cast("long").as("chunk_idx"),
        col("col.s").as("start_pos"),
        (col("col.e") - col("col.s")).as("chunk_len"),
        md5(col("_t").substr((col("col.s") + 1).cast("int"),
          (col("col.e") - col("col.s")).cast("int"))).as("chunk_md5"))
  }
}
