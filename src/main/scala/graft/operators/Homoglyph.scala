package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unicode-confusable (homoglyph) spoof detection — the data-cleaning
  * twin of [[TextAnalysis]]'s mojibake repair: texts that LOOK
  * identical but differ in code points (Cyrillic а for Latin a,
  * fullwidth ｗｏｒｄ, Greek ο) are how spam, SEO duplication and
  * prompt-injection payloads slip past exact and shingle dedup (every
  * shingle digest changes). Skeleton-fold the confusables to their
  * ASCII targets (Unicode TR39's skeleton idea, curated table), then
  * pair texts with EQUAL skeletons but DIFFERENT raw bytes.
  * Beyond-reference surface (SURVEY §2.13).
  *
  * Scale shape: the skeleton is ONE codegen translate() per row
  * (shuffle-free); pairing is an equi-join on the skeleton DIGEST
  * (md5), never text — the [[Dedup]] exact-group shape, bounded by
  * true spoof-group sizes.
  */
object Homoglyph {

  /** Curated confusable table: Cyrillic lowercase lookalikes, Greek
    * omicron/nu, fullwidth a–z and 0–9 — each folds to its ASCII
    * target. Public so the oracle interpolates the SAME table.
    */
  val confusablesFrom: String = {
    val cyr = "аеорсхуіѕј"
    val greek = "ον"
    val fwLetters = (0 until 26).map(i => (0xFF41 + i).toChar).mkString
    val fwDigits = (0 until 10).map(i => (0xFF10 + i).toChar).mkString
    cyr + greek + fwLetters + fwDigits
  }

  val confusablesTo: String =
    "aeopcxyisj" + "ov" + ('a' to 'z').mkString + ('0' to '9').mkString

  /** ASCII-skeleton fold of a text column: one translate(). */
  def skeleton(c: Column): Column =
    translate(c, confusablesFrom, confusablesTo)

  /** Spoof pairs: (doc_a, doc_b, skel_digest) for every pair with equal
    * skeletons but different raw text, doc_a < doc_b. Join key is the
    * md5 digest of the skeleton, so wide texts never ride the shuffle.
    */
  def spoofPairs(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val keyed = docs.select(col("doc_id"), col(textCol).as("_t"),
        md5(skeleton(col(textCol)).cast("binary")).as("skel_digest"))
      .where(col("_t").isNotNull)
    val a = keyed.select(col("doc_id").as("doc_a"), col("_t").as("_ta"),
      col("skel_digest"))
    val b = keyed.select(col("doc_id").as("doc_b"), col("_t").as("_tb"),
      col("skel_digest"))
    a.join(b, Seq("skel_digest"))
      .where(col("doc_a") < col("doc_b") && col("_ta") =!= col("_tb"))
      .select(col("doc_a"), col("doc_b"), col("skel_digest"))
  }
}
