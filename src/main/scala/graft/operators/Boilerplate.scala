package graft.operators

import java.util.regex.Pattern

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C4/RefinedWeb-style boilerplate line removal: a "line" (text segment
  * between occurrences of `lineSep`) that appears in at least `minDocs`
  * distinct documents is boilerplate (cookie banners, nav menus,
  * license headers); strip those lines from every document, preserving
  * the order of what remains.
  *
  * 100 TB design:
  *  - the corpus-wide line census shuffles 16-byte md5 digests, never
  *    line text, and partial-aggregates (doc-distinct per digest is a
  *    two-level groupBy with map-side combine on both levels);
  *  - the boilerplate set after the `minDocs` filter is tiny (lines
  *    repeated across many docs are by definition few distinct values)
  *    → broadcast anti-join, no shuffle of the corpus on line keys;
  *  - reassembly groups by doc_id only — one shuffle of surviving
  *    (pos, line) pairs, sorted per doc with `array_sort`, no window.
  */
object Boilerplate {

  // limit -1 keeps trailing empty segments (Java split drops them by
  // default; external engines' literal splitters do not)
  private def splitLines(text: org.apache.spark.sql.Column, lineSep: String) =
    split(text, Pattern.quote(lineSep), -1)

  private def lineFrame(docs: DataFrame, lineSep: String, textCol: String): DataFrame =
    docs.select(col("doc_id"),
      posexplode(splitLines(col(textCol), lineSep)).as(Seq("pos", "line")))

  /** The census: each line digest with its distinct-document count;
    * `line` retained for reporting (first occurrence's text — all
    * occurrences of a digest share it).
    */
  def boilerplateLines(docs: DataFrame, lineSep: String = "\n",
                       minDocs: Long = 10, textCol: String = "text"): DataFrame =
    lineFrame(docs, lineSep, textCol)
      .groupBy(md5(col("line")).as("line_digest"))
      .agg(first(col("line")).as("line"),
        count_distinct(col("doc_id")).as("n_docs"))
      .where(col("n_docs") >= minDocs)

  /** C4-style LINE-LEVEL heuristic filter — the other half of the C4
    * cleaning recipe next to the corpus-frequency census above: a line
    * is kept only if it (a) has at least `minWords` whitespace words,
    * (b) ends in terminal punctuation (`. ! ? " '` after right-trim —
    * C4's "terminal punctuation mark" rule) when
    * `requireTerminalPunct`, and (c) contains none of the lowercase
    * `blocklist` markers (C4 drops lines with "javascript", pages with
    * "lorem ipsum"). Unlike [[removeBoilerplate]] this needs NO corpus
    * census: the predicate is per-line, so the whole operator is one
    * shuffle-free projection via the higher-order `filter` over the
    * split array — at 100 TB it is a pure scan that pipelines inside
    * whole-stage codegen with zero exchanges.
    *
    * Null text propagates (null clean_text/counts), matching the
    * splitter's null semantics in external engines.
    */
  def removeLowQualityLines(docs: DataFrame, lineSep: String = "\n",
                            minWords: Int = 3,
                            requireTerminalPunct: Boolean = true,
                            blocklist: Seq[String] =
                              Seq("javascript", "lorem ipsum", "cookie"),
                            textCol: String = "text"): DataFrame = {
    require(minWords >= 1, s"minWords must be >= 1, got $minWords")
    def keep(l: org.apache.spark.sql.Column) = {
      // blank-safe word count: trim-empty lines have 0 words, not [""]
      val words = when(trim(l) === "", lit(0))
        .otherwise(size(split(trim(l), "\\s+")))
      val base = blocklist.foldLeft(words >= minWords) {
        (acc, marker) => acc && !lower(l).contains(marker)
      }
      if (requireTerminalPunct) base && rtrim(l).rlike("[.!?\"']$") else base
    }
    val lines = splitLines(col(textCol), lineSep)
    val kept = filter(lines, keep _)
    docs.select(col("doc_id"),
      array_join(kept, lineSep).as("clean_text"),
      size(lines).as("n_lines"),
      size(kept).as("n_lines_kept"),
      (size(lines) - size(kept)).as("n_lines_removed"))
  }

  /** Corpus-wide PARAGRAPH dedup (the Dolma recipe's paragraph stage):
    * a line/paragraph occurring more than once ANYWHERE in the corpus
    * keeps only its corpus-first occurrence (minimum (doc_id, pos) —
    * deterministic, partial-aggregated min(struct), no per-digest sort);
    * every later occurrence is dropped and documents reassemble in
    * order. Differs from [[removeBoilerplate]] (threshold census, ALL
    * occurrences dropped) exactly the way span keepFirst differs from
    * span removal — here one copy of duplicated content survives, which
    * is the dedup policy rather than the boilerplate policy.
    *
    * Scale shape: line census on 16-byte digests (one partial-agg
    * shuffle), duplicated-digest join-back, reassembly grouped per doc;
    * docs whose every line is a later duplicate survive with empty text
    * (callers filter, as with the other cleaning heads).
    *
    * Output: (doc_id, clean_text, n_lines, n_lines_removed).
    */
  def dedupLines(docs: DataFrame, lineSep: String = "\n",
                 textCol: String = "text"): DataFrame = {
    val lines = lineFrame(docs, lineSep, textCol)
      .withColumn("_dig", md5(col("line")))
    val repeated = lines.groupBy("_dig").agg(count(lit(1)).as("_c"))
      .where(col("_c") > 1).select("_dig")
    val canon = lines.join(repeated, Seq("_dig"))
      .groupBy("_dig")
      .agg(min(struct(col("doc_id"), col("pos"))).as("_first"))
    val dropped = lines.join(canon, Seq("_dig"))
      .where(struct(col("doc_id"), col("pos")) =!= col("_first"))
      .select("doc_id", "pos")
    val kept = lines.join(dropped, Seq("doc_id", "pos"), "left_anti")
      .groupBy("doc_id")
      .agg(TextAnalysis.joinInOrder(col("pos"), col("line"), lineSep)
          .as("clean_text"),
        count(lit(1)).as("_kept"))
    docs.select(col("doc_id"),
        when(col(textCol).isNull, lit(0L))
          .otherwise(size(splitLines(col(textCol), lineSep)).cast("long"))
          .as("n_lines"))
      .join(kept, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_lines"),
        (col("n_lines") - coalesce(col("_kept"), lit(0L))).as("n_lines_removed"))
  }

  /** Boilerplate removal against a PRECOMPUTED digest set as ONE pure
    * projection — the stream-compatible form of [[removeBoilerplate]]:
    * filter the split line array by digest membership, rejoin in place.
    * Equivalent to the census path's anti-join + ordered reassembly for
    * the same digest set (filter preserves line order), but with no
    * explode, no join, no aggregation — so it drops into a readStream
    * micro-batch. `digests` is a driver-side artifact (md5 hex from a
    * batch [[boilerplateLines]] census) because a streaming projection
    * cannot collect a frame per batch; boilerplate sets are
    * broadcast-literal-sized by construction (lines in ≥ minDocs docs).
    * Null text propagates null (callers filter on length like the
    * batch head).
    */
  def removeKnownBoilerplate(docs: DataFrame, digests: Seq[String],
                             lineSep: String = "\n",
                             textCol: String = "text"): DataFrame = {
    val digestLit = typedLit(digests)
    docs.withColumn(textCol,
      array_join(
        filter(splitLines(col(textCol), lineSep),
          l => !array_contains(digestLit, md5(l))),
        lineSep))
  }

  /** Documents with boilerplate lines removed (grain preserved — a doc
    * whose every line is boilerplate survives with empty text), plus
    * kept/removed line counts.
    */
  def removeBoilerplate(docs: DataFrame, lineSep: String = "\n",
                        minDocs: Long = 10, textCol: String = "text"): DataFrame = {
    val lines = lineFrame(docs, lineSep, textCol)
    val bp = boilerplateLines(docs, lineSep, minDocs, textCol).select("line_digest")
    val kept = lines.join(broadcast(bp),
        md5(col("line")) === bp("line_digest"), "left_anti")
      .groupBy("doc_id")
      .agg(
        TextAnalysis.joinInOrder(col("pos"), col("line"), lineSep).as("clean_text"),
        count(lit(1)).as("n_lines_kept"))
    docs.select(col("doc_id"), size(splitLines(col(textCol), lineSep)).as("n_lines"))
      .join(kept, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_lines_kept"), lit(0L)).as("n_lines_kept"),
        (col("n_lines") - coalesce(col("n_lines_kept"), lit(0L))).as("n_lines_removed"))
  }
}
