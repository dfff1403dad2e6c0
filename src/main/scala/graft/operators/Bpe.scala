package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer training (Sennrich et al.) over the corpus — the
  * tokenizer-construction step of an LLM data pipeline, one level up
  * from [[Salience.vocabulary]]: learn `nMerges` subword merges from
  * the word census, most-frequent adjacent symbol pair first.
  * Beyond-reference surface (SURVEY §2.13).
  *
  * Everything is integer census arithmetic — counts, string symbols, no
  * floats anywhere — so the whole ITERATIVE training loop is exactly
  * replayable by the DuckDB oracle as a generated chain of per-round
  * CTEs (pair census → argmax → merge application), which is how
  * `t_bpe_train` stays a full oracle gate despite being a loop.
  *
  * Merge application is ONE non-overlapping left-to-right `replace`
  * pass per round on the space-joined symbol string (padded with
  * sentinel spaces so matches are whole-symbol): `' a b ' → ' ab '`.
  * DOCUMENTED VARIANT: on a same-symbol run (`a a a a`) a single pass
  * merges the odd occurrences only (`aa a a` — the consumed boundary
  * space hides the next adjacency); classic BPE's greedy rescan is
  * recovered in later rounds whenever the pair stays on top, and
  * non-run text behaves identically. Both engines' `replace` share
  * these exact semantics, which is what makes the round replayable.
  *
  * Word census grain: training runs over DISTINCT words weighted by
  * frequency (the standard trick), so per-round cost scales with the
  * vocabulary — sublinear in corpus size — not the token stream. Ties
  * break (count desc, pair asc) on binary string order, identical in
  * both engines. Per round the driver fetches exactly ONE row (the
  * argmax pair — TakeOrdered, no global sort); `checkpointEvery`
  * truncates the accumulated replace lineage so round i costs O(vocab),
  * not O(i·vocab) re-evaluation.
  */
object Bpe {

  /** Learned merges in application order, with the final symbolized
    * word census (word, freq, syms — space-joined subwords).
    */
  final case class BpeResult(merges: Seq[(String, String, Long)],
                             words: DataFrame)

  /** (word, freq) census over normalized whitespace tokens. */
  def wordCensus(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(
        explode(TextAnalysis.tokens(TextAnalysis.normalized(col(textCol)))).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Initial symbolization: characters joined by spaces + the `</w>`
    * end-of-word marker (words are normalized alnum, so the marker
    * cannot collide with a real symbol). `(.)` → `$1 ` instead of a
    * split-on-empty (whose trailing-empty behavior differs between
    * engines); BMP-only caveat: Java regex `.` is a UTF-16 code unit,
    * RE2's a rune, so supplementary-plane characters would split
    * differently — normalized corpus text here is BMP.
    */
  private def initSyms(word: Column): Column =
    concat(regexp_replace(word, "(.)", "$1 "), lit("</w>"))

  /** GPT-2-style byte↔unicode table (Radford et al. 2019, encoder.py
    * `bytes_to_unicode`): the 188 printable latin-1 bytes map to
    * themselves, the other 68 map to U+0100+n in byte order — a
    * bijection that renders EVERY byte as one printable, non-space BMP
    * character, so byte sequences ride through the space-separated
    * merge machinery unchanged. This is what production LLM tokenizers
    * (GPT-2/LLaMA family) train over: merges operate on UTF-8 BYTES,
    * which diverges from char-level merges on any non-ASCII corpus
    * (one 'ä' = two byte symbols).
    */
  private[graft] val byteToChar: Array[String] = {
    val printable = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    var n = 0
    (0 until 256).map { b =>
      if (printable(b)) b.toChar.toString
      else { val s = (256 + n).toChar.toString; n += 1; s }
    }.toArray
  }

  /** Byte-level initial symbolization: UTF-8 bytes of the word, each
    * rendered through [[byteToChar]], space-joined + the `</w>` marker.
    * Byte extraction is hex-pair splitting (`hex(encode(..))` is
    * engine-portable where binary indexing is not); the 256-entry map
    * ships as one literal in the plan.
    */
  private def byteInitSyms(word: Column): Column = {
    val m = typedLit((0 until 256).map(b => f"$b%02X" -> byteToChar(b)).toMap)
    concat(array_join(transform(
      split(trim(regexp_replace(
        // qualified: Bpe.encode (the serving method) shadows functions.encode
        hex(org.apache.spark.sql.functions.encode(word, "UTF-8")),
        "(..)", "$1 ")), " "),
      h => element_at(m, h)), " "), lit(" </w>"))
  }

  private def symbolize(word: Column, byteLevel: Boolean): Column =
    if (byteLevel) byteInitSyms(word) else initSyms(word)

  /** Adjacent-pair census of the current symbolization, weighted by
    * word frequency: (g = "left right", cnt).
    */
  private def pairCensus(words: DataFrame): DataFrame =
    words.select(col("freq"),
        explode(graft.functions.NGramShingles.shingles(col("syms"), 2)).as("g"))
      .where(size(split(col("g"), " ")) === 2)
      .groupBy("g").agg(sum(col("freq")).as("cnt"))

  /** Train `nMerges` rounds. Fails loudly (require) if the corpus runs
    * out of distinct pairs first — the oracle replays a FIXED number of
    * rounds, so a silent early stop would diverge.
    */
  def train(docs: DataFrame, nMerges: Int, textCol: String = "text",
            checkpointEvery: Int = 8, byteLevel: Boolean = false): BpeResult = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    // LAZY pins: each merge round's top-pair collect() materializes the
    // current word frame in the same job (the eager pins paid an extra
    // driver-synced job at init and at every checkpointEvery boundary);
    // the frame has one sequential consumer per round, so nothing is
    // ever computed twice
    var words = wordCensus(docs, textCol)
      .select(col("word"), col("freq"),
        symbolize(col("word"), byteLevel).as("syms"))
      .localCheckpoint(false)
    val merges = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    var i = 0
    while (i < nMerges) {
      val top = pairCensus(words)
        .orderBy(col("cnt").desc, col("g").asc).limit(1).collect()
      require(top.nonEmpty,
        s"corpus exhausted after ${merges.size} merges (asked for $nMerges)")
      val g = top.head.getString(0); val cnt = top.head.getLong(1)
      val Array(l, r) = g.split(" ", 2)
      merges += ((l, r, cnt))
      words = words.withColumn("syms",
        trim(replace(concat(lit(" "), col("syms"), lit(" ")),
          lit(s" $l $r "), lit(s" ${l + r} "))))
      i += 1
      if (i % checkpointEvery == 0) words = words.localCheckpoint(false)
    }
    BpeResult(merges.toSeq, words)
  }

  /** The learned merge list as a frame: (rank 1-based, left, right,
    * merged, cnt) — the artifact a tokenizer ships.
    */
  def mergeTable(result: BpeResult, docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    result.merges.zipWithIndex
      .map { case ((l, r, c), i) => (i + 1, l, r, l + r, c) }
      .toDF("rank", "merge_left", "merge_right", "merged", "cnt")
  }

  /** Corpus subword census under the trained segmentation: (subword,
    * freq) — token-frequency statistics of the NEW vocabulary, the
    * standard check that merges actually compress the corpus.
    */
  def subwordCensus(result: BpeResult): DataFrame =
    result.words
      .select(col("freq"), explode(split(col("syms"), " ")).as("subword"))
      .groupBy("subword").agg(sum(col("freq")).as("freq"))

  /** Segment a (word) frame with an already-trained merge list:
    * (word, syms). The merges become LITERALS in one projection — the
    * fold builds rank-order chained replaces, so applying a tokenizer
    * is a shuffle-free scan over the distinct-word frame, no join
    * against a merge table and no per-round driver loop (the
    * [[graft.operators.Classifier.scoreStateless]] serving trick,
    * applied to tokenization). Replace semantics are identical to
    * training's ([[train]] scaladoc: non-overlapping left-to-right,
    * sentinel-space padded), so re-encoding the training words
    * reproduces the training segmentation exactly (pinned by unit
    * test). Unseen words segment down to characters wherever no merge
    * applies — the defining property of BPE serving.
    */
  def encodeWords(merges: Seq[(String, String, Long)],
                  words: DataFrame, byteLevel: Boolean = false): DataFrame =
    merges.foldLeft(
      words.select(col("word"), symbolize(col("word"), byteLevel).as("syms"))) {
      case (df, (l, r, _)) => df.withColumn("syms",
        trim(replace(concat(lit(" "), col("syms"), lit(" ")),
          lit(s" $l $r "), lit(s" ${l + r} "))))
    }

  /** Tokenize NEW documents with a trained merge list (the serving
    * path): per doc, the word count, subword count, and an md5 digest
    * of the full in-order segmentation (word-boundary `</w>` markers
    * included), so a gate can pin the entire token stream without
    * materializing it. Cost at scale: one distinct-word projection
    * (vocabulary grain — sublinear in corpus size), one equi-join of
    * the positional word stream onto it, one per-doc regroup. Docs
    * with no words (empty/null text) keep a row with zero counts.
    */
  def encode(merges: Seq[(String, String, Long)], docs: DataFrame,
             textCol: String = "text", byteLevel: Boolean = false): DataFrame = {
    val toks = TextAnalysis.tokens(TextAnalysis.normalized(col(textCol)))
    val stream = docs
      .select(col("doc_id"), posexplode(toks).as(Seq("pos", "word")))
      .where(col("word") =!= "")
    val encoded = encodeWords(merges, stream.select("word").distinct(), byteLevel)
    val agg = stream.join(encoded, Seq("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        TextAnalysis.joinInOrder(col("pos"), col("syms"), " ").as("_seg"))
      .select(col("doc_id"), col("n_words"),
        size(split(col("_seg"), " ")).cast("long").as("n_subwords"),
        md5(col("_seg")).as("seg_md5"))
    docs.select(col("doc_id")).join(agg, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_subwords"), lit(0L)).as("n_subwords"),
        col("seg_md5"))
  }

  /** Tokenizer fertility — subwords per word by group (language,
    * source): THE standard health metric of a trained vocabulary
    * (fertility near 1 = words mostly kept whole; high fertility on a
    * language = the merge table under-serves it and its token budget
    * silently inflates). Pure census arithmetic over [[encode]]'s
    * per-doc counts: one join to the grouping column, one partial-agg
    * shuffle, a single exact division rounded 6dp. Zero-word groups
    * report null fertility.
    */
  def fertility(encoded: DataFrame, meta: DataFrame,
                groupCol: String = "lang"): DataFrame =
    encoded.join(meta.select(col("doc_id"), col(groupCol)), Seq("doc_id"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_subwords")).as("n_subwords"))
      .withColumn("fertility",
        when(col("n_words") > 0L,
          round(col("n_subwords").cast("double") / col("n_words"), 6)))
}
