package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** WordPiece-style greedy longest-match tokenizer serving — the
  * second tokenizer family next to [[Bpe]] (beyond-reference surface,
  * SURVEY §2.13). The vocabulary is a frequency-thresholded substring
  * census (word-initial pieces and `##`-continuation pieces counted
  * separately, single characters always kept); segmentation is the
  * HF-style greedy walk: at each position take the LONGEST vocabulary
  * piece, advance, and collapse the whole word to `[UNK]` if any
  * position has no match.
  *
  * Everything is integer/string census arithmetic, so both halves are
  * exactly replayable in SQL: the vocabulary as a substring-explode
  * census, the greedy walk as a recursive CTE following precomputed
  * per-(word, position) longest-match steps — which is how
  * `t_wordpiece` stays a full oracle gate despite the iteration.
  *
  * 100 TB shape: the vocabulary census explodes ≤ len·maxPieceLen
  * substrings per DISTINCT word (vocabulary grain, sublinear in corpus
  * size) into a partial agg; the trained model is minCount-bounded
  * (≤ B rows — same budget argument as the NB model census) and ships
  * broadcast; serving runs once per distinct word (the [[Bpe]] serving
  * frame — flat as the corpus duplicates words) via a per-partition
  * imperative walk (mapPartitions is justified: a data-dependent-length
  * loop per word, the same class as the Aho–Corasick automaton).
  */
object WordPiece {

  /** Trained model: word-initial and continuation piece sets. */
  final case class Model(init: Set[String], cont: Set[String], maxPieceLen: Int) {
    require(maxPieceLen > 0, "maxPieceLen must be positive")
  }

  val Unk = "[UNK]"

  /** (is_cont, piece, cnt) substring census over the corpus word
    * census: every substring of length 1..maxPieceLen of every word,
    * weighted by word occurrences; word-initial (pos 1) and
    * continuation (pos > 1) pieces counted separately because they are
    * distinct vocabulary entries. Pieces below `minCount` are dropped
    * unless single characters (kept so coverage degrades to
    * char-level, not to [UNK], for any character the training corpus
    * contains).
    */
  def vocabulary(docs: DataFrame, maxPieceLen: Int = 4, minCount: Long = 5L,
                 textCol: String = "text"): DataFrame = {
    val words = Bpe.wordCensus(docs, textCol)
    words
      .select(col("word"), col("freq"),
        explode(sequence(lit(1), length(col("word")))).as("pos"))
      .select(col("word"), col("freq"), col("pos"),
        explode(sequence(lit(1), lit(maxPieceLen))).as("l"))
      .where(col("pos") + col("l") - 1 <= length(col("word")))
      .select((col("pos") > 1).as("is_cont"),
        col("word").substr(col("pos"), col("l")).as("piece"), col("freq"))
      .groupBy("is_cont", "piece").agg(sum("freq").as("cnt"))
      .where(col("cnt") >= minCount || length(col("piece")) === 1)
  }

  /** Collect a census into a broadcastable model — model-sized (the
    * minCount threshold bounds it), never corpus-sized.
    */
  def model(vocab: DataFrame, maxPieceLen: Int = 4): Model = {
    val rows = vocab.select("is_cont", "piece").collect()
    Model(
      rows.filter(!_.getBoolean(0)).map(_.getString(1)).toSet,
      rows.filter(_.getBoolean(0)).map(_.getString(1)).toSet,
      maxPieceLen)
  }

  /** Greedy longest-match segmentation; None = [UNK] (some position
    * matched nothing — including the unseen-character case).
    */
  def segment(word: String, m: Model): Option[List[String]] = {
    val out = List.newBuilder[String]
    var pos = 0
    while (pos < word.length) {
      val table = if (pos == 0) m.init else m.cont
      var l = math.min(m.maxPieceLen, word.length - pos)
      var found = -1
      while (l >= 1 && found < 0) {
        if (table.contains(word.substring(pos, pos + l))) found = l
        else l -= 1
      }
      if (found < 0) return None
      val piece = word.substring(pos, pos + found)
      out += (if (pos == 0) piece else "##" + piece)
      pos += found
    }
    Some(out.result())
  }

  /** Encode a distinct-word frame: (word, encoded — space-joined
    * pieces or [UNK], n_pieces).
    */
  def encodeWords(words: DataFrame, m: Model): DataFrame = {
    val schema = StructType(Seq(
      StructField("word", StringType),
      StructField("encoded", StringType),
      StructField("n_pieces", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    import org.apache.spark.sql.Row
    words.select(col("word")).mapPartitions { rows =>
      rows.map { r =>
        val w = r.getString(0)
        segment(w, m) match {
          case Some(pieces) => Row(w, pieces.mkString(" "), pieces.length.toLong)
          case None         => Row(w, Unk, 1L)
        }
      }
    }(enc)
  }

  /** Doc-grain serving: tokenize, encode each DISTINCT word once, join
    * back, and roll up per document (piece count + char-coverage
    * diagnostics). The join is token-grain but the expensive walk ran
    * only on the distinct-word frame.
    */
  def encode(docs: DataFrame, m: Model, textCol: String = "text"): DataFrame = {
    val toks = docs.select(col("doc_id"),
        explode(TextAnalysis.tokens(TextAnalysis.normalized(col(textCol)))).as("word"))
      .where(col("word") =!= "")
    val encoded = encodeWords(toks.select("word").distinct(), m)
    toks.join(encoded, "word")
      .groupBy("doc_id")
      .agg(sum("n_pieces").as("total_pieces"),
        count(lit(1)).as("n_words"),
        sum(when(col("encoded") === Unk, 1L).otherwise(0L)).as("n_unk"))
  }
}
