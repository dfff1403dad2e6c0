package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Unigram-LM tokenizer training (Kudo 2018, the SentencePiece model) —
  * the third tokenizer family next to [[Bpe]] (merge-based) and
  * [[WordPiece]] (greedy serving): pieces carry log-probabilities and a
  * word's segmentation is the VITERBI-best split, re-estimated by EM.
  * Beyond-reference surface (SURVEY §2.13).
  *
  * Deterministic EM-lite, built for exact replayability:
  *   - seed vocabulary = the same substring census as [[WordPiece]]
  *     (all substrings ≤ maxPieceLen with count ≥ minCount, single
  *     characters always kept — so every train word is segmentable),
  *     position-independent (no ## distinction: unigram pieces are);
  *   - piece scores are micro-log10 integers:
  *     round(log10(cnt/total)·1e6) — the [[TextAnalysis]] LM idiom, so
  *     Viterbi totals are exact long sums;
  *   - E-step: per-word Viterbi DP with the total order
  *     (total desc, piece-length desc) on ties;
  *   - M-step: piece counts from the best segmentations (word-frequency
  *     weighted) with ADD-ONE smoothing over the FIXED seed vocabulary —
  *     no zeros, no vocabulary churn, every round replayable.
  *     (Production SentencePiece also prunes low-score pieces per round;
  *     pruning is a knob this deterministic core deliberately omits.)
  *
  * The whole loop replays in SQL: the census and scores as aggregates,
  * the Viterbi forward pass as UNROLLED per-position CTEs (positions
  * 1..maxWordLen), and the backtrack as a recursive CTE following the
  * stored backpointers — the [[WordPiece]] walk trick, with a DP in
  * front.
  *
  * 100 TB shape: censuses are vocabulary-grain (the substring explode
  * is bounded by len·maxPieceLen per DISTINCT word); the model is
  * minCount-bounded and ships broadcast; the Viterbi walk is a
  * per-partition imperative kernel over the distinct-word frame (flat
  * under corpus duplication), one pass per EM round.
  */
object UnigramLm {

  final case class Model(scores: Map[String, Long], maxPieceLen: Int) {
    require(maxPieceLen > 0, "maxPieceLen must be positive")
  }

  /** Position-independent substring census: (piece, cnt), single chars
    * always kept (cf. [[WordPiece.vocabulary]], minus the init/cont
    * split).
    */
  def seedCensus(docs: DataFrame, maxPieceLen: Int = 4, minCount: Long = 5L,
                 textCol: String = "text"): DataFrame =
    seedCensusFromWords(Bpe.wordCensus(docs, textCol), maxPieceLen, minCount)

  /** [[seedCensus]] over an existing (word, freq) census. */
  def seedCensusFromWords(words: DataFrame, maxPieceLen: Int = 4,
                          minCount: Long = 5L): DataFrame = {
    words
      .select(col("word"), col("freq"),
        explode(sequence(lit(1), length(col("word")))).as("pos"))
      .select(col("word"), col("freq"), col("pos"),
        explode(sequence(lit(1), lit(maxPieceLen))).as("l"))
      .where(col("pos") + col("l") - 1 <= length(col("word")))
      .select(col("word").substr(col("pos"), col("l")).as("piece"), col("freq"))
      .groupBy("piece").agg(sum("freq").as("cnt"))
      .where(col("cnt") >= minCount || length(col("piece")) === 1)
  }

  /** Micro-log10 scores from a (piece, cnt) census:
    * round(log10(cnt/total)·1e6) as long.
    */
  def scores(census: DataFrame): DataFrame = {
    val total = census.agg(sum(col("cnt")).as("tot"))
    census.crossJoin(broadcast(total))
      .select(col("piece"),
        round(log10(col("cnt").cast("double") / col("tot")) * lit(1e6))
          .cast("long").as("logp"))
  }

  /** Collect scores into a broadcastable model (≤B rows by minCount). */
  def model(scoreDf: DataFrame, maxPieceLen: Int = 4): Model =
    Model(scoreDf.select("piece", "logp").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap, maxPieceLen)

  /** Viterbi-best segmentation under micro-log scores; ties at a DP
    * cell break toward the LONGER current piece. None = some position
    * unreachable (an unseen character).
    */
  def viterbi(word: String, m: Model): Option[List[String]] = {
    val n = word.length
    val best = Array.fill(n + 1)(Long.MinValue)
    val back = Array.fill(n + 1)(0)
    best(0) = 0L
    var p = 1
    while (p <= n) {
      var l = math.min(m.maxPieceLen, p)
      while (l >= 1) {
        if (best(p - l) != Long.MinValue) {
          m.scores.get(word.substring(p - l, p)).foreach { s =>
            val tot = best(p - l) + s
            // strictly-greater: equal totals keep the earlier (longer-l)
            // winner because l iterates downward
            if (tot > best(p)) { best(p) = tot; back(p) = l }
          }
        }
        l -= 1
      }
      p += 1
    }
    if (best(n) == Long.MinValue) None
    else {
      var q = n
      var acc = List.empty[String]
      while (q > 0) { acc = word.substring(q - back(q), q) :: acc; q -= back(q) }
      Some(acc)
    }
  }

  /** Segment a distinct-word frame: (word, encoded, n_pieces,
    * logp_micro); unsegmentable words collapse to [UNK] with null
    * logp.
    */
  def segmentWords(words: DataFrame, m: Model): DataFrame = {
    val schema = StructType(Seq(
      StructField("word", StringType),
      StructField("encoded", StringType),
      StructField("n_pieces", LongType),
      StructField("logp_micro", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    import org.apache.spark.sql.Row
    words.select(col("word")).mapPartitions { rows =>
      rows.map { r =>
        val w = r.getString(0)
        viterbi(w, m) match {
          case Some(ps) =>
            val lp = ps.map(m.scores).sum
            Row(w, ps.mkString(" "), ps.length.toLong, lp)
          case None => Row(w, WordPiece.Unk, 1L, null)
        }
      }
    }(enc)
  }

  /** One M-step: piece counts from the Viterbi segmentations of the
    * word census (frequency-weighted), add-one smoothed over the FIXED
    * seed vocabulary so no piece's probability hits zero.
    */
  def emCensus(wordCensus: DataFrame, seedPieces: DataFrame, m: Model): DataFrame = {
    val segs = segmentWords(wordCensus.select("word"), m)
      .where(col("encoded") =!= WordPiece.Unk)
      .select(col("word"), explode(split(col("encoded"), " ")).as("piece"))
    val used = wordCensus.join(segs, "word")
      .groupBy("piece").agg(sum("freq").as("used"))
    seedPieces.select("piece")
      .join(used, Seq("piece"), "left_outer")
      .select(col("piece"), (coalesce(col("used"), lit(0L)) + 1L).as("cnt"))
  }

  /** Train `rounds` EM rounds from the seed census; returns the final
    * model. rounds = 0 serves the raw seed-frequency scores. Words
    * longer than `maxWordLen` are excluded from EVERYTHING (census,
    * EM, and — by contract — serving): the bound is what lets an
    * external replayer unroll the Viterbi DP to a fixed depth, and is
    * also the standard SentencePiece max-length guard.
    */
  def train(docs: DataFrame, rounds: Int, maxPieceLen: Int = 4,
            minCount: Long = 5L, maxWordLen: Int = 64,
            textCol: String = "text"): Model = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    val words = Bpe.wordCensus(docs, textCol)
      .where(length(col("word")) <= maxWordLen).localCheckpoint()
    val seed = seedCensusFromWords(words, maxPieceLen, minCount)
      .localCheckpoint()
    var m = model(scores(seed), maxPieceLen)
    var i = 0
    while (i < rounds) {
      m = model(scores(emCensus(words, seed, m)), maxPieceLen)
      i += 1
    }
    m
  }
}
