package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skip-gram training-pair extraction with DETERMINISTIC negative
  * sampling — the word2vec/embedding-model data-prep stage: (center,
  * context) pairs within a token window, each paired with k sampled
  * negative terms. Beyond-reference surface (SURVEY §2.13).
  *
  * Classic negative sampling draws from the unigram^0.75 distribution
  * with an RNG — not replayable. This variant samples UNIFORMLY over
  * the [[Salience.vocabulary]] id space via the md5-prefix hash of
  * (doc_id, pos, j): fully deterministic, engine-portable (the same
  * 60-bit md5 parse the Portable dedup scheme uses), and collision
  * rejection is deliberately omitted (a negative occasionally equal to
  * the center/context is rare and harmless for training; rejection
  * resampling would make the draw data-dependent and kill replay).
  *
  * Scale shape: pairs come from `window` positional equi-joins on
  * (doc_id, pos) — no window functions, fanout exactly 2·window per
  * token; negatives are a lateral explode of k ids joined to the
  * broadcast vocabulary (vocabulary is census-grain). Everything
  * downstream of the token explode is join/agg on integer keys.
  */
object SkipGram {

  /** (doc_id, pos, tok): kernel tokens with 0-based positions. */
  def tokenStream(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
        posexplode(TextAnalysis.tokens(TextAnalysis.normalized(col(textCol)))))
      .select(col("doc_id"), col("pos"), col("col").as("tok"))

  /** Skip-gram pairs: for every offset d in [1, window], both
    * directions — (doc_id, pos, center, context) where pos is the
    * CENTER token's position.
    */
  def pairs(docs: DataFrame, textCol: String = "text",
            window: Int = 2): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val t = tokenStream(docs, textCol).localCheckpoint()
    val right = t.select(col("doc_id"), col("pos").as("_rp"),
      col("tok").as("_rt"))
    (1 to window).map { d =>
      // equi-join on (doc_id, pos) with the right side shifted by d —
      // never a doc-grain token×token self-join
      val joined = t.join(
        right.withColumn("pos", col("_rp") - lit(d)), Seq("doc_id", "pos"))
      joined.select(col("doc_id"), col("pos"), col("tok").as("center"),
          col("_rt").as("context"))
        .unionByName(joined.select(col("doc_id"), col("_rp").as("pos"),
          col("_rt").as("center"), col("tok").as("context")))
    }.reduce(_ unionByName _)
  }

  /** GloVe-style weighted co-occurrence census X (Pennington et al.
    * 2014): ordered (center, context) pairs within `window`, each
    * occurrence weighted 1/d by distance — the decaying-context count
    * matrix GloVe factorizes, and a sharper collocation signal than
    * [[Salience.bigramPmi]]'s adjacent-only census. Weights are
    * DRIVER-CONSTANT micro integers per offset (round(1e6/d)), so the
    * census sum is exact long arithmetic and replays on any engine.
    *
    * Scale shape: same as [[pairs]] — per-offset equi-joins on
    * (doc_id, pos+d), never a token×token self-join; the output is a
    * vocabulary²-bounded census reached through one partial-agg
    * shuffle. Output: (center, context, n_pairs, x_micro).
    */
  def weightedCooccurrence(docs: DataFrame, window: Int = 5,
                           textCol: String = "text"): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val t = tokenStream(docs, textCol)
    // ONE shuffle join: explode the center side by the 2·window signed
    // offsets and equi-join on the shifted position — vs one join per
    // offset, which re-shuffles the token stream `window` times
    // (measured 5.4 s → one-join plan on sf0.1)
    val offs = (1 to window).flatMap(d => Seq(d, -d))
    val weight = (1 to window).tail.foldLeft(
      lit(math.round(1e6 / 1)): Column) { (acc, d) =>
      when(abs(col("d")) === d, lit(math.round(1e6.toDouble / d)))
        .otherwise(acc)
    }
    val left = t.select(col("doc_id"), col("tok").as("center"),
        explode(array(offs.map(lit): _*)).as("d"), col("pos"))
      .withColumn("pos2", col("pos") + col("d"))
    val right = t.select(col("doc_id"), col("pos").as("pos2"),
      col("tok").as("context"))
    left.join(right, Seq("doc_id", "pos2"))
      .groupBy("center", "context")
      .agg(count(lit(1)).as("n_pairs"), sum(weight).as("x_micro"))
  }

  /** 60-bit md5-prefix hash — the Portable-scheme parse, replayable as
    * ('0x' || substr(md5(s), 1, 15))::BIGINT in any SQL engine.
    */
  private def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Pairs + k deterministic negatives, flattened: (doc_id, pos,
    * center, context, j, neg_term). `vocab` must be a
    * [[Salience.vocabulary]] frame (dense token_id 0..V−1); it rides
    * along broadcast.
    */
  def withNegatives(docs: DataFrame, vocab: DataFrame,
                    textCol: String = "text", window: Int = 2,
                    k: Int = 2): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val v = vocab.agg(count(lit(1)).as("_v"))
    val p = pairs(docs, textCol, window)
      .crossJoin(broadcast(v))
      .select(col("doc_id"), col("pos"), col("center"), col("context"),
        explode(sequence(lit(0), lit(k - 1))).as("j"), col("_v"))
      .withColumn("_neg_id",
        pmod(h60(concat_ws(":", col("doc_id"), col("pos"), col("j"))),
          col("_v")))
    p.join(broadcast(vocab.select(col("token_id").as("_neg_id"),
        col("term").as("neg_term"))), Seq("_neg_id"))
      .select("doc_id", "pos", "center", "context", "j", "neg_term")
  }
}
