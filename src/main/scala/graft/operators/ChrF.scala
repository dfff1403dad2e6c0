package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** chrF — character n-gram F-score (Popović, WMT 2015), the standard
  * companion to [[Bleu]] for morphology-rich and whitespace-poor
  * languages: precision/recall of character n-grams (n = 1..6, spaces
  * removed), averaged over orders, combined as F_β with β = 2
  * (recall-weighted).
  *
  * 100 TB shape — tighter than BLEU's census-join: both sides' gram
  * streams are keyed by the portable md5-prefix60 digest (8-byte longs,
  * fused to one native digest by [[graft.plans.FuseMd5Uniform]]; the
  * DuckDB oracle replays the same digest, so any 60-bit collision
  * merges identically in both engines and the gate stays hash-exact),
  * side-tagged, and aggregated in ONE wide shuffle — a single
  * `groupBy(pair, n, ghash)` with two conditional counts replaces the
  * two per-side censuses plus the string-keyed sort-merge join of the
  * textbook plan (measured 15.6 s → see bench; the shuffle payload
  * drops from variable-length gram strings to fixed 8-byte keys and
  * the join disappears). Clipped matches are `least(c_cnt, r_cnt)`;
  * totals derive from the char count with no gram pass. Per-order
  * P_n = m_n/t_n and R_n = m_n/rt_n are averaged over orders with a
  * non-zero denominator (fixed n-ascending add order, so the double
  * chain is engine-identical), then one 6dp-rounded F_β. Sides shorter
  * than n contribute nothing at that order.
  */
object ChrF {

  val MaxN = 6
  val Beta = 2.0

  private def chars(text: Column): Column =
    regexp_replace(TextAnalysis.normalized(text), " ", "")

  /** (pair, n, gramkey, side) stream of char n-gram instances,
    * n = 1..MaxN — pre-aggregation, so the one census shuffle sees only
    * 8-byte keys. The gram key splits by [[HashScheme]] (the dedup
    * family's exact pattern, round-7 verdict #4):
    *
    *  - Portable: materialize each gram substring, key on its
    *    top-60-bit md5 prefix (the composed conv/substring/md5 spelling
    *    is the cross-engine contract; FuseMd5Uniform collapses it to
    *    one native digest at exec). ≈ n_chars substring allocations +
    *    digests per order per side — the structural CPU cost the
    *    oracle gate carries, and the md5 digest is NOT the dominant
    *    term (xxhash64 on the same substrings measured only 11%
    *    faster isolated).
    *  - Fast: NO gram strings at all — [[graft.functions
    *    .NGramRollingHashes]] emits every window's Karp–Rabin hash in
    *    one pass over a per-row codepoint array. Gram identity matches
    *    the substring path's (codepoint windows), so counts and scores
    *    agree across schemes modulo 64-bit collisions (pinned by
    *    ChrFSpec); the digest is engine-specific → rows-only gate.
    */
  private def gramStream(df: DataFrame, txtCol: String, lenCol: String,
      side: Int, scheme: HashScheme): DataFrame = {
    val keyed = scheme match {
      case HashScheme.Portable =>
        df.select(col("pair_id"),
            explode(array((1 to MaxN).map { n =>
              struct(lit(n).as("n"),
                when(col(lenCol) >= n,
                  transform(sequence(lit(1), col(lenCol) - n + 1),
                    i => col(txtCol).substr(i, lit(n))))
                  .otherwise(array().cast("array<string>")).as("grams"))
            }: _*)).as("ng"))
          .select(col("pair_id"), col("ng.n").as("n"),
            explode(col("ng.grams")).as("gram"))
          .select(col("pair_id"), col("n"),
            conv(substring(md5(col("gram")), 1, 15), 16, 10).cast("long").as("g"))
      case _ =>
        df.select(col("pair_id"),
            explode(array((1 to MaxN).map { n =>
              struct(lit(n).as("n"),
                graft.functions.NGramRollingHashes
                  .ngramHashes(col(txtCol), n).as("hs"))
            }: _*)).as("ng"))
          .select(col("pair_id"), col("ng.n").as("n"),
            explode(col("ng.hs")).as("g"))
    }
    keyed.select(col("pair_id"), col("n"), col("g"), lit(side).as("side"))
  }

  /** Per-pair chrF. Input: `pair_id`, `candidate`, `reference` (raw
    * text). Output: pair_id, c_chars, r_chars, m1..m6, t1..t6 (cand
    * totals), rt1..rt6 (ref totals), chrf. `scheme` picks the gram-key
    * hash: Portable (oracle-replayable md5) vs Fast (xxhash64 — the
    * production default at scale; see [[ghash]]).
    */
  def chrF(pairs: DataFrame,
           scheme: HashScheme = HashScheme.Portable): DataFrame = {
    val base = pairs.select(col("pair_id"),
        chars(col("candidate")).as("c_txt"), chars(col("reference")).as("r_txt"))
      .select(col("pair_id"), col("c_txt"), col("r_txt"),
        length(col("c_txt")).as("c_chars"), length(col("r_txt")).as("r_chars"))

    val grams = gramStream(base, "c_txt", "c_chars", 0, scheme)
      .unionAll(gramStream(base, "r_txt", "r_chars", 1, scheme))
    val matches = grams.groupBy("pair_id", "n", "g")
      .agg(sum(when(col("side") === 0, 1L).otherwise(0L)).as("c_cnt"),
        sum(when(col("side") === 1, 1L).otherwise(0L)).as("r_cnt"))
      .select(col("pair_id"), col("n"),
        least(col("c_cnt"), col("r_cnt")).as("m"))
      .groupBy("pair_id")
      .agg(sum(when(col("n") === 1, col("m")).otherwise(0L)).as("m1"),
        (2 to MaxN).map(n =>
          sum(when(col("n") === n, col("m")).otherwise(0L)).as(s"m$n")): _*)

    val per = base.select("pair_id", "c_chars", "r_chars")
      .join(matches, Seq("pair_id"), "left")
      .select(Seq(col("pair_id"), col("c_chars").cast("long").as("c_chars"),
        col("r_chars").cast("long").as("r_chars")) ++
        (1 to MaxN).flatMap(n => Seq(
          coalesce(col(s"m$n"), lit(0L)).as(s"m$n"),
          greatest(lit(0), col("c_chars") - n + 1).cast("long").as(s"t$n"),
          greatest(lit(0), col("r_chars") - n + 1).cast("long").as(s"rt$n"))): _*)

    per.withColumn("chrf", fChain(
      (1 to MaxN).map(n => (col(s"m$n"), col(s"t$n"), col(s"rt$n")))))
  }

  /** Corpus chrF: censuses summed over pairs, then the same chain. */
  def corpusChrF(pairs: DataFrame,
                 scheme: HashScheme = HashScheme.Portable): DataFrame = {
    val per = chrF(pairs, scheme).drop("chrf")
    val agg = per.agg(sum("c_chars").as("c_chars"),
      (Seq(sum("r_chars").as("r_chars")) ++
        (1 to MaxN).flatMap(n => Seq(sum(s"m$n").as(s"m$n"),
          sum(s"t$n").as(s"t$n"), sum(s"rt$n").as(s"rt$n")))): _*)
    agg.withColumn("chrf", fChain(
      (1 to MaxN).map(n => (col(s"m$n"), col(s"t$n"), col(s"rt$n")))))
  }

  /** F_β over order-averaged precision/recall; orders with a zero
    * denominator are skipped from their average (fixed ascending add
    * order). 0 when either average is undefined or both are 0.
    */
  private def fChain(mtr: Seq[(Column, Column, Column)]): Column = {
    def avg(parts: Seq[(Column, Column)]): (Column, Column) = {
      val s = parts.map { case (m, t) =>
        when(t > 0, m.cast("double") / t.cast("double")).otherwise(lit(0.0))
      }.reduce(_ + _)
      val k = parts.map { case (_, t) => when(t > 0, 1).otherwise(0) }.reduce(_ + _)
      (s, k)
    }
    val (pSum, pK) = avg(mtr.map { case (m, t, _) => (m, t) })
    val (rSum, rK) = avg(mtr.map { case (m, _, rt) => (m, rt) })
    val p = pSum / pK.cast("double")
    val r = rSum / rK.cast("double")
    val b2 = Beta * Beta
    when(pK === 0 || rK === 0, lit(0.0))
      .otherwise(when(p + r === 0.0, lit(0.0))
        .otherwise(round(lit(1.0 + b2) * p * r / (lit(b2) * p + r), 6)))
  }
}
