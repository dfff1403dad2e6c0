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
  * totals derive from the 1-gram census (t₁ ≡ char count) with no
  * extra gram or length pass. Per-order
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

  /** Per-order gram-key arrays, split by [[HashScheme]] (the dedup
    * family's exact pattern, round-7 verdict #4) — since round 8 BOTH
    * schemes are one-pass native kernels with no gram strings at any
    * point:
    *
    *  - Portable: [[graft.functions.NGramMd5Prefixes]] — the top-60-bit
    *    md5 prefix of every window's UTF-8 byte slice, digested straight
    *    from the shared byte buffer. Bit-identical to the composed
    *    `conv(substring(md5(substr(txt,i,n)),1,15),16,10)` spelling the
    *    DuckDB oracle replays (pinned by Md5PrefixSpec), so any 60-bit
    *    collision merges identically in both engines and the gate stays
    *    hash-exact — but with zero substring allocations (the old
    *    transform/substr/md5 spelling measured 15.1 → 8.2 s isolated).
    *  - Fast: [[graft.functions.NGramRollingHashes]] — every window's
    *    Karp–Rabin hash from one codepoint pass. Gram identity matches
    *    the md5 path's (codepoint windows), so counts and scores agree
    *    across schemes modulo 64-bit collisions (pinned by ChrFSpec);
    *    the digest is engine-specific → rows-only gate.
    */
  private def gramKeys(txt: Column, n: Int, scheme: HashScheme): Column =
    scheme match {
      case HashScheme.Portable =>
        graft.functions.NGramMd5Prefixes.ngramMd5(txt, n)
      case _ =>
        graft.functions.NGramRollingHashes.ngramHashes(txt, n)
    }

  /** Per-pair chrF. Input: `pair_id`, `candidate`, `reference` (raw
    * text). Output: pair_id, c_chars, r_chars, m1..m6, t1..t6 (cand
    * totals), rt1..rt6 (ref totals), chrf. `scheme` picks the gram-key
    * hash: Portable (oracle-replayable md5) vs Fast (xxhash64 — the
    * production default at scale; see [[gramKeys]]).
    *
    * Shape (round 8): ONE normalize+gram pass over both sides — the
    * sides are exploded into (side, txt) rows before gram generation, so
    * the regexp normalization chain runs once per text instead of the
    * old three base references (two per-side gram streams + the length
    * frame); per-order candidate/reference totals fall out of the same
    * census (t_n = Σ c_cnt at order n ≡ len−n+1, t_1 ≡ char count), so
    * the length frame disappears entirely. The only other pass over the
    * input is a projection of `pair_id` + null flags (no normalization)
    * that anchors pairs with empty gram streams and restores the
    * null-text semantics of `length(null)`.
    */
  def chrF(pairs: DataFrame,
           scheme: HashScheme = HashScheme.Portable): DataFrame = {
    // cheap skeleton: every pair_id + null flags — no regexp work
    val skeleton = pairs.select(col("pair_id"),
      col("candidate").isNull.as("_c_null"), col("reference").isNull.as("_r_null"))

    val sided = pairs.select(col("pair_id"),
        explode(array(
          struct(lit(0).as("side"), chars(col("candidate")).as("txt")),
          struct(lit(1).as("side"), chars(col("reference")).as("txt")))).as("s"))
      .select(col("pair_id"), col("s.side").as("side"), col("s.txt").as("txt"))
    val grams = sided
      .select(col("pair_id"), col("side"),
        explode(array((1 to MaxN).map { n =>
          struct(lit(n).as("n"), gramKeys(col("txt"), n, scheme).as("hs"))
        }: _*)).as("ng"))
      .select(col("pair_id"), col("side"), col("ng.n").as("n"),
        explode(col("ng.hs")).as("g"))

    val census = grams.groupBy("pair_id", "n", "g")
      .agg(sum(when(col("side") === 0, 1L).otherwise(0L)).as("c_cnt"),
        sum(when(col("side") === 1, 1L).otherwise(0L)).as("r_cnt"))
      .select(col("pair_id"), col("n"), col("c_cnt"), col("r_cnt"),
        least(col("c_cnt"), col("r_cnt")).as("m"))
      .groupBy("pair_id")
      .agg(sum(when(col("n") === 1, col("m")).otherwise(0L)).as("m1"),
        ((2 to MaxN).map(n =>
          sum(when(col("n") === n, col("m")).otherwise(0L)).as(s"m$n")) ++
          // only the 1-gram totals are aggregated: t₁ IS the char count,
          // so every higher-order total is the projection
          // greatest(0, t₁ − (n−1)) — 8 aggregate expressions, not 18
          Seq(sum(when(col("n") === 1, col("c_cnt")).otherwise(0L)).as("t1"),
            sum(when(col("n") === 1, col("r_cnt")).otherwise(0L)).as("rt1"))): _*)

    val per = skeleton.join(census, Seq("pair_id"), "left")
      .select(Seq(col("pair_id"),
        when(col("_c_null"), lit(null).cast("long"))
          .otherwise(coalesce(col("t1"), lit(0L))).as("c_chars"),
        when(col("_r_null"), lit(null).cast("long"))
          .otherwise(coalesce(col("rt1"), lit(0L))).as("r_chars")) ++
        (1 to MaxN).flatMap(n => Seq(
          coalesce(col(s"m$n"), lit(0L)).as(s"m$n"),
          greatest(lit(0L), coalesce(col("t1"), lit(0L)) - (n - 1)).as(s"t$n"),
          greatest(lit(0L), coalesce(col("rt1"), lit(0L)) - (n - 1)).as(s"rt$n"))): _*)

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
