package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bradley–Terry preference-strength fitting — the batch-parallel
  * preference model behind pairwise human-feedback curation (which
  * completion wins, which document a rater prefers). Fits strengths
  * p_i maximizing the likelihood of observed pairwise wins via
  * Hunter's MM updates:
  *
  *   p_i ← W_i / Σ_{j≠i} n_ij / (p_i + p_j),   then normalize Σp = 1
  *
  * (W_i = item i's total wins, n_ij = games between i and j). Elo is
  * the sequential cousin; Bradley–Terry is the order-free batch fit, so
  * it parallelizes honestly.
  *
  * 100 TB shape: state lives at two censuses — the PAIR census
  * (a, b, n, wins_a), which is the partial-agg collapse of the raw
  * comparison log, and the ITEM census (i, p). Each MM round is two
  * broadcast-free equi-joins of pair-census × item-census (one per
  * side), a partial-agg groupBy back to item grain, and ONE 1-row total
  * for the normalization — no driver data path, no global window, no
  * all-pairs anything. Rounds are driver-loop composed like
  * [[PageRank]], with per-round localCheckpoints so lineage stays flat
  * (each round reads p twice — the pa/pb sides — so an untruncated
  * plan would double per round).
  *
  * Exactness: p is held in integer micro units; every division is the
  * shared round-half-up integer `div` fold ((2a+b) div 2b, all values
  * non-negative), so rounds are association-order-free and an external
  * engine replays the fit bit-for-bit (the gate unrolls rounds as CTEs).
  * Strengths are clamped to ≥ 1 micro so a chronic loser can never zero
  * the p_i + p_j denominator. Long headroom: n_ij · 10¹² must stay
  * below 2⁶³ — n_ij ≤ ~9.2 · 10⁶ games per pair, checked at fit time
  * (a pair census that hot should be capped upstream anyway).
  */
object Preference {

  private val M = 1000000L // micro scale

  /** Round-half-up non-negative integer division as a SQL fragment. */
  private def divRound(num: String, den: String): String =
    s"(2 * ($num) + ($den)) div (2 * ($den))"

  /** Pairwise win/game census from a raw comparison log.
    *
    * @param comparisons frame with `itemA`, `itemB`, `winA` (boolean);
    *                    itemA < itemB canonical order expected.
    */
  def pairCensus(comparisons: DataFrame): DataFrame =
    comparisons.groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_games"),
        sum(when(col("win_a"), 1L).otherwise(0L)).as("wins_a"))

  /** MM-fit strengths. Returns (item, p_micro, wins, games). */
  def bradleyTerry(pairs: DataFrame, rounds: Int = 5): DataFrame = {
    require(rounds >= 1, s"need at least one MM round, got $rounds")
    val spark = pairs.sparkSession
    import spark.implicits._

    // item census: total wins and games per item (both sides of the pair)
    // materialize the two censuses once: every round re-reads both, and
    // each round references p TWICE (pa/pb sides) — without truncation
    // the logical plan doubles per round (exponential analysis cost)
    val pc = pairs.localCheckpoint()
    val sides = pc.select(col("item_a").as("item"), col("wins_a").as("w"),
        col("n_games").as("n"))
      .unionByName(pc.select(col("item_b").as("item"),
        (col("n_games") - col("wins_a")).as("w"), col("n_games").as("n")))
    val items = sides.groupBy("item")
      .agg(sum("w").as("wins"), sum("n").as("games"))
      .localCheckpoint()
    val maxPairGames = pc.agg(max("n_games")).as[Long].head()
    require(maxPairGames <= Long.MaxValue / (M * M),
      s"pair census too hot for long micro math: $maxPairGames games on one pair")

    var p = items.select(col("item"), lit(M).as("p_micro"))
    var r = 0
    while (r < rounds) {
      // term_micro(i against j) = round(n_ij * 1e12 / (p_i + p_j))
      val joined = pc.as("pr")
        .join(p.as("pa"), col("pr.item_a") === col("pa.item"))
        .join(p.as("pb"), col("pr.item_b") === col("pb.item"))
        .select(col("pr.item_a").as("item_a"), col("pr.item_b").as("item_b"),
          col("pr.n_games").as("n_games"),
          expr(divRound(s"pr.n_games * ${M * M}", "pa.p_micro + pb.p_micro"))
            .as("term_micro"))
      val terms = joined.select(col("item_a").as("item"), col("term_micro"))
        .unionByName(joined.select(col("item_b").as("item"), col("term_micro")))
        .groupBy("item").agg(sum("term_micro").as("s_micro"))
      // raw update: round(W_i * 1e12 / S_i), clamped ≥ 1
      val raw = items.join(terms, "item")
        .select(col("item"),
          greatest(lit(1L), expr(divRound(s"wins * ${M * M}", "s_micro")))
            .as("raw_micro"))
      // LAZY pins (the Scc/CC discipline): the total's head() right
      // below materializes rawCp in the same job, and p's trivial
      // projection over the pinned blocks materializes inside the next
      // round's action — 3 driver-synced jobs per MM round become 1
      val rawCp = raw.localCheckpoint(false) // also serves the scalar total
      val total = rawCp.agg(sum("raw_micro")).as[Long].head()
      p = rawCp.select(col("item"),
          greatest(lit(1L), expr(divRound(s"raw_micro * $M", total.toString)))
            .as("p_micro"))
        .localCheckpoint(false)
      r += 1
    }
    items.join(p, "item").select("item", "p_micro", "wins", "games")
  }

  /** Supplier head-to-head comparisons synthesized from lineitem: two
    * suppliers meeting in one order compare on (extendedprice desc,
    * suppkey asc) — deterministic, total. Bounded fanout: ≤ C(7,2)
    * pairs per order.
    */
  def supplierComparisons(lineitem: DataFrame): DataFrame = {
    val li = lineitem.select(col("l_orderkey").as("ok"),
      col("l_suppkey").as("sk"), col("l_extendedprice").as("price"))
    li.as("x").join(li.as("y"), col("x.ok") === col("y.ok"))
      .filter(col("x.sk") < col("y.sk"))
      .select(col("x.sk").as("item_a"), col("y.sk").as("item_b"),
        (col("x.price") >= col("y.price")).as("win_a"))
  }

  /** Elo ratings — the ONLINE cousin of [[bradleyTerry]]: the rating
    * stream a live preference dashboard shows while the batch MM fit
    * runs nightly. Zero-sum update per game in arrival order:
    *
    *   E_w = 1 / (1 + 10^((r_l − r_w) / 1e6 / 400)),
    *   d = round(K · (1 − E_w)),  r_w += d,  r_l −= d
    *
    * with ratings in MICRO-points (init 1500 pts = 1.5e9). The
    * sequential dependency is INHERENT to Elo (each update reads both
    * players' current ratings) — no engine can order-free it — so the
    * honest distributed shape is league-partitioned: games shuffle once
    * on the league key and each league folds in arrival order inside
    * its task (`flatMapGroups`), state = one (item → rating) map per
    * league bounded by the league's roster. Cross-league ratings are
    * independent by construction (leagues never share games — the
    * caller's partitioning contract). d ≥ 0 always (E_w ≤ 1), so JVM
    * and SQL round agree, and 10^x is the one libm call — its ulp
    * noise is 7 orders below the rounding threshold (same budget as
    * the NB log10 weights).
    *
    * Input: (league, seq, winner, loser) with seq a total order within
    * the league. Output: (league, item, rating_micro, games, wins).
    */
  def eloRatings(games: DataFrame, kMicro: Long = 32000000L,
                 initMicro: Long = 1500000000L): DataFrame = {
    val spark = games.sparkSession
    import spark.implicits._
    games.select(col("league").cast("long"), col("seq").cast("long"),
        col("winner").cast("long"), col("loser").cast("long"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (league, it) =>
        val sorted = it.toIndexedSeq.sortBy(_._2)
        val rating = scala.collection.mutable.LinkedHashMap[Long, Long]()
        val played = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
        val won = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
        for ((_, _, w, l) <- sorted) {
          val rw = rating.getOrElse(w, initMicro)
          val rl = rating.getOrElse(l, initMicro)
          val ew = 1.0d / (1.0d +
            math.pow(10.0d, (rl - rw).toDouble / 1e6 / 400.0d))
          val d = Clustering.roundHalfAway(kMicro * (1.0d - ew))
          rating(w) = rw + d
          rating(l) = rl - d
          played(w) += 1; played(l) += 1; won(w) += 1
        }
        rating.iterator.map { case (item, r) =>
          (league, item, r, played(item), won(item))
        }
      }
      .toDF("league", "item", "rating_micro", "games", "wins")
  }
}
