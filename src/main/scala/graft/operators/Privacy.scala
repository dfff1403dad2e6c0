package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy governance for a training corpus: k-anonymity / l-diversity
  * audits over quasi-identifier columns (Sweeney 2002; Machanavajjhala
  * et al. 2007) and ε-differentially-private noisy counts (Dwork et al.
  * 2006, Laplace mechanism) for releasing corpus statistics. Complements
  * [[Forget]] (row deletion on request) with the AGGREGATE side of
  * compliance: "can this published slice re-identify anyone, and can we
  * publish its counts at all?" Beyond-reference surface (SURVEY §2.13).
  *
  * Scale shape: every audit runs at QUASI-IDENTIFIER-GROUP grain — one
  * partial-agg shuffle that collapses 100 TB of rows to the QI census
  * (bounded by the product of QI cardinalities, e.g. lang × length
  * bucket ≈ 10³–10⁶ cells) before anything else happens. l-diversity
  * adds one more partial agg (distinct sensitive values fold map-side).
  * [[dpCounts]] is the same census plus a SHUFFLE-FREE noise projection:
  * the Laplace draw derives from md5 of the group key (the [[Dsir]]
  * Gumbel pattern), so no RNG state, no driver involvement, and the
  * release is reproducible bit-for-bit given (seed, ε) — which is what
  * makes it externally auditable (the DuckDB oracle replays the noise).
  *
  * Floating-point contract (same as [[Retrieval]]): each noise value is
  * ONE fixed-order double chain rounded once to integer micro units, so
  * the oracle replays it exactly; u = (60-bit md5 prefix + 0.5)/2⁶⁰
  * never hits 0, 0.5 or 1, keeping ln's argument in (0, 1).
  */
object Privacy {

  /** Quasi-identifier census with the anonymity verdict: one row per
    * distinct QI tuple, (quasi..., group_size, anonymous). A group of
    * size < k means its members are re-identifiable among fewer than k
    * candidates by an attacker who knows the QI values.
    */
  def kAnonymityAudit(df: DataFrame, quasi: Seq[Column], k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasi: _*)
      .agg(count(lit(1)).as("group_size"))
      .withColumn("anonymous", col("group_size") >= k)
  }

  /** One-row release-gate summary over a [[kAnonymityAudit]] frame:
    * (n_groups, risky_groups, n_rows, risky_rows, risky_row_ppm). The
    * number a data-release review actually reads — ppm is micro-exact
    * (round(frac·1e6)) so it hashes identically across engines.
    */
  def anonymitySummary(audit: DataFrame): DataFrame =
    audit.agg(
      count(lit(1)).as("n_groups"),
      sum(when(!col("anonymous"), 1L).otherwise(0L)).as("risky_groups"),
      sum(col("group_size")).as("n_rows"),
      sum(when(!col("anonymous"), col("group_size")).otherwise(0L))
        .as("risky_rows"))
      .withColumn("risky_row_ppm",
        round(col("risky_rows") * lit(1e6) / col("n_rows")).cast("long"))

  /** l-diversity: a k-anonymous group is still unsafe if everyone in it
    * shares the same SENSITIVE value (the homogeneity attack) — each QI
    * group must contain at least l distinct sensitive values. Output:
    * (quasi..., group_size, n_sensitive, diverse). Distinct-count folds
    * map-side at (QI, sensitive) grain before the final census agg.
    */
  def lDiversityAudit(df: DataFrame, quasi: Seq[Column], sensitive: Column,
                      l: Int): DataFrame = {
    require(l >= 2, s"l must be >= 2, got $l")
    df.groupBy(quasi: _*)
      .agg(count(lit(1)).as("group_size"),
        count_distinct(sensitive).as("n_sensitive"))
      .withColumn("diverse", col("n_sensitive") >= l)
  }

  /** Suppression enforcement: keep only rows whose QI group reaches size
    * k. One census shuffle + one broadcast-or-shuffle semi join on the
    * QI tuple — the census side is group-grain, so at 100 TB the join's
    * build side is the (small) census, not the corpus.
    */
  def enforceKAnonymity(df: DataFrame, quasi: Seq[String], k: Int): DataFrame = {
    val cols = quasi.map(col)
    val safe = kAnonymityAudit(df, cols, k)
      .where(col("anonymous")).select(quasi.map(col): _*)
    df.join(safe, quasi, "left_semi")
  }

  /** Mondrian multidimensional k-anonymity (LeFevre, DeWitt,
    * Ramakrishnan — ICDE 2006): GENERALIZE numeric quasi-identifiers
    * into ranges instead of suppressing rows — the utility-preserving
    * answer where [[enforceKAnonymity]] drops every rare combination.
    * Greedy median partitioning: recursively split the partition on the
    * widest (globally normalized) QI dimension at its weighted median,
    * as long as both halves keep ≥ k rows; dimensions that cannot split
    * fall through to the next-widest; a partition no dimension can
    * split is final and every row in it reports the partition's
    * [lo, hi] range per dimension.
    *
    * Determinism contract (what makes the recursion oracle-replayable):
    * widths compare by exact cross-multiplication against the global
    * domain widths (ties → lower dimension index); the weighted median
    * is the smallest member value whose cumulative count reaches
    * (total + 1) div 2; every quantity is an exact long.
    *
    * Scale shape: the recursion runs on the QI CENSUS (distinct tuples
    * + counts) collected to the driver — the census is bounded by the
    * QI domain product (quasi-identifiers are coarse by definition:
    * age buckets, region codes; the [[graft.operators.Pca]]/model-frame
    * driver contract), while the corpus-sized work is the one census
    * shuffle and the broadcast map-back join the caller applies. A
    * total below k yields one final (suppress-or-accept) partition
    * flagged `anonymous = false`.
    *
    * Output: census grain — (qi dims..., dim_lo/dim_hi per dim,
    * ec_size, anonymous).
    */
  def mondrian(df: DataFrame, quasi: Seq[String], k: Int): DataFrame = {
    require(quasi.nonEmpty, "mondrian needs at least one quasi-identifier")
    require(k >= 2, s"k must be >= 2, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val census: Array[(Array[Long], Long)] = df
      .groupBy(quasi.map(c => col(c).cast("long").as(c)): _*)
      .agg(count(lit(1)).as("cnt"))
      .collect()
      .map { r =>
        // fail fast with the offending columns: groupBy happily emits a
        // null-QI group, and r.getLong on it would NPE deep in the
        // recursion with no hint which column was unclean (the
        // audit/suppression paths tolerate null groups; generalization
        // into [lo, hi] ranges has no meaningful range for null —
        // callers must impute or filter upstream)
        val nulls = quasi.indices.filter(r.isNullAt)
        require(nulls.isEmpty,
          s"mondrian: null quasi-identifier value(s) in column(s) " +
            s"${nulls.map(quasi).mkString(", ")} — filter or impute " +
            "null QI values before generalization")
        (quasi.indices.map(i => r.getLong(i)).toArray, r.getLong(quasi.length))
      }
    val d = quasi.length
    val globalW = Array.tabulate(d) { i =>
      val vs = census.map(_._1(i))
      math.max(vs.max - vs.min, 1L)
    }
    final case class Part(members: Array[(Array[Long], Long)]) {
      val total: Long = members.map(_._2).sum
      def width(i: Int): Long = {
        val vs = members.map(_._1(i))
        vs.max - vs.min
      }
    }
    // try dims by (normalized width desc, index asc); split at the
    // weighted median; both halves must keep >= k
    def tryDim(p: Part, i: Int): Option[(Part, Part)] = {
      val byV = p.members.sortBy(_._1(i))
      val half = (p.total + 1) / 2
      var cum = 0L
      var med = byV.head._1(i)
      var found = false
      val it = byV.iterator
      while (it.hasNext && !found) {
        val m = it.next(); cum += m._2
        if (cum >= half) { med = m._1(i); found = true }
      }
      val (lhs, rhs) = p.members.partition(_._1(i) <= med)
      val ln = lhs.map(_._2).sum
      if (ln >= k && p.total - ln >= k && rhs.nonEmpty)
        Some((Part(lhs), Part(rhs)))
      else None
    }
    def split(p: Part): Option[(Part, Part)] = {
      if (p.total < 2L * k) return None
      val order = (0 until d).sortWith { (a, b) =>
        // exact cross-multiplication in BigInt: raw long products
        // overflow silently for wide 64-bit QI domains (width ~ 2^32
        // suffices), corrupting the widest-dimension choice and thus
        // the deterministic split order the oracle replays; this is
        // driver-side census-grain code, so BigInt cost is irrelevant
        val cmp = BigInt(p.width(a)) * globalW(b) - BigInt(p.width(b)) * globalW(a)
        if (cmp.signum != 0) cmp.signum > 0 else a < b
      }
      var res: Option[(Part, Part)] = None
      val oi = order.iterator
      while (res.isEmpty && oi.hasNext) res = tryDim(p, oi.next())
      res
    }
    val finals = scala.collection.mutable.ArrayBuffer[Part]()
    var work = List(Part(census))
    while (work.nonEmpty) {
      val p = work.head; work = work.tail
      split(p) match {
        case Some((a, b)) => work = a :: b :: work
        case None => finals += p
      }
    }
    val rows = finals.iterator.flatMap { p =>
      val lo = Array.tabulate(d)(i => p.members.map(_._1(i)).min)
      val hi = Array.tabulate(d)(i => p.members.map(_._1(i)).max)
      p.members.iterator.map { case (vs, _) =>
        (vs.toSeq ++ lo.toSeq ++ hi.toSeq ++
          Seq(p.total, p.total >= k)).toSeq
      }
    }.toSeq
    val schema = org.apache.spark.sql.types.StructType(
      quasi.map(c => org.apache.spark.sql.types.StructField(c,
        org.apache.spark.sql.types.LongType)) ++
        quasi.map(c => org.apache.spark.sql.types.StructField(s"${c}_lo",
          org.apache.spark.sql.types.LongType)) ++
        quasi.map(c => org.apache.spark.sql.types.StructField(s"${c}_hi",
          org.apache.spark.sql.types.LongType)) ++
        Seq(org.apache.spark.sql.types.StructField("ec_size",
          org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("anonymous",
            org.apache.spark.sql.types.BooleanType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map(org.apache.spark.sql.Row.fromSeq), 1),
      schema)
  }

  /** ε-DP noisy counts over `dims`: true count + Laplace(1/ε) noise
    * (sensitivity 1 for counting queries — one person changes one row by
    * at most 1... at DOCUMENT grain; per-user contributions need a
    * contribution cap upstream, documented not enforced here). Noise is
    * the inverse-CDF transform of a deterministic md5 uniform keyed on
    * (seed, dims), so the release is reproducible and auditable; counts
    * may legitimately go negative (clamping would bias the release).
    * Output: (dims..., noisy_micro, noisy_count) — the TRUE count is
    * deliberately not a column (it must not ride along in a DP release);
    * epsilon rides in the caller's metadata.
    */
  def dpCounts(df: DataFrame, dims: Seq[String], epsilon: Double,
               seed: Long = 42L): DataFrame = {
    require(epsilon > 0, s"epsilon must be > 0, got $epsilon")
    val key = concat(lit("dp:") +: lit(seed.toString) +:
      dims.map(d => concat(lit(":"), coalesce(col(d).cast("string"), lit("\u0000")))): _*)
    // u in (0,1): 60-bit md5 prefix, +0.5 so u is never 0, 0.5 or 1
    val u = (conv(substring(md5(key), 1, 15), 16, 10).cast("double") + 0.5d) /
      1.152921504606846976e18d
    // clamp: the "u never hits 1" claim fails at double precision (a
    // 60-bit prefix within 64 of 2^60 rounds to 2^60, u = 1.0, ln(0)
    // -> infinite noisy count, ~5e-18 per group); the clamp caps noise
    // magnitude at ~20.6/epsilon instead of infinity
    val c = greatest(least(u - 0.5d, lit(0.499999999d)), lit(-0.499999999d))
    // Laplace inverse CDF: −b·sgn(c)·ln(1−2|c|), b = 1/ε; one double
    // chain, one micro round — replayed verbatim by the oracle.
    val noise = -(lit(1.0d) / epsilon) * signum(c) * log(lit(1.0d) - lit(2.0d) * abs(c))
    df.groupBy(dims.map(col): _*)
      .agg(count(lit(1)).as("true_cnt"))
      .withColumn("noisy_micro",
        (col("true_cnt") * lit(1000000L) + round(noise * 1e6).cast("long"))
          .cast("long"))
      .select(dims.map(col) :+
        col("noisy_micro") :+
        round(col("noisy_micro").cast("double") / 1e6, 6).as("noisy_count"): _*)
  }
}
