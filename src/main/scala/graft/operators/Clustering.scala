package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.Random

/** Embedding-space clustering and semantic deduplication (beyond-reference
  * surface; the reference has no vector operators — cf. SURVEY §2.13).
  *
  *  - [[kmeans]]: distributed Lloyd's iteration. The E-step (assignment)
  *    is a shuffle-free argmin over broadcast centroid literals (same
  *    ‖c‖²−2·v·c trick as [[Similarity.ivfTopK]]); the M-step is a
  *    posexplode + (cluster, pos) partial aggregation — map-side combine
  *    collapses every task to ≤ k·dim rows before the single exchange, so
  *    driver traffic is k·dim doubles per iteration regardless of corpus
  *    size. No corpus collect, no per-row UDF.
  *  - [[semanticPrunePairs]] / [[semanticDedup]]: SemDeDup-style semantic
  *    near-duplicate pruning (cluster first, then compare only within a
  *    cluster — the self-join is keyed by cluster id, never all-pairs; at
  *    100 TB each cluster's bucket is a fraction 1/k of the corpus and the
  *    join shuffles 8-byte ids + vectors once).
  */
object Clustering {

  /** score(v, c) = ‖c‖² − 2 v·c — ranks identically to squared L2 distance
    * (‖v‖² is constant across centroids), one fused dot per centroid.
    * Shared with [[Similarity.ivfTopKWith]] — the oracles replay this
    * exact arithmetic, so there must be ONE definition of it.
    */
  private[operators] def score(vec: Column, c: Array[Double]): Column =
    lit(c.map(x => x * x).sum) -
      lit(2.0d) * graft.functions.VectorOps.dot(vec, typedLit(c.toSeq))

  /** Nearest-centroid index (0-based), shuffle-free. Each distance
    * expression appears exactly once inside an array argmin; ties break to
    * the lowest centroid index (array_position returns the first match).
    */
  def assignColumn(vec: Column, centroids: Array[Array[Double]]): Column = {
    require(centroids.nonEmpty, "need at least one centroid")
    val ds = array(centroids.map(c => score(vec, c)): _*)
    (array_position(ds, array_min(ds)) - 1).cast("int")
  }

  /** The `nProbe` nearest centroid indices (ascending score order, ties
    * to the lowest index via the struct sort) — multi-probe cluster
    * lookup for query-side operators ([[Similarity.ivfTopKWith]],
    * [[Decontaminate.semanticReport]]). ONE definition so every oracle
    * replays the same probe arithmetic.
    */
  def probesColumn(vec: Column, centroids: Array[Array[Double]],
                   nProbe: Int): Column = {
    require(centroids.nonEmpty, "need at least one centroid")
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    val ds = centroids.zipWithIndex.map { case (c, i) =>
      struct(score(vec, c).as("d"), lit(i).as("i"))
    }
    slice(array_sort(array(ds: _*)), 1, nProbe).getField("i")
  }

  /** Corpus + `cluster_id` column: nearest centroid per row. */
  def assign(corpus: DataFrame, centroids: Array[Array[Double]],
             vecCol: String = "embedding",
             outCol: String = "cluster_id"): DataFrame =
    corpus.withColumn(outCol, assignColumn(col(vecCol), centroids))

  /** Per-label micro-quantized centroid census: (label, pos, s_micro,
    * n) with s_micro = Σ round(x·1e6) — float sums are association-
    * order-dependent, integer micro sums are not, so the derived
    * centroids (and everything downstream) replay exactly in an
    * external oracle. Census is labels × dim rows.
    */
  def labelCentroidCensus(labeled: DataFrame, labelCol: String = "label",
                          vecCol: String = "embedding"): DataFrame =
    labeled.select(col(labelCol).as("label"), posexplode(col(vecCol)))
      .groupBy("label", "pos")
      .agg(sum(round(col("col") * 1e6).cast("long")).as("s_micro"),
        count(lit(1)).as("n"))

  /** Driver-side centroids from the census: label → coordinate array,
    * c_i = round(s_micro/n)/1e6 (micro-mean as an integer, then the
    * fixed /1e6 — deterministic on any engine). Labels ascending.
    */
  def labelCentroids(labeled: DataFrame, labelCol: String = "label",
                     vecCol: String = "embedding"): Seq[(Int, Array[Double])] =
    labelCentroidCensus(labeled, labelCol, vecCol)
      .collect()
      .groupBy(_.getInt(0))
      .toSeq
      .map { case (label, rows) =>
        val arr = rows.sortBy(_.getInt(1)).map(r =>
          math.round(r.getLong(2).toDouble / r.getLong(3)).toDouble / 1e6)
        (label, arr)
      }
      .sortBy(_._1)

  /** Nearest-centroid (Rocchio) classification: label whose centroid
    * minimizes squared L2, ties to the lowest label. The model is the
    * tiny (labels × dim) centroid set shipped in the plan — serving is
    * a shuffle-free scan, the same few-shot labeling shape as
    * [[graft.operators.Classifier]]'s stateless serving. Output:
    * (idCol, pred_label).
    */
  def nearestCentroid(unlabeled: DataFrame,
                      centroids: Seq[(Int, Array[Double])],
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame = {
    require(centroids.nonEmpty, "need at least one labeled class")
    val scored = centroids.map { case (label, c) =>
      struct(score(col(vecCol), c).as("d"), lit(label).as("l"))
    }
    unlabeled.select(col(idCol),
      array_sort(array(scored: _*)).getItem(0).getField("l").as("pred_label"))
  }

  /** Simplified silhouette (per-point vs CENTROIDS, the standard
    * large-scale variant — true silhouette's all-pairs a(i)/b(i) is
    * O(n²)): s = (d₂ − d₁)/max(d₁, d₂) with d₁ the distance to the own
    * (nearest) centroid and d₂ to the best other. Per-point values are
    * micro-quantized before the cluster mean so the rollup is an exact
    * integer sum (the association-order rule). Shuffle: ONE cluster-
    * grain partial agg; everything per-point is codegen projection.
    * Output: (cluster_id, n, mean_sil).
    */
  def silhouette(corpus: DataFrame, centroids: Array[Array[Double]],
                 vecCol: String = "embedding"): DataFrame = {
    require(centroids.length >= 2, "silhouette needs >= 2 centroids")
    val ds = centroids.zipWithIndex.map { case (c, i) =>
      struct(score(col(vecCol), c).as("d"), lit(i).as("i"))
    }
    val dv2 = graft.functions.VectorOps.dot(col(vecCol), col(vecCol))
    val sorted = array_sort(array(ds: _*))
    val d1 = sqrt(greatest(dv2 + sorted.getItem(0).getField("d"), lit(0d)))
    val d2 = sqrt(greatest(dv2 + sorted.getItem(1).getField("d"), lit(0d)))
    corpus
      .select(sorted.getItem(0).getField("i").as("cluster_id"),
        // degenerate max(d1,d2) = 0 (duplicate centroids at the point)
        // → s = 0 by convention, not a NaN→long ANSI error
        when(greatest(d1, d2) === 0d, lit(0L))
          .otherwise(round((d2 - d1) / greatest(d1, d2) * 1e6).cast("long"))
          .as("_s_micro"))
      .groupBy("cluster_id")
      .agg(count(lit(1)).as("n"), sum(col("_s_micro")).as("_sum"))
      .select(col("cluster_id"), col("n"),
        round(col("_sum").cast("double") / col("n") / 1e6, 6).as("mean_sil"))
  }

  final case class KMeansResult(centroids: Array[Array[Double]],
                                iterations: Int, converged: Boolean)

  private def dist2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Lloyd's k-means. Deterministic for a fixed (seed, maxIter): the init
    * pool is the top-max(16k, 256) rows by vector hash — a TakeOrdered
    * (per-partition top-N + driver merge, no full sort/shuffle), so the
    * pool is spread uniformly over the WHOLE corpus rather than its head
    * (a head limit() silently misses clusters when input files are
    * cluster-ordered, which real corpora usually are). One extra corpus
    * pass amortized against the maxIter assignment passes Lloyd's does
    * anyway. Seeds then come from farthest-first traversal over the pool —
    * random init can draw two seeds from one true cluster and converge to
    * a merged/split local optimum; max-min picks one seed per
    * well-separated cluster by construction (O(pool²·dim), driver-cheap).
    * Every subsequent step is a deterministic aggregate. Empty clusters
    * keep their previous centroid.
    *
    * @param tol convergence threshold on the max centroid displacement
    *            (L2); iteration stops at `maxIter` regardless.
    */
  def kmeans(corpus: DataFrame, k: Int, maxIter: Int = 20, seed: Long = 42L,
             tol: Double = 1e-4, vecCol: String = "embedding"): KMeansResult = {
    require(k >= 1, s"k must be >= 1, got $k")
    val pool: Array[Array[Double]] = corpus
      .select(col(vecCol))
      .orderBy(xxhash64(col(vecCol), lit(seed)))
      .limit(math.max(k * 16, 256)).collect()
      .map(_.getSeq[AnyRef](0).map(_.asInstanceOf[Number].doubleValue()).toArray)
    require(pool.length >= k, s"corpus has fewer than k=$k vectors")
    val shuffled: Array[Array[Double]] =
      new Random(seed).shuffle(pool.toSeq).toArray
    val chosen = scala.collection.mutable.ArrayBuffer(shuffled(0))
    while (chosen.size < k) {
      // next seed = pool vector farthest from its nearest chosen seed
      var best = 0; var bestD = -1.0
      var i = 0
      while (i < shuffled.length) {
        val d = chosen.iterator.map(c => dist2(shuffled(i), c)).min
        if (d > bestD) { bestD = d; best = i }
        i += 1
      }
      chosen += shuffled(best)
    }
    var centroids: Array[Array[Double]] = chosen.toArray
    val dim = centroids(0).length

    var it = 0
    var moved = Double.MaxValue
    while (it < maxIter && moved > tol) {
      // M-step: element-wise sums per cluster. posexplode multiplies rows
      // by dim, but the (cluster_id, pos) hash aggregate partial-combines
      // map-side, so the exchange carries at most k·dim rows per task.
      val sums = assign(corpus, centroids, vecCol)
        .select(col("cluster_id"), posexplode(col(vecCol)).as(Seq("pos", "x")))
        .groupBy("cluster_id", "pos")
        .agg(sum(col("x").cast("double")).as("s"), count(lit(1)).as("n"))
        .collect()

      val acc = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      sums.foreach { r =>
        val cid = r.getInt(0)
        acc(cid)(r.getInt(1)) = r.getDouble(2)
        counts(cid) = r.getLong(3)
      }
      moved = 0.0
      val next = centroids.map(_.clone()) // empty clusters stay put
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          val m = acc(c).map(_ / counts(c))
          var d2 = 0.0
          var i = 0
          while (i < dim) { val d = m(i) - centroids(c)(i); d2 += d * d; i += 1 }
          moved = math.max(moved, math.sqrt(d2))
          next(c) = m
        }
        c += 1
      }
      centroids = next
      it += 1
    }
    KMeansResult(centroids, it, moved <= tol)
  }

  /** COLD-START replayable k-means — [[kmeans]]'s farthest-first
    * seeding maximizes cluster quality but its driver-side max-min
    * traversal over a hashed pool has no SQL replay, so its gate could
    * only ever be self-asserting. This variant trades the seeding
    * heuristic for full oracle replay: seeds are the `k` rows with the
    * smallest `md5("seed:" || id)` (the repo's portable-uniform
    * ladder — a deterministic uniform draw over the WHOLE corpus both
    * engines can compute, ties → id), snapped to the micro grid so the
    * carried state equals what an oracle reconstructs, then `rounds`
    * exact Lloyd rounds through [[refineCentroids]] (micro M-step,
    * snap-to-grid empty clusters). Output = the refineCentroids census
    * frame, (round, cluster_id, pos, c_micro, n), cluster_id = ladder
    * order.
    *
    * Scale: the seed draw is a TakeOrdered (per-partition top-k by the
    * md5 key + driver merge of k rows — no sort, no extra shuffle);
    * everything after is refineCentroids' one partial-agg census
    * shuffle per round. Random seeding can land two seeds in one true
    * cluster where farthest-first would not — when cluster quality
    * matters more than replayability, use [[kmeans]]; when the DAILY
    * loop matters, cold-start once and [[refineCentroids]] from
    * yesterday's centroids thereafter.
    */
  def kmeansCold(corpus: DataFrame, k: Int, rounds: Int = 3,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val seeds = corpus
      .select(col(idCol).cast("string").as("_id"), col(vecCol))
      .orderBy(md5(concat(lit("seed:"), col("_id"))), col("_id"))
      .limit(k).collect()
    require(seeds.length == k, s"corpus has fewer than k=$k vectors")
    val init: Array[Array[Double]] = seeds.map(
      _.getSeq[AnyRef](1).map(n =>
        roundHalfAway(n.asInstanceOf[Number].doubleValue() * 1e6)
          .toDouble / 1e6).toArray)
    refineCentroids(corpus, init, rounds, vecCol)
  }

  /** Round-half-away-from-zero — matches SQL round() (Spark and DuckDB
    * both round away from zero) where Scala's math.round is
    * floor(x+0.5) and disagrees on NEGATIVE exact halves (-1.5 → -1 vs
    * -2). Centroid means can be negative, so a replayable driver-side
    * rounding must use this, not math.round.
    */
  private[graft] def roundHalfAway(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  /** Warm-start Lloyd refresh — the DAILY-LOOP clustering update: run
    * `rounds` exact E+M steps from PERSISTED centroids instead of
    * re-seeding [[kmeans]] from scratch, so cluster identities stay
    * stable across corpus versions (the property SemDeDup's
    * within-cluster joins and the IVF lists depend on day over day) and
    * the cost is rounds × one assignment scan — same shape as the
    * warm-start PageRank.
    *
    * Replayable by construction: the E-step is the shared [[assign]]
    * argmin (raw-double arithmetic both engines execute identically);
    * the M-step micro-quantizes elements BEFORE the sum (exact long
    * census) and the new centroid coordinate is the integer micro mean
    * (half away from zero — SQL round semantics). Empty clusters SNAP
    * to their previous coordinate's micro grid, so the carried state
    * always equals the emitted census and an oracle reconstructs round
    * r+1 from round r's output alone.
    *
    * Scale: per round ONE partial-agg shuffle to the k·dim census;
    * driver traffic k·dim rows per round. Output, all rounds:
    * (round, cluster_id, pos, c_micro, n).
    */
  def refineCentroids(corpus: DataFrame, init: Array[Array[Double]],
                      rounds: Int = 3,
                      vecCol: String = "embedding"): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(init.nonEmpty, "need at least one centroid")
    val dim = init(0).length
    var centroids = init
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Int, Int, Long, Long)]
    for (r <- 1 to rounds) {
      val census = assign(corpus, centroids, vecCol)
        .select(col("cluster_id"), posexplode(col(vecCol)).as(Seq("pos", "x")))
        .groupBy("cluster_id", "pos")
        .agg(sum(round(col("x").cast("double") * 1e6).cast("long")).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val nextMicro = Array.tabulate(centroids.length, dim)((c, p) =>
        roundHalfAway(centroids(c)(p) * 1e6)) // empty clusters snap to grid
      val counts = new Array[Long](centroids.length)
      census.foreach { row =>
        nextMicro(row.getInt(0))(row.getInt(1)) =
          roundHalfAway(row.getLong(2).toDouble / row.getLong(3))
        counts(row.getInt(0)) = row.getLong(3)
      }
      for (c <- centroids.indices; p <- 0 until dim)
        out += ((r, c, p, nextMicro(c)(p), counts(c)))
      centroids = nextMicro.map(_.map(_.toDouble / 1e6))
    }
    val sp = corpus.sparkSession
    import sp.implicits._
    out.toSeq.toDF("round", "cluster_id", "pos", "c_micro", "n")
  }

  /** Embedding outlier pruning — flag vectors that sit abnormally far
    * from their OWN cluster's centroid by the robust MAD rule
    * (|d − median| > k·MAD per cluster): encoder glitches, corrupt
    * rows, off-manifold junk that SemDeDup would otherwise keep
    * (far from everything ⇒ never a near-dup) and ANN recall pays
    * for. Distances micro-quantize once (exact long), median and MAD
    * are ⌈n/2⌉-th order statistics per cluster (the
    * [[CorpusStats.datasetCardQuantiles]] inclusive definition), and
    * the flag compare is pure integer arithmetic — fully replayable.
    *
    * Scale: the rank windows partition BY CLUSTER (bounded groups —
    * one mega-cluster straggles a window partition; the histogram-
    * census `HistQuantile` path is the escape hatch, the
    * [[HashSplit.capPerGroup]] doctrine). Output: flagged rows
    * (vec_id, cluster_id, d_micro, med_micro, mad_micro).
    */
  def embeddingOutliers(corpus: DataFrame, centroids: Array[Array[Double]],
                        k: Long = 3L, idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val ds = array(centroids.map(c => score(col(vecCol), c)): _*)
    val base = corpus.select(col(idCol).as("vec_id"),
      assignColumn(col(vecCol), centroids).as("cluster_id"),
      round((array_min(ds)
        + graft.functions.VectorOps.dot(col(vecCol), col(vecCol))) * 1e6)
        .cast("long").as("d_micro"))
    def medianOf(df: DataFrame, valueCol: String,
                 outCol: String): DataFrame = {
      val w = Window.partitionBy("cluster_id")
        .orderBy(col(valueCol).asc, col("vec_id").asc)
      df.withColumn("_rn", row_number().over(w))
        .withColumn("_n", count(lit(1)).over(Window.partitionBy("cluster_id")))
        .groupBy("cluster_id")
        .agg(max(when(col("_rn") === ceil(col("_n") * 0.5d), col(valueCol)))
          .as(outCol))
    }
    val med = medianOf(base, "d_micro", "med_micro")
    val withMed = base.join(broadcast(med), Seq("cluster_id"))
      .withColumn("_dev", abs(col("d_micro") - col("med_micro")))
    val mad = medianOf(withMed.select(col("vec_id"), col("cluster_id"),
      col("_dev").as("d_micro")), "d_micro", "mad_micro")
    withMed.join(broadcast(mad), Seq("cluster_id"))
      .where(col("_dev") > lit(k) * col("mad_micro"))
      .select("vec_id", "cluster_id", "d_micro", "med_micro", "mad_micro")
  }

  /** Clustering agreement — Adjusted Rand Index and Normalized Mutual
    * Information between two assignments of the same ids (yesterday vs
    * today after [[refineCentroids]], k-means vs label truth): did the
    * refresh keep cluster identities, or silently reshuffle the space
    * the within-cluster operators depend on?
    *
    * Exactness: everything reduces to the k_a × k_b CONTINGENCY census
    * (one id-grain join + one partial-agg shuffle — the only
    * corpus-grain work). ARI is pure integer combinatorics
    * (Σ C(n,2) terms in DECIMAL(38,0) accumulators, ONE double chain at
    * the end); MI and the entropies nano-round each census term before
    * the sum (ln is the only libm call — the [[Drift.tokenDivergence]]
    * rule), and NMI's 1e9 units cancel inside the final
    * mi/√(ha·hb) chain. Output one row:
    * (n, n_cells, ari, nmi) — null metrics where degenerate (a
    * single-cluster side has zero entropy; ARI's denominator vanishes
    * when both partitions are trivial).
    */
  def compareClusterings(a: DataFrame, b: DataFrame,
                         idCol: String = "vec_id",
                         clusterCol: String = "cluster_id"): DataFrame = {
    val j = a.select(col(idCol).as("id"), col(clusterCol).as("ca"))
      .join(b.select(col(idCol).as("id"), col(clusterCol).as("cb")),
        Seq("id"))
    val cells = j.groupBy("ca", "cb").agg(count(lit(1)).as("n"))
    val am = cells.groupBy("ca").agg(sum(col("n")).as("na"))
    val bm = cells.groupBy("cb").agg(sum(col("n")).as("nb"))
    val tot = cells.agg(sum(col("n")).as("nn"), count(lit(1)).as("cells"))
    def c2(c: Column): Column = (c * (c - lit(1L))).cast("decimal(38,0)")
    val joined = cells.join(broadcast(am), Seq("ca"))
      .join(broadcast(bm), Seq("cb")).crossJoin(broadcast(tot))
    val miTerm = round((col("n").cast("double") / col("nn"))
      * log(col("nn").cast("double") * col("n")
        / (col("na").cast("double") * col("nb"))) * 1e9).cast("long")
    val agg = joined.agg(
      first(col("nn")).as("n"), first(col("cells")).as("n_cells"),
      sum(c2(col("n"))).as("sij2"), sum(miTerm).as("mi_nano"))
    def hNano(m: DataFrame, cnt: String): DataFrame =
      m.crossJoin(broadcast(tot.select(col("nn").as("_t"))))
        .select(round(-(col(cnt).cast("double") / col("_t"))
            * log(col(cnt).cast("double") / col("_t")) * 1e9).cast("long")
          .as("h"), c2(col(cnt)).as("p"))
        .agg(sum(col("h")).as(s"h_$cnt"), sum(col("p")).as(s"s_$cnt"))
    val dn = col("nn").cast("double") * (col("nn") - lit(1L)) / lit(2.0d)
    agg.crossJoin(broadcast(hNano(am, "na")))
      .crossJoin(broadcast(hNano(bm, "nb")))
      .withColumn("nn", col("n"))
      .select(col("n"), col("n_cells"),
        when(abs((col("s_na").cast("double") / 2 + col("s_nb").cast("double") / 2) / 2
            - col("s_na").cast("double") / 2 * (col("s_nb").cast("double") / 2) / dn) > 0d,
          round((col("sij2").cast("double") / 2
              - col("s_na").cast("double") / 2 * (col("s_nb").cast("double") / 2) / dn)
            / ((col("s_na").cast("double") / 2 + col("s_nb").cast("double") / 2) / 2
              - col("s_na").cast("double") / 2 * (col("s_nb").cast("double") / 2) / dn),
            6)).as("ari"),
        when(col("h_na") > 0L && col("h_nb") > 0L,
          round(col("mi_nano").cast("double")
            / sqrt(col("h_na").cast("double") * col("h_nb")), 6)).as("nmi"))
  }

  /** Within-cluster semantic-duplicate pairs (id_a < id_b, cosine ≥ tau).
    * Cosine is rounded to 6 dp BEFORE the threshold compare so the
    * keep/prune frontier is engine-portable (the oracle replays the same
    * rounded compare). Comparisons never cross clusters — that is the
    * SemDeDup contract AND what makes the operator scale: the self-join is
    * an equi-join on cluster_id. Unbalanced clusters skew the join; AQE
    * skew-split or [[Skew]] salting applies unchanged since the join key
    * is a plain int column.
    */
  def semanticPrunePairs(corpus: DataFrame, centroids: Array[Array[Double]],
                         tau: Double, idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame = {
    val assigned = assign(corpus, centroids, vecCol)
    val a = assigned.select(col("cluster_id"), col(idCol).as("id_a"),
      col(vecCol).as("_va"))
    val b = assigned.select(col("cluster_id"), col(idCol).as("id_b"),
      col(vecCol).as("_vb"))
    a.join(b, Seq("cluster_id"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine",
        round(graft.functions.VectorOps.cosine(col("_va"), col("_vb")), 6))
      .where(col("cosine") >= tau)
      .select(col("cluster_id"), col("id_a"), col("id_b"), col("cosine"))
  }

  /** SemDeDup survivors, one-pass policy: drop every doc that has ANY
    * lower-id neighbor at cosine ≥ tau within its cluster.
    *
    * Policy fine print — this is neither greedy-sequential nor transitive
    * closure, deliberately: on a chain a<b<c with a~b and b~c but a≁c,
    * greedy (process ascending, compare against SURVIVORS only) would
    * keep c, and so would dropping whole ≥tau-components keep only a;
    * this one-pass rule drops both b and c. It needs no iteration and no
    * state, which is why it is the cheap default; near-dup chains whose
    * ends are genuinely dissimilar lose their tails. When cluster-exact
    * semantics matter, use [[semanticDedupClusters]] (transitive closure
    * via distributed connected components, keep-min-per-component — the
    * same closure contract as [[Dedup.dedupClusters]]).
    *
    * On EXACT-duplicate-heavy corpora run [[Dedup.exactDeduped]] first:
    * m identical vectors land in one cluster and cost m²/2 cosine
    * comparisons here (measured on the 8× copy-saturated scale probe),
    * whereas the exact collapse removes them for one hash-groupBy — the
    * same composition contract as [[Dedup.nearDuplicateClusters]].
    */
  def semanticDedup(corpus: DataFrame, centroids: Array[Array[Double]],
                    tau: Double, idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val pruned = semanticPrunePairs(corpus, centroids, tau, idCol, vecCol)
      .select(col("id_b").as(idCol)).distinct()
    corpus.join(pruned, Seq(idCol), "left_anti")
  }

  /** SemDeDup with transitive-closure semantics: connected components
    * over the ≥tau within-cluster pair graph (large-star/small-star, no
    * driver graph), keep the minimum id of each component. Costlier than
    * [[semanticDedup]] (O(log n) shuffle rounds over the pair edges) but
    * the membership contract is exact and matches the n-gram dedup
    * clusters ([[Dedup.dedupClusters]]): a doc is dropped iff it is
    * REACHABLE from a lower-id doc through ≥tau links, never because a
    * pruned intermediate happened to sit next to it.
    */
  def semanticDedupClusters(corpus: DataFrame, centroids: Array[Array[Double]],
                            tau: Double, idCol: String = "vec_id",
                            vecCol: String = "embedding"): DataFrame = {
    val edges = semanticPrunePairs(corpus, centroids, tau, idCol, vecCol)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    val comp = ConnectedComponents.assign(edges) // (node, component=min id)
    val pruned = comp.where(col("node") =!= col("component"))
      .select(col("node").as(idCol))
    corpus.join(pruned, Seq(idCol), "left_anti")
  }
}
