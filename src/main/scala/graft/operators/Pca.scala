package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA over an embedding column — the dimensionality-reduction /
  * whitening step embedding pipelines run before clustering or ANN
  * indexing (decorrelated, variance-ordered axes make fixed-radius
  * thresholds meaningful and let a k-dim prefix carry most of the
  * signal).
  *
  * Split exactly like [[Clustering]]: the DISTRIBUTED part is one
  * partial-agg moment census ([[momentsMicro]] — d(d+1)/2 integer rows
  * regardless of corpus size), the DRIVER part is an eigen-decomposition
  * of the tiny d×d matrix ([[fit]] — cyclic Jacobi, deterministic), and
  * serving ([[project]]) is a shuffle-free projection against the
  * broadcast component literals. Driver traffic is d² longs up,
  * k·d doubles down — never corpus-sized.
  *
  * Portability: moments are micro-fixed (×10⁶, rounded, summed as
  * integers) so the census is exact and association-order-free — the
  * oracle replays every (i, j) cell bit for bit. At 100 TB corpus sizes
  * the long path can overflow (|micro|² ≈ 10¹² per row ⇒ ~10⁶ rows per
  * partial before 2⁶³); `momentsMicro(…, exact = false)` switches every
  * census sum to DECIMAL(38,0) — still integer-exact (micro values are
  * whole numbers; 38 digits ≈ 10²⁶ rows of 10¹² products before
  * saturation) and still one partial-agg shuffle, just wider
  * accumulators. [[fit]] accepts either schema; the gate pins the long
  * path and [[PcaSpec]] pins long ≡ decimal cell for cell.
  */
object Pca {

  /** Upper-triangle second-moment census: for every dim pair j ≥ i,
    * (i, j, n, s_i = Σ micro(v_i), s_j = Σ micro(v_j),
    * s_ij = Σ micro(v_i)·micro(v_j)) — everything needed for mean and
    * covariance in ONE partial-agg shuffle of ≤ d(d+1)/2 rows per task.
    * micro(x) = round(double(x)·10⁶) as long: float→double widening is
    * exact and round is HALF_UP in both engines, so the census is
    * engine-exact.
    *
    * `exact = true` (default, gate-pinned) accumulates in BIGINT — exact
    * up to ~10⁶ rows per partial at |micro| ≈ 10⁶. `exact = false` is
    * the 100 TB path: the same census with every sum in DECIMAL(38,0) —
    * still integer-exact (the inputs are whole micro units), headroom
    * ~10²⁶ rows, at the cost of wider (non-codegen-primitive) decimal
    * accumulators.
    */
  def momentsMicro(embs: DataFrame, vecCol: String = "embedding",
                   exact: Boolean = true): DataFrame = {
    val mv = transform(col(vecCol), x =>
      round(x.cast("double") * lit(1e6)).cast("long"))
    val dec = "decimal(38,0)"
    val exploded = embs.select(mv.as("mv"))
      .select(col("mv"), posexplode(col("mv")).as(Seq("i", "vi")))
      .select(col("i"), col("vi"), posexplode(col("mv")).as(Seq("j", "vj")))
      .where(col("j") >= col("i"))
      .groupBy("i", "j")
    if (exact)
      exploded.agg(count(lit(1)).as("n"), sum("vi").as("s_i"),
        sum("vj").as("s_j"), sum(col("vi") * col("vj")).as("s_ij"))
    else
      exploded.agg(count(lit(1)).as("n"),
        sum(col("vi").cast(dec)).as("s_i"),
        sum(col("vj").cast(dec)).as("s_j"),
        sum(col("vi").cast(dec) * col("vj").cast(dec)).as("s_ij"))
  }

  /** Merge moment censuses — the INCREMENTAL path: the (i, j) census is
    * a pure sum frame, so yesterday's persisted moments plus today's
    * batch moments ADD cell-wise to the whole-corpus moments exactly
    * (long or decimal alike), and [[fit]] runs on the merged census
    * with no re-scan of any earlier day. One vocabulary... d(d+1)/2-row
    * join; shapes must agree (same dim ⇒ same cells — the full-outer
    * densification guards ragged partial censuses from ever summing).
    */
  def mergeMoments(a: DataFrame, b: DataFrame): DataFrame = {
    val an = a.select(col("i"), col("j"), col("n").as("na"),
      col("s_i").as("sia"), col("s_j").as("sja"), col("s_ij").as("sija"))
    val bn = b.select(col("i"), col("j"), col("n").as("nb"),
      col("s_i").as("sib"), col("s_j").as("sjb"), col("s_ij").as("sijb"))
    an.join(bn, Seq("i", "j"), "full_outer")
      .select(col("i"), col("j"),
        (coalesce(col("na"), lit(0L)) + coalesce(col("nb"), lit(0L)))
          .as("n"),
        (coalesce(col("sia"), lit(0L)) + coalesce(col("sib"), lit(0L)))
          .as("s_i"),
        (coalesce(col("sja"), lit(0L)) + coalesce(col("sjb"), lit(0L)))
          .as("s_j"),
        (coalesce(col("sija"), lit(0L)) + coalesce(col("sijb"), lit(0L)))
          .as("s_ij"))
  }

  /** Fitted model: mean (original units), orthonormal components ordered
    * by descending eigenvalue, eigenvalues (covariance units).
    */
  final case class PcaModel(mean: Array[Double],
                            components: Array[Array[Double]],
                            eigenvalues: Array[Double]) {
    def dim: Int = mean.length
    def k: Int = components.length
  }

  /** Cyclic Jacobi eigen-decomposition of a symmetric matrix — O(d³) per
    * sweep on the DRIVER (d is an embedding width, ≤ a few thousand;
    * never corpus-sized). Deterministic: fixed sweep order, fixed
    * convergence threshold. Returns (eigenvalues, eigenvectors as rows)
    * sorted by descending eigenvalue with a deterministic sign
    * convention (largest-|coordinate| positive).
    *
    * PICO-SNAPPED state (what makes the whole decomposition
    * oracle-replayable — round-6 verdict #4): the input matrix and,
    * after every rotation, every touched cell of A and V snap to the
    * 1e-12 grid (SQL round semantics, half away from zero). Each
    * rotation's c/s chain is a handful of correctly-rounded IEEE ops
    * (+, −, ×, ÷, sqrt, abs) from snapped inputs, so any conceivable
    * cross-engine ulp wobble (< 1e-15 relative) is absorbed by the next
    * snap instead of compounding chaotically across thousands of
    * rotations — the `e_pca_project` DuckDB oracle replays the ENTIRE
    * iteration rotation for rotation, bit for bit. Precision cost is
    * ~5e-13 perturbation per rotation (immaterial against the 1e-12
    * convergence threshold); domain contract: |cells| must stay below
    * ~9e3 so x·1e12 fits the double integer range (any covariance of
    * micro-fixed embedding data is orders of magnitude inside this).
    */
  private[operators] def snapPico(x: Double): Double =
    Clustering.roundHalfAway(x * 1e12).toDouble / 1e12

  private[operators] def jacobiEigen(a0: Array[Array[Double]]):
      (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.map(snapPico))
    val v = Array.tabulate(d, d)((r, c) => if (r == c) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 64 && off > 1e-12) {
      off = 0.0
      for (p <- 0 until d; q <- p + 1 until d) {
        off += a(p)(q) * a(p)(q)
        if (math.abs(a(p)(q)) > 1e-300) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
          val t =
            if (theta == 0.0) 1.0
            else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          for (i <- 0 until d) {
            val aip = a(i)(p); val aiq = a(i)(q)
            a(i)(p) = c * aip - s * aiq
            a(i)(q) = s * aip + c * aiq
          }
          for (i <- 0 until d) {
            val api = a(p)(i); val aqi = a(q)(i)
            a(p)(i) = c * api - s * aqi
            a(q)(i) = s * api + c * aqi
          }
          for (i <- 0 until d) {
            val vip = v(i)(p); val viq = v(i)(q)
            v(i)(p) = c * vip - s * viq
            v(i)(q) = s * vip + c * viq
          }
          // snap every touched cell (rows/cols p and q of A, cols p, q
          // of V) — the oracle snaps the whole list, which is identical
          // because untouched cells are already on the grid
          for (i <- 0 until d) {
            a(i)(p) = snapPico(a(i)(p)); a(i)(q) = snapPico(a(i)(q))
            a(p)(i) = snapPico(a(p)(i)); a(q)(i) = snapPico(a(q)(i))
            v(i)(p) = snapPico(v(i)(p)); v(i)(q) = snapPico(v(i)(q))
          }
        }
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { i =>
      val col = Array.tabulate(d)(r => v(r)(i))
      // sign convention: the largest-|x| coordinate is positive — makes
      // the decomposition deterministic across runs/platforms
      val m = col.indices.maxBy(r => (math.abs(col(r)), -r))
      if (col(m) < 0) col.map(-_) else col
    }.toArray
    (vals, vecs)
  }

  /** Fit top-`k` principal components: run the distributed census,
    * collect the d(d+1)/2 moment rows, assemble the (population)
    * covariance in doubles, Jacobi-decompose. `exact = false` fits from
    * the DECIMAL(38,0) census — the overflow-proof path for corpora past
    * ~10⁶ rows per partial.
    */
  def fit(embs: DataFrame, k: Int, vecCol: String = "embedding",
          exact: Boolean = true): PcaModel = {
    val rows = momentsMicro(embs, vecCol, exact).collect()
    require(rows.nonEmpty, "empty corpus")
    // every (i, j) cell must see every row: a ragged/null embedding would
    // drop from some cells only and silently skew the covariance
    require(rows.forall(_.getLong(2) == rows.head.getLong(2)),
      "ragged or null embeddings: moment cells disagree on row count")
    val d = rows.iterator.map(_.getInt(1)).max + 1
    require(k >= 1 && k <= d, s"k must be in [1, $d], got $k")
    val n = rows.head.getLong(2).toDouble
    // long census and decimal census collect as different JVM types
    def num(r: org.apache.spark.sql.Row, idx: Int): Double = r.get(idx) match {
      case l: java.lang.Long => l.toDouble
      case b: java.math.BigDecimal => b.doubleValue()
      case o => throw new IllegalStateException(s"unexpected census cell $o")
    }
    val sum = new Array[Double](d)
    val prod = Array.ofDim[Double](d, d)
    rows.foreach { r =>
      val i = r.getInt(0); val j = r.getInt(1)
      sum(i) = num(r, 3)
      sum(j) = num(r, 4)
      prod(i)(j) = num(r, 5)
      prod(j)(i) = num(r, 5)
    }
    val mean = sum.map(_ / n / 1e6)
    val cov = Array.tabulate(d, d)((i, j) =>
      (prod(i)(j) / n - (sum(i) / n) * (sum(j) / n)) / 1e12)
    val (vals, vecs) = jacobiEigen(cov)
    PcaModel(mean, vecs.take(k), vals.take(k))
  }

  /** Serve the model: center on the mean, dot with each component —
    * `whiten = true` additionally scales component c by
    * 1/√(λ_c + eps) so output coordinates are decorrelated AND
    * unit-variance. One shuffle-free projection over broadcast literals
    * (zip_with + aggregate higher-order functions — codegen'd, k·d
    * multiplies per row); output (id, projected array<double>).
    */
  def project(embs: DataFrame, model: PcaModel, whiten: Boolean = false,
              eps: Double = 1e-9, idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    val meanLit = array(model.mean.map(lit): _*)
    val centered = zip_with(col(vecCol), meanLit,
      (x, m) => x.cast("double") - m)
    val comps: Seq[Column] = model.components.zipWithIndex.map { case (comp, c) =>
      val scale =
        if (whiten) 1.0 / math.sqrt(math.max(model.eigenvalues(c), 0.0) + eps)
        else 1.0
      val compLit = array(comp.map(w => lit(w * scale)): _*)
      aggregate(zip_with(col("_c"), compLit, _ * _),
        lit(0.0d), _ + _)
    }
    embs.select(col(idCol), centered.as("_c"))
      .select(col(idCol), array(comps: _*).as("projected"))
  }
}
