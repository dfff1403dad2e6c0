package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., the FAISS IVF-PQ building block)
  * — the aggressive compression tier past [[Quantize.int8]]: split each
  * dim-d vector into `m` subvectors, quantize each against its own
  * `ksub`-centroid codebook, and keep only the m code bytes. At dim 64 /
  * m 8 / ksub ≤ 256 that is 8 bytes per vector — 32× below float32 —
  * which is what makes a 100 TB ANN working set cache- and
  * shuffle-resident. Beyond-reference surface (SURVEY §2.13).
  *
  * Search runs asymmetrically (ADC): the float query builds an m×ksub
  * lookup table of subspace distances once, and each corpus vector's
  * approximate distance is the sum of m table entries — no decode ever.
  *
  * Plan shape — explode + broadcast-codebook join, NOT an m×ksub literal
  * expression tree: the expression formulation inlines 128 fused-dot
  * loops into one generated method, which blows Janino's 64 KB method
  * limit and silently drops the whole stage to interpreted eval (observed
  * on first build — the worst kind of scale regression). The join
  * formulation keeps exactly ONE dot expression in the plan: corpus rows
  * explode to (id, j, subvector) — m small rows per vector — broadcast-
  * join the 128-row codebook, and the per-(id, j) argmin partial-
  * aggregates map-side, so the one exchange carries m ints per vector,
  * far below the float vectors themselves. The same m-row explode feeds
  * the ADC join directly.
  *
  * Engine portability / determinism:
  *  - codebooks are driver-side double arrays ([[seedModel]] slices them
  *    from caller-chosen seed vectors, the `fixedCentroids` idiom the
  *    IVF/k-means oracles already replay; [[train]] fits real per-
  *    subspace k-means when cross-engine replay is not needed);
  *  - per-entry score is the ‖c‖²−2·v·c kernel ([[Clustering.score]]'s
  *    arithmetic) whose cross-engine bit-identity the `e_kmeans_assign`
  *    gate pins — ‖c‖² rides in the codebook rows, computed once at the
  *    driver with the same sequential sum DuckDB's list_dot_product
  *    uses; argmin ties break to the lowest code via struct-min;
  *  - ADC table entries are micro-fixed (round(·1e6) → long) BEFORE the
  *    m-term sum, so accumulated distances are exact integers —
  *    association-order-free on any engine.
  */
object ProductQuantizer {

  /** `codebooks(j)(c)` = centroid c of subspace j (dsub doubles each). */
  final case class PqModel(m: Int, dsub: Int,
                           codebooks: Array[Array[Array[Double]]]) {
    def ksub: Int = codebooks(0).length
    def dim: Int = m * dsub
  }

  /** Deterministic model from `ksub` seed vectors (e.g. the first k
    * corpus vectors): codebook j = the j-th dsub-slice of every seed.
    * The oracle-replayable path — seeds come from a table both engines
    * read identically.
    */
  def seedModel(seeds: Array[Array[Double]], m: Int): PqModel = {
    require(seeds.nonEmpty, "need at least one seed vector")
    val dim = seeds(0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    require(seeds.forall(_.length == dim), "ragged seed vectors")
    val dsub = dim / m
    val books = Array.tabulate(m, seeds.length) { (j, c) =>
      seeds(c).slice(j * dsub, (j + 1) * dsub)
    }
    PqModel(m, dsub, books)
  }

  /** Real per-subspace k-means training ([[Clustering.kmeans]] on each
    * dsub-slice of the corpus): better codebooks than raw seeds, at the
    * cost of m small training runs. Deterministic for a fixed seed
    * WITHIN Spark, but not replayable by an external SQL oracle (the
    * trainer's TakeOrdered pool hash is engine-specific) — use
    * [[seedModel]] where cross-engine replay matters.
    */
  def train(corpus: DataFrame, m: Int, ksub: Int, maxIter: Int = 10,
            seed: Long = 42L, vecCol: String = "embedding"): PqModel = {
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    val books = (0 until m).map { j =>
      Clustering.kmeans(
        corpus.select(slice(col(vecCol), j * dsub + 1, dsub).as(vecCol)),
        k = ksub, maxIter = maxIter, seed = seed + j, vecCol = vecCol)
        .centroids
    }.toArray
    PqModel(m, dsub, books)
  }

  /** The broadcastable codebook frame: (j, code, cvec array<double>,
    * s2 = ‖cvec‖²) — m·ksub rows. s2 is the driver-side sequential
    * square-sum, the exact double the oracle's list_dot_product(c, c)
    * produces.
    */
  private def codebookFrame(like: DataFrame, model: PqModel): DataFrame = {
    val rows = for {
      j <- 0 until model.m
      c <- 0 until model.ksub
    } yield (j, c, model.codebooks(j)(c).toSeq,
      model.codebooks(j)(c).map(x => x * x).sum)
    import like.sparkSession.implicits._
    rows.toDF("j", "code", "cvec", "s2")
  }

  /** (idCol, j, sub): each vector exploded to its m dsub-slices. */
  private def subRows(df: DataFrame, model: PqModel, idCol: String,
                      vecCol: String): DataFrame =
    df.select(col(idCol),
      posexplode(array((0 until model.m).map(j =>
        slice(col(vecCol), j * model.dsub + 1, model.dsub)): _*))
        .as(Seq("j", "sub")))

  /** ‖c‖²−2·v·c for the exploded rows — the ONE dot expression in every
    * PQ plan.
    */
  private def scoreCol: Column =
    col("s2") - lit(2.0d) * graft.functions.VectorOps.dot(col("sub"), col("cvec"))

  /** (idCol, j, code): per-subspace argmin assignment, ties to the
    * lowest code (struct-min orders by score, then code).
    */
  def codeRows(corpus: DataFrame, model: PqModel, idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame =
    subRows(corpus, model, idCol, vecCol)
      .join(broadcast(codebookFrame(corpus, model)), Seq("j"))
      .groupBy(col(idCol), col("j"))
      .agg(min(struct(scoreCol.as("s"), col("code").as("c")))
        .getField("c").as("code"))

  /** (idCol, codes): the PQ-encoded corpus — m small ints per vector,
    * in subspace order.
    */
  def encode(corpus: DataFrame, model: PqModel, idCol: String = "vec_id",
             vecCol: String = "embedding"): DataFrame =
    codeRows(corpus, model, idCol, vecCol)
      .groupBy(col(idCol))
      .agg(transform(
        array_sort(collect_list(struct(col("j"), col("code")))),
        s => s.getField("code")).as("codes"))

  /** Asymmetric-distance top-k: smallest Σ_j lut_j[code_j] wins (rank
    * ascending, id tiebreak); self-pairs excluded, mirroring
    * [[Quantize.quantizedTopK]]. Output: (query_id, neighbor_id,
    * adc_micro, adc, rank) — `adc` is the 6 dp rendering of the exact
    * integer micro sum (a RANK score: per-query constants ‖q_j‖² are
    * dropped, so it is not the true squared distance).
    */
  /** Full m×ksub LUT per query: the subspace explode joined to EVERY
    * codebook entry of that subspace (no argmin on the query side) —
    * (query_id, j, code, lut_micro).
    */
  private def lutFrame(queries: DataFrame, model: PqModel, idCol: String,
                       vecCol: String): DataFrame =
    subRows(queries, model, idCol, vecCol)
      .withColumnRenamed(idCol, "query_id")
      .join(broadcast(codebookFrame(queries, model)), Seq("j"))
      .select(col("query_id"), col("j"), col("code"),
        round(scoreCol * 1e6).cast("long").as("lut_micro"))

  /** Shared ranking tail: sum LUT entries per pair, rank ascending. */
  private def rankAdc(pairsWithLut: DataFrame, k: Int): DataFrame = {
    val adc = pairsWithLut
      .groupBy("query_id", "neighbor_id")
      .agg(sum(col("lut_micro")).as("adc_micro"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc_micro").asc, col("neighbor_id").asc)
    adc.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("adc_micro"),
        round(col("adc_micro").cast("double") / 1e6, 6).as("adc"),
        col("rank"))
  }

  def adcTopK(corpus: DataFrame, queries: DataFrame, model: PqModel, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val codes = codeRows(corpus, model, idCol, vecCol)
      .withColumnRenamed(idCol, "neighbor_id")
    val lut = lutFrame(queries, model, idCol, vecCol)
    rankAdc(
      codes.join(broadcast(lut), Seq("j", "code"))
        .where(col("neighbor_id") =!= col("query_id")), k)
  }

  /** IVF-PQ — the FAISS architecture: coarse-quantize the corpus into
    * `centroids` lists ([[Clustering.assignColumn]]), multi-probe the
    * query's `nProbe` nearest lists ([[Clustering.probesColumn]] — the
    * shared probe arithmetic every IVF oracle replays), and run the ADC
    * ranking ONLY over candidates from probed lists. This bounds the
    * ADC join to nProbe/nLists of the corpus per query — the answer to
    * exhaustive [[adcTopK]]'s queries×corpus growth (measured 64× pair
    * fan-out at the 8× probe) — while keeping vectors 8-byte codes end
    * to end. Recall loss = true neighbors living in unprobed lists,
    * bounded by the recall harness like every other ANN path here.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame,
                centroids: Array[Array[Double]], model: PqModel, k: Int,
                nProbe: Int, idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && nProbe >= 1, s"bad params k=$k nProbe=$nProbe")
    val lists = corpus.select(col(idCol).as("neighbor_id"),
      Clustering.assignColumn(col(vecCol), centroids).as("_list"))
    val probes = queries.select(col(idCol).as("query_id"),
      explode(Clustering.probesColumn(col(vecCol), centroids, nProbe)).as("_list"))
    val candPairs = lists.join(broadcast(probes), Seq("_list"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id")
    val codes = codeRows(corpus, model, idCol, vecCol)
      .withColumnRenamed(idCol, "neighbor_id")
    val lut = lutFrame(queries, model, idCol, vecCol)
    rankAdc(
      codes.join(candPairs, Seq("neighbor_id"))
        .join(broadcast(lut), Seq("query_id", "j", "code")), k)
  }

  // ---- residual encoding (the FAISS IVF-PQ composition proper) ----

  /** The coarse-centroid table as one array-of-arrays literal column. */
  private def centroidLit(centroids: Array[Array[Double]]): Column =
    array(centroids.map(c => array(c.map(lit): _*)): _*)

  /** Driver-side sequential dot — the same left-to-right double sum the
    * engine's VectorOps.dot and DuckDB's list_dot_product produce, so
    * seeds derived with it are engine-replayable.
    */
  private def seqDot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Residual seed vectors: each seed minus its nearest coarse centroid
    * (the ‖c‖²−2·v·c argmin kernel, ties to the lowest index — the exact
    * arithmetic [[Clustering.assignColumn]] runs, so an external oracle
    * replays the same assignment). FAISS trains PQ codebooks on
    * RESIDUALS, not raw vectors — a codebook of raw-vector slices is
    * mis-centered for residual encoding (residuals live near the
    * origin), which is where IVF-PQ's recall at small m comes from.
    */
  def residualSeeds(seeds: Array[Array[Double]],
                    centroids: Array[Array[Double]]): Array[Array[Double]] =
    seeds.map { v =>
      val best = centroids.zipWithIndex
        .map { case (c, i) => (seqDot(c, c) - 2.0 * seqDot(v, c), i) }
        .minBy { case (s, i) => (s, i) }._2
      v.zip(centroids(best)).map { case (x, c) => x - c }
    }

  /** Coarse assignment + residual vector per row: (idCol, _list, _resid). */
  private def residualFrame(df: DataFrame, centroids: Array[Array[Double]],
                            idCol: String, vecCol: String): DataFrame =
    df.withColumn("_list", Clustering.assignColumn(col(vecCol), centroids))
      .withColumn("_resid", zip_with(col(vecCol),
        element_at(centroidLit(centroids), col("_list") + 1),
        (x, c) => x.cast("double") - c))
      .select(col(idCol), col("_list"), col("_resid"))

  /** Per-subspace codes of the RESIDUAL vectors: (idCol, _list, j, code).
    * Same explode + broadcast-codebook + struct-min argmin plan as
    * [[codeRows]] — the residual subtraction is one extra shuffle-free
    * zip_with on the scan.
    */
  def residualCodeRows(corpus: DataFrame, centroids: Array[Array[Double]],
                       model: PqModel, idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame =
    residualFrame(corpus, centroids, idCol, vecCol)
      .select(col(idCol), col("_list"),
        posexplode(array((0 until model.m).map(j =>
          slice(col("_resid"), j * model.dsub + 1, model.dsub)): _*))
          .as(Seq("j", "sub")))
      .join(broadcast(codebookFrame(corpus, model)), Seq("j"))
      .groupBy(col(idCol), col("_list"), col("j"))
      .agg(min(struct(scoreCol.as("s"), col("code").as("c")))
        .getField("c").as("code"))

  /** (idCol, list_id, codes): the residual-encoded corpus — the coarse
    * list id plus m residual code bytes per vector, the complete IVF-PQ
    * index entry.
    */
  def encodeResidual(corpus: DataFrame, centroids: Array[Array[Double]],
                     model: PqModel, idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame =
    residualCodeRows(corpus, centroids, model, idCol, vecCol)
      .groupBy(col(idCol), col("_list").as("list_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("j"), col("code")))),
        s => s.getField("code")).as("codes"))

  /** IVF-PQ with residual encoding — the faithful FAISS composition:
    * corpus codes quantize v − centroid(list(v)); each query builds a
    * SEPARATE LUT per probed list from its residual against THAT list's
    * centroid (q − c_list), because corpus codes in different lists are
    * expressed in different frames. The ADC join keys on
    * (_list, j, code), which both bounds candidates to probed lists
    * (the IVF part — no separate candidate-pair join needed) and selects
    * the right LUT frame per candidate. LUT rows: nProbe·m·ksub per
    * query — still broadcast-sized.
    */
  def ivfPqResidualTopK(corpus: DataFrame, queries: DataFrame,
                        centroids: Array[Array[Double]], model: PqModel,
                        k: Int, nProbe: Int, idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && nProbe >= 1, s"bad params k=$k nProbe=$nProbe")
    val codes = residualCodeRows(corpus, centroids, model, idCol, vecCol)
      .withColumnRenamed(idCol, "neighbor_id")
    val probes = queries
      .withColumn("_list", explode(Clustering.probesColumn(col(vecCol), centroids, nProbe)))
      .withColumn("_rq", zip_with(col(vecCol),
        element_at(centroidLit(centroids), col("_list") + 1),
        (x, c) => x.cast("double") - c))
      .select(col(idCol).as("query_id"), col("_list"), col("_rq"))
    // UNLIKE the shared lutFrame, the per-query constant ‖rq_j‖² must be
    // INCLUDED here: it differs per probed list (rq = q − c_list), and
    // ADC compares candidates ACROSS lists — dropping it would rank
    // lists against each other on incomparable scores. With it, the
    // entry is the full ‖rq_j − c‖², so the m-term sum is the true
    // squared residual distance, list-comparable by construction.
    val lut = probes
      .select(col("query_id"), col("_list"),
        posexplode(array((0 until model.m).map(j =>
          slice(col("_rq"), j * model.dsub + 1, model.dsub)): _*))
          .as(Seq("j", "sub")))
      .join(broadcast(codebookFrame(queries, model)), Seq("j"))
      .select(col("query_id"), col("_list"), col("j"), col("code"),
        round((graft.functions.VectorOps.dot(col("sub"), col("sub")) + scoreCol) * 1e6)
          .cast("long").as("lut_micro"))
    rankAdc(
      codes.join(broadcast(lut), Seq("_list", "j", "code"))
        .where(col("neighbor_id") =!= col("query_id")), k)
  }
}
