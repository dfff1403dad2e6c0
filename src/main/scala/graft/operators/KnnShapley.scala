package graft.operators

import graft.functions.VectorOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact KNN-Shapley data valuation (Jia et al., PVLDB 2019,
  * "Efficient Task-Specific Data Valuation for Nearest Neighbor
  * Algorithms"): the Shapley value of every TRAINING point for a
  * K-NN classifier admits a closed form — against one test point, with
  * training points sorted by distance (rank j = 1 nearest, N total):
  *
  *   s_N = 1[y_N = y_test] / N
  *   s_j = s_{j+1} + (1[y_j = y_test] − 1[y_{j+1} = y_test])
  *                   · min(K, j) / (K · j)
  *
  * so "which documents actually helped classify the eval set" costs one
  * sorted scan instead of the 2^N subset enumeration — the data-debug /
  * data-market primitive: negative-value points are mislabeled or
  * harmful, the value-sorted corpus is a principled pruning order.
  *
  * Determinism contract: distances are exact longs on the [[Quantize]]
  * int8 grid (|a|² + |b|² − 2a·b, the [[Coreset]] convention), rank
  * ties break by training id, and the rational coefficients are
  * micro-quantized PER RANK — cM(j) = round(1e6·min(K,j)/(K·j)),
  * nM = round(1e6/N) — after which the recurrence is pure integer
  * arithmetic, replayed exactly by the oracle. By Abel summation the
  * per-point value needs NO sequential pass:
  *
  *   sM_j = ind_j·cM(j) + Σ_{i>j, i<N} ind_i·(cM(i) − cM(i−1))
  *          + ind_N·(nM − cM(N−1))           (j < N; sM_N = ind_N·nM)
  *
  * i.e. a per-test SUFFIX SUM over rank order — the one primitive the
  * repo already scales.
  *
  * Scale shape: the test panel is an EVAL SET (≤ thousands — the
  * operator broadcasts it by contract), so pairs are corpus ×
  * panel-bounded. Ranks and suffix sums never use a whole-corpus
  * window: pairs are range-partitioned on (test, d2, id) into
  * contiguous shards, each shard windows locally, and the cross-shard
  * rank offsets / suffix carries fold in from TWO driver-collected
  * (test × shard)-row censuses — the [[Salience.vocabulary]] /
  * [[Skyline]] two-phase discipline. Output is train-grain: the exact
  * micro value summed over the panel plus the 6dp mean.
  */
object KnnShapley {

  /** (vec_id, label, value_micro, value): per-training-point KNN-Shapley
    * summed over the test panel (exact long) and its mean per test
    * (rounded 6dp). `testPred` selects the held-out panel from `emb`;
    * panel rows are excluded from the valued training set.
    */
  def valueByKnn(emb: DataFrame, testPred: Column, k: Int,
                 shards: Int = 32, idCol: String = "vec_id",
                 vecCol: String = "embedding",
                 labelCol: String = "label"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val base = emb.select(col(idCol).cast("long").as("id"),
        col(labelCol).cast("long").as("lbl"), col(vecCol).as("v"),
        testPred.as("is_test"))
      .select(col("id"), col("lbl"), col("is_test"),
        Quantize.maxAbs(col("v")).as("_ma"), col("v"))
      .select(col("id"), col("lbl"), col("is_test"),
        Quantize.int8Column(col("v"), col("_ma")).as("qv"))
      .withColumn("sq", VectorOps.dot(col("qv"), col("qv")))
    val tests = base.where(col("is_test"))
      .select(col("id").as("t_id"), col("lbl").as("t_lbl"),
        col("qv").as("t_qv"), col("sq").as("t_sq"))
    val train = base.where(!col("is_test"))
      .select(col("id"), col("lbl"), col("qv"), col("sq"))

    val pairs = train.crossJoin(broadcast(tests))
      .select(col("t_id"), col("id"), col("lbl"),
        (col("sq") + col("t_sq")
          - lit(2.0d) * VectorOps.dot(col("qv"), col("t_qv")))
          .cast("long").as("d2"),
        when(col("lbl") === col("t_lbl"), 1L).otherwise(0L).as("ind"))

    // contiguous (t_id, d2, id) slices; pinned once (lazy localCheckpoint,
    // not cache — no session-global CacheManager entry to leak, blocks
    // drop with the frame) — the offset census, carry census and final
    // pass must see the same range bounds
    val sharded = pairs
      .repartitionByRange(shards, col("t_id"), col("d2"), col("id"))
      .withColumn("_shard", spark_partition_id())
      .localCheckpoint(false)
    val localW = Window.partitionBy("t_id", "_shard")
      .orderBy(col("d2"), col("id"))

    val spark = emb.sparkSession
    import spark.implicits._

    // pass 1 census: per (test, shard) counts -> global rank offsets + N
    // (driver traffic is (panel x shards) rows by construction). The
    // rank-N indicator rides the SAME census (per-shard max struct,
    // folded to the global max on the driver — the globally farthest
    // (d2, id) row is rank N) instead of a second aggregation pass over
    // the pinned pairs + a broadcast join.
    val cnts = sharded.groupBy("t_id", "_shard")
      .agg(count(lit(1)).as("c"),
        max(struct(col("d2"), col("id"), col("ind"))).as("_mx"))
      .collect().map { r =>
        val mx = r.getStruct(3)
        (r.getLong(0), r.getInt(1), r.getLong(2),
          (mx.getLong(0), mx.getLong(1), mx.getLong(2)))
      }
    val nByTest = cnts.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    nByTest.foreach { case (t, n) =>
      require(n >= 2, s"test $t has $n training rows; need >= 2") }
    // ind of the lexicographic-max (d2, id, ind) across shards == the
    // struct-max the dropped whole-frame aggregate computed ((d2, id)
    // is unique per test, so the ind field never decides the max)
    val indNByTest = cnts.groupBy(_._1).view
      .mapValues(_.map(_._4).max._3).toMap
    val offDf = broadcast(cnts.groupBy(_._1).iterator.flatMap {
      case (t, rows) =>
        val sorted = rows.sortBy(_._2)
        sorted.map(_._2).zip(sorted.map(_._3).scanLeft(0L)(_ + _))
          .map { case (s, off) =>
            (t, s, off, nByTest(t), indNByTest(t)) }
    }.toSeq.toDF("t_id", "_shard", "_off", "n", "ind_n"))

    // global rank, the micro coefficients, and the suffix payload g
    def cM(j: Column): Column =
      round(least(lit(k.toLong), j).cast("double") * lit(1e6)
        / (lit(k.toDouble) * j.cast("double"))).cast("long")
    val ranked = sharded
      .withColumn("_rn", row_number().over(localW))
      .join(offDf, Seq("t_id", "_shard"))
      .withColumn("j", col("_off") + col("_rn"))
      .withColumn("g", when(col("j") >= 2 && col("j") < col("n"),
        col("ind") * (cM(col("j")) - cM(col("j") - 1))).otherwise(0L))

    // pass 2 census: per (test, shard) g-sums -> suffix carries
    val gsums = ranked.groupBy("t_id", "_shard").agg(sum("g").as("gs"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val carryDf = broadcast(gsums.groupBy(_._1).iterator.flatMap {
      case (t, rows) =>
        val sorted = rows.sortBy(r => -r._2)
        sorted.map(_._2).zip(sorted.map(_._3).scanLeft(0L)(_ + _))
          .map { case (s, c) => (t, s, c) }
    }.toSeq.toDF("t_id", "_shard", "_carry"))

    // the rank-N indicator per test (`ind_n`) already rides offDf —
    // derived on the driver from the pass-1 census struct-max, so the
    // final plan needs neither a whole-frame aggregate nor an extra
    // broadcast join for it
    val sufW = localW.rowsBetween(1, Window.unboundedFollowing)
    val valued = ranked
      .withColumn("suffix",
        coalesce(sum(col("g")).over(sufW), lit(0L)))
      .join(carryDf, Seq("t_id", "_shard"))
      .withColumn("suffix", col("suffix") + col("_carry"))
      .withColumn("s_micro",
        when(col("j") === col("n"),
          col("ind_n") * round(lit(1e6) / col("n").cast("double"))
            .cast("long"))
          .otherwise(col("ind") * cM(col("j")) + col("suffix")
            + col("ind_n")
              * (round(lit(1e6) / col("n").cast("double")).cast("long")
                 - cM(col("n") - 1))))

    // value = micro-sum / (1e6 · panel): ONE division of exact integers
    // — bit-identical IEEE on any engine, deliberately NOT re-rounded
    // (a 6dp round would sit exactly on the half-tie whenever the
    // micro-sum is an odd multiple of 5)
    val panelSize = nByTest.size
    valued.groupBy(col("id").as(idCol))
      .agg(first(col("lbl")).as(labelCol),
        sum(col("s_micro")).as("value_micro"))
      .withColumn("value",
        col("value_micro").cast("double") / lit(1e6 * panelSize))
  }
}
