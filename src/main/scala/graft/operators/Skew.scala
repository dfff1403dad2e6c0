package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffles whose key distribution is heavy-tailed.
  *
  * AQE's skew-join split (spark.sql.adaptive.skewJoin) handles most cases
  * at runtime; these operators are for the plans AQE can't rewrite — a
  * skewed sort-merge join whose dim side is too big to broadcast but
  * small enough to replicate `buckets`-fold, and hot-key two-phase
  * aggregation. Semantics are identical to the unsalted plan (the gate
  * query oracle-checks the salted join against a plain SQL join).
  */
object Skew {

  /** Replicated-dim salted equi-join. The big side gets a deterministic
    * salt from a uniform hash of the whole row's partition position; the
    * dim side is exploded `buckets`-fold (one copy per salt value) so
    * every (key, salt) combination finds its dim row. A hot key's rows
    * then spread over `buckets` reducers instead of one.
    *
    * Cost: dim shuffle volume × buckets — worth it iff the hot key would
    * otherwise serialize one reducer. Join type restricted to inner/left
    * (replication breaks right/full-outer dim-side null semantics).
    */
  def saltedJoin(big: DataFrame, dim: DataFrame, keys: Seq[String],
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(Set("inner", "left", "left_outer")(joinType),
      s"salted join supports inner/left joins, got $joinType")
    // spark_partition_id + a per-partition row counter is uniform and
    // cheap; monotonically_increasing_id gives exactly that counter.
    // NOTE the salt VALUE is not stable under task retry (the id depends
    // on partition assignment) — join results are unaffected because the
    // salt is dropped and every (key, salt) finds its replicated dim row,
    // but the salt column must never escape this function.
    val salted = big.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(buckets)))
    val dimExp = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(dimExp, keys :+ "_salt", joinType).drop("_salt")
  }

  /** Two-phase aggregation for hot grouping keys: partial-aggregate on
    * (key, salt), then final-aggregate the partials on key. Exact for any
    * algebraic aggregate expressed as (partial, merge) pairs; this
    * covers the common sum/count/min/max set.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val cols = keys.map(col)
    // retry-unstable salt value is fine here too: sum/count partials are
    // salt-agnostic and the salt never leaves the partial grain
    df.withColumn("_salt", pmod(hash(monotonically_increasing_id()), lit(buckets)))
      .groupBy((cols :+ col("_salt")): _*)
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(cols: _*)
      .agg(sum(col("_psum")).as(s"sum_$valueCol"), sum(col("_pcnt")).as("n_rows"))
  }
}
