package graft.plans

import org.apache.spark.sql.catalyst.expressions.ArrayDistinct
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.NGramShingles

/** Catalyst optimizer rule: fuse `array_distinct(ngram_shingles(t, n))`
  * into the shingle kernel's own distinct mode. The kernel dedups with
  * a hash set WHILE emitting (O(shingles)); `array_distinct` on top of
  * the non-distinct output is Spark's generic pairwise-equality array
  * walk — quadratic in shingle count, which on document-sized arrays
  * (10³–10⁵ shingles) is exactly the hot path dedup pipelines explode
  * next. Semantics are identical by construction: the kernel's
  * `distinct = true` preserves first-occurrence order, same as
  * `array_distinct`'s contract.
  *
  * The composed spelling stays the API (SQL users write
  * `array_distinct(ngram_shingles(...))` naturally); the rule makes it
  * free, the [[FuseMd5Uniform]] doctrine. Injected via
  * [[graft.session.GraftExtensions]].
  */
object FuseShingleDistinct extends Rule[LogicalPlan] {

  /** Kill switch: `SET spark.graft.fuse.shingle=false` keeps the
    * composed array_distinct plan (A-B timing / plan debugging).
    */
  private def enabled: Boolean =
    conf.getConfString("spark.graft.fuse.shingle", "true").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan else plan.transformAllExpressions {
      case ArrayDistinct(sh @ NGramShingles(_, _, false)) =>
        sh.copy(distinct = true)
      // distinct output is already duplicate-free — drop the walk
      case ArrayDistinct(sh @ NGramShingles(_, _, true)) => sh
    }
}
