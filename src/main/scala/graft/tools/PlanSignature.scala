package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.util.QueryExecutionListener

/** Structural plan signatures for the A/B harness's `plan_differs`
  * marker (round-7 verdict #1: the old regex-normalized plan-STRING
  * compare was wrong in both directions).
  *
  * Two root causes, two fixes:
  *
  *  - FALSE NEGATIVES: gates that materialize internally (an eager
  *    `localCheckpoint` mid-body) return a frame whose lineage starts
  *    at the checkpoint RDD scan — the rule-driven plan difference
  *    happened in an INTERNAL execution the returned frame never
  *    shows (`llr_pairs_windowed` under `window_off` timed 2.68 vs
  *    5.91 s yet compared equal). Fix: a [[QueryExecutionListener]]
  *    registered around the gate BUILD captures every internal
  *    execution's final plan; the gate signature is the sorted
  *    multiset of those plus the returned frame's own plan.
  *
  *  - FALSE POSITIVES: the string compare normalized exprIds, ≥6-digit
  *    ints and `...` truncations, but Spark truncates field lists at a
  *    width measured BEFORE exprId stripping and AQE/scratch-path/seed
  *    literals leak through — unrelated variants flagged. Fix: never
  *    diff strings; fingerprint the tree as node CLASS names plus the
  *    class names of every expression node (no literal values, no
  *    paths, no ids, no string rendering at all). A real rewrite
  *    changes operator or expression classes (WindowExec → join+agg,
  *    BNLJ → bucketed join, a fused native expression); run-to-run
  *    counter drift cannot.
  */
object PlanSignature {

  /** All nodes of `p`, descending through the adaptive wrappers that
    * hide their subtree from `children` (AdaptiveSparkPlanExec /
    * QueryStageExec) so an AQE root doesn't collapse to one node.
    */
  private def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: kids.flatMap(nodes)
  }

  private def label(p: SparkPlan): String = {
    val exprs = p.expressions
      .flatMap(_.collect { case e => e.getClass.getSimpleName })
    p.getClass.getSimpleName + "[" + exprs.mkString(" ") + "]"
  }

  /** Deterministic structural fingerprint of one physical plan. */
  def fingerprint(p: SparkPlan): String = nodes(p).map(label).mkString("\n")

  /** Build a frame under a capture listener and return the gate's full
    * plan signature: fingerprints of every execution fired during the
    * build (eager checkpoints, driver-census collects) — sorted, since
    * listener delivery order is not deterministic — plus the returned
    * frame's own (pre-execution) plan.
    */
  def capture(spark: SparkSession)(build: => DataFrame): String = {
    val seen = new ConcurrentLinkedQueue[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit =
        seen.add(fingerprint(qe.executedPlan))
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val df = build
      org.apache.spark.sql.GraftBridge.flushListenerBus(spark)
      val internal = {
        val arr = new java.util.ArrayList[String](seen)
        val s = scala.jdk.CollectionConverters.ListHasAsScala(arr).asScala
        s.sorted.mkString("\n--\n")
      }
      internal + "\n==\n" + fingerprint(df.queryExecution.executedPlan)
    } finally spark.listenerManager.unregister(listener)
  }
}
