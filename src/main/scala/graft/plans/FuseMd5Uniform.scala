package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Expression, Literal, Md5, Substring}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType}

import graft.functions.Md5Prefix60

/** Catalyst optimizer rule: fuse the engine's portable-uniform idiom
  * `conv(substring(md5(x), 1, 15), 16, 10)` into the native
  * [[Md5Prefix60]] expression. The composed form is the cross-engine
  * CONTRACT (the DuckDB oracle replays it as hex-string arithmetic);
  * this rule makes the contract free at execution time — one digest and
  * pure long math instead of digest → hex render → substring →
  * base-16 parse → decimal render → numeric cast, in every hot path
  * that draws deterministic randomness (DSIR, DP noise, bootstrap
  * weights, shuffle permutation, feature hashing).
  *
  * Rewrites (value-identical by construction — the 15-hex-char parse IS
  * the top 60 bits, non-negative so string→long/double casts agree):
  *  - cast(conv(...) as long)   → md5_prefix60(x)
  *  - cast(conv(...) as double) → cast(md5_prefix60(x) as double)
  *  - conv(...)                 → cast(md5_prefix60(x) as string)
  * Injected via [[graft.session.GraftExtensions]]; the whole oracle
  * board (every gate using the idiom) runs under it, which is the
  * end-to-end equivalence evidence.
  */
object FuseMd5Uniform extends Rule[LogicalPlan] {

  /** Kill switch: `SET spark.graft.fuse.md5=false` keeps the composed
    * conv/substring/md5 plan (A-B timing / plan debugging).
    */
  private def enabled: Boolean =
    conf.getConfString("spark.graft.fuse.md5", "true").toBoolean

  private object UniformConv {
    def unapply(e: Expression): Option[Expression] = e match {
      case Conv(Substring(Md5(inner), Literal(1, IntegerType),
          Literal(15, IntegerType)), Literal(16, IntegerType),
          Literal(10, IntegerType), _) => Some(inner)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan else plan.transformAllExpressions {
      case c @ Cast(UniformConv(inner), LongType, _, _)
          if c.child.isInstanceOf[Conv] => Md5Prefix60(inner)
      case c @ Cast(UniformConv(inner), DoubleType, _, _)
          if c.child.isInstanceOf[Conv] =>
        c.withNewChildren(Seq(Md5Prefix60(inner)))
      case UniformConv(inner) => Cast(Md5Prefix60(inner), StringType)
    }
}
