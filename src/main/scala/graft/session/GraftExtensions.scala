package graft.session

import graft.functions.{ArrayDot, BloomAgg, BloomBytesMightContain, CosineSimilarity, FreqSketchAgg, KllQuantile, KllSketchAgg, NGramShingles, RollingHash64, ThetaEstimate, ThetaSketchAgg, UnicodeNormalize}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StringType}

/** SQL surface for graft's native expressions.
  *
  * Registered the standard Spark way: pass
  * `spark.sql.extensions=graft.session.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) at session build, or call
  * [[GraftFunctions.register]] on a live session. Either way these resolve
  * in `spark.sql(...)` text:
  *
  *   - `vec_dot(a, b)`        — fused dot product (array<float|double>)
  *   - `cosine_sim(a, b)`     — fused cosine similarity
  *   - `ngram_shingles(text, n [, distinct])` — word n-gram shingles
  *   - `rolling_hash(text)`  — 64-bit Karp–Rabin rolling hash
  *   - `unicode_norm(text [, 'NFC'|'NFD'|'NFKC'|'NFKD'])` — Unicode
  *     normalization (default NFC)
  *   - `theta_sketch(col [, lgK])` — theta-sketch aggregate (binary)
  *   - `theta_estimate(sketch)`   — distinct-count estimate
  *   - `bloom_agg(col, expectedItems [, fpp])` — per-group Bloom filter
  *   - `bloom_contains(filterBytes, value)` — row-wise membership probe
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    // fuse the portable-uniform md5 idiom into the native long kernel
    ext.injectOptimizerRule(_ => graft.plans.FuseMd5Uniform)
    // filter-predicate common-subexpression binding (With/CommonExprRef):
    // undoes the k-fold inlining of expensive derived text under pushdown.
    // MUST run in the LAST optimizer batch ("User Provided Optimizers",
    // i.e. session.experimental.extraOptimizations): anywhere earlier a
    // later PushDownPredicates pass re-inlines what this rule binds —
    // inside the operator-optimization fixed point the two rules
    // ping-pong to the iteration cap (measured: MORE copies + exploded
    // optimization time), and even pre-CBO placement is undone by the
    // "Pushdown Filters from PartitionPruning" batch. The post-hoc
    // resolution hook is the one extension point that hands us the
    // session, so the registration rides it; the returned rule is a
    // no-op. The check-then-append is SYNCHRONIZED on the session
    // (round-8 advice): concurrent first analyses on one session would
    // otherwise race the read-modify-write and double-register or drop
    // the rule. (User code that later ASSIGNS extraOptimizations still
    // clobbers the registration — documented limitation of the
    // experimental surface.)
    ext.injectPostHocResolutionRule { session =>
      session.synchronized {
        if (!session.experimental.extraOptimizations
            .contains(graft.plans.BindFilterCommon))
          session.experimental.extraOptimizations =
            session.experimental.extraOptimizations :+ graft.plans.BindFilterCommon
      }
      new org.apache.spark.sql.catalyst.rules.Rule[
          org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
        override def apply(plan: org.apache.spark.sql.catalyst.plans.logical
            .LogicalPlan): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = plan
      }
    }
    ext.injectOptimizerRule(_ => graft.plans.FuseShingleDistinct)
    // grouped top-k: logical node -> partial/final heap execs, plus the
    // rewrite that turns the row_number-filter window spelling into it
    ext.injectOptimizerRule(_ => graft.plans.InferGroupedTopK)
    // naive range-join spelling -> bucketed equi-join (opt-in by
    // spark.graft.rangejoin.bucketWidth > 0)
    ext.injectOptimizerRule(_ => graft.plans.InferBucketedRangeJoin)
    // whole-partition aggregate windows -> census + null-safe join (no
    // sort, no whole-partition row buffering)
    ext.injectOptimizerRule(_ => graft.plans.RewriteWholePartitionWindow)
    ext.injectPlannerStrategy(_ => graft.plans.GroupedTopKStrategy)
    // single-pass as-of carry (no WindowExec group buffering)
    ext.injectPlannerStrategy(_ => graft.plans.CarryForwardStrategy)
  }
}

object GraftFunctions {

  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal int, got $other")
  }

  private def boolLit(e: Expression, fn: String): Boolean = e match {
    case Literal(v: Boolean, BooleanType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal boolean, got $other")
  }

  private def strLit(e: Expression, fn: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, StringType) => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal string, got $other")
  }

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vec_dot"),
      info("vec_dot"),
      { case Seq(a, b) => ArrayDot(a, b)
        case args => throw new IllegalArgumentException(
          s"vec_dot expects 2 arguments, got ${args.length}") }),
    (FunctionIdentifier("cosine_sim"),
      info("cosine_sim"),
      { case Seq(a, b) => CosineSimilarity(a, b)
        case args => throw new IllegalArgumentException(
          s"cosine_sim expects 2 arguments, got ${args.length}") }),
    (FunctionIdentifier("rolling_hash"),
      info("rolling_hash"),
      { case Seq(t) => RollingHash64(t, RollingHash64.DefaultBase)
        case args => throw new IllegalArgumentException(
          s"rolling_hash expects 1 argument, got ${args.length}") }),
    (FunctionIdentifier("unicode_norm"),
      info("unicode_norm"),
      { case Seq(t) => UnicodeNormalize(t, "NFC")
        case Seq(t, f) => UnicodeNormalize(t, strLit(f, "unicode_norm").toUpperCase)
        case args => throw new IllegalArgumentException(
          s"unicode_norm expects 1 or 2 arguments, got ${args.length}") }),
    (FunctionIdentifier("ngram_shingles"),
      info("ngram_shingles"),
      { case Seq(t, n) => NGramShingles(t, intLit(n, "ngram_shingles"), distinct = false)
        case Seq(t, n, d) =>
          NGramShingles(t, intLit(n, "ngram_shingles"), boolLit(d, "ngram_shingles"))
        case args => throw new IllegalArgumentException(
          s"ngram_shingles expects 2 or 3 arguments, got ${args.length}") }),
    (FunctionIdentifier("theta_sketch"),
      info("theta_sketch"),
      { case Seq(c) => ThetaSketchAgg(c, 14)
        case Seq(c, k) => ThetaSketchAgg(c, intLit(k, "theta_sketch"))
        case args => throw new IllegalArgumentException(
          s"theta_sketch expects 1 or 2 arguments, got ${args.length}") }),
    (FunctionIdentifier("theta_estimate"),
      info("theta_estimate"),
      { case Seq(s) => ThetaEstimate(s)
        case args => throw new IllegalArgumentException(
          s"theta_estimate expects 1 argument, got ${args.length}") }),
    (FunctionIdentifier("kll_sketch"),
      info("kll_sketch"),
      { case Seq(c) => KllSketchAgg(c, 1024)
        case Seq(c, k) => KllSketchAgg(c, intLit(k, "kll_sketch"))
        case args => throw new IllegalArgumentException(
          s"kll_sketch expects 1 or 2 arguments, got ${args.length}") }),
    (FunctionIdentifier("kll_quantile"),
      info("kll_quantile"),
      { case Seq(s, q) => KllQuantile(s, q)
        case args => throw new IllegalArgumentException(
          s"kll_quantile expects 2 arguments, got ${args.length}") }),
    (FunctionIdentifier("freq_sketch"),
      info("freq_sketch"),
      { case Seq(c) => FreqSketchAgg(c, 1024)
        case Seq(c, m) => FreqSketchAgg(c, intLit(m, "freq_sketch"))
        case args => throw new IllegalArgumentException(
          s"freq_sketch expects 1 or 2 arguments, got ${args.length}") }),
    (FunctionIdentifier("bloom_agg"),
      info("bloom_agg"),
      { case Seq(c, n) => BloomAgg(c, longLit(n, "bloom_agg"), 0.01)
        case Seq(c, n, f) => BloomAgg(c, longLit(n, "bloom_agg"),
          doubleLit(f, "bloom_agg"))
        case args => throw new IllegalArgumentException(
          s"bloom_agg expects 2 or 3 arguments, got ${args.length}") }),
    (FunctionIdentifier("bloom_contains"),
      info("bloom_contains"),
      { case Seq(b, v) => BloomBytesMightContain(b, v)
        case args => throw new IllegalArgumentException(
          s"bloom_contains expects 2 arguments, got ${args.length}") }),
    (FunctionIdentifier("md5_prefix60"),
      info("md5_prefix60"),
      { case Seq(c) => graft.functions.Md5Prefix60(
          org.apache.spark.sql.catalyst.expressions.Cast(c,
            org.apache.spark.sql.types.BinaryType))
        case args => throw new IllegalArgumentException(
          s"md5_prefix60 expects 1 argument, got ${args.length}") })
  )

  private def longLit(e: Expression, fn: String): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer, got $other")
  }

  private def doubleLit(e: Expression, fn: String): Double = e match {
    case Literal(v: Double, org.apache.spark.sql.types.DoubleType) => v
    // SQL decimal literals (0.01) parse as Decimal, not double
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal double, got $other")
  }

  /** Register into an already-built session (idempotent — re-registration
    * overwrites with the same builder).
    */
  def register(spark: SparkSession): Unit = {
    val ext = new SparkSessionExtensions
    new GraftExtensions()(ext)
    org.apache.spark.sql.GraftBridge.registerFunctions(ext, spark)
  }
}
