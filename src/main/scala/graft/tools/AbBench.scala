package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Plan-rule A/B harness — times each gate under each optimizer-rule
  * kill-switch variant and persists `target/ab.json`, so round-over-round
  * rule wins/regressions are machine-comparable instead of living in
  * commit messages (round-5 verdict ask #8).
  *
  * Variants (conf set per block, rules read conf at apply time):
  *   baseline     — all graft rules on (what Verify/Bench run)
  *   topk_off     — spark.graft.topk.rewrite=false
  *   md5fuse_off  — spark.graft.fuse.md5=false
  *   shingle_off  — spark.graft.fuse.shingle=false
  *
  * Per gate: every variant's plan captured and warmed once, then three
  * ROUNDS each timing every variant once (`toRdd.count()`, median of
  * the 3 — same materialization discipline as [[graft.Bench]]) — the
  * samples of all variants interleave across the JVM's warm-up
  * trajectory, so no variant's median reads mid-JIT state (a
  * variant-major loop inflated whichever block ran first ~2×). A
  * global untimed warm pass first keeps cold-file costs out entirely.
  * `plan_differs` records, per gate, which variants actually change
  * the plan — judged by [[PlanSignature]]'s structural class-name
  * fingerprint over the returned frame AND every internal execution
  * fired during the gate build (self-tested in AbBenchSpec: a
  * known-differing variant must flag, a no-op variant must not). A
  * variant that doesn't touch the plan times the same code twice, so
  * its delta is pure noise and a reader can ignore it.
  *
  * Usage: AbBench [--dir sfDir] [--out path] [gate ...]
  * Default gates: the rewrite-sensitive set (grouped top-k family) plus
  * the round-5 drift watchlist.
  */
object AbBench {

  val Variants: Seq[(String, Map[String, String])] = Seq(
    "baseline" -> Map(),
    "topk_off" -> Map("spark.graft.topk.rewrite" -> "false"),
    "md5fuse_off" -> Map("spark.graft.fuse.md5" -> "false"),
    "shingle_off" -> Map("spark.graft.fuse.shingle" -> "false"),
    "asof_window" -> Map("spark.graft.asof.native" -> "false"),
    "rangejoin_off" -> Map("spark.graft.rangejoin.bucketWidth" -> "0"),
    "window_off" -> Map("spark.graft.window.rewrite" -> "false"),
    "fanout_off" -> Map("spark.graft.scan.fanout" -> "false"),
    "filtercse_off" -> Map("spark.graft.bind.filterCse" -> "false"))

  val AllSwitches: Seq[String] = Seq("spark.graft.topk.rewrite",
    "spark.graft.fuse.md5", "spark.graft.fuse.shingle",
    "spark.graft.asof.native", "spark.graft.rangejoin.bucketWidth",
    "spark.graft.window.rewrite", "spark.graft.scan.fanout",
    "spark.graft.bind.filterCse")

  val DefaultGates: Seq[String] = Seq(
    // rewritten by InferGroupedTopK / heap exec family
    "x_grouped_topk", "x_grouped_topk_hi", "x_topk_rewrite", "g_lpa",
    // round-5 bench-drift watchlist
    "significant_pairs", "r_rrf_hybrid", "t_bpe_apply", "r_bm25_topk",
    "t_trigram_kn",
    // md5-fuse family: s_hash_split is a deliberate NEGATIVE control
    // (8-hex-prefix compare, not the fused 15-hex idiom — its plan must
    // NOT flag); t_dsir_scores and x_chrf (one fused digest per gram
    // instance x 6 orders x both sides) genuinely ride FuseMd5Uniform
    "s_hash_split", "t_dsir_scores", "x_chrf",
    // window-rewrite beneficiary OUTSIDE the llr family: the composed
    // daily loop (r7 flagged it regressed; the A/B shows window_off
    // makes it SLOWER — the rule is a win here)
    "pipe_increment",
    // shingle-fuse representative
    "d_minhash_neardup_fast",
    // as-of native-carry representatives
    "j10_asof_join", "j12_asof_forward",
    // range-join rewrite representative (rangejoin_off = BNLJ path)
    "j13_rangejoin_rewrite",
    // whole-partition-window rewrite representatives (window_off =
    // WindowExec sort + whole-partition buffering)
    "llr_pairs_windowed", "w_window_rewrite")

  def main(args: Array[String]): Unit = {
    val dir = args.sliding(2).collectFirst { case Array("--dir", d) => d }
      .getOrElse("/root/testdata/sf0.1")
    val out = args.sliding(2).collectFirst { case Array("--out", o) => o }
      .getOrElse("target/ab.json")
    val listed = args.filterNot(_.startsWith("--"))
      .filterNot(a => a == dir || a == out)
    val gates = (if (listed.nonEmpty) listed.toSeq else DefaultGates)
      .filter { g =>
        val ok = SparkEntry.queries.contains(g)
        if (!ok) System.err.println(s"[ab] unknown gate $g, skipped")
        ok
      }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.session.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Structural class-name signature incl. internal executions fired
    // during the gate build (see PlanSignature — the old string compare
    // was wrong in both directions, round-7 verdict #1). Capture starts
    // from a COLD cache: gates that cache() internally would otherwise
    // fingerprint InMemoryTableScan vs fresh-scan depending on what the
    // previous variant left cached — variant-order noise, not plan
    // structure (observed: pipe_increment flagging every variant).
    def planOf(g: String): String = {
      spark.catalog.clearCache()
      PlanSignature.capture(spark)(SparkEntry.queries(g)(spark, dir))
    }
    def timeOnce(g: String): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(g)(spark, dir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }

    // Global untimed warm pass (baseline confs) before ANY timing:
    // the first variant block otherwise pays page-cache/parquet-footer
    // cold costs alone, which showed up as 2× "baseline regressions"
    // on sub-second gates with empty plan_differs (round-7 verdict).
    AllSwitches.foreach(k => spark.conf.unset(k))
    for (g <- gates) {
      try {
        spark.catalog.clearCache()
        SparkEntry.queries(g)(spark, dir).queryExecution.toRdd.count()
      } catch { case e: Throwable =>
        System.err.println(s"[ab] warm $g failed: ${e.getMessage}")
      }
    }

    // INTERLEAVED sampling (round-7 verdict item 5 — completed round 8):
    // a variant-major loop runs the whole baseline block FIRST, so its
    // samples catch mid-JIT/codegen state and read ~2× the later
    // variants' on plan shapes the variants share (observed uniformly
    // across gates even WITH a global warm pass). Per gate: capture
    // every variant's plan, one untimed warm per variant, then three
    // ROUNDS each timing every variant once — samples of all variants
    // are spread evenly across the JVM's warm-up trajectory.
    val times = scala.collection.mutable.Map[(String, String), Double]()
    val plans = scala.collection.mutable.Map[(String, String), String]()
    def withConfs[A](confs: Map[String, String])(body: => A): A = {
      AllSwitches.foreach(k => spark.conf.unset(k))
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally AllSwitches.foreach(k => spark.conf.unset(k))
    }
    for (g <- gates) {
      val samples = scala.collection.mutable
        .Map[String, List[Double]]().withDefaultValue(Nil)
      for ((vname, confs) <- Variants) {
        try withConfs(confs) {
          plans((g, vname)) = planOf(g)
          timeOnce(g) // untimed warm: codegen + JIT for this plan shape
        } catch { case e: Throwable =>
          System.err.println(s"[ab] $g/$vname failed: ${e.getMessage}")
        }
      }
      for (r <- 1 to 3; (vname, confs) <- Variants
           if plans.contains((g, vname))) {
        try withConfs(confs) { samples(vname) ::= timeOnce(g) }
        catch { case e: Throwable =>
          System.err.println(s"[ab] $g/$vname run $r failed: ${e.getMessage}")
        }
      }
      for ((vname, xs) <- samples if xs.nonEmpty)
        times((g, vname)) = xs.sorted.apply(xs.size / 2)
    }

    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val gateJson = gates.map { g =>
      val vs = Variants.collect { case (v, _) if times.contains((g, v)) =>
        "\"" + v + "\":" + num(times((g, v))) }.mkString(",")
      val differs = Variants.drop(1).collect {
        case (v, _) if plans.get((g, v)).exists(p =>
          plans.get((g, "baseline")).exists(_ != p)) => "\"" + v + "\""
      }.mkString(",")
      s""""$g":{$vs,"plan_differs":[$differs]}"""
    }.mkString("{", ",", "}")
    val json = s"""{"sf":"$dir","runs":3,"timing":"median-of-3 warm, toRdd materialization","gates":$gateJson}"""
    println(json)
    try {
      val p = java.nio.file.Paths.get(out)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, json + "\n")
    } catch { case e: Throwable =>
      System.err.println(s"[ab] could not write $out: ${e.getMessage}")
    }
    spark.stop()
  }
}
