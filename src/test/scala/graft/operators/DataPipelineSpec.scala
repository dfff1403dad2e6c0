package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DataPipelineSpec extends SparkSpec {
  import spark.implicits._

  // planted corpus exercising every stage:
  //  1..12  good docs sharing a boilerplate footer line (≥ minDocs=10)
  //  20     markup-wrapped copy of doc 1's visible text → exact-dup after strip
  //  21     near-copy of doc 2 (one token appended) → near-dup cluster
  //  22     junk (too short) → quality-dropped
  //  23     contains the benchmark text verbatim → decontaminated
  //  1,3    share an 8-token span not shared with anything else → span-edited
  private val sharedSpan = "s1 s2 s3 s4 s5 s6 s7 s8"
  private val footer = "COMMON FOOTER LINE PLEASE IGNORE"
  private def body(i: Int): String =
    (0 until 12).map(j => s"w${i}_$j").mkString(" ")
  // span goes BEFORE the footer line so all 12 docs share the footer
  // line byte-identically (span-modified docs included) — the census
  // must see 12 ≥ minDocs copies of ONE line
  private def base(i: Int): String = s"${body(i)}\n$footer"
  private def withSpan(i: Int): String = s"${body(i)} $sharedSpan\n$footer"
  private def corpus = {
    val good = (1 to 12).map {
      case 1 => (1L, withSpan(1))
      case 3 => (3L, withSpan(3))
      case i => (i.toLong, base(i))
    }
    // no footer inside the markup: post-strip this is byte-identical to
    // doc 1's post-boilerplate text → a true exact duplicate at stage 4
    val markup = (20L,
      s"<html><body><p>${body(1)} $sharedSpan</p><script>x()</script></body></html>")
    // near-copy: same BODY as doc 2 plus one extra token, no footer —
    // post-boilerplate doc 2 is its bare body, so Jaccard is high but
    // the fingerprints differ (near-dup, NOT exact-dup)
    val near = (21L, body(2) + " extraTokenHere")
    val junk = (22L, "tiny")
    val contaminated = (23L,
      "leading words then the benchmark question one two three four five six seven eight nine ten")
    (good :+ markup :+ near :+ junk :+ contaminated).toDF("doc_id", "text")
  }
  private val benchmarks = Seq(
    (9001L, "the benchmark question one two three four five six seven eight nine ten"))
    .toDF("doc_id", "text")

  private val cfg = DataPipeline.Config(
    quality = QualityFilter.Rules(minTokens = 3, minMeanTokenLen = 0.0,
      maxMeanTokenLen = 100.0),
    spanK = 8,
    nearDupThreshold = 0.7,
    contaminationThreshold = 0.6,
    chunkTokens = 0) // doc-grain output for the accounting assertions

  test("full chain: every stage drops or edits exactly its targets") {
    val out = DataPipeline.prepare(corpus, Some(benchmarks), cfg)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    // quality: junk doc gone
    assert(!out.contains(22L))
    // exact dedup after markup strip: doc 20 ≡ doc 1 → lower id survives
    assert(out.contains(1L) && !out.contains(20L))
    // decontamination: doc 23 gone (contains the whole benchmark)
    assert(!out.contains(23L))
    // near-dup: 2 vs 21 → one survivor, the lower id
    assert(out.contains(2L) && !out.contains(21L))
    // boilerplate footer line removed from every surviving good doc
    (1 to 12).foreach { i =>
      if (out.contains(i.toLong))
        assert(!out(i.toLong).contains("COMMON FOOTER"),
          s"doc $i kept the boilerplate footer: ${out(i.toLong)}")
    }
    // span dedup: the 8-token span shared by docs 1 and 3 is edited out
    // of both (both survive dedup — their bodies differ)
    assert(out.contains(1L) && out.contains(3L))
    assert(!out(1L).contains("s1") && !out(3L).contains("s1"),
      s"shared span survived: ${out(1L)} / ${out(3L)}")
    // their unique bodies survive the span edit
    assert(out(1L).contains("w1_0") && out(3L).contains("w3_0"))
  }

  test("stage 7b: token budget caps each group after decontamination") {
    // groups: odd doc_ids "a", even "b"; budget 30 tokens per group.
    // Survivor bodies are 12-13 tokens post-cleaning, so each group
    // keeps 3 docs (the third crosses the 30-token line and is kept).
    val groups = corpus.select($"doc_id",
      when($"doc_id" % 2 === 1, "a").otherwise("b").as("grp"))
    val out = DataPipeline.prepare(corpus, Some(benchmarks),
      cfg.copy(tokenBudget = 30L), budgetGroups = Some(groups)).cache()
    val withG = out.join(groups, Seq("doc_id"))
    val toks = withG.select($"grp",
      size(TextAnalysis.kernelTokens($"text")).cast("long").as("n"))
      .groupBy("grp").agg(sum($"n").as("total"), count(lit(1)).as("docs"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // each group's pre-crossing sum is < 30 and the crossing doc is
    // included, so totals land in [30, 30 + max_doc_tokens)
    for ((g, (total, docs)) <- toks) {
      assert(total >= 30L && total < 30L + 14L, s"group $g total $total")
      assert(docs >= 2L, s"group $g must keep multiple docs, got $docs")
    }
    // without the budget, the same run keeps every survivor
    val full = DataPipeline.prepare(corpus, Some(benchmarks), cfg)
    assert(out.count() < full.count())
    // chunk-grain composition: budget before chunking, chunks inherit it
    val chunked = DataPipeline.prepare(corpus, Some(benchmarks),
      cfg.copy(tokenBudget = 30L, chunkTokens = 8),
      budgetGroups = Some(groups))
    assert(chunked.columns.contains("chunk_text"))
    assert(chunked.select("doc_id").distinct().count() == out.count())
  }

  test("stage 3b: classifier seeds drop off-domain docs before dedup") {
    val docs = Seq(
      (1L, "cat kitten purr feline whiskers nap"),
      (2L, "kitten cat whiskers purr soft fur"),
      (3L, "buy pills casino winner click spam")).toDF("doc_id", "text")
    val pos = Seq((100L, "cat kitten purr feline whiskers fur"))
      .toDF("doc_id", "text")
    val neg = Seq((200L, "buy pills casino winner click spam prize"))
      .toDF("doc_id", "text")
    val without = DataPipeline.prepare(docs, None, cfg)
      .select("doc_id").as[Long].collect().toSet
    assert(without == Set(1L, 2L, 3L), s"no-seeds baseline: $without")
    val withSeeds = DataPipeline.prepare(docs, None, cfg, Some((pos, neg)))
      .select("doc_id").as[Long].collect().toSet
    assert(withSeeds == Set(1L, 2L),
      s"classifier must drop the spam-vocabulary doc: $withSeeds")
  }

  test("stage 4 exact dedup catches the stripped markup copy before LSH") {
    // replicate stages 1-3, then assert the EXACT stage drops doc 20 —
    // the end-to-end test cannot distinguish this from the near-dup
    // stage (a Jaccard-1.0 pair falls to LSH too), this can
    val stripped = corpus.withColumn("text", TextAnalysis.stripMarkup($"text"))
    val quality = QualityFilter(stripped, cfg.quality)
    val deBoiler = Boilerplate.removeBoilerplate(quality)
      .select($"doc_id", $"clean_text".as("text"))
      .where(length($"text") > 0)
    val t1 = deBoiler.where($"doc_id" === 1L).head().getString(1)
    val t20 = deBoiler.where($"doc_id" === 20L).head().getString(1)
    assert(t1 == t20, s"post-boilerplate texts must be byte-identical:\n$t1\n$t20")
    val exact = Dedup.exactDeduped(deBoiler)
    assert(exact.where($"doc_id" === 20L).count() == 0)
    assert(exact.where($"doc_id" === 1L).count() == 1)
  }

  test("chunking stage emits strided chunk grain when enabled") {
    val out = DataPipeline.prepare(corpus, None,
      cfg.copy(chunkTokens = 8, chunkOverlap = 2))
    assert(out.columns.toSeq ==
      Seq("doc_id", "chunk_id", "chunk_text", "chunk_start", "chunk_tokens"))
    val d5 = out.where($"doc_id" === 5L).orderBy("chunk_id").collect()
    assert(d5.length >= 2, "13-token doc at chunk=8/stride=6 → 2 chunks")
    assert(d5.forall(_.getLong(4) <= 8L))
  }

  test("emitShards lays the chunk grain into token-budget shards, losslessly") {
    val chunks = DataPipeline.prepare(corpus, None,
      cfg.copy(chunkTokens = 8, chunkOverlap = 2)).cache()
    val sharded = DataPipeline.emitShards(chunks, shardTokens = 20L).cache()
    assert(sharded.count() == chunks.count(), "every chunk lands in a shard")
    assert(!sharded.columns.contains("_sid"), "internal key dropped")
    val byShard = sharded.groupBy("shard")
      .agg(org.apache.spark.sql.functions.sum("chunk_tokens").as("t"),
        org.apache.spark.sql.functions.max("cum_tokens").as("hi"))
      .orderBy("shard").collect()
    for (r <- byShard.init)
      assert(r.getLong(2) >= (r.getLong(0) + 1) * 20L,
        s"shard ${r.getLong(0)} ended before its token boundary")
    assert(byShard.length > 1, "corpus spans multiple shards")
  }

  test("prepareIncrement: corpus artifacts drive dedup; the loop folds forward") {
    val loopCfg = cfg.copy(spanK = 0) // tiny fixture: no span censuses
    val day1 = Seq(
      (1L, "alpha beta gamma delta epsilon one"),
      (2L, "pack my box with five dozen"),
      (3L, "totally different words here now")).toDF("doc_id", "text")
    val kept1 = DataPipeline.prepare(day1, None, loopCfg).cache()
    assert(kept1.count() == 3)
    val idx1 = Dedup.buildSignatureIndex(kept1).cached()
    val fps1 = kept1
      .select(TextAnalysis.fingerprint($"text").as("fp")).distinct().cache()

    val day2 = Seq(
      (101L, "alpha beta gamma delta epsilon one"),   // exact corpus dup
      (102L, "pack my box with five dozen extra"),    // near corpus dup (j=0.8)
      (103L, "a genuinely novel document arrives"),   // kept
      (104L, "a genuinely novel document arrives")    // in-batch exact dup
    ).toDF("doc_id", "text")
    val kept2 = DataPipeline
      .prepareIncrement(day2, idx1, fps1, None, loopCfg).cache()
    assert(kept2.collect().map(_.getLong(0)).toSet == Set(103L),
      "exact corpus dup, near corpus dup, and in-batch dup must all drop")

    // fold day 2 forward: a day-3 copy of the day-2 novelty must now drop
    val idx2 = idx1.append(kept2).cached()
    val fps2 = fps1.unionByName(
      kept2.select(TextAnalysis.fingerprint($"text").as("fp"))).distinct()
    val day3 = Seq(
      (201L, "a genuinely novel document arrives"),   // now a corpus dup
      (202L, "and still newer content shows up")      // kept
    ).toDF("doc_id", "text")
    val kept3 = DataPipeline.prepareIncrement(day3, idx2, fps2, None, loopCfg)
    assert(kept3.collect().map(_.getLong(0)).toSet == Set(202L))
  }
}
