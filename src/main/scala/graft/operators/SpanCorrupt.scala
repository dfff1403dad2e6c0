package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** T5-style span corruption (Raffel et al. 2020) — the denoising
  * objective's DATA side: mask contiguous token spans with sentinels
  * and emit (corrupted input, span targets) pairs. The piece that
  * makes it an ENGINE operator rather than a preprocessing script:
  * every masking decision derives from md5 (the [[Dsir]] pattern), so
  * the corruption is reproducible across runs/partitions/engines —
  * a training corpus can be re-materialized bit-for-bit, and the
  * external oracle replays every span. Beyond-reference surface
  * (SURVEY §2.13).
  *
  * Span walk: positions scan left-to-right; a position not covered by
  * a prior span starts one when draw(pos) < startProbMicro, with
  * length 1 + (draw(pos) div 2²⁰ mod 3) (spans of 1–3, mean 2 —
  * corruption rate ≈ 2·startProb). The walk is a sequential
  * recurrence per document, folded inside `aggregate` over the sorted
  * token array ([[Smoothing]]'s shape — per-doc length bounded by the
  * chunking contract upstream); the oracle replays it as a per-doc
  * recursive CTE. Sentinels render as ⟨extra_id_k⟩.
  *
  * Scale shape: one shuffle to doc grain (the tokens were exploded for
  * the draw columns), then shuffle-free codegen folds/assembly — no
  * UDFs, no driver data path.
  */
object SpanCorrupt {

  /** (doc_id, input_text, target_text, n_tokens, n_masked, n_spans) —
    * input has each masked span replaced by its sentinel; target is the
    * sentinel-delimited span contents (the T5 label sequence).
    */
  def corrupt(docs: DataFrame, startProbMicro: Long = 75000L,
              seed: Long = 42L, textCol: String = "text"): DataFrame = {
    require(startProbMicro > 0 && startProbMicro < 1000000L,
      s"startProbMicro must be in (0, 1e6), got $startProbMicro")
    val toks = docs.select(col("doc_id"),
        posexplode(TextAnalysis.tokens(TextAnalysis.normalized(col(textCol))))
          .as(Seq("pos", "tok")))
    val u = conv(substring(md5(concat(lit(s"corrupt:$seed:"),
      col("doc_id").cast("string"), lit(":"), col("pos").cast("string"))),
      1, 15), 16, 10).cast("long")
    val drawn = toks
      .withColumn("_start", pmod(u, lit(1000000L)) < startProbMicro)
      .withColumn("_len", (shiftright(u, 20) % 3 + 1).cast("int"))
    val folded = drawn.groupBy("doc_id")
      .agg(array_sort(collect_list(struct(col("pos"), col("tok"),
        col("_start"), col("_len")))).as("xs"))
      .withColumn("walk", expr(
        """aggregate(
          |  xs,
          |  named_struct('nf', 0, 'k', 0,
          |    'out', CAST(array() AS ARRAY<STRUCT<pos: INT, tok: STRING,
          |      masked: BOOLEAN, sstart: BOOLEAN, sk: INT>>)),
          |  (acc, e) -> CASE
          |    WHEN e.pos < acc.nf THEN named_struct(
          |      'nf', acc.nf, 'k', acc.k,
          |      'out', acc.out || array(named_struct('pos', e.pos,
          |        'tok', e.tok, 'masked', true, 'sstart', false,
          |        'sk', acc.k - 1)))
          |    WHEN e._start THEN named_struct(
          |      'nf', e.pos + e._len, 'k', acc.k + 1,
          |      'out', acc.out || array(named_struct('pos', e.pos,
          |        'tok', e.tok, 'masked', true, 'sstart', true,
          |        'sk', acc.k)))
          |    ELSE named_struct('nf', acc.nf, 'k', acc.k,
          |      'out', acc.out || array(named_struct('pos', e.pos,
          |        'tok', e.tok, 'masked', false, 'sstart', false,
          |        'sk', -1))) END,
          |  acc -> acc.out)""".stripMargin))
    folded.select(col("doc_id"),
      expr("""array_join(transform(
        |  filter(walk, w -> NOT w.masked OR w.sstart),
        |  w -> CASE WHEN w.sstart
        |            THEN concat('<extra_id_', CAST(w.sk AS STRING), '>')
        |            ELSE w.tok END), ' ')""".stripMargin).as("input_text"),
      expr("""array_join(transform(
        |  filter(walk, w -> w.masked),
        |  w -> CASE WHEN w.sstart
        |            THEN concat('<extra_id_', CAST(w.sk AS STRING), '> ', w.tok)
        |            ELSE w.tok END), ' ')""".stripMargin).as("target_text"),
      size(col("walk")).cast("long").as("n_tokens"),
      expr("size(filter(walk, w -> w.masked))").cast("long").as("n_masked"),
      expr("size(filter(walk, w -> w.sstart))").cast("long").as("n_spans"))
  }
}
