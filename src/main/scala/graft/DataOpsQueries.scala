package graft

import graft.operators.{ApplyChanges, BinaryQuantize, BloomIndex, Boilerplate, Clustering, Bfs, ConnectedComponents, ContentChunks, CorpusStats, DataPipeline, Decontaminate, Dedup, HashSplit, HistQuantile, Multimodal, MultiPattern, NegativeMining, Packing, Pca, QualityFilter, Quantize, Salience, Scc, SetCover, SetSimJoin, Similarity, SortedNeighborhood, SpanDedup, TextAnalysis, UnigramLm, WordPiece}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators over the documents + embeddings
  * tables: dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard),
  * similarity search (brute-force + LSH ANN), text analysis, multimodal
  * plumbing. Operators whose digests are engine-specific (xxhash64, RNG)
  * are rows-only; everything else carries a DuckDB oracle.
  */
object DataOpsQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Floor for the IVF semi-hard-negative recall harness: measured
    * 0.890 at sf0.01 (deterministic — no RNG anywhere in the chain)
    * with nProbe=6 of 16 fixed-centroid lists; the floor leaves margin
    * for corpus-size shifts while failing loudly on a banding or
    * assignment regression. Semi-hard recall trails plain top-k recall
    * (e_ann_recall ≈ 1.0 at the same probe ratio) because band-edge
    * negatives sit farther from the anchor than its own list
    * neighborhood — more probes or trained centroids buy it back.
    */
  private val RECALL_FLOOR_HARD_NEG = 0.8

  /** NB-scored corpus with boolean truth labels (lang = 'en') — the
    * shared input of the `v_roc_auc` / `v_avg_precision` /
    * `v_calibration*` / `v_confusion` evaluation gates. Train = test
    * here on purpose: the gates pin the METRIC arithmetic, not
    * generalization.
    */
  private def nbScored(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    operators.Classifier.scoreAgainst(d,
        d.where(col("lang") === "en"), d.where(col("lang") =!= "en"),
        buckets = 1024)
      .join(d.select(col("doc_id"), (col("lang") === "en").as("label")),
        Seq("doc_id"))
  }

  /** documents ∪ shifted-id copy — duplicate-by-construction corpus so
    * dedup operators always have work to do on the synthetic data (which
    * has no natural duplicates).
    */
  private def docsWithCopies(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    d.unionByName(d.withColumn("doc_id", col("doc_id") + lit(1000000L)))
  }

  /** The first k embedding vectors (vec_id < k, id order) as FIXED cluster
    * centroids — an engine-portable quantizer for the clustering gates:
    * the DuckDB oracle replays the exact same centroids from the table, so
    * assignment (argmin of ‖c‖²−2·v·c, sequential double sums on both
    * engines) is bit-reproducible. k·dim doubles — driver-trivial.
    */
  private def fixedCentroids(s: SparkSession, dir: String, k: Int): Array[Array[Double]] =
    fixedCentroidRange(s, dir, 0, k)

  /** Id-range variant of [[fixedCentroids]]: vectors lo ≤ vec_id < hi in
    * id order — used where the seed pool must not overlap another fixed
    * set (e.g. residual-PQ seeds vs the coarse centroids themselves,
    * whose residuals are degenerate zeros).
    */
  private def fixedCentroidRange(s: SparkSession, dir: String, lo: Int,
                                 hi: Int): Array[Array[Double]] =
    Tables.embeddings(s, dir)
      .where(col("vec_id") >= lo && col("vec_id") < hi)
      .orderBy("vec_id").select("embedding").collect()
      .map(_.getSeq[AnyRef](0).map(_.asInstanceOf[Number].doubleValue()).toArray)

  /** (i, a_i, b_i) VALUES rows of the Portable scheme's affine min-hash
    * family, interpolated into the minhash oracle so DuckDB replays the
    * exact same 32 hash functions (coefficients are splitmix64-derived in
    * [[graft.operators.HashScheme.Portable]], pure driver constants).
    */
  private val portableSeedRows: String = (0 until 32).map { i =>
    val p = graft.operators.HashScheme.Portable
    s"(${i}, ${p.affineA(i)}, ${p.affineB(i)})"
  }.mkString(", ")

  /** The portable-scheme MinHash-LSH chain as a DuckDB CTE-list fragment,
    * parameterized by the CTE providing (doc_id, text). Shared by
    * `d_minhash_neardup` and `d_neardup_clusters` so a hash-family /
    * shingle-rule / band-width change edits ONE string — the family
    * already changed once (schemeVer v1 → v2), and two hand-synced
    * copies would silently diverge on the next change. Ends at the
    * shingle-intersection CTE (`cand`/`sizes`/`ix`); callers add their
    * own scoring/select on top.
    */
  /** Shared DSIR oracle chain (hashed unigram+bigram buckets → smoothed
    * micro-log10 bucket ratios → per-doc integer sums), ending at the
    * `agg` CTE with (doc_id, n_feats, llr_micro). Target = lang='en',
    * raw = all documents, B = 1024 — mirrors the `t_dsir_*` gate
    * parameters; one string shared by both gates so the hash scheme or
    * smoothing can never half-change.
    */
  /** Hashed-feature chain shared by the DSIR and Naive-Bayes-classifier
    * oracles: normalized unigram+bigram rows hashed into B = 1024 buckets
    * (same md5-prefix scheme as [[Dsir.featureBucket]]), ending at the
    * `fb` CTE with (doc_id, lang, b).
    */
  private val hashedFeatureSql: String =
    """norm AS (
      |  SELECT doc_id, lang,
      |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
      |  FROM documents),
      |toks AS (
      |  SELECT doc_id, lang, CASE WHEN norm = '' THEN []::VARCHAR[]
      |       ELSE regexp_split_to_array(norm, '\s+') END AS toks
      |  FROM norm),
      |feats AS (
      |  SELECT doc_id, lang, t FROM
      |    (SELECT doc_id, lang, unnest(toks) AS t FROM toks) WHERE t <> ''
      |  UNION ALL
      |  SELECT doc_id, lang, g AS t FROM (
      |    SELECT doc_id, lang,
      |      unnest([array_to_string(toks[i:i+1], ' ') FOR i IN range(1, len(toks))]) AS g
      |    FROM toks WHERE len(toks) >= 2)),
      |fb AS (
      |  SELECT doc_id, lang,
      |    ('0x' || substr(md5(t), 1, 15))::BIGINT % 1024 AS b
      |  FROM feats)""".stripMargin

  private val dsirScoreSql: String =
    hashedFeatureSql + """,
      |tc AS (SELECT b, count(*) AS ct FROM fb WHERE lang = 'en' GROUP BY b),
      |rc AS (SELECT b, count(*) AS cr FROM fb GROUP BY b),
      |ttot AS (SELECT coalesce(sum(ct), 0)::BIGINT AS ctot FROM tc),
      |rtot AS (SELECT coalesce(sum(cr), 0)::BIGINT AS crtot FROM rc),
      |lr AS (
      |  SELECT r.b,
      |    CAST(round(log10((coalesce(tc.ct, 0)::DOUBLE + 1.0) * (rtot.crtot::DOUBLE + 1024.0)
      |      / ((r.cr::DOUBLE + 1.0) * (ttot.ctot::DOUBLE + 1024.0))) * 1e6) AS BIGINT) AS lr_micro
      |  FROM rc r LEFT JOIN tc USING (b) CROSS JOIN ttot CROSS JOIN rtot),
      |agg AS (
      |  SELECT doc_id, count(*) AS n_feats, sum(lr_micro)::BIGINT AS llr_micro
      |  FROM fb JOIN lr USING (b) GROUP BY doc_id)""".stripMargin

  /** Sign-matrix VALUES rows (j 0-based out-dim, i 1-based in-dim, s ±1)
    * for the `e_rand_proj` oracle — the SAME md5-derived matrix
    * [[operators.Projection.signMatrix]] builds for (seed 11, 16×64),
    * so DuckDB replays every projected coordinate integer-exactly.
    */
  private lazy val projSignRows: String =
    operators.Projection.signMatrix(11L, 16, 64).zipWithIndex.flatMap {
      case (row, j) => row.zipWithIndex.map { case (s0, i) => s"($j, ${i + 1}, $s0)" }
    }.mkString(", ")

  /** BM25 oracle (Lucene idf, k1 = 1.2, b = 0.75, queries = first 8
    * normalized tokens of every 97th doc, top-10): constants embedded
    * from the SAME Scala doubles the operator uses (toString
    * round-trips), so the one float chain per (q,d,term) replays in
    * order before the micro fix; avgdl is a sum of longs in double
    * (exact below 2^53 — integer partials), so it is order-free.
    * `maxDfFrac` parameterizes the stop-term cap shared with the capped
    * twin gate.
    */
  private def bm25OracleSql(maxDfFrac: Double): String =
    s"""WITH ${bm25ChainSql(maxDfFrac)}
      |SELECT query_id, doc_id, score_micro,
      |  round(score_micro::DOUBLE / 1e6, 6) AS score, rank
      |FROM rk WHERE rank <= 10""".stripMargin

  /** The CTE chain of [[bm25OracleSql]] up to `rk` (ranked per-query
    * scores) — shared with the RRF hybrid gate, which fuses it with the
    * cosine ranking.
    */
  private def bm25ChainSql(maxDfFrac: Double): String =
    s"""norm AS (
      |  SELECT doc_id,
      |    trim(regexp_replace(regexp_replace(lower(text), '[^\\p{L}\\p{N}\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS norm
      |  FROM documents),
      |tok AS (
      |  SELECT doc_id, CASE WHEN norm = '' THEN []::VARCHAR[]
      |       ELSE regexp_split_to_array(norm, '\\s+') END AS toks
      |  FROM norm),
      |tc AS (
      |  SELECT doc_id, term, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(toks) AS term FROM tok)
      |  WHERE term <> '' GROUP BY 1, 2),
      |dfq AS (SELECT term, count(*) AS df FROM tc GROUP BY 1),
      |dl AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM tc GROUP BY 1),
      |st AS (SELECT (SELECT count(*) FROM documents) AS n_docs,
      |              (SELECT avg(dl) FROM dl) AS avgdl),
      |qt AS (
      |  SELECT DISTINCT query_id, term FROM (
      |    SELECT doc_id AS query_id, unnest(toks[1:8]) AS term
      |    FROM tok WHERE doc_id % 97 = 0)
      |  WHERE term <> ''),
      |post AS (
      |  SELECT tc.doc_id, tc.term, tc.tf, dfq.df, dl.dl, st.n_docs, st.avgdl
      |  FROM tc JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN st
      |  WHERE dfq.df <= st.n_docs::DOUBLE * $maxDfFrac),
      |con AS (
      |  SELECT qt.query_id, post.doc_id,
      |    CAST(round(ln((post.n_docs::DOUBLE - post.df + 0.5) / (post.df::DOUBLE + 0.5) + 1.0)
      |      * (post.tf::DOUBLE * ${1.2 + 1.0})
      |      / (post.tf::DOUBLE + ${1.2} * (${1.0 - 0.75} + ${0.75} * post.dl::DOUBLE / post.avgdl))
      |      * 1e6) AS BIGINT) AS c_micro
      |  FROM post JOIN qt USING (term)),
      |sc AS (SELECT query_id, doc_id, sum(c_micro)::BIGINT AS score_micro
      |       FROM con GROUP BY 1, 2),
      |rk AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY query_id ORDER BY score_micro DESC, doc_id ASC) AS rank
      |  FROM sc)""".stripMargin

  /** PageRank oracle chain: the deterministic pseudo link graph, node
    * table, out-degrees, and `n` unrolled MATERIALIZED update rounds —
    * float constants interpolated from the operator's own doubles.
    */
  /** Unigram-LM tokenizer oracle chain (goes under a WITH RECURSIVE
    * prelude): word census (len ≤ K), seed substring census + micro-log10
    * scores, then per round a Viterbi forward pass UNROLLED as one CTE
    * per position (candidates = UNION ALL over piece lengths joining the
    * previous cells, argmax by (total desc, l desc) — the operator's
    * exact tie rule) + a recursive backpointer walk reconstructing the
    * segmentation, then the add-one-smoothed M-step census and new
    * scores. Ends with ufinal$r / useg$r for r = `rounds`.
    */
  private def unigramChainSql(rounds: Int, k: Int): String = {
    def viterbiSql(r: Int, sc: String): String = {
      val cells = (1 to k).map { p =>
        val cands = (1 to math.min(4, p)).map { l =>
          s"""SELECT prev.word, prev.wl, prev.total + s.logp AS total, $l AS l
            |      FROM vb${r}p${p - l} prev
            |      JOIN $sc s ON s.piece = substr(prev.word, ${p - l + 1}, $l)
            |      WHERE prev.wl >= $p""".stripMargin
        }.mkString("\n      UNION ALL ")
        s"""vb${r}p$p AS MATERIALIZED (
          |  SELECT word, wl, total, bp FROM (
          |    SELECT word, wl, total, l AS bp,
          |      row_number() OVER (PARTITION BY word ORDER BY total DESC, l DESC) AS rn
          |    FROM (
          |      $cands))
          |  WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"""vb${r}p0 AS MATERIALIZED (
        |  SELECT word, len(word) AS wl, 0::BIGINT AS total, 0::BIGINT AS bp
        |  FROM uwords),
        |$cells,
        |usteps$r AS MATERIALIZED (
        |  ${(1 to k).map(p => s"SELECT word, wl, $p AS p, total, bp FROM vb${r}p$p")
              .mkString("\n  UNION ALL ")}),
        |ufinal$r AS MATERIALIZED (
        |  SELECT word, wl, total AS logp_micro FROM usteps$r WHERE p = wl),
        |uback$r AS (
        |  SELECT word, wl AS pos, CAST(NULL AS VARCHAR) AS piece, 0::BIGINT AS ord
        |  FROM ufinal$r
        |  UNION ALL
        |  SELECT b.word, b.pos - st.bp,
        |    substr(b.word, (b.pos - st.bp + 1)::INT, st.bp::INT), b.ord + 1
        |  FROM uback$r b JOIN usteps$r st ON st.word = b.word AND st.p = b.pos
        |  WHERE b.pos > 0),
        |useg$r AS MATERIALIZED (
        |  SELECT word, string_agg(piece, ' ' ORDER BY pos) AS encoded,
        |    count(piece)::BIGINT AS n_pieces
        |  FROM uback$r WHERE piece IS NOT NULL GROUP BY word)""".stripMargin
    }
    val emRounds = (0 until rounds).map { r =>
      s"""${viterbiSql(r, s"sc$r")},
        |ucen${r + 1} AS MATERIALIZED (
        |  SELECT sp.piece, (coalesce(u.used, 0) + 1)::BIGINT AS cnt
        |  FROM (SELECT piece FROM ucen0) sp LEFT JOIN (
        |    SELECT piece, sum(freq)::BIGINT AS used FROM (
        |      SELECT w.freq, unnest(str_split(sg.encoded, ' ')) AS piece
        |      FROM useg$r sg JOIN uwords w ON w.word = sg.word) GROUP BY piece) u
        |  ON u.piece = sp.piece),
        |sc${r + 1} AS MATERIALIZED (
        |  SELECT piece, CAST(round(log10(cnt::DOUBLE / (SELECT sum(cnt) FROM ucen${r + 1})) * 1e6) AS BIGINT) AS logp
        |  FROM ucen${r + 1})""".stripMargin
    }.mkString(",\n")
    val tail = if (rounds == 0) "" else s",\n$emRounds"
    s"""unorm AS (
      |  SELECT trim(regexp_replace(regexp_replace(lower(text), '[^\\p{L}\\p{N}\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS norm
      |  FROM documents),
      |uwords AS MATERIALIZED (
      |  SELECT word, count(*)::BIGINT AS freq FROM (
      |    SELECT unnest(CASE WHEN norm = '' THEN []::VARCHAR[]
      |                       ELSE regexp_split_to_array(norm, '\\s+') END) AS word
      |    FROM unorm)
      |  WHERE word <> '' AND len(word) <= $k GROUP BY word),
      |upos AS (SELECT word, freq, unnest(range(1, len(word) + 1)) AS pos FROM uwords),
      |ucand AS (SELECT word, freq, pos, unnest(range(1, 5)) AS l FROM upos),
      |ucen0 AS MATERIALIZED (
      |  SELECT piece, cnt FROM (
      |    SELECT substr(word, pos, l) AS piece, sum(freq) AS cnt
      |    FROM ucand WHERE pos + l - 1 <= len(word) GROUP BY 1)
      |  WHERE cnt >= 5 OR len(piece) = 1),
      |sc0 AS MATERIALIZED (
      |  SELECT piece, CAST(round(log10(cnt::DOUBLE / (SELECT sum(cnt) FROM ucen0)) * 1e6) AS BIGINT) AS logp
      |  FROM ucen0)$tail,
      |${viterbiSql(rounds, s"sc$rounds")}""".stripMargin
  }

  /** HITS oracle chain: the g_pagerank graph, h0 = uniform 1e6 micro
    * hubs, then n rounds of (auth raw sum → max → normalize, hub raw
    * sum → max → normalize) as MATERIALIZED CTEs — ends with a$n / h$n.
    */
  private def hitsChainSql(n: Int): String = {
    val rounds = (1 to n).map { i =>
      s"""ar$i AS MATERIALIZED (
        |  SELECT nn.node, coalesce(c.s, 0) AS raw
        |  FROM n nn LEFT JOIN (
        |    SELECT e.dst AS node, sum(h.hub)::BIGINT AS s
        |    FROM e JOIN h${i - 1} h ON h.node = e.src GROUP BY e.dst) c
        |    ON c.node = nn.node),
        |am$i AS MATERIALIZED (SELECT max(raw) AS m FROM ar$i),
        |a$i AS MATERIALIZED (
        |  SELECT node, CASE WHEN (SELECT m FROM am$i) = 0 THEN 0
        |    ELSE CAST(round(raw::DOUBLE / (SELECT m FROM am$i) * 1e6) AS BIGINT) END AS auth
        |  FROM ar$i),
        |hr$i AS MATERIALIZED (
        |  SELECT nn.node, coalesce(c.s, 0) AS raw
        |  FROM n nn LEFT JOIN (
        |    SELECT e.src AS node, sum(a.auth)::BIGINT AS s
        |    FROM e JOIN a$i a ON a.node = e.dst GROUP BY e.src) c
        |    ON c.node = nn.node),
        |hm$i AS MATERIALIZED (SELECT max(raw) AS m FROM hr$i),
        |h$i AS MATERIALIZED (
        |  SELECT node, CASE WHEN (SELECT m FROM hm$i) = 0 THEN 0
        |    ELSE CAST(round(raw::DOUBLE / (SELECT m FROM hm$i) * 1e6) AS BIGINT) END AS hub
        |  FROM hr$i)""".stripMargin
    }.mkString(",\n")
    s"""e AS MATERIALIZED (
      |  SELECT doc_id AS src, (doc_id * 7 + 3) % 409 AS dst FROM documents
      |  UNION ALL SELECT doc_id, (doc_id // 10) * 10 FROM documents),
      |n AS MATERIALIZED (SELECT DISTINCT node FROM (
      |  SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)),
      |h0 AS MATERIALIZED (SELECT node, 1000000::BIGINT AS hub FROM n),
      |$rounds""".stripMargin
  }

  /** The `n` micro-quantized PageRank update rounds as CTEs — graph-
    * independent: callers supply `e` (src, dst) and the node/degree
    * CTEs come from it. Shared by the doc-graph gate (g_pagerank,
    * g_anchor_text) and the token-graph gate (t_textrank).
    */
  private def pageRankRoundsSql(n: Int): String = {
    val rounds = (1 to n).map { i =>
      s"""pr$i AS MATERIALIZED (
        |  SELECT n.node,
        |    (SELECT CAST(round(${1.0 - 0.85} * 1e6 / nn) AS BIGINT) FROM cnt)
        |      + coalesce(c.s, 0) AS pr
        |  FROM n LEFT JOIN (
        |    SELECT e.dst AS node,
        |      sum(CAST(round(${0.85} * p.pr / od.out) AS BIGINT))::BIGINT AS s
        |    FROM e JOIN pr${i - 1} p ON p.node = e.src JOIN od ON od.src = e.src
        |    GROUP BY e.dst) c ON c.node = n.node)""".stripMargin
    }.mkString(",\n")
    s"""n AS MATERIALIZED (SELECT DISTINCT node FROM (
      |  SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)),
      |cnt AS MATERIALIZED (SELECT count(*)::BIGINT AS nn FROM n),
      |od AS MATERIALIZED (SELECT src, count(*)::BIGINT AS out FROM e GROUP BY src),
      |pr0 AS MATERIALIZED (
      |  SELECT node, (SELECT CAST(round(1e6 / nn) AS BIGINT) FROM cnt) AS pr FROM n),
      |$rounds""".stripMargin
  }

  private def pageRankChainSql(n: Int): String =
    s"""e AS MATERIALIZED (
      |  SELECT doc_id AS src, (doc_id * 7 + 3) % 409 AS dst FROM documents
      |  UNION ALL SELECT doc_id, (doc_id // 10) * 10 FROM documents),
      |${pageRankRoundsSql(n)}""".stripMargin

  /** Shared ALS interaction fixture: customer×(part mod 101) with the
    * order-line count as the implicit rating — every user/item has ≥1
    * interaction by construction.
    */
  private def alsRatings(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"),
        (col("l_partkey") % 101).cast("long").as("item"))
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey").as("l_orderkey"),
        col("o_custkey").cast("long").as("user"))
    li.join(o, Seq("l_orderkey")).groupBy("user", "item")
      .agg(count(lit(1)).as("r"))
  }

  /** Decision-tree fixture: documents with a label ("mentions 'join'")
    * and four integer features of mixed signal strength.
    */
  private def treeDocs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir).select(col("doc_id"),
      coalesce(col("n_chars"), lit(0L)).as("n_chars"),
      coalesce(col("text"), lit("")).as("_t"))

  private def treeLabel: Column = expr("instr(_t, 'join') > 0")

  /** The raw (unclamped) integer features behind `treeFeatures` — the
    * quantile-binning gates derive adaptive edges from these.
    */
  private def quantileRawFeatures: Seq[Column] = Seq(
    coalesce(col("n_chars"), lit(0L)),
    expr("length(_t) - length(replace(_t, 'e', ''))"),
    expr("length(_t) - length(replace(_t, 'jo', ''))"),
    col("doc_id") % 97)

  private def treeFeatures: Seq[(Column, Long, Long)] = Seq(
    (col("n_chars"), 0L, 800L),
    (expr("length(_t) - length(replace(_t, 'e', ''))"), 0L, 80L),
    (expr("length(_t) - length(replace(_t, 'jo', ''))"), 0L, 40L),
    (col("doc_id") % 97, 0L, 97L))

  /** CART oracle chain mirroring `DecisionTree.train` level for level:
    * per level the (node × feature × bin) histogram census, dense
    * prefix-sum split candidates, the one-double-chain Gini cost with
    * (cost, f, t) argmin, the strict parent-gain test, and the
    * reassignment CASE. Ends with the `tree` CTE (split rows from
    * s1..s$depth + leaf census from the final assignment) and
    * `a${depth+1}` (terminal leaf per row).
    */
  /** The shared binned-document fixture of the tree/boost oracles:
    * (b0..b3, y) mirroring `treeDocs` + `treeFeatures` + `treeLabel`
    * through the exact clamp-and-divide binning.
    */
  private def treeFixtureSql(bins: Int): String = {
    def bin(x: String, lo: Long, hi: Long) =
      s"((least(greatest($x, $lo), ${hi - 1}) - $lo) * $bins) // ${hi - lo}"
    s"""SELECT ${bin("n_chars", 0, 800)} AS b0,
      |    ${bin("length(t) - length(replace(t, 'e', ''))", 0, 80)} AS b1,
      |    ${bin("length(t) - length(replace(t, 'jo', ''))", 0, 40)} AS b2,
      |    ${bin("doc_id % 97", 0, 97)} AS b3,
      |    (CASE WHEN strpos(t, 'join') > 0 THEN 1 ELSE 0 END)::BIGINT AS y,
      |    doc_id
      |  FROM (SELECT doc_id, coalesce(n_chars, 0) AS n_chars,
      |        coalesce(text, '') AS t FROM documents)""".stripMargin
  }

  /** Quantile-binning oracle preamble mirroring `QuantileBins.fit` /
    * `transform`: per raw feature the value census, the cumulative
    * ranks, the exact ⌈j·n/bins⌉ edges (integer ceil-div), and the
    * quantile-binned fixture `fxq` (bin = #edges < x).
    */
  private def quantilePreambleSql(bins: Int): String = {
    val perFeat = (0 until 4).map { f =>
      s"""qc$f AS (SELECT f$f AS v, count(*)::BIGINT AS c FROM qsrc GROUP BY 1),
        |qcc$f AS (SELECT v, (sum(c) OVER (ORDER BY v
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum
        |  FROM qc$f),
        |qe$f AS MATERIALIZED (
        |  SELECT j.j, min(cc.v)::BIGINT AS edge
        |  FROM (SELECT unnest(range(1, $bins))::BIGINT AS j) j
        |  JOIN qcc$f cc ON cc.cum >=
        |    (j.j * (SELECT count(*)::BIGINT FROM qsrc) + ${bins - 1}) // $bins
        |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""qsrc AS MATERIALIZED (
      |  SELECT doc_id,
      |    coalesce(n_chars, 0) AS f0,
      |    length(t) - length(replace(t, 'e', '')) AS f1,
      |    length(t) - length(replace(t, 'jo', '')) AS f2,
      |    doc_id % 97 AS f3,
      |    (CASE WHEN strpos(t, 'join') > 0 THEN 1 ELSE 0 END)::BIGINT AS y
      |  FROM (SELECT doc_id, coalesce(n_chars, 0) AS n_chars,
      |        coalesce(text, '') AS t FROM documents)),
      |$perFeat,
      |fxq AS MATERIALIZED (
      |  SELECT q.doc_id, q.y,
      |    (SELECT count(*) FROM qe0 e WHERE e.edge < q.f0)::BIGINT AS b0,
      |    (SELECT count(*) FROM qe1 e WHERE e.edge < q.f1)::BIGINT AS b1,
      |    (SELECT count(*) FROM qe2 e WHERE e.edge < q.f2)::BIGINT AS b2,
      |    (SELECT count(*) FROM qe3 e WHERE e.edge < q.f3)::BIGINT AS b3
      |  FROM qsrc q)""".stripMargin
  }

  private def treeChainSql(depth: Int, bins: Int, minLeaf: Int,
                           preamble: String = "",
                           a1From: String = ""): String = {
    val levels = (1 to depth).map { l =>
      val low = 1L << (l - 1); val high = 1L << l
      s"""cen$l AS MATERIALIZED (
        |  SELECT node, f, bin, count(*)::BIGINT AS n, sum(y)::BIGINT AS p FROM (
        |    SELECT node, 0 AS f, b0 AS bin, y FROM a$l
        |    UNION ALL SELECT node, 1, b1, y FROM a$l
        |    UNION ALL SELECT node, 2, b2, y FROM a$l
        |    UNION ALL SELECT node, 3, b3, y FROM a$l)
        |  WHERE node >= $low AND node < $high
        |  GROUP BY 1, 2, 3),
        |tot$l AS MATERIALIZED (
        |  SELECT node, sum(n)::BIGINT AS n, sum(p)::BIGINT AS p
        |  FROM cen$l WHERE f = 0 GROUP BY 1),
        |cand$l AS (
        |  SELECT node, f, bin AS t,
        |    (sum(n) OVER w)::BIGINT AS nl, (sum(p) OVER w)::BIGINT AS pl
        |  FROM cen$l
        |  WINDOW w AS (PARTITION BY node, f ORDER BY bin
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |  QUALIFY bin <= ${bins - 2}),
        |cost$l AS MATERIALIZED (
        |  SELECT *,
        |    al::HUGEINT * nr + ar::HUGEINT * nl AS num,
        |    nl::HUGEINT * nr AS den,
        |    (n::HUGEINT * n - p::HUGEINT * p
        |      - (n - p)::HUGEINT * (n - p)) AS pnum
        |  FROM (
        |    SELECT c.node, c.f, c.t, c.nl, c.pl, t2.n, t2.p,
        |      t2.n - c.nl AS nr, t2.p - c.pl AS pr,
        |      c.nl*c.nl - c.pl*c.pl - (c.nl-c.pl)*(c.nl-c.pl) AS al,
        |      (t2.n-c.nl)*(t2.n-c.nl) - (t2.p-c.pl)*(t2.p-c.pl)
        |        - ((t2.n-c.nl)-(t2.p-c.pl))*((t2.n-c.nl)-(t2.p-c.pl)) AS ar
        |    FROM cand$l c JOIN tot$l t2 USING (node)
        |    WHERE c.nl >= $minLeaf AND t2.n - c.nl >= $minLeaf
        |      AND t2.p > 0 AND t2.p < t2.n AND t2.n >= ${2 * minLeaf})),
        |s$l AS MATERIALIZED (
        |  -- exact rational argmin: num/den compared by HUGEINT
        |  -- cross-multiplication (mirrors the plan's BigInt compare)
        |  SELECT node, f, t, nl, pl, n, p FROM cost$l c
        |  WHERE c.num * c.n < c.pnum * c.den
        |    AND NOT EXISTS (SELECT 1 FROM cost$l c2
        |      WHERE c2.node = c.node AND (c2.num * c.den < c.num * c2.den
        |        OR (c2.num * c.den = c.num * c2.den
        |            AND (c2.f < c.f OR (c2.f = c.f AND c2.t < c.t)))))),
        |a${l + 1} AS MATERIALIZED (
        |  SELECT r.b0, r.b1, r.b2, r.b3, r.y,
        |    CASE WHEN s.node IS NULL THEN r.node
        |      ELSE 2*r.node + CASE WHEN (CASE s.f WHEN 0 THEN r.b0
        |        WHEN 1 THEN r.b1 WHEN 2 THEN r.b2 ELSE r.b3 END) <= s.t
        |        THEN 0 ELSE 1 END
        |    END AS node
        |  FROM a$l r LEFT JOIN s$l s ON s.node = r.node)""".stripMargin
    }.mkString(",\n")
    val splitRows = (1 to depth).map(l =>
      s"""SELECT node, 'split' AS kind, f::BIGINT AS feature, t::BIGINT AS bin,
        |    n, p AS pos FROM s$l""".stripMargin).mkString("\n  UNION ALL ")
    val src = if (a1From.isEmpty) s"(\n  ${treeFixtureSql(bins)})" else a1From
    s"""${preamble}a1 AS MATERIALIZED (
      |  SELECT b0, b1, b2, b3, y, 1::BIGINT AS node FROM $src),
      |$levels,
      |tree AS (
      |  $splitRows
      |  UNION ALL
      |  SELECT node, 'leaf' AS kind, -1::BIGINT, -1::BIGINT,
      |    count(*)::BIGINT, sum(y)::BIGINT
      |  FROM a${depth + 1} GROUP BY node)""".stripMargin
  }

  /** Random-forest oracle chain mirroring `Forest.train`/`vote`: per
    * tree a PREFIXED copy of the CART level replay restricted to the
    * tree's md5-Bernoulli row bag and its driver-computed feature
    * subset (interpolated — shared with the plan by construction),
    * plus a full-corpus leaf ROUTE through the same split tables, the
    * bagged-leaf majority classes, and the vote/OOB tallies. Ends with
    * `forest` (global-feature-indexed tree rows) and `votes`.
    */
  private def forestChainSql(nTrees: Int, perTree: Int, depth: Int,
                             bins: Int, minLeaf: Int,
                             bagMicro: Long): String = {
    val subsets = operators.Forest.featureSubsets(nTrees, 4, perTree)
    def featCase(feats: Seq[String], qual: String): String =
      s"CASE s.f ${feats.zipWithIndex.map { case (c, i) =>
        s"WHEN $i THEN $qual$c" }.mkString(" ")} END"
    def assign(out: String, from: String, split: String,
               feats: Seq[String]): String =
      s"""$out AS MATERIALIZED (
        |  SELECT r.b0, r.b1, r.b2, r.b3, r.y, r.doc_id,
        |    CASE WHEN s.node IS NULL THEN r.node
        |      ELSE 2*r.node + CASE WHEN (${featCase(feats, "r.")}) <= s.t
        |        THEN 0 ELSE 1 END
        |    END AS node
        |  FROM $from r LEFT JOIN $split s ON s.node = r.node)""".stripMargin
    def lvl(p: String, feats: Seq[String], l: Int): String = {
      val low = 1L << (l - 1); val high = 1L << l
      val unions = feats.zipWithIndex.map { case (c, i) =>
        if (i == 0) s"SELECT node, 0 AS f, $c AS bin, y FROM ${p}a$l"
        else s"UNION ALL SELECT node, $i, $c, y FROM ${p}a$l"
      }.mkString("\n    ")
      s"""${p}cen$l AS MATERIALIZED (
        |  SELECT node, f, bin, count(*)::BIGINT AS n, sum(y)::BIGINT AS p FROM (
        |    $unions)
        |  WHERE node >= $low AND node < $high
        |  GROUP BY 1, 2, 3),
        |${p}tot$l AS MATERIALIZED (
        |  SELECT node, sum(n)::BIGINT AS n, sum(p)::BIGINT AS p
        |  FROM ${p}cen$l WHERE f = 0 GROUP BY 1),
        |${p}cand$l AS (
        |  SELECT node, f, bin AS t,
        |    (sum(n) OVER w)::BIGINT AS nl, (sum(p) OVER w)::BIGINT AS pl
        |  FROM ${p}cen$l
        |  WINDOW w AS (PARTITION BY node, f ORDER BY bin
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |  QUALIFY bin <= ${bins - 2}),
        |${p}cost$l AS MATERIALIZED (
        |  SELECT *,
        |    al::HUGEINT * nr + ar::HUGEINT * nl AS num,
        |    nl::HUGEINT * nr AS den,
        |    (n::HUGEINT * n - p::HUGEINT * p
        |      - (n - p)::HUGEINT * (n - p)) AS pnum
        |  FROM (
        |    SELECT c.node, c.f, c.t, c.nl, c.pl, t2.n, t2.p,
        |      t2.n - c.nl AS nr, t2.p - c.pl AS pr,
        |      c.nl*c.nl - c.pl*c.pl - (c.nl-c.pl)*(c.nl-c.pl) AS al,
        |      (t2.n-c.nl)*(t2.n-c.nl) - (t2.p-c.pl)*(t2.p-c.pl)
        |        - ((t2.n-c.nl)-(t2.p-c.pl))*((t2.n-c.nl)-(t2.p-c.pl)) AS ar
        |    FROM ${p}cand$l c JOIN ${p}tot$l t2 USING (node)
        |    WHERE c.nl >= $minLeaf AND t2.n - c.nl >= $minLeaf
        |      AND t2.p > 0 AND t2.p < t2.n AND t2.n >= ${2 * minLeaf})),
        |${p}s$l AS MATERIALIZED (
        |  SELECT node, f, t, nl, pl, n, p FROM ${p}cost$l c
        |  WHERE c.num * c.n < c.pnum * c.den
        |    AND NOT EXISTS (SELECT 1 FROM ${p}cost$l c2
        |      WHERE c2.node = c.node AND (c2.num * c.den < c.num * c2.den
        |        OR (c2.num * c.den = c.num * c2.den
        |            AND (c2.f < c.f OR (c2.f = c.f AND c2.t < c.t)))))),
        |${assign(s"${p}a${l + 1}", s"${p}a$l", s"${p}s$l", feats)}"""
        .stripMargin
    }
    def bag(t: Int): String =
      s"(('0x' || substr(md5('rfbag:$t:' || doc_id), 1, 15))::BIGINT" +
        s" % 1000000) < $bagMicro"
    val chains = (0 until nTrees).map { t =>
      val fs = subsets(t); val feats = fs.map(i => s"b$i"); val p = s"t$t"
      val levels = (1 to depth).map(l => lvl(p, feats, l)).mkString(",\n")
      val routes = (1 to depth).map(l =>
        assign(s"${p}r${l + 1}", s"${p}r$l", s"${p}s$l", feats))
        .mkString(",\n")
      s"""${p}a1 AS MATERIALIZED (
        |  SELECT b0, b1, b2, b3, y, doc_id, 1::BIGINT AS node FROM fx
        |  WHERE ${bag(t)}),
        |$levels,
        |${p}r1 AS (
        |  SELECT b0, b1, b2, b3, y, doc_id, 1::BIGINT AS node FROM fx),
        |$routes,
        |${p}cls AS MATERIALIZED (
        |  SELECT node,
        |    CASE WHEN 2*sum(y) >= count(*) THEN 1 ELSE 0 END::BIGINT AS cls
        |  FROM ${p}a${depth + 1} GROUP BY node),
        |${p}pred AS MATERIALIZED (
        |  SELECT r.doc_id, c.cls AS pred,
        |    CASE WHEN ${bag(t)} THEN 1 ELSE 0 END::BIGINT AS inbag
        |  FROM ${p}r${depth + 1} r JOIN ${p}cls c ON c.node = r.node)"""
        .stripMargin
    }.mkString(",\n")
    val forestRows = (0 until nTrees).flatMap { t =>
      val fs = subsets(t); val p = s"t$t"
      val globalF = s"CASE f ${fs.zipWithIndex.map { case (g, i) =>
        s"WHEN $i THEN $g" }.mkString(" ")} END"
      (1 to depth).map(l =>
        s"""SELECT $t::BIGINT AS tree, node, 'split' AS kind,
          |    ($globalF)::BIGINT AS feature, t::BIGINT AS bin, n, p AS pos
          |  FROM ${p}s$l""".stripMargin) :+
        s"""SELECT $t::BIGINT, node, 'leaf', -1::BIGINT, -1::BIGINT,
          |    count(*)::BIGINT, sum(y)::BIGINT
          |  FROM ${p}a${depth + 1} GROUP BY node""".stripMargin
    }.mkString("\n  UNION ALL ")
    val joins = (1 until nTrees)
      .map(t => s"JOIN t${t}pred p$t USING (doc_id)").mkString(" ")
    val vp = (0 until nTrees).map(t => s"p$t.pred").mkString(" + ")
    val ov = (0 until nTrees).map(t => s"(1 - p$t.inbag)").mkString(" + ")
    val op = (0 until nTrees)
      .map(t => s"p$t.pred * (1 - p$t.inbag)").mkString(" + ")
    s"""fx AS MATERIALIZED (
      |  ${treeFixtureSql(bins)}),
      |$chains,
      |forest AS (
      |  $forestRows),
      |votes AS (
      |  SELECT p0.doc_id, ($vp)::BIGINT AS votes_pos,
      |    (CASE WHEN 2*($vp) >= $nTrees THEN 1 ELSE 0 END)::BIGINT AS pred,
      |    ($ov)::BIGINT AS oob_votes, ($op)::BIGINT AS oob_pos,
      |    CASE WHEN ($ov) = 0 THEN NULL
      |      ELSE (CASE WHEN 2*($op) >= ($ov) THEN 1 ELSE 0 END)::BIGINT
      |    END AS oob_pred
      |  FROM t0pred p0 $joins)""".stripMargin
  }

  /** β-form AdaBoost oracle chain mirroring `Boost.train` verbatim —
    * the loop is ENTIRELY integer: per round the weighted (feature ×
    * bin) census, a DENSE (feature × threshold) candidate grid (the
    * driver iterates empty bins too, so the oracle must), the exact
    * integer (E, f, t) argmin with majority side classes, the 2·E < W
    * weak-learner stop, the integer half-up β, and the clamped
    * multiplicative weight update. Ends with st1..st$rounds and
    * w$rounds; `stumps` unions the non-empty rounds.
    */
  private def boostChainSql(rounds: Int, bins: Int): String = {
    val roundsSql = (1 to rounds).map { r =>
      s"""tot$r AS (
        |  SELECT sum(w)::BIGINT AS tw,
        |    sum(CASE WHEN y = 1 THEN w ELSE 0 END)::BIGINT AS twp
        |  FROM w${r - 1}),
        |cen$r AS MATERIALIZED (
        |  SELECT f, bin, sum(w)::BIGINT AS sw,
        |    sum(CASE WHEN y = 1 THEN w ELSE 0 END)::BIGINT AS swp FROM (
        |    SELECT 0 AS f, b0 AS bin, y, w FROM w${r - 1}
        |    UNION ALL SELECT 1, b1, y, w FROM w${r - 1}
        |    UNION ALL SELECT 2, b2, y, w FROM w${r - 1}
        |    UNION ALL SELECT 3, b3, y, w FROM w${r - 1})
        |  GROUP BY 1, 2),
        |cand$r AS (
        |  SELECT g.f, g.t,
        |    coalesce(sum(c.sw), 0)::BIGINT AS wl,
        |    coalesce(sum(c.swp), 0)::BIGINT AS wpl
        |  FROM grid g LEFT JOIN cen$r c ON c.f = g.f AND c.bin <= g.t
        |  GROUP BY 1, 2),
        |st$r AS MATERIALIZED (
        |  SELECT $r AS rnd, f, t, cl, cr, e, tw,
        |    greatest(1, (2*e*1000000 + (tw - e)) // (2*(tw - e))) AS beta
        |  FROM (
        |    SELECT *, row_number() OVER (ORDER BY e, f, t) AS rk FROM (
        |      SELECT c.f, c.t,
        |        CASE WHEN 2*c.wpl >= c.wl THEN 1 ELSE 0 END AS cl,
        |        CASE WHEN 2*(t1.twp - c.wpl) >= (t1.tw - c.wl)
        |          THEN 1 ELSE 0 END AS cr,
        |        (least(c.wpl, c.wl - c.wpl)
        |          + least(t1.twp - c.wpl,
        |              (t1.tw - c.wl) - (t1.twp - c.wpl)))::BIGINT AS e,
        |        t1.tw
        |      FROM cand$r c, tot$r t1))
        |  WHERE rk = 1 AND 2*e < tw),
        |w$r AS MATERIALIZED (
        |  SELECT b0, b1, b2, b3, y, doc_id,
        |    CASE WHEN s.f IS NULL THEN w
        |      WHEN (CASE WHEN (CASE s.f WHEN 0 THEN b0 WHEN 1 THEN b1
        |          WHEN 2 THEN b2 ELSE b3 END) <= s.t
        |        THEN s.cl ELSE s.cr END) = y
        |      THEN greatest(1, (w * s.beta) // 1000000)
        |      ELSE w END AS w
        |  FROM w${r - 1} LEFT JOIN st$r s ON true)""".stripMargin
    }.mkString(",\n")
    val union = (1 to rounds).map(r => s"SELECT * FROM st$r")
      .mkString("\n  UNION ALL ")
    s"""grid AS (
      |  SELECT ff.f, tt.t
      |  FROM (SELECT unnest(range(0, 4))::BIGINT AS f) ff,
      |       (SELECT unnest(range(0, ${bins - 1}))::BIGINT AS t) tt),
      |w0 AS MATERIALIZED (
      |  SELECT b0, b1, b2, b3, y, doc_id, 1000000::BIGINT AS w FROM (
      |  ${treeFixtureSql(bins)})),
      |$roundsSql,
      |stumps AS (
      |  $union)""".stripMargin
  }

  /** Rank-2 ALS oracle chain mirroring `Als.solveSide` verbatim: the
    * ratings fixture, the exact-integer q0 seed, then `rounds`
    * alternations — each half-round the exact normal-equation sums
    * (BIGINT products, HUGEINT-widened sums cast back) feeding the ONE
    * double Cramer chain, snapped to micro. Ends at p$rounds (users) /
    * q$rounds (items).
    */
  private def alsChainSql(rounds: Int): String = {
    def solve(out: String, from: String, solveKey: String,
              fixedKey: String): String =
      s"""$out AS MATERIALIZED (
        |  SELECT id,
        |    CAST(round((a22*b1 - a12*b2) / (a11*a22 - a12*a12) * 1e6) AS BIGINT) AS f1,
        |    CAST(round((a11*b2 - a12*b1) / (a11*a22 - a12*a12) * 1e6) AS BIGINT) AS f2
        |  FROM (
        |    SELECT id, s11::DOUBLE / 1e12 + 0.1::DOUBLE AS a11,
        |      s12::DOUBLE / 1e12 AS a12, s22::DOUBLE / 1e12 + 0.1::DOUBLE AS a22,
        |      sb1::DOUBLE / 1e6 AS b1, sb2::DOUBLE / 1e6 AS b2
        |    FROM (
        |      SELECT r.$solveKey AS id,
        |        sum(f.f1 * f.f1)::BIGINT AS s11, sum(f.f1 * f.f2)::BIGINT AS s12,
        |        sum(f.f2 * f.f2)::BIGINT AS s22, sum(f.f1 * r.r)::BIGINT AS sb1,
        |        sum(f.f2 * r.r)::BIGINT AS sb2
        |      FROM rat r JOIN $from f ON f.id = r.$fixedKey GROUP BY 1)))"""
        .stripMargin
    val chain = (1 to rounds).flatMap { i =>
      Seq(solve(s"p$i", s"q${i - 1}", "usr", "item"),
        solve(s"q$i", s"p$i", "item", "usr"))
    }.mkString(",\n")
    s"""rat AS MATERIALIZED (
      |  SELECT o.o_custkey::BIGINT AS usr, (l.l_partkey % 101)::BIGINT AS item,
      |    count(*)::BIGINT AS r
      |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      |  GROUP BY 1, 2),
      |q0 AS MATERIALIZED (
      |  SELECT item AS id, 1000000::BIGINT AS f1,
      |    ('0x' || substr(md5('als:' || item), 1, 15))::BIGINT % 1000000 AS f2
      |  FROM (SELECT DISTINCT item FROM rat)),
      |$chain""".stripMargin
  }

  /** Dangling-redistribution oracle chain: the functional graph
    * restricted to src % 3 ≠ 0, so nodes ≡ 0 (mod 3) genuinely dangle;
    * each round adds round(0.85·dm/N) with dm = the previous round's
    * total dangling rank (exact integer sum). Ends at `pr$n`.
    */
  private def pageRankDanglingChainSql(n: Int): String = {
    val rounds = (1 to n).map { i =>
      s"""dgl$i AS MATERIALIZED (
        |  SELECT coalesce(sum(pr), 0)::BIGINT AS dm FROM pr${i - 1}
        |  WHERE node NOT IN (SELECT src FROM e)),
        |pr$i AS MATERIALIZED (
        |  SELECT n.node,
        |    (SELECT CAST(round(${1.0 - 0.85} * 1e6 / nn) AS BIGINT) FROM cnt)
        |      + (SELECT CAST(round(${0.85} * dm / nn) AS BIGINT) FROM dgl$i, cnt)
        |      + coalesce(c.s, 0) AS pr
        |  FROM n LEFT JOIN (
        |    SELECT e.dst AS node,
        |      sum(CAST(round(${0.85} * p.pr / od.out) AS BIGINT))::BIGINT AS s
        |    FROM e JOIN pr${i - 1} p ON p.node = e.src JOIN od ON od.src = e.src
        |    GROUP BY e.dst) c ON c.node = n.node)""".stripMargin
    }.mkString(",\n")
    s"""e AS MATERIALIZED (
      |  SELECT src, dst FROM (
      |    SELECT doc_id AS src, (doc_id * 7 + 3) % 409 AS dst FROM documents
      |    UNION ALL SELECT doc_id, (doc_id // 10) * 10 FROM documents)
      |  WHERE src % 3 <> 0),
      |n AS MATERIALIZED (SELECT DISTINCT node FROM (
      |  SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)),
      |cnt AS MATERIALIZED (SELECT count(*)::BIGINT AS nn FROM n),
      |od AS MATERIALIZED (SELECT src, count(*)::BIGINT AS out FROM e GROUP BY src),
      |pr0 AS MATERIALIZED (
      |  SELECT node, (SELECT CAST(round(1e6 / nn) AS BIGINT) FROM cnt) AS pr FROM n),
      |$rounds""".stripMargin
  }

  /** Weighted-PageRank oracle chain: same graph with multiplicity
    * weights 1 + (src + dst) % 5; contributions scale by w/wout.
    * Ends at `pr$n`.
    */
  private def pageRankWeightedChainSql(n: Int): String = {
    val rounds = (1 to n).map { i =>
      s"""pr$i AS MATERIALIZED (
        |  SELECT n.node,
        |    (SELECT CAST(round(${1.0 - 0.85} * 1e6 / nn) AS BIGINT) FROM cnt)
        |      + coalesce(c.s, 0) AS pr
        |  FROM n LEFT JOIN (
        |    SELECT e.dst AS node,
        |      sum(CAST(round(${0.85} * (p.pr * e.w) / ow.wout) AS BIGINT))::BIGINT AS s
        |    FROM e JOIN pr${i - 1} p ON p.node = e.src JOIN ow ON ow.src = e.src
        |    GROUP BY e.dst) c ON c.node = n.node)""".stripMargin
    }.mkString(",\n")
    s"""e AS MATERIALIZED (
      |  SELECT src, dst, 1 + (src + dst) % 5 AS w FROM (
      |    SELECT doc_id AS src, (doc_id * 7 + 3) % 409 AS dst FROM documents
      |    UNION ALL SELECT doc_id, (doc_id // 10) * 10 FROM documents)),
      |n AS MATERIALIZED (SELECT DISTINCT node FROM (
      |  SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)),
      |cnt AS MATERIALIZED (SELECT count(*)::BIGINT AS nn FROM n),
      |ow AS MATERIALIZED (SELECT src, sum(w)::BIGINT AS wout FROM e GROUP BY src),
      |pr0 AS MATERIALIZED (
      |  SELECT node, (SELECT CAST(round(1e6 / nn) AS BIGINT) FROM cnt) AS pr FROM n),
      |$rounds""".stripMargin
  }

  /** Personalized-PageRank oracle chain on the same graph: teleport
    * mass lands only on the seed nodes (node % 50 = 0), walk starts
    * from the seeds. Ends at `pr$n`.
    */
  private def pprChainSql(n: Int): String = {
    val rounds = (1 to n).map { i =>
      s"""pr$i AS MATERIALIZED (
        |  SELECT f.node,
        |    (CASE WHEN f.seed
        |       THEN (SELECT CAST(round(${1.0 - 0.85} * 1e6 / ns) AS BIGINT) FROM nsq)
        |       ELSE 0 END)
        |      + coalesce(c.s, 0) AS pr
        |  FROM f LEFT JOIN (
        |    SELECT e.dst AS node,
        |      sum(CAST(round(${0.85} * p.pr / od.out) AS BIGINT))::BIGINT AS s
        |    FROM e JOIN pr${i - 1} p ON p.node = e.src JOIN od ON od.src = e.src
        |    GROUP BY e.dst) c ON c.node = f.node)""".stripMargin
    }.mkString(",\n")
    s"""e AS MATERIALIZED (
      |  SELECT doc_id AS src, (doc_id * 7 + 3) % 409 AS dst FROM documents
      |  UNION ALL SELECT doc_id, (doc_id // 10) * 10 FROM documents),
      |n AS MATERIALIZED (SELECT DISTINCT node FROM (
      |  SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)),
      |sd AS MATERIALIZED (SELECT node FROM n WHERE node % 50 = 0),
      |nsq AS MATERIALIZED (SELECT count(*)::BIGINT AS ns FROM sd),
      |f AS MATERIALIZED (
      |  SELECT n.node, s.node IS NOT NULL AS seed
      |  FROM n LEFT JOIN sd s ON s.node = n.node),
      |od AS MATERIALIZED (SELECT src, count(*)::BIGINT AS out FROM e GROUP BY src),
      |pr0 AS MATERIALIZED (
      |  SELECT node, CASE WHEN seed
      |    THEN (SELECT CAST(round(1e6 / ns) AS BIGINT) FROM nsq)
      |    ELSE 0 END AS pr FROM f),
      |$rounds""".stripMargin
  }

  /** TextRank oracle chain: normalized tokens filtered to length ≥
    * `minLen`, adjacent filtered tokens paired (window 2), symmetrized
    * distinct edges, then the shared PageRank rounds. Ends at `pr$n`.
    */
  private def textRankChainSql(n: Int, minLen: Int): String =
    s"""onorm AS (
      |  SELECT doc_id,
      |    trim(regexp_replace(regexp_replace(lower(text), '[^\\p{L}\\p{N}\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS nt
      |  FROM documents),
      |seq AS MATERIALIZED (
      |  SELECT doc_id, generate_subscripts(a, 1) AS pos, unnest(a) AS tok FROM (
      |    SELECT doc_id,
      |      CASE WHEN nt = '' THEN []::VARCHAR[]
      |           ELSE list_filter(regexp_split_to_array(nt, '\\s+'),
      |                            t -> length(t) >= $minLen) END AS a
      |    FROM onorm)),
      |rawp AS (
      |  SELECT a.tok AS src, b.tok AS dst
      |  FROM seq a JOIN seq b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      |  WHERE a.tok <> b.tok),
      |e AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
      |  SELECT src, dst FROM rawp UNION ALL SELECT dst, src FROM rawp)),
      |${pageRankRoundsSql(n)}""".stripMargin

  /** Label-propagation oracle chain on the g_pagerank graph: symmetrized
    * loop-free edges, labels seeded with node ids, then `n` synchronous
    * rounds of (neighbor-label + self-vote census → argmax by (count
    * desc, label asc) → adopt) — the exact loop
    * [[graft.operators.LabelPropagation.propagate]] runs, unrolled.
    * Ends at `l$n`.
    */
  private def lpaChainSql(n: Int): String = {
    val rounds = (1 to n).map { i =>
      s"""l$i AS MATERIALIZED (
        |  SELECT node, label FROM (
        |    SELECT node, label,
        |      row_number() OVER (PARTITION BY node
        |        ORDER BY count(*) DESC, label ASC) AS rn
        |    FROM (
        |      SELECT s.src AS node, p.label
        |      FROM sym s JOIN l${i - 1} p ON p.node = s.dst
        |      UNION ALL SELECT node, label FROM l${i - 1})
        |    GROUP BY node, label) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""e0 AS MATERIALIZED (
      |  SELECT doc_id AS src, (doc_id * 7 + 3) % 409 AS dst FROM documents
      |  UNION ALL SELECT doc_id, (doc_id // 10) * 10 FROM documents),
      |sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
      |  SELECT src, dst FROM e0 WHERE src <> dst
      |  UNION ALL SELECT dst, src FROM e0 WHERE src <> dst)),
      |l0 AS MATERIALIZED (SELECT node, node AS label FROM (
      |  SELECT DISTINCT node FROM (
      |    SELECT src AS node FROM e0 UNION ALL SELECT dst AS node FROM e0))),
      |$rounds""".stripMargin
  }

  /** IPF-raking oracle chain: (lang, source) cell census, then `iters`
    * full rounds of alternating proportional scaling (dim a, then dim
    * b), weights in micro units with ONE rounded double chain per cell
    * per half-round — the loop [[graft.operators.Raking.fit]] runs,
    * unrolled. Ends at `wb$iters`.
    */
  private def ipfChainSql(iters: Int): String = {
    def half(prev: String, out: String, dim: String, nd: String): String =
      s"""$out AS MATERIALIZED (
        |  SELECT w.a, w.b, w.cnt,
        |    CAST(round(w.w * ((SELECT n FROM tot) * 1e6 / (SELECT $nd FROM tot)) / cur.cur) AS BIGINT) AS w
        |  FROM $prev w JOIN (
        |    SELECT $dim, sum(cnt * w)::BIGINT AS cur FROM $prev GROUP BY $dim
        |  ) cur ON cur.$dim = w.$dim)""".stripMargin
    val rounds = (1 to iters).flatMap { i =>
      val prev = if (i == 1) "w0" else s"wb${i - 1}"
      Seq(half(prev, s"wa$i", "a", "na"), half(s"wa$i", s"wb$i", "b", "nb"))
    }.mkString(",\n")
    s"""cells AS MATERIALIZED (
      |  SELECT lang AS a, source AS b, count(*)::BIGINT AS cnt
      |  FROM documents GROUP BY 1, 2),
      |tot AS MATERIALIZED (
      |  SELECT sum(cnt)::BIGINT AS n, count(DISTINCT a)::BIGINT AS na,
      |    count(DISTINCT b)::BIGINT AS nb FROM cells),
      |w0 AS (SELECT a, b, cnt, 1000000::BIGINT AS w FROM cells),
      |$rounds""".stripMargin
  }

  /** Greedy k-center oracle chain: int8-quantize the embeddings (the
    * e_quantize_int8 grid, kept as DOUBLE lists so list_dot_product
    * stays exact integer math), seed at min vec_id, then k−1 unrolled
    * rounds of (argmax running min-distance² → update via least) — the
    * exact loop [[graft.operators.Coreset.kCenters]] runs. Ends with
    * per-round picks in c2..c$k.
    */
  private def kCenterChainSql(k: Int): String = {
    val rounds = (2 to k).map { i =>
      s"""c$i AS MATERIALIZED (
        |  SELECT vec_id, d2min FROM s${i - 1}
        |  ORDER BY d2min DESC, vec_id ASC LIMIT 1),
        |s$i AS MATERIALIZED (
        |  SELECT a.vec_id, a.qv, a.sq,
        |    least(a.d2min, CAST(a.sq + b.sq - 2 * list_dot_product(a.qv, b.qv) AS BIGINT)) AS d2min
        |  FROM s${i - 1} a, (SELECT n.qv, n.sq FROM n2 n
        |    WHERE n.vec_id = (SELECT vec_id FROM c$i)) b)""".stripMargin
    }.mkString(",\n")
    s"""qm AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS ev,
      |    list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS ma
      |  FROM embeddings),
      |q AS MATERIALIZED (
      |  SELECT vec_id, list_transform(ev, x ->
      |    CASE WHEN ma = 0 THEN 0.0 ELSE round(x * 127.0 / ma) END) AS qv
      |  FROM qm),
      |n2 AS MATERIALIZED (
      |  SELECT vec_id, qv, list_dot_product(qv, qv) AS sq FROM q),
      |s1 AS MATERIALIZED (
      |  SELECT a.vec_id, a.qv, a.sq,
      |    CAST(a.sq + b.sq - 2 * list_dot_product(a.qv, b.qv) AS BIGINT) AS d2min
      |  FROM n2 a, (SELECT qv, sq FROM n2
      |    WHERE vec_id = (SELECT min(vec_id) FROM n2)) b),
      |$rounds""".stripMargin
  }

  /** Poisson-bootstrap oracle chain: the 60-bit md5 uniform, the
    * constant Poisson(1) threshold ladder (same driver-computed double
    * literals as [[graft.operators.Bootstrap.thresholds]]), exact
    * micro-long weighted sums, per-replicate means at 6dp. Ends at `m`
    * = (b, n_eff, sum_micro, mean).
    */
  private def bootstrapChainSql(b: Int, seed: Long): String = {
    val ladder = operators.Bootstrap.thresholds.zipWithIndex
      .map { case (c, k) => s"WHEN u < $c THEN $k" }.mkString(" ")
    s"""base AS (
      |  SELECT event_id::VARCHAR AS k, CAST(round(value * 1e6) AS BIGINT) AS x
      |  FROM events),
      |reps AS (
      |  SELECT k, x, b FROM base CROSS JOIN (SELECT unnest(range($b)) AS b)),
      |wts AS (
      |  SELECT b, x, (CASE $ladder ELSE 9 END)::BIGINT AS w
      |  FROM (
      |    SELECT b, x,
      |      (('0x' || substr(md5('boot:$seed:' || b::VARCHAR || ':' || k), 1, 15))::BIGINT + 0.5)
      |        / 1.152921504606846976e18 AS u
      |    FROM reps)),
      |m AS MATERIALIZED (
      |  SELECT b::BIGINT AS b, sum(w)::BIGINT AS n_eff,
      |    sum(w * x)::BIGINT AS sum_micro,
      |    round(sum(w * x)::DOUBLE / sum(w) / 1e6, 6) AS mean
      |  FROM wts GROUP BY 1)""".stripMargin
  }

  /** Fellegi–Sunter gate fields — ONE definition shared by the Spark
    * gate and the oracle, so the micro-bit weight constants are
    * identical by construction.
    */
  private def fsGateFields: Seq[operators.RecordLinkage.FsField] = Seq(
    operators.RecordLinkage.FsField("lang",
      col("lang_a") === col("lang_b"), 0.95, 0.2),
    operators.RecordLinkage.FsField("source",
      col("source_a") === col("source_b"), 0.9, 0.1),
    operators.RecordLinkage.FsField("len",
      col("lb_a") === col("lb_b"), 0.8, 0.05))

  /** VSM (tf-idf cosine) oracle chain — the r_vsm_topk scoring replay
    * (micro-quantized weights, exact integer dots, 6dp cosine), shared
    * with the nDCG evaluation gate. Ends at `rk` = (query_id, doc_id,
    * cosine, rank).
    */
  private def vsmChainSql: String =
    """norm AS (
      |  SELECT doc_id,
      |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
      |  FROM documents),
      |tok AS (
      |  SELECT doc_id, CASE WHEN norm = '' THEN []::VARCHAR[]
      |       ELSE regexp_split_to_array(norm, '\s+') END AS toks
      |  FROM norm),
      |tc AS (
      |  SELECT doc_id, term, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(toks) AS term FROM tok)
      |  WHERE term <> '' GROUP BY 1, 2),
      |dfq AS (SELECT term, count(*) AS df FROM tc GROUP BY 1),
      |st AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
      |wd AS (
      |  SELECT tc.doc_id, tc.term,
      |    CAST(round(tc.tf::DOUBLE
      |      * (ln((st.n_docs::DOUBLE + 1.0) / (dfq.df::DOUBLE + 1.0)) + 1.0)
      |      * 1e6) AS BIGINT) AS w_micro
      |  FROM tc JOIN dfq USING (term) CROSS JOIN st),
      |dn AS (SELECT doc_id, sum(w_micro * w_micro)::BIGINT AS d2
      |       FROM wd GROUP BY 1),
      |qtc AS (
      |  SELECT doc_id AS query_id, term, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(toks[1:8]) AS term FROM tok
      |        WHERE doc_id % 97 = 0)
      |  WHERE term <> '' GROUP BY 1, 2),
      |wq AS (
      |  SELECT qtc.query_id, qtc.term,
      |    CAST(round(qtc.tf::DOUBLE
      |      * (ln((st.n_docs::DOUBLE + 1.0) / (dfq.df::DOUBLE + 1.0)) + 1.0)
      |      * 1e6) AS BIGINT) AS q_micro
      |  FROM qtc JOIN dfq USING (term) CROSS JOIN st),
      |qn AS (SELECT query_id, sum(q_micro * q_micro)::BIGINT AS q2
      |       FROM wq GROUP BY 1),
      |dt AS (
      |  SELECT wq.query_id, wd.doc_id, sum(wd.w_micro * wq.q_micro)::BIGINT AS dot
      |  FROM wd JOIN wq USING (term) GROUP BY 1, 2),
      |sc AS (
      |  SELECT dt.query_id, dt.doc_id,
      |    round(dt.dot::DOUBLE / (sqrt(dn.d2::DOUBLE) * sqrt(qn.q2::DOUBLE)), 6) AS cosine
      |  FROM dt JOIN dn USING (doc_id) JOIN qn USING (query_id)),
      |rk AS (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY query_id ORDER BY cosine DESC, doc_id ASC) AS rank
      |  FROM sc)""".stripMargin

  /** MMR oracle chain: int8 grid, per-query top-`pool` relevance
    * short-list (cosine micro-rounded once), pool² pairwise sims, then
    * `k` unrolled greedy rounds — window argmax on the exact long score
    * λµ·relµ − (1e6−λµ)·maxsimµ, then the maxsim update join — the
    * exact loop [[graft.operators.Mmr.diversifiedTopK]] runs. Picks
    * land in w1..w$k.
    */
  private def mmrChainSql(pool: Int, k: Int, lam: Long): String = {
    val colam = 1000000L - lam
    val rounds = (1 to k).map { i =>
      val prev = s"cand${i - 1}"
      val update = if (i == k) "" else
        s""",
          |cand$i AS MATERIALIZED (
          |  SELECT c.query_id, c.doc_id, c.rel_micro,
          |    greatest(c.maxsim, s.sim_micro) AS maxsim
          |  FROM $prev c
          |  JOIN w$i w ON w.query_id = c.query_id AND c.doc_id <> w.doc_id
          |  JOIN sims s ON s.query_id = c.query_id AND s.a_id = c.doc_id
          |    AND s.b_id = w.doc_id)""".stripMargin
      s"""w$i AS MATERIALIZED (
        |  SELECT query_id, doc_id, rel_micro, mmr_e12 FROM (
        |    SELECT query_id, doc_id, rel_micro,
        |      $lam * rel_micro - $colam * maxsim AS mmr_e12,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY ($lam * rel_micro - $colam * maxsim) DESC, doc_id ASC) AS rn
        |    FROM $prev) WHERE rn = 1)$update""".stripMargin
    }.mkString(",\n")
    s"""qm AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS ev,
      |    list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS ma
      |  FROM embeddings),
      |qz AS MATERIALIZED (
      |  SELECT vec_id, list_transform(ev, x ->
      |    CASE WHEN ma = 0 THEN 0.0 ELSE round(x * 127.0 / ma) END) AS qv
      |  FROM qm),
      |rel AS MATERIALIZED (
      |  SELECT query_id, doc_id, qv, rel_micro FROM (
      |    SELECT q.vec_id AS query_id, c.vec_id AS doc_id, c.qv AS qv,
      |      CAST(round(list_cosine_similarity(c.qv, q.qv) * 1e6) AS BIGINT) AS rel_micro,
      |      row_number() OVER (PARTITION BY q.vec_id
      |        ORDER BY CAST(round(list_cosine_similarity(c.qv, q.qv) * 1e6) AS BIGINT) DESC,
      |          c.vec_id ASC) AS rn
      |    FROM qz c CROSS JOIN (SELECT vec_id, qv FROM qz WHERE vec_id < 5) q
      |    WHERE c.vec_id <> q.vec_id)
      |  WHERE rn <= $pool),
      |sims AS MATERIALIZED (
      |  SELECT a.query_id, a.doc_id AS a_id, b.doc_id AS b_id,
      |    CAST(round(list_cosine_similarity(a.qv, b.qv) * 1e6) AS BIGINT) AS sim_micro
      |  FROM rel a JOIN rel b ON a.query_id = b.query_id AND a.doc_id <> b.doc_id),
      |cand0 AS (
      |  SELECT query_id, doc_id, rel_micro, 0::BIGINT AS maxsim FROM rel),
      |$rounds""".stripMargin
  }

  /** k-core oracle chain on the g_pagerank graph: symmetrized loop-free
    * edges, then `rounds` unrolled peel rounds (degree census → keep ≥ k
    * → edge filter). The k-core is canonical, so the oracle only needs
    * ENOUGH rounds to reach the fixed point (the Spark side `require`s
    * convergence independently); 20 covers the ≤18 observed at any SF.
    * Ends at `e$rounds`.
    */
  private def kCoreChainSql(k: Int, rounds: Int): String = {
    val rs = (1 to rounds).map { i =>
      s"""kp$i AS MATERIALIZED (
        |  SELECT src AS node FROM e${i - 1} GROUP BY src HAVING count(*) >= $k),
        |e$i AS MATERIALIZED (
        |  SELECT e.src, e.dst FROM e${i - 1} e
        |  JOIN kp$i a ON a.node = e.src JOIN kp$i b ON b.node = e.dst)"""
        .stripMargin
    }.mkString(",\n")
    s"""e0raw AS (
      |  SELECT doc_id AS src, (doc_id * 7 + 3) % 409 AS dst FROM documents
      |  UNION ALL SELECT doc_id, (doc_id // 10) * 10 FROM documents),
      |e0 AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
      |  SELECT src, dst FROM e0raw WHERE src <> dst
      |  UNION ALL SELECT dst, src FROM e0raw WHERE src <> dst)),
      |$rs""".stripMargin
  }

  /** Per-document TextRank oracle chain (the GROUPED PageRank — every
    * key carries doc_id): filtered token positions, per-doc symmetric
    * adjacency edges, per-doc node counts, then `n` micro-quantized
    * rounds. Ends at `pr$n` with (doc_id, node, pr).
    */
  private def textRankDocChainSql(n: Int, minLen: Int,
                                  where: String): String = {
    val rounds = (1 to n).map { i =>
      s"""pr$i AS MATERIALIZED (
        |  SELECT nn.doc_id, nn.node,
        |    CAST(round(${1.0 - 0.85} * 1e6 / nn.nn) AS BIGINT)
        |      + coalesce(c.s, 0) AS pr
        |  FROM nwn nn LEFT JOIN (
        |    SELECT e.doc_id, e.dst AS node,
        |      sum(CAST(round(${0.85} * p.pr / od.out) AS BIGINT))::BIGINT AS s
        |    FROM e JOIN pr${i - 1} p ON p.doc_id = e.doc_id AND p.node = e.src
        |    JOIN od ON od.doc_id = e.doc_id AND od.src = e.src
        |    GROUP BY e.doc_id, e.dst) c
        |    ON c.doc_id = nn.doc_id AND c.node = nn.node)""".stripMargin
    }.mkString(",\n")
    s"""onorm AS (
      |  SELECT doc_id,
      |    trim(regexp_replace(regexp_replace(lower(text), '[^\\p{L}\\p{N}\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS nt
      |  FROM documents WHERE $where),
      |seq AS MATERIALIZED (
      |  SELECT doc_id, generate_subscripts(a, 1) AS pos, unnest(a) AS tok FROM (
      |    SELECT doc_id,
      |      CASE WHEN nt = '' THEN []::VARCHAR[]
      |           ELSE list_filter(regexp_split_to_array(nt, '\\s+'),
      |                            t -> length(t) >= $minLen) END AS a
      |    FROM onorm)),
      |rawp AS (
      |  SELECT a.doc_id, a.tok AS src, b.tok AS dst
      |  FROM seq a JOIN seq b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      |  WHERE a.tok <> b.tok),
      |e AS MATERIALIZED (SELECT DISTINCT doc_id, src, dst FROM (
      |  SELECT doc_id, src, dst FROM rawp
      |  UNION ALL SELECT doc_id, dst, src FROM rawp)),
      |nd AS MATERIALIZED (SELECT DISTINCT doc_id, src AS node FROM e),
      |nnc AS (SELECT doc_id, count(*)::BIGINT AS nn FROM nd GROUP BY doc_id),
      |nwn AS MATERIALIZED (
      |  SELECT nd.doc_id, nd.node, nnc.nn FROM nd JOIN nnc USING (doc_id)),
      |od AS MATERIALIZED (
      |  SELECT doc_id, src, count(*)::BIGINT AS out FROM e GROUP BY 1, 2),
      |pr0 AS MATERIALIZED (
      |  SELECT doc_id, node, CAST(round(1e6 / nn) AS BIGINT) AS pr FROM nwn),
      |$rounds""".stripMargin
  }

  /** BPE-training oracle chain: the word census symbolized to spaced
    * characters + `</w>`, then `n` generated rounds of (pair census →
    * argmax → one-pass merge application) — the loop the Spark trainer
    * runs, unrolled into CTEs. Ends with `s$n` (final symbolization)
    * and `b1..b$n` (the per-round winning pairs).
    */
  /** The GPT-2 byte↔unicode table as a 1-row DuckDB MAP CTE — the 256
    * entries interpolate from [[graft.operators.Bpe.byteToChar]], so
    * both engines share ONE table definition by construction. Emitted
    * as a single source line: stripMargin must never see a '|' at a
    * line start, and byte 0x7C maps to '|' mid-line.
    */
  private def byteMapSql: String = {
    val keys = (0 until 256).map(b => f"'$b%02X'").mkString(", ")
    val vals = graft.operators.Bpe.byteToChar
      .map(c => "'" + c.replace("'", "''") + "'").mkString(", ")
    s"bmap AS (SELECT map([$keys], [$vals]) AS m)"
  }

  /** Byte-level init symbolization of `wordCol` (requires `bmap` in
    * scope via cross join): hex-pair split of the UTF-8 bytes mapped
    * through the GPT-2 table, space-joined + ' </w>'.
    */
  private def byteSymsSql(wordCol: String): String =
    s"""array_to_string(list_transform(
       |      str_split(trim(regexp_replace(hex(encode($wordCol)), '(..)', '\\1 ', 'g')), ' '),
       |      h -> map_extract(m, h)[1]), ' ') || ' </w>'""".stripMargin

  private def bpeChainSql(n: Int, where: String = "",
                          byteLevel: Boolean = false,
                          textExpr: String = "text"): String = {
    val whereClause = if (where.isEmpty) "" else s" WHERE $where"
    val rounds = (1 to n).map { i =>
      s"""p$i AS (
        |  SELECT g, sum(freq)::BIGINT AS cnt FROM (
        |    SELECT freq, unnest([array_to_string(l[k:k+1], ' ') FOR k IN range(1, len(l))]) AS g
        |    FROM (SELECT freq, str_split(syms, ' ') AS l FROM s${i - 1}) WHERE len(l) >= 2)
        |  GROUP BY g),
        |b$i AS MATERIALIZED (SELECT g, cnt FROM p$i ORDER BY cnt DESC, g ASC LIMIT 1),
        |s$i AS MATERIALIZED (
        |  SELECT word, freq,
        |    trim(replace(' ' || syms || ' ',
        |      ' ' || (SELECT g FROM b$i) || ' ',
        |      ' ' || replace((SELECT g FROM b$i), ' ', '') || ' ')) AS syms
        |  FROM s${i - 1})""".stripMargin
    }.mkString(",\n")
    val s0 =
      if (byteLevel)
        s"""$byteMapSql,
           |s0 AS (SELECT word, freq,
           |         ${byteSymsSql("word")} AS syms
           |       FROM w0, bmap)""".stripMargin
      else
        """s0 AS (SELECT word, freq,
          |         regexp_replace(word, '(.)', '\1 ', 'g') || '</w>' AS syms
          |       FROM w0)""".stripMargin
    s"""norm AS (
      |  SELECT doc_id,
      |    trim(regexp_replace(regexp_replace(lower($textExpr), '[^\\p{L}\\p{N}\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS norm
      |  FROM documents$whereClause),
      |tok AS (
      |  SELECT unnest(CASE WHEN norm = '' THEN []::VARCHAR[]
      |       ELSE regexp_split_to_array(norm, '\\s+') END) AS word
      |  FROM norm),
      |w0 AS (SELECT word, count(*)::BIGINT AS freq FROM tok WHERE word <> '' GROUP BY word),
      |$s0,
      |$rounds""".stripMargin
  }

  /** Product-quantization oracle chain (m = 8 subspaces of width 8,
    * codebooks = the 16 fixed-centroid seed vectors sliced): per-subspace
    * ‖c‖²−2·v·c argmin — the e_kmeans_assign kernel — ending at the
    * `codes` CTE with (vec_id, j, code). Shared by encode and ADC top-k
    * so the code assignment can never half-change.
    */
  private def pqCodesSql(): String =
    """c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
      |      FROM embeddings WHERE vec_id < 16),
      |v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
      |sub AS (SELECT unnest(range(0, 8)) AS j),
      |cs AS (
      |  SELECT v.vec_id, sub.j, c.cid,
      |    list_dot_product(cv[sub.j*8+1:sub.j*8+8], cv[sub.j*8+1:sub.j*8+8])
      |      - 2 * list_dot_product(ev[sub.j*8+1:sub.j*8+8], cv[sub.j*8+1:sub.j*8+8]) AS sc
      |  FROM v CROSS JOIN sub CROSS JOIN c),
      |codes AS (
      |  SELECT vec_id, j, cid AS code FROM (
      |    SELECT vec_id, j, cid,
      |      row_number() OVER (PARTITION BY vec_id, j ORDER BY sc ASC, cid ASC) AS rn
      |    FROM cs) WHERE rn = 1)""".stripMargin

  /** Naive-Bayes classifier oracle chain: positive = lang='en', negative
    * = the rest, B = 1024 — mirrors the `t_nb_classifier` gate. Ends at
    * `nbagg` with per-doc (n_feats, w_sum_micro) plus the one-row
    * `nbprior`.
    */
  /** The g_walks chain: pseudo-graph edges, rank-indexed out-edges,
    * degree census, and all 4 md5-uniform walk steps unrolled —
    * shared by the walk gate and the composed DeepWalk pipeline.
    */
  private val randomWalkChainSql: String = {
    val steps = (1 to 4).map { t =>
      s"""rwf$t AS (
         |  SELECT f.start, f.wid, i.dst AS cur
         |  FROM rwf${t - 1} f
         |  JOIN rwd d ON d.cur = f.cur
         |  JOIN rwi i ON i.cur = f.cur
         |   AND i.idx = 1 + ('0x' || substr(md5(
         |     'rw:42:' || f.start::VARCHAR || ':' ||
         |     f.wid::VARCHAR || ':$t'), 1, 15))::BIGINT % d.deg)""".stripMargin
    }.mkString(",\n")
    s"""e0 AS (
      |  SELECT doc_id AS src, (doc_id * 7 + 3) % 409 AS dst
      |  FROM documents
      |  UNION ALL SELECT doc_id, (doc_id // 10) * 10 FROM documents),
      |rwe AS (SELECT DISTINCT src, dst FROM e0),
      |rwi AS (
      |  SELECT src AS cur, dst,
      |    (row_number() OVER (PARTITION BY src ORDER BY dst))::BIGINT
      |      AS idx
      |  FROM rwe),
      |rwd AS (SELECT src AS cur, count(*)::BIGINT AS deg
      |  FROM rwe GROUP BY 1),
      |rwn AS (SELECT DISTINCT node FROM (
      |  SELECT src AS node FROM rwe UNION ALL SELECT dst FROM rwe)),
      |rww AS (SELECT unnest([1, 2])::BIGINT AS wid),
      |rwf0 AS (
      |  SELECT n.node AS start, w.wid, n.node AS cur
      |  FROM rwn n CROSS JOIN rww w),
      |$steps""".stripMargin
  }

  private val randomWalkUnionSql: String =
    (0 to 4).map(t =>
      s"SELECT start, wid, $t AS step, cur AS node FROM rwf$t")
      .mkString("\nUNION ALL ")

  private val nbScoreSql: String =
    hashedFeatureSql + """,
      |pc AS (SELECT b, count(*) AS cp FROM fb WHERE lang = 'en' GROUP BY b),
      |nc AS (SELECT b, count(*) AS cn FROM fb WHERE lang <> 'en' GROUP BY b),
      |ptot AS (SELECT coalesce(sum(cp), 0)::BIGINT AS cptot FROM pc),
      |ntot AS (SELECT coalesce(sum(cn), 0)::BIGINT AS cntot FROM nc),
      |w AS (
      |  SELECT coalesce(pc.b, nc.b) AS b,
      |    CAST(round(log10((coalesce(pc.cp, 0)::DOUBLE + 1.0) * (ntot.cntot::DOUBLE + 1024.0)
      |      / ((coalesce(nc.cn, 0)::DOUBLE + 1.0) * (ptot.cptot::DOUBLE + 1024.0))) * 1e6) AS BIGINT) AS w_micro
      |  FROM pc FULL OUTER JOIN nc ON pc.b = nc.b CROSS JOIN ptot CROSS JOIN ntot),
      |nbprior AS (
      |  SELECT CAST(round(log10(
      |      ((SELECT count(*) FROM documents WHERE lang = 'en')::DOUBLE + 1.0)
      |    / ((SELECT count(*) FROM documents WHERE lang <> 'en')::DOUBLE + 1.0)) * 1e6) AS BIGINT) AS prior_micro),
      |nbagg AS (
      |  SELECT doc_id, count(*) AS n_feats,
      |    sum(coalesce(w.w_micro, 0))::BIGINT AS w_sum_micro
      |  FROM fb LEFT JOIN w USING (b) GROUP BY doc_id)""".stripMargin

  /** Unrolled warm-start k-means refresh: round 1 assigns against the
    * raw fixed centroids (the e_kmeans_assign arithmetic), each later
    * round against the previous round's micro-mean centroids; empty
    * clusters carry the previous micro coordinate (the snap-to-grid
    * contract of `Clustering.refineCentroids`).
    */
  private def kmeansWarmSql(rounds: Int): String =
    kmeansRoundsSql(
      """cv0 AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
        |        FROM embeddings WHERE vec_id < 8)""".stripMargin, rounds)

  /** Cold-seeding head for [[kmeansRoundsSql]]: the md5 "seed:" ladder
    * over vec ids, micro-snapped — replays Clustering.kmeansCold's
    * deterministic seed draw (cluster_id = ladder order).
    */
  private def kmeansColdHeadSql(k: Int): String =
    s"""cv0 AS (SELECT cid - 1 AS cid,
       |          list_transform(ev, x -> round(x * 1e6) / 1e6) AS cv
       |        FROM (
       |          SELECT row_number() OVER (
       |              ORDER BY md5('seed:' || vec_id), vec_id) AS cid,
       |            embedding::DOUBLE[] AS ev
       |          FROM embeddings QUALIFY cid <= $k))""".stripMargin

  /** The unrolled Lloyd-round CTE chain shared by the warm and cold
    * k-means oracles: `head` must define cv0 AS (cid, cv DOUBLE[]).
    */
  private def kmeansRoundsSql(head: String, rounds: Int): String = {
    val prelude =
      """wv AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
        |p1 AS (SELECT cid, generate_subscripts(cv, 1) - 1 AS pos,
        |         CAST(round(unnest(cv) * 1e6) AS BIGINT) AS prev_cm
        |       FROM cv0)""".stripMargin
    val parts = (1 to rounds).map { r =>
      s"""sc$r AS (
         |  SELECT wv.vec_id, c.cid,
         |    list_dot_product(c.cv, c.cv) - 2 * list_dot_product(wv.ev, c.cv) AS sc
         |  FROM wv CROSS JOIN cv${r - 1} c),
         |asg$r AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT vec_id, cid,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY sc ASC, cid ASC) AS rn
         |    FROM sc$r) WHERE rn = 1),
         |cen$r AS (
         |  SELECT a.cid, generate_subscripts(wv.ev, 1) - 1 AS pos,
         |    CAST(round(unnest(wv.ev) * 1e6) AS BIGINT) AS vm
         |  FROM asg$r a JOIN wv USING (vec_id)),
         |cag$r AS (
         |  SELECT cid, pos,
         |    CAST(round(sum(vm)::DOUBLE / count(*)) AS BIGINT) AS cm,
         |    count(*)::BIGINT AS n
         |  FROM cen$r GROUP BY 1, 2),
         |r$r AS (
         |  SELECT p.cid, p.pos, coalesce(c.cm, p.prev_cm) AS cm,
         |    coalesce(c.n, 0) AS n
         |  FROM p$r p LEFT JOIN cag$r c USING (cid, pos)),
         |p${r + 1} AS (SELECT cid, pos, cm AS prev_cm FROM r$r),
         |cv$r AS (SELECT cid, list(cm::DOUBLE / 1e6 ORDER BY pos) AS cv
         |         FROM r$r GROUP BY cid)""".stripMargin
    }
    (head +: prelude +: parts).mkString(",\n")
  }

  /** Labeled NB scores + score-grain census with strict-below
    * cumulatives — the shared head of the classifier-evaluation
    * oracles (extends [[nbScoreSql]]).
    */
  private val nbEvalSql: String =
    nbScoreSql + """,
      |vscored AS (
      |  SELECT d.doc_id,
      |    (coalesce(a.w_sum_micro, 0) + p.prior_micro)::BIGINT AS s,
      |    (d.lang = 'en') AS label
      |  FROM documents d LEFT JOIN nbagg a USING (doc_id)
      |  CROSS JOIN nbprior p),
      |vcen AS (
      |  SELECT s, sum(CASE WHEN label THEN 1 ELSE 0 END)::BIGINT AS n_pos,
      |    sum(CASE WHEN label THEN 0 ELSE 1 END)::BIGINT AS n_neg
      |  FROM vscored GROUP BY s),
      |vcum AS (
      |  SELECT s, n_pos, n_neg,
      |    coalesce(sum(n_neg) OVER (ORDER BY s ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumneg_below,
      |    coalesce(sum(n_pos) OVER (ORDER BY s ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumpos_below
      |  FROM vcen)""".stripMargin

  /** Stages 1-3b of the pipeline cleaning head as CTEs over `src`
    * (doc_id, text): markup strip, Gopher quality rules, ' table '
    * boilerplate census, empty-drop, NB classifier filter (trained on
    * the raw documents table via [[nbScoreSql]], the seed corpora both
    * pipe gates pass). Emits `pclean` (doc_id, text). CTE names are
    * fixed - instantiate at most once per query.
    */
  private def cleanHeadSql(src: String): String =
    s"""pstrip AS MATERIALIZED (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(
        |      replace(replace(replace(replace(replace(replace(
        |        regexp_replace(
        |          regexp_replace(text,
        |            '(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>|<!--.*?-->', ' ', 'g'),
        |          '(?s)<[^>]*>', ' ', 'g'),
        |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&apos;', ''''), '&amp;', '&'),
        |      '[^\\S\\n]+', ' ', 'g'), '[ \\n]*\\n[ \\n]*', chr(10), 'g'), ' ' || chr(10)) AS text
        |  FROM $src),
        |pq_base AS (
        |  SELECT doc_id, text,
        |    CASE WHEN trim(text) = '' THEN []::VARCHAR[]
        |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS qtoks,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\\p{L}\\p{N}\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS qnorm
        |  FROM pstrip),
        |pq_ntok AS (
        |  SELECT doc_id, text, qtoks,
        |    CASE WHEN qnorm = '' THEN []::VARCHAR[]
        |         ELSE regexp_split_to_array(qnorm, '\\s+') END AS ntoks
        |  FROM pq_base),
        |pq_sh AS (
        |  SELECT doc_id, text, qtoks,
        |    CASE WHEN len(ntoks) < 2 THEN [array_to_string(ntoks, ' ')]
        |         ELSE [array_to_string(ntoks[i:i+1], ' ') FOR i IN range(1, len(ntoks))]
        |    END AS sh2,
        |    CASE WHEN len(ntoks) < 3 THEN [array_to_string(ntoks, ' ')]
        |         ELSE [array_to_string(ntoks[i:i+2], ' ') FOR i IN range(1, len(ntoks) - 1)]
        |    END AS sh3
        |  FROM pq_ntok),
        |pq_sig AS (
        |  SELECT doc_id, text,
        |    len(qtoks) AS n_tokens,
        |    round((length(text) - (len(qtoks) - 1))::DOUBLE / greatest(len(qtoks), 1), 6) AS mtl,
        |    round(len(list_filter(qtoks, t -> t IN ('the','a','an','and','or','of','to','in','is','it','that','for')))::DOUBLE
        |          / greatest(len(qtoks), 1), 6) AS swf,
        |    round(1 - len(list_distinct(sh2))::DOUBLE / greatest(len(sh2), 1), 6) AS d2,
        |    round(1 - len(list_distinct(sh3))::DOUBLE / greatest(len(sh3), 1), 6) AS d3
        |  FROM pq_sh),
        |pq AS MATERIALIZED (
        |  SELECT doc_id, text FROM pq_sig
        |  WHERE NOT (n_tokens < 25 OR n_tokens > 90 OR mtl < 3.8 OR mtl > 5.1
        |             OR swf < 0.02 OR d2 > 0.08 OR d3 > 0.05)),
        |pbl AS (
        |  SELECT doc_id, generate_subscripts(l, 1) AS pos, unnest(l) AS line
        |  FROM (SELECT doc_id, string_split(text, ' table ') AS l FROM pq)),
        |pbp AS (
        |  SELECT line FROM (
        |    SELECT line, count(DISTINCT doc_id) AS n_docs FROM pbl GROUP BY 1)
        |  WHERE n_docs >= 20),
        |pbk AS (
        |  SELECT doc_id, array_to_string(list(line ORDER BY pos), ' table ') AS text
        |  FROM pbl WHERE line NOT IN (SELECT line FROM pbp) GROUP BY 1),
        |pclean3 AS MATERIALIZED (
        |  SELECT q.doc_id, coalesce(k.text, '') AS text
        |  FROM pq q LEFT JOIN pbk k USING (doc_id)
        |  WHERE length(coalesce(k.text, '')) > 0),
        |$nbScoreSql,
        |pnb_norm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\\p{L}\\p{N}\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS norm
        |  FROM pclean3),
        |pnb_toks AS (
        |  SELECT doc_id, CASE WHEN norm = '' THEN []::VARCHAR[]
        |       ELSE regexp_split_to_array(norm, '\\s+') END AS toks
        |  FROM pnb_norm),
        |pnb_feats AS (
        |  SELECT doc_id, t FROM
        |    (SELECT doc_id, unnest(toks) AS t FROM pnb_toks) WHERE t <> ''
        |  UNION ALL
        |  SELECT doc_id, g AS t FROM (
        |    SELECT doc_id,
        |      unnest([array_to_string(toks[i:i+1], ' ') FOR i IN range(1, len(toks))]) AS g
        |    FROM pnb_toks WHERE len(toks) >= 2)),
        |pnb_fb AS (
        |  SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT % 1024 AS b FROM pnb_feats),
        |pnb_agg AS MATERIALIZED (
        |  SELECT doc_id, count(*) AS n_feats,
        |    sum(coalesce(w.w_micro, 0))::BIGINT AS w_sum_micro
        |  FROM pnb_fb LEFT JOIN w USING (b) GROUP BY doc_id),
        |pclean AS MATERIALIZED (
        |  SELECT c.doc_id, c.text FROM pclean3 c JOIN pnb_agg a USING (doc_id)
        |  WHERE a.n_feats > 0 AND round(a.w_sum_micro::DOUBLE / a.n_feats / 1e6, 6) >= 0.0)""".stripMargin

  /** [[portableLshSql]] minus the self-pair tail: per-doc shingle md5
    * rows (`shr`), shingle-set sizes (`sizes`) and banded MinHash rows
    * (`bands`) over `src` — the reusable signature artifacts. Cross-
    * corpus callers (the incremental pipeline) instantiate this twice
    * with different prefixes and join bands across prefixes.
    */
  private def portableSigSql(src: String, p: String = ""): String =
    s"""${p}norm AS (
      |  SELECT doc_id,
      |    trim(regexp_replace(regexp_replace(lower(text), '[^\\p{L}\\p{N}\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS norm
      |  FROM $src),
      |${p}tok AS (
      |  SELECT doc_id, CASE WHEN norm = '' THEN []::VARCHAR[]
      |       ELSE regexp_split_to_array(norm, '\\s+') END AS toks FROM ${p}norm),
      |${p}sh_of AS (
      |  SELECT doc_id, list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
      |       ELSE [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)] END) AS sh
      |  FROM ${p}tok),
      |${p}shr AS (SELECT doc_id, md5(g0) AS g FROM (SELECT doc_id, unnest(sh) AS g0 FROM ${p}sh_of)),
      |${p}xs AS (SELECT doc_id, ('0x' || substr(g, 1, 15))::BIGINT % 2147483647 AS x FROM ${p}shr),
      |${p}mins AS (
      |  SELECT doc_id, i, min((a * x + b) % 2147483647) AS m
      |  FROM ${p}xs CROSS JOIN (VALUES $portableSeedRows) seeds(i, a, b)
      |  GROUP BY 1, 2),
      |${p}bands AS (
      |  SELECT doc_id, i // 4 AS band,
      |         md5(string_agg(m::VARCHAR, '|' ORDER BY i)) AS band_hash
      |  FROM ${p}mins GROUP BY doc_id, i // 4),
      |${p}sizes AS (SELECT doc_id, count(*) AS n FROM ${p}shr GROUP BY 1)""".stripMargin

  /** The full portable MinHash-LSH self-pair chain: signature artifacts
    * plus in-corpus candidates (`cand`) and intersections (`ix`).
    */
  private def portableLshSql(src: String, p: String = ""): String =
    portableSigSql(src, p) + s""",
      |${p}cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM ${p}bands a JOIN ${p}bands b ON a.band = b.band AND a.band_hash = b.band_hash
      |  WHERE a.doc_id < b.doc_id),
      |${p}ix AS (
      |  SELECT c.doc_a, c.doc_b, count(*) AS inter
      |  FROM ${p}cand c JOIN ${p}shr x ON x.doc_id = c.doc_a
      |  JOIN ${p}shr y ON y.doc_id = c.doc_b AND y.g = x.g
      |  GROUP BY 1, 2)""".stripMargin

  /** DuckDB expression for the hyperplane-LSH bucket of `vExpr` (a
    * DOUBLE[] column): bit i set iff v·r_i > 0, with the SAME seeded
    * planes as [[Similarity.hyperplanes]] interpolated as full-precision
    * literals (Double.toString round-trips, so both engines see identical
    * doubles and the sequential dot — hence the sign — is bit-identical).
    */
  private def lshBucketSql(vExpr: String, dim: Int, planes: Int, seed: Long): String =
    Similarity.hyperplanes(dim, planes, seed).zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN list_dot_product($vExpr, ${p.mkString("[", ", ", "]")}) > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")

  /** Bradley–Terry MM rounds unrolled as CTEs — replays
    * [[operators.Preference.bradleyTerry]] exactly: integer micro
    * strengths, round-half-up `//` divisions (non-negative, so floor ≡
    * truncate ≡ Spark's `div`), ≥1-micro clamps, per-round
    * normalization by the scalar total.
    */
  private def btChainSql(rounds: Int): String = {
    val head =
      """cmp AS (
        |  SELECT x.l_suppkey AS item_a, y.l_suppkey AS item_b,
        |    (x.l_extendedprice >= y.l_extendedprice) AS win_a
        |  FROM lineitem x JOIN lineitem y ON x.l_orderkey = y.l_orderkey
        |  WHERE x.l_suppkey < y.l_suppkey),
        |btpairs AS (
        |  SELECT item_a, item_b, count(*)::BIGINT AS n_games,
        |    sum(CASE WHEN win_a THEN 1 ELSE 0 END)::BIGINT AS wins_a
        |  FROM cmp GROUP BY 1, 2),
        |btitems AS (
        |  SELECT item, sum(w)::BIGINT AS wins, sum(n)::BIGINT AS games FROM (
        |    SELECT item_a AS item, wins_a AS w, n_games AS n FROM btpairs
        |    UNION ALL
        |    SELECT item_b, n_games - wins_a, n_games FROM btpairs) u GROUP BY 1),
        |btp0 AS (SELECT item, 1000000::BIGINT AS p_micro FROM btitems)""".stripMargin
    val roundCtes = (1 to rounds).map { r =>
      s"""btt$r AS MATERIALIZED (
         |  SELECT item, sum(term)::BIGINT AS s_micro FROM (
         |    SELECT pr.item_a AS item,
         |      (2 * (pr.n_games * 1000000000000) + (pa.p_micro + pb.p_micro))
         |        // (2 * (pa.p_micro + pb.p_micro)) AS term
         |    FROM btpairs pr
         |    JOIN btp${r - 1} pa ON pr.item_a = pa.item
         |    JOIN btp${r - 1} pb ON pr.item_b = pb.item
         |    UNION ALL
         |    SELECT pr.item_b,
         |      (2 * (pr.n_games * 1000000000000) + (pa.p_micro + pb.p_micro))
         |        // (2 * (pa.p_micro + pb.p_micro))
         |    FROM btpairs pr
         |    JOIN btp${r - 1} pa ON pr.item_a = pa.item
         |    JOIN btp${r - 1} pb ON pr.item_b = pb.item) u GROUP BY 1),
         |btraw$r AS (
         |  SELECT i.item,
         |    greatest(1, (2 * (i.wins * 1000000000000) + t.s_micro)
         |      // (2 * t.s_micro)) AS raw_micro
         |  FROM btitems i JOIN btt$r t ON i.item = t.item),
         |btp$r AS MATERIALIZED (
         |  SELECT item, greatest(1, (2 * (raw_micro * 1000000) + tot)
         |    // (2 * tot)) AS p_micro
         |  FROM btraw$r, (SELECT sum(raw_micro)::BIGINT AS tot FROM btraw$r) z)""".stripMargin
    }
    (head +: roundCtes).mkString(",\n")
  }

  /** Shared CTE chain replaying [[operators.Bleu]]: normalization +
    * every-7th-token candidate drop, per-n gram censuses with the
    * len ≥ n guard, clipped-match join, and the per-pair integer frame
    * `bper` (the BLEU double chain itself lives in the two selects).
    */
  private val bleuChainSql: String = {
    def sideCensus(name: String, toks: String, len: String): String = {
      val perN = (1 to 4).map { n =>
        s"""SELECT pair_id, $n AS n,
           |  unnest([array_to_string($toks[i:i + ${n - 1}], ' ')
           |          FOR i IN range(1, len($toks) - ${n - 1} + 1)]) AS gram
           |FROM blen WHERE $len >= $n""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""$name AS (
         |  SELECT pair_id, n, gram, count(*)::BIGINT AS cnt FROM (
         |$perN) u GROUP BY 1, 2, 3)""".stripMargin
    }
    val mt = (1 to 4).map(n =>
      s"""coalesce(max(CASE WHEN m.n = $n THEN m.m END), 0)::BIGINT AS m$n,
         |    greatest(0, l.c_len - $n + 1)::BIGINT AS t$n""".stripMargin)
      .mkString(",\n    ")
    s"""bnorm AS (
       |  SELECT doc_id AS pair_id,
       |    trim(regexp_replace(regexp_replace(lower(text), '[^\\p{L}\\p{N}\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS r_norm
       |  FROM documents),
       |btok AS (
       |  SELECT pair_id, CASE WHEN r_norm = '' THEN []::VARCHAR[]
       |    ELSE regexp_split_to_array(r_norm, ' ') END AS r_toks
       |  FROM bnorm),
       |bcand AS (
       |  SELECT pair_id, r_toks,
       |    [r_toks[i] FOR i IN range(1, len(r_toks) + 1) IF i % 7 != 0] AS c_toks
       |  FROM btok),
       |blen AS (
       |  SELECT pair_id, c_toks, r_toks,
       |    len(c_toks) AS c_len, len(r_toks) AS r_len FROM bcand),
       |${sideCensus("bcg", "c_toks", "c_len")},
       |${sideCensus("brg", "r_toks", "r_len")},
       |bm AS (
       |  SELECT pair_id, n, sum(least(c.cnt, r.cnt))::BIGINT AS m
       |  FROM bcg c JOIN brg r USING (pair_id, n, gram) GROUP BY 1, 2),
       |bper AS (
       |  SELECT l.pair_id, l.c_len::BIGINT AS c_len, l.r_len::BIGINT AS r_len,
       |    $mt
       |  FROM blen l LEFT JOIN bm m ON l.pair_id = m.pair_id
       |  GROUP BY l.pair_id, l.c_len, l.r_len)""".stripMargin
  }

  /** chrF replay: candidate = every-7th-token drop, both sides reduced
    * to space-free char streams, per-order char-gram censuses with the
    * len ≥ n guard, clipped-match join, per-pair integer frame `cper`
    * and the F_β chain (fixed n-ascending adds, round once). The census
    * key is the SAME md5-prefix60 digest the operator shuffles (so a
    * 60-bit collision merges identically in both engines).
    */
  private val chrfChainSql: String = {
    def sideCensus(name: String, txt: String): String = {
      val perN = (1 to 6).map { n =>
        s"""SELECT pair_id, $n AS n,
           |  unnest([substr($txt, i, $n) FOR i IN range(1, length($txt) - $n + 2)]) AS gram
           |FROM cbase WHERE length($txt) >= $n""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""$name AS (
         |  SELECT pair_id, n, ('0x' || substr(md5(gram), 1, 15))::BIGINT AS g,
         |    count(*)::BIGINT AS cnt FROM (
         |$perN) u GROUP BY 1, 2, 3)""".stripMargin
    }
    val mtr = (1 to 6).map(n =>
      s"""coalesce(max(CASE WHEN cm.n = $n THEN cm.m END), 0)::BIGINT AS m$n,
         |    greatest(0, length(b.c_txt) - $n + 1)::BIGINT AS t$n,
         |    greatest(0, length(b.r_txt) - $n + 1)::BIGINT AS rt$n""".stripMargin)
      .mkString(",\n    ")
    s"""cnorm AS (
       |  SELECT doc_id AS pair_id,
       |    trim(regexp_replace(regexp_replace(lower(text), '[^\\p{L}\\p{N}\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS r_norm
       |  FROM documents),
       |ctok AS (
       |  SELECT pair_id, CASE WHEN r_norm = '' THEN []::VARCHAR[]
       |    ELSE regexp_split_to_array(r_norm, ' ') END AS r_toks
       |  FROM cnorm),
       |cbase AS (
       |  SELECT pair_id,
       |    array_to_string([r_toks[i] FOR i IN range(1, len(r_toks) + 1) IF i % 7 != 0], '') AS c_txt,
       |    array_to_string(r_toks, '') AS r_txt
       |  FROM ctok),
       |${sideCensus("ccg", "c_txt")},
       |${sideCensus("crg", "r_txt")},
       |cm AS (
       |  SELECT pair_id, n, sum(least(c.cnt, r.cnt))::BIGINT AS m
       |  FROM ccg c JOIN crg r USING (pair_id, n, g) GROUP BY 1, 2),
       |cper AS (
       |  SELECT b.pair_id, length(b.c_txt)::BIGINT AS c_chars,
       |    length(b.r_txt)::BIGINT AS r_chars,
       |    $mtr
       |  FROM cbase b LEFT JOIN cm ON b.pair_id = cm.pair_id
       |  GROUP BY b.pair_id, b.c_txt, b.r_txt)""".stripMargin
  }

  /** Multi-class hashed-NB (doc, class) score replay — the shared
    * chain of `t_langid_nb` and `v_label_noise`: hashed features, class
    * censuses, micro weights/floors/priors via the identical
    * round(log10(·)·1e6) ops, exact integer per-(doc, class) totals.
    * Ends at `alls(doc_id, cls, total, nf)`.
    */
  private def langNbScoresSql: String =
    s"""$hashedFeatureSql,
      |cls AS (
      |  SELECT coalesce(lang, 'und') AS cls, count(*)::BIGINT AS nd
      |  FROM documents GROUP BY 1),
      |ctot AS (
      |  SELECT (SELECT count(*) FROM documents)::BIGINT AS nn,
      |         (SELECT count(*) FROM cls)::BIGINT AS nl),
      |lcen AS (
      |  SELECT coalesce(lang, 'und') AS cls, b, count(*)::BIGINT AS c
      |  FROM fb GROUP BY 1, 2),
      |ltot AS (SELECT cls, sum(c)::BIGINT AS ct FROM lcen GROUP BY 1),
      |lw AS (
      |  SELECT cls, b,
      |    CAST(round(log10((c + 1.0) / (ct + 1024.0)) * 1e6) AS BIGINT) AS w
      |  FROM lcen JOIN ltot USING (cls)),
      |ldef AS (
      |  SELECT cls, CAST(round(log10(1.0 / (ct + 1024.0)) * 1e6) AS BIGINT) AS d
      |  FROM ltot),
      |lpr AS (
      |  SELECT cls.cls,
      |    CAST(round(log10((nd + 1.0) / (nn + nl)) * 1e6) AS BIGINT) AS p
      |  FROM cls CROSS JOIN ctot),
      |dsc AS (
      |  SELECT f.doc_id, l.cls,
      |    sum(coalesce(w.w, dd.d, 0))::BIGINT AS fsum, count(*)::BIGINT AS nf
      |  FROM fb f CROSS JOIN cls l
      |  LEFT JOIN lw w ON w.cls = l.cls AND w.b = f.b
      |  LEFT JOIN ldef dd ON dd.cls = l.cls
      |  GROUP BY 1, 2),
      |alls AS MATERIALIZED (
      |  SELECT d.doc_id, c.cls,
      |    (coalesce(s.fsum, 0) + p.p)::BIGINT AS total, coalesce(s.nf, 0) AS nf
      |  FROM documents d CROSS JOIN cls c
      |  JOIN lpr p ON p.cls = c.cls
      |  LEFT JOIN dsc s ON s.doc_id = d.doc_id AND s.cls = c.cls)""".stripMargin

  /** Standard-normal CDF replay — the EXACT chain of
    * `Hypothesis.normCdf` (Abramowitz–Stegun 7.1.26 erf polynomial,
    * literal-for-literal including the √2 double constant), so z → p
    * maps are hash-identical across engines.
    */
  private def normCdfSql(z: String): String = {
    val x = s"(abs($z) / 1.4142135623730951)"
    val t = s"(1.0 / (1.0 + 0.3275911 * $x))"
    val poly = s"($t * (0.254829592 + $t * (-0.284496736 + $t * " +
      s"(1.421413741 + $t * (-1.453152027 + $t * 1.061405429)))))"
    val erf = s"(1.0 - $poly * exp(-($x * $x)))"
    s"(CASE WHEN ($z) >= 0 THEN 0.5 * (1.0 + $erf) " +
      s"ELSE 0.5 * (1.0 - $erf) END)"
  }

  /** The chrF F_β=2 chain over the cper integer columns. */
  private val chrfSelectSql: String = {
    def sumK(m: Int => String, t: Int => String): (String, String) = (
      (1 to 6).map(n =>
        s"(CASE WHEN ${t(n)} > 0 THEN ${m(n)}::DOUBLE / ${t(n)}::DOUBLE ELSE 0.0 END)")
        .mkString(" + "),
      (1 to 6).map(n => s"(CASE WHEN ${t(n)} > 0 THEN 1 ELSE 0 END)").mkString(" + "))
    val (ps, pk) = sumK(n => s"m$n", n => s"t$n")
    val (rs, rk) = sumK(n => s"m$n", n => s"rt$n")
    s"""CASE WHEN ($pk) = 0 OR ($rk) = 0 THEN 0.0::DOUBLE
       |WHEN (($ps) / ($pk)::DOUBLE + ($rs) / ($rk)::DOUBLE) = 0.0 THEN 0.0::DOUBLE
       |ELSE round(5.0 * (($ps) / ($pk)::DOUBLE) * (($rs) / ($rk)::DOUBLE)
       |  / (4.0 * (($ps) / ($pk)::DOUBLE) + (($rs) / ($rk)::DOUBLE)), 6)
       |END AS chrf""".stripMargin
  }

  /** The BLEU double chain over integer columns (DuckDB spelling). */
  private def bleuSelectSql(prefix: String = ""): String =
    s"""CASE WHEN ${prefix}c_len = 0 OR least(m1, m2, m3, m4) = 0 THEN 0.0::DOUBLE
       |ELSE round((CASE WHEN ${prefix}c_len >= ${prefix}r_len THEN 1.0
       |    ELSE exp(1.0 - ${prefix}r_len::DOUBLE / ${prefix}c_len::DOUBLE) END)
       |  * exp((ln(m1::DOUBLE / t1::DOUBLE) + ln(m2::DOUBLE / t2::DOUBLE)
       |       + ln(m3::DOUBLE / t3::DOUBLE) + ln(m4::DOUBLE / t4::DOUBLE)) / 4), 6)
       |END AS bleu""".stripMargin

  val queries: Map[String, Q] = Map(
    // BLEU generation eval: candidate = the doc with every 7th token
    // dropped, reference = the doc — per-pair clipped-match censuses
    // and the one rounded double chain, fully replayed by the oracle.
    "x_bleu" -> ((s, dir) => {
      val toks = split(operators.TextAnalysis.normalized(col("text")), " ")
      operators.Bleu.sentenceBleu(Tables.fanOut(Tables.documents(s, dir)).select(
        col("doc_id").as("pair_id"),
        array_join(filter(toks, (_, i) => (i + 1) % 7 =!= 0), " ").as("candidate"),
        col("text").as("reference")))
    }),

    // Corpus BLEU: matches/totals summed over pairs BEFORE the chain —
    // the standard corpus statistic. One row.
    "x_bleu_corpus" -> ((s, dir) => {
      val toks = split(operators.TextAnalysis.normalized(col("text")), " ")
      operators.Bleu.corpusBleu(Tables.fanOut(Tables.documents(s, dir)).select(
        col("doc_id").as("pair_id"),
        array_join(filter(toks, (_, i) => (i + 1) % 7 =!= 0), " ").as("candidate"),
        col("text").as("reference")))
    }),

    // chrF character F-score on the same engineered pairs — the
    // recall-weighted companion metric; oracle replays the char-gram
    // censuses and the F_2 chain.
    "x_chrf" -> ((s, dir) => {
      val toks = split(operators.TextAnalysis.normalized(col("text")), " ")
      operators.ChrF.chrF(Tables.fanOut(Tables.documents(s, dir)).select(
        col("doc_id").as("pair_id"),
        array_join(filter(toks, (_, i) => (i + 1) % 7 =!= 0), " ").as("candidate"),
        col("text").as("reference")))
    }),

    // Production-scheme twin (the d_minhash_neardup_fast pattern): the
    // same pairs under xxhash64 gram keys — no md5 block per gram
    // instance, so the bench sees the path a deployment would run.
    // Engine-specific digests → rows-only by design; ChrFSpec pins that
    // both schemes produce identical SCORES on the fixture.
    "x_chrf_fast" -> ((s, dir) => {
      val toks = split(operators.TextAnalysis.normalized(col("text")), " ")
      operators.ChrF.chrF(Tables.fanOut(Tables.documents(s, dir)).select(
          col("doc_id").as("pair_id"),
          array_join(filter(toks, (_, i) => (i + 1) % 7 =!= 0), " ").as("candidate"),
          col("text").as("reference")),
        scheme = operators.HashScheme.Fast)
    }),

    // ROUGE-L LCS F-measure on engineered pairs: candidate = every-7th
    // -token drop THEN adjacent-pair swap — the swap breaks the pure-
    // subsequence degeneracy (a drop-only candidate has lcs == c_len by
    // construction, which would never exercise the DP's max branches).
    // Oracle replays the row-wise prefix-max DP as a recursive CTE.
    "x_rouge_l" -> ((s, dir) => {
      val norm = operators.TextAnalysis.normalized(col("text"))
      val toks = when(norm === "", array().cast("array<string>"))
        .otherwise(split(norm, " "))
      val swapped = transform(col("kept"), (_, i0) => {
        val i = i0 + 1 // 1-based, matching the oracle's list indexing
        element_at(col("kept"),
          when(i % 2 === 1 && i < size(col("kept")), i + 1)
            .when(i % 2 === 0, i - 1)
            .otherwise(i))
      })
      operators.Rouge.rougeL(
        Tables.fanOut(Tables.documents(s, dir))
          .select(col("doc_id").as("pair_id"),
            filter(toks, (_, i) => (i + 1) % 7 =!= 0).as("kept"),
            col("text").as("reference"))
          .select(col("pair_id"), array_join(swapped, " ").as("candidate"),
            col("reference")))
    }),

    // Bradley–Terry preference strengths on supplier head-to-heads
    // synthesized from lineitem (two suppliers in one order compare on
    // price). 5 MM rounds, all integer-micro — the oracle unrolls every
    // round as CTEs and matches bit-for-bit.
    "x_bradley_terry" -> ((s, dir) => {
      val pairs = operators.Preference.pairCensus(
        operators.Preference.supplierComparisons(Tables.lineitem(s, dir)))
      operators.Preference.bradleyTerry(pairs, rounds = 5)
    }),

    // Elo over a subsampled, league-partitioned game log (every-50th
    // order, league = order parity, arrival order = the total
    // (ok, ln, ln, pk, pk, sk, sk) key): the ONLINE preference twin of
    // x_bradley_terry. The oracle replays every zero-sum update as a
    // per-league recursive CTE over parallel (items, ratings) lists.
    "x_elo" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).where(col("l_orderkey") % 50 === 0)
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
          col("l_linenumber").as("ln"), col("l_partkey").as("pk"),
          col("l_extendedprice").as("price"))
      val g0 = li.as("x").join(li.as("y"),
          col("x.ok") === col("y.ok") && col("x.sk") < col("y.sk"))
        .select((col("x.ok") % 2).as("league"),
          when(col("x.price") >= col("y.price"), col("x.sk"))
            .otherwise(col("y.sk")).as("winner"),
          when(col("x.price") >= col("y.price"), col("y.sk"))
            .otherwise(col("x.sk")).as("loser"),
          col("x.ok").as("ok"), col("x.ln").as("xln"), col("y.ln").as("yln"),
          col("x.pk").as("xpk"), col("y.pk").as("ypk"),
          col("x.sk").as("xsk"), col("y.sk").as("ysk"))
      val seqW = org.apache.spark.sql.expressions.Window.partitionBy("league")
        .orderBy("ok", "xln", "yln", "xpk", "ypk", "xsk", "ysk")
      operators.Preference.eloRatings(
        g0.withColumn("seq", row_number().over(seqW))
          .select("league", "seq", "winner", "loser"))
    }),

    // Grouped top-k through the custom planner stack (logical node +
    // partial/final heap execs, plans/GroupedTopK.scala): per-language
    // k longest documents. The (n_chars desc, doc_id asc) order is
    // total, so the oracle's row_number window replays it exactly.
    "x_grouped_topk" -> ((s, dir) =>
      operators.TopK.groupedTopK(
        Tables.documents(s, dir).select("doc_id", "lang", "source", "n_chars"),
        Seq("lang"), Seq(("n_chars", false), ("doc_id", true)), 5)),

    // Same operator at high group cardinality (supplier grain on
    // lineitem) — the regime where the map-side partial pass k-bounds
    // the shuffle per (group × partition).
    "x_grouped_topk_hi" -> ((s, dir) =>
      operators.TopK.groupedTopK(
        Tables.lineitem(s, dir)
          .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice"),
        Seq("l_suppkey"),
        Seq(("l_extendedprice", false), ("l_orderkey", true), ("l_linenumber", true)), 3)),

    // The REWRITE path: this gate deliberately writes the declarative
    // row_number-filter window spelling; InferGroupedTopK (injected via
    // GraftExtensions) turns it into the heap operator with the rank
    // preserved, so the driver exercises rewrite + rank emission
    // end-to-end against the window-replay oracle.
    "x_topk_rewrite" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("n_chars").desc, col("doc_id").asc)
      Tables.documents(s, dir).select("doc_id", "source", "n_chars")
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 4)
    }),

    // The rank() <= k spelling (ties KEPT — a group may emit more than
    // k rows): InferGroupedTopK maps it to the node's ties mode, whose
    // exec retains tie-classes and evicts a class only once ≥ k
    // strictly-better rows are held. The n_chars-only order is
    // deliberately non-total so boundary ties actually occur; survivor
    // set + rank values are still deterministic (set semantics), which
    // is what the window-replay oracle checks.
    "x_topk_rank" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("n_chars").desc)
      Tables.documents(s, dir).select("doc_id", "source", "n_chars")
        .withColumn("rank", rank().over(w))
        .filter(col("rank") <= 4)
    }),

    // Text analysis: token/char/BPE-ish subtoken counts (oracle).
    "t_token_stats" -> ((s, dir) =>
      TextAnalysis.tokenStats(Tables.documents(s, dir))
        .select("doc_id", "n_tokens", "n_chars", "n_subtokens")),

    // Quality scoring: ratios rounded 6dp (oracle).
    "t_quality" -> ((s, dir) =>
      TextAnalysis.qualityScore(Tables.fanOut(Tables.documents(s, dir)))),

    // Language-ID heuristic: marker-count argmax (oracle — same heuristic
    // expressed in SQL; the synthetic corpus shares one vocabulary so the
    // score, not label recovery, is what's checked).
    "t_langid" -> ((s, dir) =>
      TextAnalysis.languageId(Tables.fanOut(Tables.documents(s, dir)))),

    // TRAINED language ID (fastText-style): multi-class hashed-NB fit on
    // the corpus's own lang labels, served as one stateless projection
    // (per-class dense weight arrays, integer micro sums, struct-min
    // argmax). The oracle retrains from the same censuses and replays
    // every per-doc class score and the (score desc, lang asc) argmax.
    // Term burstiness: variance-to-mean dispersion of per-doc counts —
    // content words clump, glue spreads, templates repeat in lockstep.
    "t_burstiness" -> ((s, dir) =>
      operators.TermStats.burstiness(Tables.documents(s, dir),
        minTf = 10L)),

    // Good-Turing adjusted counts from the freq-of-freq census, with
    // the r=0 unseen-mass row and honest nulls at census holes.
    "t_good_turing" -> ((s, dir) =>
      operators.TermStats.goodTuring(Tables.documents(s, dir))),

    // Trending terms: top-20 long tokens of the even-doc period vs the
    // odd-doc period — arrivals, departures, and rank moves.
    "t_trending" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(split(TextAnalysis.normalized(col("text")), " "))
            .as("w"))
        .where(length(col("w")) >= 4)
      operators.Trending.topChanges(toks, col("w"),
        col("doc_id") % 2 === 1, k = 20)
    }),

    // Segment-grain language mixing: classify 8-token windows with the
    // trained langid, roll up per doc — the code-switch / boilerplate-
    // concatenation detector a whole-doc langid averages away.
    "t_code_switch" -> ((s, dir) => {
      val d = Tables.fanOut(Tables.documents(s, dir))
      operators.Classifier.codeSwitching(d,
        operators.Classifier.trainLanguageNB(d, buckets = 1024),
        segTokens = 8)
    }),

    "t_langid_nb" -> ((s, dir) => {
      val docs = Tables.fanOut(Tables.documents(s, dir))
      operators.Classifier.classifyLanguage(docs,
        operators.Classifier.trainLanguageNB(docs, buckets = 1024))
    }),

    // Mondrian k-anonymity GENERALIZATION (vs v_kanon's audit and
    // enforceKAnonymity's suppression): numeric QI census → greedy
    // widest-dim median splits while both halves keep >= k; rows report
    // their final partition's per-dim ranges. The oracle replays every
    // split decision as a recursive CTE over member lists.
    "v_mondrian" -> ((s, dir) => {
      val qi = Tables.documents(s, dir).select(
        expr("n_chars div 25").as("q_len"), (col("doc_id") % 20).as("q_grp"))
      operators.Privacy.mondrian(qi, Seq("q_len", "q_grp"), k = 25)
    }),

    // Confident-learning label noise on the langid scores: per-class
    // mean-score thresholds as exact (sum, count) pairs, membership by
    // integer cross-multiply, confident argmax vs the lang label. The
    // oracle replays the whole chain from the shared NB score frame.
    "v_label_noise" -> ((s, dir) => {
      val docs = Tables.fanOut(Tables.documents(s, dir))
      val model = operators.Classifier.trainLanguageNB(docs, buckets = 1024)
      operators.Classifier.labelNoise(
        operators.Classifier.classScores(docs, model),
        docs.select(col("doc_id"),
          coalesce(col("lang"), lit("und")).as("label")))
    }),

    // Repetition quality signal: duplicate 2-/3-gram fractions (oracle —
    // same construction over DuckDB list comprehensions).
    "t_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionScore(Tables.fanOut(Tables.documents(s, dir)))),

    // PII redaction: engineered PII appended to every doc (both engines),
    // then the shared-RE2-subset patterns must scrub identically.
    "t_redact" -> ((s, dir) =>
      Tables.fanOut(Tables.documents(s, dir)).select(col("doc_id"),
        TextAnalysis.redactPii(concat(col("text"),
          lit(" contact jane.doe+spam@mail.example.org or 10.0.255.7 " +
            "or +1 555-867-5309 now"))).as("redacted"))),

    // Content fingerprint: md5 of normalized text (oracle — md5 is
    // engine-portable, unlike rolling hashes).
    "t_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprints(Tables.documents(s, dir))),

    // Markup stripping: engineered HTML (tags, script/style bodies,
    // comments, entities) wrapped around every doc in BOTH engines; the
    // RE2-subset pattern chain must recover the text identically.
    "t_strip_markup" -> ((s, dir) =>
      Tables.fanOut(Tables.documents(s, dir)).select(col("doc_id"),
        TextAnalysis.stripMarkup(concat(
          lit("<html><head><style>p{x}</style></head><body onload=\"f()\"><p>"),
          col("text"),
          lit("</p><script type=\"text/javascript\">var a=1;</script>" +
            "<!-- c --> A &amp; B &lt;ok&gt;</body></html>")))
          .as("clean"))),

    // Unigram LM score (perplexity proxy): micro-log10 integer sums —
    // exact arithmetic after the one libm round, so the oracle
    // hash-matches sums AND the derived average.
    "t_unigram_logprob" -> ((s, dir) =>
      TextAnalysis.unigramLogProb(Tables.documents(s, dir))),

    // Kneser-Ney bigram LM (D=0.75): absolute discounting with the
    // continuation-probability lower order — KenLM's actual smoothing;
    // oracle replays all four censuses and the fixed float chain.
    "t_bigram_kn" -> ((s, dir) =>
      TextAnalysis.bigramLogProbKN(Tables.documents(s, dir), discount = 0.75)),

    // KN trigram: the full two-level continuation-count backoff; every
    // census and the fixed-order float chain replayed in SQL
    "t_trigram_kn" -> ((s, dir) =>
      TextAnalysis.trigramLogProbKN(Tables.documents(s, dir), discount = 0.75)),

    // Interpolated bigram LM (Jelinek-Mercer λ=0.7): first token scores
    // unigram, transitions score λ·P_ml(w|prev) + (1−λ)·P_uni(w) —
    // micro-log10 integer sums, the oracle replays censuses and
    // interpolation with the same float constants.
    "t_bigram_logprob" -> ((s, dir) =>
      TextAnalysis.bigramLogProb(Tables.documents(s, dir), lambda = 0.7)),

    // TF-IDF top-5 salient terms per doc: scores rounded 6dp before
    // ranking so the cross-engine order is exact (oracle).
    "t_tfidf_topk" -> ((s, dir) =>
      Salience.tfidfTopK(Tables.documents(s, dir), k = 5)),

    // Corpus-wide top-50 tokens by frequency (oracle).
    "t_heavy_hitters" -> ((s, dir) =>
      Salience.heavyHitters(Tables.documents(s, dir), k = 50)),

    // BM25 top-10 retrieval: queries = first 8 normalized tokens of every
    // 97th document against the whole corpus — inverted-index join;
    // per-(query,doc,term) contributions micro-fixed before the exact
    // integer sum (oracle replays the whole chain). Cap OFF here: the
    // synthetic corpus has a ~55-word vocabulary where EVERY term is
    // ubiquitous, so any df cap empties the output — the capped twin
    // below exercises the cap where it binds partially.
    "r_bm25_topk" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val q = d.where(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("query_id"),
          array_join(slice(TextAnalysis.tokens(
            TextAnalysis.normalized(col("text"))), 1, 8), " ").as("text"))
      operators.Retrieval.bm25TopK(d, q, k = 10, maxDfFrac = 1.0)
    }),

    // Vector-space-model retrieval: tf-idf cosine with micro-quantized
    // weights (exact integer dots and norms), the third lexical scorer
    // next to BM25 and phrase search. Full oracle replay.
    "r_vsm_topk" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val q = d.where(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("query_id"),
          array_join(slice(TextAnalysis.tokens(
            TextAnalysis.normalized(col("text"))), 1, 8), " ").as("text"))
      operators.Retrieval.vsmTopK(d, q, k = 10, maxDfFrac = 1.0)
    }),

    // nDCG@10 over the VSM ranking against formula judgments (rel 3 =
    // the query's own source doc, rel 1 = same doc_id decade) — the
    // oracle replays the whole VSM chain AND the DCG/IDCG arithmetic.
    "r_ndcg" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val q = d.where(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("query_id"),
          array_join(slice(TextAnalysis.tokens(
            TextAnalysis.normalized(col("text"))), 1, 8), " ").as("text"))
      val ranked = operators.Retrieval.vsmTopK(d, q, k = 10, maxDfFrac = 1.0)
        .select("query_id", "doc_id", "rank")
      val judg = d.select(col("doc_id")).alias("dd")
        .join(d.where(col("doc_id") % 97 === 0)
          .select(col("doc_id").as("query_id")).alias("qq"),
          col("dd.doc_id") % 10 === col("query_id") % 10)
        .select(col("query_id"), col("dd.doc_id").as("doc_id"))
        .withColumn("rel",
          when(col("doc_id") === col("query_id"), 3L).otherwise(1L))
      operators.Retrieval.ndcgAt(ranked, judg, k = 10)
    }),

    // Hybrid retrieval: BM25 lexical top-10 fused with embedding cosine
    // top-10 (vec_id ≡ doc_id in the synthetic tables) by reciprocal-rank
    // fusion — each reciprocal micro-fixed before the exact integer sum,
    // so fusing any number of systems is association-order-free (oracle
    // replays both rankings and the fusion).
    "r_rrf_hybrid" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val q = d.where(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("query_id"),
          array_join(slice(TextAnalysis.tokens(
            TextAnalysis.normalized(col("text"))), 1, 8), " ").as("text"))
      val lexical = operators.Retrieval.bm25TopK(d, q, k = 10, maxDfFrac = 1.0)
        .select("query_id", "doc_id", "rank")
      val emb = Tables.embeddings(s, dir)
      val semantic = Similarity
        .bruteForceTopK(emb, emb.where(col("vec_id") % 97 === 0), k = 10)
        .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
      operators.Retrieval.rrfFuse(Seq(lexical, semantic), topK = 10)
    }),

    // Same retrieval with the stop-term cap BINDING (df ≤ 0.78·N keeps
    // only the rarer fifth of this corpus's vocabulary): proves the cap
    // changes scores/ranks and the oracle still replays them.
    "r_bm25_capped" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val q = d.where(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("query_id"),
          array_join(slice(TextAnalysis.tokens(
            TextAnalysis.normalized(col("text"))), 1, 8), " ").as("text"))
      operators.Retrieval.bm25TopK(d, q, k = 10, maxDfFrac = 0.78)
    }),

    // Deterministic md5-keyed train/val/test assignment: same doc →
    // same split on any engine, run, or partitioning (oracle — the
    // thresholds are shared hex literals).
    "s_hash_split" -> ((s, dir) =>
      HashSplit.assignSplits(
          Tables.documents(s, dir).select("doc_id"), col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select("doc_id", "split")),

    // Leakage-safe splitting at GROUP grain: the whole source lands in
    // one split, so near-copies within a source can never straddle
    // train/test (oracle replays the group-key threshold ladder).
    "s_group_splits" -> ((s, dir) =>
      HashSplit.groupSafeSplits(
          Tables.documents(s, dir).select("doc_id", "source"),
          col("source"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select("doc_id", "source", "split")),

    // Purged temporal split: cut = exact 70th-percentile timestamp
    // (k-th order statistic, k = n*7 div 10), 6-hour embargo gap
    // excluded from both sides — the walk-forward leakage guard. The
    // oracle finds the same cut by ORDER BY/OFFSET and replays the
    // three-way CASE.
    "s_temporal_split" -> ((s, dir) =>
      HashSplit.temporalSplit(Tables.events(s, dir), col("ts"),
          trainNum = 7L, trainDen = 10L, embargoMicros = 21600000000L)
        .select("event_id", "split")),

    // Exact-count stratified split: per-language md5-rank ranges make
    // split sizes exact to the row (vs hash-split binomial jitter).
    "s_exact_split" -> ((s, dir) =>
      HashSplit.exactStratifiedSplits(
        Tables.documents(s, dir), col("doc_id"), col("lang"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))),

    // Domain rebalancing: per-language deterministic sampling rates
    // (downsample en, keep zh, default 0.6) — a scan, no shuffle (oracle).
    "s_stratified_hash" -> ((s, dir) =>
      HashSplit.sampleByStratum(
          Tables.documents(s, dir).select("doc_id", "lang"),
          col("doc_id"), col("lang"),
          Map("en" -> 0.3, "zh" -> 1.0), defaultFraction = 0.6)),

    // Efraimidis–Spirakis weighted sample without replacement, exact
    // integer ladder: key = max of w 60-bit md5 uniforms, top-100 by
    // key — weight grows with document length (oracle replays every
    // draw).
    "s_weighted_sample" -> ((s, dir) =>
      operators.WeightedSample.weightedTopK(Tables.documents(s, dir),
        col("doc_id"), expr("(n_chars div 256) + 1"), k = 100)),

    // The 100 TB A-ES ladder: one ln(u)/w key per row, nano-rounded
    // once before ranking — unbounded weights, O(rows) hashes.
    "s_weighted_sample_log" -> ((s, dir) =>
      operators.WeightedSample.weightedTopKLog(Tables.documents(s, dir),
        col("doc_id"), col("n_chars") + lit(1L), k = 100)),

    // Stratified weighted pick: 5 winners per language, group-partition
    // rank window (never global).
    "s_weighted_group" -> ((s, dir) =>
      operators.WeightedSample.weightedTopKPerGroup(Tables.documents(s, dir),
        col("lang"), col("doc_id"), expr("(n_chars div 512) + 1"), k = 5)),

    // Dataset card with mergeable KLL quantiles: per-(lang, source)
    // doc-length p50/p90/p99 — exact mode at gate group sizes, so the
    // oracle replays the ⌈q·n⌉-th order statistic.
    "a21_card_quantiles" -> ((s, dir) =>
      CorpusStats.datasetCardQuantiles(Tables.documents(s, dir))),

    // Dataset-card summary per (lang, source): counts, token totals,
    // exact distinct-fingerprint dup rate (oracle; HLL variant is the
    // documented scale path).
    "a12_dataset_card" -> ((s, dir) =>
      CorpusStats.datasetCard(Tables.documents(s, dir))),

    // Dedup-adjusted dataset card: raw vs unique-content tokens per
    // (lang, source) on the duplicate-laden corpus — the budget
    // numbers that survive dedup (oracle replays the fp census).
    "a19_dedup_card" -> ((s, dir) =>
      CorpusStats.dedupAdjustedCard(docsWithCopies(s, dir))),

    // Split-leakage audit: doc-grain hash splitting on a corpus with
    // exact copies leaks train text into eval — the matrix counts the
    // cross-split copy pairs; the require pins that fingerprint-keyed
    // groupSafeSplits drives leakage to zero by construction.
    "v_split_leakage" -> ((s, dir) => {
      val d = docsWithCopies(s, dir)
      val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
      val leakSafe = Dedup.splitLeakage(d,
        HashSplit.groupSafeSplits(
            d.withColumn("_fp", TextAnalysis.fingerprint(col("text")))
              .where(col("_fp").isNotNull),
            col("_fp"), splits)
          .select("doc_id", "split"))
      require(leakSafe.count() == 0L,
        "fingerprint-keyed group-safe splits must leak zero pairs")
      Dedup.splitLeakage(d,
        HashSplit.assignSplits(d.select("doc_id"), col("doc_id"), splits)
          .select("doc_id", "split"))
    }),

    // Two-sample Kolmogorov–Smirnov test: en vs non-en document-length
    // distributions — integer D statistic over the value census,
    // asymptotic Kolmogorov-series p (100 nano-rounded terms).
    // Hill tail-index of the document length distribution: exact
    // (n-k)-th threshold via exactKth, per-row micro log terms, exact
    // long tail sum, ties-at-threshold excluded.
    "x_hill" -> ((s, dir) =>
      operators.TailIndex.hill(Tables.documents(s, dir),
        col("n_chars"), k = 200L)),

    // Wasserstein-1 drift per source slice: how far (in characters)
    // the en length distribution sits from the non-en one — the
    // bin-free, magnitude-carrying companion to KS/PSI.
    "x_wasserstein" -> ((s, dir) =>
      operators.Wasserstein.w1ByGroup(Tables.documents(s, dir),
        group = col("source"), value = col("n_chars"),
        sideB = col("lang") =!= "en")),

    "x_ks_test" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      operators.Hypothesis.ksTest(
        d.where(col("lang") === "en"), d.where(col("lang") =!= "en"),
        col("n_chars"))
    }),

    // Mann–Whitney U on the same two samples as x_ks_test — the
    // rank-based location test next to KS's ECDF-gap test: exact
    // doubled-midrank integer core, tie-corrected normal z, A&S Φ.
    "x_mann_whitney" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      operators.Hypothesis.mannWhitney(
        d.where(col("lang") === "en"), d.where(col("lang") =!= "en"),
        col("n_chars"))
    }),

    // Chi-square independence of lang × source (category drift): exact
    // integer (O·n − r·c) core, Wilson–Hilferty p. Nulls pre-coalesced
    // at the gate (null grid keys would drop from the equi-join).
    "x_chi2_assoc" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      operators.Hypothesis.chiSquareIndependence(d,
        coalesce(col("lang"), lit("^null")),
        coalesce(col("source"), lit("^null")))
    }),

    // The production composition: per-source KS drift fleet against
    // the corpus baseline (src0's lengths planted +2000) → BH FDR over
    // the fleet's p-values. One grouped operator, no driver loop; the
    // oracle replays censuses, dense-grid cumulatives, D, the p
    // series, and the step-up.
    "x_drift_fleet" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(col("source"),
        (col("n_chars") + when(col("source") === "src0", lit(2000L))
          .otherwise(lit(0L))).as("v"))
      val ks = operators.Hypothesis.ksTestByGroup(d, col("source"),
        col("v"))
      operators.Hypothesis.bhCorrect(
          ks.select(col("key"), col("p_micro")))
        .join(ks.select(col("key").as("key"), col("n_g"), col("d_stat"),
          col("p_value")), Seq("key"))
        .select("key", "n_g", "d_stat", "p_value", "p_micro", "rank",
          "discovery")
    }),

    // Benjamini–Hochberg FDR over a fleet of per-source monitor
    // p-values (three planted discoveries + md5-derived nulls) —
    // integer p·m ≤ α·rank rule, k* cutoff, discovery flags.
    "x_bh_fdr" -> ((s, dir) => {
      val p = Tables.documents(s, dir).select(col("source")).distinct()
        .select(col("source").as("key"),
          when(col("source") === "src0", lit(1000L))
            .when(col("source") === "src1", lit(2000L))
            .when(col("source") === "src2", lit(900000L))
            .otherwise(conv(substring(md5(concat(lit("bh:"),
                col("source"))), 1, 15), 16, 10).cast("long")
              % lit(1000000L) + lit(1L))
            .as("p_micro"))
      operators.Hypothesis.bhCorrect(p, alphaMicro = 50000L)
    }),

    // Mixture-rate solver: target weights + a token budget → per-source
    // token targets and sampling factors (the planning step the
    // deterministic samplers execute). Oracle replays census + weights
    // + the whole chain.
    "s_mixture_solve" -> ((s, dir) =>
      operators.Mixture.solveRates(Tables.documents(s, dir),
        Map("src0" -> 3.0, "src1" -> 0.5), budgetTokens = 1000000L)),

    // Deterministic mixture upsampling: src0 ×2.5 epochs, src1 ×0.25,
    // rest ×1 — copy membership hashed per (doc, copy) so the mixture
    // is reproducible row-by-row (oracle).
    "s_mixture_upsample" -> ((s, dir) =>
      HashSplit.upsampleByWeight(
          Tables.documents(s, dir).select("doc_id", "source"),
          col("doc_id"), col("source"),
          Map("src0" -> 2.5, "src1" -> 0.25), defaultWeight = 1.0)
        .select("doc_id", "source", "copy")),

    // Gopher-rules composite filter with per-doc reject reasons; all
    // signals one projection, rounded 6dp before comparison (oracle).
    "t_quality_filter" -> ((s, dir) =>
      QualityFilter.tag(Tables.fanOut(Tables.documents(s, dir)), QualityFilter.Rules(
        minTokens = 25, maxTokens = 90,
        minMeanTokenLen = 3.8, maxMeanTokenLen = 5.1,
        minStopwordFrac = 0.02,
        maxDup2gramFrac = 0.08, maxDup3gramFrac = 0.05))),

    // C4-style boilerplate removal: the synthetic corpus has no newlines,
    // so " table " serves as the line separator — segments repeated in
    // ≥ 20 docs are stripped, doc grain and segment order preserved
    // (oracle — census + anti-join + ordered reassembly in SQL).
    "t_rm_boilerplate" -> ((s, dir) =>
      Boilerplate.removeBoilerplate(Tables.documents(s, dir),
        lineSep = " table ", minDocs = 20)),

    // Paragraph-level corpus dedup (the Dolma recipe's paragraph stage):
    // a ' table '-separated segment repeated anywhere keeps only its
    // corpus-first (doc_id, pos) occurrence; the raw corpus repeats
    // segments naturally, so the stage binds without planting. Oracle
    // replays census, canonical rank, and ordered reassembly.
    "t_dedup_paragraphs" -> ((s, dir) =>
      Boilerplate.dedupLines(Tables.documents(s, dir), lineSep = " table ")),

    // C4-style line-level heuristic filter: lines derived in-query
    // (split on " table ", re-joined with ".\n" so interior lines end
    // in terminal punctuation and the last does not) — ≥4 words,
    // terminal punct required, "spark" blocklisted. Shuffle-free
    // higher-order filter, fully replayed by the oracle (oracle).
    "t_line_filter" -> ((s, dir) =>
      Boilerplate.removeLowQualityLines(
        Tables.fanOut(Tables.documents(s, dir)).select(col("doc_id"),
          array_join(split(col("text"), " table ", -1), ".\n").as("text")),
        lineSep = "\n", minWords = 4, requireTerminalPunct = true,
        blocklist = Seq("spark"))),

    // Compression-ratio quality signal, self-asserting (deflate byte
    // counts are zlib-version-determined, not an engine-portable
    // contract): three engineered corpora — the raw docs, 50x-repeated
    // prefixes, and md5-hex noise — must order rep < natural < noise on
    // mean ratio, the signal's whole point; raw_len stays externally
    // exact.
    "t_compress_ratio" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val rep = docs.select((col("doc_id") + 1000000L).as("doc_id"),
        concat_ws(" ",
          array_repeat(substring(col("text"), 1, 40), 50)).as("text"))
      val noise = docs.select((col("doc_id") + 2000000L).as("doc_id"),
        concat((0 until 8).map(i =>
          md5(concat_ws("|", col("text"), lit(i)))): _*).as("text"))
      val out = TextAnalysis.compressionRatio(
        docs.unionByName(rep).unionByName(noise)).cache()
      val cls = out
        .withColumn("cls",
          when(col("doc_id") >= 2000000L, "noise")
            .when(col("doc_id") >= 1000000L, "rep").otherwise("nat"))
        .groupBy("cls").agg(avg("compression_ratio").as("r"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      require(cls("rep") < cls("nat") && cls("nat") < cls("noise"),
        s"compression signal must order rep < natural < noise, got $cls")
      out
    }),

    // Mojibake repair: every doc gets a planted double-encoded suffix
    // (the table's own garbles — driver constants shared with the
    // oracle); the replace chain must restore the clean characters.
    // Oracle interpolates the SAME generated chain in the same order.
    "t_fix_mojibake" -> ((s, dir) => {
      val cleanSuffix = "é à — € “q” … ™ ü ñ ©"
      val badSuffix = new String(
        cleanSuffix.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        "windows-1252")
      Tables.fanOut(Tables.documents(s, dir)).select(col("doc_id"),
        TextAnalysis.fixMojibake(
          concat(coalesce(col("text"), lit("")), lit(" "), lit(badSuffix)))
          .as("fixed_text"))
    }),

    // Character-entropy quality signal — the engine-portable twin of the
    // compression ratio: per-char terms micro-fixed before the exact
    // integer per-doc sum, one fixed-order bits conversion. Self-check
    // rides inside the oracle contract (repetition < natural < noise is
    // pinned in the spec); here the full per-doc values hash-match.
    "t_char_entropy" -> ((s, dir) =>
      TextAnalysis.charEntropy(Tables.documents(s, dir))),

    // n-gram novelty vs a reference slice (every 3rd doc): reference
    // members score novelty 0, everything else the unseen-shingle
    // fraction — Portable digests so the oracle replays the exact sets.
    "t_novelty" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select("doc_id", "text")
      operators.Decontaminate.noveltyScores(d,
        d.where(col("doc_id") % 3 === 0),
        scheme = graft.operators.HashScheme.Portable)
    }),

    // Multi-pattern blocklist tagging: ONE Aho-Corasick automaton pass
    // per document regardless of pattern count — the sample list plants
    // nested patterns ("scan" inside "slow scan", "tab" inside "table")
    // so fail-link output propagation is exercised, not just trie walks.
    // hits ships as a csv scalar (the e_quantize_int8 array-gate
    // lesson); the oracle replays the declarative contains() twin, which
    // the spec pins automaton-equal.
    "t_blocklist" -> ((s, dir) =>
      MultiPattern.tagMatches(Tables.documents(s, dir))
        .select(col("doc_id"), col("n_hits"),
          array_join(col("hits"), ",").as("hits_csv"))),

    // Per-source frequency cap: at most 10 docs per source, picked by
    // the deterministic md5 draw — run SALTED (4 buckets) to exercise
    // the two-phase hot-domain shape; results are salt-invariant, so
    // the oracle replays the single-phase rank (oracle).
    "s_source_cap" -> ((s, dir) =>
      HashSplit.capPerGroup(
        Tables.documents(s, dir).select("doc_id", "source"),
        col("source"), maxPerGroup = 10, id = col("doc_id"),
        seed = 7L, saltBuckets = 4)),

    // Per-language token-budget fill: take docs in md5 draw order until
    // 2000 tokens per lang, crossing doc included — SALTED (4 buckets)
    // to exercise the bounded two-phase shape; salt-invariant, so the
    // oracle replays the single-phase running sum (oracle).
    "s_token_budget" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("lang"),
        size(TextAnalysis.kernelTokens(col("text"))).cast("long").as("n_toks"))
      HashSplit.takeToTokenBudget(d, col("lang"), col("n_toks"),
        budget = 2000L, id = col("doc_id"), seed = 7L, saltBuckets = 4)
    }),

    // Temperature-scaled mixture resampling (α = 0.5, 20k-token target):
    // per-lang α-weights from the exact token census, whole-token
    // budgets, then the per-group budget-column fill in the md5 draw
    // order — the oracle replays weights, budgets, and the running sum.
    "s_temperature_mix" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"),
        coalesce(col("lang"), lit("und")).as("g"),
        size(TextAnalysis.kernelTokens(col("text"))).cast("long").as("ntk"))
      HashSplit.temperatureResample(d, col("g"), col("ntk"),
          alpha = 0.5, totalTokens = 20000L, id = col("doc_id"), seed = 7L)
        .select("doc_id", "grp", "n_toks", "cum_tokens", "budget")
    }),

    // Rolling-hash fingerprint (Karp–Rabin native expression). Oracle-
    // replayed since round 8: the polynomial is integer arithmetic, so
    // the recursive-CTE byte fold reproduces the digest exactly;
    // identity semantics vs md5 are additionally asserted in DataOpsSpec.
    "t_rolling_fp" -> ((s, dir) =>
      Tables.documents(s, dir).select(col("doc_id"),
        TextAnalysis.rollingFingerprint(col("text")).as("rfp"))),

    // Content-defined chunking (Gear rolling hash): boundary walk on a
    // %3 subset capped at 600 codepoints (the oracle replays the
    // per-codepoint recurrence as a recursive CTE — iterations = max
    // length, rows = Σ lengths, so the gate bounds both). minLen 32 /
    // mask 6 bits (avg ~64) / maxLen 192.
    "d_cdc_chunks" -> ((s, dir) =>
      ContentChunks.chunks(
        Tables.documents(s, dir)
          .where(col("doc_id") % 3 === 0)
          .select(col("doc_id"), substring(col("text"), 1, 600).as("text")),
        col("doc_id"), col("text"), minLen = 32, maskBits = 6, maxLen = 192)),

    // Exact dedup groups over the duplicate-by-construction corpus (oracle).
    "d_exact_groups" -> ((s, dir) =>
      Dedup.exact(docsWithCopies(s, dir))),

    // Exact dedup survivors: min doc_id per fingerprint (oracle).
    "d_exact_dedup" -> ((s, dir) =>
      Dedup.exactDeduped(docsWithCopies(s, dir)).select("doc_id", "lang", "source")),

    // MinHash+LSH near-duplicate pairs verified by n-gram Jaccard ≥ 0.8,
    // run under the PORTABLE (md5-derived) hash scheme so DuckDB replays
    // the full signature → band → candidate → verify chain exactly (the
    // oracle is the NAIVE all-docs LSH — also re-proving the rep-collapse
    // equivalence contract). Library default stays xxhash64 (Fast).
    "d_minhash_neardup" -> ((s, dir) =>
      Dedup.nearDuplicates(docsWithCopies(s, dir), threshold = 0.8,
        scheme = graft.operators.HashScheme.Portable)),

    // Production-scheme twin: the SAME query under the library-default
    // xxhash64 family (engine-specific digests → rows-only). Exists so
    // the bench measures the scale-default hash path alongside the
    // oracle-portable one; DataOpsSpec separately pins that both schemes
    // reach identical near-dup verdicts.
    "d_minhash_neardup_fast" -> ((s, dir) =>
      Dedup.nearDuplicates(docsWithCopies(s, dir), threshold = 0.8)),

    // Scale-path dedup: exact-collapse first, LSH among representatives.
    // Copies become "exact" edges; pair count stays linear in distinct
    // content. Oracle since r3: PORTABLE scheme → DuckDB replays the
    // rep-collapse AND the full LSH chain over the representative set.
    "d_neardup_clusters" -> ((s, dir) =>
      Dedup.nearDuplicateClusters(docsWithCopies(s, dir), threshold = 0.8,
        scheme = graft.operators.HashScheme.Portable)),

    // Production-scheme twin (cf. d_minhash_neardup_fast): the same edge
    // list under the library-default xxhash64 family, rows-only — keeps
    // the scale-default path of the CLUSTER operator exercised by verify
    // and measured by the bench after the oracle gate moved to Portable.
    "d_neardup_clusters_fast" -> ((s, dir) =>
      Dedup.nearDuplicateClusters(docsWithCopies(s, dir), threshold = 0.8)),

    // Cluster-mode dedup CLOSED: edge list → connected components → one
    // cluster id per document. threshold=1.0 keeps only identical-content
    // edges, so clusters ≡ md5 fingerprint groups — exactly DuckDB-
    // expressible (min doc_id over the md5 partition). The CC operator's
    // multi-hop behavior is separately gated by g_connected_components.
    "d_dedup_clusters_closed" -> ((s, dir) =>
      Dedup.dedupClusters(docsWithCopies(s, dir), threshold = 1.0)),

    // Connected components on a 10-deep chain graph (doc i ↔ i−1 within
    // each decade): forces genuinely iterative large-star/small-star
    // rounds; components are decades of the contiguous doc_id space, so
    // the oracle is closed-form.
    "g_connected_components" -> ((s, dir) => {
      val edges = Tables.documents(s, dir)
        .where(col("doc_id") % 10 =!= 0)
        .select(col("doc_id").as("doc_a"), (col("doc_id") - 1).as("doc_b"))
      ConnectedComponents.assign(edges)
    }),

    // Incremental connected components: yesterday's decade-chain
    // closure (the g_connected_components graph) + a NEW edge batch
    // that (a) bridges every even decade into the next one and (b)
    // attaches brand-new nodes (doc_id + 1e6) — the daily crawl merge.
    // The closure re-runs only on the CONTRACTED batch (quotient
    // graph); the oracle is closed-form: every merged block labels at
    // its 20-block minimum, new nodes inherit their anchor's block.
    "g_cc_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id")
      val oldEdges = docs.where(col("doc_id") % 10 =!= 0)
        .select(col("doc_id").as("doc_a"), (col("doc_id") - 1).as("doc_b"))
      val bridges = docs.where(col("doc_id") % 20 === 0)
        .join(docs.select((col("doc_id") - 10).as("doc_id")), Seq("doc_id"),
          "left_semi") // keep only blocks whose second decade exists
        .select(col("doc_id").as("doc_a"), (col("doc_id") + 10).as("doc_b"))
      val attachNew = docs.where(col("doc_id") % 100 === 0)
        .select((col("doc_id") + 1000000L).as("doc_a"), col("doc_id").as("doc_b"))
      val prev = ConnectedComponents.assign(oldEdges)
      ConnectedComponents.incremental(prev, bridges.unionByName(attachNew))
    }),

    // Directed SCC on a spam-ring-shaped graph: each decade of doc_ids
    // is a directed 10-cycle (one SCC), and even decades bridge ONE WAY
    // into the next decade — the defining directed test: the bridge
    // must NOT merge the two rings (an undirected CC would). doc_ids
    // are 0-based and contiguous with complete decades at every SF, so
    // the oracle is closed-form: component = the decade minimum.
    "g_scc" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select("doc_id")
      // ring edge u → u+1 (mod 10, within decade) plus a +3 chord — spam
      // rings are dense, and the chords cut the propagation diameter
      // (label rounds, the cluster cost driver) roughly in half
      val base = (col("doc_id") - col("doc_id") % 10)
      def ringEdge(off: Int): DataFrame = d.select(col("doc_id").as("src"),
        (base + (col("doc_id") % 10 + off) % 10).as("dst"))
      val bridges = d.where(col("doc_id") % 20 === 0)
        .select(col("doc_id").as("src"), (col("doc_id") + 10).as("dst"))
        .join(d.select(col("doc_id").as("dst")), Seq("dst"), "left_semi")
      Scc.assign(ringEdge(1).unionByName(ringEdge(3)).unionByName(bridges))
    }),

    // Incremental SCC: yesterday's decade-ring SCCs (the g_scc graph)
    // persisted as map + condensation DAG; today's batch adds REVERSE
    // bridges on every second block (closing a directed cycle between
    // the two rings of that block — the pair must merge) plus one-way
    // edges from brand-new nodes (must stay singletons). The closure
    // re-runs on condensation ∪ contracted batch only — the ring
    // interiors never re-enter. Closed-form oracle.
    "g_scc_incremental" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select("doc_id")
      val base = (col("doc_id") - col("doc_id") % 10)
      def ringEdge(off: Int): DataFrame = d.select(col("doc_id").as("src"),
        (base + (col("doc_id") % 10 + off) % 10).as("dst"))
      val bridges = d.where(col("doc_id") % 20 === 0)
        .select(col("doc_id").as("src"), (col("doc_id") + 10).as("dst"))
        .join(d.select(col("doc_id").as("dst")), Seq("dst"), "left_semi")
      val oldEdges = ringEdge(1).unionByName(ringEdge(3)).unionByName(bridges)
      val prev = Scc.assign(oldEdges).localCheckpoint()
      val cond = Scc.condensation(oldEdges, prev)
      val reverse = d.where(col("doc_id") % 40 === 0)
        .select((col("doc_id") + 10).as("src"), col("doc_id").as("dst"))
        .join(d.select(col("doc_id").as("src")), Seq("src"), "left_semi")
      val attach = d.where(col("doc_id") % 100 === 0)
        .select((col("doc_id") + 1000000L).as("src"), col("doc_id").as("dst"))
      Scc.incremental(prev, cond, reverse.unionByName(attach))
    }),

    // Multi-source BFS crawl depth: hop distance from the %1000==0 seed
    // pages over a successor (+1) + doubling (*2) link graph, capped at
    // 12 hops — the chain gives long shortest paths, the doubling edges
    // give logarithmic shortcuts, so depths are genuinely non-trivial.
    // The oracle replays the frontier expansion as a recursive CTE over
    // (node, dist) pairs (UNION-deduped, depth-capped) and takes the
    // per-node min — first arrival ≡ min over arrivals.
    "g_bfs" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select("doc_id")
      def edge(f: Column): DataFrame =
        d.select(col("doc_id").as("src"), f.as("dst"))
          .join(Tables.documents(s, dir).select(col("doc_id").as("dst")),
            Seq("dst"), "left_semi")
      val edges = edge(col("doc_id") + 1).unionByName(edge(col("doc_id") * 2))
      val seeds = d.where(col("doc_id") % 1000 === 0)
      Bfs.distances(edges, seeds, maxHops = 12)
    }),

    // Incremental exact dedup (daily-batch pattern): batch = exact
    // copies (dropped) ∪ suffix-modified docs (kept); anti-join on the
    // 16-byte fingerprint index (oracle).
    "d_incremental_exact" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val batch = d.where(col("doc_id") % 3 === 0)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text"))
        .unionByName(d.where(col("doc_id") % 3 === 1)
          .select((col("doc_id") + lit(2000000L)).as("doc_id"),
            concat(col("text"), lit(" xnovel")).as("text")))
      Dedup.dedupAgainstExact(batch, d.select("doc_id", "text")).select("doc_id")
    }),

    // Bloom-prefiltered incremental exact dedup: identical corpus/batch
    // construction and — by contract — IDENTICAL RESULT to
    // d_incremental_exact (the filter only routes rows around the
    // shuffle; the join still decides). The oracle is therefore the
    // same anti-join SQL, which is exactly the claim being gated.
    "d_incremental_exact_bloom" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val batch = d.where(col("doc_id") % 3 === 0)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text"))
        .unionByName(d.where(col("doc_id") % 3 === 1)
          .select((col("doc_id") + lit(2000000L)).as("doc_id"),
            concat(col("text"), lit(" xnovel")).as("text")))
      Dedup.dedupAgainstExactBloom(batch, d.select("doc_id", "text"))
        .select("doc_id")
    }),

    // Incremental near-dup: batch of exact copies vs the corpus at
    // threshold 0.999 — identical content shares every LSH band, so
    // each copy deterministically pairs with every corpus doc of the
    // same fingerprint (oracle: md5-equality pairs with shingle-set
    // sizes).
    "d_incremental_neardup" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val batch = d.where(col("doc_id") % 3 === 0)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text"))
      // the production shape: corpus index built ONCE (cached — a real
      // increment loop reads it from parquet), each batch pays only
      // batch-proportional work against it
      val idx = Dedup.buildSignatureIndex(d.select("doc_id", "text")).cached()
      Dedup.nearDuplicatesAgainst(batch, idx, "text", 0.999)
    }),

    // Index APPEND path (daily loop): the index starts from half the
    // corpus (even doc_ids), the odd half arrives later via
    // SignatureIndex.append, and the batch — copies of every %3==0 doc —
    // must match fp-equal docs in BOTH halves. Same expected output as
    // d_incremental_neardup (the oracle joins over ALL documents), so a
    // broken append that silently dropped or re-keyed the odd half shows
    // up as missing pairs. PlanSpec pins that appending never re-shingles
    // what the index already holds.
    "d_incremental_neardup_appended" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val batch = d.where(col("doc_id") % 3 === 0)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text"))
      val idx = Dedup
        .buildSignatureIndex(d.where(col("doc_id") % 2 === 0).select("doc_id", "text"))
        .append(d.where(col("doc_id") % 2 === 1).select("doc_id", "text"))
        .cached()
      Dedup.nearDuplicatesAgainst(batch, idx, "text", 0.999)
    }),

    // Streaming near-dup CANDIDATE stage (batch run of the stream-static
    // plan — the stateless per-row signature must equal the batch
    // explode+aggregate signature, so the banded join against the
    // persisted index finds exactly the pairs the full portable-LSH
    // oracle chain derives; batch = every %3==0 doc copied).
    "st_neardup_candidates" -> ((s, dir) => {
      val d = Tables.fanOut(Tables.documents(s, dir)).select("doc_id", "text")
      val batch = d.where(col("doc_id") % 3 === 0)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text"))
      val idx = Dedup.buildSignatureIndex(d,
        scheme = graft.operators.HashScheme.Portable).cached()
      graft.streaming.DocStream.nearDupCandidates(batch, idx)
    }),

    // SimHash fingerprints under the portable scheme: 60-bit md5-derived
    // token hashes, so the oracle replays every bit vote in SQL. (The
    // library default stays 64-bit xxhash64.)
    "d_simhash" -> ((s, dir) =>
      Dedup.simhash(Tables.documents(s, dir),
        scheme = graft.operators.HashScheme.Portable)),

    // SimHash near-dup pairs via pigeonhole banding, fully replayed in
    // SQL (60-bit portable fingerprints → maxHamming 3 → 4×15-bit bands
    // → banded self-join → popcount verify). Corpus = docs ∪
    // one-token-perturbed copies: a single appended token flips only
    // thin-margin vote bits, so some copy pairs land at
    // small-but-nonzero Hamming distances — the gate exercises banding
    // + the exact popcount filter, not just identical-fingerprint
    // matches. (The oracle's band arithmetic is written for t = 3; keep
    // the two in sync if the threshold changes.)
    "d_simhash_neardup" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val corpus = d.select("doc_id", "text").unionByName(
        d.select((col("doc_id") + lit(1000000L)).as("doc_id"),
          concat(coalesce(col("text"), lit("")), lit(" zzqx")).as("text")))
      Dedup.simhashNearDuplicates(corpus, maxHamming = 3,
        scheme = graft.operators.HashScheme.Portable)
    }),

    // n-gram Jaccard on explicit pairs: each doc vs its copy → 1.0 (oracle:
    // jaccard of identical shingle sets).
    "d_ngram_jaccard_self" -> ((s, dir) => {
      val pairs = Tables.documents(s, dir)
        .select(col("doc_id").as("doc_a"),
          (col("doc_id") + lit(1000000L)).as("doc_b"))
      Dedup.ngramJaccard(pairs, docsWithCopies(s, dir))
    }),

    // Per-document distinctness: fraction of a doc's shingles shared
    // with other docs — the template-ness diagnostic below the
    // near-dup threshold (oracle replays the shingle df census).
    "t_distinctness" -> ((s, dir) =>
      Dedup.distinctness(Tables.documents(s, dir))),

    // LSH recall harness: exact all-pairs Jaccard ground truth on the
    // %5 stratum + copies vs the production banding scheme — recall
    // floor self-asserted (rows-only: xxhash64 signatures); the
    // verify-⊆-truth invariant is require()d inside the operator.
    "d_lsh_recall" -> ((s, dir) => {
      // absolute id window, not a proportional stratum: the truth side
      // is all-pairs BY DESIGN (harness contract), so its cost must be
      // SF-invariant or the bench pays quadratically at larger SFs
      // (measured 12.8 s at sf0.1 on the %5 stratum; ~1 s bounded)
      val out = Dedup.lshRecallReport(
        docsWithCopies(s, dir).where(col("doc_id") % lit(1000000L) < 100))
      val r = out.head()
      require(r.getLong(0) > 0, "stratum must contain true near-dup pairs")
      require(r.getDouble(3) >= 0.9,
        s"LSH recall ${r.getDouble(3)} below 0.9 floor at J>=0.8 " +
          "(32 hashes / 8 bands: theory ~0.98)")
      out
    }),

    // Near-dup threshold sweep on consecutive-id candidate pairs: per
    // Jaccard bar (30..90%), surviving pairs / touched docs / one-pass
    // removals — the tuning view, one verify pass for the whole grid.
    "d_threshold_sweep" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val pairs = d.select(col("doc_id").as("doc_a"))
        .join(d.select(col("doc_id").as("doc_b")),
          col("doc_b") === col("doc_a") + lit(1L))
      Dedup.thresholdSweep(pairs, d)
    }),

    // Exact threshold set-similarity self-join (AllPairs/PPJoin): every
    // pair with word-token Jaccard ≥ 0.9, prefix+length+positional
    // filtered, NO false negatives (vs LSH's probabilistic recall). The
    // oracle replays the whole chain — df census, rarest-first prefix,
    // integer-rational threshold tests — so a filter-soundness bug
    // hash-fails rather than silently dropping pairs. Gate corpus is the
    // doc_id % 5 stratum + copies: the synthetic corpus is so templated
    // that 41% of ALL pairs clear J ≥ 0.7 (measured), which would make
    // the gate quadratic in output at sf0.1 — a property of the data,
    // not the operator; the subset keeps the gate output bounded while
    // exercising every filter.
    "d_setsim_join" -> ((s, dir) =>
      SetSimJoin.selfJoin(
        Tables.fanOut(docsWithCopies(s, dir).where(col("doc_id") % 5 === 0)),
        tNum = 9, tDen = 10)),

    // Rep-collapsed set-similarity join — the dup-heavy scale path:
    // exact duplicates collapse to min-id reps BEFORE the join (K
    // copies → 1 node, not K²/2 trivial pairs); probed FLAT at 8×
    // K-fold copies where the uncollapsed twin grows quadratically.
    "d_setsim_reps" -> ((s, dir) =>
      SetSimJoin.selfJoinReps(
        docsWithCopies(s, dir).where(col("doc_id") % 5 === 0),
        tNum = 9, tDen = 10)),

    // Sorted-neighborhood dedup: sort by the normalized text itself,
    // compare each doc to its 3 successors, verify at token-Jaccard
    // ≥ 0.9. O(n·w) candidates by construction — no hot bucket can
    // exist. Two-phase global rank on the Spark side; the oracle
    // replays rank, window pairing, and verification.
    "d_sorted_neighborhood" -> ((s, dir) =>
      SortedNeighborhood.nearDuplicates(
        docsWithCopies(s, dir).where(col("doc_id") % 3 === 0),
        TextAnalysis.normalized(col("text")), w = 4, tNum = 9, tDen = 10)),

    // Brute-force cosine top-k: exact ANN baseline (oracle via DuckDB list
    // functions).
    "e_cosine_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 5), k = 10)
    }),

    // LSH-bucketed approximate top-k — oracle since r3: the seeded
    // hyperplanes are plain driver constants, so they interpolate into the
    // oracle SQL as literals and DuckDB replays bucket assignment (sign of
    // a sequential double dot — bit-identical) and ranking exactly.
    "e_ann_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.annTopK(emb, emb.where(col("vec_id") < 5), k = 10, dim = 64,
        planes = 6)
    }),

    // IVF ANN — oracle since r3: FIXED centroids (first 16 vectors) via
    // the explicit-quantizer overload, so DuckDB replays assignment, probe
    // selection, and ranking exactly. The auto-quantizer overload stays
    // the production default (engine-RNG-specific, recall-gated instead).
    "e_ivf_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfTopKWith(emb, emb.where(col("vec_id") < 5),
        fixedCentroids(s, dir, 16), k = 10, nProbe = 4)
    }),

    // ANN recall gate: recall@10 of the LSH and IVF paths vs brute force,
    // all three computed in Spark on a deterministic planted corpus (10
    // sin-perturbed near-copies per query — uniform random vectors have
    // no meaningful neighbors, so recall on the raw table measures noise).
    // The builder itself asserts the mean-recall floors, so a recall
    // regression fails the gate loudly instead of shipping quieter rows.
    // No SQL oracle (hyperplane/quantizer internals are engine-specific).
    // Hard-negative mining (exact path): anchors = every 10th vector,
    // positive = the next id; top-5 semi-hard negatives rank strictly
    // below the positive's 6dp cosine. The oracle replays the whole
    // band-and-rank chain brute-force.
    "e_hard_negatives" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val pairs = emb.where(col("vec_id") % 10 === 0)
        .select(col("vec_id").as("anchor_id"),
          (col("vec_id") + 1).as("pos_id"))
      NegativeMining.semiHard(emb, pairs, k = 5)
    }),

    // IVF-bucketed semi-hard mining vs the exact band, on the workload
    // IVF is FOR: planted positives = perturbed anchor copies (the
    // contrastive-training shape — pos_cos6 ≈ 0.999), so the semi-hard
    // band is the anchor's nearest real neighbors and probing nearby
    // lists must recover them. Neighbor-set recall@5 must clear the
    // floor. Rows-only by design (the contract IS the self-asserted
    // recall; the exact twin has the oracle above).
    "e_hard_neg_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
      val anchors = emb.where(col("vec_id") < 20)
      val planted = anchors.select(
        (lit(2000000L) + col("vec_id")).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x + sin(col("vec_id") * 7 + i) * lit(0.02)).cast("float"))
          .as("embedding"))
      val corpus = emb.unionByName(planted).cache()
      corpus.count()
      val pairs = anchors.select(col("vec_id").as("anchor_id"),
        (lit(2000000L) + col("vec_id")).as("pos_id"))
      val exact = NegativeMining.semiHard(corpus, pairs, k = 5)
        .select("query_id", "neighbor_id").cache()
      val nQ = exact.select("query_id").distinct().count().toDouble
      val ivf = NegativeMining.semiHardIvf(corpus, pairs,
        fixedCentroids(s, dir, 16), k = 5, nProbe = 6)
      val hit = exact.join(ivf.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi").count().toDouble
      val recall = hit / (5.0 * nQ)
      require(recall >= RECALL_FLOOR_HARD_NEG,
        f"IVF semi-hard recall@5 $recall%.3f < $RECALL_FLOOR_HARD_NEG")
      exact.groupBy("query_id").agg(count(lit(1)).as("n_negatives"))
    }),

    "e_ann_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
      val q = emb.where(col("vec_id") < 20)
      val planted = q
        .select(col("vec_id"), col("embedding"),
          explode(sequence(lit(1), lit(10))).as("j"))
        .select(
          (lit(1000000L) + col("vec_id") * 100 + col("j")).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            (x + sin(col("vec_id") * 7 + col("j") * 13 + i) * lit(0.02))
              .cast("float")).as("embedding"))
      val corpus = emb.unionByName(planted).cache()
      corpus.count()
      val brute = Similarity.bruteForceTopK(corpus, q, k = 10)
        .select("query_id", "neighbor_id").cache()
      brute.count()
      def recallOf(approx: DataFrame, as: String): DataFrame =
        brute.join(approx.select("query_id", "neighbor_id"),
            Seq("query_id", "neighbor_id"), "left_semi")
          .groupBy("query_id")
          .agg((count(lit(1)) / 10.0).as(as))
      val ann = recallOf(
        Similarity.annTopK(corpus, q, k = 10, dim = 64, planes = 6,
          multiProbe = 1), "recall_ann")
      val ivf = recallOf(
        Similarity.ivfTopK(corpus, q, k = 10, nLists = 16, nProbe = 6), "recall_ivf")
      val out = q.select(col("vec_id").as("query_id"))
        .join(ann, Seq("query_id"), "left_outer")
        .join(ivf, Seq("query_id"), "left_outer")
        .na.fill(0.0, Seq("recall_ann", "recall_ivf"))
        .cache()
      val m = out.agg(avg("recall_ann"), avg("recall_ivf")).head()
      val (mAnn, mIvf) = (m.getDouble(0), m.getDouble(1))
      // measured 0.98-1.00 / 1.00 at sf0.001-0.1 with multi-probe LSH
      // (Hamming-1) and nProbe=6 — floors leave a small deterministic
      // margin, and a recall regression still fails the gate loudly
      require(mAnn >= 0.9 && mIvf >= 0.95,
        f"ANN recall regression: mean recall_ann=$mAnn%.3f (floor 0.9), " +
          f"recall_ivf=$mIvf%.3f (floor 0.95)")
      out
    }),

    // Int8-quantization quality harness: top-k recall of the quantized
    // path against the float brute-force path on identical corpus and
    // queries — int8 quality loss is MEASURED per round, not assumed.
    // Self-asserting (require floor), rows-only by design: both compared
    // paths are independently oracle-gated (e_cosine_topk,
    // e_quantized_topk); this gate pins their AGREEMENT.
    "e_quantized_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir).select("vec_id", "embedding").cache()
      emb.count()
      val q = emb.where(col("vec_id") < 20)
      val brute = Similarity.bruteForceTopK(emb, q, k = 10)
        .select("query_id", "neighbor_id").cache()
      brute.count()
      val quant = Quantize.quantizedTopK(emb, q, k = 10)
      // left_outer from the full query set, zero-filled: a query whose
      // quantized top-k shares NOTHING with brute force must count as
      // recall 0, not silently drop out of the mean — excluding it would
      // overstate recall exactly when the regression is worst
      val out = q.select(col("vec_id").as("query_id"))
        .join(
          brute.join(quant.select("query_id", "neighbor_id"),
              Seq("query_id", "neighbor_id"), "left_semi")
            .groupBy("query_id")
            .agg((count(lit(1)) / 10.0).as("recall_q8")),
          Seq("query_id"), "left_outer")
        .na.fill(0.0, Seq("recall_q8"))
        .cache()
      val m = out.agg(avg("recall_q8")).head().getDouble(0)
      // measured 0.98-1.00 at sf0.001-0.1 (64-dim float32 quantizes with
      // ~1e-3 cosine error, far below typical neighbor gaps); the floor
      // leaves margin while still failing loudly on a real regression
      require(m >= 0.9,
        f"int8 quantized recall regression: mean recall_q8=$m%.3f (floor 0.9)")
      out
    }),

    // Binary (1-bit) quantization, stage 1: Hamming top-k over sign-packed
    // vectors (one long per dim-64 vector — 32× the float32 footprint).
    // The oracle replays the sign rule per-coordinate (v > 0) instead of
    // re-deriving two's-complement words — identical Hamming by
    // construction, so a packing bug hash-fails.
    "e_binary_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      BinaryQuantize.binaryTopK(emb, emb.where(col("vec_id") < 5),
        k = 10, dim = 64)
    }),

    // Binary quantization, stage 2: Hamming top-50 candidates reranked by
    // exact float cosine to top-10 — the two-stage retrieval shape where
    // stage 1 never touches a float array. Oracle replays both stages.
    "e_binary_rerank" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      BinaryQuantize.rerankTopK(emb, emb.where(col("vec_id") < 5),
        k = 10, dim = 64, rerank = 50)
    }),

    // Binary-quantization quality harness: recall@10 of the
    // Hamming+rerank path vs float brute force on the planted-neighbor
    // corpus (same construction as e_ann_recall — recall on pure-random
    // vectors measures noise). Self-asserting floor; rows-only by design
    // (both compared paths are independently oracle-gated above).
    "e_binary_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
      val q = emb.where(col("vec_id") < 20)
      val planted = q
        .select(col("vec_id"), col("embedding"),
          explode(sequence(lit(1), lit(10))).as("j"))
        .select(
          (lit(3000000L) + col("vec_id") * 100 + col("j")).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            (x + sin(col("vec_id") * 7 + col("j") * 13 + i) * lit(0.02))
              .cast("float")).as("embedding"))
      val corpus = emb.unionByName(planted).cache()
      corpus.count()
      val brute = Similarity.bruteForceTopK(corpus, q, k = 10)
        .select("query_id", "neighbor_id").cache()
      brute.count()
      val bin = BinaryQuantize.rerankTopK(corpus, q, k = 10, dim = 64,
        rerank = 50)
      val out = q.select(col("vec_id").as("query_id"))
        .join(
          brute.join(bin.select("query_id", "neighbor_id"),
              Seq("query_id", "neighbor_id"), "left_semi")
            .groupBy("query_id")
            .agg((count(lit(1)) / 10.0).as("recall_bin")),
          Seq("query_id"), "left_outer")
        .na.fill(0.0, Seq("recall_bin"))
        .cache()
      val m = out.agg(avg("recall_bin")).head().getDouble(0)
      // floor set from measured values at sf0.001-0.1 (see spec); a
      // packing or rerank regression still fails loudly
      require(m >= 0.8,
        f"binary quantized recall regression: mean recall_bin=$m%.3f (floor 0.8)")
      out
    }),

    // Embedding-cosine near-dup: duplicate-by-construction corpus (vector
    // ∪ identical copy) → every vector pairs with its copy at cosine 1.
    // Oracle since r3: hyperplane literals interpolated into the SQL.
    "e_embedding_neardup" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val both = emb.unionByName(emb.withColumn("vec_id", col("vec_id") + lit(1000000L)))
      Dedup.embeddingNearDuplicates(both, dim = 64, threshold = 0.999)
    }),

    // INCREMENTAL embedding near-dup — the daily-loop path for semantic
    // duplicates: the corpus is bucketed ONCE into an EmbeddingIndex,
    // and the increment (twins of every 3rd vector) probes stored
    // buckets + exact-cosine verifies without touching corpus vectors
    // outside matched buckets. Oracle replays the plane family, the
    // bucket equi-join, and the cosine frontier.
    "e_incremental_embdup" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val idx = Dedup.buildEmbeddingIndex(emb, dim = 64).cached()
      val increment = emb.where(col("vec_id") % 3 === 0)
        .select((col("vec_id") + lit(1000000L)).as("vec_id"), col("embedding"))
      Dedup.embeddingNearDuplicatesAgainst(increment, idx, threshold = 0.999)
    }),

    // Nearest-centroid assignment against FIXED centroids (first 8
    // vectors): the k-means E-step in isolation, shuffle-free argmin —
    // oracle replays the identical sequential-double-sum scores in SQL.
    "e_kmeans_assign" -> ((s, dir) =>
      Clustering.assign(Tables.embeddings(s, dir), fixedCentroids(s, dir, 8))
        .select("vec_id", "cluster_id")),

    // Warm-start Lloyd refresh: 3 exact E+M rounds from the fixed
    // persisted centroids — the daily-loop clustering update; micro
    // M-step + snap-to-grid empty clusters make every round's centroid
    // census replayable (oracle unrolls all 3 rounds).
    "e_kmeans_warm" -> ((s, dir) =>
      Clustering.refineCentroids(Tables.embeddings(s, dir),
        fixedCentroids(s, dir, 8), rounds = 3)),

    // Incremental PCA: the even/odd moment censuses MERGE cell-wise to
    // the whole-corpus moments exactly — fit runs on merged state with
    // no re-scan of earlier days (oracle = the whole-corpus census).
    "e_pca_moments_merge" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      Pca.mergeMoments(
        Pca.momentsMicro(e.where(col("vec_id") % 2 === 0)),
        Pca.momentsMicro(e.where(col("vec_id") % 2 === 1)))
    }),

    // Exact k-th order statistic (median of micro event values) by
    // iterative range narrowing — ≤4 census passes, no global sort
    // (oracle replays the order statistic).
    "a20_exact_median" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(round(col("value") * 1e6).cast("long").as("vm"))
      val n = ev.where(col("vm").isNotNull).count()
      operators.HistQuantile.exactKth(ev, col("vm"), (n + 1) / 2)
    }),

    // Embedding outlier pruning: per-cluster robust MAD rule on the
    // exact micro distance to the assigned centroid — encoder glitches
    // and off-manifold junk flagged before dedup/ANN (oracle replays
    // assignment, distances, both order-statistic medians, the flag).
    "e_embedding_outliers" -> ((s, dir) =>
      Clustering.embeddingOutliers(Tables.embeddings(s, dir),
        fixedCentroids(s, dir, 8))),

    // Clustering agreement ARI + NMI between the initial assignment and
    // the round-3 refreshed assignment — did the refresh keep cluster
    // identities? Contingency-census arithmetic, oracle replays the
    // whole refresh chain plus both metrics.
    "e_cluster_compare" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val init = fixedCentroids(s, dir, 8)
      val dim = init(0).length
      val fin = Array.ofDim[Double](init.length, dim)
      Clustering.refineCentroids(emb, init, rounds = 3)
        .where(col("round") === 3).collect()
        .foreach(r => fin(r.getInt(1))(r.getInt(2)) =
          r.getLong(3).toDouble / 1e6)
      Clustering.compareClusterings(
        Clustering.assign(emb, init).select("vec_id", "cluster_id"),
        Clustering.assign(emb, fin).select("vec_id", "cluster_id"))
    }),

    // COLD-start k-means, fully oracle-replayed (round-6 verdict #3):
    // deterministic md5-"seed:"-ladder seeding snapped to the micro
    // grid, then 3 exact Lloyd rounds — the oracle replays the seed
    // draw AND every round from the embeddings table alone, so the
    // formerly rows-only gate is now rows+schema+hash green. The
    // farthest-first quality seeding (Clustering.kmeans) keeps its
    // planted-corpus purity pin in ClusteringSpec.
    "e_kmeans_cluster" -> ((s, dir) =>
      Clustering.kmeansCold(Tables.embeddings(s, dir), k = 8, rounds = 3)),

    // SemDeDup within-cluster pairs at tau=0.3 over the raw corpus:
    // cluster-bucketed self-join (never all-pairs), cosine rounded 6dp
    // before the threshold — oracle replays cluster assignment + join.
    "e_semantic_pairs" -> ((s, dir) =>
      Clustering.semanticPrunePairs(Tables.embeddings(s, dir),
        fixedCentroids(s, dir, 8), tau = 0.3)),

    // SemDeDup survivors on a duplicate-by-construction corpus (vector ∪
    // identical twin): each twin shares its original's cluster and prunes
    // at cosine 1 ≥ 0.95; random pairs stay below the threshold → oracle.
    "e_semantic_dedup" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val both = emb.unionByName(emb.withColumn("vec_id", col("vec_id") + lit(1000000L)))
      Clustering.semanticDedup(both, fixedCentroids(s, dir, 8), tau = 0.95)
        .select("vec_id")
    }),

    // Repeated-span removal (fixed-k substring dedup): corpus = documents
    // ∪ a remix per ≥12-token doc (its first 12 tokens + a unique tail) —
    // the shared 12-token prefix repeats across the pair, so every
    // window inside it is a repeated span and both sides lose exactly
    // those tokens; the unique tails survive (oracle replays the census
    // and reassembly token-exactly).
    "d_span_dedup" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select("doc_id", "text")
      val remix = d.where(trim(col("text")) =!= "")
        .select(col("doc_id"), TextAnalysis.kernelTokens(col("text")).as("toks"))
        .where(size(col("toks")) >= 12)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"),
          concat(array_join(slice(col("toks"), 1, 12), " "),
            lit(" tailmark"), col("doc_id").cast("string")).as("text"))
      SpanDedup.removeRepeatedSpans(d.unionByName(remix), k = 8)
    }),

    // keep-one-copy policy on the same corpus: the corpus-first
    // occurrence of each repeated window stays — originals (lower ids)
    // keep their prefixes, remixes still lose the copied span. The
    // oracle excludes the lexicographic-minimum occurrence per digest
    // before the coverage explode.
    "d_span_dedup_keepfirst" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select("doc_id", "text")
      val remix = d.where(trim(col("text")) =!= "")
        .select(col("doc_id"), TextAnalysis.kernelTokens(col("text")).as("toks"))
        .where(size(col("toks")) >= 12)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"),
          concat(array_join(slice(col("toks"), 1, 12), " "),
            lit(" tailmark"), col("doc_id").cast("string")).as("text"))
      SpanDedup.removeRepeatedSpans(d.unionByName(remix), k = 8,
        keepFirst = true)
    }),

    // Variable-length span REPORTING on the same remixed corpus: each
    // maximal island of covered positions comes back with its true
    // length and text — the suffix-array-style report from the k-census.
    "d_span_maximal" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select("doc_id", "text")
      val remix = d.where(trim(col("text")) =!= "")
        .select(col("doc_id"), TextAnalysis.kernelTokens(col("text")).as("toks"))
        .where(size(col("toks")) >= 12)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"),
          concat(array_join(slice(col("toks"), 1, 12), " "),
            lit(" tailmark"), col("doc_id").cast("string")).as("text"))
      SpanDedup.maximalRepeatedSpans(d.unionByName(remix), k = 8)
    }),

    // Context-window chunking: 64-token windows, 16-token overlap
    // (stride 48) — strided slicing replayed exactly in SQL.
    "t_chunk" -> ((s, dir) =>
      SpanDedup.chunk(Tables.documents(s, dir), maxTokens = 64, overlap = 16)),

    // Tokenizer-prep vocabulary: min-count-filtered census, ids in
    // deterministic (freq desc, term asc) rank order (oracle).
    // T5-style span corruption: deterministic md5 span walk (start
    // prob 0.075, lengths 1–3), sentinel input + span targets — the
    // oracle's per-doc recursive CTE replays every masking decision.
    "t_span_corrupt" -> ((s, dir) =>
      operators.SpanCorrupt.corrupt(Tables.documents(s, dir),
        startProbMicro = 75000L, seed = 42L)),

    // Zipf-law fit: ln(freq) regressed on ln(rank) over the vocabulary
    // census — milli-rounded logs, exact long normal-equation sums, one
    // double chain per coefficient. Natural text sits near slope −1.
    "t_zipf" -> ((s, dir) =>
      operators.Salience.zipfFit(Tables.documents(s, dir), minCount = 2)),

    // Vocabulary coverage curve: corpus token fraction covered by the
    // top-S vocab for a size grid — 1 − coverage is the OOV rate a
    // tokenizer pays (oracle replays ranking + grid).
    "t_vocab_coverage" -> ((s, dir) =>
      Salience.vocabCoverage(Tables.documents(s, dir))),

    // Survivor-policy dedup: prefer the 'copy' twin over the original
    // (policy inverts min-id), ties by id — which copy survives
    // changes the corpus, so the policy must replay (oracle replays
    // the preference window).
    "d_exact_dedup_by" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val twin = d.withColumn("doc_id", col("doc_id") + lit(1000000L))
        .withColumn("source", lit("copy"))
      Dedup.exactDedupedBy(d.unionByName(twin),
          when(col("source") === "copy", 1L).otherwise(0L))
        .select("doc_id", "lang", "source", "n_chars")
    }),

    // GloVe-style weighted co-occurrence census: ordered pairs within
    // a 5-token window, 1/d micro-integer weights (oracle replays the
    // position self-join and every weight).
    "t_cooc" -> ((s, dir) =>
      operators.SkipGram.weightedCooccurrence(Tables.documents(s, dir),
        window = 5)),

    // word2vec frequency subsampling: ubiquitous tokens thinned by
    // p = min(1, √(t/f)+t/f), rare tokens survive — per-occurrence
    // md5 decisions, position-ordered reassembly (oracle replays the
    // census, every keep probability, and every draw).
    "t_subsample" -> ((s, dir) =>
      operators.Subsample.frequencySubsample(Tables.documents(s, dir))),

    // KL / Jensen–Shannon divergence between the en and non-en token
    // distributions — add-one smoothed joint vocabulary, per-term
    // nano-rounded ln terms, one vocabulary-grain join (oracle replays
    // censuses + every term).
    "t_divergence" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      operators.Drift.tokenDivergence(
        d.where(col("lang") === "en"), d.where(col("lang") =!= "en"))
    }),

    "t_vocab" -> ((s, dir) =>
      Salience.vocabulary(Tables.documents(s, dir), minCount = 3,
        maxSize = 1000)),

    // PMI bigram collocations: adjacent-pair census vs unigram chance,
    // fixed multiplication order + 6dp round → oracle replays the floats
    // bit-for-bit.
    "t_bigram_pmi" -> ((s, dir) =>
      Salience.bigramPmi(Tables.documents(s, dir), minCount = 3)),

    // CCNet-style perplexity bucketing (exact mode): global percent_rank
    // over the 6dp-rounded unigram score — deterministic (integer
    // micro-log sums → identical doubles in both engines) and replayed
    // window-for-window by the oracle.
    "t_perplexity_buckets" -> ((s, dir) =>
      TextAnalysis.perplexityBuckets(Tables.documents(s, dir))
        .select("doc_id", "n_tokens", "avg_logp10", "bucket")),

    // Curriculum ordering: perplexity bucket (easy→hard) + the
    // deterministic md5 draw within each bucket, packed into ONE
    // sortable key — no global rank anywhere. Oracle wraps the
    // perplexity-bucket replay and rebuilds the same key.
    "s_curriculum" -> ((s, dir) =>
      operators.Shuffle.curriculumOrder(Tables.documents(s, dir), seed = 42L)),

    // Deterministic corpus shuffle: md5(seed,key) order, 8 contiguous
    // hash-range shards, per-shard rank + prefix-sum offsets → a total
    // permutation 1..N the oracle replays exactly.
    "s_shuffle_perm" -> ((s, dir) =>
      operators.Shuffle.permutation(
        Tables.documents(s, dir).select("doc_id", "lang"),
        col("doc_id"), seed = 42L, shards = 8)
        .select("doc_id", "lang", "shard", "pos", "global_pos")),

    // Semantic (embedding-space) decontamination: benchmark = every 10th
    // vector, train = the rest; train side takes ONE nearest centroid,
    // the small benchmark side multi-probes 2 — the oracle replays
    // assignment, probes, and the 6dp cosine frontier exactly.
    "d_semantic_decontaminate" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Decontaminate.semanticReport(
        emb.where(col("vec_id") % 10 === 0),
        emb.where(col("vec_id") % 10 =!= 0),
        fixedCentroids(s, dir, 8), tau = 0.3, nProbe = 2)
    }),

    // DSIR importance scores: target = English subset, raw = whole
    // corpus; hashed unigram+bigram buckets, micro-log10 integer sums —
    // the oracle replays bucket hash, smoothing, and per-doc sums
    // exactly.
    "t_dsir_scores" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      operators.Dsir.scores(d, d.where(col("lang") === "en"), buckets = 1024)
    }),

    // DSIR Gumbel top-k resample (k=100, T=1, seed=7): deterministic
    // md5-derived Gumbel noise → sampling without replacement ∝
    // exp(score), fully replayed by the oracle.
    "t_dsir_sample" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      operators.Dsir.resample(d, d.where(col("lang") === "en"), k = 100,
        buckets = 1024, temperature = 1.0, seed = 7L)
    }),

    // Count-min-sketch heavy hitters: whole-corpus sketch vs the 3-shard
    // driver-merge vs exact counts for the true top-50 — CMS bounds
    // (exact <= est <= exact + eps*N) and EXACT merge equality asserted.
    // Self-asserting, rows-only (sketch hashing is engine-specific).
    "t_cms_hitters" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val whole = Salience.tokenSketch(d)
      val merged = Salience.mergeSketches((0 to 2).map(i =>
        Salience.tokenSketch(d.where(col("doc_id") % 3 === i))))
      val top = Salience.heavyHitters(d, k = 50).collect()
        .map(r => r.getString(0) -> r.getLong(1))
      val nTokens = d.select(TextAnalysis.tokens(
          TextAnalysis.normalized(col("text"))).as("t"))
        .agg(sum(size(col("t")))).head().getLong(0)
      val bound = math.ceil(0.001 * nTokens).toLong
      val estW = Salience.cmsEstimates(whole, top.map(_._1).toSeq)
      val estM = Salience.cmsEstimates(merged, top.map(_._1).toSeq)
      val rows = top.map { case (t, exact) =>
        (t, exact, estW(t), estM(t),
          estW(t) >= exact && estW(t) <= exact + bound, estW(t) == estM(t))
      }.toSeq
      import s.implicits._
      val out = rows.toDF("term", "exact", "est", "est_merged",
        "within_bound", "merge_exact")
      require(rows.forall(_._5),
        s"CMS bound violated: ${rows.filterNot(_._5).take(3)}")
      require(rows.forall(_._6),
        s"CMS shard merge must be exact: ${rows.filterNot(_._6).take(3)}")
      out
    }),

    // Frequent-items (Misra–Gries) sketch twin of t_cms_hitters: exact
    // top-50 terms must satisfy the sketch's unconditional lb ≤ true ≤ ub
    // with ub − lb ≤ maximumError, 3-shard merged sketch ≡ whole-corpus
    // sketch on every probe term, and with no purges at gate scale the
    // wide sketch's estimates are EXACT (rows-only — purge history is
    // engine-specific; the assertions are the gate).
    "t_freq_hitters" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val whole = Salience.freqTokenSketch(d, maxMapSize = 8192)
      val merged = Salience.mergeFreqSketches((0 to 2).map(i =>
        Salience.freqTokenSketch(d.where(col("doc_id") % 3 === i),
          maxMapSize = 8192)))
      val top = Salience.heavyHitters(d, k = 50).collect()
        .map(r => r.getString(0) -> r.getLong(1))
      val estW = Salience.freqEstimates(whole, top.map(_._1).toSeq)
      val estM = Salience.freqEstimates(merged, top.map(_._1).toSeq)
      val rows = top.map { case (t, exact) =>
        val (ew, lw, uw) = estW(t)
        (t, exact, ew, lw, uw,
          ew == exact && lw == exact && uw == exact, // no purge → exact
          estM(t) == estW(t)) // shard merge ≡ direct (both purge-free)
      }.toSeq
      require(rows.forall(_._6),
        s"wide sketch must be exact at gate scale: ${rows.filterNot(_._6).take(3)}")
      require(rows.forall(_._7),
        s"shard merge must equal direct: ${rows.filterNot(_._7).take(3)}")
      // purge mode, on a high-cardinality derived key (term:doc-bucket —
      // thousands of actives through a 64-slot map): bounds must hold
      // unconditionally and NO_FALSE_NEGATIVES must return a superset of
      // everything above the error line
      val keyed = d.select(explode(TextAnalysis.tokens(
            TextAnalysis.normalized(col("text")))).as("t"),
          pmod(col("doc_id"), lit(97L)).as("b"))
        .where(col("t") =!= "")
        .select(concat(col("t"), lit(":"), col("b")).as("k"))
      val exactK = keyed.groupBy("k").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("k").asc).limit(50)
        .collect().map(r => r.getString(0) -> r.getLong(1))
      val narrow = keyed.agg(graft.functions.FreqSketch
          .freqAgg(col("k"), 64).as("sk"))
        .head().getAs[Array[Byte]](0)
      val maxErr = graft.functions.FreqSketch.wrap(narrow).getMaximumError
      require(maxErr > 0L, "derived stream must actually purge")
      val estN = Salience.freqEstimates(narrow, exactK.map(_._1).toSeq)
      require(exactK.forall { case (t, n) =>
        val (_, lb, ub) = estN(t); lb <= n && n <= ub
      }, "freq bounds violated in purge mode")
      val hitters = Salience.freqHitters(narrow).map(_._1).toSet
      val mustFind = exactK.filter(_._2 > maxErr).map(_._1)
      require(mustFind.forall(hitters.contains),
        s"NO_FALSE_NEGATIVES missed: ${mustFind.filterNot(hitters.contains).take(3)}")
      import s.implicits._
      rows.map(r => (r._1, r._2, r._3, r._4, r._5))
        .toDF("term", "exact", "est", "lb", "ub")
    }),

    // File-level Bloom skipping index: stage documents range-partitioned
    // by doc_id into 8 files, build one Bloom filter per file in a
    // single partial-agg pass, then serve a clustered IN-list lookup
    // reading ONLY the candidate files. Sound by construction (no false
    // negatives) — the gate hash-compares the pruned scan against the
    // oracle's full-scan IN filter; the require pins that pruning
    // actually skipped files (range layout puts the clustered ids in
    // ≤4 of 8 files even with fpp false positives).
    "s8_bloom_prune" -> ((s, dir) => {
      val stage = PipelineQueries.scratchDir(s, "bloom_src", dir) + "/docs"
      Tables.documents(s, dir).select("doc_id", "lang", "n_chars")
        .repartitionByRange(8, col("doc_id"))
        .write.mode("overwrite").parquet(stage)
      val data = s.read.parquet(stage)
      val index = BloomIndex.build(data, "doc_id", expectedPerFile = 4096)
        .cache()
      val nFiles = index.count()
      // 5 clustered present ids + one absent (the empty-result path a
      // point lookup usually takes)
      val probes = Seq("7", "8", "9", "11", "13", "1000001")
      val cand = BloomIndex.candidateFiles(index, probes)
      require(cand.size <= 4 && cand.size < nFiles,
        s"bloom index failed to prune: ${cand.size} of $nFiles files read")
      BloomIndex.prunedScan(s, stage, index, "doc_id", probes)
    }),

    // Morton z-values over (user_id, event_id) low bits: pure integer
    // bit interleave, replayed bit for bit by the oracle (the layout
    // effect itself — shrinking per-partition bounding boxes — is
    // pinned by the self-asserting ZOrderSpec).
    "s7_zorder" -> ((s, dir) =>
      Tables.events(s, dir).select(col("event_id"),
        operators.ZOrder.zValue2(col("user_id"), col("event_id")).as("z"))),

    // Batch sessionization (30-min gap): lag-flag + running-sum windows
    // over one (user, time) partition order; the oracle replays the
    // identical window chain on µs integers.
    "a15_sessionize" -> ((s, dir) =>
      operators.Sessionize.sessions(Tables.events(s, dir))),

    // Relational pivot: event_type rows → columns, one partial-agg
    // shuffle; Spark's pivot plans a regular aggregate with one
    // conditional agg per pivoted value (the oracle replays exactly
    // that shape).
    "a16_pivot" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("click", "view", "purchase", "signup", "error"))),

    // Unpivot/melt: the inverse — wide per-user counts back to long
    // (user_id, event_type, n) via stack; zero-count cells dropped like
    // a sparse long form would be.
    "a17_unpivot" -> ((s, dir) => {
      val wide = Tables.events(s, dir)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("click", "view", "purchase", "signup", "error"))
      wide.select(col("user_id"), expr(
        "stack(5, 'click', click, 'view', view, 'purchase', purchase, " +
          "'signup', signup, 'error', error) AS (event_type, n)"))
        .where(col("n") > 0)
    }),

    // Time-series resample: per-user 6-hour grid from the user's first
    // to last event, each grid point carrying the last observed value
    // at-or-before it (carry-forward as-of semantics, composed from
    // sequence() + the AsOf union-and-carry kernel's window shape).
    "x_resample" -> ((s, dir) =>
      operators.EventAnalytics.resample(Tables.events(s, dir),
        stepUs = 21600000000L)),

    // Cohort retention: first-active-day cohorts × day offsets, distinct
    // active users per cell. Every frame after the first distinct is
    // user- or cohort-grain; the oracle replays day arithmetic on µs
    // integers and the 6dp retention division.
    "x_cohort_retention" -> ((s, dir) =>
      operators.EventAnalytics.cohortRetention(Tables.events(s, dir))),

    // First-touch ordered funnel signup→view→click→purchase: step k's
    // conditional min only sees events strictly after step k−1's
    // timestamp — the oracle replays the chained conditional mins.
    "x_funnel" -> ((s, dir) =>
      operators.EventAnalytics.funnel(Tables.events(s, dir),
        Seq("signup", "view", "click", "purchase"))),

    // Funnel with a 24h conversion window: later steps only count
    // within a day of the user's signup — the "converted within N
    // days" semantics; binding vs the unbounded funnel at this corpus.
    "x_funnel_windowed" -> ((s, dir) =>
      operators.EventAnalytics.funnelWithin(Tables.events(s, dir),
        Seq("signup", "view", "click", "purchase"),
        windowUs = 86400000000L)),

    // Step-grain funnel census from the same per-user frame.
    "x_funnel_counts" -> ((s, dir) =>
      operators.EventAnalytics.funnelCounts(Tables.events(s, dir),
        Seq("signup", "view", "click", "purchase"))),

    // Mergeable dataset card: three disjoint shards sketched separately,
    // merged without re-scan; integer counters must EQUAL the direct
    // exact card, HLL distinct estimates must land within 5% per group.
    // Self-asserting (require), rows-only by design (sketch bytes are
    // engine-specific).
    "a14_card_merge" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val shards = (0 to 2).map(i =>
        CorpusStats.datasetCardSketch(d.where(col("doc_id") % 3 === i)))
      val merged = CorpusStats.mergeCards(shards)
      val exact = CorpusStats.datasetCard(d)
        .select(col("lang"), col("source"), col("n_docs").as("x_docs"),
          col("total_tokens").as("x_toks"), col("distinct_fp").as("x_distinct"))
      val out = merged.join(exact, Seq("lang", "source"))
        .select(col("lang"), col("source"), col("n_docs"),
          col("total_tokens"), col("distinct_fp_est"), col("x_distinct"),
          round(abs(col("distinct_fp_est") - col("x_distinct")).cast("double")
            / col("x_distinct"), 6).as("rel_err"),
          (col("n_docs") === col("x_docs") &&
            col("total_tokens") === col("x_toks")).as("counters_exact"))
        .cache()
      val bad = out.where(!col("counters_exact") || col("rel_err") > 0.05).count()
      require(bad == 0L,
        s"$bad groups failed the merge contract (exact counters, <=5% HLL err)")
      out
    }),

    // Theta-sketch split-overlap matrix: two overlapping slices
    // (doc_id%3<2 vs %3>=1) sketched per group, then intersection /
    // union / difference ESTIMATES — exact integers below 2^lgK
    // distincts, so the DuckDB oracle replays them as exact distinct
    // counts over the same fingerprint sets.
    "k_theta_overlap" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select("doc_id", "text")
      val tagged = d.where(pmod(col("doc_id"), lit(3)) < 2)
          .select(lit("train").as("grp"), col("text"))
        .unionByName(d.where(pmod(col("doc_id"), lit(3)) >= 1)
          .select(lit("eval").as("grp"), col("text")))
      operators.SketchOps.overlapMatrix(
        operators.SketchOps.groupSketches(tagged, "grp"))
    }),

    // Theta-sketch pairwise slice Jaccard — the day-vs-day novelty
    // matrix: three overlapping "daily crawl" slices (doc_id%4 windows
    // {0,1}/{1,2}/{2,3} — consecutive days share half their content),
    // one sketch per day, every unordered pair's set-op estimates +
    // Jaccard from sketch combines alone. Exact mode at this scale, so
    // the oracle replays the matrix as exact distinct counts.
    "k_theta_jaccard" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select("doc_id", "text")
      def day(name: String, r0: Int, r1: Int) =
        d.where(pmod(col("doc_id"), lit(4)) === r0 ||
            pmod(col("doc_id"), lit(4)) === r1)
          .select(lit(name).as("grp"), col("text"))
      operators.SketchOps.sliceJaccard(
        day("day0", 0, 1).unionByName(day("day1", 1, 2))
          .unionByName(day("day2", 2, 3)), "grp")
    }),

    // Mergeable equi-width histogram census over l_extendedprice: one
    // map-side-combined partial agg to ≤64 rows, counts add across days.
    // The oracle replays the bucket formula (identical IEEE doubles:
    // w = 104100/64 is exactly representable) and the group count.
    "k_histogram" -> ((s, dir) =>
      HistQuantile.histogram(Tables.lineitem(s, dir), col("l_extendedprice"),
        lo = 900.0, hi = 105000.0, buckets = 64)),

    // Interpolated quantiles from that census: target rank ceil(q·N),
    // linear interpolation inside the containing bucket, 6dp-rounded
    // division. The running-sum window is over ≤64 census rows — bounded
    // by construction, not corpus-sized.
    "k_hist_quantile" -> ((s, dir) => {
      val h = HistQuantile.histogram(Tables.lineitem(s, dir),
        col("l_extendedprice"), lo = 900.0, hi = 105000.0, buckets = 64)
      HistQuantile.quantiles(h, lo = 900.0, hi = 105000.0, buckets = 64,
        qs = Seq(0.25, 0.5, 0.9, 0.99))
    }),

    // Levenshtein edit-ratio verification of candidate pairs: planted
    // suffix-edit twins (' zq' appended) pass the 0.9 ratio floor;
    // adjacent-id control pairs (different documents) are filtered by
    // it. Both engines implement classic unit-cost Levenshtein.
    "d_edit_verify" -> ((s, dir) => {
      val d = Tables.fanOut(Tables.documents(s, dir)).select("doc_id", "text")
        .where(col("text").isNotNull)
      val corpus = d.unionByName(d.select(
        (col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" zq")).as("text")))
      val pairs = d.where(col("doc_id") % 5 === 0)
        .select(col("doc_id").as("doc_a"),
          (col("doc_id") + 1000000L).as("doc_b"))
        .unionByName(d.where(col("doc_id") % 5 === 0)
          .select(col("doc_id").as("doc_a"), (col("doc_id") + 1).as("doc_b")))
      Dedup.editVerify(pairs, corpus, threshold = 0.9)
    }),

    // One-pass column profiler: every column's null/distinct/min/max
    // aggregates in a single wide partial agg, stack-unpivoted to long
    // form (the unpivot runs over ONE row). Typed min/max (numeric
    // order), rendered 6dp for the shared string schema.
    "k_profile" -> ((s, dir) =>
      operators.Profile.profile(Tables.lineitem(s, dir),
        Seq("l_orderkey", "l_quantity", "l_returnflag", "l_extendedprice"))),

    // Pairwise Pearson correlations: all 6 pairs in one wide partial
    // agg, stack-unpivoted. 6dp both sides (streaming co-moment vs
    // DuckDB's accumulation can differ in the last ulps).
    "k_corr" -> ((s, dir) =>
      operators.Profile.correlations(Tables.lineitem(s, dir),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))),

    // Robust MAD outliers: median and MAD both from histogram censuses
    // (bounded, no sort); planted +500 spikes on every 997th order key
    // are the only values beyond 5·MAD. The oracle replays both census
    // quantiles and the flagging filter.
    "k_outliers" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select(col("l_orderkey"),
        col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        (col("l_quantity") +
          when(col("l_orderkey") % 997 === 0, 500.0).otherwise(0.0)).as("v"))
      operators.Profile.madOutliers(li, "v", lo = 0.0, hi = 600.0,
          buckets = 600, k = 5.0)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "v", "median_est", "mad_est")
    }),

    // Exact phrase search over positional postings: queries are 3-token
    // mid-document slices of every 20th doc, so each query is guaranteed
    // at least one hit in its source; the (query, doc, pos − offset)
    // grouping makes a phrase occurrence a full-offset-count group. The
    // oracle replays postings, offsets, and the group algebra.
    "r_phrase_search" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val toks = TextAnalysis.tokens(TextAnalysis.normalized(col("text")))
      val test = docs.where(col("doc_id") % 20 === 0 && size(toks) >= 5)
        .select(col("doc_id").as("query_id"),
          array_join(slice(toks, 3, 3), " ").as("text"))
      operators.Retrieval.phraseSearch(test, docs, topK = 10)
    }),

    // Training-shard assignment: corpus laid out in the deterministic
    // shuffle draw order and cut into ~2000-token shards (a doc belongs
    // to the shard its FIRST token lands in). The operator runs the
    // two-phase prefix sum (range buckets + broadcast offset table);
    // the oracle replays the same values with one global window.
    "s_shard_assign" -> ((s, dir) => {
      val toks = TextAnalysis.tokenStats(Tables.documents(s, dir))
        .where(col("n_tokens") > 0).select("doc_id", "n_tokens")
      operators.Sharding.assign(toks, col("doc_id"), col("n_tokens"),
          shardTokens = 2000L)
        .select("doc_id", "n_tokens", "cum_tokens", "shard", "shard_pos")
    }),

    // Per-group quantiles from the grouped census: every window
    // partitioned by l_returnflag (≤64 census rows per partition —
    // group-parallel, never global).
    "k_hist_quantile_grouped" -> ((s, dir) => {
      val h = HistQuantile.histogramBy(Tables.lineitem(s, dir),
        Seq("l_returnflag"), col("l_extendedprice"),
        lo = 900.0, hi = 105000.0, buckets = 64)
      HistQuantile.quantilesBy(h, Seq("l_returnflag"),
        lo = 900.0, hi = 105000.0, buckets = 64, qs = Seq(0.5, 0.95))
    }),

    // URL decomposition over deterministically generated URLs (userinfo,
    // ports, public-suffix second levels, varying path depth and query
    // strings all exercised); the oracle generates the SAME urls and
    // replays the regex/array chain verbatim.
    "t_url_parse" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val url = concat(lit("https://u"), (col("doc_id") % 5).cast("string"),
        lit(":pw@w"), (col("doc_id") % 7).cast("string"),
        lit("."), coalesce(col("lang"), lit("xx")), lit("site."),
        when(col("doc_id") % 3 === 0, "co.uk").otherwise("com"),
        when(col("doc_id") % 4 === 0, ":8080").otherwise(""),
        expr("repeat('/seg', CAST(doc_id % 4 AS INT))"),
        when(col("doc_id") % 2 === 0, "?q=1&r=2").otherwise(""))
      operators.UrlOps.parse(d.select(col("doc_id"), url.as("url")), "url")
    }),

    // PSL-exact registrable domains: longest-suffix match against the
    // bundled rule snapshot with wildcard and exception semantics; the
    // host mix exercises every rule kind (exception, wildcard,
    // multi-label exact, default-* fallback). Oracle replays candidate
    // generation, the rule join, and the winner aggregation.
    "t_url_psl" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val m = pmod(col("doc_id"), lit(8))
      val url = concat(lit("https://"),
        when(m === 0, lit("www.ck"))
          .when(m === 1, lit("a.b.github.io"))
          .when(m === 2, concat(lit("x"), (col("doc_id") % 5).cast("string"),
            lit(".bbc.co.uk")))
          .when(m === 3, concat(lit("example"), col("doc_id").cast("string"),
            lit(".com")))
          .when(m === 4, lit("bar.foo.ck"))
          .when(m === 5, lit("deep.a.b.c.com"))
          .when(m === 6, concat(lit("site"), (col("doc_id") % 9).cast("string"),
            lit(".zz")))
          .otherwise(lit("sub.city.kawasaki.jp")),
        lit("/p"))
      operators.UrlOps.registrableDomainsPsl(
        d.select(col("doc_id"), url.as("url")), "url")
    }),

    // Stateless NB scoring (model serving): weights as a dense array
    // literal, one pure projection — no join/agg/shuffle, so the same
    // expression drops into a readStream. Scores every 4th doc under
    // the full-corpus model; MUST equal the join-based path bit for bit
    // (same oracle chain, filtered).
    // Exact per-doc NB attribution: top-5 tokens by |n_occ * w(bucket)|
    // for every %4 doc — linearity makes the decomposition exact (no
    // SHAP sampling); rides the GroupedTopK rewrite.
    "v_nb_explain" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      operators.Classifier.explain(
        d.where(col("doc_id") % 4 === 0),
        operators.Classifier.trainNaiveBayes(
          d.where(col("lang") === "en"), d.where(col("lang") =!= "en"),
          buckets = 1024),
        k = 5, buckets = 1024)
    }),

    "t_nb_stateless" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      operators.Classifier.scoreStateless(
        d.where(col("doc_id") % 4 === 0),
        operators.Classifier.trainNaiveBayes(
          d.where(col("lang") === "en"), d.where(col("lang") =!= "en"),
          buckets = 1024),
        operators.Classifier.classPrior(
          d.where(col("lang") === "en"), d.where(col("lang") =!= "en")),
        buckets = 1024)
    }),

    // fastText-style Naive Bayes quality classifier: train log-odds
    // weights on en (positive) vs non-en (negative) hashed unigram+bigram
    // buckets, score the whole corpus — decision + margin, exact integer
    // micro-log sums; the oracle replays training AND scoring.
    "t_nb_classifier" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      operators.Classifier.scoreAgainst(d,
        d.where(col("lang") === "en"), d.where(col("lang") =!= "en"),
        buckets = 1024)
    }),

    // Classifier evaluation over the NB gate's scores with truth =
    // (lang = 'en'): tie-corrected rank-sum ROC AUC on the score
    // census — two-phase cumulative, integer numerator, one division.
    "v_roc_auc" -> ((s, dir) =>
      operators.Evaluation.rocAuc(nbScored(s, dir))),

    // Average precision (PR-curve area, tie groups as one level,
    // per-level precision nano-rounded before the weighted sum).
    "v_avg_precision" -> ((s, dir) =>
      operators.Evaluation.averagePrecision(nbScored(s, dir))),

    // Precision-targeted threshold solver: lowest NB score threshold
    // clearing each precision target, with the recall paid — pure
    // integer cross-multiplication on the score census.
    "v_precision_threshold" -> ((s, dir) =>
      operators.Evaluation.thresholdForPrecision(nbScored(s, dir))),

    // Per-slice AUC: the fairness/regression view — rank-sum AUC per
    // source over the same NB scores (single-class slices → null).
    "v_auc_by" -> ((s, dir) =>
      operators.Evaluation.rocAucBy(
        nbScored(s, dir).join(
          Tables.documents(s, dir).select("doc_id", "source"),
          Seq("doc_id")),
        col("source"))),

    // Time-series gap fill: dense per-user hourly grid with zero counts
    // on quiet hours and the last observed micro value carried forward —
    // the densification step the lag/EWMA/changepoint family assumes.
    "x_gapfill" -> ((s, dir) =>
      operators.GapFill.hourlyDense(Tables.events(s, dir))),

    // k-fold cross-validated NB-langid AUC: portable md5 folds, per
    // fold train-on-rest / score-held-out, one per-fold rank-sum AUC
    // pass — the model-selection primitive, hash-exact end to end (all
    // five training rounds replayed by the oracle).
    "v_cv_nb_auc" -> ((s, dir) =>
      operators.CrossVal.nbCvAuc(Tables.documents(s, dir)
          .where(col("lang").isNotNull),
        label = col("lang") === "en", folds = 5, buckets = 1024)),

    // Group fairness audit at the NB decision threshold: per-source
    // positive rate / TPR / FPR with gaps vs the pooled rates and the
    // equalized-odds gap max(|dTPR|,|dFPR|). Exact BIGINT counts; every
    // rate one rounded double division; gaps re-rounded — bit-identical
    // chains on both engines.
    "v_fairness" -> ((s, dir) =>
      operators.Evaluation.fairnessBy(
        nbScored(s, dir).join(
          Tables.documents(s, dir).select("doc_id", "source"),
          Seq("doc_id")),
        col("source"))),

    // Reliability diagram at 1.0-log10-odds score-bucket grain:
    // observed positive rate vs base-10-logistic predicted probability,
    // both micro-rounded before the gap.
    "v_calibration" -> ((s, dir) =>
      operators.Evaluation.calibration(nbScored(s, dir))),

    // Expected calibration error folded from the bins — exact integer
    // gap sum in a decimal accumulator.
    "v_calibration_ece" -> ((s, dir) =>
      operators.Evaluation.calibrationError(nbScored(s, dir))),

    // Isotonic (PAV) recalibration of the same bins: integer
    // cross-multiplied violation test, pooled-rate output via the
    // shared round-half-up division; the oracle replays the pooling as
    // an append-or-merge recursive CTE.
    // Pinball (quantile) loss ladder: per-type mean-cents predictor
    // scored at tau 0.1/0.5/0.9 — exact long terms, decimal-safe sums.
    "v_pinball" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      val m = ev.groupBy("event_type")
        .agg(round(sum("cents").cast("double") / count(lit(1)))
          .cast("long").as("pred"))
      operators.Pinball.loss(ev.join(broadcast(m), Seq("event_type")),
        col("event_type"), col("cents"), col("pred"),
        Seq(100000L, 500000L, 900000L))
    }),

    // ROLLUP surface (Catalyst Expand): hierarchy totals with
    // grouping_id, the OLAP subtotal spelling.
    "q_rollup" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("l_extendedprice") * 100).cast("long"))
            .as("sum_cents"),
          grouping_id().cast("long").as("gid"))),

    // Split conformal intervals around a per-part mean-price predictor:
    // 3-way orderkey split (train/cal/test), exact cent residuals,
    // finite-sample ceil((1-alpha)(n+1)) rank via exactKth, test
    // coverage in one literal-filter scan. alpha = 0.1.
    "v_conformal" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select(col("l_orderkey"),
        col("l_partkey"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      val train = li.where(col("l_orderkey") % 3 === 0)
      def fit(df: org.apache.spark.sql.DataFrame) = df
        .agg(round(sum("cents").cast("double") / count(lit(1)))
          .cast("long"))
      val model = train.groupBy("l_partkey")
        .agg(round(sum("cents").cast("double") / count(lit(1)))
          .cast("long").as("pred_part"))
      val g = fit(train).toDF("pred_g")
      def withPred(df: org.apache.spark.sql.DataFrame) = df
        .join(broadcast(model), Seq("l_partkey"), "left_outer")
        .crossJoin(broadcast(g))
        .withColumn("pred", coalesce(col("pred_part"), col("pred_g")))
      operators.Conformal.splitConformal(
        withPred(li.where(col("l_orderkey") % 3 === 1)),
        withPred(li.where(col("l_orderkey") % 3 === 2)),
        pred = col("pred"), actual = col("cents"), alphaMicro = 100000L)
    }),

    // Platt sigmoid calibration of the NB scores: 5 Newton rounds on
    // the score census, micro-snapped (A, B) between rounds, smoothed
    // Platt targets; every round replayed by the oracle.
    "v_platt" -> ((s, dir) =>
      operators.Platt.fit(nbScored(s, dir), col("score_micro"),
        col("label"), rounds = 5)),

    "v_isotonic" -> ((s, dir) =>
      operators.Evaluation.isotonicCalibration(nbScored(s, dir))),

    // Confusion matrix + precision/recall/F1/accuracy at the NB
    // decision threshold (score > 0).
    "v_confusion" -> ((s, dir) =>
      operators.Evaluation.confusionAt(nbScored(s, dir))),

    // Snapshot diff between two corpus versions: %5==0 removed, %3==0
    // content-perturbed (changed — unless text is null, where both sides
    // stay null → unchanged), %7==0 re-added under new ids (added), rest
    // unchanged. Oracle replays the fingerprint full-outer.
    "a13_snapshot_diff" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select("doc_id", "text")
      val cur = d.where(col("doc_id") % 5 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 3 === 0, concat(col("text"), lit(" zz")))
            .otherwise(col("text")).as("text"))
        .unionByName(d.where(col("doc_id") % 7 === 0)
          .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text")))
      CorpusStats.snapshotDiff(d, cur)
    }),

    // Transitive-closure semantic dedup on a TRIPLE corpus (vector ∪ two
    // identical twins): each ≥tau component has three members spanning
    // the id shifts, closure keeps the minimum — the original. Exercises
    // the CC path on multi-node components; oracle is the survivor set.
    "e_semantic_clusters" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val corpus = emb
        .unionByName(emb.withColumn("vec_id", col("vec_id") + lit(1000000L)))
        .unionByName(emb.withColumn("vec_id", col("vec_id") + lit(2000000L)))
      Clustering.semanticDedupClusters(corpus, fixedCentroids(s, dir, 8),
        tau = 0.95).select("vec_id")
    }),

    // Symmetric per-vector int8 quantization, fully replayed by the oracle
    // (round grid is engine-portable on float inputs). The gate projects
    // PORTABLE SCALARS only — the raw array<int> qvec broke the driver's
    // pandas comparator (r03: "unhashable type: numpy.ndarray"), so the
    // vector is pinned as md5(join(qvec)) plus sum/min/max debuggability
    // scalars; the raw array contract stays covered by QuantizeSpec.
    "e_quantize_int8" -> ((s, dir) =>
      Quantize.int8(Tables.embeddings(s, dir)).select(
        col("vec_id"), col("scale"),
        md5(array_join(col("qvec"), ",").cast("binary")).as("qhash"),
        aggregate(col("qvec"), lit(0L), (acc, x) => acc + x).as("qsum"),
        array_min(col("qvec")).as("qmin"),
        array_max(col("qvec")).as("qmax"))),

    // Corpus self-containment: 16-token excerpts re-enter as their own
    // docs (id+3000000) — tiny Jaccard vs their source but containment
    // 1.0; the inverted-index self-join must find exactly what the
    // exact shingle-set SQL finds (cap off in the replay gate).
    "d_containment_self" -> ((s, dir) => {
      val d = Tables.fanOut(Tables.documents(s, dir)).select("doc_id", "text")
      val toks = TextAnalysis.tokens(TextAnalysis.normalized(col("text")))
      val excerpts = d.select(col("doc_id"), toks.as("_t"))
        .where(size(col("_t")) >= 24 && col("doc_id") % 7 === 0)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          array_join(slice(col("_t"), 1, 16), " ").as("text"))
      operators.Decontaminate.selfContainment(
        d.unionByName(excerpts), threshold = 0.9, shingleSize = 3,
        maxDf = 0L)
    }),

    // Fellegi–Sunter linkage over sorted-neighborhood candidates:
    // per-field agreement weights are driver-computed micro-bit
    // constants (log2(m/u)), so the pair score is an exact long sum —
    // the oracle inlines the same constants and replays blocking,
    // scoring and the three-way verdict.
    "d_fellegi_sunter" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).where(col("doc_id") % 3 === 0)
      val cand = operators.SortedNeighborhood.candidatePairs(
        docs, TextAnalysis.normalized(col("text")), w = 4)
      val attrs = docs.select(col("doc_id"), col("lang"), col("source"),
        expr("n_chars div 256").as("lb"))
      val pairs = cand
        .join(attrs.select(col("doc_id").as("doc_a"),
          col("lang").as("lang_a"), col("source").as("source_a"),
          col("lb").as("lb_a")), Seq("doc_a"))
        .join(attrs.select(col("doc_id").as("doc_b"),
          col("lang").as("lang_b"), col("source").as("source_b"),
          col("lb").as("lb_b")), Seq("doc_b"))
      val scored = operators.RecordLinkage.score(pairs, fsGateFields)
      operators.RecordLinkage.classify(scored,
          upperMicro = 2000000L, lowerMicro = 0L)
        .select("doc_a", "doc_b", "w_lang", "w_source", "w_len",
          "fs_micro", "verdict")
    }),

    // Entity resolution end-to-end: Fellegi–Sunter link verdicts fed
    // into the connected-components closure — pairwise matches become
    // ENTITY ids (the step every MDM/identity pipeline runs after
    // scoring; A≈B≈C merge even when A–C never scored). Oracle replays
    // the FS chain + a recursive label-propagation closure.
    "d_fs_entities" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).where(col("doc_id") % 3 === 0)
      val cand = operators.SortedNeighborhood.candidatePairs(
        docs, TextAnalysis.normalized(col("text")), w = 4)
      val attrs = docs.select(col("doc_id"), col("lang"), col("source"),
        expr("n_chars div 256").as("lb"))
      val pairs = cand
        .join(attrs.select(col("doc_id").as("doc_a"),
          col("lang").as("lang_a"), col("source").as("source_a"),
          col("lb").as("lb_a")), Seq("doc_a"))
        .join(attrs.select(col("doc_id").as("doc_b"),
          col("lang").as("lang_b"), col("source").as("source_b"),
          col("lb").as("lb_b")), Seq("doc_b"))
      val scored = operators.RecordLinkage.score(pairs, fsGateFields)
      val links = operators.RecordLinkage.classify(scored,
          upperMicro = 2000000L, lowerMicro = 0L)
        .where(col("verdict") === "link")
        .select("doc_a", "doc_b")
      ConnectedComponents.assign(links)
    }),

    // u-probability estimation from the value census: P(agree | random
    // pair) = Σ p_v² per field — census-grain, never a pair sample.
    "d_fs_uprob" -> ((s, dir) =>
      operators.RecordLinkage.uEstimate(Tables.documents(s, dir), Map(
        "lang" -> col("lang"), "source" -> col("source"),
        "len" -> expr("n_chars div 256")))),

    // Embedding-space drift: even-id vs odd-id snapshot halves compared
    // at dimension grain — exact micro censuses, per-dim shifts, and
    // the centroid cosine + max-shift alert line.
    "e_embedding_drift" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      operators.EmbeddingDrift.perDim(
        e.where(col("vec_id") % 2 === 0), e.where(col("vec_id") % 2 === 1))
    }),

    "e_embedding_drift_summary" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      operators.EmbeddingDrift.summary(
        e.where(col("vec_id") % 2 === 0), e.where(col("vec_id") % 2 === 1))
    }),

    // MMR diversified rerank: top-20 relevance pool per query, then 8
    // greedy rounds of λ·rel − (1−λ)·maxsim on exact long scores —
    // dedup-aware retrieval. The oracle replays pool, pairwise sims,
    // and every greedy round.
    "r_mmr" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      operators.Mmr.diversifiedTopK(emb, emb.where(col("vec_id") < 5),
        pool = 20, k = 8, lambdaMicro = 700000L)
    }),

    // Greedy k-center (farthest-first) diversity selection on the int8
    // grid: every round's argmax is exact integer math (squared L2 of
    // int8 vectors), so the oracle replays the full selection sequence.
    "e_kcenter" -> ((s, dir) =>
      operators.Coreset.kCenters(Tables.embeddings(s, dir), k = 8)),

    // KNN-Shapley data valuation: every training vector's exact Shapley
    // value for a 5-NN classifier against the %50 held-out panel —
    // int8-grid distances, micro-quantized rank coefficients, two-phase
    // sharded ranks/suffix sums. The oracle replays the closed form
    // with plain windows.
    "e_knn_shapley" -> ((s, dir) =>
      operators.KnnShapley.valueByKnn(Tables.embeddings(s, dir),
        testPred = col("vec_id") % 50 === 0, k = 5)),

    // Greedy max-coverage panel: 8 docs jointly covering the most
    // distinct long words (submodular (1-1/e) greedy; gains exact
    // longs, ties to the lower id). The oracle replays all 8 argmax
    // rounds as generated CTEs.
    "e_setcover" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .where(col("doc_id") % 2 === 0)
        .select(col("doc_id"),
          explode(split(TextAnalysis.normalized(col("text")), " ")).as("w"))
        .where(length(col("w")) >= 6)
      operators.SetCover.greedyCoverage(toks, col("doc_id"), col("w"), k = 8)
    }),

    // Exact top-k over QUANTIZED vectors — int dots are exact in double;
    // ranks order by the 6dp-rounded cosine + id tiebreak (the shared
    // topK contract), so the oracle replays them regardless of ulp-level
    // normalization differences between engines.
    "e_quantized_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Quantize.quantizedTopK(emb, emb.where(col("vec_id") < 5), k = 10)
    }),

    // Micro-quantized PageRank, 10 rounds, over a deterministic pseudo
    // link graph (doc → 7·doc+3 mod 409, doc → its decade root): every
    // per-edge term is one rounded double op, so the oracle replays the
    // whole iteration as unrolled CTEs (the BPE trick).
    // Anchor-text aggregation: the g_pagerank graph, each edge carrying
    // the src doc's first-3-token anchor; per-target top-3 terms by
    // PageRank-weighted inlink mass. Integer micro weights end-to-end,
    // so the oracle replays the full chain (all 10 rank rounds + the
    // explode/census/top-k) exactly.
    "g_anchor_text" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val edges0 = d.select(col("doc_id").as("src"),
          ((col("doc_id") * 7 + 3) % 409).as("dst"))
        .unionByName(d.select(col("doc_id").as("src"),
          expr("(doc_id div 10) * 10").as("dst")))
      val anchors = d.select(col("doc_id").as("src"),
        array_join(slice(TextAnalysis.tokens(
          TextAnalysis.normalized(col("text"))), 1, 3), " ").as("anchor"))
      val ranks = operators.PageRank.pageRank(edges0, iterations = 10)
        .select("node", "pr_micro")
      operators.AnchorText.topTerms(edges0.join(anchors, "src"), ranks, k = 3)
    }),

    // HITS hubs/authorities on the same graph: 5 rounds, each an exact
    // integer edge-sum + ONE max-normalizing double op rounded back to
    // micro units — the oracle replays all 10 half-rounds as CTEs.
    "g_hits" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val edges = d.select(col("doc_id").as("src"),
          ((col("doc_id") * 7 + 3) % 409).as("dst"))
        .unionByName(d.select(col("doc_id").as("src"),
          expr("(doc_id div 10) * 10").as("dst")))
      operators.Hits.hits(edges, iterations = 5)
    }),

    "g_pagerank" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val edges = d.select(col("doc_id").as("src"),
          ((col("doc_id") * 7 + 3) % 409).as("dst"))
        .unionByName(d.select(col("doc_id").as("src"),
          expr("(doc_id div 10) * 10").as("dst")))
      operators.PageRank.pageRank(edges, iterations = 10)
    }),

    // Dangling-mass redistribution: the same functional graph with
    // src % 3 = 0 edges removed, so a third of the nodes genuinely
    // dangle. Each round shares round(0.85·dm/N) micro uniformly —
    // one extra 1-row broadcast aggregate per round, mass conserved to
    // rounding (spec-pinned); the oracle replays every round's dm.
    "g_pagerank_dangling" -> ((s, dir) => {
      val d = Tables.documents(s, dir).where(col("doc_id") % 3 =!= 0)
      val edges = d.select(col("doc_id").as("src"),
          ((col("doc_id") * 7 + 3) % 409).as("dst"))
        .unionByName(d.select(col("doc_id").as("src"),
          expr("(doc_id div 10) * 10").as("dst")))
      operators.PageRank.pageRank(edges, iterations = 10,
        redistributeDangling = true)
    }),

    // Warm-start PageRank: 5 cold rounds persisted as "yesterday's"
    // ranks, then 3 warm rounds — the daily-loop refresh shape. The
    // in-gate require pins warmStart(5)+3 ≡ cold 8 node-for-node; the
    // oracle replays all 8 rounds.
    "g_pagerank_warm" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val edges = d.select(col("doc_id").as("src"),
          ((col("doc_id") * 7 + 3) % 409).as("dst"))
        .unionByName(d.select(col("doc_id").as("src"),
          expr("(doc_id div 10) * 10").as("dst")))
      val day1 = operators.PageRank.pageRank(edges, iterations = 5)
        .select(col("node"), col("pr_micro")).localCheckpoint()
      val warm = operators.PageRank.pageRank(edges, iterations = 3,
        initRanks = Some(day1))
      val cold = operators.PageRank.pageRank(edges, iterations = 8)
      val diff = warm.select("node", "pr_micro")
        .exceptAll(cold.select("node", "pr_micro")).count()
      require(diff == 0,
        s"warm-start must equal the cold 8-round run, $diff rows differ")
      warm
    }),

    // Weighted PageRank: the doc graph with deterministic multiplicity
    // weights 1 + (src + dst) % 5 — rank mass splits proportionally to
    // out-edge weight. All 10 rounds replayed.
    "g_pagerank_weighted" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val edges = d.select(col("doc_id").as("src"),
          ((col("doc_id") * 7 + 3) % 409).as("dst"))
        .unionByName(d.select(col("doc_id").as("src"),
          expr("(doc_id div 10) * 10").as("dst")))
        .withColumn("w", lit(1L) + pmod(col("src") + col("dst"), lit(5L)))
      operators.PageRank.pageRankWeighted(edges, iterations = 10)
    }),

    // Deterministic synchronous label propagation on the same graph: 5
    // rounds, neighbor-label majority with a self-vote (kills the
    // synchronous 2-cycle) and (count desc, label asc) tie-break — pure
    // integer votes, so the oracle replays every round.
    // Output at node grain plus the community roll-up joined back (size
    // of each node's community — the grain a per-community sampling cap
    // consumes).
    "g_lpa" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val edges = d.select(col("doc_id").as("src"),
          ((col("doc_id") * 7 + 3) % 409).as("dst"))
        .unionByName(d.select(col("doc_id").as("src"),
          expr("(doc_id div 10) * 10").as("dst")))
      val labels = operators.LabelPropagation.propagate(edges, iterations = 5)
      labels.join(
        operators.LabelPropagation.communities(labels)
          .select(col("label"), col("size").as("community_size")),
        Seq("label"))
        .select("node", "label", "community_size")
    }),

    // Modularity of the LPA partition on the same graph — the quality
    // score closing the community loop (Q ≈ 0 = no better than chance
    // for the degree sequence): exact integer Σ(4m·e_c − d_c²)
    // numerator, one rounded division. Oracle replays the 5 LPA rounds
    // AND the modularity algebra.
    "g_modularity" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val edges = d.select(col("doc_id").as("src"),
          ((col("doc_id") * 7 + 3) % 409).as("dst"))
        .unionByName(d.select(col("doc_id").as("src"),
          expr("(doc_id div 10) * 10").as("dst")))
      val labels = operators.LabelPropagation.propagate(edges, iterations = 5)
      operators.GraphStats.modularity(edges, labels)
    }),

    // Population Stability Index on the pinned l_extendedprice grid:
    // even-vs-odd orderkey halves (same distribution → psi ≈ 0) and
    // even-vs-10%-shifted (drift → psi ≫ 0). Per-bucket terms
    // micro-quantized before the exact integer total.
    "k_psi" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val a = li.where(col("l_orderkey") % 2 === 0)
      val b = li.where(col("l_orderkey") % 2 === 1)
      val shifted = a.withColumn("l_extendedprice",
        col("l_extendedprice") * 1.1)
      operators.Drift.psiTotal(operators.Drift.psi(a, b,
          col("l_extendedprice"), 900.0, 105000.0, 64))
        .select(lit("split").as("case"), col("psi"))
        .unionByName(
          operators.Drift.psiTotal(operators.Drift.psi(a, shifted,
              col("l_extendedprice"), 900.0, 105000.0, 64))
            .select(lit("shifted").as("case"), col("psi")))
    }),

    // Markov event-type transition matrix: per-user lag bigrams →
    // types² census → exact-count probabilities. Full replay.
    "x_transitions" -> ((s, dir) =>
      operators.EventAnalytics.typeTransitions(Tables.events(s, dir))),

    // Two-proportion A/B z-test: md5-parity arms, conversion = a big
    // click (value > 150 — ~50% of users at sf0.01, so the variance is
    // real; plain "any click" converts EVERYONE and degenerates se to
    // 0), pooled z from exact integer counts — one fixed double chain.
    "x_ab_test" -> ((s, dir) =>
      operators.EventAnalytics.abTest(Tables.events(s, dir),
        col("event_type") === "click" && col("value") > 150.0)),

    // Seasonal-naive anomalies: daily counts per type vs the same
    // weekday last week, robust median/MAD band at 3 MADs, integer
    // cross-multiplied verdicts.
    "x_seasonal_anomaly" -> ((s, dir) =>
      operators.SeasonalAnomaly.detect(Tables.events(s, dir),
        group = col("event_type"),
        bucket = expr("unix_micros(ts) div 86400000000"),
        value = lit(1L), period = 7, kMicro = 3000000L)),

    // Cross-correlation lead-lag: each event type's daily counts vs
    // the 'view' reference over lags -5..5; exact long dot products,
    // smallest-shift tie-break, zero-overlap lags densified in.
    "x_xcorr" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      operators.CrossCorrelation.bestLag(ev,
        group = col("event_type"),
        bucket = expr("unix_micros(ts) div 86400000000"),
        value = lit(1L),
        ref = ev.where(col("event_type") === "view"),
        refBucket = expr("unix_micros(ts) div 86400000000"),
        refValue = lit(1L), maxLag = 5)
    }),

    // RBO@10 (p=0.9) between two per-source document rankings: exact
    // chars-desc vs decade-coarsened chars — high-but-imperfect overlap
    // exercises the whole depth-weight curve. Rankings come from the
    // row_number spelling, so they ride the GroupedTopK rewrite.
    "r_rbo" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      def topk(order: Column*) = {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(order: _*)
        d.select(col("source").as("query"), col("doc_id").as("item"),
            row_number().over(w).as("rank"))
          .where(col("rank") <= 10)
      }
      operators.Rbo.rboAtK(
        topk(col("n_chars").desc, col("doc_id").asc),
        topk(expr("n_chars div 10").desc, col("doc_id").asc),
        k = 10, pMicro = 900000L)
    }),

    // Rank-2 ALS over the customer×part interaction matrix (ratings =
    // order-line counts on a 101-item catalog): item factors seed from
    // the exact md5 integer draw, then 3 alternating ridge rounds of
    // exact-integer normal equations + one double Cramer chain per
    // entity, snapped to micro — the oracle replays every half-round.
    "r_als_factors" -> ((s, dir) => {
      val (uf, itf) = operators.Als.factorize(alsRatings(s, dir), rounds = 3)
      uf.select(lit("u").as("side"), col("id"), col("f1").as("f1_micro"),
          col("f2").as("f2_micro"))
        .unionByName(itf.select(lit("i").as("side"), col("id"),
          col("f1").as("f1_micro"), col("f2").as("f2_micro")))
    }),

    // ALS serving path: top-3 UNRATED items per user by the exact
    // integer micro² dot product (ties on item id) — broadcast item
    // catalog, rated-pair anti-join, GroupedTopK-rewritable rank.
    "r_als_recommend" -> ((s, dir) => {
      val ratings = alsRatings(s, dir)
      val (uf, itf) = operators.Als.factorize(ratings, rounds = 3)
      operators.Als.recommend(ratings, uf, itf, k = 3)
    }),

    // Level-wise binned CART: predict "document mentions 'join'" from
    // one predictive feature (the 'jo' bigram length-diff), one
    // correlated ('e' count), one weak (n_chars), one noise
    // (doc_id mod 97). Each level is ONE (node × feature × bin) census
    // shuffle; the driver folds the bounded census into argmin splits;
    // the oracle replays every level's histogram, Gini argmin, gain
    // test, and reassignment.
    "v_tree_train" -> ((s, dir) => {
      val d = treeDocs(s, dir)
      val tree = operators.DecisionTree.train(d, label = treeLabel,
        features = treeFeatures, depth = 3, bins = 16, minLeaf = 10)
      operators.DecisionTree.treeFrame(s, tree)
        .select(col("node"), col("kind"), col("feature"), col("bin"),
          col("n"), col("pos"))
    }),

    // CART serving path: the codegen'd nested-CASE leaf router over the
    // binned features (shuffle-free scan), then a per-leaf label-rate
    // census — the "which quality stratum is this document in" shape.
    "v_tree_leaf_rate" -> ((s, dir) => {
      val d = treeDocs(s, dir)
      val tree = operators.DecisionTree.train(d, label = treeLabel,
        features = treeFeatures, depth = 3, bins = 16, minLeaf = 10)
      operators.DecisionTree.score(d, treeFeatures, tree, bins = 16)
        .groupBy("leaf")
        .agg(count(lit(1)).as("n"),
          sum(treeLabel.cast("boolean").cast("long")).as("pos"))
        .select(col("leaf"), col("n"), col("pos"),
          round(col("pos").cast("double") * 1e6 / col("n")).cast("long")
            .as("rate_micro"))
    }),

    // The whole-partition window spelling ("attach the per-user
    // statistic to every row"), kept AS the window idiom on purpose:
    // RewriteWholePartitionWindow turns it into a census + null-safe
    // join (no sort, no partition buffering) — the oracle pins the
    // values, PlanSpec pins the plan, AbBench A/Bs the kill switch.
    "w_window_rewrite" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      Tables.events(s, dir)
        .select(col("user_id"), col("event_type"),
          count(lit(1)).over(w).as("user_events"),
          sum(length(col("event_type")).cast("long")).over(w).as("sum_len"),
          max(col("event_type")).over(w).as("max_type"),
          size(collect_set(col("event_type")).over(w)).cast("long")
            .as("n_types"))
        .where(col("event_type") === "view")
        .groupBy("user_events", "sum_len", "max_type", "n_types")
        .agg(count(lit(1)).as("n_view_rows"))
    }),

    // Exact equal-frequency bin edges for the 4 raw tree features:
    // edge_j = the smallest value whose cumulative census count reaches
    // rank ceil(j*n/bins) — integer arithmetic, replayed from the same
    // value census by the oracle.
    "v_quantile_bins" -> ((s, dir) => {
      val d = treeDocs(s, dir)
      operators.QuantileBins.edgesFrame(s,
        operators.QuantileBins.fit(d, quantileRawFeatures, bins = 16))
    }),

    // CART over QUANTILE-binned features (the adaptive-bin production
    // shape: equal-frequency bins give every threshold real mass on the
    // long-tailed n_chars): same level-replay machinery, fixture now
    // derives the bins from the replayed edges.
    "v_tree_quantile" -> ((s, dir) => {
      val d = treeDocs(s, dir)
      val edges = operators.QuantileBins.fit(d, quantileRawFeatures, bins = 16)
      val binned = operators.QuantileBins.transform(d, quantileRawFeatures, edges)
      val feats = (0 until 4).map(i => (col(s"_qb$i"), 0L, 16L))
      val tree = operators.DecisionTree.train(binned, treeLabel, feats,
        depth = 3, bins = 16, minLeaf = 10)
      operators.DecisionTree.treeFrame(s, tree)
        .select(col("node"), col("kind"), col("feature"), col("bin"),
          col("n"), col("pos"))
    }),

    // Random forest on the tree fixture: 3 members, each on an md5
    // Bernoulli row bag (70%) and a 2-of-4 md5-ranked feature subset —
    // every member's level replay, the full-corpus leaf routing, and
    // the vote/OOB tallies mirror in SQL.
    "v_forest_train" -> ((s, dir) => {
      val d = treeDocs(s, dir)
      val forest = operators.Forest.train(d, treeLabel, treeFeatures,
        col("doc_id"), nTrees = 3, perTree = 2, depth = 2, bins = 16,
        minLeaf = 10, bagMicro = 700000L)
      operators.Forest.forestFrame(s, forest)
    }),

    // Forest serving + the no-holdout validation estimate: majority
    // vote over all members and the OOB vote over members that never
    // saw the row (null when the row was in every bag).
    "v_forest_vote" -> ((s, dir) => {
      val d = treeDocs(s, dir)
      val forest = operators.Forest.train(d, treeLabel, treeFeatures,
        col("doc_id"), nTrees = 3, perTree = 2, depth = 2, bins = 16,
        minLeaf = 10, bagMicro = 700000L)
      operators.Forest.vote(d, treeFeatures, forest, col("doc_id"),
          bins = 16, bagMicro = 700000L)
        .select(col("doc_id"), col("votes_pos"), col("pred"),
          col("oob_votes"), col("oob_pos"), col("oob_pred"),
          treeLabel.cast("boolean").cast("long").as("y"))
    }),

    // β-form AdaBoost over decision stumps on the tree fixture: the
    // whole 5-round training loop is exact integer arithmetic (micro
    // weight censuses, integer (E, f, t) argmin, integer half-up β,
    // clamped multiplicative update) — replayed verbatim in SQL.
    "x_boost_train" -> ((s, dir) => {
      val d = treeDocs(s, dir)
      val stumps = operators.Boost.train(d, treeLabel, treeFeatures,
        rounds = 5, bins = 16)
      operators.Boost.stumpFrame(s, stumps)
        .select(col("round").cast("long").as("round"), col("feature"),
          col("bin"), col("cl"), col("cr"), col("errW").as("err_w"),
          col("totW").as("tot_w"), col("betaMicro").as("beta_micro"))
    }),

    // Boost serving: per-document ensemble margin Σ ±α in exact micro
    // units (α once per round from the integer β, micro-rounded libm) —
    // a codegen'd shuffle-free CASE-sum scan.
    "x_boost_margin" -> ((s, dir) => {
      val d = treeDocs(s, dir)
      val stumps = operators.Boost.train(d, treeLabel, treeFeatures,
        rounds = 5, bins = 16)
      operators.Boost.margin(d, treeFeatures, stumps, bins = 16)
        .select(col("doc_id"), col("margin_micro"), col("pred"))
    }),

    // DTW of each event type's daily-volume curve against the 'view'
    // reference series (band 3): exact long min-plus DP in one native
    // codegen'd expression, series densified to the reference grid.
    "x_dtw" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      operators.Dtw.toReference(ev,
        group = col("event_type"),
        bucket = expr("unix_micros(ts) div 86400000000"),
        value = lit(1L),
        ref = ev.where(col("event_type") === "view"),
        refBucket = expr("unix_micros(ts) div 86400000000"),
        refValue = lit(1L), band = 3)
    }),

    // Association rules over user-day baskets of event types: directed
    // a->b rules with support/confidence/lift/leverage/conviction,
    // thresholds as exact integer cross-multiplications.
    "x_assoc_rules" -> ((s, dir) =>
      operators.AssociationRules.rules(Tables.events(s, dir),
        basket = concat_ws(":", col("user_id"),
          expr("unix_micros(ts) div 86400000000")),
        item = col("event_type"),
        minSupportMicro = 140000L, minConfidenceMicro = 360000L)),

    // Anytime-valid e-process monitor: per-arm hourly census, log-E as
    // integer-weighted success/failure counts (micro-quantized log-LR
    // constants), sticky rejection at ln(1/alpha). True conversion rate
    // ~0.40 vs H0 p<=0.35, so the monitor genuinely crosses.
    "x_evalue" -> ((s, dir) =>
      operators.Sequential.bernoulliEValue(Tables.events(s, dir),
        arm = col("user_id") % 2,
        bucket = expr("unix_micros(ts) div 3600000000"),
        success = col("event_type").isin("click", "purchase"),
        p0 = 0.35, p1 = 0.42, alpha = 0.05)),

    // Off-policy evaluation (IPS/SNIPS/ESS) on an engineered logged-
    // bandit view of events: logged action = event_type, deterministic
    // propensities from the user ladder, candidate policy = click for
    // even users / view for odd. Integer round-half-up weights, exact
    // decimal accumulations, three rounded ratio chains.
    "x_offpolicy" -> ((s, dir) => {
      val logs = Tables.events(s, dir).select(
        (col("event_type") === when(col("user_id") % 2 === 0, lit("click"))
          .otherwise(lit("view"))).as("matched"),
        (lit(200000L) + (col("user_id") % 5) * 100000L).as("propensity_micro"),
        round(col("value") * 1e6).cast("long").as("reward_micro"))
      operators.PolicyEval.offPolicyValue(logs)
    }),

    // Seasonal-naive forecast eval (MASE) on the hourly event-count
    // series: |y_t − y_{t−24}| vs |y_t − y_{t−1}| error masses as exact
    // decimal sums over lag EQUI-JOINS (no global series window), one
    // rounded ratio-of-means chain.
    "x_forecast_eval" -> ((s, dir) => {
      val series = Tables.events(s, dir)
        .groupBy(expr("unix_micros(ts) div 3600000000").as("t"))
        .agg(count(lit(1)).as("y"))
      operators.Forecast.seasonalNaiveEval(series, season = 24L)
    }),

    // CUPED variance-reduced A/B on the same events: pre-period
    // covariate X = even-event value mass, experiment metric Y = odd-
    // event value mass per user (correlated through per-user rates, so
    // θ bites), user-parity arms. Exact decimal census sums, θ rounded
    // once, per-unit adjustment micro-rounded back to longs, Welch z +
    // A&S Φ — the whole chain replayed by the oracle.
    "x_cuped" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"),
        col("event_id"), round(col("value") * 1e6).cast("long").as("vm"))
      val units = ev.groupBy("user_id").agg(
          sum(when(col("event_id") % 2 === 0, col("vm")).otherwise(0L))
            .as("x_micro"),
          sum(when(col("event_id") % 2 === 1, col("vm")).otherwise(0L))
            .as("y_micro"))
        .select((col("user_id") % 2).cast("int").as("arm"),
          col("x_micro"), col("y_micro"))
      operators.Cuped.zTest(units)
    }),

    // Trailing-hour moving average per user: a RANGE (interval) window
    // frame — time-based, not row-based, so sparse/bursty users get the
    // same 1-hour semantics. Values micro-quantized to cents before the
    // frame sum (sliding-frame double accumulation order differs
    // between engines; integer cents don't), avg derived from exact
    // (sum, count).
    "x_moving_avg" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        round(col("value") * 100).cast("long").as("_cents"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts_us"))
        .rangeBetween(-3600000000L, 0L)
      ev.withColumn("n_window", count(lit(1)).over(w))
        .withColumn("sum_cents", sum(col("_cents")).over(w))
        .select(col("event_id"), col("user_id"), col("n_window"),
          round(col("sum_cents").cast("double") / col("n_window") / 100.0, 6)
            .as("avg_1h"))
    }),

    // Per-user EWMA over the event series: a RECURRENCE, not a frame
    // aggregate — α=0.3 in micro units, every step exact integer math
    // (div 1e6), so the oracle's recursive CTE replays all of it.
    "x_ewma" -> ((s, dir) =>
      operators.Smoothing.ewma(Tables.events(s, dir),
        key = col("user_id"), order = unix_micros(col("ts")),
        tie = col("event_id"), value = col("value"), alphaMicro = 300000L)
        .withColumnRenamed("o", "ts_us").withColumnRenamed("t", "event_id")),

    // Quantile normalization: per-lang exact percentile of n_chars
    // mapped onto the GLOBAL 64-bucket histogram inverse CDF — the
    // cross-group calibration step; windows partition by lang, census
    // broadcast, all arithmetic replayed.
    "t_quantile_norm" -> ((s, dir) =>
      operators.HistQuantile.normalizeBy(Tables.documents(s, dir),
        idCol = col("doc_id"), groups = Seq("lang"), value = col("n_chars"),
        lo = 0.0, hi = 640.0, buckets = 64)),

    // Homoglyph spoof detection: every 5th doc re-enters the corpus
    // with Latin aeo swapped for Cyrillic аео — invisible to exact and
    // shingle dedup, caught by the skeleton fold. The oracle replays
    // the same confusable table (interpolated from the operator).
    "t_homoglyph" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select("doc_id", "text")
      val spoofed = d.where(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          translate(col("text"), "aeo", "аео").as("text"))
      operators.Homoglyph.spoofPairs(d.unionByName(spoofed))
    }),

    // The fused uniform kernel on the SQL surface: md5_prefix60(text)
    // must equal the composed conv/substring/md5 spelling the oracle
    // uses — the SQL-function twin of the FuseMd5Uniform rewrite.
    "f_sql_md5prefix" -> ((s, dir) => {
      graft.session.GraftFunctions.register(s)
      Tables.documents(s, dir).createOrReplaceTempView("docs_md5p")
      s.sql("SELECT doc_id, md5_prefix60(coalesce(text, '')) AS u FROM docs_md5p")
    }),

    // Single change-point over the hourly event census: argmax of the
    // between-segment SSE term from exact prefix sums — one double
    // chain per split, 6dp round, split-index tie-break.
    "x_changepoint" -> ((s, dir) =>
      operators.Changepoint.bestSplit(
        operators.Changepoint.census(Tables.events(s, dir),
          expr("unix_micros(ts) div 3600000000")), minSeg = 2)),

    // Kaplan–Meier user-lifetime survival with right-censoring (last
    // event within 1 day of the horizon = still active, not churned):
    // the survival product is exact integer micro math per step, so
    // the oracle's recursive CTE replays the whole curve.
    "x_kaplan_meier" -> ((s, dir) =>
      operators.Survival.kaplanMeier(Tables.events(s, dir), censorDays = 1)),

    // Corpus concentration: Gini of per-source contribution (exact
    // integer rank sums, one double chain), Shannon entropy of the
    // language mix (per-term micro rounds before the sum), and the
    // top-20 source coverage curve.
    // Benford first-digit audit over price cents: string first digit
    // (never log10), exact expected micro counts, chi2 as exact micro
    // sums over the densified 9-digit census.
    "k_benford" -> ((s, dir) =>
      operators.Benford.firstDigit(Tables.lineitem(s, dir),
        round(col("l_extendedprice") * 100))),

    // Difference-in-differences on a mid-month rollout view of events:
    // treated = odd users, post = Jan 16+; exact 2x2 decimal census,
    // Welch-form SE, A&S-Phi p.
    "x_did" -> ((s, dir) =>
      operators.Did.estimate(Tables.events(s, dir),
        treated = col("user_id") % 2 === 1,
        post = unix_micros(col("ts")) >= 1705363200000000L,
        outcome = round(col("value") * 100))),

    "k_gini" -> ((s, dir) =>
      operators.Concentration.gini(
        operators.Concentration.census(Tables.documents(s, dir), col("source")))),

    "k_entropy" -> ((s, dir) =>
      operators.Concentration.entropy(
        operators.Concentration.census(Tables.documents(s, dir), col("lang")))),

    "k_coverage" -> ((s, dir) =>
      operators.Concentration.coverage(
        operators.Concentration.census(Tables.documents(s, dir), col("source")),
        topK = 20)),

    // Top user journeys: per-user ordered event-type trigram census
    // with path shares — one lag window, types³-bounded census.
    "x_journeys" -> ((s, dir) =>
      operators.EventAnalytics.journeyNgrams(Tables.events(s, dir), n = 3)),

    // Theil–Sen robust trend over the hourly census: median of all
    // pairwise slopes (exact long deltas, one IEEE division each),
    // median intercept — the spike-immune trend next to x_changepoint.
    "x_theilsen" -> ((s, dir) =>
      operators.TimeSeriesStats.theilSen(
        operators.Changepoint.census(Tables.events(s, dir),
          expr("unix_micros(ts) div 3600000000")))),

    // Exact sample autocorrelation r_1..r_4 over the hourly census —
    // integer power sums scaled by n², ONE double division per lag.
    "x_autocorr" -> ((s, dir) =>
      operators.TimeSeriesStats.autocorrelation(
        operators.Changepoint.census(Tables.events(s, dir),
          expr("unix_micros(ts) div 3600000000")), maxLag = 4)),

    // Poisson bootstrap: 40 replicate means of the event value, weights
    // from the constant Poisson(1) ladder over md5 uniforms — exact
    // micro sums, every replicate replayed by the oracle.
    "x_bootstrap" -> ((s, dir) =>
      operators.Bootstrap.replicateMeans(Tables.fanOut(Tables.events(s, dir)),
        value = col("value"), rowKey = col("event_id"), b = 40, seed = 42L)),

    // Per-group (event-type) bootstrap replicate means — per-slice
    // error bars from the same one-scan map-side combine.
    "x_bootstrap_by" -> ((s, dir) =>
      operators.Bootstrap.replicateMeansBy(Tables.fanOut(Tables.events(s, dir)),
        group = col("event_type"), value = col("value"),
        rowKey = col("event_id"), b = 20, seed = 42L)),

    // ... and the percentile CI those replicates imply (order statistics
    // at ceil(αB)/ceil((1−α)B)) next to the full-data mean.
    "x_bootstrap_ci" -> ((s, dir) =>
      operators.Bootstrap.meanCI(Tables.fanOut(Tables.events(s, dir)),
        value = col("value"), rowKey = col("event_id"), b = 40,
        alpha = 0.025, seed = 42L)),

    // 2-D Pareto frontier over orders (maximize price cents AND recency
    // days): the census formulation (y == M(x) ∧ M(x) > P(x)) must
    // produce exactly what the oracle's independent NOT EXISTS
    // dominance scan produces.
    "x_pareto" -> ((s, dir) =>
      operators.Skyline.frontier2(Tables.orders(s, dir),
        id = col("o_orderkey"),
        x = round(col("o_totalprice") * 100).cast("long"),
        y = expr("unix_micros(o_orderdate) div 86400000000"))
        .orderBy(col("x"))),

    // GROUPING SETS with grouping() flags — the arbitrary-combination
    // generalization of the a9/a10 rollup/cube gates.
    "a18_grouping_sets" -> ((s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders_gs")
      s.sql("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               |  grouping(o_orderstatus) AS g_status,
               |  grouping(o_orderpriority) AS g_prio
               |FROM orders_gs
               |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
               |  (o_orderstatus, o_orderpriority))""".stripMargin)
    }),

    // Window-volume anomaly detection: (window, type) counts z-scored
    // against the type's mean from EXACT integer sums (Σn, Σn²) so the
    // oracle replays every z bit-for-bit; |n − mean| > 2σ flags.
    "x_rate_anomaly" -> ((s, dir) =>
      operators.EventAnalytics.rateAnomalies(Tables.events(s, dir))),

    // Triangle counting + local clustering coefficient via the
    // degree-ordered node-iterator: oriented wedges from the
    // lowest-degree corner only (hub never pivots), one closing-edge
    // equi-join. Pure integer joins — full oracle replay.
    // DeepWalk-style walk corpus on the pseudo graph: 2 walks x 4 steps
    // per node, md5-uniform out-edge choices, sinks stop early. Feeds
    // SkipGram (walks are the sentences).
    "g_walks" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val edges = d.select(col("doc_id").as("src"),
          ((col("doc_id") * 7 + 3) % 409).as("dst"))
        .unionByName(d.select(col("doc_id").as("src"),
          expr("(doc_id div 10) * 10").as("dst")))
      operators.RandomWalk.walks(edges, walksPerNode = 2, length = 4,
        seed = 42L)
    }),

    // Link-prediction evaluation, the standard held-out-edge protocol:
    // hold out every (a+b)%5 edge, score train non-edges with
    // Adamic-Adar, AUC of the score separating held-out edges from the
    // other candidates (missed positives enter at score 0).
    "g_linkpred_auc" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      // a 4th path power: real transitivity, so common-neighbor
      // scores genuinely predict held-out edges (measured AUC ~0.94)
      val mx = d.agg(max(col("doc_id"))).head().getLong(0)
      val raw = (1 to 4).map(k =>
          d.select(col("doc_id").as("src"),
            (col("doc_id") + k).as("dst")))
        .reduce(_ unionByName _)
        .where(col("dst") <= lit(mx))
      val canon = raw.where(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct()
      val test = canon.where((col("a") + col("b")) % 5 === 0)
      val train = canon.where((col("a") + col("b")) % 5 =!= 0)
      val cand = operators.LinkPrediction.adamicAdar(
          train.select(col("a").as("src"), col("b").as("dst")))
        .select(col("a"), col("b"), col("aa_micro"))
      val labeled = cand
        .join(test.withColumn("_t", lit(1)), Seq("a", "b"), "full_outer")
        .select(coalesce(col("aa_micro"), lit(0L)).as("score_micro"),
          col("_t").isNotNull.as("label"))
      operators.Evaluation.rocAuc(labeled)
    }),

    // The composed DeepWalk pipeline: walk corpus -> walk sentences ->
    // GloVe 1/d-weighted co-occurrence census — the node-embedding
    // training input, end to end.
    "g_deepwalk_pairs" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val edges = d.select(col("doc_id").as("src"),
          ((col("doc_id") * 7 + 3) % 409).as("dst"))
        .unionByName(d.select(col("doc_id").as("src"),
          expr("(doc_id div 10) * 10").as("dst")))
      val walks = operators.RandomWalk.walks(edges, walksPerNode = 2,
        length = 4, seed = 42L)
      val sentences = walks
        .groupBy(col("start"), col("wid"))
        .agg(array_join(
          transform(
            sort_array(collect_list(struct(col("step"), col("node")))),
            x => x.getField("node").cast("string")), " ").as("text"))
        .select((col("start") * 10 + col("wid")).as("doc_id"),
          col("text"))
      operators.SkipGram.weightedCooccurrence(sentences, window = 2)
    }),

    // Adamic-Adar link prediction on the triangle gate's pseudo graph:
    // every non-edge scored by its shared neighbors, each weighted
    // round(1e6/ln(degree)) at the degree census.
    "g_adamic_adar" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val edges = d.select(col("doc_id").as("src"),
          ((col("doc_id") * 7 + 3) % 409).as("dst"))
        .unionByName(d.select(col("doc_id").as("src"),
          expr("(doc_id div 10) * 10").as("dst")))
      operators.LinkPrediction.adamicAdar(edges)
    }),

    "g_triangles" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val edges = d.select(col("doc_id").as("src"),
          ((col("doc_id") * 7 + 3) % 409).as("dst"))
        .unionByName(d.select(col("doc_id").as("src"),
          expr("(doc_id div 10) * 10").as("dst")))
      operators.Triangles.count(edges)
    }),

    // Session co-visitation matrix: gap-sessionized events, distinct
    // (session, item), bounded within-session pairing (marathon
    // sessions dropped before the self-join), top-5 co-items per item.
    // The oracle replays sessionization, the cap, the census, and the
    // ranking.
    "x_covisitation" -> ((s, dir) =>
      operators.Covisitation.topCovisited(Tables.events(s, dir), k = 5)),

    // Nearest-centroid (Rocchio) classification: per-label centroids
    // from MICRO-QUANTIZED sums over the even-id half (float sums are
    // association-order-dependent, integer micro sums are not), odd-id
    // half classified by argmin. The corpus labels are random, so no
    // accuracy floor here (measured 8% ≈ chance — a property of the
    // synthetic data); the SEPARABLE-data behavior is pinned in
    // ClusteringSpec with planted offsets. Exact replay is the gate.
    "e_nearest_centroid" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cents = Clustering.labelCentroids(emb.where(col("vec_id") % 2 === 0))
      Clustering.nearestCentroid(emb.where(col("vec_id") % 2 === 1), cents)
    }),

    // Simplified silhouette vs the 16 fixed centroids: per-point
    // (d₂−d₁)/max micro-quantized before the cluster mean (exact
    // integer rollup), one cluster-grain partial agg.
    "e_silhouette" -> ((s, dir) =>
      Clustering.silhouette(Tables.embeddings(s, dir),
        fixedCentroids(s, dir, 16))),

    // Degree assortativity of the doc graph: one exact-integer-sum
    // Pearson over endpoint degrees — the link-farm smell test in a
    // single replayed row.
    "g_assortativity" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val edges = d.select(col("doc_id").as("src"),
          ((col("doc_id") * 7 + 3) % 409).as("dst"))
        .unionByName(d.select(col("doc_id").as("src"),
          expr("(doc_id div 10) * 10").as("dst")))
      operators.GraphStats.assortativity(edges)
    }),

    // Winsorization: clip l_extendedprice to the [p05, p95] band from
    // the same histogram census as k_hist_quantile — rows kept, tails
    // clipped. Oracle replays census, both quantile interpolations, and
    // the clip.
    "k_winsorize" -> ((s, dir) =>
      operators.Profile.winsorize(
        Tables.lineitem(s, dir), "l_extendedprice",
        lo = 900.0, hi = 105000.0, buckets = 64)
        .select("l_orderkey", "l_partkey", "l_suppkey", "clipped",
          "clip_lo", "clip_hi")),

    // Referential integrity as an external gate: lineitem orderkeys
    // absent from orders (none in conforming TPC-H data — the zero is
    // the assertion) plus a planted-orphan twin frame proving the
    // check fires.
    "v_orphans" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val ord = Tables.orders(s, dir)
      val clean = operators.Constraints.orphans(li, "l_orderkey", ord, "o_orderkey")
        .select(lit("clean").as("case"), col("n_orphans"))
      val planted = operators.Constraints.orphans(
        li.select(col("l_orderkey"))
          .unionByName(li.where(col("l_orderkey") % 1000 === 0)
            .select((col("l_orderkey") + lit(2000000000L)).as("l_orderkey"))),
        "l_orderkey", ord, "o_orderkey")
        .select(lit("planted").as("case"), col("n_orphans"))
      clean.unionByName(planted)
    }),

    // 3-core of the doc graph: synchronous peel to the (unique) fixed
    // point; the in-gate require pins convergence, the oracle unrolls
    // 20 peel rounds — both land on the same canonical core.
    "g_kcore" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val edges = d.select(col("doc_id").as("src"),
          ((col("doc_id") * 7 + 3) % 409).as("dst"))
        .unionByName(d.select(col("doc_id").as("src"),
          expr("(doc_id div 10) * 10").as("dst")))
      operators.KCore.kCore(edges, k = 3)
    }),

    // Personalized PageRank from the node % 50 seed set: teleport mass
    // lands only on seeds — rank relative to the seed neighborhood, the
    // trusted-host crawl prioritizer. All 10 rounds replayed.
    "g_ppr" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val edges = d.select(col("doc_id").as("src"),
          ((col("doc_id") * 7 + 3) % 409).as("dst"))
        .unionByName(d.select(col("doc_id").as("src"),
          expr("(doc_id div 10) * 10").as("dst")))
      val nodes = edges.select(col("src").as("node"))
        .unionByName(edges.select(col("dst").as("node"))).distinct()
      operators.PageRank.personalized(edges,
        nodes.where(col("node") % 50 === 0), iterations = 10)
    }),

    // Flesch reading-ease: the classic readability signal, vowel-group
    // syllable heuristic so the oracle replays it exactly. Shuffle-free
    // projection.
    "t_readability" -> ((s, dir) =>
      TextAnalysis.readability(Tables.fanOut(Tables.documents(s, dir)))),

    // Declarative constraint suite: 7 checks over documents in ONE
    // aggregation pass (completeness, uniqueness, bounds, set/pattern
    // membership), reported one row per check. The oracle recomputes
    // every metric + pass verdict independently.
    "v_constraints" -> ((s, dir) => {
      import operators.Constraints._
      validate(Tables.documents(s, dir), Seq(
        Complete("text", 0.95),
        Complete("lang", 1.0),
        Unique("doc_id", 1.0),
        MinValue("n_chars", 0.0),
        MaxValue("n_chars", 10000.0),
        InSet("lang", Seq("en", "de", "fr", "es", "zh"), 1.0),
        Matches("source", "^src[0-9]+$", 1.0),
        // doc_id → lang holds (key determines everything); source →
        // lang deliberately fails (sources span languages)
        FunctionalDep("doc_id", "lang", 1.0),
        FunctionalDep("source", "lang", 1.0)))
    }),

    // IPF raking: reweight the (lang, source) cell census so BOTH
    // marginals go uniform simultaneously — 3 alternating-scaling
    // rounds, micro-unit weights, one rounded double chain per cell per
    // half-round, so the oracle replays every half-round exactly.
    "x_ipf_raking" -> ((s, dir) =>
      operators.Raking.fit(
        operators.Raking.cells(Tables.documents(s, dir), "lang", "source"),
        iterations = 3)),

    // TextRank corpus keywords: PageRank over the adjacent-token
    // co-occurrence graph (length ≥ 4 content-word filter, window 2,
    // symmetrized distinct edges). Same micro-quantized rounds as
    // g_pagerank, so the oracle replays graph construction AND all 10
    // rounds, then the top-20 TakeOrdered ranking.
    "t_textrank" -> ((s, dir) =>
      operators.TextRank.keywords(Tables.fanOut(Tables.documents(s, dir)), k = 20)),

    // Per-document TextRank (the original per-doc formulation): grouped
    // PageRank with doc_id in every key — ALL documents' graphs rank in
    // one job. 5 rounds replayed per (doc, term); top-5 per doc.
    "t_textrank_doc" -> ((s, dir) =>
      operators.TextRank.keywordsPerDoc(
        Tables.documents(s, dir).where(col("doc_id") % 20 === 0), k = 5)),

    // Skip-gram pairs + deterministic negative sampling (window 2, k=2
    // negatives per pair drawn by md5-prefix hash over the vocabulary
    // id space) — the word2vec data-prep stage, fully replayed: token
    // positions, both pair directions, the vocabulary rank, and every
    // negative draw.
    "t_skipgram" -> ((s, dir) => {
      val sub = Tables.documents(s, dir).where(col("doc_id") % 10 === 0)
      val vocab = Salience.vocabulary(sub, minCount = 2)
      operators.SkipGram.withNegatives(sub, vocab, window = 2, k = 2)
    }),

    // Bucketed range join: events against 30-minute per-user windows
    // (every 7th user) WITHOUT a user equi-key — pure containment. The
    // bucket-explode turns it into a hash join (plan-pinned no-cartesian);
    // integer-only aggregates keep the gate hash-exact.
    "j11_range_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("p_us"))
      val iv = ev.groupBy(col("user_id").as("iv_user"))
        .agg(min(col("p_us")).as("start_us"))
        .where(col("iv_user") % 7 === 0)
        .withColumn("end_us", col("start_us") + lit(1800000000L))
        .select("iv_user", "start_us", "end_us")
      operators.RangeJoin.bucketed(ev, iv, "p_us", "start_us", "end_us",
          bucketWidth = 600000000L)
        .groupBy("iv_user", "start_us")
        .agg(count(lit(1)).as("n_events"),
          min(col("event_id")).as("min_event"),
          max(col("event_id")).as("max_event"))
    }),

    // The SAME containment join spelled the naive way every user writes
    // it (pure theta join, no equi key) — driven end-to-end through the
    // InferBucketedRangeJoin rule: conf scoped by eager materialization,
    // rewrite pinned by the _graft_bkt attrs in the executed plan.
    "j13_rangejoin_rewrite" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("p_us"))
      val iv = ev.groupBy(col("user_id").as("iv_user"))
        .agg(min(col("p_us")).as("start_us"))
        .where(col("iv_user") % 7 === 0)
        .withColumn("end_us", col("start_us") + lit(1800000000L))
        .select("iv_user", "start_us", "end_us")
      // respect an externally-set width (AbBench's rangejoin_off=0
      // variant times the nested-loop path through this same gate)
      val pre = s.conf.getOption("spark.graft.rangejoin.bucketWidth")
      if (pre.isEmpty)
        s.conf.set("spark.graft.rangejoin.bucketWidth", "600000000")
      try {
        val base = ev.join(iv,
            col("p_us") >= col("start_us") && col("p_us") < col("end_us"))
          .groupBy("iv_user", "start_us")
          .agg(count(lit(1)).as("n_events"),
            min(col("event_id")).as("min_event"),
            max(col("event_id")).as("max_event"))
        if (s.conf.get("spark.graft.rangejoin.bucketWidth").toLong > 0) {
          val plan = base.queryExecution.executedPlan.toString
          require(plan.contains("_graft_bkt"),
            s"range-join rewrite did not fire:\n$plan")
          // a BNLJ is allowed ONLY as the explode-cap fallback branch
          // (maxBuckets routing — a Union sibling of the bucketed
          // join, empty here since every interval spans 3 buckets and
          // AQE prunes the empty broadcast side at runtime); a BNLJ
          // WITHOUT the Union means the rewrite itself regressed
          require(!plan.contains("BroadcastNestedLoopJoin")
              || plan.contains("Union"),
            s"rewrite left an unguarded nested-loop join in the plan:\n$plan")
        }
        base.localCheckpoint() // materialize while the rule is active
      } finally {
        if (pre.isEmpty) s.conf.unset("spark.graft.rangejoin.bucketWidth")
      }
    }),

    // WARC container parse on REAL bytes (the Common Crawl ingestion
    // path): every document becomes a 2-record WARC blob (warcinfo +
    // resource) and the parser genuinely walks headers/Content-Length/
    // terminators; the oracle predicts every parsed field from the
    // generation formulas (the m_decode_features round-trip pattern).
    "s5_warc_source" -> ((s, dir) =>
      operators.Warc.parseRecords(
          operators.Warc.syntheticWarcMedia(Tables.documents(s, dir)))
        .select(col("media_id"), col("rec_idx"), col("warc_type"),
          col("target_uri"), col("content_length"),
          md5(col("body")).as("body_md5"))),

    // BPE tokenizer training, 20 merge rounds: pure integer census
    // arithmetic, so the oracle replays the ENTIRE training loop as a
    // generated per-round CTE chain — pair census, argmax (count desc,
    // pair asc), one-pass merge application.
    "t_bpe_train" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val r = operators.Bpe.train(d, nMerges = 20)
      operators.Bpe.mergeTable(r, d)
    }),

    // Subword census of the corpus under the 20 learned merges — the
    // new vocabulary's token frequencies (oracle: same chain, final
    // segmentation aggregated).
    "t_bpe_encode" -> ((s, dir) =>
      operators.Bpe.subwordCensus(
        operators.Bpe.train(Tables.documents(s, dir), nMerges = 20))),

    // Tokenizer SERVING: train on the even docs, encode the UNSEEN odd
    // docs — merges become plan literals, unseen words fall back to
    // characters; per-doc segmentation digest pins the whole token
    // stream (oracle replays training on evens, then the 20-round
    // encode fold on the odd docs' vocabulary).
    "t_bpe_apply" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val r = operators.Bpe.train(d.where(col("doc_id") % 2 === 0),
        nMerges = 20)
      operators.Bpe.encode(r.merges, d.where(col("doc_id") % 2 === 1))
    }),

    // BYTE-level BPE (round-6 verdict #6): GPT-2-style byte↔unicode
    // table, merges over UTF-8 BYTE symbols — the production-tokenizer
    // behavior that diverges from char-level on any non-ASCII corpus.
    // Fixture: a→ä, o→ö (each 2 UTF-8 bytes), so byte- and char-level
    // genuinely learn different merges (spec-pinned divergence). The
    // oracle replays the byte symbolization through the SAME
    // interpolated 256-entry table and all 20 training rounds.
    "t_bpe_bytes" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), translate(col("text"), "ao", "äö").as("text"))
      val r = operators.Bpe.train(d, nMerges = 20, byteLevel = true)
      operators.Bpe.mergeTable(r, d)
    }),

    // Byte-level SERVING: train on even docs, encode the unseen odd
    // docs byte-level — per-doc segmentation digests pin the whole
    // byte-symbol token stream (oracle replays train + the 20-round
    // encode fold over the odd docs' vocabulary, byte-symbolized).
    "t_bpe_bytes_apply" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), translate(col("text"), "ao", "äö").as("text"))
      val r = operators.Bpe.train(d.where(col("doc_id") % 2 === 0),
        nMerges = 20, byteLevel = true)
      operators.Bpe.encode(r.merges, d.where(col("doc_id") % 2 === 1),
        byteLevel = true)
    }),

    // Tokenizer fertility per language on the unseen-docs serving fold:
    // subwords/word from the same trained merges — the vocabulary
    // health metric (oracle extends the serving replay with the group
    // rollup).
    "t_bpe_fertility" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val r = operators.Bpe.train(d.where(col("doc_id") % 2 === 0),
        nMerges = 20)
      operators.Bpe.fertility(
        operators.Bpe.encode(r.merges, d.where(col("doc_id") % 2 === 1)),
        d.where(col("doc_id") % 2 === 1))
    }),

    // WordPiece greedy longest-match serving: vocabulary = substring
    // census of the EVEN docs (init vs ## continuation pieces, chars
    // always kept), served on the distinct words of the UNSEEN odd
    // docs. The oracle rebuilds the census and replays the greedy walk
    // as a recursive CTE over precomputed per-(word,pos) longest
    // matches; words with characters the train corpus never saw
    // collapse to [UNK] on both engines.
    "t_wordpiece" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val m = WordPiece.model(
        WordPiece.vocabulary(d.where(col("doc_id") % 2 === 0)))
      val serveWords = d.where(col("doc_id") % 2 === 1)
        .select(explode(TextAnalysis.tokens(
          TextAnalysis.normalized(col("text")))).as("word"))
        .where(col("word") =!= "").distinct()
      WordPiece.encodeWords(serveWords, m)
    }),

    // Unigram-LM (SentencePiece-style) tokenizer: ONE deterministic EM
    // round from the seed substring census, then Viterbi-best serving
    // under the re-estimated micro-log scores. The oracle replays the
    // censuses, BOTH Viterbi passes (forward DP unrolled per position,
    // argmax tie rule total-desc/length-desc), the backpointer walks,
    // and the add-one M-step. maxWordLen=12 bounds the DP unroll — the
    // SentencePiece max-length guard, applied identically on both sides.
    "t_unigram_lm" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val m = UnigramLm.train(d, rounds = 1, maxWordLen = 12)
      val words = operators.Bpe.wordCensus(d)
        .where(length(col("word")) <= 12).select("word")
      UnigramLm.segmentWords(words, m)
    }),

    // Doc-grain WordPiece rollup on the same split: the greedy walk
    // runs once per distinct word; the token-grain join back only
    // carries (word -> n_pieces, unk) pairs.
    "t_wordpiece_encode" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val m = WordPiece.model(
        WordPiece.vocabulary(d.where(col("doc_id") % 2 === 0)))
      WordPiece.encode(d.where(col("doc_id") % 2 === 1), m)
    }),

    // PQ encode (m=8 subspaces × 16 seed centroids from the fixed-
    // centroid idiom): per-subspace argmin reuses the e_kmeans_assign
    // kernel, so every code replays bit-identically; portable scalars.
    "e_pq_encode" -> ((s, dir) => {
      val model = operators.ProductQuantizer.seedModel(
        fixedCentroids(s, dir, 16), m = 8)
      operators.ProductQuantizer.encode(Tables.embeddings(s, dir), model)
        .select(col("vec_id"),
          md5(array_join(col("codes"), ",").cast("binary")).as("chash"),
          aggregate(col("codes"), lit(0L), (a, x) => a + x).as("csum"),
          array_min(col("codes")).as("cmin"),
          array_max(col("codes")).as("cmax"))
    }),

    // PQ asymmetric-distance top-10: LUT entries micro-fixed before the
    // m-term integer sum — the oracle replays encoding, LUT, and ranking.
    "e_pq_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val model = operators.ProductQuantizer.seedModel(
        fixedCentroids(s, dir, 16), m = 8)
      operators.ProductQuantizer.adcTopK(emb,
        emb.where(col("vec_id") % 83 === 0), model, k = 10)
    }),

    // IVF-PQ with RESIDUAL encoding (the faithful FAISS composition):
    // coarse lists from the 8 fixed centroids, PQ codebooks seeded from
    // RESIDUAL vectors (seed − its nearest coarse centroid — codebooks
    // centered where residuals live), corpus codes quantize v − c_list,
    // each query builds one LUT per probed list from q − c_list, and the
    // ADC join keys on (list, j, code). Oracle replays assignment,
    // residuals, residual codebook, probes, per-list LUTs, and ranking.
    "e_ivfpq_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cents8 = fixedCentroids(s, dir, 8)
      // seed pool 8..23: the coarse centroids' own residuals are zero
      // vectors, so seeding from vec_id < 16 would waste half the codebook
      val model = operators.ProductQuantizer.seedModel(
        operators.ProductQuantizer.residualSeeds(
          fixedCentroidRange(s, dir, 8, 24), cents8), m = 8)
      operators.ProductQuantizer.ivfPqResidualTopK(emb,
        emb.where(col("vec_id") % 83 === 0),
        cents8, model, k = 10, nProbe = 3)
    }),

    // PQ quality harness on the planted corpus (cf. e_proj_recall):
    // top-10 recall of the 8-byte ADC path vs float brute force.
    // Self-asserting, rows-only by design.
    "e_pq_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
      val q = emb.where(col("vec_id") < 20)
      val planted = q
        .select(col("vec_id"), col("embedding"),
          explode(sequence(lit(1), lit(10))).as("j"))
        .select(
          (lit(3000000L) + col("vec_id") * 100 + col("j")).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            (x + sin(col("vec_id") * 7 + col("j") * 13 + i) * lit(0.02))
              .cast("float")).as("embedding"))
      val corpus = emb.unionByName(planted).cache()
      corpus.count()
      val brute = Similarity.bruteForceTopK(corpus, q, k = 10)
        .select("query_id", "neighbor_id").cache()
      brute.count()
      val model = operators.ProductQuantizer.seedModel(
        fixedCentroids(s, dir, 16), m = 8)
      val pq = operators.ProductQuantizer.adcTopK(corpus, q, model, k = 10)
      val out = q.select(col("vec_id").as("query_id"))
        .join(brute.join(pq.select("query_id", "neighbor_id"),
            Seq("query_id", "neighbor_id"), "left_semi")
          .groupBy("query_id")
          .agg((count(lit(1)) / 10.0).as("recall_pq")),
          Seq("query_id"), "left_outer")
        .na.fill(0.0, Seq("recall_pq"))
        .cache()
      val m = out.agg(avg("recall_pq")).head().getDouble(0)
      require(m >= 0.9,
        f"PQ-ADC recall regression: mean recall_pq=$m%.3f (floor 0.9)")
      out
    }),

    // Residual-IVF-PQ quality harness on the same planted corpus: top-10
    // recall of the full FAISS composition (coarse probe + residual
    // codes + per-list full-distance LUTs) vs float brute force, with
    // raw-codebook IVF-PQ recall reported alongside for the A/B read.
    // Only the absolute floor is asserted: with SEEDED (untrained)
    // codebooks on a corpus whose raw seeds are themselves corpus
    // points, the raw codebook is unusually favorable (measured 1.0),
    // so a residual≥raw require would pin an accident of the synthetic
    // data, not the operator (residual's edge appears with TRAINED
    // codebooks at real scale). Self-asserting, rows-only by design.
    "e_ivfpq_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
      val q = emb.where(col("vec_id") < 20)
      val planted = q
        .select(col("vec_id"), col("embedding"),
          explode(sequence(lit(1), lit(10))).as("j"))
        .select(
          (lit(3000000L) + col("vec_id") * 100 + col("j")).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            (x + sin(col("vec_id") * 7 + col("j") * 13 + i) * lit(0.02))
              .cast("float")).as("embedding"))
      val corpus = emb.unionByName(planted).cache()
      corpus.count()
      val brute = Similarity.bruteForceTopK(corpus, q, k = 10)
        .select("query_id", "neighbor_id").cache()
      brute.count()
      val cents8 = fixedCentroids(s, dir, 8)
      val resModel = operators.ProductQuantizer.seedModel(
        operators.ProductQuantizer.residualSeeds(
          fixedCentroidRange(s, dir, 8, 24), cents8), m = 8)
      val rawModel = operators.ProductQuantizer.seedModel(
        fixedCentroidRange(s, dir, 8, 24), m = 8)
      def recallOf(topk: DataFrame): DataFrame =
        q.select(col("vec_id").as("query_id"))
          .join(brute.join(topk.select("query_id", "neighbor_id"),
              Seq("query_id", "neighbor_id"), "left_semi")
            .groupBy("query_id")
            .agg((count(lit(1)) / 10.0).as("recall")),
            Seq("query_id"), "left_outer")
          .na.fill(0.0, Seq("recall"))
      val res = recallOf(operators.ProductQuantizer.ivfPqResidualTopK(
        corpus, q, cents8, resModel, k = 10, nProbe = 3))
        .withColumnRenamed("recall", "recall_residual")
      val raw = recallOf(operators.ProductQuantizer.ivfPqTopK(
        corpus, q, cents8, rawModel, k = 10, nProbe = 3))
        .withColumnRenamed("recall", "recall_raw")
      val out = res.join(raw, Seq("query_id")).cache()
      val mRes = out.agg(avg("recall_residual")).head().getDouble(0)
      require(mRes >= 0.85,
        f"residual IVF-PQ recall regression: $mRes%.3f (floor 0.85)")
      out
    }),

    // Seeded JL sign projection 64 → 16 dims: outputs are exact integer
    // sums of ±micro-fixed inputs, emitted as portable scalars (the
    // array-gate lesson from e_quantize_int8); the oracle rebuilds the
    // SAME md5-derived sign matrix as a VALUES table and replays every
    // coordinate integer-exactly.
    "e_rand_proj" -> ((s, dir) =>
      operators.Projection.projectSigns(
          Tables.embeddings(s, dir), outDim = 16, inDim = 64, seed = 11L)
        .select(col("vec_id"),
          md5(array_join(col("proj_micro"), ",").cast("binary")).as("phash"),
          aggregate(col("proj_micro"), lit(0L), (acc, x) => acc + x).as("psum"),
          array_min(col("proj_micro")).as("pmin"),
          array_max(col("proj_micro")).as("pmax"))),

    // JL-projection quality harness on the PLANTED corpus (the
    // e_ann_recall construction: 10 near-copies per query at noise
    // 0.02): top-10 recall of brute-force search in the 16-dim projected
    // space vs the exact 64-dim float path. Self-asserting (require
    // floor), rows-only by design. Uniform random 64-dim points have no
    // stable neighbor structure for ANY 4× compression to preserve
    // (measured 0.15 recall on the raw table) — planted true neighbors
    // are what the projection must keep, and does.
    "e_proj_recall" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
      val q = emb.where(col("vec_id") < 20)
      val planted = q
        .select(col("vec_id"), col("embedding"),
          explode(sequence(lit(1), lit(10))).as("j"))
        .select(
          (lit(2000000L) + col("vec_id") * 100 + col("j")).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            (x + sin(col("vec_id") * 7 + col("j") * 13 + i) * lit(0.02))
              .cast("float")).as("embedding"))
      val corpus = emb.unionByName(planted).cache()
      corpus.count()
      val brute = Similarity.bruteForceTopK(corpus, q, k = 10)
        .select("query_id", "neighbor_id").cache()
      brute.count()
      val proj = operators.Projection.projectedTopK(corpus, q, k = 10,
        outDim = 16, inDim = 64, seed = 11L)
      val out = q.select(col("vec_id").as("query_id"))
        .join(brute.join(proj.select("query_id", "neighbor_id"),
            Seq("query_id", "neighbor_id"), "left_semi")
          .groupBy("query_id")
          .agg((count(lit(1)) / 10.0).as("recall_proj")),
          Seq("query_id"), "left_outer")
        .na.fill(0.0, Seq("recall_proj"))
        .cache()
      val m = out.agg(avg("recall_proj")).head().getDouble(0)
      require(m >= 0.8,
        f"JL-projection recall regression: mean recall_proj=$m%.3f (floor 0.8)")
      out
    }),

    // PCA moment census: the distributed half of Pca.fit — one
    // partial-agg shuffle to d(d+1)/2 integer rows (micro-fixed, so
    // every cell is an exact association-order-free sum the oracle
    // replays bit for bit). The driver-side Jacobi eigen consumes
    // exactly this frame.
    "e_pca_cov" -> ((s, dir) =>
      Pca.momentsMicro(Tables.embeddings(s, dir).select("vec_id", "embedding"))),

    // PCA serving, FULLY oracle-replayed (round-6 verdict #4): the
    // pico-snapped Jacobi iteration is deterministic integer-grid
    // arithmetic both engines execute identically, so the DuckDB
    // oracle replays the moment census, the covariance assembly, EVERY
    // Jacobi rotation (recursive CTE), the descending-eigenvalue sort,
    // the largest-|coordinate|-positive sign convention, the whitening
    // scale, and the per-row projection — then both sides collapse to
    // an integer micro census per component. The former self-asserts
    // (PCA optimality floor; whitened variance ~1) remain as requires
    // on the driver. 16-dim slice: keeps the rotation replay tractable
    // (the operator is dimension-generic; e_pca_cov pins the full 64).
    "e_pca_project" -> ((s, dir) => {
      val embs = Tables.embeddings(s, dir)
        .select(col("vec_id"), slice(col("embedding"), 1, 16).as("embedding"))
      val k = 8
      val model = Pca.fit(embs, k)
      val momentRows = Pca.momentsMicro(embs).where(col("i") === col("j")).collect()
      val n = momentRows.head.getLong(2).toDouble
      val coordVar = momentRows.map { r =>
        (r.getLong(5) / n - math.pow(r.getLong(3) / n, 2)) / 1e12
      }.sorted.reverse.take(k).sum
      val captured = model.eigenvalues.sum
      require(captured >= coordVar - 1e-6,
        f"PCA optimality violated: top-$k PCs capture $captured%.6f < " +
          f"best-$k coordinates $coordVar%.6f")
      val out = Pca.project(embs, model, whiten = true)
        .select(posexplode(col("projected")).as(Seq("component", "x")))
        .select(col("component"), round(col("x") * 1e6).cast("long").as("xm"))
        .groupBy("component")
        .agg(count(lit(1)).as("n"), sum(col("xm")).as("s1_micro"),
          sum(col("xm") * col("xm")).as("s2_micro"))
        .withColumn("eigenvalue_nano",
          element_at(array(model.eigenvalues.map(e =>
            lit(Clustering.roundHalfAway(e * 1e9))): _*), col("component") + 1))
        .cache()
      val rows = out.collect()
      require(rows.length == k, s"expected $k components, got ${rows.length}")
      rows.foreach { r =>
        val cn = r.getLong(1).toDouble
        val mean = r.getLong(2) / cn / 1e6
        val variance = r.getLong(3) / cn / 1e12 - mean * mean
        require(math.abs(variance - 1.0) < 0.05,
          f"whitened variance must be ~1, component ${r.getInt(0)} has $variance%.4f")
      }
      out
    }),

    // Multimodal decode on REAL bytes: every document becomes a valid
    // binary PPM whose dimensions live ONLY in the payload header;
    // PpmDecoder genuinely parses them back and computes bucket-mean
    // features from the raster. Since generation is deterministic
    // (w = n%61+4, h = n%43+4, raster byte i = (id+i)%256) the oracle
    // replays width/height/f0 from the documents table alone — the gate
    // proves the parse, not just the plumbing. (FakeDecoder formats stay
    // unit-tested; codecs for jpeg/mp3 remain environment-bound stubs.)
    // binaryFile-source round trip: synthetic PPMs staged one file per
    // payload, listed + read back through Spark's binaryFile source,
    // decoded by the same real PPM decoder — width/height/f0 must equal
    // the generation-formula prediction, proving the file path carries
    // bytes unmodified. Staged under a per-SF tmp dir, idempotent.
    "s12_binaryfile" -> ((s, dir) => {
      val media = Multimodal.syntheticPpmMedia(
        Tables.documents(s, dir).where(col("doc_id") % 5 === 0))
      val stage = s"/tmp/graft-binfiles-${new java.io.File(dir).getName}"
      Multimodal.stageMediaFiles(media, stage, "ppm")
      Multimodal.decodeFeatures(
          Multimodal.fromBinaryFiles(
            graft.sources.Sources.binaryFiles(stage, "*.ppm")(s), "ppm"),
          decoder = Multimodal.PpmDecoder)
        .select(col("media_id"), col("width"), col("height"),
          round(element_at(col("features"), 1).cast("double"), 6).as("f0"))
    }),

    // Audio fingerprint: 32 sign-of-energy-delta bits over 16-sample
    // PCM frames — exact integer energies, the full bit assembly
    // replayed by the oracle from the generation formula.
    "m_audio_fp" -> ((s, dir) =>
      Multimodal.audioFingerprint(
        Multimodal.syntheticWavMedia(Tables.documents(s, dir)))),

    // ...and the near-dup pairing: originals ∪ one-sample-perturbed
    // copies (id+5000000), pigeonhole-banded Hamming ≤ 4 — the banding
    // and popcount verify replayed like m_phash_neardup. 8-sample
    // frames + a doc subset: the synthetic clips are short (≤ 13
    // frames), so fingerprint entropy is frame-bounded — the subset
    // keeps incidental cross-clip collisions from swamping the planted
    // pairs (documented data property, not an operator limit).
    "m_audio_fp_neardup" -> ((s, dir) => {
      val d = Tables.documents(s, dir).where(col("doc_id") % 5 === 0)
      Multimodal.audioNearDuplicates(
        Multimodal.syntheticWavMedia(d)
          .unionByName(Multimodal.syntheticWavMediaPerturbed(d, 5000000L)),
        maxHamming = 4, frameLen = 8)
    }),

    "m_decode_features" -> ((s, dir) =>
      Multimodal.decodeFeatures(
          Multimodal.syntheticPpmMedia(Tables.documents(s, dir)),
          decoder = Multimodal.PpmDecoder)
        .select(col("media_id"), col("width"), col("height"),
          round(element_at(col("features"), 1).cast("double"), 6).as("f0"))),

    // Real image resample over the binary column: PPM → nearest-neighbor
    // 8×6 → re-decoded; f0 (dim 1 = mean of ALL resized bytes) pins the
    // per-pixel source-index arithmetic, which the oracle replays from
    // the generation formulas.
    "m_resize" -> ((s, dir) =>
      Multimodal.decodeFeatures(
          Multimodal.resizePpm(
            Multimodal.syntheticPpmMedia(Tables.documents(s, dir)),
            outW = 8, outH = 6),
          dim = 1, decoder = Multimodal.PpmDecoder)
        .select(col("media_id"), col("width"), col("height"),
          round(element_at(col("features"), 1).cast("double"), 6).as("f0"))),

    // WAV analog of m_decode_features: real RIFF chunk-walk — width/height
    // report sample rate / channel count recovered from the fmt chunk,
    // f0 from the PCM bytes; all replayed by the oracle from the
    // generation formulas.
    "m_decode_wav" -> ((s, dir) =>
      Multimodal.decodeFeatures(
          Multimodal.syntheticWavMedia(Tables.documents(s, dir)),
          decoder = Multimodal.WavDecoder)
        .select(col("media_id"), col("width"), col("height"),
          round(element_at(col("features"), 1).cast("double"), 6).as("f0"))),

    // Frame-level audio features on the real WAV path: 16-sample frames,
    // RMS energy + zero crossings of the centered PCM — the oracle
    // replays both from the deterministic generation formula (sample i
    // of doc id = (7·id + i) mod 256).
    "m_wav_features" -> ((s, dir) =>
      Multimodal.wavFrameFeatures(
        Multimodal.syntheticWavMedia(Tables.documents(s, dir)))),

    // Frame sampling: payload chunk per frame index (oracle on counts).
    "m_frame_sample" -> ((s, dir) =>
      Multimodal.sampleFrames(Multimodal.syntheticMedia(Tables.documents(s, dir)))
        .groupBy("media_id").agg(count(lit(1)).as("n_frames"),
          sum(length(col("frame_payload"))).as("total_bytes"))),

    // Perceptual average hash over REAL decoded PPM bytes: 8x8 grid
    // sample, all-integer mean test, row-major 64-bit pack. Generation is
    // deterministic, so the oracle replays every grid sample, the total,
    // and every bit (bit 63's 2^63 weight enters as the two's-complement
    // negative term so the packed value is engine-portable BIGINT).
    "m_phash" -> ((s, dir) =>
      Multimodal.averageHash(
        Multimodal.syntheticPpmMedia(Tables.documents(s, dir)))),

    // Media near-dedup: corpus = original PPMs + perturbed copies (first
    // 3 raster bytes inverted, id offset 1e6) → averageHash → pigeonhole
    // Hamming banding (4 bands over 64 bits) + popcount verify. The
    // oracle replays both generators, both hash chains, the band values
    // (rebuilt from the bit lists — no unsigned-shift semantics to
    // match), the candidate self-join, and the |bit-a − bit-b| Hamming
    // sum.
    "m_phash_neardup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Multimodal.phashNearDuplicates(
        Multimodal.syntheticPpmMedia(docs).unionByName(
          Multimodal.syntheticPpmMediaPerturbed(docs, idOffset = 1000000L)),
        maxHamming = 3)
    }),

    // REAL-codec decode via the JDK's javax.imageio: payloads are genuine
    // PNGs (zlib-deflated, scanline-filtered) carrying the same pixel
    // formulas as the PPM gates; ImageIoDecoder must run the actual PNG
    // codec to recover them. Lossless round trip → the identical oracle
    // replays width/height/f0 — this retires the FakeDecoder stub for
    // the formats a crawl actually contains (png/jpeg/bmp/gif).
    "m_decode_png" -> ((s, dir) =>
      Multimodal.decodeFeatures(
          Multimodal.syntheticPngMedia(Tables.fanOut(Tables.documents(s, dir))),
          decoder = Multimodal.ImageIoDecoder)
        .select(col("media_id"), col("width"), col("height"),
          round(element_at(col("features"), 1).cast("double"), 6).as("f0"))),

    // Real resample fed from a real codec raster: PNG → javax.imageio
    // decode → nearest-neighbor 8×6 → PPM re-emit → re-decode. Same
    // source-index arithmetic as m_resize, so the same oracle replays it.
    "m_resize_png" -> ((s, dir) =>
      Multimodal.decodeFeatures(
          Multimodal.resizeImage(
            Multimodal.syntheticPngMedia(Tables.fanOut(Tables.documents(s, dir))),
            outW = 8, outH = 6, decoder = Multimodal.ImageIoDecoder),
          dim = 1, decoder = Multimodal.PpmDecoder)
        .select(col("media_id"), col("width"), col("height"),
          round(element_at(col("features"), 1).cast("double"), 6).as("f0"))),

    // Perceptual hash fed from a real codec raster (PNG via ImageIO):
    // identical grid/mean/pack arithmetic as m_phash, replayed by the
    // same oracle — proves aHash works on codec output, not just the
    // uncompressed in-band format.
    "m_phash_png" -> ((s, dir) =>
      Multimodal.averageHash(
        Multimodal.syntheticPngMedia(Tables.fanOut(Tables.documents(s, dir))),
        decoder = Multimodal.ImageIoDecoder)),

    // END-TO-END composed DataPipeline gate (round-4 verdict #5): ONE
    // external run of DataPipeline.prepareStaged — strip → quality →
    // boilerplate → NB filter → exact dedup → MinHash near-dedup (CC
    // closure, Portable scheme) → span removal → decontamination →
    // chunking — over an engineered corpus (originals + exact copies at
    // +1e6 + ' zzqx' near copies at +2e6 + 24-token-prefix remixes at
    // +3e6, benchmarks = 12-token prefixes of every 10th doc, NB seeds =
    // lang splits of the raw table). Gated on survivor doc ids + per-doc
    // chunk counts + per-stage corpus counts (constant columns), all
    // replayed stage for stage by one chained-CTE oracle. Pins the
    // composition ORDER externally — e.g. dedup-before-span is visible in
    // n_despan, and decon running after span is visible in which %10==0
    // survivors drop.
    "pipe_full" -> ((s, dir) => {
      // ONE kernel fan-out at the corpus root: every pipeline stage
      // below (strip/quality regex chains, NB tokenize+hash train and
      // score, shingling) is per-row kernel work that otherwise runs on
      // the union of four single-partition scans (~4 tasks at any core
      // count) — round 8's per-reference global fan-out was strictly
      // worse (4 exchanges; suite-wide overhead), this is the
      // call-site-scoped replacement
      val raw = Tables.fanOut(Tables.documents(s, dir))
      val d = raw.select("doc_id", "text")
      val kt = TextAnalysis.kernelTokens(col("text"))
      val corpus = d
        .unionByName(d.select((col("doc_id") + lit(1000000L)).as("doc_id"),
          col("text")))
        .unionByName(d.select((col("doc_id") + lit(2000000L)).as("doc_id"),
          concat(coalesce(col("text"), lit("")), lit(" zzqx")).as("text")))
        .unionByName(d.where(col("doc_id") % 10 === 3)
          .select(col("doc_id"), kt.as("toks"))
          .where(size(col("toks")) >= 30)
          .select((col("doc_id") + lit(3000000L)).as("doc_id"),
            concat(array_join(slice(col("toks"), 1, 24), " "),
              lit(" uniqmark"), col("doc_id").cast("string")).as("text")))
      val bench = d.where(col("doc_id") % 10 === 0)
        .select(col("doc_id"),
          array_join(slice(TextAnalysis.tokens(
            TextAnalysis.normalized(col("text"))), 1, 12), " ").as("text"))
      val cfg = DataPipeline.Config(
        quality = QualityFilter.Rules(
          minTokens = 25, maxTokens = 90,
          minMeanTokenLen = 3.8, maxMeanTokenLen = 5.1,
          minStopwordFrac = 0.02,
          maxDup2gramFrac = 0.08, maxDup3gramFrac = 0.05),
        spanK = 8, nearDupThreshold = 0.8,
        contaminationThreshold = 0.99, contaminationMaxDf = 0L,
        chunkTokens = 64, chunkOverlap = 16,
        boilerplateSep = " table ", boilerplateMinDocs = 20L,
        classifierMargin = 0.0, classifierBuckets = 1024,
        tokenBudget = 3000L, budgetSeed = 7L,
        scheme = graft.operators.HashScheme.Portable)
      val stages = DataPipeline.prepareStaged(corpus, Some(bench), cfg,
        seeds = Some((raw.where(col("lang") === "en"),
          raw.where(col("lang") =!= "en"))),
        // stage 7b: per-lang 3000-token budgets; copies/remixes are absent
        // from the groups frame and pool under "" by the operator contract
        budgetGroups = Some(raw.select(col("doc_id"), col("lang").as("grp"))),
        materialize = true) // 8 stage counts over one pinned chain, not 8 re-runs
      val counts = stages.map { case (n, df) => n -> df.count() }.toMap
      stages.last._2
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum("chunk_tokens").as("n_chunk_tokens"))
        .withColumn("n_cleaned", lit(counts("cleaned")))
        .withColumn("n_exact", lit(counts("exact")))
        .withColumn("n_deduped", lit(counts("deduped")))
        .withColumn("n_despan", lit(counts("despan")))
        .withColumn("n_decontaminated", lit(counts("decontaminated")))
        .withColumn("n_budgeted", lit(counts("budgeted")))
    }),

    // DAILY-LOOP external gate: one prepareIncrement run — an increment
    // of planted corpus dups (+1e6), near dups (+2e6, ' zzqx'), novel
    // reversed-token docs (+3e6) and their in-batch twins (+4e6) against
    // the raw corpus's fingerprint set + portable signature index.
    // Fully oracle-replayed since round 8 (every stage is deterministic
    // portable-scheme — the pipe_full machinery recomposed for the
    // increment-vs-index shape); the RNG-free invariants below stay as
    // in-gate contracts: survivors' fingerprints are disjoint from the
    // corpus set (spanK and chunking are off here so no later stage
    // edits fps), re-probing survivors against the index finds NO
    // near-match at the threshold, and survivors carry no duplicate
    // fingerprints (in-batch collapse).
    "pipe_increment" -> ((s, dir) => {
      // same corpus-root kernel fan-out as pipe_full: the increment
      // cleaning head and the corpus fingerprint/signature-index builds
      // are all per-row kernels over single-partition scans
      val raw = Tables.fanOut(Tables.documents(s, dir))
      val corpus = raw.select("doc_id", "text")
      val fps = corpus.select(TextAnalysis.fingerprint(col("text")).as("fp"))
        .distinct().cache()
      val idx = Dedup.buildSignatureIndex(corpus,
        scheme = graft.operators.HashScheme.Portable).cached()
      val toks = TextAnalysis.kernelTokens(col("text"))
      val novel = corpus.where(col("doc_id") % 3 === 2)
        .select(col("doc_id"), array_join(reverse(toks), " ").as("text"))
      val inc = corpus.where(col("doc_id") % 3 === 0)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"), col("text"))
        .unionByName(corpus.where(col("doc_id") % 3 === 1)
          .select((col("doc_id") + lit(2000000L)).as("doc_id"),
            concat(coalesce(col("text"), lit("")), lit(" zzqx")).as("text")))
        .unionByName(novel
          .select((col("doc_id") + lit(3000000L)).as("doc_id"), col("text")))
        .unionByName(novel
          .select((col("doc_id") + lit(4000000L)).as("doc_id"), col("text")))
      val cfg = DataPipeline.Config(
        quality = QualityFilter.Rules(
          minTokens = 25, maxTokens = 90,
          minMeanTokenLen = 3.8, maxMeanTokenLen = 5.1,
          minStopwordFrac = 0.02,
          maxDup2gramFrac = 0.08, maxDup3gramFrac = 0.05),
        spanK = 0, chunkTokens = 0, nearDupThreshold = 0.8,
        boilerplateSep = " table ", boilerplateMinDocs = 20L,
        classifierMargin = 0.0, classifierBuckets = 1024,
        scheme = graft.operators.HashScheme.Portable)
      val out = DataPipeline.prepareIncrement(inc, idx, fps, None, cfg,
          seeds = Some((raw.where(col("lang") === "en"),
            raw.where(col("lang") =!= "en"))))
        .withColumn("fp", TextAnalysis.fingerprint(col("text")))
        .cache()
      require(out.count() > 0, "daily loop kept nothing — gate corpus broken")
      require(out.join(fps, Seq("fp"), "left_semi").count() == 0,
        "a survivor's fingerprint already exists in the corpus set")
      require(Dedup.nearDuplicatesAgainst(out, idx, "text", 0.8).count() == 0,
        "a survivor still near-matches the corpus index at the threshold")
      val Array(n, nFp) = out.agg(count(lit(1)), count_distinct(col("fp")))
        .head().toSeq.map(_.asInstanceOf[Long]).toArray
      require(n == nFp, s"in-batch exact dups survived: $n rows, $nFp fps")
      out.select("doc_id", "fp")
    }),

    // CDC merge: a deterministic 3-day change history over orders — day 2
    // re-prices every 3rd key (+100), day 3 tombstones every 7th — applied
    // to the day-1 snapshot with latest-per-key + anti-join semantics.
    // Keys divisible by 21 carry BOTH a day-2 upsert and a day-3 delete,
    // so the gate pins last-writer-wins. Increment-proportional: only the
    // changeset is windowed; the snapshot sees one equi-join.
    // Snapshot diff on engineered before/after views of orders: window
    // shift adds/removes key ranges, %7 price bumps and %13 status
    // flips exercise per-column change attribution.
    "i_table_diff" -> ((s, dir) => {
      val base = Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderstatus").as("st"))
      val before = base.where(col("o_orderkey") % 100 < 50)
      val after = base
        .where(col("o_orderkey") % 100 >= 2 && col("o_orderkey") % 100 < 52)
        .withColumn("cents", col("cents")
          + when(col("o_orderkey") % 7 === 0, 100L).otherwise(0L))
        .withColumn("st",
          when(col("o_orderkey") % 13 === 0, lit("X")).otherwise(col("st")))
      operators.TableDiff.diff(before, after, Seq("o_orderkey"))
        .withColumn("changed_cols", array_join(col("changed_cols"), ","))
    }),

    "i_apply_changes" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_totalprice"))
      val up = o.where(col("o_orderkey") % 3 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 100)
        .withColumn("op", lit("upsert")).withColumn("seq", lit(2L))
      val del = o.where(col("o_orderkey") % 7 === 0)
        .withColumn("op", lit("delete")).withColumn("seq", lit(3L))
      ApplyChanges(o, up.unionByName(del), "o_orderkey", "seq")
    }),

    // SCD2 validity history from the same change log (day-1 full upsert
    // prepended): each version valid [seq, next seq), open-ended for the
    // current one. One lead window on the key — log-proportional.
    "i_scd2_history" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_totalprice"))
      val log = o.withColumn("op", lit("upsert")).withColumn("seq", lit(1L))
        .unionByName(o.where(col("o_orderkey") % 3 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 100)
          .withColumn("op", lit("upsert")).withColumn("seq", lit(2L)))
        .unionByName(o.where(col("o_orderkey") % 7 === 0)
          .withColumn("op", lit("delete")).withColumn("seq", lit(3L)))
      ApplyChanges.history(log, "o_orderkey", "seq")
    }),

    // Right-to-be-forgotten sweep: the doc_id % 97 forget-set cascaded
    // across documents, the chunk table, and the embedding store (one
    // audit scan per table); the in-gate require proves the purge left
    // no trace. Oracle replays all three audit rows.
    "i_forget" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val forget = docs.where(col("doc_id") % 97 === 0).select("doc_id")
      val chunks = SpanDedup.chunk(docs, maxTokens = 64, overlap = 16)
      val emb = Tables.embeddings(s, dir)
        .select(col("vec_id").as("doc_id"), col("embedding"))
      val tables = Seq("documents" -> docs.select("doc_id"),
        "chunks" -> chunks.select("doc_id"), "embeddings" -> emb)
      for ((name, t) <- tables) {
        val left = operators.Forget.purge(t, forget)
          .join(forget, Seq("doc_id"), "left_semi").count()
        require(left == 0, s"forget sweep left $left rows in $name")
      }
      operators.Forget.audit(forget, tables)
    }),

    // Log retention: vacuum the pre-day-3 history to latest-per-key
    // survivors, then take the latest snapshot from the VACUUMED log.
    // The oracle computes the same snapshot from the ORIGINAL log —
    // equality IS the retention contract (vacuum must be invisible at
    // or after the horizon). The require pins that compaction actually
    // shrank the log.
    "i_vacuum" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_totalprice"))
      val log = o.withColumn("op", lit("upsert")).withColumn("seq", lit(1L))
        .unionByName(o.where(col("o_orderkey") % 3 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 100)
          .withColumn("op", lit("upsert")).withColumn("seq", lit(2L)))
        .unionByName(o.where(col("o_orderkey") % 7 === 0)
          .withColumn("op", lit("delete")).withColumn("seq", lit(3L)))
        .cache()
      val vacuumed = ApplyChanges.vacuum(log, "o_orderkey", "seq",
        beforeSeq = 3L).cache()
      val (nOrig, nVac) = (log.count(), vacuumed.count())
      require(nVac < nOrig,
        s"vacuum failed to compact: $nVac rows vs $nOrig in the original log")
      ApplyChanges.snapshotOf(vacuumed, "o_orderkey", "seq")
    }),

    // Time travel: the snapshot the change log implies AS OF day 2 —
    // day-3 tombstones invisible, day-2 re-prices visible. Same
    // latest-per-key kernel bounded by seq ≤ 2.
    "i_time_travel" -> ((s, dir) => {
      val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_totalprice"))
      val log = o.withColumn("op", lit("upsert")).withColumn("seq", lit(1L))
        .unionByName(o.where(col("o_orderkey") % 3 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 100)
          .withColumn("op", lit("upsert")).withColumn("seq", lit(2L)))
        .unionByName(o.where(col("o_orderkey") % 7 === 0)
          .withColumn("op", lit("delete")).withColumn("seq", lit(3L)))
      ApplyChanges.snapshotOf(log, "o_orderkey", "seq", Some(lit(2L)))
    }),

    // k-anonymity audit at quasi-identifier grain: (lang, 512-char
    // length bucket) census with the ≥ k verdict — one partial-agg
    // shuffle collapses the corpus to QI cells before anything else.
    "v_kanon" -> ((s, dir) =>
      operators.Privacy.kAnonymityAudit(
        Tables.documents(s, dir),
        Seq(col("lang"), (col("n_chars") / 512).cast("long").as("len_bucket")),
        k = 20)
        .orderBy(col("lang"), col("len_bucket"))),

    // One-row release-gate summary over the same audit (risky rows in
    // exact ppm) — the number a data-release review reads.
    "v_kanon_summary" -> ((s, dir) =>
      operators.Privacy.anonymitySummary(
        operators.Privacy.kAnonymityAudit(
          Tables.documents(s, dir),
          Seq(col("lang"), (col("n_chars") / 512).cast("long").as("len_bucket")),
          k = 20))),

    // l-diversity: each (lang, len_bucket) group must span ≥ 3 distinct
    // sources or it is homogeneity-attackable even when k-anonymous.
    "v_ldiv" -> ((s, dir) =>
      operators.Privacy.lDiversityAudit(
        Tables.documents(s, dir),
        Seq(col("lang"), (col("n_chars") / 512).cast("long").as("len_bucket")),
        col("source"), l = 3)
        .orderBy(col("lang"), col("len_bucket"))),

    // ε-DP noisy release of the (lang, source) census: Laplace(1/ε)
    // noise from a deterministic md5 uniform (the DSIR Gumbel pattern),
    // micro-rounded once — the oracle replays the noise bit-for-bit.
    "v_dp_counts" -> ((s, dir) =>
      operators.Privacy.dpCounts(Tables.documents(s, dir),
        Seq("lang", "source"), epsilon = 0.5, seed = 7L)),

    // Greedy sequence packing under the oracle: single range partition →
    // globally-sequential packing, which a DuckDB recursive CTE replays
    // exactly. (At scale the operator runs partition-parallel with
    // partition-unique pack ids — same code path, more partitions.)
    "p_pack_greedy" -> ((s, dir) => {
      val toks = TextAnalysis.tokenStats(Tables.documents(s, dir))
        .select("doc_id", "n_tokens")
      Packing.packGreedy(toks.repartitionByRange(1, col("doc_id")), budget = 256)
    }),

    // Benchmark decontamination: engineered eval set = 12-token prefixes
    // of every 10th doc, so each test doc is contained (containment 1.0)
    // in its source train doc; the inverted-index join must find exactly
    // what the oracle's exact shingle-set SQL finds.
    "d_decontaminate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val test = docs.where(col("doc_id") % 10 === 0)
        .select(col("doc_id"),
          array_join(slice(TextAnalysis.tokens(
            TextAnalysis.normalized(col("text"))), 1, 12), " ").as("text"))
      // maxDf = 0: this is the UNCAPPED parity gate — its oracle applies
      // no df cap, so the operator must not either (the capped behavior
      // has its own gate, d_decontaminate_capped). Relying on the default
      // would silently diverge from this oracle at any scale where some
      // shingle's train-df exceeds the default cap.
      Decontaminate.report(test, docs, threshold = 0.99, maxDf = 0L)
    }),

    // Decontamination with the stop-shingle cap BINDING (maxDf = 3 at a
    // scale where trigram df reaches 7): the scale-survival behavior —
    // ubiquitous shingles dropped from the train index before the join —
    // is what this gate pins. Containment can only drop under the cap, so
    // the threshold is lowered to keep matches visible.
    "d_decontaminate_capped" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val test = docs.where(col("doc_id") % 10 === 0)
        .select(col("doc_id"),
          array_join(slice(TextAnalysis.tokens(
            TextAnalysis.normalized(col("text"))), 1, 12), " ").as("text"))
      Decontaminate.report(test, docs, threshold = 0.5, maxDf = 3L)
    }),

    // Span-level leak audit: engineered test docs = 12-token prefix of
    // every 10th doc + 6 unique novel tokens + that doc's tokens 13..20
    // → exactly two leaked islands per test doc ((0,12) and (18,8) when
    // nothing else matches); leakedSpans must recover start/len/text of
    // each, which the oracle replays window for window.
    "d_leaked_spans" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val toks = TextAnalysis.kernelTokens(col("text"))
      val test = docs.where(col("doc_id") % 10 === 0)
        .select(col("doc_id"), toks.as("t"))
        .where(size(col("t")) >= 21)
        .select(col("doc_id"), array_join(concat(
          slice(col("t"), 1, 12),
          array((0 until 6).map(i =>
            concat(lit("novel"), col("doc_id").cast("string"), lit(s"x$i"))): _*),
          slice(col("t"), 13, 8)), " ").as("text"))
      operators.Decontaminate.leakedSpans(test, docs.select("doc_id", "text"),
        k = 8, maxDf = 0L)
    }),

    // SQL surface: the session-extension-registered native functions
    // resolving inside spark.sql text (GraftExtensions / GraftFunctions).
    // Unicode NFC through the SQL surface: a decomposed combining
    // sequence (e+U+0301, A+U+030A) appended to every doc must hash
    // equal to its composed form after normalization — DuckDB's
    // utf8proc NFC replays the JDK Normalizer for these stable
    // sequences, so the md5 pins real Unicode work, not a no-op.
    "f_sql_nfc" -> ((s, dir) => {
      graft.session.GraftFunctions.register(s)
      Tables.documents(s, dir).createOrReplaceTempView("docs_sqlfn")
      // the suffix is DECOMPOSED (compile-time escapes: e + combining
      // acute, A + combining ring) \u2014 normalization must really compose
      // it; the oracle builds the same sequence with chr() and
      // nfc_normalize
      s.sql("SELECT doc_id, md5(unicode_norm(concat(coalesce(text, ''), " +
        "' e\u0301A\u030A'))) AS h FROM docs_sqlfn")
    }),

    "f_sql_cosine" -> ((s, dir) => {
      graft.session.GraftFunctions.register(s)
      Tables.embeddings(s, dir).createOrReplaceTempView("embeddings_sqlfn")
      s.sql("""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              |  round(cosine_sim(a.embedding, b.embedding), 6) AS cosine,
              |  round(vec_dot(a.embedding, a.embedding), 6) AS self_dot
              |FROM embeddings_sqlfn a
              |JOIN embeddings_sqlfn b ON b.vec_id = a.vec_id + 1
              |WHERE a.vec_id < 100""".stripMargin)
    }),

    // The sketch aggregates through the SQL surface: theta sketches are
    // in EXACT mode below 2^14 distincts, so the per-lang estimate is
    // the exact distinct count and the oracle is plain COUNT(DISTINCT).
    "f_sql_theta" -> ((s, dir) => {
      graft.session.GraftFunctions.register(s)
      Tables.documents(s, dir).createOrReplaceTempView("docs_theta_sqlfn")
      s.sql("""SELECT lang,
              |  CAST(round(theta_estimate(theta_sketch(CAST(doc_id AS STRING)))) AS BIGINT) AS n_distinct
              |FROM docs_theta_sqlfn GROUP BY lang""".stripMargin)
    }),

    // Bloom build + probe through the SQL surface: every id planted
    // into its language's filter MUST be found (no false negatives) —
    // the deterministic half of the Bloom contract; n_missed ≡ 0 is
    // what the oracle asserts.
    "f_sql_bloom" -> ((s, dir) => {
      graft.session.GraftFunctions.register(s)
      Tables.documents(s, dir).createOrReplaceTempView("docs_bloom_sqlfn")
      s.sql("""WITH f AS (
              |  SELECT lang, bloom_agg(CAST(doc_id AS STRING), 8192) AS b
              |  FROM docs_bloom_sqlfn GROUP BY lang)
              |SELECT d.lang, count(*) AS n_checked,
              |  sum(CASE WHEN bloom_contains(f.b, CAST(d.doc_id AS STRING))
              |      THEN 0 ELSE 1 END) AS n_missed
              |FROM docs_bloom_sqlfn d JOIN f ON f.lang = d.lang
              |GROUP BY d.lang""".stripMargin)
    })
  )

  /** WordPiece oracle chain (CTE-list fragment for a WITH RECURSIVE
    * prelude): rebuild the substring-census vocabulary from the even
    * docs, precompute the longest vocabulary match per (serving word,
    * position), then replay the greedy walk as a recursive CTE
    * following those steps — [UNK] collapse included. Shared by
    * `t_wordpiece` (word grain) and `t_wordpiece_encode` (doc grain).
    */
  private val wordPieceChainSql: String =
    """tnorm AS (
      |  SELECT doc_id,
      |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
      |  FROM documents),
      |twords AS (
      |  SELECT word, count(*)::BIGINT AS freq FROM (
      |    SELECT unnest(CASE WHEN norm = '' THEN []::VARCHAR[]
      |                       ELSE regexp_split_to_array(norm, '\s+') END) AS word
      |    FROM tnorm WHERE doc_id % 2 = 0)
      |  WHERE word <> '' GROUP BY word),
      |tpos AS (SELECT word, freq, unnest(range(1, len(word) + 1)) AS pos FROM twords),
      |tcand AS (SELECT word, freq, pos, unnest(range(1, 5)) AS l FROM tpos),
      |wpvocab AS (
      |  SELECT is_cont, piece, len(piece) AS pl FROM (
      |    SELECT (pos > 1) AS is_cont, substr(word, pos, l) AS piece,
      |      sum(freq) AS cnt
      |    FROM tcand WHERE pos + l - 1 <= len(word)
      |    GROUP BY 1, 2)
      |  WHERE cnt >= 5 OR len(piece) = 1),
      |swords AS (
      |  SELECT DISTINCT word FROM (
      |    SELECT unnest(CASE WHEN norm = '' THEN []::VARCHAR[]
      |                       ELSE regexp_split_to_array(norm, '\s+') END) AS word
      |    FROM tnorm WHERE doc_id % 2 = 1)
      |  WHERE word <> ''),
      |spos AS (SELECT word, unnest(range(1, len(word) + 1)) AS pos FROM swords),
      |wpbest AS (
      |  SELECT s.word, s.pos, max(v.pl) AS l
      |  FROM spos s JOIN wpvocab v
      |    ON v.is_cont = (s.pos > 1) AND v.piece = substr(s.word, s.pos, v.pl)
      |  GROUP BY s.word, s.pos),
      |walk AS (
      |  SELECT word, 1::BIGINT AS pos, CAST(NULL AS VARCHAR) AS piece,
      |    0::BIGINT AS ord, false AS unk
      |  FROM swords
      |  UNION ALL
      |  SELECT w.word,
      |    CASE WHEN b.l IS NULL THEN len(w.word) + 1 ELSE w.pos + b.l END,
      |    CASE WHEN b.l IS NULL THEN '[UNK]'
      |         WHEN w.pos > 1 THEN '##' || substr(w.word, w.pos, b.l)
      |         ELSE substr(w.word, w.pos, b.l) END,
      |    w.ord + 1,
      |    b.l IS NULL
      |  FROM walk w LEFT JOIN wpbest b ON b.word = w.word AND b.pos = w.pos
      |  WHERE w.pos <= len(w.word) AND NOT w.unk),
      |wpenc AS (
      |  SELECT word,
      |    CASE WHEN bool_or(unk) THEN '[UNK]'
      |         ELSE string_agg(piece, ' ' ORDER BY ord) END AS encoded,
      |    (CASE WHEN bool_or(unk) THEN 1 ELSE count(piece) END)::BIGINT AS n_pieces
      |  FROM walk WHERE ord > 0 GROUP BY word)""".stripMargin

  private val oraclesBase: Map[String, String] = Map(
    "x_grouped_topk" ->
      """SELECT doc_id, lang, source, n_chars FROM (
        |  SELECT doc_id, lang, source, n_chars,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY n_chars DESC, doc_id ASC) AS rn
        |  FROM documents) t WHERE rn <= 5""".stripMargin,

    "x_bleu" ->
      s"""WITH $bleuChainSql
        |SELECT pair_id, c_len, r_len, m1, t1, m2, t2, m3, t3, m4, t4,
        |${bleuSelectSql()}
        |FROM bper""".stripMargin,

    "x_bleu_corpus" ->
      s"""WITH $bleuChainSql,
        |bcorp AS (
        |  SELECT sum(c_len)::BIGINT AS c_len, sum(r_len)::BIGINT AS r_len,
        |    sum(m1)::BIGINT AS m1, sum(t1)::BIGINT AS t1,
        |    sum(m2)::BIGINT AS m2, sum(t2)::BIGINT AS t2,
        |    sum(m3)::BIGINT AS m3, sum(t3)::BIGINT AS t3,
        |    sum(m4)::BIGINT AS m4, sum(t4)::BIGINT AS t4
        |  FROM bper)
        |SELECT c_len, r_len, m1, t1, m2, t2, m3, t3, m4, t4,
        |${bleuSelectSql()}
        |FROM bcorp""".stripMargin,

    "x_chrf" ->
      s"""WITH $chrfChainSql
        |SELECT pair_id, c_chars, r_chars,
        |  m1, t1, rt1, m2, t2, rt2, m3, t3, rt3,
        |  m4, t4, rt4, m5, t5, rt5, m6, t6, rt6,
        |$chrfSelectSql
        |FROM cper""".stripMargin,

    // LCS via the row-wise prefix-max reformulation (dp[i][j] =
    // max(prev[j], max_{k<=j, r_k=c_i} prev[k-1]+1) — the within-row
    // dependency eliminated, so each recursive step is one pure list
    // comprehension over the previous row).
    "x_rouge_l" ->
      """WITH RECURSIVE cnorm AS (
        |  SELECT doc_id AS pair_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS r_norm
        |  FROM documents),
        |ctok AS (
        |  SELECT pair_id, CASE WHEN r_norm = '' THEN []::VARCHAR[]
        |    ELSE regexp_split_to_array(r_norm, ' ') END AS r_toks
        |  FROM cnorm),
        |rb0 AS (
        |  SELECT pair_id,
        |    [r_toks[i] FOR i IN range(1, len(r_toks) + 1) IF i % 7 != 0] AS c0,
        |    r_toks AS r
        |  FROM ctok),
        |rbase AS (
        |  SELECT pair_id,
        |    [c0[CASE WHEN i % 2 = 1 AND i < len(c0) THEN i + 1
        |         WHEN i % 2 = 0 THEN i - 1 ELSE i END]
        |      FOR i IN range(1, len(c0) + 1)] AS c,
        |    r
        |  FROM rb0),
        |dp AS (
        |  SELECT pair_id, c, r, 0 AS i,
        |    [0 FOR j IN range(1, len(r) + 1)] AS row
        |  FROM rbase
        |  UNION ALL
        |  SELECT pair_id, c, r, i + 1,
        |    [ greatest(row[j],
        |        coalesce(list_max([CASE WHEN r[k] = c[i + 1]
        |          THEN (CASE WHEN k = 1 THEN 0 ELSE row[k - 1] END) + 1
        |          ELSE 0 END FOR k IN range(1, j + 1)]), 0))
        |      FOR j IN range(1, len(r) + 1) ]
        |  FROM dp WHERE i < len(c)),
        |rfin AS (
        |  SELECT pair_id, len(c)::BIGINT AS c_len, len(r)::BIGINT AS r_len,
        |    coalesce(list_max(row), 0)::BIGINT AS lcs
        |  FROM dp WHERE i = len(c))
        |SELECT pair_id, c_len, r_len, lcs,
        |  CASE WHEN lcs = 0 THEN 0.0::DOUBLE
        |    ELSE round(2.0 * lcs / (c_len + r_len), 6) END AS rouge_l
        |FROM rfin""".stripMargin,

    "x_bradley_terry" ->
      s"""WITH ${btChainSql(5)}
        |SELECT i.item, p.p_micro, i.wins, i.games
        |FROM btitems i JOIN btp5 p ON i.item = p.item""".stripMargin,

    "x_elo" -> {
      val dExpr = "CAST(round(32000000 * (1.0 - 1.0 / (1.0 + power(10.0, " +
        "(r.ratings[list_position(r.items, g.loser)] " +
        "- r.ratings[list_position(r.items, g.winner)])::DOUBLE " +
        "/ 1e6 / 400.0)))) AS BIGINT)"
      s"""WITH RECURSIVE eli AS (
        |  SELECT l_orderkey AS ok, l_suppkey AS sk, l_linenumber AS ln,
        |    l_partkey AS pk, l_extendedprice AS price
        |  FROM lineitem WHERE l_orderkey % 50 = 0),
        |eg AS MATERIALIZED (
        |  SELECT league, winner, loser,
        |    row_number() OVER (PARTITION BY league
        |      ORDER BY ok, xln, yln, xpk, ypk, xsk, ysk) AS rn
        |  FROM (
        |    SELECT x.ok % 2 AS league,
        |      CASE WHEN x.price >= y.price THEN x.sk ELSE y.sk END AS winner,
        |      CASE WHEN x.price >= y.price THEN y.sk ELSE x.sk END AS loser,
        |      x.ok AS ok, x.ln AS xln, y.ln AS yln, x.pk AS xpk,
        |      y.pk AS ypk, x.sk AS xsk, y.sk AS ysk
        |    FROM eli x JOIN eli y ON x.ok = y.ok AND x.sk < y.sk)),
        |eitems AS MATERIALIZED (
        |  SELECT league, list_sort(list(DISTINCT sk)) AS items FROM (
        |    SELECT league, winner AS sk FROM eg
        |    UNION ALL SELECT league, loser FROM eg) GROUP BY 1),
        |emax AS (SELECT league, max(rn) AS mx FROM eg GROUP BY 1),
        |erec AS (
        |  SELECT league, 0::BIGINT AS rn, items,
        |    [1500000000::BIGINT FOR x IN items] AS ratings,
        |    [0::BIGINT FOR x IN items] AS played,
        |    [0::BIGINT FOR x IN items] AS wins
        |  FROM eitems
        |  UNION ALL
        |  SELECT r.league, r.rn + 1, r.items,
        |    [CASE WHEN r.items[i] = g.winner THEN r.ratings[i] + $dExpr
        |          WHEN r.items[i] = g.loser THEN r.ratings[i] - $dExpr
        |          ELSE r.ratings[i] END
        |     FOR i IN range(1, len(r.items) + 1)],
        |    [r.played[i] + CASE WHEN r.items[i] = g.winner
        |        OR r.items[i] = g.loser THEN 1 ELSE 0 END
        |     FOR i IN range(1, len(r.items) + 1)],
        |    [r.wins[i] + CASE WHEN r.items[i] = g.winner THEN 1 ELSE 0 END
        |     FOR i IN range(1, len(r.items) + 1)]
        |  FROM erec r JOIN eg g ON g.league = r.league AND g.rn = r.rn + 1)
        |SELECT f.league, f.items[i] AS item, f.ratings[i] AS rating_micro,
        |  f.played[i] AS games, f.wins[i] AS wins
        |FROM erec f JOIN emax m ON m.league = f.league AND f.rn = m.mx,
        |  unnest(range(1, len(f.items) + 1)) AS t(i)
        |WHERE f.played[i] > 0""".stripMargin
    },

    "x_topk_rewrite" ->
      """SELECT doc_id, source, n_chars, rank FROM (
        |  SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id ASC) AS rank
        |  FROM documents) t WHERE rank <= 4""".stripMargin,

    "x_topk_rank" ->
      """SELECT doc_id, source, n_chars, rank FROM (
        |  SELECT doc_id, source, n_chars,
        |    rank() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC) AS rank
        |  FROM documents) t WHERE rank <= 4""".stripMargin,

    "x_grouped_topk_hi" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC) AS rn
        |  FROM lineitem) t WHERE rn <= 3""".stripMargin,

    "t_wordpiece" ->
      s"""WITH RECURSIVE $wordPieceChainSql
        |SELECT word, encoded, n_pieces FROM wpenc""".stripMargin,

    "t_unigram_lm" ->
      s"""WITH RECURSIVE ${unigramChainSql(1, 12)}
        |SELECT f.word, sg.encoded, sg.n_pieces, f.logp_micro
        |FROM ufinal1 f JOIN useg1 sg USING (word)""".stripMargin,

    "t_wordpiece_encode" ->
      s"""WITH RECURSIVE $wordPieceChainSql,
        |stoks AS (
        |  SELECT doc_id, word FROM (
        |    SELECT doc_id, unnest(CASE WHEN norm = '' THEN []::VARCHAR[]
        |                       ELSE regexp_split_to_array(norm, '\\s+') END) AS word
        |    FROM tnorm WHERE doc_id % 2 = 1)
        |  WHERE word <> '')
        |SELECT t.doc_id, sum(e.n_pieces)::BIGINT AS total_pieces,
        |  count(*)::BIGINT AS n_words,
        |  sum(CASE WHEN e.encoded = '[UNK]' THEN 1 ELSE 0 END)::BIGINT AS n_unk
        |FROM stoks t JOIN wpenc e USING (word)
        |GROUP BY t.doc_id""".stripMargin,
    // CDC family: the change log is rebuilt verbatim in SQL (day-1 full
    // upsert, day-2 +100 re-price on keys %3, day-3 tombstone on keys
    // %7), then the merge / lead-window / as-of kernels are replayed.
    "i_table_diff" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, o_custkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |    o_orderstatus AS st
        |  FROM orders),
        |b AS (SELECT * FROM base WHERE k % 100 < 50),
        |a AS (
        |  SELECT k, o_custkey,
        |    cents + CASE WHEN k % 7 = 0 THEN 100 ELSE 0 END AS cents,
        |    CASE WHEN k % 13 = 0 THEN 'X' ELSE st END AS st
        |  FROM base WHERE k % 100 >= 2 AND k % 100 < 52)
        |SELECT * FROM (
        |  SELECT coalesce(b.k, a.k) AS o_orderkey,
        |    CASE WHEN b.k IS NULL THEN 'added'
        |         WHEN a.k IS NULL THEN 'removed'
        |         WHEN b.o_custkey IS NOT DISTINCT FROM a.o_custkey
        |          AND b.cents IS NOT DISTINCT FROM a.cents
        |          AND b.st IS NOT DISTINCT FROM a.st THEN NULL
        |         ELSE 'changed' END AS change,
        |    CASE WHEN b.k IS NOT NULL AND a.k IS NOT NULL
        |          AND NOT (b.o_custkey IS NOT DISTINCT FROM a.o_custkey
        |            AND b.cents IS NOT DISTINCT FROM a.cents
        |            AND b.st IS NOT DISTINCT FROM a.st) THEN
        |      array_to_string(list_filter([
        |        CASE WHEN b.o_custkey IS DISTINCT FROM a.o_custkey
        |             THEN 'o_custkey' END,
        |        CASE WHEN b.cents IS DISTINCT FROM a.cents
        |             THEN 'cents' END,
        |        CASE WHEN b.st IS DISTINCT FROM a.st THEN 'st' END],
        |        x -> x IS NOT NULL), ',')
        |    END AS changed_cols
        |  FROM b FULL JOIN a ON b.k = a.k)
        |WHERE change IS NOT NULL""".stripMargin,

    "i_apply_changes" ->
      """WITH o AS (SELECT o_orderkey, o_totalprice FROM orders),
        |chg AS (
        |  SELECT o_orderkey, o_totalprice + 100 AS o_totalprice,
        |         'upsert' AS op, 2::BIGINT AS seq FROM o WHERE o_orderkey % 3 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, 'delete', 3::BIGINT FROM o WHERE o_orderkey % 7 = 0),
        |latest AS (
        |  SELECT * FROM (
        |    SELECT chg.*, row_number() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
        |    FROM chg) WHERE rn = 1)
        |SELECT o.o_orderkey, o.o_totalprice FROM o
        |WHERE o.o_orderkey NOT IN (SELECT o_orderkey FROM latest)
        |UNION ALL
        |SELECT o_orderkey, o_totalprice FROM latest WHERE op = 'upsert'""".stripMargin,

    "i_scd2_history" ->
      """WITH o AS (SELECT o_orderkey, o_totalprice FROM orders),
        |chlog AS (
        |  SELECT o_orderkey, o_totalprice, 'upsert' AS op, 1::BIGINT AS seq FROM o
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice + 100, 'upsert', 2::BIGINT FROM o WHERE o_orderkey % 3 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, 'delete', 3::BIGINT FROM o WHERE o_orderkey % 7 = 0)
        |SELECT o_orderkey, o_totalprice, op, seq,
        |  seq AS valid_from,
        |  lead(seq) OVER (PARTITION BY o_orderkey ORDER BY seq) AS valid_to,
        |  lead(seq) OVER (PARTITION BY o_orderkey ORDER BY seq) IS NULL AS is_current
        |FROM chlog""".stripMargin,

    // the three audit rows: chunk counts derive from the token-window
    // chunking formula (ceil(n_tokens − overlap) / (max − overlap)),
    // replayed like the t_chunk oracle
    "i_forget" ->
      """WITH f AS (SELECT doc_id FROM documents WHERE doc_id % 97 = 0),
        |ch AS (
        |  SELECT doc_id, CASE WHEN n = 0 THEN 0
        |    ELSE greatest(CAST(ceil((n - 64)::DOUBLE / 48) AS BIGINT), 0) + 1 END AS n_chunks
        |  FROM (
        |    SELECT doc_id,
        |      CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13)) = '' THEN 0
        |           ELSE len(regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13)), '\s+')) END AS n
        |    FROM documents))
        |SELECT 'documents' AS "table", count(*)::BIGINT AS n_before,
        |  sum(CASE WHEN doc_id % 97 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_removed,
        |  (count(*) - sum(CASE WHEN doc_id % 97 = 0 THEN 1 ELSE 0 END))::BIGINT AS n_after
        |FROM documents
        |UNION ALL
        |SELECT 'chunks', sum(n_chunks)::BIGINT,
        |  sum(CASE WHEN doc_id % 97 = 0 THEN n_chunks ELSE 0 END)::BIGINT,
        |  sum(CASE WHEN doc_id % 97 = 0 THEN 0 ELSE n_chunks END)::BIGINT
        |FROM ch
        |UNION ALL
        |SELECT 'embeddings', count(*)::BIGINT,
        |  sum(CASE WHEN vec_id % 97 = 0 THEN 1 ELSE 0 END)::BIGINT,
        |  (count(*) - sum(CASE WHEN vec_id % 97 = 0 THEN 1 ELSE 0 END))::BIGINT
        |FROM embeddings""".stripMargin,

    // snapshot from the ORIGINAL log — vacuum must be invisible here
    "i_vacuum" ->
      """WITH o AS (SELECT o_orderkey, o_totalprice FROM orders),
        |chlog AS (
        |  SELECT o_orderkey, o_totalprice, 'upsert' AS op, 1::BIGINT AS seq FROM o
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice + 100, 'upsert', 2::BIGINT FROM o WHERE o_orderkey % 3 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, 'delete', 3::BIGINT FROM o WHERE o_orderkey % 7 = 0)
        |SELECT o_orderkey, o_totalprice, seq FROM (
        |  SELECT chlog.*, row_number() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
        |  FROM chlog)
        |WHERE rn = 1 AND op = 'upsert'""".stripMargin,

    "i_time_travel" ->
      """WITH o AS (SELECT o_orderkey, o_totalprice FROM orders),
        |chlog AS (
        |  SELECT o_orderkey, o_totalprice, 'upsert' AS op, 1::BIGINT AS seq FROM o
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice + 100, 'upsert', 2::BIGINT FROM o WHERE o_orderkey % 3 = 0
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, 'delete', 3::BIGINT FROM o WHERE o_orderkey % 7 = 0)
        |SELECT o_orderkey, o_totalprice, seq FROM (
        |  SELECT chlog.*, row_number() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
        |  FROM chlog WHERE seq <= 2)
        |WHERE rn = 1 AND op = 'upsert'""".stripMargin,

    "v_kanon" ->
      """SELECT lang, (n_chars // 512)::BIGINT AS len_bucket,
        |  count(*)::BIGINT AS group_size, count(*) >= 20 AS anonymous
        |FROM documents GROUP BY 1, 2
        |ORDER BY lang, len_bucket""".stripMargin,

    "v_kanon_summary" ->
      """WITH a AS (
        |  SELECT lang, n_chars // 512 AS len_bucket, count(*)::BIGINT AS gs
        |  FROM documents GROUP BY 1, 2)
        |SELECT count(*)::BIGINT AS n_groups,
        |  sum(CASE WHEN gs < 20 THEN 1 ELSE 0 END)::BIGINT AS risky_groups,
        |  sum(gs)::BIGINT AS n_rows,
        |  sum(CASE WHEN gs < 20 THEN gs ELSE 0 END)::BIGINT AS risky_rows,
        |  CAST(round(sum(CASE WHEN gs < 20 THEN gs ELSE 0 END) * 1e6 / sum(gs)) AS BIGINT) AS risky_row_ppm
        |FROM a""".stripMargin,

    "v_ldiv" ->
      """SELECT lang, (n_chars // 512)::BIGINT AS len_bucket,
        |  count(*)::BIGINT AS group_size,
        |  count(DISTINCT source)::BIGINT AS n_sensitive,
        |  count(DISTINCT source) >= 3 AS diverse
        |FROM documents GROUP BY 1, 2
        |ORDER BY lang, len_bucket""".stripMargin,

    // Laplace noise replay: same md5-uniform, same one-chain inverse
    // CDF, same single micro round as Privacy.dpCounts (ε=0.5, seed=7).
    "v_dp_counts" ->
      """WITH c AS (
        |  SELECT lang, source, count(*)::BIGINT AS cnt FROM documents GROUP BY 1, 2),
        |n AS (
        |  SELECT lang, source, cnt,
        |    (('0x' || substr(md5('dp:7:' || coalesce(lang, ' ') || ':' || coalesce(source, ' ')), 1, 15))::BIGINT + 0.5)
        |      / 1.152921504606846976e18 AS u
        |  FROM c),
        |m AS (
        |  SELECT lang, source,
        |    CAST(cnt * 1000000 +
        |      CAST(round((-(1.0 / 0.5) * sign(cc) * ln(1 - 2 * abs(cc))) * 1e6) AS BIGINT)
        |    AS BIGINT) AS noisy_micro
        |  FROM (SELECT lang, source, cnt,
        |          greatest(least(u - 0.5, 0.499999999), -0.499999999) AS cc
        |        FROM n))
        |SELECT lang, source, noisy_micro,
        |  round(noisy_micro::DOUBLE / 1e6, 6) AS noisy_count
        |FROM m""".stripMargin,

    // Histogram family: w = (105000−900)/64 = 1626.5625 exactly in IEEE
    // double, so the bucket formula replays bit-for-bit.
    "k_histogram" ->
      """SELECT least(greatest(floor((l_extendedprice - 900.0) / 1626.5625), 0), 63)::BIGINT AS bucket,
        |  count(*) AS cnt
        |FROM lineitem WHERE l_extendedprice IS NOT NULL
        |GROUP BY 1""".stripMargin,

    "k_hist_quantile" ->
      """WITH h AS (
        |  SELECT least(greatest(floor((l_extendedprice - 900.0) / 1626.5625), 0), 63)::BIGINT AS bucket,
        |    count(*) AS cnt
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1),
        |c AS (
        |  SELECT bucket, cnt,
        |    sum(cnt) OVER (ORDER BY bucket) AS cum,
        |    sum(cnt) OVER () AS n
        |  FROM h),
        |probes AS (SELECT unnest([0.25, 0.5, 0.9, 0.99])::DOUBLE AS q)
        |SELECT q,
        |  round(900.0 + bucket * 1626.5625 +
        |        1626.5625 * (ceil(q * n) - (cum - cnt)) / cnt, 6) AS qtile
        |FROM c CROSS JOIN probes
        |WHERE cum >= ceil(q * n) AND (cum - cnt) < ceil(q * n)""".stripMargin,

    "d_edit_verify" ->
      """WITH base AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
        |ecorpus AS (
        |  SELECT doc_id, text FROM base
        |  UNION ALL SELECT doc_id + 1000000, text || ' zq' FROM base),
        |epairs AS (
        |  SELECT doc_id AS doc_a, doc_id + 1000000 AS doc_b FROM base WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id, doc_id + 1 FROM base WHERE doc_id % 5 = 0)
        |SELECT doc_a, doc_b, lev, ratio FROM (
        |  SELECT p.doc_a, p.doc_b,
        |    levenshtein(a.text, b.text) AS lev,
        |    round(1.0 - levenshtein(a.text, b.text)::DOUBLE
        |          / greatest(length(a.text), length(b.text), 1), 6) AS ratio
        |  FROM epairs p
        |  JOIN ecorpus a ON a.doc_id = p.doc_a
        |  JOIN ecorpus b ON b.doc_id = p.doc_b)
        |WHERE ratio >= 0.9""".stripMargin,

    "k_profile" ->
      """SELECT 'l_orderkey' AS "column", count(*) AS n_rows,
        |  sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
        |  count(DISTINCT l_orderkey) AS n_distinct,
        |  round(min(l_orderkey)::DOUBLE, 6)::VARCHAR AS min_str,
        |  round(max(l_orderkey)::DOUBLE, 6)::VARCHAR AS max_str
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_quantity', count(*),
        |  sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)::BIGINT,
        |  count(DISTINCT l_quantity),
        |  round(min(l_quantity)::DOUBLE, 6)::VARCHAR,
        |  round(max(l_quantity)::DOUBLE, 6)::VARCHAR
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_returnflag', count(*),
        |  sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END)::BIGINT,
        |  count(DISTINCT l_returnflag), min(l_returnflag), max(l_returnflag)
        |FROM lineitem
        |UNION ALL
        |SELECT 'l_extendedprice', count(*),
        |  sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END)::BIGINT,
        |  count(DISTINCT l_extendedprice),
        |  round(min(l_extendedprice)::DOUBLE, 6)::VARCHAR,
        |  round(max(l_extendedprice)::DOUBLE, 6)::VARCHAR
        |FROM lineitem""".stripMargin,

    "k_corr" ->
      """WITH m AS (
        |  SELECT count(*)::DOUBLE AS n,
        |    sum(l_quantity::DOUBLE) AS sq, sum(l_quantity::DOUBLE * l_quantity) AS sqq,
        |    sum(l_extendedprice::DOUBLE) AS se, sum(l_extendedprice::DOUBLE * l_extendedprice) AS see,
        |    sum(l_discount::DOUBLE) AS sd, sum(l_discount::DOUBLE * l_discount) AS sdd,
        |    sum(l_tax::DOUBLE) AS st, sum(l_tax::DOUBLE * l_tax) AS stt,
        |    sum(l_quantity::DOUBLE * l_extendedprice) AS sqe,
        |    sum(l_quantity::DOUBLE * l_discount) AS sqd,
        |    sum(l_quantity::DOUBLE * l_tax) AS sqt,
        |    sum(l_extendedprice::DOUBLE * l_discount) AS sed,
        |    sum(l_extendedprice::DOUBLE * l_tax) AS set_,
        |    sum(l_discount::DOUBLE * l_tax) AS sdt
        |  FROM lineitem)
        |SELECT col_a, col_b,
        |  round(CASE WHEN vx > 0 AND vy > 0 THEN cov / sqrt(vx * vy) END, 6) AS corr
        |FROM (
        |  SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
        |    sqe - sq * se / n AS cov, sqq - sq * sq / n AS vx, see - se * se / n AS vy FROM m
        |  UNION ALL SELECT 'l_quantity', 'l_discount',
        |    sqd - sq * sd / n, sqq - sq * sq / n, sdd - sd * sd / n FROM m
        |  UNION ALL SELECT 'l_quantity', 'l_tax',
        |    sqt - sq * st / n, sqq - sq * sq / n, stt - st * st / n FROM m
        |  UNION ALL SELECT 'l_extendedprice', 'l_discount',
        |    sed - se * sd / n, see - se * se / n, sdd - sd * sd / n FROM m
        |  UNION ALL SELECT 'l_extendedprice', 'l_tax',
        |    set_ - se * st / n, see - se * se / n, stt - st * st / n FROM m
        |  UNION ALL SELECT 'l_discount', 'l_tax',
        |    sdt - sd * st / n, sdd - sd * sd / n, stt - st * st / n FROM m)""".stripMargin,

    "k_outliers" ->
      """WITH src AS (
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |    l_quantity + CASE WHEN l_orderkey % 997 = 0 THEN 500.0 ELSE 0.0 END AS v
        |  FROM lineitem),
        |h1 AS (
        |  SELECT least(greatest(floor((v - 0.0) / 1.0), 0), 599)::BIGINT AS bucket, count(*) AS cnt
        |  FROM src WHERE v IS NOT NULL GROUP BY 1),
        |c1 AS (
        |  SELECT bucket, cnt, sum(cnt) OVER (ORDER BY bucket) AS cum,
        |    sum(cnt) OVER () AS n
        |  FROM h1),
        |med AS (
        |  SELECT round(0.0 + bucket * 1.0 +
        |    1.0 * (ceil(0.5 * n) - (cum - cnt)) / cnt, 6) AS m
        |  FROM c1 WHERE cum >= ceil(0.5 * n) AND (cum - cnt) < ceil(0.5 * n)),
        |dev AS (SELECT abs(v - (SELECT m FROM med)) AS d FROM src),
        |h2 AS (
        |  SELECT least(greatest(floor((d - 0.0) / 1.0), 0), 599)::BIGINT AS bucket, count(*) AS cnt
        |  FROM dev WHERE d IS NOT NULL GROUP BY 1),
        |c2 AS (
        |  SELECT bucket, cnt, sum(cnt) OVER (ORDER BY bucket) AS cum,
        |    sum(cnt) OVER () AS n
        |  FROM h2),
        |mad AS (
        |  SELECT round(0.0 + bucket * 1.0 +
        |    1.0 * (ceil(0.5 * n) - (cum - cnt)) / cnt, 6) AS m
        |  FROM c2 WHERE cum >= ceil(0.5 * n) AND (cum - cnt) < ceil(0.5 * n))
        |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, v,
        |  (SELECT m FROM med) AS median_est, (SELECT m FROM mad) AS mad_est
        |FROM src
        |WHERE abs(v - (SELECT m FROM med)) > 5.0 * (SELECT m FROM mad)""".stripMargin,

    "r_phrase_search" ->
      """WITH pnorm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
        |  FROM documents),
        |parr AS (
        |  SELECT doc_id, CASE WHEN norm = '' THEN []::VARCHAR[]
        |                      ELSE regexp_split_to_array(norm, '\s+') END AS a
        |  FROM pnorm),
        |ptoks AS (
        |  SELECT doc_id, generate_subscripts(a, 1) AS pos, unnest(a) AS term FROM parr),
        |pq AS (
        |  SELECT doc_id AS query_id, a[3:5] AS qa FROM parr
        |  WHERE doc_id % 20 = 0 AND len(a) >= 5),
        |pqterms AS (
        |  SELECT query_id, generate_subscripts(qa, 1) AS off, unnest(qa) AS term FROM pq),
        |pql AS (SELECT query_id, count(*)::BIGINT AS qlen FROM pqterms GROUP BY 1),
        |pocc AS (
        |  SELECT t.query_id, p.doc_id, p.pos - t.off AS base, count(*) AS matched
        |  FROM pqterms t JOIN ptoks p USING (term)
        |  GROUP BY 1, 2, 3),
        |phits AS (
        |  SELECT o.query_id, o.doc_id, count(*)::BIGINT AS n_hits
        |  FROM pocc o JOIN pql USING (query_id)
        |  WHERE o.matched = pql.qlen AND o.base >= 0
        |  GROUP BY 1, 2)
        |SELECT query_id, doc_id, n_hits, rank FROM (
        |  SELECT query_id, doc_id, n_hits,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY n_hits DESC, doc_id ASC) AS rank
        |  FROM phits)
        |WHERE rank <= 10""".stripMargin,

    "s_shard_assign" ->
      """WITH ts AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(text) = '' THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, n_tokens, md5('shuffle:42:' || doc_id::VARCHAR) AS hx
        |  FROM ts WHERE n_tokens > 0),
        |c AS (
        |  SELECT doc_id, n_tokens, hx,
        |    sum(n_tokens) OVER (ORDER BY hx, doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM o)
        |SELECT doc_id, n_tokens, cum::BIGINT AS cum_tokens,
        |  ((cum - n_tokens) // 2000)::BIGINT AS shard,
        |  row_number() OVER (PARTITION BY (cum - n_tokens) // 2000
        |                     ORDER BY hx, doc_id)::BIGINT AS shard_pos
        |FROM c""".stripMargin,

    "k_hist_quantile_grouped" ->
      """WITH h AS (
        |  SELECT l_returnflag,
        |    least(greatest(floor((l_extendedprice - 900.0) / 1626.5625), 0), 63)::BIGINT AS bucket,
        |    count(*) AS cnt
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1, 2),
        |c AS (
        |  SELECT l_returnflag, bucket, cnt,
        |    sum(cnt) OVER (PARTITION BY l_returnflag ORDER BY bucket) AS cum,
        |    sum(cnt) OVER (PARTITION BY l_returnflag) AS n
        |  FROM h),
        |probes AS (SELECT unnest([0.5, 0.95])::DOUBLE AS q)
        |SELECT l_returnflag, q,
        |  round(900.0 + bucket * 1626.5625 +
        |        1626.5625 * (ceil(q * n) - (cum - cnt)) / cnt, 6) AS qtile
        |FROM c CROSS JOIN probes
        |WHERE cum >= ceil(q * n) AND (cum - cnt) < ceil(q * n)""".stripMargin,

    "f_sql_nfc" ->
      """SELECT doc_id,
        |  md5(nfc_normalize(coalesce(text, '') || ' e' || chr(769) || 'A' || chr(778))) AS h
        |FROM documents""".stripMargin,

    "f_sql_cosine" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine,
        |  round(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]), 6) AS self_dot
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |WHERE a.vec_id < 100""".stripMargin,

    // exact mode below 2^lgK: the sketch estimate IS the distinct count
    "f_sql_theta" ->
      """SELECT lang, count(DISTINCT doc_id)::BIGINT AS n_distinct
        |FROM documents GROUP BY lang""".stripMargin,

    // the deterministic half of the Bloom contract: zero false negatives
    "f_sql_bloom" ->
      """SELECT lang, count(*) AS n_checked, 0::BIGINT AS n_missed
        |FROM documents GROUP BY lang""".stripMargin,

    "t_token_stats" ->
      """SELECT doc_id,
        |  CASE WHEN trim(text) = '' THEN 0
        |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
        |  length(text) AS n_chars,
        |  len(list_filter(
        |    regexp_split_to_array(
        |      regexp_replace(text, '([^\p{L}\p{N}\s])', ' \1 ', 'g'), '\s+'),
        |    t -> t <> '')) AS n_subtokens
        |FROM documents""".stripMargin,

    "t_quality" ->
      """WITH t AS (
        |  SELECT doc_id, text,
        |    CASE WHEN trim(text) = '' THEN []::VARCHAR[]
        |         ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  length(text) AS n_chars,
        |  len(toks) AS n_tokens,
        |  round((length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))::DOUBLE
        |        / greatest(length(text), 1), 6) AS punct_ratio,
        |  round(len(list_filter(toks, t -> t IN ('the','a','an','and','or','of','to','in','is','it','that','for')))::DOUBLE
        |        / greatest(len(toks), 1), 6) AS stopword_frac,
        |  round((length(text) - (len(toks) - 1))::DOUBLE / greatest(len(toks), 1), 6) AS mean_token_len
        |FROM t""".stripMargin,

    "t_langid" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(lower(text)) = '' THEN []::VARCHAR[]
        |         ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    len(list_filter(toks, x -> x IN ('the','a','and','of','to','is'))) AS s_en,
        |    len(list_filter(toks, x -> x IN ('der','die','das','und','ist','ein'))) AS s_de,
        |    len(list_filter(toks, x -> x IN ('le','la','les','et','est','un'))) AS s_fr,
        |    len(list_filter(toks, x -> x IN ('el','la','los','y','es','un'))) AS s_es,
        |    len(list_filter(toks, x -> x IN ('的','是','了','在','和','我'))) AS s_zh
        |  FROM t)
        |SELECT doc_id,
        |  CASE greatest(s_en, s_de, s_fr, s_es, s_zh, 0)
        |    WHEN 0 THEN 'und'
        |    WHEN s_en THEN 'en' WHEN s_de THEN 'de' WHEN s_fr THEN 'fr'
        |    WHEN s_es THEN 'es' ELSE 'zh' END AS lang_pred,
        |  greatest(s_en, s_de, s_fr, s_es, s_zh, 0) AS lang_score
        |FROM s""".stripMargin,

    // trained-langid replay: retrain the per-class censuses from the
    // same hashed features, rebuild micro weights / smoothing floors /
    // priors with the identical round(log10(·)·1e6) ops, score every
    // (doc, class) pair as an exact integer sum, argmax (score desc,
    // lang asc) — the struct-min tie rule the stateless server uses
    "t_burstiness" ->
      """WITH bno AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
        |  FROM documents),
        |btk AS (
        |  SELECT doc_id, t FROM (SELECT doc_id,
        |      unnest(regexp_split_to_array(norm, '\s+')) AS t FROM bno)
        |  WHERE t <> ''),
        |bpd AS (
        |  SELECT t, doc_id, count(*)::BIGINT AS x
        |  FROM btk GROUP BY 1, 2),
        |bnd AS (SELECT count(*)::BIGINT AS n_docs FROM documents)
        |SELECT t, count(*)::BIGINT AS n_docs_with, sum(x)::BIGINT AS tf,
        |  round((d.n_docs::HUGEINT * sum(x::HUGEINT * x)
        |      - sum(x)::HUGEINT * sum(x))::DOUBLE
        |    / (d.n_docs::DOUBLE * sum(x)::DOUBLE), 6) AS dispersion
        |FROM bpd, bnd d
        |GROUP BY t, d.n_docs
        |HAVING sum(x) >= 10""".stripMargin,

    "t_good_turing" ->
      """WITH gno AS (
        |  SELECT trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
        |  FROM documents),
        |gtk AS (
        |  SELECT t FROM (
        |    SELECT unnest(regexp_split_to_array(norm, '\s+')) AS t
        |    FROM gno)
        |  WHERE t <> ''),
        |gtr AS (SELECT t, count(*)::BIGINT AS r FROM gtk GROUP BY 1),
        |gff AS (SELECT r, count(*)::BIGINT AS n_r FROM gtr GROUP BY 1),
        |gtt AS (SELECT sum(r)::BIGINT AS total FROM gtr),
        |gl AS (
        |  SELECT r, n_r, lead(r) OVER (ORDER BY r) AS nr2,
        |    lead(n_r) OVER (ORDER BY r) AS nn2
        |  FROM gff)
        |SELECT r, n_r,
        |  CASE WHEN nr2 = r + 1 THEN
        |    round((r + 1)::DOUBLE * nn2 / n_r, 6) END AS r_star,
        |  CASE WHEN nr2 = r + 1 THEN
        |    CAST(round((r + 1)::DOUBLE * nn2 / n_r * 1000000.0 / t.total)
        |      AS BIGINT) END AS p_micro
        |FROM gl, gtt t
        |UNION ALL
        |SELECT 0::BIGINT, 0::BIGINT,
        |  round(n_r::DOUBLE / t.total, 6),
        |  CAST(round(n_r::DOUBLE * 1000000.0 / t.total) AS BIGINT)
        |FROM gff, gtt t WHERE r = 1""".stripMargin,

    "t_trending" ->
      """WITH tnorm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
        |  FROM documents),
        |tf AS (
        |  SELECT CASE WHEN doc_id % 2 = 1 THEN 'b' ELSE 'a' END AS p,
        |    w AS item
        |  FROM (SELECT doc_id,
        |      unnest(regexp_split_to_array(norm, '\s+')) AS w
        |    FROM tnorm)
        |  WHERE length(w) >= 4),
        |cen AS (SELECT p, item, count(*)::BIGINT AS n
        |  FROM tf GROUP BY 1, 2),
        |top AS (
        |  SELECT p, item,
        |    row_number() OVER (PARTITION BY p ORDER BY n DESC, item ASC)
        |      AS rank
        |  FROM cen QUALIFY rank <= 20),
        |ta AS (SELECT item, rank AS rank_a FROM top WHERE p = 'a'),
        |tb AS (SELECT item, rank AS rank_b FROM top WHERE p = 'b'),
        |ca AS (SELECT item, n AS n_a FROM cen WHERE p = 'a'),
        |cb AS (SELECT item, n AS n_b FROM cen WHERE p = 'b')
        |SELECT coalesce(ta.item, tb.item) AS item,
        |  coalesce(ca.n_a, 0)::BIGINT AS n_a,
        |  coalesce(cb.n_b, 0)::BIGINT AS n_b,
        |  ta.rank_a, tb.rank_b,
        |  CASE WHEN ta.rank_a IS NULL THEN 'new'
        |       WHEN tb.rank_b IS NULL THEN 'dropped'
        |       WHEN tb.rank_b < ta.rank_a THEN 'up'
        |       WHEN tb.rank_b > ta.rank_a THEN 'down'
        |       ELSE 'flat' END AS status
        |FROM ta FULL JOIN tb ON ta.item = tb.item
        |LEFT JOIN ca ON ca.item = coalesce(ta.item, tb.item)
        |LEFT JOIN cb ON cb.item = coalesce(ta.item, tb.item)""".stripMargin,

    // code-switch oracle: the shared langid model chain, then segment
    // slices re-enter the same feature/score/argmax arithmetic
    "t_code_switch" ->
      s"""WITH $langNbScoresSql,
        |csg AS (
        |  SELECT doc_id,
        |    unnest(range(0, (len(toks) - 1) // 8 + 1))::BIGINT AS seg,
        |    toks
        |  FROM toks WHERE len(toks) > 0),
        |cst AS (
        |  SELECT doc_id, seg,
        |    list_slice(toks, (seg * 8 + 1)::INT, (seg * 8 + 8)::INT)
        |      AS stoks
        |  FROM csg),
        |csf AS (
        |  SELECT doc_id, seg, t FROM (
        |    SELECT doc_id, seg, unnest(stoks) AS t FROM cst)
        |  WHERE t <> ''
        |  UNION ALL
        |  SELECT doc_id, seg, g FROM (
        |    SELECT doc_id, seg,
        |      unnest([array_to_string(stoks[i:i+1], ' ')
        |        FOR i IN range(1, len(stoks))]) AS g
        |    FROM cst WHERE len(stoks) >= 2)),
        |csb AS (
        |  SELECT doc_id, seg,
        |    ('0x' || substr(md5(t), 1, 15))::BIGINT % 1024 AS b
        |  FROM csf),
        |css AS (
        |  SELECT f.doc_id, f.seg, l.cls,
        |    sum(coalesce(w.w, dd.d, 0))::BIGINT AS fsum
        |  FROM csb f CROSS JOIN cls l
        |  LEFT JOIN lw w ON w.cls = l.cls AND w.b = f.b
        |  LEFT JOIN ldef dd ON dd.cls = l.cls
        |  GROUP BY 1, 2, 3),
        |cspick AS (
        |  SELECT doc_id, seg, cls FROM (
        |    SELECT s.doc_id, s.seg, s.cls,
        |      row_number() OVER (PARTITION BY s.doc_id, s.seg
        |        ORDER BY (s.fsum + p.p) DESC, s.cls ASC) AS rn
        |    FROM css s JOIN lpr p ON p.cls = s.cls)
        |  WHERE rn = 1),
        |cscen AS (
        |  SELECT doc_id, cls AS pred_lang, count(*)::BIGINT AS n
        |  FROM cspick GROUP BY 1, 2),
        |csrk AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY n DESC, pred_lang ASC) AS rn
        |  FROM cscen)
        |SELECT doc_id, sum(n)::BIGINT AS n_segs,
        |  count(*)::BIGINT AS n_langs,
        |  max(CASE WHEN rn = 1 THEN pred_lang END) AS majority_lang,
        |  max(CASE WHEN rn = 1 THEN n END)::BIGINT AS n_majority,
        |  max(CASE WHEN rn = 1 THEN n END)::DOUBLE / sum(n)
        |    AS majority_share,
        |  count(*) > 1 AS switched
        |FROM csrk GROUP BY doc_id""".stripMargin,

    "t_langid_nb" ->
      s"""WITH $langNbScoresSql,
        |lrk AS (
        |  SELECT doc_id, cls, total, nf,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY total DESC, cls ASC) AS rn
        |  FROM alls)
        |SELECT doc_id, nf::BIGINT AS n_feats, cls AS pred_lang,
        |  total::BIGINT AS score_micro
        |FROM lrk WHERE rn = 1""".stripMargin,

    // Confident-learning label noise over the SAME (doc, class) score
    // frame: per-class thresholds as exact (sum, count) pairs from
    // own-class rows, candidate membership by integer cross-multiply
    // s·n_k ≥ S_k, argmax among candidates (score desc, cls asc),
    // flagged iff the confident suggestion disagrees with the label.
    "v_mondrian" -> {
      val k = 25
      def ls(i: Int) =
        s"list_sort([{'v': m.v$i, 'c': m.c} FOR m IN r.members])"
      def med(i: Int) =
        s"([${ls(i)}[j].v FOR j IN range(1, len(${ls(i)}) + 1) " +
          s"IF coalesce(list_sum([s.c FOR s IN ${ls(i)}[1:j]]), 0) >= q.half])[1]"
      s"""WITH RECURSIVE mdq AS MATERIALIZED (
        |  SELECT (n_chars // 25)::BIGINT AS v1, (doc_id % 20)::BIGINT AS v2,
        |    count(*)::BIGINT AS c
        |  FROM documents GROUP BY 1, 2),
        |mgw AS (SELECT greatest(max(v1) - min(v1), 1)::BIGINT AS g1,
        |               greatest(max(v2) - min(v2), 1)::BIGINT AS g2 FROM mdq),
        |mrec AS (
        |  SELECT list({'v1': v1, 'v2': v2, 'c': c}) AS members, false AS fin
        |  FROM mdq
        |  UNION ALL
        |  SELECT u.ms AS members, u.fin AS fin
        |  FROM mrec r
        |  CROSS JOIN mgw,
        |  unnest([{'total': coalesce(list_sum([m.c FOR m IN r.members]), 0),
        |           'w1': list_max([m.v1 FOR m IN r.members])
        |             - list_min([m.v1 FOR m IN r.members]),
        |           'w2': list_max([m.v2 FOR m IN r.members])
        |             - list_min([m.v2 FOR m IN r.members])}]) AS s1(p),
        |  unnest([{'first1': p.w1 * g2 >= p.w2 * g1,
        |           'half': (p.total + 1) // 2}]) AS s2(q),
        |  unnest([{'med1': ${med(1)}, 'med2': ${med(2)}}]) AS s3(w),
        |  unnest([{'l1': list_filter(r.members, m -> m.v1 <= w.med1),
        |           'l2': list_filter(r.members, m -> m.v2 <= w.med2)}]) AS s4(h),
        |  unnest([{'ln1': coalesce(list_sum([m.c FOR m IN h.l1]), 0),
        |           'ln2': coalesce(list_sum([m.c FOR m IN h.l2]), 0)}]) AS s5(t),
        |  unnest([{'ok1': p.total >= 2 * $k AND t.ln1 >= $k
        |             AND p.total - t.ln1 >= $k AND len(h.l1) < len(r.members),
        |           'ok2': p.total >= 2 * $k AND t.ln2 >= $k
        |             AND p.total - t.ln2 >= $k AND len(h.l2) < len(r.members)}])
        |    AS s6(o),
        |  unnest(CASE
        |    WHEN (q.first1 AND o.ok1) OR (NOT q.first1 AND NOT o.ok2 AND o.ok1)
        |      THEN [{'ms': h.l1, 'fin': false},
        |            {'ms': list_filter(r.members, m -> m.v1 > w.med1),
        |             'fin': false}]
        |    WHEN (NOT q.first1 AND o.ok2) OR (q.first1 AND NOT o.ok1 AND o.ok2)
        |      THEN [{'ms': h.l2, 'fin': false},
        |            {'ms': list_filter(r.members, m -> m.v2 > w.med2),
        |             'fin': false}]
        |    ELSE [{'ms': r.members, 'fin': true}]
        |  END) AS s7(u)
        |  WHERE NOT r.fin)
        |SELECT m.v1 AS q_len, m.v2 AS q_grp,
        |  list_min([x.v1 FOR x IN r.members]) AS q_len_lo,
        |  list_min([x.v2 FOR x IN r.members]) AS q_grp_lo,
        |  list_max([x.v1 FOR x IN r.members]) AS q_len_hi,
        |  list_max([x.v2 FOR x IN r.members]) AS q_grp_hi,
        |  coalesce(list_sum([x.c FOR x IN r.members]), 0)::BIGINT AS ec_size,
        |  coalesce(list_sum([x.c FOR x IN r.members]), 0) >= $k AS anonymous
        |FROM mrec r, unnest(r.members) AS tt(m)
        |WHERE r.fin""".stripMargin
    },

    "v_label_noise" ->
      s"""WITH $langNbScoresSql,
        |vlab AS (SELECT doc_id, coalesce(lang, 'und') AS label FROM documents),
        |vthr AS (
        |  SELECT a.cls, sum(a.total)::BIGINT AS s_sum, count(*)::BIGINT AS s_n
        |  FROM alls a JOIN vlab l ON l.doc_id = a.doc_id AND l.label = a.cls
        |  GROUP BY 1),
        |vcand AS (
        |  SELECT a.doc_id, a.cls, a.total
        |  FROM alls a JOIN vthr t ON t.cls = a.cls
        |  WHERE a.total * t.s_n >= t.s_sum),
        |vbest AS (
        |  SELECT doc_id, cls AS suggested FROM (
        |    SELECT doc_id, cls,
        |      row_number() OVER (PARTITION BY doc_id
        |        ORDER BY total DESC, cls ASC) AS rn
        |    FROM vcand) WHERE rn = 1)
        |SELECT l.doc_id, l.label,
        |  coalesce(b.suggested, l.label) AS suggested,
        |  (b.suggested IS NOT NULL AND b.suggested <> l.label) AS flagged
        |FROM vlab l LEFT JOIN vbest b ON b.doc_id = l.doc_id""".stripMargin,

    // leaked-span replay: same engineered test docs from token arrays,
    // train window-digest set, matched-window coverage, gaps-and-islands
    "d_leaked_spans" ->
      """WITH karr AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13)) = '' THEN []::VARCHAR[]
        |         ELSE regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13)), '\s+') END AS arr
        |  FROM documents),
        |test AS MATERIALIZED (
        |  SELECT doc_id,
        |    arr[1:12]
        |      || ['novel' || doc_id::VARCHAR || 'x' || i FOR i IN range(0, 6)]
        |      || arr[13:20] AS tarr
        |  FROM karr WHERE doc_id % 10 = 0 AND len(arr) >= 21),
        |trainw AS MATERIALIZED (
        |  SELECT DISTINCT md5(array_to_string(arr[i+1:i+8], ' ')) AS dig
        |  FROM karr, unnest(range(0, greatest(len(arr) - 7, 0))) AS t(i)),
        |testw AS (
        |  SELECT doc_id, i AS wpos,
        |    md5(array_to_string(tarr[i+1:i+8], ' ')) AS dig
        |  FROM test, unnest(range(0, greatest(len(tarr) - 7, 0))) AS t(i)),
        |cov AS (
        |  SELECT DISTINCT w.doc_id, p.pos
        |  FROM testw w JOIN trainw USING (dig),
        |       unnest(range(w.wpos, w.wpos + 8)) AS p(pos)),
        |isl AS (
        |  SELECT doc_id, pos,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS g
        |  FROM cov),
        |sp AS (
        |  SELECT doc_id, min(pos)::BIGINT AS span_start, count(*)::BIGINT AS span_len
        |  FROM isl GROUP BY doc_id, g)
        |SELECT sp.doc_id, sp.span_start, sp.span_len,
        |  array_to_string(t.tarr[sp.span_start+1:sp.span_start+sp.span_len], ' ') AS span_text
        |FROM sp JOIN test t USING (doc_id)""".stripMargin,

    // mojibake replay: the identical generated replace chain, same
    // order, same planted garbled suffix — one table, two engines
    "t_fix_mojibake" -> {
      val cleanSuffix = "é à — € “q” … ™ ü ñ ©"
      val badSuffix = new String(
        cleanSuffix.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        "windows-1252")
      def esc(x: String) = x.replace("'", "''")
      val chain = TextAnalysis.MojibakeTable.foldLeft(
        s"coalesce(text, '') || ' ' || '${esc(badSuffix)}'") {
        case (e, (bad, good)) => s"replace($e, '${esc(bad)}', '${esc(good)}')"
      }
      s"SELECT doc_id, $chain AS fixed_text FROM documents"
    },

    // char-entropy replay: per-(doc, char) census, micro-fixed ln terms,
    // exact integer sum, identical fixed-order bits conversion
    "t_char_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents),
        |cen AS (
        |  SELECT doc_id, c, count(*)::BIGINT AS n
        |  FROM ch WHERE c <> '' GROUP BY 1, 2),
        |tot AS (SELECT doc_id, sum(n)::BIGINT AS nc FROM cen GROUP BY 1),
        |tm AS (
        |  SELECT cen.doc_id,
        |    cen.n * CAST(round(ln(tot.nc::DOUBLE / cen.n) * 1e6) AS BIGINT) AS t
        |  FROM cen JOIN tot USING (doc_id)),
        |ag AS (SELECT doc_id, sum(t)::BIGINT AS hsum FROM tm GROUP BY 1)
        |SELECT d.doc_id, coalesce(tot.nc, 0)::BIGINT AS n_chars,
        |  round(ag.hsum::DOUBLE / 1e6 / tot.nc / 0.6931471805599453, 6) AS char_entropy_bits
        |FROM documents d
        |LEFT JOIN tot USING (doc_id) LEFT JOIN ag USING (doc_id)""".stripMargin,

    // novelty replay: distinct 3-shingle sets per doc, reference = the
    // %3==0 slice's union set, unseen fraction with the same op order
    "t_novelty" ->
      """WITH nnorm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
        |  FROM documents),
        |ntok AS (
        |  SELECT doc_id, CASE WHEN norm = '' THEN []::VARCHAR[]
        |       ELSE regexp_split_to_array(norm, '\s+') END AS toks
        |  FROM nnorm WHERE norm IS NOT NULL),
        |nsh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]
        |    END)) AS g
        |  FROM ntok),
        |nref AS (SELECT DISTINCT g FROM nsh WHERE doc_id % 3 = 0),
        |nsz AS (SELECT doc_id, count(*)::BIGINT AS n FROM nsh GROUP BY 1),
        |nseen AS (
        |  SELECT s.doc_id, count(*)::BIGINT AS m
        |  FROM nsh s JOIN nref USING (g) GROUP BY 1)
        |SELECT d.doc_id,
        |  coalesce(nsz.n, 0)::BIGINT AS n_shingles,
        |  coalesce(nseen.m, 0)::BIGINT AS n_seen,
        |  CASE WHEN coalesce(nsz.n, 0) > 0
        |    THEN round(1.0 - coalesce(nseen.m, 0)::DOUBLE / nsz.n, 6) END AS novelty
        |FROM documents d
        |LEFT JOIN nsz USING (doc_id) LEFT JOIN nseen USING (doc_id)""".stripMargin,

    "t_repetition" ->
      """WITH norm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id,
        |    CASE WHEN norm = '' THEN []::VARCHAR[]
        |         ELSE regexp_split_to_array(norm, '\s+') END AS toks
        |  FROM norm),
        |sh AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) < 2 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+1], ' ') FOR i IN range(1, len(toks))]
        |    END AS sh2,
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]
        |    END AS sh3
        |  FROM tok)
        |SELECT doc_id,
        |  round(1 - len(list_distinct(sh2))::DOUBLE / greatest(len(sh2), 1), 6) AS dup_2gram_frac,
        |  round(1 - len(list_distinct(sh3))::DOUBLE / greatest(len(sh3), 1), 6) AS dup_3gram_frac
        |FROM sh""".stripMargin,

    "t_redact" ->
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(
        |    text || ' contact jane.doe+spam@mail.example.org or 10.0.255.7 or +1 555-867-5309 now',
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\b\+?\d{3}[- ]\d{3}[- ]\d{4}\b', '<PHONE>', 'g') AS redacted
        |FROM documents""".stripMargin,

    "t_tfidf_topk" ->
      """WITH norm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id,
        |    CASE WHEN norm = '' THEN []::VARCHAR[]
        |         ELSE regexp_split_to_array(norm, '\s+') END AS toks
        |  FROM norm),
        |tfq AS (
        |  SELECT doc_id, term, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(toks) AS term FROM tok)
        |  WHERE term <> '' GROUP BY 1, 2),
        |dfq AS (SELECT term, count(*) AS df FROM tfq GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, term, tf, df,
        |    round(tf * ln(n_docs::DOUBLE / df), 6) AS score
        |  FROM tfq JOIN dfq USING (term) CROSS JOIN n),
        |ranked AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank
        |  FROM scored)
        |SELECT doc_id, term, tf, df, score, rank
        |FROM ranked WHERE rank <= 5""".stripMargin,

    // The wide-sketch regime is purge-free at gate scale and the gate
    // REQUIRES est = lb = ub = exact on every probe term, so the output
    // is fully deterministic: the exact top-50 census with the count
    // replicated across the estimate columns. (The purge-mode bounds
    // half of the gate stays in-gate contracts — purge history is
    // engine-specific; the OUTPUT never carries it.)
    "t_freq_hitters" ->
      """WITH norm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
        |  FROM documents),
        |tok AS (
        |  SELECT CASE WHEN norm = '' THEN []::VARCHAR[]
        |              ELSE regexp_split_to_array(norm, '\s+') END AS toks
        |  FROM norm),
        |cen AS (
        |  SELECT term, count(*) AS freq
        |  FROM (SELECT unnest(toks) AS term FROM tok)
        |  WHERE term <> ''
        |  GROUP BY term ORDER BY freq DESC, term ASC LIMIT 50)
        |SELECT term, freq AS exact, freq AS est, freq AS lb, freq AS ub
        |FROM cen""".stripMargin,

    "t_heavy_hitters" ->
      """WITH norm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
        |  FROM documents),
        |tok AS (
        |  SELECT CASE WHEN norm = '' THEN []::VARCHAR[]
        |              ELSE regexp_split_to_array(norm, '\s+') END AS toks
        |  FROM norm)
        |SELECT term, count(*) AS freq
        |FROM (SELECT unnest(toks) AS term FROM tok)
        |WHERE term <> ''
        |GROUP BY term ORDER BY freq DESC, term ASC LIMIT 50""".stripMargin,

    // BM25 constants embedded from the SAME Scala doubles the operator
    // uses (toString round-trips), so the one float chain per (q,d,term)
    // replays in order before the micro fix; avgdl is a sum of longs in
    // double (exact below 2^53 — integer partials), so it is order-free
    "r_bm25_topk" -> bm25OracleSql(1.0),

    "r_vsm_topk" ->
      s"""WITH $vsmChainSql
        |SELECT query_id, doc_id, cosine, rank FROM rk WHERE rank <= 10""".stripMargin,

    "r_ndcg" ->
      s"""WITH $vsmChainSql,
        |judg AS (
        |  SELECT q.query_id, d.doc_id,
        |    CASE WHEN d.doc_id = q.query_id THEN 3 ELSE 1 END AS rel
        |  FROM (SELECT doc_id AS query_id FROM documents WHERE doc_id % 97 = 0) q
        |  JOIN documents d ON d.doc_id % 10 = q.query_id % 10),
        |dcg AS (
        |  SELECT rk.query_id,
        |    sum(((1::BIGINT << coalesce(j.rel, 0)) - 1)
        |      * CAST(round(1e6 / (ln(rk.rank + 1.0) / ln(2.0))) AS BIGINT))::BIGINT AS dcg_micro
        |  FROM rk LEFT JOIN judg j
        |    ON j.query_id = rk.query_id AND j.doc_id = rk.doc_id
        |  WHERE rk.rank <= 10 GROUP BY 1),
        |ideal AS (
        |  SELECT query_id, doc_id, rel,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY rel DESC, doc_id ASC) AS irank
        |  FROM judg),
        |idcg AS (
        |  SELECT query_id,
        |    sum(((1::BIGINT << rel) - 1)
        |      * CAST(round(1e6 / (ln(irank + 1.0) / ln(2.0))) AS BIGINT))::BIGINT AS idcg_micro
        |  FROM ideal WHERE irank <= 10 GROUP BY 1)
        |SELECT d.query_id, d.dcg_micro, i.idcg_micro,
        |  CASE WHEN i.idcg_micro > 0
        |       THEN round(d.dcg_micro::DOUBLE / i.idcg_micro, 6) END AS ndcg
        |FROM dcg d JOIN idcg i USING (query_id)""".stripMargin,

    "r_bm25_capped" -> bm25OracleSql(0.78),

    "r_rrf_hybrid" ->
      s"""WITH ${bm25ChainSql(1.0)},
        |lex AS (SELECT query_id, doc_id, rank FROM rk WHERE rank <= 10),
        |sq AS (SELECT vec_id AS query_id, embedding AS qv
        |       FROM embeddings WHERE vec_id % 97 = 0),
        |sc0 AS (
        |  SELECT query_id, vec_id AS doc_id,
        |    list_cosine_similarity(embedding::DOUBLE[], qv::DOUBLE[]) AS cos
        |  FROM embeddings CROSS JOIN sq WHERE vec_id <> query_id),
        |sem AS (
        |  SELECT query_id, doc_id, rank FROM (
        |    SELECT query_id, doc_id, row_number() OVER (
        |      PARTITION BY query_id ORDER BY round(cos, 6) DESC, doc_id ASC) AS rank
        |    FROM sc0)
        |  WHERE rank <= 10),
        |terms AS (
        |  SELECT query_id, doc_id,
        |    CAST(round(1.0 / (60.0 + rank) * 1e6) AS BIGINT) AS r FROM lex
        |  UNION ALL
        |  SELECT query_id, doc_id,
        |    CAST(round(1.0 / (60.0 + rank) * 1e6) AS BIGINT) AS r FROM sem),
        |fused AS (
        |  SELECT query_id, doc_id, sum(r)::BIGINT AS rrf_micro
        |  FROM terms GROUP BY 1, 2),
        |fr AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY query_id ORDER BY rrf_micro DESC, doc_id ASC) AS rank
        |  FROM fused)
        |SELECT query_id, doc_id, rrf_micro,
        |  round(rrf_micro::DOUBLE / 1e6, 6) AS rrf_score, rank
        |FROM fr WHERE rank <= 10""".stripMargin,

    "s_hash_split" ->
      s"""SELECT doc_id,
         |  CASE WHEN substr(md5(doc_id::VARCHAR), 1, 8) < '${HashSplit.thresholdHex(0.8)}' THEN 'train'
         |       WHEN substr(md5(doc_id::VARCHAR), 1, 8) < '${HashSplit.thresholdHex(0.9)}' THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents""".stripMargin,

    "s_group_splits" ->
      s"""SELECT doc_id, source,
         |  CASE WHEN substr(md5(source), 1, 8) < '${HashSplit.thresholdHex(0.8)}' THEN 'train'
         |       WHEN substr(md5(source), 1, 8) < '${HashSplit.thresholdHex(0.9)}' THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents""".stripMargin,

    "s_temporal_split" ->
      """WITH tse AS (
        |  SELECT event_id, epoch_us(ts::TIMESTAMP) AS us FROM events),
        |tsc AS (
        |  SELECT us AS cut FROM tse ORDER BY us
        |  LIMIT 1 OFFSET (SELECT greatest(count(*) * 7 // 10, 1) - 1 FROM tse))
        |SELECT event_id,
        |  CASE WHEN us <= cut THEN 'train'
        |       WHEN us <= cut + 21600000000 THEN 'embargo'
        |       ELSE 'test' END AS split
        |FROM tse CROSS JOIN tsc""".stripMargin,

    "s_exact_split" ->
      """WITH xb AS (
        |  SELECT doc_id AS id, lang AS stratum,
        |    md5('xsplit:42:' || doc_id) AS d
        |  FROM documents),
        |xr AS (
        |  SELECT id, stratum,
        |    row_number() OVER (PARTITION BY stratum ORDER BY d ASC, id ASC) - 1 AS r,
        |    count(*) OVER (PARTITION BY stratum) AS n
        |  FROM xb)
        |SELECT id, stratum,
        |  CASE WHEN r < floor(0.8 * n) THEN 'train'
        |       WHEN r < floor(0.9 * n) THEN 'val'
        |       ELSE 'test' END AS split
        |FROM xr""".stripMargin,

    "s_stratified_hash" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE CASE lang
         |  WHEN 'en' THEN substr(md5(doc_id::VARCHAR), 1, 8) < '${HashSplit.thresholdHex(0.3)}'
         |  WHEN 'zh' THEN TRUE
         |  ELSE substr(md5(doc_id::VARCHAR), 1, 8) < '${HashSplit.thresholdHex(0.6)}'
         |  END""".stripMargin,

    "s_weighted_sample" ->
      """WITH ws AS (
        |  SELECT doc_id, (n_chars // 256 + 1)::BIGINT AS w FROM documents),
        |ex AS (
        |  SELECT doc_id, w, unnest(range(1, least(w, 4096) + 1)) AS j
        |  FROM ws),
        |keys AS (
        |  SELECT doc_id AS id, w,
        |    max(('0x' || substr(md5('aes:42:' || doc_id || ':' || j), 1, 15))::BIGINT)
        |      AS key_h
        |  FROM ex GROUP BY 1, 2)
        |SELECT id, w, key_h FROM keys
        |ORDER BY key_h DESC, id ASC LIMIT 100""".stripMargin,

    "s_weighted_sample_log" ->
      """WITH ws AS (
        |  SELECT doc_id AS id, (n_chars + 1)::DOUBLE AS w FROM documents),
        |keys AS (
        |  SELECT id, w,
        |    CAST(round(ln((('0x' || substr(md5('aes:42:' || id || ':0'), 1, 15))::BIGINT::DOUBLE + 0.5)
        |        / 1.152921504606846976e18) / w * 1e9) AS BIGINT) AS key_nano
        |  FROM ws)
        |SELECT id, w, key_nano FROM keys
        |ORDER BY key_nano DESC, id ASC LIMIT 100""".stripMargin,

    "s_weighted_group" ->
      """WITH ws AS (
        |  SELECT lang AS grp, doc_id AS id,
        |    (n_chars // 512 + 1)::BIGINT AS w FROM documents),
        |ex AS (
        |  SELECT grp, id, w, unnest(range(1, least(w, 4096) + 1)) AS j
        |  FROM ws),
        |keys AS (
        |  SELECT grp, id, w,
        |    max(('0x' || substr(md5('aes:42:' || id || ':' || j), 1, 15))::BIGINT)
        |      AS key_h
        |  FROM ex GROUP BY 1, 2, 3),
        |rk AS (
        |  SELECT grp, id, w, key_h,
        |    row_number() OVER (PARTITION BY grp
        |      ORDER BY key_h DESC, id ASC) AS rank
        |  FROM keys)
        |SELECT grp, id, w, key_h, rank::BIGINT AS rank
        |FROM rk WHERE rank <= 5""".stripMargin,

    "a21_card_quantiles" ->
      """WITH qr AS (
        |  SELECT lang, source, n_chars,
        |    row_number() OVER (PARTITION BY lang, source ORDER BY n_chars) AS rn,
        |    count(*) OVER (PARTITION BY lang, source) AS n
        |  FROM documents WHERE n_chars IS NOT NULL)
        |SELECT lang, source, max(n)::BIGINT AS n_docs,
        |  max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
        |    THEN n_chars END)::DOUBLE AS p50,
        |  max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
        |    THEN n_chars END)::DOUBLE AS p90,
        |  max(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT)
        |    THEN n_chars END)::DOUBLE AS p99
        |FROM qr GROUP BY lang, source""".stripMargin,

    "a12_dataset_card" ->
      """WITH t AS (
        |  SELECT lang, source, length(text) AS n_chars,
        |    CASE WHEN trim(text) = '' THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_toks,
        |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp
        |  FROM documents)
        |SELECT lang, source,
        |  count(*) AS n_docs,
        |  sum(n_toks)::BIGINT AS total_tokens,
        |  sum(n_chars)::BIGINT AS total_chars,
        |  round(avg(n_toks), 6) AS avg_tokens,
        |  count(DISTINCT fp) AS distinct_fp,
        |  round(1 - count(DISTINCT fp)::DOUBLE / count(*), 6) AS dup_doc_frac
        |FROM t GROUP BY 1, 2""".stripMargin,

    "a13_snapshot_diff" ->
      """WITH prev AS (
        |  SELECT doc_id,
        |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp
        |  FROM documents),
        |cur0 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN text || ' zz' ELSE text END AS text
        |  FROM documents WHERE doc_id % 5 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0),
        |cur AS (
        |  SELECT doc_id,
        |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp
        |  FROM cur0)
        |SELECT coalesce(p.doc_id, c.doc_id) AS doc_id,
        |  CASE WHEN p.doc_id IS NULL THEN 'added'
        |       WHEN c.doc_id IS NULL THEN 'removed'
        |       WHEN p.fp IS NOT DISTINCT FROM c.fp THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM prev p FULL JOIN cur c ON p.doc_id = c.doc_id""".stripMargin,

    "a19_dedup_card" ->
      """WITH adoc AS (
        |  SELECT lang, source, text FROM documents
        |  UNION ALL SELECT lang, source, text FROM documents),
        |anorm AS (
        |  SELECT lang, source,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
        |  FROM adoc),
        |abase AS (
        |  SELECT lang, source,
        |    CASE WHEN norm IS NULL THEN NULL WHEN norm = '' THEN 0
        |         ELSE len(regexp_split_to_array(norm, '\s+')) END AS n,
        |    md5(norm) AS fp
        |  FROM anorm),
        |afp AS (
        |  SELECT lang, source, fp, count(*)::BIGINT AS n_docs,
        |    sum(n)::BIGINT AS toks_all, min(n)::BIGINT AS toks_one
        |  FROM abase GROUP BY 1, 2, 3),
        |aroll AS (
        |  SELECT lang, source, sum(n_docs)::BIGINT AS n_docs,
        |    count(*)::BIGINT AS n_unique_docs,
        |    coalesce(sum(toks_all), 0)::BIGINT AS tokens_raw,
        |    coalesce(sum(toks_one), 0)::BIGINT AS tokens_unique
        |  FROM afp GROUP BY 1, 2)
        |SELECT lang, source, n_docs, n_unique_docs, tokens_raw,
        |  tokens_unique,
        |  CASE WHEN tokens_raw > 0 THEN
        |    round(1.0 - tokens_unique::DOUBLE / tokens_raw, 6) END
        |    AS dup_token_frac
        |FROM aroll""".stripMargin,

    "v_split_leakage" -> {
      val t1 = HashSplit.thresholdHex(0.8)
      val t2 = HashSplit.thresholdHex(0.9)
      s"""WITH ldoc AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents),
        |lfp AS (
        |  SELECT doc_id,
        |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^\\p{L}\\p{N}\\s]', ' ', 'g'), '\\s+', ' ', 'g'))) AS fp,
        |    CASE WHEN substr(md5(doc_id::VARCHAR), 1, 8) < '$t1' THEN 'train'
        |         WHEN substr(md5(doc_id::VARCHAR), 1, 8) < '$t2' THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM ldoc WHERE text IS NOT NULL),
        |lps AS (
        |  SELECT fp, split, count(*)::BIGINT AS n FROM lfp GROUP BY 1, 2)
        |SELECT a.split AS split_a, b.split AS split_b,
        |  sum(a.n * b.n)::BIGINT AS n_pairs
        |FROM lps a JOIN lps b ON a.fp = b.fp AND a.split < b.split
        |GROUP BY 1, 2""".stripMargin
    },

    "x_mann_whitney" -> {
      val varSql = "(n_a::DOUBLE * n_b / 12.0) * ((n_a + n_b + 1.0) " +
        "- ties::DOUBLE / ((n_a + n_b)::DOUBLE * (n_a + n_b - 1.0)))"
      s"""WITH ma AS (
        |  SELECT n_chars AS v, count(*)::BIGINT AS na FROM documents
        |  WHERE lang = 'en' GROUP BY 1),
        |mb AS (
        |  SELECT n_chars AS v, count(*)::BIGINT AS nb FROM documents
        |  WHERE lang <> 'en' GROUP BY 1),
        |mc AS (
        |  SELECT coalesce(ma.v, mb.v) AS v, coalesce(na, 0) AS na,
        |    coalesce(na, 0) + coalesce(nb, 0) AS t
        |  FROM ma FULL OUTER JOIN mb ON ma.v = mb.v),
        |mcum AS (
        |  SELECT v, na, t,
        |    sum(t) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - t AS before
        |  FROM mc),
        |mtot AS (SELECT sum(na)::BIGINT AS n_a,
        |               (sum(t) - sum(na))::BIGINT AS n_b FROM mc),
        |mr AS (SELECT sum(na * (2 * before + t + 1)) AS r2,
        |              sum(t * t * t - t) AS ties FROM mcum),
        |mu AS (SELECT n_a, n_b, (r2 - n_a * (n_a + 1))::BIGINT AS u2_a, ties
        |       FROM mr CROSS JOIN mtot),
        |mz AS (
        |  SELECT n_a, n_b, u2_a,
        |    CASE WHEN $varSql > 0 THEN
        |      round((u2_a::DOUBLE / 2.0 - n_a::DOUBLE * n_b / 2.0)
        |        / sqrt($varSql), 6) END AS z
        |  FROM mu)
        |SELECT n_a, n_b, u2_a, z,
        |  CASE WHEN z IS NULL THEN NULL ELSE
        |    round(least(1.0, 2.0 * (1.0 - ${normCdfSql("abs(z)")})), 6)
        |  END AS p_value
        |FROM mz""".stripMargin
    },

    "x_chi2_assoc" ->
      s"""WITH cq AS (
        |  SELECT coalesce(lang, '^null') AS a, coalesce(source, '^null') AS b
        |  FROM documents),
        |cc AS (SELECT a, b, count(*)::BIGINT AS o FROM cq GROUP BY 1, 2),
        |cr AS (SELECT a, sum(o)::BIGINT AS r FROM cc GROUP BY 1),
        |ccl AS (SELECT b, sum(o)::BIGINT AS c FROM cc GROUP BY 1),
        |ct AS (SELECT sum(o)::BIGINT AS n FROM cc),
        |cdfree AS (SELECT ((SELECT count(*) FROM cr) - 1)
        |  * ((SELECT count(*) FROM ccl) - 1) AS df),
        |cg AS (
        |  SELECT cr.r, ccl.c, coalesce(cc.o, 0) AS o, ct.n
        |  FROM cr CROSS JOIN ccl
        |  LEFT JOIN cc ON cc.a = cr.a AND cc.b = ccl.b
        |  CROSS JOIN ct),
        |cterm AS (
        |  SELECT n, CAST(round(
        |    ((o * n - r * c)::DOUBLE * (o * n - r * c)::DOUBLE)
        |      / (n::DOUBLE * r * c) * 1e9) AS BIGINT) AS term
        |  FROM cg),
        |cchi AS (SELECT max(n)::BIGINT AS n,
        |  round(sum(term)::DOUBLE / 1e9, 6) AS chi2 FROM cterm),
        |cz AS (
        |  SELECT n, df::BIGINT AS df, chi2,
        |    CASE WHEN df > 0 THEN
        |      round((power(chi2 / df::DOUBLE, 0.3333333333333333)
        |        - (1.0 - 2.0 / (9.0 * df))) / sqrt(2.0 / (9.0 * df)), 6)
        |    END AS z
        |  FROM cchi CROSS JOIN cdfree)
        |SELECT n, df, chi2,
        |  CASE WHEN z IS NULL THEN NULL ELSE
        |    round(least(1.0, greatest(0.0, 1.0 - ${normCdfSql("z")})), 6)
        |  END AS p_value
        |FROM cz""".stripMargin,

    "x_hill" ->
      """WITH v AS (
        |  SELECT n_chars::BIGINT AS v FROM documents WHERE n_chars > 0),
        |nn AS (SELECT count(*)::BIGINT AS n FROM v),
        |th AS (
        |  SELECT v AS t FROM (
        |    SELECT v, row_number() OVER (ORDER BY v) AS rn FROM v) r
        |  WHERE rn = (SELECT n - 200 FROM nn)),
        |tail AS (
        |  SELECT CAST(round(1000000.0
        |    * ln(v::DOUBLE / (SELECT t::DOUBLE FROM th))) AS BIGINT)
        |    AS term
        |  FROM v WHERE v > (SELECT t FROM th)),
        |agg AS (
        |  SELECT count(*)::BIGINT AS m, sum(term)::BIGINT AS sum_micro
        |  FROM tail)
        |SELECT (SELECT n FROM nn) AS n, 200::BIGINT AS k,
        |  (SELECT t FROM th)::BIGINT AS threshold, m,
        |  CASE WHEN m > 0 THEN
        |    sum_micro::DOUBLE / (1000000.0 * m::DOUBLE) END AS gamma,
        |  CASE WHEN m > 0 AND sum_micro > 0 THEN
        |    1000000.0 * m::DOUBLE / sum_micro::DOUBLE END AS alpha
        |FROM agg""".stripMargin,

    "x_wasserstein" ->
      """WITH cen AS (
        |  SELECT source AS key, n_chars AS v,
        |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS na,
        |    sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)::BIGINT AS nb
        |  FROM documents GROUP BY 1, 2),
        |tot AS (
        |  SELECT key, sum(na)::BIGINT AS n_a, sum(nb)::BIGINT AS n_b
        |  FROM cen GROUP BY 1),
        |cum AS (
        |  SELECT key, v,
        |    sum(na) OVER (PARTITION BY key ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
        |    sum(nb) OVER (PARTITION BY key ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb,
        |    coalesce(lead(v) OVER (PARTITION BY key ORDER BY v) - v, 0)
        |      AS gap
        |  FROM cen),
        |num AS (
        |  SELECT c.key,
        |    sum(abs(c.cuma::HUGEINT * t.n_b - c.cumb::HUGEINT * t.n_a)
        |        * c.gap) AS nm
        |  FROM cum c JOIN tot t USING (key) GROUP BY c.key)
        |SELECT n.key, t.n_a, t.n_b,
        |  CASE WHEN t.n_a > 0 AND t.n_b > 0
        |    THEN round(n.nm::DOUBLE / (t.n_a::DOUBLE * t.n_b), 6)
        |  END AS w1
        |FROM num n JOIN tot t USING (key)""".stripMargin,

    "x_ks_test" ->
      """WITH ka AS (
        |  SELECT n_chars AS v, count(*)::BIGINT AS na FROM documents
        |  WHERE lang = 'en' GROUP BY 1),
        |kb AS (
        |  SELECT n_chars AS v, count(*)::BIGINT AS nb FROM documents
        |  WHERE lang <> 'en' GROUP BY 1),
        |kc AS (
        |  SELECT coalesce(ka.v, kb.v) AS v, coalesce(na, 0) AS na,
        |    coalesce(nb, 0) AS nb
        |  FROM ka FULL OUTER JOIN kb ON ka.v = kb.v),
        |kcum AS (
        |  SELECT v,
        |    sum(na) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cuma,
        |    sum(nb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumb
        |  FROM kc),
        |ktot AS (SELECT sum(na)::BIGINT AS n_a, sum(nb)::BIGINT AS n_b FROM kc),
        |kd AS (
        |  SELECT n_a, n_b,
        |    CASE WHEN n_a > 0 AND n_b > 0 THEN
        |      round(max(abs(cuma * n_b - cumb * n_a))::DOUBLE
        |        / (n_a::DOUBLE * n_b), 6) END AS d_stat
        |  FROM kcum CROSS JOIN ktot GROUP BY n_a, n_b),
        |kt AS (
        |  SELECT n_a, n_b, d_stat,
        |    CAST(round((CASE WHEN j % 2 = 1 THEN 1.0 ELSE -1.0 END)
        |      * exp(-2.0 * j * j
        |        * (d_stat * sqrt(n_a::DOUBLE * n_b / (n_a + n_b)))
        |        * (d_stat * sqrt(n_a::DOUBLE * n_b / (n_a + n_b))))
        |      * 1e9) AS BIGINT) AS term
        |  FROM (SELECT n_a, n_b, d_stat, unnest(range(1, 101)) AS j FROM kd))
        |SELECT n_a, n_b, d_stat,
        |  CASE WHEN d_stat * sqrt(n_a::DOUBLE * n_b / (n_a + n_b)) < 0.2
        |    THEN 1.0
        |    ELSE round(least(1.0, greatest(0.0,
        |      2.0 * sum(term)::DOUBLE / 1e9)), 6) END AS p_value
        |FROM kt GROUP BY 1, 2, 3""".stripMargin,

    "x_drift_fleet" ->
      """WITH fbase AS (
        |  SELECT source AS g,
        |    (n_chars + CASE WHEN source = 'src0' THEN 2000 ELSE 0 END)::BIGINT AS v
        |  FROM documents),
        |fgc AS (SELECT g, v, count(*)::BIGINT AS n FROM fbase GROUP BY 1, 2),
        |fvc AS (SELECT v, sum(n)::BIGINT AS nv FROM fgc GROUP BY 1),
        |fcumall AS (
        |  SELECT v, sum(nv) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumb
        |  FROM fvc),
        |ftot AS (SELECT count(*)::BIGINT AS nn FROM fbase),
        |fgt AS (SELECT g, count(*)::BIGINT AS ng FROM fbase GROUP BY 1),
        |fdense AS (
        |  SELECT fgt.g, fgt.ng, fc.v, fc.cumb, coalesce(fgc.n, 0) AS n
        |  FROM fgt CROSS JOIN fcumall fc
        |  LEFT JOIN fgc ON fgc.g = fgt.g AND fgc.v = fc.v),
        |fcum AS (
        |  SELECT g, ng, v, cumb,
        |    sum(n) OVER (PARTITION BY g ORDER BY v ROWS UNBOUNDED PRECEDING) AS cuma
        |  FROM fdense),
        |fd AS (
        |  SELECT g AS key, ng AS n_g,
        |    round(max(abs(cuma * nn - cumb * ng))::DOUBLE
        |      / (ng::DOUBLE * nn), 6) AS d_stat,
        |    ng, nn
        |  FROM fcum CROSS JOIN ftot GROUP BY g, ng, nn),
        |fl AS (
        |  SELECT key, n_g, d_stat,
        |    d_stat * sqrt(ng::DOUBLE * nn / (ng + nn)) AS lam
        |  FROM fd),
        |fp2 AS (
        |  SELECT key, n_g, d_stat, lam,
        |    CAST(round((CASE WHEN j % 2 = 1 THEN 1.0 ELSE -1.0 END)
        |      * exp(-2.0 * j * j * lam * lam) * 1e9) AS BIGINT) AS term
        |  FROM (SELECT key, n_g, d_stat, lam, unnest(range(1, 101)) AS j
        |        FROM fl)),
        |fpv AS (
        |  SELECT key, n_g, d_stat,
        |    CASE WHEN lam < 0.2 THEN 1.0
        |      ELSE round(least(1.0, greatest(0.0,
        |        2.0 * sum(term)::DOUBLE / 1e9)), 6) END AS p_value
        |  FROM fp2 GROUP BY key, n_g, d_stat, lam),
        |fpm AS (
        |  SELECT key, n_g, d_stat, p_value,
        |    CAST(round(p_value * 1e6) AS BIGINT) AS p_micro FROM fpv),
        |fm AS (SELECT count(*)::BIGINT AS m FROM fpm),
        |fr AS (
        |  SELECT key, n_g, d_stat, p_value, p_micro,
        |    row_number() OVER (ORDER BY p_micro ASC, key ASC)::BIGINT AS rank
        |  FROM fpm),
        |fk AS (
        |  SELECT coalesce(max(CASE WHEN p_micro * m <= 50000 * rank
        |    THEN rank END), 0) AS kstar
        |  FROM fr CROSS JOIN fm)
        |SELECT key, n_g, d_stat, p_value, p_micro, rank,
        |  rank <= kstar AS discovery
        |FROM fr CROSS JOIN fk""".stripMargin,

    "x_bh_fdr" ->
      """WITH bp AS (SELECT DISTINCT source AS key FROM documents),
        |bpv AS (
        |  SELECT key,
        |    (CASE WHEN key = 'src0' THEN 1000
        |      WHEN key = 'src1' THEN 2000
        |      WHEN key = 'src2' THEN 900000
        |      ELSE ('0x' || substr(md5('bh:' || key), 1, 15))::BIGINT
        |        % 1000000 + 1 END)::BIGINT AS p_micro
        |  FROM bp),
        |bm AS (SELECT count(*)::BIGINT AS m FROM bpv),
        |br AS (
        |  SELECT key, p_micro,
        |    row_number() OVER (ORDER BY p_micro ASC, key ASC)::BIGINT AS rank
        |  FROM bpv),
        |bk AS (
        |  SELECT coalesce(max(CASE WHEN p_micro * m <= 50000 * rank
        |    THEN rank END), 0) AS kstar
        |  FROM br CROSS JOIN bm)
        |SELECT key, p_micro, rank, rank <= kstar AS discovery
        |FROM br CROSS JOIN bk""".stripMargin,

    "s_mixture_solve" ->
      """WITH mnorm AS (
        |  SELECT source,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
        |  FROM documents),
        |mcen AS (
        |  SELECT source,
        |    coalesce(sum(CASE WHEN norm IS NULL THEN NULL
        |      WHEN norm = '' THEN 0
        |      ELSE len(regexp_split_to_array(norm, '\s+')) END), 0)::BIGINT
        |      AS tokens
        |  FROM mnorm GROUP BY source),
        |mw AS (
        |  SELECT source, tokens,
        |    (CASE source WHEN 'src0' THEN 3.0 WHEN 'src1' THEN 0.5
        |      ELSE 1.0 END)::DOUBLE AS w
        |  FROM mcen),
        |mtot AS (SELECT sum(w) AS wtot FROM mw)
        |SELECT source, tokens, round(w, 6)::DOUBLE AS weight,
        |  CAST(round(1000000 * (w / wtot)) AS BIGINT) AS target_tokens,
        |  CASE WHEN tokens > 0 THEN
        |    round(CAST(round(1000000 * (w / wtot)) AS BIGINT)::DOUBLE / tokens, 6)
        |  END AS factor,
        |  CASE WHEN CAST(round(1000000 * (w / wtot)) AS BIGINT) > tokens
        |    THEN 'upsample'
        |    WHEN CAST(round(1000000 * (w / wtot)) AS BIGINT) < tokens
        |    THEN 'downsample' ELSE 'keep' END AS mode
        |FROM mw CROSS JOIN mtot""".stripMargin,

    "s_mixture_upsample" ->
      s"""WITH w AS (
         |  SELECT doc_id, source,
         |    CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.25 ELSE 1.0 END AS wt
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, source, wt, unnest(range(0, ceil(wt)::BIGINT)) AS copy
         |  FROM w WHERE wt > 0)
         |SELECT doc_id, source, copy FROM c
         |WHERE copy < floor(wt)
         |   OR substr(md5(doc_id::VARCHAR || ':' || copy::VARCHAR), 1, 8) <
         |      CASE source WHEN 'src0' THEN '${HashSplit.thresholdHex(0.5)}'
         |                  WHEN 'src1' THEN '${HashSplit.thresholdHex(0.25)}'
         |                  ELSE '${HashSplit.thresholdHex(0.0)}' END""".stripMargin,

    "t_quality_filter" ->
      """WITH base AS (
        |  SELECT doc_id, text,
        |    CASE WHEN trim(text) = '' THEN []::VARCHAR[]
        |         ELSE regexp_split_to_array(trim(text), '\s+') END AS toks,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
        |  FROM documents),
        |ntok AS (
        |  SELECT doc_id, text, toks, norm,
        |    CASE WHEN norm = '' THEN []::VARCHAR[]
        |         ELSE regexp_split_to_array(norm, '\s+') END AS ntoks
        |  FROM base),
        |sh AS (
        |  SELECT doc_id, text, toks,
        |    CASE WHEN len(ntoks) < 2 THEN [array_to_string(ntoks, ' ')]
        |         ELSE [array_to_string(ntoks[i:i+1], ' ') FOR i IN range(1, len(ntoks))]
        |    END AS sh2,
        |    CASE WHEN len(ntoks) < 3 THEN [array_to_string(ntoks, ' ')]
        |         ELSE [array_to_string(ntoks[i:i+2], ' ') FOR i IN range(1, len(ntoks) - 1)]
        |    END AS sh3
        |  FROM ntok),
        |sig AS (
        |  SELECT doc_id,
        |    len(toks) AS n_tokens,
        |    round((length(text) - (len(toks) - 1))::DOUBLE / greatest(len(toks), 1), 6) AS mean_token_len,
        |    round(len(list_filter(toks, t -> t IN ('the','a','an','and','or','of','to','in','is','it','that','for')))::DOUBLE
        |          / greatest(len(toks), 1), 6) AS stopword_frac,
        |    round(1 - len(list_distinct(sh2))::DOUBLE / greatest(len(sh2), 1), 6) AS dup_2gram_frac,
        |    round(1 - len(list_distinct(sh3))::DOUBLE / greatest(len(sh3), 1), 6) AS dup_3gram_frac
        |  FROM sh),
        |tagged AS (
        |  SELECT *, concat_ws(',',
        |    CASE WHEN n_tokens < 25 THEN 'too_few_tokens' END,
        |    CASE WHEN n_tokens > 90 THEN 'too_many_tokens' END,
        |    CASE WHEN mean_token_len < 3.8 THEN 'mean_token_len_low' END,
        |    CASE WHEN mean_token_len > 5.1 THEN 'mean_token_len_high' END,
        |    CASE WHEN stopword_frac < 0.02 THEN 'stopword_frac_low' END,
        |    CASE WHEN dup_2gram_frac > 0.08 THEN 'dup_2gram_high' END,
        |    CASE WHEN dup_3gram_frac > 0.05 THEN 'dup_3gram_high' END) AS reasons
        |  FROM sig)
        |SELECT doc_id, n_tokens, mean_token_len, stopword_frac,
        |  dup_2gram_frac, dup_3gram_frac, reasons, reasons = '' AS keep
        |FROM tagged""".stripMargin,

    "t_rm_boilerplate" ->
      """WITH lines AS (
        |  SELECT doc_id, generate_subscripts(l, 1) AS pos, unnest(l) AS line
        |  FROM (SELECT doc_id, string_split(text, ' table ') AS l FROM documents)),
        |bp AS (
        |  SELECT line FROM (
        |    SELECT line, count(DISTINCT doc_id) AS n_docs FROM lines GROUP BY 1)
        |  WHERE n_docs >= 20),
        |kept AS (
        |  SELECT doc_id,
        |    array_to_string(list(line ORDER BY pos), ' table ') AS clean_text,
        |    count(*) AS n_lines_kept
        |  FROM lines WHERE line NOT IN (SELECT line FROM bp) GROUP BY 1)
        |SELECT d.doc_id,
        |  coalesce(k.clean_text, '') AS clean_text,
        |  coalesce(k.n_lines_kept, 0) AS n_lines_kept,
        |  len(string_split(d.text, ' table ')) - coalesce(k.n_lines_kept, 0) AS n_lines_removed
        |FROM documents d LEFT JOIN kept k USING (doc_id)""".stripMargin,

    // paragraph-dedup replay: duplicated-line census, row_number over
    // (doc_id, pos) per digest (rn = 1 is the surviving canonical
    // occurrence), ordered reassembly — d_span_dedup_keepfirst at line
    // grain
    "t_dedup_paragraphs" ->
      """WITH pl AS (
        |  SELECT doc_id, generate_subscripts(l, 1) AS pos, unnest(l) AS line
        |  FROM (SELECT doc_id, string_split(text, ' table ') AS l FROM documents)),
        |rep AS (
        |  SELECT md5(line) AS dig FROM pl GROUP BY 1 HAVING count(*) > 1),
        |ranked AS (
        |  SELECT doc_id, pos,
        |    row_number() OVER (PARTITION BY md5(line) ORDER BY doc_id, pos) AS rn
        |  FROM pl WHERE md5(line) IN (SELECT dig FROM rep)),
        |dropped AS (SELECT doc_id, pos FROM ranked WHERE rn > 1),
        |kept AS (
        |  SELECT p.doc_id,
        |    array_to_string(list(p.line ORDER BY p.pos), ' table ') AS clean_text,
        |    count(*) AS k
        |  FROM pl p LEFT JOIN dropped d ON d.doc_id = p.doc_id AND d.pos = p.pos
        |  WHERE d.doc_id IS NULL GROUP BY 1)
        |SELECT d.doc_id, coalesce(k.clean_text, '') AS clean_text,
        |  (CASE WHEN d.text IS NULL THEN 0
        |        ELSE len(string_split(d.text, ' table ')) END)::BIGINT AS n_lines,
        |  ((CASE WHEN d.text IS NULL THEN 0
        |         ELSE len(string_split(d.text, ' table ')) END)
        |   - coalesce(k.k, 0))::BIGINT AS n_lines_removed
        |FROM documents d LEFT JOIN kept k USING (doc_id)""".stripMargin,

    "t_fingerprint" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp
        |FROM documents""".stripMargin,

    // Karp–Rabin replay (round-7 verdict #7): the per-codepoint
    // recursive-CTE recurrence of d_cdc_chunks applied to the 64-bit
    // polynomial h = h·B + byte (mod 2^64) over the NORMALIZED text's
    // UTF-8 bytes — each codepoint expands to its 1–4 UTF-8 bytes
    // arithmetically, the fold runs in HUGEINT, and the final value maps
    // to Java's signed long. Iterations = max codepoint count, rows =
    // Σ lengths — bounded by the documents fixture.
    "t_rolling_fp" ->
      """WITH RECURSIVE rdocs AS MATERIALIZED (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS txt
        |  FROM documents WHERE text IS NOT NULL),
        |rst AS (
        |  SELECT doc_id, length(txt)::BIGINT AS n, 0::BIGINT AS i, 0::HUGEINT AS h
        |  FROM rdocs
        |  UNION ALL
        |  SELECT r.doc_id, r.n, r.i + 1, x4.h4
        |  FROM rst r JOIN rdocs d USING (doc_id),
        |  unnest([{'cp': ord(substr(d.txt, (r.i + 1)::INT, 1))::HUGEINT}]) AS s0(c),
        |  unnest([{'b1': CASE WHEN c.cp < 128 THEN c.cp
        |                      WHEN c.cp < 2048 THEN 192 + c.cp // 64
        |                      WHEN c.cp < 65536 THEN 224 + c.cp // 4096
        |                      ELSE 240 + c.cp // 262144 END,
        |           'b2': CASE WHEN c.cp < 128 THEN NULL
        |                      WHEN c.cp < 2048 THEN 128 + c.cp % 64
        |                      WHEN c.cp < 65536 THEN 128 + (c.cp // 64) % 64
        |                      ELSE 128 + (c.cp // 4096) % 64 END,
        |           'b3': CASE WHEN c.cp < 2048 THEN NULL
        |                      WHEN c.cp < 65536 THEN 128 + c.cp % 64
        |                      ELSE 128 + (c.cp // 64) % 64 END,
        |           'b4': CASE WHEN c.cp < 65536 THEN NULL
        |                      ELSE 128 + c.cp % 64 END}]) AS sb(b),
        |  unnest([{'h1': (r.h * 1099511628211 + b.b1) % 18446744073709551616}]) AS s1(x1),
        |  unnest([{'h2': CASE WHEN b.b2 IS NULL THEN x1.h1
        |                      ELSE (x1.h1 * 1099511628211 + b.b2) % 18446744073709551616 END}]) AS s2(x2),
        |  unnest([{'h3': CASE WHEN b.b3 IS NULL THEN x2.h2
        |                      ELSE (x2.h2 * 1099511628211 + b.b3) % 18446744073709551616 END}]) AS s3(x3),
        |  unnest([{'h4': CASE WHEN b.b4 IS NULL THEN x3.h3
        |                      ELSE (x3.h3 * 1099511628211 + b.b4) % 18446744073709551616 END}]) AS s4(x4)
        |  WHERE r.i < r.n),
        |rfin AS (SELECT doc_id, h FROM rst WHERE i = n)
        |SELECT d.doc_id,
        |  (CASE WHEN f.h >= 9223372036854775808 THEN f.h - 18446744073709551616
        |        ELSE f.h END)::BIGINT AS rfp
        |FROM documents d LEFT JOIN rfin f USING (doc_id)""".stripMargin,

    "t_line_filter" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    array_to_string(string_split(text, ' table '), '.' || chr(10)) AS text
        |  FROM documents),
        |l AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM base),
        |k AS (SELECT doc_id, lines,
        |        list_filter(lines, x ->
        |          trim(x) <> '' AND len(regexp_split_to_array(trim(x), '\s+')) >= 4
        |          AND NOT contains(lower(x), 'spark')
        |          AND regexp_matches(rtrim(x), '[.!?"'']$')) AS kept
        |      FROM l)
        |SELECT doc_id,
        |  CASE WHEN lines IS NULL THEN NULL
        |       ELSE coalesce(array_to_string(kept, chr(10)), '') END AS clean_text,
        |  len(lines)::INT AS n_lines, len(kept)::INT AS n_lines_kept,
        |  (len(lines) - len(kept))::INT AS n_lines_removed
        |FROM k""".stripMargin,

    // blocklist tagging replay: the declarative contains() form over the
    // operator's own sample list (interpolated) — per-pattern substring
    // containment on the lowercased text, sorted hit list
    "t_blocklist" ->
      s"""WITH h AS (
        |  SELECT doc_id,
        |    list_sort([p FOR p IN ${
          MultiPattern.sampleBlocklist.map(p => s"'$p'").mkString("[", ", ", "]")
        } IF contains(lower(coalesce(text, '')), p)]) AS hits
        |  FROM documents)
        |SELECT doc_id, len(hits)::INT AS n_hits,
        |  coalesce(array_to_string(hits, ','), '') AS hits_csv
        |FROM h""".stripMargin,

    "s_source_cap" ->
      """WITH ranked AS (
        |  SELECT doc_id, source,
        |    (row_number() OVER (PARTITION BY source
        |      ORDER BY md5('cap:7:' || doc_id::VARCHAR) ASC, doc_id ASC))::INT AS rank
        |  FROM documents)
        |SELECT doc_id, source, rank FROM ranked WHERE rank <= 10""".stripMargin,

    // temperature-mix replay: α-power census in the same fixed op order
    // (weight rounded 6dp BEFORE the budget multiply), whole-token
    // budgets floored at 1, per-group running sum in the draw order
    "s_temperature_mix" ->
      """WITH d AS (
        |  SELECT doc_id, coalesce(lang, 'und') AS grp,
        |    CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13)) = '' THEN 0
        |         ELSE len(regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13)), '\s+')) END::BIGINT AS n_toks
        |  FROM documents),
        |c AS (SELECT grp, sum(n_toks)::BIGINT AS n_tokens FROM d GROUP BY 1),
        |p AS (SELECT grp, pow(n_tokens::DOUBLE, 0.5) AS pa FROM c),
        |t AS (SELECT sum(pa) AS tot FROM p),
        |b AS (SELECT grp, round(pa / tot, 6) AS weight FROM p CROSS JOIN t),
        |b2 AS (SELECT grp, weight,
        |         greatest(CAST(round(weight * 20000) AS BIGINT), 1) AS budget
        |       FROM b),
        |f AS (
        |  SELECT d.doc_id, d.grp, d.n_toks, b2.budget,
        |    sum(d.n_toks) OVER (PARTITION BY d.grp
        |      ORDER BY md5('budget:7:' || d.doc_id::VARCHAR) ASC, d.doc_id ASC
        |      ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_tokens
        |  FROM d JOIN b2 USING (grp))
        |SELECT doc_id, grp, n_toks, cum_tokens, budget
        |FROM f WHERE cum_tokens - n_toks < budget""".stripMargin,

    // running token sum in the same md5 draw order; crossing doc kept
    // (cum_before < budget), zero-token docs ride along while the
    // group is unfilled
    "s_token_budget" ->
      """WITH d AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13)) = '' THEN 0
        |         ELSE len(regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13)), '\s+')) END::BIGINT AS n_toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, lang, n_toks,
        |    sum(n_toks) OVER (PARTITION BY lang
        |      ORDER BY md5('budget:7:' || doc_id::VARCHAR) ASC, doc_id ASC
        |      ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_tokens
        |  FROM d)
        |SELECT doc_id, lang, n_toks, cum_tokens
        |FROM c WHERE cum_tokens - n_toks < 2000""".stripMargin,

    // entity replaces applied in the same order as the operator's fold;
    // horizontal whitespace collapses to ' ', and ANY run containing a
    // newline — including "\n \n" blank-line shapes — collapses to one \n
    // ('[ \n]*\n[ \n]*', the operator's exact pattern; a looser
    // ' ?\n+ ?' would silently diverge on blank lines with inner spaces)
    "t_strip_markup" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(
        |    replace(replace(replace(replace(replace(replace(
        |      regexp_replace(
        |        regexp_replace(
        |          '<html><head><style>p{x}</style></head><body onload="f()"><p>' || text ||
        |          '</p><script type="text/javascript">var a=1;</script><!-- c --> A &amp; B &lt;ok&gt;</body></html>',
        |          '(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>|<!--.*?-->', ' ', 'g'),
        |        '(?s)<[^>]*>', ' ', 'g'),
        |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&apos;', ''''), '&amp;', '&'),
        |    '[^\S\n]+', ' ', 'g'), '[ \n]*\n[ \n]*', chr(10), 'g'), ' ' || chr(10)) AS clean
        |FROM documents""".stripMargin,

    "t_unigram_logprob" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(CASE WHEN trim(text) = '' THEN []::VARCHAR[]
        |       ELSE regexp_split_to_array(trim(text), '\s+') END) AS t
        |  FROM documents),
        |census AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
        |tot AS (SELECT sum(c) AS n FROM census),
        |lp AS (
        |  SELECT doc_id, CAST(round(log10(c::DOUBLE / n) * 1e6) AS BIGINT) AS lp
        |  FROM tok JOIN census USING (t) CROSS JOIN tot),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_tokens, sum(lp)::BIGINT AS logp_sum_micro
        |  FROM lp GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(a.n_tokens, 0)::BIGINT AS n_tokens,
        |  a.logp_sum_micro,
        |  round(a.logp_sum_micro::DOUBLE / a.n_tokens / 1e6, 6) AS avg_logp10
        |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin,

    "t_bigram_kn" ->
      s"""WITH kt AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13)) = '' THEN []::VARCHAR[]
        |         ELSE regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13)), '\\s+') END AS toks
        |  FROM documents),
        |tokrows AS (
        |  SELECT doc_id, generate_subscripts(toks, 1) AS pos, unnest(toks) AS t FROM kt),
        |pairs AS (
        |  SELECT doc_id,
        |    unnest([array_to_string(toks[i:i+1], ' ') FOR i IN range(1, len(toks))]) AS g
        |  FROM kt WHERE len(toks) >= 2),
        |big AS (SELECT g, count(*)::BIGINT AS cab FROM pairs GROUP BY g),
        |bigpw AS (
        |  SELECT g, cab, string_split(g, ' ')[1] AS prev,
        |         string_split(g, ' ')[2] AS w
        |  FROM big),
        |ps_ AS (SELECT prev, sum(cab)::BIGINT AS cprev, count(*)::BIGINT AS n1prev
        |        FROM bigpw GROUP BY prev),
        |cs_ AS (SELECT w, count(*)::BIGINT AS n1w FROM bigpw GROUP BY w),
        |tot AS (SELECT (SELECT count(*)::BIGINT FROM big) AS tt,
        |               (SELECT count(DISTINCT t)::BIGINT FROM tokrows) AS vv),
        |fs AS (
        |  SELECT doc_id,
        |    CAST(round(log10((coalesce(cs_.n1w, 0)::DOUBLE + 1.0)
        |      / (tot.tt::DOUBLE + tot.vv)) * 1e6) AS BIGINT) AS lp
        |  FROM tokrows LEFT JOIN cs_ ON cs_.w = tokrows.t
        |  CROSS JOIN tot WHERE pos = 1),
        |psc AS (
        |  SELECT pairs.doc_id,
        |    CAST(round(log10(
        |      (bp.cab::DOUBLE - ${0.75}) / ps_.cprev
        |        + ${0.75} * ps_.n1prev / ps_.cprev * (cs_.n1w::DOUBLE / tot.tt)) * 1e6) AS BIGINT) AS lp
        |  FROM pairs JOIN bigpw bp USING (g)
        |  JOIN ps_ ON ps_.prev = bp.prev
        |  JOIN cs_ ON cs_.w = bp.w
        |  CROSS JOIN tot),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_tokens, sum(lp)::BIGINT AS logp_sum_micro
        |  FROM (SELECT * FROM fs UNION ALL SELECT * FROM psc) GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(a.n_tokens, 0)::BIGINT AS n_tokens,
        |  a.logp_sum_micro,
        |  round(a.logp_sum_micro::DOUBLE / a.n_tokens / 1e6, 6) AS avg_logp10
        |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin,

    // trigram KN: same tokenization/census idioms one order up. The
    // shared censuses are AS MATERIALIZED — tripw/bigpw fan out to 4+
    // consumers and DuckDB would otherwise inline a copy per reference.
    // Discounts interpolate from the operator's own Scala double.
    "t_trigram_kn" ->
      s"""WITH kt AS MATERIALIZED (
        |  SELECT doc_id,
        |    CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13)) = '' THEN []::VARCHAR[]
        |         ELSE regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13)), '\\s+') END AS toks
        |  FROM documents),
        |tokrows AS MATERIALIZED (
        |  SELECT doc_id, generate_subscripts(toks, 1) AS pos, unnest(toks) AS t FROM kt),
        |pairs AS MATERIALIZED (
        |  SELECT doc_id,
        |    unnest([array_to_string(toks[i:i+1], ' ') FOR i IN range(1, len(toks))]) AS g
        |  FROM kt WHERE len(toks) >= 2),
        |tris AS MATERIALIZED (
        |  SELECT doc_id,
        |    unnest([array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]) AS g3
        |  FROM kt WHERE len(toks) >= 3),
        |big AS (SELECT g, count(*)::BIGINT AS cab FROM pairs GROUP BY g),
        |bigpw AS MATERIALIZED (
        |  SELECT g, cab, string_split(g, ' ')[1] AS prev,
        |         string_split(g, ' ')[2] AS w
        |  FROM big),
        |ps_ AS MATERIALIZED (
        |  SELECT prev, sum(cab)::BIGINT AS cprev, count(*)::BIGINT AS n1prev
        |  FROM bigpw GROUP BY prev),
        |cs_ AS MATERIALIZED (
        |  SELECT w, count(*)::BIGINT AS n1w FROM bigpw GROUP BY w),
        |tri AS (SELECT g3, count(*)::BIGINT AS c3 FROM tris GROUP BY g3),
        |tripw AS MATERIALIZED (
        |  SELECT g3, c3, string_split(g3, ' ')[1] AS u,
        |         string_split(g3, ' ')[2] AS v, string_split(g3, ' ')[3] AS w
        |  FROM tri),
        |ctx AS MATERIALIZED (
        |  SELECT u, v, sum(c3)::BIGINT AS cuv, count(*)::BIGINT AS n1uv
        |  FROM tripw GROUP BY u, v),
        |mc AS MATERIALIZED (
        |  SELECT v, w, count(*)::BIGINT AS n1vw FROM tripw GROUP BY v, w),
        |mt AS MATERIALIZED (
        |  SELECT v, count(*)::BIGINT AS n1vmid FROM tripw GROUP BY v),
        |tot AS MATERIALIZED (
        |  SELECT (SELECT count(*)::BIGINT FROM big) AS tt,
        |         (SELECT count(DISTINCT t)::BIGINT FROM tokrows) AS vv),
        |fs AS (
        |  SELECT doc_id,
        |    CAST(round(log10((coalesce(cs_.n1w, 0)::DOUBLE + 1.0)
        |      / (tot.tt::DOUBLE + tot.vv)) * 1e6) AS BIGINT) AS lp
        |  FROM tokrows LEFT JOIN cs_ ON cs_.w = tokrows.t
        |  CROSS JOIN tot WHERE pos = 1),
        |sp AS (
        |  SELECT fp.doc_id,
        |    CAST(round(log10(
        |      (bp.cab::DOUBLE - ${0.75}) / ps_.cprev
        |        + ${0.75} * ps_.n1prev / ps_.cprev * (cs_.n1w::DOUBLE / tot.tt)) * 1e6) AS BIGINT) AS lp
        |  FROM (SELECT doc_id, array_to_string(toks[1:2], ' ') AS g
        |        FROM kt WHERE len(toks) >= 2) fp
        |  JOIN bigpw bp USING (g)
        |  JOIN ps_ ON ps_.prev = bp.prev
        |  JOIN cs_ ON cs_.w = bp.w
        |  CROSS JOIN tot),
        |ts AS (
        |  SELECT tris.doc_id,
        |    CAST(round(log10(
        |      (tp.c3::DOUBLE - ${0.75}) / ctx.cuv
        |        + ${0.75} * ctx.n1uv / ctx.cuv
        |          * ((mc.n1vw::DOUBLE - ${0.75}) / mt.n1vmid
        |            + ${0.75} * ps_.n1prev / mt.n1vmid
        |              * (cs_.n1w::DOUBLE / tot.tt))) * 1e6) AS BIGINT) AS lp
        |  FROM tris JOIN tripw tp USING (g3)
        |  JOIN ctx ON ctx.u = tp.u AND ctx.v = tp.v
        |  JOIN mc ON mc.v = tp.v AND mc.w = tp.w
        |  JOIN mt ON mt.v = tp.v
        |  JOIN ps_ ON ps_.prev = tp.v
        |  JOIN cs_ ON cs_.w = tp.w
        |  CROSS JOIN tot),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_tokens, sum(lp)::BIGINT AS logp_sum_micro
        |  FROM (SELECT * FROM fs UNION ALL SELECT * FROM sp UNION ALL SELECT * FROM ts)
        |  GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(a.n_tokens, 0)::BIGINT AS n_tokens,
        |  a.logp_sum_micro,
        |  round(a.logp_sum_micro::DOUBLE / a.n_tokens / 1e6, 6) AS avg_logp10
        |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin,

    // kernel tokenization (full whitespace trim — the span-dedup oracle's
    // idiom); interpolation constants embedded from the SAME Scala doubles
    // the operator uses (toString round-trips), so the float chain
    // replays in order
    "t_bigram_logprob" ->
      s"""WITH kt AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13)) = '' THEN []::VARCHAR[]
        |         ELSE regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13)), '\\s+') END AS toks
        |  FROM documents),
        |tokrows AS (
        |  SELECT doc_id, generate_subscripts(toks, 1) AS pos, unnest(toks) AS t FROM kt),
        |uni AS (SELECT t, count(*) AS cu FROM tokrows GROUP BY t),
        |ntot AS (SELECT sum(cu)::BIGINT AS n FROM uni),
        |pairs AS (
        |  SELECT doc_id,
        |    unnest([array_to_string(toks[i:i+1], ' ') FOR i IN range(1, len(toks))]) AS g
        |  FROM kt WHERE len(toks) >= 2),
        |big AS (SELECT g, count(*) AS cb FROM pairs GROUP BY g),
        |fs AS (
        |  SELECT doc_id, CAST(round(log10(cu::DOUBLE / n) * 1e6) AS BIGINT) AS lp
        |  FROM tokrows JOIN uni USING (t) CROSS JOIN ntot WHERE pos = 1),
        |pr AS (
        |  SELECT doc_id, string_split(g, ' ')[1] AS prev,
        |         string_split(g, ' ')[2] AS w, g
        |  FROM pairs),
        |ps AS (
        |  SELECT pr.doc_id,
        |    CAST(round(log10(${0.7} * coalesce(big.cb, 0)::DOUBLE / up.cu
        |      + ${1.0 - 0.7} * uw.cu::DOUBLE / ntot.n) * 1e6) AS BIGINT) AS lp
        |  FROM pr LEFT JOIN big USING (g)
        |  JOIN uni up ON up.t = pr.prev
        |  JOIN uni uw ON uw.t = pr.w
        |  CROSS JOIN ntot),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_tokens, sum(lp)::BIGINT AS logp_sum_micro
        |  FROM (SELECT * FROM fs UNION ALL SELECT * FROM ps) GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(a.n_tokens, 0)::BIGINT AS n_tokens,
        |  a.logp_sum_micro,
        |  round(a.logp_sum_micro::DOUBLE / a.n_tokens / 1e6, 6) AS avg_logp10
        |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin,

    "t_span_corrupt" ->
      """WITH RECURSIVE norm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS nt
        |  FROM documents),
        |t AS MATERIALIZED (
        |  SELECT doc_id, generate_subscripts(a, 1) - 1 AS pos, unnest(a) AS tok FROM (
        |    SELECT doc_id, CASE WHEN nt = '' THEN []::VARCHAR[]
        |         ELSE regexp_split_to_array(nt, '\s+') END AS a
        |    FROM norm)),
        |dr AS MATERIALIZED (
        |  SELECT doc_id, pos, tok,
        |    (u % 1000000) < 75000 AS sd, ((u >> 20) % 3 + 1) AS len
        |  FROM (
        |    SELECT doc_id, pos, tok,
        |      ('0x' || substr(md5('corrupt:42:' || doc_id::VARCHAR || ':' || pos::VARCHAR), 1, 15))::BIGINT AS u
        |    FROM t)),
        |w AS (
        |  SELECT doc_id, pos, tok, sd AS masked, sd AS sstart,
        |    CASE WHEN sd THEN 0 ELSE -1 END AS sk,
        |    CASE WHEN sd THEN pos + len ELSE 0 END AS nf,
        |    CASE WHEN sd THEN 1 ELSE 0 END AS k
        |  FROM dr WHERE pos = 0
        |  UNION ALL
        |  SELECT d.doc_id, d.pos, d.tok,
        |    CASE WHEN d.pos < w.nf THEN true ELSE d.sd END,
        |    (d.pos >= w.nf AND d.sd),
        |    CASE WHEN d.pos < w.nf THEN w.k - 1 WHEN d.sd THEN w.k ELSE -1 END,
        |    CASE WHEN d.pos < w.nf THEN w.nf WHEN d.sd THEN d.pos + d.len ELSE w.nf END,
        |    CASE WHEN d.pos >= w.nf AND d.sd THEN w.k + 1 ELSE w.k END
        |  FROM w JOIN dr d ON d.doc_id = w.doc_id AND d.pos = w.pos + 1)
        |SELECT doc_id,
        |  coalesce(string_agg(
        |    CASE WHEN sstart THEN '<extra_id_' || sk::VARCHAR || '>' ELSE tok END, ' '
        |    ORDER BY pos) FILTER (NOT masked OR sstart), '') AS input_text,
        |  coalesce(string_agg(
        |    CASE WHEN sstart THEN '<extra_id_' || sk::VARCHAR || '> ' || tok ELSE tok END, ' '
        |    ORDER BY pos) FILTER (masked), '') AS target_text,
        |  count(*)::BIGINT AS n_tokens,
        |  (count(*) FILTER (masked))::BIGINT AS n_masked,
        |  (count(*) FILTER (sstart))::BIGINT AS n_spans
        |FROM w GROUP BY doc_id""".stripMargin,

    "t_vocab_coverage" ->
      """WITH cvnorm AS (
        |  SELECT trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
        |  FROM documents),
        |cvtok AS (
        |  SELECT unnest(CASE WHEN norm = '' THEN []::VARCHAR[]
        |       ELSE regexp_split_to_array(norm, '\s+') END) AS term
        |  FROM cvnorm),
        |cvcen AS (
        |  SELECT term, count(*)::BIGINT AS freq FROM cvtok
        |  WHERE term <> '' GROUP BY term),
        |cvrank AS (
        |  SELECT (row_number() OVER (ORDER BY freq DESC, term ASC) - 1)::BIGINT
        |    AS token_id, freq
        |  FROM cvcen),
        |cvtot AS (SELECT coalesce(sum(freq), 0)::BIGINT AS total FROM cvrank),
        |cvgrid AS (SELECT unnest([1, 2, 4, 8, 16, 32, 64, 128, 256, 512,
        |  1024]) AS size)
        |SELECT g.size::BIGINT AS size, sum(r.freq)::BIGINT AS covered,
        |  t.total, round(sum(r.freq)::DOUBLE / t.total, 6) AS coverage
        |FROM cvgrid g JOIN cvrank r ON r.token_id < g.size
        |CROSS JOIN cvtot t GROUP BY g.size, t.total""".stripMargin,

    "d_exact_dedup_by" ->
      """WITH xdoc AS (
        |  SELECT doc_id, text, lang, source, n_chars FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, lang, 'copy', n_chars
        |  FROM documents),
        |xr AS (
        |  SELECT doc_id, lang, source, n_chars,
        |    row_number() OVER (
        |      PARTITION BY md5(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')))
        |      ORDER BY (CASE WHEN source = 'copy' THEN 1 ELSE 0 END) DESC,
        |        doc_id ASC) AS rn
        |  FROM xdoc)
        |SELECT doc_id, lang, source, n_chars FROM xr WHERE rn = 1""".stripMargin,

    "t_cooc" ->
      """WITH gnorm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
        |  FROM documents),
        |gtok AS (
        |  SELECT doc_id,
        |    generate_subscripts(toks, 1) - 1 AS pos, unnest(toks) AS term
        |  FROM (SELECT doc_id, CASE WHEN norm = '' THEN []::VARCHAR[]
        |       ELSE regexp_split_to_array(norm, '\s+') END AS toks FROM gnorm))
        |SELECT a.term AS center, b.term AS context,
        |  count(*)::BIGINT AS n_pairs,
        |  sum(CAST(round(1000000.0 / abs(b.pos - a.pos)) AS BIGINT))::BIGINT
        |    AS x_micro
        |FROM gtok a JOIN gtok b
        |  ON a.doc_id = b.doc_id AND a.pos <> b.pos
        |  AND abs(b.pos - a.pos) <= 5
        |GROUP BY 1, 2""".stripMargin,

    "t_subsample" ->
      """WITH bnorm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
        |  FROM documents),
        |btok AS (
        |  SELECT doc_id,
        |    generate_subscripts(toks, 1) - 1 AS pos, unnest(toks) AS term
        |  FROM (SELECT doc_id, CASE WHEN norm = '' THEN []::VARCHAR[]
        |       ELSE regexp_split_to_array(norm, '\s+') END AS toks FROM bnorm)),
        |bt AS (SELECT * FROM btok WHERE term <> ''),
        |bcen AS (SELECT term, count(*)::BIGINT AS cnt FROM bt GROUP BY 1),
        |btot AS (SELECT sum(cnt)::BIGINT AS ntot FROM bcen),
        |bkeep AS (
        |  SELECT doc_id, pos, term,
        |    (('0x' || substr(md5('subs:42:' || doc_id || ':' || pos), 1, 15))::BIGINT::DOUBLE + 0.5)
        |      / 1.152921504606846976e18
        |      < least(1.0, sqrt(0.001 / (cnt::DOUBLE / ntot))
        |        + 0.001 / (cnt::DOUBLE / ntot)) AS keep
        |  FROM bt JOIN bcen USING (term) CROSS JOIN btot)
        |SELECT doc_id, count(*)::BIGINT AS n_tokens,
        |  sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
        |  coalesce(string_agg(term, ' ' ORDER BY pos) FILTER (WHERE keep), '')
        |    AS text_sub
        |FROM bkeep GROUP BY doc_id""".stripMargin,

    "t_divergence" ->
      """WITH dnorm AS (
        |  SELECT lang,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
        |  FROM documents),
        |dtok AS (
        |  SELECT lang, unnest(CASE WHEN norm = '' THEN []::VARCHAR[]
        |       ELSE regexp_split_to_array(norm, '\s+') END) AS term
        |  FROM dnorm),
        |dca AS (
        |  SELECT term, count(*)::BIGINT AS ca FROM dtok
        |  WHERE term <> '' AND lang = 'en' GROUP BY 1),
        |dcb AS (
        |  SELECT term, count(*)::BIGINT AS cb FROM dtok
        |  WHERE term <> '' AND lang <> 'en' GROUP BY 1),
        |dj AS (
        |  SELECT coalesce(dca.ca, 0) AS ca, coalesce(dcb.cb, 0) AS cb
        |  FROM dca FULL OUTER JOIN dcb ON dca.term = dcb.term),
        |dtot AS (
        |  SELECT count(*)::BIGINT AS v, sum(ca)::BIGINT AS na,
        |    sum(cb)::BIGINT AS nb FROM dj),
        |dterm AS (
        |  SELECT v,
        |    CAST(round((ca + 1)::DOUBLE / (na + v)
        |      * ln(((ca + 1)::DOUBLE / (na + v)) / ((cb + 1)::DOUBLE / (nb + v)))
        |      * 1e9) AS BIGINT) AS kab,
        |    CAST(round((cb + 1)::DOUBLE / (nb + v)
        |      * ln(((cb + 1)::DOUBLE / (nb + v)) / ((ca + 1)::DOUBLE / (na + v)))
        |      * 1e9) AS BIGINT) AS kba,
        |    CAST(round((((ca + 1)::DOUBLE / (na + v))
        |        * ln(((ca + 1)::DOUBLE / (na + v))
        |          / ((((ca + 1)::DOUBLE / (na + v)) + ((cb + 1)::DOUBLE / (nb + v))) / 2))
        |      + ((cb + 1)::DOUBLE / (nb + v))
        |        * ln(((cb + 1)::DOUBLE / (nb + v))
        |          / ((((ca + 1)::DOUBLE / (na + v)) + ((cb + 1)::DOUBLE / (nb + v))) / 2)))
        |      / 2 * 1e9) AS BIGINT) AS jst
        |  FROM dj CROSS JOIN dtot)
        |SELECT v AS n_terms,
        |  round(sum(kab)::DOUBLE / 1e9, 6) AS kl_ab,
        |  round(sum(kba)::DOUBLE / 1e9, 6) AS kl_ba,
        |  round(sum(jst)::DOUBLE / 1e9, 6) AS js
        |FROM dterm GROUP BY v""".stripMargin,

    "t_zipf" ->
      """WITH norm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, unnest(CASE WHEN norm = '' THEN []::VARCHAR[]
        |       ELSE regexp_split_to_array(norm, '\s+') END) AS term
        |  FROM norm),
        |census AS (
        |  SELECT term, count(*) AS freq
        |  FROM tok WHERE term <> '' GROUP BY term HAVING count(*) >= 2),
        |ranked AS (
        |  SELECT (row_number() OVER (ORDER BY freq DESC, term ASC) - 1)::BIGINT AS token_id,
        |    freq
        |  FROM census),
        |pts AS (
        |  SELECT CAST(round(ln((token_id + 1)::DOUBLE) * 1e3) AS BIGINT) AS x,
        |    CAST(round(ln(freq::DOUBLE) * 1e3) AS BIGINT) AS y
        |  FROM ranked),
        |s AS (
        |  SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
        |    sum(x * x)::BIGINT AS sxx, sum(x * y)::BIGINT AS sxy
        |  FROM pts)
        |SELECT n AS n_terms,
        |  round((n::DOUBLE * sxy - sx::DOUBLE * sy)
        |    / (n::DOUBLE * sxx - sx::DOUBLE * sx), 6) AS slope,
        |  round((sy::DOUBLE - (n::DOUBLE * sxy - sx::DOUBLE * sy)
        |    / (n::DOUBLE * sxx - sx::DOUBLE * sx) * sx) / n / 1e3, 6) AS intercept
        |FROM s""".stripMargin,

    "t_vocab" ->
      """WITH norm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, unnest(CASE WHEN norm = '' THEN []::VARCHAR[]
        |       ELSE regexp_split_to_array(norm, '\s+') END) AS term
        |  FROM norm),
        |census AS (
        |  SELECT term, count(*) AS freq, count(DISTINCT doc_id) AS doc_freq
        |  FROM tok WHERE term <> '' GROUP BY term HAVING count(*) >= 3),
        |ranked AS (
        |  SELECT (row_number() OVER (ORDER BY freq DESC, term ASC) - 1)::BIGINT AS token_id,
        |    term, freq, doc_freq
        |  FROM census)
        |SELECT token_id, term, freq, doc_freq FROM ranked
        |WHERE token_id < 1000""".stripMargin,

    "t_bigram_pmi" ->
      """WITH norm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
        |  FROM documents),
        |toks AS (
        |  SELECT doc_id, CASE WHEN norm = '' THEN []::VARCHAR[]
        |       ELSE regexp_split_to_array(norm, '\s+') END AS toks
        |  FROM norm),
        |uni AS (
        |  SELECT t, count(*) AS c
        |  FROM (SELECT unnest(toks) AS t FROM toks) WHERE t <> ''
        |  GROUP BY t),
        |ntot AS (SELECT sum(c) AS n FROM uni),
        |bigall AS (
        |  SELECT g, count(*) AS c_ab FROM (
        |    SELECT unnest([array_to_string(toks[i:i+1], ' ')
        |                   FOR i IN range(1, len(toks))]) AS g
        |    FROM toks WHERE len(toks) >= 2)
        |  GROUP BY g),
        |btot AS (SELECT sum(c_ab) AS b FROM bigall),
        |kept AS (
        |  SELECT split_part(g, ' ', 1) AS term_a, split_part(g, ' ', 2) AS term_b, c_ab
        |  FROM bigall WHERE c_ab >= 3)
        |SELECT k.term_a, k.term_b, k.c_ab,
        |  round(ln(k.c_ab::DOUBLE * n.n * n.n / (t.b::DOUBLE * a.c * b2.c)), 6) AS pmi
        |FROM kept k
        |JOIN uni a ON a.t = k.term_a
        |JOIN uni b2 ON b2.t = k.term_b
        |CROSS JOIN ntot n CROSS JOIN btot t""".stripMargin,

    "t_perplexity_buckets" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(CASE WHEN trim(text) = '' THEN []::VARCHAR[]
        |       ELSE regexp_split_to_array(trim(text), '\s+') END) AS t
        |  FROM documents),
        |census AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
        |tot AS (SELECT sum(c) AS n FROM census),
        |lp AS (
        |  SELECT doc_id, CAST(round(log10(c::DOUBLE / n) * 1e6) AS BIGINT) AS lp
        |  FROM tok JOIN census USING (t) CROSS JOIN tot),
        |agg AS (
        |  SELECT doc_id, count(*) AS n_tokens, sum(lp)::BIGINT AS logp_sum_micro
        |  FROM lp GROUP BY doc_id),
        |scored AS (
        |  SELECT doc_id, n_tokens::BIGINT AS n_tokens,
        |    round(logp_sum_micro::DOUBLE / n_tokens / 1e6, 6) AS avg_logp10
        |  FROM agg WHERE n_tokens > 0),
        |ranked AS (
        |  SELECT *, percent_rank() OVER (ORDER BY avg_logp10 DESC, doc_id ASC) AS pr
        |  FROM scored)
        |SELECT doc_id, n_tokens, avg_logp10,
        |  CASE WHEN pr < 1.0/3 THEN 'head'
        |       WHEN pr >= 1.0 - 1.0/3 THEN 'tail'
        |       ELSE 'middle' END AS bucket
        |FROM ranked""".stripMargin,

    "s_shuffle_perm" ->
      """WITH h AS (
        |  SELECT doc_id, lang,
        |    md5('shuffle:42:' || doc_id::VARCHAR) AS hx
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, lang, hx,
        |    CAST((('0x' || substr(hx, 1, 15))::BIGINT >> 57) AS INT) AS shard
        |  FROM h),
        |p AS (
        |  SELECT doc_id, lang, shard,
        |    row_number() OVER (PARTITION BY shard
        |                       ORDER BY hx ASC, doc_id ASC)::BIGINT AS pos
        |  FROM s),
        |off AS (
        |  SELECT shard,
        |    coalesce(sum(cnt) OVER (ORDER BY shard
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS o
        |  FROM (SELECT shard, count(*) AS cnt FROM p GROUP BY shard))
        |SELECT doc_id, lang, shard, pos, (o + pos)::BIGINT AS global_pos
        |FROM p JOIN off USING (shard)""".stripMargin,

    "d_semantic_decontaminate" ->
      """WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
        |           FROM embeddings WHERE vec_id < 8),
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
        |scored0 AS (
        |  SELECT e.vec_id, c.cid,
        |    list_dot_product(cv, cv) - 2 * list_dot_product(ev, cv) AS sc
        |  FROM e CROSS JOIN c),
        |train AS (
        |  SELECT vec_id AS train_id, cid AS cluster_id FROM (
        |    SELECT vec_id, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY sc ASC, cid ASC) AS rn
        |    FROM scored0 WHERE vec_id % 10 <> 0) WHERE rn = 1),
        |test AS (
        |  SELECT vec_id AS test_id, cid AS cluster_id FROM (
        |    SELECT vec_id, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY sc ASC, cid ASC) AS rn
        |    FROM scored0 WHERE vec_id % 10 = 0) WHERE rn <= 2),
        |pairs AS (
        |  SELECT t.test_id, tr.train_id,
        |    round(list_cosine_similarity(te.ev, tre.ev), 6) AS cosine
        |  FROM test t JOIN train tr USING (cluster_id)
        |  JOIN e te ON te.vec_id = t.test_id
        |  JOIN e tre ON tre.vec_id = tr.train_id
        |  WHERE round(list_cosine_similarity(te.ev, tre.ev), 6) >= 0.3),
        |ranked AS (
        |  SELECT test_id, train_id, cosine,
        |    row_number() OVER (PARTITION BY test_id
        |                       ORDER BY cosine DESC, train_id ASC) AS rk,
        |    count(*) OVER (PARTITION BY test_id) AS n_matches,
        |    max(cosine) OVER (PARTITION BY test_id) AS maxc
        |  FROM pairs)
        |SELECT test_id, train_id AS best_train_id,
        |  round(maxc, 6) AS max_cosine, n_matches
        |FROM ranked WHERE rk = 1""".stripMargin,

    "t_dsir_scores" ->
      s"""WITH $dsirScoreSql
        |SELECT d.doc_id, coalesce(a.n_feats, 0)::BIGINT AS n_feats,
        |  a.llr_micro,
        |  round(a.llr_micro::DOUBLE / a.n_feats / 1e6, 6) AS llr_per_feat
        |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin,

    "t_dsir_sample" ->
      s"""WITH $dsirScoreSql,
        |sc AS (
        |  SELECT doc_id, n_feats,
        |    round(llr_micro::DOUBLE / n_feats / 1e6, 6) AS llr_per_feat,
        |    (('0x' || substr(md5('dsir:7:' || doc_id::VARCHAR), 1, 15))::BIGINT::DOUBLE + 0.5)
        |      / 1.152921504606846976e18 AS u
        |  FROM agg WHERE n_feats > 0)
        |SELECT doc_id, n_feats, llr_per_feat,
        |  round(llr_per_feat / 1.0 - ln(-ln(u)), 6) AS gkey
        |FROM sc
        |ORDER BY gkey DESC, doc_id ASC LIMIT 100""".stripMargin,

    "t_nb_classifier" ->
      s"""WITH $nbScoreSql
        |SELECT d.doc_id, coalesce(a.n_feats, 0)::BIGINT AS n_feats,
        |  (coalesce(a.w_sum_micro, 0) + p.prior_micro)::BIGINT AS score_micro,
        |  round(a.w_sum_micro::DOUBLE / a.n_feats / 1e6, 6) AS w_per_feat,
        |  (coalesce(a.w_sum_micro, 0) + p.prior_micro) > 0 AS pred_positive
        |FROM documents d LEFT JOIN nbagg a USING (doc_id) CROSS JOIN nbprior p""".stripMargin,

    "v_roc_auc" ->
      s"""WITH $nbEvalSql
        |SELECT sum(n_pos)::BIGINT AS n_pos, sum(n_neg)::BIGINT AS n_neg,
        |  CASE WHEN sum(n_pos) > 0 AND sum(n_neg) > 0 THEN
        |    round(sum(n_pos * (2 * cumneg_below + n_neg))::DOUBLE
        |      / (2.0 * sum(n_pos) * sum(n_neg)), 6) END AS auc
        |FROM vcum""".stripMargin,

    "v_precision_threshold" ->
      s"""WITH $nbEvalSql,
        |vt AS (SELECT sum(n_pos)::BIGINT AS p_tot,
        |              sum(n_neg)::BIGINT AS n_tot FROM vcen),
        |vlev AS (
        |  SELECT s, p_tot, (p_tot - cumpos_below)::BIGINT AS tp,
        |    (n_tot - cumneg_below)::BIGINT AS fp
        |  FROM vcum CROSS JOIN vt),
        |vgrid AS (SELECT unnest([500000, 800000, 900000, 950000])::BIGINT
        |          AS target_micro),
        |vpass AS (
        |  SELECT target_micro, s, tp, fp, p_tot,
        |    row_number() OVER (PARTITION BY target_micro
        |      ORDER BY tp DESC, s ASC) AS rk
        |  FROM vlev CROSS JOIN vgrid
        |  WHERE tp * 1000000 >= target_micro * (tp + fp))
        |SELECT g.target_micro, p.s AS threshold_micro, p.tp, p.fp,
        |  round(p.tp::DOUBLE / (p.tp + p.fp), 6) AS precision,
        |  round(p.tp::DOUBLE / p.p_tot, 6) AS recall
        |FROM vgrid g
        |LEFT JOIN (SELECT * FROM vpass WHERE rk = 1) p
        |  USING (target_micro)""".stripMargin,

    // hour floor on non-negative µs: // ≡ Spark's pmod subtraction; the
    // per-hour representative = max of the (ts_us, event_id, vmicro)
    // struct = row_number by the same total order
    "x_gapfill" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(ts::TIMESTAMP) AS ts_us, event_id,
        |    CAST(round(coalesce(value, 0) * 1e6) AS BIGINT) AS vmicro,
        |    (epoch_us(ts::TIMESTAMP) // 3600000000) * 3600000000 AS hour_us
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |phc AS (
        |  SELECT user_id, hour_us, count(*)::BIGINT AS n_events
        |  FROM ev GROUP BY 1, 2),
        |phl AS (
        |  SELECT user_id, hour_us, vmicro AS v_last FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, hour_us
        |      ORDER BY ts_us DESC, event_id DESC) AS rn FROM ev)
        |  WHERE rn = 1),
        |ph AS (
        |  SELECT c.user_id, c.hour_us, c.n_events, l.v_last
        |  FROM phc c JOIN phl l USING (user_id, hour_us)),
        |bounds AS (
        |  SELECT user_id, min(hour_us)::BIGINT AS h0, max(hour_us)::BIGINT AS h1
        |  FROM ev GROUP BY 1),
        |grid AS (
        |  SELECT user_id, unnest(range(h0, h1 + 3600000000, 3600000000))::BIGINT AS hour_us
        |  FROM bounds)
        |SELECT g.user_id, g.hour_us,
        |  coalesce(p.n_events, 0)::BIGINT AS n_events,
        |  last_value(p.v_last IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.hour_us
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_cf_micro
        |FROM grid g LEFT JOIN ph p
        |  ON p.user_id = g.user_id AND p.hour_us = g.hour_us""".stripMargin,

    // Every CV fold's training censuses, smoothed weights, prior, score
    // sums and the per-fold rank-sum AUC replayed — folds from the same
    // portable md5 draw as the plan.
    "v_cv_nb_auc" -> {
      val k = 5
      val perFold = (0 until k).map { i =>
        s"""pc$i AS (SELECT b, count(*)::BIGINT AS cp FROM fb
          |  JOIN cvfold t USING (doc_id) WHERE t.f <> $i AND fb.lang = 'en'
          |  GROUP BY b),
          |nc$i AS (SELECT b, count(*)::BIGINT AS cn FROM fb
          |  JOIN cvfold t USING (doc_id)
          |  WHERE t.f <> $i AND fb.lang <> 'en' GROUP BY b),
          |pt$i AS (SELECT coalesce(sum(cp), 0)::BIGINT AS cptot FROM pc$i),
          |nt$i AS (SELECT coalesce(sum(cn), 0)::BIGINT AS cntot FROM nc$i),
          |w$i AS (
          |  SELECT coalesce(pc.b, nc.b) AS b,
          |    CAST(round(log10((coalesce(pc.cp, 0)::DOUBLE + 1.0) * (nt.cntot::DOUBLE + 1024.0)
          |      / ((coalesce(nc.cn, 0)::DOUBLE + 1.0) * (pt.cptot::DOUBLE + 1024.0))) * 1e6) AS BIGINT) AS w_micro
          |  FROM pc$i pc FULL OUTER JOIN nc$i nc ON pc.b = nc.b
          |  CROSS JOIN pt$i pt CROSS JOIN nt$i nt),
          |pr$i AS (SELECT CAST(round(log10(
          |    ((SELECT count(*) FROM cvfold t JOIN documents d USING (doc_id)
          |      WHERE t.f <> $i AND d.lang = 'en')::DOUBLE + 1.0)
          |  / ((SELECT count(*) FROM cvfold t JOIN documents d USING (doc_id)
          |      WHERE t.f <> $i AND d.lang <> 'en')::DOUBLE + 1.0)) * 1e6) AS BIGINT) AS prior_micro),
          |ag$i AS (SELECT fb.doc_id, sum(coalesce(w.w_micro, 0))::BIGINT AS ws
          |  FROM fb JOIN cvfold t USING (doc_id) LEFT JOIN w$i w USING (b)
          |  WHERE t.f = $i GROUP BY 1),
          |sc$i AS (SELECT t.doc_id,
          |    (coalesce(a.ws, 0) + p.prior_micro)::BIGINT AS s,
          |    (d.lang = 'en') AS label, $i::BIGINT AS fold
          |  FROM cvfold t JOIN documents d USING (doc_id)
          |  LEFT JOIN ag$i a ON a.doc_id = t.doc_id CROSS JOIN pr$i p
          |  WHERE t.f = $i)""".stripMargin
      }.mkString(",\n")
      val unions = (0 until k).map(i => s"SELECT * FROM sc$i")
        .mkString("\n  UNION ALL ")
      s"""WITH $hashedFeatureSql,
        |cvfold AS MATERIALIZED (
        |  SELECT doc_id,
        |    ('0x' || substr(md5('cv:' || doc_id::VARCHAR), 1, 15))::BIGINT % $k AS f
        |  FROM documents WHERE lang IS NOT NULL),
        |$perFold,
        |cvsc AS (
        |  $unions),
        |cvcen AS (
        |  SELECT fold, s,
        |    sum(CASE WHEN label THEN 1 ELSE 0 END)::BIGINT AS n_pos,
        |    sum(CASE WHEN label THEN 0 ELSE 1 END)::BIGINT AS n_neg
        |  FROM cvsc GROUP BY 1, 2),
        |cvcum AS (
        |  SELECT fold, n_pos, n_neg,
        |    coalesce(sum(n_neg) OVER (PARTITION BY fold ORDER BY s ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |  FROM cvcen)
        |SELECT fold, sum(n_pos)::BIGINT AS n_pos, sum(n_neg)::BIGINT AS n_neg,
        |  CASE WHEN sum(n_pos) > 0 AND sum(n_neg) > 0 THEN
        |    round(sum(n_pos * (2 * cb + n_neg))::DOUBLE
        |      / (2.0 * sum(n_pos) * sum(n_neg)), 6) END AS auc
        |FROM cvcum GROUP BY fold""".stripMargin
    },

    "v_auc_by" ->
      s"""WITH $nbEvalSql,
        |gsc AS (
        |  SELECT d.source AS grp, v.s, v.label
        |  FROM vscored v JOIN documents d USING (doc_id)),
        |gcen AS (
        |  SELECT grp, s,
        |    sum(CASE WHEN label THEN 1 ELSE 0 END)::BIGINT AS n_pos,
        |    sum(CASE WHEN label THEN 0 ELSE 1 END)::BIGINT AS n_neg
        |  FROM gsc GROUP BY 1, 2),
        |gcum AS (
        |  SELECT grp, n_pos, n_neg,
        |    coalesce(sum(n_neg) OVER (PARTITION BY grp ORDER BY s ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |  FROM gcen)
        |SELECT grp, sum(n_pos)::BIGINT AS n_pos,
        |  sum(n_neg)::BIGINT AS n_neg,
        |  CASE WHEN sum(n_pos) > 0 AND sum(n_neg) > 0 THEN
        |    round(sum(n_pos * (2 * cb + n_neg))::DOUBLE
        |      / (2.0 * sum(n_pos) * sum(n_neg)), 6) END AS auc
        |FROM gcum GROUP BY grp""".stripMargin,

    "v_fairness" ->
      s"""WITH $nbEvalSql,
        |fgc AS (
        |  SELECT d.source AS grp,
        |    sum(CASE WHEN v.s > 0 AND v.label THEN 1 ELSE 0 END)::BIGINT AS tp,
        |    sum(CASE WHEN v.s > 0 AND NOT v.label THEN 1 ELSE 0 END)::BIGINT AS fp,
        |    sum(CASE WHEN v.s <= 0 AND v.label THEN 1 ELSE 0 END)::BIGINT AS fn,
        |    sum(CASE WHEN v.s <= 0 AND NOT v.label THEN 1 ELSE 0 END)::BIGINT AS tn
        |  FROM vscored v JOIN documents d USING (doc_id) GROUP BY 1),
        |fgr AS (
        |  SELECT grp, (tp + fp + fn + tn)::BIGINT AS n, tp, fp, fn, tn,
        |    CASE WHEN tp + fp + fn + tn > 0 THEN
        |      round((tp + fp)::DOUBLE / (tp + fp + fn + tn), 6) END AS pos_rate,
        |    CASE WHEN tp + fn > 0 THEN round(tp::DOUBLE / (tp + fn), 6) END AS tpr,
        |    CASE WHEN fp + tn > 0 THEN round(fp::DOUBLE / (fp + tn), 6) END AS fpr
        |  FROM fgc),
        |fpl AS (
        |  SELECT
        |    CASE WHEN sum(tp + fp + fn + tn) > 0 THEN
        |      round(sum(tp + fp)::DOUBLE / sum(tp + fp + fn + tn), 6) END AS p_pos,
        |    CASE WHEN sum(tp + fn) > 0 THEN
        |      round(sum(tp)::DOUBLE / sum(tp + fn), 6) END AS p_tpr,
        |    CASE WHEN sum(fp + tn) > 0 THEN
        |      round(sum(fp)::DOUBLE / sum(fp + tn), 6) END AS p_fpr
        |  FROM fgc)
        |SELECT grp, n, tp, fp, fn, tn, pos_rate, tpr, fpr,
        |  round(pos_rate - p_pos, 6) AS dp_gap,
        |  round(tpr - p_tpr, 6) AS tpr_gap,
        |  round(fpr - p_fpr, 6) AS fpr_gap,
        |  greatest(
        |    coalesce(abs(round(tpr - p_tpr, 6)), abs(round(fpr - p_fpr, 6))),
        |    coalesce(abs(round(fpr - p_fpr, 6)), abs(round(tpr - p_tpr, 6))))
        |    AS eo_gap
        |FROM fgr CROSS JOIN fpl""".stripMargin,

    "v_avg_precision" ->
      s"""WITH $nbEvalSql,
        |vtot AS (SELECT sum(n_pos)::BIGINT AS p_tot,
        |                sum(n_neg)::BIGINT AS n_tot FROM vcen),
        |vlev AS (
        |  SELECT n_pos, p_tot, n_tot,
        |    CAST(round((p_tot - cumpos_below)::DOUBLE
        |      / (p_tot - cumpos_below + n_tot - cumneg_below) * 1e9)
        |      AS BIGINT) AS prec_nano
        |  FROM vcum CROSS JOIN vtot)
        |SELECT max(p_tot) AS n_pos, max(n_tot) AS n_neg,
        |  CASE WHEN max(p_tot) > 0 THEN
        |    round(sum(n_pos * prec_nano)::DOUBLE / 1e9 / max(p_tot), 6)
        |  END AS ap
        |FROM vlev""".stripMargin,

    "v_calibration" ->
      s"""WITH $nbEvalSql,
        |vbin AS (
        |  SELECT greatest(-8, least(8, floor(s::DOUBLE / 1000000))) AS bin,
        |    CASE WHEN label THEN 1 ELSE 0 END AS y, s
        |  FROM vscored),
        |vagg AS (
        |  SELECT bin::BIGINT AS bin, count(*)::BIGINT AS n,
        |    sum(y)::BIGINT AS n_pos, sum(s)::BIGINT AS ssum
        |  FROM vbin GROUP BY 1)
        |SELECT bin, n, n_pos,
        |  CAST(round(n_pos::DOUBLE / n * 1e6) AS BIGINT) AS obs_micro,
        |  CAST(round(1e6 / (1.0 + pow(10, -(ssum::DOUBLE / n / 1e6))))
        |    AS BIGINT) AS pred_micro,
        |  abs(CAST(round(n_pos::DOUBLE / n * 1e6) AS BIGINT)
        |    - CAST(round(1e6 / (1.0 + pow(10, -(ssum::DOUBLE / n / 1e6))))
        |      AS BIGINT)) AS gap_micro
        |FROM vagg""".stripMargin,

    "v_pinball" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |m AS (
        |  SELECT event_type,
        |    CAST(round(sum(cents)::DOUBLE / count(*)) AS BIGINT) AS pred
        |  FROM ev GROUP BY 1),
        |b AS (
        |  SELECT e.event_type AS key, e.cents - m.pred AS d
        |  FROM ev e JOIN m USING (event_type)),
        |t AS (SELECT unnest([100000, 500000, 900000])::BIGINT
        |  AS tau_micro),
        |s AS (
        |  SELECT key, tau_micro, count(*)::BIGINT AS n,
        |    sum(greatest(tau_micro * d, (tau_micro - 1000000) * d)
        |      )::BIGINT AS loss_sum_micro
        |  FROM b CROSS JOIN t GROUP BY 1, 2)
        |SELECT key, tau_micro, n, loss_sum_micro,
        |  loss_sum_micro::DOUBLE / (1000000.0 * n::DOUBLE) AS loss
        |FROM s""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*)::BIGINT AS n,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT))::BIGINT
        |    AS sum_cents,
        |  (2 * GROUPING(l_returnflag) + GROUPING(l_linestatus))::BIGINT
        |    AS gid
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "v_conformal" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_partkey,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem),
        |train AS (SELECT * FROM li WHERE l_orderkey % 3 = 0),
        |model AS (
        |  SELECT l_partkey,
        |    CAST(round(sum(cents)::DOUBLE / count(*)) AS BIGINT) AS pred_part
        |  FROM train GROUP BY 1),
        |g AS (
        |  SELECT CAST(round(sum(cents)::DOUBLE / count(*)) AS BIGINT)
        |    AS pred_g
        |  FROM train),
        |cal AS (
        |  SELECT abs(l.cents
        |    - coalesce(m.pred_part, (SELECT pred_g FROM g))) AS s
        |  FROM li l LEFT JOIN model m USING (l_partkey)
        |  WHERE l.l_orderkey % 3 = 1),
        |tst AS (
        |  SELECT abs(l.cents
        |    - coalesce(m.pred_part, (SELECT pred_g FROM g))) AS s
        |  FROM li l LEFT JOIN model m USING (l_partkey)
        |  WHERE l.l_orderkey % 3 = 2),
        |nk AS (
        |  SELECT count(*)::BIGINT AS n_cal,
        |    (((1000000 - 100000) * (count(*) + 1) + 999999) // 1000000
        |    )::BIGINT AS k
        |  FROM cal),
        |q AS (
        |  SELECT (SELECT s FROM (
        |      SELECT s, row_number() OVER (ORDER BY s) AS rn FROM cal) r
        |    WHERE r.rn = (SELECT k FROM nk))::BIGINT AS qhat),
        |t AS (
        |  SELECT count(*)::BIGINT AS n_test,
        |    sum(CASE WHEN (SELECT qhat FROM q) IS NULL
        |             OR s <= (SELECT qhat FROM q)
        |        THEN 1 ELSE 0 END)::BIGINT AS covered
        |  FROM tst)
        |SELECT nk.n_cal, nk.k, q.qhat, t.n_test, t.covered,
        |  t.covered::DOUBLE / t.n_test AS coverage
        |FROM nk, q, t""".stripMargin,

    // Platt: init from counts, then every Newton round unrolled — per
    // round one sums CTE (micro-rounded per census row and class,
    // count-weighted exact sums) and one 1-row (am, bm) update CTE;
    // the 1e6 scalings cancel in the 2x2 solve so the ratio reads the
    // micro longs directly.
    "v_platt" -> {
      val rounds = (1 to 5).map { r =>
        s"""pp$r AS (
           |  SELECT c.sm, c.np, c.nn, c.sm::DOUBLE / 1000000.0 AS sv,
           |    1.0 / (1.0 + exp(-(a.am::DOUBLE / 1000000.0
           |      * (c.sm::DOUBLE / 1000000.0)
           |      + a.bm::DOUBLE / 1000000.0))) AS p,
           |    t.tp, t.tn
           |  FROM pcen c, pab${r - 1} a, ptgt t),
           |psum$r AS (
           |  SELECT
           |    sum(CAST(round(((p - tp) * sv) * 1000000.0) AS BIGINT) * np
           |      + CAST(round(((p - tn) * sv) * 1000000.0) AS BIGINT) * nn
           |      )::BIGINT AS g1,
           |    sum(CAST(round((p - tp) * 1000000.0) AS BIGINT) * np
           |      + CAST(round((p - tn) * 1000000.0) AS BIGINT) * nn
           |      )::BIGINT AS g2,
           |    sum(CAST(round((p * (1.0 - p) * sv * sv) * 1000000.0)
           |        AS BIGINT) * (np + nn))::BIGINT AS h11,
           |    sum(CAST(round((p * (1.0 - p) * sv) * 1000000.0)
           |        AS BIGINT) * (np + nn))::BIGINT AS h12,
           |    sum(CAST(round((p * (1.0 - p)) * 1000000.0)
           |        AS BIGINT) * (np + nn))::BIGINT AS h22
           |  FROM pp$r),
           |pab$r AS (
           |  SELECT
           |    CASE WHEN det = 0.0 THEN am
           |      ELSE CAST(round((am::DOUBLE / 1000000.0
           |        - (h22::DOUBLE * g1::DOUBLE - h12::DOUBLE * g2::DOUBLE)
           |          / det) * 1000000.0) AS BIGINT) END AS am,
           |    CASE WHEN det = 0.0 THEN bm
           |      ELSE CAST(round((bm::DOUBLE / 1000000.0
           |        - (h11::DOUBLE * g2::DOUBLE - h12::DOUBLE * g1::DOUBLE)
           |          / det) * 1000000.0) AS BIGINT) END AS bm
           |  FROM (SELECT a.am, a.bm, s.*,
           |      (s.h11::DOUBLE * s.h22::DOUBLE
           |        - s.h12::DOUBLE * s.h12::DOUBLE) AS det
           |    FROM pab${r - 1} a, psum$r s))""".stripMargin
      }.mkString(",\n")
      s"""WITH $nbEvalSql,
        |pcen AS (
        |  SELECT s AS sm,
        |    sum(CASE WHEN label THEN 1 ELSE 0 END)::BIGINT AS np,
        |    sum(CASE WHEN label THEN 0 ELSE 1 END)::BIGINT AS nn
        |  FROM vscored GROUP BY s),
        |pa AS (
        |  SELECT sum(np)::BIGINT AS npos, sum(nn)::BIGINT AS nneg
        |  FROM pcen),
        |ptgt AS (
        |  SELECT (npos + 1.0) / (npos + 2.0) AS tp,
        |    1.0 / (nneg + 2.0) AS tn
        |  FROM pa),
        |pab0 AS (
        |  SELECT 0::BIGINT AS am,
        |    CAST(round(ln((nneg + 1.0) / (npos + 1.0)) * 1000000.0)
        |      AS BIGINT) AS bm
        |  FROM pa),
        |$rounds,
        |pfin AS (
        |  SELECT c.np, c.nn,
        |    1.0 / (1.0 + exp(-(a.am::DOUBLE / 1000000.0
        |      * (c.sm::DOUBLE / 1000000.0)
        |      + a.bm::DOUBLE / 1000000.0))) AS p
        |  FROM pcen c, pab5 a)
        |SELECT pa.npos AS n_pos, pa.nneg AS n_neg,
        |  (SELECT am FROM pab5) AS a_micro,
        |  (SELECT bm FROM pab5) AS b_micro,
        |  (SELECT sum(CAST(round(-ln(p) * 1000000.0) AS BIGINT) * np
        |     + CAST(round(-ln(1.0 - p) * 1000000.0) AS BIGINT) * nn)
        |   FROM pfin)::DOUBLE
        |    / (1000000.0 * (pa.npos + pa.nneg)::DOUBLE) AS logloss
        |FROM pa""".stripMargin
    },

    "v_nb_explain" ->
      s"""WITH $nbScoreSql,
        |xfbt AS (
        |  SELECT doc_id, t,
        |    ('0x' || substr(md5(t), 1, 15))::BIGINT % 1024 AS b
        |  FROM feats WHERE doc_id % 4 = 0),
        |xcon AS (
        |  SELECT f.doc_id, f.t, min(f.b)::BIGINT AS b,
        |    count(*)::BIGINT AS n_occ,
        |    sum(w.w_micro)::BIGINT AS contrib_micro
        |  FROM xfbt f JOIN w ON w.b = f.b
        |  GROUP BY f.doc_id, f.t
        |  HAVING sum(w.w_micro) <> 0)
        |SELECT doc_id, t, b, n_occ, contrib_micro, rank FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY abs(contrib_micro) DESC, t ASC) AS rank
        |  FROM xcon) WHERE rank <= 5""".stripMargin,

    "v_isotonic" ->
      s"""WITH RECURSIVE $nbEvalSql,
        |vbin AS (
        |  SELECT greatest(-8, least(8, floor(s::DOUBLE / 1000000))) AS bin,
        |    CASE WHEN label THEN 1 ELSE 0 END AS y
        |  FROM vscored),
        |vagg AS (
        |  SELECT bin::BIGINT AS bin, count(*)::BIGINT AS n,
        |    sum(y)::BIGINT AS n_pos
        |  FROM vbin GROUP BY 1),
        |vrk AS MATERIALIZED (
        |  SELECT bin, n, n_pos, row_number() OVER (ORDER BY bin) AS rn
        |  FROM vagg),
        |vnb AS (SELECT count(*)::BIGINT AS nb FROM vrk),
        |pav AS (
        |  SELECT 0::BIGINT AS k, []::BIGINT[] AS ns, []::BIGINT[] AS ps,
        |    []::BIGINT[] AS cs
        |  UNION ALL
        |  SELECT
        |    CASE WHEN p.viol THEN p.k ELSE p.k + 1 END,
        |    CASE WHEN p.viol THEN p.ns[1:len(p.ns)-2] || [p.ns[-2] + p.ns[-1]]
        |         ELSE p.ns || [nx.n] END,
        |    CASE WHEN p.viol THEN p.ps[1:len(p.ps)-2] || [p.ps[-2] + p.ps[-1]]
        |         ELSE p.ps || [nx.n_pos] END,
        |    CASE WHEN p.viol THEN p.cs[1:len(p.cs)-2] || [p.cs[-2] + p.cs[-1]]
        |         ELSE p.cs || [1::BIGINT] END
        |  FROM (SELECT k, ns, ps, cs,
        |          (len(ns) >= 2 AND ps[-2] * ns[-1] > ps[-1] * ns[-2]) AS viol
        |        FROM pav) p
        |  LEFT JOIN vrk nx ON (NOT p.viol) AND nx.rn = p.k + 1
        |  WHERE p.viol OR p.k < (SELECT nb FROM vnb)),
        |fin AS (
        |  SELECT ns, ps, cs FROM (
        |    SELECT *, (len(ns) >= 2 AND ps[-2] * ns[-1] > ps[-1] * ns[-2]) AS viol
        |    FROM pav)
        |  WHERE k = (SELECT nb FROM vnb) AND NOT viol),
        |pools AS (
        |  SELECT ns[j] AS pn, ps[j] AS pp,
        |    coalesce(list_sum(cs[1:j-1]), 0) AS clo,
        |    coalesce(list_sum(cs[1:j]), 0) AS chi
        |  FROM fin, unnest(range(1, len(cs) + 1)) AS t(j))
        |SELECT c.bin, c.n, c.n_pos,
        |  ((2 * pp::HUGEINT * 1000000 + pn) // (2 * pn))::BIGINT AS iso_micro
        |FROM vrk c JOIN pools p ON c.rn > p.clo AND c.rn <= p.chi""".stripMargin,

    "v_calibration_ece" ->
      s"""WITH $nbEvalSql,
        |vbin AS (
        |  SELECT greatest(-8, least(8, floor(s::DOUBLE / 1000000))) AS bin,
        |    CASE WHEN label THEN 1 ELSE 0 END AS y, s
        |  FROM vscored),
        |vagg AS (
        |  SELECT bin, count(*)::BIGINT AS n, sum(y)::BIGINT AS n_pos,
        |    sum(s)::BIGINT AS ssum
        |  FROM vbin GROUP BY 1),
        |vgap AS (
        |  SELECT n,
        |    abs(CAST(round(n_pos::DOUBLE / n * 1e6) AS BIGINT)
        |      - CAST(round(1e6 / (1.0 + pow(10, -(ssum::DOUBLE / n / 1e6))))
        |        AS BIGINT)) AS gap_micro
        |  FROM vagg)
        |SELECT sum(n)::BIGINT AS n, count(*)::BIGINT AS n_bins,
        |  round(sum(n * gap_micro)::DOUBLE / sum(n) / 1e6, 6) AS ece
        |FROM vgap""".stripMargin,

    "v_confusion" ->
      s"""WITH $nbEvalSql,
        |vcnt AS (
        |  SELECT
        |    sum(CASE WHEN s > 0 AND label THEN 1 ELSE 0 END)::BIGINT AS tp,
        |    sum(CASE WHEN s > 0 AND NOT label THEN 1 ELSE 0 END)::BIGINT AS fp,
        |    sum(CASE WHEN s <= 0 AND label THEN 1 ELSE 0 END)::BIGINT AS fn,
        |    sum(CASE WHEN s <= 0 AND NOT label THEN 1 ELSE 0 END)::BIGINT AS tn
        |  FROM vscored)
        |SELECT tp, fp, fn, tn,
        |  CASE WHEN tp + fp > 0 THEN round(tp::DOUBLE / (tp + fp), 6) END
        |    AS precision,
        |  CASE WHEN tp + fn > 0 THEN round(tp::DOUBLE / (tp + fn), 6) END
        |    AS recall,
        |  CASE WHEN 2 * tp + fp + fn > 0 THEN
        |    round(2.0 * tp / (2 * tp + fp + fn), 6) END AS f1,
        |  round((tp + tn)::DOUBLE / (tp + fp + fn + tn), 6) AS accuracy
        |FROM vcnt""".stripMargin,

    // the pruned scan must return EXACTLY the full-scan IN-list rows —
    // file skipping is an IO optimization, never a semantics change
    "s8_bloom_prune" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE doc_id IN (7, 8, 9, 11, 13, 1000001)""".stripMargin,

    "s7_zorder" -> {
      val terms = (0 until 16).map(i =>
        s"((((user_id & 65535) >> $i) & 1) << ${2 * i}) | ((((event_id & 65535) >> $i) & 1) << ${2 * i + 1})")
        .mkString(" | ")
      s"SELECT event_id, ($terms)::BIGINT AS z FROM events"
    },

    "a15_sessionize" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_us(ts::TIMESTAMP) AS ts_us FROM events),
        |brk AS (
        |  SELECT event_id, user_id, ts_us,
        |    CASE WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS b
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |asgn AS (
        |  SELECT user_id, ts_us,
        |    sum(b) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                 ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM brk)
        |SELECT user_id, session_id::BIGINT AS session_id,
        |  count(*) AS n_events, min(ts_us) AS start_us, max(ts_us) AS end_us,
        |  max(ts_us) - min(ts_us) AS duration_us
        |FROM asgn GROUP BY user_id, session_id""".stripMargin,

    "e_hard_negatives" ->
      """WITH q AS (
        |  SELECT a.vec_id AS query_id, a.vec_id + 1 AS pos_id,
        |    a.embedding::DOUBLE[] AS qv,
        |    round(list_cosine_similarity(a.embedding::DOUBLE[], p.embedding::DOUBLE[]), 6) AS pos_cos6
        |  FROM embeddings a JOIN embeddings p ON p.vec_id = a.vec_id + 1
        |  WHERE a.vec_id % 10 = 0),
        |scored AS (
        |  SELECT q.query_id, q.pos_id, c.vec_id AS neighbor_id, q.pos_cos6,
        |    round(list_cosine_similarity(c.embedding::DOUBLE[], q.qv), 6) AS cos6
        |  FROM embeddings c CROSS JOIN q
        |  WHERE c.vec_id <> q.query_id AND c.vec_id <> q.pos_id),
        |ranked AS (
        |  SELECT query_id, pos_id, neighbor_id, pos_cos6, cos6,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY cos6 DESC, neighbor_id ASC) AS rank
        |  FROM scored WHERE cos6 < pos_cos6 AND cos6 >= -1.0)
        |SELECT query_id, pos_id, neighbor_id, cos6 AS cosine, pos_cos6, rank
        |FROM ranked WHERE rank <= 5""".stripMargin,

    "a16_pivot" ->
      """SELECT user_id,
        |  sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS click,
        |  sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS view,
        |  sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS purchase,
        |  sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS signup,
        |  sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS error
        |FROM events GROUP BY user_id""".stripMargin,

    "a17_unpivot" ->
      """SELECT user_id, event_type, count(*)::BIGINT AS n
        |FROM events GROUP BY 1, 2""".stripMargin,

    "x_resample" ->
      """WITH rev AS (
        |  SELECT user_id, epoch_us(ts::TIMESTAMP) AS ts_us, value, event_id FROM events),
        |rbounds AS (
        |  SELECT user_id, min(ts_us) AS lo, max(ts_us) AS hi FROM rev GROUP BY 1),
        |rgrid AS (
        |  SELECT user_id,
        |    lo + 21600000000 * unnest(range(0, ((hi - lo) // 21600000000) + 1)) AS g_us
        |  FROM rbounds),
        |ru AS (
        |  SELECT user_id, ts_us, value, 0 AS is_grid, event_id FROM rev
        |  UNION ALL
        |  SELECT user_id, g_us, NULL, 1, NULL FROM rgrid),
        |rc AS (
        |  SELECT user_id, ts_us, is_grid,
        |    last_value(value IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY ts_us, is_grid, event_id
        |      ROWS UNBOUNDED PRECEDING) AS value
        |  FROM ru)
        |SELECT user_id, ts_us AS g_us, value FROM rc WHERE is_grid = 1""".stripMargin,

    "x_cohort_retention" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, epoch_us(ts::TIMESTAMP) // 86400000000 AS day
        |  FROM events),
        |coh AS (SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY 1),
        |sizes AS (SELECT cohort_day, count(*) AS cohort_users FROM coh GROUP BY 1)
        |SELECT c.cohort_day, ud.day - c.cohort_day AS day_offset,
        |  count(DISTINCT ud.user_id) AS n_active, s.cohort_users,
        |  round(count(DISTINCT ud.user_id)::DOUBLE / s.cohort_users, 6) AS retention
        |FROM ud JOIN coh c USING (user_id) JOIN sizes s USING (cohort_day)
        |GROUP BY c.cohort_day, ud.day - c.cohort_day, s.cohort_users""".stripMargin,

    "x_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts::TIMESTAMP) AS ts_us FROM events),
        |s0 AS (SELECT user_id, min(ts_us) AS t0_us FROM e
        |       WHERE event_type = 'signup' GROUP BY 1),
        |s1 AS (SELECT e.user_id, min(e.ts_us) AS t1_us FROM e
        |       JOIN s0 ON e.user_id = s0.user_id AND e.ts_us > s0.t0_us
        |       WHERE e.event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts_us) AS t2_us FROM e
        |       JOIN s1 ON e.user_id = s1.user_id AND e.ts_us > s1.t1_us
        |       WHERE e.event_type = 'click' GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts_us) AS t3_us FROM e
        |       JOIN s2 ON e.user_id = s2.user_id AND e.ts_us > s2.t2_us
        |       WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT s0.user_id, t0_us, t1_us, t2_us, t3_us,
        |  (1 + (t1_us IS NOT NULL)::INT + (t2_us IS NOT NULL)::INT
        |     + (t3_us IS NOT NULL)::INT)::BIGINT AS stage
        |FROM s0 LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |LEFT JOIN s3 USING (user_id)""".stripMargin,

    "x_funnel_windowed" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts::TIMESTAMP) AS ts_us FROM events),
        |s0 AS (SELECT user_id, min(ts_us) AS t0_us FROM e
        |       WHERE event_type = 'signup' GROUP BY 1),
        |s1 AS (SELECT e.user_id, s0.t0_us AS w0, min(e.ts_us) AS t1_us FROM e
        |       JOIN s0 ON e.user_id = s0.user_id AND e.ts_us > s0.t0_us
        |                AND e.ts_us <= s0.t0_us + 86400000000
        |       WHERE e.event_type = 'view' GROUP BY 1, 2),
        |s2 AS (SELECT e.user_id, s1.w0, min(e.ts_us) AS t2_us FROM e
        |       JOIN s1 ON e.user_id = s1.user_id AND e.ts_us > s1.t1_us
        |                AND e.ts_us <= s1.w0 + 86400000000
        |       WHERE e.event_type = 'click' GROUP BY 1, 2),
        |s3 AS (SELECT e.user_id, min(e.ts_us) AS t3_us FROM e
        |       JOIN s2 ON e.user_id = s2.user_id AND e.ts_us > s2.t2_us
        |                AND e.ts_us <= s2.w0 + 86400000000
        |       WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT s0.user_id, t0_us, t1_us, t2_us, t3_us,
        |  (1 + (t1_us IS NOT NULL)::INT + (t2_us IS NOT NULL)::INT
        |     + (t3_us IS NOT NULL)::INT)::BIGINT AS stage
        |FROM s0 LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |LEFT JOIN s3 USING (user_id)""".stripMargin,

    "x_funnel_counts" ->
      """WITH e AS (
        |  SELECT user_id, event_type, epoch_us(ts::TIMESTAMP) AS ts_us FROM events),
        |s0 AS (SELECT user_id, min(ts_us) AS t0_us FROM e
        |       WHERE event_type = 'signup' GROUP BY 1),
        |s1 AS (SELECT e.user_id, min(e.ts_us) AS t1_us FROM e
        |       JOIN s0 ON e.user_id = s0.user_id AND e.ts_us > s0.t0_us
        |       WHERE e.event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts_us) AS t2_us FROM e
        |       JOIN s1 ON e.user_id = s1.user_id AND e.ts_us > s1.t1_us
        |       WHERE e.event_type = 'click' GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts_us) AS t3_us FROM e
        |       JOIN s2 ON e.user_id = s2.user_id AND e.ts_us > s2.t2_us
        |       WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT step, step_name, n_users FROM (
        |  SELECT 0::BIGINT AS step, 'signup' AS step_name,
        |         (SELECT count(*) FROM s0) AS n_users
        |  UNION ALL SELECT 1, 'view', (SELECT count(*) FROM s1)
        |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
        |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3))""".stripMargin,

    // exact-mode theta estimates ≡ exact distinct counts: the oracle
    // computes the same overlapping fingerprint sets directly
    "k_theta_overlap" ->
      """WITH fp AS MATERIALIZED (
        |  SELECT doc_id,
        |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp
        |  FROM documents),
        |tr AS MATERIALIZED (
        |  SELECT DISTINCT fp FROM fp WHERE doc_id % 3 < 2 AND fp IS NOT NULL),
        |ev AS MATERIALIZED (
        |  SELECT DISTINCT fp FROM fp WHERE doc_id % 3 >= 1 AND fp IS NOT NULL),
        |m AS (
        |  SELECT
        |    (SELECT count(*) FROM ev)::BIGINT AS card_a,
        |    (SELECT count(*) FROM tr)::BIGINT AS card_b,
        |    (SELECT count(*) FROM ev JOIN tr USING (fp))::BIGINT AS card_intersect,
        |    (SELECT count(DISTINCT fp) FROM (SELECT fp FROM ev UNION ALL SELECT fp FROM tr))::BIGINT AS card_union,
        |    (SELECT count(*) FROM ev WHERE fp NOT IN (SELECT fp FROM tr))::BIGINT AS card_a_not_b)
        |SELECT 'eval' AS a, 'train' AS b, card_a, card_b, card_intersect,
        |  card_union, card_a_not_b,
        |  round(card_intersect::DOUBLE / card_union, 6) AS jaccard_est
        |FROM m""".stripMargin,

    // slice-Jaccard matrix replay: exact distinct fingerprint sets per
    // day slice, pairwise intersection via self-join, identical rounding
    "k_theta_jaccard" ->
      """WITH fpm AS MATERIALIZED (
        |  SELECT doc_id,
        |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp
        |  FROM documents),
        |sl AS (
        |  SELECT 'day0' AS g, fp FROM fpm WHERE doc_id % 4 IN (0, 1) AND fp IS NOT NULL
        |  UNION ALL
        |  SELECT 'day1', fp FROM fpm WHERE doc_id % 4 IN (1, 2) AND fp IS NOT NULL
        |  UNION ALL
        |  SELECT 'day2', fp FROM fpm WHERE doc_id % 4 IN (2, 3) AND fp IS NOT NULL),
        |ds AS MATERIALIZED (SELECT DISTINCT g, fp FROM sl),
        |cards AS MATERIALIZED (SELECT g, count(*)::BIGINT AS card FROM ds GROUP BY 1),
        |ix AS (
        |  SELECT x.g AS a, y.g AS b, count(*)::BIGINT AS inter
        |  FROM ds x JOIN ds y ON x.fp = y.fp AND x.g < y.g
        |  GROUP BY 1, 2)
        |SELECT p.a, p.b, ca.card AS card_a, cb.card AS card_b,
        |  coalesce(ix.inter, 0)::BIGINT AS card_intersect,
        |  (ca.card + cb.card - coalesce(ix.inter, 0))::BIGINT AS card_union,
        |  (ca.card - coalesce(ix.inter, 0))::BIGINT AS card_a_not_b,
        |  round(coalesce(ix.inter, 0)::DOUBLE
        |    / (ca.card + cb.card - coalesce(ix.inter, 0)), 6) AS jaccard_est
        |FROM (SELECT a.g AS a, b.g AS b FROM cards a JOIN cards b ON a.g < b.g) p
        |JOIN cards ca ON ca.g = p.a
        |JOIN cards cb ON cb.g = p.b
        |LEFT JOIN ix ON ix.a = p.a AND ix.b = p.b""".stripMargin,

    "t_url_parse" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://u' || (doc_id % 5) || ':pw@w' || (doc_id % 7) || '.' ||
        |    coalesce(lang, 'xx') || 'site.' ||
        |    (CASE WHEN doc_id % 3 = 0 THEN 'co.uk' ELSE 'com' END) ||
        |    (CASE WHEN doc_id % 4 = 0 THEN ':8080' ELSE '' END) ||
        |    repeat('/seg', (doc_id % 4)::INT) ||
        |    (CASE WHEN doc_id % 2 = 0 THEN '?q=1&r=2' ELSE '' END) AS url
        |  FROM documents),
        |h0 AS (
        |  SELECT doc_id, url,
        |    regexp_replace(regexp_replace(
        |      regexp_extract(lower(url), '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1),
        |      '^[^@]*@', ''), ':[0-9]*$', '') AS host
        |  FROM u),
        |d0 AS (
        |  SELECT doc_id, url, host, string_split(host, '.') AS l,
        |    len(string_split(host, '.')) AS n
        |  FROM h0)
        |SELECT doc_id, host,
        |  CASE WHEN n < 2 THEN ''
        |       WHEN n >= 3 AND l[n-1] IN ('co','com','net','org','ac','gov','edu')
        |         THEN array_to_string(l[n-2:n], '.')
        |       ELSE array_to_string(l[n-1:n], '.') END AS domain,
        |  len(list_filter(string_split(
        |    regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1),
        |    '/'), s -> s <> '')) AS path_depth,
        |  len(list_filter(string_split(
        |    regexp_extract(url, '\?([^#]*)', 1), '&'), s -> s <> '')) AS n_params
        |FROM d0""".stripMargin,

    // rule VALUES interpolated from the operator's own PslSnapshot Seq —
    // one source of truth for both engines
    "t_url_psl" ->
      s"""WITH u AS (
        |  SELECT doc_id, 'https://' || CASE (doc_id % 8)
        |    WHEN 0 THEN 'www.ck'
        |    WHEN 1 THEN 'a.b.github.io'
        |    WHEN 2 THEN 'x' || (doc_id % 5) || '.bbc.co.uk'
        |    WHEN 3 THEN 'example' || doc_id || '.com'
        |    WHEN 4 THEN 'bar.foo.ck'
        |    WHEN 5 THEN 'deep.a.b.c.com'
        |    WHEN 6 THEN 'site' || (doc_id % 9) || '.zz'
        |    ELSE 'sub.city.kawasaki.jp' END || '/p' AS url
        |  FROM documents),
        |h0 AS (
        |  SELECT doc_id, regexp_replace(regexp_replace(
        |      regexp_extract(lower(url), '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1),
        |      '^[^@]*@', ''), ':[0-9]*$$', '') AS host
        |  FROM u),
        |hs AS MATERIALIZED (
        |  SELECT doc_id, host, string_split(host, '.') AS l,
        |         len(string_split(host, '.')) AS n
        |  FROM h0 WHERE host <> ''),
        |cand AS (
        |  SELECT doc_id, u.k, u.wild, u.key FROM (
        |    SELECT doc_id, unnest(
        |      [{'k': k, 'wild': false,
        |        'key': array_to_string(l[n-k+1:n], '.')} FOR k IN range(1, n+1)] ||
        |      [{'k': k, 'wild': true,
        |        'key': '*.' || array_to_string(l[n-k+2:n], '.')} FOR k IN range(2, n+1)]) AS u
        |    FROM hs)),
        |pr AS (
        |  SELECT CASE WHEN rule LIKE '!%' THEN substr(rule, 2) ELSE rule END AS rkey,
        |         CASE WHEN rule LIKE '!%' THEN 'exc'
        |              WHEN rule LIKE '*.%' THEN 'wild'
        |              ELSE 'exact' END AS rtyp
        |  FROM (VALUES ${graft.operators.UrlOps.PslSnapshot
             .map(r => s"('$r')").mkString(", ")}) t(rule)),
        |m AS (
        |  SELECT c.doc_id, c.k, p.rtyp
        |  FROM cand c JOIN pr p ON c.key = p.rkey AND ((p.rtyp = 'wild') = c.wild)),
        |w AS (
        |  SELECT doc_id, max(CASE WHEN rtyp = 'exc' THEN k END) AS exck,
        |         max(CASE WHEN rtyp <> 'exc' THEN k END) AS pubk
        |  FROM m GROUP BY doc_id),
        |fin AS (
        |  SELECT hs.doc_id, hs.host, hs.l, hs.n,
        |    CASE WHEN w.exck IS NOT NULL THEN w.exck - 1
        |         ELSE coalesce(w.pubk, 1) END AS ps
        |  FROM hs LEFT JOIN w USING (doc_id))
        |SELECT doc_id, host,
        |  CASE WHEN n > ps THEN array_to_string(l[n-ps:n], '.') ELSE '' END AS domain,
        |  ps::BIGINT AS ps_labels
        |FROM fin""".stripMargin,

    "t_nb_stateless" ->
      s"""WITH $nbScoreSql
        |SELECT d.doc_id, coalesce(a.n_feats, 0)::BIGINT AS n_feats,
        |  (coalesce(a.w_sum_micro, 0) + p.prior_micro)::BIGINT AS score_micro,
        |  round(a.w_sum_micro::DOUBLE / a.n_feats / 1e6, 6) AS w_per_feat,
        |  (coalesce(a.w_sum_micro, 0) + p.prior_micro) > 0 AS pred_positive
        |FROM documents d LEFT JOIN nbagg a USING (doc_id) CROSS JOIN nbprior p
        |WHERE d.doc_id % 4 = 0""".stripMargin,

    "d_cdc_chunks" ->
      """WITH RECURSIVE cdocs AS (
        |  SELECT doc_id, substr(text, 1, 600) AS txt FROM documents
        |  WHERE doc_id % 3 = 0 AND text IS NOT NULL
        |    AND length(substr(text, 1, 600)) > 0),
        |cst AS (
        |  SELECT doc_id, length(txt)::BIGINT AS n, 0::BIGINT AS i,
        |    0::BIGINT AS h, 0::BIGINT AS last, []::BIGINT[] AS ends
        |  FROM cdocs
        |  UNION ALL
        |  SELECT c.doc_id, c.n, c.i + 1, u.nh,
        |    CASE WHEN u.b THEN c.i + 1 ELSE c.last END,
        |    CASE WHEN u.b THEN c.ends || [c.i + 1] ELSE c.ends END
        |  FROM cst c JOIN cdocs d USING (doc_id),
        |  unnest([{'nh': (c.h * 2 + (ord(substr(d.txt, (c.i + 1)::INT, 1))
        |      * 2654435761) % 4294967296) % 4294967296}]) AS s1(t),
        |  unnest([{'nh': t.nh,
        |           'b': (c.i + 1 - c.last) >= 32 AND
        |             (t.nh % 64 = 0 OR (c.i + 1 - c.last) >= 192)}]) AS s2(u)
        |  WHERE c.i < c.n),
        |cfin AS (
        |  SELECT s.doc_id, d.txt,
        |    CASE WHEN s.last < s.n THEN s.ends || [s.n] ELSE s.ends END AS ends
        |  FROM cst s JOIN cdocs d USING (doc_id) WHERE s.i = s.n),
        |cexp AS (
        |  SELECT doc_id, txt, ends,
        |    generate_subscripts(ends, 1) AS g, unnest(ends) AS e
        |  FROM cfin)
        |SELECT doc_id AS id, (g - 1)::BIGINT AS chunk_idx,
        |  (CASE WHEN g = 1 THEN 0 ELSE ends[g - 1] END)::BIGINT AS start_pos,
        |  (e - CASE WHEN g = 1 THEN 0 ELSE ends[g - 1] END)::BIGINT AS chunk_len,
        |  md5(substr(txt,
        |    (CASE WHEN g = 1 THEN 0 ELSE ends[g - 1] END + 1)::INT,
        |    (e - CASE WHEN g = 1 THEN 0 ELSE ends[g - 1] END)::INT)) AS chunk_md5
        |FROM cexp""".stripMargin,

    "d_exact_groups" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents),
        |fp AS (
        |  SELECT doc_id,
        |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp
        |  FROM all_docs)
        |SELECT doc_id, fp,
        |  count(*) OVER (PARTITION BY fp) AS group_size,
        |  min(doc_id) OVER (PARTITION BY fp) AS canonical_id
        |FROM fp QUALIFY group_size > 1""".stripMargin,

    "d_exact_dedup" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text, lang, source FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text, lang, source FROM documents)
        |SELECT doc_id, lang, source FROM (
        |  SELECT doc_id, lang, source,
        |    row_number() OVER (
        |      PARTITION BY md5(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')))
        |      ORDER BY doc_id) AS rn
        |  FROM all_docs) WHERE rn = 1""".stripMargin,

    "d_dedup_clusters_closed" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents),
        |fp AS (
        |  SELECT doc_id,
        |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp
        |  FROM all_docs)
        |SELECT doc_id,
        |  min(doc_id) OVER (PARTITION BY fp) AS cluster_id,
        |  doc_id = min(doc_id) OVER (PARTITION BY fp) AS is_survivor
        |FROM fp""".stripMargin,

    // restrict to nodes that actually appear in the edge list: a decade
    // root (doc_id % 10 = 0) is an edge endpoint only when doc_id + 1
    // exists — without the guard, a dataset whose max id ≡ 0 (mod 10)
    // would put that node in the oracle but in no edge, failing spuriously
    "g_connected_components" ->
      """SELECT doc_id AS node, doc_id - doc_id % 10 AS component
        |FROM documents
        |WHERE doc_id % 10 <> 0
        |   OR doc_id + 1 IN (SELECT doc_id FROM documents)""".stripMargin,

    // closed-form: bridges merge decade pairs into 20-blocks wherever
    // the second decade exists (doc_ids are dense from 0, so a block
    // root always exists below any second-decade member — component =
    // doc_id - doc_id % 20 for every edge-participating node either
    // way); new nodes (doc_id + 1e6, doc_id % 100 = 0) label at their
    // anchor, which IS its block minimum
    "g_cc_incremental" ->
      """SELECT doc_id AS node, (doc_id - doc_id % 20)::BIGINT AS component
        |FROM documents
        |WHERE doc_id % 10 <> 0
        |   OR doc_id + 1 IN (SELECT doc_id FROM documents)
        |   OR (doc_id % 20 = 0 AND doc_id + 10 IN (SELECT doc_id FROM documents))
        |   OR doc_id % 100 = 0
        |UNION ALL
        |SELECT doc_id + 1000000 AS node, doc_id::BIGINT AS component
        |FROM documents WHERE doc_id % 100 = 0""".stripMargin,

    // every doc sits on its decade's directed cycle, so the node set is
    // all docs and the SCC is exactly the decade — one-way bridges
    // between decades must not appear in the result
    "g_scc" ->
      """SELECT doc_id AS node, (doc_id - doc_id % 10)::BIGINT AS component
        |FROM documents""".stripMargin,

    // closed-form: a reverse bridge exists for block roots ≡0 (mod 40)
    // whose second decade exists (dense ids → guaranteed below any
    // second-decade member), closing the forward-bridge cycle → the
    // block's two rings merge at the block minimum; every other node
    // keeps its decade; the %100 attach edges are one-way, so the new
    // source nodes are singletons
    "g_scc_incremental" ->
      """SELECT doc_id AS node,
        |  CASE WHEN doc_id % 40 >= 10 AND doc_id % 40 <= 19
        |       THEN (doc_id - doc_id % 40)::BIGINT
        |       ELSE (doc_id - doc_id % 10)::BIGINT END AS component
        |FROM documents
        |UNION ALL
        |SELECT doc_id + 1000000 AS node, (doc_id + 1000000)::BIGINT AS component
        |FROM documents WHERE doc_id % 100 = 0""".stripMargin,

    "g_bfs" ->
      """WITH RECURSIVE beds AS (
        |  SELECT d.doc_id AS src, d.doc_id + 1 AS dst FROM documents d
        |    JOIN documents n ON n.doc_id = d.doc_id + 1
        |  UNION ALL
        |  SELECT d.doc_id AS src, d.doc_id * 2 AS dst FROM documents d
        |    JOIN documents n ON n.doc_id = d.doc_id * 2),
        |bfsw AS (
        |  SELECT doc_id::BIGINT AS node, 0::BIGINT AS dist
        |  FROM documents WHERE doc_id % 1000 = 0
        |  UNION
        |  SELECT e.dst::BIGINT AS node, b.dist + 1 AS dist
        |  FROM bfsw b JOIN beds e ON e.src = b.node
        |  WHERE b.dist < 12)
        |SELECT node, min(dist)::BIGINT AS dist FROM bfsw GROUP BY node""".stripMargin,

    "p_pack_greedy" ->
      """WITH RECURSIVE t AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(text) = '' THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n,
        |    row_number() OVER (ORDER BY doc_id) AS rn
        |  FROM documents),
        |g AS (
        |  SELECT rn, doc_id, n, 0::BIGINT AS pack_id, n AS used
        |  FROM t WHERE rn = 1
        |  UNION ALL
        |  SELECT d.rn, d.doc_id, d.n,
        |    CASE WHEN g.used + d.n > 256 THEN g.pack_id + 1 ELSE g.pack_id END,
        |    CASE WHEN g.used + d.n > 256 THEN d.n ELSE g.used + d.n END
        |  FROM t d JOIN g ON d.rn = g.rn + 1)
        |SELECT doc_id, n::BIGINT AS n_tokens, pack_id FROM g""".stripMargin,

    // The composed-pipeline replay: every stage of pipe_full chained as
    // CTEs — corpus build, markup strip, Gopher quality (3-valued WHERE,
    // matching QualityFilter.apply's null semantics), ' table '
    // boilerplate census, NB filter (training censuses over the raw
    // table via nbScoreSql, scoring over the cleaned text), exact-dedup
    // min-id survivors, portable MinHash LSH + jaccard edges + recursive
    // min-label connected components, k=8 span removal, 3-shingle
    // containment decontamination vs the 12-token-prefix benchmarks, and
    // 64/16 chunking. Stage counts ride as scalar subqueries.
    "pipe_full" ->
      s"""WITH RECURSIVE pcorp AS MATERIALIZED (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents
        |  UNION ALL SELECT doc_id + 2000000, coalesce(text, '') || ' zzqx' FROM documents
        |  UNION ALL SELECT doc_id + 3000000,
        |    array_to_string(ktoks[1:24], ' ') || ' uniqmark' || doc_id::VARCHAR
        |  FROM (SELECT doc_id,
        |          CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13)) = '' THEN []::VARCHAR[]
        |               ELSE regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13)), '\\s+') END AS ktoks
        |        FROM documents WHERE doc_id % 10 = 3)
        |  WHERE len(ktoks) >= 30),
        |${cleanHeadSql("pcorp")},
        |pfp AS (
        |  SELECT doc_id, text,
        |    row_number() OVER (
        |      PARTITION BY md5(trim(regexp_replace(regexp_replace(lower(text), '[^\\p{L}\\p{N}\\s]', ' ', 'g'), '\\s+', ' ', 'g')))
        |      ORDER BY doc_id) AS rn
        |  FROM pclean),
        |pex AS MATERIALIZED (SELECT doc_id, text FROM pfp WHERE rn = 1),
        |${portableLshSql("pex", "nd_")},
        |nd_edge AS MATERIALIZED (
        |  SELECT c.doc_a, c.doc_b
        |  FROM nd_cand c LEFT JOIN nd_ix i USING (doc_a, doc_b)
        |  JOIN nd_sizes sa ON sa.doc_id = c.doc_a
        |  JOIN nd_sizes sb ON sb.doc_id = c.doc_b
        |  WHERE round(coalesce(i.inter, 0)::DOUBLE / (sa.n + sb.n - coalesce(i.inter, 0)), 6) >= 0.8),
        |nd_und AS MATERIALIZED (
        |  SELECT doc_a AS a, doc_b AS b FROM nd_edge
        |  UNION SELECT doc_b, doc_a FROM nd_edge),
        |nd_reach(node, lbl) AS (
        |  SELECT a, a FROM nd_und UNION SELECT a, b FROM nd_und
        |  UNION
        |  SELECT r.node, e.b FROM nd_reach r JOIN nd_und e ON e.a = r.lbl),
        |nd_comp AS (SELECT node, min(lbl) AS comp FROM nd_reach GROUP BY 1),
        |pdedup AS MATERIALIZED (
        |  SELECT x.doc_id, x.text FROM pex x LEFT JOIN nd_comp c ON c.node = x.doc_id
        |  WHERE c.node IS NULL OR c.comp = x.doc_id),
        |sp_arrs AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13)) = '' THEN []::VARCHAR[]
        |         ELSE regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13)), '\\s+') END AS arr
        |  FROM pdedup),
        |sp_wins AS (
        |  SELECT doc_id, u.wpos, u.dig FROM (
        |    SELECT doc_id,
        |      unnest([{'wpos': i, 'dig': md5(array_to_string(arr[i+1:i+8], ' '))}
        |              FOR i IN range(0, len(arr) - 7)]) AS u
        |    FROM sp_arrs WHERE len(arr) >= 8)),
        |sp_rep AS (SELECT dig FROM sp_wins GROUP BY dig HAVING count(*) > 1),
        |sp_cov AS MATERIALIZED (
        |  SELECT DISTINCT w.doc_id, t.pos
        |  FROM sp_wins w JOIN sp_rep USING (dig),
        |       unnest(range(w.wpos, w.wpos + 8)) AS t(pos)),
        |sp_toks AS (
        |  SELECT doc_id, u.pos, u.tok FROM (
        |    SELECT doc_id,
        |      unnest([{'pos': i, 'tok': arr[i+1]} FOR i IN range(len(arr))]) AS u
        |    FROM sp_arrs)),
        |sp_reb AS (
        |  SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.pos) AS text
        |  FROM sp_toks t
        |  LEFT JOIN sp_cov c ON c.doc_id = t.doc_id AND c.pos = t.pos
        |  WHERE c.doc_id IS NULL
        |  GROUP BY t.doc_id),
        |pspan AS MATERIALIZED (
        |  SELECT a.doc_id, coalesce(r.text, '') AS text
        |  FROM sp_arrs a LEFT JOIN sp_reb r USING (doc_id)
        |  WHERE length(coalesce(r.text, '')) > 0),
        |dc_trn AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\\p{L}\\p{N}\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS norm
        |  FROM pspan),
        |dc_tr AS MATERIALIZED (
        |  SELECT doc_id AS train_id, unnest(sh) AS g FROM (
        |    SELECT doc_id,
        |      list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |           ELSE [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]
        |      END) AS sh
        |    FROM (SELECT doc_id, CASE WHEN norm = '' THEN []::VARCHAR[]
        |               ELSE regexp_split_to_array(norm, '\\s+') END AS toks
        |          FROM dc_trn))),
        |dc_ttok AS (SELECT doc_id, toks[1:12] AS toks FROM toks WHERE doc_id % 10 = 0),
        |dc_tsh AS (
        |  SELECT test_id, unnest(sh) AS g FROM (
        |    SELECT doc_id AS test_id,
        |      list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |           ELSE [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]
        |      END) AS sh
        |    FROM dc_ttok)),
        |dc_size AS (SELECT test_id, count(*) AS n FROM dc_tsh GROUP BY 1),
        |dc_m AS (
        |  SELECT test_id, train_id, count(*) AS mc
        |  FROM dc_tsh JOIN dc_tr USING (g) GROUP BY 1, 2),
        |dc_bad AS MATERIALIZED (
        |  SELECT DISTINCT train_id FROM dc_m JOIN dc_size USING (test_id)
        |  WHERE round(mc::DOUBLE / n, 6) >= 0.99),
        |pdecon AS MATERIALIZED (
        |  SELECT doc_id, text FROM pspan
        |  WHERE doc_id NOT IN (SELECT train_id FROM dc_bad)),
        |pbud AS MATERIALIZED (
        |  SELECT doc_id, text FROM (
        |    SELECT b.doc_id, b.text, b.ntk,
        |      sum(b.ntk) OVER (PARTITION BY b.grp
        |        ORDER BY md5('budget:7:' || b.doc_id::VARCHAR) ASC, b.doc_id ASC
        |        ROWS UNBOUNDED PRECEDING) AS cum
        |    FROM (
        |      SELECT p.doc_id, p.text, coalesce(d.lang, '') AS grp,
        |        (CASE WHEN trim(p.text, ' ' || chr(9) || chr(10) || chr(13)) = '' THEN 0
        |              ELSE len(regexp_split_to_array(trim(p.text, ' ' || chr(9) || chr(10) || chr(13)), '\\s+')) END)::BIGINT AS ntk
        |      FROM pdecon p LEFT JOIN documents d USING (doc_id)) b)
        |  WHERE cum - ntk < 3000),
        |ck_arrs AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13)) = '' THEN []::VARCHAR[]
        |         ELSE regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13)), '\\s+') END AS arr
        |  FROM pbud),
        |ck_starts AS (
        |  SELECT doc_id, len(arr) AS n, t.s
        |  FROM (SELECT doc_id, arr FROM ck_arrs WHERE len(arr) >= 1) a,
        |       unnest(range(0,
        |         greatest(CAST(ceil((len(arr) - 64)::DOUBLE / 48) AS INT), 0) * 48 + 1,
        |         48)) AS t(s))
        |SELECT doc_id, count(*) AS n_chunks,
        |  CAST(sum(least(n - s, 64)) AS BIGINT) AS n_chunk_tokens,
        |  (SELECT count(*) FROM pclean) AS n_cleaned,
        |  (SELECT count(*) FROM pex) AS n_exact,
        |  (SELECT count(*) FROM pdedup) AS n_deduped,
        |  (SELECT count(*) FROM pspan) AS n_despan,
        |  (SELECT count(*) FROM pdecon) AS n_decontaminated,
        |  (SELECT count(*) FROM pbud) AS n_budgeted
        |FROM ck_starts GROUP BY doc_id""".stripMargin,

    // The daily-loop replay (round-7 verdict #3): increment build, the
    // shared cleaning head, corpus-fingerprint anti-join, in-batch exact
    // dedup, cross-corpus MinHash near-dup (batch bands × corpus bands),
    // then in-batch LSH + recursive min-label connected components —
    // every stage the pipe_full machinery replays, recomposed for the
    // increment-vs-index shape. spanK/chunking/benchmarks are off in
    // this gate, so the output is the deduped doc grain.
    "pipe_increment" ->
      s"""WITH RECURSIVE ikt AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13)) = '' THEN []::VARCHAR[]
        |         ELSE regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13)), '\\s+') END AS ktoks
        |  FROM documents WHERE doc_id % 3 = 2),
        |inovel AS (SELECT doc_id, array_to_string(list_reverse(ktoks), ' ') AS text FROM ikt),
        |pcorp AS MATERIALIZED (
        |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL SELECT doc_id + 2000000, coalesce(text, '') || ' zzqx'
        |    FROM documents WHERE doc_id % 3 = 1
        |  UNION ALL SELECT doc_id + 3000000, text FROM inovel
        |  UNION ALL SELECT doc_id + 4000000, text FROM inovel),
        |${cleanHeadSql("pcorp")},
        |cfps AS MATERIALIZED (
        |  SELECT DISTINCT md5(trim(regexp_replace(regexp_replace(lower(text), '[^\\p{L}\\p{N}\\s]', ' ', 'g'), '\\s+', ' ', 'g'))) AS fp
        |  FROM documents WHERE text IS NOT NULL),
        |pfr AS (
        |  SELECT doc_id, text,
        |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^\\p{L}\\p{N}\\s]', ' ', 'g'), '\\s+', ' ', 'g'))) AS fp
        |  FROM pclean),
        |pfresh AS MATERIALIZED (
        |  SELECT doc_id, text, fp FROM pfr p
        |  WHERE NOT EXISTS (SELECT 1 FROM cfps c WHERE c.fp = p.fp)),
        |pexr AS (
        |  SELECT doc_id, text, fp,
        |    row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        |  FROM pfresh),
        |pex AS MATERIALIZED (SELECT doc_id, text, fp FROM pexr WHERE rn = 1),
        |${portableSigSql("pex", "bi_")},
        |${portableSigSql("documents", "ci_")},
        |xcand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bi_bands a JOIN ci_bands b ON a.band = b.band AND a.band_hash = b.band_hash),
        |xix AS (
        |  SELECT c.doc_a, c.doc_b, count(*) AS inter
        |  FROM xcand c JOIN bi_shr x ON x.doc_id = c.doc_a
        |  JOIN ci_shr y ON y.doc_id = c.doc_b AND y.g = x.g
        |  GROUP BY 1, 2),
        |xnear AS MATERIALIZED (
        |  SELECT DISTINCT c.doc_a
        |  FROM xcand c LEFT JOIN xix i USING (doc_a, doc_b)
        |  JOIN bi_sizes sa ON sa.doc_id = c.doc_a
        |  JOIN ci_sizes sb ON sb.doc_id = c.doc_b
        |  WHERE round(coalesce(i.inter, 0)::DOUBLE / (sa.n + sb.n - coalesce(i.inter, 0)), 6) >= 0.8),
        |pfn AS MATERIALIZED (
        |  SELECT p.doc_id, p.text, p.fp FROM pex p
        |  WHERE NOT EXISTS (SELECT 1 FROM xnear n WHERE n.doc_a = p.doc_id)),
        |ncand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bi_bands a JOIN bi_bands b ON a.band = b.band AND a.band_hash = b.band_hash
        |  WHERE a.doc_id < b.doc_id
        |    AND a.doc_id IN (SELECT doc_id FROM pfn)
        |    AND b.doc_id IN (SELECT doc_id FROM pfn)),
        |nix AS (
        |  SELECT c.doc_a, c.doc_b, count(*) AS inter
        |  FROM ncand c JOIN bi_shr x ON x.doc_id = c.doc_a
        |  JOIN bi_shr y ON y.doc_id = c.doc_b AND y.g = x.g
        |  GROUP BY 1, 2),
        |nedge AS MATERIALIZED (
        |  SELECT c.doc_a, c.doc_b
        |  FROM ncand c LEFT JOIN nix i USING (doc_a, doc_b)
        |  JOIN bi_sizes sa ON sa.doc_id = c.doc_a
        |  JOIN bi_sizes sb ON sb.doc_id = c.doc_b
        |  WHERE round(coalesce(i.inter, 0)::DOUBLE / (sa.n + sb.n - coalesce(i.inter, 0)), 6) >= 0.8),
        |nund AS (SELECT doc_a AS a, doc_b AS b FROM nedge
        |  UNION SELECT doc_b, doc_a FROM nedge),
        |nreach(node, lbl) AS (
        |  SELECT a, a FROM nund UNION SELECT a, b FROM nund
        |  UNION
        |  SELECT r.node, e.b FROM nreach r JOIN nund e ON e.a = r.lbl),
        |ncomp AS (SELECT node, min(lbl) AS comp FROM nreach GROUP BY 1)
        |SELECT p.doc_id, p.fp FROM pfn p LEFT JOIN ncomp c ON c.node = p.doc_id
        |WHERE c.node IS NULL OR c.comp = p.doc_id""".stripMargin,

    "d_decontaminate" ->
      """WITH norm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id,
        |    CASE WHEN norm = '' THEN []::VARCHAR[]
        |         ELSE regexp_split_to_array(norm, '\s+') END AS toks
        |  FROM norm),
        |sh_of AS (
        |  SELECT doc_id, toks,
        |    list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]
        |    END) AS sh
        |  FROM tok),
        |train_sh AS (SELECT doc_id AS train_id, unnest(sh) AS g FROM sh_of),
        |test_tok AS (SELECT doc_id, toks[1:12] AS toks FROM tok WHERE doc_id % 10 = 0),
        |test_sh_of AS (
        |  SELECT doc_id AS test_id,
        |    list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]
        |    END) AS sh
        |  FROM test_tok),
        |test_sh AS (SELECT test_id, unnest(sh) AS g FROM test_sh_of),
        |sizes AS (SELECT test_id, count(*) AS n FROM test_sh GROUP BY 1),
        |m AS (
        |  SELECT test_id, train_id, count(*) AS mc
        |  FROM test_sh JOIN train_sh USING (g) GROUP BY 1, 2),
        |scored AS (
        |  SELECT test_id, train_id, round(mc::DOUBLE / n, 6) AS containment
        |  FROM m JOIN sizes USING (test_id)
        |  WHERE round(mc::DOUBLE / n, 6) >= 0.99),
        |ranked AS (
        |  SELECT test_id, train_id, containment,
        |    row_number() OVER (PARTITION BY test_id
        |                       ORDER BY containment DESC, train_id ASC) AS rk,
        |    count(*) OVER (PARTITION BY test_id) AS n_cont,
        |    max(containment) OVER (PARTITION BY test_id) AS maxc
        |  FROM scored)
        |SELECT test_id, train_id AS best_train_id,
        |       round(maxc, 6) AS max_containment, n_cont AS n_contaminating
        |FROM ranked WHERE rk = 1""".stripMargin,

    // capped variant: the train-shingle census (HAVING count(*) <= 3)
    // reproduces maxDf exactly — train-side rows drop BEFORE the join
    "d_decontaminate_capped" ->
      """WITH norm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id,
        |    CASE WHEN norm = '' THEN []::VARCHAR[]
        |         ELSE regexp_split_to_array(norm, '\s+') END AS toks
        |  FROM norm),
        |sh_of AS (
        |  SELECT doc_id, toks,
        |    list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]
        |    END) AS sh
        |  FROM tok),
        |train_all AS (SELECT doc_id AS train_id, unnest(sh) AS g FROM sh_of),
        |train_sh AS (
        |  SELECT train_id, g FROM train_all
        |  WHERE g IN (SELECT g FROM train_all GROUP BY g HAVING count(*) <= 3)),
        |test_tok AS (SELECT doc_id, toks[1:12] AS toks FROM tok WHERE doc_id % 10 = 0),
        |test_sh_of AS (
        |  SELECT doc_id AS test_id,
        |    list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]
        |    END) AS sh
        |  FROM test_tok),
        |test_sh AS (SELECT test_id, unnest(sh) AS g FROM test_sh_of),
        |sizes AS (SELECT test_id, count(*) AS n FROM test_sh GROUP BY 1),
        |m AS (
        |  SELECT test_id, train_id, count(*) AS mc
        |  FROM test_sh JOIN train_sh USING (g) GROUP BY 1, 2),
        |scored AS (
        |  SELECT test_id, train_id, round(mc::DOUBLE / n, 6) AS containment
        |  FROM m JOIN sizes USING (test_id)
        |  WHERE round(mc::DOUBLE / n, 6) >= 0.5),
        |ranked AS (
        |  SELECT test_id, train_id, containment,
        |    row_number() OVER (PARTITION BY test_id
        |                       ORDER BY containment DESC, train_id ASC) AS rk,
        |    count(*) OVER (PARTITION BY test_id) AS n_cont,
        |    max(containment) OVER (PARTITION BY test_id) AS maxc
        |  FROM scored)
        |SELECT test_id, train_id AS best_train_id,
        |       round(maxc, 6) AS max_containment, n_cont AS n_contaminating
        |FROM ranked WHERE rk = 1""".stripMargin,

    "d_incremental_exact" ->
      """WITH corpus_fp AS (
        |  SELECT DISTINCT md5(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp
        |  FROM documents),
        |batch AS (
        |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id, text || ' xnovel' AS text FROM documents WHERE doc_id % 3 = 1)
        |SELECT doc_id FROM batch
        |WHERE md5(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')))
        |      NOT IN (SELECT fp FROM corpus_fp)""".stripMargin,

    "d_incremental_neardup" ->
      """WITH fp AS (
        |  SELECT doc_id,
        |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp
        |  FROM documents),
        |sizes AS (
        |  SELECT doc_id, len(list_distinct(sh)) AS n
        |  FROM (
        |    SELECT doc_id,
        |      CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |           ELSE [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]
        |      END AS sh
        |    FROM (
        |      SELECT doc_id,
        |        CASE WHEN trim(norm) = '' THEN []::VARCHAR[]
        |             ELSE regexp_split_to_array(trim(norm), '\s+') END AS toks
        |      FROM (SELECT doc_id,
        |        trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
        |        FROM documents))))
        |SELECT b.doc_id + 1000000 AS doc_a, c.doc_id AS doc_b,
        |  s.n AS inter, s.n AS uni, 1.0::DOUBLE AS jaccard
        |FROM fp b JOIN fp c ON b.fp = c.fp
        |JOIN sizes s ON s.doc_id = b.doc_id
        |WHERE b.doc_id % 3 = 0""".stripMargin,

    // identical expectation to d_incremental_neardup: the appended index
    // must behave exactly as one built over the full corpus
    "d_incremental_neardup_appended" ->
      """WITH fp AS (
        |  SELECT doc_id,
        |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp
        |  FROM documents),
        |sizes AS (
        |  SELECT doc_id, len(list_distinct(sh)) AS n
        |  FROM (
        |    SELECT doc_id,
        |      CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |           ELSE [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]
        |      END AS sh
        |    FROM (
        |      SELECT doc_id,
        |        CASE WHEN trim(norm) = '' THEN []::VARCHAR[]
        |             ELSE regexp_split_to_array(trim(norm), '\s+') END AS toks
        |      FROM (SELECT doc_id,
        |        trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
        |        FROM documents))))
        |SELECT b.doc_id + 1000000 AS doc_a, c.doc_id AS doc_b,
        |  s.n AS inter, s.n AS uni, 1.0::DOUBLE AS jaccard
        |FROM fp b JOIN fp c ON b.fp = c.fp
        |JOIN sizes s ON s.doc_id = b.doc_id
        |WHERE b.doc_id % 3 = 0""".stripMargin,

    // full LSH replay under the portable scheme: ONE md5 per shingle, the
    // 32-member affine family (a_i·x + b_i mod 2³¹−1, coefficients
    // interpolated below) over the 60-bit md5 prefix, 8×4 bands, banded
    // candidate self-join, exact-Jaccard verification — the NAIVE all-docs
    // construction, which the operator's rep-collapse path must equal
    "d_minhash_neardup" ->
      s"""WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents),
        |${portableLshSql("all_docs")},
        |scored AS (
        |  SELECT c.doc_a, c.doc_b, coalesce(i.inter, 0) AS inter,
        |         sa.n + sb.n - coalesce(i.inter, 0) AS uni,
        |         round(coalesce(i.inter, 0)::DOUBLE / (sa.n + sb.n - coalesce(i.inter, 0)), 6) AS jaccard
        |  FROM cand c LEFT JOIN ix i USING (doc_a, doc_b)
        |  JOIN sizes sa ON sa.doc_id = c.doc_a
        |  JOIN sizes sb ON sb.doc_id = c.doc_b)
        |SELECT doc_a, doc_b, inter::BIGINT AS inter, uni::BIGINT AS uni, jaccard
        |FROM scored WHERE jaccard >= 0.8""".stripMargin,

    // candidate stage only (no verification): banded pairs between the
    // batch (ids ≥ 1e6) and the corpus — the shared portable chain's
    // cand CTE filtered to cross pairs (batch ids are always doc_b
    // because cand orients doc_a < doc_b and batch ids are shifted high)
    "st_neardup_candidates" ->
      s"""WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 3 = 0),
        |${portableLshSql("all_docs")}
        |SELECT c.doc_b AS doc_id, c.doc_a AS corpus_id
        |FROM cand c WHERE c.doc_b >= 1000000 AND c.doc_a < 1000000""".stripMargin,

    // cluster-mode edge list: exact edges (member → min-id rep per md5
    // fingerprint) + the d_minhash_neardup LSH chain run over the REPS
    // only — the rep-collapse is exactly what makes the operator linear
    // on duplicate-heavy corpora, and the oracle replays both halves
    "d_neardup_clusters" ->
      s"""WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 1000000, text FROM documents),
        |fpm AS (
        |  SELECT doc_id, text,
        |    md5(trim(regexp_replace(regexp_replace(lower(text), '[^\\p{L}\\p{N}\\s]', ' ', 'g'), '\\s+', ' ', 'g'))) AS fp
        |  FROM all_docs),
        |mm AS (
        |  SELECT doc_id, text, fp,
        |    min(doc_id) OVER (PARTITION BY fp) AS rep_id
        |  FROM fpm),
        |reps AS (SELECT doc_id, text FROM mm WHERE doc_id = rep_id),
        |${portableLshSql("reps")},
        |near_edges AS (
        |  SELECT c.doc_a, c.doc_b,
        |         round(coalesce(i.inter, 0)::DOUBLE / (sa.n + sb.n - coalesce(i.inter, 0)), 6) AS jaccard
        |  FROM cand c LEFT JOIN ix i USING (doc_a, doc_b)
        |  JOIN sizes sa ON sa.doc_id = c.doc_a
        |  JOIN sizes sb ON sb.doc_id = c.doc_b)
        |SELECT doc_id AS doc_a, rep_id AS doc_b, 1.0::DOUBLE AS jaccard, 'exact' AS kind
        |FROM mm WHERE doc_id <> rep_id
        |UNION ALL
        |SELECT doc_a, doc_b, jaccard, 'near' AS kind
        |FROM near_edges WHERE jaccard >= 0.8""".stripMargin,

    // portable simhash: every one of the 60 bit votes replayed in SQL
    "d_simhash" ->
      """WITH norm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, unnest(CASE WHEN norm = '' THEN []::VARCHAR[]
        |       ELSE regexp_split_to_array(norm, '\s+') END) AS t
        |  FROM norm),
        |h AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tok),
        |votes AS (
        |  SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM h CROSS JOIN range(60) r(b) GROUP BY 1, 2),
        |sh AS (
        |  SELECT doc_id, sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS simhash
        |  FROM votes GROUP BY 1)
        |SELECT d.doc_id, coalesce(sh.simhash, 0)::BIGINT AS simhash
        |FROM documents d LEFT JOIN sh USING (doc_id)""".stripMargin,

    // same fingerprint chain over the perturbed-copy corpus, then the
    // pigeonhole banding join and popcount verification in SQL
    "d_simhash_neardup" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, coalesce(text, '') || ' zzqx' FROM documents),
        |norm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
        |  FROM all_docs),
        |tok AS (
        |  SELECT doc_id, unnest(CASE WHEN norm = '' THEN []::VARCHAR[]
        |       ELSE regexp_split_to_array(norm, '\s+') END) AS t
        |  FROM norm),
        |h AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tok),
        |votes AS (
        |  SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM h CROSS JOIN range(60) r(b) GROUP BY 1, 2),
        |sh0 AS (
        |  SELECT doc_id, sum(CASE WHEN v > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS simhash
        |  FROM votes GROUP BY 1),
        |sh AS (
        |  SELECT d.doc_id, coalesce(sh0.simhash, 0)::BIGINT AS simhash
        |  FROM all_docs d LEFT JOIN sh0 USING (doc_id)),
        |banded AS (
        |  SELECT doc_id, simhash, r.b AS band,
        |    (simhash >> (r.b * 15)) & 32767 AS v
        |  FROM sh CROSS JOIN range(4) r(b)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    a.simhash AS sa, b.simhash AS sb
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.v = b.v AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b, bit_count(xor(sa, sb))::INT AS hamming
        |FROM cand WHERE bit_count(xor(sa, sb)) <= 3""".stripMargin,

    "d_ngram_jaccard_self" ->
      """SELECT doc_id AS doc_a, doc_id + 1000000 AS doc_b,
        |  n AS inter, n AS uni, 1.0::DOUBLE AS jaccard
        |FROM (
        |  SELECT doc_id,
        |    len(list_distinct(sh)) AS n
        |  FROM (
        |    SELECT doc_id,
        |      CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |           ELSE [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]
        |      END AS sh
        |    FROM (
        |      SELECT doc_id,
        |        CASE WHEN trim(norm) = '' THEN []::VARCHAR[]
        |             ELSE regexp_split_to_array(trim(norm), '\s+') END AS toks
        |      FROM (SELECT doc_id,
        |        trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
        |        FROM documents))))""".stripMargin,

    "t_distinctness" ->
      """WITH znorm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
        |  FROM documents),
        |ztok AS (
        |  SELECT doc_id, CASE WHEN norm = '' THEN []::VARCHAR[]
        |       ELSE regexp_split_to_array(norm, '\s+') END AS toks
        |  FROM znorm),
        |zsh AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]
        |    END)) AS g
        |  FROM ztok),
        |zdf AS (SELECT g, count(DISTINCT doc_id) AS df FROM zsh GROUP BY g)
        |SELECT s.doc_id, count(*)::BIGINT AS n_shingles,
        |  sum(CASE WHEN d.df > 1 THEN 1 ELSE 0 END)::BIGINT AS n_shared,
        |  round(sum(CASE WHEN d.df > 1 THEN 1 ELSE 0 END)::DOUBLE
        |    / count(*), 6) AS shared_frac
        |FROM zsh s JOIN zdf d USING (g)
        |GROUP BY s.doc_id""".stripMargin,

    "d_threshold_sweep" ->
      """WITH tnorm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
        |  FROM documents),
        |ttok AS (
        |  SELECT doc_id, CASE WHEN norm = '' THEN []::VARCHAR[]
        |       ELSE regexp_split_to_array(norm, '\s+') END AS toks
        |  FROM tnorm),
        |tsh AS (
        |  SELECT doc_id, list_distinct(
        |    CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]
        |    END) AS sh
        |  FROM ttok),
        |tp AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    len(list_intersect(a.sh, b.sh))::BIGINT AS inter,
        |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))::BIGINT AS uni
        |  FROM tsh a JOIN tsh b ON b.doc_id = a.doc_id + 1),
        |tj AS (
        |  SELECT doc_a, doc_b,
        |    CAST(round(round(inter::DOUBLE / uni, 6) * 1e6) AS BIGINT) AS jac_micro
        |  FROM tp WHERE uni > 0),
        |tgrid AS (SELECT unnest([30, 40, 50, 60, 70, 80, 90]) AS t_pct),
        |ttag AS (
        |  SELECT t_pct, doc_a, doc_b FROM tj CROSS JOIN tgrid
        |  WHERE jac_micro >= t_pct * 10000),
        |tagg AS (
        |  SELECT t_pct, count(*)::BIGINT AS n_pairs,
        |    count(DISTINCT greatest(doc_a, doc_b))::BIGINT AS n_removed
        |  FROM ttag GROUP BY 1),
        |tdoc AS (
        |  SELECT t_pct, count(DISTINCT d)::BIGINT AS n_docs
        |  FROM (SELECT t_pct, unnest([doc_a, doc_b]) AS d FROM ttag)
        |  GROUP BY 1)
        |SELECT g.t_pct::BIGINT AS t_pct,
        |  coalesce(a.n_pairs, 0)::BIGINT AS n_pairs,
        |  coalesce(d.n_docs, 0)::BIGINT AS n_docs,
        |  coalesce(a.n_removed, 0)::BIGINT AS n_removed
        |FROM tgrid g LEFT JOIN tagg a USING (t_pct)
        |LEFT JOIN tdoc d USING (t_pct)""".stripMargin,

    // the rep-collapse + the full AllPairs chain on reps + group sizes
    "d_setsim_reps" ->
      """WITH docs0 AS (
        |  SELECT doc_id, text FROM (
        |    SELECT doc_id, text FROM documents
        |    UNION ALL SELECT doc_id + 1000000, text FROM documents)
        |  WHERE doc_id % 5 = 0),
        |norm0 AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS nt
        |  FROM docs0),
        |grp AS (
        |  SELECT md5(nt) AS fp, min(doc_id) AS rep, count(*)::BIGINT AS gsz
        |  FROM norm0 GROUP BY md5(nt)),
        |norm AS (
        |  SELECT g.rep AS doc_id, f.nt
        |  FROM grp g JOIN norm0 f ON f.doc_id = g.rep),
        |tok AS (
        |  SELECT DISTINCT doc_id, t AS tok FROM (
        |    SELECT doc_id, unnest(regexp_split_to_array(nt, '\s+')) AS t
        |    FROM norm WHERE nt <> '')),
        |dfc AS (SELECT tok, count(*) AS df FROM tok GROUP BY tok),
        |sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
        |ord AS (
        |  SELECT t.doc_id, t.tok, s.n,
        |    row_number() OVER (PARTITION BY t.doc_id ORDER BY d.df, t.tok) AS rn
        |  FROM tok t JOIN dfc d USING (tok) JOIN sz s USING (doc_id)),
        |pref AS (
        |  SELECT * FROM ord
        |  WHERE rn <= n - CAST(floor((n * 9 + 9) / 10) AS BIGINT) + 1),
        |cand AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS n_a, b.n AS n_b,
        |    max(1 + least(a.n - a.rn, b.n - b.rn)) AS ubound
        |  FROM pref a JOIN pref b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |    AND least(a.n, b.n) * 10 >= greatest(a.n, b.n) * 9
        |  GROUP BY 1, 2, 3, 4),
        |kept AS (
        |  SELECT * FROM cand
        |  WHERE ubound >= CAST(floor((greatest(n_a, n_b) * 9 + 9) / 10) AS BIGINT)),
        |ix AS (
        |  SELECT c.doc_a, c.doc_b, c.n_a, c.n_b, count(*) AS inter
        |  FROM kept c
        |  JOIN tok ta ON ta.doc_id = c.doc_a
        |  JOIN tok tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
        |  GROUP BY 1, 2, 3, 4)
        |SELECT doc_a, doc_b, inter, n_a + n_b - inter AS uni,
        |  round(inter / CAST(n_a + n_b - inter AS DOUBLE), 6) AS jaccard,
        |  ga.gsz AS size_a, gb.gsz AS size_b
        |FROM ix
        |JOIN grp ga ON ga.rep = doc_a
        |JOIN grp gb ON gb.rep = doc_b
        |WHERE inter * 10 >= (n_a + n_b - inter) * 9""".stripMargin,

    // full AllPairs/PPJoin replay: df census → rarest-first prefix rank →
    // length + positional filters (all integer-rational) → candidate-bounded
    // intersection count → integer threshold test
    "d_setsim_join" ->
      """WITH docs AS (
        |  SELECT doc_id, text FROM (
        |    SELECT doc_id, text FROM documents
        |    UNION ALL SELECT doc_id + 1000000, text FROM documents)
        |  WHERE doc_id % 5 = 0),
        |norm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS nt
        |  FROM docs),
        |tok AS (
        |  SELECT DISTINCT doc_id, t AS tok FROM (
        |    SELECT doc_id, unnest(regexp_split_to_array(nt, '\s+')) AS t
        |    FROM norm WHERE nt <> '')),
        |dfc AS (SELECT tok, count(*) AS df FROM tok GROUP BY tok),
        |sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
        |ord AS (
        |  SELECT t.doc_id, t.tok, s.n,
        |    row_number() OVER (PARTITION BY t.doc_id ORDER BY d.df, t.tok) AS rn
        |  FROM tok t JOIN dfc d USING (tok) JOIN sz s USING (doc_id)),
        |pref AS (
        |  SELECT * FROM ord
        |  WHERE rn <= n - CAST(floor((n * 9 + 9) / 10) AS BIGINT) + 1),
        |cand AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS n_a, b.n AS n_b,
        |    max(1 + least(a.n - a.rn, b.n - b.rn)) AS ubound
        |  FROM pref a JOIN pref b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |    AND least(a.n, b.n) * 10 >= greatest(a.n, b.n) * 9
        |  GROUP BY 1, 2, 3, 4),
        |kept AS (
        |  SELECT * FROM cand
        |  WHERE ubound >= CAST(floor((greatest(n_a, n_b) * 9 + 9) / 10) AS BIGINT)),
        |ix AS (
        |  SELECT c.doc_a, c.doc_b, c.n_a, c.n_b, count(*) AS inter
        |  FROM kept c
        |  JOIN tok ta ON ta.doc_id = c.doc_a
        |  JOIN tok tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
        |  GROUP BY 1, 2, 3, 4)
        |SELECT doc_a, doc_b, inter, n_a + n_b - inter AS uni,
        |  round(inter / CAST(n_a + n_b - inter AS DOUBLE), 6) AS jaccard
        |FROM ix WHERE inter * 10 >= (n_a + n_b - inter) * 9""".stripMargin,

    "e_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |    list_cosine_similarity(cv::DOUBLE[], qv::DOUBLE[]) AS cos
        |  FROM c CROSS JOIN q WHERE neighbor_id <> query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY round(cos, 6) DESC, neighbor_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, round(cos, 6) AS cosine, rank
        |FROM ranked WHERE rank <= 10""".stripMargin,

    "m_frame_sample" ->
      """SELECT doc_id AS media_id, 4::BIGINT AS n_frames,
        |  4 * (octet_length(encode(text)) // 8)::BIGINT AS total_bytes
        |FROM documents""".stripMargin,

    // replays the PPM generation→parse round trip: dimensions from the
    // text length, f0 = mean of raster bytes at indices ≡ 0 (mod 16),
    // normalized — cast through REAL to match the operator's float32
    // feature vector bit-for-bit before the 6dp round
    "s12_binaryfile" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    (length(coalesce(text, '')) % 61) + 4 AS w,
        |    (length(coalesce(text, '')) % 43) + 4 AS h
        |  FROM documents WHERE doc_id % 5 = 0)
        |SELECT media_id, w AS width, h AS height,
        |  round(CAST(CAST(
        |    list_avg([(media_id + i) % 256 FOR i IN range(0, w*h*3, 16)]) / 255.0
        |  AS REAL) AS DOUBLE), 6) AS f0
        |FROM m""".stripMargin,

    "m_decode_features" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    (length(coalesce(text, '')) % 61) + 4 AS w,
        |    (length(coalesce(text, '')) % 43) + 4 AS h
        |  FROM documents)
        |SELECT media_id, w AS width, h AS height,
        |  round(CAST(CAST(
        |    list_avg([(media_id + i) % 256 FOR i IN range(0, w*h*3, 16)]) / 255.0
        |  AS REAL) AS DOUBLE), 6) AS f0
        |FROM m""".stripMargin,

    // resized raster byte at flat output index i (out dims 8×6): source
    // pixel (sy, sx) = (y·h/6, x·w/8) with y = i//24, x = (i//3)%8,
    // channel c = i%3; source byte = (id + 3·(sy·w + sx) + c) mod 256
    "m_resize" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    (length(coalesce(text, '')) % 61) + 4 AS w,
        |    (length(coalesce(text, '')) % 43) + 4 AS h
        |  FROM documents)
        |SELECT media_id, 8 AS width, 6 AS height,
        |  round(CAST(CAST(
        |    list_avg([
        |      (media_id + 3*((((i//24)*h)//6)*w + (((i//3)%8)*w)//8) + (i%3)) % 256
        |      FOR i IN range(0, 144)]) / 255.0
        |  AS REAL) AS DOUBLE), 6) AS f0
        |FROM m""".stripMargin,

    // WAV round trip: rate/channels from the generation formulas, f0 from
    // the cycled PCM bytes at bucket-0 indices
    // samples replayed from the generation formula, framed by i // 16;
    // RMS over centered values, crossings via the consecutive-pair join
    "m_wav_features" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    (length(coalesce(text, '')) % 96) + 8 AS cnt
        |  FROM documents),
        |s AS (
        |  SELECT media_id, i, ((7 * media_id + i) % 256) - 128 AS c,
        |    (i // 16)::INT AS frame_idx
        |  FROM (SELECT media_id, unnest(range(0, cnt)) AS i FROM m)),
        |f AS (
        |  SELECT media_id, frame_idx, count(*)::INT AS n_samples,
        |    round(sqrt(sum(c * c)::DOUBLE / count(*)), 6) AS rms
        |  FROM s GROUP BY 1, 2),
        |z AS (
        |  SELECT a.media_id, a.frame_idx,
        |    sum(CASE WHEN (a.c < 0) <> (b.c < 0) THEN 1 ELSE 0 END)::BIGINT AS zc
        |  FROM s b JOIN s a ON a.media_id = b.media_id
        |    AND b.i = a.i + 1 AND b.frame_idx = a.frame_idx
        |  GROUP BY 1, 2)
        |SELECT f.media_id, f.frame_idx, f.n_samples, f.rms,
        |  coalesce(z.zc, 0) AS zero_crossings
        |FROM f LEFT JOIN z ON z.media_id = f.media_id
        |  AND z.frame_idx = f.frame_idx""".stripMargin,

    "m_decode_wav" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    (8000 + (doc_id % 8) * 1000)::INT AS rate,
        |    (1 + (doc_id % 2))::INT AS channels,
        |    (length(coalesce(text, '')) % 96) + 8 AS n
        |  FROM documents)
        |SELECT media_id, rate AS width, channels AS height,
        |  round(CAST(CAST(
        |    list_avg([(7 * media_id + i) % 256 FOR i IN range(0, n, 16)]) / 255.0
        |  AS REAL) AS DOUBLE), 6) AS f0
        |FROM m""".stripMargin,

    // average hash replay: grid cell p of an 8x8 grid samples source
    // pixel (sy, sx) = ((p//8)*h//8, (p%8)*w//8); the cell sum is the
    // three cycled raster bytes at 3*(sy*w+sx); bit p = 64*s_p >= total;
    // bit 63 packs as the two's-complement negative weight so the result
    // is a plain BIGINT in both engines (list_sum accumulates in
    // hugeint, the final value fits by construction)
    "m_phash" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id,
        |    (length(coalesce(text, '')) % 61) + 4 AS w,
        |    (length(coalesce(text, '')) % 43) + 4 AS h
        |  FROM documents),
        |s AS (
        |  SELECT media_id, w, h,
        |    [ ((media_id + 3*((((p//8)*h)//8)*w + (((p%8)*w)//8))) % 256)
        |    + ((media_id + 3*((((p//8)*h)//8)*w + (((p%8)*w)//8)) + 1) % 256)
        |    + ((media_id + 3*((((p//8)*h)//8)*w + (((p%8)*w)//8)) + 2) % 256)
        |      FOR p IN range(0, 64)] AS sums
        |  FROM m),
        |t AS (SELECT media_id, w, h, sums, list_sum(sums) AS total FROM s)
        |SELECT media_id, w AS width, h AS height,
        |  CAST(list_sum([CASE WHEN 64*sums[p+1] >= total
        |      THEN CASE WHEN p = 63 THEN -9223372036854775807 - 1
        |           ELSE (1::BIGINT << p) END
        |      ELSE 0 END FOR p IN range(0, 64)]) AS BIGINT) AS phash
        |FROM t""".stripMargin,

    // phash near-dup replay: both generators (copies invert raster bytes
    // 0..2, i.e. exactly the cell sampling source pixel 0), the full
    // hash chain, 4x16-bit banding — mask-after-shift extracts the same
    // bits whether the engine's >> is arithmetic or logical — candidate
    // self-join, popcount verify
    "m_audio_fp" ->
      """WITH m AS (
        |  SELECT doc_id AS media_id, (length(coalesce(text, '')) % 96) + 8 AS len
        |  FROM documents),
        |s AS (
        |  SELECT media_id, unnest(range(len)) AS i FROM m),
        |e AS (
        |  SELECT s.media_id, s.i // 16 AS f, s.i % 4 AS band,
        |    sum((((7 * s.media_id + s.i) % 256) - 128)
        |      * (((7 * s.media_id + s.i) % 256) - 128))::BIGINT AS en
        |  FROM s GROUP BY 1, 2, 3),
        |gf AS (
        |  SELECT media_id, unnest(range((len + 15) // 16)) AS f FROM m),
        |g AS (
        |  SELECT gf.media_id, gf.f, bb.band
        |  FROM gf CROSS JOIN range(4) bb(band)),
        |ed AS (
        |  SELECT g.media_id, g.f, g.band, coalesce(e.en, 0)::BIGINT AS en
        |  FROM g LEFT JOIN e ON e.media_id = g.media_id
        |    AND e.f = g.f AND e.band = g.band)
        |SELECT m.media_id, coalesce(bs.afp, 0)::BIGINT AS afp
        |FROM m LEFT JOIN (
        |  SELECT ea.media_id,
        |    sum(CASE WHEN ea.en > eb.en THEN 1::BIGINT << b.b ELSE 0 END)::BIGINT AS afp
        |  FROM range(48) b(b)
        |  JOIN ed ea ON ea.f = b.b // 4 AND ea.band = b.b % 4
        |  JOIN ed eb ON eb.media_id = ea.media_id AND eb.f = b.b // 4 + 1
        |    AND eb.band = b.b % 4
        |  GROUP BY 1) bs ON bs.media_id = m.media_id""".stripMargin,

    "m_audio_fp_neardup" ->
      """WITH m AS (
        |  SELECT doc_id, (length(coalesce(text, '')) % 96) + 8 AS len
        |  FROM documents WHERE doc_id % 5 = 0),
        |s AS (
        |  SELECT doc_id AS media_id, len, unnest(range(len)) AS i, 0 AS pert FROM m
        |  UNION ALL
        |  SELECT doc_id + 5000000, len, unnest(range(len)), 1 FROM m),
        |c AS (
        |  SELECT media_id, i,
        |    (CASE WHEN pert = 1 AND i = (media_id - 5000000) % len
        |          THEN ((7 * (media_id - 5000000) + i) + 16) % 256
        |          WHEN pert = 1
        |          THEN (7 * (media_id - 5000000) + i) % 256
        |          ELSE (7 * media_id + i) % 256 END) - 128 AS v
        |  FROM s),
        |e AS (
        |  SELECT media_id, i // 8 AS f, i % 4 AS band, sum(v * v)::BIGINT AS en
        |  FROM c GROUP BY 1, 2, 3),
        |mm AS (
        |  SELECT doc_id AS media_id, len FROM m
        |  UNION ALL SELECT doc_id + 5000000, len FROM m),
        |gf AS (
        |  SELECT media_id, unnest(range((len + 7) // 8)) AS f FROM mm),
        |g AS (
        |  SELECT gf.media_id, gf.f, bb.band
        |  FROM gf CROSS JOIN range(4) bb(band)),
        |ed AS (
        |  SELECT g.media_id, g.f, g.band, coalesce(e.en, 0)::BIGINT AS en
        |  FROM g LEFT JOIN e ON e.media_id = g.media_id
        |    AND e.f = g.f AND e.band = g.band),
        |fp AS (
        |  SELECT mm.media_id, coalesce(bs.afp, 0)::BIGINT AS afp
        |  FROM mm LEFT JOIN (
        |    SELECT ea.media_id,
        |      sum(CASE WHEN ea.en > eb.en THEN 1::BIGINT << b.b ELSE 0 END)::BIGINT AS afp
        |    FROM range(48) b(b)
        |    JOIN ed ea ON ea.f = b.b // 4 AND ea.band = b.b % 4
        |    JOIN ed eb ON eb.media_id = ea.media_id AND eb.f = b.b // 4 + 1
        |      AND eb.band = b.b % 4
        |    GROUP BY 1) bs ON bs.media_id = mm.media_id),
        |banded AS (
        |  SELECT media_id, afp, r.b AS band,
        |    (afp >> (r.b * 9)) &
        |      (CASE WHEN r.b = 4 THEN 4095 ELSE 511 END) AS v
        |  FROM fp CROSS JOIN range(5) r(b)),
        |cand AS (
        |  SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
        |    a.afp AS fa, b.afp AS fb
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.v = b.v AND a.media_id < b.media_id)
        |SELECT media_a, media_b, bit_count(xor(fa, fb))::INT AS hamming
        |FROM cand WHERE bit_count(xor(fa, fb)) <= 4""".stripMargin,

    "m_phash_neardup" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    (length(coalesce(text, '')) % 61) + 4 AS w,
        |    (length(coalesce(text, '')) % 43) + 4 AS h
        |  FROM documents),
        |base AS (
        |  SELECT doc_id, w, h, 0 AS pert, doc_id AS media_id FROM m
        |  UNION ALL
        |  SELECT doc_id, w, h, 1 AS pert, doc_id + 1000000 AS media_id FROM m),
        |s AS (
        |  SELECT media_id,
        |    [ CASE WHEN pert = 1 AND ((((p//8)*h)//8)*w + (((p%8)*w)//8)) = 0
        |        THEN (255 - (doc_id % 256)) + (255 - ((doc_id + 1) % 256))
        |           + (255 - ((doc_id + 2) % 256))
        |        ELSE ((doc_id + 3*((((p//8)*h)//8)*w + (((p%8)*w)//8))) % 256)
        |           + ((doc_id + 3*((((p//8)*h)//8)*w + (((p%8)*w)//8)) + 1) % 256)
        |           + ((doc_id + 3*((((p//8)*h)//8)*w + (((p%8)*w)//8)) + 2) % 256)
        |      END FOR p IN range(0, 64)] AS sums
        |  FROM base),
        |t AS (SELECT media_id, sums, list_sum(sums) AS total FROM s),
        |ph AS (
        |  SELECT media_id,
        |    CAST(list_sum([CASE WHEN 64*sums[p+1] >= total
        |        THEN CASE WHEN p = 63 THEN -9223372036854775807 - 1
        |             ELSE (1::BIGINT << p) END
        |        ELSE 0 END FOR p IN range(0, 64)]) AS BIGINT) AS phash
        |  FROM t),
        |banded AS (
        |  SELECT media_id, phash, r.b AS band,
        |    (phash >> (r.b * 16)) & 65535 AS v
        |  FROM ph CROSS JOIN range(4) r(b)),
        |cand AS (
        |  SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b,
        |    a.phash AS pa, b.phash AS pb
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.v = b.v AND a.media_id < b.media_id)
        |SELECT media_a, media_b, bit_count(xor(pa, pb))::INT AS hamming
        |FROM cand WHERE bit_count(xor(pa, pb)) <= 3""".stripMargin,

    // hyperplane-LSH top-k: bucket assignment replayed from interpolated
    // plane literals, then cosine ranking within the shared bucket
    "e_ann_topk" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
        |b AS (SELECT vec_id, ev, ${lshBucketSql("ev", 64, 6, 42L)} AS bucket FROM e),
        |q AS (SELECT vec_id AS query_id, ev AS qv, bucket FROM b WHERE vec_id < 5),
        |c AS (SELECT vec_id AS neighbor_id, ev AS cv, bucket FROM b),
        |scored AS (
        |  SELECT query_id, neighbor_id, list_cosine_similarity(cv, qv) AS cos
        |  FROM c JOIN q USING (bucket) WHERE neighbor_id <> query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY round(cos, 6) DESC, neighbor_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, round(cos, 6) AS cosine, rank
        |FROM ranked WHERE rank <= 10""".stripMargin,

    // embedding near-dup on the twin corpus: one bucket per doc (single
    // 12-plane signature), within-bucket pairs at cosine ≥ 0.999
    "e_embedding_neardup" ->
      s"""WITH base AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000, embedding FROM embeddings),
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM base),
        |b AS (SELECT vec_id, ev, ${lshBucketSql("ev", 64, 12, 42L)} AS bucket FROM e),
        |pairs AS (
        |  SELECT a.vec_id AS id_a, bb.vec_id AS id_b,
        |    list_cosine_similarity(a.ev, bb.ev) AS cos
        |  FROM b a JOIN b bb USING (bucket) WHERE a.vec_id < bb.vec_id)
        |SELECT DISTINCT id_a, id_b, round(cos, 6) AS cosine
        |FROM pairs WHERE cos >= 0.999""".stripMargin,

    // incremental probe replay: same plane family, stored buckets =
    // the whole corpus, probe = the +1e6 twins of every 3rd vector
    "e_incremental_embdup" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
        |b AS (SELECT vec_id, ev, ${lshBucketSql("ev", 64, 12, 42L)} AS bucket FROM e),
        |probe AS (
        |  SELECT vec_id + 1000000 AS id_new, ev, bucket
        |  FROM b WHERE vec_id % 3 = 0),
        |pairs AS (
        |  SELECT p.id_new, s.vec_id AS id_indexed,
        |    list_cosine_similarity(p.ev, s.ev) AS cos
        |  FROM b s JOIN probe p USING (bucket))
        |SELECT DISTINCT id_new, id_indexed, round(cos, 6) AS cosine
        |FROM pairs WHERE cos >= 0.999""".stripMargin,

    // IVF with fixed centroids (first 16 vectors): assignment + probe
    // selection + ranking all replayed (sequential-double-sum scores)
    "e_ivf_topk" ->
      """WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
        |           FROM embeddings WHERE vec_id < 16),
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
        |scored0 AS (
        |  SELECT e.vec_id, c.cid,
        |    list_dot_product(cv, cv) - 2 * list_dot_product(ev, cv) AS sc
        |  FROM e CROSS JOIN c),
        |asg AS (
        |  SELECT vec_id, cid AS list_id FROM (
        |    SELECT vec_id, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY sc ASC, cid ASC) AS rn
        |    FROM scored0) WHERE rn = 1),
        |probes AS (
        |  SELECT vec_id AS query_id, cid AS list_id FROM (
        |    SELECT vec_id, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY sc ASC, cid ASC) AS rn
        |    FROM scored0 WHERE vec_id < 5) WHERE rn <= 4),
        |cand AS (
        |  SELECT p.query_id, a.vec_id AS neighbor_id
        |  FROM probes p JOIN asg a USING (list_id)
        |  WHERE a.vec_id <> p.query_id),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |    list_cosine_similarity(ce.ev, qe.ev) AS cos
        |  FROM cand JOIN e ce ON ce.vec_id = cand.neighbor_id
        |  JOIN e qe ON qe.vec_id = cand.query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY round(cos, 6) DESC, neighbor_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, round(cos, 6) AS cosine, rank
        |FROM ranked WHERE rank <= 10""".stripMargin,

    // nearest-centroid assignment: the same score(v,c) = ‖c‖² − 2 v·c with
    // sequential double sums on both engines → bit-identical argmin; ties
    // break to the lowest centroid id on both sides
    "e_kmeans_assign" ->
      """WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
        |           FROM embeddings WHERE vec_id < 8),
        |v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
        |scored AS (
        |  SELECT v.vec_id, c.cid,
        |    list_dot_product(cv, cv) - 2 * list_dot_product(ev, cv) AS sc
        |  FROM v CROSS JOIN c),
        |ranked AS (
        |  SELECT vec_id, cid,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY sc ASC, cid ASC) AS rn
        |  FROM scored)
        |SELECT vec_id, CAST(cid AS INT) AS cluster_id
        |FROM ranked WHERE rn = 1""".stripMargin,

    "e_kmeans_warm" -> {
      val sel = (1 to 3).map(r =>
        s"""SELECT $r::INT AS round, cid::INT AS cluster_id, pos::INT AS pos,
           |  cm AS c_micro, n FROM r$r""".stripMargin).mkString("\nUNION ALL\n")
      s"WITH ${kmeansWarmSql(3)}\n$sel"
    },

    // cold k-means: the same unrolled-rounds machinery, seeded by the
    // replayable md5 ladder instead of the persisted-centroid fixture
    "e_kmeans_cluster" -> {
      val sel = (1 to 3).map(r =>
        s"""SELECT $r::INT AS round, cid::INT AS cluster_id, pos::INT AS pos,
           |  cm AS c_micro, n FROM r$r""".stripMargin).mkString("\nUNION ALL\n")
      s"WITH ${kmeansRoundsSql(kmeansColdHeadSql(8), 3)}\n$sel"
    },

    "e_embedding_outliers" ->
      """WITH oc AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
        |            FROM embeddings WHERE vec_id < 8),
        |ov AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
        |osc AS (
        |  SELECT ov.vec_id, oc.cid,
        |    list_dot_product(cv, cv) - 2 * list_dot_product(ev, cv) AS sc,
        |    list_dot_product(ev, ev) AS vv
        |  FROM ov CROSS JOIN oc),
        |oasg AS (
        |  SELECT vec_id, cid AS cluster_id, sc, vv FROM (
        |    SELECT vec_id, cid, sc, vv,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY sc ASC, cid ASC) AS rn
        |    FROM osc) WHERE rn = 1),
        |ob AS (
        |  SELECT vec_id, CAST(cluster_id AS INT) AS cluster_id,
        |    CAST(round((sc + vv) * 1e6) AS BIGINT) AS d
        |  FROM oasg),
        |om1 AS (
        |  SELECT cluster_id,
        |    max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN d END) AS med
        |  FROM (
        |    SELECT cluster_id, d,
        |      row_number() OVER (PARTITION BY cluster_id ORDER BY d ASC, vec_id ASC) AS rn,
        |      count(*) OVER (PARTITION BY cluster_id) AS n
        |    FROM ob) GROUP BY 1),
        |obd AS (
        |  SELECT ob.vec_id, ob.cluster_id, ob.d, om1.med,
        |    abs(ob.d - om1.med) AS dev
        |  FROM ob JOIN om1 USING (cluster_id)),
        |om2 AS (
        |  SELECT cluster_id,
        |    max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN dev END) AS mad
        |  FROM (
        |    SELECT cluster_id, vec_id, dev,
        |      row_number() OVER (PARTITION BY cluster_id ORDER BY dev ASC, vec_id ASC) AS rn,
        |      count(*) OVER (PARTITION BY cluster_id) AS n
        |    FROM obd) GROUP BY 1)
        |SELECT obd.vec_id, obd.cluster_id, obd.d AS d_micro,
        |  obd.med AS med_micro, om2.mad AS mad_micro
        |FROM obd JOIN om2 USING (cluster_id)
        |WHERE obd.dev > 3 * om2.mad""".stripMargin,

    "e_cluster_compare" ->
      s"""WITH ${kmeansWarmSql(3)},
        |sc4 AS (
        |  SELECT wv.vec_id, c.cid,
        |    list_dot_product(c.cv, c.cv) - 2 * list_dot_product(wv.ev, c.cv) AS sc
        |  FROM wv CROSS JOIN cv3 c),
        |asg4 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY sc ASC, cid ASC) AS rn
        |    FROM sc4) WHERE rn = 1),
        |cc AS (SELECT a.cid AS ca, b.cid AS cb, count(*)::BIGINT AS n
        |       FROM asg1 a JOIN asg4 b USING (vec_id) GROUP BY 1, 2),
        |cam AS (SELECT ca, sum(n)::BIGINT AS na FROM cc GROUP BY 1),
        |cbm AS (SELECT cb, sum(n)::BIGINT AS nb FROM cc GROUP BY 1),
        |ctot AS (SELECT sum(n)::BIGINT AS nn, count(*)::BIGINT AS cells FROM cc),
        |cagg AS (
        |  SELECT max(nn) AS n, max(cells) AS n_cells,
        |    sum(n * (n - 1)) AS sij2,
        |    sum(CAST(round((n::DOUBLE / nn)
        |      * ln(nn::DOUBLE * n / (na::DOUBLE * nb)) * 1e9) AS BIGINT)) AS mi_nano
        |  FROM cc JOIN cam USING (ca) JOIN cbm USING (cb) CROSS JOIN ctot),
        |cha AS (
        |  SELECT sum(CAST(round(-(na::DOUBLE / nn) * ln(na::DOUBLE / nn) * 1e9)
        |    AS BIGINT)) AS h_na, sum(na * (na - 1)) AS s_na
        |  FROM cam CROSS JOIN ctot),
        |chb AS (
        |  SELECT sum(CAST(round(-(nb::DOUBLE / nn) * ln(nb::DOUBLE / nn) * 1e9)
        |    AS BIGINT)) AS h_nb, sum(nb * (nb - 1)) AS s_nb
        |  FROM cbm CROSS JOIN ctot)
        |SELECT n, n_cells,
        |  CASE WHEN abs((s_na::DOUBLE / 2 + s_nb::DOUBLE / 2) / 2
        |      - s_na::DOUBLE / 2 * (s_nb::DOUBLE / 2) / (n::DOUBLE * (n - 1) / 2)) > 0
        |    THEN round((sij2::DOUBLE / 2
        |        - s_na::DOUBLE / 2 * (s_nb::DOUBLE / 2) / (n::DOUBLE * (n - 1) / 2))
        |      / ((s_na::DOUBLE / 2 + s_nb::DOUBLE / 2) / 2
        |        - s_na::DOUBLE / 2 * (s_nb::DOUBLE / 2) / (n::DOUBLE * (n - 1) / 2)), 6)
        |  END AS ari,
        |  CASE WHEN h_na > 0 AND h_nb > 0 THEN
        |    round(mi_nano::DOUBLE / sqrt(h_na::DOUBLE * h_nb), 6) END AS nmi
        |FROM cagg CROSS JOIN cha CROSS JOIN chb""".stripMargin,

    "e_semantic_pairs" ->
      """WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
        |           FROM embeddings WHERE vec_id < 8),
        |v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
        |scored AS (
        |  SELECT v.vec_id, c.cid, ev,
        |    list_dot_product(cv, cv) - 2 * list_dot_product(ev, cv) AS sc
        |  FROM v CROSS JOIN c),
        |asg AS (
        |  SELECT vec_id, cid AS cluster_id, ev FROM (
        |    SELECT vec_id, cid, ev,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY sc ASC, cid ASC) AS rn
        |    FROM scored) WHERE rn = 1),
        |pairs AS (
        |  SELECT a.cluster_id, a.vec_id AS id_a, b.vec_id AS id_b,
        |    round(list_cosine_similarity(a.ev, b.ev), 6) AS cosine
        |  FROM asg a JOIN asg b USING (cluster_id)
        |  WHERE a.vec_id < b.vec_id)
        |SELECT CAST(cluster_id AS INT) AS cluster_id, id_a, id_b, cosine
        |FROM pairs WHERE cosine >= 0.3""".stripMargin,

    "e_semantic_dedup" ->
      """WITH base AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000, embedding FROM embeddings),
        |c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
        |      FROM embeddings WHERE vec_id < 8),
        |v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM base),
        |scored AS (
        |  SELECT v.vec_id, c.cid, ev,
        |    list_dot_product(cv, cv) - 2 * list_dot_product(ev, cv) AS sc
        |  FROM v CROSS JOIN c),
        |asg AS (
        |  SELECT vec_id, cid AS cluster_id, ev FROM (
        |    SELECT vec_id, cid, ev,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY sc ASC, cid ASC) AS rn
        |    FROM scored) WHERE rn = 1),
        |pruned AS (
        |  SELECT DISTINCT b.vec_id
        |  FROM asg a JOIN asg b USING (cluster_id)
        |  WHERE a.vec_id < b.vec_id
        |    AND round(list_cosine_similarity(a.ev, b.ev), 6) >= 0.95)
        |SELECT vec_id FROM base
        |WHERE vec_id NOT IN (SELECT vec_id FROM pruned)""".stripMargin,

    // identical twins share clusters and pair at cosine 1 ≥ tau; random
    // cross-pairs stay below — every component's min id is the original
    "e_semantic_clusters" ->
      """SELECT vec_id FROM embeddings""",

    // range() is stop-EXCLUSIVE in DuckDB vs inclusive Spark sequence →
    // +1 on the stop bound
    "t_chunk" ->
      """WITH arrs AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13)) = '' THEN []::VARCHAR[]
        |         ELSE regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13)), '\s+') END AS arr
        |  FROM documents),
        |starts AS (
        |  SELECT doc_id, arr, len(arr) AS n, t.s
        |  FROM (SELECT doc_id, arr FROM arrs WHERE len(arr) >= 1) a,
        |       unnest(range(0,
        |         greatest(CAST(ceil((len(arr) - 64)::DOUBLE / 48) AS INT), 0) * 48 + 1,
        |         48)) AS t(s))
        |SELECT doc_id, (s // 48)::BIGINT AS chunk_id,
        |  array_to_string(arr[s+1:s+64], ' ') AS chunk_text,
        |  s::BIGINT AS chunk_start,
        |  least(n - s, 64)::BIGINT AS chunk_tokens
        |FROM starts""".stripMargin,

    // trim with the full whitespace class: the operator's kernel
    // tokenization java-trims ALL whitespace, not just spaces
    "d_span_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |         array_to_string(toks[1:12], ' ') || ' tailmark' || doc_id
        |  FROM (SELECT doc_id,
        |          regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13)), '\s+') AS toks
        |        FROM documents WHERE trim(text, ' ' || chr(9) || chr(10) || chr(13)) <> '')
        |  WHERE len(toks) >= 12),
        |arrs AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13)) = '' THEN []::VARCHAR[]
        |         ELSE regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13)), '\s+') END AS arr
        |  FROM corpus),
        |wins AS (
        |  SELECT doc_id, u.wpos, u.dig FROM (
        |    SELECT doc_id,
        |      unnest([{'wpos': i, 'dig': md5(array_to_string(arr[i+1:i+8], ' '))}
        |              FOR i IN range(0, len(arr) - 7)]) AS u
        |    FROM arrs WHERE len(arr) >= 8)),
        |repeated AS (SELECT dig FROM wins GROUP BY dig HAVING count(*) > 1),
        |covered AS (
        |  SELECT DISTINCT w.doc_id, t.pos
        |  FROM wins w JOIN repeated USING (dig),
        |       unnest(range(w.wpos, w.wpos + 8)) AS t(pos)),
        |toks AS (
        |  SELECT doc_id, u.pos, u.tok FROM (
        |    SELECT doc_id,
        |      unnest([{'pos': i, 'tok': arr[i+1]} FOR i IN range(len(arr))]) AS u
        |    FROM arrs)),
        |rebuilt AS (
        |  SELECT t.doc_id, count(*) AS n_kept,
        |         string_agg(t.tok, ' ' ORDER BY t.pos) AS clean_text
        |  FROM toks t
        |  LEFT JOIN covered c ON c.doc_id = t.doc_id AND c.pos = t.pos
        |  WHERE c.doc_id IS NULL
        |  GROUP BY t.doc_id)
        |SELECT a.doc_id,
        |  coalesce(r.clean_text, '') AS clean_text,
        |  len(a.arr)::BIGINT AS n_tokens,
        |  (len(a.arr) - coalesce(r.n_kept, 0))::BIGINT AS n_removed
        |FROM arrs a LEFT JOIN rebuilt r USING (doc_id)""".stripMargin,

    // same census, but the lexicographically-first occurrence of each
    // repeated digest is excluded from coverage (rn = 1 survives) —
    // replaying the operator's min(struct) canonical-occurrence exclusion
    "d_span_dedup_keepfirst" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |         array_to_string(toks[1:12], ' ') || ' tailmark' || doc_id
        |  FROM (SELECT doc_id,
        |          regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13)), '\s+') AS toks
        |        FROM documents WHERE trim(text, ' ' || chr(9) || chr(10) || chr(13)) <> '')
        |  WHERE len(toks) >= 12),
        |arrs AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13)) = '' THEN []::VARCHAR[]
        |         ELSE regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13)), '\s+') END AS arr
        |  FROM corpus),
        |wins AS (
        |  SELECT doc_id, u.wpos, u.dig FROM (
        |    SELECT doc_id,
        |      unnest([{'wpos': i, 'dig': md5(array_to_string(arr[i+1:i+8], ' '))}
        |              FOR i IN range(0, len(arr) - 7)]) AS u
        |    FROM arrs WHERE len(arr) >= 8)),
        |repeated AS (SELECT dig FROM wins GROUP BY dig HAVING count(*) > 1),
        |ranked AS (
        |  SELECT w.doc_id, w.wpos,
        |    row_number() OVER (PARTITION BY w.dig ORDER BY w.doc_id, w.wpos) AS rn
        |  FROM wins w JOIN repeated USING (dig)),
        |covered AS (
        |  SELECT DISTINCT r.doc_id, t.pos
        |  FROM ranked r, unnest(range(r.wpos, r.wpos + 8)) AS t(pos)
        |  WHERE r.rn > 1),
        |toks AS (
        |  SELECT doc_id, u.pos, u.tok FROM (
        |    SELECT doc_id,
        |      unnest([{'pos': i, 'tok': arr[i+1]} FOR i IN range(len(arr))]) AS u
        |    FROM arrs)),
        |rebuilt AS (
        |  SELECT t.doc_id, count(*) AS n_kept,
        |         string_agg(t.tok, ' ' ORDER BY t.pos) AS clean_text
        |  FROM toks t
        |  LEFT JOIN covered c ON c.doc_id = t.doc_id AND c.pos = t.pos
        |  WHERE c.doc_id IS NULL
        |  GROUP BY t.doc_id)
        |SELECT a.doc_id,
        |  coalesce(r.clean_text, '') AS clean_text,
        |  len(a.arr)::BIGINT AS n_tokens,
        |  (len(a.arr) - coalesce(r.n_kept, 0))::BIGINT AS n_removed
        |FROM arrs a LEFT JOIN rebuilt r USING (doc_id)""".stripMargin,

    // same census, then gaps-and-islands over the covered positions:
    // consecutive positions share pos − row_number, each island is one
    // maximal repeated span, its text sliced from the doc's token array
    "d_span_maximal" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |         array_to_string(toks[1:12], ' ') || ' tailmark' || doc_id
        |  FROM (SELECT doc_id,
        |          regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13)), '\s+') AS toks
        |        FROM documents WHERE trim(text, ' ' || chr(9) || chr(10) || chr(13)) <> '')
        |  WHERE len(toks) >= 12),
        |arrs AS (
        |  SELECT doc_id,
        |    CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13)) = '' THEN []::VARCHAR[]
        |         ELSE regexp_split_to_array(trim(text, ' ' || chr(9) || chr(10) || chr(13)), '\s+') END AS arr
        |  FROM corpus),
        |wins AS (
        |  SELECT doc_id, u.wpos, u.dig FROM (
        |    SELECT doc_id,
        |      unnest([{'wpos': i, 'dig': md5(array_to_string(arr[i+1:i+8], ' '))}
        |              FOR i IN range(0, len(arr) - 7)]) AS u
        |    FROM arrs WHERE len(arr) >= 8)),
        |repeated AS (SELECT dig FROM wins GROUP BY dig HAVING count(*) > 1),
        |covered AS (
        |  SELECT DISTINCT w.doc_id, t.pos
        |  FROM wins w JOIN repeated USING (dig),
        |       unnest(range(w.wpos, w.wpos + 8)) AS t(pos)),
        |isl AS (
        |  SELECT doc_id, pos,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS g
        |  FROM covered),
        |spans AS (
        |  SELECT doc_id, min(pos)::BIGINT AS span_start,
        |         count(*)::BIGINT AS span_len
        |  FROM isl GROUP BY doc_id, g)
        |SELECT s.doc_id, s.span_start, s.span_len,
        |  array_to_string(a.arr[s.span_start+1 : s.span_start+s.span_len], ' ')
        |    AS span_text
        |FROM spans s JOIN arrs a USING (doc_id)""".stripMargin,

    // qvec is pinned as md5(comma-join) — a portable scalar the driver's
    // pandas comparator can sort (raw array cells are unhashable there)
    "e_quantize_int8" ->
      """WITH m AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS ev,
        |    list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS ma
        |  FROM embeddings),
        |qv AS (
        |  SELECT vec_id, round(ma / 127.0, 9) AS scale,
        |    list_transform(ev, x ->
        |      CASE WHEN ma = 0 THEN 0
        |           ELSE CAST(round(x * 127.0 / ma) AS INT) END) AS qvec
        |  FROM m)
        |SELECT vec_id, scale,
        |  md5(array_to_string(qvec, ',')) AS qhash,
        |  list_sum(qvec)::BIGINT AS qsum,
        |  list_min(qvec) AS qmin,
        |  list_max(qvec) AS qmax
        |FROM qv""".stripMargin,

    "d_containment_self" ->
      """WITH norm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm
        |  FROM documents),
        |tok0 AS (
        |  SELECT doc_id,
        |    CASE WHEN norm = '' THEN []::VARCHAR[]
        |         ELSE regexp_split_to_array(norm, '\s+') END AS toks
        |  FROM norm),
        |corpus AS (
        |  SELECT doc_id, toks FROM tok0
        |  UNION ALL
        |  SELECT doc_id + 3000000, toks[1:16] FROM tok0
        |  WHERE len(toks) >= 24 AND doc_id % 7 = 0),
        |sh_of AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |         ELSE [array_to_string(toks[i:i+2], ' ') FOR i IN range(1, len(toks) - 1)]
        |    END) AS sh
        |  FROM corpus),
        |sh AS (SELECT doc_id, unnest(sh) AS g FROM sh_of),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |m AS (
        |  SELECT a.doc_id AS contained_id, b.doc_id AS container_id,
        |    count(*) AS inter
        |  FROM sh a JOIN sh b USING (g)
        |  WHERE a.doc_id <> b.doc_id GROUP BY 1, 2)
        |SELECT contained_id, container_id, inter,
        |  sa.n::BIGINT AS n_contained,
        |  round(inter::DOUBLE / sa.n, 6) AS containment
        |FROM m
        |JOIN sizes sa ON sa.doc_id = contained_id
        |JOIN sizes sb ON sb.doc_id = container_id
        |WHERE (sa.n < sb.n OR (sa.n = sb.n AND contained_id < container_id))
        |  AND round(inter::DOUBLE / sa.n, 6) >= 0.9""".stripMargin,

    "d_fellegi_sunter" -> {
      val Seq(fl, fs, fn) = fsGateFields
      s"""WITH docs AS (
        |  SELECT doc_id, text, lang, source, n_chars FROM documents
        |  WHERE doc_id % 3 = 0),
        |norm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\\p{L}\\p{N}\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS nt
        |  FROM docs),
        |r AS MATERIALIZED (
        |  SELECT doc_id, (row_number() OVER (ORDER BY nt, doc_id) - 1)::BIGINT AS seq
        |  FROM norm),
        |cand AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM r a JOIN r b ON b.seq - a.seq >= 1 AND b.seq - a.seq < 4),
        |attr AS (SELECT doc_id, lang, source, n_chars // 256 AS lb FROM docs),
        |p AS (
        |  SELECT c.doc_a, c.doc_b,
        |    (CASE WHEN a.lang = b.lang THEN ${fl.agreeMicro} ELSE ${fl.disagreeMicro} END)::BIGINT AS w_lang,
        |    (CASE WHEN a.source = b.source THEN ${fs.agreeMicro} ELSE ${fs.disagreeMicro} END)::BIGINT AS w_source,
        |    (CASE WHEN a.lb = b.lb THEN ${fn.agreeMicro} ELSE ${fn.disagreeMicro} END)::BIGINT AS w_len
        |  FROM cand c
        |  JOIN attr a ON a.doc_id = c.doc_a
        |  JOIN attr b ON b.doc_id = c.doc_b)
        |SELECT doc_a, doc_b, w_lang, w_source, w_len,
        |  w_lang + w_source + w_len AS fs_micro,
        |  CASE WHEN w_lang + w_source + w_len >= 2000000 THEN 'link'
        |       WHEN w_lang + w_source + w_len <= 0 THEN 'nonlink'
        |       ELSE 'possible' END AS verdict
        |FROM p""".stripMargin
    },

    "d_fs_entities" -> {
      val Seq(fl, fs, fn) = fsGateFields
      s"""WITH RECURSIVE docs AS (
        |  SELECT doc_id, text, lang, source, n_chars FROM documents
        |  WHERE doc_id % 3 = 0),
        |norm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\\p{L}\\p{N}\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS nt
        |  FROM docs),
        |r AS MATERIALIZED (
        |  SELECT doc_id, (row_number() OVER (ORDER BY nt, doc_id) - 1)::BIGINT AS seq
        |  FROM norm),
        |cand AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM r a JOIN r b ON b.seq - a.seq >= 1 AND b.seq - a.seq < 4),
        |attr AS (SELECT doc_id, lang, source, n_chars // 256 AS lb FROM docs),
        |p AS (
        |  SELECT c.doc_a, c.doc_b,
        |    (CASE WHEN a.lang = b.lang THEN ${fl.agreeMicro} ELSE ${fl.disagreeMicro} END)::BIGINT
        |    + (CASE WHEN a.source = b.source THEN ${fs.agreeMicro} ELSE ${fs.disagreeMicro} END)::BIGINT
        |    + (CASE WHEN a.lb = b.lb THEN ${fn.agreeMicro} ELSE ${fn.disagreeMicro} END)::BIGINT
        |      AS fs_micro
        |  FROM cand c
        |  JOIN attr a ON a.doc_id = c.doc_a
        |  JOIN attr b ON b.doc_id = c.doc_b),
        |links AS (SELECT doc_a, doc_b FROM p WHERE fs_micro >= 2000000),
        |nodes AS (SELECT doc_a AS n FROM links UNION SELECT doc_b FROM links),
        |edges AS (SELECT doc_a AS a, doc_b AS b FROM links
        |          UNION SELECT doc_b, doc_a FROM links),
        |reach AS (
        |  SELECT n, n AS c FROM nodes
        |  UNION
        |  SELECT e.b AS n, r2.c FROM reach r2 JOIN edges e ON e.a = r2.n)
        |SELECT n AS node, min(c)::BIGINT AS component
        |FROM reach GROUP BY n""".stripMargin
    },

    "d_fs_uprob" ->
      """SELECT 'lang' AS field, CAST(round(sq * 1e6 / (n * n)) AS BIGINT) AS u_micro
        |FROM (SELECT sum(c * c)::BIGINT AS sq, sum(c)::BIGINT AS n
        |      FROM (SELECT count(*)::BIGINT AS c FROM documents GROUP BY lang))
        |UNION ALL
        |SELECT 'source', CAST(round(sq * 1e6 / (n * n)) AS BIGINT)
        |FROM (SELECT sum(c * c)::BIGINT AS sq, sum(c)::BIGINT AS n
        |      FROM (SELECT count(*)::BIGINT AS c FROM documents GROUP BY source))
        |UNION ALL
        |SELECT 'len', CAST(round(sq * 1e6 / (n * n)) AS BIGINT)
        |FROM (SELECT sum(c * c)::BIGINT AS sq, sum(c)::BIGINT AS n
        |      FROM (SELECT count(*)::BIGINT AS c FROM documents GROUP BY n_chars // 256))""".stripMargin,

    "e_embedding_drift" ->
      """WITH ca AS (
        |  SELECT generate_subscripts(embedding, 1) - 1 AS dim,
        |    CAST(round(unnest(embedding)::DOUBLE * 1e6) AS BIGINT) AS vm
        |  FROM embeddings WHERE vec_id % 2 = 0),
        |cb AS (
        |  SELECT generate_subscripts(embedding, 1) - 1 AS dim,
        |    CAST(round(unnest(embedding)::DOUBLE * 1e6) AS BIGINT) AS vm
        |  FROM embeddings WHERE vec_id % 2 = 1),
        |ga AS (SELECT dim, sum(vm)::BIGINT AS sa, count(*)::BIGINT AS na FROM ca GROUP BY 1),
        |gb AS (SELECT dim, sum(vm)::BIGINT AS sb, count(*)::BIGINT AS nb FROM cb GROUP BY 1)
        |SELECT dim,
        |  round(sa::DOUBLE / na / 1e6, 6) AS mean_a,
        |  round(sb::DOUBLE / nb / 1e6, 6) AS mean_b,
        |  round(abs(sb::DOUBLE / nb / 1e6 - sa::DOUBLE / na / 1e6), 6) AS shift
        |FROM ga JOIN gb USING (dim)""".stripMargin,

    "e_embedding_drift_summary" ->
      """WITH ca AS (
        |  SELECT generate_subscripts(embedding, 1) - 1 AS dim,
        |    CAST(round(unnest(embedding)::DOUBLE * 1e6) AS BIGINT) AS vm
        |  FROM embeddings WHERE vec_id % 2 = 0),
        |cb AS (
        |  SELECT generate_subscripts(embedding, 1) - 1 AS dim,
        |    CAST(round(unnest(embedding)::DOUBLE * 1e6) AS BIGINT) AS vm
        |  FROM embeddings WHERE vec_id % 2 = 1),
        |ga AS (SELECT dim, sum(vm)::BIGINT AS sa, count(*)::BIGINT AS na FROM ca GROUP BY 1),
        |gb AS (SELECT dim, sum(vm)::BIGINT AS sb, count(*)::BIGINT AS nb FROM cb GROUP BY 1),
        |m AS (
        |  SELECT dim,
        |    CAST(round(sa::DOUBLE / na) AS BIGINT) AS ma,
        |    CAST(round(sb::DOUBLE / nb) AS BIGINT) AS mb,
        |    round(abs(sb::DOUBLE / nb / 1e6 - sa::DOUBLE / na / 1e6), 6) AS shift
        |  FROM ga JOIN gb USING (dim))
        |SELECT count(*)::BIGINT AS n_dims,
        |  round(sum(ma * mb)::DOUBLE
        |    / (sqrt(sum(ma * ma)::DOUBLE) * sqrt(sum(mb * mb)::DOUBLE)), 6) AS centroid_cosine,
        |  max(shift) AS max_shift
        |FROM m""".stripMargin,

    "r_mmr" -> {
      val picks = (1 to 8).map(i =>
        s"SELECT query_id, doc_id, ${i}::BIGINT AS mmr_rank, rel_micro, mmr_e12 FROM w$i")
        .mkString("\nUNION ALL ")
      s"""WITH ${mmrChainSql(20, 8, 700000L)}
        |$picks""".stripMargin
    },

    "e_kcenter" -> {
      val picks = (2 to 8).map(i =>
        s"UNION ALL SELECT ${i}::BIGINT, vec_id::BIGINT, d2min FROM c$i")
        .mkString("\n")
      s"""WITH ${kCenterChainSql(8)}
        |SELECT 1::BIGINT AS rank, (SELECT min(vec_id) FROM n2)::BIGINT AS vec_id, 0::BIGINT AS d2_sel
        |$picks""".stripMargin
    },

    // KNN-Shapley: the Jia et al. closed form replayed directly — global
    // rank + suffix-sum windows per test (the oracle may window freely;
    // the operator's two-phase shards must match it bit-for-bit)
    "e_knn_shapley" ->
      """WITH qm AS (
        |  SELECT vec_id, label, embedding::DOUBLE[] AS ev,
        |    list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS ma
        |  FROM embeddings),
        |q AS MATERIALIZED (
        |  SELECT vec_id, label, list_transform(ev, x ->
        |    CASE WHEN ma = 0 THEN 0.0 ELSE round(x * 127.0 / ma) END) AS qv
        |  FROM qm),
        |n2 AS MATERIALIZED (
        |  SELECT vec_id, label, qv, list_dot_product(qv, qv) AS sq FROM q),
        |tst AS (SELECT * FROM n2 WHERE vec_id % 50 = 0),
        |trn AS (SELECT * FROM n2 WHERE vec_id % 50 <> 0),
        |pairs AS (
        |  SELECT t.vec_id AS t_id, a.vec_id AS id, a.label AS lbl,
        |    CAST(a.sq + t.sq - 2 * list_dot_product(a.qv, t.qv) AS BIGINT) AS d2,
        |    (CASE WHEN a.label = t.label THEN 1 ELSE 0 END)::BIGINT AS ind
        |  FROM trn a, tst t),
        |rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY t_id ORDER BY d2, id) AS j,
        |    count(*) OVER (PARTITION BY t_id) AS n
        |  FROM pairs),
        |cg AS (
        |  SELECT *,
        |    CAST(round(least(5, j) * 1000000.0 / (5.0 * j)) AS BIGINT) AS cmj,
        |    CASE WHEN j >= 2 AND j < n THEN
        |      ind * (CAST(round(least(5, j) * 1000000.0 / (5.0 * j)) AS BIGINT)
        |           - CAST(round(least(5, j - 1) * 1000000.0 / (5.0 * (j - 1))) AS BIGINT))
        |    ELSE 0 END AS g
        |  FROM rk),
        |suf AS (
        |  SELECT *,
        |    coalesce(sum(g) OVER (PARTITION BY t_id ORDER BY j
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0)::BIGINT AS suffix
        |  FROM cg),
        |li AS (SELECT t_id, ind AS ind_n FROM suf WHERE j = n),
        |sm AS (
        |  SELECT s.id, s.lbl,
        |    CASE WHEN s.j = s.n
        |      THEN l.ind_n * CAST(round(1000000.0 / s.n) AS BIGINT)
        |      ELSE s.ind * s.cmj + s.suffix
        |        + l.ind_n * (CAST(round(1000000.0 / s.n) AS BIGINT)
        |          - CAST(round(least(5, s.n - 1) * 1000000.0 / (5.0 * (s.n - 1))) AS BIGINT))
        |    END AS s_micro
        |  FROM suf s JOIN li l USING (t_id))
        |SELECT id AS vec_id, min(lbl)::BIGINT AS label,
        |  sum(s_micro)::BIGINT AS value_micro,
        |  sum(s_micro)::DOUBLE
        |    / (1000000.0 * (SELECT count(*) FROM tst)) AS value
        |FROM sm GROUP BY id""".stripMargin,

    "e_setcover" -> {
      def sel(r: Int) = (0 until r).map(i => s"SELECT id FROM scw$i")
        .mkString(" UNION ALL ")
      val rounds = (1 to 8).map { r =>
        s"""sccov$r AS (
           |  SELECT DISTINCT w FROM scde WHERE id IN (${sel(r)})),
           |scg$r AS (
           |  SELECT d.id, count(*)::BIGINT AS gain FROM scde d
           |  LEFT JOIN sccov$r c USING (w)
           |  WHERE c.w IS NULL AND d.id NOT IN (${sel(r)}) GROUP BY d.id),
           |sca$r AS (
           |  SELECT i.id, coalesce(g.gain, 0)::BIGINT AS gain
           |  FROM (SELECT DISTINCT id FROM scde WHERE id NOT IN (${sel(r)})) i
           |  LEFT JOIN scg$r g USING (id)),
           |scw$r AS MATERIALIZED (SELECT id, gain FROM sca$r
           |  ORDER BY gain DESC, id ASC LIMIT 1)""".stripMargin
      }.mkString(",\n")
      val union = (1 to 8).map(r =>
        s"SELECT ${r}::BIGINT AS rank, id, gain FROM scw$r")
        .mkString("\nUNION ALL ")
      s"""WITH scnorm AS MATERIALIZED (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\\p{L}\\p{N}\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS norm
        |  FROM documents WHERE doc_id % 2 = 0),
        |scde AS MATERIALIZED (
        |  SELECT DISTINCT doc_id AS id, w FROM (
        |    SELECT doc_id, unnest(regexp_split_to_array(norm, '\\s+')) AS w
        |    FROM scnorm WHERE norm <> '')
        |  WHERE length(w) >= 6),
        |scw0 AS (SELECT NULL::BIGINT AS id, 0::BIGINT AS gain WHERE false),
        |$rounds
        |SELECT rank, id, gain,
        |  (sum(gain) OVER (ORDER BY rank))::BIGINT AS covered
        |FROM ($union)""".stripMargin
    },

    "g_anchor_text" ->
      s"""WITH ${pageRankChainSql(10)},
        |anorm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\\p{L}\\p{N}\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS norm
        |  FROM documents),
        |anch AS (
        |  SELECT doc_id AS src,
        |    (CASE WHEN norm = '' THEN []::VARCHAR[]
        |          ELSE regexp_split_to_array(norm, '\\s+') END)[1:3] AS toks
        |  FROM anorm),
        |aterm AS (
        |  SELECT e.src, e.dst, unnest(a.toks) AS term
        |  FROM e JOIN anch a ON a.src = e.src),
        |acensus AS (
        |  SELECT t.dst, t.term, count(*)::BIGINT AS n_links,
        |    sum(p.pr)::BIGINT AS weight_micro
        |  FROM aterm t JOIN pr10 p ON p.node = t.src
        |  WHERE t.term <> ''
        |  GROUP BY 1, 2),
        |aranked AS (
        |  SELECT dst, term, n_links, weight_micro,
        |    row_number() OVER (PARTITION BY dst
        |                       ORDER BY weight_micro DESC, term ASC) AS rank
        |  FROM acensus)
        |SELECT dst, term, n_links, weight_micro, rank
        |FROM aranked WHERE rank <= 3""".stripMargin,

    "g_hits" ->
      s"""WITH ${hitsChainSql(5)}
        |SELECT h.node, h.hub AS hub_micro, a.auth AS auth_micro
        |FROM h5 h JOIN a5 a ON a.node = h.node""".stripMargin,

    "g_pagerank" ->
      s"""WITH ${pageRankChainSql(10)}
        |SELECT node, pr AS pr_micro, round(pr::DOUBLE / 1e6, 6) AS pr
        |FROM pr10""".stripMargin,

    "g_pagerank_warm" ->
      s"""WITH ${pageRankChainSql(8)}
        |SELECT node, pr AS pr_micro, round(pr::DOUBLE / 1e6, 6) AS pr
        |FROM pr8""".stripMargin,

    "g_pagerank_dangling" ->
      s"""WITH ${pageRankDanglingChainSql(10)}
        |SELECT node, pr AS pr_micro, round(pr::DOUBLE / 1e6, 6) AS pr
        |FROM pr10""".stripMargin,

    "g_pagerank_weighted" ->
      s"""WITH ${pageRankWeightedChainSql(10)}
        |SELECT node, pr AS pr_micro, round(pr::DOUBLE / 1e6, 6) AS pr
        |FROM pr10""".stripMargin,

    "g_lpa" ->
      s"""WITH ${lpaChainSql(5)}
        |SELECT node, label, count(*) OVER (PARTITION BY label) AS community_size
        |FROM l5""".stripMargin,

    "g_modularity" ->
      s"""WITH ${lpaChainSql(5)},
        |und AS MATERIALIZED (
        |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        |  FROM e0 WHERE src <> dst),
        |gm AS (SELECT count(*)::BIGINT AS m FROM und),
        |gdeg AS (SELECT node, count(*)::BIGINT AS d FROM (
        |  SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und)
        |  GROUP BY 1),
        |gdc AS (SELECT l.label, sum(d)::BIGINT AS d_c
        |        FROM gdeg g JOIN l5 l ON l.node = g.node GROUP BY 1),
        |gec AS (SELECT la.label, count(*)::BIGINT AS e_c FROM und
        |        JOIN l5 la ON la.node = und.u
        |        JOIN l5 lb ON lb.node = und.v
        |        WHERE la.label = lb.label GROUP BY 1),
        |gt AS (SELECT coalesce(e_c, 0) AS e_c, d_c
        |       FROM gdc LEFT JOIN gec USING (label))
        |SELECT m, (SELECT count(*) FROM gt)::BIGINT AS n_communities,
        |  CASE WHEN m > 0 THEN
        |    round(sum(4 * m * e_c - d_c * d_c)::DOUBLE / (4.0 * m * m), 6)
        |  END AS q
        |FROM gt CROSS JOIN gm GROUP BY m""".stripMargin,

    "t_readability" ->
      """WITH raw AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),
        |norm AS (SELECT doc_id, t,
        |  trim(regexp_replace(regexp_replace(lower(t), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS nt
        |  FROM raw),
        |w AS (SELECT doc_id, t,
        |  CASE WHEN nt = '' THEN []::VARCHAR[]
        |       ELSE regexp_split_to_array(nt, '\s+') END AS ws
        |  FROM norm),
        |m AS (SELECT doc_id,
        |  len(ws)::BIGINT AS n_words,
        |  greatest(len(regexp_extract_all(t, '[.!?]+')), 1)::BIGINT AS n_sentences,
        |  coalesce(list_sum(list_transform(ws,
        |    x -> greatest(len(regexp_extract_all(x, '[aeiouy]+')), 1))), 0)::BIGINT AS n_syllables
        |  FROM w)
        |SELECT doc_id, n_words, n_sentences, n_syllables,
        |  CASE WHEN n_words = 0 THEN NULL
        |    ELSE round(206.835 - 1.015 * (n_words::DOUBLE / n_sentences)
        |      - 84.6 * (n_syllables::DOUBLE / n_words), 6) END AS flesch
        |FROM m""".stripMargin,

    "v_constraints" ->
      """SELECT 'complete' AS "check", 'text' AS "column",
        |  round(avg(CASE WHEN text IS NOT NULL THEN 1.0 ELSE 0.0 END), 6) AS metric,
        |  0.95::DOUBLE AS threshold,
        |  coalesce(avg(CASE WHEN text IS NOT NULL THEN 1.0 ELSE 0.0 END) >= 0.95, false) AS passed
        |FROM documents
        |UNION ALL
        |SELECT 'complete', 'lang',
        |  round(avg(CASE WHEN lang IS NOT NULL THEN 1.0 ELSE 0.0 END), 6), 1.0::DOUBLE,
        |  coalesce(avg(CASE WHEN lang IS NOT NULL THEN 1.0 ELSE 0.0 END) >= 1.0, false)
        |FROM documents
        |UNION ALL
        |SELECT 'unique', 'doc_id',
        |  round(count(DISTINCT doc_id)::DOUBLE / count(doc_id), 6), 1.0::DOUBLE,
        |  coalesce(count(DISTINCT doc_id)::DOUBLE / count(doc_id) >= 1.0, false)
        |FROM documents
        |UNION ALL
        |SELECT 'min_value', 'n_chars', round(min(n_chars)::DOUBLE, 6), 0.0::DOUBLE,
        |  coalesce(min(n_chars)::DOUBLE >= 0.0, false)
        |FROM documents
        |UNION ALL
        |SELECT 'max_value', 'n_chars', round(max(n_chars)::DOUBLE, 6), 10000.0::DOUBLE,
        |  coalesce(max(n_chars)::DOUBLE <= 10000.0, false)
        |FROM documents
        |UNION ALL
        |SELECT 'in_set', 'lang',
        |  round(avg(CASE WHEN lang IS NOT NULL THEN (CASE WHEN lang IN ('en','de','fr','es','zh') THEN 1.0 ELSE 0.0 END) END), 6), 1.0::DOUBLE,
        |  coalesce(avg(CASE WHEN lang IS NOT NULL THEN (CASE WHEN lang IN ('en','de','fr','es','zh') THEN 1.0 ELSE 0.0 END) END) >= 1.0, false)
        |FROM documents
        |UNION ALL
        |SELECT 'matches', 'source',
        |  round(avg(CASE WHEN source IS NOT NULL THEN (CASE WHEN regexp_matches(source, '^src[0-9]+$') THEN 1.0 ELSE 0.0 END) END), 6), 1.0::DOUBLE,
        |  coalesce(avg(CASE WHEN source IS NOT NULL THEN (CASE WHEN regexp_matches(source, '^src[0-9]+$') THEN 1.0 ELSE 0.0 END) END) >= 1.0, false)
        |FROM documents
        |UNION ALL
        |SELECT 'functional_dep', 'doc_id',
        |  round(count(DISTINCT doc_id)::DOUBLE / count(DISTINCT (doc_id, lang)), 6), 1.0::DOUBLE,
        |  coalesce(count(DISTINCT doc_id)::DOUBLE / count(DISTINCT (doc_id, lang)) >= 1.0, false)
        |FROM documents
        |UNION ALL
        |SELECT 'functional_dep', 'source',
        |  round(count(DISTINCT source)::DOUBLE / count(DISTINCT (source, lang)), 6), 1.0::DOUBLE,
        |  coalesce(count(DISTINCT source)::DOUBLE / count(DISTINCT (source, lang)) >= 1.0, false)
        |FROM documents""".stripMargin,

    "x_ipf_raking" ->
      s"""WITH ${ipfChainSql(3)}
        |SELECT a, b, cnt, w AS weight_micro,
        |  round(w::DOUBLE / 1e6, 6) AS weight,
        |  CAST(round(cnt * w / 1e6) AS BIGINT) AS adj_cnt
        |FROM wb3""".stripMargin,

    "t_textrank" ->
      s"""WITH ${textRankChainSql(10, 4)}
        |SELECT node AS term, pr AS pr_micro,
        |  row_number() OVER (ORDER BY pr DESC, node ASC) AS rank
        |FROM pr10 ORDER BY rank LIMIT 20""".stripMargin,

    "t_textrank_doc" ->
      s"""WITH ${textRankDocChainSql(5, 4, "doc_id % 20 = 0")}
        |SELECT doc_id, node AS term, pr AS pr_micro, rank FROM (
        |  SELECT doc_id, node, pr,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY pr DESC, node ASC) AS rank
        |  FROM pr5)
        |WHERE rank <= 5""".stripMargin,

    "g_ppr" ->
      s"""WITH ${pprChainSql(10)}
        |SELECT node, pr AS pr_micro, round(pr::DOUBLE / 1e6, 6) AS pr
        |FROM pr10""".stripMargin,

    "k_psi" -> {
      def hist(filter: String, valueExpr: String): String =
        s"""SELECT least(greatest(floor(($valueExpr - 900.0) / 1626.5625), 0), 63)::BIGINT AS bucket,
           |    count(*)::BIGINT AS n
           |  FROM lineitem WHERE l_extendedprice IS NOT NULL AND $filter
           |  GROUP BY 1""".stripMargin
      def psiCase(name: String, actualCte: String): String =
        s"""SELECT '$name' AS "case", round(sum(term_micro)::DOUBLE / 1e6, 6) AS psi
           |FROM (
           |  SELECT CAST(round((greatest(coalesce(a.n, 0)::DOUBLE, 0.5) / na
           |      - greatest(coalesce(e.n, 0)::DOUBLE, 0.5) / ne)
           |    * ln((greatest(coalesce(a.n, 0)::DOUBLE, 0.5) / na)
           |        / (greatest(coalesce(e.n, 0)::DOUBLE, 0.5) / ne)) * 1e6) AS BIGINT) AS term_micro
           |  FROM he e FULL JOIN $actualCte a ON a.bucket = e.bucket
           |  CROSS JOIN (SELECT (SELECT sum(n) FROM he)::BIGINT AS ne,
           |    (SELECT sum(n) FROM $actualCte)::BIGINT AS na) t)""".stripMargin
      s"""WITH he AS (${hist("l_orderkey % 2 = 0", "l_extendedprice")}),
        |hb AS (${hist("l_orderkey % 2 = 1", "l_extendedprice")}),
        |hs AS (${hist("l_orderkey % 2 = 0", "l_extendedprice * 1.1")})
        |${psiCase("split", "hb")}
        |UNION ALL
        |${psiCase("shifted", "hs")}""".stripMargin
    },

    "x_transitions" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS ts_us, event_type
        |  FROM events),
        |pr AS (
        |  SELECT event_type AS to_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS from_type
        |  FROM ev),
        |census AS (
        |  SELECT from_type, to_type, count(*)::BIGINT AS n
        |  FROM pr WHERE from_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT from_type, sum(n)::BIGINT AS t FROM census GROUP BY 1)
        |SELECT c.from_type, c.to_type, c.n,
        |  round(c.n::DOUBLE / t.t, 6) AS p
        |FROM census c JOIN tot t USING (from_type)""".stripMargin,

    "x_seasonal_anomaly" ->
      """WITH ev AS (
        |  SELECT event_type AS key,
        |    epoch_us(ts::TIMESTAMP) // 86400000000 AS b
        |  FROM events),
        |cen AS (
        |  SELECT key, b, count(*)::BIGINT AS v FROM ev GROUP BY 1, 2),
        |res AS (
        |  SELECT c.key, c.b, c.v, l.v AS v_lag, c.v - l.v AS r
        |  FROM cen c JOIN cen l ON l.key = c.key AND l.b = c.b - 7),
        |m1 AS (
        |  SELECT *, max(CASE WHEN rn = (n + 1) // 2 THEN r END)
        |      OVER (PARTITION BY key) AS med
        |  FROM (SELECT *,
        |      row_number() OVER (PARTITION BY key ORDER BY r, b) AS rn,
        |      count(*) OVER (PARTITION BY key) AS n
        |    FROM res)),
        |m2 AS (
        |  SELECT key, b, v, v_lag, r, med, abs(r - med) AS dev FROM m1),
        |m3 AS (
        |  SELECT *, max(CASE WHEN rn = (n + 1) // 2 THEN dev END)
        |      OVER (PARTITION BY key) AS mad
        |  FROM (SELECT *,
        |      row_number() OVER (PARTITION BY key ORDER BY dev, b) AS rn,
        |      count(*) OVER (PARTITION BY key) AS n
        |    FROM m2))
        |SELECT key, b, v, v_lag, r, med, mad,
        |  dev * 1000000 > 3000000 * mad AS anomaly
        |FROM m3""".stripMargin,

    "x_xcorr" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    epoch_us(ts::TIMESTAMP) // 86400000000 AS b
        |  FROM events),
        |gx AS (
        |  SELECT event_type AS key, b, count(*)::BIGINT AS x
        |  FROM ev GROUP BY 1, 2),
        |ry AS (
        |  SELECT b AS rb, count(*)::BIGINT AS y FROM ev
        |  WHERE event_type = 'view' GROUP BY 1),
        |lags AS (SELECT unnest(range(-5, 6))::BIGINT AS lag),
        |sc AS (
        |  SELECT g.key, l.lag, count(*)::BIGINT AS n_overlap,
        |    sum(g.x * r.y)::BIGINT AS dot
        |  FROM gx g CROSS JOIN lags l
        |  JOIN ry r ON r.rb = g.b - l.lag
        |  GROUP BY 1, 2),
        |dense AS (
        |  SELECT k.key, l.lag,
        |    coalesce(s.n_overlap, 0)::BIGINT AS n_overlap,
        |    coalesce(s.dot, 0)::BIGINT AS dot
        |  FROM (SELECT DISTINCT key FROM gx) k
        |  CROSS JOIN lags l
        |  LEFT JOIN sc s ON s.key = k.key AND s.lag = l.lag)
        |SELECT key, lag, n_overlap, dot,
        |  row_number() OVER (PARTITION BY key
        |    ORDER BY dot DESC, abs(lag), lag) = 1 AS is_best
        |FROM dense""".stripMargin,

    "r_rbo" -> {
      val (wd, pk) = operators.Rbo.weights(10, 900000L)
      val wcase = wd.zipWithIndex
        .map { case (v, i) => s"WHEN ${i + 1} THEN $v" }.mkString(" ")
      s"""WITH a AS (
        |  SELECT source AS query, doc_id AS item,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS rank
        |  FROM documents QUALIFY rank <= 10),
        |b AS (
        |  SELECT source AS query, doc_id AS item,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars // 10 DESC, doc_id) AS rank
        |  FROM documents QUALIFY rank <= 10),
        |q AS (SELECT DISTINCT query FROM (
        |  SELECT query FROM a UNION ALL SELECT query FROM b)),
        |mc AS (
        |  SELECT a.query, greatest(a.rank, b.rank) AS m,
        |    count(*)::BIGINT AS nm
        |  FROM a JOIN b ON a.query = b.query AND a.item = b.item
        |  GROUP BY 1, 2),
        |grid AS (
        |  SELECT q.query, d FROM q
        |  CROSS JOIN (SELECT unnest(range(1, 11))::BIGINT AS d)),
        |dep AS (
        |  SELECT g.query, g.d, coalesce(mc.nm, 0)::BIGINT AS nm
        |  FROM grid g LEFT JOIN mc ON mc.query = g.query AND mc.m = g.d),
        |cum AS (
        |  SELECT query, d,
        |    (sum(nm) OVER (PARTITION BY query ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    )::BIGINT AS ov
        |  FROM dep),
        |tm AS (
        |  SELECT query, d, ov,
        |    CAST(round((CASE d $wcase END)::DOUBLE * ov / d) AS BIGINT)
        |      AS term_nano,
        |    CASE WHEN d = 10 THEN
        |      CAST(round($pk::DOUBLE * ov / d) AS BIGINT)
        |    ELSE 0 END AS ext_nano
        |  FROM cum)
        |SELECT query, max(CASE WHEN d = 10 THEN ov END)::BIGINT
        |    AS overlap_k,
        |  (sum(term_nano) + sum(ext_nano))::DOUBLE / 1000000000.0 AS rbo
        |FROM tm GROUP BY query""".stripMargin
    },

    "w_window_rewrite" ->
      """WITH u AS (
        |  SELECT user_id, event_type,
        |    count(*) OVER w AS user_events,
        |    sum(length(event_type)) OVER w AS sum_len,
        |    max(event_type) OVER w AS max_type,
        |    count(DISTINCT event_type) OVER w AS n_types
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id))
        |SELECT user_events::BIGINT AS user_events, sum_len::BIGINT AS sum_len,
        |  max_type, n_types::BIGINT AS n_types, count(*)::BIGINT AS n_view_rows
        |FROM u WHERE event_type = 'view'
        |GROUP BY 1, 2, 3, 4""".stripMargin,

    "v_forest_train" ->
      s"""WITH ${forestChainSql(3, 2, 2, 16, 10, 700000L)}
        |SELECT tree, node, kind, feature, bin, n, pos FROM forest"""
        .stripMargin,

    "v_forest_vote" ->
      s"""WITH ${forestChainSql(3, 2, 2, 16, 10, 700000L)}
        |SELECT v.doc_id, v.votes_pos, v.pred, v.oob_votes, v.oob_pos,
        |  v.oob_pred, f.y
        |FROM votes v JOIN fx f USING (doc_id)""".stripMargin,

    "x_boost_train" ->
      s"""WITH ${boostChainSql(5, 16)}
        |SELECT rnd AS "round", f::BIGINT AS feature, t::BIGINT AS bin,
        |  cl::BIGINT AS cl, cr::BIGINT AS cr, e AS err_w, tw AS tot_w,
        |  beta AS beta_micro
        |FROM stumps""".stripMargin,

    "x_boost_margin" ->
      s"""WITH ${boostChainSql(5, 16)},
        |al AS (
        |  SELECT f, t, cl, cr,
        |    CAST(round(ln(1e6 / beta) * 1e6) AS BIGINT) AS alpha
        |  FROM stumps),
        |m AS (
        |  SELECT d.doc_id,
        |    sum(CASE WHEN (CASE WHEN (CASE a.f WHEN 0 THEN d.b0
        |          WHEN 1 THEN d.b1 WHEN 2 THEN d.b2 ELSE d.b3 END) <= a.t
        |        THEN a.cl ELSE a.cr END) = 1
        |      THEN a.alpha ELSE -a.alpha END)::BIGINT AS margin_micro
        |  FROM w0 d CROSS JOIN al a GROUP BY 1)
        |SELECT doc_id, margin_micro,
        |  (CASE WHEN margin_micro >= 0 THEN 1 ELSE 0 END)::BIGINT AS pred
        |FROM m""".stripMargin,

    "v_quantile_bins" ->
      s"""WITH ${quantilePreambleSql(16)}
        |SELECT 0::BIGINT AS feature, j, edge FROM qe0
        |UNION ALL SELECT 1::BIGINT, j, edge FROM qe1
        |UNION ALL SELECT 2::BIGINT, j, edge FROM qe2
        |UNION ALL SELECT 3::BIGINT, j, edge FROM qe3""".stripMargin,

    "v_tree_quantile" ->
      s"""WITH ${treeChainSql(3, 16, 10,
           preamble = quantilePreambleSql(16) + ",\n", a1From = "fxq")}
        |SELECT node, kind, feature, bin, n, pos FROM tree""".stripMargin,

    "v_tree_train" ->
      s"""WITH ${treeChainSql(3, 16, 10)}
        |SELECT node, kind, feature, bin, n, pos FROM tree""".stripMargin,

    "v_tree_leaf_rate" ->
      s"""WITH ${treeChainSql(3, 16, 10)}
        |SELECT node AS leaf, count(*)::BIGINT AS n, sum(y)::BIGINT AS pos,
        |  CAST(round(sum(y)::DOUBLE * 1e6 / count(*)) AS BIGINT) AS rate_micro
        |FROM a4 GROUP BY node""".stripMargin,

    "r_als_factors" ->
      s"""WITH ${alsChainSql(3)}
        |SELECT 'u' AS side, id, f1 AS f1_micro, f2 AS f2_micro FROM p3
        |UNION ALL
        |SELECT 'i' AS side, id, f1 AS f1_micro, f2 AS f2_micro FROM q3"""
        .stripMargin,

    "r_als_recommend" ->
      s"""WITH ${alsChainSql(3)},
        |sc AS (
        |  SELECT u.id AS usr, i.id AS item,
        |    u.f1 * i.f1 + u.f2 * i.f2 AS score_micro2
        |  FROM p3 u CROSS JOIN q3 i
        |  WHERE NOT EXISTS (SELECT 1 FROM rat r
        |                    WHERE r.usr = u.id AND r.item = i.id)),
        |rk AS (
        |  SELECT usr, item, score_micro2,
        |    row_number() OVER (PARTITION BY usr
        |      ORDER BY score_micro2 DESC, item) AS rk
        |  FROM sc)
        |SELECT usr AS "user", item, score_micro2, rk
        |FROM rk WHERE rk <= 3""".stripMargin,

    // DTW oracle: the whole banded min-plus DP replayed ONE CELL PER
    // ITERATION in row-major order, carrying a ring buffer of the last
    // n+1 cells as LIST state (diag = ring[1], up = ring[2], left =
    // ring[n+1]); INF sentinel propagates band/boundary infeasibility.
    "x_dtw" ->
      """WITH RECURSIVE ev AS (
        |  SELECT event_type,
        |    epoch_us(ts::TIMESTAMP) // 86400000000 AS b
        |  FROM events),
        |refc AS (
        |  SELECT b, count(*)::BIGINT AS v FROM ev
        |  WHERE event_type = 'view' GROUP BY 1),
        |grid AS (SELECT b FROM refc),
        |yy AS (SELECT list(v ORDER BY b) AS ys, count(*)::INT AS n
        |  FROM refc),
        |gv AS (
        |  SELECT event_type AS key, b, count(*)::BIGINT AS v
        |  FROM ev GROUP BY 1, 2),
        |dense AS (
        |  SELECT k.key, g.b, coalesce(v.v, 0)::BIGINT AS v
        |  FROM (SELECT DISTINCT key FROM gv) k
        |  CROSS JOIN grid g
        |  LEFT JOIN gv v ON v.key = k.key AND v.b = g.b),
        |xx AS (
        |  SELECT key, list(v ORDER BY b) AS xs, count(*)::INT AS m
        |  FROM dense GROUP BY key),
        |rec AS (
        |  SELECT x.key, x.xs, y.ys, x.m, y.n, 0::BIGINT AS t,
        |    list_transform(range(0, y.n + 1),
        |      i -> 1000000000000000::BIGINT) AS ring
        |  FROM xx x, yy y
        |  UNION ALL
        |  SELECT key, xs, ys, m, n, t + 1,
        |    list_concat(ring[2:],
        |      [CASE WHEN abs((t // n + 1) - (t % n + 1)) > 3
        |            THEN 1000000000000000
        |        ELSE CASE WHEN (CASE
        |          WHEN t // n + 1 = 1 AND t % n + 1 = 1 THEN 0
        |          ELSE least(
        |            CASE WHEN t // n + 1 > 1 AND t % n + 1 > 1
        |                 THEN ring[1] ELSE 1000000000000000 END,
        |            CASE WHEN t // n + 1 > 1
        |                 THEN ring[2] ELSE 1000000000000000 END,
        |            CASE WHEN t % n + 1 > 1
        |                 THEN ring[n + 1] ELSE 1000000000000000 END)
        |          END) >= 1000000000000000 THEN 1000000000000000
        |        ELSE (CASE
        |          WHEN t // n + 1 = 1 AND t % n + 1 = 1 THEN 0
        |          ELSE least(
        |            CASE WHEN t // n + 1 > 1 AND t % n + 1 > 1
        |                 THEN ring[1] ELSE 1000000000000000 END,
        |            CASE WHEN t // n + 1 > 1
        |                 THEN ring[2] ELSE 1000000000000000 END,
        |            CASE WHEN t % n + 1 > 1
        |                 THEN ring[n + 1] ELSE 1000000000000000 END)
        |          END) + abs(xs[(t // n + 1)::INT] - ys[(t % n + 1)::INT])
        |        END
        |      END::BIGINT])
        |  FROM rec WHERE t < m::BIGINT * n)
        |SELECT key, m AS len,
        |  CASE WHEN ring[n + 1] >= 1000000000000000 THEN NULL
        |       ELSE ring[n + 1] END AS dtw,
        |  (CASE WHEN ring[n + 1] >= 1000000000000000 THEN NULL
        |        ELSE ring[n + 1] END)::DOUBLE
        |    / (m + n)::DOUBLE AS dtw_per_step
        |FROM rec WHERE t = m::BIGINT * n""".stripMargin,

    "x_assoc_rules" ->
      """WITH tx AS (
        |  SELECT DISTINCT user_id::VARCHAR || ':'
        |      || (epoch_us(ts::TIMESTAMP) // 86400000000)::VARCHAR AS bk,
        |    event_type AS it
        |  FROM events),
        |b AS (SELECT count(DISTINCT bk)::BIGINT AS n_baskets FROM tx),
        |items AS (SELECT it, count(*)::BIGINT AS n_it FROM tx GROUP BY 1),
        |pairs AS (
        |  SELECT x.it AS ia, y.it AS ib, count(*)::BIGINT AS n_both
        |  FROM tx x JOIN tx y ON x.bk = y.bk AND x.it < y.it
        |  GROUP BY 1, 2),
        |dir AS (
        |  SELECT ia AS antecedent, ib AS consequent, n_both FROM pairs
        |  UNION ALL SELECT ib, ia, n_both FROM pairs),
        |j AS (
        |  SELECT d.antecedent, d.consequent, b.n_baskets,
        |    a.n_it AS n_ante, c.n_it AS n_cons, d.n_both
        |  FROM dir d JOIN items a ON a.it = d.antecedent
        |    JOIN items c ON c.it = d.consequent, b)
        |SELECT antecedent, consequent, n_baskets, n_ante, n_cons, n_both,
        |  n_both::DOUBLE / n_baskets AS support,
        |  n_both::DOUBLE / n_ante AS confidence,
        |  n_both::DOUBLE * n_baskets / (n_ante::DOUBLE * n_cons) AS lift,
        |  round(n_both::DOUBLE / n_baskets
        |    - (n_ante::DOUBLE / n_baskets) * (n_cons::DOUBLE / n_baskets),
        |    6) AS leverage,
        |  CASE WHEN n_both <> n_ante THEN
        |    round((1.0 - n_cons::DOUBLE / n_baskets)
        |      / (1.0 - n_both::DOUBLE / n_ante), 6) END AS conviction
        |FROM j
        |WHERE n_both * 1000000 >= 140000 * n_baskets
        |  AND n_both * 1000000 >= 360000 * n_ante""".stripMargin,

    // E-process monitor: same micro log-LR integers baked from
    // Sequential.constants, so the weighted counts match by
    // construction; the only doubles died on the driver.
    "x_evalue" -> {
      val c = operators.Sequential.constants(0.35, 0.42, 0.05)
      s"""WITH census AS (
        |  SELECT user_id % 2 AS arm,
        |    epoch_us(ts::TIMESTAMP) // 3600000000 AS bucket,
        |    count(*)::BIGINT AS n,
        |    sum(CASE WHEN event_type IN ('click','purchase')
        |        THEN 1 ELSE 0 END)::BIGINT AS successes
        |  FROM events GROUP BY 1, 2),
        |cum AS (
        |  SELECT arm, bucket, n, successes,
        |    (sum(successes * ${c.winMicro}
        |         + (n - successes) * ${c.loseMicro})
        |       OVER (PARTITION BY arm ORDER BY bucket
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    )::BIGINT AS loge_micro
        |  FROM census)
        |SELECT arm, bucket, n, successes, loge_micro,
        |  max(CASE WHEN loge_micro >= ${c.threshMicro} THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY arm ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
        |    AS rejected
        |FROM cum""".stripMargin
    },

    "x_offpolicy" ->
      """WITH ol AS (
        |  SELECT
        |    (event_type = CASE WHEN user_id % 2 = 0 THEN 'click' ELSE 'view' END) AS m,
        |    (200000 + (user_id % 5) * 100000)::BIGINT AS p,
        |    CAST(round(value * 1e6) AS BIGINT) AS r
        |  FROM events),
        |ow AS (SELECT m, r, (2 * 1000000000000 + p) // (2 * p) AS w FROM ol),
        |oa AS (SELECT count(*)::BIGINT AS n,
        |    sum(CASE WHEN m THEN 1 ELSE 0 END)::BIGINT AS n_matched,
        |    sum(CASE WHEN m THEN w::HUGEINT * r ELSE 0 END) AS swr,
        |    sum(CASE WHEN m THEN w::HUGEINT ELSE 0 END) AS sw,
        |    sum(CASE WHEN m THEN w::HUGEINT * w ELSE 0 END) AS sww
        |  FROM ow)
        |SELECT n, n_matched,
        |  CASE WHEN n > 0 THEN round(swr::DOUBLE / n / 1e12, 6) END AS ips,
        |  CASE WHEN sw > 0 THEN round(swr::DOUBLE / sw::DOUBLE / 1e6, 6) END AS snips,
        |  CASE WHEN sww > 0 THEN
        |    round(sw::DOUBLE * sw::DOUBLE / sww::DOUBLE, 6) END AS ess
        |FROM oa""".stripMargin,

    "x_forecast_eval" ->
      """WITH fs AS (
        |  SELECT epoch_us(ts::TIMESTAMP) // 3600000000 AS t,
        |    count(*)::BIGINT AS y
        |  FROM events GROUP BY 1),
        |fse AS (
        |  SELECT count(*)::BIGINT AS n_seasonal, sum(abs(a.y - b.y)) AS ss
        |  FROM fs a JOIN fs b ON a.t = b.t + 24),
        |fne AS (
        |  SELECT count(*)::BIGINT AS n_naive, sum(abs(a.y - b.y)) AS sn
        |  FROM fs a JOIN fs b ON a.t = b.t + 1),
        |fn AS (SELECT count(*)::BIGINT AS n FROM fs)
        |SELECT n, n_seasonal, n_naive,
        |  CASE WHEN n_seasonal > 0 AND n_naive > 0 AND sn > 0 THEN
        |    round((ss::DOUBLE / n_seasonal) / (sn::DOUBLE / n_naive), 6)
        |  END AS mase
        |FROM fn CROSS JOIN fse CROSS JOIN fne""".stripMargin,

    "x_cuped" -> {
      def armVar(n: String, s: String, q: String): String =
        s"CASE WHEN $n >= 2 THEN ($n * $q - $s * $s)::DOUBLE " +
          s"/ ($n::DOUBLE * ($n::DOUBLE - 1.0)) END"
      def welchZ(sa: String, sb: String, va: String, vb: String): String =
        s"""CASE WHEN ($va) IS NOT NULL AND ($vb) IS NOT NULL
           |  AND ($va) / n_a + ($vb) / n_b > 0
           |THEN round(($sa::DOUBLE / n_a - $sb::DOUBLE / n_b)
           |  / sqrt(($va) / n_a + ($vb) / n_b), 6) END""".stripMargin
      def pooled(va: String, vb: String): String =
        s"""CASE WHEN ($va) IS NOT NULL AND ($vb) IS NOT NULL
           |THEN ((n_a - 1) * ($va) + (n_b - 1) * ($vb)) / (n_a + n_b - 2)
           |END""".stripMargin
      val vra = armVar("n_a", "sra", "qra"); val vrb = armVar("n_b", "srb", "qrb")
      val vaa = armVar("n_a", "saa", "qaa"); val vab = armVar("n_b", "sab", "qab")
      s"""WITH cu AS (
        |  SELECT user_id,
        |    sum(CASE WHEN event_id % 2 = 0
        |      THEN CAST(round(value * 1e6) AS BIGINT) ELSE 0 END)::BIGINT AS x,
        |    sum(CASE WHEN event_id % 2 = 1
        |      THEN CAST(round(value * 1e6) AS BIGINT) ELSE 0 END)::BIGINT AS y
        |  FROM events GROUP BY 1),
        |cub AS (SELECT (user_id % 2) AS arm, x, y FROM cu),
        |cp AS (SELECT count(*)::BIGINT AS n, sum(x) AS sx, sum(y) AS sy,
        |       sum(x::HUGEINT * y) AS sxy, sum(x::HUGEINT * x) AS sxx FROM cub),
        |cth AS (SELECT CASE WHEN n * sxx - sx * sx > 0
        |  THEN round((n * sxy - sx * sy)::DOUBLE
        |    / (n * sxx - sx * sx)::DOUBLE, 6)
        |  ELSE 0.0 END AS theta FROM cp),
        |cadj AS (SELECT arm, y,
        |  y - CAST(round(theta * x) AS BIGINT) AS yadj
        |  FROM cub CROSS JOIN cth),
        |cst AS (SELECT
        |    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
        |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b,
        |    sum(CASE WHEN arm = 0 THEN y END) AS sra,
        |    sum(CASE WHEN arm = 1 THEN y END) AS srb,
        |    sum(CASE WHEN arm = 0 THEN y::HUGEINT * y END) AS qra,
        |    sum(CASE WHEN arm = 1 THEN y::HUGEINT * y END) AS qrb,
        |    sum(CASE WHEN arm = 0 THEN yadj END) AS saa,
        |    sum(CASE WHEN arm = 1 THEN yadj END) AS sab,
        |    sum(CASE WHEN arm = 0 THEN yadj::HUGEINT * yadj END) AS qaa,
        |    sum(CASE WHEN arm = 1 THEN yadj::HUGEINT * yadj END) AS qab
        |  FROM cadj),
        |cz AS (
        |  SELECT n_a, n_b,
        |    ${welchZ("sra", "srb", vra, vrb)} AS z_raw,
        |    ${welchZ("saa", "sab", vaa, vab)} AS z_adj,
        |    ${pooled(vra, vrb)} AS vp_raw,
        |    ${pooled(vaa, vab)} AS vp_adj
        |  FROM cst)
        |SELECT n_a, n_b, (SELECT theta FROM cth) AS theta, z_raw, z_adj,
        |  CASE WHEN z_adj IS NOT NULL THEN
        |    round(least(1.0, 2.0 * (1.0 - ${normCdfSql("abs(z_adj)")})), 6)
        |  END AS p_adj,
        |  CASE WHEN vp_raw > 0 AND vp_adj IS NOT NULL
        |    THEN round(vp_adj / vp_raw, 6) END AS var_ratio
        |FROM cz""".stripMargin
    },

    "x_ab_test" ->
      """WITH u AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'click' AND value > 150.0 THEN 1 ELSE 0 END)::BIGINT AS converted,
        |    ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT % 2 AS arm
        |  FROM events GROUP BY user_id),
        |a AS (
        |  SELECT
        |    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
        |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)::BIGINT AS n_b,
        |    sum(CASE WHEN arm = 0 THEN converted ELSE 0 END)::BIGINT AS conv_a,
        |    sum(CASE WHEN arm = 1 THEN converted ELSE 0 END)::BIGINT AS conv_b
        |  FROM u)
        |SELECT n_a, n_b, conv_a, conv_b,
        |  CASE WHEN n_a > 0 AND n_b > 0
        |    AND sqrt(((conv_a + conv_b)::DOUBLE / (n_a + n_b))
        |      * (1.0 - (conv_a + conv_b)::DOUBLE / (n_a + n_b))
        |      * (1.0 / n_a + 1.0 / n_b)) > 0
        |  THEN round((conv_a::DOUBLE / n_a - conv_b::DOUBLE / n_b)
        |    / sqrt(((conv_a + conv_b)::DOUBLE / (n_a + n_b))
        |      * (1.0 - (conv_a + conv_b)::DOUBLE / (n_a + n_b))
        |      * (1.0 / n_a + 1.0 / n_b)), 6)
        |  END AS z
        |FROM a""".stripMargin,

    "x_moving_avg" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_us(ts::TIMESTAMP) AS ts_us,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |w AS (
        |  SELECT event_id, user_id,
        |    count(*) OVER win AS n_window,
        |    sum(cents) OVER win AS sum_cents
        |  FROM ev
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts_us
        |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, n_window,
        |  round(sum_cents::DOUBLE / n_window / 100.0, 6) AS avg_1h
        |FROM w""".stripMargin,

    "x_ewma" ->
      """WITH RECURSIVE s AS (
        |  SELECT user_id AS key, epoch_us(ts::TIMESTAMP) AS ts_us, event_id,
        |    CAST(round(value * 1e6) AS BIGINT) AS x,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |r AS (
        |  SELECT key, rn, ts_us, event_id, x, x AS sm FROM s WHERE rn = 1
        |  UNION ALL
        |  SELECT s.key, s.rn, s.ts_us, s.event_id, s.x,
        |    (300000 * s.x + 700000 * r.sm) // 1000000
        |  FROM r JOIN s ON s.key = r.key AND s.rn = r.rn + 1)
        |SELECT key, rn, ts_us, event_id, x AS value_micro, sm AS ewma_micro,
        |  round(sm::DOUBLE / 1e6, 6) AS ewma
        |FROM r""".stripMargin,

    "t_quantile_norm" ->
      """WITH base AS (
        |  SELECT doc_id AS id, lang, n_chars AS v FROM documents),
        |ranked AS (
        |  SELECT id, lang, v,
        |    row_number() OVER (PARTITION BY lang ORDER BY v ASC, id ASC)::BIGINT AS r,
        |    count(*) OVER (PARTITION BY lang)::BIGINT AS m
        |  FROM base),
        |h AS (
        |  SELECT least(greatest(floor((n_chars - 0.0) / 10.0), 0), 63)::BIGINT AS bucket,
        |    count(*)::BIGINT AS cnt
        |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
        |c AS (
        |  SELECT bucket, cnt,
        |    sum(cnt) OVER (ORDER BY bucket) AS cum,
        |    sum(cnt) OVER () AS n
        |  FROM h)
        |SELECT id, lang, v, round(r::DOUBLE / m, 6) AS q,
        |  round(0.0 + bucket * 10.0 +
        |    10.0 * (ceil(r::DOUBLE / m * n) - (cum - cnt)) / cnt, 6) AS qnorm
        |FROM ranked JOIN c
        |  ON cum >= ceil(r::DOUBLE / m * n)
        |  AND (cum - cnt) < ceil(r::DOUBLE / m * n)""".stripMargin,

    "t_homoglyph" ->
      s"""WITH spoof AS (
        |  SELECT doc_id + 1000000 AS doc_id,
        |    translate(text, 'aeo', 'аео') AS text
        |  FROM documents WHERE doc_id % 5 = 0),
        |corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id, text FROM spoof),
        |k AS (
        |  SELECT doc_id, text,
        |    md5(translate(text, '${operators.Homoglyph.confusablesFrom}', '${operators.Homoglyph.confusablesTo}')) AS skel_digest
        |  FROM corpus WHERE text IS NOT NULL)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.skel_digest
        |FROM k a JOIN k b ON a.skel_digest = b.skel_digest
        |  AND a.doc_id < b.doc_id AND a.text <> b.text""".stripMargin,

    "f_sql_md5prefix" ->
      """SELECT doc_id,
        |  ('0x' || substr(md5(coalesce(text, '')), 1, 15))::BIGINT AS u
        |FROM documents""".stripMargin,

    "x_kaplan_meier" ->
      """WITH RECURSIVE u AS (
        |  SELECT user_id, min(epoch_us(ts::TIMESTAMP))::BIGINT AS f,
        |    max(epoch_us(ts::TIMESTAMP))::BIGINT AS l
        |  FROM events GROUP BY 1),
        |obs AS (
        |  SELECT user_id, (l - f) // 86400000000 AS t_days,
        |    l < (SELECT max(l) FROM u) - 86400000000 AS churned
        |  FROM u),
        |byday AS (
        |  SELECT t_days, count(*)::BIGINT AS n_users,
        |    sum(CASE WHEN churned THEN 1 ELSE 0 END)::BIGINT AS d
        |  FROM obs GROUP BY 1),
        |risk AS (
        |  SELECT t_days, d,
        |    sum(n_users) OVER (ORDER BY t_days DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS n_risk
        |  FROM byday),
        |ev AS (
        |  SELECT t_days, n_risk, d,
        |    row_number() OVER (ORDER BY t_days ASC)::BIGINT AS rn
        |  FROM risk WHERE d > 0),
        |r AS (
        |  SELECT t_days, n_risk, d, rn,
        |    (1000000 * (n_risk - d)) // n_risk AS s
        |  FROM ev WHERE rn = 1
        |  UNION ALL
        |  SELECT e.t_days, e.n_risk, e.d, e.rn,
        |    (r.s * (e.n_risk - e.d)) // e.n_risk
        |  FROM r JOIN ev e ON e.rn = r.rn + 1)
        |SELECT t_days, n_risk, d, s AS s_micro,
        |  round(s::DOUBLE / 1e6, 6) AS s
        |FROM r""".stripMargin,

    "k_gini" ->
      """WITH c AS (
        |  SELECT source AS g, count(*)::BIGINT AS cnt FROM documents GROUP BY 1),
        |r AS (
        |  SELECT g, cnt,
        |    row_number() OVER (ORDER BY cnt ASC, g ASC)::BIGINT AS i
        |  FROM c)
        |SELECT count(*)::BIGINT AS n_groups, sum(cnt)::BIGINT AS total,
        |  round(2.0 * sum(i * cnt) / (count(*) * sum(cnt))
        |    - (count(*) + 1)::DOUBLE / count(*), 6) AS gini
        |FROM r""".stripMargin,

    "k_benford" -> {
      val pcase = operators.Benford.expectedMicro.toSeq.sortBy(_._1)
        .map { case (d, p) => s"WHEN $d THEN $p" }.mkString(" ")
      s"""WITH v AS (
        |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v
        |  FROM lineitem),
        |pos AS (
        |  SELECT CAST(substr(v::VARCHAR, 1, 1) AS INT) AS digit
        |  FROM v WHERE v > 0),
        |census AS (SELECT digit, count(*)::BIGINT AS n FROM pos GROUP BY 1),
        |dense AS (
        |  SELECT d.digit, coalesce(c.n, 0)::BIGINT AS n
        |  FROM (SELECT unnest(range(1, 10))::INT AS digit) d
        |  LEFT JOIN census c USING (digit)),
        |exc AS (
        |  SELECT sum(CASE WHEN v <= 0 OR v IS NULL THEN 1 ELSE 0 END
        |    )::BIGINT AS n_excluded
        |  FROM v),
        |tot AS (SELECT sum(n)::BIGINT AS n_total FROM dense),
        |tm AS (
        |  SELECT digit, n, t.n_total, e.n_excluded,
        |    (CASE digit $pcase END)::BIGINT AS p_exp_micro,
        |    t.n_total * (CASE digit $pcase END)::BIGINT AS e_micro,
        |    CASE WHEN t.n_total * (CASE digit $pcase END) > 0 THEN
        |      CAST(round(
        |        ((n * 1000000 - t.n_total * (CASE digit $pcase END)
        |         )::HUGEINT
        |         * (n * 1000000 - t.n_total * (CASE digit $pcase END))
        |        )::DOUBLE
        |        / (t.n_total * (CASE digit $pcase END))::DOUBLE)
        |      AS BIGINT) END AS term_micro
        |  FROM dense, tot t, exc e)
        |SELECT digit, n, n_total, n_excluded, p_exp_micro, e_micro,
        |  term_micro::DOUBLE / 1000000.0 AS chi2_term,
        |  (sum(term_micro) OVER ())::DOUBLE / 1000000.0 AS chi2
        |FROM tm""".stripMargin
    },

    "x_did" ->
      s"""WITH b AS (
        |  SELECT CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS g,
        |    CASE WHEN epoch_us(ts::TIMESTAMP) >= 1705363200000000
        |      THEN 1 ELSE 0 END AS p,
        |    CAST(round(value * 100) AS BIGINT) AS y
        |  FROM events),
        |c AS (
        |  SELECT g, p, count(*)::BIGINT AS n,
        |    sum(y::HUGEINT) AS s, sum(y::HUGEINT * y) AS q
        |  FROM b GROUP BY 1, 2),
        |r AS (
        |  SELECT
        |    max(CASE WHEN g=0 AND p=0 THEN n END) AS n_c0,
        |    max(CASE WHEN g=0 AND p=1 THEN n END) AS n_c1,
        |    max(CASE WHEN g=1 AND p=0 THEN n END) AS n_t0,
        |    max(CASE WHEN g=1 AND p=1 THEN n END) AS n_t1,
        |    max(CASE WHEN g=0 AND p=0 THEN s END) AS s_c0,
        |    max(CASE WHEN g=0 AND p=1 THEN s END) AS s_c1,
        |    max(CASE WHEN g=1 AND p=0 THEN s END) AS s_t0,
        |    max(CASE WHEN g=1 AND p=1 THEN s END) AS s_t1,
        |    max(CASE WHEN g=0 AND p=0 THEN q END) AS q_c0,
        |    max(CASE WHEN g=0 AND p=1 THEN q END) AS q_c1,
        |    max(CASE WHEN g=1 AND p=0 THEN q END) AS q_t0,
        |    max(CASE WHEN g=1 AND p=1 THEN q END) AS q_t1
        |  FROM c),
        |m AS (
        |  SELECT n_c0, n_c1, n_t0, n_t1,
        |    CAST(round(s_c0::DOUBLE * 1000000.0 / n_c0::DOUBLE) AS BIGINT) AS m_c0,
        |    CAST(round(s_c1::DOUBLE * 1000000.0 / n_c1::DOUBLE) AS BIGINT) AS m_c1,
        |    CAST(round(s_t0::DOUBLE * 1000000.0 / n_t0::DOUBLE) AS BIGINT) AS m_t0,
        |    CAST(round(s_t1::DOUBLE * 1000000.0 / n_t1::DOUBLE) AS BIGINT) AS m_t1,
        |    CASE WHEN n_c0 >= 2 THEN (n_c0::HUGEINT * q_c0 - s_c0 * s_c0)::DOUBLE
        |      / (n_c0::DOUBLE * (n_c0::DOUBLE - 1.0)) END AS v_c0,
        |    CASE WHEN n_c1 >= 2 THEN (n_c1::HUGEINT * q_c1 - s_c1 * s_c1)::DOUBLE
        |      / (n_c1::DOUBLE * (n_c1::DOUBLE - 1.0)) END AS v_c1,
        |    CASE WHEN n_t0 >= 2 THEN (n_t0::HUGEINT * q_t0 - s_t0 * s_t0)::DOUBLE
        |      / (n_t0::DOUBLE * (n_t0::DOUBLE - 1.0)) END AS v_t0,
        |    CASE WHEN n_t1 >= 2 THEN (n_t1::HUGEINT * q_t1 - s_t1 * s_t1)::DOUBLE
        |      / (n_t1::DOUBLE * (n_t1::DOUBLE - 1.0)) END AS v_t1
        |  FROM r),
        |dd AS (
        |  SELECT *, (m_t1 - m_t0) - (m_c1 - m_c0) AS did_micro,
        |    sqrt(v_c0 / n_c0 + v_c1 / n_c1 + v_t0 / n_t0 + v_t1 / n_t1)
        |      AS se_raw
        |  FROM m),
        |zz AS (
        |  SELECT *, CASE WHEN se_raw > 0 THEN
        |    round(did_micro::DOUBLE / 1000000.0 / se_raw, 6) END AS z
        |  FROM dd)
        |SELECT n_c0, n_c1, n_t0, n_t1, m_c0, m_c1, m_t0, m_t1, did_micro,
        |  round(se_raw, 6) AS se, z,
        |  CASE WHEN z IS NOT NULL THEN
        |    round(least(1.0, 2.0 * (1.0 - ${normCdfSql("abs(z)")})), 6)
        |  END AS p_value
        |FROM zz""".stripMargin,

    "k_entropy" ->
      """WITH c AS (
        |  SELECT lang AS g, count(*)::BIGINT AS cnt FROM documents GROUP BY 1),
        |tot AS (SELECT sum(cnt)::BIGINT AS s, count(*)::BIGINT AS n FROM c),
        |t AS (
        |  SELECT n, s,
        |    CAST(round(-(cnt::DOUBLE / s) * ln(cnt::DOUBLE / s) * 1e6) AS BIGINT) AS tm
        |  FROM c, tot)
        |SELECT n AS n_groups, s AS total,
        |  round(sum(tm)::DOUBLE / 1e6, 6) AS entropy_nats,
        |  CASE WHEN n > 1 THEN round(sum(tm)::DOUBLE / 1e6 / ln(n::DOUBLE), 6) END AS entropy_norm
        |FROM t GROUP BY n, s""".stripMargin,

    "k_coverage" ->
      """WITH c AS (
        |  SELECT source AS g, count(*)::BIGINT AS cnt FROM documents GROUP BY 1),
        |r AS (
        |  SELECT g, cnt,
        |    row_number() OVER (ORDER BY cnt DESC, g ASC)::BIGINT AS rank,
        |    sum(cnt) OVER (ORDER BY cnt DESC, g ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum
        |  FROM c)
        |SELECT rank, g, cnt,
        |  round(cum::DOUBLE / (SELECT sum(cnt) FROM c), 6) AS cum_share
        |FROM r WHERE rank <= 20""".stripMargin,

    "x_journeys" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    lag(event_type, 2) OVER w AS t1,
        |    lag(event_type, 1) OVER w AS t2,
        |    event_type AS t3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id)),
        |census AS (
        |  SELECT t1, t2, t3, count(*)::BIGINT AS n
        |  FROM e WHERE t1 IS NOT NULL GROUP BY 1, 2, 3)
        |SELECT t1, t2, t3, n,
        |  round(n::DOUBLE / (SELECT sum(n) FROM census), 6) AS share
        |FROM census""".stripMargin,

    "x_theilsen" ->
      """WITH c AS (
        |  SELECT epoch_us(ts::TIMESTAMP) // 3600000000 AS bucket,
        |    count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1),
        |sl AS (
        |  SELECT a.bucket AS bi, b.bucket AS bj,
        |    (b.cnt - a.cnt)::DOUBLE / (b.bucket - a.bucket) AS slope
        |  FROM c a JOIN c b ON b.bucket > a.bucket),
        |rs AS (
        |  SELECT slope,
        |    row_number() OVER (ORDER BY slope ASC, bi ASC, bj ASC)::BIGINT AS r,
        |    count(*) OVER ()::BIGINT AS n
        |  FROM sl),
        |med AS (
        |  SELECT n AS n_pairs, slope FROM rs
        |  WHERE r = CAST(ceil(n / 2.0) AS BIGINT)),
        |res AS (
        |  SELECT c.cnt::DOUBLE - (SELECT slope FROM med) * c.bucket AS res
        |  FROM c),
        |rr AS (
        |  SELECT res,
        |    row_number() OVER (ORDER BY res ASC)::BIGINT AS r,
        |    count(*) OVER ()::BIGINT AS n
        |  FROM res)
        |SELECT (SELECT n_pairs FROM med) AS n_pairs,
        |  round((SELECT slope FROM med), 6) AS slope,
        |  round(res, 6) AS intercept
        |FROM rr WHERE r = CAST(ceil(n / 2.0) AS BIGINT)""".stripMargin,

    "x_autocorr" ->
      """WITH c AS (
        |  SELECT epoch_us(ts::TIMESTAMP) // 3600000000 AS bucket,
        |    count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1),
        |tot AS (
        |  SELECT count(*)::BIGINT AS n, sum(cnt)::BIGINT AS s,
        |    sum(cnt * cnt)::BIGINT AS sq
        |  FROM c),
        |lagk AS (
        |  SELECT k, count(*)::BIGINT AS m,
        |    sum(a.cnt * b.cnt)::BIGINT AS sxy,
        |    sum(a.cnt)::BIGINT AS sh, sum(b.cnt)::BIGINT AS st
        |  FROM (SELECT unnest([1, 2, 3, 4]) AS k) lags
        |  JOIN c a ON true
        |  JOIN c b ON b.bucket = a.bucket + k
        |  GROUP BY k)
        |SELECT k::BIGINT AS lag, m AS n_terms,
        |  round((n * n * sxy - n * s * (sh + st) + m * s * s)::DOUBLE /
        |        (n * n * sq - n * s * s), 6) AS r
        |FROM lagk, tot""".stripMargin,

    "x_changepoint" ->
      """WITH c AS (
        |  SELECT epoch_us(ts::TIMESTAMP) // 3600000000 AS bucket,
        |    count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1),
        |p AS (
        |  SELECT bucket, cnt,
        |    row_number() OVER (ORDER BY bucket)::BIGINT AS i,
        |    coalesce(sum(cnt) OVER (ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS sl,
        |    count(*) OVER ()::BIGINT AS n,
        |    sum(cnt) OVER ()::BIGINT AS s
        |  FROM c),
        |sc AS (
        |  SELECT bucket, i - 1 AS nl, n - (i - 1) AS nr, sl, s - sl AS sr, n
        |  FROM p WHERE i - 1 >= 2 AND n - (i - 1) >= 2),
        |f AS (
        |  SELECT bucket, nl, nr, sl, sr, n, (nl * sr - nr * sl) AS d FROM sc),
        |r AS (
        |  SELECT bucket, nl, nr, sl, sr, n, d,
        |    row_number() OVER (
        |      ORDER BY round(d::DOUBLE * d / (nl * nr) / n, 6) DESC, bucket ASC) AS rk
        |  FROM f)
        |SELECT bucket AS split_bucket, nl AS n_left, nr AS n_right,
        |  round(sl::DOUBLE / nl, 6) AS mean_left,
        |  round(sr::DOUBLE / nr, 6) AS mean_right,
        |  round(d::DOUBLE * d / (nl * nr) / n, 6) AS score
        |FROM r WHERE rk = 1""".stripMargin,

    "x_bootstrap" ->
      s"""WITH ${bootstrapChainSql(40, 42L)}
        |SELECT b, n_eff, sum_micro, mean FROM m""".stripMargin,

    "x_bootstrap_by" -> {
      val ladder = operators.Bootstrap.thresholds.zipWithIndex
        .map { case (c, k) => s"WHEN u < $c THEN $k" }.mkString(" ")
      s"""WITH base AS (
        |  SELECT event_type AS g, event_id::VARCHAR AS k,
        |    CAST(round(value * 1e6) AS BIGINT) AS x
        |  FROM events),
        |reps AS (
        |  SELECT g, k, x, b FROM base CROSS JOIN (SELECT unnest(range(20)) AS b)),
        |wts AS (
        |  SELECT g, b, x, (CASE $ladder ELSE 9 END)::BIGINT AS w
        |  FROM (
        |    SELECT g, b, x,
        |      (('0x' || substr(md5('boot:42:' || b::VARCHAR || ':' || k), 1, 15))::BIGINT + 0.5)
        |        / 1.152921504606846976e18 AS u
        |    FROM reps))
        |SELECT g, b::BIGINT AS b, sum(w)::BIGINT AS n_eff,
        |  sum(w * x)::BIGINT AS sum_micro,
        |  round(sum(w * x)::DOUBLE / sum(w) / 1e6, 6) AS mean
        |FROM wts GROUP BY 1, 2""".stripMargin
    },

    "x_bootstrap_ci" ->
      s"""WITH ${bootstrapChainSql(40, 42L)},
        |ranked AS (
        |  SELECT mean, row_number() OVER (ORDER BY mean ASC, b ASC) AS r
        |  FROM m),
        |fullm AS (
        |  SELECT round(sum(x)::DOUBLE / count(*) / 1e6, 6) AS mean_full
        |  FROM base)
        |SELECT (SELECT count(*) FROM ranked)::BIGINT AS n_replicates,
        |  mean_full,
        |  (SELECT mean FROM ranked WHERE r = 1) AS ci_lo,
        |  (SELECT mean FROM ranked WHERE r = 39) AS ci_hi
        |FROM fullm""".stripMargin,

    // independent dominance formulation — NOT the Spark side's census
    // trick — so a census-logic bug hash-fails here
    "x_pareto" ->
      """WITH b AS (
        |  SELECT o_orderkey AS id, CAST(round(o_totalprice * 100) AS BIGINT) AS x,
        |    epoch_us(o_orderdate::TIMESTAMP) // 86400000000 AS y
        |  FROM orders)
        |SELECT id, x, y FROM b t
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM b o
        |  WHERE o.x >= t.x AND o.y >= t.y AND (o.x > t.x OR o.y > t.y))
        |ORDER BY x""".stripMargin,

    "a18_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  grouping(o_orderstatus) AS g_status,
        |  grouping(o_orderpriority) AS g_prio
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
        |  (o_orderstatus, o_orderpriority))""".stripMargin,

    "x_rate_anomaly" ->
      """WITH census AS (
        |  SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS window_start,
        |    event_type, count(*)::BIGINT AS n
        |  FROM events GROUP BY 1, 2),
        |stats AS (
        |  SELECT event_type, count(*)::BIGINT AS nw, sum(n)::BIGINT AS s1,
        |    sum(n * n)::BIGINT AS s2
        |  FROM census GROUP BY event_type),
        |j AS (
        |  SELECT c.window_start, c.event_type, c.n,
        |    s.s1::DOUBLE / s.nw AS m,
        |    (s.s2::DOUBLE - s.s1::DOUBLE * s.s1 / s.nw) / s.nw AS vr
        |  FROM census c JOIN stats s USING (event_type))
        |SELECT window_start, event_type, n, round(m, 6) AS mean,
        |  CASE WHEN vr > 0 THEN round((n - m) / sqrt(vr), 6) END AS z,
        |  coalesce(abs(n - m) > 2.0 * sqrt(vr) AND vr > 0, false) AS anomaly
        |FROM j""".stripMargin,

    "e_nearest_centroid" ->
      """WITH tr AS (
        |  SELECT label, embedding FROM embeddings WHERE vec_id % 2 = 0),
        |cen0 AS (
        |  SELECT label, pos,
        |    sum(CAST(round(x * 1e6) AS BIGINT)) AS s_micro, count(*) AS n
        |  FROM (SELECT label, generate_subscripts(embedding, 1) AS pos,
        |          unnest(embedding::DOUBLE[]) AS x FROM tr)
        |  GROUP BY label, pos),
        |cen AS (
        |  SELECT label,
        |    list(CAST(round(s_micro::DOUBLE / n) AS BIGINT)::DOUBLE / 1e6
        |         ORDER BY pos) AS cv
        |  FROM cen0 GROUP BY label),
        |v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
        |      WHERE vec_id % 2 = 1),
        |scored AS (
        |  SELECT v.vec_id, c.label,
        |    list_dot_product(cv, cv) - 2 * list_dot_product(ev, cv) AS sc
        |  FROM v CROSS JOIN cen c),
        |ranked AS (
        |  SELECT vec_id, label,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY sc ASC, label ASC) AS rn
        |  FROM scored)
        |SELECT vec_id, label AS pred_label FROM ranked WHERE rn = 1""".stripMargin,

    "e_silhouette" ->
      """WITH cen AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
        |             FROM embeddings WHERE vec_id < 16),
        |v AS (SELECT vec_id, embedding::DOUBLE[] AS ev,
        |        list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS dv2
        |      FROM embeddings),
        |scored AS (
        |  SELECT v.vec_id, v.dv2, c.cid,
        |    list_dot_product(cv, cv) - 2 * list_dot_product(ev, cv) AS sc
        |  FROM v CROSS JOIN cen c),
        |ranked AS (
        |  SELECT vec_id, dv2, cid, sc,
        |    row_number() OVER (PARTITION BY vec_id ORDER BY sc ASC, cid ASC) AS rn
        |  FROM scored),
        |pp AS (
        |  SELECT a.vec_id, CAST(a.cid AS INT) AS cluster_id,
        |    sqrt(greatest(a.dv2 + a.sc, 0)) AS d1,
        |    sqrt(greatest(b.dv2 + b.sc, 0)) AS d2
        |  FROM ranked a JOIN ranked b ON b.vec_id = a.vec_id
        |    AND a.rn = 1 AND b.rn = 2),
        |sm AS (
        |  SELECT cluster_id,
        |    CASE WHEN greatest(d1, d2) = 0 THEN 0
        |         ELSE CAST(round((d2 - d1) / greatest(d1, d2) * 1e6) AS BIGINT)
        |    END AS s_micro
        |  FROM pp)
        |SELECT cluster_id, count(*)::BIGINT AS n,
        |  round(sum(s_micro)::DOUBLE / count(*) / 1e6, 6) AS mean_sil
        |FROM sm GROUP BY cluster_id""".stripMargin,

    "g_assortativity" ->
      """WITH e0raw AS (
        |  SELECT doc_id AS src, (doc_id * 7 + 3) % 409 AS dst FROM documents
        |  UNION ALL SELECT doc_id, (doc_id // 10) * 10 FROM documents),
        |sym AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
        |  SELECT src, dst FROM e0raw WHERE src <> dst
        |  UNION ALL SELECT dst, src FROM e0raw WHERE src <> dst)),
        |deg AS (SELECT src AS node, count(*)::BIGINT AS d FROM sym GROUP BY src),
        |sc AS (
        |  SELECT dx.d AS dx, dy.d AS dy
        |  FROM sym s JOIN deg dx ON dx.node = s.src JOIN deg dy ON dy.node = s.dst),
        |a AS (
        |  SELECT count(*)::BIGINT AS m, sum(dx)::BIGINT AS s1,
        |    sum(dx * dx)::BIGINT AS s2, sum(dx * dy)::BIGINT AS sxy
        |  FROM sc)
        |SELECT m, s1, s2, sxy,
        |  CASE WHEN (m * s2 - s1 * s1) = 0 THEN NULL
        |       ELSE round((m * sxy - s1 * s1)::DOUBLE / (m * s2 - s1 * s1)::DOUBLE, 6)
        |  END AS r
        |FROM a""".stripMargin,

    "k_winsorize" ->
      """WITH h AS (
        |  SELECT least(greatest(floor((l_extendedprice - 900.0) / 1626.5625), 0), 63)::BIGINT AS bucket,
        |    count(*) AS cnt
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1),
        |c AS (
        |  SELECT bucket, cnt,
        |    sum(cnt) OVER (ORDER BY bucket) AS cum,
        |    sum(cnt) OVER () AS n
        |  FROM h),
        |probes AS (SELECT unnest([0.05, 0.95])::DOUBLE AS q),
        |q2 AS (
        |  SELECT q,
        |    round(900.0 + bucket * 1626.5625 +
        |          1626.5625 * (ceil(q * n) - (cum - cnt)) / cnt, 6) AS qtile
        |  FROM c CROSS JOIN probes
        |  WHERE cum >= ceil(q * n) AND (cum - cnt) < ceil(q * n)),
        |b AS (
        |  SELECT max(CASE WHEN q = 0.05 THEN qtile END) AS blo,
        |         max(CASE WHEN q = 0.95 THEN qtile END) AS bhi
        |  FROM q2)
        |SELECT l_orderkey, l_partkey, l_suppkey,
        |  CASE WHEN l_extendedprice IS NULL THEN NULL
        |       ELSE round(least(greatest(l_extendedprice::DOUBLE, blo), bhi), 6)
        |  END AS clipped,
        |  blo AS clip_lo, bhi AS clip_hi
        |FROM lineitem CROSS JOIN b""".stripMargin,

    "v_orphans" ->
      """SELECT 'clean' AS "case",
        |  (SELECT count(*) FROM lineitem l LEFT JOIN orders o
        |     ON o.o_orderkey = l.l_orderkey
        |   WHERE o.o_orderkey IS NULL AND l.l_orderkey IS NOT NULL)::BIGINT AS n_orphans
        |UNION ALL
        |SELECT 'planted',
        |  (SELECT count(*) FROM (
        |     SELECT l_orderkey FROM lineitem
        |     UNION ALL
        |     SELECT l_orderkey + 2000000000 FROM lineitem WHERE l_orderkey % 1000 = 0) l
        |   LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
        |   WHERE o.o_orderkey IS NULL AND l.l_orderkey IS NOT NULL)::BIGINT""".stripMargin,

    "g_kcore" ->
      s"""WITH ${kCoreChainSql(3, 20)}
        |SELECT src AS node, count(*)::BIGINT AS core_degree
        |FROM e20 GROUP BY src HAVING count(*) >= 3""".stripMargin,

    // a<b<c triangle enumeration (each triangle once), credited to all
    // three corners — equivalent by construction to the Spark side's
    // degree-ordered pivot enumeration
    "g_walks" ->
      s"""WITH $randomWalkChainSql
        |${randomWalkUnionSql}""".stripMargin,

    "g_deepwalk_pairs" ->
      s"""WITH $randomWalkChainSql,
        |wall AS (
        |${randomWalkUnionSql.linesIterator.map("  " + _).mkString("\n")}),
        |wsent AS (
        |  SELECT start * 10 + wid AS doc_id, step AS pos,
        |    node::VARCHAR AS term
        |  FROM wall)
        |SELECT a.term AS center, b.term AS context,
        |  count(*)::BIGINT AS n_pairs,
        |  sum(CAST(round(1000000.0 / abs(b.pos - a.pos)) AS BIGINT)
        |    )::BIGINT AS x_micro
        |FROM wsent a JOIN wsent b
        |  ON a.doc_id = b.doc_id AND a.pos <> b.pos
        |  AND abs(b.pos - a.pos) <= 2
        |GROUP BY 1, 2""".stripMargin,

    "g_linkpred_auc" ->
      """WITH mx AS (SELECT max(doc_id) AS m FROM documents),
        |e0 AS (
        |  SELECT doc_id AS src, doc_id + 1 AS dst FROM documents
        |  UNION ALL SELECT doc_id, doc_id + 2 FROM documents
        |  UNION ALL SELECT doc_id, doc_id + 3 FROM documents
        |  UNION ALL SELECT doc_id, doc_id + 4 FROM documents),
        |und AS (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM e0, mx WHERE src <> dst AND dst <= mx.m),
        |tst AS (SELECT * FROM und WHERE (a + b) % 5 = 0),
        |trn AS (SELECT * FROM und WHERE (a + b) % 5 <> 0),
        |nbrs AS (
        |  SELECT a AS w, b AS n FROM trn UNION ALL SELECT b, a FROM trn),
        |wts AS (
        |  SELECT w, count(*)::BIGINT AS degree,
        |    CAST(round(1000000.0 / ln(count(*))) AS BIGINT) AS w_micro
        |  FROM nbrs GROUP BY w
        |  HAVING count(*) >= 2 AND count(*) <= 65536),
        |nb AS (SELECT n.w, n.n, t.w_micro FROM nbrs n JOIN wts t USING (w)),
        |cand AS (
        |  SELECT x.n AS a, y.n AS b, x.w_micro
        |  FROM nb x JOIN nb y ON x.w = y.w AND x.n < y.n),
        |sc AS (
        |  SELECT a, b, sum(w_micro)::BIGINT AS aa_micro
        |  FROM cand GROUP BY a, b),
        |pred AS (
        |  SELECT s.a, s.b, s.aa_micro
        |  FROM sc s LEFT JOIN trn u ON u.a = s.a AND u.b = s.b
        |  WHERE u.a IS NULL),
        |lab AS (
        |  SELECT coalesce(p.aa_micro, 0)::BIGINT AS sm,
        |    (t.a IS NOT NULL) AS label
        |  FROM pred p FULL JOIN tst t ON t.a = p.a AND t.b = p.b),
        |cen AS (
        |  SELECT sm,
        |    sum(CASE WHEN label THEN 1 ELSE 0 END)::BIGINT AS n_pos,
        |    sum(CASE WHEN label THEN 0 ELSE 1 END)::BIGINT AS n_neg
        |  FROM lab GROUP BY 1),
        |cum AS (
        |  SELECT *, coalesce(sum(n_neg) OVER (ORDER BY sm ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |    AS cumneg_below
        |  FROM cen)
        |SELECT sum(n_pos)::BIGINT AS n_pos, sum(n_neg)::BIGINT AS n_neg,
        |  CASE WHEN sum(n_pos) > 0 AND sum(n_neg) > 0 THEN
        |    round(sum(n_pos * (2 * cumneg_below + n_neg))::DOUBLE
        |      / (2.0 * sum(n_pos) * sum(n_neg)), 6) END AS auc
        |FROM cum""".stripMargin,

    "g_adamic_adar" ->
      """WITH e0 AS (
        |  SELECT doc_id AS src, (doc_id * 7 + 3) % 409 AS dst FROM documents
        |  UNION ALL SELECT doc_id, (doc_id // 10) * 10 FROM documents),
        |und AS (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM e0 WHERE src <> dst),
        |nbrs AS (
        |  SELECT a AS w, b AS n FROM und UNION ALL SELECT b, a FROM und),
        |wts AS (
        |  SELECT w, count(*)::BIGINT AS degree,
        |    CAST(round(1000000.0 / ln(count(*))) AS BIGINT) AS w_micro
        |  FROM nbrs GROUP BY w
        |  HAVING count(*) >= 2 AND count(*) <= 65536),
        |nb AS (SELECT n.w, n.n, t.w_micro FROM nbrs n JOIN wts t USING (w)),
        |cand AS (
        |  SELECT x.n AS a, y.n AS b, x.w_micro
        |  FROM nb x JOIN nb y ON x.w = y.w AND x.n < y.n),
        |sc AS (
        |  SELECT a, b, count(*)::BIGINT AS cn,
        |    sum(w_micro)::BIGINT AS aa_micro
        |  FROM cand GROUP BY a, b)
        |SELECT s.a, s.b, s.cn, s.aa_micro,
        |  s.aa_micro::DOUBLE / 1000000.0 AS aa
        |FROM sc s LEFT JOIN und u ON u.a = s.a AND u.b = s.b
        |WHERE u.a IS NULL""".stripMargin,

    "g_triangles" ->
      """WITH e0 AS (
        |  SELECT doc_id AS src, (doc_id * 7 + 3) % 409 AS dst FROM documents
        |  UNION ALL SELECT doc_id, (doc_id // 10) * 10 FROM documents),
        |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM e0 WHERE src <> dst),
        |deg AS (SELECT node, count(*)::BIGINT AS degree FROM (
        |  SELECT a AS node FROM und UNION ALL SELECT b FROM und) GROUP BY node),
        |tris AS (
        |  SELECT u1.a AS x, u1.b AS y, u2.b AS z
        |  FROM und u1 JOIN und u2 ON u2.a = u1.b
        |  JOIN und u3 ON u3.a = u1.a AND u3.b = u2.b),
        |pern AS (SELECT node, count(*)::BIGINT AS t FROM (
        |  SELECT x AS node FROM tris UNION ALL SELECT y FROM tris
        |  UNION ALL SELECT z FROM tris) GROUP BY node)
        |SELECT d.node, d.degree, coalesce(p.t, 0) AS triangles,
        |  CASE WHEN d.degree >= 2
        |    THEN round(2.0 * coalesce(p.t, 0) / (d.degree * (d.degree - 1)), 6)
        |  END AS coeff
        |FROM deg d LEFT JOIN pern p ON p.node = d.node""".stripMargin,

    // sessionization chain (the a15 window recipe) + item extraction +
    // marathon cap + pair census + per-item ranking
    "x_covisitation" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_us(ts::TIMESTAMP) AS ts_us,
        |    json_extract_string(props, '$.k')::BIGINT AS item
        |  FROM events),
        |brk AS (
        |  SELECT event_id, user_id, ts_us, item,
        |    CASE WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS b
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |ses AS (
        |  SELECT user_id, item,
        |    sum(b) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM brk),
        |si AS (SELECT DISTINCT user_id, session_id, item FROM ses
        |  WHERE item IS NOT NULL),
        |keep AS (SELECT user_id, session_id FROM si
        |  GROUP BY 1, 2 HAVING count(*) <= 50),
        |bi AS (SELECT si.* FROM si JOIN keep USING (user_id, session_id)),
        |census AS (
        |  SELECT a.item AS item_a, b.item AS item_b, count(*)::BIGINT AS cnt
        |  FROM bi a JOIN bi b ON a.user_id = b.user_id
        |    AND a.session_id = b.session_id AND a.item < b.item
        |  GROUP BY 1, 2),
        |directed AS (
        |  SELECT item_a AS item, item_b AS co_item, cnt FROM census
        |  UNION ALL SELECT item_b, item_a, cnt FROM census),
        |ranked AS (
        |  SELECT item, co_item, cnt,
        |    row_number() OVER (PARTITION BY item ORDER BY cnt DESC, co_item ASC) AS rank
        |  FROM directed)
        |SELECT item, co_item, cnt, rank FROM ranked WHERE rank <= 5""".stripMargin,

    // rank (global window — oracle-side only), w=4 neighborhood pairing,
    // token-Jaccard verification at the integer 9/10 threshold
    "d_sorted_neighborhood" ->
      """WITH docs AS (
        |  SELECT doc_id, text FROM (
        |    SELECT doc_id, text FROM documents
        |    UNION ALL SELECT doc_id + 1000000, text FROM documents)
        |  WHERE doc_id % 3 = 0),
        |norm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS nt
        |  FROM docs),
        |r AS MATERIALIZED (
        |  SELECT doc_id, (row_number() OVER (ORDER BY nt, doc_id) - 1)::BIGINT AS seq
        |  FROM norm),
        |cand AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM r a JOIN r b ON b.seq - a.seq >= 1 AND b.seq - a.seq < 4),
        |tok AS (
        |  SELECT DISTINCT doc_id, t AS tok FROM (
        |    SELECT doc_id, unnest(regexp_split_to_array(nt, '\s+')) AS t
        |    FROM norm WHERE nt <> '')),
        |sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
        |ix AS (
        |  SELECT c.doc_a, c.doc_b, count(*) AS inter
        |  FROM cand c
        |  JOIN tok ta ON ta.doc_id = c.doc_a
        |  JOIN tok tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, inter, sa.n + sb.n - inter AS uni,
        |  round(inter / CAST(sa.n + sb.n - inter AS DOUBLE), 6) AS jaccard
        |FROM ix JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
        |WHERE inter * 10 >= (sa.n + sb.n - inter) * 9""".stripMargin,

    // token positions (0-based), both pair directions for offsets 1-2,
    // the vocabulary global rank, and every md5-prefix negative draw
    "t_skipgram" ->
      """WITH sub AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
        |norm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N}\s]', ' ', 'g'), '\s+', ' ', 'g')) AS nt
        |  FROM sub),
        |t AS MATERIALIZED (
        |  SELECT doc_id, generate_subscripts(a, 1) - 1 AS pos, unnest(a) AS tok FROM (
        |    SELECT doc_id, CASE WHEN nt = '' THEN []::VARCHAR[]
        |         ELSE regexp_split_to_array(nt, '\s+') END AS a
        |    FROM norm)),
        |adj AS (
        |  SELECT a.doc_id, a.pos AS apos, a.tok AS atok, b.pos AS bpos, b.tok AS btok
        |  FROM t a JOIN t b ON a.doc_id = b.doc_id
        |    AND b.pos - a.pos BETWEEN 1 AND 2),
        |pairs AS (
        |  SELECT doc_id, apos AS pos, atok AS center, btok AS context FROM adj
        |  UNION ALL
        |  SELECT doc_id, bpos, btok, atok FROM adj),
        |census AS (
        |  SELECT tok AS term, count(*) AS freq FROM t
        |  WHERE tok <> '' GROUP BY tok HAVING count(*) >= 2),
        |vocab AS MATERIALIZED (
        |  SELECT (row_number() OVER (ORDER BY freq DESC, term ASC) - 1)::BIGINT AS token_id,
        |    term FROM census),
        |vq AS (SELECT count(*)::BIGINT AS v FROM vocab),
        |negs AS (
        |  SELECT p.doc_id, p.pos, p.center, p.context, j.j,
        |    ('0x' || substr(md5(p.doc_id::VARCHAR || ':' || p.pos::VARCHAR || ':' || j.j::VARCHAR), 1, 15))::BIGINT
        |      % (SELECT v FROM vq) AS neg_id
        |  FROM pairs p CROSS JOIN (SELECT unnest([0, 1]) AS j) j)
        |SELECT n.doc_id, n.pos, n.center, n.context, n.j, v.term AS neg_term
        |FROM negs n JOIN vocab v ON v.token_id = n.neg_id""".stripMargin,

    "j11_range_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_us(ts::TIMESTAMP) AS p_us FROM events),
        |iv AS (
        |  SELECT user_id AS iv_user, min(p_us) AS start_us,
        |    min(p_us) + 1800000000 AS end_us
        |  FROM ev GROUP BY user_id HAVING user_id % 7 = 0)
        |SELECT iv_user, start_us, count(*) AS n_events,
        |  min(event_id) AS min_event, max(event_id) AS max_event
        |FROM ev JOIN iv ON ev.p_us >= iv.start_us AND ev.p_us < iv.end_us
        |GROUP BY 1, 2""".stripMargin,

    "s5_warc_source" ->
      """SELECT doc_id AS media_id, 0 AS rec_idx, 'warcinfo' AS warc_type,
        |  NULL::VARCHAR AS target_uri, 21::BIGINT AS content_length,
        |  md5('software: graft/0.4' || chr(13) || chr(10)) AS body_md5
        |FROM documents
        |UNION ALL
        |SELECT doc_id, 1, 'resource', 'http://example.com/doc/' || doc_id,
        |  octet_length(encode(coalesce(text, '')))::BIGINT,
        |  md5(coalesce(text, ''))
        |FROM documents""".stripMargin,

    "t_bpe_train" ->
      s"""WITH ${bpeChainSql(20)},
        |allm AS (
        |  ${(1 to 20).map(i =>
              s"SELECT $i AS rank, (SELECT g FROM b$i) AS g, (SELECT cnt FROM b$i) AS cnt")
            .mkString("\n  UNION ALL ")})
        |SELECT rank, string_split(g, ' ')[1] AS merge_left,
        |  string_split(g, ' ')[2] AS merge_right,
        |  replace(g, ' ', '') AS merged, cnt
        |FROM allm""".stripMargin,

    "t_bpe_encode" ->
      s"""WITH ${bpeChainSql(20)}
        |SELECT subword, sum(freq)::BIGINT AS freq FROM (
        |  SELECT freq, unnest(str_split(syms, ' ')) AS subword FROM s20)
        |GROUP BY subword""".stripMargin,

    "t_bpe_bytes" ->
      s"""WITH ${bpeChainSql(20, byteLevel = true,
             textExpr = "translate(text, 'ao', 'äö')")},
        |allm AS (
        |  ${(1 to 20).map(i =>
              s"SELECT $i AS rank, (SELECT g FROM b$i) AS g, (SELECT cnt FROM b$i) AS cnt")
            .mkString("\n  UNION ALL ")})
        |SELECT rank, string_split(g, ' ')[1] AS merge_left,
        |  string_split(g, ' ')[2] AS merge_right,
        |  replace(g, ' ', '') AS merged, cnt
        |FROM allm""".stripMargin,

    "t_bpe_bytes_apply" ->
      s"""WITH ${bpeChainSql(20, "doc_id % 2 = 0", byteLevel = true,
             textExpr = "translate(text, 'ao', 'äö')")},
        |onorm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(translate(text, 'ao', 'äö')), '[^\\p{L}\\p{N}\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS norm
        |  FROM documents WHERE doc_id % 2 = 1),
        |ostream AS MATERIALIZED (
        |  SELECT doc_id, generate_subscripts(a, 1) AS pos, unnest(a) AS word FROM (
        |    SELECT doc_id, CASE WHEN norm = '' THEN []::VARCHAR[]
        |         ELSE regexp_split_to_array(norm, '\\s+') END AS a
        |    FROM onorm)),
        |e0 AS MATERIALIZED (
        |  SELECT word, ${byteSymsSql("word")} AS syms
        |  FROM (SELECT DISTINCT word FROM ostream WHERE word <> ''), bmap),
        |${(1 to 20).map(i =>
            s"""e$i AS MATERIALIZED (
              |  SELECT word, trim(replace(' ' || syms || ' ',
              |    ' ' || (SELECT g FROM b$i) || ' ',
              |    ' ' || replace((SELECT g FROM b$i), ' ', '') || ' ')) AS syms
              |  FROM e${i - 1})""".stripMargin).mkString(",\n")},
        |agg AS (
        |  SELECT s.doc_id, count(*) AS n_words,
        |    string_agg(e.syms, ' ' ORDER BY s.pos) AS seg
        |  FROM ostream s JOIN e20 e USING (word)
        |  GROUP BY s.doc_id)
        |SELECT d.doc_id, coalesce(a.n_words, 0)::BIGINT AS n_words,
        |  coalesce(len(str_split(a.seg, ' ')), 0)::BIGINT AS n_subwords,
        |  md5(a.seg) AS seg_md5
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
        |LEFT JOIN agg a USING (doc_id)""".stripMargin,

    "t_bpe_apply" ->
      s"""WITH ${bpeChainSql(20, "doc_id % 2 = 0")},
        |onorm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\\p{L}\\p{N}\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS norm
        |  FROM documents WHERE doc_id % 2 = 1),
        |ostream AS MATERIALIZED (
        |  SELECT doc_id, generate_subscripts(a, 1) AS pos, unnest(a) AS word FROM (
        |    SELECT doc_id, CASE WHEN norm = '' THEN []::VARCHAR[]
        |         ELSE regexp_split_to_array(norm, '\\s+') END AS a
        |    FROM onorm)),
        |e0 AS MATERIALIZED (
        |  SELECT word, regexp_replace(word, '(.)', '\\1 ', 'g') || '</w>' AS syms
        |  FROM (SELECT DISTINCT word FROM ostream WHERE word <> '')),
        |${(1 to 20).map(i =>
            s"""e$i AS MATERIALIZED (
              |  SELECT word, trim(replace(' ' || syms || ' ',
              |    ' ' || (SELECT g FROM b$i) || ' ',
              |    ' ' || replace((SELECT g FROM b$i), ' ', '') || ' ')) AS syms
              |  FROM e${i - 1})""".stripMargin).mkString(",\n")},
        |agg AS (
        |  SELECT s.doc_id, count(*) AS n_words,
        |    string_agg(e.syms, ' ' ORDER BY s.pos) AS seg
        |  FROM ostream s JOIN e20 e USING (word)
        |  GROUP BY s.doc_id)
        |SELECT d.doc_id, coalesce(a.n_words, 0)::BIGINT AS n_words,
        |  coalesce(len(str_split(a.seg, ' ')), 0)::BIGINT AS n_subwords,
        |  md5(a.seg) AS seg_md5
        |FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
        |LEFT JOIN agg a USING (doc_id)""".stripMargin,

    "t_bpe_fertility" ->
      s"""WITH ${bpeChainSql(20, "doc_id % 2 = 0")},
        |onorm AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^\\p{L}\\p{N}\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS norm
        |  FROM documents WHERE doc_id % 2 = 1),
        |ostream AS MATERIALIZED (
        |  SELECT doc_id, generate_subscripts(a, 1) AS pos, unnest(a) AS word FROM (
        |    SELECT doc_id, CASE WHEN norm = '' THEN []::VARCHAR[]
        |         ELSE regexp_split_to_array(norm, '\\s+') END AS a
        |    FROM onorm)),
        |e0 AS MATERIALIZED (
        |  SELECT word, regexp_replace(word, '(.)', '\\1 ', 'g') || '</w>' AS syms
        |  FROM (SELECT DISTINCT word FROM ostream WHERE word <> '')),
        |${(1 to 20).map(i =>
            s"""e$i AS MATERIALIZED (
              |  SELECT word, trim(replace(' ' || syms || ' ',
              |    ' ' || (SELECT g FROM b$i) || ' ',
              |    ' ' || replace((SELECT g FROM b$i), ' ', '') || ' ')) AS syms
              |  FROM e${i - 1})""".stripMargin).mkString(",\n")},
        |oagg AS (
        |  SELECT s.doc_id, count(*) AS n_words,
        |    string_agg(e.syms, ' ' ORDER BY s.pos) AS seg
        |  FROM ostream s JOIN e20 e USING (word)
        |  GROUP BY s.doc_id),
        |odoc AS (
        |  SELECT d.doc_id, d.lang, coalesce(a.n_words, 0)::BIGINT AS n_words,
        |    coalesce(len(str_split(a.seg, ' ')), 0)::BIGINT AS n_subwords
        |  FROM (SELECT doc_id, lang FROM documents WHERE doc_id % 2 = 1) d
        |  LEFT JOIN oagg a USING (doc_id))
        |SELECT lang, count(*)::BIGINT AS n_docs,
        |  sum(n_words)::BIGINT AS n_words,
        |  sum(n_subwords)::BIGINT AS n_subwords,
        |  CASE WHEN sum(n_words) > 0 THEN
        |    round(sum(n_subwords)::DOUBLE / sum(n_words), 6) END AS fertility
        |FROM odoc GROUP BY lang""".stripMargin,

    "e_pq_encode" ->
      s"""WITH ${pqCodesSql()}
        |SELECT vec_id,
        |  md5(string_agg(code::VARCHAR, ',' ORDER BY j)) AS chash,
        |  sum(code)::BIGINT AS csum,
        |  min(code)::INT AS cmin,
        |  max(code)::INT AS cmax
        |FROM codes GROUP BY vec_id""".stripMargin,

    "e_pq_topk" ->
      s"""WITH ${pqCodesSql()},
        |q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        |      FROM embeddings WHERE vec_id % 83 = 0),
        |lut AS (
        |  SELECT q.query_id, sub.j, c.cid AS code,
        |    CAST(round((list_dot_product(cv[sub.j*8+1:sub.j*8+8], cv[sub.j*8+1:sub.j*8+8])
        |      - 2 * list_dot_product(qv[sub.j*8+1:sub.j*8+8], cv[sub.j*8+1:sub.j*8+8])) * 1e6) AS BIGINT) AS lm
        |  FROM q CROSS JOIN sub CROSS JOIN c),
        |adc AS (
        |  SELECT lut.query_id, codes.vec_id AS neighbor_id,
        |    sum(lm)::BIGINT AS adc_micro
        |  FROM codes JOIN lut ON codes.j = lut.j AND codes.code = lut.code
        |  WHERE codes.vec_id <> lut.query_id
        |  GROUP BY 1, 2),
        |rk AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY query_id ORDER BY adc_micro ASC, neighbor_id ASC) AS rank
        |  FROM adc)
        |SELECT query_id, neighbor_id, adc_micro,
        |  round(adc_micro::DOUBLE / 1e6, 6) AS adc, rank
        |FROM rk WHERE rank <= 10""".stripMargin,

    // residual IVF-PQ: coarse assignment + probes over the 8 fixed
    // centroids, residual vectors v − c_list, the PQ codebook seeded
    // from the first 16 RESIDUALS, per-(vec, subspace) argmin codes,
    // one LUT per (query, probed list) from q − c_list, ADC keyed on
    // (list, j, code)
    "e_ivfpq_topk" ->
      """WITH c8 AS MATERIALIZED (
        |  SELECT vec_id AS cid, embedding::DOUBLE[] AS cv8
        |  FROM embeddings WHERE vec_id < 8),
        |v AS (SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings),
        |sub AS (SELECT unnest(range(0, 8)) AS j),
        |sc8 AS (
        |  SELECT v.vec_id, c8.cid,
        |    list_dot_product(cv8, cv8) - 2 * list_dot_product(ev, cv8) AS sc
        |  FROM v CROSS JOIN c8),
        |asg AS MATERIALIZED (
        |  SELECT vec_id, cid AS list_id FROM (
        |    SELECT vec_id, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY sc ASC, cid ASC) AS rn
        |    FROM sc8) WHERE rn = 1),
        |probes AS MATERIALIZED (
        |  SELECT vec_id AS query_id, cid AS list_id FROM (
        |    SELECT vec_id, cid,
        |      row_number() OVER (PARTITION BY vec_id ORDER BY sc ASC, cid ASC) AS rn
        |    FROM sc8 WHERE vec_id % 83 = 0) WHERE rn <= 3),
        |rv AS MATERIALIZED (
        |  SELECT v.vec_id, a.list_id,
        |    [v.ev[i] - c8.cv8[i] FOR i IN range(1, 65)] AS rv
        |  FROM v JOIN asg a USING (vec_id) JOIN c8 ON c8.cid = a.list_id),
        |rc AS MATERIALIZED (
        |  SELECT (vec_id - 8)::INT AS cid, rv AS cv
        |  FROM rv WHERE vec_id >= 8 AND vec_id < 24),
        |rcs AS (
        |  SELECT rv.vec_id, rv.list_id, sub.j, rc.cid,
        |    list_dot_product(cv[sub.j*8+1:sub.j*8+8], cv[sub.j*8+1:sub.j*8+8])
        |      - 2 * list_dot_product(rv.rv[sub.j*8+1:sub.j*8+8], cv[sub.j*8+1:sub.j*8+8]) AS sc
        |  FROM rv CROSS JOIN sub CROSS JOIN rc),
        |rcodes AS MATERIALIZED (
        |  SELECT vec_id, list_id, j, cid AS code FROM (
        |    SELECT vec_id, list_id, j, cid,
        |      row_number() OVER (PARTITION BY vec_id, j ORDER BY sc ASC, cid ASC) AS rn
        |    FROM rcs) WHERE rn = 1),
        |qrv AS MATERIALIZED (
        |  SELECT p.query_id, p.list_id,
        |    [v.ev[i] - c8.cv8[i] FOR i IN range(1, 65)] AS rq
        |  FROM probes p JOIN v ON v.vec_id = p.query_id
        |  JOIN c8 ON c8.cid = p.list_id),
        |rlut AS (
        |  SELECT qrv.query_id, qrv.list_id, sub.j, rc.cid AS code,
        |    CAST(round((list_dot_product(rq[sub.j*8+1:sub.j*8+8], rq[sub.j*8+1:sub.j*8+8])
        |      + (list_dot_product(cv[sub.j*8+1:sub.j*8+8], cv[sub.j*8+1:sub.j*8+8])
        |         - 2 * list_dot_product(rq[sub.j*8+1:sub.j*8+8], cv[sub.j*8+1:sub.j*8+8]))) * 1e6) AS BIGINT) AS lm
        |  FROM qrv CROSS JOIN sub CROSS JOIN rc),
        |adc AS (
        |  SELECT rlut.query_id, rcodes.vec_id AS neighbor_id,
        |    sum(lm)::BIGINT AS adc_micro
        |  FROM rcodes JOIN rlut ON rlut.list_id = rcodes.list_id
        |    AND rlut.j = rcodes.j AND rlut.code = rcodes.code
        |  WHERE rcodes.vec_id <> rlut.query_id
        |  GROUP BY 1, 2),
        |rk AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY query_id ORDER BY adc_micro ASC, neighbor_id ASC) AS rank
        |  FROM adc)
        |SELECT query_id, neighbor_id, adc_micro,
        |  round(adc_micro::DOUBLE / 1e6, 6) AS adc, rank
        |FROM rk WHERE rank <= 10""".stripMargin,

    // every coordinate is an integer sum of ±micro-fixed inputs — the
    // group-by association order cannot matter, so the two engines agree
    // exactly despite computing the sums in different orders
    // PCA moment census replay: micro-fix each coordinate (float→double
    // widening is exact, round HALF_UP in both engines), then exact
    // integer sums per upper-triangle (i, j) cell — sum() accumulates in
    // hugeint, final casts land in bigint by construction
    "e_pca_cov" ->
      """WITH e AS (
        |  SELECT [CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) FOR x IN embedding] AS mv
        |  FROM embeddings),
        |p AS (
        |  SELECT i.r AS i, j.r AS j, mv[i.r + 1] AS vi, mv[j.r + 1] AS vj
        |  FROM e CROSS JOIN range(64) i(r) CROSS JOIN range(64) j(r)
        |  WHERE j.r >= i.r)
        |SELECT i, j, count(*) AS n,
        |  CAST(sum(vi) AS BIGINT) AS s_i, CAST(sum(vj) AS BIGINT) AS s_j,
        |  CAST(sum(vi * vj) AS BIGINT) AS s_ij
        |FROM p GROUP BY i, j""".stripMargin,

    // PCA projection: full pico-snapped Jacobi replay — moment census,
    // covariance assembly, every rotation as one recursive-CTE step
    // (chained unnest-struct lets; indexed list_transform lambdas over
    // the matrix lists — a range()-sourced lambda loses outer refs),
    // eigen sort, sign convention, whitening, projection, micro census
    "e_pca_project" ->
      """WITH RECURSIVE
        |pe AS (SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding[1:16]] AS ev FROM embeddings),
        |pm AS (SELECT vec_id, [CAST(round(x * 1e6) AS BIGINT) FOR x IN ev] AS mv FROM pe),
        |pcell AS (
        |  SELECT i.r AS i, j.r AS j, count(*)::BIGINT AS n,
        |    CAST(sum(mv[i.r + 1]) AS BIGINT) AS s_i,
        |    CAST(sum(mv[j.r + 1]) AS BIGINT) AS s_j,
        |    CAST(sum(mv[i.r + 1] * mv[j.r + 1]) AS BIGINT) AS s_ij
        |  FROM pm CROSS JOIN range(16) i(r) CROSS JOIN range(16) j(r)
        |  WHERE j.r >= i.r GROUP BY 1, 2),
        |pcnt AS (SELECT max(n)::DOUBLE AS nn FROM pcell),
        |pcov AS (
        |  SELECT r, c,
        |    round((s_ij::DOUBLE / nn - (s_i::DOUBLE / nn) * (s_j::DOUBLE / nn)) / 1e12 * 1e12) / 1e12 AS cv
        |  FROM (SELECT i AS r, j AS c, s_i, s_j, s_ij FROM pcell
        |        UNION ALL
        |        SELECT j AS r, i AS c, s_j AS s_i, s_i AS s_j, s_ij FROM pcell WHERE i <> j),
        |    pcnt),
        |amat AS (SELECT list(cv ORDER BY r * 16 + c) AS a FROM pcov),
        |vmat AS (SELECT [CASE WHEN x // 16 = x % 16 THEN 1.0 ELSE 0.0 END::DOUBLE FOR x IN range(256)] AS v),
        |jac AS (
        |  SELECT 0 AS sweep, 0 AS p, 1 AS q, 0.0::DOUBLE AS off, a, v, false AS done
        |  FROM amat, vmat
        |  UNION ALL
        |  SELECT e9.sweep2::INT, e9.p2::INT, e9.q2::INT, e9.off3, e7.a2, e7.v2, e9.done2
        |  FROM jac r,
        |  unnest([{'app': r.a[r.p * 16 + r.p + 1], 'aqq': r.a[r.q * 16 + r.q + 1],
        |           'apq': r.a[r.p * 16 + r.q + 1],
        |           'p': r.p, 'q': r.q, 'aa': r.a, 'vv': r.v}]) AS s1(e0),
        |  unnest([{'off2': r.off + e0.apq * e0.apq,
        |           'rot': abs(e0.apq) > 1e-300}]) AS s2(e1),
        |  unnest([{'theta': CASE WHEN e1.rot THEN (e0.aqq - e0.app) / (2.0 * e0.apq) ELSE 0.0 END}]) AS s3(e2),
        |  unnest([{'t': CASE WHEN e2.theta = 0.0 THEN 1.0
        |                ELSE (CASE WHEN e2.theta < 0 THEN -1.0 ELSE 1.0 END)
        |                  / (abs(e2.theta) + sqrt(e2.theta * e2.theta + 1.0)) END}]) AS s4(e3),
        |  unnest([{'cs': 1.0 / sqrt(e3.t * e3.t + 1.0)}]) AS s5(e4),
        |  unnest([{'sn': e3.t * e4.cs}]) AS s6(e5),
        |  unnest([{'a1': CASE WHEN e1.rot THEN
        |      list_transform(e0.aa, (el, x) -> CASE WHEN (x - 1) % 16 = e0.p
        |            THEN e4.cs * e0.aa[((x - 1) // 16) * 16 + e0.p + 1] - e5.sn * e0.aa[((x - 1) // 16) * 16 + e0.q + 1]
        |            WHEN (x - 1) % 16 = e0.q
        |            THEN e5.sn * e0.aa[((x - 1) // 16) * 16 + e0.p + 1] + e4.cs * e0.aa[((x - 1) // 16) * 16 + e0.q + 1]
        |            ELSE el END)
        |      ELSE r.a END}]) AS s7(e6),
        |  unnest([{'a2': CASE WHEN e1.rot THEN
        |      list_transform(e6.a1, (el, x) -> round((CASE WHEN (x - 1) // 16 = e0.p
        |              THEN e4.cs * e6.a1[e0.p * 16 + (x - 1) % 16 + 1] - e5.sn * e6.a1[e0.q * 16 + (x - 1) % 16 + 1]
        |              WHEN (x - 1) // 16 = e0.q
        |              THEN e5.sn * e6.a1[e0.p * 16 + (x - 1) % 16 + 1] + e4.cs * e6.a1[e0.q * 16 + (x - 1) % 16 + 1]
        |              ELSE el END) * 1e12) / 1e12)
        |      ELSE r.a END,
        |    'v2': CASE WHEN e1.rot THEN
        |      list_transform(e0.vv, (el, x) -> round((CASE WHEN (x - 1) % 16 = e0.p
        |              THEN e4.cs * e0.vv[((x - 1) // 16) * 16 + e0.p + 1] - e5.sn * e0.vv[((x - 1) // 16) * 16 + e0.q + 1]
        |              WHEN (x - 1) % 16 = e0.q
        |              THEN e5.sn * e0.vv[((x - 1) // 16) * 16 + e0.p + 1] + e4.cs * e0.vv[((x - 1) // 16) * 16 + e0.q + 1]
        |              ELSE el END) * 1e12) / 1e12)
        |      ELSE r.v END}]) AS s8(e7),
        |  unnest([{'atEnd': r.p = 14 AND r.q = 15}]) AS s9(e8),
        |  unnest([{'done2': e8.atEnd AND (e1.off2 <= 1e-12 OR r.sweep + 1 >= 64),
        |           'sweep2': CASE WHEN e8.atEnd THEN r.sweep + 1 ELSE r.sweep END,
        |           'p2': CASE WHEN e8.atEnd THEN 0 WHEN r.q = 15 THEN r.p + 1 ELSE r.p END,
        |           'q2': CASE WHEN e8.atEnd THEN 1 WHEN r.q = 15 THEN r.p + 2 ELSE r.q + 1 END,
        |           'off3': CASE WHEN e8.atEnd THEN 0.0 ELSE e1.off2 END}]) AS s10(e9)
        |  WHERE NOT r.done),
        |jfin AS (SELECT a, v FROM jac WHERE done),
        |jord AS (
        |  SELECT i, ev, row_number() OVER (ORDER BY ev DESC, i ASC) AS rk
        |  FROM (SELECT t.i AS i, f.a[t.i * 16 + t.i + 1] AS ev
        |        FROM jfin f, unnest(range(16)) AS t(i))),
        |jcomp AS (
        |  SELECT (o.rk - 1)::INT AS component,
        |    CAST(round(o.ev * 1e9) AS BIGINT) AS eigenvalue_nano,
        |    list_transform(cv1.cvec, y ->
        |      (CASE WHEN cv1.cvec[list_position(list_transform(cv1.cvec, z -> abs(z)),
        |         list_max(list_transform(cv1.cvec, z -> abs(z))))] < 0
        |        THEN -1.0 ELSE 1.0 END * y)
        |       * (1.0 / sqrt(greatest(o.ev, 0.0) + 1e-9))) AS comp
        |  FROM jord o, jfin f,
        |    unnest([{'cvec': list_transform(f.v[1:16], (el, rr) -> f.v[(rr - 1) * 16 + o.i + 1])}]) AS sc(cv1)
        |  WHERE o.rk <= 8),
        |jmean AS (
        |  SELECT list(s_i::DOUBLE / nn / 1e6 ORDER BY i) AS mean
        |  FROM pcell, pcnt WHERE i = j),
        |jproj AS (
        |  SELECT c.component, c.eigenvalue_nano,
        |    CAST(round(list_dot_product(
        |      list_transform(pe.ev, (el, t) -> el - m.mean[t]), c.comp) * 1e6) AS BIGINT) AS xm
        |  FROM pe, jmean m, jcomp c)
        |SELECT component, count(*)::BIGINT AS n,
        |  CAST(sum(xm) AS BIGINT) AS s1_micro,
        |  CAST(sum(xm * xm) AS BIGINT) AS s2_micro,
        |  eigenvalue_nano
        |FROM jproj GROUP BY component, eigenvalue_nano ORDER BY component""".stripMargin,

    "e_pca_moments_merge" ->
      """WITH e AS (
        |  SELECT [CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) FOR x IN embedding] AS mv
        |  FROM embeddings),
        |p AS (
        |  SELECT i.r AS i, j.r AS j, mv[i.r + 1] AS vi, mv[j.r + 1] AS vj
        |  FROM e CROSS JOIN range(64) i(r) CROSS JOIN range(64) j(r)
        |  WHERE j.r >= i.r)
        |SELECT i, j, count(*) AS n,
        |  CAST(sum(vi) AS BIGINT) AS s_i, CAST(sum(vj) AS BIGINT) AS s_j,
        |  CAST(sum(vi * vj) AS BIGINT) AS s_ij
        |FROM p GROUP BY i, j""".stripMargin,

    "a20_exact_median" ->
      """WITH em AS (
        |  SELECT CAST(round(value * 1e6) AS BIGINT) AS vm FROM events
        |  WHERE value IS NOT NULL),
        |er AS (
        |  SELECT vm, row_number() OVER (ORDER BY vm) AS rn,
        |    count(*) OVER () AS n
        |  FROM em)
        |SELECT max(n)::BIGINT AS n, ((max(n) + 1) // 2)::BIGINT AS k,
        |  max(CASE WHEN rn = (n + 1) // 2 THEN vm END)::BIGINT AS kth
        |FROM er""".stripMargin,

    "e_rand_proj" ->
      s"""WITH ev AS (
        |  SELECT vec_id, i, CAST(round(x::DOUBLE * 1e6) AS BIGINT) AS vq
        |  FROM (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |               unnest(embedding) AS x
        |        FROM embeddings)),
        |pj AS (
        |  SELECT vec_id, sm.j, sum(sm.s * ev.vq)::BIGINT AS v
        |  FROM ev JOIN (VALUES $projSignRows) sm(j, i, s) ON sm.i = ev.i
        |  GROUP BY 1, 2)
        |SELECT vec_id,
        |  md5(string_agg(v::VARCHAR, ',' ORDER BY j)) AS phash,
        |  sum(v)::BIGINT AS psum,
        |  min(v) AS pmin,
        |  max(v) AS pmax
        |FROM pj GROUP BY vec_id""".stripMargin,

    // int dots are exact in double (products ≤ 127² summed over dim 64
    // ≪ 2^53), but the NORMALIZATION (dot/(√·√) vs list_cosine_similarity)
    // is not guaranteed ulp-identical across engines — so, like every
    // other top-k gate, ranks order by the 6dp-ROUNDED score with the
    // neighbor_id tiebreak (the one Similarity.topK contract)
    "e_quantized_topk" ->
      """WITH m AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS ev,
        |    list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS ma
        |  FROM embeddings),
        |qv AS (
        |  SELECT vec_id,
        |    list_transform(ev, x ->
        |      CASE WHEN ma = 0 THEN 0.0
        |           ELSE round(x * 127.0 / ma) END) AS q
        |  FROM m),
        |q AS (SELECT vec_id AS query_id, q AS qq FROM qv WHERE vec_id < 5),
        |c AS (SELECT vec_id AS neighbor_id, q AS cq FROM qv),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |    list_cosine_similarity(cq, qq) AS cos
        |  FROM c CROSS JOIN q WHERE neighbor_id <> query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY round(cos, 6) DESC, neighbor_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, round(cos, 6) AS cosine, rank
        |FROM ranked WHERE rank <= 10""".stripMargin,

    // sign-bit Hamming replayed per-coordinate ((a>0) <> (b>0)) — the
    // packed xor+popcount path agrees by construction, so a word-packing
    // bug on the Spark side hash-fails here
    "e_binary_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |    len([i FOR i IN range(1, 65) IF (cv[i] > 0) <> (qv[i] > 0)])::INT AS hamming
        |  FROM c CROSS JOIN q WHERE neighbor_id <> query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, hamming,
        |    row_number() OVER (PARTITION BY query_id ORDER BY hamming ASC, neighbor_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, hamming, rank
        |FROM ranked WHERE rank <= 10""".stripMargin,

    // both stages replayed: Hamming top-50 candidate pool (id tie-break),
    // then exact float cosine rerank to top-10 under the shared 6dp
    // ranking contract
    "e_binary_rerank" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |    len([i FOR i IN range(1, 65) IF (cv[i] > 0) <> (qv[i] > 0)]) AS hamming
        |  FROM c CROSS JOIN q WHERE neighbor_id <> query_id),
        |pool AS (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY hamming ASC, neighbor_id ASC) AS hrank
        |  FROM scored),
        |cand AS (SELECT query_id, neighbor_id FROM pool WHERE hrank <= 50),
        |rescored AS (
        |  SELECT p.query_id, p.neighbor_id,
        |    list_cosine_similarity(cc.embedding::DOUBLE[], qq.embedding::DOUBLE[]) AS cos
        |  FROM cand p
        |  JOIN embeddings cc ON cc.vec_id = p.neighbor_id
        |  JOIN embeddings qq ON qq.vec_id = p.query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cos,
        |    row_number() OVER (PARTITION BY query_id ORDER BY round(cos, 6) DESC, neighbor_id ASC) AS rank
        |  FROM rescored)
        |SELECT query_id, neighbor_id, round(cos, 6) AS cosine, rank
        |FROM ranked WHERE rank <= 10""".stripMargin
  )

  /** The PNG gates carry the same deterministic pixel formulas as their
    * PPM twins and PNG is lossless, so the decoded rasters — and hence
    * the oracle replays — are identical; only the Spark side differs
    * (javax.imageio codec decode instead of the in-band header walk).
    * s_curriculum wraps the gate-proven perplexity-bucket replay as a
    * subquery and rebuilds the (bucket ordinal ‖ ':' ‖ draw) key.
    */
  val oracles: Map[String, String] = oraclesBase ++ Map(
    "s_curriculum" ->
      s"""SELECT doc_id, bucket,
        |  (CASE bucket WHEN 'head' THEN '0' WHEN 'middle' THEN '1'
        |        WHEN 'tail' THEN '2' ELSE '3' END)
        |  || ':' || md5('shuffle:42:' || doc_id::VARCHAR) AS curriculum_key
        |FROM (${oraclesBase("t_perplexity_buckets")}) pb""".stripMargin,
    "m_decode_png" -> oraclesBase("m_decode_features"),
    "m_resize_png" -> oraclesBase("m_resize"),
    "m_phash_png" -> oraclesBase("m_phash"),
    // the bloom tier's whole contract is result-identity with the plain
    // anti-join — same oracle, different physical route
    "d_incremental_exact_bloom" -> oraclesBase("d_incremental_exact"),
    // the rewrite's whole contract is result-identity with the
    // hand-bucketed range join — same oracle, rule-generated plan
    "j13_rangejoin_rewrite" -> oraclesBase("j11_range_join"))
}
