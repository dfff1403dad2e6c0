package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted MinHash artifacts for incremental near-dup — what a daily
  * increment loop reuses instead of re-shingling the corpus per batch:
  *
  *  - `shingles`: (doc_id, g) distinct shingle digests (Jaccard verify)
  *  - `bands`:    (doc_id, band, band_hash) LSH rows (candidate join)
  *
  * Build with [[Dedup.buildSignatureIndex]], keep hot with [[cached]], or
  * park on storage with [[write]]/[[SignatureIndex.read]] between batches.
  * At 100 TB, write once after each corpus compaction; every increment
  * then scans two compact digest tables (16 bytes + 20 bytes per row)
  * instead of the corpus text.
  */
final case class SignatureIndex(shingles: DataFrame, bands: DataFrame,
                                shingleSize: Int, numHashes: Int,
                                numBands: Int,
                                scheme: HashScheme = HashScheme.Fast) {
  /** Eagerly cache both frames (the increment loop touches each twice). */
  def cached(): SignatureIndex = {
    shingles.cache().count()
    bands.cache().count()
    this
  }

  /** Fold an increment into the index — the one-call daily-loop API: the
    * increment's shingle/band rows are derived from ITS text only (under
    * this index's params + hash scheme) and unioned onto the existing
    * frames; nothing already indexed is re-shingled or re-hashed. doc_id
    * spaces of increment and index must be disjoint (same contract as
    * [[Dedup.nearDuplicatesAgainst]]). For an on-storage index use
    * [[SignatureIndex.appendTo]], which parquet-appends the same rows.
    */
  def append(newDocs: DataFrame, textCol: String = "text"): SignatureIndex = {
    val shNew = Dedup.shingleRows(newDocs, textCol, shingleSize, scheme)
    val bNew = Dedup.lshBands(
      Dedup.minhashSignaturesFromRows(shNew, numHashes, scheme),
      numBands, scheme)
    copy(shingles = shingles.unionByName(shNew),
      bands = bands.unionByName(bNew))
  }

  def write(path: String): Unit = {
    shingles.write.mode("overwrite").parquet(s"$path/shingles")
    bands.write.mode("overwrite").parquet(s"$path/bands")
    val schemeName =
      if (scheme == HashScheme.Portable) "portable" else "fast"
    // schemeVer pins the hash-family DEFINITION, not just its name: a
    // persisted index hashed under an older family must fail loudly at
    // read time, not silently produce empty candidate sets. Versioned
    // per scheme (fast is unchanged since v1; portable v2 = affine
    // family over 2³¹−1, v1 was per-seed md5) so a still-valid fast
    // index never forces a rebuild.
    // params go through the Hadoop FS like the parquet frames — a
    // java.nio local write would throw on the hdfs://, s3a://, gs://
    // paths a 100 TB index actually lives on, stranding a params-less
    // unreadable index.
    SignatureIndex.writeText(shingles.sparkSession, s"$path/params.json",
      s"""{"shingleSize":$shingleSize,"numHashes":$numHashes,"numBands":$numBands,"scheme":"$schemeName","schemeVer":${SignatureIndex.schemeVersion(scheme)}}""")
  }
}

object SignatureIndex {
  /** Current digest-definition version per scheme; bump on change. */
  def schemeVersion(scheme: HashScheme): Int = scheme match {
    case HashScheme.Portable => 2 // v2: affine family; v1 was per-seed md5
    case HashScheme.Fast     => 1
  }

  private[operators] def writeText(spark: SparkSession, path: String,
                                   content: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private[operators] def readTextFile(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }
  private def readText(spark: SparkSession, path: String): String =
    readTextFile(spark, path)

  /** Persisted append: parquet-APPENDS only the increment's digest rows
    * into an existing on-storage index. read() first validates the params
    * (a schemeVer mismatch fails loudly before any write), the increment
    * is shingled/hashed under the stored params, and the new rows land as
    * additional parquet files — the corpus-sized existing files are never
    * read or rewritten, so per-increment IO is increment-proportional.
    * params.json is untouched (same family, same params by construction).
    * Returns the re-read, now-larger index.
    *
    * Crash-recovery contract (the two appends are not one atomic
    * transaction): BANDS are written FIRST, deliberately. A failure
    * between the writes leaves extra band rows with no matching shingle
    * rows — increment candidates then fail Jaccard verification (a
    * bounded false-NEGATIVE window), and simply re-running appendTo is
    * safe: duplicated band rows only produce duplicate candidates,
    * which the candidate `distinct()` collapses. The reverse order
    * would be dangerous: duplicated SHINGLE rows double a doc's
    * intersection/size counts and silently corrupt every Jaccard score
    * it participates in.
    */
  def appendTo(spark: SparkSession, path: String, newDocs: DataFrame,
               textCol: String = "text"): SignatureIndex = {
    val idx = read(spark, path)
    val shNew = Dedup.shingleRows(newDocs, textCol, idx.shingleSize, idx.scheme)
      .cache() // shingled once; feeds both the bands and the shingle write
    Dedup.lshBands(
        Dedup.minhashSignaturesFromRows(shNew, idx.numHashes, idx.scheme),
        idx.numBands, idx.scheme)
      .write.mode("append").parquet(s"$path/bands")
    shNew.write.mode("append").parquet(s"$path/shingles")
    shNew.unpersist()
    read(spark, path)
  }

  def read(spark: SparkSession, path: String): SignatureIndex = {
    val params = readText(spark, s"$path/params.json")
    def p(name: String): Int =
      s""""$name":(\\d+)""".r.findFirstMatchIn(params)
        .map(_.group(1).toInt)
        .getOrElse(sys.error(s"SignatureIndex at $path: missing $name in params.json"))
    val scheme =
      if (params.contains("\"scheme\":\"portable\"")) HashScheme.Portable
      else HashScheme.Fast
    val ver = s""""schemeVer":(\\d+)""".r.findFirstMatchIn(params)
      .map(_.group(1).toInt).getOrElse(1)
    require(ver == schemeVersion(scheme),
      s"SignatureIndex at $path was built with hash-scheme version $ver, " +
        s"this build uses ${schemeVersion(scheme)} — rebuild the index " +
        "(a stale family would silently produce empty candidate sets)")
    SignatureIndex(
      spark.read.parquet(s"$path/shingles"),
      spark.read.parquet(s"$path/bands"),
      p("shingleSize"), p("numHashes"), p("numBands"), scheme)
  }
}

/** Deduplication operators for training-data pipelines, each designed so
  * the shuffle key is a compact digest rather than document text:
  *
  *  - [[exact]]: hash-groupBy on a content fingerprint. One shuffle of
  *    (doc_id, 16-byte digest) regardless of document size.
  *  - [[minhashSignatures]] / [[minhashCandidates]]: MinHash + LSH banding.
  *    Shingle → per-seed min-hash → band digests → bucket self-join on
  *    (band index, digest). All array math is Spark lambda expressions
  *    (codegen), no UDFs; candidate verification is an exact n-gram
  *    Jaccard on the bucketed (small) pair set only.
  *  - [[simhash]]: 64-bit SimHash over token hashes via bit-vote
  *    aggregation expressed with explode + groupBy (distributes; no
  *    per-executor state).
  *  - [[ngramJaccard]]: exact Jaccard over shingle sets for a candidate
  *    pair frame.
  */
/** Pluggable digest family for the MinHash/SimHash operators. [[Fast]]
  * (xxhash64) is the scale default; [[Portable]] derives every digest
  * from md5 so an external engine (the DuckDB oracle, a Python auditor)
  * can replay signatures bit-for-bit: shingle keys are md5 hex strings,
  * the seeded min-hash family is affine universal hashing over the
  * Mersenne prime 2³¹−1 applied to ONE md5-derived base value per
  * shingle (so the per-seed work is a codegen'd multiply-add on longs,
  * not another md5 — the string hash happens once per shingle row, the
  * 32-member hash family costs 32 long ops), and band digests are md5
  * of the "|"-joined band values. Same operators, same plans — only the
  * hash expressions differ.
  */
sealed trait HashScheme {
  /** shingle text → compact join/aggregate key */
  def key(shingle: Column): Column
  /** key → per-row base value the seeded family is applied to; evaluated
    * ONCE per shingle row (its own projection), so schemes whose base
    * derivation is expensive (string parsing) don't pay it per seed
    */
  def prep(g: Column): Column
  /** prepared base → i-th seeded hash for the min-hash aggregate */
  def seeded(x: Column, seed: Int): Column
  /** band slice (array of seeded mins) → band digest */
  def band(arr: Column): Column
  /** token → integer hash for SimHash bit votes */
  def tokenHash(tok: Column): Column
  /** SimHash width: how many low bits of [[tokenHash]] carry entropy */
  def simhashBits: Int
}

object HashScheme {
  /** xxhash64 everywhere — fastest (codegen'd long ops), engine-specific. */
  case object Fast extends HashScheme {
    def key(shingle: Column): Column = xxhash64(shingle)
    def prep(g: Column): Column = g
    def seeded(x: Column, seed: Int): Column = xxhash64(x, lit(seed))
    def band(arr: Column): Column = xxhash64(arr)
    def tokenHash(tok: Column): Column = xxhash64(tok)
    def simhashBits: Int = 64
  }

  /** md5-derived digests — replayable by any engine with md5 + BIGINT
    * arithmetic. Seeded family: h_i(x) = (a_i·x + b_i) mod p with
    * p = 2³¹−1 and x = (60-bit md5 prefix) mod p, so a_i·x < 2⁶² never
    * overflows a signed 64-bit integer on ANY engine. Coefficients come
    * from the splitmix64 finalizer of the seed index — deterministic,
    * dependency-free, and easy to restate in SQL as literals
    * ([[affineA]]/[[affineB]] are interpolated into the oracle).
    */
  case object Portable extends HashScheme {
    /** 2³¹ − 1, Mersenne prime — modulus of the affine hash family. */
    val P: Long = 2147483647L

    /** splitmix64 finalizer: deterministic coefficient derivation. */
    private def mix64(z0: Long): Long = {
      var z = z0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    /** multiplier for seed i — in [1, p−1], never 0 (degenerate family). */
    def affineA(i: Int): Long =
      java.lang.Long.remainderUnsigned(mix64(2L * i), P - 1) + 1
    /** offset for seed i — in [0, p−1]. */
    def affineB(i: Int): Long =
      java.lang.Long.remainderUnsigned(mix64(2L * i + 1), P)

    /** first 15 hex chars → 60-bit non-negative long (fits BIGINT). */
    private def h60(c: Column): Column =
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    def key(shingle: Column): Column = md5(shingle)
    /** g is ALREADY the md5 hex key — parse its 60-bit prefix, no re-hash. */
    def prep(g: Column): Column =
      pmod(conv(substring(g, 1, 15), 16, 10).cast("long"), lit(P))
    def seeded(x: Column, seed: Int): Column =
      pmod(lit(affineA(seed)) * x + lit(affineB(seed)), lit(P))
    def band(arr: Column): Column =
      md5(array_join(transform(arr, _.cast("string")), "|"))
    def tokenHash(tok: Column): Column = h60(tok)
    def simhashBits: Int = 60
  }
}

object Dedup {

  /** Word n-gram shingles of the normalized text — native expression
    * (graft.functions.NGramShingles); see its scaladoc for why not a
    * transform/slice lambda pipeline.
    */
  def shingles(text: Column, n: Int = 3, distinct: Boolean = false): Column =
    graft.functions.NGramShingles.shingles(TextAnalysis.normalized(text), n, distinct)

  /** Exact duplicate groups: every document whose normalized content
    * fingerprint occurs more than once, with the group's canonical
    * (smallest) doc_id attached — deterministic survivor selection.
    */
  def exact(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val fp = docs.select(col("doc_id"), TextAnalysis.fingerprint(col(textCol)).as("fp"))
    val w = Window.partitionBy(col("fp"))
    fp.withColumn("group_size", count(lit(1)).over(w))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .where(col("group_size") > 1)
      .select("doc_id", "fp", "group_size", "canonical_id")
  }

  /** Keep one survivor (min doc_id) per fingerprint — the "dedup" action. */
  def exactDeduped(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(TextAnalysis.fingerprint(col(textCol)))
      .orderBy(col("doc_id"))
    docs.withColumn("_rn", row_number().over(w)).where(col("_rn") === 1).drop("_rn")
  }

  /** Survivor-POLICY dedup: keep the copy that maximizes `preference`
    * per content group (ties → lowest doc_id). Min-id is the cheap
    * default, but real pipelines keep the copy with the richest
    * metadata, the longest cleaned text, or the highest quality score —
    * near-identical crawls of one page differ in boilerplate trim, and
    * which copy survives changes the corpus. Same one-window shape as
    * [[exactDeduped]] (partial ordering pushed into the window sort);
    * the preference column is any deterministic expression, so the
    * choice replays externally.
    */
  def exactDedupedBy(docs: DataFrame, preference: Column,
                     textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(TextAnalysis.fingerprint(col(textCol)))
      .orderBy(preference.desc, col("doc_id").asc)
    docs.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).drop("_rn")
  }

  /** MinHash signatures: for each of `numHashes` seeds, the minimum
    * xxhash64(shingle, seed) over the document's shingle set.
    *
    * Shape matters: explode to (doc_id, shingle) grain and run `numHashes`
    * plain min-aggregates — every xxhash64 stays inside whole-stage
    * codegen and the shuffle carries only (doc_id, N longs) after map-side
    * partial aggregation. (A nested transform(seeds, .. transform(shingles,
    * ..)) computes the same thing but higher-order lambdas evaluate
    * interpreted — measured 200× slower at sf0.1.)
    */
  /** (doc_id, g) distinct shingle rows — the shared working grain for
    * MinHash and Jaccard (min-hash is duplicate-insensitive, Jaccard needs
    * sets, so distinct serves both). `g` is the shingle's xxhash64 digest,
    * not its text: every downstream join/aggregate then shuffles and
    * compares 8-byte longs instead of ~n-word strings, and the per-seed
    * min-hashes re-hash a fixed-width long rather than the string
    * (identical set semantics up to a 2^-64 digest collision).
    */
  def shingleRows(docs: DataFrame, textCol: String = "text",
                  shingleSize: Int = 3,
                  scheme: HashScheme = HashScheme.Fast): DataFrame =
    docs.select(col("doc_id"),
        explode(shingles(col(textCol), shingleSize, distinct = true)).as("_g"))
      .select(col("doc_id"), scheme.key(col("_g")).as("g"))

  def minhashSignatures(docs: DataFrame, textCol: String = "text",
                        shingleSize: Int = 3, numHashes: Int = 32,
                        scheme: HashScheme = HashScheme.Fast): DataFrame =
    minhashSignaturesFromRows(shingleRows(docs, textCol, shingleSize, scheme),
      numHashes, scheme)

  def minhashSignaturesFromRows(sh: DataFrame, numHashes: Int,
                                scheme: HashScheme = HashScheme.Fast): DataFrame = {
    val mins = (0 until numHashes).map(i =>
      min(scheme.seeded(col("_x"), i)).as(s"_h$i"))
    // prep runs in its own projection UNDER the aggregate, so an expensive
    // base derivation (Portable: hex-prefix parse) costs one evaluation
    // per shingle row; the per-seed family on top is numHashes cheap ops
    sh.withColumn("_x", scheme.prep(col("g")))
      .groupBy("doc_id")
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until numHashes).map(i => col(s"_h$i")): _*).as("signature"))
  }

  /** LSH banding: split the signature into `bands` bands and emit one
    * (doc_id, band, band_hash) row per band; equal band_hash within a band
    * ⇒ candidate pair. Candidate generation is then a self-equi-join on
    * (band, band_hash) — at scale this is the only shuffle, keyed on a
    * 2-int digest, never on text.
    */
  def lshBands(signatures: DataFrame, bands: Int,
               scheme: HashScheme = HashScheme.Fast): DataFrame =
    signatures
      .select(col("doc_id"), posexplode(split_signature(col("signature"), bands)))
      .withColumnRenamed("pos", "band")
      .withColumn("band_hash", scheme.band(col("col")))
      .drop("col")

  private def split_signature(sig: Column, bands: Int): Column = {
    // integer band width: int/int is TRUE division in Spark (double), and
    // a fractional width would overlap bands / drop trailing hashes.
    // Validate divisibility per row — every entry point (not just the
    // minhashCandidates wrapper) must reject bands ∤ numHashes, otherwise
    // floor-width slicing silently drops trailing hashes and recall sinks
    // with no error.
    val width = floor(size(sig) / bands).cast("int")
    val checked = when(size(sig) % bands === 0, width)
      .otherwise(raise_error(concat(
        lit(s"lshBands: bands ($bands) must divide the signature length, got "),
        size(sig).cast("string"))))
    transform(sequence(lit(0), lit(bands - 1)),
      b => slice(sig, b * checked + 1, checked))
  }

  /** Banded frame → candidate pairs (doc_a < doc_b): self-equi-join on
    * the (band, digest) key — the single shared candidate-generation step.
    */
  private def candidatesFromBands(banded: DataFrame): DataFrame = {
    val a = banded.select(col("band").as("b"), col("band_hash").as("h"), col("doc_id").as("doc_a"))
    val b = banded.select(col("band").as("b"), col("band_hash").as("h"), col("doc_id").as("doc_b"))
    a.join(b, Seq("b", "h"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  private def requireBandable(numHashes: Int, bands: Int): Unit =
    require(numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes) — " +
        "split_signature would silently drop the trailing hashes")

  /** Candidate near-duplicate pairs from MinHash LSH (doc_a < doc_b). */
  def minhashCandidates(docs: DataFrame, textCol: String = "text",
                        shingleSize: Int = 3, numHashes: Int = 32,
                        bands: Int = 8,
                        scheme: HashScheme = HashScheme.Fast): DataFrame = {
    requireBandable(numHashes, bands)
    val sigs = minhashSignatures(docs, textCol, shingleSize, numHashes, scheme)
    candidatesFromBands(lshBands(sigs, bands, scheme))
  }

  /** Exact n-gram Jaccard similarity for a pair frame that carries
    * (doc_a, doc_b): |∩| via an exploded equi-join on the shingle value,
    * |∪| = |A| + |B| − |∩|. All joins/aggregates are codegen'd — no
    * interpreted array set-ops — and the work scales with candidate
    * pairs × shingles, never all pairs. Use on LSH candidates.
    */
  def ngramJaccard(pairs: DataFrame, docs: DataFrame, textCol: String = "text",
                   shingleSize: Int = 3): DataFrame =
    ngramJaccardFromRows(pairs, shingleRows(docs, textCol, shingleSize))

  def ngramJaccardFromRows(pairs: DataFrame, sh: DataFrame): DataFrame = {
    // dedupe up front: duplicate caller pairs would fan the shingle joins
    // out and overcount |∩| (jaccard > 1); left joins keep pairs whose
    // doc has no shingle rows (null text) — size 0, jaccard null on 0/0
    val p = pairs.select("doc_a", "doc_b").distinct()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = p
      .join(sh.select(col("doc_id").as("doc_a"), col("g")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("g")), Seq("doc_b", "g"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    p
      .join(inter, Seq("doc_a", "doc_b"), "left_outer")
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")), Seq("doc_a"), "left_outer")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")), Seq("doc_b"), "left_outer")
      .na.fill(0L, Seq("inter", "n_a", "n_b"))
      .withColumn("uni", col("n_a") + col("n_b") - col("inter"))
      // try_divide: uni = 0 (both docs shingle-less) → null, not an ANSI
      // DIVIDE_BY_ZERO error killing the job
      .withColumn("jaccard", round(try_divide(col("inter").cast("double"), col("uni")), 6))
      .select("doc_a", "doc_b", "inter", "uni", "jaccard")
  }

  /** Near-duplicate pairs: LSH candidates verified by exact Jaccard ≥ t.
    *
    * Duplicate-heavy corpora are handled structurally, not by luck: the
    * corpus is first collapsed to one representative per exact content
    * fingerprint, MinHash+LSH+verification run among representatives only,
    * and the verified representative pairs are expanded back to member
    * pairs (identical text ⇒ identical shingle set ⇒ identical signature
    * and jaccard, so the expansion reproduces exactly what bucketing every
    * copy would have produced). m copies of one text therefore cost m
    * fingerprint rows instead of m-sized LSH buckets and m²/2 candidate
    * verifications — the pair OUTPUT is still quadratic in m (that is the
    * contract of pair mode; [[dedupClusters]] is the linear-output API).
    *
    * Caches (member map + representative shingle rows) are eagerly filled
    * and live until the session clears them — pass-managed because the
    * returned plan consumes them lazily; callers running many operators
    * should `spark.catalog.clearCache()` between queries (Bench/Verify do).
    */
  /** (doc_id, fp, rep_id): one row per document with its exact-content
    * fingerprint and the group's canonical (minimum) doc_id.
    */
  private def memberMap(docs: DataFrame, textCol: String): DataFrame =
    docs.select(col("doc_id"), TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .withColumn("rep_id",
        min(col("doc_id")).over(Window.partitionBy(col("fp"))))

  /** LSH-candidate generation + exact-Jaccard verification among an
    * already-deduplicated representative set. Returns (verified pairs,
    * cached shingle rows — the caller may reuse them for sizes).
    */
  private def repNearPairs(reps: DataFrame, textCol: String, threshold: Double,
                           shingleSize: Int, numHashes: Int, bands: Int,
                           scheme: HashScheme): (DataFrame, DataFrame) = {
    val sh = shingleRows(reps, textCol, shingleSize, scheme).cache()
    sh.count()
    val sigs = minhashSignaturesFromRows(sh, numHashes, scheme)
    val candidates = candidatesFromBands(lshBands(sigs, bands, scheme))
    (ngramJaccardFromRows(candidates, sh).where(col("jaccard") >= threshold), sh)
  }

  def nearDuplicates(docs: DataFrame, textCol: String = "text",
                     threshold: Double = 0.8, shingleSize: Int = 3,
                     numHashes: Int = 32, bands: Int = 8,
                     scheme: HashScheme = HashScheme.Fast): DataFrame = {
    requireBandable(numHashes, bands)
    val members = memberMap(docs, textCol).cache()
    members.count()
    val reps = docs.join(
      members.where(col("doc_id") === col("rep_id")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    val (repPairs, sh) =
      repNearPairs(reps, textCol, threshold, shingleSize, numHashes, bands, scheme)
    // cross-group expansion: every member pair inherits its reps' stats
    val ma = members.select(col("rep_id").as("doc_a"), col("doc_id").as("_a"))
    val mb = members.select(col("rep_id").as("doc_b"), col("doc_id").as("_b"))
    val cross = repPairs
      .join(ma, Seq("doc_a")).join(mb, Seq("doc_b"))
      .select(least(col("_a"), col("_b")).as("doc_a"),
        greatest(col("_a"), col("_b")).as("doc_b"),
        col("inter"), col("uni"), col("jaccard"))
    // within-group pairs: jaccard exactly 1 for every group — including
    // empty-text groups, because NGramShingles maps empty input to [""],
    // so even an empty doc has one shingle row (inter = uni = 1). This
    // matches the naive LSH path exactly: identical texts share all bands
    // and verify at jaccard 1, whatever the text.
    val repSizes = sh.groupBy("doc_id").agg(count(lit(1)).as("_n"))
      .withColumnRenamed("doc_id", "rep_id")
    val within = members.select(col("rep_id"), col("doc_id").as("_a"))
      .join(members.select(col("rep_id"), col("doc_id").as("_b")), Seq("rep_id"))
      .where(col("_a") < col("_b"))
      .join(repSizes, Seq("rep_id"))
      .select(col("_a").as("doc_a"), col("_b").as("doc_b"),
        col("_n").as("inter"), col("_n").as("uni"),
        lit(1.0d).as("jaccard"))
    cross.unionByName(within)
  }

  /** Scale path for duplicate-heavy corpora (the common case at 100 TB:
    * boilerplate pages, mirrored documents). [[nearDuplicates]] emits all
    * near-dup PAIRS — m exact copies of one text produce m(m−1)/2 pairs
    * AND m-sized LSH buckets, a quadratic blowup measured 30× at 8× scale
    * on a copy-saturated corpus. This variant collapses exact duplicates
    * first (one representative per content fingerprint), runs MinHash+LSH
    * among representatives only, and returns an edge list:
    *
    *   - kind = "exact": doc_id → its canonical representative
    *   - kind = "near":  representative ↔ representative, jaccard ≥ t
    *
    * Work and output are linear in distinct content + near-dup pairs among
    * distinct texts; a downstream union-find (or iterative join) turns the
    * edges into dedup clusters.
    */
  def nearDuplicateClusters(docs: DataFrame, textCol: String = "text",
                            threshold: Double = 0.8, shingleSize: Int = 3,
                            numHashes: Int = 32, bands: Int = 8,
                            scheme: HashScheme = HashScheme.Fast): DataFrame = {
    requireBandable(numHashes, bands)
    val members = memberMap(docs, textCol).cache()
    members.count()
    val exactEdges = members.where(col("doc_id") =!= col("rep_id"))
      .select(col("doc_id").as("doc_a"), col("rep_id").as("doc_b"),
        lit(1.0d).as("jaccard"), lit("exact").as("kind"))
    val reps = docs.join(
      members.where(col("doc_id") === col("rep_id")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    val (repPairs, _) =
      repNearPairs(reps, textCol, threshold, shingleSize, numHashes, bands, scheme)
    val nearEdges = repPairs
      .select(col("doc_a"), col("doc_b"), col("jaccard"), lit("near").as("kind"))
    exactEdges.unionByName(nearEdges)
  }

  /** Complete cluster-mode dedup: [[nearDuplicateClusters]]' edge list
    * closed into cluster assignments via distributed connected components
    * ([[ConnectedComponents]]) — every document maps to exactly one
    * cluster_id (the minimum doc_id of its duplicate cluster; singletons
    * map to themselves) plus the survivor flag a downstream filter needs.
    *
    * The CC rounds run on the edge list (near-dup pairs + exact-dup
    * links — tiny relative to the corpus); the only corpus-sized step is
    * the final left join of the (node → component) map onto doc ids.
    */
  def dedupClusters(docs: DataFrame, textCol: String = "text",
                    threshold: Double = 0.8, shingleSize: Int = 3,
                    numHashes: Int = 32, bands: Int = 8,
                    scheme: HashScheme = HashScheme.Fast): DataFrame = {
    val edges = nearDuplicateClusters(docs, textCol, threshold, shingleSize,
      numHashes, bands, scheme)
    val comp = ConnectedComponents.assign(edges, "doc_a", "doc_b")
      .withColumnRenamed("node", "doc_id")
    docs.select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left_outer")
      .withColumn("cluster_id", coalesce(col("component"), col("doc_id")))
      .withColumn("is_survivor", col("doc_id") === col("cluster_id"))
      .select("doc_id", "cluster_id", "is_survivor")
  }

  /** Embedding-cosine near-duplicates: random-hyperplane LSH buckets the
    * corpus (Similarity.lshBuckets), exact cosine verifies within-bucket
    * pairs only — the embedding-space analog of [[nearDuplicates]].
    * Output: (id_a, id_b, cosine) with id_a < id_b, cosine ≥ threshold.
    */
  def embeddingNearDuplicates(emb: DataFrame, dim: Int, threshold: Double = 0.95,
                              planes: Int = 12, seed: Long = 42L,
                              idCol: String = "vec_id",
                              vecCol: String = "embedding"): DataFrame = {
    val bucketed = Similarity.lshBuckets(emb, dim, planes, seed, vecCol)
      .select(col(idCol), col(vecCol).as("_v"), col("bucket"))
    val a = bucketed.select(col("bucket"), col(idCol).as("id_a"), col("_v").as("_va"))
    val b = bucketed.select(col("bucket"), col(idCol).as("id_b"), col("_v").as("_vb"))
    a.join(b, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine", Similarity.cosine(col("_va"), col("_vb")))
      .where(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
      .distinct()
  }

  /** (bucket, idCol, vecCol) rows under the seeded hyperplane family —
    * the working grain of [[EmbeddingIndex]] and the incremental probe.
    */
  def embeddingBucketRows(emb: DataFrame, dim: Int, planes: Int, seed: Long,
                          idCol: String = "vec_id",
                          vecCol: String = "embedding"): DataFrame =
    Similarity.lshBuckets(emb, dim, planes, seed, vecCol)
      .select(col("bucket"), col(idCol), col(vecCol))

  /** Build the embedding index over a corpus — bucket every vector once;
    * `cached()` or `write()` the result so each increment batch pays
    * only its own bucketing.
    */
  def buildEmbeddingIndex(corpus: DataFrame, dim: Int, planes: Int = 12,
                          seed: Long = 42L, idCol: String = "vec_id",
                          vecCol: String = "embedding"): EmbeddingIndex =
    EmbeddingIndex(embeddingBucketRows(corpus, dim, planes, seed, idCol, vecCol),
      dim, planes, seed, idCol, vecCol)

  /** Incremental embedding near-dup: bucket the increment under the
    * INDEX's plane family, equi-join stored buckets, verify by exact
    * cosine — candidates are (new, indexed) pairs only, so the volume is
    * driven by the increment, never the corpus (the embedding twin of
    * the [[nearDuplicatesAgainst]] index overload). id spaces must be
    * disjoint. Output: (id_new, id_indexed, cosine ≥ threshold, 6 dp).
    */
  def embeddingNearDuplicatesAgainst(newVecs: DataFrame, index: EmbeddingIndex,
                                     threshold: Double = 0.95): DataFrame = {
    val probe = embeddingBucketRows(newVecs, index.dim, index.planes,
        index.seed, index.idCol, index.vecCol)
      .select(col("bucket"), col(index.idCol).as("id_new"),
        col(index.vecCol).as("_vn"))
    val stored = index.buckets
      .select(col("bucket"), col(index.idCol).as("id_indexed"),
        col(index.vecCol).as("_vi"))
    stored.join(probe, Seq("bucket"))
      .withColumn("cosine", Similarity.cosine(col("_vn"), col("_vi")))
      .where(col("cosine") >= threshold)
      .select(col("id_new"), col("id_indexed"),
        round(col("cosine"), 6).as("cosine"))
      .distinct()
  }

  /** 64-bit SimHash per document: explode token hashes once, then vote all
    * 64 bits via 64 conditional sum-aggregates in a single groupBy —
    * whole-stage codegen with map-side partial aggregation, one shuffle of
    * (doc_id, 64 ints). (A per-bit explode multiplies the shuffle by 64;
    * measured 30× slower.) Distributes: no document's token set ever sits
    * in one buffer.
    */
  def simhash(docs: DataFrame, textCol: String = "text",
              scheme: HashScheme = HashScheme.Fast): DataFrame = {
    val bits = scheme.simhashBits
    val toks = TextAnalysis.tokens(TextAnalysis.normalized(col(textCol)))
    val hashed = docs.select(col("doc_id"), explode(toks).as("tok"))
      .withColumn("h", scheme.tokenHash(col("tok")))
    val votes = (0 until bits).map(b =>
      sum(when(expr(s"shiftright(h, $b)").bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"_b$b"))
    val agg = hashed.groupBy("doc_id")
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until bits).map(b => when(col(s"_b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
    // empty/null-text docs have no token rows and would vanish in the
    // explode; keep them with the 0 sentinel so output covers the corpus
    docs.select("doc_id").join(agg, Seq("doc_id"), "left_outer")
      .na.fill(0L, Seq("simhash"))
  }

  /** SimHash near-duplicate pairs via pigeonhole banding: fingerprints
    * within Hamming distance ≤ `maxHamming` must agree EXACTLY on at
    * least one of `maxHamming + 1` bit bands (pigeonhole: ≤ maxHamming
    * flipped bits cannot touch every band), so candidate generation is a
    * self-equi-join on (band index, band bits) — one digest-keyed
    * shuffle, never all-pairs — and verification is one
    * popcount(xor) ≤ maxHamming per candidate. Output:
    * (doc_a < doc_b, hamming).
    *
    * Scale notes: band slices are ≤ bits/(maxHamming+1) wide, so random
    * 2^-15-ish collisions keep buckets tiny on natural corpora; like
    * every banding scheme here, EXACT duplicates share all bands —
    * collapse them first on dup-heavy corpora (the
    * [[nearDuplicateClusters]] composition contract). The final band of
    * an uneven split absorbs the remainder bits.
    */
  def simhashNearDuplicates(docs: DataFrame, textCol: String = "text",
                            maxHamming: Int = 3,
                            scheme: HashScheme = HashScheme.Fast): DataFrame =
    bandedHammingPairs(
      simhash(docs, textCol, scheme).select(col("doc_id"), col("simhash").as("fp")),
      scheme.simhashBits, maxHamming)

  /** Pigeonhole-banded Hamming-distance self-join over ANY 64-bit-or-less
    * fingerprint frame `(doc_id, fp)` — the candidate/verify kernel
    * shared by [[simhashNearDuplicates]] and the perceptual-hash media
    * dedup ([[Multimodal.phashNearDuplicates]]). Fingerprints within
    * Hamming distance ≤ `maxHamming` must agree EXACTLY on at least one
    * of `maxHamming + 1` bit bands (≤ maxHamming flipped bits cannot
    * touch every band), so candidates come from a self-equi-join on
    * (band index, band bits) — one digest-keyed shuffle, never
    * all-pairs — and verification is one popcount(xor) ≤ maxHamming per
    * candidate. Output: (doc_a < doc_b, hamming). Exact-duplicate
    * fingerprints share all bands — collapse them first on dup-heavy
    * corpora (the [[nearDuplicateClusters]] composition contract).
    */
  def bandedHammingPairs(fp: DataFrame, bits: Int, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0, s"maxHamming must be >= 0, got $maxHamming")
    require(bits >= 1 && bits <= 64, s"bits must be in [1, 64], got $bits")
    val bands = maxHamming + 1
    require(bands <= bits, s"maxHamming + 1 ($bands) bands need <= $bits bits")
    val width = bits / bands
    // unsigned shift: 64-bit fingerprint families (xxhash64 simhash,
    // 8x8 average hash) use the sign bit as payload
    val slices = (0 until bands).map { b =>
      val w = if (b == bands - 1) bits - b * width else width
      // w = 64 (maxHamming = 0, 64-bit family): (1L << 64) wraps to 1
      // and the mask would be 0, collapsing EVERY fingerprint into one
      // bucket — an accidental all-pairs join; -1L is the identity mask
      val mask = if (w >= 64) -1L else (1L << w) - 1
      struct(lit(b).as("band"),
        shiftrightunsigned(col("fp"), b * width)
          .bitwiseAND(lit(mask)).as("v"))
    }
    val banded = fp.select(col("doc_id"), col("fp"),
      explode(array(slices: _*)).as("_s"))
      .select(col("doc_id"), col("fp"),
        col("_s.band").as("band"), col("_s.v").as("v"))
    val a = banded.select(col("band"), col("v"),
      col("doc_id").as("doc_a"), col("fp").as("_sa"))
    val b = banded.select(col("band"), col("v"),
      col("doc_id").as("doc_b"), col("fp").as("_sb"))
    a.join(b, Seq("band", "v"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "_sa", "_sb").distinct()
      .withColumn("hamming", bit_count(col("_sa").bitwiseXOR(col("_sb"))))
      .where(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Incremental exact dedup — the daily-batch pattern: drop arriving
    * documents whose normalized content already exists in the corpus.
    * The anti-join key is the 16-byte fingerprint, so the corpus
    * contributes one digest row per document regardless of text size;
    * at 100 TB, persist that digest index bucketed by `fp` so only the
    * (small) batch shuffles per increment.
    */
  def dedupAgainstExact(newDocs: DataFrame, corpus: DataFrame,
                        textCol: String = "text"): DataFrame = {
    val idx = corpus.select(TextAnalysis.fingerprint(col(textCol)).as("fp")).distinct()
    newDocs.join(idx,
      TextAnalysis.fingerprint(newDocs(textCol)) === idx("fp"), "left_anti")
  }

  /** [[dedupAgainstExact]] with a Bloom pre-filter — the scale tier the
    * DocStream scaladoc promised: a driver-built filter over the corpus
    * fingerprints routes the increment BEFORE the join. Bloom-negative
    * docs are DEFINITELY novel (no false negatives) and skip the
    * anti-join shuffle entirely; only might-contain docs — true dups
    * plus the fpp false positives — pay the join, which still makes the
    * final call, so the RESULT is identical to the plain anti-join (the
    * oracle checks exactly that). On a daily loop where most arriving
    * content is novel, the shuffled volume drops from the whole
    * increment to ~(dup rate + fpp) of it.
    *
    * @param expectedItems sizing for the filter (distinct corpus
    *        fingerprints); pass the known index cardinality to avoid the
    *        counting job. ~1.2 MB per million items at fpp 0.01 — the
    *        bloom tier applies while the filter broadcasts (≲10⁹ fps);
    *        beyond, use [[dedupAgainstExact]]'s partitioned join alone.
    */
  def dedupAgainstExactBloom(newDocs: DataFrame, corpus: DataFrame,
                             textCol: String = "text",
                             expectedItems: Long = 0L,
                             fpp: Double = 0.01): DataFrame = {
    val fpCorpus = corpus.select(TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .distinct()
    val n = if (expectedItems > 0L) expectedItems else math.max(fpCorpus.count(), 1L)
    val bloom = graft.functions.BloomOps.buildFilter(fpCorpus, "fp", n, fpp)
    val probe = graft.functions.BloomOps.mightContain(
      TextAnalysis.fingerprint(newDocs(textCol)), bloom)
    val definitelyNew = newDocs.where(!probe)
    val verified = newDocs.where(probe).join(fpCorpus,
      TextAnalysis.fingerprint(newDocs(textCol)) === fpCorpus("fp"), "left_anti")
    definitelyNew.unionByName(verified)
  }

  /** Corpus-side MinHash artifacts, computed once: shingle rows plus the
    * banded LSH rows derived from them. Combine with [[SignatureIndex
    * .cached]] (bands then read the cached shingles, so corpus text is
    * shingled exactly once) or [[SignatureIndex.write]] for reuse across
    * increment batches / sessions.
    */
  def buildSignatureIndex(corpus: DataFrame, textCol: String = "text",
                          shingleSize: Int = 3, numHashes: Int = 32,
                          bands: Int = 8,
                          scheme: HashScheme = HashScheme.Fast): SignatureIndex = {
    requireBandable(numHashes, bands)
    val sh = shingleRows(corpus, textCol, shingleSize, scheme)
    SignatureIndex(sh,
      lshBands(minhashSignaturesFromRows(sh, numHashes, scheme), bands, scheme),
      shingleSize, numHashes, bands, scheme)
  }

  /** Incremental near-dup detection: LSH candidates restricted to
    * (batch doc, corpus doc) pairs, then exact-Jaccard verified — the
    * batch never self-pairs and the corpus never self-joins, so the
    * candidate volume is driven by the batch size, not the corpus.
    * doc_id spaces of batch and corpus must be disjoint (the shared
    * shingle frame is keyed by doc_id).
    *
    * This convenience form rebuilds the corpus index per call; a
    * production increment loop should build the index once
    * ([[buildSignatureIndex]] + cached()/write()) and call the index
    * overload so each batch's cost is batch-proportional.
    */
  def nearDuplicatesAgainst(newDocs: DataFrame, corpus: DataFrame,
                            textCol: String = "text", threshold: Double = 0.8,
                            shingleSize: Int = 3, numHashes: Int = 32,
                            bands: Int = 8,
                            scheme: HashScheme = HashScheme.Fast): DataFrame =
    nearDuplicatesAgainst(newDocs,
      buildSignatureIndex(corpus, textCol, shingleSize, numHashes, bands, scheme),
      textCol, threshold)

  /** Index overload: the corpus side comes entirely from the prebuilt
    * [[SignatureIndex]] — no corpus text is scanned, no shingle or
    * signature recompute (PlanSpec pins that the corpus side plans only
    * index scans). Batch-side work is the only per-increment cost.
    */
  def nearDuplicatesAgainst(newDocs: DataFrame, index: SignatureIndex,
                            textCol: String, threshold: Double): DataFrame = {
    val shNew = shingleRows(newDocs, textCol, index.shingleSize, index.scheme).cache()
    shNew.count()
    val bNew = lshBands(
        minhashSignaturesFromRows(shNew, index.numHashes, index.scheme),
        index.numBands, index.scheme)
      .select(col("band").as("b"), col("band_hash").as("h"), col("doc_id").as("doc_a"))
    val bCorp = index.bands
      .select(col("band").as("b"), col("band_hash").as("h"), col("doc_id").as("doc_b"))
    val cand = bNew.join(bCorp, Seq("b", "h")).select("doc_a", "doc_b").distinct()
    ngramJaccardFromRows(cand, shNew.unionByName(index.shingles))
      .where(col("jaccard") >= threshold)
  }

  /** Character-level verification of candidate pairs: Levenshtein edit
    * ratio 1 − lev/max(len) — the strictest confirm tier, below the
    * shingle-Jaccard verify (token-insensitive: catches single-char
    * edits Jaccard's shingle grain smooths over). O(len²) per PAIR, so
    * it runs on CANDIDATES (LSH/SimHash output — bounded), never
    * corpus×corpus; the join is id-keyed, the ratio a shuffle-free
    * projection.
    *
    * Output: pairs with (lev, ratio — 6dp) where ratio ≥ threshold.
    */
  /** Per-document distinctness — the self-BLEU-style diversity
    * diagnostic at corpus scale: what fraction of a document's
    * shingles also appear in OTHER documents. Template floods, mirror
    * farms, and boilerplate-heavy sources score near 1 long before
    * near-dup pairs form (sharing is sub-threshold but pervasive);
    * the per-source rollup of this column is the "how templated is
    * this source" card line. One shingle-census join (shingle →
    * n_docs), per-doc partial agg — never doc×doc. Output:
    * (doc_id, n_shingles, n_shared, shared_frac 6dp).
    */
  def distinctness(docs: DataFrame, textCol: String = "text",
                   shingleSize: Int = 3): DataFrame = {
    val sh = shingleRows(docs, textCol, shingleSize)
    val census = sh.groupBy("g").agg(count_distinct(col("doc_id")).as("df"))
    sh.join(census, Seq("g"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") > 1L, 1L).otherwise(0L)).as("n_shared"))
      .withColumn("shared_frac",
        round(col("n_shared").cast("double") / col("n_shingles"), 6))
  }

  /** Split-leakage audit — COUNT the contamination doc-grain splitting
    * causes: two exact copies hashed to different splits mean the eval
    * set contains training text verbatim. Given per-doc split
    * assignments, counts cross-split pairs of distinct docs sharing a
    * content fingerprint, as a (split_a < split_b, n_pairs) matrix —
    * the number every "we deduplicated train against test" claim
    * should cite. Fingerprint-grain census (per fp: docs per split,
    * cross counts multiply as na·nb), never a pair join; output is
    * splits²-bounded. [[HashSplit.groupSafeSplits]] keyed on the
    * fingerprint drives this to zero by construction.
    */
  def splitLeakage(docs: DataFrame, assignments: DataFrame,
                   textCol: String = "text"): DataFrame = {
    val fp = docs.select(col("doc_id"),
        TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .where(col("fp").isNotNull)
      .join(assignments.select(col("doc_id"), col("split")), Seq("doc_id"))
    val perSplit = fp.groupBy("fp", "split").agg(count(lit(1)).as("n"))
    val a = perSplit.select(col("fp"), col("split").as("split_a"),
      col("n").as("na"))
    val b = perSplit.select(col("fp"), col("split").as("split_b"),
      col("n").as("nb"))
    a.join(b, Seq("fp"))
      .where(col("split_a") < col("split_b"))
      .groupBy("split_a", "split_b")
      .agg(sum((col("na") * col("nb")).cast("decimal(38,0)"))
        .cast("long").as("n_pairs"))
  }

  /** LSH recall/precision harness — MEASURE the banding scheme instead
    * of trusting the (1−(1−J^r)^b) curve: exact all-pairs shingle
    * Jaccard is the ground truth, MinHash-LSH candidates are the
    * system under test, and the report says what fraction of true
    * ≥threshold pairs the bands surfaced (recall — LSH's only error
    * direction, since verification is exact) and how much junk they
    * admitted (candidate precision — the verify-stage cost knob).
    *
    * TEST-HARNESS SCALE CONTRACT: the truth side is an all-pairs
    * O(n²) cross join — run on a bounded stratum (the e_ann_recall
    * pattern), never the corpus; the production path stays
    * [[nearDuplicates]]. One shingle pass is shared by truth,
    * signatures, and verification. Output one row:
    * (n_truth, n_candidates, n_verified, recall, precision).
    */
  def lshRecallReport(docs: DataFrame, threshold: Double = 0.8,
                      shingleSize: Int = 3, numHashes: Int = 32,
                      bands: Int = 8, scheme: HashScheme = HashScheme.Fast,
                      textCol: String = "text"): DataFrame = {
    requireBandable(numHashes, bands)
    val sh = shingleRows(docs, textCol, shingleSize, scheme).cache()
    sh.count()
    val ids = docs.select(col("doc_id")).distinct()
    val allPairs = ids.select(col("doc_id").as("doc_a"))
      .crossJoin(ids.select(col("doc_id").as("doc_b")))
      .where(col("doc_a") < col("doc_b"))
    val truth = ngramJaccardFromRows(allPairs, sh)
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b").cache()
    val cand = candidatesFromBands(
      lshBands(minhashSignaturesFromRows(sh, numHashes, scheme), bands,
        scheme)).cache()
    val nTruth = truth.count()
    val nCand = cand.count()
    val nVerified = ngramJaccardFromRows(cand, sh)
      .where(col("jaccard") >= threshold).count()
    val hits = cand.join(truth, Seq("doc_a", "doc_b")).count()
    require(hits == nVerified,
      s"verify ⊆ truth violated: $hits hits vs $nVerified verified")
    val sp = docs.sparkSession
    import sp.implicits._
    Seq((nTruth, nCand, nVerified,
        if (nTruth == 0) 1.0 else math.rint(nVerified.toDouble / nTruth * 1e6) / 1e6,
        if (nCand == 0) 1.0 else math.rint(hits.toDouble / nCand * 1e6) / 1e6))
      .toDF("n_truth", "n_candidates", "n_verified", "recall", "precision")
  }

  /** Threshold sweep — the TUNING view of near-dup verification: for a
    * grid of Jaccard thresholds (integer percent), how many candidate
    * pairs clear each bar, how many documents they touch, and how many
    * documents the one-pass keep-min-id policy would remove. Running
    * this once on a candidate set answers "what does raising the bar
    * from 0.7 to 0.8 actually cost" WITHOUT re-running the pipeline per
    * threshold. Beyond-reference surface (SURVEY §2.13).
    *
    * Exactness: the threshold test is integer — round(jaccard·1e6) ≥
    * pct·10⁴ on the already-6dp Jaccard — so grid membership replays
    * engine-exactly. Scale shape: ONE exact-verify pass over the
    * candidate pairs ([[ngramJaccardFromRows]] — pairs × shingles,
    * never all-pairs), then the grid (≤10 thresholds) multiplies only
    * the SURVIVING pair census; distinct-doc counts shuffle two-phase
    * on (threshold, doc). Zero-pair thresholds densify via a left join
    * against the broadcast grid.
    *
    * Output: (t_pct, n_pairs, n_docs, n_removed) — one row per
    * threshold, removed = distinct larger ids of clearing pairs.
    */
  def thresholdSweep(pairs: DataFrame, docs: DataFrame,
                     thresholds: Seq[Int] = Seq(30, 40, 50, 60, 70, 80, 90),
                     textCol: String = "text",
                     shingleSize: Int = 3): DataFrame = {
    require(thresholds.nonEmpty && thresholds.forall(t => t >= 0 && t <= 100),
      s"thresholds must be percents in [0, 100]: $thresholds")
    val j = ngramJaccard(pairs, docs, textCol, shingleSize)
      .where(col("jaccard").isNotNull)
      .withColumn("jac_micro", round(col("jaccard") * 1e6).cast("long"))
    val gridLits = array(thresholds.map(t => lit(t.toLong)): _*)
    val grid = pairs.sparkSession.range(1)
      .select(explode(gridLits).as("t_pct"))
    val tagged = j.select(col("doc_a"), col("doc_b"), col("jac_micro"),
        explode(gridLits).as("t_pct"))
      .where(col("jac_micro") >= col("t_pct") * lit(10000L))
    val pairAgg = tagged.groupBy("t_pct")
      .agg(count(lit(1)).as("n_pairs"),
        count_distinct(greatest(col("doc_a"), col("doc_b"))).as("n_removed"))
    val docAgg = tagged
      .select(col("t_pct"),
        explode(array(col("doc_a"), col("doc_b"))).as("d"))
      .groupBy("t_pct").agg(count_distinct(col("d")).as("n_docs"))
    grid
      .join(pairAgg, Seq("t_pct"), "left_outer")
      .join(docAgg, Seq("t_pct"), "left_outer")
      .na.fill(0L, Seq("n_pairs", "n_docs", "n_removed"))
      .select("t_pct", "n_pairs", "n_docs", "n_removed")
  }

  def editVerify(pairs: DataFrame, docs: DataFrame, threshold: Double,
                 textCol: String = "text"): DataFrame = {
    require(threshold >= 0 && threshold <= 1,
      s"threshold must be in [0, 1], got $threshold")
    val t = docs.select(col("doc_id"), coalesce(col(textCol), lit("")).as("_t"))
    pairs
      .join(t.select(col("doc_id").as("doc_a"), col("_t").as("_ta")), "doc_a")
      .join(t.select(col("doc_id").as("doc_b"), col("_t").as("_tb")), "doc_b")
      .withColumn("lev", levenshtein(col("_ta"), col("_tb")))
      .withColumn("ratio",
        round(lit(1.0) - col("lev") /
          greatest(length(col("_ta")), length(col("_tb")), lit(1)), 6))
      .where(col("ratio") >= threshold)
      .select("doc_a", "doc_b", "lev", "ratio")
  }
}
