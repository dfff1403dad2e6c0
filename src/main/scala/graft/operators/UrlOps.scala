package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL decomposition for web-crawl curation — host, registrable domain,
  * path depth, query-parameter count. Beyond-reference surface (SURVEY
  * §2.13): every crawl pipeline groups by DOMAIN (per-domain caps —
  * [[HashSplit.capPerGroup]] — dataset cards, PageRank seeds), and the
  * domain must be derived from raw URLs at scan time, shuffle-free.
  *
  * All extraction is a regexp/array expression chain inside the RE2 ∩
  * java.util.regex common subset (no lookaround/backrefs), so the
  * DuckDB oracle replays it verbatim and a 100 TB mirror in another
  * engine can too.
  *
  * Registrable domain is the standard two-label rule with a THREE-label
  * carve-out when the second-level label is a well-known public-suffix
  * second level (co/com/net/org/ac/gov/edu — "bbc.co.uk" → "bbc.co.uk").
  * DECLARED HEURISTIC: the full Public Suffix List is a data file, not
  * an algorithm; swap [[PublicSecondLevels]] for the PSL-derived set
  * when exactness matters. Unparseable URLs yield empty host/domain and
  * zero counts — total functions, no exceptions mid-scan.
  */
object UrlOps {

  val PublicSecondLevels: Seq[String] =
    Seq("co", "com", "net", "org", "ac", "gov", "edu")

  /** authority without userinfo/port, lowercased. */
  def host(url: Column): Column = {
    val auth = regexp_extract(lower(url), "^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)
    // strip "user:pass@" prefix, then ":port" suffix
    regexp_replace(regexp_replace(auth, "^[^@]*@", ""), ":[0-9]*$", "")
  }

  /** Registrable domain under the declared heuristic; "" when the host
    * has fewer than two labels.
    */
  def registrableDomain(h: Column): Column = {
    val labels = split(h, "\\.")
    val n = size(labels)
    val lastTwo = array_join(slice(labels, -2, 2), ".")
    val lastThree = array_join(slice(labels, -3, 3), ".")
    when(n < 2, lit(""))
      .when(n >= 3 && element_at(labels, -2).isInCollection(PublicSecondLevels),
        lastThree)
      .otherwise(lastTwo)
  }

  /** Number of non-empty path segments. */
  def pathDepth(url: Column): Column = {
    val path = regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    size(filter(split(path, "/"), s => s =!= ""))
  }

  /** Number of &-separated query parameters ("" → 0). */
  def queryParamCount(url: Column): Column =
    size(filter(split(regexp_extract(url, "\\?([^#]*)", 1), "&"), s => s =!= ""))

  /** (idCol, host, domain, path_depth, n_params) for a URL column. */
  def parse(df: DataFrame, urlCol: String, idCol: String = "doc_id"): DataFrame = {
    val h = host(col(urlCol))
    df.select(col(idCol), h.as("host"),
      registrableDomain(h).as("domain"),
      pathDepth(col(urlCol)).as("path_depth"),
      queryParamCount(col(urlCol)).as("n_params"))
  }

  /** Bundled public-suffix rule snapshot in the PSL's own line syntax
    * (exact suffixes, `*.` wildcards, `!` exceptions) — enough to
    * exercise every rule KIND; production swaps in the full list via
    * [[loadPslRules]] without touching the algorithm. The implicit PSL
    * default rule `*` (every bare TLD is a public suffix) is built into
    * [[registrableDomainsPsl]], not listed.
    */
  val PslSnapshot: Seq[String] = Seq(
    "com", "org", "net", "edu", "gov", "io", "de", "fr", "jp", "uk",
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "co.in",
    "github.io", "gitlab.io", "blogspot.com", "herokuapp.com",
    "s3.amazonaws.com", "cloudfront.net",
    "*.ck", "!www.ck", "*.kawasaki.jp", "!city.kawasaki.jp")

  /** Read a real Public Suffix List file (one rule per line, `//`
    * comments, blank lines) into the rule frame
    * [[registrableDomainsPsl]] consumes.
    */
  def loadPslRules(spark: org.apache.spark.sql.SparkSession,
                   path: String): DataFrame =
    spark.read.text(path)
      .select(trim(col("value")).as("rule"))
      .where(col("rule") =!= "" && !col("rule").startsWith("//"))

  private def rulesFrame(spark: org.apache.spark.sql.SparkSession,
                         rules: Seq[String]): DataFrame = {
    import spark.implicits._
    rules.toDF("rule")
  }

  /** PSL-EXACT registrable domain: longest-match against a rule table
    * with full wildcard (`*.ck`) and exception (`!www.ck`) semantics —
    * the algorithm the Public Suffix List specifies, data-driven so the
    * bundled [[PslSnapshot]] swaps for the real list at scale.
    *
    * Shape: each host explodes into ≤ 2·labels candidate keys (its
    * label suffixes, plus the wildcard form of each — first label
    * replaced by `*`), equi-joined against the BROADCAST rule table,
    * then one groupBy(id) keeps the winning rule: an exception rule
    * cancels its wildcard (public suffix = exception minus one label),
    * otherwise the longest matching suffix wins, with the PSL default
    * rule (`*` — bare TLD) as the floor. Registrable domain = public
    * suffix + one label; hosts that ARE a public suffix yield "".
    * Bounded fan-out, one broadcast join, one partial-agg shuffle —
    * no regex, no per-rule scan.
    */
  def registrableDomainsPsl(df: DataFrame, urlCol: String,
                            rules: Seq[String] = PslSnapshot,
                            idCol: String = "doc_id"): DataFrame = {
    val spark = df.sparkSession
    val parsed = rulesFrame(spark, rules).select(
      when(col("rule").startsWith("!"), substring(col("rule"), 2, 100000))
        .otherwise(col("rule")).as("rkey"),
      when(col("rule").startsWith("!"), "exc")
        .when(col("rule").startsWith("*."), "wild")
        .otherwise("exact").as("rtyp"))
    val h = host(col(urlCol))
    val hosts = df.select(col(idCol), h.as("host"),
      split(h, "\\.").as("_labels"))
      .withColumn("_n", size(col("_labels")))
      .where(col("host") =!= "")
    // candidate keys: for k in 1..n the k-label suffix (exact/exception
    // form), and for k in 2..n its wildcard form "*." + (k−1)-suffix
    val cand = hosts.select(col(idCol), col("_n"),
        explode(flatten(transform(sequence(lit(1), col("_n")), k =>
          array(
            struct(k.as("k"), lit(false).as("wild"),
              array_join(slice(col("_labels"), -k, lit(999)), ".").as("key")),
            struct(k.as("k"), lit(true).as("wild"),
              when(k >= 2, concat(lit("*."),
                array_join(slice(col("_labels"), -(k - lit(1)), lit(999)), ".")))
                .otherwise(lit(null)).as("key")))))).as("c"))
      .select(col(idCol), col("c.k").as("k"), col("c.wild").as("wild"),
        col("c.key").as("key"))
      .where(col("key").isNotNull)
    val matched = cand.join(broadcast(parsed),
      col("key") === col("rkey") &&
        ((col("rtyp") === "wild") === col("wild")) )
    val winner = matched.groupBy(col(idCol)).agg(
      max(when(col("rtyp") === "exc", col("k"))).as("_exck"),
      max(when(col("rtyp") =!= "exc", col("k"))).as("_pubk"))
    hosts.join(winner, Seq(idCol), "left_outer")
      .select(col(idCol), col("host"),
        when(col("_exck").isNotNull, col("_exck") - 1)
          .otherwise(coalesce(col("_pubk"), lit(1))).as("_ps"),
        col("_labels"), col("_n"))
      .select(col(idCol), col("host"),
        when(col("_n") > col("_ps"),
          array_join(slice(col("_labels"), -(col("_ps") + lit(1)), lit(999)), "."))
          .otherwise(lit("")).as("domain"),
        col("_ps").cast("long").as("ps_labels"))
  }
}
