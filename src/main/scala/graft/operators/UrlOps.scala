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
}
