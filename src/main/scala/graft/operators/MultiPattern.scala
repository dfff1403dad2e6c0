package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Multi-pattern substring tagging — the blocklist/badword filter of a
  * crawl-curation pipeline (C4 drops any page containing a listed phrase;
  * policy filters tag documents against 10k+ term lists).
  *
  * Semantics: a pattern HITS a document iff it occurs as a contiguous
  * substring of the case-folded text (ASCII lowercase — the fold an
  * external SQL `lower()` reproduces). Output per document: the distinct
  * matched patterns, sorted, plus their count — downstream policy decides
  * drop/keep/weight.
  *
  * Two executions of the same contract:
  *
  *  - [[tagMatches]] (default): one Aho–Corasick automaton pass per
  *    document — O(len + hits) regardless of pattern count. The automaton
  *    is built ONCE on the driver from the pattern list and ships to
  *    executors via the closure (serialized trie ≈ total pattern bytes),
  *    so a 100k-term list costs each task a hash-map walk, not 100k
  *    substring scans. `mapPartitions` is justified the same way the
  *    media decoders are: an inherently imperative state-machine walk
  *    over each value, amortized per partition, no per-row allocation of
  *    the machine.
  *  - [[tagMatchesScan]]: the declarative twin — `filter(patterns,
  *    p -> contains(text, p))` as a codegen'd higher-order function.
  *    O(len · patterns) per document, which is fine for dozens of
  *    patterns and is exactly replayable in an external engine; the
  *    oracle runs this shape, and the spec pins automaton ≡ scan.
  *
  * Scale: both paths are shuffle-free projections (plan-pinned); the
  * pattern list broadcasts with the task closure, never joins.
  */
object MultiPattern {

  /** Aho–Corasick automaton: goto trie + BFS fail links with outputs
    * propagated through fail chains at build time (match-time walk never
    * follows fail links for output collection). Immutable and
    * serializable — build once, ship in the task closure.
    */
  final class AhoCorasick private (gotoMaps: Array[Map[Char, Int]],
                                   fail: Array[Int],
                                   out: Array[Array[Int]]) extends Serializable {

    /** Indices (into the build-time pattern list) of all patterns
      * occurring in `text`, ascending.
      */
    def matches(text: String): Array[Int] = {
      val acc = new java.util.BitSet()
      var s = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        while (s != 0 && !gotoMaps(s).contains(c)) s = fail(s)
        s = gotoMaps(s).getOrElse(c, 0)
        val o = out(s)
        var j = 0
        while (j < o.length) { acc.set(o(j)); j += 1 }
        i += 1
      }
      val res = new Array[Int](acc.cardinality())
      var b = acc.nextSetBit(0)
      var k = 0
      while (b >= 0) { res(k) = b; k += 1; b = acc.nextSetBit(b + 1) }
      res
    }
  }

  object AhoCorasick {
    /** Build from already-case-folded patterns. Empty patterns are
      * rejected (an empty needle "matches" everywhere and would make
      * every policy decision vacuous — a list-hygiene bug worth failing
      * loudly on).
      */
    def build(patterns: Seq[String]): AhoCorasick = {
      require(patterns.nonEmpty, "empty pattern list")
      require(patterns.forall(_.nonEmpty), "empty-string pattern in blocklist")
      val gotoMaps = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
      val outSets = mutable.ArrayBuffer(mutable.Set.empty[Int])
      patterns.zipWithIndex.foreach { case (p, idx) =>
        var s = 0
        p.foreach { c =>
          s = gotoMaps(s).getOrElseUpdate(c, {
            gotoMaps += mutable.Map.empty[Char, Int]
            outSets += mutable.Set.empty[Int]
            gotoMaps.size - 1
          })
        }
        outSets(s) += idx
      }
      val fail = new Array[Int](gotoMaps.size)
      val queue = mutable.Queue.empty[Int]
      gotoMaps(0).valuesIterator.foreach { s => fail(s) = 0; queue += s }
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        gotoMaps(u).foreach { case (c, v) =>
          queue += v
          var f = fail(u)
          while (f != 0 && !gotoMaps(f).contains(c)) f = fail(f)
          fail(v) = gotoMaps(f).get(c).filter(_ != v).getOrElse(0)
          outSets(v) ++= outSets(fail(v))
        }
      }
      new AhoCorasick(gotoMaps.map(_.toMap).toArray, fail,
        outSets.map(_.toArray.sorted).toArray)
    }
  }

  /** Sample blocklist for gates/specs — phrases over the synthetic
    * corpus vocabulary, with engineered structure: nested patterns
    * ("scan" ⊂ "slow scan" — both must hit on the phrase), a pattern
    * that shares a prefix with another ("table" / "tab"), multi-word
    * phrases, and terms that never occur. Swap for a real term list via
    * the `patterns` argument.
    */
  val sampleBlocklist: Seq[String] = Seq(
    "spark", "slow scan", "scan", "hash join", "vector", "tab", "table",
    "merge batch", "customer query", "qqzz never occurs", "windowless")

  private def validated(patterns: Seq[String]): Seq[String] = {
    // patterns fold via Java toLowerCase but document text folds via SQL
    // lower() — for non-ASCII the two case mappings can disagree (even on
    // length: İ, ẞ), silently breaking automaton ≡ scan ≡ oracle. ASCII
    // is the documented contract; enforce it rather than half-support it.
    patterns.foreach(p => require(p.forall(_ < 0x80),
      s"blocklist patterns must be ASCII (fold parity with SQL lower()): '$p'"))
    val folded = patterns.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
    require(folded.forall(_.nonEmpty), "empty-string pattern in blocklist")
    folded
  }

  /** Aho–Corasick tagging: (doc_id, n_hits, hits sorted array). Null
    * text tags as zero hits (the document row survives — dropping it is
    * the caller's policy, not the tagger's).
    */
  def tagMatches(docs: DataFrame, patterns: Seq[String] = sampleBlocklist,
                 textCol: String = "text"): DataFrame = {
    val folded = validated(patterns)
    val ac = AhoCorasick.build(folded)
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("n_hits", IntegerType),
      StructField("hits", ArrayType(StringType))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    // sorted pattern strings by index: matches() returns pattern indices
    // ascending; map to strings then sort for a deterministic,
    // order-insensitive contract
    docs.select(col("doc_id"),
        lower(coalesce(col(textCol), lit(""))).as("_t"))
      .mapPartitions { rows =>
        rows.map { r =>
          val hit = ac.matches(r.getString(1)).map(folded)
          scala.util.Sorting.quickSort(hit)
          Row(r.getLong(0), hit.length, hit.toSeq)
        }
      }(enc)
  }

  /** Declarative twin: higher-order `filter` over the pattern array with
    * a `contains` lambda — whole-stage-codegen, O(len · patterns), and
    * directly replayable in external SQL. Same output contract as
    * [[tagMatches]].
    */
  def tagMatchesScan(docs: DataFrame, patterns: Seq[String] = sampleBlocklist,
                     textCol: String = "text"): DataFrame = {
    val folded = validated(patterns)
    val pats = array_sort(array(folded.map(lit): _*))
    val hits = filter(pats, p =>
      lower(coalesce(col(textCol), lit(""))).contains(p))
    docs.select(col("doc_id"),
      size(hits).as("n_hits"), hits.as("hits"))
  }

  /** Policy application: keep documents with at most `maxHits` distinct
    * blocklist hits (0 = the C4 drop-any-hit rule).
    */
  def filterBlocked(docs: DataFrame, patterns: Seq[String] = sampleBlocklist,
                    textCol: String = "text", maxHits: Int = 0): DataFrame =
    docs.join(tagMatches(docs, patterns, textCol)
        .where(col("n_hits") > maxHits).select("doc_id"),
      Seq("doc_id"), "left_anti")
}
