package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // words: aaab (freq 2), aab (freq 1)
  private val docs = Seq((1L, "aaab aaab aab")).toDF("doc_id", "text")

  test("hand-computed merge sequence: counts, tiebreaks, application") {
    val r = Bpe.train(docs, nMerges = 3)
    // round 1: (a,a) count 5; round 2: (b,</w>) count 3;
    // round 3: tie at 2 between "a b</w>" and "aa a" — lexicographic
    // ascending picks "a b</w>" (space < 'a')
    assert(r.merges == Seq(("a", "a", 5L), ("b", "</w>", 3L), ("a", "b</w>", 2L)),
      s"unexpected merges: ${r.merges}")
    val census = Bpe.subwordCensus(r)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(census == Map("aa" -> 3L, "ab</w>" -> 2L, "b</w>" -> 1L),
      s"unexpected subword census: $census")
  }

  test("same-symbol runs merge odd occurrences per round (documented variant)") {
    val run = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val r = Bpe.train(run, nMerges = 1)
    assert(r.merges.head._1 == "a" && r.merges.head._2 == "a")
    val syms = r.words.select("syms").head().getString(0)
    // one non-overlapping pass: the consumed boundary space hides the
    // second adjacency until a later round
    assert(syms == "aa a a </w>", s"got '$syms'")
  }

  test("merge table carries rank order; exhaustion fails loudly") {
    val t = Bpe.mergeTable(Bpe.train(docs, nMerges = 2), docs)
      .orderBy("rank").collect()
    assert(t.map(_.getInt(0)).toSeq == Seq(1, 2))
    assert(t.head.getString(3) == "aa", "merged symbol = left+right")
    val e = intercept[IllegalArgumentException] { Bpe.train(docs, nMerges = 1000) }
    assert(e.getMessage.contains("exhausted"))
  }

  test("encodeWords reproduces the training segmentation exactly") {
    val corpus = Seq((1L, "low low low lower lower newest newest newest"),
      (2L, "widest widest low newest")).toDF("doc_id", "text")
    val r = Bpe.train(corpus, nMerges = 6)
    val trained = r.words.select("word", "syms").collect()
      .map(x => x.getString(0) -> x.getString(1)).toMap
    val applied = Bpe.encodeWords(r.merges,
        r.words.select("word")).collect()
      .map(x => x.getString(0) -> x.getString(1)).toMap
    assert(applied == trained,
      "serving-path segmentation must equal the training segmentation")
  }

  test("encode: unseen words fall back through the same replace fold") {
    val corpus = Seq((1L, "low low low lower lower newest newest newest"),
      (2L, "widest widest low newest")).toDF("doc_id", "text")
    val r = Bpe.train(corpus, nMerges = 6)
    // plain-Scala replica of the fold on an UNSEEN word
    def refSyms(word: String): String = {
      // initSyms puts a space after EVERY char, so </w> is its own symbol
      val init = word.toCharArray.map(_.toString).mkString("", " ", " </w>")
      r.merges.foldLeft(init) { case (s, (l, r2, _)) =>
        (" " + s + " ").replace(s" $l $r2 ", s" ${l + r2} ").trim }
    }
    val unseen = Seq((10L, "lowest"), (11L, ""), (12L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Bpe.encode(r.merges, unseen).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2),
        if (x.isNullAt(3)) null else x.getString(3))).toMap
    val want = refSyms("lowest")
    assert(got(10L)._1 == 1L)
    assert(got(10L)._2 == want.split(" ").length.toLong)
    // zero-word docs keep a row with zero counts, null digest
    assert(got(11L) == ((0L, 0L, null)) && got(12L) == ((0L, 0L, null)))
  }

  test("multilingual words symbolize per character") {
    val zh = Seq((1L, "中文 中文")).toDF("doc_id", "text")
    val r = Bpe.train(zh, nMerges = 1)
    // only word "中文" → syms "中 文 </w>"; top pair is ("中", "文") or
    // ("文", "</w>") — counts tie at 2, lexicographic ascending decides
    assert(r.merges.head._3 == 2L)
    assert(Bpe.subwordCensus(r).count() == 2)
  }

  test("byte↔unicode table is the GPT-2 bijection") {
    val t = Bpe.byteToChar
    assert(t.length == 256 && t.distinct.length == 256, "must be a bijection")
    assert(t('A'.toInt) == "A" && t('~'.toInt) == "~" && t(0xFF) == "ÿ")
    // non-printables map into U+0100.. in byte order: byte 0 is the
    // first, space (0x20) the 33rd
    assert(t(0) == "Ā" && t(' '.toInt) == "Ġ")
    assert(t.forall(c => c.length == 1 && !c.charAt(0).isWhitespace))
  }

  test("byte-level merges diverge from char-level on non-ASCII text") {
    // 'ä' is ONE char but TWO UTF-8 bytes (C3 A4 → 'Ã' '¤')
    val d = Seq((1L, "hää hää hää bä")).toDF("doc_id", "text")
    val charR = Bpe.train(d, nMerges = 2)
    val byteR = Bpe.train(d, nMerges = 2, byteLevel = true)
    // char level: top pair is (ä, </w>) count 4 (3×hää + 1×bä)
    assert(charR.merges.head == (("ä", "</w>", 4L)),
      s"unexpected char merges: ${charR.merges}")
    // byte level: the intra-character byte pair (Ã, ¤) dominates (count
    // 7 — every ä occurrence) before any cross-character pair
    assert(byteR.merges.head == (("Ã", "¤", 7L)),
      s"unexpected byte merges: ${byteR.merges}")
    assert(charR.merges.map(m => (m._1, m._2)) !=
      byteR.merges.map(m => (m._1, m._2)))
  }

  test("byte-level encode reproduces the training segmentation; unseen bytes fall back") {
    val d = Seq((1L, "hää hää bä")).toDF("doc_id", "text")
    val r = Bpe.train(d, nMerges = 3, byteLevel = true)
    val enc = Bpe.encodeWords(r.merges,
        Seq("hää", "bä", "xyz").toDF("word"), byteLevel = true)
      .collect().map(x => x.getString(0) -> x.getString(1)).toMap
    val trained = r.words.collect()
      .map(x => x.getString(0) -> x.getString(2)).toMap
    assert(enc("hää") == trained("hää") && enc("bä") == trained("bä"))
    // unseen ascii word stays at byte symbols wherever no merge applies
    assert(enc("xyz").startsWith("x y z"))
  }
}
