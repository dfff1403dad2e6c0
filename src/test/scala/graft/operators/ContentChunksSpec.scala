package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ContentChunksSpec extends SparkSpec {

  private def chunkRows(texts: Seq[String], minLen: Int = 8,
                        maskBits: Int = 4, maxLen: Int = 64) = {
    import spark.implicits._
    ContentChunks.chunks(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
      col("doc_id"), col("text"), minLen, maskBits, maxLen)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(1))
        .map(r => (r.getLong(2), r.getLong(3), r.getString(4)))).toMap
  }

  private val base = (1 to 40).map(i => s"sentence number $i with words.").mkString(" ")

  test("chunks tile the document exactly") {
    val cs = chunkRows(Seq(base))(0L)
    assert(cs.head._1 === 0L)
    cs.sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0)._1 + w(0)._2 === w(1)._1)
    }
    assert(cs.last._1 + cs.last._2 === base.length.toLong)
  }

  test("every chunk respects min/max bounds except the final partial") {
    val cs = chunkRows(Seq(base))(0L)
    cs.init.foreach { case (_, len, _) =>
      assert(len >= 8L && len <= 64L, s"chunk len $len out of bounds")
    }
    assert(cs.last._2 <= 64L)
    assert(cs.size > 3, "test needs a multi-chunk document")
  }

  test("boundaries are content-defined: a prefix edit re-aligns after one chunk") {
    val edited = "INSERTED PREAMBLE " + base
    val out = chunkRows(Seq(base, edited))
    val origHashes = out(0L).map(_._3).toSet
    val editHashes = out(1L).map(_._3)
    // every original chunk except possibly the first must reappear
    // verbatim in the edited document's chunk set
    val reused = out(0L).drop(1).count(c => editHashes.contains(c._3))
    assert(reused === out(0L).size - 1,
      s"expected all post-edit chunks to re-align, reused=$reused of ${out(0L).size - 1}")
    assert(origHashes.nonEmpty)
  }

  test("short and empty texts") {
    val out = chunkRows(Seq("tiny", ""))
    assert(out(0L) === Seq((0L, 4L, out(0L).head._3)))
    assert(!out.contains(1L), "empty text must produce no chunks")
  }

  test("maxLen forces a cut when the mask never fires") {
    // all-identical characters: the gear hash cycles without zero
    // residues reliably; every full chunk must close at exactly maxLen
    // or at a mask hit — never beyond
    val cs = chunkRows(Seq("a" * 500), minLen = 16, maskBits = 20, maxLen = 50)(0L)
    cs.init.foreach { case (_, len, _) => assert(len <= 50L) }
  }
}
