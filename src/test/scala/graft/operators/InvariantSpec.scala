package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Seeded randomized invariants for the data-ops operators — properties
  * that must hold on ANY input, checked over generated corpora (same
  * style as ConnectedComponentsSpec's union-find trials: deterministic
  * seeds, no flakiness, failures print the seed's trial index).
  */
class InvariantSpec extends SparkSpec {
  import spark.implicits._

  private def randomDocs(seed: Int, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    (1L to n.toLong).map { id =>
      val len = rnd.nextInt(30)
      id -> Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
  }

  test("chunk: full token coverage, stride grid, budgeted sizes") {
    for (trial <- 1 to 3) {
      val docs = randomDocs(100 + trial, 40).toDF("doc_id", "text")
      val maxTokens = 7
      val overlap = 2
      val stride = maxTokens - overlap
      val chunks = SpanDedup.chunk(docs, maxTokens, overlap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getLong(3), r.getLong(4)))
      val byDoc = chunks.groupBy(_._1)
      val toks = docs.select(col("doc_id"),
          TextAnalysis.kernelTokens(col("text")).as("t"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      for ((id, cs) <- byDoc) {
        val sorted = cs.sortBy(_._2)
        // chunk ids are consecutive from 0 and starts follow the stride grid
        assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong),
          s"trial $trial doc $id: chunk ids not consecutive")
        sorted.foreach { case (_, cid, text, start, nTok) =>
          assert(start == cid * stride)
          assert(nTok <= maxTokens && nTok >= 1)
          // chunk text is exactly the token slice it claims
          assert(text == toks(id).slice(start.toInt, start.toInt + nTok.toInt)
            .mkString(" "), s"trial $trial doc $id chunk $cid text mismatch")
        }
        // the last chunk reaches the end of the doc: full coverage
        val (_, _, _, lastStart, lastN) = sorted.last
        assert(lastStart + lastN == toks(id).size,
          s"trial $trial doc $id: tail tokens uncovered")
      }
      // docs with ≥1 token produce ≥1 chunk; empty docs produce none
      assert(byDoc.keySet == toks.filter(_._2.nonEmpty).keySet)
    }
  }

  test("packGreedy: budget respected, every doc packed exactly once") {
    for (trial <- 1 to 3) {
      val rnd = new scala.util.Random(200 + trial)
      val budget = 50L
      // sizes ≤ budget (oversized docs are the caller's contract to chunk
      // first — chunk() caps at maxTokens)
      val docs = (1L to 300L).map(id => (id, rnd.nextInt(50).toLong + 1))
        .toDF("doc_id", "n_tokens")
      val packed = Packing.packGreedy(docs, budget)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(packed.map(_._1).distinct.length == 300, "every doc exactly once")
      val byPack = packed.groupBy(_._3)
      byPack.foreach { case (pid, ds) =>
        assert(ds.map(_._2).sum <= budget,
          s"trial $trial pack $pid exceeds budget: ${ds.map(_._2).sum}")
      }
    }
  }

  test("portable hash family: range bounds and determinism") {
    val p = HashScheme.Portable.P
    for (i <- 0 until 64) {
      val a = HashScheme.Portable.affineA(i)
      val b = HashScheme.Portable.affineB(i)
      assert(a >= 1 && a < p, s"seed $i: multiplier $a out of [1, p)")
      assert(b >= 0 && b < p, s"seed $i: offset $b out of [0, p)")
      assert(a == HashScheme.Portable.affineA(i), "must be deterministic")
    }
    // seeded() stays in [0, p) for arbitrary prepped inputs
    val xs = Seq(0L, 1L, p - 1, p / 2).toDF("x")
    val out = xs.select((0 until 8).map(i =>
      HashScheme.Portable.seeded(col("x"), i).as(s"h$i")): _*).collect()
    out.foreach(r => (0 until 8).foreach { i =>
      val h = r.getLong(i)
      assert(h >= 0 && h < p, s"seeded($i) out of range: $h")
    })
  }

  test("int8 quantization: values bounded, reconstruction within half-step") {
    for (trial <- 1 to 3) {
      val rnd = new scala.util.Random(300 + trial)
      val vecs = (1L to 50L).map(id =>
        (id, Seq.fill(16)((rnd.nextDouble() * 4 - 2).toFloat)))
        .toDF("vec_id", "embedding")
      val q = Quantize.int8(vecs).collect()
        .map(r => r.getLong(0) -> (r.getDouble(1), r.getSeq[Int](2))).toMap
      val orig = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
      for ((id, (scale, qv)) <- q) {
        assert(qv.forall(x => x >= -127 && x <= 127), s"trial $trial id $id")
        // scale was rounded to 9dp for the oracle → allow that rounding in
        // the reconstruction bound too
        val eps = scale * 0.5 + 1e-6 + 64 * 0.5e-9
        qv.zip(orig(id)).foreach { case (qi, vi) =>
          assert(math.abs(qi * scale - vi) <= eps,
            s"trial $trial id $id: |$qi * $scale - $vi| > $eps")
        }
      }
    }
  }

  test("assignSplits: deterministic, exhaustive, disjoint, ~proportional") {
    val docs = randomDocs(400, 600).toDF("doc_id", "text")
    def splits() = HashSplit.assignSplits(docs, col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val s1 = splits()
    assert(s1 == splits(), "split assignment must be deterministic")
    assert(s1.size == 600, "every row assigned to exactly one split")
    val counts = s1.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    // md5 is uniform; 600 draws at p=0.8 keep |x/n − p| well under 0.1
    assert(math.abs(counts("train") / 600.0 - 0.8) < 0.1,
      s"train fraction drifted: ${counts("train") / 600.0}")
  }

  test("simhashNearDuplicates ≡ brute force on random corpora") {
    for (trial <- 1 to 2) {
      val docs = randomDocs(500 + trial, 30).toDF("doc_id", "text")
      for (t <- Seq(0, 3, 7)) {
        val got = Dedup.simhashNearDuplicates(docs, maxHamming = t)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        val fp = Dedup.simhash(docs)
        val brute = fp.select(col("doc_id").as("doc_a"), col("simhash").as("sa"))
          .crossJoin(fp.select(col("doc_id").as("doc_b"), col("simhash").as("sb")))
          .where(col("doc_a") < col("doc_b"))
          .withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))))
          .where(col("hamming") <= t)
          .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(4))).toSet
        assert(got == brute, s"trial $trial t=$t: banded ${got.size} != brute ${brute.size}")
      }
    }
  }

  test("rangeJoin: equals the naive theta join on random data, any width") {
    for (trial <- 1 to 3) {
      val rnd = new scala.util.Random(700 + trial)
      val points = (1L to 60L).map(i => (i, rnd.nextInt(1000).toLong))
        .toDF("pid", "p")
      val intervals = (1L to 25L).map { i =>
        val s = rnd.nextInt(1000).toLong
        (i, s, s + rnd.nextInt(120).toLong)
      }.toDF("iid", "s", "e")
      val naive = points.join(intervals, $"p" >= $"s" && $"p" < $"e")
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      for (w <- Seq(1L, 17L, 64L, 500L)) {
        val got = RangeJoin.bucketed(points, intervals, "p", "s", "e", w)
          .select("pid", "iid").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        assert(got.length == got.toSet.size, s"trial $trial w=$w: duplicates")
        assert(got.toSet == naive, s"trial $trial w=$w: mismatch")
      }
    }
  }

  test("pageRank: mass conserved (within rounding) when no node dangles") {
    for (trial <- 1 to 3) {
      val rnd = new scala.util.Random(800 + trial)
      val n = 20
      // every node gets >= 1 out-edge → no dangling leak
      val edges = (1L to n.toLong).flatMap { i =>
        (0 to rnd.nextInt(3)).map(_ => i -> (rnd.nextInt(n) + 1).toLong)
      }
      val out = PageRank.pageRank(edges.toDF("src", "dst"), iterations = 5)
        .collect().map(_.getLong(1))
      val total = out.sum
      // each round applies <= 1 micro rounding error per node and edge
      val tol = 5L * (n + edges.size)
      assert(math.abs(total - 1000000L) <= tol,
        s"trial $trial: mass $total drifted beyond +-$tol")
      assert(out.forall(_ > 0), s"trial $trial: nonpositive rank")
    }
  }

  test("rrfFuse: fused micro scores recompute from the input ranks") {
    for (trial <- 1 to 3) {
      val rnd = new scala.util.Random(900 + trial)
      def ranking(sys: Int) = (1L to 5L).flatMap { q =>
        rnd.shuffle((1L to 20L).toList).take(8).zipWithIndex
          .map { case (d, i) => (q, d, i + 1) }
      }.toDF("query_id", "doc_id", "rank")
      val a = ranking(1).cache(); val b = ranking(2).cache()
      val expected = (a.collect() ++ b.collect())
        .map(r => (r.getLong(0), r.getLong(1)) ->
          math.round(1.0 / (60.0 + r.getInt(2)) * 1e6))
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val fused = Retrieval.rrfFuse(Seq(a, b), topK = 40)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(fused == expected, s"trial $trial: fusion mismatch")
    }
  }
}
