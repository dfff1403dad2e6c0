package graft.functions

import org.apache.commons.math3.distribution.BinomialDistribution
import org.apache.commons.math3.random.Well19937c

/** Seeded multinomial sampling + Monte-Carlo critical values for the
  * FDA LRT method.
  *
  * Semantics follow the reference's Monte-Carlo stage
  * (/root/reference .. utils/MathUtils.scala:8-41 `calculateCriticalValues`,
  * 49-75 `rmultinom`): draw `permutations` multinomial samples of `size`
  * trials over the per-reaction probability vector, compute a per-category
  * LLR for every draw, zero non-finite entries, take per-draw maxima, and
  * return the requested percentile of the max distribution.
  *
  * Differences by design (SURVEY §7.6.3): the RNG is SEEDED (the reference
  * uses an unseeded Breeze RNG and is intentionally non-reproducible), and
  * the implementation is commons-math3 (already on Spark's classpath)
  * rather than Breeze, with the multinomial drawn via the standard
  * sequential-conditional-binomial construction (as in R's rmultinom).
  */
object Multinomial {

  /** Binomial(n, p) draw by inversion: one uniform, then walk the pmf from
    * k=0 with the recurrence pmf(k+1) = pmf(k)·(n−k)/(k+1)·p/(1−p) —
    * O(draw+1) cheap float ops. commons-math's sample() inverts the CDF by
    * binary search with a regularized-incomplete-beta evaluation per probe;
    * under the multinomial's conditional-binomial loop that was the whole
    * Monte-Carlo stage's CPU. Falls back to commons-math only when pmf(0)
    * underflows (n·log1p(−p) < −700 ⇒ expected draw ≫ 10³ in one
    * category), which the conditional construction rarely reaches.
    */
  def binomial(rng: Well19937c, n: Int, p: Double): Int = {
    if (p <= 0.0 || n <= 0) 0
    else if (p >= 1.0) n
    else {
      val logP0 = n * math.log1p(-p)
      if (logP0 < -700.0) new BinomialDistribution(rng, n, p).sample()
      else {
        val u = rng.nextDouble()
        val odds = p / (1.0 - p)
        var k = 0
        var pmf = math.exp(logP0)
        var cdf = pmf
        while (u > cdf && k < n) {
          pmf *= (n - k).toDouble / (k + 1).toDouble * odds
          k += 1
          cdf += pmf
        }
        k
      }
    }
  }

  /** One multinomial draw of `size` trials over `probs` (need not be
    * normalized). Sequential conditional binomials: category j gets
    * Binomial(remaining, p_j / remainingMass). Total cost per draw is
    * O(size + categories): the inversion draws sum to `size`.
    */
  def rmultinomOnce(rng: Well19937c, size: Int, probs: Array[Double]): Array[Int] = {
    require(probs.length > 0 && size > 0, "probability vector and size must be non-empty/positive")
    val total = probs.sum
    val out = new Array[Int](probs.length)
    var remaining = size
    var remainingMass = total
    var j = 0
    while (j < probs.length && remaining > 0) {
      val p = if (j == probs.length - 1) 1.0 else math.min(1.0, probs(j) / remainingMass)
      val draw =
        if (p >= 1.0) remaining
        else binomial(rng, remaining, p)
      out(j) = draw
      remaining -= draw
      remainingMass -= probs(j)
      j += 1
    }
    out
  }

  /** `permutations` multinomial draws; column i is one draw.
    * Layout mirrors the reference's category-major matrix
    * (MathUtils.scala:53-75) but stored draw-major for cache locality.
    */
  def rmultinom(rng: Well19937c, permutations: Int, size: Int,
                probs: Array[Double]): Array[Array[Int]] = {
    require(permutations > 0, "iterations must be greater than zero")
    Array.fill(permutations)(rmultinomOnce(rng, size, probs))
  }

  /** Quantile with linear interpolation (R type-7, numpy default):
    * index h = (n-1)*p into the sorted sample.
    */
  def percentile(values: Array[Double], p: Double): Double = {
    require(values.nonEmpty, "percentile of empty sample")
    require(p >= 0 && p <= 1, "percentile must be in [0,1]")
    val s = values.clone()
    java.util.Arrays.sort(s)
    val h = (s.length - 1) * p
    val lo = math.floor(h).toInt
    val hi = math.ceil(h).toInt
    if (lo == hi) s(lo) else s(lo) + (h - lo) * (s(hi) - s(lo))
  }

  /** Critical LLR value for one drug.
    *
    * @param permutations number of Monte-Carlo draws
    * @param nJ   unique reports mentioning the drug (multinomial size)
    * @param nI   per-reaction unique-report counts for the drug's reactions
    * @param total total unique reports (N)
    * @param prob percentile of the per-draw max-LLR distribution
    * @param seed RNG seed (derive per-drug for partition-independence)
    *
    * LLR per category c with draw x, y=nI(c), z=nJ, N=total
    * (MathUtils.scala:25-37 semantics):
    *   x*(ln x - ln y) + (z-x)*(ln(z-x) - ln(N-y)) - z*ln z + z*ln N
    * non-finite terms are zeroed before the max.
    */
  def criticalValue(permutations: Int, nJ: Int, nI: Array[Long], total: Int,
                    prob: Double, seed: Long): Double = {
    require(permutations > 0, "permutations must be > 0")
    if (nI.isEmpty || nJ <= 0 || total <= 0) return 0.0
    val rng = new Well19937c(seed)
    val z = nJ.toDouble
    val bigN = total.toDouble
    val probs = nI.map(_.toDouble / bigN)
    val logZTerm = -z * math.log(z) + z * math.log(bigN)
    val maxima = new Array[Double](permutations)
    var i = 0
    while (i < permutations) {
      val draw = rmultinomOnce(rng, nJ, probs)
      var best = Double.NegativeInfinity
      var c = 0
      while (c < draw.length) {
        val x = draw(c).toDouble
        val y = nI(c).toDouble
        var llr = x * (math.log(x) - math.log(y)) +
          (z - x) * (math.log(z - x) - math.log(bigN - y)) + logZTerm
        if (llr.isNaN || llr.isInfinite) llr = 0.0
        if (llr > best) best = llr
        c += 1
      }
      maxima(i) = best
      i += 1
    }
    percentile(maxima, prob)
  }

  /** Stable per-key seed so results don't depend on row-to-partition
    * assignment: mix a global seed with the key's bytes (FNV-1a 64).
    */
  def seedFor(key: String, globalSeed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ globalSeed
    var i = 0
    while (i < key.length) {
      h ^= key.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
}
