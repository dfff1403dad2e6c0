package graft.functions

import org.apache.commons.math3.random.Well19937c
import org.scalatest.funsuite.AnyFunSuite

class MultinomialSpec extends AnyFunSuite {

  test("rmultinom draws sum to size (reference MathUtilsTest property)") {
    val rng = new Well19937c(1L)
    val draws = Multinomial.rmultinom(rng, 50, 100, Array(0.2, 0.3, 0.5))
    assert(draws.length == 50)
    draws.foreach(d => assert(d.sum == 100))
  }

  test("degenerate single-category puts all mass in it") {
    val rng = new Well19937c(1L)
    val d = Multinomial.rmultinomOnce(rng, 17, Array(1.0))
    assert(d.toSeq == Seq(17))
  }

  test("unnormalized probabilities are normalized") {
    val rng = new Well19937c(2L)
    val d = Multinomial.rmultinomOnce(rng, 1000, Array(2.0, 2.0, 4.0))
    assert(d.sum == 1000)
    // category 2 has half the mass; crude sanity bounds
    assert(d(2) > 350 && d(2) < 650)
  }

  test("same seed → identical draws; different seed → different draws") {
    val a = Multinomial.rmultinom(new Well19937c(9L), 20, 500, Array(0.1, 0.9))
    val b = Multinomial.rmultinom(new Well19937c(9L), 20, 500, Array(0.1, 0.9))
    val c = Multinomial.rmultinom(new Well19937c(10L), 20, 500, Array(0.1, 0.9))
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.map(_.toSeq).toSeq != c.map(_.toSeq).toSeq)
  }

  test("percentile: R type-7 interpolation") {
    val v = Array(1.0, 2.0, 3.0, 4.0)
    assert(Multinomial.percentile(v, 0.0) == 1.0)
    assert(Multinomial.percentile(v, 1.0) == 4.0)
    assert(Multinomial.percentile(v, 0.5) == 2.5)
    assert(math.abs(Multinomial.percentile(v, 0.95) - 3.85) < 1e-12)
  }

  test("criticalValue is deterministic per seed and positive for typical input") {
    val nI = Array(40L, 25L, 10L, 5L)
    val a = Multinomial.criticalValue(100, 60, nI, 1000, 0.95, 42L)
    val b = Multinomial.criticalValue(100, 60, nI, 1000, 0.95, 42L)
    val c = Multinomial.criticalValue(100, 60, nI, 1000, 0.95, 43L)
    assert(a == b)
    assert(a != c)
    assert(a > 0.0 && a.isFinite)
  }

  test("criticalValue degenerate inputs return 0") {
    assert(Multinomial.criticalValue(10, 0, Array(1L), 100, 0.95, 1L) == 0.0)
    assert(Multinomial.criticalValue(10, 5, Array.empty[Long], 100, 0.95, 1L) == 0.0)
  }

  test("seedFor is stable and key-sensitive") {
    assert(Multinomial.seedFor("CHEMBL1", 42L) == Multinomial.seedFor("CHEMBL1", 42L))
    assert(Multinomial.seedFor("CHEMBL1", 42L) != Multinomial.seedFor("CHEMBL2", 42L))
    assert(Multinomial.seedFor("CHEMBL1", 42L) != Multinomial.seedFor("CHEMBL1", 43L))
  }
}
