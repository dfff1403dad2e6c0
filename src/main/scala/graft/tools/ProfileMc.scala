package graft.tools

import graft.functions.Multinomial

/** Micro-benchmark of the Monte-Carlo critical-value kernel at the grain
  * the sf0.1 bench drives it (1000 drugs × 50 permutations × ~600-trial
  * multinomials over 25 categories) — isolates UDF CPU from the Spark
  * plan around it.
  */
object ProfileMc {
  def main(args: Array[String]): Unit = {
    val drugs = 1000
    val nI = Array.fill(25)(28000L)
    var i = 0
    val t0 = System.nanoTime()
    var acc = 0.0
    while (i < drugs) {
      acc += Multinomial.criticalValue(50, 600, nI, 150000, 0.95,
        Multinomial.seedFor(s"drug$i", 42L))
      i += 1
    }
    println(f"kernel: ${(System.nanoTime() - t0) / 1e9}%.2f s for $drugs drugs (acc=$acc%.3f)")
  }
}
