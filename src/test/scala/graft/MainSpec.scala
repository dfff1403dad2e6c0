package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class MainSpec extends AnyFunSuite {

  private def cfg(lines: String*): String = {
    val f = Files.createTempFile("graft-cfg", ".properties")
    Files.writeString(f, (Seq("output=/tmp/x",
      "fda.inputs.blacklist=b.txt", "fda.inputs.chembl=c.jsonl",
      "fda.inputs.fda=f.jsonl") ++ lines).mkString("\n"))
    f.toString
  }

  test("absent seed keeps the deterministic default") {
    assert(Main.loadConfig(cfg()).fda.montecarlo.seed === Some(42L))
  }

  test("seed=none opts into reference nondeterminism; explicit value wins") {
    assert(Main.loadConfig(cfg("fda.montecarlo.seed=none")).fda.montecarlo.seed === None)
    assert(Main.loadConfig(cfg("fda.montecarlo.seed=7")).fda.montecarlo.seed === Some(7L))
  }

  test("missing required key fails fast with the key name") {
    val f = Files.createTempFile("graft-cfg", ".properties")
    Files.writeString(f, "output=/tmp/x")
    val e = intercept[IllegalArgumentException] { Main.loadConfig(f.toString) }
    assert(e.getMessage.contains("fda.inputs"))
  }

  test("out-of-range sampling fraction fails at construction") {
    val e = intercept[IllegalArgumentException] {
      Main.loadConfig(cfg("fda.sampling.size=1.5", "fda.sampling.enabled=true"))
    }
    assert(e.getMessage.toLowerCase.contains("size"))
  }
}
