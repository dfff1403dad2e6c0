package graft

import graft.config._
import graft.session.EngineSession
import org.apache.spark.sql.SparkSession
import org.slf4j.LoggerFactory

import java.nio.file.{Files, Paths}
import java.util.Properties
import scala.jdk.CollectionConverters._

/** CLI entry — the reference's Main + ETL step runner (/root/reference ..
  * Main.scala:9-12, ETL.scala:52-73): validate requested step names via
  * set algebra against the configured defaults, then run each known step.
  *
  * Config delta: the reference loads HOCON via pureconfig (unavailable
  * offline — SURVEY §7.0); this loads a flat java.util.Properties file
  * with the same keys and the same fail-fast `require` validation
  * (graft.config case classes).
  *
  * Usage: graft.Main <config.properties> [step ...]
  */
object Main {
  private val log = LoggerFactory.getLogger(getClass)

  val defaultSteps: Seq[String] = Seq("fda")

  def loadConfig(path: String): PipelineConfig = {
    val props = new Properties()
    val reader = Files.newBufferedReader(Paths.get(path))
    try props.load(reader) finally reader.close()
    val p = props.asScala
    def req(k: String): String =
      p.getOrElse(k, throw new IllegalArgumentException(s"missing config key $k"))
    PipelineConfig(
      sparkUri = p.get("spark-uri"),
      outputPath = req("output"),
      fda = FdaConfig(
        montecarlo = MonteCarloConfig(
          permutations = p.get("fda.montecarlo.permutations").map(_.toInt).getOrElse(100),
          percentile = p.get("fda.montecarlo.percentile").map(_.toDouble).getOrElse(0.95),
          // absent key keeps the deterministic default; the literal "none"
          // opts into the reference's intentional nondeterminism
          seed = p.get("fda.montecarlo.seed") match {
            case Some("none") => None
            case Some(v) => Some(v.toLong)
            case None => MonteCarloConfig().seed
          }),
        fdaInputs = FdaInputs(
          blacklist = req("fda.inputs.blacklist"),
          chemblData = req("fda.inputs.chembl"),
          fdaData = req("fda.inputs.fda"),
          meddraRelease = p.get("fda.inputs.meddra")),
        outputs = p.get("fda.outputs").map(_.split(",").map(_.trim).toSeq)
          .getOrElse(Seq("parquet")),
        sampling = Sampling(
          output = p.getOrElse("fda.sampling.output", req("output") + "/sample"),
          size = p.get("fda.sampling.size").map(_.toDouble).getOrElse(0.1),
          enabled = p.get("fda.sampling.enabled").exists(_.toBoolean)),
        compat = p.get("fda.compat").exists(_.toBoolean)))
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Main <config.properties> [step ...]")
    val cfg = loadConfig(args(0))
    val steps = if (args.length > 1) args.drop(1).toSeq else defaultSteps

    // step validation via driver-side set algebra (ETL.scala:61-62)
    val unknown = steps.toSet diff defaultSteps.toSet
    val known = steps.toSet intersect defaultSteps.toSet
    if (unknown.nonEmpty) log.warn(s"Invalid steps to skip: $unknown")
    log.info(s"Valid steps to execute: $known")

    implicit val spark: SparkSession =
      EngineSession.build("graft-fda", cfg.sparkUri)
    try known.foreach {
      case "fda" => Pipeline.run(cfg)
    } finally spark.stop()
  }
}
