package graft.tools

/** Round-over-round bench comparison — reads two `bench.json` files
  * (the full per-query map `graft.Bench` persists) and emits the
  * per-gate ratio table the round-5 drift investigation had to
  * reconstruct by hand: new gates, dropped gates, and every ratio
  * outside [1/threshold, threshold] sorted worst-first, with the
  * contended lists honored (a gate contended in EITHER run is ratio-
  * flagged but marked, since its median absorbed host noise).
  *
  * No JSON library on the classpath by design — the parser handles
  * exactly the flat {"name":1.234,...} map and ["a","b"] list shapes
  * Bench writes.
  *
  * Usage: BenchDiff <old.json> <new.json> [threshold=1.5]
  * Exit code 0 always (informational; the judge reads the table).
  */
object BenchDiff {

  private def slurp(p: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
      "UTF-8")

  /** Extract the flat string→double map under `"<key>":{...}`. */
  private[tools] def queryMap(json: String, key: String): Map[String, Double] = {
    val start = json.indexOf("\"" + key + "\":{")
    if (start < 0) return Map.empty
    val body = json.substring(json.indexOf('{', start) + 1)
    val end = body.indexOf('}')
    body.substring(0, end).split(",").iterator
      .map(_.trim).filter(_.nonEmpty)
      .flatMap { kv =>
        val Array(k, v) = kv.split(":", 2)
        val name = k.trim.stripPrefix("\"").stripSuffix("\"")
        if (v.trim == "null") None
        else Some(name -> v.trim.toDouble)
      }.toMap
  }

  private[tools] def strList(json: String, key: String): Set[String] = {
    val start = json.indexOf("\"" + key + "\":[")
    if (start < 0) return Set.empty
    val body = json.substring(json.indexOf('[', start) + 1)
    val end = body.indexOf(']')
    body.substring(0, end).split(",").iterator.map(_.trim)
      .filter(_.nonEmpty).map(_.stripPrefix("\"").stripSuffix("\"")).toSet
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BenchDiff <old.json> <new.json> [threshold]")
    val threshold = if (args.length > 2) args(2).toDouble else 1.5
    val oldJson = slurp(args(0)); val newJson = slurp(args(1))
    val o = queryMap(oldJson, "queries"); val n = queryMap(newJson, "queries")
    val contended = strList(oldJson, "contended") ++ strList(newJson, "contended")
    val added = (n.keySet -- o.keySet).toSeq.sorted
    val dropped = (o.keySet -- n.keySet).toSeq.sorted
    val ratios = (o.keySet & n.keySet).toSeq
      .map(g => (g, o(g), n(g), if (o(g) > 0) n(g) / o(g) else Double.NaN))
    val flagged = ratios
      .filter { case (_, ov, nv, r) =>
        (r > threshold || r < 1.0 / threshold) && math.max(ov, nv) > 0.5 }
      .sortBy { case (_, _, _, r) => -math.max(r, 1.0 / r) }
    println(f"gates: old=${o.size} new=${n.size} common=${ratios.size} " +
      f"added=${added.size} dropped=${dropped.size}")
    println(f"total: old=${o.values.sum}%.1f s new=${n.values.sum}%.1f s")
    if (added.nonEmpty) println(s"added: ${added.mkString(", ")}")
    if (dropped.nonEmpty) println(s"DROPPED: ${dropped.mkString(", ")}")
    if (flagged.isEmpty)
      println(s"no gate moved beyond ${threshold}x (sub-0.5 s gates ignored)")
    else {
      println("%-28s %8s %8s %7s".format("gate", "old_s", "new_s", "ratio"))
      flagged.foreach { case (g, ov, nv, r) =>
        val mark = if (contended(g)) " (contended)" else ""
        println(f"$g%-28s $ov%8.2f $nv%8.2f $r%7.2f$mark")
      }
    }
  }
}
