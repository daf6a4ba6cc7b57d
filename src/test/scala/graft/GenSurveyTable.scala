package graft

/** Regenerates SURVEY.md §2.0 as the authoritative PER-QUERY table
  * (round-7 verdict task #5): one row per driver-visible query with its
  * family, module, check kind, and the round it first went driver-green
  * (mined from the CORRECTNESS_r*.json artifacts; queries not yet in any
  * artifact are stamped with the next round number). The table is written
  * between the GEN markers so prose around it survives regeneration. Run:
  * `sbt "Test/runMain graft.GenSurveyTable"`. DocsSyncSpec asserts the
  * table matches `SparkEntry.queries` exactly — catalog drift fails CI.
  */
object GenSurveyTable {

  private val familyOf: Map[String, String] = Map(
    "ab" -> "Experimentation", "agg" -> "Aggregation",
    "array" -> "Scalar/array", "attribution" -> "Attribution",
    "basket" -> "Market basket", "bpe" -> "Tokenization",
    "corpus" -> "Corpus prep", "count" -> "Filters",
    "dedup" -> "Deduplication", "denormalize" -> "Restructure",
    "discovery" -> "Pipeline sinks", "doc" -> "Corpus prep",
    "dq" -> "Data quality", "filter" -> "Filters",
    "generator" -> "Scalar/array", "graph" -> "Graph",
    "ingest" -> "Scans/ingest", "join" -> "Joins",
    "json" -> "Scalar/JSON", "knn" -> "Vector/ANN",
    "map" -> "Scalar/map", "markov" -> "Graph",
    "multimodal" -> "Multimodal", "outlier" -> "Data quality",
    "profile" -> "Data quality", "retention" -> "Retention/LTV",
    "rfm" -> "Retention/LTV", "sample" -> "Sampling",
    "scalar" -> "Scalar fns", "scd2" -> "Warehouse",
    "search" -> "Retrieval", "semi" -> "Joins",
    "sessionize" -> "Sessionization", "setops" -> "Set ops",
    "simplify" -> "Restructure", "skyline" -> "Sort/top-k",
    "snapshot" -> "Pipeline sinks", "store" -> "Store maintenance",
    "stream" -> "Streaming parity", "text" -> "Text analysis",
    "topk" -> "Sort/top-k", "training" -> "Corpus prep",
    "ts" -> "Time series", "udaf" -> "UDAF",
    "unpivot" -> "Aggregation", "vector" -> "Vector/ANN",
    "window" -> "Windows")

  /** query name → first round it appeared in a CORRECTNESS artifact. */
  private def firstRound(): (Map[String, Int], Int) = {
    val dir = java.nio.file.Paths.get(".")
    val rx = "CORRECTNESS_r(\\d+)\\.json".r
    val rounds = java.nio.file.Files.list(dir).toArray.toSeq
      .map(_.toString.stripPrefix("./"))
      .collect { case s @ rx(n) => (n.toInt, s) }
      .sortBy(_._1)
    val first = scala.collection.mutable.Map.empty[String, Int]
    rounds.foreach { case (r, f) =>
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(f)))
      // keys are top-level JSON object fields: "name": {...}
      "\"([a-z0-9_]+)\"\\s*:\\s*\\{".r.findAllMatchIn(txt).foreach { m =>
        val k = m.group(1)
        if (!first.contains(k)) first(k) = r
      }
    }
    (first.toMap, rounds.map(_._1).maxOption.getOrElse(0) + 1)
  }

  def render(): String = {
    // classify by the Q's own shape, not by whether a trained artifact
    // happens to be cached in this JVM — oracleGen queries render their
    // SQL only after running, so an `oracleSql`-based check would make
    // the table depend on suite execution order
    val staticOracles = SparkEntry.catalog
      .filter(_.oracle.isDefined).map(_.name).toSet
    val generated = SparkEntry.catalog
      .filter(_.oracleGen.isDefined).map(_.name).toSet
    val (first, nextRound) = firstRound()
    val sb = new StringBuilder
    sb.append("| Query id | Family | Module | Check | Round |\n")
    sb.append("|---|---|---|---|---|\n")
    SparkEntry.moduleCatalog.foreach { case (module, qs) =>
      qs.foreach { q =>
        val fam = familyOf.getOrElse(q.name.takeWhile(_ != '_'), module)
        val check =
          if (generated(q.name)) "oracle (generated post-run)"
          else if (staticOracles(q.name)) "oracle"
          else "spec"
        val round = first.getOrElse(q.name, nextRound)
        sb.append(s"| `${q.name}` | $fam | $module | $check | r$round |\n")
      }
    }
    sb.toString
  }

  val Begin = "<!-- GEN:2.0:BEGIN (sbt \"Test/runMain graft.GenSurveyTable\") -->"
  val End = "<!-- GEN:2.0:END -->"

  def main(args: Array[String]): Unit = {
    val p = java.nio.file.Paths.get("SURVEY.md")
    // UTF-8 EXPLICITLY on both ends: sbt forks with a non-UTF-8 default
    // charset here, and the platform-default `new String(bytes)` decoded
    // every non-ASCII byte (em-dashes, §, →) to U+FFFD while writeString
    // re-encoded UTF-8 — each regeneration then TRIPLED the replacement
    // runs (the round-8 SURVEY.md corruption). Read and write must name
    // the charset; DocsSyncSpec now rejects any U+FFFD in the file.
    val survey = new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
    val (b, e) = (survey.indexOf(Begin), survey.indexOf(End))
    require(b >= 0 && e > b, "SURVEY.md is missing the §2.0 GEN markers")
    require(!survey.contains('�'),
      "SURVEY.md already contains U+FFFD — repair it before regenerating")
    val out = survey.substring(0, b + Begin.length) + "\n\n" +
      render() + "\n" + survey.substring(e)
    java.nio.file.Files.writeString(p, out,
      java.nio.charset.StandardCharsets.UTF_8)
    println(s"[gen] SURVEY.md §2.0: ${SparkEntry.catalog.size} query rows")
  }
}
