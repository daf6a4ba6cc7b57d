package graft

/** Regenerates docs/QUERIES.md from SparkEntry — the queries ARE the
  * documentation source of truth. Run:
  * `sbt "Test/runMain graft.GenQueriesDoc"`. */
object GenQueriesDoc {
  def main(args: Array[String]): Unit = {
    val oracles = SparkEntry.oracleSql
    // post-run generated oracles (trained-artifact inlining) have no SQL
    // until their query runs — still oracle-checked by the driver
    val generated = SparkEntry.catalog
      .filter(q => q.oracleGen.isDefined && !oracles.contains(q.name))
      .map(_.name).toSet
    val names = SparkEntry.queries.keys.toSeq.sorted
    val nOracle = oracles.size + generated.size
    val sb = new StringBuilder
    sb.append("# Query inventory (generated — `sbt \"Test/runMain graft.GenQueriesDoc\"`)\n\n")
    sb.append(s"${names.size} queries: $nOracle DuckDB-oracle checked, " +
      s"${names.size - nOracle} spec-verified.\n\n")
    sb.append("| Query | Check | Oracle SQL (first line) |\n|---|---|---|\n")
    names.foreach { n =>
      val o = oracles.get(n)
      val check =
        if (o.isDefined) "oracle"
        else if (generated(n)) "oracle (generated post-run)"
        else "spec"
      val head = o.map(_.linesIterator.next().replace("|", "\\|"))
        .getOrElse("—")
      sb.append(s"| `$n` | $check | `$head` |\n")
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("docs/QUERIES.md"), sb.toString)
    println(s"[gen] docs/QUERIES.md: ${names.size} queries")
  }
}
