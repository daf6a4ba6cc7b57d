package graft

/** Regenerates docs/QUERIES.md from SparkEntry — the queries ARE the
  * documentation source of truth. Run:
  * `sbt "Test/runMain graft.GenQueriesDoc"`. */
object GenQueriesDoc {
  def main(args: Array[String]): Unit = {
    val oracles = SparkEntry.oracleSql
    val names = SparkEntry.queries.keys.toSeq.sorted
    val sb = new StringBuilder
    sb.append("# Query inventory (generated — `sbt \"Test/runMain graft.GenQueriesDoc\"`)\n\n")
    sb.append(s"${names.size} queries: ${oracles.size} DuckDB-oracle checked, " +
      s"${names.size - oracles.size} spec-verified.\n\n")
    sb.append("| Query | Check | Oracle SQL (first line) |\n|---|---|---|\n")
    names.foreach { n =>
      val o = oracles.get(n)
      val check = if (o.isDefined) "oracle" else "spec"
      val head = o.map(_.linesIterator.next().replace("|", "\\|"))
        .getOrElse("—")
      sb.append(s"| `$n` | $check | `$head` |\n")
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("docs/QUERIES.md"), sb.toString)
    println(s"[gen] docs/QUERIES.md: ${names.size} queries")
  }
}
