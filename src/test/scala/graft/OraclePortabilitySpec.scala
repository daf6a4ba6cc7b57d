package graft

import org.scalatest.funsuite.AnyFunSuite

/** Locks the oracle-SQL portability discipline learned in round 6: the
  * driver's DuckDB build evaluates `arg_min(x, y) FILTER (WHERE p)`
  * differently from DuckDB 1.0.0 (corpus_resume_skip was red while the
  * engine output was verified correct), so FILTER clauses in oracle SQL
  * may only be attached to the plain commutative aggregates that are
  * proven portable across builds (count/sum/min/max/avg). Every other
  * aggregate — argument-ordered (`arg_min`/`min_by`), ordered
  * (`list(x ORDER BY y)`, `string_agg(... ORDER BY ...)`), positional
  * (`first`/`last`) — must encode the predicate in its arguments:
  * `arg_min(CASE WHEN p THEN x END, CASE WHEN p THEN y END)`, which is
  * how the Spark twins are written anyway (`min_by(when(p,…), when(p,…))`).
  *
  * The check parses each oracle: for every `FILTER (` token it walks back
  * over the directly preceding `( … )` argument list (paren-matched, so
  * nested calls inside the arguments can't fool it), reads the function
  * identifier, and asserts (a) the function is in the portable allowlist
  * and (b) its argument list carries no ORDER BY (an ordered aggregate
  * with FILTER is the other drift class).
  */
class OraclePortabilitySpec extends AnyFunSuite {

  /** Aggregates whose FILTER interaction is version-stable (used by 8+
    * oracles that have been green on every driver DuckDB so far). */
  private val portable = Set("count", "sum", "min", "max", "avg")

  /** (function-name, argument-text) for each FILTER attachment in `sql`. */
  private def filterAttachments(sql: String): Seq[(String, String)] = {
    val hits = "(?i)\\bFILTER\\s*\\(".r.findAllMatchIn(sql).map(_.start).toList
    hits.flatMap { i =>
      var j = i - 1
      while (j >= 0 && sql(j).isWhitespace) j -= 1
      if (j < 0 || sql(j) != ')') None // FILTER not after a call — ignore
      else {
        var depth = 0; var k = j
        var done = false
        while (k >= 0 && !done) {
          sql(k) match {
            case ')' => depth += 1
            case '(' => depth -= 1; if (depth == 0) done = true
            case _ =>
          }
          if (!done) k -= 1
        }
        if (!done) None
        else {
          val args = sql.substring(k + 1, j)
          var e = k - 1
          while (e >= 0 && sql(e).isWhitespace) e -= 1
          var s = e
          while (s >= 0 && (sql(s).isLetterOrDigit || sql(s) == '_')) s -= 1
          Some((sql.substring(s + 1, e + 1).toLowerCase, args))
        }
      }
    }
  }

  test("FILTER only on portable aggregates, never on ordered aggregates") {
    val bad = SparkEntry.catalog.flatMap { q =>
      q.oracleNow.toSeq.flatMap { sql =>
        filterAttachments(sql).collect {
          case (fn, _) if !portable(fn) =>
            s"${q.name}: `$fn(...) FILTER` — move the predicate into the " +
              "arguments (CASE WHEN p THEN x END)"
          case (fn, args) if "(?i)\\bORDER\\s+BY\\b".r
              .findFirstIn(args).isDefined =>
            s"${q.name}: ordered `$fn(... ORDER BY ...) FILTER` — " +
              "use NULL-skipping aggregation over CASE-wrapped arguments"
        }
      }
    }
    assert(bad.isEmpty, "non-portable oracle constructs:\n" + bad.mkString("\n"))
  }

  test("parser sanity: fragile and clean forms are classified correctly") {
    val fragile = "SELECT arg_min(doc_id, pos) FILTER (WHERE pos > 16) FROM t"
    assert(filterAttachments(fragile) == Seq(("arg_min", "doc_id, pos")))
    val nested =
      "SELECT sum(CAST(c AS HUGEINT) * c) FILTER (WHERE di > 3) FROM t"
    assert(filterAttachments(nested).map(_._1) == Seq("sum"))
    val clean = "SELECT arg_min(CASE WHEN p THEN x END, y), count(*) FROM t"
    assert(filterAttachments(clean).isEmpty)
  }
}
