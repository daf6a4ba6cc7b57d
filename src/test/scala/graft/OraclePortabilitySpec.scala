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

  // ---------------------------------------------------------------------
  // Round-8 invariant: NO WIDE-INTEGER OUTPUT COLUMNS. Round 7's three red
  // rows were exactly the three oracles whose final SELECT emitted a
  // HUGEINT or DECIMAL(38,0) column (DuckDB builds hash wide integers
  // differently), so every wide-typed expression must be CAST to a
  // portable type (BIGINT/INT/DOUBLE/VARCHAR/BOOLEAN) before it reaches
  // the output. DuckDB's wide-type producers are integer `sum(...)`
  // (→ HUGEINT, plain or windowed) and explicit HUGEINT/DECIMAL casts;
  // `count(*)` stays BIGINT and `/` yields DOUBLE. The lint strips every
  // `CAST(... AS <portable>)` from each final-SELECT item and flags any
  // residual producer — propagating "wideness" through CTE aliases, which
  // is how corpus_token_budget's four uncast columns actually escaped
  // (bare references to a CTE column defined by an uncast windowed sum).
  // scripts/selfcheck.py enforces the same invariant with real DuckDB
  // type inference; this spec makes reverting the casts a test failure.
  // ---------------------------------------------------------------------

  private val portableTypes =
    Set("bigint", "int", "integer", "smallint", "tinyint", "double",
        "float", "real", "varchar", "text", "string", "boolean", "date",
        "timestamp")

  /** Split `s` on `sep` at paren-depth 0 (and outside quoted strings). */
  private def splitTop(s: String, sep: Char): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0; var inStr = false
    s.foreach { c =>
      if (c == '\'') inStr = !inStr
      if (!inStr) {
        if (c == '(' || c == '[') depth += 1
        if (c == ')' || c == ']') depth -= 1
      }
      if (c == sep && depth == 0 && !inStr) { out += cur.toString; cur.clear() }
      else cur += c
    }
    out += cur.toString
    out.toSeq
  }

  /** Index of the first depth-0 occurrence of keyword `kw` in `s`, or -1. */
  private def topLevelIndexOf(s: String, kw: String): Int = {
    var depth = 0; var inStr = false; var i = 0
    val n = s.length; val k = kw.length
    while (i < n) {
      val c = s(i)
      if (c == '\'') inStr = !inStr
      if (!inStr) {
        if (c == '(' || c == '[') depth += 1
        else if (c == ')' || c == ']') depth -= 1
        else if (depth == 0 && i + k <= n &&
                 s.regionMatches(true, i, kw, 0, k) &&
                 (i == 0 || !s(i - 1).isLetterOrDigit && s(i - 1) != '_') &&
                 (i + k == n || !s(i + k).isLetterOrDigit && s(i + k) != '_'))
          return i
      }
      i += 1
    }
    -1
  }

  /** Iteratively delete every `CAST(expr AS <portable-type>)` (matched
    * parens, innermost first via repetition) — what remains are the
    * expressions whose DuckDB result type actually reaches the output. */
  private def stripPortableCasts(s0: String): String = {
    var s = s0
    var changed = true
    while (changed) {
      changed = false
      val m = "(?i)\\bCAST\\s*\\(".r.findAllMatchIn(s).toList
      // innermost-first: try matches in reverse start order
      m.reverseIterator.find { mm =>
        var depth = 0; var i = mm.end - 1; var close = -1
        while (i < s.length && close < 0) {
          s(i) match {
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) close = i
            case _ =>
          }
          i += 1
        }
        if (close < 0) false
        else {
          val inner = s.substring(mm.end, close)
          val asIdx = {
            var d = 0; var j = inner.length - 1; var found = -1
            while (j >= 1 && found < 0) {
              inner(j) match {
                case ')' | ']' => d += 1
                case '(' | '[' => d -= 1
                case _ =>
              }
              if (d == 0 && j + 2 <= inner.length &&
                  inner.regionMatches(true, j, "AS", 0, 2) &&
                  (j == 0 || inner(j - 1).isWhitespace) &&
                  (j + 2 == inner.length || inner(j + 2).isWhitespace))
                found = j
              j -= 1
            }
            found
          }
          if (asIdx < 0) false
          else {
            val tpe = inner.substring(asIdx + 2).trim.toLowerCase
              .takeWhile(c => c.isLetterOrDigit || c == '_')
            if (portableTypes(tpe)) {
              s = s.substring(0, mm.start) + " 1 " + s.substring(close + 1)
              changed = true
              true
            } else false
          }
        }
      }
    }
    s
  }

  /** (cteName → selectListText, finalSelectListText) for one oracle. */
  private def selectLists(sql0: String): (Seq[(String, String)], String) = {
    val sql = sql0.replace('\n', ' ')
    def listOf(body: String): String = {
      val sel = topLevelIndexOf(body, "SELECT")
      if (sel < 0) return ""
      val rest = body.substring(sel + "SELECT".length)
      val from = topLevelIndexOf(rest, "FROM")
      val lst = if (from < 0) rest else rest.substring(0, from)
      lst.trim.stripPrefix("DISTINCT").stripPrefix("distinct")
    }
    if (topLevelIndexOf(sql, "WITH") == 0) {
      // parse `WITH a AS ( … ), b AS ( … ) SELECT …`
      var i = sql.indexOf('(')
      val ctes = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var rest = sql.substring("WITH".length + topLevelIndexOf(sql, "WITH"))
      var done = false
      while (!done) {
        val open = rest.indexOf('(')
        if (open < 0) { done = true }
        else {
          val name = rest.substring(0, open).trim.toLowerCase
            .stripSuffix("as").trim.takeWhile(c => c.isLetterOrDigit || c == '_')
          var depth = 0; var j = open; var close = -1
          while (j < rest.length && close < 0) {
            rest(j) match {
              case '(' => depth += 1
              case ')' => depth -= 1; if (depth == 0) close = j
              case _ =>
            }
            j += 1
          }
          if (close < 0) done = true
          else {
            ctes += ((name, listOf(rest.substring(open + 1, close))))
            val tail = rest.substring(close + 1).trim
            if (tail.startsWith(",")) rest = tail.drop(1)
            else { rest = tail; done = true }
          }
        }
      }
      (ctes.toSeq, listOf(rest))
    } else (Seq.empty, listOf(sql))
  }

  /** alias of one select item: trailing `AS x`, else bare (dotted) ident. */
  private def aliasOf(item: String): Option[String] = {
    val t = item.trim
    val as = "(?i)\\s+AS\\s+([A-Za-z_][A-Za-z0-9_]*)\\s*$".r
    as.findFirstMatchIn(t).map(_.group(1).toLowerCase).orElse {
      if (t.matches("[A-Za-z_][A-Za-z0-9_.]*"))
        Some(t.split('.').last.toLowerCase)
      else None
    }
  }

  /** Delete every top-level `WHEN <cond> THEN` condition segment — a
    * CASE expression's result type comes from its THEN/ELSE branches,
    * so wide values referenced only inside conditions don't widen it. */
  private def dropCaseConditions(s: String): String = {
    val out = new StringBuilder
    var i = 0; var skipping = false
    while (i < s.length) {
      def kw(w: String) =
        s.regionMatches(true, i, w, 0, w.length) &&
          (i == 0 || !s(i - 1).isLetterOrDigit && s(i - 1) != '_') &&
          (i + w.length == s.length ||
            !s(i + w.length).isLetterOrDigit && s(i + w.length) != '_')
      if (!skipping && kw("WHEN")) { skipping = true; i += 4 }
      else if (skipping && kw("THEN")) { skipping = false; out ++= " THEN "; i += 4 }
      else { if (!skipping) out += s(i); i += 1 }
    }
    out.toString
  }

  /** Is the expression a wide-type producer, given the already-known set
    * of wide CTE aliases? Strips portable CASTs, the display alias, and
    * CASE conditions first; predicates and `/`-arithmetic are DOUBLE or
    * BOOLEAN in DuckDB and therefore portable. */
  private def isWide(expr: String, wideAliases: Set[String]): Boolean = {
    val noAlias = "(?i)\\s+AS\\s+[A-Za-z_][A-Za-z0-9_]*\\s*$".r
      .replaceAllIn(expr.trim, "")
    val stripped = dropCaseConditions(stripPortableCasts(noAlias))
    // a top-level comparison / predicate yields BOOLEAN — portable
    val isPredicate = {
      var d = 0; var inStr = false; var found = false; var i = 0
      while (i < stripped.length && !found) {
        val c = stripped(i)
        if (c == '\'') inStr = !inStr
        if (!inStr) {
          if (c == '(' || c == '[') d += 1
          else if (c == ')' || c == ']') d -= 1
          else if (d == 0 && (c == '>' || c == '<' || c == '=')) found = true
          else if (d == 0 &&
                   Seq(" IS ", " IN ", " LIKE ", " BETWEEN ").exists(k =>
                     stripped.regionMatches(true, i, k, 0, k.length)))
            found = true
        }
        i += 1
      }
      found
    }
    val hasProducer =
      "(?i)\\bsum\\s*\\(".r.findFirstIn(stripped).isDefined ||
      "(?i)\\bhugeint\\b".r.findFirstIn(stripped).isDefined ||
      "(?i)\\bdecimal\\b".r.findFirstIn(stripped).isDefined
    val refsWide = wideAliases.exists(a =>
      ("(?i)\\b" + java.util.regex.Pattern.quote(a) + "\\b").r
        .findFirstIn(stripped).isDefined)
    // `/` (true division, not `//`) yields DOUBLE in DuckDB and any
    // arithmetic over a DOUBLE stays DOUBLE — portable
    val hasDiv = stripped.replace("//", " ").contains('/')
    (hasProducer || refsWide) && !isPredicate && !hasDiv
  }

  /** Final-select columns of `sql` whose DuckDB type can be HUGEINT or
    * DECIMAL — i.e. wide producers not CAST to a portable type, with
    * wideness propagated through the CTE chain. */
  private def wideFinalColumns(sql: String): Seq[String] = {
    val (ctes, fin) = selectLists(sql)
    var wideAliases = Set.empty[String]
    ctes.foreach { case (_, lst) =>
      val newWide = splitTop(lst, ',').flatMap { item =>
        if (isWide(item, wideAliases)) aliasOf(item) else None
      }
      wideAliases ++= newWide
    }
    splitTop(fin, ',').filter(i => i.trim.nonEmpty && isWide(i, wideAliases))
      .map(i => aliasOf(i).getOrElse(i.trim.take(60)))
  }

  test("no oracle emits a wide-integer (HUGEINT/DECIMAL) output column") {
    val bad = SparkEntry.catalog.flatMap { q =>
      q.oracleNow.toSeq.flatMap { sql =>
        wideFinalColumns(sql).map(c =>
          s"${q.name}: output column `$c` can be HUGEINT/DECIMAL — " +
            "CAST it to BIGINT/DOUBLE/VARCHAR in the final SELECT")
      }
    }
    assert(bad.isEmpty,
      "wide-integer oracle output columns (round-7 red class):\n" +
        bad.mkString("\n"))
  }

  test("wide-type lint catches the three round-7 red shapes") {
    // corpus_token_budget shape: windowed sum escapes through CTE aliases
    val tb = """WITH s AS (SELECT src, CAST(sum(n) AS BIGINT) AS tokens FROM t GROUP BY 1),
      a AS (SELECT src, (2 * sum(tokens) OVER () * 3) // 7 AS target FROM s)
      SELECT src, target FROM a"""
    assert(wideFinalColumns(tb) == Seq("target"))
    // text_ngram_novelty shape: uncast `1000000 * sum(..) // count(*)`
    val nn = """SELECT b, CAST(count(*) AS BIGINT) AS n,
      (1000000 * sum(CASE WHEN x THEN 1 ELSE 0 END)) // count(*) AS ppm
      FROM w GROUP BY b"""
    assert(wideFinalColumns(nn) == Seq("ppm"))
    // corpus_resume_skip shape: DECIMAL(38,0) cast in the final select
    val rs = "SELECT CAST(sum(dh) AS DECIMAL(38,0)) AS digest FROM t"
    assert(wideFinalColumns(rs) == Seq("digest"))
    // …and the FIXED forms are clean
    assert(wideFinalColumns(
      "SELECT CAST(CAST(sum(dh) AS DECIMAL(38,0)) AS VARCHAR) AS d FROM t")
      .isEmpty)
    assert(wideFinalColumns(
      """WITH a AS (SELECT (2 * sum(n) OVER ()) // 7 AS target FROM s)
         SELECT CAST(target AS BIGINT) AS target FROM a""").isEmpty)
    // sum-over-double ratios stay portable via the `/` rule
    assert(wideFinalColumns(
      "SELECT sum(x) / sum(y) AS ratio FROM t GROUP BY g").isEmpty)
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
