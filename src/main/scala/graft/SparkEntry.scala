package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2, built as a
  * declarative DataFrame plan (Catalyst optimizes; see module Scaladoc for
  * the scale posture of each operator family). [[oracleSql]] carries the
  * DuckDB-equivalent ANSI SQL where expressible.
  */
object SparkEntry {

  /** All operator modules, in SURVEY §7.2 build order. Public as the
    * catalog so tooling can read per-query metadata (e.g. `Q.eager` —
    * plan-only tools must skip eager entries or accept the jobs). */
  def catalog: Seq[Q] = modules

  /** (module name, its queries) — the per-query provenance the generated
    * SURVEY.md §2.0 table and docs tooling read. */
  def moduleCatalog: Seq[(String, Seq[Q])] = Seq(
    "Relational"   -> operators.Relational.all,
    "Windows"      -> operators.Windows.all,
    "Pipeline"     -> operators.Pipeline.all,
    "TextAnalysis" -> operators.TextAnalysis.all,
    "Dedup"        -> operators.Dedup.all,
    "Corpus"       -> operators.Corpus.all,
    "Vectors"      -> operators.Vectors.all,
    "Streaming"    -> operators.Streaming.all,
    "TimeSeries"   -> operators.TimeSeries.all,
    "MlEval"       -> operators.MlEval.all,
    "Geo"          -> operators.Geo.all,
    "Multimodal"   -> operators.Multimodal.all,
    "Bpe"          -> operators.Bpe.all)

  private def modules: Seq[Q] = moduleCatalog.flatMap(_._2)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q3-shaped multiway join + agg + top-k (SURVEY §7.2 step 1). */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.joinMultiway.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(q => q.oracleNow.map(q.name -> _)).toMap
}
