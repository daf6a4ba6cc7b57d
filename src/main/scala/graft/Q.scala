package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-visible query: a Spark DataFrame program plus (when
  * expressible) the equivalent ANSI SQL the driver runs in DuckDB over the
  * same parquet tables. Column names/aliases MUST match between the two —
  * the driver sorts columns by name before hashing values.
  *
  * `fn` is normally a pure PLAN BUILDER: constructing the DataFrame runs
  * no Spark job, so plan-only callers (plan audits, doc generators,
  * `.explain`) are free. Queries whose construction inherently requires
  * execution (iterative convergence loops, index training) are flagged
  * `eager = true`; plan-only tooling must skip those or accept the jobs.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    eager: Boolean = false,
    /** For oracles that can only be rendered AFTER the query has run —
      * e.g. a trained-index query whose oracle inlines the trained
      * artifact (vector_ann_ivf's centroids). The thunk may return None
      * when the artifact does not exist yet (query never ran in this
      * JVM); Verify dumps oracle SQL after running the queries, so the
      * driver always sees the rendered form. */
    oracleGen: Option[() => Option[String]] = None
) {
  /** The oracle as of now: a static oracle, or the generated one if its
    * artifact is available. */
  def oracleNow: Option[String] = oracleGen.map(_()).getOrElse(oracle)
}

object Q {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Q = Q(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
