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
    eager: Boolean = false
)

object Q {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Q = Q(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
