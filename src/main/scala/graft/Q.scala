package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-visible query: a Spark DataFrame program plus (when
  * expressible) the equivalent ANSI SQL the driver runs in DuckDB over the
  * same parquet tables. Column names/aliases MUST match between the two —
  * the driver sorts columns by name before hashing values.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object Q {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Q = Q(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
