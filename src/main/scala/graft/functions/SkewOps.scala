package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation building blocks (builder prompt: "salting for skew";
  * SURVEY.md §4 AQE notes). AQE's skew-join split handles most cases at
  * runtime; these are the explicit plan-level tools for pipelines where a
  * handful of keys dominate (a hot project_id, a boilerplate dedup
  * shingle, an empty-string join key).
  *
  * Both transforms are RESULT-PRESERVING: the salted aggregation re-merges
  * partials, the salted join replicates the small side across salts.
  * `agg_salted` proves the former against the plain-GROUP BY oracle.
  */
object SkewOps {

  /** Deterministic per-row salt in [0, n): hash of the given columns —
    * stable across retries (no rand(), which would break task replay). */
  def salt(n: Int, cols: Column*): Column = pmod(xxhash64(cols: _*), lit(n))

  /** Two-phase salted sum/count aggregation: groupBy(key, salt) partial →
    * groupBy(key) final. The hot key's rows spread over `n` reducers in
    * phase one; phase two merges n small partials per key. */
  def saltedSumCount(df: DataFrame, key: Column, value: Column, n: Int,
                     saltSource: Column*): DataFrame =
    df.groupBy(key.as("k"), salt(n, saltSource: _*).as("s"))
      .agg(sum(value).as("partial_sum"), count(lit(1)).as("partial_n"))
      .groupBy(col("k"))
      .agg(sum(col("partial_sum")).as("total"), sum(col("partial_n")).as("n"))

  /** Salted equi-join: the big (skewed) side gets a deterministic salt,
    * the small side is replicated once per salt value, and the join key
    * becomes (key, salt) — a hot key's rows land on n reducers instead of
    * one. Inner-join semantics preserved exactly. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, n: Int,
                 bigSaltSource: Column*): DataFrame = {
    val salted = big.withColumn("_salt", salt(n, bigSaltSource: _*))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(n - 1)).cast("array<bigint>")))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
