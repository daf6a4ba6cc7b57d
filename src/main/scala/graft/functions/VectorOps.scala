package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector kernels over `array<double>` columns, composed from codegen'd
  * higher-order functions (SURVEY.md §2.11, §4 custom piece 1). The HOF
  * composition keeps the whole computation inside Catalyst (no UDF
  * serialization boundary); a native `Expression` with `doGenCode` is the
  * next escalation if these show up hot in the bench.
  */
object VectorOps {

  /** Σ xᵢyᵢ — left-to-right double fold (deterministic order, matching
    * DuckDB's list arithmetic for oracle parity). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cast an array<float> embedding to array<double> once, up front —
    * all downstream arithmetic then runs in double precision. */
  def toDouble(a: Column): Column = transform(a, x => x.cast("double"))
}
