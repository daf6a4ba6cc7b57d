package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector kernels over `array<double>` columns (SURVEY.md §2.11, §4 custom
  * piece 1). The hot path ([[cosine]]) is the native codegen'd
  * [[graft.functions.expressions.CosineSimilarity]] expression; the HOF
  * compositions are kept as the pure-built-ins fallback (identical results
  * — same accumulation order — ~20× slower on all-pairs workloads because
  * higher-order functions are interpreted per element).
  */
object VectorOps {

  /** Σ xᵢyᵢ — left-to-right double fold (deterministic order, matching
    * DuckDB's list arithmetic for oracle parity). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  /** Native single-pass cosine (whole-stage codegen). */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.functions.expressions.CosineSimilarity(
      Bridge.expression(a), Bridge.expression(b)))
  }

  /** HOF fallback — bit-identical to [[cosine]], no custom expression. */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Native single-pass dot product (whole-stage codegen) — the banded
    * pair-scoring kernel: with per-vector norms precomputed in the band
    * rows, `dotNative(a,b)/(nrm_a*nrm_b)` is bit-identical to [[cosine]]
    * at a third of the per-pair flops. */
  def dotNative(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.functions.expressions.DotProduct(
      Bridge.expression(a), Bridge.expression(b)))
  }

  /** Native single-pass squared Euclidean distance (whole-stage codegen)
    * — the PQ encode/rerank kernel. */
  def l2Sq(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.functions.expressions.L2Squared(
      Bridge.expression(a), Bridge.expression(b)))
  }

  /** Cast an array<float> embedding to array<double> once, up front —
    * all downstream arithmetic then runs in double precision. */
  def toDouble(a: Column): Column = transform(a, x => x.cast("double"))
}
