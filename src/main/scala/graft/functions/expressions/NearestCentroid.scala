package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression: index of the nearest centroid (squared-L2
  * argmin, strict `<` keeping the FIRST minimum ≡ `ORDER BY dd, cid`) for
  * an `array<double>` vector against a fixed centroid table — the coarse
  * quantizer's assignment step, as ONE codegen loop per row.
  *
  * This is what makes full-corpus cell assignment a pure NARROW
  * projection: the alternative (cross-join the k centroids and take
  * `max_by`/`min_by` per vector, as `assignCells` does) shuffles n×k rows
  * through a vec_id-keyed aggregate, and the `least()`-over-structs
  * composition drops out of whole-stage codegen (measured 6× slower on
  * the PQ kernel — see [[PqAdc]]). The centroid table is index geometry
  * (k·dim doubles, a few KB), shipped as a plan reference like the PQ
  * codebooks — never broadcast, never shuffled.
  *
  * For UNIT centroids (spherical k-means output), L2 argmin ≡ cosine
  * argmax (d² = |v|² − 2·v·c + 1), so this also assigns cosine-trained
  * IVF cells. Accumulation is left-to-right double ≡ DuckDB `list_sum`,
  * so centroid-inlined oracles mirror it bit-exactly with
  * `row_number() OVER (ORDER BY dd, cid) = 1`.
  */
case class NearestCentroid(child: Expression,
                           centroids: Array[Array[Double]])
    extends UnaryExpression {

  private val k = centroids.length
  private val dim = centroids(0).length

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<double>, got ${t.simpleString}")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    require(v.numElements() == dim,
      s"nearest_centroid: expected $dim dims, got ${v.numElements()}")
    var best = Double.PositiveInfinity
    var cell = 0
    var j = 0
    while (j < k) {
      val c = centroids(j)
      var s = 0.0
      var i = 0
      while (i < dim) {
        val d = v.getDouble(i) - c(i)
        s += d * d
        i += 1
      }
      if (s < best) { best = s; cell = j }
      j += 1
    }
    cell
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val dd = ctx.freshName("dd")
      val best = ctx.freshName("best")
      val cell = ctx.freshName("cell")
      val cc = ctx.freshName("cc")
      s"""
         |if ($v.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "nearest_centroid: expected $dim dims, got " + $v.numElements());
         |}
         |double $best = Double.POSITIVE_INFINITY;
         |int $cell = 0;
         |for (int $j = 0; $j < $k; $j++) {
         |  double[] $cc = $cRef[$j];
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    double $dd = $v.getDouble($i) - $cc[$i];
         |    $s += $dd * $dd;
         |  }
         |  if ($s < $best) { $best = $s; $cell = $j; }
         |}
         |${ev.value} = $cell;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}
