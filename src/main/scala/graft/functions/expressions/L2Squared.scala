package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: squared Euclidean distance of two
  * `array<double>` columns in one codegen'd pass — the inner loop of the
  * product-quantization operators (`vector_pq`), where it runs
  * M·K times per vector during encoding. Same rationale as
  * [[CosineSimilarity]]: a HOF composition is interpreted per element;
  * this JIT-compiles to a tight primitive loop.
  *
  * Accumulation is left-to-right in double precision — identical to
  * DuckDB's `list_sum` over a comprehension, so PQ oracles hash-compare
  * bit-exactly (the [[CosineSimilarity]] precedent).
  */
case class L2Squared(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_sq"

  /** Mismatched dimensions are malformed data — fail loudly rather than
    * silently truncating (the [[CosineSimilarity]] contract). */
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"l2_sq: vector dimensions differ ($n vs ${y.numElements()})")
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val dd = ctx.freshName("dd")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  throw new IllegalArgumentException(
         |    "l2_sq: vector dimensions differ (" + $n + " vs " +
         |    $y.numElements() + ")");
         |}
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $dd = $x.getDouble($i) - $y.getDouble($i);
         |  $s += $dd * $dd;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Squared =
    copy(left = newLeft, right = newRight)
}
