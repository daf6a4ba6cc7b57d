package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: the full product-quantization
  * encode + ADC score of a vector in ONE codegen loop — for each of the
  * M subspaces, find the nearest codebook centroid (L2, ties to the
  * lowest code) and accumulate that (subspace, code)'s pre-quantized
  * query distance from the lookup table.
  *
  * Composing this from built-ins (`least()` over K (distance, code)
  * structs per subspace × M subspaces) is semantically identical but
  * allocates and compares struct rows per candidate — interpreted
  * ordering, out of whole-stage codegen. This expression is the same
  * arithmetic as three nested primitive loops: left-to-right L2
  * accumulation (≡ DuckDB `list_sum`), strict `<` keeping the FIRST
  * minimum (≡ `ORDER BY distance, code`), exact BIGINT LUT sums — so
  * the generated PQ oracle is unchanged. Measured at sf0.1 (min-of-3):
  * the struct-least formulation scored in 2.65 s, this kernel in
  * 0.42 s — the struct machinery was ~5/6 of the query.
  *
  * The codebooks/LUT are index geometry (M·K·sub doubles — tens of KB),
  * not data, so shipping them as plan references is safe at any corpus
  * scale.
  */
case class PqAdc(child: Expression,
                 codebooks: Array[Array[Array[Double]]],
                 lut: Array[Array[Long]])
    extends UnaryExpression {

  private val m = codebooks.length
  private val k = codebooks(0).length
  private val sub = codebooks(0)(0).length

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<double>, got ${t.simpleString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    require(v.numElements() == m * sub,
      s"pq_adc: expected ${m * sub} dims, got ${v.numElements()}")
    var adc = 0L
    var mi = 0
    while (mi < m) {
      var best = Double.PositiveInfinity
      var code = 0
      var j = 0
      while (j < k) {
        val c = codebooks(mi)(j)
        var s = 0.0
        var i = 0
        while (i < sub) {
          val d = v.getDouble(mi * sub + i) - c(i)
          s += d * d
          i += 1
        }
        if (s < best) { best = s; code = j }
        j += 1
      }
      adc += lut(mi)(code)
      mi += 1
    }
    adc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCb", codebooks, "double[][][]")
    val lutRef = ctx.addReferenceObj("pqLut", lut, "long[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val adc = ctx.freshName("adc")
      val mi = ctx.freshName("mi")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val best = ctx.freshName("best")
      val code = ctx.freshName("code")
      val s = ctx.freshName("s")
      val dd = ctx.freshName("dd")
      val cbm = ctx.freshName("cbm")
      val cc = ctx.freshName("cc")
      s"""
         |if ($v.numElements() != ${m * sub}) {
         |  throw new IllegalArgumentException(
         |    "pq_adc: expected ${m * sub} dims, got " + $v.numElements());
         |}
         |long $adc = 0L;
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  double[][] $cbm = $cbRef[$mi];
         |  double $best = Double.POSITIVE_INFINITY;
         |  int $code = 0;
         |  for (int $j = 0; $j < $k; $j++) {
         |    double[] $cc = $cbm[$j];
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $sub; $i++) {
         |      double $dd = $v.getDouble($mi * $sub + $i) - $cc[$i];
         |      $s += $dd * $dd;
         |    }
         |    if ($s < $best) { $best = $s; $code = $j; }
         |  }
         |  $adc += $lutRef[$mi][$code];
         |}
         |${ev.value} = $adc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdc =
    copy(child = newChild)
}
