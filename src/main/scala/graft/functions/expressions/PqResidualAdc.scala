package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Native Catalyst expression: the IVFADC scoring step (Jégou et al.
  * 2011 §IV) — residual-encode a vector against its coarse cell and
  * accumulate the query's per-(cell, subspace, code) ADC lookup values,
  * all in ONE codegen loop. For a vector v in cell c: r = v − coarse[c],
  * then for each subspace the nearest residual-codebook centroid
  * (squared-L2, strict `<` keeping the FIRST minimum ≡
  * `ORDER BY dd, code`), summing `lut[c][m][code]` as exact BIGINTs.
  *
  * `lut` is indexed by cell id and is null for unprobed cells — the
  * probe filter upstream guarantees only probed cells reach this
  * expression; a null lookup is therefore a malformed plan and fails
  * loudly. Like [[PqAdc]], all tables are index geometry (a few tens of
  * KB) shipped as plan references; the arithmetic is left-to-right
  * double accumulation ≡ DuckDB `list_sum`, so the generated
  * coarse+codebook-inlined oracle hash-compares bit-exactly.
  */
case class PqResidualAdc(left: Expression,   // v: array<double>
                         right: Expression,  // cell: int
                         coarse: Array[Array[Double]],
                         codebooks: Array[Array[Array[Double]]],
                         lut: Array[Array[Array[Long]]])
    extends BinaryExpression {

  private val m = codebooks.length
  private val k = codebooks(0).length
  private val sub = codebooks(0)(0).length

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<double>, int), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "pq_residual_adc"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cell = b.asInstanceOf[Int]
    require(v.numElements() == m * sub,
      s"pq_residual_adc: expected ${m * sub} dims, got ${v.numElements()}")
    val cellLut = lut(cell)
    require(cellLut != null, s"pq_residual_adc: unprobed cell $cell")
    val cc = coarse(cell)
    var adc = 0L
    var mi = 0
    while (mi < m) {
      var best = Double.PositiveInfinity
      var code = 0
      var j = 0
      while (j < k) {
        val cb = codebooks(mi)(j)
        var s = 0.0
        var i = 0
        while (i < sub) {
          val d = (v.getDouble(mi * sub + i) - cc(mi * sub + i)) - cb(i)
          s += d * d
          i += 1
        }
        if (s < best) { best = s; code = j }
        j += 1
      }
      adc += cellLut(mi)(code)
      mi += 1
    }
    adc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val coarseRef = ctx.addReferenceObj("ivfpqCoarse", coarse, "double[][]")
    val cbRef = ctx.addReferenceObj("ivfpqCb", codebooks, "double[][][]")
    val lutRef = ctx.addReferenceObj("ivfpqLut", lut, "long[][][]")
    nullSafeCodeGen(ctx, ev, (v, cell) => {
      val adc = ctx.freshName("adc")
      val mi = ctx.freshName("mi")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val best = ctx.freshName("best")
      val code = ctx.freshName("code")
      val s = ctx.freshName("s")
      val dd = ctx.freshName("dd")
      val cbm = ctx.freshName("cbm")
      val cb = ctx.freshName("cb")
      val cc = ctx.freshName("cc")
      val cellLut = ctx.freshName("cellLut")
      s"""
         |if ($v.numElements() != ${m * sub}) {
         |  throw new IllegalArgumentException(
         |    "pq_residual_adc: expected ${m * sub} dims, got " + $v.numElements());
         |}
         |long[][] $cellLut = $lutRef[$cell];
         |if ($cellLut == null) {
         |  throw new IllegalStateException(
         |    "pq_residual_adc: unprobed cell " + $cell);
         |}
         |double[] $cc = $coarseRef[$cell];
         |long $adc = 0L;
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  double[][] $cbm = $cbRef[$mi];
         |  double $best = Double.POSITIVE_INFINITY;
         |  int $code = 0;
         |  for (int $j = 0; $j < $k; $j++) {
         |    double[] $cb = $cbm[$j];
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $sub; $i++) {
         |      double $dd = ($v.getDouble($mi * $sub + $i) - $cc[$mi * $sub + $i]) - $cb[$i];
         |      $s += $dd * $dd;
         |    }
         |    if ($s < $best) { $best = $s; $code = $j; }
         |  }
         |  $adc += $cellLut[$mi][$code];
         |}
         |${ev.value} = $adc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqResidualAdc =
    copy(left = newLeft, right = newRight)
}
