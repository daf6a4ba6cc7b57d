package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Morton (Z-order) bit interleaving for multi-dimensional data layout.
  * Kept as a standalone object with static forwarders so generated
  * whole-stage code can call it directly. */
object ZOrderUtil {
  /** Spread the 32 bits of `v` over the even bit positions of a long. */
  def spread(v: Int): Long = {
    var x = v.toLong & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** 64-bit Morton code of two signed ints. The sign bit is flipped so
    * the unsigned interleave preserves signed ordering per dimension
    * (negative values sort before positive, as a layout key should). */
  def interleave(a: Int, b: Int): Long =
    (spread(a ^ Int.MinValue) << 1) | spread(b ^ Int.MinValue)
}

/** `interleave_bits(a, b)` — the Z-order layout key (SURVEY.md §2.12
  * maintenance family): sorting rows by the Morton code clusters rows
  * that are close in BOTH dimensions into the same parquet row groups,
  * so range predicates on either (or both) dimensions prune row groups
  * at the footer. A linear sort can only ever serve its leading column;
  * this is the standard multi-dimensional data-skipping layout for a
  * 100 TB table with more than one hot filter column. Codegen'd: the
  * interleave is a handful of shift/mask ops inside whole-stage codegen.
  *
  * Raw int values interleave directly (sign-flipped); dimensions with
  * wildly different ranges should be rank-normalized first (at cluster
  * scale: `range_partition_id`-style bucketing per dimension) so both
  * contribute comparable bit entropy. */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == IntegerType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (int, int), got " +
      s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderUtil.interleave(a.asInstanceOf[Int], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.ZOrderUtil.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}
