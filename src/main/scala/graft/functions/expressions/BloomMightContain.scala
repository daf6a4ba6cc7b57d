package graft.functions.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression: membership probe of a long key against a
  * pre-built [[org.apache.spark.util.sketch.BloomFilter]] — the probe side
  * of an explicit bloom-filter join (`join_bloom`).
  *
  * The filter ships as its serialized bytes (the expression is sent to
  * executors for interpreted eval; the deserialized filter is rebuilt
  * lazily per JVM and installed once as a codegen reference object), so
  * one broadcast-sized bitmap — kilobytes for a selective build side, vs
  * the megabytes a broadcast hash relation needs for the same keys —
  * prunes the probe side BEFORE its shuffle. False positives are fine by
  * construction: the exact join above the probe removes them; what the
  * bloom buys is shuffling only `match-rate + fpp` of the fact table.
  *
  * Codegen emits a single virtual call on the referenced filter — stays
  * inside whole-stage codegen, no boxing, no UDF dispatch.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a bigint key, got ${t.simpleString}")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(k: Any): Any =
    filter.mightContainLong(k.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BloomMightContain = copy(child = newChild)
}
