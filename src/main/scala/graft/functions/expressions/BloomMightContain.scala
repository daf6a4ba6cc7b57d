package graft.functions.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression: membership probe of a long key against a
  * pre-built [[org.apache.spark.util.sketch.BloomFilter]] — the probe side
  * of an explicit bloom-filter join (`join_bloom`).
  *
  * The filter rides a TORRENT BROADCAST, not an expression literal: the
  * expression serializes as just the broadcast handle, so executors fetch
  * the bitmap once per JVM through the BitTorrent-style broadcast
  * mechanism instead of receiving it embedded in every task's serialized
  * plan. That is what keeps the design honest at the scale it targets — a
  * 10⁹-key dimension is a ~1.2 GB bitmap at 1% fpp (vs ~30+ GB as a
  * broadcast hash relation), which a plan literal would re-ship per task
  * but a broadcast ships once per executor. False positives are fine by
  * construction: the exact join above the probe removes them; what the
  * bloom buys is shuffling only `match-rate + fpp` of the fact side.
  *
  * Codegen emits a single virtual call on the broadcast's value — stays
  * inside whole-stage codegen, no boxing, no UDF dispatch.
  */
case class BloomMightContain(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a bigint key, got ${t.simpleString}")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(k: Any): Any =
    bloom.value.mightContainLong(k.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[BloomFilter]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = ((${classOf[BloomFilter].getName}) $ref.value())
         |  .mightContainLong($c);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BloomMightContain = copy(child = newChild)
}
