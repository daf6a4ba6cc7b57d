package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash of a whitespace-tokenized text column
  * (SURVEY.md §2.11): per token occurrence, xxhash64(seed 42) votes ±1 on
  * each of the 64 bit positions; the sign of each vote total becomes the
  * bit. Identical algorithm (same hash, same seed) to the built-ins
  * formulation it replaces — explode(tokens) → groupBy(doc) with 64
  * conditional sums — but as ONE narrow projection: no row explosion
  * (~50× on prose) and no shuffle at all before the band join. At 100 TB
  * the signature step of simhash dedup becomes a map-only pass.
  */
case class SimHash64(child: Expression, portable: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  /** Signature width: 64 bits on the xxhash64 path, 60 on the portable
    * path ([[PortableHash.hash60]] carries 60 hash bits). */
  def bits: Int = if (portable) 60 else 64

  override def nullSafeEval(v: Any): Any = {
    // zero-copy tokenization: scan the UTF-8 bytes for 0x20 (a space
    // never occurs inside a multibyte sequence) and hash each token's
    // byte range in place — split(text, ' ') semantics, empties kept.
    // Portable mode takes one on-heap copy (MD5 needs a byte[]).
    val u = v.asInstanceOf[UTF8String]
    val copied: Array[Byte] = if (portable) u.getBytes else null
    val base: AnyRef = if (portable) copied else u.getBaseObject
    val off: Long =
      if (portable) Platform.BYTE_ARRAY_OFFSET else u.getBaseOffset
    val len = u.numBytes
    val nb = bits
    val votes = new Array[Int](nb)
    var tokStart = 0
    var p = 0
    while (p <= len) {
      val atSep = p == len ||
        Platform.getByte(base, off + p) == 0x20
      if (atSep) {
        val h =
          if (portable) PortableHash.hash60(copied, tokStart, p - tokStart)
          else XXH64.hashUnsafeBytes(base, off + tokStart, p - tokStart, 42L)
        var j = 0
        while (j < nb) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
        tokStart = p + 1
      }
      p += 1
    }
    var sig = 0L
    var j = 0
    while (j < nb) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(
      newChild: Expression): SimHash64 = copy(child = newChild)
}
