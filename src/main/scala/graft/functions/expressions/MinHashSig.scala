package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature of a text column in ONE narrow pass
  * (SURVEY.md §2.11): tokenize on spaces, slide the n-token shingle
  * window, hash each shingle with the portable MD5-prefix
  * ([[PortableHash.hash60]]), and fold all k affine minima in place.
  *
  * Why an expression: the aggregate formulation (generator explode →
  * groupBy(doc) with k min()s) is correct but pays a ~50× row explosion
  * and a full shuffle before the first semantic operation. A document's
  * signature depends on nothing but its own text, so it is a SCALAR of
  * the row — as an expression the signature step becomes map-only and
  * the first exchange in a dedup plan is the band join itself. This is
  * also what makes STREAMING near-dup dedup possible: signatures appear
  * on the stream without a (watermark-hostile) aggregation.
  *
  * min over the shingle multiset equals min over the distinct-shingle
  * set, so no per-document dedup buffer is needed — the values are
  * bit-identical to the aggregate path over [[ShingleHashes]]
  * (portable), which DedupSpec asserts.
  *
  * Documents with fewer than n tokens have no shingles and yield NULL
  * (the aggregate path simply has no rows for them — callers filter).
  *
  * @param ab the affine family (a_j, b_j); signature slot j is
  *           min over shingles of (a_j·(x mod p) + b_j) mod p
  */
case class MinHashSig(child: Expression, n: Int,
                      ab: Seq[(Long, Long)], p: Long)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string column, got ${child.dataType.simpleString}")
    else if (n < 1 || ab.isEmpty || p < 2)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs n >= 1, a non-empty hash family, p >= 2")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // < n tokens -> null
  override def prettyName: String = "minhash_sig"

  private lazy val as: Array[Long] = ab.map(_._1).toArray
  private lazy val bs: Array[Long] = ab.map(_._2).toArray

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val len = bytes.length
    var starts = new Array[Int](16)
    var k = 0
    def addStart(pos: Int): Unit = {
      if (k == starts.length) starts = java.util.Arrays.copyOf(starts, k * 2)
      starts(k) = pos; k += 1
    }
    addStart(0)
    var q = 0
    while (q < len) {
      if (bytes(q) == 0x20) addStart(q + 1)
      q += 1
    }
    if (k < n) return null
    val kk = as.length
    val mins = Array.fill(kk)(Long.MaxValue)
    var i = 0
    while (i + n <= k) {
      val from = starts(i)
      val until = if (i + n < k) starts(i + n) - 1 else len
      val x = PortableHash.hash60(bytes, from, until - from) % p
      var j = 0
      while (j < kk) {
        val h = (as(j) * x + bs(j)) % p
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSig = copy(child = newChild)
}
