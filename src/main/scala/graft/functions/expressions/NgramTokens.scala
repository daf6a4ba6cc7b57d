package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Generator emitting every word n-gram of a text column as its
  * space-joined string, WITH multiplicity, in document order — the
  * counting companion of [[ShingleHashes]] (which dedupes and hashes for
  * set-similarity work; LM-style frequency counting needs every
  * occurrence and the actual text).
  *
  * Why a Generator: the built-ins formulation
  * (`transform(sequence(...), i -> concat_ws(element_at, element_at))` +
  * explode) is an interpreted higher-order function that materializes the
  * full n-gram array per row before exploding. This generator streams
  * n-grams in one byte scan: tokens are located by scanning for 0x20 (a
  * space byte never occurs inside a UTF-8 multibyte sequence), and an
  * n-gram's space-joined form IS the contiguous original byte slice
  * spanning its tokens — one `byte[]` copy of the text per document, each
  * emitted n-gram a zero-copy view into it. Split semantics match
  * `split(text, ' ')` with empties kept; documents with fewer than n
  * tokens emit nothing.
  */
case class NgramTokens(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string column, got ${child.dataType.simpleString}")
    else if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs n >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess

  override def elementSchema: StructType = StructType(Seq(
    StructField("ngram", StringType, nullable = false)))

  override def prettyName: String = "ngram_tokens"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    // one defensive copy per document: the source UTF8String may view a
    // reused row buffer, and the emitted slices outlive this eval
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val len = bytes.length
    var starts = new Array[Int](16)
    var k = 0
    def addStart(p: Int): Unit = {
      if (k == starts.length) starts = java.util.Arrays.copyOf(starts, k * 2)
      starts(k) = p; k += 1
    }
    addStart(0)
    var p = 0
    while (p < len) {
      if (bytes(p) == 0x20) addStart(p + 1)
      p += 1
    }
    if (k < n) return Nil
    val kk = k
    val nn = n
    new Iterator[InternalRow] {
      private var i = 0
      override def hasNext: Boolean = i + nn <= kk
      override def next(): InternalRow = {
        val from = starts(i)
        val until = if (i + nn < kk) starts(i + nn) - 1 else len
        i += 1
        new GenericInternalRow(Array[Any](
          UTF8String.fromBytes(bytes, from, until - from)))
      }
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): NgramTokens = copy(child = newChild)
}
