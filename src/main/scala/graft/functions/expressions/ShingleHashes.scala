package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression, XXH64}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst Generator (SURVEY.md §2.11 UDTF surface): one pass over
  * a text column emitting the document's DISTINCT n-gram shingle hashes,
  * each row also carrying the document's distinct-shingle count.
  *
  * Why a Generator instead of composing built-ins: the built-in
  * formulation (posexplode → window `lead` for the n-gram → hash →
  * `distinct` → window `count` for the doc size) costs TWO shuffles and a
  * per-doc sort before any real work starts — at 100 TB that is the
  * dominant cost of every shingle-based dedup query. This generator is a
  * NARROW operator: tokenize, hash, and dedupe inside one row's
  * evaluation; the first shuffle in the plan is then the one that does
  * semantic work (the posting-list groupBy).
  *
  * Zero-copy: tokens are byte ranges found by scanning for 0x20 (a space
  * byte never occurs inside a UTF-8 multibyte sequence), and an n-gram's
  * space-joined text IS the contiguous original byte slice spanning its
  * tokens — so each shingle hash is xxhash64 (Spark's XXH64, seed 42)
  * over a slice of the input buffer, no per-token or per-shingle
  * allocation at all. Split semantics match `split(text, ' ')` with
  * limit -1 (empty tokens kept). Emission order is first-occurrence;
  * all consumers aggregate, so order is immaterial. Shingle hash values
  * are engine-internal (the DuckDB oracle counts distinct shingle
  * strings — equal counts by injectivity up to 2⁻⁶⁴ collisions).
  *
  * `portable = true` switches the hash to [[PortableHash.hash60]] (MD5
  * prefix, reproducible in any engine with `md5(text)`), which is what
  * lets MinHash signatures built on this generator carry a full DuckDB
  * value oracle. That mode pays one on-heap copy of the document and MD5
  * cost per shingle; the default stays the zero-copy xxhash64 path.
  */
case class ShingleHashes(child: Expression, n: Int,
                         portable: Boolean = false)
    extends UnaryExpression with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string column, got ${child.dataType.simpleString}")
    else if (n < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName needs n >= 1, got $n")
    else TypeCheckResult.TypeCheckSuccess

  override def elementSchema: StructType = StructType(Seq(
    StructField("sgl", LongType, nullable = false),
    StructField("n_sgl", IntegerType, nullable = false)))

  override def prettyName: String = "shingle_hashes"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    val u = v.asInstanceOf[UTF8String]
    // portable mode hashes on-heap byte slices (MessageDigest needs a
    // byte[]), so take the one copy up front; the default path stays
    // zero-copy over the original buffer
    val copied: Array[Byte] = if (portable) u.getBytes else null
    val base: AnyRef =
      if (portable) copied else u.getBaseObject
    val off: Long =
      if (portable) org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET
      else u.getBaseOffset
    val len = u.numBytes
    // token start positions (byte offsets): position 0 plus one after
    // every space byte — identical to split-on-single-space with empties
    var starts = new Array[Int](16)
    var k = 0
    def addStart(p: Int): Unit = {
      if (k == starts.length) starts = java.util.Arrays.copyOf(starts, k * 2)
      starts(k) = p; k += 1
    }
    addStart(0)
    var p = 0
    while (p < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + p) == 0x20)
        addStart(p + 1)
      p += 1
    }
    if (k < n) return Nil
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i + n <= k) {
      val from = starts(i)
      // the n-gram's space-joined form is the original byte slice up to
      // (not including) the space before token i+n
      val until = if (i + n < k) starts(i + n) - 1 else len
      val h =
        if (portable) PortableHash.hash60(copied, from, until - from)
        else XXH64.hashUnsafeBytes(base, off + from, until - from, 42L)
      seen.add(h)
      i += 1
    }
    val size = seen.size()
    val out = new Array[InternalRow](size)
    val it = seen.iterator()
    var r = 0
    while (it.hasNext) {
      out(r) = new GenericInternalRow(Array[Any](it.next().longValue(), size))
      r += 1
    }
    out
  }

  override protected def withNewChildInternal(
      newChild: Expression): ShingleHashes = copy(child = newChild)
}
