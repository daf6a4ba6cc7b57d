package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StructType}

/** Native Generator emitting all ordered element pairs (i < j) of an
  * array<struct> column — the posting-list → candidate-pairs step of the
  * inverted-index join (SURVEY.md §2.8).
  *
  * Why not `explode(flatten(transform(slice(...))))`: that composition
  * MATERIALIZES the full k·(k-1)/2 pair array per row before the explode —
  * for a posting list at the stop-cap (1024 docs) that is ~524k nested
  * structs allocated at once per shingle, a per-row memory spike that
  * scales with the square of the cap. This generator streams pairs one at
  * a time through the iterator contract, so peak memory per row is one
  * pair regardless of list size. (The HOF composition is also interpreted
  * per element; the generator does one array walk.)
  *
  * Output schema: the element struct's fields twice — first element's
  * fields suffixed `_a`, second's `_b`.
  */
case class OrderedPairs(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  private lazy val elemType: StructType =
    child.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StructType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<struct<...>>, got ${other.simpleString}")
  }

  override def elementSchema: StructType = StructType(
    elemType.fields.map(f => f.copy(name = f.name + "_a")) ++
    elemType.fields.map(f => f.copy(name = f.name + "_b")))

  override def prettyName: String = "ordered_pairs"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    val arr = v.asInstanceOf[ArrayData]
    val nf = elemType.length
    val fields = elemType.fields
    // null elements carry no pairable value — skip them (the input type
    // allows containsNull=true, and getStruct returns null for a null
    // element, which would NPE on field access below)
    val idx = (0 until arr.numElements()).filter(!arr.isNullAt(_))
    val k = idx.length
    if (k < 2) return Nil
    new Iterator[InternalRow] {
      private var i = 0
      private var j = 1
      override def hasNext: Boolean = i < k - 1
      override def next(): InternalRow = {
        val a = arr.getStruct(idx(i), nf)
        val b = arr.getStruct(idx(j), nf)
        val out = new Array[Any](2 * nf)
        var f = 0
        while (f < nf) {
          out(f) = a.get(f, fields(f).dataType)
          out(nf + f) = b.get(f, fields(f).dataType)
          f += 1
        }
        j += 1
        if (j >= k) { i += 1; j = i + 1 }
        new GenericInternalRow(out)
      }
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): OrderedPairs = copy(child = newChild)
}
