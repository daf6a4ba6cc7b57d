package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{coalesce, col, concat_ws, lit, transform}
import org.apache.spark.sql.types.{ArrayType, StructField, StructType}

/** Recursive schema-walk flattener — the engine's `simplify_directory`
  * (reference: etl-job/fhir_import_export.py:218-222, which flattens nested
  * FHIR resources into a flat "PFB dialect" record: nested structs become
  * scalar columns, codings become string arrays).
  *
  * This is a *plan builder*, not an executor: it walks the DataFrame schema
  * once on the driver and emits a single `select` list of nested-path
  * projections. Catalyst then prunes unused branches of the struct at the
  * parquet/JSON scan — the flatten costs zero shuffles and stays inside
  * whole-stage codegen, which is exactly the posture needed when the input
  * is 100 TB of deeply nested documents.
  *
  * Rules (matching the reference's observable output shape, e.g. the
  * `identifier` / `identifier_coding` pair at fhir_import_export.py:284-285):
  *  - struct field        → recurse; column name = path segments joined by `sep`
  *  - array of scalars    → kept as-is (string arrays survive simplification)
  *  - array of structs    → with `codingsToStrings` (default): each element's
  *    leaf values joined with `#` → array<string>, the PFB coding dialect the
  *    reference's simplified records show (`identifier:
  *    ['synthea_delete#synthea-delete']`, fhir_import_export.py:283-285);
  *    otherwise kept as-is (relations are extracted by the graph builder)
  *  - scalar              → kept
  */
object SchemaFlattener {

  /** Build the flat projection list for a schema. */
  def flatColumns(schema: StructType, sep: String = "_",
                  codingsToStrings: Boolean = true): Seq[Column] = {
    def walk(field: StructField, path: Seq[String]): Seq[Column] = {
      val fullPath = path :+ field.name
      field.dataType match {
        case st: StructType =>
          st.fields.toSeq.flatMap(walk(_, fullPath))
        case ArrayType(st: StructType, _)
            if codingsToStrings && isCodingShaped(st) =>
          // coding dialect: {system, code} → "system#code" per element;
          // one codegen'd pass, still row-preserving. Null fields render
          // as empty segments (coalesce) — concat_ws alone would SKIP
          // them and conflate {null,"x"} with {"x",null}.
          val arr = col(fullPath.map(quote).mkString("."))
          Seq(transform(arr, x =>
            concat_ws("#", st.fields.toSeq
              .map(f => coalesce(x.getField(f.name).cast("string"),
                                 lit(""))): _*))
            .as(fullPath.mkString(sep)))
        case _ =>
          val c = col(fullPath.map(quote).mkString("."))
          Seq(c.as(fullPath.mkString(sep)))
      }
    }
    schema.fields.toSeq.flatMap(walk(_, Nil))
  }

  /** Coding-shaped = every field is a scalar. Arrays of structs with
    * nested structure (e.g. `relations` carrying edge payloads) are NOT
    * codings and pass through untouched — a '#'-join of a nested struct
    * would emit Spark's struct rendering, not leaf values. */
  private def isCodingShaped(st: StructType): Boolean =
    st.fields.forall(_.dataType match {
      case _: StructType | _: ArrayType | _: org.apache.spark.sql.types.MapType => false
      case _ => true
    })

  private def quote(name: String): String = s"`${name.replace("`", "``")}`"

  /** Flatten all nested structs of `df` into top-level columns. */
  def flatten(df: DataFrame, sep: String = "_",
              codingsToStrings: Boolean = true): DataFrame =
    df.select(flatColumns(df.schema, sep, codingsToStrings): _*)

  /** Arrays of structs can't be flattened in place; a caller that wants them
    * row-wise explodes first. Kept separate so the default flatten never
    * multiplies rows (the reference's simplify is row-preserving).
    */
  def hasNestedStructArrays(schema: StructType): Boolean =
    schema.fields.exists {
      case StructField(_, ArrayType(_: StructType, _), _, _) => true
      case StructField(_, st: StructType, _, _) => hasNestedStructArrays(st)
      case _ => false
    }
}
