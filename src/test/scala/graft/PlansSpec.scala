package graft

import graft.plans.SchemaFlattener
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class PlansSpec extends SparkSpec {

  private val nestedSchema = StructType(Seq(
    StructField("id", StringType),
    StructField("object", StructType(Seq(
      StructField("status", StringType),
      StructField("meta", StructType(Seq(
        StructField("version", IntegerType)))),
      StructField("identifier", ArrayType(StringType))))),
    StructField("relations", ArrayType(StructType(Seq(
      StructField("dst_id", StringType)))))))

  private def nestedDf = spark.createDataFrame(
    java.util.List.of(
      Row("a", Row("active", Row(1), Seq("x#y")), Seq(Row("d1"))),
      Row("b", Row("draft", Row(2), Seq.empty[String]), Seq.empty[Row])),
    nestedSchema)

  test("flatten turns nested structs into dotted columns, keeps arrays") {
    val flat = SchemaFlattener.flatten(nestedDf)
    assert(flat.columns.toSeq === Seq(
      "id", "object_status", "object_meta_version", "object_identifier",
      "relations"))
    val rows = flat.orderBy("id").collect()
    assert(rows(0).getString(1) === "active")
    assert(rows(0).getInt(2) === 1)
    assert(rows(0).getSeq[String](3) === Seq("x#y"))
    // array-of-struct → coding-dialect strings (leafs joined by '#')
    assert(rows(0).getSeq[String](4) === Seq("d1"))
  }

  test("coding structs flatten to 'system#code' strings (PFB dialect)") {
    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("identifier_coding", ArrayType(StructType(Seq(
        StructField("system", StringType),
        StructField("code", StringType)))))))
    val df = spark.createDataFrame(
      java.util.List.of(
        Row("a", Seq(Row("https://aced-idp.org/s", "case-1"),
                     Row("official", "x"))),
        Row("b", Seq.empty[Row])),
      schema)
    val flat = SchemaFlattener.flatten(df)
    assert(flat.schema("identifier_coding").dataType ===
           ArrayType(StringType, containsNull = false))
    val rows = flat.orderBy("id").collect()
    assert(rows(0).getSeq[String](1) ===
           Seq("https://aced-idp.org/s#case-1", "official#x"))
    assert(rows(1).getSeq[String](1) === Seq.empty)
    // opt-out keeps the raw struct array for graph extraction
    val raw = SchemaFlattener.flatten(df, codingsToStrings = false)
    assert(raw.schema("identifier_coding").dataType.isInstanceOf[ArrayType])
    assert(raw.schema("identifier_coding").dataType
      .asInstanceOf[ArrayType].elementType.isInstanceOf[StructType])

    // null fields render as empty segments — {null,x} and {x,null} stay
    // distinct (concat_ws alone would conflate them to "x")
    val withNulls = spark.createDataFrame(
      java.util.List.of(Row("a", Seq(Row(null, "x"), Row("x", null)))),
      schema)
    assert(SchemaFlattener.flatten(withNulls).collect()(0)
      .getSeq[String](1) === Seq("#x", "x#"))

    // NON-coding-shaped struct arrays (nested structure) pass through
    val deep = spark.createDataFrame(
      java.util.List.of(Row("a", Seq(Row("d1", Row("x"))))),
      StructType(Seq(
        StructField("id", StringType),
        StructField("relations", ArrayType(StructType(Seq(
          StructField("dst_id", StringType),
          StructField("payload", StructType(Seq(
            StructField("k", StringType)))))))))))
    assert(SchemaFlattener.flatten(deep).schema("relations").dataType
      .asInstanceOf[ArrayType].elementType.isInstanceOf[StructType])
  }

  test("flatten is row-preserving and idempotent on flat schemas") {
    val flat = SchemaFlattener.flatten(nestedDf)
    assert(flat.count() === nestedDf.count())
    val again = SchemaFlattener.flatten(flat)
    assert(again.columns.toSeq === flat.columns.toSeq)
  }

  test("hasNestedStructArrays detects arrays of structs") {
    assert(SchemaFlattener.hasNestedStructArrays(nestedSchema))
    assert(!SchemaFlattener.hasNestedStructArrays(
      StructType(Seq(StructField("a", ArrayType(StringType))))))
  }

  test("flatten quotes field names containing dots") {
    val df = spark.createDataFrame(
      java.util.List.of(Row(Row("v"))),
      StructType(Seq(StructField("outer", StructType(Seq(
        StructField("inner.dotted", StringType)))))))
    val flat = SchemaFlattener.flatten(df)
    assert(flat.columns.toSeq === Seq("outer_inner.dotted"))
    assert(flat.collect()(0).getString(0) === "v")
  }
}
