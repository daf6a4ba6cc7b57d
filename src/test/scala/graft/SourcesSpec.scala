package graft

import graft.sources.Ndjson
import org.apache.spark.sql.types._
import java.nio.file.Files

class SourcesSpec extends SparkSpec {

  private val patientSchema = StructType(Seq(
    StructField("project_id", StringType),
    StructField("id", StringType),
    StructField("gender", StringType)))

  test("readOrEmpty reads an ndjson file with the supplied schema") {
    val dir = Files.createTempDirectory("ndjson").toString
    Files.writeString(java.nio.file.Paths.get(dir, "Patient.ndjson"),
      """{"project_id":"aced-test","id":"p1","gender":"female"}
        |{"project_id":"aced-test","id":"p2","gender":"male"}
        |""".stripMargin)
    val df = Ndjson.readOrEmpty(spark, dir, "Patient", patientSchema)
    assert(df.schema === patientSchema)
    assert(df.count() === 2)
    assert(df.filter("id = 'p1'").select("gender").collect()(0).getString(0)
      === "female")
  }

  test("corrupt NDJSON lines land in _corrupt_record, good lines survive") {
    val dir = Files.createTempDirectory("ndjson-corrupt").toString
    Files.writeString(java.nio.file.Paths.get(dir, "Patient.ndjson"),
      """{"project_id":"p","id":"ok1","gender":"female"}
        |{not valid json at all
        |{"project_id":"p","id":"ok2","gender":"male"}
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType(
      patientSchema.fields :+ org.apache.spark.sql.types.StructField(
        "_corrupt_record", org.apache.spark.sql.types.StringType))
    val df = Ndjson.readOrEmpty(spark, dir, "Patient", schema).cache()
    assert(df.filter("_corrupt_record IS NULL").count() === 2)
    val bad = df.filter("_corrupt_record IS NOT NULL").collect()
    assert(bad.length === 1 && bad(0).getAs[String]("_corrupt_record")
      .startsWith("{not valid"))
    df.unpersist()
  }

  test("input_file_name provides the commit-file manifest") {
    // the reference globs the unzipped commit dir into output['files']
    // (fhir_import_export.py:463-465); in-plan the file list comes free
    // from the scan
    val dir = Files.createTempDirectory("manifest").toString
    Files.writeString(java.nio.file.Paths.get(dir, "Patient.ndjson"),
      """{"project_id":"p","id":"x","gender":"other"}""" + "\n")
    val df = Ndjson.readOrEmpty(spark, dir, "Patient", patientSchema)
      .withColumn("_source_file", org.apache.spark.sql.functions.input_file_name())
    val files = df.select("_source_file").distinct().collect().map(_.getString(0))
    assert(files.length === 1 && files(0).endsWith("Patient.ndjson"))
  }

  test("missing file yields empty-but-schema'd frame (/dev/null semantics)") {
    val dir = Files.createTempDirectory("ndjson-empty").toString
    val df = Ndjson.readOrEmpty(spark, dir, "Observation", patientSchema)
    assert(df.schema === patientSchema)
    assert(df.count() === 0)
  }
}
