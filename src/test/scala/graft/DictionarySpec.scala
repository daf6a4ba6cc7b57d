package graft

import graft.pipeline.{Dictionary, Etl}
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

class DictionarySpec extends SparkSpec {

  private val dictJson =
    """{"Patient": {"id": "string", "gender": "string",
      |             "birthDate": "date", "identifier": "array<string>"},
      | "Observation": {"id": "string", "patient_id": "string",
      |                 "code": "string", "value_numeric": "double",
      |                 "effectiveDateTime": "timestamp"},
      | "DocumentReference": {"id": "string", "patient_id": "string",
      |                       "content_url": "string",
      |                       "content_size": "bigint", "date": "timestamp"},
      | "ResearchStudy": {"id": "string", "status": "string",
      |                   "description": "string",
      |                   "identifier_coding": "array<string>"}}""".stripMargin

  test("parse builds Spark schemas from DDL type strings") {
    val d = Dictionary.parse(dictJson)
    assert(d.keySet === Set("Patient", "Observation", "DocumentReference",
      "ResearchStudy"))
    assert(d("Patient")("birthDate").dataType === DateType)
    assert(d("Patient")("identifier").dataType === ArrayType(StringType))
    assert(d("Observation")("value_numeric").dataType === DoubleType)
  }

  test("an externally-loaded dictionary drives the Etl put path") {
    val dictFile = Files.createTempDirectory("dict").resolve("aced.json")
    Files.writeString(dictFile, dictJson)
    val etl = new Etl(Files.createTempDirectory("etl-dict").toString,
      schemas = Dictionary.load(dictFile.toString))
    val commit = Files.createTempDirectory("dict-commit").toString
    Files.writeString(Paths.get(commit, "Patient.ndjson"),
      """{"id":"p1","gender":"other","birthDate":"2000-01-01","identifier":["a"]}""" + "\n")
    Files.writeString(Paths.get(commit, "ResearchStudy.ndjson"),
      """{"id":"s1","status":"active","description":"d","identifier_coding":[]}""" + "\n")
    etl.put(spark, "aced-dict", commit)
    val p = etl.flatPatient.readProject(spark, "aced-dict").collect()
    assert(p.length === 1)
    assert(p(0).getAs[java.sql.Date]("birthDate").toString === "2000-01-01")
  }

  test("default dictionary matches the built-in schemas") {
    assert(Dictionary.default("Patient") === Etl.patientSchema)
  }

  test("resolve: URL via pluggable fetcher, fallback + log on failure/absence") {
    val logs = scala.collection.mutable.ArrayBuffer[String]()
    // URL path goes through the fetcher
    val fetched = Dictionary.resolve(
      Some("https://example.org/dict.json"), fetch = _ => dictJson, logs)
    assert(fetched("Patient")("birthDate").dataType === DateType)
    assert(logs.isEmpty)
    // failing fetch → bundled default, logged, job survives
    val failed = Dictionary.resolve(
      Some("https://example.org/missing.json"),
      fetch = u => throw new RuntimeException("no egress"), logs)
    assert(failed === Dictionary.default)
    assert(logs.exists(_.contains("dictionary fetch failed")))
    // absent URL → bundled default with the reference's log line
    logs.clear()
    assert(Dictionary.resolve(None, logs = logs) === Dictionary.default)
    assert(logs.exists(_.contains("DICTIONARY_URL not found")))
    // plain local path still works through defaultFetch
    val f = Files.createTempFile("dict", ".json")
    Files.writeString(f, dictJson)
    assert(Dictionary.resolve(Some(f.toString))("Observation")("value_numeric")
      .dataType === DoubleType)
  }
}
