package graft.pipeline

import org.apache.spark.sql.types._
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** Dictionary-driven schema registry — the reference's external data
  * dictionary (DICTIONARY_URL fetched at runtime and passed into every
  * load, etl-job/fhir_import_export.py:411-414): the schema is NOT in the
  * code, it ships as a versioned JSON document.
  *
  * Dictionary format (a pragmatic subset of a Gen3-style dictionary):
  * {"Patient": {"id": "string", "birthDate": "date",
  *              "identifier": "array<string>"}, "Observation": {...}}
  * Type strings are Spark DDL, so the full DDL type grammar is available
  * (`array<...>`, `struct<...>`, `map<...>`, decimals).
  *
  * At 100 TB the dictionary is what makes scans schema-pruned: every read
  * passes an explicit StructType, so no inference pass ever touches the
  * data.
  */
object Dictionary {

  /** Parse a dictionary JSON string into per-resource-type schemas. */
  def parse(json: String): Map[String, StructType] = {
    val root = new ObjectMapper().readTree(json)
    root.properties().asScala.map { e =>
      val fields = e.getValue.properties().asScala.map { f =>
        StructField(f.getKey,
          DataType.fromDDL(f.getValue.asText()))
      }.toArray
      e.getKey -> StructType(fields)
    }.toMap
  }

  /** Load from a local file path (the reference fetches by URL into the
    * job container; here the fetch is the caller's concern). */
  def load(path: String): Map[String, StructType] =
    parse(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))

  /** The built-in dictionary matching FIXTURES.md §A.2 — used when no
    * external dictionary is supplied (the reference's bundled default). */
  val default: Map[String, StructType] = Map(
    "Patient" -> Etl.patientSchema,
    "Observation" -> Etl.observationSchema,
    "DocumentReference" -> Etl.docRefSchema,
    "ResearchStudy" -> Etl.studySchema)
}
