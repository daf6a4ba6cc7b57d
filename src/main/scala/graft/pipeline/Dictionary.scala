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

  /** Fetch raw dictionary text: http(s) URLs via the JVM URL stack,
    * anything else as a local file path. Pluggable so offline tests (and
    * sandboxes with no egress) can substitute a fake. */
  def defaultFetch(urlOrPath: String): String =
    if (urlOrPath.startsWith("http://") || urlOrPath.startsWith("https://")) {
      // bounded + closed: an unresponsive dictionary server must trip the
      // resolve() fallback, not hang the job; the stream must not leak
      val conn = java.net.URI.create(urlOrPath).toURL
        .openConnection()
      conn.setConnectTimeout(10000)
      conn.setReadTimeout(30000)
      val in = conn.getInputStream
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    } else
      java.nio.file.Files.readString(java.nio.file.Paths.get(urlOrPath))

  /** The reference's runtime dictionary resolution
    * (fhir_import_export.py:411-414): DICTIONARY_URL if set, else the
    * bundled default with a log line; a failing fetch also falls back to
    * the default rather than killing the job. */
  def resolve(urlOrPath: Option[String],
              fetch: String => String = defaultFetch,
              logs: scala.collection.mutable.Buffer[String] =
                scala.collection.mutable.Buffer.empty): Map[String, StructType] =
    urlOrPath match {
      case None =>
        logs += "DICTIONARY_URL not found in environment using bundled default"
        default
      case Some(u) =>
        try parse(fetch(u))
        catch { case e: Exception =>
          logs += s"dictionary fetch failed for $u (${e.getMessage}); using bundled default"
          default
        }
    }

  /** The built-in dictionary matching FIXTURES.md §A.2 — used when no
    * external dictionary is supplied (the reference's bundled default). */
  val default: Map[String, StructType] = Map(
    "Patient" -> Etl.patientSchema,
    "Observation" -> Etl.observationSchema,
    "DocumentReference" -> Etl.docRefSchema,
    "ResearchStudy" -> Etl.studySchema)
}
