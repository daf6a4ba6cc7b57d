package graft.pipeline

import org.apache.spark.sql.SparkSession
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import java.io.{File, FileOutputStream}
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}
import scala.jdk.CollectionConverters._

/** The reference's job entry point re-expressed over [[Etl]]: parse an
  * INPUT_DATA envelope, dispatch on `method` ∈ {put, get, delete}
  * (etl-job/fhir_import_export.py:393-436), run the verb, and return the
  * result object that the reference prints as the last `[out]` stdout
  * line (:401-403,435-436). A user of the reference can hand this the
  * same envelope they submit to sower today.
  *
  * Envelope (FIXTURES.md §A.3):
  * {"method":"put","project_id":"<program>-<project>",
  *  "push":{"commits":[{"commit_id":"c1","meta_path":"/dir/with/ndjson"}]}}
  */
final class JobRunner(etl: Etl, clock: () => String =
    () => java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd-HHmmss")
      .format(java.time.LocalDateTime.now(java.time.ZoneOffset.UTC))) {

  private val mapper = new ObjectMapper()

  /** Run one job; returns the `[out]` result map. `authz` is the caller's
    * resource->grants profile (reference fetches it from arborist,
    * :44-46). */
  def run(spark: SparkSession, inputData: String,
          authz: Authz.UserAuthz, exportDir: String): Map[String, Any] = {
    val env: JsonNode = mapper.readTree(inputData)
    val method = env.path("method").asText()
    val projectId = env.path("project_id").asText()
    val (program, project) = Authz.splitProjectId(projectId)
    val logs = scala.collection.mutable.ArrayBuffer[String]()

    method match {
      case "put" =>
        require(Authz.canCreate(authz, program, project),
          s"no create access on $projectId")
        val commits = env.path("push").path("commits").elements().asScala.toSeq
        val files = commits.flatMap { c =>
          val dir = c.path("meta_path").asText()
          etl.put(spark, projectId, dir)
          logs += s"loaded commit ${c.path("commit_id").asText()} from $dir"
          new File(dir).listFiles().map(_.getName).sorted.toSeq
        }
        // reference auto-snapshots after put (:421-423)
        val snap = snapshot(spark, projectId, program, project, authz, exportDir)
        Map("files" -> files, "snapshot" -> snap, "logs" -> logs.toSeq)
      case "get" =>
        Map("snapshot" ->
          snapshot(spark, projectId, program, project, authz, exportDir),
          "logs" -> logs.toSeq)
      case "delete" =>
        require(Authz.canCreate(authz, program, project),
          s"no create access on $projectId")
        etl.delete(spark, projectId)
        Map("logs" -> (logs += s"emptied $projectId").toSeq)
      case other =>
        // reference raises on unknown methods (:433)
        throw new IllegalArgumentException(s"unknown method $other")
    }
  }

  /** Export + zip: `{project_id}_{ts}_SNAPSHOT.zip` (:340-355). */
  private def snapshot(spark: SparkSession, projectId: String,
                       program: String, project: String,
                       authz: Authz.UserAuthz, exportDir: String): String = {
    require(Authz.canRead(authz, program, project),
      s"no read-storage access on $projectId")
    val stage = Files.createTempDirectory("export").toString
    etl.get(spark, projectId, stage)
    val zipName = s"${projectId}_${clock()}_SNAPSHOT.zip"
    val zipPath = Paths.get(exportDir, zipName)
    Files.createDirectories(zipPath.getParent)
    val zout = new ZipOutputStream(new FileOutputStream(zipPath.toFile))
    try {
      Files.walk(Paths.get(stage)).iterator().asScala
        .filter(p => Files.isRegularFile(p) &&
                     !p.getFileName.toString.startsWith("_") &&
                     !p.getFileName.toString.endsWith(".crc"))
        .toSeq.sortBy(_.toString)
        .foreach { p =>
          zout.putNextEntry(new ZipEntry(
            Paths.get(stage).relativize(p).toString))
          zout.write(Files.readAllBytes(p))
          zout.closeEntry()
        }
    } finally zout.close()
    zipPath.toString
  }
}
