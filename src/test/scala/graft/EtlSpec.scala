package graft

import graft.pipeline.Etl
import graft.sources.ZipNdjson
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

/** End-to-end reference lifecycle: put (import) → get (export) → delete,
  * including the missing-resource-file fallback and re-import idempotence
  * (SURVEY.md §3, §5 item 2), plus the distributed zip-NDJSON source.
  */
class EtlSpec extends SparkSpec {

  private val patientLines =
    """{"id":"p1","gender":"female","birthDate":"1980-02-03","identifier":["a#1"]}
      |{"id":"p2","gender":"male","birthDate":"1990-05-06","identifier":[]}
      |""".stripMargin
  private val obsLines =
    """{"id":"o1","patient_id":"p1","code":"hr","value_numeric":61.0,"effectiveDateTime":"2024-01-01T10:00:00Z"}
      |{"id":"o2","patient_id":"p1","code":"hr","value_numeric":63.0,"effectiveDateTime":"2024-01-01T11:00:00Z"}
      |""".stripMargin
  private val studyLines =
    """{"id":"s1","status":"active","description":"demo study","identifier_coding":["x#y"]}
      |""".stripMargin

  private def commitDir(): String = {
    val dir = Files.createTempDirectory("commit").toString
    Files.writeString(Paths.get(dir, "Patient.ndjson"), patientLines)
    Files.writeString(Paths.get(dir, "Observation.ndjson"), obsLines)
    Files.writeString(Paths.get(dir, "ResearchStudy.ndjson"), studyLines)
    // DocumentReference.ndjson deliberately absent -> /dev/null path
    dir
  }

  test("put -> flat/graph/discovery stores; missing resource type loads empty") {
    val etl = new Etl(Files.createTempDirectory("etl").toString)
    etl.put(spark, "aced-demo", commitDir())

    val fp = etl.flatPatient.readProject(spark, "aced-demo")
    assert(fp.count() === 2)
    val p1 = fp.filter("id = 'p1'").collect()(0)
    assert(p1.getAs[Long]("observation_count") === 2L)
    assert(p1.getAs[Long]("file_count") === 0L) // absent DocumentReference

    assert(etl.flatFile.readProject(spark, "aced-demo").count() === 0)
    assert(etl.edges.readProject(spark, "aced-demo").count() === 2)
    assert(etl.vertices.readProject(spark, "aced-demo").count() === 5)

    val disc = etl.discovery.readProject(spark, "aced-demo").collect()(0)
    assert(disc.getAs[Long]("patient_count") === 2L)
    assert(disc.getAs[String]("description") === "demo study")
  }

  test("put is idempotent; get exports NDJSON; delete empties every store") {
    val etl = new Etl(Files.createTempDirectory("etl2").toString)
    val dir = commitDir()
    etl.put(spark, "aced-demo", dir)
    etl.put(spark, "aced-demo", dir) // re-import same commit
    assert(etl.flatPatient.readProject(spark, "aced-demo").count() === 2)

    val out = Files.createTempDirectory("export").toString
    val types = etl.get(spark, "aced-demo", out)
    assert(types === Seq("Observation", "Patient", "ResearchStudy"))
    val exported = spark.read.json(s"$out/Patient.ndjson")
    assert(exported.count() === 2)
    assert(exported.columns.contains("gender"))

    etl.delete(spark, "aced-demo")
    assert(etl.flatPatient.read(spark).count() === 0)
    assert(etl.fhirRaw.read(spark).count() === 0)
    etl.delete(spark, "aced-demo") // idempotent
  }

  test("typed Dataset[FlatPatient] view + partition pruning on readProject") {
    val etl = new graft.pipeline.Etl(Files.createTempDirectory("etl3").toString)
    etl.put(spark, "aced-demo", commitDir())
    etl.put(spark, "aced-other", commitDir())
    val ds = etl.patients(spark, "aced-demo")
    // typed ops through the encoder
    val spark2 = spark
    import spark2.implicits._
    val names = ds.filter(_.observation_count > 0).map(_.id).collect().sorted
    assert(names.toSeq === Seq("p1"))
    // per-project read prunes partitions at the scan, not post-filter
    val plan = etl.flatPatient.readProject(spark, "aced-demo")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") &&
           plan.contains("project_id#") && plan.contains("aced-demo"),
      s"expected partition prune in:\n${plan.take(800)}")
  }

  test("export -> re-import round-trip preserves the project (durability)") {
    val etl1 = new Etl(Files.createTempDirectory("etl-rt1").toString)
    etl1.put(spark, "aced-demo", commitDir())
    val out = Files.createTempDirectory("rt-export").toString
    etl1.get(spark, "aced-demo", out)
    // the exported dir has <Type>.ndjson entries (as directories of JSON
    // lines) — re-importable as a commit dir
    val etl2 = new Etl(Files.createTempDirectory("etl-rt2").toString)
    etl2.put(spark, "aced-demo", out)
    assert(etl2.flatPatient.readProject(spark, "aced-demo").count() ===
           etl1.flatPatient.readProject(spark, "aced-demo").count())
    assert(etl2.flatObservation.readProject(spark, "aced-demo").count() ===
           etl1.flatObservation.readProject(spark, "aced-demo").count())
    val ids1 = etl1.flatPatient.readProject(spark, "aced-demo")
      .select("id").collect().map(_.getString(0)).sorted.toSeq
    val ids2 = etl2.flatPatient.readProject(spark, "aced-demo")
      .select("id").collect().map(_.getString(0)).sorted.toSeq
    assert(ids1 === ids2)
  }

  test("re-import wipes stale partitions; limit caps flat loads; " +
       "discovery is deterministic with >1 study") {
    val etl = new Etl(Files.createTempDirectory("etl-wipe").toString)
    etl.put(spark, "aced-demo", commitDir()) // has 2 observations
    assert(etl.flatObservation.readProject(spark, "aced-demo").count() === 2)

    // second import has NO Observation file → stale obs rows must go
    val d2 = Files.createTempDirectory("commit2").toString
    Files.writeString(Paths.get(d2, "Patient.ndjson"),
      """{"id":"p3","gender":"male","birthDate":"1970-01-01","identifier":[]}""" + "\n")
    // two studies, written s2-first: orderBy must still pick s1
    Files.writeString(Paths.get(d2, "ResearchStudy.ndjson"),
      """{"id":"s2","status":"active","description":"zzz","identifier_coding":[]}
        |{"id":"s1","status":"active","description":"first","identifier_coding":[]}
        |""".stripMargin)
    etl.put(spark, "aced-demo", d2)
    assert(etl.flatObservation.readProject(spark, "aced-demo").count() === 0)
    assert(etl.flatPatient.readProject(spark, "aced-demo")
      .select("id").collect().map(_.getString(0)).toSeq === Seq("p3"))
    val disc = etl.discovery.readProject(spark, "aced-demo").collect()(0)
    assert(disc.getAs[String]("description") === "first")

    // load_flat(limit=...) parity: flat stores capped, raw store is not
    val d3 = commitDir() // 2 patients, 2 observations
    etl.put(spark, "aced-demo", Seq(d3), limit = Some(1))
    assert(etl.flatPatient.readProject(spark, "aced-demo").count() === 1)
    assert(etl.flatObservation.readProject(spark, "aced-demo").count() === 1)
  }

  test("zip-of-ndjson source decompresses in executors") {
    val zdir = Files.createTempDirectory("zips")
    val zip = zdir.resolve("commit1.zip")
    val zout = new ZipOutputStream(Files.newOutputStream(zip))
    zout.putNextEntry(new ZipEntry("Patient.ndjson"))
    zout.write(patientLines.getBytes("UTF-8"))
    zout.closeEntry()
    zout.putNextEntry(new ZipEntry("README.txt")) // non-ndjson: skipped
    zout.write("ignore me".getBytes("UTF-8"))
    zout.closeEntry()
    zout.close()

    val df = ZipNdjson.read(spark, zdir.toString + "/*.zip", Etl.patientSchema)
    assert(df.count() === 2)
    assert(df.filter("id = 'p1'").select("gender").collect()(0)
      .getString(0) === "female")
  }
}
