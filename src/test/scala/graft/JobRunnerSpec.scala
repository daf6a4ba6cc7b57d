package graft

import graft.pipeline.{Authz, Etl, JobRunner}
import graft.pipeline.Authz.Grant
import java.nio.file.{Files, Paths}

class JobRunnerSpec extends SparkSpec {

  private val adminAuthz: Authz.UserAuthz = Map(
    "/programs/aced" -> Seq(Grant("create", "*")),
    "/programs/aced/projects/demo" -> Seq(Grant("read-storage", "*")))

  private def commitDir(): String = {
    val dir = Files.createTempDirectory("jr-commit").toString
    Files.writeString(Paths.get(dir, "Patient.ndjson"),
      """{"id":"p1","gender":"female","birthDate":"1980-02-03","identifier":[]}""" + "\n")
    Files.writeString(Paths.get(dir, "ResearchStudy.ndjson"),
      """{"id":"s1","status":"active","description":"d","identifier_coding":[]}""" + "\n")
    dir
  }

  test("put envelope loads commits, auto-snapshots, reports files") {
    val etl = new Etl(Files.createTempDirectory("jr").toString)
    val runner = new JobRunner(etl, clock = () => "20260101-000000")
    val exp = Files.createTempDirectory("jr-exp").toString
    val out = runner.run(spark,
      s"""{"method":"put","project_id":"aced-demo",
         |"push":{"commits":[{"commit_id":"c1","meta_path":"${commitDir()}"}]}}"""
        .stripMargin,
      adminAuthz, exp)
    assert(out("files").asInstanceOf[Seq[String]]
      === Seq("Patient.ndjson", "ResearchStudy.ndjson"))
    val snap = out("snapshot").asInstanceOf[String]
    assert(snap.endsWith("aced-demo_20260101-000000_SNAPSHOT.zip"))
    assert(Files.size(Paths.get(snap)) > 0)
    assert(etl.flatPatient.readProject(spark, "aced-demo").count() === 1)
  }

  test("delete empties the project; unknown method raises; authz enforced") {
    val etl = new Etl(Files.createTempDirectory("jr2").toString)
    val runner = new JobRunner(etl, clock = () => "20260101-000000")
    val exp = Files.createTempDirectory("jr2-exp").toString
    runner.run(spark,
      s"""{"method":"put","project_id":"aced-demo",
         |"push":{"commits":[{"commit_id":"c1","meta_path":"${commitDir()}"}]}}"""
        .stripMargin, adminAuthz, exp)
    runner.run(spark,
      """{"method":"delete","project_id":"aced-demo"}""", adminAuthz, exp)
    assert(etl.flatPatient.read(spark).count() === 0)

    intercept[IllegalArgumentException] {
      runner.run(spark,
        """{"method":"frobnicate","project_id":"aced-demo"}""", adminAuthz, exp)
    }
    intercept[IllegalArgumentException] {
      runner.run(spark,
        """{"method":"delete","project_id":"aced-demo"}""",
        Map.empty: Authz.UserAuthz, exp)
    }
  }

  test("authz predicate semantics match the reference rules") {
    val a: Authz.UserAuthz = Map(
      "/programs/p1/projects/x" -> Seq(Grant("create", "svc")),
      "/programs/p2" -> Seq(Grant("*", "*")))
    assert(Authz.canCreate(a, "p1", "x"))
    assert(!Authz.canCreate(a, "p1", "y"))
    assert(Authz.canCreate(a, "p2", "anything")) // program-level wildcard
    assert(!Authz.canRead(a, "p1", "x")) // create != read-storage
    assert(Authz.canRead(a, "p2", "anything")) // method wildcard
    assert(Authz.splitProjectId("aced-my-proj") === ("aced", "my-proj"))
    intercept[IllegalArgumentException](Authz.splitProjectId("noseparator"))
  }
}
