package graft

import graft.pipeline.Store
import java.nio.file.Files

class StoreSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def sampleDf = {
    import spark.implicits._
    Seq(
      ("aced-a", "Patient", "p1"),
      ("aced-a", "Patient", "p2"),
      ("aced-b", "Patient", "p3")
    ).toDF("project_id", "resource_type", "id")
  }

  test("put/readProject round-trips one project's partition") {
    val root = Files.createTempDirectory("store").toString
    val store = new Store(root)
    store.put(sampleDf)
    val a = store.readProject(spark, "aced-a")
    assert(a.count() === 2)
    assert(a.select("project_id").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("aced-a"))
  }

  test("put is idempotent per partition (reference reload semantics)") {
    val root = Files.createTempDirectory("store-idem").toString
    val store = new Store(root)
    store.put(sampleDf)
    store.put(sampleDf) // reload same commit — must not duplicate
    assert(store.read(spark).count() === 3)
  }

  test("dynamic partition overwrite only touches written partitions") {
    val root = Files.createTempDirectory("store-dyn").toString
    val store = new Store(root)
    store.put(sampleDf)
    import spark.implicits._
    // new commit for project a only, with different rows
    store.put(Seq(("aced-a", "Patient", "p9")).toDF(
      "project_id", "resource_type", "id"))
    val all = store.read(spark)
    assert(all.filter(col("project_id") === "aced-a").count() === 1)
    assert(all.filter(col("project_id") === "aced-b").count() === 1)
  }

  test("compactProject rewrites one partition to fewer files, same rows") {
    val root = Files.createTempDirectory("store-compact").toString
    val store = new Store(root)
    // many-file partition: repartition before put
    import spark.implicits._
    store.put((1 to 100).map(i => ("aced-a", "Patient", s"p$i"))
      .toDF("project_id", "resource_type", "id").repartition(8))
    def files(p: String) = new java.io.File(s"$root/project_id=$p")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(files("aced-a") > 1)
    store.compactProject(spark, "aced-a")
    assert(files("aced-a") === 1)
    assert(store.readProject(spark, "aced-a").count() === 100)
  }

  test("deleteProject drops exactly one project (empty_project semantics)") {
    val root = Files.createTempDirectory("store-del").toString
    val store = new Store(root)
    store.put(sampleDf)
    store.deleteProject(spark, "aced-a")
    val rest = store.read(spark)
    assert(rest.count() === 1)
    assert(rest.select("project_id").collect()(0).getString(0) === "aced-b")
    // delete twice — idempotent
    store.deleteProject(spark, "aced-a")
    assert(store.read(spark).count() === 1)
  }
}
