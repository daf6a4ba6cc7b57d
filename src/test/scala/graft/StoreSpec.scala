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

  test("schema evolution: new column readable everywhere, old rows null") {
    import spark.implicits._
    val root = Files.createTempDirectory("store-evolve").toString
    val store = new Store(root)
    store.put(sampleDf) // v1 schema: (project_id, resource_type, id)
    // a later import ships an extra column; the dynamic overwrite only
    // touches its own partition, and the schema sidecar advances to v2
    // (newest-schema-wins), so v1 partitions read as NULL for the new
    // column instead of failing or being invisible
    val v2 = Seq(("aced-c", "Patient", "p9", "high"))
      .toDF("project_id", "resource_type", "id", "priority")
    store.put(v2)
    val all = store.read(spark)
    assert(all.columns.contains("priority"))
    assert(all.count() === 4)
    val old = all.filter(col("project_id") === "aced-a")
    assert(old.count() === 2)
    assert(old.filter(col("priority").isNull).count() === 2,
      "pre-evolution rows must surface the new column as NULL")
    val neu = all.filter(col("project_id") === "aced-c").collect()
    assert(neu.length === 1 && neu(0).getAs[String]("priority") === "high")
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

  test("clustered compaction: row-group min/max ranges become disjoint") {
    import scala.jdk.CollectionConverters._
    val spark2 = spark
    import spark2.implicits._
    val root = Files.createTempDirectory("store-cluster").toString
    val store = new Store(root)
    // shuffled value column: every row group of the raw write overlaps
    val rnd = new scala.util.Random(11)
    val rows = rnd.shuffle((1 to 60000).toList)
      .map(v => ("aced-a", v.toLong, "x" * 40))
    store.put(rows.toDF("project_id", "v", "pad"),
      Map("parquet.block.size" -> "262144")) // small groups for the test

    def rowGroupRanges(): Seq[(Long, Long)] = {
      val conf = spark.sparkContext.hadoopConfiguration
      val dir = new java.io.File(s"$root/project_id=aced-a")
      dir.listFiles().filter(_.getName.endsWith(".parquet")).toSeq
        .sortBy(_.getName).flatMap { f =>
          val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
              new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
          try rdr.getFooter.getBlocks.asScala.toSeq.map { g =>
            val c = g.getColumns.asScala
              .find(_.getPath.toDotString == "v").get.getStatistics
            (c.genericGetMin.asInstanceOf[java.lang.Long].longValue,
             c.genericGetMax.asInstanceOf[java.lang.Long].longValue)
          } finally rdr.close()
        }
    }
    def overlapping(rs: Seq[(Long, Long)]): Boolean = {
      val sorted = rs.sortBy(_._1)
      sorted.zip(sorted.tail).exists { case ((_, hi), (lo2, _)) => lo2 <= hi }
    }
    val raw = rowGroupRanges()
    assert(raw.length > 2, s"need several row groups, got ${raw.length}")
    assert(overlapping(raw), "shuffled write should have overlapping ranges")

    // clustered rewrite: same rows, but every row group's [min,max] is
    // narrow and disjoint — a range filter can skip all but one group
    store.compactProject(spark, "aced-a", nFiles = 1, clusterBy = Seq("v"),
      writerOptions = Map("parquet.block.size" -> "262144"))
    val clustered = rowGroupRanges()
    assert(clustered.length > 2)
    assert(!overlapping(clustered),
      s"clustered row groups must be disjoint: $clustered")
    assert(store.readProject(spark, "aced-a").count() === 60000)

    // multi-file clustering: range partitioning keeps ranges disjoint
    // ACROSS files too (a coalesce would give every file the full range)
    store.compactProject(spark, "aced-a", nFiles = 3, clusterBy = Seq("v"),
      writerOptions = Map("parquet.block.size" -> "262144"))
    val multi = rowGroupRanges()
    assert(new java.io.File(s"$root/project_id=aced-a")
      .listFiles().count(_.getName.endsWith(".parquet")) === 3)
    assert(!overlapping(multi),
      s"multi-file clustered row groups must be disjoint: $multi")
    assert(store.readProject(spark, "aced-a").count() === 60000)
  }

  test("upsertProject replaces matched keys, inserts new, leaves others alone") {
    val spark2 = spark
    import spark2.implicits._
    val root = Files.createTempDirectory("store-upsert").toString
    val store = new Store(root)
    store.put(Seq(
      ("aced-a", "k1", 1L), ("aced-a", "k2", 2L), ("aced-a", "k3", 3L),
      ("aced-b", "k1", 99L)).toDF("project_id", "id", "v"))
    // k2 updated, k4 inserted; k1/k3 untouched; project b untouched
    store.upsertProject(spark, "aced-a",
      Seq(("aced-a", "k2", 20L), ("aced-a", "k4", 4L))
        .toDF("project_id", "id", "v"), key = "id")
    val a = store.readProject(spark, "aced-a")
      .collect().map(r => r.getAs[String]("id") -> r.getAs[Long]("v")).toMap
    assert(a === Map("k1" -> 1L, "k2" -> 20L, "k3" -> 3L, "k4" -> 4L))
    assert(store.readProject(spark, "aced-b").count() === 1)
    // no staging residue
    assert(!new java.io.File(root + "_upsert_staging").exists())
    // idempotent re-apply
    store.upsertProject(spark, "aced-a",
      Seq(("aced-a", "k2", 20L)).toDF("project_id", "id", "v"), key = "id")
    assert(store.readProject(spark, "aced-a").count() === 4)

    // stray partition values in the updates are rejected BEFORE any write
    // (a mis-partitioned row would otherwise delete its key and vanish)
    intercept[IllegalArgumentException] {
      store.upsertProject(spark, "aced-a",
        Seq(("aced-b", "k1", 0L)).toDF("project_id", "id", "v"), key = "id")
    }
    assert(store.readProject(spark, "aced-a").count() === 4)
    assert(store.readProject(spark, "aced-b").count() === 1)
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
