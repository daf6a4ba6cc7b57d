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

  test("tar shards: round-trip against the system tar(1) binary") {
    import graft.sources.TarShards
    import scala.sys.process._
    val dir = Files.createTempDirectory("wds").toString
    val payloadDir = Files.createDirectory(
      java.nio.file.Paths.get(dir, "samples"))
    // WebDataset layout: sample key 000000 with two members, 000001 with
    // one; contents include a >512-byte member to cross a block boundary
    // and a size not a multiple of 512 to exercise padding
    val big = ("x" * 700) + "END"
    val files = Seq(
      "000000.txt" -> "hello tar world",
      "000000.cls" -> "7",
      "000001.txt" -> big)
    files.foreach { case (n, c) =>
      Files.writeString(payloadDir.resolve(n), c)
    }
    // the INDEPENDENT writer: GNU tar in strict ustar format
    val rc = Process(Seq("tar", "--format=ustar", "-cf",
      s"$dir/shard-000.tar", "-C", payloadDir.toString) ++ files.map(_._1)).!
    assert(rc == 0, "tar(1) failed")
    val got = TarShards.read(spark, s"$dir/*.tar")
      .collect().map(r => (r.getAs[String]("sample_key"),
        r.getAs[String]("ext"),
        new String(r.getAs[Array[Byte]]("content"), "UTF-8"),
        r.getAs[Long]("size"), r.getAs[String]("shard")))
    assert(got.length == 3)
    assert(got.forall(_._5 == "shard-000.tar"))
    val byKey = got.map(g => (g._1, g._2) -> g._3).toMap
    assert(byKey(("000000", "txt")) == "hello tar world")
    assert(byKey(("000000", "cls")) == "7")
    assert(byKey(("000001", "txt")) == big)
    assert(got.find(_._1 == "000001").get._4 == big.length.toLong)
    // grouping downstream works like a table: one row per sample key
    val grouped = TarShards.read(spark, s"$dir/*.tar")
      .groupBy("sample_key")
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(grouped == Map("000000" -> 2L, "000001" -> 1L))
  }

  test("tar shards: a torn header fails the read loudly") {
    import graft.sources.TarShards
    import scala.sys.process._
    val dir = Files.createTempDirectory("wds-torn").toString
    Files.writeString(java.nio.file.Paths.get(dir, "a.txt"), "payload")
    val tarPath = s"$dir/shard.tar"
    assert(Process(Seq("tar", "--format=ustar", "-cf", tarPath,
      "-C", dir, "a.txt")).! == 0)
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(tarPath))
    bytes(0) = (bytes(0) ^ 0x7).toByte // corrupt the name; checksum stale
    Files.write(java.nio.file.Paths.get(tarPath), bytes)
    val e = intercept[Exception] {
      TarShards.read(spark, s"$dir/*.tar").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        String.valueOf(x.getMessage) +: messages(x.getCause))
    assert(messages(e).exists(_.contains("checksum mismatch")),
      s"expected a checksum failure, got: ${e.getMessage}")
  }

  test("gzip ndjson: concatenated members are read past the first " +
       "boundary") {
    import java.util.zip.GZIPOutputStream
    val dir = Files.createTempDirectory("gznd")
    def member(lines: Seq[String]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new GZIPOutputStream(bos)
      g.write(lines.map(_ + "\n").mkString.getBytes("UTF-8"))
      g.close(); bos.toByteArray
    }
    // two INDEPENDENT gzip members concatenated into one file — the
    // corpus-shard append pattern; a single-member reader would silently
    // return only rows 1-2
    val m1 = member(Seq("""{"project_id":"p-a","id":"1","gender":"f"}""",
                        """{"project_id":"p-a","id":"2","gender":"m"}"""))
    val m2 = member(Seq("""{"project_id":"p-b","id":"3","gender":"f"}"""))
    Files.write(dir.resolve("shard-000.jsonl.gz"), m1 ++ m2)
    // a second file proves the per-file task fan-out composes with the
    // multi-member handling
    Files.write(dir.resolve("shard-001.jsonl.gz"),
      member(Seq("""{"project_id":"p-c","id":"4","gender":"m"}""")))
    val df = graft.sources.GzipNdjson.read(
      spark, dir.toString + "/*.jsonl.gz", patientSchema)
    val rows = df.orderBy("id").collect()
    assert(rows.length === 4,
      s"multi-member gz truncated: ${rows.mkString(", ")}")
    assert(rows.map(_.getString(1)).toSeq === Seq("1", "2", "3", "4"))
    assert(rows(2).getString(0) === "p-b",
      "row from the SECOND member must survive")
  }

  test("csv quarantine: malformed rows land in the side lane, raw intact") {
    val dir = Files.createTempDirectory("csvq")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("qty", IntegerType)))
    Files.write(dir.resolve("part-0.csv"),
      ("id,name,qty\n" +
       "1,alpha,10\n" +
       "2,beta\n" +              // wrong column count
       "3,gamma,not_a_number\n" + // type mismatch
       "4,delta,40\n").getBytes)
    val (good, quarantined) = graft.sources.CsvQuarantine.readSplit(
      spark, dir.toString + "/*.csv", schema)
    val g = good.orderBy("id").collect()
    assert(g.map(_.getLong(0)).toSeq === Seq(1L, 4L),
      s"good lane wrong: ${g.mkString(", ")}")
    val q = quarantined.orderBy("raw_line").collect()
    assert(q.length === 2, s"quarantine lane wrong: ${q.mkString(", ")}")
    // the raw bytes survive verbatim — the replay contract
    assert(q.map(_.getString(0)).toSet ===
      Set("2,beta", "3,gamma,not_a_number"))
    assert(q.forall(_.getString(1).contains("part-0.csv")),
      "provenance file missing")
    val reasons = q.map(r => r.getString(0).take(1) -> r.getString(2)).toMap
    assert(reasons("2").startsWith("column_count:"),
      s"short row should carry the column-count reason: $reasons")
    assert(reasons("3") === "type_mismatch", reasons.toString)
  }

  test("evolving parquet: generations widen and null-fill, narrowing throws") {
    val spark2 = spark
    import spark2.implicits._
    val dir = Files.createTempDirectory("evolve")
    // gen1: (id INT, name STRING); gen2 widened id + added score
    Seq((1, "a"), (2, "b")).toDF("id", "name")
      .write.parquet(dir.resolve("gen1").toString)
    Seq((3L, "c", 0.5), (4L, "d", 0.9)).toDF("id", "name", "score")
      .write.parquet(dir.resolve("gen2").toString)
    // the case mergeSchema hard-fails on:
    val merged = intercept[Exception] {
      spark.read.option("mergeSchema", "true")
        .parquet(dir.resolve("gen1").toString, dir.resolve("gen2").toString)
        .collect()
    }
    assert(merged.getMessage != null)
    val target = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val df = graft.sources.EvolvingParquet.read(spark,
      Seq(dir.resolve("gen1").toString, dir.resolve("gen2").toString),
      target)
    assert(df.schema === target)
    val rows = df.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(rows.take(2).forall(_.isNullAt(2)),
      "gen1 rows must null-fill the added column")
    assert(rows(2).getDouble(2) === 0.5)
    // narrowing (long gen2 id -> int target) is a loud failure
    val narrow = StructType(Seq(StructField("id", IntegerType)))
    val e = intercept[IllegalArgumentException] {
      graft.sources.EvolvingParquet.read(spark,
        Seq(dir.resolve("gen2").toString), narrow)
    }
    assert(e.getMessage.contains("narrowing"), e.getMessage)
  }
}
