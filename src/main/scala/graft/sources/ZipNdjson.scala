package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types.StructType
import java.io.{BufferedReader, ByteArrayInputStream, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.util.zip.ZipInputStream

/** Distributed zip-of-NDJSON ingest — the engine's replacement for the
  * reference's download-and-`unzip` subprocess
  * (etl-job/fhir_import_export.py:148-180: fetch commit zip, `unzip -o -j`,
  * then read the extracted `<Type>.ndjson` files).
  *
  * Instead of a driver-side subprocess, zips are read through Spark's
  * `binaryFile` source and decompressed inside executors — one task per
  * zip, so a 1000-commit import decompresses 1000-way parallel with no
  * shared staging directory. Commit zips are small (per-study NDJSON), so
  * a whole zip per task is the right granularity; huge single archives
  * would instead be split upstream.
  */
object ZipNdjson {

  /** Read every `*.ndjson` entry (optionally restricted to one entry name)
    * across all zips matching `glob`, as NDJSON lines parsed with the
    * supplied schema. */
  def read(spark: SparkSession, glob: String, schema: StructType,
           entryFilter: String => Boolean = _.endsWith(".ndjson")): DataFrame = {
    val lines = linesOf(spark, glob, entryFilter)
    spark.read.schema(schema).json(lines)
  }

  /** The raw decompressed lines (one row per NDJSON line). */
  def linesOf(spark: SparkSession, glob: String,
              entryFilter: String => Boolean): Dataset[String] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(glob)
      .select("content").as[Array[Byte]]
      .flatMap { bytes =>
        val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
        Iterator.continually(zin.getNextEntry)
          .takeWhile(_ != null)
          .filter(e => !e.isDirectory && entryFilter(e.getName))
          .flatMap { _ =>
            val r = new BufferedReader(
              new InputStreamReader(zin, StandardCharsets.UTF_8))
            Iterator.continually(r.readLine()).takeWhile(_ != null)
              .filter(_.nonEmpty).toList
          }.toList
      }
  }
}
