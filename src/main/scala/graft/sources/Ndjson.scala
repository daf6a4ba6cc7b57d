package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import java.nio.file.{Files, Paths}

/** NDJSON (one JSON document per line) sources — the reference's input
  * format (etl-job/fhir_import_export.py:210-213: one `<Type>.ndjson` per
  * resource type).
  *
  * Semantics preserved from the reference:
  *  - missing file ⇒ empty-but-schema'd DataFrame, not a failure (the
  *    `/dev/null` fallback at :234-258 — "ensure index exists even with
  *    zero rows");
  *  - schema is supplied externally (the reference's dictionary-driven
  *    schema-on-read, :411-414) — `spark.read.schema(st).json` keeps the
  *    scan schema-pruned and avoids a schema-inference pass over 100 TB;
  *  - corrupt lines land in `_corrupt_record` under the default PERMISSIVE
  *    mode when the caller's schema includes it.
  */
object Ndjson {

  /** Read `dir/<name>.ndjson` with the given schema; empty DataFrame with
    * the same schema when the file is absent. */
  def readOrEmpty(spark: SparkSession, dir: String, name: String,
                  schema: StructType): DataFrame = {
    val path = Paths.get(dir, s"$name.ndjson")
    if (Files.exists(path)) spark.read.schema(schema).json(path.toString)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Schema-inferring read for exploratory/dynamic ingest (small inputs
    * only — inference scans the data twice). */
  def readInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)
}
