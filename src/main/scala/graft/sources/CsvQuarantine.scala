package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** CSV ingest with a QUARANTINE lane — the robustness contract every
  * production loader needs and naive `spark.read.csv` silently lacks: a
  * malformed row (wrong column count, unparseable type) must neither
  * kill the job (FAILFAST) nor vanish (DROPMALFORMED) nor propagate as
  * a row of nulls (bare PERMISSIVE); it must land in a side table with
  * its raw bytes and provenance so the producer can be debugged and the
  * rows replayed after the fix.
  *
  * Built entirely on Spark's own CSV reader: PERMISSIVE mode with
  * `columnNameOfCorruptRecord` keeps the raw text of every row the
  * parser rejects, and the split is two filters over one scan. The one
  * subtlety is Spark's documented restriction that a query may not
  * reference ONLY the corrupt-record column of a raw CSV scan — the
  * shared frame is therefore cached (the scan is one pass either way;
  * at 100 TB the cache spills by design and the alternative — two
  * uncached scans — reads the corpus twice).
  */
object CsvQuarantine {

  val CorruptCol = "_corrupt_record"

  /** One scan, two lanes: `(good rows in `schema`, quarantine rows)`.
    * Quarantine rows carry the raw line, the source file, and a coarse
    * reason (the parser does not expose per-field diagnostics). */
  def readSplit(spark: SparkSession, glob: String, schema: StructType,
                header: Boolean = true): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"user schema must not declare $CorruptCol")
    val withCorrupt = schema.add(CorruptCol, StringType, nullable = true)
    val raw = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("header", header.toString)
      .csv(glob)
      .withColumn("_src_file", input_file_name())
      .cache() // Spark disallows corrupt-column-only queries on the raw
               // scan; the cache also makes the two lanes one pass
    val good = raw.filter(col(CorruptCol).isNull)
      .select(schema.fieldNames.map(col).toSeq: _*)
    val nCols = schema.fields.length
    val fieldCount: Column =
      size(split(col(CorruptCol), ",", -1))
    val quarantined = raw.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"),
        col("_src_file").as("src_file"),
        when(fieldCount =!= nCols,
            concat(lit("column_count:"), fieldCount.cast("string")))
          .otherwise(lit("type_mismatch")).as("reason"))
    (good, quarantined)
  }
}
