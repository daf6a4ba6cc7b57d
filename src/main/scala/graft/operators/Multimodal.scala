package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Multimodal binary-column queries over testdata (document text cast to
  * bytes stands in for media blobs — the real media path is
  * [[graft.multimodal.Media]]): binary length/digest metadata and
  * frame-count arithmetic, both SQL-oracle-able.
  */
object Multimodal {

  /** Binary metadata extraction: byte length, first byte, content digest,
    * and frame-sampling arithmetic (16-byte frames, every 4th kept). */
  val multimodalMeta: Q = Q(
    "multimodal_meta",
    """SELECT doc_id,
      |  octet_length(CAST(text AS BLOB)) AS n_bytes,
      |  ascii(substr(text, 1, 1)) AS first_byte,
      |  sha256(text) AS digest,
      |  CAST(floor(octet_length(CAST(text AS BLOB)) / 16) AS BIGINT) AS n_frames,
      |  CAST(floor((floor(octet_length(CAST(text AS BLOB)) / 16) + 3) / 4) AS BIGINT) AS n_sampled
      |FROM documents ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val bin = col("text").cast("binary")
    val nBytes = octet_length(bin)
    // floor, not cast: DuckDB casts double->bigint by rounding, Spark by
    // truncation — floor() is exact in both.
    val nFrames = floor(nBytes / 16).cast("long")
    Tables.documents(s, d).select(
      col("doc_id"),
      nBytes.as("n_bytes"),
      ascii(col("text")).as("first_byte"),
      sha2(bin, 256).as("digest"),
      nFrames.as("n_frames"),
      floor((nFrames + 3) / 4).cast("long").as("n_sampled")
    ).orderBy("doc_id")
  }

  /** Feature extraction through the REAL typed media path: the batched
    * `mapPartitions` pipeline ([[graft.multimodal.Media.features]] — the
    * mapInPandas analogue that a production embed/decode model plugs
    * into) runs over text-as-bytes blobs, and its byte-histogram outputs
    * are value-checked against a pure-SQL oracle. This pins the typed
    * path's semantics (batching, encoders, per-partition iteration)
    * with a hash compare, not just a spec. Narrow/no-shuffle: blobs
    * never leave their partition; only (id, stats) rows flow on.
    * The oracle iterates UTF-8 BYTES (hex(encode(text)) split into hex
    * pairs), exactly what the Spark side's binary cast feeds Media — NOT
    * per-character code points, which would silently diverge on any
    * non-ASCII document. */
  val multimodalFeatures: Q = Q(
    "multimodal_features",
    """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
      |b AS (SELECT doc_id,
      |        unnest([CAST('0x' || substr(hx, 2*i-1, 2) AS INT)
      |                FOR i IN range(1, len(hx)//2 + 1)]) AS byte
      |      FROM h),
      |pc AS (SELECT doc_id, byte, count(*) AS c FROM b GROUP BY 1, 2)
      |SELECT doc_id AS media_id,
      |  CAST(sum(c) AS INT) AS n_bytes,
      |  CAST(sum(byte * c) AS DOUBLE) / sum(c) AS mean_byte,
      |  CAST(count(*) AS INT) AS n_distinct,
      |  CAST(max(c) AS BIGINT) AS top_byte_n
      |FROM pc GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    import graft.multimodal.Media
    val rows = Tables.documents(s, d)
      .select(col("doc_id").as("media_id"), lit("text").as("kind"),
              col("text").cast("binary").as("content"))
      .as[Media.MediaRow]
    Media.features(rows).toDF()
      .select(col("media_id"),
        col("nBytes").as("n_bytes"),
        col("mean").as("mean_byte"),
        size(filter(col("histogram"), _ > 0)).as("n_distinct"),
        array_max(col("histogram")).as("top_byte_n"))
      .orderBy("media_id")
  }

  val all: Seq[Q] = Seq(multimodalMeta, multimodalFeatures)
}
