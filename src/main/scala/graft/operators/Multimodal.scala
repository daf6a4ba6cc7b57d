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

  val all: Seq[Q] = Seq(multimodalMeta)
}
