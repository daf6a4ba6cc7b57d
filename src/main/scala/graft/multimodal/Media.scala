package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing — builder-prompt
  * north-star. Media is carried as an opaque `binary` column plus a typed
  * metadata struct; decode / feature-extract / resize / frame-sample run
  * as batched per-partition transforms (`mapPartitions` over a typed
  * Dataset — the Scala analogue of `mapInPandas`: an iterator of batches,
  * never a whole-partition materialization).
  *
  * The actual codecs are NOT in this container, so `decodeStub` is a
  * clearly-marked deterministic fake that parses our own 8-byte header;
  * everything around it — schema, encoders, batch shape, partition
  * distribution — is real and tested (MediaSpec). Swapping the stub for a
  * JNI/ffmpeg call changes one function.
  *
  * Scale posture: media blobs are large; all transforms here are
  * narrow (no shuffle), so media never moves between executors — only
  * the extracted features/metadata (tiny) flow into joins/aggregations.
  */
object Media {

  /** Typed metadata carried alongside the blob. */
  case class MediaMeta(kind: String, width: Int, height: Int,
                       sampleRate: Int, nFrames: Int)

  case class MediaRow(media_id: Long, kind: String, content: Array[Byte])

  case class DecodedRow(media_id: Long, kind: String, content: Array[Byte],
                        meta: MediaMeta)

  case class FeatureRow(media_id: Long, nBytes: Int, mean: Double,
                        histogram: Array[Long])

  /** === STUB (deterministic fake codec) ===
    * Real decoders (JPEG/PNG/PCM/mp4) are not available in this
    * environment. This fake reads an 8-byte header we also use in tests:
    * bytes 0-1 width, 2-3 height, 4-5 sample rate, 6-7 frame count
    * (big-endian unsigned shorts). Deterministic for any input.
    */
  def decodeStub(kind: String, content: Array[Byte]): MediaMeta = {
    def u16(i: Int): Int =
      if (content.length < i + 2) 0
      else ((content(i) & 0xFF) << 8) | (content(i + 1) & 0xFF)
    MediaMeta(kind, u16(0), u16(2), u16(4), u16(6))
  }

  private val BatchSize = 64

  /** Decode pass: batched per-partition metadata extraction. The
    * `grouped(BatchSize)` iterator is the mapInPandas batch shape — bounded
    * memory per batch regardless of partition size. */
  def decode(ds: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        batch.map(r =>
          DecodedRow(r.media_id, r.kind, r.content,
                     decodeStub(r.kind, r.content)))
      }
    }
  }

  /** Feature extraction: byte histogram + mean — the stand-in for an
    * embedding/feature model, same batched shape. */
  def features(ds: Dataset[MediaRow]): Dataset[FeatureRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        batch.map { r =>
          val hist = new Array[Long](256)
          var sum = 0L
          r.content.foreach { b => val u = b & 0xFF; hist(u) += 1; sum += u }
          FeatureRow(r.media_id, r.content.length,
                     if (r.content.isEmpty) 0.0
                     else sum.toDouble / r.content.length, hist)
        }
      }
    }
  }

  /** "Resize": deterministic fake — keep every `factor`-th byte (a real
    * impl would be an image-library call in the same batched loop). */
  def resize(ds: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        batch.map { r =>
          val out = r.content.indices.collect {
            case i if i % factor == 0 => r.content(i)
          }.toArray
          r.copy(content = out)
        }
      }
    }
  }

  /** Frame sampling: split the blob into fixed-size frames, keep every
    * `stride`-th frame. Emits one row per kept frame (generator shape). */
  def frameSample(ds: Dataset[MediaRow], frameBytes: Int,
                  stride: Int): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        batch.flatMap { r =>
          val nFrames = r.content.length / frameBytes
          (0 until nFrames by stride).map { f =>
            (r.media_id, f,
             r.content.slice(f * frameBytes, (f + 1) * frameBytes))
          }
        }
      }
    }.toDF("media_id", "frame_no", "frame")
  }
}
