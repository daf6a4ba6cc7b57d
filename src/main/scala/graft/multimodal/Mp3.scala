package graft.multimodal

/** MPEG-1 Audio Layer III (MP3) frame-header census — an independent
  * bit-stream walker written from the PUBLIC ISO/IEC 11172-3 spec
  * (§2.4.1.3 header syntax; §2.4.3.1 frame size), retiring the last
  * `decodeStub` codec family (compressed audio) for the mp3 container.
  * This is a HEADER parser, not an audio decoder: it frame-syncs, walks
  * the frame chain by the computed frame lengths, and reports the
  * census a corpus-prep pipeline needs (frame count, sample rate,
  * bitrate distribution → CBR/VBR, padding, audio-vs-junk bytes,
  * decoded sample count) — the metadata that drives dedup, quality
  * filtering and duration accounting over an audio corpus without ever
  * decoding PCM.
  *
  * Reference behavior: `aced_etl_pod` ships file-type-driven metadata
  * extraction in its ETL surface (etl-job/fhir_import_export.py's
  * DocumentReference attachments carry declared mime types and sizes);
  * the engine-side census is the generalization that VALIDATES the
  * bytes instead of trusting the declaration.
  *
  * Scope (documented cut, like progressive JPEG): MPEG-1 Layer III
  * only — the dominant mp3 profile. MPEG-2/2.5 or Layer I/II headers
  * fail validation and are skipped as junk by the resync scan, never
  * misparsed. Free-format (bitrate index 0) and the reserved indices
  * are likewise rejected per spec.
  *
  * Robustness contract (the [[Jpeg]] discipline): runs against
  * arbitrary corpus blobs — corrupt or hostile input degrades to None
  * or fewer frames, never throws, never hangs (the scan always
  * advances ≥ 1 byte), allocates nothing proportional to DECLARED
  * sizes.
  */
object Mp3 {

  /** ISO 11172-3 Table B.2, Layer III column: bitrate index → kbps.
    * Index 0 is free-format (rejected), 15 is forbidden. */
  val KbpsByIndex: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** Sampling-rate index → Hz (MPEG-1): 0 → 44100, 1 → 48000,
    * 2 → 32000; 3 reserved. */
  val HzByIndex: Array[Int] = Array(44100, 48000, 32000)

  /** Samples per MPEG-1 Layer III frame (§2.4.2.1: 2 granules × 576). */
  val SamplesPerFrame = 1152

  /** One stream's header census. `isCbr` is a STREAM property — every
    * valid frame carries the same bitrate index. */
  final case class Census(
      nFrames: Int, sampleRateHz: Int, minKbps: Int, maxKbps: Int,
      nBitrates: Int, isCbr: Boolean, nPadded: Int, audioBytes: Long,
      junkBytes: Long, samples: Long)

  /** Frame length in bytes for MPEG-1 Layer III (§2.4.3.1):
    * floor(144 · bitrate / sampling_frequency) + padding. */
  def frameLen(kbps: Int, hz: Int, padded: Boolean): Int =
    144000 * kbps / hz + (if (padded) 1 else 0)

  private def u32syncsafe(b: Array[Byte], p: Int): Int =
    ((b(p) & 0x7F) << 21) | ((b(p + 1) & 0x7F) << 14) |
    ((b(p + 2) & 0x7F) << 7) | (b(p + 3) & 0x7F)

  /** Walk the stream: skip an ID3v2 tag if present (ID3v2 §3.1:
    * "ID3" + version + flags + syncsafe size), then frame-sync scan.
    * A valid MPEG-1 Layer III header is consumed and stepped over by
    * its computed length; anything else advances one byte as junk.
    * None when no valid frame exists. */
  def census(buf: Array[Byte]): Option[Census] = {
    if (buf == null || buf.length < 4) return None
    var pos = 0
    // ID3v2 prefix: counted as junk (it is metadata, not audio)
    if (buf.length >= 10 && buf(0) == 'I' && buf(1) == 'D' &&
        buf(2) == '3') {
      val sz = u32syncsafe(buf, 6)
      val skip = 10L + sz
      if (skip < buf.length) pos = skip.toInt else return None
    }
    var nFrames = 0
    var sampleRate = 0
    var minK = Int.MaxValue
    var maxK = 0
    var brSeen = 0 // bitset over the 14 valid indices
    var nPadded = 0
    var audio = 0L
    while (pos + 4 <= buf.length) {
      val b1 = buf(pos) & 0xFF
      val b2 = buf(pos + 1) & 0xFF
      val b3 = buf(pos + 2) & 0xFF
      // sync (11 bits) + version MPEG-1 (bits 4-3 = 11) + layer III
      // (bits 2-1 = 01) → second byte 1111101x
      if (b1 == 0xFF && (b2 & 0xFE) == 0xFA) {
        val brIdx = (b3 >> 4) & 0xF
        val srIdx = (b3 >> 2) & 0x3
        if (brIdx >= 1 && brIdx <= 14 && srIdx <= 2) {
          val kbps = KbpsByIndex(brIdx)
          val hz = HzByIndex(srIdx)
          val padded = ((b3 >> 1) & 1) == 1
          val len = frameLen(kbps, hz, padded)
          if (pos + len <= buf.length && len >= 4) {
            nFrames += 1
            sampleRate = hz
            if (kbps < minK) minK = kbps
            if (kbps > maxK) maxK = kbps
            brSeen |= 1 << brIdx
            if (padded) nPadded += 1
            audio += len
            pos += len
          } else pos += 1 // truncated final frame: junk
        } else pos += 1 // reserved/free-format index: resync
      } else pos += 1
    }
    if (nFrames == 0) None
    else Some(Census(nFrames, sampleRate, minK, maxK,
      java.lang.Integer.bitCount(brSeen),
      java.lang.Integer.bitCount(brSeen) == 1, nPadded, audio,
      buf.length.toLong - audio, nFrames.toLong * SamplesPerFrame))
  }

  /** True when the blob starts with an MP3 frame sync or an ID3v2
    * tag — the magic-sniff gate, content-based like
    * [[Media.isImageContainer]]. */
  def isMp3(buf: Array[Byte]): Boolean =
    (buf.length >= 3 && buf(0) == 'I' && buf(1) == 'D' && buf(2) == '3') ||
    (buf.length >= 2 && (buf(0) & 0xFF) == 0xFF &&
      ((buf(1) & 0xFF) & 0xE0) == 0xE0)
}
