package graft.multimodal

/** ISO base-media-file-format (MP4) box-structure census — an
  * independent box walker written from the PUBLIC ISO/IEC 14496-12
  * spec (§4.2 object structure: 32-bit size + FourCC type, size==1 →
  * 64-bit largesize, size==0 → box extends to end of file; §8.2.2
  * `mvhd` movie header), retiring the LAST `decodeStub` codec family
  * (aac/mp4 containers). This is a STRUCTURE parser, not a media
  * decoder: it walks the box tree and reports the census a corpus-prep
  * pipeline needs — box/track counts, tree depth, declared timescale
  * and duration, media-vs-metadata byte split — the fields that drive
  * duration accounting, dedup blocking and quality filters over a
  * video/audio corpus without touching a single codec frame.
  *
  * Reference behavior: `aced_etl_pod`'s DocumentReference attachments
  * (etl-job/fhir_import_export.py) carry declared mime types and
  * sizes; this census is the engine-side generalization that VALIDATES
  * container structure instead of trusting the declaration.
  *
  * Robustness contract (the [[Jpeg]]/[[Mp3]] discipline): runs against
  * arbitrary corpus blobs — corrupt or hostile input degrades to None,
  * never throws, never hangs (every box advances the cursor by ≥ 8
  * bytes; recursion is depth-capped), and allocates nothing
  * proportional to DECLARED sizes (a lying 2^63 largesize fails the
  * bounds check against the real buffer, it is never trusted).
  */
object Mp4 {

  /** §4.2: container boxes whose payload is a sequence of child boxes.
    * The walker recurses into these; every other type is a leaf. */
  private val Containers: Set[String] =
    Set("moov", "trak", "mdia", "minf", "stbl", "edts", "udta", "mvex")

  /** Recursion guard: a legitimate ISO-BMFF tree is ≤ ~8 deep
    * (moov/trak/mdia/minf/stbl/...); a crafted self-nesting stream
    * past this depth is rejected rather than walked. */
  private val MaxDepth = 16

  /** One stream's structure census. Counts are over the whole tree;
    * `timescale`/`duration` come from the first valid `mvhd` (0 if
    * none); `durationMs` is the integer-floor millisecond conversion. */
  final case class Census(
      nBoxes: Int, nTop: Int, maxDepth: Int, nTraks: Int,
      timescale: Long, duration: Long, durationMs: Long,
      mdatBytes: Long, freeBytes: Long, usesLargesize: Boolean,
      totalBytes: Long)

  private def u32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xFFL) << 24) | ((b(p + 1) & 0xFFL) << 16) |
      ((b(p + 2) & 0xFFL) << 8) | (b(p + 3) & 0xFFL)

  private def u64(b: Array[Byte], p: Int): Long =
    (u32(b, p) << 32) | u32(b, p + 4)

  private def fourcc(b: Array[Byte], p: Int): String = {
    val cs = new Array[Char](4)
    var i = 0
    while (i < 4) {
      val c = b(p + i) & 0xFF
      // FourCC bytes are printable ASCII (©-prefixed udta tags allowed)
      if (c < 0x20 || c > 0x7E) {
        if (c != 0xA9) return null
        cs(i) = '©'
      } else cs(i) = c.toChar
      i += 1
    }
    new String(cs)
  }

  private final class Acc {
    var nBoxes = 0; var nTop = 0; var maxDepth = 0; var nTraks = 0
    var timescale = 0L; var duration = 0L
    var mdatBytes = 0L; var freeBytes = 0L; var usesLargesize = false
    var bad = false
  }

  /** Walk one box sequence spanning [from, to). Returns true iff the
    * region parses exactly (no trailing partial box, no lying sizes). */
  private def walk(b: Array[Byte], from: Long, to: Long, depth: Int,
                   acc: Acc): Boolean = {
    if (depth > MaxDepth) { acc.bad = true; return false }
    var p = from
    while (p < to && !acc.bad) {
      if (to - p < 8) { acc.bad = true; return false }
      val size0 = u32(b, p.toInt)
      val typ = fourcc(b, p.toInt + 4)
      if (typ == null) { acc.bad = true; return false }
      var header = 8L
      val size: Long =
        if (size0 == 1L) { // §4.2 largesize
          if (to - p < 16) { acc.bad = true; return false }
          header = 16L; acc.usesLargesize = true
          u64(b, p.toInt + 8)
        } else if (size0 == 0L) to - p // box extends to end of region
        else size0
      // a size below its own header, past the region, or overflowed
      // 64-bit arithmetic is hostile — reject, never trust
      if (size < header || size > to - p) { acc.bad = true; return false }
      acc.nBoxes += 1
      if (depth == 0) acc.nTop += 1
      if (depth + 1 > acc.maxDepth) acc.maxDepth = depth + 1
      val body = p + header
      val end = p + size
      typ match {
        case t if Containers.contains(t) =>
          if (t == "trak") acc.nTraks += 1
          if (!walk(b, body, end, depth + 1, acc)) return false
        case "mvhd" if acc.timescale == 0L =>
          // §8.2.2: FullBox version(1)+flags(3), then v0: ctime(4)
          // mtime(4) timescale(4) duration(4); v1: 8/8/4/8
          if (end - body >= 4) {
            val v = b(body.toInt) & 0xFF
            if (v == 0 && end - body >= 20) {
              acc.timescale = u32(b, body.toInt + 12)
              acc.duration = u32(b, body.toInt + 16)
            } else if (v == 1 && end - body >= 32) {
              acc.timescale = u32(b, body.toInt + 20)
              acc.duration = u64(b, body.toInt + 24)
            }
          }
        case "mdat" => acc.mdatBytes += size - header
        case "free" | "skip" => acc.freeBytes += size - header
        case _ => () // leaf payload is opaque to the structure census
      }
      p = end
    }
    !acc.bad && p == to
  }

  /** Parse a whole stream. None unless the stream is a clean box
    * sequence starting with `ftyp` (the ISO-BMFF signature). */
  def census(bytes: Array[Byte]): Option[Census] = {
    if (bytes.length < 16) return None
    if (fourcc(bytes, 4) != "ftyp") return None
    val acc = new Acc
    if (!walk(bytes, 0L, bytes.length.toLong, 0, acc)) return None
    val durMs =
      if (acc.timescale > 0) acc.duration * 1000L / acc.timescale else 0L
    Some(Census(acc.nBoxes, acc.nTop, acc.maxDepth, acc.nTraks,
      acc.timescale, acc.duration, durMs, acc.mdatBytes, acc.freeBytes,
      acc.usesLargesize, bytes.length.toLong))
  }

  /** True iff the stream opens with a well-formed `ftyp` box. */
  def isMp4(bytes: Array[Byte]): Boolean =
    bytes.length >= 16 && fourcc(bytes, 4) == "ftyp" &&
      u32(bytes, 0) >= 16 && u32(bytes, 0) <= bytes.length
}
