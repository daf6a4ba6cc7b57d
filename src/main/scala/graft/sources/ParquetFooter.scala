package graft.sources

/** Hand-written Parquet FOOTER parser — a Thrift compact-protocol
  * reader (public THRIFT-COMPACT spec: ULEB128 varints, zigzag ints,
  * nibble-packed field/list headers) applied to the public
  * `parquet.thrift` FileMetaData schema (apache/parquet-format). This
  * is the metadata-only half of scan planning: row counts, schema
  * width, per-column-chunk statistics (null counts, min/max), sizes —
  * everything a 100 TB planner prunes with — extracted from the last
  * few KB of each file, never touching a data page.
  *
  * Independence: Spark's bundled parquet-mr reader and DuckDB's scan
  * are the cross-implementations. The `store_footer_census` query
  * walks footers with THIS parser and its DuckDB oracle recomputes
  * every census column from the DATA (count/min/max/null-count per
  * key), so a pass proves the hand-parsed statistics agree with the
  * ground truth the stats summarize — the metadata-integrity check a
  * pruning planner implicitly trusts on every query.
  *
  * Robustness contract (the codec-walker discipline): arbitrary bytes
  * degrade to None, never throw, never hang — every varint is capped,
  * every length is bounds-checked against the real buffer, skip
  * recursion is depth-capped, and nothing is allocated from DECLARED
  * sizes.
  */
object ParquetFooter {

  /** Physical type enum (parquet.thrift Type). */
  val TInt32 = 1
  val TInt64 = 2

  /** One column chunk's planning-relevant metadata. `minValue` /
    * `maxValue` prefer the modern `min_value`/`max_value` statistics
    * fields (5/6) and fall back to the deprecated signed-sort `min`/
    * `max` (1/2) only for integer physical types, where the two
    * orderings agree. */
  final case class ColumnChunkMeta(pathInSchema: String, physicalType: Int,
      numValues: Long, totalCompressedSize: Long,
      totalUncompressedSize: Long, nullCount: Option[Long],
      minValue: Option[Array[Byte]], maxValue: Option[Array[Byte]])

  final case class RowGroupMeta(numRows: Long, totalByteSize: Long,
      columns: Vector[ColumnChunkMeta])

  final case class FooterMeta(version: Int, numRows: Long,
      rootFieldCount: Int, createdBy: String,
      rowGroups: Vector[RowGroupMeta])

  /** Decode an INT32/INT64 statistics value (plain encoding:
    * little-endian two's complement, 4 or 8 bytes). */
  def statLong(b: Array[Byte], physicalType: Int): Option[Long] =
    physicalType match {
      case TInt32 if b.length == 4 =>
        Some((b(0) & 0xFFL) | ((b(1) & 0xFFL) << 8) |
          ((b(2) & 0xFFL) << 16) | ((b(3).toLong) << 24))
      case TInt64 if b.length == 8 =>
        var v = 0L; var i = 7
        while (i >= 0) { v = (v << 8) | (b(i) & 0xFFL); i -= 1 }
        Some(v)
      case _ => None
    }

  // ---- Thrift compact-protocol primitives -------------------------
  private val StructT = 12
  private val MaxDepth = 32

  private final class CReader(buf: Array[Byte]) {
    var pos = 0
    var bad = false
    def u8(): Int = {
      if (pos >= buf.length) { bad = true; 0 }
      else { val v = buf(pos) & 0xFF; pos += 1; v }
    }
    /** ULEB128, capped at 10 bytes — a longer run is hostile. */
    def varint(): Long = {
      var v = 0L; var shift = 0
      var i = 0
      while (i < 10) {
        val b = u8()
        v |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
        i += 1
      }
      bad = true; 0L
    }
    def zigzag(): Long = { val n = varint(); (n >>> 1) ^ -(n & 1) }
    def binary(): Array[Byte] = {
      val n = varint()
      if (bad || n < 0 || n > buf.length - pos) { bad = true; Array.emptyByteArray }
      else { val out = java.util.Arrays.copyOfRange(buf, pos, pos + n.toInt); pos += n.toInt; out }
    }
    /** List header: (size<<4)|elemType, size 15 → varint follows. */
    def listHeader(): (Int, Int) = {
      val b = u8()
      val et = b & 0xF
      var n = (b >> 4) & 0xF
      if (n == 15) {
        val big = varint()
        if (big < 0 || big > Int.MaxValue) { bad = true; return (0, et) }
        n = big.toInt
      }
      // a declared size that cannot fit in the remaining bytes (every
      // element is ≥1 byte except bool... which is also 1 in lists) is
      // hostile — reject before any caller loops on it
      if (n > buf.length - pos) bad = true
      (n, et)
    }
    /** Field header within a struct: (STOP | type, fieldId). */
    def fieldHeader(lastId: Int): (Int, Int) = {
      val b = u8()
      if (b == 0) return (0, 0)
      val typ = b & 0xF
      val delta = (b >> 4) & 0xF
      val id = if (delta != 0) lastId + delta else zigzag().toInt
      (typ, id)
    }
    def skip(typ: Int, depth: Int): Unit = {
      if (bad || depth > MaxDepth) { bad = true; return }
      typ match {
        case 1 | 2 => () // bool value lives in the field header
        case 3 => u8()
        case 4 | 5 | 6 => varint()
        case 7 => pos += 8; if (pos > buf.length) bad = true
        case 8 => binary()
        case 9 | 10 =>
          val (n, et) = listHeader()
          var i = 0
          while (i < n && !bad) { skipElem(et, depth + 1); i += 1 }
        case 11 =>
          val n = varint()
          if (bad || n < 0 || n > buf.length - pos) { bad = true; return }
          if (n > 0) {
            val kv = u8()
            var i = 0L
            while (i < n && !bad) {
              skipElem((kv >> 4) & 0xF, depth + 1)
              skipElem(kv & 0xF, depth + 1)
              i += 1
            }
          }
        case StructT =>
          var last = 0
          var stop = false
          while (!stop && !bad) {
            val (t, id) = fieldHeader(last)
            if (t == 0) stop = true
            else { last = id; skip(t, depth + 1) }
          }
        case _ => bad = true
      }
    }
    /** List/set/map elements carry full type codes; bools are 1 byte. */
    private def skipElem(typ: Int, depth: Int): Unit = typ match {
      case 1 | 2 => u8()
      case t => skip(t, depth)
    }
  }

  // ---- parquet.thrift structures ----------------------------------

  private def readStatistics(r: CReader, physicalType: Int)
      : (Option[Long], Option[Array[Byte]], Option[Array[Byte]]) = {
    var nullCount: Option[Long] = None
    var minDep: Option[Array[Byte]] = None
    var maxDep: Option[Array[Byte]] = None
    var minV: Option[Array[Byte]] = None
    var maxV: Option[Array[Byte]] = None
    var last = 0
    var stop = false
    while (!stop && !r.bad) {
      val (t, id) = r.fieldHeader(last)
      if (t == 0) stop = true
      else {
        last = id
        (id, t) match {
          case (1, 8) => maxDep = Some(r.binary())
          case (2, 8) => minDep = Some(r.binary())
          case (3, 6) => nullCount = Some(r.zigzag())
          case (5, 8) => maxV = Some(r.binary())
          case (6, 8) => minV = Some(r.binary())
          case _ => r.skip(t, 0)
        }
      }
    }
    // deprecated min/max have engine-defined order for non-integers;
    // only integers are safe to substitute
    val intType = physicalType == TInt32 || physicalType == TInt64
    (nullCount,
      minV.orElse(if (intType) minDep else None),
      maxV.orElse(if (intType) maxDep else None))
  }

  private def readColumnMeta(r: CReader): ColumnChunkMeta = {
    var typ = -1; var numValues = 0L
    var comp = 0L; var uncomp = 0L
    var path = ""
    var nullCount: Option[Long] = None
    var minV: Option[Array[Byte]] = None
    var maxV: Option[Array[Byte]] = None
    var last = 0
    var stop = false
    while (!stop && !r.bad) {
      val (t, id) = r.fieldHeader(last)
      if (t == 0) stop = true
      else {
        last = id
        (id, t) match {
          case (1, 5) => typ = r.zigzag().toInt
          case (3, 9) =>
            val (n, et) = r.listHeader()
            val parts = new Array[String](n)
            var i = 0
            while (i < n && !r.bad) {
              if (et == 8) parts(i) = new String(r.binary(), "UTF-8")
              else r.skip(et, 0)
              i += 1
            }
            path = parts.mkString(".")
          case (5, 6) => numValues = r.zigzag()
          case (6, 6) => uncomp = r.zigzag()
          case (7, 6) => comp = r.zigzag()
          case (12, StructT) =>
            val s = readStatistics(r, typ)
            nullCount = s._1; minV = s._2; maxV = s._3
          case _ => r.skip(t, 0)
        }
      }
    }
    ColumnChunkMeta(path, typ, numValues, comp, uncomp, nullCount, minV, maxV)
  }

  private def readColumnChunk(r: CReader): Option[ColumnChunkMeta] = {
    var meta: Option[ColumnChunkMeta] = None
    var last = 0
    var stop = false
    while (!stop && !r.bad) {
      val (t, id) = r.fieldHeader(last)
      if (t == 0) stop = true
      else {
        last = id
        (id, t) match {
          case (3, StructT) => meta = Some(readColumnMeta(r))
          case _ => r.skip(t, 0)
        }
      }
    }
    meta
  }

  private def readRowGroup(r: CReader): RowGroupMeta = {
    var numRows = 0L; var totalBytes = 0L
    val cols = Vector.newBuilder[ColumnChunkMeta]
    var last = 0
    var stop = false
    while (!stop && !r.bad) {
      val (t, id) = r.fieldHeader(last)
      if (t == 0) stop = true
      else {
        last = id
        (id, t) match {
          case (1, 9) =>
            val (n, _) = r.listHeader()
            var i = 0
            while (i < n && !r.bad) {
              readColumnChunk(r).foreach(cols += _)
              i += 1
            }
          case (2, 6) => totalBytes = r.zigzag()
          case (3, 6) => numRows = r.zigzag()
          case _ => r.skip(t, 0)
        }
      }
    }
    RowGroupMeta(numRows, totalBytes, cols.result())
  }

  /** Parse a serialized FileMetaData (the footer payload, WITHOUT the
    * trailing length+magic). None on any malformed input. */
  def parse(footer: Array[Byte]): Option[FooterMeta] = {
    val r = new CReader(footer)
    var version = 0; var numRows = 0L
    var rootFields = 0; var createdBy = ""
    val groups = Vector.newBuilder[RowGroupMeta]
    var last = 0
    var stop = false
    while (!stop && !r.bad) {
      val (t, id) = r.fieldHeader(last)
      if (t == 0) stop = true
      else {
        last = id
        (id, t) match {
          case (1, 5) => version = r.zigzag().toInt
          case (2, 9) => // schema: flattened pre-order; the ROOT's
            val (n, et) = r.listHeader() // num_children = table width
            var i = 0
            while (i < n && !r.bad) {
              if (i == 0 && et == StructT) {
                var l2 = 0
                var s2 = false
                while (!s2 && !r.bad) {
                  val (t2, id2) = r.fieldHeader(l2)
                  if (t2 == 0) s2 = true
                  else {
                    l2 = id2
                    if (id2 == 5 && t2 == 5) rootFields = r.zigzag().toInt
                    else r.skip(t2, 0)
                  }
                }
              } else r.skip(et, 0)
              i += 1
            }
          case (3, 6) => numRows = r.zigzag()
          case (4, 9) =>
            val (n, _) = r.listHeader()
            var i = 0
            while (i < n && !r.bad) { groups += readRowGroup(r); i += 1 }
          case (6, 8) => createdBy = new String(r.binary(), "UTF-8")
          case _ => r.skip(t, 0)
        }
      }
    }
    if (r.bad) None
    else Some(FooterMeta(version, numRows, rootFields, createdBy,
      groups.result()))
  }

  /** Read just the footer payload from a parquet file on a local
    * filesystem: validate both PAR1 magics, read the 4-byte LE footer
    * length, seek, slurp. None for non-parquet or truncated files.
    * (At cluster scale the same 2 reads go through the DFS client —
    * the cost is O(footer), never O(data).) */
  def readFooterBytes(path: String): Option[Array[Byte]] = {
    val f = new java.io.RandomAccessFile(path, "r")
    try {
      val len = f.length()
      if (len < 12) return None
      val head = new Array[Byte](4)
      f.readFully(head)
      if (!(head(0) == 'P' && head(1) == 'A' && head(2) == 'R' &&
            head(3) == '1')) return None
      val tail = new Array[Byte](8)
      f.seek(len - 8)
      f.readFully(tail)
      if (!(tail(4) == 'P' && tail(5) == 'A' && tail(6) == 'R' &&
            tail(7) == '1')) return None
      val fl = (tail(0) & 0xFFL) | ((tail(1) & 0xFFL) << 8) |
        ((tail(2) & 0xFFL) << 16) | ((tail(3) & 0xFFL) << 24)
      if (fl <= 0 || fl > len - 12) return None
      val out = new Array[Byte](fl.toInt)
      f.seek(len - 8 - fl)
      f.readFully(out)
      Some(out)
    } catch { case _: java.io.IOException => None }
    finally f.close()
  }

  def parseFile(path: String): Option[FooterMeta] =
    try readFooterBytes(path).flatMap(parse)
    catch { case scala.util.control.NonFatal(_) => None }
}
