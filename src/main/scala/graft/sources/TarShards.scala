package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Distributed tar-shard ingest — the WebDataset layout (Aizman et al.;
  * the de-facto container for multimodal training data: samples stored as
  * consecutive tar members sharing a basename, thousands of ~100 MB–1 GB
  * shards consumed sequentially, one shard per worker). Spark-side: the
  * shard list is the parallelism unit — `binaryFile` gives one task per
  * shard, each task streams its archive start-to-finish (tar has no
  * central directory, sequential is the ONLY access pattern), and the
  * emitted (shard, sample_key, member, bytes) rows join/group downstream
  * like any other table. At 100 TB this is exactly the training-loader
  * topology: shard count caps parallelism, so shard upstream to ≥ executor
  * count.
  *
  * The parser is an independent implementation of the POSIX ustar layout
  * (512-byte header blocks: name at 0/100, size as octal at 124/12,
  * typeflag at 156, checksum at 148/8 computed over the header with the
  * checksum field read as spaces; content padded to the block size; two
  * zero blocks terminate) — NOT a wrapper over a tar library, so the
  * SourcesSpec round-trip against the system `tar(1)` binary is a
  * cross-implementation oracle, the [[graft.multimodal.Media]] codec
  * discipline applied to the container layer.
  */
object TarShards {

  /** One archive member: the shard file it came from, the WebDataset
    * sample key (basename up to the first dot), the member's extension
    * (after that dot), full member name, size, and content bytes. */
  final case class Member(shard: String, sample_key: String, ext: String,
                          name: String, size: Long, content: Array[Byte])

  private val Block = 512

  /** Read every regular-file member of every tar matching `glob`. */
  def read(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(glob)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val shard = path.substring(path.lastIndexOf('/') + 1)
        members(bytes).map { case (name, content) =>
          val base = name.substring(name.lastIndexOf('/') + 1)
          val dot = base.indexOf('.')
          val (key, ext) =
            if (dot < 0) (base, "") else (base.take(dot), base.drop(dot + 1))
          Member(shard, key, ext, name, content.length.toLong, content)
        }
      }
      .toDF()
  }

  /** Walk one archive; returns (memberName, bytes) for regular files.
    * Throws on a checksum mismatch — a torn shard must fail the task
    * (and its retry) loudly, never yield silently truncated samples. */
  private[sources] def members(tar: Array[Byte]): List[(String, Array[Byte])] = {
    val out = List.newBuilder[(String, Array[Byte])]
    var off = 0
    var done = false
    while (!done && off + Block <= tar.length) {
      if (tar.slice(off, off + Block).forall(_ == 0)) done = true
      else {
        val name = cstr(tar, off, 100)
        val size = octal(tar, off + 124, 12)
        val typeflag = tar(off + 156).toChar
        val stored = octal(tar, off + 148, 8)
        var sum = 0L
        var i = 0
        while (i < Block) {
          val b = if (i >= 148 && i < 156) ' '.toByte else tar(off + i)
          sum += (b & 0xFF)
          i += 1
        }
        require(sum == stored,
          s"tar header checksum mismatch for '$name' at offset $off: " +
            s"computed $sum, stored $stored — torn or non-tar shard")
        val dataStart = off + Block
        // '0' and NUL are regular files; '5' directories, 'L' GNU longname
        // and the rest are skipped but their payload still advances the
        // cursor (padded to whole blocks)
        if ((typeflag == '0' || typeflag == '\u0000') && size >= 0)
          out += name -> tar.slice(dataStart, dataStart + size.toInt)
        off = dataStart + (((size + Block - 1) / Block) * Block).toInt
      }
    }
    out.result()
  }

  private def cstr(a: Array[Byte], off: Int, len: Int): String = {
    var end = off
    while (end < off + len && a(end) != 0) end += 1
    new String(a, off, end - off, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Parse the octal numeric field at [off, off+len): leading spaces/NULs
    * tolerated, terminated by space or NUL (the ustar convention). */
  private def octal(a: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = off
    var seen = false
    while (i < off + len) {
      val c = a(i).toChar
      if (c >= '0' && c <= '7') { v = v * 8 + (c - '0'); seen = true }
      else if (seen) i = off + len // terminator after digits
      i += 1
    }
    v
  }
}
