package graft

import graft.sources.ParquetFooter
import org.apache.spark.sql.functions._

/** The hand-written Thrift compact-protocol footer parser vs the two
  * independent implementations on hand: parquet-mr (Spark's bundled
  * reader — field-by-field equality on a Spark-written multi-row-group
  * file) and DuckDB (the store_footer_census oracle recomputes the
  * census from data; gated in Verify). Plus the codec-walker hostile
  * contract: arbitrary bytes degrade to None, never throw. */
class ParquetFooterSpec extends SparkSpec {

  private def writeParquet(nulls: Boolean): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_footer").toString
    val df = (0 until 5000)
      .map(i => (i.toLong - 1000, s"row_$i",
        if (nulls && i % 7 == 0) None else Some(i.toLong * 3)))
      .toDF("k", "s", "v")
    df.coalesce(1).write
      .option("parquet.block.size", "4096")
      .option("parquet.page.size", "1024")
      .mode("overwrite").parquet(dir)
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
  }

  test("field-by-field equality with parquet-mr on a Spark-written " +
       "multi-row-group file, negatives and nulls included") {
    import scala.jdk.CollectionConverters._
    val path = writeParquet(nulls = true)
    val fm = ParquetFooter.parseFile(path).get
    val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(path),
        spark.sparkContext.hadoopConfiguration))
    try {
      val blocks = rdr.getFooter.getBlocks.asScala.toSeq
      assert(fm.rowGroups.size == blocks.size && blocks.size > 1,
        s"block size 4096 must force several row groups, got ${blocks.size}")
      assert(fm.numRows == blocks.map(_.getRowCount).sum)
      assert(fm.rootFieldCount == 3)
      fm.rowGroups.zip(blocks).foreach { case (mine, theirs) =>
        assert(mine.numRows == theirs.getRowCount)
        val mk = mine.columns.find(_.pathInSchema == "k").get
        val tk = theirs.getColumns.asScala
          .find(_.getPath.toDotString == "k").get
        assert(mk.numValues == tk.getValueCount)
        assert(mk.totalCompressedSize == tk.getTotalSize)
        assert(mk.totalUncompressedSize == tk.getTotalUncompressedSize)
        val st = tk.getStatistics
        assert(mk.nullCount.contains(st.getNumNulls))
        assert(ParquetFooter.statLong(mk.minValue.get, mk.physicalType)
          .contains(st.genericGetMin.asInstanceOf[java.lang.Long].longValue))
        assert(ParquetFooter.statLong(mk.maxValue.get, mk.physicalType)
          .contains(st.genericGetMax.asInstanceOf[java.lang.Long].longValue))
        // nullable column: null counts present and merged correctly
        val mv = mine.columns.find(_.pathInSchema == "v").get
        val tv = theirs.getColumns.asScala
          .find(_.getPath.toDotString == "v").get
        assert(mv.nullCount.contains(tv.getStatistics.getNumNulls))
      }
    } finally rdr.close()
  }

  test("census math over the parsed footer matches the data") {
    val path = writeParquet(nulls = true)
    val fm = ParquetFooter.parseFile(path).get
    val df = spark.read.parquet(path)
    val r = df.agg(count(lit(1)), min("k"), max("k"),
      sum(when(col("v").isNull, 1L).otherwise(0L))).collect()(0)
    assert(fm.numRows == r.getLong(0))
    val ks = fm.rowGroups.map(_.columns.find(_.pathInSchema == "k").get)
    assert(ks.flatMap(c => ParquetFooter.statLong(c.minValue.get,
      c.physicalType)).min == r.getLong(1))
    assert(ks.flatMap(c => ParquetFooter.statLong(c.maxValue.get,
      c.physicalType)).max == r.getLong(2))
    val vs = fm.rowGroups.map(_.columns.find(_.pathInSchema == "v").get)
    assert(vs.flatMap(_.nullCount).sum == r.getLong(3))
  }

  test("pyarrow-written fixture parses and self-agrees") {
    val fm = ParquetFooter.parseFile(
      s"$sf0001/lineitem.parquet").get
    assert(fm.numRows > 0 && fm.rootFieldCount > 5)
    assert(fm.rowGroups.map(_.numRows).sum == fm.numRows)
    assert(fm.createdBy.nonEmpty)
  }

  test("statLong: little-endian two's complement, both widths") {
    assert(ParquetFooter.statLong(
      Array[Byte](-1, -1, -1, -1, -1, -1, -1, -1), ParquetFooter.TInt64)
      .contains(-1L))
    assert(ParquetFooter.statLong(
      Array[Byte](0x2A, 0, 0, 0), ParquetFooter.TInt32).contains(42L))
    assert(ParquetFooter.statLong(
      Array[Byte](-128, -1, -1, -1), ParquetFooter.TInt32).contains(-128L))
    assert(ParquetFooter.statLong(Array[Byte](1, 2), ParquetFooter.TInt64)
      .isEmpty) // wrong width
    assert(ParquetFooter.statLong(Array[Byte](1, 2, 3, 4), 6).isEmpty)
  }

  test("hostile: truncation, corruption, lying lengths all degrade to " +
       "None without throwing") {
    val path = writeParquet(nulls = false)
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path))
    def tmp(b: Array[Byte]): String = {
      val p = java.nio.file.Files.createTempFile("hostile", ".parquet")
      java.nio.file.Files.write(p, b); p.toString
    }
    // truncations at every region boundary
    for (n <- Seq(0, 3, 11, bytes.length / 2, bytes.length - 5))
      assert(ParquetFooter.parseFile(tmp(bytes.take(n))).isEmpty
        || n >= bytes.length) // shorter file: magic/length checks fire
    // not parquet at all
    assert(ParquetFooter.parseFile(tmp("hello".getBytes)).isEmpty)
    assert(ParquetFooter.parse("garbage thrift".getBytes).isEmpty)
    // lying footer length (points past start of file)
    val lying = bytes.clone()
    val p0 = lying.length - 8
    lying(p0) = -1; lying(p0 + 1) = -1; lying(p0 + 2) = -1; lying(p0 + 3) = 0x7F
    assert(ParquetFooter.parseFile(tmp(lying)).isEmpty)
    // byte-flip sweep through the real footer region: None or a parse,
    // never a throw or a hang
    val footer = ParquetFooter.readFooterBytes(path).get
    for (i <- 0 until footer.length by 3) {
      val mut = footer.clone(); mut(i) = (mut(i) ^ 0x5A).toByte
      ParquetFooter.parse(mut)
    }
  }
}
