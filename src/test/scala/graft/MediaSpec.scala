package graft

import graft.multimodal.Media
import graft.multimodal.Media.{MediaRow, MediaMeta}

class MediaSpec extends SparkSpec {

  /** 8-byte header (w=640 h=480 rate=16000 frames=3) + payload. */
  private def blob(payload: Array[Byte]): Array[Byte] =
    Array[Byte](0x02, 0x80.toByte, 0x01, 0xE0.toByte, 0x3E, 0x80.toByte,
                0x00, 0x03) ++ payload

  private def ds = {
    val spark2 = spark
    import spark2.implicits._
    Seq(
      MediaRow(1, "image", blob(Array.tabulate(40)(_.toByte))),
      MediaRow(2, "audio", blob(Array.fill(100)(7.toByte))),
      MediaRow(3, "video", Array.empty[Byte])).toDS()
  }

  test("decode parses the header via the batched stub") {
    val out = Media.decode(ds).collect().sortBy(_.media_id)
    assert(out(0).meta === MediaMeta("image", 640, 480, 16000, 3))
    assert(out(2).meta === MediaMeta("video", 0, 0, 0, 0)) // short blob
  }

  test("features: histogram counts every byte exactly once") {
    val out = Media.features(ds).collect().sortBy(_.media_id)
    assert(out(0).histogram.sum === out(0).nBytes.toLong)
    assert(out(1).histogram(7) === 100L) // payload byte 0x07 x100
    assert(out(2).nBytes === 0 && out(2).mean === 0.0)
  }

  test("resize keeps every k-th byte deterministically") {
    val out = Media.resize(ds, 4).collect().sortBy(_.media_id)
    assert(out(0).content.length === (48 + 3) / 4)
    assert(out(0).content(0) === 0x02)
  }

  test("frameSample emits one row per kept frame") {
    val out = Media.frameSample(ds, frameBytes = 16, stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    // media 1: 48 bytes -> 3 frames -> frames 0,2 kept
    assert(out.count(_._1 == 1L) === 2)
    assert(out.filter(_._1 == 1L).map(_._2).sorted.toSeq === Seq(0, 2))
    // media 3: empty -> no frames
    assert(!out.exists(_._1 == 3L))
  }
}
