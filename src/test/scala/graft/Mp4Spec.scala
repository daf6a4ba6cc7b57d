package graft

import graft.multimodal.Mp4
import org.scalatest.funsuite.AnyFunSuite

/** The ISO-BMFF box walker: §4.2 size/largesize stepping, container
  * recursion, §8.2.2 mvhd v0/v1, hostile-input degradation, and
  * round-trip against the query-side synthesizer. */
class Mp4Spec extends AnyFunSuite {

  private def u32(v: Long): Array[Byte] =
    Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def u64(v: Long): Array[Byte] = u32(v >>> 32) ++ u32(v & 0xFFFFFFFFL)
  private def tag(s: String): Array[Byte] = s.getBytes("US-ASCII")
  private def box(t: String, body: Array[Byte]): Array[Byte] =
    u32(8L + body.length) ++ tag(t) ++ body

  private def ftyp: Array[Byte] = box("ftyp", tag("isom") ++ u32(0))
  private def mvhdV0(ts: Long, dur: Long): Array[Byte] =
    box("mvhd", Array[Byte](0, 0, 0, 0) ++ u32(0) ++ u32(0) ++
      u32(ts) ++ u32(dur) ++ new Array[Byte](80))
  private def tkhd: Array[Byte] = box("tkhd", new Array[Byte](84))

  test("walks a canonical tree: counts, depth, traks, mvhd fields") {
    val moov = box("moov", mvhdV0(1000, 2500) ++
      box("trak", tkhd) ++ box("trak", tkhd))
    val buf = ftyp ++ moov ++ box("free", Array[Byte](1, 2, 3)) ++
      box("mdat", new Array[Byte](40))
    val c = Mp4.census(buf).get
    assert(c.nBoxes == 9 && c.nTop == 4 && c.maxDepth == 3 && c.nTraks == 2)
    assert(c.timescale == 1000 && c.duration == 2500 && c.durationMs == 2500)
    assert(c.mdatBytes == 40 && c.freeBytes == 3 && !c.usesLargesize)
    assert(c.totalBytes == buf.length.toLong)
  }

  test("mvhd version 1 reads the 64-bit timescale/duration layout") {
    val mvhd1 = box("mvhd", Array[Byte](1, 0, 0, 0) ++ u64(0) ++ u64(0) ++
      u32(90000) ++ u64(123456789L) ++ new Array[Byte](80))
    val buf = ftyp ++ box("moov", mvhd1)
    val c = Mp4.census(buf).get
    assert(c.timescale == 90000 && c.duration == 123456789L)
    assert(c.durationMs == 123456789L * 1000 / 90000)
  }

  test("largesize mdat: 64-bit size honored, flag reported") {
    val payload = new Array[Byte](25)
    val mdat = u32(1) ++ tag("mdat") ++ u64(16L + payload.length) ++ payload
    val buf = ftyp ++ box("moov", mvhdV0(600, 600)) ++ mdat
    val c = Mp4.census(buf).get
    assert(c.usesLargesize && c.mdatBytes == 25)
    assert(c.totalBytes == buf.length.toLong)
  }

  test("size==0 box extends to end of file") {
    val buf = ftyp ++ (u32(0) ++ tag("mdat") ++ new Array[Byte](37))
    val c = Mp4.census(buf).get
    assert(c.mdatBytes == 37 && c.nTop == 2)
  }

  test("hostile: lying sizes never trusted — oversize, undersize, " +
       "truncation, huge largesize all degrade to None") {
    val good = ftyp ++ box("moov", mvhdV0(1000, 1000))
    // declared size past the buffer
    val over = ftyp ++ (u32(1 << 20) ++ tag("mdat") ++ new Array[Byte](8))
    assert(Mp4.census(over).isEmpty)
    // size below the 8-byte header
    val under = ftyp ++ (u32(4) ++ tag("mdat"))
    assert(Mp4.census(under).isEmpty)
    // truncated mid-box
    assert(Mp4.census(good.dropRight(5)).isEmpty)
    // largesize ~2^62 — must fail bounds, not allocate or wrap
    val lying = ftyp ++ (u32(1) ++ tag("mdat") ++ u64(1L << 62))
    assert(Mp4.census(lying).isEmpty)
    // non-printable FourCC
    val junkTag = ftyp ++ (u32(12) ++ Array[Byte](1, 2, 3, 4) ++ u32(0))
    assert(Mp4.census(junkTag).isEmpty)
    // not ISO-BMFF at all
    assert(Mp4.census("plain text, no boxes here".getBytes).isEmpty)
    assert(Mp4.census(Array.emptyByteArray).isEmpty)
  }

  test("hostile: self-nesting past the depth cap is rejected, not walked") {
    // moov nested 20 deep, innermost a free leaf
    var inner: Array[Byte] = box("free", Array.emptyByteArray)
    (1 to 20).foreach(_ => inner = box("moov", inner))
    assert(Mp4.census(ftyp ++ inner).isEmpty)
  }

  test("byte-flip sweep: census never throws on corrupted trees") {
    val base = ftyp ++ box("moov", mvhdV0(1000, 777) ++ box("trak", tkhd)) ++
      box("mdat", Array.tabulate(30)(i => (i * 7).toByte))
    base.indices.foreach { i =>
      val mut = base.clone(); mut(i) = (mut(i) ^ 0x5A).toByte
      Mp4.census(mut) // must not throw; None or a different census both fine
    }
  }

  test("round-trip: the synthesizer's tree re-derives through the walker " +
       "with the oracle's arithmetic") {
    Seq("a", "hello world", "x" * 97, "graft engine round 11",
        "éè multi-byte utf8", "y" * 1000).foreach { text =>
      val bytes = text.getBytes("UTF-8")
      val nb = bytes.length
      val c = Mp4.census(
        graft.operators.Multimodal.synthMp4(bytes)).get
      val nt = 1 + nb % 3
      assert(c.nBoxes == 5 + 2 * nt && c.nTop == 4 && c.maxDepth == 3)
      assert(c.nTraks == nt)
      assert(c.timescale == 1000L * (1 + nb % 4))
      assert(c.duration == 512L + (nb.toLong * 7) % 4096)
      assert(c.durationMs == c.duration * 1000 / c.timescale)
      assert(c.mdatBytes == 8 + nb % 50 && c.freeBytes == nb % 9)
      assert(c.usesLargesize == (nb % 5 == 0))
      assert(c.totalBytes ==
        16L + 8 + (if (nb % 2 == 1) 120 else 108) + nt * 100 +
          8 + nb % 9 + (if (nb % 5 == 0) 16 else 8) + (8 + nb % 50))
    }
  }

  test("isMp4 detects the ftyp signature and nothing else") {
    assert(Mp4.isMp4(ftyp ++ box("mdat", new Array[Byte](4))))
    assert(!Mp4.isMp4("RIFF....WAVE".getBytes))
    assert(!Mp4.isMp4(Array.emptyByteArray))
  }
}
