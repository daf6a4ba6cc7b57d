package graft

import graft.multimodal.Mp3
import org.scalatest.funsuite.AnyFunSuite

/** The MP3 frame-header walker: ISO 11172-3 arithmetic, sync-scan
  * robustness, ID3v2 skip, and round-trip against the synthesizer. */
class Mp3Spec extends AnyFunSuite {

  private def frame(brIdx: Int, srIdx: Int, pad: Int,
                    fill: Int = 0x55): Array[Byte] = {
    val len = Mp3.frameLen(Mp3.KbpsByIndex(brIdx), Mp3.HzByIndex(srIdx),
      pad == 1)
    val out = new Array[Byte](len)
    out(0) = 0xFF.toByte; out(1) = 0xFB.toByte
    out(2) = ((brIdx << 4) | (srIdx << 2) | (pad << 1)).toByte
    out(3) = 0
    java.util.Arrays.fill(out, 4, len, fill.toByte)
    out
  }

  test("frame length matches the §2.4.3.1 formula on known profiles") {
    // 128 kbps @ 44100: floor(144·128000/44100) = 417 (+1 padded)
    assert(Mp3.frameLen(128, 44100, padded = false) == 417)
    assert(Mp3.frameLen(128, 44100, padded = true) == 418)
    // 320 kbps @ 32000: 144·320000/32000 = 1440
    assert(Mp3.frameLen(320, 32000, padded = false) == 1440)
    // 32 kbps @ 48000: 144·32000/48000 = 96
    assert(Mp3.frameLen(32, 48000, padded = false) == 96)
  }

  test("census walks a CBR chain and reports the stream properties") {
    val buf = frame(9, 0, 0) ++ frame(9, 0, 1) ++ frame(9, 0, 0)
    val c = Mp3.census(buf).get
    assert(c.nFrames == 3 && c.sampleRateHz == 44100)
    assert(c.minKbps == 128 && c.maxKbps == 128 && c.nBitrates == 1)
    assert(c.isCbr && c.nPadded == 1)
    assert(c.audioBytes == buf.length.toLong && c.junkBytes == 0)
    assert(c.samples == 3L * 1152)
  }

  test("VBR chain: distinct bitrates flip isCbr, min/max track the set") {
    val buf = frame(1, 1, 0) ++ frame(14, 1, 0) ++ frame(5, 1, 0)
    val c = Mp3.census(buf).get
    assert(c.nFrames == 3 && !c.isCbr && c.nBitrates == 3)
    assert(c.minKbps == 32 && c.maxKbps == 320 && c.sampleRateHz == 48000)
  }

  test("sync scan resyncs over junk — including bytes that LOOK like " +
       "sync but carry invalid indices") {
    val junk = Array[Byte](0x12, 0xFF.toByte, 0xFB.toByte, 0xF0.toByte,
      0xFF.toByte, 0x00, 0x7E) // brIdx 15 = forbidden → resync
    val buf = junk ++ frame(3, 2, 0) ++ junk ++ frame(3, 2, 1) ++
      Array[Byte](1, 2)
    val c = Mp3.census(buf).get
    assert(c.nFrames == 2, s"expected resync to find both frames: $c")
    assert(c.junkBytes == 2L * junk.length + 2)
    assert(c.audioBytes + c.junkBytes == buf.length.toLong)
  }

  test("ID3v2 tag is skipped via its syncsafe size and counted as junk") {
    // tag body deliberately contains a fake frame sync — the skip must
    // jump it, not parse it
    val body = Array.fill[Byte](130)(0x41) // > 127: exercises 2 syncsafe bytes
    body(10) = 0xFF.toByte; body(11) = 0xFB.toByte; body(12) = 0x94.toByte
    val tag = Array[Byte]('I', 'D', '3', 4, 0, 0,
      ((body.length >> 21) & 0x7F).toByte, ((body.length >> 14) & 0x7F).toByte,
      ((body.length >> 7) & 0x7F).toByte, (body.length & 0x7F).toByte) ++ body
    val buf = tag ++ frame(7, 0, 0)
    val c = Mp3.census(buf).get
    assert(c.nFrames == 1 && c.junkBytes == tag.length.toLong)
  }

  test("corrupt/hostile streams degrade to None or fewer frames, never throw") {
    assert(Mp3.census(null).isEmpty)
    assert(Mp3.census(Array.empty[Byte]).isEmpty)
    assert(Mp3.census(Array[Byte](0xFF.toByte, 0xFB.toByte)).isEmpty)
    // truncated final frame is junk, not a frame
    val one = frame(9, 0, 0)
    val c = Mp3.census(one ++ one.take(40)).get
    assert(c.nFrames == 1 && c.junkBytes == 40)
    // byte-flip sweep over a real chain: Option either way, no throw
    val buf = frame(2, 1, 1) ++ frame(11, 2, 0) ++ frame(6, 0, 1)
    for (i <- buf.indices by 3) {
      val mut = buf.clone(); mut(i) = (mut(i) ^ 0x5A).toByte
      Mp3.census(mut)
    }
    // ID3 declaring a size past the buffer → None, no allocation
    val lie = Array[Byte]('I', 'D', '3', 4, 0, 0,
      0x7F, 0x7F, 0x7F, 0x7F)
    assert(Mp3.census(lie ++ frame(9, 0, 0)).isEmpty)
  }

  test("round trip: synthesizer streams parse back to the predicted census") {
    for (text <- Seq("a", "ab", "hello world", "x" * 257,
                     new String(Array.tabulate(97)(i => (i % 251 + 1).toChar)))) {
      val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val nb = bytes.length
      val c = Mp3.census(graft.operators.Multimodal.synthMp3(bytes)).get
      assert(c.nFrames == 3 + nb % 6, s"frames for nb=$nb")
      assert(c.sampleRateHz == Mp3.HzByIndex(nb % 3))
      assert(c.junkBytes == (nb % 7 + nb % 4).toLong)
      assert(c.samples == c.nFrames.toLong * 1152)
      if (nb % 2 == 0) assert(c.isCbr, s"even-length doc must be CBR (nb=$nb)")
    }
  }

  test("isMp3 magic sniff: frame sync or ID3, nothing else") {
    assert(Mp3.isMp3(frame(9, 0, 0)))
    assert(Mp3.isMp3("ID3junk".getBytes))
    assert(!Mp3.isMp3("RIFFxxxxWAVE".getBytes))
    assert(!Mp3.isMp3(Array[Byte](0x89.toByte, 'P', 'N', 'G')))
    assert(!Mp3.isMp3(Array.empty[Byte]))
  }
}
