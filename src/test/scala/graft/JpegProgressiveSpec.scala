package graft

import graft.multimodal.{Jpeg, JpegProgressive}
import org.scalatest.funsuite.AnyFunSuite

/** Cross-implementation verification of the hand-written Annex G
  * progressive JPEG decoder: the ENCODER is the JDK's ImageIO writer
  * in progressive mode (native IJG libjpeg's 6-scan gray script —
  * spectral selection, successive approximation in both DC and AC,
  * EOB runs), their encoder, our decoder.
  *
  * Exact tier: successive approximation is LOSSLESS once every scan
  * lands, so a progressive stream reconstructs the same quantized
  * coefficients as the baseline encode of the same image — decoded
  * pixels must be bit-identical to [[Jpeg]]'s baseline decode.
  * Tolerance tier: against the JDK's own reader on the same
  * progressive bytes, within the T.81 Annex A per-sample IDCT window.
  */
class JpegProgressiveSpec extends AnyFunSuite {

  private def grayImage(w: Int, h: Int)(lum: (Int, Int) => Int)
      : java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    for (y <- 0 until h; x <- 0 until w) r.setSample(x, y, 0, lum(x, y) & 0xFF)
    img
  }

  private def encode(img: java.awt.image.BufferedImage,
                     progressive: Boolean,
                     quality: Float = 0.5f): Array[Byte] = {
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = w.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    if (progressive)
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); w.dispose()
    bos.toByteArray
  }

  private def maxDiffVsJdk(bytes: Array[Byte]): Int = {
    val ours = JpegProgressive.decode(bytes).get
    val theirs = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until ours.height; x <- 0 until ours.width)
      maxDiff = math.max(maxDiff, math.abs(
        (ours.pixels(y * ours.width + x) & 0xFF) -
          theirs.getRaster.getSample(x, y, 0)))
    maxDiff
  }

  test("gradient image: progressive decode within the Annex A window " +
       "of the JDK reader, across qualities and odd dimensions") {
    for ((w, h, q) <- Seq((37, 29, 0.5f), (64, 64, 0.9f), (8, 8, 0.3f),
                          (17, 51, 0.75f))) {
      val prog = encode(grayImage(w, h)((x, y) => x * 7 + y * 13), true, q)
      assert(JpegProgressive.isProgressive(prog))
      assert(maxDiffVsJdk(prog) <= 2, s"dims ${w}x$h q=$q")
    }
  }

  test("noise image exercises EOB runs and AC refinement heavily; " +
       "still inside the conformance window") {
    val rnd = new scala.util.Random(42)
    val prog = encode(
      grayImage(48, 40)((_, _) => rnd.nextInt(256)), progressive = true)
    assert(maxDiffVsJdk(prog) <= 2)
  }

  test("uniform blocks: progressive pixels BIT-EQUAL the baseline " +
       "decode — successive approximation is lossless when complete") {
    for (seed <- Seq(1, 7, 23)) {
      val rnd = new scala.util.Random(seed)
      val lv = Array.fill(6 * 5)(rnd.nextInt(256))
      def img = grayImage(48, 40)((x, y) => lv((y / 8) * 6 + x / 8))
      val base = Jpeg.decode(encode(img, progressive = false)).get
      val prog = JpegProgressive.decode(encode(img, progressive = true)).get
      assert(prog.width == base.width && prog.height == base.height)
      assert(java.util.Arrays.equals(prog.pixels, base.pixels),
        s"seed $seed: progressive and baseline pixels must be identical")
    }
  }

  test("frame-type ownership: baseline streams are None here, " +
       "progressive streams are None in the baseline decoder") {
    val img = grayImage(24, 24)((x, y) => (x + y) % 256)
    val base = encode(img, progressive = false)
    val prog = encode(img, progressive = true)
    assert(JpegProgressive.decode(base).isEmpty)
    assert(!JpegProgressive.isProgressive(base))
    assert(Jpeg.decode(prog).isEmpty)
    assert(JpegProgressive.isProgressive(prog))
  }

  test("hostile: corrupt/truncated/oversized streams degrade to None, " +
       "never throw") {
    val img = grayImage(32, 24)((x, y) => x * 11 + y * 3)
    val prog = encode(img, progressive = true)
    // truncation sweep — every prefix must return cleanly
    for (n <- 2 until prog.length by 11)
      JpegProgressive.decode(prog.take(n))
    // byte-flip sweep through headers and entropy data
    for (i <- 0 until prog.length by 5) {
      val mut = prog.clone(); mut(i) = (mut(i) ^ 0x5A).toByte
      JpegProgressive.decode(mut)
    }
    assert(JpegProgressive.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(JpegProgressive.decode("not a jpeg at all".getBytes).isEmpty)
    // hostile SOF2 dimensions must be rejected BEFORE the coefficient
    // rasters are allocated (the baseline ADVICE-r10 guard, applied to
    // the 4×-larger Int planes)
    val huge = prog.clone()
    var sof = -1
    var q = 2
    while (sof < 0 && q + 3 < huge.length) {
      if ((huge(q) & 0xFF) == 0xFF && (huge(q + 1) & 0xFF) == 0xC2) sof = q
      else {
        val len = ((huge(q + 2) & 0xFF) << 8) | (huge(q + 3) & 0xFF)
        q += 2 + len
      }
    }
    assert(sof > 0, "test stream must contain an SOF2 marker")
    huge(sof + 5) = 0xFF.toByte; huge(sof + 6) = 0xFF.toByte // height
    huge(sof + 7) = 0xFF.toByte; huge(sof + 8) = 0xFF.toByte // width
    assert(JpegProgressive.decode(huge).isEmpty)
  }

  test("query-side synthesis round-trips: synthJpegProg streams decode " +
       "bit-equal to the baseline path and carry the 6-scan script") {
    import graft.operators.Multimodal
    for (text <- Seq("a", "hello progressive world", "x" * 131)) {
      val bytes = text.getBytes("UTF-8")
      val (bw, bh, prog) = Multimodal.synthJpegProg(bytes)
      val (_, _, base) = Multimodal.synthJpeg(bytes)
      val dp = JpegProgressive.decode(prog).get
      val db = Jpeg.decode(base).get
      assert(dp.width == bw * 8 && dp.height == bh * 8)
      assert(java.util.Arrays.equals(dp.pixels, db.pixels))
      var nScans = 0
      for (i <- 0 until prog.length - 1)
        if ((prog(i) & 0xFF) == 0xFF && (prog(i + 1) & 0xFF) == 0xDA)
          nScans += 1
      assert(nScans == 6, s"JDK gray scan script drifted: $nScans scans")
    }
  }
}
