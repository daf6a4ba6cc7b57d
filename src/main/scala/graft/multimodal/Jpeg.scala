package graft.multimodal

/** Hand-written BASELINE JPEG decoder (ITU-T T.81 / ISO 10918-1,
  * public spec) — closes the one declared codec stub (VERDICT r9 task
  * 3). Scope: baseline sequential DCT, Huffman entropy coding, 8-bit
  * samples, 1 or 3 components with no chroma subsampling beyond what
  * [[decode]] checks (h/v factors equal across components); restart
  * markers handled. Progressive/arithmetic/12-bit streams return None.
  *
  * The INDEPENDENT encoder in specs and the `multimodal_jpeg` query is
  * the JDK's ImageIO JPEG writer (native IJG libjpeg behind
  * `com.sun.imageio.plugins.jpeg`) — their encoder, this decoder, so
  * the round trip crosses two implementations like the BMP/WAV paths.
  * Two-tier verification (JPEG is lossy, so the BMP luma-identity
  * trick doesn't transfer directly):
  *
  *  - EXACT tier (the oracle query): images built from uniform 8×8
  *    blocks have one nonzero DCT coefficient (DC = 8·(v−128),
  *    computed exactly by any conforming FDCT), so the whole lossy
  *    chain collapses to integer arithmetic — quantize
  *    round-half-away(8·(v−128)/Q), dequantize ·Q, IDCT-descale
  *    (x+4)>>3, level-shift +128, clamp — that a SQL oracle predicts
  *    per block from the source byte and the (generated-oracle
  *    inlined) DC quant value parsed from the stream itself.
  *  - TOLERANCE tier (JpegSpec): arbitrary images decoded by this
  *    decoder vs the JDK's own READER agree within the T.81 Annex A
  *    IDCT mismatch allowance (spec-permitted per-sample variance
  *    between conforming IDCTs).
  *
  * All bit-twiddling below follows the spec text (F.2 decode
  * procedures, A.3.3 IDCT, Annex K tables are only on the encoder
  * side), not any existing decoder's source.
  */
object Jpeg {

  /** Decoded image: gray (1 comp) or RGB (3 comps, row-major
    * interleaved), plus the DC quantization value of component 0 —
    * surfaced because the exact-tier oracle needs it. */
  final case class JpegImage(width: Int, height: Int, nComp: Int,
                             pixels: Array[Byte], dcQuant: Int)

  /** True for SOI-led streams — the magic sniff, mirroring
    * [[Media.isImageContainer]]'s style. */
  def isJpeg(content: Array[Byte]): Boolean =
    content.length >= 3 && (content(0) & 0xFF) == 0xFF &&
      (content(1) & 0xFF) == 0xD8 && (content(2) & 0xFF) == 0xFF

  // ---- Huffman table: canonical per T.81 C.2 ----------------------
  /** (code lengths histogram BITS[1..16], values HUFFVAL) expanded to
    * flat lookup arrays via the spec's GenerateCodeTable (C.2). */
  private[multimodal] final class Huff(bits: Array[Int], vals: Array[Byte]) {
    // mincode/maxcode/valptr per code length, T.81 F.2.2.3 figure F.15
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l)
        k += bits(l)
        maxCode(l) = code - 1
        if (bits(l) == 0) maxCode(l) = -1
        code <<= 1
        l += 1
      }
    }
    def value(idx: Int): Int = vals(idx) & 0xFF
  }

  /** Entropy-coded-segment bit reader with byte-stuffing removal
    * (0xFF00 → 0xFF) and marker detection, per F.1.2.3. */
  private[multimodal] final class BitReader(buf: Array[Byte], var pos: Int) {
    private var bitBuf = 0
    private var bitCnt = 0
    var hitMarker = false

    def align(): Unit = { bitBuf = 0; bitCnt = 0 }

    private def fill(): Unit = {
      if (pos >= buf.length) { hitMarker = true; return }
      val b = buf(pos) & 0xFF
      if (b == 0xFF) {
        if (pos + 1 < buf.length && (buf(pos + 1) & 0xFF) == 0x00) {
          pos += 2
          bitBuf = (bitBuf << 8) | 0xFF
          bitCnt += 8
        } else { hitMarker = true } // a real marker terminates the ECS
      } else {
        pos += 1
        bitBuf = (bitBuf << 8) | b
        bitCnt += 8
      }
    }

    def bit(): Int = {
      if (bitCnt == 0) fill()
      if (hitMarker) return 0 // spec: pad with zero bits at segment end
      bitCnt -= 1
      (bitBuf >> bitCnt) & 1
    }

    def bitsN(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    /** DECODE procedure, F.2.2.3: walk code lengths 1..16. */
    def huffDecode(h: Huff): Int = {
      var code = bit()
      var l = 1
      while (l <= 16) {
        if (h.maxCode(l) >= 0 && code <= h.maxCode(l))
          return h.value(h.valPtr(l) + code - h.minCode(l))
        code = (code << 1) | bit()
        l += 1
      }
      -1 // corrupt stream
    }

    /** EXTEND (F.2.2.1): map magnitude-category bits to signed value. */
    def receiveExtend(s: Int): Int = {
      if (s == 0) return 0
      val v = bitsN(s)
      if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
    }
  }

  private[multimodal] val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** IDCT per A.3.3 — NOT a clone of any fast-IDCT factorization.
    * DC-ONLY blocks (the exact tier's entire population) take a pure
    * integer path, (dc·Q + 4) >> 3, the descale-round every conforming
    * IDCT agrees on — bit-exact, no floating point in the value chain.
    * General blocks use the direct double-precision cosine basis with
    * one final round; against the JDK's own reader this sits well
    * inside the T.81 Annex A per-sample conformance window (JpegSpec
    * asserts ≤1). */
  private[multimodal] def idct8x8(coef: Array[Int], out: Array[Int]): Unit = {
    var dcOnly = true
    var i = 1
    while (i < 64 && dcOnly) { if (coef(i) != 0) dcOnly = false; i += 1 }
    if (dcOnly) {
      val p0 = ((coef(0) + 4) >> 3) + 128
      val p = if (p0 < 0) 0 else if (p0 > 255) 255 else p0
      java.util.Arrays.fill(out, p)
      return
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            val c = coef(u * 8 + v)
            if (c != 0) acc += Basis(u)(y) * Basis(v)(x) * c
            v += 1
          }
          u += 1
        }
        // +128 level shift and clamp per A.3.1/A.3.5
        val p = Math.floor(acc + 0.5).toInt + 128
        out(y * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        x += 1
      }
      y += 1
    }
  }

  /** basis(u)(x) = c(u)·cos((2x+1)uπ/16)/2 — the product
    * Basis(u)(y)·Basis(v)(x) carries the spec's 1/4·c(u)c(v)
    * normalization, so Σ basis·basis·coef IS the reconstructed sample
    * (pre level-shift) with no further descale. */
  private val Basis: Array[Array[Double]] = Array.tabulate(8, 8) {
    (u, x) =>
      val cu = if (u == 0) 1.0 / Math.sqrt(2.0) else 1.0
      cu * Math.cos((2 * x + 1) * u * Math.PI / 16.0) / 2.0
  }

  /** Decode a baseline JPEG. None for non-JPEG magic, progressive/
    * arithmetic frames, bit depths ≠ 8, unsupported sampling, or a
    * corrupt stream. Grayscale decodes to 1 byte/pixel; YCbCr (3
    * comps, equal sampling factors i.e. 4:4:4) to interleaved RGB via
    * the JFIF full-range matrix. */
  def decode(content: Array[Byte]): Option[JpegImage] = {
    if (!isJpeg(content)) return None
    try decodeInner(content)
    catch { case _: Exception => None }
  }

  // one quant table slot per destination id, 0..3
  private def decodeInner(buf: Array[Byte]): Option[JpegImage] = {
    val quant = Array.ofDim[Int](4, 64)
    val dcTab = new Array[Huff](4)
    val acTab = new Array[Huff](4)
    var width = 0; var height = 0
    var nComp = 0
    // per component: id, h, v, quant slot
    var compQ: Array[Int] = null
    var compId: Array[Int] = null
    var restartInterval = 0

    def u16(p: Int): Int = ((buf(p) & 0xFF) << 8) | (buf(p + 1) & 0xFF)

    var pos = 2 // past SOI
    var sofSeen = false
    while (pos + 4 <= buf.length) {
      if ((buf(pos) & 0xFF) != 0xFF) return None
      val marker = buf(pos + 1) & 0xFF
      if (marker == 0xD8) { pos += 2 } // stray SOI
      else if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) {
        pos += 2 // standalone markers
      } else {
        val len = u16(pos + 2)
        val seg = pos + 4
        marker match {
          case 0xDB => // DQT
            var p = seg
            while (p < seg + len - 2) {
              val pq = (buf(p) >> 4) & 0xF
              val tq = buf(p) & 0xF
              if (pq != 0) return None // 16-bit tables: not baseline
              var i = 0
              while (i < 64) {
                quant(tq)(ZigZag(i)) = buf(p + 1 + i) & 0xFF
                i += 1
              }
              p += 65
            }
          case 0xC4 => // DHT
            var p = seg
            while (p < seg + len - 2) {
              val tc = (buf(p) >> 4) & 0xF
              val th = buf(p) & 0xF
              val bits = new Array[Int](17)
              var total = 0
              var l = 1
              while (l <= 16) {
                bits(l) = buf(p + l) & 0xFF; total += bits(l); l += 1
              }
              val vals = java.util.Arrays.copyOfRange(
                buf, p + 17, p + 17 + total)
              val h = new Huff(bits, vals)
              if (tc == 0) dcTab(th) = h else acTab(th) = h
              p += 17 + total
            }
          case 0xC0 => // SOF0: baseline
            if (buf(seg) != 8) return None // precision
            height = u16(seg + 1); width = u16(seg + 3)
            nComp = buf(seg + 5) & 0xFF
            if (nComp != 1 && nComp != 3) return None
            compId = new Array[Int](nComp)
            compQ = new Array[Int](nComp)
            var ci = 0
            var hv0 = -1
            while (ci < nComp) {
              val p = seg + 6 + 3 * ci
              compId(ci) = buf(p) & 0xFF
              val hv = buf(p + 1) & 0xFF
              if (hv0 < 0) hv0 = hv
              // 1×1 factors on every component: one 8×8 block per
              // component per MCU — the layout the scan walk below
              // implements (grayscale always; color only when 4:4:4)
              if (hv != hv0 || hv != 0x11) return None
              compQ(ci) = buf(p + 2) & 0xFF
              ci += 1
            }
            sofSeen = true
          case 0xC1 | 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 |
               0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
            return None // non-baseline frame types
          case 0xDD => restartInterval = u16(seg)
          case 0xDA => // SOS — entropy-coded data follows
            if (!sofSeen) return None
            val ns = buf(seg) & 0xFF
            if (ns != nComp) return None
            val scanDc = new Array[Int](nComp)
            val scanAc = new Array[Int](nComp)
            var k = 0
            while (k < ns) {
              val cs = buf(seg + 1 + 2 * k) & 0xFF
              val ci = compId.indexOf(cs)
              if (ci < 0) return None
              scanDc(ci) = (buf(seg + 2 + 2 * k) >> 4) & 0xF
              scanAc(ci) = buf(seg + 2 + 2 * k) & 0xF
              k += 1
            }
            return decodeScan(buf, seg + len - 2, width, height, nComp,
              compQ, quant, dcTab, acTab, scanDc, scanAc,
              restartInterval)
          case _ => () // APPn/COM/others: skip
        }
        pos += 2 + len
      }
    }
    None
  }

  /** The ECS walk: MCU raster, per-component DC DPCM + AC run-length,
    * restart-marker resync, IDCT per block. */
  private def decodeScan(buf: Array[Byte], start: Int,
                         width: Int, height: Int, nComp: Int,
                         compQ: Array[Int], quant: Array[Array[Int]],
                         dcTab: Array[Huff], acTab: Array[Huff],
                         scanDc: Array[Int], scanAc: Array[Int],
                         restartInterval: Int): Option[JpegImage] = {
    val r = new BitReader(buf, start)
    val mcusX = (width + 7) / 8
    val mcusY = (height + 7) / 8
    // The SOF dimensions are untrusted input: 65535×65535×3 would
    // allocate ~12 GB of planes before a single entropy bit is read,
    // and an OutOfMemoryError is an Error the decode() catch cannot
    // convert to None (ADVICE r10). Cap the raster at 64 MB/component
    // — far above any corpus blob this engine synthesizes — and reject
    // oversized declared dimensions as a corrupt stream.
    val planeBytes = mcusX.toLong * 8L * mcusY.toLong * 8L
    if (planeBytes <= 0L || planeBytes * nComp > (1L << 26)) return None
    val planes = Array.ofDim[Byte](nComp, mcusX * 8 * mcusY * 8)
    val pred = new Array[Int](nComp)
    val coef = new Array[Int](64)
    val block = new Array[Int](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        // resync: align to the RSTn marker and reset predictors
        r.align()
        r.hitMarker = false
        var p = r.pos
        while (p + 1 < buf.length &&
               !((buf(p) & 0xFF) == 0xFF &&
                 (buf(p + 1) & 0xFF) >= 0xD0 &&
                 (buf(p + 1) & 0xFF) <= 0xD7)) p += 1
        if (p + 1 >= buf.length) return None
        r.pos = p + 2
        java.util.Arrays.fill(pred, 0)
      }
      val my = mcu / mcusX
      val mx = mcu % mcusX
      var ci = 0
      while (ci < nComp) {
        java.util.Arrays.fill(coef, 0)
        val dh = dcTab(scanDc(ci)); val ah = acTab(scanAc(ci))
        if (dh == null || ah == null) return None
        val t = r.huffDecode(dh)
        if (t < 0 || t > 15) return None
        pred(ci) += r.receiveExtend(t)
        val q = quant(compQ(ci))
        coef(0) = pred(ci) * q(0)
        var k = 1
        var eob = false
        while (k < 64 && !eob) {
          val rs = r.huffDecode(ah)
          if (rs < 0) return None
          val rrrr = rs >> 4; val ssss = rs & 0xF
          if (ssss == 0) {
            if (rrrr == 15) k += 16 // ZRL
            else eob = true
          } else {
            k += rrrr
            if (k > 63) return None
            coef(ZigZag(k)) = r.receiveExtend(ssss) * q(ZigZag(k))
            k += 1
          }
        }
        idct8x8(coef, block)
        // place the 8×8 block into the component plane
        val plane = planes(ci)
        val stride = mcusX * 8
        var y = 0
        while (y < 8) {
          val base = (my * 8 + y) * stride + mx * 8
          var x = 0
          while (x < 8) {
            plane(base + x) = block(y * 8 + x).toByte
            x += 1
          }
          y += 1
        }
        ci += 1
      }
      mcu += 1
    }
    val dcQ = quant(compQ(0))(0)
    if (nComp == 1) {
      // crop the padded MCU raster to the declared dimensions
      val out = new Array[Byte](width * height)
      val stride = mcusX * 8
      var y = 0
      while (y < height) {
        System.arraycopy(planes(0), y * stride, out, y * width, width)
        y += 1
      }
      Some(JpegImage(width, height, 1, out, dcQ))
    } else {
      val out = new Array[Byte](width * height * 3)
      val stride = mcusX * 8
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val i = y * stride + x
          val yy = planes(0)(i) & 0xFF
          val cb = (planes(1)(i) & 0xFF) - 128
          val cr = (planes(2)(i) & 0xFF) - 128
          // JFIF full-range conversion, integer-rounded
          def clamp(v: Int): Byte =
            (if (v < 0) 0 else if (v > 255) 255 else v).toByte
          val o = (y * width + x) * 3
          out(o) = clamp(yy + ((91881 * cr + 32768) >> 16))
          out(o + 1) = clamp(yy - ((22554 * cb + 46802 * cr + 32768) >> 16))
          out(o + 2) = clamp(yy + ((116130 * cb + 32768) >> 16))
          x += 1
        }
        y += 1
      }
      Some(JpegImage(width, height, 3, out, dcQ))
    }
  }
}
