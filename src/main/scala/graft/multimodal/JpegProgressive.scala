package graft.multimodal

/** Hand-written PROGRESSIVE JPEG decoder (ITU-T T.81 / ISO 10918-1
  * Annex G, public spec) — closes the last documented cut in the
  * image-codec family (baseline landed in round 10; progressive
  * streams returned None until now). Scope mirrors [[Jpeg]]: Huffman
  * entropy coding, 8-bit samples, 1 or 3 components with 1×1 sampling
  * factors on every component (grayscale always; color only when
  * 4:4:4); arithmetic coding and 12-bit precision return None.
  *
  * The full Annex G feature set is implemented, because the
  * INDEPENDENT encoder exercised in specs and the
  * `multimodal_jpeg_prog` query — the JDK's ImageIO writer in
  * `MODE_DEFAULT` progressive mode (native IJG libjpeg scan script) —
  * emits all of it: spectral selection (G.1.1.1.1: AC scans are
  * single-component bands [Ss..Se]), successive approximation in BOTH
  * directions (DC first scan at point transform Al with a later
  * one-bit-per-block refinement scan; AC first scans at Al=2 refined
  * twice), EOB runs (G.1.2.2: EOBn symbols span up to 2^14 blocks),
  * and interleaved DC scans over multi-component frames.
  *
  * Decoding is two-phase, per G.2: every scan accumulates into a
  * per-component QUANTIZED-coefficient raster (zig-zag index order —
  * successive approximation is defined on quantized values), and only
  * after the last scan does the pipeline dequantize + IDCT + color
  * convert, reusing the baseline decoder's A.3.3 IDCT and JFIF
  * conversion so a stream whose scans complete reconstructs
  * bit-identically to the same coefficients decoded as baseline.
  *
  * Robustness contract (the [[Jpeg]]/[[Mp3]]/[[Mp4]] discipline):
  * corrupt or hostile input degrades to None, never throws, never
  * hangs (every scan walks a bounded MCU count; the bit reader pads
  * with zero bits at segment end), and nothing is allocated from
  * DECLARED sizes beyond the same 64 MB/component raster cap the
  * baseline decoder enforces.
  */
object JpegProgressive {

  import Jpeg.{Huff, BitReader, ZigZag, idct8x8, JpegImage}

  /** True for SOI-led streams whose first frame marker is SOF2 —
    * the progressive signature, without decoding anything. */
  def isProgressive(content: Array[Byte]): Boolean = {
    if (!Jpeg.isJpeg(content)) return false
    var pos = 2
    while (pos + 4 <= content.length) {
      if ((content(pos) & 0xFF) != 0xFF) return false
      val m = content(pos + 1) & 0xFF
      if (m == 0xC2) return true
      if ((m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC)
          || m == 0xDA || m == 0xD9) return false
      if (m == 0xD8 || m == 0x01 || (m >= 0xD0 && m <= 0xD7)) pos += 2
      else pos += 2 + (((content(pos + 2) & 0xFF) << 8) |
                       (content(pos + 3) & 0xFF))
    }
    false
  }

  def decode(content: Array[Byte]): Option[JpegImage] = {
    if (!Jpeg.isJpeg(content)) return None
    try decodeInner(content)
    catch { case _: Exception => None }
  }

  private def decodeInner(buf: Array[Byte]): Option[JpegImage] = {
    val quant = Array.ofDim[Int](4, 64)
    val dcTab = new Array[Huff](4)
    val acTab = new Array[Huff](4)
    var width = 0; var height = 0
    var nComp = 0
    var compQ: Array[Int] = null
    var compId: Array[Int] = null
    var restartInterval = 0
    // per component: quantized coefficients, zig-zag index order,
    // block-major — allocated at SOF2 once dimensions pass the cap
    var coefs: Array[Array[Int]] = null
    var blocksX = 0; var blocksY = 0
    var anyScan = false

    def u16(p: Int): Int = ((buf(p) & 0xFF) << 8) | (buf(p + 1) & 0xFF)

    var pos = 2 // past SOI
    var done = false
    while (!done && pos + 2 <= buf.length) {
      if ((buf(pos) & 0xFF) != 0xFF) return None
      val marker = buf(pos + 1) & 0xFF
      if (marker == 0xD9) { done = true } // EOI: finalize below
      else if (marker == 0xD8 || marker == 0x01 ||
               (marker >= 0xD0 && marker <= 0xD7)) {
        pos += 2
      } else {
        if (pos + 4 > buf.length) return None
        val len = u16(pos + 2)
        val seg = pos + 4
        if (seg + len - 2 > buf.length) return None
        marker match {
          case 0xDB => // DQT, natural-order storage like baseline
            var p = seg
            while (p < seg + len - 2) {
              val pq = (buf(p) >> 4) & 0xF
              val tq = buf(p) & 0xF
              if (pq != 0) return None
              var i = 0
              while (i < 64) {
                quant(tq)(ZigZag(i)) = buf(p + 1 + i) & 0xFF
                i += 1
              }
              p += 65
            }
          case 0xC4 => // DHT — progressive streams redefine slots
            var p = seg // between scans; later tables shadow earlier
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
          case 0xC2 => // SOF2: progressive DCT, Huffman
            if (buf(seg) != 8) return None // precision
            height = u16(seg + 1); width = u16(seg + 3)
            nComp = buf(seg + 5) & 0xFF
            if (nComp != 1 && nComp != 3) return None
            compId = new Array[Int](nComp)
            compQ = new Array[Int](nComp)
            var ci = 0
            while (ci < nComp) {
              val p = seg + 6 + 3 * ci
              compId(ci) = buf(p) & 0xFF
              if ((buf(p + 1) & 0xFF) != 0x11) return None // 1×1 only
              compQ(ci) = buf(p + 2) & 0xFF
              ci += 1
            }
            blocksX = (width + 7) / 8
            blocksY = (height + 7) / 8
            // untrusted SOF dims: same 64 MB/component raster cap as
            // baseline, applied BEFORE the (4× larger) Int coef plane
            val planeBytes = blocksX.toLong * 8L * blocksY.toLong * 8L
            if (planeBytes <= 0L || planeBytes * nComp > (1L << 26))
              return None
            coefs = Array.ofDim[Int](nComp, blocksX * blocksY * 64)
          case 0xC0 | 0xC1 | 0xC3 | 0xC5 | 0xC6 | 0xC7 |
               0xC9 | 0xCA | 0xCB | 0xCD | 0xCE | 0xCF =>
            return None // this decoder owns ONLY progressive frames
          case 0xDD => restartInterval = u16(seg)
          case 0xDA =>
            if (coefs == null) return None
            val ns = buf(seg) & 0xFF
            if (ns < 1 || ns > nComp) return None
            val scanComp = new Array[Int](ns)
            val scanDc = new Array[Int](ns)
            val scanAc = new Array[Int](ns)
            var k = 0
            while (k < ns) {
              val cs = buf(seg + 1 + 2 * k) & 0xFF
              val ci = compId.indexOf(cs)
              if (ci < 0) return None
              scanComp(k) = ci
              scanDc(k) = (buf(seg + 2 + 2 * k) >> 4) & 0xF
              scanAc(k) = buf(seg + 2 + 2 * k) & 0xF
              k += 1
            }
            val ss = buf(seg + 1 + 2 * ns) & 0xFF
            val se = buf(seg + 2 + 2 * ns) & 0xFF
            val ah = (buf(seg + 3 + 2 * ns) >> 4) & 0xF
            val al = buf(seg + 3 + 2 * ns) & 0xF
            val dataStart = seg + len - 2
            val end = decodeOneScan(buf, dataStart, coefs, blocksX,
              blocksY, scanComp, scanDc, scanAc, dcTab, acTab,
              ss, se, ah, al, restartInterval)
            if (end < 0) return None
            anyScan = true
            pos = end
          case _ => () // APPn/COM/DNL: skip
        }
        if (marker != 0xDA) pos += 2 + len
      }
    }
    if (!anyScan) return None
    finalizeImage(coefs, quant, compQ, width, height, nComp,
      blocksX, blocksY)
  }

  /** Decode one scan's entropy-coded segment into the coefficient
    * state. Returns the byte offset of the marker terminating the
    * scan, or -1 on a corrupt stream. */
  private def decodeOneScan(buf: Array[Byte], start: Int,
                            coefs: Array[Array[Int]],
                            blocksX: Int, blocksY: Int,
                            scanComp: Array[Int], scanDc: Array[Int],
                            scanAc: Array[Int],
                            dcTab: Array[Huff], acTab: Array[Huff],
                            ss: Int, se: Int, ah: Int, al: Int,
                            restartInterval: Int): Int = {
    val ns = scanComp.length
    if (ss == 0) { if (se != 0) return -1 } // DC scans are [0,0]
    else if (ns != 1 || se < ss || se > 63) return -1 // G.1.1.1.1
    if (al > 13 || ah > 13) return -1
    val r = new BitReader(buf, start)
    val pred = new Array[Int](ns)
    var eobrun = 0
    val nUnits = blocksX * blocksY // 1×1 factors: same raster per comp
    var unit = 0
    while (unit < nUnits) {
      if (restartInterval > 0 && unit > 0 &&
          unit % restartInterval == 0) {
        r.align(); r.hitMarker = false
        var p = r.pos
        while (p + 1 < buf.length &&
               !((buf(p) & 0xFF) == 0xFF &&
                 (buf(p + 1) & 0xFF) >= 0xD0 &&
                 (buf(p + 1) & 0xFF) <= 0xD7)) p += 1
        if (p + 1 >= buf.length) return -1
        r.pos = p + 2
        java.util.Arrays.fill(pred, 0)
        eobrun = 0
      }
      if (ss == 0) {
        // DC band: possibly interleaved; one block per comp per MCU
        var k = 0
        while (k < ns) {
          val ci = scanComp(k)
          val base = unit * 64
          if (ah == 0) { // first DC scan: DPCM at point transform al
            val dh = dcTab(scanDc(k))
            if (dh == null) return -1
            val t = r.huffDecode(dh)
            if (t < 0 || t > 15) return -1
            pred(k) += r.receiveExtend(t)
            coefs(ci)(base) = pred(k) << al
          } else { // refinement: one raw bit per block (G.1.2.1)
            if (r.bit() == 1) coefs(ci)(base) |= 1 << al
          }
          k += 1
        }
      } else {
        // AC band [ss..se], single component, zig-zag indices
        val ci = scanComp(0)
        val cf = coefs(ci)
        val base = unit * 64
        val ac = acTab(scanAc(0))
        if (ac == null) return -1
        if (ah == 0) {
          // first AC scan (G.1.2.2): runs of zeros + EOB runs
          if (eobrun > 0) eobrun -= 1
          else {
            var k = ss
            var eob = false
            while (k <= se && !eob) {
              val rs = r.huffDecode(ac)
              if (rs < 0) return -1
              val run = rs >> 4; val s = rs & 0xF
              if (s == 0) {
                if (run == 15) k += 16 // ZRL
                else {
                  eobrun = (1 << run) - 1
                  if (run > 0) eobrun += r.bitsN(run)
                  eob = true
                }
              } else {
                k += run
                if (k > se) return -1
                cf(base + k) = r.receiveExtend(s) << al
                k += 1
              }
            }
          }
        } else {
          // AC refinement (G.1.2.3): correction bits on nonzero
          // history, new ±1<<al coefficients on zero history
          def correct(idx: Int): Unit = {
            val v = cf(idx)
            if (v != 0 && r.bit() == 1) {
              // add one successive-approximation bit toward the sign,
              // only if this bit of the magnitude is still clear
              // (hostile-stream guard; conforming streams always are)
              if (v > 0) { if ((v & (1 << al)) == 0) cf(idx) = v + (1 << al) }
              else if ((-v & (1 << al)) == 0) cf(idx) = v - (1 << al)
            }
          }
          if (eobrun > 0) {
            eobrun -= 1
            var k = ss
            while (k <= se) { correct(base + k); k += 1 }
          } else {
            var k = ss
            while (k <= se) {
              val rs = r.huffDecode(ac)
              if (rs < 0) return -1
              var run = rs >> 4; val s = rs & 0xF
              var newval = 0
              if (s == 0) {
                if (run != 15) { // EOBn: finish this block with
                  eobrun = (1 << run) - 1 // corrections only
                  if (run > 0) eobrun += r.bitsN(run)
                  while (k <= se) { correct(base + k); k += 1 }
                }
                // run == 15: ZRL — skip 16 zero-history positions
              } else {
                if (s != 1) return -1 // refinement sends ±1 only
                newval = if (r.bit() == 1) 1 << al else -(1 << al)
              }
              if (k <= se) {
                // advance over `run` zero-history positions,
                // consuming correction bits on nonzero history
                var placed = false
                while (k <= se && !placed) {
                  if (cf(base + k) != 0) correct(base + k)
                  else if (run == 0) {
                    if (newval != 0) { cf(base + k) = newval }
                    placed = true
                  } else run -= 1
                  k += 1
                }
                if (newval != 0 && !placed) return -1 // ran off band
              }
            }
          }
        }
      }
      unit += 1
    }
    // the terminating marker position: first FF followed by a real
    // (non-stuffing, non-restart) marker at or after the reader
    var p = r.pos
    while (p + 1 < buf.length &&
           !((buf(p) & 0xFF) == 0xFF && {
             val m = buf(p + 1) & 0xFF
             m != 0x00 && !(m >= 0xD0 && m <= 0xD7)
           })) p += 1
    if (p + 1 >= buf.length) -1 else p
  }

  /** Dequantize + IDCT + assemble — the baseline pipeline applied to
    * the accumulated coefficient rasters. */
  private def finalizeImage(coefs: Array[Array[Int]],
                            quant: Array[Array[Int]], compQ: Array[Int],
                            width: Int, height: Int, nComp: Int,
                            blocksX: Int, blocksY: Int): Option[JpegImage] = {
    val planes = Array.ofDim[Byte](nComp, blocksX * 8 * blocksY * 8)
    val natural = new Array[Int](64)
    val block = new Array[Int](64)
    val stride = blocksX * 8
    var ci = 0
    while (ci < nComp) {
      val q = quant(compQ(ci))
      val cf = coefs(ci)
      val plane = planes(ci)
      var b = 0
      val nBlocks = blocksX * blocksY
      while (b < nBlocks) {
        java.util.Arrays.fill(natural, 0)
        var k = 0
        while (k < 64) {
          val v = cf(b * 64 + k)
          if (v != 0) natural(ZigZag(k)) = v * q(ZigZag(k))
          k += 1
        }
        idct8x8(natural, block)
        val by = b / blocksX; val bx = b % blocksX
        var y = 0
        while (y < 8) {
          val base = (by * 8 + y) * stride + bx * 8
          var x = 0
          while (x < 8) {
            plane(base + x) = block(y * 8 + x).toByte
            x += 1
          }
          y += 1
        }
        b += 1
      }
      ci += 1
    }
    val dcQ = quant(compQ(0))(0)
    if (nComp == 1) {
      val out = new Array[Byte](width * height)
      var y = 0
      while (y < height) {
        System.arraycopy(planes(0), y * stride, out, y * width, width)
        y += 1
      }
      Some(JpegImage(width, height, 1, out, dcQ))
    } else {
      val out = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val i = y * stride + x
          val yy = planes(0)(i) & 0xFF
          val cb = (planes(1)(i) & 0xFF) - 128
          val cr = (planes(2)(i) & 0xFF) - 128
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
