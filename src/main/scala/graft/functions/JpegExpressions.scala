package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Baseline JPEG pixel decode — the JPEG sibling of [[PngPixelStats]]'s
  * inflate+unfilter pipeline, closing the codec asymmetry where
  * `extractWarcMedia` harvests every image-typed body but only PNGs got
  * quality signals and perceptual hashes: a real crawl is mostly JPEG.
  *
  * Spec-derived from ITU-T T.81 (the same public spec the
  * [[graft.multimodal.JpegFixtures]] ENCODER was written from — this
  * decoder and that encoder share no code, so fixtures round-trip through
  * two independent implementations): marker walk (DQT/DHT/SOF/DRI/SOS,
  * APPn/COM skipped by length), canonical Huffman decode (F.2.2.3
  * mincode/maxcode/valptr), run-length AC with ZRL/EOB, dequantization in
  * zigzag order, and a double-precision separable IDCT (A.3.3) with
  * round-half-up and clamp. Supported: baseline and extended-sequential
  * Huffman frames (SOF0/SOF1) AND progressive frames (SOF2 — T.81 G.2:
  * spectral selection, successive approximation with DC/AC first and
  * refinement scans, EOB-run coding, interleaved DC scans,
  * per-scan restart intervals; coefficients accumulate unquantized
  * across scans and dequantize + IDCT once at EOI), 8-bit precision,
  * 1 component (grayscale) or 3 components (YCbCr → RGB by the JFIF
  * formulas), sampling factors 1..4 with box (nearest) chroma
  * upsampling, multi-table DQT/DHT segments, FF-stuffing, fill bytes.
  * Anything else — arithmetic coding, lossless, 12-bit, 4-component
  * CMYK, truncated entropy data, a progressive stream missing its EOI —
  * returns null, never throws.
  *
  * Exactness contract for the oracle: a uniform 8×8 block with all-ones
  * quantization is DC-only, and the separable IDCT of a DC-only block is
  * `dc/8` to within 1e-13 (the rounding step absorbs it), so
  * [[graft.multimodal.JpegFixtures]] mosaics decode BIT-EXACTLY and a
  * DuckDB oracle can replay every downstream signal from the block
  * values — the q89 convention. General JPEGs decode to within normal
  * cross-decoder IDCT tolerance (pinned against `javax.imageio` in
  * MultimodalSpec).
  *
  * Scale shape: one native call per row inside whole-stage codegen (see
  * [[ImagePixelStats]]); decode buffers are bounded ([[MaxPlaneBytes]])
  * so a forged SOF can never allocate unboundedly — a poisoned blob must
  * fail to NULL, not OOM an executor. */
object JpegDecoder {

  /** Cap on the sum of component-plane buffers (64 MiB — matches
    * [[PngPixelStats]]'s MaxRawBytes): a forged SOF declaring huge dims
    * returns null before allocating. */
  private val MaxPlaneBytes = 1 << 26

  /** Zigzag order: ZZ(k) = natural (row-major) index of the k-th
    * coefficient in transmission order (T.81 Figure 5). */
  private[functions] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** `cosTab(x)(u) = (Cu/2)·cos((2x+1)uπ/16)` — the separable IDCT kernel
    * (T.81 A.3.3), precomputed once. */
  private val CosTab: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    cu / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Decoded image: 8-bit interleaved samples, `ch` ∈ {1, 3}. */
  final class Decoded(val w: Int, val h: Int, val ch: Int, val samples: Array[Byte])

  /** Canonical Huffman table per T.81 F.2.2.3. `maxcode(l) = -1` marks
    * lengths with no codes. */
  private final class HuffTable(bits: Array[Int], val vals: Array[Int]) {
    val mincode = new Array[Int](17)
    val maxcode = Array.fill(17)(-1)
    val valptr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valptr(l) = k
          mincode(l) = code
          code += bits(l - 1)
          k += bits(l - 1)
          maxcode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
  }

  /** Entropy-segment bit reader with T.81 F.1.2.3 stuffing (FF 00 →
    * literal FF) — a marker byte mid-read marks the segment's end;
    * further bit requests set `underrun` (truncated stream → null). */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    var underrun = false

    def nextBit(): Int = {
      if (n == 0) {
        if (pos >= b.length) { underrun = true; return 0 }
        var v = b(pos) & 0xff
        if (v == 0xff) {
          val nx = if (pos + 1 < b.length) b(pos + 1) & 0xff else -1
          if (nx == 0) pos += 2 // stuffed FF
          else { underrun = true; return 0 } // marker: entropy data ends here
        } else pos += 1
        acc = v
        n = 8
      }
      n -= 1
      (acc >>> n) & 1
    }

    def receive(s: Int): Int = {
      var v = 0
      var i = 0
      while (i < s) { v = (v << 1) | nextBit(); i += 1 }
      v
    }

    /** Byte-align and consume an expected RSTn marker (F.2.1.3.1); false
      * when the stream disagrees. */
    def restart(): Boolean = {
      n = 0
      if (pos + 2 > b.length || (b(pos) & 0xff) != 0xff) return false
      val m = b(pos + 1) & 0xff
      if (m < 0xd0 || m > 0xd7) return false
      pos += 2
      true
    }
  }

  private def huffDecode(r: BitReader, t: HuffTable): Int = {
    var code = 0
    var l = 1
    while (l <= 16) {
      code = (code << 1) | r.nextBit()
      if (t.maxcode(l) >= 0 && code <= t.maxcode(l))
        return t.vals(t.valptr(l) + code - t.mincode(l))
      l += 1
    }
    -1 // no such code: corrupt stream
  }

  /** T.81 F.2.2.1 EXTEND: map a `s`-bit magnitude to its signed value. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)

  private final class Component {
    var id = 0
    var hSamp = 1
    var vSamp = 1
    var quantId = 0
    var dcTable = 0
    var acTable = 0
    var plane: Array[Byte] = null // padded to whole MCUs
    var planeW = 0
    var planeH = 0
    var pred = 0 // DC predictor
    // progressive (SOF2) state: the unquantized natural-order coefficient
    // store, sized to the MCU-padded block grid (bwPad×bhPad); bw×bh is
    // the component's true block grid (T.81 A.2.2 non-interleaved order)
    var coefs: Array[Int] = null
    var bw = 0
    var bh = 0
    var bwPad = 0
    var bhPad = 0
  }

  /** Decode a baseline JPEG payload, or null for anything unsupported /
    * malformed. */
  def decode(b: Array[Byte]): Decoded = {
    if (b == null || b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return null
    val quant = new Array[Array[Int]](4) // stored in zigzag order
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var w = 0
    var h = 0
    var restartInterval = 0
    var progressive = false
    var scans = 0 // progressive scans decoded so far
    var mcusX = 0
    var mcusY = 0

    var i = 2
    while (i + 1 < b.length) {
      if (u8(b, i) != 0xff) return null // desynchronized
      var m = u8(b, i + 1)
      while (m == 0xff && i + 2 < b.length) { i += 1; m = u8(b, i + 1) } // fill bytes
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { i += 2 } // standalone
      else if (m == 0xd9) { // EOI: progressive decode completes here
        return if (progressive && scans > 0)
          finishProgressive(comps, w, h, quant, mcusX, mcusY)
        else null // EOI before SOS (baseline) / before any scan
      }
      else {
        if (i + 3 >= b.length) return null
        val len = be16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return null
        val p = i + 4 // segment payload start
        val pEnd = i + 2 + len
        var iNext = i + 2 + len // progressive SOS overrides (entropy follows)
        m match {
          case 0xdb => // DQT: one or more (pq/tq, 64 entries) tables
            var q = p
            while (q < pEnd) {
              val pq = u8(b, q) >> 4
              val tq = u8(b, q) & 0x0f
              if (tq > 3 || pq > 1) return null
              val width = if (pq == 0) 1 else 2
              if (q + 1 + 64 * width > pEnd) return null
              val tab = new Array[Int](64)
              var k = 0
              while (k < 64) {
                tab(k) = if (pq == 0) u8(b, q + 1 + k) else be16(b, q + 1 + 2 * k)
                k += 1
              }
              quant(tq) = tab
              q += 1 + 64 * width
            }
          case 0xc4 => // DHT: one or more (tc/th, bits, vals) tables
            var q = p
            while (q < pEnd) {
              val tc = u8(b, q) >> 4
              val th = u8(b, q) & 0x0f
              if (tc > 1 || th > 3 || q + 17 > pEnd) return null
              val bits = Array.tabulate(16)(k => u8(b, q + 1 + k))
              val total = bits.sum
              if (total > 256 || q + 17 + total > pEnd) return null
              val vals = Array.tabulate(total)(k => u8(b, q + 17 + k))
              val tab = new HuffTable(bits, vals)
              if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
              q += 17 + total
            }
          case 0xc0 | 0xc1 | 0xc2 => // SOF0/1 sequential, SOF2 progressive
            if (comps != null) return null // second frame header
            if (len < 8 || u8(b, p) != 8) return null // 8-bit precision only
            h = be16(b, p + 1)
            w = be16(b, p + 3)
            val nf = u8(b, p + 5)
            if (w <= 0 || h <= 0 || (nf != 1 && nf != 3) || len < 8 + 3 * nf) return null
            comps = Array.fill(nf)(new Component)
            var c = 0
            while (c < nf) {
              val at = p + 6 + 3 * c
              comps(c).id = u8(b, at)
              comps(c).hSamp = u8(b, at + 1) >> 4
              comps(c).vSamp = u8(b, at + 1) & 0x0f
              comps(c).quantId = u8(b, at + 2)
              if (comps(c).hSamp < 1 || comps(c).hSamp > 4 ||
                comps(c).vSamp < 1 || comps(c).vSamp > 4 ||
                comps(c).quantId > 3) return null
              c += 1
            }
            if (m == 0xc2) {
              progressive = true
              // the coefficient store is allocated UP FRONT (scans write
              // into it): 4-byte coefficients, so the bound is a quarter
              // of the plane budget — 16M samples, plenty for any honest
              // crawl image, and a forged SOF2 still can't balloon memory
              val hMax = comps.map(_.hSamp).max
              val vMax = comps.map(_.vSamp).max
              mcusX = (w + 8 * hMax - 1) / (8 * hMax)
              mcusY = (h + 8 * vMax - 1) / (8 * vMax)
              var coefInts = 0L
              comps.foreach { cc =>
                cc.bwPad = mcusX * cc.hSamp
                cc.bhPad = mcusY * cc.vSamp
                val compW = (w * cc.hSamp + hMax - 1) / hMax
                val compH = (h * cc.vSamp + vMax - 1) / vMax
                cc.bw = (compW + 7) / 8
                cc.bh = (compH + 7) / 8
                coefInts += cc.bwPad.toLong * cc.bhPad * 64
              }
              if (coefInts * 4 > MaxPlaneBytes) return null
              comps.foreach(cc => cc.coefs = new Array[Int](cc.bwPad * cc.bhPad * 64))
            }
          case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
              0xcd | 0xce | 0xcf =>
            return null // lossless / arithmetic / differential: unsupported
          case 0xdd => // DRI
            if (len != 4) return null
            restartInterval = be16(b, p)
          case 0xda => // SOS: baseline decodes-and-finishes; progressive accumulates
            if (comps == null) return null
            val ns = u8(b, p)
            if (ns < 1 || ns > comps.length || len != 6 + 2 * ns) return null
            val scanComps = new Array[Component](ns)
            var c = 0
            while (c < ns) {
              val cs = u8(b, p + 1 + 2 * c)
              val comp = comps.find(_.id == cs).orNull
              if (comp == null) return null
              comp.dcTable = u8(b, p + 2 + 2 * c) >> 4
              comp.acTable = u8(b, p + 2 + 2 * c) & 0x0f
              if (comp.dcTable > 3 || comp.acTable > 3) return null
              scanComps(c) = comp
              c += 1
            }
            if (!progressive) {
              if (ns != comps.length) return null
              return decodeScan(b, pEnd, comps, w, h, quant, dcTabs, acTabs,
                restartInterval)
            }
            val ss = u8(b, p + 1 + 2 * ns)
            val se = u8(b, p + 2 + 2 * ns)
            val ahal = u8(b, p + 3 + 2 * ns)
            val next = decodeProgressiveScan(b, pEnd, scanComps,
              ss, se, ahal >> 4, ahal & 0x0f, restartInterval,
              mcusX, mcusY, dcTabs, acTabs)
            if (next < 0) return null
            scans += 1
            iNext = next
          case _ => () // APPn / COM / anything else: skip by length
        }
        i = iNext
      }
    }
    null // no SOS (baseline) / no EOI (progressive) reached
  }

  private def decodeScan(
      b: Array[Byte],
      scanStart: Int,
      comps: Array[Component],
      w: Int,
      h: Int,
      quant: Array[Array[Int]],
      dcTabs: Array[HuffTable],
      acTabs: Array[HuffTable],
      restartInterval: Int): Decoded = {
    val hMax = comps.map(_.hSamp).max
    val vMax = comps.map(_.vSamp).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    // allocate padded planes, bounded BEFORE any allocation
    var planeBytes = 0L
    comps.foreach { c =>
      c.planeW = mcusX * c.hSamp * 8
      c.planeH = mcusY * c.vSamp * 8
      planeBytes += c.planeW.toLong * c.planeH
      if (quant(c.quantId) == null) return null
    }
    if (planeBytes > MaxPlaneBytes ||
      w.toLong * h * comps.length > MaxPlaneBytes) return null
    comps.foreach(c => c.plane = new Array[Byte](c.planeW * c.planeH))

    val r = new BitReader(b, scanStart)
    val coef = new Array[Int](64) // natural order, dequantized
    val tmp = new Array[Double](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    var sinceRestart = 0
    while (mcu < nMcus) {
      if (restartInterval > 0 && sinceRestart == restartInterval) {
        if (!r.restart()) return null
        comps.foreach(_.pred = 0)
        sinceRestart = 0
      }
      val mcuX = mcu % mcusX
      val mcuY = mcu / mcusX
      var c = 0
      while (c < comps.length) {
        val comp = comps(c)
        val dcT = dcTabs(comp.dcTable)
        val acT = acTabs(comp.acTable)
        if (dcT == null || acT == null) return null
        val q = quant(comp.quantId)
        var v = 0
        while (v < comp.vSamp) {
          var hh = 0
          while (hh < comp.hSamp) {
            // ---- decode one block (T.81 F.2.2) ----
            java.util.Arrays.fill(coef, 0)
            val t = huffDecode(r, dcT)
            if (t < 0 || t > 15) return null
            comp.pred += extend(r.receive(t), t)
            coef(0) = comp.pred * q(0)
            var k = 1
            var open = true
            while (open && k < 64) {
              val rs = huffDecode(r, acT)
              if (rs < 0) return null
              val run = rs >> 4
              val size = rs & 0x0f
              if (size == 0) {
                if (run == 15) k += 16 // ZRL
                else open = false // EOB
              } else {
                k += run
                if (k > 63) return null
                coef(Zigzag(k)) = extend(r.receive(size), size) * q(k)
                k += 1
              }
            }
            if (r.underrun) return null // truncated entropy data
            idctBlock(coef, tmp, comp.plane, comp.planeW,
              (mcuX * comp.hSamp + hh) * 8, (mcuY * comp.vSamp + v) * 8)
            hh += 1
          }
          v += 1
        }
        c += 1
      }
      sinceRestart += 1
      mcu += 1
    }
    assemble(comps, w, h, hMax, vMax)
  }

  /** Separable exact-float IDCT (T.81 A.3.3) of one natural-order block,
    * level-shifted and clamped into `plane` at pixel (bx, by). Shared by
    * the sequential scan decoder and the progressive finish. */
  private def idctBlock(coef: Array[Int], tmp: Array[Double],
      plane: Array[Byte], planeW: Int, bx: Int, by: Int): Unit = {
    var x = 0
    while (x < 8) { // tmp(v*8+x) = Σu cosTab(x)(u) · coef(v*8+u)
      var vv = 0
      while (vv < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += CosTab(x)(u) * coef(vv * 8 + u); u += 1 }
        tmp(vv * 8 + x) = s
        vv += 1
      }
      x += 1
    }
    var y = 0
    while (y < 8) {
      val rowAt = (by + y) * planeW + bx
      var xx = 0
      while (xx < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) { s += CosTab(y)(vv) * tmp(vv * 8 + xx); vv += 1 }
        val px = math.round(s).toInt + 128
        plane(rowAt + xx) = (if (px < 0) 0 else if (px > 255) 255 else px).toByte
        xx += 1
      }
      y += 1
    }
  }

  /** Interleave decoded planes into the output sample array with box
    * (nearest) chroma upsampling — shared by both frame types. */
  private def assemble(comps: Array[Component], w: Int, h: Int,
      hMax: Int, vMax: Int): Decoded = {
    val nc = comps.length
    val out = new Array[Byte](w * h * nc)
    if (nc == 1) {
      val comp = comps(0)
      var y = 0
      while (y < h) {
        System.arraycopy(comp.plane, y * comp.planeW, out, y * w, w)
        y += 1
      }
    } else {
      val cy = comps(0); val cb = comps(1); val cr = comps(2)
      var y = 0
      while (y < h) {
        val yRow = (y * cy.vSamp / vMax) * cy.planeW
        val bRow = (y * cb.vSamp / vMax) * cb.planeW
        val rRow = (y * cr.vSamp / vMax) * cr.planeW
        var x = 0
        while (x < w) {
          val yy = u8(cy.plane, yRow + x * cy.hSamp / hMax)
          val pb = u8(cb.plane, bRow + x * cb.hSamp / hMax) - 128
          val pr = u8(cr.plane, rRow + x * cr.hSamp / hMax) - 128
          // JFIF YCbCr → RGB, round-half-up, clamp
          val rr = math.round(yy + 1.402 * pr).toInt
          val gg = math.round(yy - 0.344136 * pb - 0.714136 * pr).toInt
          val bb = math.round(yy + 1.772 * pb).toInt
          val at = (y * w + x) * 3
          out(at) = (if (rr < 0) 0 else if (rr > 255) 255 else rr).toByte
          out(at + 1) = (if (gg < 0) 0 else if (gg > 255) 255 else gg).toByte
          out(at + 2) = (if (bb < 0) 0 else if (bb > 255) 255 else bb).toByte
          x += 1
        }
        y += 1
      }
    }
    new Decoded(w, h, nc, out)
  }

  /** One progressive scan (T.81 G.2): DC first/refinement (interleaved
    * per A.2.3 when Ns > 1; the component's true block grid when Ns = 1),
    * AC first/refinement with EOB-run coding (G.1.2.2–G.1.2.3; AC scans
    * are single-component per G.1.1). Coefficients accumulate UNQUANTIZED
    * in each component's natural-order store; restart markers reset DC
    * predictors and the EOB run. Returns the position of the next marker
    * after the scan's entropy data, or -1 for anything malformed. */
  private def decodeProgressiveScan(
      b: Array[Byte],
      start: Int,
      scanComps: Array[Component],
      ss: Int, se: Int, ah: Int, al: Int,
      restartInterval: Int,
      mcusX: Int, mcusY: Int,
      dcTabs: Array[HuffTable],
      acTabs: Array[HuffTable]): Int = {
    if (al > 13 || ah > 14) return -1
    val r = new BitReader(b, start)
    if (ss == 0) {
      // ---- DC scan ----
      if (se != 0) return -1
      scanComps.foreach(_.pred = 0)
      if (ah == 0) {
        var c = 0
        while (c < scanComps.length) {
          if (dcTabs(scanComps(c).dcTable) == null) return -1
          c += 1
        }
      }
      val interleaved = scanComps.length > 1
      val nUnits =
        if (interleaved) mcusX * mcusY else scanComps(0).bw * scanComps(0).bh
      var unit = 0
      var sinceRestart = 0
      while (unit < nUnits) {
        if (restartInterval > 0 && sinceRestart == restartInterval) {
          if (!r.restart()) return -1
          scanComps.foreach(_.pred = 0)
          sinceRestart = 0
        }
        if (interleaved) {
          val mcuX = unit % mcusX
          val mcuY = unit / mcusX
          var c = 0
          while (c < scanComps.length) {
            val comp = scanComps(c)
            var v = 0
            while (v < comp.vSamp) {
              var hh = 0
              while (hh < comp.hSamp) {
                val blk = (mcuY * comp.vSamp + v) * comp.bwPad + (mcuX * comp.hSamp + hh)
                if (!dcUnit(r, comp, blk * 64, ah, al, dcTabs)) return -1
                hh += 1
              }
              v += 1
            }
            c += 1
          }
        } else {
          val comp = scanComps(0)
          val blk = (unit / comp.bw) * comp.bwPad + (unit % comp.bw)
          if (!dcUnit(r, comp, blk * 64, ah, al, dcTabs)) return -1
        }
        sinceRestart += 1
        unit += 1
      }
    } else {
      // ---- AC scan: exactly one component (T.81 G.1.1) ----
      if (scanComps.length != 1 || se > 63 || ss > se) return -1
      val comp = scanComps(0)
      val acT = acTabs(comp.acTable)
      if (acT == null || comp.coefs == null) return -1
      val p1 = 1 << al
      val nBlocks = comp.bw * comp.bh
      var eobrun = 0
      var blkIdx = 0
      var sinceRestart = 0
      while (blkIdx < nBlocks) {
        if (restartInterval > 0 && sinceRestart == restartInterval) {
          if (!r.restart()) return -1
          eobrun = 0
          sinceRestart = 0
        }
        val base = ((blkIdx / comp.bw) * comp.bwPad + (blkIdx % comp.bw)) * 64
        if (ah == 0) {
          // first pass (G.1.2.2): coefficients arrive scaled by 2^Al
          if (eobrun > 0) eobrun -= 1
          else {
            var k = ss
            var open = true
            while (open && k <= se) {
              val rs = huffDecode(r, acT)
              if (rs < 0) return -1
              val run = rs >> 4
              val s = rs & 0x0f
              if (s == 0) {
                if (run == 15) k += 16 // ZRL
                else {
                  eobrun = (1 << run) - 1 // covers THIS block too
                  if (run > 0) eobrun += r.receive(run)
                  open = false
                }
              } else {
                k += run
                if (k > se) return -1
                comp.coefs(base + Zigzag(k)) = extend(r.receive(s), s) << al
                k += 1
              }
            }
          }
        } else {
          // refinement (G.1.2.3): correction bits for already-nonzero
          // coefficients; newly-nonzero ones arrive as ±2^Al
          var k = ss
          if (eobrun == 0) {
            var open = true
            while (open && k <= se) {
              val rs = huffDecode(r, acT)
              if (rs < 0) return -1
              var run = rs >> 4
              val s = rs & 0x0f
              var newval = 0
              if (s == 0) {
                if (run < 15) { // EOBn: the block's tail refines below
                  eobrun = 1 << run
                  if (run > 0) eobrun += r.receive(run)
                  open = false
                }
                // run == 15 (ZRL): pass 16 zero-HISTORY coefficients
              } else {
                if (s != 1) return -1 // refinement magnitudes are ±1
                newval = if (r.nextBit() == 1) p1 else -p1
              }
              if (open) {
                var placed = false
                while (!placed && k <= se) {
                  val idx = base + Zigzag(k)
                  val cur = comp.coefs(idx)
                  if (cur != 0) { // history: a correction bit, not a run slot
                    if (r.nextBit() == 1 && (cur & p1) == 0)
                      comp.coefs(idx) = cur + (if (cur >= 0) p1 else -p1)
                  } else if (run == 0) {
                    if (newval != 0) comp.coefs(idx) = newval
                    placed = true
                  } else run -= 1
                  k += 1
                }
                if (!placed && newval != 0) return -1 // ran past Se: corrupt
              }
            }
          }
          if (eobrun > 0) {
            // EOB region: correction bits only, through the band's end
            while (k <= se) {
              val idx = base + Zigzag(k)
              val cur = comp.coefs(idx)
              if (cur != 0) {
                if (r.nextBit() == 1 && (cur & p1) == 0)
                  comp.coefs(idx) = cur + (if (cur >= 0) p1 else -p1)
              }
              k += 1
            }
            eobrun -= 1
          }
        }
        if (r.underrun) return -1
        sinceRestart += 1
        blkIdx += 1
      }
    }
    if (r.underrun) return -1
    skipToMarker(b, r.pos)
  }

  /** One DC data unit of a progressive scan: first pass decodes the
    * predictor diff at point transform Al (G.1.2.1); refinement appends
    * the bit at position Al (G.1.2.1 successive approximation). */
  private def dcUnit(r: BitReader, comp: Component, base: Int,
      ah: Int, al: Int, dcTabs: Array[HuffTable]): Boolean = {
    if (comp.coefs == null) return false
    if (ah == 0) {
      val tab = dcTabs(comp.dcTable)
      val t = huffDecode(r, tab)
      if (t < 0 || t > 15) return false
      comp.pred += extend(r.receive(t), t)
      comp.coefs(base) = comp.pred << al
    } else {
      if (r.nextBit() == 1) comp.coefs(base) |= (1 << al)
    }
    !r.underrun
  }

  /** First true marker at/after `from`: `FF xx` where `xx` is not a
    * stuffing 00, a fill FF, or an in-stream RSTn. -1 when none. */
  private def skipToMarker(b: Array[Byte], from: Int): Int = {
    var p = from
    while (p + 1 < b.length) {
      if ((b(p) & 0xff) == 0xff) {
        val nx = b(p + 1) & 0xff
        if (nx == 0x00) p += 2
        else if (nx == 0xff) p += 1
        else if (nx >= 0xd0 && nx <= 0xd7) p += 2
        else return p
      } else p += 1
    }
    -1
  }

  /** Progressive finish at EOI: dequantize the accumulated coefficient
    * store (tables in effect at EOI — T.81 forbids changing a quant
    * table mid-frame) and IDCT each block of each component's TRUE grid
    * into its plane, then the shared assembly. */
  private def finishProgressive(
      comps: Array[Component],
      w: Int, h: Int,
      quant: Array[Array[Int]],
      mcusX: Int, mcusY: Int): Decoded = {
    if (comps == null) return null
    val hMax = comps.map(_.hSamp).max
    val vMax = comps.map(_.vSamp).max
    var planeBytes = 0L
    comps.foreach { c =>
      c.planeW = mcusX * c.hSamp * 8
      c.planeH = mcusY * c.vSamp * 8
      planeBytes += c.planeW.toLong * c.planeH
      if (quant(c.quantId) == null) return null
    }
    if (planeBytes > MaxPlaneBytes ||
      w.toLong * h * comps.length > MaxPlaneBytes) return null
    val dq = new Array[Int](64)
    val tmp = new Array[Double](64)
    comps.foreach { c =>
      c.plane = new Array[Byte](c.planeW * c.planeH)
      val q = quant(c.quantId)
      var by = 0
      while (by < c.bh) {
        var bx = 0
        while (bx < c.bw) {
          val base = (by * c.bwPad + bx) * 64
          var k = 0
          while (k < 64) {
            dq(Zigzag(k)) = c.coefs(base + Zigzag(k)) * q(k)
            k += 1
          }
          idctBlock(dq, tmp, c.plane, c.planeW, bx * 8, by * 8)
          bx += 1
        }
        by += 1
      }
    }
    assemble(comps, w, h, hMax, vMax)
  }
}

/** Codec-dispatching pixel statistics — [[PngPixelStats]]'s struct over
  * ANY supported still-image payload: the container is sniffed from its
  * magic bytes (PNG signature / JPEG SOI / GIF87a-GIF89a header) and
  * routed to the matching native decode. This is the expression [[graft.ops.MediaQuality]]'s
  * image battery rides, so a crawled JPEG gets the same quality signals
  * as a PNG — previously it was `quality_reject`ed as undecodable while
  * `extractWarcMedia` harvested it anyway. JPEG/GIF output depth is
  * always 8. NULL for unrecognized containers and anything the matching
  * decoder rejects.
  */
case class ImagePixelStats(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true

  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("depth", IntegerType, nullable = false),
    StructField("ch_sum", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("ch_min", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("ch_max", ArrayType(IntegerType, containsNull = false), nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"image_pixel_stats requires binary, got $other")
  }

  override protected def nullSafeEval(a: Any): Any =
    ImagePixelStats.parse(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("img")
      s"""
         |InternalRow $r = graft.functions.ImagePixelStats.parse($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImagePixelStats {

  private[functions] def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G' && (b(4) & 0xff) == 0x0d && (b(5) & 0xff) == 0x0a &&
      (b(6) & 0xff) == 0x1a && (b(7) & 0xff) == 0x0a

  private[functions] def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8

  def parse(b: Array[Byte]): InternalRow = {
    if (isPng(b)) return PngPixelStats.parse(b)
    val d = decodeAny(b)
    if (d == null) return null
    val (sums, mins, maxs) = statsArrays(d)
    InternalRow(d.w, d.h, d.ch, 8,
      new GenericArrayData(sums), new GenericArrayData(mins), new GenericArrayData(maxs))
  }

  /** Magic-byte dispatch to the matching non-PNG decoder — shared by the
    * stats expression, the grid hashes, and the fused battery kernel
    * ([[ImageSignalsKernel]]) so all consumers agree on codec coverage. */
  private[functions] def decodeAny(b: Array[Byte]): JpegDecoder.Decoded =
    if (isJpeg(b)) JpegDecoder.decode(b)
    else if (GifDecoder.isGif(b)) GifDecoder.decode(b)
    else if (WebpDecoder.isWebp(b)) WebpDecoder.decode(b)
    else null

  /** Per-channel (sum, min, max) over a decoded 8-bit sample stream. */
  private[functions] def statsArrays(
      d: JpegDecoder.Decoded): (Array[Long], Array[Int], Array[Int]) = {
    val ch = d.ch
    val sums = new Array[Long](ch)
    val mins = Array.fill(ch)(255)
    val maxs = new Array[Int](ch)
    val s = d.samples
    var i = 0
    while (i < s.length) {
      val v = s(i) & 0xff
      val c = i % ch
      sums(c) += v
      if (v < mins(c)) mins(c) = v
      if (v > maxs(c)) maxs(c) = v
      i += 1
    }
    (sums, mins, maxs)
  }
}

/** Codec-dispatching 64-bit average-hash — [[PngAHash64]]'s grid
  * conventions over PNG, JPEG or GIF payloads, so byte-different
  * cross-codec re-encodes of the same pixels land on the SAME fingerprint
  * and dedup against each other in [[graft.ops.MediaDedup]]'s ladder
  * (grayscale pixels encode identical luma both ways; the grid, the
  * floor-div cell mapping, and the cross-multiplied comparisons are
  * shared exactly — encoding-independence is pinned in MultimodalSpec).
  * Same NULL contract per codec: undecodable, interlaced PNG, > 2²⁰ px. */
case class ImageAHash64(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"image_ahash64 requires binary, got $other")
  }

  override protected def nullSafeEval(a: Any): Any =
    ImageGridHash.aHash(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("iah")
      s"""
         |Long $r = graft.functions.ImageGridHash.aHash($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codec-dispatching dHash sibling of [[ImageAHash64]] (9×8 horizontal
  * gradient grid; PNG, JPEG or GIF). */
case class ImageDHash64(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"image_dhash64 requires binary, got $other")
  }

  override protected def nullSafeEval(a: Any): Any =
    ImageGridHash.dHash(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("idh")
      s"""
         |Long $r = graft.functions.ImageGridHash.dHash($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageGridHash {

  /** Same Long-overflow pixel cap as [[PngGridHash]] (sum·count
    * cross-multiplications stay under 2⁵⁸). */
  private val MaxPixels = 1 << 20

  /** Per-grid-cell luma sums/counts of a decoded JPEG or GIF — the
    * byte-array twin of [[PngGridHash]]'s scanline walk, same floor-div
    * cell mapping and alpha-free luma (neither codec carries alpha here;
    * gray = 1 channel, RGB = 3). */
  private def decodedGridLuma(d: JpegDecoder.Decoded, gw: Int, gh: Int): (Array[Long], Array[Long]) = {
    if (d == null) return null
    val w = d.w; val h = d.h
    if (w.toLong * h > MaxPixels) return null
    val ch = d.ch
    val sums = new Array[Long](gw * gh)
    val cnts = new Array[Long](gw * gh)
    val s = d.samples
    var y = 0
    while (y < h) {
      val rowAt = y * w * ch
      val row = y * gh / h
      var x = 0
      while (x < w) {
        val at = rowAt + x * ch
        var luma = 0L
        var c = 0
        while (c < ch) { luma += s(at + c) & 0xff; c += 1 }
        val cell = row * gw + x * gw / w
        sums(cell) += luma
        cnts(cell) += 1
        x += 1
      }
      y += 1
    }
    (sums, cnts)
  }

  private def decodeNonPng(b: Array[Byte]): JpegDecoder.Decoded =
    ImagePixelStats.decodeAny(b)

  /** aHash of an ALREADY-decoded non-PNG image — the fused battery kernel
    * ([[ImageSignalsKernel]]) hashes the same decode its stats walked. */
  private[functions] def aHashFromDecoded(d: JpegDecoder.Decoded): java.lang.Long = {
    val g = decodedGridLuma(d, 8, 8)
    if (g == null) null else PngGridHash.aHashFromGrid(g._1, g._2)
  }

  def aHash(b: Array[Byte]): java.lang.Long = {
    if (ImagePixelStats.isPng(b)) return PngGridHash.aHash(b)
    val g = decodedGridLuma(decodeNonPng(b), 8, 8)
    if (g == null) null else PngGridHash.aHashFromGrid(g._1, g._2)
  }

  def dHash(b: Array[Byte]): java.lang.Long = {
    if (ImagePixelStats.isPng(b)) return PngGridHash.dHash(b)
    val g = decodedGridLuma(decodeNonPng(b), 9, 8)
    if (g == null) null else PngGridHash.dHashFromGrid(g._1, g._2)
  }
}

/** Fused single-decode image battery: the quality-signal struct (and,
  * with `withAHash`, the dedup ladder's perceptual aHash) computed inside
  * ONE kernel call over ONE codec decode.
  *
  * Why a kernel and not Column algebra: the Column form of
  * [[graft.ops.MediaQuality.imageSignals]] references its
  * [[ImagePixelStats]] child ~15 times after projection collapse, and
  * whole-stage-codegen subexpression elimination measurably does NOT
  * collapse them (the struct sits in a CASE WHEN branch; measured at
  * sf0.1 over 7500 progressive JPEGs: 0.652 s for the Column form vs
  * 0.142 s for a single [[ImagePixelStats]] eval — ~4.6 decodes/row).
  * Deriving every signal inside the kernel makes one-decode-per-row true
  * by construction, and fusing the aHash removes the second full decode
  * the batteries and the curation barrier paid
  * ([[graft.ops.MediaPipeline]]).
  *
  * Field-for-field identical values to the Column form (same integer
  * sums, same IEEE double divisions, same luma-channel slice); `ahash`
  * carries [[ImageAHash64]]'s exact NULL contract (undecodable /
  * interlaced PNG / > 2²⁰ px) while the stats fields keep
  * [[ImagePixelStats]]'s (stats exist whenever the payload decodes).
  */
case class ImageSignalsKernel(child: Expression, withAHash: Boolean)
    extends UnaryExpression {

  override def nullable: Boolean = true

  override def dataType: DataType = ImageSignalsKernel.schemaFor(withAHash)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"image_signals requires binary, got $other")
  }

  override protected def nullSafeEval(a: Any): Any =
    ImageSignalsKernel.parse(a.asInstanceOf[Array[Byte]], withAHash)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("sig")
      s"""
         |InternalRow $r = graft.functions.ImageSignalsKernel.parse($c, $withAHash);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageSignalsKernel {

  private val statsFields = Seq(
    StructField("width", LongType, nullable = true),
    StructField("height", LongType, nullable = true),
    StructField("n_px", LongType, nullable = true),
    StructField("aspect", DoubleType, nullable = true),
    StructField("mean_luma", DoubleType, nullable = true),
    StructField("dyn_range", LongType, nullable = true),
    StructField("payload_bytes", LongType, nullable = true))

  def schemaFor(withAHash: Boolean): StructType =
    if (withAHash) StructType(statsFields :+ StructField("ahash", LongType, nullable = true))
    else StructType(statsFields)

  def parse(b: Array[Byte], withAHash: Boolean): InternalRow =
    if (ImagePixelStats.isPng(b)) {
      val d = PngPixelStats.decode(b)
      if (d == null) null
      else {
        val (sums, mins, maxs) = PngPixelStats.statsArrays(d)
        signalsRow(d.w, d.h, d.ch, sums, mins, maxs, b.length,
          if (withAHash) PngGridHash.aHashFromDecoded(d) else null, withAHash)
      }
    } else {
      val d = ImagePixelStats.decodeAny(b)
      if (d == null) null
      else {
        val (sums, mins, maxs) = ImagePixelStats.statsArrays(d)
        signalsRow(d.w, d.h, d.ch, sums, mins, maxs, b.length,
          if (withAHash) ImageGridHash.aHashFromDecoded(d) else null, withAHash)
      }
    }

  /** Exactly [[graft.ops.MediaQuality.imageSignals]]'s Column arithmetic:
    * luma channels = first min(ch, 3) (alpha excluded), mean over Long
    * sums with one double division, dyn_range = max per-channel range
    * floored at 0, aspect = max/min dims as doubles. */
  private def signalsRow(w: Int, h: Int, ch: Int, sums: Array[Long],
      mins: Array[Int], maxs: Array[Int], nBytes: Int,
      ahash: java.lang.Long, withAHash: Boolean): InternalRow = {
    val wl = w.toLong
    val hl = h.toLong
    val nPx = wl * hl
    val lumaCh = math.min(ch, 3)
    var sumAll = 0L
    var dyn = 0
    var c = 0
    while (c < lumaCh) {
      sumAll += sums(c)
      val d0 = maxs(c) - mins(c)
      if (d0 > dyn) dyn = d0
      c += 1
    }
    val aspect = math.max(wl, hl).toDouble / math.min(wl, hl).toDouble
    val meanLuma = sumAll.toDouble / (lumaCh.toLong * nPx).toDouble
    if (withAHash)
      InternalRow(wl, hl, nPx, aspect, meanLuma, dyn.toLong, nBytes.toLong, ahash)
    else
      InternalRow(wl, hl, nPx, aspect, meanLuma, dyn.toLong, nBytes.toLong)
  }
}
