package graft.multimodal

import graft.functions.Vp8Decoder

/** Independent spec-derived VP8 keyframe ENCODER for test fixtures — the
  * GIF/JPEG/VP8L convention: the encoder is written from RFC 6386's
  * description of the bitstream (boolean arithmetic coder with carry
  * propagation, keyframe header syntax, mode trees, DCT token syntax),
  * NOT from the decoder's code, so a round-trip failure indicts one side
  * rather than confirming a shared bug. The spec's probability/quant
  * TABLES are shared constants ([[Vp8Decoder]]'s `private[graft]`
  * members) — duplicating a thousand literal numbers would test
  * transcription, not logic.
  *
  * Encoding strategy (exactness by construction): mosaics of 16×16
  * constant cells, one macroblock per cell. A constant residual `r` over
  * a subblock is DC-only in the transform domain, and the spec's
  * fixed-point inverse transforms reproduce it EXACTLY:
  *  - 16×16 DC_PRED path: Y2 DC level `8r` dequantizes (×8 at qi=0) to
  *    `64r`; the inverse WHT emits `(64r+3)>>3 = 8r` into every
  *    subblock DC; the DC-only iDCT adds `(8r+4)>>3 = r` to prediction.
  *  - B_PRED path: per-subblock DC level `2r` dequantizes (×4) to `8r`,
  *    iDCT adds `(8r+4)>>3 = r`.
  * Chroma is left neutral (all-128, zero residual), so the decoder's
  * gray short-circuit yields luma == the planted cell values, and the
  * mosaic oracles replay signals from text bytes exactly.
  */
object Vp8Fixtures {

  // ---- boolean arithmetic encoder (RFC 6386 §8 description) ----

  private final class BoolEncoder {
    private val bytes = scala.collection.mutable.ArrayBuffer[Int]()
    private var low = 0
    private var range = 255
    private var count = -24

    def bool(bit: Int, prob: Int): Unit = {
      val split = 1 + (((range - 1) * prob) >> 8)
      if (bit != 0) { low += split; range -= split }
      else range = split
      var shift = 0
      while (range < 128) { range <<= 1; shift += 1 }
      count += shift
      if (count >= 0) {
        val offset = shift - count
        if (((low << (offset - 1)) & 0x80000000) != 0) {
          // propagate the carry through any 0xff run
          var x = bytes.length - 1
          while (x >= 0 && bytes(x) == 0xff) { bytes(x) = 0; x -= 1 }
          if (x >= 0) bytes(x) += 1
        }
        bytes += ((low >>> (24 - offset)) & 0xff)
        low <<= offset
        low &= 0xffffff
        shift = count
        count -= 8
        low <<= shift
      } else low <<= shift
    }

    def literal(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bool((v >> i) & 1, 128); i -= 1 }
    }

    /** Flag-gated signed literal (the header's optional-delta syntax). */
    def maybeSigned(v: Int, n: Int): Unit =
      if (v == 0) bool(0, 128)
      else {
        bool(1, 128)
        literal(math.abs(v), n)
        bool(if (v < 0) 1 else 0, 128)
      }

    /** Encode a token-tree leaf by walking the path root→leaf. */
    def tree(t: Array[Int], probs: Array[Int], leaf: Int): Unit = {
      def path(node: Int): List[(Int, Int)] = {
        var bit = 0
        while (bit < 2) {
          val child = t(node + bit)
          if (child <= 0) {
            if (-child == leaf) return (node, bit) :: Nil
          } else {
            try return (node, bit) :: path(child)
            catch { case _: NoSuchElementException => }
          }
          bit += 1
        }
        throw new NoSuchElementException(s"leaf $leaf")
      }
      path(0).foreach { case (node, bit) => bool(bit, probs(node >> 1)) }
    }

    def flush(): Array[Byte] = {
      var i = 0
      while (i < 32) { bool(0, 128); i += 1 }
      bytes.map(_.toByte).toArray
    }
  }

  // ---- coefficient token writer (mirrors the spec's token syntax) ----

  /** Write one block's tokens: `levels` are quantizer LEVELS in scan
    * order (16 entries; zigzag handled by the caller being DC-only).
    * Returns whether the block had any nonzero coefficient. */
  private def writeBlockTokens(e: BoolEncoder,
      probs: Array[Array[Array[Int]]], ctx0: Int, firstCoef: Int,
      levels: Array[Int]): Boolean = {
    var lastNz = -1
    var j = firstCoef
    while (j < 16) { if (levels(j) != 0) lastNz = j; j += 1 }
    var i = firstCoef
    var ctx = ctx0
    var prevZero = false
    while (i <= lastNz) {
      val p = probs(Vp8Decoder.CoeffBands(i))(ctx)
      if (!prevZero) e.bool(1, p(0)) // not EOB
      val v = levels(i)
      if (v == 0) { e.bool(0, p(1)); prevZero = true; ctx = 0 }
      else {
        e.bool(1, p(1))
        prevZero = false
        val a = math.abs(v)
        if (a == 1) { e.bool(0, p(2)); ctx = 1 }
        else {
          e.bool(1, p(2)); ctx = 2
          if (a <= 4) {
            e.bool(0, p(3))
            if (a == 2) e.bool(0, p(4))
            else { e.bool(1, p(4)); e.bool(a - 3, p(5)) }
          } else {
            e.bool(1, p(3))
            if (a <= 10) {
              e.bool(0, p(6))
              if (a <= 6) { e.bool(0, p(7)); cat(e, a - 5, Vp8Decoder.Pcat1) }
              else { e.bool(1, p(7)); cat(e, a - 7, Vp8Decoder.Pcat2) }
            } else {
              e.bool(1, p(6))
              if (a <= 34) {
                e.bool(0, p(8))
                if (a <= 18) { e.bool(0, p(9)); cat(e, a - 11, Vp8Decoder.Pcat3) }
                else { e.bool(1, p(9)); cat(e, a - 19, Vp8Decoder.Pcat4) }
              } else {
                e.bool(1, p(8))
                if (a <= 66) { e.bool(0, p(10)); cat(e, a - 35, Vp8Decoder.Pcat5) }
                else { e.bool(1, p(10)); cat(e, a - 67, Vp8Decoder.Pcat6) }
              }
            }
          }
        }
        e.bool(if (v < 0) 1 else 0, 128) // sign
      }
      i += 1
    }
    if (i < 16) { // EOB (prevZero can't be true here: no trailing zeros)
      val p = probs(Vp8Decoder.CoeffBands(i))(ctx)
      e.bool(0, p(0))
    }
    lastNz >= firstCoef
  }

  private def cat(e: BoolEncoder, extra: Int, probs: Array[Int]): Unit = {
    var i = probs.length - 1
    var j = 0
    while (i >= 0) { e.bool((extra >> i) & 1, probs(j)); i -= 1; j += 1 }
  }

  // ---- the keyframe encoder ----

  /** Encode a grayscale mosaic of `cellsX`×`cellsY` 16×16 constant cells
    * (one macroblock each) as a lossy `VP8 `-in-RIFF WebP. `bPred` routes
    * luma through 4×4 B_PRED/B_DC (per-subblock DC levels, no Y2);
    * otherwise 16×16 DC_PRED + the Y2/WHT path. Reconstruction is
    * bit-exact either way (object scaladoc), so decoded luma equals
    * `vals` verbatim. */
  def encodeGrayMosaic(vals: Array[Int], cellsX: Int, cellsY: Int,
      bPred: Boolean = false, probSkip: Int = 200): Array[Byte] = {
    require(vals.length == cellsX * cellsY, "one value per 16x16 cell")
    require(vals.forall(v => v >= 0 && v <= 255), "8-bit gray values")
    val mbW = cellsX
    val mbH = cellsY
    val w = mbW * 16
    val h = mbH * 16

    // ---- plan residuals: recon equals target exactly, so prediction
    // context is just the target mosaic ----
    def target(mx: Int, my: Int): Int = vals(my * mbW + mx)
    // 16x16 (or B_DC 4x4) DC prediction over constant neighbors: since
    // every reconstructed pixel in an MB equals its cell value, the DC
    // prediction rules collapse to means of cell values.
    def predDc16(mx: Int, my: Int): Int = {
      val hasA = my > 0
      val hasL = mx > 0
      if (!hasA && !hasL) 128
      else if (hasA && hasL) (16 * target(mx, my - 1) + 16 * target(mx - 1, my) + 16) >> 5
      else if (hasA) (16 * target(mx, my - 1) + 8) >> 4
      else (16 * target(mx - 1, my) + 8) >> 4
    }

    val p1 = new BoolEncoder
    // uncompressed-header-adjacent bool fields (§9.2–9.11)
    p1.literal(0, 1) // color space
    p1.literal(0, 1) // clamping
    p1.bool(0, 128) // segmentation off
    p1.literal(0, 1) // filter type
    p1.literal(0, 6) // filter level 0: no loop filter, reconstruction exact
    p1.literal(0, 3) // sharpness
    p1.bool(0, 128) // lf deltas off
    p1.literal(0, 2) // log2(token partitions) = 0 → 1 partition
    p1.literal(0, 7) // y_ac_qi = 0 (dc quant 4, ac quant 4)
    p1.maybeSigned(0, 4) // y dc delta
    p1.maybeSigned(0, 4) // y2 dc delta
    p1.maybeSigned(0, 4) // y2 ac delta
    p1.maybeSigned(0, 4) // uv dc delta
    p1.maybeSigned(0, 4) // uv ac delta
    p1.literal(1, 1) // refresh entropy probs
    // no coefficient-probability updates: one zero flag per node
    var i = 0
    while (i < 4) {
      var j = 0
      while (j < 8) {
        var k = 0
        while (k < 3) {
          var l = 0
          while (l < 11) {
            p1.bool(0, Vp8Decoder.CoeffUpdateProbs(i)(j)(k)(l))
            l += 1
          }
          k += 1
        }
        j += 1
      }
      i += 1
    }
    p1.bool(1, 128) // mb_no_coeff_skip enabled
    p1.literal(probSkip, 8)

    // per-MB residual plan (needed by both passes)
    val resid = Array.tabulate(mbH, mbW)((my, mx) =>
      if (bPred) 0 // computed per subblock below
      else target(mx, my) - predDc16(mx, my))
    // B_PRED per-subblock residuals: every subblock of an MB is constant,
    // so B_DC prediction is (sum above4 + sum left4 + 4) >> 3 over
    // neighbor values — 127/129 edge conventions included.
    def bSubResid(mx: Int, my: Int, sb: Int): Int = {
      val r = sb >> 2
      val c = sb & 3
      val above = if (r > 0) target(mx, my) else if (my > 0) target(mx, my - 1) else 127
      val left = if (c > 0) target(mx, my) else if (mx > 0) target(mx - 1, my) else 129
      target(mx, my) - ((4 * above + 4 * left + 4) >> 3)
    }
    val skip = Array.tabulate(mbH, mbW)((my, mx) =>
      if (bPred) (0 until 16).forall(sb => bSubResid(mx, my, sb) == 0)
      else resid(my)(mx) == 0)

    // modes pass (partition 1): skip flag, ymode, [bmodes], uvmode
    var my = 0
    while (my < mbH) {
      var mx = 0
      while (mx < mbW) {
        p1.bool(if (skip(my)(mx)) 1 else 0, probSkip)
        if (bPred) {
          p1.tree(Vp8Decoder.KfYmodeTree, Vp8Decoder.KfYmodeProb, 4) // B_PRED
          var sb = 0
          while (sb < 16) {
            // all-B_DC modes ⇒ every context is (B_DC, B_DC) = (0, 0)
            p1.tree(Vp8Decoder.BmodeTree, Vp8Decoder.KfBmodeProb(0)(0), 0)
            sb += 1
          }
        } else {
          p1.tree(Vp8Decoder.KfYmodeTree, Vp8Decoder.KfYmodeProb, 0) // DC_PRED
        }
        p1.tree(Vp8Decoder.UvModeTree, Vp8Decoder.KfUvModeProb, 0) // DC chroma
        mx += 1
      }
      my += 1
    }

    // token pass (partition 2) with decoder-mirroring nz context tracking
    val p2 = new BoolEncoder
    val probs = Vp8Decoder.DefaultCoeffProbs
    val aboveNz = new Array[Boolean](mbW * 9)
    val leftNz = new Array[Boolean](9)
    val zero16 = new Array[Int](16)
    my = 0
    while (my < mbH) {
      java.util.Arrays.fill(leftNz, false)
      var mx = 0
      while (mx < mbW) {
        if (skip(my)(mx)) {
          var c = 0
          while (c < 8) { aboveNz(mx * 9 + c) = false; leftNz(c) = false; c += 1 }
          if (!bPred) { aboveNz(mx * 9 + 8) = false; leftNz(8) = false }
        } else {
          val nzY = new Array[Boolean](16)
          if (!bPred) {
            val r = resid(my)(mx)
            val y2 = new Array[Int](16)
            y2(0) = 8 * r // level: ×8 (y2 dc quant at qi=0) → 64r → WHT → 8r
            val ctx = (if (aboveNz(mx * 9 + 8)) 1 else 0) + (if (leftNz(8)) 1 else 0)
            val nz = writeBlockTokens(p2, probs(1), ctx, 0, y2)
            aboveNz(mx * 9 + 8) = nz
            leftNz(8) = nz
            var sb = 0
            while (sb < 16) {
              val sr = sb >> 2
              val sc = sb & 3
              val actx = if (sr == 0) aboveNz(mx * 9 + sc) else nzY(sb - 4)
              val lctx = if (sc == 0) leftNz(sr) else nzY(sb - 1)
              nzY(sb) = writeBlockTokens(p2, probs(0),
                (if (actx) 1 else 0) + (if (lctx) 1 else 0), 1, zero16)
              sb += 1
            }
          } else {
            var sb = 0
            while (sb < 16) {
              val sr = sb >> 2
              val sc = sb & 3
              val levels = new Array[Int](16)
              levels(0) = 2 * bSubResid(mx, my, sb) // ×4 dc quant → 8r
              val actx = if (sr == 0) aboveNz(mx * 9 + sc) else nzY(sb - 4)
              val lctx = if (sc == 0) leftNz(sr) else nzY(sb - 1)
              nzY(sb) = writeBlockTokens(p2, probs(3),
                (if (actx) 1 else 0) + (if (lctx) 1 else 0), 0, levels)
              sb += 1
            }
          }
          // chroma: neutral 128 everywhere ⇒ zero residual, all EOB
          val nzU = new Array[Boolean](4)
          val nzV = new Array[Boolean](4)
          var ub = 0
          while (ub < 4) {
            val ur = ub >> 1
            val uc = ub & 1
            val actx = if (ur == 0) aboveNz(mx * 9 + 4 + uc) else nzU(ub - 2)
            val lctx = if (uc == 0) leftNz(4 + ur) else nzU(ub - 1)
            nzU(ub) = writeBlockTokens(p2, probs(2),
              (if (actx) 1 else 0) + (if (lctx) 1 else 0), 0, zero16)
            ub += 1
          }
          ub = 0
          while (ub < 4) {
            val ur = ub >> 1
            val uc = ub & 1
            val actx = if (ur == 0) aboveNz(mx * 9 + 6 + uc) else nzV(ub - 2)
            val lctx = if (uc == 0) leftNz(6 + ur) else nzV(ub - 1)
            nzV(ub) = writeBlockTokens(p2, probs(2),
              (if (actx) 1 else 0) + (if (lctx) 1 else 0), 0, zero16)
            ub += 1
          }
          var c2 = 0
          while (c2 < 4) { aboveNz(mx * 9 + c2) = nzY(12 + c2); c2 += 1 }
          var r2 = 0
          while (r2 < 4) { leftNz(r2) = nzY(r2 * 4 + 3); r2 += 1 }
          aboveNz(mx * 9 + 4) = nzU(2); aboveNz(mx * 9 + 5) = nzU(3)
          leftNz(4) = nzU(1); leftNz(5) = nzU(3)
          aboveNz(mx * 9 + 6) = nzV(2); aboveNz(mx * 9 + 7) = nzV(3)
          leftNz(6) = nzV(1); leftNz(7) = nzV(3)
        }
        mx += 1
      }
      my += 1
    }

    val part1 = p1.flush()
    val tokens = p2.flush()
    // frame tag: keyframe(0) | version 0 | show_frame | part1 size
    val tag = (part1.length << 5) | (1 << 4)
    val header = Array[Byte](
      (tag & 0xff).toByte, ((tag >> 8) & 0xff).toByte, ((tag >> 16) & 0xff).toByte,
      0x9d.toByte, 0x01, 0x2a,
      (w & 0xff).toByte, ((w >> 8) & 0x3f).toByte,
      (h & 0xff).toByte, ((h >> 8) & 0x3f).toByte)
    riffWrap("VP8 ", header ++ part1 ++ tokens)
  }

  /** Wrap a raw codec chunk payload in RIFF/WEBP. */
  private def riffWrap(fourcc: String, payload: Array[Byte]): Array[Byte] = {
    val padded = if (payload.length % 2 == 1) payload :+ 0.toByte else payload
    val out = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    ascii("RIFF")
    le32(4 + 8 + padded.length)
    ascii("WEBP")
    ascii(fourcc)
    le32(payload.length)
    out.write(padded)
    out.toByteArray
  }

  /** Re-wrap a still WebP (any codec) as an ANIMATED WebP whose FIRST
    * frame is that still: VP8X (animation flag + canvas dims) + ANIM
    * (loop params) + `frames`× ANMF each carrying the still's codec
    * chunk. Frame-0 decode must see exactly the still's pixels. */
  def animWrap(still: Array[Byte], w: Int, h: Int, frames: Int = 2): Array[Byte] = {
    // extract the codec chunk (fourcc+size+payload) from the still RIFF
    var pos = 12
    var chunk: Array[Byte] = null
    while (chunk == null && pos + 8 <= still.length) {
      val fc = new String(still, pos, 4, "US-ASCII")
      val sz = (still(pos + 4) & 0xff) | ((still(pos + 5) & 0xff) << 8) |
        ((still(pos + 6) & 0xff) << 16) | ((still(pos + 7) & 0xff) << 24)
      if (fc == "VP8L" || fc == "VP8 ")
        chunk = java.util.Arrays.copyOfRange(still, pos, pos + 8 + sz + (sz & 1))
      else pos += 8 + sz + (sz & 1)
    }
    require(chunk != null, "no codec chunk in still WebP")
    val out = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    def le24(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff); out.write((v >> 16) & 0xff)
    }
    val anmfBody = 16 + chunk.length
    val total = 4 + (8 + 10) + (8 + 6) + frames * (8 + anmfBody)
    ascii("RIFF"); le32(total); ascii("WEBP")
    ascii("VP8X"); le32(10)
    out.write(0x02) // animation flag
    out.write(0); out.write(0); out.write(0) // reserved
    le24(w - 1); le24(h - 1)
    ascii("ANIM"); le32(6)
    le32(0xffffffff) // white background
    out.write(0); out.write(0) // loop forever
    var f = 0
    while (f < frames) {
      ascii("ANMF"); le32(anmfBody)
      le24(0); le24(0) // frame x/2, y/2
      le24(w - 1); le24(h - 1)
      le24(100) // duration ms
      out.write(0) // flags: no blend, keep
      out.write(chunk)
      f += 1
    }
    out.toByteArray
  }
}
