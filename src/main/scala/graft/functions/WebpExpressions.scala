package graft.functions

/** Spec-derived WebP VP8L (lossless) decoder — "WebP Lossless Bitstream
  * Specification" (Google, public): RIFF container walk, the VP8L header,
  * canonical-prefix-coded ARGB with LZ77 backward references and the
  * color cache, meta prefix groups, and all four transforms (predictor,
  * color, subtract-green, color-indexing incl. sub-byte pixel bundling)
  * applied inverse in reverse read order.
  *
  * Output mirrors [[JpegDecoder.Decoded]] so the codec-dispatching image
  * expressions ([[ImagePixelStats]], [[ImageAHash64]], [[ImageDHash64]])
  * give a crawled lossless WebP the same quality battery and perceptual
  * dedup as PNG, JPEG, and GIF: 8-bit interleaved samples, 1 channel when
  * every pixel is gray (r == g == b), else 3.
  *
  * Scope and honesty notes:
  *  - this object owns the container walk + VP8L; lossy `VP8 ` keyframes
  *    dispatch to [[Vp8Decoder]] (round 18, RFC 6386), and animations
  *    decode their FIRST frame (`ANMF` dive below) — `VP8X`-extended
  *    containers are walked to find the inner bitstream either way. Only
  *    genuinely malformed/truncated payloads ride the `undecodable`
  *    attrition status now.
  *  - the alpha channel is decoded (it participates in every transform
  *    and prefix code) but DROPPED at the sample-extraction step — the
  *    battery and hashes are defined over opaque pixel content, matching
  *    how the GIF decoder reads a transparent index as its table RGB.
  *  - anything malformed, truncated, or over the [[MaxPlaneBytes]]
  *    allocation budget decodes to null (adversarial crawl bytes are
  *    data, not errors): every buffer is sized AFTER its dimensions pass
  *    the budget check, and a bit reader running off the payload end
  *    poisons the decode instead of looping.
  */
object WebpDecoder {

  /** Same decode-buffer budget as [[JpegDecoder]]: 64 MiB. */
  private val MaxPlaneBytes = 1 << 26

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16)).toLong |
      (u8(b, i + 3).toLong << 24)

  def isWebp(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P'

  /** Decode a WebP payload — a still VP8L, a lossy VP8 keyframe, or the
    * FIRST frame of an animation (`ANMF`, over its own rectangle: the GIF
    * frame-0 convention — compositing later frames onto the canvas is out
    * of scope by design) — or null for anything malformed / oversized. */
  def decode(b: Array[Byte]): JpegDecoder.Decoded = {
    if (!isWebp(b)) return null
    // RIFF chunk walk: fourcc + u32le size + payload, padded to even
    var pos = 12
    while (pos + 8 <= b.length) {
      val size = le32(b, pos + 4)
      val body = pos + 8
      if (size < 0 || body + size > b.length) return null
      val fourcc = (u8(b, pos) << 24) | (u8(b, pos + 1) << 16) |
        (u8(b, pos + 2) << 8) | u8(b, pos + 3)
      fourcc match {
        case 0x5650384c => // "VP8L"
          return decodeVp8l(b, body, size.toInt)
        case 0x56503820 => // "VP8 " (lossy keyframe)
          return Vp8Decoder.decode(b, body, size.toInt)
        case 0x414e4d46 if size >= 16 => // "ANMF" (animation frame)
          // 16-byte frame header (x/y/w-1/h-1 as u24s, duration, flags),
          // then the frame's own image subchunks (ALPH? + VP8/VP8L).
          // Diving into the body makes the walk find the FIRST frame's
          // bitstream — the GIF frame-0 convention, over its own
          // rectangle (the frame header's dims duplicate the bitstream's;
          // compositing later frames onto the canvas is out of scope by
          // design). ANIM (global loop params) has no subchunks and is
          // skipped below like VP8X/ICCP/EXIF.
          pos = body + 16
        case _ => // VP8X / ICCP / EXIF / ANIM / ALPH ... : skip
          pos = body + size.toInt + (size.toInt & 1)
      }
    }
    null
  }

  // ---- bit reader: LSB-first within bytes (the DEFLATE convention) ----

  private final class BitReader(b: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var bit = 0
    var eof = false
    def readBit(): Int = {
      if (pos >= end) { eof = true; return 0 }
      val v = (b(pos) >> bit) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      v
    }
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= readBit() << i; i += 1 }
      v
    }
  }

  // ---- canonical prefix codes (DEFLATE-convention code assignment) ----

  /** Max VP8L code length is 15; `counts(len)` + symbols sorted by
    * (length, symbol) drive the classic table-free canonical decode.
    * `single >= 0` marks a one-symbol code, which consumes ZERO bits. */
  private final class PrefixCode(
      val counts: Array[Int], val syms: Array[Int], val single: Int)

  private def buildPrefix(lengths: Array[Int]): PrefixCode = {
    var nonZero = 0
    var lastSym = -1
    var i = 0
    while (i < lengths.length) {
      if (lengths(i) != 0) { nonZero += 1; lastSym = i }
      i += 1
    }
    if (nonZero == 0) return null
    if (nonZero == 1) return new PrefixCode(null, null, lastSym)
    val counts = new Array[Int](16)
    i = 0
    while (i < lengths.length) {
      val l = lengths(i)
      if (l < 0 || l > 15) return null
      if (l != 0) counts(l) += 1
      i += 1
    }
    // Kraft completeness: an under- or over-subscribed code is malformed
    var kraft = 0L
    var l = 1
    while (l <= 15) { kraft += counts(l).toLong << (15 - l); l += 1 }
    if (kraft != (1L << 15)) return null
    // symbols sorted by (length, symbol): stable walk in symbol order
    val offsets = new Array[Int](16)
    var acc = 0
    l = 1
    while (l <= 15) { offsets(l) = acc; acc += counts(l); l += 1 }
    val syms = new Array[Int](nonZero)
    i = 0
    while (i < lengths.length) {
      if (lengths(i) != 0) { syms(offsets(lengths(i))) = i; offsets(lengths(i)) += 1 }
      i += 1
    }
    new PrefixCode(counts, syms, -1)
  }

  /** MSB-first canonical walk (zlib's "decode without tables"). */
  private def readSym(t: PrefixCode, br: BitReader): Int = {
    if (t.single >= 0) return t.single
    var code = 0
    var first = 0
    var index = 0
    var len = 1
    while (len <= 15) {
      code = (code << 1) | br.readBit()
      val cnt = t.counts(len)
      if (code - first < cnt) return t.syms(index + code - first)
      index += cnt
      first = (first + cnt) << 1
      len += 1
    }
    -1
  }

  /** kCodeLengthCodeOrder (spec §6.2.2). */
  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** One prefix code off the stream: "simple" (1–2 symbols) or "normal"
    * (code-length-coded lengths with 16/17/18 repeats). */
  private def readPrefixCode(br: BitReader, alphabetSize: Int): PrefixCode = {
    if (br.readBit() == 1) { // simple
      val numSym = br.readBit() + 1
      val first8 = br.readBit() == 1
      val s0 = br.readBits(if (first8) 8 else 1)
      if (s0 >= alphabetSize) return null
      val lengths = new Array[Int](alphabetSize)
      lengths(s0) = 1
      if (numSym == 2) {
        val s1 = br.readBits(8)
        if (s1 >= alphabetSize || s1 == s0) return null
        lengths(s1) = 1
      }
      buildPrefix(lengths)
    } else {
      val numCl = 4 + br.readBits(4)
      val clLens = new Array[Int](19)
      var i = 0
      while (i < numCl) { clLens(ClOrder(i)) = br.readBits(3); i += 1 }
      val clTree = buildPrefix(clLens)
      if (clTree == null || br.eof) return null
      var maxSymbol =
        if (br.readBit() == 1) {
          val nbits = 2 + 2 * br.readBits(3)
          2 + br.readBits(nbits)
        } else alphabetSize
      if (maxSymbol > alphabetSize) return null
      val lengths = new Array[Int](alphabetSize)
      var sym = 0
      var prevLen = 8
      while (sym < alphabetSize && maxSymbol > 0) {
        maxSymbol -= 1
        val cl = readSym(clTree, br)
        if (cl < 0 || br.eof) return null
        if (cl < 16) {
          lengths(sym) = cl
          sym += 1
          if (cl != 0) prevLen = cl
        } else {
          val (extra, offset, len) = cl match {
            case 16 => (2, 3, prevLen)
            case 17 => (3, 3, 0)
            case _  => (7, 11, 0)
          }
          var repeat = br.readBits(extra) + offset
          if (sym + repeat > alphabetSize) return null
          while (repeat > 0) { lengths(sym) = len; sym += 1; repeat -= 1 }
        }
      }
      buildPrefix(lengths)
    }
  }

  // ---- LZ77 prefix values and the 2D distance map ----

  private def prefixValue(code: Int, br: BitReader): Int =
    if (code < 4) code + 1
    else {
      val extraBits = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extraBits
      offset + br.readBits(extraBits) + 1
    }

  /** The 120-entry near-pixel (dx, dy) map (spec §5.2.2, row-major by
    * growing distance); codes above 120 are plain linear distances. */
  private val DistMap: Array[Int] = {
    val pairs = Array(
      (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
      (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
      (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
      (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
      (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
      (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
      (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
      (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
      (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
      (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
      (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
      (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
      (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
      (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
      (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7))
    pairs.flatMap { case (x, y) => Array(x, y) }
  }

  private def mapDistance(code: Int, xsize: Int): Int =
    if (code > 120) code - 120
    else {
      val dx = DistMap((code - 1) * 2)
      val dy = DistMap((code - 1) * 2 + 1)
      val d = dy * xsize + dx
      if (d < 1) 1 else d
    }

  // ---- transforms ----

  private final case class Transform(
      kind: Int, bits: Int, xsize: Int, data: Array[Int], paletteSize: Int)

  private def subSize(size: Int, bits: Int): Int =
    (size + (1 << bits) - 1) >> bits

  // ---- the recursive image stream ----

  /** Color-cache insert hash (spec §5.2.3). */
  private def cacheHash(argb: Int, bits: Int): Int =
    (0x1e35a7bd * argb) >>> (32 - bits)

  /** Decode one entropy-coded image stream. `transformsOut` is non-null
    * only for the top-level call, which alone may carry transforms; the
    * returned array is the SPATIALLY-CODED image (inverse transforms are
    * the caller's second phase). Returns null on any malformation. */
  private def decodeStream(
      br: BitReader,
      xsize0: Int,
      ysize: Int,
      transformsOut: java.util.ArrayList[Transform]): Array[Int] = {
    var xs = xsize0
    if (transformsOut != null) {
      var seen = 0
      while (br.readBit() == 1) {
        if (br.eof) return null
        val kind = br.readBits(2)
        if ((seen & (1 << kind)) != 0) return null // each at most once
        seen |= 1 << kind
        kind match {
          case 0 | 1 => // PREDICTOR / COLOR: subresolution data image
            val bits = br.readBits(3) + 2
            val data = decodeStream(br, subSize(xs, bits), subSize(ysize, bits), null)
            if (data == null) return null
            transformsOut.add(Transform(kind, bits, xs, data, 0))
          case 2 => // SUBTRACT_GREEN
            transformsOut.add(Transform(2, 0, xs, null, 0))
          case _ => // COLOR_INDEXING: palette + sub-byte bundling
            val n = br.readBits(8) + 1
            val deltas = decodeStream(br, n, 1, null)
            if (deltas == null) return null
            val palette = new Array[Int](n)
            var prev = 0
            var i = 0
            while (i < n) { // per-channel mod-256 delta decode
              val d = deltas(i)
              val p = (((prev >>> 24) + (d >>> 24)) & 0xff) << 24 |
                ((((prev >> 16) & 0xff) + ((d >> 16) & 0xff)) & 0xff) << 16 |
                ((((prev >> 8) & 0xff) + ((d >> 8) & 0xff)) & 0xff) << 8 |
                (((prev & 0xff) + (d & 0xff)) & 0xff)
              palette(i) = p
              prev = p
              i += 1
            }
            val widthBits =
              if (n <= 2) 3 else if (n <= 4) 2 else if (n <= 16) 1 else 0
            transformsOut.add(Transform(3, widthBits, xs, palette, n))
            xs = subSize(xs, widthBits)
        }
        if (br.eof) return null
      }
    }
    // color cache
    val cacheBits = if (br.readBit() == 1) br.readBits(4) else 0
    if (cacheBits > 11) return null
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    // meta prefix groups (top-level streams only — the bit itself is
    // only present at the top level, mirroring the spec's recursion)
    var huffImage: Array[Int] = null
    var huffBits = 0
    var numGroups = 1
    if (transformsOut != null && br.readBit() == 1) {
      huffBits = br.readBits(3) + 2
      huffImage = decodeStream(br, subSize(xs, huffBits), subSize(ysize, huffBits), null)
      if (huffImage == null) return null
      var m = 0
      var i = 0
      while (i < huffImage.length) {
        val idx = (huffImage(i) >> 8) & 0xffff // (red << 8) | green
        if (idx > m) m = idx
        i += 1
      }
      numGroups = m + 1 // bounded by the 16-bit (red<<8)|green meta index
    }
    if (br.eof) return null
    val greenAlpha = 256 + 24 + cacheSize
    val groups = new Array[Array[PrefixCode]](numGroups)
    var g = 0
    while (g < numGroups) {
      val codes = new Array[PrefixCode](5)
      val sizes = Array(greenAlpha, 256, 256, 256, 40)
      var c = 0
      while (c < 5) {
        codes(c) = readPrefixCode(br, sizes(c))
        if (codes(c) == null || br.eof) return null
        c += 1
      }
      groups(g) = codes
      g += 1
    }
    // LZ77 + cache pixel loop
    val total = xs * ysize
    val pix = new Array[Int](total)
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    var pos = 0
    var x = 0
    var group = groups(0)
    var lastHuffKey = -1
    val huffW = if (huffImage != null) subSize(xs, huffBits) else 0
    while (pos < total) {
      if (huffImage != null) {
        val key = ((pos / xs) >> huffBits) * huffW + (x >> huffBits)
        if (key != lastHuffKey) {
          lastHuffKey = key
          group = groups((huffImage(key) >> 8) & 0xffff)
        }
      }
      val s = readSym(group(0), br)
      if (s < 0 || br.eof) return null
      if (s < 256) {
        val r = readSym(group(1), br)
        val bl = readSym(group(2), br)
        val a = readSym(group(3), br)
        if ((r | bl | a) < 0) return null
        val argb = (a << 24) | (r << 16) | (s << 8) | bl
        pix(pos) = argb
        if (cache != null) cache(cacheHash(argb, cacheBits)) = argb
        pos += 1; x += 1; if (x == xs) x = 0
      } else if (s < 280) {
        val length = prefixValue(s - 256, br)
        val distSym = readSym(group(4), br)
        if (distSym < 0 || br.eof) return null
        val dist0 = mapDistance(prefixValue(distSym, br), xs)
        val dist = if (dist0 > pos) return null else dist0
        if (pos + length > total) return null
        var i = 0
        while (i < length) {
          val argb = pix(pos - dist)
          pix(pos) = argb
          if (cache != null) cache(cacheHash(argb, cacheBits)) = argb
          pos += 1; x += 1; if (x == xs) x = 0
          i += 1
        }
      } else {
        val idx = s - 280
        if (cache == null || idx >= cacheSize) return null
        pix(pos) = cache(idx)
        pos += 1; x += 1; if (x == xs) x = 0
      }
    }
    if (br.eof) return null
    pix
  }

  // ---- inverse transforms ----

  private def addPixels(a: Int, b: Int): Int =
    ((((a >>> 24) + (b >>> 24)) & 0xff) << 24) |
      (((((a >> 16) & 0xff) + ((b >> 16) & 0xff)) & 0xff) << 16) |
      (((((a >> 8) & 0xff) + ((b >> 8) & 0xff)) & 0xff) << 8) |
      ((((a & 0xff) + (b & 0xff)) & 0xff))

  private def average2(a: Int, b: Int): Int =
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b) // per-channel floor average

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def clampAddSubtractFull(a: Int, b: Int, c: Int): Int = {
    var out = 0
    var shift = 0
    while (shift < 32) {
      val v = ((a >>> shift) & 0xff) + ((b >>> shift) & 0xff) - ((c >>> shift) & 0xff)
      out |= clamp255(v) << shift
      shift += 8
    }
    out
  }

  private def clampAddSubtractHalf(ave: Int, c: Int): Int = {
    var out = 0
    var shift = 0
    while (shift < 32) {
      val a = (ave >>> shift) & 0xff
      val v = a + (a - ((c >>> shift) & 0xff)) / 2
      out |= clamp255(v) << shift
      shift += 8
    }
    out
  }

  private def select(l: Int, t: Int, tl: Int): Int = {
    var pL = 0
    var pT = 0
    var shift = 0
    while (shift < 32) {
      val cl = (l >>> shift) & 0xff
      val ct = (t >>> shift) & 0xff
      val p = cl + ct - ((tl >>> shift) & 0xff)
      pL += math.abs(p - cl)
      pT += math.abs(p - ct)
      shift += 8
    }
    if (pL < pT) l else t
  }

  /** In-place inverse predictor (spec §4.1: black / L / T edge overrides,
    * continuous-buffer TR at the right edge). */
  private def inversePredictor(pix: Array[Int], xs: Int, ys: Int, t: Transform): Unit = {
    val pw = subSize(xs, t.bits)
    var pos = 0
    var y = 0
    while (y < ys) {
      var x = 0
      while (x < xs) {
        val pred =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) pix(pos - 1)
          else if (x == 0) pix(pos - xs)
          else {
            val mode = (t.data((y >> t.bits) * pw + (x >> t.bits)) >> 8) & 0xff
            val l = pix(pos - 1)
            val top = pix(pos - xs)
            val tl = pix(pos - xs - 1)
            val tr = pix(pos - xs + 1) // x == xs-1 wraps to this row's x=0
            mode match {
              case 0  => 0xff000000
              case 1  => l
              case 2  => top
              case 3  => tr
              case 4  => tl
              case 5  => average2(average2(l, tr), top)
              case 6  => average2(l, tl)
              case 7  => average2(l, top)
              case 8  => average2(tl, top)
              case 9  => average2(top, tr)
              case 10 => average2(average2(l, tl), average2(top, tr))
              case 11 => select(l, top, tl)
              case 12 => clampAddSubtractFull(l, top, tl)
              case 13 => clampAddSubtractHalf(average2(l, top), tl)
              case _  => 0xff000000 // modes > 13 are invalid; decode as black
            }
          }
        pix(pos) = addPixels(pix(pos), pred)
        pos += 1
        x += 1
      }
      y += 1
    }
  }

  /** `(t * c) >> 5` over SIGNED bytes (spec §4.2). */
  private def colorDelta(t: Int, c: Int): Int = ((t.toByte * c.toByte) >> 5) & 0xff

  private def inverseColor(pix: Array[Int], xs: Int, ys: Int, t: Transform): Unit = {
    val cw = subSize(xs, t.bits)
    var pos = 0
    var y = 0
    while (y < ys) {
      var x = 0
      while (x < xs) {
        val cte = t.data((y >> t.bits) * cw + (x >> t.bits))
        val g2r = cte & 0xff // blue channel carries green_to_red
        val g2b = (cte >> 8) & 0xff // green carries green_to_blue
        val r2b = (cte >> 16) & 0xff // red carries red_to_blue
        val p = pix(pos)
        val g = (p >> 8) & 0xff
        var r = (p >> 16) & 0xff
        var b = p & 0xff
        r = (r + colorDelta(g2r, g)) & 0xff
        b = (b + colorDelta(g2b, g)) & 0xff
        b = (b + colorDelta(r2b, r)) & 0xff
        pix(pos) = (p & 0xff000000) | (r << 16) | (g << 8) | b
        pos += 1
        x += 1
      }
      y += 1
    }
  }

  private def inverseSubtractGreen(pix: Array[Int]): Unit = {
    var i = 0
    while (i < pix.length) {
      val p = pix(i)
      val g = (p >> 8) & 0xff
      val r = (((p >> 16) & 0xff) + g) & 0xff
      val b = ((p & 0xff) + g) & 0xff
      pix(i) = (p & 0xff00ff00) | (r << 16) | b
      i += 1
    }
  }

  /** Expand a color-indexed (possibly sub-byte-bundled) image back to
    * full width through the palette; indices are packed LSB-first within
    * the green byte. Out-of-palette indices decode as transparent black
    * (never an error — adversarial bytes are data). */
  private def inverseColorIndex(
      pix: Array[Int], xs: Int, ys: Int, t: Transform): Array[Int] = {
    val palette = t.data
    if (t.bits == 0) {
      var i = 0
      while (i < pix.length) {
        val idx = (pix(i) >> 8) & 0xff
        pix(i) = if (idx < t.paletteSize) palette(idx) else 0
        i += 1
      }
      pix
    } else {
      val packedW = subSize(xs, t.bits)
      val bpp = 8 >> t.bits
      val mask = (1 << bpp) - 1
      val out = new Array[Int](xs * ys)
      var y = 0
      while (y < ys) {
        var x = 0
        while (x < xs) {
          val packed = (pix(y * packedW + (x >> t.bits)) >> 8) & 0xff
          val idx = (packed >> ((x & ((1 << t.bits) - 1)) * bpp)) & mask
          out(y * xs + x) = if (idx < t.paletteSize) palette(idx) else 0
          x += 1
        }
        y += 1
      }
      out
    }
  }

  // ---- the VP8L payload ----

  private def decodeVp8l(b: Array[Byte], off: Int, len: Int): JpegDecoder.Decoded = {
    if (len < 5 || u8(b, off) != 0x2f) return null
    val br = new BitReader(b, off + 1, off + len)
    val w = br.readBits(14) + 1
    val h = br.readBits(14) + 1
    br.readBits(1) // alpha-is-used hint
    if (br.readBits(3) != 0) return null // version must be 0
    if (w.toLong * h * 4 > MaxPlaneBytes) return null
    val transforms = new java.util.ArrayList[Transform]()
    var pix = decodeStream(br, w, h, transforms)
    if (pix == null) return null
    // inverse transforms in reverse read order, each at the dims it saw
    var ti = transforms.size() - 1
    while (ti >= 0) {
      val t = transforms.get(ti)
      t.kind match {
        case 0 => inversePredictor(pix, t.xsize, h, t)
        case 1 => inverseColor(pix, t.xsize, h, t)
        case 2 => inverseSubtractGreen(pix)
        case _ => pix = inverseColorIndex(pix, t.xsize, h, t)
      }
      ti -= 1
    }
    if (pix.length != w * h) return null
    // gray detection (the GIF convention): 1 channel iff r == g == b
    // for EVERY pixel; alpha drops either way
    var gray = true
    var i = 0
    while (gray && i < pix.length) {
      val p = pix(i)
      val g = (p >> 8) & 0xff
      gray = ((p >> 16) & 0xff) == g && (p & 0xff) == g
      i += 1
    }
    if (gray) {
      val s = new Array[Byte](w * h)
      i = 0
      while (i < pix.length) { s(i) = ((pix(i) >> 8) & 0xff).toByte; i += 1 }
      new JpegDecoder.Decoded(w, h, 1, s)
    } else {
      val s = new Array[Byte](w * h * 3)
      i = 0
      while (i < pix.length) {
        val p = pix(i)
        s(i * 3) = ((p >> 16) & 0xff).toByte
        s(i * 3 + 1) = ((p >> 8) & 0xff).toByte
        s(i * 3 + 2) = (p & 0xff).toByte
        i += 1
      }
      new JpegDecoder.Decoded(w, h, 3, s)
    }
  }
}
