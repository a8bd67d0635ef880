package graft.multimodal

/** Spec-derived WebP VP8L (lossless) ENCODER for test fixtures — written
  * from the public "WebP Lossless Bitstream Specification" independently
  * of [[graft.functions.WebpDecoder]] (encoder and decoder sharing no
  * code is the point: a round-trip exercises both sides' reading of the
  * spec, the GIF-round convention). Emits real bitstreams: canonical
  * prefix codes built from actual symbol frequencies and serialized
  * through the code-length code, optional subtract-green and predictor
  * transforms (with their entropy-coded subresolution images), optional
  * color-indexing with sub-byte pixel bundling, optional LZ77 row-copy
  * backward references, and an optional color cache whose state is
  * emulated exactly as the decoder maintains it.
  */
object WebpFixtures {

  // ---- LSB-first bit writer (the DEFLATE packing VP8L uses) ----

  private final class BitWriter {
    private var buf = new Array[Byte](256)
    private var bytePos = 0
    private var bitPos = 0
    def writeBit(v: Int): Unit = {
      if (bytePos == buf.length) buf = java.util.Arrays.copyOf(buf, buf.length * 2)
      if ((v & 1) != 0) buf(bytePos) = (buf(bytePos) | (1 << bitPos)).toByte
      bitPos += 1
      if (bitPos == 8) { bitPos = 0; bytePos += 1 }
    }
    /** LSB-first field write (spec ReadBits twin). */
    def writeBits(n: Int, v: Int): Unit = {
      var i = 0
      while (i < n) { writeBit((v >> i) & 1); i += 1 }
    }
    /** MSB-first canonical-code write (codes are read bit-by-bit). */
    def writeCodeBits(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { writeBit((code >> i) & 1); i -= 1 }
    }
    def toBytes: Array[Byte] =
      java.util.Arrays.copyOf(buf, if (bitPos == 0) bytePos else bytePos + 1)
  }

  // ---- length-limited canonical Huffman ----

  /** Code lengths from frequencies, max length enforced by the classic
    * halve-and-rebuild fallback. Zero or one used symbol yields lengths
    * the CALLER must special-case (simple codes). */
  private def huffLengths(freq0: Array[Long], maxLen: Int): Array[Int] = {
    val n = freq0.length
    val lengths = new Array[Int](n)
    var freq = freq0.clone()
    var done = false
    while (!done) {
      java.util.Arrays.fill(lengths, 0)
      val used = (0 until n).filter(freq(_) > 0)
      if (used.size <= 1) { used.foreach(lengths(_) = 1); return lengths }
      // plain Huffman over (weight, node) pairs
      final case class Node(w: Long, syms: List[Int])
      val pq = new scala.collection.mutable.PriorityQueue[Node]()(
        Ordering.by[Node, Long](_.w).reverse)
      used.foreach(s => pq.enqueue(Node(freq(s), List(s))))
      while (pq.size > 1) {
        val a = pq.dequeue(); val b = pq.dequeue()
        a.syms.foreach(lengths(_) += 1)
        b.syms.foreach(lengths(_) += 1)
        pq.enqueue(Node(a.w + b.w, a.syms ++ b.syms))
      }
      if (lengths.max <= maxLen) done = true
      else freq = freq.map(f => if (f > 0) (f >> 1) | 1L else 0L)
    }
    lengths
  }

  /** DEFLATE-convention canonical code assignment from lengths. */
  private def canonicalCodes(lengths: Array[Int]): Array[Int] = {
    val maxLen = lengths.max
    val counts = new Array[Int](maxLen + 1)
    lengths.foreach(l => if (l > 0) counts(l) += 1)
    val next = new Array[Int](maxLen + 2)
    var code = 0
    var l = 1
    while (l <= maxLen) { code = (code + counts(l - 1)) << 1; next(l) = code; l += 1 }
    val codes = new Array[Int](lengths.length)
    var i = 0
    while (i < lengths.length) {
      if (lengths(i) > 0) { codes(i) = next(lengths(i)); next(lengths(i)) += 1 }
      i += 1
    }
    codes
  }

  /** kCodeLengthCodeOrder (spec §6.2.2). */
  private val ClOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Serialize ONE prefix code: simple form when 1–2 used symbols all fit
    * 8 bits, else the normal code-length-coded form (every length emitted
    * individually — verbose but unambiguous). */
  private def writePrefixCode(bw: BitWriter, lengths: Array[Int]): Unit = {
    val used = lengths.indices.filter(lengths(_) > 0)
    if (used.size <= 2 && used.forall(_ < 256) && used.forall(lengths(_) == 1)
      && used.nonEmpty) {
      bw.writeBits(1, 1) // simple
      bw.writeBits(1, used.size - 1)
      val s0 = used(0)
      if (s0 < 2 && used.size == 1) { bw.writeBits(1, 0); bw.writeBits(1, s0) }
      else { bw.writeBits(1, 1); bw.writeBits(8, s0) }
      if (used.size == 2) bw.writeBits(8, used(1))
    } else {
      require(used.size >= 2,
        s"normal prefix code needs >=2 used symbols (got $used — symbols >=256 " +
          "cannot ride the simple form)")
      bw.writeBits(1, 0) // normal
      // code-length code over the full length sequence (symbols 0..15)
      val clFreq = new Array[Long](19)
      lengths.foreach(l => clFreq(l) += 1)
      val clLens = huffLengths(clFreq, 7)
      if (clLens.count(_ > 0) == 1) {
        // degenerate CL alphabet: pad with an unused symbol for a
        // complete 1-bit code (the padded symbol is never emitted)
        val s = clLens.indexWhere(_ > 0)
        clLens(s) = 1
        clLens(if (s == 0) 1 else 0) = 1
      }
      bw.writeBits(4, 15) // num_code_lengths = 19: send the full order
      ClOrder.foreach(i => bw.writeBits(3, clLens(i)))
      bw.writeBits(1, 0) // no max-symbol shortcut
      val clCodes = canonicalCodes(clLens)
      lengths.foreach(l => bw.writeCodeBits(clCodes(l), clLens(l)))
    }
  }

  // ---- LZ77 prefix-value encoding (inverse of the decoder's table) ----

  /** `(prefixCode, extraBits, extraVal)` for a length/distance value. */
  private def prefixEncode(v: Int): (Int, Int, Int) = {
    require(v >= 1)
    if (v <= 4) (v - 1, 0, 0)
    else {
      var code = 4
      while (code < 40) {
        val eb = (code - 2) >> 1
        val off = (2 + (code & 1)) << eb
        if (v >= off + 1 && v <= off + (1 << eb)) return (code, eb, v - 1 - off)
        code += 1
      }
      throw new IllegalArgumentException(s"value $v out of prefix range")
    }
  }

  private def cacheHash(argb: Int, bits: Int): Int =
    (0x1e35a7bd * argb) >>> (32 - bits)

  // ---- tokenized entropy-coded image stream ----

  private sealed trait Tok
  private final case class Lit(argb: Int) extends Tok
  private final case class Copy(len: Int, dist: Int) extends Tok
  private final case class CacheRef(idx: Int) extends Tok

  /** One entropy-coded image stream (the recursive unit): color-cache
    * bit, the meta-prefix-groups bit (TOP-LEVEL streams only — subres
    * streams don't carry it, mirroring the spec's recursion), five prefix
    * codes, token emission. `lz77Rows` emits a full-row backward
    * reference (distance = xsize) whenever a row repeats the one above
    * it — enough to exercise the copy path end-to-end. */
  private def writeStream(
      bw: BitWriter,
      pix: Array[Int],
      xsize: Int,
      cacheBits: Int,
      lz77Rows: Boolean,
      isTopLevel: Boolean = false): Unit = {
    // tokenize with an exact emulation of the decoder's cache state
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    val seen = if (cacheSize > 0) new Array[Boolean](cacheSize) else null
    val toks = scala.collection.mutable.ArrayBuffer.empty[Tok]
    def insert(argb: Int): Unit = if (cache != null) {
      val hIdx = cacheHash(argb, cacheBits)
      cache(hIdx) = argb; seen(hIdx) = true
    }
    var i = 0
    while (i < pix.length) {
      var matched = 0
      if (lz77Rows && i >= xsize && i % xsize == 0) {
        while (matched < xsize && i + matched < pix.length &&
          pix(i + matched) == pix(i + matched - xsize)) matched += 1
      }
      if (matched == xsize) {
        toks += Copy(matched, xsize)
        var k = 0
        while (k < matched) { insert(pix(i + k)); k += 1 }
        i += matched
      } else if (cache != null && seen(cacheHash(pix(i), cacheBits)) &&
        cache(cacheHash(pix(i), cacheBits)) == pix(i)) {
        toks += CacheRef(cacheHash(pix(i), cacheBits))
        i += 1
      } else {
        toks += Lit(pix(i))
        insert(pix(i))
        i += 1
      }
    }
    // frequencies per channel tree
    val greenF = new Array[Long](256 + 24 + cacheSize)
    val redF = new Array[Long](256)
    val blueF = new Array[Long](256)
    val alphaF = new Array[Long](256)
    val distF = new Array[Long](40)
    toks.foreach {
      case Lit(p) =>
        greenF((p >> 8) & 0xff) += 1
        redF((p >> 16) & 0xff) += 1
        blueF(p & 0xff) += 1
        alphaF(p >>> 24) += 1
      case Copy(len, dist) =>
        greenF(256 + prefixEncode(len)._1) += 1
        distF(prefixEncode(dist + 120)._1) += 1
      case CacheRef(idx) =>
        greenF(280 + idx) += 1
    }
    // header: color cache, the top-level meta bit, then the five codes
    if (cacheBits > 0) { bw.writeBits(1, 1); bw.writeBits(4, cacheBits) }
    else bw.writeBits(1, 0)
    if (isTopLevel) bw.writeBits(1, 0) // no meta prefix groups
    def lengthsOf(freq: Array[Long], maxLen: Int): Array[Int] = {
      val l = huffLengths(freq, maxLen)
      if (l.forall(_ == 0)) { l(0) = 1 } // unread tree still needs a code
      l
    }
    val greenL = lengthsOf(greenF, 15)
    val redL = lengthsOf(redF, 15)
    val blueL = lengthsOf(blueF, 15)
    val alphaL = lengthsOf(alphaF, 15)
    val distL = lengthsOf(distF, 15)
    Seq(greenL, redL, blueL, alphaL, distL).foreach(writePrefixCode(bw, _))
    val greenC = canonicalCodes(greenL)
    val redC = canonicalCodes(redL)
    val blueC = canonicalCodes(blueL)
    val alphaC = canonicalCodes(alphaL)
    val distC = canonicalCodes(distL)
    // single-symbol codes decode in ZERO bits — hoist the per-tree test
    val gOne = greenL.count(_ > 0) == 1
    val rOne = redL.count(_ > 0) == 1
    val bOne = blueL.count(_ > 0) == 1
    val aOne = alphaL.count(_ > 0) == 1
    val dOne = distL.count(_ > 0) == 1
    def emit(codes: Array[Int], lens: Array[Int], one: Boolean, sym: Int): Unit =
      if (!one) bw.writeCodeBits(codes(sym), lens(sym))
    toks.foreach {
      case Lit(p) =>
        emit(greenC, greenL, gOne, (p >> 8) & 0xff)
        emit(redC, redL, rOne, (p >> 16) & 0xff)
        emit(blueC, blueL, bOne, p & 0xff)
        emit(alphaC, alphaL, aOne, p >>> 24)
      case Copy(len, dist) =>
        val (lc, leb, lev) = prefixEncode(len)
        emit(greenC, greenL, gOne, 256 + lc)
        bw.writeBits(leb, lev)
        val (dc, deb, dev) = prefixEncode(dist + 120)
        emit(distC, distL, dOne, dc)
        bw.writeBits(deb, dev)
      case CacheRef(idx) =>
        emit(greenC, greenL, gOne, 280 + idx)
    }
  }

  // ---- forward transforms ----

  private def subPixels(a: Int, b: Int): Int =
    ((((a >>> 24) - (b >>> 24)) & 0xff) << 24) |
      (((((a >> 16) & 0xff) - ((b >> 16) & 0xff)) & 0xff) << 16) |
      (((((a >> 8) & 0xff) - ((b >> 8) & 0xff)) & 0xff) << 8) |
      ((((a & 0xff) - (b & 0xff)) & 0xff))

  private def average2(a: Int, b: Int): Int =
    (((a ^ b) & 0xfefefefe) >>> 1) + (a & b)

  /** Forward predictor: residual = pixel − prediction over the ORIGINAL
    * neighbors (the decoder reconstructs raster-order, so its neighbors
    * at inverse time are these originals). Fixed `mode` everywhere; the
    * spec's edge overrides (black / L / T) take precedence. Only modes
    * 0/1/2/7 are emitted by fixtures — enough to exercise the block walk
    * and every edge rule. */
  private def forwardPredict(pix: Array[Int], xs: Int, ys: Int, mode: Int): Array[Int] = {
    val out = new Array[Int](pix.length)
    var pos = 0
    var y = 0
    while (y < ys) {
      var x = 0
      while (x < xs) {
        val pred =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) pix(pos - 1)
          else if (x == 0) pix(pos - xs)
          else mode match {
            case 0 => 0xff000000
            case 1 => pix(pos - 1)
            case 2 => pix(pos - xs)
            case 7 => average2(pix(pos - 1), pix(pos - xs))
            case m => throw new IllegalArgumentException(s"fixture predictor mode $m")
          }
        out(pos) = subPixels(pix(pos), pred)
        pos += 1
        x += 1
      }
      y += 1
    }
    out
  }

  private def subSize(size: Int, bits: Int): Int = (size + (1 << bits) - 1) >> bits

  // ---- the public encoders ----

  /** Encode an ARGB image as a lossless WebP. Knobs pick the bitstream
    * features the payload exercises; every combination round-trips
    * bit-exactly (WebpSpec pins them against the independent decoder). */
  def encodeArgb(
      pix: Array[Int],
      w: Int,
      h: Int,
      subtractGreen: Boolean = false,
      predictorMode: Int = -1,
      cacheBits: Int = 0,
      lz77Rows: Boolean = false): Array[Byte] = {
    require(w >= 1 && w <= 16384 && h >= 1 && h <= 16384, s"dims $w x $h")
    require(pix.length == w * h)
    val bw = new BitWriter
    bw.writeBits(8, 0x2f) // VP8L signature
    bw.writeBits(14, w - 1)
    bw.writeBits(14, h - 1)
    bw.writeBits(1, 0) // alpha hint
    bw.writeBits(3, 0) // version
    var px = pix
    // forward transforms in WRITE order; decoder inverts in reverse
    if (subtractGreen) {
      bw.writeBits(1, 1); bw.writeBits(2, 2)
      px = px.map { p =>
        val g = (p >> 8) & 0xff
        (p & 0xff00ff00) |
          (((((p >> 16) & 0xff) - g) & 0xff) << 16) | (((p & 0xff) - g) & 0xff)
      }
    }
    if (predictorMode >= 0) {
      bw.writeBits(1, 1); bw.writeBits(2, 0)
      bw.writeBits(3, 7) // block bits = 9 (coarsest)
      val pw = subSize(w, 9)
      val ph = subSize(h, 9)
      val modeImg = Array.fill(pw * ph)(0xff000000 | (predictorMode << 8))
      writeStream(bw, modeImg, pw, cacheBits = 0, lz77Rows = false)
      px = forwardPredict(px, w, h, predictorMode)
    }
    bw.writeBits(1, 0) // end of transforms
    writeStream(bw, px, w, cacheBits, lz77Rows, isTopLevel = true)
    riffWrap(bw.toBytes)
  }

  /** Color-indexed encode: pixels are palette INDICES; sub-byte bundling
    * kicks in automatically for palettes of ≤16 colors (the spec's packed
    * green-channel form). */
  def encodeIndexed(
      palette: Array[Int],
      indices: Array[Int],
      w: Int,
      h: Int): Array[Byte] = {
    val n = palette.length
    require(n >= 1 && n <= 256, s"palette size $n")
    require(indices.length == w * h && indices.forall(i => i >= 0 && i < n))
    val bw = new BitWriter
    bw.writeBits(8, 0x2f)
    bw.writeBits(14, w - 1)
    bw.writeBits(14, h - 1)
    bw.writeBits(1, 0)
    bw.writeBits(3, 0)
    bw.writeBits(1, 1); bw.writeBits(2, 3) // COLOR_INDEXING
    bw.writeBits(8, n - 1)
    // palette stream: per-channel mod-256 deltas off the previous color
    val deltas = Array.tabulate(n)(i =>
      if (i == 0) palette(0) else subPixels(palette(i), palette(i - 1)))
    writeStream(bw, deltas, n, cacheBits = 0, lz77Rows = false)
    bw.writeBits(1, 0) // end of transforms
    val widthBits = if (n <= 2) 3 else if (n <= 4) 2 else if (n <= 16) 1 else 0
    val packedW = subSize(w, widthBits)
    val bpp = 8 >> widthBits
    val packed = new Array[Int](packedW * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val slot = y * packedW + (x >> widthBits)
        val sub = x & ((1 << widthBits) - 1)
        packed(slot) |= indices(y * w + x) << (sub * bpp)
        x += 1
      }
      y += 1
    }
    val green = packed.map(p => 0xff000000 | ((p & 0xff) << 8))
    writeStream(bw, green, packedW, cacheBits = 0, lz77Rows = false, isTopLevel = true)
    riffWrap(bw.toBytes)
  }

  /** Grayscale convenience (the GIF-fixture twin): `values` are 0–255
    * lumas, encoded r = g = b with opaque alpha. */
  def encodeGray(
      values: Array[Int],
      w: Int,
      h: Int,
      subtractGreen: Boolean = true,
      predictorMode: Int = -1,
      cacheBits: Int = 0,
      lz77Rows: Boolean = false): Array[Byte] = {
    val px = values.map(v => 0xff000000 | (v << 16) | (v << 8) | v)
    encodeArgb(px, w, h, subtractGreen, predictorMode, cacheBits, lz77Rows)
  }

  private def riffWrap(vp8l: Array[Byte]): Array[Byte] = {
    val pad = vp8l.length & 1
    val riffSize = 4 + 8 + vp8l.length + pad
    val out = new Array[Byte](12 + 8 + vp8l.length + pad)
    def fourcc(off: Int, s: String): Unit = {
      out(off) = s(0).toByte; out(off + 1) = s(1).toByte
      out(off + 2) = s(2).toByte; out(off + 3) = s(3).toByte
    }
    def le32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    fourcc(0, "RIFF"); le32(4, riffSize); fourcc(8, "WEBP")
    fourcc(12, "VP8L"); le32(16, vp8l.length)
    System.arraycopy(vp8l, 0, out, 20, vp8l.length)
    out
  }
}
