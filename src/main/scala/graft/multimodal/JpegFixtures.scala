package graft.multimodal

/** Minimal baseline-JPEG encoder for block-mosaic grayscale fixtures.
  *
  * Spec-derived from ITU-T T.81 (no codebase consulted): SOI → DQT
  * (all-ones luminance table) → SOF0 (8-bit, one component, 1×1
  * sampling) → DHT (Annex K Table K.3 DC luminance; a minimal one-code
  * AC table whose only entry is EOB) → SOS → entropy-coded DC-only
  * blocks → EOI, with standard FF byte stuffing and 1-fill padding.
  *
  * Every 8×8 block is UNIFORM, which makes the image round-trip EXACTLY
  * through any conformant decoder: a constant block's forward DCT is
  * DC-only with DC = 8·(v−128) (an exact integer), quantization by 1 is
  * lossless, the AC coefficients are exactly zero (EOB), and the DC-only
  * inverse DCT reconstructs the constant v with no roundoff. Grayscale
  * avoids the lossy RGB↔YCbCr rounding entirely. That gives fixtures
  * where this file is the independent ENCODER, `javax.imageio` is the
  * independent DECODER, and the expected pixels are known analytically —
  * so a DuckDB oracle can recompute per-channel stats from the block
  * values without any codec (the q86 stored-deflate pattern, one codec
  * up). Mirrors the reference's opaque-payload media model
  * (`/root/reference/README.md` multimodal columns) re-expressed for
  * Spark fixtures.
  */
object JpegFixtures {

  /** T.81 Annex K Table K.3: luminance DC code counts per length 1..16
    * and the category values in canonical order. */
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)

  /** Minimal AC table: a single 1-bit code for run/size 0x00 (EOB) — all
    * this encoder ever emits. Well-formed per T.81 C.2 (any BITS/HUFFVAL
    * pair defines a valid table). */
  private val AcBits = Array(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcVals = Array(0)

  /** Canonical Huffman codes from (BITS, HUFFVAL) — T.81 C.2 code
    * assignment: value → (code, length). */
  private def canonicalCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    val out = Map.newBuilder[Int, (Int, Int)]
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        out += vals(k) -> (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    out.result()
  }

  private val DcCodes = canonicalCodes(DcBits, DcVals)
  private val AcCodes = canonicalCodes(AcBits, AcVals)

  /** MSB-first bit packer with T.81 F.1.2.3 byte stuffing (FF → FF 00)
    * and 1-fill padding on flush. */
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        nbits += 1
        if (nbits == 8) { emit(); acc = 0; nbits = 0 }
        i -= 1
      }
    }
    def flush(): Unit = if (nbits > 0) {
      acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
      emit(); acc = 0; nbits = 0
    }
    private def emit(): Unit = {
      out.write(acc)
      if (acc == 0xff) out.write(0x00) // stuffing: entropy FF is escaped
    }
  }

  /** Encode a (blocksW·8) × (blocksH·8) grayscale baseline JPEG whose
    * 8×8 blocks are uniform with values `blockValues` (raster order,
    * 0..255 each). Single-component scan ⇒ MCU = one data unit, blocks
    * in raster order (T.81 A.2.2 non-interleaved order).
    *
    * `restartInterval > 0` adds a DRI segment and emits RSTn markers
    * every that many MCUs (byte-aligned with 1-fill, DC predictor reset,
    * marker index mod 8 — T.81 F.1.2.3 / E.2.4), putting the decoder's
    * restart machinery under the same two-independent-implementations
    * round-trip as the plain stream. */
  def encodeGrayMosaic(
      blockValues: Array[Int],
      blocksW: Int,
      blocksH: Int,
      restartInterval: Int = 0): Array[Byte] = {
    require(blocksW > 0 && blocksH > 0 && blocksW * 8 <= 65535 && blocksH * 8 <= 65535,
      s"bad mosaic dims ${blocksW}x$blocksH")
    require(blockValues.length == blocksW * blocksH,
      s"need ${blocksW * blocksH} block values, got ${blockValues.length}")
    require(blockValues.forall(v => v >= 0 && v <= 255),
      "block values must be 8-bit samples")
    val out = new java.io.ByteArrayOutputStream(256 + 4 * blockValues.length)
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def be2(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    marker(0xd8) // SOI
    marker(0xdb); be2(2 + 1 + 64); out.write(0x00) // DQT: 8-bit table 0
    var i = 0
    while (i < 64) { out.write(1); i += 1 } // all-ones: quantization is lossless
    marker(0xc0); be2(8 + 3) // SOF0, one component
    out.write(8) // sample precision
    be2(blocksH * 8); be2(blocksW * 8)
    out.write(1) // Nf
    out.write(1); out.write(0x11); out.write(0) // id 1, 1x1 sampling, DQT 0
    def dht(cls: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); be2(2 + 1 + 16 + vals.length)
      out.write(cls << 4) // table id 0
      bits.foreach(out.write); vals.foreach(out.write)
    }
    dht(0, DcBits, DcVals)
    dht(1, AcBits, AcVals)
    if (restartInterval > 0) { marker(0xdd); be2(4); be2(restartInterval) } // DRI
    marker(0xda); be2(2 + 1 + 2 + 3) // SOS
    out.write(1) // Ns
    out.write(1); out.write(0x00) // component 1, DC table 0 / AC table 0
    out.write(0); out.write(63); out.write(0) // Ss, Se, Ah/Al (baseline)
    val bw = new BitWriter(out)
    var prevDc = 0
    var sinceRestart = 0
    var rstIdx = 0
    var b = 0
    while (b < blockValues.length) {
      if (restartInterval > 0 && sinceRestart == restartInterval) {
        bw.flush() // byte-align with 1-fill before the marker
        marker(0xd0 + rstIdx)
        rstIdx = (rstIdx + 1) % 8
        prevDc = 0 // predictors reset at a restart (T.81 E.2.4)
        sinceRestart = 0
      }
      sinceRestart += 1
      val dc = 8 * (blockValues(b) - 128) // FDCT of a constant block, quant 1
      val diff = dc - prevDc
      prevDc = dc
      val cat = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      val (code, len) = DcCodes(cat)
      bw.put(code, len)
      if (cat > 0) {
        // T.81 F.1.2.1.3: negative diffs append (diff - 1) in cat low bits
        val extra = if (diff < 0) diff + (1 << cat) - 1 else diff
        bw.put(extra & ((1 << cat) - 1), cat)
      }
      val (eob, eobLen) = AcCodes(0)
      bw.put(eob, eobLen) // AC all zero
      b += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }
}
