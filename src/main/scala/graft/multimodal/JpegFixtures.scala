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

  // ---------------------------------------------------------------------
  // General coefficient encoder: arbitrary quantized blocks, baseline OR
  // progressive coding of the SAME coefficients. Spec-derived from T.81
  // F.1.2 (sequential), G.1.2.1–G.1.2.3 (progressive: spectral selection,
  // successive approximation, EOB-run coding). Because both codings
  // transmit the same final coefficients, a conformant decoder must
  // produce IDENTICAL pixels for the two encodings — the two-spelling
  // round-trip JpegDecodeSpec pins against the native decoder.
  // ---------------------------------------------------------------------

  /** Entropy-layer token: a Huffman-coded SYMBOL or RAW appended bits. */
  private sealed trait Tok
  private final case class Sym(rs: Int) extends Tok
  private final case class Raw(v: Int, n: Int) extends Tok

  /** Magnitude category (T.81 F.1.2.1.2). */
  private def cat(v: Int): Int =
    if (v == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** F.1.2.1.3 extension bits: negatives append `v + 2^s - 1`. */
  private def extraBits(v: Int, s: Int): Int =
    if (v < 0) v + (1 << s) - 1 else v

  /** Single-length canonical table over the distinct `symbols` (first-
    * appearance order): every code is L bits with n < 2^L, so the
    * all-ones code stays unused (T.81 C.2 reserves it). (BITS, HUFFVAL). */
  private def fixedLenTable(symbols: Seq[Int]): (Array[Int], Array[Int]) = {
    val distinct = symbols.distinct
    require(distinct.nonEmpty && distinct.size < 256, s"${distinct.size} symbols")
    var L = 1
    while ((1 << L) <= distinct.size) L += 1
    val bits = new Array[Int](16)
    bits(L - 1) = distinct.size
    (bits, distinct.toArray)
  }

  /** One AC band's FIRST pass (G.1.2.2) over every block, with EOB-run
    * accumulation across blocks; coefficients arrive point-transformed
    * (sign × (|v| >> al)). */
  private final class AcFirst(ss: Int, se: Int, al: Int) {
    val toks = scala.collection.mutable.ArrayBuffer.empty[Tok]
    private var eobrun = 0
    private def emitEobrun(): Unit = if (eobrun > 0) {
      val nbits = 31 - Integer.numberOfLeadingZeros(eobrun)
      toks += Sym(nbits << 4)
      if (nbits > 0) toks += Raw(eobrun - (1 << nbits), nbits)
      eobrun = 0
    }
    def block(zz: Array[Int]): Unit = {
      var run = 0
      var k = ss
      while (k <= se) {
        val raw = zz(k)
        val v = if (raw < 0) -((-raw) >> al) else raw >> al
        if (v == 0) run += 1
        else {
          emitEobrun()
          while (run > 15) { toks += Sym(0xf0); run -= 16 } // ZRL
          val s = cat(v)
          toks += Sym((run << 4) | s)
          toks += Raw(extraBits(v, s) & ((1 << s) - 1), s)
          run = 0
        }
        k += 1
      }
      if (run > 0) { eobrun += 1; if (eobrun == 0x7fff) emitEobrun() }
    }
    def finish(): Unit = emitEobrun()
  }

  /** One AC band's REFINEMENT pass (G.1.2.3): correction bits for
    * history-nonzero coefficients ride after the symbol (or EOB run)
    * they fall under; newly-nonzero coefficients are run-coded with
    * s = 1 and a sign bit. The buffering discipline (`br` per run
    * segment, `pending` across the EOB region) is the figure G.7
    * bookkeeping. */
  private final class AcRefine(ss: Int, se: Int, al: Int) {
    val toks = scala.collection.mutable.ArrayBuffer.empty[Tok]
    private var eobrun = 0
    private val pending = scala.collection.mutable.ArrayBuffer.empty[Int]
    private def emitEobrun(): Unit = if (eobrun > 0) {
      val nbits = 31 - Integer.numberOfLeadingZeros(eobrun)
      toks += Sym(nbits << 4)
      if (nbits > 0) toks += Raw(eobrun - (1 << nbits), nbits)
      eobrun = 0
      pending.foreach(b => toks += Raw(b, 1))
      pending.clear()
    }
    def block(zz: Array[Int]): Unit = {
      val abs = new Array[Int](se + 1)
      var eob = ss - 1
      var k = ss
      while (k <= se) {
        val a = math.abs(zz(k)) >> al
        abs(k) = a
        if (a == 1) eob = k
        k += 1
      }
      var r = 0
      val br = scala.collection.mutable.ArrayBuffer.empty[Int]
      k = ss
      while (k <= se) {
        val a = abs(k)
        if (a == 0) r += 1
        else {
          // ZRLs that can't fold into the EOB flush at EVERY nonzero —
          // including history ones — so the decoder's 16-zero walk and
          // the correction-bit interleaving stay aligned (figure G.7)
          while (r > 15 && k <= eob) {
            emitEobrun()
            toks += Sym(0xf0)
            r -= 16
            br.foreach(b => toks += Raw(b, 1))
            br.clear()
          }
          if (a > 1) br += (a & 1) // history: correction bit only
          else {
            emitEobrun()
            toks += Sym((r << 4) | 1)
            toks += Raw(if (zz(k) < 0) 0 else 1, 1) // sign of the new ±1
            br.foreach(b => toks += Raw(b, 1))
            br.clear()
            r = 0
          }
        }
        k += 1
      }
      if (r > 0 || br.nonEmpty) {
        eobrun += 1
        pending ++= br
        if (eobrun == 0x7fff) emitEobrun()
      }
    }
    def finish(): Unit = emitEobrun()
  }

  /** Encode a grayscale (blocksW·8)×(blocksH·8) frame from per-block
    * ZIGZAG-order quantized coefficients (DC at index 0, all-ones
    * quantization so the values ARE the dequantized coefficients),
    * baseline (SOF0, one interleaved-free scan) or progressive (SOF2:
    * DC first at point transform `al`, DC refinements down to 0, two
    * spectral AC bands `1..splitAt` / `splitAt+1..63`, each with a
    * first pass at `al` and refinements down to 0). Every AC scan
    * carries its own just-big-enough DHT; |coef| must stay ≤ 1023 so
    * DC-diff categories fit Annex K.3. */
  def encodeCoefMosaic(
      blocks: Array[Array[Int]],
      blocksW: Int,
      blocksH: Int,
      progressive: Boolean,
      al: Int = 1,
      splitAt: Int = 5): Array[Byte] = {
    require(blocks.length == blocksW * blocksH && blocks.forall(_.length == 64))
    require(blocks.forall(_.forall(c => c >= -1024 && c <= 1023)), "coef overflow")
    require(al >= 0 && al <= 10 && splitAt >= 1 && splitAt < 63)
    val out = new java.io.ByteArrayOutputStream(1024 + 8 * blocks.length)
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def be2(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def dht(cls: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); be2(2 + 1 + 16 + vals.length)
      out.write(cls << 4)
      bits.foreach(out.write); vals.foreach(out.write)
    }
    def sos(ss: Int, se: Int, ah: Int, alv: Int): Unit = {
      marker(0xda); be2(2 + 1 + 2 + 3)
      out.write(1); out.write(1); out.write(0x00)
      out.write(ss); out.write(se); out.write((ah << 4) | alv)
    }
    def writeToks(toks: Seq[Tok], codes: Map[Int, (Int, Int)]): Unit = {
      val bw = new BitWriter(out)
      toks.foreach {
        case Sym(rs) => val (c, l) = codes(rs); bw.put(c, l)
        case Raw(v, n) => if (n > 0) bw.put(v, n)
      }
      bw.flush()
    }
    marker(0xd8) // SOI
    marker(0xdb); be2(2 + 1 + 64); out.write(0x00)
    var i = 0
    while (i < 64) { out.write(1); i += 1 } // all-ones quantization
    marker(if (progressive) 0xc2 else 0xc0); be2(8 + 3)
    out.write(8); be2(blocksH * 8); be2(blocksW * 8)
    out.write(1); out.write(1); out.write(0x11); out.write(0)
    dht(0, DcBits, DcVals) // K.3 DC, both codings

    def dcFirstToks(alv: Int): Seq[Tok] = {
      val toks = scala.collection.mutable.ArrayBuffer.empty[Tok]
      var pred = 0
      blocks.foreach { zz =>
        val dc = zz(0) >> alv // DC point transform: arithmetic shift
        val diff = dc - pred
        pred = dc
        val s = cat(diff)
        toks += Sym(s)
        if (s > 0) toks += Raw(extraBits(diff, s) & ((1 << s) - 1), s)
      }
      toks.toSeq
    }

    if (!progressive) {
      // one sequential scan: DC diff + run-length AC per block (F.1.2)
      val toks = scala.collection.mutable.ArrayBuffer.empty[Tok]
      var pred = 0
      blocks.foreach { zz =>
        val diff = zz(0) - pred
        pred = zz(0)
        val s = cat(diff)
        toks += Sym(-1 - s) // DC symbols tagged negative to split tables
        if (s > 0) toks += Raw(extraBits(diff, s) & ((1 << s) - 1), s)
        var run = 0
        var k = 1
        while (k <= 63) {
          if (zz(k) == 0) run += 1
          else {
            while (run > 15) { toks += Sym(0xf0); run -= 16 }
            val sz = cat(zz(k))
            toks += Sym((run << 4) | sz)
            toks += Raw(extraBits(zz(k), sz) & ((1 << sz) - 1), sz)
            run = 0
          }
          k += 1
        }
        if (run > 0) toks += Sym(0x00) // EOB
      }
      val acSyms = toks.collect { case Sym(rs) if rs >= 0 => rs }
      val (acBits, acVals) = fixedLenTable(acSyms.toSeq)
      dht(1, acBits, acVals)
      sos(0, 63, 0, 0)
      val acCodes = canonicalCodes(acBits, acVals)
      val bw = new BitWriter(out)
      toks.foreach {
        case Sym(rs) if rs < 0 => val (c, l) = DcCodes(-1 - rs); bw.put(c, l)
        case Sym(rs) => val (c, l) = acCodes(rs); bw.put(c, l)
        case Raw(v, n) => if (n > 0) bw.put(v, n)
      }
      bw.flush()
    } else {
      // scan script: DC first, DC refinements, per-band AC first +
      // refinements — each AC scan preceded by its own DHT
      sos(0, 0, 0, al)
      writeToks(dcFirstToks(al), DcCodes)
      var a = al - 1
      while (a >= 0) { // DC refinement: one raw bit per block, no table
        sos(0, 0, a + 1, a)
        val bw = new BitWriter(out)
        blocks.foreach(zz => bw.put((zz(0) >> a) & 1, 1))
        bw.flush()
        a -= 1
      }
      val bands = Seq((1, splitAt), (splitAt + 1, 63))
      bands.foreach { case (ss, se) =>
        val enc = new AcFirst(ss, se, al)
        blocks.foreach(enc.block)
        enc.finish()
        val syms = enc.toks.collect { case Sym(rs) => rs }
        val (bits, vals) = fixedLenTable(syms.toSeq)
        dht(1, bits, vals)
        sos(ss, se, 0, al)
        writeToks(enc.toks.toSeq, canonicalCodes(bits, vals))
      }
      var ar = al - 1
      while (ar >= 0) {
        bands.foreach { case (ss, se) =>
          val enc = new AcRefine(ss, se, ar)
          blocks.foreach(enc.block)
          enc.finish()
          val syms = enc.toks.collect { case Sym(rs) => rs }
          val (bits, vals) = fixedLenTable(syms.toSeq)
          dht(1, bits, vals)
          sos(ss, se, ar + 1, ar)
          writeToks(enc.toks.toSeq, canonicalCodes(bits, vals))
        }
        ar -= 1
      }
    }
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Progressive (SOF2) twin of [[encodeGrayMosaic]]: the same uniform
    * 8×8 blocks — DC-only, all-ones quantization, exact round-trip —
    * transmitted through the full progressive scan script (successive
    * approximation + two spectral bands). Byte-different from the
    * baseline encoding, pixel-identical after decode. */
  def encodeGrayMosaicProgressive(
      blockValues: Array[Int],
      blocksW: Int,
      blocksH: Int): Array[Byte] = {
    require(blockValues.length == blocksW * blocksH)
    require(blockValues.forall(v => v >= 0 && v <= 255))
    val blocks = blockValues.map { v =>
      val zz = new Array[Int](64)
      zz(0) = 8 * (v - 128)
      zz
    }
    encodeCoefMosaic(blocks, blocksW, blocksH, progressive = true, al = 4)
  }
}
