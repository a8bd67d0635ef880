package graft.multimodal

/** Minimal GIF89a encoder for grayscale fixtures.
  *
  * Spec-derived from the CompuServe GIF89a specification (no codebase
  * consulted): header → logical screen descriptor with a 256-entry
  * grayscale global color table (index i → (i,i,i)) → one image
  * descriptor covering the screen → a REAL variable-width LZW code
  * stream (min code size 8, CLEAR/EOI, dictionary growth to 4096 with
  * CLEAR resets, LSB-first packing into ≤255-byte sub-blocks) → trailer.
  *
  * Because the palette is the identity grayscale ramp, the decoded luma
  * of pixel i IS the fixture's input byte — the expected pixels are
  * known analytically, this file is the independent ENCODER,
  * `javax.imageio` is an independent decoder, and
  * [[graft.functions.GifDecoder]] is the production decoder under test
  * (the three-implementation convention of [[JpegFixtures]], one codec
  * over). The encoder's code-width bookkeeping deliberately simulates
  * the DECODER's dictionary size (which lags the encoder's by one entry)
  * so the two stay in lockstep at every width change — the classic
  * off-by-one that breaks naive GIF writers.
  */
object GifFixtures {

  /** Encode `pixels` (values 0–255, row-major, `w`×`h`) as a grayscale
    * GIF89a; `interlaced` stores rows in the spec's 4-pass order (the
    * decoder must undo it). */
  def encodeGray(pixels: Array[Int], w: Int, h: Int,
      interlaced: Boolean = false): Array[Byte] = {
    require(pixels.length == w * h, s"${pixels.length} pixels for ${w}x$h")
    require(w > 0 && w < 65536 && h > 0 && h < 65536, s"bad dims ${w}x$h")
    val stored =
      if (!interlaced) pixels
      else {
        val o = new Array[Int](pixels.length)
        var dst = 0
        for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2)); y <- start until h by step) {
          System.arraycopy(pixels, y * w, o, dst * w, w)
          dst += 1
        }
        o
      }
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def le16(v: Int): Unit = { u8(v); u8(v >> 8) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(w); le16(h)
    u8(0xf7) // GCT present, 8 bits/color, 256 entries
    u8(0)    // background index
    u8(0)    // no aspect ratio
    var i = 0
    while (i < 256) { u8(i); u8(i); u8(i); i += 1 }
    u8(0x2c) // image descriptor
    le16(0); le16(0); le16(w); le16(h)
    u8(if (interlaced) 0x40 else 0) // no local table
    u8(8) // LZW min code size
    out.write(lzwEncode(stored))
    u8(0)    // block terminator
    u8(0x3b) // trailer
    out.toByteArray
  }

  /** LZW-compress an index stream (min code size 8) into data
    * sub-blocks. Dictionary keyed by (prefix code << 8 | next byte). */
  private def lzwEncode(px: Array[Int]): Array[Byte] = {
    val clear = 256
    val eoi = 257
    val blocks = new java.io.ByteArrayOutputStream()
    val cur = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var accBits = 0
    def flushByte(): Unit = {
      cur.write((acc & 0xff).toInt)
      acc >>>= 8
      accBits -= 8
      if (cur.size == 255) {
        blocks.write(255)
        blocks.write(cur.toByteArray, 0, 255)
        cur.reset()
      }
    }
    var width = 9
    def emit(code: Int): Unit = {
      acc |= code.toLong << accBits
      accBits += width
      while (accBits >= 8) flushByte()
    }
    // decSize simulates the DECODER's dictionary (one entry behind ours):
    // it adds an entry per code it receives from the SECOND one on, and
    // grows its read width when its size hits 1<<width — emit at exactly
    // that width or the streams desynchronize
    var dict = new java.util.HashMap[Integer, Integer]()
    var nextFree = eoi + 1
    var decSize = eoi + 1
    var codesEmitted = 0
    def emitTracked(code: Int): Unit = {
      emit(code)
      codesEmitted += 1
      if (codesEmitted >= 2) {
        if (decSize < 4096) decSize += 1
        if (decSize == (1 << width) && width < 12) width += 1
      }
    }
    def reset(): Unit = {
      emit(clear)
      dict = new java.util.HashMap[Integer, Integer]()
      nextFree = eoi + 1
      decSize = eoi + 1
      width = 9
      codesEmitted = 0
    }
    emit(clear)
    var prev = px(0) & 0xff
    var i = 1
    while (i < px.length) {
      val c = px(i) & 0xff
      val key: Integer = (prev << 8) | c
      val hit = dict.get(key)
      if (hit != null) {
        prev = hit
      } else {
        emitTracked(prev)
        if (nextFree < 4096) {
          dict.put(key, nextFree)
          nextFree += 1
          prev = c
        } else {
          reset()
          prev = c
        }
      }
      i += 1
    }
    emitTracked(prev)
    emit(eoi)
    while (accBits > 0) flushByte()
    if (cur.size > 0) {
      blocks.write(cur.size)
      blocks.write(cur.toByteArray, 0, cur.size)
    }
    blocks.toByteArray
  }
}
