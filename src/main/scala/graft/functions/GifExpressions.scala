package graft.functions

/** Spec-derived GIF87a/GIF89a decoder (CompuServe GIF specification,
  * 1987/1989, incl. its Appendix F variable-width LZW): logical screen
  * descriptor, global/local color tables, extension-block skipping, the
  * FIRST image descriptor's LZW index stream (CLEAR/EOI codes, 12-bit
  * dictionary cap, LSB-first packing across ≤255-byte sub-blocks), and
  * 4-pass interlace reordering.
  *
  * Output mirrors [[JpegDecoder.Decoded]] so the codec-dispatching image
  * expressions ([[ImagePixelStats]], [[ImageAHash64]], [[ImageDHash64]])
  * give a crawled GIF the same quality battery and perceptual dedup as
  * PNG and JPEG: 8-bit interleaved samples, 1 channel when the active
  * color table is entirely grayscale (r==g==b for every entry), else 3.
  *
  * Scope and honesty notes:
  *  - frame 0 only, over its own rectangle: signals/hashes ride the
  *    still-image content class; animation compositing (disposal, later
  *    frames, logical-screen placement) is out of scope by design.
  *  - a transparent index (GIF89a graphic control) is read as its color
  *    table RGB — frame 0 has nothing underneath it to composite.
  *  - anything malformed or over the [[MaxPlaneBytes]] allocation budget
  *    decodes to null (adversarial crawl bytes are data, not errors), so
  *    forged headers cannot force large allocations: every buffer is
  *    sized AFTER its dimensions pass the budget check.
  */
object GifDecoder {

  /** Same decode-buffer budget as [[JpegDecoder]]: 64 MiB. */
  private val MaxPlaneBytes = 1 << 26

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

  def isGif(b: Array[Byte]): Boolean =
    b != null && b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  /** Decode frame 0 of a GIF payload, or null for anything unsupported /
    * malformed / oversized. */
  def decode(b: Array[Byte]): JpegDecoder.Decoded = {
    if (!isGif(b) || b.length < 13) return null
    // logical screen descriptor: only the global-color-table flag matters
    // for frame 0 over its own rectangle (screen dims are layout hints)
    val lsdFlags = u8(b, 10)
    var pos = 13
    var gct: Array[Byte] = null
    if ((lsdFlags & 0x80) != 0) {
      val n = 3 * (1 << ((lsdFlags & 7) + 1))
      if (pos + n > b.length) return null
      gct = java.util.Arrays.copyOfRange(b, pos, pos + n)
      pos += n
    }
    while (pos < b.length) {
      u8(b, pos) match {
        case 0x21 => // extension: label + data sub-blocks, all skipped
          pos += 2
          if (pos > b.length) return null
          var len = if (pos < b.length) u8(b, pos) else return null
          while (len != 0) {
            pos += 1 + len
            if (pos >= b.length) return null
            len = u8(b, pos)
          }
          pos += 1
        case 0x2c => // image descriptor: the frame we decode
          if (pos + 10 > b.length) return null
          val fw = le16(b, pos + 5)
          val fh = le16(b, pos + 7)
          val flags = u8(b, pos + 9)
          pos += 10
          var table = gct
          if ((flags & 0x80) != 0) {
            val n = 3 * (1 << ((flags & 7) + 1))
            if (pos + n > b.length) return null
            table = java.util.Arrays.copyOfRange(b, pos, pos + n)
            pos += n
          }
          if (table == null || fw <= 0 || fh <= 0) return null
          if (fw.toLong * fh * 3 > MaxPlaneBytes) return null
          return decodeFrame(b, pos, fw, fh, (flags & 0x40) != 0, table)
        case 0x3b => return null // trailer before any image
        case _    => return null // desynchronized
      }
    }
    null
  }

  /** LZW-decode the index stream at `pos` (min-code-size byte + data
    * sub-blocks) into `fw`×`fh` samples through `table`. */
  private def decodeFrame(b: Array[Byte], start: Int, fw: Int, fh: Int,
      interlaced: Boolean, table: Array[Byte]): JpegDecoder.Decoded = {
    var pos = start
    if (pos >= b.length) return null
    val minCode = u8(b, pos)
    pos += 1
    if (minCode < 2 || minCode > 8) return null
    val colors = table.length / 3
    val n = fw * fh
    val idx = new Array[Byte](n)
    var out = 0

    // variable-width LSB-first bit reader across the data sub-blocks
    var blockEnd = pos // exclusive end of the current sub-block
    var acc = 0
    var accBits = 0
    var done = false
    def nextCode(width: Int): Int = {
      while (accBits < width) {
        if (pos == blockEnd) {
          if (pos >= b.length) return -1
          val len = u8(b, pos)
          pos += 1
          if (len == 0) { done = true; return -1 }
          if (pos + len > b.length) return -1
          blockEnd = pos + len
        }
        acc |= u8(b, pos) << accBits
        accBits += 8
        pos += 1
      }
      val v = acc & ((1 << width) - 1)
      acc >>>= width
      accBits -= width
      v
    }

    val clear = 1 << minCode
    val eoi = clear + 1
    // dictionary: prefix chain + suffix byte; walk emits reversed via stack
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    var dictSize = eoi + 1
    var width = minCode + 1
    var prev = -1
    while (out < n && !done) {
      val code = nextCode(width)
      if (code < 0) {
        if (!done) return null
      } else if (code == clear) {
        dictSize = eoi + 1
        width = minCode + 1
        prev = -1
      } else if (code == eoi) {
        done = true
      } else if (prev == -1) {
        // first code after CLEAR must be a literal
        if (code >= clear || code >= colors) return null
        idx(out) = code.toByte
        out += 1
        prev = code
      } else {
        // emit string(code) — or string(prev)+first(prev) for the
        // just-about-to-be-defined code (the KwKwK case)
        var sp = 0
        var c = code
        if (code == dictSize) {
          // placeholder: first char of prev's string, appended after walk
          c = prev
          sp = 1
        } else if (code > dictSize) return null
        while (c >= clear + 2) {
          stack(sp) = suffix(c)
          sp += 1
          c = prefix(c)
        }
        if (c >= colors) return null
        val first = c.toByte
        stack(sp) = first
        sp += 1
        if (code == dictSize) stack(0) = first // the KwKwK tail byte
        // dictionary entry: prev + first  (capped at 4096, like encoders)
        if (dictSize < 4096) {
          prefix(dictSize) = prev
          suffix(dictSize) = first
          dictSize += 1
          if (dictSize == (1 << width) && width < 12) width += 1
        }
        prev = code
        // the walk produced the string reversed
        while (sp > 0 && out < n) {
          sp -= 1
          val v = stack(sp) & 0xff
          if (v >= colors) return null
          idx(out) = stack(sp)
          out += 1
        }
        if (sp > 0) done = true // frame full mid-string: ignore the rest
      }
    }
    if (out < n) return null // truncated index stream

    // 4-pass interlace: rows 0,8,16… then 4,12… then 2,6… then 1,3…
    val ordered =
      if (!interlaced) idx
      else {
        val o = new Array[Byte](n)
        var src = 0
        var pass = 0
        val starts = Array(0, 4, 2, 1)
        val steps = Array(8, 8, 4, 2)
        while (pass < 4) {
          var y = starts(pass)
          while (y < fh) {
            System.arraycopy(idx, src * fw, o, y * fw, fw)
            src += 1
            y += steps(pass)
          }
          pass += 1
        }
        o
      }

    // grayscale table ⇒ 1 channel (sample = r); else palette-expanded RGB
    var gray = true
    var i = 0
    while (gray && i + 2 < table.length) {
      gray = table(i) == table(i + 1) && table(i + 1) == table(i + 2)
      i += 3
    }
    if (gray) {
      val s = new Array[Byte](n)
      var j = 0
      while (j < n) { s(j) = table((ordered(j) & 0xff) * 3); j += 1 }
      new JpegDecoder.Decoded(fw, fh, 1, s)
    } else {
      val s = new Array[Byte](n * 3)
      var j = 0
      while (j < n) {
        val at = (ordered(j) & 0xff) * 3
        s(j * 3) = table(at)
        s(j * 3 + 1) = table(at + 1)
        s(j * 3 + 2) = table(at + 2)
        j += 1
      }
      new JpegDecoder.Decoded(fw, fh, 3, s)
    }
  }
}
