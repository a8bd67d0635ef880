package graft.functions

/** Spec-derived VP8 intra-frame (lossy WebP) decoder — RFC 6386 ("VP8
  * Data Format and Decoding Guide", public): the boolean arithmetic
  * decoder (§7), keyframe headers (§9), intra mode decoding with the
  * keyframe mode trees (§11), DCT token decoding with the default
  * coefficient probabilities (§13), dequantization (§14.1), the inverse
  * WHT/DCT pair (§14.3–14.4), and full intra prediction — 16×16 / chroma
  * DC/V/H/TM and all ten 4×4 B_PRED modes (§12).
  *
  * Output mirrors [[JpegDecoder.Decoded]] so the codec-dispatching image
  * expressions give a crawled lossy WebP the same quality battery and
  * perceptual dedup as PNG/JPEG/GIF/VP8L: 8-bit interleaved samples,
  * 1 channel when chroma is everywhere neutral (u == v == 128), else 3
  * via the documented BT.601 integer conversion below.
  *
  * Scope and honesty notes:
  *  - KEYFRAMES only (the WebP still-image case — a `VP8 ` chunk is
  *    always a keyframe): interframes need reference frames and decode
  *    to null.
  *  - the loop filter is NOT applied. Streams encoded with
  *    filter_level == 0 (our fixtures, and a common still-image setting)
  *    reconstruct bit-exactly per spec; filtered streams decode to their
  *    unfiltered reconstruction — battery-grade pixels, not
  *    reference-exact. This is the documented trade for a
  *    quality/dedup engine, not a display codec.
  *  - probability tables are transcribed from RFC 6386. The keyframe
  *    B-mode table rows for above ∈ {B_HD, B_HU} are transcribed with
  *    lower confidence (no external reference was available to
  *    cross-check in this environment); a transcription error there
  *    cannot crash or desync our own fixtures (encoder and decoder share
  *    the tables; fixture round-trips are pinned bit-exact) — it could
  *    only mis-prior mode decode on third-party streams.
  *  - YUV→RGB is not normative in RFC 6386; we use the standard BT.601
  *    limited-range integer approximation with nearest-neighbor chroma
  *    upsampling, and short-circuit to 1-channel gray when every chroma
  *    sample is 128 (all our planted fixtures).
  *  - anything malformed, truncated, or over the [[MaxPlaneBytes]]
  *    budget decodes to null (adversarial crawl bytes are data, not
  *    errors); the bool decoder zero-fills a bounded run past the end
  *    (the spec's convention) and poisons the decode beyond it.
  */
object Vp8Decoder {

  /** Same decode-buffer budget as [[JpegDecoder]]: 64 MiB. */
  private val MaxPlaneBytes = 1 << 26

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le24(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16)

  // ---- boolean decoder (RFC 6386 §7.3) ----

  private final class BoolDecoder(b: Array[Byte], start: Int, end: Int) {
    private var pos = start + 2
    private var value =
      (if (start < end) u8(b, start) << 8 else 0) |
        (if (start + 1 < end) u8(b, start + 1) else 0)
    private var range = 255
    private var bitCount = 0
    private var overrun = 0
    def eof: Boolean = overrun > 4

    def bool(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val bigSplit = split << 8
      var ret = 0
      if (value >= bigSplit) { ret = 1; range -= split; value -= bigSplit }
      else range = split
      while (range < 128) {
        value <<= 1
        range <<= 1
        bitCount += 1
        if (bitCount == 8) {
          bitCount = 0
          if (pos < end) { value |= u8(b, pos); pos += 1 }
          else overrun += 1
        }
      }
      ret
    }

    /** Unsigned literal, MSB first (spec "L(n)"). */
    def literal(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bool(128); i += 1 }
      v
    }

    /** Flag-gated signed literal: flag → magnitude(n) → sign. */
    def maybeSigned(n: Int): Int =
      if (bool(128) == 0) 0
      else {
        val v = literal(n)
        if (bool(128) == 1) -v else v
      }

    /** Token-tree read (leaves are `-value`; internal refs positive). */
    def tree(t: Array[Int], probs: Array[Int]): Int = {
      var i = 0
      do i = t(i + bool(probs(i >> 1)))
      while (i > 0)
      -i
    }

    /** Tree read with a probability table offset (for B-mode contexts). */
    def tree(t: Array[Int], probs: Array[Array[Int]], row: Int): Int =
      tree(t, probs(row))
  }

  // ---- mode constants and trees (RFC 6386 §11) ----

  private val DcPred = 0
  private val BPred = 4
  // 16x16 keyframe luma tree/probs: { -B_PRED, 2, 4, 6, -DC, -V, -H, -TM }
  private[graft] val KfYmodeTree = Array(-4, 2, 4, 6, 0, -1, -2, -3)
  private[graft] val KfYmodeProb = Array(145, 156, 163, 128)
  // chroma tree/probs: { -DC, 2, -V, 4, -H, -TM }
  private[graft] val UvModeTree = Array(0, 2, -1, 4, -2, -3)
  private[graft] val KfUvModeProb = Array(142, 114, 183)
  // 4x4 B-mode tree (leaves 0..9 = DC,TM,VE,HE,LD,RD,VR,VL,HD,HU)
  private[graft] val BmodeTree = Array(
    0, 2, -1, 4, -2, 6, 8, 12, -3, 10, -5, -6, -4, 14, -7, 16, -8, -9)
  // segment-id tree over 4 segments
  private val SegmentTree = Array(2, 4, 0, -1, -2, -3)
  // implied subblock mode of a 16x16 mode, for B-mode context
  private val ImpliedBmode = Array(0, 2, 3, 1) // DC→B_DC, V→B_VE, H→B_HE, TM→B_TM

  /** Keyframe B-mode probabilities [above][left][9] (RFC 6386 §11.4 /
    * vp8_kf_bmode_prob). See the file header note on the last two rows. */
  private[graft] val KfBmodeProb: Array[Array[Array[Int]]] = Array(
    Array(
      Array(231, 120, 48, 89, 115, 113, 120, 152, 112),
      Array(152, 179, 64, 126, 170, 118, 46, 70, 95),
      Array(175, 69, 143, 80, 85, 82, 72, 155, 103),
      Array(56, 58, 10, 171, 218, 189, 17, 13, 152),
      Array(114, 26, 17, 163, 44, 195, 21, 10, 173),
      Array(121, 24, 80, 195, 26, 62, 44, 64, 85),
      Array(144, 71, 10, 38, 171, 213, 144, 34, 26),
      Array(170, 46, 55, 19, 136, 160, 33, 206, 71),
      Array(63, 20, 8, 114, 114, 208, 12, 9, 226),
      Array(81, 40, 11, 96, 182, 84, 29, 16, 36)),
    Array(
      Array(134, 183, 89, 137, 98, 101, 106, 165, 148),
      Array(72, 187, 100, 130, 157, 111, 32, 75, 80),
      Array(66, 102, 167, 99, 74, 62, 40, 234, 128),
      Array(41, 53, 9, 178, 241, 141, 26, 8, 107),
      Array(74, 43, 26, 146, 73, 166, 49, 23, 157),
      Array(65, 38, 105, 160, 51, 52, 31, 115, 128),
      Array(104, 79, 12, 27, 217, 255, 87, 17, 7),
      Array(87, 68, 71, 44, 114, 51, 15, 186, 23),
      Array(47, 41, 14, 110, 182, 183, 21, 17, 194),
      Array(66, 45, 25, 102, 197, 189, 23, 18, 22)),
    Array(
      Array(88, 88, 147, 150, 42, 46, 45, 196, 205),
      Array(43, 97, 183, 117, 85, 38, 35, 179, 61),
      Array(39, 53, 200, 87, 26, 21, 43, 232, 171),
      Array(56, 34, 51, 104, 114, 102, 29, 93, 77),
      Array(39, 28, 85, 171, 58, 165, 90, 98, 64),
      Array(34, 22, 116, 206, 23, 34, 43, 166, 73),
      Array(107, 54, 32, 26, 51, 1, 81, 43, 31),
      Array(68, 25, 106, 22, 64, 171, 36, 225, 114),
      Array(34, 16, 112, 21, 31, 231, 86, 6, 213),
      Array(62, 18, 78, 95, 85, 57, 50, 48, 51)),
    Array(
      Array(193, 101, 35, 159, 215, 111, 89, 46, 111),
      Array(60, 148, 31, 172, 219, 228, 21, 18, 111),
      Array(112, 113, 77, 85, 179, 255, 38, 120, 114),
      Array(40, 42, 1, 196, 245, 209, 10, 25, 109),
      Array(88, 43, 29, 140, 166, 213, 37, 43, 154),
      Array(61, 63, 30, 155, 67, 45, 68, 1, 209),
      Array(100, 80, 8, 43, 154, 1, 51, 26, 71),
      Array(142, 78, 78, 16, 255, 128, 34, 197, 171),
      Array(41, 40, 5, 102, 211, 183, 4, 1, 221),
      Array(51, 50, 17, 168, 209, 192, 23, 25, 82)),
    Array(
      Array(138, 31, 36, 171, 27, 166, 38, 44, 229),
      Array(67, 87, 58, 169, 82, 115, 26, 59, 179),
      Array(63, 59, 90, 180, 59, 166, 93, 73, 154),
      Array(40, 40, 21, 116, 143, 209, 34, 39, 175),
      Array(47, 15, 16, 183, 34, 223, 49, 45, 183),
      Array(46, 17, 33, 183, 6, 98, 15, 32, 183),
      Array(57, 46, 22, 24, 128, 1, 54, 17, 37),
      Array(65, 32, 73, 115, 28, 128, 23, 128, 205),
      Array(40, 3, 9, 115, 51, 192, 18, 6, 223),
      Array(87, 37, 9, 115, 59, 77, 64, 21, 47)),
    Array(
      Array(104, 55, 44, 218, 9, 54, 53, 130, 226),
      Array(64, 90, 70, 205, 40, 41, 23, 26, 57),
      Array(54, 57, 112, 184, 5, 41, 38, 166, 213),
      Array(30, 34, 26, 133, 152, 116, 10, 32, 134),
      Array(39, 19, 53, 221, 26, 114, 32, 73, 255),
      Array(31, 9, 65, 234, 2, 15, 1, 118, 73),
      Array(75, 32, 12, 51, 192, 255, 160, 43, 51),
      Array(88, 31, 35, 67, 102, 85, 55, 186, 85),
      Array(56, 21, 23, 111, 59, 205, 45, 37, 192),
      Array(55, 38, 70, 124, 73, 102, 1, 34, 98)),
    Array(
      Array(125, 98, 42, 88, 104, 85, 117, 175, 82),
      Array(95, 84, 53, 89, 128, 100, 113, 101, 45),
      Array(75, 79, 123, 47, 51, 128, 81, 171, 1),
      Array(57, 17, 5, 71, 102, 57, 53, 41, 49),
      Array(38, 33, 13, 121, 57, 73, 26, 1, 85),
      Array(41, 10, 67, 138, 77, 110, 90, 47, 114),
      Array(115, 21, 2, 10, 102, 255, 166, 23, 6),
      Array(101, 29, 16, 10, 85, 128, 101, 196, 26),
      Array(57, 18, 10, 102, 102, 213, 34, 20, 43),
      Array(117, 20, 15, 36, 163, 128, 68, 1, 26)),
    Array(
      Array(102, 61, 71, 37, 34, 53, 31, 243, 192),
      Array(69, 60, 71, 38, 73, 119, 28, 222, 37),
      Array(68, 45, 128, 34, 1, 47, 11, 245, 147),
      Array(62, 17, 19, 70, 146, 85, 55, 62, 70),
      Array(37, 43, 37, 154, 100, 163, 85, 160, 1),
      Array(63, 9, 92, 136, 28, 64, 32, 201, 85),
      Array(75, 15, 9, 9, 64, 255, 184, 119, 16),
      Array(86, 6, 28, 5, 64, 255, 25, 248, 1),
      Array(56, 8, 17, 132, 137, 255, 55, 116, 128),
      Array(86, 33, 58, 108, 85, 51, 25, 145, 253)),
    Array(
      Array(98, 29, 67, 30, 90, 222, 70, 128, 180),
      Array(67, 23, 83, 30, 141, 169, 29, 226, 128),
      Array(66, 16, 111, 30, 8, 17, 11, 230, 210),
      Array(41, 18, 25, 70, 146, 85, 55, 62, 70),
      Array(47, 15, 16, 183, 34, 223, 49, 45, 183),
      Array(53, 17, 33, 183, 6, 98, 15, 32, 183),
      Array(75, 32, 12, 51, 192, 255, 160, 43, 51),
      Array(86, 29, 35, 67, 102, 85, 55, 186, 85),
      Array(56, 21, 23, 111, 59, 205, 45, 37, 192),
      Array(86, 38, 70, 124, 73, 102, 1, 34, 98)),
    Array(
      Array(101, 75, 128, 139, 118, 146, 116, 128, 85),
      Array(56, 41, 15, 176, 236, 85, 37, 9, 62),
      Array(57, 62, 116, 80, 85, 82, 72, 155, 103),
      Array(40, 40, 21, 116, 143, 209, 34, 39, 175),
      Array(34, 21, 11, 97, 195, 178, 16, 18, 100),
      Array(36, 77, 12, 91, 107, 85, 22, 17, 91),
      Array(64, 11, 27, 26, 128, 128, 91, 7, 57),
      Array(64, 25, 22, 29, 86, 128, 28, 128, 75),
      Array(40, 7, 9, 101, 43, 128, 13, 8, 150),
      Array(112, 19, 12, 61, 195, 128, 48, 4, 24)))

  // ---- coefficient tokens (RFC 6386 §13) ----

  /** Scan position → probability band. */
  private[graft] val CoeffBands =
    Array(0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
  /** Zigzag scan order. */
  private[graft] val Zigzag =
    Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  private[graft] val Pcat1 = Array(159)
  private[graft] val Pcat2 = Array(165, 145)
  private[graft] val Pcat3 = Array(173, 148, 140)
  private[graft] val Pcat4 = Array(176, 155, 140, 135)
  private[graft] val Pcat5 = Array(180, 157, 141, 134, 130)
  private[graft] val Pcat6 =
    Array(254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129)

  /** Default DCT coefficient probabilities
    * [plane 0..3][band 0..7][ctx 0..2][node 0..10] (RFC 6386 §13.5).
    * Plane types: 0 = Y after Y2, 1 = Y2, 2 = chroma, 3 = Y incl. DC. */
  private[graft] val DefaultCoeffProbs: Array[Array[Array[Array[Int]]]] = {
    def t(rows: Array[Int]*): Array[Array[Int]] = rows.toArray
    val p128 = Array(128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128)
    Array(
      Array( // plane 0: Y after Y2
        t(p128, p128, p128),
        t(Array(253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128),
          Array(189, 129, 242, 255, 227, 213, 255, 219, 128, 128, 128),
          Array(106, 126, 227, 252, 214, 209, 255, 255, 128, 128, 128)),
        t(Array(1, 98, 248, 255, 236, 226, 255, 255, 128, 128, 128),
          Array(181, 133, 238, 254, 221, 234, 255, 154, 128, 128, 128),
          Array(78, 134, 202, 247, 198, 180, 255, 219, 128, 128, 128)),
        t(Array(1, 185, 249, 255, 243, 255, 128, 128, 128, 128, 128),
          Array(184, 150, 247, 255, 236, 224, 128, 128, 128, 128, 128),
          Array(77, 110, 216, 255, 236, 230, 128, 128, 128, 128, 128)),
        t(Array(1, 101, 251, 255, 241, 255, 128, 128, 128, 128, 128),
          Array(170, 139, 241, 252, 236, 209, 255, 255, 128, 128, 128),
          Array(37, 116, 196, 243, 228, 255, 255, 255, 128, 128, 128)),
        t(Array(1, 204, 254, 255, 245, 255, 128, 128, 128, 128, 128),
          Array(207, 160, 250, 255, 238, 128, 128, 128, 128, 128, 128),
          Array(102, 103, 225, 255, 210, 240, 128, 128, 128, 128, 128)),
        t(Array(1, 152, 252, 255, 240, 255, 128, 128, 128, 128, 128),
          Array(177, 135, 243, 255, 234, 225, 128, 128, 128, 128, 128),
          Array(80, 129, 211, 255, 194, 224, 128, 128, 128, 128, 128)),
        t(Array(1, 1, 243, 255, 254, 255, 128, 128, 128, 128, 128),
          Array(238, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128),
          Array(75, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128))),
      Array( // plane 1: Y2
        t(Array(198, 35, 237, 223, 193, 187, 162, 160, 145, 155, 62),
          Array(131, 45, 198, 221, 172, 176, 220, 157, 252, 221, 1),
          Array(68, 47, 146, 208, 149, 167, 221, 162, 255, 223, 128)),
        t(Array(1, 149, 241, 255, 221, 224, 255, 255, 128, 128, 128),
          Array(184, 141, 234, 253, 222, 220, 255, 199, 128, 128, 128),
          Array(81, 99, 181, 242, 176, 190, 249, 202, 255, 255, 128)),
        t(Array(1, 129, 232, 253, 214, 197, 242, 196, 255, 255, 128),
          Array(99, 121, 210, 250, 201, 198, 255, 202, 128, 128, 128),
          Array(23, 91, 163, 242, 170, 187, 247, 210, 255, 255, 128)),
        t(Array(1, 200, 246, 255, 234, 255, 128, 128, 128, 128, 128),
          Array(109, 178, 241, 255, 231, 245, 255, 255, 128, 128, 128),
          Array(44, 130, 201, 253, 205, 192, 255, 255, 128, 128, 128)),
        t(Array(1, 132, 239, 251, 219, 209, 255, 165, 128, 128, 128),
          Array(94, 136, 225, 251, 218, 190, 255, 255, 128, 128, 128),
          Array(22, 100, 174, 245, 186, 161, 255, 199, 128, 128, 128)),
        t(Array(1, 182, 249, 255, 232, 235, 128, 128, 128, 128, 128),
          Array(124, 143, 241, 255, 227, 234, 128, 128, 128, 128, 128),
          Array(35, 77, 181, 251, 193, 211, 255, 205, 128, 128, 128)),
        t(Array(1, 157, 247, 255, 236, 231, 255, 255, 128, 128, 128),
          Array(121, 141, 235, 255, 225, 227, 255, 255, 128, 128, 128),
          Array(45, 99, 188, 251, 195, 217, 255, 224, 128, 128, 128)),
        t(Array(1, 1, 251, 255, 213, 255, 128, 128, 128, 128, 128),
          Array(203, 1, 248, 255, 255, 128, 128, 128, 128, 128, 128),
          Array(137, 1, 177, 255, 224, 255, 128, 128, 128, 128, 128))),
      Array( // plane 2: chroma
        t(Array(253, 9, 248, 251, 207, 208, 255, 192, 128, 128, 128),
          Array(175, 13, 224, 243, 193, 185, 249, 198, 255, 255, 128),
          Array(73, 17, 171, 221, 161, 179, 236, 167, 255, 234, 128)),
        t(Array(1, 95, 247, 253, 212, 183, 255, 255, 128, 128, 128),
          Array(239, 90, 244, 250, 211, 209, 255, 255, 128, 128, 128),
          Array(155, 77, 195, 248, 188, 195, 255, 255, 128, 128, 128)),
        t(Array(1, 24, 239, 251, 218, 219, 255, 205, 128, 128, 128),
          Array(201, 51, 219, 255, 196, 186, 128, 128, 128, 128, 128),
          Array(69, 46, 190, 239, 201, 218, 255, 228, 128, 128, 128)),
        t(Array(1, 191, 251, 255, 255, 128, 128, 128, 128, 128, 128),
          Array(223, 165, 249, 255, 213, 255, 128, 128, 128, 128, 128),
          Array(141, 124, 248, 255, 255, 128, 128, 128, 128, 128, 128)),
        t(Array(1, 16, 248, 255, 255, 128, 128, 128, 128, 128, 128),
          Array(190, 36, 230, 255, 236, 255, 128, 128, 128, 128, 128),
          Array(149, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128)),
        t(Array(1, 226, 255, 128, 128, 128, 128, 128, 128, 128, 128),
          Array(247, 192, 255, 128, 128, 128, 128, 128, 128, 128, 128),
          Array(240, 128, 255, 128, 128, 128, 128, 128, 128, 128, 128)),
        t(Array(1, 134, 252, 255, 255, 128, 128, 128, 128, 128, 128),
          Array(213, 62, 250, 255, 255, 128, 128, 128, 128, 128, 128),
          Array(55, 93, 255, 128, 128, 128, 128, 128, 128, 128, 128)),
        t(p128, p128, p128)),
      Array( // plane 3: Y incl. DC (B_PRED)
        t(Array(202, 24, 213, 235, 186, 191, 220, 160, 240, 175, 255),
          Array(126, 38, 166, 203, 165, 176, 190, 155, 205, 225, 255),
          Array(61, 46, 138, 188, 134, 174, 196, 130, 224, 215, 254)),
        t(Array(1, 112, 230, 250, 199, 191, 247, 159, 255, 255, 128),
          Array(166, 109, 228, 252, 211, 215, 255, 223, 128, 128, 128),
          Array(39, 77, 162, 232, 172, 180, 245, 178, 255, 255, 128)),
        t(Array(1, 52, 220, 246, 198, 199, 249, 220, 255, 255, 128),
          Array(124, 74, 191, 243, 183, 193, 250, 221, 255, 255, 128),
          Array(24, 71, 130, 219, 154, 170, 243, 182, 255, 255, 128)),
        t(Array(1, 182, 225, 249, 219, 240, 255, 224, 128, 128, 128),
          Array(149, 150, 226, 252, 216, 205, 255, 171, 128, 128, 128),
          Array(28, 108, 170, 242, 183, 194, 254, 223, 255, 255, 128)),
        t(Array(1, 81, 230, 252, 204, 203, 255, 192, 128, 128, 128),
          Array(123, 102, 209, 247, 188, 196, 255, 233, 128, 128, 128),
          Array(20, 95, 153, 243, 164, 173, 255, 203, 128, 128, 128)),
        t(Array(1, 222, 248, 255, 216, 213, 128, 128, 128, 128, 128),
          Array(168, 175, 246, 252, 235, 205, 255, 255, 128, 128, 128),
          Array(47, 116, 215, 255, 211, 212, 255, 255, 128, 128, 128)),
        t(Array(1, 121, 236, 253, 212, 214, 255, 255, 128, 128, 128),
          Array(141, 84, 213, 252, 201, 202, 255, 219, 128, 128, 128),
          Array(42, 80, 160, 240, 162, 185, 255, 205, 128, 128, 128)),
        t(Array(1, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128),
          Array(244, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128),
          Array(238, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128))))
  }

  /** Coefficient-probability UPDATE priors (RFC 6386 §13.4 /
    * vp8_coef_update_probs). Predominantly 255; transcribed
    * best-effort — see the file header honesty note (our fixtures never
    * update probs, and both fixture sides share this table). */
  private[graft] val CoeffUpdateProbs: Array[Array[Array[Array[Int]]]] = {
    val a = Array.fill(4, 8, 3, 11)(255)
    // the handful of sub-255 priors concentrate in the first bands of
    // each plane; the dominant mass of the table is 255 (no update).
    val low = Seq(
      (0, 0, 0, Array(255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255)),
      (0, 1, 0, Array(176, 246, 255, 255, 255, 255, 255, 255, 255, 255, 255)),
      (0, 1, 1, Array(223, 241, 252, 255, 255, 255, 255, 255, 255, 255, 255)),
      (0, 1, 2, Array(249, 253, 253, 255, 255, 255, 255, 255, 255, 255, 255)),
      (0, 2, 0, Array(255, 244, 252, 255, 255, 255, 255, 255, 255, 255, 255)),
      (0, 2, 1, Array(234, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255)),
      (0, 3, 0, Array(255, 246, 254, 255, 255, 255, 255, 255, 255, 255, 255)),
      (0, 3, 1, Array(239, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255)),
      (0, 4, 0, Array(255, 248, 254, 255, 255, 255, 255, 255, 255, 255, 255)),
      (0, 4, 1, Array(251, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255)),
      (0, 5, 0, Array(255, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255)),
      (0, 5, 1, Array(251, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255)),
      (0, 6, 0, Array(255, 254, 253, 255, 254, 255, 255, 255, 255, 255, 255)),
      (0, 6, 1, Array(250, 255, 254, 255, 254, 255, 255, 255, 255, 255, 255)),
      (1, 0, 0, Array(217, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255)),
      (1, 0, 1, Array(225, 252, 241, 253, 255, 255, 254, 255, 255, 255, 255)),
      (1, 0, 2, Array(234, 250, 241, 250, 253, 255, 253, 254, 255, 255, 255)),
      (1, 1, 0, Array(255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255)),
      (1, 1, 1, Array(223, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255)),
      (1, 1, 2, Array(238, 253, 254, 254, 255, 255, 255, 255, 255, 255, 255)),
      (1, 2, 0, Array(255, 248, 254, 255, 255, 255, 255, 255, 255, 255, 255)),
      (1, 2, 1, Array(249, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255)),
      (1, 3, 0, Array(255, 253, 255, 255, 255, 255, 255, 255, 255, 255, 255)),
      (1, 3, 1, Array(247, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255)),
      (2, 0, 0, Array(186, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255)),
      (2, 0, 1, Array(234, 251, 244, 254, 255, 255, 255, 255, 255, 255, 255)),
      (2, 0, 2, Array(251, 251, 243, 253, 254, 255, 254, 255, 255, 255, 255)),
      (2, 1, 0, Array(255, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255)),
      (2, 1, 1, Array(236, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255)),
      (2, 1, 2, Array(251, 253, 253, 254, 254, 255, 255, 255, 255, 255, 255)),
      (3, 0, 0, Array(248, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255)),
      (3, 0, 1, Array(250, 254, 252, 254, 255, 255, 255, 255, 255, 255, 255)),
      (3, 0, 2, Array(248, 254, 249, 253, 255, 255, 255, 255, 255, 255, 255)),
      (3, 1, 0, Array(255, 253, 255, 255, 255, 255, 255, 255, 255, 255, 255)),
      (3, 1, 1, Array(246, 253, 253, 255, 255, 255, 255, 255, 255, 255, 255)),
      (3, 1, 2, Array(252, 254, 251, 254, 254, 255, 255, 255, 255, 255, 255)))
    low.foreach { case (p, b, c, row) =>
      var i = 0
      while (i < 11) { a(p)(b)(c)(i) = row(i); i += 1 }
    }
    a
  }

  // ---- dequantization (RFC 6386 §14.1) ----

  private val DcQLookup = Array(
    4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17,
    18, 19, 20, 20, 21, 21, 22, 22, 23, 23, 24, 25, 25, 26, 27, 28,
    29, 30, 31, 32, 33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43,
    44, 45, 46, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
    59, 60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74,
    75, 76, 76, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89,
    91, 93, 95, 96, 98, 100, 101, 102, 104, 106, 108, 110, 112, 114, 116, 118,
    122, 124, 126, 128, 130, 132, 134, 136, 138, 140, 143, 145, 148, 151, 154, 157)

  private val AcQLookup = Array(
    4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
    20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35,
    36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51,
    52, 53, 54, 55, 56, 57, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76,
    78, 80, 82, 84, 86, 88, 90, 92, 94, 96, 98, 100, 102, 104, 106, 108,
    110, 112, 114, 116, 119, 122, 125, 128, 131, 134, 137, 140, 143, 146, 149, 152,
    155, 158, 161, 164, 167, 170, 173, 177, 181, 185, 189, 193, 197, 201, 205, 209,
    213, 217, 221, 225, 229, 234, 239, 245, 249, 254, 259, 264, 269, 274, 279, 284)

  private def clampQ(i: Int): Int = if (i < 0) 0 else if (i > 127) 127 else i

  // ---- inverse transforms (RFC 6386 §14.3–14.4) ----

  private val CosPi8Sqrt2Minus1 = 20091
  private val SinPi8Sqrt2 = 35468

  /** In-place 4×4 inverse DCT; `blk` holds dequantized coefficients in
    * raster order, overwritten with residuals. */
  private def idct4x4(blk: Array[Int]): Unit = {
    var i = 0
    while (i < 4) { // vertical
      val i0 = blk(i); val i4 = blk(i + 4); val i8 = blk(i + 8); val i12 = blk(i + 12)
      val a1 = i0 + i8
      val b1 = i0 - i8
      val c1 = ((i4 * SinPi8Sqrt2) >> 16) - (i12 + ((i12 * CosPi8Sqrt2Minus1) >> 16))
      val d1 = (i4 + ((i4 * CosPi8Sqrt2Minus1) >> 16)) + ((i12 * SinPi8Sqrt2) >> 16)
      blk(i) = a1 + d1
      blk(i + 12) = a1 - d1
      blk(i + 4) = b1 + c1
      blk(i + 8) = b1 - c1
      i += 1
    }
    i = 0
    while (i < 16) { // horizontal with rounding
      val i0 = blk(i); val i1 = blk(i + 1); val i2 = blk(i + 2); val i3 = blk(i + 3)
      val a1 = i0 + i2
      val b1 = i0 - i2
      val c1 = ((i1 * SinPi8Sqrt2) >> 16) - (i3 + ((i3 * CosPi8Sqrt2Minus1) >> 16))
      val d1 = (i1 + ((i1 * CosPi8Sqrt2Minus1) >> 16)) + ((i3 * SinPi8Sqrt2) >> 16)
      blk(i) = (a1 + d1 + 4) >> 3
      blk(i + 3) = (a1 - d1 + 4) >> 3
      blk(i + 1) = (b1 + c1 + 4) >> 3
      blk(i + 2) = (b1 - c1 + 4) >> 3
      i += 4
    }
  }

  /** In-place 4×4 inverse Walsh–Hadamard (the Y2 block). */
  private def iwalsh4x4(blk: Array[Int]): Unit = {
    var i = 0
    while (i < 4) {
      val a1 = blk(i) + blk(i + 12)
      val b1 = blk(i + 4) + blk(i + 8)
      val c1 = blk(i + 4) - blk(i + 8)
      val d1 = blk(i) - blk(i + 12)
      blk(i) = a1 + b1
      blk(i + 4) = c1 + d1
      blk(i + 8) = a1 - b1
      blk(i + 12) = d1 - c1
      i += 1
    }
    i = 0
    while (i < 16) {
      val a1 = blk(i) + blk(i + 3)
      val b1 = blk(i + 1) + blk(i + 2)
      val c1 = blk(i + 1) - blk(i + 2)
      val d1 = blk(i) - blk(i + 3)
      blk(i) = (a1 + b1 + 3) >> 3
      blk(i + 1) = (c1 + d1 + 3) >> 3
      blk(i + 2) = (a1 - b1 + 3) >> 3
      blk(i + 3) = (d1 - c1 + 3) >> 3
      i += 4
    }
  }

  // ---- per-frame state ----

  private final class Frame(val mbW: Int, val mbH: Int) {
    val yStride = mbW * 16
    val cStride = mbW * 8
    val y = new Array[Byte](yStride * mbH * 16)
    val u = new Array[Byte](cStride * mbH * 8)
    val v = new Array[Byte](cStride * mbH * 8)
  }

  /** Boundary-convention pixel read: y<0 ⇒ 127 (top border, incl. the
    * corner), x<0 ⇒ 129 (left border), x past the padded right edge ⇒
    * replicate the row's last pixel (the spec's border extension). */
  private def px(p: Array[Byte], stride: Int, rows: Int, x: Int, y: Int): Int =
    if (y < 0) 127
    else if (x < 0) 129
    else if (x >= stride) p(y * stride + stride - 1) & 0xff
    else p(y * stride + x) & 0xff

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
  private def avg2(a: Int, b: Int): Int = (a + b + 1) >> 1
  private def avg3(a: Int, b: Int, c: Int): Int = (a + 2 * b + c + 2) >> 2

  // ---- the decoder ----

  /** Decode a `VP8 ` chunk payload (keyframe), or null. */
  def decode(b: Array[Byte], off: Int, len: Int): JpegDecoder.Decoded =
    try decodeImpl(b, off, len)
    catch { case _: RuntimeException | _: ArrayIndexOutOfBoundsException => null }

  private def decodeImpl(b: Array[Byte], off: Int, len: Int): JpegDecoder.Decoded = {
    if (len < 10 || off + len > b.length) return null
    val tag = le24(b, off)
    if ((tag & 1) != 0) return null // interframe: needs refs, out of scope
    if (((tag >> 1) & 7) > 3) return null // version
    val firstPartSize = (tag >> 5) & 0x7ffff
    if (u8(b, off + 3) != 0x9d || u8(b, off + 4) != 0x01 || u8(b, off + 5) != 0x2a)
      return null
    val w = le16(b, off + 6) & 0x3fff
    val h = le16(b, off + 8) & 0x3fff
    if (w == 0 || h == 0) return null
    if (w.toLong * h * 4 > MaxPlaneBytes) return null
    val mbW = (w + 15) >> 4
    val mbH = (h + 15) >> 4
    val part1End = off + 10 + firstPartSize
    if (part1End > off + len) return null
    val bd = new BoolDecoder(b, off + 10, part1End)

    bd.literal(1) // color space (0 for the defined YUV)
    bd.literal(1) // clamping type
    // segmentation
    var segUpdateMap = false
    var segAbs = false
    val segQuant = new Array[Int](4)
    val segTreeProbs = Array(255, 255, 255)
    val segEnabled = bd.bool(128) == 1
    if (segEnabled) {
      segUpdateMap = bd.bool(128) == 1
      val updData = bd.bool(128) == 1
      if (updData) {
        segAbs = bd.bool(128) == 1
        var i = 0
        while (i < 4) { segQuant(i) = bd.maybeSigned(7); i += 1 }
        i = 0
        while (i < 4) { bd.maybeSigned(6); i += 1 } // per-segment lf, unused
      }
      if (segUpdateMap) {
        var i = 0
        while (i < 3) {
          if (bd.bool(128) == 1) segTreeProbs(i) = bd.literal(8)
          i += 1
        }
      }
    }
    bd.literal(1) // filter type
    bd.literal(6) // filter level (loop filter not applied — header note)
    bd.literal(3) // sharpness
    if (bd.bool(128) == 1) { // lf delta enabled
      if (bd.bool(128) == 1) { // update
        var i = 0
        while (i < 8) { bd.maybeSigned(6); i += 1 } // 4 ref + 4 mode deltas
      }
    }
    val nParts = 1 << bd.literal(2)
    // token partition bounds
    val sizesAt = part1End
    val dataAt = sizesAt + 3 * (nParts - 1)
    if (dataAt > off + len) return null
    val partStart = new Array[Int](nParts)
    val partEnd = new Array[Int](nParts)
    var at = dataAt
    var pi = 0
    while (pi < nParts) {
      val sz =
        if (pi < nParts - 1) le24(b, sizesAt + 3 * pi)
        else off + len - at
      if (sz < 0 || at + sz > off + len) return null
      partStart(pi) = at
      partEnd(pi) = at + sz
      at += sz
      pi += 1
    }
    val tokenBd = Array.tabulate(nParts)(i => new BoolDecoder(b, partStart(i), partEnd(i)))
    // quantizers
    val yacQi = bd.literal(7)
    val ydcD = bd.maybeSigned(4)
    val y2dcD = bd.maybeSigned(4)
    val y2acD = bd.maybeSigned(4)
    val uvdcD = bd.maybeSigned(4)
    val uvacD = bd.maybeSigned(4)
    bd.literal(1) // refresh entropy (keyframe: no effect within one frame)
    // coefficient probability updates
    val probs = Array.tabulate(4, 8, 3, 11)((i, j, k, l) => DefaultCoeffProbs(i)(j)(k)(l))
    var i0 = 0
    while (i0 < 4) {
      var j = 0
      while (j < 8) {
        var k = 0
        while (k < 3) {
          var l = 0
          while (l < 11) {
            if (bd.bool(CoeffUpdateProbs(i0)(j)(k)(l)) == 1)
              probs(i0)(j)(k)(l) = bd.literal(8)
            l += 1
          }
          k += 1
        }
        j += 1
      }
      i0 += 1
    }
    val mbNoSkip = bd.bool(128) == 1
    val probSkipFalse = if (mbNoSkip) bd.literal(8) else 0
    if (bd.eof) return null

    // per-segment dequant factors
    def segQi(seg: Int): Int =
      clampQ(if (!segEnabled) yacQi else if (segAbs) segQuant(seg) else yacQi + segQuant(seg))
    val dq = Array.tabulate(4) { seg =>
      val qi = segQi(seg)
      val y2ac0 = AcQLookup(clampQ(qi + y2acD)) * 155 / 100
      Array(
        DcQLookup(clampQ(qi + ydcD)), // y dc
        AcQLookup(qi), // y ac
        DcQLookup(clampQ(qi + y2dcD)) * 2, // y2 dc
        if (y2ac0 < 8) 8 else y2ac0, // y2 ac
        { val d = DcQLookup(clampQ(qi + uvdcD)); if (d > 132) 132 else d }, // uv dc
        AcQLookup(clampQ(qi + uvacD))) // uv ac
    }

    // ---- pass 1: per-MB modes (first partition, raster order) ----
    val nMb = mbW * mbH
    val ymodes = new Array[Byte](nMb)
    val uvmodes = new Array[Byte](nMb)
    val segs = new Array[Byte](nMb)
    val skips = new Array[Boolean](nMb)
    val bmodes = new Array[Byte](nMb * 16)
    val aboveBm = new Array[Byte](mbW * 4) // bottom subblock modes per MB col
    val leftBm = new Array[Byte](4)
    var my = 0
    while (my < mbH) {
      java.util.Arrays.fill(leftBm, 0.toByte)
      var mx = 0
      while (mx < mbW) {
        val mi = my * mbW + mx
        segs(mi) = (if (segUpdateMap) bd.tree(SegmentTree, segTreeProbs) else 0).toByte
        skips(mi) = mbNoSkip && bd.bool(probSkipFalse) == 1
        val ym = bd.tree(KfYmodeTree, KfYmodeProb)
        ymodes(mi) = ym.toByte
        if (ym == BPred) {
          var sb = 0
          while (sb < 16) {
            val r = sb >> 2
            val c = sb & 3
            val a = if (r == 0) aboveBm(mx * 4 + c) else bmodes(mi * 16 + sb - 4)
            val l = if (c == 0) leftBm(r) else bmodes(mi * 16 + sb - 1)
            bmodes(mi * 16 + sb) = bd.tree(BmodeTree, KfBmodeProb(a), l).toByte
            sb += 1
          }
        } else {
          val impl = ImpliedBmode(ym).toByte
          java.util.Arrays.fill(bmodes, mi * 16, mi * 16 + 16, impl)
        }
        var c = 0
        while (c < 4) { aboveBm(mx * 4 + c) = bmodes(mi * 16 + 12 + c); c += 1 }
        var r = 0
        while (r < 4) { leftBm(r) = bmodes(mi * 16 + r * 4 + 3); r += 1 }
        uvmodes(mi) = bd.tree(UvModeTree, KfUvModeProb).toByte
        mx += 1
      }
      my += 1
    }
    if (bd.eof) return null

    // ---- pass 2: tokens + reconstruction, row by row ----
    val f = new Frame(mbW, mbH)
    // nonzero contexts: per MB column 4 Y + 2 U + 2 V + 1 Y2
    val aboveNz = new Array[Boolean](mbW * 9)
    val leftNz = new Array[Boolean](9)
    val coefBlk = new Array[Int](16)
    val y2Blk = new Array[Int](16)
    val y2Dc = new Array[Int](16)
    val nzY = new Array[Boolean](16)
    val nzU = new Array[Boolean](4)
    val nzV = new Array[Boolean](4)

    /** Token-decode one 4×4 block into coefBlk (dequantized, raster via
      * zigzag); returns whether any coefficient was nonzero. */
    def decodeBlock(td: BoolDecoder, plane: Int, ctx0: Int, firstCoef: Int,
        out: Array[Int], dqDc: Int, dqAc: Int): Boolean = {
      java.util.Arrays.fill(out, 0)
      val pp = probs(plane)
      var i = firstCoef
      var ctx = ctx0
      var nz = false
      var prevZero = false
      var done = false
      while (!done && i < 16) {
        val p = pp(CoeffBands(i))(ctx)
        if (!prevZero && td.bool(p(0)) == 0) done = true // EOB
        else if (td.bool(p(1)) == 0) { // ZERO
          prevZero = true; ctx = 0; i += 1
        } else {
          prevZero = false
          var v = 0
          if (td.bool(p(2)) == 0) { v = 1; ctx = 1 }
          else {
            ctx = 2
            if (td.bool(p(3)) == 0) {
              if (td.bool(p(4)) == 0) v = 2
              else v = 3 + td.bool(p(5))
            } else if (td.bool(p(6)) == 0) {
              if (td.bool(p(7)) == 0) v = 5 + cat(td, Pcat1)
              else v = 7 + cat(td, Pcat2)
            } else if (td.bool(p(8)) == 0) {
              if (td.bool(p(9)) == 0) v = 11 + cat(td, Pcat3)
              else v = 19 + cat(td, Pcat4)
            } else if (td.bool(p(10)) == 0) v = 35 + cat(td, Pcat5)
            else v = 67 + cat(td, Pcat6)
          }
          if (td.bool(128) == 1) v = -v
          out(Zigzag(i)) = v * (if (i == 0) dqDc else dqAc)
          nz = true
          i += 1
        }
      }
      nz
    }

    my = 0
    while (my < mbH) {
      java.util.Arrays.fill(leftNz, false)
      val td = tokenBd(my % nParts)
      var mx = 0
      while (mx < mbW) {
        val mi = my * mbW + mx
        val ym = ymodes(mi)
        val hasY2 = ym != BPred
        val q = dq(segs(mi))
        var anyCoeff = false
        java.util.Arrays.fill(y2Dc, 0)
        java.util.Arrays.fill(nzY, false)
        java.util.Arrays.fill(nzU, false)
        java.util.Arrays.fill(nzV, false)
        val yCoefs = new Array[Array[Int]](16)
        val uCoefs = new Array[Array[Int]](4)
        val vCoefs = new Array[Array[Int]](4)
        if (skips(mi)) {
          // no tokens; reset contexts (Y2 only for has-Y2 modes)
          var c = 0
          while (c < 8) { aboveNz(mx * 9 + c) = false; leftNz(c) = false; c += 1 }
          if (hasY2) { aboveNz(mx * 9 + 8) = false; leftNz(8) = false }
        } else {
          if (hasY2) {
            val ctx = (if (aboveNz(mx * 9 + 8)) 1 else 0) + (if (leftNz(8)) 1 else 0)
            val nz = decodeBlock(td, 1, ctx, 0, y2Blk, q(2), q(3))
            aboveNz(mx * 9 + 8) = nz
            leftNz(8) = nz
            if (nz) anyCoeff = true
            iwalsh4x4(y2Blk)
            System.arraycopy(y2Blk, 0, y2Dc, 0, 16)
          }
          val plane = if (hasY2) 0 else 3
          val firstC = if (hasY2) 1 else 0
          var sb = 0
          while (sb < 16) {
            val r = sb >> 2
            val c = sb & 3
            val actx = (if (r == 0) aboveNz(mx * 9 + c) else nzY(sb - 4))
            val lctx = (if (c == 0) leftNz(r) else nzY(sb - 1))
            val ctx = (if (actx) 1 else 0) + (if (lctx) 1 else 0)
            val nz = decodeBlock(td, plane, ctx, firstC, coefBlk, q(0), q(1))
            coefBlk(0) = if (hasY2) y2Dc(sb) else coefBlk(0)
            nzY(sb) = nz
            // has-Y2 DC-only blocks ride yCoefs too when the WHT DC is set
            if (nz || (hasY2 && y2Dc(sb) != 0)) {
              anyCoeff = true
              yCoefs(sb) = coefBlk.clone()
            }
            sb += 1
          }
          var ub = 0
          while (ub < 4) {
            val r = ub >> 1
            val c = ub & 1
            val actx = (if (r == 0) aboveNz(mx * 9 + 4 + c) else nzU(ub - 2))
            val lctx = (if (c == 0) leftNz(4 + r) else nzU(ub - 1))
            val ctx = (if (actx) 1 else 0) + (if (lctx) 1 else 0)
            val nz = decodeBlock(td, 2, ctx, 0, coefBlk, q(4), q(5))
            nzU(ub) = nz
            if (nz) { anyCoeff = true; uCoefs(ub) = coefBlk.clone() }
            ub += 1
          }
          var vb = 0
          while (vb < 4) {
            val r = vb >> 1
            val c = vb & 1
            val actx = (if (r == 0) aboveNz(mx * 9 + 6 + c) else nzV(vb - 2))
            val lctx = (if (c == 0) leftNz(6 + r) else nzV(vb - 1))
            val ctx = (if (actx) 1 else 0) + (if (lctx) 1 else 0)
            val nz = decodeBlock(td, 2, ctx, 0, coefBlk, q(4), q(5))
            nzV(vb) = nz
            if (nz) { anyCoeff = true; vCoefs(vb) = coefBlk.clone() }
            vb += 1
          }
          // write back nz contexts
          var c2 = 0
          while (c2 < 4) { aboveNz(mx * 9 + c2) = nzY(12 + c2); c2 += 1 }
          var r2 = 0
          while (r2 < 4) { leftNz(r2) = nzY(r2 * 4 + 3); r2 += 1 }
          aboveNz(mx * 9 + 4) = nzU(2); aboveNz(mx * 9 + 5) = nzU(3)
          leftNz(4) = nzU(1); leftNz(5) = nzU(3)
          aboveNz(mx * 9 + 6) = nzV(2); aboveNz(mx * 9 + 7) = nzV(3)
          leftNz(6) = nzV(1); leftNz(7) = nzV(3)
          if (td.eof) return null
        }
        reconstructMb(f, mx, my, ym, uvmodes(mi), bmodes, mi, yCoefs, uCoefs,
          vCoefs, hasY2, y2Dc)
        mx += 1
      }
      my += 1
    }

    // ---- output assembly (crop to w × h) ----
    val cw = (w + 1) >> 1
    val ch = (h + 1) >> 1
    var gray = true
    var cy = 0
    while (gray && cy < ch) {
      var cx = 0
      while (gray && cx < cw) {
        gray = (f.u(cy * f.cStride + cx) & 0xff) == 128 &&
          (f.v(cy * f.cStride + cx) & 0xff) == 128
        cx += 1
      }
      cy += 1
    }
    if (gray) {
      val s = new Array[Byte](w * h)
      var yy = 0
      while (yy < h) {
        System.arraycopy(f.y, yy * f.yStride, s, yy * w, w)
        yy += 1
      }
      new JpegDecoder.Decoded(w, h, 1, s)
    } else {
      // BT.601 limited-range integer conversion, nearest chroma (file
      // header note: the conversion is not normative in RFC 6386)
      val s = new Array[Byte](w * h * 3)
      var yy = 0
      while (yy < h) {
        var xx = 0
        while (xx < w) {
          val yv = f.y(yy * f.yStride + xx) & 0xff
          val uv = f.u((yy >> 1) * f.cStride + (xx >> 1)) & 0xff
          val vv = f.v((yy >> 1) * f.cStride + (xx >> 1)) & 0xff
          val c = 298 * (yv - 16)
          val d = uv - 128
          val e = vv - 128
          val o = (yy * w + xx) * 3
          s(o) = clamp255((c + 409 * e + 128) >> 8).toByte
          s(o + 1) = clamp255((c - 100 * d - 208 * e + 128) >> 8).toByte
          s(o + 2) = clamp255((c + 516 * d + 128) >> 8).toByte
          xx += 1
        }
        yy += 1
      }
      new JpegDecoder.Decoded(w, h, 3, s)
    }
  }

  private def cat(td: BoolDecoder, probs: Array[Int]): Int = {
    var v = 0
    var i = 0
    while (i < probs.length) { v = (v << 1) | td.bool(probs(i)); i += 1 }
    v
  }

  // ---- reconstruction (RFC 6386 §12) ----

  /** Add a 4×4 residual block (or a DC-only fast path) onto prediction. */
  private def addResidual(p: Array[Byte], stride: Int, x0: Int, y0: Int,
      coefs: Array[Int]): Unit = {
    var allAcZero = true
    var i = 1
    while (allAcZero && i < 16) { allAcZero = coefs(i) == 0; i += 1 }
    if (allAcZero) {
      val d = (coefs(0) + 4) >> 3
      if (d != 0) {
        var r = 0
        while (r < 4) {
          val base = (y0 + r) * stride + x0
          var c = 0
          while (c < 4) {
            p(base + c) = clamp255((p(base + c) & 0xff) + d).toByte
            c += 1
          }
          r += 1
        }
      }
    } else {
      val blk = coefs.clone()
      idct4x4(blk)
      var r = 0
      while (r < 4) {
        val base = (y0 + r) * stride + x0
        var c = 0
        while (c < 4) {
          p(base + c) = clamp255((p(base + c) & 0xff) + blk(r * 4 + c)).toByte
          c += 1
        }
        r += 1
      }
    }
  }

  /** Fill an n×n prediction into the plane for DC/V/H/TM (16×16 luma or
    * 8×8 chroma). DC existence rules use actual frame neighbors. */
  private def predictWhole(p: Array[Byte], stride: Int, x0: Int, y0: Int,
      n: Int, mode: Int, hasAbove: Boolean, hasLeft: Boolean): Unit = {
    def a(i: Int): Int = px(p, stride, 0, x0 + i, y0 - 1)
    def l(i: Int): Int = px(p, stride, 0, x0 - 1, y0 + i)
    val tl = px(p, stride, 0, x0 - 1, y0 - 1)
    mode match {
      case 0 => // DC
        var sum = 0
        var cnt = 0
        if (hasAbove) { var i = 0; while (i < n) { sum += a(i); i += 1 }; cnt += n }
        if (hasLeft) { var i = 0; while (i < n) { sum += l(i); i += 1 }; cnt += n }
        val dc =
          if (cnt == 0) 128
          else (sum + cnt / 2) / cnt // n or 2n are powers of two: exact shift
        var r = 0
        while (r < n) {
          var c = 0
          while (c < n) { p((y0 + r) * stride + x0 + c) = dc.toByte; c += 1 }
          r += 1
        }
      case 1 => // V
        var r = 0
        while (r < n) {
          var c = 0
          while (c < n) { p((y0 + r) * stride + x0 + c) = a(c).toByte; c += 1 }
          r += 1
        }
      case 2 => // H
        var r = 0
        while (r < n) {
          val lv = l(r).toByte
          var c = 0
          while (c < n) { p((y0 + r) * stride + x0 + c) = lv; c += 1 }
          r += 1
        }
      case _ => // TM
        var r = 0
        while (r < n) {
          val lv = l(r)
          var c = 0
          while (c < n) {
            p((y0 + r) * stride + x0 + c) = clamp255(lv + a(c) - tl).toByte
            c += 1
          }
          r += 1
        }
    }
  }

  /** 4×4 B_PRED subblock prediction (§12.3), written into the plane. */
  private def predictSub(p: Array[Byte], stride: Int, x0: Int, y0: Int,
      mode: Int, aboveRight: Array[Int]): Unit = {
    val A = new Array[Int](8)
    var i = 0
    while (i < 4) { A(i) = px(p, stride, 0, x0 + i, y0 - 1); i += 1 }
    while (i < 8) { A(i) = aboveRight(i - 4); i += 1 }
    val L = new Array[Int](4)
    i = 0
    while (i < 4) { L(i) = px(p, stride, 0, x0 - 1, y0 + i); i += 1 }
    val P = px(p, stride, 0, x0 - 1, y0 - 1)
    // the RD/VR/HD family reads the boundary as one 9-pixel array
    val pp = Array(L(3), L(2), L(1), L(0), P, A(0), A(1), A(2), A(3))
    val out = new Array[Int](16)
    mode match {
      case 0 => // B_DC
        var s = 4
        i = 0
        while (i < 4) { s += A(i) + L(i); i += 1 }
        val dc = s >> 3
        i = 0
        while (i < 16) { out(i) = dc; i += 1 }
      case 1 => // B_TM
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) { out(r * 4 + c) = clamp255(L(r) + A(c) - P); c += 1 }
          r += 1
        }
      case 2 => // B_VE (filtered vertical)
        val f = Array(avg3(P, A(0), A(1)), avg3(A(0), A(1), A(2)),
          avg3(A(1), A(2), A(3)), avg3(A(2), A(3), A(4)))
        var r = 0
        while (r < 4) { var c = 0; while (c < 4) { out(r * 4 + c) = f(c); c += 1 }; r += 1 }
      case 3 => // B_HE (filtered horizontal)
        val f = Array(avg3(P, L(0), L(1)), avg3(L(0), L(1), L(2)),
          avg3(L(1), L(2), L(3)), avg3(L(2), L(3), L(3)))
        var r = 0
        while (r < 4) { var c = 0; while (c < 4) { out(r * 4 + c) = f(r); c += 1 }; r += 1 }
      case 4 => // B_LD
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) {
            val d = r + c
            out(r * 4 + c) =
              if (d < 6) avg3(A(d), A(d + 1), A(d + 2))
              else avg3(A(6), A(7), A(7))
            c += 1
          }
          r += 1
        }
      case 5 => // B_RD
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) {
            out(r * 4 + c) = avg3(pp(3 + c - r), pp(4 + c - r), pp(5 + c - r))
            c += 1
          }
          r += 1
        }
      case 6 => // B_VR
        out(12) = avg3(pp(1), pp(2), pp(3))
        out(8) = avg3(pp(2), pp(3), pp(4))
        out(13) = avg3(pp(3), pp(4), pp(5)); out(4) = out(13)
        out(9) = avg2(pp(4), pp(5)); out(0) = out(9)
        out(14) = avg3(pp(4), pp(5), pp(6)); out(5) = out(14)
        out(10) = avg2(pp(5), pp(6)); out(1) = out(10)
        out(15) = avg3(pp(5), pp(6), pp(7)); out(6) = out(15)
        out(11) = avg2(pp(6), pp(7)); out(2) = out(11)
        out(7) = avg3(pp(6), pp(7), pp(8))
        out(3) = avg2(pp(7), pp(8))
      case 7 => // B_VL
        out(0) = avg2(A(0), A(1))
        out(4) = avg3(A(0), A(1), A(2))
        out(8) = avg2(A(1), A(2)); out(1) = out(8)
        out(5) = avg3(A(1), A(2), A(3)); out(12) = out(5)
        out(9) = avg2(A(2), A(3)); out(2) = out(9)
        out(13) = avg3(A(2), A(3), A(4)); out(6) = out(13)
        out(10) = avg2(A(3), A(4)); out(3) = out(10)
        out(14) = avg3(A(3), A(4), A(5)); out(7) = out(14)
        out(11) = avg3(A(4), A(5), A(6))
        out(15) = avg3(A(5), A(6), A(7))
      case 8 => // B_HD
        out(12) = avg2(pp(0), pp(1))
        out(13) = avg3(pp(0), pp(1), pp(2))
        out(8) = avg2(pp(1), pp(2)); out(14) = out(8)
        out(9) = avg3(pp(1), pp(2), pp(3)); out(15) = out(9)
        out(10) = avg2(pp(2), pp(3)); out(4) = out(10)
        out(11) = avg3(pp(2), pp(3), pp(4)); out(5) = out(11)
        out(6) = avg2(pp(3), pp(4)); out(0) = out(6)
        out(7) = avg3(pp(3), pp(4), pp(5)); out(1) = out(7)
        out(2) = avg3(pp(4), pp(5), pp(6))
        out(3) = avg3(pp(5), pp(6), pp(7))
      case _ => // B_HU
        out(0) = avg2(L(0), L(1))
        out(1) = avg3(L(0), L(1), L(2))
        out(2) = avg2(L(1), L(2)); out(4) = out(2)
        out(3) = avg3(L(1), L(2), L(3)); out(5) = out(3)
        out(6) = avg2(L(2), L(3)); out(8) = out(6)
        out(7) = avg3(L(2), L(3), L(3)); out(9) = out(7)
        out(10) = L(3); out(11) = L(3)
        out(12) = L(3); out(13) = L(3); out(14) = L(3); out(15) = L(3)
    }
    var r = 0
    while (r < 4) {
      var c = 0
      while (c < 4) { p((y0 + r) * stride + x0 + c) = out(r * 4 + c).toByte; c += 1 }
      r += 1
    }
  }

  private def reconstructMb(f: Frame, mx: Int, my: Int, ym: Int, uvm: Int,
      bmodes: Array[Byte], mi: Int, yCoefs: Array[Array[Int]],
      uCoefs: Array[Array[Int]], vCoefs: Array[Array[Int]],
      hasY2: Boolean, y2Dc: Array[Int]): Unit = {
    val yx = mx * 16
    val yy = my * 16
    if (ym != BPred) {
      predictWhole(f.y, f.yStride, yx, yy, 16, ym, my > 0, mx > 0)
      var sb = 0
      while (sb < 16) {
        val cf = yCoefs(sb)
        if (cf != null) addResidual(f.y, f.yStride, yx + (sb & 3) * 4, yy + (sb >> 2) * 4, cf)
        sb += 1
      }
    } else {
      // B_PRED: per subblock, prediction from already-reconstructed pixels
      // above-right of the MB: constant for all right-edge subblocks
      val arMb = new Array[Int](4)
      var i = 0
      while (i < 4) { arMb(i) = px(f.y, f.yStride, 0, yx + 16 + i, yy - 1); i += 1 }
      var sb = 0
      while (sb < 16) {
        val r = sb >> 2
        val c = sb & 3
        val x0 = yx + c * 4
        val y0 = yy + r * 4
        val ar =
          if (c == 3) arMb
          else {
            // interior: the 4 pixels above-right of the subblock (for
            // r > 0 those are this MB's just-reconstructed pixels)
            val a = new Array[Int](4)
            var k = 0
            while (k < 4) { a(k) = px(f.y, f.yStride, 0, x0 + 4 + k, y0 - 1); k += 1 }
            a
          }
        predictSub(f.y, f.yStride, x0, y0, bmodes(mi * 16 + sb), ar)
        val cf = yCoefs(sb)
        if (cf != null) addResidual(f.y, f.yStride, x0, y0, cf)
        sb += 1
      }
    }
    // chroma
    val cx = mx * 8
    val cy = my * 8
    predictWhole(f.u, f.cStride, cx, cy, 8, uvm, my > 0, mx > 0)
    predictWhole(f.v, f.cStride, cx, cy, 8, uvm, my > 0, mx > 0)
    var ub = 0
    while (ub < 4) {
      if (uCoefs(ub) != null)
        addResidual(f.u, f.cStride, cx + (ub & 1) * 4, cy + (ub >> 1) * 4, uCoefs(ub))
      if (vCoefs(ub) != null)
        addResidual(f.v, f.cStride, cx + (ub & 1) * 4, cy + (ub >> 1) * 4, vCoefs(ub))
      ub += 1
    }
  }
}
