package graft

import graft.functions.{JpegDecoder, WebpDecoder}
import graft.multimodal.{Vp8Fixtures, WebpFixtures}

import org.scalatest.funsuite.AnyFunSuite

/** Lossy-WebP (VP8 keyframe) decoder vs the independent spec-derived
  * encoder — the GIF/VP8L convention: the two sides share only the
  * spec's constant tables, not algorithms, so a bit-exact round-trip
  * pins both readings of RFC 6386. The fixtures are constructed for
  * EXACT reconstruction (constant 16×16 cells → DC-only transforms whose
  * fixed-point inverses are lossless — see [[Vp8Fixtures]]), so decoded
  * luma is compared verbatim, not approximately. Cross-codec parity vs
  * the VP8L encoder anchors the pixel semantics against an independently
  * validated codec.
  */
class Vp8Spec extends AnyFunSuite {

  private def gray(d: JpegDecoder.Decoded): Array[Int] = {
    assert(d != null, "decode returned null")
    assert(d.ch == 1, s"expected gray, got ${d.ch} channels")
    d.samples.map(_ & 0xff)
  }

  private def mosaicPixels(vals: Array[Int], cellsX: Int, cellsY: Int): Array[Int] = {
    val w = cellsX * 16
    val out = new Array[Int](w * cellsY * 16)
    var i = 0
    while (i < out.length) {
      val x = i % w
      val y = i / w
      out(i) = vals((y / 16) * cellsX + (x / 16))
      i += 1
    }
    out
  }

  test("DC_PRED mosaic round-trips exactly through Y2/WHT (incl. extremes)") {
    val vals = Array(0, 255, 128, 37, 250, 16, 199, 84, 128, 128, 1, 254)
    val payload = Vp8Fixtures.encodeGrayMosaic(vals, 4, 3)
    assert(WebpDecoder.isWebp(payload))
    val d = WebpDecoder.decode(payload)
    assert(d.w == 64 && d.h == 48)
    assert(gray(d).sameElements(mosaicPixels(vals, 4, 3)))
  }

  test("B_PRED mosaic round-trips exactly through per-subblock DC levels") {
    val vals = Array(10, 240, 65, 128, 0, 255, 90, 200, 128)
    val payload = Vp8Fixtures.encodeGrayMosaic(vals, 3, 3, bPred = true)
    val d = WebpDecoder.decode(payload)
    assert(d.w == 48 && d.h == 48)
    assert(gray(d).sameElements(mosaicPixels(vals, 3, 3)))
  }

  test("uniform mosaic exercises the skip path (all-zero residual MBs)") {
    // every MB after (0,0) predicts its neighbors' value exactly → skip
    val vals = Array.fill(16)(128) // 128 == the no-neighbor DC default
    val d = WebpDecoder.decode(Vp8Fixtures.encodeGrayMosaic(vals, 4, 4))
    assert(gray(d).forall(_ == 128))
    // non-default uniform: only the first MB carries coefficients
    val vals2 = Array.fill(16)(77)
    val d2 = WebpDecoder.decode(Vp8Fixtures.encodeGrayMosaic(vals2, 4, 4))
    assert(gray(d2).forall(_ == 77))
  }

  test("skip probability is a free knob (tokens identical, header differs)") {
    val vals = Array(50, 150, 250, 35)
    val a = WebpDecoder.decode(Vp8Fixtures.encodeGrayMosaic(vals, 2, 2, probSkip = 30))
    val b = WebpDecoder.decode(Vp8Fixtures.encodeGrayMosaic(vals, 2, 2, probSkip = 250))
    assert(gray(a).sameElements(gray(b)))
    assert(gray(a).sameElements(mosaicPixels(vals, 2, 2)))
  }

  test("non-multiple-of-16 dims crop the padded MB grid") {
    val vals = Array(40, 90, 140, 190, 215, 65, 110, 160, 128, 70, 220, 35)
    val payload = Vp8Fixtures.encodeGrayMosaic(vals, 4, 3)
    // patch header dims (RIFF 12 + chunk header 8 + frame tag 3 + start 3)
    // down to 60×41 — same MB grid, cropped output
    val p = payload.clone()
    val at = 12 + 8 + 6
    p(at) = 60.toByte; p(at + 1) = 0
    p(at + 2) = 41.toByte; p(at + 3) = 0
    val d = WebpDecoder.decode(p)
    assert(d.w == 60 && d.h == 41 && d.ch == 1)
    val full = mosaicPixels(vals, 4, 3)
    val got = gray(d)
    var y = 0
    while (y < 41) {
      var x = 0
      while (x < 60) {
        assert(got(y * 60 + x) == full(y * 64 + x), s"($x,$y)")
        x += 1
      }
      y += 1
    }
  }

  test("cross-codec pixel parity: VP8 and VP8L of the same mosaic hash alike") {
    val vals = Array.tabulate(16)(i => 20 + i * 15)
    val lossy = Vp8Fixtures.encodeGrayMosaic(vals, 4, 4)
    val px = mosaicPixels(vals, 4, 4)
    val lossless = WebpFixtures.encodeGray(px, 64, 64,
      subtractGreen = true, predictorMode = -1, cacheBits = 0, lz77Rows = false)
    val dA = WebpDecoder.decode(lossy)
    val dB = WebpDecoder.decode(lossless)
    assert(gray(dA).sameElements(gray(dB)))
    assert(graft.functions.PngGridHash.aHash(lossy) ==
      graft.functions.PngGridHash.aHash(lossless))
  }

  test("truncation at every byte boundary decodes to null, never throws") {
    val payload = Vp8Fixtures.encodeGrayMosaic(Array(10, 240, 65, 128), 2, 2)
    var n = 12
    while (n < payload.length - 1) {
      val cut = java.util.Arrays.copyOf(payload, n)
      // re-stamp RIFF size so only the codec payload is truncated
      val sz = n - 8
      cut(4) = (sz & 0xff).toByte
      cut(5) = ((sz >> 8) & 0xff).toByte
      cut(6) = 0; cut(7) = 0
      WebpDecoder.decode(cut) // must not throw; null or (rarely) a decode
      n += 1
    }
    // interframe tag (bit 0 set) is out of scope → null
    val inter = payload.clone()
    inter(20) = (inter(20) | 1).toByte
    assert(WebpDecoder.decode(inter) == null)
  }

  test("animated WebP decodes frame 1: ANMF-wrapped VP8 and VP8L both ride") {
    val vals = Array(30, 180, 90, 240)
    val still = Vp8Fixtures.encodeGrayMosaic(vals, 2, 2)
    val anim = Vp8Fixtures.animWrap(still, 32, 32, frames = 3)
    val d = WebpDecoder.decode(anim)
    assert(d != null, "ANMF-wrapped VP8 must decode frame 1")
    assert(gray(d).sameElements(mosaicPixels(vals, 2, 2)))
    // lossless: reuse the q152 fixture class through the ANIM container
    val px = mosaicPixels(Array(25, 200, 150, 75), 2, 2)
    val stillL = WebpFixtures.encodeGray(px, 32, 32,
      subtractGreen = true, predictorMode = -1, cacheBits = 0, lz77Rows = false)
    val animL = Vp8Fixtures.animWrap(stillL, 32, 32, frames = 2)
    val dL = WebpDecoder.decode(animL)
    assert(dL != null, "ANMF-wrapped VP8L must decode frame 1")
    assert(gray(dL).sameElements(px))
  }
}
