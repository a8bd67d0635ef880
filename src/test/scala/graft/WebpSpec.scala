package graft

import graft.functions.{JpegDecoder, WebpDecoder}
import graft.multimodal.{GifFixtures, WebpFixtures}

import org.scalatest.funsuite.AnyFunSuite

/** WebP VP8L decoder vs the independent spec-derived encoder — the GIF
  * round's convention: the two sides share no code, so a bit-exact
  * round-trip pins both readings of the public spec; the minimal fixture
  * is additionally assembled BY HAND bit-for-bit in this file so at least
  * one payload is anchored to the spec text alone, not to either
  * implementation.
  */
class WebpSpec extends AnyFunSuite {

  private def grayValuesOf(d: JpegDecoder.Decoded): Array[Int] = {
    assert(d != null, "decode returned null")
    assert(d.ch == 1, s"expected gray, got ${d.ch} channels")
    d.samples.map(_ & 0xff)
  }

  test("hand-assembled minimal VP8L (1x1 white, simple codes) decodes") {
    // Assembled bit-by-bit from the spec, independent of WebpFixtures'
    // writer: signature byte 0x2F; 14-bit w-1=0; 14-bit h-1=0; alpha 0;
    // version 000; transforms 0; color-cache 0; meta 0; then five SIMPLE
    // prefix codes — green/red/blue/alpha one 8-bit symbol 255 each
    // (1,0,1,11111111), distance one 1-bit symbol 0 (1,0,0,0) — and ZERO
    // pixel bits (single-symbol codes decode in no bits).
    val bits = new scala.collection.mutable.ArrayBuffer[Int]
    def put(n: Int, v: Int): Unit = (0 until n).foreach(i => bits += ((v >> i) & 1))
    put(8, 0x2f); put(14, 0); put(14, 0); put(1, 0); put(3, 0)
    put(1, 0) // no transforms
    put(1, 0) // no color cache
    put(1, 0) // no meta prefix groups
    for (_ <- 0 until 4) { put(1, 1); put(1, 0); put(1, 1); put(8, 255) }
    put(1, 1); put(1, 0); put(1, 0); put(1, 0) // distance: symbol 0 in 1 bit
    val payload = new Array[Byte]((bits.length + 7) / 8)
    bits.zipWithIndex.foreach { case (b, i) =>
      if (b == 1) payload(i / 8) = (payload(i / 8) | (1 << (i % 8))).toByte
    }
    // RIFF wrap by hand
    val riff = java.nio.ByteBuffer.allocate(20 + payload.length + (payload.length & 1))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    riff.put("RIFF".getBytes); riff.putInt(4 + 8 + payload.length + (payload.length & 1))
    riff.put("WEBP".getBytes); riff.put("VP8L".getBytes); riff.putInt(payload.length)
    riff.put(payload)
    val d = WebpDecoder.decode(riff.array())
    assert(d != null && d.w == 1 && d.h == 1 && d.ch == 1)
    assert((d.samples(0) & 0xff) == 255)
  }

  test("round-trip: plain literals, normal Huffman codes") {
    val vals = Array.tabulate(64 * 48)(i => (i * 97 + i / 64 * 31) % 256)
    val d = WebpDecoder.decode(WebpFixtures.encodeGray(vals, 64, 48,
      subtractGreen = false))
    assert(d.w == 64 && d.h == 48)
    assert(grayValuesOf(d).toSeq == vals.toSeq)
  }

  test("round-trip: subtract-green transform") {
    val vals = Array.tabulate(33 * 17)(i => (i * 7 + 3) % 256)
    val d = WebpDecoder.decode(WebpFixtures.encodeGray(vals, 33, 17,
      subtractGreen = true))
    assert(grayValuesOf(d).toSeq == vals.toSeq)
  }

  test("round-trip: predictor transform, every fixture mode and edge rule") {
    val vals = Array.tabulate(21 * 9)(i => (i * 13 + 5) % 256)
    for (mode <- Seq(0, 1, 2, 7)) {
      val d = WebpDecoder.decode(WebpFixtures.encodeGray(vals, 21, 9,
        subtractGreen = false, predictorMode = mode))
      assert(grayValuesOf(d).toSeq == vals.toSeq, s"mode $mode")
    }
    // stacked: subtract-green THEN predictor (inverse order exercised)
    val d2 = WebpDecoder.decode(WebpFixtures.encodeGray(vals, 21, 9,
      subtractGreen = true, predictorMode = 7))
    assert(grayValuesOf(d2).toSeq == vals.toSeq)
  }

  test("round-trip: LZ77 row copies (distance = xsize back-references)") {
    val w = 40; val h = 12
    val vals = new Array[Int](w * h)
    for (i <- vals.indices) {
      val y = i / w
      vals(i) = if (y % 3 != 0) vals(i - w) // repeat previous row twice
      else (i * 29 + 7) % 256
    }
    val d = WebpDecoder.decode(WebpFixtures.encodeGray(vals, w, h,
      subtractGreen = false, lz77Rows = true))
    assert(grayValuesOf(d).toSeq == vals.toSeq)
  }

  test("round-trip: color cache hits (decoder-state-emulated refs)") {
    // few distinct values => dense cache hits at 4 bits
    val vals = Array.tabulate(32 * 32)(i => Array(10, 200, 77, 145)(i % 4))
    val d = WebpDecoder.decode(WebpFixtures.encodeGray(vals, 32, 32,
      subtractGreen = false, cacheBits = 4))
    assert(grayValuesOf(d).toSeq == vals.toSeq)
    // cache + lz77 together
    val vals2 = Array.tabulate(32 * 8)(i =>
      if (i / 32 % 2 == 1) vals(i - 32) else Array(3, 9, 3, 9, 250)(i % 5))
    val d2 = WebpDecoder.decode(WebpFixtures.encodeGray(vals2, 32, 8,
      subtractGreen = false, cacheBits = 6, lz77Rows = true))
    assert(grayValuesOf(d2).toSeq == vals2.toSeq)
  }

  test("round-trip: color-indexing with sub-byte bundling at 2/4/16/17 colors") {
    for (n <- Seq(2, 4, 16, 17, 256)) {
      val palette = Array.tabulate(n)(i =>
        0xff000000 | ((i * 53 % 256) << 16) | ((i * 29 % 256) << 8) | (i * 11 % 256))
      val w = 19; val h = 7 // odd width exercises the partial last bundle
      val indices = Array.tabulate(w * h)(i => (i * 31 + i / w) % n)
      val d = WebpDecoder.decode(WebpFixtures.encodeIndexed(palette, indices, w, h))
      assert(d != null && d.w == w && d.h == h, s"palette $n")
      assert(d.ch == 3, s"palette $n should be RGB")
      val got = (0 until w * h).map { i =>
        ((d.samples(i * 3) & 0xff) << 16) | ((d.samples(i * 3 + 1) & 0xff) << 8) |
          (d.samples(i * 3 + 2) & 0xff)
      }
      val want = indices.map(palette(_) & 0xffffff).toSeq
      assert(got == want, s"palette $n")
    }
  }

  test("RGB content decodes to 3 channels; gray content collapses to 1") {
    val rgb = Array.tabulate(8 * 8)(i =>
      0xff000000 | ((i * 3 % 256) << 16) | ((i * 5 % 256) << 8) | (i * 7 % 256))
    val d = WebpDecoder.decode(WebpFixtures.encodeArgb(rgb, 8, 8))
    assert(d.ch == 3)
    assert((d.samples(3) & 0xff, d.samples(4) & 0xff, d.samples(5) & 0xff)
      == (3, 5, 7))
    val g = WebpDecoder.decode(WebpFixtures.encodeGray(
      Array.tabulate(64)(_ % 256), 8, 8))
    assert(g.ch == 1)
  }

  test("alpha participates in the stream but drops from samples") {
    val px = Array.tabulate(6 * 6)(i =>
      ((i * 11 % 256) << 24) | ((i % 256) << 16) | ((i % 256) << 8) | (i % 256))
    val d = WebpDecoder.decode(WebpFixtures.encodeArgb(px, 6, 6))
    // r==g==b with varying alpha is still gray: alpha never reaches samples
    assert(d.ch == 1)
    assert(d.samples.map(_ & 0xff).toSeq == (0 until 36).map(_ % 256))
  }

  test("cross-codec parity: same pixels through WebP and GIF match bit-level") {
    val vals = Array.tabulate(64 * 64)(i => (i * 17 + i / 64 * 5) % 256)
    val viaWebp = WebpDecoder.decode(WebpFixtures.encodeGray(vals, 64, 64))
    val viaGif = graft.functions.GifDecoder.decode(GifFixtures.encodeGray(vals, 64, 64))
    assert(viaWebp.ch == viaGif.ch && viaWebp.w == viaGif.w)
    assert(viaWebp.samples.toSeq == viaGif.samples.toSeq)
  }

  test("VP8X extended container: the VP8L chunk is found behind other chunks") {
    val inner = WebpFixtures.encodeGray(Array.fill(4)(9), 2, 2)
    // splice the VP8L chunk out and re-wrap behind a VP8X + junk chunk
    val vp8lLen = java.nio.ByteBuffer.wrap(inner, 16, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt
    val vp8l = java.util.Arrays.copyOfRange(inner, 20, 20 + vp8lLen)
    val bb = java.nio.ByteBuffer.allocate(12 + 18 + 8 + vp8l.length + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(4 + 18 + 8 + vp8l.length + (vp8l.length & 1))
    bb.put("WEBP".getBytes)
    bb.put("VP8X".getBytes); bb.putInt(10); bb.put(new Array[Byte](10))
    bb.put("VP8L".getBytes); bb.putInt(vp8l.length); bb.put(vp8l)
    val d = WebpDecoder.decode(java.util.Arrays.copyOf(bb.array(), bb.position()))
    assert(d != null && d.w == 2 && d.h == 2 && (d.samples(0) & 0xff) == 9)
  }

  test("malformed and unsupported payloads decode to null, never throw") {
    val good = WebpFixtures.encodeGray(Array.tabulate(64)(identity), 8, 8)
    assert(WebpDecoder.decode(null) == null)
    assert(WebpDecoder.decode(Array[Byte]()) == null)
    assert(WebpDecoder.decode("RIFFxxxxWEBP".getBytes) == null)
    // truncation at EVERY byte boundary must fail cleanly (or decode the
    // identical prefix-complete result, never throw / never wrong pixels)
    for (cut <- 1 until good.length) {
      val t = java.util.Arrays.copyOf(good, cut)
      val d = try WebpDecoder.decode(t)
      catch { case e: Throwable => fail(s"threw at cut=$cut: $e") }
      if (d != null) assert(d.w == 8 && d.h == 8)
    }
    // lossy VP8 chunk: unsupported by design
    val lossy = good.clone()
    lossy(15) = ' ' // "VP8L" -> "VP8 "
    assert(WebpDecoder.decode(lossy) == null)
    // version != 0
    val badVer = good.clone()
    // version is bits 37..39 of the VP8L payload (byte 20+4, bits 5..7)
    badVer(24) = (badVer(24) | 0x20).toByte
    assert(WebpDecoder.decode(badVer) == null)
    // oversized dims refuse BEFORE allocating (16384x16384x4 > 64 MiB)
    val bigDims = new scala.collection.mutable.ArrayBuffer[Int]
    def put(n: Int, v: Int): Unit = (0 until n).foreach(i => bigDims += ((v >> i) & 1))
    put(8, 0x2f); put(14, 16383); put(14, 16383); put(1, 0); put(3, 0)
    val pb = new Array[Byte]((bigDims.length + 7) / 8)
    bigDims.zipWithIndex.foreach { case (b, i) =>
      if (b == 1) pb(i / 8) = (pb(i / 8) | (1 << (i % 8))).toByte
    }
    val bb = java.nio.ByteBuffer.allocate(20 + pb.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(4 + 8 + pb.length)
    bb.put("WEBP".getBytes); bb.put("VP8L".getBytes); bb.putInt(pb.length); bb.put(pb)
    assert(WebpDecoder.decode(bb.array()) == null)
  }

  test("battery + perceptual hash integration via the codec dispatchers") {
    val vals = Array.tabulate(64 * 64)(i => (i / 64 * 4) % 256)
    val payload = WebpFixtures.encodeGray(vals, 64, 64, subtractGreen = true,
      predictorMode = 2, lz77Rows = true)
    val viaGif = GifFixtures.encodeGray(vals, 64, 64)
    val ah = graft.functions.ImageGridHash.aHash(payload)
    val ahGif = graft.functions.ImageGridHash.aHash(viaGif)
    assert(ah != null && ah == ahGif, "cross-codec aHash must agree on identical pixels")
    val st = graft.functions.ImagePixelStats.parse(payload)
    assert(st != null && st.getInt(0) == 64 && st.getInt(1) == 64 && st.getInt(2) == 1)
  }
}
