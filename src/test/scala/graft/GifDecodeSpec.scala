package graft

import org.apache.spark.sql.functions._

import graft.functions.{GifDecoder, ImageGridHash, MediaFunctions, PngGridHash}
import graft.multimodal.{GifFixtures, Multimodal}
import graft.PngTestImages.makePng

/** The native GIF decode path ([[GifDecoder]]) and its integration into
  * the codec-dispatching image expressions. Same three-implementation
  * convention as JpegDecodeSpec: [[GifFixtures]] is a spec-derived
  * ENCODER, GifDecoder a spec-derived DECODER, and `javax.imageio` the
  * independent third — every fixture must agree bit-for-bit across all
  * three (GIF is lossless, so unlike JPEG there is no rounding band). */
class GifDecodeSpec extends SparkSpecBase {

  private def rng(seed: Long) = new scala.util.Random(seed)

  private def imageIoGray(payload: Array[Byte], w: Int, h: Int): Array[Int] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    assert(img != null, "imageio must decode the fixture")
    assert(img.getWidth == w && img.getHeight == h)
    Array.tabulate(w * h) { i =>
      val rgb = img.getRGB(i % w, i / w)
      val r = (rgb >> 16) & 0xff
      assert(r == ((rgb >> 8) & 0xff) && r == (rgb & 0xff), "gray fixture")
      r
    }
  }

  test("round-trip: encoder → native decoder is bit-exact (random, constant, gradient)") {
    // random noise forces dictionary growth through every code width and
    // a CLEAR reset (256×64 = 16k pixels >> 4096 dict entries); the
    // constant image hits the KwKwK deferred-code case on its 2nd code
    val noiseR = rng(1)
    val cases = Seq(
      ("noise", Array.fill(256 * 64)(noiseR.nextInt(256)), 256, 64),
      ("constant", Array.fill(33 * 17)(250), 33, 17),
      ("gradient", Array.tabulate(64 * 64)(i => (i % 64 + i / 64) % 256), 64, 64),
      ("tiny", Array(7), 1, 1),
      ("runs", Array.tabulate(100 * 50)(i => (i / 37) % 5), 100, 50))
    for ((name, px, w, h) <- cases) {
      val d = GifDecoder.decode(GifFixtures.encodeGray(px, w, h))
      assert(d != null, s"$name must decode")
      assert(d.w == w && d.h == h && d.ch == 1, s"$name dims/channels")
      var i = 0
      while (i < px.length) {
        assert((d.samples(i) & 0xff) == px(i), s"$name pixel $i")
        i += 1
      }
    }
  }

  test("imageio parity: the independent decoder reads the same pixels") {
    val r = rng(2)
    val px = Array.tabulate(93 * 41)(_ => r.nextInt(256))
    val payload = GifFixtures.encodeGray(px, 93, 41)
    val io = imageIoGray(payload, 93, 41)
    val d = GifDecoder.decode(payload)
    assert(d != null && d.ch == 1)
    var i = 0
    while (i < px.length) {
      assert(io(i) == px(i) && (d.samples(i) & 0xff) == px(i), s"pixel $i")
      i += 1
    }
  }

  test("interlaced frames deinterlace to the same pixels (incl. imageio parity)") {
    // imageio parity only for h ≥ 8: Java's GIFImageReader leaves rows
    // unfilled (background 0) on interlaced frames shorter than a full
    // pass cycle (observed: 5×3 row 1 reads 0), while the spec's 4-pass
    // row order is height-independent — the native decoder follows the
    // spec, pinned against the encoder for the degenerate heights
    val r = rng(3)
    for ((w, h) <- Seq((16, 16), (21, 13), (64, 64), (8, 1), (5, 3))) {
      val px = Array.tabulate(w * h)(_ => r.nextInt(256))
      val payload = GifFixtures.encodeGray(px, w, h, interlaced = true)
      val d = GifDecoder.decode(payload)
      assert(d != null && d.w == w && d.h == h, s"${w}x$h")
      val io = if (h >= 8) imageIoGray(payload, w, h) else null
      var i = 0
      while (i < px.length) {
        assert((d.samples(i) & 0xff) == px(i), s"${w}x$h native pixel $i")
        if (io != null) assert(io(i) == px(i), s"${w}x$h imageio pixel $i")
        i += 1
      }
    }
  }

  test("non-grayscale palettes decode to 3-channel palette RGB") {
    // patch the encoder's identity GCT in place (offset 13, 256×3 bytes):
    // entry v → (v, 255−v, v/2)
    val px = Array.tabulate(12 * 7)(i => (i * 11) % 256)
    val payload = GifFixtures.encodeGray(px, 12, 7)
    for (v <- 0 until 256) {
      payload(13 + 3 * v) = v.toByte
      payload(13 + 3 * v + 1) = (255 - v).toByte
      payload(13 + 3 * v + 2) = (v / 2).toByte
    }
    val d = GifDecoder.decode(payload)
    assert(d != null && d.ch == 3 && d.w == 12 && d.h == 7)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    var i = 0
    while (i < px.length) {
      val v = px(i)
      assert((d.samples(3 * i) & 0xff) == v)
      assert((d.samples(3 * i + 1) & 0xff) == 255 - v)
      assert((d.samples(3 * i + 2) & 0xff) == v / 2)
      val rgb = img.getRGB(i % 12, i / 12)
      assert(((rgb >> 16) & 0xff) == v && ((rgb >> 8) & 0xff) == 255 - v &&
        (rgb & 0xff) == v / 2, s"imageio pixel $i")
      i += 1
    }
  }

  test("extensions are skipped; malformed and truncated payloads decode to null") {
    // a graphic-control extension before the image descriptor must not
    // disturb the frame — splice one in (0x21 0xF9, 4-byte block, term)
    val px = Array.tabulate(10 * 10)(i => i * 2)
    val clean = GifFixtures.encodeGray(px, 10, 10)
    val splitAt = 13 + 768 // end of GCT, start of image descriptor
    val gce = Array(0x21, 0xf9, 0x04, 0x01, 0x00, 0x00, 0x05, 0x00).map(_.toByte)
    val withExt = clean.take(splitAt) ++ gce ++ clean.drop(splitAt)
    val d = GifDecoder.decode(withExt)
    assert(d != null && d.w == 10 && (d.samples(33) & 0xff) == 66)
    // the q149 corrupt plant: signature + raw text
    assert(GifDecoder.decode("GIF89athis is not a gif".getBytes("UTF-8")) == null)
    // truncations at every interesting boundary (the last cut lands
    // inside the LZW code stream — cutting only the trailer/terminator
    // after all pixels decoded is tolerated, like any robust reader)
    for (cut <- Seq(5, 12, 400, splitAt + 5, clean.length - 12))
      assert(GifDecoder.decode(clean.take(cut)) == null, s"cut=$cut")
    // oversized declared frame: patch the descriptor dims to 65535×65535
    val big = clean.clone()
    big(splitAt + 5) = 0xff.toByte; big(splitAt + 6) = 0xff.toByte
    big(splitAt + 7) = 0xff.toByte; big(splitAt + 8) = 0xff.toByte
    assert(GifDecoder.decode(big) == null)
  }

  test("codec dispatch: GIF rides the same battery and hashes as PNG (cross-codec aHash)") {
    // same pixels as PNG and as GIF → identical ImagePixelStats struct
    // fields and identical aHash/dHash (encoding-independence, the
    // JPEG-parity convention one codec over)
    val r = rng(4)
    val px = Array.tabulate(64 * 64)(_ => r.nextInt(256))
    val gif = GifFixtures.encodeGray(px, 64, 64)
    val png = makePng(64, 64, 1, px, _ => 0)
    val gifA = ImageGridHash.aHash(gif)
    val pngA = PngGridHash.aHash(png)
    assert(gifA != null && gifA == pngA, "aHash must be encoding-independent")
    val gifD = ImageGridHash.dHash(gif)
    val pngD = PngGridHash.dHash(png)
    assert(gifD != null && gifD == pngD, "dHash must be encoding-independent")
    val df = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(gif), org.apache.spark.sql.Row(png)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("payload",
          org.apache.spark.sql.types.BinaryType))))
    val stats = df.select(MediaFunctions.imagePixelStats(col("payload")).as("s"))
      .select("s.width", "s.height", "s.channels", "s.ch_sum").collect()
    assert(stats.length == 2 && stats(0) == stats(1),
      s"pixel stats must match across codecs: ${stats.toSeq}")
  }

  test("gifMediaFromDocuments battery signals replay analytically from text") {
    val docs = spark.createDataFrame(java.util.List.of(
      org.apache.spark.sql.Row(1L, "hello gif world"),
      org.apache.spark.sql.Row(4L, "bright plant"), // doc_id % 9 == 4 → flat 250
      org.apache.spark.sql.Row(9L, "another document body with more text")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    val m = Multimodal.gifMediaFromDocuments(docs)
    val rows = m.select(col("media_id"),
        graft.ops.MediaQuality.imageSignals(col("payload")).as("s"))
      .select(col("media_id"), col("s.width"), col("s.height"),
        col("s.mean_luma"), col("s.dyn_range"))
      .orderBy("media_id").collect()
    assert(rows.length == 3)
    def expectMean(text: String): Double = {
      val tb = text.getBytes("UTF-8")
      val vals = Array.tabulate(64)(i => if (i < tb.length) tb(i) & 0xff else 'A'.toInt)
      vals.sum / 64.0
    }
    assert(rows(0).getLong(0) == 1L && rows(0).getLong(1) == 64L && rows(0).getLong(2) == 64L)
    assert(math.abs(rows(0).getDouble(3) - expectMean("hello gif world")) < 1e-9)
    assert(rows(1).getLong(0) == 4L && rows(1).getDouble(3) == 250.0 &&
      rows(1).getLong(4) == 0L, "flat-bright plant")
    assert(rows(2).getLong(4) > 0L)
  }

  test("ANIMATED GIFs decode frame 0 (Netscape loop ext + later frames ignored)") {
    // assemble a 2-frame animation: frame 0 = a planted gradient, frame 1
    // = a different image; plus the Netscape application extension and a
    // graphic-control extension before each frame — the crawl-reality
    // shape. Frame-0-over-its-own-rectangle is the documented contract.
    val px0 = Array.tabulate(24 * 16)(i => (i * 7) % 256)
    val px1 = Array.fill(24 * 16)(9)
    val g0 = GifFixtures.encodeGray(px0, 24, 16)
    val g1 = GifFixtures.encodeGray(px1, 24, 16)
    val out = new java.io.ByteArrayOutputStream()
    // header + LSD + GCT of frame 0's encoding (up to its image
    // separator, located structurally — 0x2c also occurs as a palette
    // byte, so a byte scan would cut inside the color table)
    def imgAt(g: Array[Byte]): Int = {
      val flags = g(10) & 0xff
      13 + (if ((flags & 0x80) != 0) 3 * (1 << ((flags & 7) + 1)) else 0)
    }
    val imgAt0 = imgAt(g0)
    val imgAt1 = imgAt(g1)
    assert(g0(imgAt0) == 0x2c.toByte && g1(imgAt1) == 0x2c.toByte)
    out.write(g0, 0, imgAt0)
    // Netscape looping application extension
    out.write(Array[Byte](0x21, 0xff.toByte, 11,
      'N', 'E', 'T', 'S', 'C', 'A', 'P', 'E', '2', '.', '0',
      3, 1, 0, 0, 0))
    // graphic control extension (delay 10, no transparency)
    out.write(Array[Byte](0x21, 0xf9.toByte, 4, 0, 10, 0, 0, 0))
    out.write(g0, imgAt0, g0.length - imgAt0 - 1) // frame 0 sans trailer
    out.write(Array[Byte](0x21, 0xf9.toByte, 4, 0, 10, 0, 0, 0))
    out.write(g1, imgAt1, g1.length - imgAt1) // frame 1 + trailer
    val anim = out.toByteArray
    val d = GifDecoder.decode(anim)
    assert(d != null, "animated GIF must decode frame 0, not NULL out")
    assert(d.w == 24 && d.h == 16 && d.ch == 1)
    var i = 0
    while (i < px0.length) {
      assert((d.samples(i) & 0xff) == px0(i), s"pixel $i")
      i += 1
    }
  }
}
