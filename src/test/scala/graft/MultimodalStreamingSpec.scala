package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.streaming.StreamingWeighted

class MultimodalSpec extends SparkSpecBase {

  private def media = Multimodal.mediaFromDocuments(
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40))

  test("media table has the binary + typed-metadata shape") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("kind").dataType.typeName == "string")
    assert(media.count() == 40)
  }

  test("feature extraction is deterministic, batched, and shape-correct") {
    val f1 = Multimodal.extractFeatures(media, dim = 16).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media, dim = 16).collect().sortBy(_.media_id)
    assert(f1.length == 40)
    // mediaFromDocuments payloads are header + text garbage — no decoder
    // accepts them, so every row is an explicit reject (EMPTY features,
    // metadata intact); nothing is fabricated
    assert(f1.forall(_.features.isEmpty))
    assert(f1.zip(f2).forall { case (a, b) => a.features.sameElements(b.features) })
    // payload is utf-8 of the text → n_bytes matches byte length
    val n = media.select(col("media_id"), length(col("payload")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(f1.forall(f => f.n_bytes == n(f.media_id)))
  }

  test("resize preserves aspect ratio with shorter side at target") {
    assert(Multimodal.resizedDims(100, 200, 224) == (224, 448))
    assert(Multimodal.resizedDims(400, 100, 224) == (896, 224))
    assert(Multimodal.resizedDims(224, 224, 224) == (224, 224))
  }

  test("image dims are parsed from real header bytes and match ingest metadata") {
    import graft.functions.MediaFunctions
    val parsed = media.select(
      col("media_id"), col("kind"), col("width"), col("height"),
      MediaFunctions.imageDims(col("payload")).as("d"))
    val rows = parsed.collect()
    assert(rows.length == 40)
    rows.foreach { r =>
      val d = r.getStruct(4)
      assert(d.getString(0) == r.getString(1), s"format mismatch for ${r.getLong(0)}")
      assert(d.getInt(1) == r.getInt(2), s"width mismatch for ${r.getLong(0)}")
      assert(d.getInt(2) == r.getInt(3), s"height mismatch for ${r.getLong(0)}")
    }
  }

  test("ImageDims handles segment walks, progressive JPEG, and garbage") {
    import graft.functions.ImageDims
    def be2(v: Int) = Array[Byte](((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    // JPEG with a COM segment before a PROGRESSIVE (SOF2) frame header
    val com = Array(0xff, 0xfe, 0x00, 0x07).map(_.toByte) ++ "hello".getBytes
    val sof2 = Array(0xff, 0xc2, 0x00, 0x0b, 0x08).map(_.toByte) ++
      be2(321) ++ be2(123) ++ Array[Byte](1, 1, 0x11, 0)
    val jpeg = Array(0xff, 0xd8).map(_.toByte) ++ com ++ sof2
    val r = ImageDims.parse(jpeg)
    assert(r != null && r.getString(0) == "jpeg" && r.getInt(1) == 123 && r.getInt(2) == 321)
    // DHT (C4) is not a frame header and must be skipped, not misread
    val dht = Array(0xff, 0xc4, 0x00, 0x05, 0, 1, 2).map(_.toByte)
    val jpeg2 = Array(0xff, 0xd8).map(_.toByte) ++ dht ++ sof2
    val r2 = ImageDims.parse(jpeg2)
    assert(r2 != null && r2.getInt(1) == 123)
    // start-of-scan before any SOF → no dims
    assert(ImageDims.parse(Array(0xff, 0xd8, 0xff, 0xda, 0x00, 0x04, 0, 0).map(_.toByte)) == null)
    // garbage / truncated / wrong magic
    assert(ImageDims.parse("not an image at all".getBytes) == null)
    assert(ImageDims.parse(Array[Byte]()) == null)
    assert(ImageDims.parse(Array(0x89, 0x50, 0x4e, 0x47).map(_.toByte)) == null)
  }

  test("audio metadata is parsed from real RIFF/WAVE bytes and matches ingest metadata") {
    import graft.functions.MediaFunctions
    val audio = Multimodal.audioFromDocuments(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40))
    val rows = audio.select(
      col("media_id"), col("sample_rate"), col("channels"),
      MediaFunctions.audioMeta(col("payload")).as("m")).collect()
    assert(rows.length == 40)
    rows.foreach { r =>
      val m = r.getStruct(3)
      assert(m.getString(0) == "wav")
      assert(m.getInt(1) == r.getInt(1), s"rate mismatch for ${r.getLong(0)}")
      assert(m.getInt(2) == r.getInt(2), s"channels mismatch for ${r.getLong(0)}")
      assert(m.getInt(3) == 16)
    }
  }

  test("AudioMeta walks chunks and rejects garbage") {
    import graft.functions.AudioMeta
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val fmt = "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(2) ++ le32(44100) ++
      le32(44100 * 2 * 2) ++ le16(4) ++ le16(16)
    // a LIST chunk (odd size -> word-aligned skip) BEFORE fmt must be walked over
    val list = "LIST".getBytes ++ le32(5) ++ "INFOx".getBytes ++ Array[Byte](0)
    val wav = "RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes ++ list ++ fmt
    val r = AudioMeta.parse(wav)
    assert(r != null && r.getString(0) == "wav" && r.getInt(1) == 44100 &&
      r.getInt(2) == 2 && r.getInt(3) == 16)
    // no fmt chunk, truncated, wrong magic
    assert(AudioMeta.parse("RIFF1234WAVE".getBytes) == null)
    assert(AudioMeta.parse("RIFX1234WAVE".getBytes ++ fmt) == null)
    assert(AudioMeta.parse("garbage".getBytes) == null)
    // an image payload is not audio (and vice versa)
    assert(AudioMeta.parse(Array(0x89, 0x50, 0x4e, 0x47).map(_.toByte)) == null)
    assert(graft.functions.ImageDims.parse(wav) == null)
    // a chunk size near 2^32 must walk off the end -> NULL, never an
    // Int-overflowed negative index
    val huge = "RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes ++
      "junk".getBytes ++ Array[Byte](-16, -1, -1, -1) ++ new Array[Byte](40)
    assert(AudioMeta.parse(huge) == null)
  }

  test("PcmStats decodes 8/16-bit samples and rejects non-PCM payloads") {
    import graft.functions.PcmStats
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def fmt(codec: Int, bits: Int) = "fmt ".getBytes ++ le32(16) ++ le16(codec) ++
      le16(1) ++ le32(8000) ++ le32(8000 * bits / 8) ++ le16(bits / 8) ++ le16(bits)
    def wav(bits: Int, data: Array[Byte], codec: Int = 1) =
      "RIFF".getBytes ++ le32(36 + data.length) ++ "WAVE".getBytes ++
        fmt(codec, bits) ++ "data".getBytes ++ le32(data.length) ++ data
    // 16-bit: samples 1000, -1000, 32767, -32768 → peak 32768,
    // sum_sq = 2*10^6 + 32767² + 32768² = 2149514113
    val d16 = le16(1000) ++ le16(-1000 & 0xffff) ++ le16(32767) ++ le16(-32768 & 0xffff)
    val r16 = PcmStats.parse(wav(16, d16))
    assert(r16 != null && r16.getLong(0) == 4L && r16.getInt(1) == 32768)
    assert(r16.getLong(2) == 2000000L + 32767L * 32767 + 32768L * 32768)
    assert(math.abs(r16.getDouble(3) - math.sqrt(r16.getLong(2) / 4.0)) < 1e-12)
    // trailing odd byte of a 16-bit stream is ignored
    val rOdd = PcmStats.parse(wav(16, d16 :+ 0x7f.toByte))
    assert(rOdd != null && rOdd.getLong(0) == 4L && rOdd.getLong(2) == r16.getLong(2))
    // 8-bit unsigned offset-128: bytes 128, 0, 255 → 0, -128, 127
    val r8 = PcmStats.parse(wav(8, Array[Byte](128.toByte, 0, 255.toByte)))
    assert(r8 != null && r8.getLong(0) == 3L && r8.getInt(1) == 128)
    assert(r8.getLong(2) == 0L + 128L * 128 + 127L * 127)
    // declared data size past the physical end is clamped, not an exception
    val over = "RIFF".getBytes ++ le32(100) ++ "WAVE".getBytes ++ fmt(1, 16) ++
      "data".getBytes ++ le32(1000000) ++ le16(5) ++ le16(-5 & 0xffff)
    val rOver = PcmStats.parse(over)
    assert(rOver != null && rOver.getLong(0) == 2L && rOver.getLong(2) == 50L)
    // non-PCM codec, 24-bit depth, zero samples, garbage → NULL
    assert(PcmStats.parse(wav(16, d16, codec = 3)) == null)
    assert(PcmStats.parse(wav(24, d16)) == null)
    assert(PcmStats.parse(wav(16, Array[Byte]())) == null)
    assert(PcmStats.parse("not audio".getBytes) == null)
  }

  // ---- PngPixelStats: real decode (inflate + unfilter) -------------------

  private def makePng(w: Int, h: Int, ch: Int, pixels: Array[Int],
      filterOf: Int => Int, idatSplit: Int = 1, depth: Int = 8,
      interlaced: Boolean = false): Array[Byte] =
    PngTestImages.makePng(w, h, ch, pixels, filterOf, idatSplit, depth, interlaced)

  private def expectStats(w: Int, h: Int, ch: Int, pixels: Array[Int], depth: Int = 8) = {
    val sums = new Array[Long](ch)
    val mins = Array.fill(ch)(if (depth == 8) 255 else 65535)
    val maxs = new Array[Int](ch)
    for (i <- pixels.indices) {
      val c = i % ch
      sums(c) += pixels(i)
      mins(c) = math.min(mins(c), pixels(i)); maxs(c) = math.max(maxs(c), pixels(i))
    }
    (sums.toSeq, mins.toSeq, maxs.toSeq)
  }

  private def checkDecode(w: Int, h: Int, ch: Int, pixels: Array[Int],
      filterOf: Int => Int, idatSplit: Int = 1, depth: Int = 8,
      interlaced: Boolean = false): Unit = {
    val row = graft.functions.PngPixelStats.parse(
      makePng(w, h, ch, pixels, filterOf, idatSplit, depth, interlaced))
    assert(row != null, s"decode failed for w=$w h=$h ch=$ch depth=$depth interlaced=$interlaced")
    assert((row.getInt(0), row.getInt(1), row.getInt(2), row.getInt(3)) == ((w, h, ch, depth)))
    val (es, emn, emx) = expectStats(w, h, ch, pixels, depth)
    assert(row.getArray(4).toLongArray.toSeq == es)
    assert(row.getArray(5).toIntArray.toSeq == emn)
    assert(row.getArray(6).toIntArray.toSeq == emx)
  }

  test("PngPixelStats decodes real-deflate streams through every filter type") {
    val rnd = new scala.util.Random(42)
    for (ch <- Seq(1, 3, 4)) {
      val (w, h) = (11, 7)
      val pixels = Array.fill(w * h * ch)(rnd.nextInt(256))
      for (f <- 0 to 4) checkDecode(w, h, ch, pixels, _ => f) // uniform filter
      checkDecode(w, h, ch, pixels, r => r % 5) // mixed filters per row
    }
  }

  test("PngPixelStats reassembles multi-IDAT streams and 1-pixel images") {
    val rnd = new scala.util.Random(7)
    val pixels = Array.fill(16 * 9 * 3)(rnd.nextInt(256))
    checkDecode(16, 9, 3, pixels, r => (r * 3) % 5, idatSplit = 5)
    checkDecode(1, 1, 3, Array(12, 200, 7), _ => 4) // a/b/c all zero
  }

  test("PngPixelStats decodes Adam7 interlaced streams (per-pass unfiltering)") {
    val rnd = new scala.util.Random(1234)
    for (ch <- Seq(1, 3, 4); (w, h) <- Seq((11, 7), (8, 8), (3, 2), (1, 1))) {
      val pixels = Array.fill(w * h * ch)(rnd.nextInt(256))
      checkDecode(w, h, ch, pixels, _ => 0, interlaced = true)
      checkDecode(w, h, ch, pixels, r => r % 5, interlaced = true) // mixed filters
    }
    // 16-bit interlaced: pass sub-images with 2-byte samples, Paeth
    // everywhere (one shared Random — a per-element `new Random(5)` would
    // fill the array with a single constant and make the test vacuous)
    val rnd16 = new scala.util.Random(5)
    val px16 = Array.fill(9 * 6 * 3)(rnd16.nextInt(65536))
    checkDecode(9, 6, 3, px16, _ => 4, depth = 16, interlaced = true)
    // dims smaller than the pass grid (w<5 skips pass 2 entirely, h<5
    // skips pass 3) — empty passes must contribute zero stream bytes
    checkDecode(2, 3, 1, Array(10, 250, 3, 77, 200, 1), r => (r + 1) % 5, interlaced = true)
  }

  test("PngPixelStats decodes 16-bit samples (big-endian) through every filter") {
    val rnd = new scala.util.Random(99)
    for (ch <- Seq(1, 3, 4)) {
      val (w, h) = (7, 5)
      val pixels = Array.fill(w * h * ch)(rnd.nextInt(65536))
      for (f <- 0 to 4) checkDecode(w, h, ch, pixels, _ => f, depth = 16)
      checkDecode(w, h, ch, pixels, r => (r + 2) % 5, idatSplit = 3, depth = 16)
    }
    // bytewise Paeth at depth 16 is NOT sample-Paeth: a crafted gradient
    // whose high/low bytes predict differently still round-trips exactly
    val grad = Array.tabulate(4 * 3 * 1)(i => (i * 9973) % 65536)
    checkDecode(4, 3, 1, grad, _ => 4, depth = 16)
  }

  test("PngPixelStats rejects unsupported and corrupt payloads") {
    import graft.functions.PngPixelStats
    val ok = makePng(4, 3, 3, Array.fill(36)(9), _ => 1)
    assert(PngPixelStats.parse(ok) != null)
    assert(PngPixelStats.parse("not a png".getBytes) == null)
    assert(PngPixelStats.parse(ok.take(40)) == null) // truncated mid-IDAT
    // flipping a sequential stream's interlace byte declares an Adam7
    // layout whose total pass bytes exceed the stream → rejected as
    // truncated (Adam7 itself is supported; a LYING header is not)
    val interlaced = ok.clone(); interlaced(28) = 1.toByte
    assert(PngPixelStats.parse(interlaced) == null)
    val badInterlace = ok.clone(); badInterlace(28) = 2.toByte // undefined method
    assert(PngPixelStats.parse(badInterlace) == null)
    // flipping an 8-bit image's depth byte to 16 declares twice the pixel
    // bytes the stream holds → rejected as truncated (16-bit itself is
    // supported; a LYING header is not)
    val sixteenBit = ok.clone(); sixteenBit(24) = 16.toByte
    assert(PngPixelStats.parse(sixteenBit) == null)
    val twelveBit = ok.clone(); twelveBit(24) = 12.toByte // invalid depth
    assert(PngPixelStats.parse(twelveBit) == null)
    val palette = ok.clone(); palette(25) = 3.toByte
    assert(PngPixelStats.parse(palette) == null)
    // forged IHDR with absurd dims must be rejected BEFORE allocating
    val forged = ok.clone()
    forged(16) = 0x7f.toByte; forged(17) = 0xff.toByte // width ≈ 2^31
    assert(PngPixelStats.parse(forged) == null)
    // dims chosen so h*(1+3w) wraps Long past 2^63 (review finding): both
    // dimensions are individually plausible-looking but the product would
    // overflow — the per-dimension cap must reject before multiplying
    val wrap = ok.clone()
    def putBe32(at: Int, v: Long): Unit = {
      wrap(at) = (v >>> 24).toByte; wrap(at + 1) = (v >>> 16).toByte
      wrap(at + 2) = (v >>> 8).toByte; wrap(at + 3) = v.toByte
    }
    putBe32(16, 1666666666L) // w
    putBe32(20, 2000000000L) // h → h*(1+3w) ≈ 1e19 > 2^63
    assert(PngPixelStats.parse(wrap) == null)
    // bad zlib bytes inside a well-formed chunk walk
    val badz = makePng(2, 2, 1, Array.fill(4)(5), _ => 0)
    val idatData = badz.indexOfSlice("IDAT".getBytes.toSeq) + 4
    badz(idatData) = 0x00.toByte // clobber the zlib CMF byte (method ≠ 8)
    assert(PngPixelStats.parse(badz) == null)
  }

  test("stored-block fixtures decode and match the text-derived pixels") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(30)
    val m = Multimodal.pngPixelMediaFromDocuments(docs)
    val got = m.select(col("media_id"), col("width"), col("height"),
        graft.functions.MediaFunctions.pngPixelStats(col("payload")).as("p"))
      .collect()
    assert(got.length == 30)
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    got.foreach { r =>
      val id = r.getLong(0); val w = r.getInt(1); val h = r.getInt(2)
      val p = r.getStruct(3)
      assert(p != null, s"fixture for doc $id failed to decode")
      assert((p.getInt(0), p.getInt(1), p.getInt(2)) == ((w, h, 3)))
      val need = w * h * 3
      val tb = texts(id).getBytes("UTF-8")
      val pixels = (0 until need).map(i => if (i < tb.length) tb(i) & 0xff else 0x41).toArray
      val (es, emn, emx) = expectStats(w, h, 3, pixels)
      assert(p.getSeq[Long](4) == es, s"sums for doc $id")
      assert(p.getSeq[Int](5) == emn && p.getSeq[Int](6) == emx, s"min/max for doc $id")
    }
  }

  test("extractFeatures uses real pixel features for decodable PNGs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(10)
    val m = Multimodal.pngPixelMediaFromDocuments(docs)
    val feats = Multimodal.extractFeatures(m, dim = 9).collect()
    assert(feats.length == 10)
    // dim 9 = [mean,min,max] × 3 channels, each normalized into [0,1]
    val stats = m.select(col("media_id"),
        graft.functions.MediaFunctions.pngPixelStats(col("payload")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getStruct(1)).toMap
    feats.foreach { f =>
      val p = stats(f.media_id)
      val n = p.getInt(0).toFloat * p.getInt(1)
      for (c <- 0 until 3) {
        assert(f.features(c * 3) == (p.getSeq[Long](4)(c) / n) / 255.0f)
        assert(f.features(c * 3 + 1) == p.getSeq[Int](5)(c) / 255.0f)
        assert(f.features(c * 3 + 2) == p.getSeq[Int](6)(c) / 255.0f)
      }
    }
  }

  test("hand-encoded JPEG mosaic round-trips EXACTLY through javax.imageio") {
    import graft.multimodal.JpegFixtures
    // 3x2 blocks covering value extremes and adjacent diffs (DC deltas of
    // every sign/magnitude class the fixture can hit)
    val vals = Array(0, 255, 128, 65, 66, 1)
    val payload = JpegFixtures.encodeGrayMosaic(vals, blocksW = 3, blocksH = 2)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    assert(img != null, "imageio must accept the hand-written baseline JPEG")
    assert(img.getWidth == 24 && img.getHeight == 16)
    val raster = img.getRaster
    assert(raster.getNumBands == 1)
    for (y <- 0 until 16; x <- 0 until 24) {
      val expected = vals((y / 8) * 3 + (x / 8))
      assert(raster.getSample(x, y, 0) == expected,
        s"pixel ($x,$y): got ${raster.getSample(x, y, 0)}, want $expected")
    }
    // and the batch-path stats agree analytically
    val st = Multimodal.imageIoPixelStats(payload).get
    assert(st.width == 24 && st.height == 16 && st.channels == 1 && st.depth == 8)
    assert(st.sums(0) == vals.map(_.toLong * 64).sum)
    assert(st.mins(0) == 0 && st.maxs(0) == 255)
  }

  test("progressive JPEG decodes through the same codec path") {
    // uniform gray written by the JDK's own encoder in PROGRESSIVE mode at
    // quality 1.0 (all-ones quant tables): uniform + lossless quantization
    // round-trips exactly, so the expected stats are analytic here too
    val v = 77
    val img = new java.awt.image.BufferedImage(32, 24,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val g = img.getRaster
    for (y <- 0 until 24; x <- 0 until 32) g.setSample(x, y, 0, v)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(1.0f)
    params.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val buf = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(buf)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    ios.close(); writer.dispose()
    val payload = buf.toByteArray
    // really progressive: frame header is SOF2 (FF C2)
    assert(payload.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2),
      "writer must have produced a progressive (SOF2) stream")
    val st = Multimodal.imageIoPixelStats(payload).get
    assert(st.width == 32 && st.height == 24 && st.channels == 1)
    assert(st.mins(0) == v && st.maxs(0) == v && st.sums(0) == v.toLong * 32 * 24)
  }

  test("3-channel RGB JPEG decodes with per-channel stats through the codec path") {
    // uniform RGB at quality 1.0: luma/chroma quantization is lossless on
    // a constant image, but the RGB→YCbCr→RGB conversion itself rounds —
    // allow ±2 per channel while pinning channel COUNT, dims, and that
    // the three channels carry their own (distinct) statistics
    val (r0, g0, b0) = (200, 60, 120)
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 16; x <- 0 until 16)
      img.setRGB(x, y, (r0 << 16) | (g0 << 8) | b0)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(1.0f)
    val buf = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(buf)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    ios.close(); writer.dispose()
    val st = Multimodal.imageIoPixelStats(buf.toByteArray).get
    assert(st.width == 16 && st.height == 16 && st.channels == 3 && st.depth == 8)
    val means = (0 until 3).map(c => st.sums(c) / 256.0)
    for ((want, c) <- Seq(r0, g0, b0).zipWithIndex) {
      assert(math.abs(means(c) - want) <= 2.0,
        s"channel $c mean ${means(c)} vs $want")
      assert(st.maxs(c) - st.mins(c) <= 4,
        s"uniform image: channel $c spread ${st.mins(c)}..${st.maxs(c)}")
    }
  }

  test("corrupt and truncated payloads are rejected, not fabricated") {
    import graft.multimodal.JpegFixtures
    val good = JpegFixtures.encodeGrayMosaic(Array(10, 200), 2, 1)
    assert(Multimodal.imageIoPixelStats(good).isDefined)
    // truncated mid-entropy-data: the codec must not return fake pixels
    assert(Multimodal.imageIoPixelStats(good.take(good.length - 6)).isEmpty)
    // SOI magic + garbage
    assert(Multimodal.imageIoPixelStats(
      Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte) ++ Array.fill[Byte](64)(7)).isEmpty)
    // plain garbage and empty
    assert(Multimodal.imageIoPixelStats(Array.fill[Byte](32)(42)).isEmpty)
    assert(Multimodal.imageIoPixelStats(Array.empty[Byte]).isEmpty)
    // the q30 fixture's spec-shaped-header-plus-text payloads reject too
    val fakes = media.limit(4).collect()
    fakes.foreach { r =>
      val p = r.getAs[Array[Byte]]("payload")
      assert(Multimodal.imageIoPixelStats(p).isEmpty,
        s"fake payload for media ${r.getLong(0)} must be rejected")
    }
  }

  test("decodePixelStats emits exact stats for JPEG fixtures and drops rejects") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(12)
    val m = Multimodal.jpegMediaFromDocuments(docs)
    val stats = Multimodal.decodePixelStats(m).collect().map(s => s.media_id -> s).toMap
    val texts = docs.select("doc_id", "text").collect()
      .filter(!_.isNullAt(1)).map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(stats.keySet == texts.keySet)
    texts.foreach { case (id, text) =>
      val bw = (id % 3 + 1).toInt; val bh = (id % 2 + 1).toInt
      val tb = text.getBytes("UTF-8")
      val vals = Array.tabulate(bw * bh)(i => if (i < tb.length) tb(i) & 0xff else 'A'.toInt)
      val s = stats(id)
      assert(s.width == bw * 8 && s.height == bh * 8 && s.channels == 1 && s.depth == 8)
      assert(s.ch_sum(0) == vals.map(_.toLong * 64).sum, s"sum for doc $id")
      assert(s.ch_min(0) == vals.min && s.ch_max(0) == vals.max, s"min/max for doc $id")
    }
    // a reject row vanishes from the output rather than emitting junk
    val withJunk = m.unionByName(spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(-1L, "jpeg", 8, 8, Array.fill[Byte](16)(3))),
      m.schema))
    assert(!Multimodal.decodePixelStats(withJunk).collect().exists(_.media_id == -1L))
  }

  test("extractFeatures uses real pixel features for decodable JPEGs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(8)
    val m = Multimodal.jpegMediaFromDocuments(docs)
    val feats = Multimodal.extractFeatures(m, dim = 3).collect()
    val stats = Multimodal.decodePixelStats(m).collect().map(s => s.media_id -> s).toMap
    assert(feats.nonEmpty && feats.forall(_.features.length == 3))
    feats.foreach { f =>
      val s = stats(f.media_id)
      val n = s.width.toFloat * s.height
      assert(f.features(0) == (s.ch_sum(0) / n) / 255.0f)
      assert(f.features(1) == s.ch_min(0) / 255.0f)
      assert(f.features(2) == s.ch_max(0) / 255.0f)
    }
  }

  test("frame-sample plan is metadata-only and bounded") {
    val plan = Multimodal.frameSamplePlan(media, fps = 30, stride = 10, maxFrames = 8)
    val counts = plan.groupBy("media_id").count().collect().map(_.getLong(1))
    assert(counts.forall(c => c >= 1 && c <= 8))
    // the payload column must not appear in the plan (blob pruned at scan)
    assert(!plan.queryExecution.optimizedPlan.toString.contains("payload"))
  }

  // ---- perceptual grid hashes (aHash / dHash) ----------------------------

  /** Independent reimplementation of the 8×8 / 9×8 grid hashes straight
    * from their definition (floor-div cells, integer cross-multiplied
    * comparisons) — the reference the expressions are checked against. */
  private def refGrid(w: Int, h: Int, ch: Int, pixels: Array[Int],
      gw: Int): (Array[Long], Array[Long]) = {
    val lumaCh = math.min(ch, 3)
    val sums = new Array[Long](gw * 8); val cnts = new Array[Long](gw * 8)
    for (y <- 0 until h; x <- 0 until w) {
      var l = 0L
      for (c <- 0 until lumaCh) l += pixels((y * w + x) * ch + c)
      val cell = (y * 8 / h) * gw + (x * gw / w)
      sums(cell) += l; cnts(cell) += 1
    }
    (sums, cnts)
  }

  private def refAHash(w: Int, h: Int, ch: Int, pixels: Array[Int]): Long = {
    val (s, c) = refGrid(w, h, ch, pixels, 8)
    val ts = s.sum; val tc = c.sum
    (0 until 64).foldLeft(0L)((acc, b) =>
      if (c(b) > 0 && s(b) * tc > ts * c(b)) acc | (1L << (63 - b)) else acc)
  }

  private def refDHash(w: Int, h: Int, ch: Int, pixels: Array[Int]): Long = {
    val (s, c) = refGrid(w, h, ch, pixels, 9)
    var hash = 0L
    for (r <- 0 until 8; cc <- 0 until 8) {
      val i = r * 9 + cc
      if (s(i) * c(i + 1) > s(i + 1) * c(i)) hash |= 1L << (63 - (r * 8 + cc))
    }
    hash
  }

  test("aHash/dHash match the independent grid reference across shapes, depths, encodings") {
    import graft.functions.PngGridHash
    val rnd = new scala.util.Random(314)
    for (ch <- Seq(1, 3, 4); (w, h) <- Seq((8, 8), (11, 7), (3, 2), (40, 25), (1, 1))) {
      val pixels = Array.fill(w * h * ch)(rnd.nextInt(256))
      val ea = refAHash(w, h, ch, pixels); val ed = refDHash(w, h, ch, pixels)
      // the hash is an ENCODING-independent pixel property: every filter
      // strategy and IDAT split of the same pixels hashes identically
      for (f <- Seq[Int => Int](_ => 0, _ => 4, r => r % 5)) {
        val png = makePng(w, h, ch, pixels, f, idatSplit = 2)
        assert(PngGridHash.aHash(png) == ea, s"ahash w=$w h=$h ch=$ch")
        assert(PngGridHash.dHash(png) == ed, s"dhash w=$w h=$h ch=$ch")
      }
    }
    // 16-bit samples: luma sums the 16-bit values (no truncation)
    val px16 = Array.fill(9 * 6 * 3)(rnd.nextInt(65536))
    assert(PngGridHash.aHash(makePng(9, 6, 3, px16, _ => 2, depth = 16)) ==
      refAHash(9, 6, 3, px16))
    assert(PngGridHash.dHash(makePng(9, 6, 3, px16, _ => 2, depth = 16)) ==
      refDHash(9, 6, 3, px16))
  }

  test("aHash/dHash hand goldens: half-bright split and monotone gradient") {
    import graft.functions.PngGridHash
    // 8×8 RGB, top half black, bottom half white: exactly the bottom 32
    // cells exceed the mean → aHash = 0x00000000FFFFFFFF; every row is
    // uniform → no horizontal gradient → dHash = 0
    val split = Array.tabulate(8 * 8 * 3)(i => if ((i / (8 * 3)) < 4) 0 else 255)
    val png = makePng(8, 8, 3, split, _ => 0)
    assert(PngGridHash.aHash(png) == 0x00000000FFFFFFFFL)
    assert(PngGridHash.dHash(png) == 0L)
    // 9×8 grayscale, luma strictly decreasing left→right (constant per
    // column): all 64 left>right comparisons fire → dHash = all ones
    val grad = Array.tabulate(8 * 9)(i => 255 - (i % 9) * 28)
    assert(PngGridHash.dHash(makePng(9, 8, 1, grad, _ => 1)) == -1L)
  }

  test("hash NULL contract: interlaced and oversize reject, stats still decode") {
    import graft.functions.{PngGridHash, PngPixelStats}
    val rnd = new scala.util.Random(77)
    // multi-pass Adam7: stream order loses pixel positions → hash NULL,
    // while the position-free channel stats still decode the same bytes
    val px = Array.fill(8 * 8 * 3)(rnd.nextInt(256))
    val inter = makePng(8, 8, 3, px, _ => 0, interlaced = true)
    assert(PngPixelStats.parse(inter) != null)
    assert(PngGridHash.aHash(inter) == null && PngGridHash.dHash(inter) == null)
    // over the 2²⁰-pixel Long-overflow guard: 1025×1024 rejects,
    // 1024×1024 (exactly the cap) hashes
    val big = makePng(1025, 1024, 1, Array.fill(1025 * 1024)(7), _ => 0)
    assert(PngPixelStats.parse(big) != null)
    assert(PngGridHash.aHash(big) == null)
    val cap = makePng(1024, 1024, 1, Array.fill(1024 * 1024)(7), _ => 0)
    assert(PngGridHash.aHash(cap) != null)
    // garbage and the q30-style fake payloads reject through the Column
    // path (exercises the codegen'd expressions end-to-end)
    import graft.functions.MediaFunctions
    val df = spark.createDataFrame(java.util.List.of(
      org.apache.spark.sql.Row(1L, makePng(4, 3, 3, Array.fill(36)(9), _ => 1)),
      org.apache.spark.sql.Row(2L, "not a png".getBytes),
      org.apache.spark.sql.Row(3L, null)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.BinaryType))))
    val out = df.select(col("id"),
        MediaFunctions.pngAHash64(col("payload")).as("ah"),
        MediaFunctions.pngDHash64(col("payload")).as("dh"))
      .collect().map(r => r.getLong(0) -> (r.isNullAt(1), r.isNullAt(2))).toMap
    assert(out(1L) == ((false, false)) && out(2L) == ((true, true)) && out(3L) == ((true, true)))
  }

  test("banded image near-dup pairs equal brute force (pigeonhole recall 1)") {
    import graft.ops.MediaDedup
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(80)
    val crawl = Multimodal.warcImageCrawlFromDocuments(docs)
    val media = Multimodal.extractWarcMedia(crawl, "media_id", "payload")
      .select(regexp_extract(col("url"), "/media/(\\d+)\\.png$", 1)
        .cast("long").as("media_id"), col("payload"))
    val sigs = MediaDedup.aHashTable(media, "payload", "media_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    for (maxH <- Seq(0, 3, 7)) {
      val brute = (for {
        (ida, sa) <- sigs; (idb, sb) <- sigs
        if ida < idb && java.lang.Long.bitCount(sa ^ sb) <= maxH
      } yield (ida, idb)).toSet
      val banded = MediaDedup.nearDuplicateImagePairs(media, "payload", "media_id", maxH)
        .collect().map(r => (math.min(r.getLong(0), r.getLong(1)),
          math.max(r.getLong(0), r.getLong(1)))).toSet
      assert(banded == brute, s"maxHamming=$maxH: banded ${banded.size} vs brute ${brute.size}")
      if (maxH >= 3) assert(brute.nonEmpty, "fixture must plant near-dup pairs")
    }
  }

  test("imageDedupReport: planted exact group, near-dup variants, stage invariants") {
    import graft.ops.MediaDedup
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    val crawl = Multimodal.warcImageCrawlFromDocuments(docs)
    val media = Multimodal.extractWarcMedia(crawl, "media_id", "payload")
      .select(regexp_extract(col("url"), "/media/(\\d+)\\.png$", 1)
        .cast("long").as("media_id"), col("payload"))
    val report = MediaDedup.imageDedupReport(media, "payload", "media_id", maxHamming = 3)
      .select("media_id", "status", "keeper").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val constIds = docs.select("doc_id", "text").collect()
      .filter(r => !r.isNullAt(1) && r.getLong(0) % 7 == 0).map(_.getLong(0) * 10)
    assert(constIds.length >= 2, "fixture must have a constant-image group")
    // the constant-image group: min id kept, the rest exact_dup onto it
    val keepConst = constIds.min
    assert(report(keepConst)._1 == "kept")
    constIds.filter(_ != keepConst).foreach { id =>
      assert(report(id) == (("exact_dup", keepConst)), s"media $id") }
    // invariants: kept rows keep themselves; every near_dup keeper is a
    // kept row with a smaller id (keep-min policy, transitive clustering)
    report.foreach { case (id, (status, keeper)) =>
      if (status == "kept") assert(keeper == id)
      if (status == "near_dup") {
        assert(keeper < id && report(keeper)._1 == "kept", s"media $id -> $keeper") }
    }
    assert(report.values.count(_._1 == "near_dup") > 0, "variants must pair up")
    // the clean-corpus form is exactly the kept rows
    val kept = MediaDedup.dropDuplicateImages(media, "payload", "media_id", 3)
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(kept == report.filter(_._2._1 == "kept").keySet)
  }

  test("extractWarcMedia harvests typed responses only, bodies decode") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    val nText = docs.where(col("text").isNotNull).count()
    val crawl = Multimodal.warcImageCrawlFromDocuments(docs)
    val out = Multimodal.extractWarcMedia(crawl, "media_id", "payload")
    assert(out.columns.toSeq == Seq("warc_id", "url", "content_type", "payload"))
    val rows = out.collect()
    assert(rows.forall(_.getString(2) == "image/png"))
    assert(rows.forall(_.getString(1).contains("/media/"))) // html pages excluded
    val expVariants = docs.select("doc_id", "text").collect()
      .count(r => !r.isNullAt(1) && r.getLong(0) % 5 == 0 && r.getLong(0) % 7 != 0)
    assert(rows.length == nText + expVariants)
    // every harvested body is a decodable PNG with the fixture's dims
    import graft.functions.MediaFunctions
    val dims = out.select(
        regexp_extract(col("url"), "/media/(\\d+)\\.png$", 1).cast("long").as("mid"),
        MediaFunctions.pngPixelStats(col("payload")).as("p"))
      .collect()
    dims.foreach { r =>
      assert(!r.isNullAt(1), s"media ${r.getLong(0)} must decode")
      val docId = r.getLong(0) / 10
      val p = r.getStruct(1)
      val (ew, eh) =
        if (docId % 7 == 0) (8, 6) else ((docId % 6 + 6).toInt, (docId % 4 + 5).toInt)
      assert(p.getInt(0) == ew && p.getInt(1) == eh, s"dims for media ${r.getLong(0)}")
    }
    // a text/html-only prefix filter harvests nothing from image records
    assert(Multimodal.extractWarcMedia(crawl, "media_id", "payload",
      typePrefixes = Seq("text/html")).collect()
      .forall(_.getString(1).contains("/page/")))
  }

  test("image quality battery: signals vs hand math, NULL contract, curation form") {
    import graft.ops.MediaQuality
    val rnd = new scala.util.Random(9)
    // 10x5 RGB random: hand-compute the signals from the pixel array
    val px = Array.fill(10 * 5 * 3)(rnd.nextInt(256))
    val good = makePng(10, 5, 3, px, _ => 2)
    // 4x4 grayscale CONSTANT 65: fails dims (4 < 7), dyn_range (0 < 8),
    // luma (65 < 70); aspect 1.0 passes
    val flat = makePng(4, 4, 1, Array.fill(16)(65), _ => 0)
    val df = spark.createDataFrame(java.util.List.of(
      org.apache.spark.sql.Row(1L, good),
      org.apache.spark.sql.Row(2L, flat),
      org.apache.spark.sql.Row(3L, "junk".getBytes)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.BinaryType))))
    val r = MediaQuality.imageQualityReport(df, "payload", "media_id")
      .collect().map(x => x.getLong(0) -> x).toMap
    val g = r(1L)
    assert(g.getLong(1) == 10 && g.getLong(2) == 5)
    assert(g.getDouble(3) == 2.0) // aspect 10/5
    assert(g.getDouble(4) == px.map(_.toLong).sum.toDouble / (3 * 50))
    val chRange = (0 until 3).map(c =>
      px.indices.filter(_ % 3 == c).map(px).max - px.indices.filter(_ % 3 == c).map(px).min).max
    assert(g.getLong(5) == chRange)
    assert(g.getLong(6) == good.length)
    // good fails dims (5 < 7) and aspect (2.0 > 1.8), passes the rest
    assert((g.getBoolean(7), g.getBoolean(8), g.getBoolean(9), g.getBoolean(10), g.getBoolean(11))
      == ((false, false, true, true, false)))
    val f = r(2L)
    assert((f.getBoolean(7), f.getBoolean(8), f.getBoolean(9), f.getBoolean(10), f.getBoolean(11))
      == ((false, true, false, false, false)))
    // undecodable: NULL signals, every gate false — reject, never fabricate
    val j = r(3L)
    assert(j.isNullAt(1) && j.isNullAt(3) && j.isNullAt(5))
    assert(!j.getBoolean(7) && !j.getBoolean(8) && !j.getBoolean(11))
    // curation form = the passing subset (widen the gates so `good` passes)
    val kept = MediaQuality.keepQualityImages(df, "payload", "media_id",
        minDim = 5L, maxAspect = 2.0, minDynRange = 8L, lumaBounds = (20.0, 200.0))
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L))
  }

  // ---- audio: energy-envelope hash + dedup ladder + quality -------------

  private def le16b(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32b(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** 16-bit mono PCM WAV from a sample array; `extraChunk` inserts an
    * unknown chunk before `data` (a byte-different "re-encode" of the
    * same samples — the chunk walk must skip it). */
  private def wav16(samples: Array[Int], sr: Int = 8000,
      extraChunk: Boolean = false): Array[Byte] = {
    val data = samples.flatMap(v => le16b(v & 0xffff))
    val extra = if (extraChunk) "LIST".getBytes ++ le32b(4) ++ "info".getBytes
      else Array.emptyByteArray
    val fmtC = "fmt ".getBytes ++ le32b(16) ++ le16b(1) ++ le16b(1) ++
      le32b(sr) ++ le32b(sr * 2) ++ le16b(2) ++ le16b(16)
    val body = fmtC ++ extra ++ "data".getBytes ++ le32b(data.length) ++ data
    "RIFF".getBytes ++ le32b(4 + body.length) ++ "WAVE".getBytes ++ body
  }

  /** Independent reimplementation of the envelope hash from its
    * definition (65 equal floor-div windows, adjacent strict-greater). */
  private def refEnvelope(samples: Array[Int]): Long = {
    val L = samples.length / 65
    val e = Array.tabulate(65)(w =>
      (w * L until (w + 1) * L).map(k => samples(k).toLong * samples(k)).sum)
    (0 until 64).foldLeft(0L)((a, b) => if (e(b) > e(b + 1)) a | (1L << (63 - b)) else a)
  }

  test("pcm envelope hash: windowed reference parity, gain/container invariance, NULL") {
    import graft.functions.PcmEnvelopeHash64
    val rnd = new scala.util.Random(33)
    val samples = Array.fill(300)(rnd.nextInt(8000) - 4000)
    assert(PcmEnvelopeHash64.compute(wav16(samples)) == refEnvelope(samples))
    // uniform gain scales every window energy by 4 exactly — the loudness
    // CONTOUR (and so the hash) is unchanged
    assert(PcmEnvelopeHash64.compute(wav16(samples.map(_ * 2))) == refEnvelope(samples))
    // container re-encode (extra skipped chunk): different bytes, same hash
    val re = wav16(samples, extraChunk = true)
    assert(!java.util.Arrays.equals(re, wav16(samples)))
    assert(PcmEnvelopeHash64.compute(re) == refEnvelope(samples))
    // sub-65-sample streams and garbage hash NULL; exactly 65 hashes (L=1)
    assert(PcmEnvelopeHash64.compute(wav16(Array.fill(64)(5))) == null)
    assert(PcmEnvelopeHash64.compute("garbage".getBytes) == null)
    assert(PcmEnvelopeHash64.compute(wav16(Array.tabulate(65)(i => i * 50))) != null)
    // 8-BIT path: unsigned bytes center at 128; the same contour hashes
    // identically through the independent reference on centered values
    val bytes8 = Array.fill(260)(rnd.nextInt(256))
    val data8 = bytes8.map(_.toByte)
    val wav8 = "RIFF".getBytes ++ le32b(4 + 24 + 8 + data8.length) ++ "WAVE".getBytes ++
      ("fmt ".getBytes ++ le32b(16) ++ le16b(1) ++ le16b(1) ++ le32b(8000) ++
        le32b(8000) ++ le16b(1) ++ le16b(8)) ++
      "data".getBytes ++ le32b(data8.length) ++ data8
    assert(PcmEnvelopeHash64.compute(wav8) == refEnvelope(bytes8.map(_ - 128)))
  }

  test("audioDedupReport: byte dups, re-encode near-dups, dented-sample near-dups") {
    import graft.ops.MediaDedup
    val rnd = new scala.util.Random(44)
    val base = Array.fill(260)(rnd.nextInt(8000) - 4000)
    val other = Array.fill(260)(rnd.nextInt(8000) - 4000)
    // a dent in ONE sample moves one window energy — at most the two
    // adjacent comparison bits flip, so hamming ≤ 2 ≤ maxHamming
    val dented = base.clone(); dented(130) = dented(130) + 600
    val rows = Seq(
      1L -> wav16(base),
      2L -> wav16(base),                      // byte dup of 1 → exact_dup
      3L -> wav16(base, extraChunk = true),   // re-encode → near_dup (hd 0)
      4L -> wav16(dented),                    // dented → near_dup (hd ≤ 2)
      5L -> wav16(other),                     // unrelated → kept
      6L -> "not audio".getBytes)             // undecodable → kept (no state)
    val df = spark.createDataFrame(
      java.util.List.of(rows.map { case (i, p) =>
        org.apache.spark.sql.Row(i, p) }: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.BinaryType))))
    val got = MediaDedup.audioDedupReport(df, "payload", "media_id", maxHamming = 3)
      .select("media_id", "status", "keeper").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L) == (("kept", 1L)))
    assert(got(2L) == (("exact_dup", 1L)))
    assert(got(3L) == (("near_dup", 1L)))
    assert(got(4L) == (("near_dup", 1L)))
    assert(got(5L) == (("kept", 5L)))
    assert(got(6L) == (("kept", 6L)))
  }

  test("audio quality battery: signals from the PCM parsers, gates split") {
    import graft.ops.MediaQuality
    val loud = Array.tabulate(200)(i => 3000 + (i % 7) * 100)
    val quiet = Array.fill(200)(3)
    val clipped = Array.tabulate(200)(i => if (i % 3 == 0) 32767 else 1000)
    val df = spark.createDataFrame(java.util.List.of(
      org.apache.spark.sql.Row(1L, wav16(loud, sr = 16000)),
      org.apache.spark.sql.Row(2L, wav16(quiet, sr = 16000)),
      org.apache.spark.sql.Row(3L, wav16(clipped, sr = 16000)),
      org.apache.spark.sql.Row(4L, wav16(loud, sr = 8000)),
      org.apache.spark.sql.Row(5L, "junk".getBytes)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.BinaryType))))
    val r = MediaQuality.audioQualityReport(df, "payload", "media_id",
      minSampleRate = 16000L, maxChannels = 2L, minDurationS = 0.005,
      minRms = 100.0, clipPeak = 32000L)
      .collect().map(x => x.getLong(0) -> x).toMap
    // undecodable rows are not audio rows (report covers decodable only)
    assert(r.keySet == Set(1L, 2L, 3L, 4L))
    val g = r(1L)
    assert(g.getLong(1) == 16000 && g.getLong(2) == 1 && g.getLong(3) == 200)
    assert(g.getDouble(4) == 200.0 / 16000)
    assert(g.getAs[Boolean]("passes"))
    assert(!r(2L).getAs[Boolean]("ok_level") && !r(2L).getAs[Boolean]("passes"))
    assert(!r(3L).getAs[Boolean]("ok_clip") && r(3L).getLong(5) == 32767)
    assert(!r(4L).getAs[Boolean]("ok_rate") && r(4L).getAs[Boolean]("ok_duration"))
  }

  test("curateImages ≡ manual gates-then-ladder composition; frozen ≡ unfrozen") {
    import graft.ops.{MediaDedup, MediaPipeline, MediaQuality}
    import org.apache.spark.sql.graftbridge.DatasetBridge
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(90)
    def media = Multimodal.extractWarcMedia(
        Multimodal.warcImageCrawlFromDocuments(docs), "media_id", "payload")
      .select(regexp_extract(col("url"), "/media/(\\d+)\\.png$", 1)
        .cast("long").as("media_id"), col("payload"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("media_id", "status", "keeper").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val capstone = rows(MediaPipeline.curateImages(media, "payload", "media_id",
      minDim = 6L, maxAspect = 2.2, minDynRange = 0L, lumaBounds = (60.0, 200.0)))
    // manual composition: gate, then ladder over the pool, rejects unioned
    val gated = media.withColumn("__p__", MediaQuality.imageGates(
      MediaQuality.imageSignals(col("payload")),
      minDim = 6L, maxAspect = 2.2, minDynRange = 0L,
      lumaBounds = (60.0, 200.0)).getField("passes"))
    val manual = rows(MediaDedup.imageDedupReport(
        gated.where(col("__p__")).drop("__p__"), "payload", "media_id", 3)
        .select("media_id", "status", "keeper"))
      .union(gated.where(!col("__p__")).select("media_id").collect()
        .map(r => (r.getLong(0), "quality_reject", r.getLong(0))).toSet)
    assert(capstone == manual)
    assert(capstone.map(_._2) == Set("quality_reject", "exact_dup", "near_dup", "kept"))
    // frozen run: identical decisions
    val chain = new DatasetBridge.FreezeChain
    try {
      val frozen = rows(MediaPipeline.curateImages(media, "payload", "media_id",
        minDim = 6L, maxAspect = 2.2, minDynRange = 0L, lumaBounds = (60.0, 200.0),
        chain = Some(chain)))
      assert(frozen == capstone)
    } finally chain.releaseAll()
  }

  test("video quality battery: signals through the real box walk, gates split") {
    import graft.ops.MediaQuality
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(30)
    val m = Multimodal.videoFromDocuments(docs)
    val r = MediaQuality.videoQualityReport(m, "payload", "media_id",
      minDurationMs = 1000L, maxDurationMs = 12000L, minDim = 360L,
      maxAspect = 2.5, maxTracks = 1L)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r.size == 30)
    r.foreach { case (id, row) =>
      val ts = 600L * (id % 4 + 1); val durMs = (id % 9000 + 600) * 1000 / ts
      val w = (id % 8) * 160 + 320; val h = (id % 6) * 120 + 240
      assert(row.getLong(1) == ts && row.getLong(2) == durMs, s"video $id")
      assert(row.getLong(4) == w && row.getLong(5) == h, s"dims $id")
      assert(row.getAs[Boolean]("ok_tracks") == (id % 2 == 0), s"tracks $id")
      assert(row.getAs[Boolean]("passes") ==
        (durMs >= 1000 && durMs <= 12000 && math.min(w, h) >= 360 &&
          math.max(w, h).toDouble / math.min(w, h) <= 2.5 && id % 2 == 0))
    }
    // unparseable payloads are not video rows; NULL signals fail the gates
    val junk = spark.createDataFrame(java.util.List.of(
      org.apache.spark.sql.Row(-1L, "not a video".getBytes)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.BinaryType))))
    assert(MediaQuality.videoQualityReport(junk, "payload", "media_id").count() == 0)
    assert(junk.select(MediaQuality.videoGates(
        MediaQuality.videoSignals(col("payload"))).getField("passes"))
      .head().getBoolean(0) == false)
  }

  test("dedupReport payload locality: binary crosses no exchange except the keyed re-verify") {
    import graft.ops.MediaDedup
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.BinaryType
    // auto-broadcast OFF: without the explicit broadcast() hints on the
    // decision-table attaches, AQE would plan id-keyed shuffle joins that
    // move image BYTES through the exchange on exactly the crawls where
    // dedup pays (high duplication). The hints must hold regardless.
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
      val crawl = Multimodal.warcImageCrawlFromDocuments(docs)
      val media = Multimodal.extractWarcMedia(crawl, "media_id", "payload")
        .select(regexp_extract(col("url"), "/media/(\\d+)\\.png$", 1)
          .cast("long").as("media_id"), col("payload"))
      // keep the payload in the OUTPUT (the q135-style narrow select would
      // let column pruning hide the problem): dropDuplicateImages returns
      // payload-carrying rows through both attach joins
      val kept = MediaDedup.dropDuplicateImages(media, "payload", "media_id")
      kept.queryExecution.toRdd.count() // finalize every AQE stage
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
      def flatten(p: SparkPlan): Seq[SparkPlan] = {
        val expanded = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec => Seq(q.plan)
          case r: ReusedExchangeExec => Seq(r.child)
          case _ => p.children
        }
        p +: expanded.flatMap(flatten)
      }
      val exchanges = flatten(kept.queryExecution.executedPlan).collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.nonEmpty, "the ladder must plan (hash-narrow) exchanges")
      val binaryCarrying = exchanges.filter(
        _.child.output.exists(_.dataType == BinaryType))
      // the ONLY exchange allowed to carry bytes is the candidate
      // re-verify, which is PARTITIONED BY the payload key itself —
      // id-keyed exchanges must never carry payload as a passenger
      binaryCarrying.foreach { e =>
        val partitionsOnBinary = e.outputPartitioning match {
          case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
            h.expressions.exists(_.dataType == BinaryType)
          case _ => false
        }
        assert(partitionsOnBinary,
          s"exchange carries binary but is not the keyed re-verify:\n$e")
      }
      // and the decisions themselves are unchanged by the restriction of
      // the keeper map to pair participants
      val report = MediaDedup.imageDedupReport(media, "payload", "media_id")
        .groupBy("status").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(report.getOrElse("exact_dup", 0L) > 0 &&
        report.getOrElse("near_dup", 0L) > 0 && report.getOrElse("kept", 0L) > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("broadcast-decisions knob: hints off ⇒ shuffle failover, decisions unchanged") {
    import graft.ops.{Dedup, MediaDedup}
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    val crawl = Multimodal.warcImageCrawlFromDocuments(docs)
    val media = Multimodal.extractWarcMedia(crawl, "media_id", "payload")
      .select(regexp_extract(col("url"), "/media/(\\d+)\\.png$", 1)
        .cast("long").as("media_id"), col("payload"))
    def reportSet() = MediaDedup.imageDedupReport(media, "payload", "media_id")
      .select("media_id", "status", "keeper").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val withHints = reportSet()
    val priorBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // the pathological-corpus failover: knob off + auto-broadcast off
      // must degrade the decision attaches to shuffle joins (no broadcast
      // exchange anywhere — no driver-side collect to OOM) while the
      // DECISIONS stay bit-identical
      spark.conf.set(Dedup.BroadcastDecisionsKey, "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val without = MediaDedup.imageDedupReport(media, "payload", "media_id")
        .select("media_id", "status", "keeper")
      without.queryExecution.toRdd.count() // finalize AQE stages
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
      def flatten(p: SparkPlan): Seq[SparkPlan] = {
        val expanded = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec => Seq(q.plan)
          case r: ReusedExchangeExec => Seq(r.child)
          case _ => p.children
        }
        p +: expanded.flatMap(flatten)
      }
      val bcast = flatten(without.queryExecution.executedPlan).collect {
        case e: BroadcastExchangeExec => e
      }
      assert(bcast.isEmpty, s"knob off must plan NO broadcast exchange:\n$bcast")
      val withoutSet = without.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(withoutSet == withHints, "decisions must not depend on the join strategy")
    } finally {
      spark.conf.set(Dedup.BroadcastDecisionsKey, "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", priorBc)
    }
  }

  test("undecodable codecs are their own status, never folded into quality_reject") {
    import graft.ops.MediaPipeline
    val vals = Array(16, 235, 80, 170, 40, 210)
    val good = graft.multimodal.JpegFixtures.encodeGrayMosaic(vals, 3, 2)
    val bright = graft.multimodal.JpegFixtures.encodeGrayMosaic(Array.fill(6)(250), 3, 2)
    val gif = "GIF89a-not-decodable-by-any-supported-codec".getBytes
    val df = spark.createDataFrame(java.util.List.of(
      org.apache.spark.sql.Row(1L, good),
      org.apache.spark.sql.Row(2L, bright), // decodes, fails luma/dyn gates
      org.apache.spark.sql.Row(3L, gif)), // harvested image/… body, no codec
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("payload",
          org.apache.spark.sql.types.BinaryType))))
    val report = MediaPipeline.curateImages(df, "payload", "media_id",
      minDim = 6L, maxAspect = 2.2, minDynRange = 0L, lumaBounds = (60.0, 200.0))
      .select("media_id", "status", "keeper").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(report(1L) == (("kept", 1L)))
    assert(report(2L) == (("quality_reject", 2L)), "decodable gate failure")
    assert(report(3L) == (("undecodable", 3L)),
      "codec-coverage gap must be observable, not a quality decision")
    // and through the GIF-planted crawl fixture end-to-end
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    val crawl = graft.multimodal.Multimodal.warcImageCrawlWithGifsFromDocuments(docs)
    val media = graft.multimodal.Multimodal.extractWarcMedia(crawl, "media_id", "payload")
      .select(regexp_extract(col("url"), "/media/(\\d+)\\.(png|gif)$", 1)
        .cast("long").as("media_id"), col("payload"))
    val statuses = MediaPipeline.curateImages(media, "payload", "media_id",
      minDim = 6L, maxAspect = 2.2, minDynRange = 0L, lumaBounds = (60.0, 200.0))
      .select("media_id", "status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val gifIds = docs.select("doc_id").collect().map(_.getLong(0))
      .filter(_ % 6 == 2).map(_ * 10 + 2).toSet
    assert(gifIds.nonEmpty)
    gifIds.foreach(id => assert(statuses(id) == "undecodable", s"media $id"))
    assert(statuses.values.count(_ == "undecodable") == gifIds.size,
      "only the planted GIFs are undecodable")
  }

  test("curateAudio/curateVideo/curateMedia ≡ manual composition; frozen ≡ unfrozen; unknown kinds reject") {
    import graft.ops.{MediaDedup, MediaPipeline, MediaQuality}
    import graft.ops.MediaPipeline.{AudioPolicy, VideoPolicy, ImagePolicy}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    val all = Multimodal.multimodalMediaFromDocuments(docs)
    // MATERIALIZE the audio fixture before the unfrozen runs below: the
    // unfrozen ladder fans the input expression tree into ~8 consumers +
    // self-joins, and the fixture's Column-algebra WAV construction is a
    // huge tree — unmaterialized, Catalyst planning alone cost ~25 min
    // (measured r17/r18; it dominated the whole suite's wall clock). Both
    // code paths still run — the unfrozen path just plans over plain
    // attributes, which is exactly how real (parquet-backed) media looks.
    val audio = {
      val raw = Multimodal.audioDedupMediaFromDocuments(docs)
      spark.createDataFrame(
        java.util.Arrays.asList(raw.collect(): _*), raw.schema)
    }
    val policy = AudioPolicy(minSampleRate = 16000L, maxChannels = 1L,
      minDurationS = 0.0, minRms = 0.0, clipPeak = 40000L)
    // capstone ≡ manual gates-then-ladder
    val capstone = MediaPipeline.curateAudio(audio, "payload", "media_id", policy)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val gated = audio.withColumn("__s__", MediaQuality.audioSignals(col("payload")))
      .withColumn("__p__", MediaQuality.audioGates(col("__s__"), policy.minSampleRate,
        policy.maxChannels, policy.minDurationS, policy.minRms, policy.clipPeak)
        .getField("passes"))
    val manual = gated.where(!col("__p__"))
      .select(col("media_id"), lit("quality_reject").as("status"),
        col("media_id").as("keeper"))
      .unionByName(MediaDedup.audioDedupReport(
        gated.where(col("__p__")).drop("__s__", "__p__"), "payload", "media_id")
        .select(col("media_id"), col("status"), col("keeper")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(capstone == manual)
    assert(Set("quality_reject", "exact_dup", "near_dup", "kept")
      .subsetOf(capstone.map(_._2)), s"statuses: ${capstone.map(_._2)}")
    // curateMedia ≡ union of the per-kind capstones; unknown kinds reject
    // unknown kinds INCLUDING NULL: `kind === "image"` and `!isin(...)`
    // both evaluate NULL (false) on a NULL kind, so without the explicit
    // isNull arm in curateMedia the 999998 row would silently vanish —
    // matching no modality slice and not the unknown branch either
    val junkSchema = org.apache.spark.sql.types.StructType(
      all.schema.map(_.copy(nullable = true)))
    val withJunk = all.unionByName(spark.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row(999999L, "pdf", "oops".getBytes),
        org.apache.spark.sql.Row(999998L, null, "nokind".getBytes)),
      junkSchema))
    val vPolicy = VideoPolicy(minDurationMs = 100L, maxDurationMs = 20000L,
      minDim = 240L, maxAspect = 2.2, maxTracks = 1L)
    val iPolicy = ImagePolicy(minDim = 2L, maxAspect = 2.2, minDynRange = 0L,
      lumaBounds = (60.0, 200.0))
    // the multi-kind compositions run FROZEN (the documented contract for
    // derived frames: an unfrozen 3-ladder × 8-consumer plan over the
    // 7-way-union fixture is a Catalyst plan explosion, which is exactly
    // why curateMedia freezes once at entry)
    val chain1 = new org.apache.spark.sql.graftbridge.DatasetBridge.FreezeChain
    val dispatched = MediaPipeline.curateMedia(withJunk, "payload", "media_id", "kind",
      image = iPolicy, audio = policy, video = vPolicy, chain = Some(chain1))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val chain2 = new org.apache.spark.sql.graftbridge.DatasetBridge.FreezeChain
    val m2 = chain2.freeze(all)
    val perKind =
      MediaPipeline.curateImages(m2.where(col("kind") === "image"), "payload",
        "media_id", iPolicy.minDim, iPolicy.maxAspect, iPolicy.minDynRange,
        iPolicy.lumaBounds, chain = Some(chain2))
        .unionByName(MediaPipeline.curateAudio(m2.where(col("kind") === "audio"),
          "payload", "media_id", policy, chain = Some(chain2)))
        .unionByName(MediaPipeline.curateVideo(m2.where(col("kind") === "video"),
          "payload", "media_id", vPolicy, chain = Some(chain2)))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(dispatched == perKind + ((999999L, "quality_reject", 999999L))
      + ((999998L, "quality_reject", 999998L)))
    // frozen ≡ unfrozen bit-for-bit on the audio capstone (the tractable
    // single-ladder plan; `capstone` above IS the unfrozen run)
    val chain3 = new org.apache.spark.sql.graftbridge.DatasetBridge.FreezeChain
    val frozenAudio = MediaPipeline.curateAudio(audio, "payload", "media_id", policy,
      chain = Some(chain3))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    chain1.releaseAll(); chain2.releaseAll(); chain3.releaseAll()
    assert(frozenAudio == capstone)
  }

  test("imageDedupReport freeze knob: identical decisions, one upstream extraction") {
    import graft.ops.MediaDedup
    import org.apache.spark.sql.graftbridge.DatasetBridge
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(70)
    def media = Multimodal.extractWarcMedia(
        Multimodal.warcImageCrawlFromDocuments(docs), "media_id", "payload")
      .select(regexp_extract(col("url"), "/media/(\\d+)\\.png$", 1)
        .cast("long").as("media_id"), col("payload"))
    val unfrozen = MediaDedup.imageDedupReport(media, "payload", "media_id", 3)
    val chain = new DatasetBridge.FreezeChain
    try {
      val frozen = MediaDedup.imageDedupReport(media, "payload", "media_id", 3,
        chain = Some(chain))
      // the dedup ladder fans media out to ~8 consumers; frozen, every one
      // plans off the materialized rows — ZERO parquet re-scans of the
      // crawl source survive in the physical plan
      val plan = frozen.queryExecution.executedPlan.toString
      assert(!plan.contains("Scan parquet"),
        "frozen ladder must plan off the checkpointed frame, not re-extract")
      assert(plan.contains("Scan ExistingRDD"))
      // bit-identical decisions
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("media_id", "status", "keeper").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(rows(frozen) == rows(unfrozen))
    } finally chain.releaseAll()
  }
}

class StreamingSpec extends SparkSpecBase {
  import spark.implicits._

  test("streaming weighted windowed summary matches the batch kernel") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Option[Double], Double)]
    val sdf = input.toDF().toDF("ts", "value", "w")
    val out = StreamingWeighted.windowedSummary(sdf, "ts", "value", "w", "2 days", "1 hour")
    val q = out.writeStream.outputMode("complete").format("memory").queryName("wagg").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    input.addData(
      (ts("2024-01-01"), Some(1.0), 1.0),
      (ts("2024-01-02"), Some(2.0), 2.0),
      (ts("2024-01-03"), None, 3.0),
      (ts("2024-01-04"), Some(4.0), 4.0))
    q.processAllAvailable()
    val got = spark.table("wagg").orderBy("bucket_start").collect()
    q.stop()
    // streaming window() is epoch-aligned (2-day windows start 2023-12-31),
    // so the four daily rows land in three buckets: [1], [2, null], [4].
    // Hand-computed with the same moment formulas as the batch kernel.
    assert(got.length == 3)
    assert(cell(got(0), 1).contains(1.0) && cell(got(0), 2).contains(1.0))
    assert(cell(got(0), 3).contains(1.0) && cell(got(0), 4).isEmpty) // W=1 → var NULL
    assert(cell(got(1), 1).contains(2.0) && cell(got(1), 2).contains(4.0))
    assert(cell(got(1), 3).contains(2.0) && cell(got(1), 4).contains(0.0))
    assert(cell(got(2), 1).contains(4.0) && cell(got(2), 2).contains(16.0))
    assert(cell(got(2), 3).contains(4.0) && cell(got(2), 4).contains(0.0))
  }

  test("streaming exact dedup keeps first arrival per distinct text (hash-keyed state)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val sdf = input.toDF().toDF("doc_id", "text")
    val out = graft.streaming.StreamingDedup.dropDuplicateTexts(sdf, "text")
    val q = out.writeStream.outputMode("append").format("memory").queryName("sdedup").start()
    input.addData((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
    q.processAllAvailable()
    input.addData((4L, "beta"), (5L, "gamma")) // beta already seen in batch 1
    q.processAllAvailable()
    val got = spark.table("sdedup").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    q.stop()
    assert(got == Seq((1L, "alpha"), (2L, "beta"), (5L, "gamma")))
    // the state columns never leak into the output schema
    assert(out.schema.fieldNames.toSeq == Seq("doc_id", "text"))
  }

  test("streaming URL dedup: first capture per normalized key wins; non-URLs bypass") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val sdf = input.toDF().toDF("rec_id", "url")
    val out = graft.streaming.StreamingDedup.dropDuplicateUrls(sdf, "url")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("surldedup").start()
    input.addData(
      (1L, "HTTP://WWW.Ex.COM:80/p/?utm_source=a&b=2&a=1#f"),
      (2L, "not a url"),
      (3L, "http://www.ex.com/p?a=1&b=2")) // same key as 1 → dropped
    q.processAllAvailable()
    input.addData(
      (4L, "http://www.ex.com/p?b=2&a=1"), // still the same key → dropped
      (5L, "also not a url"),              // non-URLs never dedup each other
      (6L, "https://other.ex.com/q"))
    q.processAllAvailable()
    val got = spark.table("surldedup").collect().map(_.getLong(0)).toSet
    q.stop()
    assert(got == Set(1L, 2L, 5L, 6L))
    assert(out.schema.fieldNames.toSeq == Seq("rec_id", "url"))
  }

  test("streaming media dedup: exact byte + perceptual aHash first-wins, undecodable bypass") {
    implicit val sqlCtx = spark.sqlContext
    // fixtures: A and A2 are byte-DIFFERENT encodings of the SAME pixels
    // (filter 0 vs filter 2) — exact dedup keeps both, perceptual drops A2;
    // B is a different image; the junk rows are byte-identical
    // undecodables: the EXACT stage rightly dedups them (byte equality is
    // byte equality), the PERCEPTUAL stage bypasses them statelessly
    // (NULL aHash — never one shared state bucket)
    val rnd = new scala.util.Random(21)
    val pxA = Array.fill(9 * 6 * 3)(rnd.nextInt(256))
    val pxB = Array.fill(9 * 6 * 3)(rnd.nextInt(256))
    val imgA = PngTestImages.makePng(9, 6, 3, pxA, _ => 0)
    val imgA2 = PngTestImages.makePng(9, 6, 3, pxA, _ => 2)
    val imgB = PngTestImages.makePng(9, 6, 3, pxB, _ => 0)
    assert(!java.util.Arrays.equals(imgA, imgA2)) // different bytes, same pixels
    val payloads = Map(1L -> imgA, 2L -> imgA2, 3L -> imgA, 4L -> imgB,
      5L -> "junk".getBytes, 6L -> "junk".getBytes)
    val lookup = udf((id: Long) => payloads(id))
    def run(mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
        name: String): Set[Long] = {
      val input = MemoryStream[Long]
      val sdf = input.toDF().toDF("media_id")
        .withColumn("payload", lookup(col("media_id")))
      val out = mk(sdf)
      // schema preserved, no helper columns leak
      assert(out.schema.fieldNames.toSeq == Seq("media_id", "payload"))
      val q = out.writeStream.outputMode("append").format("memory")
        .queryName(name).start()
      input.addData(1L, 2L, 3L)
      q.processAllAvailable()
      input.addData(4L, 5L, 6L)
      q.processAllAvailable()
      val got = spark.table(name).collect().map(_.getLong(0)).toSet
      q.stop()
      got
    }
    // exact: 3 (byte-dup of 1) and 6 (byte-dup of 5) dropped; 2 kept
    assert(run(graft.streaming.StreamingMediaDedup.dropDuplicateImages(_, "payload"),
      "smediaexact") == Set(1L, 2L, 4L, 5L))
    // perceptual: 2 AND 3 dropped (same pixels ⇒ same aHash)
    assert(run(graft.streaming.StreamingMediaDedup.dropPerceptualDuplicateImages(_, "payload"),
      "smediaphash") == Set(1L, 4L, 5L, 6L))
  }

  test("streaming WebP admission parity: VP8L and lossy VP8 ride the same state, stream ≡ batch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.multimodal.{Vp8Fixtures, WebpFixtures}
    // one pixel content, three codecs: PNG, lossless WebP, lossy VP8 (the
    // DC-only fixture construction reconstructs exactly, so all three
    // decode to identical pixels ⇒ identical aHash); plus a distinct VP8
    // and junk. Pins that the codec DISPATCH — not per-codec plumbing —
    // is what streaming rides: WebP needed zero streaming code.
    val vals = Array(40, 220, 90, 160)
    val px = Array.tabulate(32 * 32)(i => vals(((i / 32) / 16) * 2 + (i % 32) / 16))
    val png = PngTestImages.makePng(32, 32, 1, px, _ => 0)
    val webpL = WebpFixtures.encodeGray(px, 32, 32,
      subtractGreen = true, predictorMode = -1, cacheBits = 0, lz77Rows = false)
    val vp8 = Vp8Fixtures.encodeGrayMosaic(vals, 2, 2)
    val vp8Other = Vp8Fixtures.encodeGrayMosaic(Array(10, 140, 250, 65), 2, 2)
    val junk = "RIFFxxxxWEBPnope".getBytes
    val payloads = Map(1L -> png, 2L -> webpL, 3L -> vp8, 4L -> vp8Other, 5L -> junk)
    val lookup = udf((id: Long) => payloads(id))
    val input = MemoryStream[Long]
    val sdf = input.toDF().toDF("media_id")
      .withColumn("payload", lookup(col("media_id")))
    val out = graft.streaming.StreamingMediaDedup
      .dropPerceptualDuplicateImages(sdf, "payload")
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("swebp").start()
    input.addData(1L, 2L, 3L)
    q.processAllAvailable()
    input.addData(4L, 5L)
    q.processAllAvailable()
    val streamed = spark.table("swebp").collect().map(_.getLong(0)).toSet
    q.stop()
    // 2 and 3 are cross-codec perceptual dups of 1; junk bypasses
    assert(streamed == Set(1L, 4L, 5L))
    // batch parity: the batch ladder makes the same keep decisions on the
    // decodable rows (junk is `undecodable` there — its own status, not a
    // keeper — while the stateless stream gate just passes it through)
    val batch = graft.ops.MediaDedup.dropDuplicateImages(
      spark.createDataFrame(payloads.toSeq.map(p => (p._1, p._2)))
        .toDF("media_id", "payload"),
      "payload", "media_id")
      .collect().map(_.getLong(0)).toSet
    assert(batch.intersect(Set(1L, 2L, 3L, 4L)) == streamed.intersect(Set(1L, 2L, 3L, 4L)))
  }

  test("streaming media quality admission: stream ≡ batch, stateless, gates before dedup state") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{StreamingMediaDedup, StreamingMediaSelection}
    import graft.ops.MediaPipeline.ImagePolicy
    import graft.multimodal.JpegFixtures
    import graft.PngTestImages.makePng
    // both codecs and every gate: a good PNG, its byte copy, a
    // byte-different JPEG re-encode of the SAME pixels, a tiny reject, a
    // flat (zero dyn-range) reject, undecodable junk
    val vals = Array(40, 220, 90, 160, 70, 200)
    val pixels = Array.tabulate(24 * 16)(i => vals(((i / 24) / 8) * 3 + (i % 24) / 8))
    val png = makePng(24, 16, 1, pixels, _ => 0)
    val jpeg = JpegFixtures.encodeGrayMosaic(vals, 3, 2)
    val tiny = makePng(2, 2, 1, Array(0, 255, 60, 200), _ => 0)
    val flat = makePng(10, 10, 1, Array.fill(100)(128), _ => 0)
    val junk = "not an image".getBytes
    val rows: Seq[(Long, Array[Byte])] = Seq(
      1L -> png, 2L -> png.clone, 3L -> jpeg, 4L -> tiny, 5L -> flat, 6L -> junk)
    val policy = ImagePolicy(minDim = 5L, maxAspect = 2.0, minDynRange = 8L,
      lumaBounds = (10.0, 250.0))
    val batchAdmitted = StreamingMediaSelection.imageQualityAdmission(
      rows.toDF("media_id", "payload"), "payload", policy)
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(batchAdmitted == Set(1L, 2L, 3L),
      s"gate fixture must admit exactly the decodable quality trio: $batchAdmitted")
    // stream ≡ batch across triggers, with ZERO state operators
    val in1 = MemoryStream[(Long, Array[Byte])]
    val gated = StreamingMediaSelection.imageQualityAdmission(
      in1.toDF().toDF("media_id", "payload"), "payload", policy)
    assert(gated.isStreaming)
    val q1 = gated.writeStream.outputMode("append").format("memory")
      .queryName("madmit").start()
    rows.grouped(3).foreach { chunk => in1.addData(chunk: _*); q1.processAllAvailable() }
    val got = spark.table("madmit").select("media_id").collect()
      .map(_.getLong(0)).toSet
    assert(got == batchAdmitted, s"stream == batch admission: $got")
    assert(q1.lastProgress.stateOperators.isEmpty,
      "quality admission must not create a state store")
    q1.stop()
    // composed ingest: gates FIRST (junk never reaches a state store),
    // then exact byte dedup, then the codec-dispatching perceptual tier —
    // the byte copy drops exact, the JPEG re-encode drops perceptual
    val in2 = MemoryStream[(Long, Array[Byte])]
    val chain = StreamingMediaDedup.dropPerceptualDuplicateImages(
      StreamingMediaDedup.dropDuplicateImages(
        StreamingMediaSelection.imageQualityAdmission(
          in2.toDF().toDF("media_id", "payload"), "payload", policy),
        "payload"),
      "payload")
    val q2 = chain.writeStream.outputMode("append").format("memory")
      .queryName("mchain").start()
    in2.addData(1L -> png, 4L -> tiny)
    q2.processAllAvailable()
    in2.addData(2L -> png.clone, 3L -> jpeg, 5L -> flat, 6L -> junk)
    q2.processAllAvailable()
    val survivors = spark.table("mchain").select("media_id").collect()
      .map(_.getLong(0)).toSet
    q2.stop()
    assert(survivors == Set(1L),
      s"copy drops exact, re-encode drops perceptual, junk drops at the gate: $survivors")
  }

  test("streaming compressed-audio admission: stream ≡ batch, stateless, junk drops at the gate") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.StreamingMediaSelection
    import graft.ops.MediaQuality.CompressedAudioPolicy
    import spark.implicits._
    // real MP3/FLAC/Ogg payloads from the doc-arithmetic builder (every
    // container class), plus junk that parses as none of them
    val docs = (0L until 30L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val media = graft.multimodal.Multimodal.compressedAudioFromDocuments(docs)
      .select("media_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toSeq
    val rows = media :+ (999L -> "junk, not audio".getBytes("US-ASCII"))
    val policy = CompressedAudioPolicy(minSampleRate = 16000L, maxChannels = 1L,
      minDurationMs = 100L, maxDurationMs = 10000L,
      minBitrateKbps = 48L, allowVbr = false)
    val batch = StreamingMediaSelection.compressedAudioQualityAdmission(
      rows.toDF("media_id", "payload"), "payload", policy)
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(batch.nonEmpty && batch.size < media.size && !batch.contains(999L),
      s"gates must split the fixture and drop junk: $batch")
    val in = MemoryStream[(Long, Array[Byte])]
    val gated = StreamingMediaSelection.compressedAudioQualityAdmission(
      in.toDF().toDF("media_id", "payload"), "payload", policy)
    assert(gated.isStreaming)
    val q = gated.writeStream.outputMode("append").format("memory")
      .queryName("caadmit").start()
    rows.grouped(7).foreach { chunk => in.addData(chunk: _*); q.processAllAvailable() }
    val got = spark.table("caadmit").select("media_id").collect()
      .map(_.getLong(0)).toSet
    assert(got == batch, s"stream == batch admission: $got vs $batch")
    assert(q.lastProgress.stateOperators.isEmpty,
      "meta-level admission must not create a state store")
    q.stop()
  }

  test("full ingest chain: LM admission → URL dedup → text dedup in ONE streaming query") {
    import graft.ops.TextAnalysis
    implicit val sqlCtx = spark.sqlContext
    // reference LM: the clean phrasebook; junk scores at the OOV ceiling
    val ref = Seq("the cat sat on the mat today", "the dog sat on the mat today",
      "a cat ran to the mat").zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val kernel = TextAnalysis.lmKernel(
      TextAnalysis.fitStupidBackoffLm(ref.toDF("doc_id", "text"), "text"))
    val input = MemoryStream[(Long, String, String)]
    val sdf = input.toDF().toDF("rec_id", "url", "text")
    val chain = graft.streaming.StreamingDedup.dropDuplicateTexts(
      graft.streaming.StreamingDedup.dropDuplicateUrls(
        graft.streaming.StreamingSelection.perplexityAdmission(
          sdf, kernel, "text", maxPpl = 50.0),
        "url"),
      "text")
    val q = chain.writeStream.outputMode("append").format("memory")
      .queryName("singest").start()
    input.addData(
      (1L, "http://a.com/x", "the cat sat on the mat"),   // admitted
      (2L, "HTTP://A.com:80/x?utm_source=1", "the dog sat on the mat"), // URL dup of 1 → dropped
      (3L, "http://a.com/y", "zz qq ww rr tt"))            // junk → LM-rejected
    q.processAllAvailable()
    input.addData(
      (4L, "http://b.com/x", "the cat sat on the mat"),   // text dup of 1 → dropped
      (5L, "http://c.com/x", "a cat ran to the mat"))      // admitted
    q.processAllAvailable()
    val got = spark.table("singest").collect().map(_.getLong(0)).toSet
    q.stop()
    assert(got == Set(1L, 5L))
    // exactly the two dedup state stores — the LM gate added none
    assert(q.lastProgress.stateOperators.length == 2)
  }

  test("streaming packing carries the token offset across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingPacking
    val input = MemoryStream[(Long, Long)]
    val sdf = input.toDF().toDF("doc_id", "t")
    val out = StreamingPacking.packStream(sdf, "doc_id", "t", capacity = 10L, nStreams = 1)
    val q = out.toDF().writeStream.outputMode("append")
      .format("memory").queryName("spack").start()
    input.addData((1L, 4L), (2L, 4L), (3L, 4L)) // offsets 0,4,8 -> packs 0,0,0
    q.processAllAvailable()
    input.addData((4L, 4L), (5L, 9L)) // offsets 12,16 -> packs 1,1 (state carried)
    q.processAllAvailable()
    val got = spark.table("spack").orderBy("doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pack")).toSeq
    q.stop()
    assert(got == Seq(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 1L))
    // id-order delivery matches the batch operator's assignment exactly
    val batch = graft.ops.Packing.packSequences(
      Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 4L), (5L, 9L)).toDF("doc_id", "t"),
      "doc_id", col("t"), 10L, 1)
      .orderBy("doc_id").collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pack")).toSeq
    assert(batch == got)
  }

  test("streaming near-dup: batch step dedups within and across micro-batches") {
    import graft.streaming.StreamingDedup
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("band", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("h", org.apache.spark.sql.types.LongType))))
    // batch 1: docs 1 and 2 are identical (every band collides), 3 distinct
    val b1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different content with other words entirely")).toDF("doc_id", "text")
    val (k1, seen1) = StreamingDedup.nearDupBatchStep(
      b1, empty, "text", "doc_id", shingleSize = 1, numHashes = 32, bandRows = 8)
    assert(k1.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    // batch 2: doc 4 copies doc 1 (cross-batch dup), doc 5 is fresh
    val b2 = Seq(
      (4L, "the quick brown fox jumps over the lazy dog"),
      (5L, "yet another unrelated document about streams and state")).toDF("doc_id", "text")
    val (k2, seen2) = StreamingDedup.nearDupBatchStep(
      b2, seen1, "text", "doc_id", shingleSize = 1, numHashes = 32, bandRows = 8)
    assert(k2.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(5L))
    assert(seen2.count() > seen1.count()) // batch-2 bands registered
  }

  test("streaming near-dup state scales with admitted docs, not arrivals") {
    // VERDICT r8 #8: pin the O(1)-state claim — the seen-band state is
    // DISTINCT (band, h) keys, so replayed/duplicate arrivals must not grow
    // it, and its size must equal the band table of the distinct corpus
    // (bands × admitted docs, modulo hash collisions), never × arrivals.
    import graft.streaming.StreamingDedup
    import graft.ops.Dedup
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("band", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("h", org.apache.spark.sql.types.LongType))))
    // fully DISJOINT token sets so nothing near-dups within the batch
    // (unigram shingles: shared filler words would push Jaccard past the
    // band threshold and drop legitimate docs)
    val texts = (0 until 20).map(i =>
      s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i eta$i theta$i")
    val b1 = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val (k1, s1) = StreamingDedup.nearDupBatchStep(
      b1, empty, "text", "doc_id", shingleSize = 1, numHashes = 32, bandRows = 8)
    assert(k1.count() == 20) // all distinct → all admitted
    val s1n = s1.count()
    // state == the distinct band keys of the admitted corpus, exactly
    val expected = Dedup.bandTable(b1, "text", "doc_id", 1, 32, 8)
      .select("band", "h").distinct().count()
    assert(s1n == expected, s"state $s1n != band table $expected")
    // 32 hashes / 8 rows = 4 bands per doc; ≤ 4 × docs, and ≈ equality
    // for distinct texts (collisions only)
    assert(s1n <= 4L * 20)
    // batches 2..4: the SAME texts re-arrive under fresh ids — nothing is
    // admitted and the state must not grow by a single row
    var seen = s1
    for (round <- 1 to 3) {
      val rb = texts.zipWithIndex
        .map { case (t, i) => (1000L * round + i, t) }.toDF("doc_id", "text")
      val (k, s) = StreamingDedup.nearDupBatchStep(
        rb, seen, "text", "doc_id", shingleSize = 1, numHashes = 32, bandRows = 8)
      assert(k.count() == 0, s"round $round admitted a duplicate")
      val n = s.count()
      assert(n == s1n, s"round $round state grew: $n != $s1n (O(arrivals), not O(admitted))")
      seen = s
    }
    // a batch with 2 genuinely new docs grows the state by exactly their bands
    val fresh = Seq((9001L, "wholly novel content alpha omega"),
      (9002L, "another brand new item sigma tau")).toDF("doc_id", "text")
    val (kf, sf) = StreamingDedup.nearDupBatchStep(
      fresh, seen, "text", "doc_id", shingleSize = 1, numHashes = 32, bandRows = 8)
    assert(kf.count() == 2)
    val freshBands = Dedup.bandTable(fresh, "text", "doc_id", 1, 32, 8)
      .select("band", "h").distinct()
    val union = Dedup.bandTable(b1, "text", "doc_id", 1, 32, 8)
      .select("band", "h").union(freshBands).distinct().count()
    assert(sf.count() == union)
  }

  test("TTL near-dup: state is window-bounded, expiry re-admits, hot keys stay alive") {
    import graft.streaming.StreamingDedup
    val docA = "alpha beta gamma delta epsilon"
    val docB = "zeta eta theta iota kappa"
    def b(rows: (Long, String)*): org.apache.spark.sql.DataFrame =
      rows.toDF("doc_id", "text")
    var seen = StreamingDedup.emptyTtlState(spark)
    def step(batchId: Long, batch: org.apache.spark.sql.DataFrame): Seq[Long] = {
      val (k, s) = StreamingDedup.nearDupBatchStepTtl(
        batch, seen, batchId, ttlBatches = 2, "text", "doc_id",
        shingleSize = 1, numHashes = 32, bandRows = 8)
      seen = s
      k.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    }
    assert(step(0, b(1L -> docA, 2L -> docB)) == Seq(1L, 2L))
    // batch 1: dup of A arrives → dropped, and the sighting refreshes A's
    // bands (hot-key liveness)
    assert(step(1, b(3L -> docA)) == Seq())
    val afterB1 = seen.count()
    // batch 2: empty batch — docB's bands (last sighted batch 0) are still
    // live (0 > 2-2 false at batch 2? last_batch=0, batchId-ttl=0 → evicted)
    assert(step(2, b()) == Seq())
    // B was last sighted at batch 0 and ttl=2 → evicted at batch 2; A was
    // refreshed at batch 1 → still live. State shrank by B's bands.
    assert(seen.count() < afterB1)
    // batch 3: a copy of B arrives after expiry → RE-ADMITTED (explicit
    // dedup horizon); a copy of A (refreshed at 1, live while
    // last_batch > 3-2=1? 1 > 1 false → expired too) — A expired at 3
    assert(step(3, b(4L -> docB, 5L -> docA)) == Seq(4L, 5L))
    // sustained duplicates never re-enter within the window
    assert(step(4, b(6L -> docB)) == Seq())
  }

  test("TTL near-dup foreachBatch wiring dedups across batches") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingDedup
    val input = MemoryStream[(Long, String)]
    val sdf = input.toDF().toDF("doc_id", "text")
    val admitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val step = StreamingDedup.nearDupForeachBatchTtl(
      "text", "doc_id", ttlBatches = 100,
      shingleSize = 1, numHashes = 32, bandRows = 8) { kept =>
      admitted.synchronized {
        admitted ++= kept.select("doc_id").collect().map(_.getLong(0))
      }
    }
    val q = sdf.writeStream.outputMode("append").foreachBatch(step).start()
    input.addData((1L, "alpha beta gamma delta epsilon"), (2L, "totally distinct text here"))
    q.processAllAvailable()
    input.addData((3L, "alpha beta gamma delta epsilon"), (4L, "brand new words never seen"))
    q.processAllAvailable()
    q.stop()
    assert(admitted.sorted.toSeq == Seq(1L, 2L, 4L))
  }

  test("TTL near-dup restart recovery: initialSeen seeds state with liveness stamps") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.StreamingDedup
    // simulate a restart: the pre-crash admitted window rebuilt via
    // referenceBands + a last_batch stamp at the resume point
    val window = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val seed = StreamingDedup.referenceBands(window, "text", "doc_id",
      shingleSize = 1, numHashes = 32, bandRows = 8)
      .withColumn("last_batch", org.apache.spark.sql.functions.lit(0L))
    val input = MemoryStream[(Long, String)]
    val sdf = input.toDF().toDF("doc_id", "text")
    val admitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val step = StreamingDedup.nearDupForeachBatchTtl(
      "text", "doc_id", ttlBatches = 100,
      shingleSize = 1, numHashes = 32, bandRows = 8,
      initialSeen = Some(seed)) { kept =>
      admitted.synchronized {
        admitted ++= kept.select("doc_id").collect().map(_.getLong(0))
      }
    }
    val q = sdf.writeStream.outputMode("append").foreachBatch(step).start()
    input.addData(
      (1L, "alpha beta gamma delta epsilon"), // dup of the recovered window
      (2L, "totally distinct text here"))
    q.processAllAvailable()
    q.stop()
    assert(admitted.sorted.toSeq == Seq(2L))
    // wrong-schema seed fails fast
    val bad = Seq((1, 2L)).toDF("band", "h")
    val e = intercept[IllegalArgumentException](
      StreamingDedup.nearDupForeachBatchTtl("text", "doc_id", 10,
        initialSeen = Some(bad)) { _ => () })
    assert(e.getMessage.contains("last_batch"))
    // right shape but wrong TYPE fails fast too (band STRING used to pass
    // the name-order guard and die later inside the first batch's join)
    val badType = Seq(("x", 2L, 0L)).toDF("band", "h", "last_batch")
    val e2 = intercept[IllegalArgumentException](
      StreamingDedup.nearDupForeachBatchTtl("text", "doc_id", 10,
        initialSeen = Some(badType)) { _ => () })
    assert(e2.getMessage.contains("TTL schema"))
  }

  test("durable TTL state: kill/restart recovers from parquet bit-identically, no sink rescan") {
    import spark.implicits._
    import graft.streaming.StreamingDedup
    val dir = java.nio.file.Files.createTempDirectory("ttlstate").toString
    def mkBatch(rows: (Long, String)*) = rows.toDF("doc_id", "text")
    // ttlBatches=2 so the run CROSSES an eviction boundary: recovery must
    // restore the liveness stamps, not just the keys
    val batches = Seq(
      mkBatch((1L, "alpha beta gamma delta"), (2L, "one two three four")),
      mkBatch((3L, "alpha beta gamma delta")), // dup of 1 -> dropped, refreshes bands
      mkBatch((4L, "unrelated fresh words here")),
      mkBatch((5L, "one two three four")), // text-2 bands last sighted batch 0: evicted -> re-admitted
      mkBatch((6L, "alpha beta gamma delta"))) // text-1 bands last sighted batch 1: evicted -> re-admitted
    def admittedOf(sinkBuf: scala.collection.mutable.ArrayBuffer[Long])(kept: org.apache.spark.sql.DataFrame): Unit =
      sinkBuf ++= kept.select("doc_id").collect().map(_.getLong(0))
    // uninterrupted reference run (no state dir)
    val refBuf = scala.collection.mutable.ArrayBuffer.empty[Long]
    val refStep = StreamingDedup.nearDupForeachBatchTtl(
      "text", "doc_id", ttlBatches = 2, shingleSize = 1)(admittedOf(refBuf))
    batches.zipWithIndex.foreach { case (b, i) => refStep(b, i.toLong) }
    // durable run killed after batch 2: a FRESH closure (new JVM stand-in)
    // resumes at batch 3 from the parquet state only — no initialSeen
    val aBuf = scala.collection.mutable.ArrayBuffer.empty[Long]
    val stepA = StreamingDedup.nearDupForeachBatchTtl(
      "text", "doc_id", ttlBatches = 2, shingleSize = 1,
      stateDir = Some(dir))(admittedOf(aBuf))
    (0 to 2).foreach(i => stepA(batches(i), i.toLong))
    // crash-AFTER-state-write: delta=2 exists on disk; a replay of batch 2
    // by a fresh closure must skip its own delta and admit against the
    // window below it, reproducing the original batch-2 output (doc 4)
    val cBuf = scala.collection.mutable.ArrayBuffer.empty[Long]
    val stepC = StreamingDedup.nearDupForeachBatchTtl(
      "text", "doc_id", ttlBatches = 2, shingleSize = 1,
      stateDir = Some(dir))(admittedOf(cBuf))
    stepC(batches(2), 2L)
    assert(cBuf.sorted.toSeq == Seq(4L), s"replayed batch 2 admitted ${cBuf.sorted}")
    // graceful restart: a fresh closure resumes at batch 3 from parquet only
    val bBuf = scala.collection.mutable.ArrayBuffer.empty[Long]
    val stepB = StreamingDedup.nearDupForeachBatchTtl(
      "text", "doc_id", ttlBatches = 2, shingleSize = 1,
      stateDir = Some(dir))(admittedOf(bBuf))
    (3 to 4).foreach(i => stepB(batches(i), i.toLong))
    assert((aBuf ++ bBuf).sorted.toSeq == refBuf.sorted.toSeq,
      s"restarted run ${(aBuf ++ bBuf).sorted} != uninterrupted ${refBuf.sorted}")
    // pruning bounds the delta log to the TTL horizon (ids > last - ttl)
    val deltas = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("delta=")).map(_.getName).sorted
    assert(deltas.toSeq == Seq("delta=3", "delta=4"),
      s"expected the trailing-window deltas only, got ${deltas.mkString(",")}")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("durable TTL fencing: a takeover fences the old writer out before it can write") {
    import spark.implicits._
    import graft.streaming.StreamingDedup
    val dir = java.nio.file.Files.createTempDirectory("ttlfence").toString
    def mkBatch(rows: (Long, String)*) = rows.toDF("doc_id", "text")
    def sinkInto(buf: scala.collection.mutable.ArrayBuffer[Long])(kept: org.apache.spark.sql.DataFrame): Unit =
      buf ++= kept.select("doc_id").collect().map(_.getLong(0))
    val aBuf = scala.collection.mutable.ArrayBuffer.empty[Long]
    val stepA = StreamingDedup.nearDupForeachBatchTtl(
      "text", "doc_id", ttlBatches = 10, shingleSize = 1,
      stateDir = Some(dir))(sinkInto(aBuf))
    stepA(mkBatch((1L, "alpha beta gamma delta")), 0L)
    stepA(mkBatch((2L, "one two three four")), 1L)
    assert(aBuf.sorted.toSeq == Seq(1L, 2L))
    // a second driver (fresh closure, same stateDir) takes over at batch 2
    val bBuf = scala.collection.mutable.ArrayBuffer.empty[Long]
    val stepB = StreamingDedup.nearDupForeachBatchTtl(
      "text", "doc_id", ttlBatches = 10, shingleSize = 1,
      stateDir = Some(dir))(sinkInto(bBuf))
    stepB(mkBatch((3L, "unrelated fresh words here")), 2L)
    assert(bBuf.sorted.toSeq == Seq(3L))
    // the fenced-out first writer fails fast at its next delta write —
    // BEFORE its sink emits, so nothing interleaves
    val aEmittedBefore = aBuf.size
    val ex = intercept[IllegalStateException] {
      stepA(mkBatch((4L, "would interleave if unfenced")), 3L)
    }
    assert(ex.getMessage.contains("fenced"), ex.getMessage)
    assert(aBuf.size == aEmittedBefore, "fenced writer must not reach its sink")
    // ...and its aborted batch left no delta behind
    assert(!new java.io.File(s"$dir/delta=3").exists(),
      "fenced writer must not write a delta")
    // the new fence holder continues unaffected, including over batch 3
    stepB(mkBatch((5L, "alpha beta gamma delta"), (6L, "more new words appear")), 3L)
    assert(bBuf.sorted.toSeq == Seq(3L, 6L), s"got ${bBuf.sorted}") // 5 = dup of 1 via recovered state
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("durable TTL recovery ignores deltas without a _SUCCESS marker") {
    import spark.implicits._
    import graft.streaming.StreamingDedup
    val dir = java.nio.file.Files.createTempDirectory("ttlstate2").toString
    val b0 = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val b1 = Seq((2L, "totally different words here")).toDF("doc_id", "text")
    val aBuf = scala.collection.mutable.ArrayBuffer.empty[Long]
    val stepA = StreamingDedup.nearDupForeachBatchTtl(
      "text", "doc_id", ttlBatches = 10, shingleSize = 1,
      stateDir = Some(dir)) { kept =>
      aBuf ++= kept.select("doc_id").collect().map(_.getLong(0))
    }
    stepA(b0, 0L); stepA(b1, 1L)
    assert(aBuf.sorted.toSeq == Seq(1L, 2L))
    // corrupt delta=1 (simulated half-written delta): marker gone
    val marker = new java.io.File(s"$dir/delta=1/_SUCCESS")
    assert(marker.exists()); assert(marker.delete())
    // a fresh closure at batch 2 recovers from delta=0 only — a dup of
    // doc 1 is still dropped, while doc 2's sightings lived in the
    // incomplete delta=1, so a dup of doc 2 is re-admitted
    val bBuf = scala.collection.mutable.ArrayBuffer.empty[Long]
    val stepB = StreamingDedup.nearDupForeachBatchTtl(
      "text", "doc_id", ttlBatches = 10, shingleSize = 1,
      stateDir = Some(dir)) { kept =>
      bBuf ++= kept.select("doc_id").collect().map(_.getLong(0))
    }
    stepB(Seq((3L, "alpha beta gamma delta"), (4L, "totally different words here"))
      .toDF("doc_id", "text"), 2L)
    assert(bBuf.sorted.toSeq == Seq(4L),
      s"expected delta=1 skipped (4 re-admitted, 3 dropped), got ${bBuf.sorted}")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("TTL initialSeen accepts any column order (validated by name→type)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.StreamingDedup
    val window = Seq((100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    // same seed as the restart test, columns deliberately scrambled
    val seed = StreamingDedup.referenceBands(window, "text", "doc_id",
      shingleSize = 1, numHashes = 32, bandRows = 8)
      .withColumn("last_batch", org.apache.spark.sql.functions.lit(0L))
      .select("last_batch", "h", "band")
    val input = MemoryStream[(Long, String)]
    val sdf = input.toDF().toDF("doc_id", "text")
    val admitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val step = StreamingDedup.nearDupForeachBatchTtl(
      "text", "doc_id", ttlBatches = 100,
      shingleSize = 1, numHashes = 32, bandRows = 8,
      initialSeen = Some(seed)) { kept =>
      admitted.synchronized {
        admitted ++= kept.select("doc_id").collect().map(_.getLong(0))
      }
    }
    val q = sdf.writeStream.outputMode("append").foreachBatch(step).start()
    input.addData(
      (1L, "alpha beta gamma delta epsilon"), // dup of the recovered window
      (2L, "totally distinct text here"))
    q.processAllAvailable()
    q.stop()
    assert(admitted.sorted.toSeq == Seq(2L))
  }

  test("streaming near-dup over foreachBatch admits stream-order firsts only") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingDedup
    val input = MemoryStream[(Long, String)]
    val sdf = input.toDF().toDF("doc_id", "text")
    val admitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val step = StreamingDedup.nearDupForeachBatch(
      "text", "doc_id", shingleSize = 1, numHashes = 32, bandRows = 8) { kept =>
      admitted.synchronized {
        admitted ++= kept.select("doc_id").collect().map(_.getLong(0))
      }
    }
    val q = sdf.writeStream.outputMode("append").foreachBatch(step).start()
    input.addData((1L, "alpha beta gamma delta epsilon"), (2L, "totally distinct text here"))
    q.processAllAvailable()
    input.addData(
      (3L, "alpha beta gamma delta epsilon"), // near-dup of 1, prior batch
      (4L, "brand new words never seen before"))
    q.processAllAvailable()
    q.stop()
    assert(admitted.sorted.toSeq == Seq(1L, 2L, 4L))
  }

  test("streaming ingest admission drops arrivals the reference corpus already has") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.StreamingDedup
    val reference = Seq((100L, "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val seed = StreamingDedup.referenceBands(reference, "text", "doc_id",
      shingleSize = 1, numHashes = 32, bandRows = 8)
    val input = MemoryStream[(Long, String)]
    val sdf = input.toDF().toDF("doc_id", "text")
    val admitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val step = StreamingDedup.nearDupForeachBatch(
      "text", "doc_id", shingleSize = 1, numHashes = 32, bandRows = 8,
      initialSeen = Some(seed)) { kept =>
      admitted.synchronized {
        admitted ++= kept.select("doc_id").collect().map(_.getLong(0))
      }
    }
    val q = sdf.writeStream.outputMode("append").foreachBatch(step).start()
    input.addData(
      (1L, "epsilon delta gamma beta alpha"), // token-set dup of reference 100
      (2L, "novel content not in the corpus"))
    q.processAllAvailable()
    q.stop()
    assert(admitted.sorted.toSeq == Seq(2L))
  }

  test("foreachBatch replay (same batchId) re-emits the admitted set, not empty") {
    import spark.implicits._
    import graft.streaming.StreamingDedup
    val emitted = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    val step = StreamingDedup.nearDupForeachBatch(
      "text", "doc_id", shingleSize = 1, numHashes = 32, bandRows = 8) { kept =>
      emitted += kept.select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    }
    val b0 = Seq((1L, "alpha beta gamma delta epsilon"),
      (2L, "totally distinct text here")).toDF("doc_id", "text")
    step(b0, 0L)
    // redelivery of batch 0 (engine retry after the state advanced): the
    // band state already contains this batch's bands — without the guard
    // every doc would collide with itself and the re-emit would be empty
    step(b0, 0L)
    assert(emitted.toSeq == Seq(Seq(1L, 2L), Seq(1L, 2L)))
    // the replay must not have double-registered state: a fresh batch with
    // a near-dup of doc 1 still dedups, and a new doc is admitted
    val b1 = Seq((3L, "alpha beta gamma delta epsilon"),
      (4L, "brand new words never seen before")).toDF("doc_id", "text")
    step(b1, 1L)
    assert(emitted.last == Seq(4L))
  }

  test("restart contract: rebuilding state from the sink prevents re-admission") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.StreamingDedup
    // phase 1: stream runs; the sink is the durable output (admitted docs)
    val sink = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    def drain(kept: org.apache.spark.sql.DataFrame): Unit = sink.synchronized {
      sink ++= kept.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1)))
    }
    val in1 = MemoryStream[(Long, String)]
    val step1 = StreamingDedup.nearDupForeachBatch(
      "text", "doc_id", shingleSize = 1, numHashes = 32, bandRows = 8)(drain)
    val q1 = in1.toDF().toDF("doc_id", "text")
      .writeStream.outputMode("append").foreachBatch(step1).start()
    in1.addData((1L, "alpha beta gamma"), (2L, "wholly different text"))
    q1.processAllAvailable()
    in1.addData((3L, "gamma beta alpha"), (4L, "yet more novel content")) // 3 dups 1
    q1.processAllAvailable()
    q1.stop() // driver gone: the in-memory band state dies with it
    assert(sink.map(_._1).sorted.toSeq == Seq(1L, 2L, 4L))
    // phase 2: restart — seed a FRESH step with referenceBands over the
    // sink output (same banding params), per the documented recovery path
    val seed = StreamingDedup.referenceBands(sink.toSeq.toDF("doc_id", "text"),
      "text", "doc_id", shingleSize = 1, numHashes = 32, bandRows = 8)
    val in2 = MemoryStream[(Long, String)]
    val step2 = StreamingDedup.nearDupForeachBatch(
      "text", "doc_id", shingleSize = 1, numHashes = 32, bandRows = 8,
      initialSeen = Some(seed))(drain)
    val q2 = in2.toDF().toDF("doc_id", "text")
      .writeStream.outputMode("append").foreachBatch(step2).start()
    in2.addData(
      (5L, "beta alpha gamma"),      // token-set dup of pre-restart 1
      (6L, "different wholly text"), // token-set dup of pre-restart 2
      (7L, "genuinely new arrival")) // first of its kind
    q2.processAllAvailable()
    in2.addData((8L, "arrival genuinely new")) // dup of post-restart 7
    q2.processAllAvailable()
    q2.stop()
    // no duplicate ever admitted across the restart boundary
    assert(sink.map(_._1).sorted.toSeq == Seq(1L, 2L, 4L, 7L))
  }

  test("streaming dedup with watermark bounds state and still drops in-window copies") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val sdf = input.toDF().toDF("ts", "text")
    val out = graft.streaming.StreamingDedup.dropDuplicateTexts(
      sdf, "text", tsCol = Some("ts"), watermarkDelay = "1 hour")
    val q = out.writeStream.outputMode("append").format("memory").queryName("sdedupwm").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    input.addData(
      (ts("2024-01-01 10:00:00"), "alpha"),
      (ts("2024-01-01 10:10:00"), "alpha"), // in-window duplicate: dropped
      (ts("2024-01-01 10:20:00"), "beta"))
    q.processAllAvailable()
    val got = spark.table("sdedupwm").collect().map(_.getString(1)).sorted.toSeq
    q.stop()
    assert(got == Seq("alpha", "beta"))
  }
}

/** Shared reference PNG encoder for the decoder / perceptual-hash /
  * streaming-media tests: takes the raw pixel
    * array, applies the requested FILTER per scanline (the encoder-side
    * transform, independently implemented from the spec), deflates with
    * the JDK's real Deflater, and wraps in signature/IHDR/IDAT/IEND —
    * optionally splitting the zlib stream across several IDAT chunks. */
private[graft] object PngTestImages {
  def makePng(w: Int, h: Int, ch: Int, pixels: Array[Int],
      filterOf: Int => Int, idatSplit: Int = 1, depth: Int = 8,
      interlaced: Boolean = false): Array[Byte] = {
    require(pixels.length == w * h * ch)
    val colorType = ch match { case 1 => 0; case 3 => 2; case 4 => 6; case c => sys.error(s"ch $c") }
    val bps = depth / 8
    val bpp = ch * bps
    // sub-images: the full frame, or the 7 Adam7 pass selections
    val passes: Seq[(Int, Int, Array[Int])] =
      if (!interlaced) Seq((w, h, pixels))
      else Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)).flatMap { case (xs, ys, dx, dy) =>
        val xi = xs until w by dx
        val yi = ys until h by dy
        if (xi.isEmpty || yi.isEmpty) None
        else Some((xi.size, yi.size,
          (for (y <- yi; x <- xi; c <- 0 until ch)
            yield pixels(y * w * ch + x * ch + c)).toArray))
      }
    // filters operate BYTEWISE at any depth, offset by bpp bytes, each
    // pass filtered against its own scanlines only
    val rawAll = new java.io.ByteArrayOutputStream()
    var rowCounter = 0
    for ((wp, hp, ps) <- passes) {
      val rb = wp * ch * bps
      val plain = new Array[Int](hp * rb)
      for (i <- ps.indices) {
        if (bps == 1) plain(i) = ps(i) & 0xff
        else { plain(2 * i) = (ps(i) >>> 8) & 0xff; plain(2 * i + 1) = ps(i) & 0xff }
      }
      for (r <- 0 until hp) {
        val f = filterOf(rowCounter); rowCounter += 1
        rawAll.write(f)
        for (x <- 0 until rb) {
          val cur = plain(r * rb + x)
          val left = if (x >= bpp) plain(r * rb + x - bpp) else 0
          val up = if (r > 0) plain((r - 1) * rb + x) else 0
          val ul = if (r > 0 && x >= bpp) plain((r - 1) * rb + x - bpp) else 0
          val pred = f match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) >> 1
            case 4 =>
              val p = left + up - ul
              val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
              if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
          }
          rawAll.write((cur - pred) & 0xff)
        }
      }
    }
    val raw = rawAll.toByteArray
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val zbuf = new Array[Byte](raw.length + 64)
    val zlen = deflater.deflate(zbuf); deflater.end()
    val z = zbuf.take(zlen)
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Int): Array[Byte] =
      Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(be32(data.length)); out.write(typ.getBytes("US-ASCII"))
      out.write(data); out.write(Array[Byte](0, 0, 0, 0)) // crc not validated
    }
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    chunk("IHDR", be32(w) ++ be32(h) ++
      Array[Byte](depth.toByte, colorType.toByte, 0, 0, if (interlaced) 1 else 0))
    val per = math.max(1, (z.length + idatSplit - 1) / idatSplit)
    z.grouped(per).foreach(part => chunk("IDAT", part))
    chunk("IEND", Array[Byte]())
    out.toByteArray
  }
}
