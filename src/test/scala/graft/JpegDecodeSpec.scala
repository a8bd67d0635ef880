package graft

import org.apache.spark.sql.functions._

import graft.functions.{ImageGridHash, ImagePixelStats, JpegDecoder, MediaFunctions, PngGridHash}
import graft.multimodal.JpegFixtures
import graft.PngTestImages.makePng

/** The native baseline-JPEG decode path ([[JpegDecoder]]) and the
  * codec-dispatching image expressions built on it. The round-trip
  * convention: [[JpegFixtures]] is a spec-derived ENCODER, JpegDecoder a
  * spec-derived DECODER, and `javax.imageio` the independent third
  * implementation — fixtures must agree bit-for-bit across all three. */
class JpegDecodeSpec extends SparkSpecBase {

  private def imageIoEncode(
      img: java.awt.image.BufferedImage,
      quality: Float,
      progressive: Boolean = false): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    if (progressive)
      params.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val buf = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(buf)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    ios.close(); writer.dispose()
    buf.toByteArray
  }

  test("native decode of the mosaic encoder is bit-exact, with and without restarts") {
    // block values covering DC-delta sign/magnitude extremes
    val vals = Array(0, 255, 128, 65, 66, 1, 254, 2, 199, 31, 100, 101)
    for (ri <- Seq(0, 1, 2, 5)) {
      val payload = JpegFixtures.encodeGrayMosaic(vals, blocksW = 4, blocksH = 3,
        restartInterval = ri)
      val d = JpegDecoder.decode(payload)
      assert(d != null, s"restartInterval=$ri must decode")
      assert(d.w == 32 && d.h == 24 && d.ch == 1)
      for (y <- 0 until 24; x <- 0 until 32) {
        val want = vals((y / 8) * 4 + (x / 8))
        assert((d.samples(y * 32 + x) & 0xff) == want,
          s"ri=$ri pixel ($x,$y): got ${d.samples(y * 32 + x) & 0xff}, want $want")
      }
      // the independent third implementation agrees on the same bytes
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      assert(img != null && img.getWidth == 32 && img.getHeight == 24)
      for (y <- 0 until 24; x <- 0 until 32)
        assert(img.getRaster.getSample(x, y, 0) == (d.samples(y * 32 + x) & 0xff))
    }
  }

  test("progressive mosaic twin: byte-different, pixel-identical, hash-identical") {
    val vals = Array(0, 255, 128, 65, 66, 1, 254, 2, 199, 31, 100, 101)
    val base = JpegFixtures.encodeGrayMosaic(vals, 4, 3)
    val prog = JpegFixtures.encodeGrayMosaicProgressive(vals, 4, 3)
    assert(!java.util.Arrays.equals(base, prog))
    assert(prog.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2), "twin must be SOF2")
    val d = JpegDecoder.decode(prog)
    assert(d != null && d.w == 32 && d.h == 24 && d.ch == 1)
    // uniform DC-only blocks round-trip EXACTLY through the progressive
    // scan script too (successive approximation reassembles the same DC)
    for (y <- 0 until 24; x <- 0 until 32) {
      val want = vals((y / 8) * 4 + (x / 8))
      assert((d.samples(y * 32 + x) & 0xff) == want,
        s"pixel ($x,$y): got ${d.samples(y * 32 + x) & 0xff}, want $want")
    }
    // the independent third implementation agrees on the same bytes
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(prog))
    assert(img != null && img.getWidth == 32 && img.getHeight == 24)
    for (y <- 0 until 24; x <- 0 until 32)
      assert(img.getRaster.getSample(x, y, 0) == (d.samples(y * 32 + x) & 0xff))
    // perceptual hashes are CODING-independent: baseline, progressive,
    // and the PNG of the same pixels all hash identically
    assert(ImageGridHash.aHash(prog) == ImageGridHash.aHash(base))
    assert(ImageGridHash.dHash(prog) == ImageGridHash.dHash(base))
  }

  test("random coefficient blocks: progressive ≡ baseline decode, imageio within rounding") {
    // the two-spelling property: the SAME quantized coefficients encoded
    // sequentially and progressively (spectral bands + successive
    // approximation + EOB runs + refinement correction bits) must decode
    // to IDENTICAL pixels — any encoder/decoder disagreement about the
    // G.1.2 bit discipline breaks equality. imageio independently decodes
    // the progressive bytes to within integer-IDCT rounding.
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 0 until 24) {
      val bw = 1 + rnd.nextInt(4)
      val bh = 1 + rnd.nextInt(3)
      val al = trial % 3 // 0 = spectral-selection-only script
      val splitAt = Seq(2, 5, 20, 35)(trial % 4)
      val blocks = Array.fill(bw * bh) {
        val zz = new Array[Int](64)
        zz(0) = rnd.nextInt(1800) - 900
        // sparse AC: a few low-band, a few high-band, occasional runs>16
        val nAc = rnd.nextInt(10)
        for (_ <- 0 until nAc)
          zz(1 + rnd.nextInt(63)) = rnd.nextInt(511) - 255
        if (rnd.nextBoolean()) zz(40 + rnd.nextInt(23)) = rnd.nextInt(31) - 15
        zz
      }
      val base = JpegFixtures.encodeCoefMosaic(blocks, bw, bh, progressive = false)
      val prog = JpegFixtures.encodeCoefMosaic(blocks, bw, bh, progressive = true,
        al = al, splitAt = splitAt)
      val db = JpegDecoder.decode(base)
      val dp = JpegDecoder.decode(prog)
      assert(db != null && dp != null, s"trial $trial must decode")
      assert(db.w == bw * 8 && db.h == bh * 8 && dp.w == db.w && dp.h == db.h)
      assert(java.util.Arrays.equals(db.samples, dp.samples),
        s"trial $trial (al=$al split=$splitAt): progressive ≠ baseline")
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(prog))
      assert(ref != null, s"trial $trial: imageio must accept the stream")
      var maxDiff = 0
      for (y <- 0 until db.h; x <- 0 until db.w) {
        val diff = math.abs((dp.samples(y * db.w + x) & 0xff) -
          ref.getRaster.getSample(x, y, 0))
        if (diff > maxDiff) maxDiff = diff
      }
      assert(maxDiff <= 2, s"trial $trial: imageio diff $maxDiff")
    }
  }

  test("imageio-encoded grayscale decodes pixel-close to imageio's own decoder") {
    // a real entropy-coded stream (imageio's tables, AC coefficients,
    // non-trivial Huffman) — not our own encoder: smooth gradient so the
    // only cross-decoder difference is IDCT rounding
    val img = new java.awt.image.BufferedImage(33, 25, // non-multiple-of-8 dims
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 25; x <- 0 until 33)
      img.getRaster.setSample(x, y, 0, math.min(255, x * 4 + y * 3))
    val payload = imageIoEncode(img, 0.85f)
    val d = JpegDecoder.decode(payload)
    assert(d != null && d.w == 33 && d.h == 25 && d.ch == 1)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    var maxDiff = 0
    for (y <- 0 until 25; x <- 0 until 33) {
      val diff = math.abs((d.samples(y * 33 + x) & 0xff) - ref.getRaster.getSample(x, y, 0))
      if (diff > maxDiff) maxDiff = diff
    }
    assert(maxDiff <= 2, s"cross-decoder max pixel diff $maxDiff (IDCT rounding only)")
  }

  test("imageio-encoded color (subsampled YCbCr) decodes close to imageio's decoder") {
    val img = new java.awt.image.BufferedImage(20, 18,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 18; x <- 0 until 20)
      img.setRGB(x, y, (math.min(255, 40 + 8 * x) << 16) |
        (math.min(255, 30 + 7 * y) << 8) | math.min(255, 60 + 4 * x + 4 * y))
    val payload = imageIoEncode(img, 0.95f)
    val d = JpegDecoder.decode(payload)
    assert(d != null && d.w == 20 && d.h == 18 && d.ch == 3)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    // chroma upsampling kernels differ (box here vs imageio's smoother);
    // on a smooth gradient the channels must still track closely
    var sumDiff = 0L
    var maxDiff = 0
    var n = 0
    for (y <- 0 until 18; x <- 0 until 20) {
      val rgb = ref.getRGB(x, y)
      val refCh = Array((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
      for (c <- 0 until 3) {
        val diff = math.abs((d.samples((y * 20 + x) * 3 + c) & 0xff) - refCh(c))
        sumDiff += diff
        if (diff > maxDiff) maxDiff = diff
        n += 1
      }
    }
    assert(maxDiff <= 20, s"cross-decoder max channel diff $maxDiff")
    assert(sumDiff.toDouble / n <= 4.0, s"cross-decoder mean diff ${sumDiff.toDouble / n}")
  }

  test("ImagePixelStats dispatches by magic bytes; NULL for everything else") {
    val rnd = new scala.util.Random(2026)
    // PNG route ≡ the PNG-only expression, bit for bit
    val px = Array.fill(11 * 7 * 3)(rnd.nextInt(256))
    val png = makePng(11, 7, 3, px, r => r % 5)
    val viaDispatch = ImagePixelStats.parse(png)
    val viaPng = graft.functions.PngPixelStats.parse(png)
    assert(viaDispatch != null && viaDispatch.toString == viaPng.toString)
    // JPEG route: analytic stats from the mosaic block values
    val vals = Array(17, 230, 99, 60)
    val jpeg = JpegFixtures.encodeGrayMosaic(vals, 2, 2)
    val st = ImagePixelStats.parse(jpeg)
    assert(st != null)
    assert(st.getInt(0) == 16 && st.getInt(1) == 16 && st.getInt(2) == 1 && st.getInt(3) == 8)
    assert(st.getArray(4).toLongArray()(0) == vals.map(_.toLong * 64).sum)
    assert(st.getArray(5).toIntArray()(0) == vals.min)
    assert(st.getArray(6).toIntArray()(0) == vals.max)
    // progressive (SOF2) streams from the INDEPENDENT imageio encoder —
    // libjpeg-style scan script, its own tables — decode through the
    // native path and land in the same signal struct
    val gray = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 16; x <- 0 until 16)
      gray.getRaster.setSample(x, y, 0, 40 + 4 * x + 9 * y)
    val progressive = imageIoEncode(gray, 1.0f, progressive = true)
    assert(progressive.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2), "must be SOF2")
    val pst = ImagePixelStats.parse(progressive)
    assert(pst != null, "progressive must decode natively now")
    assert(pst.getInt(0) == 16 && pst.getInt(1) == 16 && pst.getInt(2) == 1)
    val pd = JpegDecoder.decode(progressive)
    val pref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(progressive))
    for (y <- 0 until 16; x <- 0 until 16) {
      val diff = math.abs((pd.samples(y * 16 + x) & 0xff) - pref.getRaster.getSample(x, y, 0))
      assert(diff <= 2, s"progressive cross-decoder diff $diff at ($x,$y)")
    }
    // NULL contract: truncated entropy data, garbage, forged huge SOF
    // dims (both frame types) — all reject, never fabricate or throw
    val forgedProg = progressive.clone()
    val sof2At = forgedProg.indices.find(i => (forgedProg(i) & 0xff) == 0xff &&
      i + 1 < forgedProg.length && (forgedProg(i + 1) & 0xff) == 0xc2).get
    forgedProg(sof2At + 5) = 0xff.toByte; forgedProg(sof2At + 6) = 0xff.toByte
    forgedProg(sof2At + 7) = 0xff.toByte; forgedProg(sof2At + 8) = 0xff.toByte
    assert(ImagePixelStats.parse(forgedProg) == null, "SOF2 coef guard must fire")
    assert(ImagePixelStats.parse(jpeg.take(jpeg.length - 4)) == null)
    assert(ImagePixelStats.parse("not an image at all".getBytes) == null)
    assert(ImagePixelStats.parse(Array.empty[Byte]) == null)
    val forged = jpeg.clone()
    val sofAt = forged.indices.find(i => (forged(i) & 0xff) == 0xff &&
      i + 1 < forged.length && (forged(i + 1) & 0xff) == 0xc0).get
    forged(sofAt + 5) = 0xff.toByte; forged(sofAt + 6) = 0xff.toByte // h = 65535
    forged(sofAt + 7) = 0xff.toByte; forged(sofAt + 8) = 0xff.toByte // w = 65535
    assert(ImagePixelStats.parse(forged) == null, "plane-bytes guard must fire")
  }

  test("aHash/dHash are encoding-independent across PNG and JPEG of the same pixels") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 4) {
      val bw = 2 + trial % 2; val bh = 1 + trial % 3
      val vals = Array.fill(bw * bh)(rnd.nextInt(256))
      val w = bw * 8; val h = bh * 8
      val pixels = Array.tabulate(w * h)(i => vals(((i / w) / 8) * bw + (i % w) / 8))
      val png = makePng(w, h, 1, pixels, _ => 0)
      val jpeg = JpegFixtures.encodeGrayMosaic(vals, bw, bh)
      assert(ImageGridHash.aHash(jpeg) == PngGridHash.aHash(png), s"aHash trial $trial")
      assert(ImageGridHash.dHash(jpeg) == PngGridHash.dHash(png), s"dHash trial $trial")
    }
    // and through the codegen'd Column path
    val vals = Array(10, 240, 120, 60, 200, 30)
    val pixels = Array.tabulate(24 * 16)(i => vals(((i / 24) / 8) * 3 + (i % 24) / 8))
    val df = spark.createDataFrame(java.util.List.of(
      org.apache.spark.sql.Row(1L, makePng(24, 16, 1, pixels, _ => 2)),
      org.apache.spark.sql.Row(2L, JpegFixtures.encodeGrayMosaic(vals, 3, 2)),
      org.apache.spark.sql.Row(3L, "junk".getBytes)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.BinaryType))))
    val out = df.select(col("id"),
        MediaFunctions.imageAHash64(col("payload")).as("ah"),
        MediaFunctions.imageDHash64(col("payload")).as("dh"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2))))).toMap
    assert(out(1L).isDefined && out(1L) == out(2L),
      "PNG and JPEG encodings of the same pixels must hash identically")
    assert(out(3L).isEmpty)
  }

  test("mixed crawl fixture: planted classes extract, decode, and pair as designed") {
    import graft.multimodal.Multimodal
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .where(col("doc_id") < 140)
    val crawl = Multimodal.warcMixedImageCrawlFromDocuments(docs)
    val media = Multimodal.extractWarcMedia(crawl, "media_id", "payload")
      .select(
        regexp_extract(col("url"), "/media/(\\d+)\\.(png|jpg)$", 1).cast("long").as("media_id"),
        regexp_extract(col("url"), "\\.(png|jpg)$", 1).as("kind"),
        col("content_type"), col("payload"))
    val rows = media.collect().map(r => r.getLong(0) ->
      ((r.getString(1), r.getString(2), r.getAs[Array[Byte]]("payload")))).toMap
    val texts = docs.select("doc_id", "text").collect()
      .filter(!_.isNullAt(1)).map(r => r.getLong(0) -> r.getString(1)).toMap
    // expected media set per the doc_id class rules
    val expected = texts.keySet.flatMap { id =>
      val isJpeg = id % 7 != 0 && id % 3 == 1
      val jconst = isJpeg && id % 33 == 1
      val bright = isJpeg && !jconst && id % 17 == 2
      Set(id * 10) ++
        (if (isJpeg && !jconst && !bright && id % 5 == 0) Set(id * 10 + 1) else Set.empty) ++
        (if (!isJpeg && id % 7 != 0 && id % 5 == 0) Set(id * 10 + 1) else Set.empty) ++
        (if (isJpeg && !jconst && !bright && id % 13 == 3) Set(id * 10 + 2) else Set.empty)
    }
    assert(rows.keySet == expected)
    // content types follow the extension; every payload decodes
    rows.foreach { case (mid, (kind, ctype, payload)) =>
      assert(ctype == (if (kind == "jpg") "image/jpeg" else "image/png"), s"media $mid")
      assert(ImagePixelStats.parse(payload) != null, s"media $mid must decode")
    }
    // JPEG stats are the analytic mosaic values
    val jpegDocs = texts.keys.filter(id => id % 7 != 0 && id % 3 == 1 &&
      id % 33 != 1 && !(id % 17 == 2)).toSeq.sorted
    assert(jpegDocs.nonEmpty)
    jpegDocs.take(8).foreach { id =>
      val tb = texts(id).getBytes("UTF-8")
      val vals = Array.tabulate(64)(i => if (i < tb.length) tb(i) & 0xff else 'A'.toInt)
      val st = ImagePixelStats.parse(rows(id * 10)._3)
      assert(st.getInt(0) == 64 && st.getInt(1) == 64 && st.getInt(2) == 1)
      assert(st.getArray(4).toLongArray()(0) == vals.map(_.toLong * 64).sum, s"doc $id")
    }
    // the planted pairs: variant at Hamming 0 (±1 dent), thumb at Hamming 0
    // (scale-invariant grid comparisons), jconst byte-identical
    jpegDocs.filter(_ % 5 == 0).foreach { id =>
      val h = java.lang.Long.bitCount(
        ImageGridHash.aHash(rows(id * 10)._3) ^ ImageGridHash.aHash(rows(id * 10 + 1)._3))
      assert(h == 0, s"variant of doc $id at hamming $h")
      assert(!java.util.Arrays.equals(rows(id * 10)._3, rows(id * 10 + 1)._3))
    }
    val thumbDocs = jpegDocs.filter(_ % 13 == 3)
    assert(thumbDocs.nonEmpty, "fixture slice must contain a thumb pair")
    thumbDocs.foreach { id =>
      assert(rows(id * 10 + 2)._1 == "png")
      assert(ImageGridHash.aHash(rows(id * 10)._3) ==
        ImageGridHash.aHash(rows(id * 10 + 2)._3), s"thumb of doc $id")
    }
    val jconstDocs = texts.keys.filter(id => id % 7 != 0 && id % 3 == 1 && id % 33 == 1).toSeq
    assert(jconstDocs.size >= 2, "need an exact-dup group")
    val ref = rows(jconstDocs.head * 10)._3
    jconstDocs.tail.foreach(id =>
      assert(java.util.Arrays.equals(rows(id * 10)._3, ref), s"jconst doc $id"))
    // the bright plant: battery rejects on luma AND dyn_range
    val brightDocs = texts.keys.filter(id => id % 7 != 0 && id % 3 == 1 &&
      id % 33 != 1 && id % 17 == 2)
    assert(brightDocs.nonEmpty, "fixture slice must contain a bright reject")
    brightDocs.foreach { id =>
      val st = ImagePixelStats.parse(rows(id * 10)._3)
      assert(st.getArray(5).toIntArray()(0) == 250 && st.getArray(6).toIntArray()(0) == 250)
    }
  }

  test("cross-codec re-encode dedups as near_dup through the image ladder") {
    val vals = Array(16, 235, 80, 170, 40, 210) // 3×2 blocks, distinct profile
    val pixels = Array.tabulate(24 * 16)(i => vals(((i / 24) / 8) * 3 + (i % 24) / 8))
    val farVals = vals.reverse.map(255 - _)
    val farPixels = Array.tabulate(24 * 16)(i => farVals(((i / 24) / 8) * 3 + (i % 24) / 8))
    val png = makePng(24, 16, 1, pixels, _ => 0)
    val jpeg = JpegFixtures.encodeGrayMosaic(vals, 3, 2)
    assert(!java.util.Arrays.equals(png, jpeg), "byte-different by construction")
    // sanity: the planted pair is Hamming 0, the third image far away
    val hPair = java.lang.Long.bitCount(
      ImageGridHash.aHash(png) ^ ImageGridHash.aHash(jpeg))
    val hFar = java.lang.Long.bitCount(
      ImageGridHash.aHash(png) ^ ImageGridHash.aHash(makePng(24, 16, 1, farPixels, _ => 0)))
    assert(hPair == 0 && hFar > 3, s"fixture geometry: pair $hPair, far $hFar")
    val df = spark.createDataFrame(java.util.List.of(
      org.apache.spark.sql.Row(1L, png),
      org.apache.spark.sql.Row(2L, jpeg),
      org.apache.spark.sql.Row(3L, makePng(24, 16, 1, farPixels, _ => 0))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("media_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.BinaryType))))
    val report = graft.ops.MediaDedup.imageDedupReport(df, "payload", "media_id")
      .select("media_id", "status", "keeper").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(report(1L) == (("kept", 1L)))
    assert(report(2L) == (("near_dup", 1L)),
      "the JPEG re-encode must dedup against its PNG original")
    assert(report(3L) == (("kept", 3L)))
  }
}
