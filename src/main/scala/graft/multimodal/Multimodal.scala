package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media item: opaque payload bytes + typed metadata. The schema shape
  * for multimodal columns at scale: `binary` payload, scalar metadata
  * columns (recorded at ingest) the optimizer can prune/push down
  * independently of the blob.
  */
case class MediaItem(
    media_id: Long,
    kind: String, // container format: "png" | "jpeg"
    width: Int, // pixels
    height: Int, // pixels
    payload: Array[Byte])

case class MediaFeatures(
    media_id: Long,
    kind: String,
    n_bytes: Int,
    out_width: Int,
    out_height: Int,
    features: Array[Float])

/** Per-channel pixel statistics of one decoded image — the common result
  * shape of both decode paths (native PNG expression, ImageIO codec). */
case class PixelStats(
    width: Int,
    height: Int,
    channels: Int,
    depth: Int,
    sums: Array[Long],
    mins: Array[Int],
    maxs: Array[Int])

/** One decoded image's stats keyed by media id — `decodePixelStats`
  * output row (only payloads that fully decode emit one). */
case class DecodedPixelStats(
    media_id: Long,
    width: Int,
    height: Int,
    channels: Int,
    depth: Int,
    ch_sum: Array[Long],
    ch_min: Array[Int],
    ch_max: Array[Int])

/** Multimodal-column plumbing: decode / feature-extract / resize /
  * frame-sample over binary payloads.
  *
  * Decode is REAL everywhere: PCM WAV samples
  * ([[graft.functions.PcmStats]]), the full non-palette PNG family —
  * 8/16-bit gray/RGB/RGBA, multi-IDAT, sequential or Adam7 interlaced
  * ([[graft.functions.PngPixelStats]] — JDK Inflater + scanline
  * unfiltering; see [[pngPixelMediaFromDocuments]] for decodable
  * fixtures) — and entropy-coded formats (JPEG baseline + progressive)
  * via the JDK's `javax.imageio` codec inside the per-partition batch
  * ([[imageIoPixelStats]]; see [[jpegMediaFromDocuments]] for fixtures
  * whose pixels an oracle can predict analytically). Payloads no decoder
  * accepts are REJECTED explicitly (empty feature vector / no stats row)
  * — there is no fake fallback. Everything around the decode is the real
  * Spark shape: typed `Dataset` schema, `mapPartitions` batch iteration
  * (one decoder instantiation per partition, the same contract a
  * JNI/codec binding or a vectorized Pandas-UDF batch would use), and
  * metadata-only transforms that never touch the payload (so Parquet
  * column pruning skips the blobs).
  */
object Multimodal {

  /** ImageIO setup for executor use: no AWT display needed, and the
    * default disk-backed stream cache would write temp files per image —
    * memory cache keeps the decode batch filesystem-free. Idempotent. */
  private lazy val imageIoReady: Unit = {
    if (!sys.props.contains("java.awt.headless"))
      sys.props("java.awt.headless") = "true"
    javax.imageio.ImageIO.setUseCache(false)
  }

  /** Strict codec decode → per-channel stats via `javax.imageio` (the
    * JDK's libjpeg-backed reader for JPEG; also accepts its other
    * registered formats). Returns None for anything the codec can't
    * FULLY decode — truncated entropy data, forged headers, or plain
    * garbage — so callers reject rather than fabricate. `ImageIO.read`
    * alone is NOT strict: libjpeg pads a truncated stream with filler
    * blocks and only signals via a read WARNING, so the reader is driven
    * directly with a warning listener and any warning rejects. One pass
    * over the raster rows; no temp files ([[imageIoReady]]). */
  private[graft] def imageIoPixelStats(payload: Array[Byte]): Option[PixelStats] = {
    imageIoReady
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      val img =
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) null
          else {
            val reader = readers.next()
            var warned = false
            reader.addIIOReadWarningListener(
              new javax.imageio.event.IIOReadWarningListener {
                override def warningOccurred(r: javax.imageio.ImageReader,
                    w: String): Unit = { warned = true }
              })
            try {
              reader.setInput(iis, true, true)
              val decoded = reader.read(0)
              if (warned) null else decoded // partial decode = reject
            } finally reader.dispose()
          }
        } finally iis.close() // release the stream cache deterministically
      if (img == null) None
      else {
        val raster = img.getRaster
        val w = raster.getWidth; val h = raster.getHeight
        val ch = raster.getNumBands
        if (w <= 0 || h <= 0 || ch <= 0) None
        else {
          val depth = img.getColorModel.getComponentSize(0)
          val sums = new Array[Long](ch)
          val mins = Array.fill(ch)(Int.MaxValue)
          val maxs = Array.fill(ch)(Int.MinValue)
          val row = new Array[Int](w * ch)
          var y = 0
          while (y < h) {
            raster.getPixels(0, y, w, 1, row)
            var i = 0
            while (i < w * ch) {
              val c = i % ch; val v = row(i)
              sums(c) += v
              if (v < mins(c)) mins(c) = v
              if (v > maxs(c)) maxs(c) = v
              i += 1
            }
            y += 1
          }
          Some(PixelStats(w, h, ch, depth, sums, mins, maxs))
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Big-endian fixed-width bytes of an integral column (builder helper for
    * the synthetic container headers below). */
  private def be(c: Column, nBytes: Int): Column =
    unhex(lpad(hex(c), nBytes * 2, "0"))

  /** Build a demo media table from the documents table. Payloads carry REAL
    * container headers — even doc_ids get a spec-shaped PNG (signature +
    * IHDR with big-endian dims), odd ones a JPEG (SOI + APP0/JFIF + SOF0
    * frame header) — followed by the document text as stand-in pixel data.
    * The width/height/kind metadata columns model what an ingest job records
    * (so metadata-only plans still prune the blob); the dims are genuinely
    * encoded in the payload bytes and [[graft.functions.ImageDims]] parses
    * them back (verified bit-level against a DuckDB blob oracle in q54). */
  def mediaFromDocuments(docs: DataFrame): DataFrame = {
    val w = (col("doc_id") % 640 + 64).cast("int")
    val h = (col("doc_id") % 480 + 48).cast("int")
    val pngHeader = concat(
      lit(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)), // signature
      lit(Array[Byte](0, 0, 0, 13)), // IHDR chunk length
      lit("IHDR".getBytes("US-ASCII")),
      be(w, 4), be(h, 4),
      lit(Array[Byte](8, 2, 0, 0, 0)), // bit depth 8, truecolor, no interlace
      lit(Array[Byte](0, 0, 0, 0))) // CRC placeholder (not validated)
    val jpegHeader = concat(
      lit(Array(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x10).map(_.toByte)), // SOI + APP0, len 16
      lit("JFIF".getBytes("US-ASCII") ++
        Array[Byte](0, 1, 2, 0, 0, 1, 0, 1, 0, 0)), // JFIF\0, v1.2, densities, no thumb
      lit(Array(0xff, 0xc0, 0x00, 0x11, 0x08).map(_.toByte)), // SOF0, len 17, precision 8
      be(h, 2), be(w, 2),
      lit(Array[Byte](3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1))) // 3 components
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 2 === 0, "png").otherwise("jpeg").as("kind"),
      w.as("width"),
      h.as("height"),
      concat(when(col("doc_id") % 2 === 0, pngHeader).otherwise(jpegHeader),
        encode(col("text"), "UTF-8")).as("payload"))
  }

  /** Build a demo media table of fully DECODABLE PNGs from the documents
    * table: real signature/IHDR/IDAT/IEND structure with the pixel data
    * zlib-wrapped in a single STORED (uncompressed, BTYPE=00) deflate
    * block — spec-valid for any inflater, and byte-transparent so the
    * DuckDB oracle can re-derive every pixel from the same text bytes
    * without a decompressor (exactly the q82 WAV pattern, one level up).
    * Pixels are the document text's UTF-8 bytes ('A'-padded to w·h·3),
    * laid out as RGB scanlines with filter type 0; w/h vary per doc_id.
    * [[graft.functions.PngPixelStats]] runs the REAL decode path over
    * these: chunk walk → inflate → unfilter → per-channel stats (q86).
    * CRC/Adler fields are zeroed — neither is validated (raw inflate),
    * matching the [[ImageDims]] contract. */
  def pngPixelMediaFromDocuments(docs: DataFrame): DataFrame =
    pngStoredFixture(docs, col("doc_id") % 6 + 2, col("doc_id") % 4 + 2,
      bytesPerPx = 3, ihdrDepthColorHex = "0802000000") // depth 8, truecolor

  /** 16-bit GRAYSCALE sibling of [[pngPixelMediaFromDocuments]]: same
    * stored-deflate transparency, but one channel of big-endian 16-bit
    * samples (IHDR depth 16, color type 0) — puts the decoder's 16-bit
    * sample path under the byte-level oracle too (q88), not just the
    * ScalaTest Deflater harness. Samples are consecutive text-byte PAIRS
    * ('A'-padded), so the oracle recomputes each value as
    * 256·b[2i] + b[2i+1] from the same hex. */
  def pngPixel16MediaFromDocuments(docs: DataFrame): DataFrame =
    pngStoredFixture(docs, col("doc_id") % 5 + 2, col("doc_id") % 3 + 2,
      bytesPerPx = 2, ihdrDepthColorHex = "1000000000") // depth 16, grayscale

  /** Shared stored-deflate PNG framing for both fixture builders (one
    * body so the chunk layout / LEN·NLEN encoding / IDAT length
    * arithmetic can never diverge between the 8-bit and 16-bit
    * fixtures): `bytesPerPx` pixel bytes per image pixel, filter-0
    * scanlines, single final stored block, zeroed CRC/Adler. */
  private def pngStoredFixture(
      docs: DataFrame,
      wExpr: Column,
      hExpr: Column,
      bytesPerPx: Int,
      ihdrDepthColorHex: String): DataFrame = {
    docs.select(col("doc_id"), col("text"))
      .withColumn("w", wExpr.cast("int"))
      .withColumn("h", hExpr.cast("int"))
      .withColumn("npb", col("w") * col("h") * lit(bytesPerPx)) // pixel bytes
      .withColumn("pxhex",
        expr("substr(concat(hex(encode(text, 'UTF-8')), repeat('41', npb)), 1, 2*npb)"))
      .withColumn("payload_hex",
        pngHexFromPixels(col("w"), col("h"), col("pxhex"), bytesPerPx, ihdrDepthColorHex))
      .select(col("doc_id").as("media_id"), lit("png").as("kind"),
        col("w").as("width"), col("h").as("height"),
        unhex(col("payload_hex")).as("payload"))
  }

  /** The stored-deflate PNG framing of [[pngStoredFixture]] as a pure
    * Column function over (width, height, pixel-hex): signature + IHDR +
    * one final stored deflate block of filter-0 scanlines + IEND, zeroed
    * CRC/Adler. `px` must hold exactly `2·bytesPerPx·w·h` hex chars.
    * Factored out so builders that frame SEVERAL images per row
    * ([[warcImageCrawlFromDocuments]]'s near-duplicate variants) reuse
    * the one framing — the chunk layout / LEN·NLEN encoding / IDAT
    * length arithmetic can never diverge between fixtures. */
  private[graft] def pngHexFromPixels(
      wc: Column,
      hc: Column,
      px: Column,
      bytesPerPx: Int,
      ihdrDepthColorHex: String): Column = {
    val sl = 2 * bytesPerPx // hex chars per pixel
    val rawlen = hc * (lit(1) + wc * lit(bytesPerPx))
    val slhex = array_join(
      transform(sequence(lit(0), hc - lit(1)),
        r => concat(lit("00"), px.substr(r * wc * lit(sl) + lit(1), wc * lit(sl)))),
      "")
    def h2(c: Column) = lpad(hex(c), 2, "0")
    def le16(v: Column) = concat(h2(v % 256), h2(shiftright(v.cast("long"), 8)))
    concat(
      lit("89504E470D0A1A0A"), // signature
      lit("0000000D49484452"), // IHDR length + type
      lpad(hex(wc), 8, "0"), lpad(hex(hc), 8, "0"),
      lit(ihdrDepthColorHex), // bit depth, color type, no interlace
      lit("00000000"), // IHDR crc (not validated)
      lpad(hex(rawlen + 11), 8, "0"), lit("49444154"), // IDAT len + type
      lit("7801"), // zlib header: deflate, no preset dict
      lit("01"), le16(rawlen), le16(lit(65535) - rawlen), // final stored block
      slhex, // raw filter-0 scanlines
      lit("00000000"), // adler32 (ignored by raw inflate)
      lit("00000000"), // IDAT crc
      lit("0000000049454E44AE426082")) // IEND
  }

  /** Little-endian fixed-width bytes of an integral column (RIFF/WAV fields
    * are little-endian, unlike PNG/JPEG's big-endian). */
  private def le(c: Column, nBytes: Int): Column =
    unhex(concat((0 until nBytes).map(i =>
      lpad(hex(shiftright(c, 8 * i).bitwiseAND(lit(255L))), 2, "0")): _*))

  /** Build a demo AUDIO media table from the documents table: payloads
    * carry a real RIFF/WAVE header (`RIFF` size `WAVE`, a spec-shaped
    * `fmt ` chunk with PCM format, channels, sample rate, byte rate, block
    * align, and bit depth — all little-endian — then a `data` chunk) with
    * the document text as stand-in sample data. sample_rate/channels
    * metadata columns model ingest-recorded values; the same numbers are
    * genuinely encoded in the header bytes and
    * [[graft.functions.AudioMeta]] parses them back (byte-level DuckDB
    * oracle in q57). */
  /** Shared RIFF/WAVE framing of the audio fixtures: spec-shaped header
    * + optional junk `LIST` chunk between `fmt ` and `data` (the
    * container-variant plant — byte-different payload, IDENTICAL PCM
    * stream, so the envelope hash is unchanged), then the text bytes as
    * 16-bit sample data. */
  private def wavPayload(withList: Boolean): Column = {
    val sr = lit(8000L) + (col("doc_id") % 8) * lit(4000L)
    val ch = lit(1L) + col("doc_id") % 2
    val dataLen = length(encode(col("text"), "UTF-8")).cast("long")
    val listLen = if (withList) 12L else 0L
    val header = concat(
      lit("RIFF".getBytes("US-ASCII")), le(lit(36L + listLen) + dataLen, 4),
      lit("WAVEfmt ".getBytes("US-ASCII")), le(lit(16L), 4), // fmt chunk, len 16
      le(lit(1L), 2), // PCM
      le(ch, 2), le(sr, 4),
      le(sr * ch * lit(2L), 4), // byte rate (16-bit samples)
      le(ch * lit(2L), 2), // block align
      le(lit(16L), 2), // bits per sample
      if (withList)
        concat(lit("LIST".getBytes("US-ASCII")), le(lit(4L), 4),
          lit("INFO".getBytes("US-ASCII")))
      else lit(Array.emptyByteArray),
      lit("data".getBytes("US-ASCII")), le(dataLen, 4))
    concat(header, encode(col("text"), "UTF-8"))
  }

  def audioFromDocuments(docs: DataFrame): DataFrame = {
    val sr = lit(8000L) + (col("doc_id") % 8) * lit(4000L)
    val ch = lit(1L) + col("doc_id") % 2
    docs.select(
      col("doc_id").as("media_id"),
      lit("wav").as("kind"),
      sr.cast("int").as("sample_rate"),
      ch.cast("int").as("channels"),
      wavPayload(withList = false).as("payload"))
  }

  /** Build a demo VIDEO media table from the documents table: payloads
    * carry a real ISO-BMFF (MP4) box tree — `ftyp` (isom), `moov` holding a
    * spec-shaped `mvhd` (timescale/duration, unity matrix), one video
    * `trak` (`tkhd` with 16.16 fixed-point dims + `mdia/hdlr` type `vide`),
    * for odd doc_ids a second audio `trak` (`soun`), then an `mdat` box
    * with the document text as stand-in sample data. Every variable field
    * (box sizes, timescale, duration, dims, track count) is genuinely
    * encoded big-endian in the payload bytes and
    * [[graft.functions.VideoMeta]] parses them back; the DuckDB oracle
    * (q94) reconstructs the same values — and the first 36 header bytes
    * bit-for-bit — from doc_id arithmetic alone. */
  def videoFromDocuments(docs: DataFrame): DataFrame = {
    def bh(c: Column, nBytes: Int): Column = lpad(hex(c), nBytes * 2, "0")
    val ts = (col("doc_id") % 4 + 1).cast("long") * 600L // ticks per second
    val dur = (col("doc_id") % 9000 + 600).cast("long") // ticks
    val w = (col("doc_id") % 8 * 160 + 320).cast("long")
    val h = (col("doc_id") % 6 * 120 + 240).cast("long")
    val nt = (col("doc_id") % 2 + 1).cast("long") // 1 video (+1 audio) trak
    val matrix = // unity transform: diag(1.0, 1.0, 1.0) in 16.16 / 2.30
      "000100000000000000000000" + "000000000001000000000000" +
        "000000000000000040000000"
    val mvhd = concat(
      lit("0000006C" + "6D766864" + "00000000" + "00000000" + "00000000"),
      bh(ts, 4), bh(dur, 4),
      lit("00010000" + "0100" + "0000" + "0000000000000000" + matrix + "0" * 48),
      bh(nt + 1, 4)) // rate 1.0, volume 1.0, matrix, 24B predefined, next id
    def trakHex(trackId: Long, handlerHex: String, wc: Column, hc: Column,
        volHex: String): Column = concat(
      lit("0000008D" + "7472616B" + // trak(141)
        "0000005C" + "746B6864" + "00000007" + "00000000" + "00000000"), // tkhd v0
      lit(f"$trackId%08X"), lit("00000000"), bh(dur, 4),
      lit("0000000000000000" + "0000" + "0000" + volHex + "0000" + matrix),
      bh(wc, 2), lit("0000"), bh(hc, 2), lit("0000"), // 16.16 fixed dims
      lit("00000029" + "6D646961" + // mdia(41)
        "00000021" + "68646C72" + "00000000" + "00000000" + // hdlr(33)
        handlerHex + "0" * 24 + "00")) // type, 12B reserved, empty name
    val hexAll = concat(
      lit("00000010" + "66747970" + "69736F6D" + "00000200"), // ftyp(16)
      bh(nt * 141 + 116, 4), lit("6D6F6F76"), // moov size = 8+108+141·n
      mvhd,
      trakHex(1, "76696465", w, h, "0000"), // 'vide'
      when(nt === 2, trakHex(2, "736F756E", lit(0L), lit(0L), "0100"))
        .otherwise(lit("")), // 'soun'
      bh(length(encode(col("text"), "UTF-8")).cast("long") + 8, 4),
      lit("6D646174")) // mdat header; text bytes follow
    docs.select(
      col("doc_id").as("media_id"),
      lit("mp4").as("kind"),
      ts.cast("int").as("timescale"),
      w.cast("int").as("width"),
      h.cast("int").as("height"),
      concat(unhex(hexAll), encode(col("text"), "UTF-8")).as("payload"))
  }

  /** Byte values of the video fixture's CONSTANT sample-size table (the
    * byte-dup plant): first 130 bytes of this repeated literal. The
    * oracle replays it as
    * `hex(encode(substr(repeat('GRAFTVIDEOCONSTANTGROUP!', 6), 1, 130)))`. */
  private[graft] val VideoConstSizesHex: String = {
    val s = ("GRAFTVIDEOCONSTANTGROUP!" * 6).take(130)
    s.getBytes("US-ASCII").map(b => f"$b%02X").mkString
  }

  /** VIDEO media table with real SAMPLE TABLES — the
    * [[videoFromDocuments]] box tree extended with a full
    * `mdia/minf/stbl/stsz` chain (130 per-sample sizes = the document's
    * first 130 text bytes, 'A'-padded), so the container fingerprint
    * ([[graft.functions.VideoSampleHash64]]) walks a spec-shaped sample
    * table. Planted dedup classes, all analytic:
    *   - `doc_id % 9 == 0`: the CONSTANT clip — fixed brand/timescale/
    *     duration/dims, [[VideoConstSizesHex]] sizes, fixed mdat — a
    *     byte-identical exact-dup group;
    *   - else `doc_id % 4 == 1`: ALSO a RE-MUX variant `doc_id·10 + 1` —
    *     same sample sizes and mdat, different brand (`mp42`) and
    *     doubled timescale: byte-different container, IDENTICAL
    *     sample-size contour (Hamming 0), the re-host class the
    *     signature exists for.
    * Non-constant payloads are pairwise distinct by construction (the
    * tkhd/mvhd duration embeds `doc_id % 9000 + 600`, injective below
    * 9000 docs), so the oracle's exact stage is the constant group and
    * nothing else. */
  def videoWithSamplesFromDocuments(docs: DataFrame): DataFrame = {
    def bh(c: Column, nBytes: Int): Column = lpad(hex(c), nBytes * 2, "0")
    val isConst = col("doc_id") % 9 === 0
    val matrix =
      "000100000000000000000000" + "000000000001000000000000" +
        "000000000000000040000000"
    def payloadHex(brandHex: Column, ts: Column, dur: Column,
        wc: Column, hc: Column, vhx: Column, mdatHex: Column): Column = {
      val entries = array_join(
        transform(sequence(lit(0), lit(129)),
          i => concat(lit("000000"), vhx.substr(i * 2 + 1, lit(2)))), "")
      val stsz = concat(
        lit("0000021C" + "7374737A" + "00000000" + "00000000" + "00000082"),
        entries) // version/flags, sample_size=0, count=130
      val mdia = concat(
        lit("00000255" + "6D646961" +
          "00000021" + "68646C72" + "00000000" + "00000000" +
          "76696465" + "0" * 24 + "00"), // hdlr 'vide'
        lit("0000022C" + "6D696E66" + "00000224" + "7374626C"), stsz)
      val tkhd = concat(
        lit("0000005C" + "746B6864" + "00000007" + "00000000" + "00000000" +
          "00000001" + "00000000"), bh(dur, 4),
        lit("0000000000000000" + "0000" + "0000" + "0000" + "0000" + matrix),
        bh(wc, 2), lit("0000"), bh(hc, 2), lit("0000"))
      val mvhd = concat(
        lit("0000006C" + "6D766864" + "00000000" + "00000000" + "00000000"),
        bh(ts, 4), bh(dur, 4),
        lit("00010000" + "0100" + "0000" + "0000000000000000" + matrix + "0" * 48),
        lit("00000002"))
      concat(
        lit("00000010" + "66747970"), brandHex, lit("00000200"),
        lit("0000032D" + "6D6F6F76"), mvhd,
        lit("000002B9" + "7472616B"), tkhd, mdia,
        bh((length(mdatHex) / 2 + 8).cast("long"), 4), lit("6D646174"), mdatHex)
    }
    val base = docs.where(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
      .withColumn("vhx", when(isConst, lit(VideoConstSizesHex))
        .otherwise(expr(
          "substr(concat(hex(encode(text, 'UTF-8')), repeat('41', 130)), 1, 260)")))
      .withColumn("brand", when(isConst, lit("69736F6D")).otherwise(lit("69736F6D")))
      .withColumn("ts", when(isConst, lit(600L))
        .otherwise((col("doc_id") % 4 + 1).cast("long") * 600L))
      .withColumn("dur", when(isConst, lit(1200L))
        .otherwise((col("doc_id") % 9000 + 600).cast("long")))
      .withColumn("w", when(isConst, lit(320L))
        .otherwise((col("doc_id") % 8 * 160 + 320).cast("long")))
      .withColumn("h", when(isConst, lit(240L))
        .otherwise((col("doc_id") % 6 * 120 + 240).cast("long")))
      .withColumn("mdathex", when(isConst, lit("4D444154"))
        .otherwise(hex(encode(col("text"), "UTF-8"))))
    val main = base.select(
      (col("doc_id") * 10).as("media_id"),
      unhex(payloadHex(col("brand"), col("ts"), col("dur"),
        col("w"), col("h"), col("vhx"), col("mdathex"))).as("payload"))
    val variant = base.where(!isConst && col("doc_id") % 4 === 1).select(
      (col("doc_id") * 10 + 1).as("media_id"),
      unhex(payloadHex(lit("6D703432"), col("ts") * 2, col("dur"),
        col("w"), col("h"), col("vhx"), col("mdathex"))).as("payload"))
    main.unionByName(variant)
  }

  /** A TYPED three-modality media table `(media_id, kind, payload)` with
    * planted dedup classes in every modality — the input shape of
    * [[graft.ops.MediaPipeline.curateMedia]]. `media_id = doc_id·100 +
    * tag`, tag = modality (1 image / 2 audio / 3 video) + 10·sub
    * (1 main / 2 byte-twin / 3 variant):
    *   - image (stored-deflate PNG, `doc_id%6+2 × doc_id%4+2` RGB from
    *     text bytes): main `…11` always; byte-identical twin `…21` for
    *     `doc_id % 6 == 0`; first-pixel-black dent variant `…31` for
    *     `doc_id % 7 == 1` (the q135 near-dup class).
    *   - audio (16-bit PCM WAV, text bytes as samples): main `…12`;
    *     byte twin `…22` (`% 6`); junk-LIST-chunk container remaster
    *     `…32` (`% 7 == 1`) — byte-different, envelope-hash-identical.
    *   - video ([[videoWithSamplesFromDocuments]]'s payloads remapped):
    *     main `…13` (the `% 9` constant-clip group is cross-doc
    *     byte-identical); re-mux variant `…23` (`% 4 == 1`, non-const).
    * Every byte derives from `(doc_id, text)` (the JPEG-free slice of
    * the media surface), so one DuckDB oracle replays all three
    * modality ladders. */
  def multimodalMediaFromDocuments(docs: DataFrame): DataFrame = {
    val base = docs.where(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
      .withColumn("iw", (col("doc_id") % 6 + 2).cast("int"))
      .withColumn("ih", (col("doc_id") % 4 + 2).cast("int"))
      .withColumn("inpb", col("iw") * col("ih") * lit(3))
      .withColumn("ipx", expr(
        "substr(concat(hex(encode(text, 'UTF-8')), repeat('41', inpb)), 1, 2*inpb)"))
    def png(px: Column): Column =
      unhex(pngHexFromPixels(col("iw"), col("ih"), px, 3, "0802000000"))
    def out(tagged: Column, kind: String, payload: Column)(rows: DataFrame): DataFrame =
      rows.select(tagged.as("media_id"), lit(kind).as("kind"), payload.as("payload"))
    val d = col("doc_id")
    val imgMain = out(d * 100 + 11, "image", png(col("ipx")))(base)
    val imgTwin = out(d * 100 + 21, "image", png(col("ipx")))(base.where(d % 6 === 0))
    val imgDent = out(d * 100 + 31, "image",
      png(concat(lit("000000"), expr("substr(ipx, 7)"))))(base.where(d % 7 === 1))
    val vids = videoWithSamplesFromDocuments(docs).select(
      (expr("media_id div 10") * 100 + 13 + (col("media_id") % 10) * 10).as("media_id"),
      lit("video").as("kind"), col("payload"))
    imgMain.unionByName(imgTwin).unionByName(imgDent)
      .unionByName(audioDedupMediaFromDocuments(docs))
      .unionByName(vids)
  }

  /** The AUDIO slice of [[multimodalMediaFromDocuments]] as its own
    * builder (same ids, same planted classes) — the single-modality
    * input for audio-capstone specs and queries, with a plan small
    * enough to run the ladder UNFROZEN (the frozen≡unfrozen pin needs
    * one honest unfrozen execution). */
  def audioDedupMediaFromDocuments(docs: DataFrame): DataFrame = {
    val base = docs.where(col("text").isNotNull).select(col("doc_id"), col("text"))
    val d = col("doc_id")
    def out(tagged: Column, payload: Column)(rows: DataFrame): DataFrame =
      rows.select(tagged.as("media_id"), lit("audio").as("kind"),
        payload.as("payload"))
    out(d * 100 + 12, wavPayload(withList = false))(base)
      .unionByName(out(d * 100 + 22, wavPayload(withList = false))(base.where(d % 6 === 0)))
      .unionByName(out(d * 100 + 32, wavPayload(withList = true))(base.where(d % 7 === 1)))
  }

  /** Build a COMPRESSED-audio media table from the documents table: each
    * doc becomes (doc_id % 3) an MP3 (a real MPEG Layer III frame chain —
    * valid 4-byte headers, spec frame lengths, optional ID3v2 tag,
    * optional 2-bitrate VBR alternation), a FLAC (`fLaC` + a bit-exact
    * STREAMINFO block, optionally followed by a PADDING block), or an Ogg
    * stream (BOS page carrying a real OpusHead / Vorbis id header packet,
    * EOS page carrying the final granule). Every parsed field — versions,
    * bitrate/rate indices, frame counts, total samples, granules, tag
    * sizes — derives from doc_id arithmetic ONLY and is genuinely encoded
    * in the payload bytes per the relevant public spec;
    * [[graft.functions.AudioContainerMeta]] parses them back and the
    * DuckDB oracle (q155) reconstructs the same values — and the first 16
    * header bytes bit-for-bit — from the same arithmetic. Frame payload
    * bytes are 0xAA fill (this fixture tests container parsing, not audio
    * codecs — the [[videoFromDocuments]] mdat convention). */
  def compressedAudioFromDocuments(docs: DataFrame): DataFrame = {
    val d = col("doc_id")
    val v1L3 = Seq(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    val v2L3 = Seq(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
    def brLookup(idx: Column, tab: Seq[Int]): Column =
      tab.zipWithIndex.tail.foldLeft(lit(0L)) { case (acc, (k, i)) =>
        when(idx === i, k.toLong).otherwise(acc)
      }
    def pickSr(rates: Seq[Long], idx: Column): Column =
      when(idx === 0, rates(0)).when(idx === 1, rates(1)).otherwise(rates(2))
    val withCols = docs.select(col("doc_id"))
      // MP3 knobs (doc_id % 3 == 0)
      .withColumn("m_v1", d % 2 === 0)
      .withColumn("m_br", d % 14 + 1)
      .withColumn("m_br2", (d % 14 + 1) % 14 + 1)
      .withColumn("m_sri", expr("(doc_id div 3) % 3"))
      .withColumn("m_sr", when(col("m_v1"), pickSr(Seq(44100L, 48000L, 32000L), col("m_sri")))
        .otherwise(pickSr(Seq(22050L, 24000L, 16000L), col("m_sri"))))
      .withColumn("m_ka", when(col("m_v1"), brLookup(col("m_br"), v1L3))
        .otherwise(brLookup(col("m_br"), v2L3)))
      .withColumn("m_kb", when(col("m_v1"), brLookup(col("m_br2"), v1L3))
        .otherwise(brLookup(col("m_br2"), v2L3)))
      .withColumn("m_vbr", d % 7 === 3)
      .withColumn("m_spf", when(col("m_v1"), 1152L).otherwise(576L))
      .withColumn("m_n", d % 5 + 3)
      .withColumn("m_mono", d % 4 === 0)
      .withColumn("m_id3", when(d % 4 === 1, d % 96 + 8).otherwise(0L))
      // FLAC knobs (doc_id % 3 == 1)
      .withColumn("f_sr", (d % 8 + 1) * 6000L)
      .withColumn("f_ch", d % 2 + 1)
      .withColumn("f_bps", expr("((doc_id div 3) % 3 + 1) * 8"))
      .withColumn("f_total", d % 100000 + 1000L)
      .withColumn("f_pad", when(d % 4 === 2, d % 30 + 4).otherwise(0L))
      // Ogg knobs (doc_id % 3 == 2): even doc -> Opus, odd -> Vorbis
      .withColumn("o_opus", d % 2 === 0)
      .withColumn("o_ch", when(col("o_opus"), expr("(doc_id % 4) div 2 + 1"))
        .otherwise(expr("((doc_id % 4) + 1) div 2")))
      .withColumn("o_sr", when(col("o_opus"), 48000L)
        .when(d % 4 === 1, 44100L).otherwise(48000L))
      .withColumn("o_nom", (d % 10 + 1) * 16000L)
      .withColumn("o_samples", when(col("o_opus"), d % 50000 + 4800L)
        .otherwise(d % 50000 + 4410L))
      .withColumn("o_serial", d % 100000)
    // MPEG frame lengths: Layer III counts spf/8 slots of kbps*1000/sr
    // bytes (padding 0 in this fixture); all operands are small positive
    // longs so double floor-division is exact
    val framed = withCols
      .withColumn("m_la", floor(col("m_spf") / 8 * 1000 * col("m_ka") / col("m_sr")).cast("long"))
      .withColumn("m_lb", floor(col("m_spf") / 8 * 1000 * col("m_kb") / col("m_sr")).cast("long"))
      // 4-byte headers: FF, sync/ver/layer/prot, br<<4|sr<<2, mode
      .withColumn("m_ha", concat(lit("FF"), when(col("m_v1"), "FB").otherwise("F3"),
        lpad(hex(col("m_br") * 16 + col("m_sri") * 4), 2, "0"),
        when(col("m_mono"), "C0").otherwise("00")))
      .withColumn("m_hb", concat(lit("FF"), when(col("m_v1"), "FB").otherwise("F3"),
        lpad(hex(col("m_br2") * 16 + col("m_sri") * 4), 2, "0"),
        when(col("m_mono"), "C0").otherwise("00")))
    val mp3Hex = expr("""concat(
      case when m_id3 > 0
        then concat('494433', '0400', '00', '000000', lpad(hex(m_id3), 2, '0'),
                    repeat('00', cast(m_id3 as int)))
        else '' end,
      case when m_vbr then
        concat(repeat(concat(m_ha, repeat('AA', cast(m_la - 4 as int)),
                             m_hb, repeat('AA', cast(m_lb - 4 as int))),
                      cast(m_n div 2 as int)),
               case when m_n % 2 = 1
                 then concat(m_ha, repeat('AA', cast(m_la - 4 as int)))
                 else '' end)
      else repeat(concat(m_ha, repeat('AA', cast(m_la - 4 as int))), cast(m_n as int))
      end)""")
    // FLAC: fLaC, block header (last-flag | type 0, len 34), STREAMINFO
    // (block sizes 4096/4096, frame sizes unknown, packed sr/ch/bps/total,
    // zero md5), optional last PADDING block
    val flacHex = expr("""concat(
      '664C6143',
      case when f_pad > 0 then '00' else '80' end, '000022',
      '1000', '1000', '000000', '000000',
      lpad(hex(f_sr div 4096), 2, '0'),
      lpad(hex((f_sr div 16) % 256), 2, '0'),
      lpad(hex((f_sr % 16) * 16 + (f_ch - 1) * 2 + (f_bps - 1) div 16), 2, '0'),
      lpad(hex(((f_bps - 1) % 16) * 16), 2, '0'),
      lpad(hex(f_total), 8, '0'),
      repeat('00', 16),
      case when f_pad > 0
        then concat('81', lpad(hex(f_pad), 6, '0'), repeat('00', cast(f_pad as int)))
        else '' end)""")
    // Ogg: BOS page (granule 0) with the id packet, EOS page carrying the
    // stream's final granule (Opus: samples + pre-skip 312, RFC 7845 §4).
    // CRC fields are zero (the parser documents not verifying them).
    val oggHex = expr("""concat(
      '4F676753', '00', '02', repeat('00', 8),
      lpad(hex(o_serial % 256), 2, '0'), lpad(hex((o_serial div 256) % 256), 2, '0'),
      lpad(hex((o_serial div 65536) % 256), 2, '0'), '00',
      '00000000', '00000000', '01',
      case when o_opus then concat('13',
        '4F70757348656164', '01', lpad(hex(o_ch), 2, '0'), '3801',
        '44AC0000', '0000', '00')
      else concat('1E',
        '01', '766F72626973', '00000000', lpad(hex(o_ch), 2, '0'),
        lpad(hex(o_sr % 256), 2, '0'), lpad(hex((o_sr div 256) % 256), 2, '0'),
        lpad(hex((o_sr div 65536) % 256), 2, '0'), '00',
        '00000000',
        lpad(hex(o_nom % 256), 2, '0'), lpad(hex((o_nom div 256) % 256), 2, '0'),
        lpad(hex((o_nom div 65536) % 256), 2, '0'), '00',
        '00000000', 'B8', '01')
      end,
      '4F676753', '00', '04',
      lpad(hex((case when o_opus then o_samples + 312 else o_samples end) % 256), 2, '0'),
      lpad(hex((case when o_opus then o_samples + 312 else o_samples end) div 256 % 256), 2, '0'),
      lpad(hex((case when o_opus then o_samples + 312 else o_samples end) div 65536 % 256), 2, '0'),
      '00', '00000000',
      lpad(hex(o_serial % 256), 2, '0'), lpad(hex((o_serial div 256) % 256), 2, '0'),
      lpad(hex((o_serial div 65536) % 256), 2, '0'), '00',
      '01000000', '00000000', '01', '01', '00')""")
    framed.select(
      col("doc_id").as("media_id"),
      when(d % 3 === 0, "mp3").when(d % 3 === 1, "flac").otherwise("ogg").as("kind"),
      unhex(when(d % 3 === 0, mp3Hex).when(d % 3 === 1, flacHex)
        .otherwise(oggHex)).as("payload"))
  }

  /** [[graft.functions.PngPixelStats]] result row → [[PixelStats]] (the
    * shared shape both decode paths feed into). */
  private def rowStats(px: org.apache.spark.sql.catalyst.InternalRow): PixelStats =
    PixelStats(px.getInt(0), px.getInt(1), px.getInt(2), px.getInt(3),
      px.getArray(4).toLongArray(), px.getArray(5).toIntArray(),
      px.getArray(6).toIntArray())

  /** Pixel-statistic feature vector from a REAL decode: per-channel
    * mean/min/max normalized to [0,1], cycled to `dim`. Deterministic by
    * construction (pure function of the decoded pixels). */
  private[multimodal] def statsFeatures(st: PixelStats, dim: Int): Array[Float] = {
    val n = st.width.toFloat * st.height
    val full = ((1 << st.depth) - 1).toFloat // 255 or 65535: depth-correct [0,1]
    val out = new Array[Float](dim)
    var j = 0
    while (j < dim) {
      val c = (j / 3) % st.channels
      out(j) = (j % 3) match {
        case 0 => (st.sums(c) / n) / full
        case 1 => st.mins(c) / full
        case _ => st.maxs(c) / full
      }
      j += 1
    }
    out
  }

  /** Full decode of one payload through whichever decoder accepts it:
    * the native codec-free PNG path first (cheap header sniff, no codec
    * spin-up), then the `javax.imageio` codec (JPEG). None = rejected. */
  private[multimodal] def decodeAny(payload: Array[Byte]): Option[PixelStats] = {
    val px = graft.functions.PngPixelStats.parse(payload)
    if (px != null) Some(rowStats(px)) else imageIoPixelStats(payload)
  }

  /** Decode + feature-extract, batched per partition. `mapPartitions` (not
    * per-row map) so the decoder amortizes codec setup once per partition
    * — the same batch contract as `mapInPandas`. The resize dims come
    * from PARSING the payload's container header (real bytes, real
    * parser), not from the metadata columns. Features are REAL
    * pixel statistics from whichever decoder accepts the payload
    * ([[decodeAny]]: native PNG inflate+unfilter, or the `javax.imageio`
    * JPEG codec); a payload no decoder accepts is rejected with an EMPTY
    * feature vector — metadata still flows, nothing is fabricated. */
  def extractFeatures(media: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaItem].mapPartitions { it =>
      // real pipeline: instantiate decoder/model HERE, once per partition
      it.map { m =>
        val feats = decodeAny(m.payload) match {
          case Some(st) => statsFeatures(st, dim)
          case None => Array.empty[Float] // undecodable: explicit reject
        }
        val parsed = graft.functions.ImageDims.parse(m.payload)
        val (kind, pw, ph) =
          if (parsed != null) (parsed.getString(0), parsed.getInt(1), parsed.getInt(2))
          else (m.kind, m.width, m.height) // headerless blob: trust ingest metadata
        val (ow, oh) = resizedDims(pw, ph, 224)
        MediaFeatures(m.media_id, kind, m.payload.length, ow, oh, feats)
      }
    }
  }

  /** Batched full decode → per-channel stats, one row per payload that
    * decodes (rejects emit nothing): the operator behind q89's
    * pixel-level JPEG oracle. Same `mapPartitions` batch contract as
    * [[extractFeatures]]; embarrassingly parallel, nothing corpus-sized
    * anywhere. */
  def decodePixelStats(media: DataFrame): Dataset[DecodedPixelStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaItem].mapPartitions { it =>
      it.flatMap { m =>
        decodeAny(m.payload).map(st => DecodedPixelStats(m.media_id,
          st.width, st.height, st.channels, st.depth,
          st.sums, st.mins, st.maxs))
      }
    }
  }

  /** Build a demo media table of fully DECODABLE baseline JPEGs from the
    * documents table: each document's text bytes ('A'-padded) become the
    * values of uniform 8×8 blocks in a grayscale mosaic encoded by
    * [[JpegFixtures.encodeGrayMosaic]] — a spec-derived encoder
    * independent of the `javax.imageio` decoder that reads the payloads
    * back. Uniform blocks + all-ones quantization round-trip EXACTLY
    * (DC-only arithmetic, see JpegFixtures), so a DuckDB oracle can
    * recompute every pixel statistic analytically from the same text
    * bytes without any codec (q89). Dims vary per doc: (doc_id%3+1) ×
    * (doc_id%2+1) blocks of 8×8. */
  def jpegMediaFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).where(col("text").isNotNull)
      .as[(Long, String)]
      .map { case (id, text) =>
        val bw = (id % 3 + 1).toInt; val bh = (id % 2 + 1).toInt
        val bytes = text.getBytes("UTF-8")
        val vals = Array.tabulate(bw * bh)(i =>
          if (i < bytes.length) bytes(i) & 0xff else 'A'.toInt)
        (id, "jpeg", bw * 8, bh * 8, JpegFixtures.encodeGrayMosaic(vals, bw, bh))
      }
      .toDF("media_id", "kind", "width", "height", "payload")
  }

  /** Progressive-JPEG twin table: for every document the baseline 8×8
    * block mosaic (the mixed-crawl recipe: text bytes 'A'-padded, or the
    * flat-bright 250 plant for `doc_id % 9 == 4` so the quality gate
    * splits) at `doc_id·10`, and for ODD doc_ids a PROGRESSIVE (SOF2)
    * re-encode of the SAME mosaic at `doc_id·10 + 1` — byte-different
    * coding (spectral bands + successive approximation, see
    * [[JpegFixtures.encodeGrayMosaicProgressive]]), pixel-identical
    * decode, so a DuckDB oracle replays BOTH rows' signals and hashes
    * from one block-value relation. */
  def progressiveJpegMediaFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.where(col("text").isNotNull).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val vals =
          if (id % 9 == 4) Array.fill(64)(250)
          else {
            val tb = text.getBytes("UTF-8")
            Array.tabulate(64)(i => if (i < tb.length) tb(i) & 0xff else 'A'.toInt)
          }
        val base = (id * 10, "baseline", JpegFixtures.encodeGrayMosaic(vals, 8, 8))
        if (id % 2 == 1)
          Seq(base, (id * 10 + 1, "progressive",
            JpegFixtures.encodeGrayMosaicProgressive(vals, 8, 8)))
        else Seq(base)
      }
      .toDF("media_id", "coding", "payload")
  }

  /** GIF sibling of [[progressiveJpegMediaFromDocuments]]'s mosaic recipe:
    * a 64×64 grayscale GIF89a per document (identity-ramp palette, REAL
    * variable-width LZW from [[GifFixtures]]) whose 8×8 uniform blocks
    * are the text bytes 'A'-padded — the identity palette makes decoded
    * luma equal the input byte, so a DuckDB oracle replays every battery
    * signal and aHash bit from `text` without any codec (q151), while the
    * payload itself exercises the full LZW path (dictionary growth,
    * width changes, CLEAR resets on real data). `doc_id % 9 == 4` plants
    * the flat-bright 250 mosaic so the quality gate splits. */
  def gifMediaFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.where(col("text").isNotNull).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val vals =
          if (id % 9 == 4) Array.fill(64)(250)
          else {
            val tb = text.getBytes("UTF-8")
            Array.tabulate(64)(i => if (i < tb.length) tb(i) & 0xff else 'A'.toInt)
          }
        val px = new Array[Int](64 * 64)
        var b = 0
        while (b < 64) {
          val v = vals(b)
          val x0 = (b % 8) * 8
          val y0 = (b / 8) * 8
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) { px((y0 + y) * 64 + x0 + x) = v; x += 1 }
            y += 1
          }
          b += 1
        }
        (id, "gif", GifFixtures.encodeGray(px, 64, 64))
      }
      .toDF("media_id", "kind", "payload")
  }

  /** WebP sibling of [[gifMediaFromDocuments]]'s mosaic recipe: a 64×64
    * grayscale LOSSLESS WebP (VP8L) per document whose 8×8 uniform blocks
    * are the text bytes 'A'-padded — identical pixel content to the GIF
    * table, so the same DuckDB oracle replays every battery signal and
    * aHash bit from `text` (q152) while the payloads exercise the real
    * VP8L machinery. Encoder knobs rotate per doc so the corpus covers
    * the bitstream features a crawl sees: subtract-green everywhere,
    * predictor transform (modes 0/2/7) for `doc_id % 4 != 0`, LZ77 row
    * copies (the mosaic's repeated block rows make them fire) for even
    * docs, a color cache for `doc_id % 3 == 0` — pixel content is
    * knob-INDEPENDENT, so one oracle covers all variants. `doc_id % 9 ==
    * 4` plants the flat-bright 250 mosaic so the quality gate splits. */
  def webpMediaFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.where(col("text").isNotNull).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val vals =
          if (id % 9 == 4) Array.fill(64)(250)
          else {
            val tb = text.getBytes("UTF-8")
            Array.tabulate(64)(i => if (i < tb.length) tb(i) & 0xff else 'A'.toInt)
          }
        val px = new Array[Int](64 * 64)
        var b = 0
        while (b < 64) {
          val v = vals(b)
          val x0 = (b % 8) * 8
          val y0 = (b / 8) * 8
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) { px((y0 + y) * 64 + x0 + x) = v; x += 1 }
            y += 1
          }
          b += 1
        }
        val mode = (id % 4) match {
          case 1 => 0
          case 2 => 2
          case 3 => 7
          case _ => -1
        }
        val payload = WebpFixtures.encodeGray(px, 64, 64,
          subtractGreen = true,
          predictorMode = mode,
          cacheBits = if (id % 3 == 0) 5 else 0,
          lz77Rows = id % 2 == 0)
        (id, "webp", payload)
      }
      .toDF("media_id", "kind", "payload")
  }

  /** LOSSY-WebP (VP8 keyframe) sibling of [[webpMediaFromDocuments]]: a
    * 64×64 grayscale mosaic per document of 4×4 SIXTEEN-pixel cells (one
    * VP8 macroblock each, from the first 16 text bytes 'A'-padded), built
    * by [[Vp8Fixtures.encodeGrayMosaic]] whose DC-only construction
    * reconstructs EXACTLY — so a DuckDB oracle replays every battery
    * signal and aHash bit from `text` even though the codec is lossy.
    * Encoder knobs rotate per doc (B_PRED vs 16×16 DC_PRED + Y2/WHT,
    * skip-probability) and are pixel-invariant, so one oracle covers all
    * variants. `doc_id % 9 == 4` plants the flat-bright 250 mosaic so the
    * quality gate splits, mirroring the q151/q152 convention. */
  def vp8MediaFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.where(col("text").isNotNull).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val vals =
          if (id % 9 == 4) Array.fill(16)(250)
          else {
            val tb = text.getBytes("UTF-8")
            Array.tabulate(16)(i => if (i < tb.length) tb(i) & 0xff else 'A'.toInt)
          }
        val payload = Vp8Fixtures.encodeGrayMosaic(vals, 4, 4,
          bPred = id % 3 == 0,
          probSkip = if (id % 2 == 0) 150 else 220)
        (id, "webp", payload)
      }
      .toDF("media_id", "kind", "payload")
  }

  /** Aspect-preserving resize metadata (shorter side → `target`). Pure
    * arithmetic — in a real pipeline the payload transform happens in the
    * decode batch; the *plan* shape is identical. */
  def resizedDims(w: Int, h: Int, target: Int): (Int, Int) =
    if (w <= h) (target, math.max(1, math.round(h.toFloat * target / w)))
    else (math.max(1, math.round(w.toFloat * target / h)), target)

  /** Frame-sampling plan for IMAGE/VIDEO media (tables with a `width`
    * column, i.e. [[mediaFromDocuments]] — the audio table's schema is
    * sample_rate/channels and has no frame geometry): every `stride`-th
    * frame index up to `maxFrames` — metadata-only, no payload touched
    * (column pruning keeps the blob out of this plan entirely). Fails
    * fast with a clear message rather than an unresolved-column error. */
  def frameSamplePlan(media: DataFrame, fps: Int = 30, stride: Int = 10, maxFrames: Int = 8): DataFrame = {
    require(media.columns.contains("width"),
      "frameSamplePlan needs a 'width' column (image/video media table); " +
        "audioFromDocuments tables have no frame geometry to sample")
    media.select(col("media_id"), col("kind"),
      explode(sequence(lit(0), least(lit(maxFrames - 1), (col("width") / stride).cast("int"))))
        .as("frame_index"))
      .withColumn("frame_ts_ms", col("frame_index") * lit(1000 * stride) / fps)
  }

  /** Deterministic WARC-file fixture (ISO 28500 text framing, no
    * compression): per document, a two-record WARC payload — an HTTP
    * `request` record, then the `response` record whose body is the doc's
    * text prefix. Every byte is arithmetic over the documents row (the
    * [[videoFromDocuments]] pattern), so the DuckDB oracle can rebuild
    * the exact parsed fields AND the raw header bytes. The gzip path of
    * [[graft.functions.WarcRecords]] is pinned separately in WarcSpec
    * (compressed bytes are codec-dependent, not oracle arithmetic). */
  /** Arithmetic HTML page for a documents row — the extraction fixture:
    * head cruft (title, style, script whose BODY contains a decoy
    * `</div>`), a comment, entities (named, numeric, nbsp, unknown-stays-
    * literal), inline `<br>`, conditional list/div blocks, and a literal
    * `<` that is NOT a tag. Every byte is doc_id arithmetic plus the
    * text prefix, so the oracle can rebuild the EXPECTED extracted text
    * per row (the [[warcFromDocuments]] pattern). */
  def htmlFromDocuments(id: Column, text: Column): Column = {
    val ids = id.cast("string")
    val text60 = substring(coalesce(text, lit("")), 1, 60)
    concat(
      lit("<html><head><title>T"), ids, lit("</title>"),
      lit("<style type=\"text/css\">p { color: red; }</style>"),
      lit("<script>if (1<2) { x = \"</div>\"; }</script></head>"),
      lit("<body><!-- hidden "), ids, lit(" --><h1>Doc &amp; &#78;o. "), ids,
      lit("</h1><p>  "), text60, lit("  </p>"),
      when(id % 3 === 0, concat(lit("<ul><li>item&nbsp;A"), ids,
        lit("</li><li>item &lt;B&gt;</li></ul>"))).otherwise(lit("")),
      when(id % 4 === 0, concat(lit("<div class=\"x\">tail "),
        (id % 7).cast("string"), lit("</div>"))).otherwise(lit("")),
      lit("<p>end<br>line &unknown; 1 < 2</p></body></html>"))
  }

  /** [[warcFromDocuments]] with `text/html` response bodies built by
    * [[htmlFromDocuments]] — the crawl-shaped input for the WARC →
    * html_text → quality pipeline composition. */
  def warcHtmlFromDocuments(docs: DataFrame): DataFrame = {
    val id = col("doc_id").cast("string")
    val body = htmlFromDocuments(col("doc_id"), col("text"))
    val url = concat(lit("http://ex.com/page/"), id)
    val date = concat(lit("2026-02-"),
      lpad((col("doc_id") % 27 + 1).cast("string"), 2, "0"), lit("T00:00:00Z"))
    val respBlock = concat(lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"), body)
    val rec = concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "), url,
      lit("\r\nWARC-Date: "), date,
      lit("\r\nContent-Type: application/http; msgtype=response\r\nContent-Length: "),
      length(encode(respBlock, "UTF-8")).cast("string"),
      lit("\r\n\r\n"), respBlock, lit("\r\n\r\n"))
    docs.select(col("doc_id").as("media_id"), encode(rec, "UTF-8").as("payload"))
  }

  def warcFromDocuments(docs: DataFrame): DataFrame = {
    val id = col("doc_id").cast("string")
    val body = substring(coalesce(col("text"), lit("")), 1, 60)
    val url = concat(lit("http://ex.com/doc/"), id)
    val date = concat(lit("2026-01-"),
      lpad((col("doc_id") % 27 + 1).cast("string"), 2, "0"), lit("T00:00:00Z"))
    val reqBlock = concat(lit("GET /doc/"), id, lit(" HTTP/1.1\r\nHost: ex.com\r\n\r\n"))
    val respBlock = concat(lit("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"), body)
    def rec(rtype: String, msgtype: String, blk: Column): Column = concat(
      lit(s"WARC/1.0\r\nWARC-Type: $rtype\r\nWARC-Target-URI: "), url,
      lit("\r\nWARC-Date: "), date,
      lit(s"\r\nContent-Type: application/http; msgtype=$msgtype\r\nContent-Length: "),
      length(encode(blk, "UTF-8")).cast("string"),
      lit("\r\n\r\n"), blk, lit("\r\n\r\n"))
    docs.select(col("doc_id").as("media_id"),
      encode(concat(rec("request", "request", reqBlock),
        rec("response", "response", respBlock)), "UTF-8").as("payload"))
  }

  /** Image-bearing demo WARC crawl from `documents`: per non-null-text doc
    * ONE WARC payload holding an HTML response (the [[warcHtmlFromDocuments]]
    * record shape) followed by PNG image responses
    * (`Content-Type: image/png`, BINARY bodies — the media half of a real
    * crawl, which [[extractWarcMedia]] harvests by content type):
    *
    *   - a PRIMARY image, `media_id = doc_id·10`, pixels from the row's
    *     text ('A'-padded), dims `(doc_id%6+6, doc_id%4+5)` — EXCEPT docs
    *     with `doc_id % 7 == 0`, which all carry ONE constant 8×6 all-'A'
    *     image: the planted exact-duplicate group (byte-identical bodies
    *     under different ids/urls).
    *   - for `doc_id % 5 == 0` outside the constant group, a NEAR-DUPLICATE
    *     variant, `media_id = doc_id·10 + 1`: same dims, same pixels except
    *     the first pixel forced to RGB(0,0,0) — a one-cell luma dent that
    *     leaves the 64-bit aHash within a few bits of the primary's.
    *
    * Every image byte derives analytically from `(doc_id, text)`, so a SQL
    * oracle re-frames the exact payloads and replays the dedup decisions
    * (q133/q135). */
  /** The crawl fixtures' per-doc WARC-Date column (doc_id arithmetic). */
  private def crawlDate: Column = concat(lit("2026-03-"),
    lpad((col("doc_id") % 27 + 1).cast("string"), 2, "0"), lit("T00:00:00Z"))

  /** The crawl fixtures' HTML response record (UTF-8, Content-Length over
    * the HTTP block) — shared so the single- and mixed-codec builders
    * frame the text half identically. */
  private def crawlHtmlRec: Column = {
    val htmlBlock = concat(
      lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"),
      htmlFromDocuments(col("doc_id"), col("text")))
    encode(concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://img.ex.com/page/"),
      col("doc_id").cast("string"),
      lit("\r\nWARC-Date: "), crawlDate,
      lit("\r\nContent-Type: application/http; msgtype=response\r\nContent-Length: "),
      length(encode(htmlBlock, "UTF-8")).cast("string"),
      lit("\r\n\r\n"), htmlBlock, lit("\r\n\r\n")), "UTF-8")
  }

  /** A media response record, BINARY end-to-end: UTF-8 headers
    * concatenated with the raw image bytes (Content-Length = byte length
    * of the HTTP block). `ext`/`ctype` parameterize the codec
    * (`png`/`image/png`, `jpg`/`image/jpeg`). */
  private def crawlMediaRec(
      mediaId: Column, ext: String, ctype: String, body: Column): Column = {
    val block = concat(
      encode(lit(s"HTTP/1.1 200 OK\r\nContent-Type: $ctype\r\n\r\n"), "UTF-8"), body)
    concat(
      encode(concat(
        lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://img.ex.com/media/"),
        mediaId.cast("string"), lit(s".$ext"),
        lit("\r\nWARC-Date: "), crawlDate,
        lit("\r\nContent-Type: application/http; msgtype=response\r\nContent-Length: "),
        length(block).cast("string"),
        lit("\r\n\r\n")), "UTF-8"),
      block,
      encode(lit("\r\n\r\n"), "UTF-8"))
  }

  def warcImageCrawlFromDocuments(docs: DataFrame): DataFrame = {
    val htmlRec = crawlHtmlRec
    def imageRec(mediaId: Column, png: Column): Column =
      crawlMediaRec(mediaId, "png", "image/png", png)
    docs.where(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
      .withColumn("__const__", col("doc_id") % 7 === 0)
      .withColumn("w", when(col("__const__"), lit(8))
        .otherwise(col("doc_id") % 6 + 6).cast("int"))
      .withColumn("h", when(col("__const__"), lit(6))
        .otherwise(col("doc_id") % 4 + 5).cast("int"))
      .withColumn("npb", col("w") * col("h") * lit(3))
      .withColumn("basepx", expr(
        """substr(concat(CASE WHEN doc_id % 7 = 0 THEN ''
          |ELSE hex(encode(text, 'UTF-8')) END,
          |repeat('41', npb)), 1, 2*npb)""".stripMargin.replace("\n", " ")))
      .withColumn("__variant__", col("doc_id") % 5 === 0 && !col("__const__"))
      .select(col("doc_id").as("media_id"),
        concat(
          htmlRec,
          imageRec(col("doc_id") * 10,
            unhex(pngHexFromPixels(col("w"), col("h"), col("basepx"), 3, "0802000000"))),
          when(col("__variant__"),
            imageRec(col("doc_id") * 10 + 1,
              unhex(pngHexFromPixels(col("w"), col("h"),
                concat(lit("000000"), expr("substr(basepx, 7)")), 3, "0802000000"))))
            .otherwise(lit(Array.emptyByteArray))).as("payload"))
  }

  /** [[warcImageCrawlFromDocuments]] plus a planted UNDECODABLE slice:
    * for `doc_id % 6 == 2` the page also serves a CORRUPT GIF
    * (`image/gif`, a real `GIF89a` signature followed by raw text bytes —
    * no screen descriptor survives, so even the native [[graft.functions.GifDecoder]]
    * NULLs it, as any decoder must). `extractWarcMedia` harvests it like
    * any `image/…` body, so downstream curation must surface the decode
    * failure as `undecodable` rather than folding it into
    * `quality_reject` (the q149 contract — the status now covers corrupt
    * payloads and genuinely unsupported codecs like WebP alike). */
  def warcImageCrawlWithGifsFromDocuments(docs: DataFrame): DataFrame = {
    val withGif = warcImageCrawlFromDocuments(docs)
      .join(docs.select(col("doc_id"), col("text")),
        col("media_id") === col("doc_id"))
    val gifBody = concat(
      encode(lit("GIF89a"), "UTF-8"),
      encode(col("text"), "UTF-8"))
    withGif.select(col("media_id"),
      concat(col("payload"),
        when(col("doc_id") % 6 === 2,
          crawlMediaRec(col("doc_id") * 10 + 2, "gif", "image/gif", gifBody))
          .otherwise(lit(Array.emptyByteArray))).as("payload"))
  }

  /** Block values of the mixed crawl's CONSTANT JPEG group (the exact-dup
    * plant): the first 64 bytes of this repeated ASCII literal — all
    * members byte-identical, mean luma mid-range so the group SURVIVES
    * quality gating and exercises exact dedup (the q139 rationale). The
    * DuckDB oracle replays it as
    * `substr(repeat('GRAFTJPEGCONSTANTGROUP', 3), 1, 64)`. */
  private[graft] val MixedJpegConstVals: Array[Int] =
    ("GRAFTJPEGCONSTANTGROUP" * 3).take(64).map(_.toInt).toArray

  /** Mixed-codec sibling of [[warcImageCrawlFromDocuments]] — the
    * real-crawl shape where the image population is MOSTLY JPEG: one WARC
    * payload per document holding the HTML response plus its media
    * responses, PNG and baseline JPEG interleaved by doc_id class. Every
    * decoded signal derives analytically from `(doc_id, text)`, so a SQL
    * oracle replays the battery / hash / dedup decisions for BOTH codecs
    * (JPEG entropy bytes are not SQL-replayable — the oracle replays the
    * DECODED mosaic, which round-trips bit-exactly per [[JpegFixtures]];
    * extraction framing itself is pinned byte-level by q133).
    *
    * Classes over docs with non-null text:
    *   - `doc_id % 7 == 0`: the constant 8×6 PNG (exact-dup group),
    *     unchanged from the single-codec fixture.
    *   - else `doc_id % 3 == 1`: a GRAYSCALE 8×8-block JPEG mosaic
    *     (64×64 px, one mosaic block per aHash grid cell), media
    *     `doc_id·10`, url `….jpg`, type `image/jpeg`. Block values =
    *     first 64 text bytes 'A'-padded, except:
    *       - `doc_id % 33 == 1`: [[MixedJpegConstVals]] (JPEG exact-dup
    *         group — byte-identical payloads);
    *       - else `doc_id % 17 == 2`: all-250 blocks (bright + zero
    *         dynamic range — the planted JPEG quality_reject);
    *       - else `doc_id % 5 == 0`: ALSO a near-dup variant
    *         `doc_id·10 + 1` with block 0 dented by XOR 1 — byte-different
    *         entropy stream, aHash Hamming 0 (a ±1 luma dent cannot cross
    *         the integer cell-vs-mean comparisons except at exact
    *         equality), the re-encode dedup class;
    *       - else `doc_id % 13 == 3`: ALSO a cross-codec PNG THUMBNAIL
    *         `doc_id·10 + 2` — 8×8 RGB with pixel (r,c) = (v,v,v) of
    *         block (r,c): aHash identical to the 64×64 JPEG (per-cell
    *         comparisons are scale-invariant: cells shrink 64×, luma
    *         triples, both sides of every cross-multiplication scale
    *         together), so the downscaled re-host dedups against the
    *         JPEG original ACROSS codecs.
    *   - else: the varied-dims PNG of the single-codec fixture (with its
    *     `% 5` one-pixel-dent variants). */
  def warcMixedImageCrawlFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // JPEG payloads need the entropy encoder — a typed map builds ONLY the
    // image bytes; classes, PNG pixels, and all WARC framing stay Column
    // algebra so the rest of the fixture remains SQL-replayable
    val withJpeg = docs.where(col("text").isNotNull)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val isJpeg = id % 7 != 0 && id % 3 == 1
        if (!isJpeg) (id, text, null: Array[Byte], null: Array[Byte])
        else {
          val jconst = id % 33 == 1
          val bright = !jconst && id % 17 == 2
          val vals =
            if (jconst) MixedJpegConstVals
            else if (bright) Array.fill(64)(250)
            else {
              val tb = text.getBytes("UTF-8")
              Array.tabulate(64)(i => if (i < tb.length) tb(i) & 0xff else 'A'.toInt)
            }
          val main = JpegFixtures.encodeGrayMosaic(vals, 8, 8)
          val variant =
            if (!jconst && !bright && id % 5 == 0) {
              val dent = vals.clone(); dent(0) ^= 1
              JpegFixtures.encodeGrayMosaic(dent, 8, 8)
            } else null
          (id, text, main, variant)
        }
      }.toDF("doc_id", "text", "jpeg_main", "jpeg_variant")
    val empty = lit(Array.emptyByteArray)
    withJpeg
      .withColumn("__const__", col("doc_id") % 7 === 0)
      .withColumn("__jpeg__", col("jpeg_main").isNotNull)
      .withColumn("w", when(col("__const__"), lit(8))
        .otherwise(col("doc_id") % 6 + 6).cast("int"))
      .withColumn("h", when(col("__const__"), lit(6))
        .otherwise(col("doc_id") % 4 + 5).cast("int"))
      .withColumn("npb", col("w") * col("h") * lit(3))
      .withColumn("basepx", expr(
        """substr(concat(CASE WHEN doc_id % 7 = 0 THEN ''
          |ELSE hex(encode(text, 'UTF-8')) END,
          |repeat('41', npb)), 1, 2*npb)""".stripMargin.replace("\n", " ")))
      .withColumn("vhx", expr(
        "substr(concat(hex(encode(text, 'UTF-8')), repeat('41', 64)), 1, 128)"))
      .withColumn("__pvariant__",
        !col("__jpeg__") && !col("__const__") && col("doc_id") % 5 === 0)
      .withColumn("__thumb__", col("__jpeg__") && col("doc_id") % 13 === 3 &&
        col("doc_id") % 33 =!= 1 && col("doc_id") % 17 =!= 2)
      .withColumn("thumbpx", expr(
        "array_join(transform(sequence(0, 63), i -> repeat(substr(vhx, 2*i+1, 2), 3)), '')"))
      .select(col("doc_id").as("media_id"),
        concat(
          crawlHtmlRec,
          when(col("__jpeg__"),
            crawlMediaRec(col("doc_id") * 10, "jpg", "image/jpeg", col("jpeg_main")))
            .otherwise(crawlMediaRec(col("doc_id") * 10, "png", "image/png",
              unhex(pngHexFromPixels(col("w"), col("h"), col("basepx"), 3, "0802000000")))),
          when(col("__pvariant__"),
            crawlMediaRec(col("doc_id") * 10 + 1, "png", "image/png",
              unhex(pngHexFromPixels(col("w"), col("h"),
                concat(lit("000000"), expr("substr(basepx, 7)")), 3, "0802000000"))))
            .otherwise(empty),
          when(col("jpeg_variant").isNotNull,
            crawlMediaRec(col("doc_id") * 10 + 1, "jpg", "image/jpeg",
              col("jpeg_variant"))).otherwise(empty),
          when(col("__thumb__"),
            crawlMediaRec(col("doc_id") * 10 + 2, "png", "image/png",
              unhex(pngHexFromPixels(lit(8), lit(8), col("thumbpx"), 3, "0802000000"))))
            .otherwise(empty)).as("payload"))
  }

  /** WebP twin of [[warcMixedImageCrawlFromDocuments]] — the SAME content
    * classes (constant PNG exact group, PNG mains + one-pixel dents, a
    * byte-identical const mosaic group, all-250 bright rejects, XOR-1
    * dent re-encodes, cross-codec 8×8 PNG thumbnails) with the mosaic
    * slice carried as LOSSLESS WebP (VP8L, `image/webp`, `….webp`)
    * instead of JPEG. Encoder knobs are FIXED (subtract-green only) so
    * payload bytes are a bijection of pixel content and the exact-dedup
    * stage groups byte-identical mosaics exactly as the oracle's
    * content-key grouping does. Because the decoded pixel content is
    * IDENTICAL to the JPEG fixture per (doc_id, text), the q142 oracle
    * replays this crawl VERBATIM — the q153 query literally asserts
    * "curation over a WebP crawl makes the decisions the JPEG crawl
    * makes on the same content". */
  def warcMixedWebpCrawlFromDocuments(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val withWebp = docs.where(col("text").isNotNull)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val isWebp = id % 7 != 0 && id % 3 == 1
        if (!isWebp) (id, text, null: Array[Byte], null: Array[Byte])
        else {
          val wconst = id % 33 == 1
          val bright = !wconst && id % 17 == 2
          val vals =
            if (wconst) MixedJpegConstVals
            else if (bright) Array.fill(64)(250)
            else {
              val tb = text.getBytes("UTF-8")
              Array.tabulate(64)(i => if (i < tb.length) tb(i) & 0xff else 'A'.toInt)
            }
          def mosaic(blocks: Array[Int]): Array[Byte] = {
            val px = new Array[Int](64 * 64)
            var b = 0
            while (b < 64) {
              val v = blocks(b)
              val x0 = (b % 8) * 8; val y0 = (b / 8) * 8
              var y = 0
              while (y < 8) {
                var x = 0
                while (x < 8) { px((y0 + y) * 64 + x0 + x) = v; x += 1 }
                y += 1
              }
              b += 1
            }
            WebpFixtures.encodeGray(px, 64, 64, subtractGreen = true)
          }
          val main = mosaic(vals)
          val variant =
            if (!wconst && !bright && id % 5 == 0) {
              val dent = vals.clone(); dent(0) ^= 1
              mosaic(dent)
            } else null
          (id, text, main, variant)
        }
      }.toDF("doc_id", "text", "webp_main", "webp_variant")
    val empty = lit(Array.emptyByteArray)
    withWebp
      .withColumn("__const__", col("doc_id") % 7 === 0)
      .withColumn("__webp__", col("webp_main").isNotNull)
      .withColumn("w", when(col("__const__"), lit(8))
        .otherwise(col("doc_id") % 6 + 6).cast("int"))
      .withColumn("h", when(col("__const__"), lit(6))
        .otherwise(col("doc_id") % 4 + 5).cast("int"))
      .withColumn("npb", col("w") * col("h") * lit(3))
      .withColumn("basepx", expr(
        """substr(concat(CASE WHEN doc_id % 7 = 0 THEN ''
          |ELSE hex(encode(text, 'UTF-8')) END,
          |repeat('41', npb)), 1, 2*npb)""".stripMargin.replace("\n", " ")))
      .withColumn("vhx", expr(
        "substr(concat(hex(encode(text, 'UTF-8')), repeat('41', 64)), 1, 128)"))
      .withColumn("__pvariant__",
        !col("__webp__") && !col("__const__") && col("doc_id") % 5 === 0)
      .withColumn("__thumb__", col("__webp__") && col("doc_id") % 13 === 3 &&
        col("doc_id") % 33 =!= 1 && col("doc_id") % 17 =!= 2)
      .withColumn("thumbpx", expr(
        "array_join(transform(sequence(0, 63), i -> repeat(substr(vhx, 2*i+1, 2), 3)), '')"))
      .select(col("doc_id").as("media_id"),
        concat(
          crawlHtmlRec,
          when(col("__webp__"),
            crawlMediaRec(col("doc_id") * 10, "webp", "image/webp", col("webp_main")))
            .otherwise(crawlMediaRec(col("doc_id") * 10, "png", "image/png",
              unhex(pngHexFromPixels(col("w"), col("h"), col("basepx"), 3, "0802000000")))),
          when(col("__pvariant__"),
            crawlMediaRec(col("doc_id") * 10 + 1, "png", "image/png",
              unhex(pngHexFromPixels(col("w"), col("h"),
                concat(lit("000000"), expr("substr(basepx, 7)")), 3, "0802000000"))))
            .otherwise(empty),
          when(col("webp_variant").isNotNull,
            crawlMediaRec(col("doc_id") * 10 + 1, "webp", "image/webp",
              col("webp_variant"))).otherwise(empty),
          when(col("__thumb__"),
            crawlMediaRec(col("doc_id") * 10 + 2, "png", "image/png",
              unhex(pngHexFromPixels(lit(8), lit(8), col("thumbpx"), 3, "0802000000"))))
            .otherwise(empty)).as("payload"))
  }

  /** Chunked-transfer crawl fixture: one WARC payload per document whose
    * HTTP responses record the WIRE bytes of a `Transfer-Encoding:
    * chunked` capture — a text/plain record carrying the document text
    * and an image/png record carrying a stored-deflate PNG, both bodies
    * chunk-framed (hex size line + CRLF + data + CRLF …, `0`-chunk
    * terminator). Every framing byte derives from `(doc_id, text)`
    * Column algebra, so the oracle replays the DECHUNKED outputs
    * arithmetically (the q106 convention); chunk sizes vary per doc
    * (`doc_id % 6 + 4` for text, 11 for the PNG) so chunk boundaries
    * land mid-document and mid-IDAT. */
  def warcChunkedCrawlFromDocuments(docs: DataFrame): DataFrame = {
    // chunked framing in HEX space: ASCII-hex of the size line, the chunk
    // bytes' hex, CRLFs between — unhex'd once at the record assembly
    def chunkedHex(payloadHex: Column, chunkBytes: Column): Column = {
      val n = (length(payloadHex) / 2).cast("int")
      val k = ceil(n.cast("double") / chunkBytes).cast("int")
      val body = when(n > 0, array_join(
        transform(sequence(lit(0), k - lit(1)), i => {
          val size = least(chunkBytes, n - i * chunkBytes)
          concat(
            hex(encode(hex(size), "UTF-8")), lit("0D0A"),
            payloadHex.substr(i * chunkBytes * 2 + 1, size * 2),
            lit("0D0A"))
        }), "")).otherwise(lit(""))
      concat(body, lit("300D0A0D0A")) // "0" CRLF CRLF
    }
    val date = crawlDate
    def chunkedRec(url: Column, ctype: String, bodyHex: Column, chunkBytes: Column): Column = {
      val block = concat(
        encode(lit(s"HTTP/1.1 200 OK\r\nContent-Type: $ctype\r\n" +
          "Transfer-Encoding: chunked\r\n\r\n"), "UTF-8"),
        unhex(chunkedHex(bodyHex, chunkBytes)))
      concat(
        encode(concat(
          lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "), url,
          lit("\r\nWARC-Date: "), date,
          lit("\r\nContent-Type: application/http; msgtype=response\r\nContent-Length: "),
          length(block).cast("string"),
          lit("\r\n\r\n")), "UTF-8"),
        block,
        encode(lit("\r\n\r\n"), "UTF-8"))
    }
    docs.where(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
      .withColumn("w", (col("doc_id") % 6 + 2).cast("int"))
      .withColumn("h", (col("doc_id") % 4 + 2).cast("int"))
      .withColumn("npb", col("w") * col("h") * lit(3))
      .withColumn("pxhex",
        expr("substr(concat(hex(encode(text, 'UTF-8')), repeat('41', npb)), 1, 2*npb)"))
      .select(col("doc_id").as("media_id"),
        concat(
          chunkedRec(
            concat(lit("http://chunk.ex.com/doc/"), col("doc_id").cast("string")),
            "text/plain; charset=utf-8",
            hex(encode(col("text"), "UTF-8")),
            (col("doc_id") % 6 + 4).cast("int")),
          chunkedRec(
            concat(lit("http://chunk.ex.com/media/"), col("doc_id").cast("string"),
              lit(".png")),
            "image/png",
            pngHexFromPixels(col("w"), col("h"), col("pxhex"), 3, "0802000000"),
            lit(11).cast("int"))).as("payload"))
  }

  /** Typed media rows harvested from WARC payloads by HTTP Content-Type —
    * the crawl→multimodal ingest step the text pipeline's
    * `html_text` walk skips: explode the
    * [[graft.functions.WarcFunctions.warcRecords]] record array, keep
    * `response` records whose content type starts with one of
    * `typePrefixes`, and hand each raw body to the decode path
    * ([[MediaFunctions]] / [[decodePixelStats]]). Output
    * `(warc_id, url, content_type, payload)`.
    *
    * Scale shape: the WARC walk, the type predicate, and the body
    * projection all run in the scan stage (one Generate per payload) —
    * only MATCHING bodies leave the scan, so a 100 TB crawl pays one
    * pass and ships only its media. */
  def extractWarcMedia(
      warc: DataFrame,
      idCol: String,
      payloadCol: String,
      typePrefixes: Seq[String] = Seq("image/", "audio/", "video/")): DataFrame = {
    require(typePrefixes.nonEmpty, "typePrefixes must be non-empty")
    val matches = typePrefixes
      .map(p => col("__r__.content_type").startsWith(p))
      .reduce(_ || _)
    warc.select(col(idCol).as("warc_id"),
        explode(graft.functions.WarcFunctions.warcRecords(col(payloadCol))).as("__r__"))
      .where(col("__r__.rec_type") === "response" && matches)
      .select(col("warc_id"), col("__r__.url").as("url"),
        col("__r__.content_type").as("content_type"), col("__r__.body").as("payload"))
  }
}
