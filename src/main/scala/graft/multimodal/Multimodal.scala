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

/** Multimodal-column plumbing: decode / feature-extract / resize /
  * frame-sample over binary payloads.
  *
  * Decode is REAL for the codec-free formats: PCM WAV samples
  * ([[graft.functions.PcmStats]]) and the full non-palette PNG family —
  * 8/16-bit gray/RGB/RGBA, multi-IDAT, sequential or Adam7 interlaced
  * ([[graft.functions.PngPixelStats]] — JDK Inflater + scanline
  * unfiltering; see [[pngPixelMediaFromDocuments]] for decodable
  * fixtures). Only formats that genuinely need an external codec (JPEG
  * entropy decode) fall back to `fakeDecode`, a deterministic byte-driven
  * stand-in. Everything around the decode is the real Spark shape: typed
  * `Dataset` schema, `mapPartitions` batch iteration (one decoder
  * instantiation per partition, the same contract a JNI/codec binding or a
  * vectorized Pandas-UDF batch would use), and metadata-only transforms that
  * never touch the payload (so Parquet column pruning skips the blobs).
  */
object Multimodal {

  /** Deterministic fake "decode + featurize" FALLBACK for payloads the
    * codec-free decoders can't handle (JPEG needs an entropy decoder this
    * container doesn't have). Keyed on payload bytes so tests can assert
    * determinism. */
  private[multimodal] def fakeDecode(item: MediaItem, dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L // deterministic FNV-ish fold over the payload
    var i = 0
    while (i < item.payload.length) { h = h * 31 + (item.payload(i) & 0xff); i += 1 }
    var j = 0
    while (j < dim) {
      val v = h * (j * 2654435761L + 1)
      out(j) = ((v >>> 40).toInt % 1000) / 1000.0f
      j += 1
    }
    out
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
    val sl = 2 * bytesPerPx // hex chars per pixel
    docs.select(col("doc_id"), col("text"))
      .withColumn("w", wExpr.cast("int"))
      .withColumn("h", hExpr.cast("int"))
      .withColumn("npb", col("w") * col("h") * lit(bytesPerPx)) // pixel bytes
      .withColumn("pxhex",
        expr("substr(concat(hex(encode(text, 'UTF-8')), repeat('41', npb)), 1, 2*npb)"))
      .withColumn("rawlen", col("h") * (lit(1) + col("w") * lit(bytesPerPx)))
      .withColumn("slhex", expr(
        s"array_join(transform(sequence(0, h-1), r -> concat('00', substr(pxhex, r*w*$sl+1, w*$sl))), '')"))
      .withColumn("lenle", expr(
        "concat(lpad(hex(rawlen % 256), 2, '0'), lpad(hex(rawlen div 256), 2, '0'))"))
      .withColumn("nlenle", expr(
        "concat(lpad(hex((65535 - rawlen) % 256), 2, '0'), lpad(hex((65535 - rawlen) div 256), 2, '0'))"))
      .withColumn("payload_hex", concat(
        lit("89504E470D0A1A0A"), // signature
        lit("0000000D49484452"), // IHDR length + type
        expr("lpad(hex(w), 8, '0')"), expr("lpad(hex(h), 8, '0')"),
        lit(ihdrDepthColorHex), // bit depth, color type, no interlace
        lit("00000000"), // IHDR crc (not validated)
        expr("lpad(hex(rawlen + 11), 8, '0')"), lit("49444154"), // IDAT len + type
        lit("7801"), // zlib header: deflate, no preset dict
        lit("01"), col("lenle"), col("nlenle"), // final stored-block header
        col("slhex"), // raw filter-0 scanlines
        lit("00000000"), // adler32 (ignored by raw inflate)
        lit("00000000"), // IDAT crc
        lit("0000000049454E44AE426082"))) // IEND
      .select(col("doc_id").as("media_id"), lit("png").as("kind"),
        col("w").as("width"), col("h").as("height"),
        unhex(col("payload_hex")).as("payload"))
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
  def audioFromDocuments(docs: DataFrame): DataFrame = {
    val sr = lit(8000L) + (col("doc_id") % 8) * lit(4000L)
    val ch = lit(1L) + col("doc_id") % 2
    val dataLen = length(encode(col("text"), "UTF-8")).cast("long")
    val header = concat(
      lit("RIFF".getBytes("US-ASCII")), le(lit(36L) + dataLen, 4),
      lit("WAVEfmt ".getBytes("US-ASCII")), le(lit(16L), 4), // fmt chunk, len 16
      le(lit(1L), 2), // PCM
      le(ch, 2), le(sr, 4),
      le(sr * ch * lit(2L), 4), // byte rate (16-bit samples)
      le(ch * lit(2L), 2), // block align
      le(lit(16L), 2), // bits per sample
      lit("data".getBytes("US-ASCII")), le(dataLen, 4))
    docs.select(
      col("doc_id").as("media_id"),
      lit("wav").as("kind"),
      sr.cast("int").as("sample_rate"),
      ch.cast("int").as("channels"),
      concat(header, encode(col("text"), "UTF-8")).as("payload"))
  }

  /** Pixel-statistic feature vector from a REAL decode
    * ([[graft.functions.PngPixelStats]] result row): per-channel
    * mean/min/max normalized to [0,1], cycled to `dim`. Deterministic by
    * construction (pure function of the decoded pixels). */
  private[multimodal] def pixelFeatures(
      px: org.apache.spark.sql.catalyst.InternalRow, dim: Int): Array[Float] = {
    val w = px.getInt(0); val h = px.getInt(1); val ch = px.getInt(2)
    val depth = px.getInt(3)
    val sums = px.getArray(4); val mins = px.getArray(5); val maxs = px.getArray(6)
    val n = w.toFloat * h
    val full = ((1 << depth) - 1).toFloat // 255 or 65535: depth-correct [0,1]
    val out = new Array[Float](dim)
    var j = 0
    while (j < dim) {
      val c = (j / 3) % ch
      out(j) = (j % 3) match {
        case 0 => (sums.getLong(c) / n) / full
        case 1 => mins.getInt(c) / full
        case _ => maxs.getInt(c) / full
      }
      j += 1
    }
    out
  }

  /** Decode + feature-extract, batched per partition. `mapPartitions` (not
    * per-row map) so a real decoder would amortize model/codec setup once
    * per partition — the same batch contract as `mapInPandas`. The resize
    * dims come from PARSING the payload's container header (the codec-free
    * part of decode — real bytes, real parser), not from the metadata
    * columns. Decodable PNGs get REAL pixel-statistic features
    * ([[pixelFeatures]] over the inflate+unfilter decode); only payloads
    * needing an external codec (JPEG) fall back to [[fakeDecode]]. */
  def extractFeatures(media: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaItem].mapPartitions { it =>
      // real pipeline: instantiate decoder/model HERE, once per partition
      it.map { m =>
        val px = graft.functions.PngPixelStats.parse(m.payload)
        val feats = if (px != null) pixelFeatures(px, dim) else fakeDecode(m, dim)
        val parsed = graft.functions.ImageDims.parse(m.payload)
        val (kind, pw, ph) =
          if (parsed != null) (parsed.getString(0), parsed.getInt(1), parsed.getInt(2))
          else (m.kind, m.width, m.height) // headerless blob: trust ingest metadata
        val (ow, oh) = resizedDims(pw, ph, 224)
        MediaFeatures(m.media_id, kind, m.payload.length, ow, oh, feats)
      }
    }
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
}
