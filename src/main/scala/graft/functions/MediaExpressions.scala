package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level image-container header parsing — the real (codec-free) part of
  * multimodal decode. Container dims live in the first bytes of the payload,
  * so width/height/format extraction needs no image codec: PNG stores them
  * big-endian in the IHDR chunk (bytes 16-23 of the file, per the PNG spec's
  * fixed signature+IHDR layout), and JPEG stores them in the frame header
  * (SOFn segment), found by walking the segment list from SOI.
  *
  * One native expression per row inside whole-stage codegen: the payload is
  * scanned once, only its first bytes are touched, and no UDF boundary or
  * row materialization is involved. At 100 TB this runs as a narrow
  * projection; with Parquet it benefits from the binary column being read
  * only when the parse is actually in the plan.
  */
case class ImageDims(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true // unrecognized container → NULL

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"image_dims requires binary, got $other")
  }

  override protected def nullSafeEval(a: Any): Any =
    ImageDims.parse(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("dims")
      s"""
         |InternalRow $r = graft.functions.ImageDims.parse($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageDims {

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  /** `(format, width, height)` from the payload's container header, or null
    * if the bytes are not a recognizable PNG/JPEG. */
  def parse(bytes: Array[Byte]): InternalRow = {
    val png = parsePng(bytes)
    if (png != null) return png
    parseJpeg(bytes)
  }

  /** PNG: 8-byte signature, then the IHDR chunk is REQUIRED first (len=13,
    * type "IHDR", width/height as big-endian u32 at file offsets 16/20). */
  private def parsePng(b: Array[Byte]): InternalRow = {
    if (b.length < 24) return null
    var i = 0
    while (i < 8) { if (b(i) != PngSig(i)) return null; i += 1 }
    // chunk length must be 13 and type must be IHDR
    if (be32(b, 8) != 13L) return null
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return null
    val w = be32(b, 16)
    val h = be32(b, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return null
    InternalRow(UTF8String.fromString("png"), w.toInt, h.toInt)
  }

  /** JPEG: SOI (FFD8), then a segment walk — each segment is FF <marker>
    * <len:be16 incl itself>. Height/width sit at +3/+5 into the first
    * frame-header segment (SOF0..SOF15 minus the non-frame C4/C8/CC).
    * Standalone markers (RSTn, TEM) and fill bytes are skipped per spec. */
  private def parseJpeg(b: Array[Byte]): InternalRow = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return null
    var i = 2
    while (i + 1 < b.length) {
      if (u8(b, i) != 0xff) return null // desynchronized stream
      var m = u8(b, i + 1)
      while (m == 0xff && i + 2 < b.length) { i += 1; m = u8(b, i + 1) } // fill bytes
      if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
        i += 2 // standalone marker, no length field
      } else if (m == 0xd9 || m == 0xda) {
        return null // EOI / start-of-scan before any frame header
      } else {
        if (i + 3 >= b.length) return null
        val len = be16(b, i + 2)
        if (len < 2) return null
        val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
        if (isSof) {
          if (i + 8 >= b.length || len < 8) return null
          val h = be16(b, i + 5)
          val w = be16(b, i + 7)
          if (w <= 0 || h <= 0) return null
          return InternalRow(UTF8String.fromString("jpeg"), w, h)
        }
        i += 2 + len
      }
    }
    null
  }
}

/** WAV/RIFF audio header parsing — the audio-modality sibling of
  * [[ImageDims]]: sample rate / channels / bit depth live little-endian in
  * the `fmt ` chunk, found by a real RIFF chunk walk from the `WAVE` form
  * header (chunks are `id:4 size:le32 payload[size]`, word-aligned, in any
  * order — a LIST or cue chunk before `fmt ` is handled, not assumed away).
  */
case class AudioMeta(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true // not a RIFF/WAVE payload → NULL

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"audio_meta requires binary, got $other")
  }

  override protected def nullSafeEval(a: Any): Any =
    AudioMeta.parse(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("meta")
      s"""
         |InternalRow $r = graft.functions.AudioMeta.parse($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AudioMeta {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    b(i) == s.charAt(0) && b(i + 1) == s.charAt(1) &&
      b(i + 2) == s.charAt(2) && b(i + 3) == s.charAt(3)

  /** `(format, sample_rate, channels, bits)` from a RIFF/WAVE header, or
    * null if the bytes are not a WAV with a well-formed `fmt ` chunk. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b.length < 36 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return null
    // Long cursor: a malformed chunk size near 2³² must walk off the end
    // and yield NULL, not overflow Int into a negative index and throw
    var i = 12L
    while (i + 8 <= b.length) {
      val at = i.toInt
      val size = le32(b, at + 4)
      if (tag(b, at, "fmt ")) {
        if (size < 16 || i + 8 + 16 > b.length) return null
        val channels = le16(b, at + 10)
        val rate = le32(b, at + 12)
        val bits = le16(b, at + 22)
        if (channels <= 0 || rate <= 0 || rate > Int.MaxValue || bits <= 0) return null
        return InternalRow(UTF8String.fromString("wav"), rate.toInt, channels, bits)
      }
      i += 8L + size + (size & 1L) // RIFF chunks are word-aligned
    }
    null
  }
}

/** Sample-level PCM decode of a WAV payload — the codec-free step past
  * [[AudioMeta]]'s header parse: 8-bit (unsigned, offset-128) and 16-bit
  * (signed little-endian) PCM need only byte arithmetic, no codec library.
  * Walks the RIFF chunks for `fmt ` (must be PCM, 8/16-bit) and `data`,
  * then one pass over the sample bytes accumulating count / peak / Σv² —
  * interleaved channels are aggregated together (each channel value is one
  * sample). `rms = sqrt(Σv² / n)`. NULL when the payload is not a PCM WAV
  * or holds zero complete samples (a trailing odd byte of a 16-bit stream
  * is ignored, as a decoder would).
  *
  * One native expression per row inside whole-stage codegen: at 100 TB this
  * is a narrow projection over the binary column — no UDF boundary, no row
  * amplification (contrast the oracle, which must explode per-sample). */
case class PcmStats(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true

  override def dataType: DataType = StructType(Seq(
    StructField("n_samples", LongType, nullable = false),
    StructField("peak", IntegerType, nullable = false),
    StructField("sum_sq", LongType, nullable = false),
    StructField("rms", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"pcm_stats requires binary, got $other")
  }

  override protected def nullSafeEval(a: Any): Any =
    PcmStats.parse(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("pcm")
      s"""
         |InternalRow $r = graft.functions.PcmStats.parse($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PcmStats {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    b(i) == s.charAt(0) && b(i + 1) == s.charAt(1) &&
      b(i + 2) == s.charAt(2) && b(i + 3) == s.charAt(3)

  /** Located PCM sample stream: `(bytesPerSample, dataAt, nSamples)`, or
    * null for non-PCM / non-8/16-bit / sample-less payloads — the shared
    * chunk walk behind [[parse]] (stats) and [[PcmEnvelopeHash64]]
    * (perceptual fingerprint). */
  private[functions] def locate(b: Array[Byte]): Array[Long] = {
    if (b.length < 36 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return null
    var bits = -1
    var dataAt = -1
    var dataLen = 0L
    var i = 12L // Long cursor: malformed sizes walk off the end, not negative
    while (i + 8 <= b.length && (bits < 0 || dataAt < 0)) {
      val at = i.toInt
      val size = le32(b, at + 4)
      if (tag(b, at, "fmt ")) {
        if (size < 16 || i + 8 + 16 > b.length) return null
        if (le16(b, at + 8) != 1) return null // PCM only
        bits = le16(b, at + 22)
        if (bits != 8 && bits != 16) return null
      } else if (tag(b, at, "data")) {
        dataAt = at + 8
        // clamp to the physical payload: a declared size past the end reads
        // only the bytes that exist
        dataLen = math.min(size, b.length.toLong - dataAt)
      }
      i += 8L + size + (size & 1L)
    }
    if (bits < 0 || dataAt < 0) return null
    val bytesPer = bits / 8
    val n = dataLen / bytesPer
    if (n <= 0L) return null
    Array(bytesPer.toLong, dataAt.toLong, n)
  }

  /** Sample `k` of a located stream, sign-adjusted to the PCM convention
    * (8-bit unsigned centered at 128; 16-bit little-endian signed). */
  private[functions] def sampleAt(b: Array[Byte], bytesPer: Long, dataAt: Long, k: Long): Int =
    if (bytesPer == 1L) u8(b, (dataAt + k).toInt) - 128
    else (le16(b, (dataAt + k * 2).toInt) << 16) >> 16 // sign-extend

  /** `(n_samples, peak, sum_sq, rms)` over the `data` chunk's PCM samples,
    * or null for non-PCM / non-8/16-bit / sample-less payloads. */
  def parse(b: Array[Byte]): InternalRow = {
    val loc = locate(b)
    if (loc == null) return null
    val Array(bytesPer, dataAt, n) = loc
    var k = 0L
    var peak = 0
    var sumSq = 0L
    while (k < n) {
      val v = sampleAt(b, bytesPer, dataAt, k)
      val a = math.abs(v)
      if (a > peak) peak = a
      sumSq += v.toLong * v
      k += 1
    }
    InternalRow(n, peak, sumSq, math.sqrt(sumSq.toDouble / n))
  }
}

/** 64-bit energy-envelope hash of a PCM WAV — the audio analogue of
  * [[PngDHash64]]: the sample stream splits into 65 equal windows of
  * `L = n/65` samples (integer floor; the `n − 65·L` tail samples are
  * ignored, so every window is EXACTLY L samples and window energies
  * compare directly — no normalization, no overflow: `L ≤ 2²⁵/65 < 2¹⁹`
  * samples × `v² ≤ 2³⁰` keeps every energy under 2⁴⁹), per-window energy
  * `Σv²`, bit `b` (at position `63−b`, MSB-first like the image hashes)
  * set iff `energy(b) > energy(b+1)` strictly. Captures the loudness
  * CONTOUR — robust to uniform gain-preserving re-encodes of the same
  * recording (byte-different containers, padding differences), and
  * channel-agnostic by construction (interleaved samples hash as laid
  * out). NULL for undecodable payloads and streams shorter than 65
  * samples (too short to contour). Rides [[graft.ops.Dedup.hammingPairs64]]
  * for near-dup pairing like the image hashes. */
case class PcmEnvelopeHash64(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"pcm_envelope_hash64 requires binary, got $other")
  }

  override protected def nullSafeEval(a: Any): Any =
    PcmEnvelopeHash64.compute(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("eh")
      s"""
         |Long $r = graft.functions.PcmEnvelopeHash64.compute($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PcmEnvelopeHash64 {

  def compute(b: Array[Byte]): java.lang.Long = {
    val loc = PcmStats.locate(b)
    if (loc == null) return null
    val Array(bytesPer, dataAt, n) = loc
    if (n < 65L) return null
    val L = n / 65L
    val e = new Array[Long](65)
    var w = 0
    while (w < 65) {
      var k = w * L
      val end = k + L
      var sum = 0L
      while (k < end) {
        val v = PcmStats.sampleAt(b, bytesPer, dataAt, k)
        sum += v.toLong * v
        k += 1
      }
      e(w) = sum
      w += 1
    }
    var hash = 0L
    var bb = 0
    while (bb < 64) {
      if (e(bb) > e(bb + 1)) hash |= 1L << (63 - bb)
      bb += 1
    }
    java.lang.Long.valueOf(hash)
  }
}

/** Pixel-level PNG decode — the codec-free step past [[ImageDims]]'s header
  * parse, and the end of the repo's last decode stub: PNG's only compression
  * is zlib/deflate, which ships in the JDK (`java.util.zip.Inflater`), and
  * scanline unfiltering (filter types 0–4: None/Sub/Up/Average/Paeth, PNG
  * spec §9) is pure byte arithmetic. Supports the full non-palette
  * family: bit depth 8 or 16, color types 0 (gray) / 2 (RGB) / 6 (RGBA),
  * multi-IDAT streams, and Adam7 interlacing (each pass unfiltered as its
  * own sub-image; the stats are position-independent, so no pixel
  * placement pass is needed). Output: image geometry plus per-channel
  * sum/min/max over all pixels (16-bit samples are big-endian per spec;
  * means are left to the caller as exact `sum / (w·h)` rationals). NULL
  * for anything else — unrecognized bytes, palette images, undecodable
  * streams.
  *
  * One native expression per row inside whole-stage codegen, like
  * [[PcmStats]]: a narrow projection over the binary column, no UDF
  * boundary, no row amplification. The decode buffer is bounded
  * (`MaxRawBytes`) so a corrupt header can never allocate unboundedly —
  * at 100 TB a poisoned blob must fail to NULL, not OOM an executor. */
case class PngPixelStats(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true

  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("depth", IntegerType, nullable = false),
    StructField("ch_sum", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("ch_min", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("ch_max", ArrayType(IntegerType, containsNull = false), nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"png_pixel_stats requires binary, got $other")
  }

  override protected def nullSafeEval(a: Any): Any =
    PngPixelStats.parse(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("png")
      s"""
         |InternalRow $r = graft.functions.PngPixelStats.parse($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PngPixelStats {

  /** Cap on the unfiltered scanline buffer (64 MiB ≈ a 4096×4096 RGBA
    * image): a forged IHDR declaring huge dims must return NULL before
    * allocating, not after. */
  private val MaxRawBytes = 1 << 26

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Adam7 pass grid: (xStart, yStart, xStep, yStep) per pass, spec §8.2. */
  private val Adam7: Array[(Long, Long, Long, Long)] = Array(
    (0L, 0L, 8L, 8L), (4L, 0L, 8L, 8L), (0L, 4L, 4L, 8L), (2L, 0L, 4L, 4L),
    (0L, 2L, 2L, 4L), (1L, 0L, 2L, 2L), (0L, 1L, 1L, 2L))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    b(i) == s.charAt(0) && b(i + 1) == s.charAt(1) &&
      b(i + 2) == s.charAt(2) && b(i + 3) == s.charAt(3)

  /** Fully decoded (unfiltered, deinterlaced-in-stream-order) PNG pixel
    * stream plus its geometry — the shared product of the chunk walk +
    * inflate + unfilter pipeline, consumed by [[PngPixelStats]] (channel
    * stats) and [[PngAHash64]]/[[PngDHash64]] (perceptual grid hashes).
    * `raw` holds filter-byte-prefixed scanlines per sub-image, already
    * reconstructed; `subImages` is one (w,h) for plain images or the
    * present Adam7 pass dims for interlaced ones. */
  private[functions] final class DecodedPng(
      val w: Int, val h: Int, val ch: Int, val bps: Int,
      val raw: Array[Byte], val subImages: Array[(Int, Int)])

  /** `(width, height, channels, depth, ch_sum[], ch_min[], ch_max[])`
    * decoded from a supported PNG payload, or null. Stats accumulate over
    * the [[decode]]d sample stream in stream order — identical values to
    * the historical fused unfilter+stats pass (sums are commutative,
    * min/max order-free). */
  def parse(b: Array[Byte]): InternalRow = {
    val d = decode(b)
    if (d == null) return null
    val (sums, mins, maxs) = statsArrays(d)
    InternalRow(d.w, d.h, d.ch, d.bps * 8,
      new GenericArrayData(sums), new GenericArrayData(mins), new GenericArrayData(maxs))
  }

  /** Per-channel (sum, min, max) over an already-decoded sample stream —
    * shared by [[parse]] and the fused battery kernel
    * ([[ImageSignalsKernel]]) so one decode serves both. */
  private[functions] def statsArrays(
      d: DecodedPng): (Array[Long], Array[Int], Array[Int]) = {
    val ch = d.ch
    val bps = d.bps
    val sums = new Array[Long](ch)
    val mins = Array.fill(ch)(if (bps == 1) 255 else 65535)
    val maxs = new Array[Int](ch)
    val raw = d.raw
    var off = 0
    var si = 0
    while (si < d.subImages.length) {
      val (wp, hp) = d.subImages(si)
      val stride = 1 + wp * ch * bps
      var r = 0
      while (r < hp) {
        val base = off + r * stride + 1
        var s = 0
        val nSamples = wp * ch
        while (s < nSamples) {
          val at = base + s * bps
          val v = if (bps == 1) u8(raw, at) else (u8(raw, at) << 8) | u8(raw, at + 1)
          val c = s % ch
          sums(c) += v
          if (v < mins(c)) mins(c) = v
          if (v > maxs(c)) maxs(c) = v
          s += 1
        }
        r += 1
      }
      off += hp * stride
      si += 1
    }
    (sums, mins, maxs)
  }

  /** Decode a supported PNG payload to its unfiltered sample stream
    * (see [[PngPixelStats.DecodedPng]]), or null for anything malformed /
    * unsupported — shared by the stats and perceptual-hash expressions. */
  private[functions] def decode(b: Array[Byte]): DecodedPng = {
    // signature + IHDR (required first chunk, len 13)
    if (b.length < 45) return null
    var i = 0
    while (i < 8) { if (b(i) != PngSig(i)) return null; i += 1 }
    if (be32(b, 8) != 13L || !tag(b, 12, "IHDR")) return null
    val w = be32(b, 16)
    val h = be32(b, 20)
    val bitDepth = u8(b, 24)
    val colorType = u8(b, 25)
    // cap each DIMENSION before any multiplication: be32 values reach
    // 2^32-1, and h*(1+w*ch*bps) on unchecked Longs could wrap past 2^63
    // on a forged IHDR (w,h ≤ 2^26 bounds the product at ~2^55 — no
    // overflow)
    val interlace = u8(b, 28)
    if (w <= 0 || h <= 0 || w > MaxRawBytes || h > MaxRawBytes ||
      (bitDepth != 8 && bitDepth != 16) ||
      u8(b, 26) != 0 || u8(b, 27) != 0 || interlace > 1) return null
    val ch = colorType match {
      case 0 => 1
      case 2 => 3
      case 6 => 4
      case _ => return null // palette / alpha-gray not supported
    }
    val bps = bitDepth / 8 // bytes per sample (16-bit samples are big-endian)
    val bpp = ch * bps
    // the raw stream is a sequence of (wp, hp) sub-images: one for the
    // whole frame, or the 7 Adam7 passes when interlaced (each pixel
    // appears in exactly one pass).
    val subImages: Array[(Int, Int)] =
      if (interlace == 0) Array((w.toInt, h.toInt))
      else Adam7.filter { case (xs, ys, _, _) => w > xs && h > ys }
        .map { case (xs, ys, xStep, yStep) =>
          (((w - xs + xStep - 1) / xStep).toInt, ((h - ys + yStep - 1) / yStep).toInt)
        }
    var rawLen = 0L
    subImages.foreach { case (wp, hp) => rawLen += hp * (1L + wp.toLong * bpp) }
    if (rawLen > MaxRawBytes) return null

    // chunk walk: concatenate every IDAT's data (the spec allows splitting
    // the one zlib stream across any number of IDAT chunks); CRCs are not
    // validated (same contract as ImageDims/AudioMeta)
    val idat = new java.io.ByteArrayOutputStream()
    var pos = 33L
    var done = false
    while (!done && pos + 8 <= b.length) {
      val at = pos.toInt
      val len = be32(b, at)
      if (pos + 8 + len > b.length) done = true // truncated chunk: stop
      else {
        if (tag(b, at + 4, "IDAT")) idat.write(b, at + 8, len.toInt)
        else if (tag(b, at + 4, "IEND")) done = true
        pos += 12L + len // length + type + data + crc
      }
    }
    val z = idat.toByteArray
    // zlib wrapper: deflate method, no preset dictionary; inflate RAW
    // (nowrap) past the 2-byte header so the trailing Adler32 is not
    // required — works for both stored-block fixtures and real streams
    if (z.length < 3 || (z(0) & 0x0f) != 8 || (z(1) & 0x20) != 0) return null
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(z, 2, z.length - 2)
      var got = 0
      var n = 1
      while (n > 0 && got < raw.length) {
        n = inf.inflate(raw, got, raw.length - got)
        got += n
      }
      if (got < raw.length) return null // truncated pixel stream
    } catch {
      case _: java.util.zip.DataFormatException => return null
    } finally inf.end()

    // per sub-image: unfilter in place (PNG spec §9: a/b/c are the
    // RECONSTRUCTED left / above / upper-left bytes; out-of-frame = 0;
    // filters operate BYTEWISE at any depth, offset by bpp bytes, and
    // each interlace pass filters against ITS OWN scanlines only)
    var off = 0
    var si = 0
    while (si < subImages.length) {
      val (wp, hp) = subImages(si)
      val rb = wp * bpp
      val stride = 1 + rb
      var r = 0
      while (r < hp) {
        val base = off + r * stride + 1
        val prev = base - stride
        val f = u8(raw, base - 1)
        if (f > 4) return null
        if (f != 0) {
          var x = 0
          while (x < rb) {
            val a = if (x >= bpp) u8(raw, base + x - bpp) else 0
            val up = if (r > 0) u8(raw, prev + x) else 0
            val ul = if (r > 0 && x >= bpp) u8(raw, prev + x - bpp) else 0
            val add = f match {
              case 1 => a
              case 2 => up
              case 3 => (a + up) >> 1
              case _ => // Paeth predictor
                val p = a + up - ul
                val pa = math.abs(p - a)
                val pb = math.abs(p - up)
                val pc = math.abs(p - ul)
                if (pa <= pb && pa <= pc) a else if (pb <= pc) up else ul
            }
            raw(base + x) = ((u8(raw, base + x) + add) & 0xff).toByte
            x += 1
          }
        }
        r += 1
      }
      off += hp * stride
      si += 1
    }
    new DecodedPng(w.toInt, h.toInt, ch, bps, raw, subImages)
  }
}

/** 64-bit average-hash (aHash) of a decodable PNG — the classic perceptual
  * image fingerprint: partition the image into an 8×8 grid (cell of pixel
  * (x,y) is `(y·8/h, x·8/w)` by integer floor — exact, no resampling
  * kernel, so any engine can reproduce it bit-for-bit), per-cell mean luma
  * (luma = sum of the non-alpha channel samples — integer-exact), bit set
  * iff the cell is non-empty AND its mean exceeds the image mean (compared
  * by integer cross-multiplication `cellSum·n > totalSum·cellCnt`, never
  * floating division). Bit `b = row·8+col` lands at position `63−b`, so
  * `lpad(bin(hash),64,'0')` reads row-major. Near-identical images differ
  * in a few bits; Hamming-banded pairing rides the existing
  * [[graft.ops.Dedup.simhashPairs]] pigeonhole machinery.
  *
  * NULL for undecodable payloads, interlaced images (the stream order of
  * Adam7 loses pixel positions), and images over 2²⁰ pixels (keeps every
  * cross-multiplication inside Long — ~2⁵⁸ max; hash downsampled/thumb
  * variants of larger assets instead). One native expression per row in
  * whole-stage codegen, like [[PngPixelStats]]. */
case class PngAHash64(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"png_ahash64 requires binary, got $other")
  }

  override protected def nullSafeEval(a: Any): Any =
    PngGridHash.aHash(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("ah")
      s"""
         |Long $r = graft.functions.PngGridHash.aHash($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit difference-hash (dHash) sibling of [[PngAHash64]]: a 9-column ×
  * 8-row grid (col of pixel x is `x·9/w`), bit `b = row·8+col` set iff
  * `mean(cell[row][col]) > mean(cell[row][col+1])` by integer
  * cross-multiplication (an empty cell on either side ⇒ products 0 > 0 ⇒
  * bit 0 — deterministic for tiny images). Captures horizontal gradient
  * structure, complementary to aHash's brightness profile; same NULL
  * contract. */
case class PngDHash64(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"png_dhash64 requires binary, got $other")
  }

  override protected def nullSafeEval(a: Any): Any =
    PngGridHash.dHash(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("dh")
      s"""
         |Long $r = graft.functions.PngGridHash.dHash($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PngGridHash {

  /** Hash expressions refuse images past this pixel count so every
    * `sum·count` cross-multiplication stays inside Long (sum ≤
    * 3·65535·2²⁰ ≈ 2³⁷·⁶, count ≤ 2²⁰ → ≤ 2⁵⁸). */
  private val MaxPixels = 1 << 20

  /** Per-grid-cell luma sums and pixel counts of a decoded non-interlaced
    * PNG, cells row-major over a `gw`×`gh` grid; null when unsupported. */
  private def gridLuma(b: Array[Byte], gw: Int, gh: Int): (Array[Long], Array[Long]) =
    gridLumaFromDecoded(PngPixelStats.decode(b), gw, gh)

  /** aHash of an ALREADY-decoded PNG — the fused battery kernel
    * ([[ImageSignalsKernel]]) hashes the same decode its stats walked;
    * same NULL contract as [[aHash]] (interlaced / oversized refuse). */
  private[functions] def aHashFromDecoded(
      d: PngPixelStats.DecodedPng): java.lang.Long = {
    val g = gridLumaFromDecoded(d, 8, 8)
    if (g == null) null else aHashFromGrid(g._1, g._2)
  }

  private def gridLumaFromDecoded(
      d: PngPixelStats.DecodedPng, gw: Int, gh: Int): (Array[Long], Array[Long]) = {
    if (d == null || d.subImages.length != 1) return null
    val w = d.w; val h = d.h
    if (w.toLong * h > MaxPixels) return null
    val ch = d.ch; val bps = d.bps
    val lumaCh = math.min(ch, 3) // alpha excluded
    val sums = new Array[Long](gw * gh)
    val cnts = new Array[Long](gw * gh)
    val raw = d.raw
    val stride = 1 + w * ch * bps
    var y = 0
    while (y < h) {
      val base = y * stride + 1
      val row = y * gh / h
      var x = 0
      while (x < w) {
        val at = base + x * ch * bps
        var luma = 0L
        var c = 0
        while (c < lumaCh) {
          val sAt = at + c * bps
          luma += (if (bps == 1) raw(sAt) & 0xff
                   else ((raw(sAt) & 0xff) << 8) | (raw(sAt + 1) & 0xff))
          c += 1
        }
        val cell = row * gw + x * gw / w
        sums(cell) += luma
        cnts(cell) += 1
        x += 1
      }
      y += 1
    }
    (sums, cnts)
  }

  /** Bit assembly of the 8×8 aHash from grid luma sums/counts — shared
    * with the JPEG path ([[ImageGridHash]]) so the comparison convention
    * can never diverge between codecs. */
  private[functions] def aHashFromGrid(sums: Array[Long], cnts: Array[Long]): java.lang.Long = {
    var totalSum = 0L; var totalCnt = 0L
    var i = 0
    while (i < 64) { totalSum += sums(i); totalCnt += cnts(i); i += 1 }
    var hash = 0L
    i = 0
    while (i < 64) {
      if (cnts(i) > 0 && sums(i) * totalCnt > totalSum * cnts(i))
        hash |= 1L << (63 - i)
      i += 1
    }
    java.lang.Long.valueOf(hash)
  }

  /** Bit assembly of the 9×8 dHash, shared like [[aHashFromGrid]]. */
  private[functions] def dHashFromGrid(sums: Array[Long], cnts: Array[Long]): java.lang.Long = {
    var hash = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        val i = r * 9 + c
        if (sums(i) * cnts(i + 1) > sums(i + 1) * cnts(i))
          hash |= 1L << (63 - (r * 8 + c))
        c += 1
      }
      r += 1
    }
    java.lang.Long.valueOf(hash)
  }

  def aHash(b: Array[Byte]): java.lang.Long = {
    val g = gridLuma(b, 8, 8)
    if (g == null) return null
    aHashFromGrid(g._1, g._2)
  }

  def dHash(b: Array[Byte]): java.lang.Long = {
    val g = gridLuma(b, 9, 8)
    if (g == null) return null
    dHashFromGrid(g._1, g._2)
  }
}

/** MP4 / ISO-BMFF video container metadata parsing — the video-modality
  * sibling of [[ImageDims]]/[[AudioMeta]]: the container is a tree of boxes
  * (`size:be32 type:4 payload` — size 1 ⇒ a 64-bit largesize follows, size 0
  * ⇒ the box runs to EOF, per ISO/IEC 14496-12 §4.2), and the metadata a
  * catalog needs lives in a handful of them: `ftyp`'s major brand, `mvhd`'s
  * movie timescale/duration (version 0 and 1 layouts), the `trak` count,
  * and — from the first VIDEO track (`mdia/hdlr` handler `vide`) — the
  * `tkhd` presentation dims (16.16 fixed-point). Boxes may appear in any
  * order at each level; unknown boxes are skipped by size, never assumed
  * away. Anything malformed (truncated box, size smaller than its own
  * header, missing moov/mvhd) yields NULL, never a throw.
  *
  * One native expression per row inside whole-stage codegen: only the moov
  * subtree's bytes are touched (mdat — virtually all of a real file — is
  * skipped by its size field), so at 100 TB this is a narrow projection
  * whose cost is independent of payload size.
  */
case class VideoMeta(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true // not an ISO-BMFF payload → NULL

  override def dataType: DataType = StructType(Seq(
    StructField("brand", StringType, nullable = false),
    StructField("timescale", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("n_tracks", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("handler", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"video_meta requires binary, got $other")
  }

  override protected def nullSafeEval(a: Any): Any =
    VideoMeta.parse(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("vmeta")
      s"""
         |InternalRow $r = graft.functions.VideoMeta.parse($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VideoMeta {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1).toLong << 16) |
      (u8(b, i + 2).toLong << 8) | u8(b, i + 3).toLong
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    b(i) == s.charAt(0) && b(i + 1) == s.charAt(1) &&
      b(i + 2) == s.charAt(2) && b(i + 3) == s.charAt(3)
  private def ascii4(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  /** Box header at `at` within `[at, end)` → (payloadStart, boxEnd), or
    * null when the header is truncated / the size is inconsistent. Sizes
    * are unsigned 32-bit (Long math throughout — a forged size near 2³²
    * must fail the bounds check, not wrap negative). */
  private[functions] def box(b: Array[Byte], at: Long, end: Long): Array[Long] = {
    if (at + 8 > end) return null
    val i = at.toInt
    var size = be32(b, i)
    var hdr = 8L
    if (size == 1L) {
      if (at + 16 > end) return null
      size = be64(b, i + 8)
      hdr = 16L
    } else if (size == 0L) size = end - at // last box runs to EOF
    // `size > end - at`, NOT `at + size > end`: a forged largesize near
    // 2^63 at a nonzero offset would overflow the addition negative and
    // slip past the bound (negative boxEnd → runaway walk / AIOOBE)
    if (size < hdr || size > end - at) return null
    Array(at + hdr, at + size)
  }

  private final class Track {
    var width: Int = 0
    var height: Int = 0
    var handler: String = "none"
  }

  /** tkhd (v0/v1): presentation width/height, 16.16 fixed-point. */
  private def readTkhd(b: Array[Byte], p: Long, end: Long, t: Track): Unit = {
    if (p + 4 > end) return
    val v = u8(b, p.toInt)
    // v0: vf4 ctime4 mtime4 tid4 res4 dur4 res8 layer2 alt2 vol2 res2 mat36 w4 h4
    // v1: vf4 ctime8 mtime8 tid4 res4 dur8 res8 layer2 alt2 vol2 res2 mat36 w4 h4
    val wOff = if (v == 1) 88L else 76L
    if (p + wOff + 8 > end) return
    t.width = (be32(b, (p + wOff).toInt) >> 16).toInt
    t.height = (be32(b, (p + wOff + 4).toInt) >> 16).toInt
  }

  private def readHdlr(b: Array[Byte], p: Long, end: Long, t: Track): Unit =
    if (p + 12 <= end) t.handler = ascii4(b, (p + 8).toInt)

  /** `(brand, timescale, duration_ms, n_tracks, width, height, handler)`
    * from an ISO-BMFF (MP4/MOV) payload, or null when the bytes are not a
    * well-formed container with a moov/mvhd. Dims/handler come from the
    * first `vide` track, falling back to the first track of any kind. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 16) return null
    val len = b.length.toLong
    var brand = "unknown"
    var moovP = -1L
    var moovEnd = -1L
    var i = 0L
    var sawBox = false
    while (i + 8 <= len) {
      val h = box(b, i, len)
      if (h == null) return null // truncated / inconsistent top-level box
      sawBox = true
      val at = i.toInt
      if (tag(b, at + 4, "ftyp") && h(0) + 4 <= h(1)) brand = ascii4(b, h(0).toInt)
      else if (tag(b, at + 4, "moov")) { moovP = h(0); moovEnd = h(1) }
      i = h(1)
    }
    if (!sawBox || moovP < 0) return null
    var timescale = 0L
    var duration = 0L
    var nTracks = 0
    var video: Track = null
    var first: Track = null
    var j = moovP
    while (j + 8 <= moovEnd) {
      val h = box(b, j, moovEnd)
      if (h == null) return null
      val at = j.toInt
      if (tag(b, at + 4, "mvhd")) {
        val p = h(0)
        if (p + 4 <= h(1)) {
          val v = u8(b, p.toInt)
          if (v == 1 && p + 32 <= h(1)) {
            timescale = be32(b, (p + 20).toInt)
            duration = be64(b, (p + 24).toInt)
          } else if (v == 0 && p + 20 <= h(1)) {
            timescale = be32(b, (p + 12).toInt)
            duration = be32(b, (p + 16).toInt)
          }
        }
      } else if (tag(b, at + 4, "trak")) {
        nTracks += 1
        val t = new Track
        var k = h(0)
        while (k + 8 <= h(1)) {
          val th = box(b, k, h(1))
          if (th == null) return null
          val kat = k.toInt
          if (tag(b, kat + 4, "tkhd")) readTkhd(b, th(0), th(1), t)
          else if (tag(b, kat + 4, "mdia")) {
            var m = th(0)
            while (m + 8 <= th(1)) {
              val mh = box(b, m, th(1))
              if (mh == null) return null
              if (tag(b, m.toInt + 4, "hdlr")) readHdlr(b, mh(0), mh(1), t)
              m = mh(1)
            }
          }
          k = th(1)
        }
        if (first == null) first = t
        if (video == null && t.handler == "vide") video = t
      }
      j = h(1)
    }
    // duration > MaxValue/1000 would overflow the ms conversion negative
    if (timescale <= 0 || timescale > Int.MaxValue ||
      duration < 0 || duration > Long.MaxValue / 1000L) return null
    val pick = if (video != null) video else first
    val durationMs = duration * 1000L / timescale
    InternalRow(
      UTF8String.fromString(brand), timescale.toInt, durationMs, nTracks,
      if (pick != null) pick.width else 0,
      if (pick != null) pick.height else 0,
      UTF8String.fromString(if (pick != null) pick.handler else "none"))
  }
}

/** 64-bit CONTAINER fingerprint of an ISO-BMFF video — honestly a
  * container-level signature, not a content hash: the bits derive from
  * the first video track's `stsz` sample-SIZE contour (65 equal windows
  * of `L = n/65` samples, window sums of encoded-sample byte sizes, bit
  * `b` at `63−b` set iff `sum(b) > sum(b+1)` — exactly the
  * [[PcmEnvelopeHash64]] convention one modality over). Encoded sample
  * sizes survive re-muxing, brand changes, metadata edits, and
  * re-hosting (the `mdat` bytes and their `stsz` index move verbatim
  * between containers), so byte-different re-muxed copies fingerprint
  * identically and dedup through [[graft.ops.Dedup.hammingPairs64]];
  * a RE-ENCODE changes every sample size and is out of scope by design
  * (document the gap, don't fake it with pixel claims).
  *
  * Track selection mirrors [[VideoMeta]]: the first `vide`-handler track,
  * falling back to the first track with a sample table. NULL for
  * non-ISO-BMFF payloads, tracks without a parseable `stsz`, fewer than
  * 65 samples (too short to contour), ALL fixed-sample-size tables
  * (`sample_size != 0`: every window sums the same, the contour carries
  * zero bits of information and would hash every unrelated fixed-size
  * video to the constant 0 — a false-positive merge class), and guards
  * against forged counts
  * (`sample_count` capped at 2²⁰ — window sums stay far inside Long). */
case class VideoSampleHash64(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"video_sample_hash64 requires binary, got $other")
  }

  override protected def nullSafeEval(a: Any): Any =
    VideoSampleHash64.compute(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("vsh")
      s"""
         |Long $r = graft.functions.VideoSampleHash64.compute($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VideoSampleHash64 {

  /** Forged-count guard: sample tables past this are rejected, keeping
    * every window sum under 2²⁰·2³² < 2⁵³. */
  private val MaxSamples = 1 << 20

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1).toLong << 16) |
      (u8(b, i + 2).toLong << 8) | u8(b, i + 3).toLong
  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    b(i) == s.charAt(0) && b(i + 1) == s.charAt(1) &&
      b(i + 2) == s.charAt(2) && b(i + 3) == s.charAt(3)

  /** Walk `[p, end)` for the first child box named `name`; null if absent.
    * Returns (payloadStart, boxEnd). */
  private def find(b: Array[Byte], p0: Long, end: Long, name: String): Array[Long] = {
    var p = p0
    while (p + 8 <= end) {
      val h = VideoMeta.box(b, p, end)
      if (h == null) return null
      if (tag(b, p.toInt + 4, name)) return h
      p = h(1)
    }
    null
  }

  def compute(b: Array[Byte]): java.lang.Long = {
    if (b == null || b.length < 16) return null
    val len = b.length.toLong
    // top level: locate moov (tolerate anything else, as VideoMeta does)
    var moov: Array[Long] = null
    var i = 0L
    while (i + 8 <= len && moov == null) {
      val h = VideoMeta.box(b, i, len)
      if (h == null) return null
      if (tag(b, i.toInt + 4, "moov")) moov = h
      i = h(1)
    }
    if (moov == null) return null
    // per trak: handler + stsz location; prefer the first 'vide' track,
    // fall back to the first track owning a sample table
    var pick: Array[Long] = null // stsz payload bounds of the chosen track
    var pickIsVide = false
    var t = moov(0)
    while (t + 8 <= moov(1) && !pickIsVide) {
      val th = VideoMeta.box(b, t, moov(1))
      if (th == null) return null
      if (tag(b, t.toInt + 4, "trak")) {
        val mdia = find(b, th(0), th(1), "mdia")
        if (mdia != null) {
          val hdlr = find(b, mdia(0), mdia(1), "hdlr")
          val isVide = hdlr != null && hdlr(0) + 12 <= hdlr(1) &&
            tag(b, (hdlr(0) + 8).toInt, "vide")
          val minf = find(b, mdia(0), mdia(1), "minf")
          val stbl = if (minf == null) null else find(b, minf(0), minf(1), "stbl")
          val stsz = if (stbl == null) null else find(b, stbl(0), stbl(1), "stsz")
          if (stsz != null && (pick == null || isVide)) {
            pick = stsz
            pickIsVide = isVide
          }
        }
      }
      t = th(1)
    }
    if (pick == null) return null
    // stsz: version/flags(4) sample_size(4) sample_count(4) [entries(4·n)]
    val p = pick(0)
    if (p + 12 > pick(1)) return null
    val fixedSize = be32(b, (p + 4).toInt)
    val n = be32(b, (p + 8).toInt)
    if (n < 65L || n > MaxSamples) return null
    // fixed-size tables (sample_size != 0) carry ZERO contour information:
    // every window sums L·fixedSize, every adjacent comparison is equal,
    // and the hash degenerates to the constant 0L — which would pair every
    // unrelated fixed-size video at Hamming 0 with no confirming stage.
    // NULL instead (the <65-sample contract): no signal, no signature
    if (fixedSize != 0L) return null
    val L = n / 65L
    val e = new Array[Long](65)
    if (p + 12 + 4L * n > pick(1)) return null // truncated entry table
    var w = 0
    while (w < 65) {
      var k = w * L
      val kEnd = k + L
      var sum = 0L
      while (k < kEnd) {
        sum += be32(b, (p + 12 + 4 * k).toInt)
        k += 1
      }
      e(w) = sum
      w += 1
    }
    var hash = 0L
    var bb = 0
    while (bb < 64) {
      if (e(bb) > e(bb + 1)) hash |= 1L << (63 - bb)
      bb += 1
    }
    java.lang.Long.valueOf(hash)
  }
}

object MediaFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** `image_dims(payload)` — struct(format, width, height) parsed from PNG
    * IHDR / JPEG SOF header bytes; NULL for unrecognized payloads. */
  def imageDims(payload: Column): Column =
    ColumnBridge.column(ImageDims(ColumnBridge.expression(payload)))

  /** `audio_meta(payload)` — struct(format, sample_rate, channels, bits)
    * parsed from a RIFF/WAVE header; NULL for unrecognized payloads. */
  def audioMeta(payload: Column): Column =
    ColumnBridge.column(AudioMeta(ColumnBridge.expression(payload)))

  /** `pcm_stats(payload)` — struct(n_samples, peak, sum_sq, rms) decoded
    * from a PCM WAV's sample bytes; NULL for non-PCM-WAV payloads. */
  def pcmStats(payload: Column): Column =
    ColumnBridge.column(PcmStats(ColumnBridge.expression(payload)))

  /** `png_pixel_stats(payload)` — struct(width, height, channels, ch_sum,
    * ch_min, ch_max) decoded from a PNG payload's pixel data (inflate +
    * scanline unfilter); NULL for unsupported/undecodable payloads. */
  def pngPixelStats(payload: Column): Column =
    ColumnBridge.column(PngPixelStats(ColumnBridge.expression(payload)))

  /** `video_meta(payload)` — struct(brand, timescale, duration_ms, n_tracks,
    * width, height, handler) parsed from an ISO-BMFF (MP4/MOV) box tree;
    * NULL for unrecognized payloads. */
  def videoMeta(payload: Column): Column =
    ColumnBridge.column(VideoMeta(ColumnBridge.expression(payload)))

  /** `png_ahash64(payload)` — 64-bit average-hash perceptual fingerprint of
    * a decodable PNG (8×8 integer-grid luma-vs-mean bits); NULL for
    * undecodable / interlaced / over-2²⁰-pixel payloads. */
  def pngAHash64(payload: Column): Column =
    ColumnBridge.column(PngAHash64(ColumnBridge.expression(payload)))

  /** `png_dhash64(payload)` — 64-bit difference-hash sibling (9×8 grid,
    * horizontal luma gradient bits); same NULL contract. */
  def pngDHash64(payload: Column): Column =
    ColumnBridge.column(PngDHash64(ColumnBridge.expression(payload)))

  /** `pcm_envelope_hash64(payload)` — 64-bit loudness-contour fingerprint
    * of a PCM WAV (65 equal windows, adjacent-energy comparison bits);
    * NULL for undecodable / sub-65-sample payloads. */
  def pcmEnvelopeHash64(payload: Column): Column =
    ColumnBridge.column(PcmEnvelopeHash64(ColumnBridge.expression(payload)))

  /** `image_pixel_stats(payload)` — [[pngPixelStats]]'s struct over PNG
    * *or* baseline JPEG payloads (magic-byte dispatch to the matching
    * native decode); NULL for unrecognized/undecodable payloads. */
  def imagePixelStats(payload: Column): Column =
    ColumnBridge.column(ImagePixelStats(ColumnBridge.expression(payload)))

  /** `image_ahash64(payload)` — codec-dispatching aHash: identical grid
    * conventions over PNG or baseline JPEG, so cross-codec re-encodes of
    * the same pixels fingerprint identically; NULL contract per codec. */
  def imageAHash64(payload: Column): Column =
    ColumnBridge.column(ImageAHash64(ColumnBridge.expression(payload)))

  /** Fused single-decode quality-signal struct (width/height/n_px/aspect/
    * mean_luma/dyn_range/payload_bytes) — value-identical to the Column
    * derivation over [[imagePixelStats]] but ONE decode per row by
    * construction (see [[ImageSignalsKernel]]). */
  def imageSignalsStruct(payload: Column): Column =
    ColumnBridge.column(
      ImageSignalsKernel(ColumnBridge.expression(payload), withAHash = false))

  /** [[imageSignalsStruct]] plus the ladder's `ahash` field from the SAME
    * decode — the battery + perceptual-hash surfaces pay one codec pass
    * instead of two. */
  def imageSignalsWithAHash(payload: Column): Column =
    ColumnBridge.column(
      ImageSignalsKernel(ColumnBridge.expression(payload), withAHash = true))

  /** `image_dhash64(payload)` — codec-dispatching dHash sibling. */
  def imageDHash64(payload: Column): Column =
    ColumnBridge.column(ImageDHash64(ColumnBridge.expression(payload)))

  /** `video_sample_hash64(payload)` — 64-bit container fingerprint over
    * the first video track's stsz sample-size contour (re-mux-invariant;
    * NOT a content hash — re-encodes change every size); NULL for
    * unparseable containers / missing stsz / under 65 samples. */
  def videoSampleHash64(payload: Column): Column =
    ColumnBridge.column(VideoSampleHash64(ColumnBridge.expression(payload)))

  /** `audio_container_meta(payload)` — struct(container, codec,
    * sample_rate, channels, bits_per_sample, duration_ms, bitrate_kbps,
    * frames, vbr, tag_bytes) parsed from an MP3 (MPEG frame walk +
    * ID3v2), FLAC (STREAMINFO), or Ogg Vorbis/Opus (id header + final
    * granule) payload — the compressed-audio sibling of [[videoMeta]];
    * NULL for unrecognized payloads (PCM WAV stays with [[audioMeta]]). */
  def audioContainerMeta(payload: Column): Column =
    ColumnBridge.column(AudioContainerMeta(ColumnBridge.expression(payload)))
}
