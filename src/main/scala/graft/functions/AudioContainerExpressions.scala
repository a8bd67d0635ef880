package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compressed-audio CONTAINER metadata parsing — the audio sibling of
  * [[VideoMeta]], and the answer to "what is most crawl audio, actually":
  * MP3 (MPEG audio elementary streams, with or without an ID3v2 tag),
  * FLAC, and Ogg (Vorbis / Opus). [[AudioMeta]]/[[PcmStats]] fully decode
  * PCM WAV; these formats would need entropy/transform codecs for sample
  * access, but a catalog's questions — codec, sample rate, channels,
  * duration, bitrate, tag size — live in fixed header structures that
  * byte arithmetic reaches directly, the same honest meta-level scope as
  * the MP4 `stsz` walk. Everything here derives from public
  * specifications: the MPEG audio frame header (ISO/IEC 11172-3 §2.4.1.3;
  * 13818-3 for the MPEG-2 lower-sampling-frequency extension), the ID3v2
  * tag header (id3.org, v2.2–v2.4: "ID3" + version + flags + 28-bit
  * syncsafe size), the FLAC STREAMINFO metadata block (xiph.org FLAC
  * format §METADATA_BLOCK_STREAMINFO), the Ogg page header (RFC 3533 §6),
  * the Vorbis identification header (Vorbis I spec §4.2.2), and the Opus
  * ID header (RFC 7845 §5.1).
  *
  * Scope boundaries, chosen for determinism and honesty:
  *  - MP3 frames are WALKED (count, per-frame bitrate, samples), so
  *    duration is exact for the stream the walk accepts; `vbr` is
  *    frame-header variance (Xing/VBRI sidecar headers are NOT parsed —
  *    the walk already visits every frame, so the sidecar adds nothing).
  *    Detection requires the first frame's computed length to land on
  *    EOF, an ID3v1 `TAG` trailer, or another valid frame header —
  *    a lone spurious sync in random bytes is rejected, a real stream
  *    with trailing junk after ≥2 frames is accepted.
  *  - Ogg page CRCs are NOT verified (catalog parse, not an integrity
  *    checker); duration comes from the LAST page's granule position
  *    (Vorbis: PCM samples at the id header's rate; Opus: 48 kHz samples
  *    minus pre-skip, per RFC 7845 §4), which is the defined meaning of
  *    granule for both codecs. Chained Ogg streams report the final
  *    chain link's granule against the FIRST link's id header — out of
  *    scope, like multi-edit MP4s for [[VideoMeta]].
  *  - FLAC reports STREAMINFO only (total samples may legally be 0 =
  *    unknown → duration 0); audio frames are not walked.
  *
  * One native expression per row inside whole-stage codegen; only header
  * bytes and 4-byte frame headers are touched (frame payloads are skipped
  * by their computed length), so the projection cost is frame-COUNT-, not
  * byte-, proportional for MP3 and O(pages) for Ogg. Anything malformed
  * yields NULL, never a throw.
  */
case class AudioContainerMeta(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true // not MP3/FLAC/Ogg → NULL

  override def dataType: DataType = StructType(Seq(
    StructField("container", StringType, nullable = false),
    StructField("codec", StringType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits_per_sample", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("bitrate_kbps", IntegerType, nullable = false),
    StructField("frames", LongType, nullable = false),
    StructField("vbr", BooleanType, nullable = false),
    StructField("tag_bytes", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"audio_container_meta requires binary, got $other")
  }

  override protected def nullSafeEval(a: Any): Any =
    AudioContainerMeta.parse(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("ameta")
      s"""
         |InternalRow $r = graft.functions.AudioContainerMeta.parse($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AudioContainerMeta {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1).toLong << 16) |
      (u8(b, i + 2).toLong << 8) | u8(b, i + 3).toLong
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def le64(b: Array[Byte], i: Int): Long = le32(b, i) | (le32(b, i + 4) << 32)

  private def row(container: String, codec: String, sr: Int, ch: Int, bps: Int,
      durMs: Long, kbps: Int, frames: Long, vbr: Boolean, tag: Long): InternalRow =
    InternalRow(UTF8String.fromString(container), UTF8String.fromString(codec),
      sr, ch, bps, durMs, kbps, frames, vbr, tag)

  // ---- MPEG audio (ISO/IEC 11172-3 table B.2; 13818-3 LSF rates) ----
  // bitrate tables in kbps, indexed [versionGroup][layer][index]; index 0 is
  // "free format" and 15 is forbidden — both stop the walk. versionGroup
  // 0 = MPEG-1, 1 = MPEG-2/2.5 (which share one table per layer).
  private val BitrateV1L1 =
    Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448, 0)
  private val BitrateV1L2 =
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384, 0)
  private val BitrateV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0)
  private val BitrateV2L1 =
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256, 0)
  private val BitrateV2L23 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0)
  // sample rates by version: index 3 is reserved
  private val SrV1 = Array(44100, 48000, 32000, 0)
  private val SrV2 = Array(22050, 24000, 16000, 0)
  private val SrV25 = Array(11025, 12000, 8000, 0)

  /** Decoded MPEG frame header: (versionCode, layer, kbps, sampleRate,
    * samplesPerFrame, frameBytes, channels) or null when any field is
    * reserved/free/forbidden. versionCode: 10 = MPEG-1, 20 = MPEG-2,
    * 25 = MPEG-2.5 (so codec strings render without floats). */
  private def mpegHeader(b: Array[Byte], i: Int): Array[Int] = {
    if (i + 4 > b.length) return null
    if (u8(b, i) != 0xff || (u8(b, i + 1) & 0xe0) != 0xe0) return null
    val verBits = (u8(b, i + 1) >> 3) & 3 // 00=2.5 01=res 10=2 11=1
    val layerBits = (u8(b, i + 1) >> 1) & 3 // 01=III 10=II 11=I
    if (verBits == 1 || layerBits == 0) return null
    val brIdx = (u8(b, i + 2) >> 4) & 15
    val srIdx = (u8(b, i + 2) >> 2) & 3
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return null
    val pad = (u8(b, i + 2) >> 1) & 1
    val mode = (u8(b, i + 3) >> 6) & 3 // 11 = single channel
    val layer = 4 - layerBits // 1, 2, 3
    val ver = verBits match { case 3 => 10; case 2 => 20; case _ => 25 }
    val sr = (if (ver == 10) SrV1 else if (ver == 20) SrV2 else SrV25)(srIdx)
    val kbps = (if (ver == 10) {
      if (layer == 1) BitrateV1L1 else if (layer == 2) BitrateV1L2 else BitrateV1L3
    } else {
      if (layer == 1) BitrateV2L1 else BitrateV2L23
    })(brIdx)
    // samples per frame: L1 = 384; L2 = 1152; L3 = 1152 (MPEG-1) / 576 (LSF)
    val spf = if (layer == 1) 384 else if (layer == 2) 1152
      else if (ver == 10) 1152 else 576
    // frame length: L1 counts 4-byte slots; L2/L3 count bytes (spf/8 slots)
    val len = if (layer == 1) (12000 * kbps / sr + pad) * 4
      else spf / 8 * 1000 * kbps / sr + pad
    if (len < 4) return null
    Array(ver, layer, kbps, sr, spf, len, if (mode == 3) 1 else 2)
  }

  /** ID3v2 tag length at offset 0 (header + syncsafe size + optional
    * footer), or 0 when no tag is present. */
  private def id3v2Len(b: Array[Byte]): Long = {
    if (b.length < 10 || b(0) != 'I' || b(1) != 'D' || b(2) != '3') return 0L
    val flags = u8(b, 5)
    val size = ((u8(b, 6) & 0x7f).toLong << 21) | ((u8(b, 7) & 0x7f).toLong << 14) |
      ((u8(b, 8) & 0x7f).toLong << 7) | (u8(b, 9) & 0x7f).toLong
    10L + size + (if ((flags & 0x10) != 0) 10L else 0L) // footer flag
  }

  private def parseMp3(b: Array[Byte]): InternalRow = {
    val tag = id3v2Len(b)
    if (tag >= b.length) return null
    // scan for the first plausible frame header after the tag
    var i = tag.toInt
    var first: Array[Int] = null
    while (first == null && i + 4 <= b.length) {
      first = mpegHeader(b, i)
      if (first == null) i += 1
    }
    if (first == null) return null
    var frames = 0L
    var kbpsSum = 0L
    var samples = 0L
    var minKbps = Int.MaxValue
    var maxKbps = 0
    var pos = i
    var h = first
    var cleanEnd = false
    while (h != null) {
      frames += 1
      kbpsSum += h(2)
      samples += h(4)
      if (h(2) < minKbps) minKbps = h(2)
      if (h(2) > maxKbps) maxKbps = h(2)
      pos += h(5)
      if (pos + 4 > b.length ||
        (pos + 3 <= b.length && b(pos) == 'T' && b(pos + 1) == 'A' && b(pos + 2) == 'G')) {
        cleanEnd = true // EOF (a partial trailing frame counts) or ID3v1
        h = null
      } else h = mpegHeader(b, pos)
    }
    // reject the lone-spurious-sync case: one "frame" whose length lands
    // in the middle of bytes that are neither a frame nor a trailer
    if (!cleanEnd && frames < 2) return null
    val sr = first(3)
    val ver = first(0)
    val codec = (if (ver == 10) "mpeg1" else if (ver == 20) "mpeg2" else "mpeg2.5") +
      "-layer" + first(1)
    row("mp3", codec, sr, first(6), 0,
      samples * 1000L / sr, (kbpsSum / frames).toInt, frames, minKbps != maxKbps, tag)
  }

  // ---- FLAC (xiph.org format spec: METADATA_BLOCK_STREAMINFO) ----
  private def parseFlac(b: Array[Byte]): InternalRow = {
    if (b.length < 4 + 4 + 34) return null
    if (b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C') return null
    // STREAMINFO must be the first metadata block
    val btype = u8(b, 4) & 0x7f
    val blen = ((u8(b, 5) << 16) | (u8(b, 6) << 8) | u8(b, 7))
    if (btype != 0 || blen != 34 || 8 + 34 > b.length) return null
    val p = 8
    // packed 64 bits at p+10: sr(20) ch-1(3) bps-1(5) totalSamples(36)
    val sr = (u8(b, p + 10) << 12) | (u8(b, p + 11) << 4) | (u8(b, p + 12) >> 4)
    val ch = ((u8(b, p + 12) >> 1) & 7) + 1
    val bps = (((u8(b, p + 12) & 1) << 4) | (u8(b, p + 13) >> 4)) + 1
    val total = ((u8(b, p + 13) & 0xf).toLong << 32) | be32(b, p + 14)
    if (sr <= 0) return null // 0 is invalid for STREAMINFO sample rate
    row("flac", "flac", sr, ch, bps, total * 1000L / sr, 0, 0L, vbr = false, 0L)
  }

  // ---- Ogg (RFC 3533) with Vorbis-I / Opus (RFC 7845) id headers ----
  /** Page header at `at` → (dataStart, pageEnd, granule, headerType), or
    * null on truncation / wrong capture pattern. */
  private def oggPage(b: Array[Byte], at: Int): Array[Long] = {
    if (at + 27 > b.length) return null
    if (b(at) != 'O' || b(at + 1) != 'g' || b(at + 2) != 'g' || b(at + 3) != 'S' ||
      b(at + 4) != 0) return null
    val nseg = u8(b, at + 26)
    if (at + 27 + nseg > b.length) return null
    var dataLen = 0L
    var s = 0
    while (s < nseg) { dataLen += u8(b, at + 27 + s); s += 1 }
    val dataStart = at + 27 + nseg
    if (dataStart + dataLen > b.length) return null
    Array(dataStart.toLong, dataStart + dataLen, le64(b, at + 6), u8(b, at + 5).toLong)
  }

  private def strAt(b: Array[Byte], i: Int, s: String): Boolean =
    i + s.length <= b.length && s.indices.forall(k => b(i + k) == s.charAt(k))

  private def parseOgg(b: Array[Byte]): InternalRow = {
    val p0 = oggPage(b, 0)
    if (p0 == null) return null
    val id = p0(0).toInt
    var codec: String = null
    var sr = 0; var ch = 0; var kbps = 0; var preskip = 0L
    if (strAt(b, id, "OpusHead") && id + 19 <= p0(1)) {
      codec = "opus"
      ch = u8(b, id + 9)
      preskip = le16(b, id + 10).toLong
      sr = 48000 // Opus granules are defined at 48 kHz regardless of input rate
    } else if (id < b.length && b(id) == 1 && strAt(b, id + 1, "vorbis") &&
      id + 30 <= p0(1)) {
      codec = "vorbis" // id packet: type byte 0x01 then "vorbis" (spec 4.2.2)
      if (le32(b, id + 7) != 0L) return null // vorbis_version must be 0
      ch = u8(b, id + 11)
      sr = le32(b, id + 12).toInt
      kbps = (le32(b, id + 20) / 1000L).toInt // bitrate_nominal; 0/−1 → ≤0
      if (kbps < 0) kbps = 0
      if (sr <= 0 || ch <= 0) return null
    } else return null
    // walk pages to the end-of-stream granule
    var pages = 1L
    var granule = p0(2)
    var pos = p0(1).toInt
    while (pos + 27 <= b.length) {
      val pg = oggPage(b, pos)
      if (pg == null) return null // torn page: malformed, not "done"
      pages += 1
      if (pg(2) >= 0) granule = pg(2) // −1 = continuation page, no granule
      pos = pg(1).toInt
    }
    if (pos != b.length) return null
    val samples = if (codec == "opus") math.max(0L, granule - preskip) else granule
    row("ogg", codec, sr, ch, 0, samples * 1000L / sr, kbps, pages, vbr = false, 0L)
  }

  /** `(container, codec, sample_rate, channels, bits_per_sample,
    * duration_ms, bitrate_kbps, frames, vbr, tag_bytes)` — or null when
    * the payload is none of MP3 / FLAC / Ogg. */
  def parse(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 4) return null
    if (b(0) == 'f' && b(1) == 'L') parseFlac(b)
    else if (b(0) == 'O' && b(1) == 'g') parseOgg(b)
    else parseMp3(b) // ID3 probe + sync scan decide from here
  }
}
