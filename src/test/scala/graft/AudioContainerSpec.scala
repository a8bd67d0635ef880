package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.{AudioContainerMeta, MediaFunctions}

/** [[graft.functions.AudioContainerMeta]]: MP3 / FLAC / Ogg container
  * metadata. Two independent evidence lines, the codec-spec convention:
  * hand-assembled byte fixtures anchored to the public specs (MPEG frame
  * header per ISO 11172-3, ID3v2 per id3.org, STREAMINFO per the FLAC
  * spec, Ogg pages per RFC 3533, OpusHead per RFC 7845, Vorbis id per
  * Vorbis I §4.2.2), and the Column-algebra fixture builder
  * ([[graft.multimodal.Multimodal.compressedAudioFromDocuments]]) whose
  * doc-arithmetic round-trip is also what the q155 oracle replays. */
class AudioContainerSpec extends SparkSpecBase {

  private def parse(b: Array[Byte]): Row = {
    val ir = AudioContainerMeta.parse(b)
    if (ir == null) null
    else Row(ir.getUTF8String(0).toString, ir.getUTF8String(1).toString,
      ir.getInt(2), ir.getInt(3), ir.getInt(4), ir.getLong(5), ir.getInt(6),
      ir.getLong(7), ir.getBoolean(8), ir.getLong(9))
  }

  // ---- hand-assembled fixtures (spec-anchored, builder-independent) ----

  /** One MPEG-1 Layer III header: 0xFF 0xFB, bitrate/samplerate indices,
    * padding 0, mode from `mono`. */
  private def v1l3Header(brIdx: Int, srIdx: Int, mono: Boolean): Array[Byte] =
    Array(0xff.toByte, 0xfb.toByte, ((brIdx << 4) | (srIdx << 2)).toByte,
      (if (mono) 0xc0 else 0x00).toByte)

  private def v1l3Frame(brIdx: Int, srIdx: Int, mono: Boolean): Array[Byte] = {
    val kbps = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)(brIdx)
    val sr = Array(44100, 48000, 32000)(srIdx)
    val len = 144000 * kbps / sr
    v1l3Header(brIdx, srIdx, mono) ++ Array.fill[Byte](len - 4)(0x55)
  }

  test("MP3: two-frame CBR stream parses; duration/bitrate/channels exact") {
    val b = v1l3Frame(9, 0, mono = false) ++ v1l3Frame(9, 0, mono = false)
    val r = parse(b)
    assert(r == Row("mp3", "mpeg1-layer3", 44100, 2, 0,
      2L * 1152 * 1000 / 44100, 128, 2L, false, 0L))
  }

  test("MP3: mixed-bitrate frames report mean kbps and vbr=true") {
    val b = v1l3Frame(9, 1, mono = true) ++ v1l3Frame(11, 1, mono = true) ++
      v1l3Frame(9, 1, mono = true)
    val r = parse(b)
    // kbps 128,192,128 -> mean floor((128+192+128)/3) = 149
    assert(r == Row("mp3", "mpeg1-layer3", 48000, 1, 0,
      3L * 1152 * 1000 / 48000, 149, 3L, true, 0L))
  }

  test("MP3: ID3v2 tag is skipped and sized (incl. the footer flag)") {
    val frames = v1l3Frame(5, 0, mono = true) ++ v1l3Frame(5, 0, mono = true)
    val tag = Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 12) ++
      Array.fill[Byte](12)(0)
    val withTag = parse(tag ++ frames)
    assert(withTag.getLong(9) == 22L && withTag.getLong(7) == 2L)
    val footer = Array[Byte]('I', 'D', '3', 4, 0, 0x10, 0, 0, 0, 12) ++
      Array.fill[Byte](12 + 10)(0)
    assert(parse(footer ++ frames).getLong(9) == 32L)
  }

  test("MP3: a lone spurious sync is rejected; >=2 chained frames tolerate trailing junk") {
    // one valid header whose computed length lands mid-garbage: not MP3
    val junk = v1l3Header(9, 0, mono = false) ++ Array.fill[Byte](600)(0x13)
    assert(parse(junk) == null)
    // two real frames then garbage: accepted, frames=2
    val two = v1l3Frame(9, 0, mono = false) ++ v1l3Frame(9, 0, mono = false) ++
      Array.fill[Byte](37)(0x13)
    assert(parse(two).getLong(7) == 2L)
    // one real frame ending exactly at EOF: accepted (clean end)
    assert(parse(v1l3Frame(9, 0, mono = false)).getLong(7) == 1L)
    // one real frame then an ID3v1 trailer: accepted
    val v1tag = v1l3Frame(9, 0, mono = false) ++
      ("TAG" + "x" * 125).getBytes("US-ASCII")
    assert(parse(v1tag).getLong(7) == 1L)
  }

  private def flacBytes(sr: Int, ch: Int, bps: Int, total: Long,
      last: Boolean = true): Array[Byte] = {
    val hdr = Array[Byte]('f', 'L', 'a', 'C',
      (if (last) 0x80 else 0x00).toByte, 0, 0, 34)
    val info = new Array[Byte](34)
    info(0) = 0x10; info(2) = 0x10 // block sizes 4096
    info(10) = (sr >> 12).toByte
    info(11) = ((sr >> 4) & 0xff).toByte
    info(12) = (((sr & 0xf) << 4) | ((ch - 1) << 1) | ((bps - 1) >> 4)).toByte
    info(13) = ((((bps - 1) & 0xf) << 4) | ((total >> 32) & 0xf).toInt).toByte
    info(14) = ((total >> 24) & 0xff).toByte
    info(15) = ((total >> 16) & 0xff).toByte
    info(16) = ((total >> 8) & 0xff).toByte
    info(17) = (total & 0xff).toByte
    hdr ++ info
  }

  test("FLAC: STREAMINFO fields parse bit-exactly; total=0 means unknown duration") {
    assert(parse(flacBytes(44100, 2, 16, 441000L)) ==
      Row("flac", "flac", 44100, 2, 16, 10000L, 0, 0L, false, 0L))
    // 36-bit total: the high nibble in byte 13 must be read
    assert(parse(flacBytes(96000, 8, 24, (5L << 32) | 123L)).getLong(5) ==
      ((5L << 32) | 123L) * 1000L / 96000L)
    assert(parse(flacBytes(8000, 1, 8, 0L)).getLong(5) == 0L)
    // trailing blocks after a non-last STREAMINFO are fine (not walked)
    assert(parse(flacBytes(22050, 1, 16, 100L, last = false) ++
      Array[Byte](0x81.toByte, 0, 0, 2, 0, 0)) != null)
    // first block not STREAMINFO: null
    val bad = flacBytes(44100, 2, 16, 100L)
    bad(4) = 0x84.toByte
    assert(parse(bad) == null)
  }

  private def oggPage(headerType: Int, granule: Long, serial: Int, seq: Int,
      packet: Array[Byte]): Array[Byte] = {
    require(packet.length < 255)
    val h = new Array[Byte](27)
    h(0) = 'O'; h(1) = 'g'; h(2) = 'g'; h(3) = 'S'; h(4) = 0
    h(5) = headerType.toByte
    for (i <- 0 until 8) h(6 + i) = ((granule >> (8 * i)) & 0xff).toByte
    for (i <- 0 until 4) h(14 + i) = ((serial >> (8 * i)) & 0xff).toByte
    for (i <- 0 until 4) h(18 + i) = ((seq >> (8 * i)) & 0xff).toByte
    h(26) = 1
    h ++ Array(packet.length.toByte) ++ packet
  }

  private def opusHead(ch: Int, preskip: Int): Array[Byte] =
    "OpusHead".getBytes("US-ASCII") ++ Array[Byte](1, ch.toByte,
      (preskip & 0xff).toByte, ((preskip >> 8) & 0xff).toByte,
      0x44, 0xac.toByte, 0, 0, 0, 0, 0)

  private def vorbisId(ch: Int, sr: Int, nominal: Int): Array[Byte] =
    Array[Byte](1) ++ "vorbis".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, 0, ch.toByte) ++
      (0 until 4).map(i => ((sr >> (8 * i)) & 0xff).toByte) ++
      Array[Byte](0, 0, 0, 0) ++
      (0 until 4).map(i => ((nominal >> (8 * i)) & 0xff).toByte) ++
      Array[Byte](0, 0, 0, 0, 0xb8.toByte, 1)

  test("Ogg Opus: duration = (last granule - pre-skip) at 48 kHz; pages counted") {
    val b = oggPage(2, 0L, 777, 0, opusHead(2, 312)) ++
      oggPage(4, 48312L, 777, 1, Array[Byte](0))
    assert(parse(b) ==
      Row("ogg", "opus", 48000, 2, 0, 48000L * 1000 / 48000, 0, 2L, false, 0L))
  }

  test("Ogg Vorbis: id-header rate/channels/nominal-bitrate; granule at stream rate") {
    val b = oggPage(2, 0L, 9, 0, vorbisId(1, 44100, 96000)) ++
      oggPage(0, -1L, 9, 1, Array[Byte](0)) ++ // continuation: granule -1 skipped
      oggPage(4, 22050L, 9, 2, Array[Byte](0))
    assert(parse(b) == Row("ogg", "vorbis", 44100, 1, 0, 500L, 96, 3L, false, 0L))
    // nonzero vorbis_version: null
    val badVer = vorbisId(1, 44100, 96000); badVer(7) = 1
    assert(parse(oggPage(2, 0L, 9, 0, badVer)) == null)
    // torn final page: null, not a truncated duration
    assert(parse(b.dropRight(1)) == null)
  }

  test("dispatch: WAV/PNG/empty/null reject as NULL; every prefix is throw-free") {
    assert(parse("RIFF....WAVEfmt ".getBytes("US-ASCII")) == null)
    assert(parse(Array[Byte](0x89.toByte, 'P', 'N', 'G')) == null)
    assert(parse(Array.emptyByteArray) == null)
    assert(parse(null) == null)
    val all = v1l3Frame(9, 0, mono = false) ++ v1l3Frame(9, 0, mono = false)
    for (n <- 0 to all.length) parse(all.take(n)) // must never throw
    val fl = flacBytes(44100, 2, 16, 441000L)
    for (n <- 0 to fl.length) parse(fl.take(n))
    val og = oggPage(2, 0L, 777, 0, opusHead(2, 312)) ++
      oggPage(4, 48312L, 777, 1, Array[Byte](0))
    for (n <- 0 to og.length) parse(og.take(n))
  }

  // ---- the Column-algebra fixture round-trip (what the q155 oracle pins) ----

  test("fixture round-trip: every doc-arithmetic field parses back; codegen path green") {
    import spark.implicits._
    val docs = (0L until 90L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val media = graft.multimodal.Multimodal.compressedAudioFromDocuments(docs)
    val got = media.select(col("media_id"), col("kind"),
        MediaFunctions.audioContainerMeta(col("payload")).as("m"))
      .select(col("media_id"), col("kind"), col("m.*"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.size == 90)
    for (d <- 0L until 90L) {
      val r = got(d)
      val c = (d % 3).toInt
      assert(r.getString(1) == Seq("mp3", "flac", "ogg")(c), s"doc $d kind")
      assert(!r.isNullAt(2), s"doc $d meta NULL")
      val (container, codec, sr, ch, bps, durMs, kbps, frames, vbr, tag) =
        (r.getString(2), r.getString(3), r.getInt(4), r.getInt(5), r.getInt(6),
          r.getLong(7), r.getInt(8), r.getLong(9), r.getBoolean(10), r.getLong(11))
      if (c == 0) {
        val v1 = d % 2 == 0
        val v1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
        val v2L3 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
        val brA = (d % 14 + 1).toInt
        val brB = ((d % 14 + 1) % 14 + 1).toInt
        val srExp = (if (v1) Array(44100, 48000, 32000) else Array(22050, 24000, 16000))(
          ((d / 3) % 3).toInt)
        val kA = (if (v1) v1L3 else v2L3)(brA)
        val kB = (if (v1) v1L3 else v2L3)(brB)
        val n = d % 5 + 3
        val isVbr = d % 7 == 3
        val spf = if (v1) 1152L else 576L
        val kbpsSum = if (isVbr) (n + 1) / 2 * kA + n / 2 * kB else n * kA
        assert(container == "mp3" && codec == (if (v1) "mpeg1-layer3" else "mpeg2-layer3"))
        assert(sr == srExp && ch == (if (d % 4 == 0) 1 else 2) && bps == 0)
        assert(durMs == n * spf * 1000 / srExp, s"doc $d duration")
        assert(kbps == kbpsSum / n && frames == n && vbr == isVbr, s"doc $d mp3 rates")
        assert(tag == (if (d % 4 == 1) 10 + d % 96 + 8 else 0L), s"doc $d tag")
      } else if (c == 1) {
        val srExp = ((d % 8 + 1) * 6000).toInt
        val total = d % 100000 + 1000
        assert(container == "flac" && codec == "flac")
        assert(sr == srExp && ch == (d % 2 + 1).toInt &&
          bps == (((d / 3) % 3 + 1) * 8).toInt)
        assert(durMs == total * 1000 / srExp && kbps == 0 && frames == 0L &&
          !vbr && tag == 0L, s"doc $d flac")
      } else {
        val opus = d % 2 == 0
        val srExp = if (opus) 48000 else if (d % 4 == 1) 44100 else 48000
        val samples = if (opus) d % 50000 + 4800 else d % 50000 + 4410
        assert(container == "ogg" && codec == (if (opus) "opus" else "vorbis"))
        assert(sr == srExp && bps == 0 && frames == 2L && !vbr && tag == 0L)
        assert(ch == (if (opus) (d % 4) / 2 + 1 else (d % 4 + 1) / 2).toInt, s"doc $d ch")
        assert(durMs == samples * 1000 / srExp, s"doc $d ogg duration")
        assert(kbps == (if (opus) 0 else ((d % 10 + 1) * 16).toInt), s"doc $d kbps")
      }
    }
  }
}
