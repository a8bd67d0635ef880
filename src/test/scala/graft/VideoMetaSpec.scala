package graft

import org.apache.spark.sql.functions._

import graft.functions.{MediaFunctions, VideoMeta}
import graft.multimodal.Multimodal

/** ISO-BMFF (MP4) metadata parse: fixture round-trip through the native
  * expression (codegen path), plus handcrafted-byte coverage of the spec
  * corners the fixture doesn't exercise — version-1 full boxes, 64-bit
  * largesize, size-0 (to-EOF) boxes, box order, and malformed rejects. */
class VideoMetaSpec extends SparkSpecBase {

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)
  private def box(tpe: String, payload: Array[Byte]): Array[Byte] =
    be32(payload.length + 8L) ++ tpe.getBytes("US-ASCII") ++ payload
  /** Box written with the 64-bit largesize escape (size field = 1). */
  private def bigBox(tpe: String, payload: Array[Byte]): Array[Byte] =
    be32(1L) ++ tpe.getBytes("US-ASCII") ++ be64(payload.length + 16L) ++ payload

  private val ftyp = box("ftyp", "isom".getBytes ++ be32(0x200L))
  private def mvhdV0(ts: Long, dur: Long): Array[Byte] =
    box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(ts) ++ be32(dur))
  private def mvhdV1(ts: Long, dur: Long): Array[Byte] =
    box("mvhd", Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++ be32(ts) ++ be64(dur))
  private def hdlr(kind: String): Array[Byte] =
    box("hdlr", be32(0) ++ be32(0) ++ kind.getBytes("US-ASCII"))
  private def tkhdV0(w: Int, h: Int): Array[Byte] =
    box("tkhd", be32(7) ++ new Array[Byte](72) ++ be32(w.toLong << 16) ++ be32(h.toLong << 16))
  private def tkhdV1(w: Int, h: Int): Array[Byte] =
    box("tkhd", Array[Byte](1, 0, 0, 0) ++ new Array[Byte](84) ++
      be32(w.toLong << 16) ++ be32(h.toLong << 16))
  private def trak(tkhd: Array[Byte], kind: String): Array[Byte] =
    box("trak", tkhd ++ box("mdia", hdlr(kind)))

  private def parsed(b: Array[Byte]) = Option(VideoMeta.parse(b))

  test("fixture round-trip: every field parses back; codegen path green") {
    val v = Multimodal.videoFromDocuments(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60))
    val rows = v.select(col("media_id"), col("timescale"), col("width"),
        col("height"), MediaFunctions.videoMeta(col("payload")).as("m"))
      .select(col("media_id"), col("timescale"), col("width"), col("height"),
        col("m.brand"), col("m.timescale").as("p_ts"), col("m.duration_ms"),
        col("m.n_tracks"), col("m.width").as("p_w"), col("m.height").as("p_h"),
        col("m.handler"))
      .collect()
    assert(rows.length == 60)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(4) == "isom")
      assert(r.getInt(5) == r.getInt(1)) // mvhd timescale ≡ metadata column
      val ts = 600L * (id % 4 + 1)
      val dur = id % 9000 + 600
      assert(r.getLong(6) == dur * 1000L / ts)
      assert(r.getInt(7) == (id % 2 + 1).toInt)
      assert(r.getInt(8) == r.getInt(2) && r.getInt(9) == r.getInt(3))
      assert(r.getString(10) == "vide")
    }
  }

  test("version-1 mvhd and tkhd parse (64-bit times, shifted dim offsets)") {
    val f = ftyp ++ box("moov", mvhdV1(90000, 900000) ++ trak(tkhdV1(1920, 1080), "vide"))
    val m = parsed(f).get
    assert(m.getInt(1) == 90000)
    assert(m.getLong(2) == 10000L) // 900000 / 90000 s
    assert(m.getInt(3) == 1 && m.getInt(4) == 1920 && m.getInt(5) == 1080)
    assert(m.getString(6) == "vide")
  }

  test("largesize moov and size-0 trailing mdat walk correctly") {
    val moov = bigBox("moov", mvhdV0(600, 1800) ++ trak(tkhdV0(640, 480), "vide"))
    // size-0 final box: runs to EOF per spec
    val mdat = be32(0L) ++ "mdat".getBytes ++ "payload-bytes".getBytes
    val m = parsed(ftyp ++ moov ++ mdat).get
    assert(m.getInt(1) == 600 && m.getLong(2) == 3000L)
    assert(m.getInt(4) == 640 && m.getInt(5) == 480)
  }

  test("box order is free: moov before ftyp, mvhd after traks") {
    val moov = box("moov",
      trak(tkhdV0(320, 240), "soun") ++ trak(tkhdV0(800, 600), "vide") ++
        mvhdV0(1000, 2500))
    val m = parsed(moov ++ ftyp).get
    assert(m.getString(0) == "isom")
    assert(m.getLong(2) == 2500L && m.getInt(3) == 2)
    // first VIDEO trak wins over the earlier audio trak
    assert(m.getInt(4) == 800 && m.getInt(5) == 600 && m.getString(6) == "vide")
  }

  test("no video trak: first trak of any kind is the fallback") {
    val f = ftyp ++ box("moov", mvhdV0(8000, 4000) ++ trak(tkhdV0(0, 0), "soun"))
    val m = parsed(f).get
    assert(m.getString(6) == "soun" && m.getInt(3) == 1)
    assert(m.getInt(4) == 0 && m.getInt(5) == 0)
  }

  test("video sample hash: remux invariance, planted ladder, NULL/fixed-size contracts") {
    import graft.functions.VideoSampleHash64
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .where(col("doc_id") < 100)
    val m = Multimodal.videoWithSamplesFromDocuments(docs)
    val rows = m.select(col("media_id"),
        MediaFunctions.videoSampleHash64(col("payload")).as("sh"), col("payload"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getAs[Array[Byte]](2)))).toMap
    val docIds = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    // re-mux variants: byte-different container, identical contour
    val varDocs = docIds.filter(id => id % 9 != 0 && id % 4 == 1)
    assert(varDocs.nonEmpty)
    varDocs.foreach { id =>
      assert(rows(id * 10)._1 == rows(id * 10 + 1)._1, s"doc $id contour")
      assert(!java.util.Arrays.equals(rows(id * 10)._2, rows(id * 10 + 1)._2))
    }
    // constant clips: byte-identical payloads, one shared hash
    val constIds = docIds.filter(_ % 9 == 0).map(_ * 10)
    assert(constIds.size >= 2)
    assert(constIds.forall(rows.contains)) // all present
    assert(constIds.map(id => rows(id)._1).size == 1) // one shared contour
    val constRef = rows(constIds.min)._2
    constIds.foreach(id => assert(java.util.Arrays.equals(rows(id)._2, constRef)))
    // the ladder: exact_dup for the constant group, near_dup for variants
    val report = graft.ops.MediaDedup.videoDedupReport(m, "payload", "media_id")
      .select("media_id", "status", "keeper").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val keepConst = constIds.min
    assert(report(keepConst)._1 == "kept")
    constIds.filter(_ != keepConst).foreach(id =>
      assert(report(id) == (("exact_dup", keepConst)), s"media $id"))
    varDocs.foreach { id =>
      val (st, keeper) = report(id * 10 + 1)
      assert(st == "near_dup" && keeper <= id * 10, s"variant of doc $id: $st -> $keeper")
    }
    assert(report.values.count(_._1 == "kept") > 0)
    // NULL contract: no sample table (the q94 fixture), garbage, truncated
    // entries, sub-65 counts, and fixed-size tables (zero-information)
    val plain = Multimodal.videoFromDocuments(docs.limit(2)).select("payload")
      .collect()(0).getAs[Array[Byte]](0)
    assert(VideoSampleHash64.compute(plain) == null, "no stsz -> NULL")
    assert(VideoSampleHash64.compute("garbage".getBytes) == null)
    val sample = rows(rows.keySet.min)._2
    assert(VideoSampleHash64.compute(
      java.util.Arrays.copyOf(sample, sample.length - 600)) == null,
      "truncated stsz entries -> NULL")
    // locate the stsz box and patch count / fixed-size fields
    def stszAt(b: Array[Byte]): Int = (0 until b.length - 4).find(i =>
      b(i) == 's' && b(i + 1) == 't' && b(i + 2) == 's' && b(i + 3) == 'z').get
    val under = sample.clone()
    val at = stszAt(under) + 4 // payload: vf(4) sample_size(4) count(4)
    under(at + 8) = 0; under(at + 9) = 0; under(at + 10) = 0; under(at + 11) = 64
    assert(VideoSampleHash64.compute(under) == null, "64 samples -> NULL")
    val fixed = sample.clone()
    val at2 = stszAt(fixed) + 4
    fixed(at2 + 4) = 0; fixed(at2 + 5) = 0; fixed(at2 + 6) = 0; fixed(at2 + 7) = 7
    // fixed-size tables carry zero contour information — hashing them
    // (to the constant 0) would merge every unrelated fixed-size video
    // at Hamming 0; the contract is NULL, same as <65 samples
    assert(VideoSampleHash64.compute(fixed) == null,
      "fixed-size table -> zero-information contour -> NULL")
  }

  test("ScalaCheck: random box trees round-trip every advertised field") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genTrack = for {
      kind <- Gen.oneOf("vide", "soun", "hint")
      w <- Gen.choose(0, 4000)
      h <- Gen.choose(0, 4000)
      v1 <- Gen.oneOf(true, false)
    } yield (kind, w, h, v1)
    val genCase = for {
      ts <- Gen.choose(1, 1000000)
      dur <- Gen.choose(0L, 3000000000L)
      mvhdIsV1 <- Gen.oneOf(true, false)
      moovIsBig <- Gen.oneOf(true, false)
      tracks <- Gen.choose(0, 3).flatMap(n => Gen.listOfN(n, genTrack))
      mvhdPos <- Gen.choose(0, tracks.size) // mvhd anywhere among the traks
      withJunk <- Gen.oneOf(true, false) // unknown boxes must be skipped
      withMdat <- Gen.oneOf(true, false) // trailing size-0 box
    } yield (ts, dur, mvhdIsV1, moovIsBig, tracks, mvhdPos, withJunk, withMdat)

    val prop = Prop.forAll(genCase) {
      case (ts, dur, mvhdIsV1, moovIsBig, tracks, mvhdPos, withJunk, withMdat) =>
        val mvhd = if (mvhdIsV1) mvhdV1(ts, dur) else mvhdV0(ts, dur)
        val trakBoxes = tracks.map { case (kind, w, h, v1) =>
          trak(if (v1) tkhdV1(w, h) else tkhdV0(w, h), kind)
        }
        val junk = if (withJunk) box("free", "junkdata".getBytes) else Array.emptyByteArray
        val (pre, post) = trakBoxes.splitAt(mvhdPos)
        val moovPayload = junk ++ pre.flatten ++ mvhd ++ post.flatten
        val moov = if (moovIsBig) bigBox("moov", moovPayload) else box("moov", moovPayload)
        val mdat = if (withMdat) be32(0L) ++ "mdat".getBytes ++ "xyz".getBytes
                   else Array.emptyByteArray
        val m = parsed(ftyp ++ moov ++ mdat)
        val expVideo = tracks.find(_._1 == "vide").orElse(tracks.headOption)
        m.exists { r =>
          r.getString(0) == "isom" &&
            r.getInt(1) == ts &&
            r.getLong(2) == dur * 1000L / ts &&
            r.getInt(3) == tracks.size &&
            r.getInt(4) == expVideo.map(_._2).getOrElse(0) &&
            r.getInt(5) == expVideo.map(_._3).getOrElse(0) &&
            r.getString(6) == expVideo.map(_._1).getOrElse("none")
        }
    }
    val result = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(200)
        .withInitialSeed(org.scalacheck.rng.Seed(20260813L)),
      prop)
    assert(result.passed, s"ScalaCheck: $result")
  }

  test("malformed payloads reject as NULL, never throw") {
    assert(parsed("not an mp4 file at all".getBytes).isEmpty)
    assert(parsed(Array.emptyByteArray).isEmpty)
    // box size smaller than its own header
    assert(parsed(be32(3L) ++ "free".getBytes ++ ftyp).isEmpty)
    // truncated: size runs past EOF
    assert(parsed(be32(64L) ++ "moov".getBytes ++ new Array[Byte](8)).isEmpty)
    // well-formed boxes but no moov/mvhd
    assert(parsed(ftyp).isEmpty)
    assert(parsed(ftyp ++ box("moov", trak(tkhdV0(1, 1), "vide"))).isEmpty)
    // forged largesize near 2^63 must fail bounds, not wrap
    assert(parsed(be32(1L) ++ "moov".getBytes ++ be64(Long.MaxValue - 2) ++
      new Array[Byte](16)).isEmpty)
    // ...including at a NONZERO offset, where `at + size` would overflow
    // negative and slip past an addition-based bounds check
    assert(parsed(ftyp ++ be32(1L) ++ "moov".getBytes ++
      be64(Long.MaxValue - 8) ++ new Array[Byte](16)).isEmpty)
    // v1 mvhd duration past MaxValue/1000 must reject, not emit negative ms
    val huge = box("mvhd", Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++
      be32(90000) ++ be64(Long.MaxValue / 500))
    assert(parsed(ftyp ++ box("moov", huge ++ trak(tkhdV0(1, 1), "vide"))).isEmpty)
  }
}
