package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.DatasetBridge.FreezeChain

/** The multimodal curation capstones — quality gates FIRST, then the
  * dedup ladder over the survivors, one call per modality (the media
  * twin of [[Pipeline.cleanCorpus]]) plus a `kind`-dispatching form that
  * runs all three in one call: gate order matters at scale because every
  * battery is a scan-stage projection that drops junk BEFORE anything is
  * hashed, banded, or clustered. Output: every input row with
  * `(idCol, status, keeper)`, `status` ∈ `undecodable` /
  * `quality_reject` / `exact_dup` / `near_dup` / `kept` (keeper = the
  * row a duplicate lost to; itself for kept, rejected, and undecodable
  * rows). `undecodable` is the rows whose payload NO supported codec
  * decodes (NULL signal struct — e.g. WebP bodies or corrupt payloads a
  * crawl harvest keeps because their content-type is `image/…`; valid
  * PNG/JPEG/GIF all decode natively): splitting them from
  * `quality_reject` makes harvest attrition OBSERVABLE — a curation
  * user sees "codec coverage gap", not a silent quality failure.
  *
  * Freeze contract: with `chain`, the MEDIA frame is materialized once
  * at entry (the upstream derivation — a crawl extraction — runs once;
  * the gate decode runs once per output branch) and the GATED POOL is
  * frozen again inside each ladder, so its ~8 consumers plan off
  * materialized rows. Without a chain everything recomputes per consumer
  * (fine for parquet-backed media — the
  * [[MediaDedup.imageDedupReport]] trade). */
object MediaPipeline {

  /** Image gate policy (the [[MediaQuality.imageGates]] knobs). */
  final case class ImagePolicy(
      minDim: Long = 7L,
      maxAspect: Double = 1.8,
      minDynRange: Long = 8L,
      lumaBounds: (Double, Double) = (70.0, 200.0))

  /** Audio gate policy (the [[MediaQuality.audioGates]] knobs). */
  final case class AudioPolicy(
      minSampleRate: Long = 16000L,
      maxChannels: Long = 2L,
      minDurationS: Double = 0.01,
      minRms: Double = 100.0,
      clipPeak: Long = 32760L)

  /** Video gate policy (the [[MediaQuality.videoGates]] knobs). */
  final case class VideoPolicy(
      minDurationMs: Long = 1000L,
      maxDurationMs: Long = 3600000L,
      minDim: Long = 360L,
      maxAspect: Double = 2.5,
      maxTracks: Long = 2L)

  /** The shared gates-then-ladder skeleton: signals in their OWN
    * projection (one decode per row by construction), the gate
    * conjunction splitting rejects from the pool, the modality's ladder
    * over the pool. `freezeEntry = false` lets [[curateMedia]] freeze
    * the full frame once instead of re-freezing each kind slice. */
  private def curateWith(
      media: DataFrame,
      payloadCol: String,
      idCol: String,
      signals: Column => Column,
      gatePass: Column => Column,
      ladder: DataFrame => DataFrame,
      chain: Option[FreezeChain],
      freezeEntry: Boolean): DataFrame = {
    val m =
      if (freezeEntry) chain.map(_.freeze(media)).getOrElse(media) else media
    val gated = m.withColumn("__s__", signals(col(payloadCol)))
      .withColumn("__p__", gatePass(col("__s__")))
    // a NULL signal struct means NO supported codec decoded the payload
    // (every builder wraps its struct in when(parsed.isNotNull, ...)):
    // that's a codec-coverage gap, not a quality decision — its own status
    val undecodable = gated.where(col("__s__").isNull)
      .select(col(idCol), lit("undecodable").as("status"), col(idCol).as("keeper"))
    val rejects = gated.where(col("__s__").isNotNull && !col("__p__"))
      .select(col(idCol), lit("quality_reject").as("status"), col(idCol).as("keeper"))
    val pool = gated.where(col("__p__")).drop("__s__", "__p__")
    undecodable.unionByName(rejects).unionByName(
      ladder(pool).select(col(idCol), col("status"), col("keeper")))
  }

  def curateImages(
      media: DataFrame,
      payloadCol: String,
      idCol: String,
      minDim: Long = 7L,
      maxAspect: Double = 1.8,
      minDynRange: Long = 8L,
      lumaBounds: (Double, Double) = (70.0, 200.0),
      maxHamming: Int = 3,
      chain: Option[FreezeChain] = None,
      freezeEntry: Boolean = true): DataFrame =
    curateWith(media, payloadCol, idCol,
      MediaQuality.imageSignals,
      s => MediaQuality.imageGates(s, minDim, maxAspect, minDynRange, lumaBounds)
        .getField("passes"),
      pool => MediaDedup.imageDedupReport(pool, payloadCol, idCol, maxHamming, chain),
      chain, freezeEntry)

  /** The q139 capstone for AUDIO: battery gates (rate/channels/duration/
    * level/clipping), then the envelope-hash ladder. */
  def curateAudio(
      media: DataFrame,
      payloadCol: String,
      idCol: String,
      policy: AudioPolicy = AudioPolicy(),
      maxHamming: Int = 3,
      chain: Option[FreezeChain] = None,
      freezeEntry: Boolean = true): DataFrame =
    curateWith(media, payloadCol, idCol,
      MediaQuality.audioSignals,
      s => MediaQuality.audioGates(s, policy.minSampleRate, policy.maxChannels,
        policy.minDurationS, policy.minRms, policy.clipPeak).getField("passes"),
      pool => MediaDedup.audioDedupReport(pool, payloadCol, idCol, maxHamming, chain),
      chain, freezeEntry)

  /** The q139 capstone for VIDEO: battery gates (duration window, dims,
    * aspect, tracks), then the sample-size-contour ladder (the re-mux
    * dedup class — see [[MediaDedup.nearDuplicateVideoPairs]]). */
  def curateVideo(
      media: DataFrame,
      payloadCol: String,
      idCol: String,
      policy: VideoPolicy = VideoPolicy(),
      maxHamming: Int = 3,
      chain: Option[FreezeChain] = None,
      freezeEntry: Boolean = true): DataFrame =
    curateWith(media, payloadCol, idCol,
      MediaQuality.videoSignals,
      s => MediaQuality.videoGates(s, policy.minDurationMs, policy.maxDurationMs,
        policy.minDim, policy.maxAspect, policy.maxTracks).getField("passes"),
      pool => MediaDedup.videoDedupReport(pool, payloadCol, idCol, maxHamming, chain),
      chain, freezeEntry)

  /** The ALL-MODALITY capstone: one call over a typed media frame with a
    * `kindCol` ∈ `image` / `audio` / `video` — each kind runs ITS
    * modality's gates and ladder (dedup never pairs across modalities,
    * even on a 64-bit signature collision: an image aHash and an audio
    * envelope sharing bits is numerology, not duplication). Rows of any
    * other kind are `quality_reject`ed explicitly — an ingest bug
    * surfaces as rejects, never as silently dropped rows. The media
    * frame freezes ONCE here; each kind slice filters the materialized
    * rows (`freezeEntry = false` below). */
  def curateMedia(
      media: DataFrame,
      payloadCol: String,
      idCol: String,
      kindCol: String,
      image: ImagePolicy = ImagePolicy(),
      audio: AudioPolicy = AudioPolicy(),
      video: VideoPolicy = VideoPolicy(),
      maxHamming: Int = 3,
      chain: Option[FreezeChain] = None): DataFrame = {
    val m = chain.map(_.freeze(media)).getOrElse(media)
    val images = curateImages(m.where(col(kindCol) === "image"), payloadCol, idCol,
      image.minDim, image.maxAspect, image.minDynRange, image.lumaBounds,
      maxHamming, chain, freezeEntry = false)
    val audios = curateAudio(m.where(col(kindCol) === "audio"), payloadCol, idCol,
      audio, maxHamming, chain, freezeEntry = false)
    val videos = curateVideo(m.where(col(kindCol) === "video"), payloadCol, idCol,
      video, maxHamming, chain, freezeEntry = false)
    // NULL kind must land here too: `=== "image"` and `!isin(...)` are both
    // NULL-valued (so false) for a NULL kind — without the isNull arm such
    // rows would match NO branch and vanish, the exact silent drop the
    // quality_reject contract exists to prevent
    val unknown = m.where(col(kindCol).isNull ||
        !col(kindCol).isin("image", "audio", "video"))
      .select(col(idCol), lit("quality_reject").as("status"), col(idCol).as("keeper"))
    images.unionByName(audios).unionByName(videos).unionByName(unknown)
  }
}
