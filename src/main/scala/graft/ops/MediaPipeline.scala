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
  * Freeze contract: with `chain`, the SIGNALED frame is materialized
  * once at entry — payload, battery signal struct, gate bit, and the
  * ladder's perceptual signature in ONE frozen projection, so the codec
  * decode runs exactly once per row (the upstream derivation — a crawl
  * extraction — also runs once) — and the GATED POOL is frozen again
  * inside each ladder, so its ~8 consumers plan off materialized rows.
  * Without a chain everything recomputes per consumer (fine for
  * parquet-backed media — the [[MediaDedup.imageDedupReport]] trade). */
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
    * over the pool.
    *
    * Eval-once decode barrier (round 17): with a `chain`, the battery
    * signals, the gate bit, AND the ladder's 64-bit perceptual signature
    * all materialize in ONE frozen projection — one codec decode per row,
    * total. Without the barrier each status branch and the ladder's
    * signature table re-ran the decode over the entry-frozen payloads
    * (~4 decodes/row); the round-16 fused-expression postmortem proved a
    * single-tree form cannot do this (CollapseProject re-derives the
    * producing struct per field reference), so the barrier is a
    * MATERIALIZATION, not a wider expression. The ladder then reads the
    * materialized `__sig__` column instead of re-hashing the payload.
    * Without a chain the `__sig__` column must NOT ride the lazy plan:
    * an unmaterialized signature column in the pool projection threads
    * the hash expression through every ladder consumer's tree and the
    * self-join plan blows up Catalyst (measured: the unfrozen multi-kind
    * capstone went from ~1 min to >30 min of driver plan work) — so the
    * unfrozen path keeps the proven lazy shape with the ladder hashing
    * the payload itself (the parquet-backed-media trade). */
  private def curateWith(
      media: DataFrame,
      payloadCol: String,
      idCol: String,
      signals: Column => Column,
      gatePass: Column => Column,
      sig: Column => Column,
      maxHamming: Int,
      chain: Option[FreezeChain],
      // fused single-decode barrier (optimization round 18): when the
      // modality has a kernel that emits signals AND the ladder signature
      // from ONE decode (images: ImageSignalsKernel), the chained path
      // materializes that wider struct and extracts `__sig__` as a field
      // reference — pool survivors stop paying a second full codec pass.
      // (fusedSignals, sigFromSignals); signals/sig stay the lazy-path
      // kernels (the unfrozen shape keeps the proven plan).
      fused: Option[(Column => Column, Column => Column)] = None): DataFrame = {
    def branches(gated: DataFrame): (DataFrame, DataFrame, DataFrame) = {
      // a NULL signal struct means NO supported codec decoded the payload
      // (every builder wraps its struct in when(parsed.isNotNull, ...)):
      // that's a codec-coverage gap, not a quality decision — own status
      val undecodable = gated.where(col("__s__").isNull)
        .select(col(idCol), lit("undecodable").as("status"), col(idCol).as("keeper"))
      val rejects = gated.where(col("__s__").isNotNull && !col("__p__"))
        .select(col(idCol), lit("quality_reject").as("status"), col(idCol).as("keeper"))
      val pool = gated.where(col("__p__")).drop("__s__", "__p__")
      (undecodable, rejects, pool)
    }
    chain match {
      case Some(ch) =>
        // `__sig__` is gated on the pass bit: only pool survivors ever
        // consume it, so gate-rejected and undecodable rows skip the
        // signature decode entirely (a second full codec pass). The gate
        // predicate re-references gatePass(signals(payload)) after
        // projection collapse, but `when`'s predicate is ALWAYS-evaluated
        // so codegen subexpression elimination shares the one signals
        // decode with `__s__` — still exactly one battery decode per row,
        // plus the hash decode only for rows that can reach the ladder.
        // The payload column itself is ALSO trimmed to pool rows in the
        // same projection: the reject/undecodable branches only read the
        // id, and the ladder only consumes pool rows — materializing
        // reject payloads would hold dead bytes in the frozen frame for
        // the life of the chain (at x100 the all-modality composition's
        // frozen frames are the dominant memory term).
        val sigExpr = fused match {
          // fused kernel: the signature is a FIELD of the materialized
          // signals struct — zero extra decode, for rejects and pool alike
          case Some((_, fromSignals)) => fromSignals(col("__s__"))
          case None => when(col("__p__"), sig(col(payloadCol)))
        }
        val gated = ch.freeze(media
          .withColumn("__s__", fused.map(_._1).getOrElse(signals)(col(payloadCol)))
          .withColumn("__p__", gatePass(col("__s__")))
          .withColumn("__sig__", sigExpr)
          .withColumn(payloadCol, when(col("__p__"), col(payloadCol))))
        val (undecodable, rejects, pool) = branches(gated)
        // NO inner pool freeze: the pool is a cheap boolean filter over
        // the signaled ExistingRDD, so the ladder's ~8 consumers re-plan
        // off materialized rows already — a second freeze would copy
        // every payload byte again for nothing (measured: it erased the
        // barrier's win on the cheap-signal modalities)
        undecodable.unionByName(rejects).unionByName(
          MediaDedup.dedupReport(pool, payloadCol, idCol, _ => col("__sig__"),
            maxHamming, chain = None)
            .select(col(idCol), col("status"), col("keeper")))
      case None =>
        val gated = media
          .withColumn("__s__", signals(col(payloadCol)))
          .withColumn("__p__", gatePass(col("__s__")))
        val (undecodable, rejects, pool) = branches(gated)
        undecodable.unionByName(rejects).unionByName(
          MediaDedup.dedupReport(pool, payloadCol, idCol, sig, maxHamming, None)
            .select(col(idCol), col("status"), col("keeper")))
    }
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
      chain: Option[FreezeChain] = None): DataFrame =
    curateWith(media, payloadCol, idCol,
      MediaQuality.imageSignals,
      s => MediaQuality.imageGates(s, minDim, maxAspect, minDynRange, lumaBounds)
        .getField("passes"),
      graft.functions.MediaFunctions.imageAHash64,
      maxHamming, chain,
      fused = Some((MediaQuality.imageSignalsWithAHash, _.getField("ahash"))))

  /** The q139 capstone for AUDIO: battery gates (rate/channels/duration/
    * level/clipping), then the envelope-hash ladder. */
  def curateAudio(
      media: DataFrame,
      payloadCol: String,
      idCol: String,
      policy: AudioPolicy = AudioPolicy(),
      maxHamming: Int = 3,
      chain: Option[FreezeChain] = None): DataFrame =
    curateWith(media, payloadCol, idCol,
      MediaQuality.audioSignals,
      s => MediaQuality.audioGates(s, policy.minSampleRate, policy.maxChannels,
        policy.minDurationS, policy.minRms, policy.clipPeak).getField("passes"),
      graft.functions.MediaFunctions.pcmEnvelopeHash64,
      maxHamming, chain)

  /** The q139 capstone for VIDEO: battery gates (duration window, dims,
    * aspect, tracks), then the sample-size-contour ladder (the re-mux
    * dedup class — see [[MediaDedup.nearDuplicateVideoPairs]]). */
  def curateVideo(
      media: DataFrame,
      payloadCol: String,
      idCol: String,
      policy: VideoPolicy = VideoPolicy(),
      maxHamming: Int = 3,
      chain: Option[FreezeChain] = None): DataFrame =
    curateWith(media, payloadCol, idCol,
      MediaQuality.videoSignals,
      s => MediaQuality.videoGates(s, policy.minDurationMs, policy.maxDurationMs,
        policy.minDim, policy.maxAspect, policy.maxTracks).getField("passes"),
      graft.functions.MediaFunctions.videoSampleHash64,
      maxHamming, chain)

  /** The ALL-MODALITY capstone: one call over a typed media frame with a
    * `kindCol` ∈ `image` / `audio` / `video` — each kind runs ITS
    * modality's gates and ladder (dedup never pairs across modalities,
    * even on a 64-bit signature collision: an image aHash and an audio
    * envelope sharing bits is numerology, not duplication). Rows of any
    * other kind are `quality_reject`ed explicitly — an ingest bug
    * surfaces as rejects, never as silently dropped rows. The media
    * frame freezes ONCE here; each kind slice filters the materialized
    * rows before its own signaled freeze. */
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
    // the three modality ladders are INDEPENDENT until the final union —
    // and with a chain each is a long serial chain of small eager jobs
    // (signaled freeze, exact-pair job, banding freeze, CC contraction
    // rounds). One driver thread per modality overlaps the chains (guide
    // §2.6): each ladder's tasks back-fill the others' single-task tails.
    // Content is unchanged — every ladder computes its own kind slice.
    val Seq(images, audios, videos) = Overlap.inParallel(Seq(
      () => curateImages(m.where(col(kindCol) === "image"), payloadCol, idCol,
        image.minDim, image.maxAspect, image.minDynRange, image.lumaBounds,
        maxHamming, chain),
      () => curateAudio(m.where(col(kindCol) === "audio"), payloadCol, idCol,
        audio, maxHamming, chain),
      () => curateVideo(m.where(col(kindCol) === "video"), payloadCol, idCol,
        video, maxHamming, chain)))
    // NULL kind must land here too: `=== "image"` and `!isin(...)` are both
    // NULL-valued (so false) for a NULL kind — without the isNull arm such
    // rows would match NO branch and vanish, the exact silent drop the
    // quality_reject contract exists to prevent
    val unknownSrc = m.where(col(kindCol).isNull ||
        !col(kindCol).isin("image", "audio", "video"))
      .select(col(idCol), lit("quality_reject").as("status"), col(idCol).as("keeper"))
    // With a chain, everything that still needs the ENTRY frame is now
    // materialized (freezing is eager: the three per-kind SIGNALED frames
    // exist, and the unknown slice is decision-sized — freeze it too), so
    // the entry frame's payload copy is released HERE instead of living
    // until releaseAll(). At x100 scale the composition was holding every
    // payload byte TWICE (entry + signaled) for the whole query — measured
    // 493 s vs ~60 s for the three single-modality ladders combined; the
    // early release removes the double residency.
    val unknown = chain.map { ch =>
      val u = ch.freeze(unknownSrc)
      ch.release(m)
      u
    }.getOrElse(unknownSrc)
    images.unionByName(audios).unionByName(videos).unionByName(unknown)
  }
}
