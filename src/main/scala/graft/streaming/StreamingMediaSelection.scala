package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.MediaQuality
import graft.ops.MediaPipeline.{AudioPolicy, ImagePolicy, VideoPolicy}

/** Quality admission gates for streaming MEDIA ingest — the
  * [[StreamingSelection]] pattern over the [[MediaQuality]] batteries:
  * every gate is a codegen'd scan projection over the payload (native
  * decode → signal struct → boolean conjunction), so admission is
  * STATELESS — no state store, no watermark requirement, per-batch cost
  * linear in batch size and flat in stream age. Compose BEFORE the
  * stateful dedup tiers ([[StreamingMediaDedup]]) so junk never enters
  * the dedup state stores — the same gates-first ordering the batch
  * capstone ([[graft.ops.MediaPipeline.curateMedia]]) hard-codes.
  *
  * Batch/stream parity: the returned plan is the same Column tree on a
  * batch frame, so each admission is its own batch equivalent
  * (MultimodalStreamingSpec pins stream ≡ batch decisions across
  * triggers and asserts zero state operators). NULL-fails contract
  * throughout: an undecodable payload fails the battery and is dropped
  * here, explicitly, rather than poisoning a downstream stage. */
object StreamingMediaSelection {

  /** Keep payloads passing the IMAGE battery (dims / aspect / dynamic
    * range / brightness — PNG or baseline JPEG via the codec-dispatching
    * decode). */
  def imageQualityAdmission(
      df: DataFrame,
      payloadCol: String,
      policy: ImagePolicy = ImagePolicy()): DataFrame =
    df.withColumn("__s__", MediaQuality.imageSignals(col(payloadCol)))
      .where(MediaQuality.imageGates(col("__s__"), policy.minDim, policy.maxAspect,
        policy.minDynRange, policy.lumaBounds).getField("passes"))
      .drop("__s__")

  /** Keep payloads passing the AUDIO battery (rate / channels / duration
    * / level / clipping). */
  def audioQualityAdmission(
      df: DataFrame,
      payloadCol: String,
      policy: AudioPolicy = AudioPolicy()): DataFrame =
    df.withColumn("__s__", MediaQuality.audioSignals(col(payloadCol)))
      .where(MediaQuality.audioGates(col("__s__"), policy.minSampleRate,
        policy.maxChannels, policy.minDurationS, policy.minRms,
        policy.clipPeak).getField("passes"))
      .drop("__s__")

  /** Keep payloads passing the COMPRESSED-audio battery (MP3 / FLAC /
    * Ogg: rate / channels / duration window / bitrate floor / VBR
    * policy) — the meta-level admission for the codecs the engine
    * parses without sample access. */
  def compressedAudioQualityAdmission(
      df: DataFrame,
      payloadCol: String,
      policy: MediaQuality.CompressedAudioPolicy =
        MediaQuality.CompressedAudioPolicy()): DataFrame =
    df.withColumn("__s__", MediaQuality.compressedAudioSignals(col(payloadCol)))
      .where(MediaQuality.compressedAudioGates(col("__s__"),
        policy.minSampleRate, policy.maxChannels, policy.minDurationMs,
        policy.maxDurationMs, policy.minBitrateKbps,
        policy.allowVbr).getField("passes"))
      .drop("__s__")

  /** Keep payloads passing the VIDEO battery (duration window / dims /
    * aspect / tracks). */
  def videoQualityAdmission(
      df: DataFrame,
      payloadCol: String,
      policy: VideoPolicy = VideoPolicy()): DataFrame =
    df.withColumn("__s__", MediaQuality.videoSignals(col(payloadCol)))
      .where(MediaQuality.videoGates(col("__s__"), policy.minDurationMs,
        policy.maxDurationMs, policy.minDim, policy.maxAspect,
        policy.maxTracks).getField("passes"))
      .drop("__s__")
}
