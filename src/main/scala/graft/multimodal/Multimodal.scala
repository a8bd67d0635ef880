package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media item: opaque payload bytes + typed metadata. The schema shape
  * for multimodal columns at scale: `binary` payload, scalar metadata
  * columns the optimizer can prune/push down independently of the blob.
  */
case class MediaItem(
    media_id: Long,
    kind: String, // "image" | "audio"
    width: Int, // pixels (image) or sample-rate/1000 (audio)
    height: Int, // pixels (image) or channels (audio)
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
  * The DECODE STEP IS STUBBED — this container has no image/audio codecs, so
  * `fakeDecode` derives a deterministic byte-driven feature vector instead
  * of running a real decoder. Everything around it is the real Spark shape:
  * typed `Dataset` schema, `mapPartitions` batch iteration (one decoder
  * instantiation per partition, the same contract a JNI/codec binding or a
  * vectorized Pandas-UDF batch would use), and metadata-only transforms that
  * never touch the payload (so Parquet column pruning skips the blobs).
  */
object Multimodal {

  /** Deterministic fake "decode + featurize": a real pipeline would replace
    * the body with e.g. JPEG decode + CNN embedding. Keyed on payload bytes
    * so tests can assert determinism. */
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

  /** Build a demo media table from the documents table (payload = utf-8
    * bytes; kind/width/height derived deterministically). Stand-in for a
    * real binary source so the plumbing is exercised end-to-end. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("kind"),
      (col("doc_id") % 640 + 64).cast("int").as("width"),
      (col("doc_id") % 480 + 48).cast("int").as("height"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Decode + feature-extract, batched per partition. `mapPartitions` (not
    * per-row map) so a real decoder would amortize model/codec setup once
    * per partition — the same batch contract as `mapInPandas`. */
  def extractFeatures(media: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaItem].mapPartitions { it =>
      // real pipeline: instantiate decoder/model HERE, once per partition
      it.map { m =>
        val feats = fakeDecode(m, dim)
        val (ow, oh) = resizedDims(m.width, m.height, 224)
        MediaFeatures(m.media_id, m.kind, m.payload.length, ow, oh, feats)
      }
    }
  }

  /** Aspect-preserving resize metadata (shorter side → `target`). Pure
    * arithmetic — in a real pipeline the payload transform happens in the
    * decode batch; the *plan* shape is identical. */
  def resizedDims(w: Int, h: Int, target: Int): (Int, Int) =
    if (w <= h) (target, math.max(1, math.round(h.toFloat * target / w)))
    else (math.max(1, math.round(w.toFloat * target / h)), target)

  /** Frame-sampling plan for video/audio: every `stride`-th frame index up
    * to `maxFrames` — metadata-only, no payload touched (column pruning
    * keeps the blob out of this plan entirely). */
  def frameSamplePlan(media: DataFrame, fps: Int = 30, stride: Int = 10, maxFrames: Int = 8): DataFrame =
    media.select(col("media_id"), col("kind"),
      explode(sequence(lit(0), least(lit(maxFrames - 1), (col("width") / stride).cast("int"))))
        .as("frame_index"))
      .withColumn("frame_ts_ms", col("frame_index") * lit(1000 * stride) / fps)
}
