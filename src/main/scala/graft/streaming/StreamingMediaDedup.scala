package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming media deduplication for continuous crawl ingestion — the
  * Structured-Streaming counterpart of [[graft.ops.MediaDedup]]'s exact
  * stage plus a PERCEPTUAL-exact stage (keep the first arrival per 64-bit
  * aHash — catches byte-different re-encodes/re-compressions of the same
  * image that hash identically, the hamming-0 tier of the batch ladder).
  *
  * Scale design mirrors [[StreamingDedup]]: state is keyed on fixed-width
  * hashes (16 B per distinct payload for the exact stage, 8 B per distinct
  * aHash for the perceptual stage), never the image bytes; with `tsCol`
  * the watermark TTL bounds state by the distinct-media rate × delay
  * window. Undecodable images BYPASS the perceptual stage through a
  * stateless filter union (never one shared NULL bucket, no state cost) —
  * the [[StreamingDedup.dropDuplicateUrls]] non-URL convention.
  *
  * Hamming > 0 near-dup streaming is deliberately NOT offered on this
  * path: `dropDuplicates*` matches by key equality, and banded
  * Hamming matching needs per-batch candidate joins against persisted
  * signature state — that is the [[StreamingDedup.nearDupForeachBatchTtl]]
  * machinery (text MinHash) / [[StreamingVectorDedup]] (embeddings)
  * design; compose with the batch [[graft.ops.MediaDedup]] ladder in a
  * periodic compaction pass when cross-encode tolerance beyond aHash
  * equality is required. */
object StreamingMediaDedup {

  /** Keep the FIRST arrival of each byte-identical payload. Same state
    * regimes as [[StreamingDedup.dropDuplicateTexts]]: watermark TTL with
    * `tsCol`, full-history without. NULL payloads bypass statelessly.
    *
    * Collision tradeoff (documented, deliberate): state keys on the
    * 128-bit xxhash pair with NO payload re-verification — unlike the
    * batch ladder's hash-narrow two-phase, a streaming state store
    * cannot hold payloads for re-verify without keying state on image
    * bytes. A collision silently drops a distinct image forever; at
    * n distinct payloads the probability any collision exists is
    * ≈ n²/2¹²⁹ — under 10⁻¹⁸ at n = 10⁹ and ~3·10⁻¹³ at n = 10¹¹, far
    * below crawl-pipeline loss rates from transport alone. Callers who
    * cannot accept that bound should run the batch ladder in a
    * compaction pass, which re-verifies candidates on full bytes. */
  def dropDuplicateImages(
      df: DataFrame,
      payloadCol: String,
      tsCol: Option[String] = None,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val withKey = df
      .withColumn("__h1__", xxhash64(col(payloadCol), lit(0)))
      .withColumn("__h2__", xxhash64(col(payloadCol), lit(1)))
    val keyed = withKey.where(col(payloadCol).isNotNull)
    val deduped = tsCol match {
      case Some(t) =>
        keyed.withWatermark(t, watermarkDelay)
          .dropDuplicatesWithinWatermark("__h1__", "__h2__")
      case None =>
        keyed.dropDuplicates("__h1__", "__h2__")
    }
    deduped.unionByName(withKey.where(col(payloadCol).isNull))
      .drop("__h1__", "__h2__")
  }

  /** Keep the FIRST arrival per 64-bit perceptual aHash
    * ([[graft.functions.ImageAHash64]], codec-dispatching) — the
    * hamming-0 perceptual tier: re-encoded copies whose pixels grid-hash
    * identically are dropped even when their bytes differ, INCLUDING a
    * JPEG re-encode of a PNG original (the grid conventions are shared
    * across codecs). Undecodable images (NULL hash) pass through
    * unchanged via the stateless bypass branch. */
  def dropPerceptualDuplicateImages(
      df: DataFrame,
      payloadCol: String,
      tsCol: Option[String] = None,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val withSig = df.withColumn("__ah__",
      graft.functions.MediaFunctions.imageAHash64(col(payloadCol)))
    val keyed = withSig.where(col("__ah__").isNotNull)
    val deduped = tsCol match {
      case Some(t) =>
        keyed.withWatermark(t, watermarkDelay)
          .dropDuplicatesWithinWatermark("__ah__")
      case None =>
        keyed.dropDuplicates("__ah__")
    }
    deduped.unionByName(withSig.where(col("__ah__").isNull))
      .drop("__ah__")
  }
}
