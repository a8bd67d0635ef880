package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication for continuous-ingestion pipelines — the
  * Structured-Streaming counterpart of [[graft.ops.Dedup.dropExact]]
  * (keep-FIRST arrival of each distinct text, drop later copies).
  *
  * Scale design: the dedup state is keyed on a 128-bit hash of the text
  * (two seeded xxhash64 slots), NOT the text itself, so the state store
  * holds 16 bytes per distinct document instead of the corpus — the same
  * fixed-width-key principle as the batch hash-keyed `exactGroups`. Unlike
  * batch there is no second exact-verify pass available (the earlier copy's
  * text is gone), so a 128-bit collision drops a unique document; at 2⁻¹²⁸
  * that is far below any storage-layer error rate, and the tradeoff is what
  * makes unbounded-corpus streaming dedup feasible at all.
  *
  * Two state regimes:
  *   - with `tsCol` (recommended): `dropDuplicatesWithinWatermark` — state
  *     for a hash is dropped once the watermark passes its last-seen event
  *     time, so state is bounded by the distinct-doc rate × delay window.
  *   - without: `dropDuplicates` over the full stream history — exact
  *     forever, but state grows with the number of distinct documents;
  *     only for bounded corpora.
  */
object StreamingDedup {

  def dropDuplicateTexts(
      df: DataFrame,
      textCol: String,
      tsCol: Option[String] = None,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val keyed = df
      .withColumn("__h1__", xxhash64(col(textCol), lit(0)))
      .withColumn("__h2__", xxhash64(col(textCol), lit(1)))
    val deduped = tsCol match {
      case Some(t) =>
        keyed.withWatermark(t, watermarkDelay)
          .dropDuplicatesWithinWatermark("__h1__", "__h2__")
      case None =>
        keyed.dropDuplicates("__h1__", "__h2__")
    }
    deduped.drop("__h1__", "__h2__")
  }
}
