package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composed training-corpus cleaning — the end-to-end flow a data pipeline
  * actually runs, expressed as one declarative DataFrame graph so Catalyst
  * plans it whole (dedup semi-join, feature projection, and the quality
  * filter all fuse; nothing materializes between stages):
  *
  *   exact dedup (keep-first) → text features → quality/length filter.
  *
  * Each stage is the already-audited operator ([[Dedup.dropExact]],
  * [[TextAnalysis.analyze]]); this object only composes them. At 100 TB
  * the plan is: fixed-width-key dedup shuffle → narrow feature projection
  * (no shuffle) → filter pushed against it.
  */
object Pipeline {

  /** Surviving documents with their text features. A doc survives iff it is
    * the first (minimum id) copy of its exact text, has `quality_score ≥
    * minQuality`, and has at least `minTokens` whitespace tokens. Output:
    * the [[TextAnalysis.analyze]] schema (id, token counts, ratios,
    * pred_lang, quality_score, fingerprint) for survivors. */
  def cleanCorpus(
      df: DataFrame,
      textCol: String,
      idCol: String,
      minQuality: Double = 0.5,
      minTokens: Long = 20L): DataFrame = {
    val deduped = Dedup.dropExact(df, textCol, idCol)
    TextAnalysis.analyze(deduped, textCol, idCol)
      .where(col("quality_score") >= minQuality && col("ws_tokens") >= minTokens)
  }
}
