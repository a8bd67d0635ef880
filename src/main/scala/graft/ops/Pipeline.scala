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
    * pred_lang, quality_score, fingerprint) for survivors.
    *
    * Physical shape (three scans of `df`, regex kernels in one branch):
    * the dedup side resolves to the duplicate-sized drop list
    * ([[Dedup.duplicateIds]] — one fixed-width-key shuffle off the shared
    * hashed exchange), which broadcasts into an ANTI join the feature
    * branch streams through — the keep-list semi-join this replaces
    * shuffled the whole feature table by id. Catalyst pushes the quality
    * predicate below the feature projection (alias substitution), so the
    * quality regexes run in the filter and again in the projection for
    * survivors; the cheap `ws_tokens` bound is ordered FIRST in the
    * conjunction so short-length docs short-circuit past the regex
    * kernels in the filter. */
  def cleanCorpus(
      df: DataFrame,
      textCol: String,
      idCol: String,
      minQuality: Double = 0.5,
      minTokens: Long = 20L): DataFrame = {
    val feats = TextAnalysis.analyze(df, textCol, idCol)
      .where(col("ws_tokens") >= minTokens && col("quality_score") >= minQuality)
    val drops = Dedup.duplicateIds(df, col(textCol), idCol)
    feats.join(drops, col(idCol) === drops("__id__"), "left_anti")
  }
}
