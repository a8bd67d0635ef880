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
    * Stage order matters for codegen: features are computed and filtered
    * BEFORE the dedup semi-join, so the filter and the feature projection
    * share one whole-stage-codegen region and subexpression elimination
    * runs the regex kernels once per doc. Filtering `analyze(deduped)`
    * instead pushes the predicate through the join into a separate
    * interpreted Filter that re-evaluates every regex on every raw doc
    * (measured ~1.7× the query cost at sf0.1). */
  def cleanCorpus(
      df: DataFrame,
      textCol: String,
      idCol: String,
      minQuality: Double = 0.5,
      minTokens: Long = 20L): DataFrame = {
    val feats = TextAnalysis.analyze(df, textCol, idCol)
      .where(col("quality_score") >= minQuality && col("ws_tokens") >= minTokens)
    val keepIds = Dedup.exactGroups(df, col(textCol), idCol)
      .select(col("keep_id").as(idCol))
    feats.join(keepIds, Seq(idCol), "left_semi")
  }
}
