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

  /** Canonicalization: collapse every near-duplicate CLUSTER to its single
    * best representative — the transitively-correct keep policy (pairwise
    * keep-first can drop every member of a chain a→b→c where only the
    * middle links are near-dups). `pairs` is any (doc_a, doc_b) near-dup
    * frame ([[Dedup.minhashDedup]], [[Dedup.simhashPairs]], thresholded
    * embedding neighbors); docs not in any pair survive as their own
    * singleton cluster.
    *
    * Physical shape: [[Dedup.duplicateClusters]] resolves pairs to
    * per-doc `cluster_id` (O(log n) contraction rounds over 16-byte edge
    * rows), one id-keyed join attaches labels, and the per-cluster best
    * (highest `scoreCol`, ties → smallest id) is a k=1
    * [[Selection.topKPerGroup]] — WindowGroupLimit keeps each map task's
    * local best per cluster, so the final exchange carries ≈ one row per
    * cluster per task. Output: the surviving rows of `docs` plus their
    * `cluster_id`. */
  def canonicalize(
      docs: DataFrame,
      idCol: String,
      scoreCol: org.apache.spark.sql.Column,
      pairs: DataFrame): DataFrame = {
    val labels = Dedup.duplicateClusters(docs, idCol, pairs)
    val labeled = docs.join(labels, Seq(idCol))
    Selection.topKPerGroup(labeled, Seq("cluster_id"), scoreCol, 1, Seq(idCol))
      .drop("rank")
  }

  /** The full training-data preparation flow in one call — every stage is
    * an already-audited operator, composed lazily so Catalyst plans each
    * materialization boundary (only the iterative cluster step checkpoints
    * internally):
    *
    *   1. quality gate + exact dedup       — [[cleanCorpus]]
    *   2. near-dup clusters → best doc     — [[canonicalize]] over
    *      [[Dedup.minhashDedup]] pairs (threshold 1.0 = token-set
    *      identity; lower for fuzzier collapse), keep highest
    *      quality_score (ties → smallest id)
    *   3. optional language/domain rebalance — [[Sampling.matchDistribution]]
    *   4. token-budget sequence packing    — [[Packing.packSequences]]
    *
    * Output: surviving docs with `quality_score`, `cluster_id`, `n_tokens`,
    * `stream`, `pack`, `pack_id` — ready for [[graft.sources.Tables.writeShards]]
    * keyed on `pack_id`. */
  def prepareTrainingData(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      minQuality: Double = 0.5,
      minTokens: Long = 20L,
      nearDupThreshold: Double = 1.0,
      strataCol: Option[String] = None,
      strataTargets: Map[String, Double] = Map.empty,
      capacity: Long = 2048L,
      nStreams: Int = 64,
      seed: Long = 42L): DataFrame = {
    val quality = cleanCorpus(docs, textCol, idCol, minQuality, minTokens)
      .select(col(idCol), col("quality_score"))
    val kept = docs.join(quality, Seq(idCol))
    val pairs = Dedup.minhashDedup(kept, textCol, idCol,
      shingleSize = 1, threshold = nearDupThreshold)
    val canon = canonicalize(kept, idCol, col("quality_score"), pairs)
    val balanced = strataCol match {
      case Some(sc) =>
        require(strataTargets.nonEmpty, "strataCol given without strataTargets")
        Sampling.matchDistribution(canon, Seq(idCol), sc, strataTargets, seed)
      case None => canon
    }
    Packing.packSequences(balanced, idCol,
      TextAnalysis.bpeTokenCount(col(textCol)), capacity, nStreams)
  }
}
