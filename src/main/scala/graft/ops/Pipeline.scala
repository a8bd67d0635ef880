package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.DatasetBridge

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

  /** [[cleanCorpus]] with a TRAINED language gate — the [[LangId]] hook:
    * only docs whose model-predicted language is in `keepLangs` enter the
    * flow, and the output's `pred_lang` column is the model's prediction
    * (not the stopword heuristic). The gate is a zero-shuffle codegen
    * predicate (K fused byte passes), evaluated at the scan BEFORE the
    * dedup shuffle and the quality regex battery — at 100 TB the
    * off-language bulk (often the majority of raw crawl) never reaches
    * either. */
  def cleanCorpus(
      df: DataFrame,
      textCol: String,
      idCol: String,
      minQuality: Double,
      minTokens: Long,
      langModel: LangId.LangIdModel,
      keepLangs: Set[String]): DataFrame = {
    require(keepLangs.nonEmpty, "keepLangs must name at least one language")
    val unknown = keepLangs.diff(langModel.classes.toSet)
    require(unknown.isEmpty,
      s"keepLangs ${unknown.mkString(",")} not among the model's classes " +
        langModel.classes.mkString(","))
    val gated = df.where(
      LangId.predictLanguage(langModel, col(textCol)).isin(keepLangs.toSeq.sorted: _*))
    val feats = TextAnalysis.analyze(gated, textCol, idCol, Some(langModel))
      .where(col("ws_tokens") >= minTokens && col("quality_score") >= minQuality)
    val drops = Dedup.duplicateIds(gated, col(textCol), idCol)
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
  /** Shared clean → exact-dedup → near-dup-canonicalize prefix of the
    * flagship flows. Returns the canonical corpus (LAZY — callers with an
    * eager downstream stage must freeze it themselves). */
  private def canonicalCorpus(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      minQuality: Double,
      minTokens: Long,
      nearDupThreshold: Double,
      shingleSize: Int,
      chain: Option[DatasetBridge.FreezeChain] = None): DataFrame = {
    // the pipeline's computed quality_score/bpe_tokens govern; a pre-scored
    // corpus's same-named columns would make the join ambiguous
    val base = docs.drop("quality_score", "bpe_tokens")
    val quality = cleanCorpus(base, textCol, idCol, minQuality, minTokens)
      .select(col(idCol), col("quality_score"), col("bpe_tokens"))
    // the kept corpus is consumed by the minhash pair generation, the
    // canonicalize scoring windows, AND the packing tail — unfrozen, the
    // clean→feature subtree (parquet scan + tokenize + quality battery)
    // re-derived per consumer (13 parquet scans in q81's executed sf0.01
    // plan). One freeze retires them; the frame carries the text once
    val kept = freeze(base.join(quality, Seq(idCol)), chain)
    // shingleSize defaults to minhashDedup's 3-gram shingles: at thresholds
    // below 1.0, unigram token SETS (shingleSize = 1) would link any two
    // documents sharing most of their vocabulary regardless of order/counts
    // — silent topical over-collapse. Pass 1 explicitly for token-set
    // identity semantics at threshold 1.0.
    val pairs = Dedup.minhashDedup(kept, textCol, idCol,
      shingleSize = shingleSize, threshold = nearDupThreshold)
    canonicalize(kept, idCol, col("quality_score"), pairs)
  }

  /** Freeze a lazy plan before an EAGER consumer (a driver-side count or
    * model-fit job) so the upstream subtree runs once, not once per
    * consumer. Reliable checkpoint when the session has a checkpoint dir,
    * localCheckpoint otherwise (DatasetBridge.freezeStatsFree).
    *
    * Storage lifecycle: the frozen pool BACKS the lazily-returned result,
    * so the pipeline itself can never delete it — only the caller knows
    * when the result has been materialized to its sink. Callers that run
    * pipelines repeatedly in one application (the ingest-round shape)
    * should pass their own [[DatasetBridge.FreezeChain]] and call
    * `chain.releaseAll()` after the sink write; otherwise each invocation
    * leaves one checkpoint dir (or localCheckpoint block set) behind until
    * application exit. */
  private def freeze(
      df: DataFrame,
      chain: Option[DatasetBridge.FreezeChain]): DataFrame =
    chain match {
      case Some(c) => c.freeze(df)
      case None    => DatasetBridge.freezeStatsFree(df)
    }

  def prepareTrainingData(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      minQuality: Double = 0.5,
      minTokens: Long = 20L,
      nearDupThreshold: Double = 1.0,
      shingleSize: Int = 3,
      strataCol: Option[String] = None,
      strataTargets: Map[String, Double] = Map.empty,
      capacity: Long = 2048L,
      nStreams: Int = 64,
      seed: Long = 42L,
      chain: Option[DatasetBridge.FreezeChain] = None): DataFrame = {
    val canon = canonicalCorpus(docs, textCol, idCol,
      minQuality, minTokens, nearDupThreshold, shingleSize, chain)
    val balanced = strataCol match {
      case Some(sc) =>
        require(strataTargets.nonEmpty, "strataCol given without strataTargets")
        // matchDistribution counts strata EAGERLY (one driver collect);
        // freeze first or the whole clean→cluster→cut subtree runs twice —
        // once for the counts, again when the result is consumed
        Sampling.matchDistribution(freeze(canon, chain), Seq(idCol), sc, strataTargets, seed)
      case None => canon
    }
    // bpe_tokens rides along from analyze — the packing stage must not pay
    // a second regexp_count pass over the full text payload
    Packing.packSequences(balanced, idCol, col("bpe_tokens"), capacity, nStreams)
  }

  /** The MULTIMODAL flagship — the LAION/DataComp dataset-build shape in
    * one call: the text flagship (clean → exact dedup → near-dup
    * canonicalize → pack) joined with per-document CURATED media
    * inventories from the all-modality capstone ladder
    * ([[MediaPipeline.curateMedia]]). A training sample is a kept
    * document plus the count of its media that survived that modality's
    * quality gates and dedup; media lost to undecodable / quality_reject
    * / exact_dup / near_dup never count, and a document whose media ALL
    * fail stays in the corpus with zero counts (pass `requireMedia` to
    * drop text-only samples instead — the paired-dataset policy).
    *
    * `mediaDocIdCol` names the media frame's owning-document column (the
    * crawl extraction knows which page carried each asset). Scale shape:
    * the curation report and the per-doc counts are DECISION-sized, so
    * the media→text join broadcasts decisions under the same failover
    * knob as the dedup ladders ([[Dedup.BroadcastDecisionsKey]]); payload
    * bytes stay inside the curation scan/ladder and never reach this
    * join. */
  def prepareMultimodalTraining(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      media: DataFrame,
      payloadCol: String,
      mediaIdCol: String,
      kindCol: String,
      mediaDocIdCol: String,
      minQuality: Double = 0.5,
      minTokens: Long = 20L,
      nearDupThreshold: Double = 1.0,
      shingleSize: Int = 3,
      image: MediaPipeline.ImagePolicy = MediaPipeline.ImagePolicy(),
      audio: MediaPipeline.AudioPolicy = MediaPipeline.AudioPolicy(),
      video: MediaPipeline.VideoPolicy = MediaPipeline.VideoPolicy(),
      maxHamming: Int = 3,
      requireMedia: Boolean = false,
      capacity: Long = 2048L,
      nStreams: Int = 64,
      chain: Option[DatasetBridge.FreezeChain] = None): DataFrame = {
    // the media curation (per-modality ladders), the (id, doc, kind)
    // mapping freeze, and the TEXT flagship prefix (clean → exact dedup →
    // near-dup canonicalize) are mutually independent eager job chains —
    // one driver thread each overlaps them (guide §2.6); contents are
    // unaffected, only job scheduling. The mapping freeze: referencing the
    // RAW media frame downstream would thread its whole derivation (a
    // multi-branch crawl extraction) back into the final plan as extra
    // scans (measured: 21 parquet scans at sf0.01 vs q81's 4 before this
    // freeze); the narrow projection column-prunes the payload out of the
    // mapping pass, so the freeze carries three columns, never bytes
    val Seq(report, mapping, canon) = Overlap.inParallel(Seq(
      () => MediaPipeline.curateMedia(media, payloadCol, mediaIdCol,
        kindCol, image, audio, video, maxHamming, chain),
      () => freeze(media.select(col(mediaIdCol),
        col(mediaDocIdCol).as("__mdoc__"), col(kindCol)), chain),
      () => canonicalCorpus(docs, textCol, idCol,
        minQuality, minTokens, nearDupThreshold, shingleSize, chain)))
    // kept decisions back to their owning documents: every relation from
    // here on carries ids/kinds/counts only
    val keptMedia = report.where(col("status") === "kept").select(col(mediaIdCol))
    val mediaDocs = mapping.join(keptMedia, Seq(mediaIdCol))
    val counts = mediaDocs.groupBy(col("__mdoc__"))
      .agg(
        sum(when(col(kindCol) === "image", 1L).otherwise(0L)).as("n_images"),
        sum(when(col(kindCol) === "audio", 1L).otherwise(0L)).as("n_audio"),
        sum(when(col(kindCol) === "video", 1L).otherwise(0L)).as("n_video"))
    val joined = canon
      .join(Dedup.hintBroadcast(counts), col(idCol) === col("__mdoc__"), "left")
      .drop("__mdoc__")
      .na.fill(0L, Seq("n_images", "n_audio", "n_video"))
    val admitted =
      if (requireMedia)
        joined.where(col("n_images") + col("n_audio") + col("n_video") > 0)
      else joined
    Packing.packSequences(admitted, idCol, col("bpe_tokens"), capacity, nStreams)
  }

  /** The flagship flow with a DSIR selection stage in place of the
    * stratum rebalance — pick the `nSelect` documents whose hashed-n-gram
    * distribution best matches a `target` corpus (Xie et al. 2023),
    * sampled without replacement ∝ exp(score/τ):
    *
    *   1. quality gate + exact dedup       — [[cleanCorpus]]
    *   2. near-dup clusters → best doc     — [[canonicalize]]
    *   3. DSIR importance resampling       — [[Dsir.fitImportanceModel]]
    *      (raw distribution = the canonical pool itself, the faithful
    *      DSIR setup) + [[Dsir.resampleByImportance]]
    *   4. token-budget sequence packing    — [[Packing.packSequences]]
    *
    * The model fit is EAGER (one bounded count job over target ∪ pool), so
    * the canonical pool is frozen first — same rationale as the
    * matchDistribution freeze in [[prepareTrainingData]]: without it the
    * whole clean→cluster subtree would run once for the fit and again for
    * the draw. Output schema matches [[prepareTrainingData]]. */
  def prepareTrainingDataDsir(
      docs: DataFrame,
      textCol: String,
      idCol: String,
      target: DataFrame,
      nSelect: Int,
      minQuality: Double = 0.5,
      minTokens: Long = 20L,
      nearDupThreshold: Double = 1.0,
      shingleSize: Int = 3,
      nBuckets: Int = 8192,
      alpha: Double = 1.0,
      temperature: Double = 1.0,
      capacity: Long = 2048L,
      nStreams: Int = 64,
      seed: Long = 42L,
      chain: Option[DatasetBridge.FreezeChain] = None): DataFrame = {
    // the fit below is EAGER — freeze the canonical pool so the
    // clean→cluster subtree runs once, not once per consumer
    val frozen = freeze(canonicalCorpus(docs, textCol, idCol,
      minQuality, minTokens, nearDupThreshold, shingleSize, chain), chain)
    val model = Dsir.fitImportanceModel(target, frozen, textCol, nBuckets, alpha)
    val picked = Dsir.resampleByImportance(
      frozen, model, textCol, Seq(idCol), nSelect, temperature, seed)
    Packing.packSequences(picked, idCol, col("bpe_tokens"), capacity, nStreams)
  }

  /** Crawl → training tokens, end to end (the q128 capstone as an API):
    * WARC record walk → [[Extract.textFromHtmlBytes]] → Gopher gate (all
    * in ONE scan) → exact keep-first dedup → optional reference-LM
    * perplexity admission → [[Packing.packTokenStreams]] under EXACT BPE
    * budgets. Input: one WARC payload blob per row.
    *
    * The LM gate: pass `pplMax` finite to enable it. With `lm = None` the
    * model is fit on the SURVIVING pool's `docId % 3 == 0` slice
    * (self-bootstrapped — adequate when the crawl is mostly clean and the
    * gate only needs to shed outliers); pass a reference-fitted
    * [[TextAnalysis.StupidBackoffLm]] ([[TextAnalysis.loadLm]]) for the
    * CCNet configuration. The deduped pool freezes ONCE so the fit, the
    * scoring pass, and the packing reuse it instead of re-walking the
    * crawl; with the gate off, no freeze happens and the whole flow is
    * one declarative graph. Docs the LM cannot score (< 3 tokens) are
    * rejected when the gate is on (the admission convention). */
  def prepareWebCorpus(
      payloads: DataFrame,
      idCol: String,
      payloadCol: String,
      gopher: TextAnalysis.GopherThresholds = TextAnalysis.GopherThresholds(),
      pplMax: Double = Double.PositiveInfinity,
      lm: Option[TextAnalysis.StupidBackoffLm] = None,
      vocab: graft.functions.BpeVocab = graft.functions.BpeVocab.Builtin,
      capacity: Long = 2048L,
      nStreams: Int = 64,
      chain: Option[DatasetBridge.FreezeChain] = None): DataFrame = {
    require(pplMax > 0, s"pplMax must be positive, got $pplMax")
    val recs = payloads.select(col(idCol),
        explode(graft.functions.WarcFunctions.warcRecords(col(payloadCol))).as("__r__"))
      .where(col("__r__.rec_type") === "response")
      .select(col(idCol), Extract.textFromHtmlBytes(col("__r__.body")).as("__text__"))
    val kept = recs.where(TextAnalysis.gopherPasses(col("__text__"), gopher))
    val deduped = Dedup.dropExact(kept, "__text__", idCol)
    val admitted =
      if (pplMax.isInfinite) deduped
      else {
        val pool = freeze(deduped, chain)
        // the LM stage deliberately RECOMPUTES over the frozen pool: the
        // pool is already materialized blocks, so fit/score re-reads are
        // local block IO, not corpus scans — the corpus is read once by
        // the crawl scan above regardless. (An ngramHashPool cache on top
        // measured slower at sf0.1: it trades block re-reads for a
        // ~2x-bigger cache write. The pool APIs are for corpora that are
        // NOT already frozen — see q125/q126.)
        val m = lm.getOrElse(TextAnalysis.fitStupidBackoffLm(
          pool.where(col(idCol) % 3 === 0), "__text__"))
        val scored = TextAnalysis.stupidBackoffPerplexity(pool, "__text__", idCol, m)
        pool.join(scored.where(col("ppl3") <= pplMax).select(idCol), Seq(idCol))
      }
    Packing.packTokenStreams(admitted, idCol, "__text__", vocab, capacity, nStreams)
  }
}
