package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dsir, QualityClassifier}

/** Model-scored admission gates for streaming ingest — the fit-once,
  * score-forever composition of the persisted selection models
  * ([[graft.ops.Dsir.saveModel]] / [[graft.ops.QualityClassifier.saveModel]])
  * into a Structured Streaming pipeline.
  *
  * Both scores are pure codegen'd projections (the
  * [[graft.functions.HashedGramScore]] kernel over broadcast-able model
  * weights), so admission is STATELESS: no state store, no watermark
  * requirement, per-batch cost linear in batch size and flat in stream
  * age. That is the correct 100 TB ingest shape — the model is fit in one
  * bounded offline job (reduce side ≤ nBuckets rows regardless of corpus
  * size), saved as an m-row parquet, and every ingest executor scores at
  * read throughput with zero shuffle. Compose BEFORE the stateful dedup
  * stages ([[StreamingDedup]]) so rejected documents never enter the
  * dedup state store.
  *
  * Batch/stream parity: the returned plan is the same Column tree on a
  * batch frame, so `dsirAdmission(batchDf, …)` is the exact batch
  * equivalent — StreamingSelectionSpec pins stream ≡ batch admission on
  * the same corpus, model reloaded from disk on both paths.
  */
object StreamingSelection {

  /** Gate a (streaming or batch) DataFrame on the DSIR importance
    * log-weight: keep documents scoring ≥ `threshold` under the model at
    * `modelPath`, with the score exposed as `scoreCol` for downstream
    * mixing/telemetry. NULL text scores as the empty document (0.0 — no
    * grams), matching [[Dsir.resampleByImportance]]'s coalesce. */
  def dsirAdmission(
      spark: SparkSession,
      df: DataFrame,
      modelPath: String,
      textCol: String,
      threshold: Double,
      scoreCol: String = "dsir_score"): DataFrame =
    admit(df, Dsir.importanceScore(Dsir.loadModel(spark, modelPath),
      coalesce(col(textCol), lit(""))), threshold, scoreCol)

  /** Same gate under an in-memory model (fit in the same job, or loaded
    * once and reused across many streams). */
  def dsirAdmission(
      df: DataFrame,
      model: Dsir.DsirModel,
      textCol: String,
      threshold: Double): DataFrame =
    admit(df, Dsir.importanceScore(model, coalesce(col(textCol), lit(""))),
      threshold, "dsir_score")

  /** Gate on the trained quality-classifier probability σ(margin) ≥
    * `threshold` — the fastText-filter ingest stage (threshold 0.5 is the
    * decision boundary; corpus-mix targets usually gate higher). */
  def classifierAdmission(
      spark: SparkSession,
      df: DataFrame,
      modelPath: String,
      textCol: String,
      threshold: Double,
      scoreCol: String = "quality_score"): DataFrame =
    admit(df, QualityClassifier.classifierScore(
      QualityClassifier.loadModel(spark, modelPath), col(textCol)),
      threshold, scoreCol)

  /** Same gate under an in-memory classifier model. */
  def classifierAdmission(
      df: DataFrame,
      model: QualityClassifier.QualityModel,
      textCol: String,
      threshold: Double): DataFrame =
    admit(df, QualityClassifier.classifierScore(model, col(textCol)),
      threshold, "quality_score")

  /** Gate on the trained one-vs-rest language classifier: keep documents
    * whose argmax-margin language is in `keepLangs`, exposing the
    * prediction as `langCol` — the CCNet-style langid ingest stage. Like
    * the other gates this is a STATELESS codegen projection (K fused byte
    * passes per doc), so it composes before the dedup state stores and
    * its per-batch cost is flat in stream age. */
  def languageAdmission(
      spark: SparkSession,
      df: DataFrame,
      modelPath: String,
      textCol: String,
      keepLangs: Set[String]): DataFrame =
    languageAdmission(df, graft.ops.LangId.loadModel(spark, modelPath),
      textCol, keepLangs)

  /** Same gate under an in-memory langid model. */
  def languageAdmission(
      df: DataFrame,
      model: graft.ops.LangId.LangIdModel,
      textCol: String,
      keepLangs: Set[String],
      langCol: String = "pred_lang"): DataFrame = {
    require(keepLangs.nonEmpty, "keepLangs must name at least one language")
    val unknown = keepLangs.diff(model.classes.toSet)
    require(unknown.isEmpty,
      s"keepLangs ${unknown.mkString(",")} not among the model's classes " +
        model.classes.mkString(","))
    require(!df.columns.contains(langCol),
      s"admission writes '$langCol'; rename the input column or pass a different langCol")
    df.withColumn(langCol, graft.ops.LangId.predictLanguage(model, col(textCol)))
      .where(col(langCol).isin(keepLangs.toSeq.sorted: _*))
  }

  /** Gate on reference-LM perplexity: keep documents scoring ppl ≤
    * `maxPpl` under a [[graft.ops.TextAnalysis.StupidBackoffLm]] kernel —
    * the CCNet ingest rule (LOW perplexity ≈ reference-like text). The
    * kernel ships the whole model per worker (the paper's own KenLM
    * deployment), so the gate stays a stateless codegen projection like
    * every other admission here. Documents the LM cannot score (< 3
    * tokens / NULL text) are REJECTED by default — an unscorable doc
    * cannot certify itself; pass `keepUnscored = true` to let them
    * through with a NULL score. */
  def perplexityAdmission(
      df: DataFrame,
      kernel: graft.functions.BackoffLmKernel,
      textCol: String,
      maxPpl: Double,
      keepUnscored: Boolean = false,
      scoreCol: String = "ppl3"): DataFrame = {
    require(!df.columns.contains(scoreCol),
      s"admission writes '$scoreCol'; rename the input column or pass a different scoreCol")
    val scored = df.withColumn(scoreCol,
      graft.ops.TextAnalysis.backoffPerplexityScore(col(textCol), kernel))
    if (keepUnscored)
      scored.where(col(scoreCol).isNull || col(scoreCol) <= lit(maxPpl))
    else scored.where(col(scoreCol) <= lit(maxPpl))
  }

  /** Same gate from a persisted [[graft.ops.TextAnalysis.saveLm]] model
    * directory (sig-verified load, then one kernel build). */
  def perplexityAdmission(
      spark: SparkSession,
      df: DataFrame,
      modelPath: String,
      textCol: String,
      maxPpl: Double): DataFrame =
    perplexityAdmission(df,
      graft.ops.TextAnalysis.lmKernel(graft.ops.TextAnalysis.loadLm(spark, modelPath)),
      textCol, maxPpl)

  private def admit(
      df: DataFrame,
      score: Column,
      threshold: Double,
      scoreCol: String): DataFrame = {
    require(!df.columns.contains(scoreCol),
      s"admission writes '$scoreCol'; rename the input column or pass a different scoreCol")
    df.withColumn(scoreCol, score).where(col(scoreCol) >= lit(threshold))
  }
}
