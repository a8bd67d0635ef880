package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.StringFunctions

/** fastText-style quality classifier (Joulin et al. 2016,
  * arXiv:1607.01759) — the standard trained companion to [[Dsir]]'s
  * untrained naive-Bayes log-odds: a linear model over hashed
  * bag-of-ngram features, fit by logistic regression on "target corpus
  * vs raw pool" labels, scored as a pure projection.
  *
  * Shares [[Dsir]]'s feature extraction verbatim (word 1+2-grams, XXH64,
  * `pmod` into `nBuckets` buckets — the [[graft.functions.WordNGramHashes]]
  * kernel), so a fitted model is directly comparable to a DSIR model on
  * the same corpora. Features are MEAN-normalized per document
  * (fastText's input averaging): `x_b = count_b / n` with `n` the
  * document's total gram count (`2·words − 1`), so the margin scale is
  * independent of document length.
  *
  * '''Training''' is full-batch gradient descent on the logistic loss,
  * one Spark pass per epoch:
  *   - margin `m_i = β + (Σ_grams w[bucket]) / n_i` via the codegen'd
  *     [[graft.functions.HashedGramScore]] kernel with the CURRENT
  *     weights — bit-identical to the scoring path;
  *   - per-bucket gradient `Σ_i (σ(m_i) − y_i)·x_ib` collected by
  *     exploding gram buckets with map-side combine — the shuffle carries
  *     8-byte bucket ids, the reduce side is ≤ nBuckets+1 rows per epoch
  *     REGARDLESS of corpus size (the `+1` is a sentinel `b = −1` row
  *     carrying the bias gradient, so fit is one job per epoch);
  *   - driver update `w ← w − lr·(grad/N)`, `β ← β − lr·(gradβ/N)`.
  *
  * At 100 TB the fit is epochs× the cost of a DSIR fit (same
  * explode-and-count shape, same bounded reduce), the model is nBuckets
  * doubles, and scoring — like DSIR scoring — is whole-stage-codegen
  * with zero shuffle, so a saved model gates streaming ingest at ingest
  * throughput ([[graft.streaming.StreamingSelection]]).
  *
  * Determinism: given the same inputs the fitted weights are reproducible
  * to the last ulp up to fp summation order of the per-bucket gradient
  * sums (Spark partial-aggregation order — the same ~1 ulp caveat as
  * every `sum` in the engine); queries compare scores under `round(…, 6)`.
  */
object QualityClassifier {

  /** Fitted linear model: per-bucket weights + intercept, with the fit
    * configuration for provenance. */
  final case class QualityModel(
      weights: scala.collection.immutable.IndexedSeq[Double],
      bias: Double,
      lr: Double,
      epochs: Int,
      nDocs: Long) {
    def nBuckets: Int = weights.length
  }

  /** Per-gram bucket ids in stream order (unigrams then bigrams) — the
    * gradient-side view of the same feature extraction the score kernel
    * folds over. */
  private[ops] def gramBuckets(text: Column, m: Int): Column =
    transform(Dsir.gramHashes(text), h => pmod(h, lit(m.toLong)))

  /** Total gram count `2·words − 1` (0 for an empty doc) as a double —
    * the mean-normalization denominator. Tokenization is the kernel's
    * (engine whitespace class), NOT a regex split, so fit/score/count
    * agree on adversarial whitespace. */
  private[ops] def gramCount(text: Column): Column = {
    val nt = size(StringFunctions.wordNGramHashes(text, 1))
    when(nt === 0, lit(0.0)).otherwise((nt * 2 - 1).cast("double"))
  }

  /** The linear margin `bias + (w·grams)/n` — shared verbatim by every
    * fit epoch and by [[classifierScore]], so the final scores are
    * bit-identical to the last epoch's internal forward pass. The fused
    * [[graft.functions.HashedGramMeanScore]] kernel computes the
    * mean-normalized sum in ONE byte pass (no gram-array
    * materialization); its value contract is bit-identical to the
    * `hashedGramScore(t, w) / gramCount(t)` composition (pinned in
    * QualityClassifierSpec). */
  private[ops] def marginCol(weights: Seq[Double], bias: Double, text: Column): Column =
    lit(bias) + StringFunctions.hashedGramMeanScore(text, weights)

  /** The composed form of [[marginCol]]'s mean term — kept as the
    * executable statement of the fused kernel's value contract. */
  private[graft] def meanScoreComposed(weights: Seq[Double], text: Column): Column = {
    val n = gramCount(text)
    when(n === lit(0.0), lit(0.0))
      .otherwise(StringFunctions.hashedGramScore(text, weights) / n)
  }

  private[ops] def sigmoid(m: Column): Column = lit(1.0) / (lit(1.0) + exp(-m))

  /** Fit target-vs-raw logistic weights over hashed gram buckets.
    * `target` docs are labeled 1, `raw` docs 0 (a raw pool that CONTAINS
    * target-like docs is fine — the classifier learns the direction, as
    * in the standard CCNet/fastText quality-filter setup). NULL text
    * trains as the empty document. */
  def fitQualityClassifier(
      target: DataFrame,
      raw: DataFrame,
      textCol: String,
      nBuckets: Int = 8192,
      epochs: Int = 3,
      lr: Double = 0.5): QualityModel = {
    require(nBuckets >= 1 && nBuckets <= (1 << 24),
      s"nBuckets must be in [1, 2^24], got $nBuckets")
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    require(lr > 0.0, s"learning rate must be positive, got $lr")
    val t = coalesce(col(textCol), lit("")).as("__t__")
    val pool = target.select(lit(1).as("__y__"), t)
      .unionByName(raw.select(lit(0).as("__y__"), t))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val nDocs = pool.count()
      require(nDocs > 0, "fitQualityClassifier needs at least one document")
      val nD = nDocs.toDouble
      val w = new Array[Double](nBuckets)
      var bias = 0.0
      var e = 0
      while (e < epochs) {
        val txt = col("__t__")
        // snapshot the weights: the expression tree must not see the
        // in-place update below
        val wNow = scala.collection.immutable.ArraySeq.unsafeWrapArray(w.clone())
        val g = sigmoid(marginCol(wNow, bias, txt)) - col("__y__").cast("double")
        // one (bucket, g/n) row per gram occurrence + one sentinel
        // (-1, g) row per doc for the bias gradient — a single
        // explode/agg job with map-side combine
        val grads = pool
          .select(g.as("__g__"), gramCount(txt).as("__n__"),
            gramBuckets(txt, nBuckets).as("__bk__"))
          .select(explode(concat(
            transform(col("__bk__"),
              b => struct(b.as("b"), (col("__g__") / col("__n__")).as("gd"))),
            array(struct(lit(-1L).as("b"), col("__g__").as("gd"))))).as("__x__"))
          .groupBy(col("__x__").getField("b").as("b"))
          .agg(sum(col("__x__").getField("gd")).as("gs"))
          .collect()
        var biasGrad = 0.0
        grads.foreach { r =>
          val b = r.getLong(0)
          val gs = r.getDouble(1)
          // EXACTLY the oracle's IEEE tree: lr * (grad / N), subtracted —
          // untouched buckets stay bit-identical on both engines because
          // x − lr·(0/N) ≡ x
          if (b == -1L) biasGrad = gs
          else w(b.toInt) = w(b.toInt) - lr * (gs / nD)
        }
        bias = bias - lr * (biasGrad / nD)
        e += 1
      }
      QualityModel(scala.collection.immutable.ArraySeq.unsafeWrapArray(w),
        bias, lr, epochs, nDocs)
    } finally pool.unpersist()
  }

  /** Per-document quality probability `σ(bias + (w·grams)/n)` under a
    * fitted model — a codegen'd zero-shuffle projection. NULL text scores
    * as the empty document (the bias-only margin), matching the fit. */
  def classifierScore(model: QualityModel, text: Column): Column =
    sigmoid(marginCol(model.weights, model.bias, coalesce(text, lit(""))))

  /** Deterministic 64-bit fingerprint — same contract as
    * [[Dsir.modelSig]]: two models agree on the sig iff they score
    * identically. */
  def modelSig(model: QualityModel): Long = {
    var h = 0x9E3779B97F4A7C15L
    def mix(v: Long): Unit = {
      h ^= v; h *= 0xC2B2AE3D27D4EB4FL; h = java.lang.Long.rotateLeft(h, 31)
    }
    mix(model.nBuckets.toLong)
    mix(java.lang.Double.doubleToLongBits(model.bias))
    mix(java.lang.Double.doubleToLongBits(model.lr))
    mix(model.epochs.toLong)
    mix(model.nDocs)
    model.weights.foreach(d => mix(java.lang.Double.doubleToLongBits(d)))
    h
  }

  /** Persist as a tiny one-row-per-bucket parquet (fit config + sig
    * repeated), the [[Dsir.saveModel]] fit-once-reuse shape: fit in one
    * bounded job, reload in every downstream scoring/ingest job. */
  def saveModel(spark: org.apache.spark.sql.SparkSession, model: QualityModel, path: String): Unit = {
    import spark.implicits._
    val sig = modelSig(model)
    model.weights.zipWithIndex
      .map { case (wt, b) =>
        (b, wt, model.bias, model.lr, model.epochs, model.nDocs, sig)
      }
      .toDF("b", "weight", "bias", "lr", "epochs", "n_docs", "model_sig")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Reload a [[saveModel]] model, verifying bucket contiguity and the
    * embedded content sig (truncated/edited files fail fast). */
  def loadModel(spark: org.apache.spark.sql.SparkSession, path: String): QualityModel = {
    val rows = spark.read.parquet(path).collect()
    require(rows.nonEmpty, s"empty quality-classifier model at $path")
    val m = rows.length
    val w = new Array[Double](m)
    var bias = 0.0; var lr = 0.0; var epochs = 0; var nDocs = 0L; var sig = 0L
    rows.foreach { r =>
      val b = r.getAs[Int]("b")
      require(b >= 0 && b < m, s"bucket id $b outside [0, $m) — truncated model?")
      w(b) = r.getAs[Double]("weight")
      bias = r.getAs[Double]("bias")
      lr = r.getAs[Double]("lr")
      epochs = r.getAs[Int]("epochs")
      nDocs = r.getAs[Long]("n_docs")
      sig = r.getAs[Long]("model_sig")
    }
    val model = QualityModel(scala.collection.immutable.ArraySeq.unsafeWrapArray(w),
      bias, lr, epochs, nDocs)
    require(modelSig(model) == sig,
      s"quality-classifier model at $path fails its content sig — corrupt or edited file")
    model
  }
}
