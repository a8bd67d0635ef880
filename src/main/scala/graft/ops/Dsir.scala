package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.StringFunctions

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): pick pretraining documents from a huge raw pool so
  * the selected set's n-gram distribution matches a small high-quality
  * target corpus.
  *
  * The published method, re-expressed Spark-first:
  *   1. '''Features''' — every word 1- and 2-gram occurrence, hashed into
  *      `nBuckets` buckets (hashed bag-of-ngrams, §3 of the paper). The
  *      gram stream comes from the codegen'd [[graft.functions.WordNGramHashes]]
  *      kernel (one byte pass per doc), bucketed by `pmod(xxhash64, m)`.
  *   2. '''Fit''' — bucket unigram+bigram counts on the target and on the
  *      raw pool give two smoothed categorical distributions p (target)
  *      and q (raw); the model is the per-bucket table
  *      `λ_b = ln((ct_b + α)/(Nt + α·m)) − ln((cr_b + α)/(Nr + α·m))`.
  *   3. '''Score''' — a document's importance log-weight is
  *      `Σ_grams λ_bucket(gram)` (the hashed naive-Bayes log-odds of
  *      target vs raw). Computed by the native [[graft.functions.HashedGramScore]]
  *      expression: a pure per-row projection, no shuffle, no join.
  *   4. '''Resample''' — sampling WITHOUT replacement with probability
  *      ∝ exp(score/τ) via the Gumbel top-k trick: key
  *      `g = score/τ − ln(−ln(u))` with `u` a seeded per-row hash uniform
  *      ([[Sampling.unif]] — deterministic under any partitioning), take
  *      the n largest keys.
  *
  * Scale shape at 100 TB: the fit explodes gram buckets but shuffles ONLY
  * 8-byte bucket ids with map-side partial aggregation — the reduce side
  * is ≤ m rows per distribution and the model is m doubles on the driver
  * (bounded by `nBuckets`, never by corpus size). Scoring is a
  * whole-stage-codegen projection that moves no data. The resample is
  * `TakeOrderedAndProject` — per-partition top-n heads merged once, never
  * a global sort; for samples beyond one node's head (n > ~10M) threshold
  * the score via [[Sampling.assignSplit]]-style hash cuts instead.
  */
object Dsir {

  /** Fitted importance model: `logRatio(b) = ln p(b) − ln q(b)` for each
    * hash bucket, plus the fit configuration for provenance. */
  final case class DsirModel(
      logRatio: scala.collection.immutable.IndexedSeq[Double],
      alpha: Double,
      nTargetGrams: Long,
      nRawGrams: Long) {
    def nBuckets: Int = logRatio.length
  }

  /** The positional hashed-gram stream of a document: every unigram XXH64
    * in position order, then every bigram — the feature extraction shared
    * verbatim by fit and score (and transcribed into the DuckDB oracle). */
  private[graft] def gramHashes(text: Column): Column =
    concat(
      StringFunctions.wordNGramHashes(text, 1),
      StringFunctions.wordNGramHashes(text, 2))

  /** Fit the per-bucket log-ratio model from a target corpus and the raw
    * pool. ONE union pass over both frames; the shuffle carries (bucket,
    * side) pairs pre-combined map-side, so reduce input is ≤ 2·m rows
    * regardless of corpus size. NULL text contributes no grams (it is not
    * a document for distribution purposes — same as empty text). */
  def fitImportanceModel(
      target: DataFrame,
      raw: DataFrame,
      textCol: String,
      nBuckets: Int = 8192,
      alpha: Double = 1.0): DsirModel = {
    require(nBuckets >= 1 && nBuckets <= (1 << 24),
      s"nBuckets must be in [1, 2^24], got $nBuckets")
    require(alpha > 0.0, s"smoothing alpha must be positive, got $alpha")
    def buckets(df: DataFrame, tag: Int): DataFrame =
      df.select(explode(gramHashes(col(textCol))).as("__h__"))
        .select(pmod(col("__h__"), lit(nBuckets)).cast("int").as("b"),
          lit(tag).as("__t__"))
    val counts = buckets(target, 1).unionByName(buckets(raw, 0))
      .groupBy("b")
      .agg(
        count(when(col("__t__") === 1, true)).as("ct"),
        count(when(col("__t__") === 0, true)).as("cr"))
      .collect()
    val ctArr = new Array[Long](nBuckets)
    val crArr = new Array[Long](nBuckets)
    counts.foreach { r =>
      val b = r.getInt(0)
      ctArr(b) = r.getLong(1)
      crArr(b) = r.getLong(2)
    }
    val nT = ctArr.sum
    val nR = crArr.sum
    val m = nBuckets.toDouble
    // EXACTLY the oracle's IEEE expression tree: (count + α) / (N + α·m),
    // two lns subtracted — any re-association here would break the
    // round(…, 6) cross-engine agreement the queries are hash-checked on
    val lr = Array.tabulate(nBuckets) { b =>
      math.log((ctArr(b) + alpha) / (nT.toDouble + alpha * m)) -
        math.log((crArr(b) + alpha) / (nR.toDouble + alpha * m))
    }
    DsirModel(scala.collection.immutable.ArraySeq.unsafeWrapArray(lr), alpha, nT, nR)
  }

  /** Per-document importance log-weight under `model` — a codegen'd
    * single-pass projection ([[graft.functions.HashedGramScore]]). NULL
    * text → NULL (coalesce upstream to score NULLs as empty docs). */
  def importanceScore(model: DsirModel, text: Column): Column =
    StringFunctions.hashedGramScore(text, model.logRatio)

  /** The HOF composition the native kernel is value-compatible with —
    * kept as the executable statement of the scoring contract (DsirSpec
    * pins kernel == composition on adversarial whitespace). */
  private[graft] def importanceScoreComposed(model: DsirModel, text: Column): Column = {
    val m = model.nBuckets
    aggregate(
      gramHashes(text),
      lit(0.0),
      (acc, h) => acc + element_at(
        typedLit(model.logRatio),
        (pmod(h, lit(m)) + lit(1)).cast("int")))
  }

  /** Deterministic 64-bit fingerprint of a fitted model — bitwise over the
    * log-ratio table and the fit configuration, so two models agree on the
    * sig iff they score identically. Stamped into [[saveModel]] output and
    * re-checked by [[loadModel]] (a truncated or hand-edited model file
    * fails fast instead of silently mis-scoring). */
  def modelSig(model: DsirModel): Long = {
    var h = 0x9E3779B97F4A7C15L
    def mix(v: Long): Unit = {
      h ^= v; h *= 0xC2B2AE3D27D4EB4FL; h = java.lang.Long.rotateLeft(h, 31)
    }
    mix(model.nBuckets.toLong)
    mix(java.lang.Double.doubleToLongBits(model.alpha))
    mix(model.nTargetGrams); mix(model.nRawGrams)
    model.logRatio.foreach(d => mix(java.lang.Double.doubleToLongBits(d)))
    h
  }

  /** Persist a fitted model as a tiny self-contained parquet (one row per
    * bucket, fit config + sig repeated — m rows total). The 100 TB usage
    * is fit-once-reuse: the model is fit in one bounded job over the big
    * corpora, saved, and every downstream ingest/scoring job reloads it
    * instead of re-counting. */
  def saveModel(spark: org.apache.spark.sql.SparkSession, model: DsirModel, path: String): Unit = {
    import spark.implicits._
    val sig = modelSig(model)
    model.logRatio.zipWithIndex
      .map { case (lr, b) =>
        (b, lr, model.alpha, model.nTargetGrams, model.nRawGrams, sig)
      }
      .toDF("b", "log_ratio", "alpha", "n_target_grams", "n_raw_grams", "model_sig")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Reload a [[saveModel]] model, verifying bucket contiguity and the
    * embedded content sig. */
  def loadModel(spark: org.apache.spark.sql.SparkSession, path: String): DsirModel = {
    val rows = spark.read.parquet(path).collect()
    require(rows.nonEmpty, s"empty DSIR model at $path")
    val m = rows.length
    val lr = new Array[Double](m)
    var alpha = 0.0; var nT = 0L; var nR = 0L; var sig = 0L
    rows.foreach { r =>
      val b = r.getAs[Int]("b")
      require(b >= 0 && b < m, s"bucket id $b outside [0, $m) — truncated model?")
      lr(b) = r.getAs[Double]("log_ratio")
      alpha = r.getAs[Double]("alpha")
      nT = r.getAs[Long]("n_target_grams"); nR = r.getAs[Long]("n_raw_grams")
      sig = r.getAs[Long]("model_sig")
    }
    val model = DsirModel(scala.collection.immutable.ArraySeq.unsafeWrapArray(lr), alpha, nT, nR)
    require(modelSig(model) == sig,
      s"DSIR model at $path fails its content sig — corrupt or edited file")
    model
  }

  /** Importance-resample `n` documents without replacement, inclusion
    * probability ∝ exp(score/temperature). Deterministic: the Gumbel
    * noise comes from the seeded row-id hash, so the same (corpus, model,
    * seed) selects the same documents under any partitioning or retry.
    * `idCols` values must be unique per row (they are the tiebreaker and
    * the noise source); `n` must fit one node's merged head — see
    * [[Sampling.maxSingleNodeN]]. */
  def resampleByImportance(
      df: DataFrame,
      model: DsirModel,
      textCol: String,
      idCols: Seq[String],
      n: Int,
      temperature: Double = 1.0,
      seed: Long = 42L): DataFrame = {
    require(n > 0, s"sample size must be positive, got $n")
    require(n <= Sampling.maxSingleNodeN,
      s"resampleByImportance materializes the n-row head on one node; n=$n " +
        s"exceeds ${Sampling.maxSingleNodeN} — threshold the score with a " +
        "hash-cut (assignSplit pattern) for huge samples")
    require(idCols.nonEmpty, "resampleByImportance needs id columns to hash")
    require(temperature > 0.0, s"temperature must be positive, got $temperature")
    require(!df.columns.contains("__g__"),
      "resampleByImportance uses '__g__' as its Gumbel-key temp column; rename the input column")
    val g = importanceScore(model, coalesce(col(textCol), lit(""))) / lit(temperature) -
      log(-log(Sampling.unif(idCols, seed)))
    df.withColumn("__g__", g)
      .orderBy(col("__g__").desc +: idCols.map(col): _*)
      .limit(n)
      .drop("__g__")
  }
}
