package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Trained language identification — the standard pipeline langid stage
  * (CCNet / RedPajama run a fastText language classifier; Joulin et al.
  * 2016, arXiv:1607.01759): a ONE-VS-REST multi-class generalization of
  * [[QualityClassifier]]'s logistic model over the same hashed word
  * 1+2-gram buckets ([[Dsir.gramHashes]], XXH64 → `pmod`), replacing the
  * stopword-marker heuristic in [[TextAnalysis]] as the production
  * language gate.
  *
  * '''Model''': per class `k` a weight vector `w_k` (nBuckets doubles)
  * and bias `β_k`; the per-class margin is `β_k + (Σ_grams w_k[b]) / n`
  * (mean-normalized, the [[graft.functions.HashedGramMeanScore]] kernel),
  * the predicted language is the argmax margin (ties → first class in
  * sorted-label order), and the reported confidence is the winning
  * margin's sigmoid — one-vs-rest's per-class probability, NOT a softmax
  * over classes (fastText's `predict` equivalent for independently
  * fitted binary classifiers).
  *
  * '''Training''' is K independent full-batch logistic GD problems
  * (label `y_k = 1` iff the doc's label equals class k) — but fitted in
  * ONE Spark job per epoch, not K: each doc computes all K margins (K
  * fused kernel passes inside one codegen'd projection), the exploded
  * gram-bucket rows carry the K-vector of per-class gradients, and the
  * reduce emits ≤ nBuckets+1 rows of K sums (map-side combined). Driver
  * update per class: `w_k ← w_k − lr·(grad_k/N)`, `β_k ← β_k −
  * lr·(gradβ_k/N)` — the same IEEE expression tree as the single-class
  * fit, so a one-vs-rest fit with classes {c, ¬c} reproduces
  * [[QualityClassifier.fitQualityClassifier]] on the equivalent pool.
  *
  * At 100 TB: the fit touches each doc's bytes K× per epoch (margins)
  * and shuffles 8-byte bucket ids + K×8-byte gradient vectors with
  * map-side combine — reduce-side state stays ≤ (nBuckets+1)·K doubles
  * REGARDLESS of corpus size. Scoring is a zero-shuffle codegen
  * projection (K byte passes per doc), so a saved model gates streaming
  * ingest at ingest throughput, exactly like the DSIR and quality
  * models.
  *
  * Determinism: same contract as [[QualityClassifier]] — reproducible to
  * fp summation order of the per-bucket gradient sums; oracle queries
  * compare under `round(…, 6)` (and the argmax is fragile only within
  * ~1 ulp margin ties, measure-zero on real fixtures).
  */
object LangId {

  /** Fitted one-vs-rest model: sorted class labels, per-class weights
    * (all `nBuckets` long) and biases, plus fit config for provenance. */
  final case class LangIdModel(
      classes: scala.collection.immutable.IndexedSeq[String],
      weights: scala.collection.immutable.IndexedSeq[scala.collection.immutable.IndexedSeq[Double]],
      biases: scala.collection.immutable.IndexedSeq[Double],
      lr: Double,
      epochs: Int,
      nDocs: Long) {
    require(classes.nonEmpty && classes.length == weights.length &&
      classes.length == biases.length, "inconsistent LangIdModel shape")
    def nBuckets: Int = weights.head.length
    def nClasses: Int = classes.length
  }

  /** Fit a one-vs-rest language classifier from labeled docs. Classes are
    * the SORTED distinct labels (deterministic class indexing); rows with
    * a NULL label are dropped (they cannot supervise), NULL text trains
    * as the empty document — both matching the scoring conventions. */
  def fitLangId(
      docs: DataFrame,
      textCol: String,
      labelCol: String,
      nBuckets: Int = 8192,
      epochs: Int = 3,
      lr: Double = 0.5): LangIdModel = {
    require(nBuckets >= 1 && nBuckets <= (1 << 24),
      s"nBuckets must be in [1, 2^24], got $nBuckets")
    require(epochs >= 1, s"epochs must be >= 1, got $epochs")
    require(lr > 0.0, s"learning rate must be positive, got $lr")
    val pool = docs
      .where(col(labelCol).isNotNull)
      .select(col(labelCol).cast("string").as("__lbl__"),
        coalesce(col(textCol), lit("")).as("__t__"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val classes = pool.select("__lbl__").distinct()
        .collect().map(_.getString(0)).sorted.toIndexedSeq
      require(classes.size >= 2,
        s"fitLangId needs >= 2 distinct labels, got ${classes.size}")
      val k = classes.size
      val nDocs = pool.count()
      val nD = nDocs.toDouble
      val w = Array.fill(k)(new Array[Double](nBuckets))
      val bias = new Array[Double](k)
      val txt = col("__t__")
      var e = 0
      while (e < epochs) {
        // snapshot per-class weights: the expression tree must not see
        // the in-place updates below
        val wNow = (0 until k).map(i =>
          scala.collection.immutable.ArraySeq.unsafeWrapArray(w(i).clone()))
        import QualityClassifier.{gramBuckets, gramCount, marginCol, sigmoid}
        // K gradients per doc in one projection; exploded bucket rows
        // carry the K-vector, the agg emits K sums per bucket
        val gArr = array((0 until k).map { i =>
          sigmoid(marginCol(wNow(i), bias(i), txt)) -
            when(col("__lbl__") === classes(i), lit(1.0)).otherwise(lit(0.0))
        }: _*)
        val aggs = (0 until k).map(i =>
          sum(element_at(col("__x__").getField("gd"), i + 1)).as(s"g$i"))
        val grads = pool
          .select(gArr.as("__g__"), gramCount(txt).as("__n__"),
            gramBuckets(txt, nBuckets).as("__bk__"))
          .select(explode(concat(
            transform(col("__bk__"),
              b => struct(b.as("b"),
                transform(col("__g__"), g => g / col("__n__")).as("gd"))),
            array(struct(lit(-1L).as("b"), col("__g__").as("gd"))))).as("__x__"))
          .groupBy(col("__x__").getField("b").as("b"))
          .agg(aggs.head, aggs.tail: _*)
          .collect()
        grads.foreach { r =>
          val b = r.getLong(0)
          var i = 0
          while (i < k) {
            val gs = r.getDouble(i + 1)
            // the single-class oracle IEEE tree, per class: lr*(grad/N)
            if (b == -1L) bias(i) = bias(i) - lr * (gs / nD)
            else w(i)(b.toInt) = w(i)(b.toInt) - lr * (gs / nD)
            i += 1
          }
        }
        e += 1
      }
      LangIdModel(classes,
        w.map(scala.collection.immutable.ArraySeq.unsafeWrapArray(_)).toIndexedSeq,
        scala.collection.immutable.ArraySeq.unsafeWrapArray(bias),
        lr, epochs, nDocs)
    } finally { pool.unpersist(); () }
  }

  /** Per-class margins `β_k + (w_k·grams)/n` as an array in class order —
    * a zero-shuffle codegen projection (K fused byte passes). NULL text
    * scores as the empty document (bias-only margins). */
  def languageMargins(model: LangIdModel, text: Column): Column = {
    val t = coalesce(text, lit(""))
    array((0 until model.nClasses).map(i =>
      QualityClassifier.marginCol(model.weights(i), model.biases(i), t)): _*)
  }

  /** Winning class index: argmax margin, ties → smallest class index
    * (struct max compares margin first, then the NEGATED index, so the
    * lexicographically greatest struct is the first-of-the-ties). */
  private def bestIdx(model: LangIdModel, text: Column): Column = {
    val t = coalesce(text, lit(""))
    val packed = array((0 until model.nClasses).map(i => struct(
      QualityClassifier.marginCol(model.weights(i), model.biases(i), t).as("m"),
      lit(-i).as("ni"))): _*)
    -array_max(packed).getField("ni")
  }

  /** Predicted language label (argmax margin, ties → first sorted
    * class). */
  def predictLanguage(model: LangIdModel, text: Column): Column =
    element_at(
      array(model.classes.map(lit(_)): _*), bestIdx(model, text) + 1)

  /** One-vs-rest confidence of the predicted language: σ of the winning
    * margin. */
  def languageConfidence(model: LangIdModel, text: Column): Column =
    QualityClassifier.sigmoid(
      array_max(languageMargins(model, text)))

  /** Deterministic 64-bit fingerprint — same contract as
    * [[QualityClassifier.modelSig]]: two models agree iff they predict
    * identically. */
  def modelSig(model: LangIdModel): Long = {
    var h = 0x9E3779B97F4A7C15L
    def mix(v: Long): Unit = {
      h ^= v; h *= 0xC2B2AE3D27D4EB4FL; h = java.lang.Long.rotateLeft(h, 31)
    }
    mix(model.nBuckets.toLong)
    mix(model.nClasses.toLong)
    mix(model.lr.hashCode().toLong)
    mix(model.epochs.toLong)
    mix(model.nDocs)
    model.classes.foreach(c => mix(c.hashCode.toLong))
    model.biases.foreach(b => mix(java.lang.Double.doubleToLongBits(b)))
    model.weights.foreach(_.foreach(d => mix(java.lang.Double.doubleToLongBits(d))))
    h
  }

  /** Persist as one row per (class, bucket) — the [[Dsir.saveModel]]
    * fit-once-reuse shape scaled by K. */
  def saveModel(spark: org.apache.spark.sql.SparkSession, model: LangIdModel, path: String): Unit = {
    import spark.implicits._
    val sig = modelSig(model)
    val rows = for {
      i <- model.classes.indices
      b <- 0 until model.nBuckets
    } yield (model.classes(i), b, model.weights(i)(b), model.biases(i),
      model.lr, model.epochs, model.nDocs, sig)
    rows.toDF("lang", "b", "weight", "bias", "lr", "epochs", "n_docs", "model_sig")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Reload a [[saveModel]] model, verifying shape and the embedded
    * content sig (truncated/edited files fail fast). */
  def loadModel(spark: org.apache.spark.sql.SparkSession, path: String): LangIdModel = {
    val rows = spark.read.parquet(path).collect()
    require(rows.nonEmpty, s"empty langid model at $path")
    val classes = rows.map(_.getAs[String]("lang")).distinct.sorted.toIndexedSeq
    val k = classes.size
    val idx = classes.zipWithIndex.toMap
    val m = rows.length / k
    require(m * k == rows.length,
      s"langid model at $path has ${rows.length} rows for $k classes — truncated?")
    val w = Array.fill(k)(new Array[Double](m))
    val bias = new Array[Double](k)
    var lr = 0.0; var epochs = 0; var nDocs = 0L; var sig = 0L
    rows.foreach { r =>
      val i = idx(r.getAs[String]("lang"))
      val b = r.getAs[Int]("b")
      require(b >= 0 && b < m, s"bucket id $b outside [0, $m) — truncated model?")
      w(i)(b) = r.getAs[Double]("weight")
      bias(i) = r.getAs[Double]("bias")
      lr = r.getAs[Double]("lr")
      epochs = r.getAs[Int]("epochs")
      nDocs = r.getAs[Long]("n_docs")
      sig = r.getAs[Long]("model_sig")
    }
    val model = LangIdModel(classes,
      w.map(scala.collection.immutable.ArraySeq.unsafeWrapArray(_)).toIndexedSeq,
      scala.collection.immutable.ArraySeq.unsafeWrapArray(bias),
      lr, epochs, nDocs)
    require(modelSig(model) == sig,
      s"langid model at $path fails its content sig — corrupt or edited file")
    model
  }
}
