package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.{Dsir, QualityClassifier}

/** fastText-style quality classifier: the distributed logistic GD fit vs
  * a brute driver-side reimplementation, separation on a mixed fixture
  * (and agreement with DSIR log-odds direction), model persistence, and
  * the empty-document contract. */
class QualityClassifierSpec extends SparkSpecBase {
  import spark.implicits._

  // ---- brute reference (independent reimplementation) -------------------

  private def bruteTokens(s: String): Vector[String] = {
    val b = Vector.newBuilder[String]
    var i = 0
    while (i < s.length) {
      while (i < s.length && " \t\n\f\r".contains(s.charAt(i))) i += 1
      val start = i
      while (i < s.length && !" \t\n\f\r".contains(s.charAt(i))) i += 1
      if (i > start) b += s.substring(start, i)
    }
    b.result()
  }

  private def bruteGrams(s: String): Vector[String] = {
    val t = bruteTokens(s)
    t ++ t.sliding(2).filter(_.size == 2).map(_.mkString(" "))
  }

  private def bucket(gram: String, m: Int): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
      .hash(UTF8String.fromString(gram), StringType, 42L)
    (((h % m) + m) % m).toInt
  }

  /** Full-batch logistic GD exactly as the operator specifies it:
    * mean-normalized hashed-gram features, w ← w − lr·(grad/N). */
  private def bruteFit(
      target: Seq[String], raw: Seq[String], m: Int, epochs: Int, lr: Double):
      (Array[Double], Double) = {
    val docs = target.map(t => (t, 1.0)) ++ raw.map(t => (t, 0.0))
    val n = docs.size.toDouble
    val w = new Array[Double](m)
    var bias = 0.0
    (1 to epochs).foreach { _ =>
      val grad = new Array[Double](m)
      var bg = 0.0
      docs.foreach { case (text, y) =>
        val grams = bruteGrams(text)
        val gn = grams.size.toDouble
        val margin =
          if (grams.isEmpty) bias
          else bias + grams.foldLeft(0.0)((a, g) => a + w(bucket(g, m))) / gn
        val gi = 1.0 / (1.0 + math.exp(-margin)) - y
        grams.foreach(g => grad(bucket(g, m)) += gi / gn)
        bg += gi
      }
      (0 until m).foreach(b => w(b) = w(b) - lr * (grad(b) / n))
      bias = bias - lr * (bg / n)
    }
    (w, bias)
  }

  private def bruteScore(text: String, w: Array[Double], bias: Double): Double = {
    val grams = bruteGrams(text)
    val margin =
      if (grams.isEmpty) bias
      else bias + grams.foldLeft(0.0)((a, g) => a + w(bucket(g, w.length))) / grams.size
    1.0 / (1.0 + math.exp(-margin))
  }

  private val targetDocs = Seq(
    "alpha beta gamma delta", "alpha gamma beta", "beta delta alpha alpha",
    "gamma gamma alpha beta", "delta alpha beta")
  private val backgroundDocs = Seq(
    "omega psi chi phi", "psi omega phi", "chi chi omega psi",
    "phi psi omega omega", "omega chi psi")
  private val corpus: Seq[(Long, String)] =
    (targetDocs ++ backgroundDocs).zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private lazy val corpusDf = corpus.toDF("doc_id", "text").repartition(4)
  private lazy val targetDf = corpusDf.where(col("doc_id") < targetDocs.size)

  test("fitQualityClassifier matches the brute full-batch GD to fp-order ulps") {
    val m = 64
    val model = QualityClassifier.fitQualityClassifier(
      targetDf, corpusDf, "text", nBuckets = m, epochs = 3, lr = 0.5)
    val (ww, wb) = bruteFit(targetDocs, targetDocs ++ backgroundDocs, m, 3, 0.5)
    assert(model.nBuckets == m && model.epochs == 3 && model.lr == 0.5)
    assert(model.nDocs == 15L)
    // distributed gradient sums reorder the fp addends — agreement is to
    // summation-order ulps, far inside 1e-12
    (0 until m).foreach(b => assert(math.abs(model.weights(b) - ww(b)) < 1e-12,
      s"bucket $b: got ${model.weights(b)} want ${ww(b)}"))
    assert(math.abs(model.bias - wb) < 1e-12)
    // and the scoring column matches the brute forward pass
    val got = corpusDf.select(col("doc_id"),
      QualityClassifier.classifierScore(model, col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    corpus.foreach { case (id, text) =>
      assert(math.abs(got(id) - bruteScore(text, ww, wb)) < 1e-12, s"doc $id")
    }
  }

  test("separation on a mixed fixture: target docs outscore background docs, " +
    "agreeing with the DSIR log-odds direction") {
    val model = QualityClassifier.fitQualityClassifier(
      targetDf, corpusDf, "text", nBuckets = 256, epochs = 3, lr = 0.5)
    val dsir = Dsir.fitImportanceModel(targetDf, corpusDf, "text", nBuckets = 256)
    val scored = corpusDf.select(col("doc_id"),
      QualityClassifier.classifierScore(model, col("text")).as("qc"),
      Dsir.importanceScore(dsir, col("text")).as("ds"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val (tgt, bg) = scored.partition(_._1 < targetDocs.size)
    // every target doc beats every background doc on BOTH scores
    // (disjoint vocabularies), so the trained direction matches DSIR's
    // untrained log-odds direction
    assert(tgt.map(_._2).min > bg.map(_._2).max,
      s"classifier separation: $scored")
    assert(tgt.map(_._3).min > bg.map(_._3).max, s"dsir separation: $scored")
    // separation grows with training: 6 epochs widen the margin of 1
    val m1 = QualityClassifier.fitQualityClassifier(
      targetDf, corpusDf, "text", nBuckets = 256, epochs = 1, lr = 0.5)
    val m6 = QualityClassifier.fitQualityClassifier(
      targetDf, corpusDf, "text", nBuckets = 256, epochs = 6, lr = 0.5)
    def gap(m: QualityClassifier.QualityModel): Double = {
      val s = corpusDf.select(col("doc_id"),
        QualityClassifier.classifierScore(m, col("text")).as("s"))
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val (t, b) = s.partition(_._1 < targetDocs.size)
      t.map(_._2).min - b.map(_._2).max
    }
    assert(gap(m6) > gap(m1), "more epochs widen the separation")
  }

  test("NULL and empty text score the bias-only margin; zero-gram docs " +
    "still contribute the bias gradient") {
    val withEmpty = corpusDf.unionByName(
      Seq((100L, null.asInstanceOf[String]), (101L, "   \t  ")).toDF("doc_id", "text"))
    val model = QualityClassifier.fitQualityClassifier(
      targetDf, withEmpty, "text", nBuckets = 64, epochs = 2, lr = 0.5)
    val (ww, wb) = bruteFit(
      targetDocs, (targetDocs ++ backgroundDocs) ++ Seq("", ""), 64, 2, 0.5)
    assert(math.abs(model.bias - wb) < 1e-12,
      "empty docs count toward N and the bias gradient")
    val s = withEmpty.where(col("doc_id") >= 100L)
      .select(QualityClassifier.classifierScore(model, col("text")))
      .collect().map(_.getDouble(0))
    val want = 1.0 / (1.0 + math.exp(-model.bias))
    s.foreach(v => assert(v == want, "bias-only sigmoid for empty/NULL text"))
    (0 until 64).foreach(b => assert(math.abs(model.weights(b) - ww(b)) < 1e-12))
  }

  test("model save/load round-trips bit-exactly; tampered file fails the sig") {
    val model = QualityClassifier.fitQualityClassifier(
      targetDf, corpusDf, "text", nBuckets = 64, epochs = 3, lr = 0.25)
    val dir = java.nio.file.Files.createTempDirectory("qc-model").toString
    val path = s"$dir/model.parquet"
    QualityClassifier.saveModel(spark, model, path)
    val back = QualityClassifier.loadModel(spark, path)
    assert(back.weights == model.weights)
    assert(back.bias == model.bias && back.lr == model.lr)
    assert(back.epochs == model.epochs && back.nDocs == model.nDocs)
    val a = corpusDf.select(QualityClassifier.classifierScore(model, col("text")))
      .collect().map(_.getDouble(0))
    val b = corpusDf.select(QualityClassifier.classifierScore(back, col("text")))
      .collect().map(_.getDouble(0))
    assert(a.toSeq == b.toSeq)
    val edited = s"$dir/edited.parquet"
    spark.read.parquet(path)
      .withColumn("weight",
        when(col("b") === 3, col("weight") + 1.0).otherwise(col("weight")))
      .write.mode("overwrite").parquet(edited)
    val e = intercept[IllegalArgumentException](
      QualityClassifier.loadModel(spark, edited))
    assert(e.getMessage.contains("sig"))
  }

  test("fused mean-score kernel == composed hashedGramScore/gramCount, bit-exact, " +
    "on adversarial whitespace") {
    val weights = (0 until 64).map(b => math.sin(b.toDouble) / 7.0)
    val docs = Seq(
      "alpha beta gamma", " \t leading and trailing \n ", "", "   \t\n\f\r  ",
      "one", "a  b c", "tab\tsep\ttoks", "x\ny\fz\rw", "dup dup dup dup")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
      graft.functions.StringFunctions.hashedGramMeanScore(col("text"), weights).as("k"),
      graft.ops.QualityClassifier.meanScoreComposed(weights, col("text")).as("c"))
      .collect()
    got.foreach(r => assert(r.getDouble(1) == r.getDouble(2),
      s"doc ${r.getLong(0)}: kernel ${r.getDouble(1)} vs composed ${r.getDouble(2)}"))
    // NULL text → NULL from the kernel (callers coalesce upstream)
    val n = Seq((0L, null.asInstanceOf[String])).toDF("doc_id", "text")
      .select(graft.functions.StringFunctions.hashedGramMeanScore(col("text"), weights))
      .collect().head
    assert(n.isNullAt(0))
  }

  test("fit rejects bad configs") {
    intercept[IllegalArgumentException](QualityClassifier.fitQualityClassifier(
      targetDf, corpusDf, "text", nBuckets = 0))
    intercept[IllegalArgumentException](QualityClassifier.fitQualityClassifier(
      targetDf, corpusDf, "text", epochs = 0))
    intercept[IllegalArgumentException](QualityClassifier.fitQualityClassifier(
      targetDf, corpusDf, "text", lr = 0.0))
  }
}
