package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.{Dsir, QualityClassifier}
import graft.streaming.StreamingSelection

/** Model-scored streaming admission: the persisted DSIR / classifier
  * models gate a MemoryStream exactly as they gate the same corpus in
  * batch, statelessly, across multiple triggers. */
class StreamingSelectionSpec extends SparkSpecBase {
  import spark.implicits._

  private val targetDocs = Seq(
    "alpha beta gamma delta", "alpha gamma beta", "beta delta alpha alpha",
    "gamma gamma alpha beta", "delta alpha beta")
  private val backgroundDocs = Seq(
    "omega psi chi phi", "psi omega phi", "chi chi omega psi",
    "phi psi omega omega", "omega chi psi", "alpha omega chi psi phi")
  private val corpus: Seq[(Long, String)] =
    (targetDocs ++ backgroundDocs).zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private lazy val corpusDf = corpus.toDF("doc_id", "text")
  private lazy val targetDf = corpusDf.where(col("doc_id") < targetDocs.size)

  test("DSIR admission: persisted model gates a stream exactly like batch, " +
    "statelessly, across triggers") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("dsir-admit").toString
    val path = s"$dir/model.parquet"
    Dsir.saveModel(spark,
      Dsir.fitImportanceModel(targetDf, corpusDf, "text", nBuckets = 128), path)

    // batch admission under the RELOADED model — the parity reference
    val batch = StreamingSelection.dsirAdmission(
      spark, corpusDf, path, "text", threshold = 0.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(batch.nonEmpty && batch.size < corpus.size,
      s"threshold must bind on the fixture: $batch")

    val input = MemoryStream[(Long, String)]
    val gated = StreamingSelection.dsirAdmission(
      spark, input.toDF().toDF("doc_id", "text"), path, "text", threshold = 0.0)
    assert(gated.isStreaming)
    val q = gated.writeStream.outputMode("append").format("memory")
      .queryName("sadmit").start()
    // three triggers, arrivals interleaving target-like and background docs
    corpus.grouped(4).foreach { chunk =>
      input.addData(chunk: _*)
      q.processAllAvailable()
    }
    val got = spark.table("sadmit").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    q.stop()
    assert(got == batch, s"stream == batch admission: $got vs $batch")
    // stateless: the streaming plan runs no stateful operators
    assert(q.lastProgress.stateOperators.isEmpty,
      "admission must not create a state store")
  }

  test("classifier admission: persisted quality model gates a stream " +
    "exactly like batch at a separating threshold") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("qc-admit").toString
    val path = s"$dir/model.parquet"
    val model = QualityClassifier.fitQualityClassifier(
      targetDf, corpusDf, "text", nBuckets = 128, epochs = 4, lr = 0.5)
    QualityClassifier.saveModel(spark, model, path)
    // the fixture's base rate is 5/16, so the calibrated probabilities sit
    // below 1/2 after a few epochs — gate at the midpoint between the two
    // classes' scores (how a real pipeline picks an operating point: from
    // the score distribution, not the nominal 0.5 boundary)
    val scores = corpusDf.select(col("doc_id"),
      QualityClassifier.classifierScore(model, col("text")).as("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val (tgt, bg) = scores.partition(_._1 < targetDocs.size)
    val threshold = (tgt.map(_._2).min + bg.map(_._2).max) / 2.0
    val batch = StreamingSelection.classifierAdmission(
      spark, corpusDf, path, "text", threshold)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(batch.nonEmpty && batch.size < corpus.size,
      s"threshold must bind on the fixture: $batch")
    // target-like docs are admitted; the pure-background docs are not
    assert(batch.keySet == (0L until targetDocs.size.toLong).toSet)

    val input = MemoryStream[(Long, String)]
    val gated = StreamingSelection.classifierAdmission(
      spark, input.toDF().toDF("doc_id", "text"), path, "text", threshold)
    val q = gated.writeStream.outputMode("append").format("memory")
      .queryName("sqcadmit").start()
    corpus.grouped(3).foreach { chunk =>
      input.addData(chunk: _*)
      q.processAllAvailable()
    }
    val got = spark.table("sqcadmit").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    q.stop()
    assert(got == batch, s"stream == batch admission: $got vs $batch")
  }

  test("admission refuses a score-column collision") {
    val model = Dsir.fitImportanceModel(targetDf, corpusDf, "text", nBuckets = 64)
    val clash = corpusDf.withColumn("dsir_score", lit(1.0))
    val e = intercept[IllegalArgumentException](
      StreamingSelection.dsirAdmission(clash, model, "text", 0.0))
    assert(e.getMessage.contains("dsir_score"))
  }

  test("language admission: persisted langid model gates a stream exactly " +
    "like batch") {
    implicit val sqlCtx = spark.sqlContext
    import graft.ops.LangId
    val labeled = Seq(
      (0L, "en", "the cat sat on the mat"), (1L, "en", "the dog ran in the park"),
      (2L, "de", "die katze sass auf der matte"), (3L, "de", "der hund lief im garten"),
      (4L, "fr", "le chat dormait sur le tapis"), (5L, "fr", "le chien courait dans le parc")
    ).toDF("doc_id", "lang", "text")
    val dir = java.nio.file.Files.createTempDirectory("lang-admit").toString
    val path = s"$dir/model.parquet"
    LangId.saveModel(spark,
      LangId.fitLangId(labeled, "text", "lang", nBuckets = 1024, epochs = 15, lr = 1.0), path)

    val feed = Seq(
      (10L, "the cat ran in the house"), (11L, "der hund auf der matte"),
      (12L, "le chat dans la maison"), (13L, "die sonne ueber dem garten"))
    val feedDf = feed.toDF("doc_id", "text")
    val batch = StreamingSelection.languageAdmission(
      spark, feedDf, path, "text", keepLangs = Set("en", "fr"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(batch.keySet == Set(10L, 12L)) // de arrivals gated out
    assert(batch(10L) == "en" && batch(12L) == "fr")

    val input = MemoryStream[(Long, String)]
    val gated = StreamingSelection.languageAdmission(
      spark, input.toDF().toDF("doc_id", "text"), path, "text", Set("en", "fr"))
    assert(gated.isStreaming)
    val q = gated.writeStream.outputMode("append").format("memory")
      .queryName("sladmit").start()
    feed.grouped(2).foreach { chunk =>
      input.addData(chunk: _*)
      q.processAllAvailable()
    }
    val got = spark.table("sladmit").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    q.stop()
    assert(got == batch, s"stream == batch admission: $got vs $batch")
    // unknown language and column collision both fail fast
    val model = LangId.loadModel(spark, path)
    intercept[IllegalArgumentException](
      StreamingSelection.languageAdmission(feedDf, model, "text", Set("xx")))
    intercept[IllegalArgumentException](
      StreamingSelection.languageAdmission(
        feedDf.withColumn("pred_lang", lit("en")), model, "text", Set("en")))
  }

  test("perplexity admission: persisted LM gates a stream exactly like batch, statelessly") {
    import graft.ops.TextAnalysis
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("lm-admit").toString
    // reference = the target-like half; low-ppl docs read like it
    TextAnalysis.saveLm(spark,
      TextAnalysis.fitStupidBackoffLm(targetDf, "text"), dir)
    // feed mixes reference-like, background, and unscorable docs
    val feed: Seq[(Long, String)] = corpus ++ Seq(
      (90L, "xy"),                         // < 3 tokens → unscorable
      (91L, null.asInstanceOf[String]))
    val feedDf = feed.toDF("doc_id", "text")
    // the fixture's scored tiers are deterministic: reference-like docs
    // land ≤ 2.0, the all-OOV background at exactly α²-backed 112.5 —
    // gate between them
    val kernel = TextAnalysis.lmKernel(TextAnalysis.loadLm(spark, dir))
    val maxPpl = 10.0
    val batch = StreamingSelection.perplexityAdmission(
      spark, feedDf, dir, "text", maxPpl)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(batch.nonEmpty && batch.size < feed.size - 2,
      s"threshold must bind: $batch")
    assert(!batch.contains(90L) && !batch.contains(91L),
      "unscorable docs are rejected by default")

    val input = MemoryStream[(Long, String)]
    val gated = StreamingSelection.perplexityAdmission(
      spark, input.toDF().toDF("doc_id", "text"), dir, "text", maxPpl)
    assert(gated.isStreaming)
    val q = gated.writeStream.outputMode("append").format("memory")
      .queryName("ppladmit").start()
    feed.grouped(5).foreach { chunk =>
      input.addData(chunk: _*)
      q.processAllAvailable()
    }
    val got = spark.table("ppladmit").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    q.stop()
    assert(got == batch, s"stream == batch admission: $got vs $batch")
    assert(q.lastProgress.stateOperators.isEmpty,
      "perplexity admission must not create a state store")
    // keepUnscored lets NULL-score docs through alongside the admitted set
    val lenient = StreamingSelection.perplexityAdmission(
      feedDf, kernel, "text", maxPpl, keepUnscored = true)
      .collect().map(_.getLong(0)).toSet
    assert(lenient == batch.keySet ++ Set(90L, 91L))
  }
}
