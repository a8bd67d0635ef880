package graft

import org.apache.spark.sql.functions._

import graft.ops.{LangId, QualityClassifier}

/** Trained one-vs-rest language ID: binary-case parity with the
  * single-class quality classifier, separation on a multilingual fixture,
  * deterministic argmax tie-breaking, persistence round-trip, and the
  * NULL-text / NULL-label contracts. */
class LangIdSpec extends SparkSpecBase {
  import spark.implicits._

  // distinct per-language vocabularies: the hashed 1+2-gram buckets are
  // disjoint with overwhelming probability at 4096 buckets
  private val enDocs = Seq(
    "the cat sat on the mat", "the dog ran in the park",
    "a bird flew over the house", "the sun rose over the hill")
  private val deDocs = Seq(
    "die katze sass auf der matte", "der hund lief im garten",
    "ein vogel flog ueber das haus", "die sonne ging ueber dem berg auf")
  private val frDocs = Seq(
    "le chat dormait sur le tapis", "le chien courait dans le parc",
    "un oiseau volait sur la maison", "le soleil se levait sur la colline")

  private def fixture = (
    enDocs.map(("en", _)) ++ deDocs.map(("de", _)) ++ frDocs.map(("fr", _))
  ).zipWithIndex.map { case ((l, t), i) => (i.toLong, l, t) }
    .toDF("doc_id", "lang", "text")

  test("binary one-vs-rest fit reproduces the single-class classifier") {
    // classes {neg, pos}: the 'pos' chain solves EXACTLY the problem
    // fitQualityClassifier(target = pos docs, raw = neg docs) solves —
    // same labels, same pool, same update tree
    val pos = enDocs.zipWithIndex.map { case (t, i) => (i.toLong, "pos", t) }
    val neg = deDocs.zipWithIndex.map { case (t, i) => (i.toLong + 100, "neg", t) }
    val d = (pos ++ neg).toDF("doc_id", "lang", "text")
    val multi = LangId.fitLangId(d, "text", "lang", nBuckets = 512, epochs = 3, lr = 0.5)
    val single = QualityClassifier.fitQualityClassifier(
      d.where(col("lang") === "pos"), d.where(col("lang") === "neg"), "text",
      nBuckets = 512, epochs = 3, lr = 0.5)
    assert(multi.classes == Vector("neg", "pos"))
    val posIdx = multi.classes.indexOf("pos")
    // fp-summation order differs between the two pools (union vs single
    // frame), so compare to 1e-12, not bit-exactly
    assert(math.abs(multi.biases(posIdx) - single.bias) < 1e-12)
    multi.weights(posIdx).zip(single.weights).zipWithIndex.foreach {
      case ((a, b), i) => assert(math.abs(a - b) < 1e-12, s"bucket $i: $a vs $b")
    }
    // and the 'neg' chain is the mirrored problem
    val singleNeg = QualityClassifier.fitQualityClassifier(
      d.where(col("lang") === "neg"), d.where(col("lang") === "pos"), "text",
      nBuckets = 512, epochs = 3, lr = 0.5)
    val negIdx = multi.classes.indexOf("neg")
    assert(math.abs(multi.biases(negIdx) - singleNeg.bias) < 1e-12)
    multi.weights(negIdx).zip(singleNeg.weights).foreach {
      case (a, b) => assert(math.abs(a - b) < 1e-12)
    }
  }

  test("separation: every fixture doc classifies to its own language") {
    val d = fixture
    val model = LangId.fitLangId(d, "text", "lang", nBuckets = 4096, epochs = 25, lr = 1.0)
    assert(model.classes == Vector("de", "en", "fr"))
    val got = d.select(col("lang"),
      LangId.predictLanguage(model, col("text")).as("pred"),
      LangId.languageMargins(model, col("text")).as("margins"))
      .collect()
    got.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"doc of lang ${r.getString(0)} predicted ${r.getString(1)}")
      // decisive argmax: the winner clears the runner-up by a real gap
      // (one-vs-rest sigmoids sit below 0.5 this early — the ⅓ positive
      // rate pulls every bias negative — but the RANKING must be firm)
      val m = r.getSeq[Double](2).sorted.reverse
      assert(m(0) - m(1) > 0.1, s"margin gap ${m(0) - m(1)} too small")
    }
    // held-out text with the same vocabularies still classifies
    val held = Seq((0L, "the cat ran in the house"), (1L, "der hund auf der matte"),
      (2L, "le chat dans la maison")).toDF("doc_id", "text")
    val preds = held.select(LangId.predictLanguage(model, col("text")))
      .collect().map(_.getString(0)).toSeq
    assert(preds == Seq("en", "de", "fr"))
  }

  test("argmax ties break to the first sorted class; NULL text is bias-only") {
    // hand-built model with identical per-class parameters: every margin
    // ties, so argmax must return the FIRST class deterministically
    val w = scala.collection.immutable.ArraySeq.fill(8)(0.1)
    val tied = LangId.LangIdModel(
      Vector("aa", "bb", "cc"), Vector(w, w, w), Vector(0.2, 0.2, 0.2),
      lr = 0.5, epochs = 1, nDocs = 3L)
    val d = Seq((0L, "some text here"), (1L, null: String)).toDF("doc_id", "text")
    val got = d.orderBy("doc_id").select(
      LangId.predictLanguage(tied, col("text")),
      LangId.languageConfidence(tied, col("text"))).collect()
    assert(got(0).getString(0) == "aa")
    assert(got(1).getString(0) == "aa")
    // NULL text → empty doc → margin = bias only
    assert(math.abs(got(1).getDouble(1) - 1.0 / (1.0 + math.exp(-0.2))) < 1e-15)
  }

  test("NULL labels are dropped from the fit; fewer than 2 classes refused") {
    val d = Seq((0L, "en", "the cat"), (1L, "de", "die katze"),
      (2L, null: String, "poison")).toDF("doc_id", "lang", "text")
    val model = LangId.fitLangId(d, "text", "lang", nBuckets = 64, epochs = 1)
    assert(model.nDocs == 2L && model.classes == Vector("de", "en"))
    intercept[IllegalArgumentException] {
      LangId.fitLangId(d.where(col("lang") === "en"), "text", "lang", nBuckets = 64)
    }
  }

  test("cleanCorpus language gate keeps only model-predicted languages") {
    val model = LangId.fitLangId(fixture, "text", "lang", nBuckets = 4096,
      epochs = 10, lr = 1.0)
    // long enough docs to clear minTokens=3; quality gate off (0.0)
    val d = Seq(
      (0L, "the cat sat on the mat today"),
      (1L, "die katze sass auf der matte heute"),
      (2L, "le chat dormait sur le tapis aujourd'hui")
    ).toDF("doc_id", "text")
    val kept = graft.ops.Pipeline.cleanCorpus(
      d, "text", "doc_id", minQuality = 0.0, minTokens = 3L,
      langModel = model, keepLangs = Set("en", "de"))
      .select("doc_id", "pred_lang").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(kept == Seq((0L, "en"), (1L, "de"))) // fr doc gated out
    intercept[IllegalArgumentException] {
      graft.ops.Pipeline.cleanCorpus(d, "text", "doc_id", 0.0, 3L,
        model, Set("xx"))
    }
  }

  test("save/load round-trips the model (sig-verified)") {
    val model = LangId.fitLangId(fixture, "text", "lang", nBuckets = 256, epochs = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-langid-").toString
    try {
      LangId.saveModel(spark, model, s"$dir/m")
      val back = LangId.loadModel(spark, s"$dir/m")
      assert(back == model)
      assert(LangId.modelSig(back) == LangId.modelSig(model))
      // corruption fails fast: drop one class's rows
      spark.read.parquet(s"$dir/m").where(col("lang") =!= "de")
        .write.mode("overwrite").parquet(s"$dir/bad")
      intercept[IllegalArgumentException] { LangId.loadModel(spark, s"$dir/bad") }
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }
}
