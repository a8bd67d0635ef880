package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.ops.Dsir

/** DSIR importance resampling: model fit, the native scoring kernel's
  * value contract, and the Gumbel top-k draw. */
class DsirSpec extends SparkSpecBase {
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

  private def bruteModel(
      target: Seq[String], raw: Seq[String], m: Int, alpha: Double): Array[Double] = {
    val ct = new Array[Long](m)
    val cr = new Array[Long](m)
    target.foreach(t => bruteGrams(t).foreach(g => ct(bucket(g, m)) += 1))
    raw.foreach(t => bruteGrams(t).foreach(g => cr(bucket(g, m)) += 1))
    val (nT, nR) = (ct.sum.toDouble, cr.sum.toDouble)
    Array.tabulate(m)(b =>
      math.log((ct(b) + alpha) / (nT + alpha * m)) -
        math.log((cr(b) + alpha) / (nR + alpha * m)))
  }

  private def bruteScore(text: String, lr: Array[Double]): Double =
    bruteGrams(text).foldLeft(0.0)((acc, g) => acc + lr(bucket(g, lr.length)))

  // two "styles" with disjoint-ish vocabularies: target-like docs should
  // score high, background docs low
  private val targetDocs = Seq(
    "alpha beta gamma delta", "alpha gamma beta", "beta delta alpha alpha",
    "gamma gamma alpha beta", "delta alpha beta")
  private val backgroundDocs = Seq(
    "omega psi chi phi", "psi omega phi", "chi chi omega psi",
    "phi psi omega omega", "omega chi psi")
  private val corpus: Seq[(Long, String)] =
    (targetDocs ++ backgroundDocs).zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private lazy val corpusDf = corpus.toDF("doc_id", "text")
  private lazy val targetDf = corpusDf.where(col("doc_id") < targetDocs.size)

  test("fitImportanceModel matches the brute count/smooth/log-ratio fit") {
    val m = 64
    val model = Dsir.fitImportanceModel(targetDf, corpusDf, "text", nBuckets = m, alpha = 0.5)
    val want = bruteModel(targetDocs, targetDocs ++ backgroundDocs, m, 0.5)
    assert(model.nBuckets == m)
    assert(model.alpha == 0.5)
    (0 until m).foreach(b => assert(model.logRatio(b) == want(b),
      s"bucket $b: got ${model.logRatio(b)} want ${want(b)}"))
    // gram totals: 4+3+4+4+3 = 18 tokens + 13 bigrams = 31 target grams
    assert(model.nTargetGrams == 31L)
    assert(model.nRawGrams == 62L)
  }

  test("native kernel score == brute NB log-odds; target docs outscore background") {
    val model = Dsir.fitImportanceModel(targetDf, corpusDf, "text", nBuckets = 128)
    val lr = model.logRatio.toArray
    val got = corpusDf
      .select(col("doc_id"), Dsir.importanceScore(model, col("text")).as("s"))
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    corpus.foreach { case (id, text) =>
      assert(got(id) == bruteScore(text, lr), s"doc $id")
    }
    val tMin = corpus.filter(_._1 < targetDocs.size).map(c => got(c._1)).min
    val bMax = corpus.filter(_._1 >= targetDocs.size).map(c => got(c._1)).max
    assert(tMin > bMax,
      s"disjoint-vocab target docs must outscore background: $tMin vs $bMax")
  }

  test("kernel == HOF composition bit-exactly on adversarial whitespace (property)") {
    val model = Dsir.fitImportanceModel(targetDf, corpusDf, "text", nBuckets = 32)
    val genText = for {
      n <- Gen.choose(0, 12)
      parts <- Gen.listOfN(n, Gen.frequency(
        4 -> Gen.oneOf("alpha", "beta", "omega", "x", "é世"),
        3 -> Gen.oneOf(" ", "\t", "\n", "\f", "\r", "  ", " \t\n"),
        1 -> Gen.const(""))) // vertical tab is NOT engine whitespace
    } yield parts.mkString
    val prop = Prop.forAll(Gen.listOfN(6, genText)) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val both = df.select(
        Dsir.importanceScore(model, col("text")).as("k"),
        Dsir.importanceScoreComposed(model, col("text")).as("h")).collect()
      both.forall(r => r.getDouble(0) == r.getDouble(1))
    }
    val result = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(40)
        .withInitialSeed(org.scalacheck.rng.Seed(20260814L)),
      prop)
    assert(result.passed, s"ScalaCheck: $result")
  }

  test("score edge semantics: NULL -> NULL, empty/whitespace -> 0.0") {
    val model = Dsir.fitImportanceModel(targetDf, corpusDf, "text", nBuckets = 16)
    val df = Seq((0L, null: String), (1L, ""), (2L, " \t\r\n "), (3L, "solo"))
      .toDF("doc_id", "text")
    val rows = df.select(col("doc_id"), Dsir.importanceScore(model, col("text")).as("s"))
      .orderBy("doc_id").collect()
    assert(rows(0).isNullAt(1))
    assert(rows(1).getDouble(1) == 0.0)
    assert(rows(2).getDouble(1) == 0.0)
    // single token: exactly one unigram term, no bigrams
    assert(rows(3).getDouble(1) == model.logRatio(bucket("solo", 16)))
  }

  test("resampleByImportance: deterministic, shifts mix toward target, n caps") {
    val model = Dsir.fitImportanceModel(targetDf, corpusDf, "text", nBuckets = 128)
    // clone the corpus 20x with distinct ids so a 40% draw has room to shift
    val big = (0 until 20).flatMap(k =>
      corpus.map { case (id, t) => (k * 100L + id, t) }).toDF("doc_id", "text")
    val picked = Dsir.resampleByImportance(big, model, "text", Seq("doc_id"), n = 80)
    val ids = picked.select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids.size == 80)
    assert(ids.distinct.size == 80, "without replacement")
    val targetShare = ids.count(_ % 100 < targetDocs.size).toDouble / ids.size
    assert(targetShare > 0.7,
      s"target-like docs are half the pool but must dominate the draw: $targetShare")
    val again = Dsir.resampleByImportance(big, model, "text", Seq("doc_id"), n = 80)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids.sorted == again.sorted, "same seed -> same draw")
    // hash-seeded noise, not rand(): the draw is invariant under
    // repartitioning — the property that makes it reproducible on a cluster
    val repart = Dsir.resampleByImportance(big.repartition(13), model, "text",
      Seq("doc_id"), n = 80).select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids.sorted == repart.sorted, "draw must not depend on partitioning")
    val other = Dsir.resampleByImportance(big, model, "text", Seq("doc_id"), n = 80,
      seed = 99L).select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids.sorted != other.sorted, "different seed -> different draw")
    // temperature -> 0 approaches deterministic top-n by score: an extreme
    // 1/tau makes every target-style doc (100 available) win a slot
    val sharp = Dsir.resampleByImportance(big, model, "text", Seq("doc_id"), n = 80,
      temperature = 1e-6).select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(sharp.forall(_ % 100 < targetDocs.size))
    // n >= pool size degenerates to the whole pool
    val all = Dsir.resampleByImportance(corpusDf, model, "text", Seq("doc_id"), n = 1000)
    assert(all.count() == corpus.size)
  }

  test("streaming ingest filter: scoring is a stateless projection usable under " +
    "Structured Streaming, scores identical to batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val model = Dsir.fitImportanceModel(targetDf, corpusDf, "text", nBuckets = 128)
    val input = MemoryStream[(Long, String)]
    val scored = input.toDF().toDF("doc_id", "text")
      .withColumn("s", Dsir.importanceScore(model, col("text")))
      .where(col("s") > 0) // admit target-style docs at ingest time
    val q = scored.writeStream.outputMode("append").format("memory")
      .queryName("sdsir").start()
    input.addData(corpus.take(3): _*)            // target-style
    input.addData(corpus.drop(targetDocs.size).take(3): _*) // background
    q.processAllAvailable()
    val got = spark.table("sdsir").orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    q.stop()
    assert(got.keySet == Set(0L, 1L, 2L), s"only target-style docs admitted: $got")
    val batch = corpusDf.select(col("doc_id"),
      Dsir.importanceScore(model, col("text")).as("s")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.foreach { case (id, s) => assert(s == batch(id), s"doc $id stream==batch") }
  }

  test("model save/load round-trips bit-exactly; tampered file fails the sig") {
    val model = Dsir.fitImportanceModel(targetDf, corpusDf, "text", nBuckets = 64, alpha = 0.5)
    val dir = java.nio.file.Files.createTempDirectory("dsir-model").toString
    val path = s"$dir/model.parquet"
    Dsir.saveModel(spark, model, path)
    val back = Dsir.loadModel(spark, path)
    assert(back.logRatio == model.logRatio)
    assert(back.alpha == model.alpha)
    assert(back.nTargetGrams == model.nTargetGrams && back.nRawGrams == model.nRawGrams)
    // scoring under the reloaded model is identical
    val a = corpusDf.select(Dsir.importanceScore(model, col("text"))).collect().map(_.getDouble(0))
    val b = corpusDf.select(Dsir.importanceScore(back, col("text"))).collect().map(_.getDouble(0))
    assert(a.toSeq == b.toSeq)
    // tamper: flip one log-ratio value -> sig check trips
    val edited = s"$dir/edited.parquet"
    spark.read.parquet(path)
      .withColumn("log_ratio",
        when(col("b") === 3, col("log_ratio") + 1.0).otherwise(col("log_ratio")))
      .write.mode("overwrite").parquet(edited)
    val e = intercept[IllegalArgumentException](Dsir.loadModel(spark, edited))
    assert(e.getMessage.contains("sig"))
  }

  test("fit/resample argument validation") {
    val model = Dsir.fitImportanceModel(targetDf, corpusDf, "text", nBuckets = 16)
    intercept[IllegalArgumentException] {
      Dsir.fitImportanceModel(targetDf, corpusDf, "text", nBuckets = 0)
    }
    intercept[IllegalArgumentException] {
      Dsir.fitImportanceModel(targetDf, corpusDf, "text", alpha = 0.0)
    }
    intercept[IllegalArgumentException] {
      Dsir.resampleByImportance(corpusDf, model, "text", Seq("doc_id"), n = 0)
    }
    intercept[IllegalArgumentException] {
      Dsir.resampleByImportance(corpusDf, model, "text", Seq("doc_id"), n = 1,
        temperature = 0.0)
    }
    intercept[IllegalArgumentException] {
      Dsir.resampleByImportance(corpusDf, model, "text", Seq.empty, n = 1)
    }
  }
}
