package graft

import org.apache.spark.sql.functions._

import graft.ops.{Selection, Similarity, TextAnalysis}

class SelectionSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = Seq(
    // (id, grp, score)
    (1L, "a", 10.0), (2L, "a", 30.0), (3L, "a", 20.0), (4L, "a", 30.0),
    (5L, "b", 5.0)
  ).toDF("id", "grp", "score")

  test("topKPerGroup keeps k best with deterministic tie-break") {
    val got = Selection.topKPerGroup(docs, Seq("grp"), col("score"), 2, Seq("id"))
      .select("grp", "rank", "id").as[(String, Int, Long)].collect().sorted
    // group a: score 30 ties between id 2 and 4 → id asc wins rank 1
    assert(got.toSeq == Seq(("a", 1, 2L), ("a", 2, 4L), ("b", 1, 5L)))
  }

  test("topKPerGroup plans a WindowGroupLimit (partial top-k before the exchange)") {
    val plan = Selection.topKPerGroup(docs, Seq("grp"), col("score"), 2, Seq("id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }

  test("keepTopFraction keeps ceil(frac·n) per group — tiny groups survive") {
    val got = Selection.keepTopFraction(docs, Seq("grp"), col("score"), 0.5, Seq("id"))
      .select("grp", "id").as[(String, Long)].collect().sorted
    // a: n=4 → keep 2 (ids 2,4 at score 30); b: n=1 → ceil(0.5)=1 keeps id 5
    assert(got.toSeq == Seq(("a", 2L), ("a", 4L), ("b", 5L)))
  }

  test("keepTopFraction rejects out-of-range fractions") {
    intercept[IllegalArgumentException] {
      Selection.keepTopFraction(docs, Seq("grp"), col("score"), 0.0, Seq("id"))
    }
    intercept[IllegalArgumentException] {
      Selection.keepTopFraction(docs, Seq("grp"), col("score"), 1.5, Seq("id"))
    }
  }
}

class CentroidAssignSpec extends SparkSpecBase {
  import spark.implicits._

  test("assignNearestCentroid picks the cosine argmax") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)),  // → label 0 (x axis)
      (2L, Seq(0.0f, 2.0f)),  // → label 1 (y axis)
      (3L, Seq(3.0f, 4.0f))   // cos vs x = .6, vs y = .8 → label 1
    ).toDF("vec_id", "embedding")
    val cents = Seq((0, Seq(2.0, 0.0)), (1, Seq(0.0, 1.0))).toDF("label", "centroid")
    val got = Similarity.assignNearestCentroid(vecs, cents, "vec_id", "embedding")
      .orderBy("vec_id").collect()
    assert(got.map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      Seq((1L, 0), (2L, 1), (3L, 1)))
    assertApprox(cell(got(2), 2), Some(0.8), 1e-12)
  }

  test("assignNearestCentroid ties break toward the smallest label") {
    val vecs = Seq((1L, Seq(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val cents = Seq((7, Seq(1.0, 1.0)), (3, Seq(2.0, 2.0))).toDF("label", "centroid")
    val got = Similarity.assignNearestCentroid(vecs, cents, "vec_id", "embedding").collect()
    assert(got.head.getInt(1) == 3)
  }

  test("assignNearestCentroid leaves zero-norm vectors unassigned (NULL)") {
    val vecs = Seq((1L, Seq(0.0f, 0.0f)), (2L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val cents = Seq((0, Seq(1.0, 0.0))).toDF("label", "centroid")
    val got = Similarity.assignNearestCentroid(vecs, cents, "vec_id", "embedding")
      .orderBy("vec_id").collect()
    assert(got(0).isNullAt(1) && got(0).isNullAt(2))
    assert(got(1).getInt(1) == 0)
  }
}

class NormalizeSpec extends SparkSpecBase {
  import spark.implicits._
  import graft.core.{WeightedDataFrame, WeightedNormalize}

  test("weighted ecdf: ties share a value, weights drive the mass") {
    val d = Seq(("A", 1L, Some(1.0), 1.0), ("A", 2L, Some(2.0), 2.0),
      ("A", 3L, Some(2.0), 3.0), ("A", 4L, Some(4.0), 4.0))
      .toDF("k", "id", "x", "w")
    val got = WeightedNormalize.ecdf(WeightedDataFrame.wt(d, "w"), "x", Seq("k"))
      .select("id", "pct_rank").collect().map(r => r.getLong(0) -> cell(r, 1)).toMap
    assertApprox(got(1L), Some(0.1), 1e-12)
    assertApprox(got(2L), Some(0.6), 1e-12) // both x=2 rows: (1+2+3)/10
    assertApprox(got(3L), Some(0.6), 1e-12)
    assertApprox(got(4L), Some(1.0), 1e-12)
  }

  test("ecdf: null values get null rank and contribute no weight") {
    val d = Seq(("A", 1L, None: Option[Double], 5.0), ("A", 2L, Some(3.0), 1.0))
      .toDF("k", "id", "x", "w")
    val got = WeightedNormalize.ecdf(WeightedDataFrame.wt(d, "w"), "x", Seq("k"))
      .select("id", "pct_rank").collect().map(r => r.getLong(0) -> cell(r, 1)).toMap
    assert(got(1L).isEmpty)
    assertApprox(got(2L), Some(1.0), 1e-12) // null row's weight excluded
  }

  test("qcut assigns weighted-mass quartiles, right-closed, ties share a bucket") {
    // unit weights, 8 values → exact quartile masses
    val d = (1 to 8).map(i => ("A", i.toLong, Some(i.toDouble), 1.0))
      .toDF("k", "id", "x", "w")
    val got = WeightedNormalize.qcut(WeightedDataFrame.wt(d, "w"), "x", Seq("k"), 4)
      .select("id", "bucket").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1,
      5L -> 2, 6L -> 2, 7L -> 3, 8L -> 3))
    // a heavy weight drags following rows into upper buckets
    val dw = Seq(("A", 1L, Some(1.0), 6.0), ("A", 2L, Some(2.0), 1.0),
      ("A", 3L, Some(3.0), 1.0)).toDF("k", "id", "x", "w")
    val gw = WeightedNormalize.qcut(WeightedDataFrame.wt(dw, "w"), "x", Seq("k"), 4)
      .select("id", "bucket").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // p = 6/8, 7/8, 1 → buckets 2, 3, 3
    assert(gw == Map(1L -> 2, 2L -> 3, 3L -> 3))
  }

  test("weighted zscore matches the batch moment kernel") {
    val d = Seq(("A", 1L, Some(1.0), 1.0), ("A", 2L, Some(2.0), 1.0),
      ("A", 3L, Some(3.0), 1.0)).toDF("k", "id", "x", "w")
    val got = WeightedNormalize.zscore(WeightedDataFrame.wt(d, "w"), "x", Seq("k"))
      .select("id", "zscore").collect().map(r => r.getLong(0) -> cell(r, 1)).toMap
    assertApprox(got(1L), Some(-1.0), 1e-12)
    assertApprox(got(2L), Some(0.0), 1e-12)
    assertApprox(got(3L), Some(1.0), 1e-12)
  }

  test("zscore: zero variance and null values yield NULL, never infinity") {
    val d = Seq(("A", 1L, Some(2.0), 1.0), ("A", 2L, Some(2.0), 1.0),
      ("A", 3L, None: Option[Double], 1.0)).toDF("k", "id", "x", "w")
    val got = WeightedNormalize.zscore(WeightedDataFrame.wt(d, "w"), "x", Seq("k"))
      .select("id", "zscore").collect().map(r => r.getLong(0) -> cell(r, 1)).toMap
    assert(got(1L).isEmpty && got(2L).isEmpty && got(3L).isEmpty)
  }
}

class CrossCorpusDedupSpec extends SparkSpecBase {
  import spark.implicits._

  test("crossNearDuplicates links identical token sets across corpora at t=1") {
    val a = Seq((1L, "alpha beta gamma"), (2L, "unique content here"))
      .toDF("doc_id", "text")
    val b = Seq((10L, "beta gamma alpha"), (11L, "different words entirely"))
      .toDF("doc_id", "text")
    val got = graft.ops.Dedup.crossNearDuplicates(a, b, "text", "doc_id",
      shingleSize = 1, threshold = 1.0)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 10L)))
  }

  test("crossNearDuplicates banding path finds high-overlap cross pairs with exact jaccard") {
    val base = (1 to 20).map(i => s"tok$i").mkString(" ")
    val near = (1 to 18).map(i => s"tok$i").mkString(" ") + " other word"
    val a = Seq((1L, base)).toDF("doc_id", "text")
    val b = Seq((2L, near), (3L, "completely unrelated text body")).toDF("doc_id", "text")
    val got = graft.ops.Dedup.crossNearDuplicates(a, b, "text", "doc_id",
      shingleSize = 1, numHashes = 32, threshold = 0.6).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    // exact verify: |∩|=18, |∪|=22
    assertApprox(cell(got.head, 2), Some(18.0 / 22.0), 1e-12)
  }

  test("dropAgainstReference admits only novel content") {
    val batch = Seq((1L, "already in corpus text"), (2L, "genuinely new material"))
      .toDF("doc_id", "text")
    val ref = Seq((100L, "text corpus in already")).toDF("doc_id", "text")
    val got = graft.ops.Dedup.dropAgainstReference(batch, ref, "text", "doc_id",
      shingleSize = 1, threshold = 1.0)
      .select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(2L))
  }
}

class CanonicalizeSpec extends SparkSpecBase {
  import spark.implicits._

  test("canonicalize keeps the best doc per transitive cluster plus singletons") {
    val docs = Seq(
      (1L, 10L), (2L, 30L), (3L, 20L), // cluster via chain 1-2, 2-3
      (4L, 5L)                         // singleton
    ).toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val got = graft.ops.Pipeline.canonicalize(docs, "doc_id", col("score"), pairs)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().sorted
    // chain collapses to cluster 1; best score 30 → doc 2. Singleton kept.
    assert(got.toSeq == Seq((2L, 1L), (4L, 4L)))
  }

  test("canonicalize ties break toward the smallest id") {
    val docs = Seq((7L, 1.0), (9L, 1.0)).toDF("doc_id", "score")
    val pairs = Seq((7L, 9L)).toDF("doc_a", "doc_b")
    val got = graft.ops.Pipeline.canonicalize(docs, "doc_id", col("score"), pairs)
      .select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(7L))
  }
}

class CurationDegenerateSpec extends SparkSpecBase {
  import spark.implicits._

  private def emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")

  test("round-7 curation ops survive empty inputs") {
    val emptyScored = Seq.empty[(Long, String, Double)].toDF("id", "grp", "score")
    assert(Selection.topKPerGroup(emptyScored, Seq("grp"), col("score"), 3, Seq("id"))
      .count() == 0)
    assert(Selection.keepTopFraction(emptyScored, Seq("grp"), col("score"), 0.5, Seq("id"))
      .count() == 0)
    assert(TextAnalysis.splitSentences(emptyDocs, "text", "doc_id").count() == 0)
    assert(TextAnalysis.mixReport(
      Seq.empty[(String, String)].toDF("source", "lang"), Seq("source"), "lang").count() == 0)
    assert(TextAnalysis.lengthHistogram(emptyDocs, "text").count() == 0)
  }

  test("splitSentences passes null and empty text through as zero rows") {
    val d = Seq((1L, ""), (2L, null.asInstanceOf[String]), (3L, "Real. Text here"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.splitSentences(d, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(got == Seq(3L, 3L))
  }

  test("cross-corpus dedup and canonicalize survive empty sides") {
    val one = Seq((1L, "some real document text")).toDF("doc_id", "text")
    assert(graft.ops.Dedup.crossNearDuplicates(emptyDocs, one, "text", "doc_id",
      shingleSize = 1, threshold = 1.0).count() == 0)
    assert(graft.ops.Dedup.crossNearDuplicates(one, emptyDocs, "text", "doc_id",
      shingleSize = 1, threshold = 0.8).count() == 0)
    assert(graft.ops.Dedup.dropAgainstReference(one, emptyDocs, "text", "doc_id",
      shingleSize = 1, threshold = 1.0).count() == 1)
    val noPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val docs = Seq((1L, 2.0), (2L, 1.0)).toDF("doc_id", "score")
    // no pairs → every doc is its own cluster → everything survives
    assert(graft.ops.Pipeline.canonicalize(docs, "doc_id", col("score"), noPairs)
      .count() == 2)
  }

  test("assignNearestCentroid with no centroids yields no assignments") {
    val vecs = Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val noCents = Seq.empty[(Int, Seq[Double])].toDF("label", "centroid")
    assert(Similarity.assignNearestCentroid(vecs, noCents, "vec_id", "embedding")
      .count() == 0)
  }
}

class RangeJoinSpec extends SparkSpecBase {
  import spark.implicits._
  import graft.ops.RangeJoin

  private def pts = Seq.tabulate(10)(i => (i.toLong, i.toLong)).toDF("pid", "t")

  test("rangeJoin matches half-open containment exactly") {
    val iv = Seq((100L, 2L, 5L), (200L, 5L, 5L), (300L, 8L, 20L))
      .toDF("iid", "s", "e")
    val got = RangeJoin.rangeJoin(pts, "t", iv, "s", "e", bucketWidth = 4L)
      .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
    // [2,5) → 2,3,4; [5,5) empty; [8,20) → 8,9
    assert(got == Seq((2L, 100L), (3L, 100L), (4L, 100L), (8L, 300L), (9L, 300L)))
  }

  test("rangeJoin finds overlapping intervals and plans no nested-loop join") {
    val iv = Seq((1L, 0L, 10L), (2L, 3L, 6L)).toDF("iid", "s", "e")
    val joined = RangeJoin.rangeJoin(pts, "t", iv, "s", "e", bucketWidth = 3L)
    val got = joined.groupBy("pid").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // points 3,4,5 fall in both intervals
    assert(got(3L) == 2 && got(4L) == 2 && got(5L) == 2 && got(0L) == 1)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("Cartesian"),
      s"inequality join leaked into the plan:\n$plan")
  }

  test("rangeJoin fails loudly on an interval exceeding the bucket guard") {
    val iv = Seq((1L, 0L, 1000000L)).toDF("iid", "s", "e")
    val ex = intercept[Exception] {
      RangeJoin.rangeJoin(pts, "t", iv, "s", "e",
        bucketWidth = 1L, maxBucketsPerInterval = 100L).count()
    }
    assert(ex.getMessage != null)
  }

  test("property: rangeJoin equals brute-force containment on random inputs") {
    // seeded random points/intervals, deliberately including: negative
    // coordinates (floor-division bucketing must round toward -inf),
    // points exactly at k·bucketWidth and at interval starts/ends
    // (half-open boundary), empty and length-1 intervals, and several
    // widths per dataset
    for (seed <- 1L to 4L) {
      val rnd = new scala.util.Random(seed)
      val points = (0 until 120).map { i =>
        val t = rnd.nextInt(9) match {
          case 0 => rnd.nextInt(10) * 7L            // on 7-bucket boundaries
          case 1 => -(rnd.nextInt(10) * 7L)         // negative boundaries
          case _ => rnd.nextInt(201).toLong - 100L  // uniform incl. negatives
        }
        (i.toLong, t)
      }
      val intervals = (0 until 60).map { j =>
        val s = rnd.nextInt(201).toLong - 100L
        val len = rnd.nextInt(6) match {
          case 0 => 0L                               // empty: matches nothing
          case 1 => -3L                              // inverted: matches nothing
          case 2 => 1L                               // single point
          case _ => rnd.nextInt(40).toLong + 1L
        }
        (j.toLong, s, s + len)
      }
      val expect = (for {
        (pid, t) <- points
        (iid, s, e) <- intervals
        if t >= s && t < e
      } yield (pid, iid)).sorted
      val pdf = points.toDF("pid", "t")
      val idf = intervals.toDF("iid", "s", "e")
      for (width <- Seq(1L, 3L, 7L, 64L)) {
        val got = RangeJoin.rangeJoin(pdf, "t", idf, "s", "e", bucketWidth = width)
          .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
        assert(got == expect, s"seed=$seed width=$width: ${got.size} vs ${expect.size}")
      }
    }
  }
}

class PrepareTrainingDataSpec extends SparkSpecBase {
  import spark.implicits._

  test("prepareTrainingData composes clean -> canonicalize -> pack end-to-end") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = graft.ops.Pipeline.prepareTrainingData(docs, "text", "doc_id",
      minQuality = 0.0, minTokens = 5L, capacity = 512L, nStreams = 8)
    val n = out.count()
    assert(n > 0 && n <= docs.count())
    // canonicalization really collapsed the token-set duplicate clusters
    assert(out.select("cluster_id").distinct().count() == n)
    // packing overrun contract: each pack minus its largest doc fits
    val packs = out.groupBy("stream", "pack")
      .agg(sum("n_tokens").as("t"), max("n_tokens").as("m"))
      .select("t", "m").as[(Long, Long)].collect()
    assert(packs.forall { case (t, m) => t - m < 512L })
  }

  test("prepareMultimodalTraining: kept-media counts, text-membership invariance, requireMedia") {
    import graft.ops.{MediaPipeline, Pipeline}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = graft.multimodal.Multimodal.multimodalMediaFromDocuments(docs)
      .withColumn("owner_doc", expr("media_id div 100"))
    val img = MediaPipeline.ImagePolicy(minDim = 2L, maxAspect = 2.2,
      minDynRange = 0L, lumaBounds = (60.0, 200.0))
    val aud = MediaPipeline.AudioPolicy(minSampleRate = 16000L, maxChannels = 1L,
      minDurationS = 0.0, minRms = 0.0, clipPeak = 40000L)
    val vid = MediaPipeline.VideoPolicy(minDurationMs = 100L, maxDurationMs = 20000L,
      minDim = 240L, maxAspect = 2.2, maxTracks = 1L)
    def run(requireMedia: Boolean) = Pipeline.prepareMultimodalTraining(
      docs, "text", "doc_id", media, "payload", "media_id", "kind", "owner_doc",
      minQuality = 0.0, minTokens = 5L, shingleSize = 1,
      image = img, audio = aud, video = vid,
      requireMedia = requireMedia, capacity = 512L, nStreams = 8,
      chain = Some(new org.apache.spark.sql.graftbridge.DatasetBridge.FreezeChain))
    val out = run(requireMedia = false)
    // counts equal the manual composition: curateMedia kept rows per doc
    val manual = MediaPipeline.curateMedia(media, "payload", "media_id", "kind",
        image = img, audio = aud, video = vid,
        chain = Some(new org.apache.spark.sql.graftbridge.DatasetBridge.FreezeChain))
      .where(col("status") === "kept")
      .join(media.select("media_id", "owner_doc", "kind"), Seq("media_id"))
      .groupBy("owner_doc").pivot("kind", Seq("image", "audio", "video")).count()
      .collect().map(r => r.getLong(0) ->
        (0 to 2).map(k => if (r.isNullAt(k + 1)) 0L else r.getLong(k + 1))).toMap
    val got = out.select("doc_id", "n_images", "n_audio", "n_video")
      .collect().map(r => r.getLong(0) -> Seq(r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    got.foreach { case (doc, counts) =>
      assert(counts == manual.getOrElse(doc, Seq(0L, 0L, 0L)), s"doc $doc")
    }
    assert(got.exists(_._2.sum > 0) && got.exists(_._2.sum == 0),
      "fixture should produce both media-bearing and media-less kept docs")
    // media curation must not change TEXT membership or packing by default
    val textOnly = Pipeline.prepareTrainingData(docs, "text", "doc_id",
      minQuality = 0.0, minTokens = 5L, shingleSize = 1,
      capacity = 512L, nStreams = 8)
      .select("doc_id", "stream", "pack", "pack_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val mm = out.select("doc_id", "stream", "pack", "pack_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(mm == textOnly)
    // requireMedia keeps exactly the media-bearing docs (and repacks them)
    val req = run(requireMedia = true)
    val reqDocs = req.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(reqDocs == got.filter(_._2.sum > 0).map(_._1).toSet)
    assert(req.where(col("n_images") + col("n_audio") + col("n_video") === 0).count() == 0)
  }

  test("prepareWebCorpus: crawl to packed token streams, LM gate optional and binding") {
    import graft.ops.TextAnalysis
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val w = graft.multimodal.Multimodal.warcHtmlFromDocuments(docs)
      .select(col("media_id").as("doc_id"), col("payload"))
    val g = TextAnalysis.GopherThresholds(minWords = 10, minStopwords = 1)
    // gate OFF: the whole flow is one graph; equals the manual composition
    val open = graft.ops.Pipeline.prepareWebCorpus(w, "doc_id", "payload",
      gopher = g, capacity = 512L, nStreams = 4)
    val openDocs = open.agg(sum("n_docs")).head().getLong(0)
    assert(openDocs > 0)
    val manual = {
      val recs = w.select(col("doc_id"),
          explode(graft.functions.WarcFunctions.warcRecords(col("payload"))).as("r"))
        .where(col("r.rec_type") === "response")
        .select(col("doc_id"),
          graft.ops.Extract.textFromHtmlBytes(col("r.body")).as("t"))
        .where(TextAnalysis.gopherPasses(col("t"), g))
      graft.ops.Dedup.dropExact(recs, "t", "doc_id").count()
    }
    assert(openDocs == manual)
    // gate ON (self-bootstrapped LM): an unreachable ceiling admits the
    // same pool; a sub-minimum ceiling rejects everything scorable
    val same = graft.ops.Pipeline.prepareWebCorpus(w, "doc_id", "payload",
      gopher = g, pplMax = 1e9, capacity = 512L, nStreams = 4)
    assert(same.agg(sum("n_docs")).head().getLong(0) == openDocs)
    val none = graft.ops.Pipeline.prepareWebCorpus(w, "doc_id", "payload",
      gopher = g, pplMax = 1e-6, capacity = 512L, nStreams = 4)
    assert(none.count() == 0)
    // a REFERENCE-fitted LM (the CCNet configuration) slots in unchanged
    val lm = TextAnalysis.fitStupidBackoffLm(
      docs.where(col("doc_id") % 3 === 0), "text")
    val ref = graft.ops.Pipeline.prepareWebCorpus(w, "doc_id", "payload",
      gopher = g, pplMax = 1e9, lm = Some(lm), capacity = 512L, nStreams = 4)
    assert(ref.agg(sum("n_docs")).head().getLong(0) == openDocs)
    // pack overrun contract
    val packs = open.select(col("n_tokens")).as[Long].collect()
    assert(packs.nonEmpty)
  }

  test("pipeline freezes release their checkpoint storage through a caller-owned chain") {
    // a long-lived application runs a pipeline per ingest round; each
    // round's frozen pool backs the returned lazy plan, so only the CALLER
    // can drop it — the FreezeChain handle. Pin: (a) with a checkpoint dir
    // the gated prepareWebCorpus writes reliable-checkpoint state, (b)
    // releaseAll() after the sink materialization deletes it (no O(rounds)
    // dirs surviving to app exit), (c) the chain changes no values.
    import graft.ops.TextAnalysis
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val w = graft.multimodal.Multimodal.warcHtmlFromDocuments(docs)
      .select(col("media_id").as("doc_id"), col("payload"))
    val g = TextAnalysis.GopherThresholds(minWords = 10, minStopwords = 1)
    def run(chain: Option[org.apache.spark.sql.graftbridge.DatasetBridge.FreezeChain]) =
      graft.ops.Pipeline.prepareWebCorpus(w, "doc_id", "payload",
        gopher = g, pplMax = 1e9, capacity = 512L, nStreams = 4, chain = chain)
        .select("stream", "pack", "n_docs", "n_tokens")
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    org.apache.spark.TestCheckpointDir.clear(spark.sparkContext)
    val baseline = run(None) // localCheckpoint mode, no chain
    val dir = java.nio.file.Files.createTempDirectory("graft-pipe-ckpt-").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val chain = new org.apache.spark.sql.graftbridge.DatasetBridge.FreezeChain
      val got = run(Some(chain)) // materialized: the "sink write" moment
      assert(got == baseline, "chain-tracked freeze changed pipeline output")
      def rddDirs = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => java.nio.file.Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("rdd-"))
        .count()
      assert(rddDirs == 1, s"gated pipeline should hold exactly its pool checkpoint, found $rddDirs")
      chain.releaseAll()
      assert(rddDirs == 0, "releaseAll() left superseded checkpoint dirs behind")
    } finally {
      org.apache.spark.TestCheckpointDir.clear(spark.sparkContext)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("prepareTrainingDataDsir selects toward the target distribution and packs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = 100
    val out = graft.ops.Pipeline.prepareTrainingDataDsir(docs, "text", "doc_id",
      target = docs.where(col("lang") === "en").select("doc_id", "text"),
      nSelect = n, minQuality = 0.0, minTokens = 5L,
      nBuckets = 512, capacity = 512L, nStreams = 8, seed = 7L)
    assert(out.count() == n)
    // survivors are canonical (one per cluster) and the pack contract holds
    assert(out.select("cluster_id").distinct().count() == n)
    val packs = out.groupBy("stream", "pack")
      .agg(sum("n_tokens").as("t"), max("n_tokens").as("m"))
      .select("t", "m").as[(Long, Long)].collect()
    assert(packs.forall { case (t, m) => t - m < 512L })
    // the draw leans toward the target language vs the pool's own mix: a
    // sharp temperature makes the lean strict enough to assert robustly
    val sharp = graft.ops.Pipeline.prepareTrainingDataDsir(docs, "text", "doc_id",
      target = docs.where(col("lang") === "en").select("doc_id", "text"),
      nSelect = n, minQuality = 0.0, minTokens = 5L,
      nBuckets = 512, temperature = 0.05, capacity = 512L, nStreams = 8, seed = 7L)
    val enShare = sharp.where(col("lang") === "en").count().toDouble / n
    val poolShare = docs.where(col("lang") === "en").count().toDouble / docs.count()
    assert(enShare > poolShare,
      s"sharp DSIR draw must overrepresent the target language: $enShare vs pool $poolShare")
  }

  test("prepareTrainingData with strata targets rebalances the language mix") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = graft.ops.Pipeline.prepareTrainingData(docs, "text", "doc_id",
      minQuality = 0.0, minTokens = 1L,
      strataCol = Some("lang"), strataTargets = Map("en" -> 0.5, "de" -> 0.5),
      capacity = 512L, nStreams = 8)
    val langs = out.select("lang").distinct().as[String].collect().toSet
    assert(langs.subsetOf(Set("en", "de"))) // non-target strata dropped
    assert(out.count() > 0)
  }
}

class TextCurationSpec extends SparkSpecBase {
  import spark.implicits._

  test("splitSentences segments, trims, indexes, and drops blanks") {
    val d = Seq((1L, "One two. Three!  Four five?"), (2L, "No terminator here"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.splitSentences(d, "text", "doc_id")
      .orderBy("doc_id", "sent_idx")
      .as[(Long, Long, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, "One two", 7L, 2L),
      (1L, 1L, "Three", 5L, 1L),
      (1L, 2L, "Four five?", 10L, 2L),
      (2L, 0L, "No terminator here", 18L, 3L)))
  }

  test("splitSentences keeps positions of dropped blanks (no re-indexing)") {
    // trailing ". " yields a trailing empty fragment at position 1 — it is
    // dropped but position 0 is unaffected
    val d = Seq((1L, "Only sentence. ")).toDF("doc_id", "text")
    val got = TextAnalysis.splitSentences(d, "text", "doc_id").collect()
    assert(got.length == 1 && got.head.getLong(1) == 0L
      && got.head.getString(2) == "Only sentence")
  }

  test("mixReport computes Shannon entropy per group") {
    val d = Seq(
      ("s1", "en"), ("s1", "es"),             // uniform over 2 → ln 2
      ("s2", "en"), ("s2", "en"), ("s2", "en") // single lang → 0
    ).toDF("source", "lang")
    val got = TextAnalysis.mixReport(d, Seq("source"), "lang")
      .orderBy("source").collect()
    assert(got(0).getLong(1) == 2L && got(0).getLong(2) == 2L)
    assertApprox(cell(got(0), 3), Some(math.log(2.0)), 1e-12)
    assert(got(1).getLong(1) == 3L && got(1).getLong(2) == 1L)
    assertApprox(cell(got(1), 3), Some(0.0), 1e-12)
  }

  test("lengthHistogram buckets by token count") {
    val d = Seq(
      (1L, "a b c"),                       // 3 tokens → bucket 0
      (2L, Seq.fill(5)("t").mkString(" ")), // 5 tokens → bucket 5 (width 5)
      (3L, Seq.fill(7)("t").mkString(" "))  // 7 tokens → bucket 5
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lengthHistogram(d, "text", width = 5)
      .orderBy("bucket_start").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 1L, 3L), (5L, 2L, 12L)))
  }
}
