package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** Scale rehearsal runner (SCALING.md): time the headline queries against
  * the [[ScaleSynth]] corpora at each scale factor and print ONE JSON line
  * `{"factors":{"1":{q:sec,…},…},"max_heap_gb":…}`.
  *
  * Same timing discipline as [[graft.Bench]]: per (factor, query), run
  * twice back-to-back and report the min (`queryExecution.toRdd.count()`
  * as the action so terminal projections can't be column-pruned away), with
  * the cold/warm pair kept for fit-cost diagnostics — the per-dir
  * IVF/PQ model fits land in the cold run only, so min-of-two reports the
  * steady-state search cost the scaling claim is about. Queries come from
  * `SparkEntry.queries` (the oracle-verified definitions), plus one direct
  * IVF-PQ search row (`ann_ivfpq` — the production sub-path has no
  * standalone oracle query; q90 wraps it in a recall harness whose brute
  * truth baseline would dominate the timing).
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val destRoot = args.lift(0).getOrElse("/root/repo/data-scale")
    val factors = args.lift(1).getOrElse("1,3,10")
      .split(",").map(_.trim.toInt).toSeq
    val queryNames = args.lift(2).map(_.split(",").map(_.trim).toSeq).getOrElse(Seq(
      "q07_corr", "q11_grouped_var",
      "q22_dedup_minhash", "q49_dup_clusters", "q75_canonicalize",
      "q81_prepare_training", "q98_gopher_quality", "q99_drop_boilerplate",
      "q26_ann_lsh", "q32_ann_ivf"))
    val spark = SparkSession.builder()
      .appName("scale-bench").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def ivfPq(s: SparkSession, dir: String): DataFrame = {
      import graft.ops.Similarity
      Similarity.searchIvfPq(SparkEntry.ivfModel(s, dir), SparkEntry.pqModel(s, dir),
        graft.sources.Tables.testTable(s, dir, "embeddings"),
        "vec_id", "embedding", col("vec_id") < 10, 5)
    }
    // SemDeDup at DERIVED k (= n/128, the production sizing — the q119
    // oracle pins k=8, which would measure constant-k): exact Lloyd
    // assignment is O(n·k·dim) per pass and quadratic overall; the
    // two-level route is O(n·√k·dim). Benched only when requested by name.
    def semExactDerived(s: SparkSession, dir: String): DataFrame =
      graft.ops.Similarity.semDedupReport(
        graft.sources.Tables.testTable(s, dir, "embeddings"),
        "vec_id", "embedding", 0.30, k = 0, iters = 2, seed = 7L)
    def semTwoLevelDerived(s: SparkSession, dir: String): DataFrame =
      graft.ops.Similarity.semDedupTwoLevelReport(
        graft.sources.Tables.testTable(s, dir, "embeddings"),
        "vec_id", "embedding", 0.30, itersCoarse = 2, itersFine = 2, seed = 7L)
    // unfrozen twins of the single-scan LM chains (SparkEntry's
    // q122/q125/q126 opt into the frozen hash-array pool) — benched here
    // to measure the freeze crossover: at which corpus size does paying
    // one pool materialization beat re-scanning the text per consumer
    import graft.ops.TextAnalysis
    def docs(s: SparkSession, dir: String) =
      graft.sources.Tables.testTable(s, dir, "documents")
    def backoffUnfrozen(s: SparkSession, dir: String): DataFrame = {
      val d = docs(s, dir)
      val lm = TextAnalysis.fitStupidBackoffLm(d.where(col("doc_id") % 3 === 0), "text")
      TextAnalysis.stupidBackoffPerplexity(d, "text", "doc_id", lm)
    }
    def bucketsUnfrozen(s: SparkSession, dir: String): DataFrame =
      TextAnalysis.pplBuckets(docs(s, dir), "text", "doc_id", by = Seq("lang"))
    def ccnetUnfrozen(s: SparkSession, dir: String): DataFrame = {
      val d = docs(s, dir)
      val lm = TextAnalysis.fitStupidBackoffLm(d.where(col("doc_id") % 3 === 0), "text")
      TextAnalysis.pplBuckets(d, "text", "doc_id", by = Seq("lang"), lm = Some(lm))
    }
    // the crossover pair: the SAME fit+score chain over crawl-EXTRACTED
    // text (WARC walk + html_text per scan). Recompute re-runs the
    // extraction once per consumer (4 scans); the pooled spelling runs it
    // once into the cached hash-array pool. This is the deployment the
    // freeze knob exists for — an expensive-to-produce (or remote) text
    // source — where the parquet-backed rows above measure the opposite
    // (page-cached re-scans are nearly free, the pool costs more than it
    // saves).
    def crawlText(s: SparkSession, dir: String): DataFrame =
      graft.multimodal.Multimodal.warcHtmlFromDocuments(docs(s, dir))
        .select(col("media_id").as("doc_id"),
          explode(graft.functions.WarcFunctions.warcRecords(col("payload"))).as("__r__"))
        .where(col("__r__.rec_type") === "response")
        .select(col("doc_id"),
          graft.ops.Extract.textFromHtmlBytes(col("__r__.body")).as("text"))
    def backoffCrawlRecompute(s: SparkSession, dir: String): DataFrame = {
      val d = crawlText(s, dir)
      val lm = TextAnalysis.fitStupidBackoffLm(d.where(col("doc_id") % 3 === 0), "text")
      TextAnalysis.stupidBackoffPerplexity(d, "text", "doc_id", lm)
    }
    def backoffCrawlPooled(s: SparkSession, dir: String): DataFrame = {
      val pool = TextAnalysis.ngramHashPool(crawlText(s, dir), "text", "doc_id")
      val lm = TextAnalysis.fitStupidBackoffLmFromPool(
        pool.where(col("doc_id") % 3 === 0))
      TextAnalysis.stupidBackoffPerplexityFromPool(pool, "doc_id", lm)
    }
    // ADVERSARIAL skew fixture for the band-join guards: 1% of the corpus
    // collapses to ONE near-identical cluster (a shared 40-token base, a
    // unique 2-token tail per doc → pairwise 3-shingle jaccard ≈ 0.9), so
    // every cluster doc lands in every band bucket together — the
    // degenerate corpus the est-prefilter / pair-`distinct` rebalance /
    // t≥1 streamed self-join guards exist for. The OUTPUT is quadratic in
    // the cluster size by construction (all its pairs are TRUE pairs);
    // the claim under measurement is that the pair expansion STREAMS
    // (bounded task memory, no g²-element array row) and the rest of the
    // corpus's verify work isn't serialized behind the hot bucket.
    def adversarial(s: SparkSession, dir: String, identical: Boolean): DataFrame = {
      val base = (1 to 40).map(i => s"tok$i").mkString(" ")
      docs(s, dir).withColumn("text",
        when(col("doc_id") % 100 === 0,
          if (identical) lit(base)
          else concat(lit(base + " v"), col("doc_id").cast("string")))
          .otherwise(col("text")))
    }
    def minhashSkewNear(s: SparkSession, dir: String): DataFrame =
      graft.ops.Dedup.minhashDedup(adversarial(s, dir, identical = false),
        "text", "doc_id", shingleSize = 3, threshold = 0.8)
    def minhashSkewIdentical(s: SparkSession, dir: String): DataFrame =
      graft.ops.Dedup.minhashDedup(adversarial(s, dir, identical = true),
        "text", "doc_id", shingleSize = 3, threshold = 1.0)
    // the q147 all-modality capstone's OWN slices, each through its
    // single-modality capstone — attribution probes for the composed
    // query's scale behavior (the standalone q139/q145/q146 rows run
    // over different fixtures, so composed-vs-parts needs these)
    def q147Slice(kind: String)(s: SparkSession, dir: String): DataFrame = {
      import graft.ops.MediaPipeline
      val m = graft.multimodal.Multimodal
        .multimodalMediaFromDocuments(docs(s, dir))
        .where(col("kind") === kind)
      val chain = new org.apache.spark.sql.graftbridge.DatasetBridge.FreezeChain
      kind match {
        case "image" => MediaPipeline.curateImages(m, "payload", "media_id",
          minDim = 2L, maxAspect = 2.2, minDynRange = 0L,
          lumaBounds = (60.0, 200.0), maxHamming = 3, chain = Some(chain))
        case "audio" => MediaPipeline.curateAudio(m, "payload", "media_id",
          MediaPipeline.AudioPolicy(minSampleRate = 16000L, maxChannels = 1L,
            minDurationS = 0.0, minRms = 0.0, clipPeak = 40000L),
          maxHamming = 3, chain = Some(chain))
        case _ => MediaPipeline.curateVideo(m, "payload", "media_id",
          MediaPipeline.VideoPolicy(minDurationMs = 100L, maxDurationMs = 20000L,
            minDim = 240L, maxAspect = 2.2, maxTracks = 1L),
          maxHamming = 3, chain = Some(chain))
      }
    }
    val custom: Map[String, (SparkSession, String) => DataFrame] = Map(
      "q147_image_slice" -> (q147Slice("image") _),
      "q147_audio_slice" -> (q147Slice("audio") _),
      "q147_video_slice" -> (q147Slice("video") _),
      "ann_ivfpq" -> (ivfPq _),
      "semdedup_exact_kderived" -> (semExactDerived _),
      "semdedup_twolevel_kderived" -> (semTwoLevelDerived _),
      "backoff_unfrozen" -> (backoffUnfrozen _),
      "buckets_unfrozen" -> (bucketsUnfrozen _),
      "ccnet_unfrozen" -> (ccnetUnfrozen _),
      "backoff_crawl_recompute" -> (backoffCrawlRecompute _),
      "backoff_crawl_pooled" -> (backoffCrawlPooled _),
      "minhash_skew_neardup" -> (minhashSkewNear(_, _)),
      "minhash_skew_identical" -> (minhashSkewIdentical(_, _)))
    val allQueries: Seq[(String, (SparkSession, String) => DataFrame)] =
      queryNames.map(n =>
        n -> custom.getOrElse(n, SparkEntry.queries(n))) ++
        (if (queryNames.exists(custom.contains)) Nil
         else Seq("ann_ivfpq" -> (ivfPq _)))

    // untimed full pass at the smallest factor first: JIT/codegen/
    // classloader warmup for EVERY query's code path, so the smallest
    // timed factor isn't inflated by first-encounter compilation (the
    // raw run showed q07 at 3.7 s on x1 vs 0.7 s on x3 — pure JIT, which
    // would fake a sub-linear curve)
    val warmDir = s"$destRoot/x${factors.min}"
    Seq("documents", "embeddings", "lineitem").foreach(t =>
      graft.sources.Tables.testTable(spark, warmDir, t).count())
    allQueries.foreach { case (name, fn) =>
      fn(spark, warmDir).queryExecution.toRdd.count()
      println(s"[scale-bench] warmup $name done")
    }

    val perFactor = factors.map { k =>
      val dir = s"$destRoot/x$k"
      // page-cache warmup per factor dir
      Seq("documents", "embeddings", "lineitem").foreach(t =>
        graft.sources.Tables.testTable(spark, dir, t).count())
      val rows = allQueries.map { case (name, fn) =>
        def once(): Double = {
          // each measurement is self-contained: the frozen LM chains
          // persist their hash-array pool, and the CacheManager would
          // substitute it into a LATER query's matching plan fragment
          // (including an unfrozen twin's), silently voiding the A/B
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          fn(spark, dir).queryExecution.toRdd.count()
          (System.nanoTime() - t0) / 1e9
        }
        val cold = once(); val warm = once()
        println(f"[scale-bench] x$k $name%-22s cold=$cold%7.2f warm=$warm%7.2f")
        (name, cold, warm)
      }
      (k, rows)
    }
    def fmt(d: Double) = f"$d%.3f"
    def qmap(rows: Seq[(String, Double, Double)], f: ((String, Double, Double)) => Double) =
      rows.map(r => "\"" + r._1 + "\":" + fmt(f(r))).mkString("{", ",", "}")
    val factorsJson = perFactor.map { case (k, rows) =>
      "\"" + k + "\":" + qmap(rows, r => math.min(r._2, r._3))
    }.mkString("{", ",", "}")
    val coldJson = perFactor.map { case (k, rows) =>
      "\"" + k + "\":" + qmap(rows, _._2)
    }.mkString("{", ",", "}")
    val heapGb = Runtime.getRuntime.maxMemory / (1024.0 * 1024 * 1024)
    println(s"""{"factors":$factorsJson,"factors_cold":$coldJson,"max_heap_gb":${fmt(heapGb)},"root":"$destRoot"}""")
    spark.stop()
  }
}
