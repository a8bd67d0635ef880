package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingDedup

/** Streaming throughput rehearsal (SCALING.md): sustained micro-batch
  * ingest through the three streaming dedup paths, printing ONE JSON line
  * `{"pipelines":{name:{"docs_per_sec":…,"batch_sec_first":…,
  * "batch_sec_last":…,…}},…}`.
  *
  * The batch rehearsal ([[ScaleBench]]) proves the batch operators scale
  * with data volume; the claim to prove HERE is different — per-batch
  * latency must not grow with STREAM AGE. Three paths, three contracts:
  *
  *  - `exact`: engine-managed dropDuplicates state (hash keys only) —
  *    state grows with distinct docs seen, per-batch cost stays flat
  *    because the state store is keyed, not scanned.
  *  - `neardup`: [[StreamingDedup.nearDupForeachBatch]] — band-key table
  *    grows one generation per batch; each batch joins against the FULL
  *    accumulated table, so per-batch cost may creep with corpus size
  *    (the documented unbounded-state tradeoff).
  *  - `neardup_ttl`: [[StreamingDedup.nearDupForeachBatchTtl]] — the
  *    bounded-state production path; eviction caps the table at the
  *    trailing window, so per-batch cost must FLATTEN. This is the row
  *    that verifies the O(window) state claim empirically.
  *
  * Feed: the sf documents corpus, cycled `cycles` times with fresh ids per
  * cycle — cycle 0 is all-novel, later cycles are all-duplicate, so the
  * state tables stop growing exactly when the TTL contract says they
  * should. Per-batch wall times come from timing `processAllAvailable`
  * after each `addData` (one micro-batch per call); the first TIMED batch
  * is preceded by one untimed warmup batch per pipeline (JIT/codegen,
  * same rationale as [[ScaleBench]]). Throughput = timed docs / total
  * timed seconds; first/mean-of-last-3 per-batch seconds expose growth.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val batchSize = args.lift(1).map(_.toInt).getOrElse(500)
    val cycles = args.lift(2).map(_.toInt).getOrElse(4)

    val spark = SparkSession.builder()
      .appName("stream-bench").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val corpus: Array[(Long, String)] =
      spark.read.parquet(s"$sfDir/documents.parquet")
        .where(col("text").isNotNull)
        .select(col("doc_id").cast("long"), col("text"))
        .as[(Long, String)].collect()
    val n = corpus.length
    // fresh ids per cycle (text unchanged → cycles 1+ are pure duplicates)
    val feed: Iterator[(Long, String)] = (0 until cycles).iterator.flatMap(c =>
      corpus.iterator.map { case (id, t) => (id + c * 100000000L, t) })
    val allBatches: Seq[Seq[(Long, String)]] =
      feed.grouped(batchSize).toSeq
    println(s"[stream-bench] corpus=$n docs, ${allBatches.size} batches of " +
      s"<=$batchSize over $cycles cycles")

    case class Result(name: String, docs: Long, totalSec: Double,
        batchSec: Seq[Double], admitted: Long)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def runFeed[T: org.apache.spark.sql.Encoder](name: String,
        batches: Seq[Seq[T]])(mkQuery: MemoryStream[T] =>
        (org.apache.spark.sql.streaming.StreamingQuery, () => Long)): Result = {
      val input = MemoryStream[T]
      val (q, admittedCount) = mkQuery(input)
      try {
        // untimed warmup micro-batch
        input.addData(batches.head)
        q.processAllAvailable()
        val times = batches.tail.map { b =>
          input.addData(b)
          val t0 = System.nanoTime()
          q.processAllAvailable()
          (System.nanoTime() - t0) / 1e9
        }
        val docs = batches.tail.map(_.size.toLong).sum
        val r = Result(name, docs, times.sum, times, admittedCount())
        println(f"[stream-bench] $name%-12s ${r.docs / r.totalSec}%9.0f docs/s  " +
          f"first=${times.head}%6.3f s  last3=${times.takeRight(3).sum / 3}%6.3f s  " +
          f"admitted=${r.admitted}")
        r
      } finally q.stop()
    }
    def run(name: String)(mkQuery: MemoryStream[(Long, String)] =>
        (org.apache.spark.sql.streaming.StreamingQuery, () => Long)): Result =
      runFeed(name, allBatches)(mkQuery)

    // offline fit-once for the LM-admission row: reference = the %3 slice,
    // threshold = the corpus median ppl so the gate BINDS (~half admitted)
    val docsDf = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val lmKernel = graft.ops.TextAnalysis.lmKernel(
      graft.ops.TextAnalysis.fitStupidBackoffLm(
        docsDf.where(col("doc_id") % 3 === 0), "text"))
    val medPpl = docsDf.select(
        graft.ops.TextAnalysis.backoffPerplexityScore(col("text"), lmKernel).as("p"))
      .where(col("p").isNotNull)
      .stat.approxQuantile("p", Array(0.5), 0.01).head

    val results = Seq(
      run("ppl_admit") { input =>
        val out = graft.streaming.StreamingSelection.perplexityAdmission(
          input.toDF().toDF("doc_id", "text"), lmKernel, "text", medPpl)
        val q = out.writeStream.outputMode("append")
          .format("memory").queryName("sb_ppl").start()
        (q, () => spark.table("sb_ppl").count())
      },
      run("exact") { input =>
        val out = StreamingDedup.dropDuplicateTexts(input.toDF()
          .toDF("doc_id", "text"), "text")
        val q = out.writeStream.outputMode("append")
          .format("memory").queryName("sb_exact").start()
        (q, () => spark.table("sb_exact").count())
      },
      run("neardup") { input =>
        var admitted = 0L
        val step = StreamingDedup.nearDupForeachBatch("text", "doc_id") { kept =>
          admitted += kept.count()
        }
        val q = input.toDF().toDF("doc_id", "text")
          .writeStream.outputMode("append").foreachBatch(step).start()
        (q, () => admitted)
      },
      run("neardup_ttl") { input =>
        var admitted = 0L
        val step = StreamingDedup.nearDupForeachBatchTtl(
          "text", "doc_id", ttlBatches = 8) { kept =>
          admitted += kept.count()
        }
        val q = input.toDF().toDF("doc_id", "text")
          .writeStream.outputMode("append").foreachBatch(step).start()
        (q, () => admitted)
      })

    // vector path: embeddings cycled with fresh ids (cycles 1+ are exact
    // duplicates), through the TTL IVF-PQ admission gate — the row that
    // verifies per-batch vector-dedup cost is flat in stream age. The
    // IVF/PQ fit is the offline fit-once step, outside the timed loop.
    val embDf = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val vecCorpus: Array[(Long, Seq[Double])] =
      embDf.as[(Long, Seq[Double])].collect()
    val vecBatches: Seq[Seq[(Long, Seq[Double])]] =
      (0 until cycles).iterator.flatMap(c => vecCorpus.iterator.map {
        case (id, v) => (id + c * 100000000L, v)
      }).grouped(batchSize).toSeq
    val ivf = graft.ops.Similarity.fitIvf(embDf, "embedding")
    val pq = graft.ops.Similarity.fitPq(embDf, "embedding")
    val vecResult = runFeed("vector_ttl", vecBatches) { input =>
      var admitted = 0L
      val step = graft.streaming.StreamingVectorDedup.vectorDedupForeachBatchTtl(
        ivf, pq, "vec_id", "embedding", threshold = 0.95, ttlBatches = 8) { kept =>
        admitted += kept.count()
      }
      val q = input.toDF().toDF("vec_id", "embedding")
        .writeStream.outputMode("append").foreachBatch(step).start()
      (q, () => admitted)
    }

    def fmt(d: Double) = f"$d%.3f"
    val json = (results :+ vecResult).map { r =>
      "\"" + r.name + "\":{" +
        s""""docs":${r.docs},"docs_per_sec":${fmt(r.docs / r.totalSec)},""" +
        s""""batch_sec_first":${fmt(r.batchSec.head)},""" +
        s""""batch_sec_last3":${fmt(r.batchSec.takeRight(3).sum / 3)},""" +
        s""""admitted":${r.admitted},"batches":${r.batchSec.size}}"""
    }.mkString("{", ",", "}")
    println(s"""{"pipelines":$json,"batch_size":$batchSize,"cycles":$cycles,"corpus":$n}""")
    spark.stop()
  }
}
