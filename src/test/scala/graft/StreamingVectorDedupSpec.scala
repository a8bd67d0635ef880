package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.Similarity
import graft.streaming.StreamingVectorDedup

/** Streaming embedding near-dup admission: stream ≡ batch parity on a
  * fixture corpus, TTL expiry/readmission/refresh, foreachBatch wiring,
  * reference-seeded admission, and the zero-norm/NULL contracts. */
class StreamingVectorDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private val D = 8

  private def unit(v: Seq[Double]): Seq[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }
  private def e(i: Int): Seq[Double] = Seq.tabulate(D)(j => if (j == i) 1.0 else 0.0)
  private def mix(a: Seq[Double], b: Seq[Double], t: Double): Seq[Double] =
    unit(a.zip(b).map { case (x, y) => (1 - t) * x + t * y })

  // two tight clusters (near-dups within) + spread singletons
  private def fixtureRows: Seq[(Long, Seq[Double])] = Seq(
    1L -> e(0),
    2L -> mix(e(0), e(1), 0.05), // cos to 1 ≈ 0.995 → dup of 1
    3L -> e(1),
    4L -> e(2),
    5L -> mix(e(1), e(2), 0.5), // cos ≈ 0.707 to both → admitted
    6L -> mix(e(0), e(2), 0.07) // cos to 1 ≈ 0.99 → dup of 1/2
  )

  private def fitModels(df: DataFrame): (Similarity.IvfModel, Similarity.PqModel) = {
    val ivf = Similarity.fitIvf(df, "embedding", nLists = 2)
    val pq = Similarity.fitPq(df, "embedding", m = 4, ksub = 4)
    (ivf, pq)
  }

  test("stream ≡ batch parity on the fixture corpus") {
    val df = fixtureRows.toDF("vec_id", "embedding")
    val (ivf, pq) = fitModels(df)
    val batchKept = Similarity.dropNearDuplicateVectors(
      df, "vec_id", "embedding", 0.9, strategy = "brute")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // stream the same corpus in arrival batches [1,2,3] [4,5] [6];
    // nProbe = nLists → the probe is exhaustive, so parity is exact
    // (adcMargin 2.0 disables the ADC prefilter: the 6-row codebook is
    // too coarse to bound its estimate error)
    var seen = StreamingVectorDedup.emptyVectorState(spark)
    val admitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    Seq(Seq(1L, 2L, 3L), Seq(4L, 5L), Seq(6L)).zipWithIndex.foreach { case (ids, i) =>
      val b = fixtureRows.filter(r => ids.contains(r._1)).toDF("vec_id", "embedding")
      val (k, s) = StreamingVectorDedup.vectorDedupBatchStepTtl(
        b, seen, i.toLong, ttlBatches = 100, ivf, pq, "vec_id", "embedding",
        threshold = 0.9, nProbe = 2, adcMargin = 2.0)
      seen = s
      admitted ++= k.select("vec_id").collect().map(_.getLong(0))
    }
    assert(admitted.toSet == batchKept)
    assert(admitted.sorted.toSeq == Seq(1L, 3L, 4L, 5L))
  }

  test("TTL: expiry re-admits, veto refreshes the original's stamp") {
    val df = fixtureRows.toDF("vec_id", "embedding")
    val (ivf, pq) = fitModels(df)
    var seen = StreamingVectorDedup.emptyVectorState(spark)
    def step(batchId: Long, rows: (Long, Seq[Double])*): Seq[Long] = {
      val b = rows.toDF("vec_id", "embedding")
      val (k, s) = StreamingVectorDedup.vectorDedupBatchStepTtl(
        b, seen, batchId, ttlBatches = 2, ivf, pq, "vec_id", "embedding",
        threshold = 0.9, nProbe = 2, adcMargin = 2.0)
      seen = s
      k.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    }
    assert(step(0, 1L -> e(0), 3L -> e(1)) == Seq(1L, 3L))
    // batch 1: near-copy of v1 → dropped; the veto refreshes v1's stamp
    assert(step(1, 7L -> mix(e(0), e(1), 0.05)) == Seq())
    val stamps = seen.select("__vid__", "last_batch").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stamps(1L) == 1L && stamps(3L) == 0L) // veto refreshed only v1
    // batch 2 (ttl=2): v3's stamp-0 state ages out → its copy re-admits;
    // v1 was refreshed to stamp 1 → still live, its copy still dropped
    assert(step(2, 8L -> e(1), 9L -> mix(e(0), e(1), 0.04)) == Seq(8L))
  }

  test("foreachBatch wiring dedups across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val df = fixtureRows.toDF("vec_id", "embedding")
    val (ivf, pq) = fitModels(df)
    val input = MemoryStream[(Long, Seq[Double])]
    val sdf = input.toDF().toDF("vec_id", "embedding")
    val admitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val step = StreamingVectorDedup.vectorDedupForeachBatchTtl(
      ivf, pq, "vec_id", "embedding", threshold = 0.9, ttlBatches = 100,
      nProbe = 2, adcMargin = 2.0) { kept =>
      admitted.synchronized {
        admitted ++= kept.select("vec_id").collect().map(_.getLong(0))
      }
    }
    val q = sdf.writeStream.outputMode("append").foreachBatch(step).start()
    input.addData(1L -> e(0), 3L -> e(1))
    q.processAllAvailable()
    input.addData(2L -> mix(e(0), e(1), 0.05), 4L -> e(2)) // 2 dups 1
    q.processAllAvailable()
    q.stop()
    assert(admitted.sorted.toSeq == Seq(1L, 3L, 4L))
  }

  test("reference-seeded admission drops arrivals the corpus already has") {
    val ref = fixtureRows.toDF("vec_id", "embedding")
    val (ivf, pq) = fitModels(ref)
    val seed = StreamingVectorDedup.vectorState(
      ref, ivf, pq, "vec_id", "embedding", stampBatch = 0L)
    var seen = seed
    val arrivals = Seq(
      100L -> mix(e(0), e(1), 0.06), // near-dup of reference v1
      101L -> mix(e(3), e(4), 0.5) // genuinely new direction
    ).toDF("vec_id", "embedding")
    val (k, _) = StreamingVectorDedup.vectorDedupBatchStepTtl(
      arrivals, seen, 1L, ttlBatches = 100, ivf, pq, "vec_id", "embedding",
      threshold = 0.9, nProbe = 2, adcMargin = 2.0)
    assert(k.select("vec_id").collect().map(_.getLong(0)).toSeq == Seq(101L))
    // wrong-schema seed fails fast in the foreachBatch wiring
    val bad = Seq((1L, 2L)).toDF("__vid__", "cell")
    val ex = intercept[IllegalArgumentException](
      StreamingVectorDedup.vectorDedupForeachBatchTtl(
        ivf, pq, "vec_id", "embedding", 0.9, 10,
        initialSeen = Some(bad)) { _ => () })
    assert(ex.getMessage.contains("vectorState schema"))
  }

  test("ADC prefilter passes true near-dups under a well-trained codebook") {
    // a FINE codebook (64 sub-centroids per 2-d subspace over 512 seeded
    // gaussians) reconstructs well enough that an exact-duplicate's ADC
    // estimate stays within the default 0.2 margin of its true cosine
    // (1.0) — the parity tests above deliberately DISABLE the prefilter
    // because their 6-row codebook cannot bound the estimate error
    val rnd = new scala.util.Random(42)
    val corpus = (0 until 512).map(i =>
      (i.toLong, unit(Seq.fill(D)(rnd.nextGaussian())))).toDF("vec_id", "embedding")
    val ivf = Similarity.fitIvf(corpus, "embedding", nLists = 2)
    val pq = Similarity.fitPq(corpus, "embedding", m = 4, ksub = 64)
    val v = unit(Seq.fill(D)(new scala.util.Random(7).nextGaussian()))
    var seen = StreamingVectorDedup.emptyVectorState(spark)
    val b0 = Seq(1L -> v).toDF("vec_id", "embedding")
    val (_, s0) = StreamingVectorDedup.vectorDedupBatchStepTtl(
      b0, seen, 0L, 100, ivf, pq, "vec_id", "embedding", 0.9, nProbe = 2)
    seen = s0
    val b1 = Seq(2L -> v).toDF("vec_id", "embedding") // exact duplicate
    val (k1, _) = StreamingVectorDedup.vectorDedupBatchStepTtl(
      b1, seen, 1L, 100, ivf, pq, "vec_id", "embedding", 0.9, nProbe = 2)
    assert(k1.count() == 0L) // dropped THROUGH the default ADC margin
  }

  test("durable TTL state: kill/restart recovers bit-identically, refresh stamps included") {
    val df = fixtureRows.toDF("vec_id", "embedding")
    val (ivf, pq) = fitModels(df)
    val dir = java.nio.file.Files.createTempDirectory("vecttl").toString
    // ttl=2 and batches crossing an eviction boundary AND a refresh: the
    // recovery must restore the veto-refreshed stamp, which NO sink
    // rescan could reconstruct (refreshes are invisible in admitted rows)
    def b(rows: (Long, Seq[Double])*) = rows.toDF("vec_id", "embedding")
    val batches = Seq(
      b(1L -> e(0), 3L -> e(1)),
      b(7L -> mix(e(0), e(1), 0.05)), // dup of 1 → dropped, refreshes v1
      b(8L -> e(1), 9L -> mix(e(0), e(1), 0.04)), // v3 expired → 8 in; v1 refreshed → 9 out
      b(10L -> e(0))) // v1's refresh (batch 2 via veto of 9) keeps it live → 10 out
    def run(step: (org.apache.spark.sql.DataFrame, Long) => Unit,
        from: Int, to: Int, buf: scala.collection.mutable.ArrayBuffer[Long]): Unit =
      (from to to).foreach(i => step(batches(i), i.toLong))
    def mkStep(buf: scala.collection.mutable.ArrayBuffer[Long], d: Option[String]) =
      StreamingVectorDedup.vectorDedupForeachBatchTtl(
        ivf, pq, "vec_id", "embedding", threshold = 0.9, ttlBatches = 2,
        nProbe = 2, adcMargin = 2.0, stateDir = d) { kept =>
        buf ++= kept.select("vec_id").collect().map(_.getLong(0))
      }
    // uninterrupted reference run (no state dir)
    val ref = scala.collection.mutable.ArrayBuffer.empty[Long]
    run(mkStep(ref, None), 0, 3, ref)
    // durable run killed after batch 1; a FRESH closure resumes at 2
    val aBuf = scala.collection.mutable.ArrayBuffer.empty[Long]
    run(mkStep(aBuf, Some(dir)), 0, 1, aBuf)
    val bBuf = scala.collection.mutable.ArrayBuffer.empty[Long]
    run(mkStep(bBuf, Some(dir)), 2, 3, bBuf)
    assert((aBuf ++ bBuf).sorted.toSeq == ref.sorted.toSeq,
      s"recovered run ${(aBuf ++ bBuf).sorted} != reference ${ref.sorted}")
    // crash-AFTER-state-write: delta=3 exists; a fresh closure replaying
    // batch 3 must skip its own orphaned delta and reproduce the output
    val cBuf = scala.collection.mutable.ArrayBuffer.empty[Long]
    mkStep(cBuf, Some(dir))(batches(3), 3L)
    // the reference's batch-3 output: v10 dropped (v1 kept alive through
    // the batch-2 veto refresh, which only the delta log can restore) —
    // the replay must skip its own orphaned delta=3 and emit nothing
    assert(cBuf.isEmpty, s"replayed batch 3 admitted $cBuf, expected none")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(dir))
  }

  test("zero-norm and NULL vectors are always admitted and leave no state") {
    val df = fixtureRows.toDF("vec_id", "embedding")
    val (ivf, pq) = fitModels(df)
    val b = Seq(
      (1L, Some(e(0))),
      (2L, Some(Seq.fill(D)(0.0))), // zero norm
      (3L, Option.empty[Seq[Double]])
    ).toDF("vec_id", "embedding")
    val (k, s) = StreamingVectorDedup.vectorDedupBatchStepTtl(
      b, StreamingVectorDedup.emptyVectorState(spark), 0L, 100,
      ivf, pq, "vec_id", "embedding", 0.9, nProbe = 2, adcMargin = 2.0)
    assert(k.select("vec_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(s.count() == 1L) // only v1 registered
  }
}
