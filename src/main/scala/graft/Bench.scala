package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. A warmup action first touches each input table so
  * JIT/classloading and OS page-cache costs don't land on the first query.
  * Each query then runs twice; `queries`/`value` carry the per-query MIN
  * (the comparison number — robust to one-off machine contention), with
  * the raw pair in `queries_cold`/`queries_warm`.
  *
  * The timed action is `queryExecution.toRdd.count()`, not `df.count()`:
  * under `count(1)` Catalyst column-prunes the whole projection, so a query
  * ending in a pure projection (regex features, window aggregates, array
  * intersections) would never execute its expressions and the timing would
  * measure a parquet row count. Executing the analyzed plan's own RDD runs
  * the physical plan exactly as built. Failures are reported per query in an
  * `errors` field instead of being swallowed as fast fake timings.
  */
object Bench {
  /** Quiet-machine min-of-two calibration baselines, frozen PER CORE
    * COUNT and PER PROBE CLASS (round 16, quiet box). One CPU-only probe
    * mislabeled round-15 epochs as "quiet" (1.06) while code-unchanged
    * queries ran 1.5–2× their frozen minimums: the suite's cost is
    * mostly parquet scan/decode and exchange traffic, which a loaded
    * machine degrades long before a register-resident codegen loop. The
    * three probes separate the resources:
    *   - `codegen`: 400M-row range sum — pure whole-stage codegen, no IO;
    *   - `scan`: a self-generated 10M-row parquet (written untimed at
    *     bench start, so the probe is SF-independent) read back through
    *     long/double/string aggregates — decode + memory bandwidth;
    *   - `shuffle`: 12M rows through a 1M-key hash exchange with no
    *     map-side reduction — exchange write/read + task scheduling;
    *   - `single` (round 16): one thread through a 400M-step dependent-op
    *     chain — the single-core clock that driver-side model builds
    *     (eager bloom construction, collect-assembled matrices) are bound
    *     by; a box can read quiet on every parallel probe and still run
    *     those 2× slower (the round-16 q93 diagnosis).
    * Emitted per class as `{sec, quiet, ratio}`; `contention_ratio` =
    * MAX ratio (any contended resource makes per-query flags suspect),
    * `env_factor` = geometric mean (the normalizer the flag protocol in
    * BASELINE-LOCAL.md divides observed/frozen by before applying the
    * 2× gate). Re-freeze alongside BASELINE-LOCAL if a probe or its
    * partitioning changes. */
  def calibrationQuietSec(probe: String, cpus: Int): Double = probe match {
    // codegen: the round-15 quiet-box freeze (continuity across epochs);
    // scan/shuffle: round-16 quiet min-of-two-runs on the same box class;
    // single: round-16 quiet freeze — ONE thread, so core-count-free;
    // MEASURED flat across core counts r17 (local[4]/[8]/[32] =
    // 0.615/0.569/0.558 s on the same box, ambient ratios 1.0–1.2), so
    // one baseline serves all three like the other classes' per-count
    // rows would. NOTE the single-class baseline starts at the r16 box
    // epoch: the r10–r14 boxes (whose single-core was ~2.3x faster per
    // the q93 steady-state comparison) were gone before this probe
    // existed, so ratios are comparable from r16 on; pre-r16 frozen
    // minimums of driver-bound queries keep their written diagnoses
    // (q93 itself re-frozen r17 after the probe confirmed the epoch)
    case "codegen" => if (cpus >= 32) 0.24 else if (cpus >= 8) 0.27 else 0.35
    case "scan" => if (cpus >= 32) 0.53 else if (cpus >= 8) 0.46 else 0.54
    case "shuffle" => if (cpus >= 32) 0.90 else if (cpus >= 8) 1.35 else 2.20
    case "single" => 0.55
    case p => throw new IllegalArgumentException(p)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: touch every input table (events via testTable so the
    // nanos-as-long flag is set before the first read) + codegen once
    Seq("lineitem", "orders", "events", "documents", "embeddings").foreach { t =>
      try graft.sources.Tables.testTable(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    try SparkEntry.queries("q04_mean")(spark, sfDir).queryExecution.toRdd.count()
    catch { case _: Throwable => () }
    // Dataset.map-shaped queries (q38/q91/q92) JIT-compile the typed
    // deserializer/map path on first execution — a recurring warmth flag
    // class (same-box spreads up to 3.4x, r9/r16 diagnoses, never code).
    // One untimed execution each warms that path so the timed min-of-two
    // measures the query, not the JIT.
    Seq("q38_apply_rowwise", "q91_apply_expand", "q92_apply_broadcast").foreach { q =>
      try SparkEntry.queries.get(q)
        .foreach(_(spark, sfDir).queryExecution.toRdd.count(): Unit)
      catch { case _: Throwable => () }
    }

    // contention sentinel: three fixed-cost probes (CPU / scan / shuffle)
    // timed min-of-two right before the suite — the per-class quiet
    // baselines are frozen in calibrationQuietSec. The emitted ratios let
    // a reader separate machine contention from code regressions WITHOUT
    // re-running anything (two rounds of driver benches produced 6–7
    // phantom 2x flags that each cost an adjudication; a CPU-only probe
    // then read "quiet" on epochs where scan/shuffle-bound queries ran
    // 1.5–2x). contention_ratio (max) > ~1.4 ⇒ per-query flags are
    // suspect; env_factor (geomean) is the normalizer BASELINE-LOCAL.md's
    // flag protocol divides by before the 2x gate.
    val probeDir = java.nio.file.Files.createTempDirectory("graft_bench_probe")
    val probePath = probeDir.resolve("scan.parquet").toString
    spark.range(0L, 10000000L, 1L, 32)
      .selectExpr("id", "cast(id % 10000 as double) / 7.0 AS x",
        "repeat('a', cast(id % 23 as int)) AS s")
      .write.mode("overwrite").parquet(probePath) // setup: untimed
    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    def minOf2(body: => Unit): Double = math.min(timed(body), timed(body))
    val probes: Seq[(String, Double)] = Seq(
      "codegen" -> minOf2 {
        spark.range(0L, 400000000L, 1L, 32).selectExpr("sum(id * 3 + 1) as s").head()
      },
      "scan" -> minOf2 {
        spark.read.parquet(probePath)
          .selectExpr("sum(id)", "sum(x)", "sum(length(s))").head()
      },
      "shuffle" -> minOf2 {
        // contiguous 375k-id partitions over a 1M-key space: no map-side
        // reduction, the full 12M rows cross the exchange
        spark.range(0L, 12000000L, 1L, 32).selectExpr("id % 1000000 AS k")
          .groupBy("k").count().selectExpr("sum(count)").head()
      },
      "single" -> minOf2 {
        // ONE core through a dependent-op chain (LCG over 400M steps):
        // the single-thread clock the parallel probes can't see — what a
        // driver-side model build (the q93 eager bloom construction, a
        // collect-assembled centroid matrix) is actually bound by. A box
        // can read quiet on all three parallel probes and still run
        // driver-bound queries 2x slower (round-16 q93 diagnosis).
        var acc = 1L
        var i = 0L
        while (i < 400000000L) { acc = acc * 6364136223846793005L + i; i += 1 }
        if (acc == 42L) System.err.println("") // defeat dead-code elimination
      })
    try {
      java.nio.file.Files.walk(probeDir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
    } catch { case _: Throwable => () }
    val probeRatios = probes.map { case (n, sec) =>
      n -> (sec / calibrationQuietSec(n, cpus.toInt)) }
    // the `single` class is DIAGNOSTIC-ONLY: the suite is parallel-bound,
    // so folding a single-core ratio into env_factor would mis-normalize
    // scan/shuffle-bound queries; its per-class ratio is read directly
    // when adjudicating driver-bound flags (q93-class)
    val aggRatios = probeRatios.filterNot(_._1 == "single").map(_._2)
    val contentionRatio = aggRatios.max
    val envFactor = math.pow(aggRatios.product, 1.0 / aggRatios.size)
    // legacy field: the codegen probe keeps its old name so round-over-
    // round tooling can still compare epochs
    val calibrationSec = probes.head._2
    val calibrationJson = probes.zip(probeRatios).map { case ((n, sec), (_, ratio)) =>
      s""""$n":{"sec":$sec,"quiet":${calibrationQuietSec(n, cpus.toInt)},"ratio":$ratio}"""
    }.mkString("{", ",", "}")

    // optional comma-separated filter for single-query iteration
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach(_.diff(SparkEntry.queries.keySet).foreach(n =>
      System.err.println(s"[bench] WARNING: unknown query '$n' in SPARK_GRAFT_QUERIES")))
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
    // Each query runs TWICE back-to-back (cold then warm) and `queries`
    // reports the MIN — single runs produced 4–22x phantom outliers under
    // machine contention (round-9 driver bench); min-of-two is robust to a
    // one-off perturbation while still a real end-to-end execution. Round
    // records compare the min; cold/warm are kept for warmth diagnostics.
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): (Double, Option[String]) = {
        val t0 = System.nanoTime()
        val err =
          try { fn(spark, sfDir).queryExecution.toRdd.count(); None }
          catch { case e: Throwable => Some(e.toString.takeWhile(_ != '\n').take(200)) }
        ((System.nanoTime() - t0) / 1e9, err)
      }
      val (cold, errCold) = once()
      val (warmRaw, errWarm) = if (errCold.isDefined) (cold, errCold) else once()
      // a warm run that DIES fast must not report its tiny elapsed as the
      // min — keep the successful cold measurement instead
      val warm = if (errCold.isEmpty && errWarm.isDefined) cold else warmRaw
      (name, cold, warm, errCold.orElse(errWarm))
    }
    def esc(s: String): String =
      s.replace("\\", "\\\\").replace("\"", "\\\"").filter(_ >= ' ')
    def qmap(f: ((String, Double, Double, Option[String])) => Double): String =
      results.map(r => "\"" + r._1 + "\":" + f(r)).mkString("{", ",", "}")
    val qs = qmap(r => math.min(r._2, r._3))
    val qsCold = qmap(_._2)
    val qsWarm = qmap(_._3)
    val errs = results.collect { case (k, _, _, Some(e)) => "\"" + k + "\":\"" + esc(e) + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(r => math.min(r._2, r._3)).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_cold":$qsCold,"queries_warm":$qsWarm,"errors":$errs,"calibration_sec":$calibrationSec,"calibration_cpus":$cpus,"calibration":$calibrationJson,"contention_ratio":$contentionRatio,"env_factor":$envFactor,"sf":"$sfDir"}"""
    println(json)
    // log-tail capture can truncate a long run's stdout (round 7 lost
    // q01–q19 and the total); a file copy makes the artifact durable. A
    // failed write (missing dir, perms) must not fail the completed run —
    // the stdout artifact already exists
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      try java.nio.file.Files.writeString(java.nio.file.Paths.get(p), json + "\n")
      catch { case e: Throwable =>
        System.err.println(s"[bench] WARNING: could not write $p: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
