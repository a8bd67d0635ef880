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
  /** Quiet-machine min-of-two of the calibration aggregate below, frozen
    * PER CORE COUNT (round 15, quiet box: 0.35 at the default local[4],
    * 0.27 at local[8], 0.24 at local[32] — the 32-task 400M-row sum
    * scales only weakly with threads, so one constant mislabels quiet
    * runs at other configs). The denominator of the emitted
    * `contention_ratio`; the config it was resolved for rides the JSON
    * as `calibration_cpus`. Re-freeze alongside BASELINE-LOCAL if the
    * calibration query or partitioning changes. */
  def calibrationQuietSec(cpus: Int): Double =
    if (cpus >= 32) 0.24 else if (cpus >= 8) 0.27 else 0.35

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

    // contention sentinel: a fixed-cost, IO-free aggregate (pure codegen
    // over an in-memory range — no parquet, no shuffle payload) timed
    // min-of-two right before the suite. Its quiet-machine time is frozen
    // below; the emitted ratio lets a reader separate machine contention
    // from code regressions WITHOUT re-running anything (two rounds of
    // driver benches produced 6–7 phantom 2x flags that each cost an
    // adjudication). Ratio > ~1.5 ⇒ treat per-query flags as suspect and
    // prefer the quiet min-of-two in BASELINE-LOCAL.
    def calibrateOnce(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 400000000L, 1L, 32)
        .selectExpr("sum(id * 3 + 1) as s").head()
      (System.nanoTime() - t0) / 1e9
    }
    val calibrationSec = math.min(calibrateOnce(), calibrateOnce())
    val contentionRatio = calibrationSec / calibrationQuietSec(cpus.toInt)

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
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_cold":$qsCold,"queries_warm":$qsWarm,"errors":$errs,"calibration_sec":$calibrationSec,"calibration_cpus":$cpus,"contention_ratio":$contentionRatio,"sf":"$sfDir"}"""
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
