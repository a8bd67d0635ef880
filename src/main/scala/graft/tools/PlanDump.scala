package graft.tools

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans for named `SparkEntry.queries` — the
  * evidence artifact behind PLANS.md (and the quickest way to audit a
  * shuffle/exchange-reuse question without wiring a notebook).
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outFile> [query ...]
  * (no query names → all queries).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outFile = if (args.length > 1) args(1) else "/tmp/plans.txt"
    val names = if (args.length > 2) args.drop(2).toSeq else graft.SparkEntry.queries.keys.toSeq.sorted

    val spark = SparkSession.builder()
      .appName("graft-plandump").master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // EXEC=1: run each query first so the dumped plan is the FINAL adaptive
    // plan (runtime exchange reuse / AQE join changes only show up there)
    val exec = sys.env.get("EXEC").contains("1")
    val sb = new StringBuilder
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      if (exec) df.queryExecution.toRdd.count()
      sb.append(s"==== $name ====\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      sb.append("\n")
    }
    Files.write(Paths.get(outFile), sb.toString.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    println(s"[plandump] wrote ${names.size} plans to $outFile")
    spark.stop()
  }
}
