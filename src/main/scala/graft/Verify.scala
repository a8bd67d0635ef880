package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // optional comma-separated name filter, same contract as Bench —
    // including the unknown-name WARNING: a typo'd name silently writing
    // nothing would let a stale previous output green-light the compare
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach(_.diff(SparkEntry.queries.keySet).foreach(n =>
      System.err.println(s"[verify] WARNING: unknown query '$n' in SPARK_GRAFT_QUERIES")))
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None => SparkEntry.queries
    }
    // A filtered run leaves outDir's outputs for UNSELECTED queries stale;
    // make the skip explicit and (below) restrict oracle_sql.json to the
    // selection so the compare step cannot green-light a stale output.
    if (only.isDefined) {
      val skipped = (SparkEntry.queries.keySet -- selected.keySet).toSeq.sorted
      if (skipped.nonEmpty)
        System.err.println(s"[verify] filtered run: SKIPPING ${skipped.size} " +
          s"queries (stale outputs possible in $outDir): ${skipped.mkString(",")}")
    }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Filtered runs dump oracle SQL for the selected queries only — the
    // compare iterates oracle_sql.json keys, so this restricts it to the
    // same set and stale unselected outputs surface as SKIP, not OK.
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => selected.contains(k) || only.isEmpty }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
