package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch A/B harness for optimization-round experiments: times named
  * plan variants over a localCheckpoint'ed fixture frame so per-row
  * expression cost is isolated from fixture generation. Edit the variant
  * list per experiment; numbers land in OPTIMIZATION_r18.md.
  *
  * Usage: runMain graft.tools.OptProbe [sfDir]
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.sources.Tables.testTable(spark, sfDir, "documents")
    val m = graft.multimodal.Multimodal
      .progressiveJpegMediaFromDocuments(docs).localCheckpoint()

    def t(name: String)(df: => DataFrame): Unit = {
      val times = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[optprobe] $name%-28s min=${times.min}%.3f  runs=" +
        times.map(x => f"$x%.3f").mkString(","))
    }

    val sig = graft.ops.MediaQuality.imageSignals(col("payload"))
    val ah = graft.functions.MediaFunctions.imageAHash64(col("payload"))

    t("pixelstats-only") {
      m.select(col("media_id"),
        graft.functions.MediaFunctions.imagePixelStats(col("payload")).as("p"))
    }
    t("ahash-only") { m.select(col("media_id"), ah.as("a")) }
    t("signals-struct") { m.select(col("media_id"), sig.as("__s__")) }
    t("signals-fields") {
      m.select(col("media_id"), sig.as("__s__"))
        .select(col("media_id"),
          col("__s__.width").as("width"), col("__s__.height").as("height"),
          round(col("__s__.mean_luma"), 6).as("mean_luma"),
          col("__s__.dyn_range").as("dyn_range"),
          graft.ops.MediaQuality.imageGates(col("__s__"))
            .getField("passes").as("passes"))
    }
    t("battery-split-old-shape") {
      m.select(col("media_id"), sig.as("__s__"), ah.as("__ah__"))
        .select(col("media_id"),
          col("__s__.width").as("width"), col("__s__.height").as("height"),
          round(col("__s__.mean_luma"), 6).as("mean_luma"),
          col("__s__.dyn_range").as("dyn_range"),
          graft.ops.MediaQuality.imageGates(col("__s__"))
            .getField("passes").as("passes"),
          shiftrightunsigned(col("__ah__"), 32).as("ah_hi"),
          col("__ah__").bitwiseAND(lit(0xFFFFFFFFL)).as("ah_lo"))
    }
    t("battery-fused-new-shape") {
      m.select(col("media_id"),
          graft.ops.MediaQuality.imageSignalsWithAHash(col("payload")).as("__s__"))
        .select(col("media_id"),
          col("__s__.width").as("width"), col("__s__.height").as("height"),
          round(col("__s__.mean_luma"), 6).as("mean_luma"),
          col("__s__.dyn_range").as("dyn_range"),
          graft.ops.MediaQuality.imageGates(col("__s__"))
            .getField("passes").as("passes"),
          shiftrightunsigned(col("__s__.ahash"), 32).as("ah_hi"),
          col("__s__.ahash").bitwiseAND(lit(0xFFFFFFFFL)).as("ah_lo"))
    }
    spark.stop()
  }
}
