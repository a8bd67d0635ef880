package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off scale diagnostic: signature/payload group-size distributions
  * of the multimodal fixture's slices at a given corpus dir — the input
  * sizing for the dedup ladder's pair-enumeration terms (within-signature
  * pairs are O(g²) per group; see [[graft.ops.Dedup.hammingPairs64]]). */
object SigStats {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/repo/data-scale/x100")
    val spark = SparkSession.builder().appName("sig-stats").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val all = graft.multimodal.Multimodal.multimodalMediaFromDocuments(docs)
    for (kind <- Seq("image", "audio", "video")) {
      val m = all.where(col("kind") === kind)
      val sig = kind match {
        case "image" => graft.functions.MediaFunctions.imageAHash64(col("payload"))
        case "audio" => graft.functions.MediaFunctions.pcmEnvelopeHash64(col("payload"))
        case _       => graft.functions.MediaFunctions.videoSampleHash64(col("payload"))
      }
      val t = m.select(col("media_id"), xxhash64(col("payload")).as("ph"), sig.as("s"))
        .localCheckpoint()
      val n = t.count()
      val payloadGroups = t.groupBy("ph").count()
      val pgTop = payloadGroups.orderBy(desc("count")).limit(5).collect()
        .map(_.getLong(1)).mkString(",")
      val distinctPayloads = payloadGroups.count()
      // survivors after exact dedup = one per distinct payload; their sig groups
      val surv = t.groupBy("ph").agg(min(col("media_id")).as("id"), first(col("s")).as("s"))
      val sigGroups = surv.groupBy("s").count()
      val sgTop = sigGroups.orderBy(desc("count")).limit(5).collect()
        .map(_.getLong(1)).mkString(",")
      val distinctSigs = sigGroups.count()
      val pairSum = sigGroups.agg(sum((col("count") * (col("count") - 1)).cast("long") / lit(2)).cast("long"))
        .collect()(0).getLong(0)
      println(s"[sigstats] $kind rows=$n distinctPayloads=$distinctPayloads " +
        s"topPayloadGroups=$pgTop distinctSigs=$distinctSigs topSigGroups=$sgTop eqPairs=$pairSum")
    }
    spark.stop()
  }
}
