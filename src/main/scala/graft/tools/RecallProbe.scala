package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Scratch diagnostic: recall of the ANN paths vs brute at various knobs. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("recall-probe").master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    println(s"corpus rows = ${emb.count()}")
    val pred = col("vec_id") < 20
    val brute = Similarity.bruteKnn(emb, "vec_id", "embedding", pred, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    for (p <- Seq(4, 5, 6); mp <- Seq(2, 3)) {
      val ann = Similarity.annLsh(emb, "vec_id", "embedding", pred, 5,
        nPlanes = p, dim = 64, maxProbe = mp)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"LSH p=$p mp=$mp recall=${(brute & ann).size.toDouble / brute.size}%.3f")
    }
    for (nl <- Seq(8, 16); np <- Seq(4, 6, 8)) {
      val ivf = Similarity.annIvf(emb, "vec_id", "embedding", pred, 5,
        nLists = nl, nProbe = np)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"IVF nl=$nl np=$np recall=${(brute & ivf).size.toDouble / brute.size}%.3f")
    }

    // all-pairs tabled path: top-1 recall vs brute top-1
    val b1 = Similarity.nearestNeighbors(emb, "vec_id", "embedding", strategy = "brute")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (t <- Seq(2, 4, 6, 8)) {
      val l1 = Similarity.annLsh(emb, "vec_id", "embedding", lit(true), 1,
        smallQueries = false, nTables = t)
        .select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"TABLED T=$t top1-recall=${(b1 & l1).size.toDouble / b1.size}%.3f")
    }
    spark.stop()
  }
}
