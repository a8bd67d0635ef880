package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Recall@k of the IVF and IVF-PQ paths against brute truth at a given
  * corpus dir — the sanity probe behind the SCALING.md cold-fit budget
  * claims (the q90 grid pins the testdata SFs; this runs the same check
  * at the data-scale factors, where the large-quantizer fit budget —
  * random init, capped iterations — actually engages).
  *
  * Usage: runMain graft.tools.IvfRecallCheck <dir> [k] [nQueries]
  *        [initMode] [maxIter] [nProbe]
  */
object IvfRecallCheck {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/data-scale/x100")
    val k = args.lift(1).map(_.toInt).getOrElse(5)
    val nQ = args.lift(2).map(_.toInt).getOrElse(20)
    val initMode = args.lift(3).getOrElse("auto")
    val maxIter = args.lift(4).map(_.toInt).getOrElse(0)
    val nProbe = args.lift(5).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .appName("ivf-recall-check").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = graft.sources.Tables.testTable(spark, dir, "embeddings")
    val pred = col("vec_id") < nQ
    println(s"[recall-check] corpus=${emb.count()} k=$k queries=$nQ dir=$dir")
    val truth = Similarity.bruteKnn(emb, "vec_id", "embedding", pred, k)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    def recallOf(name: String, hits: Set[(Long, Long)]): Unit =
      println(f"[recall-check] $name%-10s recall@$k = ${
        hits.intersect(truth).size.toDouble / truth.size}%.3f")

    val t0 = System.nanoTime()
    val ivf = Similarity.fitIvf(emb, "embedding", initMode = initMode, maxIter = maxIter)
    println(f"[recall-check] fitIvf ${(System.nanoTime() - t0) / 1e9}%.2f s " +
      s"(${ivf.nLists} cells)")
    val ivfHits = Similarity.searchIvf(ivf, emb, "vec_id", "embedding", pred, k, nProbe = nProbe)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    recallOf("ivf", ivfHits)

    val t1 = System.nanoTime()
    val pq = Similarity.fitPq(emb, "embedding")
    println(f"[recall-check] fitPq ${(System.nanoTime() - t1) / 1e9}%.2f s")
    val pqHits = Similarity.searchIvfPq(ivf, pq, emb, "vec_id", "embedding", pred, k, nProbe = nProbe)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    recallOf("ivfpq", pqHits)
    spark.stop()
  }
}
