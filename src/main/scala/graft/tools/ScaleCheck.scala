package graft.tools

import org.apache.spark.sql.SparkSession

/** Workload-linearity check for the scale rehearsal (SCALING.md): the
  * ScaleSynth perturbation claims near-dup pairs grow EXACTLY linearly in
  * the replication factor (each copy reproduces the original corpus's pair
  * structure; cross-copy Jaccard is 0). This prints q22's output row count
  * at each factor so the claim is measured, not asserted. */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val destRoot = args.lift(0).getOrElse("/root/repo/data-scale")
    val factors = args.lift(1).getOrElse("1,3,10,30")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .appName("scale-check").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val counts = factors.map { k =>
      val n = graft.SparkEntry.queries("q22_dedup_minhash")(spark, s"$destRoot/x$k").count()
      println(s"[scale-check] x$k q22 pairs = $n")
      (k, n)
    }
    val base = counts.head._2.toDouble / counts.head._1
    counts.foreach { case (k, n) =>
      val expect = base * k
      println(f"[scale-check] x$k: $n vs linear ${expect}%.0f (ratio ${n / expect}%.4f)")
    }
    spark.stop()
  }
}
