package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling main for operator iteration (not part of the API). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    d.count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (rows=$n)")
    }

    val grams = d.select(col("doc_id").as("__id__"),
      graft.functions.StringFunctions.charNGrams(col("text"), 3).as("__g__"))

    time("grams only")(grams.queryExecution.toRdd.count())
    time("grams only again")(grams.queryExecution.toRdd.count())
    val sized = grams.select(size(col("__g__")).as("s")).agg(sum("s"))
    time("gram count")(sized.queryExecution.toRdd.count())
    println(sized.collect().head.toString)

    val pairs = d.select(col("doc_id").as("doc_a"), (col("doc_id") + 1).as("doc_b"))
    val joined = pairs
      .join(grams.select(col("__id__").as("doc_a"), col("__g__").as("g_a")), "doc_a")
      .join(grams.select(col("__id__").as("doc_b"), col("__g__").as("g_b")), "doc_b")
    time("pairs+joins, no jaccard")(joined.queryExecution.toRdd.count())
    val withJac = joined.select(
      (size(array_intersect(col("g_a"), col("g_b"))).cast("double") /
        size(array_union(col("g_a"), col("g_b"))).cast("double")).as("j"))
    time("with jaccard")(withJac.queryExecution.toRdd.count())
    spark.stop()
  }
}
