package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32").config("spark.sql.adaptive.enabled", sys.env.getOrElse("AQE","true"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    })
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "lang", "n_chars")
    val probes = d.withColumn("nb",
      explode(array(col("n_chars") - 1, col("n_chars"), col("n_chars") + 1)))
    val e = probes.as("a").join(d.as("b"),
      col("a.lang") === col("b.lang") && col("a.nb") === col("b.n_chars") &&
        col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    for (run <- 1 to 2) {
      jobs.set(0)
      val t0 = System.nanoTime()
      val (lbl, iters) = graft.ops.Dedup.connectedComponentsWithStats(
        e, "doc_a", "doc_b", d.select("doc_id"), "doc_id")
      val midJobs = jobs.get
      lbl.queryExecution.toRdd.count()
      println(f"[ccprobe] run $run: iters=$iters ccJobs(eager)=$midJobs totalJobs=${jobs.get} wall=${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
