package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.DatasetBridge
object CCDebug {
  def ts(msg: String): Unit = println(s"[cc ${System.currentTimeMillis() % 1000000}] $msg")
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().appName("cc-debug").master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "lang", "n_chars")
    val edges = d.as("a").join(d.as("b"),
      col("a.lang") === col("b.lang") &&
        abs(col("a.n_chars") - col("b.n_chars")) <= 1 &&
        col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("s"), col("b.doc_id").as("t"))
    def freeze(df: org.apache.spark.sql.DataFrame) =
      DatasetBridge.fromInternalRdd(df.localCheckpoint())
    var e = freeze(edges.union(edges.select(col("t").as("s"), col("s").as("t")))
      .where(col("s") =!= col("t")).distinct())
    var labels = freeze(d.select(col("doc_id").as("id")).distinct()
      .withColumn("lbl", col("id")))
    var go = true
    for (i <- 1 to 60 if go) {
      val nbr = e.join(labels.select(col("id").as("t"), col("lbl")), Seq("t"))
        .select(col("s").as("id"), col("lbl"))
      var cur = freeze(labels.select("id", "lbl").union(nbr)
        .groupBy("id").agg(min("lbl").as("lbl")))
      for (j <- 0 until 3) {
        cur = freeze(cur
          .join(cur.select(col("id").as("lbl"), col("lbl").as("lbl2")), Seq("lbl"), "left")
          .select(col("id"), least(col("lbl"), col("lbl2")).as("lbl")))
      }
      // contract: rewrite edges through the updated labels; regions merge
      e = freeze(e
        .join(cur.select(col("id").as("s"), col("lbl").as("ls")), Seq("s"))
        .join(cur.select(col("id").as("t"), col("lbl").as("lt")), Seq("t"))
        .select(col("ls").as("s"), col("lt").as("t"))
        .where(col("s") =!= col("t")).distinct())
      val remaining = e.count()
      ts(s"round $i edges=$remaining")
      labels = cur
      if (remaining == 0) go = false
    }
    spark.stop()
  }
}
