package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize deterministic scaled corpora for the scale rehearsal
  * (SCALING.md): replicate `documents` / `embeddings` / `lineitem` from a
  * driver testdata dir K times with a per-copy perturbation, writing
  * `<destRoot>/x<K>/<table>.parquet` for each requested factor.
  *
  * The perturbations are chosen so the WORKLOAD grows linearly in K by
  * construction — each copy is internally identical to the original corpus
  * but shares no duplicate pairs, near-dup pairs, cluster edges, or ANN
  * neighborhoods with any other copy. Any super-linear runtime measured on
  * these corpora is therefore the engine's fault, not a data-density
  * artifact (pure replication would multiply every dup cluster by K and
  * grow candidate-pair counts by K², telling us nothing about the engine):
  *
  *  - documents: ids strided by copy; every non-whitespace token gets a
  *    copy-specific suffix (so word-shingle MinHash/SimHash signatures of
  *    copies share no shingles and cross-copy Jaccard is 0), and `n_chars`
  *    is offset by copy×1000 (so q49's |Δn_chars|≤1 edge criterion and
  *    canonicalization scoring never link across copies). Copy 0 is
  *    byte-identical to the source.
  *  - embeddings: ids strided; vectors circularly rotated by copy index
  *    (norm-preserving, so cosine geometry within a copy is exactly the
  *    original corpus while cross-copy neighborhoods decorrelate).
  *  - lineitem: keys strided, measures untouched — aggregate/corr queries
  *    scale in row count with identical value distributions.
  *
  * x1 is REWRITTEN through the same writer so all scale points share file
  * layout/compression and the curve measures data volume, not parquet
  * writer differences. Everything is seed-free and deterministic: rerunning
  * produces byte-identical corpora.
  */
object ScaleSynth {
  val IdStride = 10000000L

  private def copies(df: DataFrame, k: Int)(perturb: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until k).map(i => perturb(df, i)).reduce(_.unionByName(_))

  def scaledDocuments(df: DataFrame, k: Int): DataFrame =
    copies(df, k) { (d, i) =>
      if (i == 0) d
      else d
        .withColumn("doc_id", col("doc_id") + lit(i * IdStride))
        .withColumn("text", regexp_replace(col("text"), "(\\S+)", "$1c" + i))
        .withColumn("n_chars", col("n_chars") + lit(i * 1000L))
    }

  def scaledEmbeddings(df: DataFrame, k: Int): DataFrame =
    copies(df, k) { (d, i) =>
      if (i == 0) d
      else {
        val dim = 64
        val rot = i % dim
        // rotation alone wraps at i = dim (copy 64 would be vector-identical
        // to copy 0, faking K² near-dup work at factors > 64); each wrap
        // flips the sign — also norm-preserving, and rot+flip gives 2·dim
        // distinct transforms. i < dim is byte-identical to the pre-flip
        // corpora, so x1..x30 artifacts stay comparable.
        val flip = if ((i / dim) % 2 == 1) -1.0f else 1.0f
        val rotated = concat(
          slice(col("embedding"), rot + 1, dim - rot),
          slice(col("embedding"), 1, rot))
        d.withColumn("vec_id", col("vec_id") + lit(i * IdStride))
          .withColumn("embedding",
            if (flip == 1.0f) rotated
            else transform(rotated, x => x * lit(flip)))
      }
    }

  def scaledLineitem(df: DataFrame, k: Int): DataFrame =
    copies(df, k) { (d, i) =>
      if (i == 0) d
      else d.withColumn("l_orderkey", col("l_orderkey") + lit(i * IdStride))
    }

  def main(args: Array[String]): Unit = {
    val srcDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val destRoot = args.lift(1).getOrElse("/root/repo/data-scale")
    val factors = args.lift(2).getOrElse("1,3,10")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .appName("scale-synth").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (k <- factors) {
      val dest = s"$destRoot/x$k"
      def write(name: String, df: DataFrame): Unit = {
        df.write.mode("overwrite").parquet(s"$dest/$name.parquet")
        println(s"[scale-synth] wrote $dest/$name.parquet")
      }
      write("documents",
        scaledDocuments(spark.read.parquet(s"$srcDir/documents.parquet"), k))
      write("embeddings",
        scaledEmbeddings(spark.read.parquet(s"$srcDir/embeddings.parquet"), k))
      write("lineitem",
        scaledLineitem(spark.read.parquet(s"$srcDir/lineitem.parquet"), k))
    }
    spark.stop()
  }
}
