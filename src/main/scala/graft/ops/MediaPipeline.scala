package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The multimodal curation capstone — quality gates FIRST, then the dedup
  * ladder over the survivors, one call (the media twin of
  * [[Pipeline.cleanCorpus]]): gate order matters at scale because the
  * battery is a scan-stage projection that drops junk BEFORE anything is
  * hashed, banded, or clustered. Output: every input row with
  * `(idCol, status, keeper)`, `status` ∈ `quality_reject` / `exact_dup` /
  * `near_dup` / `kept` (keeper = the row a duplicate lost to; itself for
  * kept and quality-rejected rows — a reject is a gate decision, not a
  * loss to another row).
  *
  * Freeze contract: with `chain`, the MEDIA frame is materialized once at
  * entry (the upstream derivation — a crawl extraction — runs once; the
  * gate decode runs once per output branch) and the GATED POOL is frozen
  * again inside the ladder, so its ~8 consumers plan off materialized
  * rows. Without a chain everything recomputes per consumer (fine for
  * parquet-backed media — the [[MediaDedup.imageDedupReport]] trade). */
object MediaPipeline {

  def curateImages(
      media: DataFrame,
      payloadCol: String,
      idCol: String,
      minDim: Long = 7L,
      maxAspect: Double = 1.8,
      minDynRange: Long = 8L,
      lumaBounds: (Double, Double) = (70.0, 200.0),
      maxHamming: Int = 3,
      chain: Option[org.apache.spark.sql.graftbridge.DatasetBridge.FreezeChain] = None): DataFrame = {
    val m = chain.map(_.freeze(media)).getOrElse(media)
    val gated = m.withColumn("__s__",
        MediaQuality.imageSignals(col(payloadCol)))
      .withColumn("__p__", MediaQuality.imageGates(col("__s__"),
        minDim, maxAspect, minDynRange, lumaBounds).getField("passes"))
    val rejects = gated.where(!col("__p__"))
      .select(col(idCol), lit("quality_reject").as("status"), col(idCol).as("keeper"))
    val pool = gated.where(col("__p__")).drop("__s__", "__p__")
    val ladder = MediaDedup.imageDedupReport(pool, payloadCol, idCol, maxHamming, chain)
      .select(col(idCol), col("status"), col("keeper"))
    rejects.unionByName(ladder)
  }
}
