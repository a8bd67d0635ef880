package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Media (image) deduplication for crawl curation — the multimodal twin of
  * the text dedup ladder: exact byte-identical copies first (mirrored
  * assets, re-hosted files), then PERCEPTUAL near-duplicates (re-encoded /
  * lightly edited images — including CROSS-CODEC re-encodes, since the
  * grid hashes dispatch over PNG and baseline JPEG with identical
  * conventions) via 64-bit grid hashes
  * ([[graft.functions.ImageAHash64]] aHash /
  * [[graft.functions.ImageDHash64]] dHash) paired by the same
  * pigeonhole-banded Hamming machinery text SimHash uses
  * ([[Dedup.hammingPairs64]]) and clustered transitively
  * ([[Dedup.duplicateClusters]]).
  *
  * Scale shape, stage by stage:
  *   - exact stage: [[Dedup.duplicateIdPairs]]'s hash-narrow two-phase —
  *     the corpus-wide exchange carries a 128-bit payload hash + id,
  *     never the image bytes; only hash-dup candidates re-verify on the
  *     full payload.
  *   - hash stage: one codegen'd projection (decode + grid luma + 64-bit
  *     assembly per row inside the scan), emitting an 8-byte signature
  *     per image.
  *   - pair stage: banding over DISTINCT signatures with recall exactly 1
  *     for Hamming ≤ `maxHamming` (pigeonhole over `maxHamming+1` chunks),
  *     g² signature pairs — never n² image pairs — on degenerate corpora.
  *   - cluster stage: O(log n) alternating contraction over the
  *     pair-sized edge list.
  *
  * Undecodable images (aHash NULL: malformed, interlaced, > 2²⁰ px) take
  * no part in the near-dup stage — they can still drop as exact byte
  * duplicates, and otherwise pass through as `kept`. */
object MediaDedup {

  /** `(__id__, __sim__)` signature table of a media frame under any
    * 64-bit perceptual hash — the [[Dedup.simhashTable]] analogue for
    * media; NULL hashes (undecodable payloads) are excluded. */
  def signatureTable(
      media: DataFrame, payloadCol: String, idCol: String,
      sig: Column => Column): DataFrame =
    media.where(col(idCol).isNotNull)
      .select(col(idCol).as("__id__"), sig(col(payloadCol)).as("__sim__"))
      .where(col("__sim__").isNotNull)

  /** [[signatureTable]] under the codec-dispatching image aHash. */
  def aHashTable(media: DataFrame, payloadCol: String, idCol: String): DataFrame =
    signatureTable(media, payloadCol, idCol,
      graft.functions.MediaFunctions.imageAHash64)

  /** Perceptual near-duplicate image pairs `(doc_a, doc_b, hamming)` with
    * aHash Hamming distance ≤ `maxHamming` — recall exactly 1 over the
    * decodable images (pigeonhole banding, see [[Dedup.hammingPairs64]]). */
  def nearDuplicateImagePairs(
      media: DataFrame,
      payloadCol: String,
      idCol: String,
      maxHamming: Int = 3): DataFrame =
    Dedup.hammingPairs64(aHashTable(media, payloadCol, idCol), maxHamming)

  /** Perceptual near-duplicate AUDIO pairs under the energy-envelope hash
    * ([[graft.functions.PcmEnvelopeHash64]]) — same banding machinery and
    * recall-1 guarantee as the image pairs. */
  def nearDuplicateAudioPairs(
      media: DataFrame,
      payloadCol: String,
      idCol: String,
      maxHamming: Int = 3): DataFrame =
    Dedup.hammingPairs64(signatureTable(media, payloadCol, idCol,
      graft.functions.MediaFunctions.pcmEnvelopeHash64), maxHamming)

  /** Per-image dedup decisions under the full ladder — exact byte dedup
    * (keep lowest id per payload group), then aHash near-dup clustering
    * over the exact survivors (keep lowest id per connected component):
    * every input row with `(idCol, status, keeper)` where `status` is
    * `exact_dup` / `near_dup` / `kept` and `keeper` is the row it lost to
    * (itself when kept). Keepers are PER STAGE: an exact drop reports its
    * byte-group's kept id even if that id later drops as a near-dup —
    * provenance of the decision, not transitive closure (compose with
    * [[Dedup.duplicateClusters]] for lineage-complete grouping).
    *
    * Payload-locality contract (plan-pinned in MultimodalSpec with auto
    * broadcast DISABLED): image bytes never cross an exchange except the
    * exact stage's candidate re-verify, whose exchange is keyed ON the
    * payload itself and carries only the duplicate-candidate rows (the
    * hash-narrow two-phase). The two decision tables are
    * DUPLICATE-POPULATION-sized by construction —
    * `exactPairs` is the exact drop list, and the near-dup keeper map is
    * restricted to ids that appear in a Hamming pair (a singleton's
    * cluster is itself; absent rows default to `kept` in the status
    * CASE) — and both attach to the payload-carrying frame under
    * EXPLICIT `broadcast()` hints, so the payload side never shuffles
    * regardless of `autoBroadcastJoinThreshold` / AQE re-planning. On a
    * pathological crawl whose duplicate population alone exceeds driver
    * memory, either set [[Dedup.BroadcastDecisionsKey]] `= "false"` (the
    * hints vanish and the joins fail over to AQE/threshold-sized shuffle
    * joins instead of a driver-side collect OOM), or take the decisions
    * from the narrow stages directly
    * ([[Dedup.duplicateIdPairs]] / [[nearDuplicateImagePairs]], id-sized
    * shuffles) and attach payloads downstream of whatever reduction
    * follows. The LADDER, however, has ~8 consumers
    * of `media` (hash-narrow, candidate re-verify, survivors, aHash
    * table, cluster nodes, the report joins) — when `media` is itself an
    * expensive derivation (a WARC walk + [[graft.multimodal.Multimodal.extractWarcMedia]],
    * the q135 shape), pass a caller-owned `chain` to FREEZE the extracted
    * frame once and plan every consumer off the materialized rows instead
    * of 8 crawl re-extractions — the Pipeline/LM-pool freeze contract
    * (release with `chain.releaseAll()` after the result is sunk). Plain
    * parquet-backed media can stay unfrozen (column-pruned re-scans are
    * near-free, the checkpoint write is not). */
  def imageDedupReport(
      media: DataFrame,
      payloadCol: String,
      idCol: String,
      maxHamming: Int = 3,
      chain: Option[org.apache.spark.sql.graftbridge.DatasetBridge.FreezeChain] = None): DataFrame =
    dedupReport(media, payloadCol, idCol,
      graft.functions.MediaFunctions.imageAHash64, maxHamming, chain)

  /** Re-mux-class near-duplicate VIDEO pairs under the stsz sample-size
    * contour ([[graft.functions.VideoSampleHash64]]) — a CONTAINER
    * fingerprint: byte-different re-muxed/re-hosted copies of the same
    * encoded stream pair up; re-ENCODES do not (every sample size
    * changes) and dedup byte-exact only. Same banding machinery and
    * recall-1 guarantee as the image/audio pairs. */
  def nearDuplicateVideoPairs(
      media: DataFrame,
      payloadCol: String,
      idCol: String,
      maxHamming: Int = 3): DataFrame =
    Dedup.hammingPairs64(signatureTable(media, payloadCol, idCol,
      graft.functions.MediaFunctions.videoSampleHash64), maxHamming)

  /** The [[imageDedupReport]] ladder for VIDEO: exact byte dedup, then
    * sample-size-contour near-dup clustering (the re-mux class — see
    * [[nearDuplicateVideoPairs]] for what this honestly does and does
    * not catch) — same statuses, keepers, skew guards, and freeze
    * contract. */
  def videoDedupReport(
      media: DataFrame,
      payloadCol: String,
      idCol: String,
      maxHamming: Int = 3,
      chain: Option[org.apache.spark.sql.graftbridge.DatasetBridge.FreezeChain] = None): DataFrame =
    dedupReport(media, payloadCol, idCol,
      graft.functions.MediaFunctions.videoSampleHash64, maxHamming, chain)

  /** The [[imageDedupReport]] ladder for AUDIO: exact byte dedup, then
    * energy-envelope-hash near-dup clustering — same statuses, keepers,
    * skew guards, and freeze contract. */
  def audioDedupReport(
      media: DataFrame,
      payloadCol: String,
      idCol: String,
      maxHamming: Int = 3,
      chain: Option[org.apache.spark.sql.graftbridge.DatasetBridge.FreezeChain] = None): DataFrame =
    dedupReport(media, payloadCol, idCol,
      graft.functions.MediaFunctions.pcmEnvelopeHash64, maxHamming, chain)

  /** The generic ladder both modality reports delegate to: any 64-bit
    * perceptual signature slots into the same exact → pair → cluster →
    * report machinery. `sig` need not touch the payload —
    * [[MediaPipeline]]'s eval-once decode barrier passes `_ =>
    * col("__sig__")` over a frame whose signature column was materialized
    * in the same frozen projection as the quality signals, so the ladder
    * never re-decodes. */
  private[ops] def dedupReport(
      media: DataFrame,
      payloadCol: String,
      idCol: String,
      sig: Column => Column,
      maxHamming: Int,
      chain: Option[org.apache.spark.sql.graftbridge.DatasetBridge.FreezeChain]): DataFrame = {
    val m = chain.map(_.freeze(media)).getOrElse(media)
    val exactPairs = Dedup.duplicateIdPairs(m, col(payloadCol), idCol)
      .select(col("__id__").as("__eid__"), col("__keep__").as("__ekeep__"))
    val survivors = m
      .join(Dedup.hintBroadcast(exactPairs), col(idCol) === col("__eid__"), "left_anti")
    // near-dup clustering at SIGNATURE granularity (round 18): the
    // decision output needs (id → keeper), never the pair list, and
    // same-signature docs are Hamming-0 near-dups BY CONSTRUCTION — so
    // band/verify/cluster runs over DISTINCT signatures and docs map back
    // through their signature with linear joins. The previous shape
    // (hammingPairs64 → doc pairs → CC over doc nodes) materialized the
    // O(g_a·g_b) within/cross-signature doc expansion, which goes
    // quadratic exactly when a corpus's signatures quantize into dense
    // Hamming neighborhoods — tiny thumbnails/tracking pixels, a real
    // crawl staple (measured at x100 on the all-modality fixture: the
    // image ladder alone spent 400+ s on ~10⁹ doc pairs; signature-level
    // clustering retires the term). Pair-list SURFACES
    // ([[nearDuplicateImagePairs]] etc.) keep the doc expansion — there
    // the pairs ARE the requested output.
    //
    // The (id, signature) table and the banded signature pairs are each
    // consumed by SEVERAL jobs (CC freezes its edge table AND its node
    // universe in separate jobs before the report's own final plan), so
    // both are materialized ONCE here — on the caller's chain when given,
    // else an untracked freeze (ContextCleaner-reclaimed once the
    // returned plan is unreachable, the [[Pipeline]] convention). Without
    // this the signature decode + banding self-join re-ran ~5x across the
    // job boundaries (measured: q135 5.4 -> 13.8 s, q139 6.3 -> 11.4 s at
    // sf0.1 on a quiet box) — the narrow 16-byte rows cost nothing to
    // keep, the recomputes cost everything.
    def freezeNarrow(df: DataFrame): DataFrame = chain match {
      case Some(c) => c.freeze(df)
      case None =>
        org.apache.spark.sql.graftbridge.DatasetBridge.freezeStatsFree(df)
    }
    val st = freezeNarrow(signatureTable(survivors, payloadCol, idCol, sig)
      .where(col("__id__").isNotNull && col("__sim__").isNotNull))
    val sigGroups = st.groupBy(col("__sim__")).agg(count(lit(1)).as("__n__"))
    val sigPairs = freezeNarrow(
      Dedup.sigPairs64(sigGroups.select(col("__sim__")), maxHamming))
    // cluster only signatures that appear in a pair; multi-doc signatures
    // with no cross-signature edge are their own (Hamming-0) cluster. Both
    // tables are duplicate-population-sized, never corpus-sized.
    val pairedSigs = sigPairs.select(col("sim_a").as("__sim__"))
      .unionByName(sigPairs.select(col("sim_b").as("__sim__"))).distinct()
    val ccClusters = Dedup.connectedComponents(
      sigPairs, "sim_a", "sim_b", pairedSigs, "__sim__")
    val soloMultiDoc = sigGroups.where(col("__n__") >= 2)
      .join(pairedSigs.withColumnRenamed("__sim__", "__ps__"),
        col("__sim__") === col("__ps__"), "left_anti")
      .select(col("__sim__"), col("__sim__").as("cluster_id"))
    val sigCluster = ccClusters.select(col("__sim__"), col("cluster_id"))
      .unionByName(soloMultiDoc)
    // docs of clustered signatures, keyed by cluster → min-id keeper
    val docCluster = st.join(Dedup.hintBroadcast(sigCluster), Seq("__sim__"))
    val keepers = docCluster
      .withColumn("__nkeep__", min(col("__id__")).over(Window.partitionBy(col("cluster_id"))))
      .select(col("__id__").as("__nid__"), col("__nkeep__"))
    m
      .join(Dedup.hintBroadcast(exactPairs), col(idCol) === col("__eid__"), "left")
      .join(Dedup.hintBroadcast(keepers), col(idCol) === col("__nid__"), "left")
      .withColumn("status",
        when(col("__eid__").isNotNull, lit("exact_dup"))
          .when(col("__nkeep__").isNotNull && col("__nkeep__") =!= col(idCol),
            lit("near_dup"))
          .otherwise(lit("kept")))
      .withColumn("keeper",
        coalesce(col("__ekeep__"),
          when(col("__nkeep__") =!= col(idCol), col("__nkeep__")),
          col(idCol)))
      .drop("__eid__", "__ekeep__", "__nid__", "__nkeep__")
  }

  /** The deduplicated media set: [[imageDedupReport]]'s `kept` rows with
    * the original columns — "give me the clean corpus" form. */
  def dropDuplicateImages(
      media: DataFrame,
      payloadCol: String,
      idCol: String,
      maxHamming: Int = 3,
      chain: Option[org.apache.spark.sql.graftbridge.DatasetBridge.FreezeChain] = None): DataFrame =
    imageDedupReport(media, payloadCol, idCol, maxHamming, chain)
      .where(col("status") === "kept")
      .drop("status", "keeper")
}
