package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication for continuous-ingestion pipelines — the
  * Structured-Streaming counterpart of [[graft.ops.Dedup.dropExact]]
  * (keep-FIRST arrival of each distinct text, drop later copies).
  *
  * Scale design: the dedup state is keyed on a 128-bit hash of the text
  * (two seeded xxhash64 slots), NOT the text itself, so the state store
  * holds 16 bytes per distinct document instead of the corpus — the same
  * fixed-width-key principle as the batch hash-keyed `exactGroups`. Unlike
  * batch there is no second exact-verify pass available (the earlier copy's
  * text is gone), so a 128-bit collision drops a unique document; at 2⁻¹²⁸
  * that is far below any storage-layer error rate, and the tradeoff is what
  * makes unbounded-corpus streaming dedup feasible at all.
  *
  * Two state regimes:
  *   - with `tsCol` (recommended): `dropDuplicatesWithinWatermark` — state
  *     for a hash is dropped once the watermark passes its last-seen event
  *     time, so state is bounded by the distinct-doc rate × delay window.
  *   - without: `dropDuplicates` over the full stream history — exact
  *     forever, but state grows with the number of distinct documents;
  *     only for bounded corpora.
  */
object StreamingDedup {

  def dropDuplicateTexts(
      df: DataFrame,
      textCol: String,
      tsCol: Option[String] = None,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val keyed = df
      .withColumn("__h1__", xxhash64(col(textCol), lit(0)))
      .withColumn("__h2__", xxhash64(col(textCol), lit(1)))
    val deduped = tsCol match {
      case Some(t) =>
        keyed.withWatermark(t, watermarkDelay)
          .dropDuplicatesWithinWatermark("__h1__", "__h2__")
      case None =>
        keyed.dropDuplicates("__h1__", "__h2__")
    }
    deduped.drop("__h1__", "__h2__")
  }

  /** One micro-batch step of streaming MinHash NEAR-duplicate dedup:
    * given the accumulated `seen` band-key table, returns the batch rows
    * to admit and the updated band-key table.
    *
    * Semantics (keep-first, transitive): a document is dropped when any of
    * its LSH bands collides with a band of any earlier document — earlier
    * batch, or a lower-id document in the same batch. Bands of ALL arriving
    * documents (kept or dropped) are registered, so duplicate chains
    * a∼b∼c collapse to `a` exactly like the batch connected-components
    * clustering's keep-min rule. Banding is bit-identical to
    * [[graft.ops.Dedup.minhashDedup]] (same native MinHashMeta signature,
    * same band hash), so stream and batch admit the same documents for the
    * same arrival order.
    *
    * Scale shape: state is DISTINCT (band, hash) keys — 12 bytes per band
    * per distinct document, independent of text size — and each step is
    * two narrow joins (batch-bands ⋈ seen, batch-bands self-join); the
    * self-join is per-batch-sized, never corpus-sized.
    */
  def nearDupBatchStep(
      batch: DataFrame,
      seen: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 32,
      bandRows: Int = 8): (DataFrame, DataFrame) = {
    import graft.ops.Dedup
    // freeze the band table: it has four consumers (past-join, both
    // self-join sides, state update) and the shingling + signature pass is
    // the expensive part — without materialization it would recompute per
    // consumer and again per downstream checkpoint
    val bands = freeze(
      Dedup.bandTable(batch, textCol, idCol, shingleSize, numHashes, bandRows)
        .select("__id__", "band", "h"))
    val dupPast = bands.join(seen, Seq("band", "h"), "left_semi")
      .select(col("__id__")).distinct()
    val dupWithin = bands.as("a").join(bands.as("b"),
      col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
        col("a.__id__") < col("b.__id__"))
      .select(col("b.__id__").as("__id__")).distinct()
    val drops = dupPast.union(dupWithin).distinct()
    val kept = batch.join(drops.withColumnRenamed("__id__", idCol), Seq(idCol), "left_anti")
    val newSeen = seen.union(bands.select("band", "h")).distinct()
    (kept, newSeen)
  }

  /** foreachBatch wiring for [[nearDupBatchStep]]: maintains the seen-band
    * state across micro-batches (localCheckpoint + stats reset per step —
    * the state table is re-read every batch, so lineage must not grow) and
    * hands each batch's admitted rows to `sink`.
    *
    * foreachBatch is the right Structured-Streaming shape here: the
    * any-band-matches predicate needs one membership join plus a
    * register-all update per batch, which a single keyed stateful operator
    * cannot express (a document's admission depends on ALL its band groups
    * at once, and chaining a second stateful operator after
    * flatMapGroupsWithState is unsupported).
    */
  def nearDupForeachBatch(
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 32,
      bandRows: Int = 8,
      initialSeen: Option[DataFrame] = None)(
      sink: DataFrame => Unit): (DataFrame, Long) => Unit = {
    // seed state with a reference corpus's bands ([[referenceBands]]) for
    // streaming ingest admission: drop arrivals the corpus already has
    var seen: DataFrame = initialSeen.map(freeze).orNull
    var lastBatchId = -1L
    var lastKept: DataFrame = null
    (batch: DataFrame, batchId: Long) => {
      if (batchId == lastBatchId && lastKept != null) {
        // replayed micro-batch (failure after the state advanced): the
        // band state already includes this batch, so recomputing would
        // drop every document against its own bands — re-emit the
        // admitted set instead (standard foreachBatch redelivery contract)
        sink(lastKept)
      } else {
        val spark = batch.sparkSession
        val s =
          if (seen != null) seen
          else spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("band",
                org.apache.spark.sql.types.IntegerType),
              org.apache.spark.sql.types.StructField("h",
                org.apache.spark.sql.types.LongType))))
        val (kept, newSeen) = nearDupBatchStep(
          batch, s, textCol, idCol, shingleSize, numHashes, bandRows)
        val keptFrozen = freeze(kept)
        val seenFrozen = freeze(newSeen)
        // sink BEFORE advancing the state: a sink failure leaves `seen`
        // untouched, so the engine's retry recomputes the identical batch
        sink(keptFrozen)
        seen = seenFrozen
        lastBatchId = batchId
        lastKept = keptFrozen
      }
    }
  }

  /** The (band, h) key table of a static reference corpus — the seed state
    * for streaming ingest admission ([[nearDupForeachBatch]]'s
    * `initialSeen`): arrivals that near-duplicate ANY reference document
    * are dropped from batch one, exactly as if the reference had streamed
    * first. Banding parameters must match the stream's. One pass over the
    * reference (per-row native signatures, distinct band keys ≈ 12 bytes ×
    * bands × docs); the reference text itself is never retained. */
  def referenceBands(
      reference: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 32,
      bandRows: Int = 8): DataFrame =
    graft.ops.Dedup
      .bandTable(reference, textCol, idCol, shingleSize, numHashes, bandRows)
      .select("band", "h")
      .distinct()

  /** Materialize + truncate lineage AND Catalyst statistics (see
    * `DatasetBridge` — checkpointing alone carries size estimates that
    * compound across iterated state updates). */
  private def freeze(df: DataFrame): DataFrame =
    org.apache.spark.sql.graftbridge.DatasetBridge.fromInternalRdd(df.localCheckpoint())
}
