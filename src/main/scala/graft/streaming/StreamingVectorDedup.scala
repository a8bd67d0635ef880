package graft.streaming

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Similarity
import graft.ops.Similarity.{IvfModel, PqModel}

/** Streaming embedding near-duplicate admission — the vector counterpart
  * of [[StreamingDedup]]'s TTL text dedup: an arriving embedding is
  * DROPPED when its exact cosine to any earlier-seen vector reaches
  * `threshold`, keep-first, with TTL-bounded state.
  *
  * Composition (the batch IVF-PQ machinery as stream state):
  *   - the FITTED [[IvfModel]]/[[PqModel]] ride the closure exactly as in
  *     batch search — flat centroid/codebook matrices referenced by the
  *     native kernels, broadcast to every task, fit-once offline;
  *   - state rows are the [[Similarity.buildIvfPqIndex]] row (`cell`,
  *     `codes`) PLUS the unit vector and a TTL stamp: the codes make the
  *     candidate check an m-lookup ADC, the retained `vhat` makes the
  *     final check EXACT cosine — so unlike text MinHash admission there
  *     are no over-drops: approximation bounds only which candidates are
  *     CONSIDERED (cell probing + ADC margin), never the verdict;
  *   - an arrival probes its `nProbe` nearest cells (native
  *     [[graft.functions.CentroidTopN]]) and joins state on the cell key —
  *     the same shuffle-narrow probe shape as [[Similarity.searchIvfPq]].
  *
  * Recall caveat (inherent to any bucketed ANN admission, same contract
  * as the batch LSH/IVF paths): a true near-dup pair whose vectors fall
  * outside each other's probed cells, or whose ADC estimate lands below
  * `threshold − adcMargin`, is not considered and the duplicate is
  * admitted. Raise `nProbe`/`adcMargin` for recall, or verify offline
  * with the batch [[Similarity.dropNearDuplicateVectors]].
  *
  * Scale shape per batch: encode = one codegen pass over the batch;
  * the probe join shuffles (cell, codes, d doubles) per LIVE state row
  * and nProbe keys per arrival — candidate pairs are Σ(cell
  * populations), never |batch|×|state|; state is TTL-bounded
  * (O(arrival rate × window)), so per-batch cost is flat in stream age.
  *
  * Durability: state lives in this driver JVM. After a restart, reseed
  * with `initialSeen = vectorState(sinkTrailingWindow, …)` — the state
  * is a pure function of admitted vectors, so the rebuilt table equals
  * the lost one for every admitted row (the [[StreamingDedup]] restart
  * contract; vectors, unlike shingles, ARE retained by the sink).
  */
object StreamingVectorDedup {

  /** State schema: (__vid__ LONG, cell LONG, codes ARRAY<INT>,
    * vhat ARRAY<DOUBLE>, last_batch LONG). */
  def emptyVectorState(spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("__vid__", LongType),
        StructField("cell", LongType),
        StructField("codes", ArrayType(IntegerType)),
        StructField("vhat", ArrayType(DoubleType)),
        StructField("last_batch", LongType))))

  /** Encode a vector frame into state rows stamped `stampBatch` — the
    * seed path for ingest-against-reference admission and for restart
    * recovery from the sink's trailing window. Zero-norm/NULL vectors
    * produce no state row (they cannot near-duplicate anything under
    * cosine). Encoding is bit-identical to [[Similarity.buildIvfPqIndex]]
    * (cell from the raw vector, codes from the unit vector, residual
    * offsets honored). */
  def vectorState(
      df: DataFrame,
      ivf: IvfModel,
      pq: PqModel,
      idCol: String,
      vecCol: String,
      stampBatch: Long): DataFrame = {
    require(!pq.residual || pq.offsets.size == ivf.centroids.size,
      s"residual PqModel carries ${pq.offsets.size} cell offsets but the " +
        s"IvfModel has ${ivf.centroids.size} cells — models from different fits")
    // The id must survive the long cast losslessly: a non-numeric id would
    // cast to NULL __vid__, whose state row could never veto (NULL
    // comparisons are false) — duplicates of such rows would be silently
    // admitted forever. Fail at plan time instead of degrading.
    df.schema(idCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"vector-dedup idCol '$idCol' must be an integral type " +
          s"(byte/short/int/long), got $other — a lossy cast would produce " +
          "NULL state ids that can never veto duplicates")
    }
    val v = df.select(
      when(col(idCol).isNull,
        raise_error(lit(s"vector-dedup idCol '$idCol' is NULL — a NULL " +
          "state id can never veto duplicates")))
        .otherwise(col(idCol).cast("long")).as("__vid__"),
      col(vecCol).cast("array<double>").as("__v__"))
      .where(col("__v__").isNotNull)
      .withColumn("__n__", Similarity.norm(col("__v__")))
      .where(col("__n__") > 0.0)
    val vhat = transform(col("__v__"),
      x => graft.core.WeightedMoments.safeDiv(x, col("__n__")))
    val withCell = v
      .withColumn("vhat", vhat)
      .withColumn("cell",
        graft.functions.VectorFunctions
          .centroidArgmax(col("__v__"), ivf.centroids).cast("long"))
    val encoded =
      if (pq.residual)
        zip_with(col("vhat"),
          element_at(typedlit(pq.offsets), (col("cell") + 1).cast("int")),
          (a, b) => a - b)
      else col("vhat")
    withCell.select(col("__vid__"), col("cell"),
      graft.functions.VectorFunctions.pqEncode(encoded, pq.codebooks).as("codes"),
      col("vhat"), lit(stampBatch).as("last_batch"))
  }

  /** One micro-batch admission step. Returns (admitted rows, updated
    * state). Keep-first semantics: an arrival is dropped when some LIVE
    * state row, or a LOWER-id arrival in the same batch, has exact
    * cosine ≥ `threshold` AND was reachable through the cell probe + ADC
    * margin. ALL arrivals (kept or dropped) register their state row, so
    * duplicate chains collapse to their first member; a state row that
    * vetoed an arrival gets its TTL stamp refreshed (a sustained
    * duplicate keeps its original alive — the [[StreamingDedup]] TTL
    * convention).
    *
    * NOTE: like the text steps, each call leaves the new state cached;
    * for unbounded streams use [[vectorDedupForeachBatchTtl]], which
    * releases superseded generations. */
  def vectorDedupBatchStepTtl(
      batch: DataFrame,
      seen: DataFrame,
      batchId: Long,
      ttlBatches: Long,
      ivf: IvfModel,
      pq: PqModel,
      idCol: String,
      vecCol: String,
      threshold: Double,
      nProbe: Int = 4,
      adcMargin: Double = 0.2): (DataFrame, DataFrame) = {
    val (kept, newSeen, _) = vectorDedupBatchStepTtlTracked(
      batch, seen, batchId, ttlBatches, ivf, pq, idCol, vecCol,
      threshold, nProbe, adcMargin)
    (kept, newSeen)
  }

  private[streaming] def vectorDedupBatchStepTtlTracked(
      batch: DataFrame,
      seen: DataFrame,
      batchId: Long,
      ttlBatches: Long,
      ivf: IvfModel,
      pq: PqModel,
      idCol: String,
      vecCol: String,
      threshold: Double,
      nProbe: Int,
      adcMargin: Double): (DataFrame, DataFrame, RDD[_]) = {
    require(ttlBatches > 0, s"ttlBatches must be positive, got $ttlBatches")
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    // batch rows encoded ONCE (state row + probe cells) — frozen because
    // the probe join, the self-join, and the state update all read it
    val (enc, encRdd) = freeze(
      vectorState(batch, ivf, pq, idCol, vecCol, stampBatch = batchId)
        .withColumn("probe", graft.functions.VectorFunctions
          .centroidTopN(col("vhat"), ivf.centroids, nProbe)))
    val live = seen.where(col("last_batch") > lit(batchId - ttlBatches))
    // ADC prefilter: for a non-residual model the ADC score estimates
    // q·x̂ ≈ cosine, so candidates below threshold − adcMargin skip the
    // exact dot. A residual model's ADC estimates q·(x̂ − μ_cell) — NOT
    // cosine — so the prefilter is disabled there (exact-verify all
    // cell-probed candidates) rather than silently mis-filtering.
    def adcPass(qVhat: Column, cCodes: Column): Column =
      if (pq.residual) lit(true)
      else graft.functions.VectorFunctions
        .pqAdc(qVhat, cCodes, pq.codebooks) >= lit(threshold - adcMargin)
    // against earlier batches: arrival probes its nProbe cells
    val probed = enc.select(col("__vid__"), col("vhat"),
      explode(col("probe")).as("cell"))
    val dupPast = probed.as("q")
      .join(live.as("s"), col("q.cell") === col("s.cell"))
      .where(adcPass(col("q.vhat"), col("s.codes")))
      .where(Similarity.dot(col("q.vhat"), col("s.vhat")) >= lit(threshold))
      .select(col("q.__vid__").as("__vid__"), col("s.__vid__").as("__cause__"))
    // within the batch: lower id arrived first; its OWN cell row is the
    // state it would have registered, probed by the later arrival
    val dupWithin = probed.as("q")
      .join(enc.as("s"), col("q.cell") === col("s.cell") &&
        col("s.__vid__") < col("q.__vid__"))
      .where(adcPass(col("q.vhat"), col("s.codes")))
      .where(Similarity.dot(col("q.vhat"), col("s.vhat")) >= lit(threshold))
      .select(col("q.__vid__").as("__vid__"), lit(null).cast("long").as("__cause__"))
    val dups = dupPast.unionByName(dupWithin)
    val drops = dups.select("__vid__").distinct()
    val kept = batch.join(
      drops.withColumnRenamed("__vid__", idCol), Seq(idCol), "left_anti")
    // refresh-on-veto: state rows that caused a drop stay live
    val refreshed = dups.select(col("__cause__").as("__vid__"))
      .where(col("__vid__").isNotNull).distinct()
    val newSeen = live
      .join(refreshed.withColumnRenamed("__vid__", "__rid__"),
        col("__vid__") === col("__rid__"), "left")
      .select(col("__vid__"), col("cell"), col("codes"), col("vhat"),
        when(col("__rid__").isNotNull, lit(batchId))
          .otherwise(col("last_batch")).as("last_batch"))
      .unionByName(enc.select("__vid__", "cell", "codes", "vhat", "last_batch"))
    (kept, newSeen, encRdd)
  }

  /** foreachBatch wiring — generation/persist/replay/durability mechanics
    * identical to [[StreamingDedup.nearDupForeachBatchTtl]]:
    *
    * Durability: pass `stateDir` and every batch appends its stamped
    * state rows (new arrivals AND refresh-on-veto updates, full payload)
    * as a parquet delta (`delta=<batchId>/`, `_SUCCESS` = complete;
    * out-of-horizon deltas pruned; epoch-fenced against concurrent
    * writers). A restarted closure reconstructs the exact lost state by
    * max-merging the trailing window's deltas per `__vid__` — liveness
    * stamps included, so eviction continues on the original schedule —
    * with no sink rescan; the strict-below replay bound makes a
    * crash-orphaned own-batch delta harmless. Each delta is O(batch +
    * refreshed vids), never O(live window). Without `stateDir`, state
    * lives in this driver JVM and restart recovery is
    * `initialSeen = vectorState(sinkTrailingWindow, …)` (approximate:
    * sink rows carry admitted vectors only, and refresh stamps are
    * lost — the delta log is the exact path). */
  def vectorDedupForeachBatchTtl(
      ivf: IvfModel,
      pq: PqModel,
      idCol: String,
      vecCol: String,
      threshold: Double,
      ttlBatches: Long,
      nProbe: Int = 4,
      adcMargin: Double = 0.2,
      initialSeen: Option[DataFrame] = None,
      stateDir: Option[String] = None)(
      sink: DataFrame => Unit): (DataFrame, Long) => Unit = {
    require(ttlBatches > 0, s"ttlBatches must be positive, got $ttlBatches")
    var seen: DataFrame = null
    var seenRdd: RDD[_] = null
    initialSeen.foreach { s =>
      val expected = Map("__vid__" -> LongType, "cell" -> LongType,
        "codes" -> ArrayType(IntegerType), "vhat" -> ArrayType(DoubleType),
        "last_batch" -> LongType)
      val got = s.schema.fields.map(f => f.name -> f.dataType).toMap
      require(got == expected,
        "initialSeen must have the vectorState schema (__vid__ LONG, cell " +
          s"LONG, codes ARRAY<INT>, vhat ARRAY<DOUBLE>, last_batch LONG), got ${s.schema.simpleString}")
      val (df, rdd) = freeze(s.select("__vid__", "cell", "codes", "vhat", "last_batch"))
      seen = df; seenRdd = rdd
    }
    var recoveryDone = false
    var lastBatchId = -1L
    var lastKept: DataFrame = null
    var lastKeptRdd: RDD[_] = null
    val writerId = java.util.UUID.randomUUID().toString
    var fenceEpoch = -1L
    (batch: DataFrame, batchId: Long) => {
      if (!recoveryDone) {
        recoveryDone = true
        stateDir.foreach { d =>
          fenceEpoch = StreamingDedup.acquireTtlFence(batch.sparkSession, d, writerId)
          loadVectorTtlState(batch.sparkSession, d, batchId, ttlBatches).foreach { recovered =>
            if (seenRdd != null) seenRdd.unpersist(blocking = false)
            val (df, rdd) = freeze(recovered)
            seen = df; seenRdd = rdd
          }
        }
      }
      if (batchId == lastBatchId && lastKept != null) {
        sink(lastKept) // replayed micro-batch: re-emit (see StreamingDedup)
      } else {
        val s = if (seen != null) seen else emptyVectorState(batch.sparkSession)
        val (kept, newSeen, encRdd) = vectorDedupBatchStepTtlTracked(
          batch, s, batchId, ttlBatches, ivf, pq, idCol, vecCol,
          threshold, nProbe, adcMargin)
        val (keptFrozen, keptRdd) = freeze(kept)
        val (seenFrozen, newSeenRdd) = freeze(newSeen)
        encRdd.unpersist(blocking = false)
        // delta BEFORE sink (the StreamingDedup ordering argument): the
        // stamped slice of the new state = this batch's arrivals plus the
        // vids its drops refreshed, payload included
        try {
          stateDir.foreach { d =>
            StreamingDedup.checkTtlFence(batch.sparkSession, d, writerId, fenceEpoch)
            StreamingDedup.writeTtlDelta(d, batchId, ttlBatches,
              seenFrozen.where(col("last_batch") === lit(batchId)))
          }
          sink(keptFrozen)
        } catch {
          case t: Throwable =>
            keptRdd.unpersist(blocking = false)
            newSeenRdd.unpersist(blocking = false)
            throw t
        }
        if (seenRdd != null) seenRdd.unpersist(blocking = false)
        if (lastKeptRdd != null) lastKeptRdd.unpersist(blocking = false)
        seen = seenFrozen
        seenRdd = newSeenRdd
        lastBatchId = batchId
        lastKept = keptFrozen
        lastKeptRdd = keptRdd
      }
    }
  }

  /** Reconstruct the live vector state from the delta log (the
    * [[StreamingDedup.loadTtlState]] contract, keyed by `__vid__`): the
    * in-window row with the max stamp per vid carries the full payload
    * (payload is constant per vid — stamps alone change on refresh). */
  private def loadVectorTtlState(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      beforeBatchId: Long,
      ttlBatches: Long): Option[DataFrame] =
    StreamingDedup.loadTtlDeltasRaw(spark, dir, beforeBatchId, ttlBatches).map { raw =>
      raw.groupBy("__vid__")
        .agg(max(struct(col("last_batch"), col("cell"), col("codes"), col("vhat"))).as("__s__"))
        .select(col("__vid__"), col("__s__.cell").as("cell"),
          col("__s__.codes").as("codes"), col("__s__.vhat").as("vhat"),
          col("__s__.last_batch").as("last_batch"))
    }

  private def freeze(df: DataFrame): (DataFrame, RDD[_]) =
    org.apache.spark.sql.graftbridge.DatasetBridge.freezeTracked(df)
}
