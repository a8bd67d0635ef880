package graft.streaming

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

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

  /** Streaming URL dedup — the crawl-ingest twin of
    * [[graft.ops.Dedup.dropByUrl]]: keep the FIRST arrival per
    * [[graft.ops.Urls.normalizeUrl]] key (a stream has no keep-newest —
    * later captures of a seen URL are simply not re-admitted). Rows whose
    * URL does not normalize (no scheme / no host) pass through unchanged:
    * they are keyed by a per-row unique surrogate instead of sharing one
    * NULL bucket, so non-URL records are never deduped against each
    * other. Same state regimes as [[dropDuplicateTexts]] (watermark TTL
    * with `tsCol`, full history without); state per URL is the 128-bit
    * key hash, never the URL. */
  def dropDuplicateUrls(
      df: DataFrame,
      urlCol: String,
      tsCol: Option[String] = None,
      watermarkDelay: String = "1 hour"): DataFrame = {
    val withNorm = df.withColumn("__n__", graft.ops.Urls.normalizeUrl(col(urlCol)))
    // non-URL rows BYPASS the stateful branch entirely (a stateless filter
    // union) — no surrogate keys, no shared NULL bucket, no state cost
    val keyed = withNorm.where(col("__n__").isNotNull)
      .withColumn("__h1__", xxhash64(col("__n__"), lit(0)))
      .withColumn("__h2__", xxhash64(col("__n__"), lit(1)))
    val deduped = tsCol match {
      case Some(t) =>
        keyed.withWatermark(t, watermarkDelay)
          .dropDuplicatesWithinWatermark("__h1__", "__h2__")
      case None =>
        keyed.dropDuplicates("__h1__", "__h2__")
    }
    deduped.drop("__h1__", "__h2__", "__n__")
      .unionByName(withNorm.where(col("__n__").isNull).drop("__n__"))
  }

  /** One micro-batch step of streaming MinHash NEAR-duplicate dedup:
    * given the accumulated `seen` band-key table, returns the batch rows
    * to admit and the updated band-key table.
    *
    * Semantics (keep-first, transitive, CANDIDATE-level): a document is
    * dropped when any of its LSH bands collides with a band of any earlier
    * document — earlier batch, or a lower-id document in the same batch.
    * Bands of ALL arriving documents (kept or dropped) are registered, so
    * duplicate chains a∼b∼c collapse to `a`. Banding is bit-identical to
    * [[graft.ops.Dedup.minhashDedup]]'s, so the stream drops exactly the
    * batch path's banding CANDIDATES for the same arrival order — but,
    * unlike batch, there is NO exact-Jaccard verify: earlier documents'
    * shingles are gone (the state keeps 12-byte band keys precisely so it
    * does not retain the corpus). A band collision therefore over-drops
    * with probability ≈ b·J^r per pair (bandRows=8, numHashes=32: a
    * J=0.6 pair collides with p ≈ 4·0.6⁸ ≈ 6.6%) — the inherent
    * text-free-state tradeoff; raise `bandRows` for sharper precision at
    * lower near-dup recall.
    *
    * Scale shape: state is DISTINCT (band, hash) keys — 12 bytes per band
    * per distinct document, independent of text size — and each step is
    * two narrow joins (batch-bands ⋈ seen, batch-bands self-join); the
    * self-join is per-batch-sized, never corpus-sized.
    *
    * NOTE: each call persists the batch's band table and leaves it cached
    * (the returned frames reference it lazily). For unbounded streams use
    * [[nearDupForeachBatch]], which releases each generation once the
    * next state is materialized. */
  def nearDupBatchStep(
      batch: DataFrame,
      seen: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 32,
      bandRows: Int = 8): (DataFrame, DataFrame) = {
    val (kept, newSeen, _) = nearDupBatchStepTracked(
      batch, seen, textCol, idCol, shingleSize, numHashes, bandRows)
    (kept, newSeen)
  }

  private[streaming] def nearDupBatchStepTracked(
      batch: DataFrame,
      seen: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int,
      numHashes: Int,
      bandRows: Int): (DataFrame, DataFrame, RDD[_]) = {
    import graft.ops.Dedup
    // freeze the band table: it has four consumers (past-join, both
    // self-join sides, state update) and the shingling + signature pass is
    // the expensive part — without materialization it would recompute per
    // consumer and again per downstream checkpoint
    val (bands, bandsRdd) = freeze(
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
    (kept, newSeen, bandsRdd)
  }

  /** foreachBatch wiring for [[nearDupBatchStep]]: maintains the seen-band
    * state across micro-batches (each generation persisted + stats-reset,
    * the PREVIOUS generation unpersisted once the new one is materialized
    * — state storage stays O(current state), not O(batches × state)) and
    * hands each batch's admitted rows to `sink`.
    *
    * Durability contract: the state lives in THIS driver JVM. The
    * batchId-replay guard covers a same-JVM sink retry; it does NOT
    * survive a query restart from checkpoint (a new closure starts with
    * `initialSeen` only). For restart resilience, rebuild the state from
    * what was durably admitted: pass
    * `initialSeen = Some(referenceBands(sinkTable, …))` over the sink's
    * accumulated output — band keys are a pure function of admitted text,
    * so the rebuilt state equals the lost one for every admitted doc.
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
    var seen: DataFrame = null
    var seenRdd: RDD[_] = null
    initialSeen.foreach { s =>
      val (df, rdd) = freeze(s); seen = df; seenRdd = rdd
    }
    var lastBatchId = -1L
    var lastKept: DataFrame = null
    var lastKeptRdd: RDD[_] = null
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
        val (kept, newSeen, bandsRdd) = nearDupBatchStepTracked(
          batch, s, textCol, idCol, shingleSize, numHashes, bandRows)
        val (keptFrozen, keptRdd) = freeze(kept)
        val (seenFrozen, newSeenRdd) = freeze(newSeen)
        // the new generations are materialized — the batch band table and
        // the superseded generations can go (non-blocking)
        bandsRdd.unpersist(blocking = false)
        // sink BEFORE advancing the state: a sink failure leaves `seen`
        // untouched, so the engine's retry recomputes the identical batch.
        // On failure, release the just-built generations too — each retry
        // would otherwise persist fresh copies and leave the abandoned ones
        // to GC/ContextCleaner timing instead of deterministic release.
        try sink(keptFrozen)
        catch {
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

  /** One micro-batch step of BOUNDED-STATE streaming near-dup dedup: the
    * TTL sibling of [[nearDupBatchStep]] for unbounded streams. The state
    * table carries `last_batch` per band key; keys not sighted within
    * `ttlBatches` micro-batches are EVICTED before matching, so state is
    * O(bands of docs sighted in the trailing window) — never O(corpus).
    * Every sighting refreshes `last_batch` (kept or dropped arrival
    * alike), so a sustained duplicate keeps its bands alive indefinitely
    * while a document whose duplicates stopped arriving ages out and a
    * later copy is admitted again — the dedup horizon is explicit, the
    * standard production tradeoff for infinite ingest.
    *
    * `seen` schema: (band INT, h LONG, last_batch LONG); start from
    * [[emptyTtlState]]. Returns (admitted rows, updated state).
    *
    * NOTE: like [[nearDupBatchStep]], each call persists the batch's band
    * table and leaves it cached (the returned frames reference it
    * lazily). For unbounded streams use [[nearDupForeachBatchTtl]], which
    * releases each generation once the next state is materialized. */
  def nearDupBatchStepTtl(
      batch: DataFrame,
      seen: DataFrame,
      batchId: Long,
      ttlBatches: Long,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 32,
      bandRows: Int = 8): (DataFrame, DataFrame) = {
    val (kept, newSeen, _, _) = nearDupBatchStepTtlTracked(
      batch, seen, batchId, ttlBatches, textCol, idCol,
      shingleSize, numHashes, bandRows)
    (kept, newSeen)
  }

  /** Tracked variant: additionally returns the batch's (frozen) band
    * table — the durable-state DELTA — and its RDD handle for release. */
  private[streaming] def nearDupBatchStepTtlTracked(
      batch: DataFrame,
      seen: DataFrame,
      batchId: Long,
      ttlBatches: Long,
      textCol: String,
      idCol: String,
      shingleSize: Int,
      numHashes: Int,
      bandRows: Int): (DataFrame, DataFrame, DataFrame, RDD[_]) = {
    require(ttlBatches > 0, s"ttlBatches must be positive, got $ttlBatches")
    import graft.ops.Dedup
    val (bands, bandsRdd) = freeze(
      Dedup.bandTable(batch, textCol, idCol, shingleSize, numHashes, bandRows)
        .select("__id__", "band", "h"))
    // evict BEFORE matching: an expired band must not veto a new arrival
    val live = seen.where(col("last_batch") > lit(batchId - ttlBatches))
    val dupPast = bands.join(live, Seq("band", "h"), "left_semi")
      .select(col("__id__")).distinct()
    val dupWithin = bands.as("a").join(bands.as("b"),
      col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
        col("a.__id__") < col("b.__id__"))
      .select(col("b.__id__").as("__id__")).distinct()
    val drops = dupPast.union(dupWithin).distinct()
    val kept = batch.join(drops.withColumnRenamed("__id__", idCol), Seq(idCol), "left_anti")
    // refresh-on-sighting: max(last_batch) keeps hot keys alive; evicted
    // keys are already gone from `live`, so state size is window-bounded
    val newSeen = live
      .unionByName(bands.select(col("band"), col("h"), lit(batchId).as("last_batch")))
      .groupBy("band", "h").agg(max(col("last_batch")).as("last_batch"))
    (kept, newSeen, bands, bandsRdd)
  }

  /** Empty (band, h, last_batch) state frame for [[nearDupBatchStepTtl]]. */
  def emptyTtlState(spark: org.apache.spark.sql.SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("band",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("h",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("last_batch",
          org.apache.spark.sql.types.LongType))))

  /** foreachBatch wiring for [[nearDupBatchStepTtl]] — the bounded-state
    * twin of [[nearDupForeachBatch]], same generation/persist/replay
    * mechanics.
    *
    * Durability: pass `stateDir` and every batch appends its SIGHTINGS
    * as a parquet delta (`delta=<batchId>/`, `_SUCCESS` = complete;
    * deltas outside the TTL horizon pruned). A restarted closure
    * reconstructs the exact lost state by max-merging the trailing
    * window's deltas — liveness stamps included, so eviction continues
    * on the original schedule — with NO sink rescan, and the per-batch
    * write is O(batch bands), never O(live window). Without `stateDir`,
    * state lives in this driver JVM only and
    * restart recovery needs `initialSeen` with the TTL schema
    * (band, h, last_batch) — e.g.
    * `referenceBands(sinkTrailingWindow, …).withColumn("last_batch",
    * lit(resumeBatchId))` over the sink's last `ttlBatches` of admitted
    * output. When both are given, a recoverable `stateDir` generation
    * wins (it is exact; `initialSeen` is a reconstruction).
    *
    * Multi-writer fencing: each closure stamps an epoch fence
    * (`_fence` file) into `stateDir` at its first batch and re-verifies
    * it before every delta write. Newest writer wins — a fresh closure
    * on the same dir (the restart path) takes over by bumping the
    * epoch, and a still-live predecessor then FAILS FAST at its next
    * delta write instead of silently interleaving deltas (see
    * [[acquireTtlFence]] for why takeover, not mutual exclusion, is the
    * only semantics compatible with crash recovery). */
  def nearDupForeachBatchTtl(
      textCol: String,
      idCol: String,
      ttlBatches: Long,
      shingleSize: Int = 3,
      numHashes: Int = 32,
      bandRows: Int = 8,
      initialSeen: Option[DataFrame] = None,
      stateDir: Option[String] = None)(
      sink: DataFrame => Unit): (DataFrame, Long) => Unit = {
    require(ttlBatches > 0, s"ttlBatches must be positive, got $ttlBatches")
    var seen: DataFrame = null
    var seenRdd: RDD[_] = null
    initialSeen.foreach { s =>
      // order-insensitive name→type check, then select into canonical
      // order: (last_batch, h, band) is a fine state frame and must not
      // be rejected, while (band STRING, …) must fail HERE, not later
      // inside the first batch's join.
      val expected = Map("band" -> IntegerType, "h" -> LongType,
        "last_batch" -> LongType)
      val got = s.schema.fields.map(f => f.name -> f.dataType).toMap
      require(got == expected,
        s"initialSeen must have TTL schema (band INT, h LONG, last_batch " +
          s"LONG) in any column order, got ${s.schema.simpleString}")
      val (df, rdd) = freeze(s.select("band", "h", "last_batch"))
      seen = df; seenRdd = rdd
    }
    var recoveryDone = false
    var lastBatchId = -1L
    var lastKept: DataFrame = null
    var lastKeptRdd: RDD[_] = null
    val writerId = java.util.UUID.randomUUID().toString
    var fenceEpoch = -1L
    (batch: DataFrame, batchId: Long) => {
      // Durable recovery, once, on the first batch this closure sees:
      // replay the trailing-window DELTA LOG strictly below batchId —
      // exactly the state batch `batchId` must be admitted against. After
      // a graceful restart that spans the previous batches' deltas, and
      // after a crash that wrote delta=batchId but never committed the
      // checkpoint, the replayed batch correctly skips its own
      // half-written delta. Recovered state wins over initialSeen (it is
      // the exact lost state; initialSeen is a sink-rescan
      // reconstruction).
      if (!recoveryDone) {
        recoveryDone = true
        stateDir.foreach { d =>
          // take the writer fence FIRST: any still-live predecessor is
          // fenced out at its next delta write (see acquireTtlFence)
          fenceEpoch = acquireTtlFence(batch.sparkSession, d, writerId)
          loadTtlState(batch.sparkSession, d, batchId, ttlBatches).foreach { recovered =>
            if (seenRdd != null) seenRdd.unpersist(blocking = false)
            val (df, rdd) = freeze(recovered.select("band", "h", "last_batch"))
            seen = df; seenRdd = rdd
          }
        }
      }
      if (batchId == lastBatchId && lastKept != null) {
        sink(lastKept) // replayed micro-batch: re-emit (see nearDupForeachBatch)
      } else {
        val s = if (seen != null) seen else emptyTtlState(batch.sparkSession)
        val (kept, newSeen, bands, bandsRdd) = nearDupBatchStepTtlTracked(
          batch, s, batchId, ttlBatches, textCol, idCol,
          shingleSize, numHashes, bandRows)
        val (keptFrozen, keptRdd) = freeze(kept)
        val (seenFrozen, newSeenRdd) = freeze(newSeen)
        // persist THIS BATCH's sightings BEFORE the sink: recovery's
        // strict-below bound already makes an orphaned own-batch delta
        // harmless (a replay skips it), while the reverse order would
        // turn a transient state-write failure AFTER a successful sink
        // into a duplicate emission on retry — the failure mode this
        // operator exists to prevent. A failure in either step leaves
        // `seen` (and the complete deltas the next recovery would read)
        // untouched, so the engine's retry recomputes the identical
        // batch. The delta is O(batch bands), NOT O(live window) — the
        // property that keeps durable state writable at any window size.
        try {
          stateDir.foreach { d =>
            checkTtlFence(batch.sparkSession, d, writerId, fenceEpoch)
            writeTtlDelta(d, batchId, ttlBatches,
              bands.select(col("band"), col("h")).distinct()
                .withColumn("last_batch", lit(batchId)))
          }
          sink(keptFrozen)
        } catch {
          case t: Throwable =>
            keptRdd.unpersist(blocking = false)
            newSeenRdd.unpersist(blocking = false)
            bandsRdd.unpersist(blocking = false)
            throw t
        }
        bandsRdd.unpersist(blocking = false)
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

  private def ttlDeltaPath(dir: String, id: Long): String = s"$dir/delta=$id"

  private def fencePath(dir: String) =
    new org.apache.hadoop.fs.Path(dir, "_fence")

  private def stateFs(spark: org.apache.spark.sql.SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())

  private def readTtlFence(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Option[(Long, String)] = {
    val p = fencePath(dir)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val txt = new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
        txt.split("\\s+", 2) match {
          case Array(e, id) => e.toLongOption.map(_ -> id)
          case _ => None
        }
      } finally in.close()
    }
  }

  /** Take the writer fence for a durable TTL state dir: bump the fence
    * epoch and stamp this writer's id. Newest-writer-wins BY DESIGN — a
    * crashed predecessor can never release a lock, so restart recovery
    * requires that a successor always be able to take over; the
    * predecessor, if it is in fact still alive, is fenced out at its next
    * delta write by [[checkTtlFence]]. This is epoch fencing in the
    * HDFS-lease-recovery / ZooKeeper mold, not a mutual-exclusion lock:
    * it cannot serialize two writers racing the same instant (plain
    * filesystems have no atomic compare-and-swap), but it guarantees the
    * conflict is DETECTED — at most one writer survives its next write —
    * so two drivers pointed at one stateDir fail fast instead of
    * silently interleaving deltas. */
  private[streaming] def acquireTtlFence(
      spark: org.apache.spark.sql.SparkSession,
      dir: String, writerId: String): Long = {
    val fs = stateFs(spark, dir)
    val root = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(root)) fs.mkdirs(root)
    val epoch = readTtlFence(fs, dir).map(_._1).getOrElse(0L) + 1L
    val out = fs.create(fencePath(dir), true)
    try out.write(s"$epoch $writerId".getBytes("UTF-8")) finally out.close()
    epoch
  }

  /** Fail fast if this writer no longer holds the fence for `dir` (a
    * newer writer ran [[acquireTtlFence]] since). Called before every
    * delta write; throwing here aborts the batch BEFORE the sink emits,
    * so a fenced-out driver stops cleanly with no half-emitted batch. */
  private[streaming] def checkTtlFence(
      spark: org.apache.spark.sql.SparkSession,
      dir: String, writerId: String, epoch: Long): Unit = {
    val fs = stateFs(spark, dir)
    readTtlFence(fs, dir) match {
      case Some((e, id)) if e == epoch && id == writerId => ()
      case other => throw new IllegalStateException(
        s"TTL state dir $dir fenced: this writer holds epoch $epoch " +
          s"($writerId) but the fence is now $other — another driver took " +
          "over this stateDir; refusing to write a delta")
    }
  }

  /** Persist one durable TTL DELTA — this batch's (band, h, last_batch)
    * sightings only, parquet + explicit `_SUCCESS` (the recovery contract
    * keys on the marker; committer config like marksuccessfuljobs=false
    * must not silently void recovery) — then prune deltas the TTL horizon
    * can never need again (id ≤ batchId − ttlBatches: every future
    * recovery at batch B' > batchId reads only ids > B' − ttlBatches).
    * Storage and per-batch write are O(window deltas) and O(batch bands)
    * respectively — never O(live state), so durability stays writable at
    * any window size. Prune failures only warn: the delta is durable. */
  private[streaming] def writeTtlDelta(
      dir: String, batchId: Long, ttlBatches: Long, delta: DataFrame): Unit = {
    delta.write.mode("overwrite").parquet(ttlDeltaPath(dir, batchId))
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(delta.sparkSession.sessionState.newHadoopConf())
    val marker = new org.apache.hadoop.fs.Path(ttlDeltaPath(dir, batchId), "_SUCCESS")
    if (!fs.exists(marker)) fs.create(marker, true).close()
    try {
      listTtlDeltas(fs, p).filter(_ <= batchId - ttlBatches).foreach { old =>
        fs.delete(new org.apache.hadoop.fs.Path(ttlDeltaPath(dir, old)), true)
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[ttl-state] WARNING: prune failed in $dir: ${e.getMessage}")
    }
  }

  /** Reconstruct the live state a batch must be admitted against from the
    * delta log: COMPLETE deltas with id strictly below `beforeBatchId`
    * and inside its trailing TTL window, max-merged per band key. A band
    * whose last sighting fell out of the window has no delta in range —
    * exactly the eviction rule — and max(last_batch) over in-window
    * deltas equals the lost state's stamp, so recovery is bit-identical.
    * The strict-below bound makes a crash-orphaned own-batch delta
    * harmless (the replayed batch skips it). */
  private[streaming] def loadTtlState(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      beforeBatchId: Long,
      ttlBatches: Long): Option[DataFrame] =
    loadTtlDeltasRaw(spark, dir, beforeBatchId, ttlBatches)
      .map(_.groupBy("band", "h").agg(max(col("last_batch")).as("last_batch")))

  /** The UNMERGED union of the complete in-window deltas strictly below
    * `beforeBatchId` — the schema-agnostic half of [[loadTtlState]], so
    * state tables with other key/payload shapes (e.g.
    * [[StreamingVectorDedup]]'s) can reuse the same delta-log contract
    * and apply their own max-merge. */
  private[streaming] def loadTtlDeltasRaw(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      beforeBatchId: Long,
      ttlBatches: Long): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return None
    val ids = listTtlDeltas(fs, p)
      .filter(id => id < beforeBatchId && id > beforeBatchId - 1 - ttlBatches &&
        fs.exists(new org.apache.hadoop.fs.Path(ttlDeltaPath(dir, id), "_SUCCESS")))
    if (ids.isEmpty) None
    else Some(ids.map(id => spark.read.parquet(ttlDeltaPath(dir, id)))
      .reduce(_.unionByName(_)))
  }

  private def listTtlDeltas(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Seq[Long] =
    fs.listStatus(p).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("delta=") => n.drop(6) }
      .flatMap(_.toLongOption)

  /** The (band, h) key table of a static reference corpus — the seed state
    * for streaming ingest admission ([[nearDupForeachBatch]]'s
    * `initialSeen`): arrivals that near-duplicate ANY reference document
    * are dropped from batch one, exactly as if the reference had streamed
    * first. Banding parameters must match the stream's. One pass over the
    * reference (per-row native signatures, distinct band keys ≈ 12 bytes ×
    * bands × docs); the reference text itself is never retained. Also the
    * restart-recovery path: run it over the sink's admitted output to
    * reconstruct the in-memory state after a driver restart. */
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

  /** Materialize + truncate lineage AND Catalyst statistics, returning the
    * persisted RDD handle so the previous state generation can be released
    * (see `DatasetBridge.freezeTracked`). */
  private def freeze(df: DataFrame): (DataFrame, RDD[_]) =
    org.apache.spark.sql.graftbridge.DatasetBridge.freezeTracked(df)
}
