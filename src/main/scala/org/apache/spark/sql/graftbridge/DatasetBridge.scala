package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.types.StructType

/** Re-wrap an already-materialized internal RDD as a fresh DataFrame with
  * NO inherited statistics.
  *
  * Why it exists: `Dataset.checkpoint`/`localCheckpoint` deliberately carry
  * the child plan's Catalyst statistics onto the new `LogicalRDD`
  * (`originStats`). For iterative self-join algorithms (connected
  * components' pointer jumping) that is catastrophic: every self-join
  * ESTIMATE multiplies `sizeInBytes × sizeInBytes`, the product is stored
  * as the checkpoint's origin stats, and the next round squares it again —
  * the BigInt doubles in bit-length per iteration, and by ~20 iterations
  * the DRIVER spends minutes inside `BigInteger.multiply` while planning
  * 5 000-row joins (observed: 124 s for one such join). Rebuilding the
  * Dataset from the checkpointed RDD through this bridge resets the stats
  * to the session default, making per-iteration planning cost constant.
  * (`Dataset.ofRows` and `LogicalRDD` are `private[sql]`, hence the
  * namespace.)
  */
object DatasetBridge {
  def fromInternalRdd(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[SparkSession]
    val schema: StructType = df.schema
    val rdd: RDD[InternalRow] = df.queryExecution.toRdd
    Dataset.ofRows(spark, LogicalRDD(DataTypeUtils.toAttributes(schema), rdd)(spark))
  }

  /** Materialize `df` and truncate BOTH lineage and statistics — the
    * freeze primitive for iterative self-join algorithms (see the class
    * scaladoc for why the stats reset is load-bearing).
    *
    * Fault-tolerance follows the session's checkpoint configuration: with
    * `sparkContext.setCheckpointDir` set (the production-cluster setup),
    * the materialization is a RELIABLE `checkpoint()` — blocks live in the
    * checkpoint dir's fault-tolerant storage and survive executor loss,
    * which `localCheckpoint()` blocks do not (losing one mid-iteration
    * kills the job: the truncated lineage leaves no recomputation path).
    * Without a checkpoint dir it falls back to `localCheckpoint()`, the
    * right single-JVM default (no serialization round-trip through a
    * directory). Both modes produce bit-identical results
    * (ConnectedComponentsSpec pins this on the worst-case path graph). */
  def freezeStatsFree(df: DataFrame): DataFrame = {
    val reliable = df.sparkSession.sparkContext.getCheckpointDir.isDefined
    fromInternalRdd(if (reliable) df.checkpoint() else df.localCheckpoint())
  }

  /** A freeze chain for iterative algorithms: freezes like
    * [[freezeStatsFree]] but remembers the storage behind each frozen
    * frame so the caller can [[FreezeChain.release]] a SUPERSEDED
    * generation — deleting its reliable-checkpoint files (or unpersisting
    * its localCheckpoint blocks) instead of accumulating O(rounds) copies
    * for the life of the application
    * (`spark.cleaner.referenceTracking.cleanCheckpoints` is off by
    * default, and even on, GC-driven cleanup is too lazy for a tight
    * contraction loop). Only release frames nothing will reference again:
    * checkpoint files back the frozen RDD lazily, so releasing a frame a
    * downstream plan still needs fails that plan at materialization time.
    * Frames never released (e.g. the final labels a caller returns) keep
    * their files until application exit — O(1) leftovers, not O(rounds).
    */
  final class FreezeChain {
    // guarded by its own monitor: pipeline compositions freeze INDEPENDENT
    // stages from concurrent driver threads (the §2.6 job-overlap shape —
    // MediaPipeline.curateMedia's per-modality ladders), and only the
    // tracking map is shared state — the checkpoint work itself is
    // ordinary thread-safe Spark job submission
    private val backing =
      new java.util.IdentityHashMap[DataFrame, RDD[InternalRow]]()

    /** [[freezeStatsFree]], with the checkpointed RDD tracked for
      * [[release]]. Freezing is EAGER (the checkpoint materializes before
      * this returns), so inputs of this freeze may be released as soon as
      * it returns. */
    def freeze(df: DataFrame): DataFrame = {
      val reliable = df.sparkSession.sparkContext.getCheckpointDir.isDefined
      val ck = if (reliable) df.checkpoint() else df.localCheckpoint()
      val out = fromInternalRdd(ck)
      ck.queryExecution.analyzed match {
        case lr: LogicalRDD => backing.synchronized(backing.put(out, lr.rdd)): Unit
        case _              => // unexpected plan shape: leave untracked
      }
      out
    }

    /** Release every frame this chain still tracks — the end-of-lifecycle
      * call for caller-owned chains (e.g. the [[graft.ops.Pipeline]]
      * freezes, whose frozen pool backs the returned lazy plan and so can
      * only be dropped by the CALLER, after the result is materialized to
      * its sink). Without it, a long-lived application invoking a pipeline
      * per ingest round accumulates one orphaned checkpoint dir per round
      * until exit. */
    def releaseAll(): Unit = {
      val frames = backing.synchronized(new java.util.ArrayList(backing.keySet()))
      frames.forEach(release(_))
    }

    /** Drop the storage behind a frame this chain froze: reliable
      * checkpoint files are deleted, localCheckpoint blocks unpersisted.
      * No-op for frames the chain does not know. */
    def release(df: DataFrame): Unit = {
      val rdd = backing.synchronized(backing.remove(df))
      if (rdd != null) {
        rdd.getCheckpointFile.foreach { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          try p.getFileSystem(rdd.sparkContext.hadoopConfiguration)
            .delete(p, true): Unit
          catch { case _: java.io.IOException => } // best-effort cleanup
        }
        if (rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)
          rdd.unpersist(blocking = false): Unit
      }
    }
  }

  /** Materialize `df` into an explicitly persisted internal RDD and re-wrap
    * it stats-free, returning the RDD handle so the holder of generational
    * state (streaming dedup's seen-band table) can `unpersist` the PREVIOUS
    * generation. `localCheckpoint` alone pins every generation in executor
    * storage with no handle to release it — an unbounded stream leaks
    * O(batches × state size). Rows are copied before persisting (the
    * internal iterator reuses mutable rows, same as localCheckpoint).
    *
    * `localCheckpoint()` before the materializing `count()` TRUNCATES the
    * RDD's lineage at materialization: without it, each generation's RDD
    * keeps dependencies (including its micro-batch source plan and any
    * shuffle) on all prior generations, so the driver-side RDD graph and
    * registered shuffle files grow O(batches) on an unbounded stream even
    * though the superseded generations' blocks are unpersisted. The
    * documented localCheckpoint tradeoff applies: losing an executor loses
    * the truncated partitions (no recomputation path) — acceptable for
    * derived dedup state, which the holder can rebuild from its sink (the
    * restart contract). */
  def freezeTracked(df: DataFrame): (DataFrame, RDD[InternalRow]) = {
    val spark = df.sparkSession.asInstanceOf[SparkSession]
    val schema: StructType = df.schema
    val rdd = df.queryExecution.toRdd.map(_.copy())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rdd.localCheckpoint() // keeps the persist level; truncates lineage at count()
    rdd.count() // materialize NOW so lineage (and its inputs) can be dropped
    (Dataset.ofRows(spark, LogicalRDD(DataTypeUtils.toAttributes(schema), rdd)(spark)), rdd)
  }
}
