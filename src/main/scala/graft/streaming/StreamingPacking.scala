package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One packed document emitted by [[StreamingPacking.packStream]]. */
case class PackedDoc(doc_id: Long, n_tokens: Long, stream: Long, pack: Long, pack_id: Long)

/** Streaming sequence packing — the continuous-ingestion counterpart of
  * [[graft.ops.Packing.packSequences]]: as documents arrive they are
  * appended to their stream's token tape (`stream = doc_id % nStreams`) and
  * assigned the pack their starting offset falls in.
  *
  * Divergence from batch, by necessity: the batch operator lays documents
  * out in GLOBAL id order; a stream cannot see future ids, so the tape
  * order here is ARRIVAL order (id-sorted within each micro-batch for
  * determinism). A batch job over the same corpus delivered in id order
  * produces identical assignments.
  *
  * Scale shape: `flatMapGroupsWithState` keyed by stream with O(1) state —
  * one Long (the stream's running token offset) per stream, regardless of
  * how many documents have flowed through. Parallelism = `nStreams`, the
  * same knob as batch.
  */
object StreamingPacking {

  def packStream(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      capacity: Long,
      nStreams: Int = 64): Dataset[PackedDoc] = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    require(nStreams > 0, s"nStreams must be positive, got $nStreams")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"), col(tokenCol).cast("long").as("n_tokens"))
      .where(col("n_tokens").isNotNull && col("n_tokens") > 0)
      .withColumn("stream", pmod(col("doc_id"), lit(nStreams.toLong)))
      .as[(Long, Long, Long)]
      .groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (stream: Long, rows: Iterator[(Long, Long, Long)], state: GroupState[Long]) =>
          var off = state.getOption.getOrElse(0L)
          // id-sort WITHIN the micro-batch for a deterministic tape; the
          // buffer is one stream's slice of one batch, never the history
          val out = rows.toSeq.sortBy(_._1).map { case (id, nt, _) =>
            val pack = off / capacity
            off += nt
            PackedDoc(id, nt, stream, pack, stream * (1L << 32) + pack)
          }
          state.update(off)
          out.iterator
      }
  }
}
