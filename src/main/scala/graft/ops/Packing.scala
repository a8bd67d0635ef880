package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: shard a document corpus into
  * fixed-token-budget packs (the files/batches a trainer consumes), without
  * collecting anything and without a global sort.
  *
  * Contract — "streaming concatenation chunking": documents are laid out in
  * a deterministic order inside `nStreams` independent streams (stream =
  * `id % nStreams`, ordered by id), and pack `k` of a stream holds the
  * documents whose preceding-token offset falls in `[k·capacity,
  * (k+1)·capacity)`. Equivalently: concatenate the stream's token counts
  * and cut at capacity boundaries — a document crossing a boundary stays in
  * the pack it started in (packs may overrun by at most one document; a
  * trainer that can't truncate should size `capacity` with that headroom).
  * This is exactly the deterministic chunking a token-stream sharder does,
  * and (unlike first-fit bin packing, which is inherently sequential) it is
  * embarrassingly parallel: each stream is one window partition, so
  * parallelism = `nStreams` regardless of corpus size — set it to a few ×
  * the cluster's cores. All arithmetic is integer and hash-free, so the
  * assignment is reproducible across partitionings and cluster sizes.
  */
object Packing {

  /** Assign every document to (stream, pack). `tokenExpr` is the per-row
    * token count (e.g. `TextAnalysis.bpeTokenCount(col("text"))`); rows
    * with a null or non-positive count are dropped (they cannot occupy pack
    * space). Output: input columns + `n_tokens`, `stream`, `pack`,
    * `pack_id` (= globally unique `stream * 2³² + pack`). */
  def packSequences(
      df: DataFrame,
      idCol: String,
      tokenExpr: Column,
      capacity: Long,
      nStreams: Int = 64): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    require(nStreams > 0, s"nStreams must be positive, got $nStreams")
    val w = Window.partitionBy(col("stream")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", tokenExpr.cast("long"))
      .where(col("n_tokens").isNotNull && col("n_tokens") > 0)
      .withColumn("stream", pmod(col(idCol), lit(nStreams.toLong)).cast("long"))
      // pure long division (`div`), not floor(double /): the exclusive
      // offset is a nonnegative long, and keeping every numeric path in
      // integer arithmetic makes the assignment bit-identical to any other
      // engine's integer `//` at all magnitudes (doubles lose exactness
      // past 2^53, which a 100 TB corpus's token offsets can reach)
      .withColumn("__off__", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("pack", expr(s"__off__ div CAST($capacity AS BIGINT)"))
      .drop("__off__")
      .withColumn("pack_id", col("stream") * lit(1L << 32) + col("pack"))
  }

  /** Training-ready packed token STREAMS: [[packSequences]]'s stream/pack
    * assignment over EXACT BPE counts, with the per-pack token ids
    * concatenated in document order — the artifact a trainer actually
    * loads, not just the assignment bookkeeping.
    *
    * Output: `(pack_id, stream, pack, n_docs, n_tokens, token_ids
    * array<int>)`; `n_tokens == size(token_ids)` by construction. Docs
    * stay whole (the [[packSequences]] contract — no cross-pack splits);
    * concatenation order within a pack is ascending `idCol`, the same
    * order the offset window assigned them by.
    *
    * Scale shape: each document is encoded ONCE ([[graft.functions
    * .BpeEncode]], a per-row codegen'd kernel); the id arrays (≈4 B/token)
    * ride the same stream-keyed window exchange the assignment already
    * needs, then one pack-keyed aggregation assembles each pack — the
    * bytes that move are the bytes a pack file must contain anyway. The
    * per-group `array_sort(collect_list(struct(...)))` is bounded by
    * `capacity` tokens per pack, not by the corpus. */
  def packTokenStreams(
      df: DataFrame,
      idCol: String,
      textCol: String,
      vocab: graft.functions.BpeVocab,
      capacity: Long,
      nStreams: Int = 64): DataFrame = {
    val withIds = df.withColumn("__ids__",
      graft.functions.BpeFunctions.bpeEncode(col(textCol), vocab))
    packSequences(withIds, idCol, size(col("__ids__")).cast("long"),
      capacity, nStreams)
      .groupBy("pack_id", "stream", "pack")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        flatten(transform(
          array_sort(collect_list(struct(col(idCol), col("__ids__")))),
          s => s.getField("__ids__"))).as("token_ids"))
  }

  /** Per-pack summary: document count, token total, fill ratio vs
    * `capacity`. The overrun contract means `fill` can exceed 1 by at most
    * `(max doc tokens − 1) / capacity`. */
  def packSummary(packed: DataFrame, capacity: Long): DataFrame =
    packed.groupBy(col("stream"), col("pack"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("tokens"),
        (sum(col("n_tokens")) / lit(capacity.toDouble)).as("fill"))
      .orderBy(col("stream"), col("pack"))

  /** Split each document into fixed-size token windows with overlap — the
    * context-window chunking step of a training/RAG pipeline (packing
    * concatenates ACROSS documents; chunking splits WITHIN them).
    *
    * Chunk `i` covers token offsets `[i·stride, min(i·stride + chunkSize,
    * n_tokens))` with `stride = chunkSize − overlap`; the number of chunks
    * is the smallest `c ≥ 1` with `(c−1)·stride + chunkSize ≥ n_tokens`,
    * i.e. `1 + ceil(max(0, n − chunkSize) / stride)` — every token is
    * covered and no chunk starts at or past the end. Rows with null or
    * non-positive token counts are dropped.
    *
    * Pure per-row integer arithmetic + one `explode` (row amplification =
    * #chunks, no shuffle, no state across documents) — embarrassingly
    * parallel at any corpus size. Output: `idCol`, `n_tokens`,
    * `chunk_idx`, `tok_start`, `tok_end`.
    */
  def chunkDocuments(
      df: DataFrame,
      idCol: String,
      tokenExpr: Column,
      chunkSize: Long,
      overlap: Long = 0L): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize), got $overlap for chunkSize $chunkSize")
    val stride = chunkSize - overlap
    df.withColumn("n_tokens", tokenExpr.cast("long"))
      .where(col("n_tokens").isNotNull && col("n_tokens") > 0)
      .withColumn("__num__",
        greatest(col("n_tokens") - lit(chunkSize), lit(0L)) + lit(stride - 1L))
      .withColumn("__nc__", chunkCountFromNum(col("__num__"), stride))
      .drop("__num__")
      .select(col(idCol), col("n_tokens"),
        explode(sequence(lit(0L), col("__nc__") - 1L)).as("chunk_idx"))
      .withColumn("tok_start", col("chunk_idx") * lit(stride))
      .withColumn("tok_end", least(col("tok_start") + lit(chunkSize), col("n_tokens")))
  }

  /** Chunk count from a precomputed numerator column
    * (= max(0, n_tokens - chunkSize) + stride - 1): integer ceil as
    * `1 + num div stride` in pure long `div`, never double division —
    * exact past 2^53 token counts, the same rationale as `packSequences`'
    * offset arithmetic. Factored out so the >2^53 arithmetic is unit-testable
    * without exploding ~2^52 chunk rows. */
  private[graft] def chunkCountFromNum(num: Column, stride: Long): Column =
    lit(1L) + call_function("div", num.cast("long"), lit(stride))
}
