package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Benchmark decontamination: flag or drop corpus documents that share
  * word n-grams with an evaluation/benchmark set — the GPT-3-style overlap
  * filter every serious training-data pipeline runs before training.
  *
  * Scale shape (the reason this is explode + broadcast-join + re-agg, not
  * per-row set intersection):
  *   - the benchmark side is aggregated to its distinct n-gram set once and
  *     broadcast — eval suites are MB-scale by definition, so the 100 TB
  *     corpus side NEVER shuffles for the join;
  *   - per-document totals and hit counts come out of ONE `groupBy(id)`
  *     whose partial aggregation collapses the exploded gram rows map-side
  *     to ~one row per (document, partition) before the only shuffle;
  *   - a per-row `array_intersect` against a broadcast gram array would
  *     rebuild the benchmark hash set for every row (Spark's ArrayIntersect
  *     is per-invocation) — ruinous for a large benchmark, hence rejected.
  *
  * N-gram semantics follow [[Dedup.shingles]] (distinct whitespace-token
  * n-grams, native codegen'd [[graft.functions.WordNGrams]]), so
  * `n_grams`/`n_shared` count DISTINCT grams per document. Real pipelines
  * use n around 8–13 (GPT-3 appendix C); `n` is a free parameter here.
  */
object Decontamination {

  /** Per-document overlap stats against the benchmark n-gram set:
    * `(idCol, n_grams, n_shared, contaminated)`. Every corpus document
    * surfaces, including empty/NULL-text ones (0, 0, false) — a silently
    * vanishing row is how a contaminated document slips a filter.
    */
  def overlapStats(
      corpus: DataFrame,
      bench: DataFrame,
      textCol: String,
      idCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    val benchGrams = broadcast(
      bench.select(explode(Dedup.shingles(col(textCol), n)).as("__g__"))
        .distinct()
        .withColumn("__hit__", lit(1)))
    // explode_outer: a document with < n tokens (or NULL text) yields one
    // NULL-gram row so it survives the groupBy with zero counts
    corpus
      .select(col(idCol), explode_outer(Dedup.shingles(col(textCol), n)).as("__g__"))
      .join(benchGrams, Seq("__g__"), "left")
      .groupBy(col(idCol))
      .agg(
        count(col("__g__")).as("n_grams"),
        count(col("__hit__")).as("n_shared"))
      .withColumn("contaminated", col("n_shared") > 0)
  }

  /** Ids of corpus documents sharing more than `maxShared` distinct
    * n-grams with the benchmark (single column = `idCol`). */
  def contaminatedIds(
      corpus: DataFrame,
      bench: DataFrame,
      textCol: String,
      idCol: String,
      n: Int,
      maxShared: Long = 0L): DataFrame =
    overlapStats(corpus, bench, textCol, idCol, n)
      .where(col("n_shared") > maxShared)
      .select(col(idCol))

  /** Serialized Bloom filter over the benchmark's distinct n-gram XXH64
    * hashes (`spark.util.sketch.BloomFilter` wire format). The benchmark
    * side is MB-scale by definition, so building it is two tiny jobs
    * (distinct-count for sizing, then the sketch aggregate) and the one
    * driver-resident object is a few MB of bits.
    */
  private[graft] def benchGramBloomBytes(
      bench: DataFrame,
      textCol: String,
      n: Int,
      fpp: Double): Array[Byte] = {
    val hashes = bench
      .select(explode(Dedup.shingles(col(textCol), n)).as("__g__"))
      .distinct()
      .select(xxhash64(col("__g__")).as("__h__"))
      .persist()
    try {
      val est = math.max(hashes.count(), 1L)
      // optimalNumOfBits rounds to 0 for tiny est × loose fpp, which the
      // sketch aggregate rejects — floor at one word (a 64-bit sketch is
      // just maximally saturated, i.e. everything routes to exact confirm)
      val numBits = math.max(
        org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(est, fpp), 64L)
      val bloom = hashes.stat.bloomFilter("__h__", est, numBits)
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    } finally hashes.unpersist()
  }

  /** `bloom might contain XXH64(c)` as a codegen predicate — the same
    * `BloomFilterMightContain` expression Spark's own runtime-filter rule
    * injects, with the sketch embedded as a binary literal (the filter is
    * deserialized once per task, not per row). `putLong`/`mightContainLong`
    * symmetry requires the build side to have inserted `xxhash64` longs,
    * which [[benchGramBloomBytes]] does.
    */
  private def bloomMightContain(bloomBytes: Array[Byte], c: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType),
      ColumnBridge.expression(xxhash64(c))))

  /** The corpus minus contaminated documents (all original columns).
    * The anti-join keys on `idCol` only — a narrow shuffle; the wide text
    * column rides the probe side untouched. */
  def dropContaminated(
      corpus: DataFrame,
      bench: DataFrame,
      textCol: String,
      idCol: String,
      n: Int,
      maxShared: Long = 0L): DataFrame =
    corpus.join(
      contaminatedIds(corpus, bench, textCol, idCol, n, maxShared),
      Seq(idCol), "left_anti")

  /** [[dropContaminated]] with a broadcast Bloom prefilter — the 100 TB
    * path. Result is EXACTLY `dropContaminated(...)` (Bloom filters have
    * false positives, never false negatives, so "no gram in the sketch"
    * proves n_shared = 0 ≤ maxShared); only the work distribution changes:
    *
    *   - **definitely-clean fast path** (the overwhelming majority of a
    *     real corpus): one narrow `exists(shingles, bloom)` filter — zero
    *     shuffle, zero explode-join, rows stream scan → output;
    *   - **suspects** (true contaminants + an `fpp` sliver of false
    *     positives) re-run the exact gram-overlap machinery, so every
    *     shuffle the exact path had still runs — but over the sliver, not
    *     the corpus.
    *
    * Cost shape vs [[dropContaminated]]: the corpus parquet is scanned 3×
    * (clean output; suspect probe; suspect gram-explode) instead of 2×,
    * but the ×tokens-per-doc explode row amplification and BOTH
    * corpus-wide shuffles (gram groupBy, id anti-join) now touch only the
    * sliver. Scans are sequential columnar reads; the shuffles were the
    * bottleneck. The `exists` evaluates interpreted (higher-order
    * functions are CodegenFallback) with short-circuit on first hit —
    * the sketch itself deserializes once per task.
    */
  def dropContaminatedBloom(
      corpus: DataFrame,
      bench: DataFrame,
      textCol: String,
      idCol: String,
      n: Int,
      maxShared: Long = 0L,
      fpp: Double = 0.01): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1), got $fpp")
    val bloomBytes = benchGramBloomBytes(bench, textCol, n, fpp)
    // NULL text / short docs: shingles yields no grams → exists is
    // false/NULL → coalesce keeps the doc on the fast path, matching the
    // exact path's explode_outer keep-with-zero-counts semantics
    val suspect = coalesce(
      exists(Dedup.shingles(col(textCol), n), g => bloomMightContain(bloomBytes, g)),
      lit(false))
    corpus.where(!suspect).unionByName(
      dropContaminated(corpus.where(suspect), bench, textCol, idCol, n, maxShared))
  }
}
