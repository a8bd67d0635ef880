package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
