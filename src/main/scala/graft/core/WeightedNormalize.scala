package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weighted per-group NORMALIZATION transforms — row-preserving
  * complements of the reductions in [[WeightedMoments]]: every input row
  * comes back with its weighted empirical-CDF position or z-score within
  * its group. The curation use-case: make quality scores comparable across
  * domains/languages before a global cut ([[graft.ops.Selection]]).
  *
  * Both are single-shuffle plans: one hash exchange on the group keys,
  * then WindowExec computes the group moments and the per-row transform in
  * the same pass — no join back, no second scan, no driver collection.
  */
object WeightedNormalize {

  /** Weighted empirical CDF: for each row, `Σ wᵢ·1[xᵢ ≤ x] / Σ wᵢ` over
    * its group's non-null values (ties share one value — all peers of the
    * current x are included, the RANGE-frame convention). NULL x → NULL.
    * Output: the input rows plus `outCol`. */
  def ecdf(
      wdf: WeightedDataFrame,
      valueCol: String,
      keys: Seq[String],
      outCol: String = "pct_rank"): DataFrame = {
    require(keys.nonEmpty,
      "ecdf without group keys serializes into one task; partition first")
    val x = WeightedDataFrame.numericCol(wdf.df, valueCol)
    // null x sorts first under asc and contributes 0 weight — harmless in
    // every frame; its own output is nulled explicitly
    val wn = when(col(valueCol).isNotNull, wdf.w).otherwise(lit(0.0))
    val upTo = Window.partitionBy(keys.map(col): _*).orderBy(x.asc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(keys.map(col): _*)
    wdf.df.withColumn(outCol,
      when(col(valueCol).isNotNull,
        WeightedMoments.safeDiv(sum(wn).over(upTo), sum(wn).over(whole))))
  }

  /** Weighted quantile-bucket assignment (pandas `qcut` analog, defined on
    * weighted MASS rather than interpolated quantile edges): bucket `i` of
    * `q` holds the rows whose weighted ECDF position falls in
    * `(i/q, (i+1)/q]` — each bucket carries ≈ 1/q of the total weight, ties
    * share one bucket (they share an ECDF value), and the top-ranked rows
    * always land in bucket `q−1`. NULL x → NULL bucket. Same single-shuffle
    * plan as [[ecdf]]. */
  def qcut(
      wdf: WeightedDataFrame,
      valueCol: String,
      keys: Seq[String],
      q: Int,
      outCol: String = "bucket",
      boundaryDigits: Int = 9): DataFrame = {
    require(q >= 2, s"qcut needs at least 2 buckets, got $q")
    require(boundaryDigits >= 6 && boundaryDigits <= 12,
      s"boundaryDigits must be in [6,12], got $boundaryDigits")
    // round(p·q, d) before ceil: p is a ratio of weight sums, so a 1-ulp
    // difference in the denominator's summation order would flip a whole
    // bucket exactly at the i/q boundaries (p = 1 sits on one in EVERY
    // group). Rounding absorbs the ulp; it is lossless while distinct
    // p·q rationals are spaced wider than 10^-d, i.e. while a group's
    // weight mass (in min-weight units) stays below ~10^d — at d = 9,
    // groups up to ~1e9 mass. Beyond that raise `boundaryDigits` (ulp
    // noise is ~1e-15, so up to 12 stays safe). The clamp covers
    // round-up past q at p ≈ 1.
    ecdf(wdf, valueCol, keys, "__p__")
      .withColumn(outCol,
        when(col("__p__").isNotNull,
          least(
            greatest(ceil(round(col("__p__") * q, boundaryDigits)) - 1, lit(0)),
            lit(q - 1)).cast("long")))
      .drop("__p__")
  }

  /** Weighted z-score: `(x − μ_w) / σ_w` per group, with the engine's
    * moment-formula variance (`ddof` against the weighted count, exactly
    * [[WeightedMoments]]'s batch kernel). NULL x, zero variance, or
    * `Σw ≤ ddof` → NULL. Output: the input rows plus `outCol`. */
  def zscore(
      wdf: WeightedDataFrame,
      valueCol: String,
      keys: Seq[String],
      ddof: Int = 1,
      outCol: String = "zscore"): DataFrame = {
    require(keys.nonEmpty,
      "zscore without group keys serializes into one task; partition first")
    val x = WeightedDataFrame.numericCol(wdf.df, valueCol)
    val whole = Window.partitionBy(keys.map(col): _*)
    val wn = when(col(valueCol).isNotNull, wdf.w).otherwise(lit(0.0))
    val s = sum(x * wdf.w).over(whole)
    val q = sum(x * x * wdf.w).over(whole)
    val n = sum(wn).over(whole)
    val mean = WeightedMoments.safeDiv(s, n)
    val variance = WeightedMoments.safeDiv(
      q - WeightedMoments.safeDiv(s * s, n), n - lit(ddof.toDouble))
    val sd = sqrt(when(variance > 0, variance))
    wdf.df.withColumn(outCol,
      when(col(valueCol).isNotNull, WeightedMoments.safeDiv(x - mean, sd)))
  }
}
