package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling primitives for training-data pipelines.
  *
  * Randomness comes from seeded `xxhash64` over caller-named id columns,
  * NOT `rand()`: hash randomness is a pure per-row function, so results
  * are identical across retries, partitionings, and cluster sizes —
  * `rand(seed)` is per-partition-deterministic only, which silently
  * reshuffles a "reproducible" sample whenever the scan splits differently.
  */
object Sampling {

  private val M = 1000000007L

  /** Uniform (0,1) from the row's id hash. */
  private[graft] def unif(idCols: Seq[String], seed: Long): Column =
    (pmod(xxhash64((idCols.map(col) :+ lit(seed)): _*), lit(M)).cast("double") + lit(0.5)) / M

  /** Weighted sample WITHOUT replacement of `n` rows
    * (Efraimidis–Spirakis exponential keys: row priority `-ln(u)/w`,
    * smallest n win — inclusion probability scales with weight). The plan
    * is `TakeOrderedAndProject` — per-partition top-n then a merge of n-row
    * heads, never a global sort.
    *
    * Contracts:
    *   - `idCols` values must be UNIQUE per row: duplicate ids share one
    *     sort key, so which duplicate's payload survives the cut would
    *     depend on partition order. The id tiebreaker below pins the
    *     boundary between *distinct* ids; it cannot distinguish clones.
    *   - `n` must fit one node: TakeOrdered merges every partition's n-row
    *     head on a single task (capped at [[maxSingleNodeN]]). For samples
    *     beyond that, take a fraction deterministically with [[assignSplit]]
    *     (threshold on the same hash) instead of an exact-n cut. */
  private[graft] val maxSingleNodeN = 10000000

  def weightedSample(
      df: DataFrame,
      weightCol: String,
      idCols: Seq[String],
      n: Int,
      seed: Long = 42L): DataFrame = {
    require(n > 0, s"sample size must be positive, got $n")
    require(n <= maxSingleNodeN,
      s"weightedSample materializes the n-row head on one node; n=$n exceeds " +
        s"$maxSingleNodeN — use assignSplit (hash-threshold fraction) for huge samples")
    require(idCols.nonEmpty, "weightedSample needs id columns to hash")
    val key = -log(unif(idCols, seed)) / col(weightCol)
    df.where(col(weightCol) > 0)
      .withColumn("__k__", key)
      .orderBy(col("__k__") +: idCols.map(col): _*)
      .limit(n)
      .drop("__k__")
  }

  /** Deterministic stratified sampling: keep each row with its stratum's
    * fraction, decided by the row's id hash — `sampleBy` without `rand()`:
    * the same (id, seed) keeps or drops the row under ANY partitioning or
    * retry, and resizing a stratum's fraction only flips rows whose hash
    * sits between the old and new thresholds (downsampling a stratum keeps
    * a subset of the previous sample, never a reshuffle). Strata missing
    * from `fractions` fall back to `defaultFraction` (0 = drop). Pure
    * per-row predicate: no shuffle, no driver state, pushes down to the
    * scan like any filter. */
  def sampleStratified(
      df: DataFrame,
      idCols: Seq[String],
      strataCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0,
      seed: Long = 42L): DataFrame = {
    require(idCols.nonEmpty, "sampleStratified needs id columns to hash")
    require((fractions.values ++ Seq(defaultFraction)).forall(f => f >= 0.0 && f <= 1.0),
      s"fractions must be in [0,1], got $fractions / default $defaultFraction")
    val u = unif(idCols, seed)
    val thr = fractions.foldLeft(lit(defaultFraction)) { case (acc, (k, f)) =>
      when(col(strataCol) === k, lit(f)).otherwise(acc)
    }
    df.where(u < thr)
  }

  /** Deterministic split assignment (train/val/test…): every row gets the
    * split whose cumulative fraction bucket its id hash lands in. Adding a
    * split or resizing fractions only moves rows at bucket boundaries;
    * the same (id, seed) always lands in the same split. Fractions must
    * sum to ~1. */
  def assignSplit(
      df: DataFrame,
      idCols: Seq[String],
      fractions: Seq[(String, Double)],
      seed: Long = 42L,
      splitCol: String = "split"): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0),
      "fractions must be positive")
    val total = fractions.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"fractions must sum to 1, got $total")
    val u = unif(idCols, seed)
    val cum = fractions.scanLeft(0.0)(_ + _._2).tail
    val expr = fractions.init.zip(cum.init).foldRight(lit(fractions.last._1)) {
      case (((name, _), upper), rest) => when(u < upper, name).otherwise(rest)
    }
    df.withColumn(splitCol, expr)
  }

  /** Token-budget mixture sampling: per group (e.g. language × source),
    * keep rows in `orderCols` order until the group's running token total
    * exceeds `budget` — how a training mix hits "N tokens of each domain"
    * exactly instead of by row-count proxy. The kept rows carry their
    * inclusive running total in `cumCol`.
    *
    * One shuffle (hash on `groupCols` for the window); enforcement is a
    * prefix scan, so each group sorts within its partition. Groups are
    * domains/languages — thousands at most, each budget-bounded; for a
    * budget so large one group's rows overwhelm a partition, pre-thin with
    * [[sampleStratified]] (fraction ≈ budget / group tokens) and let this
    * make the cut exact.
    *
    * `orderCols` must be a total order (unique key last): a tie would make
    * the budget boundary partition-order-dependent. */
  def takeTokenBudget(
      df: DataFrame,
      groupCols: Seq[String],
      tokenCol: Column,
      budget: Long,
      orderCols: Seq[String],
      cumCol: String = "cum_tokens"): DataFrame = {
    require(groupCols.nonEmpty, "takeTokenBudget needs group columns")
    require(orderCols.nonEmpty, "takeTokenBudget needs a deterministic order")
    require(budget > 0, s"budget must be positive, got $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    // NULL token counts are excluded up front: inside the window a NULL
    // is skipped by sum(), so such a row would be dropped or kept
    // depending on whether it sorts first in its group — a
    // position-dependent NULL policy. Excluding them is the consistent one
    // (a row with no token count cannot spend budget).
    df.where(tokenCol.isNotNull)
      .withColumn(cumCol, sum(tokenCol.cast("long")).over(w))
      .where(col(cumCol) <= budget)
  }

  /** Rebalance strata to target proportions (e.g. lang mix 40/30/20/10)
    * by deterministic per-stratum downsampling: the largest subset whose
    * expected stratum shares match `targets` — the binding stratum (the
    * one with the least data relative to its target) keeps everything,
    * the rest downsample to match. Strata absent from `targets` are
    * dropped. Hash-thresholded like [[sampleStratified]], so shares match
    * in expectation (exact-count trimming would need a per-stratum global
    * sort); deterministic under any partitioning.
    *
    * One counting aggregate collects #strata rows to the driver to derive
    * the fractions — strata are languages/domains, tiny by construction —
    * then the filter is a pure per-row predicate (no further shuffle). */
  /** Temperature-flattened sampling shares over the strata of
    * `strataCol` — the multilingual-pretraining mixing rule (XLM,
    * Conneau & Lample 2019; the mT5/GPT-3 data-mix convention):
    * `share_g ∝ p_g^alpha` with `p_g` the stratum's natural row
    * fraction. `alpha = 1` reproduces the natural mix; `alpha → 0`
    * approaches uniform — flattening the head so low-resource strata are
    * upsampled relative to their natural share.
    *
    * Deterministic across engines: strata counts collect to the driver
    * (bounded — one row per stratum, the matchDistribution contract) and
    * the normalizer folds in SORTED stratum order, so the share doubles
    * are a pure function of the counts. */
  def temperatureShares(
      df: DataFrame, strataCol: String, alpha: Double): Map[String, Double] = {
    require(alpha > 0, s"temperature alpha must be > 0, got $alpha")
    val counts = df.where(col(strataCol).isNotNull)
      .groupBy(strataCol).agg(count(lit(1)).as("c"))
      .collect().map(r => r.get(0).toString -> r.getLong(1))
    require(counts.nonEmpty, "temperatureShares: no non-null strata")
    val n = counts.map(_._2).sum.toDouble
    val pows = counts.sortBy(_._1).map { case (s, c) => s -> math.pow(c / n, alpha) }
    val z = pows.foldLeft(0.0) { case (acc, (_, p)) => acc + p }
    pows.map { case (s, p) => s -> p / z }.toMap
  }

  /** Draw the temperature-flattened mixture: [[temperatureShares]] fed to
    * [[matchDistribution]] — the binding stratum keeps everything, the
    * rest downsample to the flattened proportions via the same
    * hash-seeded pushdown-able admission filter. */
  def temperatureMix(
      df: DataFrame,
      idCols: Seq[String],
      strataCol: String,
      alpha: Double,
      seed: Long = 42L): DataFrame =
    matchDistribution(df, idCols, strataCol,
      temperatureShares(df, strataCol, alpha), seed)

  /** Temperature resampling WITH replacement (in expectation) — the
    * mT5/XLM rule realized exactly: stratum s contributes
    * `totalRows · share_s` rows in expectation, via per-stratum repeat
    * factors `f_s = totalRows · share_s / count_s` fed to
    * [[upsampleByFactor]]. Unlike [[temperatureMix]] (admission-only —
    * over-represented strata downsample but under-represented ones can
    * only keep what exists), this both UP- and DOWN-samples, hitting the
    * flattened mixture at any requested corpus size. `totalRows = 0`
    * keeps the natural total. Null-stratum rows are excluded (shares are
    * defined over the non-null strata, the [[temperatureShares]]
    * contract). Output carries the 0-based `epoch` column. */
  def temperatureResample(
      df: DataFrame,
      idCols: Seq[String],
      strataCol: String,
      alpha: Double,
      totalRows: Long = 0L,
      seed: Long = 42L): DataFrame = {
    require(totalRows >= 0, s"totalRows must be >= 0 (0 = natural), got $totalRows")
    val counts = df.where(col(strataCol).isNotNull)
      .groupBy(strataCol).agg(count(lit(1)).as("c"))
      .collect().map(r => r.get(0).toString -> r.getLong(1)).toMap
    val shares = temperatureShares(df, strataCol, alpha)
    val m = if (totalRows > 0) totalRows.toDouble else counts.values.sum.toDouble
    val factors = shares.map { case (s, q) => s -> m * q / counts(s) }
    upsampleByFactor(df.where(col(strataCol).isNotNull), idCols, strataCol,
      factors, seed)
  }

  def matchDistribution(
      df: DataFrame,
      idCols: Seq[String],
      strataCol: String,
      targets: Map[String, Double],
      seed: Long = 42L): DataFrame = {
    val rows = matchDistributionPlan(df, strataCol, targets).collect()
    val missing = targets.keySet.diff(rows.map(_.get(0).toString).toSet)
    require(missing.isEmpty, s"strata absent from the data: $missing")
    val fractions = rows.map(r => r.get(0).toString -> r.getDouble(2)).toMap
    sampleStratified(df, idCols, strataCol, fractions, defaultFraction = 0.0, seed = seed)
  }

  /** Epoch-based UPSAMPLING by per-stratum repeat factors — the
    * source-weight recipe of production pretraining mixes (a high-quality
    * source repeats for several epochs while a bulk source contributes
    * less than one): every row of stratum `s` is emitted
    * `floor(factors(s))` times plus one more with probability
    * `frac(factors(s))`, decided by the row's seeded id hash ([[unif]] —
    * deterministic under any partitioning; the complement of
    * [[temperatureMix]], which only ever SUBSAMPLES). Output: the input
    * columns plus 0-based `epoch`; a row's copies are distinguishable (and
    * a trainer can interleave epochs by filtering on it). Strata absent
    * from `factors` keep the natural single epoch (factor 1.0); a factor
    * of 0 removes the stratum. NULL-stratum rows are treated exactly like
    * an absent stratum — every `when(col === s)` predicate is null-false,
    * so they fall through to factor 1.0 and emit one epoch-0 copy; a
    * caller that defines its mixture over non-null strata only (e.g.
    * [[temperatureResample]]) must pre-filter NULLs itself. Factors must
    * be finite and ≥ 0.
    *
    * Scale shape: one `when`-chain projection (factor map is
    * stratum-sized) + a `sequence`/explode — NO shuffle, NO join; the
    * fan-out is the requested Σ(rows·factor) and happens inside the scan
    * stage. */
  def upsampleByFactor(
      df: DataFrame,
      idCols: Seq[String],
      strataCol: String,
      factors: Map[String, Double],
      seed: Long = 42L): DataFrame = {
    require(idCols.nonEmpty, "upsampleByFactor needs id columns to hash")
    require(factors.values.forall(f => f >= 0 && !f.isNaN && !f.isInfinite),
      s"factors must be finite and >= 0, got $factors")
    val factor = factors.foldLeft(lit(1.0)) { case (acc, (s, f)) =>
      when(col(strataCol) === s, lit(f)).otherwise(acc)
    }
    val full = floor(factor).cast("long")
    val frac = factor - floor(factor)
    // frac == 0 never consults the hash (a whole-number factor must not
    // depend on the seed); the fractional epoch admits when u < frac
    val extra = when(frac > 0 && unif(idCols, seed) < frac, 1L).otherwise(0L)
    val n = (full + extra).as("__n__")
    df.withColumn("__n__", n)
      .where(col("__n__") > 0)
      .select(df.columns.map(col) :+
        explode(sequence(lit(0L), col("__n__") - 1)).as("epoch"): _*)
  }

  /** The deterministic half of [[matchDistribution]] as its own relation:
    * per stratum, the available row count and the derived keep-fraction —
    * the binding stratum (smallest available/target ratio) keeps 1.0, the
    * rest downsample to match the target mix. Pure SQL shape (one grouped
    * count over the strata + a global min over the #strata-row frame), so
    * it is oracle-checkable and costs one aggregate; [[matchDistribution]]
    * collects THIS relation (strata are languages/domains — tiny) to build
    * its per-row predicate. Strata absent from `targets` are omitted. */
  def matchDistributionPlan(
      df: DataFrame,
      strataCol: String,
      targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0),
      s"targets must be positive, got $targets")
    val total = targets.values.sum
    val share = targets.foldLeft(lit(null).cast("double")) { case (acc, (s, t)) =>
      when(col(strataCol) === s, lit(t / total)).otherwise(acc)
    }
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    df.where(col(strataCol).isin(targets.keys.toSeq: _*))
      .groupBy(strataCol).agg(count(lit(1)).as("available"))
      .withColumn("__share__", share)
      .withColumn("__k__",
        min(col("available").cast("double") / col("__share__")).over(w))
      .select(col(strataCol), col("available"),
        least(lit(1.0), col("__k__") * col("__share__") / col("available"))
          .as("fraction"))
  }
}
