package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Weighted rolling / expanding windows — the reference README's stated
  * future work (README.md:311-317), built from the exact same moment
  * kernels as the batch aggregates, applied `.over()` an ordered row frame.
  *
  * Scale shape: one shuffle on the partition keys, then a per-partition
  * sort; every aggregate for a row is computed incrementally by Spark's
  * WindowExec over the sliding frame. Unpartitioned rolling over a single
  * global order is refused — a single-partition window cannot scale.
  */
final class WeightedRolling private[core] (
    wdf: WeightedDataFrame,
    orderCol: String,
    partitionKeys: Seq[String],
    frameRows: Option[Int]) { // None → expanding from the frame start

  require(partitionKeys.nonEmpty,
    "rolling without partition keys serializes into one task; partition first " +
      "(pandas' global-order rolling has no distributed analogue)")

  private def spec: WindowSpec = {
    val base = Window.partitionBy(partitionKeys.map(col): _*).orderBy(col(orderCol))
    frameRows match {
      case Some(n) => base.rowsBetween(-(n - 1L), Window.currentRow)
      case None    => base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    }
  }

  private def w: Column = wdf.w
  private def nc(c: String): Column = WeightedDataFrame.numericCol(wdf.df, c)
  private def aggCols: Seq[String] =
    wdf.numericCols.filterNot(c => partitionKeys.contains(c) || c == orderCol)

  private def run(expr: String => Column): DataFrame =
    wdf.df.select(
      (partitionKeys :+ orderCol).map(col) ++
        aggCols.map(c => expr(c).as(c)): _*)

  def count(skipna: Boolean = true): DataFrame = run { c =>
    // this.sum(minCount) shadows functions.sum — qualify explicitly
    val e =
      if (skipna) org.apache.spark.sql.functions.sum(when(col(c).isNotNull, w).otherwise(lit(0.0)))
      else org.apache.spark.sql.functions.sum(w)
    coalesce(e.over(spec), lit(0.0))
  }

  def sum(minCount: Int = 0): DataFrame = run { c =>
    val s = org.apache.spark.sql.functions.sum(nc(c) * w).over(spec)
    if (minCount <= 0) coalesce(s, lit(0.0))
    else if (minCount == 1) s
    else { // full pandas min_count semantics, like the batch kernel
      val valid = org.apache.spark.sql.functions.sum(
        when(col(c).isNotNull && w.isNotNull, 1L).otherwise(0L)).over(spec)
      when(valid < minCount, lit(null).cast("double")).otherwise(s)
    }
  }

  def mean(skipna: Boolean = true): DataFrame = run { c =>
    val s = org.apache.spark.sql.functions.sum(nc(c) * w).over(spec)
    val n = (if (skipna) org.apache.spark.sql.functions.sum(
      when(col(c).isNotNull, w).otherwise(lit(0.0)))
    else org.apache.spark.sql.functions.sum(w)).over(spec)
    WeightedMoments.safeDiv(s, n)
  }

  def variance(ddof: Int = 1, skipna: Boolean = true): DataFrame = run { c =>
    val s = org.apache.spark.sql.functions.sum(nc(c) * w).over(spec)
    val q = org.apache.spark.sql.functions.sum(nc(c) * nc(c) * w).over(spec)
    val n = (if (skipna) org.apache.spark.sql.functions.sum(
      when(col(c).isNotNull, w).otherwise(lit(0.0)))
    else org.apache.spark.sql.functions.sum(w)).over(spec)
    WeightedMoments.safeDiv(q - WeightedMoments.safeDiv(s * s, n), n - lit(ddof.toDouble))
  }

  def std(ddof: Int = 1, skipna: Boolean = true): DataFrame = {
    val v = variance(ddof, skipna)
    v.select((partitionKeys :+ orderCol).map(col) ++
      aggCols.map(c => sqrt(col(c)).as(c)): _*)
  }

  /** Exponentially weighted mean with FINITE memory: the last `memory`
    * rows contribute with position-based decay `β = 1−α` (pandas
    * `ewm(alpha).mean()` with `adjust=True, ignore_na=False`, truncated at
    * β^memory ≈ 0 — for α=0.5, memory=32 the tail is 2⁻³² ≈ 2e-10 of the
    * head weight). Truncation is the deliberate scale choice: unbounded
    * EWM needs either a sequential recurrence (unparallelizable) or
    * β^(−i) prefix terms that overflow doubles within ~10³ rows; a
    * `memory`-row frame is O(memory) per row inside one WindowExec pass
    * and exactly reproducible by any engine. Row weights multiply the
    * decay: ewm_t = Σⱼ βʲ·w·x / Σⱼ βʲ·w over valid (non-null) entries;
    * positions, not valid-counts, drive the decay (ignore_na=False). */
  def ewmMean(alpha: Double, memory: Int = 32): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(memory >= 1 && memory <= 128, s"memory must be in [1,128], got $memory")
    require(frameRows.isEmpty || frameRows.exists(_ >= memory),
      "ewmMean needs an expanding frame or a rolling frame >= memory")
    val beta = 1.0 - alpha
    val base = Window.partitionBy(partitionKeys.map(col): _*).orderBy(col(orderCol))
    run { c =>
      val wx = when(col(c).isNotNull, nc(c) * w).otherwise(lit(0.0))
      val wn = when(col(c).isNotNull, w).otherwise(lit(0.0))
      val num = (0 until memory).map(j =>
        lit(math.pow(beta, j)) * coalesce(lag(wx, j).over(base), lit(0.0))).reduce(_ + _)
      val den = (0 until memory).map(j =>
        lit(math.pow(beta, j)) * coalesce(lag(wn, j).over(base), lit(0.0))).reduce(_ + _)
      WeightedMoments.safeDiv(num, den)
    }
  }
}

object WeightedRolling {
  /** Rolling window of `n` rows per partition key, ordered by `orderCol`. */
  def rolling(wdf: WeightedDataFrame, orderCol: String, keys: Seq[String], n: Int): WeightedRolling = {
    require(n >= 1)
    new WeightedRolling(wdf, orderCol, keys, Some(n))
  }

  /** Expanding window (cumulative) per partition key. */
  def expanding(wdf: WeightedDataFrame, orderCol: String, keys: Seq[String]): WeightedRolling =
    new WeightedRolling(wdf, orderCol, keys, None)
}
