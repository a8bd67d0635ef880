package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Series-accessor facade — the reference's `WeightedSeriesAccessor`
  * (`/root/reference/src/pandas_weights/series.py:43-264`) re-expressed as a
  * thin wrapper over a single-value-column [[WeightedDataFrame]] (SURVEY §7:
  * pandas needed two parallel class trees; Spark doesn't). The pandas
  * implicit row index becomes explicit `indexCols`, used for groupby level
  * keys and `corr(other)` alignment.
  *
  * Scalar-returning aggregations return `Option[Double]` (None ≡ pandas
  * NaN); each is one action over the same single-pass plans as the frame
  * API.
  */
final class WeightedSeries private (
    private val wdf: WeightedDataFrame,
    val valueCol: String,
    val indexCols: Seq[String]) {

  private def agg1(df: DataFrame): Option[Double] = {
    val r = df.head()
    if (r.isNullAt(0)) None
    else {
      val v = r.get(0) match {
        case d: java.lang.Double => d.doubleValue()
        case n: java.lang.Number => n.doubleValue()
      }
      if (v.isNaN) None else Some(v)
    }
  }

  private def series = wdf.select((indexCols :+ valueCol): _*)
  private def c: Column = WeightedDataFrame.numericCol(wdf.df, valueCol)
  private def w: Column = wdf.w

  /** `series.py:99-107` — the weighted values (with index columns). */
  def weighted(): DataFrame = series.weighted()

  /** `series.py:164-182` */
  def count(skipna: Boolean = true): Option[Double] =
    agg1(wdf.df.agg(WeightedMoments.countExpr(c, w, skipna)))

  /** `series.py:184-190` */
  def sum(minCount: Int = 0): Option[Double] =
    agg1(wdf.df.agg(WeightedMoments.wSum(c, w, minCount)))

  /** `series.py:192-199` */
  def mean(skipna: Boolean = true): Option[Double] =
    agg1(wdf.df.agg(WeightedMoments.meanExpr(c, w, skipna)))

  /** `series.py:201-211` */
  def variance(ddof: Int = 1, skipna: Boolean = true): Option[Double] =
    agg1(wdf.df.agg(WeightedMoments.varExpr(c, w, ddof, skipna)))

  /** `series.py:213-220` */
  def std(ddof: Int = 1, skipna: Boolean = true): Option[Double] =
    agg1(wdf.df.agg(WeightedMoments.stdExpr(c, w, ddof, skipna)))

  /** Weighted skewness (beyond-reference; [[WeightedMoments.skewExpr]]). */
  def skew(skipna: Boolean = true): Option[Double] =
    agg1(wdf.df.agg(WeightedMoments.skewExpr(c, w, skipna)))

  /** Weighted excess kurtosis (beyond-reference). */
  def kurt(skipna: Boolean = true): Option[Double] =
    agg1(wdf.df.agg(WeightedMoments.kurtExpr(c, w, skipna)))

  /** `series.py:222-247` — index-aligned weighted Pearson vs `other`
    * (columns: indexCols :+ otherVal). */
  def corr(
      other: DataFrame,
      otherVal: String,
      method: String = "pearson",
      minPeriods: Int = 1,
      ddof: Int = 1): Option[Double] = {
    WeightedDataFrame.requirePearson(method)
    agg1(AlignedCorr.corr(series, valueCol, other, otherVal, indexCols, ddof, minPeriods))
  }

  /** `series.py:249-264` — apply an expression to the pre-weighted values. */
  def applyRows(f: Column => Column): DataFrame =
    wdf.df.select((indexCols.map(col) :+ f(c * w).as(valueCol)): _*)

  /** `series.py:109-134` — weighted groupby on index level(s) or columns. */
  def groupBy(keys: Seq[String], dropna: Boolean = true, sort: Boolean = true): WeightedGroupBy =
    series.groupBy(keys, dropna, sort)

  def groupBy(key: String): WeightedGroupBy = groupBy(Seq(key))

  /** `series.py:435-468` — grouped aligned corr vs other. */
  def corrByGroup(
      keys: Seq[String],
      other: DataFrame,
      otherVal: String,
      method: String = "pearson",
      minPeriods: Int = 1,
      ddof: Int = 1): DataFrame = {
    WeightedDataFrame.requirePearson(method)
    AlignedCorr.corrByGroup(wdf, keys, valueCol, other, otherVal, indexCols, ddof, minPeriods)
  }

  /** `series.py:136-162` — weighted resample on a timestamp index column. */
  def resample(
      on: String,
      rule: String,
      closed: String = "left",
      label: String = "auto", // rule-dependent pandas default: right for M/Q/Y, left otherwise
      origin: String = "start_day",
      offset: Option[String] = None,
      lenient: Boolean = false): WeightedResampler =
    series.resample(on, rule, closed, label, origin, offset, lenient = lenient)
}

object WeightedSeries {

  /** `s.wt(weightsColumn)` with an explicit index. */
  def wt(
      df: DataFrame,
      valueCol: String,
      weights: String,
      indexCols: Seq[String] = Nil,
      naWeight: Option[Double] = None): WeightedSeries = {
    val wdf = WeightedDataFrame.wt(
      df.select((indexCols :+ valueCol :+ weights).distinct.map(col): _*), weights, naWeight)
    new WeightedSeries(wdf, valueCol, indexCols)
  }

  /** `s.wt([w…], na_weight=…)` positional weights (test/parity path, like
    * the frame's); `naWeight` fills missing weights — `series.py:94-95`. */
  def wt(
      df: DataFrame,
      valueCol: String,
      weights: Seq[Double],
      naWeight: Option[Double]): WeightedSeries = {
    val wdf = WeightedDataFrame.wt(df.select(valueCol), weights, naWeight)
    new WeightedSeries(wdf, valueCol, Nil)
  }

  def wt(df: DataFrame, valueCol: String, weights: Seq[Double]): WeightedSeries =
    wt(df, valueCol, weights, None)
}
