package graft

import org.apache.spark.sql.DataFrame

import graft.core.{WeightedDataFrame, WeightedSeries}

/** Accessor-style syntax mirroring the reference's registered `.wt`
  * pandas accessor (`/root/reference/src/pandas_weights/base.py:11-50`):
  *
  * {{{
  * import graft.api._
  * df.wt("weight_col").groupBy("k").mean()      // frame accessor
  * df.wtSeries("value", "weight_col").corr(...) // series accessor
  * }}}
  *
  * Pure syntax — each method delegates to the `WeightedDataFrame` /
  * `WeightedSeries` constructors, so there is nothing here to test beyond
  * delegation and no runtime cost (value-class extension, no allocation).
  */
package object api {

  implicit class WeightedDataFrameOps(private val df: DataFrame) extends AnyVal {
    /** Weight by a column — `df.wt("w")`. */
    def wt(weights: String, naWeight: Option[Double] = None): WeightedDataFrame =
      WeightedDataFrame.wt(df, weights, naWeight)

    /** Weight by a positional sequence (parity path). */
    def wt(weights: Seq[Double]): WeightedDataFrame =
      WeightedDataFrame.wt(df, weights)

    /** Single-column (Series) view weighted by a column —
      * `df.wtSeries("value", "w", indexCols)`. */
    def wtSeries(
        valueCol: String,
        weights: String,
        indexCols: Seq[String] = Nil,
        naWeight: Option[Double] = None): WeightedSeries =
      WeightedSeries.wt(df, valueCol, weights, indexCols, naWeight)
  }
}
