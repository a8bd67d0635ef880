package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.core.WeightedMoments

/** Structured-Streaming variants of the weighted aggregations: the same
  * single-pass moment expressions ([[graft.core.WeightedMoments]]) grouped
  * by an event-time tumbling window with a watermark. The batch and
  * streaming engines share the kernel — weighted mean/var on a stream is
  * the identical Column tree, so Catalyst plans a streaming aggregation
  * with partial aggregation before the shuffle exactly like the batch path.
  */
object StreamingWeighted {

  /** Weighted windowed summary of `valueCol` weighted by `weightCol`,
    * grouped into `windowDuration` tumbling windows on `tsCol` with
    * `watermarkDelay` allowed lateness. Works on both streaming and batch
    * DataFrames (the watermark is a no-op in batch).
    */
  def windowedSummary(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      weightCol: String,
      windowDuration: String = "2 days",
      watermarkDelay: String = "1 hour"): DataFrame = {
    val c: Column = col(valueCol)
    val w: Column = col(weightCol)
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration))
      .agg(
        WeightedMoments.wCount(c, w).as("count_" + valueCol),
        WeightedMoments.wSum(c, w, 0).as("sum_" + valueCol),
        WeightedMoments.meanExpr(c, w).as("mean_" + valueCol),
        WeightedMoments.varExpr(c, w).as("var_" + valueCol))
      .select(col("window.start").as("bucket_start"),
        col("count_" + valueCol), col("sum_" + valueCol),
        col("mean_" + valueCol), col("var_" + valueCol))
  }

  /** Per-key running weighted mean with explicit state
    * (`mapGroupsWithState`): the stateful-streaming analogue of the
    * weighted mean — state is just the two algebraic moments (Σw, Σwx), so
    * it is O(1) per key regardless of stream length, and NULL values/weights
    * are skipped exactly like the batch kernel. Output per trigger:
    * (key, total_weight, running weighted mean).
    */
  def runningWeightedMean(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      weightCol: String): Dataset[(String, Double, Double)] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string"), col(valueCol).cast("double"),
      col(weightCol).cast("double"))
      .as[(String, Option[Double], Option[Double])]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (k: String, it: Iterator[(String, Option[Double], Option[Double])],
         state: GroupState[(Double, Double)]) =>
          var (sw, swx) = state.getOption.getOrElse((0.0, 0.0))
          it.foreach {
            case (_, Some(v), Some(w)) => sw += w; swx += v * w
            case _                     => () // NULL value or weight: skipna
          }
          state.update((sw, swx))
          (k, sw, if (sw != 0.0) swx / sw else Double.NaN)
      }
  }

  /** Per-key running weighted mean AND variance with O(1) state — the
    * three algebraic moments (Σw, Σwx, Σwx²), combined with the identical
    * formula the batch kernel uses
    * (`(Q − S²/W)/(W − ddof)`, [[graft.core.WeightedMoments.varExpr]]).
    * Output per trigger: (key, total_weight, mean, var) — var is NaN while
    * Σw ≤ ddof, matching the batch NULL guard. */
  def runningWeightedVar(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      weightCol: String,
      ddof: Int = 1): Dataset[(String, Double, Double, Double)] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("string"), col(valueCol).cast("double"),
      col(weightCol).cast("double"))
      .as[(String, Option[Double], Option[Double])]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (k: String, it: Iterator[(String, Option[Double], Option[Double])],
         state: GroupState[(Double, Double, Double)]) =>
          var (sw, swx, swxx) = state.getOption.getOrElse((0.0, 0.0, 0.0))
          it.foreach {
            case (_, Some(v), Some(w)) => sw += w; swx += v * w; swxx += v * v * w
            case _                     => () // NULL value or weight: skipna
          }
          state.update((sw, swx, swxx))
          val mean = if (sw != 0.0) swx / sw else Double.NaN
          val varr =
            if (sw > ddof) (swxx - swx * swx / sw) / (sw - ddof) else Double.NaN
          (k, sw, mean, varr)
      }
  }
}
