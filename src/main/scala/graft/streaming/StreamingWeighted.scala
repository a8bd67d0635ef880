package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
