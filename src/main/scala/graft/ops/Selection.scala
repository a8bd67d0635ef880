package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus curation by ranked selection: keep the best documents per group
  * (domain, language, source) by a quality score — the standard "top-k per
  * domain" and "top p% per language" steps of a training-data pipeline.
  *
  * Both operators are rank filters over a window partitioned by the group
  * columns: one hash shuffle on the group keys, then a per-group sort.
  * For the fixed-k variant Spark ≥3.5 plans a `WindowGroupLimit` — each map
  * task keeps only its local top-k rows per group BEFORE the exchange, so
  * the shuffle carries O(groups × k) rows per task, not the corpus. The
  * fractional variant has a data-dependent threshold, so the full group
  * shuffles (inherent: membership depends on the group's size).
  *
  * `orderCols` extends the score into a total order (unique id last);
  * without it the cut line at equal scores would be partition-order
  * dependent and results nondeterministic.
  */
object Selection {

  private def rankWindow(
      groupCols: Seq[String],
      scoreCol: Column,
      orderCols: Seq[String]) = {
    require(groupCols.nonEmpty, "selection needs group columns")
    require(orderCols.nonEmpty, "selection needs a deterministic tiebreak order")
    Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(scoreCol.desc +: orderCols.map(col(_).asc): _*)
  }

  /** Keep the `k` highest-scoring rows of each group (ties broken by
    * `orderCols` ascending). Adds `rankCol` (1-based within group). */
  def topKPerGroup(
      df: DataFrame,
      groupCols: Seq[String],
      scoreCol: Column,
      k: Int,
      orderCols: Seq[String],
      rankCol: String = "rank"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // row_number + constant-k filter is the shape Catalyst rewrites to
    // WindowGroupLimit (partial per-map-task limit before the exchange)
    df.withColumn(rankCol, row_number().over(rankWindow(groupCols, scoreCol, orderCols)))
      .where(col(rankCol) <= k)
  }

  /** Keep the top `fraction` of each group by score: rows with
    * `row_number ≤ ceil(fraction × group_size)`. Every non-empty group
    * keeps at least one row (ceil), matching the "best document per tiny
    * domain still survives" curation convention. Adds `rankCol`. */
  def keepTopFraction(
      df: DataFrame,
      groupCols: Seq[String],
      scoreCol: Column,
      fraction: Double,
      orderCols: Seq[String],
      rankCol: String = "rank"): DataFrame = {
    require(fraction > 0 && fraction <= 1, s"fraction must be in (0,1], got $fraction")
    val w = rankWindow(groupCols, scoreCol, orderCols)
    val counts = Window.partitionBy(groupCols.map(col): _*)
    df.withColumn(rankCol, row_number().over(w))
      .withColumn("__n__", count(lit(1)).over(counts))
      .where(col(rankCol) <= ceil(col("__n__") * fraction))
      .drop("__n__")
  }
}
