package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Weighted groupby driver — `/root/reference/src/pandas_weights/frame.py:449-679`.
  *
  * Same moment algebra as the ungrouped aggregations, executed per group by a
  * single `groupBy(keys).agg(...)`: one scan + one shuffle regardless of how
  * many moments an aggregation needs (the reference's `var` runs three
  * independent grouped passes, `frame.py:601-609` — Catalyst fuses ours).
  *
  * `dropna=true` drops null-key rows and `sort=true` orders the result by the
  * keys, matching the pandas groupby defaults (`frame.py:134-159`).
  */
final class WeightedGroupBy private[core] (
    wdf: WeightedDataFrame,
    val keys: Seq[String],
    dropna: Boolean,
    sort: Boolean) {

  require(keys.nonEmpty, "groupBy requires at least one key")

  private def w: Column = wdf.w

  private def nc(c: String): Column = WeightedDataFrame.numericCol(wdf.df, c)

  /** Group keys are excluded from aggregated columns — the reference's
    * `_groupby.exclusions` (`frame.py:485-487,498-500`). */
  private def aggCols: Seq[String] = wdf.valueCols.filterNot(keys.contains)
  private def numericAggCols: Seq[String] = wdf.numericCols.filterNot(keys.contains)

  private def base: DataFrame = {
    val df = wdf.df
    if (dropna) df.where(keys.map(col(_).isNotNull).reduce(_ && _)) else df
  }

  private def run(cols: Seq[String], expr: String => Column): DataFrame = {
    require(cols.nonEmpty,
      s"no aggregable columns: every value column is a group key or non-numeric (keys=$keys)")
    val out = base.groupBy(keys.map(col): _*).agg(expr(cols.head).as(cols.head),
      cols.tail.map(c => expr(c).as(c)): _*)
    if (sort) out.orderBy(keys.map(col): _*) else out
  }

  /** Per-group weighted count, all non-key columns — `frame.py:512-528`. */
  def count(skipna: Boolean = true): DataFrame =
    run(aggCols, c => WeightedMoments.countExpr(col(c), w, skipna))

  /** Per-group weighted sum, numeric columns — `frame.py:534-566`. */
  def sum(minCount: Int = 0): DataFrame =
    run(numericAggCols, c => WeightedMoments.wSum(nc(c), w, minCount))

  /** Per-group weighted mean — `frame.py:568-584`. */
  def mean(skipna: Boolean = true): DataFrame =
    run(numericAggCols, c => WeightedMoments.meanExpr(nc(c), w, skipna))

  /** Per-group weighted variance — `frame.py:586-611`, one pass not three. */
  def variance(ddof: Int = 1, skipna: Boolean = true): DataFrame =
    run(numericAggCols, c => WeightedMoments.varExpr(nc(c), w, ddof, skipna))

  /** Per-group weighted standard deviation — `frame.py:613-628`. */
  def std(ddof: Int = 1, skipna: Boolean = true): DataFrame =
    run(numericAggCols, c => WeightedMoments.stdExpr(nc(c), w, ddof, skipna))

  /** Per-group pairwise weighted Pearson, long format
    * `(keys…, col_x, col_y, corr)` — `frame.py:630-660`. One shuffle total
    * (the reference iterates groups in Python, one pass per group per pair).
    */
  def corr(minPeriods: Int = 1, ddof: Int = 1, method: String = "pearson"): DataFrame = {
    WeightedDataFrame.requirePearson(method)
    val cols = numericAggCols
    val cells = for { x <- cols; y <- cols } yield
      struct(lit(x).as("col_x"), lit(y).as("col_y"),
        WeightedMoments.corrExpr(nc(x), nc(y), w, ddof, minPeriods).as("corr"))
    val agged = base.groupBy(keys.map(col): _*).agg(array(cells: _*).as("cells"))
    val out = agged
      .select(keys.map(col) :+ explode(col("cells")).as("cell"): _*)
      .select(keys.map(col) ++ Seq(col("cell.col_x"), col("cell.col_y"), col("cell.corr")): _*)
    if (sort) out.orderBy((keys :+ "col_x" :+ "col_y").map(col): _*) else out
  }

  /** Project to a sub-groupby (weights retained) — `frame.py:468-477`. */
  def select(cols: String*): WeightedGroupBy =
    new WeightedGroupBy(wdf.select((keys ++ cols).distinct: _*), keys, dropna, sort)

  /** Distinct group keys — `frame.py:479-482`. */
  def groupKeys(): DataFrame = {
    val out = base.select(keys.map(col): _*).distinct()
    if (sort) out.orderBy(keys.map(col): _*) else out
  }

  /** Apply an aggregate-expression builder to each weighted numeric column
    * per group — `frame.py:662-679` (the function sees pre-weighted data).
    * For arbitrary row-set functions use [[iterator]] (driver scale) or
    * `wdf.df.groupByKey(...).flatMapGroups` directly.
    */
  def applyAgg(f: Column => Column): DataFrame =
    run(numericAggCols, c => f(nc(c) * w))

  /** Weighted quantile per group (lower interpolation): smallest value v
    * such that the cumulative weight through v reaches `q`·Σw. Natural
    * extension beyond the reference (its README lists weighted
    * median/quantiles as future work — README.md:311-317). One window pass
    * (cumulative weight within group, ordered by value) + one aggregate;
    * both shuffles hash on the group keys.
    */
  def quantile(valueCol: String, q: Double = 0.5): DataFrame = {
    require(q > 0 && q <= 1, s"quantile must be in (0,1], got $q")
    import org.apache.spark.sql.expressions.Window
    val v = col(valueCol)
    val rows = base.where(v.isNotNull && w.isNotNull)
    val byVal = Window.partitionBy(keys.map(col): _*)
      .orderBy(v, col(wdf.weightName)) // deterministic within ties
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(keys.map(col): _*)
    // functions.sum/min explicitly: this class's own sum/min would shadow
    val cum = rows
      .withColumn("__cw__", org.apache.spark.sql.functions.sum(col(wdf.weightName)).over(byVal))
      .withColumn("__tw__", org.apache.spark.sql.functions.sum(col(wdf.weightName)).over(all))
    val out = cum.where(col("__cw__") >= lit(q) * col("__tw__"))
      .groupBy(keys.map(col): _*)
      .agg(org.apache.spark.sql.functions.min(v).as(valueCol))
    if (sort) out.orderBy(keys.map(col): _*) else out
  }

  /** Distributed arbitrary-function-per-group escape hatch — the scale path
    * for `groupby.apply` with a non-expressible function (`frame.py:662-679`
    * via `Dataset.flatMapGroups`, SURVEY §2.3 G8). The function receives the
    * group key and the iterator of *weighted* rows (numeric columns
    * pre-multiplied by the weight, matching the reference's `_weighted`),
    * in the schema order of `weightedSchema`. Groups never materialize on
    * the driver; each group streams through one executor task.
    */
  def flatMapGroups[K: org.apache.spark.sql.Encoder, T: org.apache.spark.sql.Encoder](
      keyFn: org.apache.spark.sql.Row => K)(
      f: (K, Iterator[org.apache.spark.sql.Row]) => IterableOnce[T]): org.apache.spark.sql.Dataset[T] = {
    val ns = numericAggCols.toSet // keys pass through unweighted (exclusions)
    val weightedRows = base.select(weightedSchema.map { c =>
      if (ns(c)) (nc(c) * w).as(c) else col(c)
    }: _*)
    weightedRows.groupByKey(keyFn).flatMapGroups((k, it) => f(k, it).iterator)
  }

  /** Column order of the rows seen by [[flatMapGroups]]. */
  def weightedSchema: Seq[String] = (keys ++ aggCols).distinct

  /** Driver-side group iteration for API parity with `__iter__`
    * (`frame.py:463-466`): collects the distinct keys, then yields
    * `(key, WeightedDataFrame-of-slice)`. Small-result / test path.
    */
  def iterator(): Iterator[(Seq[Any], WeightedDataFrame)] = {
    val ks = groupKeys().collect().iterator
    ks.map { row =>
      val kvs = keys.zipWithIndex.map { case (k, i) => k -> row.get(i) }
      // <=> not ===: with dropna=false a NULL key group must match its rows
      val cond = kvs.map { case (k, v) => col(k) <=> lit(v) }.reduce(_ && _)
      (kvs.map(_._2), new WeightedDataFrame(wdf.df.where(cond), wdf.weightName))
    }
  }
}
