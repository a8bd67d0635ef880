package graft

import graft.core.WeightedSeries

/** Series-accessor goldens — /root/reference/tests/test_series.py. */
class WeightedSeriesSpec extends SparkSpecBase {
  import spark.implicits._

  private def s123 = WeightedSeries.wt(Seq(1L, 2L, 3L).toDF("v"), "v", Seq(0.5, 1.5, 2.0))

  test("series count with NaN (test_series.py:41-51)") {
    val s = WeightedSeries.wt(
      Seq(Some(1.0), Some(2.0), None).toDF("v"), "v", Seq(0.5, 1.5, 2.0))
    assert(s.count(skipna = true).contains(2.0))
    assert(s.count(skipna = false).contains(4.0))
  }

  test("series sum / mean / var / std (test_series.py:53-100)") {
    assert(s123.sum().contains(9.5))
    assert(s123.mean().contains(2.375))
    assertApprox(s123.variance(), Some(0.6458333333333334), 1e-15)
    assertApprox(s123.std(), Some(0.8036375634160796), 1e-14)
  }

  test("series sum min_count (test_series.py:64-71)") {
    val s = WeightedSeries.wt(
      Seq(Some(1.0), Some(2.0), None).toDF("v"), "v", Seq(0.5, 1.5, 2.0))
    assert(s.sum(minCount = 1).contains(3.5))
  }

  test("series corr vs other, aligned (test_series.py:103-110)") {
    val left = Seq((0L, 1.0, 1.0), (1L, 2.0, 2.0), (2L, 3.0, 3.0), (3L, 4.0, 4.0))
      .toDF("idx", "v", "w")
    val other = Seq((0L, 2.0), (1L, 4.0), (2L, 6.0), (3L, 8.0)).toDF("idx", "y")
    val s = WeightedSeries.wt(left, "v", "w", indexCols = Seq("idx"))
    assertApprox(s.corr(other, "y"), Some(1.0), 1e-9)
    intercept[NotImplementedError] { s.corr(other, "y", method = "kendall") }
  }

  test("series groupby via facade (test_series.py:183-231)") {
    val d = Seq(("A", 10L, 1.0), ("A", 20L, 2.0), ("B", 30L, 1.5), ("B", 40L, 2.5))
      .toDF("Group", "v", "w")
    val s = WeightedSeries.wt(d, "v", "w", indexCols = Seq("Group"))
    val mean = s.groupBy("Group").mean().collect()
      .map(r => r.getString(0) -> cell(r, 1)).toMap
    assertApprox(mean("A"), Some(16.666666666666668), 1e-15)
    assert(mean("B").contains(36.25))
  }

  test("series apply add_two (test_series.py:288-296)") {
    val s = WeightedSeries.wt(Seq(10L, 20L, 30L, 40L).toDF("v"), "v", Seq(1.0, 2.0, 1.5, 2.5))
    val got = s.applyRows(c => c + org.apache.spark.sql.functions.lit(2.0))
      .orderBy("v").collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(12.0, 42.0, 47.0, 102.0))
  }

  test("positional weights accept na_weight (series.py:94-95)") {
    val s = WeightedSeries.wt(Seq(1.0, 2.0, 3.0).toDF("v"), "v",
      Seq(0.5, Double.NaN, 2.0), Some(1.0))
    assert(s.sum().contains(0.5 + 2.0 + 6.0)) // NaN weight filled with 1.0
    assert(s.count().contains(3.5))
  }
}
