package graft

import graft.core.{WeightedDataFrame, WeightedRolling}

class RollingCovSpec extends SparkSpecBase {
  import spark.implicits._

  private def df = Seq(
    ("A", 1L, Some(1.0), 1.0), ("A", 2L, Some(2.0), 2.0),
    ("A", 3L, None: Option[Double], 3.0), ("A", 4L, Some(4.0), 4.0),
    ("B", 1L, Some(10.0), 1.0), ("B", 2L, Some(20.0), 1.0)
  ).toDF("k", "i", "v", "w")

  private def collectKI(d: org.apache.spark.sql.DataFrame): Map[(String, Long), Option[Double]] =
    d.collect().map(r => (r.getString(0), r.getLong(1)) -> cell(r, 2)).toMap

  test("ewmMean matches pandas ewm(alpha).mean() for series shorter than memory") {
    // unit weights: pandas ewm(alpha=0.5, adjust=True).mean() on [1,2,3]
    // → [1, (2+0.5)/1.5, (3+1+0.25)/1.75]
    val d = Seq(("A", 1L, Some(1.0), 1.0), ("A", 2L, Some(2.0), 1.0),
      ("A", 3L, Some(3.0), 1.0)).toDF("k", "i", "v", "w")
    val got = collectKI(WeightedRolling.expanding(
      WeightedDataFrame.wt(d, "w"), "i", Seq("k")).ewmMean(0.5, memory = 16))
    assertApprox(got(("A", 1L)), Some(1.0), 1e-12)
    assertApprox(got(("A", 2L)), Some(2.5 / 1.5), 1e-12)
    assertApprox(got(("A", 3L)), Some(4.25 / 1.75), 1e-12)
  }

  test("ewmMean: row weights multiply the decay; nulls hold position (ignore_na=False)") {
    val d = Seq(("A", 1L, Some(4.0), 3.0), ("A", 2L, None: Option[Double], 9.0),
      ("A", 3L, Some(1.0), 2.0)).toDF("k", "i", "v", "w")
    val got = collectKI(WeightedRolling.expanding(
      WeightedDataFrame.wt(d, "w"), "i", Seq("k")).ewmMean(0.5, memory = 16))
    assertApprox(got(("A", 1L)), Some(4.0), 1e-12)
    // t=2: null value → numerator/denominator carry only the β·w(1) term
    assertApprox(got(("A", 2L)), Some(0.5 * 3.0 * 4.0 / (0.5 * 3.0)), 1e-12)
    // t=3: (1·2·1 + β²·3·4) / (1·2 + β²·3)
    assertApprox(got(("A", 3L)), Some((2.0 + 0.25 * 12.0) / (2.0 + 0.75)), 1e-12)
  }

  test("ewmMean invariants: constant series is a fixed point; weights cancel") {
    val const = (1L to 40L).map(i => ("A", i, Some(7.5), 1.0 + (i % 3)))
      .toDF("k", "i", "v", "w")
    val got = collectKI(WeightedRolling.expanding(
      WeightedDataFrame.wt(const, "w"), "i", Seq("k")).ewmMean(0.3, memory = 32))
    got.values.foreach(v => assertApprox(v, Some(7.5), 1e-12))
    // uniform weight scaling w → c·w leaves the mean unchanged
    val a = Seq(("A", 1L, Some(1.0), 2.0), ("A", 2L, Some(5.0), 2.0))
      .toDF("k", "i", "v", "w")
    val b = Seq(("A", 1L, Some(1.0), 6.0), ("A", 2L, Some(5.0), 6.0))
      .toDF("k", "i", "v", "w")
    val ga = collectKI(WeightedRolling.expanding(
      WeightedDataFrame.wt(a, "w"), "i", Seq("k")).ewmMean(0.5))
    val gb = collectKI(WeightedRolling.expanding(
      WeightedDataFrame.wt(b, "w"), "i", Seq("k")).ewmMean(0.5))
    ga.foreach { case (k, v) => assertApprox(gb(k), v, 1e-12) }
  }

  test("ewmMean refuses a rolling frame shorter than its memory") {
    val wdf = WeightedDataFrame.wt(df, "w")
    intercept[IllegalArgumentException] {
      WeightedRolling.rolling(wdf, "i", Seq("k"), 2).ewmMean(0.5, memory = 16)
    }
  }

  test("rolling weighted sum/mean over a 2-row frame") {
    val wdf = WeightedDataFrame.wt(df, "w")
    val roll = WeightedRolling.rolling(wdf, "i", Seq("k"), 2)
    val sums = collectKI(roll.sum())
    assert(sums(("A", 1L)).contains(1.0))       // [1*1]
    assert(sums(("A", 2L)).contains(5.0))       // 1 + 2*2
    assert(sums(("A", 3L)).contains(4.0))       // 2*2 + null → 4
    assert(sums(("A", 4L)).contains(16.0))      // null + 4*4
    assert(sums(("B", 2L)).contains(30.0))
    val means = collectKI(roll.mean())
    assertApprox(means(("A", 2L)), Some(5.0 / 3.0), 1e-12)
    assert(means(("A", 3L)).contains(2.0))      // 4 / w=2 (null value skipped)
    assert(means(("A", 4L)).contains(4.0))
  }

  test("rolling count and std") {
    val wdf = WeightedDataFrame.wt(df, "w")
    val roll = WeightedRolling.rolling(wdf, "i", Seq("k"), 2)
    val cnt = collectKI(roll.count())
    assert(cnt(("A", 2L)).contains(3.0))  // w1 + w2
    assert(cnt(("A", 3L)).contains(2.0))  // null value skipped → only w2
    val cntN = collectKI(roll.count(skipna = false))
    assert(cntN(("A", 3L)).contains(5.0)) // 2 + 3 regardless of null
    // std over frame rows 1-2 of A: values 1(w1), 2(w2): S=5, Q=9, W=3
    // var = (9 - 25/3)/2 = 1/3
    val std = collectKI(roll.std())
    assertApprox(std(("A", 2L)), Some(math.sqrt(1.0 / 3.0)), 1e-12)
  }

  test("expanding weighted mean is cumulative") {
    val wdf = WeightedDataFrame.wt(df, "w")
    val exp = WeightedRolling.expanding(wdf, "i", Seq("k"))
    val means = collectKI(exp.mean())
    // A@4: (1 + 4 + 16) / (1 + 2 + 4)
    assertApprox(means(("A", 4L)), Some(21.0 / 7.0), 1e-12)
  }

  test("rolling without partition keys is refused (no scale path)") {
    val wdf = WeightedDataFrame.wt(df, "w")
    intercept[IllegalArgumentException] {
      WeightedRolling.rolling(wdf, "i", Nil, 2)
    }
  }

  test("weighted covariance matches hand computation and corr relationship") {
    // x,y perfectly linear y=2x with weights → cov/sqrt(varx*vary) = 1
    val d = Seq((1.0, 2.0, 1.0), (2.0, 4.0, 2.0), (3.0, 6.0, 3.0), (4.0, 8.0, 4.0))
      .toDF("x", "y", "w")
    val wdf = WeightedDataFrame.wt(d, "w")
    val cells = wdf.cov().collect().map(r => (r.getString(0), r.getString(1)) -> cell(r, 2)).toMap
    // W=10, Sx=Σwx=30, Sy=60, Sxy=Σwxy=200 → (200−30*60/10)/9 = 20/9
    assertApprox(cells(("x", "y")), Some(20.0 / 9.0), 1e-12)
    assertApprox(cells(("y", "x")), cells(("x", "y")), 0)
    // cov(x,x) = var(x): (100−900/10)/9 = 10/9
    assertApprox(cells(("x", "x")), Some(10.0 / 9.0), 1e-12)
  }
}
