package graft

import graft.core.WeightedDataFrame
import org.apache.spark.sql.DataFrame

/** Ungrouped weighted aggregations — golden values transcribed from
  * /root/reference/tests/test_frame.py and tests/test_series.py.
  */
class WeightedFrameSpec extends SparkSpecBase {
  import spark.implicits._

  private def df = Seq((1L, 4L, 0.5), (2L, 5L, 1.5), (3L, 6L, 2.0)).toDF("A", "B", "weights")

  test("wt by column drops the weight column from values (frame.py:100-104)") {
    val wdf = WeightedDataFrame.wt(df, "weights")
    assert(wdf.valueCols == Seq("A", "B"))
  }

  test("wt by positional array (test_frame.py:24-31)") {
    val wdf = WeightedDataFrame.wt(Seq(1L, 2L, 3L).toDF("A"), Seq(0.5, 1.5, 2.0))
    val got = wdf.weighted().orderBy("A").collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(0.5, 3.0, 6.0))
  }

  test("na_weight fills missing weights (test_frame.py:34-40)") {
    val base = Seq((1L, Some(0.5)), (2L, None: Option[Double]), (3L, Some(2.0))).toDF("A", "weights")
    val wdf = WeightedDataFrame.wt(base, "weights", Some(1.0))
    val got = wdf.weighted().orderBy("A").collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(0.5, 2.0, 6.0))
  }

  test("weighted() multiplies every numeric column (test_frame.py:43-46)") {
    val wdf = WeightedDataFrame.wt(df, "weights")
    val rows = wdf.weighted().orderBy("A").collect()
    assert(rows.map(_.getDouble(0)).toSeq == Seq(0.5, 3.0, 6.0))
    assert(rows.map(_.getDouble(1)).toSeq == Seq(2.0, 7.5, 12.0))
  }

  test("count skipna / noskipna (test_frame.py:56-69)") {
    val nan = Seq((Some(1.0), Some(4.0)), (Some(2.0), None: Option[Double]), (None: Option[Double], Some(6.0)))
      .toDF("A", "B")
    val wdf = WeightedDataFrame.wt(nan, Seq(0.5, 1.5, 2.0))
    val sk = oneRow(wdf.count(skipna = true))
    assert(sk("A").contains(2.0) && sk("B").contains(2.5))
    val nsk = oneRow(wdf.count(skipna = false))
    assert(nsk("A").contains(4.0) && nsk("B").contains(4.0))
  }

  test("sum (test_frame.py:72-77)") {
    val got = oneRow(WeightedDataFrame.wt(df, "weights").sum())
    assert(got("A").contains(9.5) && got("B").contains(21.5))
  }

  test("sum min_count (test_frame.py:80-87)") {
    val d = Seq((Some(1.0), None: Option[Double]), (Some(2.0), None: Option[Double]), (None: Option[Double], None: Option[Double]))
      .toDF("A", "B")
    val wdf = WeightedDataFrame.wt(d, Seq(0.5, 1.5, 2.0))
    val got = oneRow(wdf.sum(minCount = 1))
    assert(got("A").contains(3.5) && got("B").isEmpty)
    val got0 = oneRow(wdf.sum(minCount = 0))
    assert(got0("B").contains(0.0))
  }

  test("mean (test_frame.py:90-95)") {
    val got = oneRow(WeightedDataFrame.wt(df, "weights").mean())
    assert(got("A").contains(2.375) && got("B").contains(5.375))
  }

  test("var / std (test_frame.py:98-111)") {
    val wdf = WeightedDataFrame.wt(df, "weights")
    val v = oneRow(wdf.variance())
    assertApprox(v("A"), Some(0.6458333333333334), 1e-15)
    assertApprox(v("B"), Some(0.6458333333333334), 1e-15)
    val s = oneRow(wdf.std())
    assertApprox(s("A"), Some(0.8036375634160796), 1e-15)
  }

  test("select retains weights (frame.py:111-122)") {
    val wdf = WeightedDataFrame.wt(df, "weights").select("A")
    assert(wdf.valueCols == Seq("A"))
    val got = oneRow(wdf.mean())
    assert(got("A").contains(2.375))
  }

  test("NaN values are normalized to NULL at wt() time (SURVEY §1.2)") {
    val nan = Seq(1.0, Double.NaN, 3.0).toDF("A")
    val wdf = WeightedDataFrame.wt(nan, Seq(1.0, 1.0, 1.0))
    val got = oneRow(wdf.count())
    assert(got("A").contains(2.0))
  }

  test("applyRows applies to pre-weighted data (test_series.py:288-296 add_two)") {
    val s = Seq(10L, 20L, 30L, 40L).toDF("Value")
    val wdf = WeightedDataFrame.wt(s, Seq(1.0, 2.0, 1.5, 2.5))
    val got = wdf.applyRows(c => c + org.apache.spark.sql.functions.lit(2.0))
      .orderBy("Value").collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(12.0, 42.0, 47.0, 102.0))
  }

  test("applyAgg range over weighted data (test_frame.py:247-261)") {
    import org.apache.spark.sql.functions.{max, min}
    val s = Seq(10L, 20L, 30L, 40L).toDF("Value")
    val wdf = WeightedDataFrame.wt(s, Seq(1.0, 2.0, 1.5, 2.5))
    val got = oneRow(wdf.applyAgg(c => max(c) - min(c)))
    assert(got("Value").contains(90.0))
  }

  test("describe: weighted count/mean/std/min/quantiles/max per column") {
    // values 10(w1) 20(w2) 30(w1): W=4, S=80, mean=20, Q=1800,
    // var=(1800-1600)/3, cum weights 1,3,4 → p25=10 (1≥1), p50=20 (3≥2), p75=20 (3≥3)
    val d = Seq((10.0, 1.0), (20.0, 2.0), (30.0, 1.0)).toDF("Value", "w")
    val got = WeightedDataFrame.wt(d, "w").describe().collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getString(0) == "Value")
    assert(r.getDouble(1) == 4.0)                       // count
    assert(r.getDouble(2) == 20.0)                      // mean
    assertApprox(Some(r.getDouble(3)), Some(math.sqrt(200.0 / 3.0)), 1e-12) // std
    assert(r.getDouble(4) == 10.0 && r.getDouble(8) == 30.0) // min, max
    assert(r.getDouble(5) == 10.0)                      // p25
    assert(r.getDouble(6) == 20.0)                      // p50
    assert(r.getDouble(7) == 20.0)                      // p75
  }

  test("describe keeps a column whose values are all null (zero valid rows)") {
    val d = Seq((10.0, Option.empty[Double], 1.0), (20.0, Option.empty[Double], 2.0))
      .toDF("Value", "AllNull", "w")
    val got = WeightedDataFrame.wt(d, "w").describe().collect()
    assert(got.length == 2)
    val byName = got.map(r => r.getString(0) -> r).toMap
    val nullRow = byName("AllNull")
    assert(nullRow.getDouble(1) == 0.0)            // count
    assert(nullRow.isNullAt(2) && nullRow.isNullAt(5) && nullRow.isNullAt(6)) // mean, p25, p50
    assert(byName("Value").getDouble(2) == 50.0 / 3.0) // mean unaffected
  }

  test("api accessor syntax delegates to the constructors (base.py:11-50)") {
    import graft.api._
    val d = Seq((10.0, 1.0), (20.0, 2.0)).toDF("Value", "w")
    assert(oneRow(d.wt("w").mean())("Value").contains(50.0 / 3.0))
    assert(oneRow(d.wt(Seq(1.0, 2.0)).select("Value").mean())("Value").contains(50.0 / 3.0))
    val s = d.wtSeries("Value", "w")
    assert(s.mean().contains(50.0 / 3.0))
  }

  test("applyRowsFn: arbitrary row-wise function over weighted columns (axis=1, frame.py:288-317)") {
    val d = Seq((1L, 10.0, 1.0, 2.0), (2L, 20.0, 3.0, 1.0), (3L, 30.0, 5.0, 0.5))
      .toDF("id", "a", "b", "weights")
    val wdf = WeightedDataFrame.wt(d, "weights")
    // per-row max of the weighted values — not expression-free, but use a
    // genuine closure to exercise the Dataset.map path
    val got = wdf.applyRowsFn(vs => Some(vs.flatten.max), keep = Seq("id"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // weighted rows: (20, 2), (20, 3), (15, 2.5) → max per row
    assert(got == Seq((1L, 20.0), (2L, 20.0), (3L, 15.0)))
    // NULLs surface as None; None result → NULL value
    val dn = Seq((1L, Some(2.0), 1.0), (2L, None: Option[Double], 2.0)).toDF("id", "a", "weights")
    val gotN = WeightedDataFrame.wt(dn, "weights")
      .applyRowsFn(vs => vs.head.map(_ * 10), keep = Seq("id"))
      .orderBy("id").collect()
    assert(gotN(0).getDouble(1) == 20.0 && gotN(1).isNullAt(1))
  }

  test("applyRowsFnExpand: result_type=expand turns list results into columns (frame.py:287-367)") {
    val d = Seq((1L, 10.0, 1.0, 2.0), (2L, 20.0, 3.0, 1.0), (3L, 30.0, 5.0, 0.5))
      .toDF("id", "a", "b", "weights")
    val wdf = WeightedDataFrame.wt(d, "weights")
    val got = wdf.applyRowsFnExpand(
      vs => Seq(Some(vs.flatten.min), Some(vs.flatten.max), Some(vs.flatten.sum)),
      outCols = Seq("rmin", "rmax", "rsum"), keep = Seq("id"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSeq
    // weighted rows: (20,2), (20,3), (15,2.5)
    assert(got == Seq((1L, 2.0, 20.0, 22.0), (2L, 3.0, 20.0, 23.0), (3L, 2.5, 15.0, 17.5)))
    // arity mismatch fails fast like pandas' expand ValueError (at execution:
    // the check lives inside the distributed map)
    val bad = wdf.applyRowsFnExpand(vs => Seq(Some(1.0)), outCols = Seq("x", "y"))
    assertThrows[org.apache.spark.SparkException](bad.collect())
    // NULL propagates: a None element surfaces as a NULL cell
    val dn = Seq((1L, Some(2.0), 1.0), (2L, None: Option[Double], 2.0)).toDF("id", "a", "weights")
    val gotN = WeightedDataFrame.wt(dn, "weights")
      .applyRowsFnExpand(vs => Seq(vs.head, vs.head.map(_ * 10)),
        outCols = Seq("v", "v10"), keep = Seq("id"))
      .orderBy("id").collect()
    assert(gotN(0).getDouble(2) == 20.0 && gotN(1).isNullAt(1) && gotN(1).isNullAt(2))
  }

  test("applyRowsFnBroadcast: result_type=broadcast keeps the original columns (frame.py:287-367)") {
    val d = Seq((1L, 10.0, 1.0, 2.0), (2L, 20.0, 3.0, 1.0), (3L, 30.0, 5.0, 0.5))
      .toDF("id", "a", "b", "weights")
    val wdf = WeightedDataFrame.wt(d, "weights")
    // scalar result → broadcast across every numeric column of the row
    val scal = wdf.applyRowsFnBroadcast(vs => Seq(Some(vs.flatten.max)), keep = Seq("id"))
    assert(scal.columns.toSeq == Seq("id", "a", "b")) // original shape retained
    val got = scal.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 20.0, 20.0), (2L, 20.0, 20.0), (3L, 15.0, 15.0)))
    // element-wise result of the right arity → per-column values
    val elem = wdf.applyRowsFnBroadcast(vs => vs.map(_.map(_ + 1.0)), keep = Seq("id"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(elem == Seq((1L, 21.0, 3.0), (2L, 21.0, 4.0), (3L, 16.0, 3.5)))
    // wrong arity fails fast (pandas raises ValueError on shape mismatch)
    val bad = wdf.applyRowsFnBroadcast(vs => Seq(Some(1.0), Some(2.0), Some(3.0)), keep = Seq("id"))
    assertThrows[org.apache.spark.SparkException](bad.collect())
  }

  test("applyRowsFnLabeled: raw=False analogue passes a labeled row (frame.py:287-367)") {
    val d = Seq((1L, 10.0, 1.0, 2.0), (2L, 20.0, 3.0, 1.0))
      .toDF("id", "a", "b", "weights")
    val wdf = WeightedDataFrame.wt(d, "weights")
    // address columns by name — the Series-label affordance raw=True drops
    val got = wdf.applyRowsFnLabeled(
      row => for { a <- row("a"); b <- row("b") } yield a - b, keep = Seq("id"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((1L, 18.0), (2L, 17.0))) // (20-2), (20-3)
    // label order is numericCols order
    val order = wdf.applyRowsFnLabeled(row => { assert(row.keys.toSeq == Seq("a", "b")); Some(0.0) },
      keep = Seq("id"))
    order.collect()
  }

  test("boolean columns aggregate as 1/0 (select_dtypes number+bool, frame.py:268)") {
    val d = Seq((true, 1.0), (false, 2.0), (true, 3.0)).toDF("b", "weights")
    val wdf = WeightedDataFrame.wt(d, "weights")
    val s = oneRow(wdf.sum())
    assert(s("b").contains(4.0)) // 1*1 + 0*2 + 1*3
    val m = oneRow(wdf.mean())
    assertApprox(m("b"), Some(4.0 / 6.0), 1e-12)
    val grouped = Seq(("A", true, 1.0), ("A", false, 2.0), ("B", true, 3.0))
      .toDF("g", "b", "weights")
    val gm = WeightedDataFrame.wt(grouped, "weights").groupBy("g").mean()
      .collect().map(r => r.getString(0) -> cell(r, 1)).toMap
    assertApprox(gm("A"), Some(1.0 / 3.0), 1e-12)
    assert(gm("B").contains(1.0))
  }

  test("corr(method != pearson) raises (test_frame.py:412-416)") {
    intercept[NotImplementedError] {
      WeightedDataFrame.wt(df, "weights").corr(method = "kendall")
    }
  }

  test("wt with a missing weights column fails fast (frame.py:103 KeyError parity)") {
    val e = intercept[IllegalArgumentException] {
      WeightedDataFrame.wt(df, "nope")
    }
    assert(e.getMessage.contains("nope"))
  }

  test("sum min_count > 1 (generalized pandas min_count)") {
    val d = Seq(Some(1.0), Some(2.0), None: Option[Double]).toDF("A")
    val wdf = WeightedDataFrame.wt(d, Seq(0.5, 1.5, 2.0))
    assert(oneRow(wdf.sum(minCount = 2))("A").contains(3.5)) // 2 valid pairs
    assert(oneRow(wdf.sum(minCount = 3))("A").isEmpty)       // only 2 valid
  }

  // ---- axis=1 (row-wise) named aggs --------------------------------------
  // No reference test exercises axis=1; goldens below were produced by
  // RUNNING the reference package (pandas_weights, frame.py:189-251) on this
  // exact fixture: df = {a:[1,2,NA,4], b:[10,NA,30,40], c:[5,6,7,8]},
  // w = [0.5, 1.5, 2.0, NA].

  private def axisDf = Seq(
    (0L, Some(1.0), Some(10.0), 5.0, Some(0.5)),
    (1L, Some(2.0), None: Option[Double], 6.0, Some(1.5)),
    (2L, None: Option[Double], Some(30.0), 7.0, Some(2.0)),
    (3L, Some(4.0), Some(40.0), 8.0, None: Option[Double])
  ).toDF("id", "a", "b", "c", "weights")

  private def axisCol(d: DataFrame, name: String): Seq[Option[Double]] =
    d.orderBy("id").collect().toSeq.map(r => cell(r, d.columns.indexOf(name)))

  test("count(axis=1) skipna and not (reference run, frame.py:189-213)") {
    val wdf = WeightedDataFrame.wt(axisDf, "weights")
    val sk = axisCol(wdf.count(axis = 1, keep = Seq("id")), "count")
    Seq(1.5, 3.0, 4.0, 0.0).zip(sk).foreach { case (e, g) => assertApprox(g, Some(e)) }
    val nsk = axisCol(wdf.count(axis = 1, skipna = false, keep = Seq("id")), "count")
    Seq(1.5, 4.5, 6.0, 0.0).zip(nsk).foreach { case (e, g) => assertApprox(g, Some(e)) }
  }

  test("sum(axis=1) with min_count (reference run, frame.py:215-220)") {
    val wdf = WeightedDataFrame.wt(axisDf, "weights")
    val s0 = axisCol(wdf.sum(axis = 1, keep = Seq("id")), "sum")
    Seq(8.0, 12.0, 74.0, 0.0).zip(s0).foreach { case (e, g) => assertApprox(g, Some(e)) }
    val mc3 = axisCol(wdf.sum(axis = 1, minCount = 3, keep = Seq("id")), "sum")
    assertApprox(mc3.head, Some(8.0))
    assert(mc3.tail.forall(_.isEmpty)) // rows 1-3 have < 3 valid cells
  }

  test("mean/var/std(axis=1) (reference run, frame.py:222-251)") {
    val wdf = WeightedDataFrame.wt(axisDf, "weights")
    val m = axisCol(wdf.mean(axis = 1, keep = Seq("id")), "mean")
    Seq(Some(16.0 / 3.0), Some(4.0), Some(18.5), None).zip(m).foreach { case (e, g) => assertApprox(g, e) }
    val v = axisCol(wdf.variance(axis = 1, keep = Seq("id")), "var")
    Seq(Some(40.66666666666667), Some(6.0), Some(176.33333333333334), None)
      .zip(v).foreach { case (e, g) => assertApprox(g, e, 1e-12) }
    val v0 = axisCol(wdf.variance(axis = 1, ddof = 0, keep = Seq("id")), "var")
    Seq(Some(13.555555555555557), Some(4.0), Some(132.25), None)
      .zip(v0).foreach { case (e, g) => assertApprox(g, e, 1e-12) }
    val s = axisCol(wdf.std(axis = 1, keep = Seq("id")), "std")
    Seq(Some(6.377042156569664), Some(2.449489742783178), Some(13.279056191361393), None)
      .zip(s).foreach { case (e, g) => assertApprox(g, e, 1e-12) }
  }

  test("axis other than 0/1 raises like pandas (No axis named N)") {
    val wdf = WeightedDataFrame.wt(axisDf, "weights")
    val e = intercept[IllegalArgumentException] { wdf.variance(axis = 2) }
    assert(e.getMessage.contains("No axis named 2"))
    intercept[IllegalArgumentException] { wdf.count(axis = -1) }
    intercept[IllegalArgumentException] { wdf.sum(axis = 3) }
  }

  test("arbitrary-callable frame apply sees the weighted column (test_frame.py:247-261)") {
    val d = Seq((10.0, 1.0), (20.0, 2.0), (30.0, 1.5), (40.0, 2.5))
      .toDF("Value", "weights")
    val got = oneRow(WeightedDataFrame.wt(d, "weights").applyColumns { vs =>
      val xs = vs.flatten // weighted: 10, 40, 45, 100
      Some(xs.max - xs.min)
    })
    assert(got("Value").contains(90.0)) // reference expected_apply_scalar
    // NULLs surface as None to the callable; None result → NULL column
    val dn = Seq((Some(1.0), 1.0), (None: Option[Double], 2.0)).toDF("Value", "weights")
    val gotN = oneRow(WeightedDataFrame.wt(dn, "weights").applyColumns { vs =>
      assert(vs.contains(None) && vs.flatten == Seq(1.0)); None
    })
    assert(gotN("Value").isEmpty)
  }
}
