package graft

import java.sql.Timestamp

import graft.core.{BDayGrid, BMonthEndGrid, BQuarterEndGrid, BusinessRule, CalendarRule, FixedRule, RuleParser, SemiMonthEndGrid, WeeklyRule, WeightedDataFrame}

/** Resample goldens — /root/reference/tests/test_frame.py:305-362 and
  * test_series.py:320-375.
  */
class ResampleSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s + " 00:00:00")

  private def resampleDf = Seq(
    (ts("2024-01-01"), Some(1.0), 1.0),
    (ts("2024-01-02"), Some(2.0), 2.0),
    (ts("2024-01-03"), None: Option[Double], 3.0),
    (ts("2024-01-04"), Some(4.0), 4.0)
  ).toDF("ts", "Value", "weights")

  private def byBucket(df: org.apache.spark.sql.DataFrame): Map[String, Option[Double]] =
    df.collect().map(r => r.getTimestamp(0).toString.take(10) -> cell(r, 1)).toMap

  test("rule parsing") {
    assert(RuleParser.toMicros("2D") == 2L * 86400 * 1000000)
    assert(RuleParser.toMicros("12h") == 12L * 3600 * 1000000)
    assert(RuleParser.toMicros("min") == 60L * 1000000)
    intercept[IllegalArgumentException] { RuleParser.toMicros("M") }
  }

  test("calendar rule parsing is case-sensitive like pandas (MS month-start vs ms millis)") {
    assert(RuleParser.parse("MS") == CalendarRule(1, labelEnd = false, unit = 1))
    assert(RuleParser.parse("M") == CalendarRule(1, labelEnd = true, unit = 1))
    assert(RuleParser.parse("2M") == CalendarRule(2, labelEnd = true, unit = 1))
    assert(RuleParser.parse("Q") == CalendarRule(3, labelEnd = true, unit = 3))
    assert(RuleParser.parse("QS") == CalendarRule(3, labelEnd = false, unit = 3))
    assert(RuleParser.parse("Y") == CalendarRule(12, labelEnd = true, unit = 12))
    assert(RuleParser.parse("ms") == FixedRule(1000L))
    assert(RuleParser.parse("2D") == FixedRule(2L * 86400 * 1000000))
  }

  test("monthly resample bins by calendar month, emits empty months (MS)") {
    val d = Seq(
      (ts("2024-01-05"), Some(1.0), 1.0),
      (ts("2024-01-20"), Some(2.0), 2.0),
      (ts("2024-03-10"), Some(3.0), 1.0) // February empty
    ).toDF("ts", "Value", "weights")
    val r = WeightedDataFrame.wt(d, "weights").resample("ts", "MS")
    val sum = byBucket(r.sum())
    assert(sum == Map("2024-01-01" -> Some(5.0), "2024-02-01" -> Some(0.0),
      "2024-03-01" -> Some(3.0)))
    val mean = byBucket(r.mean())
    assert(mean("2024-02-01").isEmpty) // NaN in pandas
    assertApprox(mean("2024-01-01"), Some(5.0 / 3.0), 1e-15)
  }

  test("month-end labels (M) and quarter/year bins (QS, Y)") {
    val d = Seq(
      (ts("2024-01-05"), Some(1.0), 1.0),
      (ts("2024-02-10"), Some(2.0), 1.0),
      (ts("2024-03-20"), Some(3.0), 1.0)
    ).toDF("ts", "Value", "weights")
    val wdf = WeightedDataFrame.wt(d, "weights")
    val m = byBucket(wdf.resample("ts", "M").sum())
    assert(m.keySet == Set("2024-01-31", "2024-02-29", "2024-03-31")) // leap Feb
    val q = byBucket(wdf.resample("ts", "QS").sum())
    assert(q == Map("2024-01-01" -> Some(6.0)))
    val y = byBucket(wdf.resample("ts", "Y").sum())
    assert(y == Map("2024-12-31" -> Some(6.0)))
  }

  test("M + label=left labels the previous period end (pandas)") {
    val d = Seq(
      (ts("2024-01-05"), Some(1.0), 1.0),
      (ts("2024-02-10"), Some(2.0), 1.0)
    ).toDF("ts", "Value", "weights")
    val wdf = WeightedDataFrame.wt(d, "weights")
    // pandas: df.resample("ME", label="left").sum() labels 2023-12-31 / 2024-01-31
    val got = byBucket(wdf.resample("ts", "M", label = "left").sum())
    assert(got == Map("2023-12-31" -> Some(1.0), "2024-01-31" -> Some(2.0)))
  }

  test("MS + label=right labels the next bin edge (pandas), not period end") {
    val d = Seq(
      (ts("2024-01-05"), Some(1.0), 1.0),
      (ts("2024-02-10"), Some(2.0), 1.0)
    ).toDF("ts", "Value", "weights")
    val wdf = WeightedDataFrame.wt(d, "weights")
    val got = byBucket(wdf.resample("ts", "MS", label = "right").sum())
    // pandas: df.resample("MS", label="right").sum() labels 2024-02-01 / 2024-03-01
    assert(got == Map("2024-02-01" -> Some(1.0), "2024-03-01" -> Some(2.0)))
  }

  test("calendar rules refuse origin/offset; both closeds accepted") {
    val d = Seq((ts("2024-01-05"), Some(1.0), 1.0)).toDF("ts", "Value", "weights")
    val wdf = WeightedDataFrame.wt(d, "weights")
    // pandas silently IGNORES origin/offset for period rules — refuse the
    // silent no-op instead
    intercept[IllegalArgumentException] { wdf.resample("ts", "M", origin = "epoch") }
    intercept[IllegalArgumentException] { wdf.resample("ts", "Q", offset = Some("1D")) }
    // both closeds construct: the non-default one shifts period-edge rows
    // exactly as pandas' midnight bin edges do (differential-fuzz-pinned)
    wdf.resample("ts", "MS", label = "right")
    wdf.resample("ts", "M", label = "left")
    wdf.resample("ts", "M", closed = "right")
    wdf.resample("ts", "QS", closed = "left")
    wdf.resample("ts", "M", closed = "left")
    wdf.resample("ts", "YE", closed = "left")
    wdf.resample("ts", "MS", closed = "right")
  }

  test("lenient=true reproduces pandas' silent origin/offset ignore on period rules") {
    // pandas 2.2.2: s.resample('ME', origin='epoch', offset='3h').sum()
    // equals the no-kwarg run exactly (the non-Tick branch of
    // _get_timestamp_range_edges never reads them) — same for W-anchored
    // and business grids. lenient=true is the explicit compat escape
    // hatch; the default stays the loud refusal (pinned above).
    val d = Seq(
      (ts("2024-01-05"), Some(1.0), 1.0),
      (ts("2024-02-10"), Some(2.0), 1.0),
      (ts("2024-03-20"), Some(3.0), 1.0)
    ).toDF("ts", "Value", "weights")
    val w = WeightedDataFrame.wt(d, "weights")
    assert(byBucket(w.resample("ts", "M", origin = "epoch", offset = Some("3h"),
        lenient = true).sum()) ==
      byBucket(w.resample("ts", "M").sum()))
    assert(byBucket(w.resample("ts", "W-SUN", origin = "end", lenient = true).sum()) ==
      byBucket(w.resample("ts", "W-SUN").sum()))
    assert(byBucket(w.resample("ts", "B", offset = Some("1h"), lenient = true).sum()) ==
      byBucket(w.resample("ts", "B").sum()))
    // lenient does NOT relax anything else: fixed rules still APPLY
    // origin/offset (they're Tick rules in pandas — never ignored)
    assert(byBucket(w.resample("ts", "2D", origin = "epoch", offset = Some("1D"),
        lenient = true).sum()) ==
      byBucket(w.resample("ts", "2D", origin = "epoch", offset = Some("1D")).sum()))
    // and the default remains the loud refusal
    intercept[IllegalArgumentException] {
      w.resample("ts", "M", origin = "epoch")
    }
  }

  test("calendar non-default closed: pandas edge-shift semantics") {
    def tsf(s: String): Timestamp = Timestamp.valueOf(s)
    // pandas 2.2.2 pins (see the derivation in WeightedResampler's
    // calendarShifted): YE closed='left' keeps bin edges at Dec-31
    // MIDNIGHT (no end-of-day adjustment), so every row ON Dec 31 belongs
    // to the NEXT year; MS closed='right' bins (start, next-start], so a
    // row exactly AT month-start midnight drops to the PREVIOUS month —
    // with the leading/trailing empty spine bins pandas' binner emits.
    val d = Seq(
      (tsf("2020-06-15 10:00:00"), Some(1.0), 1.0),
      (tsf("2020-12-30 23:59:59"), Some(2.0), 1.0),
      (tsf("2020-12-31 00:00:00"), Some(3.0), 1.0),
      (tsf("2020-12-31 12:34:56"), Some(4.0), 1.0),
      (tsf("2021-01-01 00:00:00"), Some(5.0), 1.0),
      (tsf("2021-12-31 00:00:01"), Some(6.0), 1.0)
    ).toDF("ts", "Value", "weights")
    val w = WeightedDataFrame.wt(d, "weights")
    // pandas: s.resample("YE", closed="left").sum() → 2020: 3, 2021: 12, 2022: 6
    assert(byBucket(w.resample("ts", "YE", closed = "left").sum()) == Map(
      "2020-12-31" -> Some(3.0), "2021-12-31" -> Some(12.0), "2022-12-31" -> Some(6.0)))
    // label='left' labels the previous period end
    assert(byBucket(w.resample("ts", "YE", closed = "left", label = "left").sum()) == Map(
      "2019-12-31" -> Some(3.0), "2020-12-31" -> Some(12.0), "2021-12-31" -> Some(6.0)))
    // MS closed='right': exact-midnight month starts shift back one month;
    // pandas emits a TRAILING empty bin when max is exactly on an anchor
    val d2 = Seq(
      (tsf("2020-01-01 00:00:00"), Some(1.0), 1.0),
      (tsf("2020-01-15 00:00:00"), Some(2.0), 1.0),
      (tsf("2020-02-01 00:00:00"), Some(4.0), 1.0),
      (tsf("2020-02-01 00:00:01"), Some(8.0), 1.0),
      (tsf("2020-03-31 23:59:00"), Some(16.0), 1.0)
    ).toDF("ts", "Value", "weights")
    val w2 = WeightedDataFrame.wt(d2, "weights")
    // pandas: [2019-12:1, 2020-01:6, 2020-02:8, 2020-03:16]
    assert(byBucket(w2.resample("ts", "MS", closed = "right").sum()) == Map(
      "2019-12-01" -> Some(1.0), "2020-01-01" -> Some(6.0),
      "2020-02-01" -> Some(8.0), "2020-03-01" -> Some(16.0)))
    // trailing empty: max exactly at anchor midnight
    val d3 = Seq((tsf("2020-02-01 00:00:00"), Some(1.0), 1.0)).toDF("ts", "Value", "weights")
    assert(byBucket(WeightedDataFrame.wt(d3, "weights")
      .resample("ts", "MS", closed = "right").sum()) == Map(
      "2020-01-01" -> Some(1.0), "2020-02-01" -> Some(0.0)))
    // leading empty: min just past an anchor midnight
    val d4 = Seq(
      (tsf("2020-02-01 00:00:01"), Some(1.0), 1.0),
      (tsf("2020-03-15 00:00:00"), Some(2.0), 1.0)
    ).toDF("ts", "Value", "weights")
    assert(byBucket(WeightedDataFrame.wt(d4, "weights")
      .resample("ts", "MS", closed = "right").sum()) == Map(
      "2020-01-01" -> Some(0.0), "2020-02-01" -> Some(1.0), "2020-03-01" -> Some(2.0)))
  }

  test("resample 2D sum/count/mean (test_frame.py:305-338)") {
    val r = WeightedDataFrame.wt(resampleDf, "weights").resample("ts", "2D")
    val sum = byBucket(r.sum())
    assert(sum("2024-01-01").contains(5.0) && sum("2024-01-03").contains(16.0))
    val cnt = byBucket(r.count())
    assert(cnt("2024-01-01").contains(3.0) && cnt("2024-01-03").contains(4.0))
    val cntN = byBucket(r.count(skipna = false))
    assert(cntN("2024-01-01").contains(3.0) && cntN("2024-01-03").contains(7.0))
    val mean = byBucket(r.mean())
    assertApprox(mean("2024-01-01"), Some(5.0 / 3.0), 1e-15)
    assert(mean("2024-01-03").contains(4.0))
  }

  test("resample 2D var/std (test_frame.py:341-362)") {
    val r = WeightedDataFrame.wt(resampleDf, "weights").resample("ts", "2D")
    val v = byBucket(r.variance())
    assertApprox(v("2024-01-01"), Some(1.0 / 3.0), 1e-12)
    assertApprox(v("2024-01-03"), Some(0.0), 1e-12)
    val s = byBucket(r.std())
    assertApprox(s("2024-01-01"), Some(math.sqrt(1.0 / 3.0)), 1e-12)
  }

  test("empty buckets are emitted (pandas spine — tests/test_frame.py:316-331)") {
    val gap = Seq(
      (ts("2024-01-01"), Some(1.0), 1.0),
      (ts("2024-01-07"), Some(2.0), 1.0)
    ).toDF("ts", "Value", "weights")
    val r = WeightedDataFrame.wt(gap, "weights").resample("ts", "2D")
    val cnt = byBucket(r.count())
    assert(cnt.size == 4) // 01-01, 01-03, 01-05, 01-07
    assert(cnt("2024-01-03").contains(0.0))
    assert(cnt("2024-01-05").contains(0.0))
    val sum = byBucket(r.sum())
    assert(sum("2024-01-03").contains(0.0))
    val mean = byBucket(r.mean())
    assert(mean("2024-01-03").isEmpty) // NaN in pandas
  }

  test("origin=start_day anchors buckets at midnight of first day (frame.py:168)") {
    val d = Seq(
      (Timestamp.valueOf("2024-01-01 13:00:00"), Some(1.0), 1.0),
      (Timestamp.valueOf("2024-01-02 01:00:00"), Some(2.0), 1.0)
    ).toDF("ts", "Value", "weights")
    val r = WeightedDataFrame.wt(d, "weights").resample("ts", "1D")
    val cnt = byBucket(r.count())
    assert(cnt.keySet == Set("2024-01-01", "2024-01-02"))
  }

  test("offset shifts the bucket grid (frame.py:169, pandas offset kwarg)") {
    val d = Seq(
      (ts("2024-01-01"), Some(1.0), 1.0),
      (ts("2024-01-02"), Some(2.0), 1.0),
      (ts("2024-01-03"), Some(3.0), 1.0),
      (ts("2024-01-04"), Some(4.0), 1.0)
    ).toDF("ts", "Value", "weights")
    val r = WeightedDataFrame.wt(d, "weights")
      .resample("ts", "2D", offset = Some("1D"))
    val sum = byBucket(r.sum())
    // grid anchored at start_day + 1D: buckets 12-31, 01-02, 01-04
    assert(sum == Map("2023-12-31" -> Some(1.0), "2024-01-02" -> Some(5.0), "2024-01-04" -> Some(4.0)))
  }

  test("explicit timestamp origin anchors the grid") {
    val d = Seq(
      (ts("2024-01-01"), Some(1.0), 1.0),
      (ts("2024-01-02"), Some(2.0), 1.0),
      (ts("2024-01-03"), Some(3.0), 1.0)
    ).toDF("ts", "Value", "weights")
    val r = WeightedDataFrame.wt(d, "weights")
      .resample("ts", "2D", origin = "2024-01-02 00:00:00")
    val sum = byBucket(r.sum())
    assert(sum == Map("2023-12-31" -> Some(1.0), "2024-01-02" -> Some(5.0)))
  }

  test("closed=right / label=right boundary conventions") {
    val d = Seq(
      (Timestamp.valueOf("2024-01-01 00:00:00"), Some(1.0), 1.0),
      (Timestamp.valueOf("2024-01-02 00:00:00"), Some(2.0), 1.0)
    ).toDF("ts", "Value", "weights")
    // closed=left: both days in their own bucket
    val left = byBucket(WeightedDataFrame.wt(d, "weights").resample("ts", "1D").sum())
    assert(left("2024-01-01").contains(1.0) && left("2024-01-02").contains(2.0))
    // closed=right: a point exactly on the boundary belongs to the bucket
    // ENDING there: 01-02 00:00 → bucket (01-01, 01-02]; label=right shows the end.
    val right = WeightedDataFrame.wt(d, "weights")
      .resample("ts", "1D", closed = "right", label = "right").sum()
    val m = byBucket(right)
    assert(m("2024-01-01").contains(1.0)) // (12-31, 01-01] labeled 01-01
    assert(m("2024-01-02").contains(2.0))
  }

  test("weekly rule parsing: W anchors to Sunday, W-<day> to that day, multiples kept") {
    assert(RuleParser.parse("W") == WeeklyRule(6))
    assert(RuleParser.parse("w") == WeeklyRule(6)) // pandas to_offset("w") = Week(SUN)
    assert(RuleParser.parse("W-MON") == WeeklyRule(0))
    assert(RuleParser.parse("W-WED") == WeeklyRule(2))
    assert(RuleParser.parse("2W") == WeeklyRule(6, 2))
    assert(RuleParser.parse("2W-MON") == WeeklyRule(0, 2))
    assert(RuleParser.parse("3W-FRI") == WeeklyRule(4, 3))
    intercept[IllegalArgumentException] { RuleParser.parse("W-XXX") }
    intercept[IllegalArgumentException] { RuleParser.toMicros("W") }
  }

  test("multi-week anchored rules phase the grid from the data start (pandas goldens)") {
    // pandas 2.x goldens (generated from this exact fixture):
    //   s.resample(rule, ...).sum() — min 2024-01-03 (Wed), max 2024-02-20
    val d = Seq(
      (Timestamp.valueOf("2024-01-03 10:00:00"), Some(1.0), 1.0),
      (Timestamp.valueOf("2024-01-08 00:00:00"), Some(2.0), 1.0),
      (Timestamp.valueOf("2024-01-09 05:30:00"), Some(3.0), 1.0),
      (Timestamp.valueOf("2024-01-15 23:59:00"), Some(4.0), 1.0),
      (Timestamp.valueOf("2024-01-22 00:00:00"), Some(5.0), 1.0),
      (Timestamp.valueOf("2024-02-05 12:00:00"), Some(6.0), 1.0),
      (Timestamp.valueOf("2024-02-20 07:00:00"), Some(7.0), 1.0)
    ).toDF("ts", "Value", "weights")
    val w = WeightedDataFrame.wt(d, "weights")
    // default closed=right: grid from rollforward(min)−2w; includes an
    // EMPTY mid-span bin (2024-02-19) and a Mon-00:00 edge row (Jan 22)
    assert(byBucket(w.resample("ts", "2W-MON").sum()) == Map(
      "2024-01-08" -> Some(3.0), "2024-01-22" -> Some(12.0),
      "2024-02-05" -> Some(6.0), "2024-02-19" -> Some(0.0),
      "2024-03-04" -> Some(7.0)))
    assert(byBucket(w.resample("ts", "2W-MON", closed = "left").sum()) == Map(
      "2024-01-15" -> Some(6.0), "2024-01-29" -> Some(9.0),
      "2024-02-12" -> Some(6.0), "2024-02-26" -> Some(7.0)))
    assert(byBucket(w.resample("ts", "2W-MON", closed = "right", label = "left").sum()) == Map(
      "2023-12-25" -> Some(3.0), "2024-01-08" -> Some(12.0),
      "2024-01-22" -> Some(6.0), "2024-02-05" -> Some(0.0),
      "2024-02-19" -> Some(7.0)))
    assert(byBucket(w.resample("ts", "3W-FRI").sum()) == Map(
      "2024-01-05" -> Some(1.0), "2024-01-26" -> Some(14.0),
      "2024-02-16" -> Some(6.0), "2024-03-08" -> Some(7.0)))
    assert(byBucket(w.resample("ts", "2W").sum()) == Map(
      "2024-01-07" -> Some(1.0), "2024-01-21" -> Some(9.0),
      "2024-02-04" -> Some(5.0), "2024-02-18" -> Some(6.0),
      "2024-03-03" -> Some(7.0)))
  }

  test("multi-week rules refuse `by` (data-start grid phase is per-group)") {
    val d = resampleDf.withColumn("k", org.apache.spark.sql.functions.lit("a"))
    val w = WeightedDataFrame.wt(d, "weights")
    intercept[IllegalArgumentException] {
      w.resample("ts", "2W-MON", by = Seq("k")).sum()
    }
    // single-week stays absolutely anchored and composes with by
    w.resample("ts", "W-MON", by = Seq("k")).sum().collect()
  }

  test("W bins end on Sunday with right label (pandas default)") {
    // 2024-01-01 is a Monday, 2024-01-07 a Sunday. pandas:
    //   Jan 1 (Mon), Jan 7 (Sun) -> week labeled 2024-01-07
    //   Jan 8 (Mon)              -> week labeled 2024-01-14
    val d = Seq(
      (ts("2024-01-01"), Some(1.0), 1.0),
      (ts("2024-01-07"), Some(2.0), 2.0),
      (ts("2024-01-08"), Some(4.0), 1.0)
    ).toDF("ts", "Value", "weights")
    val sum = byBucket(WeightedDataFrame.wt(d, "weights").resample("ts", "W").sum())
    assert(sum == Map("2024-01-07" -> Some(5.0), "2024-01-14" -> Some(4.0)))
    // label=left labels the PREVIOUS anchor day (pandas W, label="left")
    val leftLab = byBucket(WeightedDataFrame.wt(d, "weights")
      .resample("ts", "W", label = "left").sum())
    assert(leftLab == Map("2023-12-31" -> Some(5.0), "2024-01-07" -> Some(4.0)))
  }

  test("W-WED anchors the week end to Wednesday") {
    // 2024-01-03 is a Wednesday: Jan 1 (Mon) -> week ending Jan 3;
    // Jan 4 (Thu) -> week ending Jan 10
    val d = Seq(
      (ts("2024-01-01"), Some(1.0), 1.0),
      (ts("2024-01-04"), Some(2.0), 1.0)
    ).toDF("ts", "Value", "weights")
    val sum = byBucket(WeightedDataFrame.wt(d, "weights").resample("ts", "W-WED").sum())
    assert(sum == Map("2024-01-03" -> Some(1.0), "2024-01-10" -> Some(2.0)))
  }

  test("W closed=left bins start ON the anchor day (next-edge right label)") {
    // closed=left: [Sun, next Sun), default label stays right = the next
    // Sunday edge. Jan 7 (Sun) -> [Jan 7, Jan 14) labeled Jan 14;
    // Jan 1 (Mon) -> [Dec 31, Jan 7) labeled Jan 7.
    val d = Seq(
      (ts("2024-01-01"), Some(1.0), 1.0),
      (ts("2024-01-07"), Some(2.0), 1.0)
    ).toDF("ts", "Value", "weights")
    val sum = byBucket(WeightedDataFrame.wt(d, "weights")
      .resample("ts", "W", closed = "left").sum())
    assert(sum == Map("2024-01-07" -> Some(1.0), "2024-01-14" -> Some(2.0)))
  }

  test("weekly rules refuse origin/offset (anchored to their weekday)") {
    val w = WeightedDataFrame.wt(resampleDf, "weights")
    intercept[IllegalArgumentException] { w.resample("ts", "W", origin = "epoch").sum() }
    intercept[IllegalArgumentException] { w.resample("ts", "W", offset = Some("1h")).sum() }
  }

  test("origin=start anchors at the first timestamp un-truncated") {
    val d = Seq(
      (Timestamp.valueOf("2024-01-01 10:00:00"), Some(1.0), 1.0),
      (Timestamp.valueOf("2024-01-02 09:00:00"), Some(2.0), 1.0),
      (Timestamp.valueOf("2024-01-02 11:00:00"), Some(4.0), 1.0)
    ).toDF("ts", "Value", "weights")
    val sum = WeightedDataFrame.wt(d, "weights")
      .resample("ts", "1D", origin = "start").sum()
      .collect().map(r => r.getTimestamp(0).toString -> cell(r, 1)).toMap
    // bins [Jan 1 10:00, Jan 2 10:00), [Jan 2 10:00, Jan 3 10:00)
    assert(sum == Map("2024-01-01 10:00:00.0" -> Some(3.0),
      "2024-01-02 10:00:00.0" -> Some(4.0)))
  }

  test("origin=end anchors at the last timestamp; closed/label default right") {
    // max ts = Jan 4; 2D bins counting back: (Dec 31, Jan 2], (Jan 2, Jan 4]
    val sum = byBucket(WeightedDataFrame.wt(resampleDf, "weights")
      .resample("ts", "2D", origin = "end").sum())
    assert(sum == Map("2024-01-02" -> Some(5.0), "2024-01-04" -> Some(16.0)))
  }

  test("origin=end_day anchors at the ceiling midnight of the last day") {
    val d = Seq(
      (Timestamp.valueOf("2024-01-03 09:00:00"), Some(1.0), 1.0),
      (Timestamp.valueOf("2024-01-04 10:00:00"), Some(2.0), 1.0)
    ).toDF("ts", "Value", "weights")
    // ceil(Jan 4 10:00) = Jan 5 00:00; 1D bins: (Jan 2, Jan 3]... (Jan 4, Jan 5]
    val sum = byBucket(WeightedDataFrame.wt(d, "weights")
      .resample("ts", "1D", origin = "end_day").sum())
    assert(sum == Map("2024-01-04" -> Some(1.0), "2024-01-05" -> Some(2.0)))
  }

  test("origin=end on-edge minimum joins the FIRST bin (pandas generate_bins)") {
    // span ≡ −offset (mod rule): rule=10s offset=4s, span=16s → 16%10 = 6 =
    // (−4)%10, so the computed first binner edge == min(ts). pandas 2.2.2
    // keys that on-edge row into the first bin — generate_bins' first edge
    // is inclusive — NOT a leading extra bin (differential-verified).
    val d = Seq(
      (Timestamp.valueOf("2024-01-01 00:00:00"), Some(1.0), 1.0),
      (Timestamp.valueOf("2024-01-01 00:00:07"), Some(2.0), 1.0),
      (Timestamp.valueOf("2024-01-01 00:00:16"), Some(4.0), 1.0)
    ).toDF("ts", "Value", "weights")
    val sum = WeightedDataFrame.wt(d, "weights")
      .resample("ts", "10s", origin = "end", offset = Some("4s")).sum()
      .collect().map(r => r.getTimestamp(0).toString -> cell(r, 1)).toMap
    assert(sum == Map("2024-01-01 00:00:10.0" -> Some(3.0),
      "2024-01-01 00:00:20.0" -> Some(4.0)))
  }

  test("origin=end strict overshoot raises like pandas; lenient clamps into the first bin") {
    // span%rule=7 > (−offset)%rule=6 → first edge lands strictly after
    // min(ts); pandas raises 'Values falls before first bin'. Default is
    // the same error (at execution time — min(ts) is data, not plan);
    // lenient=true opts into the clamp for pipelines that'd rather bin
    // than fail mid-job.
    val d = Seq(
      (Timestamp.valueOf("2024-01-01 00:00:00"), Some(1.0), 1.0),
      (Timestamp.valueOf("2024-01-01 00:00:02"), Some(2.0), 1.0),
      (Timestamp.valueOf("2024-01-01 00:00:17"), Some(4.0), 1.0)
    ).toDF("ts", "Value", "weights")
    val err = intercept[Exception] {
      WeightedDataFrame.wt(d, "weights")
        .resample("ts", "10s", origin = "end", offset = Some("4s")).sum().collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(err).exists(_.contains("values falls before first bin")), err.toString)
    val sum = WeightedDataFrame.wt(d, "weights")
      .resample("ts", "10s", origin = "end", offset = Some("4s"), lenient = true).sum()
      .collect().map(r => r.getTimestamp(0).toString -> cell(r, 1)).toMap
    assert(sum == Map("2024-01-01 00:00:11.0" -> Some(3.0),
      "2024-01-01 00:00:21.0" -> Some(4.0)))
  }

  test("origin=end anchor arithmetic stays exact beyond 2^53 µs spans") {
    // a ~324-year span (~1.02e16 µs) overflows Double's 53-bit mantissa:
    // a Long/Long Column division evaluates in Double and can round the
    // bin count, shifting the spine anchor by whole rules. The
    // pure-integer (min + span mod rule) form must key both rows exactly.
    // Rule 30D keeps the empty-bin spine tractable (~3.9k bins).
    val d = Seq(
      (Timestamp.valueOf("1700-01-01 00:00:07"), Some(1.0), 1.0),
      (Timestamp.valueOf("2024-01-01 00:00:03"), Some(2.0), 1.0)
    ).toDF("ts", "Value", "weights")
    val r = WeightedDataFrame.wt(d, "weights")
      .resample("ts", "30D", origin = "end").sum()
    val nonEmpty = r.where(org.apache.spark.sql.functions.expr("Value > 0"))
      .collect().map(_.getTimestamp(0).toString)
    assert(nonEmpty.length == 2, s"expected both rows binned: ${nonEmpty.mkString(",")}")
    // right-closed grid counts back from max: the last label is max itself
    assert(nonEmpty.contains("2024-01-01 00:00:03.0"), nonEmpty.mkString(","))
    // the min row's label sits on the same exact-µs 30D grid: span mod 30D
    // computed in exact Long arithmetic here must match the engine's
    val ruleUs = 30L * 86400L * 1000000L
    val maxUs = Timestamp.valueOf("2024-01-01 00:00:03").getTime * 1000L
    val minUs = Timestamp.valueOf("1700-01-01 00:00:07").getTime * 1000L
    val minLabelUs = minUs + java.lang.Math.floorMod(maxUs - minUs, ruleUs)
    val expMinLabel = new Timestamp(minLabelUs / 1000L).toString
    assert(nonEmpty.contains(expMinLabel), s"want $expMinLabel in ${nonEmpty.mkString(",")}")
  }

  test("unknown origin alias is rejected loudly") {
    val w = WeightedDataFrame.wt(resampleDf, "weights")
    intercept[IllegalArgumentException] { w.resample("ts", "1D", origin = "bogus").sum() }
  }

  test("grouped resample: per-group spine, keys out of the agg columns") {
    val d = Seq(
      ("a", Timestamp.valueOf("2024-01-01 00:00:00"), Some(1.0), 1.0),
      ("a", Timestamp.valueOf("2024-01-05 00:00:00"), Some(2.0), 1.0),
      ("b", Timestamp.valueOf("2024-01-03 00:00:00"), Some(10.0), 2.0)
    ).toDF("k", "ts", "value", "weights")
    val r = WeightedDataFrame.wt(d, "weights")
      .resample("ts", "1D", origin = "epoch", by = Seq("k")).sum()
    val rows = r.collect().map(x =>
      (x.getString(0), x.getTimestamp(1).toString.take(10), cell(x, 2)))
    // group a spans Jan 1..5 with empty buckets filled; group b is a
    // single-day spine — no bleed of b's range into a or vice versa
    assert(rows.count(_._1 == "a") == 5)
    assert(rows.count(_._1 == "b") == 1)
    assert(rows.contains(("a", "2024-01-03", Some(0.0)))) // a's empty bucket
    assert(rows.contains(("b", "2024-01-03", Some(20.0)))) // 10.0 × w=2
    // the key column must not appear among aggregated value columns
    assert(r.columns.toSeq == Seq("k", "ts", "value"))
  }

  test("grouped resample refuses data-derived origins and key collisions") {
    val d = Seq(("a", Timestamp.valueOf("2024-01-01 00:00:00"), Some(1.0), 1.0))
      .toDF("k", "ts", "value", "weights")
    val w = WeightedDataFrame.wt(d, "weights")
    intercept[IllegalArgumentException] {
      w.resample("ts", "1D", origin = "start", by = Seq("k"))
    }
    // the DEFAULT origin (start_day) is data-derived too — refused under by
    intercept[IllegalArgumentException] {
      w.resample("ts", "1D", by = Seq("k"))
    }
    intercept[IllegalArgumentException] {
      w.resample("ts", "1D", by = Seq("ts"))
    }
    intercept[IllegalArgumentException] {
      w.resample("ts", "1D", by = Seq("nope"))
    }
    // absolutely anchored rules compose with by under the default origin
    w.resample("ts", "MS", by = Seq("k")).sum()
    w.resample("ts", "W", by = Seq("k")).sum()
  }

  test("ScalaCheck: grouped resample ≡ ungrouped resample of each group's slice") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genRow = for {
      k <- Gen.oneOf("a", "b", "c")
      day <- Gen.choose(0, 20)
      hour <- Gen.choose(0, 23)
      v <- Gen.oneOf(Gen.const(Option.empty[Double]), Gen.choose(-50.0, 50.0).map(Some(_)))
      w <- Gen.choose(1, 5)
    } yield (k, Timestamp.valueOf(f"2024-01-${day + 1}%02d $hour%02d:00:00"), v, w.toDouble)
    val genCase = for {
      n <- Gen.choose(3, 25)
      rows <- Gen.listOfN(n, genRow)
      rule <- Gen.oneOf("1D", "2D", "3D", "12H")
    } yield (rows, rule)

    def collect(df: org.apache.spark.sql.DataFrame, grouped: Boolean): Map[(String, String), Option[Double]] =
      df.collect().map { r =>
        if (grouped) (r.getString(0), r.getTimestamp(1).toString) -> cell(r, 2)
        else ("", r.getTimestamp(0).toString) -> cell(r, 1)
      }.toMap

    val prop = Prop.forAll(genCase) { case (rows, rule) =>
      val df = rows.toDF("k", "ts", "value", "weights")
      val wdf = WeightedDataFrame.wt(df, "weights")
      val grouped = collect(
        wdf.resample("ts", rule, origin = "epoch", by = Seq("k")).mean(), grouped = true)
      val sliced = rows.map(_._1).distinct.sorted.flatMap { key =>
        val slice = WeightedDataFrame.wt(df.where(df("k") === key).drop("k"), "weights")
        collect(slice.resample("ts", rule, origin = "epoch").mean(), grouped = false)
          .map { case ((_, b), v) => (key, b) -> v }
      }.toMap
      if (grouped != sliced)
        println(s"grouped-resample FALSIFIED: rule=$rule rows=$rows\n got=$grouped\nwant=$sliced")
      grouped == sliced
    }
    val result = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(10)
        .withInitialSeed(org.scalacheck.rng.Seed(20260813L)),
      prop)
    assert(result.passed, s"ScalaCheck: $result")
  }

  // ── Business-calendar grids (B / BME / SME / BQE) ─────────────────────
  // pandas 2.2.2 goldens generated from this exact fixture by
  // tools/bizgrid_goldens.py: midnight edges, weekend timestamps, a leap
  // month-end, quarter ends, 15ths, sub-day times. Weights are all 1 so
  // the weighted sum equals pandas' plain resample(...).sum().
  private def bizDf = Seq(
    (Timestamp.valueOf("2023-12-29 00:00:00"), Some(1.0), 1.0), // Fri BME/BQE day, midnight
    (Timestamp.valueOf("2023-12-31 15:00:00"), Some(2.0), 1.0), // Sun, month/quarter end day
    (Timestamp.valueOf("2024-01-02 10:30:00"), Some(3.0), 1.0), // Tue
    (Timestamp.valueOf("2024-01-15 00:00:00"), Some(4.0), 1.0), // Mon the 15th, midnight
    (Timestamp.valueOf("2024-01-20 08:00:00"), Some(5.0), 1.0), // Sat
    (Timestamp.valueOf("2024-01-31 23:59:59"), Some(6.0), 1.0), // Wed month-end, end of day
    (Timestamp.valueOf("2024-02-15 12:00:00"), Some(7.0), 1.0), // Thu the 15th
    (Timestamp.valueOf("2024-02-29 00:00:00"), Some(8.0), 1.0), // leap-day Thu BME day, midnight
    (Timestamp.valueOf("2024-03-29 17:45:00"), Some(9.0), 1.0), // Fri BME/BQE day
    (Timestamp.valueOf("2024-04-01 00:00:00"), Some(10.0), 1.0) // Mon quarter start, midnight
  ).toDF("ts", "Value", "weights")
  private def bizW = WeightedDataFrame.wt(bizDf, "weights")

  /** Non-zero buckets + total spine size — the B spines have ~67 mostly-
    * empty weekday bins, so assert the full spine by its zero/non-zero
    * decomposition instead of a 67-entry literal. */
  private def nonZero(df: org.apache.spark.sql.DataFrame): (Map[String, Option[Double]], Int) = {
    val m = byBucket(df)
    (m.filter(_._2 != Some(0.0)), m.size)
  }

  test("business alias parsing (B/BM/BME/SM/SME/BQ/BQE; n>1 refused)") {
    assert(RuleParser.parse("B") == BusinessRule(BDayGrid))
    assert(RuleParser.parse("BM") == BusinessRule(BMonthEndGrid))
    assert(RuleParser.parse("BME") == BusinessRule(BMonthEndGrid))
    assert(RuleParser.parse("SM") == BusinessRule(SemiMonthEndGrid))
    assert(RuleParser.parse("SME") == BusinessRule(SemiMonthEndGrid))
    assert(RuleParser.parse("BQ") == BusinessRule(BQuarterEndGrid))
    assert(RuleParser.parse("BQE") == BusinessRule(BQuarterEndGrid))
    intercept[IllegalArgumentException] { RuleParser.parse("2B") }
    intercept[IllegalArgumentException] { RuleParser.parse("3BME") }
    intercept[IllegalArgumentException] { RuleParser.toMicros("B") }
  }

  test("business rules refuse origin/offset (anchored to the calendar grid)") {
    intercept[IllegalArgumentException] { bizW.resample("ts", "B", origin = "epoch").sum() }
    intercept[IllegalArgumentException] { bizW.resample("ts", "BME", offset = Some("1h")).sum() }
  }

  test("B bins to weekdays, weekend rows roll into Friday's bin (pandas goldens)") {
    // default closed=left label=left; Sun Dec 31 → Fri Dec 29 bin, Sat
    // Jan 20 → Fri Jan 19 bin; spine emits every weekday Dec 29..Apr 1
    val (nz, n) = nonZero(bizW.resample("ts", "B").sum())
    assert(n == 67)
    assert(nz == Map(
      "2023-12-29" -> Some(3.0), "2024-01-02" -> Some(3.0),
      "2024-01-15" -> Some(4.0), "2024-01-19" -> Some(5.0),
      "2024-01-31" -> Some(6.0), "2024-02-15" -> Some(7.0),
      "2024-02-29" -> Some(8.0), "2024-03-29" -> Some(9.0),
      "2024-04-01" -> Some(10.0)))
    // label=right labels each bin with the NEXT weekday
    val (nzR, nR) = nonZero(bizW.resample("ts", "B", label = "right").sum())
    assert(nR == 67)
    assert(nzR == Map(
      "2024-01-01" -> Some(3.0), "2024-01-03" -> Some(3.0),
      "2024-01-16" -> Some(4.0), "2024-01-22" -> Some(5.0),
      "2024-02-01" -> Some(6.0), "2024-02-16" -> Some(7.0),
      "2024-03-01" -> Some(8.0), "2024-04-01" -> Some(9.0),
      "2024-04-02" -> Some(10.0)))
  }

  test("B closed=right phases the spine from the data edges (pandas goldens)") {
    // midnight rows sit ON their edge (Dec 29 00:00 ∈ (Dec 28, Dec 29]);
    // the spine gains pandas' leading (Dec 28) and trailing (Apr 1) bins
    val (nz, n) = nonZero(bizW.resample("ts", "B", closed = "right").sum())
    assert(n == 68)
    assert(nz == Map(
      "2023-12-28" -> Some(1.0), "2023-12-29" -> Some(2.0),
      "2024-01-02" -> Some(3.0), "2024-01-12" -> Some(4.0),
      "2024-01-19" -> Some(5.0), "2024-01-31" -> Some(6.0),
      "2024-02-15" -> Some(7.0), "2024-02-28" -> Some(8.0),
      "2024-03-29" -> Some(19.0)))
    // the trailing bin (Apr 1, Apr 2] is emitted empty (max is exactly at
    // the Apr 1 edge midnight) — pandas' `last.normalize() + freq` phase
    val all = byBucket(bizW.resample("ts", "B", closed = "right").sum())
    assert(all("2024-04-01") == Some(0.0))
    val (nzRR, nRR) = nonZero(bizW.resample("ts", "B", closed = "right", label = "right").sum())
    assert(nRR == 68)
    assert(nzRR == Map(
      "2023-12-29" -> Some(1.0), "2024-01-01" -> Some(2.0),
      "2024-01-03" -> Some(3.0), "2024-01-15" -> Some(4.0),
      "2024-01-22" -> Some(5.0), "2024-02-01" -> Some(6.0),
      "2024-02-16" -> Some(7.0), "2024-02-29" -> Some(8.0),
      "2024-04-01" -> Some(19.0)))
  }

  test("B/SME closed=right leading empty bin when min is off the edge (pandas)") {
    // pandas phases the spine from min.normalize() - freq: an empty
    // (Dec 28, Dec 29] bin precedes the first data point at Dec 29 10:00
    val d1 = Seq(
      (Timestamp.valueOf("2023-12-29 10:00:00"), Some(1.0), 1.0),
      (Timestamp.valueOf("2024-01-03 09:00:00"), Some(2.0), 1.0)
    ).toDF("ts", "Value", "weights")
    val m1 = byBucket(WeightedDataFrame.wt(d1, "weights").resample("ts", "B", closed = "right").sum())
    assert(m1 == Map(
      "2023-12-28" -> Some(0.0), "2023-12-29" -> Some(1.0),
      "2024-01-01" -> Some(0.0), "2024-01-02" -> Some(0.0),
      "2024-01-03" -> Some(2.0)))
    // SME: min at noon ON the Feb 29 edge day → its bin (Feb 15, Feb 29]
    // is emitted empty, the data lands in (Feb 29, Mar 15]
    val d2 = Seq(
      (Timestamp.valueOf("2024-02-29 12:00:00"), Some(1.0), 1.0),
      (Timestamp.valueOf("2024-03-05 10:00:00"), Some(2.0), 1.0)
    ).toDF("ts", "Value", "weights")
    val m2 = byBucket(WeightedDataFrame.wt(d2, "weights").resample("ts", "SME", closed = "right").sum())
    assert(m2 == Map("2024-02-15" -> Some(0.0), "2024-02-29" -> Some(3.0)))
    // trailing: max exactly at the Jan 15 edge midnight → empty (Jan 15, Jan 16]
    val d3 = Seq(
      (Timestamp.valueOf("2024-01-05 00:00:00"), Some(1.0), 1.0),
      (Timestamp.valueOf("2024-01-15 00:00:00"), Some(2.0), 1.0)
    ).toDF("ts", "Value", "weights")
    val m3 = byBucket(WeightedDataFrame.wt(d3, "weights").resample("ts", "B", closed = "right").sum())
    assert(m3 == Map(
      "2024-01-04" -> Some(1.0), "2024-01-05" -> Some(0.0),
      "2024-01-08" -> Some(0.0), "2024-01-09" -> Some(0.0),
      "2024-01-10" -> Some(0.0), "2024-01-11" -> Some(0.0),
      "2024-01-12" -> Some(2.0), "2024-01-15" -> Some(0.0)))
  }

  test("BME bins to last business days of months (pandas goldens)") {
    // default closed=right label=right with end-of-day edges: any time on
    // the BME day belongs to that month's bin (Jan 31 23:59:59 → Jan 31)
    assert(byBucket(bizW.resample("ts", "BME").sum()) == Map(
      "2023-12-29" -> Some(1.0), "2024-01-31" -> Some(20.0),
      "2024-02-29" -> Some(15.0), "2024-03-29" -> Some(9.0),
      "2024-04-30" -> Some(10.0)))
    assert(byBucket(bizW.resample("ts", "BME", label = "left").sum()) == Map(
      "2023-11-30" -> Some(1.0), "2023-12-29" -> Some(20.0),
      "2024-01-31" -> Some(15.0), "2024-02-29" -> Some(9.0),
      "2024-03-29" -> Some(10.0)))
    // closed=left drops the end-of-day adjustment: edges at BME midnight,
    // so Jan 31 23:59:59 moves FORWARD into the [Jan 31, Feb 29) bin
    assert(byBucket(bizW.resample("ts", "BME", closed = "left", label = "left").sum()) == Map(
      "2023-12-29" -> Some(15.0), "2024-01-31" -> Some(13.0),
      "2024-02-29" -> Some(8.0), "2024-03-29" -> Some(19.0)))
    assert(byBucket(bizW.resample("ts", "BME", closed = "left").sum()) == Map(
      "2024-01-31" -> Some(15.0), "2024-02-29" -> Some(13.0),
      "2024-03-29" -> Some(8.0), "2024-04-30" -> Some(19.0)))
  }

  test("SME bins to 15th + calendar month end (pandas goldens)") {
    // default closed=left label=left, midnight edges (no eod adjustment)
    assert(byBucket(bizW.resample("ts", "SME").sum()) == Map(
      "2023-12-15" -> Some(1.0), "2023-12-31" -> Some(5.0),
      "2024-01-15" -> Some(9.0), "2024-01-31" -> Some(6.0),
      "2024-02-15" -> Some(7.0), "2024-02-29" -> Some(8.0),
      "2024-03-15" -> Some(9.0), "2024-03-31" -> Some(10.0)))
    assert(byBucket(bizW.resample("ts", "SME", label = "right").sum()) == Map(
      "2023-12-31" -> Some(1.0), "2024-01-15" -> Some(5.0),
      "2024-01-31" -> Some(9.0), "2024-02-15" -> Some(6.0),
      "2024-02-29" -> Some(7.0), "2024-03-15" -> Some(8.0),
      "2024-03-31" -> Some(9.0), "2024-04-15" -> Some(10.0)))
    // closed=right: midnight rows sit on their edge (Jan 15 00:00 ∈
    // (Dec 31, Jan 15]); both Feb rows roll into the bin ending Feb 29,
    // leaving (Feb 29, Mar 15] empty (labeled Feb 29 under label=left)
    assert(byBucket(bizW.resample("ts", "SME", closed = "right").sum()) == Map(
      "2023-12-15" -> Some(1.0), "2023-12-31" -> Some(9.0),
      "2024-01-15" -> Some(5.0), "2024-01-31" -> Some(6.0),
      "2024-02-15" -> Some(15.0), "2024-02-29" -> Some(0.0),
      "2024-03-15" -> Some(9.0), "2024-03-31" -> Some(10.0)))
    assert(byBucket(bizW.resample("ts", "SME", closed = "right", label = "right").sum()) == Map(
      "2023-12-31" -> Some(1.0), "2024-01-15" -> Some(9.0),
      "2024-01-31" -> Some(5.0), "2024-02-15" -> Some(6.0),
      "2024-02-29" -> Some(15.0), "2024-03-15" -> Some(0.0),
      "2024-03-31" -> Some(9.0), "2024-04-15" -> Some(10.0)))
  }

  test("BQE bins to last business days of quarters (pandas goldens)") {
    assert(byBucket(bizW.resample("ts", "BQE").sum()) == Map(
      "2023-12-29" -> Some(1.0), "2024-03-29" -> Some(44.0),
      "2024-06-28" -> Some(10.0)))
    assert(byBucket(bizW.resample("ts", "BQE", label = "left").sum()) == Map(
      "2023-09-29" -> Some(1.0), "2023-12-29" -> Some(44.0),
      "2024-03-29" -> Some(10.0)))
    assert(byBucket(bizW.resample("ts", "BQE", closed = "left").sum()) == Map(
      "2024-03-29" -> Some(36.0), "2024-06-28" -> Some(19.0)))
    assert(byBucket(bizW.resample("ts", "BQE", closed = "left", label = "left").sum()) == Map(
      "2023-12-29" -> Some(36.0), "2024-03-29" -> Some(19.0)))
  }

  test("business grids are absolute and compose with by") {
    val d = bizDf.withColumn("k",
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("Value") < 6.0, "a").otherwise("b"))
    val r = WeightedDataFrame.wt(d, "weights").resample("ts", "BME", by = Seq("k")).sum()
    val byKey = r.collect().map(row =>
      (row.getString(0), row.getTimestamp(1).toString.take(10)) -> cell(row, 2)).toMap
    // group a: rows 1..5 (Dec 29 .. Jan 20); group b: rows 6..10
    assert(byKey(("a", "2023-12-29")) == Some(1.0))
    assert(byKey(("a", "2024-01-31")) == Some(14.0)) // 2+3+4+5
    assert(byKey(("b", "2024-01-31")) == Some(6.0))
    assert(byKey(("b", "2024-02-29")) == Some(15.0))
    assert(byKey(("b", "2024-03-29")) == Some(9.0))
    assert(byKey(("b", "2024-04-30")) == Some(10.0))
  }

  test("ScalaCheck: grouped CALENDAR resample (both closeds) ≡ ungrouped per-group slices") {
    // single-period calendar rules compose with `by` under BOTH closeds:
    // membership is per-row (absolute grid, shifted or not) and the
    // start-anchored closed='right' spine extensions are per-group
    // windows — the grouped result must equal resampling each group's
    // slice independently (pandas groupby().resample() semantics)
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genRow = for {
      k <- Gen.oneOf("a", "b")
      day <- Gen.choose(0, 400)
      // bias onto period edges: month starts/ends are the rows the
      // non-default closed shifts
      snap <- Gen.oneOf(0, 0, 1, 2)
      hour <- Gen.choose(0, 23)
      v <- Gen.oneOf(Gen.const(Option.empty[Double]), Gen.choose(-9, 9).map(x => Some(x.toDouble)))
      w <- Gen.choose(1, 5)
    } yield {
      val base = java.time.LocalDate.of(2023, 1, 1).plusDays(day)
      val d =
        if (snap == 1) base.withDayOfMonth(1)
        else if (snap == 2) base.withDayOfMonth(base.lengthOfMonth)
        else base
      val h = if (snap > 0 && hour % 2 == 0) 0 else hour // plant exact midnights
      (k, Timestamp.valueOf(d.atTime(h, 0).toString.replace("T", " ") + ":00"), v, w.toDouble)
    }
    val genCase = for {
      n <- Gen.choose(3, 20)
      rows <- Gen.listOfN(n, genRow)
      rule <- Gen.oneOf("ME", "MS", "QE", "QS", "YE", "YS")
      closed <- Gen.oneOf("auto", "left", "right")
    } yield (rows, rule, closed)

    def collect(df: org.apache.spark.sql.DataFrame, grouped: Boolean): Map[(String, String), Option[Double]] =
      df.collect().map { r =>
        if (grouped) (r.getString(0), r.getTimestamp(1).toString) -> cell(r, 2)
        else ("", r.getTimestamp(0).toString) -> cell(r, 1)
      }.toMap

    val prop = Prop.forAll(genCase) { case (rows, rule, closed) =>
      val df = rows.toDF("k", "ts", "value", "weights")
      val wdf = WeightedDataFrame.wt(df, "weights")
      val grouped = collect(
        wdf.resample("ts", rule, closed = closed, by = Seq("k")).sum(), grouped = true)
      val sliced = rows.map(_._1).distinct.sorted.flatMap { key =>
        val slice = WeightedDataFrame.wt(df.where(df("k") === key).drop("k"), "weights")
        collect(slice.resample("ts", rule, closed = closed).sum(), grouped = false)
          .map { case ((_, b), v) => (key, b) -> v }
      }.toMap
      if (grouped != sliced)
        println(s"grouped-calendar FALSIFIED: rule=$rule closed=$closed rows=$rows\n got=$grouped\nwant=$sliced")
      grouped == sliced
    }
    val result = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(12)
        .withInitialSeed(org.scalacheck.rng.Seed(20260816L)),
      prop)
    assert(result.passed, s"ScalaCheck: $result")
  }

  test("ScalaCheck: grouped BUSINESS resample ≡ ungrouped per-group slices") {
    // business grids are absolutely anchored, so `by` composes under the
    // default origin — the grouped result must equal resampling each
    // group's slice independently (sum: exact integer-weighted values)
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genRow = for {
      k <- Gen.oneOf("a", "b")
      day <- Gen.choose(0, 119) // Dec 2023 .. Mar 2024: month+quarter ends
      hour <- Gen.choose(0, 23)
      v <- Gen.oneOf(Gen.const(Option.empty[Double]), Gen.choose(-9, 9).map(x => Some(x.toDouble)))
      w <- Gen.choose(1, 5)
    } yield (k,
      new Timestamp(Timestamp.valueOf("2023-12-01 00:00:00").getTime +
        day * 86400000L + hour * 3600000L), v, w.toDouble)
    val genCase = for {
      n <- Gen.choose(3, 20)
      rows <- Gen.listOfN(n, genRow)
      rule <- Gen.oneOf("B", "BME", "SME", "BQE")
      closed <- Gen.oneOf("auto", "left", "right")
    } yield (rows, rule, closed)

    def collect(df: org.apache.spark.sql.DataFrame, grouped: Boolean): Map[(String, String), Option[Double]] =
      df.collect().map { r =>
        if (grouped) (r.getString(0), r.getTimestamp(1).toString) -> cell(r, 2)
        else ("", r.getTimestamp(0).toString) -> cell(r, 1)
      }.toMap

    val prop = Prop.forAll(genCase) { case (rows, rule, closed) =>
      val df = rows.toDF("k", "ts", "value", "weights")
      val wdf = WeightedDataFrame.wt(df, "weights")
      val grouped = collect(
        wdf.resample("ts", rule, closed = closed, by = Seq("k")).sum(), grouped = true)
      val sliced = rows.map(_._1).distinct.sorted.flatMap { key =>
        val slice = WeightedDataFrame.wt(df.where(df("k") === key).drop("k"), "weights")
        collect(slice.resample("ts", rule, closed = closed).sum(), grouped = false)
          .map { case ((_, b), v) => (key, b) -> v }
      }.toMap
      if (grouped != sliced)
        println(s"grouped-business FALSIFIED: rule=$rule closed=$closed rows=$rows\n got=$grouped\nwant=$sliced")
      grouped == sliced
    }
    val result = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(10)
        .withInitialSeed(org.scalacheck.rng.Seed(20260815L)),
      prop)
    assert(result.passed, s"ScalaCheck: $result")
  }

  test("grouped resample drops NULL group keys (pandas dropna default)") {
    val d = Seq(
      (Option("a"), Timestamp.valueOf("2024-01-01 00:00:00"), Some(1.0), 1.0),
      (Option.empty[String], Timestamp.valueOf("2024-01-01 00:00:00"), Some(99.0), 1.0)
    ).toDF("k", "ts", "value", "weights")
    val r = WeightedDataFrame.wt(d, "weights")
      .resample("ts", "1D", origin = "epoch", by = Seq("k")).sum()
    val rows = r.collect()
    // the null-key row vanishes entirely — never a zero-filled ghost row
    assert(rows.length == 1 && rows(0).getString(0) == "a")
    assert(cell(rows(0), 2) == Some(1.0))
  }

  test("seeded differential fuzz vs pandas 2.2.2 across the full kwarg lattice") {
    // committed goldens from tools/resample_fuzz_goldens.py (seed
    // 20260815): 220 random (rule, closed, label, origin, offset, fixture)
    // cases spanning fixed rules with every origin/offset combination,
    // nW-anchored weekly rules, ME/MS/QE/QS/YE/YS multiples, and the
    // business grids — each compared bin-for-bin (INCLUDING the empty
    // spine bins) against pandas' resample(...).sum(). Integer-valued
    // fixtures make the sums exact, so the compare is ==, not ~=.
    val cases = spark.read.json("src/test/resources/resample_fuzz_goldens.jsonl")
      .collect()
    assert(cases.length >= 200, s"golden file must carry >=200 cases, got ${cases.length}")
    val ruleFamilies = cases.map(_.getAs[String]("rule")).toSet
    assert(ruleFamilies.size >= 30, s"lattice coverage collapsed: $ruleFamilies")
    cases.foreach { c =>
      def opt(n: String) = Option(c.getAs[String](n))
      val rule = c.getAs[String]("rule")
      val fixture = c.getAs[collection.Seq[String]]("ts").zip(c.getAs[collection.Seq[Double]]("v"))
        .map { case (t, x) => (Timestamp.valueOf(t), Some(x), 1.0) }.toSeq
      val w = WeightedDataFrame.wt(
        fixture.toDF("ts", "Value", "weights"), "weights")
      val out = w.resample("ts", rule,
        closed = opt("closed").getOrElse("auto"),
        label = opt("label").getOrElse("auto"),
        origin = opt("origin").getOrElse("start_day"),
        offset = opt("offset")).sum()
      val got = out.collect().map(r => r.getTimestamp(0) -> cell(r, 1)).toMap
      val exp = c.getAs[collection.Seq[String]]("ets").zip(c.getAs[collection.Seq[Double]]("ev"))
        .map { case (t, x) => Timestamp.valueOf(t) -> Option(x) }.toMap
      assert(got == exp,
        s"case ${c.getAs[Long]("id")}: rule=$rule closed=${opt("closed")} " +
          s"label=${opt("label")} origin=${opt("origin")} offset=${opt("offset")}")
    }
  }
}
