package graft.core

import java.util.Locale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** A parsed resample rule: either a fixed duration or a calendar
  * month-multiple. Calendar rules are not fixed durations — February is
  * shorter than March — so they bin by period membership (pandas' own
  * semantics for `"M"`/`"Q"`/`"Y"`: a timestamp belongs to its calendar
  * month's bin regardless of `closed`). */
sealed trait ResampleRule
final case class FixedRule(micros: Long) extends ResampleRule
/** `months` per bin (3 for quarters, 12 for years), anchored at Jan 1970;
  * `labelEnd` = the pandas end-labeled spellings (`"M"`, `"Q"`, `"Y"`). */
final case class CalendarRule(months: Int, labelEnd: Boolean) extends ResampleRule

/** Pandas offset-alias parser. Case matters exactly as in pandas: `"MS"` is
  * month-start but `"ms"` is milliseconds; `"M"` is month-end but `"min"`
  * is minutes. */
object RuleParser {
  private val Pattern = """^(\d+)?\s*([a-zA-Z]+)$""".r

  def parse(rule: String): ResampleRule = rule.trim match {
    case Pattern(num, unit) =>
      val n = Option(num).map(_.toInt).getOrElse(1)
      // calendar aliases are case-sensitive (pandas: MS≠ms, M≠min)
      unit match {
        case "M" | "ME"        => CalendarRule(n, labelEnd = true)
        case "MS"              => CalendarRule(n, labelEnd = false)
        case "Q" | "QE"        => CalendarRule(3 * n, labelEnd = true)
        case "QS"              => CalendarRule(3 * n, labelEnd = false)
        case "Y" | "A" | "YE"  => CalendarRule(12 * n, labelEnd = true)
        case "YS" | "AS"       => CalendarRule(12 * n, labelEnd = false)
        case _ =>
          val unitUs = unit.toLowerCase(Locale.ROOT) match {
            case "us"                        => 1L
            case "ms"                        => 1000L
            case "s" | "sec"                 => 1000000L
            case "min" | "t"                 => 60L * 1000000L
            case "h" | "hr"                  => 3600L * 1000000L
            case "d" | "day" | "days"        => 86400L * 1000000L
            case "w" | "week" | "weeks"      => 7L * 86400L * 1000000L
            case other =>
              throw new IllegalArgumentException(
                s"unsupported resample rule unit '$other'")
          }
          FixedRule(n * unitUs)
      }
    case other => throw new IllegalArgumentException(s"cannot parse resample rule '$other'")
  }

  /** Fixed-duration rules only (offsets must be fixed durations). */
  def toMicros(rule: String): Long = parse(rule) match {
    case FixedRule(us) => us
    case _: CalendarRule =>
      throw new IllegalArgumentException(
        s"'$rule' is a calendar rule, not a fixed duration")
  }
}

/** Weighted time-resample driver —
  * `/root/reference/src/pandas_weights/frame.py:370-446`.
  *
  * Rows are assigned to fixed-width time buckets with pandas' boundary
  * conventions (`closed`/`label`/`origin`/`offset`) — or, for calendar
  * rules (`"MS"`, `"M"`, `"Q"`, `"Y"`…), to calendar-period bins by
  * membership — aggregated with the same
  * single-pass moment algebra as [[WeightedGroupBy]], and joined against a
  * generated bucket spine so empty buckets are emitted (pandas emits every
  * bucket in the span — `tests/test_frame.py:316-331`; Spark's groupBy omits
  * empty groups, so the spine is synthesized with `sequence()` from the
  * observed min/max bucket — a one-row broadcast, not a driver loop).
  *
  * Bucket arithmetic is pure integer microseconds (`pmod`), no floating
  * point, so it is exact for any timestamp range.
  */
final class WeightedResampler private[core] (
    wdf: WeightedDataFrame,
    on: String,
    rule: String,
    closed: String,
    label: String,
    origin: String,
    offset: Option[String]) {

  require(closed == "left" || closed == "right", s"closed must be left|right, got $closed")
  require(label == "auto" || label == "left" || label == "right",
    s"label must be auto|left|right, got $label")

  private val parsed: ResampleRule = RuleParser.parse(rule)
  /** pandas' label default is RULE-dependent: end-anchored calendar rules
    * (M/Q/Y) default to right labels, everything else to left. "auto"
    * resolves that here so an explicit `label="left"` on `"M"` can mean
    * what it means in pandas (the previous period's end) instead of being
    * silently coerced to the default. */
  private val resolvedLabel: String =
    if (label != "auto") label
    else parsed match {
      case CalendarRule(_, true) => "right"
      case _                     => "left"
    }
  // calendar rules bin by period membership — closed/origin/offset have no
  // effect on which period a timestamp belongs to, so accepting them would
  // quietly return left-closed epoch-anchored results for whatever the
  // caller thought they asked for; refuse instead of diverging silently
  parsed match {
    case _: CalendarRule =>
      require(closed == "left" && origin == "start_day" && offset.isEmpty,
        s"calendar rule '$rule' bins by period membership; closed/origin/offset do not apply " +
          s"(got closed=$closed, origin=$origin, offset=$offset)")
    case _ =>
  }
  private val offsetUs: Long = offset.map(RuleParser.toMicros).getOrElse(0L)
  /** Fixed rules: bucket start in epoch µs. Calendar rules: bucket start as
    * a months-since-1970 index (bins aren't equal-width in µs). */
  private val BucketCol = "__bucket__"

  /** Spine step in the bucket key's own unit. */
  private def spineStep: Long = parsed match {
    case FixedRule(us)        => us
    case CalendarRule(m, _)   => m.toLong
  }

  /** Bucket key → the bin's label timestamp. */
  private def labelTs(b: Column): Column = parsed match {
    case FixedRule(us) =>
      timestamp_micros(if (resolvedLabel == "left") b else b + lit(us))
    case CalendarRule(months, labelEnd) =>
      val yr = ((b - pmod(b, lit(12L))) / lit(12L)).cast("int") + 1970
      val mo = pmod(b, lit(12L)).cast("int") + 1
      val start = make_date(yr, mo, lit(1))
      // pandas labeling: end-anchored rules (M/Q/Y) see bins as
      // (prev period end, period end] — right label = period end (their
      // default), left label = the PREVIOUS period's end. Start-anchored
      // rules (MS/QS/YS) see [period start, next period start) — left
      // label = period start (their default), right label = the NEXT
      // period's start (the next bin edge, not end-of-period-minus-a-day).
      val d = (labelEnd, resolvedLabel) match {
        case (true, "left")   => date_add(start, -1)
        case (true, _)        => date_add(add_months(start, months), -1)
        case (false, "right") => add_months(start, months)
        case (false, _)       => start
      }
      d.cast("timestamp")
  }

  private def w: Column = wdf.w
  private def aggCols: Seq[String] = wdf.valueCols.filterNot(_ == on)
  private def numericAggCols: Seq[String] = wdf.numericCols.filterNot(_ == on)

  /** Boolean columns count as 1/0 like the other aggregate drivers —
    * Spark rejects boolean×double arithmetic outright. */
  private def ncol(c: String): Column = WeightedDataFrame.numericCol(wdf.df, c)

  /** Rows tagged with their bucket key (fixed: epoch-µs start; calendar:
    * months-since-1970 index of the bin's first month). */
  private def bucketed: DataFrame = parsed match {
    case FixedRule(ruleUs) =>
      val df0 = wdf.df.where(col(on).isNotNull)
      val tsUs = unix_micros(col(on))
      val (df1, originUs): (DataFrame, Column) = origin match {
        case "epoch" => (df0, lit(offsetUs))
        case "start_day" =>
          // pandas default: bins anchored at midnight of the first day of data
          // (frame.py:168). One tiny extra agg, broadcast onto every row.
          val b = df0.agg(unix_micros(date_trunc("DAY", min(col(on)))).as("__origin_us__"))
          (df0.crossJoin(broadcast(b)), col("__origin_us__") + lit(offsetUs))
        case ts =>
          (df0, unix_micros(to_timestamp(lit(ts))) + lit(offsetUs))
      }
      val delta = tsUs - originUs
      val startUs =
        if (closed == "left") tsUs - pmod(delta, lit(ruleUs))
        else tsUs + pmod(-delta, lit(ruleUs)) - lit(ruleUs) // (start, start+rule]
      df1.withColumn(BucketCol, startUs).drop("__origin_us__")
    case CalendarRule(months, _) =>
      // period membership: a row belongs to its calendar month's bin,
      // multi-month bins anchored at Jan 1970 (pandas QS/YS anchoring);
      // origin/offset/closed don't apply to period-like rules
      val df0 = wdf.df.where(col(on).isNotNull)
      val mIdx = (year(col(on)).cast("long") - 1970L) * 12L + month(col(on)).cast("long") - 1L
      df0.withColumn(BucketCol, mIdx - pmod(mIdx, lit(months.toLong)))
  }

  /** Aggregate per bucket, then left-join onto the full bucket spine.
    * `fill` gives the value for empty buckets (None → NULL).
    */
  private def runAgg(cols: Seq[String], expr: String => Column, fill: Option[Double]): DataFrame = {
    val b = bucketed
    val agged = b.groupBy(col(BucketCol)).agg(expr(cols.head).as(cols.head),
      cols.tail.map(c => expr(c).as(c)): _*)
    val bounds = agged.agg(min(BucketCol).as("mn"), max(BucketCol).as("mx"))
    val spine = bounds
      .where(col("mn").isNotNull)
      .select(explode(sequence(col("mn"), col("mx"), lit(spineStep))).as(BucketCol))
    val joined = spine.join(agged, Seq(BucketCol), "left")
    val filled = cols.map { c =>
      fill.fold(col(c))(v => coalesce(col(c), lit(v)).as(c))
    }
    joined
      .select(labelTs(col(BucketCol)).as(on) +: filled: _*)
      .orderBy(col(on))
  }

  /** Weighted count per bucket, all columns — `frame.py:381-405`. Empty
    * buckets count 0.0 (pandas `sum()` of an empty bin). */
  def count(skipna: Boolean = true): DataFrame =
    runAgg(aggCols, c => WeightedMoments.countExpr(col(c), w, skipna), Some(0.0))

  /** Weighted sum per bucket — `frame.py:407-413`. min_count=0 → empty
    * buckets 0.0; min_count≥1 → NULL. */
  def sum(minCount: Int = 0): DataFrame =
    runAgg(numericAggCols, c => WeightedMoments.wSum(ncol(c), w, minCount),
      if (minCount <= 0) Some(0.0) else None)

  /** Weighted mean per bucket — `frame.py:415-422`. Empty buckets NULL. */
  def mean(skipna: Boolean = true): DataFrame =
    runAgg(numericAggCols, c => WeightedMoments.meanExpr(ncol(c), w, skipna), None)

  /** Weighted variance per bucket — `frame.py:424-436`. */
  def variance(ddof: Int = 1, skipna: Boolean = true): DataFrame =
    runAgg(numericAggCols, c => WeightedMoments.varExpr(ncol(c), w, ddof, skipna), None)

  /** Weighted standard deviation per bucket — `frame.py:438-446`. */
  def std(ddof: Int = 1, skipna: Boolean = true): DataFrame =
    runAgg(numericAggCols, c => WeightedMoments.stdExpr(ncol(c), w, ddof, skipna), None)

  /** All five aggregates for one value column in a single pass, bucket key
    * emitted as epoch seconds — the shape used by the oracle queries. */
  def summary(valueCol: String): DataFrame = {
    val b = bucketed
    val c = ncol(valueCol)
    val agged = b.groupBy(col(BucketCol)).agg(
      WeightedMoments.wCount(c, w).as("count_" + valueCol),
      WeightedMoments.wSum(c, w, 0).as("sum_" + valueCol),
      WeightedMoments.meanExpr(c, w).as("mean_" + valueCol),
      WeightedMoments.varExpr(c, w).as("var_" + valueCol),
      WeightedMoments.stdExpr(c, w).as("std_" + valueCol))
    val bounds = agged.agg(min(BucketCol).as("mn"), max(BucketCol).as("mx"))
    val spine = bounds
      .where(col("mn").isNotNull)
      .select(explode(sequence(col("mn"), col("mx"), lit(spineStep))).as(BucketCol))
    spine.join(agged, Seq(BucketCol), "left")
      .select(
        (unix_micros(labelTs(col(BucketCol))) / lit(1000000L)).cast("long").as("bucket"),
        coalesce(col("count_" + valueCol), lit(0.0)).as("count_" + valueCol),
        coalesce(col("sum_" + valueCol), lit(0.0)).as("sum_" + valueCol),
        col("mean_" + valueCol).cast(DoubleType).as("mean_" + valueCol),
        col("var_" + valueCol).cast(DoubleType).as("var_" + valueCol),
        col("std_" + valueCol).cast(DoubleType).as("std_" + valueCol))
      .orderBy(col("bucket"))
  }
}
