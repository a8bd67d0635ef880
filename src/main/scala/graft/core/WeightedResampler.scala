package graft.core

import java.util.Locale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** A parsed resample rule: either a fixed duration or a calendar
  * month-multiple. Calendar rules are not fixed durations — February is
  * shorter than March — so they bin by period membership (pandas' own
  * semantics for `"M"`/`"Q"`/`"Y"`): under the rule's default `closed`
  * a timestamp belongs to its own calendar period's bin, and the
  * non-default `closed` shifts period-edge rows exactly as pandas'
  * midnight bin edges do (see `calendarShifted` in the resampler). */
sealed trait ResampleRule
final case class FixedRule(micros: Long) extends ResampleRule
/** `months` per bin (6 for `"2Q"`, 24 for `"2Y"`); `labelEnd` = the pandas
  * end-labeled spellings (`"M"`, `"Q"`, `"Y"`); `unit` = the months of ONE
  * period of the rule's unit (1/3/12 for M/Q/Y). Single-period bins
  * (`months == unit`) are absolutely anchored (every calendar period is a
  * bin); multi-period bins are phased from the DATA START's period, like
  * pandas — which is why `"6ME"` and `"2QE"` are different rules even
  * though both bin 6 months: they anchor to the first row's month vs its
  * quarter (pandas 2.2.2, verified by the seeded resample fuzzer). */
final case class CalendarRule(months: Int, labelEnd: Boolean, unit: Int) extends ResampleRule
/** Anchored weekly rule (`"W"`, `"W-SUN"`, `"2W-MON"`…): `n`·7-day bins
  * ENDING on `endDow` (pandas weekday: 0=Mon … 6=Sun). Not a plain fixed
  * rule — the grid is pinned to the weekday, not to `origin`. For `n == 1`
  * every anchor weekday is a bin edge, so the grid is ABSOLUTE; for
  * `n > 1` only every n-th anchor weekday is, and pandas phases that grid
  * from the DATA start (right-closed: the first on-or-after anchor day of
  * `min(ts).normalize()` minus n weeks; left-closed: the previous
  * on-or-before anchor day — `_get_timestamp_range_edges`' non-Tick
  * branch), which this engine reproduces with one tiny broadcast agg. */
final case class WeeklyRule(endDow: Int, n: Int = 1) extends ResampleRule

/** Business-calendar rule (`"B"`, `"BME"`/`"BM"`, `"SME"`/`"SM"`,
  * `"BQE"`/`"BQ"`): bins between consecutive points of an ABSOLUTE
  * non-uniform date grid — weekdays, last-business-days of months,
  * 15th + month-end, last-business-days of quarter-end months. The bucket
  * key is the grid-point INDEX (weekday index / month / half-month /
  * quarter), so the empty-bin spine is still a unit-step `sequence`. */
final case class BusinessRule(grid: BusinessGrid) extends ResampleRule

/** A business-calendar bin-edge grid, as pure integer/date Column algebra
  * on `d` = days since 1970-01-01 (so it distributes and codegens — no
  * driver-side calendars). `eodAdjust` mirrors pandas'
  * `_adjust_bin_edges`: end-of-period rules (BME/BQE — like W/ME/QE/YE)
  * push right-closed edges from midnight to end-of-day, so a timestamp
  * anywhere ON an edge day still belongs to that edge's bin; B and SME
  * keep midnight edges. `defaultRight` = pandas' end-anchored
  * closed/label default. */
sealed abstract class BusinessGrid(val eodAdjust: Boolean, val defaultRight: Boolean) {
  /** Index of the last grid point ≤ day `d`. */
  def prevOrSameKey(d: Column): Column
  /** Index of the first grid point ≥ day `d`. */
  def nextOrSameKey(d: Column): Column
  /** Grid-point index → its DATE. */
  def edgeDate(key: Column): Column
}

private[core] object BizDate {
  val Epoch: java.sql.Date = java.sql.Date.valueOf("1970-01-01")
  val DayUs: Long = 86400L * 1000000L
  /** Floor division, exact for any long (pmod keeps it sign-safe). */
  def floorDiv(a: Column, b: Long): Column = ((a - pmod(a, lit(b))) / lit(b)).cast("long")
  def dateOf(d: Column): Column = date_add(lit(Epoch), d.cast("int"))
  def dayInt(dt: Column): Column = datediff(dt, lit(Epoch)).cast("long")
  /** Previous-or-same weekday (Sat/Sun roll back to Fri); 1970-01-01 is a
    * Thursday → pandas weekday = pmod(d+3, 7), 0 = Monday. */
  def rollbackBday(d: Column): Column = {
    val wd = pmod(d + lit(3L), lit(7L))
    when(wd >= 5L, d - (wd - lit(4L))).otherwise(d)
  }
  def monthIdx(d: Column): Column = {
    val dt = dateOf(d)
    (year(dt).cast("long") - lit(1970L)) * lit(12L) + month(dt).cast("long") - lit(1L)
  }
  def monthStart(m: Column): Column =
    make_date((floorDiv(m, 12L) + lit(1970L)).cast("int"), (pmod(m, lit(12L)) + lit(1L)).cast("int"), lit(1))
  /** Day-int of month `m`'s last BUSINESS day. */
  def bmeDay(m: Column): Column = rollbackBday(dayInt(last_day(monthStart(m))))
}

/** Weekdays; key = business-day index since epoch (5 per week). */
case object BDayGrid extends BusinessGrid(eodAdjust = false, defaultRight = false) {
  private def key(bd: Column): Column =
    lit(5L) * BizDate.floorDiv(bd + lit(3L), 7L) + pmod(bd + lit(3L), lit(7L))
  def prevOrSameKey(d: Column): Column = key(BizDate.rollbackBday(d))
  def nextOrSameKey(d: Column): Column = {
    val wd = pmod(d + lit(3L), lit(7L))
    key(when(wd >= 5L, d + (lit(7L) - wd)).otherwise(d))
  }
  def edgeDate(k: Column): Column =
    BizDate.dateOf(lit(7L) * BizDate.floorDiv(k, 5L) - lit(3L) + pmod(k, lit(5L)))
}

/** Last business day of each month; key = months since Jan 1970. */
case object BMonthEndGrid extends BusinessGrid(eodAdjust = true, defaultRight = true) {
  def prevOrSameKey(d: Column): Column = {
    val m = BizDate.monthIdx(d)
    when(d >= BizDate.bmeDay(m), m).otherwise(m - lit(1L))
  }
  def nextOrSameKey(d: Column): Column = {
    val m = BizDate.monthIdx(d)
    when(d <= BizDate.bmeDay(m), m).otherwise(m + lit(1L))
  }
  def edgeDate(k: Column): Column = BizDate.dateOf(BizDate.bmeDay(k))
}

/** 15th and last CALENDAR day of each month; key = half-months since Jan
  * 1970 (even = the 15th, odd = month end). */
case object SemiMonthEndGrid extends BusinessGrid(eodAdjust = false, defaultRight = false) {
  def prevOrSameKey(d: Column): Column = {
    val dt = BizDate.dateOf(d)
    val m = BizDate.monthIdx(d)
    val dom = dayofmonth(dt).cast("long")
    val ld = dayofmonth(last_day(dt)).cast("long")
    when(dom === ld, m * 2L + lit(1L))
      .when(dom >= 15L, m * 2L)
      .otherwise(m * 2L - lit(1L))
  }
  def nextOrSameKey(d: Column): Column = {
    val dt = BizDate.dateOf(d)
    val m = BizDate.monthIdx(d)
    val dom = dayofmonth(dt).cast("long")
    when(dom <= 15L, m * 2L).otherwise(m * 2L + lit(1L))
  }
  def edgeDate(k: Column): Column = {
    val ms = BizDate.monthStart(BizDate.floorDiv(k, 2L))
    when(pmod(k, lit(2L)) === 0L, make_date(year(ms), month(ms), lit(15)))
      .otherwise(last_day(ms))
  }
}

/** Last business day of each quarter-end month (Mar/Jun/Sep/Dec — the
  * pandas BQ-DEC default); key = quarters since Q1 1970. */
case object BQuarterEndGrid extends BusinessGrid(eodAdjust = true, defaultRight = true) {
  private def bqe(q: Column): Column = BizDate.bmeDay(q * lit(3L) + lit(2L))
  def prevOrSameKey(d: Column): Column = {
    val q = BizDate.floorDiv(BizDate.monthIdx(d), 3L)
    when(d >= bqe(q), q).otherwise(q - lit(1L))
  }
  def nextOrSameKey(d: Column): Column = {
    val q = BizDate.floorDiv(BizDate.monthIdx(d), 3L)
    when(d <= bqe(q), q).otherwise(q + lit(1L))
  }
  def edgeDate(k: Column): Column = BizDate.dateOf(bqe(k))
}

/** Pandas offset-alias parser. Case matters exactly as in pandas: `"MS"` is
  * month-start but `"ms"` is milliseconds; `"M"` is month-end but `"min"`
  * is minutes. */
object RuleParser {
  private val Pattern = """^(\d+)?\s*([a-zA-Z]+)(?:-([a-zA-Z]+))?$""".r

  private val Weekdays =
    Seq("MON", "TUE", "WED", "THU", "FRI", "SAT", "SUN").zipWithIndex.toMap

  def parse(rule: String): ResampleRule = rule.trim match {
    case Pattern(num, unit, anchor) =>
      val n = Option(num).map(_.toInt).getOrElse(1)
      if (anchor != null || unit.equalsIgnoreCase("w")) {
        // anchored weekly: "W" (= W-SUN), "W-MON", "2W-MON" … — pandas
        // treats these as anchored offsets, NOT 7-day ticks (to_offset("w")
        // is Week(SUN)); multiples keep the weekday anchor and phase the
        // every-n-weeks grid from the data start (see WeeklyRule)
        require(unit.equalsIgnoreCase("w"),
          s"anchored rule '$rule' not supported (only [n]W-<weekday>)")
        val dow = Option(anchor).map(_.toUpperCase(Locale.ROOT)).getOrElse("SUN")
        val endDow = Weekdays.getOrElse(dow,
          throw new IllegalArgumentException(s"unknown weekday anchor '$anchor' in '$rule'"))
        WeeklyRule(endDow, n)
      } else unit match {
        // business-calendar aliases (case-sensitive like the calendar
        // ones): pandas phases n>1 business grids from the data start —
        // not supported, refuse rather than silently bin n=1
        case "B" | "BM" | "BME" | "SM" | "SME" | "BQ" | "BQE" =>
          require(n == 1,
            s"business rule '$rule' supports only n=1 (pandas phases multiples from the data start)")
          BusinessRule(unit match {
            case "B"          => BDayGrid
            case "BM" | "BME" => BMonthEndGrid
            case "SM" | "SME" => SemiMonthEndGrid
            case _            => BQuarterEndGrid
          })
        // calendar aliases are case-sensitive (pandas: MS≠ms, M≠min)
        case "M" | "ME"        => CalendarRule(n, labelEnd = true, unit = 1)
        case "MS"              => CalendarRule(n, labelEnd = false, unit = 1)
        case "Q" | "QE"        => CalendarRule(3 * n, labelEnd = true, unit = 3)
        case "QS"              => CalendarRule(3 * n, labelEnd = false, unit = 3)
        case "Y" | "A" | "YE"  => CalendarRule(12 * n, labelEnd = true, unit = 12)
        case "YS" | "AS"       => CalendarRule(12 * n, labelEnd = false, unit = 12)
        case _ =>
          val unitUs = unit.toLowerCase(Locale.ROOT) match {
            case "us"                        => 1L
            case "ms"                        => 1000L
            case "s" | "sec"                 => 1000000L
            case "min" | "t"                 => 60L * 1000000L
            case "h" | "hr"                  => 3600L * 1000000L
            case "d" | "day" | "days"        => 86400L * 1000000L
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
    case _ =>
      throw new IllegalArgumentException(
        s"'$rule' is an anchored/calendar rule, not a fixed duration")
  }
}

/** Weighted time-resample driver —
  * `/root/reference/src/pandas_weights/frame.py:370-446`.
  *
  * Rows are assigned to fixed-width time buckets with pandas' boundary
  * conventions (`closed`/`label`/`origin`/`offset`) — or, for calendar
  * rules (`"MS"`, `"M"`, `"Q"`, `"Y"`…), to calendar-period bins by
  * membership with pandas' `closed` edge-shift — aggregated with the same
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
    offset: Option[String],
    by: Seq[String] = Nil,
    lenient: Boolean = false) {

  require(by.forall(wdf.df.columns.contains),
    s"resample by keys ${by.filterNot(wdf.df.columns.contains)} not in frame")
  require(!by.contains(on), s"'$on' cannot be both the time column and a group key")

  require(closed == "auto" || closed == "left" || closed == "right",
    s"closed must be auto|left|right, got $closed")
  require(label == "auto" || label == "left" || label == "right",
    s"label must be auto|left|right, got $label")

  private val parsed: ResampleRule = RuleParser.parse(rule)
  private def endOrigin: Boolean = origin == "end" || origin == "end_day"
  /** pandas' closed default is RULE- and ORIGIN-dependent: anchored weekly
    * rules and end-anchored origins default to right-closed bins, everything
    * else to left. "auto" resolves that here (mirroring the label default
    * below) so call sites get pandas' defaults without re-deriving them. */
  private val resolvedClosed: String =
    if (closed != "auto") closed
    else parsed match {
      case _: WeeklyRule                    => "right"
      case BusinessRule(g) if g.defaultRight => "right"
      case _: BusinessRule                   => "left"
      // pandas defaults END-anchored calendar rules (ME/QE/YE) to
      // right-closed bins — which is exactly period membership at the
      // period-end-midnight edge — and start-anchored ones to left
      case CalendarRule(_, labelEnd, _)      => if (labelEnd) "right" else "left"
      case _                                 => if (endOrigin) "right" else "left"
    }
  /** pandas' label default is RULE-dependent: end-anchored calendar rules
    * (M/Q/Y) and weekly rules default to right labels — as do end-anchored
    * origins — everything else to left. "auto" resolves that here so an
    * explicit `label="left"` on `"M"` can mean what it means in pandas (the
    * previous period's end) instead of being silently coerced. */
  private val resolvedLabel: String =
    if (label != "auto") label
    else parsed match {
      case CalendarRule(_, true, _)          => "right"
      case _: WeeklyRule                     => "right"
      case BusinessRule(g) if g.defaultRight => "right"
      case _: BusinessRule                   => "left"
      case _                                 => if (endOrigin) "right" else "left"
    }
  // Calendar rules accept BOTH closeds (the non-default one shifts edge
  // rows exactly as pandas' midnight bin edges do — see `calendarShifted`);
  // origin/offset have no effect on period bins in pandas (silently
  // ignored, `_get_timestamp_range_edges`' non-Tick branch) — refuse the
  // silent no-op instead of pretending it applied, UNLESS `lenient`:
  // the explicit pandas-compat escape hatch for ported workloads that
  // pass origin/offset on period rules and expect the no-op (the flag
  // reproduces the ignore; the default keeps the loud error).
  // Weekly rules are pinned to their weekday anchor — pandas silently
  // IGNORES origin/offset for them; same refusal, same escape hatch.
  // (Nothing downstream reads origin/offset on these rule families, so
  // lenient mode needs no further neutering — the values are simply
  // never consulted.)
  if (!lenient) parsed match {
    case _: CalendarRule =>
      require(origin == "start_day" && offset.isEmpty,
        s"calendar rule '$rule' bins by calendar periods; origin and offset do not apply " +
          s"(pandas silently ignores them — got origin=$origin, offset=$offset; " +
          "pass lenient=true to reproduce pandas' silent ignore)")
    case _: WeeklyRule =>
      require(origin == "start_day" && offset.isEmpty,
        s"weekly rule '$rule' is anchored to its weekday; origin/offset do not apply " +
          s"(got origin=$origin, offset=$offset; pass lenient=true to reproduce " +
          "pandas' silent ignore)")
    case _: BusinessRule =>
      require(origin == "start_day" && offset.isEmpty,
        s"business rule '$rule' is anchored to its calendar grid; origin/offset do not apply " +
          s"(got origin=$origin, offset=$offset; pass lenient=true to reproduce " +
          "pandas' silent ignore)")
    case _ =>
  }
  private val offsetUs: Long = offset.map(RuleParser.toMicros).getOrElse(0L)
  /** Fixed rules: bucket start in epoch µs. Calendar rules: bucket start as
    * a months-since-1970 index (bins aren't equal-width in µs). */
  private val BucketCol = "__bucket__"
  /** Right-closed non-eod business grids only (B, SME): pandas phases the
    * spine from `min(ts).normalize() - freq` and `max(ts).normalize() + freq`
    * (`_get_timestamp_range_edges`' non-Tick `closed != "left"` branch —
    * the eod-adjusted families W/ME/BME/QE/BQE/YE instead TRIM the trailing
    * bin in `_adjust_bin_edges`, and left-closed spines always start and end
    * on data bins). That emits one leading/trailing empty bin whenever the
    * first/last timestamp is not exactly at an edge midnight. In grid-index
    * space those phase keys are `prevOrSameKey(minday - 1) + 1` and
    * `nextOrSameKey(maxday + 1)` — both monotone in the day, so each row
    * carries its own candidates and the group min/max IS the value at the
    * group's min/max timestamp (no second pass over the data; verified
    * against pandas 2.2.2 incl. weekend and month-end endpoints). */
  private val SpineStartCol = "__spine_start__"
  private val SpineEndCol = "__spine_end__"
  private def hasSpinePhase: Boolean = parsed match {
    case BusinessRule(g) => resolvedClosed == "right" && !g.eodAdjust
    // fixed rules under data-END origins: pandas reassigns the spine
    // anchor backwards from the last timestamp and can emit ONE leading
    // empty bin (see the end-origin block in `bucketed`)
    case _: FixedRule => endOrigin
    // start-anchored calendar rules under closed='right': pandas' binner
    // spans (normalize(min) − freq, normalize(max) + freq], which emits a
    // LEADING empty bin when min is just past an anchor midnight and a
    // TRAILING one when max sits exactly on an anchor midnight — the
    // business-grid spine-phase machinery, in month-index space.
    case CalendarRule(_, labelEnd, _) => !labelEnd && resolvedClosed == "right"
    case _               => false
  }

  /** Non-default `closed` on a calendar rule shifts period membership
    * exactly as pandas' midnight bin edges do (`_get_time_bins` +
    * `_adjust_bin_edges`): end-anchored rules (ME/QE/YE) under
    * closed='left' keep their edges at period-end MIDNIGHT (no end-of-day
    * adjustment), so every row on a period's last calendar DAY belongs to
    * the NEXT period — membership of `date(ts) + 1 day`; start-anchored
    * rules (MS/QS/YS) under closed='right' bin as (start, next-start], so
    * a row exactly AT a period-start midnight drops to the PREVIOUS
    * period — membership of `ts − 1µs` (exact at Spark's microsecond
    * resolution). Default closeds are plain period membership.
    * (pandas 2.2.2, pinned by the seeded resample fuzzer.) */
  private def calendarShifted: Boolean = parsed match {
    case CalendarRule(_, labelEnd, _) =>
      (labelEnd && resolvedClosed == "left") || (!labelEnd && resolvedClosed == "right")
    case _ => false
  }

  private val DayUs = 86400L * 1000000L
  private val WeekUs = 7L * DayUs

  /** Spine step in the bucket key's own unit. */
  private def spineStep: Long = parsed match {
    case FixedRule(us)        => us
    case CalendarRule(m, _, _) => m.toLong
    case WeeklyRule(_, n)     => n * WeekUs
    case _: BusinessRule      => 1L // bucket keys are grid-point indexes
  }

  /** Bucket key → the bin's label timestamp. */
  private def labelTs(b: Column): Column = parsed match {
    case FixedRule(us) =>
      timestamp_micros(if (resolvedLabel == "left") b else b + lit(us))
    case WeeklyRule(_, n) =>
      // pandas labels weekly bins with the anchor WEEKDAY's date. Right-
      // closed bins [Mon, +n·7d) (the W-SUN default — pandas pushes the
      // anchor-midnight edges to end-of-day): right label = the bin's own
      // last anchor day (start + (7n−1)d), left label = the anchor day
      // before the bin (start − 1d). Left-closed bins start ON the anchor
      // day: left label = the start day, right label = the next bin edge.
      val d =
        if (resolvedClosed == "right") {
          if (resolvedLabel == "left") -DayUs else (7L * n - 1) * DayUs
        } else { if (resolvedLabel == "left") 0L else n * WeekUs }
      timestamp_micros(b + lit(d))
    case BusinessRule(grid) =>
      // right-closed bins carry their RIGHT edge's index as the key,
      // left-closed their LEFT edge's — so label=default is the key's own
      // edge and the other label is one grid step away (in INDEX space,
      // which skips weekends/mid-month days correctly by construction)
      val edgeKey =
        if (resolvedClosed == "right") { if (resolvedLabel == "right") b else b - lit(1L) }
        else { if (resolvedLabel == "left") b else b + lit(1L) }
      grid.edgeDate(edgeKey).cast("timestamp")
    case CalendarRule(months, labelEnd, _) =>
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

  // data-derived origins (INCLUDING the start_day default) anchor bins at
  // the CORPUS min/max timestamp; under `by` the pandas groupby().resample()
  // semantics would be per-group anchors — refuse rather than silently bin
  // every group against the global anchor. Calendar and weekly rules are
  // absolutely anchored (period membership / weekday grid), so `by`
  // composes with them under any accepted origin.
  parsed match {
    case _: FixedRule =>
      require(by.isEmpty || origin == "epoch" ||
          (origin.nonEmpty && origin.head.isDigit),
        s"origin='$origin' anchors bins at the data range, which is per-group " +
          s"under by=${by.mkString(",")}; use origin='epoch' or an explicit " +
          "timestamp (calendar/weekly rules are absolutely anchored and compose freely)")
    case WeeklyRule(_, n) =>
      // the n>1 grid is phased from the corpus min (pandas data-start
      // anchoring); per-group phasing under `by` would need per-group
      // anchors — refuse rather than bin every group against the global one
      require(n == 1 || by.isEmpty,
        s"'$rule' phases its every-$n-weeks grid from the data start, which is " +
          s"per-group under by=${by.mkString(",")}; use 'W-…' (absolute grid) or " +
          "a fixed '" + (7 * n) + "d' rule with origin='epoch'")
    case CalendarRule(months, _, unit) =>
      // same story for multi-period calendar grids (pandas phases them
      // from the first row's period — per-group under groupby().resample())
      require(months == unit || by.isEmpty,
        s"'$rule' phases its multi-period grid from the data start, which is " +
          s"per-group under by=${by.mkString(",")}; use the single-period rule " +
          "and combine bins, or resample each group separately")
    case _ =>
  }

  /** pandas groupby(dropna=True) default: rows whose group key is NULL are
    * dropped — also what keeps the spine join (equi, not null-safe) sound. */
  private def dropNullKeys(b: DataFrame): DataFrame =
    by.foldLeft(b)((d, k) => d.where(col(k).isNotNull))

  private def w: Column = wdf.w
  private def aggCols: Seq[String] =
    wdf.valueCols.filterNot(c => c == on || by.contains(c))
  private def numericAggCols: Seq[String] =
    wdf.numericCols.filterNot(c => c == on || by.contains(c))

  /** Boolean columns count as 1/0 like the other aggregate drivers —
    * Spark rejects boolean×double arithmetic outright. */
  private def ncol(c: String): Column = WeightedDataFrame.numericCol(wdf.df, c)

  /** Rows tagged with their bucket key (fixed: epoch-µs start; calendar:
    * months-since-1970 index of the bin's first month). */
  private def bucketed: DataFrame = parsed match {
    case FixedRule(ruleUs) =>
      val df0 = wdf.df.where(col(on).isNotNull)
      val tsUs = unix_micros(col(on))
      // data-derived origins are one tiny agg, broadcast onto every row;
      // END origins also carry min(ts) — pandas' `_adjust_dates_anchored`
      // REASSIGNS the spine anchor for them (see below) and needs both ends
      def dataOrigin(o: Column, alsoMin: Boolean = false): (DataFrame, Column) = {
        val b =
          if (alsoMin) df0.agg(o.as("__origin_us__"), unix_micros(min(col(on))).as("__min_us__"))
          else df0.agg(o.as("__origin_us__"))
        (df0.crossJoin(broadcast(b)), col("__origin_us__") + lit(offsetUs))
      }
      val (df1, originUs): (DataFrame, Column) = origin match {
        case "epoch" => (df0, lit(offsetUs))
        case "start_day" =>
          // pandas default: bins anchored at midnight of the first day of
          // data (frame.py:168)
          dataOrigin(unix_micros(date_trunc("DAY", min(col(on)))))
        case "start" => // the first timestamp itself, un-truncated
          dataOrigin(unix_micros(min(col(on))))
        case "end" => // the last timestamp itself (bins count back from it)
          dataOrigin(unix_micros(max(col(on))), alsoMin = true)
        case "end_day" =>
          // ceiling midnight of the last day (midnight stays put) — the
          // grid phase only matters modulo the rule, so anchoring at the
          // ceiling is pandas' `Timestamp(last).ceil("D")`
          val mx = unix_micros(max(col(on)))
          dataOrigin(mx + pmod(-mx, lit(DayUs)), alsoMin = true)
        case ts if ts.nonEmpty && ts.head.isDigit =>
          (df0, unix_micros(to_timestamp(lit(ts))) + lit(offsetUs))
        case other =>
          throw new IllegalArgumentException(
            s"unknown resample origin '$other' (expected epoch|start_day|start|end|end_day " +
              "or a timestamp literal)")
      }
      val delta = tsUs - originUs
      val startUs =
        if (resolvedClosed == "left") tsUs - pmod(delta, lit(ruleUs))
        else tsUs + pmod(-delta, lit(ruleUs)) - lit(ruleUs) // (start, start+rule]
      val keyed = df1.withColumn(BucketCol, startUs)
      if (!endOrigin) keyed.drop("__origin_us__")
      else {
        // pandas `_adjust_dates_anchored` end-origin spine START: the
        // anchor is reassigned to `F = origin_last − n0·rule` with
        // n0 = ⌊(origin_last − min)/rule⌋ (+1 when left-closed), and the
        // binner begins at `F − ((−offset) mod rule)` (or `F − rule` for
        // right-closed when that mod is 0) — which sits one bin BEFORE
        // the first data bucket exactly when pandas emits a leading
        // empty bin (e.g. left-closed with the data span a multiple of
        // the rule, or a sub-rule offset). Same grid phase either way —
        // only the spine extent changes; found by the seeded fuzzer.
        // (pandas raises "values falls before first bin" only on STRICT
        // right-closed offset overshoot — fresult > min; when the data
        // minimum lands EXACTLY on the computed first edge (span ≡
        // −offset mod rule) `generate_bins`' first edge is inclusive and
        // pandas keys that row into the FIRST bin. The `greatest` clamp
        // below reproduces the on-edge inclusion; strict overshoot RAISES
        // by default — the pandas-parity error, at execution time rather
        // than plan time since min(ts) is data — and `lenient=true` opts
        // into clamping those rows into the first bin instead.)
        val lastUs = col("__origin_us__")
        val minUs = col("__min_us__")
        val span = lastUs - minUs
        // fAnchor = last − (⌊span/rule⌋ + [closed=left])·rule, computed as
        // pure integer µs (min + span mod rule) — Long/Long Column division
        // evaluates in Double and can round for ~2^53 µs spans.
        val fAnchor = minUs + pmod(span, lit(ruleUs)) -
          lit(if (resolvedClosed == "left") ruleUs else 0L)
        val fo = ((-offsetUs) % ruleUs + ruleUs) % ruleUs
        val fresult =
          if (fo == 0L) { if (resolvedClosed == "right") fAnchor - lit(ruleUs) else fAnchor }
          else fAnchor - lit(fo)
        val clamped =
          if (resolvedClosed == "right") {
            // on-edge (min == fresult): clamp reproduces pandas'
            // inclusive first edge. Strict overshoot (min < fresult):
            // pandas raises ValueError — so do we, unless lenient.
            val guarded =
              if (lenient) greatest(col(BucketCol), fresult)
              else when(minUs < fresult, raise_error(lit(
                "values falls before first bin: origin=end/end_day right-closed " +
                  "offset overshoots the data minimum (pandas raises here; pass " +
                  "lenient=true to clamp those rows into the first bin)"))
                .cast(org.apache.spark.sql.types.LongType))
                .otherwise(greatest(col(BucketCol), fresult))
            keyed.withColumn(BucketCol, guarded)
          } else keyed
        clamped
          .withColumn(SpineStartCol, least(fresult, col(BucketCol)))
          .withColumn(SpineEndCol, col(BucketCol))
          .drop("__origin_us__", "__min_us__")
      }
    case WeeklyRule(endDow, n) =>
      // right-closed (the pandas W default): pandas draws anchor-midnight
      // edges then pushes them to end-of-day, so the bin is exactly
      // [Mon 00:00, +n·7d) at any sub-day resolution — grid anchored at
      // the day AFTER the end weekday. Left-closed bins start ON the
      // anchor weekday. 1970-01-01 is a Thursday (pandas weekday 3).
      val df0 = wdf.df.where(col(on).isNotNull)
      val tsUs = unix_micros(col(on))
      val binUs = n * WeekUs
      if (n == 1) {
        // every anchor day is an edge — the grid is absolute
        val startDow = if (resolvedClosed == "right") (endDow + 1) % 7 else endDow
        val anchorUs = (((startDow - 3) % 7 + 7) % 7).toLong * DayUs
        df0.withColumn(BucketCol, tsUs - pmod(tsUs - lit(anchorUs), lit(binUs)))
      } else {
        // pandas phases the every-n-weeks grid from the data start: one
        // tiny agg (midnight of min(ts)) broadcast onto every row, pure
        // integer-µs arithmetic after that. Right-closed: bins begin the
        // day after the first on-or-after anchor day (the −n·7d shift in
        // pandas' `first - freq` is a no-op modulo the bin width).
        // Left-closed: bins begin ON the previous on-or-before anchor day.
        val mins = df0.agg(
          unix_micros(date_trunc("DAY", min(col(on)))).as("__min_day_us__"))
        val minDay = col("__min_day_us__")
        // minDay's weekday, scaled to µs (pandas numbering ×DayUs): all-
        // integer pmod, no division — exact for any representable timestamp
        val minDowUs = pmod(minDay + lit(3L * DayUs), lit(WeekUs))
        val endDowUs = lit(endDow.toLong * DayUs)
        val anchor =
          if (resolvedClosed == "right")
            minDay + pmod(endDowUs - minDowUs, lit(WeekUs)) + lit(DayUs)
          else minDay - pmod(minDowUs - endDowUs, lit(WeekUs))
        df0.crossJoin(broadcast(mins))
          .withColumn(BucketCol, tsUs - pmod(tsUs - anchor, lit(binUs)))
          .drop("__min_day_us__")
      }
    case CalendarRule(months, labelEnd, unit) =>
      // period membership: a row belongs to its calendar period's bin —
      // under the rule's DEFAULT closed the period of the timestamp
      // itself, under the non-default closed the period of the shifted
      // timestamp (see `calendarShifted`). The bucket key is the bin's
      // FIRST month index.
      val df0 = wdf.df.where(col(on).isNotNull)
      def mIdxOf(c: Column): Column =
        (year(c).cast("long") - 1970L) * 12L + month(c).cast("long") - 1L
      def periodFloor(c: Column): Column = c - pmod(c, lit(unit.toLong))
      val mIdx =
        if (calendarShifted && labelEnd) mIdxOf(date_add(to_date(col(on)), 1))
        else if (calendarShifted)
          mIdxOf(timestamp_micros(unix_micros(col(on).cast("timestamp")) - lit(1L)))
        else mIdxOf(col(on))
      // start-anchored closed='right': pandas' binner runs from
      // `normalize(min) − freq` to `normalize(max) + freq` (offset
      // arithmetic: an on-anchor date steps a full n periods back, an
      // off-anchor one rolls back first) — the first bin's first month is
      // periodFloor(month(date(min) − 1 day)) − (months − unit) and the
      // last anchor is periodFloor(month(date(max))) + months, both
      // MONOTONE in the timestamp, so each row carries its own candidate
      // and the group min/max IS the corpus value (the business spine-
      // phase pattern; the last-bin clip happens in expandSpine).
      def withSpine(d: DataFrame): DataFrame =
        if (hasSpinePhase)
          d.withColumn(SpineStartCol,
              periodFloor(mIdxOf(date_sub(to_date(col(on)), 1))) - lit((months - unit).toLong))
            .withColumn(SpineEndCol, periodFloor(mIdxOf(col(on))) + lit(months.toLong))
        else d
      if (months == unit)
        // single-period bins: every calendar period is a bin — the grid is
        // absolute (epoch congruence == calendar period boundaries)
        withSpine(df0.withColumn(BucketCol, mIdx - pmod(mIdx, lit(months.toLong))))
      else {
        // multi-period bins phase from the DATA START's period (pandas
        // 2.2.2 `resample("3QE")` etc., verified by the seeded fuzzer):
        // under the default closeds the end-anchored FIRST bin ENDS at the
        // first row's period and the start-anchored one STARTS at it;
        // under the shifted closeds pandas re-derives the phase from
        // `rollback(normalize(min))` / `normalize(min) − freq`, which in
        // membership space puts the first bin's START at the first row's
        // SHIFTED period (end-anchored left) or at the binner origin
        // above (start-anchored right). One tiny min-agg broadcast onto
        // the rows — the n-weekly data-anchor pattern.
        val phaseCand: Column =
          if (calendarShifted && labelEnd)
            periodFloor(mIdxOf(date_add(to_date(col(on)), 1)))
          else if (calendarShifted)
            periodFloor(mIdxOf(date_sub(to_date(col(on)), 1))) - lit((months - unit).toLong)
          else {
            val a0 = periodFloor(mIdxOf(col(on)))
            if (labelEnd) a0 + lit((unit - months).toLong) else a0
          }
        val mins = df0.agg(min(phaseCand).as("__min_midx__"))
        val firstBin = col("__min_midx__")
        withSpine(df0.crossJoin(broadcast(mins))
          .withColumn(BucketCol, mIdx - pmod(mIdx - firstBin, lit(months.toLong)))
          .drop("__min_midx__"))
      }
    case BusinessRule(grid) =>
      // the grid is absolute, so the key is computable per-row (no range
      // scan): right-closed bins are keyed by their RIGHT edge's index,
      // left-closed by their LEFT edge's. Pandas' `_adjust_bin_edges`
      // pushes right-closed edges to end-of-day ONLY for the end-of-
      // super-daily-period rules (BME/BQE, like W/ME/QE/YE) — B and SME
      // keep midnight edges, where only a timestamp exactly AT edge
      // midnight still belongs to the edge's own bin.
      val df0 = wdf.df.where(col(on).isNotNull)
      val d = BizDate.dayInt(col(on))
      val key =
        if (resolvedClosed == "right") {
          if (grid.eodAdjust) grid.nextOrSameKey(d)
          else when(pmod(unix_micros(col(on)), lit(DayUs)) === 0L, grid.nextOrSameKey(d))
            .otherwise(grid.nextOrSameKey(d + lit(1L)))
        } else grid.prevOrSameKey(d)
      val keyed = df0.withColumn(BucketCol, key)
      if (hasSpinePhase)
        keyed
          .withColumn(SpineStartCol, grid.prevOrSameKey(d - lit(1L)) + lit(1L))
          .withColumn(SpineEndCol, grid.nextOrSameKey(d + lit(1L)))
      else keyed
  }

  /** Aggregate per bucket, then synthesize the empty-bucket spine.
    * `fill` gives the value for empty buckets (None → NULL).
    */
  private def runAgg(cols: Seq[String], expr: String => Column, fill: Option[Double]): DataFrame = {
    val b = dropNullKeys(bucketed)
    // the pandas spine-phase candidates (see SpineStartCol) ride through the
    // per-bucket agg so spine synthesis still runs over agg-sized data
    val extraAggs =
      if (hasSpinePhase)
        Seq(min(SpineStartCol).as(SpineStartCol), max(SpineEndCol).as(SpineEndCol))
      else Nil
    val agged = b.groupBy((by.map(col) :+ col(BucketCol)): _*)
      .agg(expr(cols.head).as(cols.head),
        (cols.tail.map(c => expr(c).as(c)) ++ extraAggs): _*)
    val (expanded, spineBucket) = expandSpine(agged)
    val filled = cols.map { c =>
      val v = when(spineBucket === col(BucketCol), col(c))
      fill.fold(v)(f => coalesce(v, lit(f))).as(c)
    }
    expanded
      .select(by.map(col) ++ (labelTs(spineBucket).as(on) +: filled): _*)
      .orderBy(by.map(col) :+ col(on): _*)
  }

  /** One-scan spine synthesis: each present bucket generates itself plus
    * the empty buckets up to the NEXT present bucket in its group (and
    * the pandas phase extensions at the group edges, for the business
    * right-closed rules), via one window + `sequence` explode over the
    * AGG-SIZED frame. The former bounds-aggregate + spine + left-join
    * formulation planned a SECOND full scan and bucket aggregation of
    * the corpus — column pruning specializes the bounds-side aggregate
    * (it keeps only the bucket key), so exchange reuse never fires and
    * every resample paid 2× its scan cost; measured 2.7 s → 1.0 s on
    * the sf0.1 lineitem BME summary. Returns the expanded frame and the
    * synthesized bucket column (rows where it differs from [[BucketCol]]
    * are the empty buckets). */
  private def expandSpine(agged: DataFrame): (DataFrame, Column) = {
    import org.apache.spark.sql.expressions.Window
    // constant partition key when ungrouped: the whole spine is one
    // bucket-cardinality partition (thousands of rows — one task), and
    // the explicit key silences Spark's no-partition window warning
    val parts: Seq[Column] = if (by.isEmpty) Seq(lit(0)) else by.map(col)
    val wOrd = Window.partitionBy(parts: _*).orderBy(BucketCol)
    val wAll = Window.partitionBy(parts: _*)
    val step = spineStep
    val lo =
      if (hasSpinePhase)
        when(row_number().over(wOrd) === 1, min(SpineStartCol).over(wAll))
          .otherwise(col(BucketCol))
      else col(BucketCol)
    val lastHi = parsed match {
      // calendar start-anchored closed='right': SpineEndCol carries the
      // binner's LAST anchor month (periodFloor(month(max)) + months); the
      // last BIN's first month is the largest grid point at or below it
      // minus one bin — pandas' date_range(first, last, freq) keeps whole
      // bins only, so clip (last − first) down to the grid before stepping
      // back one bin width.
      case CalendarRule(months, _, _) if hasSpinePhase =>
        val s = min(SpineStartCol).over(wAll)
        val d = max(SpineEndCol).over(wAll) - s
        s + (d - pmod(d, lit(months.toLong))) - lit(months.toLong)
      case _ if hasSpinePhase => max(SpineEndCol).over(wAll)
      case _                  => col(BucketCol)
    }
    val hi = coalesce(lead(BucketCol, 1).over(wOrd) - lit(step), lastHi)
    val expanded = agged
      .withColumn("__lo__", lo)
      .withColumn("__hi__", hi)
      .withColumn("__sb__", explode(sequence(col("__lo__"), col("__hi__"), lit(step))))
    (expanded, col("__sb__"))
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
    val b = dropNullKeys(bucketed)
    val c = ncol(valueCol)
    val summaryAggs = Seq(
      WeightedMoments.wCount(c, w).as("count_" + valueCol),
      WeightedMoments.wSum(c, w, 0).as("sum_" + valueCol),
      WeightedMoments.meanExpr(c, w).as("mean_" + valueCol),
      WeightedMoments.varExpr(c, w).as("var_" + valueCol),
      WeightedMoments.stdExpr(c, w).as("std_" + valueCol)) ++
      (if (hasSpinePhase)
        Seq(min(SpineStartCol).as(SpineStartCol), max(SpineEndCol).as(SpineEndCol))
      else Nil)
    val agged = b.groupBy((by.map(col) :+ col(BucketCol)): _*)
      .agg(summaryAggs.head, summaryAggs.tail: _*)
    val (expanded, spineBucket) = expandSpine(agged)
    def own(c: String): Column = when(spineBucket === col(BucketCol), col(c))
    expanded
      .select(by.map(col) ++ Seq(
        (unix_micros(labelTs(spineBucket)) / lit(1000000L)).cast("long").as("bucket"),
        coalesce(own("count_" + valueCol), lit(0.0)).as("count_" + valueCol),
        coalesce(own("sum_" + valueCol), lit(0.0)).as("sum_" + valueCol),
        own("mean_" + valueCol).cast(DoubleType).as("mean_" + valueCol),
        own("var_" + valueCol).cast(DoubleType).as("var_" + valueCol),
        own("std_" + valueCol).cast(DoubleType).as("std_" + valueCol)): _*)
      .orderBy(by.map(col) :+ col("bucket"): _*)
  }
}
