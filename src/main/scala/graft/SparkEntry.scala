package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{AlignedCorr, WeightedDataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2 run against the
  * driver's parquet tables; `oracleSql` holds the DuckDB-equivalent SQL with
  * identical column names/aliases (the driver hash-compares after sorting
  * columns by name).
  */
object SparkEntry {

  private def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** lineitem weighted by l_quantity — the t2 workhorse (FIXTURES.md §2). */
  private def wli(s: SparkSession, dir: String): WeightedDataFrame =
    WeightedDataFrame.wt(table(s, dir, "lineitem"), "l_quantity")

  /** events with a derived deterministic weight (events has no weight col).
    * `events.ts` is parquet TIMESTAMP(NANOS), which Spark only reads as a
    * raw long (legacy flag); convert ns → µs with integer division (a double
    * roundtrip would lose precision above 2⁵³).
    */
  private def wevents(s: SparkSession, dir: String): WeightedDataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val e = table(s, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withColumn("w", (col("user_id") % 7 + 1).cast("double"))
      .select("ts", "value", "w")
    WeightedDataFrame.wt(e, "w")
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    wli(spark, "/root/testdata/sf0.001")
      .select("l_returnflag", "l_extendedprice", "l_discount")
      .groupBy("l_returnflag")
      .mean()

  // ---- oracle-SQL generation helpers (mirror WeightedMoments exactly) ----

  private val W = "l_quantity"

  private def sqlCount(c: String, w: String = W): String =
    s"sum(CASE WHEN $c IS NOT NULL THEN $w ELSE 0 END)"
  private def sqlCountNoSkipna(w: String = W): String =
    s"coalesce(sum($w), 0.0)"
  private def sqlSum(c: String, w: String = W): String =
    s"coalesce(sum($c * $w), 0.0)"
  private def sqlMean(c: String, w: String = W): String =
    s"(sum($c * $w) / ${sqlCount(c, w)})"
  private def sqlVar(c: String, w: String = W, ddof: Int = 1): String =
    s"((sum($c * $c * $w) - (sum($c * $w) * sum($c * $w)) / ${sqlCount(c, w)}) / (${sqlCount(c, w)} - $ddof))"
  private def sqlStd(c: String, w: String = W): String =
    s"sqrt(${sqlVar(c, w)})"

  /** DuckDB mirror of WeightedMoments.corrExpr for a pair (same guards). */
  private def sqlCorrMoments(x: String, y: String, w: String): String = {
    val valid = s"($x IS NOT NULL AND $y IS NOT NULL AND $w IS NOT NULL)"
    s"""sum(CASE WHEN $valid THEN 1 ELSE 0 END) AS n,
       |sum(CASE WHEN $valid THEN $w ELSE 0 END) AS sw,
       |sum(CASE WHEN $valid THEN $x * $w END) AS sx,
       |sum(CASE WHEN $valid THEN $y * $w END) AS sy,
       |sum(CASE WHEN $valid THEN $x * $y * $w END) AS sxy,
       |sum(CASE WHEN $valid THEN $x * $x * $w END) AS sxx,
       |sum(CASE WHEN $valid THEN $y * $y * $w END) AS syy""".stripMargin.replace("\n", " ")
  }

  private def sqlCorrFromMoments(ddof: Int = 1, minPeriods: Int = 1): String =
    s"""CASE WHEN n < $minPeriods OR sw <= $ddof THEN NULL
       |WHEN ((sxx - sx * sx / sw) / (sw - $ddof)) <= 0 OR ((syy - sy * sy / sw) / (sw - $ddof)) <= 0 THEN NULL
       |ELSE ((sxy - sx * sy / sw) / (sw - $ddof)) / sqrt(((sxx - sx * sx / sw) / (sw - $ddof)) * ((syy - sy * sy / sw) / (sw - $ddof)))
       |END""".stripMargin.replace("\n", " ")

  private val corrCols = Seq("l_extendedprice", "l_discount", "l_tax")

  /** Full k×k corr long format as UNION ALL of per-pair aggregates. */
  private def corrMatrixSql: String = {
    val selects = for { x <- corrCols; y <- corrCols } yield
      s"""SELECT '$x' AS col_x, '$y' AS col_y, ${sqlCorrFromMoments()} AS corr
         |FROM (SELECT ${sqlCorrMoments(x, y, W)} FROM lineitem)""".stripMargin.replace("\n", " ")
    selects.mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY col_x, col_y")
  }

  private def groupedCorrSql: String = {
    val selects = for { x <- corrCols; y <- corrCols } yield
      s"""SELECT l_returnflag, '$x' AS col_x, '$y' AS col_y, ${sqlCorrFromMoments()} AS corr
         |FROM (SELECT l_returnflag, ${sqlCorrMoments(x, y, W)} FROM lineitem GROUP BY l_returnflag)""".stripMargin.replace("\n", " ")
    selects.mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY l_returnflag, col_x, col_y")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1 count (skipna=true) — SURVEY §2.2
    "q01_count" -> ((s, dir) =>
      wli(s, dir).select("l_extendedprice", "l_discount", "l_returnflag").count()),
    // A1 count skipna=false
    "q02_count_noskipna" -> ((s, dir) =>
      wli(s, dir).select("l_extendedprice", "l_discount").count(skipna = false)),
    // A2 sum
    "q03_sum" -> ((s, dir) =>
      wli(s, dir).select("l_extendedprice", "l_discount").sum()),
    // A3 mean
    "q04_mean" -> ((s, dir) =>
      wli(s, dir).select("l_extendedprice", "l_discount").mean()),
    // A4 var
    "q05_var" -> ((s, dir) =>
      wli(s, dir).select("l_extendedprice", "l_discount").variance()),
    // A5 std
    "q06_std" -> ((s, dir) =>
      wli(s, dir).select("l_extendedprice", "l_discount").std()),
    // A6 corr matrix (long format)
    "q07_corr" -> ((s, dir) =>
      wli(s, dir).select(corrCols: _*).corr().orderBy("col_x", "col_y")),
    // G1 grouped count
    "q08_grouped_count" -> ((s, dir) =>
      wli(s, dir).select("l_returnflag", "l_extendedprice", "l_discount")
        .groupBy("l_returnflag").count()),
    // G2 grouped sum
    "q09_grouped_sum" -> ((s, dir) =>
      wli(s, dir).select("l_returnflag", "l_extendedprice", "l_discount")
        .groupBy("l_returnflag").sum()),
    // G3 grouped mean
    "q10_grouped_mean" -> ((s, dir) =>
      wli(s, dir).select("l_returnflag", "l_extendedprice", "l_discount")
        .groupBy("l_returnflag").mean()),
    // G4 grouped var
    "q11_grouped_var" -> ((s, dir) =>
      wli(s, dir).select("l_returnflag", "l_extendedprice", "l_discount")
        .groupBy("l_returnflag").variance()),
    // G5 grouped std
    "q12_grouped_std" -> ((s, dir) =>
      wli(s, dir).select("l_returnflag", "l_extendedprice", "l_discount")
        .groupBy("l_returnflag").std()),
    // G6 grouped corr (long format)
    "q13_grouped_corr" -> ((s, dir) =>
      wli(s, dir).select(("l_returnflag" +: corrCols): _*)
        .groupBy("l_returnflag").corr()),
    // A7 series corr vs other with index alignment (join on l_orderkey)
    "q14_aligned_corr" -> ((s, dir) => {
      val left = wli(s, dir).select("l_orderkey", "l_extendedprice")
      val right = table(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
      AlignedCorr.corr(left, "l_extendedprice", right, "o_totalprice", Seq("l_orderkey"))
    }),
    // G7 grouped series corr vs other
    "q15_grouped_aligned_corr" -> ((s, dir) => {
      val left = wli(s, dir).select("l_returnflag", "l_orderkey", "l_extendedprice")
      val right = table(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
      AlignedCorr.corrByGroup(left, Seq("l_returnflag"), "l_extendedprice",
        right, "o_totalprice", Seq("l_orderkey"))
    }),
    // §2.4 resample: 2-day buckets over events, all five aggregates
    "q16_resample" -> ((s, dir) =>
      wevents(s, dir).resample("ts", "2D", origin = "epoch").summary("value")),
    // A8/G8 apply: weighted range per group over pre-weighted data
    "q17_grouped_apply_range" -> ((s, dir) =>
      wli(s, dir).select("l_returnflag", "l_extendedprice")
        .groupBy("l_returnflag").applyAgg(c => max(c) - min(c))),
    // T3 projection + grouped mean on the projected accessor
    "q18_select_grouped_mean" -> ((s, dir) =>
      wli(s, dir).select("l_linestatus", "l_tax")
        .groupBy("l_linestatus").mean())
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_count" ->
      s"""SELECT ${sqlCount("l_extendedprice")} AS l_extendedprice,
         |${sqlCount("l_discount")} AS l_discount,
         |${sqlCount("l_returnflag")} AS l_returnflag FROM lineitem""".stripMargin.replace("\n", " "),
    "q02_count_noskipna" ->
      s"""SELECT ${sqlCountNoSkipna()} AS l_extendedprice,
         |${sqlCountNoSkipna()} AS l_discount FROM lineitem""".stripMargin.replace("\n", " "),
    "q03_sum" ->
      s"""SELECT ${sqlSum("l_extendedprice")} AS l_extendedprice,
         |${sqlSum("l_discount")} AS l_discount FROM lineitem""".stripMargin.replace("\n", " "),
    "q04_mean" ->
      s"""SELECT ${sqlMean("l_extendedprice")} AS l_extendedprice,
         |${sqlMean("l_discount")} AS l_discount FROM lineitem""".stripMargin.replace("\n", " "),
    "q05_var" ->
      s"""SELECT ${sqlVar("l_extendedprice")} AS l_extendedprice,
         |${sqlVar("l_discount")} AS l_discount FROM lineitem""".stripMargin.replace("\n", " "),
    "q06_std" ->
      s"""SELECT ${sqlStd("l_extendedprice")} AS l_extendedprice,
         |${sqlStd("l_discount")} AS l_discount FROM lineitem""".stripMargin.replace("\n", " "),
    "q07_corr" -> corrMatrixSql,
    "q08_grouped_count" ->
      s"""SELECT l_returnflag, ${sqlCount("l_extendedprice")} AS l_extendedprice,
         |${sqlCount("l_discount")} AS l_discount
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin.replace("\n", " "),
    "q09_grouped_sum" ->
      s"""SELECT l_returnflag, ${sqlSum("l_extendedprice")} AS l_extendedprice,
         |${sqlSum("l_discount")} AS l_discount
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin.replace("\n", " "),
    "q10_grouped_mean" ->
      s"""SELECT l_returnflag, ${sqlMean("l_extendedprice")} AS l_extendedprice,
         |${sqlMean("l_discount")} AS l_discount
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin.replace("\n", " "),
    "q11_grouped_var" ->
      s"""SELECT l_returnflag, ${sqlVar("l_extendedprice")} AS l_extendedprice,
         |${sqlVar("l_discount")} AS l_discount
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin.replace("\n", " "),
    "q12_grouped_std" ->
      s"""SELECT l_returnflag, ${sqlStd("l_extendedprice")} AS l_extendedprice,
         |${sqlStd("l_discount")} AS l_discount
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin.replace("\n", " "),
    "q13_grouped_corr" -> groupedCorrSql,
    "q14_aligned_corr" ->
      s"""SELECT ${sqlCorrFromMoments()} AS corr FROM
         |(SELECT ${sqlCorrMoments("x", "y", "w")} FROM
         |(SELECT l.l_extendedprice AS x, o.o_totalprice AS y, l.l_quantity AS w
         |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey))""".stripMargin.replace("\n", " "),
    "q15_grouped_aligned_corr" ->
      s"""SELECT l_returnflag, ${sqlCorrFromMoments()} AS corr FROM
         |(SELECT l_returnflag, ${sqlCorrMoments("x", "y", "w")} FROM
         |(SELECT l.l_returnflag, l.l_extendedprice AS x, o.o_totalprice AS y, l.l_quantity AS w
         |FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey)
         |GROUP BY l_returnflag) ORDER BY l_returnflag""".stripMargin.replace("\n", " "),
    "q16_resample" -> {
      val w = "(user_id % 7 + 1)"
      s"""WITH b AS (SELECT CAST(floor(epoch(ts) / 172800) AS BIGINT) * 172800 AS bucket,
         |value, CAST($w AS DOUBLE) AS w FROM events),
         |a AS (SELECT bucket,
         |sum(CASE WHEN value IS NOT NULL THEN w ELSE 0 END) AS count_value,
         |coalesce(sum(value * w), 0.0) AS sum_value,
         |(sum(value * w) / sum(CASE WHEN value IS NOT NULL THEN w ELSE 0 END)) AS mean_value,
         |((sum(value * value * w) - (sum(value * w) * sum(value * w)) / sum(CASE WHEN value IS NOT NULL THEN w ELSE 0 END)) / (sum(CASE WHEN value IS NOT NULL THEN w ELSE 0 END) - 1)) AS var_value,
         |sqrt(((sum(value * value * w) - (sum(value * w) * sum(value * w)) / sum(CASE WHEN value IS NOT NULL THEN w ELSE 0 END)) / (sum(CASE WHEN value IS NOT NULL THEN w ELSE 0 END) - 1))) AS std_value
         |FROM b GROUP BY bucket),
         |s AS (SELECT unnest(generate_series((SELECT min(bucket) FROM a), (SELECT max(bucket) FROM a), 172800)) AS bucket)
         |SELECT s.bucket, coalesce(a.count_value, 0.0) AS count_value,
         |coalesce(a.sum_value, 0.0) AS sum_value, a.mean_value, a.var_value, a.std_value
         |FROM s LEFT JOIN a ON s.bucket = a.bucket ORDER BY s.bucket""".stripMargin.replace("\n", " ")
    },
    "q17_grouped_apply_range" ->
      s"""SELECT l_returnflag,
         |(max(l_extendedprice * l_quantity) - min(l_extendedprice * l_quantity)) AS l_extendedprice
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin.replace("\n", " "),
    "q18_select_grouped_mean" ->
      s"""SELECT l_linestatus, ${sqlMean("l_tax")} AS l_tax
         |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin.replace("\n", " ")
  )
}
