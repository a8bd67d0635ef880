package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** One shared local SparkSession for every suite. */
object TestSpark {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  /** Double cell → None if NULL/NaN. */
  def cell(r: Row, i: Int): Option[Double] =
    if (r.isNullAt(i)) None
    else {
      val v = r.get(i) match {
        case d: java.lang.Double => d.doubleValue()
        case f: java.lang.Float  => f.doubleValue()
        case n: java.lang.Number => n.doubleValue()
      }
      if (v.isNaN) None else Some(v)
    }

  def assertApprox(got: Option[Double], want: Option[Double], tol: Double = 1e-12): Unit =
    (got, want) match {
      case (None, None)         => ()
      case (Some(g), Some(e))   =>
        assert(math.abs(g - e) <= tol * math.max(1.0, math.abs(e)), s"got $g want $e")
      case _                    => fail(s"got $got want $want")
    }

  /** Single-row result → column name → Option[Double]. */
  def oneRow(df: DataFrame): Map[String, Option[Double]] = {
    val rows = df.collect()
    assert(rows.length == 1, s"expected 1 row, got ${rows.length}")
    df.columns.zipWithIndex.map { case (c, i) => c -> cell(rows(0), i) }.toMap
  }
}
