package graft.tools

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import java.security.MessageDigest

/** Reproduce the driver's correctness-hash convention in-repo so a red
  * `hash_match` cell can be diagnosed locally: sort columns BY NAME, render
  * every cell to a canonical dtype-tagged string, sort the rendered rows,
  * and SHA-256 the whole relation. A Python twin of `canonicalCell` lives in
  * the crosscheck script so the SAME fingerprint can be computed over the
  * DuckDB oracle result — if the two fingerprints differ while a tolerant
  * value-compare passes, the divergence is representational (the round-6/7
  * q50 case: DuckDB `sum(BIGINT)` promotes to HUGEINT, which lands in
  * pandas as float64, so the driver hashed "3.0e10" against Spark's int64
  * 30000000000 — values equal, hashes different).
  *
  * Usage: runMain graft.tools.RowHash <verifyOutDir> <queryName> [more...]
  */
object RowHash {

  /** Canonical, language-neutral cell rendering. Tagged with a dtype KIND so
    * an int64 5 and a float64 5.0 hash differently — that distinction is
    * precisely the failure mode this tool exists to expose. */
  def canonicalCell(v: Any): String = v match {
    case null => "n:"
    case b: Boolean => s"b:$b"
    case x @ (_: Byte | _: Short | _: Int | _: Long) => s"i:$x"
    case d: Double => canonicalFloat(d)
    case f: Float => canonicalFloat(f.toDouble)
    case d: java.math.BigDecimal => s"f:${d.toPlainString}"
    case t: java.sql.Timestamp => s"t:${t.getTime}"
    case d: java.sql.Date => s"d:$d"
    case s: String => s"s:$s"
    case a: Seq[_] => a.map(canonicalCell).mkString("a:[", ",", "]")
    case a: Array[_] => a.map(canonicalCell).mkString("a:[", ",", "]")
    case r: Row => r.toSeq.map(canonicalCell).mkString("r:(", ",", ")")
    case other => s"?:$other"
  }

  /** Doubles render as their signed IEEE-754 bit pattern: text formatting
    * is NOT portable (Java's %.17e pads Double.toString's shortest repr
    * with zeros instead of correctly rounding — 59.50523437499999 renders
    * "...49999900e+01" in Java but "...49999935e+01" in Python), while the
    * bit pattern is exact and trivially identical across languages
    * (`struct.unpack('<q', struct.pack('<d', f))` in the twin). NaN renders
    * as null ("n:"): pandas stores SQL NULL as NaN in float64 columns, so
    * the Python twin CANNOT distinguish them — both sides adopt the same
    * null-normalization or the twins would disagree on any NaN-bearing
    * output. */
  private def canonicalFloat(d: Double): String =
    if (d.isNaN) "n:"
    else "f:" + java.lang.Double.doubleToLongBits(d)

  /** Fingerprint of a DataFrame under the driver convention. Collects — this
    * is a verify-scale diagnostic (≤ ~100k rows), not a production op. */
  def fingerprint(df: DataFrame): String = {
    val cols = df.columns.sorted
    val rendered = df.select(cols.head, cols.tail: _*).collect()
      .map(r => r.toSeq.map(canonicalCell).mkString("|"))
    val md = MessageDigest.getInstance("SHA-256")
    md.update(rendered.sorted.mkString("\n").getBytes("UTF-8"))
    md.digest().map("%02x".format(_)).mkString
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RowHash <verifyOutDir> <queryName>...")
    val outDir = args(0)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { name =>
      val df = spark.read.parquet(s"$outDir/$name")
      println(s"ROWHASH $name ${fingerprint(df)}")
    }
    spark.stop()
  }
}
