package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of (backward) join: for every left row, the LATEST right
  * row with `rightTs ≤ leftTs` on the same key — the event-pipeline
  * "attach most recent reference state" operator (pandas `merge_asof`;
  * neither the reference nor Spark SQL has it).
  *
  * Spark-first shape — compose built-ins, no custom SparkPlan needed: both
  * sides UNION into one keyed timeline (right rows sort before left rows at
  * equal timestamps, so exact matches are visible), and one window pass
  * carries the last non-null right payload forward. Cost: a single shuffle
  * on the key + one sort per key partition — the same plan a hand-written
  * sort-merge as-of operator would produce, but AQE/codegen stay in play.
  *
  * Skew note: one window partition per key — a single hot key serializes
  * its timeline (inherent to as-of ordering); salt upstream if one key
  * dominates. `tolerance` (microseconds) nulls matches older than
  * `leftTs − tolerance`.
  */
object AsOfJoin {

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTs: String,
      rightTs: String,
      toleranceUs: Option[Long] = None): DataFrame = {
    require(keyCols.nonEmpty, "asofJoin requires at least one key column")
    // tolerance arithmetic casts to timestamp: a numeric epoch column would
    // be interpreted as SECONDS, silently scaling the window by 1e6 — fail
    // fast instead of matching on a garbled timeline
    if (toleranceUs.isDefined) {
      def reqTs(df: DataFrame, c: String, side: String): Unit = {
        val dt = df.schema(c).dataType
        require(dt.isInstanceOf[org.apache.spark.sql.types.TimestampType] ||
          dt.isInstanceOf[org.apache.spark.sql.types.DateType],
          s"asofJoin with tolerance requires a timestamp/date $side column; " +
            s"'$c' is $dt (cast numeric epochs explicitly with timestamp_micros/timestamp_seconds)")
      }
      reqTs(left, leftTs, "left ts")
      reqTs(right, rightTs, "right ts")
    }
    val rValCols = right.columns.toSeq.filterNot(c => keyCols.contains(c) || c == rightTs)
    require(rValCols.nonEmpty, "asofJoin: right side has no value columns")

    val rPayload = struct((col(rightTs).as("__rts__") +: rValCols.map(col)): _*)
    val rpType = right.select(rPayload.as("__rp__")).schema.head.dataType

    val lSide = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTs).as("__ts__"), lit(1).as("__side__"),
        struct(left.columns.map(col): _*).as("__lp__"),
        lit(null).cast(rpType).as("__rp__")): _*)
    val rSide = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTs).as("__ts__"), lit(0).as("__side__"),
        lit(null).cast(lSide.schema("__lp__").dataType).as("__lp__"),
        rPayload.as("__rp__")): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts__"), col("__side__"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lSide.unionByName(rSide)
      .withColumn("__m__", last(col("__rp__"), ignoreNulls = true).over(w))
      .where(col("__side__") === 1)

    val inTol: Column = toleranceUs match {
      case Some(t) =>
        unix_micros(col("__ts__").cast("timestamp")) -
          unix_micros(col("__m__.__rts__").cast("timestamp")) <= t
      case None => lit(true)
    }
    val m = when(col("__m__").isNotNull && inTol, col("__m__"))
    matched.select(
      left.columns.map(c => col(s"__lp__.$c").as(c)) ++
        rValCols.map(c => m.getField(c).as(c)): _*)
  }
}
