package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join WITHOUT an inequality join.
  *
  * Spark plans `p.t >= i.s AND p.t < i.e` as BroadcastNestedLoop (or a
  * cartesian) — O(|points|·|intervals|) comparisons that die at the first
  * large input. Here both sides bucketize at `bucketWidth`: intervals
  * explode into every bucket they overlap, points land in their one
  * bucket, the join is an EQUI-join on bucket id, and the exact
  * containment predicate filters within matching buckets only. Each
  * (point, interval) pair meets exactly once (a point has ONE bucket), so
  * no dedup pass is needed.
  *
  * Scale shape: one hash shuffle on bucket keys for each side; comparisons
  * = Σ_bucket |points_b|·|intervals_b|, i.e. only co-bucketed work. Row
  * amplification on the interval side is `ceil(len / bucketWidth) + 1` —
  * pick `bucketWidth` near the typical interval length (guarded by
  * `maxBucketsPerInterval`, which fails loudly instead of letting one
  * year-long interval explode into millions of rows).
  */
object RangeJoin {

  /** Join each row of `points` to every interval containing it:
    * `start ≤ point < end` (half-open). `pointCol`/`startCol`/`endCol`
    * must be integral (e.g. epoch micros — convert timestamps first);
    * empty intervals (`end ≤ start`) match nothing. Output: point columns
    * + interval columns (caller disambiguates name clashes beforehand). */
  def rangeJoin(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketWidth: Long,
      maxBucketsPerInterval: Long = 10000L): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val w = lit(bucketWidth)
    val pb = points.withColumn("__b__", floor(col(pointCol) / w).cast("long"))
    val firstB = floor(col(startCol) / w).cast("long")
    val lastB = floor((col(endCol) - 1) / w).cast("long")
    // the guard lives INSIDE the sequence bound — a side-channel
    // assert_true column would be pruned away with its projection
    val span = lastB - firstB
    val safeSpan = when(span < lit(maxBucketsPerInterval), span)
      .otherwise(raise_error(lit(
        s"rangeJoin: interval spans >= $maxBucketsPerInterval buckets of " +
          s"$bucketWidth; raise bucketWidth or maxBucketsPerInterval")).cast("long"))
    val ib = intervals
      .where(col(endCol) > col(startCol))
      .withColumn("__b__", explode(sequence(firstB, firstB + safeSpan)))
    pb.join(ib, Seq("__b__"))
      .where(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__b__")
  }
}
