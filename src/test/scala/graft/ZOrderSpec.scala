package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Z-ordered layout: every output file must be a tight bounding box in ALL
  * interleaved dimensions — the property parquet row-group pruning rides on.
  * Compared against a one-column-sorted layout, which can only ever bound
  * that one column. */
class ZOrderSpec extends SparkSpecBase {

  private def events = Tables.testTable(spark, "/root/testdata/sf0.001", "events")
    .select("event_id", "user_id", "value")

  /** Per-file [min,max] of `c`; returns how many files' interval contains
    * the probe — exactly the files a footer-stats reader must visit. */
  private def filesContaining(dir: String, c: String, probe: Double): Long = {
    val perFile = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(c).cast("double")).as("lo"), max(col(c).cast("double")).as("hi"))
    perFile.where(col("lo") <= probe && col("hi") >= probe).count()
  }

  test("z-order bounds every file in both dimensions; single-sort bounds one") {
    val zDir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val sDir = java.nio.file.Files.createTempDirectory("graft-sorted").toString
    val df = events
    Tables.writeZOrdered(df, zDir, Seq("user_id", "value"), nFiles = 16)
    // baseline: classic single-column range layout (sorted by user_id)
    df.repartitionByRange(16, col("user_id")).sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(sDir)

    assert(spark.read.parquet(zDir).count() == df.count())
    val uProbe = df.stat.approxQuantile("user_id", Array(0.5), 0.001)(0)
    val vProbe = df.stat.approxQuantile("value", Array(0.5), 0.001)(0)

    val zu = filesContaining(zDir, "user_id", uProbe)
    val zv = filesContaining(zDir, "value", vProbe)
    val su = filesContaining(sDir, "user_id", uProbe)
    val sv = filesContaining(sDir, "value", vProbe)

    // sorted layout: near-perfect on its sort column, useless on the other
    assert(su <= 3, s"sorted layout should bound user_id tightly, got $su/16")
    assert(sv >= 12, s"sorted layout cannot bound value, got $sv/16")
    // z-order: a median point query prunes most files on EITHER dimension
    assert(zu <= 8, s"z-order should prune user_id probes, got $zu/16")
    assert(zv <= 8, s"z-order should prune value probes, got $zv/16")
  }

  test("zOrderValue: nulls land in the low region, interleave fits a long") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 10.0), (2L, null), (3L, 30.0), (null, 40.0), (5L, 50.0))
      .toDF("a", "b")
    val z = df.select(Tables.zOrderValue(df, Seq("a", "b"), bits = 2).as("z"))
      .collect().map(_.getLong(0))
    assert(z.forall(v => v >= 0 && v < 16)) // 2 cols × 2 bits
    // the all-null-ish row (null, 40.0) keeps a defined, low a-rank
    assert(z.length == 5)
  }

  test("writeZOrdered refuses a caller __z__ column and bad widths") {
    import spark.implicits._
    val df = Seq((1L, 2.0)).toDF("a", "__z__")
    intercept[IllegalArgumentException] {
      Tables.writeZOrdered(df, "/tmp/never", Seq("a"), nFiles = 2)
    }
    val ok = Seq((1L, 2.0)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      Tables.zOrderValue(ok, Seq("a", "b"), bits = 0)
    }
    intercept[IllegalArgumentException] {
      Tables.zOrderValue(ok, Nil)
    }
  }
}
