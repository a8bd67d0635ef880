package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.WeightedDataFrame

/** Property-style invariants (SURVEY §5 engine test plan), run over seeded
  * random frames:
  *   1. unit weights ⇒ every weighted aggregate equals Spark's native
  *      unweighted aggregate (count/sum/avg/var_samp/stddev_samp/corr);
  *   2. weighted mean and corr are invariant under w → c·w (c > 0).
  */
class PropertySpec extends SparkSpecBase {
  import spark.implicits._

  private def randomFrame(seed: Long, n: Int): DataFrame = {
    val rnd = new Random(seed)
    val rows = (0 until n).map { i =>
      val a = if (rnd.nextDouble() < 0.2) None else Some(rnd.nextDouble() * 100 - 50)
      val b = if (rnd.nextDouble() < 0.2) None else Some(rnd.nextDouble() * 10)
      val g = s"g${rnd.nextInt(3)}"
      (i.toLong, g, a, b)
    }
    rows.toDF("id", "g", "a", "b")
  }

  private def withUnitWeight(df: DataFrame): WeightedDataFrame =
    WeightedDataFrame.wt(df.withColumn("w", lit(1.0)), "w")

  test("unit weights reduce to native unweighted aggregates") {
    for (seed <- 1L to 5L) {
      val df = randomFrame(seed, 30 + seed.toInt)
      val wdf = withUnitWeight(df.select("g", "a", "b"))

      val got = oneRow(wdf.select("a", "b").mean())
      val want = oneRow(df.agg(avg("a").as("a"), avg("b").as("b")))
      assertApprox(got("a"), want("a"), 1e-9)
      assertApprox(got("b"), want("b"), 1e-9)

      val gotVar = oneRow(wdf.select("a", "b").variance())
      val wantVar = oneRow(df.agg(var_samp("a").as("a"), var_samp("b").as("b")))
      assertApprox(gotVar("a"), wantVar("a"), 1e-9)
      assertApprox(gotVar("b"), wantVar("b"), 1e-9)

      val gotCnt = oneRow(wdf.select("a").count())
      val wantCnt = df.agg(count("a")).head().getLong(0).toDouble
      assert(gotCnt("a").contains(wantCnt))

      // pairwise corr equals Spark's native corr under the joint mask
      val gotCorr = wdf.select("a", "b").corr().where($"col_x" === "a" && $"col_y" === "b")
        .head().getDouble(2)
      val wantCorr = df.agg(corr("a", "b")).head().getDouble(0)
      assert(math.abs(gotCorr - wantCorr) < 1e-9, s"corr $gotCorr vs $wantCorr (seed $seed)")

      // grouped means
      val gGot = wdf.groupBy("g").mean().collect().map(r => r.getString(0) -> cell(r, 1)).toMap
      val gWant = df.groupBy("g").agg(avg("a")).collect().map(r => r.getString(0) -> cell(r, 1)).toMap
      gWant.foreach { case (k, v) => assertApprox(gGot(k), v, 1e-9) }
    }
  }

  test("weighted mean/corr invariant under weight scaling w → c·w") {
    for (seed <- 1L to 5L) {
      val rnd = new Random(seed * 77)
      val df = randomFrame(seed * 13, 40)
        .withColumn("w", (rand(seed) * 5 + 0.1))
      val c = rnd.nextDouble() * 9 + 0.5
      val w1 = WeightedDataFrame.wt(df.select("g", "a", "b", "w"), "w")
      val w2 = WeightedDataFrame.wt(
        df.select(col("g"), col("a"), col("b"), (col("w") * c).as("w")), "w")

      val m1 = oneRow(w1.select("a", "b").mean())
      val m2 = oneRow(w2.select("a", "b").mean())
      assertApprox(m1("a"), m2("a"), 1e-9)
      assertApprox(m1("b"), m2("b"), 1e-9)

      // corr with ddof: scaling weights changes the ddof-corrected denom,
      // so compare with ddof=0 where scale invariance holds exactly
      val c1 = w1.select("a", "b").corr(ddof = 0).where($"col_x" === "a" && $"col_y" === "b").head()
      val c2 = w2.select("a", "b").corr(ddof = 0).where($"col_x" === "a" && $"col_y" === "b").head()
      assertApprox(cell(c1, 2), cell(c2, 2), 1e-9)

      // skew/kurt/mode use population moments (every term is a W-ratio),
      // so they are exactly weight-scale invariant
      val s1 = oneRow(w1.select("a").skew()); val s2 = oneRow(w2.select("a").skew())
      assertApprox(s1("a"), s2("a"), 1e-9)
      val k1 = oneRow(w1.select("a").kurt()); val k2 = oneRow(w2.select("a").kurt())
      assertApprox(k1("a"), k2("a"), 1e-9)
      val mo1 = w1.groupBy("g").mode("a").collect().map(r => r.getString(0) -> cell(r, 1)).toMap
      val mo2 = w2.groupBy("g").mode("a").collect().map(r => r.getString(0) -> cell(r, 1)).toMap
      assert(mo1 == mo2)
    }
  }

  test("ecdf is a weighted CDF: in (0,1], monotone in value, 1 at the group max") {
    import graft.core.WeightedNormalize
    for (seed <- 1L to 3L) {
      val df = randomFrame(seed, 40).withColumn("w", (col("id") % 5 + 1).cast("double"))
      val wdf = WeightedDataFrame.wt(df, "w")
      val got = WeightedNormalize.ecdf(wdf, "a", Seq("g"))
        .select("g", "a", "pct_rank").collect()
        .flatMap(r => cell(r, 1).map(a => (r.getString(0), a, cell(r, 2).get)))
      assert(got.forall { case (_, _, p) => p > 0 && p <= 1 + 1e-12 })
      got.groupBy(_._1).foreach { case (_, rows) =>
        val sorted = rows.sortBy(_._2)
        assert(sorted.zip(sorted.tail).forall { case ((_, _, p1), (_, _, p2)) => p1 <= p2 + 1e-12 })
        assertApprox(Some(sorted.last._3), Some(1.0), 1e-12)
      }
    }
  }

  test("zscore output has weighted mean 0 and weighted variance 1 per group") {
    import graft.core.WeightedNormalize
    for (seed <- 1L to 3L) {
      val df = randomFrame(seed, 50).withColumn("w", (col("id") % 5 + 1).cast("double"))
      val z = WeightedNormalize.zscore(WeightedDataFrame.wt(df, "w"), "a", Seq("g"))
        .withColumn("w", (col("id") % 5 + 1).cast("double"))
      val wz = WeightedDataFrame.wt(z.select("g", "zscore", "w"), "w")
      wz.groupBy("g").mean().collect().foreach(r =>
        assertApprox(cell(r, 1), Some(0.0), 1e-9))
      wz.groupBy("g").variance().collect().foreach(r =>
        cell(r, 1).foreach(v => assertApprox(Some(v), Some(1.0), 1e-9)))
    }
  }

  test("topKPerGroup never exceeds k and keeps exactly the score-maximal rows") {
    import graft.ops.Selection
    for (seed <- 1L to 3L) {
      val df = randomFrame(seed, 60).where(col("a").isNotNull)
      val k = 4
      val got = Selection.topKPerGroup(df, Seq("g"), col("a"), k, Seq("id"))
        .select("g", "id").collect().map(r => (r.getString(0), r.getLong(1)))
      val byGroup = got.groupBy(_._1)
      assert(byGroup.values.forall(_.length <= k))
      // reference computation on the driver
      val all = df.select("g", "id", "a").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      all.groupBy(_._1).foreach { case (g, rows) =>
        val want = rows.sortBy(t => (-t._3, t._2)).take(k).map(_._2).toSet
        assert(byGroup.getOrElse(g, Array.empty).map(_._2).toSet == want, s"group $g")
      }
    }
  }

  test("skew/kurt on a standard normal-ish sample sit near 0 and shift with outliers") {
    val rnd = new Random(99)
    val sym = (1 to 4000).map(_ => ("g", rnd.nextGaussian(), 1.0 + rnd.nextInt(3)))
      .toDF("g", "a", "w")
    val wdf = WeightedDataFrame.wt(sym, "w")
    val s = oneRow(wdf.select("a").skew())("a").get
    val k = oneRow(wdf.select("a").kurt())("a").get
    assert(math.abs(s) < 0.2, s"gaussian skew $s")
    assert(math.abs(k) < 0.4, s"gaussian excess kurtosis $k")
    // heavy right tail → positive skew
    val tail = sym.union(Seq(("g", 25.0, 5.0)).toDF("g", "a", "w"))
    val st = oneRow(WeightedDataFrame.wt(tail, "w").select("a").skew())("a").get
    assert(st > 0.5, s"tailed skew $st")
  }
}
