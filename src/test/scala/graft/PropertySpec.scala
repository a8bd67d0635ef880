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

  test("TTL admission invariant: admitted ⇔ no live band in trailing window (ScalaCheck schedules)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import graft.streaming.StreamingDedup
    // fully-distinct word sets: with shingleSize=1 a band collision then
    // occurs (to generator-seeded determinism) only between EQUAL texts,
    // so the brute simulator can reason at the text level
    val pool = Vector("alpha beta gamma", "one two three", "red green blue",
      "cats dogs birds", "north south east", "apples pears plums")

    // brute model of the documented contract: an arrival is admitted iff
    // no sighting of its text is LIVE (strictly within the trailing
    // ttl-batch window, eviction before matching) and no lower-id arrival
    // in the same batch carries the same text; EVERY arrival (kept or
    // dropped) refreshes the liveness stamp
    def brute(ttl: Int, schedule: List[List[Int]]): Seq[Long] = {
      val last = scala.collection.mutable.Map.empty[Int, Long]
      val admitted = scala.collection.mutable.ArrayBuffer.empty[Long]
      var nextId = 0L
      schedule.zipWithIndex.foreach { case (texts, b) =>
        val seenThisBatch = scala.collection.mutable.Set.empty[Int]
        texts.foreach { t =>
          val id = nextId; nextId += 1
          val livePrior = last.get(t).exists(lb => lb > b - ttl)
          if (!livePrior && !seenThisBatch(t)) admitted += id
          seenThisBatch += t
        }
        seenThisBatch.foreach(t => last(t) = b.toLong)
      }
      admitted.sorted.toSeq
    }

    def viaSpark(ttl: Int, schedule: List[List[Int]]): Seq[Long] = {
      var seen = StreamingDedup.emptyTtlState(spark)
      val admitted = scala.collection.mutable.ArrayBuffer.empty[Long]
      var nextId = 0L
      schedule.zipWithIndex.foreach { case (texts, b) =>
        val rows = texts.map { t => val id = nextId; nextId += 1; (id, pool(t)) }
        val batch = rows.toDF("doc_id", "text")
        val (kept, newSeen) = StreamingDedup.nearDupBatchStepTtl(
          batch, seen, b.toLong, ttl.toLong, "text", "doc_id", shingleSize = 1)
        admitted ++= kept.select("doc_id").collect().map(_.getLong(0))
        seen = newSeen
      }
      admitted.sorted.toSeq
    }

    val genCase = for {
      ttl <- Gen.choose(1, 3)
      nBatches <- Gen.choose(3, 5)
      schedule <- Gen.listOfN(nBatches,
        Gen.choose(0, 4).flatMap(sz => Gen.listOfN(sz, Gen.choose(0, pool.size - 1))))
    } yield (ttl, schedule)

    val prop = Prop.forAll(genCase) { case (ttl, schedule) =>
      val want = brute(ttl, schedule)
      val got = viaSpark(ttl, schedule)
      if (got != want)
        println(s"TTL property FALSIFIED: ttl=$ttl schedule=$schedule got=$got want=$want")
      got == want
    }
    val result = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(10)
        .withInitialSeed(org.scalacheck.rng.Seed(20260813L)),
      prop)
    assert(result.passed, s"ScalaCheck: $result")
  }

  test("dedupParagraphs ≡ brute global keep-first over random corpora (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // paragraph pool mixes short (exemption-eligible) and long strings,
    // drawn with replacement so cross-doc and within-doc repeats are common
    val pool: Vector[String] = Vector(
      "Hi", "Share", "x", "",
      "this paragraph is long enough to dedup one",
      "this paragraph is long enough to dedup two",
      "a third long paragraph that repeats across documents",
      "fourth distinct long paragraph body text here")

    def brute(docs: Seq[(Long, Option[String])], minChars: Int): Map[Long, Option[String]] = {
      val seen = scala.collection.mutable.Set[String]()
      docs.sortBy(_._1).map { case (id, textOpt) =>
        id -> textOpt.map { text =>
          val paras = text.split(java.util.regex.Pattern.quote("\n\n"), -1)
          paras.filter { p =>
            if (p.length < minChars) { seen += p; true } // exempt paras still REGISTER
            else if (seen.add(p)) true
            else false
          }.mkString("\n\n")
        }
      }.toMap
    }

    val genCase = for {
      nDocs <- Gen.choose(2, 7)
      minChars <- Gen.oneOf(0, 8, 30)
      texts <- Gen.listOfN(nDocs, Gen.frequency(
        1 -> Gen.const(Option.empty[String]),
        9 -> Gen.choose(0, 5).flatMap(k =>
          Gen.listOfN(k, Gen.oneOf(pool)).map(ps => Some(ps.mkString("\n\n"))))))
    } yield (texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }, minChars)

    val prop = Prop.forAll(genCase) { case (docs, minChars) =>
      val df = docs.toDF("doc_id", "text")
      val got = graft.ops.Dedup.dedupParagraphs(df, "text", "doc_id", minChars = minChars)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getString(1)))).toMap
      val want = brute(docs, minChars)
      if (got != want)
        println(s"dedupParagraphs FALSIFIED: minChars=$minChars docs=$docs got=$got want=$want")
      got == want
    }
    val result = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(30)
        .withInitialSeed(org.scalacheck.rng.Seed(20260814L)),
      prop)
    assert(result.passed, s"ScalaCheck: $result")
  }

  test("dedupSpans ≡ brute global keep-first window simulator (ScalaCheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // tiny token alphabet so windows collide constantly — the hard case
    val alphabet = Vector("a", "b", "c")

    def brute(docs: Seq[(Long, Option[String])], w: Int): Map[Long, Option[String]] = {
      val seen = scala.collection.mutable.Set[Seq[String]]()
      docs.sortBy(_._1).map { case (id, textOpt) =>
        id -> textOpt.map { text =>
          val toks = text.split("[ \t\n\f\r]+").filter(_.nonEmpty).toSeq
          val removed = Array.fill(toks.length)(false)
          for (p <- 0 to toks.length - w) {
            val win = toks.slice(p, p + w)
            if (!seen.add(win)) (p until p + w).foreach(removed(_) = true)
          }
          toks.zipWithIndex.collect { case (t, j) if !removed(j) => t }.mkString(" ")
        }
      }.toMap
    }

    val genCase = for {
      w <- Gen.choose(2, 4)
      nDocs <- Gen.choose(2, 6)
      texts <- Gen.listOfN(nDocs, Gen.frequency(
        1 -> Gen.const(Option.empty[String]),
        9 -> Gen.choose(0, 12).flatMap(k =>
          Gen.listOfN(k, Gen.oneOf(alphabet)).map(ts => Some(ts.mkString(" "))))))
    } yield (texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }, w)

    val prop = Prop.forAll(genCase) { case (docs, w) =>
      val df = docs.toDF("doc_id", "text")
      val got = graft.ops.Dedup.dedupSpans(df, "text", "doc_id", windowTokens = w)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getString(1)))).toMap
      val want = brute(docs, w)
      if (got != want)
        println(s"dedupSpans FALSIFIED: w=$w docs=$docs got=$got want=$want")
      got == want
    }
    val result = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(30)
        .withInitialSeed(org.scalacheck.rng.Seed(20260815L)),
      prop)
    assert(result.passed, s"ScalaCheck: $result")
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
