package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** SemDeDup (Abbas et al. 2023) — deterministic Lloyd fit + cluster-bounded
  * near-dup drops, verified against an independent brute simulator that
  * re-implements the grid-quantized contract in plain Scala. */
class SemDedupSpec extends SparkSpecBase {
  import spark.implicits._

  private def gridKey(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong

  private def unitize(v: Array[Double]): Option[Array[Double]] = {
    var sq = 0.0; var i = 0
    while (i < v.length) { sq += v(i) * v(i); i += 1 }
    val n = math.sqrt(sq)
    if (n > 0) Some(v.map(_ / n)) else None
  }

  private def dotv(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** Brute Lloyd under the engine contract: quantized argmax (ties to the
    * lowest cluster), dimension-order mean renormalization, empty-cluster
    * carry-forward. `initIds` is the (unif, id)-ordered seed list. */
  private def bruteLloyd(
      units: Map[Long, Array[Double]],
      initIds: Seq[Long],
      iters: Int): (Map[Long, (Int, Double)], IndexedSeq[Array[Double]]) = {
    var cent: IndexedSeq[Array[Double]] = initIds.map(units).toIndexedSeq
    def assign(): Map[Long, (Int, Double)] = units.map { case (id, u) =>
      var best = 0; var bestKey = Long.MinValue; var bestDot = Double.NegativeInfinity
      cent.indices.foreach { c =>
        val d = dotv(u, cent(c))
        val key = gridKey(d)
        if (key > bestKey) { bestKey = key; bestDot = d; best = c }
      }
      id -> (best, bestDot)
    }
    (1 to iters).foreach { _ =>
      val a = assign()
      cent = cent.indices.map { c =>
        val members = units.collect { case (id, u) if a(id)._1 == c => u }
        if (members.isEmpty) cent(c)
        else {
          val dim = cent(c).length
          val mean = Array.tabulate(dim)(j => members.map(_(j)).sum / members.size)
          unitize(mean).getOrElse(cent(c))
        }
      }
    }
    (assign(), cent)
  }

  private def bruteDrops(
      a: Map[Long, (Int, Double)],
      units: Map[Long, Array[Double]],
      th6: Long,
      keep: String): Set[Long] = {
    def pri(id: Long): (Long, Long) = keep match {
      case "first"        => (0L, id)
      case "centroid_far" => (gridKey(a(id)._2), id)
    }
    a.keySet.filter { x =>
      a.keySet.exists { y =>
        y != x && a(y)._1 == a(x)._1 &&
          Ordering[(Long, Long)].lt(pri(y), pri(x)) &&
          gridKey(dotv(units(x), units(y))) >= th6
      }
    }
  }

  private def loadUnits(df: org.apache.spark.sql.DataFrame): Map[Long, Array[Double]] =
    df.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .flatMap { r =>
        Option(r.get(1)).flatMap(_ =>
          unitize(r.getSeq[Double](1).toArray).map(u => r.getLong(0) -> u))
      }
      .toMap

  /** The engine's init order, read back through the same seeded-unif
    * column the fit uses (the hash arithmetic itself is pinned by the
    * Sampling oracles — here we verify the Lloyd recursion around it). */
  private def initOrder(
      df: org.apache.spark.sql.DataFrame, seed: Long, k: Int): Seq[Long] = {
    val vd = col("embedding").cast("array<double>")
    val n = sqrt(graft.functions.VectorFunctions.dotProduct(vd, vd))
    df.where(col("embedding").isNotNull && n > 0)
      .select(col("vec_id"), graft.ops.Sampling.unif(Seq("vec_id"), seed).as("u"))
      .orderBy(col("u"), col("vec_id"))
      .limit(k)
      .collect()
      .map(_.getLong(0))
      .toSeq
  }

  test("CentroidBest kernel: grid argmax with ties to the lowest cluster") {
    val cents = Seq(Seq(1.0, 0.0), Seq(1.0, 0.0), Seq(0.0, 1.0))
    val df = Seq(
      Tuple1(Array(1.0, 0.0)), // ties cluster 0 vs 1 → 0
      Tuple1(Array(0.1, 0.9)), // cluster 2
      Tuple1(null.asInstanceOf[Array[Double]])).toDF("v")
    val got = df.select(
      graft.functions.VectorFunctions.centroidBest(col("v"), cents).as("b")).collect()
    assert(got(0).getStruct(0).getInt(0) == 0)
    assert(math.abs(got(0).getStruct(0).getDouble(1) - 1.0) < 1e-12)
    assert(got(1).getStruct(0).getInt(0) == 2)
    assert(got(2).isNullAt(0))
  }

  test("CentroidBest: sub-1e-6 dot differences are grid ties (lowest cluster wins)") {
    // cluster 1's dot is 1e-8 larger — below the grid, so cluster 0 keeps it
    val cents = Seq(Seq(0.5, 0.0), Seq(0.5 + 1e-8, 0.0))
    val df = Seq(Tuple1(Array(1.0, 0.0))).toDF("v")
    val got = df.select(
      graft.functions.VectorFunctions.centroidBest(col("v"), cents).as("b"))
      .head().getStruct(0)
    assert(got.getInt(0) == 0)
  }

  test("fitLloyd + semDedupReport match the brute simulator on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val (k, iters, seed, th) = (4, 2, 7L, 0.25)
    val units = loadUnits(emb)
    val init = initOrder(emb, seed, k)
    val (ba, bcent) = bruteLloyd(units, init, iters)

    val model = Similarity.fitLloyd(emb, "vec_id", "embedding", k, iters, seed)
    assert(model.k == k)
    model.centroids.zip(bcent).foreach { case (got, want) =>
      got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-9) }
    }

    Seq("first", "centroid_far").foreach { keep =>
      val wantDrops = bruteDrops(ba, units, gridKey(th), keep)
      val rep = Similarity.semDedupReport(emb, "vec_id", "embedding", th,
        k, iters, seed, keep).collect()
      assert(rep.length == emb.count())
      val gotDrops = rep.filter(!_.getBoolean(3)).map(_.getLong(0)).toSet
      assert(gotDrops == wantDrops, s"keep=$keep")
      rep.filter(r => !r.isNullAt(1)).foreach { r =>
        val (bc, bd) = ba(r.getLong(0))
        assert(r.getInt(1) == bc)
        assert(math.abs(r.getDouble(2) - bd) < 1e-9)
      }
    }
  }

  test("semDedup: exact duplicate vectors drop within a cluster; keep rules differ") {
    // ids 10/11/12 are the same direction (near-dups); 20/21 another; 30 alone
    val df = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f)),
      (11L, Array(2.0f, 0.0f, 0.0f)),
      (12L, Array(0.99f, 0.01f, 0.0f)),
      (20L, Array(0.0f, 1.0f, 0.0f)),
      (21L, Array(0.0f, 1.0f, 0.02f)),
      (30L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val kept = Similarity.semDedup(df, "vec_id", "embedding", 0.98,
      k = 3, iters = 2, seed = 1L, keep = "first")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // keep-first: the smallest id of each duplicate group survives
    assert(kept.contains(10L) && kept.contains(20L) && kept.contains(30L))
    assert(!kept.contains(11L))
    // members of a pair are only comparable if clustered together — with
    // k=3 on 3 clean directions they are; 12 is within 0.98 of 10 → dropped
    assert(!kept.contains(12L) && !kept.contains(21L))
  }

  test("semDedup contracts: NULL and zero vectors pass through; high threshold keeps all") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f)),
      (4L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding")
    val rep = Similarity.semDedupReport(df, "vec_id", "embedding", 2.0,
      k = 2, iters = 1, seed = 3L).collect().sortBy(_.getLong(0))
    assert(rep.length == 4)
    // threshold 2.0 is unreachable → everything kept
    assert(rep.forall(_.getBoolean(3)))
    // zero/NULL vectors: NULL cluster and sim
    assert(rep(2).isNullAt(1) && rep(2).isNullAt(2))
    assert(rep(3).isNullAt(1) && rep(3).isNullAt(2))
    // identical vectors DO drop once the threshold is real
    val kept = Similarity.semDedup(df, "vec_id", "embedding", 0.999,
      k = 2, iters = 1, seed = 3L, keep = "first")
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L))
  }

  test("fitLloyd: empty clusters carry their previous centroid; determinism") {
    // 3 points, k=3, but two points share a direction → some cluster may
    // end up empty after reassignment; fit must not NPE and must be stable
    val df = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(1.0f, 1e-7f)),
      (3L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val m1 = Similarity.fitLloyd(df, "vec_id", "embedding", 3, iters = 3, seed = 5L)
    val m2 = Similarity.fitLloyd(df, "vec_id", "embedding", 3, iters = 3, seed = 5L)
    assert(m1 == m2)
    assert(m1.k == 3)
    m1.centroids.foreach { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9)
    }
  }

  /** Brute two-level route under the engine contract: top-nProbe coarse
    * cells by (grid key desc, cell asc), fine argmax visited in ascending
    * cell order (ties to the lowest GLOBAL fine id). */
  private def bruteTwoLevel(
      u: Array[Double],
      coarse: Seq[Seq[Double]],
      fineByCell: Seq[Seq[Seq[Double]]],
      nProbe: Int): (Int, Double) = {
    val probed = coarse.zipWithIndex
      .map { case (c, i) => (gridKey(dotv(u, c.toArray)), i) }
      .sortBy { case (k, i) => (-k, i) }
      .take(nProbe).map(_._2).sorted
    val offsets = fineByCell.scanLeft(0)(_ + _.size)
    var best = -1; var bestKey = Long.MinValue; var bestDot = Double.NegativeInfinity
    probed.foreach { c =>
      fineByCell(c).zipWithIndex.foreach { case (f, j) =>
        val d = dotv(u, f.toArray)
        val key = gridKey(d)
        if (key > bestKey) { bestKey = key; bestDot = d; best = offsets(c) + j }
      }
    }
    (best, bestDot)
  }

  test("TwoLevelBest kernel: probe-all ≡ global CentroidBest; NULL → NULL") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val m = Similarity.fitLloydTwoLevel(emb, "vec_id", "embedding",
      kCoarse = 3, kFinePerCell = 4, itersCoarse = 1, itersFine = 2, seed = 9L)
    // probing EVERY coarse cell makes the fine argmax run over the full
    // global centroid list in ascending global-id order — exactly
    // CentroidBest's contract over the flattened centroids
    val both = emb.select(
      graft.functions.VectorFunctions.twoLevelBest(
        col("embedding").cast("array<double>"),
        m.coarse, m.fineByCell, m.kCoarse).as("tl"),
      graft.functions.VectorFunctions.centroidBest(
        col("embedding").cast("array<double>"), m.globalCentroids).as("g"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1))
      else {
        assert(r.getStruct(0).getInt(0) == r.getStruct(1).getInt(0))
        assert(math.abs(r.getStruct(0).getDouble(1) - r.getStruct(1).getDouble(1)) < 1e-12)
      }
    }
    val nullRow = Seq(Tuple1(null.asInstanceOf[Array[Double]])).toDF("v")
      .select(graft.functions.VectorFunctions.twoLevelBest(
        col("v"), m.coarse, m.fineByCell, 1).as("b")).head()
    assert(nullRow.isNullAt(0))
  }

  test("TwoLevelBest kernel: nProbe routing matches the brute simulator") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val m = Similarity.fitLloydTwoLevel(emb, "vec_id", "embedding",
      kCoarse = 4, kFinePerCell = 3, itersCoarse = 2, itersFine = 1, seed = 2L)
    val units = loadUnits(emb)
    Seq(1, 2).foreach { nProbe =>
      val got = Similarity.assignTwoLevel(m, emb, "vec_id", "embedding", nProbe)
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
      units.foreach { case (id, u) =>
        val (bc, bd) = bruteTwoLevel(u, m.coarse, m.fineByCell, nProbe)
        assert(got(id)._1 == bc, s"id=$id nProbe=$nProbe")
        assert(math.abs(got(id)._2 - bd) < 1e-9)
      }
    }
  }

  test("fitLloydTwoLevel: determinism, unit-norm centroids, derived sizing, raggedness") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val m1 = Similarity.fitLloydTwoLevel(emb, "vec_id", "embedding",
      itersCoarse = 2, itersFine = 2, seed = 11L, targetClusterRows = 16)
    val m2 = Similarity.fitLloydTwoLevel(emb, "vec_id", "embedding",
      itersCoarse = 2, itersFine = 2, seed = 11L, targetClusterRows = 16)
    assert(m1 == m2)
    val n = emb.where(col("embedding").isNotNull).count()
    val kTotal = math.max(2, math.ceil(n / 16.0).toInt)
    val kc = math.ceil(math.sqrt(kTotal.toDouble)).toInt
    assert(m1.kCoarse <= kc) // empty coarse cells may drop
    assert(m1.kFineTotal <= kc * math.ceil(kTotal.toDouble / kc).toInt)
    assert(m1.kFineTotal >= m1.kCoarse) // ≥ 1 fine centroid per live cell
    (m1.coarse ++ m1.globalCentroids).foreach { c =>
      assert(math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-9)
    }
    // a tiny corpus with kFinePerCell above the cell population must fit
    // ragged (cells keep only their member count) without erroring
    val tiny = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val mt = Similarity.fitLloydTwoLevel(tiny, "vec_id", "embedding",
      kCoarse = 2, kFinePerCell = 5, itersCoarse = 1, itersFine = 1, seed = 1L)
    assert(mt.kFineTotal <= 3)
    assert(mt.fineByCell.forall(_.nonEmpty))
  }

  test("semDedupTwoLevel: drops follow the exact rule under ITS model; agreement floor vs exact path") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val th = 0.25
    val units = loadUnits(emb)
    val m = Similarity.fitLloydTwoLevel(emb, "vec_id", "embedding",
      itersCoarse = 2, itersFine = 2, seed = 7L, targetClusterRows = 64)
    // brute assignment under the two-level route, then the SAME drop rule
    val ba = units.map { case (id, u) =>
      id -> bruteTwoLevel(u, m.coarse, m.fineByCell, 1)
    }
    Seq("first", "centroid_far").foreach { keep =>
      val wantDrops = bruteDrops(ba, units, gridKey(th), keep)
      val rep = Similarity.semDedupTwoLevelReport(emb, "vec_id", "embedding",
        th, itersCoarse = 2, itersFine = 2, seed = 7L, keep = keep,
        model = Some(m), targetClusterRows = 64).collect()
      val gotDrops = rep.filter(!_.getBoolean(3)).map(_.getLong(0)).toSet
      assert(gotDrops == wantDrops, s"keep=$keep")
    }
  }

  test("groupForRouting: same centroid SET, routed decisions near-agree with exact") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val th = 0.25
    val lloyd = Similarity.fitLloyd(emb, "vec_id", "embedding", k = 0,
      iters = 2, seed = 7L, targetClusterRows = 64)
    val routed = Similarity.groupForRouting(lloyd)
    // the wrap must preserve the centroid set exactly
    assert(routed.kFineTotal == lloyd.k)
    assert(routed.globalCentroids.map(_.toList).toSet ==
      lloyd.centroids.map(_.toList).toSet)
    assert(routed.kCoarse <= math.ceil(math.sqrt(lloyd.k.toDouble)).toInt)
    val exact = Similarity.semDedupReport(emb, "vec_id", "embedding", th,
      seed = 7L, model = Some(lloyd))
      .select("vec_id", "kept").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    def agreeAt(nProbe: Int): Double = {
      val twol = Similarity.semDedupTwoLevelReport(emb, "vec_id", "embedding",
        th, seed = 7L, model = Some(routed), nProbe = nProbe)
        .select("vec_id", "kept").collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      exact.count { case (id, k) => twol(id) == k }.toDouble / exact.size
    }
    // the sf0.001 embeddings are near-isotropic — the WORST case for
    // routing (coarse cells barely separate); real clustered corpora route
    // far better. Even here: measured 0.734 / 0.894 / 1.0 at nProbe 1/2/3
    val a2 = agreeAt(2)
    assert(a2 >= agreeAt(1) - 1e-12)
    assert(a2 >= 0.85, s"nProbe=2 agreement $a2 below floor")
    // at nProbe = kCoarse the fine argmax sees every centroid of the SAME
    // set → the partition is identical to exact (pure relabelling), so the
    // decisions must match EXACTLY — the mathematical identity, not a floor
    assert(agreeAt(routed.kCoarse) == 1.0)
  }

  test("fitLloyd: k=0 derives the cluster count from the corpus size") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val m = Similarity.fitLloyd(emb, "vec_id", "embedding", k = 0,
      iters = 1, seed = 1L, targetClusterRows = 16)
    // clusterable count / 16 per cluster, ceil (listsFor floor of 2)
    val n = emb.where(col("embedding").isNotNull).count()
    assert(m.k == math.max(2, math.ceil(n / 16.0).toInt))
  }
}
