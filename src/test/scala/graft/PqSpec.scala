package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** IVF-PQ: codebook shape, soundness (refined sims are EXACT cosines — the
  * q37b discipline: approximation may only affect which candidates were
  * considered, never reported values), and recall vs the brute truth. */
class PqSpec extends SparkSpecBase {
  import spark.implicits._

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("fitPq: m codebooks of <=ksub centroids, dsub slices cover dim") {
    val pq = Similarity.fitPq(emb, "embedding", m = 8, ksub = 16)
    assert(pq.m == 8 && pq.dim == 64 && pq.dsub == 8)
    assert(pq.codebooks.size == 8)
    assert(pq.codebooks.forall(b => b.nonEmpty && b.size <= 16))
    assert(pq.codebooks.forall(_.forall(_.size == 8)))
    // fit is deterministic under the same seed
    val pq2 = Similarity.fitPq(emb, "embedding", m = 8, ksub = 16)
    assert(pq == pq2)
  }

  test("fitPq refuses non-dividing m and degenerate ksub") {
    intercept[IllegalArgumentException] {
      Similarity.fitPq(emb, "embedding", m = 7)
    }
    intercept[IllegalArgumentException] {
      Similarity.fitPq(emb, "embedding", ksub = 1)
    }
  }

  test("ivfpq emits exact cosines and stays above the recall floor") {
    val ivf = Similarity.fitIvf(emb, "embedding")
    val pq = Similarity.fitPq(emb, "embedding")
    val pred = col("vec_id") < 10
    val got = Similarity.searchIvfPq(ivf, pq, emb, "vec_id", "embedding", pred, 5)
      .localCheckpoint()
    // soundness: every emitted sim IS the recomputed exact cosine, up to
    // the search paths' shared round(sim, 6) output grid (q37b tolerance)
    val re = got
      .join(emb.select(col("vec_id").as("query_id"), col("embedding").as("qe")), "query_id")
      .join(emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne")), "neighbor_id")
      .select(col("sim"), Similarity.cosine(col("qe"), col("ne")).as("cos2"))
    assert(re.where(abs(col("sim") - col("cos2")) > 5.01e-7).count() == 0)
    // recall vs brute top-5 (same floor q90 pins under the driver grid)
    val brute = Similarity.bruteKnn(emb, "vec_id", "embedding", pred, 5)
      .select("query_id", "neighbor_id")
    val total = brute.count()
    val hits = brute.intersect(got.select("query_id", "neighbor_id")).count()
    assert(total >= 40, s"vacuous truth set: $total")
    assert(hits.toDouble / total >= 0.8, s"recall ${hits.toDouble / total}")
  }

  test("ivfpq all-pairs strategy: top-1 recall vs brute over the corpus") {
    val brute = Similarity.nearestNeighbors(emb, "vec_id", "embedding",
      strategy = "brute").select("doc_a", "doc_b").localCheckpoint()
    val pq = Similarity.nearestNeighbors(emb, "vec_id", "embedding",
      strategy = "ivfpq").select("doc_a", "doc_b")
    val total = brute.count()
    val hits = brute.intersect(pq).count()
    assert(total == 500)
    assert(hits.toDouble / total >= 0.7, s"top-1 recall ${hits.toDouble / total}")
  }

  test("materialized index search is identical to inline encoding") {
    val ivf = Similarity.fitIvf(emb, "embedding")
    val pq = Similarity.fitPq(emb, "embedding")
    val pred = col("vec_id") < 10
    val ix = Similarity.buildIvfPqIndex(ivf, pq, emb, "vec_id", "embedding")
    assert(ix.columns.toSeq == Seq("vec_id", "cell", "codes", "model_sig"))
    val inline = Similarity.searchIvfPq(ivf, pq, emb, "vec_id", "embedding", pred, 5)
    val indexed = Similarity.searchIvfPq(ivf, pq, emb, "vec_id", "embedding", pred, 5,
      index = Some(ix))
    assert(inline.collect().toSeq == indexed.collect().toSeq)
    intercept[IllegalArgumentException] {
      Similarity.searchIvfPq(ivf, pq, emb, "vec_id", "embedding", pred, 5,
        index = Some(ix.drop("codes")))
    }
    // an index built under RETRAINED models must fail fast, not silently
    // probe wrong cells (the model_sig fingerprint check)
    val ivf2 = Similarity.fitIvf(emb, "embedding", seed = 99L)
    val pq2 = Similarity.fitPq(emb, "embedding", seed = 99L)
    assert(Similarity.modelSig(ivf2, pq2) != Similarity.modelSig(ivf, pq))
    intercept[IllegalArgumentException] {
      Similarity.searchIvfPq(ivf2, pq2, emb, "vec_id", "embedding", pred, 5,
        index = Some(ix))
    }
    // a MIXED-generation index (append/partial rebuild leaves rows from
    // two fits) must also fail — under either model pair — not pass on
    // whichever generation's row a 1-row sample happens to read
    val ix2 = Similarity.buildIvfPqIndex(ivf2, pq2, emb, "vec_id", "embedding")
    val mixed = ix.unionByName(ix2)
    intercept[IllegalArgumentException] {
      Similarity.searchIvfPq(ivf, pq, emb, "vec_id", "embedding", pred, 5,
        index = Some(mixed))
    }
    intercept[IllegalArgumentException] {
      Similarity.searchIvfPq(ivf2, pq2, emb, "vec_id", "embedding", pred, 5,
        index = Some(mixed))
    }
  }

  test("residual encoding: mean offsets reduce reconstruction error, " +
    "recall holds the floor, model is deterministic and sig-distinct") {
    // WHY no "residual rescues low-m recall" assertion: the fixture is
    // near-isotropic (pair cosine ≈ 0), so cell means have norm ≈ 0.2 and
    // residual's guaranteed energy reduction is only |μ_cell|² ≈ 4% —
    // invisible under recall measurement noise. What residual DOES
    // guarantee — E|x̂ − μ_cell|² = 1 − |μ_cell|² ≤ E|x̂|², i.e. a strictly
    // better code-budget target — is asserted directly on reconstruction
    // quality below. (Subtracting the UNIT IVF centroid instead, the naive
    // reading of "residual", yields |x̂ − c| up to √2 and measurably WORSE
    // codes: recon cosine 0.58 vs 0.68 raw at m=8/ksub=16 — the offsets
    // field exists precisely because of that trap.)
    val ivf = Similarity.fitIvf(emb, "embedding")
    val raw = Similarity.fitPq(emb, "embedding", m = 8, ksub = 16)
    val res = Similarity.fitPq(emb, "embedding", m = 8, ksub = 16,
      residualOf = Some(ivf))
    assert(!raw.residual && res.residual)
    assert(res.offsets.size == ivf.centroids.size)
    // mean offsets live strictly inside the unit ball on isotropic data
    assert(res.offsets.forall(o => math.sqrt(o.map(x => x * x).sum) < 0.9))
    // the flag and offsets participate in the index fingerprint: a raw
    // index can't be searched with a residual model of identical shape
    assert(Similarity.modelSig(ivf, raw) != Similarity.modelSig(ivf, res))
    // reconstruction: decode(code) [+ μ_cell] vs the true unit vector —
    // residual must beat raw (deterministic: fixed seeds, fixed corpus)
    def reconCosine(pq: Similarity.PqModel): Double = {
      val ix = Similarity.buildIvfPqIndex(ivf, pq, emb, "vec_id", "embedding")
      val cb = typedlit(pq.codebooks)
      val decoded = (0 until pq.m).map { j =>
        element_at(cb.getItem(j), element_at(col("codes"), j + 1) + 1)
      }.reduce(concat(_, _))
      val full =
        if (pq.residual)
          zip_with(decoded,
            element_at(typedlit(pq.offsets), (col("cell") + 1).cast("int")),
            (a, b) => a + b)
        else decoded
      ix.join(emb, "vec_id")
        .agg(avg(Similarity.cosine(col("embedding"), full))).head().getDouble(0)
    }
    val rcRes = reconCosine(res)
    val rcRaw = reconCosine(raw)
    assert(rcRes > rcRaw,
      s"residual recon cosine $rcRes should beat raw $rcRaw at m=8/ksub=16")
    // end-to-end: the default-setting residual path holds the q90 floor
    val resDefault = Similarity.fitPq(emb, "embedding", residualOf = Some(ivf))
    val pred = col("vec_id") < 10
    val brute = Similarity.bruteKnn(emb, "vec_id", "embedding", pred, 5)
      .select("query_id", "neighbor_id").localCheckpoint()
    val total = brute.count()
    assert(total >= 40, s"vacuous truth set: $total")
    val got = Similarity.searchIvfPq(ivf, resDefault, emb, "vec_id", "embedding",
      pred, 5).select("query_id", "neighbor_id")
    val recall = brute.intersect(got).count().toDouble / total
    assert(recall >= 0.8, s"default residual recall $recall < 0.8")
    // determinism: same seed, same corpus → identical offsets + codebooks
    assert(res == Similarity.fitPq(emb, "embedding", m = 8, ksub = 16,
      residualOf = Some(ivf)))
  }

  test("refineFactor=1 narrows candidates but keeps soundness and k bound") {
    val ivf = Similarity.fitIvf(emb, "embedding")
    val pq = Similarity.fitPq(emb, "embedding")
    val got = Similarity.searchIvfPq(ivf, pq, emb, "vec_id", "embedding",
      col("vec_id") < 5, k = 3, refineFactor = 1)
    val perQuery = got.groupBy("query_id").count().collect()
    assert(perQuery.nonEmpty && perQuery.forall(_.getLong(1) <= 3))
  }

  test("centroid kernel: argmax/topN match brute dots with lowest-index ties (any cell count)") {
    // the native loop must reproduce the old unrolled convention exactly:
    // argmax = first index of the max dot; topN ordered (dot desc, idx asc)
    val rnd = new scala.util.Random(7)
    val k = 1500 // above the OLD 1024 codegen cap on purpose
    val dim = 16
    val cm = Seq.tabulate(k, dim)((_, _) => rnd.nextGaussian())
    val vecs = Seq.tabulate(40, dim)((_, _) => rnd.nextGaussian())
    def dots(v: Seq[Double]): Seq[Double] =
      cm.map(c => c.zip(v).map { case (a, b) => a * b }.sum)
    val df = vecs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("i", "v")
      .select(col("i"),
        graft.functions.VectorFunctions.centroidArgmax(col("v"), cm).as("am"),
        graft.functions.VectorFunctions.centroidTopN(col("v"), cm, 5).as("t5"))
      .orderBy("i").collect()
    df.foreach { r =>
      val v = vecs(r.getInt(0))
      val d = dots(v)
      val wantArg = d.indexOf(d.max)
      assert(r.getInt(1) == wantArg)
      val wantTop = d.zipWithIndex.sortBy { case (s, i) => (-s, i) }.take(5).map(_._2)
      assert(r.getSeq[Int](2) == wantTop)
    }
    // exact ties resolve to the lowest centroid index
    val tied = Seq((0, Seq(1.0, 0.0))).toDF("i", "v")
      .select(
        graft.functions.VectorFunctions.centroidArgmax(col("v"),
          Seq(Seq(0.5, 0.0), Seq(0.5, 0.0), Seq(0.2, 0.0))).as("am"),
        graft.functions.VectorFunctions.centroidTopN(col("v"),
          Seq(Seq(0.5, 0.0), Seq(0.5, 0.0), Seq(0.2, 0.0)), 3).as("t"))
      .head()
    assert(tied.getInt(0) == 0)
    assert(tied.getSeq[Int](1) == Seq(0, 1, 2))
    // n beyond k truncates; NULL vector -> NULL out
    val edge = Seq((0, Some(Seq(1.0, 0.0))), (1, None)).toDF("i", "v")
      .select(col("i"),
        graft.functions.VectorFunctions.centroidTopN(col("v"),
          Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)), 9).as("t"))
      .orderBy("i").collect()
    assert(edge(0).getSeq[Int](1) == Seq(0, 1))
    assert(edge(1).isNullAt(1))
  }

  test("pq kernel: encode/adc match brute per-subspace math (lowest-index ties)") {
    val rnd = new scala.util.Random(11)
    val m = 4; val ksub = 8; val dsub = 3
    val books = Seq.tabulate(m, ksub, dsub)((_, _, _) => rnd.nextGaussian())
    val vecs = Seq.tabulate(25, m * dsub)((_, _) => rnd.nextGaussian())
    def bruteCodes(v: Seq[Double]): Seq[Int] = (0 until m).map { j =>
      val sub = v.slice(j * dsub, (j + 1) * dsub)
      val scores = books(j).map(c =>
        c.zip(sub).map { case (a, b) => a * b }.sum - c.map(x => x * x).sum / 2)
      scores.indexOf(scores.max)
    }
    def bruteAdc(v: Seq[Double], codes: Seq[Int]): Double = (0 until m).map { j =>
      books(j)(codes(j)).zip(v.slice(j * dsub, (j + 1) * dsub))
        .map { case (a, b) => a * b }.sum
    }.sum
    val rows = vecs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("i", "v")
      .select(col("i"), col("v"),
        graft.functions.VectorFunctions.pqEncode(col("v"), books).as("codes"))
      .select(col("i"), col("codes"),
        graft.functions.VectorFunctions.pqAdc(col("v"), col("codes"), books).as("adc"))
      .orderBy("i").collect()
    rows.foreach { r =>
      val v = vecs(r.getInt(0))
      val wantCodes = bruteCodes(v)
      assert(r.getSeq[Int](1) == wantCodes)
      assert(math.abs(r.getDouble(2) - bruteAdc(v, wantCodes)) < 1e-12)
    }
  }

  test("listsFor tracks corpus size past the old 1024-cell cap") {
    import graft.ops.Similarity.listsFor
    assert(listsFor(200000) == 1563) // the x100 rehearsal size
    assert(listsFor(1000000) == 7813)
    assert(listsFor(100000000) == 8192) // new cap
  }
}
