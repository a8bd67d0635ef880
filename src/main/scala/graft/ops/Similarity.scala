package graft.ops

import scala.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *   - [[bruteKnn]]: exact cosine top-k — the baseline. Query set is tiny
  *     (broadcast), corpus is scanned once; the per-query top-k is a window
  *     rank over the scored pairs (shuffles query_id × corpus rows — fine
  *     when |queries| is small, which is the brute-force contract).
  *   - [[annLsh]]: random-hyperplane LSH (sign-bit buckets + multi-probe) —
  *     the 100 TB path. Scoring happens only inside matching buckets, so the
  *     join shuffles bucket keys, not the full cross product. Hyperplanes
  *     are a deterministic seeded literal (no driver-side state to ship).
  *
  * All vector math is higher-order-function expressions (`zip_with` +
  * `aggregate`) — codegen'd, no UDFs, no Python.
  */
object Similarity {

  private def toDouble(v: Column): Column = v.cast("array<double>")

  /** Native codegen'd dot product ([[graft.functions.DotProduct]]) — the
    * zip_with/aggregate HOF equivalent runs interpreted and dominates
    * pairwise-scoring wall-clock by an order of magnitude. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, computed as dot/(|a|·|b|) in double; NULL for
    * zero-norm vectors (ANSI-safe). */
  def cosine(a: Column, b: Column): Column = {
    val (ad, bd) = (toDouble(a), toDouble(b))
    graft.core.WeightedMoments.safeDiv(dot(ad, bd), norm(ad) * norm(bd))
  }

  /** Exact top-k cosine neighbors for every vector matching `queryPred`.
    * Output: (query_id, neighbor_id, rank, sim) — rank 1..k, ties broken by
    * neighbor id for determinism. */
  def bruteKnn(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      k: Int): DataFrame = {
    // carry a per-row norm scalar; per-ELEMENT normalization would evaluate
    // the O(d) norm inside the transform lambda for every element (O(d²)),
    // since HOF lambdas run interpreted and nothing hoists across them
    val (q, c) = prepNorm(df, idCol, vecCol, queryPred)
    val scored = broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.core.WeightedMoments.safeDiv(
          dot(col("qv"), col("nv")), col("qn") * col("nn")).as("sim"))
    topK(scored, k)
  }

  /** (queries, corpus) with raw double vectors + precomputed norms. */
  private def prepNorm(df: DataFrame, idCol: String, vecCol: String, queryPred: Column)
      : (DataFrame, DataFrame) = {
    val prepped = df.select(col(idCol).as("__id__"), toDouble(col(vecCol)).as("__v__"))
      .withColumn("__n__", norm(col("__v__")))
    val q = prepped.where(queryPred)
      .select(col("__id__").as("query_id"), col("__v__").as("qv"), col("__n__").as("qn"))
    val c = prepped
      .select(col("__id__").as("neighbor_id"), col("__v__").as("nv"), col("__n__").as("nn"))
    (q, c)
  }

  /** Per-query top-k of a (query_id, neighbor_id, sim) set. k=1 uses a hash
    * aggregate (`max(struct)` with map-side partial aggregation — the n²
    * scored rows never hit the shuffle); k>1 uses a rank window (shuffle
    * carries only the 3 scalar columns, arrays were dropped at scoring). */
  private def topK(scored: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked =
      if (k == 1) {
        // min-of-struct on (−sim, id): max sim first, ties to the smallest
        // id — negating sim (always double) instead of the id keeps the
        // fast path valid for string ids too. NULL sims sort worst, like
        // the window path's `desc` (nulls-last) ordering.
        val negSim = when(col("sim").isNotNull, -col("sim")).otherwise(lit(Double.MaxValue))
        scored
          .groupBy("query_id")
          .agg(min(struct(negSim.as("negsim"), col("neighbor_id").as("neighbor_id"),
            col("sim").as("sim"))).as("best"))
          .select(col("query_id"), col("best.neighbor_id").as("neighbor_id"),
            lit(1).as("rank"), col("best.sim").as("sim"))
      } else {
        val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
        scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      }
    ranked
      .select(col("query_id"), col("neighbor_id"), col("rank"), round(col("sim"), 6).as("sim"))
      .orderBy("query_id", "rank")
  }

  /** Deterministic seeded hyperplanes as ONE literal array-of-arrays
    * (`typedlit`, not nested `array(lit…)`: the latter would rebuild the
    * plane matrix expression per row). */
  private def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Column = {
    val rnd = new Random(seed)
    typedlit((0 until nPlanes).map(_ => (0 until dim).map(_ => rnd.nextGaussian())))
  }

  /** Sign-bit LSH bucket id of a vector under `planes`. */
  def lshBucket(vec: Column, planes: Column, nPlanes: Int): Column =
    (0 until nPlanes).map { i =>
      when(dot(vec, planes.getItem(i)) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** All XOR masks of `bits` bits with popcount ≤ maxHamming. */
  private def probeMasks(bits: Int, maxHamming: Int): Seq[Long] =
    (0L until (1L << bits)).filter(m => java.lang.Long.bitCount(m) <= maxHamming)

  /** Approximate top-k cosine neighbors via random-hyperplane LSH with
    * multi-probe (each query also probes every bucket within `maxProbe`
    * sign-bit flips, recovering most cross-boundary neighbors). Same output
    * schema as [[bruteKnn]]. Recall/cost dial: more planes → smaller
    * buckets; larger `maxProbe` → more buckets probed. */
  def annLsh(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      k: Int,
      nPlanes: Int = 6,
      dim: Int = 64,
      seed: Long = 42L,
      maxProbe: Int = 2): DataFrame = {
    val planes = hyperplanes(nPlanes, dim, seed)
    // raw vectors + norm scalar (sign bits are norm-invariant, so buckets
    // come straight from the raw dot products)
    val prepped = df.select(col(idCol).as("__id__"), toDouble(col(vecCol)).as("__v__"))
      .withColumn("__n__", norm(col("__v__")))
      .withColumn("__bucket__", lshBucket(col("__v__"), planes, nPlanes))
    val corpus = prepped.select(col("__bucket__").as("bucket"),
      col("__id__").as("neighbor_id"), col("__v__").as("nv"), col("__n__").as("nn"))
    // queries probe their own bucket + every bucket within maxProbe bit flips
    val probes = array(probeMasks(nPlanes, maxProbe).map(lit): _*)
    val q = prepped.where(queryPred)
      .select(col("__id__").as("query_id"), col("__v__").as("qv"), col("__n__").as("qn"),
        explode(transform(probes, f => col("__bucket__").bitwiseXOR(f))).as("bucket"))
    val scored = broadcast(q).join(corpus, Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.core.WeightedMoments.safeDiv(
          dot(col("qv"), col("nv")), col("qn") * col("nn")).as("sim"))
      .groupBy("query_id", "neighbor_id").agg(max("sim").as("sim")) // dedup multi-probe hits
    topK(scored, k)
  }

  /** IVF (inverted-file) ANN: a KMeans coarse quantizer assigns every
    * vector to its nearest of `nLists` centroid cells; queries score only
    * the vectors in their `nProbe` closest cells. The classic
    * cluster-structured alternative to [[annLsh]]: training is one ML
    * KMeans fit (itself distributed), assignment is a codegen'd argmax of
    * centroid dot products over a `typedlit` centroid matrix, and the probe
    * join shuffles cell keys rather than the cross product. Same output
    * schema as [[bruteKnn]].
    */
  def annIvf(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      k: Int,
      nLists: Int = 16,
      nProbe: Int = 4,
      seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.sql.expressions.Window

    // raw vectors + norm scalar; centroid ARGMAX is norm-invariant per row,
    // so assignment/probing use raw dots and only the final sim divides
    val prepped = df.select(col(idCol).as("__id__"), toDouble(col(vecCol)).as("__v__"))
      .withColumn("__n__", norm(col("__v__")))

    // coarse quantizer: KMeans on normalized vectors (euclidean argmin on
    // unit vectors ≡ cosine argmax). Trained on a bounded sample packed
    // into one cached partition — quantizer quality needs only a sample,
    // and per-iteration job overhead on many tiny partitions would
    // otherwise dominate the fit. (Per-element normalization is O(d²) but
    // runs on ≤ maxTrainRows sample rows only.)
    val maxTrainRows = 20000
    val trainDf = prepped.limit(maxTrainRows) // bounded w/o a counting job
      .select(array_to_vector(transform(col("__v__"),
        x => graft.core.WeightedMoments.safeDiv(x, col("__n__")))).as("features"))
      .coalesce(1).cache()
    val model = new KMeans().setK(nLists).setSeed(seed).setMaxIter(10).fit(trainDf)
    trainDf.unpersist()
    val centroids = model.clusterCenters.map { c =>
      val arr = c.toArray
      val n = math.sqrt(arr.map(x => x * x).sum)
      if (n == 0) arr.toSeq else arr.map(_ / n).toSeq
    }.toSeq
    val cm = typedlit(centroids)

    // per-row centroid scores; corpus keeps argmax cell, queries keep nProbe
    def cellScores = array(centroids.indices.map(i => dot(col("__v__"), cm.getItem(i))): _*)
    val corpus = prepped
      .withColumn("cell", array_position(cellScores, array_max(cellScores)) - 1)
      .select(col("cell"), col("__id__").as("neighbor_id"),
        col("__v__").as("nv"), col("__n__").as("nn"))
    val q = prepped.where(queryPred)
      .select(col("__id__").as("query_id"), col("__v__").as("qv"), col("__n__").as("qn"),
        posexplode(cellScores).as(Seq("cell", "cscore")))
    val qProbes = q
      .withColumn("crank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cscore").desc, col("cell"))))
      .where(col("crank") <= nProbe)
      .select(col("query_id"), col("qv"), col("qn"), col("cell"))
    val scored = broadcast(qProbes).join(corpus, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.core.WeightedMoments.safeDiv(
          dot(col("qv"), col("nv")), col("qn") * col("nn")).as("sim"))
      .groupBy("query_id", "neighbor_id").agg(max("sim").as("sim"))
    topK(scored, k)
  }

  /** Embedding-cosine near-duplicates: nearest neighbor of every vector
    * (k=1 brute force over the full corpus — O(n²) scoring, one shuffle for
    * the top-1; the LSH path above is the scale variant). */
  def nearestNeighbors(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    bruteKnn(df, idCol, vecCol, lit(true), 1)
      .select(col("query_id").as("doc_a"), col("neighbor_id").as("doc_b"), col("sim"))
}
