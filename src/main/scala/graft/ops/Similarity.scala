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

  /** Monotone uniquifier for [[fitPq]]'s cancellation job groups (see
    * the group-id comment there). */
  private val FitPqGroupCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  private def toDouble(v: Column): Column = v.cast("array<double>")

  /** Native codegen'd dot product ([[graft.functions.DotProduct]]) — the
    * zip_with/aggregate HOF equivalent runs interpreted and dominates
    * pairwise-scoring wall-clock by an order of magnitude. */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, computed as dot/(|a|·|b|) in double; NULL for
    * zero-norm vectors (ANSI-safe). NaN (from NaN vector elements) is also
    * normalized to NULL so every ranking path orders it identically —
    * Spark sorts NaN *greater* than any double, which would otherwise rank
    * a NaN sim first under the window path but last under the k=1
    * min-of-struct path. */
  def cosine(a: Column, b: Column): Column = {
    val (ad, bd) = (toDouble(a), toDouble(b))
    nullifNaN(graft.core.WeightedMoments.safeDiv(dot(ad, bd), norm(ad) * norm(bd)))
  }

  /** NaN → NULL (keeps non-NaN values, incl. NULL, unchanged). */
  private def nullifNaN(c: Column): Column = when(!isnan(c), c)

  /** Pair score used by every search path: cosine from precomputed norms. */
  private def pairSim: Column =
    nullifNaN(graft.core.WeightedMoments.safeDiv(
      dot(col("qv"), col("nv")), col("qn") * col("nn")))

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
      .select(col("query_id"), col("neighbor_id"), pairSim.as("sim"))
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

  /** Plane count for a corpus of `n` vectors so the EXPECTED bucket
    * population stays ≈ `targetBucketRows` regardless of corpus size —
    * 2^planes ≈ n / target. A constant plane count would keep Σ bucket²
    * (the self-join cost) at Θ(n²); growing planes with log₂(n) makes it
    * Θ(n · target). Capped at 62 so bucket ids stay in a long. */
  private[graft] def planesFor(n: Long, targetBucketRows: Int = 128): Int = {
    require(targetBucketRows >= 1, s"targetBucketRows must be >= 1, got $targetBucketRows")
    val p = math.ceil(math.log(math.max(1.0, n.toDouble / targetBucketRows)) / math.log(2.0)).toInt
    math.min(62, math.max(1, p))
  }

  /** Embedding dimension read off the first non-null row — callers should
    * not have to know (or worse, guess) the width of their vectors. */
  private[graft] def inferDim(df: DataFrame, vecCol: String): Int = {
    val rows = df.where(col(vecCol).isNotNull).select(size(col(vecCol)).as("d")).head(1)
    require(rows.nonEmpty, s"cannot infer vector dim: column '$vecCol' has no non-null rows")
    rows.head.getInt(0)
  }

  /** Sign-bit LSH bucket id of a vector under `planes`. */
  def lshBucket(vec: Column, planes: Column, nPlanes: Int): Column =
    (0 until nPlanes).map { i =>
      when(dot(vec, planes.getItem(i)) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** All XOR masks of `bits` bits with popcount ≤ maxHamming, generated as
    * bit combinations — Σ C(bits, h) masks — rather than filtering the full
    * 2^bits enumeration, which would be infeasible at the plane counts a
    * large corpus derives (e.g. 30+ planes for billions of vectors). */
  private def probeMasks(bits: Int, maxHamming: Int): Seq[Long] = {
    def combos(start: Int, remaining: Int): Seq[Long] =
      if (remaining == 0) Seq(0L)
      else (start to bits - remaining).flatMap(i =>
        combos(i + 1, remaining - 1).map(m => m | (1L << i)))
    (0 to math.min(maxHamming, bits)).flatMap(h => combos(0, h))
  }

  /** Collapse duplicate (query, neighbor) hits from overlapping probes or
    * tables. Skipped for k = 1: duplicates of a pair carry the SAME sim, and
    * [[topK]]'s k=1 min-of-struct aggregate is duplicate-insensitive — the
    * groupBy here would shuffle every scored pair for nothing. k > 1 needs
    * it (`row_number` would rank a duplicate pair twice). */
  private def dedupPairs(scored: DataFrame, k: Int): DataFrame =
    if (k == 1) scored
    else scored.groupBy("query_id", "neighbor_id").agg(max("sim").as("sim"))

  /** Approximate top-k cosine neighbors via random-hyperplane LSH. Same
    * output schema as [[bruteKnn]].
    *
    * Two physical shapes:
    *   - `smallQueries = true` (few queries, huge corpus): one plane table;
    *     each query multi-probes every bucket within `maxProbe` sign-bit
    *     flips and the probe side broadcasts. Probe amplification is
    *     Σ C(p, h) for h ≤ maxProbe — superlinear in p, affordable only
    *     because it multiplies the SMALL query side. The default
    *     `maxProbe = 3` holds ≥0.8 top-5 recall through p = 6 even on
    *     random-gaussian vectors (the LSH worst case — measured: mp=2
    *     decays to 0.52 at p=6, mp=3 stays at 0.83).
    *   - `smallQueries = false` (all-pairs: the query set IS the corpus):
    *     `nTables` independent plane tables, one streamed self-join on the
    *     (table, bucket) key — row amplification is exactly `nTables`
    *     (linear, corpus-side multi-probe would be O(p²)); recall comes
    *     from table count instead of Hamming-ball probes
    *     (P[miss] = (1 − c^p)^T for per-plane collision prob c).
    *
    * `nPlanes = 0` (default) derives the plane count from the corpus size
    * (one cheap count job) so mean bucket population stays ≈
    * `targetBucketRows` at any scale — see [[planesFor]]. `dim = 0`
    * (default) infers the vector width from the data; a hardcoded dim
    * smaller than the real one would silently bucket on a prefix subspace.
    */
  def annLsh(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      k: Int,
      nPlanes: Int = 0,
      dim: Int = 0,
      seed: Long = 42L,
      maxProbe: Int = 3,
      smallQueries: Boolean = true,
      targetBucketRows: Int = 128,
      nTables: Int = 4): DataFrame = {
    val d = if (dim > 0) dim else inferDim(df, vecCol)
    val p = if (nPlanes > 0) nPlanes else planesFor(df.count(), targetBucketRows)
    if (smallQueries) annLshProbed(df, idCol, vecCol, queryPred, k, p, d, seed, maxProbe)
    else annLshTabled(df, idCol, vecCol, queryPred, k, p, d, seed, nTables)
  }

  /** Few-queries path: one plane table, Hamming-ball multi-probe on the
    * broadcast query side. */
  private def annLshProbed(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      k: Int,
      nPlanes: Int,
      dim: Int,
      seed: Long,
      maxProbe: Int): DataFrame = {
    val planes = hyperplanes(nPlanes, dim, seed)
    // raw vectors + norm scalar (sign bits are norm-invariant, so buckets
    // come straight from the raw dot products)
    val prepped = df.select(col(idCol).as("__id__"), toDouble(col(vecCol)).as("__v__"))
      .withColumn("__n__", norm(col("__v__")))
      .withColumn("__bucket__", lshBucket(col("__v__"), planes, nPlanes))
    val corpus = prepped.select(col("__bucket__").as("bucket"),
      col("__id__").as("neighbor_id"), col("__v__").as("nv"), col("__n__").as("nn"))
    // queries probe their own bucket + every bucket within maxProbe bit
    // flips. The flip masks explode as a literal array and XOR afterwards —
    // a transform(...) lambda here would be CodegenFallback and knock the
    // whole probe-side projection out of whole-stage codegen
    val probes = array(probeMasks(nPlanes, maxProbe).map(lit): _*)
    val q = prepped.where(queryPred)
      .select(col("__id__").as("query_id"), col("__v__").as("qv"), col("__n__").as("qn"),
        col("__bucket__"), explode(probes).as("__flip__"))
      .select(col("query_id"), col("qv"), col("qn"),
        col("__bucket__").bitwiseXOR(col("__flip__")).as("bucket"))
    val scored = broadcast(q).join(corpus, Seq("bucket"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), pairSim.as("sim"))
    topK(dedupPairs(scored, k), k)
  }

  /** All-pairs path: `nTables` independent plane tables, candidates from a
    * streamed self-join on the (table, bucket) key. The banded table is
    * `repartition(t, b)`-ed once so both join sides reuse ONE exchange (the
    * merge hint keeps the planner off a broadcast plan that would recompute
    * the bucketing subtree), exactly the recipe of `Dedup.minhashDedup` /
    * `simhashPairs`. A non-trivial `queryPred` filters the probe side above
    * the shared table (a `lit(true)` pred — the near-dup caller — is
    * optimized away, preserving reuse). */
  private def annLshTabled(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      k: Int,
      nPlanes: Int,
      dim: Int,
      seed: Long,
      nTables: Int): DataFrame = {
    require(nTables >= 1, s"nTables must be >= 1, got $nTables")
    val tb = explode(array((0 until nTables).map { t =>
      struct(lit(t).as("t"),
        lshBucket(col("__v__"), hyperplanes(nPlanes, dim, seed + 1000L * t), nPlanes).as("b"))
    }: _*))
    // the probe side filters BEFORE banding (queryPred resolves against the
    // pre-rename child via missing-reference resolution, like the probed
    // path); a lit(true) pred — the all-pairs near-dup caller — is
    // optimizer-eliminated, leaving both sides canonically identical so the
    // self-join reuses ONE exchange
    def bandedFor(pred: Column): DataFrame =
      df.select(col(idCol).as("__id__"), toDouble(col(vecCol)).as("__v__"))
        .where(pred)
        .withColumn("__n__", norm(col("__v__")))
        .select(col("__id__"), col("__v__"), col("__n__"), tb.as("tb"))
        .select(col("__id__"), col("__v__"), col("__n__"),
          col("tb.t").as("t"), col("tb.b").as("b"))
        .repartition(col("t"), col("b"))
    val scored = bandedFor(queryPred).as("a").hint("merge")
      .join(bandedFor(lit(true)).as("b").hint("merge"),
        col("a.t") === col("b.t") && col("a.b") === col("b.b") &&
          col("a.__id__") =!= col("b.__id__"))
      .select(col("a.__id__").as("query_id"), col("b.__id__").as("neighbor_id"),
        nullifNaN(graft.core.WeightedMoments.safeDiv(
          dot(col("a.__v__"), col("b.__v__")), col("a.__n__") * col("b.__n__"))).as("sim"))
    topK(dedupPairs(scored, k), k)
  }

  /** IVF coarse-quantizer model: unit-norm centroid matrix. Fit once with
    * [[fitIvf]], reuse across any number of [[searchIvf]] calls — the KMeans
    * fit is the expensive, stateful step; at scale the quantizer is trained
    * on a sample once per corpus, never per query batch. */
  final case class IvfModel(centroids: Seq[Seq[Double]]) {
    def nLists: Int = centroids.size
  }

  /** Cells for a corpus of `n` vectors so the expected cell population
    * stays ≈ `targetCellRows` — the IVF analogue of [[planesFor]]: a
    * constant list count keeps the probe join Θ(n²) as the corpus grows.
    *
    * Capped at 8192 (formerly 1024). The old ceiling was the CODEGEN
    * method-size limit of the per-centroid unrolled assignment expression;
    * assignment now runs through the native [[graft.functions
    * .CentroidArgmax]]/[[graft.functions.CentroidTopN]] kernel (one loop
    * over a referenced flat matrix — constant codegen size at any k), so
    * the binding constraints are the KMeans FIT cost (sample grows as
    * 32·k rows, work as k × sample — ~10⁸ row·cells at the cap, a
    * one-off per corpus) and the k×d matrix each task references
    * (8192 × 64 doubles = 4 MiB — broadcast-class, not literal-class).
    * Past the cap (n ≈ 1M vectors at the default target), raise
    * `targetCellRows`, bring an externally trained quantizer via an
    * explicit [[IvfModel]], or use the LSH path (plane count scales to
    * 2⁶²). */
  private[graft] def listsFor(n: Long, targetCellRows: Int = 128): Int = {
    require(targetCellRows >= 1, s"targetCellRows must be >= 1, got $targetCellRows")
    val k = math.ceil(n.toDouble / targetCellRows).toInt
    math.max(2, math.min(8192, k))
  }

  /** Train the IVF coarse quantizer: KMeans over a bounded random sample of
    * normalized vectors (euclidean argmin on unit vectors ≡ cosine argmax).
    * The sample is packed into one cached partition — quantizer quality
    * needs only a sample, and per-iteration job overhead on many tiny
    * partitions would otherwise dominate the fit. (Per-element
    * normalization is O(d²) interpreted HOF work, but runs on ~
    * `maxTrainRows` sample rows only.)
    *
    * `nLists = 0` (default) derives the cell count from the corpus size so
    * cells hold ≈ `targetCellRows` vectors at any scale (see [[listsFor]]).
    * The training set is a seeded `sample()` — a `limit()` prefix would
    * train the quantizer on whatever arbitrary slice the scan returns
    * first, e.g. one skewed parquet file. */
  def fitIvf(
      df: DataFrame,
      vecCol: String,
      nLists: Int = 0,
      seed: Long = 42L,
      maxTrainRows: Int = 20000,
      targetCellRows: Int = 128,
      maxIter: Int = 0,
      initMode: String = "auto",
      trainRowsPerCell: Int = 32): IvfModel = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    require(maxIter >= 0, s"maxIter must be >= 1 (0 = auto), got $maxIter")
    require(trainRowsPerCell >= 1, s"trainRowsPerCell must be >= 1, got $trainRowsPerCell")
    require(Set("auto", "random", "k-means||").contains(initMode),
      s"initMode must be auto|random|k-means||, got $initMode")
    val n = df.count()
    require(n > 0, "fitIvf: empty corpus")
    val derived = if (nLists > 0) nLists.toLong else listsFor(n, targetCellRows).toLong
    // k can never exceed the TRAINING sample (KMeans with more clusters
    // than points degenerates), and the sample grows with k so each cell
    // sees enough points to place its centroid (≥ ~trainRowsPerCell/cell —
    // the cold-fit budget knob: 16 halves the fit, recall floor permitting)
    val trainRows = math.min(n, math.max(maxTrainRows.toLong, trainRowsPerCell.toLong * derived))
    val k = math.min(math.min(n, trainRows), derived).toInt
    // k-means|| seeding adds ~initSteps full passes with per-candidate
    // cost ∝ k — at thousands of cells it DOMINATES the fit, while cell
    // assignment quality (validated by the q90 recall floor) does not
    // need careful seeding there. "auto" keeps the classic init for
    // small quantizers (bit-compatible with every pre-existing fit at
    // the test scales) and flips to seeded-random above 256 cells.
    val resolvedInit = initMode match {
      case "auto" => if (k > 256) "random" else "k-means||"
      case other  => other
    }
    // auto iteration budget: small quantizers keep the classic 10 (bit-
    // compatible with every pre-existing fit at the test scales); large
    // ones cap refinement at 5 — per-iteration cost is k × sample and
    // cell-assignment quality is governed by the measured recall floor,
    // not centroid convergence precision
    val resolvedIter =
      if (maxIter > 0) maxIter else if (k > 256) 5 else 10
    val frac = math.min(1.0, trainRows.toDouble / n)
    val v = toDouble(col(vecCol)).as("__v__")
    val sampled = if (frac < 1.0) df.select(v).sample(frac, seed) else df.select(v)
    // pack the sample into few partitions (not necessarily ONE: a large-k
    // fit on a single task would serialize k × trainRows × d × iters work)
    val trainParts = math.max(1, (trainRows / 8192L).toInt)
    val trainDf = sampled
      .withColumn("__n__", norm(col("__v__")))
      .select(array_to_vector(transform(col("__v__"),
        x => graft.core.WeightedMoments.safeDiv(x, col("__n__")))).as("features"))
      .coalesce(trainParts).cache()
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(resolvedIter)
      .setInitMode(resolvedInit).fit(trainDf)
    trainDf.unpersist()
    IvfModel(model.clusterCenters.map { c =>
      val arr = c.toArray
      val n = math.sqrt(arr.map(x => x * x).sum)
      if (n == 0) arr.toSeq else arr.map(_ / n).toSeq
    }.toSeq)
  }

  /** IVF (inverted-file) ANN search under a fitted [[IvfModel]]: every
    * corpus vector is assigned to its nearest centroid cell (the native
    * [[graft.functions.CentroidArgmax]] kernel — one codegen'd loop over a
    * referenced flat centroid matrix, constant code size at any cell
    * count); queries probe their `nProbe` closest cells (native
    * [[graft.functions.CentroidTopN]], no all-cells explode, no ranking
    * window), so the probe join shuffles cell keys rather than the cross
    * product. Same output schema as [[bruteKnn]].
    *
    * `smallQueries = true` (the default ANN contract: few queries, huge
    * corpus) broadcasts the probe side; pass `false` when the query set is
    * the corpus itself (e.g. all-pairs near-dup) so the join shuffles on
    * the cell key instead of broadcasting the whole corpus. */
  def searchIvf(
      model: IvfModel,
      df: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      k: Int,
      nProbe: Int = 4,
      smallQueries: Boolean = true): DataFrame = {
    // raw vectors + norm scalar; centroid ARGMAX is norm-invariant per row,
    // so assignment/probing use raw dots and only the final sim divides
    val prepped = df.select(col(idCol).as("__id__"), toDouble(col(vecCol)).as("__v__"))
      .withColumn("__n__", norm(col("__v__")))
    val centroids = model.centroids
    // ONE native loop over a referenced centroid matrix per row (constant
    // codegen size at any cell count — the unrolled per-centroid dots
    // capped the quantizer at 1024 cells); probe cells come from the same
    // kernel's top-n, replacing posexplode-all-cells + a per-query
    // row_number window (and its |queries|·k-row shuffle)
    val corpus = prepped
      .withColumn("cell", graft.functions.VectorFunctions.centroidArgmax(col("__v__"), centroids))
      .select(col("cell"), col("__id__").as("neighbor_id"),
        col("__v__").as("nv"), col("__n__").as("nn"))
    val qProbes = prepped.where(queryPred)
      .select(col("__id__").as("query_id"), col("__v__").as("qv"), col("__n__").as("qn"),
        explode(graft.functions.VectorFunctions.centroidTopN(col("__v__"), centroids, nProbe))
          .as("cell"))
    val probeSide = if (smallQueries) broadcast(qProbes) else qProbes
    val scored = probeSide.join(corpus, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), pairSim.as("sim"))
    topK(dedupPairs(scored, k), k)
  }

  /** Product-quantization codebooks: `m` subspaces × `ksub` sub-centroids
    * of `dsub = dim/m` dims each. Fit once with [[fitPq]]; encode/search
    * any number of times.
    *
    * `residual = true` means the codebooks quantize `x̂ − offsets(cell)`
    * instead of `x̂` itself — the IVFADC refinement: the cell id already
    * encodes coarse position, so the code budget is spent on the offset
    * from it. `offsets` is the per-IVF-cell MEAN of the training vectors,
    * NOT the unit-normalized IvfModel centroid: `E|x̂ − μ_cell|² =
    * 1 − |μ_cell|² ≤ E|x̂|²`, so the mean offset never inflates the
    * residual, while subtracting a UNIT centroid from a weakly-aligned
    * unit vector yields |x̂ − c| up to √2 — residuals LARGER than the
    * inputs, measurably worse codes (the gain over raw encoding therefore
    * scales with how clustered the corpus is: ≈ |μ_cell|²). A residual
    * model is bound to the IvfModel it was trained against — [[modelSig]]
    * covers both plus this flag and the offsets, so a mismatched index
    * fails fast. */
  final case class PqModel(
      dim: Int,
      m: Int,
      codebooks: Seq[Seq[Seq[Double]]],
      residual: Boolean = false,
      offsets: Seq[Seq[Double]] = Nil) {
    def ksub: Int = codebooks.head.size
    def dsub: Int = dim / m
  }

  /** Train PQ codebooks: the corpus vectors are unit-normalized (cosine
    * contract, matching [[fitIvf]]), sliced into `m` equal subvectors, and
    * each subspace gets its own KMeans over one shared bounded sample —
    * m cheap fits on `maxTrainRows` rows, never a corpus-wide pass.
    *
    * Defaults (m=16 × ksub=32 ⇒ 16 5-bit codes per vector, ~40× smaller
    * than 64-d float64) are sized for the random-gaussian WORST case:
    * measured top-5 recall 0.98 with the default refineFactor=8 (m=8/
    * ksub=16 decays to 0.46 there); clusterable real embeddings do
    * better at every setting.
    *
    * `residualOf = Some(ivf)`: train on `x̂ − μ_cell` (the cell's training
    * MEAN — see [[PqModel.residual]] for why the mean and not the unit
    * centroid) — the code budget then targets a strictly lower-energy
    * signal, by exactly `|μ_cell|²`: a large win on clustered corpora,
    * marginal on isotropic ones. The returned model is bound to THAT
    * IvfModel and must be searched with it. */
  def fitPq(
      df: DataFrame,
      vecCol: String,
      m: Int = 16,
      ksub: Int = 32,
      seed: Long = 42L,
      maxTrainRows: Int = 20000,
      residualOf: Option[IvfModel] = None,
      maxIter: Int = 10): PqModel = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    val dim = inferDim(df, vecCol)
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    require(ksub >= 2 && ksub <= 256, s"ksub must be in [2,256], got $ksub")
    residualOf.foreach(ivf => require(ivf.centroids.head.size == dim,
      s"residualOf centroids have dim ${ivf.centroids.head.size}, corpus has $dim"))
    val dsub = dim / m
    val n = df.count()
    require(n > 0, "fitPq: empty corpus")
    val frac = math.min(1.0, maxTrainRows.toDouble / n)
    val v = toDouble(col(vecCol)).as("__v__")
    val sampled = if (frac < 1.0) df.select(v).sample(frac, seed) else df.select(v)
    val normed = sampled.withColumn("__n__", norm(col("__v__")))
      .select(transform(col("__v__"),
        x => graft.core.WeightedMoments.safeDiv(x, col("__n__"))).as("__vh__"))
      .where(!col("__vh__").getItem(0).isNull) // zero vectors train nothing
    // residual mode: assign cells (same codegen'd argmax the index build
    // uses), estimate each cell's MEAN from the sample (coalesce(1) keeps
    // the float accumulation order — and therefore the model — bit-exactly
    // deterministic; the sample is ≤ maxTrainRows rows), then train on
    // x̂ − μ_cell
    var offsets: Seq[Seq[Double]] = Nil
    val trainDf = residualOf match {
      case None => normed.coalesce(math.max(1, maxTrainRows / 8192)).cache()
      case Some(ivf) =>
        val assigned = normed
          .withColumn("__cell__",
            graft.functions.VectorFunctions.centroidArgmax(col("__vh__"), ivf.centroids))
          .coalesce(1).cache()
        val meanExprs = (0 until dim).map(i => avg(col("__vh__").getItem(i)))
        val byCell = assigned.groupBy("__cell__")
          .agg(meanExprs.head, meanExprs.tail: _*).collect()
        val offArr = Array.fill(ivf.centroids.size)(Seq.fill(dim)(0.0))
        byCell.foreach { r => // cells unseen in the sample keep offset 0
          offArr(r.getInt(0)) = (1 to dim).map(r.getDouble)
        }
        offsets = offArr.toSeq
        val om = typedlit(offsets)
        val out = assigned.select(zip_with(col("__vh__"),
          element_at(om, (col("__cell__") + 1).cast("int")),
          (a, b) => a - b).as("__vh__")).cache()
        out.count() // materialize before dropping the assignment cache
        assigned.unpersist()
        out
    }
    val trainN = trainDf.count() // materialize ONCE for all m fits
    // KMeans requires k >= 2, and kk below clamps to trainN — a 1-vector
    // corpus would otherwise crash inside setK(1) with an opaque ML error
    require(trainN >= 2,
      s"fitPq needs >= 2 nonzero vectors to train on, got $trainN")
    // the m sub-fits are INDEPENDENT problems over the same cached sample
    // — run them as concurrent driver jobs (sequential submission left
    // ~19 s of pure per-job overhead on the scale rehearsal, constant in
    // corpus size because the sample is capped). Each fit is seeded and
    // self-contained, so results are bit-identical to the sequential
    // order; the pool is bounded to keep scheduler pressure sane.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(m, 8))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val books =
      try {
        val sc = trainDf.sparkSession.sparkContext
        // uniquified per CALL, not just per seed: two concurrent fits in
        // one application share the default seed, and a shared group id
        // would let one fit's failure path cancel the other's in-flight
        // KMeans jobs
        val jobGroup =
          s"graft-fitpq-$seed-${FitPqGroupCounter.incrementAndGet()}"
        val futures = (0 until m).map { j =>
          scala.concurrent.Future {
            // job group is thread-local on the driver — set it on THIS
            // pool thread so a failure path can cancel the siblings
            sc.setJobGroup(jobGroup, s"fitPq subspace $j", interruptOnCancel = true)
            val sub = trainDf.select(
              array_to_vector(slice(col("__vh__"), j * dsub + 1, dsub)).as("features"))
            val kk = math.min(ksub.toLong, trainN).toInt
            val model = new KMeans().setK(kk).setSeed(seed + j).setMaxIter(maxIter).fit(sub)
            model.clusterCenters.map(_.toArray.toSeq).toSeq
          }
        }
        try futures.map(f => scala.concurrent.Await.result(
          f, scala.concurrent.duration.Duration.Inf))
        catch { case e: Throwable =>
          // one sub-fit failed: stop feeding the pool new work AND cancel
          // the in-flight Spark jobs of its siblings (group-scoped — NOT
          // cancelAllJobs, which would kill unrelated concurrent work) —
          // without this, the surviving KMeans fits keep burning the
          // cluster after the caller has already seen the failure
          pool.shutdownNow()
          sc.cancelJobGroup(jobGroup)
          throw e
        }
      } finally {
        pool.shutdown()
        trainDf.unpersist() // in finally: a failed fit must not leak the cache
      }
    PqModel(dim, m, books, residual = residualOf.isDefined, offsets = offsets)
  }

  /** PQ code assignment of a unit-normalized vector column: per subspace,
    * the L2-argmin sub-centroid via the argmax of `v·c − |c|²/2` (the |v|²
    * term is constant per row) — the native [[graft.functions.PqEncode]]
    * kernel (one loop over a referenced flat codebook; the old unrolled
    * spelling allocated m·ksub `slice()` temporaries per encoded row). */
  private def pqCodes(pq: PqModel, vhat: Column): Column =
    graft.functions.VectorFunctions.pqEncode(vhat, pq.codebooks)

  /** Asymmetric-distance score: `q · x̂ ≈ Σⱼ q_subⱼ · codebookⱼ[codeⱼ]` —
    * the query stays exact, the corpus side is its reconstruction. Constant
    * |q| per query makes the ranking cosine-consistent without dividing.
    * Native [[graft.functions.PqAdcScore]] kernel. */
  private def adcScore(pq: PqModel, qv: Column, codes: Column): Column =
    graft.functions.VectorFunctions.pqAdc(qv, codes, pq.codebooks)

  /** Deterministic 64-bit fingerprint of an (ivf, pq) model pair — bitwise
    * over every centroid/codebook coordinate, so any retrain (new seed, new
    * sample, new k) changes it. Stamped into each index row by
    * [[buildIvfPqIndex]] and REQUIRED to match by [[searchIvfPq]]: an index
    * built under different models would otherwise silently probe wrong
    * cells and decode with wrong codebooks, degrading recall with no error
    * anywhere. */
  def modelSig(ivf: IvfModel, pq: PqModel): Long = {
    var h = 1125899906842597L // large prime seed, FNV-style fold
    def mix(d: Double): Unit = {
      h = h * 31L + java.lang.Double.doubleToLongBits(d)
    }
    ivf.centroids.foreach(_.foreach(mix))
    h = h * 31L + pq.dim; h = h * 31L + pq.m
    h = h * 31L + (if (pq.residual) 1L else 0L)
    pq.offsets.foreach(_.foreach(mix))
    pq.codebooks.foreach(_.foreach(_.foreach(mix)))
    h
  }

  /** Materialized IVF-PQ index for a corpus: `(idCol, cell, codes,
    * model_sig)` — one narrow codegen'd pass over the scan (`model_sig` is
    * the constant [[modelSig]] fingerprint; it RLE-compresses to nothing in
    * parquet). Persist it (e.g. `Tables.writeBucketed(..., bucketCols =
    * Seq("cell"))`) and pass it to [[searchIvfPq]]'s `index` so repeated
    * query batches never re-encode the corpus: at 100 TB the encode pass
    * reads every embedding once, while each search then reads only the
    * ~12-byte index rows (plus the shortlist's vectors for refinement). */
  def buildIvfPqIndex(
      ivf: IvfModel,
      pq: PqModel,
      df: DataFrame,
      idCol: String,
      vecCol: String): DataFrame = {
    require(idCol != "cell" && idCol != "codes" && idCol != "model_sig",
      s"idCol '$idCol' collides with an index output column")
    require(!pq.residual || pq.offsets.size == ivf.centroids.size,
      s"residual PqModel carries ${pq.offsets.size} cell offsets but the " +
        s"IvfModel has ${ivf.centroids.size} cells — models from different fits")
    val prepped = df.select(col(idCol), toDouble(col(vecCol)).as("__v__"))
      .withColumn("__n__", norm(col("__v__")))
    val vhat = transform(col("__v__"),
      x => graft.core.WeightedMoments.safeDiv(x, col("__n__")))
    // residual model: encode x̂ − μ_cell, not x̂ (PqModel.residual)
    val encoded =
      if (pq.residual)
        zip_with(vhat, element_at(typedlit(pq.offsets), (col("cell") + 1).cast("int")),
          (a, b) => a - b)
      else vhat
    prepped
      // cell stays LONG in the persisted index schema (pre-kernel indexes
      // stay readable); the native argmax replaces the unrolled dots
      .withColumn("cell",
        graft.functions.VectorFunctions.centroidArgmax(col("__v__"), ivf.centroids)
          .cast("long"))
      .select(col(idCol), col("cell"), pqCodes(pq, encoded).as("codes"),
        lit(modelSig(ivf, pq)).as("model_sig"))
  }

  /** IVF-PQ ANN search — the memory-compression path for corpora whose raw
    * vectors are too big to shuffle: the probe join carries only
    * `(cell, id, m small codes)` per corpus row (for 64-d float64, ~50×
    * smaller than the vector), candidates are ranked by the codegen'd ADC
    * score, and only the top `k·refineFactor` per query are joined BACK to
    * the corpus by id to re-score with EXACT cosine (IVFADC+R). Emitted
    * sims are therefore true cosines — approximation affects only which
    * candidates were considered, never the reported values. Same output
    * schema as [[bruteKnn]]/[[searchIvf]].
    *
    * `index`: a pre-materialized [[buildIvfPqIndex]] frame (same idCol).
    * Its `model_sig` column is checked against [[modelSig]] of the models
    * passed here — one single-row job at planning time — and a mismatch
    * (an index built under retrained models) fails fast instead of
    * silently probing wrong cells. Omitted → the index is computed inline,
    * one pass over the scan.
    *
    * At 100 TB: codes + cell are a narrow projection computed in one pass
    * over the scan (or read from the persisted index); the heavy probe
    * join never touches an embedding; the refine join is
    * k·refineFactor·|queries| rows — driver- and shuffle-tiny. */
  def searchIvfPq(
      ivf: IvfModel,
      pq: PqModel,
      df: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      k: Int,
      nProbe: Int = 4,
      refineFactor: Int = 8,
      smallQueries: Boolean = true,
      index: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && refineFactor >= 1)
    require(!pq.residual || pq.offsets.size == ivf.centroids.size,
      s"residual PqModel carries ${pq.offsets.size} cell offsets but the " +
        s"IvfModel has ${ivf.centroids.size} cells — models from different fits")
    index.foreach { ix =>
      require(Seq(idCol, "cell", "codes", "model_sig").forall(ix.columns.contains),
        s"index must have ($idCol, cell, codes, model_sig) columns, got ${ix.columns.mkString(",")}")
      // min AND max over the narrow sig column: constant-by-construction
      // only holds for a single buildIvfPqIndex generation — an appended
      // or partially-rebuilt index dir MIXES generations, and a 1-row
      // sample would pass on whichever row it happened to read while the
      // stale rows silently probe wrong cells. One column-pruned agg scan
      // decides for every row.
      val expected = modelSig(ivf, pq)
      ix.agg(min(col("model_sig")), max(col("model_sig"))).collect()
        .foreach { r =>
          require(!r.isNullAt(0) && r.getLong(0) == expected && r.getLong(1) == expected,
            s"index model_sig range [${r.get(0)}, ${r.get(1)}] != $expected for " +
              "the ivf/pq models passed to searchIvfPq — the index was built " +
              "under different (e.g. retrained) models, or mixes generations " +
              "(appended/partial rebuild); rebuild it with buildIvfPqIndex")
        }
    }
    val prepped = df.select(col(idCol).as("__id__"), toDouble(col(vecCol)).as("__v__"))
      .withColumn("__n__", norm(col("__v__")))
    val corpus = index.getOrElse(buildIvfPqIndex(ivf, pq, df, idCol, vecCol))
      .select(col("cell"), col(idCol).as("neighbor_id"), col("codes").as("__codes__"))
    // probe cells from the native top-n kernel (no posexplode-all-cells,
    // no per-query ranking window); cast long to match the index schema
    val qProbes = prepped.where(queryPred)
      .select(col("__id__").as("query_id"), col("__v__").as("qv"),
        explode(graft.functions.VectorFunctions.centroidTopN(col("__v__"), ivf.centroids, nProbe))
          .as("__cell_i__"))
      .select(col("query_id"), col("qv"), col("__cell_i__").cast("long").as("cell"))
    val probeSide = if (smallQueries) broadcast(qProbes) else qProbes
    // residual model: x̂ ≈ μ_cell + decoded residual, so the ADC ranking
    // score gains the q·μ_cell term (cell rides the join key; constant
    // |q| per query keeps the ranking cosine-consistent)
    val adc = adcScore(pq, col("qv"), col("__codes__")) + (
      if (pq.residual)
        dot(col("qv"), element_at(typedlit(pq.offsets), (col("cell") + 1).cast("int")))
      else lit(0.0))
    val cand = probeSide.join(corpus, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), adc.as("__adc__"))
      .withColumn("__r__", row_number().over(
        Window.partitionBy("query_id").orderBy(col("__adc__").desc, col("neighbor_id"))))
      .where(col("__r__") <= k.toLong * refineFactor)
      .select("query_id", "neighbor_id")
    // refine: exact cosine over the shortlist only (vectors fetched by id)
    val qSide = prepped.where(queryPred).select(col("__id__").as("query_id"),
      col("__v__").as("qv"), col("__n__").as("qn"))
    val nSide = prepped.select(col("__id__").as("neighbor_id"),
      col("__v__").as("nv"), col("__n__").as("nn"))
    val scored = cand
      .join(if (smallQueries) broadcast(qSide) else qSide, Seq("query_id"))
      .join(nSide, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), pairSim.as("sim"))
    topK(dedupPairs(scored, k), k)
  }

  /** One-shot IVF ANN: fit + search. Prefer [[fitIvf]]/[[searchIvf]] when
    * issuing more than one query batch against the same corpus. */
  def annIvf(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      queryPred: Column,
      k: Int,
      nLists: Int = 0,
      nProbe: Int = 4,
      seed: Long = 42L): DataFrame =
    searchIvf(fitIvf(df, vecCol, nLists, seed), df, idCol, vecCol, queryPred, k, nProbe)

  /** Embedding-cosine near-duplicates: nearest neighbor of every vector.
    * Strategy picks the physical shape:
    *   - `"auto"` (default): brute below `bruteMaxRows` (one cheap count
    *     job), LSH above — a default of "brute" at any size would plan a
    *     cartesian over a 100 TB corpus without a word of warning.
    *   - `"brute"`: exact O(n²) scoring — the small-corpus / oracle
    *     baseline. At 100 TB this is a cartesian; don't.
    *   - `"lsh"`: random-hyperplane buckets; the self-join shuffles bucket
    *     keys (no broadcast — the query side IS the corpus), so cost is
    *     Σ bucket², not n². Approximate: recall < 1 across bucket
    *     boundaries (multi-probe recovers most).
    *   - `"ivf"`: KMeans cells, same shape with a trained quantizer; pass
    *     `model` to reuse a fit, else one is trained here.
    */
  def nearestNeighbors(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      strategy: String = "auto",
      model: Option[IvfModel] = None,
      bruteMaxRows: Long = 100000L): DataFrame = {
    val chosen = strategy match {
      case "auto" => if (df.count() <= bruteMaxRows) "brute" else "lsh"
      case s => s
    }
    val nn = chosen match {
      case "brute" => bruteKnn(df, idCol, vecCol, lit(true), 1)
      case "lsh" =>
        annLsh(df, idCol, vecCol, lit(true), 1, smallQueries = false)
      case "ivf" =>
        val m = model.getOrElse(fitIvf(df, vecCol))
        searchIvf(m, df, idCol, vecCol, lit(true), 1, smallQueries = false)
      case "ivfpq" =>
        // all-pairs under compression: the ADC probe join carries codes,
        // not vectors — the shape for corpora whose raw embeddings are too
        // big to self-join even cell-keyed
        val m = model.getOrElse(fitIvf(df, vecCol))
        searchIvfPq(m, fitPq(df, vecCol), df, idCol, vecCol, lit(true), 1,
          smallQueries = false)
      case other =>
        throw new IllegalArgumentException(
          s"unknown near-dup strategy '$other' (expected auto|brute|lsh|ivf|ivfpq)")
    }
    nn.select(col("query_id").as("doc_a"), col("neighbor_id").as("doc_b"), col("sim"))
  }

  /** The deduplicated corpus under embedding-cosine near-duplication — the
    * "give me the clean dataset" counterpart of [[nearestNeighbors]]
    * (mirroring `Dedup.dropExact` for text): a vector is dropped iff its
    * nearest neighbor scores `sim ≥ simThreshold` AND has a smaller id
    * (keep-first). Top-1-based by design — the same single-NN the scale
    * strategies compute — so the policy is identical under every strategy
    * and needs one anti-join beyond the NN pass. */
  def dropNearDuplicateVectors(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      simThreshold: Double,
      strategy: String = "auto",
      model: Option[IvfModel] = None): DataFrame = {
    val nn = nearestNeighbors(df, idCol, vecCol, strategy, model)
    val drop = nn.where(col("sim") >= simThreshold && col("doc_b") < col("doc_a"))
      .select(col("doc_a").as(idCol))
    df.join(drop, Seq(idCol), "left_anti")
  }

  /** Per-group mean-pooled embedding (class prototypes, cluster seeds,
    * per-domain "average document" vectors): `(groupCols…, centroid
    * array<double>, n_vectors)`.
    *
    * Scale shape: `posexplode` fans each vector into (group, dim, value)
    * rows, partial `avg` collapses them map-side, so the one data shuffle
    * carries ~groups × dims rows per partition — never the vector table.
    * The second (groups-sized) agg reassembles dimension means into an
    * ordered array; `n_vectors` is the dim-0 count (every vector
    * contributes exactly one row to dim 0). NULL vectors are skipped by
    * `posexplode`'s NULL handling; ragged dims are a caller bug surfacing
    * as differing per-dim counts.
    */
  def groupCentroids(
      df: DataFrame,
      groupCols: Seq[String],
      vecCol: String): DataFrame = {
    require(groupCols.nonEmpty, "groupCentroids needs group columns")
    val g = groupCols.map(col)
    df
      .select(g :+ posexplode(toDouble(col(vecCol))).as(Seq("__p__", "__v__")): _*)
      .groupBy(g :+ col("__p__"): _*)
      .agg(avg(col("__v__")).as("__m__"), count(lit(1)).as("__c__"))
      .groupBy(g: _*)
      .agg(
        transform(array_sort(collect_list(struct(col("__p__"), col("__m__")))),
          s => s.getField("__m__")).as("centroid"),
        max(when(col("__p__") === 0, col("__c__"))).as("n_vectors"))
  }

  /** Assign every vector to its nearest centroid by cosine — the
    * classification half of the [[groupCentroids]] round trip (k-means-style
    * cluster assignment, topic routing, SemDeDup-style bucketing).
    *
    * `centroids` is (labelCol, centroidCol) — one row per cluster; cluster
    * counts are small by construction (labels/domains/k-means cells), so the
    * cross join is broadcast: the corpus never shuffles, and the argmax over
    * clusters is a partial-aggregated `max_by` per vector id.
    *
    * ARGMAX CONTRACT: the comparison key is the cosine QUANTIZED to 6
    * decimals — centroids whose similarities agree within 1e-6 are treated
    * as tied and break toward the smallest label. This trades sub-1e-6 sim
    * distinctions (below embedding noise, and below cross-engine/summation-
    * order reproducibility) for a deterministic assignment under any
    * partitioning, engine, or float summation order. The OUTPUT sim is the
    * full-precision winner's cosine.
    *
    * Output: (idCol, labelCol, `sim`) — one row per input vector; vectors
    * whose sim is NULL against every centroid (zero-norm/NaN) keep a NULL
    * label. Exception: an EMPTY centroid table yields an empty result
    * (the cross join has nothing to score against — pinned by
    * CurationDegenerateSpec), so validate the codebook upstream if the
    * row-preserving shape matters. */
  def assignNearestCentroid(
      df: DataFrame,
      centroids: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String = "label",
      centroidCol: String = "centroid"): DataFrame = {
    val scored = df
      .select(col(idCol), toDouble(col(vecCol)).as("__v__"))
      .join(broadcast(centroids.select(
        col(labelCol).as("__l__"), toDouble(col(centroidCol)).as("__c__"))))
      .select(col(idCol), col("__l__"),
        cosine(col("__v__"), col("__c__")).as("__s__"))
    // min_by over (-quantize(sim), label): highest sim first, ties toward
    // the smallest label. The comparison key is QUANTIZED to the 1e-6 grid
    // so two centroids whose cosines differ only at ulp level (different
    // engines' libm / summation order) collapse to the same key and the
    // deterministic smallest-label tie-break decides — otherwise `assigned`
    // can flip across engines while the (rounded) output sim still matches.
    // The grid key is an INTEGER `floor(sim·1e6 + 0.5)` rather than
    // `round(sim, 6)`: identical pure-IEEE arithmetic on every engine (the
    // oracle mirrors it), no per-candidate BigDecimal allocation inside
    // codegen (the round-8 A/B measured `round` at ~20% of q67's runtime),
    // and a long key has no IEEE -0.0/+0.0 boundary case for sims
    // straddling zero. NULL-sim pairs get a NULL ordering key, which
    // min_by ignores — so they can never beat a real assignment, and an
    // all-NULL vector yields a NULL struct (NULL label + NULL sim).
    scored
      .groupBy(col(idCol))
      .agg(
        min_by(struct(col("__l__").as(labelCol), col("__s__").as("sim")),
          when(col("__s__").isNotNull,
            struct(-floor(col("__s__") * lit(1e6) + lit(0.5)),
              col("__l__")))).as("__b__"))
      .select(col(idCol), col(s"__b__.$labelCol"), col("__b__.sim"))
  }

  // ------------------------------------------------------------- SemDeDup

  /** Deterministic spherical-k-means model behind [[semDedup]]: unit-norm
    * centroids produced by [[fitLloyd]]'s grid-pinned Lloyd iterations.
    * Unlike [[IvfModel]] (Spark-ML KMeans, sample-trained, seeding
    * engine-private) every step of this fit is exact public arithmetic —
    * seeded-hash init, quantized-argmax assignment, per-dimension means —
    * so a cross-engine oracle can replay the whole recursion. */
  final case class LloydModel(centroids: Seq[Seq[Double]]) {
    def k: Int = centroids.size
  }

  /** Unit-normalized clusterable vectors: `(idCol, __u__ array<double>)`.
    * NULL and zero-norm vectors are excluded (they carry no direction —
    * [[semDedup]] passes them through as survivors). */
  private def unitVectors(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val vd = toDouble(col(vecCol))
    val n = norm(vd)
    df.select(col(idCol), when(n > lit(0.0), transform(vd, x => x / n)).as("__u__"))
      .where(col("__u__").isNotNull)
  }

  /** Deterministic distributed Lloyd (spherical k-means) fit.
    *
    * Every step is engine-reproducible, which the ML-KMeans-backed
    * [[fitIvf]] is not:
    *   - init: the `k` vectors with the smallest seeded uniforms
    *     (`Sampling.unif` — `xxhash64(id, seed)` arithmetic), labelled
    *     0..k−1 in (uniform, id) order;
    *   - assignment: [[graft.functions.CentroidBest]] — dot-product argmax
    *     under the 1e-6 GRID key with ties to the lowest cluster (the
    *     [[assignNearestCentroid]] contract), one native kernel call per
    *     row, constant codegen size at any k;
    *   - update: per-dimension mean of assigned unit vectors,
    *     re-normalized; empty clusters carry their previous centroid.
    *
    * Scale shape: per iteration ONE corpus scan + a shuffle of ≤ k·dim
    * partial-aggregated `(cluster, dim, mean)` rows; the driver holds only
    * the k×dim centroid matrix (same bound as the IVF codebook — referenced
    * object, broadcast-class). `k = 0` derives k from the corpus size so
    * clusters hold ≈ `targetClusterRows` vectors at any scale (the
    * [[listsFor]] policy — within-cluster pairwise work stays Σc², never
    * n²). */
  def fitLloyd(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 0,
      iters: Int = 2,
      seed: Long = 42L,
      targetClusterRows: Int = 128): LloydModel = {
    require(k >= 0, s"fitLloyd: k must be >= 0 (0 = derive), got $k")
    require(iters >= 0, s"fitLloyd: iters must be >= 0, got $iters")
    val unit = unitVectors(df, idCol, vecCol).cache()
    try {
      val kUse =
        if (k > 0) k else listsFor(unit.count(), targetClusterRows)
      val initRows = unit
        .select(col("__u__"), Sampling.unif(Seq(idCol), seed).as("__r__"), col(idCol))
        .orderBy(col("__r__"), col(idCol))
        .limit(kUse)
        .select("__u__")
        .collect() // ≤ k rows — bounded by construction
      require(initRows.nonEmpty, "fitLloyd: no clusterable vectors")
      var cent: Seq[Seq[Double]] =
        initRows.map(_.getSeq[Double](0).toSeq).toSeq
      val dim = cent.head.size
      var it = 0
      while (it < iters) {
        // (cluster, dim) means: partial-aggregated map-side, so the one
        // shuffle carries ≤ k·dim rows per partition, never the corpus
        val sums = unit
          .select(
            graft.functions.VectorFunctions.centroidBest(col("__u__"), cent)
              .getField("cluster").as("__c__"),
            posexplode(col("__u__")).as(Seq("__p__", "__x__")))
          .groupBy("__c__", "__p__")
          .agg(avg(col("__x__")).as("__m__"))
          .collect() // ≤ k·dim rows — the centroid matrix itself
        val acc = Array.fill(cent.size)(new Array[Double](dim))
        val seen = Array.fill(cent.size)(false)
        sums.foreach { r =>
          val c = r.getInt(0)
          acc(c)(r.getInt(1)) = r.getDouble(2)
          seen(c) = true
        }
        cent = cent.indices.map { c =>
          if (!seen(c)) cent(c) // empty cluster: carry the previous centroid
          else {
            // re-normalize in dimension order — the oracle folds the same way
            var sq = 0.0
            var j = 0
            while (j < dim) { sq += acc(c)(j) * acc(c)(j); j += 1 }
            val nrm = math.sqrt(sq)
            if (nrm > 0) acc(c).map(_ / nrm).toSeq else cent(c)
          }
        }
        it += 1
      }
      LloydModel(cent)
    } finally unit.unpersist()
  }

  /** Internal assignment keeping the unit vector for downstream pairwise
    * scoring: `(idCol, cluster, sim, __u__)` — `sim` is the full-precision
    * cosine to the winning centroid (unit·unit dot). */
  private def assignLloydWithUnit(
      model: LloydModel, df: DataFrame, idCol: String, vecCol: String): DataFrame =
    unitVectors(df, idCol, vecCol)
      .select(col(idCol),
        graft.functions.VectorFunctions.centroidBest(col("__u__"), model.centroids)
          .as("__b__"),
        col("__u__"))
      .select(col(idCol), col("__b__.cluster").as("cluster"),
        col("__b__.dot").as("sim"), col("__u__"))

  /** Cluster assignment under a fitted [[LloydModel]]: `(idCol, cluster,
    * sim)`, one row per clusterable vector. One kernel call per row — the
    * corpus never joins or shuffles. */
  def assignLloyd(
      model: LloydModel, df: DataFrame, idCol: String, vecCol: String): DataFrame =
    assignLloydWithUnit(model, df, idCol, vecCol).drop("__u__")

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540) decision report:
    * `(idCol, cluster, sim, kept)` for EVERY input row.
    *
    * Semantic near-duplicates are detected only WITHIN a cluster of the
    * deterministic [[fitLloyd]] spherical k-means — the paper's trade: no
    * cross-cluster recall, in exchange for Σ(cluster²) pairwise work
    * instead of n². A vector is dropped iff some same-cluster vector with
    * higher keep-priority scores `cosine ≥ simThreshold`; both the
    * pairwise test and the priority compare run on the 1e-6 integer grid
    * (ties to the smaller id), so the decision set is reproducible across
    * engines and partitionings.
    *
    * `keep` picks the priority order inside a duplicate group:
    *   - `"centroid_far"` (paper's rule): the member LEAST similar to its
    *     centroid wins — keeps edge/diverse examples;
    *   - `"first"`: smallest id wins — the keep-first convention of
    *     [[dropNearDuplicateVectors]] / `Dedup.dropExact`.
    *
    * Non-clusterable vectors (NULL / zero-norm) report NULL cluster/sim
    * and `kept = true`. Scale shape: the self-join shuffles `(cluster,
    * priority, unit-vector)` rows on the cluster key — Σc² dot products,
    * each a codegen'd [[graft.functions.DotProduct]] loop. */
  def semDedupReport(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      simThreshold: Double,
      k: Int = 0,
      iters: Int = 2,
      seed: Long = 42L,
      keep: String = "centroid_far",
      model: Option[LloydModel] = None,
      targetClusterRows: Int = 128): DataFrame = {
    require(Set("first", "centroid_far").contains(keep),
      s"semDedup: keep must be first|centroid_far, got '$keep'")
    val m = model.getOrElse(fitLloyd(df, idCol, vecCol, k, iters, seed, targetClusterRows))
    val af = assignLloydWithUnit(m, df, idCol, vecCol)
    pairwiseDropReport(df, idCol, af, simThreshold, keep)
  }

  /** The within-cluster pairwise drop stage shared by [[semDedupReport]]
    * and [[semDedupTwoLevelReport]]: `af` is the assigned frame `(idCol,
    * cluster, sim, __u__)`; returns `(idCol, cluster, sim, kept)` for
    * every row of `df`. The self-join shuffles on the cluster key only —
    * Σc² dot products, never n². */
  private def pairwiseDropReport(
      df: DataFrame,
      idCol: String,
      af: DataFrame,
      simThreshold: Double,
      keep: String): DataFrame = {
    val th6 = math.floor(simThreshold * 1e6 + 0.5).toLong
    val gridSim = floor(col("sim") * lit(1e6) + lit(0.5)).cast("long")
    val pri = keep match {
      case "first"        => struct(col(idCol))
      case "centroid_far" => struct(gridSim, col(idCol))
    }
    val ranked = af.withColumn("__pri__", pri)
    val x = ranked.select(col(idCol).as("__xid__"), col("cluster"),
      col("__pri__").as("__xp__"), col("__u__").as("__xu__"))
    val y = ranked.select(col(idCol).as("__yid__"), col("cluster").as("__yc__"),
      col("__pri__").as("__yp__"), col("__u__").as("__yu__"))
    val dropped = x
      .join(y,
        col("cluster") === col("__yc__") && col("__yp__") < col("__xp__") &&
          floor(dot(col("__xu__"), col("__yu__")) * lit(1e6) + lit(0.5))
            .cast("long") >= lit(th6),
        "left_semi")
      .select(col("__xid__").as(idCol), lit(true).as("__drop__"))
    df.select(col(idCol))
      .join(af.drop("__u__"), Seq(idCol), "left")
      .join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("cluster"), col("sim"),
        coalesce(!col("__drop__"), lit(true)).as("kept"))
  }

  /** The SemDeDup'd corpus: [[semDedupReport]]'s dropped ids anti-joined
    * away; all original columns (and non-clusterable rows) survive. */
  def semDedup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      simThreshold: Double,
      k: Int = 0,
      iters: Int = 2,
      seed: Long = 42L,
      keep: String = "centroid_far",
      model: Option[LloydModel] = None,
      targetClusterRows: Int = 128): DataFrame = {
    val rep = semDedupReport(df, idCol, vecCol, simThreshold, k, iters, seed,
      keep, model, targetClusterRows)
    df.join(rep.where(!col("kept")).select(col(idCol)), Seq(idCol), "left_anti")
  }

  /** Two-level (coarse → fine) spherical k-means: `coarse` routes,
    * `fineByCell(c)` holds cell c's fine centroids; the global cluster id
    * is cell-major (cell 0's fine clusters first). Bounded like
    * [[LloydModel]]: ≈ (kCoarse + kFineTotal)·dim doubles. */
  final case class TwoLevelModel(
      coarse: Seq[Seq[Double]], fineByCell: Seq[Seq[Seq[Double]]]) {
    def kCoarse: Int = coarse.size
    def kFineTotal: Int = fineByCell.iterator.map(_.size).sum
    /** Fine centroids flattened in global-id order. */
    def globalCentroids: Seq[Seq[Double]] = fineByCell.flatten
  }

  /** Deterministic two-level Lloyd fit — the SCALE path for [[semDedup]].
    *
    * [[fitLloyd]]'s exact assignment is O(k·dim) per row with
    * k = n/targetClusterRows, i.e. O(n²·dim/targetClusterRows) per
    * iteration — quadratic in corpus size. Here assignment is routed:
    * ≈√k coarse centroids pick a cell (grid key, lowest-cell ties), then
    * only that cell's ≈√k fine centroids compete — O(√k·dim) per row,
    * O(n·√k·dim) per iteration, while the total fine-cluster count (and
    * hence the Σc² pairwise dedup bound) matches the single-level k.
    *
    * Construction, every step engine-deterministic:
    *   1. coarse = [[fitLloyd]] at kCoarse ≈ √k (itersCoarse iterations);
    *   2. fine INIT: per coarse cell, the kFinePerCell member rows with
    *      the smallest seeded uniforms (cell-keyed window; the collect is
    *      ≤ kCoarse·kFinePerCell rows — the model itself). Coarse cells
    *      with NO clusterable members are dropped and the cell list
    *      reindexed (cells exist only to route);
    *   3. itersFine rounds of per-cell Lloyd: assign with
    *      [[graft.functions.TwoLevelBest]] at nProbe=1 (a row updates only
    *      its own cell's fine centroids), per-dimension means renormalized
    *      in dimension order, empty fine clusters carry forward.
    *
    * The trade vs exact Lloyd: a row near a coarse boundary may route to a
    * cell whose best fine centroid is globally second-best, so cluster
    * memberships — and therefore which near-dup pairs are VISIBLE to the
    * pairwise stage — can differ from [[fitLloyd]]'s. SemDeDup already
    * accepts exactly this trade (no cross-cluster recall); q119b pins the
    * agreement floor against the exact path and SemDedupSpec pins the
    * probe-all ≡ global-argmax identity. */
  def fitLloydTwoLevel(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      kCoarse: Int = 0,
      kFinePerCell: Int = 0,
      itersCoarse: Int = 2,
      itersFine: Int = 2,
      seed: Long = 42L,
      targetClusterRows: Int = 128): TwoLevelModel = {
    import org.apache.spark.sql.expressions.Window
    require(kCoarse >= 0 && kFinePerCell >= 0,
      "fitLloydTwoLevel: kCoarse/kFinePerCell must be >= 0 (0 = derive)")
    require(itersCoarse >= 0 && itersFine >= 0,
      "fitLloydTwoLevel: iteration counts must be >= 0")
    val unit = unitVectors(df, idCol, vecCol).cache()
    try {
      val (kc, kf) =
        if (kCoarse > 0 && kFinePerCell > 0) (kCoarse, kFinePerCell)
        else {
          val kTotal = listsFor(unit.count(), targetClusterRows)
          val c = if (kCoarse > 0) kCoarse
            else math.max(1, math.ceil(math.sqrt(kTotal.toDouble)).toInt)
          val f = if (kFinePerCell > 0) kFinePerCell
            else math.max(1, math.ceil(kTotal.toDouble / c).toInt)
          (c, f)
        }
      val coarseAll = fitLloyd(df, idCol, vecCol, kc, itersCoarse, seed,
        targetClusterRows).centroids
      // fine init: per-cell smallest seeded uniforms (seed+1 so the init
      // draw is independent of the coarse init's)
      val cellW = Window.partitionBy(col("__c__"))
        .orderBy(col("__r__"), col(idCol))
      val initRows = unit
        .select(col(idCol),
          graft.functions.VectorFunctions.centroidBest(col("__u__"), coarseAll)
            .getField("cluster").as("__c__"),
          Sampling.unif(Seq(idCol), seed + 1).as("__r__"), col("__u__"))
        .withColumn("__rn__", row_number().over(cellW))
        .where(col("__rn__") <= kf)
        .select(col("__c__"), col("__rn__"), col("__u__"))
        .collect() // ≤ kc·kf rows — the model itself
      require(initRows.nonEmpty, "fitLloydTwoLevel: no clusterable vectors")
      val byCell = initRows
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toSeq))
        .groupBy(_._1)
      val liveCells = byCell.keys.toSeq.sorted
      val coarse = liveCells.map(coarseAll(_))
      var fine: Seq[Seq[Seq[Double]]] =
        liveCells.map(c => byCell(c).sortBy(_._2).map(_._3).toSeq)
      val dim = coarse.head.size
      var it = 0
      while (it < itersFine) {
        val offsets = fine.scanLeft(0)(_ + _.size)
        val sums = unit
          .select(
            graft.functions.VectorFunctions.twoLevelBest(col("__u__"), coarse, fine, 1)
              .getField("cluster").as("__g__"),
            posexplode(col("__u__")).as(Seq("__p__", "__x__")))
          .groupBy("__g__", "__p__")
          .agg(avg(col("__x__")).as("__m__"))
          .collect() // ≤ kFineTotal·dim rows — the fine matrix itself
        val kTot = offsets.last
        val acc = Array.fill(kTot)(new Array[Double](dim))
        val seen = Array.fill(kTot)(false)
        sums.foreach { r =>
          val g = r.getInt(0)
          acc(g)(r.getInt(1)) = r.getDouble(2)
          seen(g) = true
        }
        fine = fine.zipWithIndex.map { case (group, c) =>
          group.zipWithIndex.map { case (prev, j) =>
            val g = offsets(c) + j
            if (!seen(g)) prev // empty fine cluster: carry forward
            else {
              var sq = 0.0
              var d = 0
              while (d < dim) { sq += acc(g)(d) * acc(g)(d); d += 1 }
              val nrm = math.sqrt(sq)
              if (nrm > 0) acc(g).map(_ / nrm).toSeq else prev
            }
          }
        }
        it += 1
      }
      TwoLevelModel(coarse, fine)
    } finally unit.unpersist()
  }

  /** Wrap a fitted single-level [[LloydModel]] for two-level routing: a
    * driver-side Lloyd over the k FINE CENTROIDS themselves (k rows — no
    * cluster job) groups them under ≈√k coarse routers; the returned
    * model's `globalCentroids` is a permutation of `m.centroids` (global
    * ids are relabelled cell-major), so routed assignment differs from the
    * exact argmax ONLY for rows whose best centroid sits outside their
    * probed coarse cells. This is the production answer when an exact
    * model already exists (the `buildIvfPqIndex` pattern): fit once at
    * whatever cost, route every later corpus pass at O(√k·dim) per row.
    *
    * Deterministic by the same conventions as the cluster fits: init =
    * index-strided picks `floor(i·k/kCoarse)`, grid-key argmax with
    * lowest-index ties, dimension-order mean renormalization,
    * empty-cluster carry-forward; empty coarse cells drop at the end. */
  def groupForRouting(
      m: LloydModel, kCoarse: Int = 0, iters: Int = 4): TwoLevelModel = {
    require(iters >= 0, s"groupForRouting: iters must be >= 0, got $iters")
    val fine = m.centroids.map(_.toArray)
    val k = fine.size
    val kc0 = if (kCoarse > 0) kCoarse
      else math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    val kc = math.min(kc0, k)
    val dim = fine.head.length
    var coarse: IndexedSeq[Array[Double]] =
      (0 until kc).map(i => fine((i.toLong * k / kc).toInt).clone())
    def assign(): Array[Int] = fine.map { f =>
      var best = 0; var bestKey = Long.MinValue
      var c = 0
      while (c < kc) {
        var acc = 0.0; var j = 0
        while (j < dim) { acc += coarse(c)(j) * f(j); j += 1 }
        val key = math.floor(acc * 1e6 + 0.5).toLong
        if (key > bestKey) { bestKey = key; best = c }
        c += 1
      }
      best
    }.toArray
    var it = 0
    while (it < iters) {
      val a = assign()
      coarse = (0 until kc).map { c =>
        val members = fine.indices.filter(a(_) == c)
        if (members.isEmpty) coarse(c)
        else {
          val mean = Array.tabulate(dim)(j => members.map(fine(_)(j)).sum / members.size)
          var sq = 0.0; var j = 0
          while (j < dim) { sq += mean(j) * mean(j); j += 1 }
          val nrm = math.sqrt(sq)
          if (nrm > 0) mean.map(_ / nrm) else coarse(c)
        }
      }
      it += 1
    }
    val a = assign()
    val live = (0 until kc).filter(c => a.contains(c))
    TwoLevelModel(
      live.map(coarse(_).toSeq),
      live.map(c => fine.indices.filter(a(_) == c).map(m.centroids(_)).toSeq))
  }

  /** Two-level assignment keeping the unit vector: `(idCol, cluster, sim,
    * __u__)` — `cluster` is the global fine id, `sim` the full-precision
    * dot to the winning fine centroid. One kernel call per row. */
  private def assignTwoLevelWithUnit(
      model: TwoLevelModel, df: DataFrame, idCol: String, vecCol: String,
      nProbe: Int): DataFrame =
    unitVectors(df, idCol, vecCol)
      .select(col(idCol),
        graft.functions.VectorFunctions.twoLevelBest(
          col("__u__"), model.coarse, model.fineByCell, nProbe).as("__b__"),
        col("__u__"))
      .select(col(idCol), col("__b__.cluster").as("cluster"),
        col("__b__.dot").as("sim"), col("__u__"))

  /** Cluster assignment under a fitted [[TwoLevelModel]]: `(idCol,
    * cluster, sim)`, one row per clusterable vector, O(√k·dim) per row. */
  def assignTwoLevel(
      model: TwoLevelModel, df: DataFrame, idCol: String, vecCol: String,
      nProbe: Int = 1): DataFrame =
    assignTwoLevelWithUnit(model, df, idCol, vecCol, nProbe).drop("__u__")

  /** [[semDedupReport]] under the two-level fit/assignment — the shape
    * that survives 10⁹-vector corpora. Same report contract and the same
    * Σc² pairwise stage; only cluster MEMBERSHIP is routed (see
    * [[fitLloydTwoLevel]] for the boundary trade). `nProbe` widens the
    * final assignment's coarse probe (fit always routes at nProbe=1). */
  def semDedupTwoLevelReport(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      simThreshold: Double,
      kCoarse: Int = 0,
      kFinePerCell: Int = 0,
      itersCoarse: Int = 2,
      itersFine: Int = 2,
      seed: Long = 42L,
      keep: String = "centroid_far",
      nProbe: Int = 1,
      model: Option[TwoLevelModel] = None,
      targetClusterRows: Int = 128): DataFrame = {
    require(Set("first", "centroid_far").contains(keep),
      s"semDedupTwoLevel: keep must be first|centroid_far, got '$keep'")
    val m = model.getOrElse(fitLloydTwoLevel(df, idCol, vecCol, kCoarse,
      kFinePerCell, itersCoarse, itersFine, seed, targetClusterRows))
    val af = assignTwoLevelWithUnit(m, df, idCol, vecCol, nProbe)
    pairwiseDropReport(df, idCol, af, simThreshold, keep)
  }

  /** The two-level SemDeDup'd corpus ([[semDedup]]'s contract under
    * [[semDedupTwoLevelReport]]). */
  def semDedupTwoLevel(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      simThreshold: Double,
      kCoarse: Int = 0,
      kFinePerCell: Int = 0,
      itersCoarse: Int = 2,
      itersFine: Int = 2,
      seed: Long = 42L,
      keep: String = "centroid_far",
      nProbe: Int = 1,
      model: Option[TwoLevelModel] = None,
      targetClusterRows: Int = 128): DataFrame = {
    val rep = semDedupTwoLevelReport(df, idCol, vecCol, simThreshold, kCoarse,
      kFinePerCell, itersCoarse, itersFine, seed, keep, nProbe, model,
      targetClusterRows)
    df.join(rep.where(!col("kept")).select(col(idCol)), Seq(idCol), "left_anti")
  }
}
