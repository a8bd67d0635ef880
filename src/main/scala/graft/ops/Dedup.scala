package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact (hash-group),
  * normalized token-set, MinHash+LSH near-dup, and SimHash near-dup.
  *
  * Scale design (the point of doing this on Spark):
  *   - exact / token-set dedup is one `groupBy` — a single shuffle on the
  *     dedup key; Spark's partial aggregation means each executor emits at
  *     most one row per local key before the exchange.
  *   - MinHash signatures are computed as pure column expressions (k
  *     `array_min(transform(...))` over the shingle array — no explode, no
  *     shuffle, whole-stage codegen). Only the *banding* join shuffles, and
  *     it shuffles band keys (doc_count × bands rows), never shingles.
  *   - candidate verification joins texts back by id — an equi-join Spark
  *     plans as broadcast or shuffle-hash depending on size; at 100 TB the
  *     candidate side is orders of magnitude smaller than the corpus.
  */
object Dedup {

  /** Conf key gating the explicit `broadcast()` hints on dedup DECISION
    * tables (duplicate-id lists, keeper maps). Default true: the
    * two-phase design premises decisions ≪ corpus, and the hint keeps
    * payload bytes off every exchange regardless of
    * `autoBroadcastJoinThreshold`/AQE. Set `"false"` for a pathological
    * corpus whose duplicate population alone exceeds driver memory: the
    * joins fall back to AQE/threshold sizing and degrade to a shuffle
    * join instead of a driver-side collect OOM. */
  val BroadcastDecisionsKey = "spark.graft.dedup.broadcastDecisions"

  /** `broadcast(df)` under [[BroadcastDecisionsKey]] (the failover knob);
    * plain `df` when the session disables decision broadcasts. */
  private[ops] def hintBroadcast(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.get(BroadcastDecisionsKey, "true").toBoolean)
      broadcast(df)
    else df

  /** Narrow (hash₁, hash₂, id) corpus table, hash-partitioned on the
    * 128-bit key hash. This is the ONE subtree every exact-dedup phase
    * consumes: the `repartition` puts a reusable shuffle exchange below all
    * of them, so `keyExpr` — potentially expensive (regex normalization,
    * shingle sorting) — is evaluated exactly ONCE over the corpus and the
    * exchange carries 24-byte rows, never the key itself. Consumers must
    * keep the column set identical (all three columns) or column pruning
    * forks the canonical subtree and the reuse is silently lost.
    *
    * Null-id rows are excluded (consistent with [[minhashTable]] /
    * `minhashNarrow`): the exact-verify phase retrieves candidate rows by
    * id equality, which cannot address a null id. [[dropDuplicatesByKey]]
    * passes null-id rows through unchanged. */
  private def hashedNarrow(df: DataFrame, keyExpr: Column, idCol: String): DataFrame =
    df.where(col(idCol).isNotNull)
      .select(
        xxhash64(keyExpr, lit(0)).as("__h1__"), xxhash64(keyExpr, lit(1)).as("__h2__"),
        col(idCol).as("__id__"))
      .repartition(col("__h1__"), col("__h2__"))

  /** Duplicate-candidate rows — (key, id) for every row whose 128-bit key
    * hash is shared by ≥ 2 rows — re-keyed on the FULL key so a hash
    * collision can never merge distinct documents. `keyExpr` is evaluated
    * here only for the candidates (a small fraction of a real corpus): the
    * candidate ids come off the shared [[hashedNarrow]] exchange and are
    * joined back to `df` by id under an EXPLICIT broadcast hint — the
    * two-phase design premises candidates ≪ corpus, and the hint keeps
    * the payload side of this semi join exchange-free regardless of
    * `autoBroadcastJoinThreshold`/AQE (an id-keyed shuffle here would
    * move the full KEY bytes — document text, image payloads — through
    * an exchange on exactly the high-duplication inputs where dedup
    * pays; the MediaDedup payload-locality spec pins this). So the
    * full-key exchange this feeds is candidate-sized, not corpus-sized. */
  private def dupKeyed(df: DataFrame, keyExpr: Column, idCol: String): DataFrame = {
    val hashed = hashedNarrow(df, keyExpr, idCol)
    // min(__id__) keeps __id__ in this consumer's column set: a count-only
    // aggregate would let column pruning push an __id__-free projection
    // below the shared repartition and fork the canonical subtree
    val dupHashes = hashed.groupBy("__h1__", "__h2__")
      .agg(min(col("__id__")).as("__keep__"), count(lit(1)).as("__n__"))
      .where(col("__n__") > 1 && col("__keep__").isNotNull)
      .select("__h1__", "__h2__")
    // INNER join, not left_semi: (h1,h2) is unique in dupHashes so they are
    // equivalent, but PushDownLeftSemiAntiJoin would push a semi join BELOW
    // the user repartition (semi-then-repartition ≡ repartition-then-semi),
    // forking the left side off the shared exchange and re-hashing the
    // corpus; inner joins stay put
    val dupIds = hashed.join(dupHashes, Seq("__h1__", "__h2__"))
      .select("__id__")
    df.join(hintBroadcast(dupIds), col(idCol) === dupIds("__id__"), "left_semi")
      .select(keyExpr.as("__key__"), col(idCol).as("__id__"))
  }

  /** Exact duplicate groups: one row per distinct key, the kept (minimum)
    * id and the number of copies.
    *
    * The shuffle key is a 128-bit hash of the key (two seeded xxhash64
    * slots), not the key itself — grouping on the full document text would
    * ship the whole corpus through the exchange; the hash is fixed-width.
    * Exactness is preserved, not assumed: a hash-singleton is provably a
    * key-singleton (identical keys always share a hash), and only the
    * hash-groups with ≥ 2 members — the duplicate candidates — are
    * re-grouped by the full key ([[dupKeyed]]) to split any 128-bit
    * collision. Both phases hang off the single [[hashedNarrow]] exchange,
    * so `keyExpr` runs once corpus-wide plus once for the candidates.
    *
    * `keyExpr` must be DETERMINISTIC: the candidate re-keying evaluates it
    * a second time for dup-candidate rows, and a nondeterministic key would
    * hash differently per evaluation and silently split groups. */
  def exactGroups(df: DataFrame, keyExpr: Column, idCol: String): DataFrame = {
    val hashed = hashedNarrow(df, keyExpr, idCol)
    val byHash = hashed.groupBy("__h1__", "__h2__")
      .agg(min(col("__id__")).as("keep_id"), count(lit(1)).as("n_copies"))
    val singles = byHash.where(col("n_copies") === 1).select("keep_id", "n_copies")
    val dupGroups = dupKeyed(df, keyExpr, idCol)
      .groupBy("__key__") // exact: collisions split here (equal keys ⇒ equal hashes)
      .agg(min(col("__id__")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")
    singles.unionByName(dupGroups)
  }

  /** Exact text dedup (byte-identical). */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    exactGroups(df, col(textCol), idCol)

  /** Ids of the rows a keep-first policy REMOVES: every dup-candidate row
    * that is not the minimum id of its full-key group. This list is
    * duplicate-sized (tiny against a real corpus), which is what makes
    * [[dropDuplicatesByKey]] a broadcast anti-join instead of a
    * corpus-sized shuffle join on the keep list. */
  def duplicateIds(df: DataFrame, keyExpr: Column, idCol: String): DataFrame =
    duplicateIdPairs(df, keyExpr, idCol).select("__id__")

  /** [[duplicateIds]] plus WHICH row each drop lost to: `(__id__,
    * __keep__)` — dropped id and its group's kept (minimum) id. The
    * provenance form dedup REPORTS need ([[MediaDedup.imageDedupReport]]);
    * same duplicate-sized output and hash-narrow shuffle shape. */
  def duplicateIdPairs(df: DataFrame, keyExpr: Column, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__key__"))
    dupKeyed(df, keyExpr, idCol)
      .withColumn("__keep__", min(col("__id__")).over(w))
      .where(col("__id__") =!= col("__keep__"))
      .select("__id__", "__keep__")
  }

  /** The deduplicated corpus under a keep-first (minimum id) policy: one
    * surviving row per distinct key — the "give me the clean dataset"
    * counterpart of [[exactGroups]] (same hash-keyed shuffle).
    *
    * Planned as `df ANTI JOIN duplicateIds`: the drop list is
    * duplicate-sized, so at corpus scale this is a broadcast anti-join the
    * corpus streams through — the keep-list semi-join it replaces shuffled
    * the ENTIRE corpus by id against a keep list nearly as large as the
    * corpus. Null-id rows pass through unchanged (they cannot be addressed
    * by a keep/drop policy). */
  def dropDuplicatesByKey(df: DataFrame, keyExpr: Column, idCol: String): DataFrame = {
    val drops = duplicateIds(df, keyExpr, idCol)
    df.join(drops, col(idCol) === drops("__id__"), "left_anti")
  }

  /** Ids a keep-NEWEST URL dedup removes: for every group of rows sharing
    * a [[Urls.normalizeUrl]] key, all but the row with the greatest
    * `tsCol` (ties to the LOWEST id; NULL timestamps lose to any
    * timestamped row, ties among them again to the lowest id).
    *
    * Same scale shape as [[duplicateIds]]: the corpus-wide exchange
    * carries the 128-bit key hash (24-byte rows, never the URL), only
    * hash-dup candidates re-key on the full normalized URL, and the
    * timestamps join back by id over the candidate-sized list (AQE
    * broadcasts it). Rows whose URL does not normalize (NULL key) are
    * never candidates. */
  def urlDuplicateIds(
      df: DataFrame, urlCol: String, tsCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // NULL keys (un-normalizable URLs) are excluded HERE, not just by
    // documentation: xxhash64(NULL, seed) is the seed hash, so every
    // NULL-key row would otherwise share one hash bucket and keep-newest
    // would collapse all non-URL rows to a single survivor
    val cand = dupKeyed(df, Urls.normalizeUrl(col(urlCol)), idCol)
      .where(col("__key__").isNotNull)
    val withTs = cand.join(
      df.select(col(idCol).as("__tid__"), col(tsCol).as("__ts__")),
      col("__id__") === col("__tid__"))
    val w = Window.partitionBy(col("__key__"))
      .orderBy(col("__ts__").desc_nulls_last, col("__id__"))
    withTs.withColumn("__rn__", row_number().over(w))
      .where(col("__rn__") > 1)
      .select("__id__")
  }

  /** URL-keyed crawl dedup, keep-newest (the CCNet/RefinedWeb snapshot
    * stage: the same page fetched across crawls — tracking params, port
    * and slash variants, fragments — keeps only its freshest capture).
    * Key = [[Urls.normalizeUrl]]; rows that do not normalize (no scheme /
    * no host) pass through unchanged, as do null-id rows. Planned as
    * `df ANTI JOIN urlDuplicateIds` — the drop list is duplicate-sized,
    * so the corpus streams through a broadcast anti-join. */
  def dropByUrl(
      df: DataFrame, urlCol: String, tsCol: String, idCol: String): DataFrame = {
    val drops = urlDuplicateIds(df, urlCol, tsCol, idCol)
    df.join(drops, col(idCol) === drops("__id__"), "left_anti")
  }

  /** Drop byte-identical duplicate texts (keep lowest id). */
  def dropExact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    dropDuplicatesByKey(df, col(textCol), idCol)

  /** Drop near-duplicates: every doc whose token-set (shingle-set) already
    * appeared under a lower id is removed. Equivalent to keep-first over
    * [[tokenSetKey]] groups; for sub-identical thresholds use
    * [[minhashDedup]] pairs with a caller-chosen keep policy. */
  def dropNearDuplicates(df: DataFrame, textCol: String, idCol: String, shingleSize: Int = 1): DataFrame =
    dropDuplicatesByKey(df, array_sort(shingles(col(textCol), shingleSize)), idCol)
  // array_sort: shingles() preserves occurrence order, which would make
  // reordered duplicates distinct keys

  /** Normalized token-set key: order- and multiplicity-insensitive content
    * identity — catches shuffled/repeated-word duplicates. */
  def tokenSetKey(c: Column): Column =
    array_sort(array_distinct(TextAnalysis.tokens(c)))

  /** Case/punctuation-insensitive normalization (the standard "fuzzy exact"
    * dedup preprocessor): lowercase, punctuation → space, whitespace runs
    * collapsed, trimmed. Two docs differing only in casing, punctuation, or
    * spacing share a key. */
  def normalizedKey(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** Exact dedup on the normalized text ([[normalizedKey]]) — same
    * hash-keyed two-phase shuffle as [[exactGroups]]. */
  def normalizedGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    exactGroups(df, normalizedKey(col(textCol)), idCol)

  def tokenSet(df: DataFrame, textCol: String, idCol: String): DataFrame =
    exactGroups(df, tokenSetKey(col(textCol)), idCol) // group by the array itself —
  // a string-cast key could collide for tokens containing the separator

  /** Distinct word n-gram shingles (n=1 → distinct tokens); documents with
    * fewer than n tokens yield an empty array. Native codegen'd expression
    * ([[graft.functions.WordNGrams]]) — the HOF composition this replaces
    * was CodegenFallback inside every signature pipeline's `Generate`. */
  def shingles(c: Column, n: Int): Column = {
    require(n >= 1)
    graft.functions.StringFunctions.wordNGrams(c, n)
  }

  /** Exact Jaccard similarity of two shingle arrays; NULL when both are
    * empty (0/0 — ANSI-safe). */
  def jaccard(a: Column, b: Column): Column =
    graft.core.WeightedMoments.safeDiv(
      size(array_intersect(a, b)).cast("double"),
      size(array_union(a, b)).cast("double"))

  /** k-permutation MinHash signature of a shingle array: one xxhash64 family
    * member per seed, `array_min` over the shingles. Pure expression form —
    * fine for small shingle arrays, but HOFs evaluate interpreted; the bulk
    * path is [[minhashTable]]. */
  def minhashSignature(sh: Column, k: Int): Column =
    array((0 until k).map(s => array_min(transform(sh, x => xxhash64(x, lit(s))))): _*)

  /** Narrow (id, signature, set-fingerprint) table: the whole signature —
    * k slot-mins, an order-insensitive 128-bit xor set fingerprint, and the
    * set size — comes from ONE per-row pass of the native
    * [[graft.functions.MinHashMeta]] expression over the shingle array.
    * ZERO shuffles: a document's signature is a pure function of its own
    * shingles, so the explode + grouped-aggregate formulation this replaces
    * paid a full corpus exchange on the doc id for nothing. Hash values are
    * bit-identical to that formulation (same seeded xxhash64 family), so
    * candidate sets are unchanged. Empty-shingle docs produce no row,
    * exactly as they produced no group before.
    *
    * Deliberately NO shingle sets in the output: carrying them through
    * every downstream join/sort is the dominant memory and shuffle cost at
    * corpus scale. Exact sets are re-derived per-row for the (small)
    * candidate subset at verify time ([[verifyCandidatePairs]]). */
  private[graft] def minhashNarrow(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int,
      numHashes: Int): DataFrame = {
    df.where(col(idCol).isNotNull)
      .select(col(idCol).as("__id__"),
        graft.functions.SignatureFunctions
          .minhashMeta(shingles(col(textCol), shingleSize), numHashes).as("__m__"))
      .where(col("__m__").isNotNull)
      .select(col("__id__"), col("__m__").getField("x1").as("__x1__"),
        col("__m__").getField("x2").as("__x2__"),
        col("__m__").getField("nsh").cast("long").as("__nsh__"),
        col("__m__").getField("sig").as("__sig__"))
  }

  /** Exact-Jaccard verification of candidate pairs: re-derive shingle sets
    * ONLY for documents that appear in a candidate pair (per-row expression
    * over a scan — no shuffle of set payloads for the rest of the corpus)
    * and keep pairs meeting the threshold. The small pair side broadcasts
    * under AQE; at scale it degrades gracefully to a shuffle join on ids.
    * `doc_a` resolves against `dfA`, `doc_b` against `dfB` (pass the same
    * frame twice for single-corpus dedup — the canonically identical
    * shingle subtrees still share one exchange). */
  private def verifyCandidatePairs(
      cand: DataFrame, // (doc_a, doc_b)
      dfA: DataFrame,
      dfB: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int,
      threshold: Double): DataFrame = {
    def sh(df: DataFrame) = df.select(col(idCol).as("__id__"),
      shingles(col(textCol), shingleSize).as("__sh__"))
    cand
      .join(sh(dfA).select(col("__id__").as("doc_a"), col("__sh__").as("sh_a")), "doc_a")
      .join(sh(dfB).select(col("__id__").as("doc_b"), col("__sh__").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** The threshold→(b, r) banding policy, in ONE place: explicit override,
    * else whole-signature band at t ≥ 1 (deterministic, exact-verified),
    * else [[bandRowsFor]]'s recall-preserving derivation. */
  private def bandRowsOrDerived(bandRows: Int, numHashes: Int, threshold: Double): Int =
    if (bandRows > 0) bandRows
    else if (threshold >= 1.0) numHashes
    else bandRowsFor(numHashes, threshold)

  /** Est-prefilter slack below the verify threshold (≈3σ of the k=32
    * signature-slot estimate — preserves recall while pruning candidates). */
  private[graft] val EstSlack = 0.25

  /** (__id__, __sig__, band, h) band-key table — the shared first stage of
    * every banding consumer (single-corpus candidates, cross-corpus links,
    * streaming state). Unused columns prune away downstream. */
  private[graft] def bandTable(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int,
      numHashes: Int,
      r0: Int): DataFrame =
    minhashNarrow(df, textCol, idCol, shingleSize, numHashes)
      .select(col("__id__"), col("__sig__"),
        explode(bandKeys(col("__sig__"), numHashes, r0)).as("bk"))
      .select(col("__id__"), col("__sig__"),
        col("bk.band").as("band"), col("bk.h").as("h"))

  /** LSH banding: split the k-slot signature into bands of `r` rows, hash
    * each band to one key. Docs sharing any band key become candidates. */
  private[graft] def bandKeys(sig: Column, k: Int, r: Int): Column = {
    require(k % r == 0, s"signature size $k must be divisible by band rows $r")
    val bands = k / r
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((0 until r).map(i => sig.getItem(b * r + i)) :+ lit(b): _*).as("h"))
    }: _*)
  }

  /** Candidate near-duplicate pairs (doc_a < doc_b) from MinHash banding.
    * `bandRows = 0` derives (b, r) from `threshold` via [[bandRowsFor]];
    * `threshold ≥ 1` degenerates to one whole-signature band (identical
    * signatures only — the same candidates [[minhashDedup]]'s ≥ 1 path
    * joins on). */
  def minhashCandidates(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 32,
      bandRows: Int = 0,
      threshold: Double = 0.9): DataFrame = {
    val r0 = bandRowsOrDerived(bandRows, numHashes, threshold)
    val banded = bandTable(df, textCol, idCol, shingleSize, numHashes, r0)
    val l = banded.select(col("band"), col("h"), col("__id__").as("doc_a"))
    val r = banded.select(col("band"), col("h"), col("__id__").as("doc_b"))
    l.join(r, Seq("band", "h"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
  }

  /** Band rows `r` for an LSH banding of `numHashes` slots targeting
    * `threshold`: candidate recall for a true-Jaccard-t pair under
    * (b = k/r bands, r rows) is 1 − (1 − t^r)^b. Pick the LARGEST divisor r
    * of k that still guarantees ≥ 0.95 recall at the threshold — larger r
    * means sharper banding (fewer false candidates to verify), so this is
    * the cheapest (b, r) that keeps recall. A fixed r (the old r = 8 with
    * k = 32) gives only ~52% candidate recall at t = 0.8. */
  private[graft] def bandRowsFor(numHashes: Int, threshold: Double): Int = {
    require(threshold > 0 && threshold < 1, s"bandRowsFor needs t in (0,1), got $threshold")
    val ok = (1 to numHashes).filter(numHashes % _ == 0).filter { r =>
      val b = numHashes / r
      1.0 - math.pow(1.0 - math.pow(threshold, r), b.toDouble) >= 0.95
    }
    if (ok.nonEmpty) ok.max else 1
  }

  /** Fraction of equal signature slots — the MinHash Jaccard estimate.
    * Unrolled per-slot comparison (k is a small compile-time constant):
    * the zip_with/aggregate HOF equivalent runs as CodegenFallback and
    * would drop the banding prefilter out of whole-stage codegen. */
  private def estJaccard(sigA: Column, sigB: Column, k: Int): Column =
    (0 until k).map(i =>
      when(sigA.getItem(i) === sigB.getItem(i), 1).otherwise(0))
      .reduce(_ + _).cast("double") / k

  /** Full MinHash near-dup pipeline: LSH candidates verified with exact
    * Jaccard ≥ `threshold`. Output: (doc_a, doc_b, jaccard).
    *
    * Two physical plans by threshold:
    *   - `threshold ≥ 1`: identical shingle sets ⇒ identical narrow rows
    *     (signature + 128-bit xor fingerprint + size), so candidates come
    *     from a streamed SELF-JOIN on the narrow table — a hot group emits
    *     its g² pairs through the join's streaming iterator instead of one
    *     g²-element array row (which would OOM an executor on a degenerate
    *     all-identical corpus). The table is `repartition(sig)`-ed first so
    *     every consumer reuses ONE exchange (the expensive explode+agg
    *     subtree is computed once), and recall is exactly 1.
    *   - `threshold < 1`: classic banding. Band buckets of mutually-similar
    *     corpora are heavily skewed, so candidates are (a) prefiltered by
    *     the cheap signature-slot estimate (threshold − 0.25 slack ≈ 3σ for
    *     k=32, preserving recall) while signatures are still at hand, and
    *     (b) repartitioned by pair (`distinct`) before verification so one
    *     hot bucket can't serialize the verify stage.
    * Both paths end in [[verifyCandidatePairs]] — exact Jaccard on shingle
    * sets re-derived for candidate docs only, so a hash collision can never
    * produce a wrong pair.
    */
  def minhashDedup(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 32,
      bandRows: Int = 0, // 0 → derived from the threshold ([[bandRowsFor]])
      threshold: Double = 0.9): DataFrame = {
    val narrow = minhashNarrow(df, textCol, idCol, shingleSize, numHashes)

    val cand =
      if (threshold >= 1.0) {
        // pre-partition by the signature: the self-join's clustering
        // requirement is satisfied by this single exchange, so both join
        // sides (canonically identical subtrees) reuse it — the merge hint
        // keeps the planner from broadcasting one side, which would
        // recompute the aggregate subtree instead of reusing the shuffle
        val t = narrow.repartition(col("__sig__"))
        t.as("a").hint("merge")
          .join(t.as("b").hint("merge"),
            col("a.__sig__") === col("b.__sig__") &&
              col("a.__x1__") === col("b.__x1__") &&
              col("a.__x2__") === col("b.__x2__") &&
              col("a.__nsh__") === col("b.__nsh__") &&
              col("a.__id__") < col("b.__id__"))
          .select(col("a.__id__").as("doc_a"), col("b.__id__").as("doc_b"))
      } else {
        val r0 = bandRowsOrDerived(bandRows, numHashes, threshold)
        val banded = bandTable(df, textCol, idCol, shingleSize, numHashes, r0)
        val l = banded.select(col("band"), col("h"), col("__id__").as("doc_a"), col("__sig__").as("sig_a"))
        val r = banded.select(col("band"), col("h"), col("__id__").as("doc_b"), col("__sig__").as("sig_b"))
        l.join(r, Seq("band", "h"))
          .where(col("doc_a") < col("doc_b"))
          .where(estJaccard(col("sig_a"), col("sig_b"), numHashes) >= threshold - EstSlack)
          .select("doc_a", "doc_b")
          .distinct() // also rebalances: hash-partitioned on the pair, not the hot bucket
      }
    verifyCandidatePairs(cand, df, df, textCol, idCol, shingleSize, threshold)
  }

  /** Cross-corpus near-duplicate LINKS: MinHash-banded candidates between
    * two corpora (new crawl vs. existing corpus, train vs. held-out
    * snapshot), verified with exact Jaccard ≥ `threshold`. Output:
    * (doc_a from `dfA`, doc_b from `dfB`, jaccard) — no `a < b` constraint
    * since the sides are distinct corpora.
    *
    * Same scale shape as [[minhashDedup]]'s banding path, but the join is
    * A-bands × B-bands: the shuffle carries band keys of BOTH corpora and
    * the verify runs only on surviving candidates. `threshold ≥ 1` keeps
    * one whole-signature band per doc (deterministic: identical shingle
    * sets only — exact-verified, so hash collisions cannot leak a pair);
    * below 1 the est-prefilter + pair-repartition skew guards apply. */
  def crossNearDuplicates(
      dfA: DataFrame,
      dfB: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 32,
      bandRows: Int = 0,
      threshold: Double = 0.9): DataFrame = {
    val r0 = bandRowsOrDerived(bandRows, numHashes, threshold)
    def banded(df: DataFrame, side: String): DataFrame =
      bandTable(df, textCol, idCol, shingleSize, numHashes, r0)
        .select(col("__id__").as(s"doc_$side"), col("__sig__").as(s"sig_$side"),
          col("band"), col("h"))
    val joined = banded(dfA, "a").join(banded(dfB, "b"), Seq("band", "h"))
    val pre =
      if (threshold >= 1.0) joined
      else joined.where(
        estJaccard(col("sig_a"), col("sig_b"), numHashes) >= threshold - EstSlack)
    val cand = pre.select("doc_a", "doc_b").distinct()
    verifyCandidatePairs(cand, dfA, dfB, textCol, idCol, shingleSize, threshold)
  }

  /** Keep only the documents of `df` with NO near-duplicate in `reference`
    * — incremental-ingest dedup: admit a new crawl batch only where it adds
    * content the corpus doesn't already have. Anti-join on the match list;
    * the reference corpus never materializes beyond its band keys. */
  def dropAgainstReference(
      df: DataFrame,
      reference: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 32,
      threshold: Double = 0.9): DataFrame = {
    val hits = crossNearDuplicates(df, reference, textCol, idCol,
      shingleSize, numHashes, bandRows = 0, threshold)
      .select(col("doc_a").as("__hit__")).distinct()
    df.join(hits, col(idCol) === col("__hit__"), "left_anti")
  }

  /** Per-document 64-bit SimHash from ONE per-row pass of the native
    * [[graft.functions.SimHash64]] expression — zero shuffles (the
    * explode + 64-vote aggregate this replaces paid a corpus exchange on
    * the doc id; the signature is a pure per-document function). Values are
    * bit-identical to the aggregate formulation. The explicit null-id
    * filter keeps every consumer's canonical plan identical
    * ([[simhashPairs]] infers isnotnull(id) on some branches), so they all
    * share one exchange. */
  def simhashTable(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 1): DataFrame =
    df.where(col(idCol).isNotNull)
      .select(col(idCol).as("__id__"),
        graft.functions.SignatureFunctions
          .simhash64(shingles(col(textCol), shingleSize)).as("__sim__"))
      .where(col("__sim__").isNotNull)

  /** SimHash near-dup pairs with Hamming distance ≤ `maxHamming`, found by
    * pigeonhole banding on `maxHamming + 1` chunks (hd ≤ m over m+1 chunks
    * ⇒ at least one chunk is untouched, so recall is exactly 1); candidate
    * pairs verified with `bit_count(xor)`.
    *
    * Skew treatment (the simhash analogue of [[minhashDedup]]'s
    * signature path): docs with an IDENTICAL 64-bit simhash are
    * interchangeable for banding, so the chunk-bucket self-join runs over
    * DISTINCT signatures, not docs — a degenerate corpus collapsing to one
    * simhash costs g² signature pairs, not n² doc pairs. Every pair
    * expansion is a streamed join (no `collect_list` of a group's ids into
    * one row, no flattened g²-element pair array): within-signature pairs
    * come from a self-join on the signature, and verified signature pairs
    * are expanded back to doc pairs by two id joins, each hash-partitioned
    * on its own key — memory per task stays O(1) rows however degenerate
    * the corpus. */
  def simhashPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      shingleSize: Int = 1,
      maxHamming: Int = 3): DataFrame =
    hammingPairs64(simhashTable(df, textCol, idCol, shingleSize), maxHamming)

  /** Banded Hamming-≤`maxHamming` pairs over DISTINCT 64-bit signatures
    * `(__sim__)` → `(sim_a, sim_b, hamming)` — the SIGNATURE-level half
    * of [[hammingPairs64]], exposed for consumers whose output is a
    * decision per document rather than a pair list ([[MediaDedup]]'s
    * ladder): clustering at signature granularity never materializes the
    * O(g_a·g_b) doc-pair expansion, which is the difference between a
    * linear and a quadratic job on a corpus whose signatures quantize
    * into a dense Hamming neighborhood (tiny thumbnails/beacons — a real
    * crawl staple; measured: the all-modality capstone's image slice at
    * x100 spent 400+ s materializing ~10⁹ doc pairs the decisions never
    * needed). */
  private[ops] def sigPairs64(sigs: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, s"maxHamming must be in [0,64), got $maxHamming")
    val nChunks = maxHamming + 1
    // partition the 64 bits into exactly nChunks non-empty ranges via
    // integer boundaries (a fixed chunk width would overshoot 64 bits for
    // many nChunks values, producing degenerate all-zero band keys)
    val bounds = (0 to nChunks).map(i => i * 64 / nChunks)
    val chunked = sigs.select(col("__sim__"),
      explode(array((0 until nChunks).map { ch =>
        val lo = bounds(ch)
        val bits = bounds(ch + 1) - lo
        val mask = if (bits >= 64) -1L else (1L << bits) - 1L
        struct(lit(ch).as("chunk"),
          shiftright(col("__sim__"), lo).bitwiseAND(mask).as("key"))
      }: _*)).as("ck"))
      .select(col("__sim__"), col("ck.chunk"), col("ck.key"))
    val l = chunked.select(col("chunk"), col("key"), col("__sim__").as("sim_a"))
    val r = chunked.select(col("chunk"), col("key"), col("__sim__").as("sim_b"))
    l.join(r, Seq("chunk", "key"))
      .where(col("sim_a") < col("sim_b"))
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .where(col("hamming") <= maxHamming)
      // a signature pair can match on several chunks; the groupBy both
      // dedupes and hash-partitions by the PAIR, moving any downstream
      // expansion off the hot bucket's join task
      .groupBy(col("sim_a"), col("sim_b")).agg(first(col("hamming")).as("hamming"))
  }

  /** Hamming-distance-≤`maxHamming` pairs over ANY 64-bit signature table
    * `(__id__, __sim__)` — the banding/verify/expand engine behind
    * [[simhashPairs]], factored out so other 64-bit perceptual signatures
    * (image aHash/dHash — [[graft.ops.MediaDedup]]) ride the same
    * pigeonhole machinery and skew guards. Same recall-1 guarantee and
    * distinct-signature join shape as documented on [[simhashPairs]].
    * NULL ids / signatures are excluded (a pair policy cannot address
    * them). */
  def hammingPairs64(sigTable: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, s"maxHamming must be in [0,64), got $maxHamming")
    // pre-partition the (id, simhash) table by the signature: every
    // consumer below (self-join sides, distinct signatures, the two doc
    // expansions) needs clustering by __sim__, so they all reuse this ONE
    // exchange and the signature subtree is computed once
    val docs = sigTable
      .where(col("__id__").isNotNull && col("__sim__").isNotNull)
      .repartition(col("__sim__")) // (__id__, __sim__)

    // within-signature pairs (hamming 0 by construction): streamed self-join
    // on the 64-bit signature — merge keeps the planner off a broadcast
    // plan that would recompute the signature subtree instead of reusing
    // the exchange
    val eqPairs = docs.as("a").hint("merge")
      .join(docs.as("b").hint("merge"),
        col("a.__sim__") === col("b.__sim__") && col("a.__id__") < col("b.__id__"))
      .select(col("a.__id__").as("doc_a"), col("b.__id__").as("doc_b"), lit(0).as("hamming"))

    // distinct signatures via groupBy(sig) + a representative id that a
    // trivially-true filter keeps alive: a plain select(sig).distinct()
    // lets column pruning push a sig-only projection BELOW the shared
    // repartition, forking this consumer's canonical subtree away from the
    // (id, sig) joins — one corpus re-scan and re-hash for nothing
    val sigs = docs.groupBy(col("__sim__")).agg(min(col("__id__")).as("__rep__"))
      .where(col("__rep__").isNotNull)
      .select("__sim__")
    val sigPairs = sigPairs64(sigs, maxHamming)
    // expand signature pairs to doc pairs: two streamed equi-joins on the
    // signature (each repartitions on its own join key — no array blow-up)
    val crossPairs = sigPairs
      .join(docs.select(col("__sim__").as("sim_a"), col("__id__").as("a")), "sim_a")
      .join(docs.select(col("__sim__").as("sim_b"), col("__id__").as("b")), "sim_b")
      .select(least(col("a"), col("b")).as("doc_a"),
        greatest(col("a"), col("b")).as("doc_b"), col("hamming"))
    eqPairs.unionByName(crossPairs)
  }

  /** Character n-gram Jaccard similarity for explicit document pairs —
    * the n-gram-Jaccard near-dup check run over a candidate pair list. */
  def ngramJaccardForPairs(
      pairs: DataFrame, // (doc_a, doc_b)
      docs: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3): DataFrame = {
    // native codegen'd n-gram expression — the interpreted HOF composition
    // (sequence → transform → substr → array_distinct) costs ~1.4 ms/doc.
    // repartition(id): both join sides consume the same canonical subtree,
    // so the gram computation and its exchange run ONCE (ReuseExchange)
    // instead of once per side.
    val grams = docs.select(col(idCol).as("__id__"),
      graft.functions.StringFunctions.charNGrams(col(textCol), n).as("__g__"))
      .repartition(col("__id__"))
    pairs
      .join(grams.withColumnRenamed("__id__", "doc_a").withColumnRenamed("__g__", "g_a"), "doc_a")
      .join(grams.withColumnRenamed("__id__", "doc_b").withColumnRenamed("__g__", "g_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"), jaccard(col("g_a"), col("g_b")).as("ngram_jaccard"))
  }

  /** Distributed connected components over an undirected edge list — the
    * clustering step that turns pairwise near-duplicate hits ([[minhashDedup]],
    * [[simhashPairs]], `Similarity.nearestNeighbors`) into DUPLICATE GROUPS:
    * every node gets `cluster_id` = the smallest node id reachable from it.
    * (Pairs alone under-dedup: a∼b and b∼c puts a, b, c in one cluster even
    * when a∼c was never emitted.)
    *
    * Algorithm: min-label propagation with EDGE CONTRACTION (the star-
    * contraction shape of the MapReduce connected-components literature,
    * cf. Kiveris et al.'s large-star/small-star): each round (1) every
    * node takes the min of its own label and its graph-neighbors' labels,
    * (2) the label table is pointer-jumped (`lbl := min(lbl, lbl(lbl))`)
    * a few times to compress pointer chains, and (3) the edge set is
    * REWRITTEN through the new labels (`(s,t) → (lbl(s), lbl(t))`, loops
    * dropped, distinct) so adjacent label regions merge pairwise and the
    * active graph shrinks geometrically — termination (no inter-region
    * edge left) in O(log n) rounds. Label propagation without contraction
    * is O(diameter): information crosses local-minimum regions one edge
    * hop per round (measured: a 5 000-node interval graph at sf0.1 was
    * still churning after 50 rounds; contraction finishes it in 5). Every
    * shuffle carries 16-byte (node, label) or (src, dst) rows, never
    * payloads, and the edge table SHRINKS each round, so later rounds are
    * nearly free. Iteration state is frozen with a statistics reset (see
    * `DatasetBridge` — checkpointing alone carries Catalyst size estimates
    * that SQUARE per self-join round and melt the driver in BigInteger
    * arithmetic); the freeze follows the session's checkpoint
    * configuration — RELIABLE `checkpoint` (survives executor loss) when
    * `sparkContext.setCheckpointDir` is set, `localCheckpoint` in
    * single-JVM sessions — with bit-identical results either way.
    *
    * `nodes` supplies the full node universe (isolated nodes never appear
    * in the edge list); pass e.g. `docs.select(idCol)`. Throws if the fix
    * point is not reached within `maxIter` rounds.
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      nodes: DataFrame,
      nodeCol: String,
      maxIter: Int = 50): DataFrame =
    connectedComponentsWithStats(edges, srcCol, dstCol, nodes, nodeCol, maxIter)._1

  /** [[connectedComponents]] plus the number of contraction rounds it took —
    * the observable behind the O(log n) claim (asserted in
    * ConnectedComponentsSpec on a worst-case path graph). */
  private[graft] def connectedComponentsWithStats(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      nodes: DataFrame,
      nodeCol: String,
      maxIter: Int = 50): (DataFrame, Int) = {
    // freeze = materialize + TRUNCATE both lineage AND statistics. The
    // stats reset is load-bearing: checkpoint alone carries originStats,
    // and iterated self-joins square sizeInBytes each round — the BigInt
    // doubles in bit-length per step and the driver ends up spending
    // minutes in BigInteger.multiply planning 16-byte-row joins (measured:
    // 124 s for one 5 000-row jump by round 5). On a cluster with a
    // configured checkpoint dir the materialization is a RELIABLE
    // checkpoint (survives executor loss); single-JVM sessions fall back
    // to localCheckpoint. See DatasetBridge.freezeStatsFree.
    // chain-tracked freezes: each round's frames supersede the previous
    // round's, whose checkpoint files / localCheckpoint blocks are
    // released immediately (freezing is eager, so a superseded input is
    // safe to drop the moment its successor's freeze returns) — without
    // this a CC run accumulates O(rounds) checkpoint copies for the life
    // of the application (cleanCheckpoints is off by default)
    val chain = new org.apache.spark.sql.graftbridge.DatasetBridge.FreezeChain
    def freeze(df: DataFrame): DataFrame = chain.freeze(df)
    def jumpOnce(t: DataFrame): DataFrame = t
      .join(t.select(col("id").as("lbl"), col("lbl").as("lbl2")), Seq("lbl"), "left")
      .select(col("id"), least(col("lbl"), col("lbl2")).as("lbl"))
    // k composed jumps as ONE job: the input is a checkpointed leaf, so the
    // 2^k leaf references are cached-block re-reads, not recomputation —
    // one materialization instead of k (k is small; the intra-plan size
    // estimates square only k times, a ~2^k·64-bit constant)
    def jump(t: DataFrame, k: Int): DataFrame =
      freeze(Iterator.iterate(t)(jumpOnce).drop(k).next())
    // symmetric, self-loop-free, distinct edge table — frozen once; every
    // round re-reads it, so recomputing the caller's (possibly expensive)
    // pair-generation per round would multiply the whole upstream plan
    var e = freeze(
      edges.select(col(srcCol).as("s"), col(dstCol).as("t"))
        .union(edges.select(col(dstCol).as("s"), col(srcCol).as("t")))
        .where(col("s") =!= col("t") && col("s").isNotNull && col("t").isNotNull)
        .distinct())
    // label universe = nodes ∪ edge endpoints: an endpoint missing from
    // `nodes` must still RELAY labels (dropping it would silently
    // disconnect paths through it); the output is filtered back to the
    // caller's node universe at the end
    val nodeIds = nodes.select(col(nodeCol).as("id")).where(col("id").isNotNull).distinct()
    var labels = freeze(
      nodeIds.union(e.select(col("s").as("id")))
        .distinct().withColumn("lbl", col("id")))
    val innerJumps = 3 // 2³ = 8-level chain compression per round
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // min over: own label, neighbor REGION roots' labels
      val nbr = e.join(labels.select(col("id").as("t"), col("lbl")), Seq("t"))
        .select(col("s").as("id"), col("lbl"))
      val cur0 = freeze(labels.select("id", "lbl").union(nbr)
        .groupBy("id").agg(min("lbl").as("lbl")))
      chain.release(labels) // folded into cur0
      // path compression: follow the label's own label (labels are node
      // ids, so the table doubles as the jump table)
      val cur = jump(cur0, innerJumps)
      chain.release(cur0) // superseded by its own jumped image
      // CONTRACT: rewrite the surviving edges through the new labels —
      // adjacent label regions merge pairwise, so the edge set (and the
      // active graph) shrinks geometrically and the loop terminates in
      // O(log n) rounds when NO inter-region edge remains (label-jumping
      // alone is O(diameter): information crosses local-minimum regions
      // one edge hop per round — measured 50+ stalled rounds at sf0.1)
      val eNew = freeze(e
        .join(cur.select(col("id").as("s"), col("lbl").as("__ls__")), Seq("s"))
        .join(cur.select(col("id").as("t"), col("lbl").as("__lt__")), Seq("t"))
        .select(col("__ls__").as("s"), col("__lt__").as("t"))
        .where(col("s") =!= col("t")).distinct())
      chain.release(e) // contracted edges supersede the old edge table
      e = eNew
      labels = cur
      converged = e.isEmpty
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIter rounds")
    chain.release(e) // the result below reads only `labels`
    // flush stale chains: members that lost their edges in an early
    // contraction stop receiving root updates, so their labels can lag the
    // root's final value by a pointer chain — jump to the fixpoint (chains
    // only point downward, terminating at each component's minimum)
    var stable = false
    var flushes = 0
    while (!stable && flushes < maxIter) {
      val j = jump(labels, 1)
      stable = j.join(labels.select(col("id"), col("lbl").as("__old__")), Seq("id"))
        .where(col("lbl") =!= col("__old__")).isEmpty
      chain.release(labels) // the stability probe above already ran
      labels = j
      flushes += 1
    }
    require(stable, s"label flush did not stabilize within $maxIter jumps")
    // `labels` itself is NOT released: the returned plan reads it lazily —
    // its one checkpoint copy lives until application exit (O(1), not
    // O(rounds))
    (labels.join(nodeIds, Seq("id"), "left_semi")
      .select(col("id").as(nodeCol), col("lbl").as("cluster_id")), iter)
  }

  /** One-call duplicate clustering: near-duplicate PAIRS → per-document
    * `cluster_id` over the whole corpus (documents with no near-dup hit
    * form singleton clusters). `pairs` is any (doc_a, doc_b) frame —
    * [[minhashDedup]], [[simhashPairs]], or a thresholded
    * `Similarity.nearestNeighbors` output. Dedup policy then reduces to
    * "keep min(doc_id) per cluster_id" — transitively correct, unlike
    * pairwise keep-first. */
  def duplicateClusters(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame =
    connectedComponents(pairs, "doc_a", "doc_b", docs.select(idCol), idCol)

  /** EXACT duplicated-SPAN removal (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better", §ExactSubstr) at
    * token-window granularity: any `windowTokens`-token window whose text
    * repeats anywhere in the corpus is removed from every occurrence
    * EXCEPT the globally-first (`idCol`, token position) one; overlapping
    * duplicated windows merge into spans naturally (every covered token
    * goes). This is the granularity between [[dedupParagraphs]] (needs a
    * separator the duplicate respects) and document dedup (needs the
    * whole doc to match) — the reference ExactSubstr uses a corpus
    * suffix array, which is inherently sequential; fixed-width window
    * hashing is the standard distributed re-expression, trading
    * sub-window matches (shorter than `windowTokens` tokens are never
    * removed) for an embarrassingly parallel shuffle shape. Duplicated
    * spans LONGER than the window are covered exactly: every window
    * inside the span repeats, so the union of window ranges is the span.
    *
    * PRECONDITION: `idCol` must be unique (see [[dedupParagraphs]] — same
    * kept/removed-position join-back, same corruption mode on duplicate
    * ids). Run document-level dedup or assign fresh ids first.
    *
    * Output (`idCol`, `text_clean`): surviving tokens rejoined with
    * single spaces — a TOKEN-level rebuild, so original whitespace runs
    * normalize (the standard contract for token-window scrubbing; the
    * token list, not the byte stream, is what training pipelines feed
    * on). NULL text stays NULL; a fully-duplicated document becomes ''.
    * Documents shorter than `windowTokens` tokens have no windows and
    * pass through (modulo whitespace normalization).
    *
    * Scale shape: one narrow (id, pos, xxhash64(window)) table — ~one row
    * per corpus TOKEN, the same row count every shingle pipeline here
    * explodes to — shuffled on the 8-byte window hash for the
    * first-occurrence aggregate, joined back narrow, then one per-doc
    * aggregate of duplicated window starts and one id-keyed join against
    * the original text (text moves once, never exploded). Window hashing
    * is an O(tokens × windowTokens) HOF per document; the rebuild
    * membership test is O(tokens × dup-windows) per document —
    * acceptable because dup windows are duplicate-sized, not
    * corpus-sized. 64-bit collisions merge distinct windows
    * (p ≈ n²/2⁶⁵), same documented tradeoff as the other hash-keyed
    * scrub passes. */
  def dedupSpans(
      df: DataFrame,
      textCol: String,
      idCol: String,
      windowTokens: Int = 8): DataFrame = {
    require(windowTokens >= 2, s"windowTokens must be >= 2, got $windowTokens")
    val w = windowTokens
    // THE engine whitespace contract (not \S: Java \s ≠ RE2 \s on U+000B)
    // — one shared definition with the native window kernel, so the hash
    // path and this rebuild path cannot desynchronize
    val tokRe = graft.functions.EngineWhitespace.TokenRe
    def toks(c: Column) = regexp_extract_all(c, lit(tokRe), lit(0))
    // window hashing is the native one-pass codegen'd kernel
    // ([[graft.functions.WordNGramHashes]]); the HOF composition it
    // replaced (transform + slice + array_join + xxhash64 per position)
    // evaluated interpreted inside the Generate — same values by
    // construction, pinned in GraftExpressionsSpec
    val wins = df.where(col(textCol).isNotNull).select(col(idCol),
      posexplode(graft.functions.StringFunctions.wordNGramHashes(col(textCol), w))
        .as(Seq("__pos__", "__wh__")))
    val firstOcc = wins.groupBy("__wh__").agg(
      min(struct(col(idCol), col("__pos__"))).as("__first__"),
      count(lit(1)).as("__n__"))
    val dupStarts = wins.join(firstOcc, Seq("__wh__"))
      .where(col("__n__") > 1 &&
        !(col(idCol) === col("__first__")(idCol) &&
          col("__pos__") === col("__first__")("__pos__")))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("__pos__"))).as("__dups__"))
    df.select(col(idCol), col(textCol))
      .join(dupStarts, Seq(idCol), "left")
      .select(col(idCol),
        when(col(textCol).isNotNull,
          array_join(
            filter(toks(col(textCol)), (_, j) =>
              coalesce(!exists(col("__dups__"),
                d => d <= j && j < d + w), lit(true))),
            " ")).as("text_clean"))
  }

  /** CORPUS-level exact paragraph dedup (the sub-document granularity the
    * document-level ops above can't reach): split every document on `sep`,
    * remove each repeated paragraph everywhere EXCEPT its first occurrence
    * in global (`idCol`, position) order, and reassemble the survivors in
    * their original order. This is the RefinedWeb / MassiveText
    * "duplicated passages repeat across pages that are not themselves
    * duplicates" pass — syndicated quotes, shared footers longer than one
    * line, boilerplate sections — which document-level dedup never fires
    * on and [[graft.ops.Scrub.dropBoilerplateLines]] only catches at
    * single-line granularity above a frequency threshold.
    *
    * PRECONDITION (shared with [[dedupSpans]]): `idCol` must be unique —
    * it is the document identity the kept-position arrays join back on,
    * so two rows sharing an id would have their positions merged and each
    * other's duplicates removed from both. Run document-level dedup (or
    * assign fresh ids) first.
    *
    * Paragraphs shorter than `minChars` characters are EXEMPT (always
    * kept, every occurrence): headings like "Introduction" or "Share"
    * legitimately repeat across a corpus, and removing all but one
    * occurrence would mutilate unrelated documents. Exemption is by
    * character length, the standard span-length guard.
    *
    * Output: (`idCol`, `text_clean`). NULL text stays NULL; a document
    * whose every paragraph was removed becomes the empty string (distinct
    * from NULL, same contract as [[Scrub.dropBoilerplateLines]]).
    *
    * Scale shape: the dedup decision runs entirely on a NARROW
    * (id, pos, xxhash64(para), length) table — one shuffle of 8-byte
    * paragraph keys for the min-occurrence aggregate, one narrow
    * self-join on those keys, one (id → kept positions) aggregate. The
    * paragraph text is never EXPLODED into the shuffle (the groupBy-
    * reassembly alternative shuffles every paragraph as its own row):
    * the original text moves exactly once, in the final id-keyed join
    * against the kept-position arrays, and survivors are rebuilt
    * doc-locally by re-splitting it and filtering by kept position
    * (O(paragraphs²) per doc in the membership test — fine for the
    * tens-of-paragraphs documents this targets). First-occurrence keys
    * cannot broadcast (one per distinct paragraph, corpus-sized), so the
    * narrow join shuffles — but 24-byte rows, never text. A 64-bit key
    * collision merges two distinct paragraphs (p ≈ n²/2⁶⁵) — acceptable
    * for a scrubbing pass, same tradeoff as [[Scrub.dropBoilerplateLines]].
    */
  def dedupParagraphs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      sep: String = "\n\n",
      minChars: Int = 0): DataFrame = {
    require(sep.nonEmpty, "sep must be non-empty")
    require(minChars >= 0, s"minChars must be >= 0, got $minChars")
    val sepRe = java.util.regex.Pattern.quote(sep)
    val paras = df.where(col(textCol).isNotNull).select(col(idCol),
      posexplode(split(col(textCol), sepRe, -1)).as(Seq("__pos__", "__para__")))
    val occ = paras.select(col(idCol), col("__pos__"),
      xxhash64(col("__para__")).as("__ph__"),
      length(col("__para__")).as("__len__"))
    val firstOcc = occ.groupBy("__ph__")
      .agg(min(struct(col(idCol), col("__pos__"))).as("__first__"))
    val keptPos = occ.join(firstOcc, Seq("__ph__"))
      .where(col("__len__") < minChars ||
        (col(idCol) === col("__first__")(idCol) &&
          col("__pos__") === col("__first__")("__pos__")))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("__pos__"))).as("__kept__"))
    df.select(col(idCol), col(textCol))
      .join(keptPos, Seq(idCol), "left")
      .select(col(idCol),
        when(col(textCol).isNotNull,
          array_join(
            filter(split(col(textCol), sepRe, -1),
              (_, i) => coalesce(array_contains(col("__kept__"), i), lit(false))),
            sep)).as("text_clean"))
  }
}
