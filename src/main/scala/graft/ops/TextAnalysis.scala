package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID (stopword-marker heuristic), quality scoring, token counting
  * (whitespace + BPE-ish pre-tokenizer regex), and document fingerprinting.
  *
  * Everything is a pure `Column` expression (whole-stage codegen, no UDFs,
  * no shuffle): at 100 TB these run as a single narrow projection over the
  * scan, and any downstream filter on the derived columns is pushed into the
  * same stage.
  */
object TextAnalysis {

  /** Per-language marker/stopword lists for the language-ID heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "in", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von"),
    "fr" -> Seq("le", "les", "des", "et", "est", "une"))

  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Whitespace token count. */
  def wsTokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish pre-tokenizer count: letter runs, digit runs, punctuation —
    * the GPT-2-style pre-split, counted without materializing tokens. */
  val BpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeTokenCount(c: Column): Column = regexp_count(c, lit(BpeTokenPattern))

  /** EXACT BPE token count under a vendored merges vocabulary — the
    * trainer-token twin of [[bpeTokenCount]]'s approximation; use it
    * wherever a packing capacity or corpus token budget must be exact in
    * the trainer's tokens (see [[graft.functions.BpeVocab]]). */
  def bpeTokenCountExact(c: Column, vocab: graft.functions.BpeVocab): Column =
    graft.functions.BpeFunctions.bpeCount(c, vocab)

  /** EXACT BPE token-ID sequence (`array<int>`) under a vendored merges
    * vocabulary — what a trainer actually loads; [[bpeTokenCountExact]]
    * is its `size`. Derived ids: bytes 0–255, merge results 256+rank
    * ([[graft.functions.BpeVocab.idOf]]). */
  def bpeEncodeExact(c: Column, vocab: graft.functions.BpeVocab): Column =
    graft.functions.BpeFunctions.bpeEncode(c, vocab)

  // safeDiv: an empty document would otherwise divide by zero (ANSI throws)
  def alphaRatio(c: Column): Column =
    graft.core.WeightedMoments.safeDiv(
      length(regexp_replace(c, "[^A-Za-z]", "")).cast("double"), length(c).cast("double"))

  def punctRatio(c: Column): Column =
    graft.core.WeightedMoments.safeDiv(
      length(regexp_replace(c, "[A-Za-z0-9\\s]", "")).cast("double"), length(c).cast("double"))

  /** Occurrences of any marker of `lang` (all occurrences, not distinct).
    *
    * Counted with a boundary-anchored regex rather than
    * `filter(tokens(c), …)`: the higher-order-function lambda is
    * CodegenFallback, which knocks the ENTIRE analyze projection (and any
    * filter collapsed into it) out of whole-stage codegen — measured ~2×
    * on the full analysis query. The zero-width `(?<!\S) … (?!\S)`
    * boundaries match exactly whole whitespace-delimited tokens, so counts
    * equal the token-equality formulation (adjacent markers included — the
    * lookarounds consume no separator). */
  def markerCount(c: Column, lang: String): Column = {
    val markers = LangMarkers.toMap.apply(lang)
    // Pattern.quote each marker: today's markers are plain words, but a
    // future marker containing a regex metacharacter (e.g. "c'est") must
    // count as a literal token, not silently change the alternation
    val quoted = markers.map(java.util.regex.Pattern.quote)
    regexp_count(c, lit("(?<!\\S)(" + quoted.mkString("|") + ")(?!\\S)"))
  }

  def stopwordRatio(c: Column, lang: String = "en"): Column =
    markerCount(c, lang).cast("double") / wsTokenCount(c)

  /** Language ID: argmax of per-language marker counts, ties broken in
    * [[LangMarkers]] order, all-zero → "unknown". A real pipeline would use
    * char-n-gram profiles; the argmax plumbing is identical.
    */
  def langId(c: Column): Column = {
    val scores = LangMarkers.map { case (lang, _) => lang -> markerCount(c, lang) }
    val allZero = scores.map(_._2 <= 0).reduce(_ && _)
    // fold from the right: last language is the ELSE, each earlier language
    // wins ties against all later ones
    val argmax = scores.init.foldRight(lit(scores.last._1)) { case ((lang, s), rest) =>
      when(scores.filter(_._1 != lang).map(o => s >= o._2).reduce(_ && _), lang).otherwise(rest)
    }
    when(allZero, "unknown").otherwise(argmax)
  }

  /** Composite quality score in [0,1]: length, alphabetic purity, stopword
    * density — the usual cheap pre-filter signals. */
  def qualityScore(c: Column): Column =
    lit(0.4) * least(lit(1.0), wsTokenCount(c).cast("double") / 80.0) +
      lit(0.3) * alphaRatio(c) +
      lit(0.3) * least(lit(1.0), stopwordRatio(c) * 5.0)

  /** Gopher-rule thresholds (after Rae et al. 2021 §A1.1) — every rule an
    * independent boolean so pipelines can loosen one without losing the
    * others. The hash and ellipsis symbol ratios are thresholded
    * SEPARATELY, as in the paper (summing them would be strictly
    * tighter). */
  final case class GopherThresholds(
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      maxBulletRatio: Double = 0.9,
      maxEllipsisRatio: Double = 0.3,
      minAlphaWordRatio: Double = 0.8,
      minStopwords: Int = 2)

  /** The required-stopword list of the Gopher repetition filter. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style document quality rules: word-count bounds, mean word
    * length, hash/ellipsis symbol ratios, bullet-line and ellipsis-line
    * ratios, alphabetic-word ratio, required-stopword presence — the
    * standard cheap pre-filter battery for web-scraped LLM corpora. Emits
    * each signal (ratios rounded to 6 for cross-engine comparability) plus
    * the per-rule conjunction `passes` (NULL text → every signal NULL,
    * passes false).
    *
    * Cross-engine discipline: whitespace is exactly `[ \t\n\f\r]` (RE2's
    * `\s`; Java's `\s` would additionally match U+000B), line signals are
    * defined against `\n` separators ONLY (the multiline `(?m)` anchors
    * would additionally honor `\r`/U+2028/…, silently disagreeing with any
    * split-on-\n denominator or oracle), and `…` (U+2026) counts as an
    * ellipsis alongside `...`.
    *
    * All signals derive from [[graft.functions.GopherSignals]] — ONE native
    * codegen'd character scan per document (no regex passes, no HOF lambdas,
    * no explode); at 100 TB this filters at scan speed. The counter
    * definitions (word = maximal `\S+` run, per-\n-line bullet/ellipsis
    * checks, exact-token stopword presence) are RE2-expressible so the
    * oracle mirrors them verbatim; word counting follows the Gopher-paper
    * semantics of non-whitespace runs, so a document that is blank under
    * ANY whitespace (tabs/newlines included, not just spaces) has ZERO
    * words. */
  /** The battery conjunction over a [[graft.functions.TextFunctions
    * .gopherSignals]] struct — shared by [[gopherQuality]]'s `passes`
    * column and [[gopherPasses]], so the reported battery and the
    * scan-time gate cannot drift. NULL signals (NULL text) → NULL;
    * callers coalesce to false. */
  private def passesFromSignals(sig: Column, t: GopherThresholds): Column = {
    import graft.core.WeightedMoments.safeDiv
    def g(f: String) = sig.getField(f).cast("double")
    val words = g("n_words")
    val meanLen = safeDiv(g("n_nonws_chars"), words)
    val lines = g("n_lines")
    words >= t.minWords && words <= t.maxWords &&
      meanLen >= t.minMeanWordLen && meanLen <= t.maxMeanWordLen &&
      safeDiv(g("n_hash"), words) <= t.maxSymbolRatio &&
      safeDiv(g("n_ellipsis_sym"), words) <= t.maxSymbolRatio &&
      safeDiv(g("n_bullet_lines"), lines) <= t.maxBulletRatio &&
      safeDiv(g("n_ellipsis_lines"), lines) <= t.maxEllipsisRatio &&
      safeDiv(g("n_alpha_words"), words) >= t.minAlphaWordRatio &&
      sig.getField("n_stopwords") >= t.minStopwords
  }

  /** The Gopher battery as a standalone scan-time PREDICATE: one native
    * signal scan per row, no battery frame, no join-back — the shape a
    * 100 TB ingest filter wants (`df.where(gopherPasses(col(text), t))`
    * keeps the whole chain one scan, where filtering through
    * [[gopherQuality]]'s output costs a second text pass + a semi-join).
    * NULL/blank text → false, exactly [[gopherQuality]]'s `passes`. */
  def gopherPasses(text: Column, t: GopherThresholds = GopherThresholds()): Column =
    coalesce(
      passesFromSignals(graft.functions.TextFunctions.gopherSignals(text), t),
      lit(false))

  def gopherQuality(
      df: DataFrame,
      textCol: String,
      idCol: String,
      t: GopherThresholds = GopherThresholds()): DataFrame = {
    import graft.core.WeightedMoments.safeDiv
    // materialize the struct under an alias FIRST: every ratio reads from
    // the one scan (CollapseProject will not inline a non-cheap expression
    // into its nine consumers, and the plan audit pins that)
    val withSig = df.select(col(idCol), col(textCol),
      graft.functions.TextFunctions.gopherSignals(col(textCol)).as("__g__"))
    def g(f: String) = col("__g__").getField(f).cast("double")
    val words = g("n_words")
    val meanLen = safeDiv(g("n_nonws_chars"), words)
    val hashRatio = safeDiv(g("n_hash"), words)
    val ellipsisSymRatio = safeDiv(g("n_ellipsis_sym"), words)
    val lines = g("n_lines")
    val bulletRatio = safeDiv(g("n_bullet_lines"), lines)
    val ellipsisLineRatio = safeDiv(g("n_ellipsis_lines"), lines)
    val alphaWordRatio = safeDiv(g("n_alpha_words"), words)
    val nStop = col("__g__").getField("n_stopwords")
    val passes = passesFromSignals(col("__g__"), t)
    withSig.select(
      col(idCol),
      words.cast("long").as("n_words"),
      round(meanLen, 6).as("mean_word_len"),
      round(hashRatio, 6).as("hash_ratio"),
      round(ellipsisSymRatio, 6).as("ellipsis_sym_ratio"),
      round(bulletRatio, 6).as("bullet_ratio"),
      round(ellipsisLineRatio, 6).as("ellipsis_ratio"),
      round(alphaWordRatio, 6).as("alpha_word_ratio"),
      nStop.cast("long").as("n_stopwords"),
      coalesce(passes, lit(false)).as("passes")) // blank/NULL text → fail
  }

  /** Content fingerprint (md5 hex) — stable across engines. */
  def fingerprintMd5(c: Column): Column = md5(c)

  /** Order-sensitive polynomial rolling hash over characters
    * (`acc*31 + code (mod 1e9+7)`) — a Rabin-Karp-style content fingerprint
    * built with higher-order functions only (codegen-friendly, no UDF).
    */
  def fingerprintRolling(c: Column): Column =
    aggregate(split(c, ""), lit(0L),
      (acc, ch) => pmod(acc * 31 + coalesce(ascii(ch), lit(0)), lit(1000000007L)))

  /** Full per-document analysis projection. */
  def analyze(df: DataFrame, textCol: String, idCol: String): DataFrame =
    analyze(df, textCol, idCol, None)

  /** [[analyze]] with an optional TRAINED language model: when given,
    * `pred_lang` comes from the fitted one-vs-rest [[LangId]] classifier
    * (the CCNet/RedPajama-style langid stage) instead of the stopword
    * heuristic. Still one zero-shuffle projection — the model adds K
    * fused byte passes per doc, no joins. */
  def analyze(
      df: DataFrame,
      textCol: String,
      idCol: String,
      langModel: Option[LangId.LangIdModel]): DataFrame = {
    val c = col(textCol)
    val predLang = langModel
      .map(m => LangId.predictLanguage(m, c))
      .getOrElse(langId(c))
    df.select(
      col(idCol),
      wsTokenCount(c).cast("long").as("ws_tokens"),
      bpeTokenCount(c).cast("long").as("bpe_tokens"),
      round(alphaRatio(c), 6).as("alpha_ratio"),
      round(stopwordRatio(c), 6).as("stopword_ratio"),
      predLang.as("pred_lang"),
      round(qualityScore(c), 6).as("quality_score"),
      fingerprintMd5(c).as("fingerprint"))
  }

  /** Term frequencies: one row per (doc, whitespace token) with its count.
    * The explode is the only corpus-sized step; everything downstream of a
    * search should filter to the query's terms BEFORE this aggregates (see
    * [[tfidfSearch]]). */
  def termFrequencies(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))

  /** Top-k documents for a bag-of-words query under TF-IDF scoring:
    * `score(doc) = Σ_{t ∈ query} tf(doc, t) · ln(N / df(t))` with raw term
    * counts, natural log, and N = corpus size. Ties break by id; scores are
    * rounded to 6 decimals (ln differs in ulps across libms — this keeps
    * results comparable against any reference implementation).
    *
    * Scale shape: the term filter lands BELOW the explode's aggregation, so
    * only the QUERY's posting lists ever shuffle — the corpus itself is one
    * narrow scan + explode + filter regardless of vocabulary size. Document
    * frequencies come from the same filtered aggregate (one row per
    * (term, doc)), N from a one-row broadcast, and the final top-k is a
    * TakeOrdered merge of per-partition heads, never a global sort. */
  /** Per-document repetition/diversity metrics — the Gopher-style
    * repetition filters a corpus-quality pass runs: token count, distinct
    * token count and ratio, and the share of the most-repeated word bigram
    * (high values flag boilerplate/spam).
    *
    * Scale shape: one posexplode feeds both aggregates; bigrams come from a
    * `lead` window partitioned BY DOCUMENT (thousands of small windows —
    * parallelism is #docs, never 1) and the (doc, bigram) counts partially
    * aggregate map-side. No HOF lambdas — those run interpreted and would
    * knock the projection out of whole-stage codegen.
    */
  def repetitionStats(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.core.WeightedMoments.safeDiv
    val toks = df.select(col(idCol),
      posexplode(tokens(col(textCol))).as(Seq("__p__", "__w__")))
    val uni = toks.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), countDistinct(col("__w__")).as("n_distinct"))
    val biMax = toks
      .withColumn("__w2__",
        lead(col("__w__"), 1).over(Window.partitionBy(col(idCol)).orderBy(col("__p__"))))
      .where(col("__w2__").isNotNull)
      .groupBy(col(idCol), col("__w__"), col("__w2__"))
      .agg(count(lit(1)).as("__c__"))
      .groupBy(col(idCol)).agg(max(col("__c__")).as("__mx__"))
    // left-join from the FULL id set: a NULL-text document explodes to no
    // token rows, but must surface with NULL metrics, not vanish from the
    // quality table (silent coverage gaps are how bad docs slip a filter)
    df.select(col(idCol))
      .join(uni, Seq(idCol), "left")
      .join(biMax, Seq(idCol), "left")
      .select(col(idCol), col("n_words"), col("n_distinct"),
        (col("n_distinct") / col("n_words")).as("distinct_ratio"),
        safeDiv(col("__mx__"), col("n_words") - 1).as("top_bigram_frac"))
  }

  /** Per-document unigram language-model perplexity against the corpus's
    * own token distribution — the CCNet-style LM quality filter (docs that
    * look unlike the corpus score high): `ppl(doc) = exp(−mean ln p(w))`
    * with `p(w) = count(w) / total` over the whole corpus. Scores are
    * rounded to 6 decimals (ln/exp differ in ulps across libms).
    *
    * Scale shape: corpus counts are ONE term-keyed aggregate (vocab-sized
    * shuffle, same as [[vocabulary]]); the per-doc pass joins exploded
    * tokens to the count table ON THE TERM KEY — a shuffle (or AQE
    * broadcast when the vocab is small) that carries (doc, term) pairs,
    * never text — and reduces to one row per doc. Every token is in the
    * vocab by construction (the model IS the corpus), so no smoothing
    * branch is needed.
    */
  def unigramPerplexity(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("__id__"),
      explode(tokens(col(textCol))).as("term")).where(col("term") =!= "")
    val counts = toks.groupBy(col("term")).agg(count(lit(1)).as("__tc__"))
    val total = counts.agg(sum(col("__tc__")).as("__tot__"))
    val scored = toks.join(counts, Seq("term"))
      .crossJoin(broadcast(total))
      .groupBy(col("__id__"))
      .agg(round(exp(-avg(log(col("__tc__") / col("__tot__")))), 6).as("ppl"))
    // full-coverage contract (same as repetitionStats): a NULL/empty-text
    // doc explodes to zero token rows and would silently vanish from the
    // output — a filter joined on ppl would then drop or keep it by join
    // flavor instead of by an explicit NULL marker
    df.select(col(idCol))
      .join(scored.select(col("__id__").as(idCol), col("ppl")), Seq(idCol), "left")
  }

  /** Bigram-LM perplexity of each document under the corpus's own bigram
    * distribution — the next step up from [[unigramPerplexity]] toward the
    * KenLM-style filters CCNet/Gopher pipelines run: a document full of
    * common words in IMPROBABLE order (shuffled text, keyword stuffing)
    * scores near-uniform under unigrams but high here.
    *
    * Model: MLE conditional `p(w_i | w_{i-1}) = c(w_{i-1} w_i) / c(w_{i-1} ·)`
    * where the context count `c(w · )` is the number of bigrams starting
    * with `w` (so probabilities per context sum to exactly 1 and every
    * scored bigram is in the model — the model IS the corpus, no smoothing
    * branch, same contract as [[unigramPerplexity]]).
    * `ppl2 = exp(−avg ln p)` over the doc's bigram occurrences; docs with
    * fewer than 2 tokens (incl. NULL/empty text) surface with NULL ppl2
    * rather than vanishing.
    *
    * Scale shape: unlike [[unigramPerplexity]] (term-string join keys),
    * both count tables and the per-occurrence join are keyed by the 8-byte
    * positional XXH64s of the [[graft.functions.WordNGramHashes]] kernel —
    * the shuffles carry (id, hash) rows only, text never leaves the scan
    * projection. Count tables are vocab²-bounded (map-side combine), the
    * two count joins broadcast when small and AQE-shuffle otherwise. A
    * 64-bit key collision would merge two bigrams' counts
    * (p ≈ distinctBigrams²/2⁶⁵ — negligible; the DuckDB oracle keys by the
    * bigram STRING, so a collision would surface as a hash mismatch, not
    * hide). */
  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): per `by`
    * group (typically language), documents split into head/middle/tail by
    * LM perplexity — head = the LOWEST-perplexity slice. The split is by
    * WEIGHT MASS with weight = document character length (CCNet cuts the
    * corpus into equal thirds of bytes, not equal document counts), so a
    * few long clean documents fill head as fast as many short ones.
    * Composes the self-trained bigram LM ([[bigramPerplexity]]) with the
    * weighted-qcut kernel ([[graft.core.WeightedNormalize.qcut]] — one
    * window shuffle per group, no join-back); `buckets` generalizes the
    * paper's 3.
    *
    * Output: `(idCol, by…, <ppl2|ppl3>, bucket, bucket_label)`; docs the
    * LM cannot score (NULL/too-short text) have NULL ppl → NULL
    * bucket/label. Labels are head/middle/tail at `buckets = 3`, `b<k>`
    * otherwise.
    *
    * `lm`: the paper's actual configuration — a REFERENCE-fitted
    * [[StupidBackoffLm]] (CCNet buckets crawl text under a Wikipedia-
    * trained KenLM, not a self-trained one). When given, documents are
    * scored by [[stupidBackoffPerplexity]] (`ppl3` column); default stays
    * the self-trained bigram LM (`ppl2`). */
  def pplBuckets(
      df: DataFrame,
      textCol: String,
      idCol: String,
      by: Seq[String] = Seq.empty,
      buckets: Int = 3,
      lm: Option[StupidBackoffLm] = None,
      freeze: Boolean = false): DataFrame = {
    if (!freeze) {
      val (ppl, pplCol) = lm match {
        case Some(m) => (stupidBackoffPerplexity(df, textCol, idCol, m), "ppl3")
        case None    => (bigramPerplexity(df, textCol, idCol), "ppl2")
      }
      val base = df.select((col(idCol) +: by.map(col)) :+
        length(coalesce(col(textCol), lit(""))).cast("double").as("__w__"): _*)
      bucketTail(base.join(ppl, Seq(idCol)), idCol, by, buckets, pplCol)
    } else {
      // single-scan bucketing: the frozen pool carries BOTH halves of
      // the query — the by/weight projection AND the hash arrays the
      // scorer consumes — so the corpus text is read exactly once;
      // every downstream branch (count aggs, scoring explode, spine,
      // qcut weights) reads the frozen pool.
      import graft.functions.StringFunctions.wordNGramHashes
      val hashCols = lm match {
        case Some(_) => Seq(
          wordNGramHashes(col(textCol), 1).as("__h1s__"),
          wordNGramHashes(col(textCol), 2).as("__h2s__"),
          wordNGramHashes(col(textCol), 3).as("__h3s__"))
        case None => Seq(
          wordNGramHashes(col(textCol), 1).as("__h1s__"),
          wordNGramHashes(col(textCol), 2).as("__h2s__"))
      }
      val pre = maybeFreezeArrs(df.select(
        (col(idCol) +: by.map(col)) ++
          (length(coalesce(col(textCol), lit(""))).cast("double").as("__w__") +:
            hashCols): _*), freeze = true)
      pplBucketsFromPool(pre, idCol, by, buckets, lm)
    }
  }

  /** [[pplBuckets]] over an [[ngramHashPool]] that also carries the `by`
    * columns and the CCNet byte-mass weight as `__w__` (pass them through
    * the pool's `extra` parameter: `extra = Seq(col("lang"),
    * length(coalesce(col("text"), lit(""))).cast("double").as("__w__"))`).
    * With a pool-fitted LM ([[fitStupidBackoffLmFromPool]] on a pool
    * slice), the ENTIRE CCNet configuration — reference fit, corpus
    * scoring, per-language weight-mass thirds — reads the corpus text
    * exactly once. */
  def pplBucketsFromPool(
      pool: DataFrame,
      idCol: String,
      by: Seq[String] = Seq.empty,
      buckets: Int = 3,
      lm: Option[StupidBackoffLm] = None): DataFrame = {
    val arrs = pool.withColumnRenamed(idCol, "__id__")
    val (ppl, pplCol) = lm match {
      case Some(m) => (backoffPplFromArrs(arrs, m, alpha = 0.4), "ppl3")
      case None    => (bigramPplFromArrs(arrs), "ppl2")
    }
    val base = pool.select((col(idCol) +: by.map(col)) :+ col("__w__"): _*)
    bucketTail(base.join(ppl.withColumnRenamed("__id__", idCol), Seq(idCol)),
      idCol, by, buckets, pplCol)
  }

  /** The weight-mass qcut + labeling tail shared by both [[pplBuckets]]
    * spellings: `joined` carries (idCol, by…, __w__, <ppl col>). */
  private def bucketTail(joined: DataFrame, idCol: String, by: Seq[String],
      buckets: Int, pplCol: String): DataFrame = {
    val wdf = graft.core.WeightedDataFrame.wt(joined, "__w__")
    val cut = graft.core.WeightedNormalize.qcut(wdf, pplCol, by, buckets, "bucket")
    val label =
      if (buckets == 3)
        when(col("bucket") === 0, lit("head"))
          .when(col("bucket") === 1, lit("middle"))
          .otherwise(lit("tail"))
      else concat(lit("b"), col("bucket"))
    cut.withColumn("bucket_label", when(col("bucket").isNotNull, label))
      .select((col(idCol) +: by.map(col)) ++
        Seq(col(pplCol), col("bucket"), col("bucket_label")): _*)
  }

  def bigramPerplexity(df: DataFrame, textCol: String, idCol: String,
      freeze: Boolean = false): DataFrame = {
    import graft.functions.StringFunctions.wordNGramHashes
    val arrs0 = df.select(col(idCol).as("__id__"),
      wordNGramHashes(col(textCol), 1).as("__h1s__"),
      wordNGramHashes(col(textCol), 2).as("__h2s__"))
    val arrs = maybeFreezeArrs(arrs0, freeze)
    bigramPplFromArrs(arrs)
      .select(col("__id__").as(idCol), col("ppl2"))
  }

  /** The scoring half of [[bigramPerplexity]] over an already-projected
    * hash-array pool `(__id__, __h1s__, __h2s__)` — shared by the frozen
    * single-scan path (the pool reads the text once; the three consumers
    * below re-read HASH ARRAYS, never text) and by [[pplBuckets]], whose
    * frozen pool carries the qcut weight alongside the same arrays. The
    * full-coverage spine comes from the pool itself (one row per input
    * doc), so no extra source scan is planned for it. */
  private def bigramPplFromArrs(arrs: DataFrame): DataFrame = {
    // one row per bigram occurrence: the window hash + its context's
    // (position-aligned) unigram hash
    val g = arrs
      .select(col("__id__"), col("__h1s__"),
        posexplode(col("__h2s__")).as(Seq("__pos__", "__h2__")))
      .select(col("__id__"), col("__h2__"),
        element_at(col("__h1s__"), col("__pos__") + 1).as("__h1__"))
    val cb = g.groupBy(col("__h2__")).agg(count(lit(1)).as("__cb__"))
    val cc = g.groupBy(col("__h1__")).agg(count(lit(1)).as("__cc__"))
    val scored = g.join(cb, Seq("__h2__")).join(cc, Seq("__h1__"))
      .groupBy(col("__id__"))
      .agg(round(exp(-avg(log(col("__cb__").cast("double") / col("__cc__")))), 6)
        .as("ppl2"))
    arrs.select(col("__id__"))
      .join(scored, Seq("__id__"), "left")
  }

  /** The single-scan knob of the LM scoring chains: materialize the
    * hash-array projection ONCE (lineage + stats truncated —
    * [[org.apache.spark.sql.graftbridge.DatasetBridge.freezeStatsFree]],
    * the Pipeline pool-freeze contract), so the count aggregates, the
    * scoring explode, and the coverage spine all read 8-byte-per-token
    * hash arrays instead of re-scanning the corpus TEXT per consumer. At
    * 100 TB the text column dominates IO — the unfrozen spellings plan
    * 3–8 column-pruned text scans per query (PLANS.md), each a full
    * corpus read. Off by default: at small scale recompute is cheaper
    * than a materialization barrier, and the unfrozen plan is fully
    * pipelined. The pool is a CACHE (`persist(MEMORY_AND_DISK)`), not a
    * checkpoint: the first consumer materializes it as a side effect of
    * its own job (no separate materialization barrier — measured ~0.5 s
    * of pure overhead per query at sf0.1 for the localCheckpoint
    * spelling), later consumers read blocks, memory pressure spills to
    * executor disk rather than recomputing, and the ContextCleaner
    * unpersists the blocks when the pool is no longer referenced — no
    * caller-managed lifecycle needed. */
  private def maybeFreezeArrs(arrs: DataFrame, freeze: Boolean): DataFrame =
    if (freeze) arrs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else arrs

  /** A fitted stupid-backoff n-gram LM (order 3): hash-keyed count
    * DataFrames per order plus the reference corpus's token total. The
    * tables stay DISTRIBUTED (vocab-sized, never collected) — this is the
    * Brants et al. 2007 design point: the LM that works at corpus scale is
    * count tables + a score-time backoff, not a normalized ARPA file. */
  final case class StupidBackoffLm(
      uni: DataFrame, bi: DataFrame, tri: DataFrame, total: Long)

  /** Fit a trigram stupid-backoff LM on a REFERENCE corpus (Brants et al.
    * 2007, "Large Language Models in Machine Translation" — the
    * MapReduce-native LM): three n-gram count aggregates keyed by the
    * 8-byte positional XXH64s of [[graft.functions.WordNGramHashes]]
    * (map-side combine; the shuffles carry hash+count rows, text never
    * leaves the scan). `total` derives from the unigram table — no extra
    * corpus pass. */
  def fitStupidBackoffLm(ref: DataFrame, textCol: String,
      freeze: Boolean = false): StupidBackoffLm = {
    import graft.functions.StringFunctions.wordNGramHashes
    if (!freeze) {
      def counts(n: Int, key: String, cnt: String): DataFrame = ref
        .select(explode(wordNGramHashes(col(textCol), n)).as(key))
        .groupBy(col(key)).agg(count(lit(1)).as(cnt))
      val uni = counts(1, "__u__", "__c1__")
      val total = uni.agg(sum(col("__c1__"))).head().getLong(0)
      StupidBackoffLm(uni, counts(2, "__b__", "__c2__"),
        counts(3, "__t__", "__c3__"), total)
    } else {
      // single-scan fit: one projection computes all three hash arrays,
      // frozen once (maybeFreezeArrs contract) — the three count
      // aggregates then explode FROZEN 8-byte arrays instead of each
      // re-reading (and re-tokenizing) the reference text. Counts are
      // identical: same kernels, same aggregate.
      fitStupidBackoffLmFromPool(maybeFreezeArrs(ref.select(
        wordNGramHashes(col(textCol), 1).as("__h1s__"),
        wordNGramHashes(col(textCol), 2).as("__h2s__"),
        wordNGramHashes(col(textCol), 3).as("__h3s__")), freeze = true))
    }
  }

  /** The shared single-scan pool of the LM fit+score chains: per document,
    * the order-1..3 positional n-gram hash arrays, frozen once (the
    * [[maybeFreezeArrs]] contract). The CCNet self-referential setup —
    * fit the LM on a SLICE of the corpus, score the WHOLE corpus — then
    * reads the corpus text exactly ONCE:
    *
    * {{{
    * val pool = TextAnalysis.ngramHashPool(docs, "text", "doc_id")
    * val lm = TextAnalysis.fitStupidBackoffLmFromPool(
    *   pool.where(col("doc_id") % 3 === 0))
    * val ppl = TextAnalysis.stupidBackoffPerplexityFromPool(pool, "doc_id", lm)
    * }}}
    *
    * Output: `(idCol, __h1s__, __h2s__, __h3s__)` — the id keeps the
    * caller's name so pool slices filter naturally. At 100 TB the pool is
    * ~8 B/token vs the text's raw bytes, and every downstream consumer
    * (three count aggregates, the scoring explode, the coverage spine)
    * reads the materialized pool, never the corpus. */
  def ngramHashPool(df: DataFrame, textCol: String, idCol: String,
      freeze: Boolean = true, extra: Seq[Column] = Nil): DataFrame = {
    import graft.functions.StringFunctions.wordNGramHashes
    maybeFreezeArrs(df.select((col(idCol) +: extra) ++ Seq(
      wordNGramHashes(col(textCol), 1).as("__h1s__"),
      wordNGramHashes(col(textCol), 2).as("__h2s__"),
      wordNGramHashes(col(textCol), 3).as("__h3s__")): _*), freeze)
  }

  /** [[fitStupidBackoffLm]] over an [[ngramHashPool]] (or any slice of
    * one): three explode-aggregates over the pool's hash arrays — no text
    * access at all. Counts are identical to the text-path fit (same
    * kernels, same aggregates). */
  def fitStupidBackoffLmFromPool(pool: DataFrame): StupidBackoffLm = {
    def counts(arr: String, key: String, cnt: String): DataFrame = pool
      .select(explode(col(arr)).as(key))
      .groupBy(col(key)).agg(count(lit(1)).as(cnt))
    val uni = counts("__h1s__", "__u__", "__c1__")
    val total = uni.agg(sum(col("__c1__"))).head().getLong(0)
    StupidBackoffLm(uni, counts("__h2s__", "__b__", "__c2__"),
      counts("__h3s__", "__t__", "__c3__"), total)
  }

  /** [[stupidBackoffPerplexity]] over an [[ngramHashPool]]: the scoring
    * explode and the full-coverage spine both read the pool, never text.
    * Output `(idCol, ppl3)`, bit-identical to the text-path scorer. */
  def stupidBackoffPerplexityFromPool(pool: DataFrame, idCol: String,
      lm: StupidBackoffLm, alpha: Double = 0.4): DataFrame =
    backoffPplFromArrs(pool.withColumnRenamed(idCol, "__id__"), lm, alpha)
      .select(col("__id__").as(idCol), col("ppl3"))

  /** Order-independent content sig of one LM count table: XOR of
    * `xxhash64(key, count)` over its rows (keys are unique post-aggregate,
    * so no pair can self-cancel; XOR is partitioning- and order-blind and
    * cannot overflow). */
  private def lmTableSig(df: DataFrame, key: String, cnt: String): Long = {
    val r = df.agg(expr(s"bit_xor(xxhash64($key, $cnt))")).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** Persist a [[StupidBackoffLm]]: the three count tables as parquet
    * (`<path>/uni|bi|tri`) plus a one-row `<path>/meta` carrying the token
    * total and a content sig over all three tables — the DSIR/classifier
    * persisted-model convention, for the LM's production life-cycle: fit
    * ONCE on the reference corpus, reload for every later scoring run.
    * Unlike those models the tables are corpus-vocabulary-sized, so they
    * stay distributed parquet, never driver rows. */
  def saveLm(spark: org.apache.spark.sql.SparkSession,
      lm: StupidBackoffLm, path: String): Unit = {
    import spark.implicits._
    lm.uni.write.mode("overwrite").parquet(s"$path/uni")
    lm.bi.write.mode("overwrite").parquet(s"$path/bi")
    lm.tri.write.mode("overwrite").parquet(s"$path/tri")
    // sig over the WRITTEN files, so a partial/corrupt write cannot pass
    val u = spark.read.parquet(s"$path/uni")
    val b = spark.read.parquet(s"$path/bi")
    val t = spark.read.parquet(s"$path/tri")
    val sig = lmSig(u, b, t, lm.total)
    Seq((lm.total, sig)).toDF("total", "model_sig")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  private def lmSig(uni: DataFrame, bi: DataFrame, tri: DataFrame, total: Long): Long = {
    var h = total * 0x9E3779B97F4A7C15L
    Seq(lmTableSig(uni, "__u__", "__c1__"),
        lmTableSig(bi, "__b__", "__c2__"),
        lmTableSig(tri, "__t__", "__c3__")).foreach { s =>
      h ^= s + 0x9E3779B97F4A7C15L + (h << 6) + (h >>> 2)
    }
    h
  }

  /** Materialize a fitted LM as a per-worker scoring kernel
    * ([[graft.functions.BackoffLmKernel]]) — the CCNet deployment shape:
    * the model ships to every executor once (16 B per distinct n-gram)
    * and text scores per row with ZERO shuffle, which is what lets
    * perplexity gate a STREAM statelessly
    * ([[graft.streaming.StreamingSelection.perplexityAdmission]]).
    * `maxEntries` bounds the driver collect explicitly — a model too big
    * to broadcast must fail at build time, not OOM mid-job; past the cap,
    * score with the join-based [[stupidBackoffPerplexity]] instead. */
  def lmKernel(
      lm: StupidBackoffLm,
      alpha: Double = 0.4,
      maxEntries: Long = 10000000L): graft.functions.BackoffLmKernel = {
    def pairs(df: DataFrame, k: String, c: String): Array[(Long, Long)] =
      df.select(col(k), col(c)).collect().map(r => (r.getLong(0), r.getLong(1)))
    val sizes = Seq(lm.uni.count(), lm.bi.count(), lm.tri.count())
    require(sizes.sum <= maxEntries,
      s"lmKernel: model has ${sizes.sum} n-gram entries (> cap $maxEntries); " +
        "raise maxEntries deliberately or use the join-based scorer")
    graft.functions.BackoffLmKernel.fromPairs(
      pairs(lm.uni, "__u__", "__c1__"),
      pairs(lm.bi, "__b__", "__c2__"),
      pairs(lm.tri, "__t__", "__c3__"),
      lm.total, alpha)
  }

  /** Per-row backoff perplexity under a kernel (NULL for NULL/short
    * text) — scores inside the scan projection. */
  def backoffPerplexityScore(
      text: Column, kernel: graft.functions.BackoffLmKernel): Column =
    graft.functions.BackoffLmFunctions.backoffPpl(text, kernel)

  /** Reload a [[saveLm]] model, re-deriving the content sig from the
    * loaded tables and refusing a mismatch (corrupt/partial/edited model
    * directories must fail loudly, not skew every downstream score). */
  def loadLm(spark: org.apache.spark.sql.SparkSession, path: String): StupidBackoffLm = {
    val meta = spark.read.parquet(s"$path/meta").collect()
    require(meta.length == 1, s"LM meta at $path/meta must be one row, got ${meta.length}")
    val total = meta(0).getAs[Long]("total")
    val sig = meta(0).getAs[Long]("model_sig")
    val uni = spark.read.parquet(s"$path/uni")
    val bi = spark.read.parquet(s"$path/bi")
    val tri = spark.read.parquet(s"$path/tri")
    require(lmSig(uni, bi, tri, total) == sig,
      s"stupid-backoff LM at $path fails its content sig — corrupt or edited files")
    StupidBackoffLm(uni, bi, tri, total)
  }

  /** Score a corpus under a REFERENCE-fitted [[StupidBackoffLm]] — the
    * CCNet deployment shape (LM fit on a clean reference, crawl docs
    * scored against it), where backoff genuinely fires: unlike the
    * self-trained [[bigramPerplexity]], a scored trigram may be absent
    * from the model.
    *
    * Per trigram window (w₁ w₂ w₃):
    * `S = c₃(w₁w₂w₃)/c₂(w₁w₂)` when the trigram is in the model (its
    * prefix bigram then necessarily is too), else `α·c₂(w₂w₃)/c₁(w₂)`,
    * else `α²·c₁(w₃)/N`, else `α²/N` (out-of-vocabulary proxy: count 1 —
    * the paper leaves OOV unspecified; this choice is deterministic and
    * engine-reproducible). α = 0.4, the paper's constant; scores are
    * relative frequencies, not probabilities — exactly the stupid-backoff
    * trade. `ppl3 = exp(−avg ln S)` over the doc's trigram windows; docs
    * with fewer than 3 tokens surface with NULL ppl3.
    *
    * Scale shape: one posexplode of the trigram-hash array with the four
    * context hashes read POSITIONALLY from the already-computed lower-order
    * arrays (no re-tokenization), then five 8-byte-keyed count joins
    * (broadcast when the model is small, AQE-shuffle otherwise) and one
    * (id)-keyed aggregate. The corpus crosses exchanges as (id, hash)
    * rows only. */
  def stupidBackoffPerplexity(
      df: DataFrame,
      textCol: String,
      idCol: String,
      lm: StupidBackoffLm,
      alpha: Double = 0.4,
      freeze: Boolean = false): DataFrame = {
    import graft.functions.StringFunctions.wordNGramHashes
    val arrs0 = df.select(col(idCol).as("__id__"),
      wordNGramHashes(col(textCol), 1).as("__h1s__"),
      wordNGramHashes(col(textCol), 2).as("__h2s__"),
      wordNGramHashes(col(textCol), 3).as("__h3s__"))
    val arrs = maybeFreezeArrs(arrs0, freeze)
    backoffPplFromArrs(arrs, lm, alpha)
      .select(col("__id__").as(idCol), col("ppl3"))
  }

  /** The scoring half of [[stupidBackoffPerplexity]] over an
    * already-projected hash-array pool `(__id__, __h1s__, __h2s__,
    * __h3s__)` — the [[bigramPplFromArrs]] twin for the trigram backoff
    * chain; [[pplBuckets]]' frozen pool rides the same projection. */
  private def backoffPplFromArrs(
      arrs: DataFrame, lm: StupidBackoffLm, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    // window at 0-based pos covers tokens (p, p+1, p+2); element_at is
    // 1-based: prefix bigram h2s[p], suffix bigram h2s[p+1], context
    // unigram h1s[p+1], scored unigram h1s[p+2]
    val pos = arrs
      .select(col("__id__"), col("__h1s__"), col("__h2s__"),
        posexplode(col("__h3s__")).as(Seq("__pos__", "__t__")))
      .select(col("__id__"), col("__t__"),
        element_at(col("__h2s__"), col("__pos__") + 1).as("__cx2__"),
        element_at(col("__h2s__"), col("__pos__") + 2).as("__b__"),
        element_at(col("__h1s__"), col("__pos__") + 2).as("__cx1__"),
        element_at(col("__h1s__"), col("__pos__") + 3).as("__u__"))
    val joined = pos
      .join(lm.tri, Seq("__t__"), "left")
      .join(lm.bi.select(col("__b__").as("__cx2__"), col("__c2__").as("__cc2__")),
        Seq("__cx2__"), "left")
      .join(lm.bi, Seq("__b__"), "left")
      .join(lm.uni.select(col("__u__").as("__cx1__"), col("__c1__").as("__cc1__")),
        Seq("__cx1__"), "left")
      .join(lm.uni, Seq("__u__"), "left")
    val la = math.log(alpha)
    val logS = when(col("__c3__").isNotNull,
        log(col("__c3__").cast("double") / col("__cc2__")))
      .when(col("__c2__").isNotNull,
        lit(la) + log(col("__c2__").cast("double") / col("__cc1__")))
      .when(col("__c1__").isNotNull,
        lit(2 * la) + log(col("__c1__").cast("double") / lit(lm.total.toDouble)))
      .otherwise(lit(2 * la) + log(lit(1.0) / lit(lm.total.toDouble)))
    val scored = joined.groupBy(col("__id__"))
      .agg(round(exp(-avg(logS)), 6).as("ppl3"))
    arrs.select(col("__id__"))
      .join(scored, Seq("__id__"), "left")
  }

  /** Corpus vocabulary: the `k` most frequent tokens with their total and
    * document frequencies — the counting step a tokenizer/BPE trainer or a
    * stopword-list builder runs first.
    *
    * Scale shape: explode → ONE grouped aggregate keyed by term (map-side
    * partial aggregation collapses each partition to its distinct-token
    * counts, so the shuffle carries ≈ vocabulary-size rows, not token
    * occurrences; `count(DISTINCT id)` for document frequency rides the
    * same aggregate via Spark's expand), then the top-k is a TakeOrdered
    * merge — no global sort. Ties break lexicographically by term so the
    * cut is deterministic.
    */
  def vocabulary(df: DataFrame, textCol: String, idCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    df.select(col(idCol).as("__id__"), explode(tokens(col(textCol))).as("term"))
      .where(col("term") =!= "")
      .groupBy(col("term"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("__id__")).as("df"))
      .orderBy(col("tf").desc, col("term"))
      .limit(k)
  }

  def tfidfSearch(
      df: DataFrame,
      textCol: String,
      idCol: String,
      query: Seq[String],
      k: Int): DataFrame = {
    require(query.nonEmpty, "tfidfSearch requires at least one query term")
    require(k > 0, s"k must be positive, got $k")
    val n = df.select(count(lit(1)).as("__n__"))
    val tf = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .where(col("term").isin(query.distinct: _*))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(n))
      .groupBy(col(idCol))
      .agg(round(sum(col("tf") * log(col("__n__") / col("df"))), 6).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Sentence-boundary split pattern: one-or-more terminators then
    * whitespace. Deliberately lookaround-free AND `\s`-free: Java's `\s`
    * includes vertical tab (U+000B) but RE2's does not, so the whitespace
    * class is spelled out explicitly — both dialects then consume the
    * byte-identical separator and external tools reproduce the
    * segmentation exactly. */
  val SentenceSplitPattern = "[.!?]+[ \\t\\n\\f\\r]+"

  /** Segment documents into sentences: one output row per non-blank
    * sentence with its 0-based position, character and whitespace-token
    * counts. Pure explode over a per-row split — shuffle-free, codegen'd,
    * and the scan only reads (idCol, textCol). Trailing terminator
    * punctuation is consumed by the splitter; sentences are trimmed. */
  def splitSentences(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol),
        posexplode(split(col(textCol), SentenceSplitPattern)).as(Seq("sent_idx", "__s__")))
      .select(col(idCol), col("sent_idx").cast("long").as("sent_idx"),
        trim(col("__s__")).as("sentence"))
      .where(col("sentence") =!= "")
      .withColumn("n_chars", length(col("sentence")).cast("long"))
      .withColumn("n_tokens", wsTokenCount(col("sentence")).cast("long"))

  /** Composition report: for each `groupCols` slice, the document count and
    * the Shannon entropy (nats) of its distribution over `overCol` — the
    * standard "how diverse is each source's language mix" curation check.
    * Two aggregates over (group, overCol) then (group): the first shuffle
    * carries one row per distinct combination, the second one row per
    * group — both tiny relative to the corpus at any scale. */
  def mixReport(df: DataFrame, groupCols: Seq[String], overCol: String): DataFrame = {
    require(groupCols.nonEmpty, "mixReport needs group columns")
    val g = groupCols.map(col)
    df.groupBy(g :+ col(overCol): _*)
      .agg(count(lit(1)).as("__c__"))
      .groupBy(g: _*)
      .agg(
        sum(col("__c__")).as("n_docs"),
        count(lit(1)).as("n_distinct"),
        // H = log N - (Σ c·log c)/N  (algebraic form avoids a second pass
        // for the per-group total before the per-cell p·log p)
        (log(sum(col("__c__"))) -
          sum(col("__c__") * log(col("__c__"))) / sum(col("__c__"))).as("entropy"))
  }

  /** Token-length histogram: documents bucketed by whitespace-token count
    * into `[k·width, (k+1)·width)` bins — the length-distribution profile
    * used to pick packing capacities and spot truncation spikes. One
    * aggregate; the shuffle carries one row per non-empty bucket. */
  def lengthHistogram(
      df: DataFrame,
      textCol: String,
      width: Int = 50): DataFrame = {
    require(width > 0, s"bucket width must be positive, got $width")
    val ntok = wsTokenCount(col(textCol)).cast("long")
    df.select((floor(ntok / width) * width).as("bucket_start"), ntok.as("__t__"))
      .groupBy(col("bucket_start"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__t__")).as("total_tokens"))
  }
}
