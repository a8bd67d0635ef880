package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The Gopher REPETITION filter battery (Rae et al. 2021, Table A1) —
  * the within-document half the [[TextAnalysis.gopherQuality]] battery
  * does not cover: documents dominated by repeated lines, paragraphs,
  * or word n-grams are boilerplate/spam and get filtered before
  * training.
  *
  * Signals, with the exact (documented) conventions both engines
  * implement:
  *
  *   - `dup_line_frac` / `dup_para_frac`: `(n − n_distinct) / n` over
  *     the document's lines (split on `\n`) / paragraphs (split on
  *     `\n\n`) — the fraction of SEGMENTS that are repeats of an
  *     earlier-seen text.
  *   - `dup_line_char_frac` / `dup_para_char_frac`: characters in
  *     beyond-first occurrences over total segment characters:
  *     `Σ_text (cnt−1)·len / Σ_text cnt·len` (separator newlines
  *     excluded on both sides of the ratio).
  *   - `top{2,3,4}gram_char_frac`: characters claimed by the MOST
  *     FREQUENT word n-gram: `cnt(top)·chars(top) / total_chars`, with
  *     `chars(gram)` = the sum of its tokens' lengths (joining spaces
  *     excluded), `total_chars` = the sum of ALL token lengths, and
  *     count ties broken by the lexicographically smallest gram
  *     (binary collation on both engines).
  *   - `dup{5..10}gram_char_frac`: characters at token positions
  *     covered by ANY occurrence (first included — the standard
  *     NeMo/Dolma accounting) of any n-gram appearing ≥ 2 times,
  *     over `total_chars`; overlapping occurrences count each position
  *     once.
  *
  * Tokens are maximal non-whitespace runs (the engine's `\s+` split
  * convention); a document with zero tokens (or NULL text) yields NULL
  * signals and `passes = false`; a document with tokens but fewer than
  * `n` of them scores 0.0 for that n-gram signal (nothing repeats).
  *
  * Scale shape: one corpus scan; lines/paragraphs explode once each and
  * aggregate map-side on (id, segment-text) keys; all 9 gram sizes
  * derive from ONE token explode + a per-document lead window (codegen'd
  * `concat_ws`, no per-gram array slicing — the HOF formulation ran
  * interpreted and cost 4×), aggregate on (id, n, XXH64(gram)) 8-byte
  * keys with partial combine (the gram string survives only as the
  * post-combine `min()` the top-rank tie-break reads — identical absent
  * collisions, the engine's standard hashed-grouping convention), and
  * the duplicate-coverage step explodes only positions of grams with
  * count ≥ 2 — bounded by the document's repetition volume, not its
  * size. Nothing joins across documents; every shuffle is keyed by
  * doc id (+ small attributes).
  *
  * Thresholds default to the Gopher paper's Table A1 values; `passes` =
  * the conjunction.
  */
object GopherRepetition {

  /** Gopher Table A1 thresholds (maximum allowed fraction per signal). */
  final case class RepetitionThresholds(
      maxDupLineFrac: Double = 0.30,
      maxDupParaFrac: Double = 0.30,
      maxDupLineCharFrac: Double = 0.20,
      maxDupParaCharFrac: Double = 0.20,
      maxTopGramCharFrac: Map[Int, Double] = Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16),
      maxDupGramCharFrac: Map[Int, Double] = Map(
        5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12, 9 -> 0.11, 10 -> 0.10))

  private val TopNs = Seq(2, 3, 4)
  private val DupNs = Seq(5, 6, 7, 8, 9, 10)

  /** Corpus filter: keep documents passing the repetition battery. One
    * left-semi join against the battery's passing-id set — the signals
    * need per-document aggregations, so unlike
    * [[TextAnalysis.gopherPasses]] this cannot be a pure scan predicate;
    * the join side collapses to ids only (8 bytes/doc). */
  def dropRepetitive(
      df: DataFrame,
      textCol: String,
      idCol: String,
      t: RepetitionThresholds = RepetitionThresholds()): DataFrame =
    df.join(
      gopherRepetition(df, textCol, idCol, t)
        .where(col("passes")).select(col(idCol)),
      Seq(idCol), "left_semi")

  /** Segment-duplication aggregates over `df` split by `sep` (regex):
    * (id, n_seg, n_distinct, dup chars, total chars). */
  private def segmentStats(
      base: DataFrame, idCol: String, sep: String, prefix: String): DataFrame = {
    val segs = base.select(col(idCol),
      explode(split(col("__t__"), sep)).as("__s__"))
    segs.groupBy(col(idCol), col("__s__"))
      .agg(count(lit(1)).as("__c__"), first(length(col("__s__"))).as("__l__"))
      .groupBy(col(idCol))
      .agg(
        sum(col("__c__")).as(s"${prefix}_n"),
        count(lit(1)).as(s"${prefix}_d"),
        sum((col("__c__") - 1) * col("__l__")).as(s"${prefix}_dup_chars"),
        sum(col("__c__") * col("__l__")).as(s"${prefix}_tot_chars"))
  }

  /** The full repetition battery, one row per document. */
  def gopherRepetition(
      df: DataFrame,
      textCol: String,
      idCol: String,
      t: RepetitionThresholds = RepetitionThresholds()): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.core.WeightedMoments.safeDiv
    require(TopNs.forall(t.maxTopGramCharFrac.contains) &&
      DupNs.forall(t.maxDupGramCharFrac.contains),
      "thresholds must cover n = 2..4 (top) and 5..10 (dup)")

    val base = df.select(col(idCol), col(textCol).as("__t__"))
      .where(col("__t__").isNotNull)
    val lineStats = segmentStats(base, idCol, "\n", "ln")
    val paraStats = segmentStats(base, idCol, "\n\n", "pg")

    // tokens with positions — ONE explode; per-doc total non-ws chars
    val toksArr = filter(split(col("__t__"), "\\s+"), x => length(x) > 0)
    val toksPos = base
      .select(col(idCol), posexplode_outer(toksArr).as(Seq("__p__", "__w__")))
    val totChars = toksPos.groupBy(col(idCol))
      .agg(coalesce(sum(length(col("__w__"))), lit(0L)).as("__totc__"))

    // all 9 gram sizes from one lead-window pass (codegen'd, no HOF
    // per-gram slicing): gram_n = the token joined with its next n−1
    // successors; chars(gram) = length − (n−1) joining spaces
    val wDoc = Window.partitionBy(col(idCol)).orderBy(col("__p__"))
    val maxN = (TopNs ++ DupNs).max
    val leadCols = (1 until maxN).map(k =>
      lead(col("__w__"), k).over(wDoc).as(s"__w$k$$__"))
    val withLeads = toksPos.where(col("__w__").isNotNull)
      .select(col(idCol) +: col("__p__") +: col("__w__") +: leadCols: _*)
    val gramStructs = (TopNs ++ DupNs).map { n =>
      val parts = col("__w__") +: (1 until n).map(k => col(s"__w$k$$__"))
      when(col(s"__w${n - 1}$$__").isNotNull,
        struct(lit(n).as("n"), col("__p__").as("pos"),
          concat_ws(" ", parts: _*).as("gram")))
    }
    val grams = withLeads
      .select(col(idCol), explode(array(gramStructs: _*)).as("__g__"))
      .where(col("__g__").isNotNull)
      .select(col(idCol), col("__g__.n").as("__n__"), col("__g__.pos").as("__pos__"),
        xxhash64(col("__g__.gram")).as("__gh__"),
        (length(col("__g__.gram")) - (col("__g__.n") - 1)).cast("long").as("__chars__"),
        col("__g__.gram").as("__gram__"))

    // counts per (id, n, gram-hash): 8-byte keys shuffle; the gram STRING
    // survives only as the post-combine min() the top-rank tie-break
    // needs (identical absent collisions — the engine's standard hashed
    // grouping convention, q100/q101)
    val gramCounts = grams
      .groupBy(col(idCol), col("__n__"), col("__gh__"))
      .agg(count(lit(1)).as("__c__"), first(col("__chars__")).as("__gc__"),
        min(col("__gram__")).as("__mg__"))

    // top-gram char fraction for n = 2..4 (ties → smallest gram, binary)
    val w = Window.partitionBy(col(idCol), col("__n__"))
      .orderBy(col("__c__").desc, col("__mg__"))
    val tops = gramCounts
      .where(col("__n__").isin(TopNs: _*))
      .withColumn("__rk__", row_number().over(w))
      .where(col("__rk__") === 1)
      .select(col(idCol), col("__n__"), (col("__c__") * col("__gc__")).as("__topchars__"))

    // duplicate-gram coverage for n = 5..10: positions under any gram with
    // count >= 2 (hash-keyed semi-join), deduplicated, token lengths summed
    val dupPos = grams.join(
        gramCounts.where(col("__c__") >= 2 && col("__n__").isin(DupNs: _*))
          .select(col(idCol), col("__n__"), col("__gh__")),
        Seq(idCol, "__n__", "__gh__"), "left_semi")
      .select(col(idCol), col("__n__"),
        explode(sequence(col("__pos__"), col("__pos__") + col("__n__") - 1)).as("__tp__"))
      .distinct()
    val tokLens = toksPos.where(col("__w__").isNotNull)
      .select(col(idCol), col("__p__").as("__tp__"), length(col("__w__")).as("__tl__"))
    val dupCover = dupPos
      .join(tokLens, Seq(idCol, "__tp__"))
      .groupBy(col(idCol), col("__n__"))
      .agg(sum(col("__tl__")).as("__dupchars__"))

    // assemble: pivot the per-n rows into named columns via conditional aggs
    val topCols = TopNs.map(n =>
      max(when(col("__n__") === n, col("__topchars__"))).as(s"__top${n}__"))
    val topWide = tops.groupBy(col(idCol)).agg(topCols.head, topCols.tail: _*)
    val dupCols = DupNs.map(n =>
      max(when(col("__n__") === n, col("__dupchars__"))).as(s"__dup${n}__"))
    val dupWide = dupCover.groupBy(col(idCol)).agg(dupCols.head, dupCols.tail: _*)

    val joined = df.select(col(idCol))
      .join(lineStats, Seq(idCol), "left")
      .join(paraStats, Seq(idCol), "left")
      .join(totChars, Seq(idCol), "left")
      .join(topWide, Seq(idCol), "left")
      .join(dupWide, Seq(idCol), "left")

    // zero-token docs (present in totChars with __totc__ = 0): NULL signals.
    // gram signals coalesce to 0 only when the doc HAS characters (absent
    // rows in tops/dupCover mean "nothing repeated", not "no document").
    def gramFrac(c: Column): Column =
      when(col("__totc__") > 0, safeDiv(coalesce(c, lit(0L)), col("__totc__")))
    val dupLineFrac = safeDiv(col("ln_n") - col("ln_d"), col("ln_n"))
    val dupParaFrac = safeDiv(col("pg_n") - col("pg_d"), col("pg_n"))
    val dupLineChar = safeDiv(col("ln_dup_chars"), col("ln_tot_chars"))
    val dupParaChar = safeDiv(col("pg_dup_chars"), col("pg_tot_chars"))
    val topFracs = TopNs.map(n => n -> gramFrac(col(s"__top${n}__")))
    val dupFracs = DupNs.map(n => n -> gramFrac(col(s"__dup${n}__")))
    val passes =
      (Seq(
        dupLineFrac <= t.maxDupLineFrac,
        dupParaFrac <= t.maxDupParaFrac,
        dupLineChar <= t.maxDupLineCharFrac,
        dupParaChar <= t.maxDupParaCharFrac) ++
        topFracs.map { case (n, c) => c <= t.maxTopGramCharFrac(n) } ++
        dupFracs.map { case (n, c) => c <= t.maxDupGramCharFrac(n) })
        .reduce(_ && _)
    joined.select(
      col(idCol) +:
        round(dupLineFrac, 6).as("dup_line_frac") +:
        round(dupParaFrac, 6).as("dup_para_frac") +:
        round(dupLineChar, 6).as("dup_line_char_frac") +:
        round(dupParaChar, 6).as("dup_para_char_frac") +:
        (topFracs.map { case (n, c) => round(c, 6).as(s"top${n}gram_char_frac") } ++
          dupFracs.map { case (n, c) => round(c, 6).as(s"dup${n}gram_char_frac") } :+
          coalesce(passes, lit(false)).as("passes")): _*)
  }
}
