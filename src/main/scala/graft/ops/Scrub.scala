package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text scrubbing for training corpora: PII redaction and C4-style
  * line-level cleaning. Everything here is a pure per-row `Column`
  * projection — codegen'd, shuffle-free, scale-free: the filters ride the
  * scan and combine with any downstream dedup/quality pass at zero extra
  * plan cost.
  *
  * Regexes are written to the common Java-regex / RE2 subset (no
  * backreferences, no lookaround) so the same pattern runs in Spark and in
  * external engines (e.g. an audit query in DuckDB).
  */
object Scrub {

  /** Email addresses → `<EMAIL>`. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** North-American-style phone numbers (123-456-7890, 123 456 7890). */
  val PhoneRe = "\\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\\b"

  /** Dotted-quad IPv4 literals. */
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Redact PII spans with typed placeholders. Order matters: emails are
    * matched before phones/IPs so a username with digits can't be
    * half-eaten by the number patterns. */
  def redactPii(c: Column): Column = {
    val e = regexp_replace(c, EmailRe, "<EMAIL>")
    val p = regexp_replace(e, PhoneRe, "<PHONE>")
    regexp_replace(p, Ipv4Re, "<IP>")
  }

  /** Count of PII spans that [[redactPii]] would redact (for audit tables
    * and "what fraction of the corpus carries PII" dashboards). Counts
    * SEQUENTIALLY on the progressively-redacted text, mirroring the
    * replacement order — three independent counts on the original would
    * double-count a phone number or IP embedded in an email address
    * (the email replacement consumes it first). */
  def piiCount(c: Column): Column = {
    val afterEmail = regexp_replace(c, EmailRe, "<EMAIL>")
    val afterPhone = regexp_replace(afterEmail, PhoneRe, "<PHONE>")
    regexp_count(c, lit(EmailRe)) + regexp_count(afterEmail, lit(PhoneRe)) +
      regexp_count(afterPhone, lit(Ipv4Re))
  }

  /** C4-style line-level cleaning (Raffel et al. 2020 §2.2): split on
    * newlines, keep lines with at least `minTokens` whitespace tokens,
    * optionally require terminal punctuation, drop lines containing any
    * `banned` phrase (case-insensitive), and rejoin. Returns NULL only for
    * NULL input; a fully-filtered document becomes the empty string (drop
    * it downstream with a length filter, which pushes to the scan).
    *
    * Implemented with array HOFs over the split lines — HOF lambdas
    * evaluate interpreted in Spark, but over ~tens of lines per document
    * the cost is dwarfed by the regex work; no shuffle either way. */
  def cleanLines(
      c: Column,
      minTokens: Int = 3,
      requireTerminalPunct: Boolean = false,
      banned: Seq[String] = Nil): Column = {
    val lines = split(c, "\n")
    val kept = filter(lines, l => {
      val tokOk = TextAnalysis.wsTokenCount(l) >= minTokens
      val punctOk =
        if (requireTerminalPunct) trim(l).rlike("[.!?\"']$") else lit(true)
      val banOk = banned.foldLeft(lit(true)) { (acc, b) =>
        acc && !contains(lower(l), lit(b.toLowerCase))
      }
      tokOk && punctOk && banOk
    })
    array_join(kept, "\n")
  }

  /** WITHIN-document repeated-line removal — the repetition FIXER
    * complementing [[graft.ops.GopherRepetition]]'s scorer: templated
    * pages repeat nav lines, quoted mail chains repeat bodies; keep each
    * line's FIRST occurrence, drop later exact copies. Lines whose
    * trimmed length is under `minLineChars` are exempt (blank separators,
    * '---' rules, short headings legitimately repeat — the
    * [[graft.ops.Dedup.dedupParagraphs]] exemption convention).
    *
    * Pure per-row array HOF (`filter` with the index lambda over the
    * split lines — a line survives iff exempt or absent from the line
    * prefix before it): NO explode, NO shuffle, scan-speed at 100 TB.
    * O(lines²) string compares per doc is the right trade at tens of
    * lines per document. NULL in → NULL out; a fully-deduped doc keeps
    * its first line (never vanishes). */
  def dropRepeatedLines(c: Column, minLineChars: Int = 10): Column = {
    require(minLineChars >= 0, s"minLineChars must be >= 0, got $minLineChars")
    val lines = split(c, "\n")
    val kept = filter(lines, (l, i) =>
      length(trim(l)) < minLineChars ||
        !array_contains(slice(lines, lit(1), i), l))
    array_join(kept, "\n")
  }

  /** CROSS-document boilerplate-line removal (the C4-style global line
    * filter [[cleanLines]] can't express: it sees one document at a time):
    * a line is boilerplate iff it appears in at least
    * `max(minDocsFloor, ceil(minDocFrac · corpusSize))` DISTINCT documents
    * — cookie banners, "all rights reserved" footers, subscribe prompts —
    * and every occurrence is dropped, preserving the remaining lines'
    * order. Documents whose every line is boilerplate come back as the
    * empty string (never silently vanish).
    *
    * NULL text is NOT a document: it is excluded from the threshold
    * denominator (it contributes no lines, so counting it would only
    * dilute the doc-frequency threshold) and comes back as NULL
    * `text_clean` — distinct from the empty string an all-boilerplate
    * document produces.
    *
    * Scale shape: the distinct-(line, doc) pass and the per-line doc count
    * shuffle 8-byte XXH64 line keys, never the line text; the boilerplate
    * key set (tiny by definition — these are the corpus' most repeated
    * lines) broadcasts back onto the exploded lines; reassembly is one
    * groupBy(doc) with an in-group array_sort. A 64-bit key collision
    * could misclassify a line (p ≈ distinctLines²/2⁶⁵ — negligible for a
    * scrubbing pass; use content keys if bit-exactness against an
    * adversary matters).
    *
    * The boiler set is bounded BY CONSTRUCTION at
    * `Σ_docs distinctLinesPerDoc / thresh ≤ avgDistinctLinesPerDoc /
    * minDocFrac` entries — corpus-size-INDEPENDENT for any fixed
    * `minDocFrac`. But the bound degrades when `thresh` collapses to
    * `minDocsFloor` (a tiny corpus, or a degenerate `minDocFrac`), where
    * an adversarial many-tiny-docs corpus can make it corpus-sized; the
    * broadcast is therefore guarded by an ACTUAL count (the set is
    * `localCheckpoint`ed first, so the count and the join reuse one
    * materialization) and falls back to a shuffled join past
    * `maxBroadcastLines` keys — degraded shape, never a driver OOM. */
  def dropBoilerplateLines(
      df: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String,
      minDocFrac: Double = 0.05,
      minDocsFloor: Int = 2,
      maxBroadcastLines: Long = 4L << 20): org.apache.spark.sql.DataFrame = {
    require(minDocFrac > 0.0 && minDocFrac <= 1.0,
      s"minDocFrac must be in (0,1], got $minDocFrac")
    require(minDocsFloor >= 2, s"minDocsFloor must be >= 2, got $minDocsFloor")
    require(maxBroadcastLines >= 1,
      s"maxBroadcastLines must be positive, got $maxBroadcastLines")
    val n = df.where(col(textCol).isNotNull).count()
    val thresh = math.max(minDocsFloor.toLong, math.ceil(minDocFrac * n).toLong)
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), "\n", -1)).as(Seq("__pos__", "__line__")))
    val boiler = lines
      .select(xxhash64(col("__line__")).as("__lh__"), col(idCol)).distinct()
      .groupBy("__lh__").agg(count(lit(1)).as("__docs__"))
      .where(col("__docs__") >= thresh)
      .select(col("__lh__"), lit(1).as("__bp__"))
      // cache + eager count: one materialization serves the size guard AND
      // the join, with LINEAGE KEPT — localCheckpoint would also dedup the
      // computation but truncates lineage, so losing an executor that held
      // boiler partitions (spot/preemption/dynamic allocation at cluster
      // scale) kills the job instead of recomputing
      .cache()
    val boilerSide =
      if (boiler.count() <= maxBroadcastLines) broadcast(boiler) else boiler
    val kept = lines
      .withColumn("__lh__", xxhash64(col("__line__")))
      .join(boilerSide, Seq("__lh__"), "left")
      .where(col("__bp__").isNull)
    val reassembled = kept.groupBy(col(idCol)).agg(
      array_join(transform(
        array_sort(collect_list(struct(col("__pos__"), col("__line__")))),
        x => x.getField("__line__")), "\n").as("text_clean"))
    df.select(col(idCol), col(textCol).isNotNull.as("__has__"))
      .join(reassembled, Seq(idCol), "left")
      .withColumn("text_clean",
        when(col("__has__"), coalesce(col("text_clean"), lit(""))))
      .drop("__has__")
  }
}
