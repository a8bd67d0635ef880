package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity, TextAnalysis}

class ScrubSpec extends SparkSpecBase {
  import spark.implicits._
  import graft.ops.Scrub

  test("dropRepeatedLines: first occurrence kept, short lines exempt, NULL passes") {
    val docs = Seq(
      (1L, "alpha beta gamma\nmiddle line here\nalpha beta gamma\n---\nmiddle line here\n---"),
      (2L, "same long line here\nsame long line here\nsame long line here"),
      (3L, "one\none\none"), // every line under the floor → all exempt
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        Scrub.dropRepeatedLines(col("text"), minLineChars = 5).as("c"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    // copies drop, order survives, '---' (trimmed 3 < 5) survives twice
    assert(got(1L).get == "alpha beta gamma\nmiddle line here\n---\n---")
    // a fully-repeated doc keeps its first line, never vanishes
    assert(got(2L).get == "same long line here")
    assert(got(3L).get == "one\none\none")
    assert(got(4L).isEmpty)
  }

  test("dropBoilerplateLines: cross-doc repeated lines vanish, order survives") {
    val docs = (1L to 10L).map { i =>
      (i, s"unique opener $i\nAll rights reserved\nbody text $i here\n" +
        (if (i <= 3) "rare footer" else s"tail $i"))
    }.toDF("doc_id", "text")
    // threshold = max(2, ceil(0.5*10)) = 5: 'All rights reserved' (10 docs)
    // drops, 'rare footer' (3 docs) stays
    val got = graft.ops.Scrub.dropBoilerplateLines(docs, "text", "doc_id", minDocFrac = 0.5)
      .orderBy("doc_id").collect()
    assert(got.length == 10)
    assert(got.forall(!_.getString(1).contains("All rights reserved")))
    assert(got(0).getString(1) == "unique opener 1\nbody text 1 here\nrare footer")
    assert(got(9).getString(1) == "unique opener 10\nbody text 10 here\ntail 10")
    // a doc that is ALL boilerplate returns '' rather than vanishing
    val allBoiler = (1L to 6L).map(i => (i, "same line\nsame line two")).toDF("doc_id", "text")
    val cleaned = graft.ops.Scrub.dropBoilerplateLines(allBoiler, "text", "doc_id", minDocFrac = 0.5)
      .orderBy("doc_id").collect()
    assert(cleaned.length == 6 && cleaned.forall(_.getString(1) == ""))
    intercept[IllegalArgumentException] {
      graft.ops.Scrub.dropBoilerplateLines(docs, "text", "doc_id", minDocFrac = 0.0)
    }
  }

  test("dropBoilerplateLines: NULL text is not a document — excluded from " +
    "the threshold denominator and returned as NULL, not ''") {
    // 4 non-null docs + 2 NULLs; frac 0.5 over the NON-NULL count → thresh
    // max(2, ceil(0.5*4)) = 2, so 'shared' (2 docs) drops. Counting NULLs
    // in the denominator would give thresh 3 and keep it.
    val docs = Seq(
      (1L, "shared\nown 1"), (2L, "shared\nown 2"),
      (3L, "own 3"), (4L, "own 4"),
      (5L, null.asInstanceOf[String]), (6L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = graft.ops.Scrub.dropBoilerplateLines(docs, "text", "doc_id", minDocFrac = 0.5)
      .orderBy("doc_id").collect()
    assert(got.length == 6)
    assert(got(0).getString(1) == "own 1" && got(1).getString(1) == "own 2")
    assert(got(4).isNullAt(1) && got(5).isNullAt(1)) // NULL stays NULL, not ''
  }

  test("dropBoilerplateLines: adversarial tiny-doc corpus — boiler set hits " +
    "the broadcast cap and the shuffled fallback gives identical output") {
    // every doc is ONE line shared by exactly minDocsFloor docs: thresh
    // collapses to the floor and EVERY line is boilerplate — the worst
    // case for the broadcast set (corpus-sized, one key per line pair)
    val docs = (0L until 200L).map(i => (i, s"pair line ${i / 2}"))
      .toDF("doc_id", "text")
    val viaBroadcast = graft.ops.Scrub.dropBoilerplateLines(
      docs, "text", "doc_id", minDocFrac = 0.001)
      .orderBy("doc_id").collect()
    val viaShuffle = graft.ops.Scrub.dropBoilerplateLines(
      docs, "text", "doc_id", minDocFrac = 0.001, maxBroadcastLines = 10L)
      .orderBy("doc_id").collect()
    assert(viaBroadcast.toSeq == viaShuffle.toSeq)
    assert(viaBroadcast.forall(_.getString(1) == "")) // all-boiler docs → ''
    // and the BY-CONSTRUCTION bound holds in the expected regime: with a
    // sane minDocFrac the boiler set is ≤ avgDistinctLinesPerDoc/frac,
    // independent of corpus size — measured here, not asserted on faith
    // (2 lines/doc, frac 0.05 → ≤ 40; actual set is just {common})
    val sane = (0L until 500L).map(i => (i, s"u${i}\ncommon"))
      .toDF("doc_id", "text")
    val nDocs = sane.count()
    val pairs = sane.select(col("doc_id"),
      explode(split(col("text"), "\n", -1)).as("ln")).distinct()
    val avgDistinctLines = pairs.count().toDouble / nDocs
    val boilerSize = pairs.groupBy("ln").count()
      .where(col("count") >= math.max(2L, math.ceil(0.05 * nDocs).toLong))
      .count()
    assert(boilerSize <= math.ceil(avgDistinctLines / 0.05).toLong,
      s"boiler set $boilerSize exceeds avgLines/frac bound")
    assert(boilerSize == 1L)
    val cleaned = graft.ops.Scrub.dropBoilerplateLines(
      sane, "text", "doc_id", minDocFrac = 0.05)
      .orderBy("doc_id").collect()
    assert(cleaned.forall(r => r.getString(1) == s"u${r.getLong(0)}"))
  }

  test("redactPii replaces emails, phones, IPs with typed placeholders") {
    val df = Seq(
      (1L, "mail me at jo.do+x@sub.ex.org or call 555-123-4567 now"),
      (2L, "server at 192.168.0.1 and 10.0.255.7; version 1.2 stays"),
      (3L, "no pii here at all")).toDF("id", "text")
    val got = df.select(col("id"), Scrub.redactPii(col("text")).as("c"),
      Scrub.piiCount(col("text")).as("n")).orderBy("id").collect()
    assert(got(0).getString(1) == "mail me at <EMAIL> or call <PHONE> now")
    assert(got(0).getInt(2) == 2)
    assert(got(1).getString(1) == "server at <IP> and <IP>; version 1.2 stays")
    assert(got(1).getInt(2) == 2)
    assert(got(2).getString(1) == "no pii here at all" && got(2).getInt(2) == 0)
    // a phone embedded in an email counts ONCE (sequential counting
    // mirrors replacement order — the email consumes it first)
    val nested = Seq(Tuple1("reach 555-123-4567@mail.com today")).toDF("text")
      .select(Scrub.redactPii(col("text")).as("c"), Scrub.piiCount(col("text")).as("n"))
      .head()
    assert(nested.getString(0) == "reach <EMAIL> today" && nested.getInt(1) == 1)
  }

  test("cleanLines: min-token, terminal-punct, and banned-phrase rules") {
    val text = "too short\nthis line has enough tokens.\nbuy CHEAP pills today\nterminal punct missing here"
    val df = Seq(Tuple1(text)).toDF("text")
    // min tokens only: drops line 1
    val base = df.select(Scrub.cleanLines(col("text"), minTokens = 3).as("c"))
      .head().getString(0)
    assert(base == "this line has enough tokens.\nbuy CHEAP pills today\nterminal punct missing here")
    // + banned phrase (case-insensitive)
    val noAds = df.select(Scrub.cleanLines(col("text"), minTokens = 3,
      banned = Seq("cheap pills")).as("c")).head().getString(0)
    assert(noAds == "this line has enough tokens.\nterminal punct missing here")
    // + terminal punctuation
    val punct = df.select(Scrub.cleanLines(col("text"), minTokens = 3,
      requireTerminalPunct = true, banned = Seq("cheap pills")).as("c"))
      .head().getString(0)
    assert(punct == "this line has enough tokens.")
    // fully-filtered doc → empty string, NULL stays NULL
    val empty = Seq(Tuple1("a\nb"), Tuple1(null.asInstanceOf[String])).toDF("text")
      .select(Scrub.cleanLines(col("text")).as("c")).collect()
    assert(empty(0).getString(0) == "" && empty(1).isNullAt(0))
  }
}

class TextAnalysisSpec extends SparkSpecBase {
  import spark.implicits._

  test("token counts") {
    val df = Seq((1L, "the quick brown fox"), (2L, "a b-c 12 d!")).toDF("id", "text")
    val got = TextAnalysis.analyze(df, "text", "id").orderBy("id").collect()
    assert(got(0).getAs[Long]("ws_tokens") == 4L)
    assert(got(1).getAs[Long]("ws_tokens") == 4L)
    // "a", "b", "-", "c", "12", "d", "!" → 7 BPE-ish tokens
    assert(got(1).getAs[Long]("bpe_tokens") == 7L)
  }

  test("gopher rules: each signal computed per doc, pass flag is the conjunction") {
    val good = ("the data points to a result and we have more words here " * 5).trim
    val df = Seq(
      (1L, good), // long, alphabetic, stopword-bearing → passes
      (2L, "short text"), // under minWords
      (3L, "- a\n- b\n- c\n- d"), // all-bullet lines
      (4L, "to be continued...\nand then…\nmore..."), // ellipsis-ended (incl. U+2026)
      (5L, "#### #### " + good), // hash-heavy prefix still diluted by length
      (6L, "")) // blank → ZERO words, null ratios, fail — never a crash
      .toDF("id", "text")
    val t = TextAnalysis.GopherThresholds(minWords = 20, minStopwords = 1)
    val got = TextAnalysis.gopherQuality(df, "text", "id", t).orderBy("id").collect()
    assert(got(0).getAs[Boolean]("passes"))
    assert(!got(1).getAs[Boolean]("passes"))
    assert(got(2).getAs[Double]("bullet_ratio") == 1.0 && !got(2).getAs[Boolean]("passes"))
    assert(got(3).getAs[Double]("ellipsis_ratio") == 1.0 && !got(3).getAs[Boolean]("passes"))
    assert(got(4).getAs[Double]("hash_ratio") > 0.0)
    assert(!got(5).getAs[Boolean]("passes"))
    // stopword count is DISTINCT stopwords present, not occurrences
    assert(got(0).getAs[Long]("n_stopwords") >= 4) // the, to, and, have
    // blank doc: zero words (raw split would say 1), everything null/fail
    assert(got(5).getAs[Long]("n_words") == 0L)
    assert(got(5).isNullAt(got(5).fieldIndex("mean_word_len")))
  }

  test("gopher rules: CR is NOT a line break; ratios stay in [0,1]") {
    // a CR-separated pseudo-list is ONE line under the \n-only contract —
    // the (?m) anchors would have counted 3 bullets over 1 line (ratio 3.0)
    val df = Seq((1L, "- a\r- b\r- c"), (2L, "...\r\n")).toDF("id", "text")
    val got = TextAnalysis.gopherQuality(df, "text", "id").orderBy("id").collect()
    assert(got(0).getAs[Double]("bullet_ratio") == 1.0) // first line only
    // "...\r" line: the \r sits between ... and the \n → NOT ellipsis-ended
    assert(got(1).getAs[Double]("ellipsis_ratio") == 0.0)
  }

  test("language id picks the max-marker language; no markers → unknown") {
    val df = Seq(
      (1L, "the cat is of the mat and the dog"),
      (2L, "el que la de los y el perro"),
      (3L, "der die das und ist von der"),
      (4L, "zzz qqq www")).toDF("id", "text")
    val got = TextAnalysis.analyze(df, "text", "id").orderBy("id")
      .select("pred_lang").collect().map(_.getString(0)).toSeq
    assert(got == Seq("en", "es", "de", "unknown"))
  }

  test("quality score is bounded and monotone-ish in signal") {
    val df = Seq(
      (1L, "the of and in to is a " * 20), // long, stopword-rich, alphabetic
      (2L, "#### $$$$ 1234 %%%%")).toDF("id", "text")
    val got = TextAnalysis.analyze(df, "text", "id").orderBy("id")
      .select("quality_score").collect().map(_.getDouble(0))
    assert(got.forall(s => s >= 0.0 && s <= 1.0))
    assert(got(0) > got(1))
  }

  test("tfidfSearch ranks by summed tf·ln(N/df), ties to the smaller id") {
    val docs = Seq((1L, "a b a"), (2L, "a c"), (3L, "c c b")).toDF("doc_id", "text")
    // N=3, df(a)=2, df(b)=2: doc1 = 3·ln(1.5), doc2 = doc3 = ln(1.5)
    val got = TextAnalysis.tfidfSearch(docs, "text", "doc_id", Seq("a", "b"), k = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val l = math.rint(math.log(1.5) * 1e6) / 1e6
    assert(got == Seq((1L, math.rint(3 * math.log(1.5) * 1e6) / 1e6), (2L, l)))
    // terms absent from the corpus contribute nothing; unknown-only → empty
    assert(TextAnalysis.tfidfSearch(docs, "text", "doc_id", Seq("zz"), 5).count() == 0)
  }

  test("rolling fingerprint is deterministic and order-sensitive") {
    val df = Seq((1L, "abc"), (2L, "cba"), (3L, "abc")).toDF("id", "text")
    val got = df.select(col("id"), TextAnalysis.fingerprintRolling(col("text")).as("fp"))
      .orderBy("id").collect().map(_.getLong(1))
    assert(got(0) == got(2))
    assert(got(0) != got(1))
    // hand-rolled: ((0*31+97)*31+98)*31+99 = 96354 for "abc"
    assert(got(0) == (('a' * 31 + 'b') * 31 + 'c').toLong)
  }
}

class DedupSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps"),
    (1L, "the quick brown fox jumps"), // exact dup of 0
    (2L, "jumps fox brown quick the"), // token-set dup of 0
    (3L, "completely different words here"),
    (4L, "another unrelated document text")).toDF("doc_id", "text")

  test("dedupParagraphs: keep-first across docs, short-paragraph exemption, " +
    "NULL and all-dup contracts, custom separator") {
    val corpus = Seq(
      (1L, "alpha opening paragraph one\n\nSYNDICATED BLOCK REPEATED EVERYWHERE\n\nShare"),
      (2L, "beta opening paragraph two\n\nSYNDICATED BLOCK REPEATED EVERYWHERE\n\nShare"),
      (3L, "SYNDICATED BLOCK REPEATED EVERYWHERE"), // all-dup once deduped
      (4L, null.asInstanceOf[String]),
      (5L, "gamma closer\n\nShare")).toDF("doc_id", "text")
    val got = Dedup.dedupParagraphs(corpus, "text", "doc_id", minChars = 10)
      .orderBy("doc_id").collect()
    // doc 1 carries the first (doc_id, pos) occurrence of the syndicated
    // block; docs 2 and 3 lose it. 'Share' (5 chars < 10) is exempt.
    assert(got(0).getString(1) ==
      "alpha opening paragraph one\n\nSYNDICATED BLOCK REPEATED EVERYWHERE\n\nShare")
    assert(got(1).getString(1) == "beta opening paragraph two\n\nShare")
    assert(got(2).getString(1) == "") // every paragraph removed → '', not NULL
    assert(got(3).isNullAt(1))        // NULL text stays NULL
    assert(got(4).getString(1) == "gamma closer\n\nShare")
    // within-doc repetition also dedups (second occurrence dropped)
    val self = Seq((1L, "again and again and again|again and again and again|tail paragraph"))
      .toDF("doc_id", "text")
    val got2 = Dedup.dedupParagraphs(self, "text", "doc_id", sep = "|").collect()
    assert(got2(0).getString(1) == "again and again and again|tail paragraph")
    // minChars = 0 exempts nothing; empty paragraphs dedup like any other
    val empt = Seq((1L, "a||b"), (2L, "c||d")).toDF("doc_id", "text")
    val got3 = Dedup.dedupParagraphs(empt, "text", "doc_id", sep = "|")
      .orderBy("doc_id").collect()
    assert(got3(0).getString(1) == "a||b" && got3(1).getString(1) == "c|d")
    intercept[IllegalArgumentException] {
      Dedup.dedupParagraphs(corpus, "text", "doc_id", sep = "")
    }
  }

  test("sub-document scrub stack composes: boilerplate lines → paragraphs → " +
    "spans, with NULL and empty-string contracts chaining") {
    // every doc: a short unique header line, a 100%-boilerplate line, and
    // a body line; doc 3 duplicates doc 1's body verbatim (paragraph-stage
    // target), docs 2/4 share only a 7-token suffix (span-stage target).
    // Line-level paragraphs (sep = "\n"): the line stage drops any
    // corpus-wide line INCLUDING the empty line a "\n\n" separator would
    // need, so chaining onto its output means newline-separated units.
    val sharedPara = "this whole paragraph body is syndicated everywhere"
    val corpus = Seq(
      (1L, s"unique one\nEVERY DOC HAS THIS LINE\n$sharedPara"),
      (2L, s"unique two\nEVERY DOC HAS THIS LINE\nsecond body with shared span inside here okay"),
      (3L, s"unique three\nEVERY DOC HAS THIS LINE\n$sharedPara"),
      (4L, s"unique four\nEVERY DOC HAS THIS LINE\nfourth body with shared span inside here okay"),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val afterLines = graft.ops.Scrub.dropBoilerplateLines(
      corpus, "text", "doc_id", minDocFrac = 0.9)
      .withColumnRenamed("text_clean", "text")
    val afterParas = Dedup.dedupParagraphs(afterLines, "text", "doc_id",
      sep = "\n", minChars = 15)
      .withColumnRenamed("text_clean", "text")
    val out = Dedup.dedupSpans(afterParas, "text", "doc_id", windowTokens = 4)
      .orderBy("doc_id").collect()
    // boilerplate line gone everywhere; doc 1 keeps the shared body (first
    // carrier), doc 3 loses it at the paragraph stage (headers are
    // sub-minChars exempt); docs 2/4 share the 7-token suffix "body with
    // shared span inside here okay" — doc 2 keeps it, doc 4 loses the
    // window-covered tokens at the span stage; NULL chains to NULL
    assert(out(0).getString(1) == s"unique one $sharedPara")
    assert(out(1).getString(1) == "unique two second body with shared span inside here okay")
    assert(out(2).getString(1) == "unique three")
    assert(out(3).getString(1) == "unique four fourth")
    assert(out(4).isNullAt(1))
  }

  test("dedupSpans: duplicated token windows removed except first occurrence; " +
    "long spans covered; short docs pass; NULL and full-dup contracts") {
    val slogan = "one two three four five six seven eight nine ten" // 10 tokens
    val corpus = Seq(
      (1L, s"alpha opens pre $slogan alpha outro"),
      (2L, s"beta starts now $slogan beta close"), // loses all 10 slogan tokens
      (3L, s"gamma text with no duplicates at all"),
      (4L, s"gamma text with no duplicates at all"), // exact dup doc → ''
      (5L, "tiny doc"),                          // < windowTokens: no windows
      (6L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = Dedup.dedupSpans(corpus, "text", "doc_id", windowTokens = 4)
      .orderBy("doc_id").collect()
    assert(got(0).getString(1) == s"alpha opens pre $slogan alpha outro")
    // doc 2: windows fully inside the slogan repeat doc 1's; windows
    // crossing into beta-specific tokens are unique (the lead-in/outro
    // tokens differ), so exactly the 10 slogan tokens go (span longer
    // than the window, covered exactly)
    assert(got(1).getString(1) == "beta starts now beta close")
    assert(got(2).getString(1) == "gamma text with no duplicates at all")
    assert(got(3).getString(1) == "")  // fully duplicated → '', not NULL
    assert(got(4).getString(1) == "tiny doc")
    assert(got(5).isNullAt(1))
    // within-doc repetition: second occurrence of a repeated window goes
    val self = Seq((1L, "a b c d X a b c d")).toDF("doc_id", "text")
    val got2 = Dedup.dedupSpans(self, "text", "doc_id", windowTokens = 4).collect()
    assert(got2(0).getString(1) == "a b c d X")
    // whitespace runs normalize (token-level rebuild contract)
    val ws = Seq((1L, "only   two\ttokens")).toDF("doc_id", "text")
    assert(Dedup.dedupSpans(ws, "text", "doc_id").collect()(0).getString(1)
      == "only two tokens")
    intercept[IllegalArgumentException] {
      Dedup.dedupSpans(corpus, "text", "doc_id", windowTokens = 1)
    }
  }

  test("exact dedup groups byte-identical texts") {
    val got = Dedup.exact(docs, "text", "doc_id").orderBy("keep_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, 2L), (2L, 1L), (3L, 1L), (4L, 1L)))
  }

  test("token-set dedup catches reordered duplicates") {
    val got = Dedup.tokenSet(docs, "text", "doc_id").orderBy("keep_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, 3L), (3L, 1L), (4L, 1L)))
  }

  test("dropExact / dropNearDuplicates keep-first policies") {
    val kept = Dedup.dropExact(docs, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 2L, 3L, 4L)) // 1 is a byte-dup of 0
    val keptNear = Dedup.dropNearDuplicates(docs, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptNear == Set(0L, 3L, 4L)) // 1 and 2 share 0's token set
  }

  test("shingles and jaccard") {
    val df = Seq((0L, "a b c d"), (1L, "b c d e")).toDF("id", "t")
    val sh3 = df.select(Dedup.shingles(col("t"), 3).as("s")).orderBy("s")
      .collect().map(_.getSeq[String](0).toSet)
    assert(sh3.contains(Set("a b c", "b c d")))
    val j = df.select(Dedup.jaccard(
      Dedup.shingles(lit("a b c d"), 1), Dedup.shingles(lit("b c d e"), 1)).as("j"))
      .head().getDouble(0)
    assert(math.abs(j - 3.0 / 5.0) < 1e-12)
  }

  test("minhash LSH finds identical-shingle-set pairs with full recall") {
    val got = Dedup.minhashDedup(docs, "text", "doc_id",
      shingleSize = 1, numHashes = 32, bandRows = 8, threshold = 1.0)
      .orderBy("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // 0,1,2 share the same token set → all three pairs
    assert(got == Seq((0L, 1L), (0L, 2L), (1L, 2L)))
  }

  test("minhash near-dup threshold excludes dissimilar docs") {
    val near = Seq(
      (0L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w11"), // 9/11 ≈ 0.82
      (2L, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10")).toDF("doc_id", "text")
    val got = Dedup.minhashDedup(near, "text", "doc_id",
      shingleSize = 1, numHashes = 32, bandRows = 4, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((0L, 1L)))
  }

  test("degenerate corpora: pair expansion streams, never a g²-element array row") {
    // the adversarial shape the skew guards exist for (ScaleBench
    // minhash_skew_* rows measure it at x100): every doc in ONE band
    // bucket. Both physical paths must (a) emit the complete quadratic
    // pair set through streaming join iterators — the plan carries no
    // grouped array materialization (collect_list) and no cartesian
    // product — and (b) stay exact.
    val n = 120
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    // all byte-identical → the t≥1 streamed self-join path
    val ident = (0 until n).map(i => (i.toLong, base)).toDF("doc_id", "text")
    val identPairs = Dedup.minhashDedup(ident, "text", "doc_id",
      shingleSize = 3, threshold = 1.0)
    val identPlan = identPairs.queryExecution.executedPlan.toString
    assert(!identPlan.contains("collect_list") && !identPlan.contains("CartesianProduct"),
      "t>=1 path must stream pairs through a join, not build per-group arrays")
    assert(identPairs.count() == n.toLong * (n - 1) / 2)
    // all near-identical (unique 1-token tail, pairwise jaccard 38/40) →
    // the banding path: one hot bucket, est-prefilter keeps true pairs,
    // pair-`distinct` rebalances off the bucket key
    val nearIdent = (0 until n).map(i => (i.toLong, s"$base v$i")).toDF("doc_id", "text")
    val nearPairs = Dedup.minhashDedup(nearIdent, "text", "doc_id",
      shingleSize = 3, threshold = 0.8)
    val nearPlan = nearPairs.queryExecution.executedPlan.toString
    assert(!nearPlan.contains("collect_list") && !nearPlan.contains("CartesianProduct"),
      "banding path must stream pairs through the bucket join")
    assert(nearPairs.count() == n.toLong * (n - 1) / 2)
    assert(nearPairs.agg(min(col("jaccard"))).head().getDouble(0) >= 0.8)
  }

  test("simhash pairs: identical token sets at hamming 0") {
    val got = Dedup.simhashPairs(docs, "text", "doc_id", shingleSize = 1, maxHamming = 0)
      .orderBy("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.contains((0L, 1L)) && got.contains((0L, 2L)))
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash generalized chunking keeps full recall at larger hamming radii") {
    // maxHamming=7 → 8 chunks of 8 bits; identical-set pairs must still hit
    val got = Dedup.simhashPairs(docs, "text", "doc_id", shingleSize = 1, maxHamming = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((0L, 1L)) && got.contains((0L, 2L)) && got.contains((1L, 2L)))
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 64)
    }
  }

  test("simhash skew: a block of identical docs yields all pairs via the signature-grouped path") {
    // 30 byte-identical docs collapse to ONE simhash signature: the banding
    // join sees a single signature row for the hot bucket (g² = 1 pair
    // work, not n² = 435), and the doc-pair expansion emits all 435 pairs
    // at hamming 0 with recall exactly 1.
    val rows = (0L until 30L).map(i => (i, "same text repeated tokens every time")) ++
      Seq((100L, "totally different other words"), (101L, "yet more unrelated stuff"))
    val df = rows.toDF("doc_id", "text")
    val got = Dedup.simhashPairs(df, "text", "doc_id", shingleSize = 1, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val identicalPairs = (for { a <- 0L until 30L; b <- (a + 1) until 30L } yield (a, b)).toSet
    assert(identicalPairs.subsetOf(got))
    assert(got.filter(p => p._1 < 30L && p._2 < 30L) == identicalPairs) // no dup emissions
    assert(got.forall { case (a, b) => a < b }) // normalized orientation
  }

  test("normalized dedup groups case/punctuation/spacing variants") {
    val d = Seq(
      (0L, "Hello, World!"),
      (1L, "hello world"),
      (2L, "HELLO  world."),
      (3L, "goodbye world")).toDF("doc_id", "text")
    val got = Dedup.normalizedGroups(d, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 3L), (3L, 1L)))
  }

  test("exactGroups shuffles a fixed-width hash key, not the text") {
    val plan = Dedup.exact(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(__h1__"),
      "primary dedup exchange must partition on the 128-bit key hash")
  }

  test("simhashPairs executes with one source scan (exchange reuse holds)") {
    // parquet source like production: a LocalRelation gets constant-folded
    // per branch (ConvertToLocalRelation), which legitimately defeats reuse
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Dedup.simhashPairs(d, "text", "doc_id")
    out.queryExecution.toRdd.count() // force AQE to finalize
    // toString renders the final plan followed by the pre-AQE initial plan;
    // only the final section reflects what actually executed
    val finalPlan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(finalPlan.contains("ReusedExchange"),
      "signature subtree must be shared, not recomputed per consumer")
    val scans = "Scan parquet".r.findAllIn(finalPlan).length
    assert(scans <= 1, s"expected a single parquet scan, saw $scans — a consumer forked the plan")
  }

  test("hash-keyed exactGroups is equivalent to a naive full-key groupBy (random dup corpora)") {
    val rnd = new scala.util.Random(19)
    // heavy duplication: ~60 distinct texts over 400 docs, group sizes 1..n
    val rows = (0 until 400).map(i => (i.toLong, s"text body number ${rnd.nextInt(60)}"))
    val df = rows.toDF("doc_id", "text")
    val naive = df.groupBy("text")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hashed = Dedup.exact(df, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hashed == naive)
    val naiveKept = rows.groupBy(_._2).values.map(_.map(_._1).min).toSet
    val kept = Dedup.dropExact(df, "text", "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == naiveKept)
  }

  test("minhash banding below threshold 1: derived (b,r) gives ≥0.9 measured recall") {
    // (b, r) must follow the threshold: recall ≈ 1-(1-t^r)^b, so the
    // largest safe r at t=0.8 with k=32 is 4 (the old fixed r=8 gave ~52%)
    assert(Dedup.bandRowsFor(32, 0.8) == 4)
    assert(Dedup.bandRowsFor(32, 0.95) == 8)
    assert(Dedup.bandRowsFor(32, 0.5) == 2)
    // synthetic corpus of 40 known near-dup pairs with true Jaccard
    // 38/42 ≈ 0.905 (disjoint vocabularies across pairs → zero cross noise)
    val docs = (0 until 40).flatMap { i =>
      val toks = (0 until 40).map(j => s"w${i}_$j")
      val partner = toks.take(38) ++ Seq(s"x${i}_a", s"x${i}_b")
      Seq((2L * i, toks.mkString(" ")), (2L * i + 1, partner.mkString(" ")))
    }.toDF("doc_id", "text")
    val got = Dedup.minhashDedup(docs, "text", "doc_id",
      shingleSize = 1, numHashes = 32, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0 until 40).map(i => (2L * i, 2L * i + 1)).toSet
    val recall = (expected & got).size.toDouble / expected.size
    assert(recall >= 0.9, s"banding recall $recall below 0.9")
    assert((got -- expected).isEmpty, "false positives survived exact-Jaccard verify")
  }

  test("native word_ngrams matches the HOF composition incl. whitespace edges") {
    val rnd = new scala.util.Random(31)
    val words = Seq("alpha", "beta", "g", "dd", "", " ", "\t")
    val texts = (1 to 60).map { _ =>
      (1 to rnd.nextInt(8)).map(_ => words(rnd.nextInt(words.size))).mkString(" ")
    } ++ Seq("", " ", "  ", "a", "a b", " a  b ", "\ta b\t", "x y z x y")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (n <- Seq(1, 2, 3)) {
      val toks = split(trim(col("text")), "\\s+")
      val hof =
        if (n == 1) array_distinct(toks)
        else when(size(toks) < n, array().cast("array<string>"))
          .otherwise(array_distinct(transform(sequence(lit(0), size(toks) - n),
            i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
      val got = df.select(col("id"),
        graft.functions.StringFunctions.wordNGrams(col("text"), n).as("native"),
        hof.as("ref")).orderBy("id").collect()
      got.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"n=$n id=${r.getLong(0)} text='${texts(r.getLong(0).toInt)}'")
      }
    }
  }

  test("native word_ngram_hashes matches the HOF xxhash64 composition, " +
    "positional and non-distinct") {
    val rnd = new scala.util.Random(47)
    val words = Seq("alpha", "beta", "g", "dd", "x")
    val texts = (1 to 60).map { _ =>
      (1 to rnd.nextInt(10)).map(_ => words(rnd.nextInt(words.size)))
        .mkString(if (rnd.nextBoolean()) " " else "  ")
    } ++ Seq("", " ", "\t\n", "a", "a b", " a  b\tc ", "x y x y x y",
      // U+000B is NOT engine whitespace (Java \s would say otherwise) —
      // it must stay inside tokens on both the native and regexp paths
      "ab c d e", "p q r s")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (n <- Seq(2, 4, 8)) {
      val toks = regexp_extract_all(col("text"), lit("[^ \\t\\n\\f\\r]+"), lit(0))
      val hof = when(size(toks) < n, array().cast("array<long>"))
        .otherwise(transform(sequence(lit(0), size(toks) - n),
          i => xxhash64(array_join(slice(toks, i + 1, lit(n)), " "))))
      val got = df.select(col("id"),
        graft.functions.StringFunctions.wordNGramHashes(col("text"), n).as("native"),
        hof.as("ref")).orderBy("id").collect()
      got.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"n=$n id=${r.getLong(0)} text='${texts(r.getLong(0).toInt)}'")
      }
    }
    graft.functions.GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT word_ngram_hashes('a b c', 2) = array(xxhash64('a b'), xxhash64('b c')) AS ok")
      .head().getBoolean(0)
    assert(viaSql)
  }

  test("native char_ngrams matches the HOF composition on every edge") {
    val n = 3
    val df = Seq("", "ab", "abc", "abcd", "banana", "aaaa", "héllo wörld")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val hof = array_distinct(transform(
      sequence(lit(1), greatest(length(col("text")) - (n - 1), lit(1))),
      i => col("text").substr(i, lit(n))))
    val got = df.select(col("id"),
      graft.functions.StringFunctions.charNGrams(col("text"), n).as("native"),
      hof.as("ref")).orderBy("id").collect()
    got.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"id=${r.getLong(0)}")
    }
    graft.functions.GraftFunctions.register(spark)
    val sql = spark.sql("SELECT char_ngrams('banana', 3) AS g").head().getSeq[String](0)
    assert(sql == Seq("ban", "ana", "nan"))
    val wsql = spark.sql("SELECT word_ngrams('a b c b c', 2) AS g").head().getSeq[String](0)
    assert(wsql == Seq("a b", "b c", "c b"))
  }

  test("cleanCorpus: dedup keeps first copy, filter drops low-quality/short docs") {
    val good = "the quick brown fox jumps over the lazy dog and then the " +
      "other animals watch the fox with great interest in the morning light"
    val df = Seq(
      (0L, good),
      (1L, good), // exact dup of 0: dropped by keep-first
      (2L, "#### 1234 %%%%"), // low quality + short: filtered
      (3L, "tiny doc")) // too few tokens
      .toDF("doc_id", "text")
    val got = graft.ops.Pipeline.cleanCorpus(df, "text", "doc_id",
      minQuality = 0.5, minTokens = 20L).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(0L))
    assert(got.head.getAs[Long]("ws_tokens") >= 20L)
  }

  test("char n-gram jaccard over explicit pairs") {
    val pairs = Seq((0L, 1L), (0L, 3L)).toDF("doc_a", "doc_b")
    val got = Dedup.ngramJaccardForPairs(pairs, docs, "text", "doc_id", n = 3)
      .orderBy("doc_a", "doc_b").collect().map(r => cell(r, 2).get)
    assert(got(0) == 1.0) // identical texts
    assert(got(1) < 0.5) // different texts
  }

  test("adversarial hot band: pair repartition bounds partitions; AQE skew-split engages") {
    // one text repeated 3000x -> each of its 4 band keys holds the whole
    // hot set, the worst case for the band self-join; 2000 distinct
    // fillers around it. Pins the two skew defenses of the banding path:
    // (1) the pair-keyed `distinct` spreads the quadratic candidate set
    // evenly (no partition anywhere near the hot-band size), and (2) the
    // band join itself is AQE-skew-splittable (sort-merge, no salting
    // trick that would hide it from the runtime re-planner).
    val hotN = 3000
    val hot = (0 until hotN).map(i =>
      (i.toLong, "the same hot duplicated document text appears again and again"))
    val fillers = (0 until 2000).map(i =>
      (10000L + i, s"filler doc $i with words w${i}a w${i}b w${i}c w${i * 7} unique"))
    val corpus = (hot ++ fillers).toDF("doc_id", "text")
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.shuffle.partitions",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force sort-merge
      // enough reduce partitions that the filler keys spread thin and the
      // hot band keys stand out from the median (the suite default of 4
      // makes every partition look alike)
      conf.set("spark.sql.shuffle.partitions", "64")
      // test-scale thresholds: the hot band is ~hundreds of KB, not the
      // production 256 MB default — shrink so the same mechanism trips
      // compressed-shuffle sizes: the hot band's ids are ~24 KB post-lz4
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4096")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4096")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      val t0 = System.nanoTime()
      // the banding path's candidate pipeline, as in minhashDedup
      val banded = Dedup.bandTable(corpus, "text", "doc_id",
        shingleSize = 3, numHashes = 32, r0 = 8)
      val l = banded.select(col("band"), col("h"), col("__id__").as("doc_a"))
      val r = banded.select(col("band"), col("h"), col("__id__").as("doc_b"))
      val joined = l.join(r, Seq("band", "h")).where(col("doc_a") < col("doc_b"))
      val cand = joined.select("doc_a", "doc_b").distinct()
      // (1) pinned max-partition-rows: after the pair repartition no
      // partition holds more than 4x the mean (the hot band alone would
      // be ~all of the C(800,2) pairs in ONE partition without it)
      val sizes = cand.rdd.mapPartitions(it => Iterator(it.size)).collect()
      val total = sizes.sum
      assert(total >= hotN * (hotN - 1) / 2, s"expected the hot pairs, got $total")
      val nonEmpty = sizes.count(_ > 0)
      val mean = total.toDouble / math.max(nonEmpty, 1)
      assert(sizes.max <= mean * 4 + 64,
        s"skewed pair partition: max ${sizes.max} vs mean $mean over $nonEmpty partitions")
      // (2) the executed band join shows AQE skew-split handling
      joined.queryExecution.toRdd.count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"band join should be AQE skew-split at these thresholds; plan:\n${plan.take(2000)}")
      // (3) loose wall-clock envelope for the whole adversarial pipeline
      val elapsedSec = (System.nanoTime() - t0) / 1e9
      assert(elapsedSec < 120.0, s"hot-band pipeline took $elapsedSec s")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}

class DegenerateInputSpec extends SparkSpecBase {
  import spark.implicits._
  import graft.core.WeightedDataFrame
  import graft.ops.{AsOfJoin, Dedup, Pipeline, Sampling, Similarity}

  private def emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private def oneDoc = Seq((1L, "only one document here with several words")).toDF("doc_id", "text")

  test("dedup operators survive empty and single-row corpora") {
    for (d <- Seq(emptyDocs, oneDoc)) {
      assert(Dedup.exact(d, "text", "doc_id").count() == d.count())
      assert(Dedup.dropExact(d, "text", "doc_id").count() == d.count())
      assert(Dedup.minhashDedup(d, "text", "doc_id", shingleSize = 1, threshold = 1.0).count() == 0)
      assert(Dedup.minhashDedup(d, "text", "doc_id", shingleSize = 1, threshold = 0.8).count() == 0)
      assert(Dedup.simhashPairs(d, "text", "doc_id").count() == 0)
      assert(Pipeline.cleanCorpus(d, "text", "doc_id", minQuality = 0.0, minTokens = 0L)
        .count() == d.count())
      assert(Sampling.weightedSample(d.withColumn("w", lit(1.0)), "w", Seq("doc_id"), 5)
        .count() == math.min(5, d.count()))
    }
  }

  test("empty-text and null-text docs flow through signatures without crashing") {
    val d = Seq((1L, ""), (2L, "   "), (3L, "real content here"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    // null/whitespace docs produce no signature row; nothing throws
    assert(Dedup.simhashTable(d, "text", "doc_id").count() >= 1)
    assert(Dedup.minhashDedup(d, "text", "doc_id", shingleSize = 1, threshold = 1.0).count() >= 0)
    // "" and "   " share the empty token-set key → one group + the real doc
    assert(Dedup.tokenSet(d.where(col("text").isNotNull), "text", "doc_id").count() == 2)
  }

  test("weighted aggregates and quantiles survive empty frames and all-null columns") {
    val empty = Seq.empty[(String, Option[Double], Double)].toDF("Group", "Value", "weights")
    val wEmpty = WeightedDataFrame.wt(empty, "weights")
    assert(wEmpty.mean().collect().length == 1)            // NULL mean row
    assert(wEmpty.describe().count() == 0)                 // no groups → empty
    assert(wEmpty.groupBy("Group").quantile("Value").count() == 0)
    val allNull = Seq(("A", None: Option[Double], 1.0), ("A", None, 2.0))
      .toDF("Group", "Value", "weights")
    val wNull = WeightedDataFrame.wt(allNull, "weights")
    assert(cell(wNull.mean().collect().head, 0).isEmpty)   // NULL, not crash
    assert(wNull.groupBy("Group").quantile("Value").count() == 0) // no valid rows
    assert(cell(wNull.groupBy("Group").skew().collect().head, 1).isEmpty)
  }

  test("round-6 ops survive empty and single-row inputs") {
    import graft.ops.{Packing, TextAnalysis}
    for (d <- Seq(emptyDocs, oneDoc)) {
      // packing: empty in → empty out; one doc → one pack
      assert(Packing.packSequences(d, "doc_id",
        TextAnalysis.bpeTokenCount(col("text")), 1024L, 4).count() == d.count())
      // tf-idf: no posting rows → empty result, no division by zero
      assert(TextAnalysis.tfidfSearch(d, "text", "doc_id", Seq("words"), 3)
        .count() == (if (d.isEmpty) 0 else 1))
      // connected components: no edges → every doc its own cluster
      val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")
      val cc = Dedup.connectedComponents(noEdges, "src", "dst", d.select("doc_id"), "doc_id")
      assert(cc.count() == d.count())
    }
  }

  test("asof join and knn survive empty sides") {
    val left = Seq((1L, "a", java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("id", "k", "ts")
    val emptyRight = Seq.empty[(String, java.sql.Timestamp, Double)].toDF("k", "ts", "v")
    val got = AsOfJoin.asofJoin(left, emptyRight, Seq("k"), "ts", "ts").collect()
    assert(got.length == 1 && got.head.isNullAt(3)) // left kept, no match
    val emptyVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.bruteKnn(emptyVecs, "vec_id", "embedding", lit(true), 3).count() == 0)
  }
}

class SamplingSpec extends SparkSpecBase {
  import spark.implicits._
  import graft.ops.Sampling

  test("upsampleByFactor: epoch fan-out per stratum factor, deterministic fractional coin") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang")
    val factors = Map("en" -> 2.5, "fr" -> 0.5, "de" -> 0.0, "zh" -> 3.0)
    val up = Sampling.upsampleByFactor(d, Seq("doc_id"), "lang", factors, seed = 17L)
    val perDoc = up.groupBy("doc_id", "lang").count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    perDoc.foreach { case (_, lang, n) => lang match {
      case "en" => assert(n == 2 || n == 3)
      case "fr" => assert(n == 1) // 0-copy docs have no rows at all
      case "zh" => assert(n == 3) // whole factor: every doc, no coin
      case "es" => assert(n == 1) // absent from the map → natural epoch
      case other => fail(s"unexpected stratum in output: $other")
    }}
    // de vanishes entirely; zh fans exactly 3x; epochs are 0..n-1
    assert(up.where(col("lang") === "de").count() == 0)
    val zh = d.where(col("lang") === "zh").count()
    assert(up.where(col("lang") === "zh").count() == 3 * zh)
    val epochs = up.where(col("lang") === "zh").groupBy("doc_id")
      .agg(sort_array(collect_list("epoch")).as("e")).select("e")
      .collect().map(_.getSeq[Long](0))
    epochs.foreach(e => assert(e == Seq(0L, 1L, 2L)))
    // the en half-epoch coin lands near half, and the draw is exactly
    // reproducible under a different partitioning
    val en = d.where(col("lang") === "en").count().toDouble
    val en3 = perDoc.count { case (_, l, n) => l == "en" && n == 3 }
    assert(en3 / en > 0.3 && en3 / en < 0.7, s"coin rate ${en3 / en}")
    val again = Sampling.upsampleByFactor(d.repartition(13), Seq("doc_id"),
      "lang", factors, seed = 17L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    assert(again == up.collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq)
    // a whole-number factor never consults the seed
    val w1 = Sampling.upsampleByFactor(d, Seq("doc_id"), "lang",
      Map("zh" -> 3.0), seed = 1L).where(col("lang") === "zh").count()
    val w2 = Sampling.upsampleByFactor(d, Seq("doc_id"), "lang",
      Map("zh" -> 3.0), seed = 2L).where(col("lang") === "zh").count()
    assert(w1 == w2 && w1 == 3 * zh)
  }

  test("temperatureResample: hits the flattened mix in expectation, up AND down") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang")
    val shares = Sampling.temperatureShares(d, "lang", alpha = 0.5)
    val n = d.where(col("lang").isNotNull).count().toDouble
    val out = Sampling.temperatureResample(d, Seq("doc_id"), "lang",
      alpha = 0.5, seed = 23L)
    val got = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val in = d.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    shares.foreach { case (lang, q) =>
      val want = n * q
      // floor+coin per row: |got − want| is a sum of ±frac coins — loose bound
      assert(math.abs(got(lang) - want) <= in(lang) * 0.5 + 2,
        s"$lang: got ${got(lang)} want $want")
    }
    // flattening means the minority stratum UPSAMPLES past its input count
    val minority = in.minBy(_._2)._1
    assert(got(minority) > in(minority),
      s"minority $minority must upsample: ${got(minority)} vs ${in(minority)}")
    // and the majority sheds
    val majority = in.maxBy(_._2)._1
    assert(got(majority) < in(majority))
    // totalRows scales the whole mix
    val doubled = Sampling.temperatureResample(d, Seq("doc_id"), "lang",
      alpha = 0.5, totalRows = 2 * n.toLong, seed = 23L).count().toDouble
    assert(math.abs(doubled - 2 * out.count()) / doubled < 0.2)
    // deterministic under repartitioning
    val again = Sampling.temperatureResample(d.repartition(11), Seq("doc_id"),
      "lang", alpha = 0.5, seed = 23L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
    assert(again == out.collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq)
  }

  test("weightedSample: exact size, deterministic, weight-proportional inclusion") {
    val df = (1 to 2000).map { i =>
      (i.toLong, if (i % 2 == 0) "heavy" else "light", if (i % 2 == 0) 10.0 else 1.0)
    }.toDF("id", "cls", "w")
    val s1 = Sampling.weightedSample(df, "w", Seq("id"), 400, seed = 7L)
      .collect().map(_.getLong(0)).toSet
    assert(s1.size == 400)
    val s2 = Sampling.weightedSample(df.repartition(13), "w", Seq("id"), 400, seed = 7L)
      .collect().map(_.getLong(0)).toSet
    assert(s1 == s2, "sample must not depend on partitioning")
    // heavy class (10× weight) dominates: expected share ≈ 10/11 before
    // depletion effects; assert clearly above the unweighted 1/2
    val heavy = s1.count(_ % 2 == 0).toDouble / s1.size
    assert(heavy > 0.75, s"heavy-class share $heavy not weight-proportional")
  }

  test("temperatureShares: alpha=1 is the natural mix; alpha→0 flattens toward uniform") {
    val df = ((1 to 800).map(i => (i.toLong, "en")) ++
      (1 to 150).map(i => (i.toLong + 1000, "de")) ++
      (1 to 50).map(i => (i.toLong + 2000, "fr"))).toDF("id", "lang")
    val nat = Sampling.temperatureShares(df, "lang", alpha = 1.0)
    assert(math.abs(nat("en") - 0.8) < 1e-12)
    assert(math.abs(nat("de") - 0.15) < 1e-12)
    assert(math.abs(nat("fr") - 0.05) < 1e-12)
    assert(math.abs(nat.values.sum - 1.0) < 1e-12)
    val flat = Sampling.temperatureShares(df, "lang", alpha = 0.01)
    assert(flat.values.forall(s => math.abs(s - 1.0 / 3) < 0.02),
      s"alpha→0 should be ~uniform, got $flat")
    // flattening is monotone: the smallest stratum's share only grows as
    // alpha drops, the largest only shrinks
    val mid = Sampling.temperatureShares(df, "lang", alpha = 0.5)
    assert(nat("fr") < mid("fr") && mid("fr") < flat("fr"))
    assert(nat("en") > mid("en") && mid("en") > flat("en"))
  }

  test("temperatureMix: deterministic draw; binding stratum keeps everything") {
    val df = ((1 to 800).map(i => (i.toLong, "en")) ++
      (1 to 50).map(i => (i.toLong + 2000, "fr"))).toDF("id", "lang")
    val a = Sampling.temperatureMix(df, Seq("id"), "lang", alpha = 0.5, seed = 9L)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.temperatureMix(df.repartition(7), Seq("id"), "lang", 0.5, 9L)
      .collect().map(_.getLong(0)).toSet
    assert(a == b, "draw must not depend on partitioning")
    // fr is the binding (most-upsampled) stratum: matchDistribution keeps
    // all of it and downsamples en to restore the flattened ratio
    val frKept = a.count(_ > 2000)
    assert(frKept == 50, s"binding stratum must keep all rows, kept $frKept")
    val enKept = a.size - frKept
    // target en share = p^0.5-normalized ≈ 0.8 → en/fr ≈ 4:1 at alpha=.5
    val want = math.sqrt(800.0 / 850) / (math.sqrt(800.0 / 850) + math.sqrt(50.0 / 850))
    val ratio = enKept.toDouble / (enKept + 50)
    assert(math.abs(ratio - want) < 0.06, s"en share $ratio, want ≈ $want")
  }

  test("assignSplit: deterministic covering split with ~requested fractions") {
    val df = (1 to 5000).map(i => Tuple1(i.toLong)).toDF("id")
    val out = Sampling.assignSplit(df, Seq("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 3L)
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 5000)
    assert(math.abs(counts("train") - 4000.0) < 200, counts.toString)
    assert(math.abs(counts("val") - 500.0) < 120, counts.toString)
    // same ids land in the same split on recompute
    val again = Sampling.assignSplit(df, Seq("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 3L)
    assert(out.except(again).count() == 0)
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(df, Seq("id"), Seq("a" -> 0.5, "b" -> 0.6))
    }
  }

  test("sampleStratified: per-stratum fractions, nested downsampling, no reshuffle") {
    val df = (1 to 4000).map(i => (i.toLong, if (i % 2 == 0) "a" else "b")).toDF("id", "s")
    val kept = Sampling.sampleStratified(df, Seq("id"), "s", Map("a" -> 0.5, "b" -> 0.1))
    val counts = kept.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("a") - 1000.0) < 150, counts.toString)
    assert(math.abs(counts("b") - 200.0) < 90, counts.toString)
    // unknown stratum dropped by default
    assert(!Sampling.sampleStratified(df, Seq("id"), "s", Map("a" -> 0.5))
      .collect().exists(_.getString(1) == "b"))
    // partitioning-independent
    val k2 = Sampling.sampleStratified(df.repartition(17), Seq("id"), "s",
      Map("a" -> 0.5, "b" -> 0.1)).collect().map(_.getLong(0)).toSet
    assert(k2 == kept.collect().map(_.getLong(0)).toSet)
    // shrinking a fraction keeps a SUBSET (threshold semantics)
    val smaller = Sampling.sampleStratified(df, Seq("id"), "s",
      Map("a" -> 0.25, "b" -> 0.1)).collect().map(_.getLong(0)).toSet
    assert(smaller.subsetOf(k2))
  }

  test("takeTokenBudget: inclusive per-group cut, partitioning-independent") {
    // group a: tokens 100,200,300,400 (ids 1..4) — budget 600 keeps 1..3
    // (cum 100,300,600); group b: 500,200 — keeps both (cum 500,700 > 600
    // drops id 6)
    val df = Seq(
      (1L, "a", 100L), (2L, "a", 200L), (3L, "a", 300L), (4L, "a", 400L),
      (5L, "b", 500L), (6L, "b", 200L)).toDF("id", "g", "tok")
    val got = Sampling.takeTokenBudget(df, Seq("g"), col("tok"), 600L, Seq("id"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 100L), (2L, 300L), (3L, 600L), (5L, 500L)))
    val again = Sampling.takeTokenBudget(
      df.repartition(7), Seq("g"), col("tok"), 600L, Seq("id"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(again.toSeq == got.toSeq, "cut must not depend on partitioning")
    intercept[IllegalArgumentException] {
      Sampling.takeTokenBudget(df, Nil, col("tok"), 600L, Seq("id"))
    }
  }

  test("matchDistribution: binding stratum kept whole, shares match targets") {
    // 4000 a / 1000 b / 500 c; target 50/25/25 → c binds (500 / 0.25 = 2000
    // total): expect ~1000 a, ~500 b, all 500 c; d is dropped (no target)
    val df = ((1 to 4000).map(i => (i.toLong, "a")) ++
      (4001 to 5000).map(i => (i.toLong, "b")) ++
      (5001 to 5500).map(i => (i.toLong, "c")) ++
      (5501 to 5600).map(i => (i.toLong, "d"))).toDF("id", "s")
    val out = Sampling.matchDistribution(df, Seq("id"), "s",
      Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25), seed = 5L)
    val counts = out.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!counts.contains("d"))
    assert(counts("c") == 500, s"binding stratum must keep everything: $counts")
    assert(math.abs(counts("a") - 1000.0) < 120, counts.toString)
    assert(math.abs(counts("b") - 500.0) < 90, counts.toString)
    // deterministic across partitionings
    val again = Sampling.matchDistribution(df.repartition(13), Seq("id"), "s",
      Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25), seed = 5L)
    assert(out.select("id").except(again.select("id")).count() == 0)
    intercept[IllegalArgumentException] {
      Sampling.matchDistribution(df, Seq("id"), "s", Map("nope" -> 1.0))
    }
  }
}

class DecontaminationSpec extends SparkSpecBase {
  import spark.implicits._
  import graft.ops.Decontamination

  private val bench = Seq((100L, "the quick brown fox jumps")).toDF("doc_id", "text")

  test("overlapStats counts distinct shared n-grams; clean and NULL docs surface") {
    val corpus = Seq(
      // shares "the quick brown" + "quick brown fox" (2 of its 3 grams)
      (1L, Some("a the quick brown fox")),
      // repeats a shared gram — distinct semantics count it once
      (2L, Some("the quick brown cat saw the quick brown fox")),
      (3L, Some("entirely different words here now")),
      (4L, Some("ab")), // < n tokens: zero grams
      (5L, None: Option[String])).toDF("doc_id", "text")
    val got = Decontamination.overlapStats(corpus, bench, "text", "doc_id", 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq == Seq(
      (1L, 3L, 2L, true),
      // 9 tokens -> 7 positions, "the quick brown" twice -> 6 distinct; 2 shared
      (2L, 6L, 2L, true),
      (3L, 3L, 0L, false),
      (4L, 0L, 0L, false),
      (5L, 0L, 0L, false)))
  }

  test("dropContaminated keeps clean docs with all columns; maxShared loosens") {
    val corpus = Seq(
      (1L, "x the quick brown fox y", "keepme1"),
      (2L, "clean text with no overlap at all", "keepme2")).toDF("doc_id", "text", "tag")
    val kept = Decontamination.dropContaminated(corpus, bench, "text", "doc_id", 3)
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(kept.toSeq == Seq((2L, "keepme2")))
    // doc 1 shares exactly 2 grams; maxShared = 2 is an inclusive bound
    val loose = Decontamination.dropContaminated(
      corpus, bench, "text", "doc_id", 3, maxShared = 2L)
    assert(loose.count() == 2)
  }

  test("dropContaminatedBloom is exactly dropContaminated; FPs only re-route") {
    val corpus = Seq(
      (1L, Some("x the quick brown fox y"), "c1"), // 2 shared grams at n=3
      (2L, Some("clean text with no overlap at all"), "c2"),
      (3L, Some("ab"), "c3"), // < n tokens: zero grams, fast-path keep
      (4L, None: Option[String], "c4")).toDF("doc_id", "text", "tag")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val exact = Decontamination.dropContaminated(corpus, bench, "text", "doc_id", 3)
    val fast = Decontamination.dropContaminatedBloom(corpus, bench, "text", "doc_id", 3)
    assert(fast.columns.toSeq == corpus.columns.toSeq)
    assert(ids(fast) == ids(exact) && ids(fast) == Seq(2L, 3L, 4L))
    // a near-saturated sketch (fpp=0.99 → minimal bits) routes ~everything
    // down the exact confirm path — the RESULT cannot change, a bloom FP
    // is never a drop verdict
    val saturated = Decontamination.dropContaminatedBloom(
      corpus, bench, "text", "doc_id", 3, fpp = 0.99)
    assert(ids(saturated) == ids(exact))
    // the threshold flows through: doc 1's 2 shared grams pass maxShared=2
    val loose = Decontamination.dropContaminatedBloom(
      corpus, bench, "text", "doc_id", 3, maxShared = 2L)
    assert(ids(loose) == Seq(1L, 2L, 3L, 4L))
  }
}

class AsOfJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asof join attaches the latest right row at or before each left ts") {
    val left = Seq(
      (1L, "a", ts("2024-01-01 10:00:00")),
      (2L, "a", ts("2024-01-01 10:05:00")),
      (3L, "a", ts("2024-01-01 09:00:00")), // before any right row → null
      (4L, "b", ts("2024-01-01 10:00:00"))) // exact match
      .toDF("id", "k", "ts")
    val right = Seq(
      ("a", ts("2024-01-01 09:30:00"), 1.0),
      ("a", ts("2024-01-01 10:02:00"), 2.0),
      ("b", ts("2024-01-01 10:00:00"), 9.0))
      .toDF("k", "ts", "v")
    val got = graft.ops.AsOfJoin.asofJoin(left, right, Seq("k"), "ts", "ts")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    assert(got == Seq(
      (1L, Some(1.0)),  // 09:30 is latest ≤ 10:00
      (2L, Some(2.0)),  // 10:02 is latest ≤ 10:05
      (3L, None),       // nothing at or before 09:00
      (4L, Some(9.0)))) // exact timestamp matches
  }

  test("asof join tolerance nulls matches older than the window") {
    val left = Seq((1L, "a", ts("2024-01-01 10:00:00"))).toDF("id", "k", "ts")
    val right = Seq(("a", ts("2024-01-01 09:00:00"), 5.0)).toDF("k", "ts", "v")
    val within = graft.ops.AsOfJoin.asofJoin(left, right, Seq("k"), "ts", "ts",
      toleranceUs = Some(2L * 3600 * 1000000)).collect()
    assert(within.head.getDouble(3) == 5.0)
    val outside = graft.ops.AsOfJoin.asofJoin(left, right, Seq("k"), "ts", "ts",
      toleranceUs = Some(30L * 60 * 1000000)).collect()
    assert(outside.head.isNullAt(3)) // 1h-old match exceeds 30min tolerance
  }
}

class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  test("dot_product registers for SQL use (SparkSessionExtensions path)") {
    graft.functions.GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head().getDouble(0)
    assert(got == 11.0)
  }

  test("cosine on hand vectors") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f)), (Array(1.0f, 1.0f), Array(1.0f, 1.0f)))
      .toDF("a", "b")
    val got = df.select(Similarity.cosine(col("a"), col("b")).as("c")).collect().map(_.getDouble(0))
    assert(math.abs(got(0)) < 1e-12)
    assert(math.abs(got(1) - 1.0) < 1e-12)
  }

  test("bruteKnn ranks by cosine with deterministic ties") {
    val df = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(1.0f, 0.05f))).toDF("vec_id", "embedding")
    val got = Similarity.bruteKnn(df, "vec_id", "embedding", col("vec_id") === 0, 2)
      .collect().map(r => (r.getLong(1), r.getInt(2))).toSeq
    assert(got == Seq((3L, 1), (1L, 2))) // 3 is closer to (1,0) than 1
  }

  test("annLsh achieves high recall vs brute force on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pred = col("vec_id") < 20
    val brute = Similarity.bruteKnn(emb, "vec_id", "embedding", pred, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annLsh(emb, "vec_id", "embedding", pred, 5, nPlanes = 6, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ann).size.toDouble / brute.size
    // random-gaussian embeddings are a worst case for LSH (weak cosine
    // structure); 6 planes + default hamming-3 multi-probe measures 0.83
    assert(recall >= 0.7, s"recall $recall too low")
  }

  test("annIvf achieves high recall vs brute force on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pred = col("vec_id") < 20
    val brute = Similarity.bruteKnn(emb, "vec_id", "embedding", pred, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.annIvf(emb, "vec_id", "embedding", pred, 5, nLists = 16, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    // probing 8/16 cells measures 0.80 on random-gaussian vectors (the IVF
    // worst case — no cluster structure); real embedding corpora reach the
    // same recall at far lower nProbe/nLists ratios
    assert(recall >= 0.7, s"IVF recall $recall too low")
  }

  test("nearestNeighbors emits one row per vector") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    val got = Similarity.nearestNeighbors(emb, "vec_id", "embedding")
    assert(got.count() == 50)
  }

  test("fitIvf once, searchIvf many — model reuse is deterministic") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val model = Similarity.fitIvf(emb, "embedding")
    assert(model.nLists == Similarity.listsFor(emb.count())) // derived from corpus size
    val a = Similarity.searchIvf(model, emb, "vec_id", "embedding", col("vec_id") < 5, 3)
      .collect().map(_.toSeq).toSeq
    val b = Similarity.searchIvf(model, emb, "vec_id", "embedding",
      col("vec_id") >= 5 && col("vec_id") < 10, 3).collect()
    assert(a.nonEmpty && b.nonEmpty)
    val a2 = Similarity.searchIvf(model, emb, "vec_id", "embedding", col("vec_id") < 5, 3)
      .collect().map(_.toSeq).toSeq
    assert(a == a2) // same model → identical assignment and results
  }

  test("bucketed near-dup strategies: one row per vector, usable recall vs brute") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(200).cache()
    val brute = Similarity.nearestNeighbors(emb, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lsh = Similarity.nearestNeighbors(emb, "vec_id", "embedding", strategy = "lsh")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lsh.size == brute.size) // multi-probe covers every vector's own bucket
    val recall = brute.count { case (k, v) => lsh.get(k).contains(v) }.toDouble / brute.size
    // top-1 recall on random-gaussian vectors (LSH worst case): 4 independent
    // plane tables measure 0.85 at 500 rows
    assert(recall >= 0.6, s"lsh near-dup recall $recall too low")
    val ivf = Similarity.nearestNeighbors(emb, "vec_id", "embedding", strategy = "ivf")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val recallIvf = brute.count { case (k, v) => ivf.get(k).contains(v) }.toDouble / brute.size
    assert(recallIvf >= 0.6, s"ivf near-dup recall $recallIvf too low")
    intercept[IllegalArgumentException] {
      Similarity.nearestNeighbors(emb, "vec_id", "embedding", strategy = "bogus")
    }
  }

  test("bucket parameters grow with corpus size — population stays bounded") {
    // the scale contract: mean bucket/cell population ≈ target at ANY corpus
    // size (a constant plane/list count would make the self-join Θ(n²))
    for (n <- Seq(200L, 2000L, 200000L, 2000000000L)) {
      val meanBucket = n.toDouble / (1L << Similarity.planesFor(n, 128))
      assert(meanBucket <= 128.0, s"n=$n: mean LSH bucket $meanBucket exceeds target")
      val meanCell = n.toDouble / Similarity.listsFor(n, 128)
      // listsFor caps at 8192 (KMeans fit cost + centroid-matrix size —
      // the native argmax kernel removed the old 1024 codegen ceiling);
      // past the cap cell population grows again by design
      assert(meanCell <= 129.0 || Similarity.listsFor(n, 128) == 8192,
        s"n=$n: mean IVF cell $meanCell exceeds target")
    }
    assert(Similarity.planesFor(10L) >= 1)   // tiny corpora stay valid
    assert(Similarity.listsFor(10L) == 2)
  }

  test("annLsh infers the true vector dim (no hardcoded-64 truncation)") {
    // dim-96 corpus whose discriminating signal lives ONLY in components
    // 64..95 — a hardcoded dim=64 would bucket every vector identically
    // AND throw nothing; with inference the planes span all 96 components
    val rnd = new scala.util.Random(7)
    val base = Array.fill(64)(rnd.nextGaussian().toFloat)
    val rows = (0L until 40L).map { i =>
      val tail = Array.fill(32)(rnd.nextGaussian().toFloat)
      (i, base ++ tail)
    }
    val df = rows.toDF("vec_id", "embedding")
    val pred = col("vec_id") < 5
    val brute = Similarity.bruteKnn(df, "vec_id", "embedding", pred, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annLsh(df, "vec_id", "embedding", pred, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ann.nonEmpty)
    // 40 rows → 1 derived plane, probe radius 2 covers both buckets → exact
    assert((brute & ann).size == brute.size)
  }

  test("dot_product raises on dimension mismatch instead of truncating") {
    val df = Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0))).toDF("a", "b")
    val e = intercept[Throwable] {
      df.select(graft.functions.VectorFunctions.dotProduct(col("a"), col("b"))).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
    assert(chain(e).exists(c => Option(c.getMessage).exists(_.contains("dimension mismatch"))))
  }

  test("dropNearDuplicateVectors keeps first copy of a near-dup cluster") {
    val v = Array(1.0f, 0.0f, 0.0f)
    val df = Seq(
      (0L, v),
      (1L, Array(0.999f, 0.01f, 0.0f)),  // near-dup of 0 → dropped (0 < 1)
      (2L, Array(0.0f, 1.0f, 0.0f)),      // orthogonal → kept
      (3L, Array(0.0f, 0.98f, 0.2f)))     // near 2 → dropped (2 < 3)
      .toDF("vec_id", "embedding")
    val kept = Similarity.dropNearDuplicateVectors(df, "vec_id", "embedding",
      simThreshold = 0.9, strategy = "brute").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 2L))
  }

  test("NaN vector elements rank last in both top-k paths (NULL sim)") {
    val df = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(Float.NaN, 1.0f)),
      (2L, Array(0.9f, 0.1f))).toDF("vec_id", "embedding")
    val k1 = Similarity.bruteKnn(df, "vec_id", "embedding", col("vec_id") === 0, 1).collect()
    assert(k1.head.getLong(1) == 2L) // k=1 aggregate path
    val k2 = Similarity.bruteKnn(df, "vec_id", "embedding", col("vec_id") === 0, 2)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(k2 == Seq(2L, 1L)) // window path: NULL sim sorts after real sims
  }

  test("groupCentroids: ordered dimension means, NULL vectors skipped") {
    val df = Seq(
      (0L, "a", Array(1.0f, 10.0f, 100.0f)),
      (1L, "a", Array(3.0f, 30.0f, 300.0f)),
      (2L, "b", Array(5.0f, 50.0f, 500.0f)),
      (3L, "b", null.asInstanceOf[Array[Float]])).toDF("id", "g", "vec")
    val got = Similarity.groupCentroids(df, Seq("g"), "vec")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getSeq[Double](1).toSeq, r.getLong(2)))
    assert(got.toSeq == Seq(
      ("a", Seq(2.0, 20.0, 200.0), 2L),
      ("b", Seq(5.0, 50.0, 500.0), 1L)))
    // partitioning-independent (avg is order-sensitive in ulps only; the
    // exact halves here make the assertion exact)
    val again = Similarity.groupCentroids(df.repartition(7), Seq("g"), "vec")
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getSeq[Double](1).toSeq, r.getLong(2)))
    assert(again.toSeq == got.toSeq)
  }
}

class ConnectedComponentsSpec extends SparkSpecBase {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)], nodes: Seq[Long]): Map[Long, Long] =
    Dedup.connectedComponents(
      edges.toDF("src", "dst"), "src", "dst", nodes.toDF("id"), "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chains, pairs, and isolated nodes cluster to the component minimum") {
    // 1-2-3 is a CHAIN (1~3 never emitted) — pairs alone would under-merge
    val got = cc(Seq((1L, 2L), (2L, 3L), (5L, 6L)), Seq(1L, 2L, 3L, 5L, 6L, 7L))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("pointer jumping converges a 200-node chain well under the round cap") {
    val edges = (0L until 199L).map(i => (i, i + 1))
    val got = cc(edges, 0L to 199L)
    assert(got.values.toSet == Set(0L)) // one component, labeled by its min
  }

  test("50k-node path graph converges in O(log n) contraction rounds") {
    // a path is the worst case for plain label propagation (diameter = n);
    // contraction + 8-level jumps must finish in logarithmic rounds
    val n = 50000
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("src", "dst")
    val nodes = spark.range(n).toDF("id")
    val (labels, rounds) = Dedup.connectedComponentsWithStats(
      edges, "src", "dst", nodes, "id")
    val distinct = labels.select("cluster_id").distinct().collect()
    assert(distinct.length == 1 && distinct.head.getLong(0) == 0L)
    assert(labels.count() == n)
    val bound = 2 * (math.log(n.toDouble) / math.log(2.0)).ceil.toInt
    assert(rounds <= bound, s"took $rounds contraction rounds, bound $bound")
  }

  test("edge direction and duplication do not matter") {
    val got = cc(Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 2L)), Seq(1L, 2L, 3L))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("empty edge list leaves every node its own cluster") {
    val got = cc(Seq.empty, Seq(4L, 9L))
    assert(got == Map(4L -> 4L, 9L -> 9L))
  }

  test("endpoints outside the node universe still relay connectivity") {
    // 1-2-3 where 2 is NOT in `nodes`: 1 and 3 must still merge through it,
    // and 2 itself must not appear in the output
    val got = cc(Seq((1L, 2L), (2L, 3L)), Seq(1L, 3L))
    assert(got == Map(1L -> 1L, 3L -> 1L))
  }

  test("reliable-checkpoint mode ≡ localCheckpoint mode, bit-identical (cluster fault-tolerance path)") {
    // with a checkpoint dir configured, freezeStatsFree switches every
    // iteration freeze to reliable checkpoint() — the mode a real cluster
    // runs (localCheckpoint blocks die with their executor). Pin both
    // modes' outputs identical on the worst-case path graph, plus a
    // multi-component graph with isolated nodes and out-of-universe relays.
    val n = 5000
    val pathEdges = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("src", "dst")
    val pathNodes = spark.range(n).toDF("id")
    val mixedEdges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("src", "dst")
    val mixedNodes = Seq(1L, 2L, 3L, 10L, 11L, 20L, 22L, 99L).toDF("id") // 21 relays only
    def run(): (Seq[(Long, Long)], Seq[(Long, Long)]) = (
      Dedup.connectedComponents(pathEdges, "src", "dst", pathNodes, "id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted,
      Dedup.connectedComponents(mixedEdges, "src", "dst", mixedNodes, "id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted)
    org.apache.spark.TestCheckpointDir.clear(spark.sparkContext)
    val local = run()
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      assert(spark.sparkContext.getCheckpointDir.isDefined)
      val reliable = run()
      assert(reliable == local)
      // the reliable path actually wrote checkpoint state (not a silent
      // fallback to localCheckpoint)
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(wrote > 0, "reliable checkpoint mode wrote nothing to the checkpoint dir")
      // superseded generations were RELEASED as the contraction advanced:
      // only each run's final labels checkpoint survives (2 CC invocations
      // → 2 rdd-* dirs), not O(rounds) copies accumulating until app exit
      val rddDirs = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => java.nio.file.Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("rdd-"))
        .count()
      assert(rddDirs == 2, s"expected 2 surviving checkpoint dirs, found $rddDirs")
    } finally {
      // restore the suite's single-JVM default for every later test
      org.apache.spark.TestCheckpointDir.clear(spark.sparkContext)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("duplicateClusters: minhash pairs cluster transitively over the corpus") {
    val docs = Seq(
      (0L, "the quick brown fox jumps"),
      (1L, "the quick brown fox jumps"),
      (2L, "jumps fox brown quick the"),
      (3L, "completely different words here"),
      (4L, "another unrelated document text")).toDF("doc_id", "text")
    val pairs = Dedup.minhashDedup(docs, "text", "doc_id",
      shingleSize = 1, numHashes = 32, bandRows = 8, threshold = 1.0)
    val got = Dedup.duplicateClusters(docs, "doc_id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L, 4L -> 4L))
  }
}

class PackingSpec extends SparkSpecBase {
  import spark.implicits._
  import graft.ops.Packing

  test("packs cut at capacity boundaries; boundary-crossing doc stays put") {
    // one stream (nStreams=1), ordered by id; capacity 10.
    // tokens:   4  4  4  4   -> offsets 0 4 8 12 -> packs 0 0 0 1
    val d = Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 4L)).toDF("doc_id", "t")
    val got = Packing.packSequences(d, "doc_id", col("t"), 10L, 1)
      .orderBy("doc_id").collect().map(r => r.getAs[Long]("pack")).toSeq
    assert(got == Seq(0L, 0L, 0L, 1L)) // doc 3 overruns pack 0 (8+4>10), stays
  }

  test("assignment is deterministic across partitionings") {
    val d = (1L to 500L).map(i => (i, 1L + i % 37)).toDF("doc_id", "t")
    val a = Packing.packSequences(d, "doc_id", col("t"), 256L, 8)
      .select("doc_id", "stream", "pack").collect().map(_.toSeq).toSet
    val b = Packing.packSequences(d.repartition(13), "doc_id", col("t"), 256L, 8)
      .select("doc_id", "stream", "pack").collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("chunking covers every token once per stride with the overlap") {
    // n=500, size=200, overlap=50 -> stride 150, nc = 1 + ceil(300/150) = 3
    // chunks: [0,200) [150,350) [300,500)
    val d = Seq((1L, 500L), (2L, 200L), (3L, 1L), (4L, 0L)).toDF("doc_id", "t")
    val got = Packing.chunkDocuments(d, "doc_id", col("t"), 200L, 50L)
      .orderBy("doc_id", "chunk_idx")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(
      (1L, 0L, 0L, 200L), (1L, 1L, 150L, 350L), (1L, 2L, 300L, 500L),
      (2L, 0L, 0L, 200L), // exactly one chunk at n == chunkSize
      (3L, 0L, 0L, 1L)))  // tiny doc: one short chunk; n=0 dropped
    // no chunk starts at/past the end; last chunk always reaches n
    val big = (1L to 300L).map(i => (i, i)).toDF("doc_id", "t")
    val rows = Packing.chunkDocuments(big, "doc_id", col("t"), 64L, 16L).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("tok_start") < r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("tok_end") <= r.getAs[Long]("n_tokens"))
    }
    val lastEnd = rows.groupBy(_.getLong(0)).map { case (_, rs) => rs.map(r =>
      (r.getAs[Long]("tok_end"), r.getAs[Long]("n_tokens"))).maxBy(_._1) }
    assert(lastEnd.forall { case (end, n) => end == n })
  }

  test("chunk-count arithmetic is exact past 2^53 (pure long div, no double)") {
    // numerator 2^53 + 3 is NOT double-representable (rounds to 2^53 + 4):
    // the old floor(double-division) path yields 2^52 + 2 with stride 2,
    // while exact integer division gives floor((2^53+3)/2) = 2^52 + 1.
    val num = (1L << 53) + 3L
    val stride = 2L
    val got = Seq(num).toDF("numerator")
      .select(Packing.chunkCountFromNum(col("numerator"), stride).as("nc"))
      .head().getLong(0)
    assert(got == 1L + num / stride) // Scala Long / == SQL div for nonnegatives
    val doubled = 1L + (num.toDouble / stride.toDouble).toLong
    assert(got != doubled, "test must exercise a value where double division is wrong")
  }

  test("repetition stats: distinct ratio and top-bigram share per doc") {
    val d = Seq(
      (1L, "a b a b c"), // 5 words, 3 distinct; 'a b' twice of 4 bigrams
      (2L, "x x x x"),   // 4 words, 1 distinct; 'x x' 3 of 3
      (3L, "solo")       // single token: no bigram -> NULL frac
    ).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.repetitionStats(d, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(got(0).getLong(1) == 5L && got(0).getLong(2) == 3L)
    assert(got(0).getDouble(3) == 0.6 && got(0).getDouble(4) == 0.5)
    assert(got(1).getDouble(3) == 0.25 && got(1).getDouble(4) == 1.0)
    assert(got(2).getLong(1) == 1L && got(2).isNullAt(4))
    // a NULL-text doc surfaces with NULL metrics instead of vanishing
    val withNull = Seq((1L, Some("a b")), (2L, None: Option[String])).toDF("doc_id", "text")
    val g2 = graft.ops.TextAnalysis.repetitionStats(withNull, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(g2.length == 2 && g2(1).isNullAt(1) && g2(1).isNullAt(3))
  }

  test("unigram perplexity: uniform docs score corpus-typical, rare-word docs high") {
    // corpus: 'a' x6, 'b' x2 -> p(a)=0.75, p(b)=0.25
    val d = Seq((1L, "a a a"), (2L, "a a a"), (3L, "b b")).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.unigramPerplexity(d, "text", "doc_id")
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // ppl(doc of all-a) = 1/0.75, ppl(all-b) = 1/0.25
    assert(math.abs(got(1L) - 4.0 / 3.0) < 1e-6)
    assert(math.abs(got(3L) - 4.0) < 1e-6)
    assert(got(3L) > got(1L)) // rarer tokens -> higher perplexity
  }

  test("bigram perplexity: matches brute MLE conditionals; word-order sensitivity; " +
    "sub-2-token docs NULL") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat ran"),
      (3L, "mat the on sat cat the"), // same words as 1, scrambled order
      (4L, "solo"), (5L, ""), (6L, null: String))
    val d = docs.toDF("doc_id", "text")
    // brute: string-keyed counts over the same corpus
    def toks(s: String): Seq[String] =
      Option(s).map(_.split("[ \t\n\f\r]+").filter(_.nonEmpty).toSeq).getOrElse(Seq.empty)
    val allBg = docs.flatMap { case (_, t) => toks(t).sliding(2).filter(_.size == 2) }
    val cb = allBg.groupBy(identity).view.mapValues(_.size).toMap
    val cc = allBg.groupBy(_.head).view.mapValues(_.size).toMap
    def brute(t: String): Option[Double] = {
      val bs = toks(t).sliding(2).filter(_.size == 2).toSeq
      if (bs.isEmpty) None
      else Some(math.exp(-bs.map(b => math.log(cb(b).toDouble / cc(b.head))).sum / bs.size))
    }
    val got = graft.ops.TextAnalysis.bigramPerplexity(d, "text", "doc_id")
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    docs.foreach { case (id, t) =>
      (got(id), brute(t)) match {
        case (Some(g), Some(w)) => assert(math.abs(g - w) < 1e-6, s"doc $id: $g vs $w")
        case (a, b)             => assert(a == b, s"doc $id: $a vs $b")
      }
    }
    // word-order sensitivity — the signal unigram ppl is blind to: docs 1
    // and 3 are permutations of the same words, so their unigram ppls tie
    // while their bigram ppls differ
    val uni = graft.ops.TextAnalysis.unigramPerplexity(d, "text", "doc_id")
      .where(col("doc_id").isin(1L, 3L))
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(uni(1L) - uni(3L)) < 1e-9, "unigram ppl cannot separate permutations")
    assert(math.abs(got(1L).get - got(3L).get) > 1e-3,
      s"bigram ppl must separate permutations: ${got(1L)} vs ${got(3L)}")
    assert(got(4L).isEmpty && got(5L).isEmpty && got(6L).isEmpty)
  }

  test("pplBuckets: mass-weighted head/middle/tail per group, NULL ppl → NULL bucket") {
    // real corpus slice so the self-trained LM has signal
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "lang", "text")
    val got = graft.ops.TextAnalysis.pplBuckets(d, "text", "doc_id",
      by = Seq("lang"), buckets = 3).cache()
    try {
      assert(got.count() == d.count())
      val labels = got.where(col("bucket").isNotNull)
        .select("bucket_label").distinct().collect().map(_.getString(0)).toSet
      assert(labels == Set("head", "middle", "tail"))
      // head = LOWEST perplexity: per language, max(head ppl) <= min(tail ppl)
      val byLang = got.where(col("bucket").isNotNull)
        .groupBy("lang").agg(
          max(when(col("bucket") === 0, col("ppl2"))).as("maxHead"),
          min(when(col("bucket") === 2, col("ppl2"))).as("minTail"))
        .collect()
      byLang.foreach { r =>
        if (!r.isNullAt(1) && !r.isNullAt(2))
          assert(r.getDouble(1) <= r.getDouble(2),
            s"lang ${r.getString(0)}: head ppl above tail")
      }
      // NULL ppl (sub-2-token) rows keep NULL bucket AND label
      val nulls = got.where(col("ppl2").isNull)
      assert(nulls.where(col("bucket").isNotNull || col("bucket_label").isNotNull).count() == 0)
      // mass split: each lang's head holds ~1/3 of its total char mass
      val mass = got.join(d.select(col("doc_id"),
          length(coalesce(col("text"), lit(""))).cast("double").as("w")), Seq("doc_id"))
        .where(col("bucket").isNotNull)
        .groupBy("lang").agg(
          (sum(when(col("bucket") === 0, col("w")).otherwise(0.0)) / sum(col("w"))).as("hs"))
        .collect()
      mass.foreach { r =>
        assert(math.abs(r.getDouble(1) - 1.0 / 3) < 0.15,
          s"lang ${r.getString(0)} head mass share ${r.getDouble(1)}")
      }
    } finally got.unpersist()
  }

  test("vocabulary counts total and document frequency with a deterministic cut") {
    val d = Seq(
      (1L, "a b b c"), (2L, "b c c d"), (3L, "c d  d"), (4L, "")).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.vocabulary(d, "text", "doc_id", 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // tf: c=4, d=3, b=3, a=1; tie d-vs-b breaks lexicographically (b first)
    assert(got == Seq(("c", 4L, 3L), ("b", 3L, 2L), ("d", 3L, 2L)))
  }

  test("null and non-positive token counts are dropped; fill tracks overrun") {
    val d = Seq((1L, Some(5L)), (2L, None), (3L, Some(0L)), (4L, Some(7L)))
      .toDF("doc_id", "t")
    val packed = Packing.packSequences(d, "doc_id", col("t"), 8L, 1)
    assert(packed.count() == 2)
    val s = Packing.packSummary(packed, 8L).collect()
    // docs 1 (5 tokens, offset 0) and 4 (7 tokens, offset 5) share pack 0:
    // doc 4 starts below capacity 8 and overruns it (12 tokens total)
    assert(s.length == 1 && s.head.getAs[Long]("tokens") == 12L)
    assert(math.abs(s.head.getAs[Double]("fill") - 1.5) < 1e-12)
  }

  /** Brute stupid-backoff reference over token STRINGS (independent of the
    * engine's hash keying). */
  private def bruteBackoffPpl(
      ref: Seq[String], doc: String, alpha: Double = 0.4): Option[Double] = {
    def toks(s: String): Seq[String] =
      Option(s).map(_.split("[ \t\n\f\r]+").filter(_.nonEmpty).toSeq).getOrElse(Nil)
    def grams(ts: Seq[String], n: Int): Seq[String] =
      if (ts.size < n) Nil else ts.sliding(n).map(_.mkString(" ")).toSeq
    val refToks = ref.map(toks)
    val c1 = refToks.flatMap(grams(_, 1)).groupBy(identity).view.mapValues(_.size).toMap
    val c2 = refToks.flatMap(grams(_, 2)).groupBy(identity).view.mapValues(_.size).toMap
    val c3 = refToks.flatMap(grams(_, 3)).groupBy(identity).view.mapValues(_.size).toMap
    val n = c1.values.sum.toDouble
    val ts = toks(doc)
    if (ts.size < 3) None
    else {
      val la = math.log(alpha)
      val logs = ts.sliding(3).map { w =>
        val (tg, cx2, bg, cx1, ug) =
          (w.mkString(" "), s"${w(0)} ${w(1)}", s"${w(1)} ${w(2)}", w(1), w(2))
        if (c3.contains(tg)) math.log(c3(tg).toDouble / c2(cx2))
        else if (c2.contains(bg)) la + math.log(c2(bg).toDouble / c1(cx1))
        else if (c1.contains(ug)) 2 * la + math.log(c1(ug) / n)
        else 2 * la + math.log(1.0 / n)
      }.toSeq
      Some(math.exp(-logs.sum / logs.size))
    }
  }

  test("stupidBackoffPerplexity: every backoff branch matches the brute reference") {
    import graft.ops.TextAnalysis
    val ref = Seq("the cat sat on the mat", "the dog sat on a rug", "a cat ran")
    // docs exercising: all-trigrams-known, unseen trigram / known bigram,
    // unseen bigram / known unigram, full OOV, short (NULL)
    val docs = Seq(
      (1L, "the cat sat on the mat"),  // every trigram in ref
      (2L, "the dog sat on the mat"),  // 'dog sat on' known; 'sat on the' known; crossover grams back off
      (3L, "rug the dog zebra ran"),   // zebra OOV, odd orders back off deep
      (4L, "zz yy xx"),                // full OOV
      (5L, "one two"),                 // < 3 tokens → NULL
      (6L, null.asInstanceOf[String])) // NULL text → NULL
    val refDf = ref.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val lm = TextAnalysis.fitStupidBackoffLm(refDf, "text")
    assert(lm.total == ref.map(_.split(" ").length).sum)
    val got = TextAnalysis.stupidBackoffPerplexity(
      docs.toDF("doc_id", "text"), "text", "doc_id", lm)
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    docs.foreach { case (id, text) =>
      val want = bruteBackoffPpl(ref, text).map(p => math.rint(p * 1e6) / 1e6)
      assert(got(id).map(p => math.rint(p * 1e6) / 1e6) == want, s"doc $id")
    }
    // full OOV pins the α²/N proxy exactly: every window scores α²/N
    val n = lm.total.toDouble
    assert(math.abs(got(4L).get - 1.0 / (0.16 / n)) < 1e-3)
  }

  test("backoff kernel: per-row scorer ≡ brute reference exactly; ≡ join path at the grid") {
    import graft.ops.TextAnalysis
    val ref = Seq("the cat sat on the mat", "the dog sat on a rug", "a cat ran")
    val refDf = ref.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val lm = TextAnalysis.fitStupidBackoffLm(refDf, "text")
    val kernel = TextAnalysis.lmKernel(lm)
    val docs = Seq(
      (1L, "the cat sat on the mat"), (2L, "the dog sat on the mat"),
      (3L, "rug the dog zebra ran"), (4L, "zz yy xx"),
      (5L, "one two"), (6L, null.asInstanceOf[String]))
    val got = docs.toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.backoffPerplexityScore(col("text"), kernel).as("p"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    docs.foreach { case (id, text) =>
      val want = bruteBackoffPpl(ref, text)
      (got(id), want) match {
        case (Some(g), Some(w)) => assert(math.abs(g - w) < 1e-12, s"doc $id")
        case (g, w)             => assert(g == w, s"doc $id")
      }
    }
    // against the join-based scorer on real text: equal at the round-6 grid
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    val lmR = TextAnalysis.fitStupidBackoffLm(d.where(col("doc_id") % 3 === 0), "text")
    val kR = TextAnalysis.lmKernel(lmR)
    val joinPath = TextAnalysis.stupidBackoffPerplexity(d, "text", "doc_id", lmR)
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    d.select(col("doc_id"), TextAnalysis.backoffPerplexityScore(col("text"), kR).as("p"))
      .collect().foreach { r =>
        val k = Option(r.get(1)).map(_.asInstanceOf[Double])
        val j = joinPath(r.getLong(0))
        (k, j) match {
          case (Some(a), Some(b)) => assert(math.abs(a - b) <= 5.01e-7 * math.max(1.0, b))
          case (a, b)             => assert(a == b)
        }
      }
    // the cap fails loudly instead of collecting an oversized model
    val e = intercept[IllegalArgumentException](TextAnalysis.lmKernel(lmR, maxEntries = 10))
    assert(e.getMessage.contains("cap"))
  }

  test("saveLm/loadLm: round-trip scores bit-identically; tamper fails the sig") {
    import graft.ops.TextAnalysis
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val lm = TextAnalysis.fitStupidBackoffLm(d.where(col("doc_id") % 3 === 0), "text")
    val dir = java.nio.file.Files.createTempDirectory("lm").toString
    TextAnalysis.saveLm(spark, lm, dir)
    val lm2 = TextAnalysis.loadLm(spark, dir)
    assert(lm2.total == lm.total)
    val a = TextAnalysis.stupidBackoffPerplexity(d, "text", "doc_id", lm)
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val b = TextAnalysis.stupidBackoffPerplexity(d, "text", "doc_id", lm2)
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(a == b)
    // tampering with a count table must fail the load loudly
    import spark.implicits._
    val tampered = lm2.tri.limit(5).collect()
      .map(r => (r.getLong(0), r.getLong(1) + 1)).toSeq
      .toDF("__t__", "__c3__")
    tampered.write.mode("overwrite").parquet(s"$dir/tri")
    val e = intercept[IllegalArgumentException](TextAnalysis.loadLm(spark, dir))
    assert(e.getMessage.contains("content sig"))
  }

  test("pplBuckets(lm): buckets by the reference-fitted backoff ppl, ppl3 column") {
    import graft.ops.TextAnalysis
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val lm = TextAnalysis.fitStupidBackoffLm(
      d.where(col("doc_id") % 3 === 0), "text")
    val got = TextAnalysis.pplBuckets(d, "text", "doc_id",
      by = Seq("lang"), buckets = 3, lm = Some(lm))
    assert(got.columns.toSeq == Seq("doc_id", "lang", "ppl3", "bucket", "bucket_label"))
    val rows = got.collect()
    assert(rows.length == d.count())
    // bucketing must follow the backoff scorer exactly: for each language,
    // every head ppl ≤ every tail ppl
    rows.groupBy(_.getString(1)).foreach { case (_, rs) =>
      val byB = rs.filter(!_.isNullAt(3)).groupBy(_.getLong(3))
      for (h <- byB.getOrElse(0L, Array.empty); t <- byB.getOrElse(2L, Array.empty))
        assert(h.getDouble(2) <= t.getDouble(2))
    }
    // the scored column IS stupidBackoffPerplexity's output
    val direct = TextAnalysis.stupidBackoffPerplexity(d, "text", "doc_id", lm)
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    rows.foreach(r => assert(Option(r.get(2)) == direct(r.getLong(0))))
  }

  test("single-scan freeze knob: frozen LM chains match unfrozen bit-for-bit, zero text re-scans") {
    import graft.ops.TextAnalysis
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // DISTINCT parquet-scan nodes in the plan that read the TEXT column —
    // the 100-TB cost the freeze knob exists to kill. Counted from the
    // formatted detail section (one entry per node id), because a cached
    // pool's single fill scan is REFERENCED from every InMemoryTableScan
    // in the tree view but executes once.
    def textScans(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
        .split("\n\n").count { block =>
          val lines = block.linesIterator.toList
          lines.headOption.exists(_.matches("""\(\d+\) Scan parquet\s*""")) &&
            lines.find(_.trim.startsWith("Output")).exists(_.contains("text#"))
        }
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.toSeq.map(Option(_))).toSeq.sortBy(_.toString)
    // ALL cold-path plans and values are captured BEFORE any freeze=true
    // call: persist registers the pool fragment with the CacheManager,
    // and later explains of the SAME fragment pick the cache up by plan
    // substitution — which would make the cold scan counts vacuous
    val bgCold = TextAnalysis.bigramPerplexity(d, "text", "doc_id")
    val bgColdScans = textScans(bgCold)
    val bgColdRows = m(bgCold)
    val refSlice = d.where(col("doc_id") % 3 === 0)
    val lmCold = TextAnalysis.fitStupidBackoffLm(refSlice, "text")
    val lmColdTri = m(lmCold.tri)
    val lmColdBi = m(lmCold.bi)
    val boCold = TextAnalysis.stupidBackoffPerplexity(d, "text", "doc_id", lmCold)
    val boColdRows = m(boCold)
    val pbCold = TextAnalysis.pplBuckets(d, "text", "doc_id", by = Seq("lang"))
    val pbColdScans = textScans(pbCold)
    val pbColdRows = m(pbCold)
    val cbColdRows = m(TextAnalysis.pplBuckets(d, "text", "doc_id",
      by = Seq("lang"), lm = Some(lmCold)))
    assert(bgColdScans >= 3, s"unfrozen bigram should re-scan text, got $bgColdScans")
    assert(pbColdScans >= 3)
    // bigram scorer, frozen
    val bgHot = TextAnalysis.bigramPerplexity(d, "text", "doc_id", freeze = true)
    assert(m(bgHot) == bgColdRows)
    assert(textScans(bgHot) == 1, "frozen bigram must plan exactly ONE text scan (the cache fill)")
    // backoff fit + scorer, frozen end to end
    val lmHot = TextAnalysis.fitStupidBackoffLm(refSlice, "text", freeze = true)
    assert(lmHot.total == lmCold.total)
    assert(m(lmHot.tri) == lmColdTri)
    val boHot = TextAnalysis.stupidBackoffPerplexity(d, "text", "doc_id", lmHot, freeze = true)
    assert(m(boHot) == boColdRows)
    // fit pool (1 fill scan over the slice) + scoring pool (1 fill scan)
    assert(textScans(boHot) <= 2)
    // bucketing, both LM flavors
    val pbHot = TextAnalysis.pplBuckets(d, "text", "doc_id", by = Seq("lang"), freeze = true)
    assert(m(pbHot) == pbColdRows)
    assert(textScans(pbHot) == 1)
    val cbHot = TextAnalysis.pplBuckets(d, "text", "doc_id", by = Seq("lang"),
      lm = Some(lmHot), freeze = true)
    assert(m(cbHot) == cbColdRows)
    assert(textScans(cbHot) <= 2)
    // the shared pool: fit on a slice + score the corpus off ONE text read
    val pool = TextAnalysis.ngramHashPool(d, "text", "doc_id")
    val lmPool = TextAnalysis.fitStupidBackoffLmFromPool(
      pool.where(col("doc_id") % 3 === 0))
    assert(lmPool.total == lmCold.total)
    assert(m(lmPool.bi) == lmColdBi)
    val poolScore = TextAnalysis.stupidBackoffPerplexityFromPool(pool, "doc_id", lmPool)
    assert(m(poolScore) == boColdRows)
    // the shared pool: fit AND score hang off ONE cache-fill text scan
    assert(textScans(poolScore) == 1)
    // drop the registered pools so fragment substitution cannot leak into
    // later tests' plans (the suite shares one session)
    spark.catalog.clearCache()
  }

  test("stupidBackoffPerplexity: self-scored corpus never backs off (pure trigram MLE)") {
    import graft.ops.TextAnalysis
    val corpus = Seq(
      (1L, "a b c a b d"), (2L, "a b c d e"), (3L, "b c a b c")).toDF("doc_id", "text")
    val lm = TextAnalysis.fitStupidBackoffLm(corpus, "text")
    val got = TextAnalysis.stupidBackoffPerplexity(corpus, "text", "doc_id", lm)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ref = Seq("a b c a b d", "a b c d e", "b c a b c")
    ref.zipWithIndex.foreach { case (t, i) =>
      val want = bruteBackoffPpl(ref, t).get
      assert(math.abs(got(i + 1L) - want) < 1e-5)
      // self-scored: every trigram is in the model, so ppl is bounded by
      // the worst single conditional (no α penalty can appear)
      assert(got(i + 1L) <= 1.0 / (1.0 / lm.total) + 1e-9)
    }
  }
}
