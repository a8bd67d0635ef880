package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct character n-grams of a string column.
  *
  * The expression-composition equivalent —
  * `array_distinct(transform(sequence(...), i -> substr(text, i, n)))` —
  * evaluates the higher-order lambda interpreted, re-dispatching per
  * character position and allocating an intermediate array before the
  * distinct pass (~1.4 ms/doc measured at sf0.1, the dominant cost of the
  * n-gram-Jaccard query). This walks the UTF-8 bytes once into a dedup set
  * inside whole-stage codegen (the generated code calls one static method,
  * the same shape Spark's own collection builtins use).
  *
  * Semantics (mirrors the old composition exactly, oracle-compatible):
  * strings of ≤ n code points yield one gram — the whole string (even when
  * empty); longer strings yield their distinct n-grams in first-occurrence
  * order. NULL in → NULL out.
  */
case class CharNGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"char_ngrams requires n >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"char_ngrams requires a string input, got $other")
  }

  override protected def nullSafeEval(s: Any): Any =
    CharNGrams.compute(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharNGrams.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharNGrams {
  /** Shared by the interpreted and generated paths (public static so
    * codegen'd classes can call it). */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val len = s.numChars()
    if (len <= n) return new GenericArrayData(Array[Any](s))
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= len - n) {
      seen.add(s.substring(i, i + n))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }
}

/** Native distinct word (whitespace-token) n-grams of a string column —
  * the shingle kernel for MinHash/SimHash/token-set dedup.
  *
  * Semantics mirror the expression composition
  * `array_distinct(transform(sequence(...), i -> concat_ws(" ",
  * slice(split(trim(text), "\\s+"), i, n))))` EXACTLY, including its edge
  * behavior: Spark's `trim` strips 0x20 only (not tabs), `split(_, -1)`
  * keeps leading/trailing empty tokens after non-space separators, and a
  * doc with fewer than n tokens yields an empty array (n ≥ 2) or its
  * distinct tokens (n = 1). One pass, no interpreted lambdas — the HOF
  * form is CodegenFallback inside the shingle `Generate`. */
case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"word_ngrams requires n >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"word_ngrams requires a string input, got $other")
  }

  override protected def nullSafeEval(s: Any): Any =
    WordNGrams.compute(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNGrams.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNGrams {
  /** Shared by the interpreted and generated paths. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val raw = s.toString
    // Spark's trim() strips 0x20 ONLY (not \t\r\n) — String.trim would not
    var b = 0
    var e = raw.length
    while (b < e && raw.charAt(b) == ' ') b += 1
    while (e > b && raw.charAt(e - 1) == ' ') e -= 1
    // Spark's split(str, regex) uses limit -1 (trailing empties kept)
    val toks = raw.substring(b, e).split("\\s+", -1)
    val seen = new java.util.LinkedHashSet[UTF8String]()
    if (n == 1) {
      var i = 0
      while (i < toks.length) { seen.add(UTF8String.fromString(toks(i))); i += 1 }
    } else if (toks.length >= n) {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(UTF8String.fromString(sb.toString))
        i += 1
      }
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }
}

/** Native POSITIONAL word n-gram XXH64 hashes — the window kernel for
  * duplicated-span removal ([[graft.ops.Dedup.dedupSpans]]): one 64-bit
  * hash per window start, in order, NON-distinct (positions matter there,
  * which is why [[WordNGrams]] — distinct, first-occurrence order — cannot
  * serve).
  *
  * Value-compatible BY CONSTRUCTION with the expression composition it
  * replaces, `transform(sequence(0, nTok-n), i -> xxhash64(array_join(
  * slice(tokens, i+1, n), " ")))` where `tokens =
  * regexp_extract_all(text, "[^ \t\n\f\r]+")`: tokens are maximal runs of
  * non-{space, \t, \n, \f, \r} characters (the engine's RE2-exact
  * whitespace class — never empty, unlike [[WordNGrams]]' split
  * semantics), each window is its tokens joined with single spaces, and
  * the hash is Spark's `xxhash64` (XXH64 over the UTF-8 bytes, seed 42).
  * The HOF form evaluates interpreted per window — a Column-tree dispatch
  * plus a sliced array and a joined string allocation per position; this
  * walks the text once inside whole-stage codegen. Fewer than n tokens →
  * empty array; NULL → NULL. */
case class WordNGramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"word_ngram_hashes requires n >= 1, got $n")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"word_ngram_hashes requires a string input, got $other")
  }

  override protected def nullSafeEval(s: Any): Any =
    WordNGramHashes.compute(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordNGramHashes.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNGramHashes {
  // the ONE engine whitespace contract — must match the regexp rebuild
  // path in Dedup.dedupSpans exactly (same tokens hashed and filtered)
  private def isDelim(c: Char): Boolean = EngineWhitespace.isWs(c)

  /** Shared by the interpreted and generated paths. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val raw = s.toString
    // maximal runs of non-delimiter chars — RE2/Java-identical for this
    // ASCII delimiter set, and never-empty tokens (regexp_extract_all
    // semantics, NOT split's)
    val toks = new java.util.ArrayList[String]()
    var i = 0
    val len = raw.length
    while (i < len) {
      while (i < len && isDelim(raw.charAt(i))) i += 1
      val start = i
      while (i < len && !isDelim(raw.charAt(i))) i += 1
      if (i > start) toks.add(raw.substring(start, i))
    }
    val nt = toks.size
    if (nt < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nt - n + 1)
    val sb = new java.lang.StringBuilder
    var p = 0
    while (p <= nt - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks.get(p + j))
        j += 1
      }
      val win = UTF8String.fromString(sb.toString)
      out(p) = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(win, StringType, 42L)
      p += 1
    }
    new GenericArrayData(out)
  }
}

/** Native DSIR importance score — the sum, over a document's hashed word
  * 1- and 2-gram OCCURRENCES, of a per-bucket log-probability-ratio table
  * (the scoring kernel of [[graft.ops.Dsir]]; Xie et al. 2023,
  * arXiv:2302.03169 §3: importance weight of hashed n-gram features).
  *
  * Value-compatible BY CONSTRUCTION with the expression composition
  * `aggregate(concat(word_ngram_hashes(text, 1), word_ngram_hashes(text,
  * 2)), 0.0D, (acc, h) -> acc + logRatio[pmod(h, m)])` where
  * `m = logRatio.length`: tokens are maximal [[EngineWhitespace.TokenRe]]
  * runs, each window is its tokens joined with single spaces, hashes are
  * Spark's `xxhash64` (XXH64 over UTF-8 bytes, seed 42), and the doubles
  * accumulate SEQUENTIALLY in that same order — every unigram in position
  * order, then every bigram. Floating-point addition order is part of the
  * kernel == HOF contract (pinned in DsirSpec); the DuckDB oracle's
  * per-doc score is an UNORDERED SQL sum, so the cross-engine match is
  * tolerance-by-rounding through `round(_, 6)` — ulp-level fold-order
  * differences vanish in the rounding except on measure-zero boundaries,
  * the same footing as every other float-producing oracle (q59, q104).
  * The HOF form interprets its lambda per gram
  * (`ArrayAggregate` is CodegenFallback) and allocates two hash arrays
  * plus their concat per row; this walks the text once inside whole-stage
  * codegen with no intermediate arrays. Fewer than 2 tokens → no bigram
  * terms; empty or all-whitespace text → 0.0; NULL → NULL. */
case class HashedGramScore(child: Expression, logRatio: Seq[Double]) extends UnaryExpression {
  require(logRatio.nonEmpty, "hashed_gram_score requires a non-empty logRatio table")

  @transient private lazy val lrArr: Array[Double] = logRatio.toArray

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"hashed_gram_score requires a string input, got $other")
  }

  override protected def nullSafeEval(s: Any): Any =
    HashedGramScore.compute(s.asInstanceOf[UTF8String], lrArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.addReferenceObj("logRatio", lrArr, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashedGramScore.compute($c, $arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashedGramScore {
  private def bucketOf(gram: String, m: Int): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
      .hash(UTF8String.fromString(gram), StringType, 42L)
    (((h % m) + m) % m).toInt
  }

  /** Shared by the interpreted and generated paths. */
  def compute(s: UTF8String, lr: Array[Double]): Double = {
    val raw = s.toString
    val toks = new java.util.ArrayList[String]()
    var i = 0
    val len = raw.length
    while (i < len) {
      while (i < len && EngineWhitespace.isWs(raw.charAt(i))) i += 1
      val start = i
      while (i < len && !EngineWhitespace.isWs(raw.charAt(i))) i += 1
      if (i > start) toks.add(raw.substring(start, i))
    }
    val nt = toks.size
    val m = lr.length
    var acc = 0.0
    // all unigrams in position order, then all bigrams — the exact fold
    // order of aggregate(concat(h1, h2), ...), so the fp sum is identical
    var p = 0
    while (p < nt) { acc += lr(bucketOf(toks.get(p), m)); p += 1 }
    val sb = new java.lang.StringBuilder
    p = 0
    while (p <= nt - 2) {
      sb.setLength(0)
      sb.append(toks.get(p)).append(' ').append(toks.get(p + 1))
      acc += lr(bucketOf(sb.toString, m))
      p += 1
    }
    acc
  }

  /** The mean-normalized variant: `compute / (2·tokens − 1)` (the gram
    * count), 0.0 for a zero-gram document — the
    * [[graft.ops.QualityClassifier]] margin term, one byte pass with no
    * intermediate arrays. Bit-identical to `hashedGramScore(t, w) / n`
    * composed from the separate kernels: identical fold order, identical
    * final division operands. */
  def computeMean(s: UTF8String, lr: Array[Double]): Double = {
    val raw = s.toString
    val toks = new java.util.ArrayList[String]()
    var i = 0
    val len = raw.length
    while (i < len) {
      while (i < len && EngineWhitespace.isWs(raw.charAt(i))) i += 1
      val start = i
      while (i < len && !EngineWhitespace.isWs(raw.charAt(i))) i += 1
      if (i > start) toks.add(raw.substring(start, i))
    }
    val nt = toks.size
    if (nt == 0) return 0.0
    val m = lr.length
    var acc = 0.0
    var p = 0
    while (p < nt) { acc += lr(bucketOf(toks.get(p), m)); p += 1 }
    val sb = new java.lang.StringBuilder
    p = 0
    while (p <= nt - 2) {
      sb.setLength(0)
      sb.append(toks.get(p)).append(' ').append(toks.get(p + 1))
      acc += lr(bucketOf(sb.toString, m))
      p += 1
    }
    acc / (2 * nt - 1).toDouble
  }
}

/** `hashed_gram_mean_score(text)` — [[HashedGramScore]]'s sum divided by
  * the document's gram count (`2·words − 1`), 0.0 for a zero-gram
  * document, NULL → NULL. One byte pass; the fused form of
  * `hashed_gram_score(t) / size(word_ngram_hashes(t, 1))`-style
  * compositions, which materialize the unigram hash array (and re-walk
  * the text) once per `size` reference. Fp contract: the division's
  * operands are exactly the composed form's, so values are bit-identical
  * (pinned in QualityClassifierSpec). */
case class HashedGramMeanScore(child: Expression, weights: Seq[Double]) extends UnaryExpression {
  require(weights.nonEmpty, "hashed_gram_mean_score requires a non-empty weight table")

  @transient private lazy val wArr: Array[Double] = weights.toArray

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"hashed_gram_mean_score requires a string input, got $other")
  }

  override protected def nullSafeEval(s: Any): Any =
    HashedGramScore.computeMean(s.asInstanceOf[UTF8String], wArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.addReferenceObj("weights", wArr, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashedGramScore.computeMean($c, $arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StringFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** `char_ngrams(text, n)` as a Column. */
  def charNGrams(text: Column, n: Int): Column =
    ColumnBridge.column(CharNGrams(ColumnBridge.expression(text), n))

  /** `word_ngrams(text, n)` as a Column — distinct whitespace-token
    * n-gram shingles. */
  def wordNGrams(text: Column, n: Int): Column =
    ColumnBridge.column(WordNGrams(ColumnBridge.expression(text), n))

  /** `word_ngram_hashes(text, n)` as a Column — positional window XXH64
    * hashes (one per window start, non-distinct). */
  def wordNGramHashes(text: Column, n: Int): Column =
    ColumnBridge.column(WordNGramHashes(ColumnBridge.expression(text), n))

  /** `hashed_gram_score(text)` as a Column — the DSIR importance
    * log-weight of the document under a fitted per-bucket log-ratio table
    * (see [[graft.ops.Dsir]]). */
  def hashedGramScore(text: Column, logRatio: Seq[Double]): Column =
    ColumnBridge.column(HashedGramScore(ColumnBridge.expression(text), logRatio))

  /** `hashed_gram_mean_score(text)` as a Column — the gram-count-mean of
    * the weight sum (see [[graft.ops.QualityClassifier]]). */
  def hashedGramMeanScore(text: Column, weights: Seq[Double]): Column =
    ColumnBridge.column(HashedGramMeanScore(ColumnBridge.expression(text), weights))
}
