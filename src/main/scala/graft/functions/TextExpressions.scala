package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** THE engine whitespace contract — one definition for every kernel and
  * regex that must agree on tokenization: whitespace is exactly
  * `[ \t\n\f\r]` (RE2's `\s`). Java's `\s` additionally matches U+000B,
  * so hand-spelling the class anywhere risks silently desynchronizing a
  * native kernel from a regexp path that must hash/filter the SAME
  * tokens (the q98 lesson). Consumers: [[GopherSignals]] (word/line
  * counters), [[WordNGramHashes]] (span-dedup window kernel),
  * [[graft.ops.Dedup.dedupSpans]] (rebuild regex), and every oracle that
  * transcribes [[TokenRe]] verbatim. */
object EngineWhitespace {
  /** Regex (Java ∩ RE2) matching one maximal token: a run of
    * non-whitespace characters under this contract. */
  val TokenRe: String = "[^ \\t\\n\\f\\r]+"

  @inline def isWs(ch: Char): Boolean =
    ch == ' ' || ch == '\t' || ch == '\n' || ch == '\f' || ch == '\r'
}

/** Native single-scan computation of every Gopher-quality raw counter
  * (see [[graft.ops.TextAnalysis.gopherQuality]]). The regexp formulation
  * needed ~12 independent passes over each document (two of them with
  * lookaround patterns Java's engine evaluates with per-position
  * backtracking, plus one `rlike` per required stopword); this expression
  * produces the identical nine counters in ONE forward character scan, as a
  * codegen'd call inside whole-stage codegen — no UDF boundary, no regex
  * engine, no re-reading the text.
  *
  * The counter DEFINITIONS are contracts shared with the DuckDB oracle —
  * every boundary rule below mirrors an RE2-expressible formulation:
  *
  *  - whitespace is exactly `[ \t\n\f\r]` (RE2's `\s`; Java's `\s` would
  *    additionally match U+000B — see the GWs note in TextAnalysis);
  *  - a word is a MAXIMAL run of non-whitespace code points (RE2 `\S+`);
  *    an empty-or-all-whitespace document has zero words;
  *  - an alpha word is a run containing at least one `[A-Za-z]`;
  *  - stopword presence is exact, case-sensitive run equality (the
  *    whole-token contract: "the." is NOT a hit for "the");
  *  - `n_nonws_chars` counts non-whitespace CODE POINTS (what Spark's
  *    `length` and DuckDB's `length` both count), not UTF-16 chars;
  *  - ellipsis symbols count non-overlapping `(\.\.\.|…)` matches scanned
  *    left-to-right ("...." counts once, consuming three dots);
  *  - lines are `\n`-separated with trailing empties kept (split limit -1):
  *    `n_lines = count('\n') + 1`;
  *  - a bullet line matches `^[ \t]*[-*•]`, an ellipsis line ends with an
  *    ellipsis followed only by `[ \t]*`.
  */
case class GopherSignals(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_nonws_chars", LongType, nullable = false),
    StructField("n_hash", LongType, nullable = false),
    StructField("n_ellipsis_sym", LongType, nullable = false),
    StructField("n_lines", LongType, nullable = false),
    StructField("n_bullet_lines", LongType, nullable = false),
    StructField("n_ellipsis_lines", LongType, nullable = false),
    StructField("n_alpha_words", LongType, nullable = false),
    StructField("n_stopwords", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"gopher_signals requires string, got $other")
  }

  override protected def nullSafeEval(a: Any): Any =
    GopherSignals.scan(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("gopher")
      s"""
         |InternalRow $r = graft.functions.GopherSignals.scan($c);
         |${ev.value} = $r;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GopherSignals {

  /** The required-stopword list (mirrors TextAnalysis.GopherStopwords; kept
    * as chars here so the scan compares without allocating per-token
    * strings). Longest entry is 4 chars — runs longer than that can skip
    * the comparison entirely. */
  private val Stopwords: Array[String] =
    Array("the", "be", "to", "of", "and", "that", "have", "with")
  private val MaxStopLen = Stopwords.map(_.length).max

  private def isWs(ch: Char): Boolean = EngineWhitespace.isWs(ch)

  /** One forward scan producing the nine counters; never returns null (null
    * input is handled by the nullSafeEval/nullSafeCodeGen wrapper). */
  def scan(u: UTF8String): InternalRow = {
    val s = u.toString
    val n = s.length
    var words = 0L
    var nonWsChars = 0L
    var hash = 0L
    var ellipsisSym = 0L
    var lines = 1L
    var bulletLines = 0L
    var ellipsisLines = 0L
    var alphaWords = 0L
    var stopMask = 0 // bit per Stopwords entry seen as an exact token

    // per-run state (a run = maximal non-whitespace stretch)
    var runStart = -1 // char index, -1 when not inside a run
    var runHasAlpha = false
    // per-line state: index just past the last char that is not ' '/'\t'
    // (for the trailing-ellipsis check), and the line's start index (for
    // the leading-bullet check, done eagerly at the first non-[ \t] char)
    var lineStart = 0
    var lineEndNonTs = 0 // absolute index just past last non-[ \t] char of line
    var lineLeadingTs = true // still inside the line's leading [ \t]* prefix
    // ellipsis-symbol consumption: next char index eligible to START a match
    var ellipsisNext = 0

    def endRun(endExcl: Int): Unit = {
      if (runStart >= 0) {
        words += 1
        if (runHasAlpha) alphaWords += 1
        val len = endExcl - runStart
        if (len <= MaxStopLen && stopMask != 0xff) {
          var k = 0
          while (k < Stopwords.length) {
            val w = Stopwords(k)
            if ((stopMask & (1 << k)) == 0 && w.length == len &&
              s.regionMatches(runStart, w, 0, len)) stopMask |= 1 << k
            k += 1
          }
        }
        runStart = -1
        runHasAlpha = false
      }
    }

    def endLine(endExcl: Int): Unit = {
      // trailing-ellipsis: last non-[ \t] char must close `…` or `...`
      val j = lineEndNonTs
      if (j > lineStart) {
        if (s.charAt(j - 1) == '…') ellipsisLines += 1
        else if (j - 3 >= lineStart && s.charAt(j - 1) == '.' &&
          s.charAt(j - 2) == '.' && s.charAt(j - 3) == '.') ellipsisLines += 1
      }
      lineStart = endExcl
      lineEndNonTs = endExcl
      lineLeadingTs = true
    }

    var i = 0
    while (i < n) {
      val ch = s.charAt(i)
      // one supplementary code point = two UTF-16 chars; step over the low
      // surrogate after processing (ws/alpha/ellipsis/bullet classes are
      // all BMP, so the pair is plain run content counted once)
      val step =
        if (Character.isHighSurrogate(ch) && i + 1 < n &&
          Character.isLowSurrogate(s.charAt(i + 1))) 2 else 1
      if (isWs(ch)) endRun(i)
      else {
        if (runStart < 0) { runStart = i; runHasAlpha = false }
        if ((ch >= 'A' && ch <= 'Z') || (ch >= 'a' && ch <= 'z')) runHasAlpha = true
        nonWsChars += 1
      }
      if (ch == '#') hash += 1
      // non-overlapping (\.\.\.|…) count: a three-dot match consumes
      // through i+2, blocking overlapping starts
      if (i >= ellipsisNext) {
        if (ch == '.' && i + 2 < n && s.charAt(i + 1) == '.' && s.charAt(i + 2) == '.') {
          ellipsisSym += 1; ellipsisNext = i + 3
        } else if (ch == '…') { ellipsisSym += 1; ellipsisNext = i + 1 }
      }
      if (ch == '\n') {
        endLine(i + 1)
        lines += 1
      } else {
        if (ch != ' ' && ch != '\t') {
          if (lineLeadingTs) {
            if (ch == '-' || ch == '*' || ch == '•') bulletLines += 1
            lineLeadingTs = false
          }
          lineEndNonTs = i + step
        }
      }
      i += step
    }
    endRun(n)
    endLine(n)

    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](words, nonWsChars, hash, ellipsisSym, lines, bulletLines,
        ellipsisLines, alphaWords, Integer.bitCount(stopMask).toLong))
  }
}

object TextFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** `gopher_signals(text)` — struct of the nine raw Gopher-quality
    * counters computed in a single character scan; NULL for NULL text. */
  def gopherSignals(text: Column): Column =
    ColumnBridge.column(GopherSignals(ColumnBridge.expression(text)))
}
