package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact byte-level BPE token counting (Sennrich et al. 2016; the GPT-2
  * tokenizer construction, Radford et al. 2019) — replaces the
  * pre-tokenizer-only approximation ([[graft.ops.TextAnalysis
  * .bpeTokenCount]]) wherever a token budget must be exact in TRAINER
  * tokens: sequence packing capacities, corpus token budgets, mixture
  * weights.
  *
  * '''Vocabulary''': a vendored merges file in the published `merges.txt`
  * format — one space-separated symbol pair per line, rank = line order,
  * symbols over the GPT-2 byte-to-unicode alphabet (the printable-proxy
  * encoding that makes raw bytes file-safe). [[BpeVocab.fromFile]] /
  * [[BpeVocab.fromLines]] parse it on the DRIVER (the [[PslRules]]
  * loader pattern); the decoded rank table ships to executors inside the
  * expression as a reference object. [[BpeVocab.Builtin]] is a small
  * demo vocabulary trained by `tools/train_bpe.py` (deterministic,
  * re-runnable) — tests and fixtures only; vendor your trainer's real
  * merges for production budgets.
  *
  * '''Pre-tokenizer''' (the documented simplification of GPT-2's): the
  * ordered-alternation regex `' ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'`
  * — optional single leading space glued to a letter/number/other run,
  * else a whitespace run — implemented as a codepoint scanner (no regex
  * engine in the hot path). Deviations from GPT-2's exact pattern, by
  * design: no English-contraction alternates (`'s`, `'t`, …) and no
  * trailing-space lookahead `\s+(?!\S)` (RE2-based oracle engines cannot
  * express lookahead; both engines implement THIS spec instead).
  * `\s` is ASCII whitespace (Java and RE2 default); letter/number are
  * Unicode categories L and N (Nd+Nl+No).
  *
  * '''Merge loop''': per pre-token, UTF-8 bytes become single-byte
  * symbols and the lowest-rank adjacent pair merges (all occurrences,
  * left to right, overlaps skipped) until no ranked pair remains — the
  * reference algorithm. Equivalent formulation used by the SQL oracle:
  * applying every merge once in ascending rank order gives the SAME
  * result, because a merge's constituent symbols are always created by
  * strictly earlier merges, so applying rank r can never surface a
  * not-yet-applied pair of rank < r. (BpeSpec pins the two against each
  * other.)
  *
  * Scale shape: counting is a per-row codegen'd kernel — zero shuffle,
  * zero joins, the vocabulary broadcast once per executor; exactly the
  * [[HashedGramScore]] deployment shape.
  */
final class BpeVocab private (
    private val ranks: java.util.HashMap[String, Integer],
    val nMerges: Int) extends Serializable {

  /** Rank of the (left, right) symbol pair, or -1. Symbols are raw-byte
    * strings (one char per byte); the key is length-prefixed so
    * (`"ab"`, `"c"`) and (`"a"`, `"bc"`) cannot collide. */
  def rankOf(left: String, right: String): Int = {
    val r = ranks.get(BpeVocab.key(left, right))
    if (r == null) -1 else r.intValue()
  }

  /** Merge pairs in rank order, as raw-byte strings — the oracle-side
    * view (and the [[BpeSpec]] rank-order reference implementation). */
  def mergesInOrder: IndexedSeq[(String, String)] =
    scala.collection.immutable.ArraySeq.unsafeWrapArray(pairArr)

  @transient private lazy val pairArr: Array[(String, String)] = {
    val out = new Array[(String, String)](nMerges)
    ranks.forEach { (k, v) =>
      val cut = k.indexOf(':')
      val ll = k.substring(0, cut).toInt
      out(v.intValue()) = (k.substring(cut + 1, cut + 1 + ll), k.substring(cut + 1 + ll))
    }
    out
  }

  /** The pair at `rank` (0-based). */
  def mergePair(rank: Int): (String, String) = pairArr(rank)

  /** Token id of a FINAL symbol under the derived-id convention of
    * from-scratch byte-level BPE trainers: single-byte symbols get their
    * byte value (ids 0–255), a merged symbol gets `256 + rank` of the
    * merge that first produces its string (trainer invariant: each merge
    * result is a new symbol, so ranks and result strings are 1:1 in real
    * vocabs; a hand-written duplicate result shares the earliest id —
    * same string, same token). Deterministic from the merges file alone —
    * no second vocab.json needed, and SQL-oracle-able. */
  def idOf(sym: String): Int =
    if (sym.length == 1) sym.charAt(0).toInt
    else resultIds.get(sym).intValue() // every multi-byte symbol the merge
                                       // loop can build has a producer

  @transient private lazy val resultIds: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](nMerges * 2)
    var r = 0
    while (r < nMerges) {
      val (l, rt) = pairArr(r)
      m.putIfAbsent(l + rt, Integer.valueOf(256 + r))
      r += 1
    }
    m
  }

  /** 256 byte symbols + one id per merge. */
  def vocabSize: Int = 256 + nMerges

  /** Raw-byte symbol string of a token id — the decode table: ids 0–255
    * are their byte, id 256+r is merge r's result string. Defined for
    * EVERY id below [[vocabSize]] (an id whose rank was result-aliased
    * never appears in [[idOf]] output, but decoding it still yields that
    * rank's — identical — string). Throws on an out-of-range id: silent
    * truncation would corrupt reassembled text downstream. */
  def symbolOf(id: Int): String = {
    if (id < 0 || id >= vocabSize)
      throw new IllegalArgumentException(
        s"bpe_decode: token id $id outside [0, $vocabSize)")
    if (id < 256) String.valueOf(id.toChar)
    else { val (l, r) = mergePair(id - 256); l + r }
  }
}

object BpeVocab {
  private def key(l: String, r: String): String = l.length + ":" + l + r

  /** GPT-2's byte-to-unicode table: printable latin-1 bytes map to
    * themselves, the rest to 256+i — published construction. */
  private[functions] val ByteToUnicode: Array[Char] = {
    val direct = (('!' to '~') ++ ('¡' to '¬') ++ ('®' to 'ÿ')).map(_.toInt).toSet
    val out = new Array[Char](256)
    var shift = 0
    (0 until 256).foreach { b =>
      if (direct(b)) out(b) = b.toChar
      else { out(b) = (256 + shift).toChar; shift += 1 }
    }
    out
  }
  private[functions] val UnicodeToByte: Map[Char, Byte] =
    ByteToUnicode.zipWithIndex.map { case (c, b) => c -> b.toByte }.toMap

  /** Decode one merges.txt symbol (byte-unicode alphabet) to a raw-byte
    * string (one char per byte value 0–255). */
  private def decodeSymbol(s: String, line: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    s.foreach { c =>
      val b = UnicodeToByte.getOrElse(c,
        throw new IllegalArgumentException(
          s"merges line '$line': symbol char '\\u${c.toInt.toHexString}' is not in the GPT-2 byte alphabet"))
      sb.append((b & 0xff).toChar)
    }
    sb.toString
  }

  /** Parse the published merges.txt format: `#`-prefixed header/comment
    * lines and blanks ignored, each remaining line a space-separated
    * symbol pair, rank = order of appearance. */
  def fromLines(lines: IterableOnce[String]): BpeVocab = {
    val ranks = new java.util.HashMap[String, Integer]()
    var rank = 0
    lines.iterator.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("#")) {
        line.split(" ", -1) match {
          case Array(l, r) if l.nonEmpty && r.nonEmpty =>
            val k = key(decodeSymbol(l, line), decodeSymbol(r, line))
            require(!ranks.containsKey(k), s"duplicate merge pair '$line'")
            ranks.put(k, Integer.valueOf(rank))
            rank += 1
          case _ =>
            throw new IllegalArgumentException(
              s"merges line '$line' is not a space-separated symbol pair")
        }
      }
    }
    require(rank > 0, "merges file contains no merge pairs")
    new BpeVocab(ranks, rank)
  }

  /** Load a vendored merges file from the DRIVER's filesystem. */
  def fromFile(path: String): BpeVocab = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try fromLines(src.getLines()) finally src.close()
  }

  /** Demo vocabulary (96 merges) trained by `tools/train_bpe.py` on its
    * fixed English corpus — deterministic, regenerate with the script.
    * Tests and fixture corpora only. */
  lazy val Builtin: BpeVocab = fromLines(Seq(
    "Ġ t", "h e", "Ġt he", "a n", "i n", "Ġ d",
    "a t", "Ġ o", "r e", "Ġ .", "an d", "e r",
    "Ġ and", "in g", "Ġ p", "a r", "e d", "e s",
    "l i", "r o", "t s", "u m", "v er", "Ġ a",
    "Ġd o", "Ġo ver", "Ġ s", "Ġ w", "c at", "e n",
    "i l", "n e", "t ed", "Ġ b", "Ġ f", "Ġ m",
    "a in", "ain ing", "at a", "cat e", "c o", "c um",
    "cum en", "cumen ts", "e i", "ei g", "eig h", "eigh ted",
    "e l", "e x", "h il", "h o", "i o", "io n",
    "i r", "l e", "li cate", "p licate", "p s", "q u",
    "s e", "u n", "u plicate", "Ġa re", "Ġd ata", "Ġdo cuments",
    "Ġdo g", "Ġ in", "Ġ l", "Ġ ne", "Ġo n", "Ġ qu",
    "Ġt ex", "Ġt o", "Ġ v", "Ġw eighted", "0 2", "02 4",
    "1 2", "12 3", "2 024", "a g", "ag e", "a li",
    "ali t", "alit y", "a l", "al u", "alu es", "a m",
    "am ing", "an c", "anc e", "an g", "ang u", "angu age"))
}

/** `bpe_count(text)` — exact BPE token count under a vendored merges
  * vocabulary, as a native codegen'd expression. NULL in → NULL out;
  * empty string → 0. */
case class BpeCount(child: Expression, vocab: BpeVocab) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"bpe_count requires a string input, got $other")
  }

  override protected def nullSafeEval(s: Any): Any =
    BpeCount.compute(s.asInstanceOf[UTF8String], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = ctx.addReferenceObj("bpeVocab", vocab, classOf[BpeVocab].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeCount.compute($c, $v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeCount {

  private def isWs(cp: Int): Boolean = // regex \s (ASCII, Java/RE2 default)
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0b || cp == '\f' || cp == '\r'
  private def isL(cp: Int): Boolean = Character.isLetter(cp)
  private def isN(cp: Int): Boolean = { // \p{N} = Nd + Nl + No
    val t = Character.getType(cp)
    t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
      t == Character.OTHER_NUMBER
  }
  private def isOther(cp: Int): Boolean = !isWs(cp) && !isL(cp) && !isN(cp)

  /** Shared by the interpreted and generated paths. */
  def compute(s: UTF8String, vocab: BpeVocab): Long = {
    var count = 0L
    forEachPreToken(s, tok => count += countToken(tok, vocab))
    count
  }

  /** Run `f` over every pre-token of `s` in order — the ordered-alternation
    * pre-tokenizer shared by [[compute]] and [[BpeEncode]]. */
  private[functions] def forEachPreToken(s: UTF8String, f: String => Unit): Unit = {
    val raw = s.toString
    val len = raw.length
    var i = 0
    while (i < len) {
      // the ordered-alternation pre-tokenizer (see class scaladoc):
      // ' ?L+' | ' ?N+' | ' ?other+' | '\s+', first match wins
      val start = i
      val cp0 = raw.codePointAt(i)
      var cls = -1 // 0=L 1=N 2=other, -1 = whitespace-run fallback
      var j = i // start of the run body (past the optional leading space)
      if (cp0 == ' ' && i + 1 < len) {
        val cp1 = raw.codePointAt(i + 1)
        if (isL(cp1)) { cls = 0; j = i + 1 }
        else if (isN(cp1)) { cls = 1; j = i + 1 }
        else if (isOther(cp1)) { cls = 2; j = i + 1 }
      }
      if (cls < 0 && !isWs(cp0)) {
        cls = if (isL(cp0)) 0 else if (isN(cp0)) 1 else 2
        j = i
      }
      var k = j
      if (cls >= 0) {
        var go = true
        while (go && k < len) {
          val cp = raw.codePointAt(k)
          val in = cls match {
            case 0 => isL(cp)
            case 1 => isN(cp)
            case _ => isOther(cp)
          }
          if (in) k += Character.charCount(cp) else go = false
        }
      } else {
        // whitespace run (all ws chars are single-unit ASCII)
        while (k < len && isWs(raw.charAt(k).toInt)) k += 1
      }
      f(raw.substring(start, k))
      i = k
    }
  }

  /** Token count of ONE pre-token: bytes → single-byte symbols → greedy
    * lowest-rank merges until none applies. */
  private def countToken(tok: String, vocab: BpeVocab): Long =
    mergeToken(tok, vocab).size().toLong

  /** The final symbol list of ONE pre-token under the reference merge
    * loop — shared by [[countToken]] and [[BpeEncode]]'s id emission. */
  private[functions] def mergeToken(tok: String, vocab: BpeVocab): java.util.ArrayList[String] = {
    val bytes = tok.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = bytes.length
    val syms = new java.util.ArrayList[String](n)
    var i = 0
    while (i < n) { syms.add(String.valueOf((bytes(i) & 0xff).toChar)); i += 1 }
    if (n <= 1) return syms
    var done = false
    while (!done && syms.size() >= 2) {
      // lowest-rank adjacent pair
      var best = Int.MaxValue
      var p = 0
      while (p < syms.size() - 1) {
        val r = vocab.rankOf(syms.get(p), syms.get(p + 1))
        if (r >= 0 && r < best) best = r
        p += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        // merge all occurrences left to right, overlaps skipped
        val (l, r) = vocab.mergePair(best)
        var q = 0
        while (q < syms.size() - 1) {
          if (syms.get(q) == l && syms.get(q + 1) == r) {
            syms.set(q, l + r)
            syms.remove(q + 1)
          }
          q += 1
        }
      }
    }
    syms
  }
}

/** `bpe_encode(text)` — the full token-ID sequence under a vendored merges
  * vocabulary ([[BpeVocab.idOf]] derived ids: bytes 0–255, then 256+rank).
  * The artifact a trainer actually consumes — [[BpeCount]] is `size` of
  * this. Same pre-tokenizer and merge loop, same deployment shape: a
  * per-row codegen'd kernel, zero shuffle, vocabulary broadcast once per
  * executor inside the expression. NULL in → NULL; empty string → empty
  * array. */
case class BpeEncode(child: Expression, vocab: BpeVocab) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"bpe_encode requires a string input, got $other")
  }

  override protected def nullSafeEval(s: Any): Any =
    BpeEncode.compute(s.asInstanceOf[UTF8String], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = ctx.addReferenceObj("bpeVocab", vocab, classOf[BpeVocab].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeEncode.compute($c, $v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeEncode {
  /** Shared by the interpreted and generated paths. */
  def compute(s: UTF8String, vocab: BpeVocab):
      org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val ids = new java.util.ArrayList[Integer]()
    BpeCount.forEachPreToken(s, { tok =>
      val syms = BpeCount.mergeToken(tok, vocab)
      var i = 0
      while (i < syms.size()) { ids.add(Integer.valueOf(vocab.idOf(syms.get(i)))); i += 1 }
    })
    val out = new Array[Int](ids.size())
    var i = 0
    while (i < out.length) { out(i) = ids.get(i).intValue(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `bpe_decode(ids)` — token-id array back to text under the same
  * vocabulary: per id the raw-byte symbol string ([[BpeVocab.symbolOf]]),
  * concatenated and read as UTF-8. The inspection/debugging half of the
  * tokenizer surface: `bpe_decode(bpe_encode(text)) = text` for any
  * input (byte-level BPE is lossless by construction — pinned by the
  * q130 identity oracle and BpeSpec). NULL in → NULL; empty array → ''.
  * Out-of-range ids throw; a NULL *element* also throws (silent
  * truncation or a NUL byte would corrupt reassembled text). */
case class BpeDecode(child: Expression, vocab: BpeVocab) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.IntegerType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"bpe_decode requires array<int>, got $other")
  }

  override protected def nullSafeEval(a: Any): Any =
    BpeDecode.compute(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = ctx.addReferenceObj("bpeVocab", vocab, classOf[BpeVocab].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeDecode.compute($c, $v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeDecode {
  /** Shared by the interpreted and generated paths. */
  def compute(ids: org.apache.spark.sql.catalyst.util.ArrayData,
      vocab: BpeVocab): UTF8String = {
    val n = ids.numElements()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      if (ids.isNullAt(i)) {
        throw new IllegalArgumentException(
          s"bpe_decode: NULL token id at position $i (of $n)")
      }
      sb.append(vocab.symbolOf(ids.getInt(i))); i += 1
    }
    val s = sb.toString
    val bytes = new Array[Byte](s.length)
    var j = 0
    while (j < bytes.length) { bytes(j) = s.charAt(j).toByte; j += 1 }
    UTF8String.fromBytes(bytes)
  }
}

object BpeFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Exact BPE token count of `text` under `vocab` — a zero-shuffle
    * codegen'd projection. */
  def bpeCount(text: Column, vocab: BpeVocab): Column =
    ColumnBridge.column(BpeCount(ColumnBridge.expression(text), vocab))

  /** Exact BPE token-ID sequence of `text` under `vocab` (`array<int>`). */
  def bpeEncode(text: Column, vocab: BpeVocab): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(text), vocab))

  /** Token-id array back to text (`bpe_decode(bpe_encode(t)) = t`). */
  def bpeDecode(ids: Column, vocab: BpeVocab): Column =
    ColumnBridge.column(BpeDecode(ColumnBridge.expression(ids), vocab))
}
