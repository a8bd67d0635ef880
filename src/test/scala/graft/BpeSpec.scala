package graft

import org.apache.spark.sql.functions._

import graft.functions.{BpeFunctions, BpeVocab}

/** Exact BPE token counting: the native kernel vs an independent
  * rank-order reference implementation (the equivalence the oracle's SQL
  * recursion relies on), merges.txt parsing, pre-tokenizer edges, and
  * the NULL/empty contracts. */
class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  // ---- independent reference: apply merges once each, in rank order ----

  private def prepat = """ ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+""".r

  private def refCount(text: String, vocab: BpeVocab): Long = {
    val merges = vocab.mergesInOrder
    prepat.findAllIn(text).map { tok =>
      var syms: Vector[String] =
        tok.getBytes("UTF-8").toVector.map(b => String.valueOf((b & 0xff).toChar))
      merges.foreach { case (l, r) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms.length.toLong
    }.sum
  }

  private def kernelCount(text: String, vocab: BpeVocab): Long =
    Seq(Tuple1(text)).toDF("t")
      .select(BpeFunctions.bpeCount(col("t"), vocab).as("n"))
      .head.getLong(0)

  test("kernel ≡ rank-order reference on fixture texts") {
    val v = BpeVocab.Builtin
    val cases = Seq(
      "the quick brown fox jumps over the lazy dog .",
      "the theme of the data is weighted documents",
      "numbers 123 and 2024 , punctuation ! ? ; :",
      "    leading spaces", "trailing spaces    ",
      "tabs\tand\nnewlines\r\nmixed   runs",
      "ünïcödé lëttérs are bytes überall",
      "中文字符 also 混合 text", // multi-byte letters
      "a", " ", "", ".", "!!!", "...---...",
      "x1y2z3", "CamelCaseWords and UPPER lower")
    cases.foreach { t =>
      assert(kernelCount(t, v) == refCount(t, v), s"mismatch on '$t'")
    }
  }

  test("merged counts are exact on hand-checked examples") {
    val v = BpeVocab.fromLines(Seq(
      "#version: demo",
      "t h", "th e", "Ġ the")) // Ġ = byte 0x20 in the GPT-2 alphabet
    // "the the" → pre-tokens ["the", " the"]:
    //   "the": t+h → th; th+e → the          = 1 token
    //   " the": space stays (no ' t' merge); t h e → the; ' '+the → ' the' = 1
    assert(kernelCount("the the", v) == 2L)
    // "tthe" → t, t+h→th… : [t, th, e] → th+e → [t, the] = 2
    assert(kernelCount("tthe", v) == 2L)
    // unknown text falls back to one token per byte (plus pre-token splits)
    assert(kernelCount("xyz", v) == 3L)
    assert(kernelCount("xyz 12", v) == 3L + 3L) // " 12" = space+1+2 unmerged
  }

  // ---- encode: full id sequences --------------------------------------

  /** Rank-order reference EMITTING ids — the SQL oracle's formulation of
    * [[graft.functions.BpeEncode]]. */
  private def refEncode(text: String, vocab: BpeVocab): Vector[Int] = {
    val merges = vocab.mergesInOrder
    prepat.findAllIn(text).flatMap { tok =>
      var syms: Vector[String] =
        tok.getBytes("UTF-8").toVector.map(b => String.valueOf((b & 0xff).toChar))
      merges.foreach { case (l, r) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms.map(vocab.idOf)
    }.toVector
  }

  private def kernelEncode(text: String, vocab: BpeVocab): Vector[Int] =
    Seq(Tuple1(text)).toDF("t")
      .select(BpeFunctions.bpeEncode(col("t"), vocab).as("ids"))
      .head.getSeq[Int](0).toVector

  test("encode kernel ≡ rank-order reference; size(encode) == count") {
    val v = BpeVocab.Builtin
    val cases = Seq(
      "the quick brown fox jumps over the lazy dog .",
      "the theme of the data is weighted documents",
      "numbers 123 and 2024 , punctuation ! ? ; :",
      "ünïcödé lëttérs are bytes überall",
      "中文字符 also 混合 text",
      "a", " ", "", ".", "!!!", "x1y2z3")
    cases.foreach { t =>
      val ids = kernelEncode(t, v)
      assert(ids == refEncode(t, v), s"encode mismatch on '$t'")
      assert(ids.length.toLong == kernelCount(t, v), s"size≠count on '$t'")
    }
  }

  test("bpe_decode expression: engine round-trip, NULL/empty contracts, loud bad ids") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val v = BpeVocab.Builtin
    val docs = Seq("the weighted documents are over the dog .",
      "mixed 123 , ünïcödé and 中文", "", "a", "!!!")
    val got = docs.map(Tuple1(_)).toDF("t")
      .select(graft.functions.BpeFunctions.bpeDecode(
        graft.functions.BpeFunctions.bpeEncode(col("t"), v), v).as("rt"))
      .collect().map(_.getString(0))
    assert(got.toSeq == docs)
    val nul = Seq(Tuple1(null.asInstanceOf[String])).toDF("t")
      .select(graft.functions.BpeFunctions.bpeDecode(
        graft.functions.BpeFunctions.bpeEncode(col("t"), v), v)).head()
    assert(nul.isNullAt(0))
    // an out-of-range id fails loudly, never truncates silently
    val e = intercept[Exception] {
      Seq(Tuple1(Array(0, v.vocabSize))).toDF("ids")
        .select(graft.functions.BpeFunctions.bpeDecode(col("ids"), v)).collect()
    }
    assert(e.getMessage != null)
  }

  test("encode round-trips: id → symbol bytes reassemble the original text") {
    val v = BpeVocab.Builtin
    // reverse id table: byte ids map to their byte, merge ids to their
    // result string (raw-byte chars) — concatenation must equal the input
    val idToSym: Map[Int, String] =
      (0 until 256).map(b => b -> String.valueOf((b & 0xff).toChar)).toMap ++
        v.mergesInOrder.zipWithIndex.map { case ((l, r), i) => (256 + i) -> (l + r) }
          .reverseIterator.toMap // first producer wins = LAST in reversed fold
    Seq("the weighted documents are over the dog .",
      "mixed 123 , ünïcödé and 中文", "").foreach { t =>
      val bytes = kernelEncode(t, v).flatMap(id => idToSym(id).map(_.toByte))
      assert(new String(bytes.toArray, "UTF-8") == t, s"round-trip failed on '$t'")
    }
  }

  test("encode contracts: NULL → NULL; ids are stable token ids across docs") {
    val v = BpeVocab.Builtin
    val got = Seq(Tuple1(null.asInstanceOf[String]))
      .toDF("t").select(BpeFunctions.bpeEncode(col("t"), v).as("ids")).head
    assert(got.isNullAt(0))
    // the same pre-token gets the same ids wherever it appears
    val dog = kernelEncode(" dog", v)
    assert(kernelEncode("the dog", v).endsWith(dog))
    assert(kernelEncode("over the dog", v).endsWith(dog))
  }

  test("duplicate merge RESULTS share the earliest id (same string = same token)") {
    // both ("ab","c") and ("a","bc") produce "abc": ids must collapse to
    // the first producer's 256+rank
    val v = BpeVocab.fromLines(Seq("a b", "b c", "ab c", "a bc"))
    assert(v.idOf("abc") == 256 + 2)
    assert(v.vocabSize == 256 + 4)
  }

  test("packTokenStreams: per-pack ids are the doc-order concatenation, n_tokens exact") {
    val v = BpeVocab.Builtin
    val docs = Seq(
      (1L, "the dog"), (2L, "weighted documents"), (3L, "over the data"),
      (4L, ""), (5L, "numbers 123")).toDF("doc_id", "text")
    val packs = graft.ops.Packing.packTokenStreams(
      docs, "doc_id", "text", v, capacity = 6L, nStreams = 1).collect()
    val perDoc = Seq(1L, 2L, 3L, 5L)
      .map(id => id -> kernelEncode(Seq((id)).map(i => Map(
        1L -> "the dog", 2L -> "weighted documents", 3L -> "over the data",
        5L -> "numbers 123")(i)).head, v)).toMap
    // doc 4 (empty) is excluded by the packSequences n_tokens > 0 contract
    val gotAll = packs.sortBy(_.getLong(0)).flatMap(_.getSeq[Int](5)).toVector
    assert(gotAll == Seq(1L, 2L, 3L, 5L).flatMap(perDoc))
    packs.foreach { r =>
      assert(r.getLong(4) == r.getSeq[Int](5).length.toLong) // n_tokens = len
      assert(r.getLong(3) >= 1L)                             // n_docs
    }
    // capacity 6: packs split whenever the running offset crosses 6 tokens
    val total = perDoc.values.map(_.length).sum
    assert(packs.map(_.getLong(4)).sum == total.toLong)
  }

  test("pre-tokenizer: ordered alternation with optional leading space") {
    val v = BpeVocab.fromLines(Seq("x x")) // no merges that ever apply
    // with no applicable merges the count = total BYTES (1 symbol/byte)
    assert(kernelCount("ab cd", v) == 5L)
    // "  a": ws run of 2 would be [" ", " a"] — ' ?L+' wins only for the
    // space DIRECTLY before the letter; the regex grabs "  " greedily
    // first? No: ordered alternation at pos 0 tries ' ?L+' (fails — two
    // spaces), then '\s+' takes BOTH spaces, then "a" alone: 3 bytes
    assert(kernelCount("  a", v) == 3L)
    // NULL → NULL, empty → 0
    val r = Seq((1L, Option("ab")), (2L, None: Option[String]), (3L, Some("")))
      .toDF("id", "t")
      .select(col("id"), BpeFunctions.bpeCount(col("t"), v).as("n"))
      .orderBy("id").collect()
    assert(r(0).getLong(1) == 2L)
    assert(r(1).isNullAt(1))
    assert(r(2).getLong(1) == 0L)
  }

  test("merges.txt parsing: headers, blanks, byte alphabet, failures") {
    val v = BpeVocab.fromLines(Seq(
      "#version: 0.2", "", "  ", "Ġ t", "h e"))
    assert(v.nMerges == 2)
    // Ġ decodes to the raw space byte through the GPT-2 alphabet
    assert(v.mergesInOrder == Vector((" ", "t"), ("h", "e")))
    assert(v.rankOf(" ", "t") == 0 && v.rankOf("h", "e") == 1)
    assert(v.rankOf("t", "h") == -1)
    intercept[IllegalArgumentException] { BpeVocab.fromLines(Seq("a b c")) }
    intercept[IllegalArgumentException] { BpeVocab.fromLines(Seq("Ġ t", "Ġ t")) }
    intercept[IllegalArgumentException] { BpeVocab.fromLines(Seq.empty[String]) }
  }

  test("length-prefixed rank keys cannot alias across pair splits") {
    // ("ab","c") vs ("a","bc"): same concatenation, must be distinct ranks
    val v = BpeVocab.fromLines(Seq("ab c", "a bc"))
    assert(v.rankOf("ab", "c") == 0)
    assert(v.rankOf("a", "bc") == 1)
  }
}
