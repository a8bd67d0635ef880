package graft

import org.apache.spark.sql.functions._

import graft.ops.GopherRepetition

/** Gopher repetition battery vs an independent brute reference on
  * crafted fixtures that exercise every signal family — duplicate
  * lines/paragraphs (the corpus fixture has none), overlapping n-gram
  * repeats, ties, and the NULL/empty/short contracts. */
class GopherRepetitionSpec extends SparkSpecBase {
  import spark.implicits._

  // ---- brute reference (independent reimplementation) -------------------

  private def segStats(text: String, sep: String): (Long, Long, Long, Long) = {
    val segs = text.split(java.util.regex.Pattern.quote(sep), -1).toSeq
    val byText = segs.groupBy(identity)
    val n = segs.size.toLong
    val d = byText.size.toLong
    val dup = byText.map { case (s, o) => (o.size - 1).toLong * s.length }.sum
    val tot = segs.map(_.length.toLong).sum
    (n, d, dup, tot)
  }

  private def bruteRow(text: String): Map[String, Option[Double]] = {
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (ln, ld, ldup, ltot) = segStats(text, "\n")
    val (pn, pd, pdup, ptot) = segStats(text, "\n\n")
    val toks = text.split("\\s+", -1).filter(_.nonEmpty).toVector
    val totc = toks.map(_.length.toLong).sum
    def grams(n: Int): Seq[(Int, String, Long)] =
      if (toks.size < n) Nil
      else (0 to toks.size - n).map(i =>
        (i, toks.slice(i, i + n).mkString(" "), toks.slice(i, i + n).map(_.length.toLong).sum))
    def topFrac(n: Int): Option[Double] =
      if (totc == 0) None
      else {
        val gs = grams(n)
        if (gs.isEmpty) Some(0.0)
        else {
          val counts = gs.groupBy(_._2).view.mapValues(o => (o.size.toLong, o.head._3))
          val (_, (c, gch)) = counts.toSeq.minBy { case (g, (c, _)) => (-c, g) }
          Some(c * gch.toDouble / totc)
        }
      }
    def dupFrac(n: Int): Option[Double] =
      if (totc == 0) None
      else {
        val gs = grams(n)
        val dupGrams = gs.groupBy(_._2).filter(_._2.size >= 2).keySet
        val covered = gs.filter(g => dupGrams(g._2))
          .flatMap { case (pos, _, _) => pos until pos + n }.toSet
        Some(covered.toSeq.map(p => toks(p).length.toLong).sum.toDouble / totc)
      }
    Map(
      "dup_line_frac" -> Some(r6((ln - ld).toDouble / ln)),
      "dup_para_frac" -> Some(r6((pn - pd).toDouble / pn)),
      "dup_line_char_frac" -> (if (ltot == 0) None else Some(r6(ldup.toDouble / ltot))),
      "dup_para_char_frac" -> (if (ptot == 0) None else Some(r6(pdup.toDouble / ptot)))) ++
      Seq(2, 3, 4).map(n => s"top${n}gram_char_frac" -> topFrac(n).map(r6)).toMap ++
      Seq(5, 6, 7, 8, 9, 10).map(n => s"dup${n}gram_char_frac" -> dupFrac(n).map(r6)).toMap
  }

  private val fixtures = Seq(
    "plain words with no repetition at all here",
    "dup line\ndup line\nunique line", // repeated lines
    "para one\n\npara one\n\npara two", // repeated paragraphs
    "a a a a a a a a", // overlapping unigram-run: every n-gram repeats
    "x y x y x y x y z", // alternating bigram repeats
    "one two three four five one two three four five six seven", // repeated 5-gram
    "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10", // 10-gram repeat
    "tie tie bar bar", // top-bigram count tie → lexicographic break
    "short", // fewer tokens than any n
    "", // one empty line, zero tokens
    "  \n  ", // whitespace only
    "mixed\ttabs and\nnewlines mixed\ttabs and\nnewlines")

  test("battery ≡ brute reference on crafted fixtures") {
    val df = fixtures.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = GopherRepetition.gopherRepetition(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    val cols = got.head.schema.fieldNames
    fixtures.zipWithIndex.foreach { case (t, i) =>
      val want = bruteRow(t)
      val row = got(i)
      want.foreach { case (name, expected) =>
        val idx = cols.indexOf(name)
        val actual = if (row.isNullAt(idx)) None else Some(row.getDouble(idx))
        assert(actual == expected,
          s"doc $i '$t' signal $name: got $actual want $expected")
      }
    }
  }

  test("passes: repetition-heavy docs fail, clean docs pass, NULL fails") {
    // a clean doc must be LONG enough that one n-gram occurrence is a
    // small char fraction — the paper's thresholds assume web-length docs
    val clean = (1 to 60).map(i => s"word$i").mkString(" ")
    val df = Seq(
      (0L, Some(clean)),
      (1L, Some("spam spam spam spam spam spam spam spam")), // top-gram blowout
      (2L, Some("copy line\ncopy line\ncopy line\nreal content here")), // dup lines
      (3L, Option.empty[String])
    ).toDF("doc_id", "text")
    val got = GopherRepetition.gopherRepetition(df, "text", "doc_id")
      .orderBy("doc_id").select("passes").collect().map(_.getBoolean(0)).toSeq
    assert(got == Seq(true, false, false, false))
    // the corpus-filter wrapper keeps exactly the passing set
    val kept = GopherRepetition.dropRepetitive(df, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(0L))
  }

  test("zero-token and NULL docs surface with NULL gram signals") {
    val df = Seq((0L, Some("   ")), (1L, Option.empty[String]))
      .toDF("doc_id", "text")
    val got = GopherRepetition.gopherRepetition(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    // whitespace-only doc: line stats exist (one "   " line... after \n
    // split: ["   "]) but gram signals are NULL (zero tokens)
    assert(got(0).isNullAt(got(0).fieldIndex("top2gram_char_frac")))
    assert(got(0).isNullAt(got(0).fieldIndex("dup5gram_char_frac")))
    assert(!got(0).getBoolean(got(0).fieldIndex("passes")))
    // NULL text: everything NULL, passes false
    assert(got(1).isNullAt(got(1).fieldIndex("dup_line_frac")))
    assert(!got(1).getBoolean(got(1).fieldIndex("passes")))
  }
}
