package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.ops.TextAnalysis

/** Pins [[graft.functions.GopherSignals]] — the single-scan native
  * expression behind gopherQuality — against an independent java.util.regex
  * reference implementing the same RE2-expressible counter definitions the
  * DuckDB oracle uses. Random corpora are drawn from an adversarial
  * alphabet (every whitespace variant, dots, U+2026/U+2022, surrogate
  * pairs, stopwords and near-stopwords) so boundary behavior — run edges,
  * ellipsis consumption order, \n-only lines, trailing [ \t] stripping —
  * is exercised, not assumed. */
class GopherSignalsSpec extends SparkSpecBase {
  import spark.implicits._

  /** Regex reference for the nine counters (deliberately naive/slow). */
  private def reference(s: String): Seq[Long] = {
    import java.util.regex.Pattern
    def countMatches(p: Pattern, in: String): Long = {
      val m = p.matcher(in); var c = 0L; while (m.find()) c += 1; c
    }
    val run = Pattern.compile("[^ \t\n\f\r]+")
    val runs = {
      val m = run.matcher(s)
      val b = Seq.newBuilder[String]
      while (m.find()) b += m.group()
      b.result()
    }
    val words = runs.size.toLong
    val nonWs = s.codePointCount(0, s.length) -
      s.count(c => c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r').toLong
    val hash = s.count(_ == '#').toLong
    val ellipsisSym = countMatches(Pattern.compile("(\\.\\.\\.|\u2026)"), s)
    val lines = s.split("\n", -1)
    val bullet = lines.count(l =>
      Pattern.compile("^[ \t]*[-*\u2022]").matcher(l).find()).toLong
    // \z, not $: Java's $ would also match before a final \r, which RE2's
    // end-of-text $ (the oracle's semantics) does not
    val ellLine = lines.count(l =>
      Pattern.compile("(\\.\\.\\.|\u2026)[ \t]*\\z").matcher(l).find()).toLong
    val alpha = runs.count(r => r.exists(c =>
      (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z'))).toLong
    val stops = TextAnalysis.GopherStopwords.count(runs.contains(_)).toLong
    Seq(words, nonWs, hash, ellipsisSym, lines.length.toLong, bullet, ellLine,
      alpha, stops)
  }

  private val Fields = Seq("n_words", "n_nonws_chars", "n_hash",
    "n_ellipsis_sym", "n_lines", "n_bullet_lines", "n_ellipsis_lines",
    "n_alpha_words", "n_stopwords")

  private def viaSpark(docs: Seq[String]): Seq[Seq[Long]] = {
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    df.select(col("id"), TextFunctions.gopherSignals(col("text")).as("g"))
      .orderBy("id")
      .select(Fields.map(f => col(s"g.$f")): _*)
      .collect().toSeq.map(r => Fields.indices.map(r.getLong))
  }

  test("edge cases match the regex reference exactly") {
    val docs = Seq(
      "", " ", "\t", "\n", "\r\n", "a", "\ta b", " a b \n", // blank/boundary
      "....", ".....", "......", "...", "..", "\u2026", "\u2026\u2026", "...\u2026",
      "a...\t", "a...\t\nb", "...\r\n", "to be continued...", "then\u2026",
      "- a\n- b", "  * x", "\t\u2022 y", "-", "*-", "a - b", "\n- x",
      "the", "the.", " the ", "THE", "the the the", "that have with be to of and",
      "\ud83d\ude00 the \ud83d\ude00", // surrogate pairs as run content
      "#", "##a#", "a#b c#d",
      "x\n\n\ny", "bullet\n- mid\nend...", "...\n...\n")
    val got = viaSpark(docs)
    docs.indices.foreach { i =>
      assert(got(i) == reference(docs(i)),
        s"doc ${i}: ${docs(i).replace("\n", "\\n")} → ${got(i)} vs ${reference(docs(i))}")
    }
  }

  test("random adversarial corpora match the regex reference (seeded)") {
    val alphabet: IndexedSeq[String] = IndexedSeq(
      " ", "\t", "\n", "\f", "\r", ".", "...", "\u2026", "#", "-", "*",
      "\u2022", "a", "Z", "1", "!", "the", "be", "to", "of", "and", "that",
      "have", "with", "thee", "th", "and.", "\ud83d\ude00")
    val rnd = new Random(20260814L)
    val docs = (0 until 300).map { _ =>
      val len = rnd.nextInt(40)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString
    }
    val got = viaSpark(docs)
    docs.indices.foreach { i =>
      assert(got(i) == reference(docs(i)),
        s"doc ${i}: [${docs(i).replace("\n", "\\n").replace("\t", "\\t")}] → " +
          s"${got(i)} vs ${reference(docs(i))}")
    }
  }

  test("interpreted eval path agrees with codegen and NULL stays NULL") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.GopherSignals
    val s = "the data...\n- bullet\t\u2026"
    val row = GopherSignals(Literal(UTF8String.fromString(s), org.apache.spark.sql.types.StringType))
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    val got = Fields.indices.map(row.getLong)
    assert(got == reference(s))
    val nul = GopherSignals(Literal(null, org.apache.spark.sql.types.StringType)).eval(null)
    assert(nul == null)
  }

  test("gopherQuality word-count contract: blank-under-any-whitespace is zero words") {
    val df = Seq((1L, "\t \n"), (2L, "\ta b")).toDF("id", "text")
    val got = TextAnalysis.gopherQuality(df, "text", "id").orderBy("id").collect()
    assert(got(0).getAs[Long]("n_words") == 0L)
    assert(got(0).isNullAt(got(0).fieldIndex("mean_word_len")))
    assert(got(1).getAs[Long]("n_words") == 2L) // runs, not trim-split artifacts
  }

  test("the one-scan struct is not duplicated across its nine consumers") {
    // an RDD-backed frame, not a LocalRelation: local rows would be folded
    // away entirely and prove nothing about the projection shape
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq((1L, "the text"))))
      .toDF("id", "text")
    val plan = TextAnalysis.gopherQuality(df, "text", "id")
      .queryExecution.optimizedPlan.toString
    val occurrences = "gophersignals".r.findAllIn(plan.toLowerCase).size
    assert(occurrences == 1, s"expected exactly one GopherSignals eval, plan:\n$plan")
  }
}
