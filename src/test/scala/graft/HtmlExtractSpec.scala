package graft

import org.apache.spark.sql.functions._
import graft.functions.HtmlTextParser
import graft.ops.Extract

/** The html_text extraction contract, case by case — the deterministic
  * behavior the q108/q109 oracles rebuild arithmetically. */
class HtmlExtractSpec extends SparkSpecBase {
  import spark.implicits._

  private def x(html: String): String = HtmlTextParser.extract(html)

  test("tags strip; block elements break lines; inline elements vanish") {
    assert(x("<p>hello</p><p>world</p>") == "hello\nworld")
    assert(x("a<span>b</span>c") == "abc")
    assert(x("<div>a</div><div>b</div>") == "a\nb")
    assert(x("one<br>two<br/>three<br />four") == "one\ntwo\nthree\nfour")
    assert(x("<ul><li>x</li><li>y</li></ul>") == "x\ny")
    assert(x("<table><tr><td>a</td><td>b</td></tr></table>") == "a\nb")
    assert(x("<h1>Title</h1>body") == "Title\nbody")
    // attributes, uppercase names, self-closing
    assert(x("""<DIV CLASS="x">a</DIV>""") == "a")
    assert(x("""<a href="http://e.com/?q=1">link</a> text""") == "link text")
  }

  test("script/style/noscript/template drop WITH content; decoys stay dropped") {
    assert(x("a<script>var x = '</div>' + 1;</script>b") == "ab")
    assert(x("a<style>p { color: red }</style>b") == "ab")
    assert(x("a<SCRIPT TYPE='text/javascript'>if (1<2) x=1;</SCRIPT>b") == "ab")
    assert(x("a<noscript>enable js</noscript>b") == "ab")
    // unterminated: drops to end of input
    assert(x("a<script>never closed") == "a")
    // <scripty> is an ordinary (inline, unknown) tag, not a script
    assert(x("a<scripty>b</scripty>c") == "abc")
  }

  test("comments drop; unterminated comment drops to end") {
    assert(x("a<!-- hidden <p>not text</p> -->b") == "ab")
    assert(x("a<!-- never closed") == "a")
  }

  test("character references: named, decimal, hex; malformed stays literal") {
    assert(x("&amp; &lt;tag&gt; &quot;q&quot;") == "& <tag> \"q\"")
    assert(x("A&#66;C") == "ABC")
    assert(x("A&#x42;C") == "ABC")
    assert(x("caf&#233;") == "café")
    assert(x("a&nbsp;b") == "a b") // nbsp -> plain space (word-count safe)
    assert(x("&unknown; stays") == "&unknown; stays")
    assert(x("&#xZZ; &#; & alone") == "&#xZZ; &#; & alone")
    assert(x("&#1114112;") == "&#1114112;") // beyond U+10FFFF: literal
  }

  test("a '<' that opens no tag is literal text") {
    assert(x("1 < 2 and 3<4? <p>yes</p>") == "1 < 2 and 3<4?\nyes")
  }

  test("whitespace: source newlines are spaces; block breaks are the only newlines") {
    assert(x("<p>a\nb</p>") == "a b")
    assert(x("<p>  a \t b  </p>\n\n<p>c</p>") == "a b\nc")
    // markup-only and empty input
    assert(x("<html><head></head><body></body></html>") == "")
    assert(x("") == "")
    // CRLF and tabs collapse
    assert(x("a\r\n\tb") == "a b")
  }

  test("NULL in, NULL out; works through Column API and codegen") {
    val got = Seq((0, Some("<p>x &amp; y</p>")), (1, None))
      .toDF("i", "h")
      .select(col("i"), Extract.textFromHtml(col("h")).as("t"))
      .orderBy("i").collect()
    assert(got(0).getString(1) == "x & y")
    assert(got(1).isNullAt(1))
  }

  test("html_text registers for SQL (SparkSessionExtensions path)") {
    graft.functions.GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT html_text('<h1>A</h1><script>x</script><p>b &#66;</p>') AS t").head.getString(0)
    assert(got == "A\nb B")
  }

  test("streaming: html_text is a stateless projection — works in readStream pipelines") {
    // the crawl pipeline's streaming spelling: micro-batches of raw HTML →
    // extraction → quality battery, no state, no watermark needed
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val sdf = input.toDF().toDF("doc_id", "html")
      .select(col("doc_id"), Extract.textFromHtml(col("html")).as("text"))
    val out = graft.ops.TextAnalysis.gopherQuality(sdf, "text", "doc_id",
      graft.ops.TextAnalysis.GopherThresholds(minWords = 2, minStopwords = 0))
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName("shtml").start()
    input.addData((1L, "<p>the quick fox</p><script>x</script>"),
      (2L, "<h1>one</h1><p>of the words</p>"))
    q.processAllAvailable()
    input.addData((3L, "<ul><li>to bees</li><li>for honey</li></ul>"))
    q.processAllAvailable()
    val got = spark.table("shtml").orderBy("doc_id").collect()
    q.stop()
    assert(got.length == 3)
    assert(got.map(_.getAs[Long]("n_words")).toSeq == Seq(3L, 4L, 4L))
    assert(got.forall(_.getAs[Boolean]("passes")))
  }

  test("PslRules.fromFile loads a vendored public_suffix_list.dat") {
    val f = java.nio.file.Files.createTempFile("psl-", ".dat")
    java.nio.file.Files.write(f, java.util.Arrays.asList(
      "// ===BEGIN ICANN DOMAINS===",
      "com", "uk", "co.uk", "*.ck", "!www.ck",
      "// ===BEGIN PRIVATE DOMAINS===",
      "github.io"))
    try {
      val psl = graft.functions.PslRules.fromFile(f.toString)
      assert(psl.nRules == 6)
      assert(psl.registeredDomain("a.b.co.uk") == "b.co.uk")
      assert(psl.registeredDomain("x.foo.github.io") == "foo.github.io")
      assert(psl.registeredDomain("www.www.ck") == "www.ck")
    } finally java.nio.file.Files.delete(f)
  }

  test("fuzz: extraction never throws and always emits normalized output (adversarial crawl bytes)") {
    // crawl HTML is adversarial input: truncated tags, stray '&'/'<',
    // unterminated script/comment, NULs, surrogate-free unicode. The
    // invariants: no exception, no NULs out, no empty lines, no
    // leading/trailing intra-line whitespace, no un-collapsed runs.
    val rnd = new scala.util.Random(20260814L)
    val atoms = Array("<p>", "</p>", "<script>", "</script>", "<!--", "-->",
      "<div", ">", "<", "&", "&amp;", "&#", "&#x41;", ";", "word", "1 < 2",
      " ", "\n", "\t", "\u0000", "é", "日本", "<br/>", "<style>", "</style>",
      "<li>", "x=\"</div>\"", "&unknown;", "&#999999999;", "<a href='y'>")
    (0 until 3000).foreach { _ =>
      val html = Seq.fill(rnd.nextInt(40))(atoms(rnd.nextInt(atoms.length))).mkString
      val out = x(html)
      assert(!out.contains('\u0000'), s"NUL survived for input ${html.take(80)}")
      // the empty OUTPUT (markup-only input) is legal; otherwise no line
      // may be empty, untrimmed, or carry an uncollapsed whitespace run
      if (out.nonEmpty) out.split("\n", -1).foreach { line =>
        assert(line.nonEmpty, s"empty line for input ${html.take(80)}")
        assert(line == line.trim, s"untrimmed line '$line'")
        assert(!line.contains("  ") && !line.contains("\t"),
          s"uncollapsed whitespace in '$line'")
      }
    }
  }

  test("fuzz: PslRules.registeredDomain output is always the host or one of its suffixes") {
    val psl = graft.functions.PslRules.Builtin
    val rnd = new scala.util.Random(42)
    val labels = Array("a", "bb", "www", "co", "uk", "ck", "com", "github",
      "io", "sg", "x1", "192", "0", "2", "", "é")
    (0 until 3000).foreach { _ =>
      val host = Seq.fill(rnd.nextInt(6) + 1)(labels(rnd.nextInt(labels.length))).mkString(".")
      val d = psl.registeredDomain(host)
      // a single trailing dot (FQDN form) is canonicalized away before
      // matching, so the invariant holds against the canonical host
      val canon =
        if (host.length > 1 && host.endsWith(".")) host.dropRight(1) else host
      assert(d == canon || canon.endsWith("." + d),
        s"'$d' is not canonical-host-or-suffix of '$host'")
    }
  }

  test("bytes path: http_body binary -> utf-8 -> extraction") {
    val got = Seq(Tuple1("<p>déjà&nbsp;vu</p>".getBytes("UTF-8")))
      .toDF("b")
      .select(Extract.textFromHtmlBytes(col("b")).as("t")).head.getString(0)
    assert(got == "déjà vu")
  }
}
