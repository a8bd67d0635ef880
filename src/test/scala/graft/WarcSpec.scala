package graft

import org.apache.spark.sql.functions._

import graft.functions.WarcFunctions

/** The WARC ingest kernel: framing, HTTP splitting, gzip members,
  * rejection, and the binaryFile ingest path. */
class WarcSpec extends SparkSpecBase {
  import spark.implicits._

  private val crlf = "\r\n"

  private def record(
      rtype: String,
      uri: String,
      block: String,
      ct: String = "application/http; msgtype=response"): String = {
    val blockBytes = block.getBytes("UTF-8").length
    s"WARC/1.0${crlf}WARC-Type: $rtype${crlf}WARC-Target-URI: $uri$crlf" +
      s"WARC-Date: 2026-02-01T00:00:00Z${crlf}Content-Type: $ct$crlf" +
      s"Content-Length: $blockBytes$crlf$crlf$block$crlf$crlf"
  }

  private val respBlock = s"HTTP/1.1 200 OK${crlf}Content-Type: text/html$crlf$crlf<p>hi</p>"
  private val plainWarc =
    (record("request", "http://a/1", s"GET /1 HTTP/1.1${crlf}Host: a$crlf$crlf",
      "application/http; msgtype=request") +
      record("response", "http://a/1", respBlock) +
      record("metadata", "http://a/1", "via: crawler", "application/warc-fields"))
      .getBytes("UTF-8")

  private def gz(parts: Array[Byte]*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    parts.foreach { p =>
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(p); g.finish()
    }
    out.toByteArray
  }

  private def parseOne(payload: Array[Byte]) =
    Seq(Tuple1(payload)).toDF("payload")
      .select(WarcFunctions.warcRecords(col("payload")).as("rs"))
      .selectExpr("explode(rs) AS r")
      .select(col("r.rec_type"), col("r.url"), col("r.http_status"),
        col("r.content_type"), col("r.body").cast("string"))
      .collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        Option(r.getString(3)), r.getString(4)))

  test("plain WARC: all records in order, HTTP framing split, non-http block whole") {
    val got = parseOne(plainWarc).toSeq
    assert(got == Seq(
      ("request", "http://a/1", None, None, ""),
      ("response", "http://a/1", Some(200), Some("text/html"), "<p>hi</p>"),
      ("metadata", "http://a/1", None, Some("application/warc-fields"), "via: crawler")))
  }

  test("gzip payloads parse identically: whole-file single member AND record-per-member") {
    val want = parseOne(plainWarc).toSeq
    assert(parseOne(gz(plainWarc)).toSeq == want, "single-member gzip")
    val r1 = record("request", "http://a/1",
      s"GET /1 HTTP/1.1${crlf}Host: a$crlf$crlf",
      "application/http; msgtype=request").getBytes("UTF-8")
    val r2 = record("response", "http://a/1", respBlock).getBytes("UTF-8")
    val r3 = record("metadata", "http://a/1", "via: crawler",
      "application/warc-fields").getBytes("UTF-8")
    assert(parseOne(gz(r1, r2, r3)).toSeq == want,
      "multi-member gzip (the standard seekable-WARC layout)")
  }

  test("malformed payloads reject as NULL, never partial records") {
    def isNull(payload: Array[Byte]): Boolean =
      Seq(Tuple1(payload)).toDF("payload")
        .select(WarcFunctions.warcRecords(col("payload")).as("rs"))
        .collect()(0).isNullAt(0)
    assert(isNull("not a warc file at all".getBytes("UTF-8")))
    assert(isNull(plainWarc.dropRight(3)), "truncated record separator")
    val noLen = (s"WARC/1.0${crlf}WARC-Type: response$crlf$crlf" + "body").getBytes("UTF-8")
    assert(isNull(noLen), "missing Content-Length")
    assert(isNull(Array[Byte](0x1f, 0x8b.toByte, 0, 0)), "corrupt gzip")
    // a valid prefix followed by garbage poisons the WHOLE payload
    assert(isNull(plainWarc ++ "tail garbage".getBytes("UTF-8")))
    // NULL in -> NULL out
    val r = Seq(Tuple1(null: Array[Byte])).toDF("payload")
      .select(WarcFunctions.warcRecords(col("payload"))).collect()(0)
    assert(r.isNullAt(0))
  }

  test("binaryFile ingest path: .warc.gz files on disk -> parsed records") {
    val dir = java.nio.file.Files.createTempDirectory("warc-ingest")
    java.nio.file.Files.write(dir.resolve("a.warc.gz"), gz(plainWarc))
    java.nio.file.Files.write(dir.resolve("b.warc"), plainWarc)
    val got = spark.read.format("binaryFile").load(dir.toString)
      .select(col("path"), explode(WarcFunctions.warcRecords(col("content"))).as("r"))
      .where(col("r.rec_type") === "response")
      .select(col("r.url"), col("r.http_status"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(got == Seq(("http://a/1", 200), ("http://a/1", 200)))
  }

  test("property: random WARC files round-trip through the parser (incl. " +
    "CRLFCRLF-bearing bodies, unicode, status codes, gzip)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    case class R(rtype: String, uri: Option[String], ct: Option[String],
        status: Option[Int], httpCt: Option[String], body: String)
    val genBody = Gen.listOf(Gen.oneOf(
      "x", "word", "\r", "\n", "\r\n", "\r\n\r\n", "é世", "", ": ")).map(_.mkString)
    val genRec = for {
      rtype <- Gen.oneOf("response", "request", "metadata", "resource")
      uri <- Gen.option(Gen.choose(1, 999).map(n => s"http://h/$n"))
      body <- genBody
      httpish <- Gen.oneOf(true, false)
      status <- Gen.choose(100, 599)
      httpCt <- Gen.option(Gen.oneOf("text/html", "text/plain; charset=utf-8"))
      warcCt <- Gen.option(Gen.const("application/warc-fields"))
    } yield
      if (httpish) R(rtype, uri, Some("application/http; msgtype=x"), Some(status), httpCt, body)
      else R(rtype, uri, warcCt, None, None, body)
    def serialize(rs: List[R]): Array[Byte] = {
      val sb = new StringBuilder
      rs.foreach { r =>
        val block = r.status match {
          case Some(st) =>
            s"HTTP/1.1 $st OK$crlf" +
              r.httpCt.map(c => s"Content-Type: $c$crlf").getOrElse("") +
              crlf + r.body
          case None => r.body
        }
        sb.append(s"WARC/1.0${crlf}WARC-Type: ${r.rtype}$crlf")
        r.uri.foreach(u => sb.append(s"WARC-Target-URI: $u$crlf"))
        r.ct.foreach(c => sb.append(s"Content-Type: $c$crlf"))
        sb.append(s"Content-Length: ${block.getBytes("UTF-8").length}$crlf$crlf")
        sb.append(block).append(crlf).append(crlf)
      }
      sb.toString.getBytes("UTF-8")
    }
    val genCase = for {
      n <- Gen.choose(1, 4)
      rs <- Gen.listOfN(n, genRec)
      gzip <- Gen.oneOf(true, false)
    } yield (rs, gzip)
    val prop = Prop.forAll(genCase) { case (rs, gzip) =>
      val bytes = serialize(rs)
      val got = parseOne(if (gzip) gz(bytes) else bytes).toSeq
      val want = rs.map(r => (r.rtype, r.uri.orNull, r.status,
        if (r.status.isDefined) r.httpCt else r.ct, r.body))
      if (got != want) println(s"WARC property FALSIFIED: got=$got want=$want gzip=$gzip")
      got == want
    }
    val result = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(40)
        .withInitialSeed(org.scalacheck.rng.Seed(20260814L)),
      prop)
    assert(result.passed, s"ScalaCheck: $result")
  }

  test("chunked transfer-encoding: bodies dechunk, malformed chunking nulls ONE body") {
    def chunked(pieces: Seq[String]): String =
      pieces.map(p => f"${p.getBytes("UTF-8").length}%x$crlf$p$crlf").mkString +
        s"0$crlf$crlf"
    val chunkedBlock =
      s"HTTP/1.1 200 OK${crlf}Content-Type: text/plain${crlf}" +
        s"Transfer-Encoding: chunked$crlf$crlf" +
        chunked(Seq("hello ", "chunked ", "world"))
    // chunk extensions after ';' are spec-legal and ignored; uppercase hex
    // sizes parse; trailers after the 0-chunk are ignored
    val extBlock =
      s"HTTP/1.1 200 OK${crlf}Content-Type: text/plain${crlf}" +
        s"Transfer-Encoding: CHUNKED$crlf$crlf" +
        s"6;name=v$crlf" + "abcdef" + crlf + s"A$crlf" + "0123456789" + crlf +
        s"0${crlf}X-Trailer: t$crlf$crlf"
    // malformed: size line claims more bytes than the block holds
    val badBlock =
      s"HTTP/1.1 200 OK${crlf}Content-Type: text/plain${crlf}" +
        s"Transfer-Encoding: chunked$crlf$crlf" + s"FFFF$crlf" + "short" + crlf
    // RFC 9112 places NO length limit on chunk extensions: a 600-byte
    // extension and BWS padding before it are legal and must dechunk
    // (only the hex prefix is semantically bounded; the line cap is 4 KiB)
    val longExtBlock =
      s"HTTP/1.1 200 OK${crlf}Content-Type: text/plain${crlf}" +
        s"Transfer-Encoding: chunked$crlf$crlf" +
        s"5  ;meta=${"x" * 600}$crlf" + "bytes" + crlf + s"0$crlf$crlf"
    // junk (non-extension, non-whitespace) after the hex size: malformed
    val junkSizeBlock =
      s"HTTP/1.1 200 OK${crlf}Content-Type: text/plain${crlf}" +
        s"Transfer-Encoding: chunked$crlf$crlf" +
        s"5 junk$crlf" + "bytes" + crlf + s"0$crlf$crlf"
    val warc = (record("response", "http://c/1", chunkedBlock) +
      record("response", "http://c/2", extBlock) +
      record("response", "http://c/3", badBlock) +
      record("response", "http://c/4", respBlock) +
      record("response", "http://c/6", longExtBlock) +
      record("response", "http://c/7", junkSizeBlock)).getBytes("UTF-8")
    val got = parseOne(warc).toSeq
    assert(got(0) == (("response", "http://c/1", Some(200),
      Some("text/plain"), "hello chunked world")))
    assert(got(1) == (("response", "http://c/2", Some(200),
      Some("text/plain"), "abcdef0123456789")))
    // the malformed chunked body nulls — but ONLY that record's body; its
    // headers and every sibling record survive
    assert(got(2) == (("response", "http://c/3", Some(200), Some("text/plain"), null)))
    assert(got(3) == (("response", "http://c/4", Some(200), Some("text/html"), "<p>hi</p>")))
    assert(got(4) == (("response", "http://c/6", Some(200),
      Some("text/plain"), "bytes")), "long chunk extension must dechunk")
    assert(got(5) == (("response", "http://c/7", Some(200),
      Some("text/plain"), null)), "junk after hex size is malformed")
    // a non-chunked record never enters the dechunker even if the body
    // happens to LOOK like chunk framing
    val lookalike =
      s"HTTP/1.1 200 OK${crlf}Content-Type: text/plain$crlf$crlf" +
        s"5${crlf}hello$crlf" + s"0$crlf$crlf"
    val got2 = parseOne(record("response", "http://c/5", lookalike).getBytes("UTF-8")).toSeq
    assert(got2(0)._5 == s"5${crlf}hello$crlf" + s"0$crlf$crlf")
    // a chunked MEDIA capture dechunks to decodable bytes end-to-end
    import graft.multimodal.Multimodal
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(12)
    val crawl = Multimodal.warcChunkedCrawlFromDocuments(docs)
    val media = Multimodal.extractWarcMedia(crawl, "media_id", "payload")
      .where(col("content_type") === "image/png")
      .select(col("warc_id"),
        graft.functions.MediaFunctions.imagePixelStats(col("payload")).as("p"))
      .collect()
    assert(media.length == 12)
    media.foreach(r => assert(!r.isNullAt(1),
      s"dechunked PNG for doc ${r.getLong(0)} must decode"))
  }

  test("warc_records registers for SQL use (SparkSessionExtensions path)") {
    graft.functions.GraftFunctions.register(spark)
    Seq(Tuple1(plainWarc)).toDF("payload").createOrReplaceTempView("warc_files")
    val got = spark.sql(
      """SELECT r.rec_type, r.http_status FROM warc_files
        |LATERAL VIEW explode(warc_records(payload)) t AS r
        |WHERE r.rec_type = 'response'""".stripMargin).head()
    assert(got.getString(0) == "response" && got.getInt(1) == 200)
  }

  test("Urls: scheme/host/path decomposition and registered-domain reduction") {
    import graft.ops.Urls
    val cases = Seq(
      ("HTTPS://u:p@www.Site.co.uk:8080/a/b?q=1#f",
        ("https", "www.site.co.uk", "site.co.uk", "/a/b")),
      ("http://example.com", ("http", "example.com", "example.com", "")),
      ("ftp://a.b.c.example.org/x", ("ftp", "a.b.c.example.org", "example.org", "/x")),
      ("https://sub.shop.com.au/", ("https", "sub.shop.com.au", "shop.com.au", "/")),
      ("https://localhost:9/x", ("https", "localhost", "localhost", "/x")),
      ("not a url", ("", "", "", "")))
    val got = cases.map(_._1).zipWithIndex.map { case (u, i) => (i, u) }
      .toDF("i", "url")
      .select(col("i"), Urls.scheme(col("url")).as("s"), Urls.host(col("url")).as("h"),
        Urls.registeredDomain(Urls.host(col("url"))).as("d"),
        Urls.path(col("url")).as("p"))
      .orderBy("i").collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3), r.getString(4)))
    assert(got.toSeq == cases.map(_._2))
  }

  test("PslRules: publicsuffix.org algorithm on the canonical test vectors") {
    import graft.functions.PslRules
    val psl = PslRules.Builtin
    // subset of the published checkPublicSuffix vectors covered by Builtin;
    // null registrable domains map to host passthrough (the engine's
    // scrubbing convention)
    val cases = Seq(
      "com" -> "com",
      "example.com" -> "example.com",
      "www.example.com" -> "example.com",
      "example.co.uk" -> "example.co.uk",
      "www.example.co.uk" -> "example.co.uk",
      "github.io" -> "github.io",
      "foo.github.io" -> "foo.github.io",
      "bar.foo.github.io" -> "foo.github.io",
      "test.ck" -> "test.ck", // wildcard *.ck: test.ck IS a public suffix
      "b.test.ck" -> "b.test.ck",
      "a.b.test.ck" -> "b.test.ck",
      "www.ck" -> "www.ck", // exception !www.ck
      "www.www.ck" -> "www.ck",
      "example.com.sg" -> "example.com.sg",
      "sub.example.com.sg" -> "example.com.sg",
      "192.0.2.1" -> "192.0.2.1", // IP literals pass through
      "[2001:db8::1]" -> "[2001:db8::1]",
      "localhost" -> "localhost",
      // FQDN form (single trailing dot) canonicalizes before rule matching
      // — NOT a fall-through to the default rule's "com." bucket
      "example.com." -> "example.com",
      "www.example.co.uk." -> "example.co.uk",
      "a.b.test.ck." -> "b.test.ck",
      "com." -> "com",
      "." -> ".") // lone dot: no labels, passes through
    cases.foreach { case (host, want) =>
      assert(psl.registeredDomain(host) == want, s"host=$host")
    }
    // same answers through the native expression (eval + codegen paths)
    val got = cases.map(_._1).zipWithIndex.map { case (h, i) => (i, h) }
      .toDF("i", "host")
      .select(col("i"), graft.ops.Urls.registeredDomainPsl(col("host")).as("d"))
      .orderBy("i").collect().map(_.getString(1)).toSeq
    assert(got == cases.map(_._2))
  }

  test("PslRules.fromLines parses the published file format") {
    import graft.functions.PslRules
    val psl = PslRules.fromLines(Seq(
      "// ===BEGIN ICANN DOMAINS===",
      "",
      "com",
      "  co.uk  trailing junk",
      ".jp", // leading-dot variant some vendored copies carry
      "*.ck",
      "!www.ck",
      "// ===END ICANN DOMAINS==="))
    assert(psl.nRules == 5)
    assert(psl.registeredDomain("a.b.co.uk") == "b.co.uk")
    assert(psl.registeredDomain("x.jp") == "x.jp")
    assert(psl.registeredDomain("www.www.ck") == "www.ck")
  }

  test("registeredDomain (two-level subset path) passes IP literals through") {
    import graft.ops.Urls
    val got = Seq((0, "192.0.2.1"), (1, "[2001:db8::1]"), (2, "www.example.com"),
        (3, "10.1.2.3.example.com"))
      .toDF("i", "h")
      .select(col("i"), Urls.registeredDomain(col("h")).as("d"))
      .orderBy("i").collect().map(_.getString(1)).toSeq
    assert(got == Seq("192.0.2.1", "[2001:db8::1]", "example.com", "example.com"))
  }

  test("fixture round-trip matches the documents source") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    val parsed = graft.multimodal.Multimodal.warcFromDocuments(docs)
      .select(col("media_id"),
        explode(WarcFunctions.warcRecords(col("payload"))).as("r"))
      .where(col("r.rec_type") === "response")
      .select(col("media_id"), col("r.body").cast("string").as("body"))
    val joined = parsed.join(docs, col("media_id") === col("doc_id"))
      .select(col("body"), substring(coalesce(col("text"), lit("")), 1, 60).as("want"))
      .collect()
    assert(joined.length == 20)
    joined.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("normalizeUrl: RFC 3986 case/port/slash/fragment + tracking-param strip") {
    import graft.ops.Urls
    val cases = Seq(
      // case folding + userinfo + default port + trailing slash + fragment
      "HTTP://u:p@WWW.Ex.COM:80/A/b/?b=2&utm_source=x&a=1#f" -> "http://www.ex.com/A/b?a=1&b=2",
      // https default port; param already sorted; path case PRESERVED
      "https://Ex.com:443/Path" -> "https://ex.com/Path",
      // non-default port kept
      "http://ex.com:8080/p" -> "http://ex.com:8080/p",
      // root path and bare host both normalize to no path
      "http://ex.com/" -> "http://ex.com",
      "http://ex.com" -> "http://ex.com",
      // empty query; lone '?'; tracking-only query
      "http://ex.com/p?" -> "http://ex.com/p",
      "http://ex.com/p?utm_campaign=z&fbclid=1" -> "http://ex.com/p",
      // bare tracking param without '='; 'ref' exact (refresh=1 is NOT stripped)
      "http://ex.com/p?ref&x=1&refresh=1" -> "http://ex.com/p?refresh=1&x=1",
      // FQDN trailing dot; '?' inside the fragment is NOT a query
      "http://ex.com./p" -> "http://ex.com/p",
      "http://ex.com/p#frag?notaquery=1" -> "http://ex.com/p")
    val got = cases.map(_._1).toDF("url")
      .select(Urls.normalizeUrl(col("url")).as("n")).collect().map(_.getString(0))
    got.zip(cases.map(_._2)).foreach { case (g, w) => assert(g == w, s"want $w") }
    // not-a-URL contracts → NULL
    val nulls = Seq("no scheme here", "http://", "relative/path", "")
      .toDF("url").select(Urls.normalizeUrl(col("url")).as("n")).collect()
    nulls.foreach(r => assert(r.isNullAt(0)))
  }

  test("dropByUrl: keep-newest per normalized key; NULL keys and ids pass through") {
    import graft.ops.Dedup
    val df = Seq(
      (1L, "http://ex.com/p?utm_source=a", 10L),  // same key as 2,3
      (2L, "HTTP://EX.com:80/p/", 30L),           // newest → kept
      (3L, "http://ex.com/p#x", 30L),             // ts tie with 2 → higher id drops
      (4L, "http://ex.com/q", 5L),                // singleton → kept
      (5L, "not a url", 1L),                      // NULL key → passes
      (6L, "also not a url", 1L)                  // NULL key → passes (NOT deduped together)
    ).toDF("rec_id", "url", "ts")
    val kept = Dedup.dropByUrl(df, "url", "ts", "rec_id")
      .select("rec_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L, 5L, 6L))
    // NULL ts loses to any timestamped capture
    val df2 = Seq(
      (1L, "http://ex.com/p", Some(1L)),
      (2L, "http://ex.com/p", None: Option[Long])).toDF("rec_id", "url", "ts")
    val kept2 = Dedup.dropByUrl(df2, "url", "ts", "rec_id")
      .select("rec_id").collect().map(_.getLong(0)).toSet
    assert(kept2 == Set(1L))
  }
}
