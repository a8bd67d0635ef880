package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native WARC (ISO 28500 / WARC-1.x) record parser — the ingest kernel
  * for raw web-crawl corpora, the canonical 100 TB input of a training
  * pipeline. One binary payload (a WARC file, plain or gzip — including
  * the standard record-per-member multi-member gzip layout) → the array
  * of its records, in file order:
  *
  *   `array<struct<rec_type, url, warc_date, http_status, content_type,
  *   body>>`
  *
  * Parse contract (spec-derived, written against the WARC/1.1 format
  * description and RFC 9112's message framing — no parser library):
  *   - version line `WARC/…`, CRLF named headers (case-insensitive keys)
  *     up to the empty line; `Content-Length` frames the record block,
  *     which must be followed by the spec's CRLFCRLF record separator.
  *   - a block whose WARC `Content-Type` is `application/http…` is split
  *     at its own CRLFCRLF into HTTP headers and body: `http_status` from
  *     a `HTTP/x.y NNN` status line (NULL for requests), `content_type`
  *     from the HTTP `Content-Type` header; any other block is returned
  *     whole as `body` with the record-level `content_type`.
  *   - an HTTP body whose headers carry `Transfer-Encoding: chunked`
  *     (RFC 9112 §7.1 — common in live captures that record the wire
  *     bytes) is DECHUNKED: chunk-size lines (hex, optional `;ext`
  *     extensions) and their CRLF framing are stripped, the chunk data
  *     concatenated, trailers after the 0-size chunk ignored; the
  *     decoded size rides the same [[WarcRecords.MaxDecompressed]] guard
  *     as gzip. A malformed chunked body (bad hex, truncated chunk,
  *     missing CRLF) yields a NULL `body` for THAT record — the WARC
  *     framing is still sound, so sibling records survive; without
  *     dechunking, the text path would keep chunk-size framing noise
  *     inside documents and every media decode would reject.
  *   - NULL in → NULL out; anything malformed (bad framing, missing
  *     Content-Length, truncation, gzip errors, decompressed size over
  *     [[WarcRecords.MaxDecompressed]]) → NULL for the whole payload —
  *     reject explicitly, never fabricate partial records. Known strict
  *     spot: obs-fold (LWS-continuation) WARC header lines — spec-legal
  *     but deprecated since WARC/1.1 and absent from modern crawls — have
  *     no `:` on the continuation line and reject the payload.
  *
  * Scale shape: a narrow per-row projection inside whole-stage codegen
  * (one static call, the [[ImageDims]] pattern) — typically fed by
  * Spark's `binaryFile` source, then `posexplode`. The expression touches
  * each payload once; nothing corpus-sized leaves the scan until the
  * caller projects the fields it wants. */
case class WarcRecords(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true // malformed payload → NULL

  override def dataType: DataType = ArrayType(WarcRecords.recordType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"warc_records requires binary, got $other")
  }

  override protected def nullSafeEval(a: Any): Any =
    WarcRecords.parse(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("warc")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.WarcRecords.parse($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WarcRecords {

  val recordType: StructType = StructType(Seq(
    StructField("rec_type", StringType, nullable = false),
    StructField("url", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("http_status", IntegerType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    // nullable: a record whose CHUNKED body is malformed keeps its headers
    // but cannot offer decoded bytes
    StructField("body", BinaryType, nullable = true)))

  /** Decompression cap: a gzip member claiming more than this is rejected
    * (NULL) rather than ballooning executor memory — crawl data is
    * adversarial input. */
  val MaxDecompressed: Int = 1 << 26 // 64 MiB per payload

  private def indexOfCrlfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  private def indexOfCrlf(b: Array[Byte], from: Int, end: Int): Int = {
    var i = from
    while (i + 1 < end) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  /** Decode an RFC 9112 §7.1 chunked body in `[start, end)`: hex size
    * line (optional `;ext`), CRLF, `size` data bytes, CRLF — until the
    * 0-size chunk (trailers ignored; the WARC Content-Length already
    * bounds the block, so nothing after the terminator needs consuming).
    * Null for anything malformed or over [[MaxDecompressed]] decoded. */
  private def dechunk(b: Array[Byte], start: Int, end: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.min(end - start, 1 << 16).max(16))
    var p = start
    while (true) {
      val lineEnd = indexOfCrlf(b, p, end)
      // RFC 9112 puts no limit on chunk extensions, so only the line
      // itself is (generously) bounded — 4 KiB covers any legal capture
      // while still refusing a forged CRLF-free megabyte scan
      if (lineEnd < 0 || lineEnd - p > 4096) return null
      // hex prefix parsed in place (leading zeros legal; accumulation
      // capped so forged digit runs can't overflow), then optional BWS
      // and a `;ext` skipped by the scan to CRLF above
      var q = p
      var size = 0L
      var digits = 0
      while (q < lineEnd && size <= MaxDecompressed && {
        val c = b(q).toChar
        (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
      }) {
        val c = b(q).toChar
        val v = if (c <= '9') c - '0' else (c | 0x20) - 'a' + 10
        size = size * 16 + v
        digits += 1
        q += 1
      }
      if (digits == 0 || size > MaxDecompressed) return null
      while (q < lineEnd && (b(q) == ' ' || b(q) == '\t')) q += 1
      if (q < lineEnd && b(q) != ';') return null // junk after size: malformed
      p = lineEnd + 2
      if (size == 0) return out.toByteArray
      if (p + size + 2 > end) return null // truncated chunk (data + CRLF)
      out.write(b, p, size.toInt)
      if (out.size > MaxDecompressed) return null
      p += size.toInt + 2
      if (!(b(p - 2) == '\r' && b(p - 1) == '\n')) return null
    }
    null // unreachable
  }

  /** Inflate a (possibly multi-member) gzip stream, or null on any error.
    * JDK's GZIPInputStream reads concatenated members natively — the
    * standard seekable-WARC layout of one member per record. */
  private def gunzip(b: Array[Byte]): Array[Byte] = {
    try {
      val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(b))
      // initial capacity via Long arithmetic: `b.length * 4` overflows Int
      // past 512 MiB compressed and a negative capacity THROWS, escaping
      // the reject-as-NULL contract
      val cap = math.min(math.max(b.length.toLong, 16L), 1L << 16).toInt
      val out = new java.io.ByteArrayOutputStream(cap)
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        if (out.size > MaxDecompressed) return null
        n = in.read(buf)
      }
      out.toByteArray
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** All records of one WARC payload, or null if any part is malformed. */
  def parse(bytes: Array[Byte]): ArrayData = {
    val data =
      if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
        gunzip(bytes)
      else bytes
    if (data == null || data.length == 0) return null
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
    var pos = 0
    while (pos < data.length) {
      val hdrEnd = indexOfCrlfCrlf(data, pos)
      if (hdrEnd < 0) return null
      val headerText =
        new String(data, pos, hdrEnd - pos, java.nio.charset.StandardCharsets.UTF_8)
      val lines = headerText.split("\r\n", -1)
      if (!lines(0).startsWith("WARC/")) return null
      val headers = new java.util.HashMap[String, String]()
      var li = 1
      while (li < lines.length) {
        val colon = lines(li).indexOf(':')
        if (colon < 0) return null
        headers.put(lines(li).substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT),
          lines(li).substring(colon + 1).trim)
        li += 1
      }
      val clStr = headers.get("content-length")
      if (clStr == null) return null
      val cl =
        try java.lang.Long.parseLong(clStr)
        catch { case _: NumberFormatException => return null }
      val blockStart = hdrEnd + 4
      val afterBlock = blockStart + cl
      if (cl < 0 || afterBlock + 4 > data.length) return null
      if (!(data(afterBlock.toInt) == '\r' && data(afterBlock.toInt + 1) == '\n' &&
          data(afterBlock.toInt + 2) == '\r' && data(afterBlock.toInt + 3) == '\n'))
        return null
      val recType = headers.get("warc-type")
      if (recType == null) return null
      val warcCt = headers.get("content-type")

      var status: Any = null
      var outCt: String = null
      var bodyStart = blockStart
      var bodyLen = cl.toInt
      var teChunked = false
      if (warcCt != null &&
          warcCt.toLowerCase(java.util.Locale.ROOT).startsWith("application/http")) {
        // if the block has no CRLFCRLF header/body boundary (a truncated or
        // header-less capture), it is returned whole with the RECORD-level
        // content_type — same contract as non-HTTP blocks
        outCt = warcCt
        val hEnd = indexOfCrlfCrlf(data, blockStart)
        if (hEnd >= 0 && hEnd + 4 <= afterBlock) {
          outCt = null // split succeeded: content_type is the HTTP header's, or NULL
          val httpHdr =
            new String(data, blockStart, hEnd - blockStart, java.nio.charset.StandardCharsets.UTF_8)
          val hLines = httpHdr.split("\r\n", -1)
          if (hLines(0).startsWith("HTTP/")) {
            val parts = hLines(0).split(" ")
            if (parts.length >= 2)
              try status = Integer.parseInt(parts(1))
              catch { case _: NumberFormatException => () }
          }
          var hi = 1
          while (hi < hLines.length) {
            val c2 = hLines(hi).indexOf(':')
            if (c2 > 0) {
              val hName = hLines(hi).substring(0, c2).trim
              if (hName.equalsIgnoreCase("Content-Type"))
                outCt = hLines(hi).substring(c2 + 1).trim
              else if (hName.equalsIgnoreCase("Transfer-Encoding") &&
                  hLines(hi).substring(c2 + 1).toLowerCase(java.util.Locale.ROOT)
                    .contains("chunked"))
                teChunked = true
            }
            hi += 1
          }
          bodyStart = hEnd + 4
          bodyLen = (afterBlock - bodyStart).toInt
        }
      } else {
        outCt = warcCt
      }
      val body: Array[Byte] =
        if (teChunked) dechunk(data, bodyStart, bodyStart + bodyLen)
        else java.util.Arrays.copyOfRange(data, bodyStart, bodyStart + bodyLen)
      def u(s: String): Any = if (s == null) null else UTF8String.fromString(s)
      out += InternalRow(
        UTF8String.fromString(recType),
        u(headers.get("warc-target-uri")),
        u(headers.get("warc-date")),
        status,
        u(outCt),
        body)
      pos = (afterBlock + 4).toInt
    }
    new GenericArrayData(out.toArray[Any])
  }
}

object WarcFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** `warc_records(payload)` as a Column. */
  def warcRecords(payload: Column): Column =
    ColumnBridge.column(WarcRecords(ColumnBridge.expression(payload)))
}
