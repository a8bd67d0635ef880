package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Content extraction from raw crawl markup — the stage between WARC
  * ingest ([[graft.functions.WarcRecords]]) and the text operators
  * (Gopher quality, paragraph/span dedup, DSIR). Everything here is a
  * scan-shaped projection: native codegen'd expressions, no joins, no
  * shuffles — the only corpus-scale-correct shape for a per-document
  * transform over 100 TB of crawl.
  */
object Extract {

  /** Visible text of an HTML document: comments and script/style/
    * noscript/template dropped with their content, block-element
    * boundaries become single newlines, inline tags vanish, character
    * references decode, whitespace normalizes (one space within lines,
    * no empty lines). The full deterministic contract is on
    * [[graft.functions.HtmlText]]. NULL → NULL. */
  def textFromHtml(html: Column): Column =
    graft.functions.HtmlFunctions.htmlText(html)

  /** [[textFromHtml]] over a raw HTTP body as delivered by
    * `warc_records` (binary), decoding as UTF-8 first — the common
    * crawl-pipeline spelling. */
  def textFromHtmlBytes(body: Column): Column =
    textFromHtml(body.cast("string"))
}
