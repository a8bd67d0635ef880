package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for the engine's native expressions, so
  * `spark.sql("… dot_product(a, b) …")` works alongside the Column API.
  *
  * Two paths:
  *   - config injection: `.config("spark.sql.extensions",
  *     "graft.functions.GraftExtensions")` (or
  *     `builder.withExtensions(new GraftExtensions)`) registers at session
  *     build;
  *   - [[GraftFunctions.register]] adds the functions to an already-running
  *     session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.descriptors.foreach(e.injectFunction)
}

object GraftFunctions {
  private[functions] val descriptors
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "dot_product expects exactly 2 arguments")
        DotProduct(exprs.head, exprs(1))
      }),
    (
      FunctionIdentifier("char_ngrams"),
      new ExpressionInfo(classOf[CharNGrams].getName, "char_ngrams"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "char_ngrams expects (text, n)")
        val n = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"char_ngrams: n must be an integer literal, got $other")
        }
        CharNGrams(exprs.head, n)
      }),
    (
      FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNGrams].getName, "word_ngrams"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "word_ngrams expects (text, n)")
        val n = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"word_ngrams: n must be an integer literal, got $other")
        }
        WordNGrams(exprs.head, n)
      }),
    (
      FunctionIdentifier("word_ngram_hashes"),
      new ExpressionInfo(classOf[WordNGramHashes].getName, "word_ngram_hashes"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "word_ngram_hashes expects (text, n)")
        val n = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"word_ngram_hashes: n must be an integer literal, got $other")
        }
        WordNGramHashes(exprs.head, n)
      }),
    (
      FunctionIdentifier("warc_records"),
      new ExpressionInfo(classOf[WarcRecords].getName, "warc_records"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "warc_records expects (payload)")
        WarcRecords(exprs.head)
      }),
    (
      FunctionIdentifier("html_text"),
      new ExpressionInfo(classOf[HtmlText].getName, "html_text"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "html_text expects (html)")
        HtmlText(exprs.head)
      }))

  /** Register the engine functions into a live session. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(id.funcName, builder, "built-in")
    }
}
