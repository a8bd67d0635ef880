package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The stupid-backoff LM as a per-worker reference object — the CCNet
  * deployment shape (the paper ships its KenLM binary to every worker and
  * scores at read throughput): sorted-key/count long arrays per order with
  * binary-search lookups, built ONCE from a fitted
  * [[graft.ops.TextAnalysis.StupidBackoffLm]]'s count tables and shared by
  * every task through the expression's reference slot.
  *
  * Memory is bounded by the MODEL (16 bytes per distinct n-gram), not the
  * corpus — the [[graft.ops.TextAnalysis.lmKernel]] builder enforces an
  * explicit entry cap so an unexpectedly huge model fails loudly at build
  * time instead of OOMing the driver collect.
  *
  * Keys are the [[WordNGramHashes]] hashes (XXH64 seed 42 over the
  * space-joined window), computed here through the SAME code path, so the
  * kernel and the join-based scorer look up identical keys. */
final class BackoffLmKernel(
    uniKeys: Array[Long], uniCnts: Array[Long],
    biKeys: Array[Long], biCnts: Array[Long],
    triKeys: Array[Long], triCnts: Array[Long],
    val total: Long, val alpha: Double) extends Serializable {

  private def cnt(keys: Array[Long], cnts: Array[Long], k: Long): Long = {
    val i = java.util.Arrays.binarySearch(keys, k)
    if (i >= 0) cnts(i) else -1L
  }

  /** Sequential (position-order) stupid-backoff perplexity — the exact
    * arithmetic of the brute reference: `exp(−mean ln S)` over the doc's
    * trigram windows. Returns NaN when the doc has < 3 tokens (the
    * Column wrapper surfaces NULL). */
  def ppl(text: UTF8String): Double = {
    val h1 = WordNGramHashes.compute(text, 1)
    val h3 = WordNGramHashes.compute(text, 3)
    val w = h3.numElements()
    if (w == 0) return Double.NaN
    val h2 = WordNGramHashes.compute(text, 2)
    val la = math.log(alpha)
    var sum = 0.0
    var p = 0
    while (p < w) {
      val c3 = cnt(triKeys, triCnts, h3.getLong(p))
      val s =
        if (c3 >= 0) {
          // prefix bigram is necessarily in the model when the trigram is
          math.log(c3.toDouble / cnt(biKeys, biCnts, h2.getLong(p)))
        } else {
          val c2 = cnt(biKeys, biCnts, h2.getLong(p + 1))
          if (c2 >= 0) la + math.log(c2.toDouble / cnt(uniKeys, uniCnts, h1.getLong(p + 1)))
          else {
            val c1 = cnt(uniKeys, uniCnts, h1.getLong(p + 2))
            if (c1 >= 0) 2 * la + math.log(c1.toDouble / total)
            else 2 * la + math.log(1.0 / total)
          }
        }
      sum += s
      p += 1
    }
    math.exp(-sum / w)
  }
}

object BackoffLmKernel {
  /** Build from parallel (key, count) pair arrays; sorts by key. */
  def fromPairs(
      uni: Array[(Long, Long)], bi: Array[(Long, Long)], tri: Array[(Long, Long)],
      total: Long, alpha: Double): BackoffLmKernel = {
    require(total > 0, s"backoff kernel: total must be positive, got $total")
    require(alpha > 0 && alpha <= 1, s"backoff kernel: alpha in (0,1], got $alpha")
    def sorted(pairs: Array[(Long, Long)]): (Array[Long], Array[Long]) = {
      val s = pairs.sortBy(_._1)
      (s.map(_._1), s.map(_._2))
    }
    val (uk, uc) = sorted(uni)
    val (bk, bc) = sorted(bi)
    val (tk, tc) = sorted(tri)
    new BackoffLmKernel(uk, uc, bk, bc, tk, tc, total, alpha)
  }
}

/** `backoff_ppl(text)` — per-row stupid-backoff perplexity under a
  * referenced [[BackoffLmKernel]]: one native call per row, zero shuffle,
  * constant codegen size at any model size. NULL text → NULL; < 3 tokens
  * → NaN (wrap with the [[BackoffLmFunctions.backoffPpl]] Column, which
  * surfaces NULL). */
case class BackoffPpl(child: Expression, kernel: BackoffLmKernel)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"backoff_ppl requires a string input, got $other")
    }

  override protected def nullSafeEval(s: Any): Any =
    kernel.ppl(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("backoffLmKernel", kernel,
      classOf[BackoffLmKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.ppl($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BackoffLmFunctions {
  import org.apache.spark.sql.functions.{isnan, when}
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Per-row backoff perplexity as a Column: NULL for NULL/sub-3-token
    * text, else the sequential-arithmetic ppl (≡ the brute reference). */
  def backoffPpl(text: Column, kernel: BackoffLmKernel): Column = {
    val raw = ColumnBridge.column(BackoffPpl(ColumnBridge.expression(text), kernel))
    when(!isnan(raw), raw)
  }
}
