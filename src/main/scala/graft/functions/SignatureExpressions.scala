package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Per-row signature kernels for the dedup pipelines.
  *
  * The aggregate formulation (explode shingles → grouped `min(xxhash64)` /
  * bit-vote aggregate) costs one full shuffle on the doc id before any
  * candidate generation happens. A document's signature is a pure function
  * of its own shingle array, so these expressions compute it in ONE pass
  * per row inside whole-stage codegen — the signature table becomes a
  * narrow projection with ZERO shuffles, and the only exchange left in a
  * dedup query is the candidate join itself.
  *
  * Hash identity: slot j = `XXH64.hashInt(j, hashUTF8String(tok, 42))`,
  * exactly Spark's `xxhash64(tok, lit(j))`; the xor fingerprints use seeds
  * 101/202 the same way — so signatures are bit-identical to the previous
  * aggregate formulation and candidate sets are unchanged.
  */
case class MinHashMeta(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1 && k <= 1024, s"minhash_meta requires 1 <= k <= 1024, got $k")

  override def nullable: Boolean = true // empty shingle array → NULL

  override def dataType: DataType = StructType(Seq(
    StructField("sig", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("x1", LongType, nullable = false),
    StructField("x2", LongType, nullable = false),
    StructField("nsh", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"minhash_meta requires array<string>, got $other")
  }

  override protected def nullSafeEval(a: Any): Any =
    MinHashMeta.compute(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("row")
      s"""
         |InternalRow $r = graft.functions.MinHashMeta.compute($c, $k);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashMeta {
  /** One pass over the shingle array: all k slot-mins + two xor
    * fingerprints + the set size. NULL (no signature) for empty arrays,
    * mirroring the explode-based formulation where such docs never
    * produced a row. */
  def compute(arr: ArrayData, k: Int): InternalRow = {
    val n = arr.numElements()
    if (n == 0) return null
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var x1 = 0L
    var x2 = 0L
    var i = 0
    while (i < n) {
      val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      var j = 0
      while (j < k) {
        val hj = XXH64.hashInt(j, h)
        if (hj < mins(j)) mins(j) = hj
        j += 1
      }
      x1 ^= XXH64.hashInt(101, h)
      x2 ^= XXH64.hashInt(202, h)
      i += 1
    }
    InternalRow(UnsafeArrayData.fromPrimitiveArray(mins), x1, x2, n)
  }
}

/** 64-bit SimHash of a shingle array — per-bit majority vote of
  * `xxhash64(tok)`, identical values to the exploded bit-vote aggregate. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def nullable: Boolean = true // empty shingle array → NULL

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"simhash64 requires array<string>, got $other")
  }

  override protected def nullSafeEval(a: Any): Any =
    SimHash64.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("sim")
      s"""
         |Object $r = graft.functions.SimHash64.compute($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Long) $r).longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  def compute(arr: ArrayData): Any = {
    val n = arr.numElements()
    if (n == 0) return null
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sim |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(sim)
  }
}

object SignatureFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** `minhash_meta(shingles, k)` — struct(sig, x1, x2, nsh), NULL on empty. */
  def minhashMeta(shingles: Column, k: Int): Column =
    ColumnBridge.column(MinHashMeta(ColumnBridge.expression(shingles), k))

  /** `simhash64(shingles)` — 64-bit majority-vote SimHash, NULL on empty. */
  def simhash64(shingles: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(shingles)))
}
