package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product of two `array<double>` columns.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) are evaluated
  * interpreted — per-element lambda dispatch plus an intermediate array
  * allocation per row — which dominates wall-clock when scoring millions of
  * vector pairs. This expression is a single primitive `while` loop over
  * `ArrayData` in both the interpreted path and the generated code, keeping
  * pairwise scoring inside whole-stage codegen (SURVEY §4: custom
  * `Expression` preferred over UDFs).
  *
  * Returns NULL if either side is NULL; throws on a dimension mismatch —
  * silently iterating a common prefix would quietly score (and bucket)
  * vectors on a truncated subspace, a recall loss with no error anywhere.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_product requires array<double> inputs, got ${left.dataType} / ${right.dataType}")
    }
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = DotProduct.checkDims(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = graft.functions.DotProduct.checkDims($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Shared by the interpreted and generated paths (must be public static
    * for codegen'd classes to call it). */
  def checkDims(a: Int, b: Int): Int = {
    if (a != b)
      throw new IllegalArgumentException(s"dot_product: dimension mismatch ($a vs $b)")
    a
  }
}

/** A centroid matrix flattened for tight scoring loops — the broadcast-by-
  * reference codebook behind [[CentroidArgmax]]/[[CentroidTopN]]. One
  * instance is shipped to executors inside the serialized expression (and
  * referenced, not re-generated, in codegen), so the per-centroid cost is
  * a fused multiply-add, NOT one unrolled Catalyst expression per centroid
  * — the unrolled spelling hits the codegen method-size ceiling near 1k
  * centroids and capped the IVF cell count there. */
final class CentroidMatrix(val k: Int, val dim: Int, val flat: Array[Double])
    extends Serializable {

  private def checkDim(n: Int): Unit =
    if (n != dim)
      throw new IllegalArgumentException(
        s"centroid kernel: vector dim $n != centroid dim $dim")

  /** Index of the max-dot centroid; ties resolve to the LOWEST index
    * (the `array_position(scores, array_max(scores)) - 1` convention the
    * unrolled spelling had). */
  def argmax(v: ArrayData): Int = {
    val n = v.numElements(); checkDim(n)
    var best = 0; var bestScore = Double.NegativeInfinity
    var c = 0; var off = 0
    while (c < k) {
      var acc = 0.0; var j = 0
      while (j < dim) { acc += flat(off + j) * v.getDouble(j); j += 1 }
      if (acc > bestScore) { bestScore = acc; best = c }
      c += 1; off += dim
    }
    best
  }

  /** Best centroid under the GRID-QUANTIZED compare of
    * [[graft.ops.Similarity.assignNearestCentroid]]: the comparison key is
    * `floor(dot·1e6 + 0.5)` as a long — centroids whose dots agree within
    * 1e-6 are ties and break toward the LOWEST index, so the assignment is
    * reproducible across engines / float summation orders (the same
    * contract the cross-engine oracles rely on). Inputs are expected
    * unit-norm on BOTH sides so the dot IS the cosine. Returns
    * `(bestIndex, fullPrecisionDotOfWinner)` packed in an
    * [[org.apache.spark.sql.catalyst.InternalRow]]. */
  def bestGrid(v: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = v.numElements(); checkDim(n)
    var best = 0; var bestKey = Long.MinValue; var bestDot = Double.NegativeInfinity
    var c = 0; var off = 0
    while (c < k) {
      var acc = 0.0; var j = 0
      while (j < dim) { acc += flat(off + j) * v.getDouble(j); j += 1 }
      val key = math.floor(acc * 1e6 + 0.5).toLong
      if (key > bestKey) { bestKey = key; bestDot = acc; best = c }
      c += 1; off += dim
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](best, bestDot))
  }

  /** Indices of the `n` largest-dot centroids, ordered by (dot desc,
    * index asc) — the row_number-over-(cscore desc, cell asc) convention
    * of the old windowed probe ranking. Insertion into a size-n buffer:
    * O(k·dim + k·n), n is nProbe-small. */
  def topN(v: ArrayData, n: Int): ArrayData = {
    val m = v.numElements(); checkDim(m)
    val take = math.min(n, k)
    val scores = new Array[Double](take)
    val idx = new Array[Int](take)
    var filled = 0
    var c = 0; var off = 0
    while (c < k) {
      var acc = 0.0; var j = 0
      while (j < dim) { acc += flat(off + j) * v.getDouble(j); j += 1 }
      // find insertion point from the back (strictly-greater keeps the
      // first-seen centroid ahead on ties = lowest index wins)
      var p = filled
      while (p > 0 && scores(p - 1) < acc) p -= 1
      if (p < take) {
        val last = math.min(filled, take - 1)
        var q = last
        while (q > p) { scores(q) = scores(q - 1); idx(q) = idx(q - 1); q -= 1 }
        scores(p) = acc; idx(p) = c
        if (filled < take) filled += 1
      }
      c += 1; off += dim
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(idx, filled))
  }
}

object CentroidMatrix {
  def apply(centroids: Seq[Seq[Double]]): CentroidMatrix = {
    require(centroids.nonEmpty, "empty centroid matrix")
    val dim = centroids.head.size
    require(centroids.forall(_.size == dim), "ragged centroid matrix")
    val flat = new Array[Double](centroids.size * dim)
    var c = 0
    centroids.foreach { row =>
      var j = 0
      row.foreach { x => flat(c * dim + j) = x; j += 1 }
      c += 1
    }
    new CentroidMatrix(centroids.size, dim, flat)
  }
}

/** Nearest-centroid assignment (`argmax` of centroid dot products) as ONE
  * native expression looping a referenced [[CentroidMatrix]] — constant
  * codegen size at ANY centroid count, replacing the per-centroid unrolled
  * expression that capped IVF at 1024 cells. NULL vector → NULL. */
case class CentroidArgmax(child: Expression, centroids: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  @transient private lazy val matrix = CentroidMatrix(centroids)

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"centroid_argmax requires array<double>, got $other")
    }

  override protected def nullSafeEval(v: Any): Any =
    matrix.argmax(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidMatrix", matrix, classOf[CentroidMatrix].getName)
    defineCodeGen(ctx, ev, v => s"$ref.argmax($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The `n` nearest centroids (by dot, ties to the lowest index) as an
  * `array<int>` — the probe-cell selection of IVF search in one native
  * loop, replacing posexplode-all-cells + a per-query row_number window
  * (which shuffled |queries|·k rows to rank them). NULL vector → NULL. */
case class CentroidTopN(child: Expression, centroids: Seq[Seq[Double]], n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(n >= 1, s"centroid_topn needs n >= 1, got $n")

  @transient private lazy val matrix = CentroidMatrix(centroids)

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"centroid_topn requires array<double>, got $other")
    }

  override protected def nullSafeEval(v: Any): Any =
    matrix.topN(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidMatrix", matrix, classOf[CentroidMatrix].getName)
    defineCodeGen(ctx, ev, v => s"$ref.topN($v, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Nearest-centroid assignment under the grid-quantized tie-break of
  * [[CentroidMatrix.bestGrid]], returning `struct(cluster int, dot
  * double)` in ONE native loop per row — the scale shape for SemDeDup /
  * Lloyd assignment: constant codegen size at any cluster count and no
  * n×k broadcast-join intermediate (which `assignNearestCentroid`'s
  * cross-join spelling materializes). NULL vector → NULL struct. */
case class CentroidBest(child: Expression, centroids: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  @transient private lazy val matrix = CentroidMatrix(centroids)

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("cluster",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("dot", DoubleType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"centroid_best requires array<double>, got $other")
    }

  override protected def nullSafeEval(v: Any): Any =
    matrix.bestGrid(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidMatrix", matrix, classOf[CentroidMatrix].getName)
    defineCodeGen(ctx, ev, v => s"$ref.bestGrid($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Product-quantization codebooks flattened for tight encode/score loops
  * — `m` subspaces × `ksub` sub-centroids of `dsub` dims, plus the
  * precomputed −|c|²/2 terms the L2-argmin-as-argmax encode needs. The
  * same referenced-object pattern as [[CentroidMatrix]]: constant codegen
  * size regardless of m × ksub, no per-subspace `slice()` array
  * allocations (the unrolled spelling built m·ksub temporary arrays per
  * encoded row). */
final class PqCodebook(
    val m: Int, val ksub: Int, val dsub: Int,
    flat: Array[Double], halfSq: Array[Double]) extends Serializable {

  private def checkDim(n: Int): Unit =
    if (n != m * dsub)
      throw new IllegalArgumentException(
        s"pq kernel: vector dim $n != m*dsub = ${m * dsub}")

  /** Per-subspace L2-argmin code (via argmax of `v·c − |c|²/2`; ties to
    * the lowest sub-centroid index — the array_position convention). */
  def encode(v: ArrayData): ArrayData = {
    checkDim(v.numElements())
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      val base = j * dsub
      var best = 0; var bestScore = Double.NegativeInfinity
      var t = 0
      while (t < ksub) {
        val off = (j * ksub + t) * dsub
        var acc = -halfSq(j * ksub + t)
        var d = 0
        while (d < dsub) { acc += flat(off + d) * v.getDouble(base + d); d += 1 }
        if (acc > bestScore) { bestScore = acc; best = t }
        t += 1
      }
      codes(j) = best
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  /** Asymmetric-distance score `Σⱼ q_subⱼ · cbⱼ[codeⱼ]` — the query exact,
    * the corpus side its reconstruction. */
  def adc(q: ArrayData, codes: ArrayData): Double = {
    checkDim(q.numElements())
    if (codes.numElements() != m)
      throw new IllegalArgumentException(
        s"pq kernel: ${codes.numElements()} codes for m=$m subspaces")
    var acc = 0.0
    var j = 0
    while (j < m) {
      val off = (j * ksub + codes.getInt(j)) * dsub
      val base = j * dsub
      var d = 0
      while (d < dsub) { acc += flat(off + d) * q.getDouble(base + d); d += 1 }
      j += 1
    }
    acc
  }
}

object PqCodebook {
  def apply(codebooks: Seq[Seq[Seq[Double]]]): PqCodebook = {
    require(codebooks.nonEmpty && codebooks.head.nonEmpty, "empty PQ codebooks")
    val m = codebooks.size
    val ksubMax = codebooks.map(_.size).max
    val dsub = codebooks.head.head.size
    require(codebooks.forall(_.forall(_.size == dsub)), "ragged PQ codebooks")
    // a degenerate fit can return fewer than ksub centers in a subspace;
    // pad with -inf-score phantoms (never selected: |c|²/2 = +inf)
    val flat = new Array[Double](m * ksubMax * dsub)
    val halfSq = Array.fill(m * ksubMax)(Double.PositiveInfinity)
    for (j <- 0 until m; t <- codebooks(j).indices) {
      val c = codebooks(j)(t)
      var s = 0.0
      var d = 0
      while (d < dsub) { flat((j * ksubMax + t) * dsub + d) = c(d); s += c(d) * c(d); d += 1 }
      halfSq(j * ksubMax + t) = s / 2.0
    }
    new PqCodebook(m, ksubMax, dsub, flat, halfSq)
  }
}

/** PQ encode as ONE native loop (array<int> of per-subspace codes) —
  * replaces m·ksub unrolled sliced-dot expressions. NULL vector → NULL. */
case class PqEncode(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  @transient private lazy val book = PqCodebook(codebooks)

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode requires array<double>, got $other")
    }

  override protected def nullSafeEval(v: Any): Any =
    book.encode(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebook", book, classOf[PqCodebook].getName)
    defineCodeGen(ctx, ev, v => s"$ref.encode($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC score of (query vector, code array) under a referenced codebook —
  * replaces m unrolled sliced dots per candidate row. NULL → NULL. */
case class PqAdcScore(left: Expression, right: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends BinaryExpression {

  @transient private lazy val book = PqCodebook(codebooks)

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(org.apache.spark.sql.types.IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_adc requires (array<double>, array<int>), got $other")
    }

  override protected def nullSafeEval(q: Any, codes: Any): Any =
    book.adc(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebook", book, classOf[PqCodebook].getName)
    defineCodeGen(ctx, ev, (q, c) => s"$ref.adc($q, $c)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Two-level (coarse → fine) centroid routing for SemDeDup at scale.
  *
  * Exact Lloyd assignment is O(k·dim) per row with k = n/targetClusterRows
  * — quadratic in corpus size, infeasible at 10⁹+ vectors on any engine
  * (the SemDeDup paper runs its k-means on GPUs via approximate search for
  * the same reason). This matrix holds √k-ish COARSE routing centroids
  * plus, per coarse cell, that cell's FINE centroids; a row probes its
  * `nProbe` best coarse cells (grid key, ties to the lowest cell) and
  * arg-maxes only over those cells' fine centroids — O((kCoarse +
  * nProbe·maxFine)·dim) per row, O(√k·dim) at balanced sizing.
  *
  * Determinism contract (the [[CentroidMatrix.bestGrid]] conventions):
  * every compare runs on the `floor(dot·1e6 + 0.5)` grid; coarse probe
  * ties break to the lowest cell index; the fine argmax iterates probed
  * cells in ASCENDING cell order, so first-seen-wins = lowest GLOBAL fine
  * id (ids are cell-major: cell c's fine centroids are numbered
  * `offset(c) .. offset(c)+size(c)-1`). Cells may be ragged; empty cells
  * are disallowed (drop them — and reindex — at model build). */
final class TwoLevelMatrix(
    val kCoarse: Int, val dim: Int,
    coarseFlat: Array[Double],
    cellOffset: Array[Int], // length kCoarse+1, prefix sums into fineFlat
    fineFlat: Array[Double]) extends Serializable {

  def kFineTotal: Int = cellOffset(kCoarse)

  private def checkDim(n: Int): Unit =
    if (n != dim)
      throw new IllegalArgumentException(
        s"two-level kernel: vector dim $n != matrix dim $dim")

  /** `(globalFineId, fullPrecisionDotOfWinner)` under the two-level route. */
  def bestTwoLevel(v: ArrayData, nProbe: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val n = v.numElements(); checkDim(n)
    val vv = new Array[Double](dim)
    var j = 0
    while (j < dim) { vv(j) = v.getDouble(j); j += 1 }
    // probe: top-nProbe coarse cells by (gridKey desc, cell asc)
    val take = math.min(nProbe, kCoarse)
    val pKeys = new Array[Long](take)
    val pIdx = new Array[Int](take)
    var filled = 0
    var c = 0; var off = 0
    while (c < kCoarse) {
      var acc = 0.0
      j = 0
      while (j < dim) { acc += coarseFlat(off + j) * vv(j); j += 1 }
      val key = math.floor(acc * 1e6 + 0.5).toLong
      // strictly-greater insertion keeps the first-seen (lowest) cell on ties
      var p = filled
      while (p > 0 && pKeys(p - 1) < key) p -= 1
      if (p < take) {
        val last = math.min(filled, take - 1)
        var q = last
        while (q > p) { pKeys(q) = pKeys(q - 1); pIdx(q) = pIdx(q - 1); q -= 1 }
        pKeys(p) = key; pIdx(p) = c
        if (filled < take) filled += 1
      }
      c += 1; off += dim
    }
    // fine argmax over probed cells, visited in ASCENDING cell order so
    // grid ties break to the lowest global fine id
    java.util.Arrays.sort(pIdx, 0, filled)
    var best = -1; var bestKey = Long.MinValue; var bestDot = Double.NegativeInfinity
    var pi = 0
    while (pi < filled) {
      val cell = pIdx(pi)
      var g = cellOffset(cell)
      val end = cellOffset(cell + 1)
      var foff = g * dim
      while (g < end) {
        var acc = 0.0
        j = 0
        while (j < dim) { acc += fineFlat(foff + j) * vv(j); j += 1 }
        val key = math.floor(acc * 1e6 + 0.5).toLong
        if (key > bestKey) { bestKey = key; bestDot = acc; best = g }
        g += 1; foff += dim
      }
      pi += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](best, bestDot))
  }
}

object TwoLevelMatrix {
  def apply(coarse: Seq[Seq[Double]], fineByCell: Seq[Seq[Seq[Double]]]): TwoLevelMatrix = {
    require(coarse.nonEmpty, "two-level matrix: empty coarse set")
    require(coarse.size == fineByCell.size,
      s"two-level matrix: ${coarse.size} coarse cells vs ${fineByCell.size} fine groups")
    require(fineByCell.forall(_.nonEmpty),
      "two-level matrix: empty coarse cell — drop and reindex before building")
    val dim = coarse.head.size
    require(coarse.forall(_.size == dim) && fineByCell.forall(_.forall(_.size == dim)),
      "two-level matrix: ragged vectors")
    val kCoarse = coarse.size
    val coarseFlat = new Array[Double](kCoarse * dim)
    coarse.zipWithIndex.foreach { case (row, c) =>
      var j = 0; row.foreach { x => coarseFlat(c * dim + j) = x; j += 1 }
    }
    val cellOffset = new Array[Int](kCoarse + 1)
    fineByCell.zipWithIndex.foreach { case (g, c) => cellOffset(c + 1) = cellOffset(c) + g.size }
    val fineFlat = new Array[Double](cellOffset(kCoarse) * dim)
    var g = 0
    fineByCell.foreach(_.foreach { row =>
      var j = 0; row.foreach { x => fineFlat(g * dim + j) = x; j += 1 }
      g += 1
    })
    new TwoLevelMatrix(kCoarse, dim, coarseFlat, cellOffset, fineFlat)
  }
}

/** Two-level best-centroid assignment as one native expression:
  * `struct(cluster int, dot double)` where `cluster` is the GLOBAL fine
  * centroid id (cell-major). Same reference-object pattern as
  * [[CentroidBest]] — constant codegen size at any k. NULL vector → NULL. */
case class TwoLevelBest(
    child: Expression,
    coarse: Seq[Seq[Double]],
    fineByCell: Seq[Seq[Seq[Double]]],
    nProbe: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(nProbe >= 1, s"two_level_best needs nProbe >= 1, got $nProbe")

  @transient private lazy val matrix = TwoLevelMatrix(coarse, fineByCell)

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("cluster",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("dot", DoubleType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"two_level_best requires array<double>, got $other")
    }

  override protected def nullSafeEval(v: Any): Any =
    matrix.bestTwoLevel(v.asInstanceOf[ArrayData], nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("twoLevelMatrix", matrix, classOf[TwoLevelMatrix].getName)
    defineCodeGen(ctx, ev, v => s"$ref.bestTwoLevel($v, $nProbe)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** `dot_product(a, b)` as a Column (arrays must be `array<double>`). */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** PQ code assignment as a Column. */
  def pqEncode(v: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(v), codebooks))

  /** ADC score as a Column. */
  def pqAdc(q: Column, codes: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(PqAdcScore(
      ColumnBridge.expression(q), ColumnBridge.expression(codes), codebooks))

  /** Nearest-centroid index as a Column. */
  def centroidArgmax(v: Column, centroids: Seq[Seq[Double]]): Column =
    ColumnBridge.column(CentroidArgmax(ColumnBridge.expression(v), centroids))

  /** `n` nearest centroid indices as a Column. */
  def centroidTopN(v: Column, centroids: Seq[Seq[Double]], n: Int): Column =
    ColumnBridge.column(CentroidTopN(ColumnBridge.expression(v), centroids, n))

  /** Grid-quantized best centroid as a `struct(cluster, dot)` Column. */
  def centroidBest(v: Column, centroids: Seq[Seq[Double]]): Column =
    ColumnBridge.column(CentroidBest(ColumnBridge.expression(v), centroids))

  /** Two-level (coarse-probe → fine-argmax) best centroid as a
    * `struct(cluster, dot)` Column; `cluster` is the global fine id. */
  def twoLevelBest(v: Column, coarse: Seq[Seq[Double]],
      fineByCell: Seq[Seq[Seq[Double]]], nProbe: Int): Column =
    ColumnBridge.column(TwoLevelBest(ColumnBridge.expression(v), coarse, fineByCell, nProbe))
}
