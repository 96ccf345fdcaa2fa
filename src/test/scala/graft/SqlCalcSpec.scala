package graft

import graft.sqlext.GraftFunctions
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The series-calculus cs_* SQL surface (SeriesCalcFns): the reference's
  * own worked examples (user_guide.html) are the contract for the
  * alignment family; the cumulative/window/grid/group families are
  * asserted against hand-computed fixtures and their frame-level twins
  * (Aggs / Moving) on the same data.
  */
class SqlCalcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sql1[T](q: String): T = {
    GraftFunctions.register(spark)
    spark.sql(s"SELECT $q AS r").head().getAs[T]("r")
  }
  private def arr(q: String): Seq[Any] =
    sql1[scala.collection.Seq[Any]](q).toSeq

  // ---- alignment family: the reference user guide's worked examples ----

  test("cs_asof_join_pos matches the reference doc example (NEAREST ts)") {
    // user_guide.html: cs_asof_join_pos('{4,9}','{1,3,6,10}') = {1,3} —
    // left 9 matches the FUTURE ts 10 (nearest, not backward-only)
    assert(arr("cs_asof_join_pos(array(4L,9L), array(1L,3L,6L,10L))") == Seq(1L, 3L))
  }

  test("cs_asof_join matches the reference doc example") {
    // cs_asof_join('{4,9}','{1,3,6,10}','{0.1,0.3,0.6,1.0}') = {0.3,1.0}
    assert(arr(
      "cs_asof_join(array(4L,9L), array(1L,3L,6L,10L), array(0.1D,0.3D,0.6D,1.0D))")
      == Seq(0.3, 1.0))
  }

  test("cs_asof_join nearest tie goes to the earlier right element") {
    // t=5 is equidistant from 4 and 6 → earlier (pos 0) wins
    assert(arr("cs_asof_join_pos(array(5L), array(4L,6L))") == Seq(0L))
    // empty right → null (no position exists)
    assert(arr("cs_asof_join_pos(array(5L), CAST(array() AS ARRAY<BIGINT>))") == Seq(null))
  }

  test("cs_join / cs_join_pos match the reference doc example") {
    // cs_join_pos('{0,2,3,8,10}','{1,3,6,10}') = {1,3}
    assert(arr("cs_join_pos(array(0L,2L,3L,8L,10L), array(1L,3L,6L,10L))") == Seq(1L, 3L))
    assert(arr(
      "cs_join(array(0L,2L,3L,8L,10L), array(1L,3L,6L,10L), array(0.1D,0.3D,0.6D,1.0D))")
      == Seq(0.3, 1.0))
  }

  test("cs_join duplicate equal timestamps pair one-to-one") {
    // the merge advances BOTH cursors on a match: [5,5] x [5,5] → [0,1]
    assert(arr("cs_join_pos(array(5L,5L), array(5L,5L))") == Seq(0L, 1L))
    // left has more duplicates than right → extras unmatched
    assert(arr("cs_join_pos(array(5L,5L,5L), array(5L,5L))") == Seq(0L, 1L))
  }

  test("cs_stretch matches the reference doc example (first right ts > left)") {
    // cs_stretch('{1,2,3,4,5}','{2,4}','{1.1,2.2}',1.0) = {1.1,2.2,2.2,1.0,1.0}
    assert(arr(
      "cs_stretch(array(1L,2L,3L,4L,5L), array(2L,4L), array(1.1D,2.2D), 1.0D)")
      == Seq(1.1, 2.2, 2.2, 1.0, 1.0))
  }

  test("cs_stretch0 matches the reference doc example (merged ts union)") {
    // cs_stretch0('{1,2,3,5}','{2,3,4}','{1.1,1.2,1.3}',0.0) = {0,1.1,1.2,1.3,0}
    assert(arr(
      "cs_stretch0(array(1L,2L,3L,5L), array(2L,3L,4L), array(1.1D,1.2D,1.3D), 0.0D)")
      == Seq(0.0, 1.1, 1.2, 1.3, 0.0))
  }

  test("align value ops reject a too-short values series, like the reference") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT cs_join(array(1L), array(1L,2L), array(0.5D)) AS r").head()
    }
    assert(e.getMessage.contains("too short") ||
      e.getCause != null && e.getCause.getMessage.contains("too short"))
  }

  // ---- cumulative family vs hand computation ----

  test("cs_cum_* agree with hand-computed prefixes") {
    val xs = "array(2.0D, 4.0D, 1.0D, 3.0D)"
    assert(arr(s"cs_cum_sum($xs)") == Seq(2.0, 6.0, 7.0, 10.0))
    assert(arr(s"cs_cum_avg($xs)") == Seq(2.0, 3.0, 7.0 / 3, 2.5))
    assert(arr(s"cs_cum_min($xs)") == Seq(2.0, 2.0, 1.0, 1.0))
    assert(arr(s"cs_cum_max($xs)") == Seq(2.0, 4.0, 4.0, 4.0))
    assert(arr(s"cs_cum_prd($xs)") == Seq(2.0, 8.0, 8.0, 24.0))
    // naive var: (Σx² − (Σx)²/n)/n — prefix [2,4]: (20 − 18)/2 = 1
    val v = arr(s"cs_cum_var($xs)").map(_.asInstanceOf[Double])
    assert(math.abs(v(1) - 1.0) < 1e-12)
    val d = arr(s"cs_cum_dev($xs)").map(_.asInstanceOf[Double])
    assert(math.abs(d(1) - 1.0) < 1e-12)
  }

  test("cs_cum_sum agrees with the frame-level Aggs.cumAgg") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(200)(rnd.nextDouble() * 100)
    val frame = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("pos", "v")
    val expect = graft.agg.Aggs.cumAgg(frame, Seq(), "v")
      .orderBy("pos").select("cum_sum").as[Double].collect().toSeq
    val got = Seq(Tuple1(xs.toArray)).toDF("xs")
      .select(expr("cs_cum_sum(xs)").as("c")).as[Seq[Double]].head()
    expect.zip(got).foreach { case (e, g) => assert(math.abs(e - g) < 1e-6) }
  }

  // ---- moving-window family ----

  test("cs_window_* warm-up and steady state match the reference ring buffer") {
    val xs = "array(1.0D, 2.0D, 3.0D, 4.0D)"
    // sum covers the actual prefix; avg divides by the FIXED interval
    assert(arr(s"cs_window_sum($xs, 2)") == Seq(1.0, 3.0, 5.0, 7.0))
    assert(arr(s"cs_window_avg($xs, 2)") == Seq(0.5, 1.5, 2.5, 3.5))
    // min/max use the true trailing window over the actual prefix
    assert(arr(s"cs_window_min($xs, 2)") == Seq(1.0, 1.0, 2.0, 3.0))
    assert(arr(s"cs_window_max($xs, 2)") == Seq(1.0, 2.0, 3.0, 4.0))
    // atr: growing divisor n' = min(i+1, n): a₀=1; a₁=(1+2)/2=1.5; ...
    val atr = arr(s"cs_window_atr($xs, 2)").map(_.asInstanceOf[Double])
    assert(atr(0) == 1.0 && atr(1) == 1.5 && atr(2) == (1.5 + 3) / 2)
  }

  test("cs_window_sum/avg agree with the frame-level Moving.windowAgg") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(13)
    val xs = Seq.fill(100)(rnd.nextDouble() * 50)
    val frame = xs.zipWithIndex.map { case (x, i) => ("k", i.toLong, x) }
      .toDF("key", "pos", "v")
    // w_sum covers the actual prefix; w_avg_ref is the fixed-N divisor —
    // exactly the array form's ring-buffer warm-up semantics
    val expect = graft.window.Moving.windowAgg(frame, Seq("key"), "v", 7)
      .orderBy("pos").select("w_sum", "w_avg_ref")
      .as[(Double, Double)].collect().toSeq
    val got = Seq(Tuple1(xs.toArray)).toDF("xs")
      .select(expr("cs_window_sum(xs, 7)").as("s"), expr("cs_window_avg(xs, 7)").as("a"))
      .as[(Seq[Double], Seq[Double])].head()
    expect.zipWithIndex.foreach { case ((es, ea), i) =>
      assert(math.abs(es - got._1(i)) < 1e-6, s"sum at $i")
      assert(math.abs(ea - got._2(i)) < 1e-6, s"avg at $i")
    }
  }

  // ---- grid family ----

  test("cs_grid_* bucket with a partial tail, like Aggs.gridAgg") {
    val xs = "array(1.0D, 2.0D, 3.0D, 4.0D, 5.0D)"
    assert(arr(s"cs_grid_sum($xs, 2)") == Seq(3.0, 7.0, 5.0))
    assert(arr(s"cs_grid_avg($xs, 2)") == Seq(1.5, 3.5, 5.0)) // tail ÷ its count
    assert(arr(s"cs_grid_min($xs, 2)") == Seq(1.0, 3.0, 5.0))
    assert(arr(s"cs_grid_max($xs, 2)") == Seq(2.0, 4.0, 5.0))
  }

  // ---- run-group family ----

  test("cs_group_* aggregate runs of equal adjacent group values") {
    val vals = "array(1.0D, 2.0D, 3.0D, 4.0D, 5.0D)"
    val grps = "array(7L, 7L, 8L, 7L, 7L)" // three runs: [0,1], [2], [3,4]
    assert(arr(s"cs_group_count($grps)") == Seq(2L, 1L, 2L))
    assert(arr(s"cs_group_sum($vals, $grps)") == Seq(3.0, 3.0, 9.0))
    assert(arr(s"cs_group_first($vals, $grps)") == Seq(1.0, 3.0, 4.0))
    assert(arr(s"cs_group_last($vals, $grps)") == Seq(2.0, 3.0, 5.0))
    // bitwise any/all and exact per-run distinct over long values
    val lv = "array(6L, 3L, 4L, 5L, 5L)"
    assert(arr(s"cs_group_any($lv, $grps)") == Seq(7L, 4L, 5L))
    assert(arr(s"cs_group_all($lv, $grps)") == Seq(2L, 4L, 5L))
    assert(arr(s"cs_group_approxdc($lv, $grps)") == Seq(2L, 1L, 1L))
  }

  test("cs_win_group_* are length-preserving over the same runs") {
    val vals = "array(1.0D, 2.0D, 3.0D, 4.0D, 5.0D)"
    val grps = "array(7L, 7L, 8L, 7L, 7L)"
    assert(arr(s"cs_win_group_sum($vals, $grps)") == Seq(3.0, 3.0, 3.0, 9.0, 9.0))
    assert(arr(s"cs_win_group_count($grps)") == Seq(2L, 2L, 1L, 2L, 2L))
  }

  // ---- sort / rank / top ----

  test("cs_sort_pos is the stable permutation; desc re-sorts ties by position") {
    assert(arr("cs_sort_pos(array(3.0D, 1.0D, 3.0D, 2.0D), true)") == Seq(1L, 3L, 0L, 2L))
    // desc: equal values keep ascending source order (0 before 2)
    assert(arr("cs_sort_pos(array(3.0D, 1.0D, 3.0D, 2.0D), false)") == Seq(0L, 2L, 3L, 1L))
  }

  test("cs_dense_rank shares ranks without gaps; cs_sort is sorted values") {
    assert(arr("cs_dense_rank(array(30.0D, 10.0D, 30.0D, 20.0D), true)")
      == Seq(3L, 1L, 3L, 2L))
    assert(arr("cs_sort(array(3.0D, 1.0D, 2.0D), true)") == Seq(1.0, 2.0, 3.0))
  }

  test("cs_top_max_pos / cs_top_min_pos break ties by position") {
    assert(arr("cs_top_max_pos(array(5.0D, 9.0D, 5.0D, 9.0D), 3)") == Seq(1L, 3L, 0L))
    assert(arr("cs_top_min_pos(array(5.0D, 9.0D, 5.0D, 9.0D), 2)") == Seq(0L, 2L))
  }

  // ---- histogram / extrema / conditional ----

  test("cs_histogram clamps the rounded upper-boundary bin") {
    // width = 0.1/3 rounds so that nextDown(0.1)/width == 3.0 exactly —
    // bin 3 of 3 without the clamp → must land in bin 2, not crash
    val x = java.lang.Math.nextDown(0.1)
    assert((x / ((0.1 - 0.0) / 3)).toInt == 3) // the trap is real
    GraftFunctions.register(spark)
    val r = spark.sql(s"SELECT cs_histogram(array(${x}D, 0.01D), 0.0D, 0.1D, 3) AS r")
      .head().getAs[scala.collection.Seq[Long]]("r").toSeq
    assert(r == Seq(1L, 0L, 1L))
  }

  test("cs_histogram agrees with the frame-level Aggs.histogram") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(31)
    val xs = Seq.fill(500)(rnd.nextDouble() * 10 - 1) // some out of [0, 8)
    val frame = xs.map(Tuple1(_)).toDF("v")
    val expect = graft.agg.Aggs.histogram(frame, "v", 0.0, 8.0, 4)
      .orderBy("bin").as[(Long, Long)].collect().toMap
    val got = Seq(Tuple1(xs.toArray)).toDF("xs")
      .select(expr("cs_histogram(xs, 0.0D, 8.0D, 4)").as("h")).as[Seq[Long]].head()
    got.zipWithIndex.foreach { case (n, b) =>
      assert(n == expect.getOrElse(b.toLong, 0L), s"bin $b")
    }
  }

  test("cs_extrema finds alternating trend reversals") {
    // 1 3 2 4 4 1: max at 1, min at 2, and the plateau's LAST element (4)
    // is the max before the fall — the carried-sign convention
    assert(arr("cs_extrema(array(1.0D, 3.0D, 2.0D, 4.0D, 4.0D, 1.0D))")
      == Seq(1L, 2L, 4L))
  }

  test("cs_if consumes each branch in order (stateful conditional)") {
    // TRUE rows read then[0], then[1], ...; FALSE rows read else[0], ...
    assert(arr(
      "cs_if(array(true, false, true, false), array(10.0D, 20.0D), array(1.0D, 2.0D))")
      == Seq(10.0, 1.0, 20.0, 2.0))
    // exhausted branch → null
    assert(arr("cs_if(array(true, true), array(10.0D), array(1.0D))")
      == Seq(10.0, null))
  }

  // ---- slicing family and its reference sugar ----

  test("cs_limit and the head/tail/cut sugar match imcs--1.1.sql:855-859") {
    val xs = "array(1.0D, 2.0D, 3.0D, 4.0D, 5.0D)"
    assert(arr(s"cs_limit($xs, 1, 3)") == Seq(2.0, 3.0, 4.0))
    assert(arr(s"cs_limit($xs, -2, -1)") == Seq(4.0, 5.0))
    assert(arr(s"cs_head($xs, 2)") == Seq(1.0, 2.0))
    assert(arr(s"cs_tail($xs, 2)") == Seq(4.0, 5.0))
    assert(arr(s"cs_cut_head($xs, 2)") == Seq(3.0, 4.0, 5.0))
    assert(arr(s"cs_cut_tail($xs, 2)") == Seq(1.0, 2.0, 3.0))
    assert(arr(s"cs_limit($xs, 3, 1)") == Seq()) // till < from → empty
    // out-of-range ends must clamp to the empty slice, not wrap toInt
    assert(arr(s"cs_limit($xs, 5000000000, 10)") == Seq())
    assert(arr(s"cs_limit($xs, 0, -5000000000)") == Seq())
    assert(arr(s"cs_cut_head($xs, 99)") == Seq())
  }

  test("cs_thin validates origin and step; slices every step-th element") {
    assert(arr("cs_thin(array(1.0D, 2.0D, 3.0D, 4.0D, 5.0D), 1, 2)") == Seq(2.0, 4.0))
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT cs_thin(array(1.0D), -1, 2) AS r").head()
    }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
      .contains("origin"))
  }

  test("cs_map gathers positions (out-of-range → null); cs_filter_pos/first_pos") {
    assert(arr("cs_map(array(10.0D, 20.0D, 30.0D), array(2L, 0L, 9L))")
      == Seq(30.0, 10.0, null))
    assert(arr("cs_filter_pos(array(false, true, null, true))") == Seq(1L, 3L))
    assert(arr("cs_filter_first_pos(array(true, true, true, true), 2)") == Seq(0L, 1L))
  }

  test("cs_unique collapses runs; cs_repeat repeats in place") {
    assert(arr("cs_unique(array(1.0D, 1.0D, 2.0D, 1.0D))") == Seq(1.0, 2.0, 1.0))
    assert(arr("cs_repeat(array(1.0D, 2.0D), 2)") == Seq(1.0, 1.0, 2.0, 2.0))
  }

  test("series ops reject NULL elements loudly (dense-series contract)") {
    GraftFunctions.register(spark)
    // a null slot read through getDouble would be silent garbage; the
    // guard names the op and the position instead
    for (q <- Seq(
      "cs_cum_sum(array(1.0D, CAST(NULL AS DOUBLE), 3.0D))",
      "cs_rank(array(1.0D, CAST(NULL AS DOUBLE)))",
      "cs_asof_join_pos(array(1L, CAST(NULL AS BIGINT)), array(1L))")) {
      val e = intercept[Exception] { spark.sql(s"SELECT $q AS r").head() }
      val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("dense"), s"$q: $msg")
    }
    // cs_if's CONDITION keeps per-element null handling (documented)
    assert(arr("cs_if(array(true, CAST(NULL AS BOOLEAN)), array(9.0D), array(1.0D))")
      == Seq(9.0, null))
  }

  // ---- array vs frame cross-validation on random series ----

  test("array align ops agree with the frame-level Align on random series") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(101)
    // sorted distinct ts on both sides; values keyed to right ts
    val lts = rnd.shuffle((0L to 400L).toList).take(120).sorted
    val rts = rnd.shuffle((0L to 400L).toList).take(80).sorted
    val rvs = rts.map(t => t * 1.5 + 1)
    val lFrame = lts.map(("k", _)).toDF("key", "ts")
    val rFrame = rts.zip(rvs).map { case (t, v) => ("k", t, v) }.toDF("key", "ts", "v")

    def arrayOp(fn: String, extra: String = ""): Seq[Any] = {
      val ltsSql = lts.mkString("array(", "L,", "L)")
      val rtsSql = rts.mkString("array(", "L,", "L)")
      val rvsSql = rvs.mkString("array(", "D,", "D)")
      arr(s"$fn($ltsSql, $rtsSql, $rvsSql$extra)")
    }

    // nearest as-of: frame pick == array pick per left ts
    val frameNearest = graft.join.Align
      .asofJoinNearest(lFrame, rFrame, Seq("key"), "ts", "v")
      .orderBy("ts").select("asof_value").as[Double].collect().toSeq
    assert(arrayOp("cs_asof_join") == frameNearest)

    // forward-strict stretch with filler
    val frameStretch = graft.join.Align
      .stretch(lFrame, rFrame, Seq("key"), "ts", "v", lit(-7.0))
      .orderBy("ts").select("stretch_value").as[Double].collect().toSeq
    assert(arrayOp("cs_stretch", ", -7.0D") == frameStretch)

    // union-merge stretch0, compared in merged-ts order
    val frameStretch0 = graft.join.Align
      .stretch0(lFrame, rFrame, Seq("key"), "ts", "v", lit(-7.0))
      .orderBy("ts").select("stretch_value").as[Double].collect().toSeq
    assert(arrayOp("cs_stretch0", ", -7.0D") == frameStretch0)
  }

  // ---- algebraic identities over random series ----

  test("series-calculus identities hold on random arrays") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(77)
    val xs = Seq.fill(64)((rnd.nextDouble() * 100).floor) // exact doubles
    val xsSql = xs.mkString("array(", "D,", "D)")
    val row = spark.sql(s"""
      SELECT cs_map($xsSql, cs_sort_pos($xsSql, true)) AS gathered,
             cs_sort($xsSql, true) AS sorted,
             cs_cum_sum(cs_diff($xsSql)) AS cumdiff,
             cs_win_group_sum($xsSql, cs_cast($xsSql, 'array<bigint>')) AS wg,
             cs_group_sum($xsSql, cs_cast($xsSql, 'array<bigint>')) AS g,
             cs_group_count(cs_cast($xsSql, 'array<bigint>')) AS gc""").head()
    // gather over the sort permutation IS the sort
    assert(row.getSeq[Double](0) == row.getSeq[Double](1))
    // cum_sum ∘ diff recovers x - x(0)  (diff[0] = 0 by the head contract)
    row.getSeq[Double](2).zip(xs).foreach { case (cd, x) =>
      assert(math.abs(cd - (x - xs.head)) < 1e-9)
    }
    // win_group = group expanded per run count
    val expanded = row.getSeq[Double](4).zip(row.getSeq[Long](5))
      .flatMap { case (v, c) => Seq.fill(c.toInt)(v) }
    assert(row.getSeq[Double](3) == expanded)
  }

  // ---- round-5 surface: bitwise, cast, reverse/concat/union, prd ----

  test("cs_and/or/xor/bit_not are the bitwise natives") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT cs_and(12L, 10L) AS a, cs_or(12L, 10L) AS o,
         cs_xor(12L, 10L) AS x, cs_bit_not(0L) AS n""").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((8L, 14L, 6L, -1L)))
  }

  test("cs_cast parses a SQL type-name literal") {
    assert(sql1[Long]("cs_cast(3.7D, 'bigint')") == 3L)
    assert(sql1[String]("cs_cast(42, 'string')") == "42")
  }

  test("cs_reverse / cs_concat / cs_union (sorted merge, duplicates kept)") {
    assert(arr("cs_reverse(array(1.0D, 2.0D, 3.0D))") == Seq(3.0, 2.0, 1.0))
    assert(arr("cs_concat(array(1.0D), array(2.0D, 3.0D))") == Seq(1.0, 2.0, 3.0))
    assert(arr("cs_union(array(1.0D, 3.0D, 3.0D), array(2.0D, 3.0D))")
      == Seq(1.0, 2.0, 3.0, 3.0, 3.0))
  }

  test("cs_rank_asc / cs_dense_rank_asc / cs_sort_pos_asc match the guide examples") {
    // cs_rank('{1.1,0.1,2.2,0.2,0.1}') = {4,1,5,3,1} (user_guide.html:1193)
    assert(arr("cs_rank_asc(array(1.1D, 0.1D, 2.2D, 0.2D, 0.1D))")
      == Seq(4L, 1L, 5L, 3L, 1L))
    // dense: {3,1,4,2,1} (user_guide.html:1198)
    assert(arr("cs_dense_rank_asc(array(1.1D, 0.1D, 2.2D, 0.2D, 0.1D))")
      == Seq(3L, 1L, 4L, 2L, 1L))
    assert(arr("cs_sort_asc(array(1.1D, 0.1D, 2.2D, 0.2D))")
      == Seq(0.1, 0.2, 1.1, 2.2))
    assert(arr("cs_sort_pos_asc(array(1.1D, 0.1D, 2.2D, 0.2D))")
      == Seq(1L, 3L, 0L, 2L))
  }

  test("cs_prd multiplies non-nulls; NULL on empty input") {
    GraftFunctions.register(spark)
    Seq(Some(2.0), None, Some(3.0), Some(4.0)).toDF("x")
      .createOrReplaceTempView("t_prd")
    assert(spark.sql("SELECT cs_prd(x) AS p FROM t_prd").as[Double].head() == 24.0)
    assert(spark.sql("SELECT cs_prd(x) AS p FROM t_prd WHERE x IS NULL")
      .head().isNullAt(0))
  }

  test("cs_hash_any/cs_hash_all equal the native grouped bit reductions") {
    GraftFunctions.register(spark)
    Seq(("a", 6L), ("a", 3L), ("b", 5L), ("b", 5L), ("a", 8L))
      .toDF("g", "x").createOrReplaceTempView("t_hb")
    val m = spark.sql(
      "SELECT cs_hash_any(x, g) AS ha, cs_hash_all(x, g) AS hl FROM t_hb").head()
    assert(m.getMap[String, Long](0) == Map("a" -> 15L, "b" -> 5L))
    assert(m.getMap[String, Long](1) == Map("a" -> 0L, "b" -> 5L))
    // partial/final shuffle-merge path: same result over many partitions
    val big = spark.sql(
      "SELECT cs_hash_any(x, g) AS ha FROM (SELECT /*+ REPARTITION(5) */ * FROM t_hb)")
    assert(big.head().getMap[String, Long](0) == Map("a" -> 15L, "b" -> 5L))
  }

  test("cs_hash_dup_count counts distinct values above the threshold per group") {
    GraftFunctions.register(spark)
    // group a: value 1 x3, value 2 x2, value 3 x1 -> threshold 2 keeps {1,2}
    // group b: value 9 x2 -> keeps {9}
    Seq(("a", 1.0), ("a", 1.0), ("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 3.0),
      ("b", 9.0), ("b", 9.0))
      .toDF("g", "x").createOrReplaceTempView("t_dup")
    val m = spark.sql("SELECT cs_hash_dup_count(x, g, 2) AS d FROM t_dup").head()
    assert(m.getMap[String, Long](0) == Map("a" -> 2L, "b" -> 1L))
    // shuffle-merge path: occurrence counts must merge BEFORE thresholding
    // (value 1 split 2+1 across partitions still counts once at >= 3)
    val big = spark.sql(
      "SELECT cs_hash_dup_count(x, g, 3) AS d FROM (SELECT /*+ REPARTITION(5) */ * FROM t_dup)")
    assert(big.head().getMap[String, Long](0) == Map("a" -> 1L, "b" -> 0L))
  }

  // ---- the polymorphic lifted calculus (SeriesPolyFns) ----

  test("lifted binary ops: zip truncates to the shorter series") {
    assert(arr("cs_add(array(1L,2L,3L), array(10L,20L))") == Seq(11L, 22L))
    assert(arr("cs_sub(array(5.0D), array(1L,2L,3L))") == Seq(4.0))
  }

  test("lifted binary ops: scalar broadcasts on either side") {
    assert(arr("cs_mul(array(1L,2L,3L), 3)") == Seq(3L, 6L, 9L))
    assert(arr("cs_sub(100, array(1L,2L))") == Seq(99L, 98L))
    // int series + double scalar widens like the analyzer would
    assert(arr("cs_add(array(1L,2L), 0.5D)") == Seq(1.5, 2.5))
  }

  test("lifted comparisons yield boolean series that feed cs_filter_pos") {
    assert(arr("cs_ge(array(1L,5L,3L), 3)") == Seq(false, true, true))
    assert(arr("cs_filter_pos(cs_lt(array(1.0D,5.0D,3.0D), 4.0D))") == Seq(0L, 2L))
  }

  test("lifted division follows C float semantics on zero divisors") {
    assert(arr("cs_div(array(1.0D,-1.0D), 0.0D)")
      == Seq(Double.PositiveInfinity, Double.NegativeInfinity))
    assert(arr("cs_isnan(cs_div(array(0.0D), 0.0D))") == Seq(true))
  }

  test("lifted unary ops over series and scalars plan the same math") {
    assert(arr("cs_abs(array(-1L,2L))") == Seq(1L, 2L))
    assert(arr("cs_ceil(array(1.2D,2.8D))") == Seq(2L, 3L))
    assert(sql1[Long]("cs_floor(2.9D)") == 2L)
    assert(arr("cs_bit_not(array(0L,5L))") == Seq(-1L, -6L))
    // cs_not: boolean negation, and x==0 over the reference's int conditions
    assert(arr("cs_not(array(true, false))") == Seq(false, true))
    assert(arr("cs_not(array(0L, 7L))") == Seq(true, false))
  }

  test("cs_const / cs_from_array / cs_empty / cs_as") {
    // a scalar IS the constant series under the lifted calculus
    assert(arr("cs_add(array(1L,2L), cs_const(10))") == Seq(11L, 12L))
    assert(sql1[Float]("cs_const(3.14, 'float4')") == 3.14f)
    assert(arr("cs_from_array(array(1.0D,2.0D))") == Seq(1.0, 2.0))
    assert(sql1[Boolean]("cs_empty(CAST(array() AS ARRAY<BIGINT>))"))
    assert(!sql1[Boolean]("cs_empty(array(1L))"))
    assert(sql1[Int]("cs_as('42', 'int')") == 42)
  }

  test("cs_to_TYPE_array casts the carrier series to typed SQL arrays") {
    assert(arr("cs_to_int4_array(array(1L,2L))") == Seq(1, 2))
    assert(arr("cs_to_int2_array(array(3L))") == Seq(3.toShort))
    assert(arr("cs_to_float4_array(array(1.5D))") == Seq(1.5f))
    assert(arr("cs_to_varchar_array(array(1L,2L))").map(_.toString) == Seq("1", "2"))
    assert(arr("cs_to_date_array(array(0L, 19000L))").map(_.toString)
      == Seq("1970-01-01", "2022-01-08"))
    assert(arr("cs_to_timestamp_array(array(0L))").map(_.toString)
      == Seq("1970-01-01 00:00:00.0"))
  }

  test("cs_iif lifts over array series (reference series conditional)") {
    // series cond, series branches: the reference's abs-style composition
    assert(arr("cs_iif(cs_gt(array(1.0D,-2.0D,3.0D), 0.0D), " +
      "array(1.0D,-2.0D,3.0D), cs_neg(array(1.0D,-2.0D,3.0D)))")
      == Seq(1.0, 2.0, 3.0))
    // series cond, scalar branches (broadcast)
    assert(arr("cs_iif(array(true,false), 1.0D, 0.0D)") == Seq(1.0, 0.0))
    // series cond, mixed series/scalar branches
    assert(arr("cs_iif(array(true,false), array(5.0D,6.0D), -1.0D)")
      == Seq(5.0, -1.0))
    // scalar cond stays the plain conditional
    assert(sql1[Double]("cs_iif(1 > 0, 2.0D, 3.0D)") == 2.0)
  }

  test("cs_filter_first_pos(cond, 0) is empty, not the whole position list") {
    assert(arr("cs_filter_first_pos(array(true,true,true), 0)") == Seq())
    assert(arr("cs_filter_first_pos(array(true,true,true), 2)") == Seq(0L, 1L))
  }

  test("cs_window_min/max monotonic deque equals the brute-force window") {
    val rnd = new scala.util.Random(11)
    val xs = Seq.fill(300)(math.rint(rnd.nextDouble() * 1000) / 10)
    val lit = xs.map(x => s"${x}D").mkString("array(", ",", ")")
    for (w <- Seq(1, 3, 17, 300)) {
      val got = arr(s"cs_window_min($lit, $w)").map(_.asInstanceOf[Double])
      val want = xs.indices.map(i => xs.slice(math.max(0, i - w + 1), i + 1).min)
      assert(got == want, s"min w=$w")
      val gotMax = arr(s"cs_window_max($lit, $w)").map(_.asInstanceOf[Double])
      val wantMax = xs.indices.map(i => xs.slice(math.max(0, i - w + 1), i + 1).max)
      assert(gotMax == wantMax, s"max w=$w")
    }
  }

  test("series-calc knobs reject wrapping/overflowing arguments loudly") {
    // a bigint window that would wrap intValue() to 1
    val e = intercept[Exception] {
      arr("cs_window_sum(array(1.0D,2.0D), 4294967297)")
    }
    assert(e.getMessage.contains("out of int range"))
    // one giant grid bucket must not overflow the bucket count
    assert(arr("cs_grid_sum(array(1.0D,2.0D), 2147483647)") == Seq(3.0))
    // 2 x MaxInt wraps the Int product to -2: must fail fast, not
    // allocate a negative-size array (or index into a wrapped one)
    val e2 = intercept[Exception] {
      arr("cs_repeat(array(1.0D,2.0D), 2147483647)")
    }
    assert(e2.getMessage.contains("exceeds the array limit"))
  }

  test("rank families agree on -0.0/0.0 ties and NaN placement") {
    // -0.0 and 0.0 are numerically equal: both rank forms tie them
    assert(arr("cs_rank(array(-0.0D, 0.0D), true)") == Seq(1L, 1L))
    assert(arr("cs_dense_rank(array(-0.0D, 0.0D), true)") == Seq(1L, 1L))
    // NaN is greatest in the total order: last ascending, FIRST descending
    // in both forms; equal NaNs tie
    assert(arr("cs_rank(array(cast('NaN' as double), 1.0D, cast('NaN' as double)), false)")
      == Seq(1L, 3L, 1L))
    assert(arr("cs_dense_rank(array(cast('NaN' as double), 1.0D), false)")
      == Seq(1L, 2L))
    assert(arr("cs_rank(array(cast('NaN' as double), 1.0D), true)")
      == Seq(2L, 1L))
  }
}
