package graft

import graft.agg.Aggs
import graft.series.Series
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Aggregate families vs reference expected outputs
  * (expected/grandagg.out, groupbyagg, gridagg, hashagg, cumagg).
  */
class AggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def ibm = Series.attachPos(
    Seq((1, 10.5, 100L), (2, 20.2, 200L), (4, 30.2, 300L), (5, 40.2, 400L), (6, 50.5, 500L))
      .toDF("day", "close", "vol"), Seq(), Seq(col("day")))

  test("grand aggregates match reference fixture (sum Volume = 1500)") {
    val r = ibm.agg(
      sum("vol").as("s"), count(lit(1)).as("c"), min("vol").as("mn"),
      max("vol").as("mx"), avg("vol").as("av")).head()
    assert(r.getLong(0) == 1500L && r.getLong(1) == 5L &&
      r.getLong(2) == 100L && r.getLong(3) == 500L && r.getDouble(4) == 300.0)
  }

  test("naive variance formula agrees with var_pop on the fixture") {
    val r = ibm.agg(var_pop(col("vol")).as("w"), Aggs.varNaive(col("vol")).as("n")).head()
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-6)
    assert(math.abs(r.getDouble(0) - 20000.0) < 1e-9) // var of 100..500
  }

  test("product aggregator") {
    val r = Seq(2.0, 3.0, 4.0).toDF("x").agg(Aggs.prd("x")).head().getDouble(0)
    assert(r == 24.0)
    val withZero = Seq(2.0, 0.0, 4.0).toDF("x").agg(Aggs.prd("x")).head().getDouble(0)
    assert(withZero == 0.0)
  }

  test("wavg = VWAP on the fixture") {
    // sum(vol*close)/sum(vol) for IBM fixture
    val r = ibm.agg(Aggs.wavg(col("vol"), col("close"))).head().getDouble(0)
    val expected = (100 * 10.5 + 200 * 20.2 + 300 * 30.2 + 400 * 40.2 + 500 * 50.5) / 1500.0
    assert(math.abs(r - expected) < 1e-12)
  }

  test("sketch rollup: unioned bucket sketches estimate the true distinct count") {
    // 3 buckets with overlapping membership (uid = 7i mod 60: each bucket
    // sees a 20-element subcycle, all 60 appear overall): union must dedup
    // ACROSS buckets, not sum the per-bucket counts
    val df = (0 until 120).map(i => (i % 3, (i * 7) % 60L)).toDF("bucket", "uid")
    val sk = Aggs.sketchRollup(df, Seq("bucket"), "uid")
    assert(sk.count() == 3)
    val total = Aggs.sketchEstimate(sk, Seq()).head().getLong(0)
    assert(total == 60L) // HLL is exact far below 2^lgK registers
    val per = Aggs.sketchEstimate(sk, Seq("bucket")).orderBy("bucket")
      .select("approx_dc").as[Long].collect().toSeq
    assert(per == Seq(20L, 20L, 20L))
  }

  test("quantile rollup: merged bucket sketches are EXACT below the sketch's k") {
    // KLL keeps every value until compaction at k=200, so 3 buckets of 40
    // values merged (120 total) must answer quantiles exactly — the
    // merge path is what a 100 TB rollup exercises, exactness at small n
    // proves the plumbing loses nothing
    val df = (0 until 120).map(i => (i % 3, i.toDouble)).toDF("bucket", "x")
    val sk = Aggs.quantileRollup(df, Seq("bucket"), "x")
    assert(sk.count() == 3)
    val p50 = Aggs.quantileEstimate(sk, Seq(), 0.5).head().getDouble(0)
    // KLL quantile at q=0.5 over 0..119 returns an actual data value at
    // the median rank
    assert(p50 >= 59.0 && p50 <= 60.0, s"p50=$p50")
    val perBucket = Aggs.quantileEstimate(sk, Seq("bucket"), 1.0)
      .orderBy("bucket").select("approx_q").as[Double].collect().toSeq
    assert(perBucket == Seq(117.0, 118.0, 119.0)) // exact per-bucket max
  }

  test("theta rollup set algebra: planted overlap is exact below 2^lgK") {
    // side A sees users 0..59, side B sees 40..89 → |A∩B| = 20,
    // |A\B| = 40; buckets split each side so the union-then-intersect
    // path (the rollup query shape) is what's exercised
    val rows = (0 until 60).map(u => ("a", u % 3, u.toLong)) ++
      (40 until 90).map(u => ("b", u % 2, u.toLong))
    val df = rows.toDF("side", "day", "uid")
    val sk = Aggs.thetaRollup(df, Seq("side", "day"), "uid")
    assert(sk.count() == 5) // 3 a-buckets + 2 b-buckets
    val r = Aggs.thetaOverlap(sk, "side", "a", "b").head()
    // theta_sketch_estimate returns a LONG (rounded estimate)
    assert(r.getLong(0) == 60L && r.getLong(1) == 50L)
    assert(r.getLong(2) == 20L, s"n_both=${r.getLong(2)}")
    assert(r.getLong(3) == 40L, s"n_a_only=${r.getLong(3)}")
  }

  test("run-group aggregates group adjacent equal values (cs_group_*)") {
    val df = Series.attachPos(
      Seq((1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0), (4, "a", 4.0), (5, "a", 5.0))
        .toDF("t", "g", "v"), Seq(), Seq(col("t")))
    val r = Aggs.groupAgg(df, Seq(), "g", "v").orderBy("run_id")
      .select("group_val", "grp_count", "grp_sum", "grp_first", "grp_last")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(r.toSeq == Seq(("a", 2L, 3.0, 1.0, 2.0), ("b", 1L, 3.0, 3.0, 3.0), ("a", 2L, 9.0, 4.0, 5.0)))
  }

  test("grid aggregates bucket by position (cs_grid_*)") {
    val df = Series.attachPos((1 to 10).map(i => (i, i.toDouble)).toDF("t", "v"), Seq(), Seq(col("t")))
    val r = Aggs.gridAgg(df, Seq(), "v", 4).orderBy("grid")
      .select("grid", "grid_count", "grid_sum").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(r.toSeq == Seq((0L, 4L, 10.0), (1L, 4L, 26.0), (2L, 2L, 19.0)))
  }

  test("cumulative aggregates (cs_cum_*)") {
    val df = Series.attachPos(Seq((1, 1.0), (2, 2.0), (3, 3.0)).toDF("t", "v"), Seq(), Seq(col("t")))
    val r = Aggs.cumAgg(df, Seq(), "v").orderBy("pos").select("cum_sum", "cum_max").collect()
    assert(r.map(_.getDouble(0)).toSeq == Seq(1.0, 3.0, 6.0))
    assert(r.map(_.getDouble(1)).toSeq == Seq(1.0, 2.0, 3.0))
  }

  test("histogram bins with out-of-range ignored (cs_histogram)") {
    val df = Seq(-1.0, 0.0, 0.5, 1.0, 1.5, 2.0, 5.0).toDF("v")
    val r = Aggs.histogram(df, "v", 0.0, 2.0, 2).orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(r.toSeq == Seq((0L, 2L), (1L, 2L))) // [0,1): {0,0.5}; [1,2): {1,1.5}
  }

  test("hashDupCount counts values occurring >= minOcc per group") {
    val df = Seq(("g1", 1), ("g1", 1), ("g1", 2), ("g2", 3), ("g2", 3), ("g2", 3)).toDF("g", "v")
    val r = Aggs.hashDupCount(df, "v", Seq("g"), 2L).orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(r.toSeq == Seq(("g1", 1L), ("g2", 1L)))
  }

  test("topK with deterministic tiebreak") {
    val df = Seq((1L, 5.0), (2L, 5.0), (3L, 1.0)).toDF("id", "v")
    val r = Aggs.topK(df, "v", 2, desc = true, "id").select("id").as[Long].collect().toSeq
    assert(r == Seq(1L, 2L))
  }

  test("prd skips NULLs and yields NULL for an all-null input (SQL aggregate semantics)") {
    val mixed = Seq(Some(2.0), None, Some(3.0)).toDF("x").agg(Aggs.prd("x")).head()
    assert(mixed.getDouble(0) == 6.0)
    val allNull = Seq[Option[Double]](None, None).toDF("x").agg(Aggs.prd("x")).head()
    assert(allNull.isNullAt(0))
  }

  test("wavg excludes the weight of NULL-valued rows from the denominator") {
    val df = Seq((100L, Some(10.0)), (50L, None: Option[Double])).toDF("w", "v")
    val r = df.agg(Aggs.wavg(col("w"), col("v"))).head().getDouble(0)
    assert(r == 10.0, s"a NULL price must not deflate VWAP, got $r")
  }

  test("keyless cumAgg matches the keyed window on NULL and NaN values") {
    val base = Seq((0L, Some(5.0)), (1L, None), (2L, Some(Double.NaN)),
      (3L, Some(3.0))).toDF("pos", "v")
    val cols = Seq("cum_sum", "cum_avg", "cum_min", "cum_max", "cum_count")
    def render(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] =
      df.orderBy("pos").select(cols.map(col): _*).collect()
        .map(_.toSeq.map(String.valueOf)).toSeq
    val keyless = render(Aggs.cumAgg(base, Seq(), "v"))
    val keyed = render(Aggs.cumAgg(base.withColumn("k", lit(1)), Seq("k"), "v"))
    assert(keyless == keyed, s"keyless=$keyless keyed=$keyed")
    // spot checks: NULL row keeps prior stats, counts ROWS; min survives
    // the NaN (Spark orders NaN above everything), max reports it
    assert(keyless(1) == Seq("5.0", "5.0", "5.0", "5.0", "2"))
    assert(keyless(2)(2) == "5.0" && keyless(2)(3) == "NaN")
    // all-NULL prefix yields NULL stats with a live row count
    val headNull = Aggs.cumAgg(Seq((0L, None: Option[Double])).toDF("pos", "v"),
      Seq(), "v").select("cum_sum", "cum_count").head()
    assert(headNull.isNullAt(0) && headNull.getLong(1) == 1L)
  }

  test("keyless winGroupAgg equals the keyed form without a per-run window shuffle") {
    val base = Seq((0L, "a", 1.0), (1L, "a", 3.0), (2L, "b", 5.0), (3L, "a", 7.0))
      .toDF("pos", "g", "v")
    val outCols = Seq("pos", "wg_sum", "wg_min", "wg_max", "wg_avg",
      "wg_count", "wg_var", "wg_dev", "wg_first", "wg_last")
    val keyless = Aggs.winGroupAgg(base, Seq(), "g", "v").orderBy("pos")
      .select(outCols.map(col): _*).collect().map(_.toSeq).toSeq
    val keyed = Aggs.winGroupAgg(base.withColumn("k", lit(1)), Seq("k"), "g", "v")
      .orderBy("pos").select(outCols.map(col): _*).collect().map(_.toSeq).toSeq
    assert(keyless == keyed)
    assert(keyless.head(1) == 4.0) // run {1.0, 3.0}: wg_sum
  }

  test("thetaOverlap: an empty side estimates 0, not NULL") {
    val df = Seq(("x", "u1"), ("x", "u2")).toDF("side", "u")
    val sk = Aggs.thetaRollup(df, Seq("side"), "u")
    val r = Aggs.thetaOverlap(sk, "side", "x", "zzz").head()
    assert(r.getLong(0) == 2L, "n_a")
    assert(r.getLong(1) == 0L, "n_b: empty side is 0, not NULL")
    assert(r.getLong(2) == 0L, "n_both")
    assert(r.getLong(3) == 2L, "n_a_only = n_a when b is empty")
  }

  test("histogram and gridAgg validate their knobs") {
    val df = Seq((0L, 1.0)).toDF("pos", "v")
    intercept[IllegalArgumentException] { Aggs.histogram(df, "v", 0.0, 10.0, 0) }
    intercept[IllegalArgumentException] { Aggs.histogram(df, "v", 10.0, 10.0, 4) }
    intercept[IllegalArgumentException] { Aggs.gridAgg(df, Seq(), "v", 0) }
  }

  test("attachRunId ties consecutive NULL group values into one run, both paths") {
    val base = Seq((0L, Some("a")), (1L, None), (2L, None), (3L, Some("a")))
      .toDF("pos", "g")
    val keyless = Aggs.attachRunId(base, Seq(), "g").orderBy("pos")
      .select("run_id").as[Long].collect().toSeq
    val keyed = Aggs.attachRunId(base.withColumn("k", lit(1)), Seq("k"), "g")
      .orderBy("pos").select("run_id").as[Long].collect().toSeq
    // a, [null null] as ONE run, a again: 1, 2, 2, 3 — SQL rank()-style
    // NULL ties, not a fresh run per null row
    assert(keyless == Seq(1L, 2L, 2L, 3L))
    assert(keyless == keyed)
  }
}
