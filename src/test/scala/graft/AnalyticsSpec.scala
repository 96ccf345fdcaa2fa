package graft

import graft.analytics.Analytics
import graft.series.Series
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Special analytics vs reference literal-series fixtures
  * (sql/spec.sql:3-9, FIXTURES.md fixture 3).
  */
class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def series(vs: Double*) = Series.attachPos(
    vs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("t", "v"), Seq(), Seq(col("t")))

  test("extrema matches reference fixture {1,2,3,2,1,0,0,1,1,2,4,0} -> {2,6,10}") {
    val r = Analytics.extrema(series(1, 2, 3, 2, 1, 0, 0, 1, 1, 2, 4, 0), Seq(), "v")
      .orderBy("pos").select("pos").as[Long].collect().toSeq
    assert(r == Seq(2L, 6L, 10L))
  }

  test("crossings: sign flips vs previous non-zero sign") {
    // Zero-free variant of the reference fixture: crossings at 2, 3, 7.
    // (The reference's n_zeros bookkeeping (func.c:4179) subtracts stale
    // interior zero runs; we use the clean semantics and document it.)
    val r = Analytics.crossings(series(1, 2, -1, 0.5, 0.6, 0.1, 0.3, -5), Seq(), "v", 0)
      .orderBy("pos").select("pos").as[Long].collect().toSeq
    assert(r == Seq(2L, 3L, 7L))
  }

  test("crossings direction filter") {
    val up = Analytics.crossings(series(1, -1, 1, -1), Seq(), "v", 1)
      .select("pos").as[Long].collect().toSeq
    assert(up == Seq(2L)) // only the -(neg)->+(pos) flip
  }

  test("diff: first element 0, then deltas (cs_diff)") {
    val r = Analytics.diff(series(5, 7, 4), Seq(), "v").orderBy("pos")
      .select("diff").as[Double].collect().toSeq
    assert(r == Seq(0.0, 2.0, -3.0))
  }

  test("diff of cumulative sum recovers the series") {
    val df = graft.agg.Aggs.cumAgg(series(3, 1, 4, 1, 5), Seq(), "v")
    val r = Analytics.diff(df, Seq(), "cum_sum").orderBy("pos")
      .select("diff").as[Double].collect().toSeq
    assert(r == Seq(0.0, 1.0, 4.0, 1.0, 5.0)) // diff[0] = 0 by definition
  }

  test("trend carries last non-zero direction (cs_trend)") {
    val r = Analytics.trend(series(1, 2, 2, 1, 1), Seq(), "v").orderBy("pos")
      .select("trend").as[Double].collect().toSeq
    assert(r == Seq(0.0, 1.0, 1.0, -1.0, -1.0))
  }

  test("norm divides by the L2 norm (cs_norm)") {
    val r = Analytics.norm(series(3, 4), Seq(), "v").orderBy("pos")
      .select("norm").as[Double].collect().toSeq
    assert(r == Seq(0.6, 0.8))
  }

  test("quantile returns q+1 boundaries (cs_quantile)") {
    val r = Analytics.quantile(series(1, 2, 3, 4, 5).select("v"), "v", 2)
      .orderBy("q_idx").select("q_value").as[Double].collect().toSeq
    assert(r == Seq(1.0, 3.0, 5.0))
  }

  test("diff/trend/crossings: NULL values follow the keyed lag semantics on both paths") {
    // deltas touching a NULL are 0 (coalesce(v - lag(v), 0)) and the
    // sign carries straight through NULL rows
    val base = Seq((0L, Some(2.0)), (1L, None), (2L, Some(5.0)), (3L, Some(3.0)),
      (4L, None), (5L, Some(7.0))).toDF("pos", "v")
    val keyed = base.withColumn("k", lit(1))

    val dKeyless = Analytics.diff(base, Seq(), "v").orderBy("pos")
      .select("diff").as[Double].collect().toSeq
    val dKeyed = Analytics.diff(keyed, Seq("k"), "v").orderBy("pos")
      .select("diff").as[Double].collect().toSeq
    assert(dKeyless == Seq(0.0, 0.0, 0.0, -2.0, 0.0, 0.0))
    assert(dKeyless == dKeyed)

    val tKeyless = Analytics.trend(base, Seq(), "v").orderBy("pos")
      .select("trend").as[Double].collect().toSeq
    val tKeyed = Analytics.trend(keyed, Seq("k"), "v").orderBy("pos")
      .select("trend").as[Double].collect().toSeq
    assert(tKeyless == tKeyed)

    // crossings: NULL rows drop out and do not disturb the sign carry
    val cb = Seq((0L, Some(1.0)), (1L, None), (2L, Some(-1.0)), (3L, None),
      (4L, Some(2.0))).toDF("pos", "v")
    val cKeyless = Analytics.crossings(cb, Seq(), "v", 0).orderBy("pos")
      .select("pos").as[Long].collect().toSeq
    val cKeyed = Analytics.crossings(cb.withColumn("k", lit(1)), Seq("k"), "v", 0)
      .orderBy("pos").select("pos").as[Long].collect().toSeq
    assert(cKeyless == Seq(2L, 4L) && cKeyless == cKeyed)
  }
}
