package graft

import graft.series.Series
import graft.window.Moving
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Moving/recursive window operators (reference sql/windowagg.sql;
  * EMA/ATR func.c:1764-1788).
  */
class MovingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def series(vs: Double*) = Series.attachPos(
    vs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("t", "v"), Seq(), Seq(col("t")))

  test("window sum/avg/min/max over trailing frame, partial head windows") {
    val r = Moving.windowAgg(series(1, 2, 3, 4), Seq(), "v", 2).orderBy("pos")
      .select("w_sum", "w_min", "w_max").collect()
    assert(r.map(_.getDouble(0)).toSeq == Seq(1.0, 3.0, 5.0, 7.0))
    assert(r.map(_.getDouble(1)).toSeq == Seq(1.0, 1.0, 2.0, 3.0))
    assert(r.map(_.getDouble(2)).toSeq == Seq(1.0, 2.0, 3.0, 4.0))
  }

  test("EMA: p=2/(N+1), EMA[0]=x[0] (cs_window_ema)") {
    // N=3 -> p=0.5: 1, 1*(.5)+2*(.5)=1.5, 1.5*.5+3*.5=2.25
    val r = Moving.ema(series(1, 2, 3), Seq(), "v", 3).orderBy("pos")
      .select("ema").as[Double].collect().toSeq
    assert(r == Seq(1.0, 1.5, 2.25))
  }

  test("ATR: Wilder smoothing with warmup n=min(i+1,N) (cs_window_atr)") {
    // N=2: atr0=4; atr1=(4*1+8)/2=6; atr2=(6*1+2)/2=4
    val r = Moving.atr(series(4, 8, 2), Seq(), "v", 2).orderBy("pos")
      .select("atr").as[Double].collect().toSeq
    assert(r == Seq(4.0, 6.0, 4.0))
  }

  test("cumulative product handles zeros and signs (cs_cum_prd)") {
    val r = Moving.cumProd(series(2, -3, 0, 4), Seq(), "v").orderBy("pos")
      .select("cum_prd").as[Double].collect().toSeq
    assert(r == Seq(2.0, -6.0, 0.0, 0.0))
  }

  test("per-key scan resets state between keys") {
    val df = Series.attachPos(
      Seq(("a", 1, 10.0), ("a", 2, 20.0), ("b", 1, 100.0)).toDF("k", "t", "v"),
      Seq("k"), Seq(col("t")))
    val r = Moving.ema(df, Seq("k"), "v", 3).orderBy("k", "pos")
      .select("ema").as[Double].collect().toSeq
    assert(r == Seq(10.0, 15.0, 100.0)) // b restarts at 100
  }

  test("rank and dense rank (cs_rank/cs_dense_rank)") {
    val r = Moving.rank(series(30, 10, 30, 20), Seq(), "v").orderBy("pos")
      .select("rnk", "dense_rnk").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(r.toSeq == Seq((3L, 3L), (1L, 1L), (3L, 3L), (2L, 2L)))
  }
}
