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

  test("keyless rank ties NULL values together like the keyed SQL path") {
    val base = Seq((0L, None), (1L, Some(5.0)), (2L, None), (3L, Some(5.0)))
      .toDF("pos", "v")
    val keyless = Moving.rank(base, Seq(), "v").orderBy("pos")
      .select("rnk", "dense_rnk").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val keyed = Moving.rank(base.withColumn("k", lit(1)), Seq("k"), "v").orderBy("pos")
      .select("rnk", "dense_rnk").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // nulls sort first and TIE: rnk 1,1 then the 5.0s tie at 3
    assert(keyless == Seq((1L, 1L), (3L, 2L), (1L, 1L), (3L, 2L)))
    assert(keyless == keyed)
  }

  test("ATR warm-up counts rows PRESENT, not the pos column (sliced series)") {
    // thin a 6-row series to pos 0,2,4: the warm-up ordinal must be
    // 0,1,2 over the remaining rows, not 0,2,4
    val thinned = series(4, 99, 8, 99, 2, 99).filter(col("pos") % 2 === 0)
    val r = Moving.atr(thinned, Seq(), "v", 2).orderBy("pos")
      .select("atr").as[Double].collect().toSeq
    // same recurrence as the dense test: 4; (4*1+8)/2=6; (6*1+2)/2=4
    assert(r == Seq(4.0, 6.0, 4.0))
    // keyed path agrees
    val keyed = Moving.atr(thinned.withColumn("k", lit(1)), Seq("k"), "v", 2)
      .orderBy("pos").select("atr").as[Double].collect().toSeq
    assert(keyed == r)
  }

  test("RSI: all-gain reads 100, flat windows are NaN (reference IEEE arithmetic)") {
    // strictly rising: su > 0, sd = 0 after warm-up -> 100 (row 0 is flat)
    val up = Moving.rsi(series(1, 2, 3, 4), Seq(), "v", 3).orderBy("pos")
      .select("rsi").as[Double].collect().toSeq
    assert(up.head.isNaN && up.tail.forall(_ == 100.0))
    // flat: U = D = 0 -> 0/0 -> NaN everywhere, never a fake 100
    val flat = Moving.rsi(series(5, 5, 5), Seq(), "v", 3).orderBy("pos")
      .select("rsi").as[Double].collect().toSeq
    assert(flat.forall(_.isNaN))
  }

  test("keyless windowAgg matches keyed min/max when NaN is in the frame") {
    val base = Seq((0L, 1.0), (1L, Double.NaN), (2L, 3.0), (3L, 0.5)).toDF("pos", "v")
    val keyless = Moving.windowAgg(base, Seq(), "v", 2).orderBy("pos")
      .select("w_min", "w_max").collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    val keyed = Moving.windowAgg(base.withColumn("k", lit(1)), Seq("k"), "v", 2)
      .orderBy("pos").select("w_min", "w_max").collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    def cmp(a: Double, b: Double) = (a.isNaN && b.isNaN) || a == b
    assert(keyless.zip(keyed).forall { case ((a1, a2), (b1, b2)) =>
      cmp(a1, b1) && cmp(a2, b2)
    }, s"keyless=$keyless keyed=$keyed")
    // Spark's total order puts NaN above every value: min picks the real
    // minimum, max reports NaN
    assert(keyless(1)._1 == 1.0 && keyless(1)._2.isNaN)
  }

  test("recursive scans reject NULL values loudly, not with an NPE") {
    val withNull = Seq((0L, Some(1.0)), (1L, None)).toDF("pos", "v")
    val e = intercept[Exception] {
      Moving.ema(withNull, Seq(), "v", 3).collect()
    }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq.last.getMessage)
    assert(rootMsg(e).contains("non-null"))
    val e2 = intercept[Exception] {
      Moving.cumProd(withNull, Seq(), "v").collect()
    }
    assert(rootMsg(e2).contains("non-null"))
  }

  test("windowAgg validates the window length on both paths") {
    intercept[IllegalArgumentException] {
      Moving.windowAgg(series(1, 2), Seq(), "v", 0)
    }
    intercept[IllegalArgumentException] {
      Moving.windowAgg(series(1, 2).withColumn("k", lit(1)), Seq("k"), "v", -1)
    }
    intercept[IllegalArgumentException] { Moving.ema(series(1), Seq(), "v", 0) }
    intercept[IllegalArgumentException] { Moving.atr(series(1), Seq(), "v", 0) }
  }

  test("scan output and working names are guarded against input collisions") {
    intercept[IllegalArgumentException] {
      Moving.windowAgg(series(1, 2).withColumn("w_sum", lit(1)), Seq(), "v", 2)
    }
    intercept[IllegalArgumentException] {
      Moving.ema(series(1, 2).withColumn("EMA", lit(1)), Seq(), "v", 2)
    }
    intercept[IllegalArgumentException] {
      Moving.rank(series(1, 2).withColumn("rnk", lit(1)), Seq(), "v")
    }
  }

  test("affineScanRanged honors a caller ordinal; keyed + non-pos ordinal is refused") {
    // scan in __ord order (the REVERSE of pos) — the cumulative state must
    // follow the caller's ordinal, not the default pos
    val df = series(10, 20, 30).withColumn("__ord", lit(2L) - col("pos"))
    val vIdx = df.schema.fieldIndex("v")
    val out = Moving.affineScanRanged(df, Seq(), "cum", ordCol = "__ord")(
      seed = _ => 0.0) { r => (1.0, r.getDouble(vIdx)) }
    val got = out.orderBy("pos").select("cum").collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(60.0, 50.0, 30.0), s"reverse-ordinal cumsum, got $got")
    // keyed scans order by pos — a different ordinal must fail loudly
    // rather than compute run state in the wrong order
    intercept[IllegalArgumentException] {
      Moving.affineScanRanged(df.withColumn("k", lit(1)), Seq("k"), "cum2",
        ordCol = "__ord")(seed = _ => 0.0) { r => (1.0, r.getDouble(vIdx)) }
    }
  }
}
