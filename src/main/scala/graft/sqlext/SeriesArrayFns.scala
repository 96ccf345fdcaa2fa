package graft.sqlext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The reference's sequential cs_* operators exposed over SQL ARRAYS: a
  * series in SQL form is an ordered array<double> (the same roundtrip
  * cs_to_array/cs_from_array expose, func.c:4028-4166), so the recursive
  * and order-dependent operators — diff, ema, rank, top-k, as-of lookup —
  * become scalar functions a SQL user can call without the DataFrame API
  * (imcs--1.1.sql:518-1058 registers the same names over series handles).
  *
  * Scale contract: these run per-ROW over one array, so they serve the
  * many-small-series shape (per-key arrays from collect_list, bounded by
  * what one row holds). The frame-level operators in graft.window /
  * graft.analytics remain the route for one huge series.
  *
  * Eval-only (CodegenFallback): the loops are trivial and the arrays
  * bounded; codegen would buy little here, unlike the per-token SimHash64.
  */
object SeriesArrayFns {
  private[sqlext] def dblArray(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private[sqlext] def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private[sqlext] def toDoubles(a: ArrayData): Array[java.lang.Double] =
    Array.tabulate(a.numElements())(i =>
      if (a.isNullAt(i)) null else java.lang.Double.valueOf(a.getDouble(i)))
}

/** cs_diff(arr): first-order difference, out[0] = 0 (matches
  * Analytics.diff's coalesce-to-0 head, func.c:1029-1077).
  */
case class CsSeriesDiff(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (SeriesArrayFns.dblArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cs_diff requires array<double>, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "cs_diff"
  override def nullSafeEval(input: Any): Any = {
    val a = SeriesCalc.dense(input.asInstanceOf[ArrayData], prettyName)
    val n = a.numElements()
    val out = new Array[Any](n)
    var prev = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      out(i) = if (i == 0) 0.0 else x - prev
      prev = x
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): CsSeriesDiff = copy(child = c)
}

/** cs_ema(arr, n): p = 2/(n+1); ema[0] = x[0]; ema[i] = p·x[i] + (1−p)·ema[i−1]
  * (func.c:1764-1777 — same recurrence as Moving.ema).
  */
case class CsSeriesEma(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (SeriesArrayFns.dblArray(left.dataType) && SeriesArrayFns.integral(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cs_ema requires (array<double>, int), got ${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "cs_ema"
  override def nullSafeEval(arr: Any, nv: Any): Any = {
    val a = SeriesCalc.dense(arr.asInstanceOf[ArrayData], prettyName)
    val p = 2.0 / (nv.asInstanceOf[Number].intValue() + 1)
    val n = a.numElements()
    val out = new Array[Any](n)
    var e = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      e = if (i == 0) x else p * x + (1 - p) * e
      out(i) = e
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CsSeriesEma =
    copy(left = l, right = r)
}

/** cs_rank(arr): 1-based rank with gaps of each element (ties share the
  * smallest rank) — cs_rank (func.c:3495-3561) over one series.
  */
case class CsSeriesRank(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (SeriesArrayFns.dblArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cs_rank requires array<double>, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cs_rank"
  override def nullSafeEval(input: Any): Any = {
    val a = SeriesCalc.dense(input.asInstanceOf[ArrayData], prettyName)
    val n = a.numElements()
    val xs = Array.tabulate(n)(a.getDouble)
    val order = xs.zipWithIndex.sortBy(_._1)
    val ranks = new Array[Any](n)
    var i = 0
    while (i < n) {
      // ties share the rank of the run's first element (rank with gaps)
      if (i > 0 && order(i)._1 == order(i - 1)._1)
        ranks(order(i)._2) = ranks(order(i - 1)._2)
      else
        ranks(order(i)._2) = (i + 1).toLong
      i += 1
    }
    new GenericArrayData(ranks)
  }
  override protected def withNewChildInternal(c: Expression): CsSeriesRank = copy(child = c)
}

/** cs_top_max/cs_top_min(arr, k): the k largest (smallest) values, sorted
  * — cs_top_max/cs_top_min (func.c:3088-3208).
  */
case class CsSeriesTop(left: Expression, right: Expression, desc: Boolean)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (SeriesArrayFns.dblArray(left.dataType) && SeriesArrayFns.integral(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, int), got ${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = if (desc) "cs_top_max" else "cs_top_min"
  override def nullSafeEval(arr: Any, kv: Any): Any = {
    val a = SeriesCalc.dense(arr.asInstanceOf[ArrayData], prettyName)
    val k = kv.asInstanceOf[Number].intValue()
    val xs = Array.tabulate(a.numElements())(a.getDouble)
    val sorted = if (desc) xs.sorted(Ordering[Double].reverse) else xs.sorted
    new GenericArrayData(sorted.take(k).map(x => x: Any))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CsSeriesTop =
    copy(left = l, right = r)
}

/** cs_asof(ts, right_ts, right_vals): the classic as-of lookup as scalar
  * sugar — the latest right_vals[i] with right_ts[i] <= ts, NULL when no
  * such element (func.c:4499-4662 per-element semantics). right_ts must
  * be sorted ascending (the series order); binary search per row.
  */
case class CsAsofLookup(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = SeriesArrayFns.integral(first.dataType) &&
      (second.dataType match {
        case ArrayType(LongType, _) => true
        case _ => false
      }) && SeriesArrayFns.dblArray(third.dataType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cs_asof requires (bigint, array<bigint> sorted asc, array<double>), got " +
        s"${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cs_asof"
  override def nullSafeEval(ts: Any, rts: Any, rvs: Any): Any = {
    val t = ts.asInstanceOf[Number].longValue()
    val a = SeriesCalc.dense(rts.asInstanceOf[ArrayData], prettyName)
    val v = SeriesCalc.dense(rvs.asInstanceOf[ArrayData], prettyName)
    val n = math.min(a.numElements(), v.numElements())
    // rightmost i with a[i] <= t
    var lo = 0
    var hi = n - 1
    var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (a.getLong(mid) <= t) { ans = mid; lo = mid + 1 } else hi = mid - 1
    }
    if (ans < 0) null else v.getDouble(ans)
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): CsAsofLookup =
    copy(first = f, second = s, third = t)
}

/** cs_trend(arr): sign of the last non-zero delta carried forward; first
  * element 0 — cs_trend (func.c:2305-2343), array form of Analytics.trend.
  */
case class CsSeriesTrend(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (SeriesArrayFns.dblArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cs_trend requires array<double>, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "cs_trend"
  override def nullSafeEval(input: Any): Any = {
    val a = SeriesCalc.dense(input.asInstanceOf[ArrayData], prettyName)
    val n = a.numElements()
    val out = new Array[Any](n)
    var t = 0.0
    var prev = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      if (i > 0) {
        val d = math.signum(x - prev)
        if (d != 0.0) t = d
      }
      out(i) = t
      prev = x
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): CsSeriesTrend = copy(child = c)
}

/** cs_cross(arr, dir): 0-based indexes where the sign of the series
  * crosses zero — first element whose non-zero sign differs from the
  * previous non-zero sign (func.c:4170-4219; Analytics.crossings
  * semantics). dir > 0 keeps upward crossings, < 0 downward, 0 both.
  */
case class CsSeriesCross(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (SeriesArrayFns.dblArray(left.dataType) && SeriesArrayFns.integral(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cs_cross requires (array<double>, int dir), got ${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cs_cross"
  override def nullSafeEval(arr: Any, dv: Any): Any = {
    val a = SeriesCalc.dense(arr.asInstanceOf[ArrayData], prettyName)
    val dir = dv.asInstanceOf[Number].intValue()
    val n = a.numElements()
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var prevSign = 0.0
    var i = 0
    while (i < n) {
      val s = math.signum(a.getDouble(i))
      if (s != 0.0) {
        if (prevSign != 0.0 && s != prevSign &&
          (dir == 0 || (dir > 0 && s > 0) || (dir < 0 && s < 0)))
          out += i.toLong
        prevSign = s
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CsSeriesCross =
    copy(left = l, right = r)
}

/** cs_norm(arr): x_i / sqrt(Σx²) — cs_norm (func.c:594-658). A zero
  * vector normalizes to NaNs, matching the SQL division semantics of the
  * frame-level Analytics.norm.
  */
case class CsSeriesNorm(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (SeriesArrayFns.dblArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cs_norm requires array<double>, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "cs_norm"
  override def nullSafeEval(input: Any): Any = {
    val a = SeriesCalc.dense(input.asInstanceOf[ArrayData], prettyName)
    val n = a.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val x = a.getDouble(i); ss += x * x; i += 1 }
    val d = math.sqrt(ss)
    val out = new Array[Any](n)
    i = 0
    while (i < n) { out(i) = a.getDouble(i) / d; i += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): CsSeriesNorm = copy(child = c)
}

/** cs_quantile(arr, q): the q+1 boundary values of the sorted series
  * (func.c:3562-3603) using the same linear-interpolation definition as
  * SQL percentile, so the array form agrees with Analytics.quantile.
  */
case class CsSeriesQuantile(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (SeriesArrayFns.dblArray(left.dataType) && SeriesArrayFns.integral(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cs_quantile requires (array<double>, int q), got ${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "cs_quantile"
  override def nullSafeEval(arr: Any, qv: Any): Any = {
    val a = SeriesCalc.dense(arr.asInstanceOf[ArrayData], prettyName)
    val q = qv.asInstanceOf[Number].intValue()
    val n = a.numElements()
    if (n == 0 || q <= 0) return new GenericArrayData(Array.empty[Any])
    val xs = Array.tabulate(n)(a.getDouble).sorted
    val out = new Array[Any](q + 1)
    var i = 0
    while (i <= q) {
      // SQL percentile: rank r = p*(n-1), linear interpolation
      val r = i.toDouble / q * (n - 1)
      val lo = r.toInt
      val hi = math.min(lo + 1, n - 1)
      out(i) = xs(lo) + (r - lo) * (xs(hi) - xs(lo))
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CsSeriesQuantile =
    copy(left = l, right = r)
}
