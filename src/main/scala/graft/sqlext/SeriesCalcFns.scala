package graft.sqlext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** The reference's full series calculus over SQL ARRAYS — the cumulative,
  * moving-window, grid, run-group, sort/rank, alignment and slicing
  * operator families of imcs--1.1.sql:518-1058, each as an eval-only
  * Catalyst expression over `array<double>` / `array<bigint>` series
  * (the cs_to_array / cs_from_array representation, func.c:4028-4166).
  *
  * Same scale contract as [[SeriesArrayFns]]: per-ROW over one bounded
  * array — the many-small-series shape. The frame-level operators in
  * graft.window / graft.agg / graft.join remain the route for one huge
  * series; every class here cites the frame twin it must agree with
  * (spec-asserted in SqlCalcSpec).
  */
object SeriesCalc {
  private[sqlext] def dblArr(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  private[sqlext] def lngArr(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  private[sqlext] def boolArr(dt: DataType): Boolean = dt match {
    case ArrayType(BooleanType, _) => true
    case _ => false
  }
  private[sqlext] def integral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  /** Read an integral SQL argument as Int, rejecting values outside the
    * Int range loudly — Number.intValue() silently WRAPS a bigint
    * (2^32+1 becomes 1), turning an absurd window/step/k into a
    * plausible-looking wrong answer.
    */
  private[sqlext] def intArg(v: Any, what: String): Int = {
    val l = v.asInstanceOf[Number].longValue()
    require(l >= Int.MinValue && l <= Int.MaxValue, s"$what out of int range: $l")
    l.toInt
  }

  /** SQL-normalized double for ordering/tie purposes: -0.0 → 0.0 (Spark
    * comparisons treat them equal).
    */
  private[sqlext] def normZero(x: Double): Double = if (x == 0.0) 0.0 else x

  private[sqlext] def fail(msg: String): TypeCheckResult =
    TypeCheckResult.TypeCheckFailure(msg)
  private[sqlext] val ok: TypeCheckResult = TypeCheckResult.TypeCheckSuccess

  /** Series arrays are DENSE (the reference's series carry no nulls; a
    * null reaches these ops only through SQL composition, e.g. a
    * transform over a nullable column). Reading a null slot through
    * ArrayData.getDouble/getLong is an unchecked access returning
    * garbage, so every element-consuming eval rejects it loudly instead.
    * One O(n) isNullAt pass; these are eval-only expressions already.
    */
  private[sqlext] def dense(a: ArrayData, fn: String): ArrayData = {
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (a.isNullAt(i)) throw new IllegalArgumentException(
        s"$fn: series arrays are dense, found NULL element at position $i " +
          "(filter or coalesce nulls before packing the series)")
      i += 1
    }
    a
  }
}

/** Cumulative aggregates over one series array — cs_cum_sum/avg/min/max/
  * prd/var/dev (func.c:1791-1887). Same semantics as the frame-level
  * Aggs.cumAgg running frame: avg divides by the running count, var/dev
  * use the reference's naive (Σx² − (Σx)²/n)/n prefix formula
  * (func.c:1475-1491), prd is the running product (cum_prd,
  * func.c:1831-1840).
  */
case class CsSeriesCum(op: String, child: Expression)
    extends UnaryExpression with CodegenFallback {
  require(CsSeriesCum.ops(op), s"unknown cum op $op")
  override def checkInputDataTypes(): TypeCheckResult =
    if (SeriesCalc.dblArr(child.dataType)) SeriesCalc.ok
    else SeriesCalc.fail(s"cs_cum_$op requires array<double>, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = s"cs_cum_$op"
  override def nullSafeEval(input: Any): Any = {
    val a = SeriesCalc.dense(input.asInstanceOf[ArrayData], prettyName)
    val n = a.numElements()
    val out = new Array[Any](n)
    var s = 0.0; var ss = 0.0; var mn = Double.PositiveInfinity
    var mx = Double.NegativeInfinity; var p = 1.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      s += x; ss += x * x; p *= x
      if (x < mn) mn = x
      if (x > mx) mx = x
      val k = i + 1
      out(i) = op match {
        case "sum" => s
        case "avg" => s / k
        case "min" => mn
        case "max" => mx
        case "prd" => p
        case "var" => math.max((ss - s * s / k) / k, 0.0)
        case "dev" => math.sqrt(math.max((ss - s * s / k) / k, 0.0))
      }
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): CsSeriesCum = copy(child = c)
}
object CsSeriesCum {
  val ops = Set("sum", "avg", "min", "max", "prd", "var", "dev")
}

/** Moving-window aggregates over one series array — cs_window_sum/avg/
  * min/max/var/dev/atr (func.c:1632-1790). Warm-up matches the
  * reference's zero-initialized ring buffer for sum/avg/var/dev (sums
  * cover the actual prefix; avg and var divide by the FIXED interval n,
  * func.c:1683,1718-1745) and the growing divisor for atr
  * (func.c:1779-1781: n' = min(i+1, n)). min/max use the true trailing
  * window over the actual prefix — the reference's zero-filled history
  * would report 0 as the warm-up min on positive data, a ring-buffer
  * artifact we deliberately do not reproduce (Moving.windowAgg makes
  * the same call).
  */
case class CsSeriesWindowAgg(op: String, left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  require(CsSeriesWindowAgg.ops(op), s"unknown window op $op")
  override def checkInputDataTypes(): TypeCheckResult =
    if (SeriesCalc.dblArr(left.dataType) && SeriesCalc.integral(right.dataType))
      SeriesCalc.ok
    else SeriesCalc.fail(
      s"cs_window_$op requires (array<double>, int), got ${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = s"cs_window_$op"
  override def nullSafeEval(arr: Any, nv: Any): Any = {
    val a = SeriesCalc.dense(arr.asInstanceOf[ArrayData], prettyName)
    val w = SeriesCalc.intArg(nv, s"cs_window_$op interval")
    require(w > 0, s"cs_window_$op interval must be positive, got $w")
    val n = a.numElements()
    val out = new Array[Any](n)
    op match {
      case "atr" =>
        var acc = 0.0
        var i = 0
        while (i < n) {
          val k = math.min(i + 1, w)
          acc = (acc * (k - 1) + a.getDouble(i)) / k
          out(i) = acc
          i += 1
        }
      case "min" | "max" =>
        // monotonic index deque — O(n), where rescanning the trailing
        // window per element is O(n·w) (minutes per row at w ~ n/2)
        val isMin = op == "min"
        val dq = new java.util.ArrayDeque[Int]()
        var i = 0
        while (i < n) {
          val x = a.getDouble(i)
          while (!dq.isEmpty && {
            val t = a.getDouble(dq.peekLast)
            if (isMin) t >= x else t <= x
          }) dq.removeLast()
          dq.addLast(i)
          if (dq.peekFirst <= i - w) dq.removeFirst()
          out(i) = a.getDouble(dq.peekFirst)
          i += 1
        }
      case _ =>
        // ring-buffer running Σx, Σx² — one pass like the reference
        var s = 0.0; var ss = 0.0
        var i = 0
        while (i < n) {
          val x = a.getDouble(i)
          s += x; ss += x * x
          if (i >= w) {
            val old = a.getDouble(i - w)
            s -= old; ss -= old * old
          }
          out(i) = op match {
            case "sum" => s
            case "avg" => s / w
            case "var" => math.max((ss - s * s / w) / w, 0.0)
            case "dev" => math.sqrt(math.max((ss - s * s / w) / w, 0.0))
          }
          i += 1
        }
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CsSeriesWindowAgg =
    copy(left = l, right = r)
}
object CsSeriesWindowAgg {
  val ops = Set("sum", "avg", "min", "max", "var", "dev", "atr")
}

/** Grid (tumbling count-bucket) aggregates — cs_grid_sum/avg/min/max/var/
  * dev (func.c:2170-2266): one output per bucket of `step` consecutive
  * elements, partial tail bucket included with its actual count (same as
  * the frame-level Aggs.gridAgg groupBy(floor(pos/step))).
  */
case class CsSeriesGrid(op: String, left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  require((CsSeriesWindowAgg.ops - "atr").contains(op), s"unknown grid op $op")
  override def checkInputDataTypes(): TypeCheckResult =
    if (SeriesCalc.dblArr(left.dataType) && SeriesCalc.integral(right.dataType))
      SeriesCalc.ok
    else SeriesCalc.fail(
      s"cs_grid_$op requires (array<double>, int), got ${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = s"cs_grid_$op"
  override def nullSafeEval(arr: Any, sv: Any): Any = {
    val a = SeriesCalc.dense(arr.asInstanceOf[ArrayData], prettyName)
    val step = SeriesCalc.intArg(sv, s"cs_grid_$op step")
    require(step > 0, s"cs_grid_$op step must be positive, got $step")
    val n = a.numElements()
    // NOT (n + step - 1) / step: that sum overflows Int for a large step
    // (a legitimate "one bucket covering everything" value)
    val buckets = if (n == 0) 0 else (n - 1) / step + 1
    val out = new Array[Any](buckets)
    var b = 0
    while (b < buckets) {
      val from = b * step
      val till = math.min(from + step, n)
      var s = 0.0; var ss = 0.0
      var mn = Double.PositiveInfinity; var mx = Double.NegativeInfinity
      var j = from
      while (j < till) {
        val x = a.getDouble(j)
        s += x; ss += x * x
        if (x < mn) mn = x
        if (x > mx) mx = x
        j += 1
      }
      val k = till - from
      out(b) = op match {
        case "sum" => s
        case "avg" => s / k
        case "min" => mn
        case "max" => mx
        case "var" => math.max((ss - s * s / k) / k, 0.0)
        case "dev" => math.sqrt(math.max((ss - s * s / k) / k, 0.0))
      }
      b += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CsSeriesGrid =
    copy(left = l, right = r)
}

/** Run-group aggregates — cs_group_* / cs_win_group_* (func.c:1898-2092,
  * 6594-6790): groups are RUNS of equal adjacent values in `groups`
  * (array<bigint>), exactly like Aggs.attachRunId. `windowed = false`
  * emits one element per run (cs_group_*); `windowed = true` is
  * length-preserving — every member carries its run's aggregate
  * (cs_win_group_*). Ops sum/avg/min/max/var/dev/first/last read `vals`
  * as array<double>; count ignores vals; any/all (bitwise OR/AND,
  * func.c:1446-1456) and approxdc (per-run distinct count — exact here,
  * a zero-error "estimate"; the reference uses HLL, func.c:4975-5074)
  * read vals as array<bigint>.
  */
case class CsSeriesGroupAgg(op: String, windowed: Boolean,
                            left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  require(CsSeriesGroupAgg.ops(op), s"unknown group op $op")
  private def longOp = CsSeriesGroupAgg.longOps(op)
  // first/last are type-preserving in the reference (func.c FIRST/LAST
  // are generic over element type): accept either array type and carry it
  private def typePreserving = op == "first" || op == "last"
  private def valsAreLong = SeriesCalc.lngArr(left.dataType)
  override def checkInputDataTypes(): TypeCheckResult = {
    val valsOk =
      if (op == "count") true
      else if (longOp) SeriesCalc.lngArr(left.dataType)
      else if (typePreserving)
        SeriesCalc.dblArr(left.dataType) || SeriesCalc.lngArr(left.dataType)
      else SeriesCalc.dblArr(left.dataType)
    if (valsOk && SeriesCalc.lngArr(right.dataType)) SeriesCalc.ok
    else SeriesCalc.fail(
      s"$prettyName requires (array<${if (longOp) "bigint" else "double"}> vals, " +
        s"array<bigint> groups), got ${left.dataType.sql}, ${right.dataType.sql}")
  }
  override def dataType: DataType =
    ArrayType(
      if (longOp || op == "count" || (typePreserving && valsAreLong)) LongType
      else DoubleType,
      containsNull = false)
  override def prettyName: String =
    if (windowed) s"cs_win_group_$op" else s"cs_group_$op"
  override def nullSafeEval(vals: Any, grps: Any): Any = {
    val v = if (op == "count") vals.asInstanceOf[ArrayData]
            else SeriesCalc.dense(vals.asInstanceOf[ArrayData], prettyName)
    val g = SeriesCalc.dense(grps.asInstanceOf[ArrayData], prettyName)
    val n = g.numElements()
    require(op == "count" || v.numElements() >= n,
      s"$prettyName: vals shorter than groups (${v.numElements()} < $n)")
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < n) {
      // run [i, j)
      var j = i + 1
      while (j < n && g.getLong(j) == g.getLong(i)) j += 1
      val res: Any = op match {
        case "count" => (j - i).toLong
        case "any" | "all" =>
          var acc = if (op == "all") -1L else 0L
          var k = i
          while (k < j) {
            val x = v.getLong(k)
            acc = if (op == "all") acc & x else acc | x
            k += 1
          }
          acc
        case "approxdc" =>
          val seen = scala.collection.mutable.HashSet.empty[Long]
          var k = i
          while (k < j) { seen += v.getLong(k); k += 1 }
          seen.size.toLong
        case "first" => if (valsAreLong) v.getLong(i) else v.getDouble(i)
        case "last" => if (valsAreLong) v.getLong(j - 1) else v.getDouble(j - 1)
        case _ =>
          var s = 0.0; var ss = 0.0
          var mn = Double.PositiveInfinity; var mx = Double.NegativeInfinity
          var k = i
          while (k < j) {
            val x = v.getDouble(k)
            s += x; ss += x * x
            if (x < mn) mn = x
            if (x > mx) mx = x
            k += 1
          }
          val c = j - i
          op match {
            case "sum" => s
            case "avg" => s / c
            case "min" => mn
            case "max" => mx
            case "var" => math.max((ss - s * s / c) / c, 0.0)
            case "dev" => math.sqrt(math.max((ss - s * s / c) / c, 0.0))
          }
      }
      if (windowed) { var k = i; while (k < j) { out += res; k += 1 } }
      else out += res
      i = j
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CsSeriesGroupAgg =
    copy(left = l, right = r)
}
object CsSeriesGroupAgg {
  val ops = Set("count", "sum", "avg", "min", "max", "var", "dev",
    "first", "last", "any", "all", "approxdc")
  val longOps = Set("any", "all", "approxdc")
}

/** cs_sort(arr, asc) companion: the STABLE sort permutation —
  * cs_sort_pos / cs_sort_pos_asc (func.c:3210-3322). Returns the 0-based
  * source positions in sorted-value order; ties keep source order.
  */
case class CsSeriesSortPos(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (SeriesCalc.dblArr(left.dataType) && right.dataType == BooleanType)
      SeriesCalc.ok
    else SeriesCalc.fail(
      s"cs_sort_pos requires (array<double>, bool asc), got ${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cs_sort_pos"
  override def nullSafeEval(arr: Any, ascv: Any): Any = {
    val a = SeriesCalc.dense(arr.asInstanceOf[ArrayData], prettyName)
    val asc = ascv.asInstanceOf[Boolean]
    val n = a.numElements()
    val idx = Array.range(0, n)
    val sorted = idx.sortBy(a.getDouble) // stable
    val out: Array[Int] = if (asc) sorted else sorted.reverse
    // a reversed stable ascending sort breaks tie order; restore by
    // re-sorting equal-value runs ascending by position
    if (!asc) {
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n && a.getDouble(out(j)) == a.getDouble(out(i))) j += 1
        java.util.Arrays.sort(out, i, j)
        i = j
      }
    }
    new GenericArrayData(out.map(_.toLong: Any))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CsSeriesSortPos =
    copy(left = l, right = r)
}

/** cs_rank with an order flag — the reference's 2-arg
  * cs_rank(ts, 'asc'|'desc') enum form (imcs--1.1.sql:10; sql/sort.sql):
  * 1-based rank with gaps, ties share the smallest rank. The 1-arg
  * ascending form lives in SeriesArrayFns (CsSeriesRank); this is its
  * ordered twin, validated against expected/sort.out's desc example
  * `{1.1,0.2,2.2,0.2,0.1} -> {2,3,1,3,5}`.
  */
case class CsSeriesRankOrd(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (SeriesCalc.dblArr(left.dataType) && right.dataType == BooleanType)
      SeriesCalc.ok
    else SeriesCalc.fail(
      s"cs_rank requires (array<double>, bool asc), got ${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cs_rank"
  override def nullSafeEval(arr: Any, ascv: Any): Any = {
    val a = SeriesCalc.dense(arr.asInstanceOf[ArrayData], prettyName)
    val asc = ascv.asInstanceOf[Boolean]
    val n = a.numElements()
    // SQL-normalized doubles: -0.0 ties 0.0 and NaN ties NaN (the total
    // order Spark's own rank() uses); descending REVERSES the total order
    // instead of negating the key, which would strand NaN at the bottom
    // of both directions
    val xs = Array.tabulate(n)(i => SeriesCalc.normZero(a.getDouble(i)))
    val ord =
      if (asc) Ordering.Double.TotalOrdering
      else Ordering.Double.TotalOrdering.reverse
    val order = xs.zipWithIndex.sortBy(_._1)(ord)
    val ranks = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (i > 0 && java.lang.Double.compare(order(i)._1, order(i - 1)._1) == 0)
        ranks(order(i)._2) = ranks(order(i - 1)._2)
      else
        ranks(order(i)._2) = (i + 1).toLong
      i += 1
    }
    new GenericArrayData(ranks)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CsSeriesRankOrd =
    copy(left = l, right = r)
}

/** cs_dense_rank / cs_dense_rank_asc (func.c:3495-3561 family): 1-based
  * rank without gaps — ties share a rank, the next distinct value gets
  * the next integer.
  */
case class CsSeriesDenseRank(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (SeriesCalc.dblArr(left.dataType) && right.dataType == BooleanType)
      SeriesCalc.ok
    else SeriesCalc.fail(
      s"cs_dense_rank requires (array<double>, bool asc), got ${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cs_dense_rank"
  override def nullSafeEval(arr: Any, ascv: Any): Any = {
    val a = SeriesCalc.dense(arr.asInstanceOf[ArrayData], prettyName)
    val asc = ascv.asInstanceOf[Boolean]
    val n = a.numElements()
    // normalize -0.0 to 0.0 BEFORE distinct: boxed equality would keep
    // both and hand numerically equal values different dense ranks
    // (cs_rank ties them)
    val xs = Array.tabulate(n)(i => SeriesCalc.normZero(a.getDouble(i)))
    val distinct = xs.distinct.sorted(Ordering.Double.TotalOrdering)
    val ordered = if (asc) distinct else distinct.reverse
    // key by canonical BITS: a Map[Double, _] lookup compares primitively,
    // and NaN != NaN would miss its own entry
    val rank = ordered.zipWithIndex.map { case (x, i) =>
      java.lang.Double.doubleToLongBits(x) -> (i + 1).toLong
    }.toMap
    new GenericArrayData(
      xs.map(x => rank(java.lang.Double.doubleToLongBits(x)): Any))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CsSeriesDenseRank =
    copy(left = l, right = r)
}

/** cs_top_max_pos / cs_top_min_pos (func.c:3088-3208): 0-based positions
  * of the k largest (smallest) elements, in value order, ties broken by
  * position — array twin of Aggs.topKPos.
  */
case class CsSeriesTopPos(left: Expression, right: Expression, desc: Boolean)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (SeriesCalc.dblArr(left.dataType) && SeriesCalc.integral(right.dataType))
      SeriesCalc.ok
    else SeriesCalc.fail(
      s"$prettyName requires (array<double>, int k), got ${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = if (desc) "cs_top_max_pos" else "cs_top_min_pos"
  override def nullSafeEval(arr: Any, kv: Any): Any = {
    val a = SeriesCalc.dense(arr.asInstanceOf[ArrayData], prettyName)
    val k = SeriesCalc.intArg(kv, s"$prettyName k")
    val n = a.numElements()
    val idx = Array.range(0, n)
    val sorted =
      if (desc) idx.sortBy(i => (-a.getDouble(i), i))
      else idx.sortBy(i => (a.getDouble(i), i))
    new GenericArrayData(sorted.take(k).map(_.toLong: Any))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CsSeriesTopPos =
    copy(left = l, right = r)
}

/** cs_histogram(arr, min, max, n) (func.c:4062-4133): counts of values
  * falling in n equal-width bins over [min, max); out-of-range values are
  * ignored — same contract as the frame-level Aggs.histogram.
  */
case class CsSeriesHistogram(children: Seq[Expression])
    extends Expression with CodegenFallback {
  require(children.size == 4, "cs_histogram(arr, min, max, n_intervals)")
  override def checkInputDataTypes(): TypeCheckResult = {
    val num = (d: DataType) => d == DoubleType || SeriesCalc.integral(d)
    if (SeriesCalc.dblArr(children(0).dataType) && num(children(1).dataType) &&
      num(children(2).dataType) && SeriesCalc.integral(children(3).dataType))
      SeriesCalc.ok
    else SeriesCalc.fail("cs_histogram requires (array<double>, double, double, int)")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "cs_histogram"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) return null
    val a = SeriesCalc.dense(vs(0).asInstanceOf[ArrayData], prettyName)
    val lo = vs(1).asInstanceOf[Number].doubleValue()
    val hi = vs(2).asInstanceOf[Number].doubleValue()
    val bins = SeriesCalc.intArg(vs(3), "cs_histogram bins")
    require(bins > 0 && hi > lo, s"cs_histogram: need max > min and n > 0")
    val width = (hi - lo) / bins
    val out = new Array[Long](bins)
    var i = 0
    val n = a.numElements()
    while (i < n) {
      val x = a.getDouble(i)
      // clamp: width is rounded, so x just below hi can compute to bin
      // `bins` (the reference's multiply-before-divide (x-lo)*n/(hi-lo)
      // formula, func.c:4062-4133, cannot — clamping reproduces it)
      if (x >= lo && x < hi)
        out(math.min(bins - 1, ((x - lo) / width).toInt)) += 1
      i += 1
    }
    new GenericArrayData(out.map(x => x: Any))
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CsSeriesHistogram =
    copy(children = c)
}

/** cs_extrema(arr) (func.c:4221-4305): 0-based positions where the trend
  * reverses — the sign of the last non-zero delta at i differs from the
  * next non-zero delta after i (alternating local minima/maxima). Agrees
  * with the frame-level Analytics.extrema; the reference's
  * `first_extremum` start-condition argument is unnecessary here because
  * boundary elements (no delta on one side) are never emitted.
  */
case class CsSeriesExtrema(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (SeriesCalc.dblArr(child.dataType)) SeriesCalc.ok
    else SeriesCalc.fail(s"cs_extrema requires array<double>, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cs_extrema"
  override def nullSafeEval(input: Any): Any = {
    val a = SeriesCalc.dense(input.asInstanceOf[ArrayData], prettyName)
    val n = a.numElements()
    // before(i) = sign of last non-zero delta in (0, i]; after(i) = next
    // non-zero delta sign strictly after i
    val before = new Array[Double](n)
    var carry = 0.0
    var i = 1
    while (i < n) {
      val d = math.signum(a.getDouble(i) - a.getDouble(i - 1))
      if (d != 0.0) carry = d
      before(i) = carry
      i += 1
    }
    var after = 0.0
    i = n - 1
    val rev = scala.collection.mutable.ArrayBuffer.empty[Any]
    while (i >= 0) {
      if (before(i) != 0.0 && after != 0.0 && before(i) != after) rev += i.toLong
      if (before(i) != 0.0) after = before(i)
      i -= 1
    }
    new GenericArrayData(rev.reverse.toArray)
  }
  override protected def withNewChildInternal(c: Expression): CsSeriesExtrema = copy(child = c)
}

/** cs_if(cond, then, else) (func.c:2559-2681) — the stateful
  * branch-consume conditional: the i-th TRUE row reads then[i_true] (the
  * i-th element of the then-series, not the row's own position); false
  * rows read else[i_false]. Null when the chosen branch is exhausted —
  * the array twin of Conditional.csIf.
  */
case class CsSeriesIf(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (SeriesCalc.boolArr(first.dataType) && SeriesCalc.dblArr(second.dataType) &&
      SeriesCalc.dblArr(third.dataType)) SeriesCalc.ok
    else SeriesCalc.fail(
      s"cs_if requires (array<boolean>, array<double>, array<double>), got " +
        s"${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql}")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "cs_if"
  override def nullSafeEval(cond: Any, a: Any, b: Any): Any = {
    val c = cond.asInstanceOf[ArrayData]
    val ta = SeriesCalc.dense(a.asInstanceOf[ArrayData], prettyName)
    val tb = SeriesCalc.dense(b.asInstanceOf[ArrayData], prettyName)
    val n = c.numElements()
    val out = new Array[Any](n)
    var ai = 0; var bi = 0
    var i = 0
    while (i < n) {
      out(i) =
        if (c.isNullAt(i)) null
        else if (c.getBoolean(i)) {
          if (ai < ta.numElements()) { val v = ta.getDouble(ai); ai += 1; v } else null
        } else {
          if (bi < tb.numElements()) { val v = tb.getDouble(bi); bi += 1; v } else null
        }
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): CsSeriesIf =
    copy(first = f, second = s, third = t)
}

/** The alignment family over sorted ts arrays — one merge-scan per op
  * (all inputs ascending by ts, the series order), matching the
  * reference's DOCUMENTED semantics (user_guide.html:1229-1253, whose
  * worked examples are the contract):
  *
  *  - `asof` (cs_asof_join, func.c:4499-4577): for each left ts, the
  *    value at the NEAREST right ts — `cs_asof_join('{4,9}',
  *    '{1,3,6,10}', '{0.1,0.3,0.6,1.0}') = '{0.3,1.0}'` (left 9 matches
  *    the FUTURE ts 10). Equidistant ties take the earlier right
  *    element. Null only when the right series is empty. (The C
  *    iterator's nearest-pick condition at func.c:4633 is inverted
  *    relative to this documented example; the documentation wins.)
  *  - `asof_pos` (cs_asof_join_pos): its 0-based right position —
  *    `'{4,9}' -> '{1,3,6,10}' = '{1,3}'`.
  *  - `join` (cs_join, func.c:4677-4801): values at EXACT ts matches
  *    only; each right element pairs AT MOST ONCE (the merge advances
  *    both cursors on a match, so duplicate equal timestamps pair
  *    one-to-one). Output length = #matches.
  *  - `join_pos` (cs_join_pos): matched right positions.
  *  - `stretch` (cs_stretch, func.c:4308-4360): for each left ts, the
  *    value at the FIRST right ts STRICTLY GREATER than it, `filler`
  *    once the right series is exhausted — `cs_stretch('{1,2,3,4,5}',
  *    '{2,4}', '{1.1,2.2}', 1.0) = '{1.1,2.2,2.2,1.0,1.0}'` (the
  *    split-adjustment shape: each date carries the product of FUTURE
  *    splits). Length-preserving.
  *  - `stretch0` (cs_stretch0, func.c:4395-4465): the merged UNION of
  *    both timestamp sets — vals where ts2 has the timestamp, `filler`
  *    where only ts1 does; equal timestamps advance both cursors —
  *    `cs_stretch0('{1,2,3,5}', '{2,3,4}', '{1.1,1.2,1.3}', 0.0) =
  *    '{0.0,1.1,1.2,1.3,0.0}'`. Output length = |union|.
  *
  * Children: (ts1, ts2[, vals][, filler]) — vals for value-producing
  * ops, filler for the stretch pair. O(n+m) per row.
  */
case class CsSeriesAlign(op: String, children: Seq[Expression])
    extends Expression with CodegenFallback {
  import CsSeriesAlign._
  require(arity.contains(op), s"unknown align op $op")
  require(arity(op) == children.size,
    s"cs_$op expects ${arity(op)} arguments, got ${children.size}")
  private def posOp = op.endsWith("_pos")
  override def checkInputDataTypes(): TypeCheckResult = {
    val tsOk = SeriesCalc.lngArr(children(0).dataType) &&
      SeriesCalc.lngArr(children(1).dataType)
    val valsOk = posOp || SeriesCalc.dblArr(children(2).dataType)
    val fillOk = !op.startsWith("stretch") ||
      children(3).dataType == DoubleType || SeriesCalc.integral(children(3).dataType)
    if (tsOk && valsOk && fillOk) SeriesCalc.ok
    else SeriesCalc.fail(s"cs_$op: expected (array<bigint> ts1, array<bigint> ts2" +
      (if (!posOp) ", array<double> vals" else "") +
      (if (op.startsWith("stretch")) ", double filler" else "") + ")")
  }
  override def dataType: DataType =
    ArrayType(if (posOp) LongType else DoubleType,
      containsNull = op.startsWith("asof_join"))
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = s"cs_$op"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) return null
    val t1 = SeriesCalc.dense(vs(0).asInstanceOf[ArrayData], prettyName)
    val t2 = SeriesCalc.dense(vs(1).asInstanceOf[ArrayData], prettyName)
    val vals =
      if (posOp) null
      else SeriesCalc.dense(vs(2).asInstanceOf[ArrayData], prettyName)
    val filler = if (op.startsWith("stretch"))
      vs(3).asInstanceOf[Number].doubleValue() else 0.0
    val n = t1.numElements()
    val m = t2.numElements()
    require(posOp || vals.numElements() >= m,
      s"cs_$op: values timeseries is too short (${vals.numElements()} < $m)")
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var j = 0
    var i = 0
    if (op == "stretch0") {
      // merged union of both timestamp sets (equal ts advances both)
      while (i < n && j < m) {
        val lt = t1.getLong(i); val rt = t2.getLong(j)
        if (lt < rt) { out += filler; i += 1 }
        else { if (lt == rt) i += 1; out += vals.getDouble(j); j += 1 }
      }
      while (i < n) { out += filler; i += 1 }
      while (j < m) { out += vals.getDouble(j); j += 1 }
    } else while (i < n) {
      val t = t1.getLong(i)
      op match {
        case "asof_join" | "asof_join_pos" =>
          while (j < m && t2.getLong(j) <= t) j += 1
          // j-1 = latest right ≤ t, j = earliest right > t; pick the
          // nearer, equidistant ties to the earlier (doc example {1,3})
          val pick =
            if (m == 0) -1
            else if (j == 0) 0
            else if (j == m) j - 1
            else if (t - t2.getLong(j - 1) <= t2.getLong(j) - t) j - 1
            else j
          out += (if (pick < 0) null
                  else if (op == "asof_join_pos") pick.toLong
                  else vals.getDouble(pick))
        case "join" | "join_pos" =>
          while (j < m && t2.getLong(j) < t) j += 1
          if (j < m && t2.getLong(j) == t) {
            out += (if (posOp) j.toLong else vals.getDouble(j))
            j += 1 // one-to-one: a right element pairs at most once
          }
        case "stretch" =>
          while (j < m && t2.getLong(j) <= t) j += 1
          out += (if (j < m) vals.getDouble(j) else filler)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CsSeriesAlign =
    copy(children = c)
}
object CsSeriesAlign {
  val arity: Map[String, Int] = Map(
    "asof_join" -> 3, "asof_join_pos" -> 2, "join" -> 3, "join_pos" -> 2,
    "stretch" -> 4, "stretch0" -> 4)
}

/** Positional slice — cs_limit(arr, from, till) (func.c:3938-4026):
  * inclusive [from, till], negative indexes count from the end.
  * cs_head/cs_tail/cs_cut_head/cs_cut_tail are registered as sugar over
  * this one class (imcs--1.1.sql:855-859 defines them the same way).
  */
case class CsSeriesSlice(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if ((SeriesCalc.dblArr(first.dataType) || SeriesCalc.lngArr(first.dataType)) &&
      SeriesCalc.integral(second.dataType) && SeriesCalc.integral(third.dataType))
      SeriesCalc.ok
    else SeriesCalc.fail(
      s"cs_limit requires (array, int from, int till), got ${first.dataType.sql}")
  override def dataType: DataType = first.dataType
  override def prettyName: String = "cs_limit"
  override def nullSafeEval(arr: Any, fromV: Any, tillV: Any): Any = {
    val a = SeriesCalc.dense(arr.asInstanceOf[ArrayData], prettyName)
    val n = a.numElements()
    val rawFrom = fromV.asInstanceOf[Number].longValue()
    val rawTill = tillV.asInstanceOf[Number].longValue()
    // clamp BOTH ends into [0, n] before narrowing: a from past the end
    // (cs_cut_head(arr, huge) sugar expands to one) must give the empty
    // slice, not wrap negative through toInt
    val from = math.min(math.max(if (rawFrom < 0) n + rawFrom else rawFrom, 0L), n.toLong).toInt
    val till = math.max(math.min(if (rawTill < 0) n + rawTill else rawTill, n - 1L), -1L).toInt
    if (till < from) return new GenericArrayData(Array.empty[Any])
    val isLong = SeriesCalc.lngArr(first.dataType)
    new GenericArrayData(Array.tabulate[Any](till - from + 1)(i =>
      if (isLong) a.getLong(from + i) else a.getDouble(from + i)))
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): CsSeriesSlice =
    copy(first = f, second = s, third = t)
}

/** cs_thin(arr, origin, step) (func.c:664-767): every step-th element
  * starting at origin — array twin of Series.thin.
  */
case class CsSeriesThin(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (SeriesCalc.dblArr(first.dataType) &&
      SeriesCalc.integral(second.dataType) && SeriesCalc.integral(third.dataType))
      SeriesCalc.ok
    else SeriesCalc.fail(s"cs_thin requires (array<double>, int origin, int step)")
  override def dataType: DataType = first.dataType
  override def prettyName: String = "cs_thin"
  override def nullSafeEval(arr: Any, originV: Any, stepV: Any): Any = {
    val a = SeriesCalc.dense(arr.asInstanceOf[ArrayData], prettyName)
    val origin = SeriesCalc.intArg(originV, "cs_thin origin")
    val step = SeriesCalc.intArg(stepV, "cs_thin step")
    require(origin >= 0, s"cs_thin origin must be >= 0, got $origin")
    require(step > 0, s"cs_thin step must be positive, got $step")
    val n = a.numElements()
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = origin
    while (i < n) { out += a.getDouble(i); i += step }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): CsSeriesThin =
    copy(first = f, second = s, third = t)
}

/** cs_unique(arr) (func.c:3737-3844): collapse runs of equal adjacent
  * values to their first element — array twin of Series.uniqueAdjacent.
  */
case class CsSeriesUnique(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (SeriesCalc.dblArr(child.dataType)) SeriesCalc.ok
    else SeriesCalc.fail(s"cs_unique requires array<double>, got ${child.dataType.sql}")
  override def dataType: DataType = child.dataType
  override def prettyName: String = "cs_unique"
  override def nullSafeEval(input: Any): Any = {
    val a = SeriesCalc.dense(input.asInstanceOf[ArrayData], prettyName)
    val n = a.numElements()
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      if (i == 0 || x != a.getDouble(i - 1)) out += x
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildInternal(c: Expression): CsSeriesUnique = copy(child = c)
}

/** cs_map(arr, positions) (btree.c:255-347): positional gather — element
  * of `arr` at each 0-based position; array twin of Series.gather.
  * Out-of-range positions yield null (the reference errors; arrays are
  * slices here, so a soft null composes better with cs_filter_pos).
  */
case class CsSeriesGather(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (SeriesCalc.dblArr(left.dataType) && SeriesCalc.lngArr(right.dataType))
      SeriesCalc.ok
    else SeriesCalc.fail(
      s"cs_map requires (array<double>, array<bigint> positions), got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "cs_map"
  override def nullSafeEval(arr: Any, posv: Any): Any = {
    val a = SeriesCalc.dense(arr.asInstanceOf[ArrayData], prettyName)
    val p = SeriesCalc.dense(posv.asInstanceOf[ArrayData], prettyName)
    val n = a.numElements()
    new GenericArrayData(Array.tabulate[Any](p.numElements()) { i =>
      val idx = p.getLong(i)
      if (idx >= 0 && idx < n) a.getDouble(idx.toInt) else null
    })
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CsSeriesGather =
    copy(left = l, right = r)
}

/** cs_filter_pos(cond) (func.c:2834-2930): 0-based positions where the
  * boolean series holds — array twin of Series.filterPos.
  * cs_filter_first_pos(cond, n) slices this with CsSeriesSlice.
  */
case class CsSeriesFilterPos(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (SeriesCalc.boolArr(child.dataType)) SeriesCalc.ok
    else SeriesCalc.fail(s"cs_filter_pos requires array<boolean>, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cs_filter_pos"
  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && a.getBoolean(i)) out += i.toLong
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildInternal(c: Expression): CsSeriesFilterPos = copy(child = c)
}

/** cs_repeat(arr, n) (func.c:769-862): each element repeated n times in
  * place — array twin of Series.repeat.
  */
case class CsSeriesRepeat(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (SeriesCalc.dblArr(left.dataType) && SeriesCalc.integral(right.dataType))
      SeriesCalc.ok
    else SeriesCalc.fail(s"cs_repeat requires (array<double>, int n)")
  override def dataType: DataType = left.dataType
  override def prettyName: String = "cs_repeat"
  override def nullSafeEval(arr: Any, nv: Any): Any = {
    val a = SeriesCalc.dense(arr.asInstanceOf[ArrayData], prettyName)
    val rep = SeriesCalc.intArg(nv, "cs_repeat count")
    require(rep >= 0, s"cs_repeat count must be >= 0, got $rep")
    val n = a.numElements()
    require(n.toLong * rep <= Int.MaxValue,
      s"cs_repeat output of $n x $rep elements exceeds the array limit")
    val out = new Array[Any](n * rep)
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      var r = 0
      while (r < rep) { out(i * rep + r) = x; r += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CsSeriesRepeat =
    copy(left = l, right = r)
}
