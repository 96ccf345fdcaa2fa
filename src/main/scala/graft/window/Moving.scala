package graft.window

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Moving (trailing count-window) operators — cs_window_* (SURVEY.md §2.5).
  *
  * All are length-preserving over a trailing window of N rows; the first
  * N-1 outputs aggregate the partial window, matching the reference
  * (user_guide.html "Window (moving) aggregates").
  *
  * sum/avg/min/max/var map to Spark window frames
  * `rowsBetween(-(N-1), 0)` — per-key windows shuffle once on the key and
  * then run streaming within each sorted partition, which scales linearly
  * across keys on a cluster.
  *
  * EMA and ATR are *recursive* (each output depends on the previous
  * output, func.c:1764-1788) and have no SQL frame equivalent. They are
  * implemented as a single-pass per-key scan: repartition by key, sort
  * within partitions by (key, pos), then one sequential pass per key inside
  * mapPartitions. This is one shuffle and O(1) state per key — the same
  * cost shape as a window agg, and it streams (never collects a key's
  * series into memory at once).
  */
object Moving {

  /** Read a numeric cell for a recursive scan, rejecting NULL loudly: the
    * recursive state (EMA/ATR/cumprod/diff carries) has no NULL semantics —
    * the reference's series elements are primitives — and the alternative
    * is an opaque executor NullPointerException four task-retries later.
    */
  private[graft] def numAt(r: Row, idx: Int, op: String): Double = {
    if (r.isNullAt(idx)) throw new IllegalArgumentException(
      s"$op requires non-null values (recursive state has no NULL " +
        "semantics); filter or gap-fill NULLs first")
    r.getAs[Number](idx).doubleValue()
  }

  /** Same case-folded reserved-name guard as the join family: fail loud
    * when an input frame already carries a column this operator is about
    * to append or overwrite (Spark resolution is case-insensitive by
    * default, so the check folds case too).
    */
  private[graft] def guardNames(cols: Seq[String], names: Seq[String], ctx: String): Unit = {
    val lower = names.map(_.toLowerCase).toSet
    val clash = cols.filter(c => lower.contains(c.toLowerCase)).distinct
    require(clash.isEmpty, s"column name(s) ${clash.mkString(", ")} collide " +
      s"with $ctx's reserved output/working names (${names.mkString("/")}); " +
      "rename them first")
  }

  /** Trailing-window frame of n rows ending at the current row (keyed
    * callers only — keyless trailing windows route through
    * [[windowAggScanKeyless]], never a whole-frame ordered window).
    */
  def frame(keys: Seq[String], n: Int) = {
    require(keys.nonEmpty,
      "keyless trailing windows use windowAggScanKeyless, not a global window")
    Window.partitionBy(keys.map(col): _*)
      .orderBy(col("pos"))
      .rowsBetween(-(n - 1), Window.currentRow)
  }

  /** Generalization of [[affineScanRanged]] to an arbitrary associative
    * monoid over a fixed-width Double state vector: pass 1 folds each
    * chunk, the driver prefix-folds per key, pass 2 replays from the
    * incoming state and emits the running state's components as `outs`
    * columns. Handles every componentwise-associative running aggregate
    * (sum/sumsq/min/max in ONE pass) where the affine form cannot.
    *
    * Keyed calls dispatch to [[monoidScanKeyed]] (hash-partitioned
    * single pass, zero driver state); the ranged two-pass path below is
    * the KEYLESS route only, where its driver collect is one small row
    * per shuffle partition — bounded by the partition count.
    */
  def monoidScanRanged(df: DataFrame, keys: Seq[String], outs: Seq[String],
                       order: Seq[org.apache.spark.sql.Column] = Seq(col("pos")))(
      identity: Array[Double])(inject: Row => Array[Double])(
      op: (Array[Double], Array[Double]) => Array[Double]): DataFrame = {
    guardNames(df.columns.toSeq, outs, "monoidScanRanged")
    if (keys.nonEmpty)
      return monoidScanKeyed(df, keys, outs, order)(identity)(inject)(op)
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val all = keys.map(col) ++ order
    val ranged = df.repartitionByRange(parts, all: _*).sortWithinPartitions(all: _*)
    val keyIdx = keys.map(ranged.schema.fieldIndex)
    val keyOf = graft.series.Series.rowKey(keyIdx) _
    val rdd = ranged.rdd
    val comps: Array[(Int, Seq[Any], Array[Double])] =
      rdd.mapPartitionsWithIndex { (pid, it) =>
        val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Seq[Any], Array[Double])]
        var cur: Seq[Any] = null
        // clone: `op` may mutate its accumulator argument in place (a
        // natural fold optimization); aliasing the shared identity array
        // here would corrupt it for every later key in the partition
        var acc = identity.clone()
        var any = false
        it.foreach { r =>
          val k = keyOf(r)
          if (!any || k != cur) {
            if (any) buf += ((pid, cur, acc))
            cur = k; acc = identity.clone(); any = true
          }
          acc = op(acc, inject(r))
        }
        if (any) buf += ((pid, cur, acc))
        buf.iterator
      }.collect()
    val incoming: Map[(Int, Seq[Any]), Array[Double]] =
      comps.groupBy(_._2).iterator.flatMap { case (k, rows) =>
        var e = identity.clone()
        rows.sortBy(_._1).map { case (pid, _, a) =>
          val entry = (pid, k) -> e
          // clone: `entry` retains e — an in-place-mutating op would
          // otherwise corrupt the already-stored incoming state
          e = op(e.clone(), a)
          entry
        }
      }.toMap
    val bc = spark.sparkContext.broadcast(incoming)
    val outRdd = rdd.mapPartitionsWithIndex { (pid, it) =>
      var cur: Seq[Any] = null
      var e = identity.clone()
      it.map { r =>
        val k = keyOf(r)
        // clone: broadcast values are SHARED across tasks in one executor
        // JVM — mutating them in place would corrupt other partitions' reads
        if (cur == null || k != cur) { cur = k; e = bc.value((pid, k)).clone() }
        e = op(e, inject(r))
        Row.fromSeq(r.toSeq ++ e.toSeq)
      }
    }
    spark.createDataFrame(outRdd,
      StructType(ranged.schema.fields ++
        outs.map(o => StructField(o, DoubleType, nullable = false))))
  }

  /** Keyed running monoid fold: hash-partition on the key columns so each
    * key lives wholly in one partition, sort within partitions by
    * (keys, pos), then one sequential pass with O(1) state per open key.
    * One shuffle, NO driver collect — scales to arbitrarily many keys
    * (per-user state at 100 TB); parallelism is min(#keys, #partitions).
    *
    * Unlike the ranged keyless path, this is a plain left fold — `op`
    * need NOT be associative here (state machines like capacity-reset
    * packing are fine), but then the computation cannot fall back to the
    * chunk-composing keyless route.
    */
  def monoidScanKeyed(df: DataFrame, keys: Seq[String], outs: Seq[String],
                      order: Seq[org.apache.spark.sql.Column] = Seq(col("pos")))(
      identity: Array[Double])(inject: Row => Array[Double])(
      op: (Array[Double], Array[Double]) => Array[Double]): DataFrame = {
    guardNames(df.columns.toSeq, outs, "monoidScanKeyed")
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val all = keys.map(col) ++ order
    val hashed = df.repartition(parts, keys.map(col): _*).sortWithinPartitions(all: _*)
    val keyIdx = keys.map(hashed.schema.fieldIndex)
    val keyOf = graft.series.Series.rowKey(keyIdx) _
    val outRdd = hashed.rdd.mapPartitions { it =>
      var cur: Seq[Any] = null
      // clone at every key reset: `op` may mutate its accumulator argument
      // in place (allowed here — this path is a plain left fold); aliasing
      // the shared identity array would corrupt it for every later key
      var acc = identity.clone()
      it.map { r =>
        val k = keyOf(r)
        if (cur == null || k != cur) { cur = k; acc = identity.clone() }
        acc = op(acc, inject(r))
        Row.fromSeq(r.toSeq ++ acc.toSeq)
      }
    }
    spark.createDataFrame(outRdd,
      StructType(hashed.schema.fields ++
        outs.map(o => StructField(o, DoubleType, nullable = false))))
  }

  /** Keyed linear-recurrence scan — same partitioning strategy as
    * [[monoidScanKeyed]]: each key's rows are contiguous in one sorted
    * partition, so the recurrence runs in a single pass with no
    * cross-chunk composition and no driver-side per-key map.
    */
  def affineScanKeyed(df: DataFrame, keys: Seq[String], out: String,
                      pre: Boolean = false)(
      seed: Row => Double)(coef: Row => (Double, Double)): DataFrame = {
    guardNames(df.columns.toSeq, Seq(out), "affineScanKeyed")
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val all = keys.map(col) :+ col("pos")
    val hashed = df.repartition(parts, keys.map(col): _*).sortWithinPartitions(all: _*)
    val keyIdx = keys.map(hashed.schema.fieldIndex)
    val keyOf = graft.series.Series.rowKey(keyIdx) _
    val outRdd = hashed.rdd.mapPartitions { it =>
      var cur: Seq[Any] = null
      var e = 0.0
      it.map { r =>
        val k = keyOf(r)
        if (cur == null || k != cur) { cur = k; e = seed(r) }
        val before = e
        val (ca, cb) = coef(r)
        e = ca * e + cb
        Row.fromSeq(r.toSeq :+ (if (pre) before else e))
      }
    }
    spark.createDataFrame(outRdd,
      StructType(hashed.schema.fields :+ StructField(out, DoubleType, nullable = false)))
  }

  /** cs_window_sum/avg/min/max/var/dev (func.c:1632-1761).
    *
    * Warm-up semantics: sum/min/max over the partial first N-1 frames match
    * the reference exactly. For avg/var/dev the reference divides by the
    * FIXED interval N even during warm-up (func.c:1674-1690 uses
    * ctx->interval, not the element count), so `w_avg`/`w_var`/`w_dev` here
    * (SQL semantics — divide by actual count) deliberately diverge on the
    * first N-1 rows; `w_avg_ref`/`w_var_ref`/`w_dev_ref` reproduce the
    * reference's fixed-N divisor: avg = Σx/N, var = (Σx² − (Σx)²/N)/N
    * (the naive one-pass formula, func.c:1745-1761).
    */
  def windowAgg(df: DataFrame, keys: Seq[String], value: String, n: Int): DataFrame = {
    // validate ONCE for both paths: the keyed frame would throw an
    // AnalysisException but the keyless scan would silently emit all-NULL
    require(n >= 1, s"window length must be >= 1, got $n")
    guardNames(df.columns.toSeq,
      Seq("w_sum", "w_avg", "w_min", "w_max", "w_var", "w_dev",
        "w_avg_ref", "w_var_ref", "w_dev_ref"), "windowAgg")
    if (keys.isEmpty) return windowAggScanKeyless(df, value, n)
    val w = frame(keys, n)
    val v = col(value)
    val refVar = (sum(v * v).over(w) - sum(v).over(w) * sum(v).over(w) / n) / n
    df.withColumn("w_sum", sum(v).over(w))
      .withColumn("w_avg", avg(v).over(w))
      .withColumn("w_min", min(v).over(w))
      .withColumn("w_max", max(v).over(w))
      .withColumn("w_var", var_pop(v).over(w))
      // sqrt of the var column, not a second windowed Welford buffer
      .withColumn("w_dev", sqrt(col("w_var")))
      .withColumn("w_avg_ref", sum(v).over(w) / n)
      .withColumn("w_var_ref", refVar)
      .withColumn("w_dev_ref", sqrt(greatest(refVar, lit(0.0))))
  }

  /** Keyless trailing window WITHOUT a whole-frame ordered window (which
    * would be one task): range-partition by pos, collect each partition's
    * LAST n−1 (pos, value) rows to the driver (bounded: ≤ (n−1)·parts
    * rows), then stream every partition with its carry-in — the previous
    * partitions' tail rows seed the sliding window, so output row i sees
    * exactly rows (i−n+1..i) even across partition boundaries. One
    * shuffle, parallelism = partition count. Emits the same columns as
    * the keyed [[windowAgg]] (SQL semantics for w_avg/w_var/w_dev: divide
    * by the ACTUAL warm-up count; *_ref variants use the reference's
    * fixed-N divisor, func.c:1674-1761).
    */
  def windowAggScanKeyless(df: DataFrame, value: String, n: Int): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(parts, col("pos"))
      .sortWithinPartitions(col("pos"))
    val vIdx = ranged.schema.fieldIndex(value)
    val rdd = ranged.rdd // captured once; both jobs share the shuffle
    // NULL values ride along as nulls (boxed) so the frame still counts
    // them as ROWS but every aggregate skips them — the same semantics as
    // the keyed path's SQL aggregates over a rowsBetween frame. An
    // all-null frame yields NULL aggregates, hence nullable output columns.
    def boxed(r: Row): java.lang.Double =
      if (r.isNullAt(vIdx)) null
      else java.lang.Double.valueOf(r.getAs[Number](vIdx).doubleValue())
    val tails: Map[Int, Array[java.lang.Double]] =
      rdd.mapPartitionsWithIndex { (pid, it) =>
        val ring = new scala.collection.mutable.ArrayDeque[java.lang.Double]()
        it.foreach { r =>
          ring.append(boxed(r))
          if (ring.size > n - 1) ring.removeHead()
        }
        Iterator.single(pid -> ring.toArray)
      }.collect().toMap
    // carry-in for pid = last n−1 values BEFORE it, chaining backwards
    // across partitions that hold fewer than n−1 rows
    val carry: Map[Int, Array[java.lang.Double]] = (0 until parts).map { pid =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[java.lang.Double]
      var p = pid - 1
      while (buf.size < n - 1 && p >= 0) {
        val t = tails.getOrElse(p, Array.empty[java.lang.Double])
        buf.prependAll(t.takeRight(n - 1 - buf.size))
        p -= 1
      }
      pid -> buf.toArray
    }.toMap
    val bc = spark.sparkContext.broadcast(carry)
    val outRdd = rdd.mapPartitionsWithIndex { (pid, it) =>
      val win = scala.collection.mutable.ArrayDeque.empty[java.lang.Double]
      bc.value(pid).foreach(win.append)
      it.map { r =>
        win.append(boxed(r))
        if (win.size > n) win.removeHead()
        var c = 0
        var s = 0.0; var ss = 0.0
        var mn = Double.PositiveInfinity; var mx = Double.NegativeInfinity
        var anyNaN = false
        win.foreach { v =>
          if (v != null) {
            val x = v.doubleValue()
            c += 1; s += x; ss += x * x
            // Spark's total order puts NaN ABOVE every value, so min over
            // a frame containing NaN is the true minimum (math.min would
            // propagate NaN and diverge from the keyed SQL path) and max
            // is NaN; sum/avg/var propagate NaN on both paths already
            if (x.isNaN) anyNaN = true
            else { mn = math.min(mn, x); mx = math.max(mx, x) }
          }
        }
        val outs: Seq[Any] =
          // all-NULL frame: every aggregate is NULL except w_dev_ref —
          // the keyed path computes sqrt(greatest(refVar, 0.0)) and
          // greatest SKIPS nulls, so a NULL refVar yields 0.0 there; the
          // scan must agree (fuzz finding, seeds 8026/8059)
          if (c == 0) Seq(null, null, null, null, null, null, null, null, 0.0)
          else {
            val mnOut = if (anyNaN && mn == Double.PositiveInfinity) Double.NaN else mn
            val mxOut = if (anyNaN) Double.NaN else mx
            val vr = math.max((ss - s * s / c) / c, 0.0)
            val refVar = (ss - s * s / n) / n
            Seq(s, s / c, mnOut, mxOut, vr, math.sqrt(vr),
              s / n, refVar, math.sqrt(math.max(refVar, 0.0)))
          }
        Row.fromSeq(r.toSeq ++ outs)
      }
    }
    spark.createDataFrame(outRdd,
      StructType(ranged.schema.fields ++ Seq(
        "w_sum", "w_avg", "w_min", "w_max", "w_var", "w_dev",
        "w_avg_ref", "w_var_ref", "w_dev_ref")
        .map(c => StructField(c, DoubleType, nullable = true))))
  }

  /** Parallel linear-recurrence scan: evaluates E_i = a_i·E_{i-1} + b_i per
    * key in pos order, where `coef` maps each row to (a_i, b_i). Initial
    * conditions are encoded in the pos==0 coefficient (a=0 collapses any
    * seed), so no per-key seeding is needed.
    *
    * Affine maps COMPOSE — (a2,b2)∘(a1,b1) = (a2·a1, a2·b1 + b2) — so the
    * recurrence parallelizes as a two-pass chunked scan (the classic
    * parallel-prefix shape): range-partition by (keys, pos), pass 1
    * composes each chunk's map (one small row per (partition, key)
    * collected to the driver, which prefix-composes per key), pass 2
    * re-runs the recurrence per chunk from the incoming state. Parallelism
    * is the partition count — NOT the key count — which is what makes
    * recursive indicators (EMA/ATR/cumprod) survive a series with few or
    * no keys at 100 TB, where a key-partitioned scan would serialize.
    * Both passes share one captured shuffle (see Series.attachPosRanged
    * for why re-deriving the DataFrame would corrupt the chunking).
    *
    * The two-pass shape collects one (chunk, key) row per key PRESENT IN
    * EACH CHUNK to the driver — fine for keyless/few-key series, a
    * driver OOM for per-user keys at scale. Keyed calls therefore
    * dispatch to [[affineScanKeyed]], which needs no driver state.
    */
  /** With `pre = true` the emitted column is the state BEFORE applying the
    * current row — the gap-safe form of `lag`/"carry up to the previous
    * row" (no pos-arithmetic join, so non-dense pos from slicing/filtering
    * cannot skew it). The first row of a key emits the seed.
    */
  def affineScanRanged(df: DataFrame, keys: Seq[String], out: String,
                       pre: Boolean = false, ordCol: String = "pos")(
      seed: Row => Double)(coef: Row => (Double, Double)): DataFrame = {
    // the keyed dispatch scans in pos order; a caller with a different
    // ordinal must stay on the keyless path (no current caller mixes
    // keys with a non-pos ordinal — fail loudly rather than scan in the
    // wrong order)
    if (keys.nonEmpty) {
      require(ordCol == "pos",
        s"affineScanRanged: keyed scans order by 'pos'; got ordCol='$ordCol'")
      return affineScanKeyed(df, keys, out, pre)(seed)(coef)
    }
    guardNames(df.columns.toSeq, Seq(out), "affineScanRanged")
    val spark = df.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val all = keys.map(col) :+ col(ordCol)
    val ranged = df.repartitionByRange(parts, all: _*).sortWithinPartitions(all: _*)
    val keyIdx = keys.map(ranged.schema.fieldIndex)
    val keyOf = graft.series.Series.rowKey(keyIdx) _
    val rdd = ranged.rdd
    // Pass 1: per (partition, key) composed map (A, B) + the chunk's seed
    // (the key's overall seed is its first chunk's).
    val comps: Array[(Int, Seq[Any], Double, Double, Double)] =
      rdd.mapPartitionsWithIndex { (pid, it) =>
        val buf =
          scala.collection.mutable.ArrayBuffer.empty[(Int, Seq[Any], Double, Double, Double)]
        var cur: Seq[Any] = null
        var a = 1.0; var b = 0.0; var s = 0.0; var any = false
        it.foreach { r =>
          val k = keyOf(r)
          if (!any || k != cur) {
            if (any) buf += ((pid, cur, a, b, s))
            cur = k; a = 1.0; b = 0.0; s = seed(r); any = true
          }
          val (ca, cb) = coef(r)
          a = ca * a; b = ca * b + cb
        }
        if (any) buf += ((pid, cur, a, b, s))
        buf.iterator
      }.collect()
    // Driver: prefix-compose per key in partition order → incoming state.
    val incoming: Map[(Int, Seq[Any]), Double] =
      comps.groupBy(_._2).iterator.flatMap { case (k, rows) =>
        val ordered = rows.sortBy(_._1)
        var e = ordered.head._5 // the key's seed
        ordered.map { case (pid, _, a, b, _) =>
          val entry = (pid, k) -> e
          e = a * e + b
          entry
        }
      }.toMap
    val bc = spark.sparkContext.broadcast(incoming)
    // Pass 2: replay the recurrence per chunk from the incoming state.
    val outRdd = rdd.mapPartitionsWithIndex { (pid, it) =>
      var cur: Seq[Any] = null
      var e = 0.0
      it.map { r =>
        val k = keyOf(r)
        if (cur == null || k != cur) { cur = k; e = bc.value((pid, k)) }
        val before = e
        val (ca, cb) = coef(r)
        e = ca * e + cb
        Row.fromSeq(r.toSeq :+ (if (pre) before else e))
      }
    }
    spark.createDataFrame(outRdd,
      StructType(ranged.schema.fields :+ StructField(out, DoubleType, nullable = false)))
  }

  /** Exponential moving average — cs_window_ema (func.c:1764-1777):
    * p = 2/(N+1); EMA[0]=x[0]; EMA[i] = x[i]*p + EMA[i-1]*(1-p).
    * Seeding the scan with the key's first value makes the uniform
    * recurrence exact at row 0: p·x0 + (1−p)·x0 = x0.
    */
  def ema(df: DataFrame, keys: Seq[String], value: String, n: Int, out: String = "ema"): DataFrame = {
    require(n >= 1, s"EMA period must be >= 1, got $n")
    val p = 2.0 / (n + 1)
    val vIdx = df.schema.fieldIndex(value)
    affineScanRanged(df, keys, out)(
      seed = r => numAt(r, vIdx, "ema")) { r =>
      (1 - p, p * numAt(r, vIdx, "ema"))
    }
  }

  /** Wilder-smoothed average true range — cs_window_atr (func.c:1779-1788):
    * ATR[i] = (ATR[i-1]*(m-1) + TR[i]) / m with m = min(i+1, N). The
    * warm-up index i is the row's ORDINAL within its key's series — the
    * reference operates on the slice it is handed, with indices relative
    * to that slice — so a thinned/sliced series with non-dense or offset
    * pos still warms up over the rows actually present (the same
    * actual-row-count rule cumAgg follows). Row 0 has a = 0, so the seed
    * is irrelevant.
    */
  def atr(df: DataFrame, keys: Seq[String], value: String, n: Int, out: String = "atr"): DataFrame = {
    require(n >= 1, s"ATR period must be >= 1, got $n")
    guardNames(df.columns.toSeq, Seq("__aord"), "atr")
    val withOrd =
      if (keys.isEmpty)
        graft.series.Series.attachPosRanged(df, Seq(), Seq(col("pos")), out = "__aord")
      else {
        val w = Window.partitionBy(keys.map(col): _*).orderBy(col("pos"))
        df.withColumn("__aord", row_number().over(w).cast("long") - 1L)
      }
    val vIdx = withOrd.schema.fieldIndex(value)
    val oIdx = withOrd.schema.fieldIndex("__aord")
    affineScanRanged(withOrd, keys, out)(
      seed = r => numAt(r, vIdx, "atr")) { r =>
      val m = math.min(r.getLong(oIdx) + 1, n.toLong).toDouble
      ((m - 1) / m, numAt(r, vIdx, "atr") / m)
    }.drop("__aord")
  }

  /** Cumulative product — cs_cum_prd (func.c:1824-1887). Recursive like
    * EMA (sign/zero handling rules out exp∘sum∘log in general); the affine
    * form is E = x·E_prev with seed 1.
    */
  def cumProd(df: DataFrame, keys: Seq[String], value: String, out: String = "cum_prd"): DataFrame = {
    val vIdx = df.schema.fieldIndex(value)
    affineScanRanged(df, keys, out)(seed = _ => 1.0) { r =>
      (numAt(r, vIdx, "cumProd"), 0.0)
    }
  }

  /** Relative Strength Index — the reference's example workload builds RSI
    * from cs_* primitives (example.sql RSI query): split the delta into
    * gains/losses, Wilder-smooth both (the ATR recurrence), then
    * RSI = 100 − 100/(1 + U/D). Pure composition of diff + two affine
    * scans. The D = 0 cases mirror the reference's bare IEEE arithmetic
    * (it has no special case): an all-gain window reads 100
    * (U/0 = +Inf → 100 − 0), while a FLAT window (U = D = 0) is NaN
    * (0/0) — Spark's SQL division returns NULL at 0, so both branches
    * are spelled out instead of relying on `/`.
    */
  def rsi(df: DataFrame, keys: Seq[String], value: String, n: Int,
          out: String = "rsi"): DataFrame = {
    require(n >= 1, s"RSI period must be >= 1, got $n")
    guardNames(df.columns.toSeq,
      Seq("__d", "__up", "__dn", "__su", "__sd", out), "rsi")
    val withUd = graft.analytics.Analytics.diff(df, keys, value, "__d")
      .withColumn("__up", greatest(col("__d"), lit(0.0)))
      .withColumn("__dn", greatest(-col("__d"), lit(0.0)))
    val smoothed = atr(atr(withUd, keys, "__up", n, "__su"), keys, "__dn", n, "__sd")
    smoothed
      .withColumn(out,
        when(col("__sd") === 0.0 && col("__su") > 0.0, lit(100.0))
          .when(col("__sd") === 0.0, lit(Double.NaN))
          .otherwise(lit(100.0) - lit(100.0) / (lit(1.0) + col("__su") / col("__sd"))))
      .drop("__d", "__up", "__dn", "__su", "__sd")
  }

  /** Rank with gaps / dense rank over the whole series — cs_rank /
    * cs_dense_rank (func.c:3495-3561). Keyed: one window per key. Keyless:
    * a global ordered window would be one task, so ranks derive from the
    * ranged sort permutation — sort_pos via attachPosRanged, dense rank =
    * the run index of the value in sort order (scan-based run id), rank =
    * 1 + the run's first sort_pos (a groupBy(run) + join, parallel).
    */
  def rank(df: DataFrame, keys: Seq[String], value: String): DataFrame =
    if (keys.isEmpty) {
      guardNames(df.columns.toSeq,
        Seq("__origpos", "__start", "__rfirst", "run_id", "rnk", "dense_rnk"),
        "rank")
      val sorted = graft.series.Series.attachPosRanged(
        df.withColumnRenamed("pos", "__origpos"), Seq(),
        Seq(col(value), col("__origpos")), out = "pos")
      // the fresh sort_pos IS a dense 0-based ordinal, so attachRunId can
      // skip its internal renumbering pass; its run-start flag is exactly
      // rank's reset condition, so no predecessor self-join either.
      // A groupBy(run_id)+join would shuffle every row onto as many
      // reducers as there are runs — badly skewed when the series has few
      // distinct values.
      val withRun = graft.agg.Aggs.attachRunId(sorted, Seq(), value,
        ordCol = Some("pos"), chgOut = Some("__start"))
      val sIdx = withRun.schema.fieldIndex("__start")
      val pIdx2 = withRun.schema.fieldIndex("pos")
      // rank = 1 + the run's first sort_pos, carried forward by a scan
      // that resets at run starts
      affineScanRanged(withRun, Seq(), "__rfirst")(
        seed = r => r.getAs[Number](pIdx2).doubleValue()) { r =>
        if (r.getDouble(sIdx) == 1.0) (0.0, r.getAs[Number](pIdx2).doubleValue())
        else (1.0, 0.0)
      }
        .withColumn("rnk", col("__rfirst").cast("long") + 1L)
        .withColumn("dense_rnk", col("run_id")) // runs are value-ordered, 1-based
        .drop("__rfirst", "__start", "pos", "run_id")
        .withColumnRenamed("__origpos", "pos")
    } else {
      val w = Window.partitionBy(keys.map(col): _*).orderBy(col(value))
      df.withColumn("rnk", org.apache.spark.sql.functions.rank().over(w).cast("long"))
        .withColumn("dense_rnk", dense_rank().over(w).cast("long"))
    }
}
