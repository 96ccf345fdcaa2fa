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

  /** Trailing-window frame of n rows ending at the current row. */
  def frame(keys: Seq[String], n: Int) =
    (if (keys.isEmpty) Window.partitionBy() else Window.partitionBy(keys.map(col): _*))
      .orderBy(col("pos"))
      .rowsBetween(-(n - 1), Window.currentRow)

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
    val w = frame(keys, n)
    val v = col(value)
    val refVar = (sum(v * v).over(w) - sum(v).over(w) * sum(v).over(w) / n) / n
    df.withColumn("w_sum", sum(v).over(w))
      .withColumn("w_avg", avg(v).over(w))
      .withColumn("w_min", min(v).over(w))
      .withColumn("w_max", max(v).over(w))
      .withColumn("w_var", var_pop(v).over(w))
      .withColumn("w_dev", stddev_pop(v).over(w))
      .withColumn("w_avg_ref", sum(v).over(w) / n)
      .withColumn("w_var_ref", refVar)
      .withColumn("w_dev_ref", sqrt(greatest(refVar, lit(0.0))))
  }

  /** Run `f` over each key's rows in pos order, producing one double per
    * row, appended as column `out`. One shuffle (repartition by key) +
    * in-partition sort; state is per-key and O(1). Rows for one key are
    * guaranteed contiguous and ordered inside each partition.
    */
  def perKeyScan(df: DataFrame, keys: Seq[String], out: String)(
      mkState: () => (Row => Double)): DataFrame = {
    val sortCols = keys.map(col) :+ col("pos")
    val prepared =
      if (keys.isEmpty) df.repartition(1).sortWithinPartitions(col("pos"))
      else df.repartition(keys.map(col): _*).sortWithinPartitions(sortCols: _*)
    val outSchema = StructType(prepared.schema.fields :+ StructField(out, DoubleType))
    val enc = Encoders.row(outSchema)
    val keyIdx = keys.map(prepared.schema.fieldIndex)
    prepared.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var step: Row => Double = null
      it.map { r =>
        val k = keyIdx.map(r.get)
        if (curKey == null || k != curKey) { curKey = k; step = mkState() }
        Row.fromSeq(r.toSeq :+ step(r))
      }
    }(enc)
  }

  /** Exponential moving average — cs_window_ema (func.c:1764-1777):
    * p = 2/(N+1); EMA[0]=x[0]; EMA[i] = x[i]*p + EMA[i-1]*(1-p).
    */
  def ema(df: DataFrame, keys: Seq[String], value: String, n: Int, out: String = "ema"): DataFrame = {
    val p = 2.0 / (n + 1)
    val vIdx = df.schema.fieldIndex(value)
    perKeyScan(df, keys, out) { () =>
      var prev = Double.NaN
      (r: Row) => {
        val x = r.getAs[Number](vIdx).doubleValue()
        prev = if (prev.isNaN) x else x * p + prev * (1 - p)
        prev
      }
    }
  }

  /** Wilder-smoothed average true range — cs_window_atr (func.c:1779-1788):
    * ATR[i] = (ATR[i-1]*(n-1) + TR[i]) / n with n = min(i+1, N).
    */
  def atr(df: DataFrame, keys: Seq[String], value: String, n: Int, out: String = "atr"): DataFrame = {
    val vIdx = df.schema.fieldIndex(value)
    perKeyScan(df, keys, out) { () =>
      var prev = 0.0
      var i = -1L
      (r: Row) => {
        val x = r.getAs[Number](vIdx).doubleValue()
        i += 1
        val m = math.min(i + 1, n.toLong).toDouble
        prev = (prev * (m - 1) + x) / m
        prev
      }
    }
  }

  /** Cumulative product — cs_cum_prd (func.c:1824-1887). Recursive like
    * EMA (sign/zero handling rules out exp∘sum∘log in general).
    */
  def cumProd(df: DataFrame, keys: Seq[String], value: String, out: String = "cum_prd"): DataFrame = {
    val vIdx = df.schema.fieldIndex(value)
    perKeyScan(df, keys, out) { () =>
      var acc = 1.0
      (r: Row) => { acc *= r.getAs[Number](vIdx).doubleValue(); acc }
    }
  }

  /** Rank with gaps / dense rank over the whole series — cs_rank /
    * cs_dense_rank (func.c:3495-3561).
    */
  def rank(df: DataFrame, keys: Seq[String], value: String): DataFrame = {
    val w =
      (if (keys.isEmpty) Window.partitionBy() else Window.partitionBy(keys.map(col): _*))
        .orderBy(col(value))
    df.withColumn("rnk", org.apache.spark.sql.functions.rank().over(w).cast("long"))
      .withColumn("dense_rnk", dense_rank().over(w).cast("long"))
  }
}
