package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}

/** Aggregate operators mirroring the reference's grand / hash / group /
  * grid / cumulative aggregate families (SURVEY.md §2.4).
  *
  * Grand and hash aggregates map to Spark's partial→final HashAggregate,
  * which is exactly the reference's prepare/merge parallel scheme
  * (imcs.c:1886-2035) generalized to a cluster: map-side partial aggregation,
  * one shuffle on the group keys, final merge. Nothing custom is needed for
  * count/min/max/sum/avg/var/corr — they are codegen'd built-ins.
  */
object Aggs {

  /** Product aggregate — cs_prd (func.c:1423-1473). No Spark built-in.
    * Implemented as a typed Aggregator (associative, partial-merge friendly,
    * so it parallelizes exactly like sum). Zero handling: any zero factor
    * short-circuits the product to 0; signs multiply through. NULL inputs
    * are skipped and an empty/all-null input yields NULL — standard SQL
    * aggregate semantics, matching the codegen'd [[CsProdAgg]] SQL form
    * (a primitive-Double input encoder would crash decoding a NULL).
    */
  val product: Aggregator[java.lang.Double, (Double, Boolean), java.lang.Double] =
    new Aggregator[java.lang.Double, (Double, Boolean), java.lang.Double] {
      def zero: (Double, Boolean) = (1.0, false)
      def reduce(b: (Double, Boolean), a: java.lang.Double): (Double, Boolean) =
        if (a == null) b else (b._1 * a.doubleValue(), true)
      def merge(b1: (Double, Boolean), b2: (Double, Boolean)): (Double, Boolean) =
        (b1._1 * b2._1, b1._2 || b2._2)
      def finish(r: (Double, Boolean)): java.lang.Double =
        if (r._2) java.lang.Double.valueOf(r._1) else null
      def bufferEncoder: Encoder[(Double, Boolean)] =
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaBoolean)
      def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
    }

  /** Product as a Column over a DoubleType column. */
  def prd(c: String): Column =
    udaf(product, Encoders.DOUBLE).apply(col(c).cast("double"))

  /** Weighted sum Σxy — cs_wsum (func.c:1502-1575). */
  def wsum(x: Column, y: Column): Column = sum(x * y)

  /** Weighted average Σxy/Σx — cs_wavg (func.c:1502-1575); this is VWAP
    * when x=volume, y=price (user_guide.html "Performance comparison").
    * A row whose VALUE is NULL contributes to neither side: its product is
    * skipped by `sum`, and its weight must not deflate the denominator.
    */
  def wavg(x: Column, y: Column): Column =
    sum(x * y) / sum(when(y.isNotNull, x))

  /** Population variance with the reference's naive Σx² formula
    * (func.c:1475-1491): (Σx² − (Σx)²/n)/n. Spark's var_pop uses Welford;
    * values agree to float tolerance on sane data — tests pin var_pop.
    */
  def varNaive(x: Column): Column =
    (sum(x * x) - sum(x) * sum(x) / count(x)) / count(x)

  /** Bitwise AND / OR reductions — cs_all / cs_any (func.c:1446-1456). */
  def all(c: Column): Column = bit_and(c)
  def any(c: Column): Column = bit_or(c)

  /** HyperLogLog approximate distinct — cs_approxdc (func.c:4802-4973).
    * Spark's approx_count_distinct is the same HLL++ family, mergeable
    * map-side. rsd 0.05 ~ the reference's 2^7-register accuracy.
    */
  def approxdc(c: Column): Column = approx_count_distinct(c)

  /** Mergeable distinct-count sketch rollup — the 100 TB pre-aggregation
    * pattern the reference's single-node HLL (func.c:4975-5074) cannot
    * express: build one Datasketches HLL per (bucketKeys) partition of the
    * data ONCE (`hll_sketch_agg` → binary column, storable as a parquet
    * rollup table), then answer any coarser distinct-count query by
    * UNIONING sketches (`hll_union_agg`) instead of rescanning raw rows.
    * Returns the bucket sketch frame; [[sketchEstimate]] finalizes a
    * (re-grouped) union to counts.
    */
  def sketchRollup(df: DataFrame, bucketKeys: Seq[String], value: String,
                   lgK: Int = 12): DataFrame =
    df.groupBy(bucketKeys.map(col): _*)
      .agg(hll_sketch_agg(col(value), lit(lgK)).as("dc_sketch"))

  /** Union pre-built bucket sketches up to `groupKeys` and estimate. */
  def sketchEstimate(sketches: DataFrame, groupKeys: Seq[String]): DataFrame = {
    val merged =
      if (groupKeys.isEmpty) sketches.agg(hll_union_agg(col("dc_sketch")).as("__u"))
      else sketches.groupBy(groupKeys.map(col): _*)
        .agg(hll_union_agg(col("dc_sketch")).as("__u"))
    merged.withColumn("approx_dc", hll_sketch_estimate(col("__u"))).drop("__u")
  }

  /** Mergeable QUANTILE sketch rollup — the percentile twin of
    * [[sketchRollup]]: one Datasketches KLL sketch per (bucketKeys) group,
    * built ONCE from the raw rows (`kll_sketch_agg_double` → binary
    * column, storable as a parquet rollup table), then any coarser
    * percentile query MERGES sketches (`kll_merge_agg_double`) instead of
    * rescanning — a 100 TB latency dashboard served from a KB-scale
    * sketch table. Default k=200 gives ~1.7% rank error (one-sided
    * 99% confidence), far inside the gate's 5% contract.
    */
  def quantileRollup(df: DataFrame, bucketKeys: Seq[String],
                     value: String): DataFrame =
    // call_function, not expr-string splicing: a column name containing a
    // backtick must resolve, not parse
    df.groupBy(bucketKeys.map(col): _*)
      .agg(call_function("kll_sketch_agg_double", col(value)).as("q_sketch"))

  /** Merge pre-built bucket quantile sketches up to `groupKeys` and read
    * the `q` quantile.
    */
  def quantileEstimate(sketches: DataFrame, groupKeys: Seq[String],
                       q: Double): DataFrame = {
    val merged =
      if (groupKeys.isEmpty)
        sketches.agg(expr("kll_merge_agg_double(q_sketch)").as("__m"))
      else sketches.groupBy(groupKeys.map(col): _*)
        .agg(expr("kll_merge_agg_double(q_sketch)").as("__m"))
    merged
      .withColumn("approx_q",
        call_function("kll_sketch_get_quantile_double", col("__m"), lit(q)))
      .drop("__m")
  }

  /** Theta sketch rollup — the set-ALGEBRA sketch the HLL rollup cannot
    * be: per-bucket theta sketches support INTERSECTION and DIFFERENCE
    * estimates, not just union — "users who did BOTH X and Y", "users in
    * A but not B" — answered from the same KB-scale rollup table without
    * rescanning raw rows. (Inclusion-exclusion over HLL estimates
    * explodes the error; theta intersects the retained hash sample
    * directly.) Exact below 2^lgK retained values, ~1.6% relative error
    * past it at Spark's default; intersections compound both inputs'
    * error, so gates use a bounded-error contract.
    */
  def thetaRollup(df: DataFrame, bucketKeys: Seq[String], value: String): DataFrame =
    df.groupBy(bucketKeys.map(col): _*)
      .agg(call_function("theta_sketch_agg", col(value)).as("t_sketch"))

  /** |buckets(a) ∩ buckets(b)| estimate from a theta rollup: union each
    * side's buckets, intersect the two results. `sideCol` picks the side
    * per bucket row; rows matching neither value are ignored.
    */
  def thetaOverlap(sketches: DataFrame, sideCol: String,
                   a: String, b: String): DataFrame =
    sketches
      // side gating via the Column API, not string splicing — a side
      // value containing a quote must select, not parse
      .withColumn("__sa", when(col(sideCol) === a, col("t_sketch")))
      .withColumn("__sb", when(col(sideCol) === b, col("t_sketch")))
      .agg(
        expr("theta_union_agg(__sa)").as("__a"),
        expr("theta_union_agg(__sb)").as("__b"))
      // an EMPTY side unions to a NULL sketch, which would propagate NULL
      // through every estimate; the correct empty-set counts are 0 (and
      // n_a when b is the empty side of the difference)
      .select(
        coalesce(expr("theta_sketch_estimate(__a)"), lit(0L)).as("n_a"),
        coalesce(expr("theta_sketch_estimate(__b)"), lit(0L)).as("n_b"),
        when(col("__a").isNull || col("__b").isNull, lit(0L))
          .otherwise(expr("theta_sketch_estimate(theta_intersection(__a, __b))"))
          .as("n_both"),
        when(col("__a").isNull, lit(0L))
          .when(col("__b").isNull, expr("theta_sketch_estimate(__a)"))
          .otherwise(expr("theta_sketch_estimate(theta_difference(__a, __b))"))
          .as("n_a_only"))

  /** Per-group distinct-with-threshold count — cs_hash_dup_count
    * (func.c:5750-6215): for each group, how many distinct values occur at
    * least minOcc times. Two-level aggregation = two shuffles, but the first
    * groupBy(key, value) does map-side partial counting so the shuffle
    * carries only distinct (key, value) pairs.
    */
  def hashDupCount(df: DataFrame, value: String, groupBy: Seq[String], minOcc: Long): DataFrame =
    df.groupBy((groupBy :+ value).map(col): _*)
      .agg(count(lit(1)).as("__occ"))
      .filter(col("__occ") >= minOcc)
      .groupBy(groupBy.map(col): _*)
      .agg(count(lit(1)).as("dup_count"))

  // --------------------------------------------------------------------
  // Run-based ("ordered group") aggregates — cs_group_* (func.c:1898-2092).
  // The reference groups by *runs* of equal adjacent group values, not by
  // hash. We materialize a run id: increment whenever the key changes
  // between consecutive positions, then groupBy(run_id).
  // --------------------------------------------------------------------

  /** Attach `run_id` — consecutive-equal runs of `groupVal` within each key
    * partition ordered by pos. Keyed: one window pass (single shuffle by
    * key, parallel across keys). Keyless: the whole-frame ordered window
    * would be one task, so the run id decomposes into its two scalable
    * halves — the change flag via a pos-equi self-join (parallel lag) and
    * the cumulative count via the affine parallel-prefix scan
    * (run_id = Σ flags is E = E_prev + flag, i.e. a=1).
    */
  def attachRunId(df: DataFrame, keys: Seq[String], groupVal: String): DataFrame =
    attachRunId(df, keys, groupVal, ordCol = None, chgOut = None)

  /** [[attachRunId]] with two composition hooks for callers that already
    * hold the pieces: `ordCol` names a column KNOWN to be a dense 0-based
    * ordinal in scan order (skips the internal renumbering pass);
    * `chgOut` keeps the run-start flag (1.0 at each run's first row)
    * under that name instead of dropping it — keyless rank needs exactly
    * this flag and used to recompute it with a second self-join.
    *
    * Consecutive NULL group values form ONE run (null-safe equality,
    * matching SQL rank()'s treatment of NULL ties on the keyed path); a
    * run starts at the first row or where the value IS DISTINCT FROM its
    * predecessor.
    */
  def attachRunId(df: DataFrame, keys: Seq[String], groupVal: String,
                  ordCol: Option[String], chgOut: Option[String]): DataFrame = {
    graft.window.Moving.guardNames(df.columns.toSeq,
      Seq("run_id", "__chg", "__prev", "__run_d") ++ chgOut ++
        (if (ordCol.isEmpty) Seq("__ord") else Nil), "attachRunId")
    if (keys.isEmpty) {
      // ordinal renumbering (gap-safe for non-dense pos) feeds the
      // predecessor join; the cumulative change-count is the affine scan
      val (ord, ordName) = ordCol match {
        case Some(c) => (df, c)
        case None => (graft.series.Series.attachPosRanged(
          df, Seq(), Seq(col("pos")), out = "__ord"), "__ord")
      }
      val prev = ord.select((col(ordName) + 1L).as(ordName), col(groupVal).as("__prev"))
      // first row: the predecessor JOIN MISS is indistinguishable from a
      // real NULL predecessor value, so detect it by ordinal instead
      val flagged = ord.join(prev, Seq(ordName), "left")
        .withColumn("__chg",
          when(col(ordName) === 0L || !(col("__prev") <=> col(groupVal)), 1.0)
            .otherwise(0.0))
      val cIdx = flagged.schema.fieldIndex("__chg")
      // the cumulative pass must scan in the SAME order the __chg flags
      // were computed in — ordName, not the default pos (the sole current
      // caller passes ordCol="pos", but a future caller whose ordinal
      // disagrees with pos order would silently get wrong run_ids)
      val withRun = graft.window.Moving.affineScanRanged(
        flagged, Seq(), "__run_d", ordCol = ordName)(
        seed = _ => 0.0) { r => (1.0, r.getDouble(cIdx)) }
        .withColumn("run_id", col("__run_d").cast("long"))
        .drop("__prev", "__run_d")
      val dropped = if (ordCol.isEmpty) withRun.drop("__ord") else withRun
      chgOut match {
        case Some(c) => dropped.withColumnRenamed("__chg", c)
        case None    => dropped.drop("__chg")
      }
    } else {
      val w = Window.partitionBy(keys.map(col): _*).orderBy(col("pos"))
      // the flag is DoubleType 1.0/0.0 on both paths so a chgOut consumer
      // keeps working when the caller adds or removes keys
      val withRun = df.withColumn(
        "__chg",
        when(row_number().over(w) === 1 ||
          !(lag(col(groupVal), 1).over(w) <=> col(groupVal)), 1.0).otherwise(0.0))
        .withColumn("run_id", sum(col("__chg")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
      chgOut match {
        case Some(c) => withRun.withColumnRenamed("__chg", c)
        case None    => withRun.drop("__chg")
      }
    }
  }

  /** Run-group aggregate — cs_group_count/max/min/sum/avg/var/dev/first/
    * last/any/all/approxdc (func.c:1985-2092, group_approxdc
    * func.c:4975-5074). Emits one row per run with the group value and the
    * aggregates of `value`; `intVal` feeds the bitwise any/all reductions
    * and the per-run distinct estimate (both int-typed in the reference).
    */
  def groupAgg(df: DataFrame, keys: Seq[String], groupVal: String, value: String,
               intVal: Option[String] = None): DataFrame = {
    graft.window.Moving.guardNames(df.columns.toSeq,
      Seq("group_val", "grp_count", "grp_sum", "grp_min", "grp_max", "grp_var",
        "grp_first", "grp_last", "grp_avg", "grp_dev", "__nv"), "groupAgg")
    val withRun = attachRunId(df, keys, groupVal)
    val grp = (keys :+ "run_id").map(col)
    // avg/dev derived in the projection — see gridAgg's note
    val base = Seq(
      first(col(groupVal)).as("group_val"),
      count(lit(1)).as("grp_count"),
      count(col(value)).as("__nv"),
      sum(col(value)).as("grp_sum"),
      min(col(value)).as("grp_min"),
      max(col(value)).as("grp_max"),
      var_pop(col(value)).as("grp_var"),
      min_by(col(value), col("pos")).as("grp_first"),
      max_by(col(value), col("pos")).as("grp_last"))
    val bitAggs = intVal.toSeq.flatMap { iv =>
      Seq(
        bit_and(col(iv)).as("grp_all"),
        bit_or(col(iv)).as("grp_any"),
        count_distinct(col(iv)).as("grp_exact_dc"),
        approx_count_distinct(col(iv)).as("grp_adc"))
    }
    withRun.groupBy(grp: _*).agg(base.head, (base.tail ++ bitAggs): _*)
      .withColumn("grp_avg", col("grp_sum") / col("__nv"))
      .withColumn("grp_dev", sqrt(col("grp_var")))
      .drop("__nv")
  }

  /** Windowed run-group aggregate — cs_win_group_* (func.c:6594-6790):
    * same run semantics but length-preserving — every member of the run
    * carries the run's aggregate.
    *
    * Keyed: Window.partitionBy(keys, run) — one shuffle, parallel across
    * (key, run) groups. Keyless: partitioning a window by run_id ALONE
    * would funnel a long run (a regime flag with three runs over a
    * billion rows) into one task — the exact single-task magnet the
    * keyless machinery exists to avoid — so the run aggregates are
    * computed with a hash aggregate (map-side partials collapse long runs
    * BEFORE the shuffle) and joined back; the run-aggregate side is one
    * row per run, so AQE broadcasts it when it fits.
    */
  def winGroupAgg(df: DataFrame, keys: Seq[String], groupVal: String, value: String,
                  intVal: Option[String] = None): DataFrame = {
    val wgNames = Seq("wg_sum", "wg_min", "wg_max", "wg_avg", "wg_count",
      "wg_var", "wg_dev", "wg_first", "wg_last") ++
      intVal.toSeq.flatMap(_ => Seq("wg_all", "wg_any"))
    graft.window.Moving.guardNames(df.columns.toSeq, wgNames, "winGroupAgg")
    val withRun = attachRunId(df, keys, groupVal)
    if (keys.isEmpty) {
      val aggCols = Seq(
        sum(col(value)).as("wg_sum"), min(col(value)).as("wg_min"),
        max(col(value)).as("wg_max"), avg(col(value)).as("wg_avg"),
        count(lit(1)).as("wg_count"), var_pop(col(value)).as("wg_var"),
        min_by(col(value), col("pos")).as("wg_first"),
        max_by(col(value), col("pos")).as("wg_last")) ++
        intVal.toSeq.flatMap(iv =>
          Seq(bit_and(col(iv)).as("wg_all"), bit_or(col(iv)).as("wg_any")))
      val runAggs = withRun.groupBy(col("run_id"))
        .agg(aggCols.head, aggCols.tail: _*)
        .withColumn("wg_dev", sqrt(col("wg_var")))
      withRun.join(runAggs, Seq("run_id"), "left")
        .select((withRun.columns.toSeq ++ wgNames).map(col): _*)
    } else {
      val w = Window.partitionBy((keys :+ "run_id").map(col): _*)
      val base = withRun
        .withColumn("wg_sum", sum(col(value)).over(w))
        .withColumn("wg_min", min(col(value)).over(w))
        .withColumn("wg_max", max(col(value)).over(w))
        .withColumn("wg_avg", avg(col(value)).over(w))
        .withColumn("wg_count", count(lit(1)).over(w))
        .withColumn("wg_var", var_pop(col(value)).over(w))
        // sqrt of the var column, not a second windowed Welford buffer
        .withColumn("wg_dev", sqrt(col("wg_var")))
        .withColumn("wg_first", min_by(col(value), col("pos")).over(w))
        .withColumn("wg_last", max_by(col(value), col("pos")).over(w))
      intVal.fold(base) { iv =>
        base.withColumn("wg_all", bit_and(col(iv)).over(w))
          .withColumn("wg_any", bit_or(col(iv)).over(w))
      }
    }
  }

  /** Grid (tumbling count-based bucket) aggregate — cs_grid_max/min/avg/sum
    * (func.c:2170-2266): buckets of `step` consecutive elements.
    */
  def gridAgg(df: DataFrame, keys: Seq[String], value: String, step: Long): DataFrame = {
    // step = 0 would be pos/0 = NULL under non-ANSI division: every row
    // in one NULL bucket, silently
    require(step > 0, s"grid step must be positive, got $step")
    val grp = (keys.map(col) :+ floor(col("pos") / step).as("grid"))
    // avg and dev are DERIVED in the projection (sum/count(value) and
    // sqrt(var) — the exact formulas the dedicated aggregates finalize
    // with, so values are bit-identical): 5 accumulated states per group
    // instead of 7, dropping a duplicate Welford buffer and a duplicate
    // (sum, count) pair from every partial-agg row at scale
    df.groupBy(grp: _*)
      .agg(
        count(lit(1)).as("grid_count"),
        count(col(value)).as("__nv"),
        sum(col(value)).as("grid_sum"),
        min(col(value)).as("grid_min"),
        max(col(value)).as("grid_max"),
        var_pop(col(value)).as("grid_var"))
      .withColumn("grid_avg", col("grid_sum") / col("__nv"))
      .withColumn("grid_dev", sqrt(col("grid_var")))
      .drop("__nv")
  }

  /** Cumulative aggregates — cs_cum_sum/avg/min/max/prd (func.c:1791-1887).
    * Running frame per key. cum_prd via exp∘sum∘log is only valid for
    * positive values; the general path is the window-product below.
    */
  def cumAgg(df: DataFrame, keys: Seq[String], value: String): DataFrame = {
    graft.window.Moving.guardNames(df.columns.toSeq,
      Seq("cum_sum", "cum_avg", "cum_min", "cum_max", "cum_count",
        "cum_var", "cum_dev"), "cumAgg")
    if (keys.isEmpty) {
      // one monoid scan carries (Σx, Σx², min, max, rows, values, NaNs) —
      // the row count is a scan component, NOT pos+1, so sliced series
      // with non-dense pos divide by the true running count; var/dev use
      // the reference's naive formula (func.c:1475-1491) — no whole-frame
      // ordered window. NULL values are SKIPPED like the keyed path's SQL
      // aggregates (all-NULL prefix → NULL stats, count still counts
      // rows), and min follows Spark's NaN-above-everything order (NaN
      // only when every value so far is NaN) while max reports NaN the
      // moment one appears — exactly what the keyed window emits.
      val vIdx = df.schema.fieldIndex(value)
      val scanned = graft.window.Moving.monoidScanRanged(
        df, Seq(), Seq("__s", "__ss", "__mn", "__mx", "__n", "__nv", "__nan"))(
        Array(0.0, 0.0, Double.PositiveInfinity, Double.NegativeInfinity,
          0.0, 0.0, 0.0)) { r =>
        if (r.isNullAt(vIdx))
          Array(0.0, 0.0, Double.PositiveInfinity, Double.NegativeInfinity,
            1.0, 0.0, 0.0)
        else {
          val x = r.getAs[Number](vIdx).doubleValue()
          if (x.isNaN)
            Array(x, x, Double.PositiveInfinity, Double.NegativeInfinity,
              1.0, 1.0, 1.0)
          else Array(x, x * x, x, x, 1.0, 1.0, 0.0)
        }
      } { (a, b) =>
        Array(a(0) + b(0), a(1) + b(1), math.min(a(2), b(2)),
          math.max(a(3), b(3)), a(4) + b(4), a(5) + b(5), a(6) + b(6))
      }
      val nv = col("__nv")
      val none = nv === 0.0
      scanned
        .withColumn("cum_sum", when(!none, col("__s")))
        .withColumn("cum_avg", when(!none, col("__s") / nv))
        .withColumn("cum_min",
          when(none, lit(null))
            .when(col("__nan") === nv, lit(Double.NaN))
            .otherwise(col("__mn")))
        .withColumn("cum_max",
          when(none, lit(null))
            .when(col("__nan") > 0.0, lit(Double.NaN))
            .otherwise(col("__mx")))
        .withColumn("cum_count", col("__n").cast("long"))
        .withColumn("cum_var",
          when(!none,
            greatest((col("__ss") - col("__s") * col("__s") / nv) / nv, lit(0.0))))
        .withColumn("cum_dev", sqrt(col("cum_var")))
        .drop("__s", "__ss", "__mn", "__mx", "__n", "__nv", "__nan")
    } else {
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy(col("pos"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df.withColumn("cum_sum", sum(col(value)).over(w))
        .withColumn("cum_avg", avg(col(value)).over(w))
        .withColumn("cum_min", min(col(value)).over(w))
        .withColumn("cum_max", max(col(value)).over(w))
        .withColumn("cum_count", count(lit(1)).over(w))
        .withColumn("cum_var", var_pop(col(value)).over(w))
        // sqrt of the var column, not a second windowed Welford buffer
        .withColumn("cum_dev", sqrt(col("cum_var")))
    }
  }

  /** Fixed-bin histogram — cs_histogram (func.c:4062-4133): counts of
    * values in n equal bins over [min, max); out-of-range values ignored.
    * groupBy(bin) with map-side partial counts = the reference's parallel
    * bin-merge.
    */
  def histogram(df: DataFrame, value: String, lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins > 0, s"histogram needs a positive bin count, got $bins")
    require(hi > lo, s"histogram range [$lo, $hi) is empty")
    val width = (hi - lo) / bins
    // clamp: width is rounded, so x just below hi can land in phantom bin
    // `bins` (the reference's (x-lo)*n/(hi-lo) multiply-before-divide
    // order, func.c:4062-4133, cannot — the clamp reproduces it)
    df.filter(col(value) >= lo && col(value) < hi)
      .groupBy(least(lit(bins - 1L), floor((col(value) - lo) / width).cast("long")).as("bin"))
      .agg(count(lit(1)).as("bin_count"))
  }

  /** Top-k by value — cs_top_max/min (func.c:2981-3086). orderBy.limit
    * compiles to TakeOrderedAndProject: per-partition bounded heap + driver
    * merge, the same bounded-buffer + merge the reference uses. Ties broken
    * by `tiebreak` for determinism.
    */
  def topK(df: DataFrame, value: String, k: Int, desc: Boolean, tiebreak: String): DataFrame = {
    val ord =
      if (desc) Seq(col(value).desc, col(tiebreak).asc)
      else Seq(col(value).asc, col(tiebreak).asc)
    df.orderBy(ord: _*).limit(k)
  }

  /** Top-k positions — cs_top_max_pos/min_pos (func.c:3088-3208): the
    * `pos` values of the k largest/smallest elements. Same
    * TakeOrderedAndProject plan as topK, projecting pos.
    */
  def topKPos(df: DataFrame, value: String, k: Int, desc: Boolean): DataFrame =
    topK(df, value, k, desc, "pos").select(col("pos"))
}
