package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** The as-of join as a first-class Catalyst operator: a logical node, a
  * planner strategy, and a physical streaming merge — the tier-(c) custom
  * operator path (LogicalPlan + Strategy + SparkPlan) for the one
  * semantics the reference treats as its workhorse (func.c:4591-4662:
  * one merge pass over two sorted series).
  *
  * Why a custom physical node when [[graft.join.Align.asofJoin]]'s
  * union + last-ignoreNulls window already works: the union form pays for
  * shuffling BOTH sides tagged into one stream, a window buffer, and a
  * post-filter that throws the right rows away again. The merge exec
  * declares `requiredChildDistribution`/`requiredChildOrdering` instead —
  * Spark plants one Exchange + Sort per side (exactly a sort-merge join's
  * scaffolding, AQE-coalescible) and the operator itself is a zero-copy
  * per-partition two-cursor merge: O(n+m), no window buffer, no union
  * materialization, no post-filter. Per key-partition the merge is
  * independent, so the plan scales like any shuffled join.
  *
  * Semantics match Align.asofJoin (backward as-of): for each left row,
  * the value columns of the latest right row with right.ts <= left.ts
  * (strictly < when `inclusive=false`) in the same key group; NULLs when
  * no such row. NULL keys compare equal to each other — the same grouping
  * the window form's partitionBy gives — and NULL order keys sort first.
  */
case class AsofJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightValues: Seq[Attribute],
    inclusive: Boolean,
    direction: Int = -1) extends BinaryNode {
  require(leftKeys.size == rightKeys.size, "as-of key arity mismatch")
  require(direction == -1 || direction == 1, "direction must be -1 or +1")
  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoinPlan]] as [[AsofMergeJoinExec]]. Registered either at
  * runtime ([[AsofMerge.install]]) or config-time
  * ([[graft.sqlext.GraftExtensions]]).
  */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lts, rts, vals, incl, dir) =>
      AsofMergeJoinExec(lk, rk, lts, rts, vals, incl, dir,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical streaming as-of merge. Children arrive co-partitioned on the
  * keys and sorted by (keys, ts) — EnsureRequirements supplies the
  * Exchange/Sort pair from the declared requirements, so this node only
  * runs the per-partition merge: advance the right cursor while its
  * (key, ts) does not pass the current left row, carrying the last
  * same-key value; emit left columns + carry (or NULLs).
  *
  * Keyless series (the reference's default single-series shape) declare
  * [[AllTuples]] — a single merge task, the honest requirement for a
  * global merge; large keyless frames should use Align.asofJoin's ranged
  * scan instead, which parallelizes the carry as a prefix monoid.
  */
case class AsofMergeJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightValues: Seq[Attribute],
    inclusive: Boolean,
    direction: Int,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    if (leftKeys.isEmpty) AllTuples :: AllTuples :: Nil
    else ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // direction +1 ("succeeding": earliest right ts >= left ts) is the exact
  // mirror: scan ts DESCENDING, so "latest row not past the cursor" becomes
  // the smallest qualifying ts — the same trick Align.asofJoinDir uses
  private def tsDir = if (direction == -1) Ascending else Descending

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, tsDir),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, tsDir))

  // rows stream out in the left child's (keys, ts) sort order and keep its
  // partitioning — downstream sorts/aggs on the keys reuse both
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val incl = inclusive
    val dir = direction
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys
    val rk = rightKeys
    val lts = leftTs
    val rts = rightTs
    val rvals = rightValues
    val outAttrs = output
    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (lIter, rIter) =>
        val lKeyGen = UnsafeProjection.create(lk, lOut)
        val rKeyGen = UnsafeProjection.create(rk, rOut)
        val lTsGen = UnsafeProjection.create(Seq(lts), lOut)
        val rTsGen = UnsafeProjection.create(Seq(rts), rOut)
        val valGen = UnsafeProjection.create(rvals, rOut)
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(lk.map(_.dataType))
        val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lts.dataType))
        val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
        val joined = new JoinedRow
        val nullVal = new GenericInternalRow(rvals.size)
        // carry survives across left rows; the projections above reuse
        // their buffers, so the carried key/value are explicit copies
        var carryKey: UnsafeRow = null
        var carryVal: UnsafeRow = null
        var rCur: InternalRow = if (rIter.hasNext) rIter.next() else null
        lIter.map { lRow =>
          val lKey = lKeyGen(lRow)
          val lTsRow = lTsGen(lRow)
          var advancing = true
          while (advancing && rCur != null) {
            val rKey = rKeyGen(rCur)
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0) {
              // right rows for keys the left side has moved past: skip
              rCur = if (rIter.hasNext) rIter.next() else null
            } else if (c == 0 && {
              // signed compare in scan direction: dir=-1 advances while
              // rTs <= lTs (ascending scan), dir=+1 while rTs >= lTs
              // (descending scan) — both are tc*dir >= 0
              val tc = tsOrd.compare(rTsGen(rCur), lTsRow) * dir
              if (incl) tc >= 0 else tc > 0
            }) {
              carryVal = valGen(rCur).copy()
              carryKey = rKey.copy()
              rCur = if (rIter.hasNext) rIter.next() else null
            } else {
              advancing = false
            }
          }
          val v =
            if (carryKey != null && keyOrd.compare(carryKey, lKey) == 0) carryVal
            else nullVal
          numOutputRows += 1
          resultProj(joined(lRow, v))
        }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofMergeJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level API over the custom operator. */
object AsofMerge {

  /** Idempotently add the planner strategy to a live session. */
  def install(spark: SparkSession): Unit = {
    val e = spark.experimental
    if (!e.extraStrategies.contains(AsofJoinStrategy))
      e.extraStrategies = e.extraStrategies :+ AsofJoinStrategy
  }

  /** As-of join via the custom plan node — same contract as
    * [[graft.join.Align.asofJoin]]: left columns + `outCol`, the latest
    * right `valueCol` with right.ts <= left.ts per key (strictly earlier
    * when `inclusive=false`).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String], ts: String,
               valueCol: String, outCol: String = "asof_value",
               inclusive: Boolean = true): DataFrame =
    asofJoinDir(left, right, keys, ts, Seq(valueCol), Seq(outCol),
      direction = -1, inclusive = inclusive)

  /** Directional, multi-column form — the full
    * [[graft.join.Align.asofJoinDir]] surface on the custom operator:
    * every `valueCols(i)` from the matched right row lands in
    * `outCols(i)`; direction −1 matches the latest right ts <= left ts,
    * +1 the earliest right ts >= left ts (TABLE_join's direction enum,
    * func.c:6494-6548). Carrying several columns costs one merge either
    * way — the window form would pay one `last()` per column.
    */
  def asofJoinDir(left: DataFrame, right: DataFrame, keys: Seq[String], ts: String,
                  valueCols: Seq[String], outCols: Seq[String],
                  direction: Int = -1, inclusive: Boolean = true): DataFrame = {
    require(valueCols.size == outCols.size, "valueCols/outCols arity mismatch")
    val spark = left.sparkSession
    install(spark)
    val lPlan = left.queryExecution.analyzed
    // re-alias the right side through fresh exprIds: a self-join (both
    // sides carved from the same scan) would otherwise put duplicate
    // attribute ids in the node's output, which generic analyzer
    // deduplication does not repair for custom nodes
    val rAnalyzed = right.queryExecution.analyzed
    val rPlan = Project(rAnalyzed.output.map(a => Alias(a, a.name)()), rAnalyzed)
    def attr(outAttrs: Seq[Attribute], name: String, side: String): Attribute =
      outAttrs.find(_.name.equalsIgnoreCase(name)).getOrElse(
        throw new IllegalArgumentException(
          s"as-of $side side has no column '$name' (has: ${outAttrs.map(_.name).mkString(", ")})"))
    val rAttrs = rPlan.projectList.map(_.toAttribute)
    val node = AsofJoinPlan(
      lPlan, rPlan,
      keys.map(attr(lPlan.output, _, "left")),
      keys.map(attr(rAttrs, _, "right")),
      attr(lPlan.output, ts, "left"),
      attr(rAttrs, ts, "right"),
      valueCols.map(attr(rAttrs, _, "right")),
      inclusive,
      direction)
    GraftPlanBridge.ofRows(spark, node).toDF(left.columns ++ outCols: _*)
  }

  /** Tolerance-bounded as-of on the custom operator — the kdb/pandas
    * `tolerance=` semantics of [[graft.join.Align.asofJoinTol]]: the
    * match is dropped when staler than `tolerance`. Composition: the
    * merge carries (value, right ts) in one pass; the staleness gate is a
    * plain Column on top. NULL-valued right rows neither match nor mask
    * (filtered before the merge), matching the window form's
    * last-ignoreNulls contract.
    */
  def asofJoinTol(left: DataFrame, right: DataFrame, keys: Seq[String], ts: String,
                  valueCol: String, tolerance: org.apache.spark.sql.Column,
                  outCol: String = "asof_value"): DataFrame = {
    import org.apache.spark.sql.functions.{col, when}
    asofJoinDir(left, right.filter(col(valueCol).isNotNull),
      keys, ts, Seq(valueCol, ts), Seq(outCol, "__mts"))
      .withColumn(outCol,
        when(col("__mts").isNotNull && (col(ts) - col("__mts")) <= tolerance,
          col(outCol)))
      .drop("__mts")
  }
}
