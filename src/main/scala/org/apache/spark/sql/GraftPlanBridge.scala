package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal `private[sql]`-access bridge: turn a custom resolved
  * [[LogicalPlan]] (graft.plans.*) into a DataFrame through the session's
  * normal analyzer/optimizer/planner pipeline. This is the one
  * integration point Spark does not expose publicly for libraries that
  * add whole-operator plan nodes; everything else in graft stays on the
  * public API.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
