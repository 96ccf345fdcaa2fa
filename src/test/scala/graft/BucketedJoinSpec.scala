package graft

import graft.io.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located join via bucketed ingest: the join of two tables bucketed on
  * the same keys must run with no Exchange and no per-query Sort — the
  * ingest-time shuffle is amortized over every downstream join.
  */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  test("join of co-bucketed tables has zero Exchange and zero Sort") {
    Tables.loadBucketed(Tables.read(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_extendedprice", "l_discount"),
      "b_lineitem", Seq("l_orderkey"), 8)
    Tables.loadBucketed(Tables.read(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice"),
      "b_orders", Seq("o_orderkey"), 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path (broadcast would hide the co-location)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // propagate the per-bucket sort order from the scan (off by default
      // since SPARK-28632; sound here because loadBucketed writes exactly
      // one sorted file per bucket)
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val joined = spark.table("b_lineitem").join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)
      assert(!plan.contains("Sort "), plan)
      // and it computes the same answer as the plain join
      val expected = Tables.read(spark, sfDir, "lineitem")
        .join(Tables.read(spark, sfDir, "orders"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
    }
  }
}
