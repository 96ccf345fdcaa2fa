package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ingest-layout pruning: a date-bucket-partitioned table must serve a
  * time-sliced query from a PRUNED scan — partition filters at the
  * directory level, before any row is read. This is the cluster-scale
  * complement of row-group min/max pruning on the sorted-by-ts files
  * (SURVEY §1.5: the reference's B-tree timestamp descent maps to
  * partition pruning + min/max stats on sorted Parquet).
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  test("date-partitioned ingest prunes partitions for time-sliced scans") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part_events").toString
    val ev = graft.io.Tables.read(spark, sfDir, "events")
      .withColumn("day", expr("ts div 86400000000000")) // ns → day bucket
    ev.write.mode("overwrite").partitionBy("day").parquet(dir)
    val days = ev.select("day").distinct().count()
    assert(days > 1, s"need multiple day buckets, got $days")
    val firstDay = ev.agg(min("day")).head().getLong(0)
    val sliced = spark.read.parquet(dir).filter(col("day") === firstDay)
    val plan = sliced.queryExecution.executedPlan.toString
    // the day predicate must land in PartitionFilters (directory pruning),
    // NOT in PushedFilters (row-level) — no data file of other days is read
    assert(plan.contains("PartitionFilters: [isnotnull(day"), plan)
    assert(sliced.count() ==
      ev.filter(col("day") === firstDay).count())
  }

  test("ts-range scan pushes filters to parquet and prunes columns (TABLE_get shape)") {
    // the q_get shape: a ts-range predicate over a 2-column projection
    // must reach the scan as PushedFilters (row-group min/max pruning on
    // the ts-sorted files) with a ReadSchema of exactly the used columns
    // — a scan reading all columns for a 2-column projection is wrong
    val ev = graft.io.Tables.read(spark, sfDir, "events")
    val lo = ev.agg(min("ts")).head().getLong(0)
    val q = ev.filter(col("ts") >= lo && col("ts") < lo + 86400000000000L)
      .select("ts", "value")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"),
      plan)
    assert(plan.contains("ReadSchema: struct<ts:bigint,value:double>"), plan)
    assert(q.count() > 0)
  }
}
