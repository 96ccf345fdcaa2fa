package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The testdata's events.ts column has shipped in different parquet
  * encodings across rounds: TIMESTAMP(NANOS) (which `nanosAsLong=true`
  * surfaces as int64 epoch-ns), and TIMESTAMP(MICROS) (which Spark reads
  * as a timestamp type — TIMESTAMP_NTZ for isAdjustedToUTC=false, the
  * round-8 shape). Tables.read normalizes every encoding to the engine's
  * int64 epoch-ns convention so downstream operators (ns-denominated
  * window frames, tolerances, grid buckets) never see the difference, and
  * Tables.rangeScan keeps parquet filter pushdown by binding range
  * predicates to the RAW ts column with a same-typed literal. This spec
  * pins that boundary for each encoding the data has shipped in.
  */
class TsEncodingSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // 10 rows, 1 hour apart, starting 2024-01-01T00:00:00Z (micros)
  private val baseUs = 1704067200000000L
  private val hourUs = 3600L * 1000000L
  private val rows: Seq[(Long, Long, Double)] =
    (0 until 10).map(i => (i.toLong, baseUs + i * hourUs, i * 1.5))

  /** Write an events-shaped table with ts in the given encoding; returns
    * the sfDir-style parent so Tables.read(dir, "events") finds it.
    */
  private def stage(name: String, tsCol: org.apache.spark.sql.Column): String = {
    val dir = java.nio.file.Files.createTempDirectory(name).toString
    rows.toDF("event_id", "ts_us", "value")
      .select(col("event_id"), tsCol.as("ts"), col("value"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def tsValues(df: DataFrame): Seq[Long] =
    df.select("ts").collect().map(_.getLong(0)).sorted.toSeq

  private val wantNs = rows.map(_._2 * 1000L)

  test("µs TIMESTAMP_NTZ ts (round-8 testdata shape) normalizes to epoch-ns longs") {
    val dir = stage("ts_ntz", timestamp_micros(col("ts_us")).cast(TimestampNTZType))
    val ev = graft.io.Tables.read(spark, dir, "events")
    assert(ev.schema("ts").dataType === LongType)
    assert(tsValues(ev) === wantNs)
  }

  test("µs TIMESTAMP (LTZ / isAdjustedToUTC) ts normalizes to epoch-ns longs") {
    val dir = stage("ts_ltz", timestamp_micros(col("ts_us")))
    val ev = graft.io.Tables.read(spark, dir, "events")
    assert(ev.schema("ts").dataType === LongType)
    assert(tsValues(ev) === wantNs)
  }

  test("legacy int64-ns ts (nanosAsLong read shape) passes through untouched") {
    val dir = stage("ts_ns", (col("ts_us") * 1000L).as("ts"))
    val ev = graft.io.Tables.read(spark, dir, "events")
    assert(ev.schema("ts").dataType === LongType)
    assert(tsValues(ev) === wantNs)
  }

  test("NTZ multi-file rangeScan prunes at file level without changing results") {
    // Spark builds no parquet FilterPredicate for NTZ ts, so rangeScan
    // does its own footer-stats file pruning for NTZ sources. Write the
    // 10 hourly rows as 5 two-row files (disjoint ts ranges), slice
    // [t2, t5), and check exact results incl. file-boundary rows.
    val dir = java.nio.file.Files.createTempDirectory("ts_ntz_files").toString
    rows.toDF("event_id", "ts_us", "value")
      .select(col("event_id"),
        timestamp_micros(col("ts_us")).cast(TimestampNTZType).as("ts"),
        col("value"))
      .repartitionByRange(5, col("ts")).sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val nFiles = new java.io.File(s"$dir/events.parquet").listFiles
      .count(_.getName.endsWith(".parquet"))
    assert(nFiles == 5, s"expected 5 part files, got $nFiles")
    val fromNs = (baseUs + 2 * hourUs) * 1000L
    val tillNs = (baseUs + 5 * hourUs) * 1000L
    val q = graft.io.Tables.rangeScan(spark, dir, "events", fromNs, tillNs)
    assert(q.schema("ts").dataType === LongType)
    assert(tsValues(q) === wantNs.slice(2, 5))
    // empty slice (before the data) returns an empty frame, same schema
    val empty = graft.io.Tables.rangeScan(spark, dir, "events",
      0L, (baseUs - 1) * 1000L)
    assert(empty.count() === 0)
    assert(empty.schema("ts").dataType === LongType)
  }

  test("rangeScan with non-µs-aligned ns bounds is encoding-independent") {
    // a ns bound that falls BETWEEN µs grid points must select the same
    // rows whether ts is stored as µs-timestamp (literal quantized with a
    // ceiling) or as int64-ns (exact comparison): u µs satisfies
    // u*1000 >= fromNs iff u >= ceil(fromNs/1000), same for the till end
    val ntz = stage("ragged_ntz", timestamp_micros(col("ts_us")).cast(TimestampNTZType))
    val ns = stage("ragged_ns", (col("ts_us") * 1000L).as("ts"))
    // fromNs just ABOVE t2 (excludes hour 2), tillNs just above t5
    // (includes hour 5) — flooring would get both ends wrong
    val fromNs = (baseUs + 2 * hourUs) * 1000L + 1L
    val tillNs = (baseUs + 5 * hourUs) * 1000L + 1L
    val want = wantNs.slice(3, 6)
    for (dir <- Seq(ntz, ns)) {
      val got = tsValues(graft.io.Tables.rangeScan(spark, dir, "events", fromNs, tillNs))
      assert(got === want, dir)
    }
  }

  test("rangeScan falls back to an unpruned read on partitioned NTZ layouts") {
    // per-file footer pruning cannot subset a partitionBy directory tree
    // (direct part reads would drop the directory-encoded column) — the
    // NTZ path must fall back, never silently return empty
    val dir = java.nio.file.Files.createTempDirectory("ts_ntz_part").toString
    rows.toDF("event_id", "ts_us", "value")
      .select(col("event_id"),
        timestamp_micros(col("ts_us")).cast(TimestampNTZType).as("ts"),
        (col("event_id") % 2).as("bucket"), col("value"))
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val fromNs = (baseUs + 2 * hourUs) * 1000L
    val tillNs = (baseUs + 5 * hourUs) * 1000L
    val q = graft.io.Tables.rangeScan(spark, dir, "events", fromNs, tillNs)
    assert(tsValues(q) === wantNs.slice(2, 5))
    assert(q.columns.contains("bucket")) // partition column survives
  }

  test("engine-written timestamp columns are INT64-µs, never INT96") {
    // Spark's parquet default writes TimestampType as INT96, whose
    // min/max stats readers ignore — every engine-written time-clustered
    // layout would silently lose row-group pruning. All harness builders
    // pin outputTimestampType=TIMESTAMP_MICROS; this guards the pin.
    val dir = java.nio.file.Files.createTempDirectory("ts_int64").toString
    rows.toDF("event_id", "ts_us", "value")
      .select(timestamp_micros(col("ts_us")).as("ts"))
      .write.mode("overwrite").parquet(dir)
    val part = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".parquet")).head
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(part.getPath),
      spark.sparkContext.hadoopConfiguration)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      import scala.jdk.CollectionConverters._
      val pt = reader.getFooter.getFileMetaData.getSchema.getFields.asScala
        .find(_.getName == "ts").get.asPrimitiveType().getPrimitiveTypeName
      assert(pt === org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64)
    } finally reader.close()
  }

  test("rangeScan pushes the ts bound to the scan for every encoding") {
    val dirs = Seq(
      stage("rs_ntz", timestamp_micros(col("ts_us")).cast(TimestampNTZType)),
      stage("rs_ltz", timestamp_micros(col("ts_us"))),
      stage("rs_ns", (col("ts_us") * 1000L).as("ts")))
    // [t2, t5): hours 2,3,4 — half-open bound semantics
    val fromNs = (baseUs + 2 * hourUs) * 1000L
    val tillNs = (baseUs + 5 * hourUs) * 1000L
    for (dir <- dirs) {
      val q = graft.io.Tables.rangeScan(spark, dir, "events", fromNs, tillNs)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"),
        s"$dir:\n$plan")
      assert(q.schema("ts").dataType === LongType, dir)
      assert(tsValues(q) === wantNs.slice(2, 5), dir)
    }
  }
}
