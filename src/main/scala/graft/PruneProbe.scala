package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

/** Measured row-group pruning probe for the TABLE_get scan shape.
  *
  * The reference answers a timestamp-range get with a B-tree descent
  * (btree.c:479-589) — cost proportional to the slice, not the table. The
  * Spark analog is parquet row-group min/max pruning over a time-sorted
  * layout (Tables.load's sort order), reached through Tables.rangeScan,
  * which binds the range predicate to the RAW ts column so it survives as
  * a pushed filter. This probe makes that cost claim MEASURED rather than
  * plan-string-asserted: it writes events time-sorted as many row groups,
  * runs a one-day rangeScan, and reports the scan's numOutputRows — with
  * pruning working, the scan emits ~slice-sized row counts; broken
  * pruning emits the full table into the filter.
  *
  * Probes BOTH ts encodings the testdata has shipped (µs-timestamp and
  * int64-ns) since pushdown literals differ per type (Tables.tsLit).
  * Usage: graft.PruneProbe [sfDir] [files]
  */
object PruneProbe {
  /** The repartitioned single-file read plans under AQE, which hides the
    * scan behind AdaptiveSparkPlanExec — descend into its current plan.
    */
  private def findScan(plan: SparkPlan): Option[FileSourceScanExec] = plan match {
    case a: AdaptiveSparkPlanExec => findScan(a.executedPlan)
    case q: QueryStageExec        => findScan(q.plan) // AQE leaf wrapper
    case s: FileSourceScanExec    => Some(s)
    case p => p.children.iterator.flatMap(findScan).nextOption()
  }

  /** Locale-pinned ratio rendering: default-locale %.4f writes a comma
    * decimal separator under e.g. de_DE, corrupting the JSON line.
    */
  private def frac(n: Long, d: Long): String =
    String.format(java.util.Locale.ROOT, "%.4f", Double.box(n.toDouble / d))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val files = args.drop(1).headOption.flatMap(_.toIntOption).getOrElse(32)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Spark's default parquet timestamp encoding is INT96, whose
      // min/max stats parquet readers ignore — no row-group pruning at
      // all. The testdata (and any modern writer) uses INT64 micros;
      // write the probe layouts the same way.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val work = s"${System.getProperty("java.io.tmpdir")}/graft_prune_probe"
    val ev = graft.io.Tables.read(spark, sfDir, "events") // normalized ns
    val total = ev.count()
    val (loNs, hiNs) = {
      val r = ev.agg(min("ts"), max("ts")).head()
      (r.getLong(0), r.getLong(1))
    }
    val dayNs = 86400L * 1000000000L
    // a one-day slice in the middle of the range
    val from = loNs + ((hiNs - loNs) / 2 / dayNs) * dayNs
    val till = from + dayNs

    // Two TABLE_load-style layouts: range-clustered on ts so row-group
    // min/max stats are disjoint — one file per range partition, one row
    // group per file at this size (row-group pruning == file pruning).
    val variants = Seq(
      // µs TIMESTAMP_NTZ / isAdjustedToUTC=false (round-8 testdata shape)
      "ts_micros_ntz" -> ev.withColumn("ts",
        timestamp_micros(expr("ts div 1000"))
          .cast(org.apache.spark.sql.types.TimestampNTZType)),
      // µs TIMESTAMP / isAdjustedToUTC=true
      "ts_micros_ltz" -> ev.withColumn("ts", timestamp_micros(expr("ts div 1000"))),
      // int64-ns encoding (legacy shape / Tables.load's normalized dumps)
      "ts_ns_long" -> ev)
    for ((tag, df) <- variants) {
      val dir = s"$work/$tag"
      df.repartitionByRange(files, col("ts")).sortWithinPartitions("ts")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val sliced = graft.io.Tables.rangeScan(spark, dir, "events", from, till)
        .select("ts", "value")
      // drive THIS dataset's own execution — a .count() would build a
      // separate QueryExecution and leave these metrics untouched
      val sliceRows = sliced.collect().length
      val scan = findScan(sliced.queryExecution.executedPlan)
        .getOrElse(sys.error("no FileSourceScanExec in the rangeScan plan"))
      val scanned = scan.metrics("numOutputRows").value
      val pushed = scan.metadata.getOrElse("PushedFilters", "")
      println(s"""{"probe":"$tag","files":$files,"total_rows":$total,""" +
        s""""slice_rows":$sliceRows,"scan_output_rows":$scanned,""" +
        s""""scan_frac":${frac(scanned, total)},""" +
        s""""pushed":"${pushed.replace("\"", "'")}"}""")
      assert(pushed.contains("GreaterThanOrEqual(ts"), s"pushdown lost: $pushed")
    }

    // manifest vs footer pruning equivalence on the NTZ layout (the one
    // encoding where Spark itself cannot prune): the variant loop above
    // ran WITHOUT a manifest (per-file footer RPCs); adopting the same
    // dir via Tables.writeManifest must keep the same rows while reading
    // no more files — one sidecar read replacing the O(files) footer pass
    locally {
      val dir = s"$work/ts_micros_ntz"
      val byFooter = graft.io.Tables.rangeScan(spark, dir, "events", from, till)
        .select("ts", "value")
      val fRows = byFooter.collect().length
      val fFiles = byFooter.inputFiles.length
      graft.io.Tables.writeManifest(spark, s"$dir/events.parquet", "ts")
      val byManifest = graft.io.Tables.rangeScan(spark, dir, "events", from, till)
        .select("ts", "value")
      val mRows = byManifest.collect().length
      val mFiles = byManifest.inputFiles.length
      println(s"""{"probe":"manifest_vs_footer","files":$files,""" +
        s""""footer_files_read":$fFiles,"manifest_files_read":$mFiles,""" +
        s""""footer_rows":$fRows,"manifest_rows":$mRows}""")
      assert(mRows == fRows, s"manifest pruning changed results: $mRows vs $fRows")
      assert(mFiles <= fFiles, s"manifest kept MORE files than footers: $mFiles > $fFiles")
    }

    // the actual ingest API end-to-end: Tables.load (range shuffle +
    // within-file sort, normalized int64-ns ts) then rangeScan over the
    // loaded table — this is the engine's 100 TB read path
    locally {
      val dir = s"$work/loaded"
      graft.io.Tables.load(
        ev.repartition(files), s"$dir/events.parquet", Seq(), "ts")
      val sliced = graft.io.Tables.rangeScan(spark, dir, "events", from, till)
        .select("ts", "value")
      val n = sliced.collect().length
      val scan = findScan(sliced.queryExecution.executedPlan)
        .getOrElse(sys.error("no FileSourceScanExec in the loaded-path plan"))
      val scanned = scan.metrics("numOutputRows").value
      println(s"""{"probe":"table_load_path","files":$files,""" +
        s""""total_rows":$total,"slice_rows":$n,"scan_output_rows":$scanned,""" +
        s""""scan_frac":${frac(scanned, total)}}""")
    }

    // control: the actual testdata file (pyarrow-written, naive µs, no
    // Spark writer metadata), single row group — pruning can't subset a
    // lone row group, so scan_frac 1.0 here is layout, not predicate;
    // the variants above isolate the predicate behavior
    val sliced = graft.io.Tables.rangeScan(spark, sfDir, "events", from, till)
      .select("ts", "value")
    val n = sliced.collect().length
    val scan = findScan(sliced.queryExecution.executedPlan)
      .getOrElse(sys.error("no FileSourceScanExec in the rangeScan plan"))
    println(s"""{"probe":"testdata_raw","slice_rows":$n,""" +
      s""""scan_output_rows":${scan.metrics("numOutputRows").value},""" +
      s""""pushed":"${scan.metadata.getOrElse("PushedFilters", "").replace("\"", "'")}"}""")
    spark.stop()
  }
}
