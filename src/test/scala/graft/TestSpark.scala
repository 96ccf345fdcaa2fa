package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites. */
object TestSpark {
  // zero retention grace for the test JVM: every retiring op reclaims its
  // replaced files at exit (the pre-r12 eager-deletion semantics plain
  // directory-read assertions expect). The retention/racing-reader tests
  // override the prop per-test and restore it.
  sys.props("graft.retire.grace.ms") = "0"

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // engine-written timestamp columns must carry INT64-µs stats —
      // the INT96 default has no usable min/max, so row-group pruning
      // over written layouts would silently be a no-op (PruneProbe)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Stage the NORMALIZED events frame (int64-ns ts — Tables.read's
    * convention) as a fresh parquet directory for the file streaming
    * source. A raw file copy would hand the stream whatever ts type the
    * testdata parquet carries (µs-timestamp since round 8), while Streams'
    * event-time math and the batch twins both assume epoch-ns longs.
    */
  def stageEvents(sfDir: String, name: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(name)
    graft.io.Tables.read(spark, sfDir, "events")
      .write.mode("overwrite").parquet(dir.toString)
    dir.toString
  }
}
