package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling harness: run one named query N times against a sf dir
  * under BENCH conditions (tables persisted, series warmed), print per-run
  * wall time split into plan (analysis+optimization+physical planning) and
  * exec (job run), and optionally the formatted plan.
  * Usage: graft.Prof <sfDir> <queryName> [runs] [explain] [cold]
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    // `runs` and `explain` are independent optionals: `Prof sf q explain`
    // must not crash on toInt
    val runs = args.drop(2).flatMap(_.toIntOption).headOption.getOrElse(3)
    val doExplain = args.contains("explain")
    val cold = args.contains("cold") // skip the cache-load phase
    val builder = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // engine-written timestamp columns must carry INT64-µs stats —
      // the INT96 default has no usable min/max, so row-group pruning
      // over written layouts would silently be a no-op (PruneProbe)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
    // ad-hoc experiment overrides: SPARK_GRAFT_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(';')).map(_.split("=", 2))
      .collect { case Array(k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (!cold) {
      val tables = Seq("lineitem", "orders", "customer", "part",
        "events", "documents", "embeddings")
      tables.foreach { t =>
        graft.io.Tables.read(spark, sfDir, t)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
      }
      SparkEntry.warmSeries(spark, sfDir)
    }
    // SWEEP mode: `graft.Prof <sfDir> sweep [reps]` times EVERY declared
    // query in one JVM (bench conditions, noop sink, min/spread over warm
    // reps) — the full-coverage outlier scan an optimization round needs.
    // One JVM so the 15 s session startup isn't paid 179 times; queries
    // run alphabetically, failures are reported and skipped.
    if (name == "sweep") {
      val reps = args.drop(2).flatMap(_.toIntOption).headOption.getOrElse(3)
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Double, Double)]
      SparkEntry.queries.keys.toSeq.sorted.foreach { q =>
        val f = SparkEntry.queries(q)
        try {
          def once(): Double = {
            val t0 = System.nanoTime()
            f(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          once() // warm (codegen/JIT)
          val times = Seq.fill(reps)(once())
          out += ((q, times.min, times.max - times.min))
          println(f"$q%-28s min ${times.min}%7.3f  spread ${times.max - times.min}%6.3f")
        } catch {
          // NonFatal only (ADVICE r17): a fatal error (OOM) leaves the
          // JVM degraded — continuing would silently skew every
          // subsequent sweep timing; let it abort the sweep loudly
          case scala.util.control.NonFatal(e) =>
            println(f"$q%-28s FAILED ${e.getMessage}")
        }
      }
      println("== slowest 20 ==")
      out.sortBy(-_._2).take(20).foreach { case (q, m, s) =>
        println(f"$q%-28s min $m%7.3f  spread $s%6.3f") }
      spark.stop()
      return
    }
    val fn = SparkEntry.queries(name)
    if (doExplain) fn(spark, sfDir).explain("formatted")
    // `jobs`: per-job wall-time accounting for the LAST run — how many
    // Spark jobs a query launches and where each comes from (call site),
    // i.e. how much of a bench-scale time is per-job launch floor vs data
    val doJobs = args.contains("jobs")
    case class J(id: Int, site: String, var start: Long = 0L, var end: Long = 0L,
                 var tasks: Int = 0)
    val jobLog = scala.collection.mutable.ArrayBuffer.empty[J]
    var taskMs = 0L; var taskDeserMs = 0L
    val stageMs = scala.collection.mutable.Map.empty[Int, (Int, Long, Long)]
    if (doJobs) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobLog.synchronized {
            jobLog += J(e.jobId,
              Option(e.properties.getProperty("callSite.short"))
                .orElse(Option(e.properties.getProperty("spark.job.description")))
                .getOrElse(e.stageInfos.map(_.name.takeWhile(_ != '\n'))
                  .mkString(" <- ")),
              e.time, 0L, e.stageInfos.map(_.numTasks).sum)
          }
        override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          jobLog.synchronized {
            jobLog.find(_.id == e.jobId).foreach(_.end = e.time)
          }
        override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          jobLog.synchronized {
            taskMs += Option(e.taskMetrics).map(_.executorRunTime).getOrElse(0L)
            taskDeserMs += Option(e.taskMetrics).map(_.executorDeserializeTime).getOrElse(0L)
            val run = Option(e.taskMetrics).map(_.executorRunTime).getOrElse(0L)
            val (n, ms, mx) = stageMs.getOrElse(e.stageId, (0, 0L, 0L))
            stageMs(e.stageId) = (n + 1, ms + run, math.max(mx, run))
          }
      })
    var lastDf: Option[org.apache.spark.sql.DataFrame] = None
    (1 to runs).foreach { i =>
      if (doJobs && i == runs) jobLog.synchronized { jobLog.clear(); taskMs = 0L; taskDeserMs = 0L; stageMs.clear() }
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      df.queryExecution.executedPlan // force analysis through physical planning
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      lastDf = Some(df)
      println(f"run $i: total ${(t2 - t0) / 1e9}%.3f s  (plan ${(t1 - t0) / 1e9}%.3f, exec ${(t2 - t1) / 1e9}%.3f)")
    }
    // the POST-EXECUTION plan: AQE's final plan with WholeStageCodegen
    // spans (`*(n)` markers) and AQEShuffleRead nodes — the formatted
    // pre-execution explain above prints isFinalPlan=false without
    // codegen annotation, so span claims need this view. The noop write
    // does NOT execute this df's own QueryExecution (DataFrameWriter
    // wraps the logical plan in a fresh one — review r18), so drive the
    // df's OWN executedPlan to completion here: toRdd + a foreach action
    // materializes every AQE stage on this very AdaptiveSparkPlanExec,
    // after which executedPlan prints isFinalPlan=true with codegen
    // spans. Explain-mode only — never inside the timed reps.
    if (doExplain) lastDf.foreach { df =>
      df.queryExecution.toRdd.foreachPartition(_ => ())
      println("== final adaptive plan (post-execution) ==")
      println(df.queryExecution.executedPlan.toString)
    }
    if (doJobs) {
      // settle async listener events before reading the log (the bus is
      // private API; poll until every started job has its end event)
      val deadline = System.nanoTime() + 2_000_000_000L
      while (jobLog.synchronized(jobLog.exists(_.end == 0L)) &&
             System.nanoTime() < deadline) Thread.sleep(20)
      val js = jobLog.synchronized(jobLog.toVector)
      println(f"== executor task time in final run: ${taskMs / 1e3}%.3f s run + ${taskDeserMs / 1e3}%.3f s deserialize (the rest of exec wall is driver: planning, codegen, scheduling, broadcast collect)")
      println(s"== jobs in final run: ${js.size}, " +
        f"summed wall ${js.map(j => j.end - j.start).sum / 1e3}%.3f s (jobs overlap; gaps between jobs are driver/planning time)")
      js.foreach { j =>
        println(f"  job ${j.id}%3d ${(j.end - j.start) / 1e3}%7.3f s ${j.tasks}%4d tasks  ${j.site}")
      }
      stageMs.toVector.sortBy(_._1).foreach { case (sid, (n, ms, mx)) =>
        println(f"  stage $sid%3d: $n%3d tasks, ${ms / 1e3}%7.3f s summed run, max task ${mx / 1e3}%.3f s")
      }
    }
    spark.stop()
  }
}
