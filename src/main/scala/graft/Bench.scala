package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main. Runs the headline workloads (the BASELINE.md shapes:
  * VWAP per key, filtered count, multi-key hash agg, grid/window aggs,
  * top-k, as-of join, TPC-H Q1, plus the training-pipeline ops) on
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Each query is materialized with a noop write — `count()` would let
  * Catalyst prune every computed column and undercount the real work.
  */
object Bench {

  /** BASELINE.md row → query name. Everything else in SparkEntry.queries
    * still runs in Verify; these are the timed headline set.
    */
  val headline: Seq[String] = Seq(
    "q1_agg",        // TPC-H Q1 (tpch.sql:38-58)
    "q_vwap",        // BASELINE rows 4/5/8: per-key cs_wavg
    "q_filter_count",// BASELINE row 9: filtered count
    "q_hash_multi",  // BASELINE row 10: multi-key hash agg
    "q_grid_agg",    // BASELINE row 12: cs_grid_avg
    "q_cum_agg",     // BASELINE row 13: cs_cum_sum
    "q_concat_sum",  // BASELINE row 11: cs_sum over concat of all series
    "q_window_agg",  // moving aggregates
    "q_topk",        // top-N
    "q_asof",        // as-of alignment join (union+window form)
    "q_asof_exec",   // same shape on the custom merge operator (graft.plans)
    "q_join",        // relational join path
    "q_ema",         // recursive indicator scan
    "q_dedup_exact", // content-hash dedup
    "q_minhash_lsh", // near-dup candidates
    "q_knn",         // embedding similarity
    "q_lang_id",     // text classification scan
    "q_tumbling")    // event-time bucket agg

  /** 1/5/15-minute load averages — the machine-contention witness. A bench
    * number is only as good as the box it ran on: round 5's recorded run
    * showed unchanged-code queries "regressing" 9× with ~1 s spreads on
    * 0.2 s queries, which an idle-box re-run flatly contradicted. Snapshot
    * the loadavg BEFORE the bench does any work (the start value is
    * uncontaminated by our own 32-thread load) so a contended run
    * self-identifies in the recorded JSON instead of masquerading as a
    * regression.
    */
  private def loadavg(): Seq[Double] =
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.trim.split("\\s+").take(3).toSeq.map(_.toDouble)
      finally src.close()
    } catch { case _: Throwable => Seq(-1.0, -1.0, -1.0) }

  /** Per-query interference witnesses, applied to (min, spread) of the warm
    * reps. Two independent triggers, each sufficient on its own:
    *  - ABSOLUTE: spread > 0.3 s — far beyond this workload's measured
    *    idle-box noise floor (~0.1 s);
    *  - RELATIVE: spread > 3× the query's own min (with a 0.1 s floor so
    *    tens-of-ms JIT jitter on a 20 ms query doesn't false-positive).
    *    Without the relative witness a 0.2 s burst on a 60 ms query — 4×
    *    its min, clearly interference — slid under the absolute gate
    *    (the round-7 blind band).
    */
  private[graft] def noisyWitness(minT: Double, spread: Double): Boolean =
    spread > 0.3 || (spread > 3 * minT && spread > 0.1)

  /** The single-query disqualifier: one spread both large in absolute terms
    * AND dwarfing its own min is an interference burst, not GC (measured max
    * pause 57 ms on this workload) — it flips the whole run to contended
    * even when only one query was hit (the round-6 failure mode).
    */
  private[graft] def extremeWitness(minT: Double, spread: Double): Boolean =
    spread > 0.3 && spread > 3 * minT

  def main(args: Array[String]): Unit = {
    val startLoad = loadavg()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // engine-written timestamp columns must carry INT64-µs stats —
      // the INT96 default has no usable min/max, so row-group pruning
      // over written layouts would silently be a no-op (PruneProbe)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Load phase — the reference is an IN-MEMORY columnar store whose
    // published numbers (BASELINE.md) are measured after `TABLE_load()`
    // (user_guide.html:1630: load itself takes 15 s and is not part of any
    // query time). The Spark equivalent of that load is caching the
    // columnar tables; Spark's CacheManager then serves every identical
    // `spark.read.parquet(path)` plan from the InMemoryRelation, so the
    // timed queries below scan memory, not parquet. Reported separately
    // as load_sec.
    val tables = Seq("lineitem", "orders", "customer", "part",
      "events", "documents", "embeddings")
    val tLoad = System.nanoTime()
    tables.foreach { t =>
      graft.io.Tables.read(spark, sfDir, t)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK).count()
    }
    // pos numbering happens at load in the reference (imcs.c:4177-4412);
    // materialize the events series here for the same reason
    SparkEntry.warmSeries(spark, sfDir)
    val loadSec = (System.nanoTime() - tLoad) / 1e9

    // Warm the JVM + codegen so q1 doesn't absorb startup cost.
    SparkEntry.queries("q1_agg")(spark, sfDir).write.format("noop")
      .mode("overwrite").save()

    // N runs per query (default 5), min of the warm runs reported: run 1
    // pays one-time codegen compilation (~0.5-1 s per distinct plan), which
    // the reference's published numbers exclude (they are post-load,
    // repeat-measured — BASELINE.md row 9 quotes the "repeat" time).
    // cold_sec keeps the first-run total visible; "spread" (max-min over
    // warm runs) exposes the per-query noise floor, and a query that
    // throws is recorded in "failed" — a dead query can never masquerade
    // as a fast one.
    // 7 reps (6 warm): round-4's min-of-4 still showed ±0.3 s phantom
    // swings on this box (spread field); two more warm runs tighten the
    // min at ~25 s extra wall per bench run. Reps run CONSECUTIVELY per
    // query on purpose: an interleaved round-robin protocol was measured
    // 70% slower end-to-end (5.42 vs 3.21 s back-to-back) — consecutive
    // repeats keep each plan's codegen/JIT hot, which also matches the
    // reference's published repeat-measurement methodology.
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS")
      .flatMap(_.toIntOption).getOrElse(7).max(2)
    val results = headline.filter(SparkEntry.queries.contains).map { name =>
      val fn = SparkEntry.queries(name)
      def once(): (Double, Boolean) = {
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val (cold, coldOk) = once()
      // a query broken on its cold run stays broken — don't burn reps on it
      val warm = if (coldOk) Seq.fill(reps - 1)(once()) else Seq((cold, false))
      val failed = !coldOk || warm.exists(!_._2)
      val warmTimes = warm.map(_._1)
      (name, warmTimes.min, warmTimes.max - warmTimes.min, cold, failed, warmTimes)
    }
    def jmap(f: ((String, Double, Double, Double, Boolean, Seq[Double])) => String) =
      results.map(f).mkString("{", ",", "}")
    val qs = jmap { case (k, v, _, _, _, _) => "\"" + k + "\":" + f"$v%.3f" }
    val spread = jmap { case (k, _, s, _, _, _) => "\"" + k + "\":" + f"$s%.3f" }
    val repsJson = jmap { case (k, _, _, _, _, ws) =>
      "\"" + k + "\":" + ws.map(w => f"$w%.3f").mkString("[", ",", "]") }
    val failedList = results.filter(_._5).map("\"" + _._1 + "\"")
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val coldTotal = results.map(_._4).sum
    val endLoad = loadavg()
    // Contention self-diagnosis. Three independent witnesses:
    //  (a) the box was already busy when the bench started (1-min loadavg
    //      over a quarter of the worker threads before WE did anything);
    //  (b) warm-rep spreads far beyond this workload's measured noise
    //      floor (clean-box spreads stay under ~0.1 s; the round-5
    //      contaminated run showed ~1 s) on more than one query — one
    //      outlier can be a stray GC, a pattern is another tenant;
    //  (c) ONE query whose spread dwarfs its own min (> 3×): round 6's
    //      actual failure mode — q_minhash_lsh warm reps of 4.84 s
    //      against a 0.80 s min passed contended=false because only one
    //      query was hit. A 4× swing on a sub-second query is not GC
    //      (measured: max pause 57 ms on this workload) — it is an
    //      interference burst shorter than the loadavg resolution, and
    //      the min-of-reps it anchors deserves the asterisk.
    // A contended run still prints, but carries its own disqualification.
    val noisyResults = results.filter(r => noisyWitness(r._2, r._3))
    val noisy = noisyResults.map("\"" + _._1 + "\"")
    val contended = startLoad.head > cpus.toDouble / 4 || noisy.size >= 2 ||
      results.exists(r => extremeWitness(r._2, r._3))
    // consumers scanning only the headline numbers still see the flag:
    // warn loudly on stderr, never silently anchor a ratio on a noisy min
    if (noisy.nonEmpty) System.err.println(
      s"[bench] WARNING: noisy queries (warm spread > 0.3 s absolute, or " +
        s"> 3x the query's own min) — their min times carry an asterisk: " +
        noisyResults.map(_._1).mkString(", "))
    if (contended) System.err.println(
      "[bench] WARNING: contended=true — this run is self-disqualified; " +
        "re-run on an idle box before recording its numbers")
    val loadJson = (startLoad ++ endLoad).map(v => f"$v%.2f")
      .mkString("[", ",", "]")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"spread":$spread,"rep_times":$repsJson,"failed":$failedList,"reps":$reps,"load_sec":$loadSec%.3f,"cold_sec":$coldTotal%.3f,"loadavg_start_end":$loadJson,"contended":$contended,"noisy":${noisy.mkString("[", ",", "]")},"sf":"$sfDir"}""")
    spark.stop()
  }
}
