package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main. Runs the headline workloads (the BASELINE.md shapes:
  * VWAP per key, filtered count, multi-key hash agg, grid/window aggs,
  * top-k, as-of join, TPC-H Q1, plus the training-pipeline ops) on
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Each query is materialized with a noop write — `count()` would let
  * Catalyst prune every computed column and undercount the real work.
  *
  * SELF-HEALING: the contention retry loop lives HERE, in the JVM the
  * driver actually invokes — not only in the tools/run_bench.sh wrapper
  * (rounds 7 and 8 both archived contended, self-disqualified records
  * because the driver calls `graft.Bench` directly and bypassed the
  * wrapper's retry). Each attempt first waits (bounded) for the box to go
  * idle, then measures; a contended or noisy attempt is retried up to
  * SPARK_GRAFT_BENCH_ATTEMPTS times, and if every attempt is dirty the
  * LAST record is emitted with `no_clean_run: true` spliced into the same
  * JSON object — the disqualification travels with the record even when
  * stderr and exit codes are lost. Failed queries short-circuit the loop
  * (retrying cannot fix broken code; a dead query must never masquerade
  * as a fast one).
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
    "q_get",         // TABLE_get: ts-range scan (prunability regression canary)
    "q_asof",        // as-of alignment join (union+window form)
    "q_asof_exec",   // same shape on the custom merge operator (graft.plans)
    "q_asof_bucketed", // the flagship 100 TB plan: zero-Exchange bucketed as-of
    "q_join",        // relational join path
    "q_ema",         // recursive indicator scan
    "q_dedup_exact", // content-hash dedup
    "q_minhash_lsh", // near-dup candidates
    "q_knn",         // embedding similarity
    "q_lang_id",     // text classification scan
    "q_tumbling")    // event-time bucket agg

  /** One query's measurement: min/spread over the warm reps, the attempt's
    * first (cold) run, and whether any rep threw.
    */
  private[graft] case class QRes(name: String, minT: Double, spread: Double,
                                 cold: Double, failed: Boolean, warm: Seq[Double])

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

  /** Contention self-diagnosis over one attempt. Three independent
    * witnesses:
    *  (a) `boxBusy`: this attempt's idle wait NEVER OBSERVED an idle box —
    *      the wait's outcome, not a loadavg snapshot, is the witness,
    *      because a raw attempt-start sample cannot be attributed (it is
    *      dominated by the previous attempt's own 32-thread measurement
    *      residue, so retries would self-poison), while a one-shot
    *      pre-bench snapshot goes stale in BOTH directions (a tenant
    *      leaving after start burns every retry; one arriving later is
    *      invisible). Observed-idle immediately before measuring means
    *      everything — ours and theirs — had drained;
    *  (b) warm-rep spreads far beyond the measured noise floor on MORE
    *      than one query — one outlier can be a stray GC, a pattern is
    *      another tenant;
    *  (c) ONE query whose spread is both large and dwarfs its own min
    *      (extremeWitness) — round 6's actual failure mode.
    * A steady co-tenant that slows every query uniformly WITHOUT spread
    * is detectable only by (a)'s failed idle wait — loadavg sampled
    * mid-run cannot separate tenant load from our own.
    */
  private[graft] def contendedRun(boxBusy: Boolean,
                                  results: Seq[QRes]): Boolean = {
    val noisyCount = results.count(r => noisyWitness(r.minT, r.spread))
    boxBusy || noisyCount >= 2 ||
      results.exists(r => extremeWitness(r.minT, r.spread))
  }

  /** Bounded wait for an idle box: poll `load` until it drops below
    * `threshold` or `maxWaitSec` elapses. Returns whether idle was
    * reached — a timeout still proceeds (the run self-detects contention),
    * it just doesn't wait forever on a permanently-busy machine.
    */
  private[graft] def waitForIdle(load: () => Double, threshold: Double,
                                 maxWaitSec: Int, sleepMs: Long = 10000L,
                                 log: String => Unit = System.err.println): Boolean = {
    var waitedMs = 0L
    var l = load()
    while (l >= threshold) {
      if (waitedMs >= maxWaitSec * 1000L) {
        log(f"[bench] loadavg still $l%.2f after ${waitedMs / 1000}s — " +
          "running anyway (the record self-detects contention)")
        return false
      }
      log(f"[bench] box busy (loadavg $l%.2f >= $threshold%.1f) — waiting " +
        f"for idle (${waitedMs / 1000}/${maxWaitSec}s)")
      Thread.sleep(sleepMs)
      waitedMs += sleepMs
      l = load()
    }
    true
  }

  /** The one-line JSON record. `noCleanRun` (set when every attempt was
    * dirty) splices `"no_clean_run":true` plus the attempt count into the
    * SAME object, so a consumer that archives the JSON unconditionally
    * still carries the disqualification.
    */
  private[graft] def renderJson(results: Seq[QRes], reps: Int, loadSec: Double,
                                startLoad: Seq[Double], endLoad: Seq[Double],
                                contended: Boolean, noisy: Seq[String],
                                sfDir: String, attempt: Int,
                                noCleanRun: Option[Int]): String = {
    def jmap(f: QRes => String) = results.map(f).mkString("{", ",", "}")
    val qs = jmap(r => "\"" + r.name + "\":" + f"${r.minT}%.3f")
    val spread = jmap(r => "\"" + r.name + "\":" + f"${r.spread}%.3f")
    val repsJson = jmap(r =>
      "\"" + r.name + "\":" + r.warm.map(w => f"$w%.3f").mkString("[", ",", "]"))
    val failedList = results.filter(_.failed).map("\"" + _.name + "\"")
      .mkString("[", ",", "]")
    val total = results.map(_.minT).sum
    val coldTotal = results.map(_.cold).sum
    val loadJson = (startLoad ++ endLoad).map(v => f"$v%.2f")
      .mkString("[", ",", "]")
    val marker = noCleanRun
      .map(a => s""","no_clean_run":true,"attempts":$a""").getOrElse("")
    f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"spread":$spread,"rep_times":$repsJson,"failed":$failedList,"reps":$reps,"attempt":$attempt,"load_sec":$loadSec%.3f,"cold_sec":$coldTotal%.3f,"loadavg_start_end":$loadJson,"contended":$contended,"noisy":${noisy.map("\"" + _ + "\"").mkString("[", ",", "]")},"sf":"$sfDir"$marker}"""
  }

  /** One measurement attempt over the headline set. N runs per query
    * (default 7, 6 warm), min of the warm runs reported: run 1 pays
    * one-time codegen compilation (~0.5-1 s per distinct plan), which the
    * reference's published numbers exclude (they are post-load,
    * repeat-measured — BASELINE.md row 9 quotes the "repeat" time).
    * cold_sec keeps the first-run total visible (attempts after the first
    * are warm throughout — their "cold" is informational only); "spread"
    * (max-min over warm runs) exposes the per-query noise floor, and a
    * query that throws is recorded in "failed". Reps run CONSECUTIVELY per
    * query on purpose: an interleaved round-robin protocol was measured
    * 70% slower end-to-end (5.42 vs 3.21 s back-to-back) — consecutive
    * repeats keep each plan's codegen/JIT hot, which also matches the
    * reference's published repeat-measurement methodology.
    */
  private def measure(spark: SparkSession, sfDir: String, reps: Int): Seq[QRes] =
    headline.filter(SparkEntry.queries.contains).map { name =>
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
      QRes(name, warmTimes.min, warmTimes.max - warmTimes.min, cold, failed, warmTimes)
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS")
      .flatMap(_.toIntOption).getOrElse(7).max(2)
    val attempts = sys.env.get("SPARK_GRAFT_BENCH_ATTEMPTS")
      .flatMap(_.toIntOption).getOrElse(3).max(1)
    // bounded so the WORST case (a persistently busy box: full wait before
    // the load phase and before every retry, all attempts dirty) adds at
    // most ~(attempts+1)×3 min of waiting on top of ~3 one-minute
    // measurement passes — a harness with a coarse timeout still gets its
    // record (self-disqualified beats absent)
    val idleWaitSec = sys.env.get("SPARK_GRAFT_BENCH_IDLE_WAIT")
      .flatMap(_.toIntOption).getOrElse(180).max(0)
    val idleLoad = sys.env.get("SPARK_GRAFT_BENCH_IDLE_LOAD")
      .flatMap(_.toDoubleOption).getOrElse(1.0)
    // witness (a)'s evidence is each attempt's idle-wait OUTCOME (see
    // contendedRun). The strict pre-bench wait runs before the load phase
    // so attempt 1 measures a box that was observed idle before WE did
    // any work; retries re-wait with a RELAXED threshold (cpus/4 — the
    // busy-box bar) so our own just-finished attempt's decaying loadavg
    // residue doesn't stall or falsely flag them.
    val idleReachedPre = waitForIdle(() => loadavg().head, idleLoad, idleWaitSec)
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
    // as load_sec. Runs ONCE — the contention retry loop below re-measures
    // only; a dirty attempt doesn't re-pay the load.
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

    // The attempt loop: wait-for-idle, measure, classify; retry dirty
    // attempts, short-circuit on clean records and on failed queries.
    var attempt = 1
    var emitted = false
    var lastDirty: Option[String] = None
    while (attempt <= attempts && !emitted) {
      // attempt 1 rides the strict pre-load wait; retries re-check with
      // the busy-box threshold (our own residue decays under it fast)
      val idleReached =
        if (attempt == 1) idleReachedPre
        else waitForIdle(() => loadavg().head,
          math.max(idleLoad, cpus.toInt / 4.0), idleWaitSec)
      val startLoad = loadavg()
      val results = measure(spark, sfDir, reps)
      val endLoad = loadavg()
      val noisyResults = results.filter(r => noisyWitness(r.minT, r.spread))
      val noisy = noisyResults.map(_.name)
      val contended = contendedRun(boxBusy = !idleReached, results)
      val anyFailed = results.exists(_.failed)
      if (noisy.nonEmpty) System.err.println(
        s"[bench] WARNING: noisy queries (warm spread > 0.3 s absolute, or " +
          s"> 3x the query's own min) — their min times carry an asterisk: " +
          noisy.mkString(", "))
      if (anyFailed || (!contended && noisy.isEmpty)) {
        // clean — archive it; or broken queries — retrying cannot fix code
        println(renderJson(results, reps, loadSec, startLoad, endLoad,
          contended, noisy, sfDir, attempt, noCleanRun = None))
        emitted = true
      } else {
        System.err.println(
          s"[bench] attempt $attempt/$attempts dirty (contended=$contended, " +
            s"noisy=[${noisy.mkString(", ")}]) — " +
            (if (attempt < attempts) "retrying" else "no clean run"))
        lastDirty = Some(renderJson(results, reps, loadSec, startLoad, endLoad,
          contended, noisy, sfDir, attempt, noCleanRun = Some(attempts)))
        attempt += 1
      }
    }
    // every attempt was dirty: emit the LAST record, self-disqualified in
    // the JSON itself — never a bare contended record that reads as a
    // phantom regression
    if (!emitted) {
      System.err.println(
        s"[bench] WARNING: no clean run in $attempts attempts — the record " +
          "carries no_clean_run=true; do not read its totals as a regression")
      lastDirty.foreach(println)
    }
    spark.stop()
  }
}
