package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming variants of the batch operators (SURVEY.md §2.9).
  *
  * The reference has no streaming engine; its streaming story is append-only
  * ingestion in timestamp order via insert triggers (imcs.c:4617-4740) plus
  * length-preserving incremental operators. The Spark-native equivalent is
  * Structured Streaming: the SAME aggregation expressions as the batch path
  * run under `readStream`, with a watermark bounding state. Batch operators
  * stay the single source of semantics — the specs assert stream == batch
  * on the same input (Trigger.AvailableNow = "process everything now").
  *
  * At 100 TB/day this topology is the ingest pipeline: file-source streaming
  * reads land batches incrementally, the tumbling aggregation maintains one
  * row of state per (key, window) bounded by the watermark, and the sink is
  * an append of finalized windows.
  */
object Streams {

  /** int64-ns ts → µs event-time timestamp. INTEGER division: `/` on
    * longs is true (double) division in Spark, and ts ~1.7e18 exceeds the
    * double mantissa — a 1 µs rounding slip can move an event across a
    * window/session boundary.
    */
  private def etsCol = timestamp_micros(expr("ts div 1000"))

  /** Tumbling event-time aggregation over a parquet directory as a stream —
    * the streaming twin of SparkEntry's q_tumbling (grid agg over time).
    * `ts` is int64 epoch nanoseconds (TESTDATA events encoding).
    *
    * Returns the streaming DataFrame; run with [[runAvailableNow]].
    */
  def tumblingAgg(spark: SparkSession, path: String, schema: StructType,
                  bucketSeconds: Long = 3600): DataFrame = {
    streamSource(spark, path, schema)
      .groupBy(col("event_type"), window(col("ets"), s"$bucketSeconds seconds"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
      .select(col("event_type"),
        col("window.start").as("bucket_start"),
        col("n"), col("sv"))
  }

  /** Watermarked event-time stream over a parquet directory — the one
    * source block every streaming operator here shares (ns ts → µs event
    * time, 1 h watermark).
    */
  private def streamSource(spark: SparkSession, path: String,
                           schema: StructType): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(schema).parquet(path)
      .withColumn("ets", etsCol)
      .withWatermark("ets", "1 hour")
  }

  /** One windowed-sketch aggregation shape for all twelve public
    * variants: group by (event_type, `win`), fold ONE mergeable sketch
    * per group (KB-scale state regardless of event volume — the property
    * that makes stream-time cardinality/percentiles viable at 100 TB/day
    * ingest), emit the window/session start + the estimate.
    */
  private def winAgg(withEts: DataFrame, win: Column, startField: String,
                     outStart: String, agg: (Column, String)): DataFrame =
    withEts.groupBy(col("event_type"), win)
      .agg(agg._1.as(agg._2))
      .select(col("event_type"), col(startField).as(outStart), col(agg._2))

  private def hllEst(keyCol: String, lgK: Int): (Column, String) =
    (hll_sketch_estimate(hll_sketch_agg(col(keyCol), lit(lgK))), "approx_users")

  private def kllQuantile(valueCol: String, q: Double): (Column, String) = {
    require(q >= 0.0 && q <= 1.0,
      s"quantile rank must be in [0, 1], got $q")
    (expr(s"kll_sketch_get_quantile_double(kll_sketch_agg_double(`$valueCol`), $q)"),
      "approx_q")
  }

  private def tumbling(sec: Long): Column =
    window(col("ets"), s"$sec seconds")
  private def sliding(winSec: Long, slideSec: Long): Column = {
    require(slideSec > 0,
      s"slideSeconds must be positive, got $slideSec — a zero slide would " +
        "silently degrade to tumbling windows")
    window(col("ets"), s"$winSec seconds", s"$slideSec seconds")
  }
  private def session(gapSec: Long): Column =
    session_window(col("ets"), s"$gapSec seconds")

  /** Windowed approximate-distinct at stream time — unique users per
    * event-time bucket via the same mergeable HLL sketch the batch rollup
    * uses ([[graft.agg.Aggs.sketchRollup]]): per-window state is ONE
    * sketch (KB), not the user set. Watermark bounds how long a window's
    * sketch stays open.
    */
  def tumblingApproxDistinct(spark: SparkSession, path: String, schema: StructType,
                             keyCol: String, bucketSeconds: Long = 3600,
                             lgK: Int = 12): DataFrame =
    winAgg(streamSource(spark, path, schema), tumbling(bucketSeconds),
      "window.start", "bucket_start", hllEst(keyCol, lgK))

  /** Batch twin of [[tumblingApproxDistinct]] for stream==batch asserts —
    * the SAME aggregation applied to a batch frame, so the spec compares
    * one definition against itself across execution modes.
    */
  def tumblingApproxDistinctBatch(df: DataFrame, keyCol: String,
                                  bucketSeconds: Long = 3600,
                                  lgK: Int = 12): DataFrame =
    winAgg(df.withColumn("ets", etsCol), tumbling(bucketSeconds),
      "window.start", "bucket_start", hllEst(keyCol, lgK))

  /** Sliding-window approximate-distinct — "uniques in the last hour,
    * updated every `slideSeconds`", the live-dashboard shape: each event
    * folds into window/slide overlapping windows, each window still one
    * KB-scale sketch. Watermark bounds the number of open windows.
    */
  def slidingApproxDistinct(spark: SparkSession, path: String, schema: StructType,
                            keyCol: String, windowSeconds: Long,
                            slideSeconds: Long, lgK: Int = 12): DataFrame =
    winAgg(streamSource(spark, path, schema), sliding(windowSeconds, slideSeconds),
      "window.start", "bucket_start", hllEst(keyCol, lgK))

  /** Batch twin of [[slidingApproxDistinct]]. */
  def slidingApproxDistinctBatch(df: DataFrame, keyCol: String,
                                 windowSeconds: Long, slideSeconds: Long,
                                 lgK: Int = 12): DataFrame =
    winAgg(df.withColumn("ets", etsCol), sliding(windowSeconds, slideSeconds),
      "window.start", "bucket_start", hllEst(keyCol, lgK))

  /** Session-window approximate-distinct — uniques per activity burst
    * (gap-separated session, the reference has no analog): one HLL sketch
    * per open session, sessions close `gapSeconds` after the last event
    * (watermark-bounded). Output keys on the session START.
    */
  def sessionApproxDistinct(spark: SparkSession, path: String, schema: StructType,
                            keyCol: String, gapSeconds: Long,
                            lgK: Int = 12): DataFrame =
    winAgg(streamSource(spark, path, schema), session(gapSeconds),
      "session_window.start", "session_start", hllEst(keyCol, lgK))

  /** Batch twin of [[sessionApproxDistinct]]. */
  def sessionApproxDistinctBatch(df: DataFrame, keyCol: String,
                                 gapSeconds: Long, lgK: Int = 12): DataFrame =
    winAgg(df.withColumn("ets", etsCol), session(gapSeconds),
      "session_window.start", "session_start", hllEst(keyCol, lgK))

  /** Windowed approximate percentile at stream time — the KLL twin of
    * [[tumblingApproxDistinct]]: per-window state is one quantile sketch
    * (not the value multiset), so a p99-latency-per-window stream costs
    * KB of state per open window regardless of event volume.
    */
  def tumblingApproxQuantile(spark: SparkSession, path: String, schema: StructType,
                             valueCol: String, q: Double,
                             bucketSeconds: Long = 3600): DataFrame =
    winAgg(streamSource(spark, path, schema), tumbling(bucketSeconds),
      "window.start", "bucket_start", kllQuantile(valueCol, q))

  /** Batch twin of [[tumblingApproxQuantile]]. */
  def tumblingApproxQuantileBatch(df: DataFrame, valueCol: String, q: Double,
                                  bucketSeconds: Long = 3600): DataFrame =
    winAgg(df.withColumn("ets", etsCol), tumbling(bucketSeconds),
      "window.start", "bucket_start", kllQuantile(valueCol, q))

  /** Sliding-window approximate percentile — "p99 over the last hour,
    * updated every `slideSeconds`": the KLL twin of
    * [[slidingApproxDistinct]], KB of state per open window.
    */
  def slidingApproxQuantile(spark: SparkSession, path: String, schema: StructType,
                            valueCol: String, q: Double, windowSeconds: Long,
                            slideSeconds: Long): DataFrame =
    winAgg(streamSource(spark, path, schema), sliding(windowSeconds, slideSeconds),
      "window.start", "bucket_start", kllQuantile(valueCol, q))

  /** Batch twin of [[slidingApproxQuantile]]. */
  def slidingApproxQuantileBatch(df: DataFrame, valueCol: String, q: Double,
                                 windowSeconds: Long,
                                 slideSeconds: Long): DataFrame =
    winAgg(df.withColumn("ets", etsCol), sliding(windowSeconds, slideSeconds),
      "window.start", "bucket_start", kllQuantile(valueCol, q))

  /** Session-window approximate percentile — p99 per activity burst:
    * the KLL twin of [[sessionApproxDistinct]], one quantile sketch per
    * open session.
    */
  def sessionApproxQuantile(spark: SparkSession, path: String, schema: StructType,
                            valueCol: String, q: Double,
                            gapSeconds: Long): DataFrame =
    winAgg(streamSource(spark, path, schema), session(gapSeconds),
      "session_window.start", "session_start", kllQuantile(valueCol, q))

  /** Batch twin of [[sessionApproxQuantile]]. */
  def sessionApproxQuantileBatch(df: DataFrame, valueCol: String, q: Double,
                                 gapSeconds: Long): DataFrame =
    winAgg(df.withColumn("ets", etsCol), session(gapSeconds),
      "session_window.start", "session_start", kllQuantile(valueCol, q))

  /** Sliding event-time aggregation — the streaming twin of the reference's
    * length-preserving moving aggregates (§2.5 re-expressed on event time):
    * each event contributes to window/slide overlapping windows, state
    * bounded by the watermark.
    */
  def slidingAgg(spark: SparkSession, path: String, schema: StructType,
                 windowSeconds: Long, slideSeconds: Long): DataFrame = {
    streamSource(spark, path, schema)
      .groupBy(col("event_type"), sliding(windowSeconds, slideSeconds))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
      .select(col("event_type"),
        col("window.start").as("bucket_start"),
        col("n"), col("sv"))
  }

  /** Gap-based session windows on event time — the streaming form of
    * sessionization (q_sessionize's shape): `session_window` merges events
    * whose gap is under `gapSeconds`, state per open session bounded by
    * the watermark. The same expression runs identically in batch mode,
    * which is what the spec asserts (stream == batch on one input).
    */
  def sessionAgg(spark: SparkSession, path: String, schema: StructType,
                 gapSeconds: Long): DataFrame =
    sessionExpr(streamSource(spark, path, schema), gapSeconds)

  /** Batch twin of [[sessionAgg]] for equivalence testing — the SAME
    * aggregation body via [[sessionExpr]], so the stream==batch spec
    * asserts a structural identity, not two parallel copies.
    */
  def sessionAggBatch(df: DataFrame, gapSeconds: Long): DataFrame =
    sessionExpr(df.withColumn("ets", etsCol), gapSeconds)

  private def sessionExpr(withEts: DataFrame, gapSeconds: Long): DataFrame =
    withEts
      .groupBy(col("user_id"), session_window(col("ets"), s"$gapSeconds seconds"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("n"), col("sv"))

  /** Streaming exact dedup at ingest: fingerprint the normalized text and
    * drop duplicate fingerprints across the whole stream — the
    * streaming form of Dedup.exactDedup, state one 8-byte key per
    * distinct document. With an event-time column, production pipelines
    * bound that state via [[dedupStreamWithinWatermark]]; the documents
    * table has no timestamp, so this variant keeps global state (the
    * reference's in-memory store makes the same tradeoff).
    */
  def dedupStream(spark: SparkSession, path: String, schema: StructType,
                  textCol: String): DataFrame =
    spark.readStream.schema(schema).parquet(path)
      .withColumn("fp", graft.text.TextOps.fingerprint(col(textCol)))
      .dropDuplicates("fp")

  /** Watermark-bounded streaming dedup — the production form for an
    * unbounded ingest: duplicates arriving within `delay` of the
    * watermark are dropped, and fingerprint state older than the
    * watermark is EVICTED, so state is O(docs per delay window) instead
    * of O(all docs ever). The trade is explicit: a duplicate arriving
    * later than `delay` after its original is treated as new — the
    * standard watermark contract, and the reason the unbounded
    * [[dedupStream]] variant still exists for bounded backfills.
    *
    * `tsCol` is an int64-ns event-time column (TESTDATA events encoding).
    */
  def dedupStreamWithinWatermark(spark: SparkSession, path: String,
                                 schema: StructType, textCol: String,
                                 tsCol: String, delay: String = "1 hour"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(schema).parquet(path)
      .withColumn("fp", graft.text.TextOps.fingerprint(col(textCol)))
      .withColumn("ets", timestamp_micros(expr(s"`$tsCol` div 1000")))
      .withWatermark("ets", delay)
      .dropDuplicatesWithinWatermark("fp")
  }

  /** Watermarked stream-stream interval join — the streaming twin of
    * [[graft.join.Align.rangeJoin]]'s q_range_join shape: purchases on one
    * stream match signups on the other when they fall inside
    * [signup ts, signup ts + windowSeconds] for the same user. A
    * stream-stream inner join with a time-range condition is the canonical
    * Structured Streaming topology for event correlation at ingest scale:
    * BOTH sides' buffered state is bounded by watermark + range span, and
    * matches emit in Append mode as soon as both rows have arrived.
    */
  def intervalJoinStream(spark: SparkSession, path: String, schema: StructType,
                         windowSeconds: Long, delay: String = "1 hour"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def src = spark.readStream.schema(schema).parquet(path).withColumn("ets", etsCol)
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ets").as("p_ets"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ets", delay)
    val signups = src.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ets").as("s_ets"),
        col("event_id").as("signup_id"))
      .withWatermark("s_ets", delay)
    purchases.join(signups,
      col("p_user") === col("s_user") &&
        col("p_ets") >= col("s_ets") &&
        col("p_ets") <= col("s_ets") + expr(s"INTERVAL $windowSeconds SECONDS"))
      .select(col("signup_id"), col("purchase_id"))
  }

  /** Drain a streaming aggregation with Trigger.AvailableNow into an
    * in-memory table and return it as a batch DataFrame. Complete mode so
    * the final (still-open) windows are emitted too — the batch comparison
    * covers the whole input, not only watermark-closed windows.
    */
  def runAvailableNow(df: DataFrame, queryName: String,
                      mode: OutputMode = OutputMode.Complete()): DataFrame = {
    val q = df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    df.sparkSession.table(queryName)
  }

  /** Drain a streaming aggregation with Trigger.AvailableNow through a
    * REAL sink: foreachBatch writing parquet. Unlike the memory sink the
    * specs use, this exercises the full production commit path — offset
    * tracking, checkpointing, batch-id delivery, and an on-disk artifact
    * a downstream (or an external oracle) can read back. Complete-mode
    * aggregations re-emit the whole result every micro-batch, so each
    * batch OVERWRITES the target atomically-per-batch; the final batch
    * leaves the complete result on disk. At 100 TB/day this exact
    * topology is the ingest pipeline's landing step (append mode +
    * partitioned target instead of overwrite).
    */
  def runToParquet(df: DataFrame, outDir: String, checkpoint: String,
                   mode: OutputMode = OutputMode.Complete()): DataFrame = {
    val spark = df.sparkSession
    // the per-batch write mode must FOLLOW the output mode: Complete
    // re-emits the whole result (overwrite leaves the final state), but
    // Append delivers only each batch's new rows — overwriting there
    // would silently keep just the LAST micro-batch
    val writeMode = if (mode == OutputMode.Complete()) "overwrite" else "append"
    // Append mode accumulates batches into outDir, so a FRESH checkpoint
    // (no offsets yet — batch numbering restarts at 0) pointed at a STALE
    // outDir from a previous run would silently re-append every row on
    // top of the old artifact. Refuse loudly: a restart of the SAME run
    // (checkpoint has offsets) may of course keep appending.
    if (writeMode == "append") {
      val hc = spark.sparkContext.hadoopConfiguration
      val ckOffsets = new org.apache.hadoop.fs.Path(checkpoint, "offsets")
      val out = new org.apache.hadoop.fs.Path(outDir)
      val freshCheckpoint = !ckOffsets.getFileSystem(hc).exists(ckOffsets)
      val staleOut = {
        val fs = out.getFileSystem(hc)
        fs.exists(out) && fs.listStatus(out).nonEmpty
      }
      if (freshCheckpoint && staleOut) throw new IllegalStateException(
        s"runToParquet(Append): checkpoint '$checkpoint' is fresh but output " +
          s"'$outDir' already has content from a previous run — appending " +
          "would silently duplicate it. Use a fresh outDir (or the previous " +
          "run's checkpoint to continue it).")
    }
    val q = df.writeStream
      .outputMode(mode)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        batch.write.mode(writeMode).parquet(outDir)
        ()
      }
      .start()
    q.awaitTermination()
    // zero micro-batches (empty source, or a restart with nothing new and
    // nothing previously written) leaves no target dir — an empty frame
    // of the query's schema, not a path-not-found crash
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    val fs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(outPath))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], df.schema)
    else spark.read.parquet(outDir)
  }

  /** Bounded lease-contention retry for streaming foreachBatch bodies.
    * The writer lease FAILS LOUDLY on contention rather than queueing
    * (Tables.withWriterLease) — correct for one-shot lifecycle calls,
    * but inside a live stream a collision with a maintenance op (a fold
    * or bloom rebuild run "while the stream is live", USER_GUIDE) would
    * otherwise terminate the whole streaming query over a transient
    * conflict (ADVICE r15 #3). Every ingest batch body is
    * replay-idempotent (the exactly-once commit log skips the parts
    * that already landed), so re-running the WHOLE body after a backoff
    * is safe; leases that stay contended past the budget still fail the
    * query — an operator signal, with restart-as-replay the documented
    * recovery. Tunables: graft.lease.retry.max (default 8 attempts),
    * graft.lease.retry.backoff.ms (base, default 250 — doubled per
    * attempt, capped at 10 s).
    */
  private def retryingLease[T](what: String)(body: => T): T = {
    val max = sys.props.get("graft.lease.retry.max")
      .flatMap(_.toIntOption).getOrElse(8)
    val base = sys.props.get("graft.lease.retry.backoff.ms")
      .flatMap(_.toLongOption).getOrElse(250L)
    var attempt = 0
    while (true) {
      try return body
      catch {
        // keyed on the TYPE, not message substrings: every contention
        // outcome of withWriterLease (held, race lost, took-over
        // mid-confirm, break race lost, taken mid-break) throws
        // LeaseContentionException — a substring match missed the
        // break-race variants and let a transient conflict kill the
        // streaming query (review r15)
        case _: graft.io.LeaseContentionException if attempt < max =>
          attempt += 1
          val sleep = math.min(base << math.min(attempt - 1, 6), 10000L)
          System.err.println(s"[graft-ingest] $what: lease contention " +
            s"(attempt $attempt/$max), retrying in ${sleep}ms")
          Thread.sleep(sleep)
      }
    }
    sys.error("unreachable")
  }

  /** Continuous ingest INTO a managed clustered layout — the reference's
    * insert-trigger path (imcs.c:4617-4740) as Structured Streaming: each
    * micro-batch lands through [[graft.io.Tables.appendStreamBatch]],
    * which holds the writer lease, enforces the ordered-ingest contract,
    * extends the ts manifest (bootstrapping it on the first batch), and
    * commits the batch id so a checkpoint-recovery replay is skipped —
    * exactly-once into the table, with the same lifecycle guarantees a
    * batch [[graft.io.Tables.append]] makes. The ordered-ingest contract
    * is PER-BATCH: each micro-batch's min(ts) must be ≥ the stored tail
    * (violations fail the query loudly, the reference's trigger
    * semantics); WITHIN a batch rows may arrive unordered — the append
    * clusters them by ts at write, so file-level pruning stays tight. The checkpoint location is
    * the stream's commit-log identity; reuse it to continue a run, use a
    * fresh one (against a fresh table) to start over.
    *
    * At 100 TB/day this is the landing topology: file/queue source →
    * (optional transforms) → ingestAppend; downstream readers range-scan
    * the manifest-governed table while compactIncremental folds batches
    * under the same lease.
    */
  def ingestAppend(df: DataFrame, path: String, ts: String, checkpoint: String,
                   trigger: Trigger = Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        retryingLease("ingestAppend") {
          graft.io.Tables.appendStreamBatch(batch.toDF(), path, ts,
            streamId = checkpoint, batchId = batchId)
        }
        ()
      }
      .start()

  /** [[ingestAppend]] plus the reference's streaming-RETENTION pattern
    * (user_guide.html's rolling-window head deletion): after every
    * `every`-th committed batch, rows older than `retainNs` behind the
    * stored tail are dropped through [[graft.io.Tables.deleteRangeNs]].
    * With the r13 manifest split the delete is O(EXPIRING FILES) — the
    * in-window files carry untouched, so a rolling window costs metadata
    * plus exactly the expiring head, never a table rewrite; runs inside
    * the same single-writer regime as the ingest (the foreachBatch body
    * is sequential; deleteRange re-enters nothing and takes the lease
    * between batches). The cut comes from the MANIFEST's file stats
    * (metadata-only, zero data bytes); a stat-less layout skips
    * retention that round rather than scan — the next fold restores
    * stats. Retention is idempotent across checkpoint replays (a
    * replayed delete finds nothing in range).
    */
  def ingestAppendRetained(df: DataFrame, path: String, ts: String,
                           checkpoint: String, retainNs: Long,
                           every: Int = 1,
                           trigger: Trigger = Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        retryingLease("ingestAppendRetained") {
          graft.io.Tables.appendStreamBatch(batch.toDF(), path, ts,
            streamId = checkpoint, batchId = batchId)
          // the beat keys on the BATCH ID alone, never on whether THIS
          // call applied the append: a lease-contention retry (and a
          // checkpoint replay) re-enters with the append already
          // committed, and gating on "applied" would silently skip the
          // retention the retry exists to re-attempt (review r15 — the
          // dedup twins already key this way). Idempotent: a re-cut
          // range is empty.
          if (batchId % math.max(1, every) == 0)
            retentionCut(spark, path, retainNs).foreach(cut =>
              graft.io.Tables.deleteRangeNs(spark, path, ts,
                Long.MinValue, cut - 1)) // retain [cut, mx]: delete ≤ cut-1
        }
        ()
      }
      .start()

  /** The retention cut for `path` — max stored ts − retainNs, from
    * MANIFEST metadata alone — or None when nothing can have expired: no
    * manifest, stat-less files (the next fold restores stats), or an
    * overflowing subtraction. EXACT, not wrapping: mx − retainNs on a
    * pre-1970 table with a huge retainNs ("never expire") would wrap
    * POSITIVE and delete the whole table including the tail — overflow
    * means nothing can have expired, so retention skips (second r13
    * review pass, finding #3). Shared by [[ingestAppendRetained]] and
    * [[dedupRetentionBeat]] so the guards can never diverge.
    */
  private def retentionCut(spark: SparkSession, path: String,
                           retainNs: Long): Option[Long] =
    for {
      m <- graft.io.Tables.manifest(spark, path)
      if m.files.nonEmpty &&
        m.files.forall(e => e.minNs.isDefined && e.maxNs.isDefined)
      mx = m.files.flatMap(_.maxNs).max
      mn = m.files.flatMap(_.minNs).min
      cut <- scala.util.Try(Math.subtractExact(mx, retainNs)).toOption
      if mn < cut // something has actually expired
    } yield cut

  /** NEAR-DUP-FILTERED streaming ingest — dedup at LANDING, the shape a
    * training-data pipeline actually runs (drop near-duplicates as data
    * arrives, not in a later full-corpus pass): each micro-batch drops
    * documents whose MinHash LSH band buckets collide with any
    * previously-RETAINED document, resolves in-batch collisions by
    * connected components (keep the min id per cluster — deterministic),
    * then lands the survivors into `docPath` and their (id, band, bucket)
    * rows into `bucketPath`, both through the exactly-once commit-log
    * append. Semantics are retained-representative dedup (CCNet-style
    * keep-one): dropped docs contribute NO buckets, so a doc colliding
    * only with a dropped doc is judged against the retained
    * representative's buckets instead — every cluster keeps exactly one.
    *
    * Scale shape: the per-batch corpus check is the SUBLINEAR probe of
    * [[probeStoredBuckets]] — the batch's O(batch × bands) bucket set
    * broadcasts against a column-pruned, In-pushdown-filtered scan of the
    * bucket table with ZERO corpus-side Exchange; no corpus text is
    * re-read, no signatures recomputed. The bucket table grows with the
    * RETAINED corpus and folds like any managed table
    * (`Tables.compactIncremental(bucketPath, Seq("band","bucket"), ts)`
    * — each fold emits files range-clustered by (band, bucket) over that
    * fold's ts span, which is exactly what makes the probe's In filter
    * prune row groups AND keeps folded files ts-disjoint so the
    * retention beat carries them). `retainNs` bounds the table: every
    * `every`-th batch head-deletes the expired window from BOTH tables
    * ([[dedupRetentionBeat]]) so expired documents stop suppressing new
    * near-duplicates.
    *
    * Crash consistency: survivors are a pure function of the batch and
    * the PRE-batch bucket-table state. The doc append commits first; a
    * crash between the two appends replays the batch, recomputes the SAME
    * survivor set (the bucket table is unchanged), skips the committed
    * doc append, and applies the bucket append — exactly-once for both
    * tables whatever the interleave.
    */
  /** A collected ts VALUE as epoch-ns, for the candidate-window bounds of
    * the verified landing-dedup fetch — the dedup tables' ts column is
    * long epoch-ns by the engine convention, but the ingest accepts
    * TIMESTAMP/NTZ columns too (same contract as ingestAppendRetained).
    * None for shapes with no exact ns reading — the caller then skips
    * the slice and reads the full snapshot (degraded, never wrong).
    */
  /** Memoized bucket-table fp-layout answers, keyed by TABLE PATH alone,
    * holding (head file name, answer): data files are immutable and
    * uniquely named, so the answer for a given head never changes, and
    * any maintenance that rewrites the layout changes the head name —
    * the lookup then REPLACES the entry instead of accumulating one
    * Boolean per generation forever (ADVICE r16: the old "<path>#<head>"
    * keying grew with every fold/retention rewrite on a long-running
    * stream — a slow, unbounded driver leak).
    */
  private val fpLayoutCache = new java.util.concurrent.ConcurrentHashMap[
    String, (String, Option[org.apache.spark.sql.types.StructType])]()

  /** The bucket table's live-generation SCHEMA, memoized like the fp
    * answer (one footer read per (table, head generation)). r18: this is
    * also what lets the probe's pruned verify read pass an EXPLICIT
    * schema — `spark.read.parquet(files)` without one runs a distributed
    * schema-inference job (mergeSchemasInParallel), a whole Spark job per
    * micro-batch on the steady-state fp-tier path that reads a handful of
    * pruned files.
    */
  private def bucketHeadSchema(spark: SparkSession, bucketPath: String,
                               liveHead: Option[String])
      : Option[org.apache.spark.sql.types.StructType] =
    liveHead.flatMap { n =>
      Option(fpLayoutCache.get(bucketPath)).filter(_._1 == n).map(_._2)
        .getOrElse {
          val schema = scala.util.Try(spark.read.parquet(
            new org.apache.hadoop.fs.Path(bucketPath, n).toString)
            .schema).toOption
          fpLayoutCache.put(bucketPath, (n, schema))
          schema
        }
    }

  /** Does the bucket table's live generation carry the content-fingerprint
    * column (the verified landing paths' tier-1 shortcut)? Derived from
    * the memoized head schema — shared by the text and embedding twins
    * (both carry `fp`).
    */
  private def bucketHeadHasFp(spark: SparkSession, bucketPath: String,
                              liveHead: Option[String]): Boolean =
    bucketHeadSchema(spark, bucketPath, liveHead)
      .exists(_.fieldNames.contains("fp"))

  /** Whether a dedup ingest batch should WRITE the fp column: the
    * `graft.dedup.fp.enabled` prop governs only table CREATION — an
    * existing table always keeps ITS OWN layout (ADVICE r16 medium:
    * flipping the prop off over a table created WITH fp would append
    * 4-column files into a 5-column table, tearing the probe's schema).
    */
  private def shouldWriteFp(liveHead: Option[String], hasFp: Boolean): Boolean =
    if (liveHead.isEmpty)
      sys.props.get("graft.dedup.fp.enabled").forall(_ != "false")
    else hasFp

  private def tsValueNs(v: Any): Option[Long] = v match {
    case l: java.lang.Long => Some(l.longValue)
    case t: java.sql.Timestamp =>
      Some(Math.floorDiv(t.getTime, 1000L) * 1000000000L + t.getNanos)
    case i: java.time.Instant =>
      Some(i.getEpochSecond * 1000000000L + i.getNano)
    case ld: java.time.LocalDateTime =>
      val i = ld.toInstant(java.time.ZoneOffset.UTC)
      Some(i.getEpochSecond * 1000000000L + i.getNano)
    case _ => None
  }

  /** The stored-corpus PROBE shared by both landing-dedup variants — the
    * one per-batch operation whose cost must NOT grow with the retained
    * corpus (VERDICT r13's single scale-killer: the old shape scanned AND
    * shuffled the whole bucket table every micro-batch, because a
    * left_semi with the corpus on the right cannot broadcast). Three
    * mechanisms, composing:
    *
    *  1. BROADCAST FLIP — the batch's distinct (band, bucket) set (O(batch
    *     × bands) two-int rows, megabytes at any sane batch size) is the
    *     BROADCAST side; the corpus streams through a BroadcastHashJoin
    *     LeftSemi with ZERO Exchange — no shuffle of the stored table,
    *     ever. The emitted hit set is tiny (collisions only), so the
    *     join back to the batch broadcasts too.
    *  2. BLOOM SIDECAR + VERIFIED POSITIVES — the batch's distinct
    *     bucket values are checked against [[DedupBloom]]'s sidecar on
    *     the driver (microseconds per value, cached per sidecar
    *     version). The common case — a batch colliding with nothing —
    *     probes with ZERO scan (measured flat, 0.26→0.25 s across a
    *     ×1→×100 corpus, vs the r13 shape's 0.43→4.70 s). Bloom positives
    *     (real hits + a ~1% false-positive tail) become ONE In filter on
    *     the verify scan — Spark evaluates it as hash-set membership in
    *     codegen (InSet) and OFFERS it to the parquet source (it shows
    *     in PushedFilters); what parquet-mr actually receives depends on
    *     spark.sql.parquet.pushdown.inFilterThreshold (default 10): at
    *     or under the threshold an or()-chain of eq — which is LEFT-DEEP
    *     and overflows the task stack beyond ~1.5k values (measured:
    *     1024 fine, 1536 StackOverflowError; why Spark's default is 10)
    *     — and above it a min/max range predicate, harmless but useless
    *     for uniform 64-bit keys (row-group stats eliminate nothing;
    *     also measured — chunked pushed-In scans came out 5× SLOWER
    *     than the plain scan). The probe therefore GUARDS the or-chain
    *     zone: a positive set that is both >1024 values and ≤ the
    *     session's threshold (an operator raised the knob) skips the In
    *     and scans plainly instead of risking a task StackOverflowError
    *     (ADVICE r15 #2). Membership is decided by the real join, so
    *     bloom false positives cost I/O, never semantics; a positives
    *     flood past `graft.dedup.probe.isin.max` (8192 — a saturated
    *     sidecar, or a genuinely all-colliding batch) likewise drops the
    *     filter and scans plainly, still shuffle-free via (1). The bloom
    *     is what the reference's B-tree point lookups (btree.c:479-589)
    *     map to in a lakehouse layout.
    *  3. COLUMN PRUNING — the probe reads exactly the columns its caller
    *     asks for: (band, bucket) for the legacy drop-on-collision mode,
    *     (band, bucket, id, ts[, fp]) for the verified landing paths
    *     (the stored id/ts make the hits the candidate pairs; fp feeds
    *     the zero-I/O exact-duplicate tier) — never the table's full
    *     width.
    *
    * Returns the stored rows (selected to `cols`) whose (band, bucket)
    * collides with the batch — tiny by construction. `snapshotUnsized`
    * keeps the scan free of the byte-proportional repartition (an
    * Exchange the probe must not pay).
    */
  private[graft] def probeStoredBuckets(spark: SparkSession, bucketPath: String,
                                        bb: DataFrame,
                                        cols: Seq[String]): DataFrame = {
    val probe = bb.select(col("band"), col("bucket")).distinct()
    val isinCap = sys.props.get("graft.dedup.probe.isin.max")
      .flatMap(_.toIntOption).getOrElse(8192)
    val collectCap = sys.props.get("graft.dedup.probe.collect.max")
      .flatMap(_.toIntOption).getOrElse(1000000)
    val vals = probe.select(col("bucket")).distinct()
      .limit(collectCap + 1).collect().map(_.getLong(0))
    // the live-file view is resolved ONCE and shared by the prune pass,
    // the empty frame's schema, and the pruned read. snapshotUnsized's
    // DataFrame CONSTRUCTION is O(live files) driver work (file index +
    // schema resolution — measured ~0.4 s warm over a 100-file table),
    // so the paths that read nothing or read a pruned subset must never
    // build it; it stays the fallback for the unpruned scan, lazily.
    val liveNames = graft.io.Tables.liveFileNames(spark, bucketPath)
    lazy val storedFull = graft.io.Tables.snapshotUnsized(spark, bucketPath)
    lazy val stored0 = storedFull.select(cols.map(col): _*)
    def filePaths(ns: Seq[String]): Seq[String] =
      ns.map(n => new org.apache.hadoop.fs.Path(bucketPath, n).toString)
    // the memoized head-file schema (r18): passing it explicitly to the
    // file-list reads below removes the distributed schema-inference job
    // `spark.read.parquet(files)` otherwise launches PER MICRO-BATCH on
    // the pruned verify path (data files are immutable and the layout
    // contract keeps one schema per generation, so the memo is exact)
    val headSchema = bucketHeadSchema(spark, bucketPath,
      liveNames.flatMap(_.headOption))
    def readFiles(ps: Seq[String]): DataFrame = headSchema match {
      case Some(s) => spark.read.schema(s).parquet(ps: _*)
      case None => spark.read.parquet(ps: _*)
    }
    // an empty result still needs the scan's schema — one live file's
    // footer supplies it without the full index
    def emptyStored: DataFrame = liveNames match {
      case Some(ns) if ns.nonEmpty =>
        readFiles(filePaths(ns.take(1)))
          .select(cols.map(col): _*).limit(0)
      case _ => stored0.limit(0)
    }
    // a bucket-less batch (empty, or all docs too short to shingle)
    // can collide with nothing — skip the scan outright
    if (vals.isEmpty) return emptyStored
    // the sidecar check: definite-miss values drop on the driver; what
    // remains (real hits + the fp tail) is the verify scan's filter set.
    // No sidecar (or a collect flood past collectCap) → candidates =
    // None → the always-correct full-scan fallback.
    val candidates: Option[Array[Long]] =
      if (vals.length > collectCap) None
      else DedupBloom.load(spark, bucketPath)
        .map(bf => vals.filter(bf.mightContainLong))
    // the or-chain hazard zone (see the doc block): parquet-mr receives
    // an In ≤ the session threshold as a left-deep or()-chain of eq,
    // which stack-overflows tasks beyond ~1.5k values. Safe by default
    // (threshold 10 → only 10-value chains); an operator who RAISES the
    // common tuning knob must not turn the probe into a crash, so the
    // zone falls back to the plain scan.
    def orChainHazard(n: Int): Boolean = {
      val pushThresh = scala.util.Try(spark.conf.get(
        "spark.sql.parquet.pushdown.inFilterThreshold").toInt).getOrElse(10)
      n > 1024 && n <= pushThresh
    }
    // FILE PRUNING for the positive path (the remaining O(corpus) edge,
    // VERDICT r14 missing #1): a known verify set — the bloom positives,
    // or the raw batch values when the global sidecar is absent but small
    // enough — consults the per-file indexes ([[FileBlooms]]: footer
    // bucket min/max ranges first — O(files × log k) driver arithmetic,
    // flat at 100 TB file counts — then bloom sidecars, budgeted) and
    // the verify scan reads ONLY the files that might hold a positive.
    // The common fp-tail batch (a handful of positives) reads a handful
    // of files; a re-crawl batch reads ~the files of the window it
    // re-crawls, not the whole retained corpus. Pruning can only
    // over-keep (footer ranges bound the real values; per-file blooms
    // have no false negatives; un-indexed files are always kept), so the
    // probe's answer is scan-identical.
    val verifySet: Option[Array[Long]] =
      if (vals.length > collectCap) None else candidates.orElse(Some(vals))
    // LAZY like storedFull: the bloom-cleared branch below returns the
    // empty frame without ever resolving a stored-side scan — a strict
    // val here would force storedFull's O(files) construction on the
    // one path that exists to read nothing
    lazy val stored = (verifySet.filter(_.nonEmpty), liveNames) match {
      case (Some(pos), Some(live)) =>
        FileBlooms.pruneKnown(spark, bucketPath, pos, live) match {
          case Some(keep) if keep.isEmpty => emptyStored
          // schema from the memoized head footer (the table's own live
          // generation) — never the full-index storedFull, and since r18
          // never a per-batch inference job either
          case Some(keep) => readFiles(keep)
            .select(cols.map(col): _*)
          case None => stored0
        }
      case _ => stored0
    }
    candidates match {
      case Some(pos) if pos.isEmpty =>
        // bloom-cleared: the common no-collision batch reads NOTHING
        emptyStored
      case Some(pos) if pos.length <= isinCap &&
          pos.length * 2 <= vals.length && !orChainHazard(pos.length) =>
        // SELECTIVE positives: the InSet thins what flows into the join.
        // When most of the batch is positive (a re-crawl batch: every
        // doc collides), the filter eliminates ~nothing and only adds
        // per-batch analysis + codegen of a thousands-literal predicate
        // — the plain scan+join is cheaper (measured on the bench's
        // re-crawl entry), so large positive fractions skip it.
        stored.filter(col("bucket").isin(pos.map(Long.box): _*))
          .join(broadcast(probe), Seq("band", "bucket"), "left_semi")
      case _ =>
        stored.join(broadcast(probe), Seq("band", "bucket"), "left_semi")
    }
  }

  /** The shared retention beat for the landing-dedup twins: ONE cut from
    * the DOC table's manifest (max stored ts − retainNs — metadata only,
    * the same guards as [[ingestAppendRetained]]), head-deleted from BOTH
    * tables so the probe's suppression set tracks the retained corpus —
    * an expired document stops suppressing new near-duplicates of itself
    * (the reference's head-deletion semantics, btree.c:747-899, applied
    * to the dedup state too; without this the bucket table grows forever
    * and long-expired docs keep winning their clusters). Bucket rows
    * carry the doc's ts, so one cut aligns both windows.
    *
    * Order: BUCKETS first, then DOCS — a crash between the two deletes
    * must never leave the probe suppressing against documents the doc
    * table no longer serves; the transient converse (expired docs briefly
    * still present while their buckets are gone) only admits a near-dup
    * the very next cut removes the original of, and the next beat (or the
    * replay) converges. Both deletes are O(expiring files) via the
    * manifest split and idempotent across replays (an empty range is a
    * pure no-op).
    */
  private def dedupRetentionBeat(spark: SparkSession, docPath: String,
                                 bucketPath: String, ts: String,
                                 retainNs: Long): Unit =
    retentionCut(spark, docPath, retainNs).foreach { cut =>
      graft.io.Tables.deleteRangeNs(spark, bucketPath, ts, Long.MinValue, cut - 1)
      graft.io.Tables.deleteRangeNs(spark, docPath, ts, Long.MinValue, cut - 1)
      // the deletes just turned the expired window's sidecar bits STALE
      // (blooms cannot delete); the beat is the natural rebuild cadence —
      // one live-table scan, only on beats where something actually
      // expired (`every` thins them). Best-effort: a rebuild failure
      // leaves a correct superset sidecar (degraded probes, never wrong),
      // so it must not fail a batch whose appends+deletes committed.
      scala.util.Try(DedupBloom.rebuild(spark, bucketPath)).failed.foreach(e =>
        System.err.println(s"[dedup-retention] bloom rebuild skipped: ${e.getMessage}"))
      // same cadence for the per-file sidecars: the deletes orphaned the
      // expired files' blooms (reclaimed) and a delete rewrite may have
      // renamed survivors (re-bloomed) — best-effort, like the rebuild
      scala.util.Try(FileBlooms.sync(spark, bucketPath)).failed.foreach(e =>
        System.err.println(s"[dedup-retention] file-bloom sync skipped: ${e.getMessage}"))
    }

  /** Rebuild the landing-dedup bloom sidecar exactly from the live
    * bucket table — the operator's fold-cadence maintenance call: sheds
    * the stale bits retention left behind (expired buckets linger as
    * harmless false positives until a rebuild) and re-sizes a sidecar
    * the table has outgrown. Safe while the stream is live: a reader
    * landing in the swap window falls back to the full-scan probe.
    */
  def rebuildDedupBloom(spark: SparkSession, bucketPath: String): Unit = {
    DedupBloom.rebuild(spark, bucketPath)
    // a fold just before this call renamed the table's files — re-key the
    // per-file sidecars to the new generation in the same maintenance
    // beat. Best-effort like every sync call site: the global rebuild
    // already installed, and a concurrent retention beat deleting a file
    // mid-sync must not read as a failed rebuild (sync's own contract is
    // that a missing file bloom only degrades pruning)
    scala.util.Try(FileBlooms.sync(spark, bucketPath)).failed.foreach(e =>
      System.err.println(s"[dedup-rebuild] file-bloom sync skipped: ${e.getMessage}"))
  }

  /** Re-key the PER-FILE bloom sidecars ([[FileBlooms]]) to the bucket
    * table's live generation: build blooms for files missing one (new
    * appends, a fold's output), reclaim orphans (folded/expired files).
    * The ingest calls this per batch and [[rebuildDedupBloom]] calls it at
    * fold cadence; exposed for operators running maintenance out of band.
    * Idempotent and best-effort by contract — a missing file bloom only
    * degrades the probe's file pruning, never its answer.
    */
  def syncDedupFileBlooms(spark: SparkSession, bucketPath: String): Unit =
    FileBlooms.sync(spark, bucketPath)

  /** The landing-dedup health check as one row — the divergence watch
    * USER_GUIDE's operating recipe had the operator eyeball (VERDICT r14
    * item 5), queryable instead:
    *  - `doc_rows` / `bucket_rows` / `rows_per_doc`: the two tables'
    *    row counts and their ratio. For the text twin the ratio sits at
    *    the configured band count (every retained doc contributes exactly
    *    `bands` bucket rows); the embedding twin sits at ≤ `tables`
    *    (zero-norm vectors bucket nowhere). A drifting ratio means a
    *    crashed beat left the tables' windows misaligned (the next
    *    op converges it) or a foreign writer touched one table.
    *  - `sidecar_present` / `sidecar_version` / `sidecar_bits` /
    *    `sidecar_fpp`: the global bloom sidecar's install counter and its
    *    CURRENT expected false-positive rate given the bits actually set
    *    — the saturation signal. An fpp drifting far above the built 1%
    *    means the table outgrew the sidecar: probes still verify exactly
    *    but pay more verify I/O; run [[rebuildDedupBloom]] to re-size.
    *  - `file_blooms` vs `bucket_files`: per-file sidecar coverage for
    *    the probe's file pruning (un-bloomed files are always read);
    *    [[syncDedupFileBlooms]] closes a gap.
    */
  def dedupStats(spark: SparkSession, docPath: String,
                 bucketPath: String): DataFrame = {
    import spark.implicits._
    // governed tables serve their row count from METADATA (manifest live
    // list + footer row counts, zero Spark jobs — a health check an
    // operator polls must not launch two full-table jobs per call,
    // VERDICT r15 wrong #2); ungoverned paths fall back to the count
    // job. Absent / not-yet-bootstrapped tables read as 0 rows — a
    // health check must not throw on the pipeline's own day-zero state.
    // ONLY day-zero shapes are absorbed (path missing, no data files to
    // infer a schema from — matched by error CONDITION, not a blanket
    // AnalysisException: a dir of foreign non-parquet content must
    // surface, not read as an empty healthy table, ADVICE r15): the
    // engine's deliberate fail-loud errors (foreign manifest corruption,
    // retired-file ambiguity) PROPAGATE — a health check that reads
    // corruption as "empty table" hides the one state it exists to
    // surface (review r15)
    def rows(p: String): Long = {
      val ph = new org.apache.hadoop.fs.Path(p)
      if (!ph.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(ph)) 0L
      else graft.io.Tables.metadataRowCount(spark, p).getOrElse {
        try graft.io.Tables.snapshot(spark, p).count()
        catch {
          // dir exists but holds no readable data yet (the stream bridge
          // creates it with only its commit sidecar before batch 0)
          case e: org.apache.spark.sql.AnalysisException
              if Option(e.getCondition).exists(c =>
                c.contains("UNABLE_TO_INFER_SCHEMA") ||
                  c.contains("PATH_NOT_FOUND")) => 0L
        }
      }
    }
    val docRows = rows(docPath)
    val bucketRows = rows(bucketPath)
    val hp = new org.apache.hadoop.fs.Path(bucketPath)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val liveN = graft.io.Tables.liveFileNames(spark, bucketPath)
    val bucketFiles = liveN.map(_.size).getOrElse(-1)
    val sidecar = DedupBloom.info(spark, bucketPath)
    val fbDir = FileBlooms.bloomDir(hp)
    // coverage counts blooms for LIVE files only — raw dir counts would
    // read "fully covered" off a pile of orphans after an out-of-band
    // fold renamed every file, exactly the state this column exists to
    // surface (review r15)
    val fileBlooms =
      if (scala.util.Try(fs.getFileStatus(fbDir)).toOption.exists(_.isDirectory)) {
        val present = fs.listStatus(fbDir).filter(s => s.isFile &&
          s.getPath.getName.endsWith(".bloom")).map(_.getPath.getName).toSet
        liveN.map(_.count(n => present(n + ".bloom"))).getOrElse(0)
      } else 0
    Seq((docRows, bucketRows,
      if (docRows == 0L) 0.0 else bucketRows.toDouble / docRows,
      bucketFiles, sidecar.isDefined,
      sidecar.map(_._1).getOrElse(-1L), sidecar.map(_._2).getOrElse(-1L),
      sidecar.map(_._3).getOrElse(-1.0), fileBlooms))
      .toDF("doc_rows", "bucket_rows", "rows_per_doc", "bucket_files",
        "sidecar_present", "sidecar_version", "sidecar_bits", "sidecar_fpp",
        "file_blooms")
  }

  /** Near-dup-filtered streaming ingest, VERIFIED (round 16): a band
    * -bucket collision is only a CANDIDATE — like the batch pipelines
    * (minhashLshPairsVerified) and the embedding twin's exact-cosine
    * check, candidates are verified with exact n-gram Jaccard against
    * the colliding RETAINED docs (column-pruned doc-table join over the
    * candidate ids only, work ∝ collisions, never ∝ corpus) and a doc
    * drops only at `minJaccard` or above. The pre-r16 drop-on-raw
    * -collision behavior was banding-aggressive (8 bands × 2 rows
    * s-curves at j≈0.3, and a boilerplate-heavy real corpus
    * chain-collapses to a handful of retained representatives — measured
    * on the sf0.01 documents slice: 4644 collision pairs among 200 docs
    * vs 3 pairs at j≥0.5); pass `minJaccard <= 0` to keep that mode
    * (drop on any collision, zero verify I/O).
    */
  def ingestDedupNearDup(df: DataFrame, docPath: String, bucketPath: String,
                         ts: String, checkpoint: String,
                         id: String, text: String,
                         shingleLen: Int = 5, bands: Int = 8,
                         rowsPerBand: Int = 2,
                         trigger: Trigger = Trigger.AvailableNow(),
                         retainNs: Long = Long.MaxValue, every: Int = 1,
                         minJaccard: Double = 0.5)
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch0: Dataset[Row], batchId: Long) =>
        retryingLease("ingestDedupNearDup") {
          dedupIngestBatch(batch0.toDF(), docPath, bucketPath, ts, checkpoint,
            id, text, shingleLen, bands, rowsPerBand, batchId,
            retainNs = if (batchId % math.max(1, every) == 0) retainNs
                       else Long.MaxValue,
            minJaccard = minJaccard)
        }
        ()
      }
      .start()

  /** One micro-batch of [[ingestDedupNearDup]] — public so crash tests
    * (and batch backfills) can drive the two-table protocol directly.
    * `retainNs` < Long.MaxValue runs the retention beat after the two
    * appends (see [[dedupRetentionBeat]]); `minJaccard` per the stream
    * wrapper's contract (verified at > 0, raw-collision drop at <= 0).
    */
  def dedupIngestBatch(batch0: DataFrame, docPath: String, bucketPath: String,
                       ts: String, streamKey: String, id: String, text: String,
                       shingleLen: Int, bands: Int, rowsPerBand: Int,
                       batchId: Long, retainNs: Long = Long.MaxValue,
                       minJaccard: Double = 0.5): Unit = {
    val spark = batch0.sparkSession
    val batch = batch0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // shingle sets materialize ONCE: banding derives from them, and both
    // verify paths (corpus candidates + in-batch pairs) re-join them —
    // same construction as bandBuckets (bandBucketsSh ∘ shingleSets), so
    // the banding math is unchanged
    val sh = graft.dedup.Dedup.shingleSets(batch, id, text, shingleLen)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bb = graft.dedup.Dedup
      .bandBucketsSh(sh, id, bands, rowsPerBand)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var survivorsCached: Option[DataFrame] = None
    var freshCached: Option[DataFrame] = None
    var candCached: Option[DataFrame] = None
    try {
      // ids colliding with the RETAINED corpus (absent table = empty):
      // the sublinear probe — broadcast flip + In pushdown + column
      // pruning (probeStoredBuckets) — then the tiny hit-bucket set
      // broadcasts back onto the batch
      val hp = new org.apache.hadoop.fs.Path(bucketPath)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // fp layout detection (one manifest read per batch; the footer
      // schema memoizes on the IMMUTABLE head file — a fold/retention
      // that renames files changes the head name and re-detects): does
      // the bucket table's live generation carry the content-fingerprint
      // column (tier-1 shortcut below)? A table with no live files yet
      // is "new" — the prop decides its layout.
      val liveHead =
        if (fs.exists(hp))
          graft.io.Tables.liveFileNames(spark, bucketPath).flatMap(_.headOption)
        else None
      val hasFp = bucketHeadHasFp(spark, bucketPath, liveHead)
      val fresh =
        if (!fs.exists(hp)) batch
        else if (minJaccard <= 0) {
          // legacy banding-aggressive mode: ANY (band, bucket) collision
          // drops the doc, zero verify I/O
          val hitBuckets = probeStoredBuckets(spark, bucketPath, bb,
            Seq("band", "bucket")).distinct()
          val hit = bb.join(broadcast(hitBuckets), Seq("band", "bucket"),
            "left_semi").select(col(id)).distinct()
          val f = batch.join(hit, Seq(id), "left_anti")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          freshCached = Some(f)
          f
        } else {
          // VERIFIED: the probe carries the stored id, so the hits ARE
          // the candidate (batch-id, stored-id) pairs. Two-tier verify:
          //  1. FINGERPRINT SHORTCUT — bucket rows written by this
          //     version carry the stored doc's content fingerprint
          //     (`fp`, the exact-dedup key), so a candidate whose batch
          //     fingerprint MATCHES is an exact duplicate (jaccard 1 ≥
          //     any sane threshold) and drops with ZERO doc-table I/O.
          //     A re-crawl of identical pages — THE steady state when a
          //     crawler revisits its corpus — never touches the doc
          //     table at all. The comparison happens INSIDE the
          //     candidate job itself: the batch side of the broadcast
          //     join carries each doc's fingerprint, so candidates
          //     arrive pre-labeled exact/not and the separate tier-1
          //     join (one more shuffle-stage job per batch on the
          //     all-exact steady state, VERDICT r16 wrong #2) is gone.
          //     Tables written before fp existed take the jaccard tier
          //     for everything (hasFp detection above).
          //  2. EXACT JACCARD for the rest — fetched from the doc table
          //     bounded in BOTH dimensions: the candidates' ts SPAN
          //     file-prunes the read to the overlapping manifest slice
          //     (the layout is ts-clustered, never id-clustered, so an
          //     In alone cannot file-prune at 100 TB) and the id set
          //     bounds the shingling. The labeled candidate set is
          //     COLLECTED once under a cap (graft.dedup.verify.collect
          //     .max, default 20000 — collisions only, ~40 B/row): the
          //     driver then decides tier 1 outright, builds tier 2's
          //     pair set as a local frame (no probe recomputation, no
          //     cand persist), and an all-exact batch skips every
          //     tier-2 job. Past the cap the frame-based shape takes
          //     over (persisted cand, span agg + broadcast semi-join —
          //     a giant re-crawl must not revert to O(corpus) work or
          //     an unbounded collect).
          val tier1 = hasFp && minJaccard <= 1.0
          val probeCols = Seq("band", "bucket", id, ts) ++
            (if (hasFp) Seq("fp") else Nil)
          val storedHits = probeStoredBuckets(spark, bucketPath, bb, probeCols)
            .withColumnRenamed(id, "__oldId").withColumnRenamed(ts, "__oldTs")
            .withColumnsRenamed(Map("fp" -> "__oldFp"))
          val bbB =
            if (tier1) bb.join(batch.select(col(id),
              graft.text.TextOps.fingerprint(col(text)).as("__bfp")), Seq(id))
            else bb
          val exactCol =
            if (tier1) coalesce(col("__oldFp") === col("__bfp"), lit(false))
            else lit(false)
          val cand = storedHits.join(broadcast(bbB), Seq("band", "bucket"))
            .select(col(id), col("__oldId"), col("__oldTs"),
              exactCol.as("__exact"))
            .distinct()
          val candCap = sys.props.get("graft.dedup.verify.collect.max")
            .flatMap(_.toIntOption).getOrElse(20000)
          val candRows = cand.limit(candCap + 1).collect()
          // a local single-column id frame for broadcast anti-joins —
          // typed from the batch's own schema, so the join key resolves
          // whatever the id type is
          def idFrame(vals: Array[Any], name: String): DataFrame =
            spark.createDataFrame(
              new java.util.ArrayList[Row](java.util.Arrays.asList(
                vals.map(v => Row(v)): _*)),
              org.apache.spark.sql.types.StructType(
                Seq(batch.schema(id).copy(name = name))))
          // tier-2 jaccard verify of a (batch-id, stored-id) pair frame
          // against a bounded doc-table fetch; `oldDocs` is already
          // confined to the colliding stored docs
          def jaccardHits(pairs: DataFrame, oldDocs: DataFrame): DataFrame = {
            // shingle only the colliding stored docs (∝ candidates); the
            // intersect arithmetic is verifyJaccard's, inlined because
            // the two sides come from different frames
            val oldSh = graft.dedup.Dedup
              .shingleSets(oldDocs, "__oid", "__otxt", shingleLen)
              .select(col("__oid").as("__oldId"), col("sh").as("__osh"))
            pairs
              .join(sh.select(col(id), col("sh")), Seq(id))
              .join(oldSh, Seq("__oldId"))
              .withColumn("__inter",
                size(array_intersect(col("sh"), col("__osh"))).cast("long"))
              .filter(col("__inter") /
                (size(col("sh")) + size(col("__osh")) - col("__inter"))
                >= minJaccard)
              .select(col(id)).distinct()
          }
          val f = (if (candRows.length <= candCap) {
            // DRIVER-DECIDED: every labeled candidate is on the driver
            val exactIds = candRows.filter(_.getBoolean(3)).map(_.get(0)).distinct
            val exactSet = exactIds.toSet
            // pairs still undecided: their batch id survived tier 1
            val restRows = candRows.filterNot(r => exactSet.contains(r.get(0)))
            if (restRows.isEmpty) {
              // the all-exact re-crawl steady state: zero doc-table I/O,
              // zero tier-2 jobs — one broadcast anti-join over the
              // persisted batch decides the whole micro-batch
              if (exactIds.isEmpty) batch
              else batch.join(broadcast(idFrame(exactIds, id)), Seq(id),
                "left_anti")
            } else {
              val ns = restRows.flatMap(r => tsValueNs(r.get(2)))
              val bounds =
                if (ns.length == restRows.length) Some((ns.min, ns.max))
                else None
              val oldDocs0 = bounds.map { case (lo, hi) =>
                graft.io.Tables.snapshotSliceNs(spark, docPath, lo, hi, ts)
              }.getOrElse(graft.io.Tables.snapshot(spark, docPath))
                .select(col(id).as("__oid"), col(text).as("__otxt"))
              val oldIds = restRows.map(_.get(1)).distinct
              val oldDocs =
                if (oldIds.length <= 1000)
                  // isin additionally pushes row-group pruning inside
                  // the ts-sliced files
                  oldDocs0.filter(col("__oid").isin(oldIds: _*))
                else oldDocs0.join(broadcast(idFrame(oldIds, "__oid")),
                  Seq("__oid"), "left_semi")
              // the pair set is a LOCAL frame (it was just collected) —
              // tier 2 never recomputes the probe
              val pairs = spark.createDataFrame(
                new java.util.ArrayList[Row](java.util.Arrays.asList(
                  restRows.map(r => Row(r.get(0), r.get(1))): _*)),
                org.apache.spark.sql.types.StructType(Seq(
                  batch.schema(id).copy(name = id),
                  batch.schema(id).copy(name = "__oldId"))))
              val hit = jaccardHits(pairs, oldDocs)
              val drops =
                if (exactIds.isEmpty) hit
                else hit.unionByName(idFrame(exactIds, id)).distinct()
              batch.join(drops, Seq(id), "left_anti")
            }
          } else {
            // OVER-CAP fallback: the frame-based shape (persisted cand,
            // exact span agg, broadcast semi-join fetch)
            val candDf = cand
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            candCached = Some(candDf)
            val exactIds = candDf.filter(col("__exact"))
              .select(col(id)).distinct()
            val rest = candDf.join(exactIds, Seq(id), "left_anti")
              .select(col("__oldId"), col("__oldTs")).distinct()
            val span = rest.agg(min(col("__oldTs")), max(col("__oldTs")),
              count(lit(1))).head()
            if (span.getLong(2) == 0L)
              batch.join(exactIds, Seq(id), "left_anti")
            else {
              val bounds = for {
                lo <- tsValueNs(span.get(0)); hi <- tsValueNs(span.get(1))
              } yield (lo, hi)
              val oldDocs0 = bounds.map { case (lo, hi) =>
                graft.io.Tables.snapshotSliceNs(spark, docPath, lo, hi, ts)
              }.getOrElse(graft.io.Tables.snapshot(spark, docPath))
                .select(col(id).as("__oid"), col(text).as("__otxt"))
              val oldDocs = oldDocs0.join(
                broadcast(rest.select(col("__oldId").as("__oid"))),
                Seq("__oid"), "left_semi")
              val hit = jaccardHits(
                candDf.filter(!col("__exact"))
                  .select(col(id), col("__oldId")), oldDocs)
              batch.join(hit.unionByName(exactIds).distinct(), Seq(id),
                "left_anti")
            }
          }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          freshCached = Some(f)
          f
        }
      // in-batch collisions among the remaining docs: candidate pairs
      // from the bucket-collision graph (verified at minJaccard > 0 —
      // exact Jaccard over the batch's own shingle sets, work ∝ pairs),
      // connected components, min id per cluster survives (docs too
      // short to shingle have no buckets, collide with nothing, and
      // always survive). An ALL-DROP batch (a re-crawl — the steady
      // state when a crawler revisits its corpus) short-circuits: no
      // survivors means no pairs, and the pair self-join + component
      // machinery costs whole shuffle stages of task-launch floor even
      // on empty inputs (measured ~3.5 s at bench scale before this
      // guard).
      // an ALL-DROP batch (a re-crawl — the steady state) is KNOWN empty
      // on the driver after this check: every later stage that would
      // launch a job over it (in-batch components, bucket-value collect,
      // the two appends' writes) short-circuits to empty local relations
      // — the appends still run for their commit records, but over
      // limit(0) frames the optimizer folds to zero-task writes
      val freshEmpty = freshCached.isDefined && fresh.isEmpty
      val survivors =
        if (freshEmpty) fresh
        else {
          val freshBB = bb.join(fresh.select(col(id)), Seq(id), "left_semi")
          val cand = graft.dedup.Dedup.bandedPairs(freshBB, id)
          val pairs =
            if (minJaccard <= 0) cand
            else graft.dedup.Dedup.verifyJaccard(cand, sh, id, minJaccard)
              .select(col("id1"), col("id2"))
          val losers = graft.dedup.Dedup.connectedComponents(pairs)
            .filter(col("id") =!= col("cluster_id"))
            .select(col("id").as(id))
          fresh.join(losers, Seq(id), "left_anti")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        }
      survivorsCached = Some(survivors)
      // doc table first, bucket table second (see crash-consistency
      // note); distinct stream ids keep the two commit logs separate.
      // An ALL-DROP batch (driver-known empty) advances the commit log
      // WITHOUT the staging write: commitEmptyStreamBatch is the same
      // exactly-once transition minus the 0-row Spark write job + marker
      // + manifest rewrite the limit(0) append used to pay (r18).
      if (freshEmpty)
        graft.io.Tables.commitEmptyStreamBatch(spark, docPath,
          streamKey + "#docs", batchId)
      else
        graft.io.Tables.appendStreamBatch(survivors, docPath, ts,
          streamKey + "#docs", batchId)
      // bucket rows carry the doc's content FINGERPRINT so future
      // batches' exact-duplicate candidates drop at the probe with zero
      // doc-table I/O (the verified path's tier 1). New tables write it
      // when `graft.dedup.fp.enabled` allows (the default); an EXISTING
      // table always keeps its own layout whatever the prop says —
      // narrowing a 5-column table to 4-column appends would tear the
      // probe's schema (ADVICE r16 medium), and a pre-fp table widening
      // would do the same in reverse. Legacy tables' probes stay on the
      // jaccard tier.
      val writeFp = shouldWriteFp(liveHead, hasFp)
      val bucketRows0 = bb
        .join(survivors.select(col(id), col(ts)), Seq(id))
      val bucketRows = {
        val full =
          if (writeFp) bucketRows0
            .join(batch.select(col(id),
              graft.text.TextOps.fingerprint(col(text)).as("fp")), Seq(id))
            .select(col(id), col("band"), col("bucket"), col(ts), col("fp"))
          else bucketRows0
            .select(col(id), col("band"), col("bucket"), col(ts))
        if (freshEmpty) full.limit(0) else full
      }
      // sidecar BEFORE the bucket append: a crash between the two leaves
      // the bloom a superset of the stored table — the invariant the
      // probe's correctness contract rests on (see DedupBloom); a
      // replayed batch re-ORs the same bits, a skipped append changes
      // nothing the superset cares about. ONE writer-lease span covers
      // update AND append (ADVICE r15 high): an un-leased window between
      // them lets a concurrent rebuild snapshot the table WITHOUT this
      // batch's rows and install a bloom missing its bits — after which
      // the append lands anyway and the sidecar is a strict SUBSET of
      // the table (silent false negatives = duplicates admitted
      // forever). The lease is thread-re-entrant, so the nested
      // acquisitions inside DedupBloom.update and appendStreamBatch are
      // no-ops; a rebuild attempted mid-span fails loudly instead.
      val newBucketVals =
        if (freshEmpty) Array.empty[Long] // no survivors — no new buckets
        else bucketRows.select(col("bucket"))
          .distinct().collect().map(_.getLong(0)) // the Spark job runs OUTSIDE the lease
      graft.io.Tables.withWriterLease(fs, hp, "dedupIngestBuckets") {
        DedupBloom.update(spark, bucketPath, newBucketVals)
        if (freshEmpty)
          graft.io.Tables.commitEmptyStreamBatch(spark, bucketPath,
            streamKey + "#buckets", batchId)
        else
          graft.io.Tables.appendStreamBatch(bucketRows, bucketPath, ts,
            streamKey + "#buckets", batchId)
      }
      // per-file blooms for the batch's new file(s) — OUTSIDE the lease
      // (it only reads committed live files) and best-effort: a missing
      // file bloom degrades the probe's file pruning, never its answer
      scala.util.Try(FileBlooms.sync(spark, bucketPath)).failed.foreach(e =>
        System.err.println(s"[dedup-ingest] file-bloom sync skipped: ${e.getMessage}"))
      // retention LAST, after both appends committed: a replayed batch
      // re-runs the beat (idempotent — the re-cut range is empty), and a
      // crash inside either delete recovers through the standard delete
      // recovery at the next op's entry
      if (retainNs != Long.MaxValue)
        dedupRetentionBeat(spark, docPath, bucketPath, ts, retainNs)
    } finally {
      // every persist released on EVERY path — a throw from either append
      // (lease contention, ordered-ingest reject, crash injection) must
      // not pin survivor blocks for the session's lifetime
      survivorsCached.foreach(_.unpersist())
      freshCached.foreach(_.unpersist())
      candCached.foreach(_.unpersist())
      bb.unpersist(); sh.unpersist(); batch.unpersist()
    }
  }

  /** The EMBEDDING twin of [[ingestDedupNearDup]]: semantic dedup at
    * landing (SemDeDup at the ingest boundary, arXiv:2303.09540) — each
    * micro-batch drops documents whose embedding is within `minCos`
    * cosine of a previously-RETAINED document. Unlike MinHash banding, a
    * random-hyperplane bucket collision is only a CANDIDATE (RHP buckets
    * are coarse), so the stored-corpus check verifies candidates with
    * the exact cosine against the retained vectors (column-pruned doc
    * -table join over the candidate ids only); in-batch collisions
    * resolve through [[graft.dedup.Dedup.cosinePairsBucketed]] (same
    * verify-after-bucket shape) + connected components, min id per
    * cluster. Same two-table exactly-once protocol and crash consistency
    * as the text variant. Zero-norm embeddings have no direction, bucket
    * nowhere, and always survive.
    *
    * LSH recall: a true near-dup pair missed by ALL `tables` hash tables
    * lands twice — recall at angle θ is 1 − (1 − (1−θ/π)^bits)^tables.
    * The ingest defaults (32 tables × 16 bits → ~0.998 at cos 0.95)
    * deliberately use WIDER buckets than cosinePairsBucketed's batch
    * defaults (32×4): here every bucket row joins against the whole
    * RETAINED corpus, so candidate volume scales with corpus/2^bits per
    * table — 4-bit buckets would make every batch collide with ~1/16 of
    * the corpus per table. Misses are possible by construction (the
    * batch SemDeDup query asserts a recall floor, not equality, for the
    * same reason); lower minCos needs more tables.
    */
  def ingestDedupEmbedding(df: DataFrame, docPath: String, bucketPath: String,
                           ts: String, checkpoint: String,
                           id: String, vec: String, dim: Int,
                           minCos: Double = 0.95,
                           tables: Int = 32, bits: Int = 16,
                           trigger: Trigger = Trigger.AvailableNow(),
                           retainNs: Long = Long.MaxValue, every: Int = 1)
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch0: Dataset[Row], batchId: Long) =>
        retryingLease("ingestDedupEmbedding") {
          dedupIngestEmbeddingBatch(batch0.toDF(), docPath, bucketPath, ts,
            checkpoint, id, vec, dim, minCos, tables, bits, batchId,
            retainNs = if (batchId % math.max(1, every) == 0) retainNs
                       else Long.MaxValue)
        }
        ()
      }
      .start()

  /** One micro-batch of [[ingestDedupEmbedding]] — public for crash tests
    * and batch backfills, like [[dedupIngestBatch]].
    */
  def dedupIngestEmbeddingBatch(batch0: DataFrame, docPath: String,
                                bucketPath: String, ts: String,
                                streamKey: String, id: String, vec: String,
                                dim: Int, minCos: Double, tables: Int,
                                bits: Int, batchId: Long,
                                retainNs: Long = Long.MaxValue): Unit = {
    val spark = batch0.sparkSession
    // one registration serves cs_rhp_sig (plane hashing) and cs_dot (the
    // fused norm/verify dots — bit-equal with the HOF form, ArrayDot)
    graft.sqlext.GraftFunctions.register(spark)
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function("cs_dot", a, b)
    val batch = batch0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val withNorm = batch
      .select(col(id), col(vec).cast("array<double>").as("__v"))
      .withColumn("__nrm", sqrt(dot(col("__v"), col("__v"))))
      .filter(col("__nrm") > 0)
      // the vector FINGERPRINT (xxhash64 over the cast array) — the
      // embedding analog of the text twin's content fingerprint: an
      // exact re-upload of an identical vector hashes identically, so
      // tier 1 below drops it at the probe with ZERO doc-table I/O
      // (cos(v, v) = 1 ≥ any sane minCos). Same accepted 2^-64
      // collision risk as the text fingerprint.
      .withColumn("__vfp", xxhash64(col("__v")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE plane-hashing pass per doc: bb serves BOTH the stored-corpus
    // candidate join and the in-batch pair join — the same reuse the text
    // twin gets from bandBuckets + bandedPairs. The pass is the FUSED
    // cs_rhp_sig expression (all tables×bits plane dots in one compiled
    // loop, bit-exact with the composed per-table rhpBucket form existing
    // bucket tables persist): the composed form's 32k interpreted HOF
    // lambda steps per row dominated the whole ingest batch at the
    // defaults (32×16×dim 64 — q_emb_ingest measured it ~7× the rest of
    // the batch put together).
    val bb = withNorm.select(col(id),
        posexplode(call_function("cs_rhp_sig", col("__v"),
          lit(dim), lit(bits), lit(tables))))
      .select(col(id), col("pos").as("band"), col("col").as("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val caches = scala.collection.mutable.ListBuffer[DataFrame](withNorm, bb)
    try {
      val hp = new org.apache.hadoop.fs.Path(bucketPath)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // exact-cosine verify of a candidate set against `side` vectors —
      // RHP buckets alone are not near-dup evidence
      def verified(cand: DataFrame, otherVecs: DataFrame): DataFrame = cand
        .join(withNorm.select(col(id), col("__v"), col("__nrm")), Seq(id))
        .join(otherVecs, Seq("__oldId"))
        .withColumn("__on", sqrt(dot(col("__ov"), col("__ov"))))
        .filter(col("__on") > 0)
        .filter(dot(col("__v"), col("__ov")) / (col("__nrm") * col("__on"))
          >= minCos)
      val liveHead =
        if (fs.exists(hp))
          graft.io.Tables.liveFileNames(spark, bucketPath).flatMap(_.headOption)
        else None
      val hasFp = bucketHeadHasFp(spark, bucketPath, liveHead)
      val tier1 = hasFp && minCos <= 1.0
      val fresh = (
        if (!fs.exists(hp)) batch
        else {
          // the same sublinear probe as the text twin (broadcast flip +
          // In pushdown + column pruning), carrying the stored id so the
          // hits ARE the candidate (batch-id, stored-id) pairs; the hit
          // set is tiny, so the batch side broadcasts onto it. On fp
          // layouts the batch side also carries the VECTOR FINGERPRINT,
          // so candidates arrive pre-labeled exact/not (tier 1, VERDICT
          // r16 item 5) — an exact re-upload drops with zero vector I/O.
          val probeCols = Seq("band", "bucket", id, ts) ++
            (if (hasFp) Seq("fp") else Nil)
          val storedHits = probeStoredBuckets(spark, bucketPath, bb, probeCols)
            .withColumnRenamed(id, "__oldId").withColumnRenamed(ts, "__oldTs")
            .withColumnsRenamed(Map("fp" -> "__oldFp"))
          val bbB =
            if (tier1) bb.join(withNorm.select(col(id), col("__vfp")), Seq(id))
            else bb
          val exactCol =
            if (tier1) coalesce(col("__oldFp") === col("__vfp"), lit(false))
            else lit(false)
          val cand = storedHits
            .join(broadcast(bbB), Seq("band", "bucket"))
            .select(col(id), col("__oldId"), col("__oldTs"),
              exactCol.as("__exact"))
            .distinct()
          // DRIVER-DECIDED probe, mirroring the text twin (VERDICT r16
          // next #2): the labeled candidate set collects once under the
          // same cap — tier 1 resolves outright, tier 2's pair set
          // becomes a LOCAL frame, and an all-exact re-upload batch (the
          // embedding steady state) runs ZERO tier-2 jobs and zero
          // vector I/O. Past the cap the frame-based shape below takes
          // over (persisted cand, exact span agg, broadcast semi-join —
          // a giant re-upload must not revert to O(corpus) vector reads
          // or an unbounded collect).
          val candCap = sys.props.get("graft.dedup.verify.collect.max")
            .flatMap(_.toIntOption).getOrElse(20000)
          val candRows = cand.limit(candCap + 1).collect()
          def idFrame(vals: Array[Any], name: String): DataFrame =
            spark.createDataFrame(
              new java.util.ArrayList[Row](java.util.Arrays.asList(
                vals.map(v => Row(v)): _*)),
              org.apache.spark.sql.types.StructType(
                Seq(batch.schema(id).copy(name = name))))
          if (candRows.length <= candCap) {
            val exactIds = candRows.filter(_.getBoolean(3)).map(_.get(0)).distinct
            val exactSet = exactIds.toSet
            val restRows = candRows.filterNot(r => exactSet.contains(r.get(0)))
            if (restRows.isEmpty) {
              if (exactIds.isEmpty) batch
              else batch.join(broadcast(idFrame(exactIds, id)), Seq(id),
                "left_anti")
            } else {
              // candidate pushdown, both dimensions: the colliding
              // stored docs' ts span file-prunes the vector read to the
              // overlapping manifest slice (the layout is ts-clustered,
              // never id-clustered), and the id set bounds the verify
              val ns = restRows.flatMap(r => tsValueNs(r.get(2)))
              val bounds =
                if (ns.length == restRows.length) Some((ns.min, ns.max))
                else None
              val oldVecs0 = bounds.map { case (lo, hi) =>
                graft.io.Tables.snapshotSliceNs(spark, docPath, lo, hi, ts)
              }.getOrElse(graft.io.Tables.snapshot(spark, docPath))
                .select(col(id).as("__oldId"),
                  col(vec).cast("array<double>").as("__ov"))
              val oldIds = restRows.map(_.get(1)).distinct
              val oldVecs =
                if (oldIds.length <= 1000)
                  // isin additionally pushes row-group pruning inside
                  // the ts-sliced files
                  oldVecs0.filter(col("__oldId").isin(oldIds: _*))
                else oldVecs0.join(broadcast(idFrame(oldIds, "__oldId")),
                  Seq("__oldId"), "left_semi")
              // the pair set is a LOCAL frame (it was just collected) —
              // tier 2 never recomputes the probe
              val pairs = spark.createDataFrame(
                new java.util.ArrayList[Row](java.util.Arrays.asList(
                  restRows.map(r => Row(r.get(0), r.get(1))): _*)),
                org.apache.spark.sql.types.StructType(Seq(
                  batch.schema(id).copy(name = id),
                  batch.schema(id).copy(name = "__oldId"))))
              val hit = verified(pairs, oldVecs).select(col(id)).distinct()
              val drops =
                if (exactIds.isEmpty) hit
                else hit.unionByName(idFrame(exactIds, id)).distinct()
              batch.join(drops, Seq(id), "left_anti")
            }
          } else {
            // OVER-CAP fallback: the frame-based shape (persisted cand,
            // exact span agg, broadcast semi-join fetch)
            val candDf = cand
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            caches += candDf
            val exactIds = candDf.filter(col("__exact"))
              .select(col(id)).distinct()
            val rest = candDf.join(exactIds, Seq(id), "left_anti")
            val candOld = rest.select(col("__oldId"), col("__oldTs")).distinct()
            val span = candOld
              .agg(min(col("__oldTs")), max(col("__oldTs")), count(lit(1))).head()
            val nCand = span.getLong(2)
            if (nCand == 0L) {
              if (tier1) batch.join(exactIds, Seq(id), "left_anti") else batch
            } else {
              val bounds = for {
                lo <- tsValueNs(span.get(0)); hi <- tsValueNs(span.get(1))
              } yield (lo, hi)
              val oldVecs0 = bounds.map { case (lo, hi) =>
                graft.io.Tables.snapshotSliceNs(spark, docPath, lo, hi, ts)
              }.getOrElse(graft.io.Tables.snapshot(spark, docPath))
                .select(col(id).as("__oldId"),
                  col(vec).cast("array<double>").as("__ov"))
              val oldVecs = oldVecs0.join(
                broadcast(candOld.select(col("__oldId"))), Seq("__oldId"),
                "left_semi")
              val hit = verified(rest.select(col(id), col("__oldId")), oldVecs)
                .select(col(id)).distinct()
              val drops =
                if (tier1) hit.unionByName(exactIds).distinct() else hit
              batch.join(drops, Seq(id), "left_anti")
            }
          }
        }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      caches += fresh
      // in-batch: bucket-collision pairs from the ALREADY-HASHED bb, then
      // the same exact-cosine verify → components → keep min per cluster.
      // An all-drop batch short-circuits past the pair/component
      // machinery entirely (see the text twin — same empty-input floor).
      val freshEmpty = fresh.isEmpty
      val survivors =
        if (freshEmpty) fresh
        else {
          val freshBB = bb.join(fresh.select(col(id)), Seq(id), "left_semi")
          val candPairs = graft.dedup.Dedup.bandedPairs(freshBB, id)
          val pairs = verified(
            candPairs.select(col("id1").as(id), col("id2").as("__oldId")),
            withNorm.select(col(id).as("__oldId"), col("__v").as("__ov")))
            .select(col(id).as("id1"), col("__oldId").as("id2"))
          val losers = graft.dedup.Dedup.connectedComponents(pairs)
            .filter(col("id") =!= col("cluster_id"))
            .select(col("id").as(id))
          fresh.join(losers, Seq(id), "left_anti")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        }
      caches += survivors
      // all-drop batch: advance the commit log without the staging write
      // (commitEmptyStreamBatch — see the text twin's note)
      if (freshEmpty)
        graft.io.Tables.commitEmptyStreamBatch(spark, docPath,
          streamKey + "#docs", batchId)
      else
        graft.io.Tables.appendStreamBatch(survivors, docPath, ts,
          streamKey + "#docs", batchId)
      // bucket rows carry the VECTOR fingerprint (tier 1's probe-side
      // key) under the same creation-governed layout contract as the
      // text twin (shouldWriteFp): existing tables keep their layout,
      // legacy tables stay on the cosine tier
      val writeFp = shouldWriteFp(liveHead, hasFp)
      val bucketRows = {
        val base = bb.join(survivors.select(col(id), col(ts)), Seq(id))
        val full =
          if (writeFp) base
            .join(withNorm.select(col(id), col("__vfp").as("fp")), Seq(id))
            .select(col(id), col("band"), col("bucket"), col(ts), col("fp"))
          else base.select(col(id), col("band"), col("bucket"), col(ts))
        if (freshEmpty) full.limit(0) else full
      }
      // sidecar BEFORE the bucket append, under ONE writer-lease span —
      // same crash-consistency and anti-rebuild-race contract as the
      // text twin (see dedupIngestBatch)
      val newBucketVals =
        if (freshEmpty) Array.empty[Long]
        else bucketRows.select(col("bucket"))
          .distinct().collect().map(_.getLong(0))
      graft.io.Tables.withWriterLease(fs, hp, "dedupIngestBuckets") {
        DedupBloom.update(spark, bucketPath, newBucketVals)
        if (freshEmpty)
          graft.io.Tables.commitEmptyStreamBatch(spark, bucketPath,
            streamKey + "#buckets", batchId)
        else
          graft.io.Tables.appendStreamBatch(bucketRows, bucketPath, ts,
            streamKey + "#buckets", batchId)
      }
      // per-file blooms for the batch's files, like the text twin
      scala.util.Try(FileBlooms.sync(spark, bucketPath)).failed.foreach(e =>
        System.err.println(s"[dedup-ingest] file-bloom sync skipped: ${e.getMessage}"))
      // same retention composition as the text twin (see dedupIngestBatch)
      if (retainNs != Long.MaxValue)
        dedupRetentionBeat(spark, docPath, bucketPath, ts, retainNs)
    } finally {
      caches.foreach(c => scala.util.Try(c.unpersist()))
      batch.unpersist()
    }
  }

  /** The bucketed twin of [[ingestAppend]]: micro-batches land through the
    * catalog table's own bucket spec ([[graft.io.Tables
    * .appendStreamBatchBucketed]]), preserving the zero-Exchange join
    * layout; [[graft.io.Tables.compactBucketed]] folds multi-file buckets
    * between (or during) runs. The table must already exist with its spec
    * ([[graft.io.Tables.loadBucketed]]).
    */
  def ingestAppendBucketed(df: DataFrame, table: String, checkpoint: String,
                           trigger: Trigger = Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // foreachBatch hands the body a CLONED session; the relation-cache
    // refresh inside appendStreamBatchBucketed applies to that clone, so
    // the stream OWNER's session must be refreshed too or its
    // spark.table(t) keeps serving the pre-stream file listing (other
    // sessions refresh on their own — standard Spark staleness rules)
    val owner = df.sparkSession
    df.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        retryingLease("ingestAppendBucketed") {
          if (graft.io.Tables.appendStreamBatchBucketed(batch.toDF(), table,
            streamId = checkpoint, batchId = batchId))
            owner.catalog.refreshTable(table)
        }
        ()
      }
      .start()
  }

  /** Streaming as-of join — the streaming form of the reference's
    * workhorse operator (Align.asofJoin; func.c:4591-4662): one tagged
    * stream per key carries rows with `side` 0 (right, value provider) and
    * 1 (left, probe); each left row emits the latest preceding right
    * value, NULL before any right row. State per key is one (value, seen)
    * pair — O(#keys) regardless of stream length.
    *
    * Same ordering contract as [[emaStream]]: rows are sorted by
    * (ts, side, tiebreak) within each micro-batch (right before left at
    * equal ts — the inclusive boundary), and batches must arrive in
    * append order (the reference's own ingest requirement).
    */
  def asofStream(events: Dataset[Row], key: String, ts: String, tiebreak: String,
                 side: String, value: String): DataFrame = {
    import events.sparkSession.implicits._
    val kIdx = events.schema.fieldIndex(key)
    val tIdx = events.schema.fieldIndex(ts)
    val bIdx = events.schema.fieldIndex(tiebreak)
    val sIdx = events.schema.fieldIndex(side)
    val vIdx = events.schema.fieldIndex(value)
    events
      .groupByKey(r => r.getAs[Number](kIdx).longValue())
      .flatMapGroupsWithState[(Double, Boolean), (Long, Long, Long, Option[Double])](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (k: Long, rows: Iterator[Row], state: GroupState[(Double, Boolean)]) =>
          val sorted = rows.toSeq.sortBy(r =>
            (r.getAs[Number](tIdx).longValue(), r.getAs[Number](sIdx).intValue(),
              r.getAs[Number](bIdx).longValue()))
          var (last, has) = state.getOption.getOrElse((0.0, false))
          val out = sorted.flatMap { r =>
            if (r.getAs[Number](sIdx).intValue() == 0) {
              // NULL right values neither match nor mask (ignoreNulls)
              if (!r.isNullAt(vIdx)) {
                last = r.getAs[Number](vIdx).doubleValue(); has = true
              }
              None
            } else Some((k, r.getAs[Number](tIdx).longValue(),
              r.getAs[Number](bIdx).longValue(),
              if (has) Some(last) else None))
          }
          state.update((last, has))
          out.iterator
      }
      .toDF(key, ts, tiebreak, "asof_value")
  }

  /** Stateful streaming EMA via flatMapGroupsWithState — the streaming form
    * of Moving.ema (cs_window_ema, func.c:1764-1777). State per key is a
    * single double (the last EMA), so state size is O(#keys) regardless of
    * stream length — the mapGroupsWithState analog of the reference's
    * insert-trigger incremental update.
    *
    * Within one micro-batch the group's rows are sorted by (ts, tiebreak)
    * before folding; across batches the watermark-ordered file source
    * delivers batches in append order, matching the reference's requirement
    * that appends arrive in timestamp order (user_guide.html "When data is
    * loaded...").
    */
  def emaStream(events: Dataset[Row], key: String, ts: String, tiebreak: String,
                value: String, n: Int): DataFrame = {
    import events.sparkSession.implicits._
    val p = 2.0 / (n + 1)
    val kIdx = events.schema.fieldIndex(key)
    require(events.schema(kIdx).dataType == org.apache.spark.sql.types.StringType,
      s"emaStream keys on a STRING column; '$key' is " +
        s"${events.schema(kIdx).dataType.sql} — cast it (asofStream is the " +
        "numeric-keyed sibling)")
    val tIdx = events.schema.fieldIndex(ts)
    val bIdx = events.schema.fieldIndex(tiebreak)
    val vIdx = events.schema.fieldIndex(value)
    events
      .groupByKey(r => r.getAs[String](kIdx))
      // state is (last ema, seen): an explicit seen flag, NOT a NaN
      // sentinel — Moving.ema propagates a NaN VALUE to every later row
      // of the key (affine recurrence), and a sentinel would both reseed
      // after a NaN and skip the state update when a batch ENDS on NaN,
      // diverging from the batch twin in the next micro-batch
      .flatMapGroupsWithState[(Double, Boolean), (String, Long, Long, Double)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (k: String, rows: Iterator[Row], state: GroupState[(Double, Boolean)]) =>
          val sorted = rows.toSeq.sortBy(r =>
            (r.getAs[Number](tIdx).longValue(), r.getAs[Number](bIdx).longValue()))
          var (prev, seen) = state.getOption.getOrElse((0.0, false))
          val out = sorted.map { r =>
            val x = r.getAs[Number](vIdx).doubleValue()
            prev = if (!seen) { seen = true; x } else x * p + prev * (1 - p)
            (k, r.getAs[Number](tIdx).longValue(),
              r.getAs[Number](bIdx).longValue(), prev)
          }
          if (seen) state.update((prev, seen))
          out.iterator
      }
      .toDF(key, ts, tiebreak, "ema")
  }
}
