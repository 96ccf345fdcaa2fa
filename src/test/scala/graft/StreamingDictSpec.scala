package graft

import graft.series.{Conditional, Series}
import graft.streaming.Streams
import graft.text.Dict
import graft.window.Moving
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming/batch agreement, dictionary codes, cs_if, ranged pos. */
class StreamingDictSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val sfDir = "/root/testdata/sf0.001"

  test("streaming tumbling agg equals the batch answer (Trigger.AvailableNow)") {
    // The file streaming source needs a DIRECTORY; testdata ships one file.
    val dir = TestSpark.stageEvents(sfDir, "stream_events")
    val schema = graft.io.Tables.read(spark, sfDir, "events").schema
    val stream = Streams.tumblingAgg(spark, dir.toString, schema)
    val got = Streams.runAvailableNow(stream, "t_tumbling")
      .select(col("event_type"), col("bucket_start"), col("n"), col("sv"))
    val batch = graft.io.Tables.read(spark, sfDir, "events")
      .groupBy(col("event_type"),
        timestamp_micros(expr("ts div 1000") -
          pmod(expr("ts div 1000"), lit(3600000000L))).as("bucket_start"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
    assert(got.count() == batch.count())
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
  }

  test("streaming windowed HLL approx-distinct equals its batch twin") {
    // stream-time cardinality: per-window state is one KB-scale sketch,
    // never the key set; the deterministic sketch makes stream == batch
    // EXACT equality (same HLL algorithm folds the same values)
    val dir = TestSpark.stageEvents(sfDir, "stream_events_hll")
    val schema = graft.io.Tables.read(spark, sfDir, "events").schema
    val stream = Streams.tumblingApproxDistinct(spark, dir.toString, schema, "user_id")
    val got = Streams.runAvailableNow(stream, "t_hll")
    val batch = Streams.tumblingApproxDistinctBatch(
      graft.io.Tables.read(spark, sfDir, "events"), "user_id")
    assert(got.count() == batch.count() && got.count() > 0)
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
    // sanity: estimates land within HLL error of the exact distinct count
    val exact = graft.io.Tables.read(spark, sfDir, "events")
      .groupBy(col("event_type"),
        window(timestamp_micros(expr("ts div 1000")), "3600 seconds"))
      .agg(countDistinct(col("user_id")).as("dc"))
      .select(col("event_type"), col("window.start").as("bucket_start"), col("dc"))
    val off = got.join(exact, Seq("event_type", "bucket_start"))
      .filter(abs(col("approx_users") - col("dc")) / col("dc") > 0.15)
    assert(off.isEmpty)
  }

  test("SLIDING streaming HLL approx-distinct equals its batch twin") {
    // the live-dashboard shape: uniques over a 2-day window sliding every
    // 12h — each event lands in 4 overlapping windows, per-window state
    // is still one sketch; the deterministic sketch makes stream==batch
    // equality exact
    val dir = TestSpark.stageEvents(sfDir, "stream_events_hll_sl")
    val schema = graft.io.Tables.read(spark, sfDir, "events").schema
    val win = 2L * 86400L; val slide = 43200L
    val stream = Streams.slidingApproxDistinct(spark, dir.toString, schema,
      "user_id", win, slide)
    val got = Streams.runAvailableNow(stream, "t_hll_sl")
    val batch = Streams.slidingApproxDistinctBatch(
      graft.io.Tables.read(spark, sfDir, "events"), "user_id", win, slide)
    assert(got.count() == batch.count() && got.count() > 0)
    // sliding windows really overlap: more windows than the tumbling twin
    val tumbling = Streams.tumblingApproxDistinctBatch(
      graft.io.Tables.read(spark, sfDir, "events"), "user_id", win)
    assert(got.count() > tumbling.count())
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
    // estimates within HLL error of each sliding window's exact count
    val exact = graft.io.Tables.read(spark, sfDir, "events")
      .groupBy(col("event_type"),
        window(timestamp_micros(expr("ts div 1000")),
          s"$win seconds", s"$slide seconds"))
      .agg(countDistinct(col("user_id")).as("dc"))
      .select(col("event_type"), col("window.start").as("bucket_start"), col("dc"))
    val off = got.join(exact, Seq("event_type", "bucket_start"))
      .filter(abs(col("approx_users") - col("dc")) / col("dc") > 0.15)
    assert(off.isEmpty)
  }

  test("SESSION-window streaming HLL approx-distinct equals its batch twin") {
    // uniques per activity burst: sessions close 1 day after the last
    // event; one sketch per open session
    val dir = TestSpark.stageEvents(sfDir, "stream_events_hll_se")
    val schema = graft.io.Tables.read(spark, sfDir, "events").schema
    val stream = Streams.sessionApproxDistinct(spark, dir.toString, schema,
      "user_id", gapSeconds = 86400L)
    val got = Streams.runAvailableNow(stream, "t_hll_se")
    val batch = Streams.sessionApproxDistinctBatch(
      graft.io.Tables.read(spark, sfDir, "events"), "user_id", gapSeconds = 86400L)
    assert(got.count() == batch.count() && got.count() > 0)
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
  }

  test("SLIDING streaming KLL quantile equals its batch twin") {
    val dir = TestSpark.stageEvents(sfDir, "stream_events_kll_sl")
    val schema = graft.io.Tables.read(spark, sfDir, "events").schema
    // 16-day window sliding 8 days (same density reasoning as the
    // tumbling KLL test: windows stay under KLL's k=200 retention, where
    // the sketch is exact and stream==batch equality is sound)
    val win = 16L * 86400L; val slide = 8L * 86400L
    val stream = Streams.slidingApproxQuantile(spark, dir.toString, schema,
      "value", 0.9, win, slide)
    val got = Streams.runAvailableNow(stream, "t_kll_sl")
    val batch = Streams.slidingApproxQuantileBatch(
      graft.io.Tables.read(spark, sfDir, "events"), "value", 0.9, win, slide)
    assert(got.count() == batch.count() && got.count() > 0)
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
  }

  test("SESSION-window streaming KLL quantile equals its batch twin") {
    val dir = TestSpark.stageEvents(sfDir, "stream_events_kll_se")
    val schema = graft.io.Tables.read(spark, sfDir, "events").schema
    // 6-hour gap: the fixture's ~3.6h mean per-type spacing splits into
    // MANY short sessions, each far under KLL's k=200 retention — inside
    // which the sketch is exact and stream == batch equality is sound (a
    // multi-day gap merges ~200-event runs, crossing k where randomized
    // compaction makes equality merge-order dependent)
    val stream = Streams.sessionApproxQuantile(spark, dir.toString, schema,
      "value", 0.9, gapSeconds = 6L * 3600L)
    val got = Streams.runAvailableNow(stream, "t_kll_se")
    val batch = Streams.sessionApproxQuantileBatch(
      graft.io.Tables.read(spark, sfDir, "events"), "value", 0.9,
      gapSeconds = 6L * 3600L)
    assert(got.count() == batch.count() && got.count() > 0)
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
  }

  test("streaming windowed KLL quantile equals its batch twin") {
    val dir = TestSpark.stageEvents(sfDir, "stream_events_kll")
    val schema = graft.io.Tables.read(spark, sfDir, "events").schema
    // 16-day windows: the fixture is ~200 events per event_type over 30
    // days, so hourly windows top out at ~3 events — the rank gate below
    // would be VACUOUS; 16 days gives ~2 windows per type of ~100 events
    // each — dense enough to check real rows, yet under KLL's k=200
    // retention bound, inside which the sketch is exact and
    // stream==batch equality is sound (past k, randomized compaction
    // makes equality merge-order dependent)
    val bucketSec = 16L * 86400L
    val stream = Streams.tumblingApproxQuantile(spark, dir.toString, schema,
      "value", 0.9, bucketSeconds = bucketSec)
    val got = Streams.runAvailableNow(stream, "t_kll")
    val batch = Streams.tumblingApproxQuantileBatch(
      graft.io.Tables.read(spark, sfDir, "events"), "value", 0.9,
      bucketSeconds = bucketSec)
    assert(got.count() == batch.count() && got.count() > 0)
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
    // estimates stay within 5% RANK error of 0.9 against the raw rows
    val raw = graft.io.Tables.read(spark, sfDir, "events")
      .groupBy(col("event_type"),
        window(timestamp_micros(expr("ts div 1000")), s"$bucketSec seconds"))
      .agg(collect_list(col("value")).as("vs"))
      .select(col("event_type"), col("window.start").as("bucket_start"), col("vs"))
    // self-protection for the two bounds this test leans on: the gated
    // set must be NONEMPTY (else the rank assertion checks nothing) and
    // no window may reach k=200 (else the equality above is unsound)
    val sizes = raw
      .agg(max(expr("size(vs)")).as("mx"),
        sum(when(expr("size(vs) >= 50"), 1L).otherwise(0L)).as("dense"))
      .head()
    assert(sizes.getLong(1) > 0, "no window dense enough - rank gate vacuous")
    assert(sizes.getInt(0) < 200, s"window of ${sizes.getInt(0)} rows exceeds KLL k")
    val off = got.join(raw, Seq("event_type", "bucket_start"))
      .filter(expr("size(vs) >= 50"))
      .withColumn("rank",
        expr("size(filter(vs, v -> v <= approx_q)) / size(vs)"))
      .filter(abs(col("rank") - 0.9) > 0.05)
    assert(off.isEmpty)
  }

  test("streaming EMA (flatMapGroupsWithState) equals batch Moving.ema") {
    val ev = graft.io.Tables.read(spark, sfDir, "events")
      .filter(col("event_id") < 200)
      .select(col("event_type"), col("ts"), col("event_id"), col("value"))
    val got = Streams.emaStream(ev, "event_type", "ts", "event_id", "value", 10)
      .select(col("event_type"), col("ts"), col("ema"))
    val batch = Moving.ema(
      Series.attachPos(ev, Seq("event_type"), Seq(col("ts"), col("event_id"))),
      Seq("event_type"), "value", 10)
      .select(col("event_type"), col("ts"), col("ema"))
    val diff = got.as("a").join(batch.as("b"),
        col("a.event_type") === col("b.event_type") && col("a.ts") === col("b.ts"))
      .filter(abs(col("a.ema") - col("b.ema")) > 1e-9)
    assert(got.count() == batch.count())
    assert(diff.isEmpty)
  }

  test("streaming as-of (flatMapGroupsWithState) equals batch Align.asofJoin") {
    val ev = graft.io.Tables.read(spark, sfDir, "events")
      .filter(col("event_id") < 500)
    // right side deduped per (key, ts) so equal-ts ties can't make the
    // carried value order-dependent between the two formulations
    val r = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("value"), min(col("event_id")).as("event_id"))
    val l = ev.filter(col("event_type") =!= "signup")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val tagged = l.withColumn("side", lit(1))
      .unionByName(r.withColumn("side", lit(0))
        .select(col("user_id"), col("ts"), col("event_id"), col("value"), col("side")))
    val got = graft.streaming.Streams
      .asofStream(tagged, "user_id", "ts", "event_id", "side", "value")
      .select(col("user_id"), col("ts"), col("event_id"), col("asof_value"))
    val batch = graft.join.Align.asofJoin(
      l, r.select(col("user_id"), col("ts"), col("value")), Seq("user_id"), "ts", "value")
      .select(col("user_id"), col("ts"), col("event_id"), col("asof_value"))
    assert(got.count() == batch.count() && got.count() > 0)
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
  }

  /** Batch-id count from a checkpoint's offsets log — the witness that a
    * phase really processed micro-batches (and that a restart CONTINUED
    * the numbering instead of starting over).
    */
  private def committedBatches(ck: String): Int =
    Option(new java.io.File(s"$ck/offsets").list())
      .map(_.count(f => !f.startsWith(".") && !f.endsWith(".tmp")))
      .getOrElse(0)

  test("checkpoint recovery: tumbling agg stops mid-stream, resumes exactly-once") {
    // q_stream_sink proves the sink path once-through; this kills the
    // query between micro-batches and restarts it FROM THE CHECKPOINT:
    // phase 1 drains the early files (Trigger.AvailableNow terminates —
    // the planned stop), phase 2 adds later files and restarts with the
    // same checkpoint + target. The recovered aggregation state must
    // merge phases into exactly the uninterrupted twin's artifact.
    val base = java.nio.file.Files.createTempDirectory("graft_ckpt_tumb").toString
    val ev = graft.io.Tables.read(spark, sfDir, "events")
    val mm = ev.agg(min("ts"), max("ts")).head()
    val cut = mm.getLong(0) / 2 + mm.getLong(1) / 2
    val src = s"$base/src"
    ev.filter(col("ts") < cut).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    def query() = Streams.tumblingAgg(spark, src, schema, 3600L)
    Streams.runToParquet(query(), s"$base/out", s"$base/ck")
    val phase1Batches = committedBatches(s"$base/ck")
    assert(phase1Batches >= 1, "phase 1 must commit at least one batch")
    // the stop happened (AvailableNow terminated); now the later data
    // arrives and the query RESTARTS from the same checkpoint
    ev.filter(col("ts") >= cut).write.mode("append").parquet(src)
    val recovered = Streams.runToParquet(query(), s"$base/out", s"$base/ck")
    assert(committedBatches(s"$base/ck") > phase1Batches,
      "the restart must commit batches of its own (continued numbering)")
    // uninterrupted twin: same query, all files, fresh checkpoint
    val twin = Streams.runToParquet(query(), s"$base/out_twin", s"$base/ck_twin")
    assert(recovered.count() == twin.count() && recovered.count() > 0)
    assert(recovered.exceptAll(twin).isEmpty && twin.exceptAll(recovered).isEmpty,
      "recovered tumbling artifact != uninterrupted twin")
  }

  test("checkpoint recovery: stateful EMA carries its state across the restart") {
    // the flatMapGroupsWithState per-key EMA state must survive a stop +
    // checkpoint restart: phase 2's first row folds against phase 1's
    // LAST ema, which only recovery of the state store can supply. File
    // sink (append mode) gives the exactly-once on-disk artifact.
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("graft_ckpt_ema").toString
    val rows = (0 until 400).map { i =>
      (if (i % 3 == 0) "a" else "b", i.toLong, i.toLong,
        math.rint(math.sin(i) * 1000) / 10)
    }
    val (p1, p2) = rows.partition(_._2 < 200)
    val src = s"$base/src"
    p1.toDF("k", "ts", "id", "v").coalesce(1).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    def runPhase(): Unit = {
      val out = Streams.emaStream(
        spark.readStream.schema(schema).parquet(src), "k", "ts", "id", "v", 10)
      val q = out.writeStream.format("parquet")
        .option("path", s"$base/sink")
        .option("checkpointLocation", s"$base/ck")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runPhase()
    val phase1Batches = committedBatches(s"$base/ck")
    assert(phase1Batches >= 1, "phase 1 must commit at least one batch")
    p2.toDF("k", "ts", "id", "v").coalesce(1).write.mode("append").parquet(src)
    runPhase() // restart from the same checkpoint
    assert(committedBatches(s"$base/ck") > phase1Batches,
      "the restart must commit batches of its own (continued numbering)")
    val got = spark.read.parquet(s"$base/sink").select("k", "ts", "ema")
    val batch = Moving.ema(
      Series.attachPos(rows.toDF("k", "ts", "id", "v"),
        Seq("k"), Seq(col("ts"), col("id"))),
      Seq("k"), "v", 10).select(col("k"), col("ts"), col("ema"))
    assert(got.count() == batch.count() && got.count() > 0,
      "file sink must hold exactly one row per input row across the restart")
    val joined = got.as("a").join(batch.as("b"),
      col("a.k") === col("b.k") && col("a.ts") === col("b.ts"))
    assert(joined.count() == batch.count())
    assert(joined.filter(abs(col("a.ema") - col("b.ema")) > 1e-9).isEmpty,
      "phase-2 EMA values must fold against phase-1's recovered state")
  }

  test("streaming EMA propagates NaN like the batch twin (no sentinel reseed)") {
    // Moving.ema's affine recurrence makes a NaN value poison every later
    // row of its key; a NaN used as the stream's "no state yet" sentinel
    // instead RESEEDED after a NaN and dropped state when a batch ended
    // on one. The explicit seen flag must reproduce batch semantics
    // across the micro-batch boundary.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, Long, Long, Double)]
    val out = Streams.emaStream(ms.toDS().toDF("k", "ts", "id", "v"),
      "k", "ts", "id", "v", 3)
    val q = out.writeStream.format("memory").queryName("ema_nan")
      .outputMode("append").start()
    try {
      ms.addData(Seq(("k", 1L, 1L, 1.0), ("k", 2L, 2L, 2.0), ("k", 3L, 3L, Double.NaN)))
      q.processAllAvailable()
      ms.addData(Seq(("k", 4L, 4L, 4.0)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ema_nan").orderBy("ts")
      .select("ema").collect().map(_.getDouble(0))
    assert(!got(0).isNaN && !got(1).isNaN)
    assert(got(2).isNaN, "the NaN row's own ema is NaN")
    assert(got(3).isNaN,
      "the NaN must poison the NEXT batch's fold (batch-twin semantics), " +
        "not reseed the series")
  }

  test("emaStream demands a string key column (loud, not ClassCastException)") {
    val ev = graft.io.Tables.read(spark, sfDir, "events").limit(5)
    val e = intercept[IllegalArgumentException] {
      Streams.emaStream(ev, "user_id", "ts", "event_id", "value", 10)
    }
    assert(e.getMessage.contains("STRING"))
  }

  test("runToParquet: append mode keeps every micro-batch; empty source is empty, not a crash") {
    import org.apache.spark.sql.streaming.OutputMode
    val base = java.nio.file.Files.createTempDirectory("graft_rtp").toString
    new java.io.File(s"$base/src").mkdirs()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("x", org.apache.spark.sql.types.LongType)))
    def src = spark.readStream.schema(schema).parquet(s"$base/src")
    // zero micro-batches: an empty frame of the query's schema
    val empty = Streams.runToParquet(src, s"$base/out", s"$base/ck", OutputMode.Append())
    assert(empty.count() == 0)
    // two phases in APPEND mode: both batches' rows must survive (the
    // old overwrite-per-batch kept only the last one)
    import spark.implicits._
    (1L to 5L).toDF("x").coalesce(1).write.mode("append").parquet(s"$base/src")
    Streams.runToParquet(src, s"$base/out", s"$base/ck", OutputMode.Append())
    (6L to 8L).toDF("x").coalesce(1).write.mode("append").parquet(s"$base/src")
    val got = Streams.runToParquet(src, s"$base/out", s"$base/ck", OutputMode.Append())
    assert(got.count() == 8, s"append mode must retain every batch, got ${got.count()}")
    // a FRESH checkpoint pointed at the STALE outDir must refuse loudly:
    // batch numbering restarts at 0 and every row would silently append
    // on top of the previous run's artifact (duplicating it)
    val e = intercept[IllegalStateException] {
      Streams.runToParquet(src, s"$base/out", s"$base/ck2", OutputMode.Append())
    }
    assert(e.getMessage.contains("fresh"), e.getMessage)
    // the same fresh checkpoint into a fresh outDir is the normal path
    val fresh = Streams.runToParquet(src, s"$base/out2", s"$base/ck2", OutputMode.Append())
    assert(fresh.count() == 8)
  }

  test("dict codes are dense sorted ranks; str2code/code2str round-trip") {
    val df = Seq("cherry", "apple", "banana", "apple", "cherry").toDF("s")
    val dict = Dict.build(df, "s")
    val codes = dict.orderBy("code").as[(Long, String)].collect().toSeq
    assert(codes == Seq((0L, "apple"), (1L, "banana"), (2L, "cherry")))
    val coded = Dict.str2code(df, dict, "s")
    assert(coded.filter(col("s") === "banana").select("code").as[Long].head() == 1L)
    val back = Dict.code2str(coded.select(col("code")), dict, "code", "s2")
    assert(back.filter(col("code") === 2L).select("s2").as[String].head() == "cherry")
  }

  test("dictionary above the broadcast threshold joins plainly (no forced broadcast)") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    def hasBroadcastHint(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.analyzed.collectFirst { case h: ResolvedHint => h }.nonEmpty
    val df = (1 to 100).map(i => f"v$i%03d").toDF("s")
    val dict = Dict.build(df, "s")
    // under the threshold: the forced-broadcast hint is in the plan
    val bcast = Dict.str2code(df, dict, "s")
    assert(hasBroadcastHint(bcast))
    // a "large" dictionary (threshold forced below its size): no hint —
    // Catalyst plans the join normally instead of force-shipping it to
    // the driver — and the codes are identical
    val plain = Dict.str2code(df, dict, "s", maxBroadcastRows = 10)
    assert(!hasBroadcastHint(plain))
    assert(plain.orderBy("s").collect().toSeq == bcast.orderBy("s").collect().toSeq)
    // build the code frame from the UN-hinted variant: a hint in the
    // INPUT's lineage would make hasBroadcastHint vacuously true
    val backB = Dict.code2str(plain.select(col("code")), dict, "code", "s2")
    val backP = Dict.code2str(plain.select(col("code")), dict, "code", "s2",
      maxBroadcastRows = 10)
    assert(!hasBroadcastHint(backP) && hasBroadcastHint(backB))
    assert(backP.orderBy("s2").collect().toSeq == backB.orderBy("s2").collect().toSeq)
  }

  test("csIf consumes only the chosen branch (func.c:2559-2681)") {
    // cond: T F T T F  → a-index 0,_,1,2,_ ; b-index _,0,_,_,1
    val cond = Seq((0L, 1), (1L, 0), (2L, 1), (3L, 1), (4L, 0))
      .toDF("pos", "c")
    val a = Seq((0L, 10.0), (1L, 11.0), (2L, 12.0), (3L, 13.0)).toDF("pos", "v")
    val b = Seq((0L, 90.0), (1L, 91.0)).toDF("pos", "v")
    val out = Conditional.csIf(cond, Seq(), "c", a, b, "v")
      .orderBy("pos").select("if_value").as[Double].collect().toSeq
    assert(out == Seq(10.0, 90.0, 11.0, 12.0, 91.0))
  }

  test("csIf drops null conditions identically in keyless and keyed paths") {
    val cond = Seq((0L, Some(1)), (1L, None), (2L, Some(0)), (3L, Some(1)))
      .toDF("pos", "c")
    val a = Seq((0L, 10.0), (1L, 11.0)).toDF("pos", "v")
    val b = Seq((0L, 90.0)).toDF("pos", "v")
    val kl = Conditional.csIf(cond, Seq(), "c", a, b, "v")
      .orderBy("pos").select("pos", "if_value").as[(Long, Double)].collect().toSeq
    val kd = Conditional.csIf(cond.withColumn("k", lit("x")), Seq("k"),
      "c", a.withColumn("k", lit("x")), b.withColumn("k", lit("x")), "v")
      .orderBy("pos").select("pos", "if_value").as[(Long, Double)].collect().toSeq
    assert(kl == Seq((0L, 10.0), (2L, 90.0), (3L, 11.0)))
    assert(kd == kl)
  }

  test("sliding streaming agg equals batch window() aggregation") {
    val dir = TestSpark.stageEvents(sfDir, "stream_events_slide")
    val schema = graft.io.Tables.read(spark, sfDir, "events").schema
    val got = Streams.runAvailableNow(
      Streams.slidingAgg(spark, dir.toString, schema, 7200, 3600), "t_sliding")
    val batch = graft.io.Tables.read(spark, sfDir, "events")
      .withColumn("ets", timestamp_micros(expr("ts div 1000")))
      .groupBy(col("event_type"), window(col("ets"), "7200 seconds", "3600 seconds"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
      .select(col("event_type"), col("window.start").as("bucket_start"), col("n"), col("sv"))
    assert(got.count() == batch.count())
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
  }

  test("session_window streaming agg equals its batch twin") {
    val dir = TestSpark.stageEvents(sfDir, "stream_events_sess")
    val schema = graft.io.Tables.read(spark, sfDir, "events").schema
    val got = Streams.runAvailableNow(
      Streams.sessionAgg(spark, dir.toString, schema, 3600), "t_session")
    val batch = Streams.sessionAggBatch(
      graft.io.Tables.read(spark, sfDir, "events"), 3600)
    assert(got.count() == batch.count())
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
  }

  test("streaming fingerprint dedup equals batch distinct fingerprints") {
    val dir = java.nio.file.Files.createTempDirectory("stream_docs_dedup")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"),
      dir.resolve("documents.parquet"))
    val schema = graft.io.Tables.read(spark, sfDir, "documents").schema
    val got = Streams.runAvailableNow(
      Streams.dedupStream(spark, dir.toString, schema, "text"), "t_dedup",
      org.apache.spark.sql.streaming.OutputMode.Append())
    val batchFps = graft.io.Tables.read(spark, sfDir, "documents")
      .select(graft.text.TextOps.fingerprint(col("text")).as("fp")).distinct()
    // one surviving row per distinct fingerprint, same fingerprint set
    assert(got.count() == batchFps.count())
    assert(got.select("fp").exceptAll(batchFps).isEmpty)
  }

  test("watermark-bounded streaming dedup drops in-window duplicates") {
    // event-time documents fixture: 3 distinct texts, each duplicated
    // within the 1-hour watermark window; all duplicates are in-window,
    // so the result must equal the unbounded dedup (= batch distinct)
    val dir = java.nio.file.Files.createTempDirectory("stream_wm_dedup")
    val h = 3600L * 1000 * 1000 * 1000 // 1h in ns
    val base = 1704067200000000000L
    val docs = Seq(
      (base, "alpha doc"), (base + h / 2, "alpha doc"),
      (base + h / 4, "beta doc"), (base + h / 3, "beta doc"),
      (base + h, "gamma doc"), (base + h + h / 10, "gamma doc"))
      .toDF("ts", "text")
    docs.write.mode("overwrite").parquet(dir.toString + "/in")
    val got = Streams.runAvailableNow(
      Streams.dedupStreamWithinWatermark(spark, dir.toString + "/in",
        docs.schema, "text", "ts"),
      "t_wm_dedup", org.apache.spark.sql.streaming.OutputMode.Append())
    assert(got.count() == 3)
    assert(got.select("fp").distinct().count() == 3)
  }

  test("stream-stream interval join equals the batch inequality join") {
    val dir = TestSpark.stageEvents(sfDir, "stream_ivj")
    val ev = graft.io.Tables.read(spark, sfDir, "events")
    val got = Streams.runAvailableNow(
      Streams.intervalJoinStream(spark, dir.toString, ev.schema, 7 * 86400L),
      "t_interval_join", org.apache.spark.sql.streaming.OutputMode.Append())
      .select("signup_id", "purchase_id")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("ts div 1000").as("pus"),
        col("event_id").as("purchase_id"))
    val s = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), expr("ts div 1000").as("sus"),
        col("event_id").as("signup_id"))
    // batch twin on the same µs-truncated event time
    val batch = p.join(s, Seq("user_id"))
      .filter(col("pus") >= col("sus") &&
        col("pus") <= col("sus") + lit(7 * 86400L * 1000000L))
      .select("signup_id", "purchase_id")
    assert(got.count() > 0)
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty)
  }

  test("saltedEquiJoin equals the plain inner join") {
    val big = (1 to 500).map(i => (i % 3L, i.toLong)).toDF("k", "v")
    val small = Seq((0L, "a"), (1L, "b"), (2L, "c"), (2L, "c2")).toDF("k", "tag")
    val salted = graft.join.Align.saltedEquiJoin(big, small, Seq("k"), 8)
      .groupBy("k", "tag").count()
    val plain = big.join(small, Seq("k")).groupBy("k", "tag").count()
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("empty inputs: ranged numbering, affine scan, runId produce no rows") {
    val empty = Seq.empty[(Long, Double)].toDF("pos", "value")
    assert(Series.attachPosRanged(empty.drop("pos"), Seq(), Seq(col("value"))).count() == 0)
    assert(Moving.ema(empty, Seq(), "value", 5).count() == 0)
    assert(graft.agg.Aggs.attachRunId(
      empty.withColumn("b", lit(1)), Seq(), "b").count() == 0)
  }

  test("keyless trend (scan-based) equals the keyed window form") {
    val df = (0 until 40).map(i => (i.toLong, math.sin(i / 3.0) * 10))
      .toDF("pos", "value")
    val keyless = graft.analytics.Analytics.trend(df, Seq(), "value")
      .orderBy("pos").select("trend").as[Double].collect().toSeq
    val keyed = graft.analytics.Analytics.trend(
      df.withColumn("k", lit("x")), Seq("k"), "value")
      .orderBy("pos").select("trend").as[Double].collect().toSeq
    assert(keyless == keyed)
  }

  test("csIf yields null when the chosen branch is exhausted") {
    val cond = Seq((0L, 1), (1L, 1), (2L, 1)).toDF("pos", "c")
    val a = Seq((0L, 10.0)).toDF("pos", "v") // only one true-branch element
    val b = Seq((0L, 90.0)).toDF("pos", "v")
    val out = graft.series.Conditional.csIf(cond, Seq(), "c", a, b, "v")
      .orderBy("pos").select("if_value").as[Option[Double]].collect().toSeq
    assert(out == Seq(Some(10.0), None, None))
  }

  test("asofJoinDir directions are mirror images on a reversed axis") {
    val l = Seq((1L, 100L, 0.0), (1L, 200L, 0.0)).toDF("k", "ts", "lv")
    val r = Seq((1L, 150L, 5.0), (1L, 250L, 7.0)).toDF("k", "ts", "v")
    val prec = graft.join.Align.asofJoinDir(l, r, Seq("k"), "ts", "v", "o", -1)
      .orderBy("ts").select("o").as[Option[Double]].collect().toSeq
    val succ = graft.join.Align.asofJoinDir(l, r, Seq("k"), "ts", "v", "o", 1)
      .orderBy("ts").select("o").as[Option[Double]].collect().toSeq
    assert(prec == Seq(None, Some(5.0)))      // last r.ts <= l.ts
    assert(succ == Seq(Some(5.0), Some(7.0))) // first r.ts >= l.ts
  }

  test("saltedEquiJoin with an empty small side yields no rows") {
    val big = Seq((1L, 2L)).toDF("k", "v")
    val small = Seq.empty[(Long, String)].toDF("k", "tag")
    assert(graft.join.Align.saltedEquiJoin(big, small, Seq("k"), 4).isEmpty)
  }

  test("corrupt RIFF payload (negative chunk size) is rejected, not looped") {
    val bb = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(56); bb.put("WAVE".getBytes)
    bb.put("junk".getBytes); bb.putInt(-8) // negative size: would stall the walk
    assert(graft.multimodal.Multimodal.parseWav(bb.array()).isEmpty)
  }

  test("corrupt RIFF payload (near-Int.MaxValue chunk size) does not overflow the walk") {
    val bb = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(56); bb.put("WAVE".getBytes)
    // 8 + sz wraps an Int cursor negative; the loop guard then passes and
    // tag() indexes out of bounds unless the cursor is widened
    bb.put("junk".getBytes); bb.putInt(Int.MaxValue - 4)
    assert(graft.multimodal.Multimodal.parseWav(bb.array()).isEmpty)
  }

  test("keyless crossings/extrema (scan-based) equal the keyed window forms") {
    val df = (0 until 60).map(i => (i.toLong, math.sin(i / 2.5) * 5 - 0.5))
      .toDF("pos", "value")
    val dfK = df.withColumn("k", lit("x"))
    for (dir <- Seq(-1, 0, 1)) {
      val a = graft.analytics.Analytics.crossings(df, Seq(), "value", dir)
        .select("pos").as[Long].collect().sorted.toSeq
      val b = graft.analytics.Analytics.crossings(dfK, Seq("k"), "value", dir)
        .select("pos").as[Long].collect().sorted.toSeq
      assert(a == b, s"dir=$dir")
    }
    val ea = graft.analytics.Analytics.extrema(df, Seq(), "value")
      .select("pos").as[Long].collect().sorted.toSeq
    val eb = graft.analytics.Analytics.extrema(dfK, Seq("k"), "value")
      .select("pos").as[Long].collect().sorted.toSeq
    assert(ea == eb)
  }

  test("attachPosRanged matches windowed numbering on keyed data") {
    val ev = graft.io.Tables.read(spark, sfDir, "events")
    val ranged = Series.attachPosRanged(ev, Seq("event_type"),
      Seq(col("ts"), col("event_id")))
    val windowed = Series.attachPos(ev, Seq("event_type"),
      Seq(col("ts"), col("event_id")))
    val a = ranged.select("event_type", "event_id", "pos")
    val b = windowed.select("event_type", "event_id", "pos")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
