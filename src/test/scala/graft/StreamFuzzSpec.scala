package graft

import graft.streaming.Streams
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Randomized stream==batch differential: the streaming surface is the
  * one area the DuckDB oracle cannot reach (the driver's gate only sees
  * batch parquet), so its verification lives here — N seeded random
  * window/aggregation configurations, each run through Structured
  * Streaming (Trigger.AvailableNow over a file source) AND its batch twin
  * (the same winAgg expression on a static frame), asserted exactly
  * equal. Randomizing spans/slides/gaps/keys/quantiles covers the
  * parameter space the fixed StreamingDictSpec shapes cannot:
  * non-aligned bucket widths, slide/window ratios, session gaps shorter
  * than event spacing (single-event sessions), tail quantiles.
  *
  * Exactness is sound here: HLL folds deterministically, and at this
  * data scale every window holds far fewer values than the KLL sketch's
  * exact-regime capacity, so stream-vs-batch partial-fold order cannot
  * diverge. Tunables: GRAFT_STREAM_FUZZ_N (default 6),
  * GRAFT_STREAM_FUZZ_SEED (default 100).
  */
class StreamFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val srcDir: String = {
    val dir = TestSpark.stageEvents(sfDir, "stream_fuzz_events")
    dir.toString
  }
  private lazy val schema = graft.io.Tables.read(spark, sfDir, "events").schema
  private lazy val batchDf = graft.io.Tables.read(spark, sfDir, "events")

  private def assertTwin(label: String, stream: DataFrame, batch: DataFrame,
                         name: String): Unit = {
    val got = Streams.runAvailableNow(stream, name)
    assert(got.count() > 0, s"$label produced no rows")
    val extra = got.exceptAll(batch).count()
    val missing = batch.exceptAll(got).count()
    assert(extra == 0 && missing == 0,
      s"$label stream != batch: $extra extra, $missing missing rows")
  }

  /** Split `sorted` (ascending ts at `tsOf`) into batches whose cuts fall
    * only BETWEEN distinct ts values — the append-order contract both
    * stateful streams document (an equal-ts group split across batches
    * would let a left row emit before its same-ts right row arrives).
    */
  private def tsBatches[A](sorted: Seq[A], tsOf: A => Long,
                           rnd: Random): Seq[Seq[A]] = {
    val cuts = (1 until sorted.size)
      .filter(i => tsOf(sorted(i - 1)) != tsOf(sorted(i)))
      .filter(_ => rnd.nextInt(10) == 0)
    (Seq(0) ++ cuts ++ Seq(sorted.size)).sliding(2).map {
      case Seq(a, b) => sorted.slice(a, b)
    }.toSeq.filter(_.nonEmpty)
  }

  private def drainBatches[A](ms: org.apache.spark.sql.execution.streaming.runtime.MemoryStream[A],
                              out: DataFrame, tag: String,
                              batches: Seq[Seq[A]]): DataFrame = {
    val q = out.writeStream.format("memory").queryName(tag)
      .outputMode("append").start()
    try batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    finally q.stop()
    spark.table(tag)
  }

  test("random MULTI-BATCH as-of streams equal the batch twin (cross-batch state)") {
    // the fixed StreamingDictSpec shape drives asofStream with the whole
    // input in ONE batch; here random batch boundaries force the carried
    // (value, seen) state to survive micro-batch handoffs — with NULL
    // right values (neither match nor mask), heavy ts ties, and key counts
    // from 1 (every batch hits the same state entry) to 4
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val n = sys.env.get("GRAFT_STREAM_FUZZ_N").map(_.toInt).getOrElse(4)
    val seed0 = sys.env.get("GRAFT_STREAM_FUZZ_SEED").map(_.toLong).getOrElse(100L)
    for (i <- 0 until n) {
      val rnd = new Random(seed0 + 500 + i)
      val nKeys = 1 + rnd.nextInt(4)
      val raw = (0 until 300).map { j =>
        val side = if (rnd.nextInt(3) == 0) 0 else 1
        val v: Option[Double] =
          if (side == 0 && rnd.nextInt(5) == 0) None
          else Some(math.rint(rnd.nextDouble() * 1000) / 10)
        ((rnd.nextInt(nKeys) + 1).toLong, rnd.nextInt(40).toLong, j.toLong, side, v)
      }
      // at most one RIGHT row per (key, ts): with several, which value the
      // carry takes is tiebreak-order-specific in the stream but
      // nondeterministic in the window form (same dedup the fixed test does)
      val rSeen = scala.collection.mutable.Set.empty[(Long, Long)]
      val rows = raw.filter(r => r._4 == 1 || rSeen.add((r._1, r._2)))
      val sorted = rows.sortBy(_._2)
      val batches = tsBatches[(Long, Long, Long, Int, Option[Double])](
        sorted, _._2, rnd)
      val ms = MemoryStream[(Long, Long, Long, Int, Option[Double])]
      val out = Streams.asofStream(
        ms.toDS().toDF("user_id", "ts", "event_id", "side", "value"),
        "user_id", "ts", "event_id", "side", "value")
      val got = drainBatches(ms, out, s"sfz_asof_${seed0 + 500 + i}", batches)
        .select("user_id", "ts", "event_id", "asof_value")
      val df = rows.toDF("user_id", "ts", "event_id", "side", "value")
      val l = df.filter(col("side") === 1).select("user_id", "ts", "event_id")
      val r = df.filter(col("side") === 0).select("user_id", "ts", "value")
      val batch = graft.join.Align
        .asofJoin(l, r, Seq("user_id"), "ts", "value")
        .select("user_id", "ts", "event_id", "asof_value")
      assert(got.count() == batch.count() && got.count() > 0,
        s"seed=${seed0 + 500 + i} row counts diverge over ${batches.size} batches")
      assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty,
        s"seed=${seed0 + 500 + i} multi-batch as-of != batch twin " +
          s"(${batches.size} batches, $nKeys keys)")
    }
  }

  test("random MULTI-BATCH EMA streams equal batch Moving.ema (cross-batch state)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val n = sys.env.get("GRAFT_STREAM_FUZZ_N").map(_.toInt).getOrElse(4)
    val seed0 = sys.env.get("GRAFT_STREAM_FUZZ_SEED").map(_.toLong).getOrElse(100L)
    for (i <- 0 until n) {
      val rnd = new Random(seed0 + 700 + i)
      val keys = Vector("a", "b", "c").take(1 + rnd.nextInt(3))
      val period = 2 + rnd.nextInt(30)
      val rows = (0 until 250).map { j =>
        (keys(rnd.nextInt(keys.size)), rnd.nextInt(60).toLong, j.toLong,
          math.rint(rnd.nextDouble() * 1000) / 10)
      }
      val sorted = rows.sortBy(_._2)
      val batches = tsBatches[(String, Long, Long, Double)](sorted, _._2, rnd)
      val ms = MemoryStream[(String, Long, Long, Double)]
      val out = Streams.emaStream(
        ms.toDS().toDF("event_type", "ts", "event_id", "value"),
        "event_type", "ts", "event_id", "value", period)
      val got = drainBatches(ms, out, s"sfz_ema_${seed0 + 700 + i}", batches)
        .select("event_type", "ts", "event_id", "ema")
      val df = rows.toDF("event_type", "ts", "event_id", "value")
      val batch = graft.window.Moving.ema(
        graft.series.Series.attachPos(df, Seq("event_type"),
          Seq(col("ts"), col("event_id"))),
        Seq("event_type"), "value", period)
        .select("event_type", "ts", "event_id", "ema")
      val diff = got.as("a").join(batch.as("b"),
          col("a.event_type") === col("b.event_type") &&
            col("a.event_id") === col("b.event_id"))
        .filter(abs(col("a.ema") - col("b.ema")) > 1e-9)
      assert(got.count() == batch.count() && got.count() > 0)
      assert(diff.isEmpty,
        s"seed=${seed0 + 700 + i} multi-batch EMA != Moving.ema " +
          s"(${batches.size} batches, n=$period)")
    }
  }

  test("random windowed sketch configs: stream equals batch twin") {
    val n = sys.env.get("GRAFT_STREAM_FUZZ_N").map(_.toInt).getOrElse(6)
    val seed0 = sys.env.get("GRAFT_STREAM_FUZZ_SEED").map(_.toLong).getOrElse(100L)
    info(s"stream-fuzzing $n configs from seed $seed0")
    for (i <- 0 until n) {
      val rnd = new Random(seed0 + i)
      val bucket = Vector(600L, 1800L, 3600L, 7200L)(rnd.nextInt(4))
      val win = Vector(1800L, 3600L, 7200L)(rnd.nextInt(3))
      val slide = Vector(600L, 900L, 1800L)(rnd.nextInt(3))
      val gap = Vector(300L, 900L, 3600L)(rnd.nextInt(3))
      val key = Vector("user_id", "event_id")(rnd.nextInt(2))
      val q = Vector(0.1, 0.5, 0.9, 0.99)(rnd.nextInt(4))
      val lgK = Vector(10, 12)(rnd.nextInt(2))
      val variant = rnd.nextInt(6)
      val tag = s"sfz_${seed0 + i}"
      variant match {
        case 0 => assertTwin(s"seed=${seed0 + i} tumblingDC($bucket,$key,lgK=$lgK)",
          Streams.tumblingApproxDistinct(spark, srcDir, schema, key, bucket, lgK),
          Streams.tumblingApproxDistinctBatch(batchDf, key, bucket, lgK), tag)
        case 1 => assertTwin(s"seed=${seed0 + i} slidingDC($win/$slide,$key)",
          Streams.slidingApproxDistinct(spark, srcDir, schema, key, win, slide, lgK),
          Streams.slidingApproxDistinctBatch(batchDf, key, win, slide, lgK), tag)
        case 2 => assertTwin(s"seed=${seed0 + i} sessionDC(gap=$gap,$key)",
          Streams.sessionApproxDistinct(spark, srcDir, schema, key, gap, lgK),
          Streams.sessionApproxDistinctBatch(batchDf, key, gap, lgK), tag)
        case 3 => assertTwin(s"seed=${seed0 + i} tumblingKLL($bucket,q=$q)",
          Streams.tumblingApproxQuantile(spark, srcDir, schema, "value", q, bucket),
          Streams.tumblingApproxQuantileBatch(batchDf, "value", q, bucket), tag)
        case 4 => assertTwin(s"seed=${seed0 + i} slidingKLL($win/$slide,q=$q)",
          Streams.slidingApproxQuantile(spark, srcDir, schema, "value", q, win, slide),
          Streams.slidingApproxQuantileBatch(batchDf, "value", q, win, slide), tag)
        case 5 => assertTwin(s"seed=${seed0 + i} sessionKLL(gap=$gap,q=$q)",
          Streams.sessionApproxQuantile(spark, srcDir, schema, "value", q, gap),
          Streams.sessionApproxQuantileBatch(batchDf, "value", q, gap), tag)
      }
    }
  }

  test("random MULTI-PHASE checkpoint restarts equal the batch twin (stateful EMA)") {
    // the fixed StreamingDictSpec recovery gate stops once; here the
    // query is stopped and restarted from its checkpoint a RANDOM number
    // of times (2-4 phases at random ts cuts), each phase landing one
    // more source file — per-key EMA state must survive every restart
    // and the append-mode file sink must stay exactly-once end to end
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val n = sys.env.get("GRAFT_STREAM_FUZZ_N").map(_.toInt).getOrElse(3)
    val seed0 = sys.env.get("GRAFT_STREAM_FUZZ_SEED").map(_.toLong).getOrElse(100L)
    for (i <- 0 until n) {
      val rnd = new Random(seed0 + 900 + i)
      val keys = Vector("a", "b", "c").take(1 + rnd.nextInt(3))
      val period = 2 + rnd.nextInt(20)
      val rows = (0 until 300).map { j =>
        (keys(rnd.nextInt(keys.size)), j.toLong, j.toLong,
          math.rint(rnd.nextDouble() * 1000) / 10)
      }
      val nPhases = 2 + rnd.nextInt(3)
      val cutsAt = (1 until nPhases)
        .map(_ => 1 + rnd.nextInt(rows.size - 1)).distinct.sorted
      val phases = (Seq(0) ++ cutsAt ++ Seq(rows.size)).sliding(2)
        .map { case Seq(a, b) => rows.slice(a, b) }.toSeq.filter(_.nonEmpty)
      val base = java.nio.file.Files
        .createTempDirectory(s"graft_ckpt_fuzz_$i").toString
      phases.head.toDF("k", "ts", "id", "v").coalesce(1)
        .write.mode("append").parquet(s"$base/src")
      val schema = spark.read.parquet(s"$base/src").schema
      var batchesSeen = 0
      for ((phase, pi) <- phases.zipWithIndex) {
        if (pi > 0) phase.toDF("k", "ts", "id", "v").coalesce(1)
          .write.mode("append").parquet(s"$base/src")
        val out = Streams.emaStream(
          spark.readStream.schema(schema).parquet(s"$base/src"),
          "k", "ts", "id", "v", period)
        val q = out.writeStream.format("parquet")
          .option("path", s"$base/sink")
          .option("checkpointLocation", s"$base/ck")
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        val committed = Option(new java.io.File(s"$base/ck/offsets").list())
          .map(_.count(f => !f.startsWith(".") && !f.endsWith(".tmp")))
          .getOrElse(0)
        assert(committed > batchesSeen,
          s"seed=${seed0 + 900 + i} phase $pi committed no batch")
        batchesSeen = committed
      }
      val got = spark.read.parquet(s"$base/sink").select("k", "ts", "ema")
      val batch = graft.window.Moving.ema(
        graft.series.Series.attachPos(rows.toDF("k", "ts", "id", "v"),
          Seq("k"), Seq(col("ts"), col("id"))),
        Seq("k"), "v", period).select(col("k"), col("ts"), col("ema"))
      assert(got.count() == batch.count() && got.count() > 0,
        s"seed=${seed0 + 900 + i}: sink row count across ${phases.size} restarts")
      val joined = got.as("a").join(batch.as("b"),
        col("a.k") === col("b.k") && col("a.ts") === col("b.ts"))
      assert(joined.count() == batch.count())
      assert(joined.filter(abs(col("a.ema") - col("b.ema")) > 1e-9).isEmpty,
        s"seed=${seed0 + 900 + i}: EMA diverged across ${phases.size} restarts")
    }
  }
}
