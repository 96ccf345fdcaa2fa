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
}
