package graft

import graft.join.Align
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Alignment joins (reference sql/spec.sql; func.c:4308-4801). */
class AlignSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val left = Seq(("k", 5L), ("k", 10L), ("k", 15L), ("k", 3L)).toDF("key", "ts")
  val right = Seq(("k", 4L, "a"), ("k", 10L, "b"), ("k", 20L, "c")).toDF("key", "ts", "v")

  test("asofJoin: latest right value with ts <= left ts, inclusive") {
    val r = Align.asofJoin(left, right, Seq("key"), "ts", "v").orderBy("ts")
      .select("ts", "asof_value").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("-")))
    assert(r.toSeq == Seq((3L, "-"), (5L, "a"), (10L, "b"), (15L, "b")))
  }

  test("asofJoin with no key partitions (global series)") {
    val l = Seq(Tuple1(7L)).toDF("ts")
    val r = Seq((5L, 1.5), (6L, 2.5)).toDF("ts", "v")
    val out = Align.asofJoin(l, r, Seq(), "ts", "v").head()
    assert(out.getDouble(out.fieldIndex("asof_value")) == 2.5)
  }

  test("stretch fills the before-any-right gap (cs_stretch)") {
    val r = Align.stretch(left, right, Seq("key"), "ts", "v", lit("FILL")).orderBy("ts")
      .select("stretch_value").as[String].collect().toSeq
    assert(r == Seq("FILL", "a", "b", "b"))
  }

  test("stretch0 fills only exact-ts misses (cs_stretch0)") {
    val r = Align.stretch0(left, right, Seq("key"), "ts", "v", lit("Z")).orderBy("ts")
      .select("stretch_value").as[String].collect().toSeq
    assert(r == Seq("Z", "Z", "b", "Z"))
  }

  test("equiJoin keeps exact ts matches only (cs_join)") {
    val r = Align.equiJoin(left, right, Seq("key"), "ts", "v").select("ts", "join_value")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(r.toSeq == Seq((10L, "b")))
  }

  test("asofJoinTol: staleness bound + NULL right values don't mask real matches") {
    val l = Seq(("k", 30L), ("k", 100L)).toDF("key", "ts")
    val r = Seq(("k", 1L, Some(5.0)), ("k", 2L, None)).toDF("key", "ts", "v")
    val out = Align.asofJoinTol(l, r, Seq("key"), "ts", "v", lit(50L))
      .orderBy("ts").select("ts", "asof_value")
      .collect().map(x => (x.getLong(0), Option(x.get(1)))).toSeq
    // ts=30: NULL-valued row at ts=2 must not mask the real match at ts=1
    // (base as-of semantics); ts=100: match is 99 stale > 50 → no match
    assert(out == Seq((30L, Some(5.0)), (100L, None)))
  }

  test("bloomFilteredJoin equals the plain inner join (false positives removed)") {
    val big = (1L to 2000L).map(i => (i, s"r$i")).toDF("k", "payload")
    val build = Seq((5L, "a"), (500L, "b"), (1500L, "c")).toDF("k", "tag")
    val got = Align.bloomFilteredJoin(big, build, Seq("k"), expectedItems = 100)
      .select("k", "payload", "tag")
    val plain = big.join(build, Seq("k")).select("k", "payload", "tag")
    assert(got.exceptAll(plain).isEmpty && plain.exceptAll(got).isEmpty)
    assert(got.count() == 3)
  }

  test("keyless as-of scan equals the keyed path on a single-key frame") {
    // the keyed path is window-based, the keyless path is the ranged
    // carry-forward scan; on a constant-key frame they must agree exactly
    val l = Seq.tabulate(200)(i => ("k", i.toLong * 3 + 1)).toDF("key", "ts")
    val r = Seq.tabulate(80)(i => ("k", i.toLong * 7, i * 1.5)).toDF("key", "ts", "v")
    for (dir <- Seq(-1, 1)) {
      val keyed = Align.asofJoinDir(l, r, Seq("key"), "ts", "v", direction = dir)
        .select("ts", "asof_value")
      val keyless = Align.asofJoinDir(l.drop("key"), r.drop("key"), Seq(), "ts", "v", direction = dir)
        .select("ts", "asof_value")
      assert(keyed.exceptAll(keyless).isEmpty && keyless.exceptAll(keyed).isEmpty,
        s"direction $dir diverged")
    }
  }

  test("keyless as-of carries integral values exactly (pos carry)") {
    val l = Seq(10L, 20L, 3L).toDF("ts")
    val r = Seq((5L, 100L), (15L, 200L)).toDF("ts", "pos")
    val out = Align.asofJoinPos(l, r, Seq(), "ts").orderBy("ts")
      .select("right_pos").collect().map(x => Option(x.get(0))).toSeq
    assert(out == Seq(None, Some(100L), Some(200L)))
  }

  test("keyless asofJoinTol: struct carry with staleness bound") {
    val l = Seq(30L, 100L).toDF("ts")
    val r = Seq((1L, Some(5.0)), (2L, None)).toDF("ts", "v")
    val out = Align.asofJoinTol(l, r, Seq(), "ts", "v", lit(50L))
      .orderBy("ts").select("ts", "asof_value")
      .collect().map(x => (x.getLong(0), Option(x.get(1)))).toSeq
    // same contract as the keyed test: NULL right rows neither match nor
    // mask; staleness beyond tolerance drops the match
    assert(out == Seq((30L, Some(5.0)), (100L, None)))
  }

  test("bloomFilteredJoin handles string keys (UTF-8 hash path)") {
    val big = (1 to 500).map(i => (s"key$i", i)).toDF("k", "payload")
    val build = Seq(("key7", "a"), ("key300", "b")).toDF("k", "tag")
    val got = Align.bloomFilteredJoin(big, build, Seq("k"), expectedItems = 50)
      .select("k", "payload", "tag")
    val plain = big.join(build, Seq("k")).select("k", "payload", "tag")
    assert(got.exceptAll(plain).isEmpty && plain.exceptAll(got).isEmpty)
    assert(got.count() == 2)
  }

  test("unionMerge keeps duplicates (cs_union)") {
    val a = Seq(("k", 1L)).toDF("key", "ts")
    val b = Seq(("k", 1L), ("k", 2L)).toDF("key", "ts")
    assert(Align.unionMerge(a, b).count() == 3)
  }
}
