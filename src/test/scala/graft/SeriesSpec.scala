package graft

import graft.series.Series
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Positional series operators vs hand-computed expectations
  * (reference suites sql/span.sql, sql/transform.sql).
  */
class SeriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Quote fixture (FIXTURES.md / reference sql/create.sql): IBM 5 rows.
  def quote = {
    val df = Seq(
      ("IBM", 1, 10.2, 10.5, 100L), ("IBM", 2, 20.2, 20.2, 200L),
      ("IBM", 4, 30.5, 30.2, 300L), ("IBM", 5, 40.5, 40.2, 400L),
      ("IBM", 6, 50.2, 50.5, 500L),
      ("ABB", 3, 60.5, 60.2, 600L), ("ABB", 6, 70.2, 70.5, 700L)
    ).toDF("sym", "day", "open", "close", "vol")
    Series.attachPos(df, Seq("sym"), Seq(col("day")))
  }

  def posOf(df: org.apache.spark.sql.DataFrame, sym: String): Seq[Long] =
    df.filter(col("sym") === sym).orderBy("pos").select("pos")
      .as[Long].collect().toSeq

  test("attachPos: dense 0-based per key") {
    assert(posOf(quote, "IBM") == Seq(0L, 1L, 2L, 3L, 4L))
    assert(posOf(quote, "ABB") == Seq(0L, 1L))
  }

  test("span positive and negative indexes") {
    val s = Series.span(quote, Seq("sym"), 1, 3)
    assert(posOf(s, "IBM") == Seq(1L, 2L, 3L))
    val t = Series.span(quote, Seq("sym"), -2, -1) // last two
    assert(t.filter(col("sym") === "IBM").select("day").as[Int].collect().toSet == Set(5, 6))
  }

  test("thin takes every step-th element") {
    assert(posOf(Series.thin(quote, 0, 2), "IBM") == Seq(0L, 2L, 4L))
    assert(posOf(Series.thin(quote, 1, 2), "IBM") == Seq(1L, 3L))
  }

  test("head and tail") {
    assert(posOf(Series.head(quote, 2), "IBM") == Seq(0L, 1L))
    val t = Series.tail(quote, Seq("sym"), 2)
    assert(t.filter(col("sym") === "IBM").select("day").as[Int].collect().toSet == Set(5, 6))
  }

  test("reverse relabels positions") {
    val r = Series.reverse(quote, Seq("sym"))
    val firstDay = r.filter(col("sym") === "IBM" && col("pos") === 0)
      .select("day").as[Int].head()
    assert(firstDay == 6)
  }

  test("reverse and tail survive high key cardinality (no forced broadcast)") {
    // 20k distinct keys × 3 rows: the per-key count frame scales with the
    // key count — a forced broadcast hint would be the wrong plan at real
    // cardinality; correctness must hold under whatever join AQE picks
    val wide = spark.range(60000)
      .select((col("id") / 3).cast("long").as("k"), (col("id") % 3).as("pos"),
        col("id").as("v"))
    val rev = Series.reverse(wide, Seq("k"))
    assert(rev.count() == 60000)
    // every key has 3 rows, so reversed pos must be 2 - pos
    assert(rev.filter(col("pos") =!= lit(2L) - (col("v") % 3)).count() == 0)
    val t = Series.tail(wide, Seq("k"), 1)
    assert(t.count() == 20000 && t.filter(col("pos") =!= 2L).count() == 0)
  }

  test("repeat each element n times in order") {
    val r = Series.repeat(quote.filter(col("sym") === "ABB"), 2)
    assert(posOf(r, "ABB") == Seq(0L, 1L, 2L, 3L))
    val days = r.orderBy("pos").select("day").as[Int].collect().toSeq
    assert(days == Seq(3, 3, 6, 6))
  }

  test("concat appends with offset positions") {
    val ibm = quote.filter(col("sym") === "IBM").withColumn("sym", lit("X"))
    val abb = quote.filter(col("sym") === "ABB").withColumn("sym", lit("X"))
    val c = Series.concat(ibm, abb, Seq("sym"))
    assert(posOf(c, "X") == (0L to 6L))
    val lastDays = c.filter(col("pos") >= 5).orderBy("pos").select("day").as[Int].collect().toSeq
    assert(lastDays == Seq(3, 6))
  }

  test("uniqueAdjacent collapses runs only") {
    val df = Series.attachPos(
      Seq((1, "a"), (2, "a"), (3, "b"), (4, "a")).toDF("t", "v"), Seq(), Seq(col("t")))
    val u = Series.uniqueAdjacent(df, Seq(), "v")
    assert(u.orderBy("pos").select("v").as[String].collect().toSeq == Seq("a", "b", "a"))
  }

  test("gather selects rows at given positions (cs_map)") {
    val pos = quote.filter(col("vol") >= 400).select(col("sym"), col("pos"))
    val g = Series.gather(quote, pos, Seq("sym"))
    assert(g.select("vol").as[Long].collect().toSet == Set(400L, 500L, 600L, 700L))
  }

  test("gather preserves position multiplicity (cs_map gathers per occurrence)") {
    val pos = quote.filter(col("sym") === "IBM" && col("pos") === 2)
      .select(col("sym"), col("pos"))
    val twice = pos.unionByName(pos)
    val g = Series.gather(quote, twice, Seq("sym"))
    assert(g.count() == 2, "a position listed twice gathers its element twice")
  }

  test("negative span/tail count from the end of NON-dense series (ordinal space)") {
    // thin IBM to pos {0,2,4}: 'last two' must be pos {2,4}, not a
    // label-space window that misses or empties
    val thinned = Series.thin(quote.filter(col("sym") === "IBM"), 0, 2)
    val t = Series.tail(thinned, Seq("sym"), 2)
    assert(posOf(t, "IBM") == Seq(2L, 4L))
    // a slice whose labels start at 1: last 1 is the max-pos row
    val sliced = quote.filter(col("sym") === "IBM" && col("pos") >= 1)
    assert(posOf(Series.tail(sliced, Seq("sym"), 1), "IBM") == Seq(4L))
    // keyless path agrees
    val keyless = Series.tail(thinned.drop("sym"), Seq(), 2)
    assert(keyless.orderBy("pos").select("pos").as[Long].collect().toSeq == Seq(2L, 4L))
    // mixed bounds: pos-label lower bound, ordinal upper bound
    val m = Series.span(thinned, Seq("sym"), 2, -2)
    assert(posOf(m, "IBM") == Seq(2L))
  }

  test("tail(n <= 0) selects nothing; repeat(n <= 0) is rejected") {
    assert(Series.tail(quote, Seq("sym"), 0).count() == 0)
    intercept[IllegalArgumentException] { Series.repeat(quote, 0) }
    intercept[IllegalArgumentException] { Series.repeat(quote, -1) }
  }

  test("concat offsets by max(pos)+1, keeping pos unique for NON-dense a") {
    val a = Series.thin(quote.filter(col("sym") === "IBM"), 0, 2) // pos 0,2,4
    val b = quote.filter(col("sym") === "ABB").withColumn("sym", lit("IBM")) // pos 0,1
    val c = Series.concat(a, b, Seq("sym"))
    val ps = posOf(c, "IBM")
    assert(ps == Seq(0L, 2L, 4L, 5L, 6L), s"got $ps")
    assert(ps.distinct.size == ps.size, "pos must stay unique after concat")
    // keyless path agrees
    val ck = Series.concat(a.drop("sym"), b.drop("sym"), Seq())
    assert(ck.orderBy("pos").select("pos").as[Long].collect().toSeq ==
      Seq(0L, 2L, 4L, 5L, 6L))
  }

  test("span/tail and concat keep NULL-key groups (null-safe key joins)") {
    val df = Series.attachPos(
      Seq((Some("k"), 1), (Some("k"), 2), (None: Option[String], 1),
        (None: Option[String], 2), (None: Option[String], 3)).toDF("sym", "day"),
      Seq("sym"), Seq(col("day")))
    val t = Series.tail(df, Seq("sym"), 1)
    assert(t.count() == 2, "one tail row per group INCLUDING the null key")
    assert(t.filter(col("sym").isNull).select("day").as[Int].collect().toSeq == Seq(3))
    val c = Series.concat(df, df, Seq("sym"))
    val nullPos = c.filter(col("sym").isNull).orderBy("pos")
      .select("pos").as[Long].collect().toSeq
    assert(nullPos == Seq(0L, 1L, 2L, 3L, 4L, 5L), s"got $nullPos")
  }

  test("uniqueAdjacent collapses NULL runs and guards working names") {
    val df = Series.attachPos(
      Seq((1, Some("a")), (2, None), (3, None), (4, Some("a"))).toDF("t", "v"),
      Seq(), Seq(col("t")))
    val u = Series.uniqueAdjacent(df, Seq(), "v").orderBy("pos")
      .select("v").collect().map(r => Option(r.getString(0))).toSeq
    assert(u == Seq(Some("a"), None, Some("a")), s"got $u")
    val keyed = Series.uniqueAdjacent(df.withColumn("k", lit(1)), Seq("k"), "v")
      .orderBy("pos").select("v").collect().map(r => Option(r.getString(0))).toSeq
    assert(keyed == u)
  }

  test("binary-typed keys number correctly through the ranged scan") {
    val df = Seq((Array[Byte](1, 2), 10), (Array[Byte](1, 2), 20),
      (Array[Byte](3), 30)).toDF("k", "t")
    val posed = Series.attachPosRanged(df, Seq("k"), Seq(col("t")))
    val byKey = posed.orderBy("t").select("pos").as[Long].collect().toSeq
    assert(byKey == Seq(0L, 1L, 0L), "same binary key = same run, numbered 0,1")
  }
}
