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
}
