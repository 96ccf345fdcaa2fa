package graft

import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the r18 one-shuffle LSH candidate shape: the groupBy +
  * in-aggregate pair emit (cs_pairs / cs_hamming_pairs) must produce the
  * EXACT pair set of the (band, bucket) self-join it replaced, and the
  * plan must carry no join at all. The reference forms live inline here —
  * the same frames through the old join shape — so any future drift in
  * the generators fails against the semantics, not a snapshot.
  */
class PairEmitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The pre-r18 self-join form, verbatim. */
  private def joinedPairs(banded: DataFrame, id: String): DataFrame = {
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b,
        col(s"a.band") === col(s"b.band") && col(s"a.bucket") === col(s"b.bucket") &&
          col(s"a.$id") < col(s"b.$id"))
      .select(col(s"a.$id").as("id1"), col(s"b.$id").as("id2"))
      .distinct()
  }

  test("bandedPairs equals the self-join form on long ids (dups + nulls included)") {
    // bucket 10: {1,2,3} + a DUPLICATE 2 (duplicate values must not
    // self-pair) and a null id (pairs with nothing); bucket 20: {5,9}
    // across a different band; bucket 30: singleton (no pairs); the
    // same (1,2) pair repeats in band 2 (cross-band dedup).
    val banded = Seq[(java.lang.Long, Int, Long)](
      (1L, 0, 10L), (2L, 0, 10L), (3L, 0, 10L), (2L, 0, 10L), (null, 0, 10L),
      (5L, 1, 20L), (9L, 1, 20L), (7L, 1, 30L),
      (1L, 2, 40L), (2L, 2, 40L)
    ).toDF("id", "band", "bucket")
    val got = Dedup.bandedPairs(banded, "id").as[(Long, Long)].collect().sorted
    val want = joinedPairs(banded, "id").as[(Long, Long)].collect().sorted
    assert(got.sameElements(want))
    assert(got.toSet == Set((1L, 2L), (1L, 3L), (2L, 3L), (5L, 9L)))
  }

  test("bandedPairs equals the self-join form on string ids") {
    val banded = Seq(
      ("docB", 0, 1L), ("docA", 0, 1L), ("docC", 0, 1L),
      ("docA", 1, 2L), ("docB", 1, 2L)
    ).toDF("id", "band", "bucket")
    val got = Dedup.bandedPairs(banded, "id").as[(String, String)].collect().sorted
    val want = joinedPairs(banded, "id").as[(String, String)].collect().sorted
    assert(got.sameElements(want))
    assert(got.toSet ==
      Set(("docA", "docB"), ("docA", "docC"), ("docB", "docC")))
  }

  test("bandedPairs equals the self-join form on a 300-doc seeded fuzz frame") {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 300).flatMap { i =>
      (0 until 4).map(b => (i.toLong, b, rnd.nextInt(40).toLong))
    }
    val banded = rows.toDF("id", "band", "bucket")
    val got = Dedup.bandedPairs(banded, "id").as[(Long, Long)].collect().sorted
    val want = joinedPairs(banded, "id").as[(Long, Long)].collect().sorted
    assert(got.length == want.length && got.sameElements(want))
    assert(got.nonEmpty) // the fuzz must actually exercise collisions
  }

  test("bandedPairs plan: no join, one grouping Exchange feeding the pair emit") {
    val banded = (0 until 100).map(i => (i.toLong, i % 4, (i % 7).toLong))
      .toDF("id", "band", "bucket")
    val plan = Dedup.bandedPairs(banded, "id").queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"pair emit must not plan a join:\n$plan")
    assert(plan.contains("cs_pairs"), s"expected the cs_pairs generator:\n$plan")
    // exactly two exchanges end to end: the (band, bucket) grouping and
    // the cross-band distinct — the self-join's second banded-side
    // exchange is the one this shape removes
    val exchanges = "(?<!Broadcast)Exchange".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected 2 Exchanges (group + distinct), got $exchanges:\n$plan")
  }

  test("cosinePairsBucketed verified pairs are exact on a constructed-direction corpus") {
    // semantics pin for the RHP-LSH candidate step (its SHAPE is
    // deliberately the broadcast self-join, not the pair emit — the r18
    // A/B measured the emit as a local loss there; Dedup.scala's note).
    // 5 distinct DIRECTIONS (a spike at dim i%5 over a 0.1 floor): same
    // direction → cos 1, different spikes → cos ≈ 0.24 — so at minCos
    // 0.9 the exact answer is precisely the within-direction pairs, and
    // banding recall is 1 by construction (identical signatures).
    val df = (0 until 50).map(i =>
      (i.toLong, Array.tabulate(8)(j => if (j == i % 5) 1.0 else 0.1)))
      .toDF("vec_id", "embedding")
    val out = Dedup.cosinePairsBucketed(df, "vec_id", "embedding", 8, 0.9)
    val got = out.select("id1", "id2").as[(Long, Long)].collect().toSet
    val want = (for {
      a <- 0L until 50L; b <- 0L until 50L
      if a < b && a % 5 == b % 5
    } yield (a, b)).toSet
    assert(got == want, s"pair set moved: ${got.size} vs ${want.size}")
  }

  test("hammingPairs64 equals the self-join form, boundary distances included") {
    def joinedHamming(withHash: DataFrame, bands: Int, maxDist: Int): DataFrame = {
      val bandBits = 64 / bands
      val banded = withHash.select(col("id"), col("h").as("__h64"),
        posexplode(array((0 until bands).map(b =>
          shiftright(col("h"), b * bandBits)
            .bitwiseAND(lit((1L << bandBits) - 1))): _*)))
        .select(col("id"), col("__h64"), col("pos").as("band"), col("col").as("bucket"))
      banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
            col("a.id") < col("b.id") &&
            bit_count(col("a.__h64").bitwiseXOR(col("b.__h64"))) <= maxDist)
        .select(col("a.id").as("id1"), col("b.id").as("id2"),
          bit_count(col("a.__h64").bitwiseXOR(col("b.__h64"))).cast("long").as("hamming"))
        .distinct()
    }
    val rnd = new scala.util.Random(7)
    val base = rnd.nextLong()
    def flip(h: Long, bits: Seq[Int]): Long = bits.foldLeft(h)((x, b) => x ^ (1L << b))
    val rows = Seq(
      (0L, base),
      (1L, flip(base, Seq(3))),             // distance 1
      (2L, flip(base, Seq(0, 9, 17, 33, 41, 50, 63))), // distance 7 (boundary)
      (3L, flip(base, Seq(0, 1, 2, 3, 4, 5, 6, 7))),   // distance 8 (over)
      (4L, rnd.nextLong())
    ) ++ (5L until 80L).map(i => (i, rnd.nextLong()))
    val withHash = rows.toDF("id", "h")
    val got = Dedup.hammingPairs64(withHash, "id", "h", bands = 8, maxDist = 7)
      .as[(Long, Long, Long)].collect().sorted
    val want = joinedHamming(withHash, 8, 7).as[(Long, Long, Long)].collect().sorted
    assert(got.sameElements(want))
    assert(got.exists(p => p._1 == 0L && p._2 == 2L && p._3 == 7L)) // boundary kept
    assert(got.contains((0L, 1L, 1L)))
    val plan = Dedup.hammingPairs64(withHash, "id", "h", 8, 7)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && plan.contains("cs_hamming_pairs"))
  }

  test("cs_dot: ragged inputs are NULL, not a common-prefix sum (r18 guard)") {
    graft.sqlext.GraftFunctions.register(spark)
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)), // equal length: 32.0
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0))       // ragged: NULL
    ).toDF("a", "b").select(expr("cs_dot(a, b)").as("d"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) == 32.0)
    assert(rows(1).isNullAt(0), "ragged cs_dot must be NULL (zip_with semantics)")
    // interpreted path agrees (the guard lives in both eval and codegen)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val rows2 = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0))).toDF("a", "b")
        .select(expr("cs_dot(a, b)")).collect()
      assert(rows2(0).isNullAt(0))
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("cs_rhp_sig runs INSIDE a WholeStageCodegen span (r18: no CodegenFallback)") {
    graft.sqlext.GraftFunctions.register(spark)
    // a non-foldable source: a literal frame would be constant-folded into
    // a LocalTableScan (via the interpreted eval) and leave no span to pin
    // array() of plain arithmetic, NOT transform(): the HOF is itself
    // CodegenFallback and would break the very span this test pins
    def src = spark.range(4).select(col("id"),
      array((0 until 8).map(i =>
        expr(s"cast(id * 8 + $i as double) / 31.0 - 0.5")): _*).as("v"))
    val df = src.select(expr("cs_rhp_sig(v, 8, 4, 2)").as("sig"))
    val plan = df.queryExecution.executedPlan
    val inSpan = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.exists(_.child.collect {
      case p if p.expressions.exists(
        _.exists(_.isInstanceOf[graft.sqlext.RhpSignatures])) => p
    }.nonEmpty)
    assert(inSpan, s"cs_rhp_sig must codegen inside the whole-stage span:\n$plan")
    // and the generated code agrees with the interpreted eval bit-for-bit
    val gen = df.collect().map(_.getSeq[Long](0)).toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = src.select(expr("cs_rhp_sig(v, 8, 4, 2)"))
        .collect().map(_.getSeq[Long](0)).toSeq
      assert(gen == interp)
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
