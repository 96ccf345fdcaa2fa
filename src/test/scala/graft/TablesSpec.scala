package graft

import graft.io.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Table lifecycle contracts (imcs--1.1.sql:33-430; append trigger
  * imcs.c:4617-4740).
  */
class TablesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_tables_$tag")
    d.toFile.deleteOnExit()
    s"$d/t"
  }

  test("append at/above the stored tail is accepted") {
    val path = tmp("ok")
    Tables.load(Seq((1L, 1.0), (5L, 2.0)).toDF("ts", "v"), path, Seq(), "ts")
    Tables.append(Seq((5L, 3.0), (9L, 4.0)).toDF("ts", "v"), path, "ts", lit(5L))
    assert(spark.read.parquet(path).count() == 4)
  }

  test("append below the stored tail is rejected (reference trigger semantics)") {
    val path = tmp("ooo")
    Tables.load(Seq((1L, 1.0), (10L, 2.0)).toDF("ts", "v"), path, Seq(), "ts")
    val e = intercept[IllegalStateException] {
      Tables.append(Seq((7L, 3.0)).toDF("ts", "v"), path, "ts", lit(0L))
    }
    assert(e.getMessage.contains("out-of-order append"))
    // the rejected append must not have written anything
    assert(spark.read.parquet(path).count() == 2)
  }

  test("append to a fresh path needs no tail check") {
    val path = tmp("fresh")
    Tables.append(Seq((3L, 1.0)).toDF("ts", "v"), path, "ts", lit(0L))
    assert(spark.read.parquet(path).count() == 1)
  }

  test("compact folds per-batch append files into the load layout") {
    val path = tmp("compact")
    // load + 3 appends: at least 4 file sets accumulate
    Tables.load((0L until 10L).map(i => (i, i * 1.0)).toDF("ts", "v"),
      path, Seq(), "ts")
    for (b <- 1 to 3) {
      val lo = b * 10L
      Tables.append((lo until lo + 10L).map(i => (i, i * 1.0)).toDF("ts", "v"),
        path, "ts", lit(lo))
    }
    val expect = spark.read.parquet(path).select("ts", "v")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val (nBefore, nAfter) = Tables.compact(spark, path, Seq(), "ts")
    assert(nBefore > nAfter, s"compact must reduce files: $nBefore -> $nAfter")
    assert(nAfter == 1, s"40 tiny rows fit one target file, got $nAfter")
    val got = spark.read.parquet(path).select("ts", "v")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    assert(got.toSeq == expect.toSeq) // rewrite changes layout, never data
    // the compacted layout still accepts appends above the tail
    Tables.append(Seq((40L, 40.0)).toDF("ts", "v"), path, "ts", lit(40L))
    assert(spark.read.parquet(path).count() == 41)
  }

  test("compact at a small targetBytes keeps files range-disjoint in ts") {
    val path = tmp("compact_rs")
    Tables.load((0L until 4000L).map(i => (i, i * 1.0)).toDF("ts", "v"),
      path, Seq(), "ts")
    // tiny target → several output files; each must cover a disjoint
    // ts slice (the property row-group pruning needs)
    val (_, nAfter) = Tables.compact(spark, path, Seq(), "ts", targetBytes = 16L << 10)
    assert(nAfter > 1, s"expected a multi-file layout, got $nAfter")
    val dir = new java.io.File(path)
    val ranges = dir.listFiles.filter(_.getName.endsWith(".parquet")).map { f =>
      val d = spark.read.parquet(f.getPath).agg(min("ts"), max("ts")).head()
      (d.getLong(0), d.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2,
        s"overlapping file ranges: $hi1 >= $lo2 in ${ranges.mkString(",")}")
      case _ =>
    }
  }
}
