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
}
