package graft

import graft.io.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located join via bucketed ingest: the join of two tables bucketed on
  * the same keys must run with no Exchange and no per-query Sort — the
  * ingest-time shuffle is amortized over every downstream join.
  */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  test("join of co-bucketed tables has zero Exchange and zero Sort") {
    Tables.loadBucketed(Tables.read(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_extendedprice", "l_discount"),
      "b_lineitem", Seq("l_orderkey"), 8)
    Tables.loadBucketed(Tables.read(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice"),
      "b_orders", Seq("o_orderkey"), 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path (broadcast would hide the co-location)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // propagate the per-bucket sort order from the scan (off by default
      // since SPARK-28632; sound here because loadBucketed writes exactly
      // one sorted file per bucket)
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val joined = spark.table("b_lineitem").join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)
      assert(!plan.contains("Sort "), plan)
      // and it computes the same answer as the plain join
      val expected = Tables.read(spark, sfDir, "lineitem")
        .join(Tables.read(spark, sfDir, "orders"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
    }
  }

  test("as-of merge exec over co-bucketed (key, ts)-sorted tables: zero Exchange, zero Sort") {
    // the 100 TB as-of story: bucket + sort by (key, ts) at ingest and
    // EVERY as-of join on those keys runs with no shuffle and no sort —
    // the exec's ClusteredDistribution is satisfied by the bucketing, its
    // (keys, ts) ordering by the per-bucket sort files
    import org.apache.spark.sql.types.LongType
    val ev = Tables.read(spark, sfDir, "events")
      .select(col("user_id").as("key"), col("ts").cast(LongType).as("ts"),
        col("value").as("v"))
    Tables.loadBucketed(ev.filter(col("key") % 2 === 0), "b_asof_l",
      Seq("key"), 8, sortCols = Seq("ts"))
    Tables.loadBucketed(ev.filter(col("key") % 2 === 1)
      .select(col("key") - 1 as "key", col("ts"), col("v")), "b_asof_r",
      Seq("key"), 8, sortCols = Seq("ts"))
    try {
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val out = graft.plans.AsofMerge.asofJoin(
        spark.table("b_asof_l"), spark.table("b_asof_r"), Seq("key"), "ts", "v")
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("AsofMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)
      assert(!plan.contains("Sort "), plan)
      // same answer as the un-bucketed exec (which plans its own shuffles)
      val base = graft.plans.AsofMerge.asofJoin(
        ev.filter(col("key") % 2 === 0),
        ev.filter(col("key") % 2 === 1)
          .select(col("key") - 1 as "key", col("ts"), col("v")),
        Seq("key"), "ts", "v")
      assert(out.count() == base.count() && out.count() > 0)
      assert(out.exceptAll(base).isEmpty && base.exceptAll(out).isEmpty)
    } finally {
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
    }
  }

  test("bucketed lifecycle: load → append → compact keeps zero-Exchange zero-Sort as-of") {
    import org.apache.spark.sql.types.LongType
    val ev = Tables.read(spark, sfDir, "events")
      .select(col("user_id").as("key"), col("ts").cast(LongType).as("ts"),
        col("value").as("v"))
    val mm = ev.agg(min("ts"), max("ts")).head()
    val mid = mm.getLong(0) / 2 + mm.getLong(1) / 2
    val l = ev.filter(col("key") % 2 === 0)
    val r = ev.filter(col("key") % 2 === 1)
      .select(col("key") - 1 as "key", col("ts"), col("v"))
    Tables.loadBucketed(l.filter(col("ts") < mid), "b_lc_l",
      Seq("key"), 8, sortCols = Seq("ts"))
    Tables.loadBucketed(r.filter(col("ts") < mid), "b_lc_r",
      Seq("key"), 8, sortCols = Seq("ts"))
    try {
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      Tables.appendBucketed(l.filter(col("ts") >= mid), "b_lc_l")
      Tables.appendBucketed(r.filter(col("ts") >= mid), "b_lc_r")
      // mid-state (multi-file buckets): Spark withholds the sort-order
      // claim so a per-query Sort reappears, but the ZERO-Exchange
      // property must survive — bucket membership lives in file names
      val base = graft.plans.AsofMerge.asofJoin(l, r, Seq("key"), "ts", "v")
      val mid1 = graft.plans.AsofMerge.asofJoin(
        spark.table("b_lc_l"), spark.table("b_lc_r"), Seq("key"), "ts", "v")
      val plan1 = mid1.queryExecution.executedPlan.toString
      assert(plan1.contains("AsofMergeJoin") && !plan1.contains("Exchange"), plan1)
      assert(mid1.exceptAll(base).isEmpty && base.exceptAll(mid1).isEmpty)
      // fold: every multi-file bucket back to one sorted file
      val (nb, na) = Tables.compactBucketed(spark, "b_lc_l")
      assert(nb > na, s"fold must reduce files: $nb -> $na")
      Tables.compactBucketed(spark, "b_lc_r")
      val out = graft.plans.AsofMerge.asofJoin(
        spark.table("b_lc_l"), spark.table("b_lc_r"), Seq("key"), "ts", "v")
      val plan2 = out.queryExecution.executedPlan.toString
      assert(plan2.contains("AsofMergeJoin") && !plan2.contains("Exchange") &&
        !plan2.contains("Sort "), plan2)
      assert(out.exceptAll(base).isEmpty && base.exceptAll(out).isEmpty)
      assert(out.count() > 0)
    } finally {
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
    }
  }

  test("loadBucketedAuto derives the bucket count from data bytes") {
    import org.apache.spark.sql.types.LongType
    val ev = Tables.read(spark, sfDir, "events")
      .select(col("user_id").as("key"), col("ts").cast(LongType).as("ts"),
        col("value").as("v"))
    // tiny frame → the parallelism floor binds (never fewer buckets than
    // cores: co-located joins should still parallelize)
    val n1 = Tables.loadBucketedAuto(ev, "b_auto1", Seq("key"), Seq("ts"))
    assert(n1 == spark.sparkContext.defaultParallelism, s"floor: got $n1")
    // a per-bucket target of 1/16th the frame's own stats forces the
    // byte rule to bind instead (≈16 buckets regardless of fixture size)
    val bytes = ev.queryExecution.optimizedPlan.stats.sizeInBytes
    val n2 = Tables.loadBucketedAuto(ev, "b_auto2", Seq("key"), Seq("ts"),
      targetBucketBytes = (bytes / 16).max(1).toLong)
    assert(n2 > n1, s"byte rule should exceed the floor: $n2 vs $n1")
    // the produced table is a normal bucketed table: spec recorded, as-of
    // plan zero-Exchange against a same-count twin
    try {
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      Tables.loadBucketed(ev.select(col("key"), col("ts"),
        (col("v") * 2).as("v")), "b_auto1_twin", Seq("key"), n1, Seq("ts"))
      val out = graft.plans.AsofMerge.asofJoin(
        spark.table("b_auto1"), spark.table("b_auto1_twin"),
        Seq("key"), "ts", "v")
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("AsofMergeJoin") && !plan.contains("Exchange"), plan)
      assert(out.count() > 0)
    } finally {
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
    }
  }

  test("sortless bucket specs append and fold (bucketBy without sortBy is legal)") {
    import spark.implicits._
    val t = "b_sortless"
    spark.sql(s"DROP TABLE IF EXISTS `$t`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + s"/$t")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("k", "v")
      .repartition(4, col("k"))
      .write.bucketBy(4, "k").format("parquet").saveAsTable(t)
    Tables.appendBucketed(Seq((4L, 4.0), (5L, 5.0)).toDF("k", "v"), t)
    assert(spark.table(t).count() == 5)
    val (nb, na) = Tables.compactBucketed(spark, t)
    assert(na <= nb && spark.table(t).count() == 5)
  }

  test("compactBucketed touches only hot buckets; cold bucket files carried by rename") {
    import org.apache.spark.sql.types.LongType
    val ev = Tables.read(spark, sfDir, "events")
      .select(col("user_id").as("key"), col("ts").cast(LongType).as("ts"),
        col("value").as("v"))
    Tables.loadBucketed(ev, "b_cold", Seq("key"), 8, sortCols = Seq("ts"))
    def loc = new java.io.File(java.net.URI.create(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("b_cold")).location.toString))
    def files = loc.listFiles.filter(f => f.isFile &&
      !f.getName.startsWith("_") && !f.getName.startsWith(".")).sortBy(_.getName)
    def md5(f: java.io.File) = java.security.MessageDigest.getInstance("MD5")
      .digest(java.nio.file.Files.readAllBytes(f.toPath)).map("%02x".format(_)).mkString
    val pre = files.map(f => f.getName -> md5(f)).toMap
    // append ONE key's rows: at most one bucket goes hot. The batch rides
    // ABOVE the stored tail (ts-shifted past max) — the ordered-ingest
    // contract appendBucketed now enforces, same as the clustered append.
    val k0 = ev.select("key").head().getLong(0)
    val span = {
      val mm = ev.agg(min(col("ts")), max(col("ts"))).head()
      mm.getLong(1) - mm.getLong(0) + 1L
    }
    Tables.appendBucketed(
      ev.filter(col("key") === k0).withColumn("ts", col("ts") + lit(span)),
      "b_cold")
    val hotNames = files.map(_.getName).toSet -- pre.keySet
    assert(hotNames.nonEmpty)
    val (nb, na) = Tables.compactBucketed(spark, "b_cold")
    assert(nb == pre.size + hotNames.size && na == pre.size,
      s"fold must return to one file per bucket: $nb -> $na (pre ${pre.size})")
    // every cold bucket's file survives BYTE-IDENTICAL under its own name
    // (rename, not rewrite) — only the hot bucket's file is new
    val post = files.map(f => f.getName -> md5(f)).toMap
    val hotBuckets = hotNames.map(n => n.split("_").last.takeWhile(_.isDigit))
    val coldPre = pre.filterNot { case (n, _) =>
      hotBuckets.exists(b => n.contains("_" + b + ".")) }
    coldPre.foreach { case (n, h) =>
      assert(post.get(n).contains(h), s"cold file $n was rewritten or lost") }
  }
}
