package graft

import graft.agg.Aggs
import graft.analytics.Analytics
import graft.series.Series
import graft.window.Moving
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic properties of order-sensitive operators (SURVEY §5) over
  * ScalaCheck-generated series with fixed seeds — catches off-by-one and
  * ordering bugs hand-picked fixtures miss.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** n doubles from a fixed seed (deterministic across runs). */
  private def series(n: Int, seed: Long): Seq[Double] =
    Gen.listOfN(n, Gen.chooseNum(-1000.0, 1000.0))
      .apply(Gen.Parameters.default, Seed(seed)).get

  private def seriesDf(xs: Seq[Double]) =
    xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("pos", "value")

  private val cases = Seq((1, 11L), (17, 23L), (64, 37L), (200, 41L))

  test("passageDedup is idempotent") {
    // surviving passages all have corpus frequency <= maxDocs, so a second
    // pass over the reassembled docs must be a no-op
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(99)
    val passages = Vector("alpha beta", "gamma", "delta five", "FOOTER",
      "epsilon", "zeta eta")
    val docs = (0L until 60L).map { i =>
      val body = Seq.fill(2 + rnd.nextInt(3))(passages(rnd.nextInt(passages.size)))
      (i, (body :+ "FOOTER").mkString("\n"))
    }.toDF("doc_id", "text")
    val once = graft.dedup.Dedup.passageDedup(docs, "doc_id", "text", maxDocs = 3)
    val twice = graft.dedup.Dedup.passageDedup(
      once.withColumnRenamed("clean_text", "text").select("doc_id", "text"),
      "doc_id", "text", maxDocs = 3)
    val a = once.select("doc_id", "clean_text", "n_kept").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val b = twice.select("doc_id", "clean_text", "n_kept").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(a == b)
    // and the ubiquitous FOOTER passage is gone from every surviving doc
    assert(!a.exists(_._2.split("\n").contains("FOOTER")))
  }

  test("mixtureSample hits target proportions and is subset-stable") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    // uneven source sizes so the rates differ: 800/400/200
    val docs = ((0 until 800).map(i => (i.toLong, "a", s"text a $i ${rnd.nextInt()}")) ++
      (0 until 400).map(i => (800L + i, "b", s"text b $i ${rnd.nextInt()}")) ++
      (0 until 200).map(i => (1200L + i, "c", s"text c $i ${rnd.nextInt()}")))
      .toDF("doc_id", "source", "text")
    val out = graft.text.TextOps.mixtureSample(docs, "source", "text",
      Map("a" -> 0.2, "b" -> 0.3, "c" -> 0.5))
    val n = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // binding source: c (200/0.5 = 400 = C). Expected a: 400*0.2 = 80,
    // b: 400*0.3 = 120, c: all 200. md5 gate is uniform-ish: ±25%.
    assert(n("c") == 200L)
    assert(math.abs(n("a") - 80L) <= 20, s"a=${n("a")}")
    assert(math.abs(n("b") - 120L) <= 30, s"b=${n("b")}")
    // determinism: the sampled ids are a function of content only
    val again = graft.text.TextOps.mixtureSample(docs.repartition(7), "source",
      "text", Map("a" -> 0.2, "b" -> 0.3, "c" -> 0.5))
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet ==
      again.select("doc_id").collect().map(_.getLong(0)).toSet)
    // NON-DYADIC binding weight: rate_binding = (n/w)*w/n lands 1 ulp
    // below 1.0 in doubles for w=0.3 — the epsilon-nudged floor must
    // still keep EVERY binding-source row
    val docs2 = ((0 until 800).map(i => (i.toLong, "a", s"ta $i")) ++
      (0 until 120).map(i => (800L + i, "b", s"tb $i")) ++
      (0 until 500).map(i => (920L + i, "c", s"tc $i")))
      .toDF("doc_id", "source", "text")
    val out2 = graft.text.TextOps.mixtureSample(docs2, "source", "text",
      Map("a" -> 0.2, "b" -> 0.3, "c" -> 0.5))
    val n2 = out2.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n2("b") == 120L, s"binding source lost rows: ${n2("b")} of 120")
  }

  test("cum_sum ∘ diff + x0 reconstructs the series") {
    for ((n, seed) <- cases) {
      val xs = series(n, seed)
      val df = seriesDf(xs)
      val rebuilt = Aggs.cumAgg(
        Analytics.diff(df, Seq(), "value").withColumnRenamed("diff", "d")
          .drop("value").withColumnRenamed("d", "value"),
        Seq(), "value")
        .withColumn("rebuilt", col("cum_sum") + xs.head)
        .orderBy("pos").select("rebuilt").as[Double].collect()
      xs.zip(rebuilt).foreach { case (x, r) => assert(math.abs(x - r) < 1e-6) }
    }
  }

  test("reverse ∘ reverse is the identity") {
    for ((n, seed) <- cases) {
      val df = seriesDf(series(n, seed))
      val twice = Series.reverse(Series.reverse(df, Seq()), Seq())
        .orderBy("pos").select("value").as[Double].collect().toSeq
      assert(twice == df.orderBy("pos").select("value").as[Double].collect().toSeq)
    }
  }

  test("sort_pos is the sort permutation") {
    for ((n, seed) <- cases) {
      val xs = series(n, seed)
      val sorted = Series.attachPosRanged(
        seriesDf(xs), Seq(), Seq(col("value"), col("pos")), out = "sort_pos")
        .orderBy("sort_pos").select("value").as[Double].collect().toSeq
      assert(sorted == xs.sorted)
    }
  }

  test("window n=1 and ema n=1 are the identity; grid step=1 counts 1") {
    for ((n, seed) <- Seq((32, 7L))) {
      val df = seriesDf(series(n, seed))
      val w = Moving.windowAgg(df, Seq(), "value", 1)
        .filter(col("w_sum") =!= col("value") || col("w_avg_ref") =!= col("value"))
      assert(w.isEmpty)
      val e = Moving.ema(df, Seq(), "value", 1) // p = 2/(1+1) = 1
        .filter(abs(col("ema") - col("value")) > 1e-9)
      assert(e.isEmpty)
      val g = Aggs.gridAgg(df, Seq(), "value", 1).filter(col("grid_count") =!= 1)
      assert(g.isEmpty)
    }
  }

  test("windowJoin equals the brute-force inequality join + group on random data") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(31)
    // left is NOT deduplicated: ~150 draws over 4×500 slots include
    // duplicate (key, ts) rows, which must each receive the same correct
    // stats (not doubled counts) — the r7 duplicate-safety contract
    val l = Seq.fill(150)((s"k${rnd.nextInt(4)}", rnd.nextInt(500).toLong))
      .toDF("key", "ts")
    val r = Seq.fill(300)((s"k${rnd.nextInt(5)}", rnd.nextInt(500).toLong,
      rnd.nextInt(100).toDouble)).toDF("key", "ts", "v")
    for ((before, after, bucket) <- Seq((10L, 10L, 7L), (0L, 25L, 25L), (40L, 3L, 100L))) {
      val got = graft.join.Align.windowJoin(l, r, Seq("key"), "ts",
        before, after, "v", bucket)
        .select("key", "ts", "win_count", "win_sum", "win_min", "win_max")
        .collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
      // brute force mirrors the contract: stats per DISTINCT (key, ts),
      // then every left row (duplicates included) joins its stats
      val stats = l.dropDuplicates("key", "ts").as("a").join(r.as("b"),
          col("a.key") === col("b.key") &&
            col("b.ts") >= col("a.ts") - before && col("b.ts") <= col("a.ts") + after,
          "left")
        .groupBy(col("a.key").as("key"), col("a.ts").as("ts"))
        .agg(count(col("b.ts")).as("win_count"), sum(col("b.v")).as("win_sum"),
          min(col("b.v")).as("win_min"), max(col("b.v")).as("win_max"))
      val want = l.join(stats, Seq("key", "ts"), "left")
        .select("key", "ts", "win_count", "win_sum", "win_min", "win_max")
        .collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
      assert(got == want, s"window=[-$before,+$after] bucket=$bucket")
    }
  }

  test("rangeJoin equals the inequality join on random intervals and bucket widths") {
    val rnd = new scala.util.Random(1234)
    val pts = Seq.fill(400)((s"k${rnd.nextInt(4)}", rnd.nextInt(1000).toLong))
      .toDF("key", "ts")
    val ivs = Seq.fill(120) {
      val s = rnd.nextInt(1000).toLong
      (s"k${rnd.nextInt(5)}", s, s + rnd.nextInt(150).toLong, rnd.nextInt(1000000))
    }.toDF("key", "start", "end", "tag")
    val want = pts.join(ivs, Seq("key"))
      .filter(col("ts") >= col("start") && col("ts") <= col("end"))
      .select("key", "ts", "tag").collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    for (bucket <- Seq(1L, 37L, 128L, 5000L)) {
      val got = graft.join.Align.rangeJoin(pts, ivs, Seq("key"), "ts",
        "start", "end", bucket, Seq("tag"))
        .select("key", "ts", "tag").collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
      assert(got == want, s"bucket=$bucket")
    }
    assert(want.nonEmpty)
  }

  test("rsi matches a sequential reference computation") {
    val xs = series(60, 55L)
    val n = 14
    // sequential expectation: diff → U/D split → Wilder smoothing
    var su = 0.0; var sd = 0.0
    val expected = xs.indices.map { i =>
      val d = if (i == 0) 0.0 else xs(i) - xs(i - 1)
      val m = math.min(i + 1, n).toDouble
      su = (su * (m - 1) + math.max(d, 0.0)) / m
      sd = (sd * (m - 1) + math.max(-d, 0.0)) / m
      // reference IEEE arithmetic: all-gain → 100, FLAT (0/0) → NaN
      if (sd == 0.0 && su > 0.0) 100.0
      else if (sd == 0.0) Double.NaN
      else 100.0 - 100.0 / (1.0 + su / sd)
    }
    val got = Moving.rsi(seriesDf(xs), Seq(), "value", n)
      .orderBy("pos").select("rsi").as[Double].collect().toSeq
    expected.zip(got).foreach { case (e, g) =>
      assert((e.isNaN && g.isNaN) || math.abs(e - g) < 1e-9, s"e=$e g=$g")
    }
  }

  test("concat preserves counts and keeps pos dense") {
    val a = seriesDf(series(13, 5L))
    val b = seriesDf(series(9, 6L))
    val c = Series.concat(a, b, Seq())
    assert(c.count() == 22)
    assert(c.select("pos").as[Long].collect().sorted.toSeq == (0L until 22L))
  }

  test("keyless attachRunId (scan-based) equals the keyed window form") {
    for ((n, seed) <- cases if n > 1) {
      val df = seriesDf(series(n, seed))
        .withColumn("bucket", (col("value") > 0).cast("int"))
      val keyless = Aggs.attachRunId(df, Seq(), "bucket")
        .orderBy("pos").select("run_id").as[Long].collect().toSeq
      val keyed = Aggs.attachRunId(df.withColumn("k", lit("x")), Seq("k"), "bucket")
        .orderBy("pos").select("run_id").as[Long].collect().toSeq
      assert(keyless == keyed)
    }
  }

  test("keyless rank/dense_rank (ranged) equals the keyed window form") {
    for ((n, seed) <- cases if n > 1) {
      // round to force ties so rank gaps and dense-rank compression differ
      val df = seriesDf(series(n, seed))
        .withColumn("value", round(col("value"), -2))
      val keyless = Moving.rank(df, Seq(), "value")
        .orderBy("pos").select("rnk", "dense_rnk").as[(Long, Long)].collect().toSeq
      val keyed = Moving.rank(df.withColumn("k", lit("x")), Seq("k"), "value")
        .orderBy("pos").select("rnk", "dense_rnk").as[(Long, Long)].collect().toSeq
      assert(keyless == keyed)
    }
  }

  test("keyless ops match keyed forms on GAPPED pos (sliced series)") {
    // thin keeps original pos (0, 3, 6, ...) — the keyless scan/ordinal
    // paths must not assume density
    val base = seriesDf(series(90, 77L))
      .withColumn("value", round(col("value"), -2))
    val gapped = Series.thin(base, 0, 3)
    val gk = gapped.withColumn("k", lit("x"))
    def seqOf(df: org.apache.spark.sql.DataFrame, c: String) =
      df.orderBy("pos").select(c).as[Double].collect().toSeq
    // diff
    assert(seqOf(Analytics.diff(gapped, Seq(), "value"), "diff") ==
      seqOf(Analytics.diff(gk, Seq("k"), "value"), "diff"))
    // uniqueAdjacent
    assert(
      Series.uniqueAdjacent(gapped, Seq(), "value").select("pos").as[Long].collect().sorted.toSeq ==
      Series.uniqueAdjacent(gk, Seq("k"), "value").select("pos").as[Long].collect().sorted.toSeq)
    // attachRunId
    assert(
      Aggs.attachRunId(gapped, Seq(), "value").orderBy("pos").select("run_id").as[Long].collect().toSeq ==
      Aggs.attachRunId(gk, Seq("k"), "value").orderBy("pos").select("run_id").as[Long].collect().toSeq)
    // cumAgg (count/avg depend on true row count, not pos)
    val ckl = Aggs.cumAgg(gapped, Seq(), "value").orderBy("pos")
      .select("cum_count", "cum_avg").as[(Long, Double)].collect().toSeq
    val ckd = Aggs.cumAgg(gk, Seq("k"), "value").orderBy("pos")
      .select("cum_count", "cum_avg").as[(Long, Double)].collect().toSeq
    assert(ckl.map(_._1) == ckd.map(_._1))
    ckl.zip(ckd).foreach { case ((_, a), (_, b)) => assert(math.abs(a - b) < 1e-6) }
    // crossings + extrema
    val centered = gapped.withColumn("value", col("value") - 100)
    val centeredK = centered.withColumn("k", lit("x"))
    assert(
      Analytics.crossings(centered, Seq(), "value", 0).select("pos").as[Long].collect().sorted.toSeq ==
      Analytics.crossings(centeredK, Seq("k"), "value", 0).select("pos").as[Long].collect().sorted.toSeq)
    assert(
      Analytics.extrema(gapped, Seq(), "value").select("pos").as[Long].collect().sorted.toSeq ==
      Analytics.extrema(gk, Seq("k"), "value").select("pos").as[Long].collect().sorted.toSeq)
    // csIf: gapped cond frame
    val cond = gapped.select(col("pos"), (col("value") > 0).as("c"))
    val aS = seriesDf(series(40, 78L))
    val bS = seriesDf(series(40, 79L))
    val kl = graft.series.Conditional.csIf(cond, Seq(), "c", aS, bS, "value")
      .orderBy("pos").select("if_value").as[Double].collect().toSeq
    // keyed reference: same cond with a constant key; branch series gain the key
    val kd = graft.series.Conditional.csIf(
      cond.withColumn("k", lit("x")), Seq("k"), "c",
      aS.withColumn("k", lit("x")), bS.withColumn("k", lit("x")), "value")
      .orderBy("pos").select("if_value").as[Double].collect().toSeq
    assert(kl == kd)
  }

  test("keyed scans equal per-key keyless scans (ema/atr/cumProd)") {
    // the keyed path (hash-partitioned single pass) and the keyless path
    // (ranged two-pass prefix) are independent implementations of the same
    // recurrence — run the keyed scan over a 3-key frame and compare with
    // the keyless scan applied to each key's slice
    val keys = Seq("ka", "kb", "kc")
    val frames = keys.zipWithIndex.map { case (k, i) =>
      seriesDf(series(50 + 10 * i, 100L + i)).withColumn("k", lit(k))
    }
    val all = frames.reduce(_ unionByName _)
    def check(f: (org.apache.spark.sql.DataFrame, Seq[String]) => org.apache.spark.sql.DataFrame,
              out: String): Unit = {
      val keyed = f(all, Seq("k"))
        .select(col("k"), col("pos"), col(out)).as[(String, Long, Double)]
        .collect().sortBy(r => (r._1, r._2)).toSeq
      val sliced = frames.flatMap { fr =>
        val k = fr.select("k").head().getString(0)
        f(fr.drop("k"), Seq())
          .select(col("pos"), col(out)).as[(Long, Double)]
          .collect().sortBy(_._1).map { case (p, v) => (k, p, v) }
      }.sortBy(r => (r._1, r._2)).toSeq
      keyed.zip(sliced).foreach { case ((k1, p1, v1), (k2, p2, v2)) =>
        // relative tolerance: the ranged path composes chunk products in a
        // different association order, so last-ulp drift scales with |v|
        assert(k1 == k2 && p1 == p2 &&
          math.abs(v1 - v2) <= 1e-9 * math.max(1.0, math.abs(v1)),
          s"$out mismatch at ($k1,$p1): $v1 vs $v2")
      }
    }
    check((d, ks) => Moving.ema(d, ks, "value", 10), "ema")
    check((d, ks) => Moving.atr(d, ks, "value", 14), "atr")
    check((d, ks) => Moving.cumProd(
      d.withColumn("value", (col("value") / 1000.0) + 1.5), ks, "value"), "cum_prd")
  }

  test("keyless scan-based trailing window equals the keyed window form") {
    for ((n, seed) <- cases; win <- Seq(1, 3, 10)) {
      val df = seriesDf(series(n, seed))
      val keyless = Moving.windowAgg(df, Seq(), "value", win)
      val keyed = Moving.windowAgg(df.withColumn("k", lit("x")), Seq("k"), "value", win)
      val cols = Seq("w_sum", "w_avg", "w_min", "w_max", "w_var", "w_dev",
        "w_avg_ref", "w_var_ref", "w_dev_ref")
      val a = keyless.orderBy("pos")
        .select(cols.map(col): _*).collect().map(_.toSeq.map(_.asInstanceOf[Double]))
      val b = keyed.orderBy("pos")
        .select(cols.map(col): _*).collect().map(_.toSeq.map(_.asInstanceOf[Double]))
      a.zip(b).zipWithIndex.foreach { case ((ra, rb), i) =>
        ra.zip(rb).zip(cols).foreach { case ((x, y), c) =>
          assert(math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(y)),
            s"win=$win row=$i col=$c: $x vs $y")
        }
      }
    }
  }

  test("topK equals sort-take-k") {
    for ((n, seed) <- cases; k <- Seq(1, 5)) {
      val xs = series(n, seed)
      val got = Aggs.topK(seriesDf(xs), "value", k, desc = true, "pos")
        .select("value").as[Double].collect().toSeq
      assert(got == xs.sorted(Ordering[Double].reverse).take(math.min(k, n)))
    }
  }

  test("CsHashAgg map aggregate equals groupBy across shuffle partials") {
    // many partitions force the partial→shuffle→merge path of the
    // TypedImperativeAggregate, the code the single-partition unit test
    // cannot reach
    graft.sqlext.GraftFunctions.register(spark)
    val df = spark.range(1000)
      .select((col("id") % 13).cast("string").as("g"), (col("id") * 3 % 97).cast("double").as("x"))
      .repartition(11)
    df.createOrReplaceTempView("t_hash_prop")
    val m = spark.sql(
      """SELECT cs_hash_sum(x, g) AS s, cs_hash_avg(x, g) AS a,
                cs_hash_min(x, g) AS mn, cs_hash_max(x, g) AS mx,
                cs_hash_count(g) AS c
         FROM t_hash_prop""").head()
    val expect = df.groupBy("g").agg(
      sum("x").as("s"), avg("x").as("a"), min("x").as("mn"), max("x").as("mx"),
      count(lit(1)).as("c")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5))).toMap
    val (ms, ma, mn, mx, mc) = (m.getMap[String, Double](0), m.getMap[String, Double](1),
      m.getMap[String, Double](2), m.getMap[String, Double](3), m.getMap[String, Long](4))
    assert(ms.size == 13 && expect.size == 13)
    expect.foreach { case (g, (s, a, lo, hi, c)) =>
      assert(math.abs(ms(g) - s) < 1e-9 && math.abs(ma(g) - a) < 1e-9)
      assert(mn(g) == lo && mx(g) == hi && mc(g) == c)
    }
  }

  test("array-series fns: quantile endpoints, rank permutation, norm unit length") {
    graft.sqlext.GraftFunctions.register(spark)
    for ((n, seed) <- cases if n >= 2) {
      val xs = series(n, seed)
      val r = Seq(Tuple1(xs.toArray)).toDF("xs").select(
        expr("cs_quantile(xs, 1)").as("q"),
        expr("cs_rank(xs)").as("rk"),
        expr("aggregate(cs_norm(xs), 0.0D, (s, x) -> s + x * x)").as("ss")).head()
      assert(r.getSeq[Double](0) == Seq(xs.min, xs.max)) // q=1 → [min, max]
      // ranks are a permutation-consistent labeling: sorted by rank
      // recovers the sorted values
      val ranked = r.getSeq[Long](1).zip(xs).sortBy(_._1).map(_._2)
      assert(ranked.zip(xs.sorted).forall { case (a, b) => a == b })
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-9) // ||norm(x)||² = 1
    }
  }
}
