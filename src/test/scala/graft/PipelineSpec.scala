package graft

import graft.dedup.Dedup
import graft.sim.Similarity
import graft.text.TextOps
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Training-data pipeline operators: dedup, text analysis, similarity,
  * multimodal plumbing.
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val docs = Seq(
    (1L, "The quick brown fox jumps over the lazy dog again and again"),
    (2L, "The quick brown fox jumps over the lazy dog again and again!"), // near-dup of 1 (punct)
    (3L, "Completely different content about databases and columnar engines here"),
    (4L, "the QUICK brown fox JUMPS over the lazy dog again and again")  // case variant of 1
  ).toDF("doc_id", "text")

  test("fingerprint is invariant to case/punctuation normalization") {
    val fps = docs.select(TextOps.fingerprint(col("text"))).as[Long].collect()
    assert(fps(0) == fps(1) && fps(0) == fps(3) && fps(0) != fps(2))
  }

  test("exactDedup keeps lowest id per normalized content") {
    val kept = Dedup.exactDedup(docs, "doc_id", "text").select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }

  test("exact dedup never merges distinct non-ASCII documents (raw-hash fallback)") {
    // the ASCII normalization maps entirely-CJK texts to "" — without the
    // raw-text fallback they would all hash identically and DISTINCT
    // documents would be silently dropped as "duplicates"
    val cjk = Seq((1L, "深度学习模型"), (2L, "今天天气很好"),
      (3L, "深度学习模型"), (4L, "hello world")).toDF("doc_id", "text")
    val kept = Dedup.exactDedup(cjk, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 4L),
      s"byte-identical CJK docs dedup, distinct ones survive: got $kept")
    assert(Dedup.exactGroups(cjk, "doc_id", "text").count() == 3)
  }

  test("exactDedup rejects frames carrying its working names") {
    val bad = Seq((1L, "x", 9L)).toDF("doc_id", "text", "__fp")
    val e = intercept[IllegalArgumentException] {
      Dedup.exactDedup(bad, "doc_id", "text")
    }
    assert(e.getMessage.contains("__fp"))
  }

  test("simhash pairing skips empty-normalized docs instead of mega-bucketing them") {
    // 20 punctuation-only docs share ONE simhash — unfiltered they form a
    // quadratic all-pairs bucket with zero content signal; the real
    // duplicate pair must still surface
    val punct = (10L to 29L).map(i => (i, "!!! ??? ***"))
    val mixed = (punct ++ Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"))).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(mixed, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)),
      s"only the real duplicate pair, no punctuation mega-bucket: got $pairs")
  }

  test("minhash LSH pairs find the near-duplicates") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("fused cs_minhash equals the HOF minhashBase + signature lanes") {
    graft.sqlext.GraftFunctions.register(spark)
    // STRING shingles (the pre-r17 sh form) pin the original contract
    val sh = docs
      .withColumn("__norm", TextOps.normalizedText(col("text")))
      .filter(length(col("__norm")) >= 5)
      .select(col("doc_id"), TextOps.charShingles(col("__norm"), 5).as("sh"))
    val cmp = sh.select(
      call_function("cs_minhash", col("sh"), lit(16)).as("fused"),
      Dedup.minhashSignature(Dedup.minhashBase(col("sh")), 16).as("hof"))
    assert(cmp.filter(col("fused") =!= col("hof")).isEmpty)
    // duplicates can't change a minimum: signing the non-distinct array
    // must give the same signature
    val dup = sh.select(
      call_function("cs_minhash", concat(col("sh"), col("sh")), lit(16)).as("a"),
      call_function("cs_minhash", col("sh"), lit(16)).as("b"))
    assert(dup.filter(col("a") =!= col("b")).isEmpty)
    // PRE-HASHED (array<bigint>, the r17 sh form) signs bit-identically
    // to the string form: the persisted landing-dedup band buckets
    // derive from these signatures, so this equality is the
    // schema-stability pin for the shingle-hashing switch
    val both = sh.select(
      call_function("cs_minhash", col("sh"), lit(16)).as("s"),
      call_function("cs_minhash",
        transform(col("sh"), x => xxhash64(x)), lit(16)).as("h"))
    assert(both.filter(col("s") =!= col("h")).isEmpty)
  }

  test("ngram Jaccard is 1.0 for normalized-identical docs") {
    val j = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 5, 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getFloat(2))).toMap
    assert(j((1L, 2L)) == 1.0f && j((1L, 4L)) == 1.0f)
  }

  test("simhash: identical docs have hamming 0, different docs don't collide") {
    val sh = docs.withColumn("th", Dedup.tokenHashes(col("text")))
      .select(Dedup.simhash(col("th"))).as[Long].collect()
    assert(sh(0) == sh(1) && sh(0) == sh(3))
    assert(java.lang.Long.bitCount(sh(0) ^ sh(2)) > 8)
  }

  test("language ID picks the marker-heavy language") {
    val df = Seq(
      (1L, "the cat is on the roof and the dog is here"),
      (2L, "der Hund ist gross und die Katze ist klein"),
      (3L, "le chat est sur le toit et les oiseaux")
    ).toDF("doc_id", "text")
    val r = TextOps.langId(df, "text").orderBy("doc_id")
      .select("lang_pred").as[String].collect().toSeq
    assert(r == Seq("en", "de", "fr"))
  }

  test("token counts") {
    val r = Seq(Tuple1("Hello, world! 42 times")).toDF("t")
      .select(TextOps.tokenCountWs(col("t")), TextOps.tokenCountRegex(col("t")))
      .head()
    assert(r.getLong(0) == 4L)  // whitespace tokens
    assert(r.getLong(1) == 6L)  // Hello , world ! 42 times
  }

  test("cosine: identical vectors 1.0, orthogonal 0.0") {
    val df = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)), (3L, Seq(2.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.topKCosine(df, "vec_id", "embedding", Seq(1.0f, 0.0f), 3)
      .collect().map(r => (r.getLong(0), r.getFloat(1)))
    assert(r(0)._2 == 1.0f && r(1)._2 == 1.0f) // ids 1 and 3
    assert(r(2) == ((2L, 0.0f)))
  }

  test("contaminationFlags marks docs sharing a benchmark shingle") {
    val train = Seq(
      (1L, "The quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely unrelated text about databases and sparks"),
      (3L, "zz")). // shorter than the shingle length -> never contaminated
      toDF("doc_id", "text")
    val bench = Seq((100L, "Benchmark asks: quick brown fox jumps?")).toDF("doc_id", "text")
    val r = Dedup.contaminationFlags(train, bench, "doc_id", "text", 12)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    assert(r == Seq((1L, true), (2L, false), (3L, false)))
  }

  test("semanticDedup keeps the min-id representative per cosine component") {
    // 1 and 3 are colinear (cos 1.0 > τ), 5 joins 3 via a rotated-but-close
    // vector, 2 is orthogonal: component {1,3,5} keeps 1; 2 keeps itself
    val df = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)),
      (3L, Seq(2.0, 0.0)), (5L, Seq(1.0, 0.1))).toDF("vec_id", "embedding")
    val r = Dedup.semanticDedup(df, "vec_id", "embedding", 0.95)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(r == Seq((1L, 1L, true), (2L, 2L, true), (3L, 1L, false), (5L, 1L, false)))
  }

  test("ivfAssign picks the max-dot centroid") {
    val df = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val cents = Seq((10, Seq(1.0, 0.0)), (20, Seq(0.0, 1.0)))
    val r = Similarity.ivfAssign(df, "embedding", cents).orderBy("vec_id")
      .select("centroid_id").as[Int].collect().toSeq
    assert(r == Seq(10, 20))
  }

  test("ivfQuery probes only the nearest centroids and still finds the hit") {
    val df = Seq((1L, Seq(1.0f, 0.1f)), (2L, Seq(0.1f, 1.0f))).toDF("vec_id", "embedding")
    val cents = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0)))
    val indexed = Similarity.ivfAssign(df, "embedding", cents)
    val hit = Similarity.ivfQuery(indexed, "vec_id", "embedding", cents, Seq(1.0f, 0.0f), 1, 1)
    assert(hit.head().getLong(0) == 1L)
  }

  test("ivfQuery probe ranking is L2-equivalent, not raw dot (unequal centroid norms)") {
    // the LONG centroid (10,0) has the larger dot with q=(1,0) but is
    // FARTHER from it; the vector near q is assigned to (1,0), so a
    // dot-ranked probe at nProbe=1 would scan the wrong partition and
    // return the wrong row
    val df = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(9.5f, 0.0f))).toDF("vec_id", "embedding")
    val cents = Seq((0, Seq(1.0, 0.0)), (1, Seq(10.0, 0.0)))
    val indexed = Similarity.ivfAssign(df, "embedding", cents)
    assert(indexed.filter(col("vec_id") === 1L).head().getAs[Int]("centroid_id") == 0)
    val hit = Similarity.ivfQuery(indexed, "vec_id", "embedding", cents,
      Seq(1.0f, 0.0f), 1, 1)
    assert(hit.head().getLong(0) == 1L,
      "nProbe=1 must probe the L2-nearest centroid's partition")
  }

  test("zero-norm vectors rank last in cosine top-k, not first via NaN") {
    val df = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 0.0f)), (3L, Seq(0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    val r = Similarity.topKCosine(df, "vec_id", "embedding", Seq(1.0f, 0.0f), 3)
      .collect().map(_.getLong(0)).toSeq
    assert(r.last == 2L, s"the zero vector must sort last, got $r")
    val joined = Similarity.topKCosineJoin(df, df.filter(col("vec_id") === 1L),
      "vec_id", "embedding", 2)
      .orderBy(col("cosine").desc_nulls_last).collect()
    assert(joined.head.getLong(1) == 3L, "real neighbor outranks the zero vector")
  }

  test("rhpBucket rejects plane counts that overflow its Long, single-entry codebooks work") {
    intercept[IllegalArgumentException] {
      Similarity.rhpBucket(col("embedding"), 4, 65)
    }
    // a 1-entry PQ codebook must not hit greatest()'s two-arg minimum
    val df = Seq((1L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val enc = Similarity.pqEncode(df, "embedding", Seq(Seq((7, Seq(0.5, 0.5))),
      Seq((3, Seq(1.0, 1.0)))))
    assert(enc.select("__recon").head().getSeq[Double](0) == Seq(0.5, 0.5, 1.0, 1.0))
  }

  test("cs_rhp_sig is bit-exact with the composed per-table rhpBucket form") {
    // the fused expression must reproduce the EXACT bucket values the
    // composed form persisted into existing bucket tables — same planes,
    // same left-to-right IEEE summation, same >0 predicate and packing,
    // and the same degenerate bucket-0 results (length mismatch / null
    // element, where the HOF dot is NULL)
    graft.sqlext.GraftFunctions.register(spark)
    val (dim, bits, tables) = (64, 16, 32)
    val e = graft.io.Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val composed = e.select(col("vec_id"),
      array((0 until tables).map(t =>
        Similarity.rhpBucket(col("v"), dim, bits, planeOffset = t * bits)): _*)
        .as("sig"))
    val fused = e.select(col("vec_id"),
      call_function("cs_rhp_sig", col("v"),
        lit(dim), lit(bits), lit(tables)).as("sig"))
    assert(composed.exceptAll(fused).isEmpty && fused.exceptAll(composed).isEmpty,
      "fused and composed signatures diverge on real embeddings")
    // degenerate inputs: wrong length and a null element → all-zero buckets
    val weird = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0)), // length 2 != dim
      (2L, Seq[java.lang.Double](null) ++ (1 until dim).map(
        d => java.lang.Double.valueOf(d.toDouble)))).toDF("vec_id", "v")
    val wf = weird.select(
      call_function("cs_rhp_sig", col("v"), lit(dim), lit(bits), lit(tables))
        .as("sig")).collect()
    assert(wf.forall(_.getSeq[Long](0).forall(_ == 0L)),
      "degenerate vectors must yield bucket 0 everywhere, like the HOF form")
  }

  test("fused pqTrain matches the per-subspace kmeansTrain composition") {
    // the one-job-per-iteration trainer must reproduce the codebooks the
    // m-independent-runs form computed: same init (k lowest ids, sliced),
    // same nearestCid assignment, same means. One input partition makes
    // the avg aggregation order deterministic, so equality is exact.
    val dim = 8; val m = 4; val k = 2; val iters = 3; val dsub = dim / m
    val rows = (0L until 20L).map { i =>
      (i, (0 until dim).map(d => (((i * 31 + d * 17) % 13) - 6).toFloat / 3f))
    }
    val df = rows.toDF("vec_id", "embedding").coalesce(1)
    val composed = (0 until m).map { s =>
      Similarity.kmeansTrain(
        df.select(col("vec_id"),
          slice(col("embedding").cast("array<double>"), s * dsub + 1, dsub)
            .as("__sub")),
        "vec_id", "__sub", k, iters)
    }
    val fused = Similarity.pqTrain(df, "vec_id", "embedding", dim, m, k, iters)
    assert(fused == composed,
      s"fused PQ training diverged from the per-subspace composition:\n$fused\nvs\n$composed")
  }

  test("rhp planes stay uncorrelated past dim 1024 (no shifted-copy weights)") {
    val w0 = Similarity.rhpWeights(0, 1536)
    val w1 = Similarity.rhpWeights(1, 1536)
    // with the old pIdx*1024+d key, w1's head equaled w0's tail
    assert(w0.drop(1024).take(64) != w1.take(64))
  }

  test("multimodal: metadata extraction and frame sampling over binary") {
    val bin = docs.select(col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("bytes"), lit("x").as("mime"))
    val meta = Multimodal.extractMeta(bin, "media_id", "bytes")
    val m = meta.filter(col("media_id") === 1).head()
    val expectedLen = "The quick brown fox jumps over the lazy dog again and again".length.toLong
    assert(m.getAs[Long]("n_bytes") == expectedLen)
    assert(m.getAs[Int]("width") >= 64 && m.getAs[Int]("n_frames") >= 1)
    val frames = Multimodal.sampleFrames(meta, 2)
    assert(frames.count() > 0)
  }
}
