package graft

import graft.text.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bit-compatibility pins for the r17 fused text kernels: NormText must
  * equal the regex composition it replaced, and ShingleHashes must equal
  * the charShingles+xxhash64 composition — on adversarial inputs (unicode,
  * punctuation runs, empties, shorter-than-n) and on a real corpus slice.
  * These equalities are what keep every text-family oracle hash (and the
  * persisted landing-dedup band buckets) unchanged across the switch.
  */
class NormShingleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val adversarial = Seq(
    "The quick brown fox jumps over the lazy dog",
    "  ---  punct   only?!...  ",
    "",
    "UPPER lower 0123456789",
    "tabs\tand\nnewlines\r\nmixed",
    "深度学习模型 mixed with ASCII words 你好",
    "émigré naïve façade",          // accented latin → non-alnum bytes
    "a",                            // shorter than any shingle
    "ab",                           // exactly 2 chars
    "!@#$%^&*()",
    "trailing punctuation!",
    "?leading punctuation",
    "𝕌𝕟𝕚𝕔𝕠𝕕𝕖 math letters",         // surrogate pairs
    "a0b1c2d3e4f5",
    "word  word   word    word"
  ).zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private lazy val df = adversarial.toDF("id", "text")

  private def regexNorm(c: org.apache.spark.sql.Column) =
    lower(trim(regexp_replace(c, "[^A-Za-z0-9]+", " ")))

  test("cs_norm_text equals the regex normalization chain") {
    val cmp = df.select(
      TextOps.normalizedText(col("text")).as("fused"),
      regexNorm(col("text")).as("regex"))
    val bad = cmp.filter(col("fused") =!= col("regex")).collect()
    assert(bad.isEmpty, s"norm mismatch: ${bad.mkString("; ")}")
    // null stays null
    val n = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
      .select(TextOps.normalizedText(col("text"))).head
    assert(n.isNullAt(0))
  }

  test("cs_norm_text equals the regex chain on the sf0.001 documents corpus") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val docs = graft.io.Tables.read(spark, dir, "documents")
    val cmp = docs.select(
      TextOps.normalizedText(col("text")).as("fused"),
      regexNorm(col("text")).as("regex"))
    assert(cmp.filter(col("fused") =!= col("regex")).isEmpty)
  }

  test("cs_shingle_hashes equals array_distinct(transform(charShingles, xxhash64))") {
    for (n <- Seq(3, 5, 8)) {
      val cmp = df
        .withColumn("__norm", TextOps.normalizedText(col("text")))
        .select(col("id"),
          TextOps.hashedCharShingles(col("__norm"), n).as("fused"),
          array_distinct(transform(
            TextOps.charShingles(col("__norm"), n),
            s => xxhash64(s))).as("composed"))
      val bad = cmp.filter(col("fused") =!= col("composed")).collect()
      assert(bad.isEmpty, s"shingle-hash mismatch at n=$n: ${bad.mkString("; ")}")
    }
  }

  test("cs_shingle_hashes non-ASCII path: codepoint windows, not byte windows") {
    // applied to RAW text (normalizedText never yields non-ASCII — this
    // pins the general contract for any direct caller)
    val raw = Seq((1L, "深度学习模型abc"), (2L, "naïve café über")).toDF("id", "text")
    val cmp = raw.select(
      TextOps.hashedCharShingles(col("text"), 3).as("fused"),
      array_distinct(transform(
        TextOps.charShingles(col("text"), 3), s => xxhash64(s))).as("composed"))
    assert(cmp.filter(col("fused") =!= col("composed")).isEmpty)
  }

  test("shingleSets emits hashed sets and the LSH pipeline is unchanged") {
    val sh = graft.dedup.Dedup.shingleSets(df, "id", "text", 5)
    assert(sh.schema("sh").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, containsNull = false))
    // jaccard over hashed sets == jaccard over string sets on this corpus
    val strSh = df.withColumn("__norm", TextOps.normalizedText(col("text")))
      .filter(length(col("__norm")) >= 5)
      .select(col("id"), TextOps.charShingles(col("__norm"), 5).as("sh"))
    def allPairs(s: org.apache.spark.sql.DataFrame) =
      graft.dedup.Dedup.jaccardPairsExactSh(s, "id", 0.3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getFloat(2))).toSet
    assert(allPairs(sh) == allPairs(strSh))
  }
}
