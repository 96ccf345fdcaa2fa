package graft.sqlext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** k-lane MinHash signature of a shingle array in ONE pass: each shingle
  * is xxhash64'd once (same primitive as Spark's xxhash64, seed 42) and
  * folded into all k running minima of the affine lanes
  * h_i = (a_i·h + b_i) mod P, P = 2^31−1 — the construction
  * Dedup.minhashBase/minhashSignature express as k+1 HOF scans, which
  * rescanned the array per lane and allocated an intermediate hash array.
  * Duplicates in the input are harmless (a duplicate can't change a
  * minimum), so callers may skip array_distinct before signing.
  *
  * Same design rationale as [[SimHash64]]/[[ArrayDot]]: the per-element
  * work is the corpus-scan cost at 100 TB, so it runs as a fused
  * whole-stage-codegen loop, not lambda dispatch. NULL elements are
  * skipped; an all-null/empty array signs as all-P (the neutral maxima),
  * which buckets such docs together — callers filter empty shingle sets
  * upstream (shingleSets already does).
  */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0 && k <= 256, s"minhash signature width must be in [1,256], got $k")

  /** array<string> shingles are xxhash64'd here; array<long> shingles are
    * PRE-HASHED xxhash64 values ([[ShingleHashes]]) and skip straight to
    * the lane folds — same chain, so signatures (and everything persisted
    * from them, e.g. the landing-dedup band buckets) are bit-identical
    * between the two input forms.
    */
  private lazy val preHashed: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cs_minhash requires array<string> shingles or array<bigint> " +
        s"pre-hashed shingles, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "cs_minhash"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val P = MinHashSig.P
    val mins = Array.fill(k)(P)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val h0 =
          if (preHashed) a.getLong(i)
          else {
            val s = a.getUTF8String(i)
            XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
          }
        val h = ((h0 % P) + P) % P
        var j = 0
        while (j < k) {
          val v = ((2L * j + 1) * h + 104729L * (j + 1)) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins) // long[] ctor — no per-lane boxing
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val s = ctx.freshName("s")
      val mins = ctx.freshName("mins")
      val P = MinHashSig.P
      val rawHash =
        if (preHashed) s"long $h = $a.getLong($i);"
        else
          s"""org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
             |    long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
             |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);""".stripMargin
      s"""
         |int $n = $a.numElements();
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, ${P}L);
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $rawHash
         |    $h = (($h % ${P}L) + ${P}L) % ${P}L;
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $v = ((2L * $j + 1) * $h + 104729L * ($j + 1)) % ${P}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** 2^31−1 (Mersenne prime) — same modulus as Dedup.MinhashP. */
  val P: Long = 2147483647L
}
