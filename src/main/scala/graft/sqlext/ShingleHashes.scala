package graft.sqlext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct xxhash64 values of every length-`n` character shingle of a
  * string, in first-occurrence order, as ONE fused pass — value-identical
  * to `array_distinct(transform(charShingles(norm, n), s => xxhash64(s)))`
  * (the pre-r17 composition: an interpreted sequence/transform/filter/
  * array_distinct HOF chain that allocated one n-char UTF8String per
  * position plus a string hash set per document, then a second transform
  * to hash — the dominant per-document cost of every shingle pipeline).
  *
  * The hash is Spark's xxhash64 (seed 42) over the shingle's UTF-8 bytes,
  * so downstream consumers that persist derived values (the landing-dedup
  * bucket tables persist cs_minhash(sh) band buckets) see BIT-IDENTICAL
  * results: hashing the byte window in place equals hashing the
  * substring, because a substring's bytes ARE that window.
  *
  * Windows are codepoint windows (like substr): on pure-ASCII input —
  * the only thing TextOps.normalizedText can produce — bytes and
  * codepoints coincide and the fast path hashes byte windows directly;
  * for non-ASCII input a codepoint index is built once per row and byte
  * ranges are hashed per window. Strings shorter than `n` yield an empty
  * array (charShingles' length filter dropped the single short window).
  *
  * One semantic hair (documented, accepted): distinctness here is by
  * HASH, the composition's is by STRING-then-hash. Two distinct shingles
  * of one document colliding under xxhash64 would produce a duplicate in
  * the composed array but a single element here (set-size differs by 1).
  * Collision probability is ~(shingles per doc)²/2⁶⁵ per document —
  * negligible against the pipelines' own approximation contracts, and
  * a collision already conflates the pair everywhere the hash is the
  * join/intersect key.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"shingle length must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cs_shingle_hashes requires a string, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "cs_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      ShingleHashes.compute(input.asInstanceOf[UTF8String], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.sqlext.ShingleHashes.compute($c, $n))")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  /** Shared kernel: distinct window hashes in first-occurrence order. */
  def compute(s: UTF8String, n: Int): Array[Long] = {
    val bytes = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    // codepoint count == byte count iff pure ASCII (no byte >= 0x80)
    var ascii = true
    var i = 0
    while (ascii && i < bytes) {
      if (s.getByte(i) < 0) ascii = false
      i += 1
    }
    // LinkedHashSet preserves first-occurrence order == array_distinct's
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (ascii) {
      var p = 0
      while (p + n <= bytes) {
        seen.add(XXH64.hashUnsafeBytes(base, off + p, n, 42L))
        p += 1
      }
    } else {
      // codepoint starts (UTF-8: a continuation byte is 10xxxxxx)
      val starts = new Array[Int](s.numChars() + 1)
      var c = 0
      var b = 0
      while (b < bytes) {
        starts(c) = b; c += 1
        b += UTF8String.numBytesForFirstByte(s.getByte(b))
      }
      starts(c) = bytes
      var w = 0
      while (w + n <= c) {
        val lo = starts(w)
        seen.add(XXH64.hashUnsafeBytes(base, off + lo, starts(w + n) - lo, 42L))
        w += 1
      }
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    out
  }
}
