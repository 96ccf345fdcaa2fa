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

  // NULL above the window cap (r18, ADVICE r17): a single >2^29-window
  // pathological document must degrade — NULL shingles mean "no buckets,
  // collides with nothing, survives" (the too-short-doc semantics) — not
  // abort a whole corpus scan mid-flight as the old require did
  override def nullable: Boolean = true

  override def prettyName: String = "cs_shingle_hashes"

  override def nullSafeEval(input: Any): Any = {
    val a = ShingleHashes.compute(input.asInstanceOf[UTF8String], n)
    if (a == null) null else new GenericArrayData(a)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("hashes")
      s"""
         |long[] $tmp = graft.sqlext.ShingleHashes.compute($c, $n);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($tmp);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  /** Insertion-ordered distinct set of primitive longs: open addressing
    * with linear probing over a power-of-two table (load factor <= 0.5 —
    * the table is sized from the window count upfront, and distinct <=
    * windows, so it never grows), first-occurrence order kept in a flat
    * output array. Replaces a LinkedHashSet[java.lang.Long] that boxed
    * every hash and allocated one node per entry — on a corpus scan the
    * boxing was the dominant allocation of the whole shingle pass.
    * The value 0 is encoded out-of-band (`hasZero`) so 0L can stay the
    * empty-slot marker.
    */
  private final class LongDistinct(maxEntries: Int) {
    // fail loudly instead of probing a wrapped-around table: a document
    // with >2^29 windows needs a >8 GiB table and could never have fit
    // the boxed set either
    require(maxEntries < (1 << 29),
      s"cs_shingle_hashes: document too large ($maxEntries windows)")
    private val cap = Integer.highestOneBit(
      math.max(8, maxEntries * 2 - 1)) << 1
    private val mask = cap - 1
    private val table = new Array[Long](cap)
    private val order = new Array[Long](math.max(maxEntries, 1))
    private var n = 0
    private var hasZero = false

    def add(v: Long): Unit = {
      if (v == 0L) {
        if (!hasZero) { hasZero = true; order(n) = 0L; n += 1 }
        return
      }
      // finalizer-style mix so clustered hash values probe evenly
      var h = v ^ (v >>> 33)
      h *= 0xff51afd7ed558ccdL
      h ^= h >>> 33
      var idx = h.toInt & mask
      while (true) {
        val cur = table(idx)
        if (cur == 0L) {
          table(idx) = v; order(n) = v; n += 1
          return
        }
        if (cur == v) return
        idx = (idx + 1) & mask
      }
    }

    def result(): Array[Long] = java.util.Arrays.copyOf(order, n)
  }

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
    if (ascii) {
      val windows = bytes - n + 1
      if (windows <= 0) return Array.emptyLongArray
      if (windows >= (1 << 29)) return null // over-cap: NULL, not a crash
      val seen = new LongDistinct(windows)
      var p = 0
      while (p + n <= bytes) {
        seen.add(XXH64.hashUnsafeBytes(base, off + p, n, 42L))
        p += 1
      }
      seen.result()
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
      val windows = c - n + 1
      if (windows <= 0) return Array.emptyLongArray
      if (windows >= (1 << 29)) return null // over-cap: NULL, not a crash
      val seen = new LongDistinct(windows)
      var w = 0
      while (w + n <= c) {
        val lo = starts(w)
        seen.add(XXH64.hashUnsafeBytes(base, off + lo, starts(w + n) - lo, 42L))
        w += 1
      }
      seen.result()
    }
  }
}
