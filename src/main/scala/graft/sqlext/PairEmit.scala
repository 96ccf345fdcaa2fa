package graft.sqlext

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** cs_pairs(ids): emit every unordered pair of DISTINCT values in one
  * bucket's member array as an ordered row (id1 < id2) — the in-aggregate
  * pair-emit half of the one-shuffle LSH candidate shape
  * ([[graft.dedup.Dedup.bandedPairs]]).
  *
  * This replaces the banded SELF-JOIN on (band, bucket): that shape
  * shuffles the (id, band, bucket) frame on BOTH join sides and computes
  * the banding subtree twice (each side of the join re-evaluates it),
  * where `groupBy(band, bucket) + cs_pairs` pays ONE exchange and one
  * banding pass at any scale (guide §2.4 "remove shuffles outright").
  * Pair semantics are the join's exactly: a pair (x, y) with x < y is
  * emitted iff both values share the group — duplicates of one value
  * never pair with themselves (the join's strict `<`), null members pair
  * with nothing (a null id fails the join predicate; collect_list
  * upstream drops them before this generator ever sees the array).
  * Cross-band dedup stays where it was: the caller's `distinct()`.
  *
  * The iterator is LAZY — a pathological hot bucket of m members emits
  * its m(m−1)/2 pairs without ever materializing them as one array
  * (the HOF `flatten(transform(...))` alternative would), so the
  * generator's memory is O(m), the same as the hash-join build side the
  * self-join held for that bucket.
  */
case class BucketPairs(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  private def elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if TypeUtils.checkForOrderingExpr(et, prettyName)
        .isSuccess => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"cs_pairs requires an array of an orderable type, got ${child.dataType.sql}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("id1", elemType, nullable = true),
    StructField("id2", elemType, nullable = true)))

  override def prettyName: String = "cs_pairs"

  @transient private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(elemType)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Iterator.empty
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return Iterator.empty
    val et = elemType
    // copy the members out once — ArrayData.get is O(1) but the iterator
    // below revisits each element n−1 times
    val elems = new Array[Any](n)
    var k = 0
    while (k < n) {
      elems(k) = if (arr.isNullAt(k)) null else arr.get(k, et)
      k += 1
    }
    new Iterator[InternalRow] {
      private var i = 0
      private var j = 1
      private var nextRow: InternalRow = _
      private def advance(): Unit = {
        nextRow = null
        while (nextRow == null && i < n - 1) {
          val a = elems(i)
          val b = elems(j)
          if (a != null && b != null) {
            val c = ord.compare(a, b)
            if (c < 0) nextRow = new GenericInternalRow(Array(a, b))
            else if (c > 0) nextRow = new GenericInternalRow(Array(b, a))
            // c == 0: duplicate values never self-pair (the join's strict <)
          }
          j += 1
          if (j >= n) { i += 1; j = i + 1 }
        }
      }
      advance()
      override def hasNext: Boolean = nextRow != null
      override def next(): InternalRow = {
        val r = nextRow; advance(); r
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): BucketPairs =
    copy(child = newChild)
}

/** cs_hamming_pairs(members, maxDist): the Hamming twin of [[BucketPairs]]
  * for the banded-simhash family ([[graft.dedup.Dedup.hammingPairs64]]) —
  * `members` is one bucket's collect_list of struct(id, h64); every
  * distinct-id pair within Hamming distance `maxDist` of each other emits
  * as (id1, id2, hamming) with id1 < id2. Verification happens INSIDE the
  * emit (bit_count(xor) per candidate pair, exactly the join predicate's
  * arithmetic), so over-distance pairs never leave the aggregate at all.
  * Same lazy-iterator and null semantics as cs_pairs; cross-band dedup
  * stays at the caller's distinct().
  */
case class HammingBucketPairs(left: Expression, right: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(left, right)

  private def idType: DataType = left.dataType match {
    case ArrayType(StructType(fields), _) if fields.length == 2 =>
      fields(0).dataType
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(StructType(fields), _)
        if fields.length == 2 && fields(1).dataType == LongType &&
          TypeUtils.checkForOrderingExpr(fields(0).dataType, prettyName)
            .isSuccess && right.dataType == IntegerType && right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "cs_hamming_pairs requires (array<struct<id, h64: bigint>>, literal " +
        s"int maxDist), got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("id1", idType, nullable = true),
    StructField("id2", idType, nullable = true),
    StructField("hamming", LongType, nullable = false)))

  override def prettyName: String = "cs_hamming_pairs"

  @transient private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(idType)
  @transient private lazy val maxDist: Int =
    right.eval(null).asInstanceOf[Int]

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = left.eval(input)
    if (v == null) return Iterator.empty
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return Iterator.empty
    val it = idType
    val ids = new Array[Any](n)
    val hs = new Array[Long](n)
    var k = 0
    while (k < n) {
      if (!arr.isNullAt(k)) {
        val row = arr.getStruct(k, 2)
        ids(k) = if (row.isNullAt(0)) null else row.get(0, it)
        hs(k) = if (row.isNullAt(1)) 0L else row.getLong(1)
        // a null h64 never occurs from the banding select (the hash is
        // computed, not stored); treat it as 0 rather than crash —
        // membership still requires both ids non-null below
      }
      k += 1
    }
    val cap = maxDist
    new Iterator[InternalRow] {
      private var i = 0
      private var j = 1
      private var nextRow: InternalRow = _
      private def advance(): Unit = {
        nextRow = null
        while (nextRow == null && i < n - 1) {
          val a = ids(i)
          val b = ids(j)
          if (a != null && b != null) {
            val d = java.lang.Long.bitCount(hs(i) ^ hs(j)).toLong
            if (d <= cap) {
              val c = ord.compare(a, b)
              if (c < 0) nextRow = new GenericInternalRow(Array(a, b, d))
              else if (c > 0) nextRow = new GenericInternalRow(Array(b, a, d))
            }
          }
          j += 1
          if (j >= n) { i += 1; j = i + 1 }
        }
      }
      advance()
      override def hasNext: Boolean = nextRow != null
      override def next(): InternalRow = {
        val r = nextRow; advance(); r
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HammingBucketPairs =
    copy(left = newChildren(0), right = newChildren(1))
}
