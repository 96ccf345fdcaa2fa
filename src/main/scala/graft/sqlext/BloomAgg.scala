package graft.sqlext

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** cs_bloom_agg(x, n_items, fpp): the serialized
  * `org.apache.spark.util.sketch.BloomFilter` over a group's non-null
  * long values — the GROUPED form of `df.stat.bloomFilter` (which sizes
  * and fills one filter per ACTION). One `groupBy(file).agg(cs_bloom_agg)`
  * job builds every missing file-bloom sidecar in a single pass where the
  * per-file form launched one Spark job (plus one schema-inference job)
  * PER FILE — at a fold that re-keys a 100k-file generation, that is
  * 200k driver-sequential job launches (guide §2.4).
  *
  * Byte-identity with the per-file build it replaces (FileBlooms sync):
  * `BloomFilter.create(n_items, fpp)` + `putLong` per non-null value is
  * exactly what Spark's BloomFilterAggregate does under
  * `df.stat.bloomFilter(col, n_items, fpp)` (same optimalNumOfBits/
  * optimalNumOfHashFunctions sizing, same XXH64 putLong, and the bit
  * array is an order-independent OR of insertions, so partial/final
  * merge order cannot move a bit). FileBloomsBatchSpec pins the sidecar
  * bytes against the df.stat.bloomFilter composition.
  *
  * n_items sizes the filter and must be CONSTANT WITHIN A GROUP (the
  * caller derives it from the group's parquet footer row count); the
  * first row seen creates the buffer filter from it. fpp is a literal.
  * NULL values are skipped (aggregate semantics — BloomFilterAggregate
  * skips them identically); a group of only-null values still yields its
  * (empty) filter. Returns NULL only for an empty group, which a grouped
  * aggregate never produces.
  */
case class CsBloomAgg(
    value: Expression,
    nItems: Expression,
    fppExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CsBloomAgg.Buf] {

  override def children: Seq[Expression] = Seq(value, nItems, fppExpr)

  private lazy val fpp: Double = fppExpr.eval(InternalRow.empty) match {
    case n: Number => n.doubleValue()
    case other => throw new IllegalArgumentException(
      s"cs_bloom_agg fpp must be a double literal, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (value.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"cs_bloom_agg value must be a bigint (the sidecar contract is " +
          s"mightContainLong), got ${value.dataType.sql}")
    else if (nItems.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"cs_bloom_agg n_items must be a bigint, got ${nItems.dataType.sql}")
    else if (!fppExpr.foldable || fppExpr.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure("cs_bloom_agg fpp must be a double literal")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "cs_bloom_agg"

  override def createAggregationBuffer(): CsBloomAgg.Buf = new CsBloomAgg.Buf(null)

  override def update(buf: CsBloomAgg.Buf, input: InternalRow): CsBloomAgg.Buf = {
    // the filter exists once the group has ANY sized row — a group of
    // only NULL values must still produce its empty filter, exactly like
    // df.stat.bloomFilter over an all-null column
    if (buf.bf == null) {
      val n = nItems.eval(input)
      if (n != null)
        buf.bf = BloomFilter.create(math.max(1L, n.asInstanceOf[Long]), fpp)
    }
    val v = value.eval(input)
    if (v != null) {
      // a non-null value with no filter to put it in is a SIZING bug in
      // the caller (n_items null on the group's first rows): dropping the
      // value would manufacture a bloom FALSE NEGATIVE — the one failure
      // mode a bloom must never have — so fail loudly instead (review r18)
      if (buf.bf == null)
        throw new IllegalStateException(
          "cs_bloom_agg: non-null value with NULL n_items — the filter " +
            "cannot be sized; fix the caller's n_items derivation")
      buf.bf.putLong(v.asInstanceOf[Long])
    }
    buf
  }

  override def merge(a: CsBloomAgg.Buf, b: CsBloomAgg.Buf): CsBloomAgg.Buf =
    if (b.bf == null) a
    else if (a.bf == null) { a.bf = b.bf; a }
    else { a.bf.mergeInPlace(b.bf); a }

  override def eval(buf: CsBloomAgg.Buf): Any =
    if (buf.bf == null) null else CsBloomAgg.toBytes(buf.bf)

  override def serialize(buf: CsBloomAgg.Buf): Array[Byte] =
    if (buf.bf == null) Array.emptyByteArray else CsBloomAgg.toBytes(buf.bf)

  override def deserialize(bytes: Array[Byte]): CsBloomAgg.Buf =
    if (bytes.isEmpty) new CsBloomAgg.Buf(null)
    else new CsBloomAgg.Buf(
      BloomFilter.readFrom(new ByteArrayInputStream(bytes)))

  override def withNewMutableAggBufferOffset(newOffset: Int): CsBloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CsBloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CsBloomAgg =
    copy(value = newChildren(0), nItems = newChildren(1), fppExpr = newChildren(2))
}

object CsBloomAgg {
  /** Mutable holder: the filter is created lazily on the first row (its
    * size comes from that row's n_items), and TypedImperativeAggregate
    * buffers must be non-null from creation.
    */
  final class Buf(var bf: BloomFilter)

  private[graft] def toBytes(bf: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }
}
